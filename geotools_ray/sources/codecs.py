"""Real, spec-compliant media codecs in pure numpy + stdlib.

The container has no PIL/libjpeg/libsndfile/ffmpeg, so these are
from-scratch implementations of PUBLIC interchange formats — files
they emit are readable by any standard tool (feh/libpng, djpeg,
aplay/soxi, ffmpeg/mpv) and vice versa for the subsets documented
per-codec. They replace the deterministic "fake" codecs as the real
end of the codec seam (`sources/images.py` decode dispatch,
`stages/multimodal.py` audio/video decode).

Formats:
  PNG   — RFC 2083 / ISO 15948. 8-bit RGB (color type 2) and
          grayscale (0); encoder emits filter 0 rows (fast batched
          decode), decoder reconstructs all five filter types and
          verifies chunk CRCs.
  JPEG  — ITU-T T.81 baseline sequential DCT, JFIF container,
          4:4:4 (no subsampling), standard Annex K quantization +
          Huffman tables, libjpeg-compatible quality scaling.
          Encoder + decoder; round-trip PSNR >= 40 dB at q >= 90
          (the input_hint's lossy-format invariant) is asserted in
          tests against THIS real DCT codec, not a stand-in.
  WAV   — RIFF/WAVE PCM (16-bit LE, any channel count). Bit-exact.
  Y4M   — YUV4MPEG2 (Cmono / C444 planar), the uncompressed video
          interchange format ffmpeg/mpv read natively. Fixed frame
          size makes frame sampling an O(1) seek, which is exactly
          what the VideoFrameSampleStage needs: sampling every 30th
          frame reads 1/30th of the payload bytes.

All functions are deterministic; nothing here touches Ray — these are
the per-record kernels actor-pool map_batches stages call.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG (RFC 2083): 8-bit RGB / gray, no interlace

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 1) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> spec-compliant PNG bytes.

    Rows use filter type 0 (None): decode of our own files is one
    zlib.decompress + a filter-byte strip, which keeps the flagship's
    batched decode kernel vectorized.
    """
    if pixels.ndim == 2:
        color_type, nch = 0, 1
        pixels = pixels[:, :, None]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type, nch = 2, 3
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # prepend the per-row filter byte (0) without a python row loop
    rows = np.empty((h, 1 + w * nch), dtype=np.uint8)
    rows[:, 0] = 0
    rows[:, 1:] = np.ascontiguousarray(pixels).reshape(h, w * nch)
    idat = zlib.compress(rows.tobytes(), level)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """raw: (h, 1+stride) filter-byte-prefixed rows -> (h, stride) recon."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub: per-channel cumulative sum mod 256
            for c in range(bpp):
                row[c::bpp] = np.cumsum(row[c::bpp], dtype=np.uint64).astype(np.uint8)
        elif ft == 2:  # Up
            row += prior
        elif ft == 3:  # Average (sequential in x)
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + (left + int(prior[i])) // 2) & 0xFF
        elif ft == 4:  # Paeth (sequential in x)
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                ul = int(prior[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + _paeth(left, int(prior[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = row
        prior = out[y]
    return out


def png_info(data: bytes) -> tuple[int, int, int]:
    """-> (w, h, nch) from the IHDR without decoding pixel data."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
    if depth != 8 or ctype not in (0, 2):
        raise NotImplementedError(f"PNG depth={depth} color_type={ctype}")
    return w, h, 3 if ctype == 2 else 1


def png_idat(data) -> bytes:
    """Concatenated IDAT payload (no CRC check) — the fast batched
    decode path for our own filter-0 files; accepts bytes or
    memoryview (zero-copy slices from an Arrow binary column)."""
    pos, idat = 8, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = bytes(data[pos + 4 : pos + 8])
        if typ == b"IDAT":
            idat.append(data[pos + 8 : pos + 8 + length])
        elif typ == b"IEND":
            break
        pos += 12 + length
    return b"".join(bytes(x) for x in idat)


def decode_png(data: bytes, check_crc: bool = True) -> np.ndarray:
    """PNG bytes -> (h, w, 3) or (h, w) uint8. Verifies chunk CRCs."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if check_crc:
            (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
            if crc != (zlib.crc32(typ + body) & 0xFFFFFFFF):
                raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in (0, 2) or comp or filt or ilace:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={ctype} interlace={ilace}"
                )
            meta = (w, h, 3 if ctype == 2 else 1)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, nch = meta
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * nch
    raw = raw.reshape(h, 1 + stride)
    if np.any(raw[:, 0]):
        px = _png_unfilter(raw, h, stride, nch)
    else:  # all filter-0 rows (our encoder): pure slice
        px = raw[:, 1:]
    return px.reshape(h, w, nch) if nch == 3 else px.reshape(h, w)


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81 baseline, JFIF, 4:4:4)

# Annex K.1/K.2 base quantization tables (public spec constants)
_QT_LUM = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32).reshape(8, 8)
_QT_CHR = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32).reshape(8, 8)

# zigzag order (T.81 Figure A.6)
_ZZ = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_HT_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_HT_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HT_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """canonical codes (T.81 Annex C) -> {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_HUFF_LUT_CACHE: dict = {}


def _huff_decode_table(bits, vals) -> tuple[list, list]:
    """16-bit-peek LUT (libjpeg-style): for every 16-bit window whose
    prefix is a valid code, lut_sym holds the symbol and lut_len the
    code length — one table lookup per symbol instead of a
    bit-at-a-time walk. lut_len == 0 marks an invalid prefix.
    Cached by table content: rebuilding the 4x65536-entry LUTs per
    decode_jpeg call (~2 MB + milliseconds) rivals the entropy decode
    itself for small images, and real files near-always carry the
    Annex K constants."""
    key = (bytes(bits), bytes(vals))
    hit = _HUFF_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut_sym = np.zeros(1 << 16, dtype=np.int16)
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut_sym[lo:hi] = vals[k]
            lut_len[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    # python lists: scalar indexing is ~7x faster than numpy scalars
    # in the per-symbol loop
    out = (lut_sym.tolist(), lut_len.tolist())
    if len(_HUFF_LUT_CACHE) < 64:  # bound worker memory on hostile inputs
        _HUFF_LUT_CACHE[key] = out
    return out


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    T = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    T[0] /= np.sqrt(2)
    return T


_T = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex K tables."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QT_LUM * scale + 50) // 100, 1, 255)
    qc = np.clip((_QT_CHR * scale + 50) // 100, 1, 255)
    return ql.astype(np.int32), qc.astype(np.int32)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _blocks(channel: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) float -> (nby*nbx, 8, 8) edge-replicated 8x8 blocks."""
    h, w = channel.shape
    H, W = (h + 7) & ~7, (w + 7) & ~7
    pad = np.pad(channel, ((0, H - h), (0, W - w)), mode="edge")
    nby, nbx = H // 8, W // 8
    return (
        pad.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8),
        nby,
        nbx,
    )


SAMPLING_HV = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, restart_interval: int = 0,
    sampling: str = "444",
) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> baseline JFIF JPEG bytes.

    `sampling` picks the chroma layout: "444" (1x1, the default and
    the bit-pinned legacy path), "422" (Y 2x1) or "420" (Y 2x2) —
    chroma planes are box-averaged down (the deterministic mean of
    each fy x fx window) and MCUs interleave Y blocks raster-first
    per T.81 A.2.3. Grayscale ignores `sampling`.

    restart_interval > 0 emits a DRI segment and an RSTn marker every
    `restart_interval` MCUs (T.81 B.2.4.4 / E.1.4): the entropy stream
    byte-aligns (1-padded) before each marker and DC prediction resets
    after it, which makes every restart segment independently
    decodable — the property the wide SIMD-across-segments decoder
    (sources/jpegwide.py) exploits for parallel entropy decode."""
    gray = pixels.ndim == 2
    if sampling not in SAMPLING_HV:
        raise ValueError(f"unknown sampling {sampling!r} (444/422/420)")
    if not gray and sampling != "444":
        return _encode_jpeg_subsampled(
            pixels, quality, restart_interval, SAMPLING_HV[sampling]
        )
    h, w = pixels.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        comps = [(pixels.astype(np.float64), ql)]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        comps = [(ycc[..., 0], ql), (ycc[..., 1], qc), (ycc[..., 2], qc)]

    # forward DCT + quantization per component, batched over blocks
    quantized = []
    for chan, qt in comps:
        blk, _, _ = _blocks(chan - 128.0)
        # batched matmul (T @ blk @ T^T) — same contraction as the
        # einsum form but BLAS-stacked (~10x); the wide codec
        # (jpegwide.py) uses the identical formulation so scalar and
        # wide outputs stay bit-identical
        coef = np.matmul(np.matmul(_T, blk), _T.T)
        quantized.append(np.round(coef / qt).astype(np.int32).reshape(-1, 64)[:, _ZZ])

    enc_dc = [_huff_encode_table(*_HT_DC_LUM), _huff_encode_table(*_HT_DC_CHR)]
    enc_ac = [_huff_encode_table(*_HT_AC_LUM), _huff_encode_table(*_HT_AC_CHR)]
    prev_dc = [0] * len(comps)
    nblocks = quantized[0].shape[0]
    # hot entropy loop with an inlined bit accumulator (locals, not a
    # _BitWriter method call per symbol) and list-form blocks; bytes
    # drain in one pass at the end with vectorized 0xFF stuffing
    q_lists = [q.tolist() for q in quantized]

    _stuff = _stuff_ff

    acc = 0
    nbits = 0
    buf = bytearray()
    entropy = bytearray()
    rst_count = 0
    for b in range(nblocks):  # interleaved MCU order == block order at 1x1
        if restart_interval and b and b % restart_interval == 0:
            # segment boundary: 1-pad to byte, stuff, emit RSTn, reset
            # DC prediction (T.81 E.1.4)
            pad = (8 - (nbits & 7)) & 7
            acc = (acc << pad) | ((1 << pad) - 1)
            nbits += pad
            if nbits:
                buf += acc.to_bytes(nbits // 8, "big")
            entropy += _stuff(buf)
            entropy += bytes((0xFF, 0xD0 + (rst_count & 7)))
            rst_count += 1
            acc, nbits, buf = 0, 0, bytearray()
            prev_dc = [0] * len(comps)
        for ci in range(len(comps)):
            zz = q_lists[ci][b]
            tdc, tac = enc_dc[min(ci, 1)], enc_ac[min(ci, 1)]
            dc = zz[0]
            diff = dc - prev_dc[ci]
            prev_dc[ci] = dc
            size = diff.bit_length() if diff > 0 else (-diff).bit_length()
            code, ln = tdc[size]
            acc = (acc << ln) | code
            nbits += ln
            if size:
                v = diff if diff >= 0 else diff + (1 << size) - 1
                acc = (acc << size) | v
                nbits += size
            run = 0
            last = 63
            while last > 0 and zz[last] == 0:
                last -= 1
            for k in range(1, last + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = tac[0xF0]  # ZRL
                    acc = (acc << ln) | code
                    nbits += ln
                    run -= 16
                size = v.bit_length() if v > 0 else (-v).bit_length()
                code, ln = tac[(run << 4) | size]
                acc = (acc << ln) | code
                nbits += ln
                v = v if v >= 0 else v + (1 << size) - 1
                acc = (acc << size) | v
                nbits += size
                run = 0
            if last < 63:
                code, ln = tac[0x00]  # EOB
                acc = (acc << ln) | code
                nbits += ln
            if nbits >= 512:  # drain the python-int accumulator
                keep = nbits & 7
                buf += (acc >> keep).to_bytes((nbits - keep) // 8, "big")
                acc &= (1 << keep) - 1
                nbits = keep
    pad = (8 - (nbits & 7)) & 7  # pad final byte with 1-bits
    acc = (acc << pad) | ((1 << pad) - 1)
    nbits += pad
    if nbits:
        buf += acc.to_bytes(nbits // 8, "big")
    entropy += _stuff(buf)
    return jpeg_header_bytes(gray, ql, qc, h, w, restart_interval) + entropy + b"\xff\xd9"


def _encode_jpeg_subsampled(
    pixels: np.ndarray, quality: int, restart_interval: int, hv
) -> bytes:
    """Baseline MCU-interleaved encode for 4:2:2 / 4:2:0 (T.81 A.2.3):
    chroma is box-downsampled, blocks stream per MCU as Y(v,u
    raster-first) then Cb then Cr. Shares the quality tables, DCT
    formulation and bit-writer conventions with the 4:4:4 path."""
    h, w = pixels.shape[:2]
    ql, qc = _quality_tables(quality)
    hmax = max(H for H, _ in hv)
    vmax = max(V for _, V in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ycc = _rgb_to_ycbcr(pixels)
    qts = [ql, qc, qc]
    plane_zz: list[np.ndarray] = []  # per comp: (nblocks, 64) zigzag ints
    bpr: list[int] = []  # blocks per plane row
    PH, PW = mcuy * 8 * vmax, mcux * 8 * hmax
    for ci, (Hi, Vi) in enumerate(hv):
        pad = np.pad(ycc[..., ci], ((0, PH - h), (0, PW - w)), mode="edge")
        fy, fx = vmax // Vi, hmax // Hi
        if fy > 1 or fx > 1:  # box mean per (fy, fx) window
            pad = pad.reshape(PH // fy, fy, PW // fx, fx).mean(axis=(1, 3))
        ph, pw = pad.shape
        blk = (
            (pad - 128.0)
            .reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coef = np.matmul(np.matmul(_T, blk), _T.T)
        plane_zz.append(
            np.round(coef / qts[ci]).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        )
        bpr.append(pw // 8)

    entropy = entropy_encode_interleaved(
        plane_zz, bpr, hv, mcux, mcuy, restart_interval
    )
    hdr = jpeg_header_bytes(False, ql, qc, h, w, restart_interval, samp=hv)
    return hdr + entropy + b"\xff\xd9"


def entropy_encode_interleaved(
    plane_zz, bpr, hv, mcux, mcuy, restart_interval: int = 0
) -> bytes:
    """Baseline interleaved entropy coding (T.81 F.1.2) of quantized
    zigzag coefficient grids — one (nblk, 64) int array per component
    in MCU-padded plane-raster order, Annex K tables (luma tables for
    component 0, chroma for the rest). Shared by the subsampled
    encoder and the progressive->baseline lossless transcoder."""
    # stream order: per MCU, per component, blocks raster within MCU
    order: list[tuple[int, int]] = []  # (comp, plane block index)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (Hi, Vi) in enumerate(hv):
                for v in range(Vi):
                    for u in range(Hi):
                        order.append((ci, (my * Vi + v) * bpr[ci] + mx * Hi + u))
    blocks_per_mcu = sum(H * V for H, V in hv)

    enc_dc = [_huff_encode_table(*_HT_DC_LUM), _huff_encode_table(*_HT_DC_CHR)]
    enc_ac = [_huff_encode_table(*_HT_AC_LUM), _huff_encode_table(*_HT_AC_CHR)]
    q_lists = [np.asarray(q).tolist() for q in plane_zz]
    ncomp = len(plane_zz)
    prev_dc = [0] * ncomp
    acc = 0
    nbits = 0
    buf = bytearray()
    entropy = bytearray()
    rst_count = 0
    for ei, (ci, bi) in enumerate(order):
        mcu = ei // blocks_per_mcu
        if (
            restart_interval
            and mcu
            and ei % blocks_per_mcu == 0
            and mcu % restart_interval == 0
        ):
            pad = (8 - (nbits & 7)) & 7
            acc = (acc << pad) | ((1 << pad) - 1)
            nbits += pad
            if nbits:
                buf += acc.to_bytes(nbits // 8, "big")
            entropy += _stuff_ff(buf)
            entropy += bytes((0xFF, 0xD0 + (rst_count & 7)))
            rst_count += 1
            acc, nbits, buf = 0, 0, bytearray()
            prev_dc = [0] * ncomp
        zz = q_lists[ci][bi]
        tdc, tac = enc_dc[min(ci, 1)], enc_ac[min(ci, 1)]
        dc = zz[0]
        diff = dc - prev_dc[ci]
        prev_dc[ci] = dc
        size = diff.bit_length() if diff > 0 else (-diff).bit_length()
        code, ln = tdc[size]
        acc = (acc << ln) | code
        nbits += ln
        if size:
            v = diff if diff >= 0 else diff + (1 << size) - 1
            acc = (acc << size) | v
            nbits += size
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = tac[0xF0]
                acc = (acc << ln) | code
                nbits += ln
                run -= 16
            size = v.bit_length() if v > 0 else (-v).bit_length()
            code, ln = tac[(run << 4) | size]
            acc = (acc << ln) | code
            nbits += ln
            v = v if v >= 0 else v + (1 << size) - 1
            acc = (acc << size) | v
            nbits += size
            run = 0
        if last < 63:
            code, ln = tac[0x00]
            acc = (acc << ln) | code
            nbits += ln
        if nbits >= 512:
            keep = nbits & 7
            buf += (acc >> keep).to_bytes((nbits - keep) // 8, "big")
            acc &= (1 << keep) - 1
            nbits = keep
    pad = (8 - (nbits & 7)) & 7
    acc = (acc << pad) | ((1 << pad) - 1)
    nbits += pad
    if nbits:
        buf += acc.to_bytes(nbits // 8, "big")
    entropy += _stuff_ff(buf)
    return bytes(entropy)


def _stuff_ff(raw: bytearray) -> bytes:
    """Byte stuffing (T.81 F.1.2.3): 0xFF -> 0xFF 0x00, vectorized."""
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    ff = np.nonzero(arr == 0xFF)[0]
    if len(ff):
        return np.insert(arr, ff + 1, 0).tobytes()
    return bytes(raw)


def jpeg_header_bytes(
    gray: bool, ql: np.ndarray, qc: np.ndarray, h: int, w: int,
    restart_interval: int, samp=None,
) -> bytes:
    """All marker segments up to and including SOS — the single source
    of truth shared by the scalar encoder and the wide stack encoder
    (jpegwide.encode_jpeg_stack), so their outputs stay byte-identical.
    `samp` optionally gives ((H, V), ...) per component for subsampled
    layouts; None keeps the legacy 1x1 bytes."""

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, b"\x00" + bytes(ql.reshape(64)[_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qc.reshape(64)[_ZZ].astype(np.uint8)))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sb = 0x11 if samp is None else (samp[ci][0] << 4) | samp[ci][1]
        sof += bytes([ci + 1, sb, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)  # SOF0 baseline
    for cls, tid, (bits, vals) in (
        (0, 0, _HT_DC_LUM), (1, 0, _HT_AC_LUM), (0, 1, _HT_DC_CHR), (1, 1, _HT_AC_CHR),
    ):
        if gray and tid == 1:
            continue
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    return bytes(out)


def entropy_segments(data) -> list[np.ndarray]:
    """Split a raw entropy-coded span into its restart segments, each
    unstuffed (0xFF00 -> 0xFF) — vectorized marker scan. A stream with
    no RST markers yields one segment. Accepts bytes or memoryview."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) == 0:
        return [arr]
    ff = np.nonzero(arr[:-1] == 0xFF)[0]
    nxt = arr[ff + 1]
    stuffed = ff[nxt == 0x00] + 1  # the inserted 0x00 bytes
    rst = ff[(nxt >= 0xD0) & (nxt <= 0xD7)]  # RSTn marker starts
    keep = np.ones(len(arr), dtype=bool)
    keep[stuffed] = False
    keep[rst] = False
    keep[rst + 1] = False
    if len(rst) == 0:
        return [arr[keep]]
    seg_id = np.zeros(len(arr), dtype=np.int32)
    starts = rst + 2
    seg_id[starts[starts < len(arr)]] = 1
    seg_id = np.cumsum(seg_id)
    clean, sid = arr[keep], seg_id[keep]
    nseg = len(rst) + 1
    cuts = np.searchsorted(sid, np.arange(1, nseg))
    return np.split(clean, cuts)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline (SOF0/SOF1) JFIF JPEG -> (h, w, 3) or (h, w) uint8.

    Supports any 8-bit huffman file: 4:4:4 / 4:2:2 / 4:2:0 (or any
    other sampling-factor layout) and restart intervals or not.
    Progressive (SOF2) streams route to _decode_jpeg_progressive.
    Chroma upsampling is sample replication (libjpeg's "simple"
    upsampling), shared bit-for-bit with the wide batch decoder.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple[list, list]] = {}
    comps: list[tuple[int, int]] = []  # (comp_id, qtab_id)
    hvs: list[tuple[int, int]] = []  # (H, V) sampling per component
    h = w = 0
    dri = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them or the next data bytes get misread as
        # a segment length and the parse desynchronizes
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(body[bpos + 1 : bpos + 65], dtype=np.uint8)
                qt = np.zeros(64, dtype=np.int32)
                qt[_ZZ] = zz
                qtabs[tq] = qt.reshape(8, 8)
                bpos += 65
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 (identical decode path)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG")
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, tq))
                hvs.append((samp >> 4, samp & 15))
        elif marker == 0xC2:  # progressive: detect and route
            return _decode_jpeg_progressive(data)
        elif marker == 0xC3:
            raise NotImplementedError("lossless JPEG (SOF3)")
        elif 0xC5 <= marker <= 0xCF and marker not in (0xC8, 0xCC):
            # SOF5-15: differential / arithmetic-coded / hierarchical
            # families — refuse loudly instead of skipping the frame
            # header and failing later with a confusing parse error
            raise NotImplementedError(
                "unsupported JPEG coding process (SOF%d)" % (marker - 0xC0)
            )
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 15
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nv])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                bpos += 17 + nv
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cid, tt = body[1 + 2 * si : 3 + 2 * si]
                scan.append((cid, tt >> 4, tt & 15))
            pos += ln
            break
        pos += ln
    if scan is None or not comps:
        raise ValueError("JPEG missing SOS/SOF")
    if any(hv != (1, 1) for hv in hvs):
        return _decode_baseline_subsampled(
            data, pos, qtabs, htabs, comps, hvs, h, w, dri, scan
        )
    # entropy-coded span runs to EOI; split on RST markers + unstuff
    end = data.rfind(b"\xff\xd9")
    segments = entropy_segments(data[pos : end if end > pos else len(data)])

    H, W = (h + 7) & ~7, (w + 7) & ~7
    nby, nbx = H // 8, W // 8
    nblocks = nby * nbx
    ncomp = len(comps)
    dc_t = [htabs[(0, next(t for c, t, _ in scan if c == cid))] for cid, _ in comps]
    ac_t = [htabs[(1, next(a for c, _, a in scan if c == cid))] for cid, _ in comps]
    # hot entropy loop: the bit-reader state lives in locals and the
    # coefficient blocks are plain python lists — both ~2x over
    # method-call + numpy-scalar-store variants (profiled)
    coefs_l = [[[0] * 64 for _ in range(nblocks)] for _ in range(ncomp)]
    mcu_per_seg = dri if dri else nblocks
    nseg_expected = max(1, -(-nblocks // mcu_per_seg))
    if len(segments) != nseg_expected:
        raise ValueError(
            f"JPEG restart segments: found {len(segments)}, "
            f"expected {nseg_expected} (DRI={dri}, MCUs={nblocks})"
        )
    b0 = 0
    for segarr in segments:
        data_e = segarr.tobytes()
        nd = len(data_e)
        acc, nacc, bp = 0, 0, 0
        prev_dc = [0] * ncomp  # DC prediction resets at each RST
        hi = min(b0 + mcu_per_seg, nblocks)
        for b in range(b0, hi):
            for ci in range(ncomp):
                    zz = coefs_l[ci][b]
                    dsym, dlen = dc_t[ci]
                    asym, alen = ac_t[ci]
                    # DC
                    if nacc < 16:
                        while nacc <= 24:
                            acc = (acc << 8) | (data_e[bp] if bp < nd else 0xFF)
                            bp += 1
                            nacc += 8
                    window = (acc >> (nacc - 16)) & 0xFFFF
                    ln = dlen[window]
                    if ln == 0:
                        raise ValueError("invalid Huffman code")
                    nacc -= ln
                    acc &= (1 << nacc) - 1
                    size = dsym[window]
                    if size:
                        if nacc < size:
                            while nacc <= 24:
                                acc = (acc << 8) | (data_e[bp] if bp < nd else 0xFF)
                                bp += 1
                                nacc += 8
                        nacc -= size
                        v = (acc >> nacc) & ((1 << size) - 1)
                        acc &= (1 << nacc) - 1
                        diff = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                        prev_dc[ci] += diff
                    zz[0] = prev_dc[ci]
                    # AC
                    k = 1
                    while k < 64:
                        if nacc < 16:
                            while nacc <= 24:
                                acc = (acc << 8) | (data_e[bp] if bp < nd else 0xFF)
                                bp += 1
                                nacc += 8
                        window = (acc >> (nacc - 16)) & 0xFFFF
                        ln = alen[window]
                        if ln == 0:
                            raise ValueError("invalid Huffman code")
                        nacc -= ln
                        acc &= (1 << nacc) - 1
                        rs = asym[window]
                        s = rs & 15
                        if s == 0:
                            if rs == 0xF0:
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if nacc < s:
                            while nacc <= 24:
                                acc = (acc << 8) | (data_e[bp] if bp < nd else 0xFF)
                                bp += 1
                                nacc += 8
                        nacc -= s
                        v = (acc >> nacc) & ((1 << s) - 1)
                        acc &= (1 << nacc) - 1
                        zz[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                        k += 1
        # truncation guard: refills past the real data fabricate 0xFF
        # pad bytes (legal only for the final byte's 1-bit padding).
        # Consumed bits = 8*bp - nacc; anything beyond the real stream
        # means this entropy segment ran dry mid-decode — raise instead
        # of returning plausible-looking garbage pixels.
        if 8 * bp - nacc > 8 * nd:
            raise ValueError("truncated JPEG entropy segment")
        b0 = hi
    coefs = [np.array(c, dtype=np.int32) for c in coefs_l]
    out = np.empty((h, w, ncomp), dtype=np.float64)
    for ci, (cid, tq) in enumerate(comps):
        dz = np.zeros((nblocks, 64), dtype=np.float64)
        dz[:, _ZZ] = coefs[ci] * qtabs[tq].reshape(64)[_ZZ]
        blk = dz.reshape(nblocks, 8, 8)
        spat = np.matmul(np.matmul(_T.T, blk), _T) + 128.0
        chan = spat.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(H, W)
        out[..., ci] = chan[:h, :w]
    if ncomp == 1:
        return np.clip(out[..., 0].round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(out)


def _decode_baseline_subsampled(
    data, pos, qtabs, htabs, comps, hvs, h, w, dri, scan
) -> np.ndarray:
    """Generalized baseline entropy decode for arbitrary sampling
    factors (T.81 A.2.3): per MCU the stream carries V x H raster
    blocks of each component in SOF order. Chroma planes upsample by
    sample replication. The 1x1 case stays on decode_jpeg's original
    inline loop; this path covers 4:2:0 / 4:2:2 / anything else."""
    end = data.rfind(b"\xff\xd9")
    segments = entropy_segments(data[pos : end if end > pos else len(data)])
    ncomp = len(comps)
    hmax = max(H for H, _ in hvs)
    vmax = max(V for _, V in hvs)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    bpr = [mcux * H for H, _ in hvs]  # plane blocks per row (MCU-padded)
    nblk = [mcux * H * mcuy * V for H, V in hvs]
    coefs_l = [[[0] * 64 for _ in range(nb)] for nb in nblk]
    pattern = [
        (ci, v, u)
        for ci, (H, V) in enumerate(hvs)
        for v in range(V)
        for u in range(H)
    ]
    dc_t = [htabs[(0, next(t for c, t, _ in scan if c == cid))] for cid, _ in comps]
    ac_t = [htabs[(1, next(a for c, _, a in scan if c == cid))] for cid, _ in comps]
    mcu_per_seg = dri if dri else nmcu
    nseg_expected = max(1, -(-nmcu // mcu_per_seg))
    if len(segments) != nseg_expected:
        raise ValueError(
            f"JPEG restart segments: found {len(segments)}, "
            f"expected {nseg_expected} (DRI={dri}, MCUs={nmcu})"
        )
    m0 = 0
    for segarr in segments:
        data_e = segarr.tobytes()
        nd = len(data_e)
        acc, nacc, bp = 0, 0, 0
        prev_dc = [0] * ncomp
        hi = min(m0 + mcu_per_seg, nmcu)
        for m in range(m0, hi):
            my, mx = divmod(m, mcux)
            for ci, v, u in pattern:
                bi = (my * hvs[ci][1] + v) * bpr[ci] + mx * hvs[ci][0] + u
                zz = coefs_l[ci][bi]
                dsym, dlen = dc_t[ci]
                asym, alen = ac_t[ci]
                # DC (same bit-reader as the 1x1 inline loop)
                if nacc < 16:
                    while nacc <= 24:
                        acc = (acc << 8) | (data_e[bp] if bp < nd else 0xFF)
                        bp += 1
                        nacc += 8
                window = (acc >> (nacc - 16)) & 0xFFFF
                ln = dlen[window]
                if ln == 0:
                    raise ValueError("invalid Huffman code")
                nacc -= ln
                acc &= (1 << nacc) - 1
                size = dsym[window]
                if size:
                    if nacc < size:
                        while nacc <= 24:
                            acc = (acc << 8) | (data_e[bp] if bp < nd else 0xFF)
                            bp += 1
                            nacc += 8
                    nacc -= size
                    val = (acc >> nacc) & ((1 << size) - 1)
                    acc &= (1 << nacc) - 1
                    diff = val if val >= (1 << (size - 1)) else val - (1 << size) + 1
                    prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                # AC
                k = 1
                while k < 64:
                    if nacc < 16:
                        while nacc <= 24:
                            acc = (acc << 8) | (data_e[bp] if bp < nd else 0xFF)
                            bp += 1
                            nacc += 8
                    window = (acc >> (nacc - 16)) & 0xFFFF
                    ln = alen[window]
                    if ln == 0:
                        raise ValueError("invalid Huffman code")
                    nacc -= ln
                    acc &= (1 << nacc) - 1
                    rs = asym[window]
                    s = rs & 15
                    if s == 0:
                        if rs == 0xF0:
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if nacc < s:
                        while nacc <= 24:
                            acc = (acc << 8) | (data_e[bp] if bp < nd else 0xFF)
                            bp += 1
                            nacc += 8
                    nacc -= s
                    val = (acc >> nacc) & ((1 << s) - 1)
                    acc &= (1 << nacc) - 1
                    if k < 64:
                        zz[k] = val if val >= (1 << (s - 1)) else val - (1 << s) + 1
                    k += 1
        if 8 * bp - nacc > 8 * nd:
            raise ValueError("truncated JPEG entropy segment")
        m0 = hi
    arrays = [np.array(c, dtype=np.int32) for c in coefs_l]
    return _idct_assemble(arrays, qtabs, comps, hvs, h, w, mcux, mcuy)


def _idct_assemble(arrays, qtabs, comps, hvs, h, w, mcux, mcuy) -> np.ndarray:
    """Shared tail of the subsampled-baseline and progressive decoders:
    (nblk, 64) zigzag int32 coefficient arrays per component ->
    dequantize, IDCT, plane crop, replication upsample, color."""
    hmax = max(H for H, _ in hvs)
    vmax = max(V for _, V in hvs)
    planes = []
    for ci, (cid, tq) in enumerate(comps):
        Hc, Vc = hvs[ci]
        nby, nbx = mcuy * Vc, mcux * Hc
        dz = np.zeros((arrays[ci].shape[0], 64), dtype=np.float64)
        dz[:, _ZZ] = arrays[ci] * qtabs[tq].reshape(64)[_ZZ]
        blk = dz.reshape(-1, 8, 8)
        spat = np.matmul(np.matmul(_T.T, blk), _T) + 128.0
        plane = (
            spat.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        sh, sw = -(-h * Vc // vmax), -(-w * Hc // hmax)  # sampled dims
        plane = plane[:sh, :sw]
        fy, fx = vmax // Vc, hmax // Hc
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


def _decode_jpeg_progressive(data: bytes) -> np.ndarray:
    """Progressive (SOF2) route — full Annex G decoder in jpegprog.py
    (lazy import: codecs is jpegprog's table source)."""
    from .jpegprog import decode_progressive

    return decode_progressive(data)


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE PCM 16-bit)


def encode_wav(
    samples: np.ndarray, sample_rate: int, sample_format: str = "pcm16"
) -> bytes:
    """int16 (n,) or (n, ch) -> RIFF/WAVE bytes. sample_format picks
    the container encoding: pcm8 (unsigned), pcm16 (bit-exact, the
    default), pcm24, pcm32, or float32 (IEEE, fmt tag 3)."""
    s = np.asarray(samples, dtype="<i2")
    nch = 1 if s.ndim == 1 else s.shape[1]
    tag = 1
    if sample_format == "pcm16":
        raw = s.tobytes()
        bps = 16
    elif sample_format == "pcm8":
        raw = ((s.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
        bps = 8
    elif sample_format == "pcm24":
        i32 = (s.astype("<i4") << 8).reshape(-1)
        raw = np.ascontiguousarray(i32).view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
        bps = 24
    elif sample_format == "pcm32":
        raw = (s.astype("<i4") << 16).tobytes()
        bps = 32
    elif sample_format == "float32":
        raw = (s.astype("<f4") / np.float32(32768.0)).tobytes()
        tag, bps = 3, 32
    else:
        raise ValueError(f"unknown sample_format {sample_format!r}")
    blk = nch * bps // 8
    fmt = struct.pack(
        "<HHIIHH", tag, nch, sample_rate, sample_rate * blk, blk, bps
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"  # data chunk word padding
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> (float32 (n,) or (n, ch) in [-1, 1], rate).

    Accepts the sample encodings real corpora carry: unsigned 8-bit,
    16/24/32-bit PCM and IEEE float32 (fmt tag 3), including the
    WAVE_FORMAT_EXTENSIBLE wrapper (tag 0xFFFE, sub-format GUID).
    Walks chunks properly (skips LIST/fact/etc., honors word padding).
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, nch, bps, tag, raw = 12, None, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            tag, nch, rate, _, _, bps = struct.unpack("<HHIIHH", body[:16])
            if tag == 0xFFFE and ln >= 26:  # EXTENSIBLE: real tag leads the GUID
                (tag,) = struct.unpack("<H", body[24:26])
            if (tag, bps) not in ((1, 8), (1, 16), (1, 24), (1, 32), (3, 32)):
                raise NotImplementedError(f"WAV fmt tag={tag} bits={bps}")
        elif cid == b"data":
            raw = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    if tag == 3:
        s = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    elif bps == 8:
        s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif bps == 16:
        s = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif bps == 24:
        b = np.frombuffer(raw[: len(raw) - len(raw) % 3], dtype=np.uint8).reshape(-1, 3)
        i32 = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        i32 = (i32 << 8) >> 8  # sign-extend 24 -> 32
        s = i32.astype(np.float32) / 8388608.0
    else:  # 32-bit PCM
        s = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    if nch > 1:
        s = s.reshape(-1, nch)
    return s, int(rate)


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2, Cmono / C444)


def encode_y4m(
    frames: np.ndarray, fps: float = 30.0, colourspace: str | None = None
) -> bytes:
    """uint8 (n, h, w) mono or (n, 3, h, w) planar -> YUV4MPEG2.
    colourspace None keeps the legacy inference (mono / C444);
    pass "420" to box-downsample chroma into the C420 layout real
    streams ship (even dimensions required)."""
    if frames.ndim == 3:
        n, h, w = frames.shape
        cs = "mono"
    elif frames.ndim == 4 and frames.shape[1] == 3:
        n, _, h, w = frames.shape
        cs = colourspace or "444"
    else:
        raise ValueError(f"unsupported frame shape {frames.shape}")
    num = int(round(fps * 1000))
    hdr = f"YUV4MPEG2 W{w} H{h} F{num}:1000 Ip A1:1 C{cs}\n".encode()
    payload = np.ascontiguousarray(frames, dtype=np.uint8)
    out = bytearray(hdr)
    if cs == "420":
        if h % 2 or w % 2:
            raise ValueError("C420 needs even frame dimensions")
        y = payload[:, 0].reshape(n, h * w)
        # box mean per 2x2 window, rounded like any real subsampler
        uv = (
            payload[:, 1:]
            .reshape(n, 2, h // 2, 2, w // 2, 2)
            .mean(axis=(3, 5))
            .round()
            .astype(np.uint8)
            .reshape(n, 2 * (h // 2) * (w // 2))
        )
        flat = np.concatenate([y, uv], axis=1)
        fsz = flat.shape[1]
    else:
        # from the shape, not payload[0]: a zero-frame clip is a valid
        # header-only stream, not an IndexError
        fsz = h * w * (1 if cs == "mono" else 3)
        flat = payload.reshape(n, fsz)
    for i in range(n):
        out += b"FRAME\n"
        out += flat[i].tobytes()
    return bytes(out)


def y4m_info(data: bytes) -> dict:
    """Parse the stream header -> {w, h, fps, n_frames, frame_size,
    data_offset, planes}. O(1): frame count derives from fixed size."""
    nl = data.index(b"\n")
    toks = data[:nl].decode().split()
    if toks[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = 30.0
    cs = "420"  # y4m default colourspace
    for t in toks[1:]:
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps = int(num) / int(den)
        elif t[0] == "C":
            cs = t[1:]
    if cs == "mono":
        planes, fsz = 1, w * h
    elif cs == "444":
        planes, fsz = 3, 3 * w * h
    elif cs in ("420", "420jpeg", "420mpeg2", "420paldv"):
        # the dominant real-world layout; siting variants share the
        # byte layout (we replicate samples, no chroma filtering)
        planes, fsz = 3, w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    else:
        raise NotImplementedError(f"y4m colourspace C{cs}")
    stride = 6 + fsz  # b"FRAME\n" + payload (no frame params emitted)
    n = (len(data) - (nl + 1)) // stride
    return {
        "w": w, "h": h, "fps": fps, "n_frames": n, "frame_size": fsz,
        "data_offset": nl + 1, "stride": stride, "planes": planes,
        "cs": cs,
    }


def decode_y4m_frame(data: bytes, idx: int, info: dict | None = None) -> np.ndarray:
    """O(1) seek to frame idx -> (h, w) mono or (3, h, w) planar 444."""
    if info is None:
        info = y4m_info(data)
    if not 0 <= idx < info["n_frames"]:
        raise IndexError(f"frame {idx} of {info['n_frames']}")
    off = info["data_offset"] + idx * info["stride"]
    if data[off : off + 6] != b"FRAME\n":
        raise ValueError(f"bad FRAME header at {off}")
    px = np.frombuffer(data, dtype=np.uint8, count=info["frame_size"], offset=off + 6)
    h, w = info["h"], info["w"]
    if info["planes"] == 1:
        return px.reshape(h, w)
    if info.get("cs", "444").startswith("420"):
        # chroma replication-upsample (same convention as the JPEG
        # decoders) -> full-res planar (3, h, w)
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        y = px[: h * w].reshape(h, w)
        u = px[h * w : h * w + h2 * w2].reshape(h2, w2)
        v = px[h * w + h2 * w2 :].reshape(h2, w2)
        out = np.empty((3, h, w), dtype=np.uint8)
        out[0] = y
        out[1] = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
        out[2] = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
        return out
    return px.reshape(3, h, w)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
