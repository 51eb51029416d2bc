"""Minimal uncompressed-TIFF reader (S10-adjacent): enough to load the
reference's NAD83v6VG.tif velocity grid (little-endian, strip-per-row,
pixel-interleaved float32, GeoTIFF PixelScale + Tiepoint) without GDAL.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPESIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8, 16: 8, 17: 8}


def _read_ifd(buf: bytes, bo: str):
    off = struct.unpack(bo + "I", buf[4:8])[0]
    n = struct.unpack(bo + "H", buf[off : off + 2])[0]
    tags = {}
    for i in range(n):
        e = buf[off + 2 + i * 12 : off + 14 + i * 12]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        size = _TYPESIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = e[8 : 8 + size]
        else:
            ptr = struct.unpack(bo + "I", e[8:12])[0]
            raw = buf[ptr : ptr + size]
        if typ == 3:
            vals = struct.unpack(bo + f"{cnt}H", raw)
        elif typ == 4:
            vals = struct.unpack(bo + f"{cnt}I", raw)
        elif typ == 12:
            vals = struct.unpack(bo + f"{cnt}d", raw)
        elif typ == 11:
            vals = struct.unpack(bo + f"{cnt}f", raw)
        else:
            vals = (raw,)
        tags[tag] = vals
    return tags


def read_tiff(path: str):
    """-> (bands (S, H, W) float array, gdal-style geotransform tuple)."""
    buf = open(path, "rb").read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    tags = _read_ifd(buf, bo)
    W = tags[256][0]
    H = tags[257][0]
    spp = tags.get(277, (1,))[0]
    comp = tags.get(259, (1,))[0]
    pred = tags.get(317, (1,))[0]
    if comp not in (1, 8, 32946, 32773):
        raise NotImplementedError(f"unsupported TIFF compression {comp}")
    bps = tags[258]
    if any(b != 32 for b in bps):
        raise NotImplementedError("only 32-bit samples supported")
    if tags.get(284, (1,))[0] != 1 and spp > 1:
        # planar interleave would be silently scrambled by the chunky
        # reshape below
        raise NotImplementedError("PlanarConfiguration=2 (planar) not supported")
    # TIFF 6.0 default for SampleFormat is 1 (unsigned int), NOT float
    fmt = tags.get(339, (1,) * spp)
    dtype = np.float32 if fmt[0] == 3 else (np.int32 if fmt[0] == 2 else np.uint32)
    if pred == 2 and dtype == np.float32:
        raise NotImplementedError("predictor=2 applies to integer samples")
    if pred not in (1, 2):
        raise NotImplementedError(f"unsupported TIFF predictor {pred}")
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = tags.get(278, (H,))[0]
    data = np.empty((H, W, spp), dtype=dtype)
    row = 0
    for o, c in zip(offsets, counts):
        nrows = min(rows_per_strip, H - row)
        raw = buf[o : o + c]
        if comp in (8, 32946):
            import zlib

            raw = zlib.decompress(raw)
        elif comp == 32773:
            raw = _unpackbits(raw)
        # byte order applies to EVERY sample type, not just float
        arr = np.frombuffer(
            raw,
            dtype=bo + ("f4" if dtype == np.float32 else "i4" if dtype == np.int32 else "u4"),
        )
        strip = arr[: nrows * W * spp].reshape(nrows, W, spp)
        if pred == 2:
            strip = np.cumsum(strip.astype(np.int64), axis=1).astype(dtype)
        data[row : row + nrows] = strip
        row += nrows
    bands = np.moveaxis(data, 2, 0)

    # GeoTIFF: ModelPixelScale (33550) + ModelTiepoint (33922)
    tg = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    if 33550 in tags and 33922 in tags:
        sx, sy, _ = tags[33550][:3]
        i, j, _, gx, gy, _ = tags[33922][:6]
        # gdal geotransform: (originX, px_w, 0, originY, 0, -px_h)
        tg = (gx - i * sx, sx, 0.0, gy + j * sy, 0.0, -sy)
    return bands, tg


def _unpackbits(raw: bytes) -> bytes:
    """TIFF PackBits (RLE) decode."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        i += 1
        if c < 128:
            out += raw[i : i + c + 1]
            i += c + 1
        elif c > 128:
            out += raw[i : i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _packbits(raw: bytes) -> bytes:
    """TIFF PackBits (RLE) encode — literal-runs + repeat-runs,
    round-trips through _unpackbits."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        # find a repeat run of >= 3
        j = i
        while j + 1 < n and raw[j + 1] == raw[j] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out += bytes([257 - run, raw[i]])
            i = j + 1
            continue
        # literal run until the next >=3 repeat (max 128); j is the
        # EXCLUSIVE end — code byte (j-i-1) promises exactly j-i bytes,
        # so spec-compliant readers (libtiff/GDAL) stay in sync even
        # when the data ends mid-literal
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and raw[j] == raw[j + 1] == raw[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + raw[i:j]
        i = j
    return bytes(out)


def write_tiff(path: str, bands: np.ndarray, geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
               compress: str | None = None):
    """S5 write path: minimal little-endian GeoTIFF — float32
    pixel-interleaved strips (one per row), ModelPixelScale +
    ModelTiepoint from a gdal-style geotransform; compress in
    {None, "deflate", "packbits"}. Round-trips through read_tiff;
    enough for the reference's raster interchange (src/raster.cpp
    GDAL writes) without GDAL."""
    bands = np.asarray(bands, dtype=np.float32)
    if bands.ndim == 2:
        bands = bands[None, ...]
    S, H, W = bands.shape
    pix = np.ascontiguousarray(np.moveaxis(bands, 0, 2))  # (H, W, S)

    gx, sx, _, gy, _, nsy = geotransform
    sy = -nsy
    raw_rows = [pix[r].astype("<f4").tobytes() for r in range(H)]
    if compress is None:
        comp_code, strips = 1, raw_rows
    elif compress == "deflate":
        import zlib

        comp_code, strips = 8, [zlib.compress(r, 6) for r in raw_rows]
    elif compress == "packbits":
        comp_code, strips = 32773, [_packbits(r) for r in raw_rows]
    else:
        raise ValueError(f"unknown compress {compress!r}")
    entries = []  # (tag, type, count, value_or_bytes)

    def val_entry(tag, typ, cnt, vals):
        entries.append((tag, typ, cnt, vals))

    # dims as LONG (type 4): SHORT caps at 65535 and large mosaics
    # crashed mid-write with struct.error
    val_entry(256, 4, 1, (W,))
    val_entry(257, 4, 1, (H,))
    val_entry(258, 3, S, tuple([32] * S))
    val_entry(259, 3, 1, (comp_code,))
    val_entry(262, 3, 1, (1,))           # BlackIsZero
    val_entry(273, 4, H, None)           # strip offsets (patched)
    val_entry(277, 3, 1, (S,))
    val_entry(278, 3, 1, (1,))           # 1 row per strip
    val_entry(279, 4, H, tuple(len(s) for s in strips))
    val_entry(284, 3, 1, (1,))           # chunky
    val_entry(339, 3, S, tuple([3] * S))  # IEEE float
    val_entry(33550, 12, 3, (sx, sy, 0.0))
    val_entry(33922, 12, 6, (0.0, 0.0, 0.0, gx, gy, 0.0))

    _TYPEFMT = {3: "H", 4: "I", 12: "d"}
    _TSIZE = {3: 2, 4: 4, 12: 8}

    header = struct.pack("<2sHI", b"II", 42, 8)
    n = len(entries)
    ifd_size = 2 + n * 12 + 4
    extra_off = 8 + ifd_size
    # first pass: lay out overflow areas
    extras = []
    cur = extra_off
    laid = []
    for tag, typ, cnt, vals in entries:
        size = _TSIZE[typ] * cnt
        if size <= 4:
            laid.append((tag, typ, cnt, vals, None))
        else:
            laid.append((tag, typ, cnt, vals, cur))
            cur += size
    data_off = cur
    cum = np.concatenate([[0], np.cumsum([len(s) for s in strips])[:-1]]).astype(np.int64)
    strip_offsets = tuple(int(data_off + c) for c in cum)

    out = bytearray()
    out += header
    out += struct.pack("<H", n)
    for tag, typ, cnt, vals, ptr in laid:
        if tag == 273:
            vals = strip_offsets if cnt > 1 else (strip_offsets[0],)
        fmt = "<" + _TYPEFMT[typ] * cnt
        raw = struct.pack(fmt, *vals)
        if len(raw) <= 4:
            out += struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\0")
        else:
            out += struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", ptr)
    out += struct.pack("<I", 0)  # no next IFD
    for tag, typ, cnt, vals, ptr in laid:
        if ptr is None:
            continue
        if tag == 273:
            vals = strip_offsets
        out += struct.pack("<" + _TYPEFMT[typ] * cnt, *vals)
    assert len(out) == data_off, (len(out), data_off)
    out += b"".join(strips)
    with open(path, "wb") as f:
        f.write(bytes(out))
