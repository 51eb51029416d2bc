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
    if comp != 1:
        raise NotImplementedError("only uncompressed TIFF supported")
    bps = tags[258]
    if any(b != 32 for b in bps):
        raise NotImplementedError("only 32-bit samples supported")
    fmt = tags.get(339, (3,) * spp)
    dtype = np.float32 if fmt[0] == 3 else (np.int32 if fmt[0] == 2 else np.uint32)
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = tags.get(278, (H,))[0]
    data = np.empty((H, W, spp), dtype=dtype)
    row = 0
    for o, c in zip(offsets, counts):
        nrows = min(rows_per_strip, H - row)
        arr = np.frombuffer(buf[o : o + c], dtype=(bo + "f4") if dtype == np.float32 else dtype)
        data[row : row + nrows] = arr.reshape(nrows, W, spp)
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


def write_tiff(path: str, bands: np.ndarray, geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0)):
    """S5 write path: minimal little-endian uncompressed GeoTIFF —
    float32 pixel-interleaved strips (one per row), ModelPixelScale +
    ModelTiepoint from a gdal-style geotransform. Round-trips through
    read_tiff; enough for the reference's raster interchange
    (src/raster.cpp GDAL writes) without GDAL."""
    bands = np.asarray(bands, dtype=np.float32)
    if bands.ndim == 2:
        bands = bands[None, ...]
    S, H, W = bands.shape
    pix = np.ascontiguousarray(np.moveaxis(bands, 0, 2))  # (H, W, S)

    gx, sx, _, gy, _, nsy = geotransform
    sy = -nsy
    rowbytes = W * S * 4
    entries = []  # (tag, type, count, value_or_bytes)

    data_start_placeholder = 0  # patched below
    strip_offsets = None

    def val_entry(tag, typ, cnt, vals):
        entries.append((tag, typ, cnt, vals))

    val_entry(256, 3, 1, (W,))
    val_entry(257, 3, 1, (H,))
    val_entry(258, 3, S, tuple([32] * S))
    val_entry(259, 3, 1, (1,))           # uncompressed
    val_entry(262, 3, 1, (1,))           # BlackIsZero
    val_entry(273, 4, H, None)           # strip offsets (patched)
    val_entry(277, 3, 1, (S,))
    val_entry(278, 3, 1, (1,))           # 1 row per strip
    val_entry(279, 4, H, tuple([rowbytes] * H))
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
    strip_offsets = tuple(data_off + i * rowbytes for i in range(H))

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
    out += pix.astype("<f4").tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))
