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
