"""S6/S7: WKB polygon ingestion — arbitrary polygon layers arrive as
a table with a binary WKB column plus attribute columns (the Ray
restatement of the reference's OGR vector reads,
src/pointzonalstats.cpp:323-363 and src/lasclip.cpp:60-97).

Supports WKB Polygon (type 3) and MultiPolygon (type 6), 2-D, both
byte orders; Z/M variants raise. A writer round-trips for tests and
the vector sink edge."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..ops.zonal import Polygon


def _read_ring(buf: memoryview, off: int, fmt: str) -> tuple[tuple, int]:
    (n,) = struct.unpack_from(fmt + "I", buf, off)
    off += 4
    pts = struct.unpack_from(fmt + "d" * (2 * n), buf, off)
    off += 16 * n
    ring = tuple((pts[2 * i], pts[2 * i + 1]) for i in range(n))
    # drop the closing vertex (WKB rings repeat the first point; the
    # PIP kernel closes implicitly)
    if len(ring) > 1 and ring[0] == ring[-1]:
        ring = ring[:-1]
    return ring, off


def _read_polygon_body(buf: memoryview, off: int, fmt: str) -> tuple[tuple, int]:
    (nrings,) = struct.unpack_from(fmt + "I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        ring, off = _read_ring(buf, off, fmt)
        rings.append(ring)
    return tuple(rings), off


def parse_wkb(data: bytes) -> tuple:
    """-> tuple of rings (outer first; multipolygon parts concatenated
    — even-odd PIP over the union of rings matches GEOS contains for
    disjoint parts)."""
    buf = memoryview(data)
    off = 0
    rings: list = []

    def one(off: int) -> int:
        nonlocal rings
        byte_order = buf[off]
        off += 1
        fmt = "<" if byte_order == 1 else ">"
        (gtype,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        # EWKB Z/M flags, ISO Z/M type ranges (1000 <= gtype: 1003
        # PolygonZ, 2003 PolygonM, 3003 ZM, ...), and the PostGIS SRID
        # flag — the SRID payload must be consumed or it parses as a
        # ring count and dies mid-buffer with an opaque struct.error
        if gtype & 0x80000000 or gtype & 0x40000000 or 1000 <= (gtype & 0xFFFF) < 0x8000:
            raise ValueError(f"WKB Z/M geometries not supported (type {gtype:#x})")
        if gtype & 0x20000000:  # EWKB embedded SRID: skip the 4 bytes
            off += 4
            gtype &= ~0x20000000
        base = gtype & 0xFF
        if base == 3:
            part, off = _read_polygon_body(buf, off, fmt)
            rings.extend(part)
        elif base == 6:
            (nparts,) = struct.unpack_from(fmt + "I", buf, off)
            off += 4
            for _ in range(nparts):
                off = one(off)
        else:
            raise ValueError(f"unsupported WKB geometry type {base}")
        return off

    one(0)
    return tuple(rings)


def polygon_to_wkb(rings: tuple) -> bytes:
    """Little-endian WKB Polygon from rings (auto re-closes them)."""
    out = [b"\x01", struct.pack("<I", 3), struct.pack("<I", len(rings))]
    for ring in rings:
        closed = list(ring)
        if closed and closed[0] != closed[-1]:
            closed.append(closed[0])
        out.append(struct.pack("<I", len(closed)))
        for x, y in closed:
            out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def read_polygon_table(
    table: pa.Table,
    id_col: str = "polygon_id",
    wkb_col: str = "wkb",
    attr_cols: tuple[str, ...] = (),
):
    """-> (list[Polygon], attrs DataFrame indexed by polygon id) —
    the broadcast side for zonal_join / clip, with attribute
    carry-through."""
    import pandas as pd

    ids = table[id_col].to_numpy(zero_copy_only=False)
    polys = [
        Polygon(int(i), parse_wkb(w))
        for i, w in zip(ids, table[wkb_col].to_pylist())
    ]
    attrs = pd.DataFrame(
        {c: table[c].to_pandas().to_numpy() for c in attr_cols},
        index=pd.Index(ids, name=id_col),
    )
    return polys, attrs


def write_polygon_table(
    path: str,
    polygons,
    attrs=None,
    id_col: str = "polygon_id",
    wkb_col: str = "wkb",
) -> pa.Table:
    """S7 vector sink: polygons + carried attributes -> parquet with a
    WKB geometry column (the reference's shapefile write with copied
    fields + appended stats, src/pointzonalstats.cpp:417-491).
    Returns the written table."""
    import pyarrow.parquet as pq

    cols = {
        id_col: np.array([p.polygon_id for p in polygons], dtype=np.int64),
        wkb_col: pa.array([polygon_to_wkb(p.rings) for p in polygons], pa.binary()),
    }
    if attrs is not None:
        for c in attrs.columns:
            cols[c] = attrs.loc[[p.polygon_id for p in polygons], c].to_numpy()
    t = pa.table(cols)
    pq.write_table(t, path)
    return t
