"""ESRI Shapefile ingestion (.shp/.shx/.dbf) — from the published
format spec (ESRI Shapefile Technical Description, July 1998), no OGR.

The reference reads clip/zone polygon layers through
OGRDataSource (src/lasclip.cpp:60-97, src/pointzonalstats.cpp:323-363);
here a shapefile parses straight into the engine's WKB polygon TABLE
(sources/wkb.py schema: polygon_id, wkb, attributes), so everything
downstream (zonal_join, clip, cell-cover prefilter, broadcast) is the
one existing path.

Scale posture: polygon layers are SMALL side inputs (thousands of
zones against billions of points) — the file parses on the driver (or
inside one task) and broadcasts, like every other polygon source in
this engine. Parsing is record-walk over memoryviews; ring points
land in numpy via frombuffer, never per-vertex Python floats.

Supported: shape type 5 (Polygon, incl. multi-ring/multi-part) and 15
(PolygonZ — Z/M payloads skipped); null shapes (type 0) yield empty
geometry. A writer (write_shapefile) emits the .shp/.shx/.dbf triple
for fixtures and the vector-sink edge."""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

_SHP_MAGIC = 9994
_TYPE_NULL = 0
_TYPE_POLYGON = 5
_TYPE_POLYGONZ = 15


def _parse_polygon_content(buf: memoryview, off: int):
    """One record's content -> tuple of rings ((x, y), ...) with the
    closing vertex dropped (the PIP kernel closes implicitly)."""
    (stype,) = struct.unpack_from("<i", buf, off)
    if stype == _TYPE_NULL:
        return ()
    if stype not in (_TYPE_POLYGON, _TYPE_POLYGONZ):
        raise NotImplementedError(f"shapefile shape type {stype} (polygon layers only)")
    nparts, npoints = struct.unpack_from("<2i", buf, off + 36)
    parts = np.frombuffer(buf, dtype="<i4", count=nparts, offset=off + 44)
    pts = np.frombuffer(
        buf, dtype="<f8", count=2 * npoints, offset=off + 44 + 4 * nparts
    ).reshape(npoints, 2)
    rings = []
    bounds = np.append(parts, npoints)
    for i in range(nparts):
        ring = pts[bounds[i] : bounds[i + 1]]
        if len(ring) > 1 and (ring[0] == ring[-1]).all():
            ring = ring[:-1]
        rings.append(tuple((float(x), float(y)) for x, y in ring))
    return tuple(rings)


def read_shp_geometries(path: str) -> list[tuple[int, tuple]]:
    """.shp -> [(record_number, rings)] (record numbers are 1-based
    per the spec)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = memoryview(data)
    (magic,) = struct.unpack_from(">i", buf, 0)
    if magic != _SHP_MAGIC:
        raise ValueError(f"{path}: not a shapefile (file code {magic})")
    (flen_words,) = struct.unpack_from(">i", buf, 24)
    end = min(len(data), flen_words * 2)
    out = []
    off = 100
    while off + 8 <= end:
        recnum, content_words = struct.unpack_from(">2i", buf, off)
        off += 8
        rings = _parse_polygon_content(buf, off)
        out.append((recnum, rings))
        off += content_words * 2
    return out


# ---------------------------------------------------------------------------
# dBase III (.dbf)


def read_dbf(path: str) -> dict[str, list]:
    """.dbf -> {field: values} (C -> str, N/F -> int64 or float,
    L -> bool, D -> str); deleted records ('*' flag) are skipped."""
    with open(path, "rb") as f:
        data = f.read()
    nrec = struct.unpack_from("<I", data, 4)[0]
    hdr_size, rec_size = struct.unpack_from("<2H", data, 8)
    fields = []
    off = 32
    while off < hdr_size - 1 and data[off] != 0x0D:
        name = data[off : off + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fdec = data[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    cols: dict[str, list] = {name: [] for name, _, _, _ in fields}
    off = hdr_size
    for _ in range(nrec):
        if off + rec_size > len(data):
            raise ValueError(f"{path}: truncated dbf record")
        if data[off] == 0x2A:  # '*' = deleted
            off += rec_size
            continue
        pos = off + 1
        for name, ftype, flen, fdec in fields:
            raw = data[pos : pos + flen].decode("ascii", "replace").strip()
            pos += flen
            if ftype in ("N", "F"):
                if not raw:
                    cols[name].append(None)
                elif ftype == "N" and fdec == 0 and "." not in raw:
                    cols[name].append(int(raw))
                else:
                    cols[name].append(float(raw))
            elif ftype == "L":
                cols[name].append(raw.upper() in ("T", "Y"))
            else:
                cols[name].append(raw)
        off += rec_size
    return cols


def read_shapefile(path: str) -> pa.Table:
    """.shp (+ sibling .dbf when present) -> the engine's WKB polygon
    table: polygon_id (the DBF's polygon_id/id column when present,
    else the 1-based record number), wkb, plus every DBF attribute."""
    from .wkb import polygon_to_wkb

    geoms = read_shp_geometries(path)
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    attrs = read_dbf(dbf_path) if os.path.exists(dbf_path) else {}
    for name, vals in attrs.items():
        if len(vals) != len(geoms):
            raise ValueError(
                f"{path}: dbf has {len(vals)} records for {len(geoms)} shapes"
            )
    id_col = next(
        (c for c in attrs if c.lower() in ("polygon_id", "id", "fid")), None
    )
    ids = (
        np.asarray(attrs[id_col], dtype=np.int64)
        if id_col
        else np.array([rn for rn, _ in geoms], dtype=np.int64)
    )
    cols = {
        "polygon_id": pa.array(ids, type=pa.int64()),
        "wkb": pa.array(
            [polygon_to_wkb(rings) for _, rings in geoms], type=pa.binary()
        ),
    }
    for name, vals in attrs.items():
        if name == id_col:
            continue
        cols[name] = pa.array(vals)
    return pa.table(cols)


# ---------------------------------------------------------------------------
# writer (.shp/.shx/.dbf triple) — fixtures + the vector-sink edge


def write_shapefile(
    path: str, polygons: list, attrs: dict[str, list] | None = None
) -> None:
    """polygons: list of ring tuples (ops.zonal.Polygon.rings shape).
    Writes path(.shp), .shx and .dbf (attrs: {field: values}; numeric
    fields write as N/19 or N/19.6, strings as C/max-len)."""
    shp = bytearray(100)
    shx_recs = bytearray()
    recs = bytearray()
    allx: list[float] = []
    ally: list[float] = []
    for i, rings in enumerate(polygons):
        closed = [list(r) + [r[0]] for r in rings if len(r)]
        npoints = sum(len(r) for r in closed)
        parts = []
        acc = 0
        for r in closed:
            parts.append(acc)
            acc += len(r)
        xs = [p[0] for r in closed for p in r]
        ys = [p[1] for r in closed for p in r]
        allx += xs
        ally += ys
        content = struct.pack(
            "<i4d2i", _TYPE_POLYGON, min(xs), min(ys), max(xs), max(ys),
            len(closed), npoints,
        )
        content += struct.pack(f"<{len(parts)}i", *parts)
        content += b"".join(struct.pack("<2d", x, y) for x, y in zip(xs, ys))
        shx_recs += struct.pack(">2i", (100 + len(recs)) // 2, len(content) // 2)
        recs += struct.pack(">2i", i + 1, len(content) // 2) + content

    def header(total_bytes: int) -> bytes:
        h = bytearray(100)
        struct.pack_into(">i", h, 0, _SHP_MAGIC)
        struct.pack_into(">i", h, 24, total_bytes // 2)
        struct.pack_into("<i", h, 28, 1000)  # version
        struct.pack_into("<i", h, 32, _TYPE_POLYGON)
        if allx:
            struct.pack_into(
                "<4d", h, 36, min(allx), min(ally), max(allx), max(ally)
            )
        return bytes(h)

    base = os.path.splitext(path)[0]
    with open(base + ".shp", "wb") as f:
        f.write(header(100 + len(recs)))
        f.write(recs)
    with open(base + ".shx", "wb") as f:
        f.write(header(100 + len(shx_recs)))
        f.write(shx_recs)

    attrs = attrs or {}
    fields = []
    for name, vals in attrs.items():
        if all(isinstance(v, (int, np.integer)) for v in vals):
            fields.append((name, "N", 19, 0))
        elif all(isinstance(v, (int, float, np.floating, np.integer)) for v in vals):
            fields.append((name, "N", 19, 6))
        else:
            fields.append((name, "C", max((len(str(v)) for v in vals), default=1), 0))
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    dbf = bytearray()
    dbf += struct.pack(
        "<B3BIHH20x", 0x03, 95, 1, 1, len(polygons), hdr_size, rec_size
    )
    for name, ftype, flen, fdec in fields:
        fd = bytearray(32)
        fd[0:11] = name.encode("ascii")[:10].ljust(11, b"\x00")
        fd[11] = ord(ftype)
        fd[16] = flen
        fd[17] = fdec
        dbf += fd
    dbf += b"\x0d"
    for i in range(len(polygons)):
        dbf += b" "  # not deleted
        for name, ftype, flen, fdec in fields:
            v = attrs[name][i]
            if ftype == "N":
                s = (f"{v:.{fdec}f}" if fdec else str(int(v))).rjust(flen)
            else:
                s = str(v).ljust(flen)
            dbf += s.encode("ascii")[:flen]
    dbf += b"\x1a"
    with open(base + ".dbf", "wb") as f:
        f.write(dbf)
