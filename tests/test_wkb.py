"""S6 WKB polygon source: round-trip, multipolygon, big-endian."""

import struct

import numpy as np
import pyarrow as pa


def test_wkb_roundtrip():
    from geotools_ray.sources.wkb import parse_wkb, polygon_to_wkb

    rings = (((0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)),
             ((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)))
    assert parse_wkb(polygon_to_wkb(rings)) == rings


def test_wkb_multipolygon_and_big_endian():
    from geotools_ray.sources.wkb import parse_wkb, polygon_to_wkb

    p1 = polygon_to_wkb((((0.0, 0.0), (1.0, 0.0), (1.0, 1.0)),))
    p2 = polygon_to_wkb((((5.0, 5.0), (6.0, 5.0), (6.0, 6.0)),))
    multi = b"\x01" + struct.pack("<I", 6) + struct.pack("<I", 2) + p1 + p2
    rings = parse_wkb(multi)
    assert len(rings) == 2
    assert rings[0][0] == (0.0, 0.0) and rings[1][0] == (5.0, 5.0)

    # big-endian single polygon
    be = (
        b"\x00" + struct.pack(">I", 3) + struct.pack(">I", 1)
        + struct.pack(">I", 4)
        + struct.pack(">dd", 0.0, 0.0) + struct.pack(">dd", 2.0, 0.0)
        + struct.pack(">dd", 2.0, 2.0) + struct.pack(">dd", 0.0, 0.0)
    )
    assert parse_wkb(be) == (((0.0, 0.0), (2.0, 0.0), (2.0, 2.0)),)


def test_wkb_z_rejected():
    import pytest

    from geotools_ray.sources.wkb import parse_wkb

    wkb_z = b"\x01" + struct.pack("<I", 0x80000003) + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        parse_wkb(wkb_z)
    # ISO Z/M numeric types (1003 PolygonZ etc.) hit the Z/M message,
    # not the generic unsupported-type error (base>1000 was unreachable)
    with pytest.raises(ValueError, match="Z/M"):
        parse_wkb(b"\x01" + struct.pack("<I", 1003) + struct.pack("<I", 0))


def test_wkb_ewkb_srid_skipped():
    """Regression: PostGIS EWKB's embedded SRID (flag 0x20000000) was
    parsed as the ring count, dying mid-buffer. The SRID must be
    consumed and the geometry parse normally."""
    from geotools_ray.sources.wkb import parse_wkb, polygon_to_wkb

    ring = ((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))
    plain = polygon_to_wkb((ring,))
    # splice the EWKB SRID flag + SRID 4326 into the plain encoding
    ewkb = b"\x01" + struct.pack("<I", 3 | 0x20000000) + struct.pack("<I", 4326) + plain[5:]
    assert parse_wkb(ewkb) == parse_wkb(plain)


def test_read_polygon_table_attrs():
    from geotools_ray.sources.wkb import polygon_to_wkb, read_polygon_table

    t = pa.table(
        {
            "polygon_id": np.array([7, 9], dtype=np.int64),
            "wkb": pa.array(
                [polygon_to_wkb((((0.0, 0.0), (1.0, 0.0), (1.0, 1.0)),)),
                 polygon_to_wkb((((2.0, 2.0), (3.0, 2.0), (3.0, 3.0)),))],
                pa.binary(),
            ),
            "name": ["a", "b"],
        }
    )
    polys, attrs = read_polygon_table(t, attr_cols=("name",))
    assert [p.polygon_id for p in polys] == [7, 9]
    assert attrs.loc[9, "name"] == "b"


def test_write_polygon_table_roundtrip(tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    from geotools_ray.ops.zonal import rect
    from geotools_ray.sources.wkb import read_polygon_table, write_polygon_table

    polys = [rect(1, 0, 0, 5, 5), rect(2, 10, 10, 20, 15)]
    attrs = pd.DataFrame({"name": ["a", "b"]}, index=pd.Index([1, 2], name="polygon_id"))
    p = str(tmp_path / "layer.parquet")
    write_polygon_table(p, polys, attrs)
    polys2, attrs2 = read_polygon_table(pq.read_table(p), attr_cols=("name",))
    assert [q.polygon_id for q in polys2] == [1, 2]
    assert polys2[0].rings == polys[0].rings
    assert attrs2.loc[2, "name"] == "b"
