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
