"""sources/shp.py: ESRI shapefile (.shp/.shx/.dbf) reader/writer."""

import os
import struct

import numpy as np
import pytest

from geotools_ray.sources import shp as S


RINGS_A = (((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),)
# polygon with a hole
RINGS_B = (
    ((20.0, 20.0), (40.0, 20.0), (40.0, 40.0), (20.0, 40.0)),
    ((25.0, 25.0), (30.0, 25.0), (30.0, 30.0), (25.0, 30.0)),
)


def test_roundtrip_polygons_and_attrs(tmp_path):
    base = str(tmp_path / "zones")
    S.write_shapefile(
        base,
        [RINGS_A, RINGS_B],
        {"polygon_id": [7, 9], "name": ["alpha", "beta"], "score": [1.5, -2.25]},
    )
    for ext in (".shp", ".shx", ".dbf"):
        assert os.path.exists(base + ext)
    t = S.read_shapefile(base + ".shp")
    assert t["polygon_id"].to_pylist() == [7, 9]
    assert t["name"].to_pylist() == ["alpha", "beta"]
    assert t["score"].to_pylist() == [1.5, -2.25]
    # geometry survives through the WKB column -> the engine's parser
    from geotools_ray.sources.wkb import parse_wkb

    assert parse_wkb(t["wkb"][0].as_py()) == RINGS_A
    assert parse_wkb(t["wkb"][1].as_py()) == RINGS_B


def test_geometry_feeds_pip_kernel(tmp_path):
    """A shapefile zone behaves identically to the same polygon built
    directly — including the hole (even-odd)."""
    from geotools_ray.kernels.geom import points_in_polygon
    from geotools_ray.sources.wkb import parse_wkb

    base = str(tmp_path / "holes")
    S.write_shapefile(base, [RINGS_B], {"polygon_id": [1]})
    rings = parse_wkb(S.read_shapefile(base + ".shp")["wkb"][0].as_py())
    x = np.array([21.0, 27.0, 35.0, 50.0])
    y = np.array([21.0, 27.0, 35.0, 50.0])
    hits = points_in_polygon(x, y, [list(r) for r in rings])
    assert hits.tolist() == [True, False, True, False]  # hole excluded


def test_record_numbers_used_when_no_id_column(tmp_path):
    base = str(tmp_path / "noid")
    S.write_shapefile(base, [RINGS_A, RINGS_B], {"name": ["a", "b"]})
    t = S.read_shapefile(base + ".shp")
    assert t["polygon_id"].to_pylist() == [1, 2]  # 1-based record numbers


def test_null_shape_and_missing_dbf(tmp_path):
    base = str(tmp_path / "nulls")
    S.write_shapefile(base, [RINGS_A], {})
    # append a null-shape record by hand
    raw = bytearray(open(base + ".shp", "rb").read())
    content = struct.pack("<i", 0)
    raw += struct.pack(">2i", 2, len(content) // 2) + content
    struct.pack_into(">i", raw, 24, len(raw) // 2)
    with open(base + ".shp", "wb") as f:
        f.write(raw)
    os.remove(base + ".dbf")
    t = S.read_shapefile(base + ".shp")
    assert len(t) == 2
    assert t["polygon_id"].to_pylist() == [1, 2]


def test_loud_errors(tmp_path):
    p = str(tmp_path / "bad.shp")
    with open(p, "wb") as f:
        f.write(b"\x00" * 100)
    with pytest.raises(ValueError, match="file code"):
        S.read_shp_geometries(p)
    # unsupported shape type (point = 1)
    base = str(tmp_path / "pt")
    S.write_shapefile(base, [RINGS_A], {})
    raw = bytearray(open(base + ".shp", "rb").read())
    struct.pack_into("<i", raw, 108, 1)  # first record's shape type
    with open(base + ".shp", "wb") as f:
        f.write(raw)
    with pytest.raises(NotImplementedError, match="shape type"):
        S.read_shp_geometries(base + ".shp")


def test_dbf_deleted_rows_and_types(tmp_path):
    base = str(tmp_path / "dt")
    S.write_shapefile(
        base, [RINGS_A, RINGS_B], {"polygon_id": [1, 2], "flag": ["x", "y"]}
    )
    # mark record 1 deleted in the dbf
    raw = bytearray(open(base + ".dbf", "rb").read())
    hdr_size = struct.unpack_from("<H", raw, 8)[0]
    raw[hdr_size] = 0x2A
    with open(base + ".dbf", "wb") as f:
        f.write(raw)
    cols = S.read_dbf(base + ".dbf")
    assert cols["polygon_id"] == [2]
    assert cols["flag"] == ["y"]
