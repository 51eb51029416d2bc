"""S5 GeoTIFF write path round-trip through our own reader."""

import numpy as np


def test_tiff_roundtrip(tmp_path):
    from geotools_ray.sources.tiff import read_tiff, write_tiff

    rng = np.random.RandomState(0)
    grid = rng.uniform(-100, 100, (13, 17)).astype(np.float32)
    gt = (5000.0, 2.0, 0.0, 81000.0, 0.0, -2.0)
    p = str(tmp_path / "x.tif")
    write_tiff(p, grid, gt)
    bands, gt2 = read_tiff(p)
    np.testing.assert_array_equal(bands[0], grid)
    assert tuple(np.round(gt2, 9)) == gt


def test_tiff_multiband_roundtrip(tmp_path):
    from geotools_ray.sources.tiff import read_tiff, write_tiff

    rng = np.random.RandomState(1)
    bands = rng.uniform(0, 1, (3, 7, 9)).astype(np.float32)
    p = str(tmp_path / "m.tif")
    write_tiff(p, bands)
    got, _ = read_tiff(p)
    np.testing.assert_array_equal(got, bands)


def test_gvb_to_tiff_roundtrip(tmp_path):
    """S10: synthesize a GVB velocity grid, convert, verify bands and
    geotransform against the source arrays."""
    from geotools_ray.sources.gvb import gvb_to_tiff, write_gvb
    from geotools_ray.sources.tiff import read_tiff

    rng = np.random.RandomState(3)
    rows, cols = 5, 7
    bands = rng.uniform(-10, 10, (6, rows, cols)).astype(np.float32)
    # lat 40..41 deg in arcsec steps of 0.25 deg; lon spans (pos-west)
    lat_inc, lon_inc = 900.0, 900.0
    s_lat = 40 * 3600.0
    n_lat = s_lat + (rows - 1) * lat_inc
    e_lon = 100 * 3600.0
    w_lon = e_lon + (cols - 1) * lon_inc
    src = str(tmp_path / "g.gvb")
    dst = str(tmp_path / "g.tif")
    write_gvb(src, bands, s_lat, n_lat, w_lon, e_lon, lat_inc, lon_inc)
    gvb_to_tiff(src, dst)
    got, gt = read_tiff(dst)
    np.testing.assert_array_equal(got, bands)
    assert abs(gt[0] - (-w_lon / 3600.0)) < 1e-9
    assert abs(gt[1] - lon_inc / 3600.0) < 1e-9
    assert abs(gt[3] - n_lat / 3600.0) < 1e-9


def test_gvb_inexact_increment_row_count(tmp_path):
    """Regression: int() truncation of (N_LAT-S_LAT)/LAT_INC dropped a
    whole grid row when the increment is not exactly representable
    ((18000-0)/0.3 = 59999.99999999999), silently misaligning every
    band. round() keeps all exact cases identical."""
    from geotools_ray.sources.gvb import read_gvb, write_gvb

    rng = np.random.RandomState(5)
    rows, cols = 4, 4
    bands = rng.uniform(-5, 5, (6, rows, cols)).astype(np.float32)
    # 0.3 / 0.1 == 2.9999999999999996 in float64: int() truncation
    # loses a row (3 instead of 4) — header values are the clean
    # decimals a real GVB file carries
    lat_inc = 0.1
    s_lat = 0.0
    n_lat = 0.3
    lon_inc = 0.1
    e_lon = 0.0
    w_lon = 0.3
    src = str(tmp_path / "g.gvb")
    write_gvb(src, bands, s_lat, n_lat, w_lon, e_lon, lat_inc, lon_inc)
    got, _ = read_gvb(src)
    np.testing.assert_array_equal(got, bands)


def test_write_read_roundtrip_deflate(tmp_path):
    from geotools_ray.sources.tiff import read_tiff, write_tiff

    rng = np.random.RandomState(5)
    bands = rng.uniform(-100, 100, (2, 13, 9)).astype(np.float32)
    gt = (500.0, 2.0, 0.0, 7200.0, 0.0, -2.0)
    p = str(tmp_path / "c.tif")
    write_tiff(p, bands, gt, compress="deflate")
    got, ggt = read_tiff(p)
    np.testing.assert_array_equal(got, bands)
    assert tuple(np.round(ggt, 9)) == gt


def test_write_read_roundtrip_packbits(tmp_path):
    from geotools_ray.sources.tiff import read_tiff, write_tiff

    # constant regions give PackBits real runs to encode
    bands = np.zeros((1, 7, 33), dtype=np.float32)
    bands[0, 2:5, 10:20] = 3.5
    p = str(tmp_path / "p.tif")
    write_tiff(p, bands, compress="packbits")
    got, _ = read_tiff(p)
    np.testing.assert_array_equal(got, bands)


def _unpackbits_strict(raw: bytes) -> bytes:
    """Spec-compliant PackBits decoder: every literal code byte must be
    followed by exactly code+1 bytes (libtiff/GDAL behavior). Catches
    encoders whose trailing literal claims more bytes than remain."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        i += 1
        if c < 128:
            assert i + c + 1 <= n, f"literal code {c} at {i - 1} overruns stream"
            out += raw[i : i + c + 1]
            i += c + 1
        elif c > 128:
            assert i < n, "repeat code at end of stream"
            out += raw[i : i + 1] * (257 - c)
            i += 1
    return bytes(out)


def test_packbits_roundtrip_random():
    from geotools_ray.sources.tiff import _packbits, _unpackbits

    rng = np.random.RandomState(9)
    for _ in range(50):
        n = rng.randint(0, 400)
        # mix runs and noise
        raw = bytes(rng.choice([0, 0, 0, 7, rng.randint(256)], size=n).astype(np.uint8))
        assert _unpackbits(_packbits(raw)) == raw
        assert _unpackbits_strict(_packbits(raw)) == raw


def test_packbits_trailing_literal_strict():
    # data ending in a literal run: the code byte must count exactly the
    # bytes that follow (a prior encoder claimed one extra)
    from geotools_ray.sources.tiff import _packbits, _unpackbits

    for raw in (b"abcdef", b"a", b"ab", b"aab", b"\x00" * 3 + b"xy",
                bytes(range(200)), b"zz" + bytes(range(130))):
        enc = _packbits(raw)
        assert _unpackbits_strict(enc) == raw
        assert _unpackbits(enc) == raw
