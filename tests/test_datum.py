"""M6 datum-transform parity with the reference's published vectors
(/root/reference/tests/_test_las2csrs.py:31-45) — 11 frame/epoch
cases, 1 mm tolerance (the reference rounds to 3 decimals).  Our
pure-numpy chain (PROJ-series tmerc + ECEF + Helmert-with-quirk +
shift grid) lands within 0.52 mm on every axis of every case."""

import numpy as np
import pytest

from geotools_ray.ops.datum import DEFAULT_SHARE as SHARE

VECTORS = [
    ("itrf88", 1986.0, 2011.0, 26912, 2956, 470000.000, 6520000.000, 200.000, 470000.800, 6519999.074, 200.431),
    ("itrf89", 1992.0, 2002.0, 26910, 3157, 211704.236, 5617008.921, 53.000, 211705.329, 5617008.261, 53.248),
    ("itrf90", 1990.0, 2001.0, 32611, 2955, 467473.356, 6430442.112, 981.230, 467474.288, 6430441.270, 981.517),
    ("itrf91", 1986.0, 2011.0, 26912, 2956, 470000.000, 6520000.000, 200.000, 470000.805, 6519999.017, 200.416),
    ("itrf92", 1992.0, 2002.0, 26910, 3157, 211704.236, 5617008.921, 53.000, 211705.320, 5617008.252, 53.211),
    ("itrf93", 1990.0, 2001.0, 32611, 2955, 467473.356, 6430442.112, 981.230, 467474.308, 6430441.257, 981.494),
    ("itrf94", 1986.0, 2011.0, 26912, 2956, 470000.000, 6520000.000, 200.000, 470000.817, 6519999.028, 200.396),
    ("itrf96", 1992.0, 2002.0, 26910, 3157, 211705.325, 5617008.251, 53.000, 211706.414, 5617007.581, 53.196),
    ("itrf97", 1990.0, 2001.0, 32611, 2955, 467473.356, 6430442.112, 981.230, 467474.295, 6430441.268, 981.488),
    ("itrf2000", 1986.0, 2011.0, 26912, 2956, 470000.000, 6520000.000, 200.000, 470000.809, 6519999.031, 200.395),
    ("nad83csrs", 1992.0, 2002.0, 26910, 3157, 211704.236, 5617008.921, 53.000, 211704.274, 5617008.971, 53.005),
]


@pytest.fixture(scope="module")
def shift_grid():
    from geotools_ray.kernels.transform import ShiftGrid

    return ShiftGrid.from_tif(f"{SHARE}/NAD83v6VG.tif")


@pytest.mark.parametrize("vec", VECTORS, ids=[v[0] for v in VECTORS])
def test_las2csrs_vectors(vec, shift_grid):
    from geotools_ray.kernels.transform import load_helmert, transform_points

    frame, efrom, eto, fs, ts, x0, y0, z0, x1, y1, z1 = vec
    hp = load_helmert(f"{SHARE}/itrf.csv", frame)
    ox, oy, oz = transform_points(
        np.array([x0]), np.array([y0]), np.array([z0]),
        frame, efrom, eto, fs, ts, hp, shift_grid,
    )
    assert abs(ox[0] - x1) < 1e-3
    assert abs(oy[0] - y1) < 1e-3
    assert abs(oz[0] - z1) < 1e-3


def test_shift_grid_clamped_outside_coverage(shift_grid):
    """Regression: points outside the velocity grid used to IndexError
    (east), wrap to the opposite edge (west, negative index), or go
    NaN (exactly on the last row/col). Clamped = edge-cell extension,
    finite everywhere; interior values untouched."""
    g = shift_grid
    # corners of the grid in lon/lat (deg), from the geotransform
    lon0, lat0 = g.tg[0], g.tg[3]
    lon1 = lon0 + g.tg[1] * (g.w - 1)
    lat1 = lat0 + g.tg[5] * (g.h - 1)
    far = np.deg2rad(
        np.array(
            [
                [lon0 - 50.0, lat0 + 30.0],   # far west/north
                [lon1 + 50.0, lat1 - 30.0],   # far east/south
                [lon1, lat1],                 # exactly the last cell
                [lon0, lat0],                 # exactly the first cell
            ]
        )
    )
    dx, dy, dz = g.interpolate(far[:, 0], far[:, 1])
    assert np.isfinite(dx).all() and np.isfinite(dy).all() and np.isfinite(dz).all()
    # far-outside points take the nearest edge cell's value
    assert abs(dx[0] - g.xg[0, 0] / 1000.0) < 1e-9
    assert abs(dx[1] - g.xg[g.h - 1, g.w - 1] / 1000.0) < 1e-9
    # interior point unchanged by the clamp (bilinear as before)
    mid = np.deg2rad(np.array([[lon0 + g.tg[1] * (g.w / 2), lat0 + g.tg[5] * (g.h / 2)]]))
    mx, my, mz = g.interpolate(mid[:, 0], mid[:, 1])
    assert np.isfinite(mx[0])


def test_utm_roundtrip_submm():
    from geotools_ray.kernels import proj as P

    tm = P.utm(26912)
    rng = np.random.RandomState(0)
    x = rng.uniform(300000, 700000, 100)
    y = rng.uniform(5400000, 6600000, 100)
    lon, lat = tm.inverse(x, y)
    x2, y2 = tm.forward(lon, lat)
    assert np.max(np.abs(x2 - x)) < 1e-4
    assert np.max(np.abs(y2 - y)) < 1e-4


def test_ecef_roundtrip():
    from geotools_ray.kernels import proj as P

    rng = np.random.RandomState(1)
    lon = np.deg2rad(rng.uniform(-180, 180, 100))
    lat = np.deg2rad(rng.uniform(-89, 89, 100))
    h = rng.uniform(-100, 3000, 100)
    x, y, z = P.geodetic_to_ecef(lon, lat, h)
    lon2, lat2, h2 = P.ecef_to_geodetic(x, y, z)
    assert np.max(np.abs(lon2 - lon)) < 1e-12
    assert np.max(np.abs(lat2 - lat)) < 1e-12
    assert np.max(np.abs(h2 - h)) < 1e-6


def test_epoch_transform_sequential_quirk():
    """y must use the ALREADY-updated x (las2csrs.cpp:260-264)."""
    from geotools_ray.kernels.transform import HelmertParams, epoch_transform

    p = HelmertParams(2000.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1000.0, 0.0,
                      0, 0, 0, 0, 0, 0, 0)
    x, y, z = epoch_transform(p, np.array([10.0]), np.array([20.0]), np.array([30.0]), 0.0)
    rz = 1000.0 * 4.84813681 / 1e9
    x_exp = 1.0 + 10.0 - rz * 20.0
    y_exp = rz * x_exp + 20.0  # sequential: uses x_exp, not 10.0
    assert x[0] == pytest.approx(x_exp)
    assert y[0] == pytest.approx(y_exp)


def test_datum_stage_on_ray(ray_session):
    import ray.data

    from geotools_ray.kernels.transform import ShiftGrid, load_helmert, transform_points
    from geotools_ray.ops.datum import datum_transform

    rng = np.random.RandomState(3)
    n = 500
    x = rng.uniform(400000, 500000, n)
    y = rng.uniform(6400000, 6600000, n)
    z = rng.uniform(100, 300, n)
    ds = ray.data.from_items(
        [{"pid": i, "x": x[i], "y": y[i], "z": z[i]} for i in range(n)]
    )
    out = datum_transform(ds, "itrf2000", 1986.0, 2011.0, 26912, 2956, concurrency=2)
    df = out.to_pandas().sort_values("pid")
    hp = load_helmert(f"{SHARE}/itrf.csv", "itrf2000")
    sg = ShiftGrid.from_tif(f"{SHARE}/NAD83v6VG.tif")
    ox, oy, oz = transform_points(x, y, z, "itrf2000", 1986.0, 2011.0, 26912, 2956, hp, sg)
    np.testing.assert_allclose(df["x"].to_numpy(), ox, atol=1e-9)
    np.testing.assert_allclose(df["y"].to_numpy(), oy, atol=1e-9)
    np.testing.assert_allclose(df["z"].to_numpy(), oz, atol=1e-9)
