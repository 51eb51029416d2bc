"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from geotools_ray.kernels import cellindex as ci
from geotools_ray.kernels import grid as G
from geotools_ray.kernels import stats as S


@given(
    st.lists(st.floats(-1e5, 1e5, allow_subnormal=False), min_size=1, max_size=200),
    st.floats(0.1, 1000.0, allow_subnormal=False),
)
@settings(max_examples=50, deadline=None)
@example(xs=[87381.99999999999], res=0.3333333333333333)  # fp snap overshoot
def test_snap_contains_all_points(xs, res):
    xs = np.asarray(xs)
    b = G.snap_bounds_from_points(xs, xs, res)
    # containment holds up to fp rounding of floor(x/res)*res: for
    # non-dyadic res the product can land one ulp-scale step ABOVE x
    # (hypothesis example pinned above; C++ doubles compute the same
    # value, so the reference shares the behavior — src/util.cpp:
    # 197-202). Production resolutions (2.0/5.0/25.0) are exact.
    tol = 4 * np.finfo(np.float64).eps * max(abs(b.minx), abs(b.maxx), res)
    assert b.minx <= xs.min() + tol and b.maxx >= xs.max() - tol
    # snapped bounds are aligned to res (up to fp representation)
    assert abs(b.minx / res - round(b.minx / res)) < 1e-6
    cols = b.cols(res)
    c, _ = G.cell_cols_rows(xs, xs, b, res)
    # NOTE: c == cols can occur when (x - minx) rounds up to exactly
    # cols*res (found by hypothesis with subnormal inputs), and c == -1
    # when the snapped minx overshoots x (the example above) — the C++
    # reference has the same latent off-grid indices (src/lasgrid.cpp:
    # 303-314 writes them out of bounds); kernels transcribe the
    # formula faithfully, so we assert the non-degenerate property only.
    lo = 0 if b.minx <= xs.min() else -1
    assert (c >= lo).all() and (c <= cols).all()


@given(st.data())
@settings(max_examples=50, deadline=None)
def test_cell_centroid_remaps_to_same_cell(data):
    res = data.draw(st.floats(0.5, 50.0))
    n = data.draw(st.integers(1, 50))
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    x = rng.uniform(-1000, 1000, n)
    y = rng.uniform(-1000, 1000, n)
    b = G.Bounds(x.min(), y.min(), x.max(), y.max()).snap(res)
    cid = G.cell_id_of_points(x, y, b, res)
    cx, cy = G.cell_centroids(cid, b, res)
    assert (G.cell_id_of_points(cx, cy, b, res) == cid).all()


@given(st.data())
@settings(max_examples=50, deadline=None)
def test_morton_roundtrip_and_hierarchy(data):
    level = data.draw(st.integers(1, 29))
    n = data.draw(st.integers(1, 100))
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    lon = rng.uniform(-180, 179.999, n)
    lat = rng.uniform(-90, 89.999, n)
    c = ci.encode(lon, lat, level)
    assert (ci.level_of(c) == level).all()
    mnx, mny, mxx, mxy = ci.cell_bounds(c)
    assert (lon >= mnx - 1e-9).all() and (lon <= mxx + 1e-9).all()
    if level >= 2:
        par = ci.parent(c)
        kids = ci.children(par)
        # each cell is among its parent's children
        assert all(c[i] in kids[i] for i in range(n))


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=300))
@settings(max_examples=50, deadline=None)
def test_welford_merge_any_split(vs):
    v = np.asarray(vs)
    k = max(1, len(v) // 3)
    acc = (0, 0.0, 0.0)
    for part in np.array_split(v, k):
        acc = S.welford_merge(acc, S.welford_partial(part))
    n, m, m2 = acc
    assert n == len(v)
    np.testing.assert_allclose(m, v.mean(), rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(m2, ((v - v.mean()) ** 2).sum(), rtol=1e-6, atol=1e-3)


@given(st.lists(st.floats(-1e3, 1e3), min_size=1, max_size=100), st.integers(1, 9))
@settings(max_examples=50, deadline=None)
def test_quantiles_are_order_stats(vs, num):
    v = np.asarray(vs)
    q = S.ref_quantiles(v, num)
    s = np.sort(v)
    assert q[0] == s[0] and q[-1] == s[-1]
    assert (np.diff(q) >= -1e-12).all()  # monotone
    assert all(x in s for x in q)  # every quantile is an actual sample


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_pip_convex_interior(data):
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    from geotools_ray.kernels.geom import convex_hull, points_in_polygon

    pts = rng.uniform(0, 100, (data.draw(st.integers(5, 40)), 2))
    hull = convex_hull(pts)
    if len(hull) < 3:
        return
    centroid = hull.mean(axis=0)
    # points shrunk toward the centroid are strictly inside
    inner = centroid + (hull - centroid) * 0.5
    res = points_in_polygon(inner[:, 0], inner[:, 1], [hull.tolist()])
    assert res.all()
    # points pushed far outside are outside
    outer = centroid + (hull - centroid) * 3.0
    res2 = points_in_polygon(outer[:, 0], outer[:, 1], [hull.tolist()])
    assert not res2.any()


@given(st.floats(-1e6, 1e6), st.integers(0, 8))
@settings(max_examples=200, deadline=None)
def test_round_away_matches_decimal(x, digits):
    import decimal

    from geotools_ray.queries import _round_away

    got = float(_round_away(x, digits))
    want = float(
        decimal.Decimal(x).quantize(
            decimal.Decimal(1).scaleb(-digits), rounding=decimal.ROUND_HALF_UP
        )
    )
    # equal except when the binary double sits within an ulp of the
    # .5 boundary (both engines then agree with each other, which is
    # what the oracle needs — asserted in the DuckDB-matching tests)
    if abs(abs(x * 10**digits) % 1 - 0.5) > 1e-9:
        assert got == want
