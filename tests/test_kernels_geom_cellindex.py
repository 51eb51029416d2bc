import numpy as np

from geotools_ray.kernels import cellindex as ci
from geotools_ray.kernels import geom


def test_pip_square_and_hole():
    square = [[(0, 0), (10, 0), (10, 10), (0, 10)]]
    x = np.array([5.0, 15.0, -1.0, 9.9])
    y = np.array([5.0, 5.0, 5.0, 0.1])
    assert geom.points_in_polygon(x, y, square).tolist() == [True, False, False, True]
    donut = [
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        [(4, 4), (6, 4), (6, 6), (4, 6)],
    ]
    assert geom.points_in_polygon(np.array([5.0, 2.0]), np.array([5.0, 2.0]), donut).tolist() == [
        False,
        True,
    ]


def test_pip_concave():
    # L-shape: point in the notch is outside
    rings = [[(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)]]
    assert geom.points_in_polygon(np.array([2.0, 8.0]), np.array([8.0, 8.0]), rings).tolist() == [
        True,
        False,
    ]


def test_pip_boundary_excluded():
    """GEOS contains = interior: points exactly on any edge or vertex
    are OUT. The bare half-open crossing rule counted left/bottom edges
    as inside (regression)."""
    square = [[(0, 0), (10, 0), (10, 10), (0, 10)]]
    # midpoints of all four edges + two corners + interior + hole edge
    x = np.array([0.0, 10.0, 5.0, 5.0, 0.0, 10.0, 5.0])
    y = np.array([5.0, 5.0, 0.0, 10.0, 0.0, 10.0, 5.0])
    got = geom.points_in_polygon(x, y, square)
    assert got.tolist() == [False, False, False, False, False, False, True]
    donut = [
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        [(4, 4), (6, 4), (6, 6), (4, 6)],
    ]
    # a point on the HOLE boundary is on the polygon boundary -> out
    assert geom.points_in_polygon(np.array([4.0]), np.array([5.0]), donut).tolist() == [False]
    # diagonal edge: exactly-representable collinear point
    tri = [[(0, 0), (8, 8), (0, 8)]]
    assert geom.points_in_polygon(np.array([3.0, 2.0]), np.array([3.0, 3.0]), tri).tolist() == [
        False,  # on the diagonal
        True,   # strictly inside
    ]


def test_cellindex_guards_and_antimeridian():
    import pytest

    # NaN coordinates must raise, not silently join the SW corner cell
    with pytest.raises(ValueError, match="non-finite"):
        ci.encode(np.array([np.nan]), np.array([0.0]), 8)
    # out-of-range longitude wraps (antimeridian-crossing data)
    a = ci.encode(np.array([185.0]), np.array([10.0]), 8)
    b = ci.encode(np.array([-175.0]), np.array([10.0]), 8)
    assert a[0] == b[0]
    # antimeridian-crossing bbox = two lobes, never silently empty
    cover = ci.cover_bbox(170.0, -5.0, -170.0, 5.0, 6)
    assert len(cover) > 0
    west = ci.encode(np.array([175.0]), np.array([0.0]), 6)[0]
    east = ci.encode(np.array([-175.0]), np.array([0.0]), 6)[0]
    assert west in cover and east in cover
    with pytest.raises(ValueError, match="minlat"):
        ci.cover_bbox(0.0, 5.0, 10.0, -5.0, 6)
    # level guards on the non-encode constructors
    with pytest.raises(ValueError):
        ci.from_xy(np.array([0]), np.array([0]), 30)
    # mixed-level ring_distance is meaningless -> raise
    c10 = ci.encode(np.array([0.0]), np.array([0.0]), 10)
    c12 = ci.encode(np.array([0.0]), np.array([0.0]), 12)
    with pytest.raises(ValueError, match="same-level"):
        ci.ring_distance(c10, c12)


def test_pip_matches_matplotlib_free_oracle():
    rng = np.random.RandomState(3)
    ring = [(1, 1), (9, 2), (8, 8), (5, 9.5), (2, 7)]
    x = rng.uniform(0, 10, 500)
    y = rng.uniform(0, 10, 500)

    def slow_pip(px, py):
        inside = False
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                inside = not inside
        return inside

    got = geom.points_in_polygon(x, y, [ring])
    want = np.array([slow_pip(px, py) for px, py in zip(x, y)])
    assert (got == want).all()


def test_cellindex_roundtrip_and_hierarchy():
    rng = np.random.RandomState(5)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for level in (0, 5, 12, 29):
        c = ci.encode(lon, lat, level)
        assert (ci.level_of(c) == level).all()
        mnx, mny, mxx, mxy = ci.cell_bounds(c)
        assert (lon >= mnx).all() and (lon < mxx + 1e-9).all()
        assert (lat >= mny).all() and (lat < mxy + 1e-9).all()
    c12 = ci.encode(lon, lat, 12)
    c10 = ci.encode(lon, lat, 10)
    assert (ci.parent(c12, 2) == c10).all()
    kids = ci.children(c10[:5])
    assert kids.shape == (5, 4)
    assert (ci.parent(kids.ravel()).reshape(5, 4) == c10[:5][:, None]).all()


def test_k_ring_and_cover():
    c = ci.encode(np.array([0.0]), np.array([0.0]), 10)[0]
    ring = ci.k_ring(c, 1)
    assert len(ring) == 9 and c in ring
    assert (ci.ring_distance(np.full(len(ring), c), ring) <= 1).all()
    cover = ci.cover_bbox(-1.0, -1.0, 1.0, 1.0, 8)
    mnx, mny, mxx, mxy = ci.cell_bounds(cover)
    # every covered cell intersects the bbox
    assert (mxx >= -1.0).all() and (mnx <= 1.0).all()
    # and the bbox corners are covered
    for lo, la in [(-1, -1), (1, 1), (0, 0)]:
        assert ci.encode(np.array([lo]), np.array([la]), 8)[0] in cover


def test_compact():
    # all 4 children of a cell compact to the parent
    par = ci.encode(np.array([10.0]), np.array([10.0]), 6)[0]
    kids = ci.children(par).ravel()
    out = ci.compact(kids)
    assert out.tolist() == [par]
    # a partial sibling set stays
    out2 = ci.compact(kids[:3])
    assert sorted(out2.tolist()) == sorted(kids[:3].tolist())


def test_convex_hull():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]])
    hull = geom.convex_hull(pts)
    assert len(hull) == 4
    assert {tuple(p) for p in hull} == {(0, 0), (2, 0), (2, 2), (0, 2)}
