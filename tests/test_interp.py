import numpy as np
import pandas as pd
import pytest


def test_delaunay_square_and_interp():
    from geotools_ray.kernels.delaunay import delaunay, interp_tin

    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]])
    tris = delaunay(pts)
    assert len(tris) == 4  # fan around the center point
    # planar z -> TIN interpolation is exact
    z = 2.0 * pts[:, 0] + 3.0 * pts[:, 1] + 1.0
    q = interp_tin(np.array([0.3, 0.7]), np.array([0.4, 0.2]), pts, z)
    np.testing.assert_allclose(q, [2 * 0.3 + 3 * 0.4 + 1, 2 * 0.7 + 3 * 0.2 + 1], atol=1e-12)
    # outside hull -> nan
    assert np.isnan(interp_tin(np.array([5.0]), np.array([5.0]), pts, z)[0])


def test_delaunay_near_collinear_strip_and_degeneracies():
    """Infinite-vertex Bowyer-Watson regression: a finite super-triangle
    culled every sliver in a flight-line strip (circumradius >> span) so
    near-collinear lidar geometry triangulated to NOTHING; the symbolic
    infinite vertex keeps them. Also pins the empty-circumcircle
    invariant on a cocircular grid and exact-collinear -> []."""
    from geotools_ray.kernels.delaunay import delaunay

    rng = np.random.default_rng(7)
    t = np.linspace(0, 100, 50)
    strip = np.column_stack([t, 1e-3 * t + rng.normal(0, 1e-4, 50)])
    tris = delaunay(strip)
    # a simple polygon over n=50 near-collinear points: n-2 .. 2n-2 tris
    assert len(tris) >= 48

    def violations(pts, tris):
        pts = np.asarray(pts, float)
        bad = 0
        for a, b, c in tris:
            A, B, C = pts[a], pts[b], pts[c]
            d = 2 * (A[0] * (B[1] - C[1]) + B[0] * (C[1] - A[1]) + C[0] * (A[1] - B[1]))
            assert d != 0  # no degenerate (zero-area) triangles emitted
            ux = ((A @ A) * (B[1] - C[1]) + (B @ B) * (C[1] - A[1]) + (C @ C) * (A[1] - B[1])) / d
            uy = ((A @ A) * (C[0] - B[0]) + (B @ B) * (A[0] - C[0]) + (C @ C) * (B[0] - A[0])) / d
            r2 = (A[0] - ux) ** 2 + (A[1] - uy) ** 2
            d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
            inside = set(np.flatnonzero(d2 < r2 * (1 - 1e-12) - 1e-12)) - {a, b, c}
            bad += bool(inside)
        return bad

    assert violations(strip, tris) == 0
    # cocircular degeneracy: 10x10 integer grid -> exactly 2*100-2-36 tris
    gx, gy = np.meshgrid(np.arange(10.0), np.arange(10.0))
    grid = np.column_stack([gx.ravel(), gy.ravel()])
    gt = delaunay(grid)
    assert len(gt) == 162 and violations(grid, gt) == 0
    # exactly collinear -> no TIN
    assert delaunay(np.column_stack([t, 2 * t])) == []
    # duplicates are skipped, invariant holds
    dup = np.vstack([strip, strip[:7]])
    assert violations(dup, delaunay(dup)) == 0


def _samples_table():
    import pyarrow as pa

    rng = np.random.RandomState(0)
    n = 50
    return pa.table(
        {
            "s_suppkey": np.arange(n),
            "sx": rng.uniform(0, 100, n),
            "sy": rng.uniform(0, 100, n),
            "sz": rng.uniform(0, 30, n),
        }
    )


def test_idw_matches_reference_formula(ray_session):
    import ray.data

    from geotools_ray.ops.interp import idw_at

    smp = _samples_table()
    targets = ray.data.from_items([{"tid": i, "cx": 10.0 + i, "cy": 20.0 + i} for i in range(5)])
    out = idw_at(targets, smp, exponent=1.0).to_pandas().sort_values("tid")
    sx = smp["sx"].to_numpy()
    sy = smp["sy"].to_numpy()
    sz = smp["sz"].to_numpy()
    for i in range(5):
        d2 = (10.0 + i - sx) ** 2 + (20.0 + i - sy) ** 2
        want = np.sum(sz / d2) / np.sum(1.0 / d2)
        assert out["idw_z"].iloc[i] == pytest.approx(want, rel=1e-12)


def test_idw_knn_and_avg(ray_session):
    import ray.data

    from geotools_ray.ops.interp import avg_at, idw_at

    smp = _samples_table()
    targets = ray.data.from_items([{"tid": 0, "cx": 50.0, "cy": 50.0}])
    out = idw_at(targets, smp, exponent=1.0, neighbours=5).to_pandas()
    sx = smp["sx"].to_numpy(); sy = smp["sy"].to_numpy(); sz = smp["sz"].to_numpy()
    d2 = (50.0 - sx) ** 2 + (50.0 - sy) ** 2
    idx = np.argsort(d2)[:5]
    want = np.sum(sz[idx] / d2[idx]) / np.sum(1.0 / d2[idx])
    assert out["idw_z"].iloc[0] == pytest.approx(want, rel=1e-12)

    out2 = avg_at(targets, smp, neighbours=5).to_pandas()
    assert out2["avg_z"].iloc[0] == pytest.approx(sz[idx].mean())
    out3 = avg_at(targets, smp).to_pandas()
    assert out3["avg_z"].iloc[0] == pytest.approx(np.sum(sz) / len(sz))


def test_planar_fit_recovers_plane(ray_session):
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.interp import planar_at

    rng = np.random.RandomState(1)
    n = 80
    x = rng.uniform(0, 100, n)
    y = rng.uniform(0, 100, n)
    z = 0.5 * x - 0.25 * y + 7.0
    smp = pa.table({"sx": x, "sy": y, "sz": z})
    targets = ray.data.from_items([{"tid": 0, "cx": 30.0, "cy": 60.0}])
    out = planar_at(targets, smp).to_pandas()
    assert out["plane_z"].iloc[0] == pytest.approx(0.5 * 30 - 0.25 * 60 + 7.0, abs=1e-9)


def test_normalize_height(ray_session):
    import ray.data

    from geotools_ray.ops.interp import normalize_height

    # one cell: ground plane z = 5 + 0.1x, canopy points 10 above it
    rng = np.random.RandomState(2)
    rows = []
    for i in range(40):
        x, y = rng.uniform(0, 10), rng.uniform(0, 10)
        rows.append({"pid": i, "cell_id": 1, "x": x, "y": y, "z": 5 + 0.1 * x, "cls": 2})
    # put ground corners to guarantee hull coverage
    for j, (x, y) in enumerate([(0, 0), (10, 0), (10, 10), (0, 10)]):
        rows.append({"pid": 100 + j, "cell_id": 1, "x": float(x), "y": float(y), "z": 5 + 0.1 * x, "cls": 2})
    canopy = []
    for i in range(20):
        x, y = rng.uniform(1, 9), rng.uniform(1, 9)
        canopy.append({"pid": 200 + i, "cell_id": 1, "x": x, "y": y, "z": 5 + 0.1 * x + 10.0, "cls": 1})
    ds = ray.data.from_items(rows + canopy)
    out = normalize_height(ds).to_pandas()
    can = out[out["cls"] == 1]
    np.testing.assert_allclose(can["z"].to_numpy(), 10.0, atol=1e-9)
    gnd = out[out["cls"] == 2]
    np.testing.assert_allclose(gnd["z"].to_numpy(), 0.0, atol=1e-9)


def test_normalize_height_fused_reduce_matches_separate_shuffle(ray_session):
    """reduce_fn runs inside the normalize partitions (cells are whole
    per partition) — its per-cell aggregate must equal a separate
    grouped_map over the full normalized output."""
    import pandas as pd
    import ray.data

    from geotools_ray.ops.interp import normalize_height
    from geotools_ray.stages.grouped import grouped_map

    rng = np.random.RandomState(4)
    rows = []
    for c in range(6):
        for i in range(80):
            x, y = rng.uniform(0, 10), rng.uniform(0, 10)
            cls = 2 if i % 3 == 0 else 1
            rows.append(
                {"cell_id": c, "x": x, "y": y,
                 "z": 5 + 0.2 * x + (8.0 if cls == 1 else 0.0), "cls": cls}
            )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cell_id", sort=False)["z"]
        return pd.DataFrame(
            {
                "cell_id": list(g.groups.keys()),
                "n": g.count().to_numpy().astype(np.int64),
                "sum_nz": np.round(g.sum().to_numpy(), 4),
            }
        )

    ds = ray.data.from_items(rows)
    fused = (
        normalize_height(ds, reduce_fn=rollup)
        .to_pandas().sort_values("cell_id").reset_index(drop=True)
    )
    separate = (
        grouped_map(normalize_height(ds), ["cell_id"], rollup)
        .to_pandas().sort_values("cell_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fused, separate)


def test_kriging_exact_at_samples_and_smooth(ray_session):
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.interp import kriging_at

    rng = np.random.RandomState(4)
    n = 60
    sx = rng.uniform(0, 100, n)
    sy = rng.uniform(0, 100, n)
    sz = 10 + 0.2 * sx - 0.1 * sy + np.sin(sx / 15) * 2
    smp = pa.table({"sx": sx, "sy": sy, "sz": sz})
    # kriging is an exact interpolator at the sample locations
    targets = ray.data.from_items(
        [{"tid": i, "cx": float(sx[i]), "cy": float(sy[i])} for i in range(10)]
    )
    out = kriging_at(targets, smp).to_pandas().sort_values("tid")
    np.testing.assert_allclose(out["krige_z"].to_numpy(), sz[:10], atol=1e-6)
    # interpolated values stay within the sample range for interior pts
    mid = ray.data.from_items([{"tid": 0, "cx": 50.0, "cy": 50.0}])
    v = kriging_at(mid, smp).to_pandas()["krige_z"].iloc[0]
    assert sz.min() - 1 < v < sz.max() + 1


def test_variogram_fit_recovers_structure():
    from geotools_ray.ops.interp import fit_variogram, spherical_model

    rng = np.random.RandomState(5)
    n = 120
    sx = rng.uniform(0, 100, n)
    sy = rng.uniform(0, 100, n)
    # white noise -> variogram flat: fitted range is small or sill ~ var
    sz = rng.standard_normal(n)
    nug, sill, r = fit_variogram(sx, sy, sz)
    assert sill == pytest.approx(np.var(sz), rel=0.5)


# ---------------------------------------------------------------------------
# R5 natural neighbour (Sibson)

def _nn_eval(tx, ty, sx, sy, sz):
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.interp import natural_neighbour_at

    targets = ray.data.from_arrow(
        pa.table({"i": np.arange(len(tx)), "cx": tx, "cy": ty})
    )
    smp = pa.table({"sx": sx, "sy": sy, "sz": sz})
    df = natural_neighbour_at(targets, smp).to_pandas().sort_values("i")
    return df["nn_z"].to_numpy()


def test_natural_neighbour_exact_at_samples():
    rng = np.random.RandomState(3)
    sx = rng.uniform(0, 10, 25)
    sy = rng.uniform(0, 10, 25)
    sz = rng.uniform(-5, 5, 25)
    out = _nn_eval(sx[:5], sy[:5], sx, sy, sz)
    assert np.allclose(out, sz[:5], atol=1e-12)


def test_natural_neighbour_linear_precision():
    """Sibson interpolation reproduces linear fields exactly inside
    the hull (the defining property of natural-neighbour weights)."""
    rng = np.random.RandomState(4)
    sx = rng.uniform(0, 10, 40)
    sy = rng.uniform(0, 10, 40)
    sz = 2.0 * sx - 3.0 * sy + 7.0
    tx = rng.uniform(3, 7, 10)
    ty = rng.uniform(3, 7, 10)
    out = _nn_eval(tx, ty, sx, sy, sz)
    want = 2.0 * tx - 3.0 * ty + 7.0
    assert np.max(np.abs(out - want)) < 1e-6


def test_natural_neighbour_convex_combination():
    rng = np.random.RandomState(5)
    sx = rng.uniform(0, 10, 30)
    sy = rng.uniform(0, 10, 30)
    sz = rng.uniform(0, 100, 30)
    tx = rng.uniform(2, 8, 8)
    ty = rng.uniform(2, 8, 8)
    out = _nn_eval(tx, ty, sx, sy, sz)
    assert np.all(out >= sz.min() - 1e-9) and np.all(out <= sz.max() + 1e-9)


def test_sibson_actor_matches_scalar_kernel(ray_session):
    """The pruned/cached _SibsonActor must reproduce the straight-line
    Sibson kernel (_sibson_value over unpruned clips) on random sites."""
    import pyarrow as pa
    import ray as _ray

    from geotools_ray.ops.interp import (
        _SibsonActor,
        _broadcast_samples,
        _poly_area,
        _sibson_value,
        _voronoi_cell,
    )

    rng = np.random.RandomState(21)
    n = 150
    sx = rng.uniform(0, 50, n)
    sy = rng.uniform(0, 50, n)
    sz = rng.uniform(-5, 5, n)
    smp = pa.table({"sx": sx, "sy": sy, "sz": sz})
    actor = _SibsonActor(_broadcast_samples(smp))
    # interior targets: outside the sites' hull the reference returns
    # nodata (callers mask), and pad-box-bounded exterior cells are
    # where the near-site pruning is allowed to differ
    tx = rng.uniform(3, 47, 40)
    ty = rng.uniform(3, 47, 40)
    out = actor(pa.table({"cx": tx, "cy": ty}))["nn_z"].to_numpy()
    pad = 4.0 * (max(sx.max() - sx.min(), sy.max() - sy.min()) + 1.0)
    pre = np.array(
        [
            _poly_area(
                _voronoi_cell(
                    sx[j], sy[j],
                    np.concatenate([sx[:j], sx[j + 1 :]]),
                    np.concatenate([sy[:j], sy[j + 1 :]]),
                    pad,
                )
            )
            for j in range(n)
        ]
    )
    want = np.array([_sibson_value(tx[i], ty[i], sx, sy, sz, pad, pre) for i in range(40)])
    np.testing.assert_allclose(out, want, rtol=0, atol=1e-9)


def test_interp_tin_chunked_matches_per_query():
    """Chunked bbox-pruned point location == the per-query reference
    loop (first containing triangle in list order), bit for bit."""
    from geotools_ray.kernels.delaunay import delaunay, interp_tin

    rng = np.random.RandomState(4)
    pts = rng.uniform(0, 60, (300, 2))
    z = rng.uniform(0, 10, 300)
    qx = np.sort(rng.uniform(-3, 63, 700))
    qy = rng.uniform(-3, 63, 700)
    got = interp_tin(qx, qy, pts, z)

    tris = delaunay(pts)
    T = np.asarray(tris, dtype=np.int64)
    a, b, c = pts[T[:, 0]], pts[T[:, 1]], pts[T[:, 2]]
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1])
    ok = det != 0
    eps = 1e-12
    za, zb, zc = z[T[:, 0]], z[T[:, 1]], z[T[:, 2]]
    want = np.full(len(qx), np.nan)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(len(qx)):
            l1 = ((b[:, 1] - c[:, 1]) * (qx[i] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (qy[i] - c[:, 1])) / det
            l2 = ((c[:, 1] - a[:, 1]) * (qx[i] - c[:, 0]) + (a[:, 0] - c[:, 0]) * (qy[i] - c[:, 1])) / det
            l3 = 1.0 - l1 - l2
            inside = ok & (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
            h = np.nonzero(inside)[0]
            if len(h):
                want[i] = l1[h[0]] * za[h[0]] + l2[h[0]] * zb[h[0]] + l3[h[0]] * zc[h[0]]
    assert (np.isnan(got) == np.isnan(want)).all()
    m = ~np.isnan(got)
    np.testing.assert_array_equal(got[m], want[m])


def test_sibson_degenerate_cocircular():
    """Degenerate distribution where the 63-nearest-site pruning is
    actually exercised: 120 co-circular sites are ALL Voronoi-adjacent
    to a centre target, so the pruned actor sees only a tie-broken
    subset. The result must stay a convex combination of site values
    and, for a linear field, within the field's span across the ring
    (documenting the approximation, _SibsonActor docstring)."""
    import pyarrow as pa

    from geotools_ray.ops.interp import _SibsonActor, _broadcast_samples

    n = 120
    th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    sx = 10.0 + 5.0 * np.cos(th)
    sy = 10.0 + 5.0 * np.sin(th)
    a, b, c = 0.3, -0.7, 2.0
    sz = a * sx + b * sy + c
    smp = pa.table({"sx": sx, "sy": sy, "sz": sz})
    actor = _SibsonActor(_broadcast_samples(smp))
    # centre (equidistant from every site) + slightly offset targets
    tx = np.array([10.0, 10.1, 9.7])
    ty = np.array([10.0, 9.9, 10.2])
    out = actor(pa.table({"cx": tx, "cy": ty}))["nn_z"].to_numpy()
    # convex combination always holds (weights = real stolen areas)
    assert np.all(out >= sz.min() - 1e-9) and np.all(out <= sz.max() + 1e-9)
    # exact Sibson reproduces the plane; the pruned kernel may deviate
    # on this worst case but must stay within 15% of the ring's span
    want = a * tx + b * ty + c
    span = sz.max() - sz.min()
    assert np.all(np.abs(out - want) <= 0.15 * span)


def test_sibson_degenerate_anisotropic():
    """Second degenerate case from the round-2 advice: extreme
    anisotropy (sites on a near-collinear band stretched 1000:1 in x)
    where a Voronoi cell can be bounded by a site beyond the 63
    nearest-by-euclidean. The pruned actor must stay a convex
    combination and reproduce a linear-in-x field closely (the y
    extent is negligible, so Sibson ~ 1-D linear interpolation)."""
    import pyarrow as pa

    from geotools_ray.ops.interp import _SibsonActor, _broadcast_samples

    rng = np.random.RandomState(5)
    n = 200
    sx = np.sort(rng.uniform(0.0, 1000.0, n))
    sy = rng.uniform(0.0, 1.0, n)  # 1000:1 anisotropy
    a, c = 0.05, 3.0
    sz = a * sx + c
    smp = pa.table({"sx": sx, "sy": sy, "sz": sz})
    actor = _SibsonActor(_broadcast_samples(smp))
    tx = rng.uniform(100.0, 900.0, 25)
    ty = rng.uniform(0.2, 0.8, 25)
    out = actor(pa.table({"cx": tx, "cy": ty}))["nn_z"].to_numpy()
    assert np.all(out >= sz.min() - 1e-9) and np.all(out <= sz.max() + 1e-9)
    want = a * tx + c
    span = sz.max() - sz.min()
    # interpolation along the band tracks the field within 2% of span
    assert np.all(np.abs(out - want) <= 0.02 * span)
