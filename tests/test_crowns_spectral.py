import numpy as np
import pandas as pd
import pytest

from geotools_ray.kernels import raster as KR

NODATA = KR.NODATA


def _chm(seed=0, H=30, W=36):
    """Synthetic canopy height model: smooth bumps."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    g = np.zeros((H, W))
    peaks = [(6, 7, 20.0), (15, 22, 25.0), (24, 10, 18.0)]
    for r0, c0, z in peaks:
        g += z * np.exp(-(((yy - r0) ** 2 + (xx - c0) ** 2) / 12.0))
    return g, peaks


def test_crown_growth_kernel_claims():
    g, peaks = _chm()
    tops = [(i + 1, c, r, g[r, c]) for i, (r, c, _) in enumerate(peaks)]
    ids = KR.crown_growth(g, tops, min_height=2.0, height_fraction=0.4, radius=6.0)
    # each top claims its own cell and a region around it
    for i, (r, c, _) in enumerate(peaks):
        assert ids[r, c] == i + 1
        assert (ids == i + 1).sum() > 10
    # nothing claimed beyond radius from any top
    rs, cs = np.nonzero(ids)
    for r, c in zip(rs, cs):
        dmin = min((r - tr) ** 2 + (c - tc) ** 2 for tr, tc, _ in peaks)
        assert dmin <= 36.0 + 1e-9


def test_crown_tiles_match_kernel(ray_session):
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.crowns import crown_growth_tiles
    from geotools_ray.ops.raster import grid_to_tiles, tiles_to_grid

    g, peaks = _chm(seed=3)
    tops_list = sorted((i + 1, c, r, float(g[r, c])) for i, (r, c, _) in enumerate(peaks))
    want = KR.crown_growth(g, tops_list, 2.0, 0.4, 6.0)
    H, W = g.shape
    tops = pa.table(
        {
            "id": np.array([t[0] for t in tops_list], dtype=np.int64),
            "col": np.array([t[1] for t in tops_list], dtype=np.int64),
            "row": np.array([t[2] for t in tops_list], dtype=np.int64),
            "z": np.array([t[3] for t in tops_list]),
        }
    )
    tiles = ray.data.from_arrow(grid_to_tiles(g, 12))
    out = crown_growth_tiles(tiles, tops, 2.0, 0.4, 6.0, H, W, 12, num_parts=4)
    got = tiles_to_grid(out.to_pandas(), H, W, 12, nodata=0).astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_crown_tiles_serpentine_detour_path(ray_session):
    """Regression: halo = radius+1 nodata-truncated monotone-descending
    BFS paths that detour through the top's radius disk beyond the
    window (a serpentine ridge), leaving interior cells unclaimed that
    the global kernel claims. halo = 2*radius+1 covers the detour
    bound (path <= radius from the top, top <= radius from the cell)."""
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.crowns import crown_growth_tiles
    from geotools_ray.ops.raster import grid_to_tiles, tiles_to_grid

    H = W = 16
    g = np.full((H, W), KR.NODATA)
    path = [(7, 13), (8, 14), (9, 15), (10, 14), (10, 13), (10, 12),
            (10, 11), (10, 10), (10, 9), (9, 8), (8, 8), (7, 7)]
    z = 30.0
    for r, c in path:
        g[r, c] = z
        z -= 1.0
    want = KR.crown_growth(g, [(1, 13, 7, 30.0)], 2.0, 0.3, 6.0)
    assert want[7, 7] == 1  # global kernel claims via the detour
    tops = pa.table(
        {
            "id": np.array([1], dtype=np.int64),
            "col": np.array([13], dtype=np.int64),
            "row": np.array([7], dtype=np.int64),
            "z": np.array([30.0]),
        }
    )
    tiles = ray.data.from_arrow(grid_to_tiles(g, 8))
    out = crown_growth_tiles(tiles, tops, 2.0, 0.3, 6.0, H, W, 8, num_parts=2)
    got = tiles_to_grid(out.to_pandas(), H, W, 8, nodata=0).astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_boundary_edges(ray_session):
    import ray.data

    from geotools_ray.ops.crowns import boundary_edges

    rng = np.random.RandomState(5)
    # a filled disc of points
    pts = []
    i = 0
    while len(pts) < 2000:
        x, y = rng.uniform(0, 40, 2)
        if (x - 20) ** 2 + (y - 20) ** 2 < 15**2:
            pts.append({"pid": i, "x": x, "y": y, "z": 1.0})
            i += 1
    ds = ray.data.from_items(pts)
    edges = boundary_edges(ds, res=2.0, max_len=10.0)
    assert len(edges) > 10
    assert (edges["length"] < 10.0).all()
    # edge endpoints hug the circle (between inner and outer radius)
    d = np.sqrt((edges["x0"] - 20 - 1) ** 2 + (edges["y0"] - 20 + 1) ** 2)
    assert d.max() < 19.0


def test_spectral_and_pair_diff(ray_session):
    import ray.data

    from geotools_ray.ops.raster import grid_to_tiles
    from geotools_ray.ops.spectral import raster_pair_diff_stats, spectral_extract

    rng = np.random.RandomState(7)
    H, W, tile = 20, 24, 8
    idx = np.full((H, W), NODATA)
    idx[3:7, 4:9] = 42.0
    idx[12:15, 15:20] = 77.0
    band = rng.uniform(0, 255, (H, W))
    it = ray.data.from_arrow(grid_to_tiles(idx, tile))
    bt = ray.data.from_arrow(grid_to_tiles(band, tile))
    out = spectral_extract(it, bt, tile, res=1.0).to_pandas()
    assert len(out) == 4 * 5 + 3 * 5
    sub = out[out["id"] == 42].sort_values(["y", "x"])
    np.testing.assert_allclose(sub["dn"].to_numpy(), band[3:7, 4:9].ravel())

    # pair diff grouped by class
    a = rng.uniform(10, 20, (H, W))
    b = a - 2.5  # constant diff
    cls = np.where(np.arange(W)[None, :] < W // 2, 1.0, 2.0).repeat(H, axis=0).reshape(H, W)
    at = ray.data.from_arrow(grid_to_tiles(a, tile))
    bt2 = ray.data.from_arrow(grid_to_tiles(b, tile))
    ct = ray.data.from_arrow(grid_to_tiles(cls, tile))
    stats = raster_pair_diff_stats(at, bt2, ct).to_pandas().sort_values("cls")
    assert list(stats["cls"]) == [1, 2]
    np.testing.assert_allclose(stats["mean_diff"], 2.5, atol=1e-9)
    np.testing.assert_allclose(stats["stddev_diff"], 0.0, atol=1e-6)
    assert stats["n"].sum() == H * W


def test_void_fill_tiles_match_kernel(ray_session):
    import ray.data

    from geotools_ray.ops.raster import grid_to_tiles, tiles_to_grid, void_fill_tiles

    rng = np.random.RandomState(9)
    g = rng.uniform(5, 15, (22, 26))
    holes = rng.rand(22, 26) < 0.08
    g[holes] = NODATA
    want = KR.void_fill_idw(g, radius=2.0, count=3, exp=1.0)
    H, W = g.shape
    tiles = ray.data.from_arrow(grid_to_tiles(g, 8))
    out = void_fill_tiles(tiles, 2.0, 3, 1.0, H, W, 8, max_radius=8, num_parts=4)
    got = tiles_to_grid(out.to_pandas(), H, W, 8)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rugosity_registry():
    from geotools_ray.kernels.stats import ref_rugosity

    rng = np.random.RandomState(1)
    x = rng.uniform(0, 10, 40)
    y = rng.uniform(0, 10, 40)
    assert ref_rugosity(x, y, np.full(40, 3.0)) == pytest.approx(1.0, abs=1e-9)
    rough = ref_rugosity(x, y, rng.uniform(0, 8, 40))
    assert rough > 1.1


def test_flood_sweep(ray_session):
    from geotools_ray.ops.flood import flood_sweep

    g = np.full((12, 16), 50.0)
    g[2:5, 2:5] = 5.0    # basin A (deep)
    g[6:9, 10:13] = 12.0  # basin B (shallower)
    basins, spills = flood_sweep(g, start=8.0, end=16.0, step=4.0, max_spill_dist=12.0)
    # at 8: only A flooded; at 12+: both
    assert set(basins[basins["elevation"] == 8.0]["basin"]) == {1}
    assert len(basins[basins["elevation"] == 12.0]) == 2
    assert (spills["elevation"] >= 12.0).all()
    assert len(spills) > 0


def test_rastfit_correction(ray_session):
    from geotools_ray.ops.flood import rastfit_correction

    rng = np.random.RandomState(0)
    ref = rng.uniform(10, 20, (20, 25))
    adjust = ref + 3.0  # constant offset to be removed
    out = rastfit_correction(adjust, ref, n_samples=60, method="planar")
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_cotiled_consumers_match_zip_variants(ray_session):
    """raster_diff_stats_cotiled / spectral_extract_cotiled over one
    multi-column assembly == the zip-co-partition variants over
    separate assemblies."""
    import ray.data

    from geotools_ray.ops.raster import tiles_from_cellstats, tiles_multi_from_cellstats
    from geotools_ray.ops.spectral import (
        raster_diff_stats_cotiled,
        raster_pair_diff_stats,
        spectral_extract,
        spectral_extract_cotiled,
    )

    rng = np.random.RandomState(13)
    cols, rows, tile = 24, 16, 8
    cid = rng.choice(cols * rows, 200, replace=False)
    a = rng.uniform(0, 20, 200)
    b = rng.uniform(0, 20, 200)
    cls = rng.randint(1, 4, 200).astype(float)
    ds = ray.data.from_items(
        [
            {"cell_id": int(c), "a": float(x), "b": float(y), "cls": float(k)}
            for c, x, y, k in zip(cid, a, b, cls)
        ]
    )
    mt = tiles_multi_from_cellstats(ds, ["a", "b", "cls"], cols, rows, tile, dense=True).materialize()

    at = tiles_from_cellstats(ds, "a", cols, rows, tile, dense=True)
    bt = tiles_from_cellstats(ds, "b", cols, rows, tile, dense=True)
    ct = tiles_from_cellstats(ds, "cls", cols, rows, tile, dense=True)

    want = raster_pair_diff_stats(at, bt, ct).to_pandas().sort_values("cls").reset_index(drop=True)
    got = raster_diff_stats_cotiled(mt, "a", "b", "cls").to_pandas().sort_values("cls").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    wsp = (
        spectral_extract(ct, at, tile, res=2.0, minx=1.0, miny=3.0)
        .to_pandas().sort_values(["id", "x", "y"]).reset_index(drop=True)
    )
    gsp = (
        spectral_extract_cotiled(mt, "cls", "a", tile, res=2.0, minx=1.0, miny=3.0)
        .to_pandas().sort_values(["id", "x", "y"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(gsp, wsp)


def _descending_closure(g, seeds, min_height, frac, radius, nodata=NODATA):
    """Order-independent reachability closure (what SQL_CROWNS_VERIFY
    computes): cell claimed iff an already-claimed 8-neighbour with a
    strictly HIGHER value reaches it under the claim predicate."""
    H, W = g.shape
    out = {}
    for tid, tc, tr, tz in seeds:
        claimed = {(tr, tc)}
        frontier = [(tr, tc)]
        while frontier:
            nxt = []
            for r, c in frontier:
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        if dr == 0 and dc == 0:
                            continue
                        rr, cc = r + dr, c + dc
                        if not (0 <= rr < H and 0 <= cc < W) or (rr, cc) in claimed:
                            continue
                        v = g[rr, cc]
                        if (
                            v != nodata and v < g[r, c] and v >= min_height
                            and v / tz >= frac
                            and (tc - cc) ** 2 + (tr - rr) ** 2 <= radius * radius
                        ):
                            claimed.add((rr, cc))
                            nxt.append((rr, cc))
            frontier = nxt
        out[tid] = claimed
    return out


def test_crown_growth_isolated_equals_closure():
    """crowns_verify contract: for tops whose nearest other top is
    further than 2*radius, the FIFO/visited-set BFS claims exactly the
    descending-path closure — the recursive-CTE oracle's set."""
    rng = np.random.RandomState(7)
    for trial in range(5):
        H = W = 40
        g = rng.uniform(5.0, 15.0, (H, W))
        # three well-separated peaks (> 2*radius apart; radius=3)
        peaks = [(8, 8), (8, 30), (30, 19)]
        for r0, c0 in peaks:
            yy, xx = np.mgrid[0:H, 0:W]
            g += 20.0 * np.exp(-(((yy - r0) ** 2 + (xx - c0) ** 2) / 6.0))
        tops = [(i + 1, c, r, g[r, c]) for i, (r, c) in enumerate(peaks)]
        ids = KR.crown_growth(g, tops, min_height=6.0, height_fraction=0.4, radius=3.0)
        want = _descending_closure(g, tops, 6.0, 0.4, 3.0)
        for tid in (1, 2, 3):
            got = set(zip(*np.nonzero(ids == tid)))
            assert got == want[tid], f"trial {trial} top {tid}"
        rng = np.random.RandomState(100 + trial)


def test_crown_growth_contended_tops_can_diverge_from_closure():
    """Why crowns_verify restricts to ISOLATED tops: with two tops in
    claiming range of the same cells, the engine's visited-set makes
    the claimed sets order-dependent (first enqueue wins), so the
    per-id closure is NOT the engine answer in general."""
    g = np.full((5, 9), 10.0)
    g[2, 3] = 9.5
    g[2, 5] = 9.5
    g[2, 4] = 9.0  # contested saddle, descending path from BOTH tops
    tops = [(1, 2, 2, 10.0), (2, 6, 2, 10.0)]  # dist 4 < 2*radius
    ids = KR.crown_growth(g, tops, min_height=1.0, height_fraction=0.1, radius=3.0)
    want = _descending_closure(g, tops, 1.0, 0.1, 3.0)
    got1 = set(zip(*np.nonzero(ids == 1)))
    got2 = set(zip(*np.nonzero(ids == 2)))
    # the contested cell lands in exactly ONE engine crown but in BOTH
    # closures — the engine result is a partition of the union
    assert (2, 4) in want[1] and (2, 4) in want[2]
    assert ((2, 4) in got1) != ((2, 4) in got2)
