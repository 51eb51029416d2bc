"""Cell-ring kNN and cell-bucketed range join must exactly match the
broadcast/brute-force implementations."""

import numpy as np
import pandas as pd
import pytest


def _points(ray_session, n=3000, seed=0):
    import ray.data

    rng = np.random.RandomState(seed)
    rows = [
        {
            "l_orderkey": i,
            "l_linenumber": i % 7,
            "x": float(rng.uniform(0, 100)),
            "y": float(rng.uniform(0, 100)),
        }
        for i in range(n)
    ]
    return ray.data.from_items(rows)


def _samples(m=40, seed=1):
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "s_suppkey": np.arange(m, dtype=np.int64),
            "sx": rng.uniform(0, 100, m),
            "sy": rng.uniform(0, 100, m),
        }
    )


def test_knn_cell_ring_matches_bruteforce(ray_session):
    import ray.data

    from geotools_ray.kernels.grid import Bounds
    from geotools_ray.ops.celljoin import build_cell_index, knn_cell_ring
    from geotools_ray.ops.neighbors import knn_join

    pts = _points(ray_session)
    smp = _samples()
    b = Bounds(0, 0, 100, 100)
    idx = build_cell_index(pts, res=5.0, bounds=b)
    qds = ray.data.from_arrow(smp)
    got = (
        knn_cell_ring(qds, idx, k=5)
        .to_pandas()
        .sort_values(["s_suppkey", "rank"])
        .reset_index(drop=True)
    )
    want = (
        knn_join(pts, smp, k=5)
        .to_pandas()
        .sort_values(["s_suppkey", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["s_suppkey", "rank", "l_orderkey", "l_linenumber"]],
        want[["s_suppkey", "rank", "l_orderkey", "l_linenumber"]],
    )
    np.testing.assert_allclose(got["dist"], want["dist"], rtol=1e-12)


def test_knn_cell_ring_sparse_far_queries(ray_session):
    """Queries far from any point force multi-ring expansion."""
    import pyarrow as pa
    import ray.data

    from geotools_ray.kernels.grid import Bounds
    from geotools_ray.ops.celljoin import build_cell_index, knn_cell_ring
    from geotools_ray.ops.neighbors import knn_join

    rng = np.random.RandomState(3)
    # clustered points in one corner
    rows = [
        {"l_orderkey": i, "l_linenumber": 0,
         "x": float(rng.uniform(0, 10)), "y": float(rng.uniform(0, 10))}
        for i in range(200)
    ]
    pts = ray.data.from_items(rows)
    smp = pa.table(
        {"s_suppkey": np.array([0, 1], dtype=np.int64),
         "sx": np.array([95.0, 50.0]), "sy": np.array([95.0, 50.0])}
    )
    b = Bounds(0, 0, 100, 100)
    idx = build_cell_index(pts, res=5.0, bounds=b)
    got = knn_cell_ring(ray.data.from_arrow(smp), idx, k=3).to_pandas()
    want = knn_join(pts, smp, k=3).to_pandas()
    g = got.sort_values(["s_suppkey", "rank"])["l_orderkey"].to_numpy()
    w = want.sort_values(["s_suppkey", "rank"])["l_orderkey"].to_numpy()
    np.testing.assert_array_equal(g, w)


def test_range_join_ulp_boundary_pair_kept(ray_session):
    """Regression: the x-window prune computed fl(chunk_min - radius)
    and dropped a sample with sx strictly below it even though
    fl(x - sx) == radius EXACTLY (x=4.2, sx=0.2, r=4: 4.2-4.0 > 0.2
    but 4.2-0.2 == 4.0), while the d2 <= r2 criterion — and the SQL
    oracle — keep the pair. The widened window must include it."""
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.neighbors import range_join

    assert (4.2 - 4.0) > 0.2 and (4.2 - 0.2) == 4.0  # the fp facts
    pts = ray.data.from_arrow(
        pa.table(
            {
                "x": np.array([4.2]),
                "y": np.array([1.0]),
                "l_orderkey": np.array([1], dtype=np.int64),
                "l_linenumber": np.array([1], dtype=np.int64),
            }
        )
    )
    smp = pa.table(
        {
            "s_suppkey": np.array([7], dtype=np.int64),
            "sx": np.array([0.2]),
            "sy": np.array([1.0]),
        }
    )
    out = range_join(pts, smp, radius=4.0).to_pandas()
    assert len(out) == 1 and out["dist"].iloc[0] == 4.0


def test_range_join_cells_matches_broadcast(ray_session):
    import pyarrow as pa
    import ray.data

    from geotools_ray.kernels.grid import Bounds
    from geotools_ray.ops.celljoin import range_join_cells
    from geotools_ray.ops.neighbors import range_join

    pts = _points(ray_session, n=2000, seed=5)
    smp = _samples(m=30, seed=6)
    want = (
        range_join(pts, smp, radius=4.0)
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber", "s_suppkey"])
        .reset_index(drop=True)
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "s_suppkey": smp["s_suppkey"],
                "rx": smp["sx"],
                "ry": smp["sy"],
            }
        )
    )
    got = (
        range_join_cells(pts, right, radius=4.0, bounds=Bounds(0, 0, 100, 100))
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber", "s_suppkey"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["l_orderkey", "l_linenumber", "s_suppkey"]],
        want[["l_orderkey", "l_linenumber", "s_suppkey"]],
    )
    np.testing.assert_allclose(got["dist"], want["dist"], rtol=1e-12)


def test_sharded_index_knn_matches_bruteforce(ray_session):
    """ST3 actor-sharded index: lockstep ring kNN == brute force."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geotools_ray.kernels.grid import Bounds
    from geotools_ray.ops.celljoin import (
        build_sharded_cell_index, knn_cell_ring_sharded,
    )

    rng = np.random.RandomState(17)
    n = 4000
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 100, n)
    pid = np.arange(n, dtype=np.int64)
    pts = ray.data.from_arrow(
        pa.table({"x": px, "y": py, "l_orderkey": pid, "l_linenumber": pid % 7})
    )
    idx = build_sharded_cell_index(
        pts, res=5.0, bounds=Bounds(0.0, 0.0, 100.0, 100.0), num_shards=3
    )
    qx = rng.uniform(5, 95, 25)
    qy = rng.uniform(5, 95, 25)
    qid = np.arange(25, dtype=np.int64)
    qds = ray.data.from_arrow(pa.table({"s_suppkey": qid, "sx": qx, "sy": qy}))
    out = knn_cell_ring_sharded(qds, idx, k=5).to_pandas()

    for qi in range(25):
        d2 = (px - qx[qi]) ** 2 + (py - qy[qi]) ** 2
        order = np.lexsort((pid % 7, pid, d2))[:5]
        want = pid[order]
        got = out[out["s_suppkey"] == qi].sort_values("rank")["l_orderkey"].to_numpy()
        np.testing.assert_array_equal(got, want)


def test_knn_full_coverage_beyond_fixed_ring_cap(ray_session):
    """Round-3 review repro: with res=1.0 the nearest point to the far
    query sits >100 rings out — the old fixed max_ring=64 silently
    emitted ZERO rows for it. Expansion must now run to grid coverage
    and return the exact kNN from both index variants."""
    import pyarrow as pa
    import ray.data

    from geotools_ray.kernels.grid import Bounds
    from geotools_ray.ops.celljoin import (
        build_cell_index,
        build_sharded_cell_index,
        knn_cell_ring,
        knn_cell_ring_sharded,
    )
    from geotools_ray.ops.neighbors import knn_join

    rng = np.random.RandomState(5)
    rows = [
        {"l_orderkey": i, "l_linenumber": 0,
         "x": float(rng.uniform(0, 10)), "y": float(rng.uniform(0, 10))}
        for i in range(50)
    ]
    pts = ray.data.from_items(rows)
    smp = pa.table(
        {"s_suppkey": np.array([0], dtype=np.int64),
         "sx": np.array([95.0]), "sy": np.array([95.0])}
    )
    b = Bounds(0, 0, 100, 100)
    want = knn_join(pts, smp, k=3).to_pandas()
    w = want.sort_values(["s_suppkey", "rank"])["l_orderkey"].to_numpy()

    idx = build_cell_index(pts, res=1.0, bounds=b)
    got = knn_cell_ring(ray.data.from_arrow(smp), idx, k=3).to_pandas()
    assert len(got) == 3
    np.testing.assert_array_equal(
        got.sort_values(["s_suppkey", "rank"])["l_orderkey"].to_numpy(), w
    )
    # an explicit too-small cap raises instead of silently truncating
    with pytest.raises(Exception, match="max_ring"):
        knn_cell_ring(ray.data.from_arrow(smp), idx, k=3, max_ring=10).to_pandas()

    sidx = build_sharded_cell_index(pts, res=1.0, bounds=b, num_shards=2)
    got2 = knn_cell_ring_sharded(
        ray.data.from_arrow(smp), sidx, k=3, num_query_blocks=None
    ).to_pandas()
    assert len(got2) == 3
    np.testing.assert_array_equal(
        got2.sort_values(["s_suppkey", "rank"])["l_orderkey"].to_numpy(), w
    )
    with pytest.raises(Exception, match="max_ring"):
        knn_cell_ring_sharded(
            ray.data.from_arrow(smp), sidx, k=3, max_ring=10,
            num_query_blocks=None,
        ).to_pandas()


def test_range_join_cells_prefilter_parity_and_prunes(ray_session):
    """prefilter_left is a pure optimization: identical output on a
    SPARSE right side (all samples in one corner, most left cells
    unmatched), and the right reach-cell set is tiny vs the grid."""
    import pyarrow as pa
    import ray.data

    from geotools_ray.kernels.grid import Bounds
    from geotools_ray.ops.celljoin import distinct_cells, range_join_cells

    pts = _points(ray_session, n=3000, seed=8)
    rng = np.random.RandomState(9)
    m = 10
    right = ray.data.from_arrow(
        pa.table(
            {
                "s_suppkey": np.arange(m, dtype=np.int64),
                "rx": rng.uniform(0, 8, m),  # one corner of the 100x100 domain
                "ry": rng.uniform(0, 8, m),
            }
        )
    )
    kw = dict(radius=2.0, bounds=Bounds(0, 0, 100, 100))
    cols = ["l_orderkey", "l_linenumber", "s_suppkey"]
    a = (
        range_join_cells(pts, right, prefilter_left=True, **kw)
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    b = (
        range_join_cells(pts, right, prefilter_left=False, **kw)
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a[cols], b[cols])

    # the broadcastable set is bounded by populated reach cells: the
    # corner fixture covers << the 50x50 cell grid
    def reach(t):
        from geotools_ray.ops.celljoin import _pack

        x = t["rx"].to_numpy(zero_copy_only=False)
        y = t["ry"].to_numpy(zero_copy_only=False)
        c = np.floor(x / 2.0).astype(np.int64)
        r = np.floor(y / 2.0).astype(np.int64)
        return _pack(c, r)

    cells = distinct_cells(right, reach)
    assert 0 < len(cells) <= 25  # 8x8 corner at res 2 -> <= 5x5 cells
