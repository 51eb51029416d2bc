"""Skew salting (north_rule: "skewed cells are salted and split via
explicit repartition + groupby-aggregate shuffles"): a planted
10^5-row hot key must (a) be found by the sampled probe, (b) split
across salt partitions so no phase-1 group holds more than ~1/salt_k
of it, and (c) produce output IDENTICAL to the unsalted computation.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


HOT_N = 100_000
COLD_KEYS = 40
COLD_N = 100


def _skewed_table(seed=3):
    rng = np.random.RandomState(seed)
    k = np.concatenate(
        [np.repeat(np.arange(COLD_KEYS, dtype=np.int64), COLD_N),
         np.full(HOT_N, 99, dtype=np.int64)]
    )
    v = rng.uniform(0, 50, len(k))
    order = rng.permutation(len(k))
    return pa.table({"k": k[order], "v": v[order]})


def test_probe_finds_hot_key(ray_session):
    import ray.data

    from geotools_ray.stages.grouped import detect_hot_key_hashes, hash_columns

    ds = ray.data.from_arrow(_skewed_table())
    hot = detect_hot_key_hashes(ds, ["k"], threshold_frac=0.05)
    want = hash_columns(pa.table({"k": np.array([99], dtype=np.int64)}), ["k"])[0]
    assert want in set(hot.tolist())
    # and nothing cold is flagged (cold keys are ~0.1% of rows each)
    assert len(hot) == 1


def test_salted_grouped_map_bounds_and_identity(ray_session):
    import ray.data

    from geotools_ray.stages.grouped import (
        detect_hot_key_hashes, salted_grouped_map)

    ds = ray.data.from_arrow(_skewed_table())
    hot = detect_hot_key_hashes(ds, ["k"], threshold_frac=0.05)
    salt_k = 8

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["k", "_salt"], sort=False)["v"]
        out = g.agg(["count", "sum"]).reset_index()
        # (b): no phase-1 group holds more than ~1/salt_k of the hot key
        assert out["count"].max() <= HOT_N // salt_k + HOT_N // 10
        return out.rename(columns={"count": "n", "sum": "s"})[["k", "n", "s"]]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", sort=False)[["n", "s"]].sum().reset_index()

    got = (
        salted_grouped_map(ds, ["k"], partial, merge, hot_hashes=hot, salt_k=salt_k)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        _skewed_table().to_pandas().groupby("k")["v"].agg(["count", "sum"])
        .reset_index().rename(columns={"count": "n", "sum": "s"})
    )
    assert np.array_equal(got["k"], want["k"])
    assert np.array_equal(got["n"], want["n"])
    assert np.allclose(got["s"], want["s"])
    # hot key split into salt_k phase-1 partials
    assert HOT_N // salt_k > COLD_N  # the bound in partial() was a real test


def test_grid_exact_salted_identity(ray_session):
    """grid_stats exact path, salted vs unsalted, planted hot cell:
    identical per-cell order statistics and moments."""
    import ray.data

    from geotools_ray.ops.gridstats import GridConfig, grid_stats

    rng = np.random.RandomState(5)
    # 10x10 grid at res 1; cell (0,0) gets 60k points, others ~30
    n_cold = 3000
    x = rng.uniform(0, 10, n_cold)
    y = rng.uniform(0, 10, n_cold)
    xh = rng.uniform(0, 1, 60_000)
    yh = rng.uniform(0, 1, 60_000)
    t = pa.table(
        {
            "x": np.concatenate([x, xh]),
            "y": np.concatenate([y, yh]),
            "z": rng.uniform(0, 30, n_cold + 60_000),
        }
    )
    ds = ray.data.from_arrow(t)
    stats = ("count", "median", "q1", "q3", "skew", "kurtosis")
    base = GridConfig(res=1.0, stats=stats, strategy="exact")
    want = (
        grid_stats(ds, base).to_pandas().sort_values("cell_id").reset_index(drop=True)
    )
    got = (
        grid_stats(ds, GridConfig(res=1.0, stats=stats, strategy="exact", salt_hot=True))
        .to_pandas().sort_values("cell_id").reset_index(drop=True)
    )
    assert np.array_equal(got["cell_id"], want["cell_id"])
    for c in stats:
        assert np.allclose(got[c], want[c], rtol=1e-9, atol=1e-9), c


def test_exact_dedup_salted_identity(ray_session):
    import ray.data

    from geotools_ray.ops.dedup import exact_dedup

    rng = np.random.RandomState(7)
    k = np.concatenate(
        [np.repeat(np.arange(20, dtype=np.int64), 50),
         np.full(50_000, 999, dtype=np.int64)]
    )
    oid = rng.permutation(len(k)).astype(np.int64)
    t = pa.table({"key": k, "oid": oid})
    ds = ray.data.from_arrow(t)
    want = (
        exact_dedup(ds, ["key"], "oid").to_pandas()
        .sort_values("key").reset_index(drop=True)
    )
    got = (
        exact_dedup(ds, ["key"], "oid", salt_hot=True).to_pandas()
        .sort_values("key").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["key", "oid"]], want[["key", "oid"]])


def test_dedup_by_phash_salted_identity(ray_session):
    import ray.data

    from geotools_ray.ops.imagepipeline import dedup_by_phash
    from geotools_ray.stages.grouped import detect_hot_key_hashes

    rng = np.random.RandomState(11)
    ph = np.concatenate(
        [rng.randint(0, 500, 2000), np.full(30_000, 42)]
    ).astype(np.int64)
    pid = rng.randint(1, 5, len(ph)).astype(np.int64)
    iid = np.array([f"img{j:07d}" for j in rng.permutation(len(ph))])
    t = pa.table({"phash": ph, "polygon_id": pid, "image_id": iid})
    ds = ray.data.from_arrow(t)
    want = (
        dedup_by_phash(ds).to_pandas()
        .sort_values(["phash", "polygon_id"]).reset_index(drop=True)
    )
    hot = detect_hot_key_hashes(ds, ["phash", "polygon_id"], threshold_frac=0.05)
    assert len(hot) >= 1
    got = (
        dedup_by_phash(ds, hot_hashes=hot).to_pandas()
        .sort_values(["phash", "polygon_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["phash", "polygon_id", "image_id"]],
        want[["phash", "polygon_id", "image_id"]],
    )
