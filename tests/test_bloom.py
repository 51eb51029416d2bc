"""Bloom-pruned exact semi/anti equi-join: exactness under any bloom
size (false positives verified away, false negatives impossible),
anti fast-path, multi-column keys, empty sides, partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geotools_ray.ops.bloom import (
    _bloom_indices,
    _probe,
    _set_bits,
    bloom_build,
    bloom_semi_join,
)
from geotools_ray.stages.grouped import hash_columns

import pyarrow as pa


def _mk(seed: int, n_left: int, n_right: int, dup: bool = True):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 1000, n_left, dtype=np.int64)
    rk = rng.integers(500, 1500, n_right, dtype=np.int64)
    if dup:
        rk = np.concatenate([rk, rk[: n_right // 3]])
    left = pd.DataFrame(
        {
            "key": lk,
            "payload": rng.integers(-(2**62), 2**62, n_left, dtype=np.int64),
            "txt": [f"s{v}" for v in lk],
        }
    )
    right = pd.DataFrame(
        {"key": rk, "other": rng.standard_normal(len(rk))}
    )
    return left, right


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, 5000, dtype=np.int64)
    t = pa.table({"k": keys})
    h = hash_columns(t, ["k"])
    for num_bits in (64, 1 << 10, 1 << 16):
        words = _set_bits(_bloom_indices(h, num_bits, 4), num_bits)
        assert _probe(words, h, num_bits, 4).all()


def test_set_bits_matches_naive():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 1 << 12, (300, 4)).astype(np.uint64)
    words = _set_bits(idx, 1 << 12)
    naive = np.zeros((1 << 12) >> 6, dtype=np.uint64)
    for v in idx.ravel():
        naive[int(v) >> 6] |= np.uint64(1) << np.uint64(int(v) & 63)
    assert (words == naive).all()


@pytest.mark.parametrize("anti", [False, True])
@pytest.mark.parametrize("num_bits", [64, 1 << 16])
def test_semi_anti_exact_any_bloom_size(ray_session, anti, num_bits):
    """num_bits=64 floods the filter with false positives; the output
    must not change."""
    import ray.data

    left, right = _mk(11, 4000, 800)
    out = bloom_semi_join(
        ray.data.from_pandas(left).repartition(7),
        ray.data.from_pandas(right).repartition(5),
        ["key"],
        anti=anti,
        num_bits=num_bits,
        num_parts=6,
    ).to_pandas()
    member = left["key"].isin(right["key"].unique())
    want = left[~member] if anti else left[member]
    got = _sorted(out)
    exp = _sorted(want)
    assert got.shape == exp.shape
    for c in left.columns:
        assert got[c].dtype == left[c].dtype, c  # payload dtype exact
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_multi_column_key(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "a": rng.integers(0, 20, 1000, dtype=np.int64),
            "b": [f"g{v}" for v in rng.integers(0, 10, 1000)],
            "v": rng.standard_normal(1000),
        }
    )
    right = pd.DataFrame(
        {
            "a": rng.integers(0, 30, 300, dtype=np.int64),
            "b": [f"g{v}" for v in rng.integers(0, 12, 300)],
        }
    )
    out = bloom_semi_join(
        ray.data.from_pandas(left).repartition(4),
        ray.data.from_pandas(right).repartition(3),
        ["a", "b"],
        num_bits=1 << 12,
        num_parts=4,
    ).to_pandas()
    rset = set(map(tuple, right[["a", "b"]].itertuples(index=False)))
    member = [
        (a, b) in rset for a, b in left[["a", "b"]].itertuples(index=False)
    ]
    assert _sorted(out).equals(_sorted(left[np.array(member)]))


def test_empty_right(ray_session):
    import ray.data

    left, right = _mk(2, 500, 100)
    empty = right.iloc[:0]
    semi = bloom_semi_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(empty),
        ["key"],
        num_bits=1 << 10,
    ).to_pandas()
    assert len(semi) == 0
    anti = bloom_semi_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(empty),
        ["key"],
        anti=True,
        num_bits=1 << 10,
    ).to_pandas()
    assert _sorted(anti).equals(_sorted(left))


def test_partition_invariance(ray_session):
    import ray.data

    left, right = _mk(17, 2000, 400)
    outs = []
    for lp, rp, parts in ((1, 1, 2), (9, 6, 11)):
        out = bloom_semi_join(
            ray.data.from_pandas(left).repartition(lp),
            ray.data.from_pandas(right).repartition(rp),
            ["key"],
            num_bits=1 << 14,
            num_parts=parts,
        ).to_pandas()
        outs.append(_sorted(out))
    assert outs[0].equals(outs[1])


def test_bloom_build_merge_matches_single_pass(ray_session):
    """Two-level OR-merge equals a one-shot build over the whole key
    set (associativity), regardless of blocks."""
    import ray.data

    rng = np.random.default_rng(23)
    keys = rng.integers(0, 10**9, 20_000, dtype=np.int64)
    df = pd.DataFrame({"k": keys})
    words = bloom_build(
        ray.data.from_pandas(df).repartition(13), ["k"], num_bits=1 << 14
    )
    h = hash_columns(pa.table({"k": keys}), ["k"])
    single = _set_bits(_bloom_indices(h, 1 << 14, 4), 1 << 14)
    assert (words == single).all()


def test_bloom_null_keys_rejected(ray_session):
    """SQL IN/NOT IN drops null keys (and NOT IN returns nothing when
    the build side holds one) — the op refuses to guess, same contract
    as asof/window/interval."""
    import ray.data

    from geotools_ray.ops.bloom import bloom_semi_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None, 3], pa.int64()), "v": [1.0, 2.0, 3.0]})
    )
    right = ray.data.from_arrow(pa.table({"k": pa.array([1, 3], pa.int64())}))
    with pytest.raises(Exception, match="null"):
        bloom_semi_join(left, right, ["k"]).to_pandas()
    clean = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "v": [1.0, 2.0]})
    )
    dirty_right = ray.data.from_arrow(pa.table({"k": pa.array([1, None], pa.int64())}))
    with pytest.raises(Exception, match="null"):
        bloom_semi_join(clean, dirty_right, ["k"]).to_pandas()
