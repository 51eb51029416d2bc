"""ops/asof.py — distributed keyed as-of join vs a straight-line
brute-force oracle (per left row: scan every right row of its key)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geotools_ray.ops.asof import asof_join


def _brute(l, r, direction, tolerance):
    """Reference: per left row, nearest right `on` of the same key in
    the given direction (ties -> the LAST under (on, tie) order, which
    _mk fixtures make unique or tie-broken). Returns (r_on, r_val)
    lists with None for unmatched."""
    out_on, out_val = [], []
    for k, t in zip(l["k"], l["on"]):
        best = None  # (sort_key, on, val)
        for rk, rt, rv, tie in zip(r["k"], r["on"], r["val"], r["tie"]):
            if rk != k:
                continue
            d = rt - t
            if direction == "backward" and d > 0:
                continue
            if direction == "forward" and d < 0:
                continue
            dist = abs(d)
            if tolerance is not None and dist > tolerance:
                continue
            # nearest wins; equal distance -> backward side wins for
            # 'nearest' (pandas semantics); equal (on) -> larger tie
            if direction == "nearest":
                cand = (dist, 0 if d <= 0 else 1, tie)
            else:
                cand = (dist, 0, tie)
            if best is None or cand[:2] < best[0][:2] or (
                cand[:2] == best[0][:2] and cand[2] > best[0][2]
            ):
                best = (cand, rt, rv)
        out_on.append(None if best is None else best[1])
        out_val.append(None if best is None else best[2])
    return out_on, out_val


def _mk(seed, n_l=300, n_r=200, keys=7, span=1000, dup_frac=0.3):
    rng = np.random.default_rng(seed)
    l = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n_l).astype(np.int64),
            "on": rng.integers(0, span, n_l).astype(np.int64),
            "lid": np.arange(n_l, dtype=np.int64),
        }
    )
    r_on = rng.integers(0, span, n_r).astype(np.int64)
    # force duplicate (k, on) pairs so tie-breaking is exercised
    ndup = int(n_r * dup_frac)
    r_on[:ndup] = r_on[ndup : 2 * ndup]
    r = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n_r).astype(np.int64),
            "on": r_on,
            "val": rng.normal(size=n_r),
            "tie": np.arange(n_r, dtype=np.int64),
        }
    )
    r.loc[: ndup - 1, "k"] = r.loc[ndup : 2 * ndup - 1, "k"].to_numpy()
    return l, r


def _run(l, r, num_parts=5, **kw):
    import ray.data

    out = asof_join(
        ray.data.from_pandas(l),
        ray.data.from_pandas(r),
        key="k",
        on="on",
        right_cols=["val"],
        tie_cols=["tie"],
        num_parts=num_parts,
        **kw,
    ).to_pandas()
    return out.sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 50])
def test_asof_matches_bruteforce(ray_session, direction, tolerance):
    l, r = _mk(seed=11)
    got = _run(l, r, direction=direction, tolerance=tolerance)
    want_on, want_val = _brute(l, r, direction, tolerance)
    assert len(got) == len(l)
    for i in range(len(l)):
        g_on = got["r_on"].iloc[i]
        if want_on[i] is None:
            assert pd.isna(g_on)
            assert pd.isna(got["val"].iloc[i])
        else:
            assert int(g_on) == int(want_on[i])
            assert got["val"].iloc[i] == want_val[i]


def test_asof_partition_invariance(ray_session):
    l, r = _mk(seed=23)
    a = _run(l, r, num_parts=1)
    b = _run(l, r, num_parts=13)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_asof_int64_exactness_beyond_float53(ray_session):
    """Micro-timestamps near 2^60 survive bit-exact: the op hands
    merge_asof only row positions, never the on/payload values."""
    import ray.data

    base = np.int64(1 << 60)
    l = pd.DataFrame(
        {"k": np.zeros(3, dtype=np.int64),
         "on": base + np.array([5, 10, 1], dtype=np.int64),
         "lid": np.arange(3, dtype=np.int64)}
    )
    r = pd.DataFrame(
        {"k": np.zeros(2, dtype=np.int64),
         "on": base + np.array([3, 9], dtype=np.int64),
         "val": np.array([1.5, 2.5])}
    )
    ds = asof_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r),
        key="k", on="on", right_cols=["val"], num_parts=3,
    )
    # assert on the ARROW output: to_pandas() would float64 the
    # nullable int64 r_on (the exact hazard this op is guarding)
    tb = pa.concat_tables(
        b for b in ds.iter_batches(batch_format="pyarrow")
    ).combine_chunks()
    tb = tb.take(pa.compute.sort_indices(tb["lid"]))
    assert tb["on"].to_pylist() == list(l["on"])  # not float-rounded
    assert tb["r_on"].to_pylist() == [int(base + 3), int(base + 9), None]


def test_asof_empty_right_and_absent_keys(ray_session):
    import ray.data

    l = pd.DataFrame(
        {"k": np.array([1, 2], dtype=np.int64),
         "on": np.array([10, 20], dtype=np.int64),
         "lid": np.array([0, 1], dtype=np.int64)}
    )
    r_empty = pd.DataFrame(
        {"k": pd.Series(dtype=np.int64), "on": pd.Series(dtype=np.int64),
         "val": pd.Series(dtype=np.float64)}
    )
    out = asof_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r_empty),
        key="k", on="on", right_cols=["val"], num_parts=2,
    ).to_pandas()
    assert len(out) == 2 and out["r_on"].isna().all()

    # keys present on left only: unmatched, schema-stable
    r = pd.DataFrame(
        {"k": np.array([2], dtype=np.int64),
         "on": np.array([5], dtype=np.int64),
         "val": np.array([7.0])}
    )
    out = asof_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r),
        key="k", on="on", right_cols=["val"], num_parts=4,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    assert pd.isna(out["r_on"].iloc[0]) and int(out["r_on"].iloc[1]) == 5


def test_asof_string_key_and_timestamp_on(ray_session):
    import ray.data

    l = pa.table(
        {"k": ["a", "b", "a"],
         "on": pa.array([2_000_000, 1_000_000, 500_000],
                        pa.timestamp("us")),
         "lid": pa.array([0, 1, 2], pa.int64())}
    )
    r = pa.table(
        {"k": ["a", "b"],
         "on": pa.array([1_500_000, 999_999], pa.timestamp("us")),
         "val": pa.array([3.0, 4.0])}
    )
    out = asof_join(
        ray.data.from_arrow(l), ray.data.from_arrow(r),
        key="k", on="on", right_cols=["val"], num_parts=3,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    # timestamps come back as epoch-micros int64 (documented contract)
    assert out["on"].tolist() == [2_000_000, 1_000_000, 500_000]
    assert int(out["r_on"].iloc[0]) == 1_500_000
    assert int(out["r_on"].iloc[1]) == 999_999
    assert pd.isna(out["r_on"].iloc[2])
    assert out["val"].iloc[0] == 3.0


def test_asof_duplicate_right_on_tiebreak(ray_session):
    """Equal (key, on) right rows: the LAST under (on, tie) wins —
    partition-invariant because tie is total."""
    import ray.data

    l = pd.DataFrame(
        {"k": np.zeros(1, dtype=np.int64),
         "on": np.array([10], dtype=np.int64),
         "lid": np.array([0], dtype=np.int64)}
    )
    r = pd.DataFrame(
        {"k": np.zeros(3, dtype=np.int64),
         "on": np.array([5, 5, 5], dtype=np.int64),
         "val": np.array([1.0, 2.0, 3.0]),
         "tie": np.array([2, 0, 1], dtype=np.int64)}
    )
    out = asof_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r),
        key="k", on="on", right_cols=["val"], tie_cols=["tie"],
        num_parts=2,
    ).to_pandas()
    assert out["val"].iloc[0] == 1.0  # tie=2 is last under (on, tie)


def test_asof_validation_errors(ray_session):
    import ray.data

    l = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "on": [1], "val": [0.0]})
    )
    r = ray.data.from_pandas(pd.DataFrame({"k": [1], "on": [1], "v": [0.0]}))
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, key="k", on="on", right_cols=["v"],
                  direction="sideways")
    with pytest.raises(KeyError, match="right_cols"):
        asof_join(l, r, key="k", on="on", right_cols=["nope"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, key="k", on="on", right_cols=["v"], r_on="val")


def test_asof_multi_matches_single_spec_joins(ray_session):
    """asof_join_multi's one-shuffle variants equal per-spec
    asof_join runs, and finalize sees whole keys per partition."""
    import ray.data

    from geotools_ray.ops.asof import asof_join_multi

    l, r = _mk(seed=31)
    specs = [
        {"direction": "backward", "r_on": "r_b"},
        {"direction": "backward", "tolerance": 40, "r_on": "r_t",
         "right_cols": []},
        {"direction": "forward", "r_on": "r_f", "right_cols": []},
        {"direction": "nearest", "r_on": "r_n", "right_cols": []},
    ]
    multi = (
        asof_join_multi(
            ray.data.from_pandas(l), ray.data.from_pandas(r),
            key="k", on="on", right_cols=["val"], specs=specs,
            tie_cols=["tie"], num_parts=7,
        )
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    for spec in specs:
        single = _run(
            l, r, num_parts=7,
            direction=spec["direction"], tolerance=spec.get("tolerance"),
        )
        got = multi[spec["r_on"]]
        pd.testing.assert_series_equal(
            got, single["r_on"], check_names=False, check_dtype=False
        )
    # spec-0 payload column carries the backward match's value
    pd.testing.assert_series_equal(
        multi["val"], _run(l, r, num_parts=7)["val"],
        check_names=False, check_dtype=False,
    )

    # finalize runs per partition on whole keys: per-key row counts
    # summed across partitions must equal a global count
    def fin(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": t["k"].to_numpy(zero_copy_only=False)})
        out = df.groupby("k").size().reset_index(name="n")
        return pa.Table.from_pandas(out, preserve_index=False)

    rolled = (
        asof_join_multi(
            ray.data.from_pandas(l), ray.data.from_pandas(r),
            key="k", on="on", right_cols=["val"], specs=specs,
            tie_cols=["tie"], num_parts=7, finalize=fin,
        )
        .to_pandas()
    )
    # whole-key contract: each key appears in exactly one partition
    assert rolled["k"].is_unique
    want = l.groupby("k").size()
    got = rolled.set_index("k")["n"]
    assert got.sort_index().tolist() == want.sort_index().tolist()


def test_asof_multi_duplicate_r_on_rejected(ray_session):
    import ray.data

    from geotools_ray.ops.asof import asof_join_multi

    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "on": [1]}))
    r = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "on": [1], "v": [0.0]})
    )
    with pytest.raises(ValueError, match="distinct"):
        asof_join_multi(
            l, r, key="k", on="on", right_cols=["v"],
            specs=[{"direction": "backward"}, {"direction": "forward"}],
        )


def test_asof_multi_finalize_right_only_partition(ray_session):
    """A partition holding only right-side keys hits the nl==0 path:
    finalize must receive a schema-stable EMPTY join table (not crash,
    not emit rows for keys with no left rows)."""
    import ray.data

    from geotools_ray.ops.asof import asof_join_multi

    l = pd.DataFrame(
        {"k": np.array([1], dtype=np.int64),
         "on": np.array([10], dtype=np.int64),
         "lid": np.array([0], dtype=np.int64)}
    )
    # many right-only keys so SOME partition holds no left rows
    r = pd.DataFrame(
        {"k": np.arange(2, 40, dtype=np.int64),
         "on": np.full(38, 5, dtype=np.int64),
         "val": np.ones(38)}
    )

    def fin(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"k": t["k"].to_numpy(zero_copy_only=False),
             "n": np.ones(len(t), dtype=np.int64)}
        )
        out = df.groupby("k", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    got = asof_join_multi(
        ray.data.from_pandas(l), ray.data.from_pandas(r),
        key="k", on="on", right_cols=["val"],
        specs=[{"direction": "backward", "r_on": "r_b"}],
        num_parts=8, finalize=fin,
    ).to_pandas()
    assert got["k"].tolist() == [1]
    assert got["n"].tolist() == [1]


def test_asof_tie_col_name_clash_rejected(ray_session):
    """A tie/gathered right column sharing a LEFT column's name would
    silently null-pad the left copy in the union — must raise."""
    import ray.data

    l = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "on": [1], "val": [111.0]})
    )
    r = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "on": [1], "val": [5.0], "v2": [1.0]})
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, key="k", on="on", right_cols=["v2"],
                  tie_cols=["val"])


def test_asof_null_tie_loses_dedupe(ray_session):
    """A null tie value among duplicate (key, on) right rows loses the
    dedupe (SQL max() ignores NULLs); an all-null group yields null."""
    import ray.data

    l = pd.DataFrame(
        {"k": np.array([0, 1], dtype=np.int64),
         "on": np.array([10, 10], dtype=np.int64),
         "lid": np.array([0, 1], dtype=np.int64)}
    )
    r = pd.DataFrame(
        {"k": np.array([0, 0, 1, 1], dtype=np.int64),
         "on": np.array([5, 5, 5, 5], dtype=np.int64),
         "val": np.array([3.0, np.nan, np.nan, np.nan])}
    )
    out = asof_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r),
        key="k", on="on", right_cols=["val"], tie_cols=["val"],
        num_parts=3,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    assert out["val"].iloc[0] == 3.0  # non-null max wins
    assert pd.isna(out["val"].iloc[1])  # all-null group stays null


def test_asof_null_on_or_key_rejected(ray_session):
    import ray.data

    l_null_on = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "on": pa.array([1, None], pa.int64()),
                  "lid": pa.array([0, 1], pa.int64())})
    )
    r = ray.data.from_pandas(
        pd.DataFrame({"k": np.array([1], dtype=np.int64),
                      "on": np.array([1], dtype=np.int64),
                      "val": [1.0]})
    )
    with pytest.raises(Exception, match="nulls"):
        asof_join(l_null_on, r, key="k", on="on",
                  right_cols=["val"]).materialize()

    l_null_key = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None], pa.int64()),
                  "on": pa.array([1, 2], pa.int64()),
                  "lid": pa.array([0, 1], pa.int64())})
    )
    with pytest.raises(Exception, match="null"):
        asof_join(l_null_key, r, key="k", on="on",
                  right_cols=["val"]).materialize()


# ---------------------------------------------------------------------------
# hypothesis property sweep (bounded: each example runs through Ray)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_l=st.integers(1, 40),
    n_r=st.integers(0, 30),
    keys=st.integers(1, 5),
    span=st.integers(1, 50),  # tiny span -> heavy (key, on) dup ties
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.sampled_from([None, 0, 7]),
)
def test_asof_property_vs_brute(
    ray_session, seed, n_l, n_r, keys, span, direction, tolerance
):
    rng = np.random.default_rng(seed)
    l = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n_l).astype(np.int64),
            "on": rng.integers(0, span, n_l).astype(np.int64),
            "lid": np.arange(n_l, dtype=np.int64),
        }
    )
    r = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n_r).astype(np.int64),
            "on": rng.integers(0, span, n_r).astype(np.int64),
            "val": rng.normal(size=n_r),
            "tie": np.arange(n_r, dtype=np.int64),
        }
    )
    got = _run(l, r, num_parts=3, direction=direction, tolerance=tolerance)
    want_on, want_val = _brute(l, r, direction, tolerance)
    assert len(got) == len(l)
    for i in range(len(l)):
        if want_on[i] is None:
            assert pd.isna(got["r_on"].iloc[i])
        else:
            assert int(got["r_on"].iloc[i]) == int(want_on[i])
            assert got["val"].iloc[i] == want_val[i]
