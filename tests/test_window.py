"""ops/window.py — keyed ordered-window analytics vs a pandas
straight-line oracle (per-key sort + shift/expanding)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geotools_ray.ops.window import keyed_window


def _mk(seed, n=400, keys=9):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n).astype(np.int64),
            "on": rng.integers(0, 500, n).astype(np.int64),  # dup-heavy
            "eid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        }
    )
    return df


def _brute(df):
    """Per key: sort by (on, eid), then rank / lag / lead / gap /
    running sum/min/max via plain pandas per-group ops."""
    s = df.sort_values(["k", "on", "eid"], kind="mergesort").copy()
    g = s.groupby("k", sort=False)
    s["row_number"] = g.cumcount() + 1
    lag = g["on"].shift(1)
    lead = g["on"].shift(-1)
    s["lag_on"] = lag.fillna(0).astype(np.int64)
    s["lag_valid"] = (~lag.isna()).astype(np.int8)
    s["lead_on"] = lead.fillna(0).astype(np.int64)
    s["lead_valid"] = (~lead.isna()).astype(np.int8)
    s["gap"] = (s["on"] - s["lag_on"]).where(s["lag_valid"] == 1, 0)
    s["run_sum_v"] = g["v"].cumsum()
    s["run_min_v"] = g["v"].cummin()
    s["run_max_v"] = g["v"].cummax()
    return s.sort_values("eid").reset_index(drop=True)


def _run(df, num_parts=5, outputs=None):
    import ray.data

    out = keyed_window(
        ray.data.from_pandas(df),
        key="k",
        on="on",
        tie_cols=["eid"],
        value_col="v",
        outputs=outputs
        or ("row_number", "lag", "lead", "gap", "run_sum", "run_min", "run_max"),
        num_parts=num_parts,
    ).to_pandas()
    return out.sort_values("eid").reset_index(drop=True)


def test_window_matches_bruteforce(ray_session):
    df = _mk(seed=5)
    got = _run(df)
    want = _brute(df)
    for c in [
        "row_number", "lag_on", "lag_valid", "lead_on", "lead_valid",
        "gap", "run_sum_v", "run_min_v", "run_max_v",
    ]:
        np.testing.assert_allclose(
            got[c].to_numpy(), want[c].to_numpy(), rtol=0, atol=0,
            err_msg=c,
        )


def test_window_partition_invariance(ray_session):
    df = _mk(seed=17)
    a = _run(df, num_parts=1)
    b = _run(df, num_parts=11)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
    )


def test_window_int64_gap_beyond_float53(ray_session):
    """Micro-timestamp gaps survive exactly: lag/gap are pure int64
    numpy (no pandas shift -> float64 NaN detour)."""
    import ray.data

    base = np.int64(1 << 60)
    df = pd.DataFrame(
        {
            "k": np.zeros(3, dtype=np.int64),
            "on": base + np.array([1, 6, 12], dtype=np.int64),
            "eid": np.arange(3, dtype=np.int64),
            "v": np.ones(3),
        }
    )
    out = (
        keyed_window(
            ray.data.from_pandas(df), key="k", on="on", tie_cols=["eid"],
            value_col="v", outputs=("lag", "gap"), num_parts=2,
        )
        .to_pandas().sort_values("eid")
    )
    assert out["on"].tolist() == list(df["on"])
    assert out["gap"].tolist() == [0, 5, 6]
    assert out["lag_on"].tolist() == [0, int(base + 1), int(base + 6)]
    assert out["lag_valid"].tolist() == [0, 1, 1]


def test_window_single_row_keys_and_empty(ray_session):
    import ray.data

    df = pd.DataFrame(
        {
            "k": np.array([1, 2, 3], dtype=np.int64),
            "on": np.array([5, 5, 5], dtype=np.int64),
            "eid": np.arange(3, dtype=np.int64),
            "v": np.array([1.0, 2.0, 3.0]),
        }
    )
    out = _run(df, num_parts=4)
    assert out["row_number"].tolist() == [1, 1, 1]
    assert out["gap"].tolist() == [0, 0, 0]
    assert out["lead_valid"].tolist() == [0, 0, 0]
    assert out["run_sum_v"].tolist() == [1.0, 2.0, 3.0]


def test_window_validation(ray_session):
    import ray.data

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "on": [1], "v": [0.0]})
    )
    with pytest.raises(ValueError, match="unknown window outputs"):
        keyed_window(ds, key="k", on="on", outputs=("rank",))
    with pytest.raises(ValueError, match="value_col"):
        keyed_window(ds, key="k", on="on", outputs=("run_sum",))


def test_window_nulls_rejected_and_timestamp_on(ray_session):
    import ray.data

    # timestamp `on` -> epoch-micro int64 output (asof contract)
    t = pa.table(
        {"k": pa.array([0, 0], pa.int64()),
         "on": pa.array([1_000_000, 3_000_000], pa.timestamp("us")),
         "eid": pa.array([0, 1], pa.int64()),
         "v": pa.array([1.0, 2.0])}
    )
    out = (
        keyed_window(
            ray.data.from_arrow(t), key="k", on="on", tie_cols=["eid"],
            value_col="v", outputs=("gap",), num_parts=2,
        )
        .to_pandas().sort_values("eid")
    )
    assert out["on"].tolist() == [1_000_000, 3_000_000]
    assert out["gap"].tolist() == [0, 2_000_000]

    # nulls in a computation column raise; nullable KEEP columns pass
    t2 = pa.table(
        {"k": pa.array([0, 0], pa.int64()),
         "on": pa.array([1, None], pa.int64()),
         "eid": pa.array([0, 1], pa.int64()),
         "v": pa.array([1.0, 2.0])}
    )
    with pytest.raises(Exception, match="nulls"):
        keyed_window(
            ray.data.from_arrow(t2), key="k", on="on", tie_cols=["eid"],
            value_col="v", outputs=("gap",),
        ).materialize()

    t3 = pa.table(
        {"k": pa.array([0, 0], pa.int64()),
         "on": pa.array([1, 2], pa.int64()),
         "eid": pa.array([0, 1], pa.int64()),
         "v": pa.array([1.0, 2.0]),
         "keep": pa.array([None, 7], pa.int64())}
    )
    out3 = (
        keyed_window(
            ray.data.from_arrow(t3), key="k", on="on", tie_cols=["eid"],
            value_col="v", outputs=("row_number",), keep_cols=["keep"],
            num_parts=2,
        )
        .to_pandas().sort_values("eid")
    )
    # nullable keep column survives as nullable (arrow take path)
    assert pd.isna(out3["keep"].iloc[0]) and out3["keep"].iloc[1] == 7


def _brute_trailing(df, W):
    """Per row: aggregate every row of its key with on in
    [on_i - W, on_i] (SQL RANGE peers included)."""
    cnt, sm, mn, mx = [], [], [], []
    for _, row in df.iterrows():
        m = (
            (df["k"] == row["k"])
            & (df["on"] >= row["on"] - W)
            & (df["on"] <= row["on"])
        )
        v = df.loc[m, "v"]
        cnt.append(int(m.sum()))
        sm.append(float(v.sum()))
        mn.append(float(v.min()))
        mx.append(float(v.max()))
    return cnt, sm, mn, mx


def test_window_trailing_matches_bruteforce(ray_session):
    import ray.data

    df = _mk(seed=41, n=300, keys=5)  # dup-heavy `on` -> peers hit
    W = 60
    out = (
        keyed_window(
            ray.data.from_pandas(df), key="k", on="on", tie_cols=["eid"],
            value_col="v",
            outputs=("trail_count", "trail_sum", "trail_min", "trail_max"),
            trail_window=W, num_parts=7,
        )
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    cnt, sm, mn, mx = _brute_trailing(df, W)
    assert out["trail_count"].tolist() == cnt
    np.testing.assert_allclose(out["trail_sum_v"].to_numpy(), sm, atol=1e-9)
    np.testing.assert_allclose(out["trail_min_v"].to_numpy(), mn, atol=0)
    np.testing.assert_allclose(out["trail_max_v"].to_numpy(), mx, atol=0)
    # peers (equal on within a key) share identical trail outputs
    dup = df.groupby(["k", "on"]).size()
    kk, oo = next(iter(dup[dup > 1].index))
    peer_rows = out[(out["k"] == kk) & (out["on"] == oo)]
    assert peer_rows["trail_count"].nunique() == 1
    assert peer_rows["trail_sum_v"].nunique() == 1


def test_window_trailing_overflow_fallback(ray_session):
    """Astronomical spans route through the per-segment fallback and
    agree with the vectorized path's semantics."""
    import ray.data

    # span so large that (span + W + 1) * n_segs >= 2^62
    df = pd.DataFrame(
        {
            "k": np.repeat(np.arange(8, dtype=np.int64), 3),
            "on": np.tile(np.array([0, 5, 1 << 60], dtype=np.int64), 8),
            "eid": np.arange(24, dtype=np.int64),
            "v": np.ones(24),
        }
    )
    out = (
        keyed_window(
            ray.data.from_pandas(df), key="k", on="on", tie_cols=["eid"],
            value_col="v", outputs=("trail_count",), trail_window=10,
            num_parts=2,
        )
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    # windows: on=0 -> 1; on=5 -> 2 (0 and 5); on=2^60 -> 1
    want = np.tile([1, 2, 1], 8)
    assert out["trail_count"].tolist() == list(want)

    # span + W past int64 itself: M must stay a Python int until the
    # branch is chosen (an np.int64 cast of span+W+1 would raise
    # OverflowError instead of routing to the per-segment fallback)
    df2 = pd.DataFrame(
        {
            "k": np.zeros(2, dtype=np.int64),
            "on": np.array([0, (1 << 63) - 2], dtype=np.int64),
            "eid": np.arange(2, dtype=np.int64),
            "v": np.ones(2),
        }
    )
    out2 = (
        keyed_window(
            ray.data.from_pandas(df2), key="k", on="on", tie_cols=["eid"],
            value_col="v", outputs=("trail_count",), trail_window=10,
            num_parts=1,
        )
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    assert out2["trail_count"].tolist() == [1, 1]


def test_window_trailing_validation(ray_session):
    import ray.data

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "on": [1], "v": [0.0]})
    )
    with pytest.raises(ValueError, match="trail_window"):
        keyed_window(ds, key="k", on="on", value_col="v",
                     outputs=("trail_sum",))
    with pytest.raises(ValueError, match="value_col"):
        keyed_window(ds, key="k", on="on", outputs=("trail_sum",),
                     trail_window=5)


# ---------------------------------------------------------------------------
# hypothesis property sweeps (bounded: each example runs the full op
# through Ray)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 60),
    keys=st.integers(1, 6),
    span=st.integers(1, 40),  # tiny span -> heavy on-ties
)
def test_window_property_vs_brute(ray_session, seed, n, keys, span):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n).astype(np.int64),
            "on": rng.integers(0, span, n).astype(np.int64),
            "eid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        }
    )
    got = _run(df, num_parts=3)
    want = _brute(df)
    for c in ["row_number", "lag_on", "lag_valid", "lead_on",
              "lead_valid", "gap", "run_sum_v", "run_min_v", "run_max_v"]:
        np.testing.assert_allclose(
            got[c].to_numpy(), want[c].to_numpy(), rtol=0, atol=1e-12,
            err_msg=c,
        )


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 50),
    keys=st.integers(1, 5),
    span=st.integers(1, 30),
    w=st.integers(0, 35),
)
def test_window_trailing_property_vs_brute(ray_session, seed, n, keys, span, w):
    import ray.data

    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n).astype(np.int64),
            "on": rng.integers(0, span, n).astype(np.int64),
            "eid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        }
    )
    out = (
        keyed_window(
            ray.data.from_pandas(df), key="k", on="on", tie_cols=["eid"],
            value_col="v",
            outputs=("trail_count", "trail_sum", "trail_min", "trail_max"),
            trail_window=w, num_parts=3,
        )
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    cnt, sm, mn, mx = _brute_trailing(df, w)
    assert out["trail_count"].tolist() == cnt
    np.testing.assert_allclose(out["trail_sum_v"].to_numpy(), sm, atol=1e-9)
    np.testing.assert_allclose(out["trail_min_v"].to_numpy(), mn, atol=0)
    np.testing.assert_allclose(out["trail_max_v"].to_numpy(), mx, atol=0)


def test_window_nan_value_rejected(ray_session):
    """Non-null NaN ranks differently in numpy (last) vs SQL DESC
    (first) — keyed_window rejects it like a null."""
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.window import keyed_window

    ds = ray.data.from_arrow(
        pa.table({"k": [1, 1, 2], "ts": [1, 2, 3], "v": [1.0, float("nan"), 2.0]})
    )
    with pytest.raises(Exception, match="NaN"):
        keyed_window(ds, key="k", on="ts", value_col="v").to_pandas()
