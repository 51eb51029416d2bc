"""interval_join (ops/interval.py) vs a straight-line brute-force
oracle: exactly-once pair emission across bucket/broadcast tiers,
partition- and width-invariance, closed-interval edge semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geotools_ray.ops.interval import interval_join


def _mk(rng, n, pref, span_hi, key_n=None, axis=100_000):
    s = rng.integers(0, axis, n)
    e = s + rng.integers(0, span_hi, n)
    d = {
        f"{pref}id": np.arange(n, dtype=np.int64),
        f"{pref}s": s,
        f"{pref}e": e,
    }
    if key_n:
        d["k"] = rng.integers(0, key_n, n)
    return d


def _brute(L, R, keyed=False):
    out = set()
    ls, le, rs, re = L["ls"], L["le"], R["rs"], R["re"]
    for i in range(len(ls)):
        hit = (ls[i] <= re) & (rs <= le[i])
        if keyed:
            hit &= R["k"] == L["k"][i]
        for j in np.flatnonzero(hit):
            out.add((int(L["lid"][i]), int(R["rid"][j])))
    return out


def _run(L, R, **kw):
    lds = ray.data.from_arrow(pa.table(L))
    rds = ray.data.from_arrow(pa.table(R))
    return interval_join(
        lds, rds,
        l_start="ls", l_end="le", r_start="rs", r_end="re",
        l_cols=["lid", "ls", "le"], r_cols=["rid", "rs", "re"],
        **kw,
    ).to_pandas()


@pytest.mark.parametrize(
    "key_n,width,lsb,parts",
    [
        (None, 1000, 64, 7),    # plain bucketed path
        (None, 97, 3, 5),       # heavy replication + both long tiers
        (5, 1000, 64, 7),       # keyed bucketed
        (5, 50, 1, 3),          # keyed, long tier dominates
        (None, 10**7, 64, 7),   # one global bucket
    ],
)
def test_bruteforce_parity(ray_session, key_n, width, lsb, parts):
    rng = np.random.default_rng(7)
    L = _mk(rng, 300, "l", 8000, key_n)
    R = _mk(rng, 250, "r", 12000, key_n)
    res = _run(
        L, R, key="k" if key_n else None, bucket_width=width,
        long_span_buckets=lsb, num_parts=parts,
    )
    got = list(zip(res["lid"], res["rid"]))
    exp = _brute(L, R, keyed=bool(key_n))
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert set(got) == exp
    # overlap window is the closed intersection
    assert (res["ov_start"].to_numpy()
            == np.maximum(res["ls"], res["rs"])).all()
    assert (res["ov_end"].to_numpy()
            == np.minimum(res["le"], res["re"])).all()
    assert (res["ov_start"] <= res["ov_end"]).all()


def test_width_invariance(ray_session):
    """The pair set is invariant to bucket_width / num_parts /
    long_span_buckets — only the execution shape changes."""
    rng = np.random.default_rng(11)
    L = _mk(rng, 200, "l", 20_000)
    R = _mk(rng, 200, "r", 20_000)
    base = None
    for width, lsb, parts in [(500, 4, 3), (5000, 64, 9), (1, 200_000, 5)]:
        res = _run(L, R, bucket_width=width, long_span_buckets=lsb,
                   num_parts=parts, long_limit=500)
        pairs = sorted(zip(res["lid"], res["rid"]))
        if base is None:
            base = pairs
        else:
            assert pairs == base


def test_touching_endpoints_closed(ray_session):
    """l_end == r_start (and the reverse) count — closed intervals."""
    L = {"lid": np.array([0, 1]), "ls": np.array([0, 100]),
         "le": np.array([10, 200])}
    R = {"rid": np.array([0, 1]), "rs": np.array([10, 201]),
         "re": np.array([20, 300])}
    res = _run(L, R, bucket_width=7)
    assert set(zip(res["lid"], res["rid"])) == {(0, 0)}
    assert res["ov_start"].iloc[0] == 10 and res["ov_end"].iloc[0] == 10


def test_empty_sides_schema_stable(ray_session):
    L = {"lid": np.array([], dtype=np.int64),
         "ls": np.array([], dtype=np.int64),
         "le": np.array([], dtype=np.int64)}
    R = {"rid": np.array([0]), "rs": np.array([5]), "re": np.array([9])}
    ds = interval_join(
        ray.data.from_arrow(pa.table(L)), ray.data.from_arrow(pa.table(R)),
        l_start="ls", l_end="le", r_start="rs", r_end="re",
        l_cols=["lid", "ls", "le"], r_cols=["rid", "rs", "re"],
        bucket_width=10,
    )
    # typed empty blocks: schema survives even with zero rows (ray's
    # to_pandas drops it on all-empty datasets, so assert on schema())
    sch = ds.schema()
    assert ds.count() == 0
    assert sch.names == ["lid", "ls", "le", "rid", "rs", "re",
                         "ov_start", "ov_end"]
    assert all(t == pa.int64() for t in sch.types)


def test_long_limit_loud(ray_session):
    rng = np.random.default_rng(3)
    L = _mk(rng, 50, "l", 90_000)  # nearly everything spans > 1 bucket
    R = _mk(rng, 10, "r", 100)
    with pytest.raises(ValueError, match="long_limit"):
        _run(L, R, bucket_width=10, long_span_buckets=1, long_limit=5)


def test_start_after_end_raises(ray_session):
    L = {"lid": np.array([0]), "ls": np.array([10]), "le": np.array([5])}
    R = {"rid": np.array([0]), "rs": np.array([0]), "re": np.array([9])}
    with pytest.raises(Exception, match="start > end"):
        _run(L, R, bucket_width=10)


def test_timestamp_inputs_normalize(ray_session):
    ts = pa.array(
        np.array([0, 5_000_000, 9_000_000], dtype="datetime64[us]"))
    L = pa.table({"lid": pa.array([0, 1, 2]), "ls": ts, "le": ts})
    R = pa.table({"rid": pa.array([0]),
                  "rs": pa.array([4_000_000]),
                  "re": pa.array([6_000_000])})
    res = interval_join(
        ray.data.from_arrow(L), ray.data.from_arrow(R),
        l_start="ls", l_end="le", r_start="rs", r_end="re",
        l_cols=["lid", "ls"], r_cols=["rid"], bucket_width=1_000_000,
    ).to_pandas()
    assert set(res["lid"]) == {1}
    assert res["ls"].iloc[0] == 5_000_000  # rode as epoch-micro int64


def test_derived_width(ray_session):
    """bucket_width=None derives from global bounds and still matches."""
    rng = np.random.default_rng(23)
    L = _mk(rng, 150, "l", 5000)
    R = _mk(rng, 150, "r", 5000)
    res = _run(L, R, num_parts=5)
    assert set(zip(res["lid"], res["rid"])) == _brute(L, R)


def test_name_collision_rejected(ray_session):
    L = {"lid": np.array([0]), "ls": np.array([0]), "le": np.array([1])}
    R = {"rid": np.array([0]), "rs": np.array([0]), "re": np.array([1])}
    lds = ray.data.from_arrow(pa.table(L))
    rds = ray.data.from_arrow(pa.table(R))
    with pytest.raises(ValueError, match="share names"):
        interval_join(lds, rds, l_start="ls", l_end="le",
                      r_start="rs", r_end="re",
                      l_cols=["lid"], r_cols=["lid"], bucket_width=10)


# ---------------------------------------------------------------------------
# interval_flatten (per-key gaps-and-islands union)


def _brute_flatten(k, s, e, gap):
    rows = sorted(zip(k, s, e))
    out = []
    for kk, ss, ee in rows:
        if out and out[-1][0] == kk and ss <= out[-1][2] + gap:
            out[-1][2] = max(out[-1][2], ee)
            out[-1][3] += 1
        else:
            out.append([kk, ss, ee, 1])
    return sorted((a, b, c, d) for a, b, c, d in out)


@pytest.mark.parametrize("gap,parts", [(0, 3), (50, 7), (10_000, 2)])
def test_flatten_bruteforce_parity(ray_session, gap, parts):
    from geotools_ray.ops.interval import interval_flatten

    rng = np.random.default_rng(5)
    n = 600
    k = rng.integers(0, 12, n)
    s = rng.integers(0, 50_000, n)
    e = s + rng.integers(0, 800, n)
    ds = ray.data.from_arrow(
        pa.table({"k": k, "s": s, "e": e})).repartition(5)
    res = interval_flatten(
        ds, key="k", start="s", end="e", gap=gap, num_parts=parts
    ).to_pandas()
    got = sorted(zip(res["k"], res["ivl_start"], res["ivl_end"],
                     res["n_merged"]))
    assert [tuple(map(int, r)) for r in got] == _brute_flatten(k, s, e, gap)


def test_flatten_touching_merge_and_contained(ray_session):
    from geotools_ray.ops.interval import interval_flatten

    # touching at a point merges (closed); a contained interval must
    # not split the island even when a short one follows a long one
    tb = pa.table({
        "k": pa.array([1, 1, 1, 1], pa.int64()),
        "s": pa.array([0, 10, 12, 40], pa.int64()),
        "e": pa.array([10, 30, 15, 50], pa.int64()),
    })
    res = interval_flatten(
        ray.data.from_arrow(tb), key="k", start="s", end="e",
        num_parts=2).to_pandas().sort_values("ivl_start")
    assert list(map(tuple, res[["ivl_start", "ivl_end", "n_merged"]]
                    .itertuples(index=False))) == [(0, 30, 3), (40, 50, 1)]


def test_flatten_validation(ray_session):
    from geotools_ray.ops.interval import interval_flatten

    tb = pa.table({"k": pa.array([1]), "s": pa.array([5]),
                   "e": pa.array([1])})
    with pytest.raises(Exception, match="start > end"):
        interval_flatten(ray.data.from_arrow(tb), key="k", start="s",
                         end="e").to_pandas()
    with pytest.raises(ValueError, match="gap"):
        interval_flatten(ray.data.from_arrow(tb), key="k", start="s",
                         end="e", gap=-1)


def test_interval_flatten_extreme_int64_span(ray_session):
    """A key whose coordinates span more than 2^63 (island ending near
    -2^62, next start near +2^62) must BREAK, not silently merge: the
    break test runs gated-uint64 subtraction, exact over the full
    int64 domain."""
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.interval import interval_flatten

    lo, hi = -(2**62), 2**62
    ds = ray.data.from_arrow(
        pa.table({
            "k": pa.array([7, 7], pa.int64()),
            "s": pa.array([lo, hi], pa.int64()),
            "e": pa.array([lo + 10, hi + 10], pa.int64()),
        })
    )
    out = interval_flatten(ds, key="k", start="s", end="e", gap=5).to_pandas()
    assert len(out) == 2  # raw int64 subtraction would wrap and merge
    assert sorted(out["ivl_start"]) == [lo, hi]
