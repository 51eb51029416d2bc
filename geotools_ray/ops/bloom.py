"""Bloom-filter-pruned exact semi/anti equi-join.

The missing general-purpose shuffle-volume reducer for keyed joins at
cluster scale: a distributed key-set membership sketch whose size is
FIXED (num_bits/8 bytes, independent of build-side cardinality), built
in one streaming pass with a two-level OR-merge (the HLL pattern from
ops/sketch.py — bytes moved O(batches x num_bits/8), never a `unique`
shuffle), broadcast once via ray.put and probed zero-copy per batch.

Exactness contract: the bloom NEVER gives a false negative, so

- semi join: bloom-True rows are a superset of the true matches; one
  exact hash-partitioned verify join over that superset removes the
  false positives. Every dropped row is provably non-matching.
- anti join: bloom-False rows are provably non-matching and bypass the
  exchange entirely (at a selective build side this is most of the
  probe side); only bloom-True rows pay the exact verify.

This composes with the repo's existing exact-distinct broadcast
prefilter (ops/neighbors.py range join): that one is exact but its
broadcast grows with build-side cardinality; the bloom is the bounded
fallback when the distinct key set itself no longer fits a broadcast.

The reference has no equi-join tier (its joins are spatial); this is
part of the engine's LLM-data-pipeline surface, like ops/sketch.py.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.grouped import grouped_map, hash_columns
from .sketch import _finalize64

_H2_SALT = np.uint64(0x94D049BB133111EB)


def _bloom_indices(h: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: idx_i = h1 + i*h2 mod
    num_bits, h2 forced odd so the stride is coprime with the
    power-of-two bit count (Kirsch & Mitzenmacher 2006)."""
    h1 = _finalize64(h)
    with np.errstate(over="ignore"):
        h2 = _finalize64(h ^ _H2_SALT) | np.uint64(1)
        steps = np.arange(k, dtype=np.uint64)
        idx = h1[:, None] + steps[None, :] * h2[:, None]
    return idx % np.uint64(num_bits)


def _set_bits(idx: np.ndarray, num_bits: int) -> np.ndarray:
    """uint64 word array with every idx bit set — sort + reduceat OR
    per word run (ufunc.at is orders slower at batch size)."""
    words = np.zeros(num_bits >> 6, dtype=np.uint64)
    flat = idx.ravel()
    if not len(flat):
        return words
    w = (flat >> np.uint64(6)).astype(np.int64)
    b = (np.uint64(1) << (flat & np.uint64(63))).astype(np.uint64)
    order = np.argsort(w, kind="stable")
    w = w[order]
    b = b[order]
    starts = np.flatnonzero(np.concatenate([[True], w[1:] != w[:-1]]))
    words[w[starts]] = np.bitwise_or.reduceat(b, starts)
    return words


def _reject_null_keys(t: pa.Table, keys: list[str], side: str) -> None:
    """Null join keys diverge from SQL IN/NOT IN semantics (SQL drops
    null probes; NOT IN returns nothing when the build side holds a
    NULL) and hash_columns would float-cast them to an undefined
    uint64 — reject loudly, same contract as the asof/window/interval
    ops."""
    for c in keys:
        if t[c].null_count:
            raise ValueError(
                f"bloom join: null values in {side} key column {c!r} — "
                "filter or fill them upstream (SQL IN/NOT IN drops "
                "null keys; this op refuses to guess)"
            )


def _probe(words: np.ndarray, h: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    """Boolean membership mask: all k bits set."""
    if not len(h):
        return np.zeros(0, dtype=bool)
    idx = _bloom_indices(h, num_bits, k)
    w = words[(idx >> np.uint64(6)).astype(np.int64)]
    hit = (w >> (idx & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1)


def bloom_build(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    num_bits: int = 1 << 23,
    k: int = 4,
    merge_parts: int = 16,
) -> np.ndarray:
    """Build the filter over `keys` of ds in one streaming pass: each
    batch reduces to ONE (group, words) row, partials OR-merge in
    <= merge_parts grouped tasks (associative — the grouping key is a
    content hash), the driver folds the survivors. False-positive rate
    ~ (1 - e^{-k n / num_bits})^k; num_bits/8 bytes regardless of n."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")

    def partial(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"g": pa.array([], pa.int64()),
                             "words": pa.array([], pa.binary())})
        _reject_null_keys(t, keys, "build-side")
        idx = _bloom_indices(hash_columns(t, keys), num_bits, k)
        b = _set_bits(idx, num_bits).tobytes()
        return pa.table({"g": pa.array([zlib.crc32(b) % merge_parts], pa.int64()),
                         "words": pa.array([b], pa.binary())})

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros(num_bits >> 6, dtype=np.uint64)
        for b in t["words"].to_pylist():
            acc |= np.frombuffer(b, dtype=np.uint64)
        g = t["g"][0].as_py() if len(t) else 0
        return pa.table({"g": pa.array([g], pa.int64()),
                         "words": pa.array([acc.tobytes()], pa.binary())})

    rows = grouped_map(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["g"], merge, num_parts=merge_parts, batch_format="pyarrow",
    ).take_all()
    acc = np.zeros(num_bits >> 6, dtype=np.uint64)
    for row in rows:
        acc |= np.frombuffer(row["words"], dtype=np.uint64)
    return acc


def bloom_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    keys: list[str],
    *,
    anti: bool = False,
    num_bits: int = 1 << 23,
    k: int = 4,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """EXACT semi (or anti) equi-join of `left` against the distinct
    `keys` of `right`, with the bloom as a pure prune — output is
    identical for ANY (num_bits, k), only the pruned volume changes.

    semi: bloom-True left rows (true matches + FP rate of the rest)
    enter ONE hash-partitioned verify join against the right keys;
    everything bloom-False was provably non-matching.
    anti: bloom-False rows are emitted WITHOUT touching the exchange;
    bloom-True rows verify exactly and the non-matching survivors join
    them. Both sides of the verify carry only keys + the left payload.
    """
    words = bloom_build(right, keys, num_bits=num_bits, k=k)
    ref = ray.put(words)
    # pyarrow identity map first: a pandas-block dataset reports
    # pandas dtypes (`object`) in .schema(), which can't type the
    # null padding below — after this the schema is arrow-typed
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    ls = left.schema()
    lpa = pa.schema(list(zip(ls.names, ls.types)))
    left_cols = list(lpa.names)
    if "_side" in left_cols:
        raise ValueError("left may not carry a _side column")

    def split(t: pa.Table, want_member: bool) -> pa.Table:
        _reject_null_keys(t, keys, "probe-side")
        mask = _probe(ray.get(ref), hash_columns(t, keys), num_bits, k)
        return t.filter(pa.array(mask if want_member else ~mask))

    candidates = left.map_batches(
        lambda t: split(t, True), batch_format="pyarrow"
    )

    # exact verify: side-tagged union, one grouped shuffle, pandas
    # merge per partition (C-vectorized, multi-column keys supported)
    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column("_side", pa.array(np.zeros(len(t), np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        # pre-dedupe per batch (the verify only needs key presence) —
        # arrow group_by keeps key types exact, no pandas round-trip
        t = t.select(keys).group_by(keys).aggregate([])
        out = {
            c: t[c] if c in keys else pa.nulls(len(t), lpa.field(c).type)
            for c in left_cols  # left's column order — union wants it
        }
        out["_side"] = pa.array(np.ones(len(t), np.int8))
        return pa.table(out)

    tagged = candidates.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def verify(t: pa.Table) -> pa.Table:
        """Payload stays in Arrow end-to-end: only the KEY columns
        round-trip through pandas for the C merge, so null-padded
        right rows can never float64-degrade int payload columns."""
        side = t["_side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(left_cols)
        ldf = lt.select(keys).to_pandas()
        rdf = (
            t.filter(pa.array(side == 1)).select(keys)
            .to_pandas().drop_duplicates()
        )
        # how='left' preserves left order and (rdf deduped) multiplicity
        merged = ldf.merge(rdf, on=keys, how="left", indicator=True)
        keep = (merged["_merge"] == ("left_only" if anti else "both")).to_numpy()
        return lt.filter(pa.array(keep))

    verified = grouped_map(
        tagged, keys, verify, num_parts=num_parts, batch_format="pyarrow"
    )
    if not anti:
        return verified
    passthrough = left.map_batches(
        lambda t: split(t, False), batch_format="pyarrow"
    )
    return passthrough.union(verified)
