"""Distributed keyed as-of join — a custom operator Ray Data lacks.

Semantics (analog: pandas.merge_asof / DuckDB ASOF JOIN): for every
left row (key, t), pick the single right row with the same key whose
ordering value is nearest at-or-before t (direction='backward'; also
'forward' = nearest at-or-after, 'nearest' = closest either way),
optionally only within `tolerance`. LEFT-join semantics: unmatched
left rows emit nulls for the right-side columns.

Distribution: both sides are hash-partitioned by key in ONE
sort-shuffle — a side-tagged, schema-aligned union feeds a single
grouped_map — so each partition holds every row of its keys and the
match is local and vectorized (one pd.merge_asof over the whole
partition with `by=key`; Python dispatch per partition, not per key).
Several (direction, tolerance) variants of the SAME join resolve in
that one shuffle (`asof_join_multi`): the partition sorts each side
once and runs one cheap local merge per spec — N variants cost one
exchange, not N.
PARTITIONING ASSUMPTION (north_rule): all rows of one key fit in a
worker's heap — the same contract as every grouped_map in this repo;
pre-aggregate or salt upstream if a single key is hot.

int64 exactness: pd.merge_asof is only ever handed (key, _on, row
position); the float64 NaN-padding it applies to unmatched rows
therefore touches only positions (< 2^53 by construction), never
payload values or microsecond timestamps (~2^60, NOT float64-exact).
Payloads are gathered afterwards with arrow `take` on null-masked
indices, so matched values and their dtypes survive bit-exact and
unmatched rows become arrow nulls (schema-stable across all-matched /
none-matched partitions).

Determinism: equal (key, on) right rows are reduced to ONE before the
join — the LAST under a stable sort by (on, *tie_cols) — because
merge_asof's positional tie rule is direction-dependent. Pass tie_cols
(an id column, or a value column to keep its per-(key,on) max) or
pre-dedupe right to unique (key, on) — otherwise the winner depends on
block arrival order.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.grouped import grouped_map

_DIRECTIONS = ("backward", "forward", "nearest")


def _on_to_int64(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Ordering column -> int64 (timestamps become epoch micros).
    Nulls are rejected: a null ordering value would NaN-float the
    int64 `_on` numpy column inside merge_asof (silent micro-timestamp
    rounding / MergeError with no hint that a null ts is the cause)."""
    if col.null_count:
        raise ValueError(
            "asof/window ordering column contains nulls — filter or "
            "fill them upstream (a null has no position in the order)"
        )
    if pa.types.is_timestamp(col.type):
        if col.type.unit != "us":
            col = col.cast(pa.timestamp("us"))
    elif not pa.types.is_integer(col.type):
        raise TypeError(
            f"asof `on` column must be integer or timestamp, got {col.type}"
        )
    return col.cast(pa.int64())


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key: str,
    on: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
    tie_cols: list[str] | None = None,
    num_parts: int | None = None,
    r_on: str = "r_on",
) -> ray.data.Dataset:
    """-> left's columns (with `on` as int64; micros for timestamps)
    + `r_on` (matched right `on`, nullable int64) + `right_cols`
    (nullable). One shuffle; see module docstring for the contract."""
    return asof_join_multi(
        left,
        right,
        key=key,
        on=on,
        right_cols=right_cols,
        specs=[
            {"direction": direction, "tolerance": tolerance, "r_on": r_on}
        ],
        tie_cols=tie_cols,
        num_parts=num_parts,
    )


def asof_join_multi(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key: str,
    on: str,
    right_cols: list[str],
    specs: list[dict],
    tie_cols: list[str] | None = None,
    num_parts: int | None = None,
    finalize: Callable[[pa.Table], pa.Table] | None = None,
) -> ray.data.Dataset:
    """Resolve several as-of variants of the same (left, right, key,
    on) in ONE shuffle. Each spec is {"direction", "tolerance",
    "r_on", "right_cols"?}: the output carries, per spec, its matched
    right `on` under the spec's `r_on` name plus the spec's
    `right_cols` (default: the top-level `right_cols`), named `c` for
    the first spec and `c__{r_on}` for later ones so names stay
    unique. `finalize`, when given, runs per PARTITION on
    the joined arrow table (whole keys — the grouped_map contract), so
    keyed rollups of the join fuse into the same exchange."""
    for s in specs:
        if s.get("direction", "backward") not in _DIRECTIONS:
            raise ValueError(f"direction must be one of {_DIRECTIONS}")
        tol = s.get("tolerance")
        if tol is not None and tol < 0:
            raise ValueError("tolerance must be >= 0")
    if len({s.get("r_on", "r_on") for s in specs}) != len(specs):
        raise ValueError("specs' r_on names must be distinct")
    tie_cols = [c for c in (tie_cols or []) if c != on]

    ls, rs = left.schema(), right.schema()
    lpa = pa.schema(list(zip(ls.names, ls.types)))
    rpa = pa.schema(list(zip(rs.names, rs.types)))
    left_out = list(lpa.names)  # emitted in input order
    lpay = [n for n in left_out if n not in (key, on)]

    # per-spec gathered right columns and their output names
    spec_rcols: list[list[tuple[str, str]]] = []  # [(src, out_name)]
    out_rnames: list[str] = []
    for i, s in enumerate(specs):
        r_on_name = s.get("r_on", "r_on")
        cols = s.get("right_cols", right_cols)
        named = [
            (c, c if i == 0 else f"{c}__{r_on_name}") for c in cols
        ]
        spec_rcols.append(named)
        out_rnames.append(r_on_name)
        out_rnames.extend(n for _, n in named)
    if len(set(out_rnames)) != len(out_rnames):
        raise ValueError(f"colliding output right-column names: {out_rnames}")

    rpay = list(
        dict.fromkeys(
            [c for named in spec_rcols for c, _ in named] + tie_cols
        )
    )
    missing = [c for c in rpay if c not in rpa.names]
    if missing:
        raise KeyError(f"right_cols/tie_cols not in right schema: {missing}")
    # EVERY gathered right column (including tie_cols) rides the
    # union under its own name — a name shared with a left column or
    # the key would silently null-pad the left side's copy in
    # tag_left, corrupting left payloads
    clash = (set(out_rnames) | set(rpay)) & set(left_out)
    if clash:
        raise ValueError(
            f"right column names collide with left's: {sorted(clash)}"
            " — rename before joining"
        )
    if lpa.field(key).type != rpa.field(key).type:
        raise TypeError(
            f"key dtype mismatch: left {lpa.field(key).type} vs "
            f"right {rpa.field(key).type} (the union must be schema-aligned)"
        )

    def _rtype(c: str) -> pa.DataType:
        return rpa.field(c).type

    def _check_key(t: pa.Table):
        if t[key].null_count:
            raise ValueError(
                f"asof key column {key!r} contains nulls — a null key "
                "has no partition; filter or fill upstream"
            )

    # ---- side-tagged, schema-aligned union (key, _on, _side, payloads)
    def tag_left(t: pa.Table) -> pa.Table:
        n = len(t)
        _check_key(t)
        cols = {
            key: t[key],
            "_on": _on_to_int64(t[on].combine_chunks()),
            "_side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for c in lpay:
            cols[c] = t[c]
        for c in rpay:
            cols[c] = pa.nulls(n, _rtype(c))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        _check_key(t)
        cols = {
            key: t[key],
            "_on": _on_to_int64(t[on].combine_chunks()),
            "_side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for c in lpay:
            cols[c] = pa.nulls(n, lpa.field(c).type)
        for c in rpay:
            cols[c] = t[c]
        return pa.table(cols)

    u = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def _join_schema() -> list[tuple[str, pa.DataType]]:
        out = []
        for c in left_out:
            out.append((c, pa.int64() if c == on else lpa.field(c).type))
        for i, s in enumerate(specs):
            out.append((s.get("r_on", "r_on"), pa.int64()))
            for src, name in spec_rcols[i]:
                out.append((name, _rtype(src)))
        return out

    def _emit(tb: pa.Table) -> pa.Table:
        return finalize(tb) if finalize is not None else tb

    def _empty_out() -> pa.Table:
        cols = {n: pa.nulls(0, t) for n, t in _join_schema()}
        return _emit(pa.table(cols))

    def per_part(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["_side"].to_numpy(zero_copy_only=False)
        l_tb = t.filter(pa.array(side == 1))
        nl = len(l_tb)
        if nl == 0:
            return _empty_out()
        r_tb = t.filter(pa.array(side == 0))

        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        for c in left_out:
            cols[c] = l_tb["_on" if c == on else c]

        if len(r_tb):
            # Stable (on, *tie) sort, then dedupe to ONE row per
            # (key, on) keeping the last = largest tie. merge_asof's
            # positional tie rule is direction-dependent (backward:
            # last among equal on; forward/nearest-forward: first;
            # nearest-backward: last), so equal (key, on) groups must
            # be reduced to a single winner BEFORE the join for the
            # documented contract to hold in every direction.
            rdf = pd.DataFrame(
                {"_on": r_tb["_on"].to_numpy()}
                | {c: r_tb[c].to_numpy(zero_copy_only=False) for c in tie_cols}
            )
            # na_position='first': a null tie value must LOSE the
            # (key, on) dedupe — SQL max() ignores NULLs, so the
            # largest non-null wins and all-null groups yield null
            order = rdf.sort_values(
                ["_on"] + tie_cols, kind="mergesort", na_position="first"
            ).index.to_numpy()
            r_tb = r_tb.take(pa.array(order))
            kdup = pd.DataFrame(
                {
                    key: r_tb[key].to_numpy(zero_copy_only=False),
                    "_on": r_tb["_on"].to_numpy(),
                }
            )
            keep = ~kdup.duplicated(subset=[key, "_on"], keep="last")
            if not keep.all():
                r_tb = r_tb.filter(pa.array(keep.to_numpy()))

            # sort each side ONCE; each spec is one local merge
            l2 = pd.DataFrame(
                {
                    key: l_tb[key].to_numpy(zero_copy_only=False),
                    "_on": l_tb["_on"].to_numpy(),
                    "_lidx": np.arange(nl, dtype=np.int64),
                }
            ).sort_values("_on", kind="mergesort")
            r2 = pd.DataFrame(
                {
                    key: r_tb[key].to_numpy(zero_copy_only=False),
                    "_on": r_tb["_on"].to_numpy(),
                    "_ridx": np.arange(len(r_tb), dtype=np.int64),
                }
            )
            r_on_arr = r_tb["_on"].combine_chunks()
            for i, s in enumerate(specs):
                m = pd.merge_asof(
                    l2,
                    r2,
                    on="_on",
                    by=key,
                    direction=s.get("direction", "backward"),
                    tolerance=s.get("tolerance"),
                    allow_exact_matches=True,
                )
                ridx_f = np.empty(nl, dtype=np.float64)
                ridx_f[m["_lidx"].to_numpy()] = m["_ridx"].to_numpy()
                ok = ~np.isnan(ridx_f)
                idx = pa.array(
                    np.where(ok, ridx_f, 0).astype(np.int64), mask=~ok
                )
                cols[s.get("r_on", "r_on")] = r_on_arr.take(idx)
                for src, name in spec_rcols[i]:
                    cols[name] = r_tb[src].combine_chunks().take(idx)
        else:
            for i, s in enumerate(specs):
                cols[s.get("r_on", "r_on")] = pa.nulls(nl, pa.int64())
                for src, name in spec_rcols[i]:
                    cols[name] = pa.nulls(nl, _rtype(src))
        names = [n for n, _ in _join_schema()]
        return _emit(pa.table({n: cols[n] for n in names}))

    return grouped_map(
        u, [key], per_part, num_parts=num_parts, batch_format="pyarrow"
    )
