"""Keyed ordered-window analytics — per-key row_number / lag / lead /
running aggregates, a window-function operator Ray Data lacks.

Semantics (analog: SQL `OVER (PARTITION BY key ORDER BY order)`): each
key's rows are totally ordered by (order, *tie_cols) and every row gets
its rank, the previous/next row's ordering value, and running
(cumulative, inclusive) aggregates of a value column. `tie_cols` must
make the sort total (an id column) — otherwise rank/lag between
tied rows depends on block arrival order, exactly like an
underspecified SQL ORDER BY.

Distribution: ONE hash shuffle by key (grouped_map) — each partition
holds every row of its keys, sorts once with a grouped lexsort, and
computes all requested windows with numpy segment operations (no
Python per key, no pandas shift). int64 exactness: lag/lead of the
ordering column and their gaps are pure int64 numpy arithmetic —
pandas' shift() would round micro-timestamps through float64 NaN
padding, so it is never used here.

PARTITIONING ASSUMPTION (north_rule): all rows of one key fit in a
worker's heap — the grouped_map contract; salt hot keys upstream.

Supported window columns (pick via `outputs`):
  row_number   1-based rank within key under (order, *tie_cols)
  lag_<on>     previous row's `on` (0 + lag_valid=0 on the first row)
  lead_<on>    next row's `on` (0 + lead_valid=0 on the last row)
  gap          on - lag_on (0 on the first row of a key)
  run_sum_<v>  inclusive running sum of value_col
  run_min_<v>  inclusive running min of value_col
  run_max_<v>  inclusive running max of value_col
  run_count    inclusive running count (== row_number; kept for SQL
               COUNT(*) OVER parity in mixed selections)
Unmatched/first-row slots are ZERO-filled with companion validity
flags instead of nulls, so every output column keeps its exact input
dtype (a nullable int64 micro-timestamp would float64-round through
pandas downstream).

Null/dtype contract: the computation columns (key, on, tie_cols,
value_col) must be null-free — nulls raise (a null has no window
position, and the numpy view would float64-degrade int64 values); a
timestamp `on` is emitted as epoch-micro int64 (the asof contract);
`keep_cols` may be nullable — they ride arrow `take` untouched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.grouped import grouped_map

_RUNS = ("sum", "min", "max")


def keyed_window(
    ds: ray.data.Dataset,
    *,
    key: str,
    on: str,
    tie_cols: list[str] | None = None,
    value_col: str | None = None,
    outputs: tuple[str, ...] = ("row_number", "lag", "gap", "run_sum"),
    keep_cols: list[str] | None = None,
    num_parts: int | None = None,
    trail_window: int | None = None,
) -> ray.data.Dataset:
    """-> (key, on, *tie_cols, *keep_cols, requested window columns).
    One shuffle; see module docstring for naming and zero-fill rules.

    Trailing RANGE-window aggregates (SQL `... OVER (PARTITION BY key
    ORDER BY on RANGE BETWEEN trail_window PRECEDING AND CURRENT
    ROW)`): outputs trail_count / trail_sum_<v> / trail_min_<v> /
    trail_max_<v> aggregate every row of the key whose `on` lies in
    [on_i - trail_window, on_i]. Each window start is one vectorized
    searchsorted (segments made globally monotonic by an
    overflow-checked per-segment offset) and every aggregate is one
    np.ufunc.reduceat over (start, end) index pairs — each window
    summed independently left-to-right (no prefix-difference
    cancellation), Python dispatch per partition, not per row/key.
    Peer semantics match SQL RANGE mode exactly: the frame ends at the
    LAST row whose `on` equals the current row's (all peers included,
    even ones after the current row in tie order), so trail outputs
    are value-determined — identical for tied rows and independent of
    tie order."""
    tie_cols = list(tie_cols or [])
    keep_cols = list(keep_cols or [])
    want = set(outputs)
    runs = {o for o in want if o.startswith("run_") and o != "run_count"}
    trails = {o for o in want if o.startswith("trail_")}
    bad = (
        want
        - {"row_number", "lag", "lead", "gap", "run_count", "trail_count"}
        - {f"run_{r}" for r in _RUNS}
        - {f"trail_{r}" for r in _RUNS}
    )
    if bad:
        raise ValueError(f"unknown window outputs: {sorted(bad)}")
    if runs and value_col is None:
        raise ValueError(f"outputs {sorted(runs)} need value_col")
    if (trails - {"trail_count"}) and value_col is None:
        raise ValueError(f"outputs {sorted(trails)} need value_col")
    if trails and trail_window is None:
        raise ValueError(f"outputs {sorted(trails)} need trail_window")
    if trail_window is not None and trail_window < 0:
        raise ValueError("trail_window must be >= 0")

    sort_cols = [key, on] + tie_cols
    carry = list(
        dict.fromkeys(
            sort_cols
            + ([value_col] if value_col else [])
            + keep_cols
        )
    )

    def per_part(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = len(t)
        # reject nulls in every computation column: a single null
        # turns the int64 numpy view into float64+NaN and silently
        # rounds micro-timestamps — the exact hazard this module's
        # docstring promises to prevent. (Nullable KEEP columns pass
        # through arrow untouched, so they stay exact.)
        for c in sort_cols + ([value_col] if value_col else []):
            if t[c].null_count:
                raise ValueError(
                    f"keyed_window column {c!r} contains nulls — "
                    "filter or fill upstream (nulls have no window "
                    "position and would float64-degrade int64 values)"
                )
        comp = sort_cols + ([value_col] if value_col else [])
        arrs = {c: t[c].to_numpy(zero_copy_only=False) for c in comp}
        # non-null NaN is the same hazard in float disguise: lexsort
        # places NaN last while SQL ORDER BY ... DESC places it first
        # (engines treat NaN as greater than every float), so a NaN in
        # a computation column would silently rank-diverge from any
        # SQL oracle — reject it with the same contract as nulls
        for c in comp:
            a = arrs[c]
            if a.dtype.kind == "f" and np.isnan(a).any():
                raise ValueError(
                    f"keyed_window column {c!r} contains NaN — filter "
                    "or fill upstream (NaN has no defined rank: numpy "
                    "sorts it last, SQL DESC sorts it first)"
                )
        # timestamp `on` -> epoch-micro int64 (the asof contract):
        # datetime64 lag zero-fill would read as 1970-01-01 and gaps
        # would come back duration-typed
        oc = t[on]
        if pa.types.is_timestamp(oc.type):
            arrs[on] = (
                oc.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            )
        # grouped total order: lexsort by (tie..., on, key) — numpy
        # lexsort keys go least-significant first
        order = np.lexsort(
            tuple(arrs[c] for c in reversed(sort_cols))
        )
        s = {c: arrs[c][order] for c in comp}
        k = s[key]
        first = np.empty(n, dtype=bool)
        if n:
            first[0] = True
            first[1:] = k[1:] != k[:-1]
        last = np.empty(n, dtype=bool)
        if n:
            last[-1] = True
            last[:-1] = first[1:]
        # segment starts, broadcast per row
        start_idx = np.nonzero(first)[0]
        seg_id = np.cumsum(first) - 1 if n else np.empty(0, dtype=np.int64)
        seg_start = start_idx[seg_id] if n else np.empty(0, dtype=np.int64)

        # computation columns emit the (possibly int64-normalized)
        # numpy views; every OTHER carried column rides arrow `take`,
        # so nullable keep columns keep their exact dtype and nulls
        oidx = pa.array(order)
        cols: dict = {
            c: s[c] if c in s else t[c].take(oidx) for c in carry
        }
        idx = np.arange(n, dtype=np.int64)
        rn = idx - seg_start + 1
        if "row_number" in want:
            cols["row_number"] = rn
        if "run_count" in want:
            cols["run_count"] = rn.copy()
        o = s[on]
        if "lag" in want or "gap" in want:
            lag = np.empty_like(o)
            if n:
                lag[1:] = o[:-1]
                lag[0] = 0
            lag[first] = 0
            if "lag" in want:
                cols[f"lag_{on}"] = lag
                cols["lag_valid"] = (~first).astype(np.int8)
            if "gap" in want:
                gap = o - lag
                gap[first] = 0
                cols["gap"] = gap
        if "lead" in want:
            lead = np.empty_like(o)
            if n:
                lead[:-1] = o[1:]
                lead[-1] = 0
            lead[last] = 0
            cols[f"lead_{on}"] = lead
            cols["lead_valid"] = (~last).astype(np.int8)
        if runs:
            # pandas' cython grouped cumulatives: C-vectorized,
            # per-segment LEFT-TO-RIGHT accumulation (the same
            # summation order a SQL running SUM implies), no Python
            # per key
            g = pd.Series(s[value_col]).groupby(seg_id)
            if "run_sum" in want:
                cols[f"run_sum_{value_col}"] = g.cumsum().to_numpy()
            if "run_min" in want:
                cols[f"run_min_{value_col}"] = g.cummin().to_numpy()
            if "run_max" in want:
                cols[f"run_max_{value_col}"] = g.cummax().to_numpy()
        if trails and n:
            o = s[on]
            W = np.int64(trail_window)
            base = o[seg_start]  # per-row segment first `on`
            rel = o - base
            spans = rel[np.append(start_idx[1:], n) - 1]  # per segment
            # M stays a Python int until the safe branch is chosen: a
            # span + W past int64 must route to the fallback, not
            # OverflowError inside the np.int64 cast
            M = int(spans.max()) + int(W) + 1
            if M * len(start_idx) < (1 << 62):
                om = rel + seg_id * np.int64(M)
                starts = np.searchsorted(om, om - W, side="left")
                ends = np.searchsorted(om, om, side="right")
            else:  # offset overflow (astronomical spans): per segment
                starts = np.empty(n, dtype=np.int64)
                ends = np.empty(n, dtype=np.int64)
                for st, en in zip(start_idx, np.append(start_idx[1:], n)):
                    seg = o[st:en]
                    starts[st:en] = st + np.searchsorted(seg, seg - W, "left")
                    ends[st:en] = st + np.searchsorted(seg, seg, "right")
            if "trail_count" in want:
                cols["trail_count"] = ends - starts
            tr_red = trails - {"trail_count"}
            if tr_red:
                v = s[value_col]
                # reduceat over interleaved (start, end) pairs: each
                # window aggregates independently left-to-right (even
                # outputs are the windows; odd outputs discarded).
                # Windows are never empty (they contain the row
                # itself), so the reduceat s==e quirk can't fire.
                pairs = np.empty(2 * n, dtype=np.int64)
                pairs[0::2] = starts
                pairs[1::2] = ends
                # reduceat requires the LAST index < len(v); ends can
                # be n — append a sentinel and slice it off
                vx = np.append(v, v[:1])
                for red, ufunc in (
                    ("sum", np.add),
                    ("min", np.minimum),
                    ("max", np.maximum),
                ):
                    if f"trail_{red}" not in tr_red:
                        continue
                    out_all = ufunc.reduceat(vx, pairs)
                    cols[f"trail_{red}_{value_col}"] = out_all[0::2]
        return pa.table(
            {
                c: v if isinstance(v, (pa.Array, pa.ChunkedArray)) else pa.array(v)
                for c, v in cols.items()
            }
        )

    return grouped_map(
        ds, [key], per_part, num_parts=num_parts, batch_format="pyarrow"
    )
