"""Exact substring-overlap dedup (U4 family extension): find document
pairs sharing an exact run of >= `window` consecutive tokens, and
report the longest shared run per pair — the distributed restatement
of suffix-array "exact substring" training-data dedup (cf. the
dedup literature in PAPERS.md: ExactSubstr removes any 50-token span
appearing twice; the reference repo has no text ops — this operator
belongs to the LLM-pipeline tier the engine adds beyond it).

Shape (all Ray-Data-native, two grouped exchanges, no all-pairs):

1. map_batches: tokenize (str.split), emit one row per token window —
   (h = hash64(gram), gram, doc_id, pos). O(total tokens) rows, the
   same asymptotics a suffix array pays; `anchor_every` (winnowing)
   is the sub-linear scale knob below.
2. groupby(h): within a hash partition, sub-group by the gram STRING
   (so 64-bit hash collisions cannot fabricate pairs — exactness is
   by string equality, not hash equality, in the SAME exchange: both
   rows are already co-partitioned). Per gram, emit every cross-doc
   position pair (id_a < id_b, pa, pb). Buckets stay O(dup-cluster):
   a bucket is the set of docs containing one exact `window`-token
   phrase. A boilerplate phrase shared by > max_bucket docs is
   REFUSED loudly (raise) — silent truncation would report "covered
   everything" while dropping pairs.
3. groupby(id_a, id_b): per pair, matches on the same diagonal
   (pa - pb) at consecutive pa form one maximal shared run; the
   longest common token-run is max(run length) + window - 1. One
   lexsort + run-length reduceat per partition, no per-pair Python.

Winnowing (`anchor_every` = K > 1): instead of every window, emit
only the minimum-hash window of each K-consecutive-window stretch
(rightmost tie — the MOSS/winnowing rule). Guarantee: any shared run
of >= window + K - 1 tokens shares >= 1 anchor, so detection is
exact above that length with ~1/K the shuffle volume; runs shorter
than that may be missed, and reported n_windows/max_run become lower
bounds. The oracle-checked query runs K = 1 (fully exact).

Output: (doc_a, doc_b, n_windows, max_run_tokens), one row per
unordered pair, where n_windows counts matching (position_a,
position_b) window pairs and max_run_tokens is the longest exact
common substring in tokens (>= window).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..kernels import text as T
from ..stages.grouped import grouped_map


def _window_rows(
    t: pa.Table, text_col: str, id_col: str, window: int, anchor_every: int
) -> pa.Table:
    """(h, gram, doc_id, pos) rows for every (or every winnowed)
    token window in the batch."""
    texts = t[text_col].to_pylist()
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    grams: list[str] = []
    doc_rep: list[np.ndarray] = []
    pos_rep: list[np.ndarray] = []
    for i, s in enumerate(texts):
        words = s.split()
        nw = len(words) - window + 1
        if nw <= 0:
            continue
        g = [" ".join(words[j : j + window]) for j in range(nw)]
        grams.extend(g)
        doc_rep.append(np.full(nw, ids[i], dtype=np.int64))
        pos_rep.append(np.arange(nw, dtype=np.int64))
    if not grams:
        return pa.table(
            {
                "h": pa.array([], pa.int64()),
                "gram": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            }
        )
    hs = T.stable_hash64_array(grams).astype(np.int64)
    doc = np.concatenate(doc_rep)
    pos = np.concatenate(pos_rep)
    if anchor_every > 1:
        # winnowing: per doc, keep the min-hash window of every
        # K-consecutive stretch (rightmost minimum — the MOSS rule);
        # any shared run of >= window + K - 1 tokens keeps >= 1 anchor
        # on both sides. Sliding min over intra-doc windows, vectorized
        # per batch via a (nwin, K) strided view.
        K = anchor_every
        keep_idx: list[np.ndarray] = []
        # doc boundaries in the flat arrays (docs were appended in order)
        bounds = np.flatnonzero(np.diff(doc)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(doc)]))
        u = hs.astype(np.uint64)  # unsigned compare = hash-order rule
        for s0, e0 in zip(starts, ends):
            n = e0 - s0
            if n <= K:
                keep_idx.append(np.array([s0 + int(np.flatnonzero(u[s0:e0] == u[s0:e0].min())[-1])]))
                continue
            sw = np.lib.stride_tricks.sliding_window_view(u[s0:e0], K)
            # rightmost min: argmax over reversed comparison
            rev = sw[:, ::-1]
            am = K - 1 - rev.argmin(axis=1)
            sel = np.unique(np.arange(n - K + 1) + am) + s0
            keep_idx.append(sel)
        ki = np.concatenate(keep_idx)
        hs, doc, pos = hs[ki], doc[ki], pos[ki]
        grams = [grams[j] for j in ki]
    return pa.table(
        {
            "h": pa.array(hs, pa.int64()),
            "gram": pa.array(grams, pa.string()),
            "doc_id": pa.array(doc, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
        }
    )


def substring_overlap_pairs(
    docs: ray.data.Dataset,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    anchor_every: int = 1,
    max_bucket: int = 10_000,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """See module docstring. -> (doc_a, doc_b, n_windows,
    max_run_tokens), exact for anchor_every=1; for K>1 exact above
    run length window + K - 1 (lower bounds below it)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if anchor_every < 1:
        raise ValueError("anchor_every must be >= 1")

    exploded = docs.map_batches(
        lambda t: _window_rows(t, text_col, id_col, window, anchor_every),
        batch_format="pyarrow",
    )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Per hash partition: sub-group by the gram STRING, emit
        cross-doc position pairs. The loop is over grams shared by
        >= 2 docs only (rare); everything else is one lexsort."""
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ("id_a", "id_b", "pa", "pb")}
            )
        codes, _ = pd.factorize(df["gram"].to_numpy(), sort=False)
        doc = df["doc_id"].to_numpy()
        pos = df["pos"].to_numpy()
        order = np.lexsort((pos, doc, codes))
        c_s, d_s, p_s = codes[order], doc[order], pos[order]
        starts = np.flatnonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))
        ends = np.concatenate((starts[1:], [len(c_s)]))
        # grams worth pairing: >= 2 rows AND >= 2 distinct docs
        out_a, out_b, out_pa, out_pb = [], [], [], []
        for s0, e0 in zip(starts, ends):
            m = e0 - s0
            if m < 2 or d_s[s0] == d_s[e0 - 1]:  # doc-sorted: one doc only
                continue
            if m > max_bucket:
                raise ValueError(
                    f"substring_overlap_pairs: one {window}-token phrase "
                    f"appears in {m} rows (> max_bucket={max_bucket}) — a "
                    "boilerplate phrase this hot needs a bigger max_bucket "
                    "or winnowing; refusing to silently drop pairs"
                )
            dd = d_s[s0:e0]
            pp = p_s[s0:e0]
            ii, jj = np.triu_indices(m, k=1)
            diff = dd[ii] != dd[jj]
            ii, jj = ii[diff], jj[diff]
            swap = dd[ii] > dd[jj]
            ia = np.where(swap, jj, ii)
            ib = np.where(swap, ii, jj)
            out_a.append(dd[ia])
            out_b.append(dd[ib])
            out_pa.append(pp[ia])
            out_pb.append(pp[ib])
        if not out_a:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ("id_a", "id_b", "pa", "pb")}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "pa": np.concatenate(out_pa),
                "pb": np.concatenate(out_pb),
            }
        )

    cand = grouped_map(exploded, ["h"], pairs_in_bucket, num_parts=num_parts)

    def runs_per_pair(df: pd.DataFrame) -> pd.DataFrame:
        """Per pair partition: diagonal gaps-and-islands, fully
        vectorized — one lexsort, run breaks where (pair, diag)
        changes or pa is non-consecutive, reduceat run lengths."""
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=np.int64),
                    "doc_b": pd.Series(dtype=np.int64),
                    "n_windows": pd.Series(dtype=np.int64),
                    "max_run_tokens": pd.Series(dtype=np.int64),
                }
            )
        a = df["id_a"].to_numpy()
        b = df["id_b"].to_numpy()
        paa = df["pa"].to_numpy()
        pbb = df["pb"].to_numpy()
        diag = paa - pbb
        order = np.lexsort((paa, diag, b, a))
        a_s, b_s, pa_s, dg_s = a[order], b[order], paa[order], diag[order]
        n = len(a_s)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            samepair = (a_s[1:] == a_s[:-1]) & (b_s[1:] == b_s[:-1])
            brk[1:] = ~(
                samepair & (dg_s[1:] == dg_s[:-1]) & (pa_s[1:] == pa_s[:-1] + 1)
            )
        rstarts = np.flatnonzero(brk)
        rlen = np.diff(np.append(rstarts, n))
        ra, rb = a_s[rstarts], b_s[rstarts]
        agg = (
            pd.DataFrame({"doc_a": ra, "doc_b": rb, "rl": rlen})
            .groupby(["doc_a", "doc_b"], sort=False)
            .agg(n_windows=("rl", "sum"), max_run=("rl", "max"))
            .reset_index()
        )
        agg["max_run_tokens"] = agg.pop("max_run") + np.int64(window - 1)
        return agg[["doc_a", "doc_b", "n_windows", "max_run_tokens"]]

    return grouped_map(cand, ["id_a", "id_b"], runs_per_pair, num_parts=num_parts)
