"""Range join (J4) and kNN lookup (J9).

Range join — `lasvalidate`'s sample-radius join (reference
src/lasvalidate.cpp:296-316: every point joins every survey sample
within radius d). The sample side is small -> broadcast via ray.put;
each map_batches task computes a (batch x samples) distance matrix and
emits the pairs. For a LARGE right side, use the cell-prefilter
variant (ops/celljoin.py).

kNN — `Interpolators.cpp:330-345` KD-tree knnSearch restated
distributed: each batch computes its local top-k candidates per query
(np.argpartition on the distance matrix), then a tiny
groupby(query).map_groups merges candidates into the global top-k.
The shuffle moves O(#queries x k x #blocks) candidate rows, never the
point cloud.

All comparisons and orderings use SQUARED distance (dx*dx + dy*dy):
the operands derive from exact integer arithmetic, so the engine and
the SQL oracle compute bit-identical doubles and rank ties break
deterministically on (d2, *point_cols).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def range_join(
    points: ray.data.Dataset,
    samples: pa.Table,
    radius: float,
    point_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    sample_key: str = "s_suppkey",
    sx: str = "sx",
    sy: str = "sy",
) -> ray.data.Dataset:
    """-> (point_cols..., sample_key, dist) for every pair with
    d2 <= radius^2."""
    # broadcast the samples SORTED BY sx so each point slab can prune
    # the sample side to an x-window via searchsorted
    s_order = np.argsort(samples[sx].to_numpy(zero_copy_only=False), kind="stable")
    ref = ray.put(
        {
            "sx": samples[sx].to_numpy(zero_copy_only=False)[s_order],
            "sy": samples[sy].to_numpy(zero_copy_only=False)[s_order],
            "key": samples[sample_key].to_numpy(zero_copy_only=False)[s_order],
        }
    )
    r2 = radius * radius

    def fn(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        n = len(x)
        # sort the batch by x so each slab spans a narrow x-range and
        # only the samples inside [slab_min - r, slab_max + r] are
        # compared — the distance work drops by the window fraction
        # (row order is irrelevant: every consumer sorts or groups)
        order = np.argsort(x, kind="stable")
        xs, ys = x[order], y[order]
        pcs, scs = 2048, 256
        out_pi, out_sj, out_d2 = [], [], []
        for p0 in range(0, n, pcs):
            xc = xs[p0 : p0 + pcs]
            yc = ys[p0 : p0 + pcs]
            j0 = int(np.searchsorted(s["sx"], xc[0] - radius, side="left"))
            j1 = int(np.searchsorted(s["sx"], xc[-1] + radius, side="right"))
            for s0 in range(j0, j1, scs):
                s1 = min(s0 + scs, j1)
                dx = xc[:, None] - s["sx"][None, s0:s1]
                dy = yc[:, None] - s["sy"][None, s0:s1]
                d2 = dx * dx + dy * dy
                pi, sj = np.nonzero(d2 <= r2)
                out_pi.append(pi + p0)
                out_sj.append(sj + s0)
                out_d2.append(d2[pi, sj])
        if out_pi:
            pi = order[np.concatenate(out_pi)]
            sj = np.concatenate(out_sj)
            d = np.sqrt(np.concatenate(out_d2))
        else:
            pi = np.empty(0, dtype=np.int64)
            sj = np.empty(0, dtype=np.int64)
            d = np.empty(0)
        cols = {c: t[c].to_numpy(zero_copy_only=False)[pi] for c in point_cols}
        cols[sample_key] = s["key"][sj]
        cols["dist"] = d
        return pa.table(cols)

    return points.map_batches(fn, batch_format="pyarrow")


def knn_join(
    points: ray.data.Dataset,
    queries: pa.Table,
    k: int,
    point_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    query_key: str = "s_suppkey",
    qx: str = "sx",
    qy: str = "sy",
) -> ray.data.Dataset:
    """-> (query_key, rank 1..k, point_cols..., dist): the k nearest
    points per query, ranked by (d2, *point_cols)."""
    ref = ray.put(
        {
            "qx": queries[qx].to_numpy(zero_copy_only=False),
            "qy": queries[qy].to_numpy(zero_copy_only=False),
            "key": queries[query_key].to_numpy(zero_copy_only=False),
        }
    )
    tiebreak = list(point_cols)

    def local_topk(t: pa.Table) -> pa.Table:
        """Emit a SUPERSET of each query's batch-local top-k (all points
        with d2 <= the k-th smallest, ties included) — the merge stage
        does the exact sort/trim, so no per-query python loop is needed
        here: argpartition runs vectorized across query columns."""
        q = ray.get(ref)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        n = len(x)
        kk = min(k, n)
        tb = {c: t[c].to_numpy(zero_copy_only=False) for c in point_cols}
        out_cols: dict[str, list] = {c: [] for c in (query_key, "d2", *point_cols)}
        qcs = 256  # query-column chunk: d2 slab stays ~ n x 256 doubles
        for q0 in range(0, len(q["key"]), qcs):
            qx_ = q["qx"][None, q0 : q0 + qcs]
            qy_ = q["qy"][None, q0 : q0 + qcs]
            dx = x[:, None] - qx_
            dy = y[:, None] - qy_
            d2 = dx * dx + dy * dy
            if kk < n:
                part = np.partition(d2, kk - 1, axis=0)
                dmax = part[kk - 1, :]  # k-th smallest per query
            else:
                dmax = d2.max(axis=0) if n else np.zeros(d2.shape[1])
            pi, qj = np.nonzero(d2 <= dmax[None, :])
            out_cols[query_key].append(q["key"][q0 + qj])
            out_cols["d2"].append(d2[pi, qj])
            for c in point_cols:
                out_cols[c].append(tb[c][pi])
        return pa.table({c: np.concatenate(v) for c, v in out_cols.items()})

    candidates = points.map_batches(local_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["d2", *tiebreak]).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["dist"] = np.sqrt(g["d2"].to_numpy())
        return g.drop(columns=["d2"])

    return candidates.groupby(query_key).map_groups(merge, batch_format="pandas")
