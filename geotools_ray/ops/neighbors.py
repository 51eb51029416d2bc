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
        eps = np.finfo(np.float64).eps
        for p0 in range(0, n, pcs):
            xc = xs[p0 : p0 + pcs]
            yc = ys[p0 : p0 + pcs]
            # widen the window by a few ulps of the LARGEST magnitude
            # involved: a sample exactly on the radius boundary can sit
            # BELOW fl(x - radius) yet still satisfy fl(x-sx)^2 == r2
            # (e.g. x=4.2, sx=0.2, r=4: 4.2-4.0 > 0.2 but 4.2-0.2 == 4.0
            # exactly) — candidates are re-tested with the exact d2
            # criterion, so over-inclusion only costs a few comparisons
            slack = 4.0 * eps * max(abs(float(xc[0])), abs(float(xc[-1])), radius, 1.0)
            j0 = int(np.searchsorted(s["sx"], xc[0] - radius - slack, side="left"))
            j1 = int(np.searchsorted(s["sx"], xc[-1] + radius + slack, side="right"))
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
    # queries sorted by qx so a chunk of consecutive queries spans a
    # narrow x-range and can prune the point side to an x-window
    q_order = np.argsort(queries[qx].to_numpy(zero_copy_only=False), kind="stable")
    ref = ray.put(
        {
            "qx": queries[qx].to_numpy(zero_copy_only=False)[q_order],
            "qy": queries[qy].to_numpy(zero_copy_only=False)[q_order],
            "key": queries[query_key].to_numpy(zero_copy_only=False)[q_order],
        }
    )
    tiebreak = list(point_cols)

    def local_topk(t: pa.Table) -> pa.Table:
        """Emit a SUPERSET of each query's batch-local top-k (all points
        with d2 <= the k-th smallest, ties included) — the merge stage
        does the exact sort/trim, so no per-query python loop is needed
        here.  Pruning: a subsample's k-th-nearest distance upper-bounds
        the true k-th-nearest, so points outside the query chunk's
        x-window by more than that bound can never make the top-k."""
        q = ray.get(ref)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        n = len(x)
        kk = min(k, n)
        out_cols: dict[str, list] = {c: [] for c in (query_key, "d2", *point_cols)}
        p_order = np.argsort(x, kind="stable")
        xs, ys = x[p_order], y[p_order]
        # every 8th point of the x-sorted batch: spatially uniform
        # subsample whose per-query k-th distance bounds the window
        sub = slice(None, None, 8)
        xsub, ysub = xs[sub], ys[sub]
        use_bound = len(xsub) >= kk and n > 4 * k
        qcs = 64 if use_bound else 256
        tb_src = {c: t[c].to_numpy(zero_copy_only=False)[p_order] for c in point_cols}
        for q0 in range(0, len(q["key"]), qcs):
            qx_ = q["qx"][q0 : q0 + qcs]
            qy_ = q["qy"][q0 : q0 + qcs]
            if use_bound:
                ds = (xsub[:, None] - qx_[None, :]) ** 2 + (ysub[:, None] - qy_[None, :]) ** 2
                bound = np.partition(ds, kk - 1, axis=0)[kk - 1, :]
                r = float(np.sqrt(bound.max()))
                j0 = int(np.searchsorted(xs, qx_.min() - r, side="left"))
                j1 = int(np.searchsorted(xs, qx_.max() + r, side="right"))
            else:
                j0, j1 = 0, n
            xc, yc = xs[j0:j1], ys[j0:j1]
            m = j1 - j0
            if m == 0:
                continue
            dx = xc[:, None] - qx_[None, :]
            dy = yc[:, None] - qy_[None, :]
            d2 = dx * dx + dy * dy
            if kk < m:
                dmax = np.partition(d2, kk - 1, axis=0)[kk - 1, :]
            else:
                dmax = d2.max(axis=0)
            pi, qj = np.nonzero(d2 <= dmax[None, :])
            out_cols[query_key].append(q["key"][q0 + qj])
            out_cols["d2"].append(d2[pi, qj])
            for c in point_cols:
                out_cols[c].append(tb_src[c][j0 + pi])
        def _empty_dtype(c: str):
            # derive from the sources so all-pruned batches emit blocks
            # schema-compatible with non-empty ones (float keys/cols)
            if c == "d2":
                return np.float64
            if c == query_key:
                return q["key"].dtype
            return tb_src[c].dtype

        return pa.table(
            {
                c: np.concatenate(v) if v else np.empty(0, dtype=_empty_dtype(c))
                for c, v in out_cols.items()
            }
        )

    candidates = points.map_batches(local_topk, batch_format="pyarrow")

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([query_key, "d2", *tiebreak])
        df = df.groupby(query_key, sort=False).head(k).copy()
        df["rank"] = df.groupby(query_key, sort=False).cumcount().to_numpy() + 1
        df["dist"] = np.sqrt(df["d2"].to_numpy())
        return df.drop(columns=["d2"]).reset_index(drop=True)

    from ..stages.grouped import grouped_map

    return grouped_map(candidates, [query_key], merge_part)
