"""R8 mosaic-graph diff correction — the Ray Data restatement of
scripts/raster_diff_correction.py (reference :19-120 compute_stats,
:158-191 build_chains, :196-232 driver):

1. pairwise overlap diff stats: instead of R^2 full-raster scans, ALL
   rasters' tiles carry a raster id and co-locate by tile key in ONE
   grouped shuffle; each partition computes the per-pair partial
   (sum, count) over valid-both pixels, a tiny rollup finishes the
   means.
2. the dependency graph walk runs on the driver over the per-pair
   stats table (a few rows per raster pair), reproducing the
   reference's greedy max-count-edge chains bug-for-bug: edges go
   from the later-sorted raster to the earlier one only, each step
   follows ONLY the highest-count outgoing edge, the root and
   dead-end nodes yield no output row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.grouped import grouped_map

NODATA = -9999.0


def pairwise_diff_stats(
    tagged_tiles: ray.data.Dataset, num_parts: int | None = None
) -> pd.DataFrame:
    """tagged_tiles: (rid, trow, tcol, h, w, data). -> DataFrame
    (i, j, sum, count, mean) for every raster pair i < j with valid
    overlap, diff = raster_i - raster_j (compute_stats :40-96)."""

    from .raster import group_slices, list_col_views

    def per_tile(t: pa.Table) -> pd.DataFrame:
        views = list_col_views(t["data"])
        trs = t["trow"].to_numpy(zero_copy_only=False)
        tcs = t["tcol"].to_numpy(zero_copy_only=False)
        rids_all = t["rid"].to_numpy(zero_copy_only=False)
        hs = t["h"].to_numpy(zero_copy_only=False)
        ws = t["w"].to_numpy(zero_copy_only=False)
        order, slices = group_slices(trs, tcs)
        out = {"i": [], "j": [], "psum": [], "pcnt": []}
        for s, e in slices:
            g = order[s:e]
            g = g[np.argsort(rids_all[g], kind="stable")]
            rids = rids_all[g]
            grids = [views[i].reshape(int(hs[i]), int(ws[i])) for i in g]
            for a in range(len(rids)):
                for b in range(a + 1, len(rids)):
                    ok = (grids[a] != NODATA) & (grids[b] != NODATA)
                    if not ok.any():
                        continue
                    d = grids[a][ok] - grids[b][ok]
                    out["i"].append(int(rids[a]))
                    out["j"].append(int(rids[b]))
                    out["psum"].append(float(d.sum()))
                    out["pcnt"].append(int(ok.sum()))
        return pd.DataFrame(out)

    partials = grouped_map(
        tagged_tiles, ["trow", "tcol"], per_tile, num_parts=num_parts,
        batch_format="pyarrow",
    ).to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["i", "j", "sum", "count", "mean"])
    agg = (
        partials.groupby(["i", "j"], sort=True)
        .agg(sum=("psum", "sum"), count=("pcnt", "sum"))
        .reset_index()
    )
    agg = agg[agg["count"] > 0]
    agg["mean"] = agg["sum"] / agg["count"]
    return agg


def build_chains(pairs: pd.DataFrame, root: int) -> pd.DataFrame:
    """Greedy max-count chains to `root` (build_chains + find_node,
    reference :158-191 / :144-155). -> (rid, shift) for every raster
    that reaches the root; the root itself and dead ends emit nothing
    (the reference skips empty chains)."""
    outgoing: dict[int, list] = {}
    for _, r in pairs.iterrows():
        # edge from the later-sorted raster j to the earlier i with
        # mean = +mean(v_i - v_j) (reference adds only e2 to outgoing)
        outgoing.setdefault(int(r["j"]), []).append(
            (int(r["count"]), int(r["i"]), float(r["mean"]))
        )
    rows = []
    nodes = sorted(set(pairs["i"]) | set(pairs["j"]))
    for n in nodes:
        chain_mean = 0.0
        cur = n
        start = None
        ok = False
        visited = set()
        while True:
            edges = outgoing.get(cur)
            if not edges or cur in visited:
                break
            visited.add(cur)
            cnt, nxt, mean = max(edges, key=lambda e: (e[0], -e[1]))
            if start is None:
                start = cur
            chain_mean += mean
            if nxt == root:
                ok = True
                break
            cur = nxt
        if ok and start is not None:
            rows.append({"rid": start, "shift": chain_mean})
    return pd.DataFrame(rows, columns=["rid", "shift"])


def raster_diff_correction(
    tagged_tiles: ray.data.Dataset, root: int, num_parts: int | None = None
) -> pd.DataFrame:
    """-> (rid, shift): the z-shift the reference would feed las2las
    for each raster's point file (driver :216-232)."""
    pairs = pairwise_diff_stats(tagged_tiles, num_parts=num_parts)
    return build_chains(pairs, root)
