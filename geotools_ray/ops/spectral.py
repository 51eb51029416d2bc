"""J5 spectral extraction, J6 raster pair diff (A14 per-class stats),
and the generic tile-zip join they share.

zip_tiles co-partitions two tile Datasets by (trow, tcol) — the
tile-aligned equi-join of src/spectral.cpp:97-197 (index pixel ids ⋈
band pixels by coordinate) and src/rasterstats.cpp:188-245 (pairwise
aligned diff).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.grouped import grouped_map
from .raster import group_slices, list_col_views

NODATA = -9999.0


def zip_tiles(a: ray.data.Dataset, b: ray.data.Dataset, fn, num_parts=None,
              empty: pd.DataFrame | None = None) -> ray.data.Dataset:
    """fn(trow, tcol, grid_a, grid_b) -> DataFrame rows; grids are the
    two sides' tile arrays (nodata-filled when a side lacks a tile)."""

    def tag(side):
        def t_(t: pa.Table) -> pa.Table:
            return t.append_column("side", pa.array([side] * len(t)))
        return t_

    both = a.map_batches(tag("a"), batch_format="pyarrow").union(
        b.map_batches(tag("b"), batch_format="pyarrow")
    )

    def per_tile(t: pa.Table) -> pd.DataFrame:
        views = list_col_views(t["data"])
        trs = t["trow"].to_numpy(zero_copy_only=False)
        tcs = t["tcol"].to_numpy(zero_copy_only=False)
        hs = t["h"].to_numpy(zero_copy_only=False)
        ws = t["w"].to_numpy(zero_copy_only=False)
        sides = t["side"].to_numpy(zero_copy_only=False)
        order, slices = group_slices(trs, tcs)
        out = []
        for s, e in slices:
            g = order[s:e]
            ga = gb = None
            h = w = None
            for i in g:
                h, w = int(hs[i]), int(ws[i])
                arr = views[i].reshape(h, w)
                if sides[i] == "a":
                    ga = arr
                else:
                    gb = arr
            if ga is None:
                ga = np.full((h, w), NODATA)
            if gb is None:
                gb = np.full((h, w), NODATA)
            res = fn(int(trs[g[0]]), int(tcs[g[0]]), ga, gb)
            if res is not None and len(res):
                out.append(res)
        if out:
            return pd.concat(out)
        # schema-stable empty: a columnless frame breaks downstream
        # grouped_map key hashing / schema merges
        return empty.iloc[0:0].copy() if empty is not None else pd.DataFrame()

    return grouped_map(both, ["trow", "tcol"], per_tile, num_parts=num_parts,
                       batch_format="pyarrow")


def spectral_extract(
    index_tiles: ray.data.Dataset,
    band_tiles: ray.data.Dataset,
    tile: int,
    res: float = 1.0,
    minx: float = 0.0,
    miny: float = 0.0,
    num_parts=None,
) -> ray.data.Dataset:
    """J5: for every pixel with a non-nodata id in the index raster,
    emit (id, x, y, dn) with the band raster's value at the same
    pixel (src/spectral.cpp:97-197)."""

    def fn(tr, tc, idx, band):
        rs, cs = np.nonzero(idx != NODATA)
        if not len(rs):
            return None
        gr = tr * tile + rs
        gc = tc * tile + cs
        return pd.DataFrame(
            {
                "id": idx[rs, cs].astype(np.int64),
                "x": gc * res + minx + res / 2.0,
                "y": gr * res + miny + res / 2.0,
                "dn": band[rs, cs],
            }
        )

    empty = pd.DataFrame({"id": pd.Series(dtype=np.int64),
                          "x": pd.Series(dtype=np.float64),
                          "y": pd.Series(dtype=np.float64),
                          "dn": pd.Series(dtype=np.float64)})
    return zip_tiles(index_tiles, band_tiles, fn, num_parts=num_parts,
                     empty=empty)


def spectral_extract_cotiled(
    tiles: ray.data.Dataset,
    idx_col: str,
    band_col: str,
    tile: int,
    res: float = 1.0,
    minx: float = 0.0,
    miny: float = 0.0,
) -> ray.data.Dataset:
    """spectral_extract over ONE co-tiled dataset (both rasters in the
    same row via tiles_multi_from_cellstats) — a narrow map, no zip
    shuffle."""

    def fn(t: pa.Table) -> pd.DataFrame:
        idx_views = list_col_views(t["data_" + idx_col])
        band_views = list_col_views(t["data_" + band_col])
        trs = t["trow"].to_numpy(zero_copy_only=False)
        tcs = t["tcol"].to_numpy(zero_copy_only=False)
        hs = t["h"].to_numpy(zero_copy_only=False)
        ws = t["w"].to_numpy(zero_copy_only=False)
        out = []
        for i in range(len(t)):
            h, w = int(hs[i]), int(ws[i])
            idx = idx_views[i].reshape(h, w)
            band = band_views[i].reshape(h, w)
            rs, cs = np.nonzero(idx != NODATA)
            if not len(rs):
                continue
            gr = int(trs[i]) * tile + rs
            gc = int(tcs[i]) * tile + cs
            out.append(
                pd.DataFrame(
                    {
                        "id": idx[rs, cs].astype(np.int64),
                        "x": gc * res + minx + res / 2.0,
                        "y": gr * res + miny + res / 2.0,
                        "dn": band[rs, cs],
                    }
                )
            )
        return (
            pd.concat(out)
            if out
            else pd.DataFrame({"id": pd.Series(dtype=np.int64),
                               "x": pd.Series(dtype=np.float64),
                               "y": pd.Series(dtype=np.float64),
                               "dn": pd.Series(dtype=np.float64)})
        )

    return tiles.map_batches(fn, batch_format="pyarrow")


def zip3_tiles(a, b, c, fn, num_parts=None,
               empty: pd.DataFrame | None = None) -> ray.data.Dataset:
    """Three-way tile co-partition in ONE grouped shuffle;
    fn(trow, tcol, ga, gb, gc) -> DataFrame rows."""

    def tag(side):
        def t_(t: pa.Table) -> pa.Table:
            return t.append_column("side", pa.array([side] * len(t)))
        return t_

    allt = (
        a.map_batches(tag("a"), batch_format="pyarrow")
        .union(b.map_batches(tag("b"), batch_format="pyarrow"))
        .union(c.map_batches(tag("c"), batch_format="pyarrow"))
    )

    def per_tile(t: pa.Table) -> pd.DataFrame:
        views = list_col_views(t["data"])
        trs = t["trow"].to_numpy(zero_copy_only=False)
        tcs = t["tcol"].to_numpy(zero_copy_only=False)
        hs = t["h"].to_numpy(zero_copy_only=False)
        ws = t["w"].to_numpy(zero_copy_only=False)
        sides = t["side"].to_numpy(zero_copy_only=False)
        order, slices = group_slices(trs, tcs)
        out = []
        for s, e in slices:
            g = order[s:e]
            grids = {}
            h = w = None
            for i in g:
                h, w = int(hs[i]), int(ws[i])
                grids[sides[i]] = views[i].reshape(h, w)
            ga = grids.get("a", np.full((h, w), NODATA))
            gb = grids.get("b", np.full((h, w), NODATA))
            gc = grids.get("c", np.full((h, w), NODATA))
            res = fn(int(trs[g[0]]), int(tcs[g[0]]), ga, gb, gc)
            if res is not None and len(res):
                out.append(res)
        if out:
            return pd.concat(out)
        # schema-stable empty: a columnless frame breaks downstream
        # grouped_map key hashing / schema merges
        return empty.iloc[0:0].copy() if empty is not None else pd.DataFrame()

    return grouped_map(allt, ["trow", "tcol"], per_tile, num_parts=num_parts,
                       batch_format="pyarrow")


def raster_pair_diff_stats(
    a_tiles: ray.data.Dataset,
    b_tiles: ray.data.Dataset,
    class_tiles: ray.data.Dataset,
    num_parts=None,
) -> ray.data.Dataset:
    """J6/A14: per-pixel diff (a - b) where both valid, grouped by the
    class raster's value; partial (count, sum, sumsq, min, max) per
    tile then a tiny final merge -> exact per-class stats
    (src/rasterstats.cpp:172-267). All three tile sets co-partition in
    ONE grouped shuffle."""

    def stat_fn(tr, tc, ga, gb, cls):
        return _diff_stats_partial(ga, gb, cls)

    empty = pd.DataFrame({"cls": pd.Series(dtype=np.int64),
                          "pn": pd.Series(dtype=np.int64),
                          "ps": pd.Series(dtype=np.float64),
                          "pss": pd.Series(dtype=np.float64),
                          "pmn": pd.Series(dtype=np.float64),
                          "pmx": pd.Series(dtype=np.float64)})
    partials = zip3_tiles(a_tiles, b_tiles, class_tiles, stat_fn,
                          num_parts=num_parts, empty=empty)
    return grouped_map(partials, ["cls"], _diff_stats_final, num_parts=8)


def raster_diff_stats_cotiled(
    tiles: ray.data.Dataset, a_col: str, b_col: str, cls_col: str
) -> ray.data.Dataset:
    """Same math as raster_pair_diff_stats, but over ONE co-tiled
    dataset from tiles_multi_from_cellstats (data_<col> columns are
    already co-located — zero extra shuffles before the tiny final)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        a_views = list_col_views(t["data_" + a_col])
        b_views = list_col_views(t["data_" + b_col])
        c_views = list_col_views(t["data_" + cls_col])
        hs = t["h"].to_numpy(zero_copy_only=False)
        ws = t["w"].to_numpy(zero_copy_only=False)
        frames = []
        for i in range(len(t)):
            h, w = int(hs[i]), int(ws[i])
            ga = a_views[i].reshape(h, w)
            gb = b_views[i].reshape(h, w)
            cls = c_views[i].reshape(h, w)
            res = _diff_stats_partial(ga, gb, cls)
            if res is not None:
                frames.append(res)
        return (
            pd.concat(frames)
            if frames
            else pd.DataFrame({"cls": pd.Series(dtype=np.int64),
                               "pn": pd.Series(dtype=np.int64),
                               "ps": pd.Series(dtype=np.float64),
                               "pss": pd.Series(dtype=np.float64),
                               "pmn": pd.Series(dtype=np.float64),
                               "pmx": pd.Series(dtype=np.float64)})
        )

    partials = tiles.map_batches(partial, batch_format="pyarrow")
    return grouped_map(partials, ["cls"], _diff_stats_final, num_parts=8)


def _diff_stats_partial(ga, gb, cls):
    # validity comes from the INPUT masks only (reference skips when
    # either pixel is nodata, src/rasterstats.cpp:233-234) — routing
    # the diff through a NODATA sentinel would silently drop a pixel
    # whose legitimate diff equals exactly -9999.0
    ok = (ga != NODATA) & (gb != NODATA) & (cls != NODATA)
    if not ok.any():
        return None
    vals = (ga - gb)[ok]
    cl = cls[ok].astype(np.int64)
    uniq, inv = np.unique(cl, return_inverse=True)
    n = np.bincount(inv)
    s = np.bincount(inv, weights=vals)
    ss = np.bincount(inv, weights=vals * vals)
    mn = np.full(len(uniq), np.inf)
    np.minimum.at(mn, inv, vals)
    mx = np.full(len(uniq), -np.inf)
    np.maximum.at(mx, inv, vals)
    return pd.DataFrame({"cls": uniq, "pn": n, "ps": s, "pss": ss, "pmn": mn, "pmx": mx})


def _diff_stats_final(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for cls, g in df.groupby("cls", sort=False):
        n = int(g["pn"].sum())
        s = float(g["ps"].sum())
        ss = float(g["pss"].sum())
        mean = s / n
        var = max(ss - n * mean * mean, 0.0) / n
        rows.append(
            {
                "cls": int(cls),
                "n": n,
                "mean_diff": mean,
                "stddev_diff": float(np.sqrt(var)),
                "min_diff": float(g["pmn"].min()),
                "max_diff": float(g["pmx"].max()),
            }
        )
    return pd.DataFrame(rows, columns=["cls", "n", "mean_diff", "stddev_diff", "min_diff", "max_diff"])
