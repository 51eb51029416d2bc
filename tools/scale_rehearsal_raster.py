"""Raster-family data-scale rehearsal (VERDICT r03 #5): grow the
raster H x W 10x / 100x at FIXED CPUs over the four heavy tile
pipelines — flood_basins, spill_points, mosaic, raster_correction —
and verify the tile designs hold:

  * wall time grows ~linearly in pixel count (the tile loops and the
    one grouped assembly shuffle are O(pixels); super-linear growth
    flags a per-tile dispatch or partition blowup),
  * nothing driver-side scales with the GRID — the only collected
    state is per-label stats / boundary label pairs (flood), spill
    pairs, per-tile checksums (mosaic), and the raster-pair diff
    stats (correction), all O(labels or tiles), never O(pixels).

Input is synthesized DISTRIBUTED (ray.data.range -> map_batches
terrain), deterministic per cell_id regardless of partitioning, so
the 100x grid never exists as a driver array either.  Terrain is a
periodic sin/cos basin field + hash noise: component count and
boundary-crossing rate stay proportional to area, the worst
realistic shape for the label-merge union.

Usage: python tools/scale_rehearsal_raster.py [--scales 1,10,100]
Writes one JSON line per (op, scale) to stdout, prefixed REHEARSAL.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

BASE_H = 512  # 1x = 262k cells (~ the sf0.1 raster family's order)
TILE = 16
ELEV = -15.0  # ~25% of the terrain below -> many cross-tile basins
NODATA = -9999.0


def _noise01(cid: np.ndarray) -> np.ndarray:
    """Deterministic per-cell uniform [0,1) from the cell id (same
    mix as stages.grouped._mix64) — partition-invariant."""
    h = cid.astype(np.uint64)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def cellstats_ds(H: int, W: int):
    """Distributed synthetic cell-stat table: (cell_id, mean, ocount,
    m0..m3). mean = periodic basin terrain + noise; ~6% of cells are
    dropped entirely (nodata fill exercise); m1..m3 are shifted copies
    with disjoint nodata thirds (the correction-graph shape)."""
    import ray.data

    total = H * W
    blocks = max(16, min(256, total // 65536))

    def terrain(t: pa.Table) -> pa.Table:
        cid = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = _noise01(cid)
        keep = u > 0.06
        cid = cid[keep]
        u = u[keep]
        r = (cid // W).astype(np.float64)
        c = (cid % W).astype(np.float64)
        mean = (
            30.0 * np.sin(c / 37.0) * np.cos(r / 29.0)
            + 8.0 * np.sin((c + 2.0 * r) / 61.0)
            + 3.0 * (u - 0.5)
        )
        third = W // 3
        col = cid % W
        m1 = np.where(col >= 2 * third, NODATA, mean + 0.5)
        m2 = np.where(col < third, NODATA, mean - 0.3)
        m3 = np.where((cid // W) % 7 == 0, NODATA, mean + 1.1)
        ocount = np.where(col < W // 2, 1.0 + np.floor(u * 5.0), NODATA)
        return pa.table(
            {
                "cell_id": cid,
                "mean": mean,
                "ocount": ocount,
                "m0": mean,
                "m1": m1,
                "m2": m2,
                "m3": m3,
            }
        )

    return ray.data.range(total, override_num_blocks=blocks).map_batches(
        terrain, batch_format="pyarrow"
    )


def run_flood_basins(stats, H, W):
    from geotools_ray.ops.raster import flood_basins_tiles, tiles_from_cellstats

    tiles = tiles_from_cellstats(stats, "mean", W, H, TILE, dense=True)
    df = flood_basins_tiles(tiles, [ELEV], H, W, TILE)
    return {"basins": int(len(df)), "area": int(df["area"].sum())}


def run_spill_points(stats, H, W):
    from geotools_ray.ops.raster import (
        flood_label_tiles,
        spill_points_tiles,
        tiles_from_cellstats,
    )

    tiles = tiles_from_cellstats(stats, "mean", W, H, TILE, dense=True)
    labels = flood_label_tiles(tiles, ELEV, H, W, TILE)
    if getattr(labels, "_gt_n_basins", None) == 0:
        return {"pairs": 0}
    sp = spill_points_tiles(labels, 4.0, H, W, TILE)
    return {"pairs": int(sp.count())}


def run_mosaic(stats, H, W):
    from geotools_ray.ops.raster import mosaic_tiles, tiles_multi_from_cellstats

    mt = tiles_multi_from_cellstats(
        stats, ["mean", "ocount"], W, H, TILE, dense=True
    ).materialize()

    def pick(col):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {"trow": t["trow"], "tcol": t["tcol"], "h": t["h"], "w": t["w"],
                 "data": t["data_" + col]}
            )

        return fn

    bt = mt.map_batches(pick("mean"), batch_format="pyarrow")
    ot = mt.map_batches(pick("ocount"), batch_format="pyarrow")
    out = mosaic_tiles(bt, ot, distance=8.0, resolution=2.0, H=H, W=W, tile=TILE)
    return {"tiles": int(out.count())}


def run_correction(stats, H, W):
    from geotools_ray.ops.mosaicgraph import raster_diff_correction

    from geotools_ray.ops.raster import tiles_multi_from_cellstats

    mt = tiles_multi_from_cellstats(
        stats, ["m0", "m1", "m2", "m3"], W, H, TILE, dense=True
    )

    def explode(t: pa.Table) -> pa.Table:
        parts = []
        for rid in (0, 1, 2, 3):
            parts.append(
                pa.table(
                    {
                        "trow": t["trow"], "tcol": t["tcol"],
                        "h": t["h"], "w": t["w"],
                        "data": t[f"data_m{rid}"],
                        "rid": pa.array(np.full(len(t), rid, dtype=np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    tagged = mt.map_batches(explode, batch_format="pyarrow")
    out = raster_diff_correction(tagged, root=0)
    return {
        "rasters": int(len(out)),
        "shift_sum": round(float(out["shift"].abs().sum()), 4),
    }


OPS = {
    "flood_basins": run_flood_basins,
    "spill_points": run_spill_points,
    "mosaic": run_mosaic,
    "raster_correction": run_correction,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,100")
    ap.add_argument("--ops", default=",".join(OPS))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    for scale in [int(s) for s in args.scales.split(",")]:
        side = int(round(BASE_H * np.sqrt(scale)))
        H = W = side
        stats = cellstats_ds(H, W).materialize()
        n_cells = stats.count()
        for op in args.ops.split(","):
            t0 = time.perf_counter()
            extra = OPS[op](stats, H, W)
            dt = time.perf_counter() - t0
            rec = {
                "op": op,
                "scale": scale,
                "H": H,
                "W": W,
                "cells": n_cells,
                "sec": round(dt, 2),
                "cells_per_sec": int(n_cells / dt),
                **extra,
            }
            print("REHEARSAL " + json.dumps(rec), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
