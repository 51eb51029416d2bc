"""The flagship image pipeline (the benchmark headline, BASELINE.md):

  image+caption table
    -> map_batches: footprint derive + hierarchical cell encode  (tile assignment)
    -> narrow projection (pixels stay out of every shuffle)
    -> broadcast PIP spatial join against a polygon set, with a
       cell-id prefilter (np.isin against the polygons' cell cover)
    -> exact dedup by phash (hash-partitioned groupby, keep first)
    -> per-cell aggregate (images per cell + mean dims)

Throughput metric = input images / wall seconds end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..kernels import cellindex as ci
from ..kernels.geom import points_in_polygon
from ..ops.zonal import Polygon
from ..stages.imaging import footprint_cells_batch

DEFAULT_LEVEL = 12

# deterministic lon/lat polygon fixture for the flagship join: three
# overlapping convex zones + one concave zone inside the +/-20 deg
# footprint bbox (F3 shape)
FLAGSHIP_POLYGONS = [
    Polygon(1, (((-15.0, -15.0), (0.5, -15.0), (0.5, 0.5), (-15.0, 0.5)),)),
    Polygon(2, (((-5.0, -5.0), (10.5, -5.0), (10.5, 10.5), (-5.0, 10.5)),)),
    Polygon(3, (((0.0, 0.0), (18.0, 2.0), (15.0, 15.0), (8.0, 18.0), (1.0, 12.0)),)),
    Polygon(4, (((-18.0, 5.0), (-2.0, 5.0), (-2.0, 9.0), (-12.0, 9.0), (-12.0, 15.0), (-18.0, 15.0)),)),
]


def polygon_cell_prefilter(polys: list[Polygon], level: int) -> dict[int, np.ndarray]:
    """polygon_id -> sorted array of candidate cell ids (bbox cover)."""
    return {p.polygon_id: np.sort(ci.cover_polygon([list(r) for r in p.rings], level)) for p in polys}


def assign_and_join(
    images: ray.data.Dataset,
    polygons: list[Polygon] | None = None,
    level: int = DEFAULT_LEVEL,
    seed: int = 42,
) -> ray.data.Dataset:
    """-> (image_id, phash, cell_id, polygon_id) one row per match."""
    polygons = polygons or FLAGSHIP_POLYGONS
    pre = polygon_cell_prefilter(polygons, level)
    bc = ray.put((polygons, pre))

    def fn(t: pa.Table) -> pa.Table:
        polys, prefilter = ray.get(bc)
        t = footprint_cells_batch(t, level, seed)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        cell = t["cell_id"].to_numpy(zero_copy_only=False)
        ids = t["image_id"].to_numpy(zero_copy_only=False)
        ph = t["phash"].to_numpy(zero_copy_only=False)
        out_i, out_p = [], []
        for p in polys:
            cand = np.isin(cell, prefilter[p.polygon_id], assume_unique=False)
            if not cand.any():
                continue
            sub = np.nonzero(cand)[0]
            hit = points_in_polygon(lon[sub], lat[sub], [list(r) for r in p.rings])
            sel = sub[hit]
            out_i.append(sel)
            out_p.append(np.full(len(sel), p.polygon_id, dtype=np.int64))
        if out_i:
            pi = np.concatenate(out_i)
            pid = np.concatenate(out_p)
        else:
            pi = np.array([], dtype=np.int64)
            pid = np.array([], dtype=np.int64)
        return pa.table(
            {
                "image_id": ids[pi],
                "phash": ph[pi],
                "cell_id": cell[pi],
                "polygon_id": pid,
            }
        )

    # pixels never reach this stage's output: project first, join narrow
    narrow = images.select_columns(["image_id", "phash"])
    return narrow.map_batches(fn, batch_format="pyarrow")


def dedup_by_phash(joined: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup (U4): keep the lexicographically-first image_id per
    (phash, polygon_id) — hash-partitioned groupby, permutation-safe."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("image_id").head(1)

    return joined.groupby(["phash", "polygon_id"]).map_groups(first, batch_format="pandas")


def cell_rollup(joined: ray.data.Dataset) -> ray.data.Dataset:
    """Images per (polygon, parent cell at level-2) — the compaction-
    style rollup (ST7)."""

    def add_parent(t: pa.Table) -> pa.Table:
        cell = t["cell_id"].to_numpy(zero_copy_only=False)
        return t.append_column("parent_cell", pa.array(ci.parent(cell, 2)))

    from ray.data.aggregate import Count

    return (
        joined.map_batches(add_parent, batch_format="pyarrow")
        .groupby(["polygon_id", "parent_cell"])
        .aggregate(Count(alias_name="n_images"))
    )


def flagship(images: ray.data.Dataset, level: int = DEFAULT_LEVEL) -> ray.data.Dataset:
    joined = assign_and_join(images, level=level)
    deduped = dedup_by_phash(joined)
    return cell_rollup(deduped)
