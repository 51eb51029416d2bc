"""W6 crown region-growing + W7 boundary extraction.

Crowns: tile-parallel with halo = 2*ceil(radius)+1. The claim
predicate bounds every claimed cell to `radius` of its top, but the
monotone-descending BFS PATH from the top to an interior cell may
detour anywhere inside the top's radius disk — up to 2*radius from
the claimed cell (top <= radius from the cell, path <= radius from
the top). A halo of only radius+1 nodata-truncated such serpentine
paths (regression-tested). Residual caveat: FIFO contention CHAINS
(wave A blocked by wave B blocked by wave C ...) can in principle
couple cells further than any fixed halo; each link needs another
top within radius of the previous disk, so with real tree spacing
(tops >~ radius apart) chains beyond one link do not arise — for
adversarial inputs run with tile >= grid to replay the exact global
kernel. Multi-source FIFO BFS order is made deterministic by sorting
tops by id (the reference's order is its DB query order,
src/treetops.cpp:352-361).

Boundary: occupancy via the distributed cell count, edge-cell
detection (fullNeighbours complement, src/lasboundary.cpp:85-99) per
tile with a 1-cell halo, then Delaunay edges shorter than max_len over
the (small) edge-cell set in one task (src/lasboundary.cpp:165-194).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..kernels import raster as KR
from ..stages.grouped import grouped_map
from .raster import _pieces_grouped, iter_padded_tiles, list_col_of


def crown_growth_tiles(
    tiles: ray.data.Dataset,
    tops: pa.Table,  # (id:int64, col:int64, row:int64, z:float64)
    min_height: float,
    height_fraction: float,
    radius: float,
    H: int,
    W: int,
    tile: int,
    nodata: float = KR.NODATA,
    **kw,
):
    """-> tile rows of the crown-id raster (0 = unclaimed)."""
    halo = 2 * int(np.ceil(radius)) + 1  # path-detour bound, see module doc
    tops_ref = ray.put(
        np.column_stack(
            [
                tops["id"].to_numpy(zero_copy_only=False),
                tops["col"].to_numpy(zero_copy_only=False),
                tops["row"].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
    )
    tops_z_ref = ray.put(tops["z"].to_numpy(zero_copy_only=False).astype(np.float64))

    def assemble(t: pa.Table) -> pa.Table:
        T = ray.get(tops_ref)
        TZ = ray.get(tops_z_ref)
        out_tr, out_tc, out_h, out_w, arrays = [], [], [], [], []
        for tr, tc, gr0, gc0, h, w, padded in iter_padded_tiles(t, tile, halo, H, W, nodata):
            # tops inside the padded window, converted to padded coords
            sel = (
                (T[:, 1] >= gc0 - halo) & (T[:, 1] < gc0 + w + halo)
                & (T[:, 2] >= gr0 - halo) & (T[:, 2] < gr0 + h + halo)
            )
            local = [
                (int(T[i, 0]), int(T[i, 1] - gc0 + halo), int(T[i, 2] - gr0 + halo), float(TZ[i]))
                for i in np.nonzero(sel)[0]
            ]
            local.sort()  # by id — deterministic seeding order
            ids = KR.crown_growth(padded, local, min_height, height_fraction, radius, nodata)
            interior = ids[halo : halo + h, halo : halo + w]
            out_tr.append(tr); out_tc.append(tc); out_h.append(h); out_w.append(w)
            arrays.append(interior.astype(np.float64))
        return pa.table(
            {
                "trow": np.array(out_tr, dtype=np.int64),
                "tcol": np.array(out_tc, dtype=np.int64),
                "h": np.array(out_h, dtype=np.int64),
                "w": np.array(out_w, dtype=np.int64),
                "data": list_col_of(arrays),
            }
        )

    return _pieces_grouped(tiles, halo, H, W, tile, nodata, assemble, **kw)


# ---------------------------------------------------------------------------
# W7 boundary

def _edge_cells(
    points: ray.data.Dataset,
    res: float,
    class_filter: frozenset | None = None,
):
    """Distributed occupancy (groupby count) -> edge cells of the grid
    (fullNeighbours complement, src/lasboundary.cpp:85-99).
    -> (edge list of (col, row), bounds)."""
    from ray.data.aggregate import Count

    from ..ops.gridstats import compute_bounds

    b = compute_bounds(points, res)
    cols = b.cols(res)
    rows = b.rows(res)

    def occupy(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        if class_filter is not None:
            cls = t["cls"].to_numpy(zero_copy_only=False)
            m = np.isin(cls, list(class_filter))
            x, y = x[m], y[m]
        col = np.floor((x - b.minx) / res).astype(np.int64)
        row = np.floor((y - b.miny) / res).astype(np.int64)  # bottom-indexed
        # only occupancy matters downstream: batch-local dedup cuts the
        # shuffle from O(#points) to O(#cells per batch)
        return pa.table({"cell": np.unique(row * cols + col)})

    occ_cells = (
        points.map_batches(occupy, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    occ = np.zeros((rows, cols), dtype=bool)
    cid = occ_cells["cell"].to_numpy()
    occ[cid // cols, cid % cols] = True
    return KR.edge_cells_boundary(occ), b


def boundary_cells(
    points: ray.data.Dataset,
    res: float,
    class_filter: frozenset | None = None,
) -> pd.DataFrame:
    """-> DataFrame (col, row) of the occupancy grid's edge cells —
    the oracle-checkable distributed half of lasboundary."""
    edge, _ = _edge_cells(points, res, class_filter)
    return pd.DataFrame(
        {
            "col": np.array([c for c, _ in edge], dtype=np.int64),
            "row": np.array([r for _, r in edge], dtype=np.int64),
        }
    )


def boundary_edges(
    points: ray.data.Dataset,
    res: float,
    max_len: float = 10.0,
    class_filter: frozenset | None = None,
) -> pd.DataFrame:
    """-> DataFrame of Delaunay edges (x0, y0, x1, y1, length) between
    edge cells of the occupancy grid — the multiline boundary."""
    from ..kernels.delaunay import delaunay

    edge, b = _edge_cells(points, res, class_filter)
    if len(edge) < 3:
        return pd.DataFrame(columns=["x0", "y0", "x1", "y1", "length"])
    # centroid coords per the reference quirk: y uses - res/2
    pts = np.array(
        [
            (c * res + b.minx + res / 2.0, r * res + b.miny - res / 2.0)
            for c, r in edge
        ]
    )
    tris = delaunay(pts)
    seen = set()
    out = []
    for t in tris:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            key = (min(e), max(e))
            if key in seen:
                continue
            seen.add(key)
            p0, p1 = pts[key[0]], pts[key[1]]
            ln = float(np.hypot(p1[0] - p0[0], p1[1] - p0[1]))
            if ln < max_len:
                out.append({"x0": p0[0], "y0": p0[1], "x1": p1[0], "y1": p1[1], "length": ln})
    return pd.DataFrame(out, columns=["x0", "y0", "x1", "y1", "length"])
