"""Bounds / snap / cell-assignment math.

Reproduces the reference's grid conventions exactly:
  - snap:        floor(min/res)*res, floor(max/res)*res + res
                 (reference src/util.cpp:197-202)
  - cols/rows:   max(1, ceil(extent/res))        (src/util.cpp:142-148)
  - cell:        col = trunc((x-minx)/res); row counted FROM THE TOP:
                 idx = (rows - row_from_bottom - 1)*cols + col
                 (src/lasgrid.cpp:303-314, src/finalizedpointstream.cpp:96-107)
  - radius window: offset = trunc(trunc(radius*2)/res); candidate cells
                 [c-offset, c+offset], kept iff the CELL CENTROID is
                 within `radius` of the point (src/lasgrid.cpp:130-145,306-310)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Bounds:
    minx: float
    miny: float
    maxx: float
    maxy: float

    def snap(self, res: float) -> "Bounds":
        # floor-min / floor-max-plus-one-cell (src/util.cpp:197-202)
        return Bounds(
            math.floor(self.minx / res) * res,
            math.floor(self.miny / res) * res,
            math.floor(self.maxx / res) * res + res,
            math.floor(self.maxy / res) * res + res,
        )

    def width(self) -> float:
        return self.maxx - self.minx

    def height(self) -> float:
        return self.maxy - self.miny

    def cols(self, res: float) -> int:
        return max(1, int(math.ceil(self.width() / res)))

    def rows(self, res: float) -> int:
        return max(1, int(math.ceil(self.height() / res)))

    def contains(self, x, y):
        """Vectorized min-inclusive / max-exclusive-ish containment.

        Reference Bounds::contains uses closed intervals on both ends
        (include/util.hpp); we mirror that.
        """
        return (x >= self.minx) & (x <= self.maxx) & (y >= self.miny) & (y <= self.maxy)

    def intersects(self, other: "Bounds") -> bool:
        return not (
            other.minx > self.maxx
            or other.maxx < self.minx
            or other.miny > self.maxy
            or other.maxy < self.miny
        )


def snap_bounds_from_points(x: np.ndarray, y: np.ndarray, res: float) -> Bounds:
    """Data-driven bounds (as lasgrid computes from point extremes) then snap."""
    b = Bounds(float(np.min(x)), float(np.min(y)), float(np.max(x)), float(np.max(y)))
    return b.snap(res)


def cell_cols_rows(x, y, bounds: Bounds, res: float):
    """col / row_from_bottom of each point. C-style truncation; since
    x >= minx post-filter, trunc == floor."""
    col = np.floor((np.asarray(x, dtype=np.float64) - bounds.minx) / res).astype(np.int64)
    row = np.floor((np.asarray(y, dtype=np.float64) - bounds.miny) / res).astype(np.int64)
    return col, row


def cell_index(col, row_from_bottom, cols: int, rows: int):
    """Row-major index with rows counted from the TOP (src/lasgrid.cpp:314)."""
    return (rows - np.asarray(row_from_bottom) - 1) * cols + np.asarray(col)


def cell_id_of_points(x, y, bounds: Bounds, res: float):
    cols = bounds.cols(res)
    rows = bounds.rows(res)
    c, r = cell_cols_rows(x, y, bounds, res)
    return cell_index(c, r, cols, rows)


def cell_centroids(cell_id, bounds: Bounds, res: float):
    """Inverse: centroid (x, y) of a top-indexed cell id."""
    cols = bounds.cols(res)
    rows = bounds.rows(res)
    cid = np.asarray(cell_id, dtype=np.int64)
    col = cid % cols
    row_top = cid // cols
    row_bottom = rows - row_top - 1
    cx = col * res + bounds.minx + res * 0.5
    cy = row_bottom * res + bounds.miny + res * 0.5
    return cx, cy


def radius_window_offset(radius: float, res: float) -> int:
    # int offset = (int)(radius * 2) / resolution;  (src/lasgrid.cpp:306)
    return int(int(radius * 2) / res)


def radius_cells_of_points(x, y, bounds: Bounds, res: float, radius: float):
    """Flat-map each point to every cell whose centroid lies within
    `radius` — the reference's gridding-with-window semantics
    (src/lasgrid.cpp:303-314 + inRadius :135-145).

    Returns (point_index, cell_id) int64 arrays. radius == 0 degrades
    to plain single-cell assignment.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    cols = bounds.cols(res)
    rows = bounds.rows(res)
    if radius == 0.0:
        idx = np.arange(len(x), dtype=np.int64)
        return idx, cell_id_of_points(x, y, bounds, res)

    c, r = cell_cols_rows(x, y, bounds, res)
    off = radius_window_offset(radius, res)
    span = 2 * off + 1
    # candidate (cc, rr) grids per point, clamped to [0, cols) x [0, rows)
    d = np.arange(-off, off + 1, dtype=np.int64)
    cc = c[:, None] + d[None, :]          # (n, span)
    rr = r[:, None] + d[None, :]
    cc_ok = (cc >= 0) & (cc < cols)
    rr_ok = (rr >= 0) & (rr < rows)
    # centroid coordinates per candidate col/row
    cxs = cc * res + bounds.minx + res * 0.5   # (n, span)
    cys = rr * res + bounds.miny + res * 0.5
    dx2 = (cxs - x[:, None]) ** 2              # (n, span)
    dy2 = (cys - y[:, None]) ** 2
    # (n, span, span) distance-squared via broadcast
    dist2 = dx2[:, :, None] + dy2[:, None, :]
    # sqrt-then-compare mirrors the reference's inRadius (sqrt(d2) <=
    # radius, src/lasgrid.cpp) — d2 <= r*r can disagree by one ulp at
    # the exact boundary; the SQL oracle uses the same sqrt form
    keep = (np.sqrt(dist2) <= radius) & cc_ok[:, :, None] & rr_ok[:, None, :]
    pi, ci, ri = np.nonzero(keep)
    cell = (rows - rr[pi, ri] - 1) * cols + cc[pi, ci]
    return pi.astype(np.int64), cell.astype(np.int64)
