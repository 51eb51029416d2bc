"""Planar geometry kernels: vectorized point-in-polygon (ray casting),
polygon bbox / cell cover, triangle math.

The reference does point-in-polygon via GEOS `geom->contains(p)` in a
nested loop (src/pointzonalstats.cpp:393-410); here it is an even-odd
crossing-number test vectorized over all points at once, with a bbox
prefilter. Boundary points are genuinely excluded (GEOS `contains` =
interior): crossing-test hits get an exact on-edge check, since the
bare half-open crossing rule counts left/bottom edges as inside.

A polygon is `rings`: list of rings, each ring a list of (x, y) pairs
(first ring = shell, others = holes; even-odd rule handles both).
"""

from __future__ import annotations

import numpy as np


def ring_bbox(ring) -> tuple[float, float, float, float]:
    a = np.asarray(ring, dtype=np.float64)
    return float(a[:, 0].min()), float(a[:, 1].min()), float(a[:, 0].max()), float(a[:, 1].max())


def polygon_bbox(rings) -> tuple[float, float, float, float]:
    return ring_bbox(rings[0])


def points_in_ring(x: np.ndarray, y: np.ndarray, ring) -> np.ndarray:
    """Even-odd crossing test of many points against one ring (vectorized
    over points; loops over ring edges — rings are small)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    r = np.asarray(ring, dtype=np.float64)
    if len(r) and (r[0] == r[-1]).all():
        r = r[:-1]
    inside = np.zeros(len(x), dtype=bool)
    n = len(r)
    for i in range(n):
        x1, y1 = r[i]
        x2, y2 = r[(i + 1) % n]
        # does edge straddle the horizontal line through y?
        cond = (y1 > y) != (y2 > y)
        if not cond.any():
            continue
        xs = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        inside ^= cond & (x < xs)
    return inside


def points_on_ring(x: np.ndarray, y: np.ndarray, ring) -> np.ndarray:
    """True where a point lies exactly on a ring edge (collinear and
    within the segment, at double precision)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    r = np.asarray(ring, dtype=np.float64)
    if len(r) and (r[0] == r[-1]).all():
        r = r[:-1]
    on = np.zeros(len(x), dtype=bool)
    n = len(r)
    for i in range(n):
        x1, y1 = r[i]
        x2, y2 = r[(i + 1) % n]
        ex, ey = x2 - x1, y2 - y1
        cross = ex * (y - y1) - ey * (x - x1)
        dot = (x - x1) * ex + (y - y1) * ey
        on |= (cross == 0.0) & (dot >= 0.0) & (dot <= ex * ex + ey * ey)
    return on


def points_in_polygon(x, y, rings) -> np.ndarray:
    """Even-odd over all rings (shell + holes), boundary EXCLUDED —
    GEOS `contains` = interior (the bare crossing rule is half-open:
    it counts left/bottom edges in and right/top out, which would
    diverge from both GEOS and the strict-inequality SQL oracles)."""
    minx, miny, maxx, maxy = polygon_bbox(rings)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    cand = (x >= minx) & (x <= maxx) & (y >= miny) & (y <= maxy)
    out = np.zeros(len(x), dtype=bool)
    if not cand.any():
        return out
    idx = np.nonzero(cand)[0]
    xs, ys = x[idx], y[idx]
    sub = np.zeros(len(idx), dtype=bool)
    for ring in rings:
        sub ^= points_in_ring(xs, ys, ring)
    hit = np.nonzero(sub)[0]
    if len(hit):  # boundary exclusion only for crossing-test hits
        border = np.zeros(len(hit), dtype=bool)
        for ring in rings:
            border |= points_on_ring(xs[hit], ys[hit], ring)
        sub[hit[border]] = False
    out[idx] = sub
    return out


def tri_area_heron(x1, y1, z1, x2, y2, z2, x3, y3, z3):
    """3-D triangle area via Heron (src/pointnormalize.cpp:34-40,
    cellstats.hpp computeArea)."""
    s0 = np.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2 + (z1 - z2) ** 2)
    s1 = np.sqrt((x2 - x3) ** 2 + (y2 - y3) ** 2 + (z2 - z3) ** 2)
    s2 = np.sqrt((x3 - x1) ** 2 + (y3 - y1) ** 2 + (z3 - z1) ** 2)
    s = (s0 + s1 + s2) / 2.0
    return np.sqrt(np.maximum(s * (s - s0) * (s - s1) * (s - s2), 0.0))


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain, CCW hull of (n,2) array."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])
