"""Numpy-vectorized Bowyer-Watson Delaunay triangulation for per-cell
point sets (the scipy-free replacement for the reference's CGAL usage
in pointnormalize/lasvalidate/rugosity).

Insertion is sequential (deterministic in input order) but each
insertion's circumcircle tests and each query's point location run
vectorized over all triangles — ~1k-point cells triangulate in
fractions of a second instead of minutes.
"""

from __future__ import annotations

import numpy as np


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """-> list of triangles as index triples into `points` (n, 2)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1.0) * 20
    sup = np.array([[cx - span, cy - span], [cx + span, cy - span], [cx, cy + span]])
    allp = np.vstack([pts, sup])

    tris = np.array([[n, n + 1, n + 2]], dtype=np.int64)  # (T, 3)

    for i in range(n):
        p = allp[i]
        a = allp[tris[:, 0]]
        b = allp[tris[:, 1]]
        c = allp[tris[:, 2]]
        ax = a[:, 0] - p[0]; ay = a[:, 1] - p[1]
        bx = b[:, 0] - p[0]; by = b[:, 1] - p[1]
        cx_ = c[:, 0] - p[0]; cy_ = c[:, 1] - p[1]
        det = (
            (ax * ax + ay * ay) * (bx * cy_ - by * cx_)
            - (bx * bx + by * by) * (ax * cy_ - ay * cx_)
            + (cx_ * cx_ + cy_ * cy_) * (ax * by - ay * bx)
        )
        o = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
        bad = np.where(o > 0, det > 0, det < 0)
        if not bad.any():
            # numerically degenerate (duplicate point) — skip
            continue
        bad_tris = tris[bad]
        tris = tris[~bad]
        # boundary = edges of the bad region appearing exactly once
        edges = np.concatenate(
            [bad_tris[:, [0, 1]], bad_tris[:, [1, 2]], bad_tris[:, [2, 0]]]
        )
        edges_sorted = np.sort(edges, axis=1)
        key = edges_sorted[:, 0] * (n + 3) + edges_sorted[:, 1]
        uniq, first_idx, counts = np.unique(key, return_index=True, return_counts=True)
        boundary = edges_sorted[first_idx[counts == 1]]
        new = np.column_stack(
            [boundary[:, 0], boundary[:, 1], np.full(len(boundary), i, dtype=np.int64)]
        )
        tris = np.vstack([tris, new])

    keep = (tris < n).all(axis=1)
    return [tuple(t) for t in tris[keep]]


def _bary(p, a, b, c):
    det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
    if det == 0:
        return None
    l1 = ((b[1] - c[1]) * (p[0] - c[0]) + (c[0] - b[0]) * (p[1] - c[1])) / det
    l2 = ((c[1] - a[1]) * (p[0] - c[0]) + (a[0] - c[0]) * (p[1] - c[1])) / det
    return l1, l2, 1.0 - l1 - l2


def interp_tin(qx, qy, pts_xy: np.ndarray, pts_z: np.ndarray, nodata=np.nan):
    """Interpolate z at (qx, qy) arrays from a TIN of the sample points
    (barycentric inside the containing triangle — the reference's
    interpolateTriangle semantics, src/lasvalidate.cpp:169-232);
    queries outside the hull -> nodata."""
    tris = delaunay(pts_xy)
    qx = np.atleast_1d(np.asarray(qx, dtype=np.float64))
    qy = np.atleast_1d(np.asarray(qy, dtype=np.float64))
    out = np.full(len(qx), nodata, dtype=np.float64)
    if not tris:
        return out
    T = np.asarray(tris, dtype=np.int64)
    a = pts_xy[T[:, 0]]
    b = pts_xy[T[:, 1]]
    c = pts_xy[T[:, 2]]
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1])
    ok_tri = det != 0
    eps = 1e-12
    za = pts_z[T[:, 0]]
    zb = pts_z[T[:, 1]]
    zc = pts_z[T[:, 2]]
    # triangle bboxes for pruning (bbox superset -> excluding a
    # triangle by bbox can never drop a containing triangle)
    tminx = np.minimum(np.minimum(a[:, 0], b[:, 0]), c[:, 0])
    tmaxx = np.maximum(np.maximum(a[:, 0], b[:, 0]), c[:, 0])
    tminy = np.minimum(np.minimum(a[:, 1], b[:, 1]), c[:, 1])
    tmaxy = np.maximum(np.maximum(a[:, 1], b[:, 1]), c[:, 1])
    with np.errstate(divide="ignore", invalid="ignore"):
        # chunked queries x candidate triangles: callers pass queries
        # in (x, y) sorted order, so each chunk spans a narrow x-range
        # and the bbox prune keeps the candidate set small
        chunk = 256
        for s in range(0, len(qx), chunk):
            px = qx[s : s + chunk]
            py = qy[s : s + chunk]
            sel = np.nonzero(
                ok_tri
                & (tmaxx >= px.min()) & (tminx <= px.max())
                & (tmaxy >= py.min()) & (tminy <= py.max())
            )[0]
            if not len(sel):
                continue
            ax, ay = a[sel, 0], a[sel, 1]
            bx, by = b[sel, 0], b[sel, 1]
            cx, cy = c[sel, 0], c[sel, 1]
            d = det[sel]
            l1 = ((by - cy)[None, :] * (px[:, None] - cx[None, :]) + (cx - bx)[None, :] * (py[:, None] - cy[None, :])) / d[None, :]
            l2 = ((cy - ay)[None, :] * (px[:, None] - cx[None, :]) + (ax - cx)[None, :] * (py[:, None] - cy[None, :])) / d[None, :]
            l3 = 1.0 - l1 - l2
            inside = (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
            any_hit = inside.any(axis=1)
            # first containing triangle in original list order: sel is
            # ascending, so argmax over the subset picks the same one
            first = np.argmax(inside, axis=1)
            rows = np.nonzero(any_hit)[0]
            t = sel[first[rows]]
            r1 = l1[rows, first[rows]]
            r2 = l2[rows, first[rows]]
            r3 = l3[rows, first[rows]]
            out[s + rows] = r1 * za[t] + r2 * zb[t] + r3 * zc[t]
    return out
