"""Interpolators (R2 IDW, R3 average, R4 planar fit) and M7 height
normalization / W8 TIN interpolation.

Reference semantics:
- IDW: weight = 1 / (squared_distance ** exponent) over ALL samples,
  or over the k nearest (src/interp/Interpolators.cpp:209-365 — note
  _sdist is the SQUARED distance fed to pow).
- average: global sample mean, or mean of k nearest
  (Interpolators.cpp:367-421).
- planar: least-squares plane over centroid-offset samples
  (Interpolators.cpp:425-524) — computed once on the driver (samples
  are small), evaluated vectorized per batch.
- height normalize: per spatial cell, TIN the ground points (cls==2),
  barycentric ground z under each point, z := max(0, z - ground_z)
  (src/pointnormalize.cpp:63-174).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..kernels.delaunay import interp_tin
from ..stages.grouped import grouped_map


def _broadcast_samples(samples: pa.Table, sx="sx", sy="sy", sz="sz"):
    return ray.put(
        {
            "x": samples[sx].to_numpy(zero_copy_only=False).astype(np.float64),
            "y": samples[sy].to_numpy(zero_copy_only=False).astype(np.float64),
            "z": samples[sz].to_numpy(zero_copy_only=False).astype(np.float64),
        }
    )


def idw_at(
    targets: ray.data.Dataset,
    samples: pa.Table,
    exponent: float = 1.0,
    neighbours: int = 0,
    x_col: str = "cx",
    y_col: str = "cy",
    out_col: str = "idw_z",
    exact_hits: bool = False,
) -> ray.data.Dataset:
    """IDW value at each target row's (x_col, y_col): weights are
    1/(d2^exponent) with d2 the SQUARED distance; neighbours=0 -> all
    samples, else the k nearest (ranked by d2). exact_hits=True makes
    a target coincident with a sample take that sample's value (the
    1/0 weight would otherwise produce inf/nan — used by rastfit where
    sample cells ARE target cells)."""
    ref = _broadcast_samples(samples)

    def fn(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        dx = x[:, None] - s["x"][None, :]
        dy = y[:, None] - s["y"][None, :]
        d2 = dx * dx + dy * dy
        with np.errstate(divide="ignore", invalid="ignore"):
            w = 1.0 / np.power(d2, exponent)
            if neighbours and neighbours < len(s["x"]):
                # keep only the k nearest per target; stable sort ties on
                # sample position so SQL row_number oracles match
                idx = np.argsort(d2, axis=1, kind="stable")[:, :neighbours]
                rows = np.arange(len(x))[:, None]
                z = np.sum(s["z"][idx] * w[rows, idx], axis=1) / np.sum(w[rows, idx], axis=1)
            else:
                z = (w @ s["z"]) / w.sum(axis=1)
        if exact_hits:
            hit_t, hit_s = np.nonzero(d2 == 0.0)
            z[hit_t] = s["z"][hit_s]
        return t.append_column(out_col, pa.array(z))

    return targets.map_batches(fn, batch_format="pyarrow")


def natural_neighbour_at(
    targets: ray.data.Dataset,
    samples: pa.Table,
    x_col: str = "cx",
    y_col: str = "cy",
    out_col: str = "nn_z",
) -> ray.data.Dataset:
    """R5 natural-neighbour (Sibson) interpolation — the area-stealing
    weights of src/interp/Interpolators.cpp:526-700: inserting the
    target into the samples' Voronoi diagram steals area from its
    neighbours; weight_i = stolen_area_i / total_stolen.

    Implemented per target by clipping half-planes (the Voronoi cell
    of the target w.r.t. all samples, then the pre/post areas of each
    neighbour's cell) inside a bounded box. Targets coincident with a
    sample take its value; targets outside the samples' hull fall back
    to nearest-sample (the reference returns nodata there — callers
    that need parity mask by hull membership first)."""
    ref = _broadcast_samples(samples)
    return targets.map_batches(
        _SibsonActor,
        fn_constructor_kwargs=dict(ref=ref, x_col=x_col, y_col=y_col, out_col=out_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


class _SibsonActor:
    """Per-actor Sibson state: KD-tree over the sample sites, each
    sample's _VOR_PRUNE nearest neighbours, and its original Voronoi
    cell area — built ONCE in __init__ (per actor), not per batch.
    Every cell is clipped against a pruned near-site list instead of
    an argsort over the full sample set.

    APPROXIMATION: pre-cells are clipped against only the
    _VOR_PRUNE-1 = 63 nearest sites, and stolen-area contributors are
    pruned by a bbox-radius heuristic (16x the target cell's extent).
    For well-distributed sites a Voronoi cell is bounded by its few
    nearest neighbours and the result equals the exact all-sites
    kernel (tests/test_interp.py::test_sibson_actor_matches_scalar_
    kernel). For DEGENERATE distributions — e.g. >63 co-circular
    sites all adjacent to one target, or extreme anisotropy where a
    cell is bounded by a site beyond the 63 nearest — the pruned cell
    can be larger than the true cell and weights shift toward the
    retained neighbours. The output remains a convex combination of
    sample values (weights are genuine non-negative stolen areas);
    tests/test_interp.py::test_sibson_degenerate_cocircular bounds
    the divergence on the worst co-circular case. Raise _VOR_PRUNE
    if exactness on such inputs matters more than the O(S*k) setup."""

    def __init__(self, ref, x_col="cx", y_col="cy", out_col="nn_z"):
        s = ray.get(ref)
        self.x_col, self.y_col, self.out_col = x_col, y_col, out_col
        self.sx, self.sy, self.sz = s["x"], s["y"], s["z"]
        sx, sy = self.sx, self.sy
        self.pad = 4.0 * (max(sx.max() - sx.min(), sy.max() - sy.min()) + 1.0)
        n = len(sx)
        k = min(_VOR_PRUNE + 1, n)
        # per-sample nearest-neighbour lists from the full pairwise d2
        # matrix (samples are the SMALL broadcast side by contract, so
        # O(S^2) once per actor is cheap and replaces a per-cell argsort)
        d2 = (sx[:, None] - sx[None, :]) ** 2 + (sy[:, None] - sy[None, :]) ** 2
        part = np.argpartition(d2, k - 1, axis=1)[:, :k] if k < n else np.tile(np.arange(n), (n, 1))
        rows = np.arange(n)[:, None]
        order = np.argsort(d2[rows, part], axis=1, kind="stable")
        nbr = part[rows, order]
        # drop self from each neighbour row (self is nearest but ties
        # can reorder it; mask by index identity, keep first k-1 others)
        self.nbr = np.empty((n, k - 1), dtype=np.int64)
        for j in range(n):
            row = nbr[j][nbr[j] != j]
            self.nbr[j] = row[: k - 1] if len(row) >= k - 1 else np.pad(row, (0, k - 1 - len(row)), mode="edge")
        # each sample's original Voronoi cell POLYGON (not just area):
        # inserting a target adds exactly one bisector, so the post
        # cell is pre_poly clipped by one half-plane — O(1) per
        # candidate instead of re-clipping the full near-site list
        self.pre_poly = [
            _clip_cell(sx[j], sy[j], sx[self.nbr[j]], sy[self.nbr[j]], self.pad)
            for j in range(n)
        ]
        self.pre = np.array([_poly_area(p) for p in self.pre_poly])

    def __call__(self, t: pa.Table) -> pa.Table:
        x = t[self.x_col].to_numpy(zero_copy_only=False)
        y = t[self.y_col].to_numpy(zero_copy_only=False)
        out = np.empty(len(x))
        for i in range(len(x)):
            out[i] = self._value(x[i], y[i])
        return t.append_column(self.out_col, pa.array(out))

    def _value(self, tx, ty) -> float:
        sx, sy, sz = self.sx, self.sy, self.sz
        d2 = (sx - tx) ** 2 + (sy - ty) ** 2
        hit = np.nonzero(d2 == 0.0)[0]
        if len(hit):
            return float(sz[hit[0]])
        # target's Voronoi cell among its nearest samples
        k = min(_VOR_PRUNE, len(sx))
        if k < len(sx):
            part = np.argpartition(d2, k - 1)[:k]
            near = part[np.argsort(d2[part], kind="stable")]
        else:
            near = np.argsort(d2, kind="stable")
        tcell = _clip_cell(tx, ty, sx[near], sy[near], self.pad)
        tarea = _poly_area(tcell)
        if tarea <= 0.0:
            return float(sz[int(np.argmin(d2))])
        minx, miny = tcell.min(axis=0)
        maxx, maxy = tcell.max(axis=0)
        r2 = max(maxx - tx, tx - minx, maxy - ty, ty - miny) ** 2 * 16.0 + 1.0
        cand = np.nonzero(d2 <= r2)[0]
        wsum = 0.0
        zsum = 0.0
        for j in cand:
            # j's cell after inserting the target = its cached pre-cell
            # clipped by the single target bisector
            ax, ay = tx - sx[j], ty - sy[j]
            c = (tx**2 - sx[j] ** 2 + ty**2 - sy[j] ** 2) / 2.0
            post = _poly_area(_clip_halfplane(self.pre_poly[j], ax, ay, c))
            stolen = max(self.pre[j] - post, 0.0)
            if stolen > 0.0:
                wsum += stolen
                zsum += stolen * sz[j]
        if wsum <= 0.0:
            return float(sz[int(np.argmin(d2))])
        return zsum / wsum


def _clip_halfplane(poly: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Vectorized Sutherland–Hodgman clip of polygon (N,2) to
    a*x + b*y <= c (same arithmetic as the scalar loop it replaces:
    identical vertex order and intersection formula)."""
    n = len(poly)
    if n == 0:
        return poly
    vals = a * poly[:, 0] + b * poly[:, 1] - c
    keep = vals <= 1e-12
    if keep.all():
        return poly
    if not keep.any():
        return np.empty((0, 2))
    nxt = np.roll(np.arange(n), -1)
    cross = keep != keep[nxt]
    frac = np.zeros(n)
    ci = np.nonzero(cross)[0]
    frac[ci] = vals[ci] / (vals[ci] - vals[nxt[ci]])
    inter = poly + frac[:, None] * (poly[nxt] - poly)
    slots = np.empty((2 * n, 2))
    slots[0::2] = poly
    slots[1::2] = inter
    mask = np.empty(2 * n, dtype=bool)
    mask[0::2] = keep
    mask[1::2] = cross
    return slots[mask]


def _clip_cell(px: float, py: float, qx: np.ndarray, qy: np.ndarray, pad: float) -> np.ndarray:
    """Voronoi cell of (px, py) vs an already-pruned near-site list
    (no argsort — callers pass nearest-first KD-tree neighbours)."""
    poly = np.array(
        [[px - pad, py - pad], [px + pad, py - pad], [px + pad, py + pad], [px - pad, py + pad]]
    )
    for k in range(len(qx)):
        ax, ay = qx[k] - px, qy[k] - py
        c = (qx[k] ** 2 - px**2 + qy[k] ** 2 - py**2) / 2.0
        poly = _clip_halfplane(poly, ax, ay, c)
        if len(poly) == 0:
            break
    return poly


_VOR_PRUNE = 64  # nearest sites that can bound a Voronoi cell in practice


def _voronoi_cell(px: float, py: float, qx: np.ndarray, qy: np.ndarray, pad: float) -> np.ndarray:
    """Voronoi cell of (px, py) vs sites (qx, qy), clipped to a big
    box. Only the _VOR_PRUNE nearest sites are clipped — a cell's
    bounding bisectors come from near sites (exact for any cell with
    fewer than that many Delaunay neighbours, i.e. all practical
    point sets)."""
    poly = np.array(
        [[px - pad, py - pad], [px + pad, py - pad], [px + pad, py + pad], [px - pad, py + pad]]
    )
    # nearest-first ordering prunes faster
    order = np.argsort((qx - px) ** 2 + (qy - py) ** 2, kind="stable")[:_VOR_PRUNE]
    for k in order:
        ax, ay = qx[k] - px, qy[k] - py
        c = (qx[k] ** 2 - px**2 + qy[k] ** 2 - py**2) / 2.0
        poly = _clip_halfplane(poly, ax, ay, c)
        if len(poly) == 0:
            break
    return poly


def _poly_area(poly: np.ndarray) -> float:
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)))


def _sibson_value(tx, ty, sx, sy, sz, pad, pre_areas) -> float:
    d2 = (sx - tx) ** 2 + (sy - ty) ** 2
    hit = np.nonzero(d2 == 0.0)[0]
    if len(hit):
        return float(sz[hit[0]])
    # target's Voronoi cell among the samples
    tcell = _voronoi_cell(tx, ty, sx, sy, pad)
    tarea = _poly_area(tcell)
    if tarea <= 0.0:
        j = int(np.argmin(d2))
        return float(sz[j])
    # candidate neighbours: samples whose cell the target's cell touches
    # (bounded by the cell's bbox + margin)
    minx, miny = tcell.min(axis=0)
    maxx, maxy = tcell.max(axis=0)
    r2 = max(maxx - tx, tx - minx, maxy - ty, ty - miny) ** 2 * 16.0 + 1.0
    cand = np.nonzero(d2 <= r2)[0]
    wsum = 0.0
    zsum = 0.0
    for j in cand:
        # area of sample j's cell before/after inserting the target
        ox = np.concatenate([sx[:j], sx[j + 1 :]])
        oy = np.concatenate([sy[:j], sy[j + 1 :]])
        post = _poly_area(
            _voronoi_cell(sx[j], sy[j], np.append(ox, tx), np.append(oy, ty), pad)
        )
        stolen = max(pre_areas[j] - post, 0.0)
        if stolen > 0.0:
            wsum += stolen
            zsum += stolen * sz[j]
    if wsum <= 0.0:
        j = int(np.argmin(d2))
        return float(sz[j])
    return zsum / wsum


def avg_at(
    targets: ray.data.Dataset,
    samples: pa.Table,
    neighbours: int = 0,
    x_col: str = "cx",
    y_col: str = "cy",
    out_col: str = "avg_z",
) -> ray.data.Dataset:
    """R3: global mean (neighbours=0) or mean of k nearest."""
    ref = _broadcast_samples(samples)

    def fn(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        n = len(t)
        if not neighbours or neighbours >= len(s["x"]):
            z = np.full(n, float(np.sum(s["z"]) / len(s["z"])))
        else:
            x = t[x_col].to_numpy(zero_copy_only=False)
            y = t[y_col].to_numpy(zero_copy_only=False)
            d2 = (x[:, None] - s["x"][None, :]) ** 2 + (y[:, None] - s["y"][None, :]) ** 2
            idx = np.argsort(d2, axis=1, kind="stable")[:, :neighbours]
            z = s["z"][idx].mean(axis=1)
        return t.append_column(out_col, pa.array(z))

    return targets.map_batches(fn, batch_format="pyarrow")


def planar_fit_params(samples: pa.Table, sx="sx", sy="sy", sz="sz"):
    """R4: lstsq plane z = a*x' + b*y' + c over centroid-offset
    coordinates (Interpolators.cpp:446-470 mcentroid + computeParams).
    -> (a, b, c, cx, cy)."""
    x = samples[sx].to_numpy(zero_copy_only=False).astype(np.float64)
    y = samples[sy].to_numpy(zero_copy_only=False).astype(np.float64)
    z = samples[sz].to_numpy(zero_copy_only=False).astype(np.float64)
    cx, cy, cz = x.mean(), y.mean(), z.mean()
    # closed-form normal equations over centered coords (the 2x2
    # Cramer solve a C++ implementation of a 3-param plane fit does) —
    # chosen over np.linalg.lstsq so the SQL oracle's identical
    # expressions reproduce the same doubles
    dx, dy, dz = x - cx, y - cy, z - cz
    sxx = float(np.sum(dx * dx))
    sxy = float(np.sum(dx * dy))
    syy = float(np.sum(dy * dy))
    sxz = float(np.sum(dx * dz))
    syz = float(np.sum(dy * dz))
    det = sxx * syy - sxy * sxy
    # degenerate (collinear) sample sets: fall back to the horizontal
    # mean plane — same guard in the SQL oracle
    if abs(det) < 1e-9 * max(sxx * syy, 1.0):
        a = b = 0.0
    else:
        a = (sxz * syy - syz * sxy) / det
        b = (sxx * syz - sxy * sxz) / det
    return float(a), float(b), float(cz), float(cx), float(cy)


def planar_at(
    targets: ray.data.Dataset,
    samples: pa.Table,
    x_col: str = "cx",
    y_col: str = "cy",
    out_col: str = "plane_z",
) -> ray.data.Dataset:
    a, b, c, cx, cy = planar_fit_params(samples)

    def fn(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        z = a * (x - cx) + b * (y - cy) + c
        return t.append_column(out_col, pa.array(z))

    return targets.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# M7 height normalization (per-cell TIN of ground points)

def normalize_height(
    points: ray.data.Dataset,
    cell_col: str = "cell_id",
    drop_negative: bool = False,
    num_parts: int | None = None,
    max_ground_points: int = 800,
    reduce_fn=None,
) -> ray.data.Dataset:
    """Per cell: TIN the ground points (cls == 2), subtract the
    barycentric ground surface under each point, clamp at 0
    (src/pointnormalize.cpp:126-152). Points in cells with < 3 ground
    points keep z unchanged minus nothing (reference skips them).
    The cell partitioning must include enough context — callers should
    assign cells with a halo (cell + ring) when surfaces span cells.

    reduce_fn(normalized_partition_df) -> df: an optional per-cell
    aggregation applied INSIDE the same partition call. The partition
    already holds every row of its cells, so a caller that only wants
    per-cell statistics skips a second full-payload shuffle of the
    normalized point set (measured: the rollup shuffle was ~40% of
    q_normalize_height's wall time)."""

    from ..kernels.delaunay import delaunay, interp_corners

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        res = df
        if len(df):
            # ONE stable lexsort replaces pandas groupby + per-cell
            # sort_values; cells become contiguous slices in
            # first-appearance order (matching the old groupby
            # sort=False iteration), rows (x, y, z)-sorted within —
            # triangulation insertion order is part of the contract
            # (cocircular ties resolve by it)
            cellv = df[cell_col].to_numpy()
            codes, _ = pd.factorize(cellv)
            x = df["x"].to_numpy().astype(np.float64, copy=False)
            y = df["y"].to_numpy().astype(np.float64, copy=False)
            z = df["z"].to_numpy().astype(np.float64, copy=False)
            cls = df["cls"].to_numpy()
            order = np.lexsort((z, y, x, codes))
            xs, ys, zs, cs, cds = x[order], y[order], z[order], cls[order], codes[order]
            bnd = np.flatnonzero(np.diff(cds)) + 1
            starts = np.concatenate([[0], bnd])
            ends = np.concatenate([bnd, [len(cds)]])
            # offset each cell to a disjoint x-range so every cell's
            # TIN corners can live in ONE global array: a query can
            # only ever fall inside its own cell's triangles, and the
            # chunked bbox prune in interp_corners keeps each
            # (cell-sorted) query chunk against its own cell's corners
            span = float(xs.max()) - float(xs.min()) + 1.0
            offx = cds.astype(np.float64) * span
            ca, cb, cc, cza, czb, czc = [], [], [], [], [], []
            for s, e in zip(starts, ends):
                gm = s + np.flatnonzero(cs[s:e] == 2)
                if len(gm) > max_ground_points:
                    # deterministic thinning: every k-th ground point in
                    # (x,y,z) order — bounds the O(n * tris)
                    # triangulation cost per cell; the reference TINs
                    # all ground points but its cells are small
                    step = int(np.ceil(len(gm) / max_ground_points))
                    gm = gm[::step]
                if len(gm) < 3:
                    continue
                pts = np.column_stack([xs[gm] + offx[gm], ys[gm]])
                # per-cell triangulation is irreducibly sequential
                # (Bowyer-Watson insertion) and bounded by
                # max_ground_points; everything else in this fn is one
                # vectorized pass over the whole partition
                tris = delaunay(pts)
                if not tris:
                    continue
                T = np.asarray(tris, dtype=np.int64)
                ca.append(pts[T[:, 0]])
                cb.append(pts[T[:, 1]])
                cc.append(pts[T[:, 2]])
                gz = zs[gm]
                cza.append(gz[T[:, 0]])
                czb.append(gz[T[:, 1]])
                czc.append(gz[T[:, 2]])
            nz = zs
            if ca:
                zg = np.full(len(xs), np.nan)
                interp_corners(
                    xs + offx, ys,
                    np.concatenate(ca), np.concatenate(cb), np.concatenate(cc),
                    np.concatenate(cza), np.concatenate(czb), np.concatenate(czc),
                    zg,
                )
                nz = np.where(np.isnan(zg), zs, np.maximum(0.0, zs - zg))
            res = df.iloc[order].copy()
            res["z"] = nz
        if drop_negative:
            res = res[res["z"] >= 0]
        if reduce_fn is not None:
            res = reduce_fn(res)
        return res

    return grouped_map(points, [cell_col], per_cell, num_parts=num_parts)


# ---------------------------------------------------------------------------
# R6 simple kriging (batch variogram fit replaces the reference's Qt
# picker, src/interp/Interpolators.cpp:102-207; SURVEY §2.9 R6)

def spherical_model(h, nugget, sill, rng):
    """The standard spherical semivariance model (the reference's
    kargs.model is user-selected; spherical is its default family)."""
    h = np.asarray(h, dtype=np.float64)
    inside = nugget + (sill - nugget) * (1.5 * h / rng - 0.5 * (h / rng) ** 3)
    return np.where(h <= 0, 0.0, np.where(h < rng, inside, sill))


def fit_variogram(sx, sy, sz, n_bins: int = 15):
    """Empirical semivariogram (all pairs, gamma = (dz)^2/2 —
    Interpolators.cpp:108-120) binned by distance; least-squares fit
    of the spherical model over (nugget, sill, range) via a coarse
    deterministic grid search + refinement."""
    dx = sx[:, None] - sx[None, :]
    dy = sy[:, None] - sy[None, :]
    dist = np.sqrt(dx * dx + dy * dy)
    gamma = (sz[:, None] - sz[None, :]) ** 2 / 2.0
    iu = np.triu_indices(len(sx), k=1)
    d = dist[iu]
    g = gamma[iu]
    dmax = d.max()
    edges = np.linspace(0, dmax * 0.7, n_bins + 1)  # drop the noisy far tail
    bd, bg = [], []
    for i in range(n_bins):
        m = (d >= edges[i]) & (d < edges[i + 1])
        if m.sum() >= 3:
            bd.append(d[m].mean())
            bg.append(g[m].mean())
    bd = np.array(bd)
    bg = np.array(bg)
    sill0 = float(bg.max())
    best = (np.inf, 0.0, sill0, dmax / 2)
    for nug_f in (0.0, 0.05, 0.1, 0.2):
        for sill_f in (0.8, 0.9, 1.0, 1.1):
            for rng_f in (0.2, 0.35, 0.5, 0.7, 0.9):
                nug = nug_f * sill0
                sil = sill_f * sill0
                rg = rng_f * dmax
                err = float(np.sum((spherical_model(bd, nug, sil, rg) - bg) ** 2))
                if err < best[0]:
                    best = (err, nug, sil, rg)
    return best[1], best[2], best[3]


def kriging_at(
    targets: ray.data.Dataset,
    samples: pa.Table,
    x_col: str = "cx",
    y_col: str = "cy",
    out_col: str = "krige_z",
    params: tuple | None = None,
) -> ray.data.Dataset:
    """Ordinary kriging: the (n+1)x(n+1) semivariance system with a
    Lagrange row (Interpolators.cpp:157-178) is built and factorized
    ONCE on the driver (samples are small / broadcast); each batch
    solves for all its targets in one vectorized call."""
    sx = samples["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
    sy = samples["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
    sz = samples["sz"].to_numpy(zero_copy_only=False).astype(np.float64)
    nugget, sill, rng = params or fit_variogram(sx, sy, sz)
    n = len(sx)
    A = np.empty((n + 1, n + 1))
    dxx = np.sqrt((sx[:, None] - sx[None, :]) ** 2 + (sy[:, None] - sy[None, :]) ** 2)
    A[:n, :n] = spherical_model(dxx, nugget, sill, rng)
    A[n, :n] = 1.0
    A[:n, n] = 1.0
    A[n, n] = 0.0
    ref = ray.put((np.linalg.inv(A), sx, sy, sz, (nugget, sill, rng)))

    def fn(t: pa.Table) -> pa.Table:
        Ai, sx_, sy_, sz_, prm = ray.get(ref)
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        d = np.sqrt((x[:, None] - sx_[None, :]) ** 2 + (y[:, None] - sy_[None, :]) ** 2)
        B = np.empty((len(x), len(sx_) + 1))
        B[:, : len(sx_)] = spherical_model(d, *prm)
        B[:, len(sx_)] = 1.0
        W = B @ Ai.T  # (targets, n+1); last col is the Lagrangian
        z = W[:, : len(sx_)] @ sz_
        return t.append_column(out_col, pa.array(z))

    return targets.map_batches(fn, batch_format="pyarrow")
