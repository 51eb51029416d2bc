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
) -> ray.data.Dataset:
    """IDW value at each target row's (x_col, y_col): weights are
    1/(d2^exponent) with d2 the SQUARED distance; neighbours=0 -> all
    samples, else the k nearest (ranked by d2)."""
    ref = _broadcast_samples(samples)

    def fn(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        dx = x[:, None] - s["x"][None, :]
        dy = y[:, None] - s["y"][None, :]
        d2 = dx * dx + dy * dy
        w = 1.0 / np.power(d2, exponent)
        if neighbours and neighbours < len(s["x"]):
            # keep only the k nearest per target; stable sort ties on
            # sample position so SQL row_number oracles match
            idx = np.argsort(d2, axis=1, kind="stable")[:, :neighbours]
            rows = np.arange(len(x))[:, None]
            z = np.sum(s["z"][idx] * w[rows, idx], axis=1) / np.sum(w[rows, idx], axis=1)
        else:
            z = (w @ s["z"]) / w.sum(axis=1)
        return t.append_column(out_col, pa.array(z))

    return targets.map_batches(fn, batch_format="pyarrow")


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
    cx, cy = x.mean(), y.mean()
    A = np.column_stack([x - cx, y - cy, np.ones(len(x))])
    params, *_ = np.linalg.lstsq(A, z, rcond=None)
    return float(params[0]), float(params[1]), float(params[2]), float(cx), float(cy)


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
) -> ray.data.Dataset:
    """Per cell: TIN the ground points (cls == 2), subtract the
    barycentric ground surface under each point, clamp at 0
    (src/pointnormalize.cpp:126-152). Points in cells with < 3 ground
    points keep z unchanged minus nothing (reference skips them).
    The cell partitioning must include enough context — callers should
    assign cells with a halo (cell + ring) when surfaces span cells."""

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby(cell_col, sort=False):
            # determinism: triangulation depends on insertion order for
            # cocircular points — fix the order regardless of shuffle
            g = g.sort_values(["x", "y", "z"])
            gnd = g[g["cls"] == 2]
            if len(gnd) > max_ground_points:
                # deterministic thinning: every k-th ground point in
                # (x,y,z) order — bounds the O(n * tris) triangulation
                # cost per cell; the reference TINs all ground points
                # but its cells are small (res 10 default)
                step = int(np.ceil(len(gnd) / max_ground_points))
                gnd = gnd.iloc[::step]
            g = g.copy()
            if len(gnd) >= 3:
                zg = interp_tin(
                    g["x"].to_numpy(),
                    g["y"].to_numpy(),
                    gnd[["x", "y"]].to_numpy(),
                    gnd["z"].to_numpy(),
                    nodata=np.nan,
                )
                nz = g["z"].to_numpy() - zg
                nz = np.where(np.isnan(zg), g["z"].to_numpy(), np.maximum(0.0, nz))
                g["z"] = nz
            out.append(g)
        res = pd.concat(out) if out else df
        if drop_negative:
            res = res[res["z"] >= 0]
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
