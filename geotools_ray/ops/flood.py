"""R10: the `flood` tool's driver pipeline (src/flood.cpp:459-497) —
iterate elevation steps; per step: flood-fill basins from the DEM
(W4), find spill points between basins (W5); emit the per-step basin
table and the spill CSV rows (src/flood.cpp:257-271, 404-419).

R7: `rastfit` (src/rastfit.cpp:148-197) — sample the difference
between an adjust raster and a reference raster at K deterministic
sample cells (O4), interpolate a correction surface (R2-R6 strategy
string, src/rastfit.cpp:276-291), subtract it from the adjust raster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..kernels import raster as KR


def flood_sweep(
    dem: np.ndarray,
    start: float,
    end: float,
    step: float,
    max_spill_dist: float = 10.0,
    nodata: float = KR.NODATA,
):
    """-> (basins_df, spills_df). The per-elevation fills are
    independent — at scale each elevation step is one task over the
    tile Dataset (flood_label_tiles); here the driver loop mirrors the
    reference's structure (src/flood.cpp:470-493)."""
    basins_rows = []
    spill_rows = []
    work = np.where(dem == nodata, np.inf, dem)
    elev = start
    while elev <= end + 1e-9:
        labels = KR.flood_fill_label(work, elev)
        ids, counts = np.unique(labels[labels > 0], return_counts=True)
        for i, n in zip(ids.tolist(), counts.tolist()):
            basins_rows.append({"elevation": elev, "basin": int(i), "area": int(n)})
        for id1, c1, r1, id2, c2, r2, dist in KR.spill_points(labels, max_spill_dist):
            # CSV fields: ID1, x1, y1, ID2, x2, y2, midpoint, distance
            # (src/flood.cpp:404-419)
            spill_rows.append(
                {
                    "elevation": elev,
                    "id1": id1, "x1": c1, "y1": r1,
                    "id2": id2, "x2": c2, "y2": r2,
                    "mid_x": (c1 + c2) / 2.0, "mid_y": (r1 + r2) / 2.0,
                    "dist": dist,
                }
            )
        elev += step
    return (
        pd.DataFrame(basins_rows, columns=["elevation", "basin", "area"]),
        pd.DataFrame(
            spill_rows,
            columns=["elevation", "id1", "x1", "y1", "id2", "x2", "y2", "mid_x", "mid_y", "dist"],
        ),
    )


def rastfit_correction(
    adjust: np.ndarray,
    reference: np.ndarray,
    n_samples: int = 100,
    method: str = "idw",
    nodata: float = KR.NODATA,
) -> np.ndarray:
    """R7: sample diffs at deterministic cells where BOTH rasters are
    valid (O4 hash sampling — rank valid cells by the multiplicative
    hash of their row-major index, take the first n; SQL-reproducible,
    src/rastfit.cpp:86-119), fit/interpolate the correction surface
    with the chosen interpolator, return adjust - correction."""
    import ray

    from .interp import avg_at, idw_at, kriging_at, natural_neighbour_at, planar_at

    h, w = adjust.shape
    valid = (adjust != nodata) & (reference != nodata)
    rs, cs = np.nonzero(valid)
    if len(rs) == 0:
        return adjust.copy()
    idx = rs.astype(np.int64) * w + cs.astype(np.int64)
    order = np.lexsort((idx, (idx * 2654435761) % 4294967296))
    pick = order[: min(n_samples, len(rs))]
    sr, sc = rs[pick], cs[pick]
    diffs = adjust[sr, sc] - reference[sr, sc]
    samples = pa.table(
        {"sx": sc.astype(np.float64), "sy": sr.astype(np.float64), "sz": diffs}
    )
    # evaluate the correction at every valid cell (same mask as above)
    tr, tc = rs, cs
    targets = ray.data.from_arrow(
        pa.table({"i": np.arange(len(tr)), "cx": tc.astype(np.float64), "cy": tr.astype(np.float64)})
    )
    fn = {"idw": idw_at, "avg": avg_at, "planar": planar_at, "kriging": kriging_at,
          "nn": natural_neighbour_at}[method]
    out_col = {"idw": "idw_z", "avg": "avg_z", "planar": "plane_z", "kriging": "krige_z",
               "nn": "nn_z"}[method]
    kw = {"exact_hits": True} if method == "idw" else {}
    res = fn(targets, samples, **kw).to_pandas().sort_values("i")
    corrected = adjust.copy()
    corrected[tr, tc] = adjust[tr, tc] - res[out_col].to_numpy()
    return corrected
