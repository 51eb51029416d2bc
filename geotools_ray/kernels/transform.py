"""Datum-transform kernels (M6 / ST1 / ST2): Helmert 14-param epoch
transform, NAD83 velocity-grid shift, curvature conversion — exact
reference semantics from src/las2csrs.cpp, including its sequential
in-place update in epochTransform (:260-264: the updated x feeds the
y equation, and updated x,y feed z — reproduced bug-for-bug; the
Python twin scripts/nad83csrs.py:257-259 shares the quirk, and the
published test vectors bake it in).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def mas2rad(x):
    """las2csrs.cpp:75-77."""
    return x * 4.84813681 / 1000000000.0


@dataclass
class HelmertParams:
    epoch: float
    tx: float
    ty: float
    tz: float
    rx: float
    ry: float
    rz: float
    d: float
    dtx: float
    dty: float
    dtz: float
    drx: float
    dry: float
    drz: float
    dd: float


def load_helmert(itrf_csv_path: str, frame: str) -> HelmertParams:
    """Parse itrf.csv (las2csrs.cpp:296-350). Values are parsed as
    float32 by the reference (`float` locals) — reproduced via
    np.float32 rounding."""
    with open(itrf_csv_path) as f:
        for line in f:
            if not line.strip() or line[0] in "/ ":
                continue
            parts = line.split()
            if parts[0] != frame:
                continue
            vals = [float(np.float32(v)) for v in parts[2:17]]
            (epoch, tx, ty, tz, rx, ry, rz, d, dtx, dty, dtz, drx, dry, drz, dd) = vals
            return HelmertParams(
                epoch, tx, ty, tz, rx, ry, rz, d / 1e9, dtx, dty, dtz, drx, dry, drz, dd / 1e9
            )
    raise ValueError(f"frame {frame!r} not in {itrf_csv_path}")


def epoch_transform(p: HelmertParams, x, y, z, dt: float):
    """las2csrs.cpp:236-264 — NOTE the sequential update: y uses the
    ALREADY-TRANSFORMED x; z uses transformed x and y."""
    txt = p.tx + p.dtx * dt
    tyt = p.ty + p.dty * dt
    tzt = p.tz + p.dtz * dt
    dst = 1.0 + (p.d + p.dd * dt)
    rxt = mas2rad(p.rx + p.drx * dt)
    ryt = mas2rad(p.ry + p.dry * dt)
    rzt = mas2rad(p.rz + p.drz * dt)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    x2 = txt + dst * x + (-rzt) * y + ryt * z
    y2 = tyt + rzt * x2 + dst * y + (-rxt) * z      # uses x2 (reference quirk)
    z2 = tzt + (-ryt) * x2 + rxt * y2 + dst * z     # uses x2, y2
    return x2, y2, z2


def binterp(grid: np.ndarray, c, r, c0, r0, c1, r1):
    """_binterp (las2csrs.cpp:36-40), vectorized; grid is (H, W)."""
    g = grid
    x1 = (c1 - c) / (c1 - c0) * g[r0, c0] + (c - c0) / (c1 - c0) * g[r0, c1]
    x2 = (c1 - c) / (c1 - c0) * g[r1, c0] + (c - c0) / (c1 - c0) * g[r1, c1]
    return (r1 - r) / (r1 - r0) * x1 + (r - r0) / (r1 - r0) * x2


class ShiftGrid:
    """ST1: the NAD83(CSRS) velocity grid, loaded once per actor.
    bands: (dx, dy, dz) in mm/yr; geotransform tg as GDAL's 6-tuple."""

    def __init__(self, bands: np.ndarray, tg):
        assert bands.ndim == 3 and bands.shape[0] >= 3
        self.xg = bands[0].astype(np.float32)
        self.yg = bands[1].astype(np.float32)
        self.zg = bands[2].astype(np.float32)
        self.tg = tg
        self.h, self.w = self.xg.shape

    @classmethod
    def from_tif(cls, path: str) -> "ShiftGrid":
        from ..sources.tiff import read_tiff

        bands, tg = read_tiff(path)
        return cls(bands, tg)

    def interpolate(self, lon_rad, lat_rad):
        """las2csrs.cpp:140-166: bilinear in grid space, clamped;
        returns (dx, dy, dz) in METERS (grid holds mm)."""
        c = (np.rad2deg(lon_rad) - self.tg[0]) / self.tg[1]
        r = (np.rad2deg(lat_rad) - self.tg[3]) / self.tg[5]
        # genuinely clamped: points outside grid coverage take the edge
        # cell's value (the C reference reads out-of-bounds memory there
        # — undefined — so edge extension is OUR defined behavior;
        # interior points are untouched and stay vector-pinned).
        # Clamp BOTH the fractional coordinate and the cell pair:
        # c0 in [0, w-2] with c1 = c0+1 keeps the binterp denominators
        # nonzero (c0 == c1 used to 0/0 -> NaN on the last column) and
        # prevents negative-index wraparound to the opposite grid edge.
        c = np.clip(c, 0.0, self.w - 1.0)
        r = np.clip(r, 0.0, self.h - 1.0)
        c0 = np.clip(c.astype(np.int64), 0, self.w - 2)  # C cast: trunc
        r0 = np.clip(r.astype(np.int64), 0, self.h - 2)
        c1 = c0 + 1
        r1 = r0 + 1
        dx = binterp(self.xg, c, r, c0, r0, c1, r1) / 1000.0
        dy = binterp(self.yg, c, r, c0, r0, c1, r1) / 1000.0
        dz = binterp(self.zg, c, r, c0, r0, c1, r1) / 1000.0
        return dx, dy, dz


def shift2latlon(dx, dy, lat, h, a: float, e2: float):
    """las2csrs.cpp:43-71: metric shifts -> angular shifts using the
    meridional (m) and parallel (n) radii of curvature."""
    sinl = np.sin(lat)
    m = a * (1.0 - e2) / np.power(1.0 - e2 * sinl * sinl, 1.5)
    n = a / np.power(1.0 - e2 * sinl * sinl, 0.5)
    r = n * np.cos(lat)
    dlon = dx / (r + h)
    dlat = dy / (m + h)
    return dlat, dlon


def transform_points(
    x, y, z,
    frame: str,
    efrom: float,
    eto: float,
    from_epsg: int,
    to_epsg: int,
    helmert: HelmertParams,
    shift_grid: ShiftGrid | None,
):
    """The full las2csrs pipeline (src/las2csrs.cpp:408-504):
    src UTM -> geodetic -> ECEF(GRS80) -> Helmert @ (efrom - epoch) ->
    [epoch change: ECEF -> geodetic, velocity-grid shift * dt applied
    in lat/lon/h] -> target UTM."""
    from . import proj as P

    src = P.utm(from_epsg)
    dst = P.utm(to_epsg)
    src_ellps = P.EPSG_UTM[from_epsg][0]

    lon, lat = src.inverse(x, y)
    ex, ey, ez = P.geodetic_to_ecef(lon, lat, z, ellps=src_ellps)
    ex, ey, ez = epoch_transform(helmert, ex, ey, ez, efrom - helmert.epoch)

    if efrom != eto:
        if shift_grid is None:
            raise ValueError("epoch change requires the shift grid")
        lon0, lat0, h0 = P.ecef_to_geodetic(ex, ey, ez, ellps="GRS80")
        dx, dy, dz = shift_grid.interpolate(lon0, lat0)
        a, e2 = P.ellipsoid("GRS80")  # projTo spheroid (CSRS = GRS80)
        dlat, dlon = shift2latlon(dx, dy, lat0, h0, a, e2)
        dt = eto - efrom
        lon0 = lon0 + dlon * dt
        lat0 = lat0 + dlat * dt
        h0 = h0 + dz * dt
        ox, oy = dst.forward(lon0, lat0)
        return ox, oy, h0
    lon1, lat1, h1 = P.ecef_to_geodetic(ex, ey, ez, ellps="GRS80")
    ox, oy = dst.forward(lon1, lat1)
    return ox, oy, h1
