"""Pure-numpy map projections matching PROJ.4's tmerc/geocent to
sub-mm, so the datum-transform pipeline (M6) reproduces the
reference's las2csrs outputs (tests/_test_las2csrs.py vectors, 1 mm)
without a proj dependency.

Transverse Mercator: the Evenden/Snyder series exactly as PROJ.4's
pj_tmerc.c / pj_mlfn.c (public-domain formulas); geodetic<->ECEF:
closed-form forward, iterative inverse (converges < 0.01 mm).
"""

from __future__ import annotations

import numpy as np

# ellipsoids: (a, 1/f)
ELLIPSOIDS = {
    "GRS80": (6378137.0, 298.257222101),
    "WGS84": (6378137.0, 298.257223563),
}


def ellipsoid(name: str):
    a, rf = ELLIPSOIDS[name]
    f = 1.0 / rf
    es = f * (2 - f)
    return a, es


# EPSG codes used by the reference test vectors -> (ellps, utm zone, north)
EPSG_UTM = {
    26910: ("GRS80", 10),  # NAD83 / UTM 10N
    26912: ("GRS80", 12),  # NAD83 / UTM 12N
    32611: ("WGS84", 11),  # WGS84 / UTM 11N
    2955: ("GRS80", 11),   # NAD83(CSRS) / UTM 11N
    2956: ("GRS80", 12),   # NAD83(CSRS) / UTM 12N
    3157: ("GRS80", 10),   # NAD83(CSRS) / UTM 10N
}

# pj_mlfn.c coefficients
_C00, _C02, _C04, _C06, _C08 = 1.0, 0.25, 0.046875, 0.01953125, 0.01068115234375
_C22 = 0.75
_C44, _C46, _C48 = 0.46875, 0.01302083333333333333, 0.00712076822916666666
_C66, _C68 = 0.36458333333333333333, 0.00569661458333333333
_C88 = 0.3076171875

# pj_tmerc.c FC constants NEST (FC3*FC5*FC7 = 1/5040 etc.):
# FCn = 1/((n-1)*n)
_FC1, _FC2, _FC3, _FC4 = 1.0, 0.5, 1.0 / 6.0, 1.0 / 12.0
_FC5, _FC6, _FC7, _FC8 = 1.0 / 20.0, 1.0 / 30.0, 1.0 / 42.0, 1.0 / 56.0


def _enfn(es: float) -> np.ndarray:
    en = np.empty(5)
    en[0] = _C00 - es * (_C02 + es * (_C04 + es * (_C06 + es * _C08)))
    en[1] = es * (_C22 - es * (_C04 + es * (_C06 + es * _C08)))
    t = es * es
    en[2] = t * (_C44 - es * (_C46 + es * _C48))
    t *= es
    en[3] = t * (_C66 - es * _C68)
    en[4] = t * es * _C88
    return en


def _mlfn(phi, sphi, cphi, en):
    cphi = cphi * sphi
    sphi = sphi * sphi
    return en[0] * phi - cphi * (en[1] + sphi * (en[2] + sphi * (en[3] + sphi * en[4])))


def _inv_mlfn(arg, es, en):
    k = 1.0 / (1.0 - es)
    phi = np.array(arg, dtype=np.float64, copy=True)
    for _ in range(15):
        s = np.sin(phi)
        t = 1.0 - es * s * s
        t = (_mlfn(phi, s, np.cos(phi), en) - arg) * (t * np.sqrt(t)) * k
        phi -= t
        if np.max(np.abs(t)) < 1e-13:
            break
    return phi


class TMerc:
    """UTM-style transverse mercator (pj_tmerc.c ellipsoidal path)."""

    def __init__(self, ellps: str, zone: int, k0: float = 0.9996,
                 x0: float = 500000.0, y0: float = 0.0):
        self.a, self.es = ellipsoid(ellps)
        self.esp = self.es / (1.0 - self.es)
        self.k0 = k0
        self.x0 = x0
        self.y0 = y0
        self.lam0 = np.deg2rad(zone * 6 - 183)
        self.en = _enfn(self.es)
        self.ml0 = _mlfn(0.0, 0.0, 1.0, self.en)

    def forward(self, lon, lat):
        """radians -> meters (easting, northing)."""
        lam = np.asarray(lon, dtype=np.float64) - self.lam0
        phi = np.asarray(lat, dtype=np.float64)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        t = t * t
        al = cosphi * lam
        als = al * al
        al = al / np.sqrt(1.0 - self.es * sinphi * sinphi)
        n = self.esp * cosphi * cosphi
        x = self.k0 * al * (
            _FC1
            + _FC3 * als * (
                1.0 - t + n
                + _FC5 * als * (
                    5.0 + t * (t - 18.0) + n * (14.0 - 58.0 * t)
                    + _FC7 * als * (61.0 + t * (t * (179.0 - t) - 479.0))
                )
            )
        )
        y = self.k0 * (
            _mlfn(phi, sinphi, cosphi, self.en) - self.ml0
            + sinphi * al * lam * _FC2 * (
                1.0
                + _FC4 * als * (
                    5.0 - t + n * (9.0 + 4.0 * n)
                    + _FC6 * als * (
                        61.0 + t * (t - 58.0) + n * (270.0 - 330.0 * t)
                        + _FC8 * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))
                    )
                )
            )
        )
        return x * self.a + self.x0, y * self.a + self.y0

    def inverse(self, x, y):
        """meters -> radians (lon, lat)."""
        xx = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yy = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        phi = _inv_mlfn(self.ml0 + yy / self.k0, self.es, self.en)
        # pj_tmerc.c pole branch: |phi| >= HALFPI clamps to the pole
        # with lam = 0 — without it the 1/cosphi below amplifies by
        # ~1e16 and out-of-domain northings return garbage longitude
        pole = np.abs(phi) >= np.pi / 2
        sinphi = np.sin(phi)
        cosphi = np.where(pole, 1.0, np.cos(phi))
        t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        n = self.esp * cosphi * cosphi
        con = 1.0 - self.es * sinphi * sinphi
        d = xx * np.sqrt(con) / self.k0
        con = con * t
        t = t * t
        ds = d * d
        lat = phi - (con * ds / (1.0 - self.es)) * _FC2 * (
            1.0
            - ds * _FC4 * (
                5.0 + t * (3.0 - 9.0 * n) + n * (1.0 - 4.0 * n)
                - ds * _FC6 * (
                    61.0 + t * (90.0 - 252.0 * n + 45.0 * t) + 46.0 * n
                    - ds * _FC8 * (1385.0 + t * (3633.0 + t * (4095.0 + 1574.0 * t)))
                )
            )
        )
        lam = d * (
            _FC1
            - ds * _FC3 * (
                1.0 + 2.0 * t + n
                - ds * _FC5 * (
                    5.0 + t * (28.0 + 24.0 * t + 8.0 * n) + 6.0 * n
                    - ds * _FC7 * (61.0 + t * (662.0 + t * (1320.0 + 720.0 * t)))
                )
            )
        ) / cosphi
        lat = np.where(pole, np.where(yy < 0.0, -np.pi / 2, np.pi / 2), lat)
        lam = np.where(pole, 0.0, lam)
        return lam + self.lam0, lat


def utm(epsg: int) -> TMerc:
    ellps, zone = EPSG_UTM[epsg]
    return TMerc(ellps, zone)


def geodetic_to_ecef(lon, lat, h, ellps: str = "GRS80"):
    """radians + meters -> ECEF meters."""
    a, es = ellipsoid(ellps)
    sinphi = np.sin(lat)
    cosphi = np.cos(lat)
    n = a / np.sqrt(1.0 - es * sinphi * sinphi)
    x = (n + h) * cosphi * np.cos(lon)
    y = (n + h) * cosphi * np.sin(lon)
    z = (n * (1.0 - es) + h) * sinphi
    return x, y, z


def ecef_to_geodetic(x, y, z, ellps: str = "GRS80"):
    """ECEF meters -> (lon, lat) radians + h meters; iterative lat
    (converges far below 0.01 mm)."""
    a, es = ellipsoid(ellps)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lon = np.arctan2(y, x)
    p = np.sqrt(x * x + y * y)
    lat = np.arctan2(z, p * (1.0 - es))
    for _ in range(12):
        sinphi = np.sin(lat)
        n = a / np.sqrt(1.0 - es * sinphi * sinphi)
        h = p / np.cos(lat) - n
        new = np.arctan2(z, p * (1.0 - es * n / (n + h)))
        if np.max(np.abs(new - lat)) < 1e-14:
            lat = new
            break
        lat = new
    sinphi = np.sin(lat)
    n = a / np.sqrt(1.0 - es * sinphi * sinphi)
    h = p / np.cos(lat) - n
    return lon, lat, h
