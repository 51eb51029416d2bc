"""S10: NRCan GVB (NTV2_3D) velocity-grid -> GeoTIFF converter — the
Ray-free restatement of scripts/gvb2tif.py:36-120 (reference), using
the in-repo TIFF writer instead of GDAL.

Format (Craymer 2014, NTV2_3D Grid File Format): 24-byte header
records (8-char name + 16-byte value: int32[4] / char[8]+pad /
float64[2]), in the order 3 int, 4 str, 4 dbl, 4 str, 6 dbl, 1 int;
then rows*cols*6 float32 records (X/Y/Z shift mm + accuracies),
stored south-up/east-left (flipud+fliplr to north-up)."""

from __future__ import annotations

import struct

import numpy as np


def read_gvb(path: str):
    """-> (data (6, rows, cols) float32 north-up, geotransform)."""
    header: dict = {}
    with open(path, "rb") as f:

        def name() -> str:
            return f.read(8).decode("ascii", "replace").strip()

        def ihead():
            n = name()
            header[n] = struct.unpack("<4i", f.read(16))[0]

        def shead():
            n = name()
            header[n] = f.read(8).decode("ascii", "replace").strip()
            f.read(8)

        def dhead():
            n = name()
            header[n] = struct.unpack("<2d", f.read(16))[0]

        for _ in range(3):
            ihead()
        for _ in range(4):
            shead()
        for _ in range(4):
            dhead()
        for _ in range(4):
            shead()
        for _ in range(6):
            dhead()
        ihead()

        # round, don't truncate: (18000 - 0) / 0.3 is 59999.99999999999
        # in float64, and int() truncation would drop a whole grid row
        # and silently misalign every band (identical to the reference
        # formula for all exactly-representable quotients)
        rows = int(round((header["N_LAT"] - header["S_LAT"]) / header["LAT_INC"])) + 1
        cols = int(round((header["W_LON"] - header["E_LON"]) / header["LON_INC"])) + 1
        raw = np.fromfile(f, dtype="<f4", count=rows * cols * 6)
    data = np.fliplr(np.flipud(raw.reshape(rows, cols, 6)))
    bands = np.moveaxis(data, 2, 0)
    # arcsec -> degrees; W_LON is positive-west in the grid header
    gt = (
        -header["W_LON"] / 3600.0,
        header["LON_INC"] / 3600.0,
        0.0,
        header["N_LAT"] / 3600.0,
        0.0,
        -header["LAT_INC"] / 3600.0,
    )
    return bands, gt


def gvb_to_tiff(src: str, dst: str) -> None:
    from .tiff import write_tiff

    bands, gt = read_gvb(src)
    write_tiff(dst, bands, gt)


def write_gvb(path: str, bands: np.ndarray, s_lat: float, n_lat: float,
              w_lon: float, e_lon: float, lat_inc: float, lon_inc: float) -> None:
    """Synthesize a GVB file (tests + fixtures): bands is (6, rows,
    cols) NORTH-UP; written in the format's south-up/east-left order."""
    S, rows, cols = bands.shape
    assert S == 6

    def nm(s: str) -> bytes:
        return s.encode("ascii").ljust(8)

    with open(path, "wb") as f:
        for n, v in (("NUM_OREC", 11), ("NUM_SREC", 11), ("NUM_FILE", 1)):
            f.write(nm(n) + struct.pack("<4i", v, 0, 0, 0))
        for n, v in (("GS_TYPE", "SECONDS"), ("VERSION", "v1"),
                     ("SYSTEM_F", "NAD83"), ("SYSTEM_T", "NAD83")):
            f.write(nm(n) + v.encode("ascii").ljust(8) + b"\0" * 8)
        for n, v in (("MAJOR_F", 6378137.0), ("MINOR_F", 6356752.314),
                     ("MAJOR_T", 6378137.0), ("MINOR_T", 6356752.314)):
            f.write(nm(n) + struct.pack("<2d", v, 0.0))
        for n, v in (("SUB_NAME", "ALL"), ("PARENT", "NONE"),
                     ("CREATED", "20140101"), ("UPDATED", "20140101")):
            f.write(nm(n) + v.encode("ascii").ljust(8) + b"\0" * 8)
        for n, v in (("S_LAT", s_lat), ("N_LAT", n_lat), ("E_LON", e_lon),
                     ("W_LON", w_lon), ("LAT_INC", lat_inc), ("LON_INC", lon_inc)):
            f.write(nm(n) + struct.pack("<2d", v, 0.0))
        f.write(nm("GS_COUNT") + struct.pack("<4i", rows * cols, 0, 0, 0))
        stored = np.flipud(np.fliplr(np.moveaxis(bands, 0, 2)))
        f.write(stored.astype("<f4").tobytes())
