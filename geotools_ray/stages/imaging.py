"""Image-side stages: footprint/cell encoding and decode/verify.

Decode shapes (M11/ST7):

- `decode_features_batch` — a STATELESS batch fn. Ray fuses it into
  the read task, so the wide `bytes` column never crosses the object
  store: read -> decode -> drop pixels happens inside one task. This
  is the default for codec-style decodes whose setup cost is nil.
- `DecodeStage` — the actor-pool form of the same work, for stages
  whose per-actor setup is expensive (model weights, GPU context).
  Size `concurrency` WELL BELOW the CPU count: a pool reserving every
  CPU starves the read stage and the pipeline serializes (measured:
  concurrency=30 of 32 cpus was 2.3x slower than 24).

Per-row invariant (input_hint): the decoded pixels' perceptual hash
must equal the stored `phash` column — `verify_ok` carries the check.
PSNR-vs-source (>= 40 dB for lossy) is asserted against the generator
in tests, where the source pixels exist.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import cellindex as ci
from ..sources import images as I


def footprint_cells_batch(t: pa.Table, level: int, seed: int = 42) -> pa.Table:
    """Derive (lon, lat) footprints from image_id and append the int64
    cell id at `level` — the tile-assignment core, all vectorized."""
    lon, lat = I.footprint_lonlat(t["image_id"], seed=seed)
    cell = ci.encode(lon, lat, level)
    return (
        t.append_column("lon", pa.array(lon))
        .append_column("lat", pa.array(lat))
        .append_column("cell_id", pa.array(cell))
    )


def decode_features_batch(t: pa.Table) -> pa.Table:
    """decode -> verify (phash recompute == stored phash) -> featurize
    (mean RGB + 4x4 thumbnail brightness) -> DROP pixel bytes.

    Per-image decode is inherently per-row (variable-size payloads);
    the batch amortizes dispatch and numpy does all pixel math."""
    import zlib

    data = t["bytes"].to_pylist()
    stored_ph = t["phash"].to_numpy(zero_copy_only=False)
    n = len(data)
    mean_rgb = np.empty((n, 3))
    phash = np.empty(n, dtype=np.int64)
    # per-image zlib decompress is irreducible; ALL pixel math runs
    # batched per (h, w, fmt) size-group so python touches each image
    # once, numpy does the rest over (group, h, w, 3) stacks
    groups: dict[tuple, list] = {}
    for i in range(n):
        d = data[i]
        tag = d[:4]
        w = int.from_bytes(d[4:8], "little")
        h = int.from_bytes(d[8:12], "little")
        groups.setdefault((tag, h, w), []).append((i, zlib.decompress(d[12:])))
    for (tag, h, w), items in groups.items():
        idx = np.array([i for i, _ in items])
        px = np.frombuffer(b"".join(raw for _, raw in items), dtype=np.uint8).reshape(
            len(items), h, w, 3
        )
        if tag == b"GJPG":
            px = (px.astype(np.uint16) * 5).clip(0, 255).astype(np.uint8)
        elif tag != b"GPNG":
            raise NotImplementedError(f"unknown codec tag {tag!r}")
        mean_rgb[idx] = px.reshape(len(items), -1, 3).mean(axis=1)
        # batched perceptual hash — identical arithmetic to
        # sources.images.perceptual_hash (float64 gray, 8x8 block means)
        gray = px.astype(np.float64).mean(axis=3)
        small = gray.reshape(len(items), 8, h // 8, 8, w // 8).mean(axis=(2, 4))
        bits = small > small.mean(axis=(1, 2))[:, None, None]
        packed = (
            bits.reshape(len(items), 64).astype(np.uint64)
            << np.arange(64, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
        phash[idx] = packed.astype(np.int64)  # same two's-complement map
    ok = phash == stored_ph
    out = t.drop_columns(["bytes"])
    out = (
        out.append_column("mean_r", pa.array(mean_rgb[:, 0]))
        .append_column("mean_g", pa.array(mean_rgb[:, 1]))
        .append_column("mean_b", pa.array(mean_rgb[:, 2]))
        .append_column("verify_ok", pa.array(ok))
    )
    return out


class DecodeStage:
    """Actor-pool wrapper around decode_features_batch (see module
    docstring for when to prefer it over the fused stateless fn)."""

    def __init__(self, verify_psnr: float = 40.0):
        self.verify_psnr = verify_psnr
        self._fn = decode_features_batch  # codec table bound once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        return self._fn(t)
