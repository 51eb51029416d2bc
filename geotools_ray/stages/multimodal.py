"""Multimodal columns (audio / video) — opaque binary payloads with
typed metadata, processed by actor-pool map_batches stages.

The decode libraries (ffmpeg/librosa-style codecs) are NOT in this
container, so the codec call is STUBBED behind NotImplementedError
with a deterministic-fake fallback — but the Ray-side plumbing
(schemas, batch sizing, actor signature, output layout) is real and
tested, mirroring the image DecodeStage.

Schemas:
  audio: (clip_id:string, bytes:binary, sample_rate:int32,
          n_samples:int64, fmt:string)
  video: (video_id:string, bytes:binary, w:int32, h:int32, fps:float,
          n_frames:int32, fmt:string)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

AUDIO_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("fmt", pa.string()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fps", pa.float64()),
        ("n_frames", pa.int32()),
        ("fmt", pa.string()),
    ]
)


def _decode_audio_real(data: bytes, fmt: str) -> np.ndarray:
    raise NotImplementedError(
        f"audio codec {fmt!r} unavailable in this container (no libsndfile/ffmpeg)"
    )


def _decode_video_frame_real(data: bytes, fmt: str, frame: int) -> np.ndarray:
    raise NotImplementedError(
        f"video codec {fmt!r} unavailable in this container (no ffmpeg)"
    )


class AudioFeatureStage:
    """Actor pool: decode audio -> loudness/zero-crossing features.

    Keep batch_size small: a 10 s 16 kHz mono clip decodes to 640 KB
    float32 — 256 rows x concurrency already holds ~160 MB decoded.
    With deterministic_fake=True (tests/bench), a seeded waveform
    stands in for the decoder; the feature math and plumbing are real.
    """

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake

    def _decode(self, data: bytes, fmt: str, n: int, sr: int) -> np.ndarray:
        if self.fake:
            seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little") % (2**31)
            return np.random.RandomState(seed).standard_normal(min(n, 65536))
        return _decode_audio_real(data, fmt)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        rms = np.empty(n)
        zcr = np.empty(n)
        data = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        ns = t["n_samples"].to_numpy(zero_copy_only=False)
        srs = t["sample_rate"].to_numpy(zero_copy_only=False)
        for i in range(n):
            w = self._decode(data[i], fmts[i], int(ns[i]), int(srs[i]))
            rms[i] = float(np.sqrt(np.mean(w * w)))
            zcr[i] = float(np.mean(np.signbit(w[:-1]) != np.signbit(w[1:])))
        return (
            t.drop_columns(["bytes"])
            .append_column("rms", pa.array(rms))
            .append_column("zcr", pa.array(zcr))
        )


class VideoFrameSampleStage:
    """Actor pool: sample every `stride`-th frame, extract per-frame
    mean luma; emits one row per (video, sampled frame) — flat-map
    layout so frame rows shuffle independently of the video blob."""

    def __init__(self, stride: int = 30, deterministic_fake: bool = False):
        self.stride = stride
        self.fake = deterministic_fake

    def _frame(self, data: bytes, fmt: str, w: int, h: int, idx: int) -> np.ndarray:
        if self.fake:
            seed = (int.from_bytes(data[:8].ljust(8, b"\0"), "little") + idx) % (2**31)
            return np.random.RandomState(seed).randint(0, 256, (min(h, 32), min(w, 32)))
        return _decode_video_frame_real(data, fmt, idx)

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_frame, out_luma = [], [], []
        data = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        ids = t["video_id"].to_pylist()
        ws = t["w"].to_numpy(zero_copy_only=False)
        hs = t["h"].to_numpy(zero_copy_only=False)
        nf = t["n_frames"].to_numpy(zero_copy_only=False)
        for i in range(len(t)):
            for f in range(0, int(nf[i]), self.stride):
                fr = self._frame(data[i], fmts[i], int(ws[i]), int(hs[i]), f)
                out_id.append(ids[i])
                out_frame.append(f)
                out_luma.append(float(fr.mean()))
        return pa.table(
            {
                "video_id": pa.array(out_id),
                "frame": pa.array(out_frame, pa.int32()),
                "mean_luma": pa.array(out_luma),
            }
        )


def generate_audio_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic audio rows (payload bytes seed the fake
    decoder) — the driver-query input analog of generate_image_table."""
    rng = np.random.RandomState(seed)
    rows = {
        "clip_id": [f"clip{i:06d}" for i in range(n)],
        "bytes": [rng.bytes(64) for _ in range(n)],
        "sample_rate": pa.array(np.full(n, 16000, dtype=np.int32)),
        "n_samples": pa.array(rng.randint(8000, 64000, n).astype(np.int64)),
        "fmt": ["wav"] * n,
    }
    return pa.Table.from_pydict(rows, schema=AUDIO_SCHEMA)


def generate_video_table(n: int, seed: int = 0) -> pa.Table:
    rng = np.random.RandomState(seed)
    rows = {
        "video_id": [f"v{i:06d}" for i in range(n)],
        "bytes": [rng.bytes(32) for _ in range(n)],
        "w": pa.array(np.full(n, 64, dtype=np.int32)),
        "h": pa.array(np.full(n, 48, dtype=np.int32)),
        "fps": pa.array(np.full(n, 30.0)),
        "n_frames": pa.array(rng.randint(30, 240, n).astype(np.int32)),
        "fmt": ["h264"] * n,
    }
    return pa.Table.from_pydict(rows, schema=VIDEO_SCHEMA)
