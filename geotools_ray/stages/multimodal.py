"""Multimodal columns (audio / video) — opaque binary payloads with
typed metadata, processed by actor-pool map_batches stages.

Round 3: the payloads are REAL interchange formats now —
RIFF/WAVE PCM16 audio and YUV4MPEG2 (Cmono) video, parsed by the
from-scratch spec codecs in sources/codecs.py (no
libsndfile/ffmpeg in this container, but the bytes these tables carry
are files any standard tool reads). Compressed codecs (mp3/h264/...)
remain NotImplementedError at the same seam; the deterministic-fake
fallback is kept for plumbing tests only.

Schemas:
  audio: (clip_id:string, bytes:binary, sample_rate:int32,
          n_samples:int64, fmt:string)
  video: (video_id:string, bytes:binary, w:int32, h:int32, fps:float,
          n_frames:int32, fmt:string)

Scale notes (100-TB lens): the video stage samples every `stride`-th
frame via the y4m fixed-frame-size O(1) seek — reading 1/stride of
each payload's bytes, not decoding the whole clip; batch sizes stay
small because a decoded clip is the large object, and the flat-map
output layout (one row per sampled frame) lets frame rows shuffle
independently of the source blob.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources import codecs

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
    if fmt == "wav":
        samples, _ = codecs.decode_wav(data)
        return samples if samples.ndim == 1 else samples.mean(axis=1)
    raise NotImplementedError(
        f"audio codec {fmt!r} unavailable in this container (no libsndfile/ffmpeg)"
    )


class AudioFeatureStage:
    """Actor pool: decode audio -> loudness/zero-crossing features.

    Keep batch_size small: a 10 s 16 kHz mono clip decodes to 640 KB
    float32 — 256 rows x concurrency already holds ~160 MB decoded.
    fmt="wav" rows run the real RIFF/PCM parser; deterministic_fake
    (plumbing tests only) seeds a waveform from the payload bytes.
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
    layout so frame rows shuffle independently of the video blob.

    fmt="y4m" rows use the real YUV4MPEG2 parser: the stream header is
    parsed once per video and each sampled frame is an O(1) seek into
    the fixed-size frame array — bytes for skipped frames are never
    touched."""

    def __init__(self, stride: int = 30, deterministic_fake: bool = False):
        self.stride = stride
        self.fake = deterministic_fake

    def _fake_frame(self, data: bytes, w: int, h: int, idx: int) -> np.ndarray:
        seed = (int.from_bytes(data[:8].ljust(8, b"\0"), "little") + idx) % (2**31)
        return np.random.RandomState(seed).randint(0, 256, (min(h, 32), min(w, 32)))

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_frame, out_luma = [], [], []
        data = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        ids = t["video_id"].to_pylist()
        ws = t["w"].to_numpy(zero_copy_only=False)
        hs = t["h"].to_numpy(zero_copy_only=False)
        nf = t["n_frames"].to_numpy(zero_copy_only=False)
        for i in range(len(t)):
            if self.fake:
                for f in range(0, int(nf[i]), self.stride):
                    fr = self._fake_frame(data[i], int(ws[i]), int(hs[i]), f)
                    out_id.append(ids[i])
                    out_frame.append(f)
                    out_luma.append(float(fr.mean()))
                continue
            if fmts[i] != "y4m":
                raise NotImplementedError(
                    f"video codec {fmts[i]!r} unavailable in this container (no ffmpeg)"
                )
            info = codecs.y4m_info(data[i])
            for f in range(0, info["n_frames"], self.stride):
                fr = codecs.decode_y4m_frame(data[i], f, info)
                out_id.append(ids[i])
                out_frame.append(f)
                # luma plane mean for mono/444 alike (plane 0 is Y)
                out_luma.append(float(fr.reshape(info["planes"], -1)[0].mean())
                                if info["planes"] > 1 else float(fr.mean()))
        return pa.table(
            {
                "video_id": pa.array(out_id),
                "frame": pa.array(out_frame, pa.int32()),
                "mean_luma": pa.array(out_luma),
            }
        )


def _audio_waveform(i: int, n: int, sr: int) -> np.ndarray:
    """Deterministic per-clip waveform: two seeded sines + noise."""
    rng = np.random.RandomState(100_000 + i)
    t = np.arange(n) / sr
    f1, f2 = rng.uniform(80, 2000, 2)
    w = (
        0.5 * np.sin(2 * np.pi * f1 * t)
        + 0.25 * np.sin(2 * np.pi * f2 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return np.clip(w * 20000, -32768, 32767).astype(np.int16)


def audio_clip_lens(n: int, seed: int = 0) -> np.ndarray:
    """The sequential per-clip length draw — computed once (cheap)
    so row generation can be sliced by global index."""
    return np.random.RandomState(seed).randint(8000, 64000, n).astype(np.int64)


def audio_rows(ids: np.ndarray, lens: np.ndarray, sr: int = 16000) -> pa.Table:
    """Rows for arbitrary global indices `ids` of the deterministic
    audio table (content depends only on the index + the shared
    `lens` draw), so generation parallelizes under any partitioning."""
    ids = np.asarray(ids, dtype=np.int64)
    rows = {
        "clip_id": [f"clip{i:06d}" for i in ids],
        "bytes": [encode_clip(int(i), int(lens[i]), sr) for i in ids],
        "sample_rate": pa.array(np.full(len(ids), sr, dtype=np.int32)),
        "n_samples": pa.array(lens[ids]),
        "fmt": ["wav"] * len(ids),
    }
    return pa.Table.from_pydict(rows, schema=AUDIO_SCHEMA)


def generate_audio_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic audio rows — REAL RIFF/WAVE PCM16
    payloads (decodable by any wav reader), the driver-query input
    analog of generate_image_table."""
    return audio_rows(np.arange(n, dtype=np.int64), audio_clip_lens(n, seed))


# real-corpus WAV sample-format mix, cycled per clip: pcm24/pcm32/
# float32 decode bit-identically to the pcm16 source; the pcm8 slice
# carries genuine 8-bit quantization (all through one float contract)
WAV_FORMATS = (
    "pcm16", "pcm24", "float32", "pcm16", "pcm32", "pcm16", "pcm8", "pcm16",
)


def encode_clip(i: int, n: int, sr: int) -> bytes:
    return codecs.encode_wav(
        _audio_waveform(i, n, sr), sr,
        sample_format=WAV_FORMATS[i % len(WAV_FORMATS)],
    )


def _video_frames(i: int, n_frames: int, h: int, w: int) -> np.ndarray:
    """Deterministic mono frames: a moving gradient + seeded noise."""
    rng = np.random.RandomState(200_000 + i)
    base = rng.randint(0, 64)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    out = np.empty((n_frames, h, w), dtype=np.uint8)
    for f in range(n_frames):
        out[f] = ((base + x * 2 + y * 3 + f * 5) % 256).astype(np.uint8)
    noise = rng.randint(0, 16, (n_frames, h, w), dtype=np.uint8)
    return out + noise  # uint8 wraparound is fine (deterministic)


def video_frame_counts(n: int, seed: int = 0) -> np.ndarray:
    """The sequential per-video frame-count draw (see audio_clip_lens)."""
    return np.random.RandomState(seed).randint(24, 96, n).astype(np.int32)


def video_rows(
    ids: np.ndarray, nfr: np.ndarray, w: int = 64, h: int = 48, fps: float = 30.0
) -> pa.Table:
    """Rows for arbitrary global indices of the deterministic video
    table — partition-order independent (see audio_rows)."""
    ids = np.asarray(ids, dtype=np.int64)
    rows = {
        "video_id": [f"v{i:06d}" for i in ids],
        "bytes": [
            codecs.encode_y4m(_video_frames(int(i), int(nfr[i]), h, w), fps)
            for i in ids
        ],
        "w": pa.array(np.full(len(ids), w, dtype=np.int32)),
        "h": pa.array(np.full(len(ids), h, dtype=np.int32)),
        "fps": pa.array(np.full(len(ids), fps)),
        "n_frames": pa.array(nfr[ids]),
        "fmt": ["y4m"] * len(ids),
    }
    return pa.Table.from_pydict(rows, schema=VIDEO_SCHEMA)


def generate_video_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic video rows — REAL YUV4MPEG2 (Cmono)
    payloads with O(1)-seekable fixed-size frames."""
    return video_rows(np.arange(n, dtype=np.int64), video_frame_counts(n, seed))
