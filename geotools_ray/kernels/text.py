"""Text-analysis kernels for the training-data pipeline extensions:
language-ID (marker-word counts), quality scoring, token counting,
document fingerprinting, shingling, MinHash, SimHash.

Pure numpy/python — used inside map_batches and by the test oracles.
The SQL-checkable variants (token count, marker counts, md5
fingerprint) are deliberately defined so a DuckDB expression computes
the identical value (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# marker words per language for the SQL-checkable language-ID heuristic;
# counts are computed as substring occurrences of " word " (space-padded)
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " de ", " y "],
}
# deterministic tie order
LANG_ORDER = ["en", "fr", "de", "es"]


def count_substring(text: str, sub: str) -> int:
    """Occurrence count via length difference — the same arithmetic a
    SQL `(length(t) - length(replace(t, s, ''))) / length(s)` does."""
    return (len(text) - len(text.replace(sub, ""))) // len(sub)


def lang_scores(text: str) -> dict[str, int]:
    padded = " " + text.lower() + " "
    return {
        lang: sum(count_substring(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: str) -> str:
    scores = lang_scores(text)
    best = max(LANG_ORDER, key=lambda l: (scores[l], -LANG_ORDER.index(l)))
    return best if scores[best] > 0 else "und"


def token_count_ws(text: str) -> int:
    """Space-split token count — matches DuckDB len(str_split(t, ' '))."""
    return len(text.split(" "))


def fingerprint_md5(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_hash64(data: bytes, seed: int = 0) -> int:
    """Deterministic 64-bit hash (FNV-1a variant, seedable)."""
    h = (0xCBF29CE484222325 ^ seed) & 0xFFFFFFFFFFFFFFFF
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def stable_hash64_array(strings, seed: int = 0):
    """Vectorized FNV-1a over an arrow/numpy array of strings —
    bit-identical to stable_hash64(s.encode(), seed) per element.
    Loops over BYTE POSITIONS (max string length, ~15 for image ids),
    vectorized across rows; the hot-path replacement for per-row
    hashing in footprint derivation."""
    import pyarrow as pa

    if not isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = pa.array(list(strings), type=pa.string())
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if len(strings) == 0:
        return np.empty(0, dtype=np.uint64)
    strings = strings.cast(pa.large_string())
    bufs = strings.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[
        strings.offset : strings.offset + len(strings) + 1
    ]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts = off[:-1]
    lengths = off[1:] - off[:-1]
    h = np.full(len(strings), np.uint64(0xCBF29CE484222325 ^ seed), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    maxlen = int(lengths.max()) if len(lengths) else 0
    with np.errstate(over="ignore"):
        for pos in range(maxlen):
            active = lengths > pos
            idx = starts[active] + pos
            ha = h[active]
            ha = ha ^ data[idx].astype(np.uint64)
            ha = ha * prime
            h[active] = ha
    return h


def shingles(text: str, k: int = 5) -> set[str]:
    """Word k-shingles."""
    words = text.split()
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def minhash_signature(shingle_set: set[str], num_perm: int = 64, seed: int = 1) -> np.ndarray:
    """num_perm-wide MinHash signature via seeded hash families.
    Shingle hashing runs vectorized (stable_hash64_array is
    bit-identical to the scalar FNV)."""
    if not shingle_set:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = stable_hash64_array(sorted(shingle_set))
    # universal-ish hashing: h_i(x) = (a_i * x + b_i) mod 2^64
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**62, size=num_perm).astype(np.uint64)
    with np.errstate(over="ignore"):
        hashed = a[None, :] * base[:, None] + b[None, :]
    return hashed.min(axis=0)


def minhash_bands(sig: np.ndarray, bands: int = 16) -> list[tuple[int, int]]:
    """(band_id, band_hash) pairs for LSH bucketing."""
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows].tobytes()
        out.append((b, stable_hash64(chunk, seed=b)))
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams."""
    return int(simhash64_batch([text])[0])


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized SimHash: hash EVERY word of the batch in one FNV
    array pass, unpack bits, segment-sum per document."""
    words = []
    doc_idx = []
    for i, t in enumerate(texts):
        ws = t.split()
        words.extend(ws)
        doc_idx.extend([i] * len(ws))
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if not words:
        return out
    h = stable_hash64_array(words)
    doc_idx = np.asarray(doc_idx, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    contrib = np.where(bits.astype(bool), 1, -1)
    sums = np.zeros((n, 64), dtype=np.int64)
    np.add.at(sums, doc_idx, contrib)
    packed = ((sums > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return packed


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def quality_features(text: str) -> dict[str, float]:
    """Length / alpha-ratio / punct-ratio / mean-word-length features —
    each reproducible in SQL (see oracle)."""
    n = len(text)
    alpha = sum(1 for c in text if ("a" <= c <= "z") or ("A" <= c <= "Z"))
    digits = sum(1 for c in text if "0" <= c <= "9")
    spaces = count_substring(text, " ")
    n_tokens = token_count_ws(text)
    return {
        "n_chars": float(n),
        "alpha_ratio": alpha / n if n else 0.0,
        "digit_ratio": digits / n if n else 0.0,
        "space_ratio": spaces / n if n else 0.0,
        "mean_token_len": (n - spaces) / n_tokens if n_tokens else 0.0,
    }


def rolling_fingerprint(text: str, window: int = 8, mod: int = 1 << 32) -> int:
    """Min rolling polynomial hash over byte windows (winnowing-style
    document fingerprint)."""
    data = text.encode("utf-8")
    if len(data) < window:
        return stable_hash64(data) % mod
    base = 257
    h = 0
    power = pow(base, window - 1, mod)
    best = mod
    for i, byte in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * power) % mod
        h = (h * base + byte) % mod
        if i >= window - 1:
            best = min(best, h)
    return best
