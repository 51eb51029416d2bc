"""Text hashing/shingling kernels: the seedable FNV-1a pair
(scalar + bit-identical vectorized array form), word shingles,
MinHash signatures, and batched SimHash.

Pure numpy/python — used inside map_batches (dedup family, grouped
hash partitioning, image-id footprints). The text-analysis queries
themselves (language-ID, quality, token count, md5 fingerprint) live
in queries_text.py as vectorized pandas/SQL-lockstep expressions.
"""

from __future__ import annotations

import numpy as np


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

    # cast to large_string (64-bit offsets) BEFORE combining chunks or
    # building from python lists: a block whose total UTF-8 bytes
    # exceed 2 GiB overflows 32-bit string offsets otherwise
    if not isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = pa.array(list(strings), type=pa.large_string())
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.cast(pa.large_string()).combine_chunks()
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


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized SimHash: hash EVERY word of the batch in one FNV
    array pass, unpack bits, segment-sum per document. Bit contribs
    stay int8 ((n_words, 64) temporaries — int64 here cost ~1 KB per
    input word); np.add.at promotes into the int64 accumulator."""
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
    bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int8)
    contrib = (bits * np.int8(2)) - np.int8(1)  # {0,1} -> {-1,+1}
    sums = np.zeros((n, 64), dtype=np.int64)
    np.add.at(sums, doc_idx, contrib)
    packed = ((sums > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return packed
