"""Scale rehearsal for the near-dup family (minhash / simhash / ngram).

Synthesizes corpora at 1x / 10x / 30x the sf0.1 documents table —
same vocabulary, same text-length distribution, same PLANTED near-dup
rate (not clone-heavy: a fixed fraction of docs are word-perturbed
copies of a base doc, like the driver's generator) — and times each
dedup operator at every scale in ONE Ray session.

The point is the growth curve, not absolute numbers: LSH banding +
verify + CC should grow ~linearly in docs when the dup RATE is
constant. A super-linear jump flags a bucket/pair blowup.

Usage: python tools/scale_rehearsal.py [--scales 1,10,30]
Writes one JSON line per (op, scale) to stdout, prefixed REHEARSAL.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window join shuffle block read "
    "write merge scale node task actor plan stage push probe build cache "
    "spill limit range map skew salt tile cell grid image pixel raster"
).split()


def make_corpus(n_docs: int, dup_frac: float = 0.10, seed: int = 7) -> pa.Table:
    """Deterministic word-salad corpus with planted near-dups.

    dup_frac of docs are a word-perturbed copy of an earlier base doc
    (3 word substitutions over ~40-90 words ⇒ jaccard >> 0.5 on word
    3-shingles), matching the testdata generator's shape rather than
    exact clones."""
    rng = np.random.RandomState(seed)
    texts: list[str] = []
    n_base = int(n_docs * (1.0 - dup_frac))
    for _ in range(n_base):
        L = rng.randint(40, 90)
        texts.append(" ".join(rng.choice(VOCAB, size=L)))
    for _ in range(n_docs - n_base):
        base = texts[rng.randint(0, n_base)].split()
        for _ in range(3):
            base[rng.randint(0, len(base))] = VOCAB[rng.randint(0, len(VOCAB))]
        texts.append(" ".join(base))
    ids = np.arange(n_docs, dtype=np.int64)
    return pa.table({"doc_id": ids, "text": texts})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    ap.add_argument("--base", type=int, default=5000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geotools_ray.ops.dedup import (
        minhash_lsh_dedup,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from geotools_ray.ops.substr import substring_overlap_pairs

    results = []
    for mult in [int(s) for s in args.scales.split(",")]:
        n = args.base * mult
        # split the single in-memory arrow block: without this every
        # per-doc map stage runs as ONE task and the rehearsal measures
        # a parallelism-1 map path the real multi-fragment driver input
        # never runs
        docs = rd.from_arrow(make_corpus(n)).repartition(32).materialize()
        for op, fn in [
            ("minhash_dedup", lambda d: minhash_lsh_dedup(d, threshold=0.5)),
            ("simhash_pairs", lambda d: simhash_pairs(d, max_hamming=3)),
            ("ngram_pairs", lambda d: ngram_jaccard_pairs(d, threshold=0.5)),
            # exact substring overlap: O(tokens) window rows, buckets
            # O(docs sharing one exact 8-token phrase) — should grow
            # ~linearly when the planted-dup RATE is constant
            ("substr_overlap", lambda d: substring_overlap_pairs(d, window=8)),
        ]:
            t0 = time.time()
            out = fn(docs).materialize()
            dt = time.time() - t0
            rec = {"op": op, "scale": mult, "docs": n,
                   "rows": out.count(), "sec": round(dt, 2),
                   "_sec_raw": dt,  # growth ratios from the unrounded value
                   "docs_per_sec": round(n / dt)}
            results.append(rec)
            print("REHEARSAL", json.dumps({k: v for k, v in rec.items() if k != "_sec_raw"}))
            sys.stdout.flush()

    # growth factors per op: sec(scale)/sec(1x) vs scale
    by_op: dict[str, dict[int, float]] = {}
    for r in results:
        by_op.setdefault(r["op"], {})[r["scale"]] = r["_sec_raw"]
    for op, d in by_op.items():
        if 1 in d:
            growth = {s: round(d[s] / d[1], 2) for s in sorted(d)}
            print("REHEARSAL_GROWTH", json.dumps({"op": op, "time_growth": growth}))
    ray.shutdown()


if __name__ == "__main__":
    main()
