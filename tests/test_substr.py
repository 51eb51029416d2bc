"""Exact substring-overlap dedup (ops/substr.py) vs a brute-force
token-window oracle, plus the winnowing guarantee and the
bucket-refusal contract."""

import numpy as np
import pandas as pd
import pytest


def _brute(docs, window):
    """All pairs' matching window positions + longest common run —
    straight-line O(n^2) oracle."""
    toks = {d: t.split() for d, t in docs}
    out = {}
    ids = sorted(toks)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            wa, wb = toks[a], toks[b]
            matches = []
            for i in range(len(wa) - window + 1):
                ga = tuple(wa[i : i + window])
                for j in range(len(wb) - window + 1):
                    if ga == tuple(wb[j : j + window]):
                        matches.append((i, j))
            if not matches:
                continue
            # longest run: consecutive (i, j) on one diagonal
            ms = set(matches)
            best = 0
            for (i, j) in matches:
                if (i - 1, j - 1) in ms:
                    continue
                L = 1
                while (i + L, j + L) in ms:
                    L += 1
                best = max(best, L)
            out[(a, b)] = (len(matches), best + window - 1)
    return out


def _run(ray_session, docs, window, **kw):
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.substr import substring_overlap_pairs

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    df = substring_overlap_pairs(ds, window=window, **kw).to_pandas()
    return {
        (int(r.doc_a), int(r.doc_b)): (int(r.n_windows), int(r.max_run_tokens))
        for r in df.itertuples()
    }


def test_planted_overlaps_match_bruteforce(ray_session):
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(12)]
    base = [vocab[rng.randint(12)] for _ in range(40)]
    docs = []
    for d in range(10):
        words = [vocab[rng.randint(12)] for _ in range(30)]
        if d % 3 == 0:  # plant a shared 12-token span from `base`
            at = rng.randint(0, 15)
            words[at : at + 12] = base[5:17]
        docs.append((d, " ".join(words)))
    got = _run(ray_session, docs, window=8)
    want = _brute(docs, 8)
    assert got == want
    assert len(want) >= 3  # the plant actually created pairs


def test_repeated_phrase_within_doc(ray_session):
    """A phrase repeated inside one doc pairs at EVERY position combo
    (the positional cross-join), and the run math still holds."""
    phrase = "a b c d e f g h"
    docs = [
        (1, f"{phrase} x y z {phrase}"),
        (2, f"q r s {phrase} t"),
    ]
    got = _run(ray_session, docs, window=8)
    want = _brute(docs, 8)
    assert got == want
    assert got[(1, 2)][0] == 2  # two positions in doc1 x one in doc2


def test_exact_duplicate_docs(ray_session):
    text = " ".join(f"t{i}" for i in range(20))
    docs = [(1, text), (2, text), (3, "completely different words here " * 4)]
    got = _run(ray_session, docs, window=8)
    assert got[(1, 2)] == (13, 20)  # 13 windows, full-doc run
    assert (1, 3) not in got and (2, 3) not in got


def test_short_and_empty_docs(ray_session):
    docs = [(1, "only three words"), (2, ""), (3, "   "), (4, "a b c d e f g h"),
            (5, "a b c d e f g h")]
    got = _run(ray_session, docs, window=8)
    assert got == {(4, 5): (1, 8)}


def test_winnowing_detects_long_runs(ray_session):
    """anchor_every=K guarantees detection of runs >= window + K - 1:
    every such pair found at K=1 must also be found at K=4."""
    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(15)]
    base = [vocab[rng.randint(15)] for _ in range(60)]
    docs = []
    for d in range(8):
        words = [vocab[rng.randint(15)] for _ in range(40)]
        at = rng.randint(0, 20)
        words[at : at + 20] = base[10:30]  # 20-token shared span
        docs.append((d, " ".join(words)))
    exact = _run(ray_session, docs, window=8)
    winnowed = _run(ray_session, docs, window=8, anchor_every=4)
    long_pairs = {p for p, (_, mr) in exact.items() if mr >= 8 + 4 - 1}
    assert long_pairs <= set(winnowed)  # guarantee: no long pair missed
    for p in winnowed:
        assert p in exact  # winnowing can't fabricate pairs
        nw, mr = winnowed[p]
        assert nw <= exact[p][0] and mr <= exact[p][1]  # lower bounds


def test_bucket_refusal_is_loud(ray_session):
    phrase = "p q r s t u v w"
    docs = [(i, f"x{i} {phrase} y{i}") for i in range(6)]
    with pytest.raises(Exception, match="max_bucket"):
        _run(ray_session, docs, window=8, max_bucket=3)


def test_validation():
    import ray.data

    from geotools_ray.ops.substr import substring_overlap_pairs

    ds = ray.data.from_items([{"doc_id": 1, "text": "a"}])
    with pytest.raises(ValueError):
        substring_overlap_pairs(ds, window=0)
    with pytest.raises(ValueError):
        substring_overlap_pairs(ds, anchor_every=0)
