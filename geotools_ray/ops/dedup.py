"""Deduplication operators for the training-data pipeline (U4 + the
near-dup family):

- exact_dedup: hash-partitioned keep-first (grouped_map, one shuffle)
- minhash_lsh_dedup: shingle -> minhash signature per doc (map_batches)
  -> explode to (band, band_hash) rows -> grouped_map bucket ->
  candidate pairs -> Jaccard verify -> connected components via
  iterative min-label propagation (bounded rounds, no driver union
  over raw pairs until they are verified-few)
- simhash_dedup: 64-bit simhash, candidate pairs by banded bit chunks,
  verified by Hamming distance
- ngram_jaccard_pairs: word n-gram Jaccard over candidate buckets

All deterministic; each has a queries() entry (rows-only — not
SQL-expressible) plus unit tests with planted duplicates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..kernels import text as T
from ..stages.grouped import grouped_map


def exact_dedup(ds: ray.data.Dataset, key_cols: list[str], order_col: str,
                num_parts: int | None = None) -> ray.data.Dataset:
    """Keep the row with min(order_col) per key (U4)."""

    def drop(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_col).drop_duplicates(key_cols, keep="first")

    return grouped_map(ds, key_cols, drop, num_parts=num_parts)


# ---------------------------------------------------------------------------
# MinHash + LSH

def minhash_signatures(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_perm: int = 64,
) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sigs = []
        for s in t[text_col].to_pylist():
            sigs.append(T.minhash_signature(T.shingles(s, shingle_k), num_perm))
        return pa.table(
            {
                id_col: ids,
                "sig": pa.array([s.astype(np.int64) for s in sigs], pa.list_(pa.int64())),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def lsh_candidate_pairs(
    sigs: ray.data.Dataset, id_col: str = "doc_id", bands: int = 16
) -> ray.data.Dataset:
    """Explode signatures into (band, band_hash) keys; docs sharing a
    bucket become candidate pairs (emitted once per bucket, deduped by
    the caller or the verify step)."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_id, out_band, out_hash = [], [], []
        for i in range(len(t)):
            sig = np.asarray(t["sig"][i].as_py(), dtype=np.uint64)
            for b, h in T.minhash_bands(sig, bands):
                out_id.append(ids[i])
                out_band.append(b)
                out_hash.append(np.int64(h - (1 << 64) if h >= (1 << 63) else h))
        return pa.table({id_col: out_id, "band": out_band, "bhash": out_hash})

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby(["band", "bhash"], sort=False):
            ids = np.sort(g["doc_id"].to_numpy())
            if len(ids) < 2:
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).drop_duplicates()

    cand = grouped_map(exploded, ["band", "bhash"], pairs)

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"])

    return grouped_map(cand, ["id_a", "id_b"], dedup_pairs)


def verify_jaccard(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Join pair ids back to texts (broadcast — doc side is read once
    into the object store keyed by id; for a 100 TB corpus this side
    would be a shuffle join on id instead) and keep pairs with true
    Jaccard >= threshold."""
    import pyarrow.compute as pc

    texts = {}
    for batch in docs.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow"):
        for i, s in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            texts[i] = s
    ref = ray.put(texts)

    def fn(t: pa.Table) -> pa.Table:
        tx = ray.get(ref)
        ida = t["id_a"].to_numpy(zero_copy_only=False)
        idb = t["id_b"].to_numpy(zero_copy_only=False)
        jac = np.array(
            [
                T.jaccard(T.shingles(tx[a], shingle_k), T.shingles(tx[b], shingle_k))
                for a, b in zip(ida, idb)
            ]
        )
        keep = jac >= threshold
        return pa.table({"id_a": ida[keep], "id_b": idb[keep], "jaccard": jac[keep]})

    return pairs.map_batches(fn, batch_format="pyarrow")


def connected_components(pairs: ray.data.Dataset, max_rounds: int = 10) -> ray.data.Dataset:
    """Min-label propagation over verified near-dup pairs: iterate
    (node -> min(neighbor labels)) via grouped_map until stable —
    bounded rounds, each round one shuffle; returns (doc_id, cluster)."""

    def seed(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": np.concatenate([a, b]),
                "nbr": np.concatenate([b, a]),
            }
        )

    edges = pairs.map_batches(seed, batch_format="pyarrow").materialize()
    # labels start as the node id itself
    labels = None
    for _ in range(max_rounds):
        if labels is None:

            def init_lab(df: pd.DataFrame) -> pd.DataFrame:
                out = (
                    df.groupby("node", sort=False)["nbr"].min().reset_index()
                )
                out["label"] = np.minimum(out["node"], out["nbr"])
                return out[["node", "label"]]

            labels = grouped_map(edges, ["node"], init_lab).materialize()
        else:
            lab_map = {r["node"]: r["label"] for r in labels.take_all()}
            ref = ray.put(lab_map)

            def prop(t: pa.Table) -> pa.Table:
                lm = ray.get(ref)
                node = t["node"].to_numpy(zero_copy_only=False)
                nbr = t["nbr"].to_numpy(zero_copy_only=False)
                nl = np.array([lm.get(x, x) for x in nbr])
                own = np.array([lm.get(x, x) for x in node])
                return pa.table({"node": node, "cand": np.minimum(own, nl)})

            def minlab(df: pd.DataFrame) -> pd.DataFrame:
                out = df.groupby("node", sort=False)["cand"].min().reset_index()
                return out.rename(columns={"cand": "label"})

            new_labels = grouped_map(
                edges.map_batches(prop, batch_format="pyarrow"), ["node"], minlab
            ).materialize()
            old = {r["node"]: r["label"] for r in labels.take_all()}
            new = {r["node"]: r["label"] for r in new_labels.take_all()}
            labels = new_labels
            if old == new:
                break
    return labels.map_batches(
        lambda df: df.rename(columns={"node": "doc_id", "label": "cluster"}),
        batch_format="pandas",
    )


def minhash_lsh_dedup(
    docs: ray.data.Dataset,
    threshold: float = 0.7,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
) -> ray.data.Dataset:
    """-> (doc_id, cluster) for docs in near-dup clusters."""
    sigs = minhash_signatures(docs, shingle_k=shingle_k, num_perm=num_perm)
    cand = lsh_candidate_pairs(sigs, bands=bands)
    verified = verify_jaccard(cand, docs, threshold, shingle_k=shingle_k)
    return connected_components(verified)


# ---------------------------------------------------------------------------
# SimHash

def simhash_pairs(
    docs: ray.data.Dataset, max_hamming: int = 6, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Candidate generation by 4x16-bit bands of the 64-bit simhash
    (any pair within hamming distance <= 16/band shares at least one
    exact band for distance <= 3 by pigeonhole when 4 bands); verify
    by true Hamming distance."""

    def hashes(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        hs = T.simhash64_batch(t[text_col].to_pylist())
        out = {id_col: ids, "sh": hs.astype(np.int64)}
        for b in range(4):
            out[f"band{b}"] = ((hs >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(out)

    hds = docs.map_batches(hashes, batch_format="pyarrow").materialize()

    outs = []
    for b in range(4):
        def pairs(df: pd.DataFrame, b=b) -> pd.DataFrame:
            out_a, out_b, out_d = [], [], []
            for _, g in df.groupby(f"band{b}", sort=False):
                if len(g) < 2:
                    continue
                ids = g["doc_id"].to_numpy()
                sh = g["sh"].to_numpy().astype(np.uint64)
                order = np.argsort(ids)
                ids, sh = ids[order], sh[order]
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        d = bin(int(sh[i] ^ sh[j])).count("1")
                        if d <= 16:  # loose gate; final verify below
                            out_a.append(ids[i]); out_b.append(ids[j]); out_d.append(d)
            return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_d})

        outs.append(grouped_map(hds, [f"band{b}"], pairs))
    allp = outs[0]
    for o in outs[1:]:
        allp = allp.union(o)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["id_a", "id_b"])
        return df[df["hamming"] <= max_hamming]

    return grouped_map(allp, ["id_a", "id_b"], final)


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs (exact, bucketed by length band + first token)

def ngram_jaccard_pairs(
    docs: ray.data.Dataset, n: int = 3, threshold: float = 0.5,
    text_col: str = "text", id_col: str = "doc_id",
) -> ray.data.Dataset:
    """All-pairs n-gram Jaccard >= threshold via LSH candidates (reuses
    the minhash machinery with shingle_k=n) — the exact verify makes
    the result threshold-exact up to LSH recall."""
    sigs = minhash_signatures(docs, shingle_k=n, num_perm=64)
    cand = lsh_candidate_pairs(sigs, bands=32)  # high-recall banding
    return verify_jaccard(cand, docs, threshold, shingle_k=n)
