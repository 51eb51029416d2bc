"""Approximate nearest neighbour search over an embedding column.

- brute_force_topk: exact cosine top-k — per-batch matmul against the
  broadcast query matrix, partial top-k, tiny merge (the baseline).
- IVF scale path, two tiers:
  * ivf_topk: one streaming pass; each batch groups its rows by
    bucket locally and multiplies ONLY against the queries probing
    that bucket — compute drops by ~nprobe/nlist with no shuffle.
  * build_ivf_index + ivf_topk_index: bucket-PARTITIONED parquet
    (write once, hive layout); a probe reads only the nprobe/nlist
    partition directories — at 100 TB this is the difference between
    scanning everything and scanning a slice. Storage pruning is
    asserted in tests (rows_read == rows in probed buckets).

Embeddings are reshaped zero-copy from the arrow list buffer (no
per-row to_pylist); vectors are L2-normalized once at bucket-assign
time and the normalized matrix is what probes multiply against.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .dedup import _popcount64


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _stack(col) -> np.ndarray:
    """(n, dim) float64 from an arrow list/fixed_size_list column —
    zero-copy reshape of the flat values buffer when widths are
    uniform (they are, for embedding columns)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        vals = col.values.to_numpy(zero_copy_only=False)
        return np.asarray(vals, dtype=np.float64).reshape(len(col), dim)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    if len(widths) and (widths == widths[0]).all():
        vals = col.values.to_numpy(zero_copy_only=False)
        flat = np.asarray(vals, dtype=np.float64)[offs[0] : offs[-1]]
        return flat.reshape(len(col), int(widths[0]))
    if len(col) == 0:
        return np.empty((0, 0), dtype=np.float64)
    return np.stack([np.asarray(v, dtype=np.float64) for v in col.to_pylist()])


def _topk_table(out: dict) -> pa.Table:
    if not out["q_id"]:
        return pa.table(
            {"q_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    return pa.table({c: np.concatenate(v) for c, v in out.items()})


def _merge_topk(cand: ray.data.Dataset, k: int) -> ray.data.Dataset:
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    # query count is tiny — per-key map_groups is fine here
    return cand.groupby("q_id").map_groups(merge, batch_format="pandas")


def brute_force_topk(
    vectors: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine top-k per query; rank ties break on vec_id."""
    qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids), qn))

    def local_topk(t: pa.Table) -> pa.Table:
        qids, q = ray.get(ref)
        vid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        En = _norm_rows(_stack(t[emb_col]))
        sims = En @ q.T
        kk = min(k, len(vid))
        out = {"q_id": [], "vec_id": [], "sim": []}
        for j in range(len(qids)):
            idx = np.lexsort((vid, -sims[:, j]))[:kk]
            out["q_id"].append(np.full(len(idx), qids[j]))
            out["vec_id"].append(vid[idx])
            out["sim"].append(sims[idx, j])
        return _topk_table(out)

    cand = vectors.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(cand, k)


def _hash_sample(
    vectors: ray.data.Dataset,
    sample_n: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Deterministic HASH-selected training sample (multiplicative
    hash of the id — no global sort, no seed state), L2-normalized.
    Shared by the coarse-centroid and PQ-codebook trainers so both
    see the SAME sample."""
    n = vectors.count()  # parquet metadata — no scan
    frac = min(1.0, (sample_n * 1.3) / max(n, 1))
    lim = int(frac * 4294967296)

    def keep(t: pa.Table) -> pa.Table:
        vid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (vid * 2654435761) % 4294967296
        return t.filter(pa.array(h < lim))

    sample = (
        vectors.map_batches(keep, batch_format="pyarrow")
        .select_columns([id_col, emb_col])
        .to_pandas()
    )
    vid = sample[id_col].to_numpy().astype(np.int64)
    order = np.lexsort((vid, (vid * 2654435761) % 4294967296))[:sample_n]
    return _norm_rows(
        np.stack([np.asarray(v, dtype=np.float64) for v in sample[emb_col].iloc[order]])
    )


def train_centroids(
    vectors: ray.data.Dataset,
    nlist: int,
    sample_n: int = 4096,
    iters: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Deterministic k-means on a hash-selected sample, Lloyd
    iterations with fixed count; empty clusters keep their previous
    centroid."""
    X = _hash_sample(vectors, sample_n, id_col, emb_col)
    idx = np.linspace(0, len(X) - 1, nlist).astype(int)
    C = X[idx].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(nlist):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _norm_rows(C)
    return C


def assign_buckets(
    vectors: ray.data.Dataset,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    normalize: bool = True,
) -> ray.data.Dataset:
    """Adds `bucket`; with normalize=True the embedding column is
    replaced by its L2-normalized values (computed once, here)."""
    cref = ray.put(centroids)

    def fn(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        En = _norm_rows(_stack(t[emb_col]))
        b = np.argmax(En @ C.T, axis=1).astype(np.int64)
        t = t.append_column("bucket", pa.array(b))
        if normalize:
            i = t.schema.get_field_index(emb_col)
            dim = En.shape[1]
            flat = pa.array(En.ravel(), pa.float64())
            t = t.set_column(i, emb_col, pa.FixedSizeListArray.from_arrays(flat, dim))
        return t

    return vectors.map_batches(fn, batch_format="pyarrow")


def _invert_probes(probes: np.ndarray, nlist: int) -> list[np.ndarray]:
    """bucket -> indices of queries probing it."""
    inv = [[] for _ in range(nlist)]
    for qi, row in enumerate(probes):
        for b in row:
            inv[int(b)].append(qi)
    return [np.asarray(v, dtype=np.int64) for v in inv]


def _bucket_topk_batch(
    t: pa.Table, qids, q, inv_, k: int, id_col: str, emb_col: str
) -> pa.Table:
    """Per-batch IVF top-k: group the batch's rows by bucket and
    multiply each group only against the queries probing that bucket.
    Shared by the single-pass (ivf_topk) and partitioned-index
    (ivf_topk_index) tiers so the tie-break contract stays in one
    place (rank ties break on vec_id via the lexsort)."""
    vid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    bk = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    En = _stack(t[emb_col])  # already L2-normalized by assign_buckets
    out = {"q_id": [], "vec_id": [], "sim": []}
    order = np.argsort(bk, kind="stable")
    ub, starts = np.unique(bk[order], return_index=True)
    bounds = np.append(starts, len(order))
    for bi, b in enumerate(ub):
        qidx = inv_[int(b)]
        if not len(qidx):
            continue
        rows = order[bounds[bi] : bounds[bi + 1]]
        sims = En[rows] @ q[qidx].T  # (rows, probing queries)
        sub_vid = vid[rows]
        kk = min(k, len(rows))
        for jj, qi in enumerate(qidx):
            idx = np.lexsort((sub_vid, -sims[:, jj]))[:kk]
            out["q_id"].append(np.full(len(idx), qids[qi]))
            out["vec_id"].append(sub_vid[idx])
            out["sim"].append(sims[idx, jj])
    return _topk_table(out)


def ivf_topk(
    vectors: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """IVF single-pass: batches group rows by bucket locally and
    multiply only against the queries probing that bucket — the
    pruned-compute tier (use build_ivf_index/ivf_topk_index for
    pruned STORAGE)."""
    C = centroids if centroids is not None else train_centroids(
        vectors, nlist, id_col=id_col, emb_col=emb_col
    )
    bucketed = assign_buckets(vectors, C, emb_col=emb_col)
    qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]
    # invert by len(C): with pre-trained centroids larger than the
    # default nlist, bucket ids range over len(C), not the parameter
    inv = _invert_probes(probes, len(C))
    ref = ray.put((np.asarray(query_ids), qn, inv))

    def local_topk(t: pa.Table) -> pa.Table:
        qids, q, inv_ = ray.get(ref)
        return _bucket_topk_batch(t, qids, q, inv_, k, id_col, emb_col)

    cand = bucketed.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(cand, k)


def build_ivf_index(
    vectors: ray.data.Dataset,
    nlist: int,
    path: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Write a bucket-partitioned (hive-layout) parquet index; probes
    then read only their nprobe partition directories. -> centroids."""
    C = train_centroids(vectors, nlist, id_col=id_col, emb_col=emb_col)
    bucketed = assign_buckets(vectors, C, emb_col=emb_col)
    bucketed.write_parquet(path, partition_cols=["bucket"])
    return C


def ivf_topk_index(
    path: str,
    centroids: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Probe a bucket-partitioned index: only the union of the
    queries' nprobe buckets is READ (partition pruning at the
    source) — the rest of the corpus never leaves storage."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from ray.data.datasource.partitioning import Partitioning

    qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    needed = sorted({int(b) for row in probes for b in row})
    # partition pruning at the SOURCE, filesystem-agnostic: pyarrow
    # dataset discovery resolves the path on any registered filesystem
    # (local, s3://, gcs://) and get_fragments with the partition
    # filter lists ONLY the probed buckets' files — the rest of the
    # corpus is never listed, opened, or read
    dset = pads.dataset(
        path,
        partitioning=pads.partitioning(
            pa.schema([("bucket", pa.int32())]), flavor="hive"
        ),
    )
    frags = dset.get_fragments(filter=pc.field("bucket").isin(needed))
    files = sorted(f.path for f in frags)
    ds = ray.data.read_parquet(
        files,
        filesystem=dset.filesystem,
        partitioning=Partitioning("hive", base_dir=path, field_types={"bucket": int}),
    )
    inv = _invert_probes(probes, len(centroids))
    ref = ray.put((np.asarray(query_ids), qn, inv))

    def local_topk(t: pa.Table) -> pa.Table:
        qids, q, inv_ = ray.get(ref)
        return _bucket_topk_batch(t, qids, q, inv_, k, id_col, emb_col)

    cand = ds.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(cand, k)


# ---------------------------------------------------------------------------
# IVF-PQ: the MEMORY-scale ANN tier (Jégou, Douze & Schmid 2011,
# "Product Quantization for Nearest Neighbor Search", IEEE TPAMI).
# At 10^12 vectors the full-precision embedding matrix cannot be
# probe-resident (dim=64 float32 = 256 B/vector); PQ codes are m bytes
# (m=8 -> 32x smaller), so a probed bucket's codes fit in a worker's
# heap where its raw vectors would not. Search is two-tier:
#   1. ADC shortlist — per (query, probed bucket), an (m x 2^nbits)
#      lookup table of subspace distances to the query's RESIDUAL
#      (q - coarse centroid); each code row's approximate distance is
#      m LUT gathers, no float matmul against the corpus.
#   2. exact rerank — the per-query top-R shortlist ids (R << corpus)
#      pull their full-precision vectors for an exact-cosine top-k.
# With nprobe = nlist AND rerank >= corpus the result is EXACT (the
# oracle configuration, matching q_ann_ivf's exhaustive-probe trick);
# the pruned tier's recall is pytest-pinned.

def train_pq_codebooks(
    vectors: ray.data.Dataset,
    centroids: np.ndarray,
    m: int = 8,
    nbits: int = 8,
    sample_n: int = 4096,
    iters: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace L2 k-means codebooks over coarse-assignment
    RESIDUALS (the classic IVF-PQ formulation: residuals are far more
    isotropic than raw vectors, so a shared codebook across buckets
    stays tight). Deterministic: same hash sample as train_centroids,
    linspace init, fixed Lloyd iterations. -> (m, 2^nbits, dim//m)."""
    X = _hash_sample(vectors, sample_n, id_col, emb_col)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"PQ subspace count m={m} must divide dim={dim}")
    dsub = dim // m
    res = X - centroids[np.argmax(X @ centroids.T, axis=1)]
    ks = min(1 << nbits, len(X))
    books = np.empty((m, ks, dsub))
    for s in range(m):
        Xs = np.ascontiguousarray(res[:, s * dsub : (s + 1) * dsub])
        idx = np.linspace(0, len(Xs) - 1, ks).astype(int)
        Cs = Xs[idx].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - Cs[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for j in range(ks):
                mem = Xs[a == j]
                if len(mem):
                    Cs[j] = mem.mean(axis=0)
        books[s] = Cs
    return books


def _pq_encode(En: np.ndarray, bucket: np.ndarray, C: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per-subspace nearest codebook entry of the
    residual vs the assigned coarse centroid."""
    m, ks, dsub = books.shape
    res = En - C[bucket]
    codes = np.empty((len(En), m), dtype=np.uint8)
    for s in range(m):
        Rs = res[:, s * dsub : (s + 1) * dsub]
        d2 = ((Rs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def _adc_shortlist_batch(
    vid: np.ndarray,
    bk: np.ndarray,
    codes: np.ndarray,
    qids: np.ndarray,
    qn: np.ndarray,
    inv_: list[np.ndarray],
    C: np.ndarray,
    books: np.ndarray,
    r_top: int,
) -> pa.Table:
    """Per-batch ADC: group the batch's code rows by bucket, build the
    (query, subspace, code) distance LUT once per (bucket, probing
    queries), gather each row's approximate distance, keep per-query
    top-r_top. Emits approx sim = 1 - d2/2 (vectors are normalized, so
    exact cosine = 1 - ||x-q||^2 / 2; the PQ d2 estimates that)."""
    m, ks, dsub = books.shape
    out = {"q_id": [], "vec_id": [], "sim": []}
    order = np.argsort(bk, kind="stable")
    ub, starts = np.unique(bk[order], return_index=True)
    bounds = np.append(starts, len(order))
    for bi, b in enumerate(ub):
        qidx = inv_[int(b)]
        if not len(qidx):
            continue
        rows = order[bounds[bi] : bounds[bi + 1]]
        sub_vid = vid[rows]
        sub_codes = codes[rows]
        r = qn[qidx] - C[int(b)]  # (nq, dim) query residuals vs this bucket
        # LUT: (nq, m, ks) subspace distances residual-chunk -> codebook
        lut = (
            (r.reshape(len(qidx), m, 1, dsub) - books[None, :, :, :]) ** 2
        ).sum(axis=3)
        d2 = np.zeros((len(qidx), len(rows)))
        for s in range(m):
            d2 += lut[:, s, :][:, sub_codes[:, s]]
        kk = min(r_top, len(rows))
        for jj, qi in enumerate(qidx):
            idx = np.lexsort((sub_vid, d2[jj]))[:kk]
            out["q_id"].append(np.full(len(idx), qids[qi]))
            out["vec_id"].append(sub_vid[idx])
            out["sim"].append(1.0 - d2[jj, idx] / 2.0)
    return _topk_table(out)


def _exact_rerank(
    vectors: ray.data.Dataset,
    shortlist: ray.data.Dataset,
    qids: np.ndarray,
    qn: np.ndarray,
    k: int,
    id_col: str,
    emb_col: str,
) -> ray.data.Dataset:
    """Exact-cosine top-k restricted to each query's shortlist ids.
    The shortlist is queries x rerank rows — the SMALL side by
    contract — so it broadcasts; the corpus streams one narrow pass
    and only shortlisted rows are multiplied."""
    sdf = shortlist.select_columns(["q_id", "vec_id"]).to_pandas()
    cand = {
        int(q): np.sort(g["vec_id"].to_numpy().astype(np.int64))
        for q, g in sdf.groupby("q_id", sort=False)
    }
    ref = ray.put((np.asarray(qids), qn, cand))

    def local_exact(t: pa.Table) -> pa.Table:
        qids_, q_, cand_ = ray.get(ref)
        vid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        En = None
        out = {"q_id": [], "vec_id": [], "sim": []}
        for j, qid in enumerate(qids_):
            ids_j = cand_.get(int(qid))
            if ids_j is None or not len(ids_j):
                continue
            pos = np.searchsorted(ids_j, vid)
            pos[pos >= len(ids_j)] = len(ids_j) - 1
            mask = ids_j[pos] == vid
            if not mask.any():
                continue
            if En is None:
                En = _norm_rows(_stack(t[emb_col]))
            rows = np.nonzero(mask)[0]
            sims = En[rows] @ q_[j]
            kk = min(k, len(rows))
            idx = np.lexsort((vid[rows], -sims))[:kk]
            out["q_id"].append(np.full(len(idx), qid))
            out["vec_id"].append(vid[rows][idx])
            out["sim"].append(sims[idx])
        return _topk_table(out)

    cand_ds = vectors.map_batches(local_exact, batch_format="pyarrow")
    return _merge_topk(cand_ds, k)


def ivfpq_topk(
    vectors: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    m: int = 8,
    nbits: int = 8,
    nprobe: int = 4,
    rerank: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> ray.data.Dataset:
    """Single-pass IVF-PQ: assign + encode + ADC shortlist in one
    streaming map (codes never materialize), global top-rerank merge,
    then the exact rerank pass. rerank defaults to 4k (the usual
    shortlist ratio); rerank >= corpus with nprobe = nlist is exact."""
    C = centroids if centroids is not None else train_centroids(
        vectors, nlist, id_col=id_col, emb_col=emb_col
    )
    books = codebooks if codebooks is not None else train_pq_codebooks(
        vectors, C, m=m, nbits=nbits, id_col=id_col, emb_col=emb_col
    )
    qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]
    inv = _invert_probes(probes, len(C))
    r_top = rerank if rerank is not None else 4 * k
    ref = ray.put((np.asarray(query_ids), qn, inv, C, books))

    def local_adc(t: pa.Table) -> pa.Table:
        qids_, qn_, inv_, C_, books_ = ray.get(ref)
        vid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        En = _norm_rows(_stack(t[emb_col]))
        bk = np.argmax(En @ C_.T, axis=1).astype(np.int64)
        codes = _pq_encode(En, bk, C_, books_)
        return _adc_shortlist_batch(vid, bk, codes, qids_, qn_, inv_, C_, books_, r_top)

    cand = vectors.map_batches(local_adc, batch_format="pyarrow")
    shortlist = _merge_topk(cand, r_top)
    return _exact_rerank(vectors, shortlist, query_ids, qn, k, id_col, emb_col)


def build_ivfpq_index(
    vectors: ray.data.Dataset,
    nlist: int,
    path: str,
    m: int = 8,
    nbits: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Write the compressed index: (id, bucket, m-byte PQ code) rows,
    hive-partitioned by bucket — a probe reads only its buckets' code
    partitions, each ~dim*4/m x smaller than the raw vectors it
    stands in for. -> (centroids, codebooks)."""
    C = train_centroids(vectors, nlist, id_col=id_col, emb_col=emb_col)
    books = train_pq_codebooks(vectors, C, m=m, nbits=nbits, id_col=id_col, emb_col=emb_col)
    cref = ray.put((C, books))

    def encode(t: pa.Table) -> pa.Table:
        C_, books_ = ray.get(cref)
        En = _norm_rows(_stack(t[emb_col]))
        bk = np.argmax(En @ C_.T, axis=1).astype(np.int64)
        codes = _pq_encode(En, bk, C_, books_)
        return pa.table(
            {
                id_col: t[id_col],
                "bucket": pa.array(bk),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), pa.uint8()), codes.shape[1]
                ),
            }
        )

    vectors.map_batches(encode, batch_format="pyarrow").write_parquet(
        path, partition_cols=["bucket"]
    )
    return C, books


def ivfpq_topk_index(
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vectors: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    rerank: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Probe a PQ-coded partitioned index: only the probed buckets'
    CODE partitions are read (partition pruning at the source, m bytes
    per vector); `vectors` (the full-precision table) is touched only
    by the exact rerank's narrow streaming pass."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from ray.data.datasource.partitioning import Partitioning

    qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    needed = sorted({int(b) for row in probes for b in row})
    dset = pads.dataset(
        path,
        partitioning=pads.partitioning(
            pa.schema([("bucket", pa.int32())]), flavor="hive"
        ),
    )
    frags = dset.get_fragments(filter=pc.field("bucket").isin(needed))
    files = sorted(f.path for f in frags)
    ds = ray.data.read_parquet(
        files,
        filesystem=dset.filesystem,
        partitioning=Partitioning("hive", base_dir=path, field_types={"bucket": int}),
    )
    inv = _invert_probes(probes, len(centroids))
    r_top = rerank if rerank is not None else 4 * k
    ref = ray.put((np.asarray(query_ids), qn, inv, centroids, codebooks))

    def local_adc(t: pa.Table) -> pa.Table:
        qids_, qn_, inv_, C_, books_ = ray.get(ref)
        vid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        code_col = t["code"]
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        m = books_.shape[0]
        codes = np.asarray(
            code_col.values.to_numpy(zero_copy_only=False), dtype=np.uint8
        ).reshape(len(vid), m)
        return _adc_shortlist_batch(vid, bk, codes, qids_, qn_, inv_, C_, books_, r_top)

    cand = ds.map_batches(local_adc, batch_format="pyarrow")
    shortlist = _merge_topk(cand, r_top)
    return _exact_rerank(vectors, shortlist, query_ids, qn, k, id_col, emb_col)


# ---------------------------------------------------------------------------
# embedding near-dup pairs, scale path: random-hyperplane (cosine)
# LSH + banded buckets + exact-cosine shuffle-join verify

def embedding_near_dup_pairs(
    vectors: ray.data.Dataset,
    threshold: float = 0.9,
    num_bits: int = 64,
    bands: int = 16,
    seed: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """All (id_a < id_b) pairs with cosine >= threshold, found via
    random-hyperplane signatures (sign bits of E @ R), banded LSH
    buckets, and an exact-cosine verify joined by id (no driver
    matrix). Recall at cos=0.9 with 16x4-bit bands is ~0.996 per pair
    (1 - (1 - p^4)^16, p = 1 - theta/pi); meant for HIGH thresholds —
    low-threshold similarity mining should use the exact blocked
    matmul (queries_text.q_embed_pairs).

    In-bucket candidates are prefiltered by signature Hamming distance
    before any pair row is emitted: a true cos>=threshold pair differs
    on ~num_bits*acos(t)/pi sign bits (binomial), so pairs beyond
    +4 sd are dropped (P(reject true pair) ~ 3e-5, folded into the
    stated LSH recall) while random same-bucket pairs (expected
    num_bits/2 differing bits) are pruned by ~300x — without this the
    4-bit buckets make the candidate set ~n^2/2^width and the verify
    join ships it all."""
    from ..stages.grouped import grouped_map

    assert num_bits <= 64 and num_bits % bands == 0
    # Hamming prefilter cutoff: mean + 4 sd of the true-pair bit-flip
    # binomial at the threshold angle (see docstring)
    p_flip = float(np.arccos(min(max(threshold, -1.0), 1.0)) / np.pi)
    ham_max = int(
        np.ceil(num_bits * p_flip + 4.0 * np.sqrt(num_bits * p_flip * (1.0 - p_flip)))
    )
    # dim probe from the first row's embedding
    first = vectors.limit(1).to_pandas()
    dim = len(np.asarray(first[emb_col].iloc[0]))
    rng = np.random.RandomState(seed)
    R = rng.standard_normal((dim, num_bits))
    rref = ray.put(R)
    width = num_bits // bands
    band_masks = np.array(
        [np.uint64(((1 << width) - 1) << (b * width)) for b in range(bands)],
        dtype=np.uint64,
    )

    def sig(t: pa.Table) -> pa.Table:
        """(band, bval, id, packed 64-bit signature) — ALL bands
        explode into one row set so bucketing is ONE grouped shuffle
        (the simhash pattern). The shuffle payload is 4 ints per
        (row, band) — the embedding matrix itself never moves here
        (round-2 shipped it xbands through the shuffle)."""
        R_ = ray.get(rref)
        En = _norm_rows(_stack(t[emb_col]))
        bits = (En @ R_) > 0
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        shifts = np.arange(num_bits, dtype=np.uint64)
        packed = (bits.astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        bvals = np.concatenate(
            [
                ((packed >> np.uint64(b * width)) & np.uint64((1 << width) - 1)).astype(np.int64)
                for b in range(bands)
            ]
        )
        return pa.table(
            {
                "band": np.repeat(np.arange(bands, dtype=np.int64), n),
                "bval": bvals,
                id_col: np.tile(ids, bands),
                "sig": np.tile(packed.astype(np.int64), bands),
            }
        )

    exploded = vectors.map_batches(sig, batch_format="pyarrow")

    def pairs(t: pa.Table) -> pa.Table:
        """Candidate pairs, emitted exactly once: a pair surfaces only
        from its FIRST matching band (xor of the packed signatures
        against earlier band masks), so no global dedup shuffle."""
        if t.num_rows < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        band_c = t["band"].to_numpy(zero_copy_only=False)
        bval_c = t["bval"].to_numpy(zero_copy_only=False)
        ids_c = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sig_c = t["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids_c, bval_c, band_c))
        band_c, bval_c = band_c[order], bval_c[order]
        ids_c, sig_c = ids_c[order], sig_c[order]
        cut = np.nonzero((np.diff(band_c) != 0) | (np.diff(bval_c) != 0))[0] + 1
        starts = np.concatenate([[0], cut])
        ends = np.concatenate([cut, [len(band_c)]])
        out_a, out_b = [], []
        TILE = 2048  # bounds per-task memory at TILE^2 x 8 B (~33 MB)
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            band = int(band_c[s])
            ids = ids_c[s:e]
            sg = sig_c[s:e]
            m = e - s
            # tiled upper-triangle enumeration: within-bucket work is
            # inherent to the banding parameters (no pigeonhole to
            # sub-split on without losing candidates), but tiling keeps
            # the xor/popcount intermediates bounded instead of
            # materializing O(m^2) index arrays on a hot bucket
            for i0 in range(0, m, TILE):
                i1 = min(i0 + TILE, m)
                for j0 in range(i0, m, TILE):
                    j1 = min(j0 + TILE, m)
                    x = sg[i0:i1, None] ^ sg[None, j0:j1]
                    keep = _popcount64(x.ravel()).reshape(x.shape) <= ham_max
                    for j in range(band):  # exactly-once emission
                        keep &= (x & band_masks[j]) != 0
                    if j0 == i0:  # diagonal tile: strict upper triangle
                        keep &= np.arange(j0, j1)[None, :] > np.arange(i0, i1)[:, None]
                    if keep.any():
                        ii, jj = np.nonzero(keep)
                        out_a.append(ids[ii + i0])
                        out_b.append(ids[jj + j0])
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        return pa.table({"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)})

    cand = grouped_map(exploded, ["band", "bval"], pairs, batch_format="pyarrow",
                       num_parts=num_parts)

    # ---- exact-cosine verify as an id-keyed shuffle join (the
    # verify_jaccard pattern): candidates pull their two normalized
    # vectors by id; shuffle bytes ~ candidates, not corpus x bands.
    def normed(t: pa.Table) -> pa.Table:
        En = _norm_rows(_stack(t[emb_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.arange(0, (len(ids) + 1) * dim, dim, dtype=np.int32)
        return pa.table(
            {
                "key": ids,
                "id_a": np.full(len(ids), -1, dtype=np.int64),
                "id_b": np.full(len(ids), -1, dtype=np.int64),
                "side": np.full(len(ids), -1, dtype=np.int64),
                # variable-length list so the candidate side of the
                # union can carry EMPTY lists (no dim-wide padding)
                "en": pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(En.ravel(), pa.float64())
                ),
            }
        )

    def explode_cand(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        n = len(a)
        return pa.table(
            {
                "key": np.concatenate([a, b]),
                "id_a": np.concatenate([a, a]),
                "id_b": np.concatenate([b, b]),
                "side": np.concatenate(
                    [np.zeros(n, dtype=np.int64), np.ones(n, dtype=np.int64)]
                ),
                # candidate rows ship ZERO embedding payload: empty
                # variable-length lists (~4 B/row of offsets), not a
                # dim-wide dense vector of padding
                "en": pa.ListArray.from_arrays(
                    pa.array(np.zeros(2 * n + 1, dtype=np.int32)),
                    pa.array([], pa.float64()),
                ),
            }
        )

    u = cand.map_batches(explode_cand, batch_format="pyarrow").union(
        vectors.map_batches(normed, batch_format="pyarrow")
    )

    def attach(df: pd.DataFrame) -> pa.Table:
        # returns ARROW with en as a real list<float64>: a pandas
        # object column of SAME-LENGTH ndarrays (embeddings are fixed
        # dim) would be re-encoded as Ray's fixed-shape tensor
        # extension at the next shuffle's pandas->arrow boundary, whose
        # reduce-side conversion back to pandas can crash on zero-copy
        # (see ops/dedup.py verify_jaccard attach)
        srows = df[df["side"] < 0][["key", "en"]].drop_duplicates("key")
        prows = df[df["side"] >= 0].drop(columns=["en"])
        if not len(prows):
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "side": pa.array([], pa.int64()),
                 "en": pa.array([], pa.list_(pa.float64()))}
            )
        m = prows.merge(srows, on="key", how="inner")
        cells = m["en"].to_numpy()
        lens = np.fromiter(
            (len(v) for v in cells), dtype=np.int64, count=len(cells)
        )
        chunks = [np.asarray(v, dtype=np.float64) for v in cells if len(v)]
        flat = (
            np.concatenate(chunks) if chunks else np.empty(0, dtype=np.float64)
        )
        offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        en = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(flat, pa.float64())
        )
        return pa.table(
            {
                "id_a": m["id_a"].to_numpy(np.int64),
                "id_b": m["id_b"].to_numpy(np.int64),
                "side": m["side"].to_numpy(np.int64),
                "en": en,
            }
        )

    halves = grouped_map(u, ["key"], attach, num_parts=num_parts)

    def cosine(df: pd.DataFrame) -> pd.DataFrame:
        ga = df[df["side"] == 0][["id_a", "id_b", "en"]].drop_duplicates(["id_a", "id_b"])
        gb = df[df["side"] == 1][["id_a", "id_b", "en"]].drop_duplicates(["id_a", "id_b"])
        m = ga.merge(gb, on=["id_a", "id_b"], suffixes=("_a", "_b"))
        if not len(m):
            return pd.DataFrame(
                {"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64)}
            )
        Ea = np.stack([np.asarray(v, dtype=np.float64) for v in m["en_a"]])
        Eb = np.stack([np.asarray(v, dtype=np.float64) for v in m["en_b"]])
        sims = np.einsum("ij,ij->i", Ea, Eb)
        keep = sims >= threshold
        return pd.DataFrame(
            {"id_a": m["id_a"].to_numpy()[keep], "id_b": m["id_b"].to_numpy()[keep]}
        )

    return grouped_map(halves, ["id_a", "id_b"], cosine, num_parts=num_parts)
