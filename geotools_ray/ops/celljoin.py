"""Cell-bucketed spatial joins — the scale path named by the north
star: kNN via CELL-RING EXPANSION and the large-large range join.

Both sides are keyed by a grid cell at resolution ~ the query radius.
The point side is built into a cell -> rows index ONCE (broadcast via
ray.put for moderate sizes; at design scale the same structure is an
actor-sharded index partitioned by parent cell — the ST3 KD-tree
replacement, reference include/nanoflann.hpp + J9).

kNN ring closure: after searching all cells with Chebyshev ring
distance <= d, any unseen point is at least d * res away from a query
anywhere in its cell. Expansion stops when k candidates are found AND
the k-th candidate distance is STRICTLY below d * res (a tie at
exactly d * res could lose the column tie-break to an unseen point),
or when the rings have covered the whole indexed grid — at which point
every point has been seen and fewer than k rows is the exact answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..kernels.grid import Bounds

# cell key = c * 2^32 + r with r in [0, 2^32): injective for any c
# (including negative columns) — a 22-bit row field aliased distinct
# cells once a raster exceeded ~4.2M rows. Out-of-domain ring cells
# are FILTERED on the query side, never packed.
_CELL_SHIFT = np.int64(32)
_CELL_MASK = np.int64((1 << 32) - 1)


def _pack(c, r):
    return (np.asarray(c, dtype=np.int64) << _CELL_SHIFT) + np.asarray(
        r, dtype=np.int64
    )


def _grid_dims(bounds: Bounds, res: float) -> tuple[int, int]:
    ncols = max(1, int(np.ceil((bounds.maxx - bounds.minx) / res)))
    nrows = max(1, int(np.ceil((bounds.maxy - bounds.miny) / res)))
    return ncols, nrows


def build_cell_index(
    points: ray.data.Dataset,
    res: float,
    bounds: Bounds,
    keep_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
):
    """-> ray ObjectRef of {cell_key: {"x", "y", cols...}} with
    cell_key = (col, row) at `res` over `bounds` (driver-side build:
    the index is the SMALL side's structure; for a large index shard
    this dict by parent cell across actors)."""
    ncols_g, nrows_g = _grid_dims(bounds, res)
    cols = {}
    for batch in points.iter_batches(batch_format="pyarrow"):
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        c = np.floor((x - bounds.minx) / res).astype(np.int64)
        r = np.floor((y - bounds.miny) / res).astype(np.int64)
        key = _pack(c, r)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        uniq, starts = np.unique(key_s, return_index=True)
        data = {"x": x[order], "y": y[order]}
        for col in keep_cols:
            data[col] = batch[col].to_numpy(zero_copy_only=False)[order]
        bounds_idx = np.append(starts, len(key_s))
        for i, k in enumerate(uniq):
            sl = slice(bounds_idx[i], bounds_idx[i + 1])
            ent = cols.setdefault(int(k), {c2: [] for c2 in data})
            for c2 in data:
                ent[c2].append(data[c2][sl])
    index = {
        k: {c2: np.concatenate(v[c2]) for c2 in v} for k, v in cols.items()
    }
    return ray.put((index, res, bounds.minx, bounds.miny, ncols_g, nrows_g))


def knn_cell_ring(
    queries: ray.data.Dataset,
    index_ref,
    k: int,
    qx: str = "sx",
    qy: str = "sy",
    query_key: str = "s_suppkey",
    point_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    max_ring: int | None = None,
) -> ray.data.Dataset:
    """-> (query_key, rank, point_cols..., dist), ranked by
    (d2, *point_cols) — identical ordering to the brute-force kNN and
    the SQL oracle.

    Expansion runs until ring closure OR until the rings cover the
    whole indexed domain (at which point every point has been seen, so
    returning < k rows is the exact answer). Closure is STRICT
    (kth_d < ring * res): an unseen point at exactly ring * res could
    tie the kth distance and win the column tie-break. An explicit
    `max_ring` cap that aborts expansion before either condition
    raises instead of silently returning wrong neighbors."""

    def per_batch(t: pa.Table) -> pa.Table:
        index, res, minx, miny, ncols_g, nrows_g = ray.get(index_ref)
        xs = t[qx].to_numpy(zero_copy_only=False)
        ys = t[qy].to_numpy(zero_copy_only=False)
        keys = t[query_key].to_numpy(zero_copy_only=False)
        out = {query_key: [], "rank": [], "dist": []}
        for c in point_cols:
            out[c] = []
        for i in range(len(xs)):
            qc = int(np.floor((xs[i] - minx) / res))
            qr = int(np.floor((ys[i] - miny) / res))
            # rings beyond `cover` contain no in-domain cells
            cover = max(qc, ncols_g - 1 - qc, qr, nrows_g - 1 - qr, 0)
            limit = cover if max_ring is None else min(max_ring, cover)
            cand = {c2: [] for c2 in ("x", "y", *point_cols)}
            n_found = 0
            closed = False
            ring = 0
            while ring <= limit:
                # cells at Chebyshev distance == ring, clipped to grid
                cells = []
                if ring == 0:
                    cells = [(qc, qr)]
                else:
                    for dc in range(-ring, ring + 1):
                        cells.append((qc + dc, qr - ring))
                        cells.append((qc + dc, qr + ring))
                    for dr in range(-ring + 1, ring):
                        cells.append((qc - ring, qr + dr))
                        cells.append((qc + ring, qr + dr))
                for cc, rr in cells:
                    if cc < 0 or cc >= ncols_g or rr < 0 or rr >= nrows_g:
                        continue
                    ent = index.get(int(_pack(cc, rr)))
                    if ent is None:
                        continue
                    for c2 in cand:
                        cand[c2].append(ent[c2])
                    n_found += len(ent["x"])
                # closure test: the nearest possible unseen point is
                # >= ring * res away from the query cell's boundary
                if n_found >= k:
                    cx = np.concatenate(cand["x"])
                    cy = np.concatenate(cand["y"])
                    d2 = (cx - xs[i]) ** 2 + (cy - ys[i]) ** 2
                    kk = min(k, len(d2))
                    kth_d = np.sqrt(np.partition(d2, kk - 1)[kk - 1])
                    if kth_d < ring * res:
                        closed = True
                        break
                ring += 1
            if not closed and max_ring is not None and limit < cover:
                raise RuntimeError(
                    f"knn_cell_ring: expansion hit max_ring={max_ring} "
                    f"before closure (needed up to ring {cover}); raise "
                    "max_ring or coarsen res"
                )
            if not cand["x"]:
                continue
            cx = np.concatenate(cand["x"])
            cy = np.concatenate(cand["y"])
            d2 = (cx - xs[i]) ** 2 + (cy - ys[i]) ** 2
            tb = {c2: np.concatenate(cand[c2]) for c2 in point_cols}
            order = np.lexsort(tuple(tb[c2] for c2 in reversed(point_cols)) + (d2,))
            sel = order[: min(k, len(order))]
            out[query_key].append(np.full(len(sel), keys[i]))
            out["rank"].append(np.arange(1, len(sel) + 1, dtype=np.int64))
            out["dist"].append(np.sqrt(d2[sel]))
            for c2 in point_cols:
                out[c2].append(tb[c2][sel])
        if not out[query_key]:
            # schema-stable empties: dtypes derived from the sources
            ent0 = next(iter(index.values()), None)
            empty = {
                query_key: pa.array(np.empty(0, dtype=keys.dtype)),
                "rank": pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
            }
            for c2 in point_cols:
                dt = ent0[c2].dtype if ent0 is not None else np.int64
                empty[c2] = pa.array(np.empty(0, dtype=dt))
            return pa.table(empty)
        return pa.table({c2: np.concatenate(v) for c2, v in out.items()})

    return queries.map_batches(per_batch, batch_format="pyarrow")


def distinct_cells(
    ds: ray.data.Dataset,
    key_fn,
    num_parts: int = 8,
) -> np.ndarray:
    """Distributed distinct of a cell-key derivation: per-batch unique
    -> grouped per-partition unique -> driver concat (disjoint by the
    hash partitioning). The result is bounded by POPULATED cells, not
    rows — the broadcastable side of a sparse join."""
    from ..stages.grouped import grouped_map

    def per_batch(t: pa.Table) -> pa.Table:
        return pa.table({"cell": np.unique(key_fn(t))})

    def per_part(t: pa.Table) -> pa.Table:
        return pa.table(
            {"cell": np.unique(t["cell"].to_numpy(zero_copy_only=False))}
        )

    parts = grouped_map(
        ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None),
        ["cell"], per_part, num_parts=num_parts, batch_format="pyarrow",
    ).to_pandas()
    return np.sort(parts["cell"].to_numpy().astype(np.int64))


def range_join_cells(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    radius: float,
    bounds: Bounds,
    left_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    right_cols: tuple[str, ...] = ("s_suppkey",),
    num_parts: int | None = None,
    prefilter_left: bool = True,
) -> ray.data.Dataset:
    """Large-large range join: both sides bucketed by cell at
    res = radius; each RIGHT (smaller) row is replicated to its cell's
    3x3 ring so every candidate pair co-locates in one partition — the
    big side is keyed ONCE (shuffle volume: |L| + 9|R|, not 9|L|);
    exact d2 refine inside. One shuffle per side; no broadcast of ROWS.

    prefilter_left (pure optimization — output provably unchanged, the
    oracle and the with/without parity test pin it): the right side's
    REPLICATED reach-cell set is distinct-reduced distributed (bounded
    by populated cells, not rows) and broadcast once; left rows whose
    cell holds no possible right partner are dropped BEFORE they are
    keyed into the shuffle. On a sparse right side at design scale
    this removes most of the big side's shuffle volume — the
    'prune at the read' rule applied to the exchange."""
    from ..stages.grouped import grouped_map

    res = radius
    r2 = radius * radius

    # side padding must match the OTHER side's dtype or the union's
    # schemas conflict; schema() is metadata-cheap for parquet-backed
    # inputs (the callers here) — fall back to int64 when unavailable
    def _types(ds) -> dict:
        try:
            sch = ds.schema()
            sch = getattr(sch, "base_schema", sch)
            return {f.name: f.type for f in sch}
        except Exception:
            return {}

    ltypes, rtypes = _types(left), _types(right)

    def _pad(n: int, typ):
        if typ is None:
            return np.zeros(n, dtype=np.int64)
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return pa.array([""] * n, typ)
        return np.zeros(n, dtype=typ.to_pandas_dtype())

    def key_left(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        c = np.floor((x - bounds.minx) / res).astype(np.int64)
        r = np.floor((y - bounds.miny) / res).astype(np.int64)
        cols = {"cell": _pack(c, r), "x": x, "y": y,
                "side": np.zeros(len(x), dtype=np.int8)}
        for col in left_cols:
            cols[col] = t[col].to_numpy(zero_copy_only=False)
        for col in right_cols:
            cols[col] = _pad(len(x), rtypes.get(col))
        return pa.table(cols)

    def _replicas(x: np.ndarray, y: np.ndarray):
        """Each right row's slack-padded reach cells (normally the 3x3
        ring). The fixed +/-1 ring had a 1-ulp hole: a row half-an-ulp
        below a cell edge with a partner at fl(distance) == radius
        exactly spans TWO cell steps, and the pair would silently
        vanish while the exact d2 <= r2 refine (and the SQL oracle)
        keep it. -> (cc, rr, source row idx), clipped below row/col 0
        (r = -1 would alias (c-1, 2^32-1) under the packed key)."""
        n = len(x)
        eps = np.finfo(np.float64).eps
        amax = max(
            float(np.max(np.abs(x), initial=0.0)),
            float(np.max(np.abs(y), initial=0.0)),
            radius, 1.0,
        )
        slack = 4.0 * eps * amax
        c0 = np.floor((x - radius - slack - bounds.minx) / res).astype(np.int64)
        c1 = np.floor((x + radius + slack - bounds.minx) / res).astype(np.int64)
        r0 = np.floor((y - radius - slack - bounds.miny) / res).astype(np.int64)
        r1 = np.floor((y + radius + slack - bounds.miny) / res).astype(np.int64)
        ncols_w = c1 - c0 + 1
        counts = ncols_w * (r1 - r0 + 1)
        idx = np.repeat(np.arange(n), counts)
        cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        k = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(cum, counts)
        cc = c0[idx] + (k % ncols_w[idx])
        rr = r0[idx] + (k // ncols_w[idx])
        ok = (rr >= 0) & (cc >= 0)
        return cc[ok], rr[ok], idx[ok]

    def key_right(t: pa.Table) -> pa.Table:
        x = t["rx"].to_numpy(zero_copy_only=False)
        y = t["ry"].to_numpy(zero_copy_only=False)
        cc, rr, idx = _replicas(x, y)
        cols = {"cell": _pack(cc, rr), "x": x[idx], "y": y[idx],
                "side": np.ones(len(idx), dtype=np.int8)}
        for col in left_cols:
            cols[col] = _pad(len(idx), ltypes.get(col))
        for col in right_cols:
            cols[col] = t[col].to_numpy(zero_copy_only=False)[idx]
        return pa.table(cols)

    keyed_left = left.map_batches(key_left, batch_format="pyarrow")
    if prefilter_left:
        def reach_cells(t: pa.Table) -> np.ndarray:
            cc, rr, _ = _replicas(
                t["rx"].to_numpy(zero_copy_only=False),
                t["ry"].to_numpy(zero_copy_only=False),
            )
            return _pack(cc, rr)

        rcells = distinct_cells(right, reach_cells)
        rref = ray.put(rcells)

        def keep_matchable(t: pa.Table) -> pa.Table:
            rc = ray.get(rref)
            if not len(rc):
                return t.slice(0, 0)
            cell = t["cell"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(rc, cell), len(rc) - 1)
            return t.filter(pa.array(rc[pos] == cell))

        keyed_left = keyed_left.map_batches(keep_matchable, batch_format="pyarrow")

    both = keyed_left.union(right.map_batches(key_right, batch_format="pyarrow"))

    def join_part(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cell, g in df.groupby("cell", sort=False):
            L = g[g["side"] == 0]
            R = g[g["side"] == 1]
            if not len(L) or not len(R):
                continue
            lx = L["x"].to_numpy()[:, None]
            ly = L["y"].to_numpy()[:, None]
            rx = R["x"].to_numpy()[None, :]
            ry = R["y"].to_numpy()[None, :]
            d2 = (lx - rx) ** 2 + (ly - ry) ** 2
            li, ri = np.nonzero(d2 <= r2)
            if not len(li):
                continue
            rec = {c: L[c].to_numpy()[li] for c in left_cols}
            for c in right_cols:
                rec[c] = R[c].to_numpy()[ri]
            rec["dist"] = np.sqrt(d2[li, ri])
            outs.append(pd.DataFrame(rec))
        cols = [*left_cols, *right_cols, "dist"]
        return pd.concat(outs)[cols] if outs else pd.DataFrame(columns=cols)

    return grouped_map(both, ["cell"], join_part, num_parts=num_parts)


# ---------------------------------------------------------------------------
# ST3 actor-sharded cell index: the KD-tree replacement at scale.
# Cells are grouped into PARENT cells (coarse blocks); each shard actor
# owns the fine cells of its hashed parents. The build is a streaming
# map_batches push (no driver materialization); lookups batch all the
# keys a query batch needs per ring into one RPC per shard.

PARENT = 8  # fine cells per parent-cell edge


def _shard_of(parent_c: np.ndarray, parent_r: np.ndarray, n: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (
            parent_c.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + parent_r.astype(np.uint64) * np.uint64(0xFF51AFD7ED558CCD)
        )
    return (h % np.uint64(n)).astype(np.int64)


@ray.remote
class CellShardActor:
    """Holds {cell_key: {col: np.ndarray}} for its parents."""

    def __init__(self):
        self._cells: dict[int, dict[str, list]] = {}
        self._sealed: dict[int, dict[str, np.ndarray]] | None = None
        self._seen: set[int] = set()

    def add(self, token: int, table: pa.Table):
        # content-token idempotency: Ray may re-execute a push task
        # (worker death, lineage reconstruction) whose add RPCs already
        # landed — the same block must not index twice. The token is a
        # content hash, so a retry (identical payload) is a no-op.
        if token in self._seen:
            return 0
        self._seen.add(token)
        key = table["cell"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        uniq, starts = np.unique(key_s, return_index=True)
        bounds_idx = np.append(starts, len(key_s))
        data = {
            c: table[c].to_numpy(zero_copy_only=False)[order]
            for c in table.column_names
            if c != "cell"
        }
        for i, k in enumerate(uniq):
            sl = slice(bounds_idx[i], bounds_idx[i + 1])
            ent = self._cells.setdefault(int(k), {c: [] for c in data})
            for c in data:
                ent[c].append(data[c][sl])
        return len(key)

    def seal(self):
        self._sealed = {
            k: {c: np.concatenate(v[c]) for c in v} for k, v in self._cells.items()
        }
        self._cells = {}
        return len(self._sealed)

    def get_cells(self, keys: list[int]):
        s = self._sealed or {}
        return {k: s[k] for k in keys if k in s}


class ShardedCellIndex:
    """Handle bundle: actors + grid geometry. Pickles into tasks (actor
    handles are serializable); lookups go shard -> one RPC."""

    def __init__(self, actors, res, minx, miny, num_shards, ncols=None, nrows=None):
        self.actors = actors
        self.res = res
        self.minx = minx
        self.miny = miny
        self.num_shards = num_shards
        self.ncols = ncols
        self.nrows = nrows

    def shard_for_key(self, key: int) -> int:
        c = key >> 32
        r = key & int(_CELL_MASK)
        return int(
            _shard_of(
                np.array([c // PARENT]), np.array([r // PARENT]), self.num_shards
            )[0]
        )

    def fetch(self, keys) -> dict:
        """Batched lookup: one get_cells RPC per shard that owns any
        of `keys` (shard routing vectorized)."""
        ka = np.asarray(keys, dtype=np.int64)
        c = ka >> _CELL_SHIFT
        r = ka & _CELL_MASK
        shard = _shard_of(c // PARENT, r // PARENT, self.num_shards)
        futs = [
            self.actors[s].get_cells.remote(ka[shard == s].tolist())
            for s in np.unique(shard)
        ]
        out: dict = {}
        for d in ray.get(futs):
            out.update(d)
        return out


def build_sharded_cell_index(
    points: ray.data.Dataset,
    res: float,
    bounds: Bounds,
    keep_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    num_shards: int = 8,
) -> ShardedCellIndex:
    """Streaming build: each batch routes its rows to the owning shard
    actors (parent-cell hash) — the point cloud never lands on the
    driver."""
    import zlib

    actors = [CellShardActor.remote() for _ in range(num_shards)]
    ncols_g, nrows_g = _grid_dims(bounds, res)

    def push(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        c = np.floor((x - bounds.minx) / res).astype(np.int64)
        r = np.floor((y - bounds.miny) / res).astype(np.int64)
        key = _pack(c, r)
        shard = _shard_of(c // PARENT, r // PARENT, num_shards)
        cols = {"cell": key, "x": x, "y": y}
        for col in keep_cols:
            cols[col] = t[col].to_numpy(zero_copy_only=False)
        payload = pa.table(cols)
        futs = []
        for s in np.unique(shard):
            sub = payload.filter(pa.array(shard == s))
            # deterministic content token (stable across task retries,
            # unlike a uuid) so the actor can drop duplicate adds; two
            # legitimately byte-identical blocks would collide, which
            # requires the INPUT to contain fully duplicated blocks
            tok = zlib.crc32(
                sub["cell"].to_numpy(zero_copy_only=False).tobytes()
                + sub["x"].to_numpy(zero_copy_only=False).tobytes()
                + sub["y"].to_numpy(zero_copy_only=False).tobytes()
            ) ^ (len(sub) << 32)
            futs.append(actors[s].add.remote(tok, sub))
        ray.get(futs)  # backpressure: don't let adds pile up unbounded
        return pa.table({"n": np.array([len(x)], dtype=np.int64)})

    # batch_size=None: one push per BLOCK — the per-batch add RPC +
    # backpressure ray.get round-trips dominate at the default 1024-row
    # batches (6k rounds at sf0.1); block-sized pushes cut that ~200x
    points.map_batches(push, batch_format="pyarrow", batch_size=None).materialize()
    ray.get([a.seal.remote() for a in actors])
    return ShardedCellIndex(
        actors, res, bounds.minx, bounds.miny, num_shards, ncols_g, nrows_g
    )


def knn_cell_ring_sharded(
    queries: ray.data.Dataset,
    index: ShardedCellIndex,
    k: int,
    qx: str = "sx",
    qy: str = "sy",
    query_key: str = "s_suppkey",
    point_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    max_ring: int | None = None,
    num_query_blocks: int | None = 32,
) -> ray.data.Dataset:
    """kNN ring expansion against the sharded index: each query batch
    expands its rings LOCKSTEP — all still-open queries' ring-d cells
    are fetched in ONE batched RPC round per ring, and the whole
    expansion is vectorized: ring offsets broadcast over the open
    queries, per-cell point lists are pooled once per ring and
    gathered into (query, candidate) rows with a grouped-arange index
    (no per-query Python, no per-(cell, query) appends)."""
    res = index.res
    minx, miny = index.minx, index.miny
    fields = ("x", "y", *point_cols)

    def _grouped_arange(lens: np.ndarray) -> np.ndarray:
        """[0..lens[0]), [0..lens[1]), ... concatenated."""
        tot = int(lens.sum())
        cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
        return np.arange(tot, dtype=np.int64) - np.repeat(cum, lens)

    def _ring_offsets(ring: int):
        if ring == 0:
            return np.zeros(1, dtype=np.int64), np.zeros(1, dtype=np.int64)
        span = np.arange(-ring, ring + 1, dtype=np.int64)
        side = np.arange(-ring + 1, ring, dtype=np.int64)
        dc = np.concatenate([span, span, np.full(len(side), -ring), np.full(len(side), ring)])
        dr = np.concatenate([np.full(len(span), -ring), np.full(len(span), ring), side, side])
        return dc, dr

    def per_batch(t: pa.Table) -> pa.Table:
        xs = t[qx].to_numpy(zero_copy_only=False)
        ys = t[qy].to_numpy(zero_copy_only=False)
        keys = t[query_key].to_numpy(zero_copy_only=False)
        n = len(xs)
        qc = np.floor((xs - minx) / res).astype(np.int64)
        qr = np.floor((ys - miny) / res).astype(np.int64)
        ncols_g = index.ncols if index.ncols else 1 << 21
        nrows_g = index.nrows if index.nrows else 1 << 21
        # rings beyond a query's `cover` hold no in-domain cells: once
        # passed, the query has seen EVERY indexed point and < k rows
        # is the exact answer (no silent truncation at a fixed ring)
        cover = np.maximum.reduce(
            [qc, ncols_g - 1 - qc, qr, nrows_g - 1 - qr,
             np.zeros(n, dtype=np.int64)]
        )
        ring_stop = int(cover.max()) if len(cover) else 0
        if max_ring is not None:
            ring_stop = min(ring_stop, max_ring)
        found = np.zeros(n, dtype=np.int64)
        done = np.zeros(n, dtype=bool)
        acc_qi: list[np.ndarray] = []
        acc_d2: list[np.ndarray] = []
        acc = {c2: [] for c2 in fields}
        cache: dict = {}
        for ring in range(ring_stop + 1):
            done |= cover < ring  # exhausted their domain: all seen
            open_idx = np.nonzero(~done)[0]
            if not len(open_idx):
                break
            dc, dr = _ring_offsets(ring)
            cc = (qc[open_idx][:, None] + dc[None, :]).ravel()
            rr = (qr[open_idx][:, None] + dr[None, :]).ravel()
            qi = np.repeat(open_idx, len(dc))
            # clip to the grid: out-of-domain cells are empty, and a
            # negative row would alias under the packed key
            ok = (cc >= 0) & (cc < ncols_g) & (rr >= 0) & (rr < nrows_g)
            cc, rr, qi = cc[ok], rr[ok], qi[ok]
            if not len(cc):
                continue
            kk = _pack(cc, rr)
            slots, inv = np.unique(kk, return_inverse=True)
            missing = [int(s) for s in slots if s not in cache]
            if missing:
                fetched = index.fetch(missing)
                for m in missing:
                    cache[m] = fetched.get(m)
            # per-cell distance blocks: for each populated cell, one
            # broadcasted (queries-wanting-it x cell-points) d2 matrix,
            # pruned to each query's k best FROM THAT CELL (keeping
            # d2 == kth ties so downstream tie-breaking stays exact) —
            # a dense cell contributes O(k) rows per query to the
            # accumulator, not O(cell size)
            order_p = np.argsort(inv, kind="stable")
            inv_s = inv[order_p]
            qi_s = qi[order_p]
            cuts = np.searchsorted(inv_s, np.arange(len(slots) + 1))
            for j in range(len(slots)):
                ent = cache[int(slots[j])]
                if ent is None:
                    continue
                qs = qi_s[cuts[j] : cuts[j + 1]]
                if not len(qs):
                    continue
                ex = ent["x"]
                ns = len(ex)
                d2 = (ex[None, :] - xs[qs][:, None]) ** 2 + (
                    ent["y"][None, :] - ys[qs][:, None]
                ) ** 2
                if ns > k:
                    kthv = np.partition(d2, k - 1, axis=1)[:, k - 1]
                    mask = d2 <= kthv[:, None]
                    rows_, cols_ = np.nonzero(mask)
                else:
                    rows_ = np.repeat(np.arange(len(qs)), ns)
                    cols_ = np.tile(np.arange(ns), len(qs))
                rows_qi = qs[rows_]
                acc_qi.append(rows_qi)
                acc_d2.append(d2[rows_, cols_])
                acc["x"].append(ex[cols_])
                acc["y"].append(ent["y"][cols_])
                for c2 in point_cols:
                    acc[c2].append(ent[c2][cols_])
                found += np.bincount(rows_qi, minlength=n)
            # ring closure: a query with >= k candidates is done when
            # its kth distance < ring * res — STRICT: an unseen point
            # at exactly ring * res could tie kth and win the column
            # tie-break, so equality keeps expanding one more ring
            ready = np.nonzero(~done & (found >= k))[0]
            if len(ready) and acc_qi:
                aqi = np.concatenate(acc_qi)
                ad2 = np.concatenate(acc_d2)
                rmask = np.zeros(n, dtype=bool)
                rmask[ready] = True
                m = rmask[aqi]
                order = np.lexsort((ad2[m], aqi[m]))
                sq = aqi[m][order]
                sd = ad2[m][order]
                su, sstarts = np.unique(sq, return_index=True)
                kth = np.sqrt(sd[sstarts + (k - 1)])
                done[su[kth < ring * res]] = True
        if max_ring is not None and bool(np.any(~done & (cover > max_ring))):
            raise RuntimeError(
                f"knn_cell_ring_sharded: expansion hit max_ring="
                f"{max_ring} before closure (needed up to ring "
                f"{int(cover.max())}); raise max_ring or coarsen res"
            )
        if not acc_qi:
            # schema-stable empties: dtypes derived from the sources
            ent0 = next((e for e in cache.values() if e is not None), None)
            empty = {
                query_key: pa.array(np.empty(0, dtype=keys.dtype)),
                "rank": pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
            }
            for c2 in point_cols:
                dt = ent0[c2].dtype if ent0 is not None else np.int64
                empty[c2] = pa.array(np.empty(0, dtype=dt))
            return pa.table(empty)
        aqi = np.concatenate(acc_qi)
        ad2 = np.concatenate(acc_d2)
        cols = {c2: np.concatenate(acc[c2]) for c2 in fields}
        # per-query top-k in ONE global lexsort: (qi, d2, point_cols...)
        order = np.lexsort(
            tuple(cols[c2] for c2 in reversed(point_cols)) + (ad2, aqi)
        )
        sq = aqi[order]
        su, sstarts, scounts = np.unique(sq, return_index=True, return_counts=True)
        take = np.minimum(scounts, k)
        ranks = _grouped_arange(take) + 1
        sel = order[np.repeat(sstarts, take) + ranks - 1]
        out = {
            query_key: keys[aqi[sel]],
            "rank": ranks,
            "dist": np.sqrt(ad2[sel]),
        }
        for c2 in point_cols:
            out[c2] = cols[c2][sel]
        return pa.table(out)

    if num_query_blocks:
        # spatial locality, not round-robin: scattered queries make
        # EVERY block fetch rings over most of the populated grid, so
        # the index ships ~num_query_blocks times through the shard
        # RPCs. Sorting by cell key first gives each block a compact
        # key range — per-batch ring fetches overlap (the cell cache
        # hits) and total fetch volume drops toward one index copy.
        # The query table is the small side by contract, so the sort
        # is cheap relative to the fetch traffic it removes.
        def _cell_key(t: pa.Table) -> pa.Table:
            cx = np.floor(
                (t[qx].to_numpy(zero_copy_only=False) - minx) / res
            ).astype(np.int64)
            cy = np.floor(
                (t[qy].to_numpy(zero_copy_only=False) - miny) / res
            ).astype(np.int64)
            return t.append_column("__cell", pa.array(_pack(cx, cy)))

        queries = (
            queries.map_batches(_cell_key, batch_format="pyarrow")
            .sort("__cell")
            .repartition(num_query_blocks)
        )
    return queries.map_batches(per_batch, batch_format="pyarrow")
