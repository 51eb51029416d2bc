"""Cell-bucketed spatial joins — the scale path named by the north
star: kNN via CELL-RING EXPANSION and the large-large range join.

Both sides are keyed by a grid cell at resolution ~ the query radius.
The point side is built into a cell -> rows index ONCE (broadcast via
ray.put for moderate sizes; at design scale the same structure is an
actor-sharded index partitioned by parent cell — the ST3 KD-tree
replacement, reference include/nanoflann.hpp + J9).

kNN ring closure: after searching all cells with Chebyshev ring
distance <= d, any unseen point is at least (d * res) away from the
query cell's BOUNDARY, i.e. >= max(0, d-... ) — we use the safe bound
dist_min(ring d) = (d - 1) * res for a query anywhere in its cell.
Expansion stops when k candidates are found AND the k-th candidate
distance <= (next_ring - 1) * res, so no farther ring can improve the
result — the guarantee the north star requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..kernels.grid import Bounds


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
    cols = {}
    for batch in points.iter_batches(batch_format="pyarrow"):
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        c = np.floor((x - bounds.minx) / res).astype(np.int64)
        r = np.floor((y - bounds.miny) / res).astype(np.int64)
        key = c * (1 << 22) + r
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        starts = np.searchsorted(key_s, np.unique(key_s))
        uniq = np.unique(key_s)
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
    return ray.put((index, res, bounds.minx, bounds.miny))


def knn_cell_ring(
    queries: ray.data.Dataset,
    index_ref,
    k: int,
    qx: str = "sx",
    qy: str = "sy",
    query_key: str = "s_suppkey",
    point_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    max_ring: int = 64,
) -> ray.data.Dataset:
    """-> (query_key, rank, point_cols..., dist), ranked by
    (d2, *point_cols) — identical ordering to the brute-force kNN and
    the SQL oracle."""

    def per_batch(t: pa.Table) -> pa.Table:
        index, res, minx, miny = ray.get(index_ref)
        xs = t[qx].to_numpy(zero_copy_only=False)
        ys = t[qy].to_numpy(zero_copy_only=False)
        keys = t[query_key].to_numpy(zero_copy_only=False)
        out = {query_key: [], "rank": [], "dist": []}
        for c in point_cols:
            out[c] = []
        for i in range(len(xs)):
            qc = int(np.floor((xs[i] - minx) / res))
            qr = int(np.floor((ys[i] - miny) / res))
            cand = {c2: [] for c2 in ("x", "y", *point_cols)}
            n_found = 0
            kth_d = np.inf
            ring = 0
            while ring <= max_ring:
                # cells at Chebyshev distance == ring
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
                    ent = index.get(cc * (1 << 22) + rr)
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
                    if kth_d <= ring * res:
                        break
                ring += 1
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
            empty = {query_key: pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
                     "dist": pa.array([], pa.float64())}
            for c2 in point_cols:
                empty[c2] = pa.array([], pa.int64())
            return pa.table(empty)
        return pa.table({c2: np.concatenate(v) for c2, v in out.items()})

    return queries.map_batches(per_batch, batch_format="pyarrow")


def range_join_cells(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    radius: float,
    bounds: Bounds,
    left_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    right_cols: tuple[str, ...] = ("s_suppkey",),
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Large-large range join: both sides bucketed by cell at
    res = radius; each RIGHT (smaller) row is replicated to its cell's
    3x3 ring so every candidate pair co-locates in one partition — the
    big side is keyed ONCE (shuffle volume: |L| + 9|R|, not 9|L|);
    exact d2 refine inside. One shuffle per side; no broadcast."""
    from ..stages.grouped import grouped_map

    res = radius
    r2 = radius * radius

    def key_left(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        c = np.floor((x - bounds.minx) / res).astype(np.int64)
        r = np.floor((y - bounds.miny) / res).astype(np.int64)
        cols = {"cell": c * (1 << 22) + r, "x": x, "y": y,
                "side": np.zeros(len(x), dtype=np.int8)}
        for col in left_cols:
            cols[col] = t[col].to_numpy(zero_copy_only=False)
        for col in right_cols:
            cols[col] = np.zeros(len(x), dtype=np.int64)
        return pa.table(cols)

    def key_right(t: pa.Table) -> pa.Table:
        x = t["rx"].to_numpy(zero_copy_only=False)
        y = t["ry"].to_numpy(zero_copy_only=False)
        c = np.floor((x - bounds.minx) / res).astype(np.int64)
        r = np.floor((y - bounds.miny) / res).astype(np.int64)
        n = len(x)
        reps = []
        for dc in (-1, 0, 1):
            for dr in (-1, 0, 1):
                reps.append(((c + dc) * (1 << 22) + (r + dr)))
        cell = np.concatenate(reps)
        idx = np.tile(np.arange(n), 9)
        cols = {"cell": cell, "x": x[idx], "y": y[idx],
                "side": np.ones(len(idx), dtype=np.int8)}
        for col in left_cols:
            cols[col] = np.zeros(len(idx), dtype=np.int64)
        for col in right_cols:
            cols[col] = t[col].to_numpy(zero_copy_only=False)[idx]
        return pa.table(cols)

    both = left.map_batches(key_left, batch_format="pyarrow").union(
        right.map_batches(key_right, batch_format="pyarrow")
    )

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

    def add(self, table: pa.Table):
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

    def __init__(self, actors, res, minx, miny, num_shards):
        self.actors = actors
        self.res = res
        self.minx = minx
        self.miny = miny
        self.num_shards = num_shards

    def shard_for_key(self, key: int) -> int:
        c = key >> 22
        r = key & ((1 << 22) - 1)
        return int(
            _shard_of(
                np.array([c // PARENT]), np.array([r // PARENT]), self.num_shards
            )[0]
        )

    def fetch(self, keys: list[int]) -> dict:
        """Batched lookup: one get_cells RPC per shard that owns any
        of `keys`."""
        by_shard: dict[int, list[int]] = {}
        for k in keys:
            by_shard.setdefault(self.shard_for_key(k), []).append(k)
        futs = [self.actors[s].get_cells.remote(ks) for s, ks in by_shard.items()]
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
    actors = [CellShardActor.remote() for _ in range(num_shards)]

    def push(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        c = np.floor((x - bounds.minx) / res).astype(np.int64)
        r = np.floor((y - bounds.miny) / res).astype(np.int64)
        key = c * (1 << 22) + r
        shard = _shard_of(c // PARENT, r // PARENT, num_shards)
        cols = {"cell": key, "x": x, "y": y}
        for col in keep_cols:
            cols[col] = t[col].to_numpy(zero_copy_only=False)
        payload = pa.table(cols)
        futs = []
        for s in np.unique(shard):
            futs.append(actors[s].add.remote(payload.filter(pa.array(shard == s))))
        ray.get(futs)  # backpressure: don't let adds pile up unbounded
        return pa.table({"n": np.array([len(x)], dtype=np.int64)})

    points.map_batches(push, batch_format="pyarrow").materialize()
    ray.get([a.seal.remote() for a in actors])
    return ShardedCellIndex(actors, res, bounds.minx, bounds.miny, num_shards)


def knn_cell_ring_sharded(
    queries: ray.data.Dataset,
    index: ShardedCellIndex,
    k: int,
    qx: str = "sx",
    qy: str = "sy",
    query_key: str = "s_suppkey",
    point_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    max_ring: int = 64,
) -> ray.data.Dataset:
    """kNN ring expansion against the sharded index: each query batch
    expands its rings LOCKSTEP — all still-open queries' ring-d cells
    are fetched in ONE batched RPC round per ring."""
    res = index.res
    minx, miny = index.minx, index.miny

    def per_batch(t: pa.Table) -> pa.Table:
        xs = t[qx].to_numpy(zero_copy_only=False)
        ys = t[qy].to_numpy(zero_copy_only=False)
        keys = t[query_key].to_numpy(zero_copy_only=False)
        n = len(xs)
        qc = np.floor((xs - minx) / res).astype(np.int64)
        qr = np.floor((ys - miny) / res).astype(np.int64)
        cand = [{c2: [] for c2 in ("x", "y", *point_cols)} for _ in range(n)]
        found = np.zeros(n, dtype=np.int64)
        done = np.zeros(n, dtype=bool)
        cache: dict = {}
        for ring in range(max_ring + 1):
            open_idx = np.nonzero(~done)[0]
            if not len(open_idx):
                break
            # all (query, cell) needs of this ring
            need: dict[int, list[int]] = {}
            for i in open_idx:
                if ring == 0:
                    cells = [(qc[i], qr[i])]
                else:
                    cells = []
                    for dc in range(-ring, ring + 1):
                        cells.append((qc[i] + dc, qr[i] - ring))
                        cells.append((qc[i] + dc, qr[i] + ring))
                    for dr in range(-ring + 1, ring):
                        cells.append((qc[i] - ring, qr[i] + dr))
                        cells.append((qc[i] + ring, qr[i] + dr))
                for cc, rr in cells:
                    kk = int(cc) * (1 << 22) + int(rr)
                    need.setdefault(kk, []).append(i)
            missing = [kk for kk in need if kk not in cache]
            if missing:
                cache.update(index.fetch(missing))
                for kk in missing:
                    cache.setdefault(kk, None)
            for kk, qis in need.items():
                ent = cache[kk]
                if ent is None:
                    continue
                for i in qis:
                    for c2 in cand[i]:
                        cand[i][c2].append(ent[c2])
                    found[i] += len(ent["x"])
            # ring-closure test per still-open query
            for i in open_idx:
                if found[i] >= k:
                    cx = np.concatenate(cand[i]["x"])
                    cy = np.concatenate(cand[i]["y"])
                    d2 = (cx - xs[i]) ** 2 + (cy - ys[i]) ** 2
                    kk2 = min(k, len(d2))
                    kth = np.sqrt(np.partition(d2, kk2 - 1)[kk2 - 1])
                    if kth <= ring * res:
                        done[i] = True
        out = {query_key: [], "rank": [], "dist": []}
        for c2 in point_cols:
            out[c2] = []
        for i in range(n):
            if not cand[i]["x"]:
                continue
            cx = np.concatenate(cand[i]["x"])
            cy = np.concatenate(cand[i]["y"])
            d2 = (cx - xs[i]) ** 2 + (cy - ys[i]) ** 2
            tb = {c2: np.concatenate(cand[i][c2]) for c2 in point_cols}
            order = np.lexsort(tuple(tb[c2] for c2 in reversed(point_cols)) + (d2,))
            sel = order[: min(k, len(order))]
            out[query_key].append(np.full(len(sel), keys[i]))
            out["rank"].append(np.arange(1, len(sel) + 1, dtype=np.int64))
            out["dist"].append(np.sqrt(d2[sel]))
            for c2 in point_cols:
                out[c2].append(tb[c2][sel])
        if not out[query_key]:
            empty = {query_key: pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
                     "dist": pa.array([], pa.float64())}
            for c2 in point_cols:
                empty[c2] = pa.array([], pa.int64())
            return pa.table(empty)
        return pa.table({c2: np.concatenate(v) for c2, v in out.items()})

    return queries.map_batches(per_batch, batch_format="pyarrow")
