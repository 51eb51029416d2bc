"""Distributed interval-overlap join — intervals × intervals, the
general case the as-of join (point-in-interval, ops/asof.py) and the
session containment composition (queries_text.q_session_assign) do
not cover.

Semantics: CLOSED intervals on an int64 axis (timestamps normalize to
epoch micros). Pair (l, r) is emitted iff

    l_start <= r_end  AND  r_start <= l_end      (+ l.key == r.key
                                                  when `key` is given)

— touching endpoints count, like SQL `l.s <= r.e AND r.s <= l.e`.
Reference analog: the per-overlay tile intersection tests geotools
runs while mosaicking (src/mosaic.cpp:270-303 computes pairwise
image-intersection bounds) generalized from "driver loop over N
images" to a distributed set-vs-set overlap join on one axis.

Distribution — the 1-D analog of the cell-bucketed spatial range join
(ops/celljoin.py:149):

* the axis is cut into width-W buckets; every SHORT interval
  (bucket span <= long_span_buckets) replicates to each bucket it
  overlaps — a vectorized repeat/arange explode, no Python per row;
* ONE hash-partitioned grouped exchange on (bucket [, key]) joins
  each bucket locally: rights of a partition are lexsorted by
  (group, start) once, every left row finds its candidate range with
  two global searchsorteds (groups made offset-monotonic exactly like
  ops/window.py's trailing windows, same overflow-checked fallback),
  and candidates are enumerated in pair_chunk-bounded tiles;
* a pair is emitted EXACTLY ONCE: only by the bucket containing
  max(l_start, r_start). Both rows provably replicate into it —
  l_s <= max_s <= min_e <= l_e (ditto right) — so no cross-bucket
  dedup shuffle is ever needed;
* intervals spanning MORE than long_span_buckets buckets would blow
  replication O(span/W). They take a BROADCAST tier instead: each
  side's long rows are collected (loud error past long_limit — at
  that point pick a bigger W), ray.put ONCE, and probed vectorized
  against every batch of the other side's short rows; long × long
  resolves in one driver-side vectorized pass over the two small
  sets. The four tiers (short×short, long×short, short×long,
  long×long) partition the pair space, so their union is exact.

PARTITIONING ASSUMPTION (north_rule): one (bucket, key) group's rows
fit in a worker's heap — size W so a bucket's expected occupancy is
bounded; skewed buckets are the long tier's job only when the skew
comes from span, not density (a dense hot bucket needs a smaller W).

Scale: shuffle volume = rows × (1 + mean bucket span) × row width —
independent of output size; candidate enumeration is bounded per tile
by pair_chunk; output streams straight out of the grouped exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.grouped import grouped_map
from .asof import _on_to_int64

_EPS_GUARD = 1 << 62


def _norm_se(t: pa.Table, s: str, e: str) -> tuple[np.ndarray, np.ndarray]:
    sv = _on_to_int64(t[s].combine_chunks()).to_numpy()
    ev = _on_to_int64(t[e].combine_chunks()).to_numpy()
    if (sv > ev).any():
        bad = int((sv > ev).sum())
        raise ValueError(
            f"{bad} interval(s) with start > end ({s} > {e}) — fix or "
            "filter upstream (a negative-length interval has no overlap "
            "semantics)"
        )
    return sv, ev


def _bucket_span(sv: np.ndarray, ev: np.ndarray, w: int) -> np.ndarray:
    return (ev // w - sv // w + 1).astype(np.int64)


def _derive_width(left, right, l_start, l_end, r_start, r_end,
                  num_parts: int) -> int:
    """One cheap pass per side: per-batch (min start, max end) rows,
    reduced on the driver. W targets ~8 buckets per shuffle partition
    so partition occupancy stays bounded without exploding
    replication for typical (span << period) intervals."""

    def mk(s, e):
        def f(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"lo": pa.array([], pa.int64()),
                                 "hi": pa.array([], pa.int64())})
            sv, ev = _norm_se(t, s, e)
            return pa.table({"lo": pa.array([int(sv.min())]),
                             "hi": pa.array([int(ev.max())])})
        return f

    rows = (left.map_batches(mk(l_start, l_end), batch_format="pyarrow")
            .union(right.map_batches(mk(r_start, r_end),
                                     batch_format="pyarrow"))
            .take_all())
    if not rows:
        return 1
    lo = min(r["lo"] for r in rows)
    hi = max(r["hi"] for r in rows)
    return max(1, (hi - lo) // max(1, 8 * num_parts) + 1)


def interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    l_cols: list[str],
    r_cols: list[str],
    key: str | None = None,
    bucket_width: int | None = None,
    num_parts: int | None = None,
    long_span_buckets: int = 64,
    long_limit: int = 200_000,
    pair_chunk: int = 1 << 22,
) -> ray.data.Dataset:
    """-> one row per overlapping (left, right) pair: [key?] + l_cols
    + r_cols + ov_start/ov_end (int64 overlap window, closed). l_cols
    / r_cols must be disjoint names (rename upstream); include the
    start/end columns themselves if the caller wants them (they ride
    as int64). See module docstring for the distribution contract."""
    if set(l_cols) & set(r_cols):
        raise ValueError(
            f"l_cols/r_cols share names: {sorted(set(l_cols) & set(r_cols))}"
            " — rename one side upstream"
        )
    reserved = {"ov_start", "ov_end", "_s", "_e", "_b", "_side"}
    clash = reserved & (set(l_cols) | set(r_cols) | ({key} if key else set()))
    if clash:
        raise ValueError(f"reserved output names used as columns: {sorted(clash)}")
    if long_span_buckets < 1:
        raise ValueError("long_span_buckets must be >= 1")
    P = num_parts
    if P is None:
        from ..stages.grouped import default_num_parts
        P = default_num_parts()
    if bucket_width is None:
        bucket_width = _derive_width(
            left, right, l_start, l_end, r_start, r_end, P)
    W = int(bucket_width)
    if W < 1:
        raise ValueError("bucket_width must be >= 1")

    ls, rs = left.schema(), right.schema()
    lpa = pa.schema(list(zip(ls.names, ls.types)))
    rpa = pa.schema(list(zip(rs.names, rs.types)))
    for c in l_cols:
        if c not in lpa.names:
            raise KeyError(f"l_cols column {c!r} not in left schema")
    for c in r_cols:
        if c not in rpa.names:
            raise KeyError(f"r_cols column {c!r} not in right schema")
    if key is not None:
        if key not in lpa.names or key not in rpa.names:
            raise KeyError(f"key {key!r} must exist on both sides")
        if lpa.field(key).type != rpa.field(key).type:
            raise TypeError(
                f"key dtype mismatch: {lpa.field(key).type} vs "
                f"{rpa.field(key).type}")

    def _otype(c: str) -> pa.DataType:
        st = lpa if c in l_cols else rpa
        if c in (l_start, l_end) and c in l_cols:
            return pa.int64()
        if c in (r_start, r_end) and c in r_cols:
            return pa.int64()
        return st.field(c).type

    out_names = ([key] if key else []) + l_cols + r_cols + ["ov_start", "ov_end"]

    def _out_type(name: str) -> pa.DataType:
        if name in ("ov_start", "ov_end"):
            return pa.int64()
        if key is not None and name == key:
            return lpa.field(key).type
        return _otype(name)

    def _empty_out() -> pa.Table:
        return pa.table({n: pa.nulls(0, _out_type(n)) for n in out_names})

    def _payload(t: pa.Table, c: str, s: str, e: str,
                 sv: np.ndarray, ev: np.ndarray):
        # start/end columns ride normalized (int64 micros)
        if c == s:
            return pa.array(sv)
        if c == e:
            return pa.array(ev)
        return t[c].combine_chunks()

    # ---------- tag + split + replicate (bucket tier) ----------
    def _check_key(t: pa.Table):
        if key is not None and t[key].null_count:
            raise ValueError(
                f"interval_join key column {key!r} contains nulls — a "
                "null key has no partition; filter or fill upstream")

    def mk_tag(side: int, s: str, e: str, my_cols: list[str],
               other_cols: list[str], other_type):
        def tag(t: pa.Table) -> pa.Table:
            _check_key(t)
            sv, ev = _norm_se(t, s, e)
            short = _bucket_span(sv, ev, W) <= long_span_buckets
            if not short.all():
                m = pa.array(short)
                keep = np.flatnonzero(short)
                sv, ev = sv[keep], ev[keep]
                t = t.filter(m)
            b0, b1 = sv // W, ev // W
            counts = (b1 - b0 + 1)
            total = int(counts.sum())
            idx = np.repeat(np.arange(len(t), dtype=np.int64), counts)
            offs = np.repeat(np.cumsum(counts) - counts, counts)
            bucket = b0[idx] + (np.arange(total, dtype=np.int64) - offs)
            cols: dict = {}
            if key is not None:
                cols[key] = t[key].combine_chunks().take(pa.array(idx))
            cols["_b"] = pa.array(bucket)
            cols["_side"] = pa.array(
                np.full(total, side, dtype=np.int8))
            cols["_s"] = pa.array(sv[idx])
            cols["_e"] = pa.array(ev[idx])
            for c in my_cols:
                cols[c] = _payload(t, c, s, e, sv, ev).take(pa.array(idx))
            for c in other_cols:
                cols[c] = pa.nulls(total, other_type(c))
            # canonical column order — the two sides of the union must
            # be schema-identical
            order = ([key] if key else []) + ["_b", "_side", "_s", "_e"] \
                + l_cols + r_cols
            return pa.table({nm: cols[nm] for nm in order})
        return tag

    def _ltype(c): return pa.int64() if c in (l_start, l_end) else lpa.field(c).type
    def _rtype(c): return pa.int64() if c in (r_start, r_end) else rpa.field(c).type

    u = left.map_batches(
        mk_tag(1, l_start, l_end, l_cols, r_cols, _rtype),
        batch_format="pyarrow",
    ).union(right.map_batches(
        mk_tag(0, r_start, r_end, r_cols, l_cols, _ltype),
        batch_format="pyarrow",
    ))

    def per_part(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = len(t)
        if n == 0:
            return _empty_out()
        side = t["_side"].to_numpy()
        b = t["_b"].to_numpy()
        s = t["_s"].to_numpy()
        e = t["_e"].to_numpy()
        # exact group ids: factorize bucket (and key) -> dense codes
        if key is not None:
            kcode, _ = pd.factorize(
                t[key].to_numpy(zero_copy_only=False), sort=False)
            bcode, _ = pd.factorize(b, sort=False)
            gid = bcode.astype(np.int64) * (kcode.max() + 1) + kcode
            # re-densify so offsets stay small
            gid, _ = pd.factorize(gid, sort=False)
            gid = gid.astype(np.int64)
        else:
            gid, _ = pd.factorize(b, sort=False)
            gid = gid.astype(np.int64)

        lmask = side == 1
        li = np.flatnonzero(lmask)
        ri = np.flatnonzero(~lmask)
        if len(li) == 0 or len(ri) == 0:
            return _empty_out()
        gl, sl, el, bl = gid[li], s[li], e[li], b[li]
        gr, sr, er = gid[ri], s[ri], e[ri]
        order = np.lexsort((sr, gr))
        gr, sr, er, ri = gr[order], sr[order], er[order], ri[order]
        seg_lo = np.searchsorted(gr, gl, side="left")
        # probe: last right with start <= l_end inside the group.
        lo_all = min(int(s.min()), int(e.min()))
        hi_all = max(int(s.max()), int(e.max()))
        M = hi_all - lo_all + 2
        ng = int(gid.max()) + 1
        if M * ng < _EPS_GUARD:
            om_r = (sr - lo_all) + gr * np.int64(M)
            om_p = (el - lo_all) + gl * np.int64(M)
            hi = np.searchsorted(om_r, om_p, side="right")
        else:  # astronomical spans: per-group fallback
            hi = np.empty(len(li), dtype=np.int64)
            seg_hi = np.searchsorted(gr, gl, side="right")
            for i in range(len(li)):
                a, z = seg_lo[i], seg_hi[i]
                hi[i] = a + np.searchsorted(sr[a:z], el[i], side="right")
        counts = hi - seg_lo
        outs: list[pa.Table] = []
        pos = 0
        csum = np.cumsum(counts)
        while pos < len(li):
            stop = int(np.searchsorted(
                csum, (csum[pos - 1] if pos else 0) + pair_chunk,
                side="left")) + 1
            stop = min(max(stop, pos + 1), len(li))
            c = counts[pos:stop]
            tot = int(c.sum())
            if tot:
                lrep = np.repeat(np.arange(pos, stop, dtype=np.int64), c)
                offs = np.repeat(np.cumsum(c) - c, c)
                rj = seg_lo[lrep] + (np.arange(tot, dtype=np.int64) - offs)
                ms = np.maximum(sl[lrep], sr[rj])
                ok = (er[rj] >= sl[lrep]) & (ms // W == bl[lrep])
                if ok.any():
                    lrep, rj, ms = lrep[ok], rj[ok], ms[ok]
                    me = np.minimum(el[lrep], er[rj])
                    lt = pa.array(li[lrep])
                    rt = pa.array(ri[rj])
                    cols = {}
                    if key is not None:
                        cols[key] = t[key].take(lt)
                    for c2 in l_cols:
                        cols[c2] = t[c2].take(lt)
                    for c2 in r_cols:
                        cols[c2] = t[c2].take(rt)
                    cols["ov_start"] = pa.array(ms)
                    cols["ov_end"] = pa.array(me)
                    outs.append(pa.table({nm: cols[nm] for nm in out_names}))
            pos = stop
        if not outs:
            return _empty_out()
        return pa.concat_tables(outs)

    bucket_ds = grouped_map(
        u, (["_b", key] if key else ["_b"]), per_part,
        num_parts=P, batch_format="pyarrow",
    )

    # ---------- broadcast tiers (long rows) ----------
    def _collect_long(ds, s, e, cols):
        def lng(t: pa.Table) -> pa.Table:
            _check_key(t)
            sv, ev = _norm_se(t, s, e)
            m = _bucket_span(sv, ev, W) > long_span_buckets
            out = {}
            kk = np.flatnonzero(m)
            out["_s"] = pa.array(sv[kk])
            out["_e"] = pa.array(ev[kk])
            ix = pa.array(kk)
            if key is not None:
                out[key] = t[key].combine_chunks().take(ix)
            for c in cols:
                out[c] = _payload(t, c, s, e, sv, ev).take(ix)
            return pa.table(out)
        sub = ds.map_batches(lng, batch_format="pyarrow")
        rows = sub.limit(long_limit + 1).take_all()
        if len(rows) > long_limit:
            raise ValueError(
                f"more than long_limit={long_limit} intervals span > "
                f"{long_span_buckets} buckets of width {W} — increase "
                "bucket_width (or long_span_buckets) so replication "
                "stays bounded")
        # explicit schema: from_pylist's inference would widen/narrow
        # dtypes (int32 key -> int64) and break the output union
        fields = [pa.field("_s", pa.int64()), pa.field("_e", pa.int64())]
        if key is not None:
            fields.append(pa.field(key, lpa.field(key).type))
        src = lpa if cols is l_cols else rpa
        for c in cols:
            typ = pa.int64() if c in (s, e) else src.field(c).type
            fields.append(pa.field(c, typ))
        tb = pa.Table.from_pylist(rows, schema=pa.schema(fields))
        if len(tb) == 0:
            return tb
        o = pa.array(np.argsort(tb["_s"].to_numpy(zero_copy_only=False),
                                kind="stable"))
        return tb.take(o)

    long_l = _collect_long(left, l_start, l_end, l_cols)
    long_r = _collect_long(right, r_start, r_end, r_cols)

    def mk_probe(long_tb: pa.Table, long_is_left: bool, s: str, e: str,
                 short_cols: list[str]):
        """map over the OTHER side's short rows, probing the broadcast
        long table (sorted by _s)."""
        import ray as _ray
        ref = _ray.put(long_tb)

        def probe(t: pa.Table) -> pa.Table:
            _check_key(t)
            lt = _ray.get(ref)
            nlg = len(lt)
            sv, ev = _norm_se(t, s, e)
            short = _bucket_span(sv, ev, W) <= long_span_buckets
            kk = np.flatnonzero(short)
            if nlg == 0 or len(kk) == 0:
                return _empty_out()
            sv, ev = sv[kk], ev[kk]
            t2 = t.take(pa.array(kk))
            Ls = lt["_s"].to_numpy()
            Le = lt["_e"].to_numpy()
            hi = np.searchsorted(Ls, ev, side="right")
            outs = []
            pos, csum = 0, np.cumsum(hi)
            while pos < len(kk):
                stop = int(np.searchsorted(
                    csum, (csum[pos - 1] if pos else 0) + pair_chunk,
                    side="left")) + 1
                stop = min(max(stop, pos + 1), len(kk))
                c = hi[pos:stop]
                tot = int(c.sum())
                if tot:
                    srep = np.repeat(np.arange(pos, stop, dtype=np.int64), c)
                    offs = np.repeat(np.cumsum(c) - c, c)
                    gj = np.arange(tot, dtype=np.int64) - offs
                    ok = Le[gj] >= sv[srep]
                    if key is not None:
                        kl = lt[key].to_numpy(zero_copy_only=False)
                        ks = t2[key].to_numpy(zero_copy_only=False)
                        ok &= kl[gj] == ks[srep]
                    if ok.any():
                        srep, gj = srep[ok], gj[ok]
                        ms = np.maximum(sv[srep], Ls[gj])
                        me = np.minimum(ev[srep], Le[gj])
                        st = pa.array(srep)
                        gt = pa.array(gj)
                        cols = {}
                        if key is not None:
                            cols[key] = t2[key].combine_chunks().take(st)
                        lsrc = lt if long_is_left else t2
                        rsrc = t2 if long_is_left else lt
                        lix = gt if long_is_left else st
                        rix = st if long_is_left else gt
                        for c2 in l_cols:
                            col = lsrc[c2]
                            if isinstance(col, pa.ChunkedArray):
                                col = col.combine_chunks()
                            cols[c2] = col.take(lix)
                        for c2 in r_cols:
                            col = rsrc[c2]
                            if isinstance(col, pa.ChunkedArray):
                                col = col.combine_chunks()
                            cols[c2] = col.take(rix)
                        # short side's payloads for its own s/e were
                        # normalized in _payload; for the SHORT side
                        # here they come from t2 pre-normalization —
                        # re-emit normalized values
                        for c2, arr in ((s, sv), (e, ev)):
                            if c2 in short_cols:
                                cols[c2] = pa.array(arr[srep])
                        cols["ov_start"] = pa.array(ms)
                        cols["ov_end"] = pa.array(me)
                        outs.append(
                            pa.table({nm: cols[nm] for nm in out_names}))
                pos = stop
            if not outs:
                return _empty_out()
            return pa.concat_tables(outs)
        return probe

    parts = [bucket_ds]
    if len(long_l):
        parts.append(right.map_batches(
            mk_probe(long_l, True, r_start, r_end, r_cols),
            batch_format="pyarrow"))
    if len(long_r):
        parts.append(left.map_batches(
            mk_probe(long_r, False, l_start, l_end, l_cols),
            batch_format="pyarrow"))
    if len(long_l) and len(long_r):
        # long × long: both small (<= long_limit); one vectorized pass
        Ls, Le = long_l["_s"].to_numpy(), long_l["_e"].to_numpy()
        Rs, Re = long_r["_s"].to_numpy(), long_r["_e"].to_numpy()
        hi = np.searchsorted(Rs, Le, side="right")
        lrep = np.repeat(np.arange(len(Ls), dtype=np.int64), hi)
        offs = np.repeat(np.cumsum(hi) - hi, hi)
        rj = np.arange(int(hi.sum()), dtype=np.int64) - offs
        ok = Re[rj] >= Ls[lrep]
        if key is not None:
            kl = long_l[key].to_numpy(zero_copy_only=False)
            kr = long_r[key].to_numpy(zero_copy_only=False)
            ok &= kl[lrep] == kr[rj]
        lrep, rj = lrep[ok], rj[ok]
        cols = {}
        lt_, rt_ = pa.array(lrep), pa.array(rj)
        if key is not None:
            cols[key] = long_l[key].combine_chunks().take(lt_)
        for c2 in l_cols:
            cols[c2] = long_l[c2].combine_chunks().take(lt_)
        for c2 in r_cols:
            cols[c2] = long_r[c2].combine_chunks().take(rt_)
        cols["ov_start"] = pa.array(np.maximum(Ls[lrep], Rs[rj]))
        cols["ov_end"] = pa.array(np.minimum(Le[lrep], Re[rj]))
        ll = pa.table({nm: cols[nm] for nm in out_names})
        if len(ll):
            parts.append(ray.data.from_arrow(ll))
    out = parts[0]
    if len(parts) > 1:
        out = out.union(*parts[1:])
    return out


def interval_flatten(
    ds: ray.data.Dataset,
    *,
    key: str,
    start: str,
    end: str,
    gap: int = 0,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Per-key interval union (SQL gaps-and-islands): merge CLOSED
    intervals that overlap or sit within `gap` of each other into
    maximal islands. -> (key, ivl_start, ivl_end int64, n_merged) —
    one island row per maximal merged run.

    One hash-partitioned grouped exchange on `key`; per partition the
    kernel is fully vectorized: lexsort by (key, start, end), per-key
    running cummax of `end` (pandas' cython grouped cummax — no
    Python per key), island breaks where start > prev_cummax + gap,
    and per-island reduction via np.maximum.reduceat on the break
    offsets. Touching endpoints (start == prev end, gap=0) MERGE —
    closed intervals share the point. The flightline interval-union
    (ops/flightline.py, U2) is the keyless special case of this
    operator; reference analog: geotools' segment-merge pass
    (src/flightline.cpp interval coalescing).
    """
    if gap < 0:
        raise ValueError("gap must be >= 0")
    sch = ds.schema()
    spa = pa.schema(list(zip(sch.names, sch.types)))
    for c in (key, start, end):
        if c not in spa.names:
            raise KeyError(f"column {c!r} not in schema")
    ktype = spa.field(key).type
    G = int(gap)

    def _empty() -> pa.Table:
        return pa.table({
            key: pa.nulls(0, ktype),
            "ivl_start": pa.array([], pa.int64()),
            "ivl_end": pa.array([], pa.int64()),
            "n_merged": pa.array([], pa.int64()),
        })

    def tag(t: pa.Table) -> pa.Table:
        if t[key].null_count:
            raise ValueError(
                f"interval_flatten key column {key!r} contains nulls")
        sv, ev = _norm_se(t, start, end)
        return pa.table({key: t[key], "_s": pa.array(sv),
                         "_e": pa.array(ev)})

    def per_part(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = len(t)
        if n == 0:
            return _empty()
        kv = t[key].to_numpy(zero_copy_only=False)
        sv = t["_s"].to_numpy()
        ev = t["_e"].to_numpy()
        order = np.lexsort((ev, sv, kv))
        kv, sv, ev = kv[order], sv[order], ev[order]
        kcode, _ = pd.factorize(kv, sort=False)
        # per-key running max of end (cython grouped cummax)
        cmax = pd.Series(ev).groupby(kcode).cummax().to_numpy()
        brk = np.ones(n, dtype=bool)
        if n > 1:
            same_key = kcode[1:] == kcode[:-1]
            # overflow-safe for the FULL int64 domain: gate on
            # sv > cmax first, then take the difference in uint64 —
            # wrapping subtraction is the exact positive difference
            # mod 2^64, and a positive int64 difference is < 2^64, so
            # the compare is exact even when the raw int64 subtraction
            # would wrap (start near +2^62 after an island ending
            # near -2^62)
            above = sv[1:] > cmax[:-1]
            diff = sv[1:].astype(np.uint64) - cmax[:-1].astype(np.uint64)
            brk[1:] = ~same_key | (above & (diff > np.uint64(G)))
        starts = np.flatnonzero(brk)
        ends_excl = np.append(starts[1:], n)
        ivl_end = np.maximum.reduceat(ev, starts)
        out = pa.table({
            key: pa.array(kv[starts]).cast(ktype),
            "ivl_start": pa.array(sv[starts]),
            "ivl_end": pa.array(ivl_end),
            "n_merged": pa.array(ends_excl - starts),
        })
        return out

    return grouped_map(
        ds.map_batches(tag, batch_format="pyarrow"),
        [key], per_part, num_parts=num_parts, batch_format="pyarrow",
    )
