"""Wide (SIMD-across-lanes) baseline JPEG codec.

JPEG entropy coding is strictly sequential WITHIN a restart segment —
each Huffman code's position depends on every bit before it — which is
why a straight per-image decoder costs ~35 ms/image in pure Python and
cannot feed a 2M-image pipeline. But restart segments (and whole
images) are INDEPENDENT streams: T.81's RSTn markers byte-align the
stream and reset DC prediction, so every segment decodes from a clean
state. This module exploits that the same way GPU JPEG decoders do
(e.g. nvJPEG's batched decode): it runs ONE numpy state machine over
thousands of segments at once — each vector op advances one Huffman
symbol in every active lane — so the per-symbol cost is a few
nanoseconds of vector work instead of microseconds of interpreter
dispatch. Measured >100x over the scalar decoder on the bulk table's
payload mix.

Both directions are covered:

  decode_jpeg_batch(payloads) -> list of uint8 pixel arrays,
      bit-identical to codecs.decode_jpeg on every supported file
      (baseline, 8-bit, 4:4:4 or grayscale, with or without restart
      markers; mixed sizes/tables within one batch are fine).

  encode_jpeg_stack(pixels, quality, restart_interval) -> list[bytes]
      for a (n, h, w[, 3]) same-size stack, byte-identical to
      codecs.encode_jpeg(px, quality, restart_interval) per image:
      vectorized RLE -> Huffman gather -> prefix-sum bit packing.

The scalar codec in codecs.py is the correctness oracle for both
(asserted in tests/test_jpegwide.py); this module is the throughput
path the 2M-row flagship table runs through.

Everything here is deterministic, Ray-free, and pure numpy + stdlib.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import (
    _HT_AC_CHR,
    _HT_AC_LUM,
    _HT_DC_CHR,
    _HT_DC_LUM,
    _QT_CHR,
    _QT_LUM,
    _T,
    _ZZ,
    _huff_encode_table,
    _quality_tables,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    entropy_segments,
)

# ---------------------------------------------------------------------------
# decode

_ZZA = np.asarray(_ZZ, dtype=np.int64)  # zigzag k -> natural index
_DEC_TAB_CACHE: dict = {}


def _dec_tables(bits, vals) -> np.ndarray:
    """16-bit-peek LUT as ONE packed int16 numpy row (the wide decoder
    does a single fancy-indexed gather per symbol): entry =
    (code_len << 8) | symbol; 0 marks an invalid prefix. Cached by
    table content."""
    key = (bytes(bits), bytes(vals))
    hit = _DEC_TAB_CACHE.get(key)
    if hit is not None:
        return hit
    packed = np.zeros(1 << 16, dtype=np.int16)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            packed[lo : lo + (1 << (16 - length))] = (length << 8) | vals[k]
            code += 1
            k += 1
        code <<= 1
    if len(_DEC_TAB_CACHE) < 64:  # bound worker memory on hostile inputs
        _DEC_TAB_CACHE[key] = packed
    return packed


class _Meta:
    __slots__ = (
        "h", "w", "ncomp", "dri", "qt_zz", "dc_bv", "ac_bv", "entropy",
        "hdr_len", "hv",
    )


class ProgressiveJpeg(Exception):
    """Raised by _parse on SOF2 — decode_jpeg_batch catches it and
    routes the payload to the scalar Annex G decoder (jpegprog)."""


def _parse(data) -> _Meta:
    """Marker-segment parse up to SOS; returns per-component table
    CONTENT (so the batch can registry-index identical tables across
    images). Same subset as codecs.decode_jpeg: baseline (SOF0/SOF1),
    8-bit, any sampling factors; SOF2 raises ProgressiveJpeg for the
    caller to route."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos, n = 2, len(data)
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple[list, list]] = {}
    comps: list[tuple[int, int]] = []
    hvs: list[tuple[int, int]] = []
    h = w = 0
    dri = 0
    scan = None
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(body[bpos + 1 : bpos + 65], dtype=np.uint8)
                qtabs[tq] = zz.astype(np.float64)  # zigzag-ordered dequant vec
                bpos += 65
        elif marker in (0xC0, 0xC1):
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG")
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, tq))
                hvs.append((samp >> 4, samp & 15))
        elif marker == 0xC2:
            raise ProgressiveJpeg()
        elif marker == 0xC3:
            raise NotImplementedError("lossless JPEG (SOF3)")
        elif 0xC5 <= marker <= 0xCF and marker not in (0xC8, 0xCC):
            # SOF5-15: differential / arithmetic-coded / hierarchical
            # families — refuse loudly instead of skipping the frame
            # header and failing later with a confusing parse error
            raise NotImplementedError(
                "unsupported JPEG coding process (SOF%d)" % (marker - 0xC0)
            )
        elif marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 15
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                htabs[(tc, th)] = (bits, list(body[bpos + 17 : bpos + 17 + nv]))
                bpos += 17 + nv
        elif marker == 0xDD:
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for si in range(ns):
                cid, tt = body[1 + 2 * si : 3 + 2 * si]
                scan.append((cid, tt >> 4, tt & 15))
            pos += ln
            break
        pos += ln
    if scan is None or not comps:
        raise ValueError("JPEG missing SOS/SOF")
    end = data.rfind(b"\xff\xd9")
    m = _Meta()
    m.h, m.w, m.ncomp, m.dri = h, w, len(comps), dri
    m.hv = tuple(hvs)
    m.qt_zz = [qtabs[tq] for _, tq in comps]
    m.dc_bv = [htabs[(0, next(t for c, t, _ in scan if c == cid))] for cid, _ in comps]
    m.ac_bv = [htabs[(1, next(a for c, _, a in scan if c == cid))] for cid, _ in comps]
    m.entropy = data[pos : end if end > pos else n]
    m.hdr_len = pos
    return m


_HDR_CACHE: dict = {}  # exact header bytes -> parsed _Meta (entropy=None)
_HDR_LENS: set = set()  # header lengths seen so far (tiny: one per table mix)


def _parse_cached(data) -> _Meta:
    """Bulk tables repeat a handful of byte-identical headers (same
    quality/size/tables) — key the FULL marker-segment prefix and skip
    the Python marker walk on hits. Correctness is exact: the cache
    key is every byte the parse reads."""
    db = bytes(data)
    for hdr_len in _HDR_LENS:
        hit = _HDR_CACHE.get(db[:hdr_len])
        if hit is not None:
            m2 = _Meta()
            m2.h, m2.w, m2.ncomp, m2.dri = hit.h, hit.w, hit.ncomp, hit.dri
            m2.hv = hit.hv
            m2.qt_zz, m2.dc_bv, m2.ac_bv = hit.qt_zz, hit.dc_bv, hit.ac_bv
            end = db.rfind(b"\xff\xd9")
            m2.entropy = db[hdr_len : end if end > hdr_len else len(db)]
            m2.hdr_len = hdr_len
            return m2
    m = _parse(db)
    if 0 < m.hdr_len and len(_HDR_CACHE) < 4096:  # bound hostile growth
        _HDR_CACHE[db[: m.hdr_len]] = m
        _HDR_LENS.add(m.hdr_len)
    return m


def decode_jpeg_batch(payloads, _chunk: int = 512) -> list[np.ndarray]:
    """Decode a batch of baseline JPEGs with one vectorized entropy
    state machine over all restart segments of all images at once.
    Bit-identical to codecs.decode_jpeg per payload.

    Batches beyond ~_chunk images decode in internal chunks: the
    entropy scatter target (coef_flat) and refill buffers grow with
    the batch and fall out of cache — measured optimum is ~512 images
    per wide pass (0.35 ms/img vs 0.65 at 4096)."""
    nimg = len(payloads)
    if nimg == 0:
        return []
    if nimg > _chunk + _chunk // 2:
        out: list = []
        for s in range(0, nimg, _chunk):
            out.extend(decode_jpeg_batch(payloads[s : s + _chunk], _chunk))
        return out
    # progressive detect-and-route: SOF2 payloads go to the scalar
    # Annex G decoder; the baseline remainder stays on the wide machine
    metas: list[_Meta] = []
    prog: dict[int, object] = {}
    for ii, data in enumerate(payloads):
        try:
            metas.append(_parse_cached(data))
        except ProgressiveJpeg:
            prog[ii] = data
            metas.append(None)
    if prog:
        keep = [i for i in range(nimg) if i not in prog]
        sub = decode_jpeg_batch([payloads[i] for i in keep], _chunk) if keep else []
        merged: list = [None] * nimg
        for j, i in enumerate(keep):
            merged[i] = sub[j]
        # per-image scalar decode for the progressive subset: a batched
        # dequant+IDCT+assembly finisher (stream-order regather through
        # _assemble_outputs) was built and MEASURED SLOWER on the
        # corpus mix (0.995 vs 0.713 ms/img — the per-image regather's
        # small-array numpy dispatch exceeds the batching win at
        # 16-64 px block counts), so the simple path stays
        from .jpegprog import decode_progressive

        for i, d in prog.items():
            merged[i] = decode_progressive(bytes(d))
        return merged
    # registries: identical Huffman/quant tables across images share
    # one stacked LUT row (the bulk table is all Annex K — 4 tables)
    tab_key2idx: dict = {}
    tab_rows: list = []
    qt_key2idx: dict = {}
    qt_rows: list = []
    img_dc = np.zeros((nimg, 3), dtype=np.int16)
    img_ac = np.zeros((nimg, 3), dtype=np.int16)
    img_qt = np.zeros((nimg, 3), dtype=np.int16)
    img_nmcu = np.zeros(nimg, dtype=np.int64)
    img_bpm = np.zeros(nimg, dtype=np.int64)  # blocks per MCU
    img_per = np.zeros(nimg, dtype=np.int64)  # MCUs per restart segment
    pats: list[list[int]] = []  # per image: component id per MCU block

    def _tab_idx(bv):
        key = (bytes(bv[0]), bytes(bv[1]))
        i = tab_key2idx.get(key)
        if i is None:
            i = len(tab_rows)
            tab_key2idx[key] = i
            tab_rows.append(_dec_tables(*bv))
        return i

    spans: list[bytes] = []
    for ii, data in enumerate(payloads):
        m = metas[ii]
        hmax = max(H for H, _ in m.hv)
        vmax = max(V for _, V in m.hv)
        nmcu = (-(-m.h // (8 * vmax))) * (-(-m.w // (8 * hmax)))
        pattern = [ci for ci, (H, V) in enumerate(m.hv) for _ in range(H * V)]
        img_nmcu[ii] = nmcu
        img_bpm[ii] = len(pattern)
        img_per[ii] = m.dri if m.dri else nmcu
        pats.append(pattern)
        for ci in range(m.ncomp):
            img_dc[ii, ci] = _tab_idx(m.dc_bv[ci])
            img_ac[ii, ci] = _tab_idx(m.ac_bv[ci])
            qk = m.qt_zz[ci].tobytes()
            qi = qt_key2idx.get(qk)
            if qi is None:
                qi = len(qt_rows)
                qt_key2idx[qk] = qi
                qt_rows.append(m.qt_zz[ci])
            img_qt[ii, ci] = qi
        spans.append(m.entropy)
    max_bpm = int(img_bpm.max())
    PAT = np.zeros((nimg, max_bpm), dtype=np.int64)
    for ii, pattern in enumerate(pats):
        PAT[ii, : len(pattern)] = pattern

    # ---- ONE global marker scan over every image's entropy span ----
    # (the byte-level grammar — 0xFF00 stuffing, RSTn boundaries — is
    # context-free, so per-image scans would just repeat numpy dispatch
    # overhead a thousand times per batch)
    span_len = np.array([len(s) for s in spans], dtype=np.int64)
    img_off = np.zeros(nimg + 1, dtype=np.int64)
    np.cumsum(span_len, out=img_off[1:])
    arr = np.frombuffer(b"".join(spans), dtype=np.uint8)
    N = len(arr)
    ff = np.flatnonzero(arr[:-1] == 0xFF)
    if len(ff):  # a pair straddling two images is not a real marker
        ff = ff[~np.isin(ff, img_off[1:] - 1)]
    nxt = arr[ff + 1]
    stuffed = ff[nxt == 0x00] + 1
    rstp = ff[(nxt >= 0xD0) & (nxt <= 0xD7)]
    keep = np.ones(N, dtype=bool)
    keep[stuffed] = False
    keep[rstp] = False
    keep[np.minimum(rstp + 1, N - 1)] = False
    starts = np.unique(np.concatenate([[0], rstp + 2, img_off[1:nimg]]))
    starts = starts[starts < N] if N else starts[:1]
    L = len(starts)
    brk = np.zeros(max(N, 1), dtype=np.int64)
    brk[starts[1:]] = 1
    sid = np.cumsum(brk)[keep] if N else np.zeros(0, dtype=np.int64)
    seg_bytes = np.bincount(sid, minlength=L).astype(np.int64)
    seg_img_a = np.searchsorted(img_off[1 : nimg + 1], starts, side="right")
    # validate restart-segment counts per image
    seg_counts = np.bincount(seg_img_a, minlength=nimg)
    need = np.maximum(1, -(-img_nmcu // img_per))
    if not np.array_equal(seg_counts, need):
        bad = int(np.flatnonzero(seg_counts != need)[0])
        raise ValueError(
            f"JPEG restart segments: image {bad} has {int(seg_counts[bad])},"
            f" expected {int(need[bad])}"
        )
    # MCUs per segment: full DRI intervals, remainder in the last
    first_seg = np.searchsorted(seg_img_a, np.arange(nimg))
    seg_in_img = np.arange(L, dtype=np.int64) - first_seg[seg_img_a]
    per_l = img_per[seg_img_a]
    seg_nmcu_a = np.minimum(per_l, img_nmcu[seg_img_a] - seg_in_img * per_l)

    seg_off = np.zeros(L + 1, dtype=np.int64)
    np.cumsum(seg_bytes, out=seg_off[1:])
    BUF = np.empty(int(seg_off[-1]) + 8, dtype=np.uint8)
    BUF[int(seg_off[-1]) :] = 0xFF  # final-lane refill pad (1-bits)
    BUF[: int(seg_off[-1])] = arr[keep]

    bpm_lane = img_bpm[seg_img_a]
    nblk_lane = seg_nmcu_a * bpm_lane
    block_base = np.zeros(L, dtype=np.int64)
    np.cumsum(nblk_lane[:-1], out=block_base[1:])
    total_blocks = int(nblk_lane.sum())

    # stacked decode LUT: (ntab, 65536) packed (len<<8)|sym rows
    SL = np.stack(tab_rows).astype(np.int64)

    # ---- the wide state machine ----
    # One Huffman symbol per live lane per vector step. State lives in
    # DENSE arrays that are physically compacted as lanes finish (no
    # index indirection on the hot path), and each lane carries a
    # register bit-reader (acc/nacc, masked 4-byte refills) so the
    # window costs ~1 amortized gather per symbol instead of 5.
    HALF = np.array([1 << max(s - 1, 0) for s in range(16)], dtype=np.int64)
    SUBV = np.array([(1 << s) - 1 for s in range(16)], dtype=np.int64)
    MASK = (np.int64(1) << np.arange(59, dtype=np.int64)) - 1
    clampmax = len(BUF) - 5

    seg_start = seg_off[:L].copy()
    bp_byte = seg_off[:L].copy()  # next unread byte (global offset)
    seg_bits = seg_bytes * 8
    acc = np.zeros(L, dtype=np.int64)
    nacc = np.zeros(L, dtype=np.int64)
    blk_rem = nblk_lane.copy()
    kk = np.zeros(L, dtype=np.int64)
    # MCU block pattern per lane: comp = PATL[lane, pat_pos], pat_pos
    # cycling mod bpm — the 4:4:4 case degenerates to [0, 1, 2]
    PATL = PAT[seg_img_a]  # (L, max_bpm)
    bpml = bpm_lane.copy()
    pat_pos = np.zeros(L, dtype=np.int64)
    comp = PATL[:, 0].copy()
    row = block_base.copy()  # current global block row
    dcpred = np.zeros((L, 3), dtype=np.int64)
    DCT = img_dc[seg_img_a].astype(np.int64)  # (L, 3)
    ACT = img_ac[seg_img_a].astype(np.int64)
    cur_dc = DCT[np.arange(L), comp].copy()
    cur_ac = ACT[np.arange(L), comp].copy()
    lane_img = seg_img_a.copy()
    # int32 coefficients: |AC| <= 1023, DC prediction sums stay far
    # below 2^31 for any lane length — 2x less scatter-write memory
    # than int64 (the scatter over coef_flat is the cache-miss hot
    # spot at large batch sizes)
    coef_flat = np.zeros(total_blocks * 64, dtype=np.int32)
    err_imgs: set[int] = set()

    # Lanes finish at different times. Physically compacting on EVERY
    # death costs O(lanes) array copies per death — O(lanes^2) total,
    # which made large batches SLOWER per image than small ones.
    # Instead each lane carries a `live` flag: finished lanes are
    # frozen (no refill, no bit consumption, no writes) and the state
    # arrays compact only when less than half the lanes remain live —
    # O(lanes log lanes) compaction traffic, and every vector step
    # runs at <= 2x the live width.
    live = np.ones(L, dtype=bool)
    nlive = L
    while nlive:
        need = live & (nacc < 27)  # peek(16) + code+value(<=27) headroom
        if need.any():
            ni = np.flatnonzero(need)
            b = np.minimum(bp_byte[ni], clampmax)
            # gather 4 bytes from the uint8 buffer (1-byte reads keep
            # the working set 8x smaller than an int64 shadow copy),
            # upcast on the small lane-sized arrays
            acc[ni] = (
                ((acc[ni] & MASK[nacc[ni]]) << 32)
                | (BUF[b].astype(np.int64) << 24)
                | (BUF[b + 1].astype(np.int64) << 16)
                | (BUF[b + 2].astype(np.int64) << 8)
                | BUF[b + 3]
            )
            bp_byte[ni] = b + 4
            nacc[ni] += 32
        win = (acc >> np.maximum(nacc - 16, 0)) & 0xFFFF
        isdc = live & (kk == 0)
        tab = np.where(isdc, cur_dc, cur_ac)
        packed = SL[tab, win]
        # invalid prefixes decode as (hln=0, sym=0): they consume no
        # bits but still advance k, so the lane terminates, and the
        # end-of-lane consumed-bits window check below rejects it —
        # no per-step error bookkeeping on the hot path
        hln = packed >> 8
        sym = packed & 0xFF
        size = np.where(isdc, sym, sym & 15)
        used = np.where(live, hln + size, 0)  # frozen lanes consume 0
        v = (acc >> (nacc - used)) & SUBV[size]
        nacc -= used
        val = np.where(v >= HALF[size], v, v - SUBV[size])  # size=0 -> 0
        # DC lanes: accumulate prediction, write coef 0, k -> 1
        if isdc.any():
            di = np.flatnonzero(isdc)
            cd = comp[di]
            nd = dcpred[di, cd] + val[di]
            dcpred[di, cd] = nd
            coef_flat[row[di] * 64] = nd
        # AC lanes. ZRL (sym 0xF0) needs no special case: r=15, s=0
        # gives pos+1 == kk+16, exactly the spec's skip.
        pos = kk + (sym >> 4)
        isac = live & ~isdc
        eob = isac & (size == 0) & (sym != 0xF0)
        wr = isac & (size > 0) & (pos < 64)
        if wr.any():
            wi = np.flatnonzero(wr)
            # scatter straight into NATURAL order (zigzag->natural
            # LUT on the lane-sized index is free) — kills the
            # (blocks, 64) permutation pass before the IDCT
            coef_flat[row[wi] * 64 + _ZZA[pos[wi]]] = val[wi]
        k_new = np.where(isdc, 1, np.where(eob, 64, pos + 1))
        adv = live & (k_new >= 64)
        kk = np.where(live, np.where(adv, 0, k_new), kk)
        if adv.any():
            ai = np.flatnonzero(adv)
            row[ai] += 1
            blk_rem[ai] -= 1
            p2 = pat_pos[ai] + 1
            p2[p2 >= bpml[ai]] = 0
            pat_pos[ai] = p2
            c2 = PATL[ai, p2]
            comp[ai] = c2
            cur_dc[ai] = DCT[ai, c2]
            cur_ac[ai] = ACT[ai, c2]
            newdead = ai[blk_rem[ai] == 0]
            if len(newdead):
                # a valid lane consumes all its segment's bits except
                # the final byte's <8 padding bits; anything else
                # (truncation, trailing garbage, any mid-stream
                # desync) lands outside the window and rejects the
                # image
                used_bits = (bp_byte[newdead] - seg_start[newdead]) * 8 - nacc[
                    newdead
                ]
                sb = seg_bits[newdead]
                bad = (used_bits > sb) | (used_bits <= sb - 8)
                if bad.any():
                    err_imgs.update(lane_img[newdead[bad]].tolist())
                live[newdead] = False
                nlive -= len(newdead)
                if 0 < nlive < live.size // 2:
                    keep = live
                    seg_start = seg_start[keep]
                    bp_byte = bp_byte[keep]
                    seg_bits = seg_bits[keep]
                    acc = acc[keep]
                    nacc = nacc[keep]
                    blk_rem = blk_rem[keep]
                    kk = kk[keep]
                    comp = comp[keep]
                    row = row[keep]
                    PATL = PATL[keep]
                    bpml = bpml[keep]
                    pat_pos = pat_pos[keep]
                    dcpred = dcpred[keep]
                    DCT = DCT[keep]
                    ACT = ACT[keep]
                    cur_dc = cur_dc[keep]
                    cur_ac = cur_ac[keep]
                    lane_img = lane_img[keep]
                    live = np.ones(nlive, dtype=bool)

    if err_imgs:
        raise ValueError(
            f"invalid JPEG entropy stream in batch images {sorted(err_imgs)}"
        )

    # ---- dequantize + IDCT (all blocks at once) ----
    QTN = np.empty((len(qt_rows), 64))  # natural-order dequant rows
    QTN[:, _ZZ] = np.stack(qt_rows)
    lane_first = np.searchsorted(seg_img_a, np.arange(nimg))
    img_base = block_base[lane_first]
    coef = coef_flat.reshape(total_blocks, 64)
    # coefficients are already in natural order (scatter-time LUT);
    # qt entries are INTEGERS (T.81 stores uint8 tables), so the
    # int32*float64 product is exactly the scalar decoder's value.
    # Fast path: every image uses the same MCU block pattern + table
    # layout (the bulk-table case) -> the per-block table id is a
    # period-bpm pattern and a (bpm, 64) broadcast replaces a
    # (blocks, 64) gather.
    img_qpat = [
        [int(img_qt[ii, ci]) for ci in pats[ii]] for ii in range(nimg)
    ]
    uniq_layout = {tuple(q) for q in img_qpat}
    if len(uniq_layout) == 1:
        qsel = list(next(iter(uniq_layout)))
        nat = (coef.reshape(-1, len(qsel), 64) * QTN[qsel][None]).reshape(
            total_blocks, 64
        )
    else:
        qtb = np.empty(total_blocks, dtype=np.int64)
        for ii in range(nimg):
            nb = int(img_nmcu[ii] * img_bpm[ii])
            qtb[img_base[ii] : img_base[ii] + nb] = np.tile(
                np.asarray(img_qpat[ii], dtype=np.int64), int(img_nmcu[ii])
            )
        nat = coef * QTN[qtb]
    # batched-matmul IDCT, identical formulation to codecs.decode_jpeg
    spat = np.matmul(np.matmul(_T.T, nat.reshape(-1, 8, 8)), _T)
    spat += 128.0

    # ---- color in BLOCK space, then uint8 assembly, batched per
    # (h, w, ncomp) group. The YCbCr->RGB math is elementwise-identical
    # to codecs._ycbcr_to_rgb (same constants, same round/clip order);
    # running it before the spatial transpose means the assembly
    # gather/transpose moves 1-byte pixels, not 8-byte floats ----
    return _assemble_outputs(
        spat, img_base, [(m.h, m.w, m.ncomp, m.hv) for m in metas]
    )


def _assemble_outputs(spat, img_base, shapes) -> list:
    """Shared pixel assembly: (total_blocks, 8, 8) IDCT output in
    stream order ([mcu, pattern-block] per image, bases in img_base)
    -> per-image uint8 arrays, batched per (h, w, ncomp, hv) group.
    Used by the wide baseline machine AND the batched progressive
    finisher."""
    nimg = len(shapes)
    outs: list = [None] * nimg
    groups: dict[tuple, list[int]] = {}
    for ii, sh in enumerate(shapes):
        groups.setdefault(sh, []).append(ii)
    for (h, w, ncp, hv), members in groups.items():
        n = len(members)
        bases = img_base[members]
        if all(x == (1, 1) for x in hv):
            # 1x1 fast path: color in block space, then one uint8
            # transpose — pixels move as bytes, not floats
            nby, nbx = (h + 7) // 8, (w + 7) // 8
            nmcu = nby * nbx
            bidx = bases[:, None] + (ncp * np.arange(nmcu, dtype=np.int64))[None, :]
            if ncp == 1:
                y = spat[bidx.reshape(-1)]
                px8 = np.clip(np.round(y), 0, 255).astype(np.uint8)[..., None]
            else:
                y = spat[bidx.reshape(-1)]
                cb = spat[bidx.reshape(-1) + 1]
                cb -= 128.0
                cr = spat[bidx.reshape(-1) + 2]
                cr -= 128.0
                px8 = np.empty(y.shape + (3,), dtype=np.uint8)
                px8[..., 0] = np.clip(np.round(y + 1.402 * cr), 0, 255)
                px8[..., 1] = np.clip(
                    np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255
                )
                px8[..., 2] = np.clip(np.round(y + 1.772 * cb), 0, 255)
            # (n*nmcu, 8, 8, c) -> (n, nby, 8, nbx, 8, c) -> crop
            stack = (
                px8.reshape(n, nby, nbx, 8, 8, px8.shape[-1])
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, nby * 8, nbx * 8, px8.shape[-1])[:, :h, :w, :]
            )
            if ncp == 1:
                stack = stack[..., 0]
        else:
            # subsampled: assemble each component plane at its sampled
            # resolution, replication-upsample, color at full res —
            # elementwise-identical to codecs._idct_assemble
            hmax = max(H for H, _ in hv)
            vmax = max(V for _, V in hv)
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            nmcu = mcux * mcuy
            bpm = sum(H * V for H, V in hv)
            offs = np.cumsum([0] + [H * V for H, V in hv])
            planes = []
            mI = np.arange(nmcu, dtype=np.int64) * bpm
            for ci in range(ncp):
                Hc, Vc = hv[ci]
                sub = (
                    np.arange(Vc, dtype=np.int64)[:, None] * Hc
                    + np.arange(Hc, dtype=np.int64)[None, :]
                ).reshape(-1)
                idx = (
                    bases[:, None, None]
                    + mI[None, :, None]
                    + int(offs[ci])
                    + sub[None, None, :]
                )
                blkpix = spat[idx.reshape(-1)]  # (n*nmcu*Vc*Hc, 8, 8)
                plane = (
                    blkpix.reshape(n, mcuy, mcux, Vc, Hc, 8, 8)
                    .transpose(0, 1, 3, 5, 2, 4, 6)
                    .reshape(n, mcuy * Vc * 8, mcux * Hc * 8)
                )
                sh, sw = -(-h * Vc // vmax), -(-w * Hc // hmax)
                plane = plane[:, :sh, :sw]
                fy, fx = vmax // Vc, hmax // Hc
                if fy > 1:
                    plane = np.repeat(plane, fy, axis=1)
                if fx > 1:
                    plane = np.repeat(plane, fx, axis=2)
                planes.append(plane[:, :h, :w])
            if ncp == 1:
                stack = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
            else:
                y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
                stack = np.empty((n, h, w, 3), dtype=np.uint8)
                stack[..., 0] = np.clip(np.round(y + 1.402 * cr), 0, 255)
                stack[..., 1] = np.clip(
                    np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255
                )
                stack[..., 2] = np.clip(np.round(y + 1.772 * cb), 0, 255)
        for j, ii in enumerate(members):
            outs[ii] = stack[j]
    return outs


# ---------------------------------------------------------------------------
# encode

_SIZ = np.array([i.bit_length() for i in range(4096)], dtype=np.int64)
_ENC_TAB_CACHE: dict = {}


def _enc_tables():
    """Annex K encode tables as stacked (2, 256) code/len arrays
    (row 0 = luma, row 1 = chroma); DC tables in the first 12 slots."""
    hit = _ENC_TAB_CACHE.get("k")
    if hit is not None:
        return hit
    dccode = np.zeros((2, 16), dtype=np.int64)
    dclen = np.zeros((2, 16), dtype=np.int64)
    accode = np.zeros((2, 256), dtype=np.int64)
    aclen = np.zeros((2, 256), dtype=np.int64)
    for t, (dcht, acht) in enumerate(
        ((_HT_DC_LUM, _HT_AC_LUM), (_HT_DC_CHR, _HT_AC_CHR))
    ):
        for s, (c, ln) in _huff_encode_table(*dcht).items():
            dccode[t, s], dclen[t, s] = c, ln
        for s, (c, ln) in _huff_encode_table(*acht).items():
            accode[t, s], aclen[t, s] = c, ln
    out = (dccode, dclen, accode, aclen)
    _ENC_TAB_CACHE["k"] = out
    return out


def encode_jpeg_stack(
    pixels: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> list[bytes]:
    """(n, h, w, 3) or (n, h, w) uint8 -> n baseline JFIF JPEGs,
    byte-identical to codecs.encode_jpeg(px, quality, restart_interval)
    per image. Entropy coding is fully vectorized: per-block RLE via
    one global nonzero scan, Huffman code gather, and prefix-sum bit
    packing with one np.packbits — no per-symbol Python."""
    from .codecs import jpeg_header_bytes

    if pixels.ndim == 3:
        gray, ncomp = True, 1
    elif pixels.ndim == 4 and pixels.shape[3] == 3:
        gray, ncomp = False, 3
    else:
        raise ValueError(f"unsupported stack shape {pixels.shape}")
    n, h, w = pixels.shape[:3]
    if n == 0:
        return []
    ql, qc = _quality_tables(quality)
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    nmcu = nby * nbx
    H, W = nby * 8, nbx * 8
    ri = restart_interval
    per = ri if ri else nmcu
    nseg = max(1, -(-nmcu // per))

    if gray:
        chans = [(pixels.astype(np.float64), ql)]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        chans = [(ycc[..., 0], ql), (ycc[..., 1], qc), (ycc[..., 2], qc)]

    # forward DCT + quantization, batched over every block in the stack
    # (same matmul formulation as the scalar encoder -> identical bits)
    Q = np.empty((n, nmcu, ncomp, 64), dtype=np.int16)  # |coef| <= 2047
    for ci, (chan, qt) in enumerate(chans):
        padded = np.pad(chan - 128.0, ((0, 0), (0, H - h), (0, W - w)), mode="edge")
        blk = (
            padded.reshape(n, nby, 8, nbx, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n * nmcu, 8, 8)
        )
        coef = np.matmul(np.matmul(_T, blk), _T.T)
        q = np.round(coef.reshape(-1, 64) / qt.reshape(64)).astype(np.int16)
        Q[:, :, ci, :] = q[:, _ZZ].reshape(n, nmcu, 64)

    # DC differences with restart resets (prediction restarts at the
    # first MCU of every segment)
    dc = Q[..., 0]  # (n, nmcu, ncomp)
    prev = np.zeros_like(dc)
    prev[:, 1:, :] = dc[:, :-1, :]
    if ri:
        prev[:, np.arange(nmcu) % per == 0, :] = 0
    dcdiff = (dc.astype(np.int64) - prev).reshape(-1)

    B = n * nmcu * ncomp  # blocks in stream order [img, mcu, comp]
    zz = Q.reshape(B, 64)
    tabsel = np.tile(np.minimum(np.arange(ncomp), 1), n * nmcu)
    dccode, dclen, accode, aclen = _enc_tables()

    # ---- units: DC per block + RLE'd AC (ZRL-expanded) + EOB ----
    adiff = np.abs(dcdiff)
    if adiff.max(initial=0) > 2047:
        raise ValueError("DC difference out of baseline range")
    dsize = _SIZ[adiff]
    dvb = np.where(dcdiff >= 0, dcdiff, dcdiff + (np.int64(1) << dsize) - 1)
    dc_unit = (dccode[tabsel, dsize] << dsize) | dvb
    dc_ulen = dclen[tabsel, dsize] + dsize

    nzb, nzk = np.nonzero(zz[:, 1:])
    kk = nzk + 1
    v = zz[nzb, kk].astype(np.int64)
    nnz = len(nzb)
    first = np.empty(nnz, dtype=bool)
    if nnz:
        first[0] = True
        first[1:] = nzb[1:] != nzb[:-1]
    prevk = np.empty_like(kk)
    if nnz:
        prevk[1:] = kk[:-1]
    prevk[first] = 0
    run = kk - prevk - 1
    nzrl = run >> 4  # ZRL count before this coefficient (run >= 16)
    rem = run & 15
    av = np.abs(v)
    if nnz and av.max() > 1023:
        raise ValueError("AC coefficient out of baseline range")
    s = _SIZ[av]
    sym = (rem << 4) | s
    tabs = tabsel[nzb]
    avb = np.where(v >= 0, v, v + (np.int64(1) << s) - 1)
    real_unit = (accode[tabs, sym] << s) | avb
    real_ulen = aclen[tabs, sym] + s

    has_eob = zz[:, 63] == 0
    eob_unit = accode[tabsel, 0x00]
    eob_ulen = aclen[tabsel, 0x00]

    # ---- place every unit at its stream position WITHOUT a sort:
    # per-block unit counts -> prefix offsets -> direct scatter.
    # ZRLs are rare (runs >= 16), so real symbols scatter directly and
    # only the ZRL subset pays an expansion. ----
    counts = nzrl + 1  # ZRLs + the real symbol, per nonzero
    ac_per_block = np.bincount(nzb, weights=counts, minlength=B).astype(np.int64)
    cnt_b = 1 + ac_per_block + has_eob  # DC + AC units + EOB
    boff = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(cnt_b, out=boff[1:])
    U = int(boff[-1])
    unit = np.empty(U, dtype=np.int64)
    ulen = np.empty(U, dtype=np.int64)
    unit[boff[:-1]] = dc_unit
    ulen[boff[:-1]] = dc_ulen
    if nnz:
        cumu = np.zeros(nnz + 1, dtype=np.int64)
        np.cumsum(counts, out=cumu[1:])
        ffidx = np.maximum.accumulate(np.where(first, np.arange(nnz), 0))
        rel = cumu[:-1] - cumu[ffidx]  # units before this nz in its block
        tgt0 = boff[nzb] + 1 + rel
        unit[tgt0 + nzrl] = real_unit  # the coefficient follows its ZRLs
        ulen[tgt0 + nzrl] = real_ulen
        zi = np.flatnonzero(nzrl)
        if len(zi):
            repz = np.repeat(zi, nzrl[zi])
            czrl = np.zeros(len(zi) + 1, dtype=np.int64)
            np.cumsum(nzrl[zi], out=czrl[1:])
            posz = np.arange(int(czrl[-1]), dtype=np.int64) - czrl[
                np.repeat(np.arange(len(zi)), nzrl[zi])
            ]
            unit[tgt0[repz] + posz] = accode[tabs[repz], 0xF0]
            ulen[tgt0[repz] + posz] = aclen[tabs[repz], 0xF0]
    eb = np.flatnonzero(has_eob)
    unit[boff[1:][eb] - 1] = eob_unit[eb]
    ulen[boff[1:][eb] - 1] = eob_ulen[eb]

    # ---- segment bit layout (byte-aligned, 1-padded) ----
    gseg_b = (
        np.repeat(np.arange(n, dtype=np.int64), nmcu * ncomp) * nseg
        + (np.tile(np.repeat(np.arange(nmcu, dtype=np.int64), ncomp), n) // per)
    )
    useg = np.repeat(gseg_b, cnt_b)
    cum = np.cumsum(ulen)
    excl = cum - ulen
    firsts = np.searchsorted(useg, np.arange(n * nseg))
    seg_base = excl[firsts]
    seg_bits = np.diff(np.append(seg_base, cum[-1]))
    seg_bytes = (seg_bits + 7) >> 3
    seg_boff = np.zeros(n * nseg + 1, dtype=np.int64)
    np.cumsum(seg_bytes, out=seg_boff[1:])
    gbit = (seg_boff[useg] << 3) + (excl - seg_base[useg])

    # ---- byte-level packing: each unit's <=34 bit-window spans <=5
    # bytes; distinct units never share a BIT, so OR == SUM and five
    # weighted bincounts assemble the whole stream in C ----
    total_bytes = int(seg_boff[-1])
    x = unit << (40 - (gbit & 7) - ulen)  # 40-bit window at byte0
    byte0 = gbit >> 3
    acc = np.zeros(total_bytes + 5, dtype=np.float64)
    for k in range(5):
        contrib = (x >> (8 * (4 - k))) & 0xFF
        nzc = np.flatnonzero(contrib)
        if len(nzc):
            acc += np.bincount(
                byte0[nzc] + k, weights=contrib[nzc], minlength=total_bytes + 5
            )
    payload = acc[:total_bytes].astype(np.uint8)
    # 1-padding for each segment's final partial byte (T.81 F.1.2.3)
    padbits = (seg_bytes << 3) - seg_bits
    pb = np.flatnonzero(padbits)
    if len(pb):
        payload[seg_boff[1:][pb] - 1] |= ((1 << padbits[pb]) - 1).astype(np.uint8)

    # ---- 0xFF stuffing (global), then per-image assembly ----
    ffp = np.flatnonzero(payload == 0xFF)
    if len(ffp):
        payload = np.insert(payload, ffp + 1, 0)
    off2 = seg_boff + np.searchsorted(ffp, seg_boff)
    pview = payload.tobytes()
    header = jpeg_header_bytes(gray, ql, qc, h, w, ri)
    rst = [bytes((0xFF, 0xD0 + (j & 7))) for j in range(8)]
    outs = []
    for i in range(n):
        parts = [header]
        for j in range(nseg):
            g = i * nseg + j
            parts.append(pview[off2[g] : off2[g + 1]])
            if j < nseg - 1:
                parts.append(rst[j & 7])
        parts.append(b"\xff\xd9")
        outs.append(b"".join(parts))
    return outs
