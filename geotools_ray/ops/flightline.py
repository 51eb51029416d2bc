"""Flight-line operators (M8 segmentation, M9 edge/turn detection) —
the Ray Data restatement of `lasreclass` (src/lasreclass.cpp).

M8 (recoverFlightlines, :313-368): per input "file", scan points in
time order; a gap < 0 or > time_gap closes a [start, end] segment.
Segments from all files are then MERGED when they intersect or sit
closer than 1.0 time units (Seg::insert + normalizeFlightLines,
:97-150), and every point gets the id of the first merged segment
containing its time (findFlightLine :153-160, linear first-match over
start-sorted segments).  Per-file scans run distributed
(grouped_map); the merge runs on the tiny segment list driver-side;
id assignment is a broadcast lookup.

ORDERING ASSUMPTION: the reference scans LAS files in stored order;
this engine sorts each file's points by (gps_time, point id) inside
its group — stated per SURVEY §7.4.

M9 (recoverEdges, :186-259): two sliding 20-point queues; when
|(|dir0| - |dir1|)| > 0.75*pi (directions = atan2 of back-front,
normalized to [0, 2pi)), both queues are flushed with class 31; a time
gap > 0.4 flushes without reclassing.  Inherently sequential per file
-> ordered per-group scan.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..stages.grouped import grouped_map


def _file_segments(df: pd.DataFrame, time_col: str, time_gap: float) -> list[tuple[float, float]]:
    """Transcription of the per-file scan (src/lasreclass.cpp:330-358)."""
    times = df[time_col].to_numpy()
    segs = []
    start = end = 0.0
    started = False
    for t in times:
        if not started:
            start = end = t
            started = True
        else:
            gap = t - end
            if gap < 0.0 or gap > time_gap:
                segs.append((start, end))
                start = t
            end = t
    if started and end != start:
        segs.append((start, end))
    return segs


def merge_segments(segs: list[tuple[float, float]]) -> list[tuple[int, float, float]]:
    """normalizeFlightLines (:130-150): start-sorted single pass,
    merging segments that intersect or are nearer than 1.0."""
    if not segs:
        return []
    segs = sorted(segs)
    out = []
    cur_s, cur_e = segs[0]
    sid = 1
    for s, e in segs[1:]:
        intersects = not (e < cur_s or s > cur_e)
        near = (cur_s - e < 1.0 and cur_s > e) or (s - cur_e < 1.0 and s > cur_e)
        if intersects or near:
            cur_s = min(cur_s, s)
            cur_e = max(cur_e, e)
        else:
            out.append((sid, cur_s, cur_e))
            sid += 1
            cur_s, cur_e = s, e
    out.append((sid, cur_s, cur_e))
    return out


def recover_flightlines(
    points: ray.data.Dataset,
    file_col: str,
    time_col: str = "gps_time",
    time_gap: float = 50.0,
    order_cols: tuple[str, ...] = (),
) -> tuple[ray.data.Dataset, list[tuple[int, float, float]]]:
    """-> (points with source_id column, merged segment list)."""

    def per_file(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for f, g in df.groupby(file_col, sort=False):
            g = g.sort_values([time_col, *order_cols])
            for s, e in _file_segments(g, time_col, time_gap):
                out.append({"file": f, "t_start": s, "t_end": e})
        return pd.DataFrame(out, columns=["file", "t_start", "t_end"])

    # pin the input once: the segment scan consumes the pipeline, and
    # without this the id-assignment map re-executes the whole upstream
    points = points.materialize()
    raw_segs = grouped_map(points, [file_col], per_file).to_pandas()
    merged = merge_segments(list(zip(raw_segs["t_start"], raw_segs["t_end"])))
    ref = ray.put(merged)

    def assign(t: pa.Table) -> pa.Table:
        segs = ray.get(ref)
        times = t[time_col].to_numpy(zero_copy_only=False)
        sid = np.zeros(len(times), dtype=np.int64)
        if segs:
            # merged segments are disjoint and start-sorted, so the
            # first containing segment is the one found by searchsorted
            starts = np.array([s for _, s, _ in segs])
            ends = np.array([e for _, _, e in segs])
            ids = np.array([i for i, _, _ in segs], dtype=np.int64)
            pos = np.searchsorted(starts, times, side="right") - 1
            ok = (pos >= 0) & (times <= ends[np.clip(pos, 0, len(segs) - 1)])
            sid[ok] = ids[pos[ok]]
        return t.append_column("source_id", pa.array(sid))

    return points.map_batches(assign, batch_format="pyarrow"), merged


def detect_edges(
    points: ray.data.Dataset,
    file_col: str,
    time_col: str = "gps_time",
    order_cols: tuple[str, ...] = (),
    queue_len: int = 20,
    flush_gap: float = 0.4,
    flip_angle: float = math.pi * 0.75,
) -> ray.data.Dataset:
    """M9: per-file ordered two-queue scan; points in a detected turn
    get cls 31 (reference writes reclassed copies; we emit the same
    rows with updated cls)."""

    def per_file(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []

        def direction(p0, p1):
            d = math.atan2(p1[1] - p0[1], p1[0] - p0[0])
            while d < 0:
                d += math.pi * 2
            while d > math.pi * 2:
                d -= math.pi * 2
            return d

        for f, g in df.groupby(file_col, sort=False):
            g = g.sort_values([time_col, *order_cols])
            rows = list(g.itertuples(index=False))
            xi = g.columns.get_loc("x")
            yi = g.columns.get_loc("y")
            ti = g.columns.get_loc(time_col)

            pq0: list = []
            pq1: list = []
            last_time = 0.0

            def dump(q, cls=None):
                for r in q:
                    d = r._asdict()
                    if cls is not None:
                        d["cls"] = cls
                    out_rows.append(d)
                q.clear()

            for r in rows:
                t = r[ti]
                if last_time == 0.0:
                    last_time = t
                elif t - last_time > flush_gap:
                    last_time = t
                    dump(pq0)
                    dump(pq1)
                pq0.append(r)
                if len(pq0) <= queue_len:
                    continue
                pq1.append(pq0.pop(0))
                if len(pq1) == queue_len:
                    # only the two endpoints of each queue matter
                    d0 = direction((pq0[0][xi], pq0[0][yi]), (pq0[-1][xi], pq0[-1][yi]))
                    d1 = direction((pq1[0][xi], pq1[0][yi]), (pq1[-1][xi], pq1[-1][yi]))
                    if abs(abs(d0) - abs(d1)) > flip_angle:
                        dump(pq0, 31)
                        dump(pq1, 31)
                    else:
                        out_rows.append(pq1.pop(0)._asdict())
            dump(pq0)
            dump(pq1)
        return pd.DataFrame(out_rows)

    return grouped_map(points, [file_col], per_file)
