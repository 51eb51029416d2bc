import numpy as np
import pandas as pd
import pytest


def test_merge_segments_reference_semantics():
    from geotools_ray.ops.flightline import merge_segments

    # intersecting + near (<1.0) merge; gap >= 1.0 splits
    segs = [(0.0, 10.0), (10.5, 20.0), (21.5, 30.0), (25.0, 40.0)]
    out = merge_segments(segs)
    assert [(s, e) for _, s, e in out] == [(0.0, 20.0), (21.5, 40.0)]


def test_recover_flightlines(ray_session):
    import ray.data

    from geotools_ray.ops.flightline import recover_flightlines

    rows = []
    pid = 0
    # file 0: times 0..9 and 100..109; file 1: 5..14 (overlaps file 0 seg A)
    for t in list(range(10)) + list(range(100, 110)):
        rows.append({"pid": pid, "file": 0, "gps_time": float(t), "x": 0.0, "y": 0.0, "cls": 1}); pid += 1
    for t in range(5, 15):
        rows.append({"pid": pid, "file": 1, "gps_time": float(t), "x": 0.0, "y": 0.0, "cls": 1}); pid += 1
    ds = ray.data.from_items(rows)
    out, merged = recover_flightlines(ds, "file", time_gap=50.0)
    assert [(s, e) for _, s, e in merged] == [(0.0, 14.0), (100.0, 109.0)]
    df = out.to_pandas()
    assert (df[df["gps_time"] <= 14]["source_id"] == 1).all()
    assert (df[df["gps_time"] >= 100]["source_id"] == 2).all()


def test_detect_edges_flags_turn(ray_session):
    import ray.data

    from geotools_ray.ops.flightline import detect_edges

    # straight east for 60 points, then straight west (direction flip = pi)
    rows = []
    for i in range(60):
        rows.append({"pid": i, "file": 0, "gps_time": i * 0.01, "x": float(i), "y": 0.0, "cls": 1})
    for i in range(60):
        rows.append({"pid": 60 + i, "file": 0, "gps_time": 0.6 + i * 0.01, "x": 59.0 - i, "y": 0.1, "cls": 1})
    ds = ray.data.from_items(rows)
    out = detect_edges(ds, "file").to_pandas()
    assert len(out) == 120
    flagged = out[out["cls"] == 31]
    assert len(flagged) > 0  # the turn region got reclassed
    # points well inside the straight runs keep their class
    assert (out[out["pid"] < 30]["cls"] == 1).all()
