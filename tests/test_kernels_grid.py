"""Grid math vs straight-line re-implementations of the reference
formulas (src/util.cpp:142-148,197-202; src/lasgrid.cpp:303-314)."""

import math

import numpy as np

from geotools_ray.kernels import grid


def test_snap_matches_reference_formula():
    b = grid.Bounds(1.3, -2.7, 9.1, 4.0).snap(2.0)
    assert b.minx == math.floor(1.3 / 2.0) * 2.0
    assert b.miny == math.floor(-2.7 / 2.0) * 2.0
    assert b.maxx == math.floor(9.1 / 2.0) * 2.0 + 2.0
    assert b.maxy == math.floor(4.0 / 2.0) * 2.0 + 2.0
    # snap of an exact multiple extends by one cell (floor+res)
    assert grid.Bounds(0, 0, 10, 10).snap(5.0).maxx == 15.0


def test_cols_rows_ceil_min1():
    b = grid.Bounds(0, 0, 10, 10)
    assert b.cols(3.0) == 4 and b.rows(3.0) == 4
    assert grid.Bounds(0, 0, 0.1, 0.1).cols(5.0) == 1


def test_cell_index_row_from_top():
    # lasgrid fixture style: 0.5-spaced points on [0, 2) at res 1
    b = grid.Bounds(0, 0, 2, 2)
    cols, rows = b.cols(1.0), b.rows(1.0)
    assert (cols, rows) == (2, 2)
    x = np.array([0.5, 1.5, 0.5, 1.5])
    y = np.array([0.5, 0.5, 1.5, 1.5])
    cid = grid.cell_id_of_points(x, y, b, 1.0)
    # bottom row (y in [0,1)) maps to TOP-counted row index rows-1 => idx 2,3
    assert cid.tolist() == [2, 3, 0, 1]


def test_cell_edge_and_epsilon_outlier():
    # the lasgrid fixture's 1.0001 edge point lands in the next cell
    b = grid.Bounds(0, 0, 2, 2)
    cid = grid.cell_id_of_points(
        np.array([1.0, 1.0001, 0.9999]), np.array([0.5, 0.5, 0.5]), b, 1.0
    )
    assert cid.tolist() == [3, 3, 2]


def test_centroid_roundtrip():
    b = grid.Bounds(0, 0, 100, 100)
    res = 5.0
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 99.9, 200)
    y = rng.uniform(0, 99.9, 200)
    cid = grid.cell_id_of_points(x, y, b, res)
    cx, cy = grid.cell_centroids(cid, b, res)
    assert (np.abs(cx - x) <= res).all() and (np.abs(cy - y) <= res).all()
    # centroid of the cell re-maps to the same cell
    assert (grid.cell_id_of_points(cx, cy, b, res) == cid).all()


def _oracle_radius_cells(x, y, b, res, radius):
    """Straight python transcription of src/lasgrid.cpp:303-314."""
    cols, rows = b.cols(res), b.rows(res)
    out = []
    for i in range(len(x)):
        c = int((x[i] - b.minx) / res)
        r = int((y[i] - b.miny) / res)
        offset = int(int(radius * 2) / res)
        for cc in range(max(0, c - offset), min(cols, c + offset + 1)):
            for rr in range(max(0, r - offset), min(rows, r + offset + 1)):
                cx = cc * res + b.minx + res * 0.5
                cy = rr * res + b.miny + res * 0.5
                if radius != 0.0 and math.sqrt((cx - x[i]) ** 2 + (cy - y[i]) ** 2) > radius:
                    continue
                out.append((i, (rows - rr - 1) * cols + cc))
    return sorted(out)


def test_radius_window_matches_reference_loop():
    b = grid.Bounds(0, 0, 50, 50)
    rng = np.random.RandomState(1)
    x = rng.uniform(0, 49.9, 300)
    y = rng.uniform(0, 49.9, 300)
    for radius in (0.0, 5.0, 7.5):
        pi, cid = grid.radius_cells_of_points(x, y, b, 5.0, radius)
        got = sorted(zip(pi.tolist(), cid.tolist()))
        if radius == 0.0:
            want = [
                (i, int(c))
                for i, c in enumerate(grid.cell_id_of_points(x, y, b, 5.0))
            ]
        else:
            want = _oracle_radius_cells(x, y, b, 5.0, radius)
        assert got == want
