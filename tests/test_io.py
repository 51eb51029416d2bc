"""sources/io.py: bbox fragment pruning (J7) and spatial file sort (O2)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _pts(x0, y0, n=50, seed=0):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "x": rng.uniform(x0, x0 + 10, n),
            "y": rng.uniform(y0, y0 + 10, n),
            "z": rng.uniform(0, 5, n),
        }
    )


def test_read_points_bbox_prunes_and_filters(ray_session, tmp_path):
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(_pts(0, 0, seed=1), a)
    pq.write_table(_pts(1000, 1000, seed=2), b)
    from geotools_ray.sources.io import read_points_bbox

    ds = read_points_bbox([a, b], 0, 0, 20, 20)
    df = ds.to_pandas()
    assert len(df) == 50  # far file fully pruned by row-group stats
    assert df["x"].between(0, 20).all() and df["y"].between(0, 20).all()


def test_sort_fragments_spatially_orders_and_survives_missing_stats(tmp_path):
    from geotools_ray.sources.io import sort_fragments_spatially

    paths = []
    for i, (x0, y0) in enumerate([(5000, 5000), (0, 0), (900, 900)]):
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(_pts(x0, y0, seed=i), p)
        paths.append(p)
    out = sort_fragments_spatially(paths)
    assert out == [paths[1], paths[2], paths[0]]  # by centroid cell

    # a file written without statistics must not crash the sort
    # (regression: AttributeError on statistics=None); it sorts first
    nostat = str(tmp_path / "nostat.parquet")
    pq.write_table(_pts(100, 100, seed=9), nostat, write_statistics=False)
    out2 = sort_fragments_spatially(paths + [nostat])
    assert set(out2) == set(paths + [nostat])
    assert out2[0] == nostat
