"""queries_img_sql: the DuckDB side of the img_flagship oracle is
independently correct — its integer-ops morton/parent-cell expression
and its ray-cast CTE match the engine kernels on random inputs (not
just on the fixture the driver happens to run)."""

import duckdb
import numpy as np

from geotools_ray.kernels import cellindex as ci
from geotools_ray.kernels.geom import points_in_polygon
from geotools_ray.ops.imagepipeline import DEFAULT_LEVEL, FLAGSHIP_POLYGONS
from geotools_ray.queries_img_sql import _edges_values, _morton_terms


def test_sql_morton_parent_matches_kernel():
    """The 20-term bit-interleave + level header in SQL == parent(
    encode(lon, lat, 12), 2) from kernels/cellindex for random
    coordinates across the footprint bbox (and the poles/edges)."""
    rng = np.random.RandomState(3)
    lon = np.concatenate([rng.uniform(-20, 20, 500), [-20.0, 19.999, 0.0]])
    lat = np.concatenate([rng.uniform(-20, 20, 500), [19.999, -20.0, 0.0]])
    want = ci.parent(ci.encode(lon, lat, DEFAULT_LEVEL), 2)

    n12 = 1 << DEFAULT_LEVEL
    header = (DEFAULT_LEVEL - 2) << 58
    con = duckdb.connect()
    con.register(
        "pts",
        __import__("pandas").DataFrame({"lon": lon, "lat": lat}),
    )
    got = con.execute(f"""
        WITH cells AS (
          SELECT
            (CAST(FLOOR((lon + 180.0) / 360.0 * {n12}.0) AS BIGINT) % {n12}) >> 2 AS mx,
            LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 180.0 * {n12}.0) AS BIGINT), 0), {n12 - 1}) >> 2 AS my
          FROM pts)
        SELECT {header} + {_morton_terms("mx", "my", DEFAULT_LEVEL - 2)} AS parent_cell
        FROM cells
    """).df()["parent_cell"].to_numpy()
    assert (got == want).all()


def test_sql_raycast_matches_kernel():
    """The edge-unnest crossing-count CTE finds exactly the same
    point-in-polygon hits as kernels/geom.points_in_polygon for random
    points against every flagship polygon (including the concave and
    L-shaped ones)."""
    import pandas as pd

    rng = np.random.RandomState(9)
    lon = rng.uniform(-22, 22, 1500)
    lat = rng.uniform(-22, 22, 1500)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"pid": np.arange(len(lon)), "lon": lon, "lat": lat}))
    got = con.execute(f"""
        WITH edges(polygon_id, x1, y1, x2, y2) AS (VALUES {_edges_values()})
        SELECT p.pid, e.polygon_id
        FROM pts p JOIN edges e
          ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
         AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
        GROUP BY p.pid, e.polygon_id
        HAVING COUNT(*) % 2 = 1
    """).df()
    sql_hits = set(zip(got["pid"].astype(int), got["polygon_id"].astype(int)))
    kern_hits = set()
    for p in FLAGSHIP_POLYGONS:
        m = points_in_polygon(lon, lat, [list(r) for r in p.rings])
        kern_hits |= {(int(i), p.polygon_id) for i in np.flatnonzero(m)}
    assert sql_hits == kern_hits
