"""DuckDB oracle for the flagship image pipeline (img_flagship).

The flagship's input is a synthetic binary image table, so it cannot
be expressed over the driver's pre-registered parquet views — but its
JOIN/DEDUP/ROLLUP semantics are pure arithmetic over deterministic
per-row metadata:

  footprint (lon, lat)  = hash(image_id)-derived centroid (numpy)
  cell_id               = quadtree morton encode at level 12
  PIP join              = even-odd ray cast vs FLAGSHIP_POLYGONS
  dedup                 = first image_id per (phash, polygon_id)
  rollup                = count per (polygon_id, parent cell @ level 10)

So the Ray query persists a tiny side parquet of the INPUTS the SQL
cannot derive ((image_id, lon, lat, phash) — lon/lat are recomputed
here with the same footprint_lonlat the pipeline itself calls inside
footprint_cells_batch, and phash comes from the table metadata the
generator pinned against decoded pixels in tests/test_images.py), and
the oracle re-derives EVERYTHING downstream independently in SQL:

- ray casting: the same strict crossing rule as
  kernels/geom.py:points_in_ring (`(y1 > lat) != (y2 > lat)` and
  `lon < x_cross`), identical IEEE double ops so the hit set matches
  bit-for-bit; boundary exclusion is moot because hash-derived
  coordinates cannot land exactly on an edge (u = k/2^32 scaled by 40
  never equals the vertex decimals).
- dedup: row_number() over (phash, polygon_id) ordered by image_id —
  the lexicographically-first-keeper contract of dedup_by_phash.
- parent cell: level-12 x/y from floor arithmetic (same op order as
  kernels/cellindex.py:lonlat_to_xy), dropped 2 levels via x>>2 /
  y>>2, morton-interleaved with 20 explicit bit terms and tagged with
  the level-10 header — integer ops only, no engine code trusted.

The side parquet lives at a FIXED path (the oracle SQL is a static
string): the Ray query writes it atomically (tmp + os.replace) right
before running, and the driver/harness always runs a query's SQL
immediately after its Ray pipeline, so the file matches the sweep's
scale factor. Reference anchor for the join semantics:
src/pointzonalstats.cpp:393-410 (GEOS contains loop).
"""

from __future__ import annotations

import os

import pyarrow as pa

from .ops.imagepipeline import DEFAULT_LEVEL, FLAGSHIP_POLYGONS

SIDE_PATH = "/tmp/geotools_ray_oracle/img_flagship_side_v1.parquet"

_PARENT_LEVEL = DEFAULT_LEVEL - 2  # cell_rollup rolls up 2 levels


def write_flagship_side(tb: pa.Table, seed: int = 42) -> str:
    """Persist (image_id, lon, lat, phash) for the oracle; atomic so a
    crashed writer never leaves a half-file behind the fixed path."""
    import pyarrow.parquet as pq

    from .sources.images import footprint_lonlat

    lon, lat = footprint_lonlat(tb["image_id"], seed=seed)
    side = pa.table(
        {
            "image_id": tb["image_id"].combine_chunks(),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
            "phash": tb["phash"].combine_chunks(),
        }
    )
    os.makedirs(os.path.dirname(SIDE_PATH), exist_ok=True)
    tmp = f"{SIDE_PATH}.tmp.{os.getpid()}"
    pq.write_table(side, tmp)
    os.replace(tmp, SIDE_PATH)
    return SIDE_PATH


def _edges_values() -> str:
    rows = []
    for p in FLAGSHIP_POLYGONS:
        for ring in p.rings:
            r = list(ring)
            if r[0] == r[-1]:
                r = r[:-1]
            for i in range(len(r)):
                (x1, y1), (x2, y2) = r[i], r[(i + 1) % len(r)]
                rows.append(
                    f"({p.polygon_id}, {x1!r}, {y1!r}, {x2!r}, {y2!r})"
                )
    return ",\n         ".join(rows)


def _morton_terms(xv: str, yv: str, bits: int) -> str:
    terms = [f"((({xv} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    terms += [f"((({yv} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return " + ".join(terms)


def _build_sql() -> str:
    n12 = 1 << DEFAULT_LEVEL
    header = _PARENT_LEVEL << 58
    return f"""
WITH side AS (SELECT * FROM read_parquet('{SIDE_PATH}')),
edges(polygon_id, x1, y1, x2, y2) AS (
  VALUES {_edges_values()}),
hits AS (
  -- even-odd crossing count, strict inequalities (points_in_ring)
  SELECT s.image_id, s.phash, s.lon, s.lat, e.polygon_id
  FROM side s JOIN edges e
    ON ((e.y1 > s.lat) <> (e.y2 > s.lat))
   AND s.lon < (e.x2 - e.x1) * (s.lat - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY s.image_id, s.phash, s.lon, s.lat, e.polygon_id
  HAVING COUNT(*) % 2 = 1),
kept AS (
  -- dedup_by_phash: lexicographically-first image_id per key
  SELECT *, row_number() OVER (
      PARTITION BY phash, polygon_id ORDER BY image_id) AS rn
  FROM hits),
cells AS (
  -- lonlat_to_xy at level {DEFAULT_LEVEL}, then parent = drop 2 levels
  SELECT polygon_id,
    (CAST(FLOOR((lon + 180.0) / 360.0 * {n12}.0) AS BIGINT) % {n12}) >> 2 AS mx,
    LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 180.0 * {n12}.0) AS BIGINT), 0), {n12 - 1}) >> 2 AS my
  FROM kept WHERE rn = 1)
SELECT CAST(polygon_id AS BIGINT) AS polygon_id,
       {header} + {_morton_terms("mx", "my", _PARENT_LEVEL)} AS parent_cell,
       COUNT(*)::BIGINT AS n_images
FROM cells
GROUP BY 1, 2"""


SQL_IMG_FLAGSHIP = _build_sql()
