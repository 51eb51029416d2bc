"""Driver-facing query registry: every entry pairs a Ray Data pipeline
(`QUERIES[name](sf_dir) -> Dataset`) with an equivalent DuckDB SQL
string (`ORACLE_SQL[name]`) over the same parquet tables.  Column
names and value rounding are kept in lockstep between the two sides —
the driver's comparator hashes values after sorting columns by name.

Float discipline: every derived coordinate is integer arithmetic
followed by a single division, so both engines hold bit-identical
doubles; aggregate outputs are rounded to 6 decimals on BOTH sides;
distance comparisons use squared distance (multiplication only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .ops import zonal as Z
from .ops.gridstats import GridConfig, grid_stats
from .ops.neighbors import knn_join, range_join
from .stages import tpch

RES = 5.0
RADIUS = 7.5
R6 = 6  # rounding digits

# zonal rectangles — bounds at .x5 offsets so no point (multiples of
# 0.1) ever lands on a boundary; 1 & 2 overlap, 2 & 3 overlap (F3's
# "a point may match many polygons")
RECTS = [
    (1, 12.35, 5.15, 55.25, 48.45),
    (2, 40.05, 30.05, 80.15, 70.25),
    (3, 60.05, 10.15, 95.35, 45.45),
    (4, 5.05, 60.15, 45.35, 95.45),
]
RECT_POLYS = [Z.rect(*r) for r in RECTS]

RECTS_SQL = "rects(polygon_id, minx, miny, maxx, maxy) AS (VALUES " + ", ".join(
    f"({i}, {a}, {b}, {c}, {d})" for i, a, b, c, d in RECTS
) + ")"

# shared SQL prologue: derived points, snapped data-driven bounds, cells
PRELUDE = f"""
WITH pts AS ({tpch.PTS_SQL}),
b AS (
  SELECT floor(min(x)/{RES})*{RES} AS minx, floor(min(y)/{RES})*{RES} AS miny,
         floor(max(x)/{RES})*{RES}+{RES} AS maxx, floor(max(y)/{RES})*{RES}+{RES} AS maxy
  FROM pts),
g AS (
  SELECT greatest(1, CAST(ceil((maxx-minx)/{RES}) AS BIGINT)) AS ncols,
         greatest(1, CAST(ceil((maxy-miny)/{RES}) AS BIGINT)) AS nrows,
         minx, miny FROM b),
cells AS (
  SELECT (g.nrows - CAST(floor((p.y-g.miny)/{RES}) AS BIGINT) - 1)*g.ncols
         + CAST(floor((p.x-g.minx)/{RES}) AS BIGINT) AS cell_id, p.*
  FROM pts p, g),
smp AS ({tpch.SAMPLES_SQL})
"""



def _round_away(x, digits: int = R6):
    """Half-away-from-zero rounding, bit-matching DuckDB ROUND(x, n)
    (std::round(x * 10^n) / 10^n). np.round is half-to-even and flips
    exact-binary halves like 105/128 the other way."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0 ** digits
    return np.copysign(np.floor(np.abs(x) * p + 0.5), x) / p

def _round_cols(ds: ray.data.Dataset, cols: list[str], digits: int = R6) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            i = t.schema.get_field_index(c)
            v = _round_away(t[c].to_numpy(zero_copy_only=False), digits)
            t = t.set_column(i, c, pa.array(v))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grid / cell stats (A1-A7, J2, R1)

def q_grid_count(sf_dir: str):
    pts = tpch.read_points(sf_dir)
    out = grid_stats(pts, GridConfig(res=RES, stats=("count",)))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell_id": t["cell_id"].to_numpy(zero_copy_only=False),
                "n": t["count"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


SQL_GRID_COUNT = PRELUDE + "SELECT cell_id, count(*) AS n FROM cells GROUP BY cell_id"


def q_grid_stats(sf_dir: str):
    pts = tpch.read_points(sf_dir)
    out = grid_stats(pts, GridConfig(res=RES, stats=("count", "min", "max", "mean", "density")))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell_id": t["cell_id"].to_numpy(zero_copy_only=False),
                "n": t["count"].to_numpy(zero_copy_only=False).astype(np.int64),
                "min_z": t["min"].to_numpy(zero_copy_only=False),
                "max_z": t["max"].to_numpy(zero_copy_only=False),
                "mean_z": _round_away(t["mean"].to_numpy(zero_copy_only=False), R6),
                "density": _round_away(t["density"].to_numpy(zero_copy_only=False), R6),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


SQL_GRID_STATS = PRELUDE + f"""
SELECT cell_id, count(*) AS n, min(z) AS min_z, max(z) AS max_z,
       round(avg(z), {R6}) AS mean_z,
       round(count(*)/({RES}*{RES}), {R6}) AS density
FROM cells GROUP BY cell_id"""


def q_grid_exact(sf_dir: str):
    pts = tpch.read_points(sf_dir)
    out = grid_stats(
        pts,
        GridConfig(
            res=RES,
            stats=("count", "median", "variance", "stddev", "skew", "kurtosis", "q1", "q2", "q3"),
            strategy="exact",
            salt_hot=True,  # probe + salt skewed cells (north_rule)
        ),
    )

    def fin(t: pa.Table) -> pa.Table:
        n = t["count"].to_numpy(zero_copy_only=False)
        keep = n > 1
        t = t.filter(pa.array(keep))
        n = t["count"].to_numpy(zero_copy_only=False)
        cols = {"cell_id": t["cell_id"].to_numpy(zero_copy_only=False), "n": n.astype(np.int64)}
        for src, dst in [
            ("median", "median_z"),
            ("variance", "var_z"),
            ("stddev", "stddev_z"),
            ("skew", "skew_z"),
            ("kurtosis", "kurt_z"),
            ("q1", "q1"),
            ("q2", "q2"),
            ("q3", "q3"),
        ]:
            cols[dst] = _round_away(t[src].to_numpy(zero_copy_only=False), R6)
        return pa.table(cols)

    return out.map_batches(fin, batch_format="pyarrow")


SQL_GRID_EXACT = PRELUDE + f""",
m AS (SELECT cell_id, avg(z) AS mz, count(*) AS n FROM cells GROUP BY cell_id)
SELECT c.cell_id, m.n,
  round(median(c.z), {R6}) AS median_z,
  round(sum((c.z-m.mz)*(c.z-m.mz))/(m.n-1), {R6}) AS var_z,
  round(sqrt(sum((c.z-m.mz)*(c.z-m.mz))/(m.n-1)), {R6}) AS stddev_z,
  round(sum(pow(c.z-m.mz, 3)/m.n) / pow(sqrt(sum((c.z-m.mz)*(c.z-m.mz))/(m.n-1)), 3), {R6}) AS skew_z,
  round(sum(pow(c.z-m.mz, 4)/m.n) / pow(sqrt(sum((c.z-m.mz)*(c.z-m.mz))/(m.n-1)), 4) - 3.0, {R6}) AS kurt_z,
  round(list_sort(list(c.z))[CAST(ceil((1.0/5.0)*(m.n-1)) AS BIGINT) + 1], {R6}) AS q1,
  round(list_sort(list(c.z))[CAST(ceil((2.0/5.0)*(m.n-1)) AS BIGINT) + 1], {R6}) AS q2,
  round(list_sort(list(c.z))[CAST(ceil((3.0/5.0)*(m.n-1)) AS BIGINT) + 1], {R6}) AS q3
FROM cells c JOIN m USING (cell_id)
GROUP BY c.cell_id, m.n, m.mz
HAVING m.n > 1"""


def q_grid_radius(sf_dir: str):
    pts = tpch.read_points(sf_dir)
    out = grid_stats(pts, GridConfig(res=RES, radius=RADIUS, stats=("count", "mean")))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell_id": t["cell_id"].to_numpy(zero_copy_only=False),
                "n": t["count"].to_numpy(zero_copy_only=False).astype(np.int64),
                "mean_z": _round_away(t["mean"].to_numpy(zero_copy_only=False), R6),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


# candidate cells via generate_series (grid is small: <= 64x64 at this
# res); the radius criterion is the CELL-CENTROID distance
SQL_GRID_RADIUS = PRELUDE + f""",
allcells AS (
  SELECT (g.nrows - r.r - 1)*g.ncols + c.c AS cell_id,
         g.minx + c.c*{RES} + {RES}*0.5 AS cx,
         g.miny + r.r*{RES} + {RES}*0.5 AS cy
  FROM g, generate_series(0, 63) c(c), generate_series(0, 63) r(r)
  WHERE c.c < g.ncols AND r.r < g.nrows)
SELECT a.cell_id, count(*) AS n, round(avg(p.z), {R6}) AS mean_z
FROM pts p JOIN allcells a
  ON sqrt((a.cx-p.x)*(a.cx-p.x) + (a.cy-p.y)*(a.cy-p.y)) <= {RADIUS}
GROUP BY a.cell_id"""


def q_grid_filtered(sf_dir: str):
    """M1 class filter + M2 angle filter feeding the grid (lasgrid -c/-a)."""
    pts = tpch.read_points(sf_dir)
    out = grid_stats(
        pts,
        GridConfig(res=RES, stats=("count", "mean"), class_filter=frozenset({1, 2}), angle_limit=45),
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell_id": t["cell_id"].to_numpy(zero_copy_only=False),
                "n": t["count"].to_numpy(zero_copy_only=False).astype(np.int64),
                "mean_z": _round_away(t["mean"].to_numpy(zero_copy_only=False), R6),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


SQL_GRID_FILTERED = PRELUDE + f"""
SELECT cell_id, count(*) AS n, round(avg(z), {R6}) AS mean_z
FROM cells WHERE cls IN (1, 2) AND abs(scan_angle) <= 45
GROUP BY cell_id"""


def q_gap_fraction(sf_dir: str):
    """A11 gap-fraction bundle per cell (IR / BLa / BLb / RR / FR) —
    partial-aggregate path: every gap fraction is a ratio of masked
    sums over INTEGER intensities/counts, so per-batch partial sums
    (exact in float64) + one tiny grouped rollup reproduce the
    per-cell kernels bit-for-bit with no per-key Python."""
    from .ops.gridstats import assign_cells, compute_bounds
    from .stages.grouped import grouped_map

    pts = tpch.read_points(sf_dir)
    b = compute_bounds(pts, RES)
    cells = assign_cells(
        pts,
        GridConfig(res=RES, stats=("count",)),
        b,
        keep_cols=("intensity", "cls", "return_num", "num_returns"),
    )

    def partials(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False)
        inten = t["intensity"].to_numpy(zero_copy_only=False).astype(np.float64)
        cls = t["cls"].to_numpy(zero_copy_only=False)
        rn = t["return_num"].to_numpy(zero_copy_only=False)
        nr = t["num_returns"].to_numpy(zero_copy_only=False)
        g = cls == 2
        sgl = nr == 1
        lst = (nr > 0) & (rn == nr)
        fst = (nr > 0) & (rn == 1)
        mid = (nr > 2) & (rn > 1) & (rn < nr)
        masked = {
            "total_i": inten,
            "canopy_i": inten * ~g,
            "gnd_i": inten * g,
            "all_lt2_i": inten * (cls < 2),
            "gnd_single_i": inten * (g & sgl),
            "gnd_last_i": inten * (g & lst),
            "first_i": inten * fst,
            "single_i": inten * sgl,
            "mid_i": inten * mid,
            "last_i": inten * lst,
            "n": np.ones(len(cid)),
            "canopy_n": (~g).astype(np.float64),
            "first_n": fst.astype(np.float64),
            "first_canopy_n": (fst & ~g).astype(np.float64),
        }
        uniq, inv = np.unique(cid, return_inverse=True)
        out = {"cell_id": uniq}
        for k, v in masked.items():
            out[k] = np.bincount(inv, weights=v)
        return pa.table(out)

    partial_cells = cells.map_batches(partials, batch_format="pyarrow")

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("cell_id", sort=False).sum().reset_index()
        nod = -9999.0
        with np.errstate(divide="ignore", invalid="ignore"):
            gap_ir = np.where(s["total_i"] != 0, s["canopy_i"] / s["total_i"], nod)
            gap_bla = np.where(
                s["all_lt2_i"] != 0, 1.0 - np.sqrt(s["gnd_i"] / s["all_lt2_i"]), nod
            )
            denom = (s["first_i"] + s["single_i"]) / s["total_i"] + np.sqrt(
                (s["mid_i"] + s["last_i"]) / s["total_i"]
            )
            num = s["gnd_single_i"] / s["total_i"] + np.sqrt(s["gnd_last_i"] / s["total_i"])
            gap_blb = np.where(
                (s["total_i"] != 0) & (denom != 0), num / denom, nod
            )
            gap_rr = np.where(s["n"] != 0, s["canopy_n"] / s["n"], nod)
            gap_fr = np.where(s["first_n"] != 0, s["first_canopy_n"] / s["first_n"], nod)
        return pd.DataFrame(
            {
                "cell_id": s["cell_id"],
                "gap_ir": _round_away(gap_ir, R6),
                "gap_bla": _round_away(gap_bla, R6),
                "gap_blb": _round_away(gap_blb, R6),
                "gap_rr": _round_away(gap_rr, R6),
                "gap_fr": _round_away(gap_fr, R6),
            }
        )

    return grouped_map(partial_cells, ["cell_id"], rollup)


SQL_GAP_FRACTION = PRELUDE + f""",
s AS (
  SELECT cell_id,
    sum(intensity) AS total_i,
    sum(CASE WHEN cls <> 2 THEN intensity ELSE 0 END) AS canopy_i,
    sum(CASE WHEN cls = 2 THEN intensity ELSE 0 END) AS gnd_i,
    sum(CASE WHEN cls < 2 THEN intensity ELSE 0 END) AS all_lt2_i,
    sum(CASE WHEN cls = 2 AND num_returns = 1 THEN intensity ELSE 0 END) AS gnd_single_i,
    sum(CASE WHEN cls = 2 AND num_returns > 0 AND return_num = num_returns THEN intensity ELSE 0 END) AS gnd_last_i,
    sum(CASE WHEN num_returns > 0 AND return_num = 1 THEN intensity ELSE 0 END) AS first_i,
    sum(CASE WHEN num_returns = 1 THEN intensity ELSE 0 END) AS single_i,
    sum(CASE WHEN num_returns > 2 AND return_num > 1 AND return_num < num_returns THEN intensity ELSE 0 END) AS mid_i,
    sum(CASE WHEN num_returns > 0 AND return_num = num_returns THEN intensity ELSE 0 END) AS last_i,
    count(*) AS n,
    sum(CASE WHEN cls <> 2 THEN 1 ELSE 0 END) AS canopy_n,
    sum(CASE WHEN num_returns > 0 AND return_num = 1 THEN 1 ELSE 0 END) AS first_n,
    sum(CASE WHEN num_returns > 0 AND return_num = 1 AND cls <> 2 THEN 1 ELSE 0 END) AS first_canopy_n
  FROM cells GROUP BY cell_id)
SELECT cell_id,
  round(CASE WHEN total_i <> 0 THEN canopy_i::DOUBLE/total_i ELSE -9999.0 END, {R6}) AS gap_ir,
  round(CASE WHEN all_lt2_i <> 0 THEN 1.0 - sqrt(gnd_i::DOUBLE/all_lt2_i) ELSE -9999.0 END, {R6}) AS gap_bla,
  round(CASE WHEN total_i = 0 THEN -9999.0
             WHEN (first_i+single_i)::DOUBLE/total_i + sqrt((mid_i+last_i)::DOUBLE/total_i) = 0 THEN -9999.0
             ELSE (gnd_single_i::DOUBLE/total_i + sqrt(gnd_last_i::DOUBLE/total_i))
                  / ((first_i+single_i)::DOUBLE/total_i + sqrt((mid_i+last_i)::DOUBLE/total_i)) END, {R6}) AS gap_blb,
  round(CASE WHEN n <> 0 THEN canopy_n::DOUBLE/n ELSE -9999.0 END, {R6}) AS gap_rr,
  round(CASE WHEN first_n <> 0 THEN first_canopy_n::DOUBLE/first_n ELSE -9999.0 END, {R6}) AS gap_fr
FROM s"""


# ---------------------------------------------------------------------------
# zonal join / clip (J1, J3, A12)

def q_zonal_stats(sf_dir: str):
    pts = tpch.read_points(sf_dir)
    out = Z.zonal_stats(pts, RECT_POLYS, value_col="z", quantiles=4)

    def fin(t: pa.Table) -> pa.Table:
        cols = {"polygon_id": t["polygon_id"].to_numpy(zero_copy_only=False).astype(np.int64)}
        cols["n"] = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        for c in ("sum_v", "min_v", "max_v", "mean_v", "median_v", "var_v", "stddev_v", "q1", "q2", "q3", "q4"):
            cols[c] = _round_away(t[c].to_numpy(zero_copy_only=False), R6)
        return pa.table(cols)

    return out.map_batches(fin, batch_format="pyarrow")


SQL_ZONAL_STATS = PRELUDE + f""",
{RECTS_SQL},
j AS (
  SELECT r.polygon_id, p.z FROM pts p JOIN rects r
  ON p.x > r.minx AND p.x < r.maxx AND p.y > r.miny AND p.y < r.maxy),
m AS (SELECT polygon_id, avg(z) AS mz, count(*) AS n FROM j GROUP BY polygon_id)
SELECT j.polygon_id, m.n,
  round(sum(j.z), {R6}) AS sum_v,
  round(min(j.z), {R6}) AS min_v,
  round(max(j.z), {R6}) AS max_v,
  round(sum(j.z)/m.n, {R6}) AS mean_v,
  round(median(j.z), {R6}) AS median_v,
  round(sum((j.z-m.mz)*(j.z-m.mz))/(m.n-1), {R6}) AS var_v,
  round(sqrt(sum((j.z-m.mz)*(j.z-m.mz))/(m.n-1)), {R6}) AS stddev_v,
  round(list_sort(list(j.z))[CAST(ceil((1.0/5.0)*(m.n-1)) AS BIGINT) + 1], {R6}) AS q1,
  round(list_sort(list(j.z))[CAST(ceil((2.0/5.0)*(m.n-1)) AS BIGINT) + 1], {R6}) AS q2,
  round(list_sort(list(j.z))[CAST(ceil((3.0/5.0)*(m.n-1)) AS BIGINT) + 1], {R6}) AS q3,
  round(list_sort(list(j.z))[CAST(ceil((4.0/5.0)*(m.n-1)) AS BIGINT) + 1], {R6}) AS q4
FROM j JOIN m USING (polygon_id)
GROUP BY j.polygon_id, m.n, m.mz"""


def q_clip_semi(sf_dir: str):
    pts = tpch.read_points(sf_dir)
    return Z.clip(pts, RECT_POLYS).select_columns(["l_orderkey", "l_linenumber", "x", "y"])


SQL_CLIP_SEMI = PRELUDE + f""",
{RECTS_SQL}
SELECT p.l_orderkey, p.l_linenumber, p.x, p.y FROM pts p
WHERE EXISTS (SELECT 1 FROM rects r
  WHERE p.x > r.minx AND p.x < r.maxx AND p.y > r.miny AND p.y < r.maxy)"""


def q_clip_anti(sf_dir: str):
    pts = tpch.read_points(sf_dir)
    return Z.clip(pts, RECT_POLYS, anti=True).select_columns(["l_orderkey", "l_linenumber", "x", "y"])


SQL_CLIP_ANTI = PRELUDE + f""",
{RECTS_SQL}
SELECT p.l_orderkey, p.l_linenumber, p.x, p.y FROM pts p
WHERE NOT EXISTS (SELECT 1 FROM rects r
  WHERE p.x > r.minx AND p.x < r.maxx AND p.y > r.miny AND p.y < r.maxy)"""


def q_zonal_pairs(sf_dir: str):
    """J1 raw join output rows (image_id analog, polygon_id) — the
    north-rule 'join output rows match' surface."""
    pts = tpch.read_points(sf_dir)
    return Z.zonal_join(pts, RECT_POLYS, keep_cols=("l_orderkey", "l_linenumber"))


SQL_ZONAL_PAIRS = PRELUDE + f""",
{RECTS_SQL}
SELECT p.l_orderkey, p.l_linenumber, r.polygon_id::BIGINT AS polygon_id
FROM pts p JOIN rects r
ON p.x > r.minx AND p.x < r.maxx AND p.y > r.miny AND p.y < r.maxy"""


# ---------------------------------------------------------------------------
# range join / kNN (J4, J9)

def q_range_join(sf_dir: str):
    pts = tpch.read_points(sf_dir)
    smp = tpch.read_samples_table(sf_dir)
    out = range_join(pts, smp, radius=4.0)
    return _round_cols(out, ["dist"])


SQL_RANGE_JOIN = PRELUDE + f"""
SELECT p.l_orderkey, p.l_linenumber, s.s_suppkey,
       round(sqrt((p.x-s.sx)*(p.x-s.sx) + (p.y-s.sy)*(p.y-s.sy)), {R6}) AS dist
FROM pts p JOIN smp s
ON (p.x-s.sx)*(p.x-s.sx) + (p.y-s.sy)*(p.y-s.sy) <= 16.0"""


def q_knn(sf_dir: str):
    pts = tpch.read_points(sf_dir)
    smp = tpch.read_samples_table(sf_dir)
    out = knn_join(pts, smp, k=5)
    return _round_cols(out, ["dist"])


SQL_KNN = PRELUDE + f""",
ranked AS (
  SELECT s.s_suppkey, p.l_orderkey, p.l_linenumber,
         (p.x-s.sx)*(p.x-s.sx) + (p.y-s.sy)*(p.y-s.sy) AS d2,
         row_number() OVER (
           PARTITION BY s.s_suppkey
           ORDER BY (p.x-s.sx)*(p.x-s.sx) + (p.y-s.sy)*(p.y-s.sy),
                    p.l_orderkey, p.l_linenumber) AS rank
  FROM pts p CROSS JOIN smp s)
SELECT s_suppkey, l_orderkey, l_linenumber, rank, round(sqrt(d2), {R6}) AS dist
FROM ranked WHERE rank <= 5"""


# ---------------------------------------------------------------------------
# map / filter / union (M1-M5, U1, A16, O6)

def q_class_remap(sf_dir: str):
    """M5 class remap + grouped rollup."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )

    def fn(t: pa.Table) -> pa.Table:
        # remap + batch-local combine: <= 3 partial rows leave each
        # batch (count + quantity sum per mapped class), so the
        # exchange is O(blocks x 3) regardless of input rows
        f = t["l_returnflag"].to_numpy(zero_copy_only=False)
        mapped = np.where(f == "A", 0, np.where(f == "N", 1, 2))
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        n = np.bincount(mapped, minlength=3)
        sq = np.bincount(mapped, weights=qty, minlength=3)
        keep = n > 0
        return pa.table(
            {
                "mapped_cls": (np.arange(3)[keep] + 1) * 10,
                "pn": n[keep],
                "psq": sq[keep],
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("mapped_cls")
        .aggregate(Sum("pn", alias_name="n"), Sum("psq", alias_name="sum_qty"))
    )
    return _round_cols(out, ["sum_qty"])


SQL_CLASS_REMAP = f"""
SELECT CASE l_returnflag WHEN 'A' THEN 10 WHEN 'N' THEN 20 ELSE 30 END::BIGINT AS mapped_cls,
       count(*) AS n, round(sum(l_quantity), {R6}) AS sum_qty
FROM lineitem GROUP BY 1"""


def q_bounds(sf_dir: str):
    """A16 global bounds + counts (las header recompute)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    pts = tpch.read_points(sf_dir)
    agg = pts.aggregate(
        Min("x"), Max("x"), Min("y"), Max("y"), Min("z"), Max("z"), Count(), Sum("z")
    )
    df = pd.DataFrame(
        {
            "minx": [agg["min(x)"]],
            "maxx": [agg["max(x)"]],
            "miny": [agg["min(y)"]],
            "maxy": [agg["max(y)"]],
            "minz": [agg["min(z)"]],
            "maxz": [agg["max(z)"]],
            "n": [np.int64(agg["count()"])],
            "sum_z": [float(_round_away(agg["sum(z)"], R6))],
        }
    )
    return df


SQL_BOUNDS = PRELUDE + f"""
SELECT min(x) AS minx, max(x) AS maxx, min(y) AS miny, max(y) AS maxy,
       min(z) AS minz, max(z) AS maxz, count(*) AS n, round(sum(z), {R6}) AS sum_z
FROM pts"""


def q_return_counts(sf_dir: str):
    """A16 counts-by-return (las header point-by-return table).

    Partial-aggregated: each batch collapses to <= 5 (return_num,
    count) rows before the exchange, so the groupby shuffles O(blocks
    x 5) rows instead of every point — the combiner pattern every
    low-cardinality rollup here uses."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        rn = t["return_num"].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(rn, return_counts=True)
        return pa.table({"return_num": vals, "pn": cnts})

    pts = tpch.read_points(sf_dir)
    return (
        pts.map_batches(partial, batch_format="pyarrow")
        .groupby("return_num")
        .aggregate(Sum("pn", alias_name="n"))
    )


SQL_RETURN_COUNTS = PRELUDE + "SELECT return_num, count(*) AS n FROM pts GROUP BY return_num"


def q_merge_union(sf_dir: str):
    """U1 merge of two bbox-filtered 'files' (overlapping -> dup rows kept)."""
    pts = tpch.read_points(sf_dir)

    def clip_box(minx, miny, maxx, maxy):
        def fn(t: pa.Table) -> pa.Table:
            x = t["x"].to_numpy(zero_copy_only=False)
            y = t["y"].to_numpy(zero_copy_only=False)
            m = (x >= minx) & (x <= maxx) & (y >= miny) & (y <= maxy)
            return t.filter(pa.array(m))

        return fn

    box_a = clip_box(0.0, 0.0, 60.05, 60.05)
    box_b = clip_box(40.05, 40.05, 100.0, 100.0)

    def both(t: pa.Table) -> pa.Table:
        # both boxes in ONE pass over one pipeline (two .union branches
        # would fork and re-execute the whole read+derive upstream);
        # overlapping rows are kept twice, as a real two-file merge does
        return pa.concat_tables([box_a(t), box_b(t)])

    u = pts.map_batches(both, batch_format="pyarrow")
    from ray.data.aggregate import Count, Max, Min

    agg = u.aggregate(Min("x"), Max("x"), Min("y"), Max("y"), Count())
    return pd.DataFrame(
        {
            "minx": [agg["min(x)"]],
            "maxx": [agg["max(x)"]],
            "miny": [agg["min(y)"]],
            "maxy": [agg["max(y)"]],
            "n": [np.int64(agg["count()"])],
        }
    )


SQL_MERGE_UNION = PRELUDE + """
, u AS (
  SELECT * FROM pts WHERE x >= 0.0 AND x <= 60.05 AND y >= 0.0 AND y <= 60.05
  UNION ALL
  SELECT * FROM pts WHERE x >= 40.05 AND x <= 100.0 AND y >= 40.05 AND y <= 100.0)
SELECT min(x) AS minx, max(x) AS maxx, min(y) AS miny, max(y) AS maxy, count(*) AS n FROM u"""


def q_top_cells(sf_dir: str):
    """O2/O6 sort + limit: top-20 densest cells, deterministic ties."""
    out = q_grid_count(sf_dir)
    return out.sort(["n", "cell_id"], descending=[True, False]).limit(20)


SQL_TOP_CELLS = (
    PRELUDE
    + "SELECT cell_id, count(*) AS n FROM cells GROUP BY cell_id ORDER BY n DESC, cell_id LIMIT 20"
)


def q_sample_hash(sf_dir: str):
    """O4 deterministic sampling via integer hash (seeded per-row, not
    per-block — permutation-invariant)."""
    pts = tpch.read_points(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = t["l_linenumber"].to_numpy(zero_copy_only=False)
        # uint64 wrap (mod 2^64), matching the oracle's HUGEINT-mod
        # formula: the old int64 wraparound both differed from the
        # stated formula and made the SQL side raise on overflow past
        # l_orderkey ~ 3.5e9
        with np.errstate(over="ignore"):
            h = (
                ok.astype(np.uint64) * np.uint64(2654435761)
                + ln.astype(np.uint64) * np.uint64(40503)
            ) % np.uint64(100)
        return t.filter(pa.array(h < 10))

    from ray.data.aggregate import Count, Sum

    out = pts.map_batches(fn, batch_format="pyarrow").aggregate(Count(), Sum("z"))
    return pd.DataFrame({"n": [np.int64(out["count()"])], "sum_z": [float(_round_away(out["sum(z)"], R6))]})


SQL_SAMPLE_HASH = PRELUDE + f"""
SELECT count(*) AS n, round(sum(z), {R6}) AS sum_z FROM pts
WHERE (CAST(l_orderkey AS HUGEINT) * 2654435761
       + CAST(l_linenumber AS HUGEINT) * 40503)
      % 18446744073709551616 % 100 < 10"""
