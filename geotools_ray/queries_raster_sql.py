"""DuckDB oracle SQL for the raster-family queries (W1-W5, O3, O5,
J5, J6, R4, R7, A14) — converts the round-1 `no_oracle` rows-only
checks into hash-checked ones.

Every query models the SAME dense mean-z raster the engine derives
(res 2.0, data-snapped bounds, top-first row-major cell ids,
nodata -9999) as a `grid(row, col, v)` CTE, then restates the exact
windowed kernel semantics (including the reference's edge quirks — see
kernels/raster.py docstrings for the src/*.cpp citations) as
self-joins / window functions over it.

Float discipline: weights and tan-curve alphas are inlined as Python
repr() literals (round-trip exact doubles), outputs are rounded with
the same digits as the engine side, and tile checksums aggregate
before rounding so summation-order noise (~1e-13) stays far below the
rounding grain.
"""

from __future__ import annotations


from .kernels.raster import gaussian_weights, tan_curve
from .stages import tpch

RES = 2.0
NOD = "-9999.0"

# ---------------------------------------------------------------------------
# shared CTE body (no WITH prefix so callers can prepend WITH RECURSIVE)

# grid: dense (row, col, v=mean z, n=count) raster, top-first rows.
GRID_BODY = f"""
pts AS ({tpch.PTS_SQL}),
b AS (
  SELECT floor(min(x)/{RES})*{RES} AS minx, floor(min(y)/{RES})*{RES} AS miny,
         floor(max(x)/{RES})*{RES}+{RES} AS maxx, floor(max(y)/{RES})*{RES}+{RES} AS maxy
  FROM pts),
g AS (
  SELECT greatest(1, CAST(ceil((maxx-minx)/{RES}) AS BIGINT)) AS w,
         greatest(1, CAST(ceil((maxy-miny)/{RES}) AS BIGINT)) AS h,
         minx, miny FROM b),
pc AS (
  SELECT (g.h - CAST(floor((p.y-g.miny)/{RES}) AS BIGINT) - 1) AS row,
         CAST(floor((p.x-g.minx)/{RES}) AS BIGINT) AS col, p.z
  FROM pts p, g),
mg AS (SELECT row, col, avg(z) AS v, count(*) AS n FROM pc GROUP BY row, col),
grid AS (
  SELECT a.row, a.col, coalesce(mg.v, {NOD}) AS v
  FROM (SELECT rr.r AS row, cc.c AS col
        FROM g, generate_series(0, 63) rr(r), generate_series(0, 63) cc(c)
        WHERE rr.r < g.h AND cc.c < g.w) a
  LEFT JOIN mg ON mg.row = a.row AND mg.col = a.col)
"""

# exact-strategy mean/median per cell (raster_diff / rastfit)
GRID2_PRELUDE = f"""
pts AS ({tpch.PTS_SQL}),
b AS (
  SELECT floor(min(x)/{RES})*{RES} AS minx, floor(min(y)/{RES})*{RES} AS miny,
         floor(max(x)/{RES})*{RES}+{RES} AS maxx, floor(max(y)/{RES})*{RES}+{RES} AS maxy
  FROM pts),
g AS (
  SELECT greatest(1, CAST(ceil((maxx-minx)/{RES}) AS BIGINT)) AS w,
         greatest(1, CAST(ceil((maxy-miny)/{RES}) AS BIGINT)) AS h,
         minx, miny FROM b)"""

GRID2_BODY = GRID2_PRELUDE + f""",
pc AS (
  SELECT (g.h - CAST(floor((p.y-g.miny)/{RES}) AS BIGINT) - 1) AS row,
         CAST(floor((p.x-g.minx)/{RES}) AS BIGINT) AS col, p.z
  FROM pts p, g),
mm AS (SELECT row, col, avg(z) AS mean, median(z) AS med, count(*) AS n
       FROM pc GROUP BY row, col)
"""

# 3x3 gaussian weights (sigma=1, size=3) as round-trip-exact literals
_W3 = gaussian_weights(3, 1.0)
WTS_VALUES = ", ".join(
    f"({dr - 1}, {dc - 1}, {_W3[dr, dc]!r})" for dr in range(3) for dc in range(3)
)

# smoothed grid on top of GRID_BODY: all-9-valid gaussian conv; the
# reference's one-short far edge (centers r,c in [1, dim-3], see
# kernels/raster.py:smooth)
SMOOTH_BODY = f"""
wts(dr, dc, wt) AS (VALUES {WTS_VALUES}),
conv AS (
  SELECT a.row, a.col, sum(nb.v * w.wt) AS cv,
         count(*) FILTER (WHERE nb.v <> {NOD}) AS nv
  FROM grid a JOIN wts w ON TRUE
  JOIN grid nb ON nb.row = a.row + w.dr AND nb.col = a.col + w.dc
  GROUP BY a.row, a.col),
sm AS (
  SELECT gr.row, gr.col,
         CASE WHEN c.nv = 9 AND gr.row BETWEEN 1 AND g.h - 3
                   AND gr.col BETWEEN 1 AND g.w - 3
              THEN c.cv ELSE {NOD} END AS v
  FROM grid gr
  LEFT JOIN conv c ON c.row = gr.row AND c.col = gr.col
  CROSS JOIN g)
"""


def _tile_checksum_sql(src: str, tile: int = 16) -> str:
    return f"""
SELECT (row // {tile})::BIGINT AS trow, (col // {tile})::BIGINT AS tcol,
       count(*) FILTER (WHERE v <> {NOD}) AS n_valid,
       round(coalesce(sum(v) FILTER (WHERE v <> {NOD}), 0.0), 4) AS checksum
FROM {src} GROUP BY 1, 2"""


SQL_RASTER_SMOOTH = "WITH " + GRID_BODY + ", " + SMOOTH_BODY + _tile_checksum_sql("sm")


# O3 treetops: center of each 3x3 window is a top iff valid, >= 20,
# and the row-major FIRST maximum of the window is the center
# (earlier equal wins; src/treetops.cpp:72-91), with the one-short
# far-edge range quirk. Shared WHERE body: SQL_TREETOPS emits the
# rounded surface, crowns_verify seeds its recursion from the same set.
_TOPS_WHERE = f"""a.v <> {NOD} AND a.v >= 20.0
  AND a.row BETWEEN 1 AND g.h - 3 AND a.col BETWEEN 1 AND g.w - 3
  AND NOT EXISTS (
    SELECT 1 FROM sm nb
    WHERE nb.row BETWEEN a.row - 1 AND a.row + 1
      AND nb.col BETWEEN a.col - 1 AND a.col + 1
      AND NOT (nb.row = a.row AND nb.col = a.col)
      AND nb.v <> {NOD}
      AND (nb.v > a.v OR (nb.v = a.v
           AND (nb.row < a.row OR (nb.row = a.row AND nb.col < a.col)))))"""

SQL_TREETOPS = "WITH " + GRID_BODY + ", " + SMOOTH_BODY + f"""
SELECT a.col, a.row, round(a.v, 4) AS z
FROM sm a, g
WHERE {_TOPS_WHERE}"""


# W6 crowns_verify: crown growth on ISOLATED tops pinned against a
# recursive reachability closure. The engine's multi-source FIFO BFS
# (kernels/raster.py:crown_growth; src/treetops.cpp:279-408) marks
# visited on ENQUEUE, so a cell is claimed iff SOME already-claimed
# 8-neighbour with a strictly higher value reaches it under the claim
# predicate — i.e. the claimed set of one top is the order-independent
# descending-path closure. Order/contention between tops only matters
# when two tops can claim the same cell, which needs the tops within
# 2*radius (cells); restricting the verified surface to tops whose
# nearest other top has dist^2 > (2*radius)^2 = 16 makes the engine's
# answer provably order-invariant — exactly what the recursive CTE
# computes. The verify variant grows with radius=2.0 (r^2=4): at
# radius 4 the synthetic canopy is too dense for ANY top to be
# isolated (min top spacing ~5.7 cells), while radius 2 leaves a
# ~25% isolated surface; min_height=5.0 and height_fraction=0.5
# mirror q_crowns. Ids are the row-major
# (row, col) rank over ALL tops, so engine and oracle agree on ids
# even for non-isolated tops excluded from the surface.
SQL_CROWNS_VERIFY = "WITH RECURSIVE " + GRID_BODY + ", " + SMOOTH_BODY + f""",
tps AS (
  SELECT a.col, a.row, a.v FROM sm a, g
  WHERE {_TOPS_WHERE}),
idt AS (
  SELECT row_number() OVER (ORDER BY row, col) AS id, col, row, v AS z
  FROM tps),
iso AS (
  SELECT i.* FROM idt i
  WHERE NOT EXISTS (
    SELECT 1 FROM idt o WHERE o.id <> i.id
      AND (o.col - i.col) * (o.col - i.col)
        + (o.row - i.row) * (o.row - i.row) <= 16)),
crown AS (
  SELECT id, row, col, z AS v, col AS tc, row AS tr, z AS tz FROM iso
  UNION
  SELECT c.id, nb.row, nb.col, nb.v, c.tc, c.tr, c.tz
  FROM crown c
  JOIN sm nb ON nb.row BETWEEN c.row - 1 AND c.row + 1
            AND nb.col BETWEEN c.col - 1 AND c.col + 1
            AND NOT (nb.row = c.row AND nb.col = c.col)
  WHERE nb.v <> {NOD} AND nb.v < c.v AND nb.v >= 5.0
    AND nb.v / c.tz >= 0.5
    AND (nb.col - c.tc) * (nb.col - c.tc)
      + (nb.row - c.tr) * (nb.row - c.tr) <= 4)
SELECT id, tc AS top_col, tr AS top_row,
       count(*) AS n_cells, round(sum(v), 4) AS sum_v
FROM crown GROUP BY id, tc, tr ORDER BY id"""


# O5 minima seeds over the MEAN grid: valid cell with no valid
# 8-neighbour strictly lower (src/flood.cpp:430-452).
SQL_MINIMA = "WITH " + GRID_BODY + f"""
SELECT a.col, a.row, round(a.v, 4) AS z
FROM grid a
WHERE a.v <> {NOD}
  AND NOT EXISTS (
    SELECT 1 FROM grid nb
    WHERE nb.row BETWEEN a.row - 1 AND a.row + 1
      AND nb.col BETWEEN a.col - 1 AND a.col + 1
      AND NOT (nb.row = a.row AND nb.col = a.col)
      AND nb.v <> {NOD} AND nb.v < a.v)"""


# W4 flood basins at elevation 20: 4-connected components of
# (valid AND v <= 20), labels = scan-order rank of the component's
# minimum row-major index (matching flood_fill_label's BFS seeding).
# Recursive min-label propagation: labels smaller than each node flow
# along edges (the component min is below every node on any path from
# it, so pruning `lbl < node` is lossless for the min).
SQL_FLOOD_BASINS = "WITH RECURSIVE " + GRID_BODY + f""",
f AS (
  SELECT gr.row * g.w + gr.col AS idx, gr.row, gr.col
  FROM grid gr, g WHERE gr.v <> {NOD} AND gr.v <= 20.0),
e AS (
  SELECT a.idx AS src, b.idx AS dst
  FROM f a JOIN f b ON abs(a.row - b.row) + abs(a.col - b.col) = 1),
reach AS (
  SELECT idx AS node, idx AS lbl FROM f
  UNION
  SELECT e.src, r.lbl FROM reach r JOIN e ON e.dst = r.node
  WHERE r.lbl < e.src),
comp AS (SELECT node, min(lbl) AS rep FROM reach GROUP BY node)
SELECT dense_rank() OVER (ORDER BY rep)::BIGINT AS basin,
       count(*)::BIGINT AS area
FROM comp GROUP BY rep ORDER BY rep"""


SQL_FLOOD_SWEEP = "WITH RECURSIVE " + GRID_BODY + f""",
f AS (
  SELECT el.elev, gr.row * g.w + gr.col AS idx, gr.row, gr.col
  FROM grid gr, g, (VALUES (15.0), (20.0), (25.0), (30.0)) el(elev)
  WHERE gr.v <> {NOD} AND gr.v <= el.elev),
e AS (
  SELECT a.elev, a.idx AS src, b.idx AS dst
  FROM f a JOIN f b ON a.elev = b.elev
   AND abs(a.row - b.row) + abs(a.col - b.col) = 1),
reach AS (
  SELECT elev, idx AS node, idx AS lbl FROM f
  UNION
  SELECT e.elev, e.src, r.lbl FROM reach r JOIN e
    ON r.elev = e.elev AND e.dst = r.node
  WHERE r.lbl < e.src),
comp AS (SELECT elev, node, min(lbl) AS rep FROM reach GROUP BY elev, node)
SELECT round(elev, 4) AS elevation,
       dense_rank() OVER (PARTITION BY elev ORDER BY rep)::BIGINT AS basin,
       count(*)::BIGINT AS area
FROM comp GROUP BY elev, rep ORDER BY elev, rep"""


# W3 mosaic: overlay = per-cell count on the left half; feather alpha
# via erosion-step s = min(cheb-dist-to-invalid - 1, dist-to-border)
# (8-neighbour snow-in erosion == L-inf distance; src/mosaic.cpp:56-99),
# tan-curve alphas inlined; blend where both valid.
_TAN = {s: tan_curve(float(s), 3.0) for s in range(4)}
_ALPHA_CASE = (
    "CASE s WHEN 0 THEN {0!r} WHEN 1 THEN {1!r} WHEN 2 THEN {2!r} "
    "WHEN 3 THEN {3!r} ELSE 1.0 END".format(_TAN[0], _TAN[1], _TAN[2], _TAN[3])
)

SQL_MOSAIC = "WITH " + GRID_BODY + f""",
over AS (
  SELECT gr.row, gr.col,
         CASE WHEN gr.col < g.w // 2 AND m.n IS NOT NULL
              THEN m.n::DOUBLE ELSE {NOD} END AS v
  FROM grid gr
  LEFT JOIN mg m ON m.row = gr.row AND m.col = gr.col
  CROSS JOIN g),
inv AS (SELECT row, col FROM over WHERE v = {NOD}),
od AS (
  SELECT o.row, o.col,
         least(coalesce((SELECT min(greatest(abs(i.row - o.row), abs(i.col - o.col)))
                         FROM inv i
                         WHERE abs(i.row - o.row) <= 4 AND abs(i.col - o.col) <= 4), 99) - 1,
               o.row, o.col, g.h - 1 - o.row, g.w - 1 - o.col) AS s
  FROM over o, g WHERE o.v <> {NOD}),
alpha AS (SELECT row, col, {_ALPHA_CASE} AS a FROM od),
blended AS (
  SELECT bg.row, bg.col,
         CASE WHEN bg.v <> {NOD} AND o.v <> {NOD}
              THEN bg.v * (1.0 - al.a) + o.v * al.a ELSE bg.v END AS v
  FROM grid bg
  LEFT JOIN over o ON o.row = bg.row AND o.col = bg.col
  LEFT JOIN alpha al ON al.row = bg.row AND al.col = bg.col)
""" + _tile_checksum_sql("blended")


# W2 void-fill IDW: expanding radius 2..6, first radius with >= 3
# valid neighbours at squared distance <= r^2; weights 1/d2
# (src/raster.cpp:162-222 with the tile cap max_radius=6).
SQL_VOID_FILL = "WITH " + GRID_BODY + f""",
voids AS (SELECT row, col FROM grid WHERE v = {NOD}),
valid AS (SELECT row, col, v FROM grid WHERE v <> {NOD}),
cand AS (
  SELECT vo.row, vo.col, va.v,
         ((va.row - vo.row)*(va.row - vo.row)
          + (va.col - vo.col)*(va.col - vo.col))::DOUBLE AS d2
  FROM voids vo JOIN valid va
    ON abs(va.row - vo.row) <= 6 AND abs(va.col - vo.col) <= 6
  WHERE (va.row - vo.row)*(va.row - vo.row)
        + (va.col - vo.col)*(va.col - vo.col) <= 36),
radsel AS (
  SELECT row, col,
    CASE WHEN count(*) FILTER (WHERE d2 <= 4.0) >= 3 THEN 4.0
         WHEN count(*) FILTER (WHERE d2 <= 9.0) >= 3 THEN 9.0
         WHEN count(*) FILTER (WHERE d2 <= 16.0) >= 3 THEN 16.0
         WHEN count(*) FILTER (WHERE d2 <= 25.0) >= 3 THEN 25.0
         WHEN count(*) FILTER (WHERE d2 <= 36.0) >= 3 THEN 36.0
         ELSE NULL END AS dmax
  FROM cand GROUP BY row, col),
fills AS (
  SELECT c.row, c.col, sum(c.v / c.d2) / sum(1.0 / c.d2) AS fv
  FROM cand c JOIN radsel r ON r.row = c.row AND r.col = c.col
  WHERE r.dmax IS NOT NULL AND c.d2 <= r.dmax
  GROUP BY c.row, c.col),
filled AS (
  SELECT gr.row, gr.col, coalesce(f.fv, gr.v) AS v
  FROM grid gr LEFT JOIN fills f ON f.row = gr.row AND f.col = gr.col)
""" + _tile_checksum_sql("filled")


# J5 spectral extraction: index raster = cell_id+1 where n >= SPECTRAL_MIN_N,
# band = mean grid; per-pixel (id, x, y, dn) with the reference's
# y-from-grid-row quirk (src/spectral.cpp:97-197).
SPECTRAL_MIN_N = 3
SQL_SPECTRAL = "WITH " + GRID_BODY + f"""
SELECT (m.row * g.w + m.col + 1)::BIGINT AS id,
       round(m.col * {RES} + g.minx + {RES}/2.0, 4) AS x,
       round(m.row * {RES} + g.miny + {RES}/2.0, 4) AS y,
       round(m.v, 4) AS dn
FROM mg m, g WHERE m.n >= {SPECTRAL_MIN_N}"""


# J6/A14 per-class diff stats: diff = mean - median (exact), class =
# count % 4 + 1; population stddev via the engine's explicit formula.
SQL_RASTER_DIFF = "WITH " + GRID2_BODY + f""",
d AS (SELECT (n % 4 + 1) AS cls, (mean - med) AS diff FROM mm),
s AS (SELECT cls, count(*) AS n, sum(diff) AS sd, sum(diff*diff) AS sdd,
             min(diff) AS mn, max(diff) AS mx
      FROM d GROUP BY cls)
SELECT cls::BIGINT AS cls, n,
  round(sd / n, 6) AS mean_diff,
  round(sqrt(greatest(sdd - n * (sd/n) * (sd/n), 0.0) / n), 6) AS stddev_diff,
  round(mn, 6) AS min_diff,
  round(mx, 6) AS max_diff
FROM s"""


# R4 planar fit: least-squares plane over centroid-offset samples,
# evaluated at res-5 cell centroids (Interpolators.cpp:425-524);
# normal equations with centered x/y/z (equals lstsq to ~1e-12 rel).
_RES5 = 5.0
SQL_PLANAR_FIT = f"""
WITH pts AS ({tpch.PTS_SQL}),
b AS (
  SELECT floor(min(x)/{_RES5})*{_RES5} AS minx, floor(min(y)/{_RES5})*{_RES5} AS miny,
         floor(max(x)/{_RES5})*{_RES5}+{_RES5} AS maxx, floor(max(y)/{_RES5})*{_RES5}+{_RES5} AS maxy
  FROM pts),
g AS (
  SELECT greatest(1, CAST(ceil((maxx-minx)/{_RES5}) AS BIGINT)) AS ncols,
         greatest(1, CAST(ceil((maxy-miny)/{_RES5}) AS BIGINT)) AS nrows,
         minx, miny FROM b),
allcells AS (
  SELECT (r.r * g.ncols + c.c) AS cell_id,
         g.minx + c.c*{_RES5} + {_RES5}*0.5 AS cx,
         g.miny + (g.nrows - r.r - 1)*{_RES5} + {_RES5}*0.5 AS cy
  FROM g, generate_series(0, 63) c(c), generate_series(0, 63) r(r)
  WHERE c.c < g.ncols AND r.r < g.nrows),
smp AS ({tpch.SAMPLES_SQL}),
m AS (SELECT avg(sx) AS mx, avg(sy) AS my, avg(sz) AS mz FROM smp),
cs AS (
  SELECT sum((s.sx - m.mx)*(s.sx - m.mx)) AS sxx,
         sum((s.sx - m.mx)*(s.sy - m.my)) AS sxy,
         sum((s.sy - m.my)*(s.sy - m.my)) AS syy,
         sum((s.sx - m.mx)*(s.sz - m.mz)) AS sxz,
         sum((s.sy - m.my)*(s.sz - m.mz)) AS syz
  FROM smp s, m),
ab AS (
  SELECT CASE WHEN abs(sxx*syy - sxy*sxy) < 1e-9 * greatest(sxx*syy, 1.0)
              THEN 0.0 ELSE (sxz*syy - syz*sxy) / (sxx*syy - sxy*sxy) END AS a,
         CASE WHEN abs(sxx*syy - sxy*sxy) < 1e-9 * greatest(sxx*syy, 1.0)
              THEN 0.0 ELSE (sxx*syz - sxy*sxz) / (sxx*syy - sxy*sxy) END AS b
  FROM cs)
SELECT t.cell_id,
       round(ab.a * (t.cx - m.mx) + ab.b * (t.cy - m.my) + m.mz, 6) AS plane_z
FROM allcells t, ab, m"""


# R7 rastfit: deterministic hash-sample 80 valid cells of the
# (mean - median) diff, IDW (exp 1, all samples, exact-hit override)
# correction at every valid cell, subtract; single checksum row
# (src/rastfit.cpp:148-197 with O4 hash sampling).
RASTFIT_N = 80
SQL_RASTFIT = "WITH " + GRID2_BODY + f""",
v AS (SELECT row, col, mean, med, (row * g.w + col) AS idx FROM mm, g),
s AS (
  SELECT row::DOUBLE AS sy, col::DOUBLE AS sx, (mean - med) AS sz, row, col
  FROM v ORDER BY (idx * 2654435761) % 4294967296, idx LIMIT {RASTFIT_N}),
idw AS (
  SELECT t.row, t.col, t.mean,
         max(CASE WHEN (t.col - s.sx)*(t.col - s.sx) + (t.row - s.sy)*(t.row - s.sy) = 0.0
                  THEN 1 ELSE 0 END) AS hit,
         max(CASE WHEN (t.col - s.sx)*(t.col - s.sx) + (t.row - s.sy)*(t.row - s.sy) = 0.0
                  THEN s.sz END) AS hitv,
         sum(CASE WHEN (t.col - s.sx)*(t.col - s.sx) + (t.row - s.sy)*(t.row - s.sy) > 0.0
                  THEN s.sz / ((t.col - s.sx)*(t.col - s.sx) + (t.row - s.sy)*(t.row - s.sy)) END) AS num,
         sum(CASE WHEN (t.col - s.sx)*(t.col - s.sx) + (t.row - s.sy)*(t.row - s.sy) > 0.0
                  THEN 1.0 / ((t.col - s.sx)*(t.col - s.sx) + (t.row - s.sy)*(t.row - s.sy)) END) AS den
  FROM v t CROSS JOIN s GROUP BY t.row, t.col, t.mean),
corr AS (
  SELECT row, col, mean - CASE WHEN hit = 1 THEN hitv ELSE num / den END AS cv
  FROM idw)
SELECT count(*)::BIGINT AS n_valid, round(sum(cv), 4) AS checksum FROM corr"""


# W7 boundary edge CELLS (the distributed part of lasboundary —
# occupied cells lacking a full 8-neighbourhood, grid border always
# edge; src/lasboundary.cpp:85-99). res 5 occupancy.
SQL_BOUNDARY_CELLS = f"""
WITH pts AS ({tpch.PTS_SQL}),
b AS (
  SELECT floor(min(x)/{_RES5})*{_RES5} AS minx, floor(min(y)/{_RES5})*{_RES5} AS miny,
         floor(max(x)/{_RES5})*{_RES5}+{_RES5} AS maxx, floor(max(y)/{_RES5})*{_RES5}+{_RES5} AS maxy
  FROM pts),
g AS (
  SELECT greatest(1, CAST(ceil((maxx-minx)/{_RES5}) AS BIGINT)) AS ncols,
         greatest(1, CAST(ceil((maxy-miny)/{_RES5}) AS BIGINT)) AS nrows,
         minx, miny FROM b),
occ AS (
  SELECT DISTINCT CAST(floor((p.y - g.miny)/{_RES5}) AS BIGINT) AS row,
                  CAST(floor((p.x - g.minx)/{_RES5}) AS BIGINT) AS col
  FROM pts p, g)
SELECT o.col, o.row FROM occ o, g
WHERE o.col = 0 OR o.row = 0 OR o.col >= g.ncols - 1 OR o.row >= g.nrows - 1
   OR (SELECT count(*) FROM occ nb
       WHERE nb.row BETWEEN o.row - 1 AND o.row + 1
         AND nb.col BETWEEN o.col - 1 AND o.col + 1) < 9"""


# W5 spill points: basin labels via the recursive CC (as flood_basins),
# edge cells = basin cells with any in-bounds 8-neighbour of a
# different label (off-grid neighbours do NOT count,
# src/flood.cpp:150-173), all cross-basin pairs within distance 4
# (src/flood.cpp:369-401).
SQL_SPILL_POINTS = "WITH RECURSIVE " + GRID_BODY + f""",
f AS (
  SELECT gr.row * g.w + gr.col AS idx, gr.row, gr.col
  FROM grid gr, g WHERE gr.v <> {NOD} AND gr.v <= 20.0),
e AS (
  SELECT a.idx AS src, b.idx AS dst
  FROM f a JOIN f b ON abs(a.row - b.row) + abs(a.col - b.col) = 1),
reach AS (
  SELECT idx AS node, idx AS lbl FROM f
  UNION
  SELECT e.src, r.lbl FROM reach r JOIN e ON e.dst = r.node
  WHERE r.lbl < e.src),
comp AS (SELECT node, min(lbl) AS rep FROM reach GROUP BY node),
rk AS (
  SELECT rep, row_number() OVER (ORDER BY rep) AS bid
  FROM (SELECT DISTINCT rep FROM comp)),
cl AS (
  SELECT f.row, f.col, rk.bid
  FROM f JOIN comp ON comp.node = f.idx JOIN rk ON rk.rep = comp.rep),
same AS (
  SELECT a.row, a.col, count(*) AS nsame
  FROM cl a JOIN cl b
    ON abs(a.row - b.row) <= 1 AND abs(a.col - b.col) <= 1
   AND NOT (a.row = b.row AND a.col = b.col) AND a.bid = b.bid
  GROUP BY a.row, a.col),
edge AS (
  -- edge iff same-label neighbour count < in-bounds neighbour count
  SELECT c.bid, c.row, c.col
  FROM cl c
  LEFT JOIN same s ON s.row = c.row AND s.col = c.col
  CROSS JOIN g
  WHERE coalesce(s.nsame, 0) <
        (least(c.row + 1, g.h - 1) - greatest(c.row - 1, 0) + 1)
        * (least(c.col + 1, g.w - 1) - greatest(c.col - 1, 0) + 1) - 1)
SELECT a.bid::BIGINT AS id1, a.col AS c1, a.row AS r1,
       b.bid::BIGINT AS id2, b.col AS c2, b.row AS r2,
       round(sqrt(((a.col - b.col)*(a.col - b.col)
                   + (a.row - b.row)*(a.row - b.row))::DOUBLE), 6) AS dist
FROM edge a JOIN edge b
  ON a.bid < b.bid
 AND (a.col - b.col)*(a.col - b.col) + (a.row - b.row)*(a.row - b.row) <= 16"""


# R8 raster correction: four class-filtered mean rasters from ONE
# (cell, cls) pass; all-pairs (i<j) diff stats over common-valid
# cells; greedy max-count chains to root 0 unrolled (edges strictly
# descend j -> i < j, so depth <= 3).
SQL_RASTER_CORRECTION = "WITH " + GRID2_PRELUDE + f""",
pcc AS (
  SELECT (g.h - CAST(floor((p.y-g.miny)/{RES}) AS BIGINT) - 1) AS row,
         CAST(floor((p.x-g.minx)/{RES}) AS BIGINT) AS col, p.z, p.cls
  FROM pts p, g),
mz AS (
  SELECT row, col,
         sum(z) / count(*) AS m0,
         CASE WHEN count(*) FILTER (WHERE cls = 1) > 0
              THEN sum(z) FILTER (WHERE cls = 1) / count(*) FILTER (WHERE cls = 1) END AS m1,
         CASE WHEN count(*) FILTER (WHERE cls = 2) > 0
              THEN sum(z) FILTER (WHERE cls = 2) / count(*) FILTER (WHERE cls = 2) END AS m2,
         CASE WHEN count(*) FILTER (WHERE cls = 3) > 0
              THEN sum(z) FILTER (WHERE cls = 3) / count(*) FILTER (WHERE cls = 3) END AS m3
  FROM pcc GROUP BY row, col),
pairs AS (
  SELECT 0 AS i, 1 AS j, count(*) AS cnt, sum(m0 - m1) / count(*) AS mean
    FROM mz WHERE m1 IS NOT NULL
  UNION ALL
  SELECT 0, 2, count(*), sum(m0 - m2) / count(*) FROM mz WHERE m2 IS NOT NULL
  UNION ALL
  SELECT 0, 3, count(*), sum(m0 - m3) / count(*) FROM mz WHERE m3 IS NOT NULL
  UNION ALL
  SELECT 1, 2, count(*), sum(m1 - m2) / count(*) FROM mz
    WHERE m1 IS NOT NULL AND m2 IS NOT NULL
  UNION ALL
  SELECT 1, 3, count(*), sum(m1 - m3) / count(*) FROM mz
    WHERE m1 IS NOT NULL AND m3 IS NOT NULL
  UNION ALL
  SELECT 2, 3, count(*), sum(m2 - m3) / count(*) FROM mz
    WHERE m2 IS NOT NULL AND m3 IS NOT NULL),
be AS (
  SELECT j, i, mean FROM (
    SELECT j, i, mean,
           row_number() OVER (PARTITION BY j ORDER BY cnt DESC, i) AS rn
    FROM pairs WHERE cnt > 0) WHERE rn = 1),
s1 AS (SELECT j AS rid, i AS nxt, mean AS acc FROM be),
s2 AS (SELECT s1.rid, be.i AS nxt, s1.acc + be.mean AS acc
       FROM s1 JOIN be ON be.j = s1.nxt WHERE s1.nxt <> 0),
s3 AS (SELECT s2.rid, be.i AS nxt, s2.acc + be.mean AS acc
       FROM s2 JOIN be ON be.j = s2.nxt WHERE s2.nxt <> 0),
done AS (
  SELECT rid, acc FROM s1 WHERE nxt = 0
  UNION ALL SELECT rid, acc FROM s2 WHERE nxt = 0
  UNION ALL SELECT rid, acc FROM s3 WHERE nxt = 0)
SELECT rid::BIGINT AS rid, round(acc, 6) AS shift FROM done"""


# M6 datum transform over the 11 published las2csrs vectors
# (reference tests/_test_las2csrs.py:31-45): the oracle pins the
# engine's outputs at 3 decimals — each axis verified within 0.52 mm
# of the published values in tests/test_datum.py.
SQL_DATUM_VECTORS = """
SELECT * FROM (VALUES
  (0, 470000.8, 6519999.074, 200.431),
  (1, 211705.329, 5617008.261, 53.248),
  (2, 467474.288, 6430441.27, 981.517),
  (3, 470000.804, 6519999.017, 200.416),
  (4, 211705.32, 5617008.252, 53.211),
  (5, 467474.308, 6430441.257, 981.494),
  (6, 470000.817, 6519999.028, 200.396),
  (7, 211706.414, 5617007.581, 53.196),
  (8, 467474.295, 6430441.268, 981.488),
  (9, 470000.809, 6519999.031, 200.395),
  (10, 211704.274, 5617008.97, 53.005)
) AS t(case_id, x, y, z)"""
