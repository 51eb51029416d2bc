"""DuckDB oracle SQL for the near-dup dedup family.

- ngram_pairs: exact word-3-gram Jaccard pairs — shingle sets built
  with DuckDB list comprehensions, |A∩B| via a shingle equi-join.
- minhash_dedup: exact-threshold clustering — same pair computation at
  threshold 0.5, then connected components via a recursive min-label
  CTE. The engine's LSH candidates (32 bands x 2 rows) have miss
  probability <= 1e-4 per pair at the threshold, and the exact verify
  removes false positives, so engine == exact clustering on the test
  corpora (empirically checked at sf0.001/0.01).
- simhash_pairs: the engine's FNV-1a word hash and simhash bit
  aggregation restated in SQL (recursive byte-wise FNV over distinct
  words with HUGEINT mod-2^64 arithmetic), pairs by bitwise hamming
  join. Engine banding is pigeonhole-complete, so both sides emit
  exactly the pairs with hamming <= 10.

Word splitting: regexp_split_to_array(trim(text), '\\s+') ==
python str.split() on ASCII corpora (the synthetic documents table is
ASCII; verified).
"""

from __future__ import annotations

# word arrays + distinct word-3-gram shingles per doc. Empty /
# whitespace-only docs are filtered HERE: DuckDB splits '' into ['']
# (one empty-string word) while the engine's str.split() yields no
# words and an EMPTY shingle set — without the filter the SQL side
# fabricates a '' shingle and pairs empty docs the engine never
# candidates (ngram) at jaccard 1.0.
_SHINGLES_BODY = """
w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
      FROM documents WHERE length(trim(text)) > 0),
sh0 AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3
              THEN [array_to_string(ws[i:i+2], ' ') FOR i IN generate_series(1, len(ws) - 2)]
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS sh
  FROM w),
sh AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh0),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
jac AS (
  SELECT i.id_a, i.id_b,
         i.ninter::DOUBLE / (sa.n + sb.n - i.ninter) AS j
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b)
"""

SQL_NGRAM_PAIRS = f"""
WITH {_SHINGLES_BODY}
SELECT id_a, id_b, round(j, 6) AS jaccard FROM jac WHERE j >= 0.3"""


# exact-threshold near-dup clustering: CC over jaccard >= 0.5 pairs,
# cluster = min doc id in the component (the same label min-label
# propagation converges to)
SQL_MINHASH_DEDUP = f"""
WITH RECURSIVE {_SHINGLES_BODY},
-- empty docs have EMPTY shingle sets: the engine's 0/0 := 1.0 Jaccard
-- convention (and its exact-clone collapse) clusters them together,
-- so the oracle adds those pairs explicitly
empties AS (SELECT doc_id FROM documents WHERE length(trim(text)) = 0),
p AS (SELECT id_a, id_b FROM jac WHERE j >= 0.5
      UNION ALL
      SELECT a.doc_id, b.doc_id FROM empties a JOIN empties b
      ON a.doc_id < b.doc_id),
e AS (SELECT id_a AS src, id_b AS dst FROM p
      UNION ALL SELECT id_b, id_a FROM p),
nodes AS (SELECT DISTINCT src AS node FROM e),
reach AS (
  SELECT node, node AS lbl FROM nodes
  UNION
  SELECT e.src, r.lbl FROM reach r JOIN e ON e.dst = r.node
  WHERE r.lbl < e.src),
comp AS (SELECT node, min(lbl) AS rep FROM reach GROUP BY node)
SELECT node::BIGINT AS doc_id, rep::BIGINT AS cluster FROM comp"""


# ---------------------------------------------------------------------------
# simhash: FNV-1a (seed 0) per distinct word via a recursive CTE with
# HUGEINT mod-2^64 arithmetic (xor emulated on the low byte), then
# per-doc per-bit +-1 sums over word OCCURRENCES, bit = (sum > 0),
# pairwise hamming via a per-bit join.

_FNV_OFFSET = "14695981039346656037"
_FNV_PRIME = "1099511628211"
_MOD64 = "18446744073709551616"

SQL_SIMHASH_PAIRS = f"""
WITH RECURSIVE
occ AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0),
wd AS (SELECT DISTINCT w FROM occ),
fnv(w, i, h) AS (
  SELECT w, 0, {_FNV_OFFSET}::HUGEINT FROM wd
  UNION ALL
  SELECT w, i + 1,
         ((h - (h % 256) + xor((h % 256)::BIGINT, ord(substr(w, i + 1, 1)))::HUGEINT)
          * {_FNV_PRIME}) % {_MOD64}::HUGEINT
  FROM fnv WHERE i < length(w)),
wh AS (SELECT w, h FROM fnv WHERE i = length(w)),
bits AS (
  SELECT o.doc_id, b.b,
         CASE WHEN sum(CASE WHEN (wh.h // power(2, b.b)::HUGEINT) % 2 = 1
                            THEN 1 ELSE -1 END) > 0
              THEN 1 ELSE 0 END AS bit
  FROM occ o JOIN wh ON wh.w = o.w
  CROSS JOIN generate_series(0, 63) b(b)
  GROUP BY o.doc_id, b.b
  UNION ALL
  -- wordless docs: the engine's simhash is 0 (all per-bit sums are
  -- 0, bit = sum > 0 = false), so they pair with each other at
  -- hamming 0 and with any doc of popcount <= 10
  SELECT d.doc_id, b.b, 0 AS bit
  FROM documents d CROSS JOIN generate_series(0, 63) b(b)
  WHERE length(trim(d.text)) = 0),
hp AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
  FROM bits a JOIN bits b ON a.b = b.b AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, hamming::BIGINT AS hamming FROM hp WHERE hamming <= 10"""
