"""The engine's declared relational query surface (SURVEY.md §2B).

Each entry is a single SQL text runnable VERBATIM on both Spark SQL and
the DuckDB oracle over the fixture views — cross-engine portability
rules (explicit ORDER BY with total tie-breaks, NULLS FIRST, explicit
regexp group index, ROUND on double outputs, floor-before-int-cast)
are baked into the texts; see SURVEY.md §2B for the discovery notes.

The queries exercise the relational algebra the reference reduces to
(scan/filter/project/regex/explode/keyed-agg/window/max — SURVEY.md
§2A), widened to the full engine surface: joins (inner/semi/anti),
window functions, rollup, set ops, sessionization, top-k.

``ORACLE_OVERRIDES`` holds DuckDB-dialect twins for queries whose Spark
form is DataFrame code or uses Spark-only functions; for the 16 DQ
texts below no override is needed.
"""

from __future__ import annotations

DECLARED_QUERIES: dict[str, str] = {
    # scan + filter + projection + expression (reference F1-F3/P4 analogue)
    "dq01_filter_project": """
SELECT l_orderkey, l_linenumber, l_quantity * (1 - l_discount) AS net
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_returnflag = 'R'
ORDER BY l_orderkey, l_linenumber LIMIT 100
""",
    # 3-way equi hash join + group-agg
    "dq02_join_agg": """
SELECT n_name, COUNT(*) AS cnt, ROUND(SUM(o_totalprice),2) AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
    # window ranking + top-k per group
    "dq03_window_topk": """
SELECT o_custkey, o_orderkey, rnk
FROM (SELECT o_custkey, o_orderkey,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
WHERE rnk <= 2 ORDER BY o_custkey, rnk, o_orderkey LIMIT 100
""",
    # grouping sets / rollup
    "dq04_rollup": """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
    # regex extraction + cast (reference F4 analogue)
    "dq05_regex_extract": """
SELECT event_id, CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k
FROM events ORDER BY event_id LIMIT 50
""",
    # tumbling-window aggregation, batch-replay form of reference A1
    "dq06_tumbling_agg": """
SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS cnt,
       ROUND(SUM(value),2) AS sv
FROM events GROUP BY 1,2 ORDER BY 1,2
""",
    # set op INTERSECT
    "dq07_intersect": """
SELECT o_custkey FROM orders
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 0
ORDER BY o_custkey LIMIT 20
""",
    # semi join (EXISTS)
    "dq08_semi_join": """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
ORDER BY c_custkey
""",
    # sessionization (gaps-and-islands; batch form of session windows)
    "dq09_sessionization": """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk,
         event_id
  FROM events),
s AS (
  SELECT user_id, ts,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
  FROM g)
SELECT user_id, sess, COUNT(*) AS n
FROM s GROUP BY user_id, sess ORDER BY user_id, sess LIMIT 100
""",
    # exact dedup / distinct counting (LLM-pipeline op)
    "dq10_exact_dedup_counts": """
SELECT lang, source, COUNT(*) AS n, COUNT(DISTINCT text) AS distinct_texts
FROM documents GROUP BY lang, source ORDER BY lang, source LIMIT 50
""",
    # anti join (NOT EXISTS)
    "dq11_anti_join": """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
ORDER BY c_custkey LIMIT 100
""",
    # sort + limit (global top-k)
    "dq12_global_topk": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
    # UNION ALL + EXCEPT
    "dq13_union_except": """
SELECT n_regionkey AS k FROM nation
UNION ALL
SELECT r_regionkey FROM region
EXCEPT SELECT 99
ORDER BY k LIMIT 50
""",
    # scalar string/math functions (reference P4/P6 analogues)
    "dq14_scalar_functions": """
SELECT event_id,
       concat(event_type, ':', CAST(CAST(floor(value) AS INT) AS STRING)) AS tag,
       ROUND(abs(value - 50.0),2) AS av
FROM events ORDER BY event_id LIMIT 50
""",
    # conditional aggregation (reference P5 counter/gauge defaults)
    "dq15_conditional_agg": """
SELECT event_type,
       ROUND(SUM(CASE WHEN value IS NULL THEN 1.0 ELSE value END),2) AS counter_sum,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
""",
    # min/max/count time-series profile per key (reference A1/A2 analogue)
    "dq16_minmax_profile": """
SELECT user_id, MAX(ts) AS last_ts, MIN(ts) AS first_ts, COUNT(*) AS n
FROM events GROUP BY user_id ORDER BY user_id
""",
    # full CUBE over two dims
    "dq17_cube": """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
    # string scalar family (1-based substr in both engines)
    "dq18_string_functions": """
SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
       substr(c_name, 3, 8) AS mid, replace(c_name, '0', 'x') AS rep,
       length(c_name) AS len, trim(concat('  ', c_name, ' ')) AS trimmed
FROM customer ORDER BY c_custkey LIMIT 100
""",
    # date/time extraction family (dayofweek excluded: Spark is
    # 1=Sunday, DuckDB 0=Sunday — not verbatim-portable)
    "dq19_date_functions": """
SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
       day(o_orderdate) AS d, quarter(o_orderdate) AS q,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart
FROM orders ORDER BY o_orderkey LIMIT 100
""",
    # correlated scalar subquery
    "dq20_correlated_scalar": """
SELECT c_custkey,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer ORDER BY c_custkey LIMIT 200
""",
    # window frame: bounded ROWS running aggregate. Exact integer
    # arithmetic throughout (r14: the sf0.1 full-surface sweep
    # caught the original ROUND(SUM/AVG(double)) form flipping one
    # runavg cent — DuckDB's segment-tree window accumulation and
    # Spark's running accumulation order double additions
    # differently, and ROUND itself diverges on identical doubles
    # whose shortest decimal print ends in 5: Spark rounds the
    # BigDecimal.valueOf SHORTEST representation, 72.085 -> 72.09,
    # DuckDB the binary value, 72.0849999... -> 72.08). value is
    # exactly 2-decimal (verified: 0 rows where value*100 is >1e-6
    # off an integer), so ROUND(value*100) -> BIGINT cents are EXACT
    # in both engines, and the running average follows the
    # containment_pairs ppm precedent — single IEEE
    # multiply/divide/FLOOR of identical operands, bit-identical
    # cross-engine, no ROUND anywhere after a division. runavg_c4 is
    # the running mean in 1e-4 units of value.
    "dq21_window_frames": """
SELECT event_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS run3_cents,
       CAST(FLOOR(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) * 100 /
           COUNT(*) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS runavg_c4
FROM events ORDER BY event_id LIMIT 200
""",
    # HAVING + count distinct
    "dq22_having": """
SELECT o_custkey, COUNT(*) AS n, COUNT(DISTINCT o_orderstatus) AS statuses
FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5
ORDER BY o_custkey LIMIT 200
""",
    # full outer join of two aggregates
    "dq23_full_outer": """
SELECT COALESCE(a.k, b.k) AS k, a.na, b.nb
FROM (SELECT o_custkey AS k, COUNT(*) AS na FROM orders GROUP BY o_custkey) a
FULL OUTER JOIN
     (SELECT c_custkey AS k, COUNT(*) AS nb FROM customer
      WHERE c_acctbal > 5000 GROUP BY c_custkey) b
  ON a.k = b.k
ORDER BY k LIMIT 200
""",
    # NTILE / PERCENT_RANK / CUME_DIST over a named WINDOW clause.
    "dq24_window_variants": """
SELECT o_orderstatus, o_orderkey,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pr,
       ROUND(CUME_DIST() OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderstatus, o_orderkey LIMIT 200
""",
    # Exact interpolated median per group (string_agg/listagg were
    # tried here and are NOT portable: Spark rejects DuckDB's inline
    # ORDER BY and DuckDB 1.0 lacks WITHIN GROUP listagg).
    "dq25_median": """
SELECT o_orderstatus, ROUND(MEDIAN(o_totalprice), 2) AS med,
       ROUND(MIN(o_totalprice), 2) AS lo, ROUND(MAX(o_totalprice), 2) AS hi,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    # Bag-semantics set op (duplicates preserved).
    "dq26_multiset_ops": """
SELECT o_custkey AS k FROM orders
INTERSECT ALL
SELECT c_custkey FROM customer ORDER BY k LIMIT 100
""",
    # TRY_CAST error-free coercion + NULLIF/COALESCE/GREATEST/LEAST
    # scalar family (reference P4/P5 analogue: typed coercion that
    # quarantines instead of failing).
    "dq27_try_cast": """
SELECT event_id,
       TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k,
       TRY_CAST(event_type AS DOUBLE) AS bad,
       COALESCE(NULLIF(event_type, 'view'), 'other') AS et,
       ROUND(GREATEST(value, 50.0), 2) AS g,
       ROUND(LEAST(value, 50.0), 2) AS l
FROM events ORDER BY event_id LIMIT 100
""",
    # Correlated LATERAL subquery (per-row derived table).
    "dq28_lateral": """
SELECT c.c_custkey, t.total
FROM customer c, LATERAL (SELECT ROUND(SUM(o_totalprice), 2) AS total
                          FROM orders WHERE o_custkey = c.c_custkey) t
WHERE t.total IS NOT NULL ORDER BY c.c_custkey LIMIT 100
""",
    # Recursive CTE (Spark 4.x WITH RECURSIVE) driving a time-series
    # gap-fill: enumerate every day in the events span, LEFT JOIN a
    # sparse per-day aggregate so missing days surface as 0 rows.
    # Recursion steps by DAY (30 iterations over the fixture span) to
    # stay far under Spark's default 100-level recursion limit; the
    # max date rides along in the anchor because the recursive term
    # cannot re-evaluate a subquery each step.
    "dq29_recursive_gapfill": """
WITH RECURSIVE days (d, dmax) AS (
  SELECT CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE) FROM events
  UNION ALL
  SELECT CAST(d + INTERVAL 1 DAY AS DATE), dmax FROM days WHERE d < dmax
)
SELECT d, COALESCE(c.cnt, 0) AS cnt, COALESCE(c.sv, 0.0) AS sv
FROM days LEFT JOIN (
  SELECT CAST(ts AS DATE) AS ed, COUNT(*) AS cnt,
         ROUND(SUM(value), 2) AS sv
  FROM events WHERE event_type = 'purchase' AND value > 99.9
  GROUP BY CAST(ts AS DATE)
) c ON days.d = c.ed
ORDER BY d
""",
    # Explicit GROUPING SETS + GROUPING() disambiguation + FILTER-
    # clause conditional aggregates. GROUPING() is cast to BIGINT:
    # Spark types it TINYINT, DuckDB BIGINT, and the driver's value
    # hash is integer-width-sensitive (the HUGEINT lesson).
    "dq30_grouping_sets_filter": """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
       COUNT(*) AS cnt,
       COUNT(*) FILTER (WHERE o_totalprice > 100000) AS big_cnt,
       ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority LIKE '1%'), 2)
         AS urgent_total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
         o_orderpriority NULLS FIRST
""",
    # Advanced string scalar family: edit distance, field splitting,
    # padding. VARCHAR needs an explicit length for Spark's parser;
    # DuckDB parses and ignores it — the portable spelling.
    "dq31_advanced_strings": """
SELECT c_custkey,
       levenshtein(c_mktsegment, 'BUILDING') AS lev,
       split_part(c_name, '#', 2) AS name_num,
       reverse(c_mktsegment) AS rev,
       left(c_name, 8) AS l8, right(c_name, 3) AS r3,
       lpad(CAST(c_custkey AS VARCHAR(12)), 8, '0') AS padded,
       repeat('ab', 3) AS rep
FROM customer ORDER BY c_custkey LIMIT 150
""",
}

# DuckDB-dialect twins for queries that are NOT verbatim-portable.
# (Queries implemented as DataFrame code register their oracle here too;
# see operators/ modules.)
ORACLE_OVERRIDES: dict[str, str] = {}


def oracle_sql_for(name: str) -> str:
    """DuckDB oracle SQL for a declared query name."""
    return ORACLE_OVERRIDES.get(name, DECLARED_QUERIES[name])


def run_declared(spark, sf_dir: str, name: str):
    """Run one declared query against the fixture tables at ``sf_dir``."""
    from ..session import configure
    from ..sources import register_tables

    configure(spark)
    register_tables(spark, sf_dir)
    return spark.sql(DECLARED_QUERIES[name])
