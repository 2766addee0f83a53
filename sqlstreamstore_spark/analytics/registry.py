"""Analytics entries for the driver's correctness gate.

Every oracle is ANSI SQL DuckDB runs over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings). Aliases match the Spark side exactly; money math follows
the decimal-exact strategy (see tpch.py docstring); ratio/score columns
are double(int)/double(int) or sequential-fold doubles, identical in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlstreamstore_spark.analytics import (
    asof,
    dedup,
    evaluation,
    events,
    multimodal,
    pipeline,
    quality,
    relational,
    sampling,
    similarity,
    text,
    tpch,
)
from sqlstreamstore_spark.sources.tables import load_table


def _round_cols(df: DataFrame, cols: tuple[str, ...], scale: int = 9) -> DataFrame:
    """Gate-side rounding for float columns whose last bit can diverge
    between engines (libm ln(), partial-sum order). Applied in the gate
    wrapper only — the operator itself stays full precision. The oracle
    SQL applies the identical round() so the driver hash compares
    like-for-like (the stats_corr_regr pattern)."""
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), scale))
    return df


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


_RUN_SCRATCH: list[str] = []


def _scratch(*parts: str) -> str:
    """Per-process scratch root for materialized gate artifacts —
    indexes, bucketed tables, z-ordered layouts (ADVICE r8 #5): the old
    fixed world-readable gettempdir() paths keyed only by md5(sf) let
    concurrent or successive driver runs overwrite a parquet layout
    another session was reading, or inherit a stale index left by a
    prior process with different fixture data. mkdtemp() is owned by
    THIS process, so the process-local build caches that guard each
    materialization are now actually sufficient."""
    import os
    import tempfile

    if not _RUN_SCRATCH:
        _RUN_SCRATCH.append(tempfile.mkdtemp(prefix="sss-gates-"))
    return os.path.join(_RUN_SCRATCH[0], *parts)


# -------------------------------------------------------------- TPC-H

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

_Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

_Q6_SQL = """
SELECT coalesce(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 0.0) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN CAST(0.03 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
  AND l_quantity < 24.0
"""

_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

_Q4_SEMI_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45.0)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""

_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(date_part('year', l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

_Q8_SQL = """
SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CASE WHEN n1.n_name = 'NATION_1'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS mkt_share
FROM lineitem JOIN part     ON l_partkey = p_partkey
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              JOIN region   ON n2.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
"""

_Q14_SQL = """
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""

_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""

_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > CAST(300.0 AS DECIMAL(12,2)))
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""

_Q9_SQL = """
SELECT n_name AS nation, CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_profit
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""

_Q13_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

_Q17_SQL = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
),
th AS (
  SELECT l_partkey AS t_partkey,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS qty_threshold
  FROM li GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM li JOIN th ON l_partkey = t_partkey
WHERE l_quantity < qty_threshold
"""

_Q19_SQL = """
SELECT CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 0) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""

_TOPK_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t
WHERE rk <= 3
ORDER BY o_custkey, rk
"""

# -------------------------------------------------------------- events

_ASOF_SQL = """
WITH order_days AS (
  SELECT o_custkey, o_orderdate,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS day_total
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts,
       od.o_orderdate AS last_order_date, od.day_total
FROM events e
ASOF LEFT JOIN order_days od
  ON e.user_id = od.o_custkey AND od.o_orderdate <= e.ts
ORDER BY e.event_id
"""

_COHORT_SQL = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events)
SELECT cohort_week,
       CAST((epoch(active_week) - epoch(cohort_week)) / 604800 AS INTEGER) AS weeks_since,
       count(*) AS n_active_users
FROM activity JOIN first_seen USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, weeks_since
"""

_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                 AND t_click > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
       CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                 AND t_click > t_signup AND t_purchase IS NOT NULL
                 AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click_purchase
FROM per_user
"""

_HOURLY_WINDOWS_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""

_SESSIONS_SQL = """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events)
SELECT user_id,
       CAST(sum(is_new) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id ORDER BY user_id
"""

_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events),
counts AS (
  SELECT prev_type, next_type, count(*) AS n
  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 6) AS share
FROM counts ORDER BY prev_type, next_type
"""

_EVENTS_DAY_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('day', ts), event_type
ORDER BY day, event_type
"""

# -------------------------------------------------------------- text

_STOP_SQL = "('the','a','and','of','to','in','is','for','on','with')"

_TOKEN_STATS_SQL = """
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_computed,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens
FROM documents ORDER BY doc_id
"""

_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(len(w) AS INTEGER) AS n_tokens,
       CAST(len(list_filter(w, x -> x IN {_STOP_SQL})) AS INTEGER) AS n_stopwords,
       CAST(len(list_filter(w, x -> x IN {_STOP_SQL})) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS stopword_ratio,
       CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS distinct_ratio
FROM t ORDER BY doc_id
"""

_LANGID_SQL = f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
     s AS (SELECT doc_id, lang,
                  CAST(len(list_filter(w, x -> x IN {_STOP_SQL})) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS en_score
           FROM t)
SELECT doc_id, lang, en_score,
       CASE WHEN en_score >= 0.15 THEN 'en' ELSE 'other' END AS pred_lang
FROM s ORDER BY doc_id
"""

_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS fingerprint
FROM documents ORDER BY doc_id
"""

# -------------------------------------------------------------- dedup

_EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_dups
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
LIMIT 500
"""

_NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 300
),
sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3
),
-- hot-shingle df cap, auto-derived engine-side as max(64, ceil(sqrt(N)))
-- = 64 for the 300-doc slice (a no-op on this closed-vocabulary
-- fixture, max df 9; pinned by tests/test_dedup.py)
sh AS (
  SELECT sh0.doc_id, sh0.s FROM sh0
  JOIN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 64) rare USING (s)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_inter,
       sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
FROM inter JOIN sizes sa ON inter.doc_a = sa.doc_id
           JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2
ORDER BY doc_a, doc_b
"""

_CLEAN_CORPUS_SQL = """
WITH q AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
),
quality AS (
  SELECT doc_id, text, w FROM q
  WHERE len(w) >= 5
    AND CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 0.3
),
exact_keepers AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, w,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality) t
  WHERE rn = 1
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM exact_keepers WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
losers AS (
  SELECT DISTINCT doc_b AS doc_id FROM inter
  JOIN sizes sa ON inter.doc_a = sa.doc_id
  JOIN sizes sb ON inter.doc_b = sb.doc_id
  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5
)
SELECT doc_id FROM exact_keepers
WHERE doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY doc_id
"""

# SIF twin: floor-scaled integer weights shared with the Spark side;
# exact BIGINT accumulation, one divide per cell
_SIF_FEATURES_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
),
tk AS (SELECT doc_id, t FROM toks WHERE t <> ''),
freq AS (SELECT t, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY t),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tk),
w AS (
  SELECT t,
         CAST(floor(1000000.0e0 * 0.001e0
                    / (0.001e0 + CAST(tf AS DOUBLE) / CAST(total AS DOUBLE)))
              AS BIGINT) AS ws
  FROM freq, tot
),
feats AS (
  SELECT tk.doc_id,
         ((instr('0123456789abcdef', substring(md5(tk.t), 1, 1)) - 1) * 16
          + (instr('0123456789abcdef', substring(md5(tk.t), 2, 1)) - 1)) % 64
           AS bucket,
         (CASE WHEN instr('0123456789abcdef', substring(md5(tk.t), 3, 1)) - 1 < 8
               THEN 1 ELSE -1 END) * w.ws AS c
  FROM tk JOIN w ON w.t = tk.t
)
SELECT doc_id, CAST(bucket AS INT) AS bucket,
       CAST(sum(c) AS DOUBLE) / 1000000.0e0 AS weight
FROM feats GROUP BY doc_id, bucket ORDER BY doc_id, bucket
"""

# curation accounting: per-source retention through clean_corpus —
# the survivor set is the SAME clean chain (nested CTE), counts exact
_RETENTION_SQL = f"""
WITH surv AS ({_CLEAN_CORPUS_SQL}),
raw AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_raw,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_raw
  FROM documents GROUP BY source),
kept AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_kept
  FROM documents JOIN surv USING (doc_id) GROUP BY source)
SELECT raw.source AS source, n_raw,
       COALESCE(n_kept, 0) AS n_kept,
       tokens_raw,
       COALESCE(tokens_kept, 0) AS tokens_kept,
       CAST(COALESCE(n_kept, 0) AS DOUBLE) / CAST(n_raw AS DOUBLE)
         AS doc_retention,
       CAST(COALESCE(tokens_kept, 0) AS DOUBLE) / CAST(tokens_raw AS DOUBLE)
         AS token_retention
FROM raw LEFT JOIN kept ON kept.source = raw.source
ORDER BY source
"""


# hex→int in DuckDB (no from_hex→int cast): fold the 4 hex chars.
def _hexbucket_sql(expr: str) -> str:
    """DuckDB twin of sampling._hash_bucket (md5 -> first 4 hex ->
    int) for an arbitrary key expression."""
    return f"""list_reduce(list_prepend(CAST(0 AS BIGINT),
  list_transform(string_split(substr(md5(CAST({expr} AS VARCHAR)), 1, 4), ''),
    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
  (a, x) -> a * 16 + x)"""


_HEXBUCKET = _hexbucket_sql("doc_id")

_SAMPLE_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE {_HEXBUCKET} % 65536 < CAST(0.25 * 65536 AS INTEGER)
ORDER BY doc_id
"""

_SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN {_HEXBUCKET} % 65536 < CAST(0.9 * 65536 AS INTEGER)
            THEN 'train' ELSE 'val' END AS split
FROM documents ORDER BY doc_id
"""

_EXACT_KEEPERS_SQL = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents) t
WHERE rn = 1 ORDER BY doc_id
"""

_CC_SQL = """
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 300
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON inter.doc_a = sa.doc_id
  JOIN sizes sb ON inter.doc_b = sb.doc_id
  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach AS (
  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
)
SELECT u AS doc_id, min(r) AS comp FROM reach GROUP BY u ORDER BY doc_id
"""

# -------------------------------------------------------------- similarity

_SIM_TOPK_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       list_dot_product(CAST(embedding AS DOUBLE[]), q.qv)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
FROM embeddings, q
ORDER BY cosine DESC, vec_id
LIMIT 10
"""

_KNN_JOIN_SQL = """
WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT qs.qid, e.vec_id AS cid,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), qs.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(qs.qv, qs.qv))) AS cosine
  FROM embeddings e, qs WHERE e.vec_id <> qs.qid
)
SELECT qid, cid, cosine, rk FROM (
  SELECT qid, cid, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
  FROM scored) t
WHERE rk <= 5
ORDER BY qid, rk
"""


def _knn_descent_sql(k: int = 5, seed_a: int = 42, seed_b: int = 7) -> str:
    """DuckDB twin of the two-table knn_graph_lsh seed →
    knn_descent_step: per-table same-bucket top-k, edge union
    (distinct), symmetrize, 2-hop candidate expansion, exact-cosine
    rescore, per-vertex top-k. TWO hash tables matter: a single
    table's bucket top-k is CLOSED under 2-hop expansion (all
    candidates stay in the bucket), so descent would be a fixed
    point; cross-table hops are what discover new neighbors (measured
    0.24 -> 0.48 recall@5 in one step at sf0.001). Cosine expression
    order mirrors the Spark side (dot(c,q) / (norm_c * norm_q));
    unrounded doubles ride the hash (the sim_knn_join precedent)."""
    cos_ab = (
        "list_dot_product(b.v, a.v) / (sqrt(list_dot_product(b.v, b.v))"
        " * sqrt(list_dot_product(a.v, a.v)))"
    )
    cos_qc = (
        "list_dot_product(ec.v, eq.v) / (sqrt(list_dot_product(ec.v, ec.v))"
        " * sqrt(list_dot_product(eq.v, eq.v)))"
    )

    def table(name: str, seed: int) -> str:
        return f"""
{name}_sigs AS MATERIALIZED (
  SELECT vec_id, v, {_lsh_bucket_sql("v", seed=seed)} AS bucket FROM e),
{name} AS MATERIALIZED (
  SELECT qid, cid FROM (
    SELECT a.vec_id AS qid, b.vec_id AS cid,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {cos_ab} DESC, b.vec_id) AS rk
    FROM {name}_sigs a JOIN {name}_sigs b
      ON a.bucket = b.bucket AND a.vec_id <> b.vec_id) t
  WHERE rk <= {k})"""

    return f"""
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
{table("ga", seed_a)},
{table("gb", seed_b)},
g0 AS MATERIALIZED (
  SELECT DISTINCT qid, cid FROM (
    SELECT qid, cid FROM ga UNION ALL SELECT qid, cid FROM gb) u),
sym AS MATERIALIZED (
  SELECT qid, cid FROM g0 UNION ALL SELECT cid AS qid, qid AS cid FROM g0),
cand AS MATERIALIZED (
  SELECT DISTINCT qid, cid FROM (
    SELECT qid, cid FROM sym
    UNION ALL
    SELECT g1.qid AS qid, g2.cid AS cid
    FROM sym g1 JOIN sym g2 ON g1.cid = g2.qid) u
  WHERE qid <> cid),
scored AS (
  SELECT cand.qid, cand.cid, {cos_qc} AS cosine
  FROM cand JOIN e eq ON eq.vec_id = cand.qid
            JOIN e ec ON ec.vec_id = cand.cid)
SELECT qid, cid, cosine, rk FROM (
  SELECT qid, cid, cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, cid) AS rk
  FROM scored) t
WHERE rk <= {k} ORDER BY qid, rk
"""


_BIGRAM_LOGPROB_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS token FROM toks),
v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS vocab FROM tok),
bgf AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i])) AS prev,
         unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS cur
  FROM toks WHERE len(w) >= 2),
cbg AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
        FROM bgf GROUP BY prev, cur),
cctx AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp FROM cbg GROUP BY prev),
per AS (SELECT doc_id, prev, cur, CAST(count(*) AS BIGINT) AS m
        FROM bgf GROUP BY doc_id, prev, cur),
terms AS (
  SELECT per.doc_id,
         list_sort(list({'cb': cb, 'cp': cp, 'm': m})) AS ts,
         CAST(sum(m) AS BIGINT) AS n_bigrams
  FROM per JOIN cbg USING (prev, cur) JOIN cctx USING (prev)
  GROUP BY per.doc_id),
folded AS (
  SELECT doc_id, n_bigrams,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(ts,
               t -> CAST(t.m AS DOUBLE)
                    * (ln(CAST(t.cb AS DOUBLE) + 1.0)
                       - ln(CAST(t.cp + vocab AS DOUBLE))))),
           (a, x) -> a + x) AS s
  FROM terms, v)
SELECT doc_id, n_bigrams,
       round(s / CAST(n_bigrams AS DOUBLE), 7) AS avg_logprob,
       round(exp(-(s / CAST(n_bigrams AS DOUBLE))), 4) AS ppl_proxy
FROM folded ORDER BY doc_id
"""

# Interpolated Kneser-Ney (r12): same fold discipline as
# _BIGRAM_LOGPROB_SQL; struct key order cb,cp,n1p,n1f,m matches the
# Spark array_sort; D = 0.75 is exactly representable so the IEEE
# expression tree hash-matches.
_KNESER_NEY_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bgf AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i])) AS prev,
         unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS cur
  FROM toks WHERE len(w) >= 2),
cbg AS MATERIALIZED (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
        FROM bgf GROUP BY prev, cur),
cctx AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp,
                CAST(count(*) AS BIGINT) AS n1p
         FROM cbg GROUP BY prev),
cont AS (SELECT cur, CAST(count(*) AS BIGINT) AS n1f FROM cbg GROUP BY cur),
nb AS (SELECT CAST(count(*) AS BIGINT) AS nbt FROM cbg),
per AS (SELECT doc_id, prev, cur, CAST(count(*) AS BIGINT) AS m
        FROM bgf GROUP BY doc_id, prev, cur),
terms AS (
  SELECT per.doc_id,
         list_sort(list({'cb': cb, 'cp': cp, 'n1p': n1p, 'n1f': n1f, 'm': m})) AS ts,
         CAST(sum(m) AS BIGINT) AS n_bigrams
  FROM per JOIN cbg USING (prev, cur) JOIN cctx USING (prev)
           JOIN cont USING (cur)
  GROUP BY per.doc_id),
folded AS (
  SELECT doc_id, n_bigrams,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(ts,
               t -> CAST(t.m AS DOUBLE)
                    * ln(greatest(CAST(t.cb AS DOUBLE) - 0.75, 0.0)
                           / CAST(t.cp AS DOUBLE)
                         + ((0.75 * CAST(t.n1p AS DOUBLE))
                            / CAST(t.cp AS DOUBLE))
                           * (CAST(t.n1f AS DOUBLE) / CAST(nbt AS DOUBLE))))),
           (a, x) -> a + x) AS s
  FROM terms, nb)
SELECT doc_id, n_bigrams,
       round(s / CAST(n_bigrams AS DOUBLE), 7) AS avg_logprob,
       round(exp(-(s / CAST(n_bigrams AS DOUBLE))), 4) AS ppl_proxy
FROM folded ORDER BY doc_id
"""

_BM25_SQL = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE text IS NOT NULL),
lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS len_d FROM base),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len_d) AS BIGINT) AS total_len FROM lens),
tok AS (SELECT doc_id, unnest(w) AS t FROM base),
tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok
       WHERE t IN ('spark', 'table', 'merge') GROUP BY doc_id, t),
dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
terms AS (
  SELECT tf.doc_id,
         list_sort(list({'df': df, 'tf': tf})) AS ts,
         CAST(count(*) AS BIGINT) AS n_terms_matched
  FROM tf JOIN dfreq USING (t) GROUP BY tf.doc_id),
folded AS (
  SELECT terms.doc_id, n_terms_matched,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(ts, x ->
             ln(1.0 + ((CAST(n_docs AS DOUBLE) - CAST(x.df AS DOUBLE) + 0.5)
                       / (CAST(x.df AS DOUBLE) + 0.5)))
             * (CAST(x.tf AS DOUBLE) * 2.2)
             / (CAST(x.tf AS DOUBLE)
                + 1.2 * (1.0 - 0.75 + 0.75 * CAST(len_d AS DOUBLE)
                          / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
           (a, x) -> a + x) AS s
  FROM terms JOIN lens ON terms.doc_id = lens.doc_id CROSS JOIN stats)
SELECT doc_id, n_terms_matched, round(s, 6) AS bm25
FROM folded ORDER BY doc_id
"""

_CONTAINMENT_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) >= 3),
sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM toks),
-- auto df cap max(64, ceil(sqrt(500))) = 64 — no-op on the fixture
-- (max df 8 at sf0.01), pinned by tests/test_dedup.py
sh AS (
  SELECT sh0.doc_id, sh0.s FROM sh0
  JOIN (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 64) rare USING (s)
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
          FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY doc_sub, doc_sup)
SELECT doc_sub, doc_sup, n_inter, n_sh AS n_sub,
       CAST(n_inter AS DOUBLE) / CAST(n_sh AS DOUBLE) AS containment
FROM inter JOIN sizes ON inter.doc_sub = sizes.doc_id
WHERE CAST(n_inter AS DOUBLE) / CAST(n_sh AS DOUBLE) >= 0.5
ORDER BY doc_sub, doc_sup
"""

_QNORM_SQL = """
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score
  FROM documents WHERE text IS NOT NULL
),
ranked AS (
  SELECT doc_id, source, score,
         row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS r,
         count(*) OVER (PARTITION BY source) AS ns,
         count(*) OVER () AS npool
  FROM scored),
q AS (
  SELECT doc_id, source, score,
         CAST(ceil(((CAST(r AS DOUBLE) - 0.5) / CAST(ns AS DOUBLE))
                   * CAST(npool AS DOUBLE)) AS BIGINT) AS k
  FROM ranked),
pv AS (SELECT score AS v, CAST(count(*) AS BIGINT) AS c
       FROM scored GROUP BY score),
cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cum
        FROM pv)
SELECT q.doc_id, q.source, q.score,
       (SELECT min(v) FROM cum WHERE cum.cum >= q.k) AS calibrated
FROM q ORDER BY q.doc_id
"""

_COLLOCATIONS_SQL = """
WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) >= 2),
bgf AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS prev,
         unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS cur
  FROM toks),
cbg AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
        FROM bgf GROUP BY prev, cur),
cs AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cstart FROM cbg GROUP BY prev),
ce AS (SELECT cur, CAST(sum(cb) AS BIGINT) AS cend FROM cbg GROUP BY cur),
nb AS (SELECT CAST(sum(cb) AS BIGINT) AS n_bigrams FROM cbg),
scored AS (
  SELECT prev, cur, cb,
         CAST(cb * n_bigrams AS DOUBLE) / CAST(cstart * cend AS DOUBLE) AS lift
  FROM cbg JOIN cs USING (prev) JOIN ce USING (cur) CROSS JOIN nb
  WHERE cb >= 5)
SELECT prev, cur, cb, round(lift, 9) AS lift, round(ln(lift), 7) AS pmi
FROM scored
ORDER BY lift DESC, prev, cur
LIMIT 30
"""

_SLIDING_1H_SQL = """
WITH base AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE ts IS NOT NULL
)
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_window,
       CAST(sum(v) OVER w AS DOUBLE) AS sum_window
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

_QUALITY_GATE_SQL = """
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score
  FROM documents WHERE text IS NOT NULL
),
counts AS (SELECT source, CAST(count(*) AS BIGINT) AS cnt
           FROM scored GROUP BY source),
ranked AS (SELECT source, score,
                  row_number() OVER (PARTITION BY source ORDER BY score) AS rn
           FROM scored),
thr AS (SELECT ranked.source AS source, score AS threshold
        FROM ranked JOIN counts ON ranked.source = counts.source
        WHERE rn = CAST(ceil(0.5 * cnt) AS BIGINT))
SELECT s.doc_id, s.source, s.score, t.threshold
FROM scored s JOIN thr t ON s.source = t.source
WHERE s.score >= t.threshold
ORDER BY s.doc_id
"""

_HARD_NEG_SQL = """
WITH qs AS (
  SELECT vec_id AS qid, label AS qlabel, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT qs.qid, qs.qlabel, e.vec_id AS cid, e.label AS clabel,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), qs.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(qs.qv, qs.qv))) AS cosine
  FROM embeddings e, qs
),
best AS (
  SELECT qid, max(cosine) AS best_pos FROM scored
  WHERE clabel = qlabel AND cid <> qid GROUP BY qid
),
negs AS (
  SELECT qid, cid, clabel AS neg_label, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
  FROM scored WHERE clabel <> qlabel
)
SELECT negs.qid AS qid, cid, neg_label, cosine, rk,
       best_pos - cosine AS margin
FROM negs JOIN best ON negs.qid = best.qid
WHERE rk <= 5
ORDER BY qid, rk
"""

_LABEL_CENTROIDS_SQL = """
WITH ex0 AS (
  SELECT vec_id, label, unnest(embedding) AS fval,
         unnest(range(1, len(embedding) + 1)) AS pos
  FROM embeddings
),
comp AS (
  SELECT label, pos, avg(CAST(fval AS DOUBLE)) AS cval
  FROM ex0 GROUP BY label, pos
),
cent AS (SELECT label, list(cval ORDER BY pos) AS cvec FROM comp GROUP BY label),
mem AS (
  SELECT e.label, e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(c.cvec, c.cvec))) AS cos,
         sqrt(list_dot_product(c.cvec, c.cvec)) AS cnorm
  FROM embeddings e JOIN cent c ON e.label = c.label
)
SELECT label, count(*) AS n_vecs,
       round(any_value(cnorm), 9) AS centroid_norm,
       round(avg(cos), 9) AS mean_cos_to_centroid,
       round(min(cos), 9) AS min_cos_to_centroid
FROM mem GROUP BY label ORDER BY label
"""


# One Lloyd iteration replay: same literal seeds (vec_id < 8), same
# (|e|^2 - 2e.c) + |c|^2 fold order (bit-identical d2 => identical
# argmin), partial-sum floats round(9) on both engines.
# centroid-drift twin: per-(label, side) dim averages, bounded
# reassembly, round(9) on the float averages (label_centroids rule)
_CENTROID_DRIFT_SQL = """
WITH ex0 AS (
  SELECT label, vec_id % 2 AS side, unnest(embedding) AS fval,
         unnest(range(1, len(embedding) + 1)) AS pos
  FROM embeddings
),
comp AS (
  SELECT label, side, pos, avg(CAST(fval AS DOUBLE)) AS cval,
         CAST(count(*) AS BIGINT) AS n
  FROM ex0 GROUP BY label, side, pos
),
cent AS (
  SELECT label, side, list(cval ORDER BY pos) AS cvec,
         CAST(max(n) AS BIGINT) AS n_vecs
  FROM comp GROUP BY label, side
),
j AS (
  SELECT a.label, a.n_vecs AS n_a, b.n_vecs AS n_b,
         a.cvec AS ca, b.cvec AS cb
  FROM cent a JOIN cent b ON a.label = b.label
  WHERE a.side = 0 AND b.side = 1
)
SELECT label, n_a, n_b,
       round(list_dot_product(ca, cb)
             / (sqrt(list_dot_product(ca, ca))
                * sqrt(list_dot_product(cb, cb))), 9) AS centroid_cos,
       round(sqrt(list_dot_product(ca, ca)), 9) AS norm_a,
       round(sqrt(list_dot_product(cb, cb)), 9) AS norm_b,
       round(sqrt(list_dot_product(cb, cb))
             / sqrt(list_dot_product(ca, ca)), 9) AS norm_ratio
FROM j ORDER BY label
"""

_KMEANS_STEP_SQL = """
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id < 8
),
s AS (
  SELECT e.vec_id, c.cid,
         (list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
          - 2.0 * list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec))
         + list_dot_product(c.cvec, c.cvec) AS d2
  FROM embeddings e, c
),
a AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT vec_id, cid, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
    FROM s) t
  WHERE rk = 1
),
stats AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         round(avg(d2), 9) AS avg_d2
  FROM a GROUP BY cid
),
mem AS (
  SELECT a.cid, unnest(CAST(e.embedding AS DOUBLE[])) AS fval,
         unnest(range(1, len(e.embedding) + 1)) AS pos
  FROM a JOIN embeddings e USING (vec_id)
),
comp AS (SELECT cid, pos, avg(fval) AS cval FROM mem GROUP BY cid, pos),
cent AS (SELECT cid, list(cval ORDER BY pos) AS cvec FROM comp GROUP BY cid)
SELECT stats.cid, n_members, avg_d2,
       round(sqrt(list_dot_product(cent.cvec, cent.cvec)), 9) AS new_norm
FROM stats JOIN cent ON stats.cid = cent.cid
ORDER BY stats.cid
"""


# ---------------------------------------------------- relational extras

_UNPIVOT_SQL = """
WITH wide AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
         CAST(length(text) AS BIGINT) AS n_chars_computed
  FROM documents
)
SELECT doc_id, metric, value FROM (
  SELECT doc_id, 'n_tokens' AS metric, n_tokens AS value FROM wide
  UNION ALL
  SELECT doc_id, 'n_distinct_tokens', n_distinct_tokens FROM wide
  UNION ALL
  SELECT doc_id, 'n_chars_computed', n_chars_computed FROM wide) t
ORDER BY doc_id, metric
"""

_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""

_ROLLCALL_SQL = """
SELECT r_name,
       CAST(count(*) AS BIGINT) AS n_nations,
       array_to_string(list_sort(list(n_name)), ',') AS nations_csv
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""

_FULL_OUTER_SQL = """
WITH c AS (SELECT c_nationkey AS ck, count(*) AS n_customers FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS sk, count(*) AS n_rich_suppliers
           FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
SELECT coalesce(ck, sk) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_rich_suppliers, 0) AS n_rich_suppliers,
       (ck IS NOT NULL AND sk IS NOT NULL) AS in_both
FROM c FULL OUTER JOIN s ON ck = sk
ORDER BY nationkey
"""

_DIM_STATS_SQL = """
WITH x AS (
  SELECT CAST(i - 1 AS INTEGER) AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
)
SELECT dim, count(*) AS n, min(val) AS min_val, max(val) AS max_val
FROM x GROUP BY dim ORDER BY dim
"""

_JSON_STATS_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_k
FROM events GROUP BY event_type ORDER BY event_type
"""

_QUANTILES_SQL = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5)  AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

_INTERSECT_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT DISTINCT s_nationkey FROM supplier
ORDER BY nationkey
"""

_EXCEPT_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal > 9000
ORDER BY nationkey
"""

_NO_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""

_PIVOT_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY user_id ORDER BY user_id
"""

_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""

_ABOVE_AVG_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (
  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE)
  FROM orders)
ORDER BY o_orderkey
"""

_STRFUNC_SQL = """
SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 12) AS name12,
       CAST(length(p_type) AS INTEGER) AS type_len,
       p_brand || '/' || p_type AS brand_type
FROM part
WHERE p_type LIKE '%ECO%' OR p_type LIKE '%PROMO%'
ORDER BY p_partkey
"""

_YEARMONTH_SQL = """
SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS y,
       CAST(date_part('month', o_orderdate) AS INTEGER) AS m,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders GROUP BY 1, 2 ORDER BY y, m
"""

_RHASH_SQL = """
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                                list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                   (a, x) -> (a * 31 + x) % 1000000007) AS rhash
FROM documents ORDER BY doc_id
"""

_REGEX_TOKENS_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS INTEGER) AS n_word_tokens,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_number_tokens,
       CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS INTEGER) AS n_symbol_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) + len(regexp_extract_all(text, '[0-9]+'))
            + len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS INTEGER) AS n_tokens_bpeish
FROM documents ORDER BY doc_id
"""

_COS_PAIRS_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           WHERE vec_id < 1000)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
ORDER BY id_a, id_b
"""


def _lsh_bucket_sql(vec: str, bits: int = 4, dim: int = 64, seed: int = 42) -> str:
    """DuckDB twin of similarity.lsh_bucket_signatures: the hyperplanes
    are deterministic driver-side literals (same seed), so the oracle
    computes the identical buckets."""
    from sqlstreamstore_spark.analytics.similarity import _hyperplanes

    planes = _hyperplanes(dim, bits, seed)
    cases = [
        f"(CASE WHEN list_dot_product({vec}, [{', '.join(repr(x) for x in p)}]) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "\n       + ".join(cases)


_COS_PAIRS_LSH_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sigs AS (
  SELECT vec_id, v,
       {_lsh_bucket_sql("v")} AS bucket
  FROM e
)
SELECT id_a, id_b, cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
  FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t
WHERE cosine >= 0.35
ORDER BY id_a, id_b
"""

# multi-probe twin: a pair counts as LSH-found when its buckets are
# within Hamming distance 1 (probing each bucket's 1-bit neighbors —
# the standard recall knob; same one-pass count structure as the
# Spark side's probe_hamming flag)
_EMB_RECALL_MP_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           WHERE vec_id < 1000),
sigs AS (
  SELECT vec_id, v, {_lsh_bucket_sql("v")} AS bucket FROM e
),
pairs AS (
  SELECT CASE WHEN bit_count(xor(a.bucket, b.bucket)) <= 1 THEN 1 ELSE 0 END AS hit
  FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
)
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_lsh,
       CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hit,
       CASE WHEN count(*) = 0 THEN 1.0
            ELSE CAST(coalesce(sum(hit), 0) AS DOUBLE) / count(*) END AS recall
FROM pairs
"""

_KNN_DESCENT_SQL = _knn_descent_sql()


def _knn_descent_query(spark: SparkSession, sf: str) -> DataFrame:
    """Two-table LSH seed graph (single-table bucket top-k is CLOSED
    under 2-hop expansion — descent needs cross-table hops to find
    anything new) → one NN-descent round."""
    emb = _t(spark, sf, "embeddings")
    # r12 wave 9 (guide §4/§2.1): both seeds' buckets in ONE Arrow
    # signature pass, candidates deduped across seeds before the
    # vectors attach, ONE scoring pass — bit-identical edge set to
    # unioning two knn_graph_lsh builds (same folds, same windows).
    # The barrier stays: the descent references the seed graph thrice.
    g0 = similarity.knn_graph_lsh_multi(
        emb, k=5, seeds=(42, 7)
    ).localCheckpoint(eager=False)
    return similarity.knn_descent_step(emb, g0, k=5)

_COS_PAIRS_LSH_MP_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sigs AS (
  SELECT vec_id, v, {_lsh_bucket_sql("v")} AS bucket FROM e
)
SELECT id_a, id_b, cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
  FROM sigs a JOIN sigs b
    ON bit_count(xor(a.bucket, b.bucket)) <= 1 AND a.vec_id < b.vec_id) t
WHERE cosine >= 0.35
ORDER BY id_a, id_b
"""

_EMB_RECALL_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           WHERE vec_id < 1000),
sigs AS (
  SELECT vec_id, v, {_lsh_bucket_sql("v")} AS bucket FROM e
),
exact AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
),
lshp AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
),
hit AS (SELECT e2.id_a FROM exact e2 JOIN lshp ON e2.id_a = lshp.id_a AND e2.id_b = lshp.id_b)
SELECT (SELECT count(*) FROM exact) AS n_exact,
       (SELECT count(*) FROM lshp) AS n_lsh,
       (SELECT count(*) FROM hit) AS n_hit,
       CASE WHEN (SELECT count(*) FROM exact) = 0 THEN 1.0
            ELSE CAST((SELECT count(*) FROM hit) AS DOUBLE)
                   / (SELECT count(*) FROM exact) END AS recall
"""

_EMB_DEDUP_KEEPERS_SQL = f"""
WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sigs AS (
  SELECT vec_id, v,
       {_lsh_bucket_sql("v")} AS bucket
  FROM e
),
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
    FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t
  WHERE cosine >= 0.35
),
edges AS (
  SELECT id_a AS u, id_b AS w FROM pairs
  UNION
  SELECT id_b AS u, id_a AS w FROM pairs
),
reach AS (
  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e2.u, reach.r FROM edges e2 JOIN reach ON e2.w = reach.u
),
comp AS (SELECT u AS vec_id, min(r) AS keeper FROM reach GROUP BY u)
SELECT emb.vec_id,
       CAST(coalesce(comp.keeper, emb.vec_id) AS BIGINT) AS keeper
FROM embeddings emb LEFT JOIN comp ON emb.vec_id = comp.vec_id
ORDER BY emb.vec_id
"""

_SEM_COMPONENTS_INCR_SQL = f"""
WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sigs AS (
  SELECT vec_id, v,
       {_lsh_bucket_sql("v")} AS bucket
  FROM e
),
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
    FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t
  WHERE cosine >= 0.35
),
edges AS (
  SELECT id_a AS u, id_b AS w FROM pairs
  UNION
  SELECT id_b AS u, id_a AS w FROM pairs
),
reach AS (
  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e2.u, reach.r FROM edges e2 JOIN reach ON e2.w = reach.u
),
cmp AS (SELECT u AS vec_id, min(r) AS comp FROM reach GROUP BY u),
lab AS (
  SELECT emb.vec_id, CAST(coalesce(c.comp, emb.vec_id) AS BIGINT) AS comp
  FROM embeddings emb LEFT JOIN cmp c ON emb.vec_id = c.vec_id
)
SELECT vec_id, comp,
       CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS comp_size
FROM lab ORDER BY vec_id
"""

_LSH_BUCKET_INDEX_CACHE: dict[str, bool] = {}


def _lsh_index_for(spark: SparkSession, sf: str) -> str:
    """Materialize (once per process per sf) the corpus LSH bucket
    index over the vec_id%10 != 0 slice at the fixture's bits=4."""
    import hashlib

    path = _scratch("lsh_index_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    if path not in _LSH_BUCKET_INDEX_CACHE:
        corpus = _t(spark, sf, "embeddings").filter(F.col("vec_id") % 10 != 0)
        similarity.build_lsh_bucket_index(corpus, path, bits=4)
        _LSH_BUCKET_INDEX_CACHE[path] = True
    return path


def _sem_components_incremental_query(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental SemDeDup cluster maintenance: the standing corpus's
    component labeling (LSH near-dup graph at bits=4) is EXTENDED with
    the delta's edges — cross pairs from the materialized bucket index
    probe + delta-internal pairs — via dedup.extend_components, which
    relabels only the affected subgraph. The oracle recomputes CC over
    the FULL union graph (the contraction identity makes them equal);
    bucket functions are per-vector, so full-set pairs = corpus pairs
    ∪ cross pairs ∪ delta pairs exactly."""
    from pyspark.sql import Window

    emb = _t(spark, sf, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    path = _lsh_index_for(spark, sf)
    corpus_edges = similarity.cosine_near_dup_pairs_lsh(
        corpus, 0.35, bits=4, sort=False
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    labels = dedup.connected_components(corpus_edges)
    cross = similarity.near_dup_against_lsh_index(
        spark, path, delta, threshold=0.35, bits=4
    ).select(F.col("new_vec").alias("doc_a"), F.col("old_vec").alias("doc_b"))
    dd = similarity.cosine_near_dup_pairs_lsh(
        delta, 0.35, bits=4, sort=False
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    updated = dedup.extend_components(labels, cross.unionByName(dd))
    full = (
        emb.select("vec_id")
        .join(
            updated.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
        )
        .select(
            "vec_id",
            F.coalesce(F.col("comp"), F.col("vec_id")).cast("long").alias("comp"),
        )
    )
    w = Window.partitionBy("comp")
    return (
        full.withColumn("comp_size", F.count("*").over(w).cast("long"))
        .orderBy("vec_id")
    )


_TOPK_LSH_SQL = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT qv, {_lsh_bucket_sql("qv")} AS bucket FROM q),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sigs AS (
  SELECT vec_id, v,
       {_lsh_bucket_sql("v")} AS bucket
  FROM e
)
SELECT vec_id,
       list_dot_product(v, qb.qv)
         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qb.qv, qb.qv))) AS cosine
FROM sigs, qb WHERE sigs.bucket = qb.bucket
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def _ivf_static_sql(k: int = 10, n_clusters: int = 8, n_probe: int = 4) -> str:
    """DuckDB twin of similarity.cosine_topk_ivf_static: the literal
    centroids are the deployed-index model, so probe selection,
    argmax assignment and the exact re-rank are all expressible."""
    from sqlstreamstore_spark.analytics.similarity import _static_centroids

    cent_rows = ",\n    ".join(
        "({cid}, CAST([{vals}] AS DOUBLE[]))".format(
            cid=cid, vals=", ".join(repr(x) for x in vec)
        )
        for cid, vec in _static_centroids(n_clusters=n_clusters)
    )
    return f"""
WITH cent(cid, cv) AS (VALUES
    {cent_rows}
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT cid FROM cent, q
  ORDER BY list_dot_product(cv, qv)
             / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))) DESC,
           cid
  LIMIT {n_probe}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv)
                        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                      c.cid
           ) AS rk
    FROM e, cent c) t
  WHERE rk = 1
)
SELECT vec_id,
       list_dot_product(v, q.qv)
         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
FROM assigned, q
WHERE cid IN (SELECT cid FROM probe)
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


_IVF_STATIC_SQL = _ivf_static_sql()


def _ivf_health_sql(n_clusters: int = 8) -> str:
    """DuckDB twin of similarity.ivf_index_health over a static-centroid
    index: the index holds exactly the argmax assignment of the corpus
    (build == assign by construction), so the oracle recomputes the
    assignment CTE and replays the size/share/Gini integer arithmetic
    and the rounded-9 list-mean cosine (the label_centroids rule)."""
    from sqlstreamstore_spark.analytics.similarity import _static_centroids

    cent_rows = ",\n    ".join(
        "({cid}, CAST([{vals}] AS DOUBLE[]))".format(
            cid=cid, vals=", ".join(repr(x) for x in vec)
        )
        for cid, vec in _static_centroids(n_clusters=n_clusters)
    )
    k = n_clusters
    return f"""
WITH cent(cid, cv) AS (VALUES
    {cent_rows}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv)
                        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                      c.cid
           ) AS rk
    FROM e, cent c) t
  WHERE rk = 1
),
sizes AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs FROM assigned GROUP BY cid),
filled AS (
  SELECT cent.cid, cent.cv, CAST(coalesce(sizes.n_vecs, 0) AS BIGINT) AS n_vecs
  FROM cent LEFT JOIN sizes ON cent.cid = sizes.cid
),
tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS t FROM filled),
ranked AS (
  SELECT cid, cv, n_vecs,
         CAST(row_number() OVER (ORDER BY n_vecs, cid) AS BIGINT) AS rk
  FROM filled
),
gini AS (
  SELECT CAST(2 * sum(rk * n_vecs) AS BIGINT)
         - CAST({k + 1} AS BIGINT) * (SELECT t FROM tot) AS gnum
  FROM ranked
),
mem AS (
  SELECT a.cid, unnest(a.v) AS fval,
         unnest(range(1, len(a.v) + 1)) AS pos
  FROM assigned a
),
comp AS (SELECT cid, pos, avg(CAST(fval AS DOUBLE)) AS cval FROM mem GROUP BY cid, pos),
mvec AS (SELECT cid, list(cval ORDER BY pos) AS mv FROM comp GROUP BY cid)
SELECT r.cid AS list_id, r.n_vecs,
       CAST(r.n_vecs AS DOUBLE) / CAST(tot.t AS DOUBLE) AS size_share,
       CASE WHEN r.n_vecs > 0 THEN
         round(list_dot_product(r.cv, mvec.mv)
               / (sqrt(list_dot_product(r.cv, r.cv)) * sqrt(list_dot_product(mvec.mv, mvec.mv))), 9)
       END AS centroid_cos,
       CAST(gini.gnum AS DOUBLE) / ({float(k)} * CAST(tot.t AS DOUBLE)) AS size_gini
FROM ranked r CROSS JOIN tot CROSS JOIN gini LEFT JOIN mvec ON r.cid = mvec.cid
ORDER BY list_id
"""


_IVF_HEALTH_SQL = _ivf_health_sql()


def _ivf_batch_sql(
    k: int = 5, n_clusters: int = 8, n_probe: int = 4, n_queries: int = 5
) -> str:
    """DuckDB twin of similarity.knn_join_ivf_static: per-query probe
    selection (a window over queries × literal centroids), the same
    argmax assignment as the single-query IVF oracle, candidate join on
    the probed lists, exact cosine re-rank with per-query row_number."""
    from sqlstreamstore_spark.analytics.similarity import _static_centroids

    cent_rows = ",\n    ".join(
        "({cid}, CAST([{vals}] AS DOUBLE[]))".format(
            cid=cid, vals=", ".join(repr(x) for x in vec)
        )
        for cid, vec in _static_centroids(n_clusters=n_clusters)
    )
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
WITH cent(ccid, cv) AS (VALUES
    {cent_rows}
),
q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {n_queries}),
probe AS (
  SELECT qid, ccid FROM (
    SELECT q.qid, c.ccid,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY {cos.format(a="c.cv", b="q.qv")} DESC, c.ccid) AS pr
    FROM q, cent c) t
  WHERE pr <= {n_probe}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assigned AS (
  SELECT vec_id, v, ccid FROM (
    SELECT e.vec_id, e.v, c.ccid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {cos.format(a="e.v", b="c.cv")} DESC, c.ccid) AS rk
    FROM e, cent c) t
  WHERE rk = 1),
cand AS (
  SELECT p.qid, a.vec_id AS cid,
         {cos.format(a="a.v", b="q.qv")} AS cosine
  FROM assigned a
  JOIN probe p ON a.ccid = p.ccid
  JOIN q ON q.qid = p.qid
  WHERE a.vec_id <> p.qid)
SELECT qid, cid, cosine, rk FROM (
  SELECT qid, cid, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
  FROM cand) t
WHERE rk <= {k}
ORDER BY qid, rk
"""


_IVF_BATCH_SQL = _ivf_batch_sql()


def _ivf_incremental_sql(
    threshold: float = 0.35, n_clusters: int = 8, n_probe: int = 4
) -> str:
    """Twin of similarity.near_dup_against_ivf_index on the vec_id%10
    split: queries = incoming slice, assigned corpus = the rest; same
    literal-centroid probe/argmax as the batch oracle, threshold
    filter instead of top-k."""
    from sqlstreamstore_spark.analytics.similarity import _static_centroids

    cent_rows = ",\n    ".join(
        "({cid}, CAST([{vals}] AS DOUBLE[]))".format(
            cid=cid, vals=", ".join(repr(x) for x in vec)
        )
        for cid, vec in _static_centroids(n_clusters=n_clusters)
    )
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
WITH cent(ccid, cv) AS (VALUES
    {cent_rows}
),
q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 10 = 0),
probe AS (
  SELECT qid, ccid FROM (
    SELECT q.qid, c.ccid,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY {cos.format(a="c.cv", b="q.qv")} DESC, c.ccid) AS pr
    FROM q, cent c) t
  WHERE pr <= {n_probe}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id % 10 <> 0),
assigned AS (
  SELECT vec_id, v, ccid FROM (
    SELECT e.vec_id, e.v, c.ccid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {cos.format(a="e.v", b="c.cv")} DESC, c.ccid) AS rk
    FROM e, cent c) t
  WHERE rk = 1)
SELECT DISTINCT p.qid AS new_vec, a.vec_id AS old_vec,
       {cos.format(a="a.v", b="q.qv")} AS cosine
FROM assigned a
JOIN probe p ON a.ccid = p.ccid
JOIN q ON q.qid = p.qid
WHERE a.vec_id <> p.qid
  AND {cos.format(a="a.v", b="q.qv")} >= {threshold}
ORDER BY new_vec, old_vec
"""


_IVF_INCREMENTAL_SQL = _ivf_incremental_sql()

_SEM_INDEX_CACHE: dict[str, list] = {}


def _sem_index_for(spark: SparkSession, sf: str) -> tuple[str, list]:
    """Materialize (once per process per sf) the corpus IVF index over
    the vec_id%10 != 0 slice — shared by the incremental semantic gate
    and the incremental flagship. Returns (path, centroids)."""
    import hashlib

    path = _scratch("sem_index_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    cents = _SEM_INDEX_CACHE.get(path)
    if cents is None:
        corpus = _t(spark, sf, "embeddings").filter(F.col("vec_id") % 10 != 0)
        cents = similarity.build_ivf_index(corpus, path, n_clusters=8)
        _SEM_INDEX_CACHE[path] = cents
    return path, cents


def _sim_embedding_incremental_query(spark: SparkSession, sf: str) -> DataFrame:
    """Deployed incremental semantic dedup: build the corpus IVF index
    once per sf, then probe it with the incoming vec_id%10 slice."""
    emb = _t(spark, sf, "embeddings")
    incoming = emb.filter(F.col("vec_id") % 10 == 0)
    path, cents = _sem_index_for(spark, sf)
    return similarity.near_dup_against_ivf_index(
        spark, path, incoming, threshold=0.35, centroids=cents
    )


def _ivf_filtered_sql(lang: str = "en") -> str:
    """DuckDB twin of similarity.filtered_knn_ivf: the batch oracle
    with its corpus CTE pre-filtered to documents of ``lang`` (the
    semi-join the Spark side expresses with left_semi). Queries stay
    unrestricted — only the CANDIDATE side is constrained."""
    return _ivf_batch_sql().replace(
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings\n"
        f"     WHERE vec_id IN (SELECT doc_id FROM documents WHERE lang = '{lang}')),",
    )


_IVF_FILTERED_SQL = _ivf_filtered_sql()


def _semantic_clusters_sql(
    k: int = 4,
    threshold: float = 0.35,
    n_clusters: int = 8,
    n_probe: int = 4,
) -> str:
    """DuckDB twin of similarity.semantic_clusters: corpus-as-queries
    batched IVF kNN (same probe/assign/top-k blocks as the batch
    oracle), cosine-thresholded edges, recursive-CTE reachability for
    min-label components (the _CC_SQL pattern), singleton fill via LEFT
    JOIN back to the corpus."""
    from sqlstreamstore_spark.analytics.similarity import _static_centroids

    cent_rows = ",\n    ".join(
        "({cid}, CAST([{vals}] AS DOUBLE[]))".format(
            cid=cid, vals=", ".join(repr(x) for x in vec)
        )
        for cid, vec in _static_centroids(n_clusters=n_clusters)
    )
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
WITH RECURSIVE cent(ccid, cv) AS (VALUES
    {cent_rows}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
probe AS (
  SELECT qid, ccid FROM (
    SELECT e.vec_id AS qid, c.ccid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {cos.format(a="c.cv", b="e.vec")} DESC, c.ccid) AS pr
    FROM e, cent c) t
  WHERE pr <= {n_probe}),
assigned AS (
  SELECT vec_id, vec, ccid FROM (
    SELECT e.vec_id, e.vec, c.ccid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {cos.format(a="e.vec", b="c.cv")} DESC, c.ccid) AS rk
    FROM e, cent c) t
  WHERE rk = 1),
scored AS (
  SELECT p.qid, a.vec_id AS cid,
         {cos.format(a="a.vec", b="q.vec")} AS cosine
  FROM assigned a
  JOIN probe p ON a.ccid = p.ccid
  JOIN e q ON q.vec_id = p.qid
  WHERE a.vec_id <> p.qid),
knn AS (
  SELECT qid, cid, cosine FROM (
    SELECT qid, cid, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
    FROM scored) t
  WHERE rk <= {k}),
pairs AS (SELECT qid AS u, cid AS w FROM knn WHERE cosine >= {threshold!r}),
edges AS (SELECT u, w FROM pairs UNION SELECT w AS u, u AS w FROM pairs),
reach AS (
  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT g.u, reach.r FROM edges g JOIN reach ON g.w = reach.u),
lab AS (SELECT u AS vec_id, min(r) AS comp FROM reach GROUP BY u)
SELECT e.vec_id,
       CAST(coalesce(lab.comp, e.vec_id) AS BIGINT) AS comp,
       CAST(count(*) OVER (PARTITION BY coalesce(lab.comp, e.vec_id)) AS BIGINT)
         AS comp_size
FROM e LEFT JOIN lab ON e.vec_id = lab.vec_id
ORDER BY e.vec_id
"""


_SEMANTIC_CLUSTERS_SQL = _semantic_clusters_sql(n_clusters=16)


def _pq_sql_blocks(cbs, sd: int, m: int) -> tuple[str, str, str, str]:
    """The four shared SQL fragments of the PQ twins (dl lists, code
    argmins, ADC dot LUT, ADC norm² LUT) — used by both the flat PQ
    static oracle and the composed IVF-PQ oracle."""

    def lit(vec: list[float]) -> str:
        return "CAST([" + ", ".join(repr(float(x)) for x in vec) + "] AS DOUBLE[])"

    dist_lists = []
    for s in range(m):
        vs = f"v[{s * sd + 1}:{(s + 1) * sd}]"
        terms = ",\n      ".join(
            f"list_dot_product({vs}, {vs}) - 2.0 * list_dot_product({vs}, {lit(cw)})"
            f" + list_dot_product({lit(cw)}, {lit(cw)})"
            for cw in cbs[s]
        )
        dist_lists.append(f"[{terms}] AS dl{s}")
    code_cols = ",\n    ".join(
        f"list_position(dl{s}, list_min(dl{s})) - 1 AS c{s}" for s in range(m)
    )
    lut_dot = " + ".join(
        "["
        + ", ".join(f"list_dot_product(qv[{s * sd + 1}:{(s + 1) * sd}], {lit(cw)})" for cw in cbs[s])
        + f"][c{s} + 1]"
        for s in range(m)
    )
    lut_n2 = " + ".join(
        "["
        + ", ".join(repr(float(sum(x * x for x in cw))) for cw in cbs[s])
        + f"][c{s} + 1]"
        for s in range(m)
    )
    return ",\n    ".join(dist_lists), code_cols, lut_dot, lut_n2


def _pq_static_sql(
    k: int = 10, m: int = 8, n_codes: int = 16, rerank: int = 10,
    dim: int = 64, seed: int = 11,
) -> str:
    """DuckDB twin of similarity.cosine_topk_pq_static. Every float op
    mirrors the Spark side's sequential-fold order: subspace distances
    are x·x − 2·(x·c) + (c·c) with list_dot_product (sequential, same
    as Spark's aggregate fold and Python's sum), so code assignment,
    ADC scores, the candidate cut and the exact re-rank all match
    bit-for-bit."""
    from sqlstreamstore_spark.analytics.similarity import _static_codebooks

    cbs = _static_codebooks(dim=dim, m=m, n_codes=n_codes, seed=seed)
    dls, code_cols, lut_dot, lut_n2 = _pq_sql_blocks(cbs, dim // m, m)
    return f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dists AS (
  SELECT vec_id, v,
    {dls}
  FROM e),
codes AS (
  SELECT vec_id, v,
    {code_cols}
  FROM dists),
approx AS (
  SELECT vec_id, v,
    ({lut_dot})
      / ((CASE WHEN sqrt({lut_n2}) = 0 THEN 1.0 ELSE sqrt({lut_n2}) END)
         * (CASE WHEN sqrt(list_dot_product(qv, qv)) = 0 THEN 1.0
                 ELSE sqrt(list_dot_product(qv, qv)) END)) AS a
  FROM codes, q),
cands AS (SELECT vec_id, v FROM approx ORDER BY a DESC, vec_id LIMIT {rerank * k})
SELECT vec_id,
       list_dot_product(v, q.qv)
         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
FROM cands, q
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


_PQ_STATIC_SQL = _pq_static_sql()


def _ivfpq_static_sql(
    k: int = 10, n_clusters: int = 8, n_probe: int = 4,
    m: int = 8, n_codes: int = 16, rerank: int = 10,
    dim: int = 64, seed: int = 11,
) -> str:
    """DuckDB twin of the COMPOSED deployed index (cosine_topk_ivfpq
    over a static-codebook build): the IVF static oracle's probe
    selection + argmax assignment restricts the corpus to the probed
    lists, the PQ blocks compute codes + ADC over exactly that subset,
    then the candidate cut and exact re-rank. Probing, quantization and
    re-rank all hash-match in one query."""
    from sqlstreamstore_spark.analytics.similarity import (
        _static_centroids,
        _static_codebooks,
    )

    cent_rows = ",\n    ".join(
        "({cid}, CAST([{vals}] AS DOUBLE[]))".format(
            cid=cid, vals=", ".join(repr(x) for x in vec)
        )
        for cid, vec in _static_centroids(n_clusters=n_clusters)
    )
    cbs = _static_codebooks(dim=dim, m=m, n_codes=n_codes, seed=seed)
    dls, code_cols, lut_dot, lut_n2 = _pq_sql_blocks(cbs, dim // m, m)
    return f"""
WITH cent(cid, cv) AS (VALUES
    {cent_rows}
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT cid FROM cent, q
  ORDER BY list_dot_product(cv, qv)
             / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))) DESC,
           cid
  LIMIT {n_probe}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv)
                        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                      c.cid
           ) AS rk
    FROM e, cent c) t
  WHERE rk = 1),
pe AS (SELECT vec_id, v FROM assigned
       WHERE cid IN (SELECT cid FROM probe)),
dists AS (
  SELECT vec_id, v,
    {dls}
  FROM pe),
codes AS (
  SELECT vec_id, v,
    {code_cols}
  FROM dists),
approx AS (
  SELECT vec_id, v,
    ({lut_dot})
      / ((CASE WHEN sqrt({lut_n2}) = 0 THEN 1.0 ELSE sqrt({lut_n2}) END)
         * (CASE WHEN sqrt(list_dot_product(qv, qv)) = 0 THEN 1.0
                 ELSE sqrt(list_dot_product(qv, qv)) END)) AS a
  FROM codes, q),
cands AS (SELECT vec_id, v FROM approx ORDER BY a DESC, vec_id LIMIT {rerank * k})
SELECT vec_id,
       list_dot_product(v, q.qv)
         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
FROM cands, q
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


_IVFPQ_STATIC_SQL = _ivfpq_static_sql()


def _sim_topk_ivfpq_query(spark: SparkSession, sf: str) -> DataFrame:
    """The composed deployed index, driver-oracled end to end: build the
    cluster_id-partitioned IVF-PQ index with the STATIC (shipped)
    centroids AND codebooks, then probe it — partition pruning + ADC
    over the codes column + exact re-rank, all replayed in SQL. (The
    Lloyd-trained-codebook build stays pytest-pinned: training isn't
    SQL, but the deployed read path now has a hash-matched driver
    row.)"""
    import os
    import shutil
    import tempfile

    emb = _t(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    ]
    path = os.path.join(tempfile.mkdtemp(prefix="sss-ivfpq-"), "index")
    cbs = similarity._static_codebooks(dim=64, m=8, n_codes=16, seed=11)
    cents, _ = similarity.build_ivfpq_index(
        emb, path, n_clusters=8, codebooks=cbs
    )
    out = similarity.cosine_topk_ivfpq(
        spark, path, qvec, cents, cbs, k=10, n_probe=4, rerank=10
    )
    rows = out.collect()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def _sim_topk_pq_query(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    ]
    got = similarity.cosine_topk_pq(emb, qvec, k=10).select("vec_id")
    want = similarity.cosine_topk_bruteforce(emb, qvec, k=10).select("vec_id")
    # measured recall 0.6-0.7 across sf0.001/sf0.01 (PQ trades recall
    # for 8x compression); bound 0.4 pins the codebook + ADC pipeline
    # without flaking on quantization noise
    return _ann_recall_report(spark, got, want, k=10, bound=0.4)


def _sim_topk_pq_static_query(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk_pq_static(emb, [float(x) for x in qvec], k=10)


def _bfs_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.graph import bfs_distances

    edges = _coocc_edges(spark, sf).localCheckpoint()
    source = edges.agg(F.min("src")).collect()[0][0]
    return bfs_distances(edges, int(source), max_depth=3)


def _triangles_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.graph import triangle_count

    return triangle_count(_coocc_edges(spark, sf).localCheckpoint(eager=False))


def _label_propagation_query(spark: SparkSession, sf: str) -> DataFrame:
    """min_orders=30: the >=5 graph is a complete clique at gate sf
    (one community after one round — vacuous); >=30 keeps 686 edges /
    100 nodes at sf0.01 and LPA finds 8 communities in 2 rounds."""
    from sqlstreamstore_spark.analytics.graph import label_propagation

    return label_propagation(
        _coocc_edges(spark, sf, min_orders=30).localCheckpoint(eager=False),
        iters=2,
    )


def _k_core_query(spark: SparkSession, sf: str) -> DataFrame:
    """min_orders=30 (the label-propagation graph), k=8, rounds=5:
    at sf0.01 the peel cascades 4 rounds (100 -> 81 nodes, 686 -> 575
    edges) and round 5 confirms the fixpoint; at sf0.001 the >=30
    graph is a K10 clique (all degrees 9 >= 8 — stable, non-empty)."""
    from sqlstreamstore_spark.analytics.graph import k_core

    return k_core(
        _coocc_edges(spark, sf, min_orders=30).localCheckpoint(eager=False),
        k=8,
        rounds=5,
    )


def _k_truss_query(spark: SparkSession, sf: str) -> DataFrame:
    """min_orders=30 (the k-core/LPA graph), k=5, rounds=8: at sf0.01
    the edge peel cascades the full 8 rounds (301 → 142 → 82 → 54 →
    36 → 28 → 26 → 26 edges — fixpoint confirmed in-round); at
    sf0.001 the K10 clique has every edge at support 8 ≥ 3 (stable,
    non-empty)."""
    from sqlstreamstore_spark.analytics.graph import k_truss

    return k_truss(
        _coocc_edges(spark, sf, min_orders=30).localCheckpoint(eager=False),
        k=5,
        rounds=8,
    )


def _link_prediction_query(spark: SparkSession, sf: str) -> DataFrame:
    """min_orders=20 (not the 5 the triangle gates use): at the gate
    sf the co-occurrence graph is a COMPLETE clique at ≥5 — zero
    non-adjacent pairs, a vacuous prediction task; ≥20 keeps 80% of
    edges, leaving real open wedges to score."""
    from sqlstreamstore_spark.analytics.graph import link_prediction_jaccard

    return link_prediction_jaccard(
        _coocc_edges(spark, sf, min_orders=20).localCheckpoint(eager=False)
    )


from sqlstreamstore_spark.analytics.graph import (  # noqa: E402
    LINK_PREDICTION_SQL as _LINK_PREDICTION_SQL,
)


def _doulion_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.graph import triangle_count_doulion

    return triangle_count_doulion(_coocc_edges(spark, sf).localCheckpoint(eager=False), p=0.5)


def _pagerank_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.graph import customer_supplier_edges, pagerank

    edges = customer_supplier_edges(
        _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
    ).localCheckpoint(eager=False)
    return pagerank(edges, iters=3)


def _golden_text_docs(n: int = 240) -> list[tuple[int, str]]:
    """Deterministic synthetic corpus for the golden text oracles
    (round 11, VERDICT r10 #3): DuckDB can run neither zlib nor a BPE
    merge loop, so — exactly like the multimodal golden class — the
    gate input is a corpus both engines can agree on byte-for-byte,
    and the oracle is the stdlib twin's output pinned as VALUES.
    md5-counter word choice from a fixed 32-word vocabulary; every
    4th document is drawn from a 4-word sub-vocabulary (highly
    repetitive → low zlib ratio, high BPE merge coverage), lengths
    sweep 20-199 words. Real-corpus behavior of both operators stays
    pinned by tests/test_text_extras.py + tests/test_bpe.py over the
    documents table."""
    import hashlib

    vocab = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
        "victor", "whiskey", "xray", "yankee", "zulu", "data", "model",
        "token", "batch", "shard", "epoch",
    ]
    docs: list[tuple[int, str]] = []
    for i in range(n):
        length = 20 + (i * 7) % 180
        sub = 4 if i % 4 == 0 else len(vocab)
        words = []
        for j in range(length):
            b = hashlib.md5(f"goldtext:{i}:{j}".encode()).digest()[0]
            words.append(vocab[b % sub])
        docs.append((i, " ".join(words)))
    return docs


def _golden_docs_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _golden_text_docs(), "doc_id long, text string"
    ).repartition(8)


def _bpe_stats_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.bpe import bpe_corpus_stats

    return bpe_corpus_stats(_golden_docs_df(spark), n_merges=60, sample_docs=64)


def _bpe_golden_sql() -> str:
    """Golden-VALUES oracle for text_bpe_stats: the pure-Python BPE
    twin (the SAME functions the executors run via mapInPandas — the
    multimodal golden-snapshot class) over the deterministic corpus."""
    from sqlstreamstore_spark.analytics.bpe import (
        _words,
        bpe_encode_word,
        bpe_train,
    )

    docs = _golden_text_docs()
    sample = [t for _i, t in sorted(docs)[:64]]
    merges = bpe_train(sample, n_merges=60)
    ranks = {pair: i for i, pair in enumerate(merges)}
    rows = []
    cache: dict[str, list[str]] = {}
    for did, text in docs:
        n_words = n_tokens = n_unk = 0
        for w in _words(text):
            toks = cache.get(w)
            if toks is None:
                toks = bpe_encode_word(w, ranks)
                cache[w] = toks
            n_words += 1
            n_tokens += len(toks)
            n_unk += sum(1 for t in toks if len(t) == 1)
        tpw = (n_tokens / n_words) if n_words else 0.0
        rows.append(
            f"({did}, {n_words}, {n_tokens}, {n_unk}, "
            f"CAST('{tpw!r}' AS DOUBLE))"
        )
    return (
        "SELECT * FROM (VALUES\n" + ",\n".join(rows)
        + ") AS t(doc_id, n_words, n_tokens, n_unk_chars, tokens_per_word)"
        + "\nORDER BY doc_id"
    )


def _compression_golden_sql(level: int = 6) -> str:
    """Golden-VALUES oracle for text_compression_signals: stdlib zlib
    over the deterministic corpus (same library, same level as the
    executors' mapInPandas)."""
    import zlib

    rows = []
    for did, text in _golden_text_docs():
        raw = text.encode("utf-8")
        comp = zlib.compress(raw, level)
        ratio = (len(comp) / len(raw)) if raw else 1.0
        rows.append(
            f"({did}, {len(raw)}, {len(comp)}, CAST('{ratio!r}' AS DOUBLE))"
        )
    return (
        "SELECT * FROM (VALUES\n" + ",\n".join(rows)
        + ") AS t(doc_id, n_bytes, n_compressed, compression_ratio)"
        + "\nORDER BY doc_id"
    )


def _multimodal_golden_sqls() -> tuple[str, str, str]:
    """Golden-VALUES oracles for the media pipeline: the synthetic
    payloads are deterministic REAL media (PNG/JPEG/BMP/GIF/WAV,
    MJPEG-AVI, and real ISO-BMFF MP4 containers via
    ``make_media_payload``), so the
    expected output of each mapInPandas/explode stage is computable
    here, driver-side, with the same pure codecs the executors run. The
    gate then verifies the DISTRIBUTED execution path (Arrow batches,
    partitioning, schema) returns exactly these rows — a golden
    snapshot of a real decode, not an independent recomputation (the
    payload byte-stats query is the independently-computed media
    oracle)."""
    from sqlstreamstore_spark.analytics.multimodal import (
        _audio_features_one,
        _decode_one,
        _extract_frames_one,
        _resize_payload,
        make_media_payload,
    )

    kinds = ["image", "audio", "video"]
    decode_rows, frame_rows, resize_rows, extract_rows, audio_rows = [], [], [], [], []
    for i in range(100):
        kind = kinds[i % 3]
        w, h, d = (64 + i % 32, 48 + i % 24, 1000 + i * 10)
        payload, _mime, _codec = make_media_payload(i, kind, w, h, d)
        f = _decode_one(payload)

        def lit(v):
            return "NULL" if v is None else str(v)

        decode_rows.append(
            f"({i}, '{f['decoded_kind']}', {lit(f['width'])}, {lit(f['height'])}, "
            f"{lit(f['duration_ms'])}, {f['n_bytes']}, {f['checksum']})"
        )
        if kind == "video":
            for ts in range(0, d, 500):  # gate query uses every_ms=500
                frame_rows.append(f"({i}, {ts}, '{i}-{ts}')")
            for fr in _extract_frames_one(i, payload, 500):
                extract_rows.append(
                    f"({fr['media_id']}, {fr['frame_ts_ms']}, {fr['frame_index']}, "
                    f"{fr['width']}, {fr['height']}, {fr['checksum']})"
                )
        if kind == "image":
            resized = _resize_payload(i, payload, 32, 32)
            resize_rows.append(f"({i}, 32, 32, {len(resized)})")
        if kind == "audio":
            a = _audio_features_one(i, payload)
            audio_rows.append(
                f"({i}, {a['duration_ms']}, {a['n_samples']}, {a['sample_rate']}, "
                f"CAST('{a['rms']!r}' AS DOUBLE), "
                f"CAST('{a['zero_crossing_rate']!r}' AS DOUBLE), "
                f"CAST('{a['spectral_centroid_hz']!r}' AS DOUBLE), "
                f"CAST('{a['dominant_freq_hz']!r}' AS DOUBLE))"
            )
    decode_sql = (
        "SELECT * FROM (VALUES\n" + ",\n".join(decode_rows)
        + ") AS t(media_id, decoded_kind, width, height, duration_ms, n_bytes, checksum)"
        + "\nORDER BY media_id"
    )
    frame_sql = (
        "SELECT * FROM (VALUES\n" + ",\n".join(frame_rows)
        + ") AS t(media_id, frame_ts_ms, frame_id)\nORDER BY media_id, frame_ts_ms"
    )
    resize_sql = (
        "SELECT * FROM (VALUES\n" + ",\n".join(resize_rows)
        + ") AS t(media_id, width, height, n_bytes)\nORDER BY media_id"
    )
    extract_sql = (
        "SELECT * FROM (VALUES\n" + ",\n".join(extract_rows)
        + ") AS t(media_id, frame_ts_ms, frame_index, width, height, checksum)"
        + "\nORDER BY media_id, frame_ts_ms"
    )
    audio_sql = (
        "SELECT * FROM (VALUES\n" + ",\n".join(audio_rows)
        + ") AS t(media_id, duration_ms, n_samples, sample_rate, rms, "
        + "zero_crossing_rate, spectral_centroid_hz, dominant_freq_hz)"
        + "\nORDER BY media_id"
    )
    return decode_sql, frame_sql, resize_sql, extract_sql, audio_sql


def _multimodal_phash_golden_sqls(max_hamming: int = 16) -> tuple[str, str]:
    """Golden oracles for the perceptual-hash pair: per-image aHash and
    the banded near-dup pairs, recomputed driver-side with the same
    pure functions (incl. the band-candidate semantics — golden matches
    the operator's recall, not an idealized all-pairs scan)."""
    from sqlstreamstore_spark.analytics.multimodal import (
        _ahash_one,
        make_media_payload,
    )

    hashes: dict[int, int] = {}
    for i in range(100):
        if i % 3 == 0:
            w, h, d = (64 + i % 32, 48 + i % 24, 1000 + i * 10)
            payload, _m, _c = make_media_payload(i, "image", w, h, d)
            hashes[i] = _ahash_one(payload)
    hash_rows = [f"({i}, {v})" for i, v in sorted(hashes.items())]

    def bands(v: int) -> list[int]:
        u = v & 0xFFFFFFFFFFFFFFFF
        return [(u >> s) & 0xFFFF for s in (0, 16, 32, 48)]

    pair_rows = []
    ids = sorted(hashes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not any(p == q for p, q in zip(bands(hashes[a]), bands(hashes[b]))):
                continue  # not band-candidates — the operator never sees them
            ham = bin((hashes[a] ^ hashes[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if ham <= max_hamming:
                pair_rows.append(f"({a}, {b}, {ham})")
    hash_sql = (
        "SELECT * FROM (VALUES\n" + ",\n".join(hash_rows)
        + ") AS t(media_id, ahash)\nORDER BY media_id"
    )
    pair_sql = (
        "SELECT * FROM (VALUES\n" + ",\n".join(pair_rows)
        + ") AS t(id_a, id_b, hamming)\nORDER BY id_a, id_b"
        if pair_rows
        else "SELECT CAST(NULL AS BIGINT) id_a, CAST(NULL AS BIGINT) id_b, "
             "CAST(NULL AS INT) hamming WHERE FALSE"
    )
    return hash_sql, pair_sql


def _multimodal_mp4_golden_sql() -> str:
    """Golden oracle for the ISO-BMFF probe: rebuild each MP4 row's
    container driver-side with the same writer and re-parse it with the
    same mp4_probe the executors run — a golden snapshot proving the
    distributed mapInPandas path returns the real container facts."""
    from sqlstreamstore_spark.analytics.mp4 import mp4_probe
    from sqlstreamstore_spark.analytics.multimodal import make_media_payload

    rows = []
    for i in range(100):
        if i % 3 == 2 and (i // 3) % 2 == 1:  # the video rows that encode as MP4
            w, h, d = (64 + i % 32, 48 + i % 24, 1000 + i * 10)
            payload, mime, _c = make_media_payload(i, "video", w, h, d)
            assert mime == "video/mp4", (i, mime)
            info = mp4_probe(payload)
            rows.append(
                f"({i}, '{info['brand']}', '{info['codec']}', {info['width']}, "
                f"{info['height']}, {info['duration_ms']}, {info['n_frames']}, "
                f"{sum(sz for _, sz in info['sample_ranges'])})"
            )
    return (
        "SELECT * FROM (VALUES\n" + ",\n".join(rows)
        + ") AS t(media_id, brand, codec, width, height, duration_ms, "
        + "n_frames, data_bytes)\nORDER BY media_id"
    )


def _multimodal_video_dedup_golden_sql(
    every_ms: int = 500, max_hamming: int = 3, min_shared_frames: int = 2
) -> str:
    """Golden oracle for video near-dup: same frame hashes, same band
    candidacy, same frame-pair distinct + per-video-pair aggregate,
    recomputed driver-side."""
    from sqlstreamstore_spark.analytics.multimodal import (
        _video_frame_hashes_one,
        make_media_payload,
    )

    frames: list[tuple[int, int, int]] = []
    for i in range(100):
        if i % 3 == 2:
            w, h, d = (64 + i % 32, 48 + i % 24, 1000 + i * 10)
            payload, _m, _c = make_media_payload(i, "video", w, h, d)
            frames.extend(_video_frame_hashes_one(i, payload, every_ms))

    def bands(v: int) -> list[int]:
        u = v & 0xFFFFFFFFFFFFFFFF
        return [(u >> s) & 0xFFFF for s in (0, 16, 32, 48)]

    agg: dict[tuple[int, int], tuple[int, int]] = {}
    for x in range(len(frames)):
        for y in range(x + 1, len(frames)):
            a, ta, ha = frames[x]
            b, tb, hb = frames[y]
            if a == b:
                continue
            if a > b:
                a, b, ta, tb, ha, hb = b, a, tb, ta, hb, ha
            if not any(p == q for p, q in zip(bands(ha), bands(hb))):
                continue
            ham = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
            if ham > max_hamming:
                continue
            n, mn = agg.get((a, b), (0, 64))
            agg[(a, b)] = (n + 1, min(mn, ham))
    rows = [
        f"({a}, {b}, {n}, {mn})"
        for (a, b), (n, mn) in sorted(agg.items())
        if n >= min_shared_frames
    ]
    return (
        "SELECT * FROM (VALUES\n" + ",\n".join(rows)
        + ") AS t(id_a, id_b, n_shared_frames, min_hamming)\nORDER BY id_a, id_b"
    )


(_MM_DECODE_SQL, _MM_FRAMES_SQL, _MM_RESIZE_SQL, _MM_EXTRACT_SQL,
 _MM_AUDIO_SQL) = _multimodal_golden_sqls()
_MM_MP4_META_SQL = _multimodal_mp4_golden_sql()
_MM_AHASH_SQL, _MM_PHASH_PAIRS_SQL = _multimodal_phash_golden_sqls()
_MM_VIDEO_DEDUP_SQL = _multimodal_video_dedup_golden_sql()
_BPE_GOLDEN_SQL = _bpe_golden_sql()
_COMPRESSION_GOLDEN_SQL = _compression_golden_sql()

def _approx_sketches_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Inequality gate for the sketch aggregates (r11): runs the
    production approx_order_stats, then verifies each group's HLL
    distinct against the exact COUNT(DISTINCT) (|err| <= 15% — 3x the
    default 5% rsd) and the t-digest median's RANK against the exact
    group size (rank(approx_median)/n in [0.45, 0.56] — generous vs
    the 1/accuracy=1e-4 guarantee). Group keys + exact counts travel
    in the output, so the hash also pins the grouping itself."""
    from sqlstreamstore_spark.analytics import relational

    orders = _t(spark, sf, "orders")
    approx = relational.approx_order_stats(orders).drop("n")
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("__exact_cust"),
        F.count("*").cast("long").alias("n"),
    )
    ranks = (
        orders.join(
            F.broadcast(approx.select("o_orderstatus", "approx_median_price")),
            "o_orderstatus",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.sum(
                F.when(
                    F.col("o_totalprice") <= F.col("approx_median_price"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("__rank_le")
        )
    )
    return (
        approx.join(exact, "o_orderstatus")
        .join(ranks, "o_orderstatus")
        .select(
            "o_orderstatus",
            "n",
            (
                F.abs(F.col("approx_customers") - F.col("__exact_cust"))
                <= 0.15 * F.col("__exact_cust")
            ).alias("distinct_ok"),
            (
                (F.col("__rank_le") >= 0.45 * F.col("n"))
                & (F.col("__rank_le") <= 0.56 * F.col("n"))
            ).alias("median_ok"),
        )
        .orderBy("o_orderstatus")
    )


_APPROX_SKETCHES_SQL = """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       true AS distinct_ok, true AS median_ok
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# inequality oracles for the quantized-ANN pair (see _ann_recall_report)
_ANN_IVF_RECALL_SQL = (
    "SELECT CAST(0 AS BIGINT) AS q_vec_id, CAST(10 AS INTEGER) AS k, "
    "CAST(0.6 AS DOUBLE) AS bound, true AS recall_ok"
)
_ANN_PQ_RECALL_SQL = (
    "SELECT CAST(0 AS BIGINT) AS q_vec_id, CAST(10 AS INTEGER) AS k, "
    "CAST(0.4 AS DOUBLE) AS bound, true AS recall_ok"
)

from sqlstreamstore_spark.analytics.graph import TRIANGLE_ORACLE_SQL as _TRIANGLE_SQL
from sqlstreamstore_spark.analytics.graph import label_propagation_oracle_sql

_LABEL_PROP_SQL = label_propagation_oracle_sql(iters=2, min_orders=30)
from sqlstreamstore_spark.analytics.graph import k_core_oracle_sql

_K_CORE_SQL = k_core_oracle_sql(k=8, rounds=5, min_orders=30)
from sqlstreamstore_spark.analytics.graph import k_truss_oracle_sql

_K_TRUSS_SQL = k_truss_oracle_sql(k=5, rounds=8, min_orders=30)
from sqlstreamstore_spark.analytics.graph import doulion_oracle_sql as _doulion_oracle_sql

_DOULION_SQL = _doulion_oracle_sql(p=0.5)
from sqlstreamstore_spark.analytics.graph import bfs_oracle_sql as _bfs_sql
from sqlstreamstore_spark.analytics.graph import pagerank_oracle_sql as _pr_sql

_PAGERANK_SQL = _pr_sql(iters=3)
_BFS_SQL = _bfs_sql("(SELECT min(src) FROM edges)", max_depth=3)


def _minhash_ctes(
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    src: str = "documents WHERE doc_id < 300",
    lead: str = "\nWITH ",
    cands_only: bool = False,
) -> str:
    """Shared WITH-clause body for the MinHash oracles (md5 family):
    shingles -> signatures -> banded candidates -> exact-Jaccard set.
    `src` is the FROM source (a table or an earlier CTE — the e2e
    pipeline oracle chains this off its exact-dedup stage); `lead`
    lets a caller splice the block into an existing WITH list.
    `cands_only=True` computes the exact-Jaccard verify ONLY for the
    banded candidates (what minhash_dedup_pairs does) instead of all
    co-shingle pairs (what the recall report needs) — `exact` is then
    already candidate-intersected, and an order of magnitude cheaper
    on a full corpus."""
    r = k // bands
    mins = ",\n         ".join(f"min(md5('{i}:' || s)) AS h{i}" for i in range(k))
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {bi} AS band, md5({concat}) AS bh FROM sig".format(
            bi=bi,
            concat=" || '|' || ".join(f"h{bi * r + j}" for j in range(r)),
        )
        for bi in range(bands)
    )
    return f"""{lead}toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM {src}
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
),
banded AS (
{band_rows}
),
cands AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
{'''  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cands c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
  GROUP BY c.doc_a, c.doc_b''' if cands_only else '''  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id'''}
),
exact AS (
  SELECT doc_a, doc_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
         CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
  FROM inter JOIN sizes sa ON inter.doc_a = sa.doc_id
             JOIN sizes sb ON inter.doc_b = sb.doc_id
  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= {threshold}
)"""


def _minhash_incremental_sql(threshold: float = 0.2) -> str:
    """Twin of dedup.minhash_dedup_incremental on the doc_id%10 split:
    a MinHash signature depends only on its own document, so the full
    self-join chain restricted to CROSS-SIDE pairs (exactly one side
    in the incoming slice) equals delta-bands ⋈ stored-index — and the
    oracle needs no index materialization."""
    return _minhash_ctes(threshold=threshold, src="documents", cands_only=True) + """
SELECT CASE WHEN e.doc_a % 10 = 0 THEN e.doc_a ELSE e.doc_b END AS new_doc,
       CASE WHEN e.doc_a % 10 = 0 THEN e.doc_b ELSE e.doc_a END AS old_doc,
       e.n_inter,
       CASE WHEN e.doc_a % 10 = 0 THEN e.n_a ELSE e.n_b END AS n_new,
       CASE WHEN e.doc_a % 10 = 0 THEN e.n_b ELSE e.n_a END AS n_old,
       e.jaccard
FROM exact e
WHERE (e.doc_a % 10 = 0) <> (e.doc_b % 10 = 0)
ORDER BY new_doc, old_doc
"""


_MINHASH_INCREMENTAL_SQL = _minhash_incremental_sql()

_MINHASH_INDEX_CACHE: dict[str, bool] = {}


def _mh_index_for(spark: SparkSession, sf: str) -> str:
    """Materialize (once per process per sf) the corpus banded-LSH
    index over the doc_id%10 != 0 slice — shared by the incremental
    dedup gate and the incremental flagship."""
    import hashlib

    path = _scratch("mh_index_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    if path not in _MINHASH_INDEX_CACHE:
        corpus = _t(spark, sf, "documents").filter(F.col("doc_id") % 10 != 0)
        dedup.build_minhash_index(corpus, path)
        _MINHASH_INDEX_CACHE[path] = True
    return path


def _dedup_minhash_incremental_query(spark: SparkSession, sf: str) -> DataFrame:
    """The deployed incremental path: build the corpus LSH index once
    per sf (driver calls repeat), then probe it with the incoming
    slice (doc_id % 10 == 0)."""
    docs = _t(spark, sf, "documents")
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return dedup.minhash_dedup_incremental(
        spark, _mh_index_for(spark, sf), incoming, corpus, threshold=0.2
    )


_MINHASH_COMPACT_CACHE: dict[str, bool] = {}


def _mh_compacted_index_for(spark: SparkSession, sf: str) -> str:
    """Exercise the FULL index lifecycle (build → upsert → compact): a
    re-sent corpus slice appends band rows that already exist in the
    index, then compact_index collapses the duplicates and rewrites
    each band partition. The probe must be unchanged — the gate's
    oracle is the SAME incremental SQL as the uncompacted path."""
    import hashlib

    path = _scratch("mh_compact_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    if path not in _MINHASH_COMPACT_CACHE:
        corpus = _t(spark, sf, "documents").filter(F.col("doc_id") % 10 != 0)
        dedup.build_minhash_index(corpus, path)
        # re-send a tenth of the corpus: pure duplicate band rows
        dedup.upsert_minhash_index(
            corpus.filter(F.col("doc_id") % 10 == 5), path
        )
        dedup.compact_index(spark, path, partition_by="band")
        _MINHASH_COMPACT_CACHE[path] = True
    return path


def _dedup_minhash_compacted_query(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return dedup.minhash_dedup_incremental(
        spark, _mh_compacted_index_for(spark, sf), incoming, corpus, threshold=0.2
    )


_MINHASH_LSH_SQL = _minhash_ctes() + """
SELECT e.doc_a, e.doc_b, e.n_inter, e.n_a, e.n_b, e.jaccard
FROM exact e JOIN cands c ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b
ORDER BY e.doc_a, e.doc_b
"""

_MINHASH_RECALL_SQL = _minhash_ctes() + """,
hit AS (
  SELECT e.doc_a FROM exact e JOIN cands c
    ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b
)
SELECT (SELECT count(*) FROM exact) AS n_exact,
       (SELECT count(*) FROM cands) AS n_candidates,
       (SELECT count(*) FROM hit) AS n_hit,
       CAST((SELECT count(*) FROM hit) AS DOUBLE)
         / (SELECT count(*) FROM exact) AS recall
"""

# strlen (BYTE length) is intentional here: the Spark twin measures
# len(payload) of the utf-8 payload bytes, so byte semantics match on
# both sides. Char-count oracles elsewhere use length() (ADVICE r9 #2).
_PAYLOAD_STATS_SQL = """
SELECT doc_id AS media_id,
       strlen(text) AS n_bytes,
       md5(text) AS digest
FROM documents ORDER BY media_id
"""

def _decontaminate_sql(n: int = 8, train_fraction: float = 0.9) -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(n))
    return f"""
WITH split AS (
  SELECT doc_id, text,
         CASE WHEN {_HEXBUCKET} % 65536 < CAST({train_fraction} * 65536 AS INTEGER)
              THEN 'train' ELSE 'val' END AS split
  FROM documents
),
toks AS (SELECT doc_id, split, string_split(text, ' ') AS w FROM split),
tr_sh AS (
  SELECT doc_id AS train_doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - {n - 2}),
                                             i -> {gram}))) AS s
  FROM toks WHERE split = 'train' AND len(w) >= {n}
),
te_sh AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(w) - {n - 2}),
                                                      i -> {gram}))) AS s
  FROM toks WHERE split = 'val' AND len(w) >= {n}
)
SELECT train_doc_id, count(*) AS n_leaked_ngrams
FROM tr_sh JOIN te_sh ON tr_sh.s = te_sh.s
GROUP BY train_doc_id
ORDER BY train_doc_id
"""


_DECONTAMINATE_SQL = _decontaminate_sql()


def _decontaminate_incremental_sql(n: int = 8) -> str:
    """Twin of pipeline.decontaminate_incremental on the doc_id%10
    split: benchmark index = the %10==0 slice's distinct n-grams,
    incoming = the rest. N-gram digests are per-document, so probing
    the materialized index equals the two-sided join — no index
    materialization needed oracle-side (the minhash-incremental
    identity)."""
    gram = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(n))
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
inc AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - {n - 2}),
                                             i -> {gram}))) AS s
  FROM t WHERE doc_id % 10 <> 0 AND len(w) >= {n}
),
bm AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(w) - {n - 2}),
                                                      i -> {gram}))) AS s
  FROM t WHERE doc_id % 10 = 0 AND len(w) >= {n}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_leaked_ngrams
FROM inc JOIN bm USING (s)
GROUP BY doc_id
ORDER BY doc_id
"""


_DECONTAMINATE_INCREMENTAL_SQL = _decontaminate_incremental_sql()

_NGRAM_INDEX_CACHE: dict[str, bool] = {}


def _ngram_index_for(spark: SparkSession, sf: str) -> str:
    """Materialize (once per process per sf) the benchmark n-gram
    digest index over the doc_id%10 == 0 slice (the dim-sized 'eval
    suite' stand-in)."""
    import hashlib

    path = _scratch("ngram_index_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    if path not in _NGRAM_INDEX_CACHE:
        bm = _t(spark, sf, "documents").filter(F.col("doc_id") % 10 == 0)
        pipeline.build_ngram_index(bm, path)
        _NGRAM_INDEX_CACHE[path] = True
    return path


def _decontaminate_incremental_query(spark: SparkSession, sf: str) -> DataFrame:
    """Decontamination-on-ingest: the %10 != 0 slice plays the ingest
    delta, probing the materialized benchmark-gram index (the %10==0
    slice — the benchmark is the SMALL, index-once side here, unlike
    the other incremental gates where %10==0 is the delta)."""
    docs = _t(spark, sf, "documents")
    incoming = docs.filter(F.col("doc_id") % 10 != 0)
    return pipeline.decontaminate_incremental(
        spark, _ngram_index_for(spark, sf), incoming
    )

_PACK_SPANS_SQL = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
),
s AS (
  SELECT doc_id, n_tokens, cum - n_tokens AS gs,
         unnest(range(CAST((cum - n_tokens) // 512 AS BIGINT),
                      CAST((cum - 1) // 512 + 1 AS BIGINT))) AS seq_id
  FROM c
)
SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(greatest(0, gs - seq_id * 512) AS BIGINT) AS offset_in_seq,
       CAST(greatest(0, seq_id * 512 - gs) AS BIGINT) AS tok_start,
       CAST(least(n_tokens, seq_id * 512 + 512 - gs) AS BIGINT) AS tok_end,
       CAST(least(n_tokens, seq_id * 512 + 512 - gs)
            - greatest(0, seq_id * 512 - gs) AS BIGINT) AS span_tokens
FROM s ORDER BY doc_id, seq_id
"""

_PACK_SEQUENCES_SQL = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % 512 AS BIGINT) AS offset_in_seq
FROM c ORDER BY doc_id
"""

_SOURCE_ROLLUP_SQL = """
SELECT source,
       count(*) AS n_docs,
       round(avg(CAST(len(string_split(text, ' ')) AS DOUBLE)), 9) AS avg_tokens,
       round(avg(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE)), 9) AS avg_distinct_ratio,
       round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9) AS dup_rate
FROM documents
GROUP BY source
ORDER BY source
"""

_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w, length(text) AS nch FROM documents
),
wc AS (
  SELECT doc_id, t, count(*) AS c
  FROM (SELECT doc_id, unnest(w) AS t FROM toks) GROUP BY doc_id, t
),
ws AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(c) AS BIGINT) AS top_c
  FROM wc GROUP BY doc_id
),
grams AS (
  SELECT doc_id,
         CAST(len(w) - 1 AS BIGINT) AS n_g,
         CAST(len(list_distinct(list_transform(range(1, len(w)),
              i -> w[i] || ' ' || w[i+1]))) AS BIGINT) AS n_gd
  FROM toks WHERE len(w) >= 2
)
SELECT ws.doc_id, n_words,
       CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS distinct_word_ratio,
       CAST(top_c AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_ratio,
       1.0 - CAST(n_gd AS DOUBLE) / CAST(n_g AS DOUBLE) AS dup_2gram_ratio,
       (CAST(nch AS DOUBLE) - (CAST(n_words AS DOUBLE) - 1.0))
         / CAST(n_words AS DOUBLE) AS mean_word_len
FROM ws JOIN toks USING (doc_id) LEFT JOIN grams USING (doc_id)
ORDER BY ws.doc_id
"""

_VOCAB_SQL = """
SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY tf DESC, token
LIMIT 200
"""

_TERM_INDEX_CACHE: dict[str, bool] = {}


def _term_index_for(spark: SparkSession, sf: str) -> str:
    """Materialize (once per process per sf) the incremental
    vocabulary index: corpus slice (doc_id%10 != 0) builds, the %10==0
    slice upserts its partial (token, tf, df) rows — disjoint batches,
    so the merged view equals the full-corpus recompute (the
    term-count monoid)."""
    import hashlib

    path = _scratch("term_index_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    if path not in _TERM_INDEX_CACHE:
        docs = _t(spark, sf, "documents")
        text.build_term_index(docs.filter(F.col("doc_id") % 10 != 0), path)
        text.upsert_term_index(docs.filter(F.col("doc_id") % 10 == 0), path)
        _TERM_INDEX_CACHE[path] = True
    return path


def _text_vocab_incremental_query(spark: SparkSession, sf: str) -> DataFrame:
    return text.vocabulary_from_index(spark, _term_index_for(spark, sf))


# Holt linear-trend smoothing: bounded struct-state fold over the
# per-type daily series; identical IEEE trees + identical element
# order (sort_array ↔ list_sort) — zero-tolerance oracle
def _periodogram_sql(max_k: int = 7) -> str:
    """DFT twin: per-harmonic angular factors are the SAME Python
    doubles as the Spark side; contributions fold sequentially over
    the day-sorted series (list_prepend-0.0 init mirrors Spark's
    aggregate init); both engines round amplitudes to 6."""
    import math

    cols = []
    for k in range(1, max_k + 1):
        w = repr(2.0 * math.pi * k)
        mk = lambda fn: (  # noqa: E731
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(range(0, n_days), i -> "
            f"arr[i+1].y * {fn}({w} * i / CAST(n_days AS DOUBLE)))), "
            "(a, b) -> a + b)"
        )
        c, s = mk("cos"), mk("sin")
        cols.append(
            f"round(sqrt(({c}) * ({c}) + ({s}) * ({s}))"
            f" / CAST(n_days AS DOUBLE), 6) AS amp_{k}"
        )
    return f"""
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
s AS (
  SELECT event_type,
         list_transform(list_sort(list(struct_pack(day := day, y := y))),
                        x -> struct_pack(y := x.y)) AS arr,
         CAST(count(*) AS BIGINT) AS n_days
  FROM d GROUP BY event_type
)
SELECT event_type, n_days, {", ".join(cols)}
FROM s ORDER BY event_type
"""


_PERIODOGRAM_SQL = _periodogram_sql()

# Hodges-Lehmann twin: Walsh sums exact BIGINT, median by exact
# selection over the sorted pair list, divisions by 2 only
_HODGES_LEHMANN_SQL = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
w AS (
  SELECT a.event_type, a.y + b.y AS w
  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day <= b.day
),
g AS (
  SELECT event_type, list_sort(list(w)) AS arr,
         CAST(count(*) AS BIGINT) AS m
  FROM w GROUP BY event_type
)
SELECT event_type, m AS n_pairs,
       (CASE WHEN m % 2 = 1
             THEN CAST(arr[CAST((m + 1) // 2 AS INTEGER)] AS DOUBLE)
             ELSE CAST(arr[CAST(m // 2 AS INTEGER)]
                       + arr[CAST(m // 2 + 1 AS INTEGER)] AS DOUBLE) / 2.0e0
        END) / 2.0e0 AS hl_location
FROM g ORDER BY event_type
"""

# Mann-Kendall twin: exact-int S and variance numerators over the
# bounded day axis; one /18 divide; z rounded 6 both engines
_MANN_KENDALL_SQL = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
s AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY a.event_type
),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
      FROM d GROUP BY event_type),
ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
        FROM d GROUP BY event_type, y)
  GROUP BY event_type
),
v AS (
  SELECT n.event_type, n.n_days, s.s_stat,
         CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE)
           / 18.0e0 AS var_s
  FROM n JOIN s ON s.event_type = n.event_type
  JOIN ties ON ties.event_type = n.event_type
)
SELECT event_type, n_days, s_stat, var_s,
       round(CASE WHEN s_stat > 0
                  THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
                  WHEN s_stat < 0
                  THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
                  ELSE 0.0e0 END, 6) AS z
FROM v ORDER BY event_type
"""

_HOLT_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
r AS (
  SELECT event_type, y,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS t
  FROM d
),
nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
       FROM r GROUP BY event_type),
h AS (
  SELECT event_type, t, y AS l, 0.0e0 AS b, 0.0e0 AS sse FROM r WHERE t = 1
  UNION ALL
  SELECT r.event_type, r.t,
         0.5e0 * r.y + 0.5e0 * (h.l + h.b),
         0.3e0 * ((0.5e0 * r.y + 0.5e0 * (h.l + h.b)) - h.l) + 0.7e0 * h.b,
         h.sse + (r.y - (h.l + h.b)) * (r.y - (h.l + h.b))
  FROM h JOIN r ON r.event_type = h.event_type AND r.t = h.t + 1
)
SELECT h.event_type AS event_type, nn.n_days, h.l AS level, h.b AS trend,
       h.l + h.b AS forecast_next, h.sse AS sse
FROM h JOIN nn ON nn.event_type = h.event_type AND h.t = nn.n_days
ORDER BY event_type
"""

def _bootstrap_sql(b: int = 64) -> str:
    """Poisson-bootstrap twin: thresholds are the SAME Python doubles
    as the Spark side (repr round-trips bit-exactly through strtod);
    weights exact ints, replicate means single IEEE divides of exact
    BIGINT sums, CI bounds exact order statistics."""
    import math

    from sqlstreamstore_spark.analytics.evaluation import POISSON1_CUM

    lo, hi = int(0.025 * b) + 1, int(math.ceil(0.975 * b))
    hexfold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(substr(md5("
        "CAST(doc_id AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 12), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        "(a, x) -> a * 16 + x)"
    )
    w = " + ".join(
        f"(CASE WHEN u >= CAST('{c!r}' AS DOUBLE) THEN 1 ELSE 0 END)"
        for c in POISSON1_CUM
    )
    return f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x
  FROM documents
),
rep AS (
  SELECT source, doc_id, x, j,
         CAST({hexfold} AS DOUBLE) / CAST(281474976710656 AS DOUBLE) AS u
  FROM t, (SELECT unnest(range(1, {b + 1})) AS j)
),
wt AS (SELECT source, j, x, CAST({w} AS BIGINT) AS w FROM rep),
g AS (
  SELECT source, j,
         CAST(sum(w * x) AS BIGINT) AS sx, CAST(sum(w) AS BIGINT) AS sw
  FROM wt GROUP BY source, j
),
m AS (SELECT source, CAST(sx AS DOUBLE) / CAST(sw AS DOUBLE) AS m
      FROM g WHERE sw > 0),
ci AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_resamples,
         list_sort(list(m)) AS arr
  FROM m GROUP BY source
),
pt AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tokens
  FROM t GROUP BY source
)
SELECT pt.source AS source, n_docs, mean_tokens, n_resamples,
       arr[{lo}] AS boot_lo, arr[{hi}] AS boot_hi
FROM pt JOIN ci ON ci.source = pt.source
ORDER BY source
"""


_BOOTSTRAP_SQL = _bootstrap_sql()

# domain interleave: per-source row_number + composite ORDER BY —
# all-integer, zero-tolerance oracle
_INTERLEAVE_SQL = """
SELECT doc_id, source,
       CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT)
         AS rank_in_source
FROM documents
ORDER BY rank_in_source, source
"""


def _pass_at_k_sql(ks=(1, 5, 10), min_n: int = 10) -> str:
    """pass@k product form as a bounded left fold: Spark `aggregate`
    init 1.0 ↔ DuckDB `list_reduce` (first element is the init;
    1.0·x0 ≡ x0 exactly, so the fold orders match IEEE-wise)."""
    cols = []
    for k in ks:
        fold = (
            f"list_reduce(list_transform(range(0, {k}), i -> "
            "CAST(n_samples - n_correct - i AS DOUBLE)"
            " / CAST(n_samples - i AS DOUBLE)), (a, b) -> a * b)"
        )
        cols.append(
            f"CASE WHEN n_samples - n_correct < {k} THEN 1.0 "
            f"ELSE 1.0 - {fold} END AS pass_at_{k}"
        )
    return f"""
WITH g AS (
  SELECT o_custkey AS custkey,
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_correct
  FROM orders GROUP BY o_custkey
  HAVING count(*) >= {min_n}
)
SELECT custkey, n_samples, n_correct,
       {", ".join(cols)}
FROM g ORDER BY custkey
"""


_PASS_AT_K_SQL = _pass_at_k_sql()

# tokenizer fertility: exact BIGINT sums of the regex token counts
# (the text_regex_tokens patterns) + single IEEE divides
_FERTILITY_SQL = """
WITH t AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
         CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS nm,
         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS sy,
         CAST(length(text) AS BIGINT) AS ch
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ws) AS BIGINT) AS ws_tokens,
       CAST(sum(w) AS BIGINT) AS word_tokens,
       CAST(sum(w + nm + sy) AS BIGINT) AS bpeish_tokens,
       CAST(sum(ch) AS BIGINT) AS n_chars,
       CAST(sum(w + nm + sy) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS fertility,
       CAST(sum(ch) AS DOUBLE) / CAST(sum(w + nm + sy) AS DOUBLE)
         AS chars_per_token,
       CAST(sum(w + nm + sy) AS DOUBLE) / CAST(sum(ws) AS DOUBLE)
         AS bpe_per_ws_token
FROM t GROUP BY source ORDER BY source
"""

# exact waterfilling: prefix-saturation over the capacity-sorted
# bounded source axis; psat = MAX of the sequential inclusive prefix
# (order-free), never an unordered float sum — zero tolerance
_WATERFILL_SQL = """
WITH g AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_available
  FROM documents GROUP BY source
),
rk AS (
  SELECT source, tokens_available,
         CAST(tokens_available AS DOUBLE) * 4.0e0 AS capacity,
         CAST(row_number() OVER (ORDER BY CAST(tokens_available AS DOUBLE) * 4.0e0,
                                 source) AS BIGINT) AS k,
         COALESCE(sum(CAST(tokens_available AS DOUBLE) * 4.0e0)
                    OVER (ORDER BY CAST(tokens_available AS DOUBLE) * 4.0e0, source
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0.0e0) AS p_prev,
         sum(CAST(tokens_available AS DOUBLE) * 4.0e0)
           OVER (ORDER BY CAST(tokens_available AS DOUBLE) * 4.0e0, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_incl,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM g
),
sat AS (
  SELECT *,
         capacity * CAST(n - k + 1 AS DOUBLE) <= 1000000.0e0 - p_prev AS saturated
  FROM rk
),
lev AS (
  SELECT CAST(sum(CASE WHEN saturated THEN 1 ELSE 0 END) AS BIGINT) AS ks,
         COALESCE(max(CASE WHEN saturated THEN p_incl END), 0.0e0) AS psat,
         CAST(max(n) AS BIGINT) AS nn
  FROM sat
)
SELECT s.source AS source, s.tokens_available, s.capacity, s.saturated,
       CASE WHEN l.ks < l.nn
            THEN (1000000.0e0 - l.psat) / CAST(l.nn - l.ks AS DOUBLE) END
         AS water_level,
       CASE WHEN s.saturated THEN s.capacity
            ELSE least(s.capacity,
                       (1000000.0e0 - l.psat) / CAST(l.nn - l.ks AS DOUBLE)) END
         AS alloc_tokens,
       (CASE WHEN s.saturated THEN s.capacity
             ELSE least(s.capacity,
                        (1000000.0e0 - l.psat) / CAST(l.nn - l.ks AS DOUBLE)) END)
         / CAST(s.tokens_available AS DOUBLE) AS epochs
FROM sat s, lev l
ORDER BY source
"""

# curriculum → packing composition: curriculum rank CTE feeding the
# pack-spans CTE over train_order — all BIGINT, zero tolerance
_CURRICULUM_PACK_SQL = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         CAST(row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS BIGINT)
           AS train_order,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM t
),
cu AS (
  SELECT doc_id, n_tokens, train_order,
         CAST((train_order * 4) // n AS BIGINT) AS stage
  FROM r
),
c AS (
  SELECT doc_id, train_order, stage, n_tokens,
         sum(n_tokens) OVER (ORDER BY train_order
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM cu
),
s AS (
  SELECT doc_id, train_order, stage, n_tokens, cum - n_tokens AS gs,
         unnest(range(CAST((cum - n_tokens) // 512 AS BIGINT),
                      CAST((cum - 1) // 512 + 1 AS BIGINT))) AS seq_id
  FROM c
)
SELECT doc_id, train_order, stage, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(greatest(0, gs - seq_id * 512) AS BIGINT) AS offset_in_seq,
       CAST(greatest(0, seq_id * 512 - gs) AS BIGINT) AS tok_start,
       CAST(least(n_tokens, seq_id * 512 + 512 - gs) AS BIGINT) AS tok_end,
       CAST(least(n_tokens, seq_id * 512 + 512 - gs)
            - greatest(0, seq_id * 512 - gs) AS BIGINT) AS span_tokens
FROM s ORDER BY train_order, seq_id
"""

# epoch allocation: BIGINT token totals per source; epochs/alloc/
# deficit are per-row doubles in identical expression order on both
# engines (no cross-row float accumulation) — zero-tolerance oracle
_EPOCH_ALLOC_SQL = """
WITH g AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_available
  FROM documents GROUP BY source
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM g)
SELECT source, tokens_available,
       1000000.0 / ns AS target_tokens,
       least(1000000.0 / ns / CAST(tokens_available AS DOUBLE), 4.0) AS epochs,
       CAST(tokens_available AS DOUBLE)
         * least(1000000.0 / ns / CAST(tokens_available AS DOUBLE), 4.0)
         AS alloc_tokens,
       1000000.0 / ns
         - CAST(tokens_available AS DOUBLE)
           * least(1000000.0 / ns / CAST(tokens_available AS DOUBLE), 4.0)
         AS deficit_tokens,
       CAST(tokens_available AS DOUBLE)
         * least(1000000.0 / ns / CAST(tokens_available AS DOUBLE), 4.0)
         / 1000000.0 AS achieved_share
FROM g, n
ORDER BY source
"""

# length-bucketed batching: all-BIGINT per-batch aggregates + one
# exact int/int division — zero-tolerance oracle
_LENGTH_BATCHES_SQL = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT n_tokens,
         CAST(row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS BIGINT) // 32
           AS batch_id
  FROM t
)
SELECT batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS batch_max,
       CAST(sum(n_tokens) AS BIGINT) AS batch_tokens,
       CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT) AS padded_waste,
       CAST(max(n_tokens) * count(*) - sum(n_tokens) AS DOUBLE)
         / CAST(max(n_tokens) * count(*) AS DOUBLE) AS waste_frac
FROM r GROUP BY batch_id ORDER BY batch_id
"""

# curriculum ordering: rank·stages DIV N is pure BIGINT on both
# engines (the pack_sequences DIV precedent) — zero-tolerance oracle
_CURRICULUM_SQL = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         CAST(row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS BIGINT)
           AS train_order,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM t
)
SELECT train_order,
       CAST((train_order * 4) // n AS BIGINT) AS stage,
       doc_id, n_tokens
FROM r
ORDER BY train_order
"""

# Exact substring-span dedup (Lee et al. 2022, token granularity):
# positional 8-gram digests, cross-doc test = min!=max per digest,
# maximal spans via the gap>k island break — all integer arithmetic
# except the final exact int/int ratio division.
_SUBSTRING_SPANS_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pg0 AS (SELECT doc_id, w, unnest(range(0, len(w) - 8 + 1)) AS pos
        FROM toks WHERE len(w) >= 8),
pg AS (SELECT doc_id, pos, md5(array_to_string(w[pos+1 : pos+8], ' ')) AS h
       FROM pg0),
d AS (SELECT h FROM pg GROUP BY h HAVING min(doc_id) <> max(doc_id)),
dp AS (SELECT doc_id, pos FROM pg JOIN d USING (h)),
isl AS (SELECT doc_id, pos,
        sum(CASE WHEN prev IS NOT NULL AND pos - prev <= 8 THEN 0 ELSE 1 END)
          OVER (PARTITION BY doc_id ORDER BY pos) AS g
        FROM (SELECT doc_id, pos,
                     lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              FROM dp) q),
spans AS (SELECT doc_id, g, min(pos) AS s, max(pos) + 8 - 1 AS e
          FROM isl GROUP BY doc_id, g),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
               CAST(sum(e - s + 1) AS BIGINT) AS n_dup_tokens,
               CAST(max(e - s + 1) AS BIGINT) AS longest_dup_span
        FROM spans GROUP BY doc_id)
SELECT a.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens, n_dup_spans,
       n_dup_tokens, longest_dup_span,
       CAST(n_dup_tokens AS DOUBLE) / CAST(len(t.w) AS DOUBLE) AS dup_token_ratio
FROM agg a JOIN toks t USING (doc_id) ORDER BY a.doc_id
"""

# Corpus-unigram LM score: single-libm-call values on exact integers,
# per-doc sum folded over a SORTED contribution list so both engines
# add in identical order (the sorted-sequential-fold discipline).
_UNIGRAM_LOGPROB_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
cnts AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_corpus FROM tok),
per AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS m
        FROM tok GROUP BY doc_id, token),
terms AS (
  SELECT per.doc_id,
         list_sort(list({'c': c, 'm': m})) AS ts,
         CAST(sum(m) AS BIGINT) AS n_tokens
  FROM per JOIN cnts USING (token) GROUP BY per.doc_id),
folded AS (
  SELECT doc_id, n_tokens,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(ts,
               t -> CAST(t.m AS DOUBLE) * ln(CAST(t.c AS DOUBLE)))),
           (a, x) -> a + x) AS s
  FROM terms)
SELECT doc_id, n_tokens,
       round((s - CAST(n_tokens AS DOUBLE) * ln(n_corpus))
               / CAST(n_tokens AS DOUBLE), 7) AS avg_logprob,
       round(exp(-((s - CAST(n_tokens AS DOUBLE) * ln(n_corpus))
               / CAST(n_tokens AS DOUBLE))), 4) AS ppl_proxy
FROM folded, nt ORDER BY doc_id
"""

def _hexfold(expr: str, start: int, n: int) -> str:
    """DuckDB expression: hex chars [start, start+n) of md5(expr) as a
    BIGINT (the KMV/`_HEXBUCKET` fold idiom, parameterized)."""
    return f"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split(substr(md5({expr}), {start}, {n}), ''),
        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
      (a, x) -> a * 16 + x)"""


# Efraimidis-Spirakis A-ES weighted sample: u = 48-bit md5 fraction
# (+1 so u > 0), ordering key ln(u)/w — monotone in u^(1/w), one libm
# call on an exact rational. Selection replayed identically.
_WEIGHTED_AES_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ln((CAST({_hexfold("'wrs:' || CAST(doc_id AS VARCHAR)", 1, 12)} AS DOUBLE) + 1.0)
              / 281474976710656.0)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS key
  FROM documents)
SELECT doc_id, n_tokens, round(key, 9) AS aes_key
FROM d ORDER BY key DESC, doc_id LIMIT 100
"""


_GROUP_SPLIT_SQL = f"""
WITH b AS (
  SELECT event_id, user_id,
         ({_hexfold("'gsplit:' || CAST(user_id AS VARCHAR)", 1, 4)}) % 65536 AS h
  FROM events)
SELECT event_id, user_id,
       CASE WHEN h < {int(0.8 * 65536)} THEN 'train'
            WHEN h < {int(0.9 * 65536)} THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY event_id
"""


def _winnow_sql(k: int = 4, w: int = 5, min_shared: int = 2) -> str:
    """Bit-for-bit DuckDB replay of dedup.winnow_shared_pairs: same
    40-bit md5-prefix gram hash (strpos fold == Spark's conv), same
    packed rightmost-min key h*2^20 + (2^20-1-pos), same windowed min
    and integer-division unpack."""
    gram = f"array_to_string(w[i : i + {k - 1}], ' ')"
    hexpr = _hexfold(gram, 1, 10)  # first 10 hex chars of md5(gram) = 40 bits
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) >= {k + w - 1}),
base AS (
  SELECT doc_id,
         unnest(range(1, len(w) - {k} + 2)) - 1 AS pos,
         unnest(list_transform(range(1, len(w) - {k} + 2),
                i -> {hexpr})) AS h
  FROM toks),
keyed AS (SELECT doc_id, pos,
                 h * 1048576 + (1048575 - pos) AS key FROM base),
sel AS (
  SELECT doc_id, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS kmin
  FROM keyed),
fps AS (SELECT DISTINCT doc_id, kmin // 1048576 AS h
        FROM sel WHERE pos >= {w - 1})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fps a JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING count(*) >= {min_shared}
ORDER BY doc_a, doc_b
"""


def _bloom_sql(m_bits: int = 4096, k: int = 4) -> str:
    """Bit-for-bit DuckDB replay of dedup.bloom_prefilter over the
    planted incoming batch (every-5th doc verbatim = hits; doc_id%5==1
    shifted +100000 with mutated text = misses + the odd false
    positive)."""
    folds = ", ".join(
        f"({_hexfold('text', 4 * j + 1, 4)}) % {m_bits}" for j in range(k)
    )
    return f"""
WITH incoming AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' bloomprobe' AS text
  FROM documents WHERE doc_id % 5 = 1),
corpus_h AS (SELECT DISTINCT md5(text) AS h FROM documents),
cor_bits AS (SELECT unnest([{folds}]) AS bit FROM documents),
words AS (
  SELECT bit // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INTEGER)) AS bits
  FROM cor_bits GROUP BY 1),
probe AS (SELECT doc_id, unnest([{folds}]) AS bit FROM incoming),
hit AS (
  SELECT p.doc_id,
         CAST(min(CASE WHEN w.bits IS NOT NULL
                        AND (w.bits & (CAST(1 AS BIGINT) << CAST(p.bit % 32 AS INTEGER)))
                            = (CAST(1 AS BIGINT) << CAST(p.bit % 32 AS INTEGER))
                   THEN 1 ELSE 0 END) AS BIGINT) AS maybe_dup
  FROM probe p LEFT JOIN words w ON p.bit // 32 = w.word_idx
  GROUP BY p.doc_id),
exact AS (
  SELECT i.doc_id,
         CAST(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS exact_dup
  FROM (SELECT doc_id, md5(text) AS h FROM incoming) i
  LEFT JOIN corpus_h c USING (h))
SELECT doc_id, maybe_dup, exact_dup
FROM hit JOIN exact USING (doc_id) ORDER BY doc_id
"""


_BLOOM_PREFILTER_SQL = _bloom_sql()


def _bloom_gate(s: SparkSession, sf: str) -> DataFrame:
    """Bloom prefilter over a planted incoming batch: every-5th doc
    verbatim (guaranteed hits) plus doc_id%5==1 shifted +100000 with
    mutated text (guaranteed misses modulo Bloom false positives)."""
    docs = _t(s, sf, "documents")
    incoming = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text").unionAll(
        docs.filter(F.col("doc_id") % 5 == 1).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" bloomprobe")).alias("text"),
        )
    )
    return dedup.bloom_prefilter(docs, incoming)


def _cms_sql(depth: int = 4, width: int = 256) -> str:
    """Count-min sketch replay: same per-row md5 slice columns, same
    grid partial-sum, same min-over-rows estimate — all integers."""

    def col_expr(r: int) -> str:
        seed = "'cms" + str(r) + ":' || token"
        return f"({_hexfold(seed, 1, 4)}) % {width}"

    cells = "\n  UNION ALL ".join(
        f"SELECT c, {r} AS r, {col_expr(r)} AS col FROM cnts"
        for r in range(depth)
    )
    probes = "\n  UNION ALL ".join(
        f"SELECT token, c, {r} AS r, {col_expr(r)} AS col FROM top"
        for r in range(depth)
    )
    return f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
cnts AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
cells AS (
  {cells}),
grid AS (SELECT r, col, CAST(sum(c) AS BIGINT) AS cell
         FROM cells GROUP BY r, col),
top AS (SELECT token, c FROM cnts ORDER BY c DESC, token LIMIT 20),
probe AS (
  {probes})
SELECT token,
       CAST(max(c) AS BIGINT) AS c_exact,
       CAST(min(cell) AS BIGINT) AS c_est
FROM probe JOIN grid USING (r, col)
GROUP BY token ORDER BY c_exact DESC, token
"""


_CMS_FREQ_SQL = _cms_sql()

_NGRAM_NOVELTY_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3
),
firsts AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN first_doc < sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
       CAST(count(*) - sum(CASE WHEN first_doc < sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS novelty
FROM sh JOIN firsts ON sh.s = firsts.s
GROUP BY sh.doc_id
ORDER BY sh.doc_id
"""

# hex→int via the strpos fold (no conv() in DuckDB); 12 hex chars = 48
# bits — exact in BIGINT and double, so the estimate is deterministic.
_KMV_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
hs AS (
  SELECT DISTINCT md5(s) AS h FROM (
    SELECT unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
    FROM toks WHERE len(w) >= 3)
),
sk AS (SELECT count(*) AS n_sketch, max(h) AS kth
       FROM (SELECT h FROM hs ORDER BY h LIMIT 64)),
est AS (
  SELECT CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
              ELSE 63.0 / (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split(substr(kth, 1, 12), ''),
                       c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
                     (a, x) -> a * 16 + x) AS DOUBLE) / 281474976710656.0)
         END AS kmv_estimate
  FROM sk)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM hs) AS n_exact,
       CAST(64 AS BIGINT) AS k,
       kmv_estimate,
       (kmv_estimate - (SELECT CAST(count(*) AS DOUBLE) FROM hs))
         / (SELECT CAST(count(*) AS DOUBLE) FROM hs) AS rel_err
FROM est
"""

# HyperLogLog replay: same md5 split (2 hex chars → register, 12 hex
# chars → 48-bit tail), same string-only first-1-bit rank (no log2,
# no bit intrinsics), same exact-integer Z·2^49, same literal-constant
# estimate chain — bit-identical IEEE doubles, zero tolerance.
_HLL_SQL = """
WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3
),
hx AS (SELECT md5(s) AS h FROM sh),
rr AS (
  SELECT CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(substr(h, 1, 2), ''),
             c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
           (a, x) -> a * 16 + x) AS INTEGER) AS reg,
         regexp_replace(substr(h, 3, 12), '^0+', '') AS stripped
  FROM hx
),
regs AS (
  SELECT reg,
         max(CASE WHEN length(stripped) = 0 THEN 49
                  ELSE 49 - ((length(stripped) - 1) * 4 +
                             CASE WHEN substr(stripped, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 4
                                  WHEN substr(stripped, 1, 1) IN ('4','5','6','7') THEN 3
                                  WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
                                  ELSE 1 END)
             END) AS rho
  FROM rr GROUP BY reg
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hit,
         CAST(sum(CAST(1 AS BIGINT) << (49 - rho)) AS BIGINT) AS z_hit
  FROM regs
),
est AS (
  SELECT n_hit,
         z_hit + (CAST(256 AS BIGINT) - n_hit) * (CAST(1 AS BIGINT) << 49) AS z_scaled
  FROM agg
),
raws AS (
  SELECT n_hit, z_scaled,
         (0.7213 / (1.0 + 1.079 / 256)) * 65536.0 * 562949953421312.0
           / CAST(z_scaled AS DOUBLE) AS hll_estimate
  FROM est
),
corr AS (
  SELECT n_hit, z_scaled, hll_estimate,
         CASE WHEN hll_estimate <= 640.0 AND (CAST(256 AS BIGINT) - n_hit) > 0
              THEN 256.0 * ln(256.0 / CAST(CAST(256 AS BIGINT) - n_hit AS DOUBLE))
              ELSE hll_estimate END AS hll_corrected
  FROM raws
)
SELECT (SELECT CAST(count(DISTINCT s) AS BIGINT) FROM sh) AS n_exact,
       CAST(256 AS BIGINT) AS m,
       n_hit,
       z_scaled,
       hll_estimate,
       hll_corrected,
       (hll_corrected - (SELECT CAST(count(DISTINCT s) AS DOUBLE) FROM sh))
         / (SELECT CAST(count(DISTINCT s) AS DOUBLE) FROM sh) AS rel_err
FROM corr
"""

_KMV_BY_SOURCE_SQL = """
WITH toks AS (SELECT source, string_split(text, ' ') AS w FROM documents),
hs AS (
  SELECT DISTINCT source, md5(s) AS h FROM (
    SELECT source,
           unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
    FROM toks WHERE len(w) >= 3)
),
sk AS (
  SELECT source, count(*) AS n_sketch, max(h) AS kth
  FROM (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hs)
  WHERE rn <= 32 GROUP BY source),
exact AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact FROM hs GROUP BY source),
est AS (
  SELECT source, n_sketch,
         CASE WHEN n_sketch < 32 THEN CAST(n_sketch AS DOUBLE)
              ELSE 31.0 / (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split(substr(kth, 1, 12), ''),
                       c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
                     (a, x) -> a * 16 + x) AS DOUBLE) / 281474976710656.0)
         END AS kmv_estimate
  FROM sk)
SELECT exact.source, n_exact, kmv_estimate,
       (kmv_estimate - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
FROM exact JOIN est ON exact.source = est.source
ORDER BY exact.source
"""

_DAILY_ANOMALY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, day, n,
       CAST(sum(n) OVER w7 AS DOUBLE) / CAST(count(*) OVER w7 AS DOUBLE) AS ma7,
       round(CASE WHEN stddev_samp(n) OVER wt IS NULL
                    OR stddev_samp(n) OVER wt = 0
                  THEN 0.0
                  ELSE (n - avg(n) OVER wt) / stddev_samp(n) OVER wt END,
             6) AS z
FROM daily
WINDOW w7 AS (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       wt AS (PARTITION BY event_type)
ORDER BY event_type, day
"""

_DQ_PROFILE_COLS = (
    "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
    "o_orderstatus", "o_totalprice",
)
_DQ_PROFILE_SQL = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name,\n"
    f"  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,\n"
    f"  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct\nFROM orders"
    for c in _DQ_PROFILE_COLS
) + "\nORDER BY col_name"

# NOT EXISTS + explicit NOT NULL, never NOT IN: NOT IN is NULL-poisoned
# (one NULL pk zeroes the whole check) and counts NULL fks the operator
# deliberately excludes (dbt relationship-test convention).
_DQ_ORPHANS_SQL = """
SELECT 'lineitem->orders' AS check, CAST(count(*) AS BIGINT) AS n_orphans
FROM lineitem l WHERE l_orderkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE l_partkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE l_suppkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'orders->customer', CAST(count(*) AS BIGINT)
FROM orders r WHERE o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = r.o_custkey)
ORDER BY "check"
"""

_DQ_DUPKEYS_SQL = """
WITH checks AS (
  SELECT 'customer.c_custkey' AS check, c_custkey::VARCHAR AS k FROM customer
  UNION ALL
  SELECT 'documents.doc_id', doc_id::VARCHAR FROM documents
  UNION ALL
  SELECT 'lineitem.(orderkey,linenumber)',
         l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR FROM lineitem
  UNION ALL
  SELECT 'orders.o_orderkey', o_orderkey::VARCHAR FROM orders),
g AS (SELECT "check", k, count(*) AS c FROM checks GROUP BY 1, 2 HAVING count(*) > 1),
names AS (SELECT DISTINCT "check" FROM checks)
SELECT names."check",
       CAST(coalesce(count(g.k), 0) AS BIGINT) AS n_duplicated_keys,
       CAST(coalesce(sum(g.c - 1), 0) AS BIGINT) AS n_surplus_rows
FROM names LEFT JOIN g ON names."check" = g."check"
GROUP BY names."check"
ORDER BY names."check"
"""

_CUMULATIVE_REACH_SQL = """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS day
  FROM events GROUP BY user_id),
daily AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM firsts GROUP BY day)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cumulative_users
FROM daily ORDER BY day
"""

_GAP_FILL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
spine AS (
  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1))
SELECT spine.event_type, CAST(spine.day AS TIMESTAMP) AS day,
       CAST(coalesce(daily.n, 0) AS BIGINT) AS n
FROM spine LEFT JOIN daily
  ON spine.event_type = daily.event_type AND spine.day = daily.day
ORDER BY spine.event_type, spine.day
"""

_PPS_SAMPLE_SQL = """
WITH base AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM base),
cum AS (SELECT doc_id, w, CAST(sum(w) OVER (ORDER BY doc_id) AS BIGINT) AS c FROM base),
m AS (
  SELECT doc_id, w,
         greatest(0, least(100, (200 * c + tw - 1) // (2 * tw)))
       - greatest(0, least(100, (200 * (c - w) + tw - 1) // (2 * tw))) AS multiplicity
  FROM cum, tot)
SELECT doc_id, w, CAST(multiplicity AS BIGINT) AS multiplicity
FROM m WHERE multiplicity > 0
ORDER BY doc_id
"""

_TFIDF_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
n AS (SELECT count(*) AS n_docs FROM documents),
dfc AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok WHERE doc_id < 50
       GROUP BY doc_id, token),
scored AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfc.df AS DOUBLE)) AS tfidf
  FROM tf JOIN dfc ON tf.token = dfc.token, n
)
SELECT doc_id, token, round(tfidf, 9) AS tfidf, rk FROM (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
  FROM scored) t
WHERE rk <= 3
ORDER BY doc_id, rk
"""


def _simhash_sql(max_hamming: int = 12) -> str:
    """DuckDB twin of dedup.simhash_near_pairs: per-token md5 hex-digit
    bit votes -> 16-hex-char signature -> quarter-banded candidates ->
    exact per-digit popcount Hamming."""
    hexs = "0123456789abcdef"
    sums = ",\n         ".join(
        f"sum(CASE WHEN ((instr('{hexs}', substr(h, {p}, 1)) - 1) >> {b}) & 1 = 1"
        f" THEN 1 ELSE -1 END) AS v{(p - 1) * 4 + b}"
        for p in range(1, 17)
        for b in range(4)
    )
    digit = " + ".join
    out_digits = " || ".join(
        "substr('{hexs}', 1 + {val}, 1)".format(
            hexs=hexs,
            val=digit(
                f"(CASE WHEN v{(p - 1) * 4 + b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(4)
            ),
        )
        for p in range(1, 17)
    )
    hamming = " + ".join(
        f"bit_count(xor(instr('{hexs}', substr(sa, {p}, 1)) - 1,"
        f" instr('{hexs}', substr(sb, {p}, 1)) - 1))"
        for p in range(1, 17)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents WHERE doc_id < 300
),
hx AS (SELECT doc_id, md5(t) AS h FROM toks),
sums AS (
  SELECT doc_id,
         {sums}
  FROM hx GROUP BY doc_id
),
sig AS (SELECT doc_id, {out_digits} AS simhash FROM sums),
quarters AS (
  SELECT doc_id, simhash, q, substr(simhash, q * 4 + 1, 4) AS qh
  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS q)
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sa, b.simhash AS sb
  FROM quarters a JOIN quarters b
    ON a.q = b.q AND a.qh = b.qh AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, CAST({hamming} AS INT) AS hamming FROM pairs) t
WHERE hamming <= {max_hamming}
ORDER BY doc_a, doc_b
"""


_SIMHASH_SQL = _simhash_sql()


def _knn_join_query(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    out = similarity.knn_join_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=5)
    return out.select("qid", "cid", "cosine", "rk")


def _sim_topk_query(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk_bruteforce(emb, [float(x) for x in qvec], k=10)


def _sim_topk_lsh_query(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk_lsh(emb, [float(x) for x in qvec], k=10, bits=4)


def _sem_decontam_query(spark: SparkSession, sf: str) -> DataFrame:
    """Held-out suite = vec_id < 20 (same bounded-query-side convention
    as sim_knn_join's vec_id < 5); τ=0.35 matches the near-dup gates'
    threshold and flags ~5% of the corpus at both gate scales (q95 of
    the max-cosine distribution — measured, not guessed)."""
    return similarity.semantic_decontaminate(
        _t(spark, sf, "embeddings"), n_heldout=20, threshold=0.35
    )


_SEM_DECONTAM_SQL = similarity.semantic_decontaminate_oracle_sql(
    n_heldout=20, threshold=0.35
)


def _mmr_rerank_query(spark: SparkSession, sf: str) -> DataFrame:
    """Query = vec 0 (the sim_cosine_topk convention), candidates =
    exact top-20 excluding the query, select 5 at λ=0.7 (the paper's
    relevance-leaning default)."""
    emb = _t(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.mmr_rerank(
        emb, [float(x) for x in qvec], n_candidates=20, n_select=5, lam=0.7
    )


_MMR_RERANK_SQL = similarity.mmr_rerank_oracle_sql(
    n_candidates=20, n_select=5, lam=0.7
)


_KCENTER_SQL = similarity.kcenter_coreset_oracle_sql(m=8, seed_id=0)


def _retrieval_metrics_query(spark: SparkSession, sf: str) -> DataFrame:
    """Queries = vec_id < 5 (the sim_knn_join convention), candidate
    lists = exact top-20 by cosine, relevance = same label as the
    query (each label holds ~10% of the corpus, so n_rel_total ≈ 50
    at gate scale — recall@10 is a real fraction, never saturated)."""
    from sqlstreamstore_spark.analytics import evaluation as _ev

    emb = _t(spark, sf, "embeddings")
    lab = emb.select("vec_id", "label")
    ranked = similarity.knn_join_bruteforce(
        emb, emb.filter(F.col("vec_id") < 5), k=20
    )
    rel = (
        ranked.join(
            lab.select(F.col("vec_id").alias("cid"), F.col("label").alias("cl")),
            "cid",
        )
        .join(
            lab.select(F.col("vec_id").alias("qid"), F.col("label").alias("ql")),
            "qid",
        )
        .select(
            "qid", "rk",
            F.when(F.col("cl") == F.col("ql"), 1).otherwise(0).alias("rel"),
        )
    )
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("ql")
    )
    tot = (
        emb.crossJoin(F.broadcast(qs))
        .filter((F.col("label") == F.col("ql")) & (F.col("vec_id") != F.col("qid")))
        .groupBy("qid")
        .agg(F.count("*").cast("long").alias("n_rel_total"))
    )
    return _ev.retrieval_metrics(rel, tot, k=10)


_RETRIEVAL_METRICS_SQL = """
WITH qs AS MATERIALIZED (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
  FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT qs.qid, qs.ql, e.vec_id AS cid, e.label AS cl,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), qs.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(qs.qv, qs.qv))) AS cosine
  FROM embeddings e, qs WHERE e.vec_id <> qs.qid),
ranked AS (
  SELECT qid, CASE WHEN cl = ql THEN 1 ELSE 0 END AS rel, rk FROM (
    SELECT qid, ql, cl, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
    FROM scored) t
  WHERE rk <= 20),
per AS (
  SELECT qid,
         min(CASE WHEN rel = 1 THEN rk END) AS first0,
         count(*) FILTER (WHERE rel = 1 AND rk <= 10) AS hits,
         sum(CASE WHEN rel = 1 AND rk <= 10
                  THEN 1.0 / log2(CAST(rk AS DOUBLE) + 1.0) ELSE 0.0 END) AS dcg
  FROM ranked GROUP BY qid),
tot AS MATERIALIZED (
  SELECT q.qid, CAST(count(*) AS BIGINT) AS n_rel_total
  FROM embeddings e, qs q
  WHERE e.label = q.ql AND e.vec_id <> q.qid GROUP BY q.qid),
nums AS (SELECT unnest(range(1, 11)) AS i),
idcg AS (
  -- range() can't take lateral column args in this DuckDB build:
  -- theta-join a static 1..k numbers CTE instead
  SELECT t.qid, sum(1.0 / log2(CAST(n.i AS DOUBLE) + 1.0)) AS v
  FROM tot t JOIN nums n ON n.i <= greatest(1, least(10, t.n_rel_total))
  GROUP BY t.qid)
SELECT p.qid, t.n_rel_total,
       CAST(coalesce(p.first0, 0) AS BIGINT) AS first_rel_rank,
       CASE WHEN p.first0 IS NULL THEN 0.0
            ELSE 1.0 / CAST(p.first0 AS DOUBLE) END AS mrr,
       CAST(p.hits AS DOUBLE) / 10.0 AS precision_at_k,
       CAST(p.hits AS DOUBLE) / CAST(t.n_rel_total AS DOUBLE) AS recall_at_k,
       CASE WHEN t.n_rel_total = 0 THEN 0.0
            ELSE round(p.dcg / i.v, 6) END AS ndcg_at_k
FROM per p JOIN tot t ON p.qid = t.qid JOIN idcg i ON p.qid = i.qid
ORDER BY p.qid
"""


_INTERVAL_OVERLAP_SQL = """
WITH a AS (
  SELECT event_id AS a_event_id, user_id AS a_user, ts AS a_s,
         ts + INTERVAL '30 minutes' AS a_e
  FROM events WHERE event_type = 'error'
),
b AS (
  SELECT event_id AS b_event_id, user_id AS b_user, ts AS b_s,
         ts + INTERVAL '45 minutes' AS b_e
  FROM events WHERE event_type = 'purchase'
)
SELECT a_event_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM a JOIN b ON a_user = b_user AND a_s <= b_e AND b_s <= a_e
GROUP BY a_event_id
ORDER BY a_event_id
"""


def _interval_overlap_query(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_event_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("a_e"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_event_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_s"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("b_e"),
    )
    pairs = asof.interval_overlap_join(
        a, b, "a_user", "b_user", "a_s", "a_e", "b_s", "b_e", bucket_secs=1_800
    )
    return (
        pairs.groupBy("a_event_id")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
        .orderBy("a_event_id")
    )


def _hll_rho_case(stripped: str) -> str:
    """DuckDB CASE replaying `text._hll_rho`: first-1-bit rank of a
    12-hex-char tail from its leading-zero-stripped form."""
    return f"""CASE WHEN length({stripped}) = 0 THEN 49
         ELSE 49 - ((length({stripped}) - 1) * 4 +
                    CASE WHEN substr({stripped}, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 4
                         WHEN substr({stripped}, 1, 1) IN ('4','5','6','7') THEN 3
                         WHEN substr({stripped}, 1, 1) IN ('2','3') THEN 2
                         ELSE 1 END)
    END"""


_ROLLING_DISTINCT_SQL = """
WITH hu AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
hours AS (SELECT DISTINCT h FROM hu),
contrib AS (
  SELECT DISTINCT hu.h + o.off AS hour_epoch, user_id
  FROM hu CROSS JOIN (SELECT unnest(range(0, 24)) AS off) o
)
SELECT hour_epoch, CAST(count(*) AS BIGINT) AS n_users
FROM contrib JOIN hours ON contrib.hour_epoch = hours.h
GROUP BY hour_epoch
ORDER BY hour_epoch
"""

# Rolling-HLL replay: per-hour register build, trailing-window
# union+max merge, exact-integer estimate — the bounded-state twin.
_ROLLING_HLL_SQL = f"""
WITH base AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         md5(CAST(user_id AS VARCHAR)) AS hh
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
rr AS (
  SELECT h,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(substr(hh, 1, 2), ''),
             c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
           (a, x) -> a * 16 + x) AS INTEGER) AS reg,
         regexp_replace(substr(hh, 3, 12), '^0+', '') AS stripped
  FROM base
),
regs AS (
  SELECT h, reg, max({_hll_rho_case("stripped")}) AS rho
  FROM rr GROUP BY h, reg
),
hours AS (SELECT DISTINCT h FROM base),
merged AS (
  SELECT regs.h + o.off AS hour_epoch, reg, max(rho) AS rho
  FROM regs CROSS JOIN (SELECT unnest(range(0, 24)) AS off) o
  GROUP BY hour_epoch, reg
),
agg AS (
  SELECT hour_epoch, CAST(count(*) AS BIGINT) AS n_hit,
         CAST(sum(CAST(1 AS BIGINT) << (49 - rho)) AS BIGINT) AS z_hit
  FROM merged GROUP BY hour_epoch
),
est AS (
  SELECT hour_epoch, n_hit,
         z_hit + (CAST(256 AS BIGINT) - n_hit) * (CAST(1 AS BIGINT) << 49) AS z_scaled
  FROM agg
),
raws AS (
  SELECT hour_epoch, n_hit, z_scaled,
         (0.7213 / (1.0 + 1.079 / 256)) * 65536.0 * 562949953421312.0
           / CAST(z_scaled AS DOUBLE) AS raw
  FROM est
)
SELECT r.hour_epoch, n_hit, z_scaled,
       round(CASE WHEN raw <= 640.0 AND (CAST(256 AS BIGINT) - n_hit) > 0
                  THEN 256.0 * ln(256.0 / CAST(CAST(256 AS BIGINT) - n_hit AS DOUBLE))
                  ELSE raw END, 6) AS hll_users
FROM raws r JOIN hours ON r.hour_epoch = hours.h
ORDER BY r.hour_epoch
"""


# Per-source entropy replay: the unigram_logprob sorted-sequential-
# fold discipline (every libm call on an exact integer, identical fold
# order, round(7) outputs).
_ENTROPY_SQL = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
cnts AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
         FROM tok GROUP BY source, token),
terms AS (
  SELECT source, list_sort(list({'c': c})) AS ts,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab
  FROM cnts GROUP BY source),
folded AS (
  SELECT source, n_tokens, vocab,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(ts, t -> CAST(t.c AS DOUBLE) * ln(CAST(t.c AS DOUBLE)))),
           (a, x) -> a + x) AS s
  FROM terms)
SELECT source, n_tokens, vocab,
       round(ln(CAST(n_tokens AS DOUBLE)) - s / CAST(n_tokens AS DOUBLE), 7) AS entropy,
       round(CASE WHEN vocab > 1
                  THEN (ln(CAST(n_tokens AS DOUBLE)) - s / CAST(n_tokens AS DOUBLE))
                       / ln(CAST(vocab AS DOUBLE))
                  ELSE 0.0 END, 7) AS entropy_norm
FROM folded ORDER BY source
"""


# Temperature-mixture replay: same pow/share/threshold chain; the one
# libm product is rounded to 6 dp on both engines before the floor.
_TEMPERATURE_MIXTURE_SQL = f"""
WITH toks AS (
  SELECT source AS src,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ({_hexfold("CAST(doc_id AS VARCHAR)", 1, 4)}) % 65536 AS hb
  FROM documents
),
totals AS (
  SELECT src, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM toks GROUP BY src
),
denom AS (
  SELECT sum(pow(CAST(total_tokens AS DOUBLE), 0.7)) AS denom FROM totals
),
rates AS (
  SELECT src, total_tokens, n_docs,
         pow(CAST(total_tokens AS DOUBLE), 0.7) / denom AS q
  FROM totals, denom
),
thr AS (
  SELECT src, total_tokens, n_docs, q,
         least(CAST(65536 AS BIGINT),
               CAST(floor(round(50000.0 * q / CAST(total_tokens AS DOUBLE)
                                * 65536.0, 6)) AS BIGINT)) AS threshold
  FROM rates
)
SELECT t.src,
       max(thr.total_tokens) AS total_tokens,
       max(thr.n_docs) AS n_docs,
       round(max(thr.q), 9) AS q,
       max(thr.threshold) AS threshold,
       CAST(sum(CASE WHEN t.hb < thr.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(sum(CASE WHEN t.hb < thr.threshold THEN t.n_tokens ELSE 0 END) AS BIGINT) AS tokens_selected
FROM toks t JOIN thr ON t.src = thr.src
GROUP BY t.src
ORDER BY t.src
"""

_VOCAB_GROWTH_SQL = """
WITH n AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n FROM documents),
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
firsts AS (
  SELECT token, min(doc_id) AS first_doc FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(w) - 1),
                                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS token
    FROM toks WHERE len(w) >= 3) t
  GROUP BY token
),
per_bucket AS (
  SELECT (first_doc * 50) // n.n AS bucket,
         CAST(count(*) AS BIGINT) AS n_new_tokens
  FROM firsts, n GROUP BY 1
)
SELECT bucket, n_new_tokens,
       CAST(sum(n_new_tokens) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum
FROM per_bucket
ORDER BY bucket
"""

_SESSION_TABLE_SQL = """
WITH base AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN gap IS NULL OR gap > 1800 * 1000000 THEN 1 ELSE 0 END AS brk
  FROM base
),
numbered AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       min(us) AS start_us, max(us) AS end_us,
       max(us) - min(us) AS duration_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM numbered GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""

_FUNNEL_WINDOWED_SQL = """
WITH s1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY user_id
  HAVING min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) IS NOT NULL
),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > s1.t_signup
    AND epoch_us(e.ts) <= s1.t_signup + CAST(7 AS BIGINT) * 86400 * 1000000
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > s2.t_click
    AND epoch_us(e.ts) <= s2.t_click + CAST(7 AS BIGINT) * 86400 * 1000000
  GROUP BY e.user_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_w,
       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_w
"""

_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events WHERE ts IS NOT NULL
),
chg AS (
  SELECT user_id, event_id, ts, event_type FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       coalesce(epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)),
                CAST(-1 AS BIGINT)) AS valid_to_us
FROM chg
ORDER BY user_id, valid_from_us, event_type
"""

_WEIGHTED_MEDIAN_SQL = """
WITH base AS (
  SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w
  FROM documents WHERE n_chars IS NOT NULL
),
cum AS (
  SELECT g, v,
         sum(w) OVER (PARTITION BY g ORDER BY v, w
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
         sum(w) OVER (PARTITION BY g) AS total_w
  FROM base
)
SELECT g AS source,
       CAST(max(total_w) AS BIGINT) AS total_w,
       CAST(min(v) AS BIGINT) AS wmedian
FROM cum WHERE 2 * cum_w >= total_w
GROUP BY g ORDER BY source
"""


# EWMA closed-form replay: per-user quadratic self-join (gate scale
# only — the engine path is the stable pandas recurrence). Both engines
# round to 4 decimals: the recurrence-vs-closed-form double drift is
# ~1e-12 absolute, so a 1e-4 grid makes boundary flips ~1-in-10^8/row.
_EWMA_SQL = """
WITH e AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
)
SELECT a.user_id, a.event_id,
       round(sum(b.value * pow(0.75, a.rn - b.rn))
             / sum(pow(0.75, a.rn - b.rn)), 4) AS ewma
FROM e a JOIN e b ON a.user_id = b.user_id AND b.rn <= a.rn
GROUP BY a.user_id, a.event_id
ORDER BY a.user_id, a.event_id
"""


def _events_ewma_query(spark: SparkSession, sf: str) -> DataFrame:
    out = events.ewma_value(_t(spark, sf, "events"), alpha=0.25)
    return _round_cols(out, ("ewma",), 4).orderBy("user_id", "event_id")


_RANGE_JOIN_SQL = """
WITH errors AS (
  SELECT event_id AS error_event_id, user_id, ts AS w_start,
         ts + INTERVAL '1 hour' AS w_end
  FROM events WHERE event_type = 'error'
)
SELECT error_event_id, count(*) AS n_events_within_hour
FROM errors e JOIN events ev
  ON ev.user_id = e.user_id AND ev.ts >= e.w_start AND ev.ts <= e.w_end
GROUP BY error_event_id
ORDER BY error_event_id
"""


def _bucketed_join_query(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib

    from sqlstreamstore_spark.sources.bucketed import (
        bucketed_join_revenue,
        build_bucketed_pair,
    )

    suffix = hashlib.md5(sf.encode()).hexdigest()[:10]
    base = _scratch(f"bucketed_{suffix}")
    lt, ot = build_bucketed_pair(
        spark, _t(spark, sf, "lineitem"), _t(spark, sf, "orders"), base,
        suffix=suffix,
    )
    return bucketed_join_revenue(spark, lt, ot)


def _range_join_query(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    joined = asof.range_join_bucketed(
        ev.select("user_id", "ts"),
        errors,
        left_key="user_id",
        right_key="err_user",
        left_time="ts",
        right_start="w_start",
        right_end="w_end",
        bucket="1 hour",
    )
    return (
        joined.groupBy("error_event_id")
        .agg(F.count("*").alias("n_events_within_hour"))
        .orderBy("error_event_id")
    )


def _asof_query(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    orders = _t(spark, sf, "orders")
    order_days = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("day_total")
    )
    out = asof.asof_join(
        ev.select("event_id", "user_id", "ts"),
        order_days,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["day_total"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("__asof_time").alias("last_order_date"), "day_total",
    ).orderBy("event_id")


_SALTED_JOIN_SQL = """
SELECT c.c_nationkey,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


def _salted_join_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.operators.skew import salted_join

    joined = salted_join(
        _t(spark, sf, "orders"),
        _t(spark, sf, "customer").select("c_custkey", "c_nationkey"),
        left_key="o_custkey",
        right_key="c_custkey",
    )
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total"),
        )
        .orderBy("c_nationkey")
    )


def _salted_topk_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.operators.skew import topk_per_key_salted

    return (
        topk_per_key_salted(
            _t(spark, sf, "orders"),
            key_cols=["o_custkey"],
            order_col="o_totalprice",
            k=3,
            tiebreak_col="o_orderkey",
        )
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    )


def _ann_recall_report(
    spark: SparkSession, got: DataFrame, want: DataFrame, k: int, bound: float
) -> DataFrame:
    """recall@k of an ANN result vs its brute-force twin, pinned as an
    INEQUALITY gate (round 11, VERDICT r10 #3): the oracle can't run
    the quantizer, but it CAN pin `recall >= bound` — the property an
    ANN deployment actually guarantees. Output hash-matches the VALUES
    oracle iff the inequality holds; a recall regression flips
    recall_ok and goes red. Exact per-row values for these families
    remain fully oracled by the *_static/_index gate variants."""
    hits = got.join(want, "vec_id", "inner").count()
    return spark.createDataFrame(
        [(0, k, float(bound), hits >= bound * k)],
        "q_vec_id long, k int, bound double, recall_ok boolean",
    )


def _sim_topk_ivf_query(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    ]
    got = similarity.cosine_topk_ivf(
        emb, qvec, k=10, n_clusters=8, n_probe=4, iters=2
    ).select("vec_id")
    want = similarity.cosine_topk_bruteforce(emb, qvec, k=10).select("vec_id")
    # measured recall 0.9-1.0 across sf0.001/sf0.01; bound 0.6 leaves
    # real margin while still failing a broken quantizer or probe
    return _ann_recall_report(spark, got, want, k=10, bound=0.6)


def _sim_topk_ivf_static_query(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk_ivf_static(
        emb, [float(x) for x in qvec], k=10, n_clusters=8, n_probe=4
    )


def _sim_knn_ivf_batch_query(spark: SparkSession, sf: str) -> DataFrame:
    """Batched multi-query ANN (VERDICT r5 #2): 5 query vectors as a
    DataFrame, each probing its 4 nearest static-centroid lists,
    broadcast-equi-joined on cluster_id, per-query top-5 via the
    rank-limit-pushed window. knn_join_bruteforce is the exact twin."""
    emb = _t(spark, sf, "embeddings")
    return similarity.knn_join_ivf_static(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_clusters=8, n_probe=4
    )


_IVF_INDEX_CACHE: dict[str, list] = {}


def _sim_topk_ivf_index_query(spark: SparkSession, sf: str) -> DataFrame:
    """The deployed-index path: materialize the cluster_id-partitioned
    index once per sf (driver calls repeat), then probe it with
    partition pruning. Same results as cosine_topk_ivf_static — shares
    its oracle."""
    import hashlib

    emb = _t(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    path = _scratch("ivf_index_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    cents = _IVF_INDEX_CACHE.get(path)
    if cents is None:
        cents = similarity.build_ivf_index(emb, path, n_clusters=8)
        _IVF_INDEX_CACHE[path] = cents
    return similarity.cosine_topk_ivf_index(
        spark, path, [float(x) for x in qvec], cents, k=10, n_probe=4
    )


def _sim_topk_ivf_upsert_query(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental index maintenance: build the partitioned IVF index
    over 80% of the corpus, UPSERT the other 20% into the existing
    partition layout (O(new) work, no list rewrites), then probe. The
    result must equal a query over an index holding the FULL corpus —
    so it shares the static twin's oracle (merge == rebuild, made
    driver-checkable)."""
    import os
    import shutil
    import tempfile

    emb = _t(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    path = os.path.join(tempfile.mkdtemp(prefix="sss-ivf-upsert-"), "index")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    cents = similarity.build_ivf_index(base, path, n_clusters=8)
    similarity.upsert_ivf_index(delta, path, cents)
    out = similarity.cosine_topk_ivf_index(
        spark, path, [float(x) for x in qvec], cents, k=10, n_probe=4
    )
    # materialize before the temp dir can be cleaned up by the OS later;
    # the frame is 10 rows
    rows = out.collect()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def _sim_ivf_health_query(spark: SparkSession, sf: str) -> DataFrame:
    """IVF index lifecycle monitoring (round 10, VERDICT r9 #5): the
    per-list skew/staleness report over the materialized static-centroid
    index — shares the cached index with sim_cosine_topk_ivf_index."""
    import hashlib

    emb = _t(spark, sf, "embeddings")
    path = _scratch("ivf_index_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    cents = _IVF_INDEX_CACHE.get(path)
    if cents is None:
        cents = similarity.build_ivf_index(emb, path, n_clusters=8)
        _IVF_INDEX_CACHE[path] = cents
    return similarity.ivf_index_health(spark, path, cents)


def _sim_ivf_rebalanced_query(spark: SparkSession, sf: str) -> DataFrame:
    """IVF REBALANCE (round 10, VERDICT r9 #5): build on 80%, upsert
    20%, then retrain the quantizer on the index's own vectors and
    rewrite (rebalance_ivf_index). The full-probe query afterwards must
    equal BRUTE-FORCE top-k — centroid-independent, so the oracle needs
    no k-means: a correct rebalance preserves contents exactly and only
    relabels lists."""
    import os
    import shutil
    import tempfile

    emb = _t(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    path = os.path.join(tempfile.mkdtemp(prefix="sss-ivf-rebal-"), "index")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    cents = similarity.build_ivf_index(base, path, n_clusters=8)
    similarity.upsert_ivf_index(delta, path, cents)
    new_cents = similarity.rebalance_ivf_index(spark, path, n_clusters=8, iters=2)
    out = similarity.cosine_topk_ivf_index(
        spark, path, [float(x) for x in qvec], new_cents, k=10, n_probe=8
    )
    rows = out.collect()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


_CHUNK_SQL = """
WITH sized AS (
  SELECT doc_id, text,
         greatest(1, CAST(ceil(length(text) / 150.0) AS BIGINT)) AS k
  FROM documents)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       md5(substring(text, CAST(i AS INTEGER) * 150 + 1, 200)) AS chunk_md5,
       CAST(length(substring(text, CAST(i AS INTEGER) * 150 + 1, 200)) AS BIGINT) AS chunk_len
FROM sized CROSS JOIN UNNEST(range(0, k)) AS u(i)
ORDER BY doc_id, chunk_idx
"""

_STRATIFIED_SQL = f"""
SELECT doc_id, source FROM documents
WHERE {_HEXBUCKET} % 65536 <
      CASE source WHEN 'src0' THEN 65536 WHEN 'src1' THEN 32768
                  WHEN 'src2' THEN 16384 WHEN 'src3' THEN 8192
                  ELSE 4096 END
ORDER BY doc_id
"""

_SCRUB_PAT = r"\b(the|a|and|of|to|in|is|for|on|with)\b"
_SCRUB_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_SCRUB_PAT}')) AS BIGINT) AS n_redacted,
       md5(regexp_replace(text, '{_SCRUB_PAT}', '<W>', 'g')) AS scrubbed_md5,
       CAST(length(regexp_replace(text, '{_SCRUB_PAT}', '<W>', 'g')) AS BIGINT) AS scrubbed_len
FROM documents ORDER BY doc_id
"""

_INCREMENTAL_NEW_SQL = f"""
WITH split AS (
  SELECT doc_id, text,
         CASE WHEN {_HEXBUCKET} % 65536 < CAST(0.9 * 65536 AS INTEGER)
              THEN 'train' ELSE 'val' END AS split
  FROM documents)
SELECT s.doc_id FROM split s
WHERE s.split = 'val' AND NOT EXISTS (
  SELECT 1 FROM split t WHERE t.split = 'train' AND md5(t.text) = md5(s.text))
ORDER BY s.doc_id
"""

_Q2_MIN_COST_SQL = """
WITH supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
costs AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS unit_cost
  FROM lineitem JOIN (SELECT p_partkey FROM part WHERE p_type = 'PROMO') p
                  ON l_partkey = p_partkey
                JOIN supp ON l_suppkey = s_suppkey
  GROUP BY 1, 2, 3, 4, 5)
SELECT s_acctbal, s_name, n_name, p_partkey, min_cost
FROM costs JOIN (SELECT p_partkey AS m_partkey, min(unit_cost) AS min_cost
                 FROM costs GROUP BY 1) m
  ON p_partkey = m_partkey AND unit_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 50
"""

_Q12_PRIORITY_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

_Q16_SUPPLIER_CNT_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

_Q21_WAITING_SQL = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  GROUP BY 1, 2),
per_order AS (
  SELECT l_orderkey AS o_key, max(supp_last) AS order_last,
         count(*) AS n_suppliers
  FROM per_supp GROUP BY 1),
marked AS (
  SELECT p.l_orderkey, p.l_suppkey, p.supp_last, o.order_last, o.n_suppliers,
         sum(CASE WHEN p.supp_last = o.order_last THEN 1 ELSE 0 END)
           OVER (PARTITION BY p.l_orderkey) AS n_at_last
  FROM per_supp p JOIN per_order o ON p.l_orderkey = o.o_key)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM marked
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE supp_last = order_last AND n_suppliers >= 2 AND n_at_last = 1
  AND n_name = 'NATION_1'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""

_Q22_GLOBAL_SALES_SQL = """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

_Q11_IMPORTANT_STOCK_SQL = """
WITH vals AS (
  SELECT l_partkey AS p_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey)
SELECT p_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM vals
WHERE value_dec > (SELECT sum(value_dec) FROM vals) * CAST(0.001 AS DECIMAL(6,4))
ORDER BY part_value DESC, p_partkey
"""

_Q20_DOMINANT_SUPP_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey),
totals AS (
  SELECT l_partkey, sum(supp_qty) AS part_qty FROM shipped GROUP BY l_partkey)
SELECT DISTINCT s_name
FROM shipped
JOIN totals USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1' AND supp_qty > part_qty * CAST(0.5 AS DECIMAL(2,1))
ORDER BY s_name
"""

_ORDER_GAPS_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate, o_orderkey) AS DATE),
                   CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap_days) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_gap_days,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days
FROM gaps JOIN customer ON o_custkey = c_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

_NTILE_DECILES_SQL = """
SELECT decile, CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM (SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders) t
GROUP BY decile
ORDER BY decile
"""

_CORR_REGR_SQL = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def _zorder_values_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.sources.zorder import z_values

    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long").alias("cents"),
    )
    return (
        z_values(o, "o_custkey", "cents", bits=16)
        .select("o_orderkey", "z")
        .orderBy("o_orderkey")
    )


def _zorder_oracle_sql() -> str:
    from sqlstreamstore_spark.sources.zorder import z_values_oracle_sql

    return z_values_oracle_sql(
        "zsrc", "o_custkey", "cents", "o_orderkey", bits=16,
        with_cte=(
            "zsrc AS (SELECT o_orderkey, o_custkey, "
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents "
            "FROM orders)"
        ),
    )


def _zorder3_values_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.sources.zorder import z_values_multi

    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long").alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
        .alias("epoch_day"),
    )
    return (
        z_values_multi(o, ["o_custkey", "cents", "epoch_day"])
        .select("o_orderkey", "z")
        .orderBy("o_orderkey")
    )


def _zorder3_oracle_sql() -> str:
    from sqlstreamstore_spark.sources.zorder import z_values_multi_oracle_sql

    return z_values_multi_oracle_sql(
        "zsrc3", ["o_custkey", "cents", "epoch_day"], "o_orderkey",
        with_cte=(
            "zsrc3 AS (SELECT o_orderkey, o_custkey, "
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents, "
            "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) "
            "AS epoch_day FROM orders)"
        ),
    )


_ZPS_A = (1, 60)           # o_custkey rectangle (selective at every gate sf)
_ZPS_B = (1_000_000, 20_000_000)  # cents rectangle


def _zorder_pruned_scan_query(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end proof the z-order layout PAYS OFF (r4 verdict #4):
    write a z-ordered table, prune buckets via the min/max manifest for
    a 2-D range predicate, assert pruning actually skipped buckets,
    and return the pruned-scan + filter rows — which must hash-match
    the oracle's FULL-scan + filter (the superset guarantee made
    observable). layout_zorder_values oracles the z VALUES; this row
    oracles the read path."""
    import os

    from sqlstreamstore_spark.sources.zorder import read_pruned, write_zordered

    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long").alias("cents"),
    )
    path = _scratch("zorder-pruned-" + os.path.basename(sf.rstrip("/")))
    write_zordered(o, path, "o_custkey", "cents", n_buckets=16)
    pruned, read, total = read_pruned(spark, path, _ZPS_A, _ZPS_B)
    if not 0 < read < total:
        raise AssertionError(f"stats pruning did not prune: read {read}/{total}")
    return (
        pruned.filter(
            F.col("o_custkey").between(*_ZPS_A) & F.col("cents").between(*_ZPS_B)
        )
        .select("o_orderkey", "o_custkey", "cents")
        .orderBy("o_orderkey")
    )


_ZPS_SQL = f"""
SELECT o_orderkey, o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
FROM orders
WHERE o_custkey BETWEEN {_ZPS_A[0]} AND {_ZPS_A[1]}
  AND CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        BETWEEN {_ZPS_B[0]} AND {_ZPS_B[1]}
ORDER BY o_orderkey
"""


def _incremental_rollup_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.incremental import (
        daily_rollup,
        merge_rollups,
        present_rollup,
    )

    ev = _t(spark, sf, "events")
    prev = daily_rollup(ev.filter(F.col("event_id") % 10 < 8))
    delta = daily_rollup(ev.filter(F.col("event_id") % 10 >= 8))
    return present_rollup(merge_rollups(prev, delta))


_INCR_ROLLUP_SQL = """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_k
FROM events
GROUP BY event_type, date_trunc('day', ts)
ORDER BY event_type, day
"""


def _drift_ks_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.drift import ks_drift

    ev = _t(spark, sf, "events")
    out = ks_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
    )
    # gate projection: the exact DECIMAL numerator casts to DOUBLE for
    # the hash compare (DuckDB's pandas bridge renders every DECIMAL as
    # float64; the operator itself stays integer-exact)
    return out.withColumn("d_num", F.col("d_num").cast("double"))


def _drift_ks_binned_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.drift import ks_drift_binned

    ev = _t(spark, sf, "events")
    # Gate accuracy is RANK-EXACT (>= pooled N at every gate sf): the GK
    # sketch then keeps every sample and query(q) returns exactly the
    # pooled value at sorted rank ceil(q*N), which the DuckDB twin
    # reproduces by rank selection (r4 verdict #2 — this row was
    # rows-only while the boundaries were engine-private). The plan is
    # identical to the production default (accuracy=10_000, pinned by
    # pytest invariants binned<=exact); only the sketch's epsilon moves.
    return ks_drift_binned(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        accuracy=10_000_000,
    )


def _rank_exact_bounds_cte(src: str, val_expr: str, n_bins: int) -> str:
    """DuckDB CTEs replaying Spark's percentile_approx at rank-exact
    accuracy: boundary i (1..n_bins-1) is the value at sorted rank
    ceil((i/n_bins)*N) — the float product/ceil is computed in DOUBLE on
    both engines (IEEE-identical), and duplicate ranks at small N keep
    their multiplicity (the bounds ARRAY always has n_bins-1 entries).
    Emits CTEs: pooled_n, ranked, ranks, bounds(bs)."""
    return f"""
pooled_n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM {src}),
ranked AS (SELECT {val_expr} AS v,
                  row_number() OVER (ORDER BY {val_expr}) AS rn
           FROM {src}),
ranks AS (SELECT i,
                 CAST(ceil((CAST(i AS DOUBLE) / {n_bins}) * cnt) AS BIGINT) AS r
          FROM range(1, {n_bins}) t(i), pooled_n),
bounds AS (SELECT list(v ORDER BY i) AS bs
           FROM ranks JOIN ranked ON ranked.rn = ranks.r)"""


def _drift_ks_binned_oracle(n_bins: int = 128) -> str:
    """Literal-free twin of the rank-exact-gate ks_drift_binned: same
    boundary rule, same strict v > bound binning, same integer-exact
    cumulative D (the drift_ks_exact DECIMAL pattern), same final
    double division."""
    bounds_cte = _rank_exact_bounds_cte("pooled", "v", n_bins)
    return f"""
WITH a AS (SELECT value AS v FROM events
           WHERE event_type = 'click' AND value IS NOT NULL),
b AS (SELECT value AS v FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL),
pooled AS (SELECT v FROM a UNION ALL SELECT v FROM b),
{bounds_cte},
binned AS (
  SELECT len(list_filter(bs, x -> CAST(v AS DOUBLE) > CAST(x AS DOUBLE))) AS bin,
         1 AS ca, 0 AS cb
  FROM a, bounds
  UNION ALL
  SELECT len(list_filter(bs, x -> CAST(v AS DOUBLE) > CAST(x AS DOUBLE))) AS bin,
         0 AS ca, 1 AS cb
  FROM b, bounds),
per_bin AS (SELECT bin, CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb
            FROM binned GROUP BY bin),
cum AS (SELECT bin,
               CAST(sum(na) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cna,
               CAST(sum(nb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cnb
        FROM per_bin),
tot AS (SELECT max(cna) AS n_a, max(cnb) AS n_b FROM cum)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(max(abs(CAST(cna AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
                    - CAST(cnb AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0))))
            AS DOUBLE)
         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_d
FROM cum CROSS JOIN tot
GROUP BY n_a, n_b
"""


def _ntile_deciles_approx_oracle() -> str:
    """Twin of the rank-exact-gate ntile_deciles_approx: decile =
    1 + count of boundaries strictly below the double-cast price, then
    the exact-NTILE aggregation conventions (BIGINT counts,
    DECIMAL(12,2) sum cast to DOUBLE at the end)."""
    bounds_cte = _rank_exact_bounds_cte(
        "orders", "CAST(o_totalprice AS DOUBLE)", 10
    )
    return f"""
WITH {bounds_cte.lstrip()}
SELECT decile, CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM (
  SELECT o_totalprice,
         CAST(1 + len(list_filter(bs, x -> CAST(o_totalprice AS DOUBLE) > x))
              AS INT) AS decile
  FROM orders, bounds) t
GROUP BY decile
ORDER BY decile
"""


def _drift_chi2_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.drift import chi2_drift

    ev = _t(spark, sf, "events")
    return chi2_drift(
        ev.filter(F.col("value") < 100), ev.filter(F.col("value") >= 100),
        "event_type",
    )


def _drift_ks_oracle() -> str:
    from sqlstreamstore_spark.analytics.drift import ks_drift_oracle_sql

    return ks_drift_oracle_sql(
        "event_type = 'click'", "event_type = 'purchase'", "value", "events")


_CHI2_DRIFT_SQL = """
WITH per_c AS (
  SELECT event_type AS v,
         CAST(sum(CASE WHEN value < 100 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM events WHERE event_type IS NOT NULL GROUP BY event_type),
tot AS (SELECT CAST(sum(na) AS DOUBLE) AS tot_a, CAST(sum(nb) AS DOUBLE) AS tot_b
        FROM per_c)
SELECT CAST(sum(na) AS BIGINT) AS n_a,
       CAST(sum(nb) AS BIGINT) AS n_b,
       CAST(count(*) AS BIGINT) AS n_categories,
       round(sum(
         pow(CAST(na AS DOUBLE) - (na + nb) * tot_a / (tot_a + tot_b), 2)
           / ((na + nb) * tot_a / (tot_a + tot_b))
         + pow(CAST(nb AS DOUBLE) - (na + nb) * tot_b / (tot_a + tot_b), 2)
           / ((na + nb) * tot_b / (tot_a + tot_b))), 6) AS chi2
FROM per_c CROSS JOIN tot
"""


_HIST_BOUNDS = [50.0 * i for i in range(1, 10)]  # 10 bins over value


def _incr_hist_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.incremental import (
        histogram_state,
        histogram_quantile_bins,
        merge_histogram_states,
    )

    ev = _t(spark, sf, "events")
    a = histogram_state(
        ev.filter(F.col("event_id") % 10 < 8), ["event_type"], "value", _HIST_BOUNDS)
    b = histogram_state(
        ev.filter(F.col("event_id") % 10 >= 8), ["event_type"], "value", _HIST_BOUNDS)
    merged = merge_histogram_states(a, b)
    return histogram_quantile_bins(merged, ["event_type"], 0.9).orderBy("event_type")


def _incr_hist_oracle() -> str:
    case_sum = " + ".join(
        f"(CASE WHEN value > {b} THEN 1 ELSE 0 END)" for b in _HIST_BOUNDS)
    return f"""
WITH state AS (
  SELECT event_type, CAST({case_sum} AS INTEGER) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM state)
SELECT event_type, CAST(bin AS INTEGER) AS q_bin,
       CAST(cum - n AS BIGINT) AS cum_below,
       CAST(n AS BIGINT) AS bin_n, CAST(total AS BIGINT) AS total
FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bin) AS rk
      FROM cum WHERE cum >= ceil(0.9 * total)) t
WHERE rk = 1 ORDER BY event_type
"""


def _corpus_diff_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.quality import corpus_diff

    docs = _t(spark, sf, "documents")
    # simulate two crawls: "old" is missing every 10th doc and has every
    # 7th doc's text perturbed; "new" is missing every 13th doc — all
    # four statuses (added/removed/changed/unchanged) are exercised
    old = docs.filter(F.col("doc_id") % 10 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("X")))
        .otherwise(F.col("text")),
    )
    new = docs.filter(F.col("doc_id") % 13 != 0)
    return corpus_diff(old, new)


_CORPUS_DIFF_SQL = """
WITH o AS (
  SELECT doc_id AS k,
         md5(text || CASE WHEN doc_id % 7 = 0 THEN 'X' ELSE '' END) AS dg
  FROM documents WHERE doc_id % 10 <> 0),
nn AS (SELECT doc_id AS k, md5(text) AS dg FROM documents WHERE doc_id % 13 <> 0)
SELECT status, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT CASE WHEN o.k IS NULL THEN 'added'
              WHEN nn.k IS NULL THEN 'removed'
              WHEN o.dg = nn.dg THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM o FULL OUTER JOIN nn ON o.k = nn.k) t
GROUP BY status ORDER BY status
"""


def _key_skew_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.quality import key_skew_report

    return key_skew_report(_t(spark, sf, "lineitem"), "l_orderkey")


_KEY_SKEW_SQL = """
WITH c AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
top AS (SELECT string_agg(k || ':' || c, ',' ORDER BY c DESC, k) AS tk
        FROM (SELECT * FROM c ORDER BY c DESC, k LIMIT 5))
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(c) AS BIGINT) AS max_key_rows,
       round(CAST(max(c) AS DOUBLE)
             / (CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6)
         AS skew_factor,
       (SELECT tk FROM top) AS top_keys
FROM c
"""


def _robust_outliers_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.quality import robust_outlier_bounds

    return robust_outlier_bounds(_t(spark, sf, "events"), "event_type", "value")


_ROBUST_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type AS g, quantile_cont(value, 0.5) AS med,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_type AS g, abs(e.value - m.med) AS adev, m.med, m.n
  FROM events e JOIN med m ON e.event_type = m.g),
mad AS (SELECT g, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY g)
SELECT d.g AS g, CAST(max(d.n) AS BIGINT) AS n,
       round(max(d.med), 9) AS median,
       round(max(md.mad), 9) AS mad,
       CAST(sum(CASE WHEN d.adev > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad md ON d.g = md.g
GROUP BY d.g ORDER BY d.g
"""


_BUDGETS = {"src0": 200, "src1": 10_000}  # src1 effectively unclamped


def _budget_mixture_query(spark: SparkSession, sf: str) -> DataFrame:
    return sampling.budget_mixture_sample(
        _t(spark, sf, "documents"), _BUDGETS, default_budget=400)


def _budget_mixture_oracle() -> str:
    cases = " ".join(
        f"WHEN source = '{s_}' THEN {b}" for s_, b in sorted(_BUDGETS.items()))
    return f"""
WITH toks AS (
  SELECT source AS src,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {_HEXBUCKET} % 65536 AS hb,
         CAST(CASE {cases} ELSE 400 END AS BIGINT) AS budget
  FROM documents),
thr AS (
  SELECT src, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(max(budget) AS BIGINT) AS budget,
         CAST(least(65536, (CAST(max(budget) AS HUGEINT) * 65536)
                    // CAST(sum(n_tokens) AS HUGEINT)) AS BIGINT) AS threshold
  FROM toks GROUP BY src)
SELECT t.src AS src,
       CAST(max(h.total_tokens) AS BIGINT) AS total_tokens,
       CAST(max(h.budget) AS BIGINT) AS budget,
       CAST(max(h.threshold) AS BIGINT) AS threshold,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN t.hb < h.threshold THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       CAST(sum(CASE WHEN t.hb < h.threshold THEN t.n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_selected
FROM toks t JOIN thr h ON t.src = h.src
GROUP BY t.src ORDER BY t.src
"""


# Top-k 3-event paths: double-LEAD trigram replay; the (n DESC, path)
# ordering is total so the cut is deterministic on both engines.
_TOP_PATHS_SQL = """
WITH tri AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT e1, e2, e3, count(*) AS n
FROM tri WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3
LIMIT 20
"""


# CUSUM change-point replay: the all-integer D*c - total deviation
# chain; window sums cast back to BIGINT (DuckDB widens to HUGEINT).
_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         count(*) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
t AS (
  SELECT *, count(*) OVER (PARTITION BY event_type) AS n_days,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM daily),
s AS (
  SELECT *, CAST(sum(n_days * c - total) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
  FROM t),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY event_type ORDER BY abs(cusum) DESC, day) AS rn
  FROM s)
SELECT event_type, day AS change_day, cusum, n_days, total
FROM r WHERE rn = 1 ORDER BY event_type
"""


# Hour-of-week seasonal profile replay: Monday=0 via isodow-1; share
# is one IEEE division of exact BIGINTs — no rounding needed.
_SEASONAL_SQL = """
WITH cells AS (
  SELECT event_type, CAST(isodow(ts) - 1 AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hod, count(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3)
SELECT event_type, dow, hod, n,
       CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS share,
       CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY n DESC, dow, hod) AS BIGINT) AS rank_in_type
FROM cells ORDER BY event_type, dow, hod
"""


# Linear-classifier inference replay: identical md5-derived weight per
# token, integer fold, one exact-BIGINT IEEE division at the end.
_CLASSIFIER_SQL = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ' '),
               t -> ({_hexfold("'clf:' || t", 1, 8)}) % 1001 - 500)),
           (a, x) -> a + x) AS score_num
  FROM documents)
SELECT doc_id, n_tokens, score_num,
       CAST(score_num AS DOUBLE) / n_tokens AS score,
       CASE WHEN score_num > 0 THEN 'keep' ELSE 'drop' END AS verdict
FROM scored ORDER BY doc_id
"""


# k-anonymity audit replay: bounded quasi-identifier axis, exact
# BIGINT share division.
_K_ANON_SQL = """
WITH cells AS (
  SELECT lang, source,
         CAST((n_chars // 100) * 100 AS BIGINT) AS chars_bucket,
         count(*) AS class_size
  FROM documents GROUP BY 1, 2, 3),
tot AS (SELECT count(*) AS total FROM documents)
SELECT lang, source, chars_bucket, class_size,
       class_size < 5 AS risky,
       CAST(class_size AS DOUBLE) / total AS share
FROM cells, tot
ORDER BY lang, source, chars_bucket
"""


# l-diversity twin: stacked exact-count groupBys + one divide
_L_DIVERSITY_SQL = """
WITH cell AS (
  SELECT source,
         CAST((n_chars // 100) * 100 AS BIGINT) AS chars_bucket,
         lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2, 3),
cls AS (
  SELECT source, chars_bucket,
         CAST(sum(n) AS BIGINT) AS class_size,
         CAST(count(*) AS BIGINT) AS l_distinct,
         CAST(max(n) AS BIGINT) AS top_n
  FROM cell GROUP BY 1, 2)
SELECT source, chars_bucket, class_size, l_distinct,
       CAST(top_n AS DOUBLE) / CAST(class_size AS DOUBLE) AS top_share,
       l_distinct < 2 AS risky
FROM cls
ORDER BY source, chars_bucket
"""


# t-closeness twin: exact BIGINT numerators share one denominator —
# order-free integer sum, ONE divide per class
_T_CLOSENESS_SQL = """
WITH cell AS (
  SELECT source, CAST((n_chars // 100) * 100 AS BIGINT) AS chars_bucket,
         lang, CAST(count(*) AS BIGINT) AS n_cv
  FROM documents GROUP BY 1, 2, 3),
cls AS (SELECT source, chars_bucket, CAST(sum(n_cv) AS BIGINT) AS n_c
        FROM cell GROUP BY 1, 2),
gstats AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_v
         FROM documents GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
grid AS (SELECT * FROM cls, gstats, tot),
j AS (
  SELECT g.source, g.chars_bucket, g.n_c, g.n_total,
         abs(COALESCE(c.n_cv, 0) * g.n_total - g.n_v * g.n_c) AS num
  FROM grid g LEFT JOIN cell c
    ON c.source = g.source AND c.chars_bucket = g.chars_bucket
   AND c.lang = g.lang
)
SELECT source, chars_bucket, n_c AS class_size,
       CAST(sum(num) AS DOUBLE)
         / (2.0e0 * CAST(n_c AS DOUBLE) * CAST(n_total AS DOUBLE)) AS tvd,
       CAST(sum(num) AS DOUBLE)
         / (2.0e0 * CAST(n_c AS DOUBLE) * CAST(n_total AS DOUBLE)) > 0.3
         AS risky
FROM j GROUP BY source, chars_bucket, n_c, n_total
ORDER BY source, chars_bucket
"""


# Golden-record survivorship replay: same vocabulary-fingerprint
# cluster key, same (n_chars DESC, doc_id) survivor rule.
_GOLDEN_SQL = """
WITH keyed AS (
  SELECT md5(array_to_string(
           list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS cluster_key,
         doc_id, n_chars, source
  FROM documents),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY cluster_key) AS n_members,
         row_number() OVER (PARTITION BY cluster_key
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM keyed)
SELECT cluster_key,
       CAST(max(n_members) AS BIGINT) AS n_members,
       max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_doc_id,
       max(CASE WHEN rn = 1 THEN n_chars END) AS survivor_chars,
       array_to_string(list_sort(list(DISTINCT source)), ',') AS sources
FROM sized WHERE n_members > 1
GROUP BY cluster_key ORDER BY cluster_key
"""


# PSI replay: bin boundaries from the REFERENCE side only (the PSI
# convention), rank-exact at gate accuracy; half-count smoothing with
# the literal 0.5*n_bins denominator; ln rounded on both engines.
def _drift_psi_oracle(n_bins: int = 10) -> str:
    bounds_cte = _rank_exact_bounds_cte("refv", "v", n_bins)
    half_bins = 0.5 * n_bins
    return f"""
WITH refv AS (SELECT value AS v FROM events
              WHERE event_type = 'click' AND value IS NOT NULL),
curv AS (SELECT value AS v FROM events
         WHERE event_type = 'purchase' AND value IS NOT NULL),
{bounds_cte.lstrip()},
binned AS (
  SELECT len(list_filter(bs, x -> CAST(v AS DOUBLE) > CAST(x AS DOUBLE))) AS bin,
         1 AS cr, 0 AS cc
  FROM refv, bounds
  UNION ALL
  SELECT len(list_filter(bs, x -> CAST(v AS DOUBLE) > CAST(x AS DOUBLE))) AS bin,
         0 AS cr, 1 AS cc
  FROM curv, bounds),
per_bin AS (SELECT bin, CAST(sum(cr) AS BIGINT) AS nr,
                   CAST(sum(cc) AS BIGINT) AS nc
            FROM binned GROUP BY bin),
tot AS (SELECT CAST(sum(nr) AS BIGINT) AS n_ref,
               CAST(sum(nc) AS BIGINT) AS n_cur FROM per_bin)
SELECT n_ref, n_cur, CAST(count(*) AS BIGINT) AS n_bins,
       round(sum(
         ((CAST(nc AS DOUBLE) + 0.5) / (CAST(n_cur AS DOUBLE) + {half_bins!r})
          - (CAST(nr AS DOUBLE) + 0.5) / (CAST(n_ref AS DOUBLE) + {half_bins!r}))
         * ln(((CAST(nc AS DOUBLE) + 0.5) / (CAST(n_cur AS DOUBLE) + {half_bins!r}))
              / ((CAST(nr AS DOUBLE) + 0.5) / (CAST(n_ref AS DOUBLE) + {half_bins!r})))
       ), 6) AS psi
FROM per_bin CROSS JOIN tot
GROUP BY n_ref, n_cur
"""


# Benford replay: integer-cents first digit (string arithmetic, never
# log10 on doubles), Python-literal expectations shared with the engine.
def _benford_oracle() -> str:
    import math

    case = " ".join(
        f"WHEN {d} THEN {math.log10(1.0 + 1.0 / d)!r}" for d in range(1, 10)
    )
    return f"""
WITH cents AS (
  SELECT abs(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS c
  FROM orders WHERE o_totalprice IS NOT NULL),
perd AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM cents WHERE c > 0 GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM perd)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS obs_share,
       round(CASE digit {case} END, 6) AS benford_share,
       round((CAST(n AS DOUBLE) - (CASE digit {case} END) * CAST(n_total AS DOUBLE))
             * (CAST(n AS DOUBLE) - (CASE digit {case} END) * CAST(n_total AS DOUBLE))
             / ((CASE digit {case} END) * CAST(n_total AS DOUBLE)), 6) AS chi2_term
FROM perd CROSS JOIN tot
ORDER BY digit
"""


# RFM replay: exact BIGINT metrics per user, three rank-exact boundary
# arrays (the stats_ntile_deciles_approx pattern — no global NTILE).
def _rfm_oracle(n_tiles: int = 5) -> str:
    def bounds(metric: str, tag: str) -> str:
        return f"""
rkd_{tag} AS (SELECT CAST({metric} AS DOUBLE) AS v,
                     row_number() OVER (ORDER BY CAST({metric} AS DOUBLE)) AS rn
              FROM per_user),
rks_{tag} AS (SELECT i, CAST(ceil((CAST(i AS DOUBLE) / {n_tiles}) * cnt) AS BIGINT) AS r
              FROM range(1, {n_tiles}) t(i), ucnt),
b_{tag} AS (SELECT list(v ORDER BY i) AS bs FROM rks_{tag} JOIN rkd_{tag} ON rkd_{tag}.rn = rks_{tag}.r)"""

    return f"""
WITH base AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
per_user AS (
  SELECT user_id,
         CAST(max(us) AS BIGINT) AS recency_us,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(coalesce(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT), 0))
              AS BIGINT) AS monetary_cents
  FROM base GROUP BY user_id),
ucnt AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM per_user),
{bounds("recency_us", "r").lstrip()},
{bounds("frequency", "f").lstrip()},
{bounds("monetary_cents", "m").lstrip()}
SELECT user_id, recency_us, frequency, monetary_cents,
       CAST(1 + len(list_filter(b_r.bs, x -> CAST(recency_us AS DOUBLE) > x)) AS INTEGER) AS r_score,
       CAST(1 + len(list_filter(b_f.bs, x -> CAST(frequency AS DOUBLE) > x)) AS INTEGER) AS f_score,
       CAST(1 + len(list_filter(b_m.bs, x -> CAST(monetary_cents AS DOUBLE) > x)) AS INTEGER) AS m_score,
       CAST((1 + len(list_filter(b_r.bs, x -> CAST(recency_us AS DOUBLE) > x))) * 100
          + (1 + len(list_filter(b_f.bs, x -> CAST(frequency AS DOUBLE) > x))) * 10
          + (1 + len(list_filter(b_m.bs, x -> CAST(monetary_cents AS DOUBLE) > x)))
          AS INTEGER) AS segment
FROM per_user, b_r, b_f, b_m
ORDER BY user_id
"""


# Pairwise Jensen-Shannon replay: per-pair token union built
# explicitly; absent-side terms contribute exactly p·ln 2 via the CASE
# guards; the ln fold rounds on both engines.
_JSD_SQL = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
counts AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
pairs AS (SELECT a.source AS source_a, b.source AS source_b
          FROM totals a, totals b WHERE a.source < b.source),
toks AS (SELECT DISTINCT token FROM counts),
grid AS (SELECT source_a, source_b, token FROM pairs, toks),
j AS (
  SELECT g.source_a, g.source_b, g.token,
         coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
  FROM grid g
  LEFT JOIN counts ca ON ca.source = g.source_a AND ca.token = g.token
  LEFT JOIN counts cb ON cb.source = g.source_b AND cb.token = g.token
  WHERE coalesce(ca.c, 0) > 0 OR coalesce(cb.c, 0) > 0),
x AS (SELECT j.*, CAST(ta.n AS DOUBLE) AS na, CAST(tb.n AS DOUBLE) AS nb
      FROM j JOIN totals ta ON ta.source = j.source_a
             JOIN totals tb ON tb.source = j.source_b)
SELECT source_a, source_b,
       CAST(count(*) AS BIGINT) AS n_tokens_union,
       round(sum(
         CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE) / na)
              * ln((CAST(ca AS DOUBLE) / na)
                   / (((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb)) / 2.0))
              ELSE 0.0 END
       + CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE) / nb)
              * ln((CAST(cb AS DOUBLE) / nb)
                   / (((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb)) / 2.0))
              ELSE 0.0 END), 6) AS jsd
FROM x GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


# TextRank replay: zipped-unnest token positions, banded co-occurrence
# self-join, weight normalization by weighted degree (exact: integer-
# valued doubles), 3 unrolled power iterations (the _pr_sql pattern),
# round-then-rank cut.
def _textrank_oracle(
    window: int = 2, iters: int = 3, damping: float = 0.85, k: int = 20
) -> str:
    head = f"""WITH tp AS (
  SELECT doc_id,
         unnest(range(0, len(w))) AS pos,
         unnest(list_transform(range(0, len(w)), i -> w[i + 1])) AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t),
co AS (
  SELECT a.tok AS src, b.tok AS dst, CAST(count(*) AS BIGINT) AS c
  FROM tp a JOIN tp b
    ON a.doc_id = b.doc_id AND b.pos > a.pos
   AND b.pos <= a.pos + {window} AND a.tok <> b.tok
  GROUP BY 1, 2),
edges AS (
  SELECT src, dst, CAST(sum(c) AS DOUBLE) AS wgt FROM (
    SELECT src, dst, c FROM co
    UNION ALL
    SELECT dst AS src, src AS dst, c FROM co) u
  GROUP BY 1, 2),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
wdeg AS (SELECT src, sum(wgt) AS wd FROM edges GROUP BY src),
weighted AS (SELECT e.src, e.dst, e.wgt / w.wd AS w
             FROM edges e JOIN wdeg w ON e.src = w.src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    body = ""
    prev = "r0"
    for i in range(1, iters + 1):
        body += f""", c{i} AS (
  SELECT w.dst, sum(r.pr * w.w) AS mass
  FROM weighted w JOIN {prev} r ON w.src = r.node GROUP BY w.dst
), r{i} AS (
  SELECT n.node,
         (1.0 - {damping}) / (SELECT n FROM nn)
         + {damping} * coalesce(c.mass, 0.0) AS pr
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst
)"""
        prev = f"r{i}"
    return (
        head + body + f""",
scored AS (SELECT node AS word, round(pr, 6) AS score FROM {prev}),
ranked AS (SELECT word, score,
                  CAST(row_number() OVER (ORDER BY score DESC, word) AS INTEGER) AS rk
           FROM scored)
SELECT word, score, rk FROM ranked WHERE rk <= {k} ORDER BY rk
"""
    )


def _drift_psi_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.drift import psi_drift

    ev = _t(spark, sf, "events")
    return psi_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
    )


def _benford_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.quality import benford_first_digit

    return benford_first_digit(_t(spark, sf, "orders"), "o_totalprice")


def _rfm_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.events import rfm_segments

    return rfm_segments(_t(spark, sf, "events"))


def _jsd_query(spark: SparkSession, sf: str) -> DataFrame:
    return text.js_divergence_by_source(_t(spark, sf, "documents"))


def _textrank_query(spark: SparkSession, sf: str) -> DataFrame:
    return text.textrank_keywords(_t(spark, sf, "documents"))


# ---------------------------------------------------------- evaluation

# Shared scored-docs CTE: the md5-weight classifier of _CLASSIFIER_SQL
# plus the binary en-label (evaluation._classifier_scored replay).
_EVAL_SCORED_CTE = f"""
scored AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ' '),
               t -> ({_hexfold("'clf:' || t", 1, 8)}) % 1001 - 500)),
           (a, x) -> a + x) AS score_num,
         CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
  FROM documents),
lab AS (SELECT doc_id, y, n_tokens,
               CAST(score_num AS DOUBLE) / n_tokens AS score
        FROM scored)
"""

_ROC_AUC_SQL = f"""
WITH {_EVAL_SCORED_CTE},
g AS (SELECT score, CAST(sum(y) AS BIGINT) AS p,
             CAST(count(*) - sum(y) AS BIGINT) AS n
      FROM lab GROUP BY score),
c AS (SELECT p, n, CAST(sum(n) OVER (ORDER BY score) AS BIGINT) AS cum FROM g)
SELECT CAST(sum(p) AS BIGINT) AS n_pos,
       CAST(sum(n) AS BIGINT) AS n_neg,
       CAST(count(*) AS BIGINT) AS n_scores,
       CAST(sum(p * (2 * (cum - n) + n)) AS DOUBLE)
         / (2.0 * CAST(sum(p) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS auc
FROM c
"""

_CALIBRATION_SQL = f"""
WITH {_EVAL_SCORED_CTE}
SELECT CAST(floor(score / 100.0) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(y) AS BIGINT) AS n_pos,
       CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate,
       min(score) AS min_score,
       max(score) AS max_score,
       CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
FROM lab GROUP BY 1 ORDER BY bucket
"""

_CONTAM_MATRIX_SQL = """
WITH toks AS (SELECT source, string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) >= 3),
sg AS (SELECT DISTINCT source,
              unnest(list_distinct(list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
       FROM toks),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM sg GROUP BY source),
inter AS (SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_inter
          FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
          GROUP BY 1, 2)
SELECT src_a, src_b, sa.n_grams AS n_a, sb.n_grams AS n_b, n_inter,
       CAST(n_inter AS DOUBLE) / sa.n_grams AS contain_a_in_b,
       CAST(n_inter AS DOUBLE) / sb.n_grams AS contain_b_in_a,
       CAST(n_inter AS DOUBLE) / (sa.n_grams + sb.n_grams - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON src_a = sa.source
JOIN sizes sb ON src_b = sb.source
ORDER BY src_a, src_b
"""

_STUPID_BACKOFF_SQL = """
WITH toks AS (SELECT doc_id, doc_id % 5 = 0 AS held_out,
                     string_split(text, ' ') AS w FROM documents),
tri AS (SELECT doc_id, held_out,
               unnest(list_transform(range(1, len(w) - 1), i -> w[i])) AS w1,
               unnest(list_transform(range(1, len(w) - 1), i -> w[i+1])) AS w2,
               unnest(list_transform(range(1, len(w) - 1), i -> w[i+2])) AS w3
        FROM toks WHERE len(w) >= 3),
bi AS (SELECT held_out,
              unnest(list_transform(range(1, len(w)), i -> w[i])) AS b1,
              unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS b2
       FROM toks WHERE len(w) >= 2),
uni AS (SELECT held_out, unnest(w) AS u FROM toks),
c3 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c123
       FROM tri WHERE NOT held_out GROUP BY 1, 2, 3),
c2 AS (SELECT b1, b2, CAST(count(*) AS BIGINT) AS cb
       FROM bi WHERE NOT held_out GROUP BY 1, 2),
c1 AS (SELECT u, CAST(count(*) AS BIGINT) AS cu
       FROM uni WHERE NOT held_out GROUP BY 1),
scal AS (SELECT CAST(count(*) AS BIGINT) AS n_train,
                CAST(count(DISTINCT u) AS BIGINT) AS vocab
         FROM uni WHERE NOT held_out),
ev AS (SELECT doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS m
       FROM tri WHERE held_out GROUP BY 1, 2, 3, 4),
j AS (SELECT ev.doc_id, ev.m,
             COALESCE(c3.c123, 0) AS c123,
             COALESCE(x12.cb, 0) AS c12,
             COALESCE(x23.cb, 0) AS c23,
             COALESCE(u2.cu, 0) AS cw2,
             COALESCE(u3.cu, 0) AS cw3
      FROM ev
      LEFT JOIN c3 USING (w1, w2, w3)
      LEFT JOIN c2 x12 ON ev.w1 = x12.b1 AND ev.w2 = x12.b2
      LEFT JOIN c2 x23 ON ev.w2 = x23.b1 AND ev.w3 = x23.b2
      LEFT JOIN c1 u2 ON ev.w2 = u2.u
      LEFT JOIN c1 u3 ON ev.w3 = u3.u),
per AS (SELECT doc_id,
               list_sort(list({'c123': c123, 'c12': c12, 'c23': c23,
                               'cw2': cw2, 'cw3': cw3, 'm': m})) AS ts,
               CAST(sum(m) AS BIGINT) AS n_trigrams,
               CAST(sum(CASE WHEN c123 > 0 THEN m ELSE 0 END) AS BIGINT) AS n_tier1,
               CAST(sum(CASE WHEN c123 = 0 AND c23 > 0 THEN m ELSE 0 END) AS BIGINT) AS n_tier2,
               CAST(sum(CASE WHEN c123 = 0 AND c23 = 0 THEN m ELSE 0 END) AS BIGINT) AS n_tier3
        FROM j GROUP BY doc_id),
folded AS (SELECT doc_id, n_trigrams, n_tier1, n_tier2, n_tier3,
                  list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(ts, t -> CAST(t.m AS DOUBLE) *
                      (CASE WHEN t.c123 > 0
                            THEN ln(CAST(t.c123 AS DOUBLE)) - ln(CAST(t.c12 AS DOUBLE))
                            WHEN t.c23 > 0
                            THEN ln(0.4) + ln(CAST(t.c23 AS DOUBLE)) - ln(CAST(t.cw2 AS DOUBLE))
                            ELSE 2.0 * ln(0.4) + ln(CAST(t.cw3 AS DOUBLE) + 1.0)
                                 - ln(CAST(n_train + vocab AS DOUBLE)) END))),
                    (a, x) -> a + x) AS s
           FROM per, scal)
SELECT doc_id, n_trigrams, n_tier1, n_tier2, n_tier3,
       round(s / CAST(n_trigrams AS DOUBLE), 7) AS avg_logscore
FROM folded ORDER BY doc_id
"""

_KMV_JACCARD_SQL = """
WITH toks AS (SELECT source, string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) >= 3),
sg AS (SELECT DISTINCT source, md5(g) AS h FROM (
         SELECT source,
                unnest(list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
         FROM toks)),
sk AS (SELECT source, h FROM (
         SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         FROM sg) WHERE rn <= 32),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_set FROM sg GROUP BY source),
exact AS (SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_inter
          FROM sg a JOIN sg b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2),
pairs AS (SELECT a.source AS src_a, b.source AS src_b
          FROM (SELECT DISTINCT source FROM sk) a
          JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
u AS (SELECT src_a, src_b, h FROM pairs JOIN sk ON sk.source = pairs.src_a
      UNION
      SELECT src_a, src_b, h FROM pairs JOIN sk ON sk.source = pairs.src_b),
ranked AS (SELECT src_a, src_b, h,
                  row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
           FROM u),
tau AS (SELECT src_a, src_b,
               max(CASE WHEN rn <= 32 THEN h END) AS tau,
               CAST(count(*) AS BIGINT) AS n_union_sk
        FROM ranked GROUP BY 1, 2),
common AS (SELECT c.src_a, c.src_b, CAST(count(*) AS BIGINT) AS n_common
           FROM (SELECT a.source AS src_a, b.source AS src_b, a.h
                 FROM sk a JOIN sk b ON a.h = b.h AND a.source < b.source) c
           JOIN tau ON c.src_a = tau.src_a AND c.src_b = tau.src_b
                   AND c.h <= tau.tau
           GROUP BY 1, 2),
base AS (SELECT t.src_a, t.src_b,
                CAST(32 AS BIGINT) AS k,
                COALESCE(n_common, 0) AS n_common_le_tau,
                CASE WHEN n_union_sk < 32
                     THEN CAST(COALESCE(n_common, 0) AS DOUBLE) / n_union_sk
                     ELSE CAST(COALESCE(n_common, 0) AS DOUBLE) / 32.0 END AS j_est,
                CAST(COALESCE(n_inter, 0) AS DOUBLE)
                  / (sa.n_set + sb.n_set - COALESCE(n_inter, 0)) AS j_exact
         FROM tau t
         LEFT JOIN common USING (src_a, src_b)
         LEFT JOIN exact USING (src_a, src_b)
         JOIN sizes sa ON t.src_a = sa.source
         JOIN sizes sb ON t.src_b = sb.source)
SELECT src_a, src_b, k, n_common_le_tau, j_est, j_exact,
       (j_est - j_exact) AS err
FROM base ORDER BY src_a, src_b
"""


_ASSOC_RULES_SQL = """
WITH baskets AS (SELECT DISTINCT l_orderkey AS basket, p_brand AS item
                 FROM lineitem JOIN part ON l_partkey = p_partkey),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM baskets),
ci AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM baskets GROUP BY item),
cp AS (SELECT a.item AS x, b.item AS y, CAST(count(*) AS BIGINT) AS c_both
       FROM baskets a JOIN baskets b ON a.basket = b.basket AND a.item < b.item
       GROUP BY 1, 2),
directed AS (SELECT x, y, c_both FROM cp
             UNION ALL
             SELECT y AS x, x AS y, c_both FROM cp)
SELECT d.x AS antecedent, d.y AS consequent, c_both,
       ca.c AS c_ante, cc.c AS c_cons, n_baskets,
       CAST(c_both AS DOUBLE) / n_baskets AS support,
       CAST(c_both AS DOUBLE) / ca.c AS confidence,
       CAST(c_both * n_baskets AS DOUBLE) / (ca.c * cc.c) AS lift
FROM directed d
JOIN ci ca ON d.x = ca.item
JOIN ci cc ON d.y = cc.item
CROSS JOIN nb
ORDER BY antecedent, consequent
"""

_BACKLOG_SQL = """
WITH li AS (SELECT date_trunc('day', o_orderdate) AS open_day,
                   date_trunc('day', l_shipdate) AS ship_day
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE date_trunc('day', l_shipdate) > date_trunc('day', o_orderdate)),
deltas AS (SELECT open_day AS day, CAST(1 AS BIGINT) AS opened,
                  CAST(0 AS BIGINT) AS shipped FROM li
           UNION ALL
           SELECT ship_day AS day, CAST(0 AS BIGINT) AS opened,
                  CAST(1 AS BIGINT) AS shipped FROM li),
per_day AS (SELECT day, CAST(sum(opened) AS BIGINT) AS n_opened,
                   CAST(sum(shipped) AS BIGINT) AS n_shipped
            FROM deltas GROUP BY day)
SELECT day, n_opened, n_shipped,
       CAST(sum(n_opened - n_shipped) OVER (ORDER BY day) AS BIGINT) AS open_backlog
FROM per_day ORDER BY day
"""

_LOG_ODDS_SQL = """
WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
yiw AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS y_iw FROM tok GROUP BY 1, 2),
ni AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_i FROM tok GROUP BY 1),
yw AS (SELECT token, CAST(count(*) AS BIGINT) AS y_w FROM tok GROUP BY 1),
scal AS (SELECT CAST(count(*) AS BIGINT) AS n_tot,
                CAST(count(DISTINCT token) AS BIGINT) AS v FROM tok),
j AS (SELECT lang, token, y_iw, (y_w - y_iw) AS y_rest,
             ln((y_iw + 0.5) / (n_i + 0.5 * v - y_iw - 0.5))
               - ln(((y_w - y_iw) + 0.5)
                    / (n_tot - n_i + 0.5 * v - (y_w - y_iw) - 0.5)) AS delta,
             1.0 / (y_iw + 0.5) + 1.0 / ((y_w - y_iw) + 0.5) AS var
      FROM yiw JOIN ni USING (lang) JOIN yw USING (token) CROSS JOIN scal)
SELECT lang, token, y_iw, y_rest,
       round(delta, 6) AS log_odds,
       round(delta / sqrt(var), 6) AS z
FROM j ORDER BY lang, token
"""


_LIFECYCLE_SQL = """
WITH pres AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
              FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
seq AS (SELECT user_id, week,
               lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
               lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
        FROM pres),
active AS (SELECT week,
                  CASE WHEN prev_week IS NULL THEN 'new'
                       WHEN prev_week + 7 = week THEN 'retained'
                       ELSE 'resurrected' END AS status
           FROM seq),
mw AS (SELECT max(week) AS max_week FROM pres),
churn AS (SELECT week + 7 AS week, 'churned' AS status
          FROM seq, mw
          WHERE (next_week IS NULL OR next_week > week + 7)
            AND week + 7 <= max_week),
allrows AS (SELECT week, status FROM active
            UNION ALL SELECT week, status FROM churn)
SELECT CAST(week AS TIMESTAMP) AS week,
       CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
       CAST(sum(CASE WHEN status = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
FROM allrows GROUP BY week ORDER BY week
"""


def _fd_entropy_sum(group_cols: str) -> str:
    """Scalar subquery: Σ c·ln(c) over the grouped counts of
    `group_cols`, folded in sorted order (the Spark twin's
    array_sort(collect_list) discipline)."""
    return f"""(SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(list_sort(list(c)),
          c -> CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))),
        (a, v) -> a + v)
      FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM base GROUP BY {group_cols}))"""


def _fd_pair_sql(x: str, y: str) -> str:
    return f"""SELECT '{x}' AS x_col, '{y}' AS y_col, n,
       round(h_y_given_x_raw, 6) AS h_y_given_x,
       round(h_y_raw, 6) AS h_y,
       round(CASE WHEN h_y_raw > 0 THEN 1.0 - h_y_given_x_raw / h_y_raw
                  ELSE 1.0 END, 6) AS fd_strength
FROM (SELECT n,
             (sx - sxy) / n AS h_y_given_x_raw,
             ln(CAST(n AS DOUBLE)) - sy / n AS h_y_raw
      FROM (SELECT (SELECT CAST(count(*) AS BIGINT) FROM base) AS n,
                   {_fd_entropy_sum(x)} AS sx,
                   {_fd_entropy_sum(y)} AS sy,
                   {_fd_entropy_sum(x + ", " + y)} AS sxy))"""


_FUNCTIONAL_DEPS_SQL = (
    """
WITH base AS (SELECT CAST(lang AS VARCHAR) AS lang,
                     CAST(source AS VARCHAR) AS source,
                     CAST(n_chars - n_chars % 100 AS VARCHAR) AS len_bucket
              FROM documents)
"""
    + "\nUNION ALL\n".join(
        _fd_pair_sql(x, y)
        for x in ("lang", "source", "len_bucket")
        for y in ("lang", "source", "len_bucket")
        if x != y
    )
    + "\nORDER BY x_col, y_col"
)

_ZIPF_SQL = """
WITH counts AS (SELECT token, CAST(count(*) AS BIGINT) AS c
                FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
                GROUP BY token),
ranked AS (SELECT CAST(row_number() OVER (ORDER BY c DESC, token) AS BIGINT) AS rank, c
           FROM counts),
folded AS (SELECT list_sort(list({'rank': rank, 'c': c})) AS ts,
                  CAST(count(*) AS BIGINT) AS vocab
           FROM ranked),
m AS (SELECT vocab,
  list_reduce(list_prepend(CAST(0 AS DOUBLE),
    list_transform(ts, t -> ln(CAST(t.rank AS DOUBLE)))), (a, v) -> a + v) AS sx,
  list_reduce(list_prepend(CAST(0 AS DOUBLE),
    list_transform(ts, t -> ln(CAST(t.c AS DOUBLE)))), (a, v) -> a + v) AS sy,
  list_reduce(list_prepend(CAST(0 AS DOUBLE),
    list_transform(ts, t -> ln(CAST(t.rank AS DOUBLE)) * ln(CAST(t.c AS DOUBLE)))),
    (a, v) -> a + v) AS sxy,
  list_reduce(list_prepend(CAST(0 AS DOUBLE),
    list_transform(ts, t -> ln(CAST(t.rank AS DOUBLE)) * ln(CAST(t.rank AS DOUBLE)))),
    (a, v) -> a + v) AS sxx,
  list_reduce(list_prepend(CAST(0 AS DOUBLE),
    list_transform(ts, t -> ln(CAST(t.c AS DOUBLE)) * ln(CAST(t.c AS DOUBLE)))),
    (a, v) -> a + v) AS syy
  FROM folded)
SELECT vocab,
       round((CAST(vocab AS DOUBLE) * sxy - sx * sy)
             / (CAST(vocab AS DOUBLE) * sxx - sx * sx), 6) AS slope,
       round((sy - ((CAST(vocab AS DOUBLE) * sxy - sx * sy)
                    / (CAST(vocab AS DOUBLE) * sxx - sx * sx)) * sx)
             / CAST(vocab AS DOUBLE), 6) AS intercept,
       round(((CAST(vocab AS DOUBLE) * sxy - sx * sy)
              * (CAST(vocab AS DOUBLE) * sxy - sx * sy))
             / ((CAST(vocab AS DOUBLE) * sxx - sx * sx)
                * (CAST(vocab AS DOUBLE) * syy - sy * sy)), 6) AS r2
FROM m
"""


_GINI_SQL = """
WITH counts AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events
                WHERE user_id IS NOT NULL GROUP BY user_id),
ranked AS (SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i
           FROM counts),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(x) AS BIGINT) AS total_events,
             CAST(sum(CAST(i AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS rank_sum
      FROM ranked)
SELECT n_users, total_events,
       (2.0 * CAST(rank_sum AS DOUBLE))
         / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE))
         - CAST(n_users + 1 AS DOUBLE) / n_users AS gini
FROM a
"""

_BURSTINESS_SQL = """
WITH per_doc AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
                 FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                       FROM documents)
                 GROUP BY doc_id, token),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
agg AS (SELECT token, CAST(sum(c) AS BIGINT) AS total,
               CAST(sum(c * c) AS BIGINT) AS sum_sq,
               CAST(count(*) AS BIGINT) AS df
        FROM per_doc GROUP BY token)
SELECT token, total, df,
       CAST(total AS DOUBLE) / n_docs AS mean_count,
       CAST(sum_sq AS DOUBLE) / n_docs
         - (CAST(total AS DOUBLE) / n_docs) * (CAST(total AS DOUBLE) / n_docs) AS var_count,
       (CAST(sum_sq AS DOUBLE) / n_docs
         - (CAST(total AS DOUBLE) / n_docs) * (CAST(total AS DOUBLE) / n_docs))
         / (CAST(total AS DOUBLE) / n_docs) AS fano
FROM agg, nd ORDER BY token
"""

_PARETO_ABC_SQL = """
WITH rev AS (SELECT l_partkey,
                    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                             * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)))
                         AS BIGINT) AS rev
             FROM lineitem GROUP BY l_partkey),
tot AS (SELECT CAST(sum(rev) AS BIGINT) AS total_rev FROM rev),
cum AS (SELECT l_partkey, rev,
               CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS BIGINT) AS cum_rev
        FROM rev),
classed AS (SELECT rev, total_rev,
                   CASE WHEN cum_rev * 5 <= total_rev * 4 THEN 'A'
                        WHEN cum_rev * 20 <= total_rev * 19 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM cum, tot)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS class_rev,
       CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE) / max(total_rev) AS rev_share
FROM classed GROUP BY abc_class ORDER BY abc_class
"""

_ESS_SQL = """
WITH w AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS w FROM documents),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(w) AS BIGINT) AS sum_w,
             CAST(sum(w * w) AS BIGINT) AS sum_w2 FROM w)
SELECT n_docs, sum_w,
       CAST(sum_w * sum_w AS DOUBLE) / sum_w2 AS ess,
       CAST(sum_w * sum_w AS DOUBLE) / (sum_w2 * n_docs) AS ess_ratio
FROM a
"""


_SLA_PCTL_SQL = """
WITH lat AS (SELECT o_orderpriority,
                    CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) AS BIGINT) AS lat
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ranked AS (SELECT o_orderpriority, lat,
                  CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY lat) AS BIGINT) AS rn,
                  CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
           FROM lat)
SELECT o_orderpriority,
       max(n) AS n,
       min(lat) AS min_days,
       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN lat END) AS p50_days,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN lat END) AS p90_days,
       max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN lat END) AS p99_days,
       max(lat) AS max_days
FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

_INTER_ARRIVAL_SQL = """
WITH g AS (SELECT event_type,
                  CAST(epoch_us(ts) AS BIGINT)
                    - lag(CAST(epoch_us(ts) AS BIGINT))
                      OVER (PARTITION BY event_type
                            ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS gap
           FROM events WHERE ts IS NOT NULL),
m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap) AS BIGINT) AS s1,
             sum(CAST(gap AS HUGEINT) * gap) AS s2
      FROM g WHERE gap IS NOT NULL GROUP BY event_type)
SELECT event_type, n,
       CAST(s1 AS DOUBLE) / n AS mean_gap_us,
       sqrt(CAST(s2 AS DOUBLE) / n
            - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS std_gap_us,
       (sqrt(CAST(s2 AS DOUBLE) / n
             - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
        - CAST(s1 AS DOUBLE) / n)
       / (sqrt(CAST(s2 AS DOUBLE) / n
               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
          + CAST(s1 AS DOUBLE) / n) AS burstiness
FROM m ORDER BY event_type
"""

_SENTENCE_DEDUP_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (SELECT doc_id, t,
               unnest(range(CAST(ceil(len(t) / 8.0) AS BIGINT))) AS pos
        FROM toks),
chunks AS (SELECT doc_id, pos,
                  array_to_string(t[(pos * 8 + 1):(pos * 8 + 8)], ' ') AS chunk
           FROM pos),
marked AS (SELECT doc_id, pos, chunk,
                  row_number() OVER (PARTITION BY chunk
                                     ORDER BY doc_id, pos) AS rk
           FROM chunks),
totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
           FROM chunks GROUP BY doc_id),
kept AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                string_agg(chunk, ' ' ORDER BY pos) AS kept_text
         FROM marked WHERE rk = 1 GROUP BY doc_id)
SELECT t.doc_id, t.n_chunks,
       COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.kept_text, '') AS kept_text
FROM totals t LEFT JOIN kept k USING (doc_id)
ORDER BY doc_id
"""

_RULE_VIOLATIONS_SQL = """
WITH j AS (SELECT (l.l_shipdate < o.o_orderdate) AS v_ship,
                  (l.l_quantity <= 0) AS v_qty,
                  (l.l_discount > 0.07) AS v_disc,
                  (l.l_tax < 0 OR l.l_tax > 0.06) AS v_tax,
                  (l.l_extendedprice <= 0) AS v_price
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
one AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN v_ship THEN 1 ELSE 0 END) AS BIGINT) AS ship_before_order,
               CAST(sum(CASE WHEN v_qty THEN 1 ELSE 0 END) AS BIGINT) AS qty_nonpositive,
               CAST(sum(CASE WHEN v_disc THEN 1 ELSE 0 END) AS BIGINT) AS discount_gt_7pct,
               CAST(sum(CASE WHEN v_tax THEN 1 ELSE 0 END) AS BIGINT) AS tax_out_of_range,
               CAST(sum(CASE WHEN v_price THEN 1 ELSE 0 END) AS BIGINT) AS price_nonpositive
        FROM j),
long AS (
  SELECT 'ship_before_order' AS rule, ship_before_order AS n_violations, n_rows FROM one
  UNION ALL
  SELECT 'qty_nonpositive', qty_nonpositive, n_rows FROM one
  UNION ALL
  SELECT 'discount_gt_7pct', discount_gt_7pct, n_rows FROM one
  UNION ALL
  SELECT 'tax_out_of_range', tax_out_of_range, n_rows FROM one
  UNION ALL
  SELECT 'price_nonpositive', price_nonpositive, n_rows FROM one)
SELECT rule, n_violations, n_rows,
       CAST(n_violations AS DOUBLE) / n_rows AS rate
FROM long ORDER BY rule
"""

_KM_SURVIVAL_SQL = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN gap IS NULL OR gap > 1800 * 1000000 THEN 1 ELSE 0 END AS brk
  FROM base
),
numbered AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
),
sess AS (
  SELECT max(us) AS end_us, max(us) - min(us) AS duration_us
  FROM numbered GROUP BY user_id, session_no
),
h AS (SELECT max(end_us) AS h FROM sess),
durs AS (
  SELECT duration_us,
         CASE WHEN end_us + 1800 * 1000000 > (SELECT h FROM h)
              THEN 0 ELSE 1 END AS is_event
  FROM sess
),
g AS (SELECT duration_us, CAST(sum(is_event) AS BIGINT) AS d,
             CAST(count(*) - sum(is_event) AS BIGINT) AS c
      FROM durs GROUP BY duration_us),
r AS (SELECT duration_us, d, c,
             CAST((SELECT sum(d + c) FROM g)
                  - sum(d + c) OVER (ORDER BY duration_us
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  + d + c AS BIGINT) AS n_risk
      FROM g),
t AS (SELECT duration_us, d, c, n_risk,
             CASE WHEN d > 0 AND n_risk > d
                  THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk) END AS lnterm
      FROM r),
s AS (SELECT duration_us, d, c, n_risk,
             sum(lnterm) OVER (ORDER BY duration_us
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lncum
      FROM t)
SELECT duration_us AS t_us, n_risk, d AS n_events, c AS n_censored,
       CASE WHEN n_risk = d THEN 0.0
            ELSE round(exp(COALESCE(lncum, 0.0)), 9) END AS survival
FROM s WHERE d > 0 ORDER BY t_us
"""

_OHLC_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour_id,
         epoch_us(ts) AS us, event_id, value
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
marked AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, hour_id
                            ORDER BY us, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, hour_id
                            ORDER BY us DESC, event_id DESC) AS rn_d
  FROM base
)
SELECT event_type, hour_id,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM marked GROUP BY event_type, hour_id
ORDER BY event_type, hour_id
"""

_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day_no
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
islands AS (
  SELECT user_id, day_no,
         day_no - row_number() OVER (PARTITION BY user_id ORDER BY day_no) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
         max(day_no) AS end_day
  FROM islands GROUP BY user_id, grp
)
SELECT user_id,
       max(len) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       arg_max(len, end_day) AS current_streak,
       max(end_day) AS last_active_day
FROM streaks GROUP BY user_id ORDER BY user_id
"""

_SKYLINE_SQL = """
SELECT p_partkey, p_name, p_retailprice, p_size
FROM part a
WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM part b
    WHERE b.p_retailprice IS NOT NULL AND b.p_size IS NOT NULL
      AND b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
ORDER BY p_retailprice, p_partkey
"""

_CLAMPED_BALANCE_SQL = """
WITH base AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
         CASE WHEN event_type = 'purchase'
              THEN -CAST(round(value * 100) AS BIGINT)
              ELSE CAST(round(value * 100) AS BIGINT) END AS delta_cents
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
),
s AS (
  SELECT *,
         CAST(sum(delta_cents) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_sum
  FROM base
),
m AS (
  SELECT *,
         CAST(min(run_sum) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_min
  FROM s
)
SELECT user_id, us, event_id, event_type, delta_cents,
       run_sum - least(CAST(0 AS BIGINT), run_min) AS balance_cents
FROM m ORDER BY user_id, us, event_id
"""

_DAILY_AUTOCORR_SQL = """
WITH counts AS (
  SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day_no,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
spine AS (
  SELECT unnest(range((SELECT min(day_no) FROM counts),
                      (SELECT max(day_no) FROM counts) + 1)) AS day_no
),
filled AS (
  SELECT s.day_no, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
  FROM spine s LEFT JOIN counts c USING (day_no)
),
lagged AS (
  SELECT l.lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x.cnt) AS BIGINT) AS sx,
         CAST(sum(y.cnt) AS BIGINT) AS sy,
         CAST(sum(x.cnt * y.cnt) AS BIGINT) AS sxy,
         CAST(sum(x.cnt * x.cnt) AS BIGINT) AS sxx,
         CAST(sum(y.cnt * y.cnt) AS BIGINT) AS syy
  FROM (SELECT CAST(1 AS BIGINT) AS lag UNION ALL SELECT 7) l,
       filled x JOIN filled y ON x.day_no = y.day_no - l.lag
  GROUP BY l.lag
)
SELECT lag, n_pairs,
       CAST(n_pairs * sxy - sx * sy AS DOUBLE)
         / nullif(sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)), 0.0)
         AS autocorr
FROM lagged ORDER BY lag
"""

_BRAND_COOC_SQL = """
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
sizes AS (SELECT brand, CAST(count(*) AS BIGINT) AS c FROM baskets GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS c_both
  FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, sa.c AS c_a, sb.c AS c_b, c_both,
       CAST(c_both AS DOUBLE) / sqrt(CAST(sa.c * sb.c AS DOUBLE)) AS cosine,
       CAST(c_both AS DOUBLE) / (sa.c + sb.c - c_both) AS jaccard
FROM pairs
JOIN sizes sa ON sa.brand = pairs.brand_a
JOIN sizes sb ON sb.brand = pairs.brand_b
ORDER BY brand_a, brand_b
"""

_WILSON_SQL = """
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM documents GROUP BY source
)
SELECT source, n, k,
       CAST(k AS DOUBLE) / n AS rate,
       ((CAST(k AS DOUBLE) / n + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
        - 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n)
                        / CAST(n AS DOUBLE)
                      + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_low,
       ((CAST(k AS DOUBLE) / n + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
        + 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n)
                        / CAST(n AS DOUBLE)
                      + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_high
FROM g ORDER BY source
"""

_AB_TEST_SQL = """
WITH base AS (
  SELECT user_id % 2 AS arm, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
),
one AS (
  SELECT CAST(COALESCE(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_a,
         CAST(COALESCE(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_b,
         CAST(COALESCE(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END), 0) AS BIGINT) AS s1_a,
         CAST(COALESCE(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END), 0) AS BIGINT) AS s1_b,
         CAST(COALESCE(sum(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END), 0) AS BIGINT) AS s2_a,
         CAST(COALESCE(sum(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END), 0) AS BIGINT) AS s2_b
  FROM base
),
m AS (
  SELECT n_a, n_b,
         -- ADVICE r7 #4: zero-pooled-variance guard, exact-integer
         -- identity n*s2 > s1^2 in HUGEINT (s1^2 overflows BIGINT)
         (CAST(n_a AS HUGEINT) * CAST(s2_a AS HUGEINT)
            > CAST(s1_a AS HUGEINT) * CAST(s1_a AS HUGEINT)
          OR CAST(n_b AS HUGEINT) * CAST(s2_b AS HUGEINT)
            > CAST(s1_b AS HUGEINT) * CAST(s1_b AS HUGEINT)) AS var_pos,
         CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         (CAST(s2_a AS DOUBLE)
            - CAST(s1_a AS DOUBLE) * (CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
           / (CAST(n_a AS DOUBLE) - 1.0) AS va,
         (CAST(s2_b AS DOUBLE)
            - CAST(s1_b AS DOUBLE) * (CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
           / (CAST(n_b AS DOUBLE) - 1.0) AS vb
  FROM one
)
SELECT n_a, n_b,
       CASE WHEN n_a > 0 THEN ma END AS mean_a_cents,
       CASE WHEN n_b > 0 THEN mb END AS mean_b_cents,
       CASE WHEN n_a > 0 AND n_b > 0 THEN mb - ma END AS diff_cents,
       CASE WHEN n_a > 1 AND n_b > 1 AND var_pos THEN
         (mb - ma) / sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
       END AS welch_t,
       CASE WHEN n_a > 1 AND n_b > 1 AND var_pos THEN
         (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
           * (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
           / ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))
                / (CAST(n_a AS DOUBLE) - 1.0)
              + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))
                / (CAST(n_b AS DOUBLE) - 1.0))
       END AS welch_df
FROM m
"""

def _e2e_corpus_sql(
    min_tokens: int = 5,
    min_distinct_ratio: float = 0.3,
    jacc: float = 0.2,
    cos: float = 0.35,
    bits: int = 6,
    budget: int = 5000,
    seq_budget: int = 512,
    n_shards: int = 16,
    quality_mode: str = "static",
    keep_q: float = 0.5,
) -> str:
    """Full-chain twin of pipeline.e2e_corpus_pipeline: the stage CTEs
    are the SAME SQL the individual gates already pin (quality
    predicates, md5 first-wins, the _minhash_ctes block re-sourced
    onto the exact-dedup stage, the hyperplane-bucket near-dup, the
    HUGEINT budget thresholds, the running-sum packer), chained so
    each stage reads the previous stage's survivors."""
    mh = _minhash_ctes(threshold=jacc, src="ex", lead="", cands_only=True)
    lshb = _lsh_bucket_sql("v", bits=bits)
    if quality_mode == "trained":
        # r7 verdict #5: splice the logreg train+infer chain in front
        # and gate quality on the trained score's rank-exact corpus
        # keep_q-quantile (value at sorted rank ceil(q*N) — the
        # quality_percentile_gate rank-selection convention) instead of
        # the static predicate
        infer = _logreg_infer_sql()
        head, tail = infer.rsplit("SELECT doc_id,", 1)
        tail = tail.rsplit("ORDER BY doc_id", 1)[0]
        prefix = (
            head
            + ", scored AS MATERIALIZED (SELECT doc_id,"
            + tail
            + f"""),
sr AS (SELECT p_keep, row_number() OVER (ORDER BY p_keep) AS rn,
              count(*) OVER () AS n FROM scored),
qthr AS (SELECT p_keep AS thr FROM sr
         WHERE rn = CAST(ceil({keep_q} * n) AS BIGINT)),
q AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.source FROM documents d
  JOIN scored s USING (doc_id), qthr WHERE s.p_keep >= qthr.thr
),"""
        )
    else:
        prefix = f"""
WITH q AS MATERIALIZED (
  SELECT doc_id, text, source FROM documents
  WHERE len(string_split(text, ' ')) >= {min_tokens}
    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / CAST(len(string_split(text, ' ')) AS DOUBLE) >= {min_distinct_ratio}
),"""
    return f"""
{prefix}
ex AS MATERIALIZED (
  SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM q) t WHERE rn = 1
),
{mh},
fz AS MATERIALIZED (
  SELECT e.* FROM ex e
  WHERE e.doc_id NOT IN (SELECT x.doc_b FROM exact x)
),
se AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       WHERE vec_id IN (SELECT doc_id FROM fz)),
ssig AS (SELECT vec_id, v, {lshb} AS bucket FROM se),
spairs AS (
  SELECT id_b FROM (
    SELECT b.vec_id AS id_b,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) AS cosine
    FROM ssig a JOIN ssig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t
  WHERE cosine >= {cos}
),
sm AS MATERIALIZED (SELECT f.* FROM fz f WHERE f.doc_id NOT IN (SELECT id_b FROM spairs)),
bt AS MATERIALIZED (
  SELECT doc_id, source AS src,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {_hexbucket_sql("doc_id")} % 65536 AS hb
  FROM sm),
thr AS (
  SELECT src,
         CAST(least(65536, (CAST({budget} AS HUGEINT) * 65536)
                    // CAST(sum(n_tokens) AS HUGEINT)) AS BIGINT) AS threshold
  FROM bt GROUP BY src),
sel AS MATERIALIZED (SELECT bt.doc_id, bt.n_tokens FROM bt JOIN thr USING (src)
        WHERE bt.hb < thr.threshold),
pk AS MATERIALIZED (
  SELECT CAST((sum(n_tokens) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens)
              // {seq_budget} AS BIGINT) AS seq_id
  FROM sel),
shrd AS (SELECT DISTINCT {_hexbucket_sql("seq_id")} % 65536 % {n_shards} AS s
         FROM pk)
SELECT stage_no, stage, n_rows FROM (
  SELECT 0 AS stage_no, 'raw' AS stage,
         (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows
  UNION ALL SELECT 1, 'quality', (SELECT CAST(count(*) AS BIGINT) FROM q)
  UNION ALL SELECT 2, 'exact_dedup', (SELECT CAST(count(*) AS BIGINT) FROM ex)
  UNION ALL SELECT 3, 'fuzzy_dedup', (SELECT CAST(count(*) AS BIGINT) FROM fz)
  UNION ALL SELECT 4, 'semantic_dedup', (SELECT CAST(count(*) AS BIGINT) FROM sm)
  UNION ALL SELECT 5, 'budget_sample', (SELECT CAST(count(*) AS BIGINT) FROM sel)
  UNION ALL SELECT 6, 'packed',
    (SELECT CAST(count(DISTINCT seq_id) AS BIGINT) FROM pk)
  UNION ALL SELECT 7, 'sharded', (SELECT CAST(count(*) AS BIGINT) FROM shrd)
) u ORDER BY stage_no
"""


_E2E_CORPUS_SQL = _e2e_corpus_sql(budget=800)


def _e2e_incremental_sql(
    min_tokens: int = 5,
    min_distinct_ratio: float = 0.3,
    jacc: float = 0.2,
    cos_thr: float = 0.35,
    n_clusters: int = 8,
    n_probe: int = 4,
    budget: int = 800,
    seq_budget: int = 512,
    n_shards: int = 16,
) -> str:
    """Full-chain twin of pipeline.e2e_incremental_pipeline on the
    doc_id%10 split: clean → within-delta first-wins → corpus digest
    anti-join → the cross-side MinHash pair set (== delta-bands ⋈
    stored index, the dedup_minhash_incremental oracle identity) → the
    literal-centroid IVF pair set (== sim_embedding_incremental's) →
    budget/pack/shard (the e2e CTEs re-sourced on the incremental
    survivors). Loser sets are computed over the FULL delta slice and
    applied to the survivor chain — value-identical to the operator's
    probe-with-survivors, because both indexes hold only CORPUS
    entries, so each new doc's verdict is independent of every other
    new doc (see the operator docstring)."""
    from sqlstreamstore_spark.analytics.similarity import _static_centroids

    mh = _minhash_ctes(threshold=jacc, src="documents", lead="", cands_only=True)
    cent_rows = ",\n    ".join(
        "({cid}, CAST([{vals}] AS DOUBLE[]))".format(
            cid=cid, vals=", ".join(repr(x) for x in vec)
        )
        for cid, vec in _static_centroids(n_clusters=n_clusters)
    )
    cosf = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
WITH inc AS MATERIALIZED (
  SELECT doc_id, text, source FROM documents WHERE doc_id % 10 = 0
),
q AS MATERIALIZED (
  SELECT doc_id, text, source FROM inc
  WHERE len(string_split(text, ' ')) >= {min_tokens}
    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / CAST(len(string_split(text, ' ')) AS DOUBLE) >= {min_distinct_ratio}
),
exd AS MATERIALIZED (
  SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM q) t WHERE rn = 1
),
exn AS MATERIALIZED (
  SELECT e.* FROM exd e
  WHERE md5(e.text) NOT IN (
    SELECT DISTINCT md5(text) FROM documents WHERE doc_id % 10 <> 0)
),
{mh},
mhl AS (
  SELECT DISTINCT CASE WHEN e.doc_a % 10 = 0 THEN e.doc_a ELSE e.doc_b END AS new_doc
  FROM exact e WHERE (e.doc_a % 10 = 0) <> (e.doc_b % 10 = 0)
),
fz AS MATERIALIZED (
  SELECT e.* FROM exn e WHERE e.doc_id NOT IN (SELECT new_doc FROM mhl)
),
cent(ccid, cv) AS (VALUES
    {cent_rows}
),
sq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       FROM embeddings WHERE vec_id % 10 = 0),
sprobe AS (
  SELECT qid, ccid FROM (
    SELECT sq.qid, c.ccid,
           row_number() OVER (PARTITION BY sq.qid
             ORDER BY {cosf.format(a="c.cv", b="sq.qv")} DESC, c.ccid) AS pr
    FROM sq, cent c) t
  WHERE pr <= {n_probe}),
sce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id % 10 <> 0),
sassigned AS (
  SELECT vec_id, v, ccid FROM (
    SELECT sce.vec_id, sce.v, c.ccid,
           row_number() OVER (PARTITION BY sce.vec_id
             ORDER BY {cosf.format(a="sce.v", b="c.cv")} DESC, c.ccid) AS rk
    FROM sce, cent c) t
  WHERE rk = 1),
seml AS (
  SELECT DISTINCT p.qid AS new_vec
  FROM sassigned a
  JOIN sprobe p ON a.ccid = p.ccid
  JOIN sq ON sq.qid = p.qid
  WHERE a.vec_id <> p.qid
    AND {cosf.format(a="a.v", b="sq.qv")} >= {cos_thr}
),
sm AS MATERIALIZED (
  SELECT f.* FROM fz f WHERE f.doc_id NOT IN (SELECT new_vec FROM seml)
),
bt AS MATERIALIZED (
  SELECT doc_id, source AS src,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {_hexbucket_sql("doc_id")} % 65536 AS hb
  FROM sm),
thr AS (
  SELECT src,
         CAST(least(65536, (CAST({budget} AS HUGEINT) * 65536)
                    // CAST(sum(n_tokens) AS HUGEINT)) AS BIGINT) AS threshold
  FROM bt GROUP BY src),
sel AS MATERIALIZED (SELECT bt.doc_id, bt.n_tokens FROM bt JOIN thr USING (src)
        WHERE bt.hb < thr.threshold),
pk AS MATERIALIZED (
  SELECT CAST((sum(n_tokens) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens)
              // {seq_budget} AS BIGINT) AS seq_id
  FROM sel),
shrd AS (SELECT DISTINCT {_hexbucket_sql("seq_id")} % 65536 % {n_shards} AS s
         FROM pk)
SELECT stage_no, stage, n_rows FROM (
  SELECT 0 AS stage_no, 'delta_raw' AS stage,
         (SELECT CAST(count(*) AS BIGINT) FROM inc) AS n_rows
  UNION ALL SELECT 1, 'quality', (SELECT CAST(count(*) AS BIGINT) FROM q)
  UNION ALL SELECT 2, 'exact_dedup', (SELECT CAST(count(*) AS BIGINT) FROM exd)
  UNION ALL SELECT 3, 'exact_new', (SELECT CAST(count(*) AS BIGINT) FROM exn)
  UNION ALL SELECT 4, 'fuzzy_new', (SELECT CAST(count(*) AS BIGINT) FROM fz)
  UNION ALL SELECT 5, 'semantic_new', (SELECT CAST(count(*) AS BIGINT) FROM sm)
  UNION ALL SELECT 6, 'budget_sample', (SELECT CAST(count(*) AS BIGINT) FROM sel)
  UNION ALL SELECT 7, 'packed',
    (SELECT CAST(count(DISTINCT seq_id) AS BIGINT) FROM pk)
  UNION ALL SELECT 8, 'sharded', (SELECT CAST(count(*) AS BIGINT) FROM shrd)
) u ORDER BY stage_no
"""


_E2E_INCREMENTAL_SQL = _e2e_incremental_sql()


_COOCC_INDEX_CACHE: dict[str, bool] = {}


def _coocc_counts_for(spark: SparkSession, sf: str) -> str:
    """Materialize (once per process per sf) the unfiltered supplier
    co-occurrence pair counts (src, dst, __n) — the shared upstream of
    the seven co-occurrence graph gates (r12, guide §2.1: the lineitem
    basket self-join ran once PER GATE; the three thresholds in use
    are plain filters over this one integer-count frame, so the edge
    sets are identical by construction)."""
    import hashlib

    path = _scratch("coocc_counts_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    if path not in _COOCC_INDEX_CACHE:
        from sqlstreamstore_spark.analytics.graph import supplier_pair_counts

        supplier_pair_counts(_t(spark, sf, "lineitem")).write.mode(
            "overwrite"
        ).parquet(path)
        _COOCC_INDEX_CACHE[path] = True
    return path


def _coocc_edges(spark: SparkSession, sf: str, min_orders: int = 5) -> DataFrame:
    """Thresholded edge view over the shared pair-count index — the
    drop-in replacement for the per-gate supplier_cooccurrence_edges
    derivation (same rows: integer counts filter identically)."""
    return (
        spark.read.parquet(_coocc_counts_for(spark, sf))
        .filter(F.col("__n") >= min_orders)
        .drop("__n")
    )


_DIGEST_INDEX_CACHE: dict[str, bool] = {}


def _digest_index_for(spark: SparkSession, sf: str) -> str:
    """Materialize (once per process per sf) the corpus content-digest
    index over the doc_id%10 != 0 slice."""
    import hashlib

    path = _scratch("digest_index_" + hashlib.md5(sf.encode()).hexdigest()[:10])
    if path not in _DIGEST_INDEX_CACHE:
        corpus = _t(spark, sf, "documents").filter(F.col("doc_id") % 10 != 0)
        dedup.build_digest_index(corpus, path)
        _DIGEST_INDEX_CACHE[path] = True
    return path


def warm_shared_indexes(spark: SparkSession, sf: str, max_workers: int = 4) -> None:
    """Materialize all seven shared per-sf index artifacts (digest,
    banded-LSH minhash, compacted minhash, IVF, LSH-bucket, n-gram,
    term), OVERLAPPING the independent builds from a small driver
    thread pool (r12 optimization, guide §2.6: each build is a chain of
    small jobs with idle task tails on a wide executor — concurrent
    jobs back-fill those tails, and Spark's FIFO scheduler gives the
    earlier build priority). Each builder memoizes into its own cache
    and writes its own path, so the builds are fully independent; a
    second call is a no-op per builder. Results are byte-identical to
    the sequential build — only job SUBMISSION order changes.

    ``inheritable_thread_target`` propagates the session's JVM-thread
    locals (job group/description) into the pool threads, the
    documented way to run concurrent driver jobs from PySpark."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    builders = (
        _digest_index_for,
        _mh_index_for,
        _sem_index_for,
        _lsh_index_for,
        _ngram_index_for,
        _mh_compacted_index_for,
        _term_index_for,
        _coocc_counts_for,
    )

    def _run(fn):
        fn(spark, sf)
        return fn.__name__

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        list(pool.map(inheritable_thread_target(_run), builders))


def _dedup_digest_prefix_probe_query(spark: SparkSession, sf: str) -> DataFrame:
    """r12 (VERDICT r11 #2): partition-PRUNED probe of the materialized
    prefix-partitioned digest index — the delta's distinct 2-hex-char
    digest prefixes become literal PartitionFilters on the index scan
    (plan-pinned in tests/test_round12_ops.py), so a streaming batch's
    exact-dedup read is O(prefix share of index), never O(corpus).
    Results are identical to the corpus anti-join by construction —
    the oracle replays the plain anti-join."""
    docs = _t(spark, sf, "documents")
    path = _digest_index_for(spark, sf)
    return (
        dedup.probe_digest_index(spark, path, docs)
        .select("doc_id")
        .orderBy("doc_id")
    )


_DIGEST_PREFIX_PROBE_SQL = """
SELECT doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM documents c
                  WHERE c.doc_id % 10 != 0 AND md5(c.text) = md5(d.text))
ORDER BY doc_id
"""


def _pipeline_e2e_incremental_query(spark: SparkSession, sf: str) -> DataFrame:
    """The daily-crawl flagship: delta = doc_id%10 == 0 slice, standing
    corpus = the rest; all three corpus indexes (digest, banded LSH,
    IVF) come from the shared per-sf materializations (the same ones
    the individual incremental gates probe) — the exact stage reads
    the digest INDEX, never re-hashing the corpus."""
    docs = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    inc_emb = emb.filter(F.col("vec_id") % 10 == 0)
    mh_path = _mh_index_for(spark, sf)
    ivf_path, cents = _sem_index_for(spark, sf)
    return pipeline.e2e_incremental_pipeline(
        spark, incoming, corpus, inc_emb, mh_path, ivf_path, cents,
        default_budget=800,
        corpus_digest_path=_digest_index_for(spark, sf),
    )


def _dsir_sql(target_lang: str = "en", buckets: int = 8192) -> str:
    """DuckDB twin of sampling.dsir_importance_weights: identical md5
    bucket family, add-1 smoothing, sorted-sequential float fold
    (struct key order c_t, c_s, m matches the Spark array_sort)."""
    hb = _hexbucket_sql("g")
    return f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
uni AS (SELECT doc_id, lang, unnest(w) AS g FROM t),
bg AS (SELECT doc_id, lang,
              unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
       FROM t WHERE len(w) >= 2),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bg),
gbk AS MATERIALIZED (SELECT doc_id, lang, {hb} % {buckets} AS b FROM grams),
stats AS MATERIALIZED (
  SELECT b, CAST(count(*) AS BIGINT) AS c_s,
         CAST(sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS BIGINT) AS c_t
  FROM gbk GROUP BY b),
tot AS (SELECT CAST(COALESCE(sum(c_s), 0) AS BIGINT) AS n_s,
               CAST(COALESCE(sum(c_t), 0) AS BIGINT) AS n_t FROM stats),
per AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS m FROM gbk GROUP BY doc_id, b),
terms AS (
  SELECT doc_id,
         list_sort(list({{'c_t': c_t, 'c_s': c_s, 'm': m}})) AS ts,
         CAST(sum(m) AS BIGINT) AS n_grams
  FROM per JOIN stats USING (b) GROUP BY doc_id)
SELECT doc_id, n_grams,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(ts, s -> CAST(s.m AS DOUBLE)
                 * (ln(CAST(s.c_t + 1 AS DOUBLE)) - ln(CAST(s.c_s + 1 AS DOUBLE))))),
               (a, x) -> a + x)
             + CAST(n_grams AS DOUBLE)
               * (ln(CAST(n_s + {buckets} AS DOUBLE))
                  - ln(CAST(n_t + {buckets} AS DOUBLE))), 6) AS log_weight
FROM terms, tot ORDER BY doc_id
"""


_DSIR_SQL = _dsir_sql()


def _dsir_resample_sql(
    target_lang: str = "en", token_budget: int = 2000, buckets: int = 8192
) -> str:
    """DuckDB twin of sampling.dsir_importance_resample: the same DSIR
    weight CTE chain, then the Gumbel-top-k priority (log_weight −
    ln(−ln u), u = exact 48-bit md5 fraction, ROUNDED to 6 before
    ordering so ULP wobble cannot flip the selection), then a greedy
    BIGINT window cumsum under the token budget."""
    u = (
        f"(CAST({_hexfold(chr(39) + 'dsir:' + chr(39) + ' || CAST(doc_id AS VARCHAR)', 1, 12)}"
        " AS DOUBLE) + 1.0) / 281474976710656.0"
    )
    return f"""
WITH w AS ({_dsir_sql(target_lang, buckets)}),
nt AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       FROM documents),
pri AS (
  SELECT doc_id, n_tokens, log_weight,
         round(log_weight - ln(-ln({u})), 6) AS priority
  FROM w JOIN nt USING (doc_id)),
cum AS (
  SELECT *, CAST(sum(n_tokens) OVER (ORDER BY priority DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM pri)
SELECT doc_id, n_tokens, log_weight, priority, cum_tokens
FROM cum WHERE cum_tokens - n_tokens < {int(token_budget)}
ORDER BY doc_id
"""


_DSIR_RESAMPLE_SQL = _dsir_resample_sql()


def _logreg_train_sql(iters: int = 5, eta: float = 0.5) -> str:
    """Unrolled-CTE twin of pipeline.logreg_train_quality: it0 = zero
    weights + label census, it{t} = one full-batch gradient step from
    it{t-1} (cross-joined 1-row weights — the same algebra the Spark
    plan runs as broadcast crossJoins), then the log-loss pass. The
    iteration count/step are baked into the string so the oracle
    replays the trainer step-for-step."""
    p = "1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2+w3*x3)))"
    ctes = [
        """feats AS (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       1.0 AS x0,
       CAST(len(string_split(text, ' ')) AS DOUBLE) / 256.0 AS x1,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x2,
       CAST(n_chars AS DOUBLE) / 1000.0 AS x3
FROM documents)""",
        """it0 AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(y) AS BIGINT) AS n_pos,
       min(0.0) AS w0, min(0.0) AS w1, min(0.0) AS w2, min(0.0) AS w3
FROM feats)""",
    ]
    prev = "it0"
    for t in range(1, iters + 1):
        grads = ", ".join(
            f"max(w{j}) - {eta} * avg(({p} - y) * x{j}) AS w{j}" for j in range(4)
        )
        ctes.append(
            f"it{t} AS (SELECT max(n_docs) AS n_docs, max(n_pos) AS n_pos, "
            f"{grads} FROM feats, {prev})"
        )
        prev = f"it{t}"
    return (
        "WITH " + ",\n".join(ctes) + f""",
fin AS (SELECT max(n_docs) AS n_docs, max(n_pos) AS n_pos,
       max(w0) AS w0, max(w1) AS w1, max(w2) AS w2, max(w3) AS w3,
       avg(-(y * ln({p}) + (1.0 - y) * ln(1.0 - {p}))) AS loss
FROM feats, {prev})
SELECT n_docs, n_pos,
       round(w0, 6) AS w_bias, round(w1, 6) AS w_len,
       round(w2, 6) AS w_rich, round(w3, 6) AS w_chars,
       round(loss, 6) AS log_loss
FROM fin"""
    )


_LOGREG_TRAIN_SQL = _logreg_train_sql()


def _logreg_infer_sql(iters: int = 5, eta: float = 0.5) -> str:
    """Trained-weight inference twin: replay the train CTE chain, take
    the ROUNDED weights (the exact doubles the train gate publishes),
    score every doc with the same left-assoc sigmoid the Spark side
    builds. MATERIALIZED on the iteration chain so DuckDB does not
    re-inline the T-step training once per consumer."""
    train = _logreg_train_sql(iters=iters, eta=eta)
    head, _tail = train.rsplit("SELECT n_docs", 1)
    head = head.replace("feats AS (", "feats AS MATERIALIZED (", 1)
    return (
        head
        + """, w AS (SELECT round(w0, 6) AS w_bias, round(w1, 6) AS w_len,
       round(w2, 6) AS w_rich, round(w3, 6) AS w_chars FROM fin),
df AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       1.0 AS x0,
       CAST(len(string_split(text, ' ')) AS DOUBLE) / 256.0 AS x1,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x2,
       CAST(n_chars AS DOUBLE) / 1000.0 AS x3
FROM documents)
SELECT doc_id, CAST(y AS BIGINT) AS label,
       round(1.0 / (1.0 + exp(-(w_bias * x0 + w_len * x1
                                + w_rich * x2 + w_chars * x3))), 6) AS p_keep
FROM df, w ORDER BY doc_id"""
    )


_LOGREG_INFER_SQL = _logreg_infer_sql()

# flagship with the TRAINED quality gate (r7 verdict #5); defined after
# _logreg_infer_sql because the trained q-CTE splices its chain in
_E2E_CORPUS_TRAINED_SQL = _e2e_corpus_sql(budget=800, quality_mode="trained")


_MERKLE_SQL = """
WITH h AS (
  SELECT CAST(floor(l_orderkey / 256.0) AS BIGINT) AS bucket,
         CAST(('0x' || substr(md5(
            COALESCE(CAST(l_orderkey AS VARCHAR), '␀null') || '|' ||
            COALESCE(CAST(l_linenumber AS VARCHAR), '␀null') || '|' ||
            COALESCE(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), '␀null') || '|' ||
            COALESCE(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), '␀null') || '|' ||
            COALESCE(CAST(epoch_us(l_shipdate) AS VARCHAR), '␀null')), 1, 15)) AS BIGINT) AS h
  FROM lineitem
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS checksum
FROM h GROUP BY bucket ORDER BY bucket
"""

_RRF_SQL = f"""
WITH {_EVAL_SCORED_CTE},
ranked AS (
  SELECT l.doc_id,
         CAST(row_number() OVER (ORDER BY l.score DESC, l.doc_id) AS BIGINT)
           AS rank_score,
         CAST(row_number() OVER (ORDER BY d.n_chars DESC, l.doc_id) AS BIGINT)
           AS rank_len
  FROM lab l JOIN documents d ON l.doc_id = d.doc_id
)
SELECT doc_id, rank_score, rank_len,
       1.0 / (60.0 + CAST(rank_score AS DOUBLE))
         + 1.0 / (60.0 + CAST(rank_len AS DOUBLE)) AS rrf
FROM ranked ORDER BY doc_id
"""

_TRENDING_SQL = """
WITH toks AS (
  SELECT doc_id % 2 AS epoch, unnest(string_split(text, ' ')) AS token
  FROM documents
),
g AS (
  SELECT token,
         CAST(sum(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM toks GROUP BY token
)
SELECT token, c0, c1,
       round(ln(CAST(c1 + 1 AS DOUBLE) / CAST(c0 + 1 AS DOUBLE)), 9) AS trend_score
FROM g WHERE c0 + c1 >= 5 ORDER BY token
"""

_CHURN_HAZARD_SQL = """
WITH days AS (
  SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS dy
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
users AS (SELECT user_id, min(dy) AS w0, max(dy) AS w1 FROM days GROUP BY user_id),
obs AS (
  SELECT w1 - w0 AS tenure_days,
         CASE WHEN w1 < (SELECT max(w1) FROM users) THEN 1 ELSE 0 END AS churned
  FROM users
),
g AS (SELECT tenure_days, CAST(sum(churned) AS BIGINT) AS d,
             CAST(count(*) - sum(churned) AS BIGINT) AS c
      FROM obs GROUP BY tenure_days),
r AS (SELECT tenure_days, d, c,
             CAST((SELECT sum(d + c) FROM g)
                  - sum(d + c) OVER (ORDER BY tenure_days
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  + d + c AS BIGINT) AS n_risk
      FROM g)
SELECT tenure_days, n_risk, d AS n_churned, c AS n_censored,
       CAST(d AS DOUBLE) / n_risk AS hazard
FROM r ORDER BY tenure_days
"""

_AUC_CI_SQL = f"""
SELECT n_pos, n_neg, auc,
       sqrt((auc * (1.0 - auc)
             + (CAST(n_pos AS DOUBLE) - 1.0)
               * (auc / (2.0 - auc) - auc * auc)
             + (CAST(n_neg AS DOUBLE) - 1.0)
               * (2.0 * auc * auc / (1.0 + auc) - auc * auc))
            / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) AS se,
       auc - 1.96 * sqrt((auc * (1.0 - auc)
             + (CAST(n_pos AS DOUBLE) - 1.0)
               * (auc / (2.0 - auc) - auc * auc)
             + (CAST(n_neg AS DOUBLE) - 1.0)
               * (2.0 * auc * auc / (1.0 + auc) - auc * auc))
            / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) AS ci_low,
       auc + 1.96 * sqrt((auc * (1.0 - auc)
             + (CAST(n_pos AS DOUBLE) - 1.0)
               * (auc / (2.0 - auc) - auc * auc)
             + (CAST(n_neg AS DOUBLE) - 1.0)
               * (2.0 * auc * auc / (1.0 + auc) - auc * auc))
            / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) AS ci_high
FROM ({_ROC_AUC_SQL}) a
"""

_BRAND_HHI_SQL = """
WITH rev AS (
  SELECT p.p_brand,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
),
one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_brands,
         CAST(sum(rev_cents) AS BIGINT) AS total_cents,
         sum(CAST(rev_cents AS HUGEINT) * rev_cents) AS sq_sum
  FROM rev
)
SELECT n_brands, total_cents,
       CAST(sq_sum AS DOUBLE)
         / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE)) AS hhi,
       (CAST(sq_sum AS DOUBLE)
          / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
        - 1.0 / CAST(n_brands AS DOUBLE))
       / (1.0 - 1.0 / CAST(n_brands AS DOUBLE)) AS hhi_normalized
FROM one
"""

_PEAK_CONCURRENCY_SQL = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN gap IS NULL OR gap > 1800 * 1000000 THEN 1 ELSE 0 END AS brk
  FROM base
),
numbered AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
),
sess AS (SELECT min(us) AS start_us, max(us) AS end_us
         FROM numbered GROUP BY user_id, session_no),
deltas AS (
  SELECT us, CAST(sum(delta) AS BIGINT) AS net FROM (
    SELECT start_us AS us, 1 AS delta FROM sess
    UNION ALL
    SELECT end_us + 1, -1 FROM sess) d
  GROUP BY us
),
run AS (
  SELECT us, CAST(sum(net) OVER (ORDER BY us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
  FROM deltas
),
pk AS (SELECT CAST(max(running) AS BIGINT) AS peak FROM run)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions,
       (SELECT peak FROM pk) AS peak,
       min(us) AS first_peak_us
FROM run WHERE running = (SELECT peak FROM pk)
"""

_VOCAB_COVERAGE_SQL = """
WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT unnest(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i+1])) AS gram
  FROM toks WHERE len(w) >= 2
),
freq AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM grams GROUP BY gram),
ranked AS (
  SELECT gram, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, gram) AS BIGINT) AS k,
         CAST(sum(cnt) OVER (ORDER BY cnt DESC, gram
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS covered
  FROM freq
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS vocab_size FROM freq)
SELECT k, vocab_size, covered, total,
       CAST(covered AS DOUBLE) / total AS coverage
FROM ranked, tot WHERE k IN (10, 100, 500) ORDER BY k
"""

_LTV_TRIANGLE_SQL = """
WITH base AS (
  SELECT user_id, CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT) AS wk,
         event_type, value
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
cohorts AS (SELECT user_id, min(wk) AS cohort_week FROM base GROUP BY user_id),
cells AS (
  SELECT c.cohort_week, b.wk - c.cohort_week AS age_weeks,
         CAST(count(DISTINCT b.user_id) AS BIGINT) AS n_purchasers,
         CAST(sum(CAST(round(b.value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM base b JOIN cohorts c USING (user_id)
  WHERE b.event_type = 'purchase' AND b.value IS NOT NULL
  GROUP BY 1, 2
)
SELECT cohort_week, age_weeks, n_purchasers, revenue_cents,
       CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week ORDER BY age_weeks
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_revenue_cents
FROM cells ORDER BY cohort_week, age_weeks
"""

_NEYMAN_SQL = """
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY source
),
s AS (
  SELECT source, n_rows,
         sqrt(CAST(s2 AS DOUBLE) / CAST(n_rows AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(n_rows AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / CAST(n_rows AS DOUBLE))) AS sigma
  FROM g
),
d AS (SELECT sum(CAST(n_rows AS DOUBLE) * sigma) AS den FROM s)
SELECT source, n_rows, round(sigma, 9) AS sigma,
       round(CAST(n_rows AS DOUBLE) * sigma / (SELECT den FROM d), 9) AS alloc_share,
       CAST(floor(1000.0 * (CAST(n_rows AS DOUBLE) * sigma / (SELECT den FROM d)))
            AS BIGINT) AS n_alloc
FROM s ORDER BY source
"""

_DUP_PROFILE_SQL = f"""
WITH sd AS ({_SENTENCE_DEDUP_SQL}),
per AS (SELECT doc_id, n_chunks, n_chunks - n_kept AS n_dup FROM sd)
SELECT least(CAST(9 AS BIGINT),
             CAST(floor((10 * n_dup) / n_chunks) AS BIGINT)) AS dup_decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
       CAST(sum(n_dup) AS BIGINT) AS n_dup_chunks
FROM per GROUP BY 1 ORDER BY dup_decile
"""

_DAU_MAU_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS d,
         user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
contrib AS (
  SELECT DISTINCT day_no, user_id FROM (
    SELECT d + unnest(range(0, 28)) AS day_no, user_id FROM du)
),
mau AS (
  SELECT c.day_no, CAST(count(*) AS BIGINT) AS mau
  FROM contrib c JOIN (SELECT d FROM dau) o ON c.day_no = o.d
  GROUP BY c.day_no
)
SELECT dau.d AS day_no, dau.dau, mau.mau,
       CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
FROM dau JOIN mau ON dau.d = mau.day_no ORDER BY day_no
"""

_GAP_SWEEP_SQL = """
WITH base AS (
  SELECT user_id, epoch_us(ts) AS us, event_id
  FROM events WHERE ts IS NOT NULL
),
lagged AS (
  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
  FROM base
),
swept AS (
  SELECT l.*, g.gap_s
  FROM lagged l, (SELECT unnest([300, 1800, 7200]) AS gap_s) g
),
numbered AS (
  SELECT *,
         sum(CASE WHEN prev_us IS NULL OR us - prev_us > CAST(gap_s AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY gap_s, user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM swept
),
sess AS (
  SELECT gap_s, user_id, session_no, CAST(count(*) AS BIGINT) AS n_events,
         max(us) - min(us) AS dur_us
  FROM numbered GROUP BY 1, 2, 3
)
SELECT CAST(gap_s AS BIGINT) AS gap_s,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
       CAST(sum(dur_us) AS BIGINT) AS total_duration_us,
       CAST(max(dur_us) AS BIGINT) AS max_duration_us
FROM sess GROUP BY gap_s ORDER BY gap_s
"""

_BURN_RATE_SQL = """
WITH hourly AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
contrib AS (
  SELECT h + off AS hour_epoch, n_total, n_errors FROM (
    SELECT h, n_total, n_errors, unnest(range(0, 6)) AS off FROM hourly)
),
trail AS (
  SELECT c.hour_epoch,
         CAST(sum(c.n_total) AS BIGINT) AS long_total,
         CAST(sum(c.n_errors) AS BIGINT) AS long_errors
  FROM contrib c JOIN (SELECT h FROM hourly) o ON c.hour_epoch = o.h
  GROUP BY c.hour_epoch
)
SELECT h.h AS hour_epoch, h.n_total, h.n_errors,
       (CAST(h.n_errors AS DOUBLE) / h.n_total) / 0.25 AS short_burn,
       (CAST(t.long_errors AS DOUBLE) / t.long_total) / 0.25 AS long_burn,
       ((CAST(h.n_errors AS DOUBLE) / h.n_total) / 0.25 > 1.0
        AND (CAST(t.long_errors AS DOUBLE) / t.long_total) / 0.25 > 1.0) AS alert
FROM hourly h JOIN trail t ON h.h = t.hour_epoch ORDER BY hour_epoch
"""

_THEIL_SEN_SQL = """
WITH counts AS (
  SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day_no,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
spine AS (
  SELECT unnest(range((SELECT min(day_no) FROM counts),
                      (SELECT max(day_no) FROM counts) + 1)) AS day_no
),
filled AS (
  SELECT s.day_no, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
  FROM spine s LEFT JOIN counts c USING (day_no)
),
slopes AS (
  SELECT CAST(b.cnt - a.cnt AS DOUBLE)
           / CAST(b.day_no - a.day_no AS DOUBLE) AS slope
  FROM filled a JOIN filled b ON a.day_no < b.day_no
),
rs AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rk FROM slopes),
np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM slopes),
m1 AS (
  SELECT avg(slope) AS slope_per_day FROM rs, np
  WHERE rk = CAST(floor((n + 1) / 2.0) AS BIGINT)
     OR rk = CAST(floor(n / 2.0) AS BIGINT) + 1
),
resid AS (
  SELECT CAST(f.cnt AS DOUBLE) - m1.slope_per_day * f.day_no AS r
  FROM filled f, m1
),
rr AS (SELECT r, row_number() OVER (ORDER BY r) AS rk FROM resid),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM filled),
m2 AS (
  SELECT avg(r) AS intercept FROM rr, nd
  WHERE rk = CAST(floor((n + 1) / 2.0) AS BIGINT)
     OR rk = CAST(floor(n / 2.0) AS BIGINT) + 1
)
SELECT (SELECT n FROM np) AS n_pairs, (SELECT n FROM nd) AS n_days,
       m1.slope_per_day, m2.intercept
FROM m1, m2
"""

_ASSORTATIVITY_SQL = """
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
pairs AS (
  SELECT a.brand AS ba, b.brand AS bb, CAST(count(*) AS BIGINT) AS c
  FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
),
rp AS (SELECT c, row_number() OVER (ORDER BY c) AS rk FROM pairs),
np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pairs),
medp AS (
  SELECT avg(c) AS med_support FROM rp, np
  WHERE rk = CAST(floor((n + 1) / 2.0) AS BIGINT)
     OR rk = CAST(floor(n / 2.0) AS BIGINT) + 1
),
und AS (
  SELECT ba, bb FROM pairs, medp WHERE c >= 1.2 * med_support
),
directed AS (SELECT ba, bb FROM und UNION ALL SELECT bb, ba FROM und),
deg AS (SELECT ba, CAST(count(*) AS BIGINT) AS deg FROM directed GROUP BY ba),
ends AS (
  SELECT da.deg AS dx, db.deg AS dy
  FROM directed d JOIN deg da ON d.ba = da.ba JOIN deg db ON d.bb = db.ba
),
mm AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         CAST(sum(dx * dy) AS BIGINT) AS sxy,
         CAST(sum(dx * dx) AS BIGINT) AS sxx,
         CAST(sum(dy * dy) AS BIGINT) AS syy
  FROM ends
)
SELECT CAST(m / 2 AS BIGINT) AS n_edges, m AS n_directed,
       CAST(m * sxy - sx * sy AS DOUBLE)
         / nullif(sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(m * syy - sy * sy AS DOUBLE)), 0.0)
         AS assortativity
FROM mm
"""

_ALERT_EPISODES_SQL = """
WITH hourly AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
contrib AS (
  SELECT h + off AS hour_epoch, n_total, n_errors FROM (
    SELECT h, n_total, n_errors, unnest(range(0, 6)) AS off FROM hourly)
),
trail AS (
  SELECT c.hour_epoch,
         CAST(sum(c.n_total) AS BIGINT) AS long_total,
         CAST(sum(c.n_errors) AS BIGINT) AS long_errors
  FROM contrib c JOIN (SELECT h FROM hourly) o ON c.hour_epoch = o.h
  GROUP BY c.hour_epoch
),
alerts AS (
  SELECT h.h AS hour_epoch
  FROM hourly h JOIN trail t ON h.h = t.hour_epoch
  WHERE (CAST(h.n_errors AS DOUBLE) / h.n_total) / 0.25 > 1.0
    AND (CAST(t.long_errors AS DOUBLE) / t.long_total) / 0.25 > 1.0
),
islands AS (
  SELECT hour_epoch,
         hour_epoch - row_number() OVER (ORDER BY hour_epoch) AS grp
  FROM alerts
),
eps AS (SELECT grp, CAST(count(*) AS BIGINT) AS len FROM islands GROUP BY grp)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM hourly) AS n_hours,
       CAST(count(*) AS BIGINT) AS n_episodes,
       CAST(COALESCE(max(len), 0) AS BIGINT) AS longest_episode,
       CAST(COALESCE(sum(len), 0) AS BIGINT) AS alert_hours,
       CAST(2 * count(*) AS BIGINT) AS max_flaps
FROM eps
"""

_LEXICAL_RICHNESS_SQL = """
WITH st AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY source, token
),
g AS (
  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM st GROUP BY source
)
SELECT source, n_tokens, n_types, n_hapax,
       CAST(n_types AS DOUBLE) / n_tokens AS ttr,
       CAST(n_hapax AS DOUBLE) / n_types AS hapax_share
FROM g ORDER BY source
"""

_HILL_SQL = """
WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT unnest(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i+1])) AS token
  FROM toks WHERE len(w) >= 2
),
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS f FROM grams GROUP BY token),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, token) AS rk FROM freq
),
th AS (SELECT f AS f_threshold FROM ranked WHERE rk = 51),
top AS (SELECT r.f, t.f_threshold FROM ranked r, th t WHERE r.rk <= 50)
SELECT CAST(count(*) AS BIGINT) AS k,
       CAST(max(f_threshold) AS BIGINT) AS f_threshold,
       round(count(*) / sum(ln(CAST(f AS DOUBLE) / f_threshold)), 9)
         AS alpha_hill
FROM top
"""

_CANDIDATE_KEYS_SQL = """
WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
c1 AS (SELECT CAST(count(*) AS BIGINT) AS d
       FROM (SELECT DISTINCT event_id FROM events)),
c2 AS (SELECT CAST(count(*) AS BIGINT) AS d
       FROM (SELECT DISTINCT user_id, ts FROM events)),
c3 AS (SELECT CAST(count(*) AS BIGINT) AS d
       FROM (SELECT DISTINCT user_id, ts, event_type FROM events))
SELECT * FROM (
  SELECT 'event_id' AS candidate, t.n AS n_rows, c1.d AS n_distinct,
         c1.d = t.n AS is_key, CAST(c1.d AS DOUBLE) / t.n AS uniqueness
  FROM t, c1
  UNION ALL
  SELECT 'user_id,ts', t.n, c2.d, c2.d = t.n, CAST(c2.d AS DOUBLE) / t.n
  FROM t, c2
  UNION ALL
  SELECT 'user_id,ts,event_type', t.n, c3.d, c3.d = t.n,
         CAST(c3.d AS DOUBLE) / t.n
  FROM t, c3
) ORDER BY candidate
"""

_CLASS_REPORT_SQL = f"""
WITH {_EVAL_SCORED_CTE},
one AS (
  SELECT CAST(sum(CASE WHEN score_num >= 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN score_num >= 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN score_num < 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN score_num < 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored)
SELECT tp, fp, fn, tn,
       CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy,
       CAST(tp AS DOUBLE) / (tp + fp) AS prec,
       CAST(tp AS DOUBLE) / (tp + fn) AS recall,
       CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1,
       CAST((tp + fp + fn + tn) * (tp + tn)
            - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) AS DOUBLE)
         / ((tp + fp + fn + tn) * (tp + fp + fn + tn)
            - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))) AS kappa
FROM one
"""


def analytics_queries():
    """name → (spark_fn, oracle_sql | None). None = rows-only check
    (non-SQL-expressible: engine-specific hash families)."""
    return {
        **round10b_queries(),
        **round11_queries(),
        # TPC-H
        "tpch_q1": (lambda s, sf: tpch.q1_pricing_summary(_t(s, sf, "lineitem")), _Q1_SQL),
        "tpch_q3": (
            lambda s, sf: tpch.q3_shipping_priority(
                _t(s, sf, "customer"), _t(s, sf, "orders"), _t(s, sf, "lineitem")
            ),
            _Q3_SQL,
        ),
        "tpch_q5": (
            lambda s, sf: tpch.q5_local_supplier_volume(
                _t(s, sf, "customer"), _t(s, sf, "orders"), _t(s, sf, "lineitem"),
                _t(s, sf, "supplier"), _t(s, sf, "nation"), _t(s, sf, "region"),
            ),
            _Q5_SQL,
        ),
        "tpch_q6": (lambda s, sf: tpch.q6_forecast_revenue(_t(s, sf, "lineitem")), _Q6_SQL),
        "tpch_q10": (
            lambda s, sf: tpch.q10_returned_items(
                _t(s, sf, "customer"), _t(s, sf, "orders"), _t(s, sf, "lineitem"), _t(s, sf, "nation")
            ),
            _Q10_SQL,
        ),
        "tpch_q4_semijoin": (
            lambda s, sf: tpch.order_priority_with_lineitems(_t(s, sf, "orders"), _t(s, sf, "lineitem")),
            _Q4_SEMI_SQL,
        ),
        "tpch_rollup": (lambda s, sf: tpch.rollup_returns(_t(s, sf, "lineitem")), _ROLLUP_SQL),
        "tpch_q7": (
            lambda s, sf: tpch.q7_volume_shipping(
                _t(s, sf, "supplier"), _t(s, sf, "lineitem"), _t(s, sf, "orders"),
                _t(s, sf, "customer"), _t(s, sf, "nation")),
            _Q7_SQL,
        ),
        "tpch_q8": (
            lambda s, sf: tpch.q8_market_share(
                _t(s, sf, "part"), _t(s, sf, "supplier"), _t(s, sf, "lineitem"),
                _t(s, sf, "orders"), _t(s, sf, "customer"), _t(s, sf, "nation"),
                _t(s, sf, "region")),
            _Q8_SQL,
        ),
        "tpch_q14": (
            lambda s, sf: tpch.q14_promo_revenue(_t(s, sf, "lineitem"), _t(s, sf, "part")),
            _Q14_SQL,
        ),
        "tpch_q15": (
            lambda s, sf: tpch.q15_top_supplier(_t(s, sf, "lineitem"), _t(s, sf, "supplier")),
            _Q15_SQL,
        ),
        "tpch_q18": (
            lambda s, sf: tpch.q18_large_orders(
                _t(s, sf, "customer"), _t(s, sf, "orders"), _t(s, sf, "lineitem")),
            _Q18_SQL,
        ),
        "tpch_q9": (
            lambda s, sf: tpch.q9_profit_by_nation_year(
                _t(s, sf, "lineitem"), _t(s, sf, "orders"),
                _t(s, sf, "supplier"), _t(s, sf, "nation")),
            _Q9_SQL,
        ),
        "tpch_q13": (
            lambda s, sf: tpch.q13_customer_distribution(
                _t(s, sf, "customer"), _t(s, sf, "orders")),
            _Q13_SQL,
        ),
        "tpch_q17": (
            lambda s, sf: tpch.q17_small_quantity_revenue(
                _t(s, sf, "lineitem"), _t(s, sf, "part")),
            _Q17_SQL,
        ),
        "tpch_q19": (
            lambda s, sf: tpch.q19_discounted_revenue(
                _t(s, sf, "lineitem"), _t(s, sf, "part")),
            _Q19_SQL,
        ),
        "tpch_q2_min_cost": (
            lambda s, sf: tpch.q2_min_cost_supplier(
                _t(s, sf, "lineitem"), _t(s, sf, "supplier"), _t(s, sf, "part"),
                _t(s, sf, "nation"), _t(s, sf, "region")),
            _Q2_MIN_COST_SQL,
        ),
        "tpch_q12_priority": (
            lambda s, sf: tpch.q12_priority_split(
                _t(s, sf, "lineitem"), _t(s, sf, "orders")),
            _Q12_PRIORITY_SQL,
        ),
        "tpch_q16_supplier_count": (
            lambda s, sf: tpch.q16_supplier_count(
                _t(s, sf, "part"), _t(s, sf, "lineitem"), _t(s, sf, "supplier")),
            _Q16_SUPPLIER_CNT_SQL,
        ),
        "tpch_q21_waiting": (
            lambda s, sf: tpch.q21_waiting_suppliers(
                _t(s, sf, "supplier"), _t(s, sf, "lineitem"), _t(s, sf, "orders"),
                _t(s, sf, "nation")),
            _Q21_WAITING_SQL,
        ),
        "tpch_q22_no_orders": (
            lambda s, sf: tpch.q22_global_sales(
                _t(s, sf, "customer"), _t(s, sf, "orders")),
            _Q22_GLOBAL_SALES_SQL,
        ),
        "tpch_q11_important_stock": (
            lambda s, sf: tpch.q11_important_stock(
                _t(s, sf, "lineitem"), _t(s, sf, "supplier"), _t(s, sf, "nation")),
            _Q11_IMPORTANT_STOCK_SQL,
        ),
        "tpch_q20_dominant_supp": (
            lambda s, sf: tpch.q20_dominant_suppliers(
                _t(s, sf, "lineitem"), _t(s, sf, "supplier"), _t(s, sf, "part"),
                _t(s, sf, "nation")),
            _Q20_DOMINANT_SUPP_SQL,
        ),
        # bucketed physical layout: same values as an ordinary join,
        # but the persisted tables co-locate on the join key so no
        # exchange feeds the join (plan pinned in tests/test_plans)
        "tpch_bucketed_join_revenue": (
            _bucketed_join_query,
            """SELECT o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
        ),
        "window_order_gaps": (
            lambda s, sf: tpch.order_gap_stats(
                _t(s, sf, "orders"), _t(s, sf, "customer")),
            _ORDER_GAPS_SQL,
        ),
        "stats_ntile_deciles": (
            lambda s, sf: tpch.ntile_deciles(_t(s, sf, "orders")),
            _NTILE_DECILES_SQL,
        ),
        # production twin: approx_percentile boundaries + broadcast range
        # lookup — no WindowExec. Gate runs at RANK-EXACT accuracy
        # (sketch keeps all samples; boundary = value at rank ceil(q*N)),
        # so the whole row is DuckDB-oracled (r4 verdict #2); production
        # default stays accuracy=10_000, invariants pinned in pytest.
        "stats_ntile_deciles_approx": (
            lambda s, sf: tpch.ntile_deciles_approx(
                _t(s, sf, "orders"), accuracy=10_000_000
            ),
            _ntile_deciles_approx_oracle(),
        ),
        # Z-order layout: the Morton value both engines compute with
        # identical integer scaling + bit interleave — the clustering
        # key behind multi-column data skipping (sources/zorder.py;
        # write/prune path pinned in tests/test_zorder.py)
        "layout_zorder_values": (_zorder_values_query, _zorder_oracle_sql()),
        # the k-column generalization (ZORDER BY three columns)
        "layout_zorder3_values": (_zorder3_values_query, _zorder3_oracle_sql()),
        # the READ path: write z-ordered, prune via the min/max
        # manifest, assert buckets were skipped, hash-match the
        # full-scan-filter oracle (r4 verdict #4)
        "layout_zorder_pruned_scan": (_zorder_pruned_scan_query, _ZPS_SQL),
        # incremental aggregate maintenance: rollup(80%) merged with
        # rollup(20%) must hash-equal the full recompute (monoid state,
        # presentation derived at read time)
        "incremental_rollup_merge": (_incremental_rollup_query, _INCR_ROLLUP_SQL),
        # distribution drift: exact two-sample KS with an INTEGER-exact
        # numerator (two-phase cumsum, no single-partition window over
        # values), its bounded-state binned production twin (gate at
        # rank-exact accuracy, oracled; binned<=exact at production
        # accuracy pinned in pytest), and Pearson chi2 over a
        # categorical contingency table (analytics/drift.py)
        "drift_ks_exact": (_drift_ks_query, _drift_ks_oracle()),
        # incremental QUANTILES: mergeable histogram state (bin counts
        # are a monoid even though quantiles aren't) — 80/20 split,
        # state-merge, p90 bin per group; integer-exact vs the full
        # recompute
        "incremental_histogram_p90": (_incr_hist_query, _incr_hist_oracle()),
        # snapshot-to-snapshot corpus diff (added/removed/changed/
        # unchanged by digest over a key-only full-outer join) and the
        # join-key skew report that justifies salting decisions
        "dq_corpus_diff": (_corpus_diff_query, _CORPUS_DIFF_SQL),
        "dq_key_skew": (_key_skew_query, _KEY_SKEW_SQL),
        # robust (median/MAD) per-group outlier bounds — the heavy-tail-
        # safe twin of the z-score anomaly op
        "dq_robust_outliers": (_robust_outliers_query, _ROBUST_OUTLIERS_SQL),
        # token-BUDGET-driven domain mixture: per-source thresholds
        # derived from measured totals in DECIMAL/HUGEINT (trillion-
        # token budgets overflow BIGINT*65536), hash-deterministic
        # selection, per-source accounting summary
        "sampling_budget_mixture": (_budget_mixture_query, _budget_mixture_oracle()),
        "drift_ks_binned": (_drift_ks_binned_query, _drift_ks_binned_oracle()),
        # PSI: the production drift score (ref-anchored bins, half-count
        # smoothing), same rank-exact-bounds machinery as binned KS
        "drift_psi": (_drift_psi_query, _drift_psi_oracle()),
        # Benford first-digit forensic audit (integer-cents digit, no
        # libm in the digit path)
        "dq_benford": (_benford_query, _benford_oracle()),
        # RFM quintile segmentation via rank-exact boundary arrays —
        # no global NTILE funnel
        "events_rfm": (_rfm_query, _rfm_oracle()),
        # pairwise source-distribution JSD (corpus-mixing diagnostic)
        "text_jsd_sources": (_jsd_query, _JSD_SQL),
        # TextRank keywords: weighted PageRank over the word
        # co-occurrence graph, 3 unrolled iterations in the oracle
        "text_textrank": (_textrank_query, _textrank_oracle()),
        "drift_chi2_types": (_drift_chi2_query, _CHI2_DRIFT_SQL),
        "stats_corr_regr": (
            lambda s, sf: tpch.corr_regr_stats(_t(s, sf, "lineitem")),
            _CORR_REGR_SQL,
        ),
        "topk_orders_per_customer": (
            lambda s, sf: tpch.top_orders_per_customer(_t(s, sf, "orders")),
            _TOPK_ORDERS_SQL,
        ),
        # the hot-key-safe twins must produce IDENTICAL results — same
        # oracles; at scale the salted two-phase ranking replaces the
        # direct window when one key dominates (AQE can't split a window
        # partition), and the salted join spreads a hot join key across
        # `salt` reducers
        "topk_orders_salted": (
            lambda s, sf: _salted_topk_query(s, sf),
            _TOPK_ORDERS_SQL,
        ),
        "salted_join_order_totals": (
            lambda s, sf: _salted_join_query(s, sf),
            _SALTED_JOIN_SQL,
        ),
        # events
        "sessions_per_user": (
            lambda s, sf: events.sessions_per_user(_t(s, sf, "events")),
            _SESSIONS_SQL,
        ),
        "events_per_type_day": (
            lambda s, sf: events.events_per_type_day(_t(s, sf, "events")),
            _EVENTS_DAY_SQL,
        ),
        "events_hourly_windows": (
            lambda s, sf: events.events_hourly_windows(_t(s, sf, "events")),
            _HOURLY_WINDOWS_SQL,
        ),
        "asof_join_last_order": (_asof_query, _ASOF_SQL),
        "events_transitions": (
            lambda s, sf: events.event_transitions(_t(s, sf, "events")),
            _TRANSITIONS_SQL,
        ),
        "events_funnel": (
            lambda s, sf: events.funnel_conversion(_t(s, sf, "events")),
            _FUNNEL_SQL,
        ),
        "events_cohort_retention": (
            lambda s, sf: events.cohort_retention(_t(s, sf, "events")),
            _COHORT_SQL,
        ),
        "range_join_error_window": (_range_join_query, _RANGE_JOIN_SQL),
        # interval x interval overlap (sessions-vs-incidents shape):
        # grid-cell equi-join + canonical-cell dedup, one shuffle
        "range_join_interval_overlap": (
            _interval_overlap_query,
            _INTERVAL_OVERLAP_SQL,
        ),
        # per-user EWMA (linear recurrence — the honest applyInPandas
        # case); oracle replays the closed form, both engines round(4)
        "events_ewma": (_events_ewma_query, _EWMA_SQL),
        # trailing-24h distinct users per hour: exact (pair explode)
        # and the bounded-state HLL register-merge twin
        "events_rolling_distinct": (
            lambda s, sf: events.rolling_distinct_users(_t(s, sf, "events")),
            _ROLLING_DISTINCT_SQL,
        ),
        "events_rolling_distinct_hll": (
            lambda s, sf: events.rolling_distinct_users_hll(_t(s, sf, "events")),
            _ROLLING_HLL_SQL,
        ),
        # SCD type-2 dimension build from the change log (collapse
        # no-op updates, lead() closes versions, -1 = open)
        "events_scd2_versions": (
            lambda s, sf: events.scd2_versions(_t(s, sf, "events")),
            _SCD2_SQL,
        ),
        # token-weighted median document length per source — integer
        # threshold arithmetic (2*cum >= total), hash-exact
        "stats_weighted_median": (
            lambda s, sf: relational.weighted_median(_t(s, sf, "documents")),
            _WEIGHTED_MEDIAN_SQL,
        ),
        # per-source token-distribution entropy + ln(V)-normalized
        # diversity (templated-source detector)
        "stats_entropy_by_source": (
            lambda s, sf: text.source_token_entropy(_t(s, sf, "documents")),
            _ENTROPY_SQL,
        ),
        # temperature-scaled domain mixture (XLM-R resampling rule):
        # q_s ∝ n_s^α, per-source thresholds, content-hash selection
        "sampling_temperature_mixture": (
            lambda s, sf: sampling.temperature_mixture_sample(
                _t(s, sf, "documents")
            ),
            _TEMPERATURE_MIXTURE_SQL,
        ),
        # Heaps-law vocabulary growth at 50 fixed checkpoints (the
        # running total windows over 50 rows at any corpus size)
        "text_vocab_growth": (
            lambda s, sf: text.vocab_growth(_t(s, sf, "documents")),
            _VOCAB_GROWTH_SQL,
        ),
        # sessionize into a session TABLE (start/end/duration/count) —
        # the batch twin of streaming session_window
        "events_session_table": (
            lambda s, sf: events.session_table(_t(s, sf, "events")),
            _SESSION_TABLE_SQL,
        ),
        # attribution-window funnel (each stage must land within 7 d
        # of the previous stage's first hit)
        "events_funnel_windowed": (
            lambda s, sf: events.funnel_windowed(_t(s, sf, "events")),
            _FUNNEL_WINDOWED_SQL,
        ),
        # text
        "text_token_stats": (lambda s, sf: text.token_stats(_t(s, sf, "documents")), _TOKEN_STATS_SQL),
        "text_quality": (lambda s, sf: text.quality_score(_t(s, sf, "documents")), _QUALITY_SQL),
        "text_langid": (lambda s, sf: text.language_id(_t(s, sf, "documents")), _LANGID_SQL),
        "text_fingerprint": (lambda s, sf: text.fingerprint(_t(s, sf, "documents")), _FINGERPRINT_SQL),
        # dedup
        "dedup_exact": (
            lambda s, sf: dedup.exact_dedup_groups(_t(s, sf, "documents")),
            _EXACT_DEDUP_SQL,
        ),
        "dedup_ngram_jaccard": (
            lambda s, sf: dedup.ngram_jaccard_pairs(
                _t(s, sf, "documents").filter(F.col("doc_id") < 300), threshold=0.2
            ),
            _NGRAM_JACCARD_SQL,
        ),
        # exact-recall scale path: prefix-filtered self-join, same
        # oracle as the plain shingle self-join (outputs must be equal)
        "dedup_jaccard_prefix": (
            lambda s, sf: dedup.jaccard_prefix_pairs(
                _t(s, sf, "documents").filter(F.col("doc_id") < 300), threshold=0.2
            ),
            _NGRAM_JACCARD_SQL,
        ),
        "dedup_minhash_lsh": (
            lambda s, sf: dedup.minhash_dedup_pairs(
                _t(s, sf, "documents").filter(F.col("doc_id") < 300), threshold=0.2
            ),
            _MINHASH_LSH_SQL,  # md5 hash family — DuckDB computes identical signatures
        ),
        "dedup_minhash_recall": (
            lambda s, sf: dedup.minhash_lsh_recall(
                _t(s, sf, "documents").filter(F.col("doc_id") < 300), threshold=0.2
            ),
            _MINHASH_RECALL_SQL,
        ),
        "text_ngram_novelty": (
            lambda s, sf: text.ngram_novelty(_t(s, sf, "documents")),
            _NGRAM_NOVELTY_SQL,
        ),
        "dedup_substring_spans": (
            lambda s, sf: dedup.substring_dup_spans(_t(s, sf, "documents")),
            _SUBSTRING_SPANS_SQL,
        ),
        "dedup_bloom_prefilter": (_bloom_gate, _BLOOM_PREFILTER_SQL),
        # MOSS winnowing containment pairs: packed rightmost-min key
        # makes the selection a single windowed min, replayed exactly
        "dedup_winnow_pairs": (
            lambda s, sf: dedup.winnow_shared_pairs(_t(s, sf, "documents")),
            _winnow_sql(),
        ),
        # directional subset detection: |A∩B|/|A| — the quote/boilerplate
        # case symmetric Jaccard scores low; exact int/int division
        "dedup_containment": (
            lambda s, sf: dedup.containment_pairs(
                _t(s, sf, "documents"), threshold=0.5
            ),
            _CONTAINMENT_SQL,
        ),
        # leakage-free split: the GROUP key is hashed, never the row —
        # all of a user's events share a split (GroupShuffleSplit)
        "sampling_group_split": (
            lambda s, sf: sampling.group_split(
                _t(s, sf, "events").select("event_id", "user_id"), "user_id"
            ).orderBy("event_id"),
            _GROUP_SPLIT_SQL,
        ),
        "sampling_weighted_aes": (
            lambda s, sf: sampling.weighted_sample_aes(_t(s, sf, "documents")),
            _WEIGHTED_AES_SQL,
        ),
        "stats_cms_freq": (
            lambda s, sf: text.cms_token_freq(_t(s, sf, "documents")),
            _CMS_FREQ_SQL,
        ),
        "text_unigram_logprob": (
            lambda s, sf: text.unigram_logprob(_t(s, sf, "documents")),
            _UNIGRAM_LOGPROB_SQL,
        ),
        # add-one-smoothed bigram LM (order-sensitive quality score);
        # same sorted-sequential-fold float discipline as the unigram
        # interpolated Kneser-Ney bigram scoring (r12): the CCNet-class
        # perplexity-filter smoothing — absolute discount + continuation
        # backoff, exact-count arithmetic, sorted fold
        "text_kneser_ney_bigram": (
            lambda s, sf: text.kneser_ney_bigram(_t(s, sf, "documents")),
            _KNESER_NEY_SQL,
        ),
        "text_bigram_logprob": (
            lambda s, sf: text.bigram_logprob(_t(s, sf, "documents")),
            _BIGRAM_LOGPROB_SQL,
        ),
        # BM25 lexical retrieval vs a literal query; full scored set
        # ordered by doc_id (a top-k on a libm value could ulp-flip)
        "text_bm25_scores": (
            lambda s, sf: text.bm25_scores(_t(s, sf, "documents")),
            _BM25_SQL,
        ),
        # top-k collocations: ranking key is an exact-rational double
        # (never a libm value), so the cut is engine-stable
        "text_collocations_pmi": (
            lambda s, sf: text.collocations_pmi(_t(s, sf, "documents")),
            _COLLOCATIONS_SQL,
        ),
        "stats_kmv_distinct": (
            lambda s, sf: text.kmv_distinct_ngrams(_t(s, sf, "documents")),
            _KMV_SQL,
        ),
        "stats_kmv_by_source": (
            lambda s, sf: text.kmv_distinct_ngrams_by_source(_t(s, sf, "documents")),
            _KMV_BY_SOURCE_SQL,
        ),
        # HyperLogLog cardinality sketch (fixed 256-register file,
        # merge-by-max) next to the exact count it estimates; the
        # whole estimate chain is exact-integer + literal-constant
        # IEEE arithmetic, so it hash-matches with zero tolerance
        "stats_hll_distinct": (
            lambda s, sf: text.hll_distinct_ngrams(_t(s, sf, "documents")),
            _HLL_SQL,
        ),
        "events_daily_anomaly": (
            lambda s, sf: events.daily_anomaly(_t(s, sf, "events")),
            _DAILY_ANOMALY_SQL,
        ),
        "events_gap_fill": (
            lambda s, sf: events.daily_gap_fill(_t(s, sf, "events")),
            _GAP_FILL_SQL,
        ),
        "dq_profile_orders": (
            lambda s, sf: quality.profile_columns(
                _t(s, sf, "orders"), list(_DQ_PROFILE_COLS)),
            _DQ_PROFILE_SQL,
        ),
        "dq_referential_orphans": (
            lambda s, sf: quality.referential_orphans([
                ("lineitem->orders", _t(s, sf, "lineitem"), "l_orderkey",
                 _t(s, sf, "orders"), "o_orderkey"),
                ("lineitem->part", _t(s, sf, "lineitem"), "l_partkey",
                 _t(s, sf, "part"), "p_partkey"),
                ("lineitem->supplier", _t(s, sf, "lineitem"), "l_suppkey",
                 _t(s, sf, "supplier"), "s_suppkey"),
                ("orders->customer", _t(s, sf, "orders"), "o_custkey",
                 _t(s, sf, "customer"), "c_custkey"),
            ]),
            _DQ_ORPHANS_SQL,
        ),
        "dq_duplicate_keys": (
            lambda s, sf: quality.duplicate_keys([
                ("customer.c_custkey", _t(s, sf, "customer"), ["c_custkey"]),
                ("documents.doc_id", _t(s, sf, "documents"), ["doc_id"]),
                ("lineitem.(orderkey,linenumber)", _t(s, sf, "lineitem"),
                 ["l_orderkey", "l_linenumber"]),
                ("orders.o_orderkey", _t(s, sf, "orders"), ["o_orderkey"]),
            ]),
            _DQ_DUPKEYS_SQL,
        ),
        "events_cumulative_reach": (
            lambda s, sf: events.cumulative_reach(_t(s, sf, "events")),
            _CUMULATIVE_REACH_SQL,
        ),
        # time-RANGE sliding frame (velocity features): DECIMAL inside
        # the frame makes the sum order-independent — hash-exact, no
        # rounding; the frame key is integer epoch micros on both sides
        "events_sliding_1h": (
            lambda s, sf: events.sliding_value_window(
                _t(s, sf, "events"), minutes=60
            ),
            _SLIDING_1H_SQL,
        ),
        # per-source quality percentile gate: grouped percentile_approx
        # at rank-exact accuracy (the ntile_deciles_approx precedent);
        # score is an exact int/int division — hash-exact unrounded
        "pipeline_quality_gate": (
            lambda s, sf: pipeline.quality_percentile_gate(
                _t(s, sf, "documents"), q=0.5, accuracy=1_000_000
            ),
            _QUALITY_GATE_SQL,
        ),
        # quantile normalization: rank arithmetic is exact-int-in-double
        # and calibrated values are members of the pooled score set —
        # hash-exact, no rounding; the rank lookup is the global as-of
        # (two-phase last-carry, no single-partition window)
        "pipeline_quantile_normalize": (
            lambda s, sf: pipeline.quantile_normalize_scores(
                _t(s, sf, "documents")
            ),
            _QNORM_SQL,
        ),
        "text_vocabulary": (
            lambda s, sf: text.corpus_vocabulary(_t(s, sf, "documents")),
            _VOCAB_SQL,
        ),
        "text_source_rollup": (
            lambda s, sf: _round_cols(
                text.source_quality_rollup(_t(s, sf, "documents")),
                ("avg_tokens", "avg_distinct_ratio", "dup_rate")),
            _SOURCE_ROLLUP_SQL,
        ),
        "text_tfidf_top_terms": (
            lambda s, sf: _round_cols(
                text.tf_idf_top_terms(_t(s, sf, "documents")), ("tfidf",)),
            _TFIDF_SQL,
        ),
        "sampling_deterministic": (
            lambda s, sf: sampling.deterministic_sample(
                _t(s, sf, "documents").select("doc_id", "lang"), "doc_id", 0.25
            ).orderBy("doc_id"),
            _SAMPLE_SQL,
        ),
        "sampling_hash_split": (
            lambda s, sf: sampling.hash_split(
                _t(s, sf, "documents").select("doc_id"), "doc_id", 0.9
            ).orderBy("doc_id"),
            _SPLIT_SQL,
        ),
        # PQ ANN: trained path is rows-only (Lloyd iterations aren't
        # SQL-expressible — same regime as sim_cosine_topk_ivf); the
        # deployed static-codebook twin is fully oracled end to end
        # (encode, ADC scan, candidate cut, exact re-rank).
        # recall@10 >= 0.4 inequality gate vs brute force (r11; exact
        # values oracled by sim_cosine_topk_pq_static)
        "sim_cosine_topk_pq": (_sim_topk_pq_query, _ANN_PQ_RECALL_SQL),
        "sim_cosine_topk_pq_static": (_sim_topk_pq_static_query, _PQ_STATIC_SQL),
        "sampling_stratified_sources": (
            lambda s, sf: sampling.stratified_sample_by_source(
                _t(s, sf, "documents"),
                rates={"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.125},
            ).select("doc_id", "source").orderBy("doc_id"),
            _STRATIFIED_SQL,
        ),
        "sampling_fixed_size": (
            lambda s, sf: sampling.fixed_size_sample(
                _t(s, sf, "documents"), "doc_id", 200
            ).select("doc_id", "source").orderBy("doc_id"),
            """SELECT doc_id, source FROM (
  SELECT doc_id, source FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 200)
ORDER BY doc_id""",
        ),
        "sampling_pps_systematic": (
            lambda s, sf: sampling.pps_systematic_sample(_t(s, sf, "documents")),
            _PPS_SAMPLE_SQL,
        ),
        "pipeline_chunk_documents": (
            lambda s, sf: pipeline.chunk_documents(_t(s, sf, "documents"))
            .orderBy("doc_id", "chunk_idx"),
            _CHUNK_SQL,
        ),
        "text_scrub_redact": (
            lambda s, sf: text.scrub_redact(_t(s, sf, "documents")).orderBy("doc_id"),
            _SCRUB_SQL,
        ),
        "dedup_incremental_new": (
            lambda s, sf: dedup.incremental_new_docs(_t(s, sf, "documents")),
            _INCREMENTAL_NEW_SQL,
        ),
        # r12: the INDEX-backed exact-dedup probe with partition-pruned
        # scan (delta prefixes -> literal PartitionFilters); identical
        # results to the corpus anti-join, which is the oracle
        "dedup_digest_prefix_probe": (
            _dedup_digest_prefix_probe_query,
            _DIGEST_PREFIX_PROBE_SQL,
        ),
        # fuzzy incremental dedup (r8): delta bands probe the
        # MATERIALIZED corpus LSH index (build once, check every crawl
        # delta) — candidates exact-verified; oracle = the self-join
        # chain restricted to cross-side pairs (signatures are
        # per-document, so the restriction is an identity)
        "dedup_minhash_incremental": (
            _dedup_minhash_incremental_query,
            _MINHASH_INCREMENTAL_SQL,
        ),
        # index-lifecycle compaction (round 9): a re-sent delta appends
        # duplicate band rows; compact_index collapses them and
        # rewrites each band partition as few large files — probe
        # results UNCHANGED, so the oracle is the same incremental SQL
        "dedup_minhash_compacted": (
            _dedup_minhash_compacted_query,
            _MINHASH_INCREMENTAL_SQL,
        ),
        # incremental vocabulary maintenance (round 9): per-batch
        # (token, tf, df) partial counts form a monoid over disjoint
        # doc batches; the merged index view == full recompute (same
        # oracle as text_vocabulary)
        "text_vocab_incremental": (
            _text_vocab_incremental_query,
            _VOCAB_SQL,
        ),
        # curriculum data ordering (Bengio 2009): easy→hard by token
        # length, equal-count stages via rank·stages DIV N — dense
        # two-phase global index, never a single-partition window
        "pipeline_curriculum_order": (
            lambda s, sf: pipeline.curriculum_order(_t(s, sf, "documents")),
            _CURRICULUM_SQL,
        ),
        # curriculum → zero-waste packing composition: the schedule a
        # pretraining loader actually consumes (stage ids ride the
        # span rows)
        "pipeline_curriculum_pack": (
            lambda s, sf: pipeline.curriculum_pack(_t(s, sf, "documents")),
            _CURRICULUM_PACK_SQL,
        ),
        # data-constrained epoch planning (Muennighoff 2023): per-source
        # repeat factors under a max-epochs cap, deficits reported
        "sampling_epoch_allocation": (
            lambda s, sf: sampling.epoch_allocation(_t(s, sf, "documents")),
            _EPOCH_ALLOC_SQL,
        ),
        # deterministic k-fold CV assignment: content-hash bucket mod k
        "sampling_kfold": (
            lambda s, sf: sampling.kfold_assign(_t(s, sf, "documents")),
            f"""
SELECT doc_id, CAST(({_HEXBUCKET} % 65536) % 5 AS BIGINT) AS fold
FROM documents ORDER BY doc_id
""",
        ),
        # Hodges-Lehmann robust location per type: exact median of the
        # Walsh averages over the bounded day axis
        "events_hodges_lehmann": (
            lambda s, sf: events.hodges_lehmann_location(_t(s, sf, "events")),
            _HODGES_LEHMANN_SQL,
        ),
        # closed-loop allocation: exact WATERFILLING — capped sources'
        # unused share spills to uncapped ones at one water level,
        # found by prefix-saturation on the bounded source axis
        "sampling_epoch_waterfill": (
            lambda s, sf: sampling.epoch_waterfill(_t(s, sf, "documents")),
            _WATERFILL_SQL,
        ),
        # length-bucketed batching: sorted-order batches padded to
        # their own max; the padding-waste report that justifies the
        # sort — dense two-phase index, bounded-batch groupBy
        "pipeline_length_batches": (
            lambda s, sf: pipeline.length_bucket_batches(_t(s, sf, "documents")),
            _LENGTH_BATCHES_SQL,
        ),
        # domain-interleaved training order: per-source rank window
        # (one shuffle onto the source axis) + composite order
        "pipeline_interleave_sources": (
            lambda s, sf: pipeline.interleave_sources(_t(s, sf, "documents")),
            _INTERLEAVE_SQL,
        ),
        # Mann-Kendall: exact-BIGINT S + tie-corrected variance over the
        # bounded day axis; z rounded both engines
        "events_mann_kendall": (
            lambda s, sf: events.mann_kendall_trend(_t(s, sf, "events")),
            _MANN_KENDALL_SQL,
        ),
        # DFT periodogram over per-type daily counts: amplitude at the
        # first 7 harmonics, bounded per-type fold, both engines round
        "events_dft_periodogram": (
            lambda s, sf: events.dft_periodogram(_t(s, sf, "events")),
            _PERIODOGRAM_SQL,
        ),
        # Holt double-exponential load forecast over per-type daily
        # counts: event-scale work is ONE partial-agg groupBy; the
        # recurrence folds over the bounded daily series
        "events_holt_forecast": (
            lambda s, sf: events.holt_forecast(_t(s, sf, "events")),
            _HOLT_SQL,
        ),
        # one-pass Poisson bootstrap (Chamandy 2012): hash-derived
        # Poisson(1) weights, replicate means as exact-BIGINT divides,
        # CI = exact order statistics of the sorted replicate means
        "stats_bootstrap_ci": (
            lambda s, sf: evaluation.bootstrap_ci(_t(s, sf, "documents")),
            _BOOTSTRAP_SQL,
        ),
        # pass@k (Chen 2021 eq.1, stable product form): bounded fold of
        # IEEE divides, Spark aggregate ↔ DuckDB list_reduce
        "eval_pass_at_k": (
            lambda s, sf: evaluation.pass_at_k(_t(s, sf, "orders")),
            _PASS_AT_K_SQL,
        ),
        # tokenizer fertility per source: the token-budget correction
        # factor — exact BIGINT sums + single divides
        "text_tokenizer_fertility": (
            lambda s, sf: text.tokenizer_fertility(_t(s, sf, "documents")),
            _FERTILITY_SQL,
        ),
        "dedup_exact_keepers": (
            lambda s, sf: dedup.exact_dedup_keepers(_t(s, sf, "documents"))
            .select("doc_id").orderBy("doc_id"),
            _EXACT_KEEPERS_SQL,
        ),
        "pipeline_pack_sequences": (
            lambda s, sf: pipeline.pack_sequences(_t(s, sf, "documents")),
            _PACK_SEQUENCES_SQL,
        ),
        # zero-waste span packing (r8): every sequence exactly B tokens,
        # docs split at boundaries with doc-local spans — pure BIGINT
        # arithmetic on the two-phase cumsum, bounded explode
        "pipeline_pack_spans": (
            lambda s, sf: pipeline.pack_sequences_spans(_t(s, sf, "documents")),
            _PACK_SPANS_SQL,
        ),
        "pipeline_clean_corpus": (
            lambda s, sf: pipeline.clean_corpus(_t(s, sf, "documents")),
            _CLEAN_CORPUS_SQL,
        ),
        # curation accounting: per-source doc/token retention through
        # the clean chain — the crawl-prioritization feedback signal
        "pipeline_retention_by_source": (
            lambda s, sf: pipeline.retention_by_source(_t(s, sf, "documents")),
            _RETENTION_SQL,
        ),
        # one-row dataset card: the release-notes block, one pass,
        # all partial-aggregable (dup rate ships digests only)
        "pipeline_dataset_card": (
            lambda s, sf: pipeline.dataset_card(_t(s, sf, "documents")),
            """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS pct_en,
       1.0e0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_rate,
       CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS mean_tokens_per_doc,
       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents
""",
        ),
        "pipeline_decontaminate": (
            lambda s, sf: pipeline.decontaminate_report(_t(s, sf, "documents")),
            _DECONTAMINATE_SQL,
        ),
        # decontamination-ON-INGEST (round 9): delta grams probe the
        # materialized benchmark n-gram digest index — the incremental
        # twin of pipeline_decontaminate; work ∝ delta tokens
        "pipeline_decontaminate_incremental": (
            _decontaminate_incremental_query,
            _DECONTAMINATE_INCREMENTAL_SQL,
        ),
        "dedup_components": (
            lambda s, sf: dedup.near_dup_components(
                _t(s, sf, "documents").filter(F.col("doc_id") < 300), threshold=0.2
            ),
            _CC_SQL,
        ),
        "dedup_simhash": (
            lambda s, sf: dedup.simhash_near_pairs(
                _t(s, sf, "documents").filter(F.col("doc_id") < 300), max_hamming=12
            ),
            _SIMHASH_SQL,  # md5 hex-digit votes — DuckDB computes identical signatures
        ),
        # similarity
        "sim_cosine_topk": (_sim_topk_query, _SIM_TOPK_SQL),
        "sim_knn_join": (_knn_join_query, _KNN_JOIN_SQL),
        # MMR diversity rerank over the exact top-20 (r12, Carbonell &
        # Goldstein 1998): greedy λ·rel − (1−λ)·max-sim selection,
        # unrolled-CTE oracle, unrounded doubles ride the hash (the
        # sim_knn_join precedent)
        "sim_mmr_rerank": (_mmr_rerank_query, _MMR_RERANK_SQL),
        # embedding-space decontamination vs the vec_id<20 held-out
        # suite (r12): the semantic complement of the n-gram
        # pipeline_decontaminate — broadcast-literal map-only probe,
        # brute-force oracle twin
        "pipeline_decontaminate_semantic": (_sem_decontam_query, _SEM_DECONTAM_SQL),
        # per-query MRR/precision/recall/NDCG@10 against same-label
        # ground truth (r12): exact-integer divisions ride the hash
        # raw; DCG/IDCG pass libm log2 -> round 6 on both engines
        # (the stats_corr_regr float pattern)
        "eval_retrieval_metrics": (_retrieval_metrics_query, _RETRIEVAL_METRICS_SQL),
        # greedy farthest-point k-center coreset (r12, Gonzalez 1985):
        # m=8 map-side scans + k=1 top-of-heap per step; unrolled-CTE
        # oracle replays the greedy chain
        "sampling_kcenter_coreset": (
            lambda s, sf: similarity.kcenter_coreset(
                _t(s, sf, "embeddings"), m=8, seed_id=0
            ),
            _KCENTER_SQL,
        ),
        # one NN-descent refinement round (r12, Dong et al. 2011) over
        # a TWO-table LSH-seeded kNN graph: symmetrize + 2-hop
        # candidates, exact rescore, top-k — monotone recall (measured
        # 0.24 -> 0.48 @5 in one step), work ∝ N·k², never all-pairs;
        # full-value oracle replays the whole chain
        "sim_knn_descent_step": (
            _knn_descent_query,
            _KNN_DESCENT_SQL,
        ),
        # contrastive-training data prep: per-query top-k cross-label
        # negatives + margin vs the best same-label positive; cosine
        # folds are elementwise-deterministic so the floats hash-match
        # unrounded (the sim_knn_join precedent)
        "sim_hard_negatives": (
            lambda s, sf: similarity.hard_negatives(
                _t(s, sf, "embeddings"), n_queries=5, k=5
            ),
            _HARD_NEG_SQL,
        ),
        # embedding-space QC: per-label centroid norm / purity / outlier
        # floor; centroids are float AVERAGES (partial-sum order), so
        # the gate rounds both engines (stats_corr_regr pattern)
        "sim_label_centroids": (
            lambda s, sf: _round_cols(
                similarity.label_centroids(_t(s, sf, "embeddings")),
                ("centroid_norm", "mean_cos_to_centroid", "min_cos_to_centroid"),
            ),
            _LABEL_CENTROIDS_SQL,
        ),
        # one Lloyd k-means iteration with literal seeds — the oracled
        # differential twin of the rows-only iterative trainer
        # embedding-space drift between snapshot halves: per-label
        # centroid cosine + norm ratio — the stale-ANN-index trigger
        "drift_embedding_centroids": (
            lambda s, sf: similarity.embedding_centroid_drift(
                _t(s, sf, "embeddings")
            ),
            _CENTROID_DRIFT_SQL,
        ),
        "sim_kmeans_step": (
            lambda s, sf: _round_cols(
                similarity.kmeans_lloyd_step(_t(s, sf, "embeddings")),
                ("avg_d2", "new_norm"),
            ),
            _KMEANS_STEP_SQL,
        ),
        "sim_cosine_topk_lsh": (_sim_topk_lsh_query, _TOPK_LSH_SQL),
        # k-means-trained quantizer (rows-only: Lloyd iterations aren't
        # reasonably SQL-expressible) + deployed-index twin with literal
        # centroids (fully oracled — probe/assign/re-rank in SQL)
        # recall@10 >= 0.6 inequality gate vs brute force (r11; exact
        # values oracled by sim_cosine_topk_ivf_static/_index)
        "sim_cosine_topk_ivf": (_sim_topk_ivf_query, _ANN_IVF_RECALL_SQL),
        "sim_cosine_topk_ivf_static": (_sim_topk_ivf_static_query, _IVF_STATIC_SQL),
        # identical results via the materialized, partition-pruned index
        "sim_cosine_topk_ivf_index": (_sim_topk_ivf_index_query, _IVF_STATIC_SQL),
        # incremental maintenance: 80% build + 20% upsert == full-corpus
        # query, proven against the SAME static oracle (r4 verdict #8)
        "sim_cosine_topk_ivf_upsert": (_sim_topk_ivf_upsert_query, _IVF_STATIC_SQL),
        # IVF lifecycle (round 10, VERDICT r9 #5): per-list skew +
        # staleness report (exact-BIGINT Gini, rounded-9 list-mean
        # cosine) over the materialized index...
        "sim_ivf_index_health": (_sim_ivf_health_query, _IVF_HEALTH_SQL),
        # ...and the REBALANCE repair verb: retrain the quantizer on the
        # index's own vectors, rewrite with the retire-swap; full-probe
        # query == brute force proves contents survive exactly
        "sim_ivf_rebalanced_topk": (_sim_ivf_rebalanced_query, _SIM_TOPK_SQL),
        # batched multi-query ANN: probe lists × cluster-partitioned
        # corpus, one corpus pass serves the whole query batch
        "sim_cosine_topk_ivf_batch": (_sim_knn_ivf_batch_query, _IVF_BATCH_SQL),
        # embedding-side incremental near-dup (r8): delta vectors probe
        # the MATERIALIZED cluster-partitioned IVF index (DPP prunes to
        # probed lists), threshold semantics — the semantic twin of
        # dedup_minhash_incremental
        "sim_embedding_incremental": (
            _sim_embedding_incremental_query,
            _IVF_INCREMENTAL_SQL,
        ),
        # SemDeDup-shape curation: corpus-as-queries kNN graph (edge
        # count ≤ N·k by construction) + connected components, every
        # vector labeled (singletons filled). n_clusters=16 tracks the
        # gate corpus (N/target_list_size, the docstring rule) — halves
        # candidate mass vs the old 8-list default, measured 15.2->7.9 s
        "sim_semantic_clusters": (
            lambda s, sf: similarity.semantic_clusters(
                _t(s, sf, "embeddings"), k=4, threshold=0.35, n_clusters=16
            ),
            _SEMANTIC_CLUSTERS_SQL,
        ),
        # incremental SemDeDup cluster MAINTENANCE (round 9): corpus
        # labeling extended with the delta's index-probe + internal
        # edges via extend_components (affected-subgraph relabel only);
        # oracle = full-union-graph recursive-CTE CC (the contraction
        # identity)
        "sim_semantic_components_incremental": (
            _sem_components_incremental_query,
            _SEM_COMPONENTS_INCR_SQL,
        ),
        # the composed deployed index: partition-pruned probe + ADC over
        # codes + exact re-rank, hash-matched end to end (static model)
        "sim_cosine_topk_ivfpq_static": (_sim_topk_ivfpq_query, _IVFPQ_STATIC_SQL),
        # exact all-pairs is the sf-CAPPED oracle baseline (O(N^2) by
        # construction — never the scale path); the LSH entry below is
        # the headline near-dup operator, uncapped and oracled.
        "sim_cosine_near_dup": (
            lambda s, sf: similarity.cosine_near_dup_pairs(
                _t(s, sf, "embeddings").filter(F.col("vec_id") < 1000), 0.35
            ),
            _COS_PAIRS_SQL,
        ),
        "sim_cosine_near_dup_lsh": (
            lambda s, sf: similarity.cosine_near_dup_pairs_lsh(_t(s, sf, "embeddings"), 0.35),
            _COS_PAIRS_LSH_SQL,
        ),
        "sim_cosine_near_dup_lsh_mp": (
            lambda s, sf: similarity.cosine_near_dup_pairs_lsh_multiprobe(
                _t(s, sf, "embeddings"), 0.35, probe_hamming=1),
            _COS_PAIRS_LSH_MP_SQL,
        ),
        "sim_embedding_lsh_recall_mp": (
            lambda s, sf: similarity.embedding_lsh_recall(
                _t(s, sf, "embeddings").filter(F.col("vec_id") < 1000), 0.35,
                probe_hamming=1,
            ),
            _EMB_RECALL_MP_SQL,
        ),
        "sim_embedding_lsh_recall": (
            lambda s, sf: similarity.embedding_lsh_recall(
                _t(s, sf, "embeddings").filter(F.col("vec_id") < 1000), 0.35
            ),
            _EMB_RECALL_SQL,
        ),
        # end-to-end semantic dedup: LSH pairs -> CC -> keeper per vector
        "sim_embedding_dedup_keepers": (
            lambda s, sf: similarity.embedding_dedup_keepers(_t(s, sf, "embeddings"), 0.35),
            _EMB_DEDUP_KEEPERS_SQL,
        ),
        # relational extras
        "setop_intersect": (
            lambda s, sf: relational.nations_with_customers_and_suppliers(
                _t(s, sf, "customer"), _t(s, sf, "supplier")),
            _INTERSECT_SQL,
        ),
        "setop_except": (
            lambda s, sf: relational.nations_with_customers_but_no_suppliers(
                _t(s, sf, "customer"),
                _t(s, sf, "supplier").filter(F.col("s_acctbal") > 9000)),
            _EXCEPT_SQL,
        ),
        "antijoin_customers_without_orders": (
            lambda s, sf: relational.customers_without_orders(
                _t(s, sf, "customer"),
                _t(s, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")),
            _NO_ORDERS_SQL,
        ),
        "pivot_event_types": (
            lambda s, sf: relational.event_type_pivot(_t(s, sf, "events")),
            _PIVOT_SQL,
        ),
        "cube_returns": (
            lambda s, sf: relational.cube_returns(_t(s, sf, "lineitem")),
            _CUBE_SQL,
        ),
        "grouping_sets": (
            lambda s, sf: relational.grouping_sets_lineitem(s, _t(s, sf, "lineitem")),
            _GROUPING_SETS_SQL,
        ),
        "unpivot_stack": (
            lambda s, sf: relational.unpivot_token_metrics(_t(s, sf, "documents")),
            _UNPIVOT_SQL,
        ),
        "scalar_subquery_above_avg": (
            lambda s, sf: relational.orders_above_average(_t(s, sf, "orders")),
            _ABOVE_AVG_SQL,
        ),
        "string_functions": (
            lambda s, sf: relational.part_string_functions(_t(s, sf, "part")),
            _STRFUNC_SQL,
        ),
        "date_extract_groupby": (
            lambda s, sf: relational.orders_by_year_month(_t(s, sf, "orders")),
            _YEARMONTH_SQL,
        ),
        "collect_list_rollcall": (
            # gate projection drops the raw array column: the driver's
            # pandas canonicalizer can't hash list cells (r3 red row);
            # nations_csv carries the identical sorted content
            lambda s, sf: relational.region_nation_rollcall(
                _t(s, sf, "nation"), _t(s, sf, "region")).drop("nations"),
            _ROLLCALL_SQL,
        ),
        "outer_join_nation_presence": (
            lambda s, sf: relational.nation_presence_full_outer(
                _t(s, sf, "customer"), _t(s, sf, "supplier")),
            _FULL_OUTER_SQL,
        ),
        "explode_dimension_stats": (
            lambda s, sf: relational.embedding_dimension_stats(_t(s, sf, "embeddings")),
            _DIM_STATS_SQL,
        ),
        "json_payload_stats": (
            lambda s, sf: relational.json_payload_stats(_t(s, sf, "events")),
            _JSON_STATS_SQL,
        ),
        "stats_quantiles": (
            lambda s, sf: relational.order_price_quantiles(_t(s, sf, "orders")),
            _QUANTILES_SQL,
        ),
        # sketch aggregates: HLL++/t-digest values are engine-specific,
        # so (r11, VERDICT r10 #3) the gate pins exact group counts +
        # ACCURACY INEQUALITIES instead — HLL distinct within 15% of
        # exact (3x the default 5% rsd), approx-median rank within
        # [0.45, 0.56]·n — all DuckDB-expressible; point accuracy is
        # additionally pinned by tests/test_relational_extras.py
        "stats_approx_sketches": (
            _approx_sketches_gate,
            _APPROX_SKETCHES_SQL,
        ),
        # entity-resolution fuzzy join: block on first token, verify
        # candidates with levenshtein (both engines compute identically)
        "fuzzy_name_matches": (
            lambda s, sf: relational.fuzzy_name_matches(_t(s, sf, "part")),
            relational.FUZZY_MATCHES_SQL,
        ),
        "stats_window_ranks": (
            lambda s, sf: relational.window_rank_family(_t(s, sf, "orders")),
            relational.WINDOW_RANKS_SQL,
        ),
        "stats_higher_moments": (
            lambda s, sf: relational.higher_moments(_t(s, sf, "lineitem")),
            relational.HIGHER_MOMENTS_SQL,
        ),
        # text extras
        "text_rolling_hash": (
            lambda s, sf: text.rolling_hash_fingerprint(_t(s, sf, "documents")),
            _RHASH_SQL,
        ),
        "text_repetition_signals": (
            lambda s, sf: text.repetition_signals(_t(s, sf, "documents")),
            _REPETITION_SQL,
        ),
        "text_regex_tokens": (
            lambda s, sf: text.regex_token_count(_t(s, sf, "documents")),
            _REGEX_TOKENS_SQL,
        ),
        # real BPE tokenizer: sample-trained driver-side (the standard
        # single-node trainer shape), applied distributed; iterative
        # merge training isn't SQL-expressible ⇒ rows-only, pinned by
        # tests/test_bpe.py differential vs the pure-Python twin
        # graph: fixed-iteration PageRank over derived customer→supplier
        # edges; oracled via unrolled CTEs, rounded on both engines
        # (partial-agg float order — the stats_corr_regr precedent)
        "graph_pagerank": (
            lambda s, sf: _pagerank_query(s, sf),
            _PAGERANK_SQL,
        ),
        # exact triangle count over the supplier co-occurrence graph —
        # pure equi-joins, integer result (exact hash compare)
        "graph_triangles": (
            lambda s, sf: _triangles_query(s, sf),
            _TRIANGLE_SQL,
        ),
        # deterministic synchronous label propagation (r12, Raghavan
        # 2007 with min-label tie-break): 2 unrolled rounds over the
        # >=30-order co-occurrence graph (8 communities at sf0.01;
        # >=5 saturates to a clique -> 1 label); integer-exact oracle
        # via MATERIALIZED per-round CTEs
        "graph_label_propagation": (
            lambda s, sf: _label_propagation_query(s, sf),
            _LABEL_PROP_SQL,
        ),
        # k-core by iterative peeling (r12, Seidman 1983): 5 unrolled
        # rounds over the >=30-order co-occurrence graph (fixpoint at
        # round 4 at sf0.01: 100 -> 81 nodes; sf0.001's K10 clique is
        # all-core at k=8). Integer-exact degrees; oracle via
        # MATERIALIZED per-round CTEs
        "graph_k_core": (
            lambda s, sf: _k_core_query(s, sf),
            _K_CORE_SQL,
        ),
        # k-truss by iterative edge peeling (r12, Cohen 2008): the
        # triangle-cohesion sibling of k_core — 8 unrolled rounds,
        # wedge-join support per round, integer-exact oracle via
        # MATERIALIZED per-round CTEs
        "graph_k_truss": (
            lambda s, sf: _k_truss_query(s, sf),
            _K_TRUSS_SQL,
        ),
        # neighborhood-Jaccard link prediction (Liben-Nowell 2003):
        # open-wedge candidates minus existing edges, exact-int scores
        "graph_link_prediction": (
            lambda s, sf: _link_prediction_query(s, sf),
            _LINK_PREDICTION_SQL,
        ),
        # DOULION edge-sampled triangle estimate (p=1/2, content-hash
        # coin, x8 scale-up): the approximate twin for graphs where the
        # densest component's m^1.5 wedge mass binds; exact count is
        # its oracle at fixture scale (pytest pins the error bound)
        "graph_triangles_doulion": (
            lambda s, sf: _doulion_query(s, sf),
            _DOULION_SQL,
        ),
        # frontier-expansion BFS (<=3 hops) from the smallest supplier
        # in the thresholded co-occurrence graph; integer-exact oracle
        # via unrolled per-level CTEs
        "graph_bfs_distances": (
            lambda s, sf: _bfs_query(s, sf),
            _BFS_SQL,
        ),
        # sample-trained BPE applied distributed over the golden
        # corpus; hash-oracled since r11 by the stdlib-twin VALUES
        # (golden provenance class — DuckDB can't run the merge loop)
        "text_bpe_stats": (
            lambda s, sf: _bpe_stats_query(s, sf),
            _BPE_GOLDEN_SQL,
        ),
        # zlib compression-ratio quality signal over the golden corpus;
        # hash-oracled since r11 by the stdlib-zlib VALUES twin (golden
        # class — no zlib in SQL); real-corpus invariants stay pinned
        # by tests/test_text_extras.py
        "text_compression_signals": (
            lambda s, sf: text.compression_signals(_golden_docs_df(s)),
            _COMPRESSION_GOLDEN_SQL,
        ),
        # Misra-Gries frequent tokens. Oracled in the no-eviction
        # regime: with capacity (400) >= the corpus vocabulary (~31),
        # no decrement ever fires, so the sketch MUST equal the exact
        # top-k with zero slack — a real correctness property of MG,
        # not a coincidence (eviction-regime bounds are pytest-pinned
        # on a skewed stream in tests/test_bpe.py).
        "text_heavy_hitters": (
            lambda s, sf: text.heavy_hitters(_t(s, sf, "documents")),
            """WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
), counts AS (
  SELECT token, count(*) AS n FROM toks WHERE token <> '' GROUP BY token)
SELECT token, CAST(n AS BIGINT) AS approx_count, CAST(n AS BIGINT) AS max_count
FROM counts ORDER BY n DESC, token LIMIT 20""",
        ),
        # feature-hashing vectorizer (HashingVectorizer): model-free
        # text embeddings, md5 family => exactly oracled in long format
        # SIF-weighted hashing (Arora 2017): integer-scaled weights
        # make the (doc, bucket) accumulation exact BIGINT — zero
        # tolerance despite float weights
        "text_sif_features": (
            lambda s, sf: text.sif_hashed_features(_t(s, sf, "documents")),
            _SIF_FEATURES_SQL,
        ),
        "text_hashed_features": (
            lambda s, sf: text.hashed_embedding_features(_t(s, sf, "documents")),
            text.HASHED_FEATURES_SQL_TMPL.format(dim=64),
        ),
        # multimodal (synthetic payloads; Spark-side plumbing is the
        # subject — rows-only check, pinned by tests/test_multimodal.py)
        "multimodal_payload_stats": (
            lambda s, sf: multimodal.payload_stats(
                multimodal.documents_as_media(_t(s, sf, "documents"))
            ).orderBy("media_id"),
            _PAYLOAD_STATS_SQL,  # mapInPandas over binary, oracled via md5
        ),
        "multimodal_decode": (
            lambda s, sf: multimodal.decode_features(multimodal.make_fake_media_df(s, 100))
            .orderBy("media_id"),
            _MM_DECODE_SQL,  # golden VALUES (deterministic stub data)
        ),
        "multimodal_frame_sample": (
            lambda s, sf: multimodal.sample_video_frames(
                multimodal.make_fake_media_df(s, 100), every_ms=500
            ).orderBy("media_id", "frame_ts_ms"),
            _MM_FRAMES_SQL,
        ),
        "multimodal_resize": (
            lambda s, sf: multimodal.resize_images(
                multimodal.make_fake_media_df(s, 100), 32, 32
            ).select("media_id", "width", "height",
                     F.length("payload").alias("n_bytes")).orderBy("media_id"),
            _MM_RESIZE_SQL,
        ),
        "multimodal_audio_features": (
            # real DSP over PCM WAV payloads: RMS / ZCR / spectral
            # centroid / dominant frequency via numpy rfft in mapInPandas
            lambda s, sf: multimodal.audio_features(
                multimodal.make_fake_media_df(s, 100)
            ).orderBy("media_id"),
            _MM_AUDIO_SQL,
        ),
        "multimodal_image_ahash": (
            # 64-bit perceptual hash over DECODED pixels (codec-invariant
            # image fingerprint; only 8 bytes/row ever shuffle)
            lambda s, sf: multimodal.image_ahash(
                multimodal.make_fake_media_df(s, 100)
            ).orderBy("media_id"),
            _MM_AHASH_SQL,
        ),
        "multimodal_image_near_dup": (
            # banded Hamming near-dup pairs over the perceptual hashes
            lambda s, sf: multimodal.image_near_dup_pairs(
                multimodal.make_fake_media_df(s, 100), max_hamming=16
            ),
            _MM_PHASH_PAIRS_SQL,
        ),
        "multimodal_video_near_dup": (
            # video dedup: per-frame perceptual hashes, banded frame
            # match, >=2 shared frames per video pair
            lambda s, sf: multimodal.video_near_dup_pairs(
                multimodal.make_fake_media_df(s, 100), 500, 3, 2
            ),
            _MM_VIDEO_DEDUP_SQL,
        ),
        "multimodal_extract_frames": (
            # REAL video frame extraction: MJPEG-AVI rows random-access
            # + JPEG-decode only the sampled frames (mapInPandas); MP4
            # rows random-access samples via the real ISO-BMFF tables
            # (checksums over sample bytes — H.264 pixels stay stubbed)
            lambda s, sf: multimodal.extract_video_frames(
                multimodal.make_fake_media_df(s, 100), every_ms=500
            ).orderBy("media_id", "frame_ts_ms"),
            _MM_EXTRACT_SQL,
        ),
        "multimodal_mp4_metadata": (
            # real ISO-BMFF container walk (mvhd/tkhd/stsd/stsz + the
            # general stsc sample-location algorithm), ffprobe-shaped
            lambda s, sf: multimodal.mp4_container_metadata(
                multimodal.make_fake_media_df(s, 100)
            ).orderBy("media_id"),
            _MM_MP4_META_SQL,
        ),
        # top-k 3-event paths (sequential pattern mining): double LEAD
        # on one user_id window, TakeOrderedAndProject cut
        "events_top_paths": (
            lambda s, sf: events.top_event_paths(_t(s, sf, "events")),
            _TOP_PATHS_SQL,
        ),
        # CUSUM change-point scan per type — all-integer deviation
        # accumulation (D*c - total), |CUSUM| argmax with day tie-break
        "events_cusum_changepoint": (
            lambda s, sf: events.cusum_changepoint(_t(s, sf, "events")),
            _CUSUM_SQL,
        ),
        # hour-of-week seasonal profile: bounded 7x24 axis per type,
        # exact-BIGINT share division, peak ranking
        "events_seasonal_profile": (
            lambda s, sf: events.seasonal_profile(_t(s, sf, "events")),
            _SEASONAL_SQL,
        ),
        # linear quality-classifier inference: md5-derived weights,
        # shuffle-free map-side array fold, exact integer score
        "pipeline_classifier_score": (
            lambda s, sf: pipeline.classifier_score(_t(s, sf, "documents")),
            _CLASSIFIER_SQL,
        ),
        # k-anonymity audit over (lang, source, length-bucket)
        # quasi-identifiers: class sizes, risk flags, corpus shares
        "dq_k_anonymity": (
            lambda s, sf: quality.k_anonymity_report(_t(s, sf, "documents")),
            _K_ANON_SQL,
        ),
        # l-diversity audit (Machanavajjhala 2007): per QI class, the
        # distinct-sensitive-value count + dominant-value share — the
        # homogeneity-attack complement of dq_k_anonymity
        "dq_l_diversity": (
            lambda s, sf: quality.l_diversity_report(_t(s, sf, "documents")),
            _L_DIVERSITY_SQL,
        ),
        # t-closeness audit (Li 2007): per-class sensitive-distribution
        # TVD vs the corpus — skewness-attack leg of the privacy triad;
        # exact-integer numerators, one divide per class
        "dq_t_closeness": (
            lambda s, sf: quality.t_closeness_report(_t(s, sf, "documents")),
            _T_CLOSENESS_SQL,
        ),
        # survivorship merge per duplicate cluster (vocabulary
        # fingerprint key; longest-text-wins rule; provenance union)
        "dedup_golden_record": (
            lambda s, sf: dedup.golden_records(_t(s, sf, "documents")),
            _GOLDEN_SQL,
        ),
        # exact ROC-AUC via Mann-Whitney rank-sum with tie handling:
        # BIGINT numerator (2x trick), two-phase cumsum, one divide
        "stats_roc_auc": (
            lambda s, sf: evaluation.roc_auc(_t(s, sf, "documents")),
            _ROC_AUC_SQL,
        ),
        # reliability-diagram bins for the classifier score: <=11
        # bucket keys, order-free aggregates, exact-BIGINT ratios
        "stats_calibration_bins": (
            lambda s, sf: evaluation.calibration_bins(_t(s, sf, "documents")),
            _CALIBRATION_SQL,
        ),
        # pairwise cross-source n-gram contamination audit: inverted-
        # index gram join, exact containment/Jaccard per source pair
        "text_contamination_matrix": (
            lambda s, sf: text.contamination_matrix(_t(s, sf, "documents")),
            _CONTAM_MATRIX_SQL,
        ),
        # Stupid Backoff trigram LM scoring of the held-out slice
        # (doc_id % 5) against counts from the rest; sorted-fold floats
        "text_stupid_backoff": (
            lambda s, sf: text.stupid_backoff_scores(_t(s, sf, "documents")),
            _STUPID_BACKOFF_SQL,
        ),
        # KMV sketch set-algebra: pairwise Jaccard estimated from two
        # k-sketches alone, next to the exact answer it approximates
        "stats_kmv_jaccard": (
            lambda s, sf: text.kmv_jaccard_pairs(_t(s, sf, "documents")),
            _KMV_JACCARD_SQL,
        ),
        # market-basket association rules over order baskets on the
        # bounded brand axis: support/confidence/lift, exact ratios
        "assoc_rules_brands": (
            lambda s, sf: relational.brand_assoc_rules(
                _t(s, sf, "lineitem"), _t(s, sf, "part")
            ),
            _ASSOC_RULES_SQL,
        ),
        # order-to-ship open-interval count per day via the sweep-line
        # ±1-delta prefix sum (two-phase cumsum, no per-day join)
        "backlog_sweepline": (
            lambda s, sf: relational.open_lineitem_backlog(
                _t(s, sf, "orders"), _t(s, sf, "lineitem")
            ),
            _BACKLOG_SQL,
        ),
        # Monroe et-al log-odds-with-prior token enrichment per lang:
        # full bounded contrast matrix, no top-k cut on a libm value
        "text_log_odds_enriched": (
            lambda s, sf: text.log_odds_enrichment(_t(s, sf, "documents")),
            _LOG_ODDS_SQL,
        ),
        # weekly growth accounting: new/retained/resurrected/churned
        # per week, churn capped at the last observed week
        "events_user_lifecycle": (
            lambda s, sf: events.user_lifecycle(_t(s, sf, "events")),
            _LIFECYCLE_SQL,
        ),
        # approximate functional-dependency discovery: H(Y|X) and FD
        # strength over the bounded categorical axes, sorted-fold floats
        "dq_functional_deps": (
            lambda s, sf: quality.functional_deps(_t(s, sf, "documents")),
            _FUNCTIONAL_DEPS_SQL,
        ),
        # Zipf's-law OLS fit over the token frequency table: exact
        # ranks, one sorted moment fold, corpus-shape diagnostic
        "text_zipf_fit": (
            lambda s, sf: text.zipf_fit(_t(s, sf, "documents")),
            _ZIPF_SQL,
        ),
        # Gini coefficient of per-user activity: exact rank formula,
        # two-phase dense rank over the user table, BIGINT sums
        "events_power_users_gini": (
            lambda s, sf: events.power_users_gini(_t(s, sf, "events")),
            _GINI_SQL,
        ),
        # per-token burstiness (Fano factor of per-doc counts): exact
        # BIGINT moments, vocab-bounded output
        "text_burstiness": (
            lambda s, sf: text.token_burstiness(_t(s, sf, "documents")),
            _BURSTINESS_SQL,
        ),
        # Pareto/ABC revenue classes: exact micro-money, two-phase
        # cumsum on the part table, integer cross-multiplied boundaries
        "tpch_pareto_abc": (
            lambda s, sf: relational.pareto_abc_classes(_t(s, sf, "lineitem")),
            _PARETO_ABC_SQL,
        ),
        # Kish effective sample size of the token-count weights: two
        # BIGINT moments, one divide — the pre-sampling diagnostic
        "sampling_ess_report": (
            lambda s, sf: sampling.ess_report(_t(s, sf, "documents")),
            _ESS_SQL,
        ),
        # grouped EXACT p50/p90/p99 of order→ship latency per priority
        # via rank-select (parallel over groups, no global sort)
        "tpch_sla_percentiles": (
            lambda s, sf: relational.sla_percentiles(
                _t(s, sf, "orders"), _t(s, sf, "lineitem")
            ),
            _SLA_PCTL_SQL,
        ),
        # Goh-Barabási burstiness of inter-arrival gaps per type:
        # exact BIGINT micros moments, two divides + one sqrt
        "events_inter_arrival": (
            lambda s, sf: events.inter_arrival_burstiness(_t(s, sf, "events")),
            _INTER_ARRIVAL_SQL,
        ),
        # C4-style sub-document dedup: drop repeated fixed-token chunks
        # corpus-wide (first occurrence wins), rebuild docs in order —
        # exact string equality end-to-end, zero-tolerance oracle
        "dedup_sentence_chunks": (
            lambda s, sf: pipeline.sentence_dedup(_t(s, sf, "documents")),
            _SENTENCE_DEDUP_SQL,
        ),
        # declarative cross-field business-rule audit: five predicates
        # in one joined scan, per-rule violation counts + exact rates
        "dq_rule_violations": (
            lambda s, sf: quality.rule_violations(
                _t(s, sf, "orders"), _t(s, sf, "lineitem")
            ),
            _RULE_VIOLATIONS_SQL,
        ),
        # Kaplan-Meier survival of session duration with right-
        # censoring at the horizon; both running sums two-phase
        "events_km_survival": (
            lambda s, sf: events.km_survival(_t(s, sf, "events")),
            _KM_SURVIVAL_SQL,
        ),
        # hourly OHLC bars per type: all five outputs are picks of
        # existing doubles over one shared shuffle key — zero-tolerance
        "events_ohlc_bars": (
            lambda s, sf: events.ohlc_bars(_t(s, sf, "events")),
            _OHLC_SQL,
        ),
        # gaps-and-islands consecutive-day streaks per user; all-integer
        "events_activity_streaks": (
            lambda s, sf: events.activity_streaks(_t(s, sf, "events")),
            _STREAKS_SQL,
        ),
        # 2-D skyline via exclusive two-phase cummax; the oracle is the
        # independent all-pairs NOT EXISTS dominance definition
        "tpch_part_skyline": (
            lambda s, sf: relational.part_skyline(_t(s, sf, "part")),
            _SKYLINE_SQL,
        ),
        # confusion counts + accuracy/precision/recall/F1/kappa, every
        # metric one divide of exact BIGINTs (integer sign decision rule)
        "eval_classification_report": (
            lambda s, sf: evaluation.classification_report(_t(s, sf, "documents")),
            _CLASS_REPORT_SQL,
        ),
        # clamp-at-zero running balance via the Skorokhod-reflection
        # closed form (two per-user windows, no recursion); BIGINT cents
        "events_clamped_balance": (
            lambda s, sf: events.clamped_balance(_t(s, sf, "events")),
            _CLAMPED_BALANCE_SQL,
        ),
        # lag-1/-7 autocorrelation of daily counts over the full spine
        # (absent days are genuine zeros); BIGINT moments, two sqrts
        "events_daily_autocorr": (
            lambda s, sf: events.daily_autocorr(_t(s, sf, "events")),
            _DAILY_AUTOCORR_SQL,
        ),
        # item-item cosine/Jaccard over order baskets on the bounded
        # brand axis; sqrt of exact ints — zero-tolerance
        "assoc_brand_cooccurrence": (
            lambda s, sf: relational.brand_cooccurrence(
                _t(s, sf, "lineitem"), _t(s, sf, "part")
            ),
            _BRAND_COOC_SQL,
        ),
        # per-source en-rate with Wilson score bounds; identical float
        # expression order both engines — zero-tolerance
        "dq_wilson_rates": (
            lambda s, sf: quality.wilson_en_rate(_t(s, sf, "documents")),
            _WILSON_SQL,
        ),
        # Welch two-sample experiment readout on deterministic hash
        # arms; t and df pure functions of six BIGINT moments
        "eval_ab_test_welch": (
            lambda s, sf: evaluation.ab_test_report(_t(s, sf, "events")),
            _AB_TEST_SQL,
        ),
        # anti-entropy range-bucket checksums: 60-bit md5 row digests
        # XOR-folded per bucket (order-free), all-integer encoding
        "dq_merkle_checksums": (
            lambda s, sf: quality.merkle_bucket_checksums(_t(s, sf, "lineitem")),
            _MERKLE_SQL,
        ),
        # reciprocal-rank fusion of classifier + length rankings; both
        # global ranks via the two-phase dense index
        "eval_rrf_fusion": (
            lambda s, sf: evaluation.rrf_fusion(_t(s, sf, "documents")),
            _RRF_SQL,
        ),
        # heavy-hitter CHANGE detection between epochs: add-one log
        # ratio on exact counts, integer total floor, ln rounded at 9
        "text_trending_tokens": (
            lambda s, sf: text.trending_tokens(_t(s, sf, "documents")),
            _TRENDING_SQL,
        ),
        # discrete-time churn hazard by tenure day, censored at the
        # horizon day; all-integer with one exact divide
        "events_churn_hazard": (
            lambda s, sf: events.churn_hazard(_t(s, sf, "events")),
            _CHURN_HAZARD_SQL,
        ),
        # Hanley-McNeil SE + 95% CI on the exact rank-sum AUC; pure
        # function of three BIGINTs, identical order both engines
        "eval_auc_ci": (
            lambda s, sf: evaluation.auc_ci(_t(s, sf, "documents")),
            _AUC_CI_SQL,
        ),
        # HHI revenue concentration in cross-multiplied exact form
        # (sum of squared cents in DECIMAL(38,0)/HUGEINT)
        "tpch_brand_hhi": (
            lambda s, sf: relational.brand_hhi(
                _t(s, sf, "lineitem"), _t(s, sf, "part")
            ),
            _BRAND_HHI_SQL,
        ),
        # sweep-line peak simultaneous sessions + first time reached;
        # all-integer, two-phase running sum, no interval self-join
        "events_peak_concurrency": (
            lambda s, sf: events.peak_concurrency(_t(s, sf, "events")),
            _PEAK_CONCURRENCY_SQL,
        ),
        # bigram coverage curve at k cut points: rank and running
        # totals both two-phase over the vocab table, exact divides
        "text_vocab_coverage": (
            lambda s, sf: text.vocab_coverage(_t(s, sf, "documents")),
            _VOCAB_COVERAGE_SQL,
        ),
        # cohort LTV triangle: BIGINT cents, per-cohort running sum
        # over the bounded age axis
        "events_ltv_triangle": (
            lambda s, sf: events.ltv_triangle(_t(s, sf, "events")),
            _LTV_TRIANGLE_SQL,
        ),
        # Neyman stratified-allocation plan; share rounded at 9 (the
        # denominator is a cross-row float sum — order-sensitive bits)
        "sampling_neyman_allocation": (
            lambda s, sf: _round_cols(
                sampling.neyman_allocation(_t(s, sf, "documents")),
                ("alloc_share",),
            ),
            _NEYMAN_SQL,
        ),
        # duplication deciles on the sentence-dedup chunk pass;
        # decile boundary is integer cross-multiplied
        "dedup_duplication_profile": (
            lambda s, sf: dedup.duplication_profile(_t(s, sf, "documents")),
            _DUP_PROFILE_SQL,
        ),
        # DAU / trailing-28d MAU per day, exact frame-DISTINCT via the
        # explode-to-target-days shape; one exact divide
        "events_dau_mau_stickiness": (
            lambda s, sf: events.dau_mau_stickiness(_t(s, sf, "events")),
            _DAU_MAU_SQL,
        ),
        # sessionization gap-parameter sweep in ONE windowed pass over
        # exploded candidates; all-integer outputs
        "events_session_gap_sweep": (
            lambda s, sf: events.session_gap_sweep(_t(s, sf, "events")),
            _GAP_SWEEP_SQL,
        ),
        # SRE multiwindow error-budget burn (1h AND trailing-6h both
        # over budget => alert); exact counts, literal budget divide
        "events_error_burn_rate": (
            lambda s, sf: events.error_burn_rate(_t(s, sf, "events")),
            _BURN_RATE_SQL,
        ),
        # Theil-Sen robust daily-count trend: pairwise slopes on the
        # bounded day axis, exact rank-avg medians (two-phase index)
        "events_theil_sen_trend": (
            lambda s, sf: events.theil_sen_trend(_t(s, sf, "events")),
            _THEIL_SEN_SQL,
        ),
        # Newman degree assortativity of the brand co-occurrence graph;
        # exact BIGINT moments over the directed edge list
        "graph_brand_assortativity": (
            lambda s, sf: relational.brand_assortativity(
                _t(s, sf, "lineitem"), _t(s, sf, "part")
            ),
            _ASSORTATIVITY_SQL,
        ),
        # paging-episode accounting over the burn-rate series:
        # gaps-and-islands on alerting hours, all-integer
        "events_alert_episodes": (
            lambda s, sf: events.alert_episodes(_t(s, sf, "events")),
            _ALERT_EPISODES_SQL,
        ),
        # per-source TTR + hapax share; exact ints + two divides
        "text_lexical_richness": (
            lambda s, sf: text.lexical_richness(_t(s, sf, "documents")),
            _LEXICAL_RICHNESS_SQL,
        ),
        # Hill tail-index of bigram frequencies (rank-exact top-k via
        # the two-phase index; one k-term ln fold rounded at 9)
        "text_hill_tail_index": (
            lambda s, sf: text.hill_tail_index(_t(s, sf, "documents")),
            _HILL_SQL,
        ),
        # composite candidate-key audit: distinct-combo counts vs rows
        # (distinct() combos, nulls included — not count(DISTINCT col))
        "dq_candidate_keys": (
            lambda s, sf: quality.candidate_keys(_t(s, sf, "events")),
            _CANDIDATE_KEYS_SQL,
        ),
        # metadata-FILTERED batched ANN: the predicate pre-filters the
        # corpus before the probe (full k from the allowed set — the
        # post-filter trap returns fewer), queries unrestricted
        "sim_filtered_topk_ivf": (
            lambda s, sf: similarity.filtered_knn_ivf(
                _t(s, sf, "embeddings"),
                _t(s, sf, "documents"),
                _t(s, sf, "embeddings").filter(F.col("vec_id") < 5),
            ),
            _IVF_FILTERED_SQL,
        ),
        # in-engine quality-classifier TRAINING: full-batch logistic
        # regression, T fixed gradient steps as chained partial aggs +
        # broadcast 1-row weight frames — one lazy plan, no collects;
        # oracle replays the identical unrolled iteration algebra
        "pipeline_classifier_train": (
            lambda s, sf: pipeline.logreg_train_quality(_t(s, sf, "documents")),
            _LOGREG_TRAIN_SQL,
        ),
        # the literal train->infer composition: score every doc with
        # the weights the in-engine trainer just learned (rounded-6
        # published weights, so scores reproduce from the artifact)
        "pipeline_classifier_infer": (
            lambda s, sf: pipeline.classifier_infer_trained(_t(s, sf, "documents")),
            _LOGREG_INFER_SQL,
        ),
        # DSIR importance-resampling weights: target/source hashed
        # n-gram LM log-ratio per doc — the model-free data-selection
        # recipe next to the trained-classifier one; sorted-fold floats
        "sampling_dsir_weights": (
            lambda s, sf: sampling.dsir_importance_weights(_t(s, sf, "documents")),
            _DSIR_SQL,
        ),
        # DSIR last mile (r7 verdict #4): importance RESAMPLING — docs
        # drawn ∝ exp(log_weight) via Gumbel-top-k into a token budget;
        # rounded-then-ordered priorities + BIGINT two-phase cumsum
        "sampling_dsir_resample": (
            lambda s, sf: sampling.dsir_importance_resample(_t(s, sf, "documents")),
            _DSIR_RESAMPLE_SQL,
        ),
        # FLAGSHIP end-to-end corpus build: clean -> exact -> fuzzy ->
        # semantic dedup -> budget sample -> pack -> shard, one operator
        # returning per-stage lineage counts; the oracle chains the
        # individual gates' own SQL blocks stage-onto-stage
        "pipeline_e2e_corpus": (
            lambda s, sf: pipeline.e2e_corpus_pipeline(
                _t(s, sf, "documents"), _t(s, sf, "embeddings"),
                # 800-token/source budget: small enough that the
                # sampling stage visibly bites at BOTH gate (sf0.01)
                # and bench (sf0.1) scale
                default_budget=800,
            ),
            _E2E_CORPUS_SQL,
        ),
        # FLAGSHIP variant with the TRAINED quality gate (r7 verdict
        # #5): train -> score -> filter -> dedup -> sample -> pack as
        # one lineage row; quality keeps the top half by trained
        # score (rank-exact corpus median of p_keep)
        "pipeline_e2e_corpus_trained": (
            lambda s, sf: pipeline.e2e_corpus_pipeline(
                _t(s, sf, "documents"), _t(s, sf, "embeddings"),
                default_budget=800, quality_model="trained",
            ),
            _E2E_CORPUS_TRAINED_SQL,
        ),
        # INCREMENTAL flagship (r8 verdict #4): the daily-crawl twin —
        # delta -> clean -> within-delta exact -> corpus digest
        # anti-join -> materialized-LSH-index fuzzy probe ->
        # materialized-IVF-index semantic probe -> budget sample ->
        # pack -> shard, one lineage row; the oracle chains the two
        # incremental oracles onto the e2e stage CTEs
        "pipeline_e2e_incremental": (
            _pipeline_e2e_incremental_query,
            _E2E_INCREMENTAL_SQL,
        ),
    }


# ------------------------------------------------------ round-10b tier

_READABILITY_SQL = """
WITH per AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syl
  FROM documents
),
g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS words,
         CAST(sum(s) AS BIGINT) AS sentences,
         CAST(sum(syl) AS BIGINT) AS syllables
  FROM per GROUP BY source
)
SELECT source, n_docs, words, sentences, syllables,
       206.835 - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
               - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
         AS flesch
FROM g ORDER BY source
"""

def _lsh_hist_drift_sql(bits: int = 8) -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id % 2 AS side, {_lsh_bucket_sql("v", bits=bits)} AS bucket FROM e),
cell AS (
  SELECT side, bucket, CAST(count(*) AS BIGINT) AS n
  FROM s GROUP BY side, bucket
),
a AS (SELECT bucket, n AS n_a FROM cell WHERE side = 0),
b2 AS (SELECT bucket, n AS n_b FROM cell WHERE side = 1),
ta AS (SELECT CAST(sum(n) AS BIGINT) AS t_a FROM cell WHERE side = 0),
tb AS (SELECT CAST(sum(n) AS BIGINT) AS t_b FROM cell WHERE side = 1),
grid AS (
  SELECT CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
         CAST(coalesce(n_b, 0) AS BIGINT) AS n_b
  FROM a FULL JOIN b2 ON a.bucket = b2.bucket
)
SELECT ta.t_a AS n_vecs_a, tb.t_b AS n_vecs_b,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(abs(n_a * tb.t_b - n_b * ta.t_a)) AS DOUBLE)
         / (2.0 * CAST(ta.t_a AS DOUBLE) * CAST(tb.t_b AS DOUBLE)) AS tvd
FROM grid, ta, tb GROUP BY ta.t_a, tb.t_b
"""


_LSH_HIST_DRIFT_SQL = _lsh_hist_drift_sql()

_MIX_ENTROPY_SQL = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sources,
         CAST(sum(n_docs) AS BIGINT) AS tot_docs,
         CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         CAST(max(n_docs) AS BIGINT) AS max_docs,
         sum(CAST(n_docs AS DOUBLE) * ln(CAST(n_docs AS DOUBLE))) AS sd,
         sum(CAST(n_tokens AS DOUBLE) * ln(CAST(n_tokens AS DOUBLE))) AS st
  FROM per
)
SELECT n_sources, tot_docs, tot_tokens,
       round(ln(CAST(tot_docs AS DOUBLE)) - sd / CAST(tot_docs AS DOUBLE), 6)
         AS doc_entropy,
       round(exp(ln(CAST(tot_docs AS DOUBLE)) - sd / CAST(tot_docs AS DOUBLE)), 6)
         AS effective_sources_docs,
       round(ln(CAST(tot_tokens AS DOUBLE)) - st / CAST(tot_tokens AS DOUBLE), 6)
         AS token_entropy,
       round(exp(ln(CAST(tot_tokens AS DOUBLE)) - st / CAST(tot_tokens AS DOUBLE)), 6)
         AS effective_sources_tokens,
       CAST(max_docs AS DOUBLE) / CAST(tot_docs AS DOUBLE) AS max_doc_share
FROM g
"""


_DP_COUNTS_SQL = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source
),
d AS (
  SELECT source, n,
         (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(substr(md5('dp:' || source), 1, 12), ''),
              c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
            (a, x) -> a * 16 + x) AS DOUBLE) + 0.5) / 281474976710656.0 AS u
  FROM per
)
SELECT source,
       round(CAST(n AS DOUBLE)
             + (-1.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6)
         AS noisy_docs,
       1.0 AS epsilon
FROM d ORDER BY source
"""


_TOKEN_F1_SQL = """
WITH base AS (
  SELECT CAST(doc_id // 2 AS BIGINT) AS pair_id, doc_id % 2 AS side,
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
tf AS (
  SELECT pair_id, side, token, CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY pair_id, side, token
),
ov AS (
  SELECT r.pair_id, CAST(sum(least(r.c, cd.c)) AS BIGINT) AS overlap
  FROM tf r JOIN tf cd
    ON r.pair_id = cd.pair_id AND r.token = cd.token
  WHERE r.side = 0 AND cd.side = 1
  GROUP BY r.pair_id
),
lens AS (
  SELECT pair_id, side, CAST(sum(c) AS BIGINT) AS n
  FROM tf GROUP BY pair_id, side
),
j AS (
  SELECT nr.pair_id, nr.n AS n_ref, nc.n AS n_cand,
         CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap
  FROM (SELECT pair_id, n FROM lens WHERE side = 0) nr
  JOIN (SELECT pair_id, n FROM lens WHERE side = 1) nc USING (pair_id)
  LEFT JOIN ov USING (pair_id)
)
SELECT pair_id, n_ref, n_cand, overlap,
       CAST(overlap AS DOUBLE) / CAST(n_cand AS DOUBLE) AS precision,
       CAST(overlap AS DOUBLE) / CAST(n_ref AS DOUBLE) AS recall,
       CASE WHEN overlap > 0 THEN
         2.0 * (CAST(overlap AS DOUBLE) / CAST(n_cand AS DOUBLE))
             * (CAST(overlap AS DOUBLE) / CAST(n_ref AS DOUBLE))
             / ((CAST(overlap AS DOUBLE) / CAST(n_cand AS DOUBLE))
                + (CAST(overlap AS DOUBLE) / CAST(n_ref AS DOUBLE)))
       ELSE 0.0 END AS f1
FROM j ORDER BY pair_id
"""


_MANN_WHITNEY_SQL = """
WITH base AS (
  SELECT user_id % 2 AS arm, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
),
per AS (
  SELECT cents,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb_v,
         CAST(count(*) AS BIGINT) AS n_v
  FROM base GROUP BY cents
),
cum AS (
  SELECT na_v, nb_v, n_v,
         CAST(sum(n_v) OVER (ORDER BY cents
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_incl
  FROM per
),
terms AS (
  SELECT na_v, nb_v, n_v,
         CAST(nb_v AS DECIMAL(38,0))
           * CAST(2 * (cum_incl - n_v) + n_v + 1 AS DECIMAL(38,0)) AS two_rb_v,
         CAST(n_v AS DECIMAL(38,0)) * CAST(n_v AS DECIMAL(38,0))
           * CAST(n_v AS DECIMAL(38,0)) - CAST(n_v AS DECIMAL(38,0)) AS tie_v
  FROM cum
),
g AS (
  SELECT CAST(sum(na_v) AS BIGINT) AS n_a, CAST(sum(nb_v) AS BIGINT) AS n_b,
         CAST(sum(n_v) AS BIGINT) AS n_total,
         sum(two_rb_v) AS two_rb, sum(tie_v) AS ties,
         CAST(count(*) AS BIGINT) AS n_distinct_values
  FROM terms
)
SELECT n_total, n_a, n_b, n_distinct_values,
  CASE WHEN n_a > 0 AND n_b > 0 AND n_distinct_values > 1 AND n_total > 1 THEN
    (CAST(two_rb AS DOUBLE) - CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) + 1.0)) / 2.0
  END AS u_b,
  CASE WHEN n_a > 0 AND n_b > 0 AND n_distinct_values > 1 AND n_total > 1 THEN
    round(
      ((CAST(two_rb AS DOUBLE) - CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) + 1.0))
       - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
      / (2.0 * sqrt(
          CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
          * ((CAST(n_total AS DOUBLE) + 1.0) * CAST(n_total AS DOUBLE)
             * (CAST(n_total AS DOUBLE) - 1.0) - CAST(ties AS DOUBLE))
          / (12.0 * CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) - 1.0))
        )), 6)
  END AS z
FROM g
"""


def round10b_queries():
    """Round-10b additions: readability, LSH-histogram embedding
    drift, training-mix (source-axis) entropy. (Zipf fit, vocabulary
    coverage and BM25 already exist as text_zipf_fit /
    text_vocab_coverage / text_bm25_scores.)"""
    from sqlstreamstore_spark.analytics import drift, evaluation, pipeline, quality, text

    return {
        # Flesch reading-ease per source (vowel-group syllable proxy);
        # exact BIGINT sums + identical literal expression tree
        "text_readability": (
            lambda s, sf: text.readability_by_source(_t(s, sf, "documents")),
            _READABILITY_SQL,
        ),
        # whole-space embedding drift via shared-hyperplane bucket
        # histograms; integer-numerator TVD (zero tolerance) — the
        # mass-reshuffle complement of drift_embedding_centroids
        "drift_lsh_histogram": (
            lambda s, sf: drift.lsh_histogram_drift(
                _t(s, sf, "embeddings"), bits=8
            ),
            _LSH_HIST_DRIFT_SQL,
        ),
        # SOURCE-axis mix entropy / effective source count (sum
        # identity) — the mixture-design twin of
        # stats_entropy_by_source (which is the token axis)
        "pipeline_mix_entropy": (
            lambda s, sf: pipeline.mix_entropy(_t(s, sf, "documents")),
            _MIX_ENTROPY_SQL,
        ),
        # Laplace-mechanism release counts run with the PUBLIC demo
        # salt (explicitly zero-privacy — see the dp_noisy_counts
        # privacy contract; real releases pass a secret rotated salt);
        # completes the release-privacy toolkit (audit triad + publish)
        "dq_dp_noisy_counts": (
            lambda s, sf: quality.dp_noisy_counts(
                _t(s, sf, "documents"), salt=quality.DP_PUBLIC_DEMO_SALT
            ),
            _DP_COUNTS_SQL,
        ),
        # SQuAD-style token-overlap F1 between (ref, cand) pairs —
        # exact multiset intersection, never a doc×doc cross
        "eval_token_f1": (
            lambda s, sf: evaluation.token_f1(_t(s, sf, "documents")),
            _TOKEN_F1_SQL,
        ),
        # Mann-Whitney U: the nonparametric twin of eval_ab_test_welch
        # — doubled rank sums stay exact-integer via the per-value
        # average-rank identity; tie-corrected z
        "eval_ab_test_mann_whitney": (
            lambda s, sf: evaluation.ab_test_mann_whitney(_t(s, sf, "events")),
            _MANN_WHITNEY_SQL,
        ),
    }


# ------------------------------------------------- round-11 additions


def _matryoshka_sql(k: int = 10, prefix: int = 16, mult: int = 4) -> str:
    """DuckDB twin of cosine_topk_matryoshka: prefix-dim cosine rank
    (list slice v[1:prefix] == Spark slice(embedding, 1, prefix)),
    bounded exact rerank. Same norm zero→1.0 guard, same sequential
    dot folds, round 9."""

    def cos(a: str, b: str) -> str:
        na = f"sqrt(list_dot_product({a}, {a}))"
        nb = f"sqrt(list_dot_product({b}, {b}))"
        return (
            f"list_dot_product({a}, {b}) / "
            f"((CASE WHEN {na} = 0.0 THEN 1.0 ELSE {na} END)"
            f" * (CASE WHEN {nb} = 0.0 THEN 1.0 ELSE {nb} END))"
        )

    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv, v[1:{prefix}] AS qp FROM e WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, {cos("e.v[1:" + str(prefix) + "]", "q.qp")} AS approx
  FROM e, q),
cand AS (SELECT * FROM scored ORDER BY approx DESC, vec_id LIMIT {k * mult}),
rer AS (
  SELECT c.vec_id, round(c.approx, 9) AS approx_cosine,
         round({cos("e.v", "q.qv")}, 9) AS cosine
  FROM cand c JOIN e USING (vec_id), q)
SELECT vec_id, approx_cosine, cosine
FROM rer ORDER BY cosine DESC, vec_id LIMIT {k}
"""


_MATRYOSHKA_SQL = _matryoshka_sql()


def _sq8_topk_sql(k: int = 10, mult: int = 4) -> str:
    """DuckDB twin of cosine_topk_sq8: recompute the per-dim min/max
    model from the table, replay the same quantize → decode →
    approx-rank → exact-rerank arithmetic (identical IEEE sequence:
    list_dot_product folds sequentially like F.aggregate; round() is
    HALF_UP on the non-negative code argument in both engines)."""
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
ex AS (SELECT vec_id, unnest(v) AS x,
              unnest(range(1, len(v) + 1)) AS pos FROM e),
dims AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM ex GROUP BY pos),
dec AS (
  SELECT vec_id,
         list(CASE WHEN hi = lo THEN lo
                   ELSE CAST(round(255.0 * (x - lo) / (hi - lo)) AS INT)
                        * ((hi - lo) / 255.0) + lo END
              ORDER BY pos) AS dv
  FROM ex JOIN dims USING (pos) GROUP BY vec_id
),
scored AS (
  SELECT d.vec_id,
         list_dot_product(d.dv, q.qv)
           / ((CASE WHEN sqrt(list_dot_product(d.dv, d.dv)) = 0.0 THEN 1.0
                    ELSE sqrt(list_dot_product(d.dv, d.dv)) END)
              * (CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) = 0.0 THEN 1.0
                      ELSE sqrt(list_dot_product(q.qv, q.qv)) END)) AS approx
  FROM dec d, q
),
cand AS (SELECT * FROM scored ORDER BY approx DESC, vec_id LIMIT {k * mult}),
rer AS (
  SELECT c.vec_id, round(c.approx, 9) AS approx_cosine,
         round(list_dot_product(e.v, q.qv)
           / ((CASE WHEN sqrt(list_dot_product(e.v, e.v)) = 0.0 THEN 1.0
                    ELSE sqrt(list_dot_product(e.v, e.v)) END)
              * (CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) = 0.0 THEN 1.0
                      ELSE sqrt(list_dot_product(q.qv, q.qv)) END)), 9) AS cosine
  FROM cand c JOIN e USING (vec_id), q
)
SELECT vec_id, approx_cosine, cosine
FROM rer ORDER BY cosine DESC, vec_id LIMIT {k}
"""


def _bt_sql(iters: int = 5) -> str:
    """DuckDB twin of evaluation.bradley_terry: the win matrix in
    plain SQL (exact integer cents decide matchups), then ``iters``
    UNROLLED MM iterations (the pagerank oracle discipline) with the
    same sorted folds — denominators fold over opponents in item
    order, the normalizer folds over items in item order — so every
    IEEE add/divide replays in the Python solver's exact sequence."""
    head = """
WITH ev AS MATERIALIZED (
  SELECT user_id, event_type AS t,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
s AS MATERIALIZED (SELECT user_id, t, CAST(sum(cents) AS BIGINT) AS sc
      FROM ev GROUP BY user_id, t),
m AS MATERIALIZED (
  SELECT a.t AS t1, b.t AS t2, a.sc AS s1, b.sc AS s2
  FROM s a JOIN s b ON a.user_id = b.user_id AND a.t < b.t
  WHERE a.sc <> b.sc
),
wm AS MATERIALIZED (
  SELECT CASE WHEN s1 > s2 THEN t1 ELSE t2 END AS i,
         CASE WHEN s1 > s2 THEN t2 ELSE t1 END AS j,
         CAST(count(*) AS BIGINT) AS wij
  FROM m GROUP BY 1, 2
),
items AS MATERIALIZED (
  SELECT DISTINCT i FROM (SELECT i FROM wm UNION ALL SELECT j AS i FROM wm)),
pairs AS MATERIALIZED (
  SELECT a.i, b.i AS j,
         CAST(coalesce(w1.wij, 0) + coalesce(w2.wij, 0) AS BIGINT) AS nij
  FROM items a JOIN items b ON a.i <> b.i
  LEFT JOIN wm w1 ON w1.i = a.i AND w1.j = b.i
  LEFT JOIN wm w2 ON w2.i = b.i AND w2.j = a.i
),
wins AS MATERIALIZED (
  SELECT p.i,
         CAST(coalesce(max(tw.twij), 0) AS BIGINT) AS wi,
         CAST(sum(p.nij) AS BIGINT) AS gi
  FROM pairs p
  LEFT JOIN (SELECT i, sum(wij) AS twij FROM wm GROUP BY i) tw ON tw.i = p.i
  GROUP BY p.i
),
live AS MATERIALIZED (SELECT i, wi, gi FROM wins WHERE gi > 0),
p0 AS MATERIALIZED (
  SELECT i, 1.0 / (SELECT count(*) FROM live) AS p FROM live)"""
    blocks = []
    prev = "p0"
    for t in range(1, iters + 1):
        blocks.append(f"""
d{t} AS MATERIALIZED (
  SELECT pr.i,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(pa.nij / (pr.p + pj.p) ORDER BY pa.j)
             FILTER (WHERE pa.nij > 0)),
           (a, x) -> a + x) AS d
  FROM {prev} pr
  JOIN pairs pa ON pa.i = pr.i
  JOIN {prev} pj ON pj.i = pa.j
  GROUP BY pr.i
),
r{t} AS MATERIALIZED (
  SELECT live.i,
         CASE WHEN d{t}.d > 0 THEN live.wi / d{t}.d ELSE 0.0 END AS praw
  FROM live JOIN d{t} ON d{t}.i = live.i
),
n{t} AS MATERIALIZED (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(praw ORDER BY i)), (a, x) -> a + x) AS tot
  FROM r{t}
),
p{t} AS MATERIALIZED (
  SELECT i, praw / (SELECT tot FROM n{t}) AS p FROM r{t})""")
        prev = f"p{t}"
    tail = f"""
SELECT live.i AS item, live.wi AS wins, live.gi AS games,
       round({prev}.p, 9) AS bt_score
FROM live JOIN {prev} ON {prev}.i = live.i
ORDER BY item
"""
    return head + "," + ",".join(blocks) + tail


def _ivfsq8_static_sql(
    k: int = 10, n_clusters: int = 8, n_probe: int = 4, mult: int = 4
) -> str:
    """DuckDB twin of cosine_topk_ivfsq8_static: literal-centroid
    probe selection + argmax assignment (the _ivf_static_sql CTEs)
    composed with the SQ8 quantize→decode→rank→rerank chain (the
    _sq8_topk_sql CTEs) — the full deployed IVF-SQ index replayed."""
    from sqlstreamstore_spark.analytics.similarity import _static_centroids

    cent_rows = ",\n    ".join(
        "({cid}, CAST([{vals}] AS DOUBLE[]))".format(
            cid=cid, vals=", ".join(repr(x) for x in vec)
        )
        for cid, vec in _static_centroids(n_clusters=n_clusters)
    )
    return f"""
WITH cent(cid, cv) AS (VALUES
    {cent_rows}
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT cid FROM cent, q
  ORDER BY list_dot_product(cv, qv)
             / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))) DESC,
           cid
  LIMIT {n_probe}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assigned AS (
  SELECT vec_id, v FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv)
                        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                      c.cid
           ) AS rk
    FROM e, cent c) t
  WHERE rk = 1 AND cid IN (SELECT cid FROM probe)
),
ex AS (SELECT vec_id, unnest(v) AS x,
              unnest(range(1, len(v) + 1)) AS pos FROM e),
dims AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM ex GROUP BY pos),
sx AS (SELECT vec_id, unnest(v) AS x,
             unnest(range(1, len(v) + 1)) AS pos FROM assigned),
dec AS (
  SELECT vec_id,
         list(CASE WHEN hi = lo THEN lo
                   ELSE CAST(round(255.0 * (x - lo) / (hi - lo)) AS INT)
                        * ((hi - lo) / 255.0) + lo END
              ORDER BY pos) AS dv
  FROM sx JOIN dims USING (pos) GROUP BY vec_id
),
scored AS (
  SELECT d.vec_id,
         list_dot_product(d.dv, q.qv)
           / ((CASE WHEN sqrt(list_dot_product(d.dv, d.dv)) = 0.0 THEN 1.0
                    ELSE sqrt(list_dot_product(d.dv, d.dv)) END)
              * (CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) = 0.0 THEN 1.0
                      ELSE sqrt(list_dot_product(q.qv, q.qv)) END)) AS approx
  FROM dec d, q
),
cand AS (SELECT * FROM scored ORDER BY approx DESC, vec_id LIMIT {k * mult}),
rer AS (
  SELECT c.vec_id, round(c.approx, 9) AS approx_cosine,
         round(list_dot_product(e.v, q.qv)
           / ((CASE WHEN sqrt(list_dot_product(e.v, e.v)) = 0.0 THEN 1.0
                    ELSE sqrt(list_dot_product(e.v, e.v)) END)
              * (CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) = 0.0 THEN 1.0
                      ELSE sqrt(list_dot_product(q.qv, q.qv)) END)), 9) AS cosine
  FROM cand c JOIN e USING (vec_id), q
)
SELECT vec_id, approx_cosine, cosine
FROM rer ORDER BY cosine DESC, vec_id LIMIT {k}
"""


_SQ8_TOPK_SQL = _sq8_topk_sql()
_BT_SQL = _bt_sql()
_IVFSQ8_STATIC_SQL = _ivfsq8_static_sql()
_SQ8_INDEX_CACHE: dict[str, list] = {}

# Fleiss' kappa: every term exact BIGINT (S2, column-sum squares),
# three single divides at the end — zero-tolerance oracle. All cents
# and ratings are non-negative, so DuckDB's floor-// and Spark's
# truncating DIV agree.
_FLEISS_KAPPA_SQL = """
WITH per AS (
  SELECT user_id, event_type AS rater,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n_ev
  FROM events GROUP BY user_id, event_type
),
rc AS (SELECT user_id, count(*) AS r FROM per GROUP BY user_id),
rmax AS (SELECT max(r) AS m FROM rc),
full_items AS (SELECT user_id FROM rc, rmax WHERE r = m),
rated AS (
  SELECT p.user_id, least(2, (cents // n_ev) // 3000) AS rating
  FROM per p JOIN full_items USING (user_id)
),
nij AS (SELECT user_id, rating, CAST(count(*) AS BIGINT) AS n
        FROM rated GROUP BY user_id, rating),
stats AS (SELECT CAST(sum(n * n) AS BIGINT) AS s2,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_items FROM nij),
colq AS (SELECT CAST(sum(cs * cs) AS BIGINT) AS q,
                CAST(count(*) AS BIGINT) AS n_cats_seen
         FROM (SELECT rating, CAST(sum(n) AS BIGINT) AS cs
               FROM nij GROUP BY rating))
SELECT n_items, CAST(m AS BIGINT) AS n_raters, n_cats_seen,
  round(CAST(s2 - n_items * m AS DOUBLE)
        / CAST(n_items * m * (m - 1) AS DOUBLE), 9) AS p_bar,
  round(CAST(q AS DOUBLE)
        / CAST((n_items * m) * (n_items * m) AS DOUBLE), 9) AS p_e,
  CASE WHEN (n_items * m) * (n_items * m) <> q THEN
    round(CAST((s2 - n_items * m) * (n_items * m) * (n_items * m)
               - q * n_items * m * (m - 1) AS DOUBLE)
          / CAST((n_items * m * (m - 1))
                 * ((n_items * m) * (n_items * m) - q) AS DOUBLE), 9)
  END AS fleiss_kappa
FROM stats, colq, rmax
"""

# Krippendorff's alpha, nominal (r12): the ragged-panel statistic —
# every unit with >= 2 ratings participates with its own m_u. The
# per-unit 1/(m_u−1) denominators clear through L = lcm(1..max_m−1);
# on this fixture max_m = 5 at every sf (verified 0.001/0.01/0.1), so
# L = 12 here while the Spark side computes the same value
# dynamically. All terms exact BIGINT, single final divides —
# zero-tolerance oracle (the fleiss discipline on ragged panels).
_KRIPPENDORFF_SQL = """
WITH per AS (
  SELECT user_id, event_type AS rater,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n_ev
  FROM events GROUP BY user_id, event_type
),
rated AS (
  SELECT user_id, least(2, (cents // n_ev) // 3000) AS rating FROM per
),
nuc AS (SELECT user_id, rating, CAST(count(*) AS BIGINT) AS n
        FROM rated GROUP BY user_id, rating),
unit AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS m,
                CAST(sum(n * n) AS BIGINT) AS ssq
         FROM nuc GROUP BY user_id
         HAVING sum(n) >= 2),
sl AS (SELECT CAST(sum((m * m - ssq) * (12 // (m - 1))) AS BIGINT) AS s_l,
              CAST(count(*) AS BIGINT) AS n_units,
              CAST(sum(m) AS BIGINT) AS n
       FROM unit),
cat AS (SELECT CAST(sum(nc * nc) AS BIGINT) AS q,
               CAST(count(*) AS BIGINT) AS n_cats_seen
        FROM (SELECT rating, CAST(sum(n) AS BIGINT) AS nc
              FROM nuc JOIN unit USING (user_id) GROUP BY rating))
SELECT n_units, n AS n_ratings, n_cats_seen,
  round(CAST(s_l AS DOUBLE) / CAST(12 * n AS DOUBLE), 9) AS do,
  round(CAST(n * n - q AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 9) AS de,
  CASE WHEN n * n <> q THEN
    round(1.0 - CAST((n - 1) * s_l AS DOUBLE)
                / CAST(12 * (n * n - q) AS DOUBLE), 9)
  END AS alpha
FROM sl, cat
"""

# DoReMi one-step mixture reweight: BIGINT sums → single divides, one
# libm exp, normalizer folded in source order (the text.py handoff) —
# identical IEEE sequence in both engines, rounded 9
_DOMAIN_REWEIGHT_SQL = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(length(text)) AS BIGINT) AS mass
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
               CAST(sum(mass) AS BIGINT) AS tm FROM per),
t AS (
  SELECT source, n_docs,
         (CAST(mass AS DOUBLE) / CAST(n_docs AS DOUBLE)) / 1000.0 AS loss,
         (CAST(tm AS DOUBLE) / CAST(td AS DOUBLE)) / 1000.0 AS baseline,
         CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE) AS w_old
  FROM per, tot
),
t2 AS (
  SELECT source, n_docs, loss, w_old,
         greatest(loss - baseline, 0.0) AS excess,
         w_old * exp(1.0 * greatest(loss - baseline, 0.0)) AS tilt
  FROM t
),
z AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(tilt ORDER BY source)), (a, x) -> a + x) AS z FROM t2)
SELECT source, n_docs, round(w_old, 9) AS w_old, round(loss, 9) AS loss,
       round(excess, 9) AS excess,
       round(tilt / (SELECT z FROM z), 9) AS w_new
FROM t2 ORDER BY source
"""


def round11_queries():
    """Round-11 additions: SQ8 scalar-quantized ANN (the third
    compression tier next to IVF/PQ — fully hash-oracled, no Lloyd
    training anywhere; inline, deployed-index, and IVF-composed
    variants), Bradley-Terry pairwise-preference ranking (the
    arena-style eval aggregation), and the DoReMi one-step mixture
    reweight. Collision-checked against the existing
    sim_*/eval_*/pipeline_* families before claiming (round-10
    process note)."""
    from sqlstreamstore_spark.analytics import evaluation
    from sqlstreamstore_spark.analytics import pipeline as pipeline_mod

    def _sq8_gate(s: SparkSession, sf: str) -> DataFrame:
        emb = _t(s, sf, "embeddings")
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0)
            .select("embedding")
            .collect()[0][0]
        ]
        return similarity.cosine_topk_sq8(emb, qvec, k=10, candidate_mult=4)

    def _matryoshka_gate(s: SparkSession, sf: str) -> DataFrame:
        emb = _t(s, sf, "embeddings")
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0)
            .select("embedding")
            .collect()[0][0]
        ]
        return similarity.cosine_topk_matryoshka(
            emb, qvec, k=10, prefix_dim=16, candidate_mult=4
        )

    def _sq8_index_gate(s: SparkSession, sf: str) -> DataFrame:
        import hashlib

        emb = _t(s, sf, "embeddings")
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0)
            .select("embedding")
            .collect()[0][0]
        ]
        path = _scratch("sq8_index_" + hashlib.md5(sf.encode()).hexdigest()[:10])
        model = _SQ8_INDEX_CACHE.get(path)
        if model is None:
            model = similarity.build_sq8_index(emb, path)
            _SQ8_INDEX_CACHE[path] = model
        return similarity.cosine_topk_sq8_index(
            s, path, emb, qvec, model, k=10, candidate_mult=4
        )

    return {
        # uint8 scalar-quantized ANN: quantize -> decoded-cosine rank
        # -> exact rerank, every stage deterministic arithmetic ->
        # full value-hash oracle (unlike the Lloyd-trained IVF/PQ)
        "sim_cosine_topk_sq8": (_sq8_gate, _SQ8_TOPK_SQL),
        # Matryoshka prefix-dim ANN (r12, Kusupati 2022): rank on the
        # first 16 of 64 dims (quarter the vector bytes), exact rerank
        # the bounded candidate set — the dimension-cut compression
        # tier, training-free at query time, fully hash-oracled
        "sim_cosine_topk_matryoshka": (_matryoshka_gate, _MATRYOSHKA_SQL),
        # deployed SQ8 index: codes materialized once per sf, probed
        # per query (scan touches only 1-byte-per-dim codes); build ==
        # quantize by construction, so it shares the SQ8 oracle
        "sim_cosine_topk_sq8_index": (_sq8_index_gate, _SQ8_TOPK_SQL),
        # composed IVF-SQ8 deployed index: coarse prune + SQ8 rank +
        # exact rerank — the one COMPOSED ANN index whose every stage
        # is deterministic, so it hash-oracles at full value (the
        # IVFPQ composition can't: trained codebooks)
        "sim_cosine_topk_ivfsq8_static": (
            lambda s, sf: similarity.cosine_topk_ivfsq8_static(
                _t(s, sf, "embeddings"),
                [
                    float(x)
                    for x in _t(s, sf, "embeddings")
                    .filter(F.col("vec_id") == 0)
                    .select("embedding")
                    .collect()[0][0]
                ],
                k=10,
            ),
            _IVFSQ8_STATIC_SQL,
        ),
        # arena-style pairwise-preference ranking: distributed win
        # matrix, MM solve on the bounded item axis, sorted-fold float
        # discipline; oracle = unrolled-CTE MM (pagerank discipline)
        "eval_bradley_terry": (
            lambda s, sf: evaluation.bradley_terry(_t(s, sf, "events"), iters=5),
            _BT_SQL,
        ),
        # DoReMi one-step loss-tilted mixture reweight — the
        # mixture-DESIGN verb next to sampling_temperature (apply) and
        # pipeline_mix_entropy (audit)
        "pipeline_domain_reweight": (
            lambda s, sf: pipeline_mod.domain_reweight(_t(s, sf, "documents")),
            _DOMAIN_REWEIGHT_SQL,
        ),
        # Fleiss' kappa: k-rater chance-corrected agreement (the
        # LLM-judge-panel statistic; Cohen's 2-rater kappa lives in
        # eval_classification_report) — exact-BIGINT terms, three
        # final divides
        # ragged-panel agreement (r12): units keep whatever raters they
        # have (>= 2) — the missing-ratings regime Fleiss throws away
        "eval_krippendorff_alpha": (
            lambda s, sf: evaluation.krippendorff_alpha(_t(s, sf, "events")),
            _KRIPPENDORFF_SQL,
        ),
        "eval_fleiss_kappa": (
            lambda s, sf: evaluation.fleiss_kappa(_t(s, sf, "events")),
            _FLEISS_KAPPA_SQL,
        ),
    }
