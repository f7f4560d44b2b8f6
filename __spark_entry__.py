"""Driver contract for the spark-graft builder (PySpark target).

Design for correctness parity:

* Pure-SQL queries are authored ONCE in ANSI SQL that both Spark and DuckDB
  parse — ``queries()`` runs the same text via ``spark.sql`` that
  ``oracle_sql()`` hands to DuckDB. Money aggregates go through
  DECIMAL(18,2) (exact, order-independent) and cast to DOUBLE at the end,
  so value hashes match bit-for-bit.
* Text-analysis queries render Spark and DuckDB expressions from the same
  dialect templates (``pangeo_forge_recipes_spark.functions.textexprs``).
* The hash-family operators are replicated end-to-end in DuckDB SQL —
  exact char-5-gram Jaccard for MinHash pairs, FNV-1a + bit voting for
  SimHash, hyperplane literals for LSH-ANN, md5-sampled centroids for IVF
  — so every extension operator is independently value-checked.
* The Zarr/kerchunk pipeline queries run on the seeded deterministic
  fixture (tests.data_generation.make_ds), so their oracles are computed
  by PURE NUMPY from the same generator — an independent single-node
  check of the distributed pipeline output.

The driver grades at most 50 queries, so ``queries()`` registers exactly
50, highest-priority (reference-parity pipelines) first. Every query name
maps to a SURVEY.md §2 operator or a charter extension operator; see the
comment on each entry.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.functions.textexprs import TextExprs

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# view registration is ~1s of driver work (10 parquet footer reads); every
# query callable calls _register, so memoize per (session, sf_dir)
_REGISTERED: dict[int, str] = {}
_CACHED: dict[int, list] = {}

# the driver fixtures are written as ONE parquet row group per table, so a
# plain scan is one unsplittable task no matter the cluster size. Spread the
# fact tables across executors once and keep the shuffled copy hot. (At real
# scale tables arrive as many files/row-groups and scans parallelize on
# their own — this is a local-fixture workaround, not the scale design.)
_SPREAD_TABLES = {"lineitem", "orders", "events", "customer", "part",
                  "documents", "embeddings"}


def _register(spark: SparkSession, sf_dir: str) -> None:
    # the tableExists probe guards against id() reuse after an old session
    # is garbage-collected
    if _REGISTERED.get(id(spark)) == os.path.abspath(sf_dir) and spark.catalog.tableExists(
        "lineitem"
    ):
        return
    for old in _CACHED.pop(id(spark), []):
        old.unpersist()
    for k in [k for k in _MINHASH_PAIRS if k[0] == id(spark)]:
        _MINHASH_PAIRS.pop(k).unpersist()
    # the testdata parquet uses TIMESTAMP(NANOS); Spark needs the legacy
    # switch, and NTZ literals keep timestamp comparisons timezone-free
    # (matching DuckDB's naive timestamps)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    ts_cols = {"orders": ["o_orderdate"], "lineitem": ["l_shipdate"], "events": ["ts"]}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            for c in ts_cols.get(t, []):
                if dict(df.dtypes).get(c) == "bigint":
                    # nanosAsLong read the column as raw int64 nanoseconds
                    df = df.withColumn(
                        c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
                    )
            if t in _SPREAD_TABLES:
                # cache width tracks the shuffle-partition conf (capped at
                # cluster width): partition count should be sized to the
                # data, and at bench SF a 32-way spread of a 600k-row table
                # just multiplies task-scheduling overhead per stage
                width = min(
                    spark.sparkContext.defaultParallelism,
                    int(spark.conf.get("spark.sql.shuffle.partitions")),
                )
                df = df.repartition(width).cache()
                _CACHED.setdefault(id(spark), []).append(df)
            df.createOrReplaceTempView(t)
    _REGISTERED[id(spark)] = os.path.abspath(sf_dir)


# ---------------------------------------------------------------------------
# shared ANSI SQL (identical text for Spark and DuckDB)
# ---------------------------------------------------------------------------

_D2 = "CAST({x} AS DECIMAL(18,2))"


def _shared_sql() -> dict[str, str]:
    q: dict[str, str] = {}

    # SURVEY §2.4 aggregations / partial+final combine — TPC-H Q1 shape
    q["q1_pricing_summary"] = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".strip()

    # SURVEY §2.3 note: joins come free on the tabular side — Q3 shape
    q["q3_unshipped_revenue"] = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""".strip()

    # multi-way broadcast-dim join — Q5 shape
    q["q5_local_supplier_volume"] = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""".strip()

    # SURVEY §2.2 filter pushdown — Q6 shape
    q["q6_forecast_revenue"] = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""".strip()

    # join + per-year rollup — Q9 shape (adapted: no partsupp table)
    q["q9_product_profit"] = """
SELECT
  n_name AS nation,
  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
ORDER BY nation, o_year DESC
""".strip()

    # returned items by customer — Q10 shape
    q["q10_returned_items"] = """
SELECT
  c_custkey,
  c_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
  n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""".strip()

    # SURVEY §2.6 top-k / limit
    q["topk_customers"] = """
SELECT
  c_custkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
  COUNT(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY total_spend DESC, c_custkey
LIMIT 10
""".strip()

    # window functions (running total)
    q["window_running_total"] = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
    AS running_spend
FROM orders
ORDER BY o_custkey, o_orderkey
""".strip()

    # SURVEY §2.4 MinMaxCountCombineFn — single-pass multi-metric
    q["events_minmax_count"] = """
SELECT
  CAST(MIN(value) AS DOUBLE) AS min_value,
  CAST(MAX(value) AS DOUBLE) AS max_value,
  COUNT(*) AS n,
  CAST(MIN(event_id) AS BIGINT) AS min_id,
  CAST(MAX(event_id) AS BIGINT) AS max_id
FROM events
""".strip()

    # SURVEY §2.6 range-partitioned ordered reduction / event-time windows
    q["events_hourly_rollup"] = """
SELECT
  date_trunc('hour', ts) AS hour,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour, event_type
""".strip()

    # SURVEY §2.8 incremental/sessionization (lag + gap windows)
    q["events_sessions"] = """
WITH gaps AS (
  SELECT
    user_id,
    ts,
    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1
         WHEN CAST(ts AS DATE) <> CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DATE)
         THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM gaps
GROUP BY user_id
ORDER BY user_id
""".strip()

    # semi-join (EXISTS) — Q4 shape; Catalyst plans a left-semi hash join
    q["q4_order_priority"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""".strip()

    # outer join with join-condition filter + count distribution — Q13 shape
    q["q13_customer_distribution"] = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""".strip()

    # conditional aggregation over a join — Q14 shape
    q["q14_promo_revenue"] = """
SELECT
  CAST(SUM(CASE WHEN p_type = 'PROMO'
       THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
""".strip()

    # distinct aggregation — Q16 shape (partsupp absent: suppliers via lineitem)
    q["q16_supplier_cnt"] = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_size >= 20
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
""".strip()

    # correlated scalar subquery — Q17 shape
    q["q17_small_quantity_revenue"] = """
SELECT CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#19'
  AND l1.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
""".strip()

    # IN over a grouped-HAVING subquery — Q18 shape
    q["q18_large_orders"] = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""".strip()

    # disjunctive multi-range predicates — Q19 shape
    q["q19_disjunctive_revenue"] = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""".strip()

    # anti-join (NOT EXISTS) + uncorrelated scalar subquery — Q22 shape
    q["q22_inactive_customers"] = """
SELECT SUBSTRING(c_name, 16, 2) AS name_bucket,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
  )
GROUP BY SUBSTRING(c_name, 16, 2)
ORDER BY name_bucket
""".strip()

    # hypertable-style multi-resolution rollup: hour + day + type grains
    # computed in one pass via GROUPING SETS (subsumes the plain ROLLUP
    # hierarchy — ROLLUP itself stays covered by tests/test_plans.py)
    q["events_multi_grain_rollup"] = """
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR(10)) AS day,
       CAST(date_trunc('hour', ts) AS VARCHAR(30)) AS hour,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY GROUPING SETS (
  (CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR(10))),
  (CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR(10)), CAST(date_trunc('hour', ts) AS VARCHAR(30))),
  (event_type)
)
ORDER BY day ASC NULLS FIRST, hour ASC NULLS FIRST, event_type ASC NULLS FIRST
""".strip()

    # set operations: INTERSECT / EXCEPT / UNION ALL in one checked result
    q["set_ops_customers"] = """
SELECT 'building_with_big_order' AS op, COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
) a
UNION ALL
SELECT 'building_without_big_order' AS op, COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
) b
ORDER BY op
""".strip()

    return q


# ---------------------------------------------------------------------------
# text-analysis SQL (rendered per dialect from shared templates)
# ---------------------------------------------------------------------------


def _text_sql(dialect: str) -> dict[str, str]:
    e = TextExprs(dialect, "text")
    return {
        # extension: per-doc text analysis in one JVM-expression pass —
        # token counting (whitespace + BPE-ish) and quality scoring
        "text_doc_metrics": f"""
SELECT doc_id,
       CAST({e.token_count()} AS BIGINT) AS token_count,
       CAST({e.bpe_ish_token_count()} AS BIGINT) AS bpe_token_count,
       {e.punct_ratio()} AS punct_ratio,
       {e.stopword_ratio()} AS stopword_ratio,
       {e.mean_word_len()} AS mean_word_len,
       {e.quality_score()} AS quality_score
FROM documents ORDER BY doc_id
""".strip(),
        # extension: language-ID heuristic
        "text_langid": f"""
SELECT {e.lang_id()} AS pred_lang, lang, COUNT(*) AS n
FROM documents
GROUP BY {e.lang_id()}, lang
ORDER BY pred_lang, lang
""".strip(),
        # extension: document fingerprinting (whole-doc + rolling minhash)
        "text_fingerprints": f"""
SELECT doc_id,
       {e.fingerprint_md5()} AS fingerprint,
       {e.rolling_min_hash(5)} AS rolling_fingerprint
FROM documents ORDER BY doc_id
""".strip(),
        # extension: composed corpus-cleaning pipeline — quality gate then
        # exact dedup, summarized (filter → hash-groupBy in one plan),
        # plus the exact corpus length quantiles (scale path:
        # approx_percentile; the oracle pins the exact interpolated values)
        "corpus_clean": f"""
SELECT COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       COUNT(DISTINCT CASE WHEN q >= 0.5 THEN fp END) AS n_unique,
       {e.quantile("len", "0.25")} AS p25_len,
       {e.quantile("len", "0.5")} AS p50_len,
       {e.quantile("len", "0.75")} AS p75_len,
       {e.quantile("len", "0.99")} AS p99_len
FROM (
  SELECT doc_id, {e.fingerprint_md5()} AS fp, {e.quality_score()} AS q,
         length(text) AS len
  FROM documents
) t
""".strip(),
        # extension: deterministic train/val/test sampling split — md5
        # bucket of the doc id, stable across engines/runs/partitionings
        "sample_split_stats": f"""
SELECT {e.split_label(e._f("str", x="doc_id"))} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM({e.token_count()}) AS BIGINT) AS total_tokens,
       ROUND(AVG({e.quality_score()}), 4) AS avg_quality
FROM documents
GROUP BY 1
ORDER BY split
""".strip(),
        # extension: top token bigrams (explode/unnest + hash groupBy —
        # the n-gram counting half of corpus analytics)
        "top_bigrams": f"""
SELECT bigram, COUNT(*) AS n
FROM (SELECT {e._f("explode", x=e.token_bigrams())} AS bigram FROM documents) t
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""".strip(),
        # extension: exact dedup (hash groupBy, min-id representative)
        "dedup_exact": f"""
SELECT {e.fingerprint_md5()} AS fingerprint,
       CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY {e.fingerprint_md5()}
ORDER BY doc_id
""".strip(),
        # extension: n-gram signature near-dup grouping
        "dedup_ngram_signature": f"""
SELECT {e.rolling_min_hash(5)} AS signature,
       CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       COUNT(*) AS n_members
FROM documents
GROUP BY {e.rolling_min_hash(5)}
ORDER BY doc_id
""".strip(),
    }


def _props_json_sql(dialect: str) -> str:
    """Semi-structured JSON extraction from events.props — the one query
    whose function names genuinely differ per dialect."""
    extract = (
        "CAST(get_json_object(props, '$.k') AS BIGINT)"
        if dialect == "spark"
        else "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    )
    return f"""
SELECT event_type,
       CAST(SUM({extract}) AS BIGINT) AS k_total,
       CAST(MAX({extract}) AS BIGINT) AS k_max,
       CAST(SUM(CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS k_regex_total,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""".strip()


# ---------------------------------------------------------------------------
# embedding similarity oracles (DuckDB list functions)
# ---------------------------------------------------------------------------

_ANN_K = 3
_NEAR_DUP_T = 0.4

_ANN_ORACLE = f"""
WITH pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos
  FROM embeddings a, embeddings b
  WHERE a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank,
       ROUND(cos, 4) AS cosine
FROM ranked WHERE rank <= {_ANN_K}
ORDER BY vec_id, rank
""".strip()

_NEAR_DUP_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {_NEAR_DUP_T}
ORDER BY id_a, id_b
""".strip()

_MULTIMODAL_ORACLE = """
SELECT 'fake/raw' AS format,
       COUNT(*) AS n_blobs,
       CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS distinct_blobs
FROM documents
GROUP BY 1
""".strip()

# FilePattern outer-product manifest oracle (generate_series cross join)
_MANIFEST_N_TIME = 12
_MANIFEST_ORACLE = f"""
SELECT CAST(t.i AS INT) AS time_pos,
       v.variable AS variable,
       'file:///data/' || v.variable || '_' || CAST(t.i AS INT) || '.npz' AS url
FROM range({_MANIFEST_N_TIME}) t(i)
CROSS JOIN (SELECT 'bar' AS variable UNION ALL SELECT 'foo') v
ORDER BY time_pos, variable
""".strip()


# ---------------------------------------------------------------------------
# hash-family oracles: full DuckDB replications of the engine's MinHash /
# SimHash / LSH-ANN / IVF semantics, so every "non-SQL" operator is still
# independently value-checked (validated cell-for-cell against the Spark
# output in this repo's development loop)
# ---------------------------------------------------------------------------

# operators.dedup.minhash_dedup: LSH recall on this corpus is exactly 1
# (every true pair has jaccard >= 0.92; miss probability (1-0.92^4)^16 ~ 2e-9),
# so the ground-truth all-pairs exact char-5-gram Jaccard at the same 0.5
# threshold IS the expected output. Hashed grams + a 2x-size prefilter keep
# the oracle O(pairs) with cheap integer intersects.
_MINHASH_THRESHOLD = 0.5
_MINHASH_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(lower(text))-3, 2)),
                                      i -> hash(substring(lower(text), i, 5)))) AS grams,
         len(list_distinct(list_transform(range(1, greatest(length(lower(text))-3, 2)),
                                      i -> hash(substring(lower(text), i, 5))))) AS ng
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams)) AS i, a.ng AS na, b.ng AS nb
  FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id AND a.ng * 2 >= b.ng AND b.ng * 2 >= a.ng
)
SELECT id_a, id_b, CAST(i AS DOUBLE)/(na+nb-i) AS jaccard
FROM pairs WHERE i * 2 >= (na + nb - i)
ORDER BY id_a, id_b
""".strip()

# operators.dedup.simhash_dedup: the 4x16-bit band pigeonhole is exact for
# hamming <= 3, so all-pairs over independently recomputed signatures
# (FNV-1a per token in HUGEINT mod-2^64 arithmetic, +/-1 bit voting) is the
# expected output.
_SIMHASH_MAX_HAMMING = 3
_SIMHASH_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(range(1, length(tok)+1), i -> ord(substring(tok, i, 1))::HUGEINT)),
      (h, c) -> (xor(h::UBIGINT, c::UBIGINT)::HUGEINT * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
    )::UBIGINT AS h
  FROM toks
), votes AS (
  SELECT doc_id, i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashed, (SELECT unnest(range(64)) AS i)
  GROUP BY doc_id, i
), sigs AS (
  SELECT doc_id,
         CAST((SUM(CASE WHEN v > 0 THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)
               + 9223372036854775808::HUGEINT) % 18446744073709551616::HUGEINT
              - 9223372036854775808::HUGEINT AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_MAX_HAMMING}
ORDER BY id_a, id_b
""".strip()


def _lsh_oracle_sql() -> str:
    """operators.similarity.lsh_ann_topk replicated in SQL: the seeded
    hyperplanes are embedded as literals, buckets recomputed from sign
    patterns, exact cosine ranked within buckets."""
    from pangeo_forge_recipes_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(64, 8)
    plane_lits = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in row) + "]" for row in planes
    )
    return f"""
WITH planes AS (
  SELECT generate_subscripts([{plane_lits}], 1) - 1 AS plane_idx,
         unnest([{plane_lits}]) AS plane
), bucketed AS (
  SELECT e.vec_id,
         CAST(e.embedding AS DOUBLE[]) AS v,
         SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), pl.plane) > 0
                  THEN (1::BIGINT << pl.plane_idx) ELSE 0 END) AS bucket
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id, e.embedding
), pairs AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         ROUND(list_dot_product(
            list_transform(a.v, x -> x / sqrt(list_dot_product(a.v, a.v))),
            list_transform(b.v, x -> x / sqrt(list_dot_product(b.v, b.v)))), 4) AS cosine
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
FROM ranked WHERE rank <= {_ANN_K}
ORDER BY vec_id, rank
""".strip()


_IVF_NPROBE = 4
_IVF_NCENTROIDS = 16

_IVF_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS cord, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_IVF_NCENTROIDS}
), cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY cord) - 1 AS cidx,
         list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cn
  FROM cent
), vecs AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                       CAST(embedding AS DOUBLE[])))) AS vn
  FROM embeddings
), assign AS (
  SELECT v.vec_id, v.vn, c.cidx,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY list_dot_product(v.vn, c.cn) DESC, c.cidx) AS rn
  FROM vecs v CROSS JOIN cents c
), corpus AS (
  SELECT vec_id AS neighbor_id, vn AS bn, cidx FROM assign WHERE rn = 1
), probes AS (
  SELECT vec_id, vn AS an, cidx FROM assign WHERE rn <= {_IVF_NPROBE}
), pairs AS (
  SELECT p.vec_id, c.neighbor_id, ROUND(list_dot_product(p.an, c.bn), 4) AS cosine
  FROM probes p JOIN corpus c ON p.cidx = c.cidx AND p.vec_id <> c.neighbor_id
), ranked AS (
  SELECT vec_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
FROM ranked WHERE rank <= {_ANN_K}
ORDER BY vec_id, rank
""".strip()

# operators.clustering: SemDeDup (k-means then within-cluster pair
# search). The oracle REPLICATES the whole deterministic pipeline in
# DuckDB SQL — md5-sampled candidate pool, farthest-point greedy init
# (recursive CTE carrying the chosen set), five unrolled Lloyd
# iterations (assign → per-dim per-cluster mean → renormalize, empty
# clusters keep their centroid), final assignment, exact within-cluster
# pairs ≥ threshold. Matching hashes prove the distributed
# broadcast-GEMM/partial-sum implementation computes the same model a
# single-node engine derives from the math.
_SEMDEDUP_K = 16
_SEMDEDUP_T = 0.4
_SEMDEDUP_ITERS = 5
_SEMDEDUP_DIM = 64  # embeddings.embedding is FLOAT[64] at every sf


def _semdedup_oracle() -> str:
    k, t, iters = _SEMDEDUP_K, _SEMDEDUP_T, _SEMDEDUP_ITERS
    cand_n, dim = k * 8, _SEMDEDUP_DIM

    def norm(v: str) -> str:
        return (
            f"list_transform({v}, x -> x / greatest(sqrt("
            f"list_dot_product({v}, {v})), 1e-12))"
        )

    sql = f"""
WITH RECURSIVE cand AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS ci,
         {norm('CAST(embedding AS DOUBLE[])')} AS v
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {cand_n})
), candmat AS (
  SELECT list(v ORDER BY ci) AS m FROM cand
), greedy AS (
  SELECT 1 AS it, [CAST(0 AS BIGINT)] AS chosen,
         list_transform(m, u -> list_dot_product(u, m[1])) AS minsim, m
  FROM candmat
  UNION ALL
  SELECT it + 1, list_append(chosen, nxt),
         list_transform(range(1, len(m) + 1),
             i -> greatest(minsim[CAST(i AS INT)],
                           list_dot_product(m[CAST(i AS INT)],
                                            m[CAST(nxt AS INT) + 1]))),
         m
  FROM (SELECT it, chosen, minsim, m,
               CAST(list_indexof(minsim, list_min(minsim)) - 1 AS BIGINT) AS nxt
        FROM greedy WHERE it < {k})
), vecs AS (
  SELECT vec_id, {norm('CAST(embedding AS DOUBLE[])')} AS vn FROM embeddings
), c0 AS (
  SELECT list_transform(list_sort(chosen), c -> m[CAST(c AS INT) + 1]) AS cents
  FROM greedy WHERE it = {k}
)"""
    for j in range(1, iters + 1):
        sql += f""", a{j} AS (
  SELECT vec_id, vn, list_indexof(sims, list_max(sims)) - 1 AS cl
  FROM (SELECT vec_id, vn,
               list_transform(cents, u -> list_dot_product(vn, u)) AS sims
        FROM vecs CROSS JOIN c{j - 1})
), g{j} AS (
  SELECT cl, list(mv ORDER BY pos) AS mvec
  FROM (SELECT cl, i AS pos, avg(vn[CAST(i AS INT) + 1]) AS mv
        FROM a{j} CROSS JOIN range(0, {dim}) t(i)
        GROUP BY cl, i)
  GROUP BY cl
), c{j} AS (
  SELECT list(cent ORDER BY c) AS cents FROM (
    SELECT t.c AS c,
           CASE WHEN g.cl IS NULL THEN p.cents[CAST(t.c AS INT) + 1]
                ELSE {norm('g.mvec')}
           END AS cent
    FROM range(0, {k}) t(c)
    CROSS JOIN c{j - 1} p
    LEFT JOIN g{j} g ON g.cl = t.c)
)"""
    sql += f""", af AS (
  SELECT vec_id, vn, list_indexof(sims, list_max(sims)) - 1 AS cl
  FROM (SELECT vec_id, vn,
               list_transform(cents, u -> list_dot_product(vn, u)) AS sims
        FROM vecs CROSS JOIN c{iters})
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.vn, b.vn), 4) AS cosine
FROM af a JOIN af b ON a.cl = b.cl AND a.vec_id < b.vec_id
WHERE list_dot_product(a.vn, b.vn) >= {t}
ORDER BY id_a, id_b"""
    return sql.strip()


# operators.multimodal: payloads are REAL PNG bytes (pngio.py encode —
# zlib + per-row filters) whose pixel i is the closed form
# (doc_id*31 + i*7) % 256. The engine must genuinely inflate+unfilter to
# recover the pixels; the oracle recomputes the position-weighted
# checksums straight from the formula (integers, no float-rounding risk;
# feature blocks are 8 pixels, so round(mean * 2040) is the exact block
# byte sum).
_MULTIMODAL_FEATURES_ORACLE = """
SELECT doc_id,
       CAST(128 AS INT) AS n_pixels,
       CAST(list_sum(list_transform(range(0, 128),
            i -> ((doc_id*31 + i*7) % 256) * (1 + i % 13))) AS BIGINT)
         AS pixel_checksum,
       CAST(16 AS INT) AS feat_dim,
       CAST(list_sum(list_transform(range(0, 16),
            j -> list_sum(list_transform(range(j*8, j*8 + 8),
                 i -> (doc_id*31 + i*7) % 256)) * (1 + j % 7))) AS BIGINT)
         AS feature_checksum
FROM documents ORDER BY doc_id
""".strip()


def _pos_checksum(var) -> float:
    """Order-SENSITIVE content checksum: values weighted by their flat
    position (mod-101 ramp). A combine that permutes, zeroes, or shifts
    elements changes it; identical arrays produce bit-identical doubles,
    so the Spark-side store round-trip and the pure-numpy oracle agree
    exactly."""
    flat = np.asarray(var.data, dtype="float64").ravel()
    w = (np.arange(flat.size) % 101 + 1).astype("float64")
    return float(np.round((flat * w).sum(), 4))


def _pipeline_oracle_sql() -> dict[str, str]:
    """Pinned-constant oracles for the Zarr/kerchunk pipeline queries: the
    queries run on the seeded deterministic fixture (make_ds), so the
    expected summaries are recomputed here by PURE NUMPY from the same
    generator — a single-node independent check of the distributed
    pipeline (shapes, dims, chunking, and value means)."""
    from tests.data_generation import make_ds

    def rows_sql(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
        sel = []
        for r in rows:
            parts = [
                f"CAST({v!r} AS {t}) AS {name}" if t == "VARCHAR"
                else f"CAST({v!r} AS {t}) AS {name}"
                for v, (name, t) in zip(r, cols)
            ]
            sel.append("SELECT " + ", ".join(parts))
        return "\nUNION ALL\n".join(sel)

    out: dict[str, str] = {}

    ds6 = make_ds(nt=6)
    zarr_rows = [
        (
            name,
            int(np.prod(var.data.shape)),
            float(np.round(np.asarray(var.data, dtype="float64").mean(), 6)),
            _pos_checksum(var),
        )
        for name, var in sorted(ds6.variables.items())
        if var.data.dtype.kind in "if"
    ]
    out["pipeline_zarr_roundtrip"] = rows_sql(
        zarr_rows,
        [
            ("variable", "VARCHAR"),
            ("n_elements", "BIGINT"),
            ("mean_value", "DOUBLE"),
            ("pos_checksum", "DOUBLE"),
        ],
    )
    ds8 = make_ds(nt=8)
    spill_rows = [
        (
            name,
            int(np.prod(var.data.shape)),
            float(np.round(np.asarray(var.data, dtype="float64").mean(), 6)),
            _pos_checksum(var),
            1,
        )
        for name, var in sorted(ds8.variables.items())
        if var.data.dtype.kind in "if"
    ]
    out["pipeline_spill_roundtrip"] = rows_sql(
        spill_rows,
        [
            ("variable", "VARCHAR"),
            ("n_elements", "BIGINT"),
            ("mean_value", "DOUBLE"),
            ("pos_checksum", "DOUBLE"),
            ("scratch_clean", "INTEGER"),
        ],
    )
    kerchunk_rows = [
        (name, int(np.prod(var.data.shape)), _pos_checksum(var))
        for name, var in sorted(ds6.variables.items())
    ]
    out["pipeline_kerchunk_roundtrip"] = rows_sql(
        kerchunk_rows,
        [("variable", "VARCHAR"), ("n_elements", "BIGINT"), ("pos_checksum", "DOUBLE")],
    )
    ds8 = make_ds(nt=8)
    dim_rows = sorted((d, int(s)) for d, s in ds8.sizes.items())
    dim_cols = [("dim", "VARCHAR"), ("size", "BIGINT")]
    out["pipeline_append_roundtrip"] = rows_sql(dim_rows, dim_cols)
    out["pipeline_stream_append"] = rows_sql(dim_rows, dim_cols)
    out["pipeline_schema_inference"] = rows_sql(dim_rows, dim_cols)
    out["pipeline_rechunk_existing"] = rows_sql(
        [("foo_chunk_time", 3), ("time", 6)],
        [("metric", "VARCHAR"), ("value", "BIGINT")],
    )
    return out


# ---------------------------------------------------------------------------
# Spark-side query callables
# ---------------------------------------------------------------------------


def _sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        return spark.sql(sql)

    return run


def _ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pangeo_forge_recipes_spark.operators.similarity import brute_force_topk

    _register(spark, sf_dir)
    emb = spark.table("embeddings")
    out = brute_force_topk(emb, emb, k=_ANN_K)
    return out


def _near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pangeo_forge_recipes_spark.operators.dedup import embedding_near_dup

    _register(spark, sf_dir)
    emb = spark.table("embeddings")
    return embedding_near_dup(emb, threshold=_NEAR_DUP_T)


def _multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pangeo_forge_recipes_spark.operators.multimodal import (
        attach_fake_media,
        media_stats,
    )

    _register(spark, sf_dir)
    media = attach_fake_media(spark.table("documents"))
    return media_stats(media)


def _multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the engine: media payloads are genuine
    16-bit PCM RIFF/WAVE bytes (audioio.py) carrying a doc-dependent
    triangle wave — decode_audio must actually parse the container and
    dequantize the PCM. Summaries are exact integer quantities (the
    decoded samples are multiples of 1/32768, so round(s*32768) recovers
    the stored int exactly); the oracle recomputes them from the
    closed-form wave. The triangle values never land on a .5 rounding
    tie (checked for every period used), so HALF_UP vs half-even is
    moot."""
    from pangeo_forge_recipes_spark.operators.multimodal import (
        attach_wav_media,
        decode_audio,
    )

    _register(spark, sf_dir)
    media = attach_wav_media(
        spark.table("documents"), n_samples=64, sample_rate=8000
    )
    dec = decode_audio(media)
    q = F.transform("samples", lambda x: F.round(x.cast("double") * 32768, 0))
    return dec.select(
        "doc_id",
        "sample_rate",
        "channels",
        F.size("samples").alias("n_samples"),
        F.aggregate(q, F.lit(0.0), lambda a, x: a + x)
        .cast("long")
        .alias("sum_q"),
        F.aggregate(q, F.lit(0.0), lambda a, x: a + F.abs(x))
        .cast("long")
        .alias("abs_q"),
        F.array_max(F.transform(q, lambda x: F.abs(x)))
        .cast("long")
        .alias("peak_q"),
    )


_AUDIO_TRI = "(abs((i % (8 + doc_id % 23)) * 2.0 / (8 + doc_id % 23) - 1.0) * 2.0 - 1.0) * 16384"
_AUDIO_ORACLE = f"""
SELECT doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS channels,
       CAST(64 AS INT) AS n_samples,
       CAST(list_sum(list_transform(range(0, 64), i ->
            round({_AUDIO_TRI}))) AS BIGINT) AS sum_q,
       CAST(list_sum(list_transform(range(0, 64), i ->
            abs(round({_AUDIO_TRI})))) AS BIGINT) AS abs_q,
       CAST(list_max(list_transform(range(0, 64), i ->
            abs(round({_AUDIO_TRI})))) AS BIGINT) AS peak_q
FROM documents ORDER BY doc_id
""".strip()


def _events_stream_source(spark: SparkSession, sf_dir: str, query_name: str) -> DataFrame:
    """Shared streaming-source setup: stop a leftover query of the same
    name, then stream the events parquet with the same bigint-ns → timestamp
    conversion ``_register`` applies to the batch view (the streaming file
    source wants a directory, so scan sf_dir glob-filtered to the events
    file)."""
    _register(spark, sf_dir)
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    batch_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict((f.name, f.dataType.simpleString()) for f in batch_schema).get("ts") == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return raw


def _events_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.8 Structured Streaming: the hourly rollup computed by an
    event-time windowed STREAMING aggregation (availableNow micro-batches
    over the events parquet, watermarked), checked against the same DuckDB
    oracle as the batch rollup — streaming and batch must agree exactly."""
    from pangeo_forge_recipes_spark.streaming.append import watermarked_event_rollup

    raw = _events_stream_source(spark, sf_dir, "_events_rollup_stream")
    rolled = watermarked_event_rollup(raw)
    query = (
        rolled.writeStream.format("memory")
        .queryName("_events_rollup_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return (
        spark.table("_events_rollup_stream")
        .select(
            F.col("window_start").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def _events_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.8 / charter: custom stateful streaming operator
    (applyInPandasWithState day-gap sessionization) — must hash-match the
    batch LAG-based events_sessions oracle."""
    from pangeo_forge_recipes_spark.streaming.stateful import stateful_sessionize

    raw = _events_stream_source(spark, sf_dir, "_events_sessions_stream")
    query = (
        stateful_sessionize(raw)
        .writeStream.format("memory")
        .queryName("_events_sessions_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return (
        spark.table("_events_sessions_stream")
        .groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
    )


_DEDUP_STREAM_ORACLE = """
SELECT event_type, COUNT(*) AS n_unique
FROM (SELECT DISTINCT user_id, event_type, ts FROM events) t
GROUP BY event_type
ORDER BY event_type
""".strip()


def _events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.8: streaming exact dedup (watermark-bounded dropDuplicates
    state) — first-arrival rows stream into the sink, then a batch count
    per type must equal the batch DISTINCT oracle."""
    from pangeo_forge_recipes_spark.streaming.append import streaming_dedup

    raw = _events_stream_source(spark, sf_dir, "_events_dedup_stream")
    query = (
        streaming_dedup(raw, keys=["user_id", "event_type", "ts"])
        .select("user_id", "event_type", "ts")
        .writeStream.format("memory")
        .queryName("_events_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return (
        spark.table("_events_dedup_stream")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
    )


_ASOF_ORACLE = """
SELECT e.user_id,
       COUNT(*) AS n_events,
       CAST(COUNT(o.o_orderdate) AS BIGINT) AS matched,
       MAX(o.o_orderdate) AS last_order
FROM events e ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
GROUP BY e.user_id
ORDER BY e.user_id
""".strip()


def _asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charter custom operator: backward as-of join (union + keyed window,
    one shuffle) — semantics pinned against DuckDB's native ASOF JOIN."""
    from pangeo_forge_recipes_spark.operators.asof import asof_join

    _register(spark, sf_dir)
    events = spark.table("events")
    orders = spark.table("orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    joined = asof_join(
        events, orders, by="user_id", left_on="ts", right_on="o_orderdate",
        right_cols=[],
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count("asof_o_orderdate").alias("matched"),
            F.max("asof_o_orderdate").alias("last_order"),
        )
    )


_SKEW_JOIN_ORACLE = """
SELECT CAST(c_mktsegment AS VARCHAR) AS c_mktsegment,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY CAST(c_mktsegment AS VARCHAR)
ORDER BY c_mktsegment
""".strip()


def _skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charter scale operator: explicit key salting for skewed equi-joins
    (the portable fallback where AQE skew-split can't re-plan). Result rows
    are identical to the plain join, so the oracle runs the unsalted SQL."""
    from pangeo_forge_recipes_spark.operators.skew import salted_join

    _register(spark, sf_dir)
    events = spark.table("events")
    cust = spark.table("customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").cast("string").alias("c_mktsegment"),
    )
    joined = salted_join(events, cust, on="user_id", salt=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_RANGE_JOIN_ORACLE = """
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       COUNT(*) AS n_fast_lines,
       CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
FROM lineitem l JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
ORDER BY o_year
""".strip()


def _range_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charter custom operator: binned point-in-interval join (equi-join on
    (key, bin) + residual filter; never a nested loop) — lineitems shipped
    inside their order's 30-day window, checked against a plain
    inequality-join oracle."""
    from pangeo_forge_recipes_spark.operators.ranges import range_join

    _register(spark, sf_dir)
    lines = spark.table("lineitem").select("l_orderkey", "l_shipdate")
    windows = spark.table("orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderdate").alias("lo"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("hi"),
    )
    joined = range_join(
        lines, windows, left_on="l_shipdate", right_lo="lo", right_hi="hi",
        by=["l_orderkey"], bin_size_seconds=30 * 86_400,
    )
    return (
        joined.groupBy(F.year("lo").cast("long").alias("o_year"))
        .agg(
            F.count("*").alias("n_fast_lines"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


def _manifest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.1: FilePattern outer-product enumeration as a DataFrame."""
    from pangeo_forge_recipes_spark import ConcatDim, FilePattern, MergeDim
    from pangeo_forge_recipes_spark.transforms import manifest_df
    from pangeo_forge_recipes_spark.types import Index

    pattern = FilePattern(
        lambda time, variable: f"file:///data/{variable}_{time}.npz",
        ConcatDim("time", keys=list(range(_MANIFEST_N_TIME)), nitems_per_file=1),
        MergeDim("variable", keys=["bar", "foo"]),
        file_type="npz",
    )
    df = manifest_df(spark, pattern)

    @F.udf("int")
    def time_pos(index_json: str) -> int:
        idx = Index.from_json(index_json)
        return next(
            p.value for d, p in idx.items() if d.name == "time"
        )

    @F.udf("string")
    def variable(index_json: str) -> str:
        idx = Index.from_json(index_json)
        pos = next(p.value for d, p in idx.items() if d.name == "variable")
        return ["bar", "foo"][pos]

    return (
        df.select(
            time_pos("index").alias("time_pos"),
            variable("index").alias("variable"),
            F.col("url"),
        ).orderBy("time_pos", "variable")
    )


# hash-family / pipeline operator queries (every one carries a DuckDB
# oracle: full SQL replications for the hash families, numpy-derived
# pinned constants for the deterministic pipeline fixtures)


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (4-band pigeonhole, exact for hamming<=3) —
    oracle recomputes signatures + all-pairs Hamming in DuckDB."""
    from pangeo_forge_recipes_spark.operators.dedup import simhash_dedup

    _register(spark, sf_dir)
    return simhash_dedup(
        spark.table("documents"), max_hamming=_SIMHASH_MAX_HAMMING
    )


# the verified MinHash pair set feeds two graded queries (pairs + cluster
# resolution); memoize the persisted DataFrame per (session, sf_dir) so a
# concurrent bench/driver run computes the CPU-bound signature pipeline
# once, exactly like a shared materialized CTE
_MINHASH_PAIRS: dict[tuple[int, str], DataFrame] = {}
_MINHASH_PAIRS_LOCK = threading.Lock()


def _minhash_pairs_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pangeo_forge_recipes_spark.operators.dedup import minhash_dedup

    key = (id(spark), os.path.abspath(sf_dir))
    # lock so concurrent bench threads (pairs + clusters) build it once
    with _MINHASH_PAIRS_LOCK:
        cached = _MINHASH_PAIRS.get(key)
        if cached is not None and _REGISTERED.get(id(spark)) == key[1]:
            return cached
        _register(spark, sf_dir)
        pairs = minhash_dedup(
            spark.table("documents"), threshold=_MINHASH_THRESHOLD
        ).persist()
        pairs.count()  # materialize under the lock: both callers reuse it
        _MINHASH_PAIRS[key] = pairs
    return pairs


def _minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH pipeline (signatures → bands → candidates → exact
    verify) — oracle is ground-truth all-pairs Jaccard, so this row also
    proves LSH recall 1.0 on the graded corpus."""
    return _minhash_pairs_for(spark, sf_dir)


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs resolved into duplicate clusters via large-star/
    small-star connected components (``operators/components.py``) — the
    pair→cluster→canonical stage of a fuzzy-dedup pipeline. Oracle:
    recursive-CTE min-label reachability over the same ground-truth
    Jaccard pair set."""
    from pangeo_forge_recipes_spark.operators.components import dedup_clusters

    _register(spark, sf_dir)
    docs = spark.table("documents")
    pairs = _minhash_pairs_for(spark, sf_dir)
    return dedup_clusters(docs, pairs)


# min-label propagation: the component minimum reaches every member along
# any path because it is smaller than every id it crosses (lbl < v prunes
# non-minimal labels early and bounds the recursion)
_CLUSTERS_ORACLE = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(lower(text))-3, 2)),
                                      i -> hash(substring(lower(text), i, 5)))) AS grams,
         len(list_distinct(list_transform(range(1, greatest(length(lower(text))-3, 2)),
                                      i -> hash(substring(lower(text), i, 5))))) AS ng
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams)) AS i, a.ng AS na, b.ng AS nb
  FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id AND a.ng * 2 >= b.ng AND b.ng * 2 >= a.ng
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs WHERE i * 2 >= (na + nb - i)
  UNION ALL
  SELECT id_b, id_a FROM pairs WHERE i * 2 >= (na + nb - i)
), cc(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.id WHERE cc.lbl < e.v
)
SELECT id AS doc_id, MIN(lbl) AS cluster_id
FROM cc GROUP BY id ORDER BY doc_id
""".strip()


# ---------------------------------------------------------------------------
# training-data assembly: span dedup, sequence packing, shard layout
# (operators/packing.py)
# ---------------------------------------------------------------------------

_SPAN_N = 8  # word n-gram width for cross-doc span dedup
_SPAN_THRESHOLD = 0.5
_SEQ_LEN = 256  # tokens per packed training sequence
_N_SHARDS = 8


def _bloom_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a reference snapshot via a broadcast
    Bloom filter (operators/bloom): reference = docs with doc_id % 3 == 0,
    corpus = the rest; survivors are corpus docs whose text is NOT in the
    reference. Zero joins/shuffles on either side — the 100 TB
    ingest-versus-archive pattern. The md5 double-hash is deterministic,
    and at fpp=1e-9 over this corpus the filter provably (checked in CI
    at both gate scales) reports zero false positives, so the result
    equals the exact NOT EXISTS oracle."""
    from pangeo_forge_recipes_spark.operators.bloom import (
        dedup_against_reference,
    )

    _register(spark, sf_dir)
    docs = spark.table("documents")
    ref = docs.filter("doc_id % 3 = 0").select("text")
    corpus = docs.filter("doc_id % 3 != 0").select("doc_id", "text")
    out = dedup_against_reference(
        corpus, ref, col="text", expected_items=200_000, fpp=1e-9
    )
    # no trailing orderBy: the driver's value hash is order-insensitive,
    # and a global sort of the survivors adds a shuffle for presentation
    return out.select("doc_id")


_BLOOM_ORACLE = """
SELECT c.doc_id
FROM documents c
WHERE c.doc_id % 3 <> 0
  AND NOT EXISTS (
    SELECT 1 FROM documents r
    WHERE r.doc_id % 3 = 0 AND r.text = c.text
  )
ORDER BY doc_id
""".strip()


def _ngram_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span fraction (word 8-grams shared with
    any other doc) + the keep/drop gate — the n-gram-granular
    approximation of suffix-array substring dedup. Pure explode →
    hash-agg → equi-join plan; oracle is the same n-gram definition in
    DuckDB list functions."""
    from pangeo_forge_recipes_spark.operators.packing import crossdoc_ngram_dup

    _register(spark, sf_dir)
    return crossdoc_ngram_dup(
        spark.table("documents"), n=_SPAN_N, threshold=_SPAN_THRESHOLD
    )


def _pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: docs in deterministic
    md5 order, the concatenated token stream cut into fixed 256-token
    sequences; per-sequence packing stats. The Spark side is a
    distributed prefix sum (range partition + partial sums + broadcast
    offsets — never a single-task global window); the oracle is the
    equivalent single window in DuckDB."""
    from pangeo_forge_recipes_spark.operators.packing import (
        pack_sequences,
        pack_summary,
    )

    _register(spark, sf_dir)
    e = TextExprs("spark", "text")
    counted = spark.table("documents").withColumn(
        "token_count", F.expr(e.token_count()).cast("long")
    )
    # r12 (guide §2.3, project before the exchange): pack_summary needs
    # only (doc_id, token_count, seq_id) — dropping text here keeps the
    # document bytes out of the bucket repartition and the Python scan
    # stage (the opaque mapInPandas otherwise forces Spark to ship every
    # column). Same packing, same summary.
    counted = counted.select("doc_id", "token_count")
    return pack_summary(pack_sequences(counted, seq_len=_SEQ_LEN))


def _corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced shard layout for a multi-host loader:
    portable md5 bucket of the doc id (the train/val/test splitter's hash
    family), per-shard doc/token/language stats."""
    from pangeo_forge_recipes_spark.operators.packing import shard_assign

    _register(spark, sf_dir)
    e = TextExprs("spark", "text")
    docs = shard_assign(spark.table("documents"), n_shards=_N_SHARDS)
    return (
        docs.withColumn("token_count", F.expr(e.token_count()).cast("long"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("token_count").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


def _span_dedup_oracle() -> str:
    e = TextExprs("duckdb", "text")
    return f"""
WITH grams AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, unnest({e.token_ngrams(_SPAN_N)}) AS gram FROM documents) t
), freq AS (
  SELECT gram, COUNT(*) AS nd FROM grams GROUP BY gram
), per_doc AS (
  SELECT g.doc_id, COUNT(*) AS n_grams,
         SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS dup_grams
  FROM grams g JOIN freq f USING (gram) GROUP BY g.doc_id
)
SELECT doc_id, n_grams, dup_grams, dup_frac,
       (dup_frac <= {_SPAN_THRESHOLD}) AS keep
FROM (
  SELECT d.doc_id,
         CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
         CAST(COALESCE(p.dup_grams, 0) AS BIGINT) AS dup_grams,
         -- integer-exact 4dp half-up rounding, matching the Spark side's
         -- (dup*20000 + n) div (2n) / 10000.0 — bit-identical doubles
         (((COALESCE(p.dup_grams, 0) * 20000
            + GREATEST(COALESCE(p.n_grams, 0), 1))
           // (2 * GREATEST(COALESCE(p.n_grams, 0), 1))) / 10000.0
         ) AS dup_frac
  FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
)
ORDER BY doc_id
""".strip()


def _remove_dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span REMOVAL (operators/packing.remove_duplicate_spans)
    — the rewrite side of "Deduplicating Training Data" span dedup: a
    token goes iff covered by an 8-gram window whose hash also occurs in
    a smaller-id document (the min-id doc OWNS each shared gram, so one
    copy of every shared span survives). Two shuffles, min/max ownership
    window (never collect_set), JVM higher-order splice. The oracle
    replicates gram ownership + token splice with DuckDB list lambdas,
    gram identity by STRING (whitespace tokens make the space-join
    injective ⟺ the engine's multi-arg xxhash64 windows)."""
    from pangeo_forge_recipes_spark.operators.packing import (
        remove_duplicate_spans,
    )

    _register(spark, sf_dir)
    return remove_duplicate_spans(spark.table("documents"), n=_SPAN_N)


def _span_removal_oracle() -> str:
    n = _SPAN_N
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id, CAST(gs.i - 1 AS BIGINT) AS s,
         array_to_string(t[gs.i : gs.i + {n - 1}], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {n} + 2)) AS i) gs
  WHERE len(t) >= {n}
),
own AS (SELECT gram, min(doc_id) AS owner, max(doc_id) AS mx FROM occ GROUP BY gram),
rem AS (SELECT o.doc_id, o.s FROM occ o JOIN own w USING (gram)
        WHERE w.owner <> w.mx AND o.doc_id <> w.owner),
cov AS (SELECT doc_id, list(DISTINCT s) AS starts FROM rem GROUP BY doc_id),
spliced AS (
  SELECT t.doc_id,
         list_filter(t.t, (tok, i) ->
             len(list_filter(coalesce(c.starts, []),
                             s -> s <= i - 1 AND i - 1 < s + {n})) = 0) AS kept,
         len(t.t) AS n_tokens
  FROM toks t LEFT JOIN cov c USING (doc_id)
)
SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS clean_text,
       CAST(n_tokens AS INT) AS n_tokens,
       CAST(n_tokens - len(kept) AS INT) AS removed_tokens
FROM spliced
""".strip()


def _pack_oracle() -> str:
    e = TextExprs("duckdb", "text")
    tok = f"CAST({e.token_count()} AS BIGINT)"
    return f"""
WITH toks AS (
  SELECT doc_id, {tok} AS n,
         SUM({tok}) OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
)
SELECT CAST((cum - n) // {_SEQ_LEN} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM toks GROUP BY 1 ORDER BY 1
""".strip()


def _shards_oracle() -> str:
    e = TextExprs("duckdb", "text")
    bucket = e.sample_bucket("CAST(doc_id AS VARCHAR)", _N_SHARDS)
    return f"""
SELECT CAST({bucket} AS INT) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST({e.token_count()} AS BIGINT)) AS BIGINT) AS total_tokens,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY 1 ORDER BY 1
""".strip()


_DSIR_B = 512  # hashed n-gram buckets
_DSIR_ALPHA = 1.0
_DSIR_N = 100  # documents selected


def _dsir_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/dsir): target = docs with
    doc_id % 3 == 0, raw = the rest; hashed unigram+bigram histograms →
    broadcast log-ratio table → per-doc weight → deterministic
    Gumbel-top-k selection of _DSIR_N docs. Everything is JVM SQL (two
    hash aggregations + one broadcast join + TakeOrdered); the oracle
    replicates the full method — tokenization, md5-prefix buckets,
    smoothing, Gumbel keys — in DuckDB SQL."""
    from pangeo_forge_recipes_spark.operators.dsir import dsir_sample

    _register(spark, sf_dir)
    docs = spark.table("documents")
    raw = docs.filter("doc_id % 3 != 0").select("doc_id", "text")
    tgt = docs.filter("doc_id % 3 = 0").select("doc_id", "text")
    sel = dsir_sample(raw, tgt, n=_DSIR_N, buckets=_DSIR_B, alpha=_DSIR_ALPHA)
    return sel.select(
        "doc_id", F.round("log_weight", 4).alias("log_weight")
    )


def _dsir_oracle() -> str:
    B, ALPHA, N = _DSIR_B, _DSIR_ALPHA, _DSIR_N
    return f"""
WITH raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
tgt AS (SELECT text FROM documents WHERE doc_id % 3 = 0),
raw_tok AS (
  SELECT doc_id,
         list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), ' '),
                     x -> x <> '') AS toks
  FROM raw),
tgt_tok AS (
  SELECT list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), ' '),
                     x -> x <> '') AS toks
  FROM tgt),
raw_grams AS (
  SELECT doc_id, unnest(list_concat(toks,
           CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                ELSE list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) END
         )) AS gram
  FROM raw_tok),
tgt_grams AS (
  SELECT unnest(list_concat(toks,
           CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                ELSE list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) END
         )) AS gram
  FROM tgt_tok),
q_hist AS (
  SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT % {B} AS bucket, COUNT(*) AS q_cnt
  FROM raw_grams GROUP BY 1),
p_hist AS (
  SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT % {B} AS bucket, COUNT(*) AS p_cnt
  FROM tgt_grams GROUP BY 1),
tots AS (
  SELECT (SELECT COALESCE(SUM(p_cnt), 0) FROM p_hist) AS p_tot,
         (SELECT COALESCE(SUM(q_cnt), 0) FROM q_hist) AS q_tot),
ratios AS (
  SELECT b.range AS bucket,
         ln((COALESCE(p.p_cnt, 0) + {ALPHA}) / (t.p_tot + {ALPHA} * {B}))
         - ln((COALESCE(q.q_cnt, 0) + {ALPHA}) / (t.q_tot + {ALPHA} * {B})) AS log_ratio
  FROM range({B}) b LEFT JOIN p_hist p ON b.range = p.bucket
                    LEFT JOIN q_hist q ON b.range = q.bucket, tots t),
weights AS (
  SELECT r.doc_id, COALESCE(w.log_weight, 0.0) AS log_weight
  FROM raw r LEFT JOIN (
    SELECT g.doc_id, SUM(rt.log_ratio) AS log_weight
    FROM raw_grams g
    JOIN ratios rt ON rt.bucket = ('0x' || substr(md5(g.gram), 1, 8))::BIGINT % {B}
    GROUP BY g.doc_id) w ON r.doc_id = w.doc_id),
keyed AS (
  SELECT doc_id, log_weight,
         log_weight + (-ln(-ln(
           least(greatest((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)::DOUBLE
                          / 4294967296.0, 1e-12), 1.0 - 1e-12)))) AS gkey
  FROM weights)
SELECT doc_id, round(log_weight, 4) AS log_weight
FROM (SELECT * FROM keyed ORDER BY gkey DESC LIMIT {N})
ORDER BY doc_id
""".strip()


_GOPHER_MIN_TOKENS = 20
_GOPHER_TOP_NGRAM_MAX = 0.10
_GOPHER_STOPWORD_MIN = 0.02
_GOPHER_MWL_RANGE = (3, 10)


def _gopher_c4_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style corpus-hygiene composite (operators/filters +
    functions/textexprs): per-document top-bigram fraction (the real
    explode → hash-agg operator), token count, mean word length and
    stopword ratio, plus the Gopher-rule keep decision from the
    unrounded values. All JVM SQL — explode/hash-agg + scalar
    expressions; the oracle replicates every metric in DuckDB."""
    from pangeo_forge_recipes_spark.operators.filters import (
        top_ngram_fraction_expr,
    )

    _register(spark, sf_dir)
    # Plan discipline (r9): the whole composite is ONE spark.sql over the
    # cached 32-wide documents table — map-only, zero exchanges (the
    # top_ngram mode count is a per-row sorted-run fold, plan-gated in
    # test_filters). The token split binds ONCE (__t); every metric is
    # materialized into a column once and `keep` derives from the
    # columns (re-referencing the raw expressions doubled the
    # interpreted higher-order work). One statement also keeps the
    # per-invocation Catalyst analyze/optimize cost to a single pass —
    # at this corpus SF the fresh-plan compile is a large share of the
    # wall (it amortizes to nothing at real scale).
    e = TextExprs("spark", "text", tokens_col="__t")
    lo, hi = _GOPHER_MWL_RANGE
    return spark.sql(f"""
SELECT doc_id, n_tokens,
       round(top_ngram_frac, 4) AS top_ngram_frac,
       round(__mwl, 4) AS mean_word_len,
       round(__swr, 4) AS stopword_ratio,
       (n_tokens >= {_GOPHER_MIN_TOKENS}
        AND top_ngram_frac <= {_GOPHER_TOP_NGRAM_MAX}
        AND __swr >= {_GOPHER_STOPWORD_MIN}
        AND __mwl BETWEEN {lo} AND {hi}) AS keep
FROM (
  SELECT doc_id,
         {top_ngram_fraction_expr("__t", 2)} AS top_ngram_frac,
         cast({e.token_count()} as long) AS n_tokens,
         {e.mean_word_len()} AS __mwl,
         {e.stopword_ratio()} AS __swr
  FROM (SELECT doc_id, text, split(text, ' ') AS __t FROM documents)
)""")


def _gopher_oracle() -> str:
    d = TextExprs("duckdb", "text")
    lo, hi = _GOPHER_MWL_RANGE
    return f"""
WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, len(t) AS ntok_s,
         unnest(CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
                ELSE list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]) END) AS g
  FROM toks),
cnt AS (SELECT doc_id, ntok_s, g, COUNT(*) AS c FROM grams GROUP BY doc_id, ntok_s, g),
top AS (SELECT doc_id, MAX(c) AS topc, ANY_VALUE(ntok_s) AS ntok_s FROM cnt GROUP BY doc_id),
m AS (
  SELECT d.doc_id,
         CAST({d.token_count()} AS BIGINT) AS n_tokens,
         COALESCE(t.topc * 2 / GREATEST(t.ntok_s, 1), 0.0) AS top_raw,
         {d.mean_word_len()} AS mwl_raw,
         {d.stopword_ratio()} AS swr_raw
  FROM documents d LEFT JOIN top t USING (doc_id))
SELECT doc_id, n_tokens,
       round(top_raw, 4) AS top_ngram_frac,
       round(mwl_raw, 4) AS mean_word_len,
       round(swr_raw, 4) AS stopword_ratio,
       (n_tokens >= {_GOPHER_MIN_TOKENS} AND top_raw <= {_GOPHER_TOP_NGRAM_MAX}
        AND swr_raw >= {_GOPHER_STOPWORD_MIN}
        AND mwl_raw BETWEEN {lo} AND {hi}) AS keep
FROM m ORDER BY doc_id
""".strip()


_LINES_PER = 4  # words per synthesized line for the dedup_lines query


def _dedup_lines_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet corpus-level line dedup (operators/filters.dedup_lines):
    documents are single-line, so lines are synthesized deterministically
    (a newline after every 4th word — identical regex in both engines);
    lines whose normalized form appears in ≥2 distinct documents drop
    corpus-wide, the rest rebuild in order. The oracle replicates the
    whole pipeline with DuckDB list functions, grouping on the
    normalized STRING itself (the operator's xxhash64 is an
    optimization, not semantics)."""
    from pangeo_forge_recipes_spark.operators.filters import dedup_lines

    _register(spark, sf_dir)
    pat = r"((?:\S+ ){%d}\S+) " % (_LINES_PER - 1)
    docs = spark.table("documents").select(
        "doc_id",
        F.regexp_replace("text", pat, "$1\n").alias("text"),
    )
    out = dedup_lines(docs, min_docs=2)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        "n_lines_kept",
        "n_lines_dropped",
    )


def _dedup_lines_oracle() -> str:
    # Java \p{Punct} (the operator's normalization class) is exactly the
    # ASCII ranges !-/ :-@ [-` {-~ ; spelled out so RE2 matches Java
    norm = (
        "trim(regexp_replace(regexp_replace(lower({x}), "
        "'[0-9!-/:-@\\[-`{{-~]+', '', 'g'), '\\s+', ' ', 'g'))"
    )
    nx = norm.format(x="x")
    nl = norm.format(x="line")
    split_pat = r"((?:\S+ ){%d}\S+) " % (_LINES_PER - 1)
    return f"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(text, '{split_pat}', '\\1' || chr(10), 'g') AS text
  FROM documents),
lx AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
ln AS (SELECT doc_id, unnest(ls) AS line FROM lx),
freqs AS (
  SELECT norm FROM (
    SELECT DISTINCT doc_id, {nl} AS norm FROM ln
  ) WHERE norm != '' GROUP BY norm HAVING COUNT(*) >= 2),
f AS (SELECT coalesce(list(norm), []) AS fl FROM freqs),
kept AS (
  SELECT doc_id, ls,
         list_filter(ls, x -> {nx} = '' OR NOT list_contains(f.fl, {nx})) AS ks
  FROM lx, f)
SELECT doc_id,
       md5(array_to_string(ks, chr(10))) AS text_md5,
       len(ks) AS n_lines_kept,
       len(ls) - len(ks) AS n_lines_dropped
FROM kept WHERE len(ks) > 0
""".strip()


def _mix_corpora_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling (operators/text.mix_corpora): three
    deterministic sub-corpora of documents weighted 3/2/1, 120 docs
    total. Each per-source draw plans as a distributed TakeOrdered on
    the md5-bucket key (never ``rand()``, never a global sort); the
    oracle repeats the same md5-ordered LIMITs natively in DuckDB."""
    from pangeo_forge_recipes_spark.operators.text import mix_corpora

    _register(spark, sf_dir)
    docs = spark.table("documents").select("doc_id")
    srcs = [
        ("web", docs.where(F.expr("doc_id % 6 < 3")), 3.0),
        ("books", docs.where(F.expr("doc_id % 6 IN (3, 4)")), 2.0),
        ("code", docs.where(F.expr("doc_id % 6 = 5")), 1.0),
    ]
    out = mix_corpora(srcs, n_total=120, id_col="doc_id")
    return out.select("doc_id", F.col("source").alias("corpus"))


def _mix_corpora_oracle() -> str:
    # weights 3/2/1 over n_total=120 divide exactly (60/40/20), so the
    # largest-remainder step is a no-op and each branch is one md5-ordered
    # LIMIT — the same per-source TakeOrdered the Spark plan runs
    parts = []
    for corpus, pred, k in (
        ("web", "doc_id % 6 < 3", 60),
        ("books", "doc_id % 6 IN (3, 4)", 40),
        ("code", "doc_id % 6 = 5", 20),
    ):
        parts.append(
            f"SELECT doc_id, '{corpus}' AS corpus FROM ("
            f"SELECT doc_id FROM documents WHERE {pred} "
            f"ORDER BY md5('mix' || CAST(doc_id AS VARCHAR)) LIMIT {k})"
        )
    return "\nUNION ALL\n".join(parts)


def _chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/packing.chunk_documents):
    overlapping 24-word windows every 16 words, partial tails kept at
    >= 4 new words — map-only SQL (sequence/transform/posexplode), no
    shuffle. The oracle rebuilds the same windows with DuckDB list
    functions; chunk_id = start/stride because the tail filter only
    drops a suffix of the stride sequence."""
    from pangeo_forge_recipes_spark.operators.packing import chunk_documents

    _register(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    out = chunk_documents(docs, window=24, stride=16, min_tail=4)
    return out.select("doc_id", "chunk_id", "chunk_text", "n_words")


def _chunk_documents_oracle() -> str:
    return r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents),
s AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) <= 24 THEN [CAST(0 AS BIGINT)]
              ELSE list_filter(range(0, len(toks), 16),
                               st -> st = 0 OR st - 16 + 24 + 4 <= len(toks))
         END AS starts
  FROM t),
u AS (SELECT doc_id, toks, unnest(starts) AS st FROM s)
SELECT doc_id,
       CAST(st // 16 AS INT) AS chunk_id,
       array_to_string(list_slice(toks, st + 1, st + 24), ' ') AS chunk_text,
       CAST(len(list_slice(toks, st + 1, st + 24)) AS INT) AS n_words
FROM u
""".strip()


def _quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped LM quality filter (operators/lmscore): train a byte-
    trigram model on the reference slice (doc_id % 4 = 0), score the
    rest, keep documents under a fixed cross-entropy ceiling. Train is
    ONE map-side-combining hash-agg; scoring is map-only against the
    broadcast model. The oracle replicates train+score in DuckDB with
    character trigrams — exact because the corpus is pure ASCII (byte
    trigrams ≡ char trigrams; asserted by the n_chars column) — and the
    count arithmetic is integer-exact, so only the final mean is
    floating point (both sides round to 6 digits; the nearest document
    sits 4e-5 from the 1.6 ceiling, 10 orders above cross-engine ulp)."""
    from pangeo_forge_recipes_spark.operators.lmscore import quality_filter

    _register(spark, sf_dir)
    docs = spark.table("documents")
    ref = docs.where("doc_id % 4 = 0").select("text")
    raw = docs.where("doc_id % 4 <> 0").select("doc_id", "text")
    kept = quality_filter(raw, ref, max_bits_per_char=1.6, keep_fraction=None)
    return kept.select(
        "doc_id", F.round("bits_per_char", 6).alias("bits_per_char")
    )


def _quality_filter_oracle() -> str:
    return """
WITH ref AS (SELECT text FROM documents WHERE doc_id % 4 = 0),
raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
tri AS (
  SELECT substring(text, CAST(i AS BIGINT), 3) AS tg,
         CAST(count(*) AS DOUBLE) AS c
  FROM ref, unnest(range(1, length(text) - 1)) AS t(i)
  GROUP BY tg),
ctx AS (SELECT substring(tg, 1, 2) AS cg, sum(c) AS ct FROM tri GROUP BY cg),
pos AS (
  SELECT doc_id, substring(text, CAST(i AS BIGINT), 3) AS tg
  FROM raw, unnest(range(1, length(text) - 1)) AS t(i)),
scored AS (
  SELECT p.doc_id,
         -avg(log2(coalesce(t.c, 0) + 0.5)
              - log2(coalesce(x.ct, 0) + 128.0)) AS bits
  FROM pos p
  LEFT JOIN tri t ON p.tg = t.tg
  LEFT JOIN ctx x ON substring(p.tg, 1, 2) = x.cg
  GROUP BY p.doc_id)
SELECT doc_id, round(bits, 6) AS bits_per_char FROM scored WHERE bits <= 1.6
""".strip()


def _perplexity_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity split (operators/lmscore
    ``perplexity_buckets``): score the corpus against the reference LM
    (same byte-trigram model/split as quality_filter) and label each doc
    by its cross-entropy tercile. The cuts are ONE exact-percentile
    driver pass; the labels are a broadcast of two floats, map-only.
    Oracle: the same trigram replication + ``quantile_cont`` terciles —
    both engines interpolate at (n-1)q, and with 375/3750 corpus docs
    the cut always lands BETWEEN data points, so a sub-ulp score
    difference cannot flip a label."""
    from pangeo_forge_recipes_spark.operators.lmscore import (
        perplexity_buckets,
    )

    _register(spark, sf_dir)
    docs = spark.table("documents")
    ref = docs.where("doc_id % 4 = 0").select("text")
    raw = docs.where("doc_id % 4 <> 0").select("doc_id", "text")
    out = perplexity_buckets(raw, ref)
    return out.select(
        "doc_id",
        F.round("bits_per_char", 6).alias("bits_per_char"),
        "ppl_bucket",
    )


def _perplexity_buckets_oracle() -> str:
    return """
WITH ref AS (SELECT text FROM documents WHERE doc_id % 4 = 0),
raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
tri AS (
  SELECT substring(text, CAST(i AS BIGINT), 3) AS tg,
         CAST(count(*) AS DOUBLE) AS c
  FROM ref, unnest(range(1, length(text) - 1)) AS t(i)
  GROUP BY tg),
ctx AS (SELECT substring(tg, 1, 2) AS cg, sum(c) AS ct FROM tri GROUP BY cg),
pos AS (
  SELECT doc_id, substring(text, CAST(i AS BIGINT), 3) AS tg
  FROM raw, unnest(range(1, length(text) - 1)) AS t(i)),
scored AS (
  SELECT p.doc_id,
         -avg(log2(coalesce(t.c, 0) + 0.5)
              - log2(coalesce(x.ct, 0) + 128.0)) AS bits
  FROM pos p
  LEFT JOIN tri t ON p.tg = t.tg
  LEFT JOIN ctx x ON substring(p.tg, 1, 2) = x.cg
  GROUP BY p.doc_id),
cuts AS (
  SELECT quantile_cont(bits, CAST(1 AS DOUBLE)/3) AS lo,
         quantile_cont(bits, CAST(2 AS DOUBLE)/3) AS hi
  FROM scored)
SELECT doc_id, round(bits, 6) AS bits_per_char,
       CASE WHEN bits <= lo THEN 'head'
            WHEN bits <= hi THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM scored, cuts
""".strip()


_WDS_SHARDS = 8


def _webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard round-trip (operators/packing
    ``write_webdataset_shards`` → sources/webdataset ``read_webdataset``):
    the corpus is materialized as tar shards and read back; the result
    must be the identity over documents (doc_id, text, lang, source via
    the json sidecar). Grades the full loader loop — md5 shard
    assignment, canonical in-shard order, normalized tar headers, the
    stream-mode one-task-per-shard scan, and key/extension grouping."""
    from pangeo_forge_recipes_spark.operators.packing import (
        write_webdataset_shards,
    )
    from pangeo_forge_recipes_spark.sources import (
        decode_webdataset_text,
        read_webdataset,
    )

    _register(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="pfrs_wds_")
    docs = spark.table("documents")
    write_webdataset_shards(
        docs, tmp, n_shards=_WDS_SHARDS, meta_cols=["lang", "source"]
    )
    wds = decode_webdataset_text(read_webdataset(spark, tmp))
    return wds.select(
        F.col("key").cast("long").alias("doc_id"),
        "text",
        F.get_json_object("meta_json", "$.lang").alias("lang"),
        F.get_json_object("meta_json", "$.source").alias("source"),
    )


_WDS_ORACLE = "SELECT doc_id, text, lang, source FROM documents"


def _tfrecord_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRecord shard round-trip (sources/tfrecord): the corpus
    materializes as spec-framed TFRecord shards (masked-CRC32C record
    framing, tf.train.Example payloads, md5-deterministic shard bytes)
    and reads back through the one-task-per-shard typed reader; the
    result must be the identity over documents. Grades the framing
    CRCs, the Example proto codec both directions, Int64List/BytesList
    typing, and the shard loop — gzip on one path exercises the
    compressed-shard branch too."""
    from pangeo_forge_recipes_spark.sources import (
        read_tfrecord,
        write_tfrecord_shards,
    )

    _register(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="pfrs_tfr_")
    docs = spark.table("documents")
    plain = os.path.join(tmp, "plain")
    gz = os.path.join(tmp, "gz")
    lo = docs.where(F.col("doc_id") % 2 == 0)
    hi = docs.where(F.col("doc_id") % 2 == 1)
    # r12 (guide §2.6): the two independent shard-write jobs overlap —
    # submitted from two driver threads so the second job's tasks
    # back-fill executors freed by the first job's tail instead of
    # waiting behind a sequential barrier
    from concurrent.futures import ThreadPoolExecutor

    def _write(args):
        side, dest, kw = args
        write_tfrecord_shards(
            side, dest, n_shards=_WDS_SHARDS, meta_cols=["lang", "n_chars"], **kw
        ).collect()

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(
            pool.map(
                _write,
                [(lo, plain, {}), (hi, gz, {"compress": "gzip"})],
            )
        )
    types = {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "n_chars": "int64",
    }
    back = read_tfrecord(spark, plain, types).unionByName(
        read_tfrecord(spark, gz, types)
    )
    return back.select("doc_id", "text", "lang", "n_chars")


_TFR_ORACLE = "SELECT doc_id, text, lang, n_chars FROM documents"

_WARC_FILES = 4  # gzip archives per round-trip (several tasks scan in parallel)


def _warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion round-trip (sources/warc): the corpus materializes
    as conforming gzip-member-per-record WARC archives via ``write_warc``
    (the fixture writer — this driver-side synthesis only builds the
    test archive; at scale the archives already exist, Common Crawl
    style) and re-ingests through ``read_warc`` — the map-only
    bounded-memory streaming scan that IS the graded path. Identity over
    documents; doc_id rides the WARC-Target-URI."""
    from pangeo_forge_recipes_spark.sources.warc import read_warc, write_warc

    _register(spark, sf_dir)
    rows = spark.table("documents").select("doc_id", "text").collect()
    tmp = tempfile.mkdtemp(prefix="pfrs_warc_")
    per = (len(rows) + _WARC_FILES - 1) // _WARC_FILES
    for i in range(_WARC_FILES):
        chunk = rows[i * per : (i + 1) * per]
        if chunk:
            write_warc(
                os.path.join(tmp, f"part{i}.warc.gz"),
                [
                    {
                        "warc_type": "response",
                        "target_uri": f"https://corpus.example/{r[0]}",
                        "http": {
                            "status": 200,
                            "content_type": "text/plain",
                            "payload": r[1].encode(),
                        },
                    }
                    for r in chunk
                ],
            )
    recs = read_warc(spark, tmp)
    return recs.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("payload").cast("string").alias("text"),
    )


_WARC_ORACLE = "SELECT doc_id, text FROM documents"

_DECON_MOD = 5  # doc_id % 5 == 0 -> held-out "benchmark" split
_DECON_N = 13  # the standard 13-gram decontamination window


def _decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/PaLM-style benchmark decontamination (operators/filters
    ``decontaminate``): docs sharing any lowercased word 13-gram with the
    held-out split (doc_id % 5 == 0) are dropped from the rest. The
    benchmark gram set is distinct'd, hashed and BROADCAST; the corpus
    explodes to hashes and semi-joins map-side — the corpus itself never
    shuffles. The oracle replicates the gram definition in DuckDB list
    functions and joins on the gram STRING (same membership semantics
    as the engine's xxhash64 join)."""
    from pangeo_forge_recipes_spark.operators.filters import decontaminate

    _register(spark, sf_dir)
    docs = spark.table("documents")
    bench = docs.filter(F.col("doc_id") % _DECON_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _DECON_MOD != 0)
    return decontaminate(corpus, bench, n=_DECON_N).select(
        "doc_id", "lang", "source"
    )


def _decontaminate_oracle() -> str:
    w = _DECON_N - 1
    return f"""
WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id,
         lower(array_to_string(list_slice(t, i, i + {w}), ' ')) AS gram
  FROM toks,
       unnest(list_filter(range(1, greatest(len(t) - {w}, 1) + 1),
                          i -> i + {w} <= len(t))) AS u(i)),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {_DECON_MOD} = 0),
hits AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN bench b USING (gram)
  WHERE g.doc_id % {_DECON_MOD} != 0)
SELECT doc_id, lang, source FROM documents
WHERE doc_id % {_DECON_MOD} != 0
  AND doc_id NOT IN (SELECT doc_id FROM hits)
""".strip()


def _c4_text_expr(dialect: str) -> str:
    """Deterministic multi-line C4 test corpus — identical strings on
    both engines. The raw documents text carries no punctuation, so the
    4-words-per-line split adds a terminal mark by doc_id class: '.'
    lines (plus a punctuated tail whose word count varies 1-4 — the
    min-words rule does real work), '!' lines, or bare lines (the whole
    doc fails the line filter); every 17th doc gains a boilerplate
    marker and every 19th a brace so the doc-level drops fire too."""
    pat = r"((?:\S+ ){%d}\S+) " % (_LINES_PER - 1)
    if dialect == "spark":
        # Spark SQL string literals process backslash escapes — double
        # them so the regex engine sees \S (DuckDB literals are raw)
        spat = pat.replace("\\", "\\\\")
        rep = lambda tail: f"'$1{tail}\\n'"  # noqa: E731
        rr = lambda tail: f"regexp_replace(text, '{spat}', {rep(tail)})"  # noqa: E731
    else:
        rep = lambda tail: f"'\\1{tail}' || chr(10)"  # noqa: E731
        rr = lambda tail: (  # noqa: E731
            f"regexp_replace(text, '{pat}', {rep(tail)}, 'g')"
        )
    base = (
        f"CASE doc_id % 3 WHEN 0 THEN concat({rr('.')}, '.') "
        f"WHEN 1 THEN {rr('!')} ELSE {rr('')} END"
    )
    return (
        f"CASE WHEN doc_id % 17 = 0 THEN concat({base}, ' Lorem Ipsum dolor') "
        f"WHEN doc_id % 19 = 0 THEN concat({base}, ' {{x}}') "
        f"ELSE {base} END"
    )


def _c4_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (operators/filters.c4_clean): documents get
    a deterministic 4-words-per-line split with per-class terminal
    punctuation, then lines must end in terminal punctuation and carry
    >= 3 words; docs with boilerplate markers or braces drop whole.
    Map-only — the filter pushes into the scan, no shuffle. The oracle
    replicates the whole rule set with DuckDB list functions."""
    from pangeo_forge_recipes_spark.operators.filters import c4_clean

    _register(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", F.expr(_c4_text_expr("spark")).alias("text")
    )
    out = c4_clean(docs, min_words_per_line=3, min_lines=1)
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"), "n_kept_lines"
    )


def _c4_clean_oracle() -> str:
    keep = (
        "list_filter(ls, l -> len(string_split_regex(trim(l), ' +')) >= 3 "
        "AND regexp_matches(trim(l), '[.!?\"]$'))"
    )
    return f"""
WITH d AS (
  SELECT doc_id, {_c4_text_expr("duckdb")} AS text
  FROM documents),
lx AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM d),
kept AS (SELECT doc_id, text, {keep} AS ks FROM lx)
SELECT doc_id,
       md5(array_to_string(ks, chr(10))) AS text_md5,
       len(ks) AS n_kept_lines
FROM kept
WHERE len(ks) >= 1
  AND lower(text) NOT LIKE '%lorem ipsum%'
  AND lower(text) NOT LIKE '%javascript must be enabled%'
  AND text NOT LIKE '%{{%'
""".strip()


def _pii_source_expr(dialect: str) -> str:
    """Deterministic PII-bearing text generator — identical strings on
    both engines: every doc gains an email, a dotted-quad and a
    US-shaped phone number derived from doc_id."""
    s = "string" if dialect == "spark" else "varchar"
    return (
        "concat(text, ' Contact user', cast(doc_id as {s}), "
        "'@mail.example.org, ip 192.168.', cast(doc_id % 256 as {s}), "
        "'.17, call (415) 555-', "
        "lpad(cast(doc_id % 10000 as {s}), 4, '0'), ' now.')"
    ).format(s=s)


def _scrub_pii_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/filters.scrub_pii): email / IPv4 / phone
    spans replaced by placeholder tokens through a JVM regexp_replace
    chain — pure map, codegen'd, zero shuffle. The oracle chains the
    same RE2-compatible patterns in DuckDB over identically synthesized
    input text."""
    from pangeo_forge_recipes_spark.operators.filters import scrub_pii

    _register(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", F.expr(_pii_source_expr("spark")).alias("text")
    )
    out = scrub_pii(docs)
    n = lambda tok: (  # noqa: E731 — occurrence count, portable SQL
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(tok))))
        / len(tok)
    ).cast("long")
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        n("<EMAIL>").alias("n_email"),
        n("<IP>").alias("n_ip"),
        n("<PHONE>").alias("n_phone"),
    )


def _scrub_pii_oracle() -> str:
    from pangeo_forge_recipes_spark.operators.filters import _PII_PATTERNS

    x = f"({_pii_source_expr('duckdb')})"
    for pat, repl in _PII_PATTERNS:
        # DuckDB '...' literals are raw — no backslash escaping
        x = f"regexp_replace({x}, '{pat.replace(chr(39), chr(39) * 2)}', '{repl}', 'g')"
    counts = ", ".join(
        f"CAST((length(scrubbed) - length(replace(scrubbed, '{tok}', '')))"
        f" / {len(tok)} AS BIGINT) AS {alias}"
        for tok, alias in (
            ("<EMAIL>", "n_email"), ("<IP>", "n_ip"), ("<PHONE>", "n_phone"),
        )
    )
    return f"""
WITH s AS (SELECT doc_id, {x} AS scrubbed FROM documents)
SELECT doc_id, md5(scrubbed) AS text_md5, {counts} FROM s
""".strip()


def _stream_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash-LSH near-dup flagging at ingest
    (streaming/stateful.streaming_minhash_dedup): per-band-bucket
    stateful operator whose whole state is the bucket's first-seen doc
    id; later arrivals emit (doc, first) candidates. Candidates verify
    against the ground-truth exact-Jaccard pair set (the batch
    minhash_dedup output this gate already grades) and each flagged doc
    reports its smallest verified representative — with an id-ordered
    stream, that is exactly min(cluster) for every non-minimal cluster
    member, which the oracle derives from the same all-pairs Jaccard."""
    from pangeo_forge_recipes_spark.streaming.stateful import (
        streaming_minhash_dedup,
    )

    _register(spark, sf_dir)
    for q in spark.streams.active:
        if q.name == "_stream_minhash":
            q.stop()
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select("doc_id", "text")
    )
    query = (
        streaming_minhash_dedup(raw)
        .writeStream.format("memory")
        .queryName("_stream_minhash")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    candidates = (
        spark.table("_stream_minhash").select("doc_id", "first_doc_id").distinct()
    )
    pairs = _minhash_pairs_for(spark, sf_dir)  # ground-truth verification
    verified = candidates.join(
        pairs,
        (candidates.first_doc_id == pairs.id_a) & (candidates.doc_id == pairs.id_b),
        "inner",
    )
    return verified.groupBy("doc_id").agg(F.min("first_doc_id").alias("rep_id"))


# every true pair (jaccard >= 0.92 on this corpus) collides directly in
# >= 1 of 16 bands w.p. 1 - (1-0.92^4)^16 ~ 1-2e-9, so each non-minimal
# cluster member is flagged against the cluster minimum; false band
# collisions are dropped by the exact-Jaccard verification on both sides
_STREAM_MINHASH_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(lower(text))-3, 2)),
                                      i -> hash(substring(lower(text), i, 5)))) AS grams,
         len(list_distinct(list_transform(range(1, greatest(length(lower(text))-3, 2)),
                                      i -> hash(substring(lower(text), i, 5))))) AS ng
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams)) AS i, a.ng AS na, b.ng AS nb
  FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id AND a.ng * 2 >= b.ng AND b.ng * 2 >= a.ng
)
SELECT id_b AS doc_id, MIN(id_a) AS rep_id
FROM pairs WHERE i * 2 >= (na + nb - i)
GROUP BY id_b
""".strip()


def _stream_domain_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-host admission cap (streaming/stateful.
    streaming_domain_cap): at most ``cap`` docs per canonical host admit
    ACROSS micro-batches, first-arrived (ascending id) — the C4-style
    guard applied at ingest. State is ONE long per host. Urls derive
    deterministically from doc_id so the query is sf-independent; over a
    single availableNow batch, first-arrived admission is exactly a
    row_number window ordered by id — the oracle's shape."""
    from pangeo_forge_recipes_spark.streaming import streaming_domain_cap

    _register(spark, sf_dir)
    for q in spark.streams.active:
        if q.name == "_stream_domain_cap":
            q.stop()
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .selectExpr(
            "doc_id",
            "concat('https://site', cast(doc_id % 7 as string),"
            " '.example.com/', source, '/p', cast(doc_id as string)) AS url",
        )
    )
    query = (
        streaming_domain_cap(raw, cap=_STREAM_CAP)
        .writeStream.format("memory")
        .queryName("_stream_domain_cap")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("_stream_domain_cap").select("doc_id", "host")


_STREAM_CAP = 30

_STREAM_DOMAIN_CAP_ORACLE = f"""
WITH u AS (SELECT doc_id,
                  'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host
           FROM documents),
r AS (SELECT doc_id, host,
             ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) AS rn
      FROM u)
SELECT doc_id, host FROM r WHERE rn <= {_STREAM_CAP}
""".strip()


def _snapshot_sides_sql(dialect: str) -> tuple:
    """Deterministic OLD/NEW snapshot synthesis over documents —
    identical strings on both engines. OLD carries canonical url noise
    (case + fragment); NEW removes doc_id%7==1, lightly edits %7==2
    (touched), replaces %7==3 with md5 gibberish (rewritten), and adds
    five new pages."""
    s = "string" if dialect == "spark" else "varchar"
    old = (
        "SELECT doc_id, concat('HTTPS://Ex.COM/page/', "
        f"cast(doc_id as {s}), '#frag') AS url, text FROM documents"
    )
    newer = (
        "SELECT doc_id, concat('https://ex.com/page/', "
        f"cast(doc_id as {s})) AS url, "
        "CASE WHEN doc_id % 7 = 2 THEN concat(text, ' tiny tail tweak') "
        "WHEN doc_id % 7 = 3 THEN concat('REWRITE ', md5(text), ' ', "
        "md5(concat(text, 'x'))) ELSE text END AS text "
        "FROM documents WHERE doc_id % 7 != 1 "
        "UNION ALL SELECT "
        + (
            "1000000 + id AS doc_id, concat('https://ex.com/new/', "
            "cast(id as string)) AS url, concat('brand new page ', "
            "cast(id as string)) AS text FROM range(5)"
            if dialect == "spark"
            else "1000000 + i AS doc_id, 'https://ex.com/new/' || "
            "CAST(i AS VARCHAR) AS url, 'brand new page ' || "
            "CAST(i AS VARCHAR) AS text FROM range(5) t(i)"
        )
    )
    return old, newer


def _snapshot_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot delta (operators/snapshots.snapshot_delta):
    added/removed/unchanged/touched/rewritten per canonical URL across
    two synthesized snapshots — ONE shuffle (the full-outer join on the
    canonical key; per-side dedup windows ride WindowGroupLimit), the
    near-dup attribution a per-row JVM Jaccard over bound shingle
    arrays, never an LSH pass. The oracle replicates the whole pipeline
    (canonicalizer, md5 equality, char-5-gram Jaccard, thresholds) in
    DuckDB."""
    from pangeo_forge_recipes_spark.operators.snapshots import snapshot_delta

    _register(spark, sf_dir)
    old_sql, new_sql = _snapshot_sides_sql("spark")
    return snapshot_delta(spark.sql(old_sql), spark.sql(new_sql))


def _snapshot_delta_oracle() -> str:
    from pangeo_forge_recipes_spark.operators.urls import canonical_url_sql

    canon = canonical_url_sql("url", "duckdb")
    old_sql, new_sql = _snapshot_sides_sql("duckdb")
    grams = (
        "list_distinct(list_transform(range(1, greatest(length(lower({t})) - 4, 1) + 1), "
        "i -> substring(lower({t}), i, 5)))"
    )
    ga = grams.format(t="old_text")
    gb = grams.format(t="new_text")
    return f"""
WITH olds AS ({old_sql}),
news AS ({new_sql}),
o AS (
  SELECT canonical_url, old_id, old_md5, old_text FROM (
    SELECT {canon} AS canonical_url, doc_id AS old_id, md5(text) AS old_md5,
           text AS old_text,
           ROW_NUMBER() OVER (PARTITION BY {canon} ORDER BY doc_id) AS rn
    FROM olds WHERE {canon} IS NOT NULL) WHERE rn = 1),
n AS (
  SELECT canonical_url, new_id, new_md5, new_text FROM (
    SELECT {canon} AS canonical_url, doc_id AS new_id, md5(text) AS new_md5,
           text AS new_text,
           ROW_NUMBER() OVER (PARTITION BY {canon} ORDER BY doc_id) AS rn
    FROM news WHERE {canon} IS NOT NULL) WHERE rn = 1),
j AS (SELECT * FROM o FULL OUTER JOIN n USING (canonical_url)),
scored AS (
  SELECT canonical_url, old_id, new_id, old_md5, new_md5,
         CASE WHEN old_text IS NULL OR new_text IS NULL THEN NULL ELSE
           CAST(len(list_intersect({ga}, {gb})) AS DOUBLE)
           / (len({ga}) + len({gb}) - len(list_intersect({ga}, {gb})))
         END AS jac
  FROM j)
SELECT canonical_url,
       CASE WHEN old_id IS NULL THEN 'added'
            WHEN new_id IS NULL THEN 'removed'
            WHEN old_md5 IS NOT DISTINCT FROM new_md5 THEN 'unchanged'
            WHEN jac >= 0.8 THEN 'touched'
            ELSE 'rewritten' END AS status,
       old_id, new_id,
       CASE WHEN old_md5 IS NOT NULL AND new_md5 IS NOT NULL
             AND old_md5 <> new_md5 THEN round(jac, 4) END AS jaccard
FROM scored
""".strip()


def _messy_url_expr(dialect: str) -> str:
    """Deterministic messy-URL generator over the documents table —
    identical values on both engines. The variants (case-shifted scheme/
    host, default :80 port, unsorted query params, fragments) are the
    syntactic noise the canonicalizer must fold; doc_id % 50 guarantees
    genuine canonical collisions for the dedup to resolve."""
    num = "cast(doc_id % 50 as {})".format(
        "string" if dialect == "spark" else "varchar"
    )
    return (
        "concat("
        "CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END, '://', "
        "CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM' ELSE 'cdn.example.com' END, "
        "CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END, "
        f"'/', source, '/page', {num}, "
        "CASE WHEN doc_id % 4 = 0 THEN '?b=2&a=1' "
        "WHEN doc_id % 4 = 1 THEN '?a=1&b=2' ELSE '' END, "
        "CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"
    )


def _url_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-level exact-URL dedup (operators/urls): canonicalize the
    syntactic variants, keep the smallest doc_id per canonical form —
    ONE shuffle (a window on the canonical key). The oracle runs the
    dual-dialect canonicalizer text natively on DuckDB."""
    from pangeo_forge_recipes_spark.operators.urls import (
        canonical_url_sql,
        url_dedup,
    )

    _register(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", F.expr(_messy_url_expr("spark")).alias("url")
    )
    kept = url_dedup(docs, col="url", id_col="doc_id")
    return kept.select(
        "doc_id",
        F.expr(canonical_url_sql("url", "spark")).alias("canonical_url"),
    )


def _url_dedup_oracle() -> str:
    from pangeo_forge_recipes_spark.operators.urls import canonical_url_sql

    canon = canonical_url_sql("url", "duckdb")
    return f"""
WITH u AS (SELECT doc_id, {_messy_url_expr("duckdb")} AS url FROM documents),
c AS (SELECT doc_id, url, {canon} AS canon FROM u),
r AS (SELECT doc_id, canon,
             ROW_NUMBER() OVER (PARTITION BY canon ORDER BY doc_id) AS rn
      FROM c)
SELECT doc_id, canon AS canonical_url FROM r WHERE rn = 1
""".strip()


_DOMAIN_CAP = 30


def _domain_cap_url_expr(dialect: str) -> str:
    """Deterministic 7-host URL fixture over documents — identical text on
    both engines (the _messy_url_expr pattern); doc_id % 7 spreads ~536
    docs per host at sf0.01, far above the cap, so the cap does real
    work on every host."""
    num = "cast(doc_id % 7 as {})".format(
        "string" if dialect == "spark" else "varchar"
    )
    return f"concat('https://site', {num}, '.example.com/', source, '/p', cast(doc_id as {'string' if dialect == 'spark' else 'varchar'}))"


def _domain_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-balance sampling (operators/urls.domain_cap_sample): keep at
    most CAP docs per registrable host, md5-deterministic pick, ONE
    WindowGroupLimit shuffle — the C4-style guard against any one site
    dominating the corpus. The oracle replicates host extraction + the
    md5 window order natively on DuckDB."""
    from pangeo_forge_recipes_spark.operators.urls import domain_cap_sample

    _register(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", F.expr(_domain_cap_url_expr("spark")).alias("url")
    )
    kept = domain_cap_sample(docs, cap=_DOMAIN_CAP, col="url", id_col="doc_id")
    return kept.select("doc_id", "url")


def _domain_cap_oracle() -> str:
    return f"""
WITH u AS (SELECT doc_id, {_domain_cap_url_expr("duckdb")} AS url FROM documents),
r AS (SELECT doc_id, url,
             ROW_NUMBER() OVER (
                 PARTITION BY 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM u)
SELECT doc_id, url FROM r WHERE rn <= {_DOMAIN_CAP}
""".strip()


def _resize_images_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (operators/multimodal.resize_images): genuine PNG
    decode (inflate + unfilter) then the batched numpy gather/lerp to an
    8x4 grid, both methods. The 16x8 source pixel i is the closed form
    (doc_id*31 + i*7) % 256 (the multimodal_features fixture); 2:1
    down-scale puts every bilinear sample weight at exactly 1/4 (pixel
    centers land mid-2x2-block) and every nearest gather at (2r+1,2c+1),
    so round(px*1020) is an exact integer both engines recompute —
    bilinear: the 2x2 block sum; nearest: 4x the gathered byte."""
    from pangeo_forge_recipes_spark.operators.multimodal import (
        attach_png_media,
        resize_images,
    )

    _register(spark, sf_dir)
    media = attach_png_media(spark.table("documents"), width=16, height=8)
    # r12 (guide §1.2): both interpolation methods come out of ONE
    # encode+decode pass (resize_images methods=...) — the former
    # per-method union re-ran the whole PNG encode + inflate + unfilter
    # chain per branch for a cheap gather/lerp tail. Same rows, same
    # schema, same values.
    rs = resize_images(
        media, out_w=8, out_h=4, methods=("bilinear", "nearest")
    )
    return rs.select(
        "method",
        "doc_id",
        "width",
        "height",
        F.aggregate(
            F.transform(
                "pixels",
                lambda x, j: F.round(x.cast("double") * 1020, 0)
                * (F.lit(1) + j % 11),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        .cast("long")
        .alias("px_checksum"),
    )


def _resize_images_oracle() -> str:
    # source pixel byte at (row rr, col cc) of the 16x8 fixture image
    px = "((doc_id*31 + (({rr})*16 + ({cc}))*7) % 256)"
    bilinear = (
        "list_sum(list_transform(range(0, 32), j -> (1 + j % 11) * ("
        + " + ".join(
            px.format(rr=f"(j // 8)*2 + {dr}", cc=f"(j % 8)*2 + {dc}")
            for dr in (0, 1)
            for dc in (0, 1)
        )
        + ")))"
    )
    nearest = (
        "list_sum(list_transform(range(0, 32), j -> (1 + j % 11) * 4 * "
        + px.format(rr="(j // 8)*2 + 1", cc="(j % 8)*2 + 1")
        + "))"
    )
    return f"""
SELECT m.method, doc_id, CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
       CAST(CASE WHEN m.method = 'bilinear' THEN {bilinear}
                 ELSE {nearest} END AS BIGINT) AS px_checksum
FROM documents CROSS JOIN (VALUES ('bilinear'), ('nearest')) m(method)
""".strip()


def _zarr_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Zarr DataSource V2 relation (SURVEY §7.2-M6,
    sources/zarr_source.py): spark.read.format("zarr") over a store whose
    values follow a closed form, with dim-coordinate predicates pushed
    down to chunk-grain partition pruning. Pruning is load-bearing and
    asserted IN-QUERY: the 4x2 chunk grid must plan exactly 3 surviving
    slabs for (time >= 112, x < 60) — pruned chunks are never opened.
    The oracle recomputes the surviving rows from the closed form."""
    from pangeo_forge_recipes_spark.aggregation import dataset_to_schema
    from pangeo_forge_recipes_spark.dsio import schema_to_zarr
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable
    from pangeo_forge_recipes_spark.sources import register_zarr_source
    from pangeo_forge_recipes_spark.zarrio import open_group

    tmp = tempfile.mkdtemp(prefix="pfrs_entry_zsrc_")
    nt, nx = 16, 12
    t = np.arange(nt)
    x = np.arange(nx)
    ds = NDDataset(
        {
            "val": Variable(
                ("time", "x"),
                ((t[:, None] * 31 + x[None, :] * 7) % 101).astype("float64"),
            )
        },
        {
            "time": Variable(("time",), (100 + 2 * t).astype("int64")),
            "x": Variable(("x",), (10 * x).astype("int64")),
        },
        {},
        {"time": nt, "x": nx},
    )
    path = os.path.join(tmp, "s.zarr")
    store = schema_to_zarr(
        dataset_to_schema(ds), path, target_chunks={"time": 4, "x": 6}
    )
    g = open_group(store)
    for name, var in {**ds.coords, **ds.data_vars}.items():
        g[name][tuple(slice(0, s) for s in var.data.shape)] = var.data
    register_zarr_source(spark)
    df = (
        spark.read.format("zarr")
        .load(path)
        .filter((F.col("time") >= 112) & (F.col("x") < 60))
    )
    # chunk-grain pruning observed at runtime: time slabs [0:4),[4:8)
    # hold coords 100-106 / 108-114 (partial survivor), x slab [6:12)
    # holds 60-110 — 8 slabs plan down to 3 tasks
    n_parts = (
        df.withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )
    assert n_parts == 3, f"expected 3 surviving chunk slabs, got {n_parts}"
    return df.select("time", "x", "val")


_ZARR_SOURCE_ORACLE = """
SELECT 100 + 2*t AS time, 10*x AS x,
       CAST((t*31 + x*7) % 101 AS DOUBLE) AS val
FROM range(0, 16) r1(t) CROSS JOIN range(0, 12) r2(x)
WHERE 100 + 2*t >= 112 AND 10*x < 60
""".strip()


_ETYPE_CASE = (
    "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 "
    "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 "
    "ELSE 5 END"
)
# day boundary between the fresh write and the appended slab; every sf
# has events on both sides and the same etype set in both ranges
# (verified 0.001/0.01/0.1)
_ZW_SPLIT_DAY = 20


def _zarr_writer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tabular→tensor bridge (sources/zarr_writer.dataframe_to_zarr):
    aggregate REAL events into a (day × event-type) grid, write it as a
    Zarr v3 store in one chunk-grain shuffle (fill_value=0 for absent
    cells), then read the store back through the zarr DataSource
    relation. The oracle computes the same dense grid straight from the
    parquet — the store write+read must be an exact identity on top of
    the shared aggregation."""
    from pangeo_forge_recipes_spark.sources import (
        dataframe_to_zarr,
        register_zarr_source,
    )

    _register(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="pfrs_entry_zw_")
    agg_sql = f"""
        SELECT CAST(datediff(CAST(ts AS DATE), DATE'2024-01-01') AS BIGINT) AS day,
               CAST({_ETYPE_CASE} AS BIGINT) AS etype,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(round(sum(value), 4) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
        """
    grid = spark.sql(agg_sql)
    # two writes: days < {split} first (sparse rows — absent cells take
    # the store's fill_value), then the remaining days APPENDED along
    # the day axis (r8: grades dataframe_to_zarr(append_dim=...), the
    # incremental-refresh path). The append slab densifies over the
    # STORED etype axis so its non-append axis matches exactly; its day
    # axis stays sparse-present (whatever days actually have events).
    split = _ZW_SPLIT_DAY
    first = grid.where(F.col("day") < split)
    slab = spark.sql(
        f"""
        WITH agg AS ({agg_sql}),
        days AS (SELECT DISTINCT day FROM agg WHERE day >= {split}),
        etypes AS (SELECT DISTINCT etype FROM agg)
        SELECT d.day, e.etype,
               CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
               CAST(COALESCE(a.total_value, 0) AS DOUBLE) AS total_value
        FROM days d CROSS JOIN etypes e
        LEFT JOIN agg a ON a.day = d.day AND a.etype = e.etype
        """
    )
    path = dataframe_to_zarr(
        first,
        tmp,
        "events_grid.zarr",
        dims=["day", "etype"],
        target_chunks={"day": 8, "etype": 3},
        fill_value=0,
    )
    dataframe_to_zarr(
        slab,
        tmp,
        "events_grid.zarr",
        dims=["day", "etype"],
        append_dim="day",
    )
    register_zarr_source(spark)
    return (
        spark.read.format("zarr")
        .load(path)
        .select("day", "etype", "n_events", "total_value")
    )


_ZARR_WRITER_ORACLE = f"""
WITH agg AS (
  SELECT CAST(datediff('day', DATE'2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
         CAST({_ETYPE_CASE} AS BIGINT) AS etype,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(round(sum(value), 4) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT day FROM agg),
   etypes AS (SELECT DISTINCT etype FROM agg)
SELECT d.day, e.etype,
       COALESCE(a.n_events, 0) AS n_events,
       COALESCE(a.total_value, 0.0) AS total_value
FROM days d CROSS JOIN etypes e
LEFT JOIN agg a ON a.day = d.day AND a.etype = e.etype
""".strip()


# pinned PQ codebook fixture: trained once with pq_train(m=8, nbits=4) on
# the sf0.01 embeddings corpus (deterministic md5 sample, farthest-point
# init, fixed iterations), rounded to 6 decimals and embedded as a
# constant so the query is sf-independent and BOTH engines quantize with
# the same tensor — the same pinning pattern as the BPE merge fixture
_PQ_K = 3
_PQ_CODEBOOKS = [[[0.04309, 0.075986, 0.02288, 0.139787, 0.07087, -0.03871, 0.001957, -0.093104], [-0.081568, -0.119998, 0.036767, -0.048956, 0.035551, 0.128642, -0.06316, 0.116767], [0.116772, 0.018359, -0.010428, -0.099027, -0.142931, -0.088135, -0.009717, 0.08504], [-0.111138, -0.016621, -0.05079, -0.003703, -0.139237, -0.079475, -0.080764, -0.020952], [0.099634, -0.135298, -0.045095, -0.005251, -0.011664, 0.068558, -0.041823, -0.123985], [-0.184513, 0.017663, -0.01791, -0.000333, 0.078101, 0.092125, 0.141006, -0.010095], [0.064051, -0.104133, 0.02898, 0.117747, 0.055261, -0.00832, -0.158507, 0.076374], [0.018045, 0.113764, -0.177231, -0.032647, 0.002206, 0.057233, -0.018243, 0.12967], [-0.032371, -0.015162, 0.011063, 0.028298, 0.047398, -0.202435, 0.105437, 0.126742], [-0.059057, -0.012699, 0.0117, 0.1863, -0.117626, 0.044835, 0.054939, 0.056545], [0.190882, -0.002649, 0.015146, -0.031965, 0.069568, 0.033823, 0.012181, 0.140649], [-0.057816, 0.094038, 0.006907, 0.059497, 0.065533, 0.111649, -0.202715, -0.066341], [-0.054262, -0.078086, -0.122073, -0.110734, 0.142207, 0.070531, 0.066159, -0.099648], [0.015693, -0.00013, 0.110455, -0.062284, -0.042112, -0.063276, 0.091976, -0.08039], [0.00086, 0.137744, 0.069871, -0.075291, -0.093292, 0.141445, 0.000754, -0.036113], [-0.020845, -0.016, 0.066965, -0.08545, 0.141367, -0.097384, -0.10737, 0.024402]], [[-0.124351, -0.085724, 0.050194, 0.097733, 0.040407, 0.099461, 0.031425, 0.033278], [0.110536, -0.026989, -0.05723, 0.010883, 0.064158, -0.125376, 0.139335, 0.004815], [0.136494, 0.014579, -0.028348, 0.001764, -0.177362, -0.056798, 0.008018, -0.049183], [0.015306, -0.073331, 0.184701, -0.069564, 0.054258, -0.07826, -0.006205, 0.11072], [0.040844, -0.143298, -0.068412, -0.034887, 0.037426, 0.203634, -0.009586, 0.015159], [-0.005661, -0.00277, 0.009506, -0.200868, -0.093317, 0.082365, -0.034325, 0.088556], [-0.107162, 0.027234, 0.029412, -0.005505, -0.095987, -0.011932, -0.158948, -0.110646], [0.009929, -0.001835, 0.059093, 0.193467, -0.074164, -0.011586, -0.151203, 0.062576], [0.111688, 0.11412, -0.008426, 0.107966, 0.003367, 0.127828, 0.125371, 0.103086], [0.067729, 0.087479, 0.039212, -0.108078, 0.139874, 0.061223, -0.052967, -0.031462], [-0.005371, -0.05525, -0.082162, -0.005339, 0.029961, -0.034684, -0.091292, 0.182698], [-0.089534, 0.157719, -0.083378, 0.221048, 0.056136, -0.106574, -0.013856, -0.020129], [-0.085331, 0.145472, -0.025445, -0.06335, 0.077196, -0.101261, 0.048807, -0.024699], [-0.034363, -0.126435, 0.036666, -0.04758, -0.057789, -0.069246, 0.022796, -0.149615], [-0.043369, -0.007936, -0.183997, 0.115988, 0.011917, 0.056874, 0.061538, -0.019686], [-0.010441, 0.152557, 0.130953, 0.023669, -0.07768, 0.063298, 0.060778, -0.072959]], [[-0.067065, 0.041504, -0.105055, 0.017967, -0.072832, -0.032716, -0.116648, -0.064133], [-0.06305, -0.051512, 0.187524, 0.018478, -0.003642, 0.144084, -0.003691, 0.006179], [0.137897, -0.060232, -0.021218, -0.051552, -0.122461, -0.088933, -0.020247, 0.050758], [0.010387, 0.157602, 0.007172, -0.071385, -0.017288, -0.10901, 0.143751, -0.084879], [-0.10535, -0.047926, -0.027238, 0.077101, -0.016225, -0.023684, 0.119159, 0.137818], [0.114761, -0.027575, 0.116249, 0.110341, 0.053187, -0.017539, -0.103239, 0.017909], [0.122982, -0.021706, -0.013242, -0.074547, -0.072843, 0.063831, 0.005489, -0.153784], [-0.113932, 0.192102, 0.139822, -0.118439, -0.155748, -0.056003, -0.051857, -0.122175], [-0.051746, 0.008709, 0.040874, -0.105273, 0.139979, 0.02189, 0.128817, -0.232471], [0.062139, 0.116555, 0.004043, -0.104883, 0.137653, 0.013383, -0.015446, 0.01507], [0.03767, 0.074249, 0.062062, -0.090586, -0.155154, 0.125478, 0.055118, 0.147046], [0.019128, -0.052785, -0.112985, 0.111774, 0.031085, -0.051255, 0.08239, -0.096206], [-0.066885, -0.034821, 0.113833, -0.002866, -0.01227, -0.155682, -0.043088, 0.051028], [-0.107728, -0.196762, -0.072418, -0.038863, 0.033471, 0.008704, -0.084048, 0.003499], [-0.070145, 0.134139, 0.010841, 0.095628, -0.00645, 0.075536, 0.030934, -0.040369], [0.071772, -0.038745, -0.116662, 0.030748, 0.065451, 0.108757, 0.004168, 0.146538]], [[0.106138, 0.078095, -0.034466, 0.010813, 0.057461, 0.12636, -0.093183, 0.008154], [0.044742, -0.137635, 0.087374, -0.035993, 0.023206, -0.252532, -0.020813, -0.035052], [-0.092619, 0.020406, 0.022796, 0.063582, -0.184246, 0.003192, 0.124529, -0.059115], [0.031003, -0.102328, -0.070821, -0.070451, -0.087142, -0.003327, 0.027948, 0.089553], [-0.063061, -0.040948, -0.030697, 0.085826, 0.092079, -0.094067, -0.112212, -0.078831], [0.052034, 0.201307, 0.097485, -0.047728, 0.003991, -0.128689, 0.028872, -0.02345], [0.011133, -0.130294, 0.070362, 0.054343, 0.09055, -0.006119, 0.110637, 0.017332], [0.005676, 0.037125, -0.023954, 0.033824, -0.156724, -0.036853, -0.154173, -0.020254], [-0.080374, 0.003938, 0.182852, -0.025706, 0.013324, 0.149314, -0.027288, -0.067504], [0.106907, 0.136569, -0.035791, -0.002557, 0.009749, -0.021396, 0.029344, 0.195654], [-0.080374, 0.121454, -0.128819, 0.029877, 0.005379, -0.152909, 0.087852, -0.110364], [0.128092, 0.078863, -0.015794, 0.001079, -0.018653, 0.070846, 0.14297, -0.084645], [-0.094726, -0.017083, -0.051316, -0.140766, 0.094203, 0.002179, 0.021267, -0.112861], [0.039905, -0.101054, -0.104232, 0.148538, -0.019092, 0.068368, 0.031611, -0.082534], [-0.167754, 0.029468, -0.115623, 0.053406, 0.045032, 0.063598, -0.079389, 0.121547], [0.005775, 0.061259, 0.161466, 0.025122, 0.005769, -0.045349, -0.031136, 0.15078]], [[0.055214, -0.131186, -0.103039, -0.055191, -0.028759, -0.040149, 0.025639, -0.014938], [-0.003136, 0.010746, 0.052837, 0.066706, -0.20459, -0.139105, 0.104547, 0.0905], [-0.087864, 0.049451, -0.02738, -0.016962, 0.040539, -0.106694, -0.11584, -0.106779], [0.053933, 0.185424, -0.006986, -0.062983, -0.042053, 0.058131, 0.14769, 0.05084], [0.006256, -0.021309, 0.070176, 0.14768, 0.01801, -0.039086, -0.171147, -0.013436], [0.002145, -0.073083, 0.035979, -0.190877, 0.009268, -0.134633, -0.039899, 0.055581], [-0.136663, 0.005517, -0.030135, -0.081535, -0.095486, 0.107253, -0.066987, -0.071547], [-0.078265, 0.063162, -0.063741, 0.013198, -0.090213, 0.046874, -0.063277, 0.146012], [-0.011349, -0.046548, -0.008408, 0.077982, 0.207731, 0.035813, 0.065438, -0.06987], [-0.184619, -0.072488, 0.081095, 0.0189, 0.055081, 0.034118, 0.040604, 0.029038], [0.064675, -0.083748, 0.007549, 0.044775, 0.014798, 0.095571, 0.005307, 0.169964], [0.018575, 0.056312, 0.00356, -0.008925, -0.101905, -0.06866, -0.007177, -0.212237], [0.0307, 0.008577, -0.117301, 0.195111, 0.010809, -0.043805, 0.077624, -0.00951], [0.155228, 0.142979, 0.014172, -0.00242, 0.073956, -0.099167, -0.0751, -0.015427], [0.131712, -0.008382, 0.033274, -0.062245, 0.01883, 0.175899, -0.021145, -0.02526], [0.03371, -0.005454, 0.186978, 0.053467, -0.040091, 0.010132, 0.09182, -0.084729]], [[0.122656, -0.120946, -0.041414, -0.023418, -0.134751, 0.039163, -0.057886, 0.057583], [-0.072875, 0.131977, 0.064233, 0.023265, 0.156481, -0.060389, 0.136463, 0.052777], [0.061332, 0.116219, -0.055683, -0.090585, 0.012497, -0.128837, -0.024102, -0.089689], [-0.050585, 0.176805, -0.117345, -0.062747, -0.042923, 0.0094, 0.062226, 0.075603], [-0.017327, 0.006085, 0.088638, -0.043719, -0.011054, -0.11419, -0.18147, 0.016985], [-0.083909, 0.021828, -0.040088, 0.020965, -0.111588, -0.1741, 0.009363, 0.034367], [-0.007452, -0.016474, 0.107844, 0.060668, -0.035989, 0.091626, -0.113037, -0.146887], [-0.054813, -0.047172, -0.123914, 0.085738, 0.138163, 0.029689, -0.0869, 0.094268], [0.068328, 0.041633, -0.015312, 0.154009, -0.162525, 0.088509, 0.082992, -0.059092], [0.079415, 0.030422, 0.221521, -0.027139, -0.013666, 0.011168, 0.074836, -0.052105], [-0.153025, -0.015432, -0.075047, -0.146692, -0.036856, 0.037095, -0.102698, 0.001911], [-0.126349, -0.088173, 0.07177, 0.069895, -0.067499, 0.034315, 0.025784, 0.088278], [0.075613, -0.128035, 0.030028, -0.121615, 0.081334, -0.032737, 0.020803, 0.034322], [0.059781, -0.029403, -0.079258, 0.013906, 0.045739, 0.175683, 0.074933, 0.011988], [-0.030612, -0.107821, -0.09317, 0.071977, 0.020451, -0.055398, 0.086383, -0.112267], [0.051908, 0.104428, 0.015667, 0.025395, 0.008259, 0.036612, -0.082399, 0.169188]], [[-0.030303, -0.108012, -0.073947, -0.059952, -0.026543, 0.114012, -0.050741, -0.119528], [0.081852, 0.086739, 0.105441, -0.061284, 0.011601, -0.039919, -0.133562, -0.029615], [0.018251, -0.103482, 0.195818, 0.063631, -0.004467, 0.051064, 0.08216, 0.009106], [0.061635, 0.040336, -0.166746, 0.028024, 0.042248, -0.029386, 0.001359, 0.060026], [-0.025556, -0.127434, 0.023643, -0.080054, 0.166245, -0.00479, -0.091087, 0.05605], [-0.136552, 0.040047, 0.061236, 0.035626, 0.055237, 0.131466, -0.078143, 0.056285], [-0.092724, -0.043915, -0.049074, -0.074942, -0.16519, -0.092974, -0.049995, 0.053247], [0.10355, 0.093342, 0.072738, -0.036206, 0.103864, -0.031543, 0.116451, 0.034893], [-0.066209, 0.036631, -0.02756, 0.141938, -0.160897, 0.104092, 0.069223, -0.039732], [-0.122985, 0.00562, -0.028746, -0.074713, 0.121471, -0.046852, 0.081794, -0.091877], [-0.013934, 0.06937, 0.064054, 0.013445, -0.095272, -0.015171, -0.078658, -0.226414], [-0.018214, -0.163839, 0.021913, 0.002239, -0.006504, -0.169624, -0.032528, -0.080847], [-0.045181, 0.018637, 0.025269, 0.16284, 0.073726, -0.099998, 0.025203, 0.035266], [0.155092, -0.140646, 0.019727, 0.018813, -0.030486, 0.05048, -0.034005, 0.091326], [0.1013, 0.032972, -0.056822, -0.185793, -0.051796, 0.042949, 0.114652, -0.038216], [-0.096329, -0.044773, -0.029297, 0.020073, -0.068452, 0.068079, 0.109374, 0.09668]], [[0.114848, 0.116859, 0.100221, -0.036653, 0.054846, 0.101447, -0.083574, -0.057163], [-0.075491, -0.040822, 0.097873, 0.021483, -0.06619, -0.096209, 0.142151, -0.065565], [-0.084407, 0.173525, -0.01468, -0.015936, -0.094242, 0.002147, -0.081894, 0.087696], [0.03846, -0.197982, -0.026047, -0.123123, 0.048246, 0.005211, -0.014385, 0.06805], [0.057655, 0.014953, 0.066524, 0.054217, -0.098196, -0.135494, -0.066355, 0.054729], [-0.135757, -0.028206, 0.026931, -0.113569, 0.072977, 0.075058, 0.054576, 0.029823], [-0.039511, 0.016005, -0.131625, 0.142836, -0.002086, 0.001944, 0.086442, -0.032048], [-0.004338, -0.044086, -0.050678, -0.025868, -0.143986, 0.097966, -0.057924, -0.054033], [0.063633, 0.065904, -0.010566, -0.208741, -0.052486, -0.031751, 0.072385, -0.083159], [-0.095543, -0.023823, -0.005332, -0.059184, 0.068241, -0.006101, -0.066279, -0.179936], [0.060487, 0.033167, -0.084522, 0.054111, 0.135075, -0.015654, -0.049617, 0.132981], [-0.061375, -0.037395, 0.139097, 0.105088, 0.054836, 0.031987, -0.114741, -0.068841], [0.151337, -0.06352, -0.050145, 0.05099, 0.047891, -0.157592, 0.008786, -0.16762], [0.079851, -0.120099, -0.001222, 0.104506, -0.007334, 0.140791, 0.048432, -0.030945], [0.071995, 0.008525, 0.066325, -0.016879, -0.010612, 0.060833, 0.141592, 0.144954], [0.029258, 0.038994, -0.196181, -0.096418, 0.052886, -0.133473, 0.000684, 0.002609]]]


def _ann_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN self-search (operators/similarity
    pq_topk): the corpus encodes to m=8 4-bit codes against the pinned
    codebooks (map-only, broadcast model), then asymmetric-distance
    search scores every query against the byte codes via one
    (m, 16) lookup table per query batch — the 16-32x-compressed tier
    of the ANN family. The oracle re-derives codes, LUTs and rankings
    from the same pinned tensor with DuckDB list functions."""
    import numpy as np

    from pangeo_forge_recipes_spark.operators.similarity import pq_topk

    _register(spark, sf_dir)
    emb = spark.table("embeddings")
    books = np.array(_PQ_CODEBOOKS, dtype=np.float64)
    return pq_topk(emb, k=_PQ_K, codebooks=books)


def _pq_oracle_sql() -> str:
    rows = ",\n    ".join(
        f"({j}, {c}, {list(cent)})"
        for j, book in enumerate(_PQ_CODEBOOKS)
        for c, cent in enumerate(book)
    )
    return f"""
WITH ve AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
vecs AS (
  SELECT vec_id,
         list_transform(e, x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)) AS vn
  FROM ve),
books(j, c, cent) AS (VALUES
    {rows}),
dists AS (
  SELECT v.vec_id, b.j, b.c,
         list_sum(list_transform(range(1, 9),
             i -> (vn[b.j*8 + i] - b.cent[i]) * (vn[b.j*8 + i] - b.cent[i]))) AS d2
  FROM vecs v CROSS JOIN books b),
codes AS (
  SELECT vec_id, j, c FROM (
    SELECT vec_id, j, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
    FROM dists) WHERE rn = 1),
luts AS (
  SELECT v.vec_id AS qid, b.j, b.c,
         list_sum(list_transform(range(1, 9), i -> vn[b.j*8 + i] * b.cent[i])) AS lv
  FROM vecs v CROSS JOIN books b),
scores AS (
  SELECT l.qid AS vec_id, x.vec_id AS neighbor_id, SUM(l.lv) AS score
  FROM codes x JOIN luts l ON l.j = x.j AND l.c = x.c AND l.qid <> x.vec_id
  GROUP BY 1, 2),
ranked AS (
  SELECT vec_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scores)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, ROUND(score, 4) AS score
FROM ranked WHERE rank <= {_PQ_K}
""".strip()


def _ivf_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×PQ composition (operators/similarity ivf_pq_topk) — the
    billion-vector tier: inverted lists bound each query's candidate set
    (md5-sampled centroids, nprobe lists per query) AND the corpus side
    of THE shuffle carries m-byte PQ codes instead of float vectors, so
    exchange volume shrinks 16-32×. Scoring within a list is the
    asymmetric-distance LUT of pq_topk. The oracle composes the two
    already-pinned replications: the IVF centroid/assignment CTEs with
    the PQ code/LUT scoring over the pinned codebook tensor."""
    import numpy as np

    from pangeo_forge_recipes_spark.operators.similarity import ivf_pq_topk

    _register(spark, sf_dir)
    emb = spark.table("embeddings")
    books = np.array(_PQ_CODEBOOKS, dtype=np.float64)
    return ivf_pq_topk(
        emb,
        k=_PQ_K,
        nprobe=_IVF_NPROBE,
        n_centroids=_IVF_NCENTROIDS,
        codebooks=books,
    )


def _ivf_pq_oracle_sql() -> str:
    rows = ",\n    ".join(
        f"({j}, {c}, {list(cent)})"
        for j, book in enumerate(_PQ_CODEBOOKS)
        for c, cent in enumerate(book)
    )
    return f"""
WITH cent AS (
  SELECT vec_id AS cord, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_IVF_NCENTROIDS}
), cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY cord) - 1 AS cidx,
         list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cn
  FROM cent
), ve AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
vecs AS (
  SELECT vec_id,
         list_transform(e, x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)) AS vn
  FROM ve
), assign AS (
  SELECT v.vec_id, v.vn, c.cidx,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY list_dot_product(v.vn, c.cn) DESC, c.cidx) AS rn
  FROM vecs v CROSS JOIN cents c
), corpus AS (
  SELECT vec_id AS neighbor_id, vn AS bn, cidx FROM assign WHERE rn = 1
), probes AS (
  SELECT vec_id, cidx FROM assign WHERE rn <= {_IVF_NPROBE}
), books(j, c, bcent) AS (VALUES
    {rows}),
dists AS (
  SELECT x.neighbor_id, b.j, b.c,
         list_sum(list_transform(range(1, 9),
             i -> (bn[b.j*8 + i] - b.bcent[i]) * (bn[b.j*8 + i] - b.bcent[i]))) AS d2
  FROM corpus x CROSS JOIN books b),
codes AS (
  SELECT neighbor_id, j, c FROM (
    SELECT neighbor_id, j, c,
           ROW_NUMBER() OVER (PARTITION BY neighbor_id, j ORDER BY d2, c) AS rn
    FROM dists) WHERE rn = 1),
luts AS (
  SELECT v.vec_id AS qid, b.j, b.c,
         list_sum(list_transform(range(1, 9), i -> vn[b.j*8 + i] * b.bcent[i])) AS lv
  FROM vecs v CROSS JOIN books b),
cand AS (
  SELECT p.vec_id, x.neighbor_id
  FROM probes p JOIN corpus x ON p.cidx = x.cidx AND p.vec_id <> x.neighbor_id),
scores AS (
  SELECT n.vec_id, n.neighbor_id, SUM(l.lv) AS score
  FROM cand n
  JOIN codes x ON x.neighbor_id = n.neighbor_id
  JOIN luts l ON l.qid = n.vec_id AND l.j = x.j AND l.c = x.c
  GROUP BY 1, 2),
ranked AS (
  SELECT vec_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scores)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, ROUND(score, 4) AS score
FROM ranked WHERE rank <= {_PQ_K}
""".strip()


# pinned BPE merge fixture: trained once with train_bpe(num_merges=12) on
# the sf0.01 documents corpus (deterministic — count desc, pair lexicographic
# tie-break), embedded as a constant so the query is sf-independent, same
# precedent as the LSH hyperplane literals in _lsh_oracle_sql()
_BPE_MERGES = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
]


def _bpe_tokenize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization (operators/bpe) with the pinned merge table:
    map-only — broadcast ranks, Arrow-batched greedy segmentation. The
    oracle replays the same merges in rank order with a replace() chain
    (sequential merge replay ≡ greedy lowest-rank-leftmost application,
    the standard BPE equivalence)."""
    from pangeo_forge_recipes_spark.operators.bpe import tokenize_bpe

    _register(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    out = tokenize_bpe(docs, _BPE_MERGES)
    return out.select(
        "doc_id",
        F.array_join("tokens", " ").alias("tokens_joined"),
        "n_tokens",
    )


def _bpe_oracle() -> str:
    # per word: ' c h a r s </w> ' sentinel-spaced symbols, then replace()
    # per merge in rank order. Each merge is applied TWICE: a single
    # left-to-right non-overlapping pass consumes the shared delimiter
    # space between back-to-back occurrences (word 'dining', merge
    # (i, n): ' d i n i n g ' matches only the first ' i n '), so pass
    # one merges the alternating occurrences and pass two the skipped
    # ones — after which greedy-by-rank and the chain agree exactly
    # (merging never creates a new site for the SAME pair: the merged
    # symbol differs from both halves).
    chain = (
        "concat(' ', array_to_string(list_transform("
        "range(1, length(w) + 1), i -> substr(w, i, 1)), ' '), ' </w> ')"
    )
    for a, b in _BPE_MERGES:
        for _ in range(2):
            chain = f"replace({chain}, ' {a} {b} ', ' {a}{b} ')"
    seg = f"string_split(trim({chain}), ' ')"
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), ' '),
                     x -> x != '') AS ws
  FROM documents),
seg AS (
  SELECT doc_id, flatten(list_transform(ws, w -> {seg})) AS toks FROM tok)
SELECT doc_id,
       array_to_string(toks, ' ') AS tokens_joined,
       len(toks) AS n_tokens
FROM seg
""".strip()


def _lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed LSH-ANN — oracle replicates the hyperplane bucketing from
    the same seeded planes embedded as SQL literals."""
    from pangeo_forge_recipes_spark.operators.similarity import lsh_ann_topk

    _register(spark, sf_dir)
    return lsh_ann_topk(spark.table("embeddings"), k=_ANN_K)


def _ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list ANN (covers centroid sampling + assignment +
    probe search) — oracle replicates the md5-sampled centroids and the
    full assign/probe/rank pipeline in SQL."""
    from pangeo_forge_recipes_spark.operators.similarity import ivf_topk

    _register(spark, sf_dir)
    return ivf_topk(
        spark.table("embeddings"),
        k=_ANN_K,
        nprobe=_IVF_NPROBE,
        n_centroids=_IVF_NCENTROIDS,
    )


def _semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SemDeDup pipeline (kmeans_fit farthest-point init + 5 Lloyd
    iterations + within-cluster exact pair search) — the designated
    100 TB dedup path past the broadcast bound. Oracle replicates the
    entire deterministic pipeline in SQL (_semdedup_oracle)."""
    from pangeo_forge_recipes_spark.operators.clustering import semantic_dedup

    _register(spark, sf_dir)
    return semantic_dedup(
        spark.table("embeddings"), k=_SEMDEDUP_K, threshold=_SEMDEDUP_T
    )


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the engine: media payloads are genuine
    zlib-compressed, per-row-filtered PNG bytes (pngio.py) whose pixel i
    is the closed form (doc_id*31 + i*7) % 256 — decode_image must
    actually inflate + unfilter to recover them. Position-weighted
    (order-sensitive) integer checksums; the oracle recomputes both from
    the formula. Feature blocks are 8 pixels so round(mean*2040) is the
    exact block byte sum."""
    from pangeo_forge_recipes_spark.operators.multimodal import (
        attach_png_media,
        decode_image,
        extract_features,
    )

    _register(spark, sf_dir)
    media = attach_png_media(spark.table("documents"), width=16, height=8)
    dec = decode_image(media)
    # keep_pixels=True: both representations come out of ONE
    # encode+decode pass — the former two-subtree px/ft self-join
    # re-ran the whole codec chain twice for a 5000-row equi-join
    both = extract_features(dec, keep_pixels=True)
    return both.select(
        "doc_id",
        F.size("pixels").alias("n_pixels"),
        F.aggregate(
            F.transform(
                "pixels",
                lambda x, i: F.round(x.cast("double") * 255, 0)
                * (F.lit(1) + i % 13),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        .cast("long")
        .alias("pixel_checksum"),
        F.size("features").alias("feat_dim"),
        F.aggregate(
            F.transform(
                "features",
                lambda x, j: F.round(x.cast("double") * 2040, 0)
                * (F.lit(1) + j % 7),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        .cast("long")
        .alias("feature_checksum"),
    )


def _zarr_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 core pipeline smoke: StoreToZarr on deterministic synthetic
    data, verified in-query with full element equality (assert_equal) and
    summarized with an order-sensitive position-weighted checksum the
    numpy oracle recomputes independently — a permuting/zeroing combine
    cannot pass."""
    from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
    from pangeo_forge_recipes_spark.dsio import write_npz
    from pangeo_forge_recipes_spark.ndset import assert_equal
    from tests.data_generation import make_ds

    tmp = tempfile.mkdtemp(prefix="pfrs_entry_")
    ds = make_ds(nt=6)
    paths = []
    for i in range(3):
        p = os.path.join(tmp, f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    pattern = pattern_from_file_sequence(paths, "time", nitems_per_file=2, file_type="npz")
    result = store_to_zarr(spark, pattern, tmp, "out.zarr", target_chunks={"time": 3})
    rt = result.open()
    assert_equal(rt, ds, check_attrs=False)
    rows = [
        (
            name,
            int(np.prod(var.data.shape)),
            float(np.round(np.asarray(var.data, dtype="float64").mean(), 6)),
            _pos_checksum(var),
        )
        for name, var in sorted(rt.variables.items())
        if var.data.dtype.kind in "if"
    ]
    return spark.createDataFrame(
        rows, "variable string, n_elements long, mean_value double, pos_checksum double"
    )


def _spill_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE shuffle's alternative execution path driver-graded end-to-end
    (r10 VERDICT ask #1): the zarr round-trip oracle re-run with
    ``rechunk_shuffle="spill"`` forced — decode once, spill raw pieces
    to target-adjacent scratch, metadata-only exchange, range-read on
    combine (transforms.open_split_spill_df / rechunk_spill_and_store).
    Chunks are deliberately MISALIGNED with the file grain (4 files x 2
    steps -> chunks of 5) so every target chunk combines fragments from
    multiple sources through the spill wire format. The query asserts
    full element equality against the generator AND that the scratch
    prefix was removed; the oracle recomputes the position-weighted
    checksums by pure numpy."""
    from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
    from pangeo_forge_recipes_spark.dsio import write_npz
    from pangeo_forge_recipes_spark.ndset import assert_equal
    from tests.data_generation import make_ds

    tmp = tempfile.mkdtemp(prefix="pfrs_entry_spill_")
    ds = make_ds(nt=8)
    paths = []
    for i in range(4):
        p = os.path.join(tmp, f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="npz"
    )
    result = store_to_zarr(
        spark,
        pattern,
        tmp,
        "out.zarr",
        target_chunks={"time": 5},
        rechunk_shuffle="spill",
    )
    rt = result.open()
    assert_equal(rt, ds, check_attrs=False)
    scratch_clean = int(not os.path.exists(str(result.path).rstrip("/") + ".spill"))
    rows = [
        (
            name,
            int(np.prod(var.data.shape)),
            float(np.round(np.asarray(var.data, dtype="float64").mean(), 6)),
            _pos_checksum(var),
            scratch_clean,
        )
        for name, var in sorted(rt.variables.items())
        if var.data.dtype.kind in "if"
    ]
    return spark.createDataFrame(
        rows,
        "variable string, n_elements long, mean_value double, "
        "pos_checksum double, scratch_clean int",
    )


def _kerchunk_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.7 kerchunk combine: full element equality asserted
    in-query plus order-sensitive per-variable checksums recomputed by
    the numpy oracle (round-2 ask: the count-only summary could not
    catch a scrambling combine)."""
    from pangeo_forge_recipes_spark import pattern_from_file_sequence, write_combined_reference
    from pangeo_forge_recipes_spark.dsio import write_npz
    from pangeo_forge_recipes_spark.kerchunkio import open_reference_dataset
    from pangeo_forge_recipes_spark.ndset import assert_equal
    from tests.data_generation import make_ds

    tmp = tempfile.mkdtemp(prefix="pfrs_entry_k_")
    ds = make_ds(nt=6)
    paths = []
    for i in range(3):
        p = os.path.join(tmp, f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    pattern = pattern_from_file_sequence(paths, "time", nitems_per_file=2, file_type="npz")
    ref = write_combined_reference(spark, pattern, tmp, "ref", max_refs_per_merge=2)
    rt = open_reference_dataset(ref)
    assert_equal(rt, ds, check_attrs=False)
    rows = [
        (name, int(np.prod(var.data.shape)), _pos_checksum(var))
        for name, var in sorted(rt.variables.items())
    ]
    return spark.createDataFrame(
        rows, "variable string, n_elements long, pos_checksum double"
    )


_PYR_NT, _PYR_NLAT, _PYR_NLON, _PYR_LEVELS = 4, 8, 12, 3


def _pyramid_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference injections' ``StoreToPyramid`` (``injections.py:10``,
    the carbonplan/ndpyramid multiscales convention): level 0 through
    the full store_to_zarr pipeline, further levels distributed
    block-mean coarsening (pyramid.py). Fixture field is the closed form
    foo[t,y,x] = 1000*t + 10*y + x, so every level-k element equals
    1000*t + 10*(s*y + (s-1)/2) + s*x + (s-1)/2 with s = 2**k — all
    multiples of 0.5, binary-exact in float64, and the DuckDB oracle
    recomputes the per-level sums and position-weighted checksums
    straight from range() cross joins (independent work, same closed
    form). Multiscales root metadata is asserted in-query."""
    from pangeo_forge_recipes_spark import pattern_from_file_sequence
    from pangeo_forge_recipes_spark.dsio import write_npz
    from pangeo_forge_recipes_spark.ndset import NDDataset, Variable
    from pangeo_forge_recipes_spark.pyramid import store_to_pyramid
    from pangeo_forge_recipes_spark.zarrio import ZARR_JSON, _store_for

    tmp = tempfile.mkdtemp(prefix="pfrs_entry_pyr_")
    nt, nlat, nlon = _PYR_NT, _PYR_NLAT, _PYR_NLON
    t = np.arange(nt, dtype="int64")
    foo = (
        1000 * t[:, None, None]
        + 10 * np.arange(nlat)[None, :, None]
        + np.arange(nlon)[None, None, :]
    ).astype("float64")
    ds = NDDataset(
        {"foo": Variable(("time", "lat", "lon"), foo)},
        {
            "time": Variable(("time",), t),
            "lat": Variable(("lat",), np.arange(nlat, dtype="float64")),
            "lon": Variable(("lon",), np.arange(nlon, dtype="float64")),
        },
    )
    paths = []
    for i in range(2):
        p = os.path.join(tmp, f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="npz"
    )
    result = store_to_pyramid(
        spark,
        pattern,
        tmp,
        "pyr.zarr",
        levels=_PYR_LEVELS,
        target_chunks={"time": 2, "lat": 4, "lon": 4},
    )
    meta = json.loads(_store_for(result.path).get(ZARR_JSON))
    ms = meta["attributes"]["multiscales"][0]
    assert [d["path"] for d in ms["datasets"]] == ["0", "1", "2"], ms
    rows = []
    for k in range(_PYR_LEVELS):
        lv = result.open(k)
        flat = np.asarray(lv["foo"].data, dtype="float64").ravel()
        w = (np.arange(flat.size) % 101 + 1).astype("float64")
        rows.append(
            (
                k,
                int(lv.sizes["lat"]),
                int(lv.sizes["lon"]),
                float(flat.sum()),
                float((flat * w).sum()),
                float(np.asarray(lv["lat"].data, dtype="float64").sum()),
            )
        )
    return spark.createDataFrame(
        rows,
        "level int, n_lat int, n_lon int, foo_sum double, "
        "foo_checksum double, lat_sum double",
    )


def _pyramid_oracle_sql() -> str:
    """Per-level closed-form recompute in PURE SQL: for level k the field
    is 1000*t + 10*(s*y + off) + (s*x + off) over the COARSE index grid
    (s = 2**k, off = (s-1)/2) — DuckDB rebuilds each level from range()
    cross joins and aggregates the same sums/checksums the Spark query
    reads back from the written zarr levels."""
    selects = []
    for k in range(_PYR_LEVELS):
        s = 2**k
        ny, nx = _PYR_NLAT // s, _PYR_NLON // s
        off = (s - 1) / 2.0
        val = (
            f"(1000.0*t.range + 10.0*({s}*y.range + {off}) "
            f"+ ({s}*x.range + {off}))"
        )
        pos = f"((t.range*{ny} + y.range)*{nx} + x.range)"
        selects.append(
            f"SELECT CAST({k} AS INT) AS level, "
            f"CAST({ny} AS INT) AS n_lat, CAST({nx} AS INT) AS n_lon, "
            f"CAST(SUM({val}) AS DOUBLE) AS foo_sum, "
            f"CAST(SUM({val} * ({pos} % 101 + 1)) AS DOUBLE) AS foo_checksum, "
            f"(SELECT CAST(SUM({s}*r.range + {off}) AS DOUBLE) "
            f"FROM range({ny}) r) AS lat_sum "
            f"FROM range({_PYR_NT}) t, range({ny}) y, range({nx}) x"
        )
    return "\nUNION ALL\n".join(selects)


def _append_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.8 incremental append: build from half the files, append
    the rest with append_dim offsets, verify against the full dataset
    (rows-only check; reference transforms.py:673-693)."""
    from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
    from pangeo_forge_recipes_spark.dsio import write_npz
    from pangeo_forge_recipes_spark.ndset import assert_equal
    from tests.data_generation import make_ds

    tmp = tempfile.mkdtemp(prefix="pfrs_entry_a_")
    ds = make_ds(nt=8)
    paths = []
    for i in range(4):
        p = os.path.join(tmp, f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    first = pattern_from_file_sequence(paths[:2], "time", nitems_per_file=2, file_type="npz")
    store_to_zarr(spark, first, tmp, "a.zarr", target_chunks={"time": 2},
                  consolidate_coords=False)
    rest = pattern_from_file_sequence(paths[2:], "time", nitems_per_file=2, file_type="npz")
    result = store_to_zarr(spark, rest, tmp, "a.zarr", target_chunks={"time": 2},
                           append_dim="time", consolidate_coords=False)
    rt = result.open()
    assert_equal(rt, ds, check_attrs=False)
    rows = sorted((d, int(s)) for d, s in rt.sizes.items())
    return spark.createDataFrame(rows, "dim string, size long")


def _rechunk_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.3 entry point C: re-store an existing Zarr store with new
    target chunks via a 1-element zarr pattern (rows-only check)."""
    from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
    from pangeo_forge_recipes_spark.dsio import write_npz
    from pangeo_forge_recipes_spark.ndset import assert_equal
    from pangeo_forge_recipes_spark.zarrio import open_group
    from tests.data_generation import make_ds

    tmp = tempfile.mkdtemp(prefix="pfrs_entry_r_")
    ds = make_ds(nt=6)
    paths = []
    for i in range(6):
        p = os.path.join(tmp, f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(i, i + 1)))
        paths.append(p)
    fine = store_to_zarr(
        spark,
        pattern_from_file_sequence(paths, "time", nitems_per_file=1, file_type="npz"),
        tmp, "fine.zarr", target_chunks={"time": 1},
    )
    coarse = store_to_zarr(
        spark,
        pattern_from_file_sequence([fine.path], "time", file_type="zarr"),
        tmp, "coarse.zarr", target_chunks={"time": 3},
    )
    assert_equal(coarse.open(), ds)
    arr = open_group(coarse.path)["foo"]
    rows = [("foo_chunk_time", int(arr.chunks[0])), ("time", int(arr.shape[0]))]
    return spark.createDataFrame(rows, "metric string, value long")


def _schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 DetermineSchema: distributed multi-dim schema reduction,
    summarized as (dim, size) rows (rows-only check)."""
    from pangeo_forge_recipes_spark import pattern_from_file_sequence
    from pangeo_forge_recipes_spark.dsio import write_npz
    from pangeo_forge_recipes_spark.transforms import (
        determine_schema,
        manifest_df,
        read_schemas_df,
    )
    from tests.data_generation import make_ds

    tmp = tempfile.mkdtemp(prefix="pfrs_entry_s_")
    ds = make_ds(nt=8)
    paths = []
    for i in range(4):
        p = os.path.join(tmp, f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    pattern = pattern_from_file_sequence(paths, "time", nitems_per_file=2, file_type="npz")
    schemas = read_schemas_df(manifest_df(spark, pattern), pattern.file_type)
    schema = determine_schema(schemas, pattern.combine_dim_keys)
    rows = sorted((d, int(s)) for d, s in schema["dims"].items())
    return spark.createDataFrame(rows, "dim string, size long")


def _stream_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.8 streaming ingest: two availableNow micro-batch runs over
    a growing manifest directory (bootstrap, then append along time via
    the shared streaming checkpoint), verified cell-for-cell against the
    batch fixture before summarizing."""
    from pangeo_forge_recipes_spark.ndset import assert_equal
    from pangeo_forge_recipes_spark.streaming.append import stream_append_to_zarr
    from pangeo_forge_recipes_spark.dsio import open_zarr_group, write_npz
    from tests.data_generation import make_ds

    tmp = tempfile.mkdtemp(prefix="pfrs_entry_sa_")
    manifest_dir = os.path.join(tmp, "manifest")
    os.makedirs(manifest_dir)
    ds = make_ds(nt=8)
    paths = []
    for i in range(4):
        p = os.path.join(tmp, f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)

    def run_batch(batch_idx: int, file_idx: list[int]) -> None:
        lines = "".join(f"{2 * i},{paths[i]}\n" for i in file_idx)
        with open(os.path.join(manifest_dir, f"batch_{batch_idx}.txt"), "w") as f:
            f.write(lines)
        q = stream_append_to_zarr(
            spark, manifest_dir, tmp, "s.zarr", "time", {"time": 2}
        )
        q.awaitTermination()

    run_batch(0, [0, 1])   # bootstrap store from the first half
    run_batch(1, [2, 3])   # restart stream; checkpoint appends the rest
    rt = open_zarr_group(os.path.join(tmp, "s.zarr"))
    assert_equal(rt, ds, check_attrs=False)
    rows = sorted((d, int(s)) for d, s in rt.sizes.items())
    return spark.createDataFrame(rows, "dim string, size long")


# ---------------------------------------------------------------------------
# round-9 rotation slots
# ---------------------------------------------------------------------------


def _grouped_png_media(docs: DataFrame) -> DataFrame:
    """Deterministic 32x32 noise PNGs where docs sharing ``doc_id // 3``
    share IDENTICAL pixels (splitmix-style uint64 scramble of the group
    seed — noise images keep distinct groups' pHashes ~32 bits apart,
    so the only pairs within the hamming threshold are the constructed
    ones; closed-form group structure is what the SQL oracle replays)."""
    import numpy as np
    import pandas as pd

    from pangeo_forge_recipes_spark.pngio import encode_png_batch

    W = H = 32

    def build(batches):
        idx = np.arange(W * H, dtype=np.uint64)
        k1 = np.uint64(0x9E3779B97F4A7C15)
        k2 = np.uint64(0xC2B2AE3D27D4EB4F)
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(np.int64)
            seeds = (ids - ids % 3).astype(np.uint64)
            # whole-batch pixel synthesis + whole-batch filter
            # prediction (encode_png_batch): per image only the deflate
            # + chunk assembly stay Python-side
            h = seeds[:, None] * k1 + idx[None, :] * k2
            h ^= h >> np.uint64(33)
            h *= k2
            h ^= h >> np.uint64(29)
            px = (h % np.uint64(256)).astype(np.uint8).reshape(-1, H, W)
            media = [bytearray(b) for b in encode_png_batch(px)]
            yield pd.DataFrame({"doc_id": ids, "media": media})

    return docs.select("doc_id").mapInPandas(build, "doc_id long, media binary")


def _grouped_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic 512-sample noise WAVs where docs sharing
    ``doc_id // 4`` carry IDENTICAL clips (same splitmix-style scramble
    as the PNG fixture, keyed by group): white-noise clips keep
    distinct groups' spectral rank hashes far apart (expected ~32/64
    bits; P[≤2] needs 7 of 8 segments to pick identical top-4 band
    subsets, ~1e-12/pair), so the only pairs within the threshold are
    the constructed ones — closed-form group structure the SQL oracle
    replays. The bytes on the wire are genuine 16-bit PCM RIFF/WAVE."""
    import numpy as np
    import pandas as pd

    from pangeo_forge_recipes_spark.audioio import encode_wav_batch

    N = 512

    def build(batches):
        idx = np.arange(N, dtype=np.uint64)
        k1 = np.uint64(0x9E3779B97F4A7C15)
        k2 = np.uint64(0xC2B2AE3D27D4EB4F)
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(np.int64)
            seeds = (ids - ids % 4).astype(np.uint64)
            h = seeds[:, None] * k1 + idx[None, :] * k2
            h ^= h >> np.uint64(33)
            h *= k2
            h ^= h >> np.uint64(29)
            x = (h % np.uint64(65536)).astype(np.float64) / 65536.0 - 0.5
            # one vectorized encode pass over the whole batch (r13,
            # guide §4.2) — per-row bytes identical to per-clip encode_wav
            media = [bytearray(b) for b in encode_wav_batch(x, 8000, bits=16)]
            yield pd.DataFrame({"doc_id": ids, "media": media})

    return docs.select("doc_id").mapInPandas(build, "doc_id long, media binary")


def _audio_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint near-dup e2e (operators/audiohash, r11 verdict
    ask #5 — the last pytest-only hash-family member): REAL WAV decode
    → spectral rank hash (Haitsma-Kalker band-energy family) → the
    shared banded-Hamming pair engine. Identical clips ride on docs
    sharing doc_id//4, so the expected pair set is pure id arithmetic
    the oracle replays; the numeric fingerprint itself is pinned
    against a straight-numpy recomputation in test_audiohash.py."""
    from pangeo_forge_recipes_spark.operators.audiohash import audio_near_dup

    _register(spark, sf_dir)
    clips = _grouped_wav_media(spark.table("documents"))
    pairs = audio_near_dup(clips, max_hamming=2)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


_AUDIO_NEAR_DUP_ORACLE = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
FROM documents a JOIN documents b
  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id
""".strip()


def _phash_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image perceptual-hash near-dup e2e (operators/imagehash): REAL
    PNG decode → DCT pHash → banded-Hamming pair engine. The fixture
    puts identical pixels on docs sharing doc_id//3, so the expected
    pair set is pure id arithmetic the oracle replays; the unrelated
    noise images sit ~32 bits apart (P[dist<=6] ~ 4e-10/pair), so the
    full-distance verification after banding admits exactly the
    constructed pairs."""
    from pangeo_forge_recipes_spark.operators.imagehash import phash_near_dup

    _register(spark, sf_dir)
    imgs = _grouped_png_media(spark.table("documents"))
    pairs = phash_near_dup(imgs)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


_PHASH_NEAR_DUP_ORACLE = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
FROM documents a JOIN documents b
  ON a.doc_id // 3 = b.doc_id // 3 AND a.doc_id < b.doc_id
""".strip()


#: pinned closed-form weights for the graded classifier-inference slot:
#: fixed, discriminative-ish, and embeddable as SQL literals (dim 256)
_QC_DIM = 256
_QC_W = [((i * 37) % 101 - 50) / 100.0 for i in range(_QC_DIM)]
_QC_B = -0.05


def _quality_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style classifier INFERENCE e2e (operators/classifier):
    hashed token+bigram featurization (md5 variant — DuckDB's
    md5_number_lower is bit-identical to the python digest slice, so
    the oracle replays the featurization exactly), broadcast-weights
    Arrow scoring, keep decision at a fixed threshold. Weights are the
    pinned closed-form table above (training itself is pinned by the
    pytest suite's single-partition numpy-equivalence tests — the
    BPE-fixture pattern)."""
    import numpy as np

    from pangeo_forge_recipes_spark.operators.classifier import score_quality

    _register(spark, sf_dir)
    model = {
        "w": np.array(_QC_W, dtype=np.float64),
        "b": _QC_B,
        "dim": _QC_DIM,
        "bigrams": True,
        "hash_fn": "md5",
    }
    scored = score_quality(
        spark.table("documents").select("doc_id", "text"), model
    )
    return scored.select(
        "doc_id",
        F.round("quality_prob", 4).alias("quality_prob"),
        (F.col("quality_prob") >= 0.5).alias("keep"),
    )


def _quality_classifier_oracle() -> str:
    w_lit = "[" + ", ".join(repr(w) for w in _QC_W) + "]"
    return f"""
WITH w AS (SELECT {w_lit}::DOUBLE[] AS wv),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(t || CASE WHEN len(t) >= 2
                          THEN list_transform(range(1, len(t)), i -> t[i] || chr(31) || t[i + 1])
                          ELSE CAST([] AS VARCHAR[]) END) AS g,
         (2 * len(t) - 1) AS n
  FROM toks WHERE len(t) > 0),
agg AS (
  SELECT doc_id, CAST(md5_number_lower(g) % {_QC_DIM} AS INT) AS ix, n,
         count(*) AS c
  FROM grams GROUP BY doc_id, ix, n),
z AS (
  SELECT agg.doc_id,
         sum(wv[ix + 1] * CAST(CAST(CAST(c AS DOUBLE) / n AS FLOAT) AS DOUBLE)) AS zz
  FROM agg, w GROUP BY agg.doc_id),
p AS (
  SELECT d.doc_id,
         1.0 / (1.0 + exp(-(coalesce(z.zz, 0.0) + {_QC_B}))) AS prob
  FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id)
SELECT doc_id, round(prob, 4) AS quality_prob, prob >= 0.5 AS keep FROM p
""".strip()


def _stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT deterministic stratified sampling (operators/text): the 9
    smallest md5(id) docs of every language stratum — repartition-
    invariant, and the oracle is the identical-work window SQL."""
    from pangeo_forge_recipes_spark.operators.text import stratified_sample

    _register(spark, sf_dir)
    out = stratified_sample(
        spark.table("documents"), "lang", n_per_stratum=9
    )
    return out.select("doc_id", "lang")


_STRATIFIED_SAMPLE_ORACLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, ROW_NUMBER() OVER (
    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
  ) AS rk FROM documents
) WHERE rk <= 9
""".strip()


#: synthetic 64-bit signature as PURE integer SQL — identical in Spark
#: and DuckDB, so the streaming dedup's bucket/first-seen semantics are
#: oracle-replayable exactly (docs sharing doc_id//3 share the sig)
_STREAM_SIG_X = "((doc_id - doc_id % 3) * 48271) % 2147483647"


def _stream_hamming_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 64-bit-signature near-dup flagging at ingest
    (streaming/stateful.streaming_hamming_dedup — the cross-modal
    engine behind pHash/SimHash/audio-fingerprint stream dedup; the
    image-decode composition is pinned in pytest). Signatures here are
    a closed-form integer scramble of doc_id//3 so the oracle can
    replay the EXACT operator semantics: per (band, 8-bit band value)
    bucket, the first-seen (min, ids sorted within the availableNow
    batch — the r9 chunk-boundary fix) id claims the bucket and every
    later arrival is flagged against it."""
    from pangeo_forge_recipes_spark.streaming.stateful import (
        streaming_hamming_dedup,
    )

    _register(spark, sf_dir)
    for q in spark.streams.active:
        if q.name == "_stream_hamming":
            q.stop()
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select("doc_id")
        .withColumn("__x", F.expr(_STREAM_SIG_X))
        .select("doc_id", F.expr("__x * 2654435761 + __x").alias("sig"))
    )
    query = (
        streaming_hamming_dedup(raw, "sig")
        .writeStream.format("memory")
        .queryName("_stream_hamming")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("_stream_hamming").select(
        "doc_id", "first_doc_id", "band"
    )


_STREAM_HAMMING_ORACLE = f"""
WITH sig AS (
  SELECT doc_id,
         ({_STREAM_SIG_X}) * 2654435761 + ({_STREAM_SIG_X}) AS sig
  FROM documents),
b AS (
  SELECT doc_id, CAST(r.band AS INT) AS band,
         (sig >> (8 * CAST(r.band AS INT))) & 255 AS band_val
  FROM sig CROSS JOIN range(8) r(band)),
mn AS (
  SELECT band, band_val, min(doc_id) AS first_doc_id
  FROM b GROUP BY band, band_val)
SELECT b.doc_id, mn.first_doc_id, b.band
FROM b JOIN mn USING (band, band_val)
WHERE b.doc_id <> mn.first_doc_id
""".strip()


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _sql_query(_shared_sql()["q1_pricing_summary"])(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 queries (the driver's grading cap), priority-ordered:
    the reference-parity pipeline queries and the hash-family extension
    operators first, the shared-SQL/tabular battery after. Every entry has
    an oracle_sql() twin — zero rows-only checks."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    shared = _shared_sql()
    # round-7 rotation: q1_pricing_summary (still the entry() flagship
    # and warm in the parity suite) yields its slot to zarr_source_scan —
    # the spark.read.format("zarr") DataSource relation with chunk-grain
    # predicate pruning asserted in-query, the last §2 surface with no
    # CORRECTNESS row
    out["zarr_source_scan"] = _zarr_source_scan
    # reference-parity core: the Zarr/kerchunk/append pipelines
    out["pipeline_zarr_roundtrip"] = _zarr_roundtrip
    out["pipeline_kerchunk_roundtrip"] = _kerchunk_roundtrip
    out["pipeline_append_roundtrip"] = _append_roundtrip
    out["pipeline_rechunk_existing"] = _rechunk_existing
    out["pipeline_schema_inference"] = _schema_inference
    out["pipeline_stream_append"] = _stream_append
    # round-11 rotation: dedup_exact (the plain md5 hash-groupBy — its
    # GROUP BY/dedup shape stays graded via dedup_lines, decontaminate
    # and mix_corpora's md5 draws; the dialect pair stays dual-engine
    # warm in test_shared_sql_parity.py AND timed in bench
    # extra_matched) yields its slot to pipeline_spill_roundtrip — the
    # spill execution path of THE shuffle was the last full alternative
    # implementation of the most correctness-critical operator with no
    # driver-graded CORRECTNESS slot (r10 VERDICT ask #1)
    out["pipeline_spill_roundtrip"] = _spill_roundtrip
    # round-10 rotation: text_doc_metrics (per-row text-metric exprs —
    # the shape stays graded via gopher_c4_filter / quality_filter /
    # c4_clean; its dialect-pair text stays dual-engine warm in
    # test_shared_sql_parity.py AND timed in bench extra_matched) yields
    # its slot to pyramid_roundtrip — the reference injections'
    # StoreToPyramid (injections.py:10), the one r9 feature without a
    # CORRECTNESS slot
    out["pyramid_roundtrip"] = _pyramid_roundtrip
    # multimodal + hash-family extension operators
    out["multimodal_features"] = _multimodal_features
    # round-6 rotation (second pass): ann_pq_topk — the compressed ANN
    # tier, last ungraded similarity operator — takes multimodal_stats'
    # slot (the sha-fake blob-plumbing aggregate; genuine decode paths
    # stay graded via multimodal_features + multimodal_audio)
    # round-9 rotation: ann_pq_topk (asymmetric-distance PQ) yields its
    # slot to quality_classifier_score — PQ codes/LUT scoring stays
    # graded through ivf_pq_topk (the IVFxPQ composite) and warm in
    # pytest; the classifier inference path (hashed featurization +
    # broadcast-weights scoring) was the last pytest-only text operator
    out["quality_classifier_score"] = _quality_classifier_q
    out["multimodal_audio"] = _multimodal_audio
    # round-8 rotation: dedup_minhash_pairs (its banded-LSH shape stays
    # graded via dedup_minhash_stream + dedup_clusters and warm in
    # pytest) yields its slot to remove_duplicate_spans — the span
    # REMOVAL transform ("Deduplicating Training Data" rewrite side),
    # previously pytest-only; ann_cosine_topk (the broadcast-exact tier
    # — stays the bench extra-matched query and warm in the parity
    # suite; its dispatch is graded via ann_topk_auto's pytest) yields
    # its slot to ivf_pq_topk — the billion-vector IVF×PQ composition
    out["remove_duplicate_spans"] = _remove_dup_spans_q
    out["dedup_clusters"] = _dedup_clusters
    out["dedup_simhash"] = _simhash
    out["ann_lsh_topk"] = _lsh_ann
    out["ann_ivf_topk"] = _ivf_topk
    out["ivf_pq_topk"] = _ivf_pq_q
    out["embedding_near_dup"] = _near_dup
    out["semantic_dedup_pairs"] = _semantic_dedup_q
    out["manifest_outer_product"] = _manifest_query
    # training-data assembly: span dedup, sequence packing, shard layout
    out["dedup_ngram_spans"] = _ngram_span_dedup
    out["bloom_dedup_reference"] = _bloom_dedup_q
    out["pack_sequences"] = _pack_sequences_q
    # round-8 rotation (second pass): corpus_shards (md5 shard layout +
    # per-shard stats — its shard_assign expression and aggregate shape
    # stay graded INSIDE tfrecord_roundtrip's writer and warm in
    # test_packing.py) yields its slot to tfrecord_roundtrip — the
    # TFRecord wire-format loop (CRC framing + Example codec), which
    # strictly supersedes the rotated shape
    out["tfrecord_roundtrip"] = _tfrecord_roundtrip
    # data-selection + hygiene composites (round-3 rotation: these were
    # pytest-only; events_minmax_count (trivial single-row agg) and the
    # batch events_sessions (its oracle still grades via the streaming
    # twin) yield their slots)
    out["dsir_select"] = _dsir_select_q
    out["gopher_c4_filter"] = _gopher_c4_q
    # round-5 rotation: url_dedup (canonicalize + window dedup) and
    # bpe_tokenize (pinned-merge segmentation) take the q4/q13 slots —
    # those shapes stay covered by q18/q22/the rollup and warm in
    # test_shared_sql_parity.py
    # round-9 rotation: url_dedup yields its slot to phash_near_dup —
    # canonicalize+window-dedup stays graded via snapshot_delta
    # (canonical url join) and domain_cap_sample (host parsing), warm in
    # pytest; image decode -> pHash -> banded-Hamming was pytest-only
    out["phash_near_dup"] = _phash_near_dup_q
    out["bpe_tokenize"] = _bpe_tokenize_q
    # text_fingerprints (per-row fingerprint exprs that text_doc_metrics'
    # shape already exercises) yields its slot to dedup_lines — the CCNet
    # corpus-level boilerplate removal; its dialect-pair text stays warm
    # in test_shared_sql_parity.py
    out["dedup_lines"] = _dedup_lines_q
    # round-5 rotation (second pass): mix_corpora (domain-mixture
    # sampling) and chunk_documents (context-window chunking) take the
    # topk_customers / q19_disjunctive_revenue slots — plain top-k stays
    # graded through mix_corpora's TakeOrdered draws and q3/q18's
    # orderBy+limit; disjunctive filter-agg through q1/corpus_clean. Both
    # rotated-out texts stay warm in test_shared_sql_parity.py
    out["mix_corpora"] = _mix_corpora_q
    # round-9 rotation: chunk_documents yields its slot to
    # stratified_sample — the window/prefix-sum chunk machinery stays
    # graded via pack_sequences and warm in pytest; exact per-stratum
    # md5-order sampling was pytest-only
    out["stratified_sample"] = _stratified_sample_q
    # round-5 rotation (third pass): quality_filter — the last ungraded
    # LLM-pipeline operator family — takes sample_split_stats' slot (its
    # md5-bucket determinism is graded through mix_corpora's draws and
    # stays warm in the parity suite)
    out["quality_filter"] = _quality_filter_q
    # round-6 rotation: webdataset_roundtrip (the shard writer+reader
    # loop, last pytest-only training-data component) and decontaminate
    # (benchmark 13-gram hygiene) take the q5_local_supplier_volume /
    # window_running_total slots — the multi-join shape stays graded via
    # q3/q18, the window shape via events_multi_grain_rollup and the
    # parity suite; both rotated-out texts stay warm in
    # test_shared_sql_parity.py
    out["webdataset_roundtrip"] = _webdataset_roundtrip
    out["decontaminate"] = _decontaminate_q
    # round-6 rotation (second pass): the hygiene pair c4_clean +
    # scrub_pii (the last pytest-only corpus-cleaning operators) and the
    # streaming LSH near-dup flagger take the q22_inactive_customers /
    # set_ops_customers / text_langid slots — anti-join+correlated-agg
    # shapes stay graded via decontaminate/dedup_lines/q18, set-ops and
    # langid texts stay warm in test_shared_sql_parity.py
    out["c4_clean"] = _c4_clean_q
    out["scrub_pii"] = _scrub_pii_q
    out["dedup_minhash_stream"] = _stream_minhash_q
    # round-6 rotation (third pass): warc_roundtrip — the Common Crawl
    # ingestion path, last pytest-only source — takes events_props_json's
    # slot (the JSON-extraction shape stays graded inside
    # webdataset_roundtrip's meta_json projection; the props SQL joins
    # the parity suite)
    out["warc_roundtrip"] = _warc_roundtrip
    # round-6 rotation (fourth pass): snapshot_delta — incremental
    # crawl-snapshot classification, a new operator family — takes
    # q3_unshipped_revenue's slot (its 3-way join+agg+topk shape stays
    # graded via q18 and warm in the parity suite)
    out["snapshot_delta"] = _snapshot_delta_q
    # round-7 rotation: q18_large_orders and corpus_clean (join+having
    # top-k and disjunctive filter shapes stay graded via
    # events_multi_grain_rollup / mix_corpora / gopher_c4_filter; both
    # texts warm in test_shared_sql_parity.py) yield their slots to
    # resize_images — the last pytest-only multimodal stage — and
    # domain_cap_sample — the C4-style per-host balance step
    out["resize_images"] = _resize_images_q
    out["domain_cap_sample"] = _domain_cap_q
    # round-7 rotation (second pass): events_multi_grain_rollup (the
    # GROUPING SETS shape; its text stays dual-engine warm in the parity
    # suite and time-window aggs stay graded via the streaming rollup
    # twin) yields its slot to zarr_writer_roundtrip — the
    # dataframe_to_zarr tabular->tensor bridge plus the zarr DataSource
    # read-back, on the real events table
    out["zarr_writer_roundtrip"] = _zarr_writer_roundtrip
    # shared-SQL battery (identical ANSI text on both engines); the
    # hourly-rollup text grades via its streaming twin below, so the
    # batch copy is skipped to stay inside the 50-query budget.
    # q17/q6/q14/q10 (single-row or join+topk conditional-agg shapes that
    # q1/q4/q13/q19/q3 already cover) yield their slots to dedup_clusters
    # and the three training-data assembly queries; q16 (distinct-agg +
    # NOT-IN anti-join, shapes q13/q22/set_ops_customers also exercise)
    # yields its slot to multimodal_audio — the real WAV decode path;
    # q9 (multi-way join + agg, the shape q5 grades) yields its slot to
    # bloom_dedup_reference — the broadcast-Bloom incremental-dedup scale
    # path. All rotated-out SQL stays warm in test_shared_sql_parity.py.
    _SWAPPED_OUT = (
        "events_hourly_rollup",
        "q17_small_quantity_revenue",
        "q6_forecast_revenue",
        "q14_promo_revenue",
        "q10_returned_items",
        "q16_supplier_cnt",
        "q9_product_profit",
        # round-4 rotation for dsir_select + gopher_c4_filter:
        "events_minmax_count",
        "events_sessions",
        # round-5 rotation for url_dedup + bpe_tokenize (q4's exists-agg
        # shape is covered by q18/q22; q13's outer-join distribution by
        # q22/the rollup):
        "q4_order_priority",
        "q13_customer_distribution",
        # round-5 rotation for mix_corpora + chunk_documents:
        "topk_customers",
        "q19_disjunctive_revenue",
        # round-6 rotation for webdataset_roundtrip + decontaminate:
        "q5_local_supplier_volume",
        "window_running_total",
        # round-6 rotation (second pass) for c4_clean + scrub_pii +
        # dedup_minhash_stream:
        "q22_inactive_customers",
        "set_ops_customers",
        # round-6 rotation (fourth pass) for snapshot_delta:
        "q3_unshipped_revenue",
        # round-7 rotation for zarr_source_scan + resize_images (q1 stays
        # the entry() flagship):
        "q1_pricing_summary",
        "q18_large_orders",
        # round-7 rotation (second pass) for zarr_writer_roundtrip:
        "events_multi_grain_rollup",
    )
    for name, sql in shared.items():
        if name not in _SWAPPED_OUT:
            out[name] = _sql_query(sql)
    # dedup_ngram_signature (GROUP BY of the rolling_min_hash expression
    # text_fingerprints already grades per-row) yields its slot to
    # semantic_dedup_pairs — the k-means scale path was the last ungraded
    # 100 TB operator; the signature text stays warm in the parity pytest.
    # Round-6: top_bigrams yields its slot to perplexity_buckets — the
    # n-gram+agg+topk shapes it graded stay covered by dedup_ngram_spans
    # / decontaminate (grams) and q3/q18/mix_corpora (top-k); its text
    # stays warm in the parity suite.
    # round-7: corpus_clean's slot moved to domain_cap_sample (see above)
    for name, sql in _text_sql("spark").items():
        if name not in (
            "dedup_ngram_signature",
            "text_fingerprints",
            "sample_split_stats",
            "top_bigrams",
            "text_langid",
            "corpus_clean",
            # r10: slot moved to pyramid_roundtrip (see above)
            "text_doc_metrics",
            # r11: slot moved to pipeline_spill_roundtrip (see above)
            "dedup_exact",
        ):
            out[name] = _sql_query(sql)
    # round-12 rotation: perplexity_buckets (CCNet tercile split — its
    # trigram-LM scoring path stays graded via quality_filter in-gate
    # and pinned numerically in test_lmscore.py; the windowed-quantile
    # bucketing shape via stratified_sample) yields its slot to
    # audio_near_dup — the audio fingerprint path, the last pytest-only
    # extension-operator family member (r11 verdict ask #5)
    out["audio_near_dup"] = _audio_near_dup_q
    # events_props_json's slot moved to warc_roundtrip (r6 third pass);
    # its dialect-pair text stays warm in test_shared_sql_parity.py
    # streaming twins + bespoke joins
    # round-9 rotation: events_hourly_rollup_stream (micro-batch windowed
    # agg — shape stays graded via events_sessions_stream +
    # streaming_domain_cap + pipeline_stream_append, text warm in the
    # parity suite) yields its slot to streaming_hamming_dedup, the
    # cross-modal 64-bit-signature ingest dedup
    out["streaming_hamming_dedup"] = _stream_hamming_q
    out["events_sessions_stream"] = _events_sessions_stream
    # round-8 rotation: events_dedup_stream (streaming EXACT dedup — its
    # first-seen-wins state shape stays graded via dedup_minhash_stream
    # and warm in test_streaming.py) yields its slot to
    # streaming_domain_cap — the ingest-time per-host admission cap
    out["streaming_domain_cap"] = _stream_domain_cap_q
    out["asof_last_order"] = _asof_last_order
    out["range_join_orders"] = _range_join_orders
    out["skew_salted_join"] = _skew_salted_join
    assert len(out) == 50, f"driver grades at most 50 queries, got {len(out)}"
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(_shared_sql())  # identical ANSI text runs on DuckDB
    out.update(_text_sql("duckdb"))
    out["warc_roundtrip"] = _WARC_ORACLE
    # round-9 rotation: the hourly-rollup text leaves the gate entirely
    # (slot moved to streaming_hamming_dedup); it stays warm in the
    # parity suite
    out.pop("events_hourly_rollup")
    out["streaming_hamming_dedup"] = _STREAM_HAMMING_ORACLE
    # round-4 rotation: the batch events_sessions slot moved to
    # dsir_select; its SQL still grades the streaming twin
    out["events_sessions_stream"] = out.pop("events_sessions")
    out.pop("events_minmax_count")  # slot moved to gopher_c4_filter
    # round-5 rotation: slots moved to url_dedup + bpe_tokenize
    out.pop("q4_order_priority")
    out.pop("q13_customer_distribution")
    out["dsir_select"] = _dsir_oracle()
    out["gopher_c4_filter"] = _gopher_oracle()
    out["phash_near_dup"] = _PHASH_NEAR_DUP_ORACLE  # r9: url_dedup slot
    out["bpe_tokenize"] = _bpe_oracle()
    out.pop("text_fingerprints")  # slot moved to dedup_lines
    out["dedup_lines"] = _dedup_lines_oracle()
    # round-5 rotation: slots moved to mix_corpora + chunk_documents
    out.pop("topk_customers")
    out.pop("q19_disjunctive_revenue")
    out["mix_corpora"] = _mix_corpora_oracle()
    out["stratified_sample"] = _STRATIFIED_SAMPLE_ORACLE  # r9: chunk_documents slot
    # round-5 rotation: slot moved to quality_filter
    out.pop("sample_split_stats")
    out["quality_filter"] = _quality_filter_oracle()
    out["webdataset_roundtrip"] = _WDS_ORACLE
    out["decontaminate"] = _decontaminate_oracle()
    out["audio_near_dup"] = _AUDIO_NEAR_DUP_ORACLE  # r12: perplexity slot
    # round-6 rotation (second pass): slots moved to c4_clean +
    # scrub_pii + dedup_minhash_stream
    out.pop("q22_inactive_customers")
    out.pop("set_ops_customers")
    out.pop("text_langid")
    out["c4_clean"] = _c4_clean_oracle()
    out["scrub_pii"] = _scrub_pii_oracle()
    out["dedup_minhash_stream"] = _STREAM_MINHASH_ORACLE
    out["quality_classifier_score"] = _quality_classifier_oracle()  # r9: ann_pq slot
    out.pop("q3_unshipped_revenue")  # slot moved to snapshot_delta
    out["snapshot_delta"] = _snapshot_delta_oracle()
    # round-8 rotation: events_dedup_stream's slot moved to
    # streaming_domain_cap; _DEDUP_STREAM_ORACLE stays warm in pytest
    out["streaming_domain_cap"] = _STREAM_DOMAIN_CAP_ORACLE
    out["asof_last_order"] = _ASOF_ORACLE
    out["range_join_orders"] = _RANGE_JOIN_ORACLE
    out["skew_salted_join"] = _SKEW_JOIN_ORACLE
    # round-8 rotation: ann_cosine_topk's slot moved to ivf_pq_topk
    # (_ANN_ORACLE stays the bench extra-matched oracle)
    out["ivf_pq_topk"] = _ivf_pq_oracle_sql()
    out["embedding_near_dup"] = _NEAR_DUP_ORACLE
    # multimodal_stats' slot moved to ann_pq_topk (r6 second pass); its
    # sha-fake blob aggregate (_MULTIMODAL_ORACLE) stays warm in pytest
    out["manifest_outer_product"] = _MANIFEST_ORACLE
    # hash-family replications + pinned pipeline constants
    for swapped in (
        "q17_small_quantity_revenue",
        "q6_forecast_revenue",
        "q14_promo_revenue",
        "q10_returned_items",
        "q16_supplier_cnt",  # slot swapped for multimodal_audio
    ):
        out.pop(swapped)  # slots swapped for dedup_clusters + assembly queries
    out.pop("dedup_ngram_signature")  # slot swapped for semantic_dedup_pairs
    out["semantic_dedup_pairs"] = _semdedup_oracle()
    out["dedup_ngram_spans"] = _span_dedup_oracle()
    out["pack_sequences"] = _pack_oracle()
    # corpus_shards' slot moved to tfrecord_roundtrip (r8 second pass);
    # its shard-stat shape stays warm in test_packing.py
    out["tfrecord_roundtrip"] = _TFR_ORACLE
    # round-8 rotation: dedup_minhash_pairs' slot moved to
    # remove_duplicate_spans (_MINHASH_ORACLE keeps feeding the
    # stream-minhash verification + pytest)
    out["remove_duplicate_spans"] = _span_removal_oracle()
    out["dedup_clusters"] = _CLUSTERS_ORACLE
    out["dedup_simhash"] = _SIMHASH_ORACLE
    out["ann_lsh_topk"] = _lsh_oracle_sql()
    out["ann_ivf_topk"] = _IVF_ORACLE
    out["bloom_dedup_reference"] = _BLOOM_ORACLE
    out["multimodal_features"] = _MULTIMODAL_FEATURES_ORACLE
    out["multimodal_audio"] = _AUDIO_ORACLE
    # round-7 rotation: q1 (stays the entry() flagship + parity suite),
    # q18 and corpus_clean yield their slots to the zarr DataSource scan,
    # resize_images, and domain_cap_sample
    out.pop("q1_pricing_summary")
    out.pop("q18_large_orders")
    out.pop("corpus_clean")
    out["zarr_source_scan"] = _ZARR_SOURCE_ORACLE
    out["resize_images"] = _resize_images_oracle()
    out["domain_cap_sample"] = _domain_cap_oracle()
    # round-7 second pass: slot moved from events_multi_grain_rollup
    out.pop("events_multi_grain_rollup")
    out["zarr_writer_roundtrip"] = _ZARR_WRITER_ORACLE
    # round-10 rotation: text_doc_metrics' slot moved to
    # pyramid_roundtrip; its dialect text stays warm in the parity suite
    # and timed as a bench extra-matched pair
    out.pop("text_doc_metrics")
    out["pyramid_roundtrip"] = _pyramid_oracle_sql()
    # round-11 rotation: dedup_exact's slot moved to
    # pipeline_spill_roundtrip; its dialect text stays warm in the
    # parity suite and timed as a bench extra-matched pair
    out.pop("dedup_exact")
    out.update(_pipeline_oracle_sql())
    return out
