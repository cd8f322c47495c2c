"""Additional substrate coverage: grouped quantiles (holistic agg per
group), unpivot/melt (dask_cudf melt), regexp functions, and a Python
UDTF (Spark 3.5+ user-defined table function — the C-checklist UDTF row
as a real UDTF, not just the mapInPandas shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_cuml_spark.io import load_table
from dask_cuml_spark.registry import register


# ---------------------------------------------------------------------------
# q88 — grouped quantiles (D10 per-group form): exact median + p90 per
# market segment (holistic aggregate after the group shuffle; at 100 TB
# swap percentile() for percentile_approx — PLANS.md).
# ---------------------------------------------------------------------------
@register(
    "q88_group_quantiles",
    oracle="""
SELECT c_mktsegment,
       ROUND(QUANTILE_CONT(c_acctbal, 0.5), 6) AS median_bal,
       ROUND(QUANTILE_CONT(c_acctbal, 0.9), 6) AS p90_bal,
       COUNT(*) AS n
FROM customer
GROUP BY c_mktsegment
""",
)
def q88_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("median_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 6).alias("p90_bal"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q89 — unpivot / melt (dask_cudf melt): wide numeric columns → long
# (measure, value) rows, aggregated per measure.
# ---------------------------------------------------------------------------
@register(
    "q89_unpivot_melt",
    oracle="""
WITH long AS (
  SELECT l_orderkey, measure, value
  FROM lineitem
  UNPIVOT (value FOR measure IN (l_quantity, l_discount, l_tax))
)
SELECT measure, COUNT(*) AS n, ROUND(SUM(value), 4) AS total,
       ROUND(AVG(value), 6) AS mean
FROM long
GROUP BY measure
""",
)
def q89_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    long = l.unpivot(
        ["l_orderkey"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
        F.round(F.avg("value"), 6).alias("mean"),
    )


# ---------------------------------------------------------------------------
# q90 — regexp functions (B10 completion: extract + count + replace).
# ---------------------------------------------------------------------------
@register(
    "q90_regexp_ops",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       CAST(LENGTH(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT)
         AS consonant_len,
       CAST(regexp_matches(p_type, 'STEEL|BRASS') AS INT) AS is_metal
FROM part
WHERE p_partkey % 7 = 0
""",
)
def q90_regexp_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).cast("long").alias(
            "consonant_len"
        ),
        F.col("p_type").rlike("STEEL|BRASS").cast("int").alias("is_metal"),
    )


# ---------------------------------------------------------------------------
# q92 — time-interval self-join (C-checklist range/interval join on the
# time axis; q14 covers value ranges): purchase events paired with the
# same user's error events within the following 5 minutes. Bounded-range
# condition on integer microseconds — at scale this joins on user_id and
# prunes by the band inside the join, no cross product.
# ---------------------------------------------------------------------------
@register(
    "q92_interval_join",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
)
SELECT p.user_id AS user_id, p.event_id AS purchase_id,
       e.event_id AS error_id, e.ts_us - p.ts_us AS lag_us
FROM base p
JOIN base e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND e.ts_us > p.ts_us AND e.ts_us <= p.ts_us + 300000000
""",
)
def q92_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("p_ts"),
    )
    err = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("e_ts"),
    )
    five_min_us = 300_000_000
    return (
        p.join(
            err,
            (F.col("p_user") == F.col("e_user"))
            & (F.col("e_ts") > F.col("p_ts"))
            & (F.col("e_ts") <= F.col("p_ts") + five_min_us),
        )
        .select(
            F.col("p_user").alias("user_id"),
            "purchase_id",
            "error_id",
            (F.col("e_ts") - F.col("p_ts")).alias("lag_us"),
        )
    )


# ---------------------------------------------------------------------------
# q91 — Python UDTF (C-checklist UDTF as a true table function, Spark
# 3.5+): one row in → one row per token with position, then aggregated.
# Oracle = the posexplode equivalent.
# ---------------------------------------------------------------------------
@register(
    "q91_python_udtf",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
  WHERE doc_id < 50
)
SELECT doc_id, CAST(MAX(pos) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN pos % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_odd_positions
FROM tok
GROUP BY doc_id
""",
)
def q91_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, term: string, pos: bigint")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for i, term in enumerate(text.split(" ")):
                yield doc_id, term, i + 1

    spark.udtf.register("dcs_tokenize", Tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.select("doc_id", "text").createOrReplaceTempView("docs_for_udtf")
    tok = spark.sql(
        "SELECT t.* FROM docs_for_udtf, "
        "LATERAL dcs_tokenize(doc_id, text) t"
    )
    return tok.groupBy("doc_id").agg(
        F.max("pos").alias("n_tokens"),
        F.sum(F.when(F.col("pos") % 2 == 1, 1).otherwise(0)).alias(
            "n_odd_positions"
        ),
    )


# ---------------------------------------------------------------------------
# q106 — salted skew join (C-checklist skew handling, promoted from
# pytest-only to the SQL gate): the lineitem⋈orders equi-join runs
# through operators/skew.salted_join — the hot-key scatter + small-side
# replicate rewrite for keys AQE's skew split can't break — and the
# per-customer rollup of the salted join must hash-match the plain-join
# oracle exactly. Salting is a pure physical transform; any row lost or
# duplicated by the (key, salt) scatter flips this red.
# ---------------------------------------------------------------------------
@register(
    "q106_salted_skew_join",
    oracle="""
SELECT o.o_custkey,
       COUNT(*) AS n_items,
       ROUND(SUM(l.l_quantity), 2) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_custkey
""",
)
def q106_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_custkey"
    )
    return (
        salted_join(l, o, on="k", salt=8)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# q107 — approx aggregates (C-checklist 100 TB substitutes, promoted
# from pytest-only): HLL++ approx_count_distinct and percentile_approx
# against their exact forms IN the same single pass. Both sketches are
# deterministic given the data, so the within-tolerance flags are
# stable; the oracle recomputes the exact values in DuckDB. At 100 TB
# the approx forms are the declared substitutes for countDistinct /
# percentile (PLANS.md) — this query is the standing proof their error
# stays inside the bound the swap assumes.
# ---------------------------------------------------------------------------
@register(
    "q107_approx_aggregates",
    oracle="""
SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact_custkeys,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 2) AS p50_exact,
       1 AS acd_within_5pct,
       1 AS p50a_within_1pct
FROM orders
""",
)
def q107_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # count(DISTINCT) must NOT share an aggregate with the sketches:
    # Spark's distinct rewrite would then evaluate every other aggregate
    # grouped by the distinct key first — one percentile buffer and one
    # KLL sketch PER CUSTOMER, merged afterwards (measured 5 s at sf0.1
    # vs 0.25 s for the same aggregates unmixed). Two single-row
    # aggregates, crossJoined: still one action, each in its natural
    # partial+final shape.
    distinct_agg = o.agg(
        F.count_distinct(F.col("o_custkey"))
        .cast("bigint")
        .alias("n_exact_custkeys")
    )
    sketch_agg = o.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("_acd"),
        F.expr("percentile(o_totalprice, 0.5)").alias("_p50"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias(
            "_p50a"
        ),
    )
    return distinct_agg.crossJoin(sketch_agg).select(
        "n_exact_custkeys",
        F.round(F.col("_p50"), 2).alias("p50_exact"),
        F.when(
            F.abs(F.col("_acd") - F.col("n_exact_custkeys"))
            / F.col("n_exact_custkeys")
            <= 0.05,
            1,
        )
        .otherwise(0)
        .alias("acd_within_5pct"),
        F.when(
            F.abs(F.col("_p50a") - F.col("_p50")) / F.col("_p50") <= 0.01, 1
        )
        .otherwise(0)
        .alias("p50a_within_1pct"),
    )
