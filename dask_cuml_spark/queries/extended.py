"""Extended checklist coverage (SURVEY.md §2C gaps + remaining §2B/§2D):
as-of join, cube, source/sink round-trips (CSV/JSON/ORC/partitioned
parquet), map functions, ranking windows, language-ID heuristic,
BPE-ish token counting, kNN regression.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dask_cuml_spark.io import load_table
from dask_cuml_spark.registry import register
from dask_cuml_spark.sources import formats


# ---------------------------------------------------------------------------
# q60 — as-of join (C-checklist, no Spark native): for each "query point"
# (customer's first event-month demand), the most recent order at or
# before a cutoff — here: each customer's latest order strictly before
# 1998-01-01, formulated as join + deterministic top-1. At 100 TB the
# union-window trick avoids the range-join blowup; at key-bounded
# cardinality this join+rank IS the right plan (the per-key candidate
# set is small).
# ---------------------------------------------------------------------------
@register(
    "q60_asof_join",
    oracle="""
SELECT c_custkey, o_orderkey AS asof_orderkey,
       epoch_us(o_orderdate) AS asof_date_us, o_totalprice
FROM (
  SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY c.c_custkey
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
   AND o.o_orderdate < TIMESTAMP '1998-01-01'
) t
WHERE rk = 1
""",
)
def q60_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_custkey",
            F.col("o_orderkey").alias("asof_orderkey"),
            # NTZ-safe epoch micros: timestampdiff over NTZ operands is
            # session-timezone-independent (a bare cast to TIMESTAMP would
            # shift by the driver session's tz and break the oracle)
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
            ).alias("asof_date_us"),
            "o_totalprice",
        )
    )


# ---------------------------------------------------------------------------
# q61 — cube (C-checklist grouping sets family; q11 covers rollup).
# ---------------------------------------------------------------------------
@register(
    "q61_cube",
    oracle="""
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q61_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# q62 — partitioned parquet sink round-trip (B2): write orders
# hive-partitioned by status, read back, aggregate. Oracle aggregates the
# source directly — the round-trip must be lossless.
# ---------------------------------------------------------------------------
@register(
    "q62_partitioned_write",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY o_orderstatus
""",
)
def q62_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = os.path.join(
        tempfile.gettempdir(), f"dcs_part_write_{os.path.basename(sf_dir)}"
    )
    formats.write_partitioned_parquet(o, out, ["o_orderstatus"])
    back = formats.read_parquet(spark, out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# ---------------------------------------------------------------------------
# q63 — CSV/JSON/ORC source round-trip (B1): nation written to all three
# formats, read back, 3-way joined. Oracle reads the parquet source.
# ---------------------------------------------------------------------------
@register(
    "q63_multiformat_roundtrip",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey,
       n_nationkey AS key_csv, n_nationkey AS key_json, n_nationkey AS key_orc
FROM nation
""",
)
def q63_multiformat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    base = os.path.join(
        tempfile.gettempdir(), f"dcs_fmt_{os.path.basename(sf_dir)}"
    )
    formats.write_csv(n, f"{base}/csv")
    formats.write_json(n, f"{base}/json")
    formats.write_orc(n, f"{base}/orc")
    csv = formats.read_csv(spark, f"{base}/csv", schema=n.schema).select(
        F.col("n_nationkey").alias("key_csv")
    )
    js = formats.read_json(spark, f"{base}/json", schema=n.schema).select(
        F.col("n_nationkey").alias("key_json")
    )
    orc = formats.read_orc(spark, f"{base}/orc").select(
        F.col("n_nationkey").alias("key_orc")
    )
    return (
        n.join(csv, n.n_nationkey == csv.key_csv)
        .join(js, n.n_nationkey == js.key_json)
        .join(orc, n.n_nationkey == orc.key_orc)
        .select(
            "n_nationkey", "n_name", "n_regionkey", "key_csv", "key_json", "key_orc"
        )
    )


# ---------------------------------------------------------------------------
# q100 — schema evolution on read (B1 extension): two parquet generations
# of the same table — the newer one adds a column — read together with
# mergeSchema; old-generation rows surface NULL for the added column.
# The oracle recomputes the union arithmetic from the source table.
# ---------------------------------------------------------------------------
@register(
    "q100_merge_schema",
    oracle="""
SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_rows,
       COUNT(*) AS n_null_region,
       COUNT(*) AS n_with_region,
       CAST(SUM(n_regionkey) AS BIGINT) AS sum_region
FROM nation
""",
)
def q100_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    base = os.path.join(
        tempfile.gettempdir(), f"dcs_evo_{os.path.basename(sf_dir)}"
    )
    # generation 1: narrow schema; generation 2: adds n_regionkey
    n.select("n_nationkey", "n_name").write.mode("overwrite").parquet(
        f"{base}/gen=1"
    )
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).parquet(f"{base}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("n_regionkey").isNull().cast("int")).cast("long").alias(
            "n_null_region"
        ),
        F.sum(F.col("n_regionkey").isNotNull().cast("int")).cast("long").alias(
            "n_with_region"
        ),
        F.sum("n_regionkey").alias("sum_region"),
    )


# ---------------------------------------------------------------------------
# q64 — map functions (C-checklist): events.props parsed into a typed
# map, keys/values extracted and aggregated.
# ---------------------------------------------------------------------------
@register(
    "q64_map_functions",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_maps,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_values
FROM events
GROUP BY event_type
""",
)
def q64_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        e.withColumn("m", m)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_maps"),
            F.sum(
                F.when(F.array_contains(F.map_keys("m"), "k"), 1).otherwise(0)
            ).alias("n_with_k"),
            F.sum(F.element_at("m", "k")).alias("sum_values"),
        )
    )


# ---------------------------------------------------------------------------
# q65 — ranking window functions beyond row_number (C-checklist): rank,
# dense_rank, ntile, percent_rank, cume_dist over a GLOBAL order.
# Round-2 fix: computed via the two-pass global rank (range partition →
# local rank → broadcast offsets; functions/ranking.py) instead of an
# unpartitioned Window, which Catalyst executes as an Exchange
# SinglePartition + one-task sort of the whole fact table. The order key
# (c_acctbal DESC, c_custkey) is total, so rank = dense_rank =
# row_number and ntile/percent_rank/cume_dist are arithmetic on (rn, N).
# ---------------------------------------------------------------------------
@register(
    "q65_ranking_windows",
    oracle="""
SELECT c_custkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
""",
)
def q65_ranking_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.functions.ranking import (
        global_row_number,
        ntile_from_rn,
    )

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked, n = global_row_number(
        c, [F.col("c_acctbal").desc(), F.col("c_custkey")]
    )
    rn = F.col("_rn")
    pct = (rn - 1) / F.lit(n - 1) if n > 1 else F.lit(0.0)
    return ranked.select(
        "c_custkey",
        rn.alias("rnk"),
        rn.alias("drnk"),
        ntile_from_rn(rn, n, 4).alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(rn / F.lit(n), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# q66 — language-ID heuristic (north-star text analysis): marker-token
# ratio. The fixture vocabulary carries no real language signal
# (FIXTURES.md), so the operator contract is the deterministic score, not
# recovery of the lang column.
# ---------------------------------------------------------------------------
@register(
    "q66_language_id",
    oracle="""
SELECT doc_id,
       ROUND(CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('key', 'agg', 'row', 'scan'))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS marker_ratio,
       CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                     t -> t IN ('key', 'agg', 'row', 'scan'))) AS DOUBLE)
                 / len(string_split(text, ' ')) >= 0.12
            THEN 'markerlang' ELSE 'other' END AS lang_pred
FROM documents
""",
)
def q66_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    markers = F.filter(
        toks, lambda t: t.isin("key", "agg", "row", "scan")
    )
    ratio = F.size(markers).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        F.round(ratio, 6).alias("marker_ratio"),
        F.when(ratio >= 0.12, "markerlang").otherwise("other").alias("lang_pred"),
    )


# ---------------------------------------------------------------------------
# q67 — token counting, whitespace + BPE-ish (north-star): whitespace
# tokens plus a subword estimate (ceil(len/4) per token — the "4 chars ≈
# 1 token" heuristic), both pure expressions.
# ---------------------------------------------------------------------------
@register(
    "q67_token_count",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       CAST(list_sum(list_transform(string_split(text, ' '),
            t -> CAST(CEIL(LENGTH(t) / 4.0) AS BIGINT))) AS BIGINT)
         AS n_subword_est
FROM documents
""",
)
def q67_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sub = F.aggregate(
        F.transform(
            toks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_ws_tokens"),
        sub.alias("n_subword_est"),
    )


# ---------------------------------------------------------------------------
# q68 — kNN regressor (A10): predict the mean label of the 5 nearest
# neighbors (labels have no geometric signal here — the contract is the
# deterministic aggregation of a deterministic neighbor set).
# ---------------------------------------------------------------------------
@register(
    "q68_knn_regressor",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, label
  FROM embeddings WHERE vec_id >= 20
), knn AS (
  SELECT query_id, label
  FROM (
    SELECT query_id, neighbor_id, label,
           ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY list_aggregate(list_transform(list_zip(qv, cv),
                 p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                 * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum'),
               neighbor_id) AS rk
    FROM q, c
  ) t WHERE rk <= 5
)
SELECT query_id, ROUND(AVG(CAST(label AS DOUBLE)), 6) AS label_pred
FROM knn
GROUP BY query_id
""",
)
def q68_knn_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.functions.vector import l2_sq

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "label",
    )
    n_par = spark.sparkContext.defaultParallelism
    w = Window.partitionBy("query_id").orderBy("dist_sq", "neighbor_id")
    knn = (
        c.repartition(n_par)
        .crossJoin(F.broadcast(q))
        .select("query_id", "neighbor_id", "label", l2_sq("qv", "cv").alias("dist_sq"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )
    return knn.groupBy("query_id").agg(
        F.round(F.avg(F.col("label").cast("double")), 6).alias("label_pred")
    )


# ---------------------------------------------------------------------------
# q80 — time-RANGE window frame (B16 rangeBetween; q17 covers ROWS):
# trailing-1-hour value sum per user over the event stream.
# ---------------------------------------------------------------------------
@register(
    "q80_range_window",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
)
SELECT user_id, event_id,
       ROUND(SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts_us
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4)
         AS val_trailing_1h
FROM base
""",
)
def q80_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("val_trailing_1h"),
    )


# ---------------------------------------------------------------------------
# q81 — one-hot encoding (A15 OneHotEncoder): known-category wide form,
# engine-portable and join-free.
# ---------------------------------------------------------------------------
@register(
    "q81_one_hot",
    oracle="""
SELECT doc_id,
       CAST(lang = 'en' AS INT) AS lang_en,
       CAST(lang = 'zh' AS INT) AS lang_zh,
       CAST(lang = 'es' AS INT) AS lang_es,
       CAST(lang = 'de' AS INT) AS lang_de,
       CAST(lang = 'fr' AS INT) AS lang_fr
FROM documents
""",
)
def q81_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        *[
            (F.col("lang") == lang).cast("int").alias(f"lang_{lang}")
            for lang in ("en", "zh", "es", "de", "fr")
        ],
    )


# ---------------------------------------------------------------------------
# q86 — table profiling (data-quality pass over a table: null counts,
# distinct counts, min/max per column — the dask_cudf describe/isna
# combination a pipeline runs before training).
# ---------------------------------------------------------------------------
@register(
    "q86_profile_table",
    oracle="""
SELECT
  COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_name,
  CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_bal,
  COUNT(DISTINCT c_nationkey) AS distinct_nations,
  COUNT(DISTINCT c_mktsegment) AS distinct_segments,
  ROUND(MIN(c_acctbal), 2) AS min_bal,
  ROUND(MAX(c_acctbal), 2) AS max_bal,
  MIN(c_custkey) AS min_key,
  MAX(c_custkey) AS max_key
FROM customer
""",
)
def q86_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("c_name").isNull(), 1).otherwise(0)).alias(
            "null_name"
        ),
        F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0)).alias(
            "null_bal"
        ),
        F.countDistinct("c_nationkey").alias("distinct_nations"),
        F.countDistinct("c_mktsegment").alias("distinct_segments"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# q85 — explicit GROUPING SETS (completing the grouping family beyond
# q11 rollup / q61 cube): chosen set list, via Spark SQL.
# ---------------------------------------------------------------------------
@register(
    "q85_grouping_sets",
    oracle="""
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 2) AS total_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def q85_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gs"
    )
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(l_linestatus, '<all>') AS linestatus,
               COUNT(*) AS n,
               ROUND(SUM(l_extendedprice), 2) AS total_price
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# q84 — merge/upsert (CDC sink pattern): apply an update batch (each
# customer's latest order price as new acctbal, plus synthetic new keys)
# onto the customer snapshot. Updates win on collision; new keys insert.
# ---------------------------------------------------------------------------
@register(
    "q84_merge_upsert",
    oracle="""
WITH updates AS (
  SELECT o_custkey + 100000 * CAST(o_custkey % 2 = 0 AS INT) AS c_custkey,
         ROUND(MAX(o_totalprice), 2) AS c_acctbal
  FROM orders
  GROUP BY 1
)
SELECT COALESCE(t.c_custkey, u.c_custkey) AS c_custkey,
       ROUND(CASE WHEN u.c_custkey IS NOT NULL
                  THEN u.c_acctbal ELSE t.c_acctbal END, 2) AS c_acctbal,
       t.c_mktsegment AS c_mktsegment
FROM customer t
FULL OUTER JOIN updates u ON t.c_custkey = u.c_custkey
""",
)
def q84_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.operators.merge import merge_upsert

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment"
    )
    o = load_table(spark, sf_dir, "orders")
    # half the keys collide (updates), half are shifted → inserts
    updates = o.groupBy(
        (
            F.col("o_custkey")
            + 100000 * (F.col("o_custkey") % 2 == 0).cast("int")
        ).alias("c_custkey")
    ).agg(F.round(F.max("o_totalprice"), 2).alias("c_acctbal"))
    merged = merge_upsert(c, updates, "c_custkey", ["c_acctbal"])
    return merged.select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# q111 — range-clustered layout round-trip (§2C sinks / 100 TB data
# skipping): cluster_write orders on o_totalprice (repartitionByRange +
# sortWithinPartitions → narrow non-overlapping row-group [min,max]
# ranges), read back, and aggregate a selective price band. The oracle
# computes the same band over the source table, so the hash-match proves
# the clustered layout is lossless; the PRUNING effect (a ~5% band
# touches ≤25% of row groups vs 100% on an unclustered layout) is
# measured footer-by-footer in tests/test_scale_features.py.
# ---------------------------------------------------------------------------
@register(
    "q111_clustered_layout",
    oracle="""
SELECT COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi
FROM orders WHERE o_totalprice BETWEEN 100000 AND 150000
""",
)
def q111_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.operators.layout import cluster_write

    o = load_table(spark, sf_dir, "orders")
    out = os.path.join(
        tempfile.gettempdir(), f"dcs_clustered_{os.path.basename(sf_dir)}"
    )
    cluster_write(
        o.select("o_orderkey", "o_totalprice"), out, ["o_totalprice"]
    )
    back = spark.read.parquet(out)
    return back.filter(F.col("o_totalprice").between(100000, 150000)).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


# ---------------------------------------------------------------------------
# q153 — deterministic corpus shuffle + sharding (round 14; the
# training-data "shuffle and shard" step every LLM pipeline runs after
# curation: break crawl/source locality, split into S balanced training
# files). The 100-TB-correct formulation is NOT a random sort (a full
# corpus range shuffle on an RNG column) but a STATELESS KEYED
# PERMUTATION — the trick tf.data/Grain-style input pipelines use for
# reshufflable, resumable epochs: shuffle_key = π(doc_id) for a
# bijective π, so the "shuffle" is reproducible from ids alone, needs
# no stored RNG state, and any engine recomputes the identical order.
#
# The operator is operators/shard.shuffle_shard (factored out in r15)
# with TWO key modes on one plan shape: mode='feistel' — the
# PRODUCTION default since r15 (4-round 64-bit Feistel over lowbias32,
# bijective on every int64 bit pattern, no id bound, pos safe as a
# within-shard training order; bijectivity pytest-pinned on a 2^20
# swatch) — and mode='minstd', the Park–Miller affine permutation
# k = (doc_id · 48271) mod (2^31 − 1) this query pins (bijective on
# [0, 2^31−1), product < 2^46 so int64-exact and one-multiply
# SQL-expressible — measured shard imbalance over 500k ids: ±0.01 %;
# bound ENFORCED in-plan via raise_error). minstd stays the
# oracle-shared mode because DuckDB replays its single multiply
# verbatim; its known weakness (sequential ids land exactly 48271
# apart mod P — fine for shard balance + locality breaking, weak as a
# within-shard order) is documented in shard.py with the feistel
# default as the shipped answer.
#
# Spark shape: one narrow projection (key, shard = k mod S) → ONE hash
# exchange on shard → per-shard row_number ordered by (k, doc_id) —
# the window partition is a SHARD (corpus/S rows), which is exactly
# the unit a shard writer sorts locally before emitting one training
# file, so the partition size is the file size the deployment already
# chose. No global sort, no SinglePartition.
# Full-value oracle: DuckDB runs the identical integer arithmetic and
# window — both engines derive the same permutation independently.
# ---------------------------------------------------------------------------
_Q153_SHARDS = 16
_Q153_A = 48271
_Q153_P = 2147483647


@register(
    "q153_shuffle_shard",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, (doc_id * {_Q153_A}) % {_Q153_P} AS k FROM documents
)
SELECT doc_id,
       CAST(k % {_Q153_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (
              PARTITION BY k % {_Q153_SHARDS} ORDER BY k, doc_id
            ) - 1 AS BIGINT) AS pos
FROM keyed
""",
)
def q153_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.operators.shard import shuffle_shard

    return shuffle_shard(
        load_table(spark, sf_dir, "documents").select("doc_id"),
        n_shards=_Q153_SHARDS,
        mode="minstd",
    )
