"""Relational core (SURVEY.md §2B/§2C): the dask_cudf substrate ops a
dask-cuml user relies on — scans, projection, filter, joins (hash /
broadcast / theta / semi / anti), aggregation, windows, top-k, set ops,
rollup, string/date functions, quantiles.

Reference parity: dask_cudf DataFrame API (merge/groupby/sort_values/
drop_duplicates/str/dt accessors) [SURVEY.md §2B, P dask_cudf API].
Spark-first design: every op is a declarative DataFrame expression so
Catalyst does pushdown/pruning/join-selection; dimension tables get an
explicit broadcast hint (at 100 TB the fact side never shuffles for these).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dask_cuml_spark.io import load_table
from dask_cuml_spark.registry import register


# ---------------------------------------------------------------------------
# q01 — pricing summary: filter + groupBy + multi-agg (flagship; dask_cudf
# groupby().agg with multiple reductions). Map-side partial aggregation is
# Spark's equivalent of the reference's per-GPU partials + allreduce.
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  ROUND(AVG(l_quantity), 6) AS avg_qty,
  ROUND(AVG(l_extendedprice), 6) AS avg_price,
  ROUND(AVG(l_discount), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — revenue by nation: 4-way join + agg (dask_cudf merge chain).
# nation/region are broadcast (25 / 5 rows — at 100 TB still tiny).
# Four cost-gated shapes (r7: stage-profiled at 100× — scan 0.22 s,
# per-order agg 2.3 s, orders⋈bcast-customer 0.9 s — the 15M-group
# order rollup and the SMJ sorts were the gap, not the scan):
#
#   'direct' (orders below 64 MB): plain join chain; Catalyst
#     broadcasts everything at fixture scale. Unchanged from r4.
#   'bcast-cmap' (orders large, customer map broadcastable): the
#     DuckDB-shaped pipeline — broadcast the pruned (custkey →
#     nationkey) map into orders (narrow), then ONE shuffled HASH join
#     lineitem ⋈ (orderkey → nationkey) and a 25-group aggregate. No
#     order-level or custkey-level rollup at all: the measured 100×
#     A/B is direct-SMJ 5.42 s / eager-agg 5.15 s / per-order+hash
#     4.45 s / THIS 3.66 s. The shuffle_hash hint matters: SMJ sorts
#     60 M + 15 M rows for a join whose output feeds a 25-group agg.
#   'bucketed' (r8 — the owed co-location A/B, measured WIN): when the
#     session catalog has the q02_bucketed_layout tables for this
#     sf_dir (orders+lineitem bucketBy(orderkey)), the same bcast-cmap
#     shape reads them instead, and the one wide join runs
#     Exchange-free on both inputs (ShuffledHashJoin straight off the
#     bucketed scans). 100× A/B: 1.66 s vs 3.64 s bcast-cmap (DuckDB
#     contemporaneous 0.84 s → ratio 4.2× → 2.0×); layout write 45 s,
#     paid once per table like any warehouse co-location.
#   'bucketed-eager' (r8): layout present AND customer above the
#     broadcast cap — the eager-agg shape over the bucketed scans. The
#     per-orderkey rollup and the orders join are both on the bucket
#     key, so they too run Exchange-free; only the custkey exchange
#     remains. This is the 100 TB composition: co-located facts +
#     all-shuffle dimension join.
#   'eager-agg' (customer too big to broadcast — the 100 TB regime):
#     roll lineitem up per orderkey, then per custkey below the
#     customer join, cutting that exchange from |orders| to |customer|
#     rows (the OLAP eager-aggregation rewrite, r4). Every exchange
#     shuffles on a key — nothing broadcasts, nothing is driver-sized.
#
# All shapes are result-identical (test_q02_eager_agg_both_shapes_agree
# pins all three at fixture scale).
# ---------------------------------------------------------------------------
# Above this size the direct join's all-broadcast plan stops being free;
# 64 MB ≈ 15 M orders rows — far below any cluster-scale input.
_Q02_EAGER_AGG_MIN_ORDERS_BYTES = 64 << 20
# Co-located bucketed layout (r8, the owed A/B — it WON): orders and
# lineitem bucketBy(orderkey) make the one mandatory wide join
# Exchange-free on BOTH inputs (ShuffledHashJoin straight off the
# bucketed scans; only the 25-group aggs exchange). Measured at 100×:
# 1.66 s vs 3.64 s bcast-cmap on plain parquet — the residual the r7
# stage budget attributed to the 60 M-row shuffle, recovered by paying
# it ONCE at layout time (45 s write, amortized across every
# orderkey-join on the table — the standard warehouse co-location
# decision at 100 TB). q02 picks this branch whenever the session
# catalog has the layout for its sf_dir (q02_bucketed_layout creates
# it); correctness gates never have it, so the oracle path is
# unchanged.
_Q02_BUCKETS = 32


def _q02_bucket_tables(sf_dir: str) -> tuple[str, str]:
    # fingerprinted identity (advisor r8): the tag hashes the absolute
    # fixture path AND the source parquets' (count, bytes, mtime)
    # fingerprints, so distinct fixtures never collide onto one table
    # and a layout built from since-rewritten parquet silently stops
    # matching — q02 falls back to the plain branch, never stale data
    from dask_cuml_spark.operators.layout import layout_tag

    tag = layout_tag(sf_dir, "orders.parquet", "lineitem.parquet")
    return f"dcs_q02_orders_{tag}", f"dcs_q02_lineitem_{tag}"


def _q02_manifest_table(tag: str) -> str:
    return f"dcs_q02mf_{tag}"


def q02_layout_refresh(spark: SparkSession, sf_dir: str) -> float | None:
    """Append-only incremental refresh of the co-located fact layout
    (r13 — the fourth consumer of operators/layout.incremental_refresh,
    and the simplest: the derived rows ARE the source rows). A daily
    fact ingest appends orders/lineitem part files; only those files'
    rows are appended into the matching bucketed table (per-bucket
    append files — the Exchange-free join plan is unchanged), then
    both tables rename to the new combined fingerprint tag. Detection
    is the shared conservative manifest check over BOTH sources; any
    existing-file mutation falls back to the full rebuild."""
    from dask_cuml_spark.operators.layout import incremental_refresh

    bo, _bl = _q02_bucket_tables(sf_dir)

    def append(spark_, new_files, old_orders_tbl):
        old_tag = old_orders_tbl.rsplit("_", 1)[1]
        for src_name, tbl, key in (
            ("orders", old_orders_tbl, "o_orderkey"),
            ("lineitem", f"dcs_q02_lineitem_{old_tag}", "l_orderkey"),
        ):
            marker = f"{src_name}.parquet"
            files = [
                f
                for f in new_files
                if f"/{marker}/" in f or f.endswith(f"/{marker}")
            ]
            if not files:
                continue
            n_buckets = int(
                next(
                    r.data_type
                    for r in spark_.sql(f"DESCRIBE EXTENDED {tbl}").collect()
                    if r.col_name == "Num Buckets"
                )
            )
            (
                spark_.read.parquet(*files)
                .repartition(n_buckets, F.col(key))
                .write.mode("append")
                .bucketBy(n_buckets, key)
                .sortBy(key)
                .saveAsTable(tbl)
            )

    return incremental_refresh(
        spark,
        sf_dir,
        ("orders.parquet", "lineitem.parquet"),
        "dcs_q02_orders_",
        _q02_manifest_table,
        bo,
        append,
        sibling_renames=("dcs_q02_lineitem_",),
    )


def q02_bucketed_layout(
    spark: SparkSession, sf_dir: str, n_buckets: int = _Q02_BUCKETS
) -> float:
    """One-time co-located layout for q02's wide join: orders and
    lineitem written bucketBy(n_buckets, orderkey), sorted within
    buckets, one file per bucket (repartition on the bucket key with
    Spark's own hash → write tasks align 1:1 with buckets). Returns
    the wall seconds spent writing — the amortized cost a deployment
    pays once per table, not per query."""
    import time as _time

    from dask_cuml_spark.io import source_size_bytes
    from dask_cuml_spark.operators.layout import drop_table_and_location

    t0 = _time.perf_counter()
    bo, bl = _q02_bucket_tables(sf_dir)
    for name, tbl, key in (
        ("orders", bo, "o_orderkey"),
        ("lineitem", bl, "l_orderkey"),
    ):
        drop_table_and_location(spark, tbl)
        src = load_table(spark, sf_dir, name)
        # bucketBy needs NO pre-shuffle: every write task hashes its
        # rows into local per-bucket files. The repartition below only
        # prettifies small layouts (one file per bucket); on a big
        # table it stages a full extra copy of the input as shuffle
        # files — the r10 1000x write died on disk exactly there
        # (600M-row lineitem: ~12.7 GB parquet + ~2x that in shuffle).
        # Past the threshold, write shuffle-free and accept
        # (input tasks x buckets) files — the shape a real multi-
        # executor cluster write produces anyway; bucketed reads
        # co-group all files of a bucket, so the Exchange-free join
        # plan is identical.
        if source_size_bytes(sf_dir, name) <= (4 << 30):
            src = src.repartition(n_buckets, F.col(key))
        (
            src.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    # manifest sidecar over BOTH sources: the append-only detector's
    # baseline for the NEXT provisioning call (q02_layout_refresh)
    from dask_cuml_spark.operators.layout import write_layout_manifest

    write_layout_manifest(
        spark,
        sf_dir,
        ("orders.parquet", "lineitem.parquet"),
        _q02_manifest_table(bo.rsplit("_", 1)[1]),
    )
    return _time.perf_counter() - t0
# The pruned 2-column customer map is ~1/10 of the full-table estimate;
# 1 GiB of customer ≈ a ~100 MB broadcast build — the upper end of
# routine Spark broadcast practice. Past it, fall back to all-shuffle.
# MEASURED boundary, not a guess (r8): at 100× the pruned 2-col map of
# a 29 MB-plan / 1.5 M-row customer builds and wins (1.66 s bucketed);
# at 300× the ~90 MB-plan / 4.5 M-row map FAILS the broadcast build
# outright (notEnoughMemoryToBuildAndBroadcastTableError under the 8 g
# driver) — the in-memory hashed relation is ~30 B/row, ~10× the
# parquet-compressed plan estimate the gate sees. 48 MB keeps a 1.5×
# margin over the proven-good point while staying far under the
# measured failure; past it the eager-agg all-shuffle shape is the
# answer (and composes with the bucketed layout, see below).
_Q02_BCAST_CMAP_MAX_CUSTOMER_BYTES = 48 << 20



def q02_plan_branch(spark: SparkSession, sf_dir: str) -> str:
    """Which join shape q02's cost gate picks for this dataset —
    'direct', 'bcast-cmap', 'eager-agg', or their bucketed-layout
    composites 'bucketed' / 'bucketed-eager' (see the block comment).
    Exposed so bench_scale can record the branch per scale factor
    (verdict r4 task 6)."""
    # the LAYOUT (bucketed scans) and the JOIN SHAPE are orthogonal
    # decisions: the layout substitutes where orders/lineitem are read
    # from; the shape is picked by the same size gates either way.
    # 'bucketed' = bcast-cmap shape over bucketed scans (customer map
    # fits the broadcast cap); 'bucketed-eager' = eager-agg shape over
    # bucketed scans (customer too big to broadcast — the rollup and
    # the wide join are both on orderkey, so they run Exchange-free
    # off the layout too; only the custkey exchange remains).
    # size gates read the source parquet FILE size, never plan stats:
    # once a session caches a table, Catalyst substitutes the cached
    # InMemoryRelation into ANY plan over the same source (CacheManager
    # matches by logical plan, so even a fresh spark.read.parquet picks
    # it up), and in-memory stats are uncompressed — customer at 100x
    # reads 78 MB cached vs 29 MB on disk. A stats-fed gate therefore
    # flips branches depending on whether the suite happened to cache
    # the table first (the r9 regression: q02 at 100x fell to
    # bucketed-eager under the bench protocol's cache and lost 0.8 s).
    # The caps below were calibrated against parquet sizes — file bytes
    # ARE that unit, and they're invariant to session cache state.
    from dask_cuml_spark.io import source_size_bytes

    bo, bl = _q02_bucket_tables(sf_dir)
    has_layout = spark.catalog.tableExists(bo) and spark.catalog.tableExists(
        bl
    )
    if (
        not has_layout
        and source_size_bytes(sf_dir, "orders")
        < _Q02_EAGER_AGG_MIN_ORDERS_BYTES
    ):
        return "direct"
    if (
        source_size_bytes(sf_dir, "customer")
        <= _Q02_BCAST_CMAP_MAX_CUSTOMER_BYTES
    ):
        return "bucketed" if has_layout else "bcast-cmap"
    return "bucketed-eager" if has_layout else "eager-agg"
@register(
    "q02_revenue_by_nation",
    oracle="""
SELECT
  n.n_name AS nation,
  r.r_name AS region,
  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
  COUNT(*) AS n_lineitems
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    branch = q02_plan_branch(spark, sf_dir)
    if branch in ("bucketed", "bucketed-eager"):
        # co-located layout exists: orders and lineitem come from the
        # bucketed tables, so every orderkey join/rollup below runs
        # Exchange-free on both inputs (measured plan: zero
        # hashpartitioning exchanges below the custkey/25-group aggs)
        bo, bl = _q02_bucket_tables(sf_dir)
        o, l = spark.table(bo), spark.table(bl)
        branch = "bcast-cmap" if branch == "bucketed" else "eager-agg"
    if branch == "bcast-cmap":
        o2 = (
            o.select("o_orderkey", "o_custkey")
            .join(
                F.broadcast(c.select("c_custkey", "c_nationkey")),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "c_nationkey")
        )
        by_nation = (
            l.select(
                "l_orderkey",
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                    "rev"
                ),
            )
            .join(
                o2.hint("shuffle_hash"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("c_nationkey")
            .agg(F.sum("rev").alias("rev"), F.count(F.lit(1)).alias("nl"))
        )
        return (
            by_nation.join(
                F.broadcast(n), F.col("c_nationkey") == n.n_nationkey
            )
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
            .agg(
                F.round(F.sum("rev"), 2).alias("revenue"),
                F.sum("nl").alias("n_lineitems"),
            )
        )
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev"
        ),
        F.count(F.lit(1)).alias("nl"),
    )
    if branch == "eager-agg":
        cust_side = (
            o.select("o_orderkey", "o_custkey")
            .join(per_order, o.o_orderkey == per_order.l_orderkey)
            .groupBy("o_custkey")
            .agg(F.sum("rev").alias("rev"), F.sum("nl").alias("nl"))
        )
        joined = c.select("c_custkey", "c_nationkey").join(
            cust_side, c.c_custkey == cust_side.o_custkey
        )
    else:
        joined = (
            c.select("c_custkey", "c_nationkey")
            .join(o.select("o_orderkey", "o_custkey"), c.c_custkey == o.o_custkey)
            .join(per_order, o.o_orderkey == per_order.l_orderkey)
        )
    return (
        joined.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.sum("nl").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# q03 — top-3 orders per customer: window ranking (nlargest-per-group).
# Deterministic tie-break on o_orderkey (FIXTURES.md rule 2).
# ---------------------------------------------------------------------------
@register(
    "q03_top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rk
  FROM orders
) t
WHERE rk <= 3
""",
)
def q03_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# q04 — per-segment stats: describe()-style multi-agg (dask_cudf describe /
# groupby std/var/nunique).
# ---------------------------------------------------------------------------
@register(
    "q04_segment_stats",
    oracle="""
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  ROUND(AVG(c_acctbal), 6) AS avg_bal,
  ROUND(MIN(c_acctbal), 2) AS min_bal,
  ROUND(MAX(c_acctbal), 2) AS max_bal,
  ROUND(STDDEV_SAMP(c_acctbal), 6) AS std_bal,
  COUNT(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY c_mktsegment
""",
)
def q04_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.stddev_samp("c_acctbal"), 6).alias("std_bal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


# ---------------------------------------------------------------------------
# q05 — string functions (dask_cudf .str accessor: lower/contains/replace/
# split/len — SURVEY §2B B10).
# ---------------------------------------------------------------------------
@register(
    "q05_string_ops",
    oracle="""
SELECT
  p_partkey,
  LOWER(p_name) AS name_lower,
  LENGTH(p_name) AS name_len,
  REPLACE(p_type, ' ', '_') AS type_snake,
  CAST(CONTAINS(p_name, 'a') AS INT) AS has_a,
  SUBSTRING(p_brand, 1, 5) AS brand_prefix,
  UPPER(p_type) AS type_upper
FROM part
WHERE p_size >= 25
""",
)
def q05_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_size") >= 25).select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.col("p_name").contains("a").cast("int").alias("has_a"),
        F.substring("p_brand", 1, 5).alias("brand_prefix"),
        F.upper("p_type").alias("type_upper"),
    )


# ---------------------------------------------------------------------------
# q06 — date functions (dask_cudf .dt accessor — B11): extract + truncate +
# conditional agg per month.
# ---------------------------------------------------------------------------
@register(
    "q06_orders_by_month",
    oracle="""
SELECT
  EXTRACT(YEAR FROM o_orderdate) AS order_year,
  EXTRACT(MONTH FROM o_orderdate) AS order_month,
  COUNT(*) AS n_orders,
  ROUND(SUM(o_totalprice), 2) AS total_price,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_urgent
FROM orders
GROUP BY 1, 2
""",
)
def q06_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("n_urgent"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — null handling: fillna/coalesce/dropna (B12). Fixtures have no nulls,
# so we *create* them with a left join that misses (suppliers with no
# lineitem in a date slice) and then coalesce — exercising the same plan
# shape a fillna pipeline has at scale.
# ---------------------------------------------------------------------------
@register(
    "q07_fillna_left_join",
    oracle="""
SELECT
  s.s_suppkey,
  COALESCE(t.n_items, 0) AS n_items,
  ROUND(COALESCE(t.qty, 0.0), 2) AS qty
FROM supplier s
LEFT JOIN (
  SELECT l_suppkey, COUNT(*) AS n_items, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate < TIMESTAMP '1995-03-01'
  GROUP BY l_suppkey
) t ON s.s_suppkey = t.l_suppkey
""",
)
def q07_fillna_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    agg = (
        l.filter(F.col("l_shipdate") < F.lit("1995-03-01").cast("timestamp_ntz"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum("l_quantity").alias("qty"))
    )
    return s.join(agg, s.s_suppkey == agg.l_suppkey, "left").select(
        "s_suppkey",
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        F.round(F.coalesce("qty", F.lit(0.0)), 2).alias("qty"),
    )


# ---------------------------------------------------------------------------
# q08 — value_counts (B17): frequency of each (returnflag, linestatus).
# ---------------------------------------------------------------------------
@register(
    "q08_value_counts",
    oracle="""
SELECT l_returnflag || '|' || l_linestatus AS combo, COUNT(*) AS n
FROM lineitem
GROUP BY 1
""",
)
def q08_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.concat_ws("|", "l_returnflag", "l_linestatus").alias("combo")
        )
        .groupBy("combo")
        .count()
        .withColumnRenamed("count", "n")
    )


# ---------------------------------------------------------------------------
# q09 — distinct / drop_duplicates (B8) with deterministic keep-min rule.
# ---------------------------------------------------------------------------
@register(
    "q09_drop_duplicates",
    oracle="""
SELECT o_custkey, o_orderstatus, MIN(o_orderkey) AS first_orderkey,
       COUNT(*) AS n_dups
FROM orders
GROUP BY o_custkey, o_orderstatus
""",
)
def q09_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey", "o_orderstatus").agg(
        F.min("o_orderkey").alias("first_orderkey"),
        F.count(F.lit(1)).alias("n_dups"),
    )


# ---------------------------------------------------------------------------
# q10 — set ops: union / intersect / except (B9, C-checklist).
# Customers that bought in 1995 vs 1996: union-all counts both sides,
# intersect finds both-years buyers, except finds 1995-only.
# ---------------------------------------------------------------------------
@register(
    "q10_set_ops",
    oracle="""
WITH y95 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
), y96 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
)
SELECT 'both' AS bucket, COUNT(*) AS n FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96) t
UNION ALL
SELECT 'only95' AS bucket, COUNT(*) AS n FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96) t
UNION ALL
SELECT 'union_all' AS bucket, COUNT(*) AS n FROM (SELECT * FROM y95 UNION ALL SELECT * FROM y96) t
""",
)
def q10_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    only95 = y95.exceptAll(y96).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only95").alias("bucket"), "n"
    )
    union_all = y95.unionByName(y96).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union_all").alias("bucket"), "n"
    )
    return both.unionByName(only95).unionByName(union_all)


# ---------------------------------------------------------------------------
# q11 — rollup (C-checklist grouping sets). NULL group keys coalesced to a
# sentinel so the hash comparison is deterministic across engines.
# ---------------------------------------------------------------------------
@register(
    "q11_rollup",
    oracle="""
SELECT
  COALESCE(l_returnflag, '<all>') AS returnflag,
  COALESCE(l_linestatus, '<all>') AS linestatus,
  COUNT(*) AS n,
  ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# q12 — quantiles / histogram (D10): EXACT median via the two-pass global
# rank (functions/ranking.py) — the k-th/k+1-th order statistics are
# filtered out of the ranked frame and interpolated, so no holistic
# percentile() ObjectHashAggregate ever buffers the full column on one
# reducer (VERDICT r2 "what's wrong" #1). The 100 TB approximate path is
# q86's percentile_approx; this query is the exact-oracle variant and now
# scales the same way the ranking queries do.
# ---------------------------------------------------------------------------
@register(
    "q12_quantiles_histogram",
    oracle="""
WITH pct AS (
  SELECT
    ROUND(QUANTILE_CONT(o_totalprice, 0.25), 6) AS p25,
    ROUND(QUANTILE_CONT(o_totalprice, 0.50), 6) AS p50,
    ROUND(QUANTILE_CONT(o_totalprice, 0.75), 6) AS p75
  FROM orders
)
SELECT
  CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
  COUNT(*) AS n,
  ROUND(MAX(p.p50), 6) AS median_all
FROM orders, pct p
GROUP BY 1
""",
)
def q12_quantiles_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.plans.cost import (
        REUSE_CHECKPOINT_MIN_BYTES,
        plan_size_bytes,
    )

    o = load_table(spark, sf_dir, "orders")
    col = o.select("o_totalprice")
    if plan_size_bytes(col) < REUSE_CHECKPOINT_MIN_BYTES:
        # r16: below the repo's standard 64 MB gate the exact continuous
        # median is ONE JVM percentile aggregate (same 1 + 0.5·(N−1)
        # position + lower + frac·(upper−lower) interpolation as the
        # rank path and both engines' QUANTILE_CONT — guide §2.4 "remove
        # shuffles outright"): no range repartition, no checkpoint, no
        # per-partition-counts collect, no bracketing-rows collect. The
        # rank path below stays the plan once the column outgrows task
        # memory (the exact-percentile aggregate buffers values
        # per-partition, then merges — fine exactly when the column is
        # task-memory-sized). Measured: 1.44 s/10 jobs → 0.48 s/3 jobs.
        p50 = float(
            col.agg(F.percentile("o_totalprice", F.lit(0.5))).collect()[0][0]
        )
    else:
        from dask_cuml_spark.functions.ranking import global_row_number

        ranked, n_rows = global_row_number(
            o.select("o_totalprice", "o_orderkey"),
            [F.col("o_totalprice"), F.col("o_orderkey")],
        )
        # percentile_cont(0.5): continuous position 1 + 0.5·(N−1); pull
        # just the bracketing order statistics (≤2 rows — model-state
        # collect) and interpolate with the same lower + frac·(upper−
        # lower) form both engines use.
        pos = 1 + 0.5 * (n_rows - 1)
        lo, hi = int(pos), int(-(-pos // 1))
        vals = {
            r["_rn"]: r["o_totalprice"]
            for r in ranked.filter(F.col("_rn").isin(lo, hi)).collect()
        }
        p50 = vals[lo] + (pos - lo) * (vals[hi] - vals[lo])
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000.0).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("median_all", F.round(F.lit(p50), 6))
    )


# ---------------------------------------------------------------------------
# q13 — semi / anti join (C-checklist; dedup-against-set pattern at scale).
# ---------------------------------------------------------------------------
@register(
    "q13_semi_anti_join",
    oracle="""
WITH buyers AS (SELECT DISTINCT o_custkey FROM orders)
SELECT 'has_orders' AS bucket, COUNT(*) AS n
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM buyers)
UNION ALL
SELECT 'no_orders' AS bucket, COUNT(*) AS n
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM buyers)
""",
)
def q13_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("has_orders").alias("bucket"), "n")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("no_orders").alias("bucket"), "n")
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# q14 — theta/range join against an inline dimension (C-checklist range
# join). Small side broadcast → BroadcastNestedLoopJoin, the scalable plan.
# ---------------------------------------------------------------------------
@register(
    "q14_range_join_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('cheap', 0.0, 500.0), ('mid', 500.0, 1200.0), ('expensive', 1200.0, 1e12)
)
SELECT b.band AS band, COUNT(*) AS n_parts,
       ROUND(AVG(p.p_retailprice), 6) AS avg_price
FROM part p
JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band
""",
)
def q14_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("cheap", 0.0, 500.0), ("mid", 500.0, 1200.0), ("expensive", 1200.0, 1e12)],
        ["band", "lo", "hi"],
    )
    cond = (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi)
    return (
        p.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# q15 — global top-k with total order (B7 nlargest): TakeOrderedAndProject,
# no full sort at scale.
# ---------------------------------------------------------------------------
@register(
    "q15_global_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def q15_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q16 — projection / cast / conditional column (B3; dask_cudf assign/astype).
# ---------------------------------------------------------------------------
@register(
    "q16_project_cast_case",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CAST(l_quantity AS BIGINT) AS qty_int,
  ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
  CASE WHEN l_discount > 0.05 THEN 'high' ELSE 'low' END AS disc_band
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20
""",
)
def q16_project_cast_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_returnflag") == "R") & F.col("l_quantity").between(10, 20)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("qty_int"),
            # round 6: the product of three ≤2-decimal factors is exact at
            # 6 decimals, so neither engine lands on a rounding half-boundary
            # (round 4 DID mismatch: Spark rounds via BigDecimal HALF_UP,
            # DuckDB via float multiply — they disagree at exact halves).
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                6,
            ).alias("charged"),
            F.when(F.col("l_discount") > 0.05, "high")
            .otherwise("low")
            .alias("disc_band"),
        )
    )


# ---------------------------------------------------------------------------
# q17 — rolling window over ordered partitions (B16; dask_cudf rolling):
# 7-row moving average of a supplier's shipped quantity.
# ---------------------------------------------------------------------------
@register(
    "q17_rolling_avg",
    oracle="""
SELECT
  l_suppkey,
  l_orderkey,
  l_linenumber,
  ROUND(AVG(l_quantity) OVER (
    PARTITION BY l_suppkey
    ORDER BY l_shipdate, l_orderkey, l_linenumber
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
  ), 6) AS qty_ma7
FROM lineitem
WHERE l_suppkey <= 10
""",
)
def q17_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-6, 0)
    )
    return (
        l.filter(F.col("l_suppkey") <= 10)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.avg("l_quantity").over(w), 6).alias("qty_ma7"),
        )
    )


# ---------------------------------------------------------------------------
# q18 — analytic window functions lag/lead/first/last (C-checklist).
# Price delta between a customer's consecutive orders.
# ---------------------------------------------------------------------------
@register(
    "q18_lag_lead",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  ROUND(o_totalprice - LAG(o_totalprice) OVER w, 4) AS delta_prev,
  ROUND(FIRST_VALUE(o_totalprice) OVER w, 4) AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q18_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), 4
        ).alias("delta_prev"),
        F.round(F.first("o_totalprice").over(w), 4).alias("first_price"),
    )
