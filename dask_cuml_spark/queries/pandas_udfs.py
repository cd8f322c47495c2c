"""Pandas-UDF substrate (SURVEY.md §2B B13/B14/B15): the dask_cudf
map_partitions / groupby().apply / grouped custom aggregation trio, as
Arrow-batched Spark equivalents — mapInPandas, applyInPandas, and a
GROUPED_AGG pandas_udf. Each is SQL-oracled by re-expressing the Python
logic relationally, so the driver's strong check covers the UDF path too.

Also: iterative fits (full KMeans, DBSCAN) declared as rows-only queries
— the driver's weaker gate — with their numeric parity pytest-checked
against numpy (tests/test_operators.py, tests/test_ml_estimators.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dask_cuml_spark.io import load_table
from dask_cuml_spark.registry import register


# ---------------------------------------------------------------------------
# q72 — map_partitions (B13): per-batch pandas transform, the
# dask_cudf.map_partitions(fn) shape. Arithmetic is IEEE-identical to the
# SQL expression, so the oracle is exact.
# ---------------------------------------------------------------------------
@register(
    "q72_map_partitions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 6) AS net_price,
       CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'retail' END AS order_kind
FROM lineitem
WHERE l_partkey % 10 = 0
""",
)
def q72_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 10 == 0
    )
    schema = StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_linenumber", l.schema["l_linenumber"].dataType),
            StructField("net_price", DoubleType()),
            StructField("order_kind", StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    "net_price": (
                        pdf["l_extendedprice"] * (1 - pdf["l_discount"])
                    ).round(6),
                    "order_kind": pd.Series(
                        ["bulk" if q >= 25 else "retail" for q in pdf["l_quantity"]]
                    ),
                }
            )
            yield out

    return l.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity"
    ).mapInPandas(fn, schema)


# ---------------------------------------------------------------------------
# q73 — groupby().apply grouped map (B14): per-group z-normalization via
# applyInPandas — the canonical dask_cudf/SNIPPETS grouped-map pattern.
# Oracle re-expresses it as window aggregates.
# ---------------------------------------------------------------------------
@register(
    "q73_grouped_normalize",
    oracle="""
SELECT c_custkey, c_mktsegment,
       ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_mktsegment), 6)
         AS bal_z
FROM customer
""",
)
def q73_grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_mktsegment", StringType()),
            StructField("bal_z", DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["c_acctbal"]
        # ddof=1 == STDDEV_SAMP; mean/std in float64 like the SQL side
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_z": ((v - v.mean()) / v.std(ddof=1)).round(6),
            }
        )

    return (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(normalize, schema)
    )


# ---------------------------------------------------------------------------
# q74 — grouped custom aggregation (B15): GROUPED_AGG pandas_udf
# (discount-weighted mean price per returnflag). Oracle = the same
# weighted mean in SQL.
# ---------------------------------------------------------------------------
@register(
    "q74_grouped_agg_udf",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_discount) / SUM(l_discount), 6)
         AS disc_weighted_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q74_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    l = load_table(spark, sf_dir, "lineitem")

    @pandas_udf("double")
    def wmean(price: pd.Series, disc: pd.Series) -> float:
        # plain float64 sums — same accumulation the SQL oracle performs
        return float((price * disc).sum() / disc.sum())

    return l.groupBy("l_returnflag").agg(
        F.round(wmean("l_extendedprice", "l_discount"), 6).alias(
            "disc_weighted_price"
        )
    )


# ---------------------------------------------------------------------------
# q75 — pivot (dask_cudf/cuDF pivot; value_counts matrix form): manual
# conditional-agg pivot keeps it engine-portable and shuffle-minimal.
# ---------------------------------------------------------------------------
@register(
    "q75_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_F,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_O
FROM lineitem
GROUP BY l_returnflag
""",
)
def q75_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_F"),
        F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias("n_O"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)),
            2,
        ).alias("qty_F"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)),
            2,
        ).alias("qty_O"),
    )


# ---------------------------------------------------------------------------
# q76 — full KMeans fit (A1, iterative — rows-only driver check; numpy
# parity in tests/test_operators.py): 3 deterministic Lloyd iterations
# from first-k init, centroids dim-exploded.
# ---------------------------------------------------------------------------
@register("q76_kmeans_fit")  # no oracle: iterative, rows-only
def q76_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.operators.kmeans import KMeans

    e = load_table(spark, sf_dir, "embeddings")
    model = KMeans(k=8, max_iter=3, tol=0.0).fit(e)
    rows = [
        (cid, pos, float(v))
        for cid, center in enumerate(model.cluster_centers_)
        for pos, v in enumerate(center)
    ]
    return spark.createDataFrame(rows, ["centroid_id", "pos", "center_val"])


# ---------------------------------------------------------------------------
# q77 — DBSCAN (A13, iterative CC — rows-only driver check; blob-recovery
# test in tests/test_ml_estimators.py).
# ---------------------------------------------------------------------------
@register("q77_dbscan")  # no oracle: iterative label propagation
def q77_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.operators.dbscan import dbscan

    e = load_table(spark, sf_dir, "embeddings")
    # eps=1.18 on unit-norm near-orthogonal vectors (pair distances
    # concentrate ~sqrt(2)): keeps the ~1% closest-pair tail, so the
    # neighbor graph stays sparse (eps=1.40 admitted ~44% of all pairs
    # and label propagation dominated the runtime).
    return dbscan(e, eps=1.18, min_pts=3)


# ---------------------------------------------------------------------------
# q78 — MinHash-LSH near-dup (D2, hash-seed-specific — rows-only driver
# check; golden-set test in tests/test_operators.py).
# ---------------------------------------------------------------------------
@register("q78_minhash_near_dup")  # no oracle: xxhash64 signatures
def q78_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.operators.dedup import minhash_near_dup

    d = load_table(spark, sf_dir, "documents")
    return minhash_near_dup(d, n=3, num_hashes=16, bands=4, threshold=0.5)


# ---------------------------------------------------------------------------
# q82 — LSH approximate kNN (A4 scale path — rows-only; recall +
# determinism pytest-checked in tests/test_operators.py).
# ---------------------------------------------------------------------------
@register("q82_lsh_knn")  # no oracle: approximate by design
def q82_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.operators.knn import lsh_knn

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    return lsh_knn(q, c, dim=64, k=5, n_planes=6, n_tables=4)


# ---------------------------------------------------------------------------
# q83 — LogisticRegression predict (A7, LBFGS-iterative — rows-only;
# accuracy pytest-checked in tests/test_ml_estimators.py): binary target
# returnflag=='R' from lineitem numerics, seeded fit, class counts out.
# ---------------------------------------------------------------------------
@register("q83_logreg_predict")  # no oracle: iterative LBFGS fit
def q83_logreg_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_cuml_spark.operators.mllib_wrappers import (
        LogisticRegressionWrapper,
    )

    l = load_table(spark, sf_dir, "lineitem").withColumn(
        "is_return", (F.col("l_returnflag") == "R").cast("int")
    )
    model = LogisticRegressionWrapper(max_iter=20).fit(
        l, ["l_quantity", "l_discount", "l_tax"], "is_return"
    )
    scored = model.predict(l)
    return scored.groupBy("is_return", "prediction").agg(
        F.count(F.lit(1)).alias("n")
    )
