"""Statistics + linear-model operators (SURVEY.md §2A A2/A3/A6/A16/A19):
feature stats, OLS via normal equations, ridge closed form, scalers,
correlation/covariance matrices, classification metrics.

Reference parity: dask_cuml/linear_model/{linear_regression,ridge}.py —
per-worker XᵀX / Xᵀy partials + allreduce + rank-0 solve [SURVEY §3.3].
Spark-first: the partials+allreduce IS one partial+final aggregate; only
the O(k²) solve happens on the driver (operators/linear.py). The queries
here are the SQL-oracled aggregate stages; the iterative/solve paths are
pytest-checked against numpy.

Determinism: every derived statistic is computed from sum/count leaves
with the SAME arithmetic expression in Spark and DuckDB, then rounded to
6 decimals on both sides (FIXTURES.md rule 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_cuml_spark.io import load_table
from dask_cuml_spark.registry import register


# ---------------------------------------------------------------------------
# q50 — global feature stats (A16/A19 substrate; dask_cudf describe):
# one pass, 8 aggregates.
# ---------------------------------------------------------------------------
@register(
    "q50_feature_stats",
    oracle="""
SELECT
  COUNT(*) AS n,
  ROUND(AVG(l_quantity), 6) AS avg_qty,
  ROUND(STDDEV_SAMP(l_quantity), 6) AS std_qty,
  ROUND(MIN(l_quantity), 6) AS min_qty,
  ROUND(MAX(l_quantity), 6) AS max_qty,
  ROUND(AVG(l_extendedprice), 6) AS avg_price,
  ROUND(STDDEV_SAMP(l_extendedprice), 6) AS std_price,
  COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
""",
)
def q50_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.min("l_quantity"), 6).alias("min_qty"),
        F.round(F.max("l_quantity"), 6).alias("max_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("std_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# q51 — OLS 1-feature fit (A2): slope/intercept/r² from the five sum
# leaves, identical closed-form expression on both engines. This is the
# entire LinearRegression.fit as one aggregate + scalar math — the
# reference's allreduce+solve (SURVEY §3.3) with k=1.
# ---------------------------------------------------------------------------
@register(
    "q51_ols_fit",
    oracle="""
WITH s AS (
  SELECT
    CAST(COUNT(*) AS DOUBLE) AS n,
    SUM(l_quantity) AS sx,
    SUM(l_extendedprice) AS sy,
    SUM(l_quantity * l_quantity) AS sxx,
    SUM(l_quantity * l_extendedprice) AS sxy,
    SUM(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem
)
SELECT
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
    AS intercept,
  ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
""",
)
def q51_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = l.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("l_quantity").alias("sx"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
        F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# q52 — ridge 1-feature closed form (A3): centered sums,
# slope = Sxy_c / (Sxx_c + alpha); same leaves as q51.
# ---------------------------------------------------------------------------
@register(
    "q52_ridge_fit",
    oracle="""
WITH s AS (
  SELECT
    CAST(COUNT(*) AS DOUBLE) AS n,
    SUM(l_quantity) AS sx,
    SUM(l_extendedprice) AS sy,
    SUM(l_quantity * l_quantity) AS sxx,
    SUM(l_quantity * l_extendedprice) AS sxy
  FROM lineitem
)
SELECT
  ROUND((sxy - sx * sy / n) / ((sxx - sx * sx / n) + 10.0), 6)
    AS ridge_slope,
  ROUND(sy / n - (sxy - sx * sy / n) / ((sxx - sx * sx / n) + 10.0)
        * (sx / n), 6) AS ridge_intercept
FROM s
""",
)
def q52_ridge_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = l.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("l_quantity").alias("sx"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (sxy - sx * sy / n) / ((sxx - sx * sx / n) + 10.0)
    return s.select(
        F.round(slope, 6).alias("ridge_slope"),
        F.round(sy / n - slope * (sx / n), 6).alias("ridge_intercept"),
    )


# ---------------------------------------------------------------------------
# q53 — standard scaler (A16): z = (x - mean) / std over customers; the
# global stats broadcast back onto every row (reference: transform with
# fitted mean_/scale_).
# ---------------------------------------------------------------------------
@register(
    "q53_standard_scaler",
    oracle="""
WITH s AS (
  SELECT AVG(c_acctbal) AS mu, STDDEV_SAMP(c_acctbal) AS sigma FROM customer
)
SELECT c_custkey, ROUND((c_acctbal - s.mu) / s.sigma, 6) AS acctbal_z
FROM customer, s
""",
)
def q53_standard_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = c.agg(
        F.avg("c_acctbal").alias("mu"),
        F.stddev_samp("c_acctbal").alias("sigma"),
    )
    return c.crossJoin(F.broadcast(s)).select(
        "c_custkey",
        F.round((F.col("c_acctbal") - F.col("mu")) / F.col("sigma"), 6).alias(
            "acctbal_z"
        ),
    )


# ---------------------------------------------------------------------------
# q54 — min-max scaler (A16).
# ---------------------------------------------------------------------------
@register(
    "q54_minmax_scaler",
    oracle="""
WITH s AS (
  SELECT MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi FROM customer
)
SELECT c_custkey, ROUND((c_acctbal - s.lo) / (s.hi - s.lo), 6) AS acctbal_01
FROM customer, s
""",
)
def q54_minmax_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = c.agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
    return c.crossJoin(F.broadcast(s)).select(
        "c_custkey",
        F.round(
            (F.col("c_acctbal") - F.col("lo")) / (F.col("hi") - F.col("lo")), 6
        ).alias("acctbal_01"),
    )


# ---------------------------------------------------------------------------
# q55 — correlation + covariance matrix (A6 feeder / A19): pairwise over
# 4 lineitem features, single-row aggregate (the k×k Gram-style stats the
# PCA path consumes).
# ---------------------------------------------------------------------------
@register(
    "q55_corr_cov_matrix",
    oracle="""
SELECT
  ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  ROUND(CORR(l_quantity, l_discount), 6) AS corr_qty_disc,
  ROUND(CORR(l_quantity, l_tax), 6) AS corr_qty_tax,
  ROUND(CORR(l_extendedprice, l_discount), 6) AS corr_price_disc,
  ROUND(CORR(l_extendedprice, l_tax), 6) AS corr_price_tax,
  ROUND(CORR(l_discount, l_tax), 6) AS corr_disc_tax,
  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS cov_qty_price,
  ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
  ROUND(VAR_SAMP(l_discount), 8) AS var_disc
FROM lineitem
""",
)
def q55_corr_cov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("corr_qty_tax"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias(
            "corr_price_disc"
        ),
        F.round(F.corr("l_extendedprice", "l_tax"), 6).alias("corr_price_tax"),
        F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_disc_tax"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "cov_qty_price"
        ),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
    )


# ---------------------------------------------------------------------------
# q56 — confusion matrix (A19): deterministic synthetic prediction
# (vec_id mod 10) vs actual label over embeddings.
# ---------------------------------------------------------------------------
@register(
    "q56_confusion_matrix",
    oracle="""
SELECT label AS actual, CAST(vec_id % 10 AS INT) AS predicted, COUNT(*) AS n
FROM embeddings
GROUP BY label, CAST(vec_id % 10 AS INT)
""",
)
def q56_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy(
        F.col("label").alias("actual"),
        (F.col("vec_id") % 10).cast("int").alias("predicted"),
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# q57 — classification/regression metrics (A19): accuracy + MSE/MAE of a
# deterministic predictor, all plain aggregates.
# ---------------------------------------------------------------------------
@register(
    "q57_metrics",
    oracle="""
WITH s AS (
  SELECT AVG(o_totalprice) AS mu FROM orders
)
SELECT
  ROUND(AVG(CASE WHEN (o_orderkey % 3) = 0 THEN 1.0 ELSE 0.0 END), 6)
    AS frac_pred_pos,
  ROUND(AVG((o_totalprice - s.mu) * (o_totalprice - s.mu)), 2) AS mse_mean_model,
  ROUND(AVG(ABS(o_totalprice - s.mu)), 6) AS mae_mean_model
FROM orders, s
""",
)
def q57_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = o.agg(F.avg("o_totalprice").alias("mu"))
    j = o.crossJoin(F.broadcast(s))
    return j.agg(
        F.round(
            F.avg(F.when(F.col("o_orderkey") % 3 == 0, 1.0).otherwise(0.0)), 6
        ).alias("frac_pred_pos"),
        F.round(
            F.avg(
                (F.col("o_totalprice") - F.col("mu"))
                * (F.col("o_totalprice") - F.col("mu"))
            ),
            2,
        ).alias("mse_mean_model"),
        F.round(F.avg(F.abs(F.col("o_totalprice") - F.col("mu"))), 6).alias(
            "mae_mean_model"
        ),
    )


# ---------------------------------------------------------------------------
# q58 — XᵀX / Xᵀy aggregates for k-feature OLS (A2 k>1): the distributed
# stage of the normal-equations fit, long-format Gram matrix. The driver
# solve lives in operators/linear.py (pytest vs numpy).
# ---------------------------------------------------------------------------
@register(
    "q58_gram_matrix",
    oracle="""
SELECT
  ROUND(SUM(l_quantity * l_quantity), 4) AS g_qq,
  ROUND(SUM(l_quantity * l_discount), 6) AS g_qd,
  ROUND(SUM(l_quantity * l_tax), 6) AS g_qt,
  ROUND(SUM(l_discount * l_discount), 6) AS g_dd,
  ROUND(SUM(l_discount * l_tax), 6) AS g_dt,
  ROUND(SUM(l_tax * l_tax), 6) AS g_tt,
  ROUND(SUM(l_quantity), 4) AS s_q,
  ROUND(SUM(l_discount), 6) AS s_d,
  ROUND(SUM(l_tax), 6) AS s_t,
  ROUND(SUM(l_quantity * l_extendedprice), 2) AS xy_q,
  ROUND(SUM(l_discount * l_extendedprice), 4) AS xy_d,
  ROUND(SUM(l_tax * l_extendedprice), 4) AS xy_t,
  ROUND(SUM(l_extendedprice), 2) AS s_y,
  COUNT(*) AS n
FROM lineitem
""",
)
def q58_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    q, d, t, y = (
        F.col("l_quantity"),
        F.col("l_discount"),
        F.col("l_tax"),
        F.col("l_extendedprice"),
    )
    return l.agg(
        F.round(F.sum(q * q), 4).alias("g_qq"),
        F.round(F.sum(q * d), 6).alias("g_qd"),
        F.round(F.sum(q * t), 6).alias("g_qt"),
        F.round(F.sum(d * d), 6).alias("g_dd"),
        F.round(F.sum(d * t), 6).alias("g_dt"),
        F.round(F.sum(t * t), 6).alias("g_tt"),
        F.round(F.sum(q), 4).alias("s_q"),
        F.round(F.sum(d), 6).alias("s_d"),
        F.round(F.sum(t), 6).alias("s_t"),
        F.round(F.sum(q * y), 2).alias("xy_q"),
        F.round(F.sum(d * y), 4).alias("xy_d"),
        F.round(F.sum(t * y), 4).alias("xy_t"),
        F.round(F.sum(y), 2).alias("s_y"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q59 — OLS fit → predict end-to-end (A2 predict): closed-form parameters
# from the sum leaves, then per-row scoring + residual — the entire
# fit+transform pipeline as one SQL-checkable dataflow.
# ---------------------------------------------------------------------------
@register(
    "q59_ols_predict",
    oracle="""
WITH s AS (
  SELECT
    CAST(COUNT(*) AS DOUBLE) AS n,
    SUM(l_quantity) AS sx,
    SUM(l_extendedprice) AS sy,
    SUM(l_quantity * l_quantity) AS sxx,
    SUM(l_quantity * l_extendedprice) AS sxy
  FROM lineitem
), params AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS icept
  FROM s
)
SELECT l_orderkey, l_linenumber,
       ROUND(p.icept + p.slope * l_quantity, 4) AS pred,
       ROUND(l_extendedprice - (p.icept + p.slope * l_quantity), 4) AS resid
FROM lineitem, params p
WHERE l_orderkey % 100 = 0
""",
)
def q59_ols_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = l.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("l_quantity").alias("sx"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    params = s.select(
        slope.alias("slope"), ((sy - slope * sx) / n).alias("icept")
    )
    pred = F.col("icept") + F.col("slope") * F.col("l_quantity")
    return (
        l.filter(F.col("l_orderkey") % 100 == 0)
        .crossJoin(F.broadcast(params))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(pred, 4).alias("pred"),
            F.round(F.col("l_extendedprice") - pred, 4).alias("resid"),
        )
    )
