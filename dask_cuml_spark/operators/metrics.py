"""Model-quality metrics (reference: cuml/metrics + cuml/dask/metrics;
SURVEY.md §2A A19). All are single aggregates / small groupBys — no
driver-side iteration over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def accuracy(df: DataFrame, label_col: str, pred_col: str) -> float:
    row = df.agg(
        F.avg(
            F.when(F.col(label_col) == F.col(pred_col), 1.0).otherwise(0.0)
        ).alias("acc")
    ).collect()[0]
    return float(row["acc"])


def mse(df: DataFrame, label_col: str, pred_col: str) -> float:
    d = F.col(label_col) - F.col(pred_col)
    return float(df.agg(F.avg(d * d).alias("mse")).collect()[0]["mse"])


def mae(df: DataFrame, label_col: str, pred_col: str) -> float:
    return float(
        df.agg(
            F.avg(F.abs(F.col(label_col) - F.col(pred_col))).alias("mae")
        ).collect()[0]["mae"]
    )


def r2_score(df: DataFrame, label_col: str, pred_col: str) -> float:
    """1 - SS_res/SS_tot computed in one pass from sum leaves."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col)).alias("sy"),
        F.sum(F.col(label_col) * F.col(label_col)).alias("syy"),
        F.sum(
            (F.col(label_col) - F.col(pred_col))
            * (F.col(label_col) - F.col(pred_col))
        ).alias("ss_res"),
    ).collect()[0]
    ss_tot = row["syy"] - row["sy"] * row["sy"] / row["n"]
    return float(1.0 - row["ss_res"] / ss_tot)


def confusion_matrix(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    return df.groupBy(
        F.col(label_col).alias("actual"), F.col(pred_col).alias("predicted")
    ).agg(F.count(F.lit(1)).alias("n"))
