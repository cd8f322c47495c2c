"""Linear models (reference surface: dask_cuml/linear_model/
linear_regression.py, ridge.py — OLS via normal equations, per-worker
XᵀX/Xᵀy partials + allreduce + rank-0 solve; SURVEY.md §2A A2/A3, §3.3).

Spark-first translation: the partials+allreduce is ONE partial+final
aggregate over sum(xi*xj) / sum(xi*y) terms — a single job with no
iteration, shuffling only k(k+3)/2 doubles. The O(k²) solve runs on the
driver in numpy (model state, never data). predict() is a pure column
expression (no UDF), so scoring 100 TB stays in whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_aggregate(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> tuple[np.ndarray, np.ndarray, float]:
    """One distributed pass: returns (XᵀX, Xᵀy, n) for X augmented with
    the intercept column of ones (last position)."""
    k = len(feature_cols)
    aggs: list[Column] = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(
                F.sum(F.col(feature_cols[i]) * F.col(feature_cols[j])).alias(
                    f"g_{i}_{j}"
                )
            )
    for i in range(k):
        aggs.append(F.sum(F.col(feature_cols[i])).alias(f"s_{i}"))
        aggs.append(
            F.sum(F.col(feature_cols[i]) * F.col(label_col)).alias(f"xy_{i}")
        )
    aggs.append(F.sum(F.col(label_col)).alias("s_y"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = df.agg(*aggs).collect()[0]

    n = float(row["n"])
    xtx = np.zeros((k + 1, k + 1))
    xty = np.zeros(k + 1)
    for i in range(k):
        for j in range(i, k):
            xtx[i, j] = xtx[j, i] = row[f"g_{i}_{j}"]
        xtx[i, k] = xtx[k, i] = row[f"s_{i}"]
        xty[i] = row[f"xy_{i}"]
    xtx[k, k] = n
    xty[k] = row["s_y"]
    return xtx, xty, n


@dataclass
class LinearRegression:
    """OLS via normal equations (reference default solver 'eig';
    dask_cuml/linear_model/linear_regression.py)."""

    fit_intercept: bool = True
    coef_: np.ndarray | None = field(default=None, init=False)
    intercept_: float = field(default=0.0, init=False)
    feature_cols_: list[str] = field(default_factory=list, init=False)

    def fit(
        self, df: DataFrame, feature_cols: list[str], label_col: str
    ) -> "LinearRegression":
        xtx, xty, _ = _gram_aggregate(df, feature_cols, label_col)
        if not self.fit_intercept:
            xtx, xty = xtx[:-1, :-1], xty[:-1]
        beta = np.linalg.solve(xtx, xty)
        if self.fit_intercept:
            self.coef_, self.intercept_ = beta[:-1], float(beta[-1])
        else:
            self.coef_, self.intercept_ = beta, 0.0
        self.feature_cols_ = list(feature_cols)
        return self

    def predict_expr(self) -> Column:
        """Prediction as a codegen-able column expression."""
        assert self.coef_ is not None, "call fit() first"
        expr: Column = F.lit(float(self.intercept_))
        for c, w in zip(self.feature_cols_, self.coef_):
            expr = expr + F.col(c) * float(w)
        return expr

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        return df.withColumn(output_col, self.predict_expr())


@dataclass
class Ridge:
    """L2-regularized OLS, closed form (XᵀX + αI)⁻¹Xᵀy with the intercept
    left unpenalized (reference: dask_cuml/linear_model/ridge.py, solver
    'eig'/'svd' — same closed form)."""

    alpha: float = 1.0
    fit_intercept: bool = True
    coef_: np.ndarray | None = field(default=None, init=False)
    intercept_: float = field(default=0.0, init=False)
    feature_cols_: list[str] = field(default_factory=list, init=False)

    def fit(self, df: DataFrame, feature_cols: list[str], label_col: str) -> "Ridge":
        xtx, xty, _ = _gram_aggregate(df, feature_cols, label_col)
        k = len(feature_cols)
        reg = np.eye(k + 1) * self.alpha
        reg[k, k] = 0.0  # don't penalize intercept
        if not self.fit_intercept:
            xtx, xty, reg = xtx[:-1, :-1], xty[:-1], reg[:-1, :-1]
        beta = np.linalg.solve(xtx + reg, xty)
        if self.fit_intercept:
            self.coef_, self.intercept_ = beta[:-1], float(beta[-1])
        else:
            self.coef_, self.intercept_ = beta, 0.0
        self.feature_cols_ = list(feature_cols)
        return self

    predict_expr = LinearRegression.predict_expr
    predict = LinearRegression.predict
