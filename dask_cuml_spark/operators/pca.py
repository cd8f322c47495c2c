"""PCA / TruncatedSVD (reference successor surface: cuml/dask/
decomposition/{pca,tsvd}.py — distributed covariance + local eigendecomp;
SURVEY.md §2A A6).

Spark-first: the covariance matrix is one aggregate over k(k+1)/2
sum(xi*xj) leaves (the same Gram pass as linear.py); the k×k eigendecomp
runs on the driver (model state). transform() is a matrix of column
expressions — scoring never leaves codegen.

Sign convention: each component is flipped so its largest-|.| loading is
positive (sklearn-style svd_flip) — removes the eigenvector sign
indeterminacy the oracle strategy warns about (SURVEY §2A A6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCA:
    n_components: int = 2
    components_: np.ndarray | None = field(default=None, init=False)
    explained_variance_: np.ndarray | None = field(default=None, init=False)
    mean_: np.ndarray | None = field(default=None, init=False)
    feature_cols_: list[str] = field(default_factory=list, init=False)

    def fit(self, df: DataFrame, feature_cols: list[str]) -> "PCA":
        k = len(feature_cols)
        aggs = [F.count(F.lit(1)).alias("n")]
        for i in range(k):
            aggs.append(F.sum(F.col(feature_cols[i])).alias(f"s_{i}"))
            for j in range(i, k):
                aggs.append(
                    F.sum(
                        F.col(feature_cols[i]) * F.col(feature_cols[j])
                    ).alias(f"g_{i}_{j}")
                )
        row = df.agg(*aggs).collect()[0]
        n = float(row["n"])
        mean = np.array([row[f"s_{i}"] / n for i in range(k)])
        cov = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                # sample covariance from raw sums
                cij = (row[f"g_{i}_{j}"] - n * mean[i] * mean[j]) / (n - 1)
                cov[i, j] = cov[j, i] = cij
        vals, vecs = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][: self.n_components]
        comps = vecs[:, order].T
        # deterministic sign: largest-|loading| positive per component
        for c in comps:
            if c[np.argmax(np.abs(c))] < 0:
                c *= -1
        self.components_ = comps
        self.explained_variance_ = vals[order]
        self.mean_ = mean
        self.feature_cols_ = list(feature_cols)
        return self

    def transform(self, df: DataFrame, prefix: str = "pc") -> DataFrame:
        assert self.components_ is not None, "call fit() first"
        out = df
        for c_idx, comp in enumerate(self.components_):
            expr = F.lit(0.0)
            for f_idx, col in enumerate(self.feature_cols_):
                expr = expr + (F.col(col) - float(self.mean_[f_idx])) * float(
                    comp[f_idx]
                )
            out = out.withColumn(f"{prefix}{c_idx}", expr)
        return out


@dataclass
class TruncatedSVD:
    """TruncatedSVD (A6 second half: cuml/dask/decomposition/tsvd.py) —
    PCA without centering: eigendecomposition of the raw second-moment
    matrix XᵀX/n. Same one-pass Gram aggregate, same driver-side solve,
    same sign convention."""

    n_components: int = 2
    components_: np.ndarray | None = field(default=None, init=False)
    explained_variance_: np.ndarray | None = field(default=None, init=False)
    feature_cols_: list[str] = field(default_factory=list, init=False)

    def fit(self, df: DataFrame, feature_cols: list[str]) -> "TruncatedSVD":
        k = len(feature_cols)
        aggs = [F.count(F.lit(1)).alias("n")]
        for i in range(k):
            for j in range(i, k):
                aggs.append(
                    F.sum(
                        F.col(feature_cols[i]) * F.col(feature_cols[j])
                    ).alias(f"g_{i}_{j}")
                )
        row = df.agg(*aggs).collect()[0]
        n = float(row["n"])
        gram = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                gram[i, j] = gram[j, i] = row[f"g_{i}_{j}"] / n
        vals, vecs = np.linalg.eigh(gram)
        order = np.argsort(vals)[::-1][: self.n_components]
        comps = vecs[:, order].T
        for c in comps:
            if c[np.argmax(np.abs(c))] < 0:
                c *= -1
        self.components_ = comps
        self.explained_variance_ = vals[order]
        self.feature_cols_ = list(feature_cols)
        return self

    def transform(self, df: DataFrame, prefix: str = "sv") -> DataFrame:
        assert self.components_ is not None, "call fit() first"
        out = df
        for c_idx, comp in enumerate(self.components_):
            expr = F.lit(0.0)
            for f_idx, col in enumerate(self.feature_cols_):
                expr = expr + F.col(col) * float(comp[f_idx])
            out = out.withColumn(f"{prefix}{c_idx}", expr)
        return out
