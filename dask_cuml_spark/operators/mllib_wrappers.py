"""MLlib-backed estimators for the iterative reference surface
(SURVEY.md §2A): LogisticRegression (A7), RandomForest (A9),
KMeans-via-MLlib (A1 parity path), Lasso/ElasticNet (A8).

The reference runs these as per-GPU kernels + parameter allreduce; MLlib
implements the identical math with treeAggregate over partitions — the
same collective, Spark-native (SURVEY §3.1). These wrappers pin the
engine's conventions: array<float> columns in, prediction column out,
seeded determinism for tests; MLlib's VectorUDT stays an internal detail.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.ml.classification import (
    LogisticRegression as MLLogisticRegression,
    RandomForestClassifier as MLRandomForestClassifier,
)
from pyspark.ml.clustering import KMeans as MLKMeans
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.regression import (
    LinearRegression as MLLinearRegression,
    RandomForestRegressor as MLRandomForestRegressor,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_vector(df: DataFrame, array_col: str) -> DataFrame:
    return df.withColumn("_features", array_to_vector(F.col(array_col)))


def _assemble(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.withColumn(
        "_features",
        array_to_vector(F.array(*[F.col(c).cast("double") for c in cols])),
    )


@dataclass
class LogisticRegressionWrapper:
    """A7: cuml.dask LogisticRegression ≈ MLlib LBFGS logistic."""

    max_iter: int = 50
    reg_param: float = 0.0
    model_: Any = field(default=None, init=False)
    feature_cols_: list[str] = field(default_factory=list, init=False)

    def fit(self, df: DataFrame, feature_cols: list[str], label_col: str):
        train = _assemble(df, feature_cols).withColumn(
            "_label", F.col(label_col).cast("double")
        )
        self.model_ = MLLogisticRegression(
            featuresCol="_features",
            labelCol="_label",
            maxIter=self.max_iter,
            regParam=self.reg_param,
        ).fit(train)
        self.feature_cols_ = list(feature_cols)
        return self

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        scored = self.model_.transform(_assemble(df, self.feature_cols_))
        return scored.withColumn(
            output_col, F.col("prediction").cast("int")
        ).drop("_features", "rawPrediction", "probability")


@dataclass
class RandomForestWrapper:
    """A9: embarrassingly-parallel per-tree fit — MLlib trains trees over
    bootstrap partitions the same way cuml.dask does per-GPU."""

    task: str = "classification"
    num_trees: int = 20
    max_depth: int = 5
    seed: int = 42
    model_: Any = field(default=None, init=False)
    feature_cols_: list[str] = field(default_factory=list, init=False)

    def fit(self, df: DataFrame, feature_cols: list[str], label_col: str):
        train = _assemble(df, feature_cols).withColumn(
            "_label", F.col(label_col).cast("double")
        )
        cls = (
            MLRandomForestClassifier
            if self.task == "classification"
            else MLRandomForestRegressor
        )
        self.model_ = cls(
            featuresCol="_features",
            labelCol="_label",
            numTrees=self.num_trees,
            maxDepth=self.max_depth,
            seed=self.seed,
        ).fit(train)
        self.feature_cols_ = list(feature_cols)
        return self

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        scored = self.model_.transform(_assemble(df, self.feature_cols_))
        keep = [c for c in scored.columns if not c.startswith("_") and c not in
                ("rawPrediction", "probability", "prediction")]
        return scored.select(*keep, F.col("prediction").alias(output_col))


@dataclass
class ElasticNetWrapper:
    """A8: Lasso (l1_ratio=1) / ElasticNet via MLlib coordinate descent —
    same objective as cuml.dask lasso/elastic_net."""

    alpha: float = 0.1
    l1_ratio: float = 0.5
    max_iter: int = 100
    # standardization=False keeps the penalty in RAW feature space, which
    # makes the optimality invariant provable (q94): the fitted solution
    # minimizes RSS/(2n) + α(ρ‖w‖₁ + (1−ρ)/2‖w‖₂²), so ANY other coef
    # vector — e.g. the OLS solution — scores a ≥ objective.
    standardization: bool = True
    model_: Any = field(default=None, init=False)
    feature_cols_: list[str] = field(default_factory=list, init=False)

    def fit(self, df: DataFrame, feature_cols: list[str], label_col: str):
        train = _assemble(df, feature_cols).withColumn(
            "_label", F.col(label_col).cast("double")
        )
        self.model_ = MLLinearRegression(
            featuresCol="_features",
            labelCol="_label",
            maxIter=self.max_iter,
            regParam=self.alpha,
            elasticNetParam=self.l1_ratio,
            standardization=self.standardization,
        ).fit(train)
        self.feature_cols_ = list(feature_cols)
        return self

    @property
    def coef_(self):
        return self.model_.coefficients.toArray()

    @property
    def intercept_(self) -> float:
        return float(self.model_.intercept)


@dataclass
class KMeansMLlib:
    """A1 parity path: MLlib KMeans (k-means|| init + treeAggregate
    Lloyd) on an array column. Cross-check for operators/kmeans.KMeans."""

    k: int = 10
    max_iter: int = 20
    seed: int = 42
    model_: Any = field(default=None, init=False)

    def fit(self, df: DataFrame, vec_col: str = "embedding"):
        train = _with_vector(df, vec_col)
        self.model_ = MLKMeans(
            featuresCol="_features", k=self.k, maxIter=self.max_iter,
            seed=self.seed,
        ).fit(train)
        return self

    @property
    def cluster_centers_(self):
        import numpy as np

        return np.array([c.toArray() for c in self.model_.clusterCenters()])

    def predict(self, df: DataFrame, vec_col: str = "embedding",
                output_col: str = "cluster") -> DataFrame:
        scored = self.model_.transform(_with_vector(df, vec_col))
        return scored.withColumn(output_col, F.col("prediction")).drop(
            "_features", "prediction"
        )


def vector_roundtrip(df: DataFrame, array_col: str) -> DataFrame:
    """B20 matrix bridge: array<float> ↔ MLlib vector round-trip."""
    return df.withColumn(
        array_col + "_rt",
        vector_to_array(array_to_vector(F.col(array_col))).cast(
            "array<float>"
        ),
    )
