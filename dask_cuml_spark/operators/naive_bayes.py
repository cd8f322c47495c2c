"""MultinomialNB (reference successor: cuml/dask/naive_bayes/
naive_bayes.py; SURVEY.md §2A A11): fit = per-class token-count
aggregates + smoothed log-likelihoods (the SQL-oracled q36), predict =
argmax over class scores via a token join — everything relational.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hashing_tf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 256,
) -> DataFrame:
    """HashingVectorizer / HashingTF (SURVEY §2A A14): term → bucket via
    xxhash64 mod N, counts per (doc, bucket). Long format — the sparse
    representation that scales (wide arrays don't). Deterministic given
    Spark's xxhash64; cross-engine oracle not possible (hash differs), so
    this is pytest-checked."""
    tok = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    return (
        tok.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(num_features))
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@dataclass
class MultinomialNB:
    alpha: float = 1.0
    model_: DataFrame | None = field(default=None, init=False)  # (class, term, loglik)
    priors_: DataFrame | None = field(default=None, init=False)  # (class, log_prior)

    def fit(
        self,
        df: DataFrame,
        text_col: str = "text",
        class_col: str = "lang",
        id_col: str = "doc_id",
    ) -> "MultinomialNB":
        tok = df.select(
            F.col(class_col).alias("cls"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        class_term = tok.groupBy("cls", "term").agg(
            F.count(F.lit(1)).alias("n_wc")
        )
        class_tot = tok.groupBy("cls").agg(F.count(F.lit(1)).alias("n_c"))
        vocab = tok.agg(F.countDistinct("term").alias("v"))
        self.model_ = (
            class_term.join(F.broadcast(class_tot), "cls")
            .crossJoin(F.broadcast(vocab))
            .select(
                "cls",
                "term",
                F.log(
                    (F.col("n_wc") + self.alpha)
                    / (F.col("n_c") + self.alpha * F.col("v"))
                ).alias("loglik"),
            )
            .cache()
        )
        total = df.count()
        self.priors_ = (
            df.groupBy(F.col(class_col).alias("cls"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select(
                "cls",
                F.log(F.col("n_docs") / F.lit(float(total))).alias("log_prior"),
            )
            .cache()
        )
        return self

    def predict(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        output_col: str = "pred_class",
    ) -> DataFrame:
        assert self.model_ is not None, "call fit() first"
        tok = df.select(
            id_col, F.explode(F.split(F.col(text_col), " ")).alias("term")
        )
        # unseen terms contribute the same constant to every class score;
        # dropping them (inner join) leaves the argmax unchanged
        scores = (
            tok.join(F.broadcast(self.model_), "term")
            .groupBy(id_col, "cls")
            .agg(F.sum("loglik").alias("ll"))
            .join(F.broadcast(self.priors_), "cls")
            .withColumn("score", F.col("ll") + F.col("log_prior"))
        )
        w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), "cls")
        return (
            scores.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(id_col, F.col("cls").alias(output_col), "score")
        )
