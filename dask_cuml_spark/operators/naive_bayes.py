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
    """Smoothing semantics (matches sklearn/cuml MultinomialNB): a term in
    the training vocabulary but unseen in class c contributes
    fallback(c) = log(alpha / (n_c + alpha*V)) to that class's score;
    out-of-vocabulary terms are ignored; a doc with no in-vocab terms is
    predicted from the priors alone.

    Scored without a doc×class×vocab blowup via the delta decomposition
      score(d, c) = log_prior(c) + n_invocab(d)·fallback(c)
                    + Σ_{t seen in c} (loglik(c,t) − fallback(c))
    — one token join for the deltas plus a docs×classes broadcast cross
    join (|classes| is small), so the wide stages stay O(tokens)."""

    alpha: float = 1.0
    model_: DataFrame | None = field(default=None, init=False)  # (cls, term, loglik)
    priors_: DataFrame | None = field(default=None, init=False)  # (cls, log_prior)
    class_stats_: DataFrame | None = field(default=None, init=False)  # (cls, log_prior, fallback)
    vocab_: DataFrame | None = field(default=None, init=False)  # (term)

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
        )
        # Estimator state is SESSION-lived, plain .cache() (r16 advisor:
        # an estimator is library surface with a fit-once/predict-many
        # contract — query-scoping it meant any release_scoped_caches()
        # silently dropped a still-held model's caching and every later
        # predict() re-ran the full tokenize+aggregate fit lineage;
        # IVFIndex/KMeans already follow this convention). Callers that
        # fit-and-discard inside one query can wrap the fit in
        # `with scoped_caches():` themselves; no registered query does.
        self.model_ = self.model_.cache()
        self.vocab_ = tok.select("term").distinct().cache()
        total_df = df.agg(F.count(F.lit(1)).alias("_n_total"))
        self.priors_ = (
            df.groupBy(F.col(class_col).alias("cls"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .crossJoin(F.broadcast(total_df))
            .select(
                "cls",
                F.log(
                    F.col("n_docs") / F.col("_n_total").cast("double")
                ).alias("log_prior"),
            )
        )
        self.priors_ = self.priors_.cache()
        self.class_stats_ = (
            class_tot.crossJoin(F.broadcast(vocab))
            .select(
                "cls",
                F.log(
                    F.lit(self.alpha)
                    / (F.col("n_c") + self.alpha * F.col("v"))
                ).alias("fallback"),
            )
            .join(F.broadcast(self.priors_), "cls")
        )
        self.class_stats_ = self.class_stats_.cache()
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
        # keep only in-vocab tokens (with multiplicity); OOV terms carry no
        # class information under multinomial smoothing
        invocab = tok.join(F.broadcast(self.vocab_), "term")
        n_iv = invocab.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_iv"))
        # per-class delta above the fallback for (class, term) pairs seen
        # in training — the only part that needs the token join
        deltas = self.model_.join(
            F.broadcast(self.class_stats_.select("cls", "fallback")), "cls"
        ).select("cls", "term", (F.col("loglik") - F.col("fallback")).alias("delta"))
        dsum = (
            invocab.join(F.broadcast(deltas), "term")
            .groupBy(id_col, "cls")
            .agg(F.sum("delta").alias("dsum"))
        )
        scores = (
            df.select(id_col)
            .join(n_iv, id_col, "left")
            .crossJoin(F.broadcast(self.class_stats_))
            .join(dsum, [id_col, "cls"], "left")
            .withColumn(
                "score",
                F.col("log_prior")
                + F.coalesce("n_iv", F.lit(0)) * F.col("fallback")
                + F.coalesce("dsum", F.lit(0.0)),
            )
        )
        w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), "cls")
        return (
            scores.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(id_col, F.col("cls").alias(output_col), "score")
        )
