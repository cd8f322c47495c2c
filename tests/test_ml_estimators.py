"""Tests for the estimator surface backed by PCA/MLlib/DBSCAN/NB —
reference strategy: golden = numpy/sklearn-equivalent closed forms on
synthetic data, tolerance-based for iterative fits (SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_cuml_spark.io import load_table
from dask_cuml_spark.operators.datasets import make_blobs, make_regression
from dask_cuml_spark.operators.dbscan import dbscan
from dask_cuml_spark.operators.mllib_wrappers import (
    ElasticNetWrapper,
    KMeansMLlib,
    LogisticRegressionWrapper,
    RandomForestWrapper,
    vector_roundtrip,
)
from dask_cuml_spark.operators.naive_bayes import MultinomialNB
from dask_cuml_spark.operators.pca import PCA

SF = "/root/testdata/sf0.01"


def test_pca_matches_numpy(spark):
    l = load_table(spark, SF, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    model = PCA(n_components=2).fit(l, cols)
    pdf = l.select(cols).toPandas()
    X = pdf.to_numpy(dtype=np.float64)
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (len(X) - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    comps = vecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    np.testing.assert_allclose(model.components_, comps, rtol=1e-6)
    np.testing.assert_allclose(model.explained_variance_, vals[order], rtol=1e-6)


def test_pca_transform_variance_ordering(spark):
    l = load_table(spark, SF, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    model = PCA(n_components=2).fit(l, cols)
    out = model.transform(l)
    row = out.agg(
        F.var_samp("pc0").alias("v0"), F.var_samp("pc1").alias("v1")
    ).collect()[0]
    np.testing.assert_allclose(row["v0"], model.explained_variance_[0], rtol=1e-6)
    assert row["v0"] >= row["v1"]


def test_logistic_regression_separable(spark):
    # linearly separable synthetic data -> near-perfect accuracy
    df = make_regression(spark, n_samples=2000, n_features=2, noise=0.0, seed=7)
    labeled = df.withColumn("cls", (F.col("y") > 0).cast("int"))
    m = LogisticRegressionWrapper(max_iter=30).fit(labeled, ["x0", "x1"], "cls")
    scored = m.predict(labeled)
    acc = scored.agg(
        F.avg(F.when(F.col("prediction") == F.col("cls"), 1.0).otherwise(0.0))
    ).collect()[0][0]
    assert acc > 0.97, acc


def test_random_forest_learns_threshold(spark):
    df = make_regression(spark, n_samples=2000, n_features=2, noise=0.0, seed=9)
    labeled = df.withColumn("cls", (F.col("x0") > 0).cast("int"))
    m = RandomForestWrapper(num_trees=10, max_depth=4).fit(
        labeled, ["x0", "x1"], "cls"
    )
    scored = m.predict(labeled)
    acc = scored.agg(
        F.avg(F.when(F.col("prediction") == F.col("cls"), 1.0).otherwise(0.0))
    ).collect()[0][0]
    assert acc > 0.95, acc


def test_elastic_net_shrinks_coefficients(spark):
    df = make_regression(spark, n_samples=3000, n_features=3, noise=0.5, seed=11)
    ols_like = ElasticNetWrapper(alpha=0.0, l1_ratio=0.0).fit(
        df, ["x0", "x1", "x2"], "y"
    )
    lasso = ElasticNetWrapper(alpha=5.0, l1_ratio=1.0).fit(
        df, ["x0", "x1", "x2"], "y"
    )
    assert np.abs(lasso.coef_).sum() < np.abs(ols_like.coef_).sum()
    # atol: true coefficients can be near zero (noise=0.5 on y)
    np.testing.assert_allclose(ols_like.coef_, df.coef_, atol=0.05)


def test_kmeans_mllib_recovers_blobs(spark):
    blobs = make_blobs(
        spark, n_samples=1500, n_features=4, centers=3, cluster_std=0.5, seed=3
    ).withColumn("features", F.col("features").cast("array<float>"))
    m = KMeansMLlib(k=3, max_iter=20, seed=3).fit(blobs, "features")
    scored = m.predict(blobs, "features")
    # every true blob maps to exactly one dominant predicted cluster
    conf = (
        scored.groupBy("label", "cluster").count().toPandas()
        .pivot_table(index="label", columns="cluster", values="count", fill_value=0)
    )
    purity = conf.max(axis=1).sum() / conf.values.sum()
    assert purity > 0.99, purity


def test_dbscan_blobs_and_noise(spark):
    blobs = make_blobs(
        spark, n_samples=300, n_features=2, centers=2, cluster_std=0.3, seed=5
    ).select(
        F.col("id").alias("vec_id"),
        F.col("features").alias("embedding"),
        "label",
    )
    out = dbscan(blobs, eps=1.0, min_pts=5).toPandas()
    clustered = out[out.cluster >= 0]
    assert len(clustered) > 250  # dense blobs mostly clustered
    # two dominant clusters
    top = clustered.cluster.value_counts()
    assert len(top) == 2, top
    # cluster labels align with true blobs
    joined = out.merge(
        blobs.select("vec_id", "label").toPandas(), on="vec_id"
    )
    joined = joined[joined.cluster >= 0]
    purity = (
        joined.groupby(["label", "cluster"]).size().groupby("label").max().sum()
        / len(joined)
    )
    assert purity > 0.98, purity


def test_naive_bayes_separable_vocab(spark):
    rows = []
    for i in range(100):
        rows.append((i, "apple banana cherry apple", "fruit"))
        rows.append((100 + i, "carrot potato onion carrot", "veg"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    nb = MultinomialNB().fit(df)
    pred = nb.predict(df).toPandas()
    truth = df.select("doc_id", "lang").toPandas()
    m = pred.merge(truth, on="doc_id")
    assert (m.pred_class == m.lang).all()


def test_vector_roundtrip_bridge(spark):
    e = load_table(spark, SF, "embeddings").limit(20)
    rt = vector_roundtrip(e, "embedding").toPandas()
    for a, b in zip(rt.embedding, rt.embedding_rt):
        assert list(a) == list(b)


def test_truncated_svd_matches_numpy(spark):
    from dask_cuml_spark.operators.pca import TruncatedSVD

    l = load_table(spark, SF, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    model = TruncatedSVD(n_components=2).fit(l, cols)
    X = l.select(cols).toPandas().to_numpy(dtype=np.float64)
    gram = X.T @ X / len(X)
    vals, vecs = np.linalg.eigh(gram)
    order = np.argsort(vals)[::-1][:2]
    comps = vecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    np.testing.assert_allclose(model.components_, comps, rtol=1e-6)
    # transform projects onto the components (no centering)
    out = model.transform(l.limit(50)).select("sv0", *cols).toPandas()
    proj = out[cols].to_numpy() @ model.components_[0]
    np.testing.assert_allclose(out["sv0"].to_numpy(), proj, rtol=1e-9)


def test_naive_bayes_unseen_term_fallback(spark):
    """sklearn semantics (ADVICE r1): an in-vocab term unseen in class c
    contributes log(alpha/(n_c+alpha*V)) to c's score — classes missing a
    doc's terms must be penalized, not silently skipped."""
    import math

    train = spark.createDataFrame(
        [(0, "x x x x", "a"), (1, "x y", "b")], ["doc_id", "text", "lang"]
    )
    nb = MultinomialNB().fit(train)
    # doc "x y": score(a) = ln(.5)+ln(5/6)+ln(1/6), score(b) = 3·ln(.5)
    # → b wins. The old inner-join scoring dropped y from a's sum and
    # wrongly predicted a.
    pred = nb.predict(
        spark.createDataFrame([(10, "x y")], ["doc_id", "text"])
    ).toPandas()
    assert pred.loc[0, "pred_class"] == "b"
    expected_b = 3 * math.log(0.5)
    assert abs(pred.loc[0, "score"] - expected_b) < 1e-9
    # doc with only out-of-vocab tokens: predicted from priors (equal
    # here → tie-break to 'a'), and present in the output at all
    pred2 = nb.predict(
        spark.createDataFrame([(11, "z z z")], ["doc_id", "text"])
    ).toPandas()
    assert len(pred2) == 1
    assert pred2.loc[0, "pred_class"] == "a"
    assert abs(pred2.loc[0, "score"] - math.log(0.5)) < 1e-9


def test_dbscan_min_pts_counts_self(spark):
    """Reference DBSCAN counts a point in its own ε-neighborhood: a point
    with exactly min_pts-1 neighbors IS core (ADVICE r1)."""
    rows = [(0, [0.0, 0.0]), (1, [0.5, 0.0]), (2, [1.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = dbscan(df, eps=0.6, min_pts=3).toPandas().set_index("vec_id")
    # point 1 has neighbors {0, 2} → |N(1)| = 3 incl. itself → core;
    # 0 and 2 are border points attached to its cluster
    assert (out["cluster"] == 1).all(), out


def test_dbscan_all_noise_empty_core(spark):
    """No core points must return all-noise, not raise on an empty
    createDataFrame (ADVICE r1)."""
    rows = [(0, [0.0, 0.0]), (1, [100.0, 0.0]), (2, [0.0, 100.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = dbscan(df, eps=1.0, min_pts=3).toPandas()
    assert (out["cluster"] == -1).all(), out


def test_dbscan_min_pts_one_isolated_singletons(spark):
    """min_pts <= 1: every point is core — an ISOLATED point (zero
    ε-neighbors, so it never appears in the pairs join) must become its
    own singleton cluster, not noise (sklearn/cuML semantics; ADVICE
    r2)."""
    rows = [(0, [0.0, 0.0]), (1, [0.5, 0.0]), (2, [100.0, 100.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = (
        dbscan(df, eps=1.0, min_pts=1).toPandas().set_index("vec_id")["cluster"]
    )
    assert out.loc[0] == 0 and out.loc[1] == 0  # joined pair, min-id label
    assert out.loc[2] == 2  # isolated singleton cluster, NOT -1


def test_dbscan_label_prop_path_matches_union_find(spark):
    """union_find_max_edges=0 forces the distributed label-propagation CC
    path; its labeling must be identical to the driver union-find result
    (same min-member-id cluster ids) — the 100 TB path is not a
    different algorithm, just a different executor (VERDICT r2 #5)."""
    blobs = make_blobs(
        spark, n_samples=120, n_features=2, centers=3, cluster_std=0.2, seed=9
    ).select(F.col("id").alias("vec_id"), F.col("features").alias("embedding"))
    a = (
        dbscan(blobs, eps=1.0, min_pts=4)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        dbscan(blobs, eps=1.0, min_pts=4, union_find_max_edges=0)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert a.equals(b), (a.compare(b) if a.shape == b.shape else (a, b))


def test_dbscan_driver_solve_border_and_noise(spark):
    """The r16 size-gated whole-driver solve (degrees + cores + CC +
    border in one bounded collect) must keep the exact border/noise
    semantics of the Spark graph assembly: a border point adjacent to
    cores of TWO different clusters takes the MIN core-neighbor label,
    and a point with only non-core neighbors stays noise. Pinned
    against union_find_max_edges=0 (the pure Spark path) on a
    handcrafted geometry that exercises both."""
    rows = [
        # cluster A: five mutually-within-eps points (deg 4 each ->
        # core at min_pts=5)
        (0, [0.0, 0.0]), (1, [0.5, 0.0]), (2, [0.25, 0.4]),
        (3, [0.25, -0.4]), (4, [-0.25, 0.0]),
        # cluster B: same shape at x=5
        (10, [5.0, 0.0]), (11, [5.5, 0.0]), (12, [5.25, 0.4]),
        (13, [5.25, -0.4]), (14, [5.75, 0.0]),
        # 20: neighbors {1, 10, 21} -> deg 3 + self = 4 < 5, NOT core;
        # border of BOTH A (via core 1) and B (via core 10) -> min
        # label = A's (0)
        (20, [2.75, 0.0]),
        # 21: only neighbor is 20 (non-core) -> noise
        (21, [2.75, 1.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    drv = (
        dbscan(df, eps=2.4, min_pts=5)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    spk = (
        dbscan(df, eps=2.4, min_pts=5, union_find_max_edges=0)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert drv.equals(spk), (drv, spk)
    got = drv.set_index("vec_id")["cluster"]
    assert got.loc[20] == 0, got  # min over {A=0, B=10}
    assert got.loc[21] == -1, got


def test_dbscan_cells_degenerate_tiny_input(spark):
    """strategy='cells' with n_cells LARGER than the point count: KMeans
    returns fewer centers than requested, and the probe kernel must size
    its radius vector by the actual center count (advisor r7 — radii
    sized by n_cells crashed on a broadcast shape mismatch). Labels must
    equal the exact all-pairs path."""
    rows = [(i, [float(i % 3), float(i // 3)]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = (
        dbscan(df, eps=1.2, min_pts=2)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    cells = (
        dbscan(df, eps=1.2, min_pts=2, strategy="cells", n_cells=16)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert exact.equals(cells), (exact, cells)


def test_dbscan_label_prop_converges_on_deep_chain(spark):
    """A chain graph is label propagation's worst case: plain min-label
    rounds move the minimum ONE hop per round, so a diameter-60 chain
    silently returned unconverged (wrong) labels inside max_rounds=20.
    The r7 pointer-jumping shortcut (label <- label(label)) makes the
    horizon double per round — the chain must come back as ONE cluster
    labeled by its min id, well inside the round budget."""
    n = 60
    rows = [(i, [float(i), 0.0]) for i in range(n)]
    chain = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = (
        dbscan(chain, eps=1.5, min_pts=2, union_find_max_edges=0)
        .toPandas().set_index("vec_id")["cluster"]
    )
    assert (out == 0).all(), out[out != 0]
