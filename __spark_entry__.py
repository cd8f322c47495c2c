"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (q01 pricing summary) on sf0.001.
queries()      — every implemented operator from SURVEY.md §2 as
                 (spark, sf_dir) -> DataFrame callables.
oracle_sql()   — matching DuckDB ANSI-SQL strings (omitted entries get the
                 driver's weaker rows-only check).

Implementation lives in dask_cuml_spark/ (see SURVEY.md §7 build plan).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dask_cuml_spark.queries  # noqa: E402,F401 — populates the registry
from dask_cuml_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _shipped(QUERIES["q01_pricing_summary"])(
        spark, "/root/testdata/sf0.001"
    )


# The driver's correctness pass records rows for the FIRST 50 entries of
# this dict. Rounds rotate the window so every query periodically
# re-enters the hard gate (advisor r2). Round-5 window, in order
# (WINDOW_r05.md has the per-query evidence trail):
#   1. the 6 queries whose latest driver row is r2 (verdict r4 task 3:
#      q90/q91/q95/q59/q96/q97 — judge-green every session via
#      tests/test_oracle_parity.py, but two fixture generations since a
#      driver row);
#   2. the queries whose CODE is new or changed in round 5: q103
#      (SWAR-compare majority extract), q105 + q78 (12x3 LSH banding;
#      q105 two-pass funnel fold), q44 (PIL-exact luma arithmetic), and
#      the five NEW queries q108 semantic dedup / q109 stratified
#      sample / q110 Gopher rules / q111 clustered layout / q112
#      incremental dedup;
#   3. the rest of the r3-proven set, oldest driver evidence first —
#      all fit except q87/q94/q99/q101/q102/q42/q48 (displaced by the
#      new queries; all pytest-parity-green, first in line for r6).
# Entries past position 50 are r3/r4-green and code-unchanged.
_PRIORITY = [
    # -- (1) last driver row is r2
    "q90_regexp_ops",
    "q91_python_udtf",
    "q95_random_forest",
    "q59_ols_predict",
    "q96_train_test_split",
    "q97_make_blobs",
    # -- (2) code new or changed in round 5
    "q103_simhash_near_dup",
    "q105_curation_pipeline",
    "q78_minhash_near_dup",
    "q44_multimodal_join",
    "q108_semantic_dedup",
    "q109_stratified_sample",
    "q110_gopher_rules",
    "q111_clustered_layout",
    "q112_incremental_dedup",
    "q113_bpe_token_accounting",
    "q114_ngram_language_id",
    # streaming state-partition sizing changed late in round 5
    # (auto_state_partitions) — changed code re-enters the hard gate
    "q70_stream_sessionization",
    "q71_stream_hourly_counts",
    "q79_stream_stateful_totals",
    "q93_stream_stream_join",
    "q98_stream_dedup",
    # -- (3) r3-proven, rotating back into the hard gate
    "q03_top_orders_per_customer",
    "q04_segment_stats",
    "q06_orders_by_month",
    "q07_fillna_left_join",
    "q08_value_counts",
    "q09_drop_duplicates",
    "q10_set_ops",
    "q11_rollup",
    "q12_quantiles_histogram",
    "q30_top_terms",
    "q31_tfidf_top_term",
    "q32_exact_dedup",
    "q33_lang_source_slice",
    "q34_text_quality",
    "q35_jaccard_near_dup",
    "q36_naive_bayes_fit",
    "q37_label_encode",
    "q38_fingerprint",
    "q39_count_vectorizer",
    "q40_knn_bruteforce",
    "q41_centroid_assignment",
    "q43_cosine_topk",
    "q46_knn_classify",
    "q47_ivf_search_full_probe",
    "q50_feature_stats",
    "q51_ols_fit",
    "q76_kmeans_fit",
    "q77_dbscan",
    # -- positions 51+: r3/r4-green, code-unchanged (q52/q53/q54/q55/q65
    # displaced by the five late-round-5-changed streaming queries;
    # q82/q83 + q87/q94 + kmeans-family q42/q48/q99 + q101/q102 first in
    # line for r6 — the seven new round-5 queries q108-q114 took their
    # window slots)
    "q52_ridge_fit",
    "q53_standard_scaler",
    "q54_minmax_scaler",
    "q55_corr_cov_matrix",
    "q65_ranking_windows",
    "q82_lsh_knn",
    "q83_logreg_predict",
    "q87_naive_bayes_predict",
    "q94_elasticnet_vs_ols",
    "q99_kmeans_parallel_fit",
    "q101_make_classification",
    "q102_adjusted_rand",
    "q42_lloyd_iteration",
    "q48_kmeans_transform",
]


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a query so the package is shipped to executor Python workers
    before any UDF-bearing plan runs — the driver controls the session
    and may launch us from any cwd (see session.ensure_worker_code)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dask_cuml_spark.session import ensure_worker_code

        ensure_worker_code(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's correctness window covers driver-unproven queries first."""
    ordered = {n: _shipped(QUERIES[n]) for n in _PRIORITY if n in QUERIES}
    for n, fn in QUERIES.items():
        if n not in ordered:
            ordered[n] = _shipped(fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return dict(ORACLES)
