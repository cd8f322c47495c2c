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
# re-enters the hard gate (advisor r2). Round-9 window, in order
# (WINDOW_r09.md has the per-query evidence trail):
#   1. the NEW round-9 queries q125 (semantic-dedup auto-k production
#      posture, invariant oracle — zero driver evidence yet), q126
#      (concat-and-chunk sequence packing, two-level prefix sum) and
#      q127 (PII redaction — regex scrub with injected spans), and the
#      queries whose CODE changed in round 9: q112/q119 (now read the
#      shared stored layouts when provisioned — q119 additionally moved
#      to the shared 5-gram width; catalog-gated, absent in the
#      driver's fresh session so the oracle path runs plain), q02/q121
#      (fingerprinted layout-table identity, advisor r8), q116 (sink:
#      stream-identity replay guard + pre-schema manifest fallback,
#      advisor r8), the IVFIndex consumers q47/q115/q118 (resolved
#      n_cells_ field, advisor r8), q124 (outlier flag computed on the
#      6-dp-rounded distance both engines round, advisor r8);
#   2. the 25 queries whose latest driver row is r6 — the r8 verdict's
#      task 1 (q112/q119 are in that set and already enter via (1));
#   3. oldest r7-evidence queries, lowest number first, filling to 50.
# Entries past position 50 are r7/r8-green and code-unchanged.
_PRIORITY = [
    # -- (1) new in round 9 + code changed in round 9
    "q125_semantic_dedup_auto",
    "q126_sequence_packing",
    "q127_pii_redaction",
    "q112_incremental_dedup",
    "q119_contamination_check",
    "q02_revenue_by_nation",
    "q121_boilerplate_ngrams",
    "q116_stream_upsert_sink",
    "q47_ivf_search_full_probe",
    "q115_ivf_partial_probe",
    "q118_knn_graph",
    "q124_embedding_outliers",
    # -- (2) last driver row is r6 (r8 verdict task 1)
    "q31_tfidf_top_term",
    "q35_jaccard_near_dup",
    "q52_ridge_fit",
    "q53_standard_scaler",
    "q54_minmax_scaler",
    "q55_corr_cov_matrix",
    "q65_ranking_windows",
    "q78_minhash_near_dup",
    "q82_lsh_knn",
    "q83_logreg_predict",
    "q87_naive_bayes_predict",
    "q94_elasticnet_vs_ols",
    "q96_train_test_split",
    "q98_stream_dedup",
    "q100_merge_schema",
    "q101_make_classification",
    "q102_adjusted_rand",
    "q104_json_parse_at_ingest",
    "q105_curation_pipeline",
    "q106_salted_skew_join",
    "q107_approx_aggregates",
    "q109_stratified_sample",
    "q117_stream_static_enrichment",
    # -- (3) oldest r7-evidence, lowest number first, filling to 50
    "q03_top_orders_per_customer",
    "q04_segment_stats",
    "q06_orders_by_month",
    "q07_fillna_left_join",
    "q08_value_counts",
    "q09_drop_duplicates",
    "q10_set_ops",
    "q11_rollup",
    "q25_hourly_windows",
    "q32_exact_dedup",
    "q41_centroid_assignment",
    "q42_lloyd_iteration",
    "q45_cosine_near_dup",
    "q48_kmeans_transform",
    "q56_confusion_matrix",
    "q57_metrics",
    "q58_gram_matrix",
    # -- positions 51+: r7/r8-green code-unchanged (remaining r7 set
    # first — first in line for r10 — then the r8-green block)
    "q60_asof_join",
    "q61_cube",
    "q62_partitioned_write",
    "q63_multiformat_roundtrip",
    "q64_map_functions",
    "q66_language_id",
    "q67_token_count",
    "q68_knn_regressor",
    "q72_map_partitions",
    "q73_grouped_normalize",
    "q74_grouped_agg_udf",
    "q75_pivot",
    "q76_kmeans_fit",
    "q80_range_window",
    "q81_one_hot",
    "q84_merge_upsert",
    "q85_grouping_sets",
    "q86_profile_table",
    "q88_group_quantiles",
    "q89_unpivot_melt",
    "q92_interval_join",
    "q99_kmeans_parallel_fit",
    "q108_semantic_dedup",
    "q114_ngram_language_id",
    "q122_token_budget_mixture",
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
