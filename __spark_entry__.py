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
# re-enters the hard gate (advisor r2). Round-7 window, in order
# (WINDOW_r07.md has the per-query evidence trail):
#   1. the 25 queries whose latest driver row is r4 — the r6 verdict's
#      task 1 (hard obligation: driver evidence must not age past r4);
#      all judge-green every session via tests/test_oracle_parity.py;
#   2. the queries whose CODE changed in round 7: q120 (NEW —
#      cell-blocked DBSCAN over SQL-replayable blob points, full-value
#      oracle), q02 (three-branch cost gate: new bcast-cmap +
#      shuffled-hash-join middle branch — the measured 100× win),
#      q116 (bucketed manifest merge sink — per-batch writes O(batch)
#      not O(table) + committed-replay no-op guard), q118 (recall
#      denominator fixed to the sample size; IVF probe selection on the
#      gated GEMM primitive), q114 (langid >63-label pivot fallback
#      guard), q77 (dbscan gained strategy/n_cells params; default
#      path unchanged), and the matrix_lit/kmeans consumers
#      q41/q42/q47/q48/q76/q99/q108/q115 (non-finite validation +
#      nearest_centers primitive; fixture plans unchanged) — changed
#      code always re-enters the hard gate;
#   3. oldest r5-evidence queries, lowest number first, filling to 50.
# Entries past position 50 are r5/r6-green and code-unchanged.
_PRIORITY = [
    # -- (1) last driver row is r4 (r6 verdict task 1)
    "q25_hourly_windows",
    "q45_cosine_near_dup",
    "q56_confusion_matrix",
    "q57_metrics",
    "q58_gram_matrix",
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
    "q80_range_window",
    "q81_one_hot",
    "q84_merge_upsert",
    "q85_grouping_sets",
    "q86_profile_table",
    "q88_group_quantiles",
    "q89_unpivot_melt",
    "q92_interval_join",
    # -- (2) code new or changed in round 7 (re-enters the hard gate)
    "q121_boilerplate_ngrams",
    "q122_token_budget_mixture",
    "q120_dbscan_blocked",
    "q02_revenue_by_nation",
    "q32_exact_dedup",
    "q116_stream_upsert_sink",
    "q118_knn_graph",
    "q114_ngram_language_id",
    "q77_dbscan",
    "q41_centroid_assignment",
    "q42_lloyd_iteration",
    "q47_ivf_search_full_probe",
    "q48_kmeans_transform",
    "q76_kmeans_fit",
    "q99_kmeans_parallel_fit",
    "q108_semantic_dedup",
    "q115_ivf_partial_probe",
    # -- (3) oldest r5-evidence, lowest number first, filling to 50
    "q03_top_orders_per_customer",
    "q04_segment_stats",
    "q06_orders_by_month",
    "q07_fillna_left_join",
    "q08_value_counts",
    "q09_drop_duplicates",
    "q10_set_ops",
    "q11_rollup",
    # -- positions 51+: r5/r6-green code-unchanged
    "q01_pricing_summary",
    "q05_string_ops",
    "q13_semi_anti_join",
    "q14_range_join_bands",
    "q15_global_topk",
    "q16_project_cast_case",
    "q17_rolling_avg",
    "q18_lag_lead",
    "q20_sessionization",
    "q21_funnel",
    "q22_json_extract",
    "q23_retention",
    "q24_event_value_stats",
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
    "q112_incremental_dedup",
    "q117_stream_static_enrichment",
    "q119_contamination_check",
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
