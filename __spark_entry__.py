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
# re-enters the hard gate (advisor r2). Round-6 window, in order
# (WINDOW_r06.md has the per-query evidence trail):
#   1. the 14 queries whose latest driver row is r3 — the standing
#      rotation obligation from the r5 verdict (task 1), displaced two
#      rounds running by new/changed code; all judge-green every session
#      via tests/test_oracle_parity.py;
#   2. the queries whose CODE is new or changed in round 6: q115 (NEW —
#      partial-probe IVF), q47/q41/q76/q108 + the group-1 members
#      q42/q48/q99 (matrix_lit literal centroid table + argmin-rewrite
#      of _assignment_expr), q31 (window-df single-DAG rewrite), q114
#      (O(len^1.5) trigram explode + hashed-bitmask scoring), q98
#      (auto state-partition sizing), and the hashed-shingle consumers
#      q78/q112/q105/q35 (n==1 guard — n>=2 behavior unchanged, gated
#      defensively);
#   3. 24 of the 43 r4-evidence queries, lowest query number first —
#      the remaining 19 (q61-q92 block, listed at positions 51+) are
#      first in line for r7.
# Entries past position 50 are r4/r5-green and code-unchanged.
_PRIORITY = [
    # -- (1) last driver row is r3 (r5 verdict task 1)
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
    # -- (2) code new or changed in round 6
    "q115_ivf_partial_probe",
    "q47_ivf_search_full_probe",
    "q41_centroid_assignment",
    "q76_kmeans_fit",
    "q108_semantic_dedup",
    "q31_tfidf_top_term",
    "q114_ngram_language_id",
    "q98_stream_dedup",
    "q78_minhash_near_dup",
    "q112_incremental_dedup",
    "q105_curation_pipeline",
    "q35_jaccard_near_dup",
    # -- (3) r4-evidence, rotating back into the hard gate
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q05_string_ops",
    "q100_merge_schema",
    "q104_json_parse_at_ingest",
    "q106_salted_skew_join",
    "q107_approx_aggregates",
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
    # q116-q119 are NEW round-6 code (exactly-once foreachBatch merge
    # sink; stream-static enrichment join; IVF kNN-graph build;
    # benchmark-contamination check); the overflow-free sampling-hash
    # rewrite (bucket-identical, but changed code re-enters the hard
    # gate) adds q109/q96 — together displacing q25/q45/q56/q57/q58/q60
    # to r7's queue
    "q119_contamination_check",
    "q118_knn_graph",
    "q116_stream_upsert_sink",
    "q117_stream_static_enrichment",
    "q109_stratified_sample",
    "q96_train_test_split",
    # -- positions 51+: r4-green code-unchanged (first in line for r7),
    # then the r5-green set
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
