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
# re-enters the hard gate (advisor r2). Round-8 window, in order
# (WINDOW_r08.md has the per-query evidence trail):
#   1. the 27 queries whose latest driver row is r5 — the r7 verdict's
#      task 1 (hard obligation: driver evidence must not age past r5);
#      all judge-green every session via tests/test_oracle_parity.py;
#   2. the queries whose CODE changed in round 8: q02 (new 'bucketed'
#      co-located-layout branch — catalog-gated, absent in the driver's
#      fresh session so the oracle path is untouched, but changed code
#      re-enters the gate), q77/q120 (dbscan: advisor r7 hardening +
#      partition-local union-find CC pre-contraction — labels must stay
#      bit-identical), q116 (sink: monotone replay guard + schema-in-
#      manifest), the IVFIndex consumers q47/q115/q118 (n_cells=
#      'sqrt' option; int-config path unchanged), q121 (catalog-
#      gated gram-layout branch — absent in fresh sessions, measured
#      0.77x vs DuckDB at 100x with the layout), and the two NEW
#      round-8 queries q123 (vocab-coverage sizing) and q124
#      (embedding-outlier curation) — zero driver evidence yet, so
#      they outrank the r6 refreshes;
#   3. oldest r6-evidence queries, lowest number first, filling to 50.
# Entries past position 50 are r6/r7-green and code-unchanged.
_PRIORITY = [
    # -- (1) last driver row is r5 (r7 verdict task 1)
    "q12_quantiles_histogram",
    "q30_top_terms",
    "q33_lang_source_slice",
    "q34_text_quality",
    "q36_naive_bayes_fit",
    "q37_label_encode",
    "q38_fingerprint",
    "q39_count_vectorizer",
    "q40_knn_bruteforce",
    "q43_cosine_topk",
    "q44_multimodal_join",
    "q46_knn_classify",
    "q50_feature_stats",
    "q51_ols_fit",
    "q59_ols_predict",
    "q70_stream_sessionization",
    "q71_stream_hourly_counts",
    "q79_stream_stateful_totals",
    "q90_regexp_ops",
    "q91_python_udtf",
    "q93_stream_stream_join",
    "q95_random_forest",
    "q97_make_blobs",
    "q103_simhash_near_dup",
    "q110_gopher_rules",
    "q111_clustered_layout",
    "q113_bpe_token_accounting",
    # -- (2) code changed in round 8 (re-enters the hard gate)
    "q02_revenue_by_nation",
    "q77_dbscan",
    "q120_dbscan_blocked",
    "q116_stream_upsert_sink",
    "q47_ivf_search_full_probe",
    "q115_ivf_partial_probe",
    "q118_knn_graph",
    "q121_boilerplate_ngrams",
    "q123_vocab_coverage",
    "q124_embedding_outliers",
    # -- (3) oldest r6-evidence, lowest number first, filling to 50
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
    # -- positions 51+: r6/r7-green code-unchanged (remaining r6 set
    # first — first in line for r9 — then the r7-green block)
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
