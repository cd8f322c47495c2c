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
# re-enters the hard gate (advisor r2). Round-17 window, in order
# (WINDOW_r17.md has the per-query evidence trail), exactly as the
# round-16 verdict mandated (item 8):
#   1. slots 1-3: q162/q163/q164 — registered in the interrupted r16
#      build phase, the ONLY queries that have NEVER had a driver row;
#   2. slots 4-7: q147-q150 — the four r13-evidence leftovers the r16
#      window couldn't fit (47 rows, 43 slots);
#   3. slots 8-50: the 43 LOWEST-numbered r14-evidence queries
#      (latest driver row = round 14), lowest number first.
# After this round every registered query has a driver row, no query's
# driver evidence is older than round 14 except the seven r14-evidence
# leftovers (q136/q138/q139/q140/q141/q151/q152 — 50 r14 rows, only 43
# slots), which sit at 51+ and MUST lead the next window.
_PRIORITY = [
    # -- (1) slots 1-7 (r16 verdict item 8, the standing rotation rule):
    #    queries REGISTERED in r16 lead (never had a driver row), then
    #    the four r13-evidence leftovers the r16 window couldn't fit.
    "q162_hybrid_rrf_retrieval",
    "q163_video_scene_cuts",
    "q164_retrieval_metrics",
    "q147_perplexity_buckets",
    "q148_ngram_novelty",
    "q149_bloom_decontamination",
    "q150_paragraph_dedup",
    # -- (2) slots 8-50: the 43 LOWEST-numbered r14-evidence queries
    #    (latest driver row = round 14), lowest number first.
    "q02_revenue_by_nation",
    "q03_top_orders_per_customer",
    "q04_segment_stats",
    "q06_orders_by_month",
    "q07_fillna_left_join",
    "q08_value_counts",
    "q09_drop_duplicates",
    "q24_event_value_stats",
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
    "q77_dbscan",
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
    "q120_dbscan_blocked",
    "q121_boilerplate_ngrams",
    "q123_vocab_coverage",
    "q128_image_decode_stats",
    "q129_quality_model_score",
    "q133_bigram_lm_score",
    "q134_exact_substring_dedup",
    "q135_near_dup_canonicalize",
    # ---------------- positions 51+: out of window this round
    # -- r14-evidence leftovers (50 r14 rows, 43 slots): MUST lead the
    #    next window, per the q147-q150 pigeonhole precedent.
    "q136_apply_span_dedup",
    "q138_pq_adc_search",
    "q139_decontaminate_spans",
    "q140_temperature_mixture",
    "q141_ivfpq_search",
    "q151_paragraph_near_dup",
    "q152_phash_image_near_dup",
    # -- r15-evidence block (the r15 window), lowest number first
    "q01_pricing_summary",
    "q10_set_ops",
    "q11_rollup",
    "q25_hourly_windows",
    "q31_tfidf_top_term",
    "q32_exact_dedup",
    "q35_jaccard_near_dup",
    "q41_centroid_assignment",
    "q42_lloyd_iteration",
    "q45_cosine_near_dup",
    "q47_ivf_search_full_probe",
    "q48_kmeans_transform",
    "q52_ridge_fit",
    "q53_standard_scaler",
    "q54_minmax_scaler",
    "q55_corr_cov_matrix",
    "q56_confusion_matrix",
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
    "q115_ivf_partial_probe",
    "q116_stream_upsert_sink",
    "q117_stream_static_enrichment",
    "q118_knn_graph",
    "q124_embedding_outliers",
    "q125_semantic_dedup_auto",
    "q126_sequence_packing",
    "q127_pii_redaction",
    "q131_int8_quantization",
    "q137_pq_quantization",
    "q142_packing_audit",
    "q143_seq_length_histogram",
    "q144_dsir_weights",
    "q145_signhash_ann",
    "q153_shuffle_shard",
    "q154_triplet_mining",
    # -- r16-evidence block (the r16 window), window order
    "q155_bm25_retrieval",
    "q156_triplet_mining_ann",
    "q157_weighted_sample",
    "q158_cms_heavy_hitters",
    "q159_bpe_apply",
    "q160_cms_point_query",
    "q161_audio_fingerprint",
    "q05_string_ops",
    "q12_quantiles_histogram",
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
    "q119_contamination_check",
    "q122_token_budget_mixture",
    "q130_chunk_documents",
    "q132_fixed_n_per_stratum",
    "q146_stratified_split",
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
