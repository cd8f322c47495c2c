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
# re-enters the hard gate (advisor r2). Round-11 window, in order
# (WINDOW_r11.md has the per-query evidence trail):
#   1. changed-code-first: q136 (NEW — span-cut application: emit the
#      cleaned corpus, byte-exact cleaned-text oracle), q137 (NEW — PQ
#      product quantization, FAISS IndexPQ; q125-style invariant oracle
#      with an independent numpy argmin re-check), q138 (NEW — PQ ADC
#      search + exact re-rank, the FAISS serving shape; q82-style
#      rank-domination + recall invariants), q139 (NEW — span-level
#      decontamination: eval-gram hits through the shared interval
#      merge; string-truth oracle), q140 (NEW — temperature mixture
#      sampling, mT5/XLM-R n^α; α=0.5 keeps the rate map cross-engine
#      exact, full-value oracle), q135 (NEW — near-dup
#      cluster canonicalization: connected components over q78's
#      verified pairs, full-value recursive-CTE oracle), q131 (size-gated Arrow
#      kernel + zero-scale guard), q129 (delegates to the
#      operators/quality.py library operator; presentation sort
#      removed), q121/q119/q134 (shared POSITIONED gram layout branch),
#      q133 (persist gate lowered to 256 MB — the r11 1000x OOM fix),
#      q128 (RGBA-safe PNG encoder, advisor r10), q77/q120 (dbscan's CC
#      extracted to operators/components.py), q02 (io.source_size_bytes
#      now raises on a missing path — its branch gate input);
#   2. the 28 remaining r8-evidence queries, lowest number first
#      (q77/q120 from that set already sit in group 1);
#   3. oldest r9-evidence queries, lowest number first, filling to 50.
# Entries past position 50 are r9/r10-green and code-unchanged.
_PRIORITY = [
    # -- (1) new in round 11 + code changed in round 11
    "q136_apply_span_dedup",
    "q137_pq_quantization",
    "q138_pq_adc_search",
    "q139_decontaminate_spans",
    "q140_temperature_mixture",
    "q135_near_dup_canonicalize",
    "q131_int8_quantization",
    "q129_quality_model_score",
    "q121_boilerplate_ngrams",
    "q119_contamination_check",
    "q134_exact_substring_dedup",
    "q133_bigram_lm_score",
    "q128_image_decode_stats",
    "q77_dbscan",
    "q120_dbscan_blocked",
    "q02_revenue_by_nation",
    # -- (2) the remaining r8-evidence set, lowest number first
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
    "q123_vocab_coverage",
    # -- (3) oldest r9-evidence, lowest number first, filling to 50
    "q03_top_orders_per_customer",
    "q04_segment_stats",
    "q06_orders_by_month",
    "q07_fillna_left_join",
    "q08_value_counts",
    "q09_drop_duplicates",
    # -- positions 51+: r9/r10-green code-unchanged (q10/q11/q25/q31/
    # q32 displaced past 50 by the late q136-q140 additions — first in
    # line for r12 with the remaining r9 set — then the r10-green block)
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
