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
# re-enters the hard gate (advisor r2). Round-10 window, in order
# (WINDOW_r10.md has the per-query evidence trail):
#   1. the NEW round-10 queries q128 (multimodal PNG decode under the
#      hard gate — injected closed-form payloads, integer witnesses),
#      q129 (fasttext-style quality-model scoring — broadcast weight
#      join over hashed tokens), q130 (overlapping document
#      chunking — the RAG/embedding-prep splitter, chunk text as the
#      full-value witness), q131 (int8 scalar quantization of
#      embeddings, the FAISS-SQ8 ANN compression step — floor-based
#      rounding keeps both engines bit-identical), q132 (fixed-n
#      per-stratum sampling — WindowGroupLimit-pushed rank per
#      language), q133 (CCNet-style bigram-LM perplexity scoring —
#      Laplace counts as the learned weight table) and q134
#      (exact-substring span dedup, Lee et al. 2022 — positioned
#      hash-grams + per-doc interval merge), and the queries
#      whose CODE changed in
#      round 10: q02 (cache-proof file-size branch gate), q126 (exact
#      integer floor division for bucket ids, advisor r9), q127
#      (comment-only, re-gated as its module changed);
#   2. q57, q58 — displaced from the r9 window by the late q126/q127
#      addition (the r9 verdict's task 5 names them first);
#   3. the 25 remaining r7-evidence queries, lowest number first;
#   4. oldest r8-evidence queries, lowest number first, filling to 50.
# Entries past position 50 are r8/r9-green and code-unchanged.
_PRIORITY = [
    # -- (1) new in round 10 + code changed in round 10
    "q128_image_decode_stats",
    "q129_quality_model_score",
    "q130_chunk_documents",
    "q131_int8_quantization",
    "q132_fixed_n_per_stratum",
    "q133_bigram_lm_score",
    "q134_exact_substring_dedup",
    "q02_revenue_by_nation",
    "q126_sequence_packing",
    "q127_pii_redaction",
    # -- (2) displaced from the r9 window (r9 verdict task 5)
    "q57_metrics",
    "q58_gram_matrix",
    # -- (3) the remaining r7-evidence set, lowest number first
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
    # -- (4) oldest r8-evidence, lowest number first, filling to 50
    "q01_pricing_summary",
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
    # -- positions 51+: r8/r9-green code-unchanged (remaining r8 set
    # first — first in line for r11 — then the r9-green block)
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
    "q123_vocab_coverage",
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
