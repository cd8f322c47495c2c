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
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's correctness pass records rows for the FIRST 50 entries of
# this dict. Rounds rotate the window so every query periodically
# re-enters the hard gate (advisor r2). Round-4 window, in order:
#   1. the 14 queries broken by the round-3 fixture re-encoding
#      (events.ts nanos-int64 → TIMESTAMP_MICROS; VERDICT r3 #1) — the
#      schema-adaptive loader fix must be PROVEN on exactly these;
#   2. new/changed round-4 queries (q104 parse-at-ingest; q103 SWAR
#      SimHash + single-action invariants);
#   3. the 8 queries last proven in CORRECTNESS_r01 (oldest evidence);
#   4. 26 of the 29 queries last proven in CORRECTNESS_r02, oldest-
#      evidence rotation (the 3 simplest — q59/q96/q97 — wait at 51+).
# Entries past position 50 are unchanged and r2/r3-green — WINDOW_r04.md
# lists the evidence row per query.
_PRIORITY = [
    # -- (1) loader-broken in r3, re-prove on the new fixture encoding
    "q20_sessionization",
    "q21_funnel",
    "q22_json_extract",
    "q23_retention",
    "q24_event_value_stats",
    "q25_hourly_windows",
    "q64_map_functions",
    "q70_stream_sessionization",
    "q71_stream_hourly_counts",
    "q79_stream_stateful_totals",
    "q80_range_window",
    "q92_interval_join",
    "q93_stream_stream_join",
    "q98_stream_dedup",
    # -- (2) new/changed in round 4
    "q104_json_parse_at_ingest",
    "q105_curation_pipeline",
    "q106_salted_skew_join",
    "q107_approx_aggregates",
    "q103_simhash_near_dup",
    # -- (3) last proven in r1 (oldest evidence)
    "q02_revenue_by_nation",
    "q05_string_ops",
    "q13_semi_anti_join",
    "q14_range_join_bands",
    "q15_global_topk",
    "q16_project_cast_case",
    "q17_rolling_avg",
    "q18_lag_lead",
    # -- (4) last proven in r2, rotating back in
    "q01_pricing_summary",
    "q45_cosine_near_dup",
    "q56_confusion_matrix",
    "q57_metrics",
    "q58_gram_matrix",
    "q60_asof_join",
    "q61_cube",
    "q62_partitioned_write",
    "q63_multiformat_roundtrip",
    "q100_merge_schema",
    "q66_language_id",
    "q67_token_count",
    "q68_knn_regressor",
    "q72_map_partitions",
    "q73_grouped_normalize",
    "q74_grouped_agg_udf",
    "q75_pivot",
    "q81_one_hot",
    "q84_merge_upsert",
    "q85_grouping_sets",
    "q86_profile_table",
    "q88_group_quantiles",
    "q89_unpivot_melt",
    # -- positions 51+: r2-proven tail (q90/q91/q95/q59/q96/q97, first
    # in line for r5) and the 45 queries green in CORRECTNESS_r03
    # (WINDOW_r04.md)
    "q90_regexp_ops",
    "q91_python_udtf",
    "q95_random_forest",
    "q59_ols_predict",
    "q96_train_test_split",
    "q97_make_blobs",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's correctness window covers driver-unproven queries first."""
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    for n, fn in QUERIES.items():
        if n not in ordered:
            ordered[n] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return dict(ORACLES)
