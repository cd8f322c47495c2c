"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
the exact comparison the driver's t2 gate performs."""

from __future__ import annotations

import pytest

import dask_cuml_spark.queries  # noqa: F401 — populate registry
from dask_cuml_spark.registry import ORACLES, QUERIES
from dask_cuml_spark.oracle import run_pair


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    ok, report = run_pair(spark, sf_dir, name)
    assert ok, f"{name}: {report}"


# The explicit rows-only allowlist: iterative fits and hash-seed-specific
# ops whose numeric behavior is pytest-verified instead (SURVEY.md §5.2).
ROWS_ONLY = {
    "q76_kmeans_fit",
    "q77_dbscan",
    "q78_minhash_near_dup",
    "q82_lsh_knn",
    "q83_logreg_predict",
}


def test_every_query_has_oracle_or_is_flagged():
    rows_only = {name for name in QUERIES if name not in ORACLES}
    assert rows_only == ROWS_ONLY, f"unexpected rows-only set: {rows_only}"


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize(
    "name",
    ["q01_pricing_summary", "q60_asof_join", "q20_sessionization", "q06_orders_by_month"],
)
def test_parity_survives_non_utc_session_tz(spark, sf_dir, name):
    """The driver controls the SparkSession; timestamp queries must hash-
    match the (timezone-naive) DuckDB oracle under ANY session timezone."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ok, report = run_pair(spark, sf_dir, name)
        assert ok, f"{name} under non-UTC tz: {report}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
