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


# Round 3: the former rows-only set (iterative fits, hash-seed-specific
# ops) now carries full-value or invariant oracles — the driver records
# err:no_oracle instead of a rows-only check, so anything here would be
# invisible to the hard gate (VERDICT r2 #1). Keep the set empty.
def test_every_query_has_oracle():
    rows_only = {name for name in QUERIES if name not in ORACLES}
    assert rows_only == set(), f"oracle-less queries: {rows_only}"


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
