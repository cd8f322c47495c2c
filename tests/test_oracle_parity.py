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


def test_every_query_has_oracle_or_is_flagged():
    # Non-SQL-expressible ops are allowed to omit the oracle, but we track
    # them explicitly so the inventory is honest.
    allowed_rows_only = {
        name for name in QUERIES if name not in ORACLES
    }
    # all current declared queries are SQL-oracled unless listed here
    assert all(n.startswith(("q7", "stream_", "rows_")) or n in ORACLES
               for n in QUERIES), f"unexpected rows-only: {allowed_rows_only}"
