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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return dict(ORACLES)
