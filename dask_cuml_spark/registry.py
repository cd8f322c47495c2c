"""Query registry — the engine's declared operator inventory.

Every operator from SURVEY.md §2 ships as:
  - a PySpark callable (spark, sf_dir) -> DataFrame   → QUERIES[name]
  - an equivalent ANSI-SQL string for DuckDB           → ORACLES[name]
    (omitted for non-SQL-expressible ops → driver does rows-only check)

Registration is done with the @register decorator; importing
``dask_cuml_spark.queries`` populates both dicts.

Determinism contract (FIXTURES.md "oracle-determinism rules"):
  1. Every computed column aliased identically in Spark and SQL.
  2. Every top-k / window gets a total-order tie-break on a unique id.
  3. Double aggregates rounded to fixed precision on BOTH sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
