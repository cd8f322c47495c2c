#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r17/<q>_<tag>.txt.

Usage: python plans/dump_plans.py <tag> <query substr> [<query substr> ...]
Tag is 'before' or 'after'. Runs against sf0.1 (plan shape, no jobs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dask_cuml_spark.queries  # noqa: E402,F401
from dask_cuml_spark.registry import QUERIES  # noqa: E402
from dask_cuml_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    pats = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dask_cuml_spark-plandump")
    names = [n for n in sorted(QUERIES) if any(p in n for p in pats)]
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN DUMP FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
