#!/usr/bin/env python
"""Reproduce the round-8 co-located-layout A/Bs (SCALEBENCH rows
`q02_revenue_by_nation_bucketed_layout` and
`q121_boilerplate_ngrams_gram_layout`).

Both layouts are the same warehouse decision — pay one bucketed write
per table, amortized across every query that joins/groups on the bucket
key — applied to the two residuals the plain shapes could not close:

  q02   orders+lineitem bucketBy(orderkey): the one mandatory wide-join
        input exchange (60 M rows at 100×) disappears; ShuffledHashJoin
        runs straight off the bucketed scans.
  q121  exploded (doc_id, xxhash64 5-gram) pairs bucketBy(_h): the
        inverted-index layout — query-time gram construction AND the
        wide window exchange both disappear.

Protocol per query: plain shape timed first (min-of-3, warm, table
cache ON — same as the recorded SCALEBENCH rows), layout written
(timed), layout shape timed, VALUE PARITY asserted between the two,
contemporaneous DuckDB oracle timed on the same fixture. Results merge
into SCALEBENCH.json under the *_layout keys.

Usage: python bench_layouts.py [factor]   (default 100; the factor-x
fixture must exist under /tmp/graft_scale{factor} — bench_scale.py
builds it)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dask_cuml_spark.queries  # noqa: F401 — populate registry
import dask_cuml_spark.queries.relational as rel
import dask_cuml_spark.queries.text as T
from dask_cuml_spark.io import enable_table_cache
from dask_cuml_spark.registry import ORACLES, QUERIES
from dask_cuml_spark.session import get_spark


def timed3(fn, label):
    fn()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rows = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f} s", flush=True)
    return best, sorted(tuple(r) for r in rows)


def duck_timed(sf_dir, name, tables):
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    sql = ORACLES[name]
    con.execute(sql).df()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).df()
        best = min(best, time.perf_counter() - t0)
    con.close()
    print(f"duckdb {name}: {best:.3f} s", flush=True)
    return best


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf = f"/tmp/graft_scale{factor}"
    assert os.path.isdir(sf), f"{sf} missing — run bench_scale.py {factor}"
    spark = get_spark("bench-layouts")
    enable_table_cache(True)
    out = {}

    # ---- q02: bucketed co-located layout
    bo, bl = rel._q02_bucket_tables(sf)
    spark.sql(f"DROP TABLE IF EXISTS {bo}")
    spark.sql(f"DROP TABLE IF EXISTS {bl}")
    t_plain, rows_plain = timed3(
        lambda: QUERIES["q02_revenue_by_nation"](spark, sf).collect(),
        "q02 plain",
    )
    w02 = rel.q02_bucketed_layout(spark, sf)
    print(f"q02 layout write: {w02:.1f} s", flush=True)
    # the gate composes the layout with whichever join shape the
    # customer-size cap picks: 'bucketed' (bcast-cmap over bucketed
    # scans) below the cap, 'bucketed-eager' (eager-agg over bucketed
    # scans) above it — at 300x the latter, and the session must be
    # SF-sized (SPARK_DRIVER_MEMORY=24g SPARK_GRAFT_SHUFFLE_PARTITIONS=128
    # reproduces the recorded 300x row)
    branch02 = rel.q02_plan_branch(spark, sf)
    assert branch02 in ("bucketed", "bucketed-eager"), branch02
    t_lay, rows_lay = timed3(
        lambda: QUERIES["q02_revenue_by_nation"](spark, sf).collect(),
        f"q02 {branch02}",
    )
    assert rows_plain == rows_lay, "q02 VALUE MISMATCH"
    d02 = duck_timed(
        sf, "q02_revenue_by_nation",
        ["orders", "lineitem", "customer", "nation", "region"],
    )
    out["q02_revenue_by_nation_bucketed_layout"] = {
        "branch": branch02,
        "spark_sec": round(t_lay, 3),
        "duckdb_sec": round(d02, 3),
        "ratio": round(t_lay / d02, 2),
        "plain_shape_contemporaneous_sec": round(t_plain, 3),
        "layout_write_once_sec": round(w02, 1),
        "n_buckets": rel._Q02_BUCKETS,
    }
    spark.sql(f"DROP TABLE IF EXISTS {bo}")
    spark.sql(f"DROP TABLE IF EXISTS {bl}")

    # ---- q121: inverted-index gram layout
    tbl = T._q121_gram_table(sf)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    t_plain, rows_plain = timed3(
        lambda: QUERIES["q121_boilerplate_ngrams"](spark, sf).collect(),
        "q121 plain",
    )
    w121 = T.q121_gram_layout(spark, sf)
    print(f"q121 layout write: {w121:.1f} s", flush=True)
    t_lay, rows_lay = timed3(
        lambda: QUERIES["q121_boilerplate_ngrams"](spark, sf).collect(),
        "q121 gram-layout",
    )
    assert rows_plain == rows_lay, "q121 VALUE MISMATCH"
    d121 = duck_timed(sf, "q121_boilerplate_ngrams", ["documents"])
    out["q121_boilerplate_ngrams_gram_layout"] = {
        "branch": "gram-layout",
        "spark_sec": round(t_lay, 3),
        "duckdb_sec": round(d121, 3),
        "ratio": round(t_lay / d121, 2),
        "plain_shape_contemporaneous_sec": round(t_plain, 3),
        "layout_write_once_sec": round(w121, 1),
        "n_buckets": T._Q121_BUCKETS,
    }
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SCALEBENCH.json"
    )
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)
    label = f"{factor}x"
    results.setdefault(label, {})
    for k, v in out.items():
        # keep any hand-recorded note, refresh the numbers
        prior = results[label].get(k, {})
        if "note" in prior:
            v["note"] = prior["note"]
        results[label][k] = v
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
