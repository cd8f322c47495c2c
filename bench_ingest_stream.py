#!/usr/bin/env python
"""End-to-end incremental-ingest stream at scale (r13 verdict task 5):
provision the stored layouts on a factor-x corpus, then drive
streaming/ingest.run_ingest_stream — a foreachBatch pipeline that
appends parquet micro-batches to the corpus tables and refreshes
grams/signs/pq incrementally per batch — and record the claim that
matters at 100 TB: per-batch refresh seconds are Θ(|batch|) (flat in
corpus size, tiny vs the full rebuild the refresh replaces).

Recorded per run (SCALEBENCH.json "ingest_stream_{factor}x"):
  full_build_sec      one-time layout provisioning at this corpus size
                      (the FAISS train()/add-all analogue — also the
                      cost a NON-incremental design would pay per
                      ingest)
  batches             number of micro-batches streamed
  rows_per_batch      ingest batch size
  stream_wall_sec     whole stream, availableNow start → termination
  batches_per_sec     throughput including append + all three
                      refreshes + manifest rolls
  refresh_sec         per-layout per-batch refresh seconds (mean of
                      the streamed batches)
  rebuild_over_refresh mean speedup of the incremental path vs paying
                      full_build_sec per batch

After the stream a consumer check runs OUTSIDE the timers: the stored
gram table must equal the fresh derivation over the grown corpus
(bit-identity — the same pin the pytest carries at fixture scale).

Usage: SPARK_DRIVER_MEMORY=24g python bench_ingest_stream.py [factor]
       (default 100; --batches=N --rows=N to size the stream)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scale import build_scaled  # noqa: E402
from dask_cuml_spark.layouts import ensure_layouts  # noqa: E402
from dask_cuml_spark.session import get_spark  # noqa: E402
from dask_cuml_spark.streaming.ingest import (  # noqa: E402
    run_ingest_stream,
    synth_staging_files,
)

_LAYOUTS = ("grams", "signs", "pq")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    factor = int(args[0]) if args else 100
    n_batches, rows = 5, 500
    layouts = _LAYOUTS
    for a in sys.argv[1:]:
        if a.startswith("--batches="):
            n_batches = int(a.split("=")[1])
        if a.startswith("--rows="):
            rows = int(a.split("=")[1])
        if a.startswith("--layouts="):
            # r15: postings/cms join the refresh family; the default
            # tuple stays (grams, signs, pq) so the recorded
            # ingest_stream_{N}x rows remain comparable across rounds —
            # a wider run records under its own _{K}layouts key
            layouts = tuple(a.split("=")[1].split(","))

    src = f"/tmp/graft_scale{factor}"
    build_scaled(src, factor, {"documents", "embeddings"})
    # private corpus copy in DIRECTORY form (the append-only contract);
    # the stream mutates it, so never ingest into the shared fixtures
    dst = f"/tmp/graft_ingest{factor}"
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    max_id = 0
    for t in ("documents", "embeddings"):
        tdir = os.path.join(dst, f"{t}.parquet")
        os.makedirs(tdir)
        srcp = os.path.join(src, f"{t}.parquet")
        if os.path.isdir(srcp):
            for i, f in enumerate(sorted(os.listdir(srcp))):
                if not f.startswith(("_", ".")):
                    shutil.copy(
                        os.path.join(srcp, f),
                        os.path.join(tdir, f"part-{i:05d}.parquet"),
                    )
        else:
            shutil.copy(srcp, os.path.join(tdir, "part-00000.parquet"))
        key = "doc_id" if t == "documents" else "vec_id"
        for f in os.listdir(tdir):
            md = pq.ParquetFile(os.path.join(tdir, f))
            for rg in range(md.metadata.num_row_groups):
                idx = md.metadata.schema.to_arrow_schema().get_field_index(
                    key
                )
                st = md.metadata.row_group(rg).column(idx).statistics
                if st is not None and st.max is not None:
                    max_id = max(max_id, int(st.max))

    spark = get_spark("dask_cuml_spark-ingeststream")
    t0 = time.perf_counter()
    full_build = ensure_layouts(spark, dst, layouts=layouts)
    full_build_sec = time.perf_counter() - t0
    print(f"full provisioning: {full_build_sec:.1f}s {full_build}",
          file=sys.stderr)

    staging = os.path.join(dst, "_staging")
    synth_staging_files(staging, n_batches, rows, start_doc_id=max_id + 1)
    t0 = time.perf_counter()
    stats = run_ingest_stream(
        spark, dst, staging, os.path.join(dst, "_ckpt"), layouts=layouts
    )
    stream_wall = time.perf_counter() - t0
    assert len(stats) == n_batches, stats

    # consumer check OUTSIDE the timers: stored ≡ fresh on the grown
    # corpus (grams carries the strictest bit-identity pin)
    import dask_cuml_spark.queries.text as T

    stored = spark.table(T._gram_table(dst)).count()
    fresh = T._positioned_grams(spark, dst).count()
    assert stored == fresh and stored > 0, (stored, fresh)

    mean_refresh = {
        ly: round(
            sum(s["refresh_sec"][ly] for s in stats) / len(stats), 3
        )
        for ly in layouts
    }
    per_batch_total = sum(mean_refresh.values())
    row = {
        "full_build_sec": round(full_build_sec, 2),
        "batches": n_batches,
        "rows_per_batch": rows,
        "stream_wall_sec": round(stream_wall, 2),
        "batches_per_sec": round(n_batches / stream_wall, 3),
        "refresh_sec": mean_refresh,
        "rebuild_over_refresh": round(
            full_build_sec / per_batch_total, 1
        ),
        "consumer_check": "stored grams == fresh derivation (post-stream)",
        "note": (
            "ONE pipeline: foreachBatch appends parquet micro-batches "
            "to the corpus tables and incrementally refreshes "
            "grams+signs+pq per batch (manifest diff -> derive only "
            "the new part -> bucketed append -> tag roll); "
            "rebuild_over_refresh = what a non-incremental design "
            "would pay per ingest, divided by what this one pays"
        ),
    }
    print(json.dumps({"per_batch": stats}, indent=1), file=sys.stderr)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SCALEBENCH.json"
    )
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    key = f"ingest_stream_{factor}x"
    if layouts != _LAYOUTS:
        key = f"ingest_stream_{factor}x_{len(layouts)}layouts"
        row["layouts"] = list(layouts)
    results[key] = row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({"ingest_stream_factor": factor, "row": row}))


if __name__ == "__main__":
    main()
