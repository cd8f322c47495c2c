#!/usr/bin/env python
"""Merge-sink under an ACTUAL streaming workload at scale (r7 verdict
task 6): drive the q116 bucketed-manifest sink with a sharded 100×
event stream (availableNow, maxFilesPerTrigger=1 → one micro-batch per
shard) and record per-batch touched buckets, written bytes, and wall —
the streaming-harness evidence the r7 measurement (batch-driven probe)
didn't have.

Two regimes, because write amplification is a property of per-batch KEY
LOCALITY, not of the sink:

  bulk   — 8 shards of the full 10 M-event stream (row-order slices ≈
           arrival order; each micro-batch carries ~19k distinct users
           that hash into every bucket). Expect touched ≈ all buckets:
           a merge sink CANNOT write less than the buckets its keys
           land in — same behavior as a Delta/Iceberg MERGE rewriting
           every touched file. The honest worst case, recorded as such.
  trickle— steady-state upsert: the table already holds all 150k user
           totals; each micro-batch is a correction burst for ~25 hot
           users (late events). Expect touched ≈ ≤25 of 256 buckets and
           written bytes a few % of table bytes — the O(batch) claim,
           now measured under writeStream/foreachBatch instead of a
           hand-driven merge_batch call.

Also replays the trickle stream from a FRESH checkpoint (batch ids
restart at 0 → every version already committed): the monotone replay
guard must no-op every batch and leave the committed pointer and table
bit-identical.

Results merge into SCALEBENCH.json under "upsert_sink_stream_{factor}x".
Usage: python bench_upsert_sink_stream.py [factor]   (default 100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_cuml_spark.session import get_spark  # noqa: E402
from dask_cuml_spark.streaming import (  # noqa: E402
    _state_partitions,
)
from dask_cuml_spark.streaming.upsert_sink import (  # noqa: E402
    _committed,
    _read_manifest,
    init_table,
    merge_batch,
    read_committed,
    version_bytes,
)

N_BUCKETS = 256
N_BULK_SHARDS = 8
N_TRICKLE_SHARDS = 4
TRICKLE_USERS_PER_BATCH = 25


def build_shards(factor: int) -> tuple[str, str]:
    src = f"/tmp/graft_scale{factor}/events.parquet"
    base = f"/tmp/dcs_upsert_stream{factor}"
    bulk, trickle = f"{base}/bulk", f"{base}/trickle"
    if os.path.isdir(bulk) and os.path.isdir(trickle):
        return bulk, trickle
    os.makedirs(bulk, exist_ok=True)
    os.makedirs(trickle, exist_ok=True)
    f = pq.ParquetFile(src)
    n_rg = f.metadata.num_row_groups
    per = -(-n_rg // N_BULK_SHARDS)
    for i in range(N_BULK_SHARDS):
        rgs = list(range(i * per, min((i + 1) * per, n_rg)))
        if not rgs:
            break
        pq.write_table(f.read_row_groups(rgs), f"{bulk}/shard_{i:02d}.parquet")
    # trickle: late-correction bursts for a few hot users per batch —
    # drawn from the same stream so schema/typing are identical
    t = pq.read_table(src)
    import pyarrow.compute as pc

    for i in range(N_TRICKLE_SHARDS):
        lo = i * TRICKLE_USERS_PER_BATCH
        mask = pc.and_(
            pc.greater_equal(t.column("user_id"), lo),
            pc.less(t.column("user_id"), lo + TRICKLE_USERS_PER_BATCH),
        )
        pq.write_table(t.filter(mask), f"{trickle}/shard_{i:02d}.parquet")
    return bulk, trickle


def table_bytes(root: str) -> int:
    buckets, _n, _s = _read_manifest(root, _committed(root))
    total = 0
    for rel in buckets.values():
        d = os.path.join(root, rel)
        for dirpath, _dirs, files in os.walk(d):
            total += sum(
                os.path.getsize(os.path.join(dirpath, f)) for f in files
            )
    return total


def run_stream(spark, src_dir: str, root: str, schema) -> list[dict]:
    """availableNow stream over src_dir, one micro-batch per file, into
    the sink at root. Returns per-batch stats."""
    from pyspark.sql import functions as F

    stats: list[dict] = []

    def sink(batch_df, batch_id):
        t0 = time.perf_counter()
        before = _committed(root)
        merge_batch(
            spark, root, batch_df, batch_id,
            "user_id", ["n_events", "total_value"],
        )
        after = _committed(root)
        row = {"batch_id": int(batch_id), "wall_s": round(time.perf_counter() - t0, 2)}
        if after != before:
            buckets, _n, _s = _read_manifest(root, after)
            touched = sum(1 for rel in buckets.values() if rel.startswith(after + "/"))
            row.update(
                touched_buckets=touched,
                written_bytes=version_bytes(root, after),
                table_bytes=table_bytes(root),
            )
        else:
            row["replay_noop"] = True
        stats.append(row)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    totals = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    with tempfile.TemporaryDirectory() as ckpt, _state_partitions(spark, 8):
        q = (
            totals.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return stats


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    bulk_dir, trickle_dir = build_shards(factor)
    spark = get_spark("dcs-upsert-sink-stream")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    schema = spark.read.parquet(f"{bulk_dir}/shard_00.parquet").schema

    out = {"n_buckets": N_BUCKETS, "factor": factor}

    # ---- bulk regime: build the 150k-user table from 8 micro-batches
    root_a = tempfile.mkdtemp(prefix="dcs_sinkA_")
    root_b = tempfile.mkdtemp(prefix="dcs_sinkB_")
    try:
        seed = (
            spark.read.parquet(f"{bulk_dir}/shard_00.parquet")
            .filter(F.col("user_id") < 50)
            .select("user_id").distinct()
            .select(
                "user_id",
                F.lit(-1).cast("long").alias("n_events"),
                F.lit(-1.0).alias("total_value"),
            )
        )
        init_table(spark, root_a, seed, "user_id", n_buckets=N_BUCKETS)
        t0 = time.perf_counter()
        out["bulk_batches"] = run_stream(spark, bulk_dir, root_a, schema)
        out["bulk_wall_s"] = round(time.perf_counter() - t0, 1)

        # correctness: streamed table == batch GROUP BY over all shards
        final = read_committed(spark, root_a)
        expect = (
            spark.read.parquet(bulk_dir)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value"),
            )
        )
        j = final.select(
            "user_id",
            F.col("n_events").alias("sn"),
            F.col("total_value").alias("sv"),
        ).join(expect, "user_id", "full")
        bad = j.filter(
            F.col("sn").isNull()
            | F.col("n_events").isNull()
            | (F.col("sn") != F.col("n_events"))
            # state sums accumulate per-batch (different float order
            # than the batch GROUP BY) — equality up to 1e-4 after the
            # 6-dp round is the meaningful check at 10M rows
            | (F.abs(F.col("sv") - F.col("total_value")) > 1e-4)
        ).count()
        out["bulk_matches_batch_groupby"] = bad == 0
        assert bad == 0, f"stream/batch mismatch: {bad} users"

        # ---- trickle regime: steady-state table, hot-key bursts
        init_table(
            spark, root_b, final.select("user_id", "n_events", "total_value"),
            "user_id", n_buckets=N_BUCKETS,
        )
        t0 = time.perf_counter()
        out["trickle_batches"] = run_stream(spark, trickle_dir, root_b, schema)
        out["trickle_wall_s"] = round(time.perf_counter() - t0, 1)

        # ---- replay from a FRESH checkpoint: monotone guard must no-op
        before_ptr = _committed(root_b)
        before_rows = read_committed(spark, root_b).count()
        replay = run_stream(spark, trickle_dir, root_b, schema)
        out["replay_batches"] = replay
        out["replay_all_noop"] = all(r.get("replay_noop") for r in replay)
        out["replay_pointer_unchanged"] = _committed(root_b) == before_ptr
        out["replay_rows_unchanged"] = (
            read_committed(spark, root_b).count() == before_rows
        )
        assert out["replay_all_noop"] and out["replay_pointer_unchanged"]
    finally:
        shutil.rmtree(root_a, ignore_errors=True)
        shutil.rmtree(root_b, ignore_errors=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SCALEBENCH.json"
    )
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)
    results[f"upsert_sink_stream_{factor}x"] = out
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
