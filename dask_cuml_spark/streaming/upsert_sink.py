"""Exactly-once foreachBatch merge sink (the r5 verdict's named
streaming frontier: "exactly-once sinks") — streaming aggregation
upserted into a keyed table with atomic, idempotent commits.

The production pattern this models: Structured Streaming's exactly-once
story is checkpointed offsets (each micro-batch replays deterministically
after failure) PLUS a sink whose writes are idempotent or transactional —
on a real deployment the foreachBatch body is a Delta/Iceberg MERGE.
Without a table format in this container, the same guarantee is built
from primitives:

  - the target table is a family of immutable versioned parquet dirs
    ``v{n}`` plus a one-line pointer file naming the committed version;
  - each batch merges (operators/merge.merge_upsert — keyed upsert, one
    shuffle on the key) the batch's updated per-key totals into the
    CURRENT committed version and writes a NEW version dir;
  - the commit is ``os.replace`` of the pointer file — atomic on POSIX,
    so readers see the old or the new version, never a torn table;
  - a REPLAYED batch (failure between write and checkpoint commit)
    rewrites the same version dir from the same input deterministically
    and re-points — idempotent, each event's effect lands exactly once.

Aggregation runs in update output mode: the state store holds cumulative
per-key totals, so each batch emits full replacement rows for changed
keys and the merge is a pure keyed overwrite (no read-modify-write of
values — exactly what makes replays idempotent). At 100 TB the merge is
the only wide stage (hash-partitioned on the key both sides) and the
version family is a table-format commit log in miniature.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_cuml_spark.operators.merge import merge_upsert
from dask_cuml_spark.streaming import _state_partitions, auto_state_partitions

_POINTER = "COMMITTED"


def _commit(root: str, version: str) -> None:
    tmp = os.path.join(root, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(root, _POINTER))  # atomic commit


def _committed(root: str) -> str:
    with open(os.path.join(root, _POINTER)) as f:
        return f.read().strip()


def stream_upsert_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event totals streamed into a merge-sink table; returns
    the final committed table (user_id, n_events, total_value).

    The target is pre-seeded with stale placeholder rows (-1 totals) for
    the users with user_id < 50, so the merge exercises BOTH paths every
    run: matched keys are UPDATED (updates win), unseen keys INSERTED —
    and the final table still equals the plain batch GROUP BY, which is
    the full-value oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    root = tempfile.mkdtemp(prefix="dcs_upsert_")
    try:
        seed = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter(F.col("user_id") < 50)
            .select("user_id")
            .distinct()
            .select(
                "user_id",
                F.lit(-1).cast("long").alias("n_events"),
                F.lit(-1.0).alias("total_value"),
            )
        )
        seed.write.mode("overwrite").parquet(os.path.join(root, "v0"))
        _commit(root, "v0")

        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        totals = stream.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            cur = spark.read.parquet(os.path.join(root, _committed(root)))
            merged = merge_upsert(
                cur, batch_df, "user_id", ["n_events", "total_value"]
            )
            version = f"v{batch_id + 1}"
            merged.write.mode("overwrite").parquet(
                os.path.join(root, version)
            )
            _commit(root, version)

        with tempfile.TemporaryDirectory() as ckpt, _state_partitions(
            spark, auto_state_partitions(sf_dir)
        ):
            q = (
                totals.writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        final = spark.read.parquet(os.path.join(root, _committed(root)))
        # materialize before the tempdir is removed; the committed table
        # is per-key totals (thousands of rows), not event-sized
        rows = final.orderBy("user_id").collect()
        return spark.createDataFrame(
            rows, "user_id long, n_events long, total_value double"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
