"""Cost-based physical choices shared across queries.

Catalyst exposes its optimizer size estimate per plan node; these
helpers make the same size-threshold decisions Spark itself makes for
broadcast joins, applied to rewrites Catalyst has no rule for (eager
pre-aggregation, cache-vs-checkpoint for multi-consumer frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Above this estimated input size, a multi-consumer frame switches from
# cache() to a lazy localCheckpoint(): lineage is truncated (each
# consumer re-reads materialized partitions instead of re-running the
# producing stages on cache miss) and the blocks live in the executors'
# block store with disk spill instead of pinning unified memory the
# downstream shuffles want. 64 MB matches the q02 eager-agg gate — far
# below any cluster-scale input, far above every local fixture. On a
# real cluster with executor churn, swap localCheckpoint for a reliable
# checkpoint() to the cluster FS; the decision shape is identical.
REUSE_CHECKPOINT_MIN_BYTES = 64 << 20


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a frame (no job is run)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def persist_for_reuse(
    df: DataFrame, threshold: int = REUSE_CHECKPOINT_MIN_BYTES
) -> DataFrame:
    """Persist a frame that feeds multiple consumers: cache() at fixture
    scale, lazy localCheckpoint() above the size threshold."""
    if plan_size_bytes(df) >= threshold:
        return df.localCheckpoint(eager=False)
    return scoped_cache(df)


# Query-scoped cache registry (optimization r16, guide §5 "unpersist
# when done"): every cache() whose useful life is ONE query invocation
# is tracked here so a long-lived session (the 157-query bench suite, a
# serving daemon) can drop it once the query's action has run. Without
# this, Spark's CacheManager holds a strong reference to every entry
# forever — storage memory fills with abandoned blocks that compete
# with execution memory, and plan-cache lookup walks an ever-growing
# entry list. localCheckpoint frames are NOT tracked: their blocks are
# lineage-truncating (unpersist would lose data, not recompute it) and
# the ContextCleaner reclaims them when the frame is garbage collected.
_SCOPED: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """cache() an intermediate scoped to the current query invocation."""
    out = df.cache()
    _SCOPED.append(out)
    return out


def release_scoped_caches() -> None:
    """Unpersist every query-scoped cache registered since the last
    release. Safe at any point after the owning query's action has
    completed; frames cached under a stopped session are skipped."""
    global _SCOPED
    scoped, _SCOPED = _SCOPED, []
    for df in scoped:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session gone / already unpersisted — nothing to free


# One shuffle partition per this many bytes of COMPRESSED fact input
# (≈128–256 MB decompressed in memory — the standard cluster guidance
# of partitions sized to fit an executor's task memory). Calibrated on
# the measured q02 300× point: 32 default partitions over ~4.2 GB of
# parquet hit AGGREGATE_OUT_OF_MEMORY; the hand-found 128 works and
# equals ceil(4.2 GB / 32 MB) — so the rule reproduces the proven
# setting instead of hand-tuning each scale.
SHUFFLE_PARTITION_BYTES = 32 << 20


def suggest_shuffle_partitions(*paths: str, floor: int | None = None) -> int:
    """Partitions sized to the DATA, not the cores (the q02 300×
    lesson, r8): max(cores, total compressed input / 32 MB). ``paths``
    are the fact files/dirs a workload actually reads — dimensions are
    noise. Deployments pass the rule's output to
    spark.sql.shuffle.partitions (or let AQE coalesce down from it);
    the bench harnesses use it for factor ≥ 300 fixtures so big-factor
    rows are produced by the rule, not per-run knob fiddling."""
    import os

    total = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
        else:
            for dirpath, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(dirpath, f)) for f in files
                )
    floor = floor or (os.cpu_count() or 8)
    return max(floor, -(-total // SHUFFLE_PARTITION_BYTES))
