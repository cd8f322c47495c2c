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
    return df.cache()
