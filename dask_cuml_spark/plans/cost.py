"""Cost-based physical choices shared across queries.

Catalyst exposes its optimizer size estimate per plan node; these
helpers make the same size-threshold decisions Spark itself makes for
broadcast joins, applied to rewrites Catalyst has no rule for (eager
pre-aggregation, cache-vs-checkpoint for multi-consumer frames).
"""

from __future__ import annotations

import threading as _threading
import weakref as _weakref
from contextlib import contextmanager as _contextmanager

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
# when done"; reworked r17 per the r16 advisor): every cache() whose
# useful life is ONE query invocation is tracked so a long-lived
# session (the 157-query bench suite, a serving daemon) can drop it
# once the query's action has run. Without this, Spark's CacheManager
# holds a strong reference to every entry forever — storage memory
# fills with abandoned blocks that compete with execution memory, and
# plan-cache lookup walks an ever-growing entry list. localCheckpoint
# frames are NOT tracked: their blocks are lineage-truncating
# (unpersist would lose data, not recompute it) and the ContextCleaner
# reclaims them when the frame is garbage collected.
#
# Scoping is REAL now (r16 advisor, medium): a `with scoped_caches():`
# block owns every scoped_cache() registered on the SAME THREAD while
# it is open, so a concurrent driver (serving daemon, thread-pooled
# jobs — guide §2.6) releasing one query's caches can never unpersist
# another in-flight query's frames. scoped_cache() outside any open
# scope falls back to a lock-guarded process-global scope holding WEAK
# references (r16 advisor, low: a process that never releases — the
# pytest suite, library users — must not pin every frame forever;
# dead entries are pruned on append/release, and the JVM CacheManager
# entry for a dropped frame is reclaimed at session stop exactly as it
# was before scoping existed). release_scoped_caches() drains only
# that global fallback scope.


class CacheScope:
    """Explicit registry of cached frames with one owner. Strong refs:
    the owner's lifetime bounds the pin (a bench query's three timed
    runs; one serving request)."""

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def add(self, df: DataFrame) -> None:
        self._frames.append(df)

    def release(self) -> None:
        frames, self._frames = self._frames, []
        for df in frames:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass  # session gone / already unpersisted — nothing to free


_TL = _threading.local()


@_contextmanager
def scoped_caches():
    """Own every scoped_cache() registered on this thread inside the
    block; unpersist them all on exit (normal or exceptional). Nestable:
    the innermost open scope wins."""
    scope = CacheScope()
    stack = getattr(_TL, "stack", None)
    if stack is None:
        stack = _TL.stack = []
    stack.append(scope)
    try:
        yield scope
    finally:
        stack.pop()
        scope.release()


_GLOBAL_LOCK = _threading.Lock()
_GLOBAL_WEAK: list = []  # weakref.ref(DataFrame), pruned as they die


def scoped_cache(df: DataFrame) -> DataFrame:
    """cache() an intermediate scoped to the current query invocation.
    Registered with the innermost scoped_caches() block open on this
    thread, else with the process-global weak fallback scope that
    release_scoped_caches() drains."""
    out = df.cache()
    stack = getattr(_TL, "stack", None)
    if stack:
        stack[-1].add(out)
    else:
        with _GLOBAL_LOCK:
            _GLOBAL_WEAK[:] = [r for r in _GLOBAL_WEAK if r() is not None]
            _GLOBAL_WEAK.append(_weakref.ref(out))
    return out


def release_scoped_caches() -> None:
    """Unpersist every still-live frame in the global fallback scope.
    Only frames registered OUTSIDE any scoped_caches() block land here,
    so a concurrent query running inside its own scope is untouched."""
    with _GLOBAL_LOCK:
        refs, _GLOBAL_WEAK[:] = list(_GLOBAL_WEAK), []
    for r in refs:
        df = r()
        if df is None:
            continue
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
