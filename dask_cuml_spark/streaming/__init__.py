"""Streaming helpers shared across modules."""

from contextlib import contextmanager


@contextmanager
def _state_partitions(spark, n: int):
    """Scope the state-store partition count (= shuffle partitions at the
    stream's FIRST run) to `n`. Local micro-batches pay a fixed cost per
    state partition (~0.5 s saved at n=8 vs 32 on the fixture streams);
    a real cluster sizes this to keyspace/executors instead — the
    checkpoint pins it, so new runs here always use fresh checkpoints."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
