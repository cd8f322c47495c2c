"""Data-layout optimization for scan pruning (§2C sinks, 100 TB path).

At 100 TB the cheapest predicate is the one the scan never evaluates:
parquet footers carry per-row-group min/max statistics, and a reader
(Spark's vectorized parquet reader, DuckDB, Trino, ...) skips any row
group whose [min, max] range cannot satisfy a pushed filter. That only
helps if the writer CLUSTERED the data — on a randomly-ordered table
every row group spans the whole value domain and nothing prunes.

cluster_write is the writer-side half of that contract: range-partition
on the clustering key(s) (total ordering across files via Spark's
range-exchange sampling), then sort within partitions, so each row
group covers a narrow, non-overlapping slice of the key domain. The
effect is measured, not asserted: tests/test_scale_features.py reads
both layouts' footers and counts row groups a range predicate can
touch (clustered ≈ selectivity × total; random = all of them).

This is the single-dimension version of the layout step in every
lakehouse maintenance pipeline (OPTIMIZE ... ZORDER / CLUSTER BY);
for multi-dimensional keys, interleave bits (Z-order) into a derived
column and range-cluster on that — same writer shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.column import Column


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str | Column],
    num_files: int | None = None,
    row_group_bytes: int = 8 << 20,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``.

    repartitionByRange gives a total ordering ACROSS output files
    (Spark samples the key distribution to pick balanced range bounds),
    sortWithinPartitions orders rows INSIDE each file, and
    ``parquet.block.size`` bounds the pruning granularity: smaller row
    groups prune finer but cost more footer overhead. The 8 MB default
    is the demonstration setting; production tables usually keep the
    128 MB default and rely on file-level pruning plus page indexes.
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.option("parquet.block.size", row_group_bytes)
        .mode(mode)
        .parquet(path)
    )


def row_groups_touched(
    path: str, column: str, lo, hi
) -> tuple[int, int]:
    """(touched, total) row groups whose [min, max] stats intersect
    [lo, hi] across every parquet file under ``path`` — the
    engine-independent measure of how much a reader with footer-stats
    pruning must actually scan."""
    import glob
    import os

    import pyarrow.parquet as pq

    touched = total = 0
    files = (
        glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isdir(path)
        else [path]
    )
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                touched += 1  # no stats ⇒ reader must scan
            elif not (st.max < lo or st.min > hi):
                touched += 1
    return touched, total
