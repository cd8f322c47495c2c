"""Skew-handling utilities (SURVEY.md §7 M6; the 100 TB reality that a
few hot keys dominate joins/aggregations).

salted_join — classic salting: the skewed (left) side scatters each row
to one of `salt` sub-keys; the small/right side replicates ×salt. The
join key becomes (key, salt) so a hot key spreads over `salt` tasks.
AQE's skew-join split handles moderate skew automatically (enabled in
session.py); salting is for the pathological keys AQE can't split (e.g.
a single key larger than an executor).

salted_global_agg — two-phase aggregation for skewed/global aggregates:
partial agg on (key, salt), final agg on key. Spark already does partial
aggregation for algebraic functions; this helper exists for
collect_list-style holistic aggs where map-side combine doesn't bound
state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Correct for inner/left joins on an equi-key; result equals
    left.join(right, on, how) row-for-row.
    """
    # Deterministic salt (r16; guide §2.5 / SPARK-38388): rand(seed) is
    # only replay-stable while the scan's row order is — after a fetch
    # failure re-runs part of a map stage downstream of any shuffle,
    # re-drawn values can duplicate or lose rows. Hashing the whole row
    # is retry-stable; identical full rows share a salt (harmless for
    # key-spreading — hot KEYS still scatter because payloads vary).
    salted_left = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*left.columns, F.lit(seed)), F.lit(salt)).cast(
            "int"
        ),
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(salted_right, [on, "_salt"], how)
    return out.drop("_salt")


def salted_global_agg(
    df: DataFrame,
    key: str,
    agg_col: Column,
    alias: str,
    merge: str = "sum",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase agg: groupBy(key, salt) partial, then groupBy(key)
    merge. `merge` must be the combiner for `agg_col` ('sum','min',
    'max')."""
    # deterministic salt — same SPARK-38388 rationale as salted_join
    partial = (
        df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*df.columns, F.lit(seed)), F.lit(salt)).cast(
                "int"
            ),
        )
        .groupBy(key, "_salt")
        .agg(agg_col.alias("_partial"))
    )
    merge_fn = {"sum": F.sum, "min": F.min, "max": F.max}[merge]
    return partial.groupBy(key).agg(merge_fn("_partial").alias(alias))
