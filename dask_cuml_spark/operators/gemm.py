"""Blocked dense similarity kernels (reference analogy: cuML's columnar
GPU kernels — per-partition dense math over Arrow batches; SURVEY.md
§1.3 "columnar kernel layer").

Spark expressions can express a dot product (functions/vector.py), but a
2M-pair all-pairs scan is dense linear algebra — the right physical plan
is a per-partition GEMM over Arrow batches (numpy BLAS), i.e. a
pandas-UDF kernel, NOT per-element expression evaluation.

pairwise_similarity_above: A-side streams through mapInPandas in Arrow
batches; the B-side matrix rides in as a task broadcast. At fixture scale
B is collected whole; at 100 TB you block B too (outer loop over B-blocks
joined by block id) — the per-task kernel is unchanged. Numeric note:
numpy GEMM sums in a different order than a sequential fold; results can
differ from the SQL oracle in the last ulp, so thresholds/rounding used
with this kernel must tolerate ~1e-12 relative error (they do: the
fixture similarity distribution puts ~0 mass within 1e-9 of any cut).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PAIR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("sim", DoubleType()),
    ]
)


def pairwise_similarity_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    upper_triangle: bool = True,
) -> DataFrame:
    """All pairs (id_a, id_b, sim=dot) with sim >= threshold.

    One narrow pass over df; the comparison matrix is broadcast.
    """
    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((ids, M))

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, B = bc.value
        for pdf in it:
            A = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = A @ B.T
            mask = sims >= threshold
            if upper_triangle:
                mask &= a_ids[:, None] < b_ids[None, :]
            ai, bi = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ai],
                    "id_b": b_ids[bi],
                    "sim": sims[ai, bi],
                }
            )

    n_parts = spark.sparkContext.defaultParallelism
    return df.select(id_col, vec_col).repartition(n_parts).mapInPandas(
        kernel, _PAIR_SCHEMA
    )
