"""Nearest neighbors (reference: dask_cuml/neighbors/nearest_neighbors.py
— per-GPU brute-force FAISS shards + global distance-ordered top-k merge;
SURVEY.md §2A A4, §3.2).

Two physical strategies, same semantics:

  brute_force_knn — broadcast the (small) query set against the candidate
  scan, window top-k per query. Shard-local top-k then merge is exactly
  what Spark does physically: each partition ranks its rows, the window
  shuffle merges per query_id. Right choice when queries are few
  (reference's kneighbors(Q) with modest Q).

  lsh_knn — random-hyperplane LSH: bucket candidates and queries by the
  sign-pattern of h random projections, join on bucket, top-k within
  bucket union. Approximate, but the candidate side shuffles once on an
  8-byte key — the 100-TB path (SURVEY §7 M6). Multiple tables raise
  recall.

Both keep all math JVM-side (functions.vector).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dask_cuml_spark.functions.vector import l2_sq


def brute_force_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    query_vec: str = "qv",
    cand_id: str = "neighbor_id",
    cand_vec: str = "cv",
    exclude_same_id: bool = False,
) -> DataFrame:
    """Exact kNN: (query_id, neighbor_id, dist, rk), deterministic
    (dist, id) tie-break."""
    pairs = candidates.crossJoin(F.broadcast(queries))
    if exclude_same_id:
        pairs = pairs.filter(F.col(query_id) != F.col(cand_id))
    pairs = pairs.select(
        query_id, cand_id, l2_sq(query_vec, cand_vec).alias("dist_sq")
    )
    w = Window.partitionBy(query_id).orderBy("dist_sq", cand_id)
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            query_id,
            cand_id,
            F.sqrt("dist_sq").alias("dist"),
            "rk",
        )
    )


def _bucket_expr(vec_col: str, planes: np.ndarray):
    """Sign-pattern bucket id of a vector against h hyperplanes, as a
    single integer column (bit i = sign of projection i)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col), lit_plane, lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_knn(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    query_id: str = "query_id",
    query_vec: str = "qv",
    cand_id: str = "neighbor_id",
    cand_vec: str = "cv",
) -> DataFrame:
    """Approximate kNN via random-hyperplane LSH (multi-table).

    At scale: candidates shuffle once on (table, bucket); each bucket
    holds ~N/2^h rows so the per-bucket cross product is bounded.
    """
    rng = np.random.default_rng(seed)
    all_planes = [rng.standard_normal((n_planes, dim)) for _ in range(n_tables)]

    def with_buckets(df: DataFrame, vec: str) -> DataFrame:
        # all tables' buckets in ONE pass over the input (posexplode of a
        # bucket array) — one scan + one join total, not n_tables unions
        buckets = F.array(
            *[_bucket_expr(vec, planes) for planes in all_planes]
        )
        return df.select(
            "*", F.posexplode(buckets).alias("_table", "_bucket")
        )

    cb = with_buckets(candidates, cand_vec)
    qb = with_buckets(queries, query_vec)
    deduped = (
        cb.join(F.broadcast(qb), ["_table", "_bucket"])
        .select(query_id, cand_id, query_vec, cand_vec)
        .dropDuplicates([query_id, cand_id])
    )
    pairs = deduped.select(
        query_id, cand_id, l2_sq(query_vec, cand_vec).alias("dist_sq")
    )
    w = Window.partitionBy(query_id).orderBy("dist_sq", cand_id)
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, cand_id, F.sqrt("dist_sq").alias("dist"), "rk")
    )
