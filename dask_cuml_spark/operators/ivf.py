"""IVF (inverted-file) approximate nearest-neighbor index — the coarse-
quantizer scale path for embedding search (task brief: "an IVF or
LSH-bucketed variant as the scale path"; complements operators/knn.lsh_knn).

Design (FAISS IVF-Flat, re-expressed relationally):
  fit:    k-means coarse centroids (operators/kmeans.KMeans — GEMM
          kernel); every candidate assigned to its nearest cell → a
          DataFrame partitioned/bucketable by cell_id.
  search: each query probes its nprobe nearest cells only; candidates
          join on cell_id (8-byte key — the shuffle the brute-force
          crossJoin avoids paying at 100 TB), exact distances within the
          probed cells, window top-k.

Recall/cost knob: nprobe/n_cells. With near-orthogonal fixture vectors
cells are balanced (~n/n_cells each), so probing p cells scans p/n_cells
of the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dask_cuml_spark.functions.vector import l2_sq
from dask_cuml_spark.operators.kmeans import KMeans, _assignment_expr


@dataclass
class IVFIndex:
    n_cells: int = 16
    kmeans_iters: int = 5
    centers_: np.ndarray | None = field(default=None, init=False)
    cells_: DataFrame | None = field(default=None, init=False)
    id_col_: str = field(default="vec_id", init=False)
    vec_col_: str = field(default="embedding", init=False)

    def fit(
        self,
        candidates: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        km = KMeans(k=self.n_cells, max_iter=self.kmeans_iters).fit(
            candidates, vec_col=vec_col, id_col=id_col
        )
        self.centers_ = km.cluster_centers_
        self.cells_ = candidates.withColumn(
            "cell_id", _assignment_expr(vec_col, self.centers_)
        ).cache()
        self.id_col_, self.vec_col_ = id_col, vec_col
        return self

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 4,
        query_id: str = "query_id",
        query_vec: str = "qv",
    ) -> DataFrame:
        """(query_id, neighbor_id, dist, rk) — exact within probed cells."""
        assert self.cells_ is not None, "call fit() first"
        # nprobe nearest cells per query, as a probe list (small: queries
        # are few; at scale this stays a broadcast)
        probe_cols = []
        for cid, center in enumerate(self.centers_):
            lit_center = F.array(*[F.lit(float(v)) for v in center])
            d = F.aggregate(
                F.zip_with(
                    F.col(query_vec),
                    lit_center,
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            probe_cols.append(F.struct(d.alias("d"), F.lit(cid).alias("cid")))
        probes = (
            queries.select(
                "*",
                F.explode(
                    F.slice(F.array_sort(F.array(*probe_cols)), 1, nprobe)
                ).alias("_probe"),
            )
            .withColumn("cell_id", F.col("_probe.cid"))
            .drop("_probe")
        )
        pairs = self.cells_.join(F.broadcast(probes), "cell_id").select(
            query_id,
            F.col(self.id_col_).alias("neighbor_id"),
            l2_sq(query_vec, self.vec_col_).alias("dist_sq"),
        )
        w = Window.partitionBy(query_id).orderBy("dist_sq", "neighbor_id")
        return (
            pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(
                query_id, "neighbor_id", F.sqrt("dist_sq").alias("dist"), "rk"
            )
        )
