"""Importing this package populates the query registry (QUERIES/ORACLES).

Each submodule covers one slice of SURVEY.md §2:
  relational  — B1-B12, B16-B19, C-checklist relational ops
  events      — D6-D8 sessionization / funnel / JSON (events table)
  text        — A11/A14/A15, D1/D2/D4/D5 text + dedup (documents table)
  vector      — A1/A4/A10, D3/D9 vector math, kNN, kmeans (embeddings)
  ml          — A2/A3/A6/A16-A19 stats + linear models
"""

from dask_cuml_spark.queries import relational  # noqa: F401
from dask_cuml_spark.queries import events  # noqa: F401
from dask_cuml_spark.queries import text  # noqa: F401
from dask_cuml_spark.queries import vector  # noqa: F401
from dask_cuml_spark.queries import ml  # noqa: F401
from dask_cuml_spark.queries import streaming_queries  # noqa: F401
from dask_cuml_spark.queries import extended  # noqa: F401
from dask_cuml_spark.queries import pandas_udfs  # noqa: F401
from dask_cuml_spark.queries import extras  # noqa: F401
from dask_cuml_spark.queries import estimators  # noqa: F401
