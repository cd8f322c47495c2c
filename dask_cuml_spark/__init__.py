"""dask_cuml_spark — a PySpark-native analytics/ML engine with the query and
data-processing capabilities of rapidsai/dask-cuml (distributed scikit-learn
style estimators over partitioned columnar data), re-expressed Spark-first.

Architecture (see SURVEY.md):
  - session.py   SparkSession factory (Arrow on, AQE on)
  - io.py        fixture/table loading (parquet star schema + events/docs/vecs)
  - registry.py  query registry: every operator ships as a (PySpark callable,
                 DuckDB oracle SQL) pair — the correctness contract
  - queries/     declared operator inventory (SURVEY.md §2)
  - functions/   vector math, text helpers (built on Spark higher-order fns)
  - operators/   ML operators: OLS/ridge, kmeans, kNN, dedup, scalers
  - streaming/   Structured Streaming variants (sessionization etc.)

Everything here is public-knowledge PySpark; the reference (dask-cuml) is a
Dask+CUDA task-graph engine — we deliberately map its collectives onto Spark
shuffle/aggregate instead of translating its code (SURVEY.md §3, §4).
"""

from dask_cuml_spark.session import get_spark
from dask_cuml_spark.io import load_tables, TABLES
from dask_cuml_spark.registry import QUERIES, ORACLES, register

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "load_tables",
    "TABLES",
    "QUERIES",
    "ORACLES",
    "register",
    "__version__",
]
