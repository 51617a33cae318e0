"""File-based streaming sources.

The reference's only source is Kafka (``main.py:13-32``); for local,
broker-less execution and deterministic tests the engine supports any
Spark file stream (parquet/json/csv) with an explicit schema — the
idiomatic replacement being a parquet directory replayed in
modification-time order.

``maxFilesPerTrigger=1`` replays one fixture file per micro-batch so
watermark progression (and late-row dropping) is observable and
deterministic — SURVEY §5.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_json_dir(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """JSON-lines file stream — format parity with the reference's
    ``'format' = 'json'`` sources (main.py:25)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)
