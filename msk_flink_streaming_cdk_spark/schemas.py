"""Explicit schemas — parity with the reference DDL.

The reference declares three fixed schemas as SQL DDL strings
(``/root/reference/PythonKafkaSink/main.py:13-76``); no inference, no
evolution. We mirror them as StructTypes. ``nullable=False`` mirrors the
DDL ``NOT NULL`` (advisory in Spark — enforced by construction in our
transforms).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input_table — main.py:14-19 (sensor_id VARCHAR(64) NOT NULL,
# temperature BIGINT NOT NULL, event_time TIMESTAMP(3) + 5s watermark).
SENSOR_READING = StructType(
    [
        StructField("sensor_id", StringType(), False),
        StructField("temperature", LongType(), False),
        StructField("event_time", TimestampType(), True),
    ]
)

# output_table_sns — main.py:40-42.
Q1_ALERT_OUTPUT = StructType(
    [
        StructField("sensor_id", StringType(), False),
        StructField("count_temp", LongType(), False),
        StructField("start_event_time", TimestampType(), True),
    ]
)

# output_table_s3 — main.py:61-67, partitioned by (year, month, day,
# hour) per main.py:69.
Q2_AVG_OUTPUT = StructType(
    [
        StructField("sensor_id", StringType(), False),
        StructField("avg_temp", LongType(), False),
        StructField("start_event_time", TimestampType(), True),
        StructField("year", LongType(), True),
        StructField("month", LongType(), True),
        StructField("day", LongType(), True),
        StructField("hour", LongType(), True),
    ]
)

# Driver fixture: events stream table (FIXTURES.md §1).
EVENTS = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

# Driver fixtures: LLM-data-pipeline tables (FIXTURES.md §3).
DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType(), True), True),
        StructField("label", IntegerType(), True),
    ]
)

# Multimodal: opaque binary payload + typed metadata (engine extension;
# image/audio/video are binary columns decoded by mapInPandas UDFs).
MULTIMODAL_ASSET = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("media_type", StringType(), True),  # MIME
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)
