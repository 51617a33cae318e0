"""Driver-fixture parquet loaders (TESTDATA.md).

All batch inputs come from ``/root/testdata/sf*/<table>.parquet``. The
``sensor_readings`` adapter maps the generic ``events`` fixture onto the
reference's input_table shape (FIXTURES.md §1 mapping: ``user_id`` →
``sensor_id`` string, ``value`` → ``temperature`` BIGINT via floor,
``ts`` → ``event_time``), matching the producer record shape at
``/root/reference/LambdaFunctions/kfpLambdaStreamProducer.py:50-54``.

``floor`` (not cast) is used for the double→BIGINT mapping so Spark and
the DuckDB oracle agree (Spark cast truncates, DuckDB cast rounds).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The NTZ→LTZ normalization below is value-preserving only when the
    # session renders naive timestamps in UTC; fail loudly on an untuned
    # session instead of silently shifting epochs vs the DuckDB oracle.
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"fixture loader requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}); call session.tune(spark) or build via "
            f"session.get_spark()"
        )
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Older fixture builds store ts as parquet TIMESTAMP(NANOS):
        # read as long nanos (spark.sql.legacy.parquet.nanosAsLong) and
        # truncate to micros, matching DuckDB's nanos→TIMESTAMP truncation.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Parquet micros timestamps without isAdjustedToUTC read as
    # TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ default. The
    # engine binds naive wall-clock to UTC (session tz — SURVEY §7 risk
    # 3), so NTZ→LTZ cast preserves every value while restoring the
    # epoch/arithmetic surface (cast-to-bigint, unix_timestamp) that
    # TIMESTAMP_NTZ forbids — same values the DuckDB oracle reads.
    # Scope: top-level columns only; no fixture nests timestamps inside
    # struct/array/map (walk df.schema recursively if one ever does).
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture as a temp view for the SQL front door."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sensor_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture → reference input_table shape (main.py:14-19)."""
    return load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("sensor_id"),
        F.floor("value").cast("long").alias("temperature"),
        F.col("ts").alias("event_time"),
    )


# DuckDB CTE equivalent of sensor_readings, reused by oracle SQL.
SENSOR_READINGS_SQL = (
    "SELECT CAST(user_id AS VARCHAR) AS sensor_id, "
    "CAST(floor(value) AS BIGINT) AS temperature, "
    "ts AS event_time FROM events"
)


def sensor_readings_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified input_table slice: the producer's exact shape — FIVE
    sensors (``randint(1,5)``, kfpLambdaStreamProducer.py:51) — at a
    rate where the reference's exact 30 s / HAVING>3 parameters
    (main.py:79-86) produce non-trivial output on the fixtures.

    The 30-day sparse events timeline folds onto one hour
    (``epoch % 3600``) and user_ids onto 5 sensors (``% 5 + 1``), both
    deterministic and DuckDB-reproducible — no synthesized data."""
    return load_table(spark, sf_dir, "events").select(
        ((F.col("user_id") % 5) + 1).cast("string").alias("sensor_id"),
        F.floor("value").cast("long").alias("temperature"),
        F.timestamp_seconds(F.col("ts").cast("long") % 3600).alias(
            "event_time"
        ),
    )


SENSOR_READINGS_DENSE_SQL = (
    "SELECT CAST(user_id % 5 + 1 AS VARCHAR) AS sensor_id, "
    "CAST(floor(value) AS BIGINT) AS temperature, "
    "make_timestamp((CAST(floor(epoch(ts)) AS BIGINT) % 3600) * 1000000)"
    " AS event_time FROM events"
)
