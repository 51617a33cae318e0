"""Synthetic sensor-stream generator — producer parity.

The reference producer Lambda emits 99 records per invocation with
``sensor_id = str(randint(1,5))``, ``temperature = randint(27,32)``,
``event_time = now().isoformat()``
(``/root/reference/LambdaFunctions/kfpLambdaStreamProducer.py:48-57``).

Two forms:
- ``rate_sensor_stream``: unbounded, built on Spark's rate source —
  records/sec instead of records/invocation, deterministic columns
  derived JVM-side from the rate source's ``value`` counter (no Python
  in the hot path; scales to any rows/sec).
- ``batch_sensor_frame``: bounded, seeded, for deterministic tests.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SENSOR_READING


def rate_sensor_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    n_sensors: int = 5,
    temp_min: int = 27,
    temp_max: int = 32,
) -> DataFrame:
    """Unbounded reference-shaped stream from the rate source.

    xxhash64 of the counter gives cheap deterministic pseudo-randomness
    entirely inside codegen (pmod to range) — same distribution shape
    as the reference's randint without leaving the JVM.
    """
    span = temp_max - temp_min + 1
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            (F.pmod(F.xxhash64("value"), F.lit(n_sensors)) + 1)
            .cast("string")
            .alias("sensor_id"),
            (F.pmod(F.xxhash64("value", F.lit(1)), F.lit(span)) + temp_min)
            .cast("long")
            .alias("temperature"),
            F.col("timestamp").alias("event_time"),
        )
    )


def batch_sensor_frame(
    spark: SparkSession,
    n: int = 99,
    seed: int = 42,
    start: datetime | None = None,
    interval_s: float = 1.0,
    n_sensors: int = 5,
    temp_min: int = 27,
    temp_max: int = 32,
) -> DataFrame:
    """Bounded, seeded reference-shaped frame (one producer invocation
    is n=99, kfpLambdaStreamProducer.py:48)."""
    rng = random.Random(seed)
    start = start or datetime(2024, 1, 1)
    rows = [
        (
            str(rng.randint(1, n_sensors)),
            rng.randint(temp_min, temp_max),
            start + timedelta(seconds=i * interval_s),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SENSOR_READING)
