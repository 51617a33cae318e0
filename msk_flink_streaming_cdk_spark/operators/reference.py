"""The two reference queries as reusable DataFrame transforms.

Source semantics: ``/root/reference/PythonKafkaSink/main.py:79-96``.
Both transforms work unchanged on batch and streaming DataFrames
(Structured Streaming's unified model): pass ``watermark=`` for the
streaming path (reference: 5s bounded out-of-orderness, main.py:18) and
run the sink in append mode so only watermark-finalized windows emit —
the Flink group-window emission semantics (SURVEY §2.7 W6).

Everything here is built-in Catalyst-optimizable DataFrame API: the
``temperature > threshold`` filter is pushed below the window aggregate
and into the parquet scan, the aggregation runs partial+final hash agg,
and the HAVING is a Filter above the Aggregate — identical plan shape to
what the Blink planner produced for the Flink SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def q1_high_temp_alerts(
    readings: DataFrame,
    window: str = "30 seconds",
    temp_threshold: int = 30,
    count_threshold: int = 3,
    watermark: str | None = None,
) -> DataFrame:
    """High-temperature alert counts (reference Q1, main.py:79-86).

    SELECT sensor_id, count(*), TUMBLE_START(event_time, 30s)
    FROM input_table WHERE temperature > 30
    GROUP BY TUMBLE(event_time, 30s), sensor_id HAVING count(*) > 3
    """
    if watermark is None:
        # Batch: pre-aggregation filter — Catalyst pushes it into the
        # parquet scan (cheapest plan; watermark semantics moot).
        grouped = (
            readings.filter(F.col("temperature") > temp_threshold)
            .groupBy(F.window("event_time", window), "sensor_id")
            .agg(F.count("*").alias("count_temp"))
        )
    else:
        # Streaming: a pre-aggregation filter would be pushed BELOW
        # the EventTimeWatermark operator (Catalyst pushes non-
        # watermark-column predicates through it), so cold readings
        # would stop advancing the watermark and windows would only
        # finalize when hot rows arrive. Flink generates watermarks at
        # the source from ALL records (main.py:18) — parity requires
        # the same here, so filter INSIDE the aggregate instead:
        # count only hot rows while every row advances the watermark.
        # Result rows are identical (cold-only windows count 0 and
        # fall to the HAVING threshold).
        grouped = (
            readings.withWatermark("event_time", watermark)
            .groupBy(F.window("event_time", window), "sensor_id")
            .agg(
                F.count(
                    F.when(F.col("temperature") > temp_threshold, 1)
                ).alias("count_temp")
            )
        )
    return grouped.filter(F.col("count_temp") > count_threshold).select(
        "sensor_id",
        "count_temp",
        F.col("window.start").alias("start_event_time"),
    )


def q2_windowed_avg(
    readings: DataFrame,
    window: str = "60 seconds",
    watermark: str | None = None,
) -> DataFrame:
    """Per-sensor windowed average with time-part columns (Q2,
    main.py:90-96), sink-partitioned by year/month/day/hour
    (main.py:69).

    Flink's AVG(BIGINT) returns BIGINT (truncating); Spark's avg returns
    DOUBLE — ``floor(...).cast(long)`` restores the declared BIGINT
    output type (main.py:62; SURVEY §1.3).
    """
    df = readings
    if watermark is not None:
        df = df.withWatermark("event_time", watermark)
    return (
        df.groupBy(F.window("event_time", window), "sensor_id")
        .agg(F.floor(F.avg("temperature")).cast("long").alias("avg_temp"))
        .select(
            "sensor_id",
            "avg_temp",
            F.col("window.start").alias("start_event_time"),
        )
        .select(
            "*",
            F.year("start_event_time").cast("long").alias("year"),
            F.month("start_event_time").cast("long").alias("month"),
            F.dayofmonth("start_event_time").cast("long").alias("day"),
            F.hour("start_event_time").cast("long").alias("hour"),
        )
    )
