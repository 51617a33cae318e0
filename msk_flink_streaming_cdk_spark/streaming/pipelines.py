"""The reference's end-to-end streaming job, Spark-first.

Reference shape (``/root/reference/PythonKafkaSink/main.py:146-149``):
one StatementSet executing two INSERTs — Q1 → Kafka alert topic,
Q2 → partitioned S3 — over a shared Kafka scan with a 5s watermark.

Spark analogue: the same Q1/Q2 transforms (operators/reference.py) with
``withWatermark`` in **append** output mode (emission parity with Flink
group windows, SURVEY §2.7 W6), run as two StreamingQueries with
independent checkpoints. Offsets across sinks are independently
committed (documented delta from Flink's single-job atomicity — SURVEY
§7 risk 4); for single-scan fan-out use ``run_single_scan_fanout``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators.reference import q1_high_temp_alerts, q2_windowed_avg

SinkFn = Callable[[DataFrame], object]  # DataFrame -> StreamingQuery

REFERENCE_WATERMARK = "5 seconds"  # main.py:18


def q1_stream(readings: DataFrame, watermark: str = REFERENCE_WATERMARK, **kw) -> DataFrame:
    return q1_high_temp_alerts(readings, watermark=watermark, **kw)


def q2_stream(readings: DataFrame, watermark: str = REFERENCE_WATERMARK, **kw) -> DataFrame:
    return q2_windowed_avg(readings, watermark=watermark, **kw)


def run_reference_pipelines(
    readings: DataFrame,
    q1_sink: SinkFn,
    q2_sink: SinkFn,
    watermark: str = REFERENCE_WATERMARK,
    q1_window: str = "30 seconds",
    q2_window: str = "60 seconds",
) -> list:
    """Start both reference pipelines; returns the StreamingQueries."""
    queries = [
        q1_sink(q1_stream(readings, watermark, window=q1_window)),
        q2_sink(q2_stream(readings, watermark, window=q2_window)),
    ]
    return queries


def run_single_scan_fanout(
    readings: DataFrame,
    q1_batch_sink: Callable[[DataFrame, int], None],
    q2_batch_sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    watermark: str = REFERENCE_WATERMARK,
    trigger: dict | None = None,
):
    """Single-scan multi-sink parity with the reference StatementSet.

    One source scan per micro-batch; the windowed aggregations run as
    *batch* plans inside foreachBatch over the micro-batch — note this
    changes window semantics to per-batch (no cross-batch state), so it
    is only equivalent when micro-batches align with files/segments
    that contain whole windows. Provided for scan-sharing parity; the
    default two-query form keeps exact streaming semantics.
    """
    trigger = trigger or {"availableNow": True}

    def fanout(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            q1_batch_sink(q1_high_temp_alerts(batch_df), batch_id)
            q2_batch_sink(q2_windowed_avg(batch_df), batch_id)
        finally:
            batch_df.unpersist()

    return (
        readings.withWatermark("event_time", watermark)
        .writeStream.foreachBatch(fanout)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )


def with_observed_metrics(df: DataFrame, name: str = "pipeline_metrics"):
    """Attach streaming-safe observed metrics (``df.observe``): row
    count, max event time, and late-ish null count ride along with
    every micro-batch and surface in
    ``StreamingQueryProgress.observedMetrics[name]`` — production
    pipelines alarm on these without a second aggregation pass (the
    metrics are computed inside the existing plan, no extra scan or
    shuffle)."""
    from pyspark.sql import functions as F

    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.max("event_time").alias("max_event_time"),
        F.sum(
            F.when(F.col("temperature").isNull(), 1).otherwise(0)
        ).alias("n_null_temps"),
    )
