"""Streaming sinks.

Parity targets:
- Partitioned filesystem sink with per-partition success files and
  JSON format (``/root/reference/PythonKafkaSink/main.py:59-76`` —
  ``PARTITIONED BY (year, month, day, hour)``, ``'format'='json'``,
  ``'sink.partition-commit.policy.kind'='success-file'``).
- Per-record external publisher (the reference's consumer Lambda →
  SNS, ``kfpLambdaConsumerSNS.py:12-23``) as a ``foreachBatch``
  adapter that publishes from executors, never the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def write_partitioned_files(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "json",
    partition_cols: tuple[str, ...] = ("year", "month", "day", "hour"),
    success_file_per_partition: bool = True,
    trigger: dict | None = None,
):
    """Start a partitioned file sink (returns StreamingQuery).

    With ``success_file_per_partition`` a ``foreachBatch`` writer
    appends the micro-batch under Hive-style partition dirs and then
    marks each touched partition with a ``_SUCCESS`` file — the
    reference's partition-commit policy (main.py:74-75). The partition
    list per batch is tiny (distinct partition tuples, not rows), so
    the driver-side marker loop is O(#partitions), not O(rows).

    Delay semantics difference (deliberate): the reference configures
    ``sink.partition-commit.delay = 1 min`` (main.py:74) — Flink holds
    the marker until the partition's watermark passes partition-time +
    1 min. Structured Streaming has no per-partition commit delay;
    here every TOUCHED partition is re-marked at each micro-batch, so
    a marker means "data through this batch is visible", not "this
    hour is closed". Downstream jobs that need closed-hour semantics
    should trigger off the NEXT hour's first marker (or filter on
    partition < current hour); with the default availableNow/minutes-
    level triggers the practical effect matches the reference's 1-min
    lag.
    """
    trigger = trigger or {"availableNow": True}

    if not success_file_per_partition:
        writer = (
            df.writeStream.format(fmt)
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .partitionBy(*partition_cols)
            .outputMode("append")
        )
        return writer.trigger(**trigger).start()

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Cluster rows by partition key before the write: without this
        # every shuffle partition emits a file into every partition dir
        # (tiny-files explosion at scale — observed 19 files for 200
        # rows). One shuffle, ~one file per partition dir per batch.
        batch_df.repartition(*[batch_df[c] for c in partition_cols]).write.mode(
            "append"
        ).partitionBy(*partition_cols).format(fmt).save(path)
        parts = (
            batch_df.select(*partition_cols).distinct().collect()
        )
        # Markers go through the Hadoop FileSystem API so the sink
        # works on any supported scheme (s3a://, hdfs://, file:/) —
        # the parity target is an S3 bucket (main.py:74-75); local
        # os.path calls would silently no-op there.
        spark = batch_df.sparkSession
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for row in parts:
            part_dir = "/".join(
                [path.rstrip("/")] + [f"{c}={row[c]}" for c in partition_cols]
            )
            p = jvm.org.apache.hadoop.fs.Path(part_dir)
            fs = p.getFileSystem(hconf)
            if fs.isDirectory(p):
                out = fs.create(
                    jvm.org.apache.hadoop.fs.Path(part_dir + "/_SUCCESS"),
                    True,
                )
                out.close()

    return (
        df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(**trigger)
        .start()
    )


def foreach_batch_publisher(
    publish: Callable[[dict], None],
) -> Callable[[DataFrame, int], None]:
    """Per-record external publisher (SNS-shaped, consumer Lambda
    parity). ``publish`` must be picklable; it runs on executors via
    ``foreachPartition`` — one client per partition, no driver collect.
    """

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        def publish_partition(rows) -> None:
            for row in rows:
                publish(row.asDict())

        batch_df.foreachPartition(publish_partition)

    return handler


def upsert_latest_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: tuple[str, ...],
    time_col: str,
    num_buckets: int = 64,
    trigger: dict | None = None,
):
    """Streaming upsert into a parquet table keeping the LATEST record
    per key (CDC-compaction target) — idempotent under micro-batch
    replays, so it composes with checkpoint recovery.

    Without a transactional table format there is no MERGE INTO, so
    the scalable pattern is bucket-partitioned overwrite: the target
    is hash-partitioned on ``pmod(xxhash64(keys), num_buckets)`` and
    each micro-batch rewrites ONLY the buckets it touches (dynamic
    partition-overwrite). Cost per batch is proportional to the
    touched buckets' size, not the table size; at 100 TB you would
    raise ``num_buckets`` so a bucket stays executor-sized, or swap
    this sink for a lakehouse MERGE — the operator contract (latest
    row per key, replay-idempotent) is the same.

    The merged frame is ``localCheckpoint``-ed before the write: its
    plan reads the very files the overwrite replaces, and Spark
    refuses (or worse, corrupts) self-overwriting reads unless the
    lineage is cut first.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    trigger = trigger or {"availableNow": True}
    keys = list(key_cols)

    def latest_per_key(frame: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(F.col(time_col).desc())
        return (
            frame.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = latest_per_key(batch_df).withColumn(
            "__bucket",
            F.pmod(F.xxhash64(*keys), F.lit(num_buckets)).cast("int"),
        )
        try:
            existing = spark.read.parquet(path)
            touched = [
                r["__bucket"]
                for r in fresh.select("__bucket").distinct().collect()
            ]
            # partition pruning on the filter: only touched buckets read
            old = existing.filter(F.col("__bucket").isin(touched))
            merged = latest_per_key(old.unionByName(fresh))
        except AnalysisException:
            merged = fresh  # first batch, no target yet
        merged = merged.repartition("__bucket").localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__bucket")
            .parquet(path)
        )

    return (
        df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(**trigger)
        .start()
    )


def memory_sink(df: DataFrame, name: str, trigger: dict | None = None):
    """Append-mode memory sink for deterministic streaming tests."""
    trigger = trigger or {"availableNow": True}
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(**trigger)
        .start()
    )
