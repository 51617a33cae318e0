"""The reference job as a runnable unit — lifecycle parity with
``/root/reference/PythonKafkaSink/main.py:118-153``.

Reference lifecycle: env setup → property resolution → DDL → two
INSERTs in one StatementSet → execute. Spark analogue: session →
config → source builder → Q1/Q2 transforms → two streaming queries
(or Kafka-less file mode for local runs).

Run locally (file mode):
    python -m msk_flink_streaming_cdk_spark.jobs \
        --properties props.json --source-dir in/ --mode file
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession

from .config import ReferenceJobConfig, load_job_config
from .schemas import SENSOR_READING
from .session import get_spark
from .sources.files import stream_parquet_dir
from .sources.kafka import read_kafka_json, sink_options, write_kafka_json
from .streaming.pipelines import run_reference_pipelines
from .streaming.sinks import write_partitioned_files


def run_reference_job(
    spark: SparkSession,
    cfg: ReferenceJobConfig,
    mode: str = "kafka",
    source_dir: str | None = None,
    checkpoint_root: str = "/tmp/spark_graft_checkpoints",
    trigger: dict | None = None,
) -> list:
    """Start the two reference pipelines; returns the StreamingQueries.

    mode="kafka": source/alert-sink on the configured topics (cluster).
    mode="file": parquet-dir source + JSON-file alert sink (local,
    broker-less — the alert sink directory stands in for the topic).
    """
    trigger = trigger or {"availableNow": True}
    if mode == "kafka":
        readings = read_kafka_json(
            spark,
            SENSOR_READING,
            options={
                "kafka.bootstrap.servers": cfg.bootstrap_servers,
                "subscribe": cfg.input_topic,
                "startingOffsets": "earliest",
            },
        )

        def q1_sink(df):
            return write_kafka_json(
                df,
                sink_options(cfg.bootstrap_servers, cfg.output_topic),
                checkpoint=os.path.join(checkpoint_root, "q1"),
                key_col="sensor_id",
            )

    else:
        readings = stream_parquet_dir(
            spark, source_dir, SENSOR_READING, max_files_per_trigger=1
        )

        def q1_sink(df):
            return (
                df.writeStream.format("json")
                .option("path", os.path.join(cfg.output_topic, ""))
                .option(
                    "checkpointLocation", os.path.join(checkpoint_root, "q1")
                )
                .outputMode("append")
                .trigger(**trigger)
                .start()
            )

    def q2_sink(df):
        return write_partitioned_files(
            df,
            cfg.output_path,
            checkpoint=os.path.join(checkpoint_root, "q2"),
            fmt="json",
            trigger=trigger,
        )

    return run_reference_pipelines(readings, q1_sink, q2_sink)


def main() -> None:
    p = argparse.ArgumentParser(description="Run the reference job")
    p.add_argument("--properties", required=True)
    p.add_argument("--mode", choices=["kafka", "file"], default="file")
    p.add_argument("--source-dir")
    p.add_argument("--checkpoint-root", default="/tmp/spark_graft_checkpoints")
    args = p.parse_args()
    if args.mode == "file" and not args.source_dir:
        p.error("--source-dir is required with --mode file")
    cfg = load_job_config(args.properties)
    spark = get_spark(app_name="reference-job")
    queries = run_reference_job(
        spark,
        cfg,
        mode=args.mode,
        source_dir=args.source_dir,
        checkpoint_root=args.checkpoint_root,
    )
    for q in queries:
        q.awaitTermination()


if __name__ == "__main__":
    main()
