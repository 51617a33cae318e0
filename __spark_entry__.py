"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reference query (Q1 high-temperature
alerts, ``/root/reference/PythonKafkaSink/main.py:79-86``) on the
sf0.001 fixtures. ``queries()``/``oracle_sql()`` expose the full
registered operator inventory (SURVEY §2 + LLM-pipeline extension) from
``msk_flink_streaming_cdk_spark.registry``.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

# PySpark's non-Arrow collect() renders TimestampType as naive local-tz
# datetimes; the DuckDB oracle is naive-UTC. Pin the process tz so
# timestamp value-hashes are deterministic on any host.
os.environ["TZ"] = "UTC"
if hasattr(time, "tzset"):
    time.tzset()

from pyspark.sql import DataFrame, SparkSession

from msk_flink_streaming_cdk_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>=0."""
    return QUERIES["q1_alerts_daily"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle for each SQL-expressible query."""
    return dict(ORACLES)
