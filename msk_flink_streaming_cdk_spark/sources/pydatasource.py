"""Custom Python Data Source (Spark 4 DataSource API) — the reference
producer as a first-class ``spark.read.format(...)`` source.

The reference generates its input with a producer Lambda pushing 99
random sensor records per invocation into Kafka
(``/root/reference/LambdaFunctions/kfpLambdaStreamProducer.py:48-57``).
Here the same generator is a REGISTERED SPARK SOURCE: partition-
parallel, deterministic under a seed, no driver-side row building —
``spark.dataSource.register(SensorGenDataSource)`` then
``spark.read.format("sensor_gen").option("n", 99).load()``.

Each partition derives its rows independently from (seed, row index)
via md5 — stable across processes and executors (unlike ``random``
sequences, which would force serial generation, or ``hash()``, which
varies with PYTHONHASHSEED). That per-row addressing is what makes the
source scale: partition k owns row indices [k*chunk, (k+1)*chunk) and
needs no state from partition k-1.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_START = datetime(2024, 1, 1)


def _row_u64(seed: int, idx: int, salt: int) -> int:
    digest = hashlib.md5(f"{seed}:{idx}:{salt}".encode()).digest()
    return int.from_bytes(digest[:8], "big")


def sensor_row(
    seed: int,
    idx: int,
    n_sensors: int = 5,
    temp_min: int = 27,
    temp_max: int = 32,
    interval_s: float = 1.0,
):
    """The deterministic row at index ``idx`` — addressable without
    generating rows 0..idx-1 (the property partition-parallel
    generation needs)."""
    span = temp_max - temp_min + 1
    return (
        str(_row_u64(seed, idx, 0) % n_sensors + 1),
        temp_min + _row_u64(seed, idx, 1) % span,
        _START + timedelta(seconds=idx * interval_s),
    )


class SensorGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 99))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numPartitions", 4))

    def partitions(self):
        chunk = -(-self.n // self.num_partitions)
        parts = []
        for k in range(self.num_partitions):
            lo, hi = k * chunk, min((k + 1) * chunk, self.n)
            if lo < hi:
                parts.append(InputPartition((lo, hi)))
        return parts

    def read(self, partition):
        lo, hi = partition.value
        for idx in range(lo, hi):
            yield sensor_row(self.seed, idx)


class SensorGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: the row index IS the offset. Each micro-batch
    claims [idx, idx + rowsPerBatch); ``readBetweenOffsets`` re-derives
    any committed range exactly (per-row addressing again), which is
    what makes recovery exactly-once — a replayed batch regenerates
    byte-identical rows instead of new random ones (the reference
    producer, by contrast, can only at-least-once)."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rowsPerBatch", 33))

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start):
        lo = start["idx"]
        hi = lo + self.rows_per_batch
        return (
            iter([sensor_row(self.seed, i) for i in range(lo, hi)]),
            {"idx": hi},
        )

    def readBetweenOffsets(self, start, end):
        return iter(
            [sensor_row(self.seed, i)
             for i in range(start["idx"], end["idx"])]
        )


class SensorGenDataSource(DataSource):
    """``format("sensor_gen")`` — reference-producer-shaped rows
    (sensor_id in 1..5 as string, temperature 27..32, 1 Hz event
    times). Batch options: ``n`` (default one producer invocation =
    99), ``seed``, ``numPartitions``. Streaming options: ``seed``,
    ``rowsPerBatch``."""

    @classmethod
    def name(cls):
        return "sensor_gen"

    def schema(self):
        return "sensor_id string, temperature long, event_time timestamp"

    def reader(self, schema):
        return SensorGenReader(self.options)

    def simpleStreamReader(self, schema):
        return SensorGenStreamReader(self.options)
