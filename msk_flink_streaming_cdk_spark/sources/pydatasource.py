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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


# --- per-record publish SINK (Spark 4 DataSource write API) -----------------


@dataclass
class _PublishCommit(WriterCommitMessage):
    staged: str
    n_rows: int


def _publish_rows(iterator, staging_dir: str):
    """Executor-side: serialize each row as one JSON message (the
    reference consumer publishes per record,
    ``kfpLambdaConsumerSNS.py:12-23``) into a uniquely-named staged
    file. Returns the commit message for the driver."""
    import json as _json
    import os as _os
    import uuid as _uuid

    _os.makedirs(staging_dir, exist_ok=True)
    staged = _os.path.join(staging_dir, f"part-{_uuid.uuid4().hex}.jsonl")
    n = 0
    with open(staged, "w") as f:
        for row in iterator:
            d = row.asDict(recursive=True)
            for k, v in d.items():
                if hasattr(v, "isoformat"):
                    d[k] = v.isoformat(sep=" ")
            f.write(_json.dumps(d, sort_keys=True) + "\n")
            n += 1
    return _PublishCommit(staged=staged, n_rows=n)


def _clear_staging(staging_dir: str) -> None:
    """Remove every leftover staged file after a commit/abort has
    processed its messages. Task attempts that crashed before
    returning a commit message (or speculative/retried attempts)
    leave orphan staged files no message ever references; by the time
    the driver finishes commit/abort, every surviving file in
    ``_staging`` is garbage by construction (ADVICE r5)."""
    import glob as _glob
    import os as _os

    for leftover in _glob.glob(_os.path.join(staging_dir, "part-*.jsonl")):
        try:
            _os.remove(leftover)
        except OSError:
            pass


class RecordPublishWriter(DataSourceWriter):
    """Batch writer with a stage-then-commit protocol: tasks write to
    ``<path>/_staging``; only the driver's ``commit`` (all tasks
    succeeded) renames the staged files into ``path``, and ``abort``
    deletes them — a failed/retried task can never leak partial
    output into the visible directory. Targeting a real external
    service instead of files, the same protocol holds: stage =
    idempotent publish with a batch token, commit = token activation.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("record_publish requires option 'path'")

    def write(self, iterator):
        import os as _os

        return _publish_rows(iterator, _os.path.join(self.path, "_staging"))

    def commit(self, messages):
        import os as _os

        for m in messages:
            if m is None:
                continue
            final = _os.path.join(self.path, _os.path.basename(m.staged))
            _os.replace(m.staged, final)
        _clear_staging(_os.path.join(self.path, "_staging"))

    def abort(self, messages):
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.staged):
                _os.remove(m.staged)
        _clear_staging(_os.path.join(self.path, "_staging"))


class RecordPublishStreamWriter(DataSourceStreamWriter):
    """Streaming variant: per micro-batch stage-then-commit. Committed
    files are prefixed with the epoch id, so replays of an epoch after
    a failure overwrite deterministically instead of duplicating —
    the file-shaped analogue of an idempotent per-epoch publish."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("record_publish requires option 'path'")

    def write(self, iterator):
        import os as _os

        return _publish_rows(iterator, _os.path.join(self.path, "_staging"))

    def commit(self, messages, batchId):
        import glob as _glob
        import os as _os

        # A replayed epoch may legitimately produce FEWER files than a
        # prior partially-committed attempt (fewer partitions after a
        # repartition, or emptier tasks); renaming over the new
        # indices alone would leave the prior attempt's higher-index
        # files visible and duplicate records (ADVICE r5). Clear every
        # file of this epoch before renaming the new set in.
        for stale in _glob.glob(
            _os.path.join(self.path, f"epoch-{batchId:06d}-*.jsonl")
        ):
            _os.remove(stale)
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = _os.path.join(
                self.path, f"epoch-{batchId:06d}-{i:04d}.jsonl"
            )
            _os.replace(m.staged, final)
        _clear_staging(_os.path.join(self.path, "_staging"))

    def abort(self, messages, batchId):
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.staged):
                _os.remove(m.staged)
        _clear_staging(_os.path.join(self.path, "_staging"))


class RecordPublishDataSource(DataSource):
    """``format("record_publish")`` — the reference's per-record
    external publish (SNS consumer Lambda,
    ``/root/reference/LambdaFunctions/kfpLambdaConsumerSNS.py:12-23``)
    as a first-class Spark WRITE format with batch and streaming
    writers: ``df.write.format("record_publish").option("path", p)``
    and ``df.writeStream.format("record_publish")``. One JSON message
    per record, exactly-once visibility via stage-then-commit."""

    @classmethod
    def name(cls):
        return "record_publish"

    def schema(self):
        return "sensor_id string, temperature long, event_time timestamp"

    def writer(self, schema, overwrite):
        return RecordPublishWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return RecordPublishStreamWriter(self.options)
