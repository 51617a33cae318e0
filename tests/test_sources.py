"""Source builders: Kafka option parity (no broker in-container, so
option construction + frame shapes), rate generator, JSON file stream."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from msk_flink_streaming_cdk_spark.schemas import SENSOR_READING
from msk_flink_streaming_cdk_spark.sources.files import stream_json_dir
from msk_flink_streaming_cdk_spark.sources.generator import (
    batch_sensor_frame,
    rate_sensor_stream,
)
from msk_flink_streaming_cdk_spark.sources.kafka import (
    decode_kafka_json,
    sink_options,
    source_options,
    to_kafka_json,
)


def _kafka_wire_frame(encoded, topic="kfp_sensor_topic"):
    """Dress an (optional key, value) string frame in the exact schema
    the real ``format("kafka")`` scan produces — binary key/value plus
    topic/partition/offset/timestamp/timestampType metadata — so the
    decode select runs against the wire shape, not a convenience one."""
    cols = [
        (
            F.col("key").cast("binary")
            if "key" in encoded.columns
            else F.lit(None).cast("binary")
        ).alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.spark_partition_id().alias("partition"),
        (F.monotonically_increasing_id()).alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    ]
    return encoded.select(*cols)


def test_kafka_json_decode_roundtrips_events_fixture(spark, sf_medium):
    """VERDICT r12 #3: exercise read_kafka_json's ACTUAL decode select
    (from_json(value.cast(string)) → j.*) end-to-end without a broker.
    The events fixture is encoded to Kafka byte-frames with
    to_kafka_json (the sink half), dressed in the real Kafka wire
    schema, then decoded with the source half — decoded rows must
    equal the parquet fixture exactly (including the double `value`
    column and micros timestamps through ISO-8601 JSON)."""
    from msk_flink_streaming_cdk_spark.sources.fixtures import load_table

    events = load_table(spark, sf_medium, "events")
    wire = _kafka_wire_frame(to_kafka_json(events, key_col="event_id"))
    assert [f.name for f in wire.schema.fields] == [
        "key",
        "value",
        "topic",
        "partition",
        "offset",
        "timestamp",
        "timestampType",
    ]
    decoded = decode_kafka_json(wire, events.schema)
    assert decoded.schema == events.schema
    want = sorted(map(tuple, events.collect()))
    got = sorted(map(tuple, decoded.collect()))
    assert len(got) == len(want) and got == want


def test_kafka_json_decode_sensor_reference_shape(spark):
    """Reference format parity (main.py:25-26): the producer's sensor
    JSON {sensor_id, temperature, event_time} survives the
    encode→wire→decode loop with the reference's ISO-8601 timestamps."""
    df = batch_sensor_frame(spark, n=99)
    decoded = decode_kafka_json(
        _kafka_wire_frame(to_kafka_json(df, key_col="sensor_id")),
        SENSOR_READING,
    )
    assert sorted(map(tuple, decoded.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_kafka_source_options_reference_parity():
    # main.py:21-31 — earliest offsets, consumer group testGroup,
    # SASL_SSL + AWS_MSK_IAM when IAM is on.
    opts = source_options("b-1:9098", "kfp_sensor_topic", iam=True)
    assert opts["subscribe"] == "kfp_sensor_topic"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.group.id"] == "testGroup"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "AWS_MSK_IAM"
    assert "IAMLoginModule" in opts["kafka.sasl.jaas.config"]


def test_kafka_sink_options():
    opts = sink_options("b-1:9098", "kfp_sns_topic")
    assert opts == {
        "kafka.bootstrap.servers": "b-1:9098",
        "topic": "kfp_sns_topic",
    }


def test_to_kafka_json_value_shape(spark):
    df = batch_sensor_frame(spark, n=3)
    out = to_kafka_json(df, key_col="sensor_id")
    assert out.columns == ["key", "value"]
    row = out.first()
    payload = json.loads(row.value)
    assert set(payload) == {"sensor_id", "temperature", "event_time"}
    assert payload["sensor_id"] == row.key


def test_batch_generator_reference_shape(spark):
    # producer parity: 99 records, sensors 1..5, temps 27..32
    # (kfpLambdaStreamProducer.py:48-54)
    df = batch_sensor_frame(spark, n=99, seed=42)
    assert df.count() == 99
    stats = df.agg(
        F.min("temperature"), F.max("temperature"),
        F.countDistinct("sensor_id"),
    ).first()
    assert stats[0] >= 27 and stats[1] <= 32
    assert 1 <= stats[2] <= 5
    assert df.schema == SENSOR_READING


def test_rate_stream_schema_and_rows(spark, tmp_path):
    stream = rate_sensor_stream(spark, rows_per_second=200)
    assert [f.name for f in stream.schema.fields] == [
        "sensor_id",
        "temperature",
        "event_time",
    ]
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) FROM rate_smoke").first()[0]
            if n > 0:
                break
            time.sleep(1)
        assert n > 0
        bad = spark.sql(
            "SELECT count(*) FROM rate_smoke WHERE temperature < 27 "
            "OR temperature > 32 OR CAST(sensor_id AS INT) NOT BETWEEN 1 AND 5"
        ).first()[0]
        assert bad == 0
    finally:
        q.stop()


def test_json_file_stream_roundtrip(spark, tmp_path):
    # JSON-lines source — format parity with the reference's
    # 'format'='json' tables (main.py:25).
    src = os.path.join(str(tmp_path), "jsonsrc")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        f.write(
            '{"sensor_id":"1","temperature":30,'
            '"event_time":"2024-01-01T00:00:00.000Z"}\n'
        )
    stream = stream_json_dir(spark, src, SENSOR_READING)
    q = (
        stream.writeStream.format("memory")
        .queryName("json_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM json_smoke").collect()
    assert len(rows) == 1
    assert rows[0].temperature == 30


def test_csv_quarantine_splits_good_and_bad(spark, tmp_path):
    # PERMISSIVE CSV ingest: schema-clean rows on one side, raw
    # malformed lines on the other, nothing dropped. Good-row values
    # are cross-checked against DuckDB's CSV reader on the same file.
    import duckdb
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from msk_flink_streaming_cdk_spark.sources.files import (
        read_csv_quarantine,
    )

    path = str(tmp_path / "in.csv")
    lines = [
        "id,name,score",
        "1,alpha,1.5",
        "2,beta,2.5",
        "3,gamma,not_a_number",   # bad double
        "4,delta,4.0",
        "5,epsilon,oops,extra",   # too many columns
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    good, bad = read_csv_quarantine(spark, path, schema)
    got = {(r.id, r.name, r.score) for r in good.collect()}
    want = {
        tuple(r)
        for r in duckdb.sql(
            # ignore_errors drops the wrong-arity line (Spark
            # quarantines it); TRY_CAST screens the bad double the
            # same way PERMISSIVE does.
            f"""SELECT id, name, score
                FROM read_csv('{path}', header=true, ignore_errors=true,
                              columns={{'id':'VARCHAR','name':'VARCHAR',
                                        'score':'VARCHAR'}})
                WHERE TRY_CAST(score AS DOUBLE) IS NOT NULL"""
        ).fetchall()
    }
    want = {(int(i), n, float(s)) for i, n, s in want}
    assert got == want
    assert len(got) == 3
    raws = sorted(r.raw_line for r in bad.collect())
    assert raws == ["3,gamma,not_a_number", "5,epsilon,oops,extra"]
    # the good-row plan must prune the corrupt column from its output
    assert "_corrupt_record" not in good.columns


def test_csv_file_stream_replay(spark, tmp_path):
    # CSV micro-batch replay: one file per trigger, schema enforced.
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from msk_flink_streaming_cdk_spark.sources.files import stream_csv_dir

    src = tmp_path / "csv_src"
    src.mkdir()
    for i in range(3):
        (src / f"part{i}.csv").write_text(
            "user_id,event_type\n" + f"{i},click\n{i + 10},view\n"
        )
    df = stream_csv_dir(
        spark,
        str(src),
        StructType(
            [
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
            ]
        ),
        max_files_per_trigger=1,
    )
    q = (
        df.writeStream.format("memory")
        .queryName("csv_replay")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM csv_replay").collect()
    assert len(rows) == 6
    assert {r.event_type for r in rows} == {"click", "view"}


def test_python_datasource_sensor_gen(spark):
    # Spark 4 Python DataSource API: the reference producer shape as a
    # registered format — partition-parallel, seed-deterministic, and
    # per-row addressable (values re-derivable without Spark).
    from msk_flink_streaming_cdk_spark.sources.pydatasource import (
        SensorGenDataSource,
        sensor_row,
    )

    spark.dataSource.register(SensorGenDataSource)
    df = (
        spark.read.format("sensor_gen")
        .option("n", 99)
        .option("seed", 7)
        .option("numPartitions", 4)
        .load()
    )
    rows = df.orderBy("event_time").collect()
    assert len(rows) == 99
    assert df.rdd.getNumPartitions() == 4
    assert {r.sensor_id for r in rows} <= {"1", "2", "3", "4", "5"}
    assert all(27 <= r.temperature <= 32 for r in rows)
    # exact value parity with the local per-row derivation
    for i in (0, 50, 98):
        sid, temp, ts = sensor_row(7, i)
        assert (rows[i].sensor_id, rows[i].temperature, rows[i].event_time) \
            == (sid, temp, ts)
    # determinism: a second read yields identical rows
    again = (
        spark.read.format("sensor_gen")
        .option("n", 99)
        .option("seed", 7)
        .option("numPartitions", 2)  # partitioning must not change data
        .load()
        .orderBy("event_time")
        .collect()
    )
    assert rows == again


def test_python_datasource_streaming_offsets(spark, tmp_path):
    # Streaming side of the custom source: offsets are row indices, so
    # the delivered stream must be an exact, gapless, duplicate-free
    # prefix of the deterministic row sequence (exactly-once).
    import time

    from msk_flink_streaming_cdk_spark.sources.pydatasource import (
        SensorGenDataSource,
        sensor_row,
    )

    spark.dataSource.register(SensorGenDataSource)
    df = (
        spark.readStream.format("sensor_gen")
        .option("seed", 11)
        .option("rowsPerBatch", 20)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline and n < 40:  # >= 2 micro-batches
            n = spark.sql("SELECT count(*) FROM pyds_stream").first()[0]
            time.sleep(1)
    finally:
        q.stop()
    rows = (
        spark.sql("SELECT * FROM pyds_stream")
        .orderBy("event_time")
        .collect()
    )
    assert len(rows) >= 40
    assert len(rows) % 20 == 0  # whole batches only
    for i, r in enumerate(rows):
        sid, temp, ts = sensor_row(11, i)
        assert (r.sensor_id, r.temperature, r.event_time) == (sid, temp, ts)


def test_binary_file_source_reads_media_payloads(spark, tmp_path):
    # format("binaryFile") is the image/audio corpus ingest path: one
    # row per file with (path, modificationTime, length, content).
    # Hashes computed Spark-side must match local hashlib on the same
    # bytes, and length pushdown must hold.
    import hashlib

    payloads = {
        "a.img": b"\x89PNG fake image bytes \x00\x01\x02" * 10,
        "b.img": b"RIFF fake wav bytes \x03\x04" * 25,
        "c.txt": "unicode text payload héllo 🎉".encode(),
    }
    media = tmp_path / "media"
    media.mkdir()
    for name, blob in payloads.items():
        (media / name).write_bytes(blob)

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.img")
        .load(str(media))
    )
    rows = {
        r.path.rsplit("/", 1)[-1]: r
        for r in df.select("path", "length", F.md5("content").alias("h"))
        .collect()
    }
    assert set(rows) == {"a.img", "b.img"}  # glob filtered c.txt out
    for name, r in rows.items():
        assert r.length == len(payloads[name])
        assert r.h == hashlib.md5(payloads[name]).hexdigest()


def test_text_file_source_line_corpus(spark, tmp_path):
    # spark.read.text: the raw-corpus ingest path (one row per line),
    # with wholetext=True for document-per-file corpora.
    src = tmp_path / "corpus"
    src.mkdir()
    (src / "d1.txt").write_text("line one\nline two\n")
    (src / "d2.txt").write_text("only line\n")
    lines = spark.read.text(str(src))
    assert lines.count() == 3
    whole = spark.read.text(str(src), wholetext=True)
    docs = sorted(r.value for r in whole.collect())
    assert docs == ["line one\nline two\n", "only line\n"]


def test_record_publish_batch_writer_exactly_once(spark, tmp_path):
    # Stage-then-commit: every input row appears exactly once in the
    # visible directory, and no staged partials remain after commit.
    import glob
    import json
    import os

    from msk_flink_streaming_cdk_spark.sources.pydatasource import (
        RecordPublishDataSource,
        SensorGenDataSource,
    )

    spark.dataSource.register(SensorGenDataSource)
    spark.dataSource.register(RecordPublishDataSource)
    df = (
        spark.read.format("sensor_gen")
        .option("n", 99)
        .option("numPartitions", 4)
        .load()
    )
    out = str(tmp_path / "published")
    df.write.format("record_publish").mode("append").option(
        "path", out
    ).save()
    rows = []
    for f in glob.glob(os.path.join(out, "part-*.jsonl")):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == 99
    assert {r["sensor_id"] for r in rows} <= {"1", "2", "3", "4", "5"}
    staged = glob.glob(os.path.join(out, "_staging", "*"))
    assert staged == []


def test_record_publish_stream_writer_epochs(spark, tmp_path):
    import glob
    import json
    import os

    from msk_flink_streaming_cdk_spark.sources.pydatasource import (
        RecordPublishDataSource,
        SensorGenDataSource,
    )

    spark.dataSource.register(SensorGenDataSource)
    spark.dataSource.register(RecordPublishDataSource)
    out = str(tmp_path / "published_stream")
    stream = (
        spark.readStream.format("sensor_gen")
        .option("rowsPerBatch", 10)
        .load()
    )
    q = (
        stream.writeStream.format("record_publish")
        .option("path", out)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt_record_publish")
        )
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 60
        files = []
        while _t.time() < deadline:
            files = glob.glob(os.path.join(out, "epoch-*.jsonl"))
            if len(files) >= 2:
                break
            _t.sleep(0.5)
    finally:
        q.stop()
    assert len(files) >= 2, files
    rows = []
    for f in files:
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    # epochs are 10 rows each, all reference-shaped
    assert len(rows) >= 20
    assert {r["sensor_id"] for r in rows} <= {"1", "2", "3", "4", "5"}
    assert all(27 <= r["temperature"] <= 32 for r in rows)


def test_record_publish_epoch_replay_clears_stale_files(tmp_path):
    # ADVICE r5: a replayed epoch that commits FEWER files than a
    # prior partially-committed attempt must not leave the prior
    # attempt's higher-index files visible (duplicate records).
    # Driver-side protocol test: call the writer's commit directly.
    import os

    from msk_flink_streaming_cdk_spark.sources.pydatasource import (
        RecordPublishStreamWriter,
        _PublishCommit,
    )

    out = str(tmp_path / "pub")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)
    w = RecordPublishStreamWriter({"path": out})

    def stage(name, payload):
        p = os.path.join(staging, name)
        with open(p, "w") as f:
            f.write(payload)
        return _PublishCommit(staged=p, n_rows=1)

    # Attempt 1: epoch 3 commits THREE files.
    msgs = [stage(f"part-a{i}.jsonl", f'{{"r": {i}}}\n') for i in range(3)]
    w.commit(msgs, 3)
    assert len(os.listdir(out)) - 1 == 3  # 3 epoch files + _staging

    # Replay of epoch 3 commits only ONE file (fewer partitions after
    # recovery) — indices 0001/0002 from attempt 1 must be gone.
    msgs = [stage("part-b0.jsonl", '{"r": 99}\n')]
    w.commit(msgs, 3)
    visible = sorted(
        f for f in os.listdir(out) if f.startswith("epoch-")
    )
    assert visible == ["epoch-000003-0000.jsonl"]
    with open(os.path.join(out, visible[0])) as f:
        assert f.read() == '{"r": 99}\n'


def test_record_publish_commit_clears_orphan_staged_files(tmp_path):
    # ADVICE r5: staged files from task attempts that crashed before
    # returning a commit message are never referenced by any message;
    # commit/abort must clear the whole staging area afterwards.
    import os

    from msk_flink_streaming_cdk_spark.sources.pydatasource import (
        RecordPublishWriter,
        _PublishCommit,
    )

    out = str(tmp_path / "pub_batch")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)
    committed = os.path.join(staging, "part-ok.jsonl")
    with open(committed, "w") as f:
        f.write('{"r": 1}\n')
    orphan = os.path.join(staging, "part-crashed-attempt.jsonl")
    with open(orphan, "w") as f:
        f.write('{"r": 2}\n')

    w = RecordPublishWriter({"path": out})
    w.commit([_PublishCommit(staged=committed, n_rows=1)])
    assert os.path.exists(os.path.join(out, "part-ok.jsonl"))
    assert not os.path.exists(orphan)
    assert os.listdir(staging) == []
