"""Oracle-differential tests for every registered query (SURVEY §5.1).

This is the same check the driver runs (sf0.01); tests run at sf0.001
for speed, plus a couple of targeted assertions at sf0.01.
"""

from __future__ import annotations

import pytest

from msk_flink_streaming_cdk_spark.registry import ORACLES, QUERIES

from .oracle import compare


def _oracle_checked():
    return sorted(ORACLES)


@pytest.mark.parametrize("name", _oracle_checked())
def test_query_matches_oracle_sf0001(spark, sf_small, name):
    compare(QUERIES[name](spark, sf_small), ORACLES[name], sf_small)


def test_every_query_runs_rows_nonnegative(spark, sf_small):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_small)
        assert df.count() >= 0, name


def test_q1_daily_nonempty_sf001(spark, sf_medium):
    # 154 qualifying (sensor, day) windows at sf0.01 — guards against
    # a silently-empty alert pipeline.
    assert QUERIES["q1_alerts_daily"](spark, sf_medium).count() > 100


def test_q1_output_schema(spark, sf_small):
    df = QUERIES["q1_alerts_30s"](spark, sf_small)
    assert [f.name for f in df.schema.fields] == [
        "sensor_id",
        "count_temp",
        "start_event_time",
    ]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {
        "sensor_id": "string",
        "count_temp": "bigint",
        "start_event_time": "timestamp",
    }


def test_q2_output_schema(spark, sf_small):
    df = QUERIES["q2_windowed_avg_60s"](spark, sf_small)
    assert [f.name for f in df.schema.fields] == [
        "sensor_id",
        "avg_temp",
        "start_event_time",
        "year",
        "month",
        "day",
        "hour",
    ]
    assert df.schema["avg_temp"].dataType.simpleString() == "bigint"
