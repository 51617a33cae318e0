"""DuckDB-differential oracle harness (SURVEY §5.1).

Mirrors the driver's compare: run the Spark query and the DuckDB oracle
SQL over the same parquet fixtures; compare row count, column names,
and an order-insensitive canonical value representation (columns sorted
by name, rows sorted, doubles rounded).
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
from decimal import Decimal

import duckdb

from msk_flink_streaming_cdk_spark.sources.fixtures import TABLES

_ROUND = 6


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM "
                f"'{sf_dir}/{name}.parquet'"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _canon_value(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, _ROUND)
        return "0.0" if r == 0 else repr(r)
    if isinstance(v, Decimal):
        return repr(round(float(v), _ROUND))
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def compare(spark_df, oracle_query: str, sf_dir: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_query, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    _, s_canon = canonicalize(s_cols, s_rows)
    _, d_canon = canonicalize(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        assert a == b, f"value mismatch at sorted row {i}:\n spark={a}\nduckdb={b}"
