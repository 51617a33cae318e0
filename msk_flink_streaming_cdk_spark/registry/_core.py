"""Query registry core.

Every implemented operator from SURVEY §2 (plus the LLM-data-pipeline
extension) registers here as a named query: a builder
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, an
equivalent ANSI-SQL oracle string DuckDB runs over the same parquet
fixtures. The driver (and our tests) compare the two — row count,
schema, order-insensitive value hash. Column names are aliased
identically on both sides (driver contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``oracle`` is the DuckDB-runnable ANSI SQL equivalent (fixture
    tables pre-registered as views). Omit it only for genuinely
    non-SQL-expressible ops — the driver then records a weaker
    rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)  # idempotent: UTC tz + AQE on driver-made sessions
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def tumble_start_sql(col: str, seconds: int) -> str:
    """DuckDB expression for Spark's epoch-aligned tumbling-window start
    (naive TIMESTAMP, matching ``window(col, ...).start`` under a UTC
    session timezone)."""
    return (
        f"make_timestamp(CAST(floor(epoch({col})/{seconds})*{seconds} "
        f"AS BIGINT)*1000000)"
    )
