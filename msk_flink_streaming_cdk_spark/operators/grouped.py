"""Grouped-map (applyInPandas) operators — the batch per-group UDF
surface (SURVEY §2.9 extension).

``price_trend_by_customer`` fits a least-squares slope of order price
over time per customer with numpy inside an Arrow grouped-map UDF.
The closed-form normal-equation slope equals SQL's ``regr_slope``, so
the DuckDB oracle can check the whole Arrow path numerically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TREND_SCHEMA = "o_custkey long, n_orders long, price_slope double"


def price_trend_by_customer(orders: DataFrame) -> DataFrame:
    """Per-customer price-over-time slope (dollars/day). One shuffle on
    the grouping key; each group processed as a single Arrow batch —
    the grouped-map pattern for anything per-group-imperative.

    The fit function is a CLOSURE on purpose: cloudpickle serializes
    closures by value, so executors don't need this package importable
    (a module-level function is pickled by reference and breaks when
    the driver runs from outside the repo)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        days = pdf["o_orderdate"].astype("int64") / 86_400_000_000_000
        y = pdf["o_totalprice"].to_numpy()
        x = days.to_numpy()
        n = len(x)
        if n < 2 or np.all(x == x[0]):
            slope = float("nan")
        else:
            xm, ym = x.mean(), y.mean()
            slope = float(
                ((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum()
            )
        return pd.DataFrame(
            {
                "o_custkey": [pdf["o_custkey"].iloc[0]],
                "n_orders": [n],
                "price_slope": [slope],
            }
        )

    return orders.select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).groupBy("o_custkey").applyInPandas(fit, schema=TREND_SCHEMA)


CENTERED_SCHEMA = "c_custkey long, c_mktsegment string, centered_cents long"


def centered_balance_by_segment(customer: DataFrame) -> DataFrame:
    """Per-segment integer-exact centering: for each customer,
    n*x - sum(x) in cents (== n * (x - mean) without ever forming the
    non-exact mean). Everything stays in int64, so the Arrow
    grouped-map path can be checked bit-exactly against a SQL window
    oracle — the pattern for proving a pandas UDF faithful before
    trusting it with real float math."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(pdf["c_acctbal"].to_numpy() * 100).astype("int64")
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "centered_cents": len(cents) * cents - cents.sum(),
            }
        )

    return (
        customer.select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(center, schema=CENTERED_SCHEMA)
    )


COGROUP_SCHEMA = "custkey long, n_orders long, n_events long"


def cogrouped_activity_counts(
    orders: DataFrame, events: DataFrame
) -> DataFrame:
    """Cogrouped applyInPandas: orders and events co-partitioned on the
    customer key, each key's two pandas frames merged in one UDF call —
    the API for per-key logic that needs BOTH sides materialized
    (interleaving, custom joins, per-key reconciliation). Semantically
    a full-outer join of two counts, which is exactly what the oracle
    checks. Both inputs shuffle once on the key; absent keys arrive as
    empty frames."""

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "custkey": [key[0]],
                "n_orders": [len(left)],
                "n_events": [len(right)],
            }
        )

    o = orders.select(F.col("o_custkey").alias("custkey"))
    e = events.select(F.col("user_id").alias("custkey"))
    return (
        o.groupBy("custkey")
        .cogroup(e.groupBy("custkey"))
        .applyInPandas(merge, schema=COGROUP_SCHEMA)
    )
