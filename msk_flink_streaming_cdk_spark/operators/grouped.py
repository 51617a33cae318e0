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


def price_trend_by_customer(
    orders: DataFrame, n_buckets: int | None = 256
) -> DataFrame:
    """Per-customer price-over-time slope (dollars/day) through the
    grouped-map (applyInPandas) surface.

    ``n_buckets`` is the HIGH-CARDINALITY dial: with the default, the
    physical group is ``pmod(xxhash64(custkey), n_buckets)`` and each UDF
    call computes EVERY contained customer's centered least-squares
    slope with vectorized pandas groupby-transforms — Python is
    invoked ``n_buckets`` times total instead of once per customer.
    ``n_buckets=None`` keeps the textbook one-group-per-key shape
    (each key's frame handed to Python individually) — correct at any
    size but the per-call overhead is the cost: measured at sf0.1
    (150k orders / 10k customers, local[32], min-of-2) the per-key
    shape took **31.2s** vs **1.21s** bucketed, ~96% of it pandas/Arrow
    per-group fixed cost, not math. At 100 TB the per-key variant is
    10^9 Python calls — always bucket a high-cardinality grouped-map.

    The fit functions are CLOSURES on purpose: cloudpickle serializes
    closures by value, so executors don't need this package importable
    (a module-level function is pickled by reference and breaks when
    the driver runs from outside the repo)."""
    base = orders.select("o_custkey", "o_orderdate", "o_totalprice")

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

    if n_buckets is None:
        return base.groupBy("o_custkey").applyInPandas(
            fit, schema=TREND_SCHEMA
        )

    def fit_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # same centered normal equation as `fit`, vectorized over all
        # customers in the bucket (groupby-transform keeps the math
        # per-key identical; 6dp driver rounding absorbs summation-
        # order ulps exactly as it does for shuffle-order variance).
        d = pd.DataFrame(
            {
                "k": pdf["o_custkey"].to_numpy(),
                "x": (
                    pdf["o_orderdate"].astype("int64")
                    / 86_400_000_000_000
                ).to_numpy(),
                "y": pdf["o_totalprice"].to_numpy(),
            }
        )
        gg = d.groupby("k", sort=False)
        xc = d["x"] - gg["x"].transform("mean")
        yc = d["y"] - gg["y"].transform("mean")
        key = d["k"].to_numpy()
        num = (xc * yc).groupby(key, sort=False).sum()
        den = (xc * xc).groupby(key, sort=False).sum()
        n = gg.size()
        slope = num / den
        slope[(n < 2) | (den == 0)] = float("nan")
        return pd.DataFrame(
            {
                "o_custkey": n.index.to_numpy(),
                "n_orders": n.to_numpy(),
                "price_slope": slope.reindex(n.index).to_numpy(),
            }
        )

    return (
        base.withColumn(
            "__bucket", F.pmod(F.xxhash64("o_custkey"), F.lit(int(n_buckets)))
        )
        .groupBy("__bucket")
        .applyInPandas(
            lambda pdf: fit_bucket(pdf.drop(columns="__bucket")),
            schema=TREND_SCHEMA,
        )
    )


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
    orders: DataFrame, events: DataFrame, n_buckets: int | None = 256
) -> DataFrame:
    """Cogrouped applyInPandas: orders and events co-partitioned on the
    customer key, each group's two pandas frames merged in one UDF
    call — the API for per-key logic that needs BOTH sides
    materialized (interleaving, custom joins, per-key reconciliation).
    Semantically a full-outer join of two counts, which is exactly
    what the oracle checks. Both inputs shuffle once on the key;
    absent keys arrive as empty frames.

    Same high-cardinality dial as ``price_trend_by_customer``: the
    default cogroups on ``pmod(xxhash64(custkey), n_buckets)`` and merges
    every contained key's counts with one vectorized value_counts
    outer-join per bucket (Python invoked ``n_buckets`` times);
    ``n_buckets=None`` is the textbook one-cogroup-per-key shape —
    measured **13.2s vs 1.28s** at sf0.1 (local[32], min-of-2), all
    per-call overhead. Co-partitioning correctness is identical: both
    sides hash the same derived key."""
    o = orders.select(F.col("o_custkey").alias("custkey"))
    e = events.select(F.col("user_id").alias("custkey"))

    if n_buckets is None:

        def merge(key, left, right):
            return pd.DataFrame(
                {
                    "custkey": [key[0]],
                    "n_orders": [len(left)],
                    "n_events": [len(right)],
                }
            )

        return (
            o.groupBy("custkey")
            .cogroup(e.groupBy("custkey"))
            .applyInPandas(merge, schema=COGROUP_SCHEMA)
        )

    def merge_bucket(left: pd.DataFrame, right: pd.DataFrame):
        lc = left["custkey"].value_counts()
        rc = right["custkey"].value_counts()
        keys = lc.index.union(rc.index)
        return pd.DataFrame(
            {
                "custkey": keys.to_numpy(),
                "n_orders": lc.reindex(keys, fill_value=0).to_numpy(),
                "n_events": rc.reindex(keys, fill_value=0).to_numpy(),
            }
        )

    ob = o.withColumn("__bucket", F.pmod(F.xxhash64("custkey"), F.lit(int(n_buckets))))
    eb = e.withColumn("__bucket", F.pmod(F.xxhash64("custkey"), F.lit(int(n_buckets))))
    return (
        ob.groupBy("__bucket")
        .cogroup(eb.groupBy("__bucket"))
        .applyInPandas(
            lambda left, right: merge_bucket(
                left.drop(columns="__bucket"),
                right.drop(columns="__bucket"),
            ),
            schema=COGROUP_SCHEMA,
        )
    )
