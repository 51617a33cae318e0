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
