"""Distributed model fitting on sufficient statistics.

The pattern shared with ``similarity.pca_power_project``: each
executor reduces its partition to a tiny fixed-size statistic (here a
k x k normal-equations block), the driver does the O(k^3) linear
algebra, and coefficients broadcast back as literals. Nothing
row-shaped ever reaches the driver, so the same code path works at
any corpus size — the classic "ML on MPP" shape (and how Spark MLlib
itself fits GLMs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType


def logistic_irls(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iters: int = 8,
    ridge: float = 1e-3,
) -> tuple[np.ndarray, int]:
    """Fit ridge-regularized logistic regression by IRLS.

    Per iteration: ONE scan in which each partition computes its
    partial X'WX (k x k) and X'Wz (k) for the current beta via a numpy
    pass inside ``mapInPandas``; the driver sums the O(partitions)
    blocks IN SORTED ORDER (bitwise-deterministic accumulation) and
    solves the (ridge-damped) normal equations. k = len(features)+1
    (intercept prepended). Returns (beta, n_rows).

    Determinism: fixed zero init, fixed iteration count, sorted block
    reduction, ridge > 0 keeps the system well-posed even under
    complete separation.
    """
    k = len(feature_cols) + 1
    out_schema = StructType(
        [
            StructField("a", ArrayType(DoubleType())),
            StructField("b", ArrayType(DoubleType())),
            StructField("n", DoubleType()),
        ]
    )
    # Each iteration re-evaluates this narrow projection from source.
    # Deliberately NOT persisted: measured slower here (cache-read +
    # materialization overhead beats recomputing a cheap projection 8
    # times at fixture scale). When the upstream feature derivation is
    # genuinely expensive at scale, persist BEFORE calling: the fit
    # only sees the frame you hand it.
    feats = df.select(
        *[F.col(c).cast("double") for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    )

    beta = np.zeros(k)
    n_total = 0
    for _ in range(n_iters):
        beta_now = beta.copy()

        def partial(batches, beta_now=beta_now):
            A = np.zeros((k, k))
            b = np.zeros(k)
            n = 0.0
            for pdf in batches:
                X = np.column_stack(
                    [np.ones(len(pdf))]
                    + [pdf[c].to_numpy(dtype=float) for c in feature_cols]
                )
                y = pdf["_y"].to_numpy(dtype=float)
                eta = X @ beta_now
                p = 1.0 / (1.0 + np.exp(-np.clip(eta, -30, 30)))
                w = np.maximum(p * (1 - p), 1e-9)
                z = eta + (y - p) / w
                A += X.T @ (X * w[:, None])
                b += X.T @ (w * z)
                n += len(y)
            if n:
                yield pd.DataFrame(
                    {"a": [A.ravel().tolist()], "b": [b.tolist()], "n": [n]}
                )

        rows = feats.mapInPandas(partial, out_schema).collect()
        # Sorted reduction => bit-stable sums regardless of partition
        # arrival order.
        rows = sorted(rows, key=lambda r: (r["n"], tuple(r["a"])))
        A = np.zeros((k, k))
        b = np.zeros(k)
        n_total = 0
        for r in rows:
            A += np.asarray(r["a"]).reshape(k, k)
            b += np.asarray(r["b"])
            n_total += int(r["n"])
        if n_total == 0:
            return np.zeros(k), 0
        beta = np.linalg.solve(A + ridge * np.eye(k), b)
    return beta, n_total


def logistic_score_col(
    beta: np.ndarray, feature_cols: list[Column]
) -> Column:
    """sigmoid(beta . [1, features...]) as a JVM-side expression —
    scoring never leaves Catalyst once the coefficients are known."""
    eta = F.lit(float(beta[0]))
    for i, c in enumerate(feature_cols):
        eta = eta + F.lit(float(beta[i + 1])) * c.cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
