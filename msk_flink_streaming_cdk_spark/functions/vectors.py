"""Vector math over ``array<float>`` columns — JVM-side only.

Everything here compiles to Catalyst higher-order functions
(``zip_with`` + ``aggregate``); no Python in the row path, so the hot
loops stay inside whole-stage codegen and scale with the executors.
Accumulation is sequential double — bit-identical to DuckDB's
``list_dot_product(CAST(.. AS DOUBLE[]), ..)`` used in oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return dot_product_col(a, b) / (l2_norm_col(a) * l2_norm_col(b))
