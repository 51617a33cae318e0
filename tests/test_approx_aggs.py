"""Accuracy bounds for the sketch-based aggregates (no SQL oracle —
estimates aren't reproducible across engines)."""

from __future__ import annotations

from msk_flink_streaming_cdk_spark.registry import QUERIES


def test_approx_distinct_within_rsd(spark, sf_small):
    exact = {
        r.p_brand: r.n_suppliers
        for r in QUERIES["distinct_suppliers_per_brand"](
            spark, sf_small
        ).collect()
    }
    for r in QUERIES["approx_distinct_parts"](spark, sf_small).collect():
        e = exact[r.p_brand]
        assert abs(r.approx_suppliers - e) <= max(2, 0.1 * e), (
            r.p_brand,
            r.approx_suppliers,
            e,
        )


def test_approx_quantiles_ordered_and_in_range(spark, sf_small):
    (q,) = QUERIES["approx_quantiles_prices"](spark, sf_small).collect()
    q25, q50, q75, q95 = q.price_quantiles
    assert q25 <= q50 <= q75 <= q95
    stats = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .selectExpr("min(o_totalprice)", "max(o_totalprice)")
        .first()
    )
    assert stats[0] <= q25 and q95 <= stats[1]
