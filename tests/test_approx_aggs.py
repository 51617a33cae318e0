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


def test_hll_sketch_rel_err_within_bounds(spark, sf_small):
    # DataSketches HLL at default lgK: well under 5% on these
    # cardinalities; the ALL row must re-aggregate from the per-group
    # sketches to the same accuracy (mergeability is the point).
    rows = QUERIES["sketch_hll_users_by_type"](spark, sf_small).collect()
    assert {r.event_type for r in rows} >= {"ALL"}
    for r in rows:
        assert r.rel_err <= 0.05, (r.event_type, r.est_users, r.exact_users)


def test_theta_sketch_overlap_within_bounds(spark, sf_small):
    (r,) = QUERIES["sketch_theta_user_overlap"](spark, sf_small).collect()
    assert r.exact_overlap > 0  # non-vacuous on the fixture
    assert r.rel_err <= 0.05, (r.est_overlap, r.exact_overlap)


def test_theta_exact_mode_bound_holds_at_every_shipped_sf(spark):
    """ADVICE r12 low: the sketch_theta_user_overlap oracle pins
    est == exact, which is only valid while distinct users per side
    stay under the theta sketch's 4096-entry exact mode. Enforce the
    bound mechanically at EVERY shipped SF so a fixture change trips
    this assertion (naming the offending SF and event_type) instead
    of an opaque oracle hash mismatch."""
    import os

    from pyspark.sql import functions as F

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        if not os.path.exists(path):
            continue
        rows = (
            spark.read.parquet(path)
            .filter(F.col("event_type").isin("click", "purchase"))
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        )
        for r in rows:
            assert r.n < 4096, (
                f"{sf} events has {r.n} distinct users for "
                f"{r.event_type}: theta sketch leaves exact mode at "
                f"4096 and the sketch_theta_user_overlap oracle's "
                f"est == exact pin no longer holds — raise the "
                f"sketch's nominal entries or loosen the oracle."
            )


def test_approx_topk_words_matches_exact_counts(spark, sf_small):
    # The frequent-items sketch tracks far more slots than this
    # fixture's vocabulary, so every returned heavy hitter must carry
    # its exact count.
    rows = QUERIES["text_approx_topk_words"](spark, sf_small).collect()
    assert len(rows) == 10
    assert all(r.count_exact for r in rows), [
        (r.word, r.est_count, r.exact_count) for r in rows
    ]


def test_approx_quantiles_audit_within_tolerance(spark, sf_small):
    rows = QUERIES["approx_quantiles_audit"](spark, sf_small).collect()
    assert [r.quantile for r in rows] == [0.25, 0.5, 0.75, 0.95]
    assert all(r.within_tolerance for r in rows), [
        (r.quantile, r.rel_err) for r in rows
    ]


def test_countmin_never_underestimates_and_bounded(spark, sf_small):
    # The two count-min contracts: (a) estimates NEVER underestimate
    # (every occurrence of a key increments all d of its cells — a
    # deterministic invariant, not probabilistic), and (b) the p95
    # overestimate respects the epsilon = e/w bound on total count
    # (the Cormode-Muthukrishnan guarantee holds per key w.p.
    # 1 - e^-d; p95 is a safely loose pin for d=4).
    import math

    from msk_flink_streaming_cdk_spark.sources.fixtures import load_table

    r = QUERIES["sketch_countmin_accuracy"](spark, sf_small).first()
    assert r.min_overest >= 0, r
    n_events = load_table(spark, sf_small, "events").count()
    eps = math.e / r.w
    assert r.p95_overest <= eps * n_events, (r.p95_overest, eps * n_events)
    assert r.n_keys > 0
