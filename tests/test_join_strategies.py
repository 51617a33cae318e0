"""Scale join strategies: bucketed co-located joins (no exchange) and
salted skew joins (correctness vs the plain join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from msk_flink_streaming_cdk_spark.operators.relational import salted_join
from msk_flink_streaming_cdk_spark.plans.checks import formatted_plan
from msk_flink_streaming_cdk_spark.storage import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    # Disable broadcast so the join would otherwise be a shuffled SMJ.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_linenumber", "o_totalprice"
        )
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan  # co-located buckets
        # correctness vs the plain (exchanged) join
        plain = (
            orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            ).count()
        )
        assert joined.count() == plain
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_salted_join_matches_plain_join(spark, sf_small):
    customer = spark.read.parquet(f"{sf_small}/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        F.col("o_custkey").alias("k"), "o_totalprice"
    )
    plain = (
        orders.join(customer, "k")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(orders, customer, "k", salt_buckets=4)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer_preserves_unmatched(spark, sf_small):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "orphan")], "k int, v string"
    )
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    out = salted_join(left, right, "k", salt_buckets=4, how="left")
    rows = {(r.k, r.v, r.w) for r in out.collect()}
    assert (99, "orphan", None) in rows
    assert len(rows) == 3
