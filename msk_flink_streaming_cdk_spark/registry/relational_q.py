"""Relational operator breadth — oracle-checked (SURVEY §2.3-§2.6, §2.8).

The reference has no joins, OVER windows, sorts, or set ops (its two
queries are single-table windowed aggregations), so this inventory is
what makes the engine a general analytics engine. Every query is plain
DataFrame API (Catalyst plans the join strategies; dims get explicit
``broadcast()`` where we know they're small).

Determinism conventions for the DuckDB value-hash:
- money sums go through ``decimal(18,2)`` on BOTH sides (double sums
  are order-dependent in the last bits);
- averages/doubles are ``round(x, 4)``;
- every computed column is aliased identically on both sides;
- int-typed Spark outputs are cast to long where DuckDB yields BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.relational import (
    asof_join_backward,
    boundaries_from_sample,
    global_top_k,
    partitioned_row_number,
    partitioned_running_min,
    partitioned_running_sum,
    salted_join,
    sessionize,
    top_k_per_group,
)
from ..operators.util import materialize_once
from ..sources.fixtures import load_table, register_views
from ._core import register

_DEC = "decimal(18,2)"


def _disc_price_spark():
    """l_extendedprice*(1-l_discount) in exact decimal arithmetic.

    The fixture stores intended-2-decimal doubles; the double product
    lands on exact half-cents, which Spark (HALF_UP on the binary
    expansion) and DuckDB (scaled-double rounding) round differently.
    Casting each factor to decimal first makes the product exact and
    engine-independent.
    """
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- aggregations -----------------------------------------------------------

@register(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE), 4)
             AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary: multi-aggregate hash agg with
    map-side partial aggregation; scan-level predicate pushdown.
    Money sums are exact decimal internally but surface as
    double+round (see rollup_status_priority for why: Spark Decimal
    and DuckDB decimal render differently in the driver hash)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double"), 2
            ).alias("sum_base_price"),
            F.round(
                F.sum(_disc_price_spark()).cast("double"), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "distinct_suppliers_per_brand",
    oracle="""
    SELECT p_brand, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           count(*) AS n_lineitems
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def distinct_suppliers_per_brand(spark, sf_dir):
    """DISTINCT aggregate + join (expand+two-phase agg under Catalyst)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark, sf_dir):
    """ROLLUP hierarchy totals (NULL-filled supergroups).

    The sum is exact decimal arithmetic; the final output is cast to
    double + round(2) on BOTH sides because Spark's decimal(28,2) and
    DuckDB's decimal(38,2) render differently in the driver's canonical
    hash even when every value is identical. The true value sits ON the
    2-decimal grid (exact decimal sum), so the round is unambiguous.
    """
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast(_DEC)).cast("double"), 2
            ).alias("total_price"),
        )
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark, sf_dir):
    """CUBE over two dims (all grouping-set combinations)."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "case_when_price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def case_when_price_buckets(spark, sf_dir):
    """CASE WHEN bucketing + aggregation."""
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(bucket)
        .agg(F.count("*").alias("n_orders"))
    )


# --- joins ------------------------------------------------------------------

@register(
    "join_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS total_price
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def join_orders_per_segment(spark, sf_dir):
    """Inner equi-join fact-to-dim + aggregation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast(_DEC)).cast("double"), 2
            ).alias("total_price"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           round(CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE), 4) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3-style 3-way join + top-k (TakeOrderedAndProject — no
    global sort; deterministic via the l_orderkey tie-break)."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = c.join(o, c.c_custkey == o.o_custkey).join(
        li, o.o_orderkey == li.l_orderkey
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(_disc_price_spark()).cast("double"), 4).alias("revenue")
    )
    return global_top_k(
        agg.select("l_orderkey", "revenue", "o_orderdate"),
        [F.col("revenue").desc(), F.col("l_orderkey")],
        10,
    )


@register(
    "join_left_order_counts",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_order_counts(spark, sf_dir):
    """Left outer join preserving order-less customers (count = 0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi_open_order_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def join_semi_open_order_customers(spark, sf_dir):
    """Left-semi join (EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customers_without_orders(spark, sf_dir):
    """Left-anti join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


@register(
    "join_broadcast_region_suppliers",
    oracle="""
    SELECT r_name, count(*) AS n_suppliers,
           round(avg(s_acctbal), 4) AS avg_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_region_suppliers(spark, sf_dir):
    """Star-join with explicit broadcast of the tiny dims (25-row
    nation, 5-row region) — no shuffle of the fact side for the join."""
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_acctbal"),
        )
    )


# --- OVER windows -----------------------------------------------------------

@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark, sf_dir):
    """row_number ranking, top-3 per group (WindowGroupLimit pushdown)."""
    o = _t(spark, sf_dir, "orders")
    out = top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
        keep_rank=True,
    )
    return out.withColumn("rn", F.col("rn").cast("long"))


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE), 2) AS running_total
    FROM orders
    """,
)
def window_running_total(spark, sf_dir):
    """Cumulative windowed sum (explicit ROWS frame both sides).

    Exact decimal accumulation internally; double+round(2) output shape
    on both sides — see rollup_status_priority for why."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double"), 2
        ).alias("running_total"),
    )


@register(
    "window_lag_days_between_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
)
def window_lag_days_between_orders(spark, sf_dir):
    """lag() analytic — days since the customer's previous order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    )


@register(
    "window_rank_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank,
           CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
           lead(o_orderkey) OVER w AS next_orderkey,
           first_value(o_orderkey) OVER
             (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS top_orderkey
    FROM orders WHERE o_orderkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_functions(spark, sf_dir):
    """Remaining OVER-window surface: dense_rank / ntile / lead /
    first_value (explicit ROWS frame so both engines agree)."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
            F.ntile(4).over(w).cast("long").alias("price_quartile"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
            F.first("o_orderkey").over(wf).alias("top_orderkey"),
        )
    )


# --- sorts / limits / set ops -----------------------------------------------

@register(
    "top20_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def top20_orders_by_price(spark, sf_dir):
    """Global ORDER BY + LIMIT (TakeOrderedAndProject)."""
    return global_top_k(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        20,
    )


@register(
    "setop_union_active_or_rich",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def setop_union_active_or_rich(spark, sf_dir):
    """UNION (distinct) of two key sets."""
    a = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    b = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.union(b).distinct()


@register(
    "setop_intersect_active_and_rich",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def setop_intersect_active_and_rich(spark, sf_dir):
    a = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    b = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.intersect(b)


@register(
    "setop_except_rich_without_open_orders",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_except_rich_without_open_orders(spark, sf_dir):
    a = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    # subtract == EXCEPT DISTINCT regardless of left-side multiplicity
    # (exceptAll().distinct() would leak duplicates whose multiplicity
    # exceeds the right side's).
    return a.subtract(b)


# --- scalar function surface --------------------------------------------------

@register(
    "setop_union_all_order_events",
    oracle="""
    SELECT k, count(*) AS n FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
    ) GROUP BY k
    """,
)
def setop_union_all_order_events(spark, sf_dir):
    """UNION ALL (bag semantics — duplicates preserved, then counted)."""
    a = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("k"))
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("k"))
    )
    return a.unionAll(b).groupBy("k").agg(F.count("*").alias("n"))


@register(
    "explode_top_words",
    oracle=r"""
    SELECT word, count(*) AS n_occurrences
    FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
          FROM documents)
    GROUP BY word ORDER BY n_occurrences DESC, word LIMIT 25
    """,
)
def explode_top_words(spark, sf_dir):
    """Array flatten (explode/unnest) + aggregation — the word-count
    shape every text pipeline starts with."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim("text")), r"[\t\n\f\r ]+")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "word")
        .limit(25)
    )


@register(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey, upper(p_name) AS name_upper,
           substr(p_type, 1, 5) AS type_prefix,
           CAST(length(p_name) AS BIGINT) AS name_len,
           p_brand || '/' || p_type AS brand_type
    FROM part WHERE p_size >= 40
    """,
)
def scalar_string_functions(spark, sf_dir):
    """String scalar surface: upper/substr/length/concat + filter."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 40)
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.length("p_name").cast("long").alias("name_len"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        )
    )


@register(
    "scalar_date_math",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                o_orderdate) AS BIGINT) AS days_since_epoch_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           abs(o_totalprice - 100000) / 1000.0 AS kprice_dist
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def scalar_date_math(spark, sf_dir):
    """Date/math scalar surface: year/quarter/datediff/date_add/abs."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            )
            .cast("long")
            .alias("days_since_epoch_start"),
            F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
            # No round(): the 2-dec inputs make x.xxxx5 halfway points
            # that HALF_UP (Spark) and half-even (DuckDB) split on; the
            # unrounded IEEE result is bit-identical in both engines.
            (F.abs(F.col("o_totalprice") - 100000) / 1000.0).alias(
                "kprice_dist"
            ),
        )
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def json_extract_props(spark, sf_dir):
    """JSON field extraction (reference format layer F7, main.py:25) —
    get_json_object stays JVM-side."""
    return (
        _t(spark, sf_dir, "events")
        .select(
            F.get_json_object("props", "$.k").cast("long").alias("k_value")
        )
        .groupBy("k_value")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "pivot_event_type_counts",
    oracle="""
    SELECT user_id,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup
    FROM events GROUP BY user_id
    """,
)
def pivot_event_type_counts(spark, sf_dir):
    """Pivot-style conditional aggregation (single pass, no join)."""
    ev = _t(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "error", "signup")
    ]
    return ev.groupBy("user_id").agg(*aggs)


# --- generalized streaming windows (batch-checked) ---------------------------

@register(
    "sliding_window_event_counts",
    oracle="""
    SELECT make_timestamp(CAST(wstart AS BIGINT)*1000000) AS window_start,
           event_type, count(*) AS n_events
    FROM (SELECT event_type,
                 floor(epoch(ts)/1800)*1800 - 1800*g.k AS wstart
          FROM events, (VALUES (0),(1)) g(k))
    GROUP BY wstart, event_type
    """,
)
def sliding_window_event_counts(spark, sf_dir):
    """Sliding 1h/30min event-time window (SURVEY §2.7 extension —
    every event lands in exactly two hops)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@register(
    "session_window_user_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_window_user_sessions(spark, sf_dir):
    """Gap-based session windows (session_window, 30min gap) — batch
    form of the streaming sessionization operator."""
    return sessionize(
        _t(spark, sf_dir, "events"),
        "ts",
        ["user_id"],
        "30 minutes",
        [F.count("*").alias("n_events")],
    )


# --- SQL front door -----------------------------------------------------------

@register(
    "grouped_map_price_trend",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(regr_slope(o_totalprice,
                 epoch(o_orderdate) / 86400.0), 6) AS price_slope
    FROM orders GROUP BY o_custkey HAVING count(*) >= 2
    """,
)
def grouped_map_price_trend(spark, sf_dir):
    """applyInPandas grouped-map UDF (numpy least-squares slope per
    customer), oracle-checked against SQL regr_slope — validates the
    whole Arrow grouped-map path numerically."""
    from ..operators.grouped import price_trend_by_customer

    out = price_trend_by_customer(_t(spark, sf_dir, "orders"))
    return out.filter(F.col("n_orders") >= 2).select(
        "o_custkey",
        "n_orders",
        F.round("price_slope", 6).alias("price_slope"),
    )


@register("approx_distinct_parts")  # HLL sketch → rows-only
def approx_distinct_parts(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) per brand — the sketch
    path for 100 TB cardinalities; error bound vs exact pinned in
    pytest (no oracle: sketch estimates aren't reproducible in SQL)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .join(_t(spark, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias(
                "approx_suppliers"
            )
        )
    )


@register("approx_quantiles_prices")  # sketch → rows-only
def approx_quantiles_prices(spark, sf_dir):
    """percentile_approx quantile sketch over order prices."""
    return _t(spark, sf_dir, "orders").select(
        F.percentile_approx(
            "o_totalprice", [0.25, 0.5, 0.75, 0.95], 10000
        ).alias("price_quantiles")
    )


@register("sketch_hll_users_by_type")  # DataSketches HLL → rows-only
def sketch_hll_users_by_type(spark, sf_dir):
    """Mergeable HLL sketches (Apache DataSketches, JVM-side): distinct
    users per event type PLUS an 'ALL' row re-aggregated from the
    per-group sketches with ``hll_union_agg`` — the property that makes
    sketches the 100 TB cardinality path (partial per partition/day,
    union later; never a second scan). Output is self-auditing:
    estimate next to exact with relative error (drop the exact legs in
    production; they exist so the driver's rows-only check sees real
    accuracy numbers — floors pinned in tests/test_approx_aggs.py)."""
    ev = _t(spark, sf_dir, "events")
    # Persisted (optimization round 15, guide §2.4/§5): the per-type
    # sketch frame feeds the per-group rows AND the ALL union-row
    # re-aggregation; unpersisted, the sketch-building scan ran twice.
    # (Sketches being mergeable is the point — the union row must
    # come from these sketches, not a second pass.)
    sk = materialize_once(
        ev.groupBy("event_type").agg(
            F.expr("hll_sketch_agg(user_id)").alias("sk"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )
    per = sk.select(
        "event_type",
        F.expr("hll_sketch_estimate(sk)").alias("est_users"),
        "exact_users",
    )
    total = sk.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_users")
    ).crossJoin(
        F.broadcast(ev.agg(F.countDistinct("user_id").alias("exact_users")))
    ).select(F.lit("ALL").alias("event_type"), "est_users", "exact_users")
    return per.unionByName(total).select(
        "event_type",
        "est_users",
        "exact_users",
        F.round(
            F.abs(F.col("est_users") - F.col("exact_users"))
            / F.col("exact_users"),
            4,
        ).alias("rel_err"),
    )


@register(
    "sketch_theta_user_overlap",
    oracle="""
    WITH x AS (
      SELECT count(*) AS exact_overlap FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'))
    SELECT CAST(exact_overlap AS BIGINT) AS est_overlap,
           CAST(exact_overlap AS BIGINT) AS exact_overlap,
           round(0.0::DOUBLE, 4) AS rel_err
    FROM x
    """,
)
def sketch_theta_user_overlap(spark, sf_dir):
    """Theta-sketch set intersection: estimated |users(click) ∩
    users(purchase)| without materializing either side — the audience-
    overlap computation that at 100 TB replaces a distinct-distinct
    join with two single-scan sketches intersected on the driver.
    Self-auditing output (exact via a semi-join at test scale).

    Hash-checked since round 12 UNDER THE EXACT-MODE BOUND: a theta
    sketch with the default 4096 nominal entries is exact below 4096
    distinct keys, and every shipped SF stays under it (1500 distinct
    users per side at sf0.1), so ``est_overlap == exact_overlap`` is
    a deterministic identity here, verified at all three SFs. If a
    fixture ever crosses the nominal-entry bound this oracle must be
    dropped back to rows-only (the estimate becomes genuinely
    probabilistic)."""
    ev = _t(spark, sf_dir, "events")
    sks = ev.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'click' "
            "THEN user_id END)"
        ).alias("a"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' "
            "THEN user_id END)"
        ).alias("b"),
    )
    est = sks.select(
        F.expr(
            "theta_sketch_estimate(theta_intersection(a, b))"
        ).alias("est_overlap")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    exact = (
        clicks.join(buys, "user_id", "left_semi")
        .agg(F.countDistinct("user_id").alias("exact_overlap"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_overlap",
        "exact_overlap",
        F.round(
            F.abs(F.col("est_overlap") - F.col("exact_overlap"))
            / F.col("exact_overlap"),
            4,
        ).alias("rel_err"),
    )


@register(
    "asof_join_prev_signup",
    oracle="""
    SELECT a.event_id, a.user_id, b.prev_signup_ts
    FROM events a ASOF LEFT JOIN
         (SELECT user_id, ts, ts AS prev_signup_ts FROM events
          WHERE event_type = 'signup') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def asof_join_prev_signup(spark, sf_dir):
    """Backward as-of join (no native Spark ASOF): for every event,
    the user's most recent signup at-or-before it. Union + last-over-
    window — one shuffle regardless of side sizes. Oracle is DuckDB's
    native ASOF LEFT JOIN."""
    ev = _t(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("ts").alias("prev_signup_ts")
    )
    return asof_join_backward(
        left,
        right,
        key_cols=["user_id"],
        left_time="ts",
        right_time="ts",
        right_value_cols=["prev_signup_ts"],
    ).select("event_id", "user_id", "prev_signup_ts")


@register(
    "stats_by_returnflag",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_discount), 6) AS sd_disc,
           round(var_samp(l_discount), 6) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 8) AS covar_qd,
           quantile_cont(l_quantity, 0.5) AS med_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_by_returnflag(spark, sf_dir):
    """Statistical aggregate surface: stddev/variance/corr/covar +
    exact interpolated median."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_discount"), 8).alias(
                "covar_qd"
            ),
            F.median("l_quantity").alias("med_qty"),
            F.count("*").alias("n"),
        )
    )


@register(
    "agg_mode_disc_percentiles",
    oracle="""
    WITH mc AS (
      SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    md AS (
      SELECT l_returnflag, l_linestatus AS mode_status, c AS mode_count
      FROM (SELECT *, row_number() OVER (
              PARTITION BY l_returnflag
              ORDER BY c DESC, l_linestatus) AS rn FROM mc)
      WHERE rn = 1),
    qc AS (
      SELECT l_returnflag, l_quantity AS q, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    cum AS (
      SELECT l_returnflag, q, c,
             CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY q
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumc,
             CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      FROM qc),
    pct AS (
      SELECT l_returnflag, n,
             min(CASE WHEN cumc * 2 >= n THEN q END) AS p50_disc,
             min(CASE WHEN cumc * 10 >= n * 9 THEN q END) AS p90_disc
      FROM cum GROUP BY l_returnflag, n)
    SELECT p.l_returnflag, m.mode_status, m.mode_count,
           p.p50_disc, p.p90_disc, p.n
    FROM pct p JOIN md m USING (l_returnflag)
    """,
)
def agg_mode_disc_percentiles(spark, sf_dir):
    """Mode + DISCRETE percentiles per group, both with engine-proof
    determinism: the mode is an explicit argmax with a (count desc,
    value) total order (built-in mode() leaves ties undefined), and
    discrete percentiles come from the value-histogram CDF (smallest
    value whose cumulative count reaches p*n — integer comparisons
    only, no interpolation, no float rank).

    Shape: two hash aggregates to (group, value) grain, windows
    PARTITIONED by group over the tiny histogram frames (quantity has
    ~50 distinct values), one k-row join. At 100 TB this is the
    standard way to take exact discrete quantiles of a LOW-CARDINALITY
    measure without sorting facts."""
    li = _t(spark, sf_dir, "lineitem")
    mc = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("c")
    )
    md = top_k_per_group(
        mc,
        ["l_returnflag"],
        [F.col("c").desc(), F.col("l_linestatus")],
        1,
    ).select(
        "l_returnflag",
        F.col("l_linestatus").alias("mode_status"),
        F.col("c").alias("mode_count"),
    )
    qc = li.groupBy("l_returnflag", F.col("l_quantity").alias("q")).agg(
        F.count("*").alias("c")
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("l_returnflag")
    cum = qc.select(
        "l_returnflag",
        "q",
        F.sum("c").over(wc).alias("cumc"),
        F.sum("c").over(wn).alias("n"),
    )
    pct = cum.groupBy("l_returnflag", "n").agg(
        F.min(
            F.when(F.col("cumc") * 2 >= F.col("n"), F.col("q"))
        ).alias("p50_disc"),
        F.min(
            F.when(F.col("cumc") * 10 >= F.col("n") * 9, F.col("q"))
        ).alias("p90_disc"),
    )
    return pct.join(md, "l_returnflag").select(
        "l_returnflag",
        "mode_status",
        "mode_count",
        "p50_disc",
        "p90_disc",
        "n",
    )


_GROUPING_SETS_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("grouping_sets_status_priority", oracle=_GROUPING_SETS_SQL)
def grouping_sets_status_priority(spark, sf_dir):
    """Explicit GROUPING SETS + GROUPING() marker through the SQL
    front door (identical text both engines)."""
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "array_agg_order_keys",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
           count(*) AS n_orders
    FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
    """,
)
def array_agg_order_keys(spark, sf_dir):
    """Array aggregation (collect + canonical sort for determinism).

    The registered query emits the array as a canonical CSV string —
    the driver's canonical hash cannot sort rows containing raw array
    cells (numpy arrays are unhashable in pandas). The array-typed
    operator itself is ``F.array_sort(F.collect_list(...))``; only the
    driver-facing projection stringifies."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("o_orderkey")).cast(
                    "array<string>"
                ),
                ",",
            ).alias("order_keys"),
            F.count("*").alias("n_orders"),
        )
    )


_IN_SUBQUERY_SQL = """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey = 2)
"""


@register("in_subquery_suppliers", oracle=_IN_SUBQUERY_SQL)
def in_subquery_suppliers(spark, sf_dir):
    """IN-subquery (planned as left-semi) via the SQL front door."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SUBQUERY_SQL)


_SCALAR_SUBQUERY_SQL = """
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6)
             AS price_ratio
    FROM orders WHERE o_orderkey % 200 = 0
"""


@register("scalar_subquery_price_ratio", oracle=_SCALAR_SUBQUERY_SQL)
def scalar_subquery_price_ratio(spark, sf_dir):
    """Uncorrelated scalar subquery (single-value broadcast)."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQUERY_SQL)


@register(
    "join_full_outer_activity",
    oracle="""
    SELECT coalesce(o.k, e.k) AS custkey, n_orders, n_events
    FROM (SELECT o_custkey AS k, count(*) AS n_orders
          FROM orders GROUP BY 1) o
    FULL JOIN (SELECT user_id AS k, count(*) AS n_events
               FROM events GROUP BY 1) e ON o.k = e.k
    """,
)
def join_full_outer_activity(spark, sf_dir):
    """Full outer join: per-customer order counts against per-user
    event counts — either side may be NULL."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_orders"))
    )
    e = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("custkey"))
        .agg(F.count("*").alias("n_events"))
    )
    # joining on the column name coalesces the key (matches the SQL)
    return o.join(e, "custkey", "full")


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           round(CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE), 2) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5-style 6-way star join: local-supplier revenue per
    nation for one region. The tiny dims (nation 25, region 5) are
    broadcast so the fact-side shuffles only for the c/o/l joins;
    region filter prunes before the join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(_disc_price_spark()).cast("double"), 2
            ).alias("revenue")
        )
    )


@register(
    "join_range_clicks_before_purchase",
    oracle="""
    SELECT p.event_id, p.user_id,
           count(c.event_id) AS n_recent_clicks
    FROM events p LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
)
def join_range_clicks_before_purchase(spark, sf_dir):
    """Interval/range join in batch: clicks in the hour before each
    purchase. Executed as a bucketed equi-join (explode-probe), never
    a nested-loop range join — see time_range_join_count."""
    from ..operators.relational import time_range_join_count

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    return time_range_join_count(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="ts",
        window_seconds=3600,
        count_alias="n_recent_clicks",
    ).select("event_id", "user_id", "n_recent_clicks")


@register(
    "window_range_frame_avg30d",
    oracle="""
    SELECT o_orderkey,
           round(avg(o_totalprice) OVER w30, 6) AS avg_30d,
           count(*) OVER w30 AS n_30d
    FROM orders
    WINDOW w30 AS (PARTITION BY o_custkey
                   ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
                   RANGE BETWEEN 2592000 PRECEDING AND 0 FOLLOWING)
    """,
)
def window_range_frame_avg30d(spark, sf_dir):
    """RANGE frame (value-based, not ROWS): trailing-30-day average
    order price per customer — the frame spec the ROWS queries can't
    express."""
    # o_orderdate is already TIMESTAMP (LTZ) after load_table's NTZ
    # normalization; the timestamp cast is a no-op kept for clarity
    # before the epoch-seconds cast that the RANGE frame orders on.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 6).alias("avg_30d"),
        F.count("*").over(w).alias("n_30d"),
    )


@register(
    "window_percent_rank_cume_dist",
    oracle="""
    SELECT o_orderkey,
           percent_rank() OVER w AS price_pct_rank,
           cume_dist() OVER w AS price_cume_dist
    FROM orders WHERE o_orderkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent_rank_cume_dist(spark, sf_dir):
    """percent_rank / cume_dist analytics. Raw doubles — identical
    integer ratios on both engines, so no rounding needed."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            F.percent_rank().over(w).alias("price_pct_rank"),
            F.cume_dist().over(w).alias("price_cume_dist"),
        )
    )


@register(
    "agg_monthly_revenue",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
             AS order_month,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue
    FROM orders GROUP BY 1
    """,
)
def agg_monthly_revenue(spark, sf_dir):
    """Calendar rollup via date_trunc — the month-grain reporting
    shape (single hash agg, map-side partial)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast(_DEC)).cast("double"), 2
            ).alias("revenue"),
        )
    )


@register(
    "histogram_price_buckets",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 600000 THEN 13
                     ELSE floor(o_totalprice / 50000) + 1 END AS BIGINT)
             AS bucket,
           count(*) AS n_orders,
           round(CAST(min(o_totalprice) AS DOUBLE), 2) AS min_price,
           round(CAST(max(o_totalprice) AS DOUBLE), 2) AS max_price
    FROM orders GROUP BY 1
    """,
)
def histogram_price_buckets(spark, sf_dir):
    """Equi-width histogram via width_bucket — the profiling scan
    every dataset audit starts with. (DuckDB has no width_bucket; the
    oracle spells out the same 12-bucket arithmetic over [0, 600000).)"""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice").cast("double"), 2).alias("min_price"),
            F.round(F.max("o_totalprice").cast("double"), 2).alias("max_price"),
        )
    )


@register(
    "scalar_null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS nonneg_bal,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0)
             AS bal_or_zero,
           CAST(c_acctbal IS NULL AS BIGINT) AS bal_missing
    FROM customer WHERE c_custkey % 7 = 0
    """,
)
def scalar_null_handling(spark, sf_dir):
    """NULL-handling scalar surface: nullif / coalesce / IS NULL."""
    nonneg = F.when(F.col("c_acctbal") < 0, None).otherwise(
        F.col("c_acctbal")
    )
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.coalesce(
                F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")
            ).alias("seg_or_other"),
            nonneg.alias("nonneg_bal"),
            F.coalesce(nonneg, F.lit(0.0)).alias("bal_or_zero"),
            F.col("c_acctbal").isNull().cast("long").alias("bal_missing"),
        )
    )


_CORRELATED_SUBQ_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
"""


@register("correlated_subquery_above_avg", oracle=_CORRELATED_SUBQ_SQL)
def correlated_subquery_above_avg(spark, sf_dir):
    """Correlated scalar subquery (decorrelated by Catalyst into an
    aggregate + join) through the SQL front door."""
    register_views(spark, sf_dir)
    return spark.sql(_CORRELATED_SUBQ_SQL)


_SQL_EXISTS = """
    SELECT n_name, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    GROUP BY n_name
"""


@register("sql_front_door_exists", oracle=_SQL_EXISTS)
def sql_front_door_exists(spark, sf_dir):
    """The SQL front door: identical ANSI text through spark.sql over
    registered fixture views (correlated EXISTS → left-semi plan)."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_EXISTS)


# --- additional breadth: unpivot / arg-max / listagg / percentiles /
#     gap-fill / sampling / cross join / union-by-name / map columns --------


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS value
    FROM lineitem WHERE l_orderkey % 500 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey % 500 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey % 500 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey % 500 = 0
    """,
)
def unpivot_lineitem_measures(spark, sf_dir):
    """UNPIVOT (wide→long melt) of the four lineitem measures — the
    inverse of pivot_event_type_counts. Native ``unpivot`` plans as a
    single-pass Expand (one scan), where the oracle's UNION ALL
    formulation would scan four times."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 500 == 0)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "value",
        )
    )


@register(
    "agg_max_by_priciest_item",
    oracle="""
    SELECT l_returnflag,
           (max(struct_pack(p := l_extendedprice, ok := l_orderkey,
                            ln := l_linenumber, pk := l_partkey))).pk
             AS top_partkey,
           round((max(struct_pack(p := l_extendedprice, ok := l_orderkey,
                                  ln := l_linenumber, pk := l_partkey))).p, 2)
             AS top_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_max_by_priciest_item(spark, sf_dir):
    """MAX_BY / arg-max made deterministic: the winner is the
    lexicographic max of (price, orderkey, linenumber), so price ties
    cannot flip the answer between engines. One hash agg — the struct
    max carries the payload column, no second pass / self-join."""
    s = F.max(
        F.struct(
            F.col("l_extendedprice").alias("p"),
            F.col("l_orderkey").alias("ok"),
            F.col("l_linenumber").alias("ln"),
            F.col("l_partkey").alias("pk"),
        )
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            s.getField("pk").alias("top_partkey"),
            F.round(s.getField("p"), 2).alias("top_price"),
        )
    )


@register(
    "agg_listagg_nations_per_region",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
)
def agg_listagg_nations_per_region(spark, sf_dir):
    """LISTAGG/string_agg with deterministic order: collect → sort →
    join inside the agg, so the result is row-order-independent (a
    bare string_agg would be partition-order-dependent at scale)."""
    r = F.broadcast(_t(spark, sf_dir, "region"))
    n = _t(spark, sf_dir, "nation")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
    )


@register(
    "agg_exact_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(median(o_totalprice), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_exact_percentiles(spark, sf_dir):
    """EXACT percentiles (linear interpolation) — the precise
    counterpart of approx_quantiles_prices: Spark ``percentile()``
    computes the same continuous quantile as DuckDB quantile_cont."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.median("o_totalprice"), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        )
    )


@register(
    "timeseries_gapfill_daily",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(
               (SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP)
                FROM events),
               (SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP)
                FROM events),
               INTERVAL 1 DAY)) AS day),
    users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
    counts AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS n_events
      FROM events WHERE user_id < 10 GROUP BY 1, 2)
    SELECT u.user_id, s.day, coalesce(c.n_events, 0) AS n_events
    FROM users u CROSS JOIN spine s
    LEFT JOIN counts c ON c.user_id = u.user_id AND c.day = s.day
    """,
)
def timeseries_gapfill_daily(spark, sf_dir):
    """Time-series gap-fill (hypertable-rollup shape): generated day
    spine × key universe, left-joined to actual daily counts, zeros
    filled. The spine is sequence()+explode — tiny and broadcast; the
    only real shuffle is the daily pre-aggregation of the fact side,
    so the pattern holds at any corpus scale."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    bounds = _t(spark, sf_dir, "events").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias(
            "day"
        )
    )
    users = ev.select("user_id").distinct()
    counts = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n_events"))
    return (
        users.crossJoin(F.broadcast(spine))
        .join(counts, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


@register(
    "sample_hash_orders",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_sampled,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sampled_price
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY o_orderstatus
    """,
)
def sample_hash_orders(spark, sf_dir):
    """Deterministic ~12.5% Bernoulli sample via content hash (md5
    first hex char in {0,1}) — reproducible across engines, runs, and
    cluster sizes, unlike TABLESAMPLE's RNG seed-per-partition."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            F.substring(
                F.md5(F.encode(F.col("o_orderkey").cast("string"), "UTF-8")),
                1,
                1,
            ).isin("0", "1")
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(
                F.sum(F.col("o_totalprice").cast(_DEC)).cast("double"), 2
            ).alias("sampled_price"),
        )
    )


@register(
    "cross_join_region_pairs",
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_name < b.r_name
    """,
)
def cross_join_region_pairs(spark, sf_dir):
    """Explicit cartesian product, bounded to the 5-row dim table (the
    one place a cross join is legitimate); the inequality keeps each
    unordered pair once."""
    r = _t(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("region_a"))
    b = r.select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b).filter(F.col("region_a") < F.col("region_b"))


@register(
    "union_by_name_balances",
    oracle="""
    SELECT c_custkey AS acct_key, c_acctbal AS balance,
           'customer' AS side
    FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT s_suppkey, s_acctbal, 'supplier'
    FROM supplier WHERE s_acctbal > 9900
    """,
)
def union_by_name_balances(spark, sf_dir):
    """unionByName: schemas aligned by column NAME (the two inputs are
    projected in different orders) — a positional union here would
    silently pair balance with side."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(
            F.col("c_custkey").alias("acct_key"),
            F.col("c_acctbal").alias("balance"),
            F.lit("customer").alias("side"),
        )
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9900)
        .select(
            F.lit("supplier").alias("side"),
            F.col("s_acctbal").alias("balance"),
            F.col("s_suppkey").alias("acct_key"),
        )
    )
    return c.unionByName(s)


@register(
    "map_event_type_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
    FROM events WHERE user_id < 50 GROUP BY user_id
    """,
)
def map_event_type_counts(spark, sf_dir):
    """Map-typed column surface: per-user counts pivoted into a
    map<string,long> (map_from_entries over collected structs), then
    probed with element_at. The oracle checks the extracted values —
    proving the map round-trip — since a raw map column can't cross
    the driver's canonical hash."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("type_counts")
    )
    return as_map.select(
        "user_id",
        F.coalesce(F.element_at("type_counts", F.lit("click")), F.lit(0))
        .cast("long")
        .alias("n_click"),
        F.coalesce(F.element_at("type_counts", F.lit("purchase")), F.lit(0))
        .cast("long")
        .alias("n_purchase"),
    )


@register(
    "dedup_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM (SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def dedup_latest_event_per_user(spark, sf_dir):
    """Latest-record-per-key (the CDC/upsert compaction shape):
    row_number over (key, time DESC) keeps exactly one row per key,
    tie-broken on event_id for determinism. Spark plans the rn=1
    filter as WindowGroupLimit — per-partition top-1 pushdown, so the
    shuffle carries only each partition's candidate rows."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "join_salted_skew_orders",
    oracle="""
    SELECT c_nationkey AS nationkey, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def join_salted_skew_orders(spark, sf_dir):
    """Skew-resistant salted join through the driver gate: the fact
    side gets a random salt, the dim side is replicated per salt, and
    a hot key spreads over salt_buckets reducers — the RESULT must be
    exactly the plain equi-join the oracle runs (salt is internal and
    dropped). See operators/relational.py::salted_join."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_custkey"
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_nationkey"
    )
    return (
        salted_join(o, c, "k", salt_buckets=8)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           round(CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE), 4) AS revenue,
           count(*) AS n_items
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape — returned-item revenue ranking: fact-fact join
    (orders x lineitem) with the returnflag + date filters pushed to
    the scans, customer join on the aggregated side, broadcast nation
    dim, global top-20 via TakeOrderedAndProject (no full sort). At
    scale the orders/lineitem join shuffles on orderkey while customer
    arrives pre-reduced — the aggregate keys on c_custkey keep the
    final shuffle small. Decimal revenue per the module convention."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(F.sum(_disc_price_spark()).cast("double"), 4).alias("revenue"),
        F.count("*").alias("n_items"),
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)


@register(
    "q18_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(CAST(o_totalprice AS DOUBLE), 2) AS total_price,
           round(CAST(total_qty AS DOUBLE), 2) AS total_qty
    FROM big
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape — large-volume orders: aggregate-then-join. The
    lineitem pre-aggregation (sum(qty) per orderkey, HAVING > 250)
    reduces the fact side BEFORE it ever joins orders/customer, so the
    join input shrinks ~30x at the agg instead of exploding: the
    canonical put-the-agg-below-the-join plan a 100 TB fact table
    needs. Quantities sum in decimal so the HAVING threshold compare
    is exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice").cast(_DEC).cast("double"), 2).alias(
                "total_price"
            ),
            F.round(F.col("total_qty").cast("double"), 2).alias("total_qty"),
        )
    )


@register(
    "not_in_subquery_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'P')
    """,
)
def not_in_subquery_customers(spark, sf_dir):
    """NOT IN subquery — the null-aware anti-join: one NULL in the
    subquery legally empties the result, so Spark plans a
    BroadcastHashJoin LeftAnti with isNullAware=true (visible in the
    physical plan), not a plain anti join. Expressed through the SQL
    front door because only the parser produces the null-aware form."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus = 'P')
        """
    )


@register(
    "json_bad_record_quarantine",
    oracle="""
    WITH t AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0
                  THEN substr(props, 1, length(props) - 1)
                  ELSE props END AS raw
      FROM events WHERE event_id < 1000)
    SELECT CAST(json_valid(raw) AS BOOLEAN) AS is_valid,
           count(*) AS n_records,
           min(event_id) AS first_event
    FROM t GROUP BY is_valid
    """,
)
def json_bad_record_quarantine(spark, sf_dir):
    """Bad-record quarantine for semi-structured ingestion: classify
    rows by JSON validity and route/count them — the PERMISSIVE-mode
    triage every production pipeline needs before `from_json` nulls
    silently eat data. The fixture's props are all valid, so the query
    plants deterministic corruption (truncates every 7th record) and
    the oracle replays it; validity itself is checked engine-natively
    (Spark try_parse_json / DuckDB json_valid)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    raw = F.when(
        F.col("event_id") % 7 == 0,
        F.expr("substring(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    return (
        ev.select("event_id", raw.alias("raw"))
        .select(
            "event_id",
            F.try_parse_json(F.col("raw")).isNotNull().alias("is_valid"),
        )
        .groupBy("is_valid")
        .agg(
            F.count("*").alias("n_records"),
            F.min("event_id").alias("first_event"),
        )
    )


@register(
    "profile_key_skew_orders",
    oracle="""
    WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1),
    s AS (SELECT max(n) AS max_n,
                 round(avg(CAST(n AS DOUBLE)), 4) AS avg_n,
                 count(*) AS n_keys FROM c)
    SELECT s.max_n, s.avg_n, s.n_keys,
           round(s.max_n / s.avg_n, 4) AS skew_ratio,
           (SELECT min(o_custkey) FROM c WHERE n = s.max_n) AS hottest_key
    FROM s
    """,
)
def profile_key_skew_orders(spark, sf_dir):
    """Join/agg-key skew profiler: per-key counts reduced to max/avg/
    skew-ratio plus the hottest key — the diagnostic run BEFORE
    choosing salting or AQE skew-join for a 100 TB join (the repo's
    salted_join exists for exactly what this measures). One hash agg
    + a tiny all-reduce; nothing driver-side."""
    c = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    s = c.agg(
        F.max("n").alias("max_n"),
        F.round(F.avg(F.col("n").cast("double")), 4).alias("avg_n"),
        F.count("*").alias("n_keys"),
    )
    hottest = (
        c.join(F.broadcast(s), c["n"] == s["max_n"])
        .agg(F.min("o_custkey").alias("hottest_key"))
    )
    return (
        s.crossJoin(F.broadcast(hottest)).select(
            "max_n",
            "avg_n",
            "n_keys",
            F.round(F.col("max_n") / F.col("avg_n"), 4).alias("skew_ratio"),
            "hottest_key",
        )
    )


@register(
    "session_window_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN event_type = 'error' THEN INTERVAL 10 MINUTE
                  ELSE INTERVAL 45 MINUTE END AS gap
      FROM events),
    m AS (
      SELECT user_id, ts, ts + gap AS e,
             max(ts + gap) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_end
      FROM g),
    s AS (
      SELECT user_id, ts, e,
             sum(CASE WHEN prev_max_end IS NULL OR ts >= prev_max_end
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
    SELECT user_id, min(ts) AS session_start, max(e) AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def session_window_dynamic_gap(spark, sf_dir):
    """Session windows with a PER-EVENT gap (errors time out after 10
    minutes, everything else 45) — ``session_window`` with a Column
    gap, which fixed-gap islands can't express. The oracle replays
    Spark's merge rule exactly: an event opens a new session iff its
    ts >= the running max of every earlier event's (ts + gap) —
    half-open windows, so touching intervals do NOT merge — and a
    session's end is the max (ts + gap) of its members, not
    last_ts + gap."""
    gap = F.when(
        F.col("event_type") == "error", F.lit("10 minutes")
    ).otherwise(F.lit("45 minutes"))
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "window_share_of_segment",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment, c_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS cust_rev_dec
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_mktsegment, c_custkey),
    r AS (
      SELECT c_mktsegment, c_custkey, cust_rev_dec,
             round(CAST(cust_rev_dec AS DOUBLE), 2) AS cust_rev
      FROM c)
    SELECT c_mktsegment, c_custkey, cust_rev,
           round(CAST(cust_rev_dec AS DOUBLE) /
                 CAST(sum(cust_rev_dec) OVER (PARTITION BY c_mktsegment)
                      AS DOUBLE), 6) AS segment_share
    FROM r
    """,
)
def window_share_of_segment(spark, sf_dir):
    """Ratio-to-report: each customer's revenue share within its
    market segment — an unframed partition-total window over the
    aggregate (one extra exchange on the segment key, no self-join).
    Revenue sums stay decimal-exact; only the final ratio is floating
    (identical division on both engines)."""
    from pyspark.sql import Window

    c = (
        _t(spark, sf_dir, "customer")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("cust_rev"))
    )
    w = Window.partitionBy("c_mktsegment")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.col("cust_rev").cast("double"), 2).alias("cust_rev"),
        F.round(
            F.col("cust_rev").cast("double")
            / F.sum("cust_rev").over(w).cast("double"),
            6,
        ).alias("segment_share"),
    )


@register(
    "outlier_orders_iqr",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders),
    f AS (SELECT q1, q3, q3 - q1 AS iqr FROM q)
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_totalprice > f.q3 + 1.5 * f.iqr
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers,
           CAST(sum(CASE WHEN o_totalprice < f.q1 - 1.5 * f.iqr
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers
    FROM orders, f
    GROUP BY o_orderstatus
    """,
)
def outlier_orders_iqr(spark, sf_dir):
    """IQR-fence outlier detection (Tukey 1.5x) per order status — the
    standard numeric data-cleaning scan. Exact quantiles reduce to one
    broadcast row (percentile_cont == DuckDB quantile_cont, linear
    interpolation both); the flagging pass is then scan-local. At
    100 TB swap percentile_cont for the KLL/approx sketch and keep
    the same shape."""
    o = _t(spark, sf_dir, "orders")
    q = o.agg(
        F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice)")
        .alias("q1"),
        F.expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice)")
        .alias("q3"),
    ).withColumn("iqr", F.col("q3") - F.col("q1"))
    return (
        o.crossJoin(F.broadcast(q))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(
                    F.col("o_totalprice")
                    > F.col("q3") + 1.5 * F.col("iqr"),
                    1,
                ).otherwise(0)
            ).alias("n_high_outliers"),
            F.sum(
                F.when(
                    F.col("o_totalprice")
                    < F.col("q1") - 1.5 * F.col("iqr"),
                    1,
                ).otherwise(0)
            ).alias("n_low_outliers"),
        )
    )


@register(
    "profile_table_stats_orders",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_custkey,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ndv_status,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS nulls_totalprice,
           round(CAST(min(o_totalprice) AS DOUBLE), 2) AS min_price,
           round(CAST(max(o_totalprice) AS DOUBLE), 2) AS max_price,
           min(o_orderdate) AS min_date,
           max(o_orderdate) AS max_date
    FROM orders
    """,
)
def profile_table_stats_orders(spark, sf_dir):
    """ANALYZE-style column statistics in one scan (row count, NDVs,
    null counts, min/max) — what a cost-based optimizer or a
    broadcast-threshold decision consumes. One multi-aggregate pass;
    at 100 TB the exact NDVs become approx_count_distinct and the
    query shape is unchanged."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("ndv_custkey"),
        F.countDistinct("o_orderstatus").alias("ndv_status"),
        F.sum(
            F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)
        ).alias("nulls_totalprice"),
        F.round(F.min("o_totalprice").cast(_DEC).cast("double"), 2).alias(
            "min_price"
        ),
        F.round(F.max("o_totalprice").cast(_DEC).cast("double"), 2).alias(
            "max_price"
        ),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


@register(
    "agg_time_weighted_value",
    oracle="""
    WITH s AS (
      SELECT user_id, value, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts
      FROM events),
    w AS (
      SELECT user_id, value,
             CAST(epoch(next_ts) - epoch(ts) AS DOUBLE) AS dur
      FROM s WHERE next_ts IS NOT NULL)
    SELECT user_id,
           count(*) AS n_intervals,
           round(sum(value * dur) / sum(dur), 4) AS time_weighted_avg
    FROM w GROUP BY user_id
    """,
)
def agg_time_weighted_value(spark, sf_dir):
    """Time-weighted average per user (each reading weighted by how
    long it was current — the telemetry/metrics aggregate that a plain
    AVG gets wrong under irregular sampling). lead() pairs each event
    with its successor; the weighted sum is one hash agg. Ties on ts
    are ordered by event_id so the interval chain is deterministic."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("next_ts", F.lead("ts").over(w)).filter(
        F.col("next_ts").isNotNull()
    )
    dur = (
        F.col("next_ts").cast("double") - F.col("ts").cast("double")
    )
    return (
        s.select("user_id", "value", dur.alias("dur"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.round(
                F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), 4
            ).alias("time_weighted_avg"),
        )
    )


@register(
    "asof_join_next_error",
    oracle="""
    SELECT a.event_id, a.user_id, b.next_error_ts
    FROM events a ASOF LEFT JOIN
         (SELECT user_id, ts, ts AS next_error_ts FROM events
          WHERE event_type = 'error') b
      ON a.user_id = b.user_id AND a.ts <= b.ts
    """,
)
def asof_join_next_error(spark, sf_dir):
    """Forward as-of join: every event picks up the user's NEXT error
    timestamp (time-to-failure style lookup) — the forward twin of
    asof_join_prev_signup, checked against DuckDB's native ASOF with
    ``<=``. See operators/relational.py::asof_join_forward."""
    from ..operators.relational import asof_join_forward

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("ts").alias("next_error_ts")
    )
    return asof_join_forward(
        ev.select("event_id", "user_id", "ts"),
        errors,
        ["user_id"],
        "ts",
        "ts",
        ["next_error_ts"],
    ).select("event_id", "user_id", "next_error_ts")


# --- TPC-H optimizer-shape suite (Q4/Q7/Q12/Q14/Q16/Q21 analogues) ----------
# The reference's own SQL surface is two windowed aggregations
# (PythonKafkaSink/main.py:79-113); these queries extend the engine to
# the classic decision-support join shapes, each picked to exercise a
# distinct Catalyst plan feature (EXISTS semi-join, dual-dim alias
# join, conditional aggregation, scalar ratio, null-free NOT IN +
# count-distinct, and the double-correlated EXISTS/NOT-EXISTS
# self-join). Column availability differs from stock TPC-H (no
# partsupp/commitdate/receiptdate/shipmode), so predicates are adapted
# to the fixture schema while preserving each query's plan shape.


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape — order-priority checking: correlated EXISTS
    becomes a LEFT SEMI join whose condition mixes an equi key
    (orderkey) with a non-equi residual (l_shipdate > o_orderdate).
    The date filter prunes orders BEFORE the semi join, and the semi
    join never duplicates orders regardless of lineitem multiplicity —
    at 100 TB the fact side streams through one shuffle keyed on
    orderkey and the aggregate output is 5 rows."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {_DISC_PRICE_SQL} AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape — volume shipping between two nations: the same
    tiny dim (nation) joins the fact twice under different aliases
    (supplier's nation vs customer's nation), both broadcast; the
    disjunctive nation-pair predicate can't be pushed into either scan
    alone, so it runs as a post-join filter over broadcast hash joins
    — no extra shuffle beyond the three fact-side key joins."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(F.sum(_disc_price_spark()).cast("double"), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q12_urgency_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_urgency_by_linestatus(spark, sf_dir):
    """TPC-H Q12 shape — shipping-mode priority split: conditional
    aggregation (SUM over CASE) after an orders-lineitem key join with
    the selective date filter pushed to the lineitem scan. The CASE
    runs map-side inside the partial aggregate, so the shuffle carries
    2 longs per linestatus, not the joined rows."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume
                              ELSE 0 END) AS DOUBLE), 2) AS promo_revenue,
           round(CAST(sum(volume) AS DOUBLE), 2) AS total_revenue,
           floor(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume
                                       ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE) * 10000) / 10000
             AS promo_pct
    FROM (
      SELECT p_type, {_DISC_PRICE_SQL} AS volume
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    ) t
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape — promotion-effect ratio: a single-row scalar
    computed from two conditional decimal sums over one month of
    lineitem joined to part. Decimal sums are exact on both engines;
    the ratio is truncated at 4 decimals with floor (not round) so no
    half-way digit can split the engines. part is the small side and
    broadcasts; the month filter prunes the fact scan first."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    vol = _disc_price_spark()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0))
    total = F.sum(vol)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(promo.cast("double"), 2).alias("promo_revenue"),
            F.round(total.cast("double"), 2).alias("total_revenue"),
            (
                F.floor(
                    F.lit(100.0)
                    * promo.cast("double")
                    / total.cast("double")
                    * 10000
                )
                / 10000
            ).alias("promo_pct"),
        )
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape — supplier variety per part group: COUNT
    DISTINCT over a join with an excluded-supplier NOT IN. The
    exclusion list (s_suppkey is a non-null key, so NOT IN ==
    anti-join here) is tiny and broadcast; part predicates prune its
    scan before the fact join; the count-distinct runs as the standard
    two-phase partial/merge distinct aggregate, shuffling (group keys,
    suppkey) pairs once. Stock Q16 reads partsupp — the fixture has
    no partsupp, so lineitem supplies the part-supplier pairs."""
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape — suppliers who kept orders waiting: the
    hardest stock shape (correlated EXISTS + NOT EXISTS against the
    same fact). Instead of two correlated self-joins over raw
    lineitem, the plan reduces first: distinct (orderkey, suppkey)
    pairs, per-order supplier counts, and per-order LATE-supplier
    counts — then 'another supplier exists' == order has >= 2
    suppliers, and 'no other supplier was late' == order has exactly
    1 late supplier. Both reductions shuffle keys only, and the
    self-join inputs shrink from row-multiplicity to pair-cardinality
    before joining — the difference between O(rows^2) and O(pairs) at
    100 TB. Lateness adapts stock receipt/commit dates (absent here)
    to ship > order date + 90 days; status 'F' per stock Q21."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey)
    # ONE pass from rows to (order, supplier, was_late) — branching the
    # joined fact into separate late/all legs would scan and shuffle
    # lineitem twice. The explicit orderkey repartition then feeds BOTH
    # aggregation grains and the semi join from a single shuffle:
    # HashPartitioning(orderkey) satisfies the (orderkey, suppkey)
    # clustering too, so Catalyst inserts no further exchanges
    # (measured at sf0.1: 10 -> 6 exchanges, 2.6 s -> 1.3 s).
    pair_late = lo.repartition("l_orderkey").groupBy(
        "l_orderkey", "l_suppkey"
    ).agg(
        F.max(
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                1,
            ).otherwise(0)
        ).alias("is_late")
    )
    order_stats = pair_late.groupBy("l_orderkey").agg(
        F.count("*").alias("n_sup"),
        F.sum("is_late").alias("n_late"),
    )
    qualifying_orders = order_stats.filter(
        (F.col("n_sup") >= 2) & (F.col("n_late") == 1)
    ).select("l_orderkey")
    s = F.broadcast(
        _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        pair_late.filter(F.col("is_late") == 1)
        .join(qualifying_orders, "l_orderkey", "left_semi")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        # pairs are already distinct per (order, supplier), so the
        # count over them IS the distinct-order count
        .agg(F.count("*").alias("numwait"))
    )


# --- change-history / data-quality / window-frame additions -----------------


@register(
    "scd2_user_value_history",
    oracle="""
    SELECT user_id, event_id, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def scd2_user_value_history(spark, sf_dir):
    """SCD-type-2 history build: each user's purchase stream becomes
    validity intervals [valid_from, valid_to) via lead() over
    (user, ts), with the open-ended current row flagged. This is the
    standard dimension-history materialization for a warehouse load —
    one shuffle on user_id, no self-join (the naive formulation joins
    the table to itself on 'next change', which is quadratic per key).
    Ties on ts break deterministically on event_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "value",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
        )
    )


@register(
    "dq_orphan_foreign_keys",
    oracle="""
    SELECT 'lineitem->orders' AS fk, count(*) AS orphans
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey IS NULL
    UNION ALL
    SELECT 'lineitem->part', count(*)
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
    WHERE p_partkey IS NULL
    UNION ALL
    SELECT 'lineitem->supplier', count(*)
    FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_suppkey IS NULL
    UNION ALL
    SELECT 'orders->customer', count(*)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey IS NULL
    UNION ALL
    SELECT 'events->customer', count(*)
    FROM events LEFT JOIN customer ON user_id = c_custkey
    WHERE c_custkey IS NULL
    """,
)
def dq_orphan_foreign_keys(spark, sf_dir):
    """Referential-integrity audit: orphan counts for every foreign
    key in the star schema, one audit row each. Each leg is an
    anti-join reduced to a count before the union, so the combined
    result moves five longs — not five row sets — regardless of table
    size; AQE picks broadcast for the dim sides where they fit."""
    def leg(fact, key, dim, dkey, label):
        n = (
            fact.join(dim, fact[key] == dim[dkey], "left_anti")
            .agg(F.count("*").alias("orphans"))
            .select(F.lit(label).alias("fk"), "orphans")
        )
        return n

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    e = _t(spark, sf_dir, "events")
    legs = [
        leg(li, "l_orderkey", o.select("o_orderkey"), "o_orderkey",
            "lineitem->orders"),
        leg(li, "l_partkey", p.select("p_partkey"), "p_partkey",
            "lineitem->part"),
        leg(li, "l_suppkey", s.select("s_suppkey"), "s_suppkey",
            "lineitem->supplier"),
        leg(o, "o_custkey", c.select("c_custkey"), "c_custkey",
            "orders->customer"),
        leg(e, "user_id", c.select("c_custkey"), "c_custkey",
            "events->customer"),
    ]
    out = legs[0]
    for other in legs[1:]:
        out = out.unionAll(other)
    return out


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS BIGINT)
             AS quartile
    FROM customer
    """,
)
def window_ntile_quartiles(spark, sf_dir):
    """NTILE bucketing: account-balance quartiles within each market
    segment. Deterministic under ties via the custkey tiebreak (NTILE
    is order-sensitive; an under-specified ORDER BY would hash-differ
    between engines)."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "window_first_last_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS first_price,
           last_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS latest_price,
           nth_value(o_totalprice, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_price
    FROM orders
    """,
)
def window_first_last_frame(spark, sf_dir):
    """first/last/nth_value window frames: each order annotated with
    the customer's first, latest, and second order price. last_value
    and nth_value need the explicit full-partition frame — under the
    default running frame last_value degenerates to 'current row',
    the classic frame bug, identical in both engines. Values pass
    through unchanged (no arithmetic), so raw doubles hash clean."""
    order = ("o_orderdate", "o_orderkey")
    run = Window.partitionBy("o_custkey").orderBy(*order)
    full = run.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(run).alias("first_price"),
        F.last("o_totalprice").over(full).alias("latest_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
    )


@register("approx_quantiles_audit")  # approx values are engine-specific
def approx_quantiles_audit(spark, sf_dir):
    """Self-auditing quantile sketch: percentile_approx next to the
    exact percentile, with relative error and an in-tolerance flag, so
    the driver's rows-only check sees real accuracy numbers (floors
    pinned in tests/test_approx_aggs.py). At accuracy=10000 the rank
    error is <= n/10000, so the 1% value-tolerance is generous. One
    scan computes both sides; drop the exact leg in production."""
    qs = [0.25, 0.5, 0.75, 0.95]
    o = _t(spark, sf_dir, "orders")
    agg = o.agg(
        F.percentile_approx("o_totalprice", qs, 10000).alias("approx"),
        F.expr(
            "percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.95D))"
        ).alias("exact"),
    )
    z = agg.select(
        F.posexplode(F.arrays_zip("approx", "exact")).alias("pos", "pair")
    )
    rel_err = F.abs(
        F.col("pair.approx") - F.col("pair.exact")
    ) / F.col("pair.exact")
    return z.select(
        F.element_at(F.lit(qs), F.col("pos") + 1).alias("quantile"),
        F.round("pair.approx", 4).alias("approx_value"),
        F.round("pair.exact", 4).alias("exact_value"),
        F.round(rel_err, 6).alias("rel_err"),
        (rel_err < 0.01).alias("within_tolerance"),
    )


_SQL_PIPELINE = """
    WITH cust_orders AS (
      SELECT o_custkey AS custkey, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS lifetime_value
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT c_mktsegment, custkey, n_orders, lifetime_value,
             ntile(10) OVER (PARTITION BY c_mktsegment
                             ORDER BY lifetime_value DESC, custkey)
               AS decile
      FROM cust_orders JOIN customer ON custkey = c_custkey
    )
    SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
           count(*) AS n_customers,
           round(CAST(sum(CAST(lifetime_value AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS segment_value
    FROM ranked
    GROUP BY c_mktsegment, decile
"""


@register("sql_front_door_pipeline", oracle=_SQL_PIPELINE)
def sql_front_door_pipeline(spark, sf_dir):
    """SQL-surface parity, end to end: ONE ANSI SQL string — CTEs, an
    aggregate, a join, an NTILE window, and a re-aggregation — runs
    verbatim through spark.sql() and as the DuckDB oracle. Customer
    lifetime-value deciles per market segment. The strongest form of
    the parity claim: not 'equivalent DataFrame code', the same query
    text."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_PIPELINE)


@register(
    "grouped_map_centered_balance",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT)
             * CAST(round(c_acctbal * 100) AS BIGINT)
           - CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                  OVER (PARTITION BY c_mktsegment) AS BIGINT)
             AS centered_cents
    FROM customer
    """,
)
def grouped_map_centered_balance(spark, sf_dir):
    """applyInPandas vs SQL window, bit-exact: per-segment integer
    centering n*x - sum(x) in cents computed inside an Arrow
    grouped-map UDF, checked against the equivalent window expression.
    Integer arithmetic means ANY divergence (row routing, Arrow
    conversion, dtype) fails the hash — no float tolerance hiding
    bugs. See operators/grouped.py::centered_balance_by_segment."""
    from ..operators.grouped import centered_balance_by_segment

    return centered_balance_by_segment(_t(spark, sf_dir, "customer"))


@register(
    "cogrouped_activity_counts",
    oracle="""
    WITH o AS (SELECT o_custkey AS custkey, count(*) AS n_orders
               FROM orders GROUP BY 1),
         e AS (SELECT user_id AS custkey, count(*) AS n_events
               FROM events GROUP BY 1)
    SELECT COALESCE(o.custkey, e.custkey) AS custkey,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_events, 0) AS n_events
    FROM o FULL JOIN e ON o.custkey = e.custkey
    """,
)
def cogrouped_activity_counts(spark, sf_dir):
    """cogroup().applyInPandas — the per-key two-sided pandas merge —
    semantically pinned to a full-outer join of per-key counts. See
    operators/grouped.py::cogrouped_activity_counts."""
    from ..operators.grouped import cogrouped_activity_counts as op

    return op(_t(spark, sf_dir, "orders"), _t(spark, sf_dir, "events"))


@register(
    "json_variant_extract",
    oracle="""
    SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT)
                      / 10) AS BIGINT) AS k_bucket,
           count(*) AS n_events,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY 1
    """,
)
def json_variant_extract(spark, sf_dir):
    """Semi-structured VARIANT path (Spark 4): props parsed ONCE into
    the binary variant encoding with parse_json, fields then extracted
    with variant_get — for repeated multi-field access this beats
    get_json_object, which re-parses the JSON text per call. Same
    aggregate as the oracle's JSON-string extraction, so the whole
    variant encode/decode round-trip is value-checked."""
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return (
        _t(spark, sf_dir, "events")
        .select(F.floor(k / 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "chained_window_peak_counts",
    oracle="""
    WITH c AS (
      SELECT event_type,
             make_timestamp(CAST(floor(epoch(ts)/60)*60 AS BIGINT)
                            * 1000000) AS w_start,
             count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           make_timestamp(CAST(floor(epoch(w_start)/600)*600 AS BIGINT)
                          * 1000000) AS period_start,
           max(n) AS peak_per_minute
    FROM c GROUP BY 1, 2
    """,
)
def chained_window_peak_counts(spark, sf_dir):
    """Chained time-window aggregation: per-minute event counts
    re-windowed into 10-minute peaks — window() applied to a WINDOW
    COLUMN (Spark 3.4+), the batch twin of streaming's multiple
    stateful operators in one query. The re-aggregation input is
    already one row per (type, minute), so the second shuffle moves
    the reduced series, not events."""
    ev = _t(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "event_type", F.window("ts", "60 seconds").alias("w")
    ).agg(F.count("*").alias("n"))
    return (
        per_min.groupBy(
            "event_type", F.window(F.col("w"), "600 seconds").alias("p")
        )
        .agg(F.max("n").alias("peak_per_minute"))
        .select(
            "event_type",
            F.col("p.start").alias("period_start"),
            "peak_per_minute",
        )
    )


# --- TPC-H shape suite, part 2: the remaining plan shapes -------------------
# With these, every one of the 22 classic decision-support plan shapes
# has a fixture-adapted analogue in the registry (Q1≈agg_pricing_
# summary, Q3/Q5/Q10/Q18 earlier, Q4/Q7/Q12/Q14/Q16/Q21 above).
# Missing stock columns (partsupp, commit/receipt dates, phone,
# shipmode, supplycost) are substituted with fixture equivalents; each
# docstring names the substitution. What is preserved is the PLAN
# shape — that's what the optimizer-coverage claim rests on.


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 10
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape — the pure-pushdown microbenchmark: single scan,
    three range predicates (all reaching the parquet reader), one
    decimal sum, no join and no group — at 100 TB this query IS the
    scan, so anything that blocks pushdown shows up instantly."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 10)
    ).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * F.col("l_discount").cast(_DEC)
            ).cast("double"),
            2,
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_sales AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_DISC_PRICE_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO')
    SELECT o_year,
           floor(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE) * 10000) / 10000
             AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape — national market share: the widest join in the
    suite (8 relations, nation joined twice under aliases), reduced to
    a conditional-share scalar per year. Dims broadcast; the
    conditional numerator folds into the same partial aggregate as the
    denominator, so the 8-way join output is consumed map-side. Share
    truncated at 4 decimals with floor (no half-way digit)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    pt = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_regionkey").alias("n1_region"),
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    r = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    vol = _disc_price_spark()
    num = F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0))
    den = F.sum(vol)
    return (
        pt.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_region") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.floor(
                    num.cast("double") / den.cast("double") * 10000
                )
                / 10000
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum(
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))
             - CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(9,2))
               * CAST(0.5 AS DECIMAL(2,1))
           ) AS DOUBLE), 2) AS profit
    FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape — product-line profit by nation and year: LIKE
    filter on the part dim, 5-way join, profit expression spanning
    three tables' columns. Stock supplycost is absent, so cost is
    proxied as half the part's retail price — same expression shape
    (revenue minus quantity-scaled cost), exact decimal arithmetic
    (precisions sized to stay within both engines' 38-digit cap)."""
    dec = "decimal(12,2)"
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pt = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    profit = F.col("l_extendedprice").cast(dec) * (
        F.lit(1).cast(dec) - F.col("l_discount").cast(dec)
    ) - F.col("p_retailprice").cast(dec) * F.col("l_quantity").cast(
        "decimal(9,2)"
    ) * F.lit(0.5).cast("decimal(2,1)")
    return (
        pt.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (SELECT l_partkey,
                      sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
               FROM lineitem GROUP BY 1),
         t AS (SELECT sum(val) AS total FROM v)
    SELECT l_partkey, round(CAST(val AS DOUBLE), 2) AS part_value
    FROM v, t
    WHERE CAST(val AS DOUBLE) > CAST(total AS DOUBLE) * 0.0006
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape — groups filtered against a GLOBAL aggregate
    (HAVING sum > fraction of grand total). Distributed form: the
    per-part aggregate computes once, its grand total re-aggregates
    from the (small) per-part result — never a second fact scan — and
    joins back as a broadcast scalar. The threshold compares exact
    decimals cast to double on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(_DEC)).alias("val")
    )
    t = v.agg(F.sum("val").alias("total"))
    return (
        v.crossJoin(F.broadcast(t))
        .filter(
            F.col("val").cast("double")
            > F.col("total").cast("double") * 0.0006
        )
        .select(
            "l_partkey",
            F.round(F.col("val").cast("double"), 2).alias("part_value"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape — distribution of per-customer order counts:
    LEFT JOIN with the filter in the JOIN CONDITION (not WHERE — the
    stock trap: a WHERE would silently turn the outer join inner and
    drop zero-order customers), then a second aggregation over the
    first's output. count(o_orderkey) counts non-null matches only."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                           "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey AS partkey,
                       l_suppkey AS suppkey
                FROM lineitem),
         cand AS (SELECT p_partkey, s_suppkey, s_name, s_acctbal
                  FROM part
                    JOIN ps ON p_partkey = partkey
                    JOIN supplier ON suppkey = s_suppkey
                  WHERE p_type = 'LARGE' AND p_size < 10)
    SELECT p_partkey, s_name, s_acctbal
    FROM cand c1
    WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
                       WHERE c2.p_partkey = c1.p_partkey)
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape — per-part argmin supplier (stock: min
    supplycost from partsupp; here: min account balance among the
    part's suppliers, linked through distinct lineitem pairs since the
    fixture has no partsupp). The correlated '= (SELECT min ...)'
    plans as a window-min + filter — one pass over the candidate set
    instead of a per-row subquery, preserving ties exactly like the
    correlated form."""
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 10)
    ).select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    cand = (
        p.join(ps, p.p_partkey == ps.partkey)
        .join(s, ps.suppkey == s.s_suppkey)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "s_name", "s_acctbal")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1)
    SELECT s_suppkey, s_name,
           round(CAST(total_rev AS DOUBLE), 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape — top supplier via a reused derived view: the
    quarterly revenue aggregate is computed ONCE and consumed twice
    (row source + its own max as the filter scalar). Exact decimal
    equality against the broadcast max preserves ties; stock Q15's
    CREATE VIEW becomes the shared DataFrame subplan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice").cast(_DEC)).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias(
                "total_revenue"
            ),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0 * 100) / 100 AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l1 JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape — rows filtered against their own group's
    average (correlated scalar agg on the same fact). Distributed
    form: per-part averages aggregate once and join back — the fact
    scans twice but never self-joins row-to-row. Quantities are
    integer-valued, so their double sums (hence the 0.2*avg cut) are
    EXACT and identical across engines; the final ratio truncates
    via floor."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_q, F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.floor(
                    F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double")
                    / 7.0
                    * 100
                )
                / 100
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT round(CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 5 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
           AND l_quantity BETWEEN 10 AND 40)
    """,
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape — OR of conjunct blocks spanning BOTH join
    sides: no single conjunct can be fully pushed, but the common
    equi-key still hash-joins and Catalyst extracts the per-side
    residuals (brand/size prune the part build side). The stock trap
    is a plan that degrades to a nested loop on the disjunction — the
    plan gate asserts it stays a hash join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    blk = lambda b, s1, s2, q1, q2: (
        (F.col("p_brand") == b)
        & F.col("p_size").between(s1, s2)
        & F.col("l_quantity").between(q1, q2)
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            blk("Brand#1", 1, 10, 1, 20)
            | blk("Brand#2", 5, 20, 5, 30)
            | blk("Brand#3", 10, 40, 10, 40)
        )
        .agg(
            F.round(F.sum(_disc_price_spark()).cast("double"), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q20_excess_share_suppliers",
    oracle="""
    WITH ps AS (SELECT l_partkey, l_suppkey,
                       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sup_qty
                FROM lineitem GROUP BY 1, 2),
         pt AS (SELECT l_partkey,
                       sum(CAST(l_quantity AS DECIMAL(18,2))) AS tot_qty
                FROM lineitem GROUP BY 1)
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN ps ON l_suppkey = s_suppkey
      JOIN pt USING (l_partkey)
    WHERE n_name = 'NATION_1'
      AND CAST(sup_qty AS DOUBLE) > CAST(tot_qty AS DOUBLE) * 0.1
    """,
)
def q20_excess_share_suppliers(spark, sf_dir):
    """TPC-H Q20 shape — suppliers whose shipped quantity exceeds a
    threshold share of a part's total (stock: availqty > half of
    shipped; adapted to the fixture as supplier share > 10% of part
    total). Two aggregates at different grains over one fact, joined
    grain-to-grain — the nested-subquery formulation flattened into
    the distributed plan. DISTINCT collapses multi-part qualifiers."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.sum(F.col("l_quantity").cast(_DEC))
    ps = li.groupBy("l_partkey", "l_suppkey").agg(qty.alias("sup_qty"))
    pt = li.groupBy(F.col("l_partkey").alias("tp")).agg(
        qty.alias("tot_qty")
    )
    s = F.broadcast(
        _t(spark, sf_dir, "supplier").join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_1"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name")
    )
    return (
        ps.join(pt, F.col("l_partkey") == F.col("tp"))
        .filter(
            F.col("sup_qty").cast("double")
            > F.col("tot_qty").cast("double") * 0.1
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q22_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer
                     WHERE c_acctbal > 0)
    SELECT c_nationkey AS cntry, count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_nationkey IN (1, 3, 5, 7)
      AND c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q22_dormant_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape — global-scalar filter + NOT EXISTS anti-join +
    group rollup: above-average-balance customers in selected nations
    with no urgent orders (stock's country-code phone prefix becomes
    nationkey; 'no orders at all' is vacuous on this fixture — every
    customer has orders — so the anti-join keys on urgent ones). The
    average broadcasts as a one-row scalar; the anti-join prunes its
    orders scan to urgent rows before shuffling."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = F.broadcast(
        c.filter(F.col("c_acctbal") > 0).agg(
            F.avg("c_acctbal").alias("ab")
        )
    )
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        c.filter(F.col("c_nationkey").isin(1, 3, 5, 7))
        .crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double"), 2
            ).alias("totacctbal"),
        )
    )


@register(
    "asof_point_in_time_features",
    oracle="""
    SELECT c.event_id, c.user_id, f.feature_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') c
      ASOF LEFT JOIN
         (SELECT user_id, ts, value AS feature_value FROM events
          WHERE event_type = 'purchase') f
      ON c.user_id = f.user_id AND c.ts >= f.ts
    """,
)
def asof_point_in_time_features(spark, sf_dir):
    """Point-in-time feature lookup — the feature-store join that
    keeps training data leak-free: each click event gets the user's
    latest purchase value AS OF the click's own timestamp, never a
    later one (an ordinary join on user_id would leak future state
    into training examples). Same one-shuffle union-trick core as
    asof_join_backward; unmatched clicks keep NULL features
    (left-outer ASOF)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    feats = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("feature_value")
    )
    return asof_join_backward(
        clicks, feats, ["user_id"], "ts", "ts", ["feature_value"]
    ).select("event_id", "user_id", "feature_value")


@register(
    "window_rolling_median",
    oracle="""
    SELECT o_orderkey, o_custkey,
           quantile_cont(o_totalprice, 0.5) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS rolling_median_price
    FROM orders
    """,
)
def window_rolling_median(spark, sf_dir):
    """Rolling median over a 3-row frame — an ORDER-STATISTIC window,
    not a running sum: each frame must be re-sorted, which Spark only
    supports through percentile(0.5) over an explicit ROWS frame
    (median() itself refuses window frames). Continuous-quantile
    interpolation matches DuckDB's quantile_cont."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.percentile("o_totalprice", F.lit(0.5))
        .over(w)
        .alias("rolling_median_price"),
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / NULLIF(o_orderkey % 5, 0) AS safe_ratio,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)
             AS priority_digit
    FROM orders
    """,
)
def scalar_try_arithmetic(spark, sf_dir):
    """ANSI-safe error-free arithmetic: try_divide nulls out division
    by zero and try_cast nulls out unparseable strings instead of
    failing the job — the ingestion-grade alternative to exceptions at
    row 10^12 of a 100 TB scan. DuckDB expresses the same semantics
    with NULLIF and TRY_CAST.

    Optimization r15 (guide §1.2 per-task work): try_cast on a string
    that does NOT parse is implemented as a caught JVM exception, and
    o_orderstatus is 'O'/'F'/'P' — EVERY row threw. Measured at
    sf0.1: the bare try_cast(o_orderstatus) leg alone cost 1.10s vs
    0.10s for the identical-shape always-parses leg. The numeric-
    looking regex guard short-circuits non-numeric strings to the
    NULL try_cast would return (try_cast still parses the guarded
    values, so overflow etc. keep try semantics); query time dropped
    1.43s -> 0.23s with identical output. At 10^12 rows per-row
    exception construction is exactly the failure mode the try_*
    family exists to avoid."""
    o = _t(spark, sf_dir, "orders")
    numericish = r"^\s*[+-]?[0-9]+\s*$"
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5).alias(
            "safe_ratio"
        ),
        F.when(
            F.col("o_orderstatus").rlike(numericish),
            F.expr("try_cast(o_orderstatus AS INT)"),
        ).alias("status_as_int"),
        F.expr(
            "try_cast(substr(o_orderpriority, 1, 1) AS INT)"
        ).alias("priority_digit"),
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(e.ts) AS t_click
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.t_view
                 AND e.ts <= v.t_view + INTERVAL 3 DAY
               GROUP BY 1),
         p AS (SELECT e.user_id, min(e.ts) AS t_purchase
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                 AND e.ts <= c.t_click + INTERVAL 3 DAY
               GROUP BY 1)
    SELECT 1 + CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END
             AS funnel_stage,
           count(*) AS n_users
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    GROUP BY 1
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered-funnel analysis with a 3-day conversion window: users
    who viewed, then clicked AFTER the first view (within 3 days),
    then purchased after that click (within 3 days) — strict
    event-ORDER matching, not mere event presence (the distinction a
    naive three-way membership join gets wrong).

    Single-pass plan: one scan of the three funnel event types, one
    shuffle to user grain, then a Catalyst HOF state machine over the
    time-sorted per-user events (``aggregate`` over
    ``array_sort(collect_list(...))``) — vs the naive form's three
    scans + three shuffles + two joins. The first qualifying event in
    time order IS the stage's min, so the fold reproduces the cascaded
    min-aggregate semantics exactly (ties are strict-inequality-excluded
    on both sides, so intra-timestamp order can't change the result).
    Scale note: the shuffle carries every funnel-type event (projected
    to user_id+ts+type, no map-side reduction), and per-user state is
    the collected event array — for a pathologically hot user, cap with
    ``slice`` after sort or fall back to the cascaded-join form."""
    ev = _t(spark, sf_dir, "events")
    fold = """
        aggregate(
          evs,
          named_struct('v', CAST(NULL AS TIMESTAMP),
                       'c', CAST(NULL AS TIMESTAMP),
                       'p', CAST(NULL AS TIMESTAMP)),
          (s, x) -> CASE
            WHEN x.event_type = 'view' AND s.v IS NULL
              THEN named_struct('v', x.ts, 'c', s.c, 'p', s.p)
            WHEN x.event_type = 'click' AND s.c IS NULL
                 AND s.v IS NOT NULL AND x.ts > s.v
                 AND x.ts <= s.v + INTERVAL 3 DAYS
              THEN named_struct('v', s.v, 'c', x.ts, 'p', s.p)
            WHEN x.event_type = 'purchase' AND s.p IS NULL
                 AND s.c IS NOT NULL AND x.ts > s.c
                 AND x.ts <= s.c + INTERVAL 3 DAYS
              THEN named_struct('v', s.v, 'c', s.c, 'p', x.ts)
            ELSE s
          END)
    """
    return (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias(
                "evs"
            )
        )
        .select(F.expr(fold).alias("s"))
        .filter(F.col("s.v").isNotNull())
        .select(
            (
                F.lit(1)
                + F.when(F.col("s.c").isNotNull(), 1).otherwise(0)
                + F.when(F.col("s.p").isNotNull(), 1).otherwise(0)
            ).alias("funnel_stage")
        )
        .groupBy("funnel_stage")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY 1),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
      FROM events)
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.active_week) / 7
                AS BIGINT) AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM cohort c JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_weekly_retention(spark, sf_dir):
    """Weekly cohort retention matrix (signup week x weeks-since):
    the product-analytics staple next to the funnel. Two aggregations
    to the user/user-week grain plus one join back — every step keyed
    on user_id, so at 100 TB the whole thing is user-hash shuffles
    with map-side partial aggregation; no window over the full event
    stream. Week truncation is ISO-Monday on both engines and offsets
    divide exactly (week-trunc deltas are multiples of 7 days)."""
    ev = _t(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate) - 1)
               AS cohort_m
      FROM orders GROUP BY 1),
    acts AS (
      SELECT o.o_custkey, f.cohort_m,
             year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
               - f.cohort_m AS age_months,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
      FROM orders o JOIN firsts f USING (o_custkey)),
    cell AS (
      SELECT cohort_m, age_months,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             sum(rev) AS revenue
      FROM acts GROUP BY 1, 2)
    SELECT CAST(cohort_m // 12 AS BIGINT) AS cohort_year,
           CAST(cohort_m % 12 + 1 AS BIGINT) AS cohort_month,
           CAST(age_months AS BIGINT) AS age_months,
           n_customers,
           round(CAST(revenue AS DOUBLE), 2) AS revenue,
           round(CAST(sum(revenue) OVER (
                   PARTITION BY cohort_m ORDER BY age_months
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2)
             AS cum_revenue
    FROM cell
    """,
)
def orders_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, revenue accumulated by months-since-first-order — the
    finance twin of the retention matrix (cohort_weekly_retention
    counts heads; this sums money). Month arithmetic is integer
    (year*12+month), exact in both engines; revenue sums in
    decimal(18,2) and surfaces as round(CAST AS DOUBLE) per the money
    convention. The cumulative LTV window is PARTITIONED by cohort
    (bounded frame per cohort, parallel across cohorts) — not a
    global sort. Shape: one agg to customer grain, one broadcast-able
    join back, one agg to the (cohort, age) matrix."""
    o = _t(spark, sf_dir, "orders")
    month_idx = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    )
    firsts = o.groupBy("o_custkey").agg(
        F.min(month_idx).alias("cohort_m")
    )
    acts = o.join(firsts, "o_custkey").select(
        "o_custkey",
        "cohort_m",
        (month_idx - F.col("cohort_m")).alias("age_months"),
        F.col("o_totalprice").cast(_DEC).alias("rev"),
    )
    cell = acts.groupBy("cohort_m", "age_months").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum("rev").alias("revenue"),
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        F.floor(F.col("cohort_m") / 12).cast("long").alias("cohort_year"),
        (F.col("cohort_m") % 12 + 1).cast("long").alias("cohort_month"),
        F.col("age_months").cast("long").alias("age_months"),
        "n_customers",
        F.round(F.col("revenue").cast("double"), 2).alias("revenue"),
        F.round(F.sum("revenue").over(w).cast("double"), 2).alias(
            "cum_revenue"
        ),
    )


@register(
    "dq_schema_drift_events",
    oracle="""
    WITH b AS (
      SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2
               AS mid FROM events),
    h AS (
      SELECT event_type,
             CASE WHEN epoch_us(ts) <= b.mid THEN 0 ELSE 1 END AS half,
             CAST(round(value * 1000000) AS BIGINT) AS v_micro,
             CASE WHEN value IS NULL THEN 1 ELSE 0 END AS is_null
      FROM events, b),
    s AS (
      SELECT event_type, half,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v_micro) AS BIGINT) AS sv,
             CAST(sum(is_null) AS BIGINT) AS nn
      FROM h GROUP BY 1, 2)
    SELECT a.event_type,
           a.n AS n_first, c.n AS n_second,
           round(a.sv / (a.n * 1000000.0), 6) AS avg_first,
           round(c.sv / (c.n * 1000000.0), 6) AS avg_second,
           round(c.sv / (c.n * 1000000.0)
                 - a.sv / (a.n * 1000000.0), 6) AS avg_shift,
           round(a.nn / CAST(a.n AS DOUBLE), 6) AS null_rate_first,
           round(c.nn / CAST(c.n AS DOUBLE), 6) AS null_rate_second
    FROM s a JOIN s c
      ON a.event_type = c.event_type AND a.half = 0 AND c.half = 1
    """,
)
def dq_schema_drift_events(spark, sf_dir):
    """Schema/content drift check between the first and second half of
    the event stream (split at the midpoint epoch): per event type,
    row counts, value means, mean shift, and null rates — the canary
    for an upstream producer silently changing units or dropping a
    field. Means come from EXACT integer micro-unit sums
    (round(value*1e6) per row, identical in both engines; the BIGINT
    sum is order-independent), so the comparison is reproducible.
    Shape: one scan to (type, half) grain with map-side partials, a
    tiny self-join on the k-row summary — the fact stream never
    shuffles."""
    ev = _t(spark, sf_dir, "events")
    # Microsecond-exact integer midpoint (events carry sub-second
    # timestamps; second-truncated epochs would split boundary rows
    # differently than the oracle).
    b = ev.agg(
        F.expr(
            "(unix_micros(min(ts)) + unix_micros(max(ts))) div 2"
        ).alias("mid")
    )
    h = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(F.expr("unix_micros(ts)") <= F.col("mid"), 0)
        .otherwise(1)
        .alias("half"),
        F.round(F.col("value") * 1000000)
        .cast("long")
        .alias("v_micro"),
        F.when(F.col("value").isNull(), 1).otherwise(0).alias("is_null"),
    )
    # Persisted (optimization round 15, guide §2.4/§5): the k-row
    # summary feeds BOTH sides of the half-vs-half self-join;
    # unpersisted, each side re-ran the midpoint aggregate AND the
    # full event projection+aggregate — four scans of the fact stream
    # where two suffice (one for the midpoint, one for the grain).
    s = materialize_once(
        h.groupBy("event_type", "half").agg(
            F.count("*").alias("n"),
            F.sum("v_micro").alias("sv"),
            F.sum("is_null").alias("nn"),
        )
    )
    a = s.filter(F.col("half") == 0).alias("a")
    c = s.filter(F.col("half") == 1).alias("c")
    avg_a = F.col("a.sv") / (F.col("a.n") * 1000000.0)
    avg_c = F.col("c.sv") / (F.col("c.n") * 1000000.0)
    return a.join(c, F.col("a.event_type") == F.col("c.event_type")).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("n_first"),
        F.col("c.n").alias("n_second"),
        F.round(avg_a, 6).alias("avg_first"),
        F.round(avg_c, 6).alias("avg_second"),
        F.round(avg_c - avg_a, 6).alias("avg_shift"),
        F.round(
            F.col("a.nn") / F.col("a.n").cast("double"), 6
        ).alias("null_rate_first"),
        F.round(
            F.col("c.nn") / F.col("c.n").cast("double"), 6
        ).alias("null_rate_second"),
    )


@register(
    "part_skyline_price_size",
    oracle="""
    WITH dp AS (
      SELECT p_retailprice AS price, min(p_size) AS msize
      FROM part GROUP BY 1),
    e AS (
      SELECT price,
             min(msize) OVER (ORDER BY price
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS excl_min
      FROM dp)
    SELECT p.p_partkey, p.p_name, p.p_retailprice,
           CAST(p.p_size AS BIGINT) AS p_size
    FROM part p JOIN e ON e.price = p.p_retailprice
    WHERE e.excl_min IS NULL OR e.excl_min >= p.p_size
    """,
)
def part_skyline_price_size(spark, sf_dir):
    """2-D skyline (Pareto front) over parts: keep every part not
    STRICTLY dominated on (price, size) — no other part is cheaper
    AND smaller. The multi-objective shortlist query (cheapest
    viable supplier per size class, best quality/cost frontier).

    The classic 2-D sweep needs an EXCLUSIVE running min of size over
    the price order — here that is ``partitioned_running_min``
    (two-pass range-bucket scheme, frame UNBOUNDED PRECEDING..1
    PRECEDING) over the DISTINCT-price rollup, so no single-reducer
    sort exists even though prices scale with |part|; the verdict on
    each part row is then one broadcast-able equi-join on price.
    Dominance test: dominated iff min(size | price' < price) < size."""
    p = load_table(spark, sf_dir, "part")
    dp = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.min("p_size").alias("msize")
    )
    e = partitioned_running_min(
        dp,
        "price",
        False,
        [F.col("price")],
        F.col("msize"),
        "excl_min",
        inclusive=False,
    ).select("price", "excl_min")
    return (
        p.join(
            F.broadcast(e),
            p["p_retailprice"] == e["price"],
        )
        .filter(
            F.col("excl_min").isNull()
            | (F.col("excl_min") >= F.col("p_size"))
        )
        .select(
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.col("p_size").cast("long").alias("p_size"),
        )
    )


@register(
    "dedup_edit_distance1_names",
    oracle="""
    WITH n AS (SELECT DISTINCT c_name FROM customer
               WHERE c_custkey < 3000)
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
    FROM n a JOIN n b ON a.c_name < b.c_name
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def dedup_edit_distance1_names(spark, sf_dir):
    """Edit-distance-1 fuzzy self-join via FastSS deletion
    neighborhoods: each name generates itself plus every
    single-character deletion; two strings within Levenshtein
    distance 1 MUST share a variant (complete blocking), so the
    candidate join is an EQUI-join on the variant key — never a
    quadratic all-pairs levenshtein. Candidates verify with exact
    ``levenshtein <= 1``; the oracle replays the quadratic definition
    (sound at oracle scale, where |customer| is small) and matches
    because deletion-1 blocking is complete for ed<=1.

    Scale: fan-out is len(name)+1 variants per row; bucket sizes are
    the variant collision counts (tens, not thousands); the heavy
    levenshtein runs only on candidate pairs. Same shape at 100 TB
    with the variant join hash-partitioned. The registered slice
    bounds to c_custkey < 3000 (same convention as
    ``udtf_sentence_split``): the fixture's DENSE zero-padded ids
    make ed<=1 pairs grow ~linearly with |customer| (~20 digit
    neighbors each), so the unbounded form's output — not its plan —
    dominated bench time (5.9s at sf0.1)."""
    names = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 3000)
        .select("c_name")
        .distinct()
    )
    variants = names.select(
        "c_name",
        F.explode(
            F.concat(
                F.array(F.col("c_name")),
                F.expr(
                    "transform(sequence(1, length(c_name)), i -> "
                    "concat(substring(c_name, 1, i - 1), "
                    "substring(c_name, i + 1, length(c_name))))"
                ),
            )
        ).alias("variant"),
    ).distinct()
    # Persisted (optimization round 15, guide §2.4/§5): both candidate
    # self-join sides read variants; unpersisted, each side re-ran the
    # deletion-variant explode and its distinct aggregate (a second
    # full shuffle of the variant table).
    variants = materialize_once(variants)
    a = variants.select(
        F.col("c_name").alias("name_a"), "variant"
    )
    b = variants.select(
        F.col("c_name").alias("name_b"), "variant"
    )
    cand = (
        a.join(b, "variant")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.filter(
        F.levenshtein("name_a", "name_b") <= 1
    ).select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("lev"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS c_custkey,
             date_diff('day', max(o_orderdate),
                       (SELECT max(o_orderdate) FROM orders)) AS recency_days,
             count(*) AS frequency,
             round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS monetary
      FROM orders GROUP BY 1)
    SELECT c_custkey, CAST(recency_days AS BIGINT) AS recency_days,
           frequency, CAST(monetary AS DOUBLE) AS monetary,
           greatest(1, CAST(ceil(percent_rank() OVER (
             ORDER BY recency_days, c_custkey) * 5) AS BIGINT)) AS r_score,
           greatest(1, CAST(ceil(percent_rank() OVER (
             ORDER BY frequency DESC, c_custkey) * 5) AS BIGINT)) AS f_score,
           greatest(1, CAST(ceil(percent_rank() OVER (
             ORDER BY monetary DESC, c_custkey) * 5) AS BIGINT)) AS m_score
    FROM base
    """,
)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary quintiles per
    customer) — the classic CRM composite. One agg to customer grain;
    the global anchor date is a one-row broadcast scalar subquery.

    Scores are percent_rank quintiles (``greatest(1, ceil(pr * 5))``
    over the (metric, custkey) total order). Optimization r16
    (VERDICT r15 #5): instead of materializing every row's exact rank
    (three ``partitioned_row_number`` passes + two custkey joins —
    the r7-r15 form, ~3.4s local run-min), only the FOUR quintile
    BOUNDARY rows per metric are located, and each row's score is a
    pure projection counting how many boundary tuples precede it in
    the total order. Two bounded driver jobs do the locating:
    (1) per-metric range-bucket counts (bucket = deterministic
    expression over the shared 1024-row sample; ≤ 33 count rows per
    metric, unioned into one action), whose driver-side prefix sums
    give n and each boundary rank's (bucket, local rank);
    (2) per-bucket row_number over ONLY the ≤ 4 boundary buckets per
    metric (partitioned window, unioned into one action) to fetch the
    boundary (metric, custkey) tuples.
    The boundary RANKS R_k = max{rn : score(rn) <= k} are found by
    binary search on the driver replicating the engines' exact IEEE
    expression ceil(((rn-1)/(n-1))*5) (Python floats are the same
    IEEE doubles), so bucket assignment is bit-identical to the
    rank-materializing form — pinned by the oracle hash and
    ``test_rfm_boundary_scores_match_rank_form``.

    100 TB shape: the heavy frame is never range-shuffled and never
    joined — one groupBy to customer grain, two tiny count/boundary
    jobs, one final map-only projection; buckets (32) size to the
    cluster. r16 A/B (interleaved subset bench, 3 reps, run-min):
    rank form 3.37s -> boundary form 2.33s, new side wins 3/3; the
    one-reducer global ntile ×3 (0.90s local, same-session probe)
    stays rejected — its single-task sort of the customer-grain
    frame dies at 100x (round-7 verdict item 4).
    Monetary sums in decimal(18,2) per the repo's money convention."""
    import math

    from ..operators.relational import _bucketize

    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("anchor"))
    base = materialize_once(
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "c_custkey",
            F.datediff("anchor", "last_order").cast("long").alias(
                "recency_days"
            ),
            "frequency",
            F.col("monetary").cast("double").alias("monetary"),
        )
    )
    # ONE bounded sample job feeds all three metrics' range-bucket
    # boundaries (1024 rows in xxhash64 order).
    sample = (
        base.orderBy(F.xxhash64("c_custkey")).limit(1024).collect()
    )
    metrics = [
        ("recency_days", False, "r_score"),
        ("frequency", True, "f_score"),
        ("monetary", True, "m_score"),
    ]
    bucketed: dict = {}
    counts_df = None
    for metric, desc, _ in metrics:
        bdf, _nb = _bucketize(
            base,
            metric,
            desc,
            32,
            boundaries_from_sample([r[metric] for r in sample], desc),
        )
        bucketed[metric] = bdf
        cdf = bdf.groupBy("_bucket").count().select(
            F.lit(metric).alias("_m"), "_bucket", "count"
        )
        counts_df = cdf if counts_df is None else counts_df.unionAll(cdf)
    # Bounded action 1: <= 99 rows of per-bucket counts.
    count_rows = counts_df.collect()
    per_metric_counts: dict = {m: {} for m, _, _ in metrics}
    for row in count_rows:
        per_metric_counts[row._m][row._bucket] = row["count"]
    n = sum(per_metric_counts[metrics[0][0]].values())

    def score_of_rank(rn: int) -> int:
        # EXACT replica of both engines' double expression:
        # greatest(1, ceil(((rn-1)/(n-1)) * 5)); Python floats are
        # IEEE doubles, so boundary placement is bit-faithful.
        if n <= 1:
            return 1
        return max(1, math.ceil(((rn - 1) / (n - 1)) * 5))

    # R_k = last rank whose score is <= k (monotone -> binary search).
    boundary_ranks = []
    for kq in (1, 2, 3, 4):
        lo, hi = 1, n  # score_of_rank(1) == 1 <= kq always (n >= 1)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if score_of_rank(mid) <= kq:
                lo = mid
            else:
                hi = mid - 1
        boundary_ranks.append(lo)
    extracts = None
    locate: dict = {}
    for metric, desc, _ in metrics:
        counts = per_metric_counts[metric]
        prefix, acc = {}, 0
        for b in sorted(counts):
            prefix[b] = acc
            acc += counts[b]
        want: dict = {}
        if n:
            for rk in boundary_ranks:
                tgt = None
                for b in sorted(counts):
                    if rk > prefix[b]:
                        tgt = b
                want.setdefault(tgt, []).append(rk - prefix[tgt])
        locate[metric] = want
        if not want:
            continue
        bdf = bucketed[metric]
        order = [
            F.col(metric).desc() if desc else F.col(metric),
            F.col("c_custkey"),
        ]
        w = Window.partitionBy("_bucket").orderBy(*order)
        edf = (
            bdf.filter(F.col("_bucket").isin(list(want)))
            .select(
                F.lit(metric).alias("_m"),
                "_bucket",
                F.col(metric).alias("_v"),
                "c_custkey",
                F.row_number().over(w).alias("_lr"),
            )
            .filter(
                F.col("_lr").isin(
                    sorted({lr for lrs in want.values() for lr in lrs})
                )
            )
        )
        extracts = edf if extracts is None else extracts.unionAll(edf)
    # Bounded action 2: <= 12 boundary tuples.
    tuples: dict = {m: [] for m, _, _ in metrics}
    if extracts is not None:
        rows = extracts.collect()
        by_key = {(r._m, r._bucket, r._lr): (r._v, r.c_custkey) for r in rows}
        for metric, _, _ in metrics:
            for b, lrs in locate[metric].items():
                for lr in lrs:
                    tuples[metric].append(by_key[(metric, b, lr)])
    # Final map-only projection: score = 1 + #{boundary tuples that
    # PRECEDE this row in the (metric, custkey) total order}, i.e.
    # rank > R_k  <=>  tuple > boundary tuple at R_k.
    out_cols = ["c_custkey", "recency_days", "frequency", "monetary"]
    proj = base.select(*out_cols)
    for metric, desc, out in metrics:
        expr = F.lit(1)
        for bv, bc in tuples[metric]:
            mcol, vlit = F.col(metric), F.lit(bv)
            after = (
                (mcol < vlit) if desc else (mcol > vlit)
            ) | ((mcol == vlit) & (F.col("c_custkey") > F.lit(bc)))
            expr = expr + after.cast("int")
        proj = proj.withColumn(out, expr.cast("long"))
    return proj


@register(
    "winsorize_order_prices",
    oracle="""
    WITH lim AS (SELECT o_orderpriority,
                        quantile_cont(o_totalprice, 0.05) AS p05,
                        quantile_cont(o_totalprice, 0.95) AS p95
                 FROM orders GROUP BY o_orderpriority)
    SELECT o_orderkey, o.o_orderpriority,
           round(least(greatest(o_totalprice, p05), p95), 6) AS winsorized,
           (o_totalprice < p05 OR o_totalprice > p95) AS clipped
    FROM orders o JOIN lim USING (o_orderpriority)
    """,
)
def winsorize_order_prices(spark, sf_dir):
    """Grouped winsorization: clamp each order's price to its
    priority group's exact [p05, p95] band and flag the clipped tail
    rows — the outlier treatment that precedes stable aggregate
    statistics. Spark's exact ``percentile`` interpolates identically
    to DuckDB's ``quantile_cont``, so the clamp is oracle-exact.

    Shape: one grouped exact-percentile aggregate (k rows out) +
    one broadcast join back to the fact scan. At 100 TB swap the
    exact percentile for ``percentile_approx`` and re-check the
    tolerance — the plan (agg + broadcast-join) is unchanged."""
    o = _t(spark, sf_dir, "orders")
    lim = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    return o.join(F.broadcast(lim), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(
            F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95")),
            6,
        ).alias("winsorized"),
        (
            (F.col("o_totalprice") < F.col("p05"))
            | (F.col("o_totalprice") > F.col("p95"))
        ).alias("clipped"),
    )


@register(
    "agg_regr_price_vs_qty",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             sum(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
             sum(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / n,
                 6) AS intercept,
           round(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS r2
    FROM m
    """,
)
def agg_regr_price_vs_qty(spark, sf_dir):
    """Grouped least-squares regression of price on quantity (slope /
    intercept / r²) per return flag — the built-in ``regr_slope``
    family's semantics, but computed from EXACT decimal sufficient
    statistics: float ``regr_*`` aggregates are order-dependent in
    their last bits (different partial-aggregation trees between
    engines), while DECIMAL sums of 2-dp-exact casts are
    order-independent, so the final double formula evaluates the same
    IEEE operations on identical inputs in both engines.

    Shape: one partial-agg scan to 6 moments per group (map-side
    combine, k rows shuffled), formulas applied on the k-row result —
    the sufficient-statistics pattern, same as quality_logistic_fit's
    normal equations."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(_DEC)
    y = F.col("l_extendedprice").cast(_DEC)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((cov_n * cov_n) / (var_x * var_y), 6).alias("r2"),
    )


@register(
    "histogram_equidepth_prices",
    oracle="""
    WITH c AS (SELECT quantile_cont(o_totalprice,
                        [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q
               FROM orders),
    b AS (SELECT o_totalprice,
                 1 + (o_totalprice > q[1])::INT + (o_totalprice > q[2])::INT
                   + (o_totalprice > q[3])::INT + (o_totalprice > q[4])::INT
                   + (o_totalprice > q[5])::INT + (o_totalprice > q[6])::INT
                   + (o_totalprice > q[7])::INT AS bucket
          FROM orders, c)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(min(o_totalprice), 6) AS lo,
           round(max(o_totalprice), 6) AS hi
    FROM b GROUP BY bucket
    """,
)
def histogram_equidepth_prices(spark, sf_dir):
    """Equi-DEPTH price histogram (8 octile buckets) — the profiling
    twin of the equi-width `histogram_price_buckets`. A global-sort
    NTILE would serialize 100 TB through one partition; instead the 7
    exact octile cut points come from one percentile aggregate (Spark
    `percentile` == DuckDB `quantile_cont`, interpolation-identical),
    broadcast back, and bucket assignment is a comparison sum on the
    scan — two narrow passes, no global sort at any size."""
    o = _t(spark, sf_dir, "orders")
    # ONE percentile aggregate with an array of probabilities — seven
    # scalar percentile expressions would each run their own sort-agg
    # pass over the column.
    cuts = o.agg(
        F.expr(
            "percentile(o_totalprice, "
            "array(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875))"
        ).alias("q")
    ).select(*[F.col("q")[i].alias(f"q{i+1}") for i in range(7)])
    bucket = F.lit(1)
    for i in range(1, 8):
        bucket = bucket + (F.col("o_totalprice") > F.col(f"q{i}")).cast("int")
    return (
        o.crossJoin(F.broadcast(cuts))
        .select(F.col("o_totalprice"), bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
    )


@register(
    "dq_column_profile",
    oracle="""
    WITH a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(*) - count(o_orderkey) AS BIGINT) AS nn1,
        CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd1,
        CAST(min(o_orderkey) AS VARCHAR) AS mn1,
        CAST(max(o_orderkey) AS VARCHAR) AS mx1,
        CAST(count(*) - count(o_custkey) AS BIGINT) AS nn2,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd2,
        CAST(min(o_custkey) AS VARCHAR) AS mn2,
        CAST(max(o_custkey) AS VARCHAR) AS mx2,
        CAST(count(*) - count(o_orderstatus) AS BIGINT) AS nn3,
        CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
        min(o_orderstatus) AS mn3,
        max(o_orderstatus) AS mx3,
        CAST(count(*) - count(o_totalprice) AS BIGINT) AS nn4,
        CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd4,
        CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(18,2))
             AS VARCHAR) AS mn4,
        CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(18,2))
             AS VARCHAR) AS mx4,
        CAST(count(*) - count(o_orderdate) AS BIGINT) AS nn5,
        CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd5,
        CAST(min(o_orderdate) AS VARCHAR) AS mn5,
        CAST(max(o_orderdate) AS VARCHAR) AS mx5,
        CAST(count(*) - count(o_orderpriority) AS BIGINT) AS nn6,
        CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd6,
        min(o_orderpriority) AS mn6,
        max(o_orderpriority) AS mx6
      FROM orders
    )
    SELECT 'o_orderkey' AS col_name, n_rows, nn1 AS n_nulls,
           nd1 AS n_distinct, mn1 AS min_value, mx1 AS max_value FROM a
    UNION ALL SELECT 'o_custkey', n_rows, nn2, nd2, mn2, mx2 FROM a
    UNION ALL SELECT 'o_orderstatus', n_rows, nn3, nd3, mn3, mx3 FROM a
    UNION ALL SELECT 'o_totalprice', n_rows, nn4, nd4, mn4, mx4 FROM a
    UNION ALL SELECT 'o_orderdate', n_rows, nn5, nd5, mn5, mx5 FROM a
    UNION ALL SELECT 'o_orderpriority', n_rows, nn6, nd6, mn6, mx6 FROM a
    """,
)
def dq_column_profile(spark, sf_dir):
    """Whole-table column profiling (the ingest-time audit every
    pipeline runs before training on a new drop): per column — null
    count, exact distinct count, min/max rendered as strings.

    One full-width scan computes counts/nulls/min/max for all 6
    columns; each DISTINCT count runs as its own single-column
    aggregate over a COLUMN-PRUNED scan (same total I/O as a second
    full scan, since the 6 pruned scans read one column each), and
    the 7 one-row results broadcast-join into the final stack().
    This deliberately avoids putting 6 countDistinct in ONE
    aggregate: Catalyst plans that via Expand (rows x 7) followed by
    a SortAggregate keyed on every column — measured 4x slower than
    the split form and quadratically worse with width. At 100 TB
    swap the exact counts for approx_count_distinct (one scan, no
    shuffle growth); the oracle pins the exact variant.
    min/max on doubles go through DECIMAL(18,2) so the string render
    is engine-independent."""
    o = load_table(spark, sf_dir, "orders")
    dec_s = (
        lambda c, fn: F.round(fn(c), 2)
        .cast("decimal(18,2)")
        .cast("string")
    )
    a = o.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("o_orderkey")).alias("nn1"),
        F.min("o_orderkey").cast("string").alias("mn1"),
        F.max("o_orderkey").cast("string").alias("mx1"),
        (F.count("*") - F.count("o_custkey")).alias("nn2"),
        F.min("o_custkey").cast("string").alias("mn2"),
        F.max("o_custkey").cast("string").alias("mx2"),
        (F.count("*") - F.count("o_orderstatus")).alias("nn3"),
        F.min("o_orderstatus").alias("mn3"),
        F.max("o_orderstatus").alias("mx3"),
        (F.count("*") - F.count("o_totalprice")).alias("nn4"),
        dec_s("o_totalprice", F.min).alias("mn4"),
        dec_s("o_totalprice", F.max).alias("mx4"),
        (F.count("*") - F.count("o_orderdate")).alias("nn5"),
        F.min("o_orderdate").cast("string").alias("mn5"),
        F.max("o_orderdate").cast("string").alias("mx5"),
        (F.count("*") - F.count("o_orderpriority")).alias("nn6"),
        F.min("o_orderpriority").alias("mn6"),
        F.max("o_orderpriority").alias("mx6"),
    )
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    for i, c in enumerate(cols, start=1):
        nd = o.select(c).agg(F.countDistinct(c).alias(f"nd{i}"))
        a = a.crossJoin(F.broadcast(nd))
    return a.select(
        F.expr(
            "stack(6,"
            " 'o_orderkey', nn1, nd1, mn1, mx1,"
            " 'o_custkey', nn2, nd2, mn2, mx2,"
            " 'o_orderstatus', nn3, nd3, mn3, mx3,"
            " 'o_totalprice', nn4, nd4, mn4, mx4,"
            " 'o_orderdate', nn5, nd5, mn5, mx5,"
            " 'o_orderpriority', nn6, nd6, mn6, mx6)"
            " AS (col_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        "n_rows",
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_value", "max_value",
    )


@register(
    "dq_key_skew_profile",
    oracle="""
    WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
               FROM lineitem GROUP BY l_orderkey)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(min(cnt) AS BIGINT) AS min_rows,
           CAST(max(cnt) AS BIGINT) AS max_rows,
           round(avg(cnt), 6) AS avg_rows,
           quantile_cont(cnt, 0.5) AS p50,
           quantile_cont(cnt, 0.9) AS p90,
           quantile_cont(cnt, 0.99) AS p99,
           round(max(cnt) / avg(cnt), 4) AS skew_ratio
    FROM c
    """,
)
def dq_key_skew_profile(spark, sf_dir):
    """Join-key skew diagnostic: the distribution of rows per
    l_orderkey — exactly the statistic that decides whether a join on
    this key needs salting / AQE skew handling before it runs at
    scale (max/avg ratio is the headline; exact p50/p90/p99 give the
    tail shape).

    One groupBy(key) count (map-side partial combine does most of the
    work) then a single-row global aggregate. Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` interpolate
    identically, so the profile is hash-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    return c.agg(
        F.count("*").alias("n_keys"),
        F.min("cnt").alias("min_rows"),
        F.max("cnt").alias("max_rows"),
        F.round(F.avg("cnt"), 6).alias("avg_rows"),
        F.expr("percentile(cnt, 0.5)").alias("p50"),
        F.expr("percentile(cnt, 0.9)").alias("p90"),
        F.expr("percentile(cnt, 0.99)").alias("p99"),
        F.round(F.max("cnt") / F.avg("cnt"), 4).alias("skew_ratio"),
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, median(adev) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_id, d.event_type,
           round(d.value, 6) AS value,
           round(d.med, 6) AS med,
           round(m.mad, 6) AS mad,
           d.adev > 3 * 1.4826 * m.mad AS is_anomaly
    FROM dev d JOIN mad m USING (event_type)
    """,
)
def events_anomaly_mad(spark, sf_dir):
    """Robust anomaly flags via median absolute deviation: a value is
    anomalous when |v - median| exceeds 3 scaled MADs (1.4826 makes
    MAD consistent with sigma under normality) — the robust companion
    to the rolling z-score, immune to the outliers it hunts (mean and
    stddev are themselves dragged by extreme values; medians are not).

    Two grouped EXACT medians (Spark ``percentile``, DuckDB
    ``median`` — both exact-sorting aggregates, identical up to the
    shared midpoint interpolation) sharing one hash partitioning on
    event_type, then a broadcast of the tiny per-type profile back
    over the events. At 100 TB the exact median swaps for
    ``percentile_approx`` with a documented error bound — the flag
    threshold logic is unchanged."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        (F.col("adev") > 3 * 1.4826 * F.col("mad")).alias("is_anomaly"),
    )


@register(
    "orders_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d
          GROUP BY digit),
    tot AS (SELECT sum(n) AS tn FROM c)
    SELECT c.digit, c.n,
           round(c.n / CAST(t.tn AS DOUBLE), 6) AS observed,
           round(log10(1.0 + 1.0 / c.digit), 6) AS expected,
           round(abs(c.n / CAST(t.tn AS DOUBLE)
                     - log10(1.0 + 1.0 / c.digit)), 6) AS abs_dev
    FROM c, tot t ORDER BY c.digit
    """,
)
def orders_benford_audit(spark, sf_dir):
    """Benford first-digit audit of order totals: observed leading-
    digit frequencies vs the Benford expectation log10(1 + 1/d) — the
    classic fabricated-data / broken-generator screen for financial
    columns (organic multi-scale amounts follow Benford; uniform or
    hand-entered ones do not).

    The leading digit comes from the INTEGER part's string head (no
    float log10 of the value itself, whose boundary behavior at exact
    powers of ten differs sub-ulp between engines); one 9-row group
    count + a scalar total. Output is 9 rows at any scale."""
    ev = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = ev.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    tot = c.agg(F.sum("n").alias("tn"))
    obs = F.col("n") / F.col("tn").cast("double")
    exp = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed"),
            F.round(exp, 6).alias("expected"),
            F.round(F.abs(obs - exp), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    t AS (SELECT prev, event_type AS next,
                 CAST(count(*) AS BIGINT) AS n
          FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type),
    tot AS (SELECT prev, sum(n) AS tn FROM t GROUP BY prev)
    SELECT t.prev, t.next, t.n,
           round(t.n / CAST(tot.tn AS DOUBLE), 6) AS p
    FROM t JOIN tot USING (prev)
    """,
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | previous event type), with counts —
    the behavioral model behind funnel diagnostics and next-action
    prediction baselines (a funnel is one path through this matrix).

    One window sort per user (lag), one (prev, next) count, one
    per-prev rollup reusing the same partitioning; output is bounded
    by |event_type|^2, never by event volume — the matrix a 100 TB
    clickstream reduces to a few hundred rows. The (ts, event_id)
    tiebreak makes sequence order total, so counts are exact and
    engine-identical."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("next"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    t = s.groupBy("prev", "next").agg(F.count("*").alias("n"))
    tot = t.groupBy("prev").agg(F.sum("n").alias("tn"))
    return t.join(tot, "prev").select(
        "prev",
        "next",
        "n",
        F.round(F.col("n") / F.col("tn").cast("double"), 6).alias("p"),
    )


@register(
    "events_top_paths_3step",
    oracle="""
    WITH s AS (
      SELECT event_type AS cur,
             lag(event_type) OVER w AS prev,
             lag(event_type, 2) OVER w AS prev2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    p AS (SELECT prev2 || '>' || prev || '>' || cur AS path,
                 CAST(count(*) AS BIGINT) AS n
          FROM s WHERE prev2 IS NOT NULL GROUP BY 1)
    SELECT path, n FROM p ORDER BY n DESC, path LIMIT 10
    """,
)
def events_top_paths_3step(spark, sf_dir):
    """Top-10 most common 3-step behavioral paths (event-type
    trigrams over per-user time-ordered sequences) — the sequence-
    mining companion to the Markov matrix: where the matrix gives
    one-step dynamics, this surfaces the dominant multi-step journeys.

    One window sort per user serves BOTH lag columns (single
    exchange), one path count (bounded by |types|^3), one TakeOrdered
    top-10. The (ts, event_id) tiebreak totalizes sequence order, so
    counts are exact and engine-identical."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    ).filter(F.col("prev2").isNotNull())
    p = s.select(
        F.concat_ws(">", "prev2", "prev", "cur").alias("path")
    ).groupBy("path").agg(F.count("*").alias("n"))
    return p.orderBy(F.col("n").desc(), "path").limit(10)


@register(
    "attribution_last_touch",
    oracle="""
    WITH j AS (
      SELECT p.event_id, p.user_id, p.ts, f.click_ts, f.click_value
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
        ASOF LEFT JOIN
           (SELECT user_id, ts AS click_ts, value AS click_value
            FROM events WHERE event_type = 'click') f
        ON p.user_id = f.user_id AND p.ts >= f.click_ts
    )
    SELECT event_id, user_id, ts,
           (click_ts IS NOT NULL
            AND date_diff('second', click_ts, ts) <= 3600) AS attributed,
           CASE WHEN click_ts IS NOT NULL
                 AND date_diff('second', click_ts, ts) <= 3600
                THEN click_ts END AS attributed_click_ts,
           round(CASE WHEN click_ts IS NOT NULL
                       AND date_diff('second', click_ts, ts) <= 3600
                      THEN click_value END, 6) AS attributed_value
    FROM j
    """,
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch conversion attribution: each purchase is credited to
    the same user's most recent click, but only when that click falls
    inside a 1-hour attribution window — the standard marketing-
    analytics join (and a leak-free one: only PAST clicks are
    eligible, never later ones).

    Composition: the one-shuffle backward as-of join core
    (``operators/relational.py::asof_join_backward``) finds the
    latest prior click; the tolerance is then applied as a plain
    column predicate on BOTH engine and oracle sides (DuckDB ASOF has
    no native tolerance), nulling out credits older than the window
    rather than dropping the purchase row."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    j = asof_join_backward(
        purchases, clicks, ["user_id"], "ts", "click_ts",
        ["click_ts", "click_value"],
    )
    within = F.col("click_ts").isNotNull() & (
        (F.col("ts").cast("long") - F.col("click_ts").cast("long")) <= 3600
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        within.alias("attributed"),
        F.when(within, F.col("click_ts")).alias("attributed_click_ts"),
        F.round(F.when(within, F.col("click_value")), 6).alias(
            "attributed_value"
        ),
    )


@register(
    "orders_abc_pareto_classes",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM lineitem GROUP BY l_partkey),
    cum AS (
      SELECT partkey, revenue_cents,
             CAST(sum(revenue_cents) OVER (
                    ORDER BY revenue_cents DESC, partkey
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev,
             CAST(sum(revenue_cents) OVER () AS BIGINT) AS total_rev
      FROM rev)
    SELECT partkey, revenue_cents,
           CASE WHEN 5 * cum_rev <= 4 * total_rev THEN 'A'
                WHEN 20 * cum_rev <= 19 * total_rev THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum
    """,
)
def orders_abc_pareto_classes(spark, sf_dir):
    """ABC / Pareto inventory classification: parts ranked by total
    revenue, class A = the head covering the first 80% of cumulative
    revenue, B = to 95%, C = the tail. Class boundaries compare
    ``5*cum <= 4*total`` / ``20*cum <= 19*total`` in DECIMAL — no
    division, no floats, so the classification is bit-exact in both
    engines and under any aggregation order.

    Revenue is summed in exact integer CENTS (per-row
    double-product rounded to cents is bit-identical in both engines;
    the BIGINT sum is then order-independent) — a DECIMAL(18,2) cast
    of a double SUM flips cents at .xx5 boundaries depending on
    aggregation order, which a first A/B against the oracle caught.

    Scale shape: the revenue rollup is a fact-table hash aggregate
    keyed on partkey; the part rollup SCALES WITH SF (200k x SF rows
    in TPC-H), so the cumulative ranking must not be a one-reducer
    global window. It is the two-pass partition-offset running sum
    (``partitioned_running_sum``): range-bucket on revenue_cents desc
    from sampled boundaries, local cumsum per bucket, broadcast
    prefix offsets — bit-identical output to the oracle's global
    window. total_rev is a one-row aggregate broadcast, not an
    unbounded-frame window. The same shape classifies customers or
    SKUs.

    A/B (bench.py subset, sf0.1 min-of-2): 0.45s as a global window →
    ~1.2-1.5s in this form (boundary-sample job + bucketed subplans)
    — the deliberate local cost of removing the one-reducer sort
    (round-7 verdict item 3)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Cached: the two-pass cumsum reads this rollup three times
    # (boundary sample, bucket totals, final plan) plus the total_rev
    # aggregate — without the cache each pass re-runs the fact scan.
    rev = materialize_once(
        li.groupBy(F.col("l_partkey").alias("partkey")).agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_cents")
        )
    )
    cum = partitioned_running_sum(
        rev,
        "revenue_cents",
        True,
        [F.col("revenue_cents").desc(), F.col("partkey")],
        F.col("revenue_cents"),
        "cum_rev",
    ).crossJoin(
        F.broadcast(rev.agg(F.sum("revenue_cents").alias("total_rev")))
    )
    return cum.select(
        "partkey",
        "revenue_cents",
        F.when(
            F.col("cum_rev") * 5 <= F.col("total_rev") * 4, F.lit("A")
        )
        .when(
            F.col("cum_rev") * 20 <= F.col("total_rev") * 19, F.lit("B")
        )
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


@register(
    "json_variant_typed_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS max_k,
           CAST(count(json_extract(props, '$.missing')) AS BIGINT)
             AS n_missing
    FROM events GROUP BY event_type
    """,
)
def json_variant_typed_extract(spark, sf_dir):
    """Spark 4 VARIANT path for semi-structured JSON (SURVEY §2.8):
    ``parse_json`` decodes the props column ONCE into the binary
    VARIANT encoding, then ``variant_get`` pulls typed fields without
    re-parsing per access — the engine-native answer to repeated
    get_json_object calls (which re-parse the string per extraction;
    ``json_extract_props`` keeps that classic form). try_variant_get
    on an absent path exercises the null-safe accessor; the grouped
    aggregate surfaces only plain typed columns, so the oracle is
    ordinary DuckDB json_extract."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_type",
            F.variant_get(v, "$.k", "bigint").alias("k"),
            F.try_variant_get(v, "$.missing", "double").alias("miss"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
            F.count("miss").cast("long").alias("n_missing"),
        )
    )


@register(
    "dq_expectation_suite",
    oracle="""
    WITH o AS (
      SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS r1,
             CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS r2,
             CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')
                           THEN 0 ELSE 1 END) AS BIGINT) AS r3
      FROM orders),
    l AS (
      SELECT CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50
                           THEN 0 ELSE 1 END) AS BIGINT) AS r4,
             CAST(sum(CASE WHEN l_discount BETWEEN 0 AND 0.10
                           THEN 0 ELSE 1 END) AS BIGINT) AS r5
      FROM lineitem),
    c AS (
      SELECT CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS r6
      FROM customer),
    ref AS (
      SELECT CAST(count(*) AS BIGINT) AS r7
      FROM lineitem li LEFT JOIN orders oo
        ON li.l_orderkey = oo.o_orderkey
      WHERE oo.o_orderkey IS NULL),
    shp AS (
      SELECT CAST(sum(CASE WHEN li.l_shipdate < oo.o_orderdate
                           THEN 1 ELSE 0 END) AS BIGINT) AS r8
      FROM lineitem li JOIN orders oo
        ON li.l_orderkey = oo.o_orderkey),
    rows_out(rule_id, rule, violations) AS (
      SELECT 1, 'orders.o_custkey IS NOT NULL', r1 FROM o
      UNION ALL SELECT 2, 'orders.o_totalprice > 0', r2 FROM o
      UNION ALL SELECT 3,
        'orders.o_orderstatus IN (O,F,P)', r3 FROM o
      UNION ALL SELECT 4,
        'lineitem.l_quantity BETWEEN 1 AND 50', r4 FROM l
      UNION ALL SELECT 5,
        'lineitem.l_discount BETWEEN 0 AND 0.10', r5 FROM l
      UNION ALL SELECT 6, 'customer.c_custkey UNIQUE', r6 FROM c
      UNION ALL SELECT 7,
        'lineitem.l_orderkey REFERENCES orders', r7 FROM ref
      UNION ALL SELECT 8,
        'lineitem.l_shipdate >= orders.o_orderdate', r8 FROM shp)
    SELECT CAST(rule_id AS BIGINT) AS rule_id, rule,
           violations, violations = 0 AS passed
    FROM rows_out
    """,
)
def dq_expectation_suite(spark, sf_dir):
    """Declarative expectation suite (the Great-Expectations / dbt-test
    operating pattern): 8 rules — null, range, domain, uniqueness,
    referential integrity, and cross-column order — each reported as
    (rule_id, rule, violations, passed). The fixture data genuinely
    fails rule 8 (~5% of lineitem rows ship before their order date),
    so the suite demonstrates violation COUNTING, not just vacuous
    greens.

    Scale shape: all same-table rules share ONE scan via conditional
    aggregation then stack() to rows (orders scanned once for rules
    1-3, lineitem once for 4-5), uniqueness is a two-level count
    distinct, and the two join rules share ONE left equi-join
    (optimization round 15: a null match IS the referential violation,
    and the cross-column comparison evaluates only on matched rows —
    count-identical to the old anti + inner pair) the optimizer is
    free to broadcast or shuffle by size. Eight rules cost 3 scans +
    1 join at any scale.

    Bench A/B (r12, the r11 vs_prev watch row ~0.95->1.50s): code
    UNCHANGED since r10; alternating HEAD-vs-r10-worktree subset runs
    measured 1.634/1.402 (HEAD) vs 1.337/1.495 (r10) — sign flips,
    identical r10 code sits ~1.5x above its own committed record, and
    the r12 full run came back at 1.058s. Verdict: host noise."""
    o = _t(spark, sf_dir, "orders").agg(
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("r1"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("r2"),
        F.sum(
            F.when(
                F.col("o_orderstatus").isin("O", "F", "P"), 0
            ).otherwise(1)
        ).alias("r3"),
    )
    li = _t(spark, sf_dir, "lineitem").agg(
        F.sum(
            F.when(F.col("l_quantity").between(1, 50), 0).otherwise(1)
        ).alias("r4"),
        F.sum(
            F.when(F.col("l_discount").between(0, 0.10), 0).otherwise(1)
        ).alias("r5"),
    )
    c = _t(spark, sf_dir, "customer").agg(
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("r6")
    )
    # Rules 7 and 8 share ONE left join (optimization round 15, guide
    # §2.4): the referential violation is a null match (exactly the
    # rows the anti join returned — unmatched rows survive a left join
    # once regardless of right-side multiplicity) and the cross-column
    # rule only evaluates on matched rows (its old inner join), so one
    # lineitem+orders join replaces two — one fewer scan of EACH table
    # and one fewer join at any scale. Counts are identical.
    refshp = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .join(
            _t(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("l_orderkey"),
                # carried for rule 7's match test: the JOIN KEY's
                # nullness is the referential signal (ADVICE r15 —
                # testing o_orderdate instead would over-count if
                # orders ever carried a NULL o_orderdate; identical
                # on the fixture, where it is non-nullable).
                F.col("o_orderkey"),
                "o_orderdate",
            ),
            "l_orderkey",
            "left",
        )
        .agg(
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("r7"),
            F.sum(
                F.when(
                    F.col("l_shipdate") < F.col("o_orderdate"), 1
                ).otherwise(0)
            ).alias("r8"),
        )
    )
    stacked = (
        o.select(
            F.expr(
                "stack(3,"
                " 1, 'orders.o_custkey IS NOT NULL', r1,"
                " 2, 'orders.o_totalprice > 0', r2,"
                " 3, 'orders.o_orderstatus IN (O,F,P)', r3)"
                " as (rule_id, rule, violations)"
            )
        )
        .unionAll(
            li.select(
                F.expr(
                    "stack(2,"
                    " 4, 'lineitem.l_quantity BETWEEN 1 AND 50', r4,"
                    " 5, 'lineitem.l_discount BETWEEN 0 AND 0.10', r5)"
                    " as (rule_id, rule, violations)"
                )
            )
        )
        .unionAll(
            c.select(
                F.lit(6).alias("rule_id"),
                F.lit("customer.c_custkey UNIQUE").alias("rule"),
                F.col("r6").alias("violations"),
            )
        )
        .unionAll(
            refshp.select(
                F.expr(
                    "stack(2,"
                    " 7, 'lineitem.l_orderkey REFERENCES orders', r7,"
                    " 8, 'lineitem.l_shipdate >= orders.o_orderdate', r8)"
                    " as (rule_id, rule, violations)"
                )
            )
        )
    )
    return stacked.select(
        F.col("rule_id").cast("long").alias("rule_id"),
        "rule",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


_SQL_RECURSIVE_ASSEMBLY = """
WITH RECURSIVE chain(part_key, anc_key, hop, chain_cost_cents) AS (
  SELECT p_partkey, p_partkey, 0, CAST(round(p_retailprice * 100) AS BIGINT)
  FROM part
  UNION ALL
  SELECT c.part_key, p.p_partkey, c.hop + 1,
         c.chain_cost_cents + CAST(round(p.p_retailprice * 100) AS BIGINT)
  FROM chain c
  JOIN part p ON p.p_partkey = CAST(floor(c.anc_key / 4) AS BIGINT)
  WHERE c.anc_key > 1
)
SELECT hop AS depth,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(chain_cost_cents) AS BIGINT) AS total_chain_cost_cents,
       CAST(min(part_key) AS BIGINT) AS min_part_key,
       CAST(max(part_key) AS BIGINT) AS max_part_key
FROM chain
WHERE anc_key = 1
GROUP BY hop
ORDER BY depth
"""


@register("sql_recursive_assembly_rollup", oracle=_SQL_RECURSIVE_ASSEMBLY)
def sql_recursive_assembly_rollup(spark, sf_dir):
    """WITH RECURSIVE, run natively on BOTH engines from the SAME SQL
    text (Spark 4's recursive CTE support — ``UnionLoop`` in the
    physical plan). Every prior closure-shaped oracle in this repo is
    an unrolled-iteration replay because recursion only landed in
    Spark 4; this query is the genuinely recursive form: a
    bill-of-materials ancestor walk over the part table's synthesized
    assembly forest (parent(k) = floor(k/4), the complete-4-ary-tree
    hierarchy), accumulating integer-cents chain cost up to the root
    and rolling the terminal rows up by depth.

    Termination and scale: every key has exactly ONE parent, so the
    frontier never branches — no visited-set dedup is needed under
    UNION ALL (Spark's recursive CTE does not yet allow UNION
    distinct). Iterations = tree depth = log4(max part key): ~6 at
    sf0.01, ~13 at sf100 — far under the 100-level default cap. Work
    per iteration is ONE equi-join of the surviving frontier against
    part (broadcast/shuffle-hash by key); total intermediate volume is
    N*log4(N) rows, spread evenly across executors. The 1M-row default
    recursion row valve is too small for that volume past ~sf0.3 by
    design, not runaway — the engine default (session._RUNTIME_CONF,
    1e9 with the level limit left at 100 as the true runaway stop)
    covers it; this function mutates NO session conf (the conf is
    read at execution time, so a set/restore scope here could not
    work anyway — tests/test_plans.py pins both facts)."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_RECURSIVE_ASSEMBLY)


_SQL_LATERAL_TOP2 = """
SELECT n.n_name AS nation, t.s_name AS supplier, t.bal_cents
FROM nation n,
LATERAL (
  SELECT s.s_name, CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_cents
  FROM supplier s
  WHERE s.s_nationkey = n.n_nationkey
  ORDER BY s.s_acctbal DESC, s.s_suppkey
  LIMIT 2
) AS t
"""


@register("lateral_top2_suppliers_per_nation", oracle=_SQL_LATERAL_TOP2)
def lateral_top2_suppliers_per_nation(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT — the same
    SQL text on both engines (SQL-surface parity for the LATERAL
    join syntax, the idiom analysts reach for before learning window
    functions). Catalyst decorrelates it into a per-key row_number
    window + BroadcastHashJoin against the 25-row nation side — no
    nested-loop join (plan-gated with the rest of the suite), and
    determinism is pinned by the unique s_suppkey tiebreak.

    Scale note: Spark's decorrelation currently materializes the
    subquery's ORDER BY as a global range sort of supplier before the
    per-nation window — redundant work the window re-does. At fact
    scale prefer the registered window-top-k form
    (window_top3_orders_per_customer shape: one hash exchange, no
    range sort); this query exists to prove the LATERAL surface, over
    a dimension-bounded (10k x SF supplier) input."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL_TOP2)
