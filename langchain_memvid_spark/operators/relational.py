"""Relational operator coverage over the TPC-H-ish star schema.

The reference has no SQL surface; these queries supply the relational
breadth the engine needs as an analytics platform (SURVEY.md §7 slice
5): multi-way joins (broadcast dims, shuffled fact joins), aggregation
with partial/map-side combine, rollup, window ranking and running
frames, semi/anti joins, set ops, scalar string/date/math functions,
JSON extraction, and sessionization.

Cross-engine determinism discipline (results must hash-match DuckDB):
  - double sums go through CAST(round(x, s) AS DECIMAL(18,s)) so the
    aggregate is exact integer arithmetic, then CAST back to DOUBLE;
  - every LIMIT has a total-order tie-break;
  - timestamps are emitted as formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dec(c: F.Column | str, scale: int = 2) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col, scale).cast(f"decimal(18,{scale})")


def _ts(c: F.Column | str) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "2001-06-30") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates. Predicate
    pushes to the parquet scan; partial aggregation makes the shuffle
    6 rows per partition regardless of corpus size."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(_dec(disc_price, 4)).alias("sum_disc_price"),
            F.sum(_dec(charge, 6)).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sum_qty").cast("double").alias("sum_qty"),
            F.col("sum_base_price").cast("double").alias("sum_base_price"),
            F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
            F.col("sum_charge").cast("double").alias("sum_charge"),
            F.round(F.col("sum_qty").cast("double") / F.col("count_order"), 4).alias("avg_qty"),
            F.round(F.col("sum_base_price").cast("double") / F.col("count_order"), 4).alias("avg_price"),
            F.col("count_order"),
        )
    )


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, cutoff: str = "1998-06-30"
) -> DataFrame:
    """TPC-H Q3 shape: broadcast the filtered customer dim into orders,
    shuffle-join lineitem on orderkey, top-10 by revenue."""
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    joined = (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    agg = (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("__rev"))
        .select(
            "l_orderkey",
            F.col("__rev").cast("double").alias("revenue"),
            _ts("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


def q5_regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: snowflake join — tiny dims broadcast all the way
    down, the single shuffled join is orders⋈lineitem on orderkey."""
    dims = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == region_name)), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("__rev"), F.count("*").alias("n_items"))
        .select("n_name", F.col("__rev").cast("double").alias("revenue"), "n_items")
    )


def top_customers_per_nation(customer: DataFrame, nation: DataFrame, k: int = 3) -> DataFrame:
    """Window ranking: top-k customers by acctbal within each nation."""
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("n_name", "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "rank")
    )


def orders_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP(status, priority): hierarchical subtotals + grand total."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.sum(_dec("o_totalprice")).alias("__tp"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            F.col("__tp").cast("double").alias("total_price"),
        )
    )


def running_revenue(orders: DataFrame) -> DataFrame:
    """Running per-customer revenue: window frame ROWS UNBOUNDED
    PRECEDING over (orderdate, orderkey) total order."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _ts("o_orderdate").alias("o_orderdate"),
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join: customers that never ordered."""
    return customer.join(
        orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))


def urgent_building_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set op: custkeys with URGENT orders ∩ BUILDING-segment custkeys."""
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return urgent.intersect(building)


def scalar_showcase(orders: DataFrame) -> DataFrame:
    """Scalar function coverage: string, date, math — all JVM built-ins."""
    return orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.upper(F.col("o_orderstatus")).alias("status_upper"),
        F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
        F.length(F.col("o_orderpriority")).alias("prio_len"),
        F.concat_ws("|", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_prio"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        _ts(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus_30d"),
        F.round(F.sqrt(F.abs(F.col("o_totalprice"))), 4).alias("sqrt_price"),
        F.round(F.log(F.col("o_totalprice") + 1), 4).alias("ln_price"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("price_k"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("X")), F.lit("?")).alias("status_nn"),
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling-window (batch form) hourly aggregate per event type —
    the batch twin of the Structured Streaming tumbling window."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("__h"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).alias("__sv"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            _ts("__h").alias("hour"),
            "event_type",
            "n_events",
            F.col("__sv").cast("double").alias("sum_value"),
            "n_users",
        )
    )


def events_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization (gaps-and-islands): new session when the gap since
    the previous event of the same user exceeds `gap_minutes`. lag +
    running sum of boundary flags — one shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = events.withColumn(
        "__new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        _ts(F.min("ts")).alias("session_start"),
        _ts(F.max("ts")).alias("session_end"),
        F.sum(_dec("value")).cast("double").alias("session_value"),
    )


def events_json_stats(events: DataFrame) -> DataFrame:
    """JSON extraction from the props column + grouped stats."""
    # try_cast: malformed props must not-match rather than throw under
    # ANSI mode (Spark 4 default); identical to cast on well-formed rows
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_big_k"),
        )
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: tight-range scan-filter + single agg. All three
    predicates push to parquet row-group pruning."""
    rev = _dec(F.col("l_extendedprice") * F.col("l_discount"), 4)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).alias("__r"), F.count("*").alias("n_items"))
        .select(F.col("__r").cast("double").alias("revenue"), "n_items")
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    agg = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("__rev"), F.count("*").alias("n_items"))
        .select(
            "c_custkey", "c_name", "n_name",
            F.col("__rev").cast("double").alias("revenue"), "n_items",
        )
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


def q7_nation_volume(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation × customer-nation trade volume
    per year. Two broadcast nation joins under one shuffled fact join."""
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(vol).alias("__v"), F.count("*").alias("n_items"))
        .select(
            "supp_nation", "cust_nation", "l_year",
            F.col("__v").cast("double").alias("volume"), "n_items",
        )
    )


def orders_cube(orders: DataFrame) -> DataFrame:
    """CUBE(status, priority): all grouping-set combinations."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
        )
    )


def customer_quartiles(customer: DataFrame) -> DataFrame:
    """ntile + percent_rank + cume_dist over account balance.

    A direct ``Window.orderBy`` with no partitionBy is an
    ``Exchange SinglePartition`` — the whole table through one task.
    Instead: scale-safe global row_number (range partition + broadcast
    offsets, operators/scale_windows.py) and closed-form rank stats —
    valid because (c_acctbal, c_custkey) is a tie-free total order.
    """
    from langchain_memvid_spark.operators.scale_windows import (
        global_row_number,
        rank_stats,
    )

    ranked, n = global_row_number(
        customer, [F.col("c_acctbal").asc(), F.col("c_custkey").asc()], "__rn"
    )
    ntile, pct_rank, cume = rank_stats(F.col("__rn"), n, 4)
    return ranked.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        ntile.alias("quartile"),
        F.round(pct_rank, 6).alias("pct_rank"),
        F.round(cume, 6).alias("cume"),
    )


def order_gaps(orders: DataFrame) -> DataFrame:
    """lead/lag: days since each customer's previous order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _ts("o_orderdate").alias("o_orderdate"),
        F.when(prev.isNull(), F.lit(None)).otherwise(
            F.datediff(F.col("o_orderdate"), prev)
        ).cast("int").alias("days_since_prev"),
    )


def monthly_order_stats(orders: DataFrame) -> DataFrame:
    """Date bucketing: per-month order stats."""
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def part_type_stats(part: DataFrame) -> DataFrame:
    """String predicates + split over the part dimension."""
    return (
        part.withColumn("type_head", F.split(F.col("p_type"), " ").getItem(0))
        .withColumn("is_brand1", F.col("p_brand").like("Brand#1%").cast("int"))
        .groupBy("type_head")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("is_brand1").cast("long").alias("n_brand1"),
            # decimal-sum/count, not avg(): float summation order is
            # engine-dependent; exact decimal arithmetic is not
            F.round(F.sum(_dec("p_retailprice")).cast("double") / F.count("*"), 4).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot event types to columns per day (conditional aggregation —
    identical semantics to groupBy().pivot() but portable)."""
    day = F.date_format("ts", "yyyy-MM-dd")
    out = events.groupBy(day.alias("day"))
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long").alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return out.agg(*aggs)


def above_avg_customers(customer: DataFrame) -> DataFrame:
    """Scalar-subquery filter: customers above the mean balance.
    The mean is computed with exact decimal arithmetic so the filter
    boundary is bit-identical across engines."""
    avg_bal = customer.agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("a")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


def doc_length_histogram(documents: DataFrame, bucket: int = 50) -> DataFrame:
    """Histogram of document lengths (width_bucket style)."""
    b = (F.floor(F.col("n_chars") / bucket) * bucket).cast("long")
    return (
        documents.groupBy(b.alias("bucket_lo"))
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
    )


def q4_late_shipment_priority(orders: DataFrame, lineitem: DataFrame, days: int = 90) -> DataFrame:
    """TPC-H Q4 shape (adapted: no l_commitdate in this schema — "late"
    means shipped > `days` after the order date): priority counts over
    orders with EXISTS a late lineitem. The EXISTS is a left-semi join
    with a non-equi residual; the equi part (orderkey) still drives a
    shuffled hash join, so no cross product materializes."""
    late = lineitem.select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {days} DAYS")
    )
    return (
        orders.join(late, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q12_priority_by_returnflag(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape (adapted: l_returnflag stands in for the absent
    l_shipmode): per returnflag, how many lineitems belong to
    high-priority vs low-priority orders. Conditional aggregation —
    the CASE folds into the partial agg, one shuffle total."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.select("l_orderkey", "l_returnflag")
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q14_promo_revenue_share(lineitem: DataFrame, part: DataFrame, ptype: str = "ECONOMY") -> DataFrame:
    """TPC-H Q14 shape: percent of revenue from one part type. The part
    dim broadcasts (it is orders/10 rows); the ratio is computed from
    DECIMAL partial sums so it hash-matches the oracle."""
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    joined = lineitem.join(
        part.select("p_partkey", "p_type"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == ptype, rev).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_share_pct")
    )


def q15_top_suppliers(supplier: DataFrame, lineitem: DataFrame, k: int = 5) -> DataFrame:
    """TPC-H Q15 shape: revenue per supplier, top-k. Partial-agg shuffle
    to supplier grain (tiny), then broadcast the supplier dim onto it."""
    rev = (
        lineitem.groupBy("l_suppkey")
        .agg(F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)).alias("rev"))
    )
    return (
        rev.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("rev").cast("double").alias("total_revenue"))
        .orderBy(F.col("total_revenue").desc(), F.col("s_suppkey").asc())
        .limit(k)
    )


def q18_large_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                     threshold: int = 300) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with customer detail. The HAVING runs at lineitem grain first so
    only qualifying orderkeys (a few hundred) reach the join — the
    joins then broadcast that tiny set against orders/customer."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > threshold)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            _ts("o_orderdate").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


def q22_idle_rich_customers(
    customer: DataFrame, orders: DataFrame, big_order: float = 300000.0
) -> DataFrame:
    """TPC-H Q22 shape: customers richer than the positive-balance
    average who never placed a large order, counted per nation. The
    scalar average is a one-row broadcast (cross join); the NOT EXISTS
    is an anti join whose probe side is pre-filtered to big orders —
    the filter shrinks the build set before the shuffle."""
    # decimal-sum/count, not F.avg: float partial-agg summation order
    # differs between engines, and a mean within 1 ulp of a rounding
    # boundary would flip the filter for customers in the gap
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.round(
            F.sum(_dec("c_acctbal")).cast("double") / F.count("*"), 4
        ).alias("avg_bal")
    )
    big = orders.filter(F.col("o_totalprice") > big_order).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


def q8_market_share(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    orders: DataFrame, lineitem: DataFrame,
                    r_name: str = "ASIA", share_nation: str = "NATION_8") -> DataFrame:
    """TPC-H Q8 shape (adapted: share of the customer's nation, since
    this schema has no supplier nation on lineitem): within one
    region's revenue, the yearly share contributed by one nation.
    Dims broadcast down the snowflake; one shuffle to year grain."""
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    dims = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == r_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    return (
        lineitem.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == share_nation, rev)
                      .otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                               brand: str = "Brand#1") -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is under
    20% of their part's average quantity. The per-part average is a
    window over the part key — no self-join; the average is computed
    from DECIMAL sums and rounded so the filter boundary is
    deterministic across engines."""
    w = Window.partitionBy("l_partkey")
    avg_qty = F.round(
        F.sum(_dec("l_quantity")).over(w).cast("double") / F.count("*").over(w), 4
    )
    return (
        lineitem.join(part.filter(F.col("p_brand") == brand).select("p_partkey"),
                      F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("small_qty_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def orders_grouping_sets(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS (status), (priority), () — finer control
    than rollup/cube: three aggregate grains in ONE pass over the fact
    (Spark expands the sets map-side; a single shuffle)."""
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        )
    )


def q9_product_profit(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    keyword: str = "red",
) -> DataFrame:
    """TPC-H Q9 shape (adapted: the testdata has no partsupp, so
    p_retailprice·quantity·0.1 stands in for ps_supplycost): profit by
    supplier nation and order year over the keyword-matched parts.
    Plan: the filtered part dim and supplier→nation dims broadcast; the
    one shuffled join is lineitem⋈orders on orderkey; profit
    accumulates in DECIMAL before the final double cast."""
    p = part.filter(F.col("p_name").contains(keyword)).select("p_partkey", "p_retailprice")
    s = supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "n_name"
    )
    amount = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1,
        4,
    )
    return (
        lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("profit"), F.count("*").alias("n_lines"))
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts INCLUDING
    zero — a left outer join with the filter in the JOIN CONDITION (an
    ON-clause predicate on the right side must not eliminate unmatched
    customers; pushing it to a WHERE would). Two aggregations: count
    per customer, then histogram over counts."""
    j = customer.select("c_custkey").join(
        orders.filter(F.col("o_orderpriority") != "1-URGENT").select("o_custkey", "o_orderkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left",
    )
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_customers"))


def q16_supplier_counts(
    part: DataFrame,
    lineitem: DataFrame,
    excluded_brand: str = "Brand#5",
    sizes: tuple[int, ...] = (1, 4, 9, 16, 25, 36, 49),
) -> DataFrame:
    """TPC-H Q16 shape (adapted: lineitem is the part↔supplier bridge
    since the testdata has no partsupp): distinct suppliers per
    (brand, type, size) over a size IN-list with a brand exclusion.
    COUNT(DISTINCT) expands to a two-phase agg; the part dim filter
    pushes to the scan."""
    p = part.filter(
        (F.col("p_brand") != excluded_brand) & F.col("p_size").isin(list(sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_excess_shipments(
    supplier: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    keyword: str = "blue",
    year: int = 1997,
    min_qty: float = 50.0,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose shipped quantity of the
    keyword-matched parts within one year exceeds a threshold — an
    aggregate-then-semi-join chain (IN over a GROUP BY ... HAVING
    subquery). The part filter broadcasts into the lineitem scan; the
    supplier table is probed with a left-semi join, never duplicated."""
    p = part.filter(F.col("p_name").contains(keyword)).select("p_partkey")
    heavy = (
        lineitem.filter(F.year("l_shipdate") == year)
        .join(p, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("__q"))
        .filter(F.col("__q").cast("double") > min_qty)
        .select("l_suppkey")
    )
    return (
        supplier.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    size: int = 15,
    type_suffix: str = "BRASS",
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape (adapted: lineitem is the part↔supplier supply
    relation since the testdata has no partsupp; supply cost per
    (part, supplier) = MIN(l_extendedprice)): for each qualifying part,
    the supplier(s) in one region offering the minimum cost — the
    correlated MIN subquery de-correlated into one per-part window MIN
    over the already-region-filtered supply table, so the corpus-sized
    lineitem is scanned ONCE.  Only the CONSTANT dims (nation, region)
    carry broadcast hints; the SF-scaled part and supplier sides are
    left to Catalyst/AQE, which broadcasts them while they fit and
    shuffles when a 100 TB SF outgrows the hint — the blanket-hint OOM
    class this repo's history forbids.
    Completes the 22-query TPC-H suite (reference has no relational
    surface; this is the engine's analytics layer)."""
    eligible_parts = part.filter(
        (F.col("p_size") == size) & F.col("p_type").endswith(type_suffix)
    ).select("p_partkey", "p_brand", "p_type")
    region_suppliers = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    supply = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(eligible_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(region_suppliers, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "p_type", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(_dec("l_extendedprice")).alias("supply_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        supply.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(limit)
    )


def q11_important_stock(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_8",
    mean_num: int = 3,
    mean_den: int = 2,
) -> DataFrame:
    """TPC-H Q11 shape (adapted: per-part stock value =
    SUM(l_extendedprice) over lineitems supplied from one nation):
    parts whose value exceeds ``mean_num/mean_den`` × the national MEAN
    part value.  The published Q11 compares against a fraction of the
    total that the spec itself rescales per SF; the mean-multiple form
    is the same scalar-subquery shape but scale-invariant, so one
    constant works from sf0.001 to 100 TB.  The scalar subquery becomes
    a broadcast cross join of the ONE-ROW grand total against the
    per-part aggregate (both reduce before any data moves — no
    SinglePartition window), and the threshold compares exact decimals
    (value · den · n_parts > total · num), so the boundary can't flip
    between engines."""
    nat_suppliers = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    # nat_suppliers scales with SF (suppliers/25): no forced broadcast —
    # AQE picks broadcast while it fits, shuffle semi-join beyond
    supply = lineitem.select("l_partkey", "l_suppkey", "l_extendedprice").join(
        nat_suppliers, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    per_part = supply.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).alias("part_value")
    )
    # per_part feeds BOTH the grand-total build and the filter side;
    # the branches prune differently so ReuseExchange never fires and
    # the lineitem semi-join + aggregation subtree ran TWICE (r14 plan
    # audit: 6 scans, 0 ReusedExchange). Checkpoint the POST-reduction
    # frame (one short row per part — lineitem/|parts|-fold smaller
    # than its input) so the expensive pass runs once; same remedy as
    # unigram_logprob_scores' LM table. A global window would need
    # SinglePartition over every part row — worse, see docstring.
    per_part = per_part.localCheckpoint(eager=True)
    total = per_part.agg(
        F.sum("part_value").alias("total_value"), F.count("*").alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value") * mean_den * F.col("n_parts")
            > F.col("total_value") * mean_num
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("stock_value"),
        )
        .orderBy(F.col("stock_value").desc(), "p_partkey")
    )
