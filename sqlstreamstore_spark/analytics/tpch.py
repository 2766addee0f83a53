"""TPC-H-shape relational queries over the driver fixtures (FIXTURES.md §B).

These exercise the classic relational operator set the reference delegates
to its RDBMS (SURVEY.md §2.5): filter, broadcast/hash join, partial hash
aggregation, window top-k, rollup, sort+limit. Catalyst picks broadcast
joins for the small dims automatically (region/nation/supplier/customer
are tiny next to lineitem at any sf); at 100 TB the lineitem side streams
through partial aggregation without ever collecting.

Exactness strategy for the DuckDB oracle: money arithmetic is cast to
DECIMAL before multiplying/summing (exact, associative — immune to
float summation-order differences between engines), and only the final
aggregate is cast back to DOUBLE. Averages are computed as
double(sum_decimal) / double(count) so both engines perform the same
single float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Decimal shapes: extendedprice < 1e8 → DECIMAL(12,2); rates < 10 → DECIMAL(4,2).
_EP = "decimal(12,2)"
_RATE = "decimal(4,2)"


def _dec(col: str, t: str):
    return F.col(col).cast(t)


def q1_pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1: pricing summary report.

    Oracle SQL twin in registry.py (same aliases).
    """
    disc_price = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    charge = disc_price * (F.lit(1).cast(_RATE) + _dec("l_tax", _RATE))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity", _EP)).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice", _EP)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity", _EP)).cast("double") / F.count("*").cast("double")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice", _EP)).cast("double") / F.count("*").cast("double")).alias("avg_price"),
            (F.sum(_dec("l_discount", _RATE)).cast("double") / F.count("*").cast("double")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    topk: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: revenue of unshipped orders for one segment.

    customer is broadcast (tiny); orders⋈lineitem shuffles on the join
    key — the natural co-partitioning for the group-by that follows.
    """
    revenue = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    cut = F.lit(cutoff).cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cut)
        .join(orders.filter(F.col("o_orderdate") < cut), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(topk)
    )


def q5_local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    the nation. 6-way join; all dims broadcast, fact table streams."""
    revenue = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    nations = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo: float = 0.03,
    disc_hi: float = 0.07,
    qty_max: float = 24.0,
) -> DataFrame:
    """TPC-H Q6: single filtered aggregate — pure scan + partial agg;
    predicates and the 4-column projection push to the parquet reader."""
    revenue = _dec("l_extendedprice", _EP) * _dec("l_discount", _RATE)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
            & (_dec("l_discount", _RATE) >= F.lit(disc_lo).cast(_RATE))
            & (_dec("l_discount", _RATE) <= F.lit(disc_hi).cast(_RATE))
            & (F.col("l_quantity") < qty_max)
        )
        .agg(F.coalesce(F.sum(revenue).cast("double"), F.lit(0.0)).alias("revenue"))
    )


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    topk: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, by customer."""
    revenue = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(topk)
    )


def order_priority_with_lineitems(
    orders: DataFrame, lineitem: DataFrame, qty_min: float = 45.0
) -> DataFrame:
    """TPC-H Q4 shape (adapted to available columns): count orders per
    priority having at least one big-quantity lineitem — a left-semi
    join (EXISTS), which Spark executes without materializing the
    probe side's payload."""
    big = lineitem.filter(F.col("l_quantity") >= qty_min).select("l_orderkey")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: shipped volume between two nations by year, both
    directions. The two nation dims broadcast under different aliases;
    the symmetric-pair predicate is applied post-join (4 rows × 4 rows —
    trivial), so the big fact join remains a pure equi-join."""
    volume = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)
    ) | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(volume).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_1",
    region_name: str = "EUROPE",
    p_type: str = "PROMO",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8 shape: the target nation's share of volume sold into one
    region's market for one part type, by order year. Conditional-sum
    ratio; every dim broadcasts, lineitem streams once."""
    volume = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    cust_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == p_type)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == target_nation, volume).otherwise(F.lit(0).cast(_EP))).cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q14_promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    p_type: str = "PROMO",
    date_lo: str = "1996-09-01",
    date_hi: str = "1996-10-01",
) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promo parts —
    conditional aggregation over a single broadcast join."""
    volume = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == p_type, volume).otherwise(F.lit(0).cast(_EP))).cast("double")
                / F.sum(volume).cast("double")
            ).alias("promo_revenue")
        )
    )


def q15_top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The revenue view aggregates once; the scalar max broadcasts back —
    Spark's shape of `WHERE total_revenue = (SELECT max(...))`."""
    revenue = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q18_large_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: float = 300.0,
    topk: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape: customers with orders whose total quantity
    exceeds a threshold. The HAVING subquery becomes an aggregate →
    semi-join back onto the fact — only qualifying orderkeys flow into
    the final join."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity", _EP)).alias("__q"))
        .filter(F.col("__q") > F.lit(qty_threshold).cast(_EP))
        .select("l_orderkey")
    )
    per_order = lineitem.join(big, "l_orderkey", "left_semi")
    return (
        per_order.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity", _EP)).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey"))
        .limit(topk)
    )


def q9_profit_by_nation_year(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table in the fixtures, so
    profit = discounted revenue): revenue by supplier nation and order
    year. Dims broadcast; the orders join shuffles on orderkey."""
    amount = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count
    (excluding urgent orders standing in for the comment filter).
    Left join so zero-order customers land in the c_count=0 bucket."""
    o = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#13"
) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue lost if small-quantity orders for
    one brand's parts went unfilled. The correlated scalar subquery
    (0.2 × per-part avg quantity) becomes a per-part aggregate joined
    back — the decorrelated plan every optimizer wants anyway."""
    brand_parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    thresholds = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(_dec("l_quantity", _EP)).cast("double")
                / F.count("*").cast("double")
            )
        ).alias("qty_threshold")
    ).select(F.col("l_partkey").alias("t_partkey"), "qty_threshold")
    return (
        li.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_dec("l_extendedprice", _EP)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape (adapted: no shipmode/shipinstruct columns):
    disjunctive brand/size/quantity predicates — one OR-of-ANDs filter
    over a single broadcast join, the shape that exercises predicate
    simplification."""
    revenue = _dec("l_extendedprice", _EP) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    joined = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        F.coalesce(F.sum(revenue).cast("double"), F.lit(0.0)).alias("revenue")
    )


def rollup_returns(lineitem: DataFrame) -> DataFrame:
    """ROLLUP aggregate over (returnflag, linestatus) — grouping-sets
    coverage (reference has none; Spark gives it natively)."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity", _EP)).cast("double").alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


def top_orders_per_customer(orders: DataFrame, topk: int = 3) -> DataFrame:
    """Top-K per group via a partitioned window — distributed (partition
    by customer), never a global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    )


def q2_min_cost_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    p_type: str = "PROMO",
    region_name: str = "EUROPE",
    topk: int = 50,
) -> DataFrame:
    """TPC-H Q2 shape (adapted: lineitem is the part↔supplier bridge —
    the fixture has no partsupp): for each part of one type, the
    supplier(s) in one region offering the minimal unit cost.

    The correlated MIN subquery decorrelates into a per-part aggregate
    joined back on equality — both sides of the cost equality are
    double(sum_decimal)/double(sum_decimal), so the equality is exact
    and engine-independent. Dims broadcast; the only shuffle is the
    per-(part,supplier) partial aggregate over the fact table.
    """
    region_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = supplier.join(
        F.broadcast(region_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    parts = part.filter(F.col("p_type") == p_type).select("p_partkey")
    costs = (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            (
                F.sum(_dec("l_extendedprice", _EP)).cast("double")
                / F.sum(_dec("l_quantity", _EP)).cast("double")
            ).alias("unit_cost")
        )
    )
    min_costs = costs.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        costs.join(
            F.broadcast(min_costs),
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "min_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(topk)
    )


def q12_priority_split(
    lineitem: DataFrame,
    orders: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shape (adapted: l_returnflag stands in for the missing
    l_shipmode): per returnflag, how many lineitems belong to
    high-priority vs low-priority orders. The CASE-sums are map-side
    partial aggregates; orders⋈lineitem shuffles once on the order key.
    """
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q16_supplier_count(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    excluded_brand: str = "Brand#13",
) -> DataFrame:
    """TPC-H Q16 shape (lineitem as the part↔supplier bridge): distinct
    supplier count per (brand, type, size), excluding one brand and any
    supplier with a negative balance (the "complaints" NOT IN subquery).

    The NOT IN over a tiny supplier set is a broadcast anti-join;
    count(DISTINCT) shuffles once on the grouping key with partial
    distinct aggregation map-side.
    """
    bad_suppliers = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_brand") != excluded_brand)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q21_waiting_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1",
    topk: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape (adapted: the fixture has no commit/receipt dates,
    so "kept the order waiting" = sole latest shipper): suppliers from
    one nation who, in a finished multi-supplier order, were the only
    supplier shipping on the order's last ship date.

    Q21's correlated EXISTS / NOT EXISTS pair decorrelates into one
    per-(order, supplier) aggregate plus one per-order aggregate —
    two shuffles on the order key, no correlated re-scans, which is the
    only shape that survives at 100 TB.
    """
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    per_supp = (
        lineitem.join(F.broadcast(finished), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("o_key")).agg(
        F.max("supp_last").alias("order_last"),
        F.count("*").alias("n_suppliers"),
    )
    waiting = (
        per_supp.join(per_order, F.col("l_orderkey") == F.col("o_key"))
        .withColumn(
            "n_at_last",
            F.sum(
                F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)
            ).over(Window.partitionBy("l_orderkey")),
        )
        .filter(
            (F.col("supp_last") == F.col("order_last"))
            & (F.col("n_suppliers") >= 2)
            & (F.col("n_at_last") == 1)
        )
    )
    nat_suppliers = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(nat_suppliers), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(topk)
    )


def q22_global_sales(
    customer: DataFrame, orders: DataFrame, priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q22 shape (c_nationkey stands in for the phone country
    code): per nation, the count and total balance of above-average-
    balance customers who never placed an urgent order (the fixture has
    an order for every customer, so the unqualified NOT EXISTS would be
    vacuously empty).

    The scalar AVG subquery is computed once and broadcast; the NOT
    EXISTS is a left anti-join on the customer key (shuffle- or
    broadcast-hash depending on the orders side's size after
    deduplication — at 100 TB the distinct custkeys of orders are still
    far smaller than the raw fact table).
    """
    pos_avg = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == priority)
            .select("o_custkey")
            .distinct(),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(_dec("c_acctbal", _EP)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q11_important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1",
    fraction: str = "0.001",
) -> DataFrame:
    """TPC-H Q11 shape (adapted: lineitem stands in for the missing
    partsupp): per-part sales value through suppliers of one nation,
    keeping only parts whose value exceeds ``fraction`` of the nation's
    total (Q11's HAVING > scalar-subquery over the same aggregate).

    The scalar total is a single-row aggregate broadcast into the
    HAVING filter — no correlated re-scan; the only shuffle is the
    per-part partial aggregate over the fact table. Value and threshold
    stay DECIMAL until the final projection, so the > comparison is
    exact and engine-independent.
    """
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    values = (
        lineitem.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice", _EP)).alias("value_dec"))
    )
    total = values.agg(F.sum("value_dec").alias("total_dec"))
    return (
        values.join(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("total_dec") * F.lit(fraction).cast("decimal(6,4)"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


def q20_dominant_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
    p_type: str = "PROMO",
    nation_name: str = "NATION_1",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp/availqty, so "excess
    stock" becomes shipment dominance): suppliers from one nation who,
    for some part of one type, shipped more than half that part's total
    quantity in the window.

    Q20's doubly-nested correlated subquery (availqty > 0.5 * shipped)
    decorrelates into a per-(part, supplier) aggregate joined to a
    per-part aggregate — two shuffles on the part key, then a broadcast
    semi-join to the nation's suppliers. DISTINCT replaces the EXISTS.
    Quantities stay DECIMAL so the dominance comparison is exact.
    """
    promo_parts = part.filter(F.col("p_type") == p_type).select("p_partkey")
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity", _EP)).alias("supp_qty"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        shipped.join(totals, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("supp_qty") > F.col("part_qty") * F.lit("0.5").cast("decimal(2,1)"))
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name")
        .distinct()
        .orderBy("s_name")
    )


def order_gap_stats(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-market-segment statistics of the day gaps between a
    customer's consecutive orders — LAG over a per-customer window
    (partitioned, so the window never funnels into one task), then a
    plain aggregate.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .withColumn("gap_days", F.datediff("o_orderdate", "prev_date"))
    )
    return (
        gaps.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            (F.sum("gap_days").cast("double") / F.count("*").cast("double")).alias(
                "avg_gap_days"
            ),
            F.max("gap_days").cast("long").alias("max_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


def ntile_deciles(orders: DataFrame) -> DataFrame:
    """NTILE(10) over order value — deciles are computed on a global
    ordering, so this is intentionally the oracle-scale variant; the
    100 TB path for equi-depth buckets is approx_percentile boundaries
    + a broadcast range lookup (see stats_quantiles / approx sketches).
    The (o_totalprice, o_orderkey) tiebreak makes tile assignment
    deterministic across engines.
    """
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.sum(_dec("o_totalprice", _EP)).cast("double").alias("sum_price"),
        )
        .orderBy("decile")
    )


def ntile_deciles_approx(orders: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """Production-scale equi-depth deciles — the 100 TB twin of
    ``ntile_deciles``. NTILE needs a GLOBAL ordering (a single-partition
    window: the ``WindowExec: No Partition Defined`` warning, a
    guaranteed OOM at scale). The scale shape is two passes, neither of
    which sorts globally:

      1. decile BOUNDARIES from ``approx_percentile`` (GK sketch,
         partial-aggregable, bounded memory — one 9-double row);
      2. broadcast the boundary row and assign each order its bucket
         with a pure expression (count of boundaries below the price),
         then an ordinary partial-aggregable groupBy.

    No WindowExec in the plan at all (pinned in tests/test_plans.py).
    Bucket sizes are approximately N/10 (rank error <= N/accuracy);
    the exact-NTILE variant stays alongside as the oracle-scale twin.

    ``accuracy``: GK rank error is <= N/accuracy. When accuracy >= N
    the sketch keeps every sample exactly (compression merges need
    g_i + g_j + delta <= 2*eps*N < 2, impossible with g >= 1), and
    query(q) returns exactly the value at sorted rank ceil(q*N) — so a
    rank-exact accuracy makes the whole query DuckDB-oracle-able
    (r4 verdict #2) while keeping the identical bounded-state plan.
    The production default stays 10_000.
    """
    acc = accuracy  # rank error <= N / accuracy
    price = F.col("o_totalprice").cast("double")
    bounds = orders.agg(
        F.percentile_approx(
            price, F.array([F.lit(i / 10.0) for i in range(1, 10)]), F.lit(acc)
        ).alias("bounds")
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .withColumn(
            "decile",
            (
                F.lit(1)
                + F.size(
                    F.filter("bounds", lambda b: price > b)
                )
            ).cast("int"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.sum(_dec("o_totalprice", _EP)).cast("double").alias("sum_price"),
        )
        .orderBy("decile")
    )


def corr_regr_stats(lineitem: DataFrame) -> DataFrame:
    """Bivariate statistics per return flag: Pearson correlation,
    sample covariance, and the least-squares fit of extendedprice on
    quantity. All are single-pass partial-aggregable moments (Spark and
    DuckDB both use co-moment accumulation); results are rounded on BOTH
    engines so the hash compare tolerates last-bit float divergence from
    different partial-aggregation orders.
    """
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.corr(q, p), 6).alias("corr_qty_price"),
            F.round(F.covar_samp(q, p), 2).alias("covar_qty_price"),
            F.round(F.regr_slope(p, q), 4).alias("slope"),
            F.round(F.regr_intercept(p, q), 2).alias("intercept"),
            F.count("*").cast("long").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )
