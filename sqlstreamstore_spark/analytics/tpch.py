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
