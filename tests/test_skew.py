"""Skew-mitigation operators produce output identical to their naive
forms (the salting only changes the physical distribution)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sqlstreamstore_spark.operators.skew import salted_join, topk_per_key_salted
from sqlstreamstore_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_salted_topk_matches_direct_window(spark):
    orders = load_table(spark, SF, "orders")
    got = (
        topk_per_key_salted(
            orders, ["o_custkey"], "o_totalprice", k=3, tiebreak_col="o_orderkey"
        )
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
        .collect()
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    expect = (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
        .collect()
    )
    assert got == expect


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, SF, "customer").select(
        F.col("c_custkey"), "c_name"
    )
    got = sorted(
        tuple(r)
        for r in salted_join(orders, customer, "o_custkey", "c_custkey", salt=8)
        .select("o_orderkey", "c_name")
        .collect()
    )
    expect = sorted(
        tuple(r)
        for r in orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "c_name")
        .collect()
    )
    assert got == expect
