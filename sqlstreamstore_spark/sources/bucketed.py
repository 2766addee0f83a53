"""Bucketed-table layout for exchange-free co-located joins.

The 100 TB technique Catalyst cannot invent on its own: persist both
sides of a recurring equi-join bucketed (and sorted) on the join key
with the SAME bucket count, and every subsequent join aligns bucket-
for-bucket — a SortMergeJoin with NO shuffle exchange on either side.
The reference delegates this class of physical design to its RDBMS
indexes (SURVEY.md §4 covering-index row); in Spark it's a write-time
layout decision (`bucketBy` + `saveAsTable`), amortized across every
downstream join on that key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EP = "decimal(12,2)"
_RATE = "decimal(4,2)"


def build_bucketed_pair(
    spark: SparkSession,
    lineitem: DataFrame,
    orders: DataFrame,
    base_path: str,
    n_buckets: int = 8,
    suffix: str = "",
) -> tuple[str, str]:
    """Persist lineitem/orders as external parquet tables bucketed +
    sorted on the order key (projected to the join-relevant columns —
    at scale you'd bucket the full tables). Idempotent per table name."""
    lt, ot = f"sss_bucketed_lineitem_{suffix}", f"sss_bucketed_orders_{suffix}"
    if not spark.catalog.tableExists(lt):
        (
            lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
            .write.bucketBy(n_buckets, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", f"{base_path}/lineitem")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(lt)
        )
    if not spark.catalog.tableExists(ot):
        (
            orders.select("o_orderkey", "o_orderpriority")
            .write.bucketBy(n_buckets, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", f"{base_path}/orders")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(ot)
        )
    return lt, ot


def bucketed_join_revenue(spark: SparkSession, lt: str, ot: str) -> DataFrame:
    """Revenue per order priority over the bucketed pair. With matching
    bucket counts on the join key, the plan reads both tables' buckets
    pairwise: no Exchange feeds the join (pinned by tests/test_plans).
    Results are byte-identical to the unbucketed join — bucketing is
    pure physical layout."""
    li, o = spark.table(lt), spark.table(ot)
    revenue = F.col("l_extendedprice").cast(_EP) * (
        F.lit(1).cast(_RATE) - F.col("l_discount").cast(_RATE)
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("o_orderpriority")
    )
