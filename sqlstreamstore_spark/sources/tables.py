"""Loaders for the driver-generated testdata tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. The only
quirk: ``events.ts`` is written as parquet TIMESTAMP(NANOS,false), which
Spark cannot map to TimestampType. With
``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as a long of
epoch-nanos; we convert with integer division (``DIV 1000`` — exact,
truncating) to micros, which is bit-identical to DuckDB's behavior of
truncating TIMESTAMP_NS to its micros TIMESTAMP on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Runtime-settable SQL confs; required to read events.parquet
    # (nanosecond timestamps) on sessions not built by our session.py
    # (e.g. a driver harness's fresh SparkSession). UTC pins collected
    # datetimes to the naive-UTC wall values DuckDB reads from parquet,
    # independent of the host JVM's default zone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) surfaced as epoch-nanos long under
            # nanosAsLong (older generator output)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] with no zone (round-3 generator output):
            # NTZ wall values are naive UTC; with the session zone
            # pinned to UTC this cast is value-preserving and restores
            # plain TIMESTAMP so epoch arithmetic (cast long /
            # unix_micros) keeps working downstream.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
