"""SparkSession factory tuned for the engine.

Local mode for tests/bench; the same configs are what we'd set on a real
cluster (AQE on, UTC session TZ, Arrow on). `shuffle_partitions` should
track cluster parallelism — on a 1000-executor cluster this would be
thousands; locally it matches core count so tiny shuffles don't fan out
into 200 near-empty tasks.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sqlstreamstore_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local-mode driver == the executor: the 1g default heap is far
        # too small for 32 concurrent task threads (OOM/GCLocker
        # failures observed under the full bench). Only takes effect
        # when THIS process launches the JVM — harmless on attach.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # testdata events.parquet stores TIMESTAMP(NANOS) which Spark
        # cannot read natively; read as long and convert explicitly
        # (sources/tables.py) — matches DuckDB's truncate-to-micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
