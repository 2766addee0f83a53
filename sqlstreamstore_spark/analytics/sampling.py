"""Deterministic sampling and splitting — a training-data pipeline's
bread and butter. `df.sample()` is seed-dependent but not content-stable
(changes with partitioning); these use a content hash of the key, so a
row's assignment is a pure function of its identity: reproducible across
runs, engines, partitionings, and incremental arrivals — the property
that makes a train/val split trustworthy.

Mechanism: bucket = first 4 hex digits of md5(key) as an integer
(uniform over 0..65535) — expressible identically in Spark and DuckDB,
so the gate hash-matches the sampled sets themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(key: Column, buckets: int = 65536) -> Column:
    """Uniform int bucket from a content hash (md5 → first 4 hex → int)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int") % buckets


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash of `key` — stable
    under reruns, repartitioning, and data growth (a row never flips)."""
    threshold = int(fraction * 65536)
    return df.filter(_hash_bucket(F.col(key)) < threshold)


def hash_split(df: DataFrame, key: str, train_fraction: float = 0.9) -> DataFrame:
    """Label every row train/val by content hash — the split column a
    pipeline materializes next to the data."""
    threshold = int(train_fraction * 65536)
    return df.withColumn(
        "split",
        F.when(_hash_bucket(F.col(key)) < threshold, F.lit("train")).otherwise(
            F.lit("val")
        ),
    )
