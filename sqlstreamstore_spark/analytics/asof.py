"""As-of (point-in-time) join — the classic time-series operator Spark
has no native form of (DuckDB: ASOF JOIN; kdb: aj). For each left row,
match the right row with the greatest right_time <= left_time within the
same key.

Implementation is the idiomatic distributed shape — union + window,
ONE shuffle, no UDF:

    tag left/right rows, union on (key, t),
    window PARTITION BY key ORDER BY (t, is_right DESC)
      ROWS UNBOUNDED PRECEDING .. CURRENT ROW,
    last(right_value IGNORE NULLS) carries the most recent right match
    forward onto each left row; filter back to left rows.

Right rows sort BEFORE left rows at equal t, giving inclusive (<=)
semantics. The shuffle key is the join key, so skew mitigations (AQE,
salting) apply as for any keyed window. The alternative per-group
``applyInPandas`` + ``pd.merge_asof`` trades the union for Arrow batches
— only worth it when per-key data fits comfortably in a pandas frame.

Requires the right side unique on (key, time) for deterministic output
(pre-aggregate otherwise, as the registry query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_start: str,
    right_end: str,
    bucket: str = "1 week",
) -> DataFrame:
    """Interval-containment join (left.time ∈ [right.start, right.end])
    without the O(N·M) nested-loop a naive theta-join degenerates to.

    The classic bucketization: explode each right interval into the
    time buckets it overlaps, bucket each left timestamp, equi-join on
    (key, bucket) — Catalyst gets a hash join whose candidates are only
    same-bucket pairs — then verify exact containment. Bucket width
    trades replication factor (interval_len/bucket copies of each right
    row) against candidate precision; size it near the median interval
    length. ``left_key`` and ``right_key`` must be distinct column names
    (alias one side), as with any Spark self-join on shared names.
    """
    if left_key == right_key:
        raise ValueError("left_key and right_key must be distinct column names")
    bucket_secs = {
        "1 hour": 3_600,
        "1 day": 86_400,
        "1 week": 604_800,
        "30 days": 2_592_000,
    }.get(bucket)
    if bucket_secs is None:
        raise ValueError(f"unsupported bucket {bucket!r}")
    b = F.lit(bucket_secs)

    # floor, not cast-truncation: cast('long') truncates toward zero,
    # which shifts pre-1970 (negative-epoch) timestamps into the wrong
    # cell and would break the bucket-equality candidate guarantee
    l_bucket = F.floor(F.unix_timestamp(F.col(left_time)) / b).cast("long")
    r_lo = F.floor(F.unix_timestamp(F.col(right_start)) / b).cast("long")
    r_hi = F.floor(F.unix_timestamp(F.col(right_end)) / b).cast("long")

    lhs = left.withColumn("__lb", l_bucket)
    rhs = right.withColumn("__rb", F.explode(F.sequence(r_lo, r_hi)))
    return (
        lhs.join(
            rhs,
            (F.col(left_key) == F.col(right_key)) & (F.col("__lb") == F.col("__rb")),
        )
        .filter(
            (F.col(left_time) >= F.col(right_start))
            & (F.col(left_time) <= F.col(right_end))
        )
        .drop("__lb", "__rb")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_secs: int = 3_600,
) -> DataFrame:
    """Interval × interval overlap join (a ∩ b ≠ ∅ within the same key,
    inclusive ends: a_start <= b_end AND b_start <= a_end) — the
    sessions-vs-incidents primitive `range_join_bucketed` (point ∈
    interval) can't express.

    Shape: explode BOTH sides into the grid cells each interval covers,
    equi-join on (key, cell) — a plain shuffled hash join whose
    candidates are same-cell pairs — then verify the exact predicate.
    A pair sharing several cells would duplicate, so instead of a
    distinct (a second shuffle over the candidate set) each pair is
    kept only at its canonical cell, the first cell both intervals
    occupy: cell == greatest(floor(a_start/w), floor(b_start/w)).
    The only shuffle is the equi-join itself (each side hashed once on
    (key, cell)); replication factor = ceil(len/w) copies per row,
    so size ``bucket_secs`` near the median interval length. Skew on
    (key, cell) is bounded by per-key-per-window activity, and AQE's
    skew-join split applies as for any equi-join.

    Column names must be disjoint across sides (alias one side first),
    as with any Spark self-join on shared names.
    """
    if {a_key, a_start, a_end} & {b_key, b_start, b_end}:
        raise ValueError("a-side and b-side column names must be disjoint")
    w = F.lit(bucket_secs)
    # floor, not cast-truncation: cast('long') truncates toward zero, so
    # negative-epoch timestamps would shift cells by one and break the
    # canonical-cell dedup + candidate-superset guarantee
    a_lo = F.floor(F.unix_timestamp(F.col(a_start)) / w).cast("long")
    a_hi = F.floor(F.unix_timestamp(F.col(a_end)) / w).cast("long")
    b_lo = F.floor(F.unix_timestamp(F.col(b_start)) / w).cast("long")
    b_hi = F.floor(F.unix_timestamp(F.col(b_end)) / w).cast("long")

    lhs = a.withColumn("__a_lo", a_lo).withColumn(
        "__ac", F.explode(F.sequence(a_lo, a_hi))
    )
    rhs = b.withColumn("__b_lo", b_lo).withColumn(
        "__bc", F.explode(F.sequence(b_lo, b_hi))
    )
    return (
        lhs.join(
            rhs,
            (F.col(a_key) == F.col(b_key)) & (F.col("__ac") == F.col("__bc")),
        )
        # canonical-cell dedup: emit the pair exactly once, no distinct
        .filter(F.col("__ac") == F.greatest(F.col("__a_lo"), F.col("__b_lo")))
        # exact overlap check (cells only bound the candidate set)
        .filter(
            (F.col(a_start) <= F.col(b_end)) & (F.col(b_start) <= F.col(a_end))
        )
        .drop("__a_lo", "__b_lo", "__ac", "__bc")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
) -> DataFrame:
    """Left as-of join; output = all left columns + matched right_time
    (aliased ``__asof_time``) + right_values (null when no match)."""
    left_cols = left.columns
    carried = [right_time, *right_values]

    l_side = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in carried],
    )
    r_side = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_side.unionByName(r_side).select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in carried
        ],
    )
    out = filled.filter(F.col("__is_right") == 0).select(
        *left_cols,
        F.col(f"__m_{right_time}").alias("__asof_time"),
        *[F.col(f"__m_{c}").alias(c) for c in right_values],
    )
    return out
