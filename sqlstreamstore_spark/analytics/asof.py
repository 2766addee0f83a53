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
