"""Skew mitigation — the two patterns AQE can't always save you from at
100 TB: a window over a hot key (row_number sends the ENTIRE key to one
task — AQE cannot split a window partition), and a shuffle join whose
hot key overwhelms one reducer when the build side is too big to
broadcast.

Both use deterministic salts (hash of row content, not rand()) so plans
stay replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key_salted(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
    salt: int = 16,
) -> DataFrame:
    """Top-k per key that survives hot keys: phase 1 takes a local top-k
    within each of `salt` sub-partitions of the key (parallelism =
    keys × salt), phase 2 re-ranks the ≤ salt·k survivors per key —
    identical output to the direct window, but the heaviest task sees
    1/salt of the hot key instead of all of it.
    """
    def order_exprs() -> list[Column]:
        o = F.col(order_col).desc() if descending else F.col(order_col).asc()
        return [o, F.col(tiebreak_col).asc()] if tiebreak_col else [o]

    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in ([tiebreak_col] if tiebreak_col else [order_col])]),
        F.lit(salt),
    )
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(*order_exprs())
    w2 = Window.partitionBy(*key_cols).orderBy(*order_exprs())
    return (
        df.withColumn("__salt", salt_col)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .drop("__salt", "__r1")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 16,
) -> DataFrame:
    """Inner equi-join with the left side's hot keys spread across
    `salt` reducers: each left row gets one deterministic salt, the
    right side is replicated `salt` times, and the join key becomes
    (key, salt). Output identical to the plain join; reducer input for
    a hot key shrinks by `salt` at the cost of a `salt`× bigger right
    shuffle — use when the right side is too big to broadcast but far
    smaller than the skewed left.
    """
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    lhs = left.withColumn("__ls", lsalt)
    rhs = right.withColumn(
        "__rs", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long")))
    )
    return (
        lhs.join(
            rhs,
            (F.col(left_key) == F.col(right_key)) & (F.col("__ls") == F.col("__rs")),
        )
        .drop("__ls", "__rs")
    )
