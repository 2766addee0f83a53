"""Data-quality operators — the profiling/validation surface a
pipeline runs before trusting a table (dbt-test / Deequ shapes,
Spark-native and DuckDB-oracled).

Scale design: column profiling is ONE scan — every per-column aggregate
(null count, distinct count) computes in a single `agg` pass with
map-side partials, then pivots to long form with `stack` (a driver-side
literal reshape of one row, no shuffle). Referential and uniqueness
checks are anti-join / groupBy counts on the key columns only. All
outputs are exact integers — bit-identical in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column null and distinct counts in ONE table scan: a single
    wide `agg` (2 aggregates per column, partials map-side) whose one
    output row is unpivoted with `stack` into (col_name, n_nulls,
    n_distinct) rows. countDistinct excludes nulls in both engines."""
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__d_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `__n_{c}`, `__d_{c}`" for c in cols)
    return (
        wide.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)"
        )
        .select(
            "col_name",
            F.col("n_nulls").cast("bigint").alias("n_nulls"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
        )
        .orderBy("col_name")
    )


def referential_orphans(
    checks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key validation: for each (name, fact, fk, dim, pk) check,
    the count of fact rows whose NON-NULL key has no match in the
    dimension — a broadcast/hash LEFT ANTI join on the key columns only
    (the fact's payload never shuffles), one row per check. NULL keys
    are excluded (the dbt relationship-test convention: a missing fk is
    a not-null violation, not a referential one)."""
    parts = []
    for name, fact, fk, dim, pk in checks:
        orphans = (
            fact.select(F.col(fk).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(dim.select(F.col(pk).alias("__k")).distinct(), "__k", "left_anti")
            .agg(F.count("*").cast("bigint").alias("n_orphans"))
            .select(F.lit(name).alias("check"), "n_orphans")
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("check")


def duplicate_keys(
    checks: list[tuple[str, DataFrame, list[str]]],
) -> DataFrame:
    """Uniqueness validation: for each (name, table, key_cols) check,
    how many key values occur more than once and how many surplus rows
    they carry — a groupBy on the key columns with partial counts
    map-side; only keys shuffle."""
    parts = []
    for name, df, key_cols in checks:
        dups = (
            df.groupBy(*key_cols)
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > 1)
            .agg(
                F.count("*").cast("bigint").alias("n_duplicated_keys"),
                F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_surplus_rows"),
            )
            .select(
                F.lit(name).alias("check"), "n_duplicated_keys", "n_surplus_rows"
            )
        )
        parts.append(dups)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("check")
