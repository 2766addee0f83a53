"""Z-order (Morton-curve) physical layout — multi-column data skipping.

The 100 TB problem: partitioning or sorting by ONE column makes that
column's per-file min/max stats tight (scans skip files), but leaves
every OTHER column's stats spanning the whole domain. Interleaving the
bits of two columns' normalized values (the Morton/Z curve) and
clustering by that single value makes BOTH columns' per-bucket ranges
narrow — the layout trick behind Delta's OPTIMIZE ZORDER BY — so a scan
filtered on either column (or both) can skip most buckets using only
min/max stats.

Everything here is deterministic integer arithmetic (no RNG, no
floats): values scale to q = ((v - min) * (2^bits - 1)) DIV (max - min)
(in wide integers — overflow-free for the full BIGINT domain) and
interleave via shift/mask sums, so the DuckDB oracle reproduces the
z-values bit-for-bit (the expression generator emits both dialects from
one template).

Skipping is honest stats-based pruning: the writer records per-bucket
min/max of BOTH raw columns in a sidecar manifest (what a lakehouse
keeps per file); ``read_pruned`` intersects query ranges with the
manifest and lists only surviving bucket directories. The z-ordering is
WHY the ranges are tight — ``tests/test_zorder.py`` pins that the
bucket extents under z-order are a fraction of what a single-column
sort leaves for the other column, and that pruned reads return exactly
the full-scan-filter rows.

Reference parity: none (the reference is a stream store, not a
lakehouse); this belongs to the training-data-pipeline surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_zorder_manifest.json"


def _interleave_template(bits: int, shl, shr) -> str:
    """Morton interleave of pre-scaled {a}, {b} (each in [0, 2^bits)):
    a's bit i lands at 2i, b's at 2i+1. ``shl``/``shr`` render the
    dialect's shift syntax, so one template serves Spark and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(shl(f"({shr('{a}', i)} & 1)", 2 * i))
        terms.append(shl(f"({shr('{b}', i)} & 1)", 2 * i + 1))
    return "(" + " + ".join(terms) + ")"


def z_expr_spark(a: str, b: str, bits: int = 16) -> str:
    t = _interleave_template(
        bits,
        lambda x, n: f"shiftleft({x}, {n})",
        lambda x, n: f"shiftright({x}, {n})",
    )
    return t.format(a=a, b=b)


def z_expr_duckdb(a: str, b: str, bits: int = 16) -> str:
    t = _interleave_template(
        bits,
        lambda x, n: f"(({x}) << {n})",
        lambda x, n: f"(({x}) >> {n})",
    )
    return t.format(a=a, b=b)


# Scaling: q = ((v - lo) * (2^bits - 1)) DIV (hi - lo), carried in
# WIDE integers — operands cast to DECIMAL(21,0) (21 digits: holds the
# full 2^64 BIGINT difference span) with Spark's integral `div`; the
# ×(2^bits−1) product itself is computed in the automatically-widened
# result precision (Spark's decimal promotion), HUGEINT `//` on the
# DuckDB side. In plain BIGINT the multiply
# overflows whenever the column's domain exceeds ~2^47 (nanosecond
# timestamps span ~2^60; hash columns the full 2^64 — ANSI mode then
# throws ARITHMETIC_OVERFLOW), and the obvious overflow-free
# alternative q = (v-lo) DIV width does NOT stretch small domains onto
# the full 2^bits range, which collapses the Morton bucket space (only
# the wide column's bits reach the z high bits — measured: either-
# column pruning stops working). Wide-integer multiply keeps both the
# full-range stretch and exactness for the entire BIGINT domain; both
# engines floor a non-negative exact rational, so values hash-match.


# NULL inputs scale to 0 (COALESCE below): a NULL has no place on the
# curve, so NULL rows cluster into bucket 0 with honest per-bucket
# stats — min/max ignore the NULLs, and a NULL never matches a range
# predicate, so pruning's superset guarantee is unaffected. Without
# the coalesce a NULL z-value creates a NULL partition key (the Hive
# default-partition directory) that the bucket manifest can't address.


def _scale_spark(col: str, lo: str, hi: str, bits: int) -> str:
    maxq = (1 << bits) - 1
    d = "DECIMAL(21,0)"
    v, l, h = (f"CAST({x} AS {d})" for x in (col, lo, hi))
    return (
        f"COALESCE(CASE WHEN {hi} = {lo} THEN CAST(0 AS BIGINT) ELSE "
        f"CAST((({v} - {l}) * {maxq}) div ({h} - {l}) AS BIGINT) END, "
        f"CAST(0 AS BIGINT))"
    )


def _scale_duckdb(col: str, lo: str, hi: str, bits: int) -> str:
    maxq = (1 << bits) - 1
    v, l, h = (f"CAST({x} AS HUGEINT)" for x in (col, lo, hi))
    return (
        f"COALESCE(CASE WHEN {hi} = {lo} THEN CAST(0 AS BIGINT) ELSE "
        f"CAST((({v} - {l}) * {maxq}) // ({h} - {l}) AS BIGINT) END, "
        f"CAST(0 AS BIGINT))"
    )


def z_values(df: DataFrame, col_a: str, col_b: str, bits: int = 16) -> DataFrame:
    """Append ``z`` — the Morton value of the two columns, scaled by the
    frame's own min/max. One plan: a 1-row min/max aggregate broadcast
    onto the frame (the ntile_deciles_approx shape — no collect, no
    second driver pass), then pure codegen'd integer expressions.

    Reserved temp names (ADVICE r12 #2): ``__alo``/``__ahi``/``__blo``/
    ``__bhi``/``__qa``/``__qb`` are projected and dropped internally —
    a caller column with one of these names would be silently replaced
    and lost. Rename such columns before calling."""
    stats = df.agg(
        F.min(F.col(col_a).cast("long")).alias("__alo"),
        F.max(F.col(col_a).cast("long")).alias("__ahi"),
        F.min(F.col(col_b).cast("long")).alias("__blo"),
        F.max(F.col(col_b).cast("long")).alias("__bhi"),
    )
    qa = _scale_spark(col_a, "__alo", "__ahi", bits)
    qb = _scale_spark(col_b, "__blo", "__bhi", bits)
    # r12: project the scaled quantized value ONCE per column, then
    # interleave over the projected BIGINTs — inlining the decimal
    # scale expression into every one of the 2·bits shift terms made
    # the z expression too large for whole-stage codegen, so the
    # interpreted eval re-ran the decimal arithmetic per term.
    # CollapseProject's multi-reference guard keeps the projection
    # materialized (each __q is referenced ``bits`` times). Same
    # arithmetic → identical z values.
    z = z_expr_spark("__qa", "__qb", bits)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__qa", F.expr(qa))
        .withColumn("__qb", F.expr(qb))
        .withColumn("z", F.expr(z))
        .drop("__alo", "__ahi", "__blo", "__bhi", "__qa", "__qb")
    )


def z_values_oracle_sql(
    table: str, col_a: str, col_b: str, key: str, bits: int = 16,
    with_cte: str = "",
) -> str:
    """DuckDB twin of ``z_values`` over a registered view (or a CTE
    passed via ``with_cte``): identical scaling and interleave, keyed
    for the hash compare."""
    qa = _scale_duckdb(col_a, "__alo", "__ahi", bits)
    qb = _scale_duckdb(col_b, "__blo", "__bhi", bits)
    z = z_expr_duckdb(qa, qb, bits)
    cte = f"{with_cte}, " if with_cte else ""
    return f"""
WITH {cte}s AS (
  SELECT CAST(min(CAST({col_a} AS BIGINT)) AS BIGINT) AS __alo,
         CAST(max(CAST({col_a} AS BIGINT)) AS BIGINT) AS __ahi,
         CAST(min(CAST({col_b} AS BIGINT)) AS BIGINT) AS __blo,
         CAST(max(CAST({col_b} AS BIGINT)) AS BIGINT) AS __bhi
  FROM {table})
SELECT {key}, CAST({z} AS BIGINT) AS z
FROM {table} CROSS JOIN s
ORDER BY {key}
"""


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_buckets: int = 64,
    bits: int = 16,
) -> dict:
    """Cluster by z-value into ``n_buckets`` equal z-range buckets,
    write one partition directory per bucket, and record each bucket's
    min/max of BOTH raw columns in a sidecar manifest (the per-file
    stats a lakehouse table format keeps). Returns the manifest dict.

    At cluster scale the same plan holds: the z computation is narrow,
    the single repartition-by-bucket shuffle replaces a global sort
    (equal z-ranges, not equal counts — ranges are what pruning needs),
    and the stats aggregate is n_buckets rows."""
    shift = max(0, 2 * bits - (n_buckets - 1).bit_length())
    zdf = z_values(df, col_a, col_b, bits).withColumn(
        "zbucket", F.shiftright(F.col("z"), shift).cast("long")
    )
    zdf = zdf.repartition(n_buckets, "zbucket").sortWithinPartitions("z")
    zdf.write.mode("overwrite").partitionBy("zbucket").parquet(path)
    # r12: compute the manifest stats from the JUST-WRITTEN table
    # (pruned to the two stat columns + the partition value) instead of
    # re-running zdf's lineage — the groupBy previously re-executed the
    # whole z computation AND the repartition shuffle a second time.
    # Same rows by construction → identical stats. r13 (ADVICE r12 #1):
    # read back with an EXPLICIT schema — an empty input writes no data
    # files, where a schemaless read raises UNABLE_TO_INFER_SCHEMA; the
    # schema'd read returns an empty frame (and pins zbucket's type
    # instead of relying on partition-column inference).
    written = zdf.sparkSession.read.schema(zdf.schema).parquet(path)
    stats_rows = (
        written.groupBy("zbucket")
        .agg(
            F.min(col_a).alias("a_min"), F.max(col_a).alias("a_max"),
            F.min(col_b).alias("b_min"), F.max(col_b).alias("b_max"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    )
    manifest = {
        "col_a": col_a,
        "col_b": col_b,
        "bits": bits,
        "buckets": {
            str(r["zbucket"]): {
                "a_min": r["a_min"], "a_max": r["a_max"],
                "b_min": r["b_min"], "b_max": r["b_max"],
                "n_rows": r["n_rows"],
            }
            for r in stats_rows
        },
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return manifest


def read_pruned(
    spark: SparkSession,
    path: str,
    a_range: tuple | None = None,
    b_range: tuple | None = None,
) -> tuple[DataFrame, int, int]:
    """Stats-based bucket skipping: list only the bucket directories
    whose recorded [min, max] intersects the query ranges, exactly like
    file skipping over lakehouse stats. Returns (df, read, total);
    callers still apply their row-level filter — skipping is a superset
    guarantee, never a substitute for the predicate."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)

    def _num(x):
        # Manifest stats round-trip through JSON as strings. Compare as
        # ints whenever the value is integral: float() on a BIGINT past
        # 2^53 loses up to hundreds of ULPs, so a boundary bucket whose
        # true max lies inside the query range could be wrongly skipped
        # — breaking the superset guarantee on exactly the wide-domain
        # columns the wide-integer scaling exists for.
        try:
            return int(x)
        except (TypeError, ValueError):
            return float(x)

    def _excluded(lo, hi, rng) -> bool:
        if lo is None or hi is None:
            # a NULL-stat bucket (all-NULL z inputs land in the default
            # partition) can never PROVE exclusion — read it; skipping
            # is a superset guarantee
            return False
        return _num(hi) < rng[0] or _num(lo) > rng[1]

    def survives(st) -> bool:
        if a_range is not None and _excluded(st["a_min"], st["a_max"], a_range):
            return False
        if b_range is not None and _excluded(st["b_min"], st["b_max"], b_range):
            return False
        return True

    keep = [b for b, st in manifest["buckets"].items() if survives(st)]
    total = len(manifest["buckets"])
    if not keep:
        empty = spark.read.parquet(path).limit(0)
        return empty, 0, total
    df = spark.read.option("basePath", path).parquet(
        *[os.path.join(path, f"zbucket={b}") for b in keep]
    )
    return df, len(keep), total


def z_values_multi(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> DataFrame:
    """k-column Morton value (ZORDER BY (a, b, c, ...)): round-robin
    bit interleave — column j's bit i lands at position i·k + j — over
    the same wide-integer full-range scaling as the 2-column form. Each
    column gets ``bits`` bits (default ``min(16, 63 // k)`` — as many
    as fit 63 total so a BIGINT holds the value, capped at 16 per
    column: 2 cols → 16 (capped), 3 → 16 (capped), 4 → 15).
    Same plan shape: one 1-row stats aggregate broadcast, then pure
    codegen'd expressions.

    Reserved temp names (ADVICE r12 #2): ``__lo{j}``/``__hi{j}``/
    ``__q{j}`` for j in 0..k-1 are projected and dropped internally —
    caller columns with these names would be silently replaced and
    lost. Rename such columns before calling."""
    k = len(cols)
    if k < 2:
        raise ValueError("z-order needs at least 2 columns")
    if bits is None:
        bits = min(16, 63 // k)
    aggs = []
    for j, c in enumerate(cols):
        aggs.append(F.min(F.col(c).cast("long")).alias(f"__lo{j}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"__hi{j}"))
    stats = df.agg(*aggs)
    scaled = [
        _scale_spark(c, f"__lo{j}", f"__hi{j}", bits) for j, c in enumerate(cols)
    ]
    # r12: one projected BIGINT per column, interleave over the
    # references (see z_values) — k·bits inlined copies of the decimal
    # scale expression defeated codegen and re-evaluated per term
    z = _z_multi_expr(
        [f"__q{j}" for j in range(k)], bits,
        lambda x, n: f"shiftleft({x}, {n})",
        lambda x, n: f"shiftright({x}, {n})",
    )
    out = df.crossJoin(F.broadcast(stats))
    for j in range(k):
        out = out.withColumn(f"__q{j}", F.expr(scaled[j]))
    out = out.withColumn("z", F.expr(z))
    return out.drop(
        *[f"__lo{j}" for j in range(k)], *[f"__hi{j}" for j in range(k)],
        *[f"__q{j}" for j in range(k)],
    )


def _z_multi_expr(scaled: list[str], bits: int, shl, shr) -> str:
    k = len(scaled)
    terms = []
    for i in range(bits):
        for j in range(k):
            terms.append(shl(f"({shr(scaled[j], i)} & 1)", i * k + j))
    return "(" + " + ".join(terms) + ")"


def z_values_multi_oracle_sql(
    table: str, cols: list[str], key: str, bits: int | None = None,
    with_cte: str = "",
) -> str:
    """DuckDB twin of ``z_values_multi`` (same default bit budget)."""
    k = len(cols)
    if bits is None:
        bits = min(16, 63 // k)
    stats_sel = ", ".join(
        f"CAST(min(CAST({c} AS BIGINT)) AS BIGINT) AS __lo{j}, "
        f"CAST(max(CAST({c} AS BIGINT)) AS BIGINT) AS __hi{j}"
        for j, c in enumerate(cols)
    )
    scaled = [
        _scale_duckdb(c, f"__lo{j}", f"__hi{j}", bits) for j, c in enumerate(cols)
    ]
    z = _z_multi_expr(
        scaled, bits,
        lambda x, n: f"(({x}) << {n})",
        lambda x, n: f"(({x}) >> {n})",
    )
    cte = f"{with_cte}, " if with_cte else ""
    return f"""
WITH {cte}s AS (SELECT {stats_sel} FROM {table})
SELECT {key}, CAST({z} AS BIGINT) AS z
FROM {table} CROSS JOIN s
ORDER BY {key}
"""
