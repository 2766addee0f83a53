"""Incremental aggregate maintenance — rollups that never rescan.

The 100 TB rule: a daily metrics table over an append-only event log
must be maintainable from the NEW batch alone. That works exactly when
the aggregate state is a commutative monoid — counts, sums, min/max,
and anything derivable from them (means, rates) — carried in the
rollup itself and merged by a groupBy-sum over (old ∪ delta). This
module keeps the mergeable state explicit (n, sum_k, min/max) and
derives the non-mergeable presentation columns (avg) at read time, the
same split Spark's own partial aggregation uses between update and
merge.

``merge_rollups(prev, delta) == full recompute`` is the correctness
contract — the gate query drives an 80/20 split of the events fixture
through rollup→merge and hash-matches a DuckDB full-table recompute.

Distinct counts are NOT a monoid on raw state — for incremental
distincts, carry a mergeable sketch instead (``text.py``'s KMV
sketches merge by union + re-rank; `stats_kmv_by_source` pins it).

Reference parity: none (the reference reads streams; materialized
rollups belong to the pipeline surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the mergeable state carried per (event_type, day)
_STATE_COLS = ("n", "sum_k", "min_k", "max_k")


def daily_rollup(events: DataFrame) -> DataFrame:
    """Per-(event_type, day) mergeable aggregate state over the events
    log: count, sum/min/max of the JSON payload's k. One partial-agg
    scan; output is the STATE, not the presentation."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.select(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day"), k.alias("k")
        )
        .groupBy("event_type", "day")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def merge_rollups(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Monoid merge: union the state tables and re-aggregate. The
    shuffle is keyed on the GROUP — its size is the number of touched
    groups, never the event count; at scale ``delta`` is one ingest
    batch and ``prev`` is the stored rollup."""
    merged = prev.select("event_type", "day", *_STATE_COLS).unionByName(
        delta.select("event_type", "day", *_STATE_COLS)
    )
    return (
        merged.groupBy("event_type", "day")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_k").cast("long").alias("sum_k"),
            F.min("min_k").alias("min_k"),
            F.max("max_k").alias("max_k"),
        )
    )


def present_rollup(state: DataFrame) -> DataFrame:
    """Presentation view over the state: derived columns (avg) computed
    at read time from mergeable parts — never stored, so they can't
    drift from the state."""
    return state.select(
        "event_type",
        "day",
        "n",
        "sum_k",
        "min_k",
        "max_k",
        (F.col("sum_k").cast("double") / F.col("n").cast("double")).alias("avg_k"),
    ).orderBy("event_type", "day")


def histogram_state(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    bounds: list[float],
) -> DataFrame:
    """Mergeable HISTOGRAM state per group: fixed explicit bin
    boundaries (len(bounds)+1 bins), one partial-agg scan. Quantiles
    are NOT a monoid on raw values — but bin counts are, so an
    incremental pipeline carries this state and derives quantile
    estimates at read time (``histogram_quantiles``), the same way
    engines maintain approximate percentiles incrementally. Boundaries
    must be fixed up front (derive once from a reference snapshot —
    changing them mid-stream would need a rebin scan)."""
    v = F.col(col).cast("double")
    bin_expr = F.lit(0)
    for b in bounds:
        bin_expr = bin_expr + F.when(v > F.lit(float(b)), 1).otherwise(0)
    return (
        # NULL values are dropped, not silently binned at 0 (a NULL
        # comparison is NULL, and otherwise(0) would have counted it)
        df.filter(v.isNotNull())
        .select(*group_cols, bin_expr.cast("int").alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("long").alias("n"))
    )


def merge_histogram_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Monoid merge: union + sum per (group, bin). Shuffle size is
    #groups × #bins, never the event count."""
    cols = a.columns
    key = [c for c in cols if c != "n"]
    return (
        a.unionByName(b.select(*cols))
        .groupBy(*key)
        .agg(F.sum("n").cast("long").alias("n"))
    )


def histogram_quantile_bins(
    state: DataFrame, group_cols: list[str], p: float
) -> DataFrame:
    """Locate the p-quantile bin per group from the state: the first
    bin whose cumulative count reaches ceil(p·N). All-integer output
    (quantile bin index, exact cumulative-below and in-bin counts) so
    the result is engine-exact; callers map the index back to bin
    edges for a value estimate. The cumulative window is partitioned
    per group and bounded by the bin count — O(n_bins) state."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(*group_cols)
    cum = (
        state.withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(tot_w))
        .withColumn("target", F.ceil(F.lit(p) * F.col("total")).cast("long"))
    )
    hit = cum.filter(F.col("cum") >= F.col("target"))
    w_first = Window.partitionBy(*group_cols).orderBy("bin")
    return (
        hit.withColumn("rk", F.row_number().over(w_first))
        .filter(F.col("rk") == 1)
        .select(
            *group_cols,
            F.col("bin").alias("q_bin"),
            (F.col("cum") - F.col("n")).cast("long").alias("cum_below"),
            F.col("n").alias("bin_n"),
            F.col("total").cast("long").alias("total"),
        )
    )
