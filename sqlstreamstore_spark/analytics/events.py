"""Event-log analytics: sessionization and time-bucketed aggregates.

Sessionization is the classic lag-gap-cumsum pattern (distributed: both
windows partition by user, nothing global). In streaming, the same
semantics come from ``session_window`` (streaming/ layer)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessions_per_user(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Count sessions per user: a session break is a gap > gap_seconds
    between consecutive events of one user.

    Oracle: see registry.py — identical lag/sum window SQL in DuckDB.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    return (
        events.withColumn(
            "is_new_session",
            F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
        )
        .groupBy("user_id")
        .agg(
            F.sum("is_new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def events_hourly_windows(events: DataFrame) -> DataFrame:
    """Tumbling event-time windows in batch — the exact aggregation
    streaming/windowed.windowed_counts runs incrementally; here it's one
    hash aggregate over the whole log (same grouping key, same results),
    which is how you backfill/repair a streaming aggregate."""
    w = F.window(F.col("ts"), "1 hour")
    return (
        events.groupBy(w.alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def streams_view(log: DataFrame) -> DataFrame:
    """The reference's `streams` table (Tables.sql:4-15) as a derived
    aggregate over the log: per-stream head version/position, first
    position, and count — the materialized aggregate its append path
    maintains (AppendToStream.sql:160-163), reconstructed declaratively."""
    return (
        log.groupBy("stream_id")
        .agg(
            F.max("stream_version").alias("head_version"),
            F.max("position").alias("head_position"),
            F.min("position").alias("first_position"),
            F.count("*").alias("message_count"),
        )
        .orderBy("first_position")
    )


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Ordered-funnel conversion (signup → click → purchase): per user,
    first-occurrence times via conditional min, then ordering checks —
    one hash aggregate keyed by user, no joins, no window. The shape
    scales linearly: conditional aggregation beats N self-joins for
    N-step funnels."""
    t_signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
    t_click = F.min(F.when(F.col("event_type") == "click", F.col("ts")))
    t_purchase = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    per_user = events.groupBy("user_id").agg(
        t_signup.alias("t_signup"), t_click.alias("t_click"), t_purchase.alias("t_purchase")
    )
    stage2 = F.col("t_signup").isNotNull() & F.col("t_click").isNotNull() & (
        F.col("t_click") > F.col("t_signup")
    )
    stage3 = stage2 & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t_click")
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_signup").isNotNull(), 1).otherwise(0)).alias("n_signup"),
        F.sum(F.when(stage2, 1).otherwise(0)).alias("n_signup_click"),
        F.sum(F.when(stage3, 1).otherwise(0)).alias("n_signup_click_purchase"),
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, then
    distinct active users per (cohort_week, weeks_since). Two hash
    aggregates, both keyed by user/cohort — the standard product-
    analytics matrix, linear in events."""
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            ((F.unix_timestamp("active_week") - F.unix_timestamp("cohort_week"))
             / F.lit(604800)).cast("int").alias("weeks_since"),
        )
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


def events_per_type_day(events: DataFrame) -> DataFrame:
    """Daily counts + value sums per event type (value summed exactly as
    DECIMAL then cast back — see tpch.py exactness strategy)."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


def daily_anomaly(events: DataFrame) -> DataFrame:
    """Count-anomaly monitor over the event log: per (type, day), the
    daily event count, its trailing 7-day moving average, and its
    z-score against the type's own mean/stddev — the basic "did
    ingestion spike or stall" signal over a pipeline's event stream.

    Determinism: the counts and the moving average are exact (BIGINT
    sums, one double division); the z-score's stddev accumulates in
    float (partial-agg order differs between engines), so it is rounded
    to 6 dp on both sides — the stats_corr_regr discipline. Zero/NULL
    stddev (a type with one day, or perfectly constant counts) maps to
    z = 0. Shuffle keys: (type, day) for the count, type for the two
    windows — parallel over types at any scale.
    """
    daily = events.groupBy(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    )
    wt = Window.partitionBy("event_type")
    mean = F.avg("n").over(wt)
    sd = F.stddev_samp("n").over(wt)
    z = F.when(sd.isNull() | (sd == 0.0), F.lit(0.0)).otherwise(
        (F.col("n") - mean) / sd
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        (
            F.sum("n").over(w7).cast("double")
            / F.count("*").over(w7).cast("double")
        ).alias("ma7"),
        F.round(z, 6).alias("z"),
    ).orderBy("event_type", "day")


def cumulative_reach(events: DataFrame) -> DataFrame:
    """Daily new-user counts and cumulative reach: each user's first
    event day (one groupBy on user_id — the corpus-sized shuffle),
    rolled up per day, then a running total over the day series. The
    final window is ordered over DAYS — cardinality bounded by the
    calendar, not the event volume, so the single-partition running sum
    is a few hundred rows at any corpus scale. All-integer; bit-exact
    oracle."""
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    daily = firsts.groupBy("day").agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("day")


def daily_gap_fill(events: DataFrame) -> DataFrame:
    """Zero-filled daily count series per event type: generate each
    type's full calendar spine (min..max day, `sequence` + explode —
    per-type, never a global driver loop) and left-join the observed
    daily counts, so downstream time-series consumers (the anomaly
    monitor above, forecasting, SLO burn rates) see explicit zeros for
    silent days instead of missing rows.

    Two shuffles: the daily count groupBy and the spine join, both
    keyed on (type, day) — parallel over types × days at any scale.
    All-integer output; bit-exact in the oracle.
    """
    daily = events.groupBy(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
        .orderBy("event_type", "day")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition matrix (the Markov/path-analysis
    shape product analytics runs): LAG the previous event type within
    each user's time-ordered stream, count (prev → next) bigrams, and
    report each transition's share of its source state's outgoing
    edges. One window keyed by user_id (the shuffle key — parallel over
    users at any scale) + one groupBy."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    w2 = Window.partitionBy("prev_type")
    return (
        counts.select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.sum("n").over(w2), 6).alias("share"),
        )
        .orderBy("prev_type", "next_type")
    )


def sliding_value_window(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Time-RANGE-frame moving aggregate per user: for each event, the
    count and sum of ``value`` over that user's events in the preceding
    ``minutes`` (inclusive at both frame ends) — the velocity-feature
    shape ("how much did this user do in the last hour, as of each
    event") that rules engines and feature stores backfill in batch.

    RANGE (not ROWS) semantics: peers at equal timestamps all enter the
    frame regardless of physical row order, so the result is
    deterministic under shuffle reordering. The frame key is integer
    epoch MICROseconds (the table's native precision — seconds would
    silently truncate sub-second gaps); the sum runs in DECIMAL inside
    the frame (order-independent, hash-exact) and casts to DOUBLE only
    on the way out.

    Scale shape: one shuffle on user_id + a per-user sort — the minimal
    plan any per-entity sliding feature needs; frame state is bounded
    by the window's time span, never the user's full history.
    """
    from pyspark.sql import Window

    base = events.filter(F.col("ts").isNotNull()).select(
        # NULL ts rows are dropped, not sorted: Spark windows put NULLS
        # FIRST, DuckDB LAST — frame membership would silently diverge
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-(minutes * 60 * 1_000_000), 0)
    )
    return base.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.sum("v").over(w).cast("double").alias("sum_window"),
    ).orderBy("event_id")


def ewma_value(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per-user exponentially-weighted moving average of ``value`` —
    the decayed-recency feature ("what does this user's activity look
    like lately") that no fixed-frame window expresses: every prior
    event contributes, downweighted by (1−α)^age.

    EWMA is a linear recurrence (y_t depends on y_{t−1}), which SQL
    windows can't express and the closed form Σ x_i(1−α)^{t−i} can't
    compute stably at scale (the (1−α)^{−i} rescaling overflows doubles
    past ~2,500 steps). So this is the honest `applyInPandas` case: one
    shuffle on user_id, each group's sequence scanned once by pandas'
    C-implemented ewm kernel (adjust=True: weighted-average form,
    numerator/denominator accumulators — numerically stable at any
    sequence length). Group state is the user's event history; for
    keys too hot to materialize you'd segment by time and carry the
    (num, den) pair across segments — the same monoid-carry shape as
    analytics/incremental.py.

    Ties on ts break by event_id (stable total order ⇒ deterministic
    output under shuffle reordering); NULL ts or value rows are
    dropped per the module's NULL discipline. The oracle replays the
    closed form in DuckDB by per-user self-join (quadratic, gate-scale
    only) with both engines rounding to 6 decimals.
    """
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "ewma": pdf["value"].ewm(alpha=alpha, adjust=True).mean(),
            }
        )

    base = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value"
    )
    # pin the shuffle width: AQE sizes partitions by BYTES and will
    # coalesce this small-byte/high-group shuffle down to 1-2 tasks,
    # serializing thousands of per-group pandas calls (measured 3x on
    # the fixture). An explicit repartition-by-key is non-coalescible
    # and the groupBy reuses its partitioning, so the grouped-pandas
    # stage keeps the cluster's parallelism.
    n_parts = events.sparkSession.sparkContext.defaultParallelism
    return (
        base.repartition(n_parts, "user_id")
        .groupBy("user_id")
        .applyInPandas(fn, "user_id long, event_id long, ewma double")
    )


def rolling_distinct_users(events: DataFrame, window_hours: int = 24) -> DataFrame:
    """Trailing-window distinct-user count per hour — "how many unique
    users in the 24 h ending at each hour" — the rolling-cardinality
    metric a COUNT over a frame can't express (DISTINCT isn't
    frame-able in Spark windows).

    Exact shape: dedupe to (hour, user) pairs, explode each pair into
    the ``window_hours`` target hours it serves, dedupe again, count.
    Replication factor = window/granularity (24 here); every step is a
    keyed partial agg. This is the small-window exact form; for wide
    windows or hot hours the bounded-state path is
    :func:`rolling_distinct_users_hll` (256 rows per hour, any N).
    Hours are integer epoch-hours (floor(epoch/3600)) — timezone-free
    and exactly replayable; only hours that actually have events are
    reported (the trailing window of a silent hour isn't a row).
    """
    h = F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("bigint").alias("h")
    hu = (
        events.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(h, "user_id")
        .distinct()
    )
    hours = hu.select("h").distinct()
    contrib = (
        hu.select(
            "h",
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(window_hours - 1))).alias("off"),
        )
        .select((F.col("h") + F.col("off")).alias("hour_epoch"), "user_id")
        .distinct()
    )
    return (
        contrib.join(hours, contrib.hour_epoch == hours.h)
        .groupBy("hour_epoch")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("hour_epoch")
    )


def rolling_distinct_users_hll(events: DataFrame, window_hours: int = 24) -> DataFrame:
    """The 100 TB twin of :func:`rolling_distinct_users`: per-hour
    HyperLogLog register files (256 rows/hour, whatever the user
    count), merged across the trailing window by union+max — rolling
    cardinality with bounded state, the streaming-rollup shape.

    The window merge replicates REGISTERS (≤256/hour), not user pairs,
    so the explode costs window·256 rows per hour total — independent
    of N. Fully oracled: the register build, the rolling max-merge and
    the estimate replay exactly in SQL (`_ROLLING_HLL_SQL`).
    """
    from sqlstreamstore_spark.analytics.text import hll_estimate, hll_registers

    h = F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("bigint").alias("h")
    base = events.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(h, F.col("user_id").cast("string").alias("u"))
    regs = hll_registers(base, col="u", group_cols=("h",))
    hours = base.select("h").distinct()
    merged = (
        regs.select(
            "h",
            "reg",
            "rho",
            F.explode(F.sequence(F.lit(0), F.lit(window_hours - 1))).alias("off"),
        )
        .select((F.col("h") + F.col("off")).alias("hour_epoch"), "reg", "rho")
        .groupBy("hour_epoch", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    est = hll_estimate(merged, group_cols=("hour_epoch",))
    return (
        est.join(hours, est.hour_epoch == hours.h)
        # hourly user counts live in linear-counting territory, so the
        # reported number is the corrected estimate; round(6) because
        # the ln() arm passes through libm (branch choice itself is
        # bit-identical — see hll_estimate)
        .select(
            "hour_epoch",
            "n_hit",
            "z_scaled",
            F.round(F.col("hll_corrected"), 6).alias("hll_users"),
        )
        .orderBy("hour_epoch")
    )


def scd2_versions(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: treat
    each user's event stream as attribute updates (the attribute being
    event_type) and emit one row per VERSION — opened when the value
    changes, closed by the next change — the warehouse-dimension shape
    (valid_from/valid_to, open rows marked) that turns an append-only
    log into point-in-time joinable history.

    Consecutive duplicates collapse (an update that doesn't change the
    value opens no version); validity bounds are integer epoch-micros
    with -1 for the open (current) version — sentinel instead of NULL
    so the gate projection has no NULL-ordering or NaT hazards.

    Scale shape: one shuffle on user_id; the change filter and the
    lead() close share the same (ts, event_id)-sorted partitioning, so
    Catalyst plans a single Exchange + sort reused by both windows.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        events.filter(F.col("ts").isNotNull())
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        chg.select(
            "user_id",
            F.col("event_type"),
            F.unix_micros(F.col("ts")).alias("valid_from_us"),
            F.coalesce(
                F.unix_micros(F.lead("ts").over(w2)), F.lit(-1).cast("bigint")
            ).alias("valid_to_us"),
        )
        # event_type tie-break: two type-changes for one user in the
        # same microsecond would otherwise make the order non-total and
        # cross-engine row order nondeterministic
        .orderBy("user_id", "valid_from_us", "event_type")
    )


def session_table(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Sessionize the log into a SESSION TABLE — one row per (user,
    session) with start/end, event count and duration — the entity the
    count-only :func:`sessions_per_user` summarizes away. Same
    lag-gap-cumsum core: a break opens a new session id (running sum of
    break flags per user), then one hash aggregate keyed by (user,
    session). Bounds are integer epoch-micros; single-event sessions
    have duration 0.

    Scale shape: the window and the aggregate share the user_id
    shuffle key; nothing global. In streaming the same semantics come
    from session_window (streaming/windowed.py) — this is the batch
    backfill twin.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    base = (
        events.filter(F.col("ts").isNotNull())
        .withColumn(
            "brk",
            F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_no",
            F.sum("brk").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        base.groupBy("user_id", "session_no")
        .agg(
            F.min(F.unix_micros(F.col("ts"))).alias("start_us"),
            F.max(F.unix_micros(F.col("ts"))).alias("end_us"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("session_no").cast("bigint").alias("session_no"),
            "start_us",
            "end_us",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
            "n_events",
        )
        .orderBy("user_id", "session_no")
    )


def funnel_windowed(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Time-boxed funnel (signup → click within W days → purchase
    within W days of that click): the product-analytics form where a
    conversion only counts inside its attribution window — the
    unbounded :func:`funnel_conversion` can't express "converted, but
    three months later doesn't count".

    Shape: three chained per-user window minima over ONE user_id
    Exchange+sort (each stage's anchor is the previous stage's window
    column, so the three Window operators stack on the same
    partitioning — Catalyst plans a single shuffle), then one global
    count-distinct aggregate. No joins, no self-joins on time. Stage
    timestamps are integer epoch-micros; window arithmetic in BIGINT.
    """
    w = Window.partitionBy("user_id")
    us = F.col("us")
    w_us = window_days * 86_400 * 1_000_000
    base = events.filter(
        # NULL users would diverge between engines: count_distinct skips
        # a NULL key while a SQL GROUP BY counts the NULL group
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("user_id", "event_type", F.unix_micros(F.col("ts")).alias("us"))
    d1 = base.withColumn(
        "t_signup",
        F.min(F.when(F.col("event_type") == "signup", us)).over(w),
    )
    d2 = d1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (us > F.col("t_signup"))
                & (us <= F.col("t_signup") + F.lit(w_us)),
                us,
            )
        ).over(w),
    )
    d3 = d2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (us > F.col("t_click"))
                & (us <= F.col("t_click") + F.lit(w_us)),
                us,
            )
        ).over(w),
    )
    return d3.agg(
        F.count_distinct(F.when(F.col("t_signup").isNotNull(), F.col("user_id")))
        .cast("bigint")
        .alias("n_signup"),
        F.count_distinct(F.when(F.col("t_click").isNotNull(), F.col("user_id")))
        .cast("bigint")
        .alias("n_click_w"),
        F.count_distinct(F.when(F.col("t_purchase").isNotNull(), F.col("user_id")))
        .cast("bigint")
        .alias("n_purchase_w"),
    )


def top_event_paths(events: DataFrame, k: int = 20) -> DataFrame:
    """Top-k 3-event paths (the sequential-pattern-mining shape behind
    "what do users do next" product questions): LEAD the next two event
    types within each user's time-ordered stream, count complete
    trigram paths, keep the k most frequent.

    Shape: one window keyed by user_id (same Exchange the other
    per-user features ride), one groupBy over at most |types|^3 path
    keys, and a TakeOrderedAndProject for the cut — per-partition
    k-heaps, never a global sort. The ordering (n DESC, then the path
    lexicographically) is total, so the top-k set is deterministic on
    any engine."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        # ts NOT NULL: Spark orders NULLs FIRST, DuckDB LAST — a NULL ts
        # would silently reorder the trigram stream per engine (module
        # NULL discipline; see sessions_per_user).
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
    )
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(k)
    )


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """CUSUM change-point scan over per-type daily counts (Page 1954,
    the classic drift alarm): for each event type, the cumulative sum
    of deviations from that type's mean daily count peaks at the day
    the level shifts. All-integer arithmetic — instead of c_d - mean
    (a rational), accumulate D*c_d - total (its numerator scaled by
    the day count D), which is exact in BIGINT; the reported change
    day is the |CUSUM| argmax with a deterministic day tie-break.

    Shape: one groupBy to the bounded (type, day) axis, then windows
    partitioned by type — per-type state is O(days), never O(events);
    at 100 TB the event scan is the only big stage and it partially
    aggregates map-side."""
    daily = (
        # ts NOT NULL: a NULL day cell would order differently per
        # engine (Spark NULLs FIRST / DuckDB LAST) inside the CUSUM
        # window — module NULL discipline.
        events.filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").alias("c"))
    )
    wt = Window.partitionBy("event_type")
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        daily.withColumn("n_days", F.count("*").over(wt))
        .withColumn("total", F.sum("c").over(wt))
        .withColumn(
            "cusum",
            F.sum(F.col("n_days") * F.col("c") - F.col("total")).over(wc),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("day")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            "cusum",
            "n_days",
            "total",
        )
        .orderBy("event_type")
    )


def seasonal_profile(events: DataFrame) -> DataFrame:
    """Hour-of-week seasonal profile per event type: the 7x24 cell
    counts, each cell's share of its type's total, and the cell's
    rank within the type (rank 1 = the type's peak hour). The share is
    one IEEE division of two exact BIGINTs — correctly rounded and
    identical on any engine, no tolerance needed.

    Shape: one partial-aggregating groupBy onto the bounded
    |types|x168 axis; both windows share the event_type partitioning.
    Day-of-week is Monday=0 (Spark weekday(); ISO dow - 1 elsewhere)."""
    cells = (
        # ts NOT NULL: NULL dow/hod cells would sort differently per
        # engine — module NULL discipline.
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.weekday(F.col("ts")).cast("long").alias("dow"),
            F.hour(F.col("ts")).cast("long").alias("hod"),
        )
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(F.desc("n"), "dow", "hod")
    return (
        cells.withColumn("share", F.col("n") / F.sum("n").over(wt))
        .withColumn("rank_in_type", F.row_number().over(wr).cast("long"))
        .orderBy("event_type", "dow", "hod")
    )


def rfm_segments(events: DataFrame, n_tiles: int = 5) -> DataFrame:
    """RFM segmentation — the classic user-value triage: per user,
    Recency (last-activity epoch-micros), Frequency (event count),
    Monetary (exact integer-cents value sum), each scored into
    ``n_tiles`` quantile tiles, plus the combined segment code
    (r_score*100 + f_score*10 + m_score, the "555 = best" convention).

    Tile assignment uses the rank-exact-bounds pattern
    (stats_ntile_deciles_approx), NOT a global NTILE: boundaries come
    from percentile_approx over the per-user metric (GK sketch,
    rank-exact at gate accuracy), and each user's tile is 1 + count of
    boundaries strictly below their value — a map-side expression, so
    nothing funnels through a single partition at any scale (a global
    NTILE sorts every user through one task). Equal metric values share
    a tile on every engine by construction.

    Monetary is an exact BIGINT sum of value*100 cents — a double sum's
    partial order would differ legitimately per engine AND per run, and
    a boundary tie-break on noise would flip tiles nondeterministically.

    One shuffle (user_id groupBy); three broadcast boundary arrays."""
    base = events.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    per_user = base.groupBy("user_id").agg(
        F.max(F.unix_micros(F.col("ts"))).alias("recency_us"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum(
            F.coalesce(
                F.round(F.col("value").cast("double") * 100).cast("bigint"),
                F.lit(0),
            )
        ).alias("monetary_cents"),
    )
    qs = [i / n_tiles for i in range(1, n_tiles)]

    def tile(metric: str, out: str):
        b = per_user.agg(
            F.percentile_approx(
                F.col(metric).cast("double"),
                F.array([F.lit(q) for q in qs]),
                F.lit(10_000),
            ).alias(f"__b_{out}")
        )
        v = F.col(metric).cast("double")
        score = (
            F.lit(1)
            + F.size(F.filter(f"__b_{out}", lambda x: v > x))
        ).cast("int")
        return b, score

    br, r_score = tile("recency_us", "r")
    bf, f_score = tile("frequency", "f")
    bm, m_score = tile("monetary_cents", "m")
    scored = (
        per_user.crossJoin(F.broadcast(br))
        .crossJoin(F.broadcast(bf))
        .crossJoin(F.broadcast(bm))
        .select(
            "user_id",
            "recency_us",
            "frequency",
            "monetary_cents",
            r_score.alias("r_score"),
            f_score.alias("f_score"),
            m_score.alias("m_score"),
        )
    )
    return scored.withColumn(
        "segment",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast("int"),
    ).orderBy("user_id")


def user_lifecycle(events: DataFrame) -> DataFrame:
    """Weekly growth accounting — the new / retained / resurrected /
    churned decomposition every activity dashboard is built on. A user
    is NEW in their first active week, RETAINED when active the week
    right after an active week, RESURRECTED when returning after a gap,
    and counts as CHURNED in the first week after an active week with
    no activity (attributed to that empty week, capped at the corpus's
    last observed week so the dataset edge doesn't fabricate churn).

    Conservation law (pinned in tests): for consecutive weeks,
    active(w) = new(w) + retained(w) + resurrected(w), and
    churned(w) = active(w-1) - retained(w).

    Shape: one distinct onto (user, week), one user-keyed window for
    LAG/LEAD (parallel over users), a union of status rows, and a
    partial agg onto the bounded week axis. All counts BIGINT — zero-
    tolerance oracle. NULL user/ts rows are excluded up front (module
    NULL discipline).

    Week arithmetic runs in DATE space (`date_add`, `datediff`), not
    `timestamp + INTERVAL 7 DAYS`: calendar-day addition is DST-immune,
    so a non-UTC session timezone with a mid-week DST shift cannot make
    "the week right after" miscompare (it would under timestamp
    interval arithmetic, misclassifying retained as resurrected). The
    output `week` column stays a midnight timestamp — identical values
    to the old formulation in UTC."""
    wk = F.to_date(F.date_trunc("week", F.col("ts")))
    pres = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", wk.alias("week"))
        .distinct()
        .localCheckpoint()  # feeds the window pass AND the max-week cap
    )
    w = Window.partitionBy("user_id").orderBy("week")
    seq = pres.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_week"),
        F.lead("week").over(w).alias("next_week"),
    )
    status = F.when(F.col("prev_week").isNull(), F.lit("new")).when(
        F.date_add(F.col("prev_week"), 7) == F.col("week"),
        F.lit("retained"),
    ).otherwise(F.lit("resurrected"))
    active = seq.select(F.col("week"), status.alias("status"))
    max_wk = pres.agg(F.max("week").alias("max_week"))
    churn = (
        seq.filter(
            F.col("next_week").isNull()
            | (F.col("next_week") > F.date_add(F.col("week"), 7))
        )
        .select(F.date_add(F.col("week"), 7).alias("week"))
        .crossJoin(F.broadcast(max_wk))
        .filter(F.col("week") <= F.col("max_week"))
        .select("week", F.lit("churned").alias("status"))
    )
    return (
        active.unionByName(churn)
        .withColumn("week", F.col("week").cast("timestamp"))
        .groupBy("week")
        .agg(
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).cast("long").alias("n_new"),
            F.sum(F.when(F.col("status") == "retained", 1).otherwise(0)).cast("long").alias("n_retained"),
            F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0)).cast("long").alias("n_resurrected"),
            F.sum(F.when(F.col("status") == "churned", 1).otherwise(0)).cast("long").alias("n_churned"),
        )
        .orderBy("week")
    )


def power_users_gini(events: DataFrame) -> DataFrame:
    """Gini coefficient of per-user activity — the inequality audit
    that tells you whether "10k users" means 10k contributors or three
    bots and an audience. Uses the exact rank formula over ascending
    per-user counts:

        G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n

    Ties in x make the sum order-free (swapping equal values changes
    nothing), so the user-id tie-break exists only to make the rank
    assignment total. rank_sum accumulates in DECIMAL(38,0) — at the
    1e9-user scale the docstrings target, Σ i·xᵢ overflows int64 (i up
    to 1e9 times per-user counts), matching the module's widening
    discipline (inter_arrival_burstiness, brand HHI); the denominator
    n·Σx is likewise computed in double. G is exact integer/decimal
    sums followed by two divides and one subtraction.

    Scale shape: one user-keyed partial agg, then the two-phase dense
    rank of `operators/positions.py` over the USER table (never the
    raw log), then an integer agg. No single-partition window."""
    from sqlstreamstore_spark.operators.positions import with_dense_global_index

    counts = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("x"))
    )
    ranked = with_dense_global_index(
        counts, [F.col("x"), F.col("user_id")], index_col="idx"
    )
    rank_term = (F.col("idx") + F.lit(1)).cast("decimal(19,0)") * F.col("x").cast(
        "decimal(19,0)"
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("total_events"),
        F.sum(rank_term).cast("decimal(38,0)").alias("rank_sum"),
    ).select(
        "n_users",
        "total_events",
        (
            (F.lit(2.0) * F.col("rank_sum").cast("double"))
            / (F.col("n_users").cast("double") * F.col("total_events").cast("double"))
            - (F.col("n_users") + F.lit(1)).cast("double") / F.col("n_users")
        ).alias("gini"),
    )


def inter_arrival_burstiness(events: DataFrame) -> DataFrame:
    """Goh-Barabási burstiness of each event type's inter-arrival
    times: B = (σ − μ)/(σ + μ) over the gaps between consecutive
    events — B → −1 for a metronome, 0 for a Poisson process, → 1 for
    extreme bursts. The operational load-model check: autoscaling
    tuned on mean rate alone is wrong exactly when B ≫ 0.

    Gaps are exact BIGINT microseconds (ts − LAG(ts) per type, NULL ts
    excluded, event_id tie-break so equal timestamps gap to zero
    deterministically); μ and σ come from the two exact moments — the
    second moment accumulates in DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB) because Σgap² overflows int64 at ~2000 gaps of ~20 min —
    so the only non-exact steps are two divides, one sqrt (correctly
    rounded), and the final ratio — zero-tolerance oracle.

    Shape: one type-partitioned window + a partial agg onto the
    bounded type axis."""
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = (
        events.filter(F.col("ts").isNotNull())
        .select("event_type", "event_id", us.alias("us"))
        .withColumn("gap", F.col("us") - F.lag("us").over(w))
        .filter(F.col("gap").isNotNull())
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    sig = F.sqrt(var)
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("gap").cast("long").alias("s1"),
            F.sum(F.col("gap").cast("decimal(19,0)") * F.col("gap")).alias("s2"),
        )
        .select(
            "event_type",
            "n",
            mean.alias("mean_gap_us"),
            sig.alias("std_gap_us"),
            ((sig - mean) / (sig + mean)).alias("burstiness"),
        )
        .orderBy("event_type")
    )


def km_survival(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Kaplan-Meier product-limit survival curve of session duration —
    THE right way to answer "how long do sessions last" when the
    observation window truncates the tail: a session still plausibly
    open at the horizon (its end within one gap of the corpus max) is
    right-CENSORED — it contributes to the at-risk set up to its
    observed duration but never counts as an ending. A naive duration
    histogram biases short; KM is the standard correction
    (Kaplan & Meier 1958).

        S(t) = prod over event times t_i <= t of (1 - d_i / n_i)

    with d_i = sessions ending at t_i, n_i = sessions with duration
    >= t_i. Computed from the session table (same lag-gap-cumsum
    core), grouped by distinct duration, with BOTH running quantities
    from the two-phase global-cumsum primitive — no single-partition
    window: n_i = total - cumsum(ended+censored) + own, and ln S from
    a running double sum of ln((n_i-d_i)/n_i) over event rows. The
    only float steps are ln/exp (rounded to 9; the S(t)=0 terminal row
    where n_i = d_i is cased exactly — DuckDB's ln(0) throws, Spark's
    returns NULL).

    Scale shape: the curve's row count is the number of DISTINCT event
    durations; both cumsums are range-partitioned two-phase passes, so
    nothing funnels through one task even when durations are near-
    unique."""
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    # (r12 optimization note: materializing the session table here —
    # persist or localCheckpoint — measured SLOWER than letting the
    # branches recompute it as parallel stages of the one job; see
    # OPTIMIZATION_r12.md "barrier A/B".)
    s = session_table(events, gap_seconds)
    horizon = s.agg(F.max("end_us").alias("__h"))
    gap_us = gap_seconds * 1_000_000
    durs = s.crossJoin(F.broadcast(horizon)).select(
        "duration_us",
        F.when(F.col("end_us") + gap_us > F.col("__h"), 0)
        .otherwise(1)
        .cast("long")
        .alias("is_event"),
    )
    g = durs.groupBy("duration_us").agg(
        F.sum("is_event").cast("long").alias("d"),
        (F.count("*") - F.sum("is_event")).cast("long").alias("c"),
    )
    # total at-risk carried as a broadcast one-row aggregate (the
    # horizon/max_wk convention) — no eager driver collect, the plan
    # stays a single lazy DAG
    total = g.agg(
        F.coalesce(F.sum(F.col("d") + F.col("c")), F.lit(0)).cast("long").alias("__total")
    )
    cum = (
        with_global_cumsum(
            g.withColumn("all_n", F.col("d") + F.col("c")),
            [F.col("duration_us")],
            "all_n",
            "cum_all",
        )
        .crossJoin(F.broadcast(total))
        .withColumn("n_risk", F.col("__total") - F.col("cum_all") + F.col("all_n"))
        .drop("__total")
    )
    terms = cum.withColumn(
        "lnterm",
        F.when(
            (F.col("d") > 0) & (F.col("n_risk") > F.col("d")),
            F.log((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk")),
        ),
    )
    lncum = with_global_cumsum(
        terms, [F.col("duration_us")], "lnterm", "lncum", result_type="double"
    )
    return (
        lncum.filter(F.col("d") > 0)
        .select(
            F.col("duration_us").alias("t_us"),
            "n_risk",
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            F.when(F.col("n_risk") == F.col("d"), F.lit(0.0))
            .otherwise(F.round(F.exp(F.coalesce(F.col("lncum"), F.lit(0.0))), 9))
            .alias("survival"),
        )
        .orderBy("t_us")
    )


def ohlc_bars(events: DataFrame) -> DataFrame:
    """Hourly OHLC downsampling bars per event type — the candle/
    time-bucket compaction every metrics pipeline runs before
    plotting: open = first value in the bucket, close = last, high/low
    = extremes, n = sample count. All five outputs are PICKS of
    existing doubles (no float arithmetic) — zero-tolerance oracle.

    First/last are row_number picks over (ts, event_id) — a total
    order, so ties at the bucket edge resolve identically in both
    engines. Scale shape: both windows and the final aggregate share
    the (event_type, hour_id) hash key — ONE Exchange, two in-
    partition sorts, then a partial agg; bucket count is bounded by
    time x types, not rows."""
    us = F.unix_micros(F.col("ts"))
    base = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type",
        F.floor(us / F.lit(3_600_000_000)).cast("long").alias("hour_id"),
        us.alias("us"),
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "hour_id").orderBy("us", "event_id")
    wd = Window.partitionBy("event_type", "hour_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    marked = base.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return (
        marked.groupBy("event_type", "hour_id")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy("event_type", "hour_id")
    )


def activity_streaks(events: DataFrame) -> DataFrame:
    """Consecutive-day activity streaks per user — the gaps-and-
    islands classic (retention teams call it "current streak / best
    streak"): distinct active days, island key = day_no - row_number
    (constant within a run of consecutive days), one aggregate per
    island, then a per-user report: longest streak, streak count,
    total active days, and the last streak's length. All-integer —
    zero-tolerance oracle.

    Scale shape: everything is keyed by user_id (distinct, window,
    both aggregates share the shuffle); days are floor-divided epoch
    micros (floor, not cast-truncate — pre-1970 rows bucket
    correctly)."""
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("long")
    days = (
        events.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", day.alias("day_no"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_no")
    islands = days.withColumn(
        "grp", F.col("day_no") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("len"),
        F.min("day_no").alias("start_day"),
        F.max("day_no").alias("end_day"),
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count("*").cast("long").alias("n_streaks"),
            F.sum("len").cast("long").alias("n_active_days"),
            F.max_by("len", "end_day").alias("current_streak"),
            F.max("end_day").alias("last_active_day"),
        )
        .orderBy("user_id")
    )


def clamped_balance(events: DataFrame, debit_types: tuple = ("purchase",)) -> DataFrame:
    """Clamped-at-zero running balance per user — the prepaid-wallet /
    token-bucket replay: every event credits its value (in exact
    cents) except ``debit_types``, which debit; the balance can never
    go below zero (a debit against an empty wallet burns only what's
    there). The recurrence

        b_n = max(0, b_{n-1} + delta_n)

    looks inherently sequential (the EWMA trap), but clamp-at-zero
    from an empty start has the classic Skorokhod-reflection closed
    form over plain prefix sums:

        b_n = S_n - min(0, min_{k<=n} S_k)

    so it's TWO per-user window passes (running sum + running min of
    that sum) — no applyInPandas, no recursion, fully inside
    whole-stage codegen. The pure-recurrence replay is pinned in
    tests; deltas are round(value*100) BIGINT cents — zero-tolerance
    oracle.

    Scale shape: both windows and the output share the user_id key;
    state per user is one running pair."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = events.filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        "event_type",
        F.when(
            F.col("event_type").isin(*debit_types),
            -F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.round(F.col("value") * 100).cast("long"))
        .alias("delta_cents"),
    )
    s = base.withColumn("run_sum", F.sum("delta_cents").over(w).cast("long"))
    return (
        s.withColumn("run_min", F.min("run_sum").over(w).cast("long"))
        .select(
            "user_id",
            "us",
            "event_id",
            "event_type",
            "delta_cents",
            (
                F.col("run_sum") - F.least(F.lit(0).cast("long"), F.col("run_min"))
            ).alias("balance_cents"),
        )
        .orderBy("user_id", "us", "event_id")
    )


def daily_autocorr(events: DataFrame, lags: tuple = (1, 7)) -> DataFrame:
    """Lag-k autocorrelation of the daily event-count series — the
    time-series health check behind "is traffic weekly-periodic"
    (lag 7 high) and "is today like yesterday" (lag 1): Pearson r of
    (count[day], count[day+k]) over the FULL calendar spine between
    the first and last active day, absent days counted as genuine
    zeros (skipping them silently shifts the alignment — the classic
    gap bug the spine prevents).

    All five moments accumulate in exact BIGINTs via one partial agg
    per lag; r's numerator/denominator are cross-multiplied integers
    with two sqrts at the end — identical expression order in both
    engines. Scale shape: counts aggregate map-side onto the bounded
    day axis; the spine is generated, not shuffled; lag alignment is
    an equi-join on day_no."""
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("long")
    counts = (
        events.filter(F.col("ts").isNotNull())
        .select(day.alias("day_no"))
        .groupBy("day_no")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    bounds = counts.agg(
        F.min("day_no").alias("d0"), F.max("day_no").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day_no")
    )
    filled = (
        spine.join(counts, "day_no", "left")
        .select("day_no", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )
    out = None
    for k in lags:
        x = filled.select(F.col("day_no"), F.col("cnt").alias("x"))
        y = filled.select(
            (F.col("day_no") - k).alias("day_no"), F.col("cnt").alias("y")
        )
        m = (
            x.join(y, "day_no")
            .agg(
                F.count("*").cast("long").alias("n_pairs"),
                F.sum("x").cast("long").alias("sx"),
                F.sum("y").cast("long").alias("sy"),
                F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
                F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            )
            .select(
                F.lit(k).cast("long").alias("lag"),
                "n_pairs",
                (
                    (
                        F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
                    ).cast("double")
                    / F.nullif(
                        F.sqrt(
                            (
                                F.col("n_pairs") * F.col("sxx")
                                - F.col("sx") * F.col("sx")
                            ).cast("double")
                        )
                        * F.sqrt(
                            (
                                F.col("n_pairs") * F.col("syy")
                                - F.col("sy") * F.col("sy")
                            ).cast("double")
                        ),
                        F.lit(0.0),
                    )
                ).alias("autocorr"),
            )
        )
        out = m if out is None else out.unionByName(m)
    return out.orderBy("lag")


def churn_hazard(events: DataFrame) -> DataFrame:
    """Discrete-time churn hazard by tenure DAY — the retention
    curve's derivative, the number a growth team actually acts on
    ("day 28 is where we lose people"): for each tenure day k,
    hazard(k) = users who churned exactly k days after their first
    activity / users still at risk at day k. A user whose last
    activity falls on the final observed day is right-CENSORED (we
    cannot know they churned — counting them inflates late hazards;
    the same censoring discipline as :func:`km_survival`, discretized
    to the day axis — the fixture's 30-day window leaves weekly
    buckets degenerate, daily ones carry the signal).

    All-integer: tenure = last_day - first_day (floor-div epoch
    micros), at-risk via the two-phase cumsum countdown, hazard one
    exact divide. Shape: one user-keyed agg, then the day axis is
    bounded by the observation span."""
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    day = F.floor(
        F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)
    ).cast("long")
    users = (
        events.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", day.alias("dy"))
        .groupBy("user_id")
        .agg(F.min("dy").alias("w0"), F.max("dy").alias("w1"))
    )
    horizon = users.agg(F.max("w1").alias("__wmax"))
    obs = users.crossJoin(F.broadcast(horizon)).select(
        (F.col("w1") - F.col("w0")).alias("tenure_days"),
        F.when(F.col("w1") < F.col("__wmax"), 1).otherwise(0).cast("long").alias(
            "churned"
        ),
    )
    g = obs.groupBy("tenure_days").agg(
        F.sum("churned").cast("long").alias("d"),
        (F.count("*") - F.sum("churned")).cast("long").alias("c"),
    )
    # total at-risk as a broadcast one-row aggregate (lazy-plan
    # discipline, mirroring km_survival)
    total = g.agg(
        F.coalesce(F.sum(F.col("d") + F.col("c")), F.lit(0)).cast("long").alias("__total")
    )
    cum = (
        with_global_cumsum(
            g.withColumn("all_n", F.col("d") + F.col("c")),
            [F.col("tenure_days")],
            "all_n",
            "cum_all",
        )
        .crossJoin(F.broadcast(total))
        .withColumn("n_risk", F.col("__total") - F.col("cum_all") + F.col("all_n"))
        .drop("__total")
    )
    return cum.select(
        "tenure_days",
        "n_risk",
        F.col("d").alias("n_churned"),
        F.col("c").alias("n_censored"),
        (F.col("d").cast("double") / F.col("n_risk")).alias("hazard"),
    ).orderBy("tenure_days")


def peak_concurrency(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Peak simultaneous sessions — the capacity-planning number
    ("size for the worst minute, not the average"): sweep-line over
    the session table's [start_us, end_us] intervals (+1 at start,
    -1 just after end, net deltas grouped per timestamp so boundary
    ties resolve order-independently), running concurrency via the
    two-phase global cumsum, then one aggregate for the peak and the
    FIRST time it is reached. Same sweep shape as the order backlog
    (backlog_sweepline), on the stream the store actually serves.

    All-integer; single-row output. Scale shape: the sweep axis is
    distinct timestamps; the cumsum is the range-partitioned two-phase
    pass — nothing global, no interval self-join."""
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    s = session_table(events, gap_seconds)
    deltas = (
        s.select(F.col("start_us").alias("us"), F.lit(1).alias("delta"))
        .unionByName(
            s.select(
                (F.col("end_us") + 1).alias("us"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("us")
        .agg(F.sum("delta").cast("long").alias("net"))
    )
    run = with_global_cumsum(deltas, [F.col("us")], "net", "running")
    peak = run.agg(F.max("running").alias("peak"))
    first_at = (
        run.crossJoin(F.broadcast(peak))
        .filter(F.col("running") == F.col("peak"))
        .agg(F.min("us").alias("first_peak_us"), F.max("peak").alias("peak"))
    )
    n = s.agg(F.count("*").cast("long").alias("n_sessions"))
    return first_at.crossJoin(F.broadcast(n)).select(
        "n_sessions", "peak", "first_peak_us"
    )


def ltv_triangle(events: DataFrame) -> DataFrame:
    """Cohort LTV triangle — the finance-facing growth artifact: users
    grouped by signup-cohort week (week of first activity), purchase
    revenue accumulated by cohort age, one cell per (cohort_week,
    age_weeks) with the cell's active purchasers, its revenue, and the
    cohort's running cumulative revenue ("LTV at age k"). Reading a
    column compares cohort quality at equal age — the triangle shape
    is why finance calls it that.

    All-integer (BIGINT cents); the cumulative sum is a window keyed
    by cohort_week over the bounded age axis. Shape: one user-keyed
    agg for cohorts, one broadcast-joinable cohort map (users are the
    small side ONLY at fixture scale — at 100 TB the join is a plain
    user_id equi-join, which is what's written), one partial agg onto
    the bounded (cohort, age) grid."""
    week = F.floor(
        F.unix_micros(F.col("ts")) / F.lit(7 * 86_400_000_000)
    ).cast("long")
    base = events.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("user_id", week.alias("wk"), "event_type", "value")
    cohorts = base.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    cells = (
        base.join(cohorts, "user_id")
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("value").isNotNull())
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("age_weeks"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_purchasers"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.withColumn(
            "cum_revenue_cents", F.sum("revenue_cents").over(w).cast("long")
        )
        .orderBy("cohort_week", "age_weeks")
    )


def dau_mau_stickiness(events: DataFrame, window_days: int = 28) -> DataFrame:
    """DAU / trailing-MAU stickiness per day — the engagement ratio
    ("what share of the monthly audience shows up daily") every
    consumer product reports: DAU = distinct users that day, MAU =
    distinct users in the ``window_days`` ending that day, computed
    exactly with the same explode-to-target-days shape as
    :func:`rolling_distinct_users` (a frame-DISTINCT no window can
    express; the bounded-state twin at 100 TB is the HLL register
    path). Only observed days are rows; the ratio is one exact
    divide.

    Scale shape: every step is a keyed partial agg on (day, user);
    replication factor = window size (28), never a self-join."""
    d = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("long")
    du = (
        events.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(d.alias("d"), "user_id")
        .distinct()
    )
    dau = du.groupBy("d").agg(F.count("*").cast("long").alias("dau"))
    contrib = (
        du.select(
            "d",
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("off"),
        )
        .select((F.col("d") + F.col("off")).alias("day_no"), "user_id")
        .distinct()
    )
    mau = (
        contrib.join(dau.select(F.col("d").alias("day_no")), "day_no")
        .groupBy("day_no")
        .agg(F.count("*").cast("long").alias("mau"))
    )
    return (
        dau.withColumnRenamed("d", "day_no")
        .join(mau, "day_no")
        .select(
            "day_no",
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
        .orderBy("day_no")
    )


def session_gap_sweep(
    events: DataFrame, gaps_seconds: tuple = (300, 1800, 7200)
) -> DataFrame:
    """Sessionization parameter sweep — how session counts respond to
    the inactivity-gap threshold, the table you read BEFORE picking
    the 30-minute default everyone cargo-cults: per candidate gap, the
    session count, singleton share, and total/max duration. One pass:
    the per-user LAG is gap-independent, so it's computed once, the
    candidate gaps are exploded against it, and ONE window keyed by
    (gap, user) numbers all three sweeps together.

    All-integer outputs — zero-tolerance oracle. Scale shape: the
    window and aggregates share the (gap, user) key; cost = one
    sessionization × the (bounded) number of candidate gaps."""
    base = events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    wl = Window.partitionBy("user_id").orderBy("us", "event_id")
    lagged = base.withColumn("prev_us", F.lag("us").over(wl))
    swept = lagged.select(
        "*",
        F.explode(
            # long, not int: gap_s * 1e6 micros overflows int32 at 2147 s
            F.array(*[F.lit(g).cast("long") for g in gaps_seconds])
        ).alias("gap_s"),
    )
    brk = F.when(
        F.col("prev_us").isNull()
        | ((F.col("us") - F.col("prev_us")) > F.col("gap_s") * 1_000_000),
        1,
    ).otherwise(0)
    w = (
        Window.partitionBy("gap_s", "user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = swept.withColumn("brk", brk).withColumn(
        "session_no", F.sum("brk").over(w)
    )
    sess = numbered.groupBy("gap_s", "user_id", "session_no").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    return (
        sess.groupBy("gap_s")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_singletons"),
            F.sum("dur_us").cast("long").alias("total_duration_us"),
            F.max("dur_us").cast("long").alias("max_duration_us"),
        )
        .orderBy("gap_s")
    )


def error_burn_rate(
    events: DataFrame, slo: float = 0.75, long_hours: int = 6
) -> DataFrame:
    """Multiwindow error-budget burn rate — the SRE alerting rule
    (short AND long window both burning ⇒ page): per hour, the 1-hour
    error share and the trailing ``long_hours`` share, each divided by
    the error budget (1 - slo); the alert fires only when both exceed
    1. The two-window AND is what kills both false pages (short-only
    spikes) and slow burns missed by short windows.

    Counts are exact; rates are single divides; the trailing window is
    the explode-to-target-hours shape (factor = long_hours), never a
    self-join. The budget divide uses the literal (1 - slo) double —
    identical in both engines."""
    h = F.floor(F.unix_micros(F.col("ts")) / F.lit(3_600_000_000)).cast("long")
    base = events.filter(F.col("ts").isNotNull()).select(
        h.alias("h"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).cast("long").alias(
            "is_err"
        ),
    )
    hourly = base.groupBy("h").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("is_err").cast("long").alias("n_errors"),
    ).localCheckpoint(eager=False)
    # barrier (r12 optimization): the hourly census is referenced three
    # times (window explode, trailing membership join, final join) —
    # bounded by the hour axis, lineage scans the full event set
    contrib = (
        hourly.select(
            "h",
            "n_total",
            "n_errors",
            F.explode(F.sequence(F.lit(0), F.lit(long_hours - 1))).alias("off"),
        )
        .select((F.col("h") + F.col("off")).alias("hour_epoch"), "n_total", "n_errors")
    )
    trailing = (
        contrib.join(
            hourly.select(F.col("h").alias("hour_epoch")), "hour_epoch"
        )
        .groupBy("hour_epoch")
        .agg(
            F.sum("n_total").cast("long").alias("long_total"),
            F.sum("n_errors").cast("long").alias("long_errors"),
        )
    )
    budget = 1.0 - slo
    short_rate = F.col("n_errors").cast("double") / F.col("n_total")
    long_rate = F.col("long_errors").cast("double") / F.col("long_total")
    return (
        hourly.withColumnRenamed("h", "hour_epoch")
        .join(trailing, "hour_epoch")
        .select(
            "hour_epoch",
            "n_total",
            "n_errors",
            (short_rate / F.lit(budget)).alias("short_burn"),
            (long_rate / F.lit(budget)).alias("long_burn"),
            (
                (short_rate / F.lit(budget) > 1.0)
                & (long_rate / F.lit(budget) > 1.0)
            ).alias("alert"),
        )
        .orderBy("hour_epoch")
    )


def theil_sen_trend(events: DataFrame) -> DataFrame:
    """Theil-Sen robust trend of the daily event-count series — the
    slope estimate that shrugs off outlier days (a single traffic
    spike drags OLS, but the MEDIAN of all pairwise slopes moves only
    when half the data does; 29.3% breakdown point): slope in
    events/day, plus the median-of-residuals intercept.

    The day axis is BOUNDED (observation span), so the pairwise-slope
    set is (days choose 2) — quadratic in DAYS, not rows (30 days =
    435 pairs; even a decade is ~6.7M — trivial). Counts come from one
    partial agg over the full zero-filled spine; the medians are exact
    rank-selects (low+high midpoint for even counts, matching DuckDB's
    median()) over deterministic rationals. Slope ties order
    identically in both engines — double division of exact ints."""
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("long")
    counts = (
        events.filter(F.col("ts").isNotNull())
        .select(day.alias("day_no"))
        .groupBy("day_no")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    bounds = counts.agg(F.min("day_no").alias("d0"), F.max("day_no").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day_no")
    )
    filled = spine.join(counts, "day_no", "left").select(
        "day_no", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    ).localCheckpoint(eager=False)
    # barrier (r12 optimization): the zero-filled day spine is bounded
    # by the observation span but its lineage scans the full event set;
    # it feeds both slope sides, the residual pass and the n_days agg —
    # without the barrier the event aggregation re-ran in every branch
    # (measured plan: 88 exchanges / 50 scans).
    a = filled.select(F.col("day_no").alias("da"), F.col("cnt").alias("ca"))
    b = filled.select(F.col("day_no").alias("db"), F.col("cnt").alias("cb"))
    slopes = (
        a.join(b, F.col("da") < F.col("db"))
        .select(
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / (F.col("db") - F.col("da")).cast("double")
            ).alias("slope")
        )
        # barrier: (days choose 2) rows, read by the median's rank pass
        # and its count agg
        .localCheckpoint(eager=False)
    )
    # exact median: average of the values at sorted ranks
    # floor((n+1)/2) and floor(n/2)+1 (equal when n is odd) — the
    # DuckDB median() convention; ranks via the two-phase dense index
    from sqlstreamstore_spark.operators.positions import with_dense_global_index

    def _median(df, col, out):
        n_df = F.broadcast(df.agg(F.count("*").cast("long").alias("__n")))
        ranked = with_dense_global_index(df, [F.col(col)], "__ix").crossJoin(n_df)
        lo = F.floor((F.col("__n") + 1) / 2)
        hi = F.floor(F.col("__n") / 2) + 1
        return ranked.filter(
            (F.col("__ix") + 1 == lo) | (F.col("__ix") + 1 == hi)
        ).agg(F.avg(col).alias(out), F.max("__n").alias(out + "_n"))

    med = _median(slopes, "slope", "slope_per_day")
    resid = filled.crossJoin(F.broadcast(med)).select(
        "slope_per_day",
        F.col("slope_per_day_n").alias("n_pairs"),
        (
            F.col("cnt").cast("double") - F.col("slope_per_day") * F.col("day_no")
        ).alias("r"),
    )
    med_r = _median(resid.select("r"), "r", "intercept")
    return (
        med.crossJoin(F.broadcast(med_r))
        .crossJoin(F.broadcast(filled.agg(F.count("*").cast("long").alias("n_days"))))
        .select(
            F.col("slope_per_day_n").alias("n_pairs"),
            "n_days",
            "slope_per_day",
            "intercept",
        )
    )


def alert_episodes(events: DataFrame, slo: float = 0.75, long_hours: int = 6) -> DataFrame:
    """Alert-episode accounting over the multiwindow burn-rate series —
    what the on-call review actually reads: how many distinct paging
    EPISODES (runs of consecutive alerting hours), how long the worst
    one lasted, total alerting hours, and the flap count (alert
    state transitions — high flap = thresholds too twitchy). Composes
    :func:`error_burn_rate` with the gaps-and-islands trick on the
    hour axis (hour - row_number constant within a run).

    All-integer single-row output. Scale shape: the burn series is
    already bounded by the time axis; episodes add one window + two
    tiny aggs."""
    from sqlstreamstore_spark.operators.positions import with_dense_global_index

    # barrier (r12 optimization): the burn series feeds the alert
    # filter AND the n_hours agg — bounded by the hour axis
    burn = error_burn_rate(events, slo=slo, long_hours=long_hours).localCheckpoint(
        eager=False
    )
    alerts = burn.filter(F.col("alert")).select("hour_epoch")
    islands = with_dense_global_index(
        alerts, [F.col("hour_epoch")], "__ix"
    ).withColumn("grp", F.col("hour_epoch") - F.col("__ix"))
    eps = islands.groupBy("grp").agg(F.count("*").cast("long").alias("len"))
    summary = eps.agg(
        F.count("*").cast("long").alias("n_episodes"),
        F.coalesce(F.max("len"), F.lit(0)).cast("long").alias("longest_episode"),
        F.coalesce(F.sum("len"), F.lit(0)).cast("long").alias("alert_hours"),
    )
    total = burn.agg(F.count("*").cast("long").alias("n_hours"))
    return summary.crossJoin(F.broadcast(total)).select(
        "n_hours", "n_episodes", "longest_episode", "alert_hours",
        # upper bound on state transitions: 2 per episode (entry +
        # exit). An episode still open at series end has no exit, so
        # the true flap count can be max_flaps - 1 — the column is the
        # bound its name says, not the exact count.
        (F.lit(2) * F.col("n_episodes")).cast("long").alias("max_flaps"),
    )


def holt_forecast(
    events: DataFrame, alpha: float = 0.5, beta: float = 0.3
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing over each
    event type's daily count series — the load-forecast a capacity
    planner runs over the ingest log (Holt 1957):

        l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}

    deterministic init l_0 = y_0, b_0 = 0 (the first observation has
    no forecast error). Emits the final state, the one-step-ahead
    forecast l_T + b_T, and the in-sample SSE of one-step forecasts.

    Linear recurrences are not window-expressible, but per-type DAILY
    series are bounded (days, not events): collapse to daily counts
    (one partial-agg groupBy — the only event-scale pass), collect
    each type's series (≤ thousands of doubles), and run the fold as
    one `aggregate` expression. Both engines fold left over the same
    element order (sort_array ↔ list_sort) with the same IEEE
    expression tree (the pass_at_k precedent with struct state), so
    the gate hash-matches at zero tolerance."""
    a, ia = float(alpha), 1.0 - float(alpha)
    b, ib = float(beta), 1.0 - float(beta)
    daily = events.groupBy(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("double").alias("y"))
    ser = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("arr0"),
        F.count("*").cast("long").alias("n_days"),
    )
    arr = F.transform(
        F.col("arr0"),
        lambda x: F.struct(
            x["y"].alias("l"), F.lit(0.0).alias("b"), F.lit(0.0).alias("sse")
        ),
    )

    def step(acc, x):
        lp, bp = acc["l"], acc["b"]
        y = x["l"]
        lnew = F.lit(a) * y + F.lit(ia) * (lp + bp)
        # l_new inlined twice: neither engine's lambda has let-binding,
        # and an identical expression tree is what makes the doubles
        # bit-identical
        bnew = (
            F.lit(b) * ((F.lit(a) * y + F.lit(ia) * (lp + bp)) - lp)
            + F.lit(ib) * bp
        )
        err = y - (lp + bp)
        return F.struct(
            lnew.alias("l"),
            bnew.alias("b"),
            (acc["sse"] + err * err).alias("sse"),
        )

    ser = ser.withColumn("arr", arr)
    st = F.aggregate(
        F.slice(F.col("arr"), 2, F.size("arr") - 1),
        F.element_at(F.col("arr"), 1),
        step,
    )
    return ser.select(
        "event_type",
        "n_days",
        st["l"].alias("level"),
        st["b"].alias("trend"),
        (st["l"] + st["b"]).alias("forecast_next"),
        st["sse"].alias("sse"),
    ).orderBy("event_type")


def dft_periodogram(events: DataFrame, max_k: int = 7) -> DataFrame:
    """Seasonality detection over each event type's daily count
    series: single-sided DFT amplitudes at the first ``max_k``
    harmonics — amp_k = √(C_k² + S_k²)/T with C_k = Σ_t y_t·cos(2πkt/T)
    (detected period ≈ T/k days). The "is ingest weekly-periodic?"
    monitor over the event log, and the frequency-domain complement of
    `seasonal_profile`/`daily_autocorr`.

    Shape: ONE event-scale partial-agg groupBy to daily counts; the
    DFT folds over each type's bounded series (the holt_forecast
    pattern). Per-harmonic angular factors 2πk are Python-repr
    literals shared with the oracle; contributions fold sequentially
    in identical element order. cos/sin go through each engine's libm
    (ulp differences amplified by counts), so BOTH engines round the
    amplitudes to 6 decimals — the stats_corr_regr float pattern."""
    import math

    daily = events.groupBy(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("double").alias("y"))
    ser = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("arr"),
        F.count("*").cast("long").alias("n_days"),
    )
    tdub = F.col("n_days").cast("double")
    cols = [F.col("event_type"), F.col("n_days")]
    for k in range(1, max_k + 1):
        w = 2.0 * math.pi * k
        y_i = lambda i: F.element_at(  # noqa: E731
            F.col("arr"), (i + 1).cast("int")
        )["y"]
        c = F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.col("n_days") - 1),
                lambda i: y_i(i) * F.cos(F.lit(w) * i.cast("double") / tdub),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        s = F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.col("n_days") - 1),
                lambda i: y_i(i) * F.sin(F.lit(w) * i.cast("double") / tdub),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        cols.append(
            F.round(F.sqrt(c * c + s * s) / tdub, 6).alias(f"amp_{k}")
        )
    return ser.select(*cols).orderBy("event_type")


def mann_kendall_trend(events: DataFrame) -> DataFrame:
    """Mann-Kendall monotone-trend test over each event type's daily
    count series (Mann 1945, Kendall's τ form) — the significance
    companion to `theil_sen_trend`'s slope estimate: S = Σ_{i<j}
    sign(y_j − y_i) with the tie-corrected variance
    Var(S) = (n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)) / 18 and the
    continuity-corrected z = (S∓1)/√Var.

    Exactness: S and both variance numerators are EXACT BIGINTs from
    a bounded per-type pair join (days², never events²); the only
    floats are one /18 divide and the final z (sqrt is libm — both
    engines round z to 6, the corr_regr pattern). One event-scale
    partial agg; everything after runs on the bounded day axis."""
    daily = events.groupBy(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("y"))
    a = daily.select("event_type", F.col("day").alias("d1"), F.col("y").alias("y1"))
    b = daily.select("event_type", F.col("day").alias("d2"), F.col("y").alias("y2"))
    s = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("y2") - F.col("y1")).cast("long"))
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("event_type").agg(F.count("*").cast("long").alias("n_days"))
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("long").alias("tie_term")
        )
    )
    nn = F.col("n_days")
    var_num = (nn * (nn - 1) * (2 * nn + 5) - F.col("tie_term")).cast("long")
    var_s = var_num.cast("double") / F.lit(18.0)
    z = F.when(
        F.col("s_stat") > 0,
        (F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
    ).when(
        F.col("s_stat") < 0,
        (F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
    ).otherwise(F.lit(0.0))
    return (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            var_s.alias("var_s"),
            F.round(z, 6).alias("z"),
        )
        .orderBy("event_type")
    )


def hodges_lehmann_location(events: DataFrame) -> DataFrame:
    """Hodges-Lehmann robust location estimate per event type (Hodges
    & Lehmann 1963): the median of the Walsh averages (y_i + y_j)/2
    over all day pairs i ≤ j of the daily count series — the
    rank-based "typical daily volume" that one spike day cannot drag
    (breakdown ~29%), the estimation companion to the Mann-Kendall
    test and the Theil-Sen slope (which is the SAME construction on
    pairwise slopes).

    Exactness: Walsh SUMS are exact BIGINTs from a bounded per-type
    pair join (days²); the median is exact SELECTION over the sorted
    sums (odd count: the middle; even: the mean of the two middles),
    and every division is by 2 — exact in doubles. Zero-tolerance
    oracle; one event-scale partial agg, everything else on the
    bounded day axis."""
    daily = events.groupBy(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("y"))
    a = daily.select("event_type", F.col("day").alias("d1"), F.col("y").alias("y1"))
    b = daily.select("event_type", F.col("day").alias("d2"), F.col("y").alias("y2"))
    walsh = (
        a.join(b, "event_type")
        .filter(F.col("d1") <= F.col("d2"))
        .select("event_type", (F.col("y1") + F.col("y2")).alias("w"))
    )
    g = walsh.groupBy("event_type").agg(
        F.sort_array(F.collect_list("w")).alias("arr"),
        F.count("*").cast("long").alias("m"),
    )
    mid_hi = (F.col("m") / 2 + 1).cast("int")
    mid_lo = (F.col("m") / 2).cast("int")
    odd_mid = ((F.col("m") + 1) / 2).cast("int")
    median_sum = F.when(
        F.col("m") % 2 == 1,
        F.element_at(F.col("arr"), odd_mid).cast("double"),
    ).otherwise(
        (
            F.element_at(F.col("arr"), mid_lo)
            + F.element_at(F.col("arr"), mid_hi)
        ).cast("double")
        / F.lit(2.0)
    )
    return g.select(
        "event_type",
        F.col("m").alias("n_pairs"),
        (median_sum / F.lit(2.0)).alias("hl_location"),
    ).orderBy("event_type")
