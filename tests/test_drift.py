"""Drift operators: known-answer exact KS, the binned<=exact bound,
chi2 on a planted contingency shift, and the no-single-partition-
over-values plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlstreamstore_spark.analytics.drift import (
    chi2_drift,
    ks_drift,
    ks_drift_binned,
)
from sqlstreamstore_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_ks_known_answer(spark):
    """Hand-computed two-sample KS: a = {1,2,3,4}, b = {3,4,5,6}.
    At v=2: F_a=2/4, F_b=0 -> D=0.5 (the max). d_num = |2*4 - 0*4| = 8."""
    a = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "x long")
    b = spark.createDataFrame([(v,) for v in (3, 4, 5, 6)], "x long")
    r = ks_drift(a, b, "x").collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    assert int(r.d_num) == 8 and abs(r.ks_d - 0.5) < 1e-12


def test_ks_identical_samples_zero(spark):
    a = spark.createDataFrame([(v,) for v in range(50)], "x long")
    r = ks_drift(a, a, "x").collect()[0]
    assert int(r.d_num) == 0 and r.ks_d == 0.0


def test_ks_binned_bounded_by_exact(spark):
    """Binning can only merge CDF crossings, never create them:
    binned D <= exact D, and with fine bins on a real column it lands
    close (>= half the exact statistic here)."""
    ev = load_table(spark, SF, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "purchase")
    exact = ks_drift(a, b, "value").collect()[0].ks_d
    binned = ks_drift_binned(a, b, "value", n_bins=128).collect()[0].ks_d
    assert binned <= exact + 1e-12, (binned, exact)
    assert binned >= 0.5 * exact, (binned, exact)


def test_chi2_planted_shift(spark):
    """A planted categorical shift: sample a is 90/10 over {x,y},
    sample b is 10/90 — chi2 for the 2x2 table with all margins 100 is
    sum((40)^2/50 * 4) = 128. Identical samples give chi2 = 0."""
    rows_a = [("x",)] * 90 + [("y",)] * 10
    rows_b = [("x",)] * 10 + [("y",)] * 90
    a = spark.createDataFrame(rows_a, "c string")
    b = spark.createDataFrame(rows_b, "c string")
    r = chi2_drift(a, b, "c").collect()[0]
    assert (r.n_a, r.n_b, r.n_categories) == (100, 100, 2)
    assert abs(r.chi2 - 128.0) < 1e-9
    same = chi2_drift(a, a, "c").collect()[0]
    assert same.chi2 == 0.0


def test_ks_exact_no_single_partition_window_over_values(spark):
    """The exact KS cumulative pass must be the two-phase cumsum —
    every Window node in the plan is partitioned (__pid), never a
    global single-partition window over the value axis."""
    import re

    ev = load_table(spark, SF, "events")
    df = ks_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
    )
    p = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    # every Window detail block must carry a partition spec
    for m in re.finditer(r"Arguments: \[sum\(.*?windowspecdefinition\((.*?)\)", p):
        assert "__pid" in m.group(1), m.group(0)[:200]


def test_ks_nulls_dropped_and_empty_side_null(spark):
    """NULLs never reach the CDF axis (Spark and DuckDB even order
    them differently), and an empty side yields ks_d NULL, not NaN."""
    a = spark.createDataFrame([(1,), (2,), (None,)], "x int")
    b = spark.createDataFrame([(1,), (2,), (None,), (None,)], "x int")
    r = ks_drift(a, b, "x").collect()[0]
    assert (r.n_a, r.n_b) == (2, 2) and int(r.d_num) == 0

    empty = spark.createDataFrame([], "x int")
    r = ks_drift(a, empty, "x").collect()[0]
    assert r.ks_d is None


def test_ks_binned_empty_side_null_like_exact(spark):
    """Empty-side contract parity: binned ks_d is NULL (no CDF), never
    the NaN of an unguarded 0/0 double division."""
    import math

    a = spark.createDataFrame([(v,) for v in (1, 2, 3)], "x int")
    empty = spark.createDataFrame([], "x int")
    r = ks_drift_binned(a, empty, "x", n_bins=4).collect()[0]
    assert r.ks_d is None or not math.isnan(r.ks_d)
    assert r.ks_d is None


def test_ks_binned_drops_nulls_like_exact(spark):
    """ADVICE r4: NULLs must not land in bin 0 nor count toward
    n_a/n_b — the binned twin follows the exact-KS NULL discipline, so
    binned <= exact holds on data WITH NULLs too."""
    a = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)] + [(None,)] * 3, "x int")
    b = spark.createDataFrame([(v,) for v in (3, 4, 5, 6)] + [(None,)] * 5, "x int")
    rb = ks_drift_binned(a, b, "x", n_bins=4).collect()[0]
    assert (rb.n_a, rb.n_b) == (4, 4)
    re = ks_drift(a, b, "x").collect()[0]
    assert rb.ks_d <= re.ks_d + 1e-12


def test_histogram_state_drops_nulls(spark):
    from sqlstreamstore_spark.analytics.incremental import histogram_state

    df = spark.createDataFrame([("g", 1.0), ("g", None), ("g", 99.0)],
                               "g string, x double")
    rows = histogram_state(df, ["g"], "x", [50.0]).collect()
    assert sum(r.n for r in rows) == 2  # the NULL row is gone, not bin 0


def test_ks_invariant_under_monotone_transform(spark):
    """Exact-KS property: D depends only on value RANKS, so any strictly
    monotone transform (x -> 2x+1) leaves n, d_num, ks_d identical."""
    import random

    rng = random.Random(7)
    a_vals = [rng.randint(0, 400) for _ in range(300)]
    b_vals = [rng.randint(100, 500) for _ in range(250)]
    a = spark.createDataFrame([(v,) for v in a_vals], "x long")
    b = spark.createDataFrame([(v,) for v in b_vals], "x long")
    base = ks_drift(a, b, "x").collect()[0]
    a2 = a.selectExpr("x * 2 + 1 AS x")
    b2 = b.selectExpr("x * 2 + 1 AS x")
    mono = ks_drift(a2, b2, "x").collect()[0]
    assert (base.n_a, base.n_b, int(base.d_num), base.ks_d) == (
        mono.n_a, mono.n_b, int(mono.d_num), mono.ks_d)
    assert base.ks_d > 0  # the planted shift is detectable


def test_corpus_diff_planted_statuses(spark):
    """Planted diff: 2 added, 1 removed, 1 changed, 2 unchanged."""
    from sqlstreamstore_spark.analytics.quality import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "C"), (5, "e"), (6, "f")],
        "doc_id long, text string")
    got = {r.status: r.n for r in corpus_diff(old, new).collect()}
    assert got == {"added": 2, "removed": 1, "changed": 1, "unchanged": 2}


def test_key_skew_report_planted_hot_key(spark):
    """A key holding half the rows reports skew_factor = max/avg and
    leads the top-keys CSV."""
    from sqlstreamstore_spark.analytics.quality import key_skew_report

    rows = [(7,)] * 50 + [(i,) for i in range(10)]  # 60 rows, 10 keys, key 7 = 51
    df = spark.createDataFrame(rows, "k long")
    r = key_skew_report(df, "k", top_n=3).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_key_rows) == (60, 10, 51)
    assert abs(r.skew_factor - 51 / (60 / 10)) < 1e-6
    assert r.top_keys.startswith("7:51,")


def test_robust_outliers_immune_to_planted_spikes(spark):
    """The robust-statistics claim: plant 3 extreme spikes in a tight
    group — median/MAD barely move and exactly the spikes are counted;
    a mean/stddev z-score at the same k would see a stddev inflated by
    the spikes themselves. Symmetric tight data yields MAD ~ 1."""
    from sqlstreamstore_spark.analytics.quality import robust_outlier_bounds

    base = [("g", float(50 + (i % 5) - 2)) for i in range(100)]  # 48..52
    spikes = [("g", 1000.0), ("g", -500.0), ("g", 2000.0)]
    df = spark.createDataFrame(base + spikes, "t string, v double")
    r = robust_outlier_bounds(df, "t", "v", k=3.0).collect()[0]
    assert r.n == 103
    assert 48 <= r.median <= 52
    assert 0 < r.mad <= 2
    assert r.n_outliers == 3

    clean = spark.createDataFrame(base, "t string, v double")
    rc = robust_outlier_bounds(clean, "t", "v", k=3.0).collect()[0]
    assert rc.n_outliers == 0
