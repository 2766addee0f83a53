"""Distribution-drift detection between two samples — the monitoring
pass a training-data pipeline runs between corpus snapshots, sources,
or time windows ("did last month's crawl change the length/quality/
value distribution?").

Three operators, one design rule each:

- ``ks_drift``: EXACT two-sample Kolmogorov–Smirnov. D = max over the
  pooled distinct values of |F_a(v) − F_b(v)|. Computed without a
  single-partition window (the naive cumulative-count window is the
  NTILE failure mode): per-value counts groupBy, then the two-phase
  global cumsum (``operators/positions.with_global_cumsum`` — range
  partition + broadcast prefix offsets). The statistic itself is kept
  in INTEGER arithmetic until the last step: D = max|cna·Nb − cnb·Na| /
  (Na·Nb), with the numerator an exact DECIMAL(38,0) — the DuckDB
  oracle reproduces it bit-for-bit with no float-order tolerance (the
  GATE projection casts it to DOUBLE only because DuckDB's pandas
  bridge renders every DECIMAL as float64).
- ``ks_drift_binned``: the 100 TB twin. Exact KS still needs a shuffle
  keyed on every distinct value; at petabyte cardinality you bin first.
  Boundaries come from approx_percentile over the POOLED sample, bin
  counts from one partial-agg scan per side, and the cumulative pass
  runs over ≤ n_bins rows — bounded state regardless of corpus size
  (the same exact-oracle/approx-production split as
  stats_ntile_deciles). Binned D ≤ exact D (binning can only merge
  crossings), pinned in pytest.
- ``chi2_drift``: Pearson χ² over a CATEGORICAL column's contingency
  table — one groupBy, partial-aggregable, with the statistic rounded
  on both engines (float sums of per-cell terms).

Reference parity: none (monitoring belongs to the pipeline surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _per_value_counts(a: DataFrame, b: DataFrame, col: str) -> DataFrame:
    """NULLs are dropped on BOTH sides: a NULL has no place on a CDF
    axis, and the engines even disagree on where it would sort (Spark
    ASC is NULLS FIRST, DuckDB is NULLS LAST) — silently binning it
    would make the statistic engine-dependent."""
    va = a.select(F.col(col).alias("v"), F.lit(1).alias("ca"), F.lit(0).alias("cb"))
    vb = b.select(F.col(col).alias("v"), F.lit(0).alias("ca"), F.lit(1).alias("cb"))
    return (
        va.unionByName(vb)
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    )


def ks_drift(a: DataFrame, b: DataFrame, col: str) -> DataFrame:
    """Exact two-sample KS over ``col``. One row:
    (n_a, n_b, d_num, ks_d) with d_num = max|cna·Nb − cnb·Na| exact and
    ks_d = d_num / (Na·Nb) as the usual [0, 1] statistic."""
    from sqlstreamstore_spark.operators.positions import with_global_cumsums

    per_v = _per_value_counts(a, b, col)
    # both CDFs in ONE two-phase pass (one range shuffle, one window)
    cum = with_global_cumsums(per_v, ["v"], {"na": "cna", "nb": "cnb"})
    totals = cum.agg(
        F.max("cna").cast("long").alias("n_a"),
        F.max("cnb").cast("long").alias("n_b"),
    )
    diff = (
        F.abs(
            F.col("cna").cast(_DEC) * F.col("n_b").cast(_DEC)
            - F.col("cnb").cast(_DEC) * F.col("n_a").cast(_DEC)
        )
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.max(diff).cast(_DEC).alias("d_num"),
        )
        .withColumn(
            "ks_d",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            ),  # an empty side has no CDF — ks_d is NULL, not NaN
        )
    )


def ks_drift_oracle_sql(a_pred: str, b_pred: str, col: str, table: str) -> str:
    """DuckDB twin: same per-value counts, same cumulative sums, same
    integer numerator. ``a_pred``/``b_pred`` select the two samples
    from ``table``."""
    return f"""
WITH per_v AS (
  SELECT {col} AS v,
         CAST(sum(CASE WHEN {a_pred} THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN {b_pred} THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM {table} WHERE (({a_pred}) OR ({b_pred})) AND {col} IS NOT NULL
  GROUP BY {col}),
cum AS (
  SELECT v,
         CAST(sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cna,
         CAST(sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cnb
  FROM per_v),
tot AS (SELECT max(cna) AS n_a, max(cnb) AS n_b FROM cum)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(max(abs(CAST(cna AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
                    - CAST(cnb AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0))))
            AS DOUBLE) AS d_num,
       CAST(max(abs(CAST(cna AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
                    - CAST(cnb AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0))))
            AS DOUBLE)
         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_d
FROM cum CROSS JOIN tot
GROUP BY n_a, n_b
"""


def ks_drift_binned(
    a: DataFrame, b: DataFrame, col: str, n_bins: int = 128, accuracy: int = 10_000
) -> DataFrame:
    """Binned KS — the bounded-state production twin. Bin boundaries
    from approx_percentile over the pooled sample (GK sketch, partial-
    aggregable); one conditional-agg scan per side; the cumulative pass
    runs over ≤ n_bins rows (a window over bins is O(n_bins) state —
    scale-independent). Returns the same schema as ks_drift minus the
    exact numerator."""
    from pyspark.sql import Window

    # NULL discipline matches ks_drift/_per_value_counts: a NULL has no
    # place on a CDF axis. Without this filter a NULL value would make
    # every bounds comparison NULL, F.filter would drop all elements,
    # and the row would silently land in bin 0 AND count toward n_a/n_b
    # — which can violate the pinned binned ≤ exact invariant.
    a = a.filter(F.col(col).isNotNull())
    b = b.filter(F.col(col).isNotNull())
    pooled = a.select(F.col(col).alias("v")).unionByName(b.select(F.col(col).alias("v")))
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = pooled.agg(
        F.percentile_approx("v", F.array([F.lit(q) for q in qs]), F.lit(accuracy)).alias(
            "bounds"
        )
    )

    def binned(df: DataFrame, cnt_col: str) -> DataFrame:
        v = F.col(col).cast("double")
        return (
            df.crossJoin(F.broadcast(bounds))
            .withColumn("bin", F.size(F.filter("bounds", lambda x: v > x)))
            .groupBy("bin")
            .agg(F.count("*").alias(cnt_col))
        )

    ca = binned(a, "na")
    cb = binned(b, "nb")
    per_bin = ca.join(cb, "bin", "full_outer").select(
        F.col("bin"),
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_bin.withColumn("cna", F.sum("na").over(w)).withColumn(
        "cnb", F.sum("nb").over(w)
    )
    totals = cum.agg(
        F.max("cna").cast("long").alias("n_a"), F.max("cnb").cast("long").alias("n_b")
    )
    diff = F.abs(
        F.col("cna").cast(_DEC) * F.col("n_b").cast(_DEC)
        - F.col("cnb").cast(_DEC) * F.col("n_a").cast(_DEC)
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.max(diff).cast(_DEC).alias("d_num"),
        )
        .withColumn(
            "ks_d",
            # same empty-side contract as ks_drift: no CDF -> NULL, not
            # the NaN an unguarded 0/0 double division would produce
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            ),
        )
        .select("n_a", "n_b", "ks_d")
    )


def chi2_drift(a: DataFrame, b: DataFrame, col: str, round_digits: int = 6) -> DataFrame:
    """Pearson χ² over the 2×K contingency table of a categorical
    column — one partial-agg scan, statistic rounded on both engines
    (the stats_corr_regr float pattern). Output one row:
    (n_a, n_b, n_categories, chi2)."""
    per_c = _per_value_counts(a, b, col)
    # NB: Spark resolves case-insensitively by default — totals must not
    # collide with the per-value na/nb
    tot = per_c.agg(
        F.sum("na").cast("double").alias("tot_a"),
        F.sum("nb").cast("double").alias("tot_b"),
    )
    x = per_c.crossJoin(F.broadcast(tot))
    rowtot = (F.col("na") + F.col("nb")).cast("double")
    grand = F.col("tot_a") + F.col("tot_b")
    ea = rowtot * F.col("tot_a") / grand
    eb = rowtot * F.col("tot_b") / grand
    term = (F.col("na") - ea) ** 2 / ea + (F.col("nb") - eb) ** 2 / eb
    return x.agg(
        F.sum("na").cast("long").alias("n_a"),
        F.sum("nb").cast("long").alias("n_b"),
        F.count("*").cast("long").alias("n_categories"),
        F.round(F.sum(term), round_digits).alias("chi2"),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    accuracy: int = 10_000,
    round_digits: int = 6,
) -> DataFrame:
    """Population Stability Index — the standard production drift alarm
    (PSI < 0.1 stable / 0.1-0.25 watch / > 0.25 act): bin boundaries
    from the REFERENCE population's quantiles (the PSI convention — the
    monitored model saw the reference distribution), both sides counted
    into those fixed bins, PSI = Σ (p_cur − p_ref)·ln(p_cur / p_ref).

    Empty-bin discipline: half-count smoothing p = (n + 0.5) /
    (N + 0.5·bins) — deterministic on both engines, no ±∞ terms, and
    the statistic stays comparable across refreshes (the epsilon-free
    convention silently drops bins and understates drift).

    Scale shape: identical to ks_drift_binned — the GK sketch for
    boundaries (rank-exact at gate accuracy), one conditional-agg scan
    per side, the final fold over ≤ n_bins rows. ln passes through
    libm, so both engines round (stats_corr_regr pattern).

    Output one row: (n_ref, n_cur, n_bins, psi)."""
    ref = ref.filter(F.col(col).isNotNull())
    cur = cur.filter(F.col(col).isNotNull())
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = ref.agg(
        F.percentile_approx(
            F.col(col).cast("double"), F.array([F.lit(q) for q in qs]), F.lit(accuracy)
        ).alias("bounds")
    )

    def binned(df: DataFrame, cnt: str) -> DataFrame:
        v = F.col(col).cast("double")
        return (
            df.crossJoin(F.broadcast(bounds))
            .withColumn("bin", F.size(F.filter("bounds", lambda x: v > x)))
            .groupBy("bin")
            .agg(F.count("*").alias(cnt))
        )

    per_bin = (
        binned(ref, "nr").join(binned(cur, "nc"), "bin", "full_outer").select(
            "bin",
            F.coalesce("nr", F.lit(0)).alias("nr"),
            F.coalesce("nc", F.lit(0)).alias("nc"),
        )
    )
    tot = per_bin.agg(
        F.sum("nr").cast("long").alias("n_ref"), F.sum("nc").cast("long").alias("n_cur")
    )
    x = per_bin.crossJoin(F.broadcast(tot))
    pr = (F.col("nr").cast("double") + F.lit(0.5)) / (
        F.col("n_ref").cast("double") + F.lit(0.5 * n_bins)
    )
    pc = (F.col("nc").cast("double") + F.lit(0.5)) / (
        F.col("n_cur").cast("double") + F.lit(0.5 * n_bins)
    )
    term = (pc - pr) * F.log(pc / pr)
    return x.agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.count("*").cast("long").alias("n_bins"),
        F.round(F.sum(term), round_digits).alias("psi"),
    )


def lsh_histogram_drift(embeddings: DataFrame, bits: int = 8) -> DataFrame:
    """Embedding-distribution drift via LSH-bucket HISTOGRAMS (round
    10): bucket both snapshots with the SHARED random-hyperplane
    signature (similarity.lsh_bucket_signatures' expression) and
    report the total-variation distance between the two bucket
    distributions — the whole-space complement of
    `drift_embedding_centroids` (per-label means miss a drift that
    reshuffles mass between modes while every centroid stays put).
    The deterministic vec_id-parity split stands in for the two
    snapshots, as in the centroid monitor.

    Exactness: the t-closeness integer-numerator trick — per bucket
    |n_a·N_b − n_b·N_a| sums order-free in exact BIGINT, ONE divide
    by 2·N_a·N_b lands the distance; zero tolerance, no float
    accumulation. Scale: one signature projection + one (side,
    bucket) partial-agg count; output is one row regardless of N
    (bucket axis bounded by 2^bits)."""
    from sqlstreamstore_spark.analytics.similarity import (
        lsh_sigs_norm_exact_arrow,
    )

    dim = len(embeddings.select("embedding").first()[0])
    # r12 (guide §4): bit-identical Arrow signature pass (the bucket is
    # integer-exact under the same sign folds; norm column unused)
    sides = lsh_sigs_norm_exact_arrow(
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ),
        dim=dim,
        bits=bits,
    ).select((F.col("vec_id") % 2).alias("side"), "bucket")
    cell = sides.groupBy("side", "bucket").agg(
        F.count("*").cast("long").alias("n")
    )
    a = cell.filter(F.col("side") == 0).select(
        "bucket", F.col("n").alias("n_a")
    )
    bfr = cell.filter(F.col("side") == 1).select(
        "bucket", F.col("n").alias("n_b")
    )
    tot = cell.groupBy("side").agg(F.sum("n").cast("long").alias("t"))
    ta = tot.filter(F.col("side") == 0).select(F.col("t").alias("t_a"))
    tb = tot.filter(F.col("side") == 1).select(F.col("t").alias("t_b"))
    grid = (
        a.join(bfr, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        )
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    num = F.abs(F.col("n_a") * F.col("t_b") - F.col("n_b") * F.col("t_a"))
    return grid.agg(
        F.max("t_a").alias("n_vecs_a"),
        F.max("t_b").alias("n_vecs_b"),
        F.count("*").cast("long").alias("n_buckets"),
        (
            F.sum(num).cast("double")
            / (
                F.lit(2.0)
                * F.max("t_a").cast("double")
                * F.max("t_b").cast("double")
            )
        ).alias("tvd"),
    )
