"""Model-evaluation audits over corpus-scale score columns.

A training-data pipeline doesn't just APPLY a quality classifier
(`pipeline.classifier_score`) — it has to audit the classifier
against labels before trusting it to gate 100 TB of documents. The
two canonical audits are discrimination (ROC-AUC) and calibration
(reliability bins). Both are exact, one-pass, shuffle-bounded
computations here — no sklearn, no driver-side sort.

Float discipline (zero-tolerance DuckDB hash-match): every division
is a single IEEE divide of two exact BIGINTs; every aggregate that
feeds a reported value is an integer SUM / MIN / MAX (order-free) —
there is no floating-point accumulation anywhere in this module.

Label convention: the synthetic corpus has no explicit relevance
label, so the audits use ``lang = 'en'`` as the binary target — the
classifier's md5-derived token weights are label-blind, which makes
AUC ≈ 0.5 the *expected* outcome and the audit a null-hypothesis
check of the whole measurement chain.

Reference parity: the reference engine has no evaluation tier at all
(its analytics stop at stream reads); these operators extend the
LLM-pipeline surface the way `analytics/drift.py` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlstreamstore_spark.operators.positions import with_global_cumsum


def _classifier_scored(documents: DataFrame) -> DataFrame:
    """(doc_id, lang, n_tokens, score_num, score, y) — the md5-weight
    linear classifier of `pipeline.classifier_score`, plus the binary
    en-label. Kept in exact integer form (score_num, n_tokens) so
    downstream ops can choose their own float boundary."""
    toks = F.split(F.col("text"), " ")
    w = lambda t: (
        F.conv(F.substring(F.md5(F.concat(F.lit("clf:"), t)), 1, 8), 16, 10)
        .cast("long")
        % 1001
        - 500
    )
    return documents.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + w(t)).alias(
            "score_num"
        ),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).cast("long").alias("y"),
    ).withColumn("score", F.col("score_num") / F.col("n_tokens"))


def roc_auc(documents: DataFrame) -> DataFrame:
    """Exact ROC-AUC of the quality-classifier score against the
    binary en-label, via the Mann-Whitney rank-sum identity with full
    tie handling:

        AUC = [ Σ_s  p(s) · ( 2·N_neg(<s) + n(s) ) ] / ( 2·P·N )

    where p(s)/n(s) are the positive/negative counts at distinct
    score s and N_neg(<s) the negatives strictly below s. Ties
    contribute n(s)/2 each — the 2× numerator keeps the whole sum in
    BIGINT, so the only float op is the final divide.

    Scale shape: ONE partial-agg shuffle keyed on the score (distinct
    scores, not rows, cross the wire) + the two-phase global cumsum of
    `operators/positions.py` — no single-partition window, no sort of
    the raw corpus. At 100 TB with ~billions of distinct scores the
    cumsum's range-partitioner still spreads the walk evenly.
    """
    g = (
        _classifier_scored(documents)
        .groupBy("score")
        .agg(
            F.sum("y").cast("long").alias("p"),
            (F.count("*") - F.sum("y")).cast("long").alias("n"),
        )
    )
    c = with_global_cumsum(g, [F.col("score")], "n", "cum_neg")
    return (
        c.select(
            "p",
            "n",
            (F.col("p") * (F.lit(2) * (F.col("cum_neg") - F.col("n")) + F.col("n"))).alias(
                "term"
            ),
        )
        .agg(
            F.sum("p").cast("long").alias("n_pos"),
            F.sum("n").cast("long").alias("n_neg"),
            F.count("*").cast("long").alias("n_scores"),
            F.sum("term").cast("long").alias("auc_num_2x"),
        )
        .select(
            "n_pos",
            "n_neg",
            "n_scores",
            (
                F.col("auc_num_2x").cast("double")
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
            ).alias("auc"),
        )
    )


def calibration_bins(documents: DataFrame) -> DataFrame:
    """Reliability diagram for the quality-classifier score: bucket
    the score axis into fixed-width bins (width 100 over the weight
    range [-500, 500]) and report the observed positive rate per bin.
    A calibrated score has pos_rate monotone in the bin; the md5
    classifier is label-blind so the expected shape is flat ≈ P/(P+N)
    — deviations flag measurement bugs, class imbalance drift, or
    label leakage into the score.

    Every reported aggregate is order-free (integer counts, MIN/MAX
    of IEEE-exact score doubles); pos_rate and avg_tokens are single
    divides of exact BIGINTs. Scale shape: one partial-agg shuffle on
    ≤ 11 bucket keys — bin stats combine map-side, the reduce sees a
    handful of rows regardless of corpus size.
    """
    s = _classifier_scored(documents)
    bucket = F.floor(F.col("score") / F.lit(100.0)).cast("long")
    return (
        s.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_pos"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.sum("n_tokens").cast("long").alias("tok_sum"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n_docs")).alias("pos_rate"),
            "min_score",
            "max_score",
            (F.col("tok_sum").cast("double") / F.col("n_docs")).alias("avg_tokens"),
        )
        .orderBy("bucket")
    )


def classification_report(documents: DataFrame) -> DataFrame:
    """Thresholded classification metrics of the md5-weight linear
    classifier against the binary en-label: confusion counts plus
    accuracy, precision, recall, F1 and Cohen's kappa — the standard
    model-eval scorecard next to :func:`roc_auc`'s ranking view. The
    decision rule is score >= 0, tested as ``score_num >= 0`` (exact
    integer sign — n_tokens > 0 always, so the float score never
    enters the comparison).

    Every metric is a single divide of exact BIGINTs: F1 via the
    2tp/(2tp+fp+fn) identity (no compounding of precision/recall
    floats) and kappa via the cross-multiplied form

        kappa = (N(tp+tn) - [(tp+fp)(tp+fn) + (fn+tn)(fp+tn)])
              / (N^2     - [(tp+fp)(tp+fn) + (fn+tn)(fp+tn)])

    so both engines compute double(int)/double(int) — zero-tolerance
    oracle. Shape: one map-side partial agg to a single row."""
    s = _classifier_scored(documents).select(
        F.when(F.col("score_num") >= 0, 1).otherwise(0).cast("long").alias("pred"),
        "y",
    )
    cnt = lambda p, t: F.sum(
        F.when((F.col("pred") == p) & (F.col("y") == t), 1).otherwise(0)
    ).cast("long")
    one = s.agg(
        cnt(1, 1).alias("tp"),
        cnt(1, 0).alias("fp"),
        cnt(0, 1).alias("fn"),
        cnt(0, 0).alias("tn"),
    )
    n = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    pe_num = (F.col("tp") + F.col("fp")) * (F.col("tp") + F.col("fn")) + (
        F.col("fn") + F.col("tn")
    ) * (F.col("fp") + F.col("tn"))
    return one.select(
        "tp",
        "fp",
        "fn",
        "tn",
        ((F.col("tp") + F.col("tn")).cast("double") / n).alias("accuracy"),
        (
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
        ).alias("prec"),
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))).alias("recall"),
        (
            (F.lit(2) * F.col("tp")).cast("double")
            / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"))
        ).alias("f1"),
        (
            (n * (F.col("tp") + F.col("tn")) - pe_num).cast("double")
            / (n * n - pe_num)
        ).alias("kappa"),
    )


def ab_test_report(events: DataFrame) -> DataFrame:
    """Two-sample experiment readout — the A/B scorecard run on every
    flag flip: users hash-split into control/treatment (deterministic
    ``user_id % 2`` so the oracle can replay the assignment), the
    value metric compared with Welch's unequal-variance t statistic
    and the Welch-Satterthwaite degrees of freedom (the robust default
    — pooled-variance t is wrong exactly when the treatment moves the
    variance too).

    Metric values are exact BIGINT cents; all three moments per arm
    accumulate integer map-side, so mean/variance/t/df are pure
    functions of six BIGINTs evaluated in identical order in both
    engines — zero-tolerance oracle. Shape: one partial agg to a
    single row.

    Degenerate arms are diagnosable, not NaN: an empty arm NULLs its
    mean (and diff), an arm with fewer than two users NULLs welch_t /
    welch_df (variance is undefined at n<=1), and — ADVICE r7 #4 —
    all-constant arms (zero pooled variance) also NULL welch_t /
    welch_df instead of dividing by sqrt(0): Spark's non-ANSI divide
    yields NULL there while recent DuckDB returns inf/nan, so the
    guard pins ONE cross-engine behavior for the edge. The counts
    still report, so the caller sees WHY the test is inconclusive
    instead of a NaN/Infinity propagating downstream."""
    base = events.filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    ).select(
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # coalesce: integer moments are 0 on an EMPTY metric table, not
    # NULL — the counts must stay diagnosable even with no rows at all
    arm = lambda a, e: F.coalesce(
        F.sum(F.when(F.col("arm") == a, e).otherwise(F.lit(0))), F.lit(0)
    )
    one = base.agg(
        arm(0, F.lit(1)).cast("long").alias("n_a"),
        arm(1, F.lit(1)).cast("long").alias("n_b"),
        arm(0, F.col("cents")).cast("long").alias("s1_a"),
        arm(1, F.col("cents")).cast("long").alias("s1_b"),
        arm(0, F.col("cents") * F.col("cents")).cast("long").alias("s2_a"),
        arm(1, F.col("cents") * F.col("cents")).cast("long").alias("s2_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("s1_a").cast("double") / na
    mb = F.col("s1_b").cast("double") / nb
    va = (F.col("s2_a").cast("double") - F.col("s1_a").cast("double") * ma) / (
        na - F.lit(1.0)
    )
    vb = (F.col("s2_b").cast("double") - F.col("s1_b").cast("double") * mb) / (
        nb - F.lit(1.0)
    )
    se2a, se2b = va / na, vb / nb
    both_pop = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    # zero-pooled-variance guard: the exact-integer identity
    # n*s2 > s1^2 <=> sample variance > 0, evaluated in DECIMAL(38,0)
    # (s1^2 overflows BIGINT past ~3e9 summed cents) so the testable
    # predicate itself is float-free in both engines
    d = "decimal(38,0)"

    def _vpos(n, s1, s2):
        return F.expr(
            f"CAST({n} AS {d}) * CAST({s2} AS {d})"
            f" > CAST({s1} AS {d}) * CAST({s1} AS {d})"
        )

    var_pos = _vpos("n_a", "s1_a", "s2_a") | _vpos("n_b", "s1_b", "s2_b")
    testable = (F.col("n_a") > 1) & (F.col("n_b") > 1) & var_pos
    return one.select(
        "n_a",
        "n_b",
        F.when(F.col("n_a") > 0, ma).alias("mean_a_cents"),
        F.when(F.col("n_b") > 0, mb).alias("mean_b_cents"),
        F.when(both_pop, mb - ma).alias("diff_cents"),
        F.when(testable, (mb - ma) / F.sqrt(se2a + se2b)).alias("welch_t"),
        F.when(
            testable,
            (se2a + se2b) * (se2a + se2b)
            / (
                se2a * se2a / (na - F.lit(1.0))
                + se2b * se2b / (nb - F.lit(1.0))
            ),
        ).alias("welch_df"),
    )


def rrf_fusion(documents: DataFrame, k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval orderings — the
    standard zero-tuning way to combine heterogeneous rankers
    (Cormack et al., SIGIR'09): here the classifier-score ranking and
    a length prior (n_chars), fused as

        rrf = 1/(k + rank_score) + 1/(k + rank_len),   k = 60

    Ranks are GLOBAL row numbers — the single-partition trap — so both
    come from the two-phase `with_dense_global_index` primitive
    (range-partition + broadcast offsets), with doc_id tie-breaks
    making each ranking total. The fused score is a two-term float sum
    of exact rank reciprocals in fixed order — zero-tolerance
    oracle."""
    from sqlstreamstore_spark.operators.positions import with_dense_global_index

    base = _classifier_scored(documents).select("doc_id", "score").join(
        documents.select("doc_id", "n_chars"), "doc_id"
    )
    ra = with_dense_global_index(
        base, [F.col("score").desc(), F.col("doc_id")], "ix_score"
    )
    rb = with_dense_global_index(
        ra, [F.col("n_chars").desc(), F.col("doc_id")], "ix_len"
    )
    kk = F.lit(float(k))
    return rb.select(
        "doc_id",
        (F.col("ix_score") + 1).cast("long").alias("rank_score"),
        (F.col("ix_len") + 1).cast("long").alias("rank_len"),
        (
            F.lit(1.0) / (kk + (F.col("ix_score") + 1).cast("double"))
            + F.lit(1.0) / (kk + (F.col("ix_len") + 1).cast("double"))
        ).alias("rrf"),
    ).orderBy("doc_id")


def auc_ci(documents: DataFrame, z: float = 1.96) -> DataFrame:
    """ROC-AUC with the Hanley-McNeil (1982) standard error and a
    normal-approximation 95% CI — the line that belongs next to every
    reported AUC (an AUC of 0.52 on 300 positives is noise; on 3M it's
    signal):

        SE^2 = [A(1-A) + (P-1)(Q1-A^2) + (N-1)(Q2-A^2)] / (P*N)
        Q1 = A/(2-A),  Q2 = 2A^2/(1+A)

    Builds on :func:`roc_auc`'s exact rank-sum AUC (BIGINT numerator);
    every input to the float expression is a pure function of three
    BIGINTs, evaluated in identical order in both engines — zero-
    tolerance oracle."""
    a = roc_auc(documents)
    A = F.col("auc")
    P = F.col("n_pos").cast("double")
    N = F.col("n_neg").cast("double")
    q1 = A / (F.lit(2.0) - A)
    q2 = F.lit(2.0) * A * A / (F.lit(1.0) + A)
    se = F.sqrt(
        (
            A * (F.lit(1.0) - A)
            + (P - F.lit(1.0)) * (q1 - A * A)
            + (N - F.lit(1.0)) * (q2 - A * A)
        )
        / (P * N)
    )
    return a.select(
        "n_pos",
        "n_neg",
        "auc",
        se.alias("se"),
        (A - F.lit(z) * se).alias("ci_low"),
        (A + F.lit(z) * se).alias("ci_high"),
    )


def pass_at_k(orders: DataFrame, ks: tuple = (1, 5, 10), min_n: int = 10) -> DataFrame:
    """The unbiased pass@k estimator of Chen et al., "Evaluating Large
    Language Models Trained on Code" (2021, arXiv:2107.03374 eq. 1):
    pass@k = 1 − C(n−c, k)/C(n, k), computed per task from n samples
    with c passes via the numerically-stable product form
    1 − Π_{i=0..k−1} (n−c−i)/(n−i) (never materializing factorials).
    Stand-in grounding on the fixture: task = customer, samples = the
    customer's orders, a "pass" = a 1-URGENT order; tasks need
    n ≥ min_n so every requested k is defined.

    Exactness: n and c are exact BIGINT counts; the product is a
    bounded left fold of single IEEE divides/multiplies in identical
    order on both engines (Spark `aggregate` ↔ DuckDB `list_reduce`)
    — zero-tolerance oracle. The n−c < k branch returns exactly 1.0
    (some k-subset must contain a pass)."""
    g = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").cast("long").alias("n_samples"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
        .filter(F.col("n_samples") >= min_n)
    )
    cols = [F.col("custkey"), F.col("n_samples"), F.col("n_correct")]
    for k in ks:
        fold = F.aggregate(
            F.sequence(F.lit(0), F.lit(int(k) - 1)),
            F.lit(1.0),
            lambda acc, i: acc
            * (
                (F.col("n_samples") - F.col("n_correct") - i).cast("double")
                / (F.col("n_samples") - i).cast("double")
            ),
        )
        cols.append(
            F.when(
                F.col("n_samples") - F.col("n_correct") < F.lit(int(k)),
                F.lit(1.0),
            )
            .otherwise(F.lit(1.0) - fold)
            .alias(f"pass_at_{k}")
        )
    return g.select(*cols).orderBy("custkey")


# Poisson(1) inverse-CDF thresholds (cumulative e^{-1}/k!), generated
# once so the Spark literals and the DuckDB oracle literals are the
# SAME Python doubles (repr round-trips bit-exactly through strtod)
import math as _math

POISSON1_CUM: list = []
_s, _term = 0.0, _math.exp(-1.0)
for _k in range(8):
    _s += _term
    POISSON1_CUM.append(_s)
    _term = _term / (_k + 1)


def bootstrap_ci(documents: DataFrame, b: int = 64) -> DataFrame:
    """Poisson-bootstrap confidence interval for a corpus metric (mean
    tokens per document, per source) — the one-pass distributed
    bootstrap (Efron 1979 resampling; the Poisson(1) approximation to
    multinomial weights is the form that streams, e.g. Chamandy et
    al., "Estimating Uncertainty for Massive Data Streams", Google
    2012). Every (doc, replicate) weight is a PURE FUNCTION of
    md5(doc_id|j): reproducible across runs, engines, partitionings —
    the sampling.py hash-determinism discipline, so the gate
    hash-matches the resampled CI itself at zero tolerance.

    Exactness: weights are exact ints from literal double thresholds
    (identical parses both engines); each replicate mean is one IEEE
    divide of exact BIGINT sums; the CI bounds are ORDER STATISTICS
    (rank 2 / rank ceil(.975·B) of the sorted replicate means) —
    selection, not interpolation, hence exact.

    Scale shape: the ×B explode is narrow (no shuffle) and collapses
    map-side into (source, j) partial sums — B·n_sources groups
    shuffle, never B·N rows; the corpus is read once. B=64 gives
    ~1.6% CI-rank resolution, the standard cheap setting."""
    B = int(b)
    lo_rank, hi_rank = int(0.025 * B) + 1, int(_math.ceil(0.975 * B))
    x = F.size(F.split(F.col("text"), " ")).cast("long")
    base = documents.select("source", "doc_id", x.alias("x"))
    rep = base.select(
        "source", "doc_id", "x",
        F.explode(F.sequence(F.lit(1), F.lit(B))).alias("j"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("doc_id").cast("string"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(float(2**48))
    )
    w = sum(
        (F.when(u >= F.lit(c), 1).otherwise(0) for c in POISSON1_CUM),
        F.lit(0),
    ).cast("long")
    g = rep.groupBy("source", "j").agg(
        F.sum(w * F.col("x")).cast("long").alias("sx"),
        F.sum(w).cast("long").alias("sw"),
    )
    means = g.filter(F.col("sw") > 0).select(
        "source", (F.col("sx").cast("double") / F.col("sw").cast("double")).alias("m")
    )
    ci = means.groupBy("source").agg(
        F.sort_array(F.collect_list("m")).alias("arr")
    ).select(
        "source",
        F.size("arr").cast("long").alias("n_resamples"),
        F.element_at("arr", lo_rank).alias("boot_lo"),
        F.element_at("arr", hi_rank).alias("boot_hi"),
    )
    point = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("x").cast("double") / F.count("*").cast("double")).alias(
            "mean_tokens"
        ),
    )
    return (
        point.join(ci, "source")
        .select(
            "source", "n_docs", "mean_tokens", "n_resamples", "boot_lo", "boot_hi"
        )
        .orderBy("source")
    )


def token_f1(documents: DataFrame) -> DataFrame:
    """SQuAD-style token-overlap F1 between (reference, candidate)
    document pairs — the standard extractive-QA / summarization-lite
    eval metric (Rajpurkar et al. 2016): P = overlap/|cand|,
    R = overlap/|ref|, F1 = 2PR/(P+R), where overlap is the MULTISET
    token intersection Σ_t min(tf_ref(t), tf_cand(t)). The
    deterministic pairing (ref = even doc_id, cand = odd, paired by
    doc_id DIV 2) stands in for a real (gold, model-output) table —
    production swaps in any two-column pair frame.

    Exactness: per-token tf counts and the Σ min(...) overlap are
    exact BIGINTs; P/R are single IEEE divides and F1 one more —
    identical expression tree both engines, zero tolerance. Scale:
    one explode + (pair, side, token) partial agg; the min-sum joins
    per (pair, token) — never a doc×doc cross; output one row per
    pair."""
    base = documents.select(
        (F.col("doc_id") / 2).cast("long").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    tf = base.groupBy("pair_id", "side", "token").agg(
        F.count("*").cast("long").alias("c")
    )
    ref = tf.filter(F.col("side") == 0).select(
        "pair_id", "token", F.col("c").alias("cr")
    )
    cand = tf.filter(F.col("side") == 1).select(
        "pair_id", "token", F.col("c").alias("cc")
    )
    ov = (
        ref.join(cand, ["pair_id", "token"])
        .groupBy("pair_id")
        .agg(F.sum(F.least("cr", "cc")).cast("long").alias("overlap"))
    )
    lens = tf.groupBy("pair_id", "side").agg(
        F.sum("c").cast("long").alias("n")
    )
    nref = lens.filter(F.col("side") == 0).select(
        "pair_id", F.col("n").alias("n_ref")
    )
    ncand = lens.filter(F.col("side") == 1).select(
        "pair_id", F.col("n").alias("n_cand")
    )
    p = F.col("overlap").cast("double") / F.col("n_cand").cast("double")
    r = F.col("overlap").cast("double") / F.col("n_ref").cast("double")
    return (
        nref.join(ncand, "pair_id")
        .join(ov, "pair_id", "left")
        .select(
            "pair_id",
            "n_ref",
            "n_cand",
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
        )
        .select(
            "pair_id", "n_ref", "n_cand", "overlap",
            p.alias("precision"),
            r.alias("recall"),
            F.when(
                F.col("overlap") > 0, F.lit(2.0) * p * r / (p + r)
            ).otherwise(F.lit(0.0)).alias("f1"),
        )
        .orderBy("pair_id")
    )


def ab_test_mann_whitney(events: DataFrame) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) A/B readout — the
    NONPARAMETRIC twin of :func:`ab_test_report`: same deterministic
    ``user_id % 2`` arms and exact-cents metric, but the test statistic
    ranks values instead of trusting means, so a heavy-tailed or
    skewed metric (latency, spend) can't fake or hide a shift the way
    it can under Welch's t. Tie-corrected normal approximation.

    Exactness: ranks never materialize per row — per distinct value v
    the average rank is N_before(v) + (n_v+1)/2, so DOUBLED rank sums
    are pure integers: 2R_b = Σ_v n_bv·(2·N_before + n_v + 1), and
    z = (2U_b − n_a·n_b) / (2·√var) with
    var = n_a·n_b·((N+1)·N·(N−1) − Σ(t³−t)) / (12·N·(N−1)) — every
    numerator exact (DECIMAL(38,0) for the cube and the doubled rank
    sum, the power_users_gini widening discipline), ONE libm sqrt,
    rounded 6. Degenerate cases stay diagnosable, not NaN: an empty
    arm or an all-tied metric NULLs u_b / z, counts still report
    (the ab_test_report ADVICE-r7-#4 contract).

    Scale shape: one partial agg onto the (distinct cents) value
    axis, the two-phase global cumsum for N_before (never a
    single-partition window over the value table), one final 1-row
    agg."""
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    base = events.filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    ).select(
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    per = base.groupBy("cents").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("na_v"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("nb_v"),
    ).withColumn("n_v", (F.col("na_v") + F.col("nb_v")).cast("long"))
    cum = with_global_cumsum(per, ["cents"], "n_v", out_col="cum_incl")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    terms = cum.select(
        "na_v", "nb_v", "n_v",
        (
            dec(F.col("nb_v"))
            * dec(
                F.lit(2) * (F.col("cum_incl") - F.col("n_v"))
                + F.col("n_v")
                + F.lit(1)
            )
        ).alias("two_rb_v"),
        (dec(F.col("n_v")) * dec(F.col("n_v")) * dec(F.col("n_v"))
         - dec(F.col("n_v"))).alias("tie_v"),
    )
    g = terms.agg(
        F.sum("na_v").cast("long").alias("n_a"),
        F.sum("nb_v").cast("long").alias("n_b"),
        F.sum("n_v").cast("long").alias("n_total"),
        F.sum("two_rb_v").alias("two_rb"),
        F.sum("tie_v").alias("ties"),
        F.count("*").cast("long").alias("n_distinct_values"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    n = F.col("n_total").cast("double")
    two_ub = (
        F.col("two_rb").cast("double")
        - n_b * (n_b + F.lit(1.0))
    )
    var_num = (n + F.lit(1.0)) * n * (n - F.lit(1.0)) - F.col("ties").cast(
        "double"
    )
    var = n_a * n_b * var_num / (F.lit(12.0) * n * (n - F.lit(1.0)))
    testable = (
        (F.col("n_a") > 0) & (F.col("n_b") > 0)
        & (F.col("n_distinct_values") > 1) & (F.col("n_total") > 1)
    )
    return g.select(
        "n_total", "n_a", "n_b", "n_distinct_values",
        F.when(testable, two_ub / F.lit(2.0)).alias("u_b"),
        F.when(testable, F.round(
            (two_ub - n_a * n_b) / (F.lit(2.0) * F.sqrt(var)), 6
        )).alias("z"),
    )


# ------------------------------------------- Bradley-Terry (round 11)


def bt_win_matrix(events: DataFrame) -> DataFrame:
    """Pairwise preference matrix from per-user matchups: each user's
    engagement total per event type (EXACT integer cents — value·100
    rounded to BIGINT, so the winner decision is order-free) decides
    every (type, type) matchup for that user; ties are skipped.
    Output: (i, j, wij) — wins of i over j, bounded by the type axis
    squared. Scale shape: one partial-agg groupBy onto
    (user, type) — bounded fan-out per user since the type axis is
    bounded — then a per-user self-join on that bounded axis and one
    count onto the k² matrix. The corpus shuffles once, keyed by
    user."""
    s = events.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sc")
    )
    a = s.select("user_id", F.col("t").alias("t1"), F.col("sc").alias("s1"))
    b = s.select("user_id", F.col("t").alias("t2"), F.col("sc").alias("s2"))
    m = a.join(b, "user_id").filter(F.col("t1") < F.col("t2")).filter(
        F.col("s1") != F.col("s2")
    )
    wl = m.select(
        F.when(F.col("s1") > F.col("s2"), F.col("t1")).otherwise(F.col("t2")).alias("i"),
        F.when(F.col("s1") > F.col("s2"), F.col("t2")).otherwise(F.col("t1")).alias("j"),
    )
    return wl.groupBy("i", "j").agg(F.count("*").cast("long").alias("wij"))


def bradley_terry(events: DataFrame, iters: int = 5) -> DataFrame:
    """Arena-style pairwise-preference ranking — the Bradley-Terry
    model fit with Hunter's MM updates (Hunter, "MM algorithms for
    generalized Bradley-Terry models", Annals of Statistics 2004):
    the aggregation every LLM-eval arena runs to turn pairwise
    human/judge preferences into per-model scores.

        p_i ← W_i / Σ_{j≠i, n_ij>0} n_ij / (p_i + p_j),  then normalize

    The win matrix is computed DISTRIBUTED (:func:`bt_win_matrix` —
    the corpus shuffles once); the MM solve runs driver-side over the
    model-sized item axis (the kmeans_centroids / bpe_train
    discipline — items are models/systems under comparison, never
    data) with SORTED-fold float discipline: denominators fold over
    opponents in item order and the normalizer folds over items in
    item order, so the DuckDB twin replays the identical IEEE
    sequence and the gate hash-matches to round 9.

    Zero-win items converge to score 0 (their games still shape the
    winners' denominators); items with no games are excluded. Output:
    (item, wins, games, bt_score), scores summing to 1."""
    rows = bt_win_matrix(events).collect()  # bounded: k² matrix rows
    w: dict[tuple[str, str], int] = {(r["i"], r["j"]): int(r["wij"]) for r in rows}
    items = sorted({i for i, _ in w} | {j for _, j in w})
    n = {
        (i, j): w.get((i, j), 0) + w.get((j, i), 0)
        for i in items
        for j in items
        if i != j
    }
    wins = {i: sum(w.get((i, j), 0) for j in items if j != i) for i in items}
    games = {i: sum(n[(i, j)] for j in items if j != i) for i in items}
    items = [i for i in items if games[i] > 0]
    p = {i: 1.0 / len(items) for i in items}
    for _t in range(iters):
        praw = {}
        for i in items:
            d = 0.0
            for j in items:
                if j != i and n[(i, j)] > 0:
                    d += n[(i, j)] / (p[i] + p[j])
            praw[i] = (wins[i] / d) if d > 0 else 0.0
        tot = 0.0
        for i in items:
            tot += praw[i]
        p = {i: praw[i] / tot for i in items}
    spark = events.sparkSession
    out = [(i, int(wins[i]), int(games[i]), float(p[i])) for i in items]
    return (
        spark.createDataFrame(
            out, "item string, wins long, games long, bt_score double"
        )
        # round engine-side (HALF_UP), matching the DuckDB twin —
        # Python's round() is banker's and could disagree at a .5 tail
        .select("item", "wins", "games", F.round("bt_score", 9).alias("bt_score"))
        .orderBy("item")
    )


# ------------------------------------------ Fleiss' kappa (round 11)


def krippendorff_alpha(
    events: DataFrame, bucket_cents: int = 3000, n_cats: int = 3
) -> DataFrame:
    """Krippendorff's alpha (nominal) — the agreement statistic that,
    unlike :func:`fleiss_kappa`, handles MISSING ratings: any unit
    rated by >= 2 raters participates with its own rating count m_u
    (Krippendorff, "Content Analysis", ch. 12). For LLM-judge panels
    this is the realistic regime — judges time out or abstain, and
    Fleiss' constant-r requirement throws those units away.

        Do = (1/n) Σ_u (m_u² − Σ_c n_uc²) / (m_u − 1)
        De = (n² − Σ_c n_c²) / (n(n−1))
        α  = 1 − Do/De
             = 1 − (n−1)·Σ_u[(m_u²−Σn_uc²)/(m_u−1)] / (n² − Σ_c n_c²)

    Exactness: the per-unit denominators (m_u − 1) are bounded by the
    rater axis, so multiplying through by L = lcm(1..max_m−1) turns
    the whole numerator into exact BIGINT arithmetic —
    α = 1 − ((n−1)·S_L) / (L·(n² − Σn_c²)) with ONE final IEEE
    division (the fleiss_kappa discipline, extended to ragged panels;
    BIGINT headroom holds through sf1-scale fixtures). Degenerate
    panels (all ratings in one category → De = 0) report NULL.

    Fixture derivation matches fleiss_kappa exactly (items = users,
    raters = event types, rating = integer-DIV engagement bucket) —
    MINUS the constant-r filter: units keep whatever raters they have.

    Scale: two partial-agg groupBys keyed by user (the corpus
    shuffles once), bounded reductions; the only collect is max(m_u),
    an int off the bounded rater axis."""
    import math

    per = events.groupBy("user_id", F.col("event_type").alias("rater")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        F.count("*").cast("long").alias("n_ev"),
    )
    rated = per.select(
        "user_id",
        F.least(
            F.lit(n_cats - 1),
            F.expr(f"(cents DIV n_ev) DIV {int(bucket_cents)}"),
        ).cast("long").alias("rating"),
    )
    nuc = rated.groupBy("user_id", "rating").agg(
        F.count("*").cast("long").alias("n")
    )
    unit = nuc.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("m"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("ssq"),
    ).filter(F.col("m") >= 2)
    max_m = unit.agg(F.max("m")).collect()[0][0]
    if max_m is None:
        spark = events.sparkSession
        return spark.createDataFrame(
            [(0, 0, 0, None, None, None)],
            "n_units long, n_ratings long, n_cats_seen long, "
            "do double, de double, alpha double",
        )
    L = math.lcm(*range(1, int(max_m)))  # lcm(1..max_m-1); m>=2 so >=1
    s_l = unit.agg(
        F.sum(
            (F.col("m") * F.col("m") - F.col("ssq"))
            * F.expr(f"CAST({L} AS BIGINT) DIV (m - 1)")
        ).cast("long").alias("s_l"),
        F.count("*").cast("long").alias("n_units"),
        F.sum("m").cast("long").alias("n"),
    )
    # category marginals over participating units only
    cat = (
        nuc.join(unit.select("user_id"), "user_id", "left_semi")
        .groupBy("rating")
        .agg(F.sum("n").cast("long").alias("nc"))
        .agg(
            F.sum(F.col("nc") * F.col("nc")).cast("long").alias("q"),
            F.count("*").cast("long").alias("n_cats_seen"),
        )
    )
    ll = F.lit(int(L)).cast("long")
    return s_l.crossJoin(F.broadcast(cat)).select(
        "n_units",
        F.col("n").alias("n_ratings"),
        "n_cats_seen",
        F.round(
            F.col("s_l").cast("double") / (ll * F.col("n")).cast("double"), 9
        ).alias("do"),
        F.round(
            (F.col("n") * F.col("n") - F.col("q")).cast("double")
            / (F.col("n") * (F.col("n") - 1)).cast("double"),
            9,
        ).alias("de"),
        F.when(
            F.col("n") * F.col("n") != F.col("q"),
            F.round(
                F.lit(1.0)
                - ((F.col("n") - 1) * F.col("s_l")).cast("double")
                / (ll * (F.col("n") * F.col("n") - F.col("q"))).cast("double"),
                9,
            ),
        ).alias("alpha"),
    )


def fleiss_kappa(events: DataFrame, bucket_cents: int = 3000, n_cats: int = 3) -> DataFrame:
    """Multi-rater chance-corrected agreement — Fleiss' kappa (Fleiss,
    "Measuring nominal scale agreement among many raters", 1971): THE
    agreement statistic for LLM-judge panels (k judges each assign one
    of c categories to every item; kappa corrects raw agreement for
    the category base rates). Cohen's kappa (two raters) ships in
    classification_report; this is the k-rater generalization.

    Fixture derivation (deterministic, exact): items = users, raters =
    event types, rating = the rater's average engagement bucket
    ``least(n_cats-1, (sum_cents DIV n_events) DIV bucket_cents)`` —
    integer DIV on exact BIGINT cents, so both engines agree bit-for-
    bit. Only items rated by ALL raters participate (Fleiss requires
    constant r per item).

    Float discipline: with N items, r raters, n_ij the raters placing
    item i in category j, S2 = ΣΣ n_ij² and Q = Σ_j (Σ_i n_ij)²,

        kappa = (A·(Nr)² − Q·Nr(r−1)) / (Nr(r−1)·((Nr)² − Q)),
        A = S2 − N·r

    — every term an exact BIGINT, ONE final IEEE division (plus one
    each for the reported p_bar / p_e), zero-tolerance oracle.

    Scale: two partial-agg groupBys (user×type, then user×rating) and
    two bounded reductions — the corpus shuffles once, keyed by user."""
    per = events.groupBy("user_id", F.col("event_type").alias("rater")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        F.count("*").cast("long").alias("n_ev"),
    )
    r_expr = per.groupBy("user_id").agg(F.count("*").alias("__r"))
    r_max = r_expr.agg(F.max("__r").alias("m")).collect()[0]["m"]
    full = per.join(
        r_expr.filter(F.col("__r") == r_max).select("user_id"), "user_id"
    )
    rated = full.select(
        "user_id",
        F.least(
            F.lit(n_cats - 1),
            F.expr(f"(cents DIV n_ev) DIV {int(bucket_cents)}"),
        ).cast("long").alias("rating"),
    )
    nij = rated.groupBy("user_id", "rating").agg(
        F.count("*").cast("long").alias("n")
    )
    stats = nij.agg(
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
        F.countDistinct("user_id").cast("long").alias("n_items"),
    )
    colq = (
        nij.groupBy("rating")
        .agg(F.sum("n").cast("long").alias("cs"))
        .agg(F.sum(F.col("cs") * F.col("cs")).cast("long").alias("q"),
             F.count("*").cast("long").alias("n_cats_seen"))
    )
    r = int(r_max)
    out = stats.crossJoin(F.broadcast(colq)).select(
        F.col("n_items"),
        F.lit(r).cast("long").alias("n_raters"),
        "n_cats_seen",
        F.round(
            (F.col("s2") - F.col("n_items") * r).cast("double")
            / (F.col("n_items") * r * (r - 1)).cast("double"),
            9,
        ).alias("p_bar"),
        F.round(
            F.col("q").cast("double")
            / ((F.col("n_items") * r) * (F.col("n_items") * r)).cast("double"),
            9,
        ).alias("p_e"),
        F.when(
            # degenerate: every rating in ONE category -> p_e = 1 and
            # kappa is undefined; report NULL instead of divide-by-zero
            (F.col("n_items") * r) * (F.col("n_items") * r) != F.col("q"),
            F.round(
                (
                    (F.col("s2") - F.col("n_items") * r)
                    * (F.col("n_items") * r) * (F.col("n_items") * r)
                    - F.col("q") * F.col("n_items") * r * (r - 1)
                ).cast("double")
                / (
                    (F.col("n_items") * r * (r - 1))
                    * (
                        (F.col("n_items") * r) * (F.col("n_items") * r)
                        - F.col("q")
                    )
                ).cast("double"),
                9,
            ),
        ).alias("fleiss_kappa"),
    )
    return out


def retrieval_metrics(
    ranked: DataFrame, rel_totals: DataFrame, k: int = 10
) -> DataFrame:
    """Per-query retrieval evaluation — MRR, precision@k, recall@k,
    NDCG@k (Järvelin & Kekäläinen 2002, binary gains) — THE metric row
    a RAG/embedding pipeline reports for every retriever change.
    Complements the label-free ANN recall gates: those compare an
    index against brute force; this scores a ranking against ground-
    truth relevance labels.

    Inputs: ``ranked`` = (qid, rk 1-based, rel 0/1) — any retriever's
    output joined to labels; ``rel_totals`` = (qid, n_rel_total) —
    corpus-wide relevant counts (recall/IDCG need the denominator the
    candidate list can't see).

    Float discipline: MRR (1/first-hit-rank), precision (hits/k) and
    recall (hits/n_rel_total) are single divisions of exact BIGINTs —
    bit-deterministic. DCG/IDCG pass through log2 (libm) and a
    row-order-dependent partial sum, so BOTH engines round them to 6
    decimals (the stats_corr_regr float pattern). No-hit queries emit
    first_rel_rank 0 / mrr 0.0 (never NULL — NULL value cells hash
    engine-dependently).

    Scale shape: one partial-agg groupBy over the ranked rows (which
    are already bounded: queries × candidate-list length, regardless
    of corpus size); IDCG folds over a ≤k-element sequence per query
    — no corpus-scale term anywhere."""
    kd = float(k)
    per = ranked.groupBy("qid").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rk"))).alias("__first"),
        F.sum(
            F.when((F.col("rel") == 1) & (F.col("rk") <= k), 1).otherwise(0)
        ).cast("long").alias("hits_at_k"),
        F.sum(
            F.when(
                (F.col("rel") == 1) & (F.col("rk") <= k),
                F.lit(1.0) / F.log2(F.col("rk").cast("double") + F.lit(1.0)),
            ).otherwise(F.lit(0.0))
        ).alias("__dcg"),
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.least(F.lit(k), F.col("n_rel_total")))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
    )
    return (
        per.join(rel_totals, "qid")
        .select(
            "qid",
            F.col("n_rel_total").cast("long").alias("n_rel_total"),
            F.coalesce(F.col("__first"), F.lit(0)).cast("long").alias("first_rel_rank"),
            F.when(F.col("__first").isNull(), F.lit(0.0))
            .otherwise(F.lit(1.0) / F.col("__first").cast("double"))
            .alias("mrr"),
            (F.col("hits_at_k").cast("double") / F.lit(kd)).alias("precision_at_k"),
            (
                F.col("hits_at_k").cast("double")
                / F.col("n_rel_total").cast("double")
            ).alias("recall_at_k"),
            F.when(F.col("n_rel_total") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("__dcg") / idcg, 6))
            .alias("ndcg_at_k"),
        )
        .orderBy("qid")
    )
