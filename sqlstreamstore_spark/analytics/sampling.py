"""Deterministic sampling and splitting — a training-data pipeline's
bread and butter. `df.sample()` is seed-dependent but not content-stable
(changes with partitioning); these use a content hash of the key, so a
row's assignment is a pure function of its identity: reproducible across
runs, engines, partitionings, and incremental arrivals — the property
that makes a train/val split trustworthy.

Mechanism: bucket = first 4 hex digits of md5(key) as an integer
(uniform over 0..65535) — expressible identically in Spark and DuckDB,
so the gate hash-matches the sampled sets themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(key: Column, buckets: int = 65536) -> Column:
    """Uniform int bucket from a content hash (md5 → first 4 hex → int)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int") % buckets


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash of `key` — stable
    under reruns, repartitioning, and data growth (a row never flips)."""
    threshold = int(fraction * 65536)
    return df.filter(_hash_bucket(F.col(key)) < threshold)


def hash_split(df: DataFrame, key: str, train_fraction: float = 0.9) -> DataFrame:
    """Label every row train/val by content hash — the split column a
    pipeline materializes next to the data."""
    threshold = int(train_fraction * 65536)
    return df.withColumn(
        "split",
        F.when(_hash_bucket(F.col(key)) < threshold, F.lit("train")).otherwise(
            F.lit("val")
        ),
    )


def stratified_sample_by_source(
    df: DataFrame,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0625,
    key: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixture step of a
    pretraining pipeline (keep 100% of wiki, 10% of crawl, ...). Each
    stratum gets its own content-hash threshold, so the mixture is exact
    in expectation, reproducible, and incremental-arrival-stable (a new
    row's fate never depends on what else arrived).

    One narrow filter — no shuffle, no sampling state; the per-source
    thresholds fold into the predicate as a literal CASE.
    """
    rates = rates if rates is not None else {}
    threshold = F.lit(int(default_rate * 65536))
    for src, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == src, F.lit(int(rate * 65536))
        ).otherwise(threshold)
    return df.filter(_hash_bucket(F.col(key)) < threshold)


def pps_systematic_sample(documents: DataFrame, k: int = 100) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling: draw k
    sample points evenly across the cumulative-weight axis (point i at
    ⌊W·(2i+1)/(2k)⌋) and give each document one unit of multiplicity
    per point landing in its weight interval [cum−w, cum). The
    weight-proportional sampler a pipeline uses to downsample a corpus
    while preserving its length/quality mass — fully deterministic
    (no RNG: the sample is a pure function of the data), and exact:
    all arithmetic is BIGINT, so the gate hash-matches the selected
    set itself, not just its size.

    Per-doc multiplicity has a closed form — count_below(c) =
    clamp((2k·c + W − 1) div 2W, 0, k) points strictly below c, so
    mult = count_below(cum) − count_below(cum − w): no join against a
    point table, just two integer expressions per row. The global
    cumulative weight uses the two-phase cumsum
    (operators/positions.py) — never a single-partition window. Docs
    with zero weight get an empty interval and are never selected.
    """
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    base = documents.select("doc_id", F.col("n_chars").cast("long").alias("w"))
    cum = with_global_cumsum(base, ["doc_id"], "w", out_col="__cum")
    tot = base.agg(F.sum("w").alias("tw"))

    # LONG `div`, not floor(double /): at petabyte weight sums 2k·c
    # approaches 2^53, where a double quotient can misround a boundary
    # multiplicity by 1 against the oracle's exact BIGINT // division.
    joined = (
        cum.join(F.broadcast(tot))
        .withColumn("__num_hi", F.lit(2 * k) * F.col("__cum") + F.col("tw") - F.lit(1))
        .withColumn(
            "__num_lo",
            F.lit(2 * k) * (F.col("__cum") - F.col("w")) + F.col("tw") - F.lit(1),
        )
        .withColumn("__den", F.lit(2) * F.col("tw"))
    )

    def clamp(c: Column) -> Column:
        return F.greatest(F.lit(0).cast("long"), F.least(F.lit(k).cast("long"), c))

    mult = clamp(F.expr("__num_hi div __den")) - clamp(F.expr("__num_lo div __den"))
    return (
        joined.select(
            "doc_id",
            "w",
            mult.cast("bigint").alias("multiplicity"),
        )
        .filter(F.col("multiplicity") > 0)
        .orderBy("doc_id")
    )


def fixed_size_sample(df: DataFrame, key: str, n: int) -> DataFrame:
    """Uniform fixed-SIZE sample without replacement: the n rows whose
    content-hash ranks smallest — the deterministic reservoir. Same
    stability story as `deterministic_sample` (a pure function of row
    identity, no RNG, engine/partitioning-independent), but with an
    exact output size instead of a Bernoulli fraction. Physically a
    TakeOrderedAndProject: per-partition heaps of n rows, driver merge —
    no shuffle, no global sort."""
    return (
        df.withColumn("__h", F.md5(F.col(key).cast("string")))
        .orderBy("__h")
        .limit(n)
        .drop("__h")
    )


def budget_mixture_sample(
    documents: DataFrame,
    budgets: dict[str, int],
    default_budget: int,
    key: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Token-BUDGET-aware domain mixture: instead of hand-tuned rates
    (``stratified_sample_by_source``), give each source a token budget
    and derive its sampling rate from the source's own measured size —
    the way a pretraining mix is actually specified ("200B tokens of
    crawl, all of wiki"). Two passes, both scale-shaped:

      1. per-source token totals (one partial-agg scan);
      2. integer thresholds t_s = min(65536, budget·65536 DIV total)
         carried in DECIMAL(38,0) (budget·65536 overflows BIGINT past
         ~1.4e14 tokens — trillion-token budgets are the NORM at this
         scale), broadcast-joined back, rows kept where the same
         content-hash bucket every sampler here uses falls under t_s.

    Expected selected tokens per source ≈ min(budget, total); selection
    stays hash-deterministic (a doc's fate never flips on rerun or
    arrival order). Returns the per-source accounting summary — the
    artifact a mixture run logs; the selected rows themselves come from
    ``selected_by_budget``."""
    thresholds = _budget_thresholds(documents, budgets, default_budget, strata_col)
    toks = documents.select(
        F.col(strata_col).alias("src"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        _hash_bucket(F.col(key)).alias("hb"),
    )
    return (
        toks.join(F.broadcast(thresholds), "src")
        .groupBy("src")
        .agg(
            F.max("total_tokens").alias("total_tokens"),
            F.max("budget").alias("budget"),
            F.max("threshold").alias("threshold"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("hb") < F.col("threshold"), 1).otherwise(0))
            .cast("long").alias("n_selected"),
            F.sum(
                F.when(F.col("hb") < F.col("threshold"), F.col("n_tokens"))
                .otherwise(0)
            ).cast("long").alias("tokens_selected"),
        )
        .orderBy("src")
    )


def _budget_thresholds(
    documents: DataFrame, budgets: dict[str, int], default_budget: int,
    strata_col: str,
) -> DataFrame:
    budget_expr = F.lit(default_budget).cast("long")
    for src, b in sorted(budgets.items()):
        budget_expr = F.when(F.col("src") == src, F.lit(b).cast("long")).otherwise(
            budget_expr
        )
    totals = (
        documents.select(
            F.col(strata_col).alias("src"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("src")
        .agg(F.sum("n_tokens").alias("total_tokens"))
        .withColumn("budget", budget_expr)
    )
    d = "decimal(38,0)"
    return totals.withColumn(
        "threshold",
        F.least(
            F.lit(65536).cast("long"),
            F.expr(
                f"CAST((CAST(budget AS {d}) * 65536) div "
                f"CAST(total_tokens AS {d}) AS BIGINT)"
            ),
        ),
    )


def selected_by_budget(
    documents: DataFrame,
    budgets: dict[str, int],
    default_budget: int,
    key: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """The selected rows for ``budget_mixture_sample``'s accounting."""
    thresholds = _budget_thresholds(documents, budgets, default_budget, strata_col)
    return (
        documents.join(
            F.broadcast(thresholds.select("src", "threshold")),
            documents[strata_col] == F.col("src"),
        )
        .filter(_hash_bucket(F.col(key)) < F.col("threshold"))
        .drop("src", "threshold")
    )


def weighted_sample_aes(documents: DataFrame, k: int = 100) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–Spirakis
    A-ES scheme ("Weighted random sampling with a reservoir", IPL 2006):
    each row draws u ~ U(0,1] and gets key u^(1/w); the k largest keys
    are the sample. Inclusion probability is exactly proportional-to-
    size without replacement — the sampler a token-weighted corpus
    subset wants (PPS *systematic* sampling lives in
    `pps_systematic_sample`; this is its fixed-size reservoir sibling,
    and the one that composes with a streaming reservoir at 100 TB:
    per-partition top-k heaps merge by re-taking the top k).

    Determinism discipline: u is the 48-bit md5 fraction of the row key
    (exact in BIGINT and double on both engines; +1 keeps u > 0), and
    the ordering key is ln(u)/w — monotone in u^(1/w), so the selected
    set is identical, but it costs ONE libm call on an exact rational
    per row. Weight = token count (>= 1 for non-empty text).

    Scale shape: no shuffle and no window — orderBy(key desc).limit(k)
    is a TakeOrderedAndProject (per-partition k-row heaps, driver
    merge), the same physical plan as `fixed_size_sample`. At 100 TB
    the only data movement is k rows per partition.
    """
    w = F.size(F.split(F.col("text"), " ")).cast("double")
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit("wrs:"), F.col("doc_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("double")
    u = (v + F.lit(1.0)) / F.lit(float(1 << 48))
    key = F.log(u) / w
    return (
        documents.select(
            "doc_id",
            w.cast("bigint").alias("n_tokens"),
            key.alias("__key"),
        )
        .orderBy(F.col("__key").desc(), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("__key"), 9).alias("aes_key"),
        )
        .orderBy("doc_id")
    )


def group_split(
    df: DataFrame,
    group_col: str,
    fractions: tuple[float, float] = (0.8, 0.1),
    salt: str = "gsplit",
) -> DataFrame:
    """Leakage-free train/val/test assignment: hash the GROUP key (user,
    session, document family), not the row, so EVERY row of a group
    lands in the same split — the GroupShuffleSplit discipline. A
    per-row split (hash_split) leaks: a user's behavior appears in both
    train and test, and the eval overstates generalization.

    ``fractions`` = (train, val); test gets the remainder. The salt
    namespaces the assignment so re-splitting for a new experiment
    reshuffles groups deterministically.

    Scale shape: a pure map-side CASE over a content hash — no shuffle,
    no state, stable under reruns and data growth (a group never flips
    when OTHER groups arrive; new rows of a known group inherit its
    split).
    """
    b = _hash_bucket(F.concat(F.lit(salt + ":"), F.col(group_col).cast("string")))
    t_train = int(fractions[0] * 65536)
    t_val = int((fractions[0] + fractions[1]) * 65536)
    return df.withColumn(
        "split",
        F.when(b < t_train, F.lit("train"))
        .when(b < t_val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def temperature_mixture_sample(
    documents: DataFrame,
    alpha: float = 0.7,
    target_tokens: int = 50_000,
    key: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual-pretraining
    resampling rule, XLM-R §3.1): source share q_s ∝ (n_s/N)^α, so
    α < 1 UPsamples low-resource sources relative to their natural
    share and α = 1 is proportional sampling. Per-row keep-rates derive
    from the shares and a token target: rate_s = min(1, T·q_s/n_s) —
    "fill a T-token mix at temperature α".

    Same two-pass scale shape as `budget_mixture_sample` (per-source
    totals → broadcast thresholds → one content-hash filter), same
    hash determinism (a doc's fate never flips on rerun or arrival
    order). pow() passes through libm, so the 0..65536 threshold is
    rounded to 6 dp on both engines BEFORE the floor — the only place
    a ulp could otherwise flip an integer; everything downstream is
    exact. Returns the per-source accounting (share, threshold,
    selected docs/tokens); α-monotonicity (smaller α ⇒ flatter mix)
    is pytest-pinned.
    """
    toks = documents.select(
        F.col(strata_col).alias("src"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        _hash_bucket(F.col(key)).alias("hb"),
    )
    totals = toks.groupBy("src").agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("n_docs"),
    )
    denom = totals.agg(
        F.sum(F.pow(F.col("total_tokens").cast("double"), F.lit(alpha))).alias(
            "denom"
        ),
        F.sum("total_tokens").cast("long").alias("corpus_tokens"),
    )
    rates = totals.join(denom).select(
        "src",
        "total_tokens",
        "n_docs",
        (
            F.pow(F.col("total_tokens").cast("double"), F.lit(alpha))
            / F.col("denom")
        ).alias("q"),
    )
    thr = rates.withColumn(
        "threshold",
        F.least(
            F.lit(65536).cast("long"),
            F.floor(
                F.round(
                    F.lit(float(target_tokens))
                    * F.col("q")
                    / F.col("total_tokens").cast("double")
                    * F.lit(65536.0),
                    6,
                )
            ).cast("long"),
        ),
    )
    return (
        toks.join(F.broadcast(thr), "src")
        .groupBy("src")
        .agg(
            F.max("total_tokens").alias("total_tokens"),
            F.max("n_docs").alias("n_docs"),
            F.round(F.max("q"), 9).alias("q"),
            F.max("threshold").alias("threshold"),
            F.sum(F.when(F.col("hb") < F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_selected"),
            F.sum(
                F.when(F.col("hb") < F.col("threshold"), F.col("n_tokens")).otherwise(0)
            )
            .cast("long")
            .alias("tokens_selected"),
        )
        .orderBy("src")
    )


def dsir_importance_weights(
    documents: DataFrame, target_lang: str = "en", buckets: int = 8192
) -> DataFrame:
    """DSIR data-selection weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the log likelihood ratio of a TARGET-domain hashed
    n-gram unigram model over the SOURCE (whole-corpus) model,

        log w(x) = sum_g m_g * [ln p_t(b(g)) - ln p_s(b(g))]

    with unigram+bigram features hashed into ``buckets`` buckets
    (md5 — the engine's hashing-trick family) and add-1 smoothing.
    High-weight docs look like the target domain (here: the
    ``target_lang`` slice standing in for "quality" text); importance
    resampling then samples proportionally. This is the model-free
    counterpart of the trained classifier filter
    (pipeline.logreg_train_quality -> classifier_score): together they
    close both standard data-selection recipes.

    Float discipline (gate hash-matches DuckDB): every libm call is
    ln() of an exact integer (+1-smoothed counts, +B totals), per-doc
    contributions fold over a SORTED struct array sequentially, and
    the two corpus totals arrive as a broadcast 1-row crossJoin — the
    unigram_logprob discipline exactly.

    Scale shape at 100 TB: gram explode -> one groupBy(bucket) partial
    agg (8192-row model, broadcastable by AQE), one (doc, bucket)
    partial agg, one hash equi-join; fold bounded by distinct buckets
    per doc (<= 8192 however long the doc). Nothing quadratic, no
    UDFs, no collect."""
    toks = documents.select(
        "doc_id", F.col("lang"), F.split(F.col("text"), " ").alias("w")
    )
    uni = toks.select("doc_id", "lang", F.explode("w").alias("g"))
    bg = (
        toks.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.zip_with(
                    F.expr("slice(w, 1, size(w) - 1)"),
                    F.expr("slice(w, 2, size(w) - 1)"),
                    lambda p, c: F.concat_ws(" ", p, c),
                )
            ).alias("g"),
        )
    )
    grams = uni.unionByName(bg)
    b = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 4), 16, 10).cast("long")
        % F.lit(int(buckets))
    )
    gb = grams.select("doc_id", "lang", b.alias("b"))
    stats = gb.groupBy("b").agg(
        F.count("*").cast("long").alias("c_s"),
        F.sum(F.when(F.col("lang") == target_lang, 1).otherwise(0))
        .cast("long")
        .alias("c_t"),
    )
    totals = stats.agg(
        F.coalesce(F.sum("c_s"), F.lit(0)).cast("long").alias("n_s"),
        F.coalesce(F.sum("c_t"), F.lit(0)).cast("long").alias("n_t"),
    )
    per = gb.groupBy("doc_id", "b").agg(F.count("*").cast("long").alias("m"))
    terms = (
        per.join(stats, "b")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("c_t", "c_s", "m"))).alias("ts"),
            F.sum("m").cast("long").alias("n_grams"),
        )
    )
    fold = F.aggregate(
        F.transform(
            F.col("ts"),
            lambda t: t["m"].cast("double")
            * (
                F.log((t["c_t"] + F.lit(1)).cast("double"))
                - F.log((t["c_s"] + F.lit(1)).cast("double"))
            ),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    bk = F.lit(int(buckets))
    logw = fold + F.col("n_grams").cast("double") * (
        F.log((F.col("n_s") + bk).cast("double"))
        - F.log((F.col("n_t") + bk).cast("double"))
    )
    return (
        terms.crossJoin(F.broadcast(totals))
        .select("doc_id", "n_grams", F.round(logw, 6).alias("log_weight"))
        .orderBy("doc_id")
    )


def dsir_importance_resample(
    documents: DataFrame,
    target_lang: str = "en",
    token_budget: int = 2000,
    buckets: int = 8192,
) -> DataFrame:
    """The last mile of the DSIR recipe (Xie et al. 2023): importance
    RESAMPLING — draw documents with probability proportional to the
    importance weight w(x) = exp(log_weight) from
    ``dsir_importance_weights``, into a token budget.

    Sampling ∝ w without replacement is the Gumbel-top-k trick (the
    log-space twin of the A-ES key in ``weighted_sample_aes``):
    priority = log w + Gumbel noise = log_weight − ln(−ln u), with u
    the exact 48-bit md5 fraction of the doc key — taking the top
    priorities is EXACTLY taking the top A-ES keys u^(1/w), but it
    never materializes exp(log_weight), so huge/tiny weights cannot
    overflow. Selection fills greedily in priority order until the
    token budget is spent (a doc is taken iff the budget was not yet
    exhausted when its turn came).

    Determinism/oracle discipline: the priority is ROUNDED to 6
    decimals BEFORE ordering (doc_id breaks ties), so the selected set
    is identical across engines regardless of libm ULP wobble; the
    running token total is BIGINT-exact via the two-phase global
    cumsum (operators/positions.py — range-partition + in-partition
    window + broadcast prefix offsets; no single-partition funnel).

    Scale shape at 100 TB: the weights are one gram-explode + two
    partial aggs + one equi-join (see dsir_importance_weights); the
    resample adds ONE range-shuffle (the same shuffle any global sort
    needs) and a broadcast of per-partition token totals. Nothing
    quadratic, no UDFs; with a budget much smaller than the corpus
    you'd pre-filter on a priority threshold estimated from a sample
    before the cumsum — the cumsum itself stays fully distributed
    either way."""
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    w = dsir_importance_weights(documents, target_lang=target_lang, buckets=buckets)
    ntok = documents.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("double")
    u = (v + F.lit(1.0)) / F.lit(float(1 << 48))
    pri = F.round(F.col("log_weight") - F.log(-F.log(u)), 6)
    base = (
        w.join(ntok, "doc_id")
        .withColumn("priority", pri)
        .withColumn("__np", -F.col("priority"))
    )
    cum = with_global_cumsum(
        base, [F.col("__np"), F.col("doc_id")], "n_tokens", out_col="cum_tokens"
    )
    return (
        cum.filter(F.col("cum_tokens") - F.col("n_tokens") < F.lit(int(token_budget)))
        .select("doc_id", "n_tokens", "log_weight", "priority", "cum_tokens")
        .orderBy("doc_id")
    )


def ess_report(documents: DataFrame) -> DataFrame:
    """Effective sample size of the token-count importance weights —
    the one-row diagnostic run before trusting any weighted estimate
    (PPS totals, temperature mixtures, A-ES draws):

        ESS = (Σw)² / Σw²       (Kish),  ess_ratio = ESS / n

    A ratio near 1 means the weights are benign; a tiny ratio means a
    few heavy documents dominate every weighted statistic and the
    sampler needs stratification or weight clipping. Both
    accumulations are BIGINT (weights are exact token counts); ESS is
    one divide of two exact integers, the ratio one more — zero
    tolerance. One partial agg, no shuffle beyond it."""
    w = F.size(F.split(F.col("text"), " ")).cast("long")
    return documents.select(w.alias("w")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("sum_w"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sum_w2"),
    ).select(
        "n_docs",
        "sum_w",
        (
            (F.col("sum_w") * F.col("sum_w")).cast("double") / F.col("sum_w2")
        ).alias("ess"),
        (
            (F.col("sum_w") * F.col("sum_w")).cast("double")
            / (F.col("sum_w2") * F.col("n_docs"))
        ).alias("ess_ratio"),
    )


def neyman_allocation(documents: DataFrame, budget: int = 1000) -> DataFrame:
    """Neyman-optimal stratified-sample allocation plan — BEFORE
    drawing a stratified sample, decide how many units each stratum
    gets: proportional to N_h·σ_h (big AND variable strata earn more
    slots), the variance-minimizing allocation for a fixed budget
    (Neyman 1934). This op emits the PLAN (the sampler itself is
    `stratified_sample`); strata = source, y = n_chars.

    σ_h is the population std from two exact BIGINT moments (one
    sqrt, correctly rounded); shares and floor-allocations are pure
    functions of those doubles in identical order both engines —
    zero-tolerance oracle. Shape: one partial agg onto the bounded
    source axis + a one-row broadcast of the denominator."""
    g = documents.groupBy("source").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    nd = F.col("n_rows").cast("double")
    sigma = F.sqrt(
        F.col("s2").cast("double") / nd
        - (F.col("s1").cast("double") / nd) * (F.col("s1").cast("double") / nd)
    )
    scored = g.select("source", "n_rows", sigma.alias("sigma"))
    denom = scored.agg(
        F.sum(F.col("n_rows").cast("double") * F.col("sigma")).alias("__den")
    )
    share = F.col("n_rows").cast("double") * F.col("sigma") / F.col("__den")
    return (
        scored.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_rows",
            F.round("sigma", 9).alias("sigma"),
            share.alias("alloc_share"),
            F.floor(F.lit(float(budget)) * share).cast("long").alias("n_alloc"),
        )
        .orderBy("source")
    )


def epoch_allocation(
    documents: DataFrame, budget: int = 1_000_000, max_epochs: float = 4.0
) -> DataFrame:
    """Data-constrained mixture planning: given a total training token
    budget and an equal per-source target, decide how many EPOCHS
    (repeats) of each source to schedule, capped at ``max_epochs`` —
    past ~4 repeats extra epochs of the same data stop buying loss
    (Muennighoff et al., "Scaling Data-Constrained Language Models",
    2023, arXiv:2305.16264). Low-resource sources hit the cap and
    leave a DEFICIT the planner reports rather than silently
    reallocating (redistribution policy is a caller decision; feed the
    deficit back into ``budget_mixture_sample`` shares).

    Exactness: per-source token totals are one exact BIGINT partial
    agg onto the bounded source axis; epochs/alloc/deficit are
    per-row double arithmetic in identical order on both engines (no
    cross-row float accumulation) — zero-tolerance oracle.

    Columns: source, tokens_available, target_tokens,
    epochs (min(target/available, max_epochs)), alloc_tokens
    (available·epochs), deficit_tokens, achieved_share (alloc/budget).
    """
    from sqlstreamstore_spark.analytics.text import _tokens

    g = documents.groupBy("source").agg(
        F.sum(F.size(_tokens()).cast("long")).cast("long").alias("tokens_available")
    )
    # source count arrives as a broadcast one-row aggregate — building
    # this plan runs NOTHING (the no-jobs-at-build discipline of
    # operators/positions.py); the division is the same single IEEE
    # divide the oracle performs
    ns = g.agg(F.count("*").cast("double").alias("__ns"))
    g = g.crossJoin(F.broadcast(ns))
    target = F.lit(float(budget)) / F.col("__ns")
    avail = F.col("tokens_available").cast("double")
    epochs = F.least(target / avail, F.lit(float(max_epochs)))
    alloc = avail * epochs
    return (
        g.select(
            "source",
            "tokens_available",
            target.alias("target_tokens"),
            epochs.alias("epochs"),
            alloc.alias("alloc_tokens"),
            (target - alloc).alias("deficit_tokens"),
            (alloc / F.lit(float(budget))).alias("achieved_share"),
        )
        .orderBy("source")
    )


def epoch_waterfill(
    documents: DataFrame, budget: int = 1_000_000, max_epochs: float = 4.0
) -> DataFrame:
    """Deficit-REDISTRIBUTING epoch allocation — the closed loop
    :func:`epoch_allocation` leaves open: capped (low-resource)
    sources can't absorb their equal share, so the unused budget
    spills to uncapped sources at a single WATER LEVEL λ (classic
    waterfilling): A_i = min(c_i, λ) with Σ A_i = min(B, Σ c_i),
    where c_i = tokens_i·max_epochs is source i's absorbable
    capacity. With capacities sorted ascending the saturated set is a
    prefix, and source k saturates iff c_k·(n−k+1) ≤ B − P_{k−1}
    (P = capacity prefix sum) — so λ and every allocation fall out of
    ONE cumulative window over the bounded source axis, no iteration.

    Exactness: capacities are one double product of an exact BIGINT;
    the prefix sums run over the same (capacity, source) order on
    both engines (sequential window fold — deterministic float
    order); saturation tests and λ are identical expression trees.
    Zero-tolerance oracle. Scale: every window/aggregate here touches
    n_sources rows (bounded axis), never documents; the only
    corpus-scale pass is the per-source token sum."""
    from sqlstreamstore_spark.analytics.text import _tokens

    b = float(budget)
    me = float(max_epochs)
    g = documents.groupBy("source").agg(
        F.sum(F.size(_tokens()).cast("long")).cast("long").alias("tokens_available")
    )
    cap = (F.col("tokens_available").cast("double") * F.lit(me)).alias("capacity")
    ranked = g.select("source", "tokens_available", cap)
    w = Window.orderBy("capacity", "source")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    wincl = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = ranked.select(
        "source",
        "tokens_available",
        "capacity",
        F.row_number().over(w).cast("long").alias("k"),
        F.coalesce(F.sum("capacity").over(wprev), F.lit(0.0)).alias("p_prev"),
        F.sum("capacity").over(wincl).alias("p_incl"),
    )
    n = ranked.agg(F.count("*").cast("long").alias("__n"))
    ranked = ranked.crossJoin(F.broadcast(n))
    saturated = (
        F.col("capacity") * (F.col("__n") - F.col("k") + F.lit(1)).cast("double")
        <= F.lit(b) - F.col("p_prev")
    )
    ranked = ranked.withColumn("saturated", saturated)
    # __psat is the capacity prefix AT the last saturated rank: the
    # order-free MAX of the (deterministic, sequentially-folded)
    # inclusive prefix — never an unordered float SUM, whose
    # partial-aggregation order could differ between engines
    level_inputs = ranked.agg(
        F.sum(F.when(F.col("saturated"), 1).otherwise(0)).cast("long").alias("__ks"),
        F.coalesce(
            F.max(F.when(F.col("saturated"), F.col("p_incl"))), F.lit(0.0)
        ).alias("__psat"),
    )
    out = ranked.crossJoin(F.broadcast(level_inputs))
    lam = F.when(
        F.col("__ks") < F.col("__n"),
        (F.lit(b) - F.col("__psat"))
        / (F.col("__n") - F.col("__ks")).cast("double"),
    )
    alloc = F.when(F.col("saturated"), F.col("capacity")).otherwise(
        F.least(F.col("capacity"), lam)
    )
    return (
        out.select(
            "source",
            "tokens_available",
            "capacity",
            "saturated",
            lam.alias("water_level"),
            alloc.alias("alloc_tokens"),
            (alloc / F.col("tokens_available").cast("double")).alias("epochs"),
        )
        .orderBy("source")
    )


def kfold_assign(df: DataFrame, key: str = "doc_id", k: int = 5) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    content-hash bucket mod k — the same hash-determinism contract as
    every sampler here (a row's fold is a pure function of its
    identity: stable across runs, engines, partitionings, and
    incremental arrivals, so fold i's model never trains on a row
    that later drifts into its validation fold). One narrow
    projection; no shuffle, no RNG."""
    return df.select(
        key,
        (_hash_bucket(F.col(key)) % k).cast("long").alias("fold"),
    ).orderBy(key)
