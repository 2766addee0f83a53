"""Behavioral pins for the curation/monitoring operators added in
round 3d: n-gram novelty, the KMV distinct sketch, and the daily
count-anomaly monitor (edges the row-level DuckDB oracle can't
isolate: exact-copy novelty, sketch error bounds, z-score guards)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlstreamstore_spark.analytics.events import daily_anomaly
from sqlstreamstore_spark.analytics.text import kmv_distinct_ngrams, ngram_novelty
from sqlstreamstore_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_novelty_first_doc_is_one_copy_is_zero(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),          # exact copy -> novelty 0
            (3, "x y z w v"),          # disjoint -> novelty 1
            (4, "a b c x y z q r s"),  # mixes seen + new grams
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in ngram_novelty(docs).collect()}
    assert rows[1].novelty == 1.0 and rows[1].n_seen == 0
    assert rows[2].novelty == 0.0 and rows[2].n_seen == rows[2].n_grams
    assert rows[3].novelty == 1.0
    # doc 4: grams 'a b c' and 'x y z' seen (from docs 1/3), rest new
    assert rows[4].n_seen == 2 and 0.0 < rows[4].novelty < 1.0


def test_novelty_is_order_dependent_by_doc_id(spark):
    """Novelty attributes each gram to its min-doc_id owner, regardless
    of row order in the input."""
    docs = spark.createDataFrame(
        [(10, "p q r s"), (2, "p q r s")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in ngram_novelty(docs).collect()}
    assert rows[2].novelty == 1.0
    assert rows[10].novelty == 0.0


def test_kmv_estimate_tracks_exact_count(spark):
    docs = load_table(spark, SF, "documents")
    row = kmv_distinct_ngrams(docs, k=64).first()
    assert row.n_exact > 0 and row.k == 64
    # KMV standard error ~ 1/sqrt(k-2) ~ 13% at k=64; allow 4 sigma
    assert abs(row.rel_err) < 0.52
    # deterministic: same inputs, same estimate
    again = kmv_distinct_ngrams(docs, k=64).first()
    assert again.kmv_estimate == row.kmv_estimate


def test_kmv_small_domain_reports_exact(spark):
    """Below k distinct values the sketch holds the whole domain and
    reports its exact size (the standard KMV degenerate rule)."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    row = kmv_distinct_ngrams(docs, k=64).first()
    assert row.n_exact == 6  # 8 tokens -> 6 distinct 3-grams
    assert row.kmv_estimate == 6.0 and row.rel_err == 0.0


def test_daily_anomaly_constant_counts_zero_z(spark):
    events = spark.createDataFrame(
        [("click", f"2024-01-0{d}T00:00:0{i}") for d in range(1, 6) for i in range(3)],
        "event_type string, iso string",
    ).select("event_type", F.col("iso").cast("timestamp").alias("ts"))
    rows = daily_anomaly(events).collect()
    assert len(rows) == 5
    assert all(r.n == 3 and r.z == 0.0 and r.ma7 == 3.0 for r in rows)


def test_daily_anomaly_flags_spike_and_ma7_window(spark):
    # 6 quiet days of 2 events, then a 20-event spike
    data = [("buy", f"2024-01-0{d}T00:00:{i:02d}") for d in range(1, 7) for i in range(2)]
    data += [("buy", f"2024-01-07T00:00:{i:02d}") for i in range(20)]
    events = spark.createDataFrame(
        data, "event_type string, iso string"
    ).select("event_type", F.col("iso").cast("timestamp").alias("ts"))
    rows = daily_anomaly(events).collect()
    by_day = {r.day.day: r for r in rows}
    assert by_day[7].z > 2.0
    assert all(by_day[d].z < 0.0 for d in range(1, 7))
    # trailing 7-day MA on day 7 covers all days: (6*2 + 20)/7
    assert abs(by_day[7].ma7 - (32.0 / 7.0)) < 1e-12
    # day 3's MA covers only days 1-3
    assert by_day[3].ma7 == 2.0


def test_gap_fill_inserts_zero_days(spark):
    from sqlstreamstore_spark.analytics.events import daily_gap_fill

    events = spark.createDataFrame(
        [("click", "2024-01-01T08:00:00"), ("click", "2024-01-04T09:00:00"),
         ("click", "2024-01-04T10:00:00"), ("buy", "2024-02-01T00:00:00")],
        "event_type string, iso string",
    ).select("event_type", F.col("iso").cast("timestamp").alias("ts"))
    rows = daily_gap_fill(events).collect()
    clicks = [(r.day.day, r.n) for r in rows if r.event_type == "click"]
    # full spine 1..4 with explicit zeros on the silent days
    assert clicks == [(1, 1), (2, 0), (3, 0), (4, 2)]
    buys = [(r.day.month, r.n) for r in rows if r.event_type == "buy"]
    assert buys == [(2, 1)]  # single-day spine, no padding beyond range


def test_pps_systematic_multiplicity_and_total(spark):
    from sqlstreamstore_spark.analytics.sampling import pps_systematic_sample

    docs = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 1000), (4, 10), (5, 30)],
        "doc_id long, n_chars int",
    )
    k = 8
    rows = pps_systematic_sample(docs, k=k).collect()
    by_id = {r.doc_id: r.multiplicity for r in rows}
    # total multiplicity is exactly k; the dominant doc absorbs most points
    assert sum(by_id.values()) == k
    assert by_id[3] >= 6
    assert 2 not in by_id  # zero weight -> empty interval, never selected


def test_pps_matches_python_twin(spark):
    """Differential vs a direct pure-Python enumeration of the k sample
    points over the real fixture."""
    from sqlstreamstore_spark.analytics.sampling import pps_systematic_sample

    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    k = 37
    rows = pps_systematic_sample(docs, k=k).collect()
    data = sorted((r.doc_id, r.n_chars) for r in docs.collect())
    total = sum(w for _, w in data)
    points = [total * (2 * i + 1) // (2 * k) for i in range(k)]
    expect: dict[int, int] = {}
    cum = 0
    pi = 0
    for doc_id, w in data:
        lo, cum = cum, cum + w
        while pi < len(points) and lo <= points[pi] < cum:
            expect[doc_id] = expect.get(doc_id, 0) + 1
            pi += 1
    assert {r.doc_id: r.multiplicity for r in rows} == expect


def test_kmv_sketches_merge_by_union_and_rerank(spark):
    """The property that makes KMV the right distributed sketch: two
    groups' k-minimum sets merged by union + re-rank equal the sketch
    built over the union directly."""
    from sqlstreamstore_spark.analytics.text import kmv_distinct_ngrams_by_source

    docs = load_table(spark, SF, "documents")
    k = 16
    half_a = docs.filter(F.col("doc_id") % 2 == 0).withColumn("source", F.lit("all"))
    half_b = docs.filter(F.col("doc_id") % 2 == 1).withColumn("source", F.lit("all"))
    whole = docs.withColumn("source", F.lit("all"))
    direct = kmv_distinct_ngrams_by_source(whole, k=k).first()
    merged = kmv_distinct_ngrams_by_source(half_a.unionAll(half_b), k=k).first()
    assert merged.kmv_estimate == direct.kmv_estimate
    assert merged.n_exact == direct.n_exact


def test_jaccard_prefix_plan_shape(spark):
    """The prefix path's verify runs on per-doc sets (array_intersect)
    with windowed-prefix candidate generation — never a cartesian."""
    from sqlstreamstore_spark.analytics.dedup import jaccard_prefix_pairs
    from tests.test_plans import plan_of

    docs = load_table(spark, SF, "documents")
    p = plan_of(jaccard_prefix_pairs(docs))
    assert "array_intersect" in p
    assert "row_number" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_cumulative_reach_counts_first_days(spark):
    from sqlstreamstore_spark.analytics.events import cumulative_reach

    events = spark.createDataFrame(
        [
            (1, "2024-01-01T10:00:00"), (1, "2024-01-03T10:00:00"),
            (2, "2024-01-01T11:00:00"),
            (3, "2024-01-03T09:00:00"), (3, "2024-01-04T09:00:00"),
        ],
        "user_id long, iso string",
    ).select("user_id", F.col("iso").cast("timestamp").alias("ts"))
    rows = cumulative_reach(events).collect()
    assert [(r.day.day, r.new_users, r.cumulative_users) for r in rows] == [
        (1, 2, 2), (3, 1, 3)]


def test_dq_operators_catch_planted_violations(spark):
    from sqlstreamstore_spark.analytics.quality import (
        duplicate_keys,
        profile_columns,
        referential_orphans,
    )

    fact = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk int"
    )
    dim = spark.createDataFrame([(10,), (20,)], "pk int")

    prof = {r.col_name: r for r in profile_columns(fact, ["id", "fk"]).collect()}
    assert prof["fk"].n_nulls == 1 and prof["fk"].n_distinct == 2
    assert prof["id"].n_nulls == 0 and prof["id"].n_distinct == 4

    orphans = referential_orphans([("fact->dim", fact, "fk", dim, "pk")]).collect()
    # 99 has no match; the NULL fk is excluded (dbt relationship-test
    # convention: missing fks are a not-null violation, not referential)
    assert [(r.check, r.n_orphans) for r in orphans] == [("fact->dim", 1)]

    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"), (3, "f")],
        "k long, v string",
    )
    rows = duplicate_keys([
        ("dup.k", dup, ["k"]),
        ("dup.(k,v)", dup, ["k", "v"]),
    ]).collect()
    got = {r.check: (r.n_duplicated_keys, r.n_surplus_rows) for r in rows}
    assert got["dup.k"] == (2, 3)      # keys 1 (x3) and 3 (x2)
    assert got["dup.(k,v)"] == (0, 0)  # composite key is unique


def test_fixed_size_sample_deterministic_and_topk_plan(spark):
    from sqlstreamstore_spark.analytics.sampling import fixed_size_sample
    from tests.test_plans import plan_of

    docs = load_table(spark, SF, "documents")
    a = sorted(r.doc_id for r in fixed_size_sample(docs, "doc_id", 50).collect())
    b = sorted(
        r.doc_id
        for r in fixed_size_sample(docs.repartition(7), "doc_id", 50).collect()
    )
    assert len(a) == 50 and a == b  # size-exact, partitioning-independent
    p = plan_of(fixed_size_sample(docs, "doc_id", 50))
    assert "TakeOrderedAndProject" in p  # per-partition heaps, no global sort


def test_jsonl_export_roundtrip_and_fingerprints(spark, tmp_path):
    """JSONL shards round-trip through spark.read.json, the manifest's
    per-shard fingerprints recompute from the written files, and a
    second export of the same input is byte-identical in manifest."""
    from sqlstreamstore_spark.analytics.pipeline import export_jsonl_shards

    docs = load_table(spark, SF, "documents").select("doc_id", "text", "source")
    out = export_jsonl_shards(docs, str(tmp_path / "jsonl"), shard_rows=200)
    assert out["n_rows"] == docs.count()
    assert out["n_shards"] == (out["n_rows"] + 199) // 200

    back = spark.read.json(str(tmp_path / "jsonl"))
    assert back.count() == out["n_rows"]
    # the underscore-prefixed manifest is invisible to Spark readers:
    # no _corrupt_record column infers into the consumer's schema
    assert "_corrupt_record" not in back.columns
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.collect()}

    # recompute a shard's fingerprint from the raw lines
    lines = spark.read.text(str(tmp_path / "jsonl") + "/shard_id=0")
    fp = lines.select(
        F.sum(F.conv(F.substring(F.md5("value"), 1, 15), 16, 10)
              .cast("decimal(38,0)"))
    ).first()[0]
    assert str(int(fp)) == out["manifest"]["shards"]["0"]["fingerprint"]

    out2 = export_jsonl_shards(docs, str(tmp_path / "jsonl2"), shard_rows=200)
    assert out2["manifest"] == out["manifest"]


def test_kmv_error_shrinks_as_inverse_sqrt_k(spark):
    """The accuracy CLAIM, not just determinism: KMV's relative error
    is ~1/sqrt(k-2), so quadrupling k should roughly halve it. Build
    salted synthetic corpora with a large known distinct-gram domain,
    measure mean |rel_err| at k = 16 / 64 / 256 over the salts, and pin
    (a) each mean inside 2.5x the theoretical standard error and
    (b) the k=256 mean strictly below the k=16 mean."""
    ks = (16, 64, 256)
    salts = ("p", "q", "r")
    mean_err = {}
    for k in ks:
        errs = []
        for salt in salts:
            docs = spark.createDataFrame(
                [(i, " ".join(f"{salt}{i}x{j}" for j in range(30)))
                 for i in range(200)],
                "doc_id long, text string",
            )
            row = kmv_distinct_ngrams(docs, k=k).first()
            assert row.n_exact == 200 * 28  # all grams distinct by construction
            errs.append(abs(row.rel_err))
        mean_err[k] = sum(errs) / len(errs)
        assert mean_err[k] <= 2.5 / (k - 2) ** 0.5, (k, errs)
    assert mean_err[256] < mean_err[16], mean_err


def test_budget_mixture_accounting_and_selection(spark):
    """Budget-driven mixture: a tiny budget clamps the source near its
    budget in expectation; an over-budget source keeps everything
    (threshold 65536); the accounting summary and the selected rows
    agree; selection is deterministic across calls."""
    from sqlstreamstore_spark.analytics.sampling import (
        budget_mixture_sample,
        selected_by_budget,
    )

    docs = load_table(spark, SF, "documents")
    budgets = {"src0": 50, "src1": 10**6}
    summary = {r.src: r for r in
               budget_mixture_sample(docs, budgets, default_budget=200).collect()}

    full = {r.src: r for r in
            budget_mixture_sample(docs, {}, default_budget=10**9).collect()}
    # over-budget source keeps everything
    s1 = summary["src1"]
    assert s1.threshold == 65536 and s1.n_selected == s1.n_docs
    assert s1.tokens_selected == full["src1"].total_tokens
    # tightly budgeted source selects a strict subset, threshold derived
    s0 = summary["src0"]
    assert 0 <= s0.threshold < 65536
    assert s0.threshold == min(65536, s0.budget * 65536 // s0.total_tokens)
    assert s0.n_selected < s0.n_docs

    # selected rows agree with the accounting
    sel = selected_by_budget(docs, budgets, default_budget=200)
    per_src = {r["source"]: r["n"] for r in
               sel.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, row in summary.items():
        assert per_src.get(src, 0) == row.n_selected, src

    # deterministic: same inputs, same selection
    again = {r.src: r.n_selected for r in
             budget_mixture_sample(docs, budgets, default_budget=200).collect()}
    assert again == {s: r.n_selected for s, r in summary.items()}


def test_bigram_logprob_matches_python_and_is_order_sensitive(spark):
    """Differential vs a pure-Python add-one bigram LM on a handcrafted
    corpus, plus the property the unigram model can't have: a document
    with the corpus's common word ORDER outscores its shuffled twin
    (identical unigram histogram)."""
    import math

    from sqlstreamstore_spark.analytics.text import bigram_logprob

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "the dog sat on the mat"),
        (4, "mat the on sat cat the"),  # shuffled twin of doc 1
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logprob(docs).collect()}

    # pure-python replay
    grams, ctx, vocab = {}, {}, set()
    for _, t in corpus:
        w = t.split(" ")
        vocab.update(w)
        for p, c in zip(w, w[1:]):
            grams[(p, c)] = grams.get((p, c), 0) + 1
    for (p, _), n in grams.items():
        ctx[p] = ctx.get(p, 0) + n
    for did, t in corpus:
        w = t.split(" ")
        lp = [
            math.log((grams[(p, c)] + 1) / (ctx[p] + len(vocab)))
            for p, c in zip(w, w[1:])
        ]
        exp = sum(lp) / len(lp)
        assert out[did].n_bigrams == len(lp)
        assert abs(out[did].avg_logprob - exp) < 1e-6, (did, exp)

    assert out[1].avg_logprob > out[4].avg_logprob + 0.3


def test_collocations_pmi_matches_python(spark):
    """Full differential vs a pure-Python PMI on a handcrafted corpus;
    the planted always-adjacent pair must outrank independent fillers."""
    import math

    from sqlstreamstore_spark.analytics.text import collocations_pmi

    corpus = [
        (i, "new york " + ("the a of " * 4).strip()) for i in range(1, 6)
    ] + [(j, "a the of new the york a of the a") for j in range(6, 11)]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = collocations_pmi(docs, min_count=2, k=10).collect()

    grams, cs, ce = {}, {}, {}
    for _, t in corpus:
        w = t.split(" ")
        for p, c in zip(w, w[1:]):
            grams[(p, c)] = grams.get((p, c), 0) + 1
    for (p, c), n in grams.items():
        cs[p] = cs.get(p, 0) + n
        ce[c] = ce.get(c, 0) + n
    nb = sum(grams.values())
    exp = sorted(
        (
            ((n * nb) / (cs[p] * ce[c]), p, c, n)
            for (p, c), n in grams.items()
            if n >= 2
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:10]
    assert [(r.prev, r.cur, r.cb) for r in out] == [(p, c, n) for _, p, c, n in exp]
    for r, (lift, p, c, n) in zip(out, exp):
        assert abs(r.pmi - math.log(lift)) < 1e-6
    # the planted bigram is the top collocation
    assert (out[0].prev, out[0].cur) == ("new", "york")


def test_group_split_no_leakage_and_stability(spark):
    """Every group lands in exactly ONE split; assignments are stable
    when other groups arrive (incremental-arrival property); fractions
    land near the targets."""
    from sqlstreamstore_spark.analytics.sampling import group_split

    ev = spark.range(10_000).select(
        F.col("id").alias("event_id"), (F.col("id") % 1000).alias("user_id")
    )
    out = group_split(ev, "user_id")
    leaks = (
        out.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leaks == 0
    # stability: assignment of the kept half is identical when the
    # other half of the groups is absent
    half = ev.filter(F.col("user_id") % 2 == 0)
    full_map = {r.user_id: r.split for r in out.select("user_id", "split").distinct().collect()}
    half_map = {
        r.user_id: r.split
        for r in group_split(half, "user_id").select("user_id", "split").distinct().collect()
    }
    assert all(full_map[u] == s for u, s in half_map.items())
    fr = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(fr.values())
    assert 0.6 < fr.get("train", 0) / total < 0.95
    assert fr.get("val", 0) > 0 and fr.get("test", 0) > 0


def test_quantile_normalize_python_differential(spark):
    """Full pure-Python replay of the calibration on the fixture: per-
    source rank → pooled value at ceil(((r-0.5)/Ns)*Np); plus the
    structural properties (calibrated ⊆ pooled scores, monotone within
    source)."""
    import math

    from sqlstreamstore_spark.analytics.pipeline import quantile_normalize_scores
    from sqlstreamstore_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    out = {r.doc_id: r for r in quantile_normalize_scores(docs).collect()}
    rows = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "source", "text"
    ).collect()
    scored = [
        (r.doc_id, r.source, len(set(r.text.split(" "))) / len(r.text.split(" ")))
        for r in rows
    ]
    pooled = sorted(s for _, _, s in scored)
    by_src = {}
    for d, src, s in scored:
        by_src.setdefault(src, []).append((s, d))
    for src, pairs in by_src.items():
        pairs.sort()
        ns = len(pairs)
        for r0, (s, d) in enumerate(pairs, start=1):
            k = math.ceil(((r0 - 0.5) / ns) * len(pooled))
            exp = pooled[k - 1]
            got = out[d]
            assert got.score == s and got.calibrated == exp, (d, got, exp)
    cal = {r.calibrated for r in out.values()}
    assert cal <= set(pooled)


def test_bm25_matches_python_and_ranks_relevance(spark):
    """Pure-Python BM25 replay on a handcrafted corpus; a doc saturated
    with a rare query term must outscore one with a single mention, and
    longer docs are length-penalized at equal tf."""
    import math

    from sqlstreamstore_spark.analytics.text import bm25_scores

    corpus = [
        (1, "cat cat cat dog"),                      # tf-rich
        (2, "cat filler filler filler"),             # single mention
        (3, "cat " + " ".join(["pad"] * 39)),        # long doc, tf=1
        (4, "dog dog bird"),                         # no query term hit for 'cat' only
        (5, "bird bird bird"),                       # no match at all
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r.doc_id: r for r in bm25_scores(docs, query_terms=("cat",)).collect()}
    assert set(out) == {1, 2, 3}

    k1, b = 1.2, 0.75
    lens = {d: len(t.split(" ")) for d, t in corpus}
    n_docs, total = len(corpus), sum(lens.values())
    avg = total / n_docs
    dfq = 3  # docs containing 'cat'
    idf = math.log(1.0 + (n_docs - dfq + 0.5) / (dfq + 0.5))
    for d, tf in ((1, 3), (2, 1), (3, 1)):
        exp = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * lens[d] / avg))
        assert abs(out[d].bm25 - round(exp, 6)) < 1e-6, (d, exp)
    assert out[1].bm25 > out[2].bm25 > out[3].bm25


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_classifier_score_matches_python_replay(spark):
    import hashlib

    from sqlstreamstore_spark.analytics.pipeline import classifier_score

    rows = [
        (1, "alpha beta gamma", "en", "web", 16),
        (2, "alpha alpha", "en", "web", 11),
        (3, "delta", "en", "web", 5),
    ]

    def w(tok):
        return int(hashlib.md5(f"clf:{tok}".encode()).hexdigest()[:8], 16) % 1001 - 500

    got = {r.doc_id: r for r in classifier_score(_docs(spark, rows)).collect()}
    for doc_id, text, *_ in rows:
        toks = text.split(" ")
        num = sum(w(t) for t in toks)
        assert got[doc_id].score_num == num
        assert got[doc_id].n_tokens == len(toks)
        assert got[doc_id].score == num / len(toks)
        assert got[doc_id].verdict == ("keep" if num > 0 else "drop")
    # duplicate tokens count with multiplicity
    assert got[2].score_num == 2 * w("alpha")


def test_classifier_score_plan_is_shuffle_free(spark):
    from sqlstreamstore_spark.analytics.pipeline import classifier_score

    df = _docs(spark, [(1, "a b", "en", "web", 3)])
    plan = (
        classifier_score(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # inference is map-side: the only exchange is the final orderBy's
    # range partitioning — no hash-partition shuffle anywhere
    assert "hashpartitioning" not in plan


def test_k_anonymity_flags_small_classes(spark):
    from sqlstreamstore_spark.analytics.quality import k_anonymity_report

    rows = (
        # 6 docs in one equivalence class (en, web, bucket 100) -> safe
        [(i, "x", "en", "web", 150) for i in range(6)]
        # 2 docs in (fr, web, bucket 100) -> risky at k=5
        + [(10, "x", "fr", "web", 120), (11, "x", "fr", "web", 199)]
        # 1 doc alone -> risky
        + [(20, "x", "de", "api", 730)]
    )
    out = {(r.lang, r.source, r.chars_bucket): r for r in
           k_anonymity_report(_docs(spark, rows)).collect()}
    assert out[("en", "web", 100)].class_size == 6
    assert out[("en", "web", 100)].risky is False
    assert out[("fr", "web", 100)].class_size == 2
    assert out[("fr", "web", 100)].risky is True
    assert out[("de", "api", 700)].risky is True
    assert abs(out[("en", "web", 100)].share - 6 / 9) < 1e-15


def test_golden_records_survivorship_rules(spark):
    from sqlstreamstore_spark.analytics.dedup import golden_records

    rows = [
        # cluster A: same vocabulary, shuffled order / repeated words;
        # doc 2 is longest -> survivor; sources merged sorted
        (1, "red green blue", "en", "web", 14),
        (2, "blue blue red green red", "en", "api", 23),
        (3, "green red blue", "en", "web", 14),
        # cluster B: tie on n_chars -> lowest doc_id survives
        (10, "solo dup", "en", "web", 8),
        (11, "dup solo", "en", "web", 8),
        # singleton: never emitted
        (20, "unique words here", "en", "web", 17),
    ]
    out = golden_records(_docs(spark, rows)).collect()
    assert len(out) == 2
    by_members = {r.n_members: r for r in out}
    a = by_members[3]
    assert a.survivor_doc_id == 2 and a.survivor_chars == 23
    assert a.sources == "api,web"
    b = by_members[2]
    assert b.survivor_doc_id == 10 and b.sources == "web"
