"""Round-9 additions: the INCREMENTAL flagship (daily-crawl twin of
e2e_corpus_pipeline — VERDICT r8 #4), the probe-with-survivors
equivalence both incremental stages rely on, and the re-ingest
self-pair guard on the maintained LSH index (ADVICE r8 #3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlstreamstore_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = load_table(spark, SF, "documents").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def split(docs, emb):
    return (
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
        emb.filter(F.col("vec_id") % 10 == 0),
        emb.filter(F.col("vec_id") % 10 != 0),
    )


@pytest.fixture(scope="module")
def indexes(spark, split, tmp_path_factory):
    from sqlstreamstore_spark.analytics import dedup, similarity

    _, corpus, _, corpus_emb = split
    base = tmp_path_factory.mktemp("r9idx")
    mh = str(base / "mh")
    ivf = str(base / "ivf")
    dedup.build_minhash_index(corpus, mh)
    cents = similarity.build_ivf_index(corpus_emb, ivf, n_clusters=8)
    return mh, ivf, cents


def test_incremental_flagship_lineage(spark, split, indexes):
    """9 stages, counts monotone non-increasing through the filter
    chain, delta_raw = the incoming slice, and the fuzzy/semantic
    stages actually bite on the fixture (the split was chosen so the
    corpus holds near-dups of the delta)."""
    from sqlstreamstore_spark.analytics.pipeline import e2e_incremental_pipeline

    incoming, corpus, inc_emb, _ = split
    mh, ivf, cents = indexes
    rows = e2e_incremental_pipeline(
        spark, incoming, corpus, inc_emb, mh, ivf, cents, default_budget=800
    ).collect()
    assert [r.stage_no for r in rows] == list(range(9))
    assert [r.stage for r in rows] == [
        "delta_raw", "quality", "exact_dedup", "exact_new", "fuzzy_new",
        "semantic_new", "budget_sample", "packed", "sharded",
    ]
    counts = {r.stage: r.n_rows for r in rows}
    assert counts["delta_raw"] == incoming.count()
    chain = ["quality", "exact_dedup", "exact_new", "fuzzy_new",
             "semantic_new", "budget_sample"]
    for a, b in zip(chain, chain[1:]):
        assert counts[b] <= counts[a], (a, b, counts)
    assert counts["semantic_new"] < counts["exact_new"], (
        "fixture must exercise the index probes", counts
    )
    assert counts["sharded"] <= counts["packed"]


def test_probe_with_survivors_equals_probe_all(spark, split, indexes):
    """The equivalence both incremental stages (and the DuckDB twin)
    rely on: probing the index with a SUBSET of the delta yields
    exactly the subset's rows of the full-delta probe — each new doc's
    verdict is independent of every other new doc because the index
    holds only corpus entries."""
    from sqlstreamstore_spark.analytics.dedup import minhash_dedup_incremental
    from sqlstreamstore_spark.analytics.similarity import near_dup_against_ivf_index

    incoming, corpus, inc_emb, _ = split
    mh, ivf, cents = indexes

    full = minhash_dedup_incremental(spark, mh, incoming, corpus, threshold=0.2)
    subset = incoming.filter(F.col("doc_id") % 20 == 0)
    part = minhash_dedup_incremental(spark, mh, subset, corpus, threshold=0.2)
    keep = {r.doc_id for r in subset.select("doc_id").collect()}
    assert {tuple(r) for r in part.collect()} == {
        tuple(r) for r in full.collect() if r.new_doc in keep
    }

    sfull = near_dup_against_ivf_index(
        spark, ivf, inc_emb, threshold=0.35, centroids=cents
    )
    ssub_q = inc_emb.filter(F.col("vec_id") % 20 == 0)
    spart = near_dup_against_ivf_index(
        spark, ivf, ssub_q, threshold=0.35, centroids=cents
    )
    skeep = {r.vec_id for r in ssub_q.select("vec_id").collect()}
    assert {tuple(r) for r in spart.collect()} == {
        tuple(r) for r in sfull.collect() if r.new_vec in skeep
    }


def test_reingested_doc_is_not_its_own_near_dup(spark, split, tmp_path):
    """ADVICE r8 #3: after upsert_minhash_index appends a delta's band
    rows, re-probing with that same delta must NOT report each doc as
    a jaccard=1.0 near-dup of itself (the keep/drop-on-ingest poison);
    true cross-doc near-dups still surface."""
    from sqlstreamstore_spark.analytics.dedup import (
        minhash_dedup_incremental,
        upsert_minhash_index,
    )

    incoming, corpus, _, _ = split
    mh = str(tmp_path / "mh2")
    from sqlstreamstore_spark.analytics.dedup import build_minhash_index

    build_minhash_index(corpus, mh)
    upsert_minhash_index(incoming, mh)
    # the maintained index now contains the delta itself
    rep = minhash_dedup_incremental(
        spark, mh, incoming, corpus.unionByName(incoming), threshold=0.2
    )
    rows = rep.collect()
    assert all(r.new_doc != r.old_doc for r in rows)
    # and the guard removed ONLY self-pairs: the corpus-side matches
    # of the index-without-delta probe all survive
    base = minhash_dedup_incremental(spark, mh, incoming, corpus, threshold=0.2)
    base_pairs = {(r.new_doc, r.old_doc) for r in base.collect()
                  if r.old_doc % 10 != 0}
    assert base_pairs <= {(r.new_doc, r.old_doc) for r in rows}


def test_pack_seq_bounds_use_integral_div(spark):
    """ADVICE r8 #2 regression pin: the packers' seq-id bounds use
    BIGINT DIV, which stays exact where floor(double-division) breaks
    (global token offsets past 2^53). Pins the exact expression shape
    the operators build."""
    # 2^61 - 1 rounds UP to 2^61 as a double, crossing a multiple-of-b
    # boundary: floor(double/b) reads 2^52 where exact division reads
    # 2^52 - 1 — a doc shifted one whole sequence
    x = (1 << 61) - 1
    b = 512
    row = (
        spark.range(1)
        .selectExpr(
            f"CAST({x} AS BIGINT) AS cum",
            f"CAST({x} AS BIGINT) DIV {b} AS div_exact",
            f"CAST(floor(CAST({x} AS BIGINT) / {b}) AS BIGINT) AS div_float",
        )
        .collect()[0]
    )
    assert row.div_exact == x // b
    assert row.div_float != x // b, (
        "if double division became exact here, the pin is stale"
    )
    # and the operator path itself emits no floor(/) on the seq bounds
    from sqlstreamstore_spark.analytics.pipeline import (
        pack_sequences,
        pack_sequences_spans,
    )
    from sqlstreamstore_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    for op in (pack_sequences, pack_sequences_spans):
        plan = op(docs)._jdf.queryExecution().optimizedPlan().toString()
        assert "FLOOR" not in plan.upper() or "div" in plan, plan[:500]


def test_extend_components_matches_full_recompute(spark):
    """The contraction identity behind incremental SemDeDup cluster
    maintenance: extending a corpus labeling with delta edges equals
    CC over the union graph — including the two tricky merges: a new
    node BRIDGING two existing components, and a new node whose id is
    SMALLER than an existing component's min (it takes over as the
    component id, exactly as a full recompute would)."""
    from sqlstreamstore_spark.analytics.dedup import (
        connected_components,
        extend_components,
    )

    schema = "doc_a long, doc_b long"
    corpus_edges = spark.createDataFrame([(1, 2), (5, 6), (8, 9)], schema)
    labels = connected_components(corpus_edges)
    # 3 bridges comps {1,2} and {5,6} -> all become comp 1;
    # (10,11) is a pure new-new pair -> comp 10;
    # 0 joins comp {8,9} and, being smaller, becomes its id
    new_edges = spark.createDataFrame(
        [(3, 2), (3, 5), (10, 11), (0, 8)], schema
    )
    updated = {
        r.doc_id: r.comp for r in extend_components(labels, new_edges).collect()
    }
    full = {
        r.doc_id: r.comp
        for r in connected_components(corpus_edges.unionByName(new_edges)).collect()
    }
    assert updated == full
    assert updated[6] == 1 and updated[3] == 1  # bridge merged
    assert updated[11] == 10                    # new-new pair
    assert updated[8] == 0 and updated[9] == 0  # id takeover

    # no new edges: labeling unchanged
    empty = spark.createDataFrame([], schema)
    same = {r.doc_id: r.comp for r in extend_components(labels, empty).collect()}
    assert same == {r.doc_id: r.comp for r in labels.collect()}


def test_digest_index_path_equals_corpus_scan(spark, split, indexes, tmp_path):
    """The materialized digest index (round-9 third index tier) is a
    pure substitution: the flagship's lineage is identical whether the
    exact stage reads the index or re-hashes the corpus."""
    from sqlstreamstore_spark.analytics.dedup import (
        build_digest_index,
        upsert_digest_index,
    )
    from sqlstreamstore_spark.analytics.pipeline import e2e_incremental_pipeline

    incoming, corpus, inc_emb, _ = split
    mh, ivf, cents = indexes
    dpath = str(tmp_path / "digests")
    build_digest_index(corpus, dpath)
    via_scan = e2e_incremental_pipeline(
        spark, incoming, corpus, inc_emb, mh, ivf, cents, default_budget=800
    ).collect()
    via_index = e2e_incremental_pipeline(
        spark, incoming, corpus, inc_emb, mh, ivf, cents, default_budget=800,
        corpus_digest_path=dpath,
    ).collect()
    assert via_scan == via_index

    # upsert is the monoid append: index(corpus) + upsert(delta) covers
    # corpus ∪ delta — a re-sent delta then dies at the exact stage
    upsert_digest_index(incoming, dpath)
    replay = e2e_incremental_pipeline(
        spark, incoming, corpus, inc_emb, mh, ivf, cents, default_budget=800,
        corpus_digest_path=dpath,
    ).collect()
    counts = {r.stage: r.n_rows for r in replay}
    assert counts["exact_new"] == 0


def test_compact_index_collapses_duplicates_and_files(spark, split, tmp_path):
    """build → upsert(re-sent slice) → compact: duplicate band rows
    collapse back to the original build's distinct set, the file count
    shrinks to ~one per band partition, and the probe is unchanged."""
    import os

    from sqlstreamstore_spark.analytics import dedup

    incoming, corpus, _, _ = split
    path = str(tmp_path / "mh_compact")
    dedup.build_minhash_index(corpus, path)
    baseline = spark.read.parquet(path)
    n_distinct = baseline.count()
    assert baseline.distinct().count() == n_distinct  # build is dup-free

    resent = corpus.filter(F.col("doc_id") % 10 == 5)
    dedup.upsert_minhash_index(resent, path)
    inflated = spark.read.parquet(path).count()
    assert inflated > n_distinct  # the re-sent delta really duplicated rows

    def n_files(p):
        return sum(
            1
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    files_before = n_files(path)
    probe_before = dedup.minhash_dedup_incremental(
        spark, path, incoming, corpus, threshold=0.2
    ).collect()

    dedup.compact_index(spark, path, partition_by="band")
    after = spark.read.parquet(path)
    assert after.count() == n_distinct
    # partition column survives the rewrite with the full band range
    assert after.select("band").distinct().count() == 8
    assert n_files(path) < files_before
    probe_after = dedup.minhash_dedup_incremental(
        spark, path, incoming, corpus, threshold=0.2
    ).collect()
    assert probe_after == probe_before


def test_compact_index_flat_layout(spark, split, tmp_path):
    """The flat (unpartitioned) digest index compacts to
    target_partitions files with set semantics intact."""
    import os

    from sqlstreamstore_spark.analytics import dedup

    incoming, corpus, _, _ = split
    path = str(tmp_path / "digests")
    dedup.build_digest_index(corpus, path)
    want = {r["__h"] for r in spark.read.parquet(path).collect()}
    dedup.upsert_digest_index(corpus.filter(F.col("doc_id") % 10 == 7), path)
    dedup.compact_index(spark, path, target_partitions=1)
    got = spark.read.parquet(path)
    assert {r["__h"] for r in got.collect()} == want
    assert got.count() == len(want)
    n_files = sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    assert n_files == 1


def test_term_index_merge_equals_rebuild(spark, split, tmp_path):
    """The vocabulary monoid: disjoint-batch partial (token, tf, df)
    rows merged by groupBy-sum equal the single-pass full recompute —
    including df, because each doc lives in exactly one batch."""
    from sqlstreamstore_spark.analytics import text

    incoming, corpus, _, _ = split
    path = str(tmp_path / "terms")
    text.build_term_index(corpus, path)
    text.upsert_term_index(incoming, path)
    merged = text.vocabulary_from_index(spark, path, limit=10_000).collect()
    full = text.corpus_vocabulary(corpus.unionByName(incoming), limit=10_000).collect()
    assert merged == full


def test_curriculum_order_properties(spark, docs):
    """Dense 0-based train_order, stages equal-count (±1), difficulty
    monotone along the order, deterministic tiebreak by doc_id."""
    from sqlstreamstore_spark.analytics.pipeline import curriculum_order

    rows = curriculum_order(docs, stages=4).collect()
    n = len(rows)
    assert [r["train_order"] for r in rows] == list(range(n))
    toks = [r["n_tokens"] for r in rows]
    assert toks == sorted(toks)
    # ties broken by doc_id ascending within equal n_tokens
    for a, b in zip(rows, rows[1:]):
        if a["n_tokens"] == b["n_tokens"]:
            assert a["doc_id"] < b["doc_id"]
    from collections import Counter

    sizes = Counter(r["stage"] for r in rows)
    assert sorted(sizes) == [0, 1, 2, 3]
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sizes[0] >= sizes[3]  # rank·s DIV N rounds the earlier stages up


def test_epoch_allocation_caps_and_deficits(spark, docs):
    """Equal target per source; over-supplied sources get epochs < cap
    and zero deficit; under-supplied sources pin at the cap and report
    the shortfall; achieved shares sum to <= 1."""
    from sqlstreamstore_spark.analytics.sampling import epoch_allocation

    rows = epoch_allocation(docs, budget=1_000_000, max_epochs=4.0).collect()
    n = len(rows)
    assert n == docs.select("source").distinct().count()
    target = 1_000_000.0 / n
    for r in rows:
        assert r["target_tokens"] == target
        assert 0 < r["epochs"] <= 4.0
        assert abs(r["alloc_tokens"] - r["tokens_available"] * r["epochs"]) < 1e-6
        if r["epochs"] < 4.0:  # uncapped -> target met exactly
            assert abs(r["deficit_tokens"]) < 1e-6
        else:  # capped -> genuine shortfall
            assert r["deficit_tokens"] > 0
    assert sum(r["achieved_share"] for r in rows) <= 1.0 + 1e-9
    assert any(r["epochs"] == 4.0 for r in rows) or all(
        r["deficit_tokens"] < 1e-6 for r in rows
    )


def test_length_batches_minimize_padding(spark, docs):
    """Batches tile the sorted order (32 docs each except the tail),
    per-batch waste is consistent, and total sorted-order padding is
    strictly below doc_id-order batching on the fixture."""
    from sqlstreamstore_spark.analytics.pipeline import length_bucket_batches

    rows = length_bucket_batches(docs, batch_size=32).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    assert [r["batch_id"] for r in rows] == list(range(len(rows)))
    assert all(r["n_docs"] == 32 for r in rows[:-1])
    for r in rows:
        assert r["padded_waste"] == r["batch_max"] * r["n_docs"] - r["batch_tokens"]
        assert 0 <= r["waste_frac"] < 1
    sorted_waste = sum(r["padded_waste"] for r in rows)

    # naive baseline: batch in doc_id order, pad to each batch's max
    naive = (
        docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n"))
        .orderBy("doc_id")
        .collect()
    )
    naive_waste = 0
    for i in range(0, len(naive), 32):
        chunk = [r["n"] for r in naive[i : i + 32]]
        naive_waste += max(chunk) * len(chunk) - sum(chunk)
    assert n_docs == len(naive)
    assert sorted_waste < naive_waste


def test_interleave_sources_round_robin(spark, docs):
    """Global order is (rank_in_source, source); per-source ranks are
    dense 1..n_s; the head of the order covers every source once
    before any source repeats."""
    from sqlstreamstore_spark.analytics.pipeline import interleave_sources

    rows = interleave_sources(docs).collect()
    keys = [(r["rank_in_source"], r["source"]) for r in rows]
    assert keys == sorted(keys)
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r["source"]].append(r["rank_in_source"])
    for src, ranks in per.items():
        assert ranks == list(range(1, len(ranks) + 1))
    n_sources = len(per)
    head = [r["source"] for r in rows[:n_sources]]
    assert len(set(head)) == n_sources


def test_pass_at_k_matches_exact_combinatorics(spark):
    """The product fold equals 1 − C(n−c,k)/C(n,k) from exact integer
    combinatorics, is monotone in k, and hits the 1.0 branch exactly
    when n−c < k."""
    import math

    from sqlstreamstore_spark.analytics.evaluation import pass_at_k
    from sqlstreamstore_spark.sources.tables import load_table

    orders = load_table(spark, SF, "orders")
    rows = pass_at_k(orders).collect()
    assert rows
    for r in rows:
        n, c = r["n_samples"], r["n_correct"]
        assert n >= 10
        for k in (1, 5, 10):
            got = r[f"pass_at_{k}"]
            if n - c < k:
                assert got == 1.0
            else:
                want = 1.0 - math.comb(n - c, k) / math.comb(n, k)
                assert abs(got - want) < 1e-12, (n, c, k, got, want)
        assert r["pass_at_1"] <= r["pass_at_5"] <= r["pass_at_10"]


def test_tokenizer_fertility_consistency(spark, docs):
    """Per-source sums agree with the per-doc regex token counts, and
    each ratio is the exact quotient of its two sums."""
    from sqlstreamstore_spark.analytics.text import (
        regex_token_count,
        tokenizer_fertility,
    )

    per_doc = regex_token_count(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    want = {
        r["source"]: (r["w"], r["b"])
        for r in per_doc.groupBy("source")
        .agg(
            F.sum("n_word_tokens").alias("w"),
            F.sum("n_tokens_bpeish").alias("b"),
        )
        .collect()
    }
    for r in tokenizer_fertility(docs).collect():
        w, b = want[r["source"]]
        assert (r["word_tokens"], r["bpeish_tokens"]) == (w, b)
        assert r["fertility"] == b / w
        assert r["chars_per_token"] == r["n_chars"] / b


def test_holt_forecast_matches_python_replay(spark):
    """The distributed struct-state fold replays exactly in pure
    Python (same IEEE order): level/trend/forecast/sse bit-identical,
    and the DuckDB-quirk hazard (sequential struct-field update in
    list_reduce) never enters — the oracle is a recursive CTE."""
    from sqlstreamstore_spark.analytics.events import holt_forecast
    from sqlstreamstore_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    got = {r["event_type"]: r for r in holt_forecast(ev).collect()}

    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .count()
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], float(r["count"])))
    for et, pts in series.items():
        ys = [y for _, y in sorted(pts)]
        l, b, sse = ys[0], 0.0, 0.0
        for y in ys[1:]:
            err = y - (l + b)
            ln = 0.5 * y + 0.5 * (l + b)
            bn = 0.3 * ((0.5 * y + 0.5 * (l + b)) - l) + 0.7 * b
            sse = sse + err * err
            l, b = ln, bn
        r = got[et]
        assert r["n_days"] == len(ys)
        assert r["level"] == l and r["trend"] == b
        assert r["forecast_next"] == l + b
        assert r["sse"] == sse


def test_bootstrap_ci_properties(spark, docs):
    """Order statistics bracket the point estimate on every source,
    64 resamples survive, and the hash-derived weights are genuinely
    Poisson(1)-shaped (mean weight ~1 within 5% over 32k draws)."""
    from sqlstreamstore_spark.analytics.evaluation import (
        POISSON1_CUM,
        bootstrap_ci,
    )

    rows = bootstrap_ci(docs, b=64).collect()
    assert len(rows) == docs.select("source").distinct().count()
    for r in rows:
        assert r["n_resamples"] == 64
        assert r["boot_lo"] <= r["boot_hi"]
        assert r["boot_lo"] <= r["mean_tokens"] <= r["boot_hi"]

    # thresholds are the genuine Poisson(1) CDF
    import math

    want = 0.0
    for k, c in enumerate(POISSON1_CUM):
        want += math.exp(-1.0) / math.factorial(k)
        assert abs(c - want) < 1e-15
    # empirical mean weight over the fixture's (doc, j) grid
    n_docs = docs.count()
    total_w = (
        docs.selectExpr("doc_id")
        .selectExpr("doc_id", "explode(sequence(1, 64)) AS j")
        .selectExpr(
            "cast(conv(substring(md5(concat_ws('|', cast(doc_id as string),"
            " cast(j as string))), 1, 12), 16, 10) as double)"
            " / cast(281474976710656 as double) AS u"
        )
        .selectExpr(
            "+".join(
                f"(CASE WHEN u >= {c!r} THEN 1 ELSE 0 END)"
                for c in POISSON1_CUM
            )
            + " AS w"
        )
        .groupBy()
        .sum("w")
        .collect()[0][0]
    )
    assert abs(total_w / (n_docs * 64) - 1.0) < 0.05


def test_curriculum_pack_composition(spark, docs):
    """Packing along the curriculum order keeps the span invariants
    (every non-final sequence sums exactly to B; totals conserved) AND
    the schedule property (difficulty/stage monotone along the global
    token stream)."""
    from collections import defaultdict

    from sqlstreamstore_spark.analytics.pipeline import curriculum_pack

    rows = curriculum_pack(docs, token_budget=512).collect()
    by_seq = defaultdict(int)
    for r in rows:
        by_seq[r["seq_id"]] += r["span_tokens"]
    n_seqs = len(by_seq)
    assert sorted(by_seq) == list(range(n_seqs))
    for sid in range(n_seqs - 1):
        assert by_seq[sid] == 512
    # the span stream is emitted in train_order: stages never decrease
    stages_seq = [r["stage"] for r in rows]
    assert stages_seq == sorted(stages_seq)
    orders = [r["train_order"] for r in rows]
    assert orders == sorted(orders)


def test_t_closeness_exact_tvd(spark, docs):
    """The integer-numerator TVD equals the textbook ½·Σ|p_c − p_g|
    computed in Python, every class appears, and TVD ∈ [0, 1)."""
    from collections import Counter, defaultdict

    from sqlstreamstore_spark.analytics.quality import t_closeness_report

    rows = {
        (r["source"], r["chars_bucket"]): r
        for r in t_closeness_report(docs).collect()
    }
    data = docs.select("source", "n_chars", "lang").collect()
    n = len(data)
    g = Counter(r["lang"] for r in data)
    cls = defaultdict(Counter)
    for r in data:
        cls[(r["source"], (r["n_chars"] // 100) * 100)][r["lang"]] += 1
    assert set(rows) == set(cls)
    for key, counts in cls.items():
        nc = sum(counts.values())
        want = 0.5 * sum(
            abs(counts.get(v, 0) / nc - g[v] / n) for v in g
        )
        got = rows[key]["tvd"]
        assert rows[key]["class_size"] == nc
        assert 0 <= got < 1
        assert abs(got - want) < 1e-12, (key, got, want)


def test_retention_by_source_consistency(spark, docs):
    """Per-source keeps sum to the clean_corpus survivor count, rates
    are the exact quotients, and dropped sources report 0 (never
    null)."""
    from sqlstreamstore_spark.analytics.pipeline import (
        clean_corpus,
        retention_by_source,
    )

    rows = retention_by_source(docs).collect()
    surv = clean_corpus(docs).count()
    assert sum(r["n_kept"] for r in rows) == surv
    raw_total = docs.count()
    assert sum(r["n_raw"] for r in rows) == raw_total
    for r in rows:
        assert r["doc_retention"] == r["n_kept"] / r["n_raw"]
        assert r["token_retention"] == r["tokens_kept"] / r["tokens_raw"]
        assert r["n_kept"] is not None and r["n_kept"] >= 0


def test_waterfill_exactness_and_conservation(spark, docs):
    """The single water level clears the budget exactly when any
    source is unsaturated (Σ alloc == B up to fold ulp), saturated
    sources sit at capacity, unsaturated ones at λ ≤ capacity, and the
    saturated set is exactly the prefix a pure-Python waterfill
    computes."""
    from sqlstreamstore_spark.analytics.sampling import epoch_waterfill

    B, cap = 1_000_000.0, 4.0
    rows = epoch_waterfill(docs, budget=int(B), max_epochs=cap).collect()
    caps = {r["source"]: r["capacity"] for r in rows}

    # pure-Python replay
    order = sorted(caps, key=lambda s: (caps[s], s))
    n, psat, ks = len(order), 0.0, 0
    saturated = set()
    run = 0.0
    for k, s in enumerate(order, 1):
        if caps[s] * (n - k + 1) <= B - run:
            saturated.add(s)
            ks += 1
            run = run + caps[s]
            psat = run
        else:
            run = run + caps[s]
    lam = (B - psat) / (n - ks) if ks < n else None

    total = 0.0
    for r in rows:
        assert r["saturated"] == (r["source"] in saturated)
        if r["saturated"]:
            assert r["alloc_tokens"] == r["capacity"]
        else:
            assert r["alloc_tokens"] == min(r["capacity"], lam)
            assert r["water_level"] == lam
        total += r["alloc_tokens"]
    want = sum(caps.values()) if ks == n else B
    assert abs(total - want) < 1e-6 * max(1.0, want)


def test_link_prediction_semantics(spark):
    """Predicted pairs are genuinely non-adjacent, common counts match
    a brute-force set intersection, Jaccard is the exact set ratio,
    and no adjacent pair leaks into the candidates."""
    from sqlstreamstore_spark.analytics.graph import (
        link_prediction_jaccard,
        supplier_cooccurrence_edges,
    )
    from sqlstreamstore_spark.sources.tables import load_table

    edges_df = supplier_cooccurrence_edges(
        load_table(spark, "/root/testdata/sf0.01", "lineitem"), min_orders=20
    )
    edges = {(r["src"], r["dst"]) for r in edges_df.collect()}
    from collections import defaultdict

    nbrs = defaultdict(set)
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)
    rows = link_prediction_jaccard(edges_df, top_n=200).collect()
    assert rows
    for r in rows:
        a, c = r["a"], r["c"]
        assert a < c and (a, c) not in edges
        inter = nbrs[a] & nbrs[c]
        assert r["common"] == len(inter) and r["common"] > 0
        assert r["deg_a"] == len(nbrs[a]) and r["deg_c"] == len(nbrs[c])
        assert r["jaccard"] == len(inter) / len(nbrs[a] | nbrs[c])


def test_periodogram_matches_numpy_fft(spark):
    """Amplitudes agree with numpy's rfft on the same daily series
    (|X_k|/T), and a planted pure sinusoid concentrates its amplitude
    at the planted harmonic."""
    import numpy as np

    from sqlstreamstore_spark.analytics.events import dft_periodogram
    from sqlstreamstore_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    got = {r["event_type"]: r for r in dft_periodogram(ev).collect()}
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .count()
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], float(r["count"])))
    for et, pts in series.items():
        ys = np.array([y for _, y in sorted(pts)])
        spec = np.abs(np.fft.rfft(ys)) / len(ys)
        for k in range(1, 8):
            assert abs(got[et][f"amp_{k}"] - spec[k]) < 1e-5, (et, k)

    # planted sinusoid: amp peaks at k=4 over a 28-day series
    t = np.arange(28)
    y = 100 + 10 * np.cos(2 * np.pi * 4 * t / 28)
    import datetime

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=int(d)),
            1,
            "synth",
            1.0,
            "{}",
        )
        for d in t
        for i in range(int(y[d]))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = dft_periodogram(df).collect()[0]
    amps = {k: r[f"amp_{k}"] for k in range(1, 8)}
    assert max(amps, key=amps.get) == 4
    assert amps[4] > 4.9  # 10·cos → amplitude 5 single-sided


def test_mann_kendall_exact_replay(spark):
    """S, tie-corrected variance, and z replay exactly in pure Python;
    a planted strictly-increasing series hits S = n(n-1)/2 with a
    strongly positive z."""
    import math

    from sqlstreamstore_spark.analytics.events import mann_kendall_trend
    from sqlstreamstore_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    got = {r["event_type"]: r for r in mann_kendall_trend(ev).collect()}
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .count()
        .collect()
    )
    from collections import Counter, defaultdict

    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], r["count"]))
    for et, pts in series.items():
        ys = [y for _, y in sorted(pts)]
        n = len(ys)
        S = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        z = ((S - 1) if S > 0 else (S + 1)) / math.sqrt(var) if S else 0.0
        r = got[et]
        assert r["s_stat"] == S and r["n_days"] == n
        assert r["var_s"] == var
        assert abs(r["z"] - z) < 1e-6

    # planted monotone series
    import datetime

    rows = [
        (
            d * 1000 + i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d),
            1,
            "mono",
            1.0,
            "{}",
        )
        for d in range(10)
        for i in range(d + 1)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = mann_kendall_trend(df).collect()[0]
    assert r["s_stat"] == 45 and r["z"] > 3.5


def test_kfold_partition_and_balance(spark, docs):
    """Folds partition the corpus (every doc exactly one fold), all k
    folds are populated and roughly balanced, and assignment is
    independent of input partitioning."""
    from collections import Counter

    from sqlstreamstore_spark.analytics.sampling import kfold_assign

    rows = kfold_assign(docs, k=5).collect()
    assert len(rows) == docs.count()
    sizes = Counter(r["fold"] for r in rows)
    assert sorted(sizes) == [0, 1, 2, 3, 4]
    assert max(sizes.values()) < 2 * min(sizes.values())
    again = kfold_assign(docs.repartition(7), k=5).collect()
    assert {(r["doc_id"], r["fold"]) for r in again} == {
        (r["doc_id"], r["fold"]) for r in rows
    }


def test_hodges_lehmann_exact_and_robust(spark):
    """HL equals the pure-Python median of Walsh averages per type,
    and one planted 100x spike day moves HL far less than the mean."""
    import statistics

    from sqlstreamstore_spark.analytics.events import hodges_lehmann_location
    from sqlstreamstore_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    got = {r["event_type"]: r for r in hodges_lehmann_location(ev).collect()}
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .count()
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], r["count"]))
    for et, pts in series.items():
        ys = [y for _, y in sorted(pts)]
        walsh = [
            (ys[i] + ys[j]) / 2
            for i in range(len(ys))
            for j in range(i, len(ys))
        ]
        assert got[et]["n_pairs"] == len(walsh)
        assert got[et]["hl_location"] == statistics.median(walsh)

    # robustness: spike one day 100x
    import datetime

    base = [
        (d * 100 + i, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d), 1, "r", 1.0, "{}")
        for d in range(10)
        for i in range(10 if d != 5 else 1000)
    ]
    df = spark.createDataFrame(
        base, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    hl = hodges_lehmann_location(df).collect()[0]["hl_location"]
    mean = (9 * 10 + 1000) / 10
    assert abs(hl - 10) < 10 < abs(mean - 10)


def test_centroid_drift_identity_and_rotation(spark):
    """Identical snapshots drift nowhere (cos 1, ratio 1); a negated
    second snapshot flips the cosine to -1 with ratio intact."""
    import numpy as np

    from sqlstreamstore_spark.analytics.similarity import (
        embedding_centroid_drift,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(40, 8).astype("float32") + 1.0
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v], 0))        # side 0
        rows.append((2 * i + 1, [float(x) for x in v], 0))    # identical side 1
        rows.append((1000 + 2 * i, [float(x) for x in v], 1))
        rows.append((1000 + 2 * i + 1, [float(-x) for x in v], 1))  # negated
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in embedding_centroid_drift(df).collect()}
    assert got[0]["centroid_cos"] == 1.0
    assert got[0]["norm_ratio"] == 1.0
    assert got[1]["centroid_cos"] == -1.0
    assert abs(got[1]["norm_ratio"] - 1.0) < 1e-6
    assert got[0]["n_a"] == got[0]["n_b"] == 40


def test_sif_downweights_stopwords(spark, docs):
    """SIF semantics on the fixture: a token's weight magnitude is
    floor-scaled a/(a+p) exactly; the most frequent token's per-use
    weight is far below a rare token's, and the feature values replay
    from pure Python."""
    from collections import defaultdict

    from sqlstreamstore_spark.analytics.text import sif_hashed_features

    rows = sif_hashed_features(docs).collect()
    got = {(r["doc_id"], r["bucket"]): r["weight"] for r in rows}

    import hashlib

    data = docs.select("doc_id", "text").collect()
    tf = defaultdict(int)
    for r in data:
        for t in r["text"].lower().split(" "):
            if t:
                tf[t] += 1
    total = sum(tf.values())
    a = 1e-3
    ws = {
        t: int(1_000_000.0 * a / (a + c / total) // 1) for t, c in tf.items()
    }
    want = defaultdict(int)
    for r in data:
        for t in r["text"].lower().split(" "):
            if not t:
                continue
            h = hashlib.md5(t.encode()).hexdigest()
            bucket = (int(h[0], 16) * 16 + int(h[1], 16)) % 64
            sign = 1 if int(h[2], 16) < 8 else -1
            want[(r["doc_id"], bucket)] += sign * ws[t]
    assert got == {k: v / 1_000_000.0 for k, v in want.items()}
    hot = max(tf, key=tf.get)
    rare = min(tf, key=tf.get)
    assert ws[hot] * 5 < ws[rare]


def test_l_diversity_exact_replay(spark, docs):
    """Per-class distinct-sensitive counts, dominant share, and the
    risky flag all match a pure-Python replay on the same corpus."""
    from collections import Counter, defaultdict

    from sqlstreamstore_spark.analytics.quality import l_diversity_report

    rows = {
        (r["source"], r["chars_bucket"]): r
        for r in l_diversity_report(docs, l=2).collect()
    }
    cls = defaultdict(Counter)
    for r in docs.select("source", "n_chars", "lang").collect():
        cls[(r["source"], (r["n_chars"] // 100) * 100)][r["lang"]] += 1
    assert set(rows) == set(cls)
    for key, counts in cls.items():
        r = rows[key]
        nc = sum(counts.values())
        assert r["class_size"] == nc
        assert r["l_distinct"] == len(counts)
        assert r["top_share"] == max(counts.values()) / nc
        assert r["risky"] == (len(counts) < 2)


def test_dataset_card_exact_replay(spark, docs):
    """Every card column matches an exact pure-Python recompute —
    counts as ints, shares as single IEEE divides of exact sums."""
    from sqlstreamstore_spark.analytics.pipeline import dataset_card

    card = dataset_card(docs).collect()[0]
    data = docs.select("source", "lang", "text").collect()
    toks = [len(r["text"].split(" ")) for r in data]
    import hashlib

    digests = {hashlib.md5(r["text"].encode()).hexdigest() for r in data}
    n = len(data)
    assert card["n_docs"] == n
    assert card["n_tokens"] == sum(toks)
    assert card["n_sources"] == len({r["source"] for r in data})
    assert card["n_langs"] == len({r["lang"] for r in data})
    assert card["pct_en"] == sum(r["lang"] == "en" for r in data) / n
    assert card["dup_rate"] == 1.0 - len(digests) / n
    assert card["mean_tokens_per_doc"] == sum(toks) / n
    assert card["max_tokens"] == max(toks)
    assert card["total_chars"] == sum(len(r["text"]) for r in data)


def test_compact_index_refuses_counter_index(spark, docs, tmp_path):
    """distinct() on a (token, tf, df) counter index would corrupt the
    merged sums — compact_index must refuse it (ADVICE r9 #3)."""
    from sqlstreamstore_spark.analytics import dedup, text

    path = str(tmp_path / "terms")
    text.build_term_index(docs, path)
    with pytest.raises(ValueError, match="set-semantics"):
        dedup.compact_index(spark, path)


def test_compact_index_recovers_stranded_retired(spark, docs, tmp_path):
    """A crash between the two swap renames leaves the index at
    .__retired__ with no live path; the next compact_index call must
    restore it before doing anything (ADVICE r9 #1)."""
    import os

    from sqlstreamstore_spark.analytics import dedup

    path = str(tmp_path / "dig")
    dedup.build_digest_index(docs, path)
    before = {r["__h"] for r in spark.read.parquet(path).collect()}
    os.rename(path, path + ".__retired__")  # simulate the crash window
    dedup.compact_index(spark, path, target_partitions=1)
    after = {r["__h"] for r in spark.read.parquet(path).collect()}
    assert after == before
    assert not os.path.exists(path + ".__retired__")


def test_compact_term_index_merges_counts(spark, split, tmp_path):
    """The counter-index compactor: groupBy-sum rewrite equals the
    lazy merged view, one row per token, and re-compacting is a
    no-op (the monoid's idempotence on merged rows)."""
    from sqlstreamstore_spark.analytics import text

    delta, corpus, _, _ = split
    path = str(tmp_path / "terms")
    text.build_term_index(corpus, path)
    text.upsert_term_index(delta, path)
    want = {
        r["token"]: (r["tf"], r["df"])
        for r in text.vocabulary_from_index(spark, path, limit=10_000).collect()
    }
    text.compact_term_index(spark, path, target_partitions=2)
    raw = spark.read.parquet(path)
    assert raw.count() == raw.select("token").distinct().count()
    got = {
        r["token"]: (r["tf"], r["df"])
        for r in text.vocabulary_from_index(spark, path, limit=10_000).collect()
    }
    assert got == want
    text.compact_term_index(spark, path, target_partitions=2)
    got2 = {
        r["token"]: (r["tf"], r["df"])
        for r in text.vocabulary_from_index(spark, path, limit=10_000).collect()
    }
    assert got2 == want
