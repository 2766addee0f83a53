"""Round-12 hardening: bounded per-batch probe cost via the
prefix-partitioned digest index + bucketed band index (VERDICT r11
#2), out-of-band IVF repair (#3), and the manifest-pointer swap mode
for object stores (#4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sqlstreamstore_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def docs(spark):
    df = load_table(spark, SF, "documents").cache()
    df.count()
    return df


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# ------------------------------------ prefix-partitioned digest index


def test_digest_index_prefix_probe_matches_full_antijoin(spark, docs, tmp_path):
    """probe_digest_index (pruned) returns exactly the rows the plain
    corpus anti-join returns; the index layout is hp-partitioned."""
    from sqlstreamstore_spark.analytics import dedup

    path = str(tmp_path / "digest")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0).unionByName(
        corpus.limit(25)  # re-sent rows must drop
    )
    dedup.build_digest_index(corpus, path)
    # layout: hp=XX partition dirs
    dirs = [d for d in os.listdir(path) if d.startswith("hp=")]
    assert dirs and all(len(d) == len("hp=") + 2 for d in dirs)

    got = sorted(
        r["doc_id"]
        for r in dedup.probe_digest_index(spark, path, incoming).collect()
    )
    want = sorted(
        r["doc_id"] for r in dedup.new_against_corpus(incoming, corpus).collect()
    )
    assert got == want and want  # non-degenerate


def test_digest_index_probe_plan_partition_pruned(spark, docs, tmp_path):
    """The probe's index scan carries the delta's prefixes as literal
    PartitionFilters — the scan is pruned at planning time, the
    VERDICT r11 #2 fix shape."""
    from sqlstreamstore_spark.analytics import dedup

    path = str(tmp_path / "digest")
    dedup.build_digest_index(docs.filter(F.col("doc_id") % 10 != 0), path)
    delta = docs.filter(F.col("doc_id") % 100 == 0).limit(3)
    plan = _plan(dedup.probe_digest_index(spark, path, delta))
    scan = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "hp" in ln
    ]
    assert scan, f"no hp PartitionFilters in probe plan:\n{plan[:2000]}"
    # a 3-doc delta has ≤3 prefixes: the filter must be a literal IN,
    # not a catch-all
    assert any("hp" in ln and "IN (" in ln.replace("in(", "IN (") for ln in scan)


def test_digest_index_upsert_follows_layout_and_compact_preserves(
    spark, docs, tmp_path
):
    from sqlstreamstore_spark.analytics import dedup

    path = str(tmp_path / "digest")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    dedup.build_digest_index(corpus, path)
    # upsert lands as ONE flat tail file (the LSM shape), not as a
    # file per touched hp= dir
    dedup.upsert_digest_index(delta, path)
    tail = os.path.join(path, "_tail")
    assert os.path.isdir(tail)
    assert (
        sum(1 for f in os.listdir(tail) if f.endswith(".parquet")) == 1
    )
    n_want = docs.select(F.md5("text")).distinct().count()
    assert dedup.read_digest_index(spark, path).distinct().count() == n_want
    # probe after upsert sees main ∪ tail: everything is now known
    assert dedup.probe_digest_index(spark, path, docs).count() == 0
    # below the file budget the roll is a no-op; forcing it folds the
    # tail into the partitions and clears it
    assert dedup.roll_digest_tail(spark, path) is False
    assert dedup.roll_digest_tail(spark, path, max_tail_files=0) is True
    assert not os.path.isdir(tail)
    assert dedup.read_digest_index(spark, path).distinct().count() == n_want
    assert dedup.probe_digest_index(spark, path, docs).count() == 0
    # bare compact auto-preserves the hp partitioning (and folds any
    # tail in — exercised via one more upsert)
    dedup.upsert_digest_index(delta, path)
    dedup.compact_index(spark, path)
    dirs = [d for d in os.listdir(path) if d.startswith("hp=")]
    assert dirs and not os.path.isdir(tail)
    assert spark.read.parquet(path).select("__h").distinct().count() == n_want
    assert dedup.probe_digest_index(spark, path, docs).count() == 0


# --------------------------------------- bucketed banded-LSH index


def test_minhash_bucketed_index_same_results_and_pruned_plan(
    spark, docs, tmp_path
):
    """bh_buckets layout: identical incremental near-dup results to the
    flat band layout, with the index scan pruned to the delta's bucket
    ids; upsert self-configures from the sidecar."""
    from sqlstreamstore_spark.analytics import dedup

    corpus = docs.filter(F.col("doc_id") % 10 != 0).limit(300)
    incoming = (
        corpus.limit(12)
        .select("doc_id", F.concat(F.col("text"), F.lit(" tail")).alias("text"))
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    flat, buck = str(tmp_path / "flat"), str(tmp_path / "buck")
    dedup.build_minhash_index(corpus, flat)
    dedup.build_minhash_index(corpus, buck, bh_buckets=8)
    assert (dedup.read_index_layout(spark, buck) or {}).get("bh_buckets") == 8
    a = sorted(
        map(
            tuple,
            dedup.minhash_dedup_incremental(
                spark, flat, incoming, corpus
            ).collect(),
        )
    )
    b_df = dedup.minhash_dedup_incremental(spark, buck, incoming, corpus)
    b = sorted(map(tuple, b_df.collect()))
    assert a == b and a  # same pairs, non-degenerate
    plan = _plan(b_df)
    assert any(
        "PartitionFilters" in ln and "bb" in ln for ln in plan.splitlines()
    ), "bucketed probe scan not partition-pruned on bb"
    # upsert reads the sidecar: bucketed layout preserved
    dedup.upsert_minhash_index(incoming, buck)
    assert any(
        d.startswith("bb=")
        for d in os.listdir(os.path.join(buck, "band=0"))
    )
    # compact of the bucketed layout keeps dirs AND the sidecar
    dedup.compact_index(spark, buck)
    assert (dedup.read_index_layout(spark, buck) or {}).get("bh_buckets") == 8
    assert any(
        d.startswith("bb=") for d in os.listdir(os.path.join(buck, "band=0"))
    )


# ------------------------------------------------ pointer-mode swaps


def test_pointer_mode_compact_lifecycle(spark, docs, tmp_path):
    """init_pointer_index converts in place; compact_index auto-detects
    the layout, writes the NEXT version dir (no data rename), commits
    the one-line pointer, prunes old versions; probes resolve through
    the pointer transparently."""
    from sqlstreamstore_spark.analytics import dedup
    from sqlstreamstore_spark.sources import hadoopfs as H

    path = str(tmp_path / "digest")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    dedup.build_digest_index(corpus, path)
    full = dedup.probe_digest_index(spark, path, docs).count()

    live0 = H.init_pointer_index(spark, path)
    assert live0.endswith("/v0") and H.resolved(spark, path) == live0
    # probe through the pointer: same result
    assert dedup.probe_digest_index(spark, path, docs).count() == full
    # upsert lands in the live version dir (tail file inside it)
    dedup.upsert_digest_index(docs.filter(F.col("doc_id") % 10 == 0), path)
    assert dedup.probe_digest_index(spark, path, docs).count() == 0
    n = dedup.read_digest_index(spark, path).distinct().count()

    dedup.compact_index(spark, path)
    v1 = H.pointer_resolve(spark, path)
    assert v1 is not None and v1[0] == 1 and v1[1].endswith("/v1")
    # the compacted version has folded the tail into its partitions
    assert not os.path.isdir(os.path.join(v1[1], "_tail"))
    assert (
        spark.read.parquet(H.resolved(spark, path)).select("__h").distinct().count()
        == n
    )
    dedup.compact_index(spark, path)  # second rewrite → v2, v0 pruned
    assert H.pointer_resolve(spark, path)[0] == 2
    names = set(os.listdir(path))
    assert "v2" in names and "v1" in names and "v0" not in names
    assert dedup.probe_digest_index(spark, path, docs).count() == 0


def test_pointer_mode_rebalance_ivf(spark, emb, tmp_path):
    """rebalance_ivf_index on a pointer-mode root: rewrite goes into
    the next version, pointer commit swaps it, contents preserved."""
    from sqlstreamstore_spark.analytics import similarity as S
    from sqlstreamstore_spark.sources import hadoopfs as H

    path = str(tmp_path / "ivf")
    vecs = emb.limit(300)
    cents = S.kmeans_centroids(vecs, n_clusters=4, iters=2)
    S.build_ivf_index(vecs, path, centroids=cents)
    H.init_pointer_index(spark, path)
    before = {
        r["vec_id"]
        for r in spark.read.parquet(H.resolved(spark, path)).select("vec_id").collect()
    }
    new_cents = S.rebalance_ivf_index(spark, path, n_clusters=4, iters=2)
    assert H.pointer_resolve(spark, path)[0] == 1
    after = {
        r["vec_id"]
        for r in spark.read.parquet(H.resolved(spark, path)).select("vec_id").collect()
    }
    assert after == before and len(new_cents) >= 4
    # probes resolve the pointer transparently
    got = S.near_dup_against_ivf_index(
        spark, path, vecs.limit(5), threshold=0.999, centroids=new_cents
    )
    assert got.count() >= 0  # runs against the live version


# ------------------------------------------- out-of-band IVF repair


def test_rebalance_build_finalize_catches_concurrent_upserts(
    spark, emb, tmp_path
):
    """The async-repair protocol: build on a SNAPSHOT while an upsert
    appends new vectors, then finalize — the rebuilt index must contain
    snapshot ∪ late vectors, assigned to the NEW centroids."""
    from sqlstreamstore_spark.analytics import similarity as S

    path = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") % 5 != 0).limit(240)
    late = emb.filter(F.col("vec_id") % 5 == 0).limit(40)
    cents = S.kmeans_centroids(base, n_clusters=4, iters=2)
    S.build_ivf_index(base, path, centroids=cents)

    snapshot = S.list_index_files(spark, path)
    tmp = path + ".__rebalancing__"
    new_cents = S.rebalance_ivf_build(
        spark, snapshot, tmp, n_clusters=4, iters=2
    )
    # a batch lands between snapshot and finalize (the race the
    # protocol exists for)
    S.upsert_ivf_index(late, path, cents)
    S.rebalance_finalize(spark, path, tmp, new_cents, snapshot)

    idx = spark.read.parquet(path)
    want = {r["vec_id"] for r in base.select("vec_id").collect()} | {
        r["vec_id"] for r in late.select("vec_id").collect()
    }
    assert {r["vec_id"] for r in idx.select("vec_id").collect()} == want
    # every row is assigned to a NEW centroid id
    new_ids = {c for c, _ in new_cents}
    assert {
        r["cluster_id"] for r in idx.select("cluster_id").distinct().collect()
    } <= new_ids
    assert not os.path.exists(tmp)


def test_sink_async_repair_and_digest_index(spark, emb, tmp_path):
    """fuzzy_dedup_ingest_sink with digest_index_path +
    ivf_repair_async: exact dups still drop across batches via the
    maintained prefix-partitioned index (never re-hashing the corpus),
    the health trigger builds off-thread, and the repair finalizes at
    a safe point with nothing lost."""
    from sqlstreamstore_spark.analytics import dedup, similarity
    from sqlstreamstore_spark.streaming.sink import (
        finalize_ivf_repair,
        fuzzy_dedup_ingest_sink,
    )

    base = tmp_path
    src = str(base / "src")
    corpus = str(base / "corpus")
    mh_idx = str(base / "mh")
    ivf_idx = str(base / "ivf")
    dg_idx = str(base / "digest")
    schema = "doc_id long, text string, embedding array<float>"

    seed = (
        emb.limit(400)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.concat(
                F.lit("seed document body number "),
                F.col("vec_id").cast("string"),
                F.lit(" with enough distinct tokens to pass quality"),
            ).alias("text"),
            "embedding",
        )
        .localCheckpoint()
    )
    seed.write.parquet(corpus)
    dedup.build_minhash_index(seed, mh_idx, bh_buckets=8)
    cents = similarity.kmeans_centroids(
        seed.select(F.col("doc_id").alias("vec_id"), "embedding"),
        n_clusters=4, iters=2,
    )
    similarity.build_ivf_index(
        seed.select(F.col("doc_id").alias("vec_id"), "embedding"),
        ivf_idx, centroids=cents,
    )

    anchor = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    ]
    a = F.array(*[F.lit(x) for x in anchor])
    for b in range(4):
        novel = (
            emb.filter(F.col("vec_id") % 4 == b)
            .limit(50)
            .select(
                (F.col("vec_id") + 10_000 * (b + 1)).alias("doc_id"),
                F.concat(
                    F.lit(f"novel batch {b} doc "),
                    F.col("vec_id").cast("string"),
                    F.lit(" unique content words alpha beta gamma delta"),
                ).alias("text"),
                F.zip_with(
                    F.col("embedding").cast("array<double>"), a,
                    lambda v, c: 0.3 * v + 0.7 * c,
                ).cast("array<float>").alias("embedding"),
            )
        )
        dup = seed.limit(10).select(
            (F.col("doc_id") + 900_000 * (b + 1)).alias("doc_id"),
            "text", "embedding",
        )  # exact text dups: MUST drop at the digest stage every batch
        novel.unionByName(dup).write.mode("append").parquet(src)

    state: dict = {"centroids": cents}
    q = fuzzy_dedup_ingest_sink(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        corpus, mh_idx,
        threshold=0.5,
        checkpoint_dir=str(base / "ckpt"),
        ivf_index_path=ivf_idx, centroids=cents,
        cosine_threshold=0.999,
        centroid_state=state,
        ivf_health_every=2,
        ivf_gini_threshold=0.05,  # must fire on the skewed ingest
        ivf_min_cos_threshold=0.999,
        ivf_rebalance_max_share=0.5,
        digest_index_path=dg_idx,
        ivf_repair_async=True,
        query_name="hsink12",
    )
    q.awaitTermination(240)
    # a build may still be in flight when availableNow drains — the
    # documented post-stream finalize path
    finalize_ivf_repair(spark, state, ivf_idx, wait_s=120.0)

    assert not state.get("repair_errors"), state["repair_errors"]
    rebs = state.get("rebalances", [])
    assert rebs and all(r.get("mode") == "async" for r in rebs)
    assert state["centroids"] is not cents

    # exact dups never landed: corpus text is globally unique
    cdf = spark.read.parquet(corpus)
    assert cdf.count() == cdf.select("text").distinct().count()
    # the digest index exists, is prefix-partitioned, and covers the
    # corpus exactly
    assert any(d.startswith("hp=") for d in os.listdir(dg_idx))
    assert (
        dedup.read_digest_index(spark, dg_idx).distinct().count()
        == cdf.select(F.md5("text")).distinct().count()
    )
    # the repaired index lost nothing: ids == corpus ids
    idx_ids = {
        r["vec_id"] for r in spark.read.parquet(ivf_idx).select("vec_id").collect()
    }
    assert idx_ids == {r["doc_id"] for r in cdf.select("doc_id").collect()}


# ------------------------------------------- Kneser-Ney bigram (r12)


def test_kneser_ney_bigram_known_values(spark):
    """Stdlib-twin check on a corpus small enough to verify by hand:
    interpolated KN with D=0.75 — discounted ML term + continuation
    backoff — matches an independent pure-Python implementation."""
    import math
    from collections import Counter

    from sqlstreamstore_spark.analytics.text import kneser_ney_bigram

    rows = [
        (1, "a b a b c"),
        (2, "a b c c"),
        (3, "b a b a"),
        (4, "x"),  # < 2 tokens: no output row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in kneser_ney_bigram(docs).collect()}
    assert set(got) == {1, 2, 3}

    # pure-Python twin
    bgs = {}
    for did, txt in rows:
        w = txt.split(" ")
        bgs[did] = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
    cbg = Counter(b for lst in bgs.values() for b in lst)
    cp = Counter()
    n1p = Counter()
    n1f = Counter()
    for (p, c), n in cbg.items():
        cp[p] += n
        n1p[p] += 1
        n1f[c] += 1
    nbt = len(cbg)
    D = 0.75
    for did in (1, 2, 3):
        if not bgs[did]:
            continue
        s = 0.0
        # same sorted-fold order as the operator: sort contributions by
        # (cb, cp, n1p, n1f, m)
        per = Counter(bgs[did])
        terms = sorted(
            (cbg[b], cp[b[0]], n1p[b[0]], n1f[b[1]], m)
            for b, m in per.items()
        )
        for cb, cpp, np_, nf, m in terms:
            p = max(cb - D, 0.0) / cpp + ((D * np_) / cpp) * (nf / nbt)
            s += m * math.log(p)
        avg = s / len(bgs[did])
        assert got[did]["n_bigrams"] == len(bgs[did])
        assert abs(got[did]["avg_logprob"] - round(avg, 7)) < 1e-12
        assert abs(got[did]["ppl_proxy"] - round(math.exp(-avg), 4)) < 1e-12
    # order corruption scores worse than natural order: a doc that is a
    # scrambled version of common bigrams has lower avg_logprob
    assert got[3]["avg_logprob"] <= got[1]["avg_logprob"] + 1e-9


# --------------------------------------------- NN-descent step (r12)


def test_knn_descent_monotone_recall(spark, emb):
    """One NN-descent round must not lose recall vs the LSH seed graph
    (candidates ⊇ current neighbors), and in the LSH-bucketed regime
    it should strictly improve it; both measured against brute-force
    kNN."""
    from pyspark.sql import Window

    from sqlstreamstore_spark.analytics import similarity as S

    k = 5
    vecs = emb.limit(300).localCheckpoint()
    # TWO hash tables: a single table's bucket top-k is closed under
    # 2-hop expansion (descent would be a fixed point); cross-table
    # hops are what discover new neighbors
    g0 = (
        S.knn_graph_lsh(vecs, k=k, seed=42)
        .unionByName(S.knn_graph_lsh(vecs, k=k, seed=7))
        .select("qid", "cid")
        .distinct()
        .localCheckpoint()
    )
    g1 = S.knn_descent_step(vecs, g0, k=k).localCheckpoint()

    # brute-force truth
    e1 = vecs.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    e2 = vecs.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda a, x: a + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, x: a + x,
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    truth = (
        e1.crossJoin(e2)
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", (dot / (nrm(F.col("qv")) * nrm(F.col("cv")))).alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid")
    )
    n_truth = truth.count()

    def recall(g):
        return g.select("qid", "cid").join(truth, ["qid", "cid"]).count() / n_truth

    r0, r1 = recall(g0), recall(g1)
    assert r1 >= r0 - 1e-12, (r0, r1)
    assert r1 > r0, f"descent step did not improve recall ({r0} -> {r1})"
    assert r1 >= 1.5 * r0  # one round roughly doubles it (0.24 -> 0.48 here)
    # every vertex keeps <= k edges, ranked 1..k
    from pyspark.sql import functions as _F

    bad = g1.groupBy("qid").agg(_F.count("*").alias("n")).filter(_F.col("n") > k)
    assert bad.count() == 0


# ------------------------------------- Krippendorff's alpha (r12)


def test_krippendorff_alpha_known_values(spark):
    """Ragged-panel alpha against an independent pure-Python twin:
    units with >= 2 ratings participate with their own m_u (the
    missing-data regime Fleiss drops); single-rater units are
    excluded entirely."""
    from collections import Counter

    from sqlstreamstore_spark.analytics.evaluation import krippendorff_alpha

    # value -> rating under the fixture bucketing: 10->0, 40->1, 70->2
    panel = {
        1: {"A": 0, "B": 0, "C": 0},
        2: {"A": 0, "B": 1},
        3: {"A": 1, "B": 1, "C": 2, "D": 2},
        4: {"A": 2},  # m=1: dropped
        5: {"A": 2, "B": 2},
    }
    val = {0: 10.0, 1: 40.0, 2: 70.0}
    rows = [
        (u, r, val[c], "2024-01-01T00:00:00")
        for u, rc in panel.items()
        for r, c in rc.items()
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = krippendorff_alpha(ev).collect()[0]

    # pure-Python twin (exact rational arithmetic via fractions)
    from fractions import Fraction

    units = {u: rc for u, rc in panel.items() if len(rc) >= 2}
    n = sum(len(rc) for rc in units.values())
    do = Fraction(0)
    ncat = Counter()
    for rc in units.values():
        m = len(rc)
        cnt = Counter(rc.values())
        ncat.update(cnt)
        do += Fraction(m * m - sum(v * v for v in cnt.values()), m - 1)
    do /= n
    de = Fraction(n * n - sum(v * v for v in ncat.values()), n * (n - 1))
    alpha = 1 - do / de
    assert got["n_units"] == 4 and got["n_ratings"] == n
    assert abs(got["do"] - float(do)) < 1e-9
    assert abs(got["de"] - float(de)) < 1e-9
    assert abs(got["alpha"] - float(alpha)) < 1e-9
    # perfect agreement on a 2-category ragged panel -> alpha == 1
    perfect = spark.createDataFrame(
        [(1, "A", 10.0), (1, "B", 10.0), (2, "A", 70.0), (2, "B", 70.0),
         (2, "C", 70.0)],
        "user_id long, event_type string, value double",
    )
    assert krippendorff_alpha(perfect).collect()[0]["alpha"] == 1.0
    # degenerate one-category panel -> NULL (De = 0)
    degen = spark.createDataFrame(
        [(1, "A", 10.0), (1, "B", 10.0), (2, "A", 10.0), (2, "B", 10.0)],
        "user_id long, event_type string, value double",
    )
    assert krippendorff_alpha(degen).collect()[0]["alpha"] is None


# ------------------------------------ label propagation (r12)


def test_label_propagation_known_communities(spark):
    """Two dense K4 cliques joined by one bridge edge: 2 rounds of
    deterministic LPA label each clique with its minimum node id."""
    from sqlstreamstore_spark.analytics.graph import label_propagation

    k4a = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    k4b = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    edges = spark.createDataFrame(
        k4a + k4b + [(4, 10)], "src long, dst long"
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, iters=2).collect()}
    assert {got[n] for n in (1, 2, 3)} == {1}
    assert {got[n] for n in (11, 12, 13)} == {10}
    # the bridge endpoints stay with their own cliques (3 same-clique
    # neighbors vs 1 across)
    assert got[4] == 1 and got[10] == 10
    # determinism: re-run is identical
    again = {r["node"]: r["label"] for r in label_propagation(edges, iters=2).collect()}
    assert again == got


# ------------------------------------ Matryoshka prefix ANN (r12)


def test_matryoshka_prefix_recall_and_composition(spark, emb):
    """Prefix-dim candidate rank + exact rerank: full-prefix equals
    brute force exactly; a 16-of-64 prefix keeps high recall@10 and
    every returned cosine is exact (rerank reads full dims)."""
    from sqlstreamstore_spark.analytics import similarity as S

    vecs = emb.limit(400).localCheckpoint()
    qvec = [float(x) for x in vecs.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0]]
    truth = [r["vec_id"] for r in S.cosine_topk_bruteforce(vecs, qvec, k=10).collect()]
    # prefix == full dim -> approx == exact -> identical to brute force
    full = S.cosine_topk_matryoshka(vecs, qvec, k=10, prefix_dim=64,
                                    candidate_mult=1)
    rows = full.collect()
    assert [r["vec_id"] for r in rows] == truth
    assert all(abs(r["approx_cosine"] - r["cosine"]) < 1e-9 for r in rows)
    # 16-dim prefix: useful recall@10 even on NON-MRL synthetic
    # vectors (a random 16-dim slice — MRL-trained prefixes do far
    # better), and cosines are exact values
    pre = S.cosine_topk_matryoshka(vecs, qvec, k=10, prefix_dim=16,
                                   candidate_mult=4).collect()
    got = {r["vec_id"] for r in pre}
    assert len(got & set(truth)) >= 5, (sorted(got), truth)
    # candidate_mult covering the corpus -> exact top-k regardless of
    # prefix quality (the rerank guarantee)
    allc = S.cosine_topk_matryoshka(vecs, qvec, k=10, prefix_dim=16,
                                    candidate_mult=40)
    assert [r["vec_id"] for r in allc.collect()] == truth
    exact = {r["cid"]: r["cosine"] for r in
             S.knn_join_bruteforce(vecs, vecs.filter(F.col("vec_id") == 0), k=399)
             .collect()}
    for r in pre:
        if r["vec_id"] in exact:
            assert abs(r["cosine"] - round(exact[r["vec_id"]], 9)) < 1e-8


# ------------------------------------ round-12b additions


def test_k_core_peels_known_graph(spark):
    """Triangle {1,2,3} + pendant chain 3-4-5: the 2-core is exactly
    the triangle (peeling cascades: 5 drops round 1, 4 drops round 2),
    and in-core degrees are 2."""
    from sqlstreamstore_spark.analytics.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    rows = k_core(edges, k=2, rounds=3).collect()
    assert [(r["node"], r["degree"]) for r in rows] == [(1, 2), (2, 2), (3, 2)]
    # not yet a fixpoint after ONE round: 4 still has degree 2 via 3-4
    one = {r["node"] for r in k_core(edges, k=2, rounds=1).collect()}
    assert one == {1, 2, 3, 4}


def test_k_core_gate_fixpoint_and_clique(spark):
    """Gate parameters (min_orders=30, k=8): sf0.001's graph is a K10
    clique — all ten nodes are core with degree 9 — and one round is
    already the fixpoint (rounds=5 == rounds=6 output)."""
    from sqlstreamstore_spark.analytics.graph import (
        k_core,
        supplier_cooccurrence_edges,
    )

    li = load_table(spark, SF, "lineitem")
    edges = supplier_cooccurrence_edges(li, min_orders=30).localCheckpoint()
    five = [tuple(r) for r in k_core(edges, k=8, rounds=5).collect()]
    six = [tuple(r) for r in k_core(edges, k=8, rounds=6).collect()]
    assert five == six
    assert len(five) == 10 and all(d == 9 for _, d in five)


def test_mmr_prefers_diverse_over_near_duplicate(spark):
    """Hand-built regime where MMR diverges from pure relevance:
    b is a near-copy of a (rel rank 2) but MMR rank 2 goes to the
    diverse c; rank-1 score is exactly λ·rel."""
    from sqlstreamstore_spark.analytics.similarity import mmr_rerank

    rows = [
        # geometry note: the query must NOT coincide with the top pick,
        # else sim-to-selected == relevance for every candidate and MMR
        # can never reorder. Here all three have rel = 0.8 to q=(1,0,0);
        # b is an exact copy of a (sim 1.0, penalized hard), c mirrors
        # a across the query axis (sim(c,a) = 0.28, barely penalized).
        (1, [0.8, 0.6, 0.0]),    # a: rank 1 by id tie-break
        (2, [0.8, 0.6, 0.0]),    # b: exact dup of a
        (3, [0.8, -0.6, 0.0]),   # c: diverse mirror
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    out = mmr_rerank(emb, [1.0, 0.0, 0.0], n_candidates=3, n_select=3,
                     lam=0.7).collect()
    # step 2: score(b) = 0.7*0.8 - 0.3*1.0 = 0.26,
    #         score(c) = 0.7*0.8 - 0.3*0.28 = 0.476 -> c before b
    assert [r["vec_id"] for r in out] == [1, 3, 2]
    assert abs(out[0]["mmr_score"] - 0.7 * out[0]["relevance"]) < 1e-12
    # selected ids are distinct and ranks are 1..n
    assert [r["rk"] for r in out] == [1, 2, 3]


def test_mmr_gate_shape(spark, emb):
    """Gate-parameter invariants on real embeddings: 5 distinct picks
    from the top-20 candidate pool, rank 1 = the relevance argmax
    (excluding the query itself), every pick's relevance is a real
    top-20 relevance."""
    from sqlstreamstore_spark.analytics.similarity import (
        cosine_topk_bruteforce,
        mmr_rerank,
    )

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0]]
    out = mmr_rerank(emb, qvec, n_candidates=20, n_select=5, lam=0.7).collect()
    assert len({r["vec_id"] for r in out}) == 5
    top = cosine_topk_bruteforce(emb.filter(F.col("vec_id") != 0), qvec,
                                 k=20).collect()
    assert out[0]["vec_id"] == top[0]["vec_id"]
    pool = {r["vec_id"] for r in top}
    assert {r["vec_id"] for r in out} <= pool


def test_semantic_decontaminate_flags_and_tiebreak(spark):
    """Hand-built: an exact copy of test vec 1 is flagged with
    test_id=1/cosine=1; an orthogonal vector is not; a vector equally
    close to test 0 and test 1 resolves to the SMALLEST test id."""
    from sqlstreamstore_spark.analytics.similarity import semantic_decontaminate

    data = [
        (0, [1.0, 0.0, 0.0, 0.0]),          # held-out 0
        (1, [0.0, 1.0, 0.0, 0.0]),          # held-out 1
        (2, [0.0, 1.0, 0.0, 0.0]),          # copy of test 1 -> flagged
        (3, [0.0, 0.0, 0.0, 2.0]),          # orthogonal -> clean
        (4, [1.0, 1.0, 0.0, 0.0]),          # tie vs tests 0 and 1 -> tid 0
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in data],
        "vec_id long, embedding array<double>",
    )
    out = semantic_decontaminate(emb, n_heldout=2, threshold=0.5).collect()
    got = {r["vec_id"]: (r["test_id"], r["cosine"]) for r in out}
    assert set(got) == {2, 4}
    assert got[2][0] == 1 and abs(got[2][1] - 1.0) < 1e-12
    assert got[4][0] == 0 and abs(got[4][1] - 0.5 ** 0.5) < 1e-12


def test_semantic_decontaminate_map_only_plan(spark, emb):
    """The 100 TB claim, pinned: the probe plan contains NO exchange
    and NO join — the held-out suite rides as a literal, so the scan
    is map-only (filter + project + local sort for presentation)."""
    from sqlstreamstore_spark.analytics.similarity import semantic_decontaminate

    out = semantic_decontaminate(emb, n_heldout=20, threshold=0.35)
    plan = _plan(out.limit(50))
    body = plan.split("== Physical Plan ==")[-1]
    assert "Join" not in body, body
    # the only exchange allowed is the final presentation orderBy's
    # range partitioning; the PROBE itself (pre-sort) must be map-only
    pre = body.split("Sort")[0]
    assert "Exchange" not in pre, pre


def test_retrieval_metrics_known_values(spark):
    """Hand-built ranking: q1 has hits at ranks 1 and 3 (of 4 shown,
    5 relevant corpus-wide), q2 has no hits. Exact MRR/precision/
    recall; NDCG checked against the closed form."""
    import math

    from sqlstreamstore_spark.analytics.evaluation import retrieval_metrics

    ranked = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 0), (1, 3, 1), (1, 4, 0),
         (2, 1, 0), (2, 2, 0)],
        "qid long, rk long, rel int",
    )
    tot = spark.createDataFrame([(1, 5), (2, 3)], "qid long, n_rel_total long")
    out = {r["qid"]: r for r in retrieval_metrics(ranked, tot, k=10).collect()}
    q1, q2 = out[1], out[2]
    assert q1["first_rel_rank"] == 1 and q1["mrr"] == 1.0
    assert q1["precision_at_k"] == 0.2  # 2 hits / k=10
    assert q1["recall_at_k"] == 0.4     # 2 / 5
    dcg = 1.0 / math.log2(2.0) + 1.0 / math.log2(4.0)
    idcg = sum(1.0 / math.log2(i + 1.0) for i in range(1, 6))  # min(k, 5)
    assert abs(q1["ndcg_at_k"] - round(dcg / idcg, 6)) < 1e-9
    assert q2["first_rel_rank"] == 0 and q2["mrr"] == 0.0
    assert q2["precision_at_k"] == 0.0 and q2["recall_at_k"] == 0.0
    assert q2["ndcg_at_k"] == 0.0


def test_kcenter_coreset_known_geometry(spark):
    """Axis-aligned unit vectors are mutually at distance 1.0; a
    near-copy of the seed is at ~0. Greedy from the seed must pick
    the three other axes (max-min 1.0 each, id order via ties) before
    ever touching the near-copy."""
    from sqlstreamstore_spark.analytics.similarity import kcenter_coreset

    data = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),  # near-copy of the seed
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in data],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_coreset(emb, m=4, seed_id=0).collect()
    assert [r["vec_id"] for r in out] == [0, 2, 3, 4]
    assert out[0]["dist"] == 0.0
    assert all(abs(r["dist"] - 1.0) < 1e-12 for r in out[1:])
    # radius curve is non-increasing once the near-dup is all that's left
    out5 = kcenter_coreset(emb, m=5, seed_id=0).collect()
    assert out5[4]["vec_id"] == 1 and out5[4]["dist"] < 0.01


def test_kcenter_radius_curve_non_increasing(spark, emb):
    """Gonzalez greedy invariant on real embeddings: the selection
    radius (max-min distance) is non-increasing in rank."""
    from sqlstreamstore_spark.analytics.similarity import kcenter_coreset

    out = kcenter_coreset(emb, m=8, seed_id=0).collect()
    dists = [r["dist"] for r in out[1:]]
    assert all(a >= b - 1e-12 for a, b in zip(dists, dists[1:])), dists
    assert len({r["vec_id"] for r in out}) == 8


def test_k_truss_peels_known_graph(spark):
    """K4 {1..4} plus a triangle {4,5,6} hanging off node 4: in the
    4-truss (support >= 2) the K4 survives (every edge closes 2
    triangles) and the pendant triangle's edges (support 1) peel in
    round 1."""
    from sqlstreamstore_spark.analytics.graph import k_truss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(4, 5), (4, 6), (5, 6)]
    edges = spark.createDataFrame(k4 + pendant, "src long, dst long")
    rows = k_truss(edges, k=4, rounds=3).collect()
    assert [(r["src"], r["dst"]) for r in rows] == k4
    assert all(r["support"] == 2 for r in rows)
    # k=6 (support >= 4): nothing in a K4 qualifies -> empty
    assert k_truss(edges, k=6, rounds=3).count() == 0


def test_k_truss_gate_fixpoint_and_clique(spark):
    """Gate parameters (min_orders=30, k=5): sf0.001's K10 clique has
    every edge at support 8 >= 3 — all 45 edges survive — and
    rounds=8 is already the fixpoint (== rounds=9 output)."""
    from sqlstreamstore_spark.analytics.graph import (
        k_truss,
        supplier_cooccurrence_edges,
    )

    li = load_table(spark, SF, "lineitem")
    edges = supplier_cooccurrence_edges(li, min_orders=30).localCheckpoint()
    eight = [tuple(r) for r in k_truss(edges, k=5, rounds=8).collect()]
    nine = [tuple(r) for r in k_truss(edges, k=5, rounds=9).collect()]
    assert eight == nine
    assert len(eight) == 45 and all(s == 8 for _, _, s in eight)


def test_sink_index_compaction_budget(spark, emb, tmp_path):
    """index_compact_files: the sink folds append-accreted small files
    back into few-per-partition once an index tree exceeds the budget
    — results unchanged (dups still drop, indexes still cover the
    corpus), file counts bounded, compactions recorded in state."""
    from sqlstreamstore_spark.analytics import dedup, similarity
    from sqlstreamstore_spark.streaming.sink import fuzzy_dedup_ingest_sink

    base = tmp_path
    src, corpus = str(base / "src"), str(base / "corpus")
    mh_idx, ivf_idx, dg_idx = (
        str(base / "mh"), str(base / "ivf"), str(base / "digest")
    )
    schema = "doc_id long, text string, embedding array<float>"

    seed = (
        emb.limit(200)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.concat(
                F.lit("compaction seed body "), F.col("vec_id").cast("string"),
                F.lit(" alpha beta gamma delta epsilon"),
            ).alias("text"),
            "embedding",
        )
        .localCheckpoint()
    )
    seed.write.parquet(corpus)
    dedup.build_minhash_index(seed, mh_idx)
    dedup.build_digest_index(seed, dg_idx)
    cents = similarity.kmeans_centroids(
        seed.select(F.col("doc_id").alias("vec_id"), "embedding"),
        n_clusters=4, iters=2,
    )
    similarity.build_ivf_index(
        seed.select(F.col("doc_id").alias("vec_id"), "embedding"),
        ivf_idx, centroids=cents,
    )

    for b in range(6):
        # vec_ids 200+ only: vectors IDENTICAL to a corpus row would
        # (correctly) die at the semantic probe and starve the test
        lo = 200 + 30 * b
        novel = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 30)
        ).select(
            (F.col("vec_id") + 10_000 * (b + 1)).alias("doc_id"),
            F.concat(
                F.lit(f"fresh b{b} "), F.col("vec_id").cast("string"),
                F.lit(" zeta eta theta iota kappa"),
            ).alias("text"),
            "embedding",
        )
        dup = seed.limit(8).select(
            (F.col("doc_id") + 900_000 * (b + 1)).alias("doc_id"),
            "text", "embedding",
        )
        novel.unionByName(dup).write.mode("append").parquet(src)

    def nfiles(p):
        return sum(
            1 for _, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
        )

    state: dict = {"centroids": cents}
    q = fuzzy_dedup_ingest_sink(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        corpus, mh_idx,
        threshold=0.5,
        checkpoint_dir=str(base / "ckpt"),
        ivf_index_path=ivf_idx, centroids=cents,
        cosine_threshold=0.999,
        centroid_state=state,
        digest_index_path=dg_idx,
        index_compact_files=12,
        query_name="csink12",
    )
    q.awaitTermination(240)

    comps = state.get("compactions", [])
    assert comps, "budget 12 never fired across 6 appending batches"
    assert {c["path"] for c in comps} >= {"mh"}
    assert all(c["files_after"] <= c["files_before"] for c in comps)
    # bounded: post-run trees sit near the budget, not at O(batches)
    assert nfiles(mh_idx) <= 12 + 8  # one batch of appends past a compact
    # correctness unchanged: dups never landed, indexes cover corpus
    cdf = spark.read.parquet(corpus)
    assert cdf.count() == cdf.select("text").distinct().count()
    assert (
        dedup.read_digest_index(spark, dg_idx).distinct().count()
        == cdf.select(F.md5("text")).distinct().count()
    )
    idx_ids = {
        r["vec_id"] for r in spark.read.parquet(ivf_idx).select("vec_id").collect()
    }
    assert idx_ids == {r["doc_id"] for r in cdf.select("doc_id").collect()}
