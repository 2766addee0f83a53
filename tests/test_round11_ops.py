"""Round-11 hardening: Hadoop-FS retire-swap for index maintenance
(VERDICT r10 #4), the rebalance persist-leak fix (#6 / ADVICE r10 #2),
caller-scoped pin ownership (#7 / ADVICE r10 #3), and the
ivf_index_health empty-index guard (ADVICE r10 #4)."""

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


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


# ------------------------------------------------- hadoopfs primitives


def test_hadoopfs_primitives_file_scheme(spark, tmp_path):
    """exists/rename/delete through the Hadoop FileSystem resolved
    from an explicit file:-scheme URI."""
    from sqlstreamstore_spark.sources import hadoopfs as H

    d = tmp_path / "a"
    d.mkdir()
    (d / "x.txt").write_text("hello")
    a = f"file://{d}"
    b = f"file://{tmp_path / 'b'}"
    assert H.fs_exists(spark, a)
    assert not H.fs_exists(spark, b)
    H.fs_rename(spark, a, b)
    assert not os.path.exists(d)
    assert (tmp_path / "b" / "x.txt").read_text() == "hello"
    H.fs_delete(spark, b)
    assert not os.path.exists(tmp_path / "b")


def test_hadoopfs_retire_swap_and_recovery(spark, tmp_path):
    """retire_swap promotes the rewrite and drops the retired copy; a
    stranded .__retired__ (crash between the two renames) is restored
    by recover_retired — both through file:-scheme Hadoop paths."""
    from sqlstreamstore_spark.sources import hadoopfs as H

    live = tmp_path / "idx"
    tmp = tmp_path / "idx.__compacting__"
    live.mkdir()
    tmp.mkdir()
    (live / "old.parquet").write_text("old")
    (tmp / "new.parquet").write_text("new")
    H.retire_swap(spark, f"file://{live}", f"file://{tmp}")
    assert (live / "new.parquet").read_text() == "new"
    assert not os.path.exists(str(live) + ".__retired__")
    assert not os.path.exists(tmp)
    # crash window: live retired, nothing promoted
    os.rename(live, str(live) + ".__retired__")
    H.recover_retired(spark, f"file://{live}")
    assert (live / "new.parquet").read_text() == "new"
    assert not os.path.exists(str(live) + ".__retired__")
    # no stranded copy -> recovery is a no-op
    H.recover_retired(spark, f"file://{live}")
    assert (live / "new.parquet").read_text() == "new"


def test_compact_index_via_file_scheme(spark, docs, tmp_path):
    """compact_index's whole lifecycle through an explicit file:
    scheme URI — the object-store code path (VERDICT r10 #4 'Done'
    condition), plus idempotent re-compaction."""
    from sqlstreamstore_spark.analytics.dedup import (
        build_digest_index,
        compact_index,
        upsert_digest_index,
    )

    from sqlstreamstore_spark.analytics.dedup import read_digest_index

    path = f"file://{tmp_path / 'digests'}"
    build_digest_index(docs.limit(120), path)
    # r12: the re-sent delta lands as duplicate membership rows in the
    # LSM _tail (the partitioned main is untouched until a roll)
    upsert_digest_index(docs.limit(40), path)
    raw = read_digest_index(spark, path).count()
    distinct = read_digest_index(spark, path).distinct().count()
    assert raw > distinct
    compact_index(spark, path)  # folds the tail in + collapses dups
    assert spark.read.parquet(path).count() == distinct
    compact_index(spark, path)  # idempotent
    assert spark.read.parquet(path).count() == distinct
    local = str(tmp_path / "digests")
    assert not os.path.exists(local + ".__retired__")
    assert not os.path.exists(local + ".__compacting__")


def test_compact_term_index_via_file_scheme(spark, docs, tmp_path):
    """The counter-valued compaction merges partial rows by sum
    through a file:-scheme Hadoop path."""
    from sqlstreamstore_spark.analytics.text import (
        build_term_index,
        compact_term_index,
    )

    path = f"file://{tmp_path / 'terms'}"
    build_term_index(docs.limit(60), path)
    before = {
        r["token"]: (r["tf"], r["df"])
        for r in spark.read.parquet(path)
        .groupBy("token")
        .agg(F.sum("tf").alias("tf"), F.sum("df").alias("df"))
        .collect()
    }
    compact_term_index(spark, path)
    after_rows = spark.read.parquet(path).collect()
    after = {r["token"]: (r["tf"], r["df"]) for r in after_rows}
    assert len(after_rows) == len(after)  # fully merged: one row/token
    assert after == before
    local = str(tmp_path / "terms")
    assert not os.path.exists(local + ".__retired__")


def test_rebalance_via_file_scheme_no_persist_leak(spark, emb, tmp_path):
    """rebalance_ivf_index through a file:-scheme URI, with the
    multi-pass hot-list split exercised, leaves ZERO cached frames
    behind (VERDICT r10 #6: every superseded `assigned` persist is
    released, not just the first)."""
    from sqlstreamstore_spark.analytics import similarity as S

    local = str(tmp_path / "ivf")
    path = f"file://{local}"
    base = emb.filter(F.col("vec_id") % 5 != 0)
    cents = S.build_ivf_index(base, path, n_clusters=8)
    anchor = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1)
        .select("embedding")
        .collect()[0][0]
    ]
    a = F.array(*[F.lit(x) for x in anchor])
    delta = (
        emb.filter(F.col("vec_id") % 5 == 0)
        .limit(300)
        .select(
            (F.col("vec_id") + 100_000).alias("vec_id"),
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                a,
                lambda v, c: 0.3 * v + 0.7 * c,
            )
            .cast("array<float>")
            .alias("embedding"),
            "label",
        )
    )
    S.upsert_ivf_index(delta, path, cents)
    before_ids = {
        r["vec_id"] for r in spark.read.parquet(path).select("vec_id").collect()
    }
    n0 = _n_persistent(spark)
    new_cents = S.rebalance_ivf_index(
        spark, path, n_clusters=8, iters=2, max_share=0.2
    )
    assert _n_persistent(spark) == n0  # no leaked split-pass persists
    assert len(new_cents) > 8  # the hot list actually split (multi-pass ran)
    assert {
        r["vec_id"] for r in spark.read.parquet(path).select("vec_id").collect()
    } == before_ids
    assert not os.path.exists(local + ".__retired__")
    assert not os.path.exists(local + ".__compacting__")


# -------------------------------------------------- ivf health guards


def test_ivf_index_health_empty_index(spark, tmp_path):
    """An empty index reports zero shares/Gini and null staleness —
    diagnosable, never NaN (ADVICE r10 #4)."""
    import math

    from sqlstreamstore_spark.analytics import similarity as S

    path = str(tmp_path / "empty_ivf")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, cluster_id int"
    ).write.parquet(path)
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    rows = S.ivf_index_health(spark, path, cents).collect()
    assert [r["list_id"] for r in rows] == [0, 1]
    for r in rows:
        assert r["n_vecs"] == 0
        assert r["size_share"] == 0.0 and not math.isnan(r["size_share"])
        assert r["size_gini"] == 0.0 and not math.isnan(r["size_gini"])
        assert r["centroid_cos"] is None


# --------------------------------------------------- pin ownership


def test_pinned_index_frames_not_in_registry(spark, docs):
    """dense_global_index_pinned hands the pin to the caller and does
    NOT register it: a harness release_pins() between the caller's
    actions can never drop its layout barrier (ADVICE r10 #3)."""
    from sqlstreamstore_spark.operators import positions as P

    P.release_pins()  # quiesce
    toks = docs.select("doc_id", F.length("text").alias("n"))
    out, pinned = P.dense_global_index_pinned(toks, ["n", "doc_id"])
    assert pinned is not None
    first = out.orderBy("position").limit(5).collect()
    assert P.release_pins() == 0  # nothing registered by the pinned API
    # the barrier survived: re-collection sees identical indexes
    again = out.orderBy("position").limit(5).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in first]
    pinned.unpersist()


def test_pinned_index_collect_distinct_rides_counts_job(spark, docs):
    """collect_distinct (r12: bulk_append's distinct-stream check folds
    into the partition-counts job) returns the exact distinct set and
    leaves the dense index unchanged vs the plain two-tuple API."""
    from sqlstreamstore_spark.operators import positions as P

    toks = docs.select("doc_id", (F.col("doc_id") % 7).alias("g"),
                       F.length("text").alias("n"))
    out3, pinned3, vals = P.dense_global_index_pinned(
        toks, ["n", "doc_id"], collect_distinct="g"
    )
    want = {r[0] for r in toks.select("g").distinct().collect()}
    assert vals == want
    got = [(r["doc_id"], r["position"]) for r in out3.orderBy("position").collect()]
    out2, pinned2 = P.dense_global_index_pinned(toks, ["n", "doc_id"])
    ref = [(r["doc_id"], r["position"]) for r in out2.orderBy("position").collect()]
    assert got == ref
    for p in (pinned3, pinned2):
        if p is not None:
            p.unpersist()


def test_pin_scope_releases_only_its_own(spark, docs):
    """pin_scope releases exactly the pins created inside the block;
    outer pins survive, and repeated scoped invocations of the three
    lazy pipeline ops show NO cache growth (VERDICT r10 #7 'Done'
    condition, without relying on the harness registry)."""
    from sqlstreamstore_spark.analytics.pipeline import (
        curriculum_order,
        interleave_sources,
        length_bucket_batches,
    )
    from sqlstreamstore_spark.operators import positions as P

    P.release_pins()
    base = _n_persistent(spark)
    # an outer pin that must survive inner scopes
    toks = docs.select("doc_id", F.length("text").alias("n"))
    outer = P.with_dense_global_index(toks, ["n", "doc_id"])
    outer.limit(1).collect()
    outer_count = _n_persistent(spark)
    assert outer_count > base
    for _ in range(3):
        with P.pin_scope():
            curriculum_order(docs, stages=4).limit(3).collect()
            length_bucket_batches(docs, batch_size=64).limit(3).collect()
            interleave_sources(docs).limit(3).collect()
        assert _n_persistent(spark) == outer_count  # no growth per loop
    assert P.release_pins() == 1  # only the outer pin remained registered
    assert _n_persistent(spark) == base


def test_pin_scope_threadsafe_registry(spark, docs):
    """Concurrent scoped workers mutate the registry under the lock:
    every worker's pins release cleanly, total cache returns to
    baseline, no lost or doubly-released entries."""
    from concurrent.futures import ThreadPoolExecutor

    from sqlstreamstore_spark.operators import positions as P

    P.release_pins()
    base = _n_persistent(spark)
    toks = docs.select("doc_id", F.length("text").alias("n"))

    def worker(i: int) -> int:
        with P.pin_scope():
            out = P.with_dense_global_index(
                toks.filter(F.col("doc_id") % 4 == i), ["n", "doc_id"]
            )
            return len(out.limit(5).collect())

    with ThreadPoolExecutor(max_workers=4) as ex:
        counts = list(ex.map(worker, range(4)))
    assert all(c > 0 for c in counts)
    assert _n_persistent(spark) == base
    assert P.release_pins() == 0


# -------------------------------------------- health-driven sink repair


def test_sink_health_driven_rebalance(spark, emb, tmp_path):
    """The round-11 lifecycle closure: fuzzy_dedup_ingest_sink with
    ivf_health_every set monitors its own IVF index and repairs it
    when the skew/staleness thresholds fire; the retrained centroids
    flow into subsequent probes/upserts via centroid_state, and the
    index contents survive the retire-swap exactly."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import dedup, similarity
    from sqlstreamstore_spark.streaming.sink import fuzzy_dedup_ingest_sink

    base = tmp_path
    src = str(base / "src")
    corpus = str(base / "corpus")
    mh_idx = str(base / "mh")
    ivf_idx = str(base / "ivf")
    schema = "doc_id long, text string, embedding array<float>"

    seed = (
        emb.limit(400)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.concat(F.lit("seed document body number "), F.col("vec_id").cast("string"),
                     F.lit(" with enough distinct tokens to pass quality")).alias("text"),
            "embedding",
        )
        .localCheckpoint()
    )
    seed.write.parquet(corpus)
    dedup.build_minhash_index(seed, mh_idx)
    cents = similarity.kmeans_centroids(
        seed.select(F.col("doc_id").alias("vec_id"), "embedding"), n_clusters=4, iters=2
    )
    similarity.build_ivf_index(
        seed.select(F.col("doc_id").alias("vec_id"), "embedding"), ivf_idx,
        centroids=cents,
    )

    # 3 skewed batches: novel text, embeddings pulled 70% toward one
    # anchor — the concentrated-crawl shape that drifts one list
    anchor = [float(x) for x in emb.filter(F.col("vec_id") == 1)
              .select("embedding").collect()[0][0]]
    a = F.array(*[F.lit(x) for x in anchor])
    for b in range(3):
        batch = (
            emb.filter(F.col("vec_id") % 3 == b)
            .limit(60)
            .select(
                (F.col("vec_id") + 10_000 * (b + 1)).alias("doc_id"),
                F.concat(F.lit(f"novel batch {b} doc "),
                         F.col("vec_id").cast("string"),
                         F.lit(" unique content words alpha beta gamma delta")).alias("text"),
                F.zip_with(
                    F.col("embedding").cast("array<double>"), a,
                    lambda v, c: 0.3 * v + 0.7 * c,
                ).cast("array<float>").alias("embedding"),
            )
        )
        batch.write.mode("append").parquet(src)

    before_ids = None
    state: dict = {"centroids": cents}
    q = fuzzy_dedup_ingest_sink(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        corpus, mh_idx,
        threshold=0.5,
        checkpoint_dir=str(base / "ckpt"),
        ivf_index_path=ivf_idx, centroids=cents,
        cosine_threshold=0.999,  # only exact copies drop — survivors flow
        centroid_state=state,
        ivf_health_every=2,
        ivf_gini_threshold=0.05,        # aggressive: must fire on the skew
        ivf_min_cos_threshold=0.999,
        ivf_rebalance_max_share=0.5,
        query_name="hsink",
    )
    q.awaitTermination(180)

    rebs = state.get("rebalances", [])
    assert rebs, "health trigger never fired"
    assert state["centroids"] is not cents  # retrained quantizer shipped
    assert all(r["gini"] >= 0 and r["n_lists_after"] >= 4 for r in rebs)
    # index contents == corpus embeddings ids (swap lost nothing)
    idx_ids = {r["vec_id"] for r in spark.read.parquet(ivf_idx).select("vec_id").collect()}
    corpus_ids = {r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()}
    assert idx_ids == corpus_ids
    # probes against the repaired index still find exact duplicates:
    # re-sending batch 1 drops everything (digest stage) — and a NEW
    # doc whose embedding copies an indexed one drops at the IVF stage
    dup_vec = [float(x) for x in spark.read.parquet(ivf_idx)
               .filter(F.col("vec_id") >= 10_000).limit(1)
               .select("embedding").collect()[0][0]]
    probe = spark.createDataFrame(
        [(999_999, "completely new text payload never seen before anywhere", dup_vec)],
        schema,
    )
    losers = similarity.near_dup_against_ivf_index(
        spark, ivf_idx,
        probe.select(F.col("doc_id").alias("vec_id"), "embedding"),
        threshold=0.999, centroids=state["centroids"],
    ).collect()
    assert {r["new_vec"] for r in losers} == {999_999}


# ------------------------------------------------ round-11b operators


def test_sq8_quantize_and_topk(spark, emb):
    """SQ8: codes bounded to [0,255]; reconstruction error bounded by
    half a quantization step per dimension; ANN top-10 recall vs
    brute force is essentially exact (255 levels/dim)."""
    from sqlstreamstore_spark.analytics import similarity as S

    model = S.sq8_train(emb)
    assert all(h >= l for l, h in model)
    codes = S.sq8_quantize(emb, model)
    stats = codes.select(
        F.min(F.array_min("codes")).alias("mn"),
        F.max(F.array_max("codes")).alias("mx"),
    ).collect()[0]
    assert stats["mn"] >= 0 and stats["mx"] <= 255
    # reconstruction bound on one row
    row = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    crow = codes.filter(F.col("vec_id") == 3).collect()[0]["codes"]
    for j, (x, c) in enumerate(zip(row, crow)):
        lo, hi = model[j]
        scale = (hi - lo) / 255.0
        dec = lo + c * scale
        assert abs(float(x) - dec) <= scale / 2 + 1e-9, j
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").collect()[0][0]]
    got = [r["vec_id"] for r in S.cosine_topk_sq8(emb, qv, k=10).collect()]
    want = [r["vec_id"] for r in S.cosine_topk_bruteforce(emb, qv, k=10).collect()]
    assert len(set(got) & set(want)) >= 9
    # approx tracks exact closely
    rows = S.cosine_topk_sq8(emb, qv, k=10).collect()
    for r in rows:
        assert abs(r["approx_cosine"] - r["cosine"]) < 0.02


def test_bradley_terry_transitive_and_symmetric(spark):
    """BT on a constructed tournament: a transitive dominance chain
    orders the scores; a perfectly symmetric round-robin gives every
    item the same score (1/k); wins/games columns are exact."""
    from sqlstreamstore_spark.analytics.evaluation import bradley_terry

    # users express A > B, B > C, A > C via engagement value sums
    rows = []
    eid = 0
    for u in range(6):
        # values: A=3.0, B=2.0, C=1.0 for every user -> A beats B beats C
        for t, v in (("A", 3.0), ("B", 2.0), ("C", 1.0)):
            rows.append((eid, u, t, v))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    out = {r["item"]: r for r in bradley_terry(ev, iters=8).collect()}
    assert out["A"]["bt_score"] > out["B"]["bt_score"] > out["C"]["bt_score"]
    assert out["A"]["wins"] == 12 and out["C"]["wins"] == 0
    assert out["A"]["games"] == 12 and out["B"]["games"] == 12

    # symmetric: half the users prefer A, half prefer B
    rows = []
    eid = 0
    for u in range(4):
        va, vb = (2.0, 1.0) if u % 2 == 0 else (1.0, 2.0)
        rows.append((eid, u, "A", va)); eid += 1
        rows.append((eid, u, "B", vb)); eid += 1
    ev2 = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    out2 = {r["item"]: r["bt_score"] for r in bradley_terry(ev2, iters=8).collect()}
    assert abs(out2["A"] - 0.5) < 1e-9 and abs(out2["B"] - 0.5) < 1e-9


def test_ivfsq8_static_composed_index(spark, emb):
    """IVF-SQ8 composition: results come only from probed lists, and
    with n_probe = n_clusters (no pruning) the composed index equals
    the plain SQ8 ranker exactly — the composition adds pruning,
    never different arithmetic."""
    from sqlstreamstore_spark.analytics import similarity as S

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").collect()[0][0]]
    full = S.cosine_topk_ivfsq8_static(emb, qv, k=10, n_clusters=8, n_probe=8)
    plain = S.cosine_topk_sq8(emb, qv, k=10)
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in plain.collect()]
    pruned = S.cosine_topk_ivfsq8_static(emb, qv, k=10, n_clusters=8, n_probe=4)
    rows = pruned.collect()
    assert len(rows) == 10
    # pruned results are a subset of the probed lists' members
    cents = S._static_centroids(n_clusters=8)
    assigned = {r["vec_id"]: r["cluster_id"]
                for r in S.ivf_assign(emb, cents).collect()}
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    probe = [cid for cid, _ in sorted(
        cents, key=lambda c: (-cos(c[1], qv), c[0]))[:4]]
    assert all(assigned[r["vec_id"]] in probe for r in rows)


def test_sq8_index_equals_inline(spark, emb, tmp_path):
    """build_sq8_index == quantize by construction: probing the
    materialized codes returns exactly the inline ranker's rows, and
    the probe's code scan reads only (vec_id, codes)."""
    from sqlstreamstore_spark.analytics import similarity as S

    path = str(tmp_path / "sq8")
    model = S.build_sq8_index(emb, path)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").collect()[0][0]]
    via_index = S.cosine_topk_sq8_index(spark, path, emb, qv, model, k=10)
    inline = S.cosine_topk_sq8(emb, qv, k=10, model=model)
    assert [tuple(r) for r in via_index.collect()] == [
        tuple(r) for r in inline.collect()
    ]
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_domain_reweight_invariants(spark, docs):
    """DoReMi step: new weights sum to 1; eta=0 is the identity
    (w_new == w_old); only above-baseline domains tilt up, so their
    w_new/w_old ratio strictly exceeds every below-baseline domain's."""
    from sqlstreamstore_spark.analytics.pipeline import domain_reweight

    rows = domain_reweight(docs, eta=1.0).collect()
    assert abs(sum(r["w_new"] for r in rows) - 1.0) < 1e-6
    assert abs(sum(r["w_old"] for r in rows) - 1.0) < 1e-6
    hot = [r for r in rows if r["excess"] > 0]
    cold = [r for r in rows if r["excess"] == 0.0]
    assert hot and cold
    worst_hot = min(r["w_new"] / r["w_old"] for r in hot)
    best_cold = max(r["w_new"] / r["w_old"] for r in cold)
    assert worst_hot > best_cold
    ident = domain_reweight(docs, eta=0.0).collect()
    for r in ident:
        assert abs(r["w_new"] - r["w_old"]) < 1e-9, r["source"]


def test_fleiss_kappa_known_cases(spark):
    """Fleiss' kappa on constructed panels: perfect agreement across
    two used categories -> kappa = 1; a hand-computed mixed panel
    matches the textbook formula; a single-category degenerate panel
    reports NULL (p_e = 1), never a divide-by-zero."""
    from sqlstreamstore_spark.analytics.evaluation import fleiss_kappa

    def panel(assign):  # item -> per-rater mean cents
        rows = []
        eid = 0
        for item, per_rater in assign.items():
            for rater, cents in enumerate(per_rater):
                rows.append((eid, item, f"r{rater}", cents / 100.0))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, value double"
        )

    # perfect agreement, two categories used (buckets: 0 = <3000, 1 = 3000+)
    perfect = panel({1: [1000] * 3, 2: [1000] * 3, 3: [4000] * 3, 4: [4000] * 3})
    row = fleiss_kappa(perfect).collect()[0]
    assert (row["n_items"], row["n_raters"]) == (4, 3)
    assert row["p_bar"] == 1.0 and row["fleiss_kappa"] == 1.0

    # mixed: item1 all cat0, item2 2x cat0 + 1x cat1, item3 all cat1
    mixed = panel({1: [1000] * 3, 2: [1000, 1000, 4000], 3: [4000] * 3})
    row = fleiss_kappa(mixed).collect()[0]
    # hand computation: N=3 r=3; n_ij rows (3,0),(2,1),(0,3)
    # S2 = 9+4+1+9 = 23, A = 23-9 = 14, P_bar = 14/18
    # colsums: cat0=5, cat1=4 -> Q = 25+16 = 41; (Nr)^2 = 81
    # kappa = (14*81 - 41*18) / (18*(81-41)) = (1134-738)/720 = 0.55
    assert abs(row["p_bar"] - 14 / 18) < 1e-9
    assert abs(row["fleiss_kappa"] - 396 / 720) < 1e-9

    # degenerate: one category everywhere -> NULL kappa, p_bar = 1
    degen = panel({1: [1000] * 3, 2: [1000] * 3})
    row = fleiss_kappa(degen).collect()[0]
    assert row["p_bar"] == 1.0 and row["fleiss_kappa"] is None
