"""Empirical scaling probe: do the core operators scale linearly?

Builds a synthetic ~sf1 by replicating the sf0.1 tables 10x with
id-offsets (new distinct keys, same distributions), then times the
headline operators at sf0.01 / sf0.1 / sf1-synthetic and prints one
JSON line per scale with rows + seconds. Near-linear wall-clock growth
(at fixed parallelism) is the evidence that no operator hides a
super-linear term — the all-pairs/clique failure modes the LSH/banding/
threshold designs exist to avoid.

    python tools/scale_probe.py

Replication keeps value distributions identical while growing
cardinality: doc_id/vec_id/orderkey spaces are shifted per replica, so
dedup/similarity workloads see 10x the corpus, not 10 copies that an
exact-dup path would collapse. (MinHash/LSH outputs DO grow with the
replica count because replicas of near-dup pairs are also near-dups
across replicas where signatures collide — that growth is part of the
honest workload.)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def replicated(df, times: int, key_cols: dict[str, int]):
    """Union `times` copies with each key column shifted per replica."""
    parts = []
    for r in range(times):
        d = df
        for col, span in key_cols.items():
            d = d.withColumn(col, (F.col(col) + F.lit(r * span)).cast("long"))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def sf10_main(which: str) -> int:
    """r6 verdict #6: one 100x datapoint (sf10-synthetic = sf0.1
    replicated 100x, 500k docs / 200k vectors) for the three headline
    scale knobs, so the documented rules become measured ones:

      minhash     — banding candidates; pair output grows with
                    replica-group² (TRUE near-dups), join stays banded
      lshbits     — embedding near-dup with AUTO bits
                    (derive_lsh_bits: log2(N/32) → 13 bits at 200k)
      semantic    — semantic_clusters with n_clusters = N/256 ≈ 781
                    (the rule UNCAPPED — this is what forced the Arrow
                    GEMM assign/probe twins; the 64-literal ceiling was
                    a codegen limit, not an algorithm one)
      containment — auto df-cap at 100x replica depth: every posting
                    list is ≥ replica-count long, so the cap's
                    engagement (base-df ≥ 8 shingles dropped) is the
                    rule's stress test

    Each knob runs separately (`--sf10 minhash` etc.) and MERGES its
    rows into SCALE_PROBE.json's "sf10-synthetic" scale entry, so a
    wall-budget kill of one knob doesn't lose the others.
    """
    import os

    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import dedup, similarity
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe-sf10")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    d = "/root/testdata/sf0.1"
    res: dict = {}

    def need_docs():
        return replicated(
            load_table(spark, d, "documents"), 100, {"doc_id": 1_000_000}
        ).localCheckpoint()

    if which in ("minhash", "all"):
        docs = need_docs()
        n_docs = docs.count()
        t0 = time.time()
        n = dedup.minhash_lsh_candidates(docs).count()
        res["minhash_lsh_candidates"] = {
            "rows": n, "n_docs": n_docs, "s": round(time.time() - t0, 2)}
        print(json.dumps(res["minhash_lsh_candidates"]), flush=True)

    if which in ("containment", "all"):
        docs = need_docs()
        n_docs = docs.count()
        cap = dedup.derive_shingle_df_cap(n_docs)
        t0 = time.time()
        n = dedup.containment_pairs(docs, threshold=0.5).count()
        dt = round(time.time() - t0, 2)
        from sqlstreamstore_spark.analytics.dedup import _shingles

        n_hot = (
            docs.select(F.explode(_shingles(F.col("text"), 3)).alias("s"))
            .groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") > cap).count()
        )
        res["containment_pairs"] = {
            "rows": n, "n_docs": n_docs, "s": dt,
            "df_cap": cap, "hot_shingles_dropped": n_hot,
        }
        print(json.dumps(res["containment_pairs"]), flush=True)

    if which in ("lshbits", "all"):
        emb = replicated(
            load_table(spark, d, "embeddings"), 100, {"vec_id": 1_000_000}
        ).localCheckpoint()
        n_emb = emb.count()
        bits = similarity.derive_lsh_bits(n_emb)
        t0 = time.time()
        n = similarity.cosine_near_dup_pairs_lsh(emb, sort=False).count()
        res["near_dup_lsh"] = {
            "rows": n, "n_vecs": n_emb, "auto_bits": bits,
            "s": round(time.time() - t0, 2)}
        print(json.dumps(res["near_dup_lsh"]), flush=True)

    if which in ("semantic", "all"):
        emb = replicated(
            load_table(spark, d, "embeddings"), 100, {"vec_id": 1_000_000}
        ).localCheckpoint()
        n_emb = emb.count()
        ncl = max(8, n_emb // 256)  # the rule, uncapped (Arrow path)
        t0 = time.time()
        sc = similarity.semantic_clusters(emb, k=4, threshold=0.35, n_clusters=ncl)
        row = sc.agg(
            F.count("*").alias("n"),
            F.count_distinct("comp").alias("n_comps"),
            F.max("comp_size").alias("max_size"),
        ).collect()[0]
        res["semantic_clusters"] = {
            "rows": row.n, "n_comps": row.n_comps, "n_lists": ncl,
            "max_size": row.max_size, "s": round(time.time() - t0, 2)}
        print(json.dumps(res["semantic_clusters"]), flush=True)

    _merge_scale(res, "sf10-synthetic")
    return 0


def _merge_scale(res: dict, label: str) -> None:
    import os

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "SCALE_PROBE.json")
    with open(art) as f:
        data = json.load(f)
    scales = data["scales"]
    for s in scales:
        if s.get("scale") == label:
            s.update(res)
            break
    else:
        scales.append({"scale": label, **res})
    with open(art, "w") as f:
        json.dump(data, f, indent=1)
    print(f"merged {sorted(res)} into {art} [{label}]", flush=True)


def incremental_main(times: int = 10) -> int:
    """r8 verdict #5 (+#4): the incremental pair — and, at sf1, the
    incremental FLAGSHIP — probed against a HELD corpus scale with the
    delta swept 1% / 3% / 10%: probe cost must track the DELTA (a
    constant index-side term plus a delta-proportional slope), never
    re-pay the corpus, and in the small-delta regime the index side
    must join map-side (BroadcastHashJoin on the probe broadcast — no
    index shuffle; the size-adaptive picker flips the big-delta IVF
    probe to the shuffled co-located join, recorded per row).

    Delta construction: corpus rows re-keyed past the corpus id range
    with a unique suffix token appended — NEW ids and NEW digests (the
    exact stage passes them). HALF the delta keeps near-identical
    shingle sets and IDENTICAL embeddings (fuzzy sees jaccard ≈ 1⁻,
    semantic sees cosine = 1.0 against every corpus replica — the
    probes bite, candidate mass ∝ delta × replica-depth); the other
    half is made genuinely NOVEL — token order reversed (shingles
    break, fuzzy passes) and embedding negated (cosine −1, semantic
    passes) — so the flagship's budget/pack/shard stages carry real
    load too, the realistic mixed-crawl shape.
    """
    import os
    import tempfile

    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import dedup, pipeline, similarity
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe-incremental")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    d = "/root/testdata/sf0.1"
    docs01 = load_table(spark, d, "documents")
    emb01 = load_table(spark, d, "embeddings")
    n_base_docs = docs01.count()
    n_base_emb = emb01.count()
    corpus = replicated(docs01, times, {"doc_id": 1_000_000}).localCheckpoint()
    corpus_emb = replicated(emb01, times, {"vec_id": 1_000_000}).localCheckpoint()
    n_corpus = corpus.count()

    base = tempfile.mkdtemp(prefix="sss-scale-inc-")
    mh_path = os.path.join(base, "mh")
    ivf_path = os.path.join(base, "ivf")
    t0 = time.time()
    dedup.build_minhash_index(corpus, mh_path)
    build_mh_s = round(time.time() - t0, 2)
    t0 = time.time()
    cents = similarity.build_ivf_index(
        corpus_emb, ivf_path, n_clusters=max(8, corpus_emb.count() // 256)
    )
    build_ivf_s = round(time.time() - t0, 2)

    def make_delta(k: int):
        novel = F.col("doc_id") % 2 == 0
        reps = -(-k // n_base_docs)
        dd = (
            replicated(docs01, reps, {"doc_id": 1_000_000})
            .limit(k)
            .withColumn("doc_id", F.col("doc_id") + F.lit(100_000_000))
            .withColumn(
                "text",
                F.when(
                    novel, F.array_join(F.reverse(F.split("text", " ")), " ")
                ).otherwise(F.col("text")),
            )
            .withColumn(
                "text", F.concat(F.col("text"), F.lit(" zq"), F.col("doc_id"))
            )
            .localCheckpoint()
        )
        ereps = -(-k // n_base_emb)
        de = (
            replicated(emb01, ereps, {"vec_id": 1_000_000})
            .limit(k)
            .withColumn("vec_id", F.col("vec_id") + F.lit(100_000_000))
            .withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 2 == 0,
                    F.transform("embedding", lambda x: -x),
                ).otherwise(F.col("embedding")),
            )
            .localCheckpoint()
        )
        return dd, de

    sweep = []
    for frac in (0.01, 0.03, 0.10):
        k = max(1, int(n_corpus * frac))
        delta, delta_emb = make_delta(k)
        mh = dedup.minhash_dedup_incremental(
            spark, mh_path, delta, corpus, threshold=0.5
        )
        t0 = time.time()
        mh_pairs = mh.count()
        mh_s = round(time.time() - t0, 2)
        mh_plan = mh._jdf.queryExecution().executedPlan().toString()
        iv = similarity.near_dup_against_ivf_index(
            spark, ivf_path, delta_emb, threshold=0.9, centroids=cents
        )
        t0 = time.time()
        iv_pairs = iv.count()
        iv_s = round(time.time() - t0, 2)
        iv_plan = iv._jdf.queryExecution().executedPlan().toString()
        # two distinct signals: "picker" = the size-adaptive HINT
        # decision (what a cluster without AQE-upgrade luck gets);
        # "executed" = the join AQE actually ran (it may upgrade a
        # shuffled plan to broadcast at runtime when the measured
        # shuffle bytes compress under the adaptive threshold — the
        # replicated fixture compresses ~20x, so the sf10 10% delta
        # reads "picker shuffled / executed broadcast": the hint is
        # gone, the OOM risk with it, and AQE still got the fast join)
        row = {
            "delta_rows": k,
            "frac": frac,
            "mh_pairs": mh_pairs,
            "mh_s": mh_s,
            "mh_probe_join": (
                "broadcast" if "BroadcastHashJoin" in mh_plan else "shuffled"
            ),
            "ivf_picker": (
                "broadcast"
                if similarity.probe_fits_broadcast(k, 4)
                else "shuffled"
            ),
            "ivf_pairs": iv_pairs,
            "ivf_s": iv_s,
            "ivf_probe_join": (
                "broadcast" if "BroadcastHashJoin" in iv_plan else "shuffled"
            ),
        }
        # flagship composition: every frac at sf1; one datapoint (the
        # 1% daily-delta shape) at sf10 — enough to show the chain's
        # constant corpus-side term (digest scan) without re-paying
        # the heavy sweep three times
        if times <= 10 or frac == 0.01:
            t0 = time.time()
            lineage = pipeline.e2e_incremental_pipeline(
                spark, delta, corpus, delta_emb, mh_path, ivf_path, cents,
                jaccard_threshold=0.5, cosine_threshold=0.9,
                default_budget=100_000,
            ).collect()
            row["e2e_s"] = round(time.time() - t0, 2)
            row["e2e_semantic_new"] = next(
                r.n_rows for r in lineage if r.stage == "semantic_new"
            )
        sweep.append(row)
        print(json.dumps(row), flush=True)

    res = {
        "incremental_probe": {
            "n_corpus": n_corpus,
            "build_mh_s": build_mh_s,
            "build_ivf_s": build_ivf_s,
            "n_ivf_lists": len(cents),
            "sweep": sweep,
        }
    }
    label = "sf1-synthetic" if times == 10 else f"sf{times // 10}-synthetic"
    _merge_scale(res, label)
    return 0


def e2e_main(times: int = 10) -> int:
    """sf1-/sf10-synthetic probe for the flagship pipeline_e2e_corpus
    row (r6 verdict #7): the full clean->dedup³->sample->pack->shard
    chain on a replicated corpus, per-stage lineage counts recorded.
    The exact-dedup stage collapses the replicas FIRST, so the
    expensive fuzzy/semantic stages see the identity count — the stage
    ordering is the scale strategy the lineage proves."""
    from sqlstreamstore_spark.analytics import pipeline
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe-e2e")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    d = "/root/testdata/sf0.1"
    docs = replicated(
        load_table(spark, d, "documents"), times, {"doc_id": 1_000_000}
    ).localCheckpoint()
    emb = replicated(
        load_table(spark, d, "embeddings"), times, {"vec_id": 1_000_000}
    ).localCheckpoint()
    t0 = time.time()
    rows = pipeline.e2e_corpus_pipeline(docs, emb, default_budget=800).collect()
    res = {
        "e2e_corpus_pipeline": {
            "s": round(time.time() - t0, 2),
            "lineage": {r.stage: r.n_rows for r in rows},
        }
    }
    print(json.dumps(res), flush=True)
    _merge_scale(res, "sf1-synthetic" if times == 10 else f"sf{times // 10}-synthetic")
    return 0


def train_dsir_main(times: int) -> int:
    """r7 verdict #6: scale probes for the round-7 additions. Expected
    shapes — the trainer's cost is T chained pruned-column scans
    (tracks features, not rows collected); DSIR is one gram explode +
    two partial aggs bounded by the 8192-bucket model."""
    from sqlstreamstore_spark.analytics import pipeline, sampling
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe-train-dsir")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    d = "/root/testdata/sf0.1"
    docs = replicated(
        load_table(spark, d, "documents"), times, {"doc_id": 1_000_000}
    ).localCheckpoint()
    n_docs = docs.count()
    res: dict = {}

    t0 = time.time()
    r = pipeline.logreg_train_quality(docs).collect()[0]
    res["logreg_train_quality"] = {
        "n_docs": n_docs, "iters": 5, "s": round(time.time() - t0, 2),
        "log_loss": r.log_loss,
    }
    print(json.dumps(res["logreg_train_quality"]), flush=True)

    t0 = time.time()
    n = sampling.dsir_importance_weights(docs).count()
    res["dsir_importance_weights"] = {
        "rows": n, "n_docs": n_docs, "buckets": 8192,
        "s": round(time.time() - t0, 2),
    }
    print(json.dumps(res["dsir_importance_weights"]), flush=True)

    t0 = time.time()
    n = sampling.dsir_importance_resample(
        docs, token_budget=max(2000, n_docs)
    ).count()
    res["dsir_importance_resample"] = {
        "rows": n, "n_docs": n_docs, "s": round(time.time() - t0, 2),
    }
    print(json.dumps(res["dsir_importance_resample"]), flush=True)

    label = "sf1-synthetic" if times == 10 else f"sf{times // 10}-synthetic"
    _merge_scale(res, label)
    return 0


def recall_main() -> int:
    """r7 verdict #7: ANN recall at scale. sf1-synthetic corpus (10x
    sf0.1 = 20k vectors), kmeans-trained centroids at the uncapped
    n_clusters = N/256 rule (~78 lists, above the 64-literal ceiling,
    so the whole run exercises the Arrow GEMM assign/probe twins), a
    hash-sampled 50-query set, recall@10 of the batched IVF join vs
    the exact brute-force top-10, with N_PROBE AS THE KNOB (1/2/4/8).
    """
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import similarity
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe-recall")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    d = "/root/testdata/sf0.1"
    emb = replicated(
        load_table(spark, d, "embeddings"), 10, {"vec_id": 1_000_000}
    ).localCheckpoint()
    n_vecs = emb.count()
    n_lists = max(8, n_vecs // 256)

    t0 = time.time()
    cents = similarity.kmeans_centroids(emb, n_clusters=n_lists, iters=2)
    train_s = round(time.time() - t0, 2)

    queries = emb.filter(F.col("vec_id") % 401 == 7).orderBy("vec_id").limit(50)
    n_q = queries.count()

    exact = {
        (r.qid, r.cid)
        for r in similarity.knn_join_bruteforce(emb, queries, k=10).collect()
    }
    recalls: dict[str, float] = {}
    probe_s: dict[str, float] = {}
    for n_probe in (1, 2, 4, 8):
        t0 = time.time()
        got = {
            (r.qid, r.cid)
            for r in similarity.knn_join_ivf_static(
                emb, queries, k=10, n_probe=n_probe, centroids=cents
            ).collect()
        }
        probe_s[f"p{n_probe}"] = round(time.time() - t0, 2)
        recalls[f"p{n_probe}"] = round(len(got & exact) / len(exact), 4)
    res = {
        "ivf_recall_at10": {
            "n_vecs": n_vecs, "n_lists": n_lists, "n_queries": n_q,
            "kmeans_train_s": train_s, "recall": recalls, "s": probe_s,
            "knob": "n_probe",
        }
    }
    print(json.dumps(res), flush=True)
    _merge_scale(res, "sf1-synthetic")
    return 0


def components_main(times: int = 10) -> int:
    """r9 verdict #4 (What's-missing #3): incremental SemDeDup cluster
    maintenance at held corpus scale — `extend_components` relabel cost
    must track the DELTA, never the corpus. A labeled corpus of
    5k·times docs (components of 5 consecutive ids; comp = min id, the
    connected_components contract) takes delta edge sets swept at
    1% / 3% / 10% of corpus size: each delta node brings one cross
    edge into the corpus, every 10th delta edge is a BRIDGE merging
    two existing components (the takeover case), plus delta-internal
    chains. Records relabel wall-clock per fraction, a correctness
    spot-check (bridged groups end up under the joint min id), and the
    executed-plan facts the verdict asks for: the comp-map relabel
    join BROADCASTS and the corpus label frame is touched only by
    keyed joins (no cartesian, no corpus-wide CC iteration)."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.dedup import extend_components
    from sqlstreamstore_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-components")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    n_docs = 5_000 * times
    g = 5
    labels = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            ((F.col("id") / g).cast("long") * g).alias("comp"),
        )
        .localCheckpoint()
    )
    res_rows: dict = {}
    plan_facts: dict = {}
    for frac in (0.01, 0.03, 0.10):
        n_delta = int(n_docs * frac)
        cross = spark.range(n_delta).select(
            (F.col("id") + n_docs).alias("doc_a"),
            ((F.col("id") * 13) % n_docs).alias("doc_b"),
        )
        bridge = spark.range(n_delta // 10).select(
            ((F.col("id") * 17) % n_docs).alias("doc_a"),
            (((F.col("id") * 17) + 3 * g) % n_docs).alias("doc_b"),
        )
        chain = spark.range(max(0, n_delta - 1)).select(
            (F.col("id") + n_docs).alias("doc_a"),
            (F.col("id") + n_docs + 1).alias("doc_b"),
        ).filter((F.col("doc_a") - n_docs) % 50 != 49)  # chains of 50
        edges = cross.union(bridge).union(chain).localCheckpoint()
        n_edges = edges.count()
        t0 = time.time()
        out = extend_components(labels, edges)
        n_out = out.count()
        dt = round(time.time() - t0, 2)
        if frac == 0.10:
            plan = out._jdf.queryExecution().executedPlan().toString()
            plan_facts = {
                "comp_map_broadcast": "BroadcastHashJoin" in plan,
                "no_cartesian": "CartesianProduct" not in plan
                and "BroadcastNestedLoopJoin" not in plan,
            }
            # spot-check one bridge merge: groups 0 and 3g share an edge
            got = {
                r["doc_id"]: r["comp"]
                for r in out.filter(F.col("doc_id").isin(0, 3 * g)).collect()
            }
            assert got[0] == 0 and got[3 * g] == 0, got
        res_rows[f"delta_{int(frac*100)}pct"] = {
            "n_edges": n_edges, "rows_out": n_out, "s": dt,
        }
    res = {
        "components_incremental": {
            "n_labeled": n_docs, "group_size": g,
            **res_rows, "plan": plan_facts,
        }
    }
    print(json.dumps(res), flush=True)
    label = "sf1-synthetic" if times <= 10 else "sf10-synthetic"
    _merge_scale(res, label)
    return 0


def ivf_lifecycle_main(times: int = 10, rounds: int = 8) -> int:
    """r9 verdict #5: the production failure mode of the IVF headline —
    upsert_ivf_index appends into FIXED lists, so repeated skewed
    deltas grow one hot list and drift its centroid; recall at fixed
    n_probe quietly degrades. Measure the degradation AND the repair:

      sf1-synthetic corpus (times=10 → 20k vectors), kmeans-trained
      quantizer, 80/20 build/holdout; `rounds` skewed upsert rounds
      (each delta pulled 80% toward one anchor vector — the
      concentrated-crawl shape); health (list-size Gini + mean/min
      shipped-centroid-vs-list-mean cosine) and recall@10 at n_probe=4
      before vs after rebalance_ivf_index (Lloyd retrain on the
      index's own vectors + swap rewrite).
    """
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import similarity
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    import os
    import tempfile

    spark = get_spark(app_name="scale-probe-ivf-lifecycle")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    d = "/root/testdata/sf0.1"
    emb = replicated(
        load_table(spark, d, "embeddings"), times, {"vec_id": 1_000_000}
    ).localCheckpoint()
    n_clusters = 32
    base = emb.filter(F.col("vec_id") % 5 != 0)
    held = emb.filter(F.col("vec_id") % 5 == 0).localCheckpoint()
    n_held = held.count()

    path = tempfile.mkdtemp(prefix="sss-ivf-life-") + "/index"
    t0 = time.time()
    cents = similarity.kmeans_centroids(base, n_clusters=n_clusters, iters=2)
    similarity.build_ivf_index(base, path, centroids=cents)
    build_s = round(time.time() - t0, 2)

    # each round upserts 1/rounds of the holdout pulled 70% toward one
    # anchor — the concentrated-crawl shape (a new dense topic region).
    # Under the STALE quantizer all of it lands in the anchor's list:
    # the list grows to ~6x its balanced size, every probe that touches
    # it scans that mass (latency), and its centroid stops representing
    # either the old or the new residents (staleness). Lloyd retraining
    # SPLITS the hot region across several lists — the verdict's
    # "split hot lists" repair — restoring per-probe scan mass.
    anchor = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    ]
    a = F.array(*[F.lit(x) for x in anchor])
    t0 = time.time()
    for r in range(rounds):
        delta = held.filter(F.col("vec_id") % rounds == r).select(
            "vec_id",
            F.zip_with(
                F.col("embedding").cast("array<double>"), a,
                lambda v, c: 0.3 * v + 0.7 * c,
            ).cast("array<float>").alias("embedding"),
            "label",
        )
        similarity.upsert_ivf_index(delta, path, cents)
    upsert_s = round(time.time() - t0, 2)

    def health(cs):
        rows = similarity.ivf_index_health(spark, path, cs).collect()
        pop = [r["centroid_cos"] for r in rows if r["n_vecs"] > 0]
        return {
            "gini": round(rows[0]["size_gini"], 4),
            "mean_cos": round(sum(pop) / len(pop), 4),
            "min_cos": round(min(pop), 4),
            "max_share": round(max(r["size_share"] for r in rows), 4),
        }

    # queries from the DELTA region (held-out ids are the upserted
    # rows) — the fresh-crawl queries a production pipeline runs right
    # after ingest, exactly the neighborhoods the stale quantizer split
    queries = (
        spark.read.parquet(path)
        .filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 173 == 10))
        .select("vec_id", "embedding")
        .limit(40)
        .localCheckpoint()
    )
    idx_vecs = spark.read.parquet(path).select("vec_id", "embedding")
    exact = {
        (r.qid, r.cid)
        for r in similarity.knn_join_bruteforce(idx_vecs, queries, k=10).collect()
    }

    def recall(cs):
        """recall@10 AND mean scanned rows per query at each n_probe —
        the skew cost is the scan mass: a hot list makes every probe
        that touches it pay its size."""
        from sqlstreamstore_spark.analytics.similarity import ivf_probe_lists

        sizes = {
            r["cluster_id"]: r["n"]
            for r in spark.read.parquet(path)
            .groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
        }
        out = {}
        for np_ in (1, 2, 4):
            got = {
                (r.qid, r.cid)
                for r in similarity.knn_join_ivf_index(
                    spark, path, queries, cs, k=10, n_probe=np_
                ).collect()
            }
            probes = ivf_probe_lists(queries, cs, n_probe=np_).collect()
            scan = sum(sizes.get(r["pcid"], 0) for r in probes) / max(
                1, len({r["qid"] for r in probes})
            )
            out[f"p{np_}"] = {
                "recall": round(len(got & exact) / len(exact), 4),
                "scanned_rows_per_query": round(scan, 1),
            }
        return out

    t0 = time.time()
    h_before = health(cents)
    health_s = round(time.time() - t0, 2)
    r_before = recall(cents)

    t0 = time.time()
    new_cents = similarity.rebalance_ivf_index(
        spark, path, n_clusters=n_clusters, iters=2, max_share=0.06
    )
    rebalance_s = round(time.time() - t0, 2)
    h_after = health(new_cents)
    r_after = recall(new_cents)

    res = {
        "ivf_lifecycle": {
            "n_vecs": base.count() + n_held, "n_lists": n_clusters,
            "upsert_rounds": rounds, "build_s": build_s,
            "upserts_s": upsert_s, "health_s": health_s,
            "rebalance_s": rebalance_s,
            "n_lists_after": len(new_cents),
            "before": {**h_before, "recall_at10": r_before},
            "after": {**h_after, "recall_at10": r_after},
        }
    }
    print(json.dumps(res), flush=True)
    _merge_scale(res, "sf1-synthetic")
    import shutil

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return 0


def main() -> int:
    from sqlstreamstore_spark.analytics import dedup, pipeline, sampling, similarity, text, tpch
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def workloads(docs, emb, lineitem, events, part, orders, label):
        res = {"scale": label}
        t0 = time.time()
        res["rows_docs"] = docs.count()
        res["rows_lineitem"] = lineitem.count()
        res["materialize_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        n = dedup.minhash_lsh_candidates(docs).count()
        res["minhash_lsh_candidates"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = text.token_stats(docs).count()
        res["token_stats"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = pipeline.clean_corpus(docs).count()
        res["clean_corpus"] = {"rows": n, "s": round(time.time() - t0, 2)}

        qvec = [float(x) for x in emb.limit(1).collect()[0].embedding]
        t0 = time.time()
        n = similarity.cosine_topk_ivf_static(emb, qvec, k=10).count()
        res["ivf_static_topk"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = similarity.cosine_near_dup_pairs_lsh(emb, sort=False).count()
        res["near_dup_lsh"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = tpch.q1_pricing_summary(lineitem).count()
        res["tpch_q1"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = text.ngram_novelty(docs).count()
        res["ngram_novelty"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        r = text.kmv_distinct_ngrams(docs).first()
        res["kmv_distinct"] = {
            "n_exact": r.n_exact,
            "rel_err": round(r.rel_err, 4),
            "s": round(time.time() - t0, 2),
        }

        t0 = time.time()
        n = sampling.pps_systematic_sample(docs).count()
        res["pps_sample"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # graph trio (VERDICT r3 #7): the only gate family with no
        # sf1-synthetic row; triangles' wedge fan-out is the shape with
        # a plausible skew blow-up. Edges derive from lineitem so they
        # grow with the replicated corpus.
        from sqlstreamstore_spark.analytics import graph

        edges = graph.supplier_cooccurrence_edges(lineitem).localCheckpoint()
        res["graph_edges"] = edges.count()

        t0 = time.time()
        n = graph.pagerank(edges, iters=3).count()
        res["graph_pagerank"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = graph.triangle_count(edges).count()
        res["graph_triangles"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        src = edges.agg(F.min("src")).collect()[0][0]
        n = graph.bfs_distances(edges, int(src), max_depth=3).count()
        res["graph_bfs"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # round-4 operator families: drift (per-value shuffle + two-
        # phase cumsum), z-order write (one range shuffle + stats agg),
        # incremental state merge (group-sized shuffle)
        import tempfile

        from sqlstreamstore_spark.analytics import drift, incremental
        from sqlstreamstore_spark.sources import zorder

        t0 = time.time()
        r = drift.ks_drift(
            events.filter(F.col("event_type") == "click"),
            events.filter(F.col("event_type") == "purchase"), "value",
        ).collect()[0]
        res["drift_ks_exact"] = {
            "ks_d": round(r.ks_d, 4), "s": round(time.time() - t0, 2)}

        t0 = time.time()
        orders_like = lineitem.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"),
            (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("long").alias("b"))
        with tempfile.TemporaryDirectory() as zd:
            m = zorder.write_zordered(orders_like, zd + "/z", "a", "b", n_buckets=64)
            res["zorder_write"] = {
                "buckets": len(m["buckets"]), "s": round(time.time() - t0, 2)}
            # round-5: the pruned READ path — a 10% slice on column a
            # must scan a minority of buckets at every scale
            lo, hi = orders_like.agg(F.min("a"), F.max("a")).collect()[0]
            a_rng = (int(lo), int(lo) + (int(hi) - int(lo)) // 10)
            t0 = time.time()
            pr, nread, ntot = zorder.read_pruned(spark, zd + "/z", a_range=a_rng)
            n = pr.filter(F.col("a").between(*a_rng)).count()
            res["zorder_pruned_read"] = {
                "rows": n, "buckets_read": nread, "buckets_total": ntot,
                "s": round(time.time() - t0, 2)}

        # round-5: incremental IVF maintenance — upsert cost must track
        # the DELTA size (O(new) assignment + partitioned append),
        # not the index size
        t0 = time.time()
        with tempfile.TemporaryDirectory() as ivd:
            base = emb.filter(F.col("vec_id") % 5 != 0)
            delta = emb.filter(F.col("vec_id") % 5 == 0)
            cents = similarity.build_ivf_index(base, ivd + "/ix", n_clusters=8)
            build_s = round(time.time() - t0, 2)
            n_delta = delta.count()
            t0 = time.time()
            similarity.upsert_ivf_index(delta, ivd + "/ix", cents)
            res["ivf_upsert"] = {
                "rows_delta": n_delta, "build_s": build_s,
                "s": round(time.time() - t0, 2)}

        t0 = time.time()
        a = incremental.daily_rollup(events.filter(F.col("event_id") % 2 == 0))
        b = incremental.daily_rollup(events.filter(F.col("event_id") % 2 == 1))
        n = incremental.merge_rollups(a, b).count()
        res["incremental_merge"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # round-5 late families: substring-span dedup (one gram shuffle
        # keyed by 16-byte digests + per-doc bounded window — the shape
        # with a plausible blow-up if the cross-doc join fanned out),
        # unigram LM scoring (vocab groupBy + token equi-join),
        # Bloom prefilter (fixed-size filter, probe = k lookups/doc),
        # CMS (fixed grid), A-ES top-k (per-partition heaps).
        t0 = time.time()
        n = dedup.substring_dup_spans(docs).count()
        res["substring_spans"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = text.unigram_logprob(docs).count()
        res["unigram_logprob"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        incoming = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
        n = dedup.bloom_prefilter(docs, incoming, m_bits=1 << 20).count()
        res["bloom_prefilter"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = text.cms_token_freq(docs).count()
        res["cms_freq"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = sampling.weighted_sample_aes(docs, k=100).count()
        res["weighted_aes"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # session-2 round-5 families: per-user RANGE sliding frame (the
        # one with a real per-entity sort — watch it track events
        # linearly), per-source quality gate (GK-sketch thresholds,
        # no sort), bigram LM + PMI (bigram-keyed partial aggs),
        # winnowing containment (windowed min + fingerprint join),
        # per-label centroids (|labels|xdim shuffle only).
        from sqlstreamstore_spark.analytics import events as ev_ops

        # force the window/agg columns: a bare count() would let Catalyst
        # prune the WindowExec (and time nothing)
        t0 = time.time()
        sv = ev_ops.sliding_value_window(events)
        row = sv.agg(
            F.count("*").alias("n"), F.sum("sum_window").alias("chk")
        ).collect()[0]
        res["sliding_1h"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = pipeline.quality_percentile_gate(docs).count()
        res["quality_gate"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = text.bigram_logprob(docs).count()
        res["bigram_logprob"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = text.collocations_pmi(docs).count()
        res["collocations_pmi"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = dedup.winnow_shared_pairs(docs).count()
        res["winnow_pairs"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        lc = similarity.label_centroids(emb)
        row = lc.agg(
            F.count("*").alias("n"), F.sum("mean_cos_to_centroid").alias("chk")
        ).collect()[0]
        res["label_centroids"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        # late round-5: quantile normalization (two-phase cumsum +
        # two-phase last-carry — the global as-of, the family's deepest
        # composition), directional containment (shingle equi-join),
        # BM25 (inverted-index probe: term filter before any shuffle)
        t0 = time.time()
        qn = pipeline.quantile_normalize_scores(docs)
        row = qn.agg(
            F.count("*").alias("n"), F.sum("calibrated").alias("chk")
        ).collect()[0]
        res["quantile_normalize"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = dedup.containment_pairs(docs, threshold=0.5).count()
        # r6: the auto df cap (max(64, ceil(sqrt(N)))) must ENGAGE on the
        # replicated corpus — record how many hot shingles it drops
        cap = dedup.derive_shingle_df_cap(docs.count())
        from sqlstreamstore_spark.analytics.dedup import _shingles

        n_hot = (
            docs.select(F.explode(_shingles(F.col("text"), 3)).alias("s"))
            .groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") > cap).count()
        )
        res["containment_pairs"] = {
            "rows": n, "s": round(time.time() - t0, 2),
            "df_cap": cap, "hot_shingles_dropped": n_hot,
        }

        t0 = time.time()
        bm = text.bm25_scores(docs)
        row = bm.agg(F.count("*").alias("n"), F.sum("bm25").alias("chk")).collect()[0]
        res["bm25_scores"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        # session-4 round-5 families: HLL register build (one 256-row
        # partial agg over the gram explode), rolling register-merge
        # (per-hour state bounded at 256 rows however many users),
        # interval-overlap join (grid-cell equi-join — pair count grows
        # with genuine window density), per-user EWMA (grouped pandas,
        # per-key sequences 10x longer at sf1-synthetic), literal-seed
        # Lloyd step (shuffle-free assignment + k*dim partial agg)
        from sqlstreamstore_spark.analytics import events as events_ops

        t0 = time.time()
        row = text.hll_distinct_ngrams(docs).collect()[0]
        res["hll_distinct"] = {"rows": 1, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        rh = events_ops.rolling_distinct_users_hll(events)
        row = rh.agg(F.count("*").alias("n"), F.sum("hll_users").alias("chk")).collect()[0]
        res["rolling_distinct_hll"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        a = events.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("a_event_id"), F.col("user_id").alias("a_user"),
            F.col("ts").alias("a_s"), (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("a_e"))
        b = events.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("b_event_id"), F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_s"), (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("b_e"))
        from sqlstreamstore_spark.analytics import asof as asof_ops

        n = asof_ops.interval_overlap_join(
            a, b, "a_user", "b_user", "a_s", "a_e", "b_s", "b_e", bucket_secs=1_800
        ).count()
        res["interval_overlap"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        ew = events_ops.ewma_value(events)
        row = ew.agg(F.count("*").alias("n"), F.sum("ewma").alias("chk")).collect()[0]
        res["ewma"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = similarity.kmeans_lloyd_step(emb).count()
        res["kmeans_step"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = events_ops.scd2_versions(events).count()
        res["scd2_versions"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        st = events_ops.session_table(events)
        row = st.agg(F.count("*").alias("n"), F.sum("duration_us").alias("chk")).collect()[0]
        res["session_table"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = text.vocab_growth(docs).count()
        res["vocab_growth"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        from sqlstreamstore_spark.analytics import relational as rel_ops

        n = rel_ops.weighted_median(docs.withColumn("source", F.lit("all")).withColumn("n_chars", F.length("text"))).count()
        res["weighted_median"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        n = sampling.temperature_mixture_sample(
            docs.withColumn("source", (F.col("doc_id") % 20).cast("string"))
        ).count()
        res["temperature_mixture"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # round-6 families: batched multi-query ANN (one corpus pass
        # serves the whole query batch — query count grows ~0.1% of the
        # corpus, so both sides scale; the broadcast probe join + rank-
        # limit-pushed top-k must keep cost ∝ corpus, not corpus×Q)
        qbatch = emb.filter(F.col("vec_id") % 997 == 0).localCheckpoint()
        nq = qbatch.count()
        t0 = time.time()
        n = similarity.knn_join_ivf_static(emb, qbatch, k=5, n_probe=4).count()
        res["ivf_batch_knn"] = {
            "rows": n, "queries": nq, "s": round(time.time() - t0, 2)}

        # corpus-as-queries kNN graph + components (edge count ≤ N·k by
        # construction; CC runs on the edge graph, not the corpus).
        # n_clusters tracks N/256 — the derive_lsh_bits rule applied to
        # inverted lists; at fixed 8 lists the candidate mass is
        # N²·n_probe/8, the LSH bits=4 blow-up all over again
        n_emb = emb.count()
        ncl = min(64, max(8, n_emb // 256))
        t0 = time.time()
        sc = similarity.semantic_clusters(
            emb, k=4, threshold=0.35, n_clusters=ncl)
        row = sc.agg(
            F.count("*").alias("n"),
            F.count_distinct("comp").alias("n_comps"),
            F.max("comp_size").alias("max_size"),
        ).collect()[0]
        res["semantic_clusters"] = {
            "rows": row.n, "n_comps": row.n_comps, "n_lists": ncl,
            "max_size": row.max_size, "s": round(time.time() - t0, 2)}

        # round-6 evaluation/governance families: exact AUC (distinct-
        # score-keyed partial agg + two-phase cumsum — never a corpus
        # sort), cross-source contamination (inverted-index gram join,
        # pair axis bounded by sources², NOT docs²), Stupid Backoff LM
        # (three count shuffles + equi-join probes), KMV set-algebra
        # (190 pair rows from 640 sketch rows at ANY corpus size),
        # basket rules (pairs ≤ items-per-basket² per basket), backlog
        # sweep-line (calendar-bounded axis + two-phase cumsum),
        # log-odds contrast (|langs|×|vocab| output)
        from sqlstreamstore_spark.analytics import evaluation

        t0 = time.time()
        r = evaluation.roc_auc(docs).collect()[0]
        res["roc_auc"] = {
            "n_scores": r.n_scores, "auc": round(r.auc, 4),
            "s": round(time.time() - t0, 2)}

        t0 = time.time()
        cm = text.contamination_matrix(docs)
        row = cm.agg(F.count("*").alias("n"), F.sum("n_inter").alias("chk")).collect()[0]
        res["contamination_matrix"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        sb = text.stupid_backoff_scores(docs)
        row = sb.agg(F.count("*").alias("n"), F.sum("n_tier3").alias("t3")).collect()[0]
        res["stupid_backoff"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        kj = text.kmv_jaccard_pairs(docs)
        row = kj.agg(F.count("*").alias("n"), F.sum("j_est").alias("chk")).collect()[0]
        res["kmv_jaccard"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        from sqlstreamstore_spark.analytics import relational as rel6

        t0 = time.time()
        ar = rel6.brand_assoc_rules(lineitem, part)
        row = ar.agg(F.count("*").alias("n"), F.sum("c_both").alias("chk")).collect()[0]
        res["assoc_rules"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        bl = rel6.open_lineitem_backlog(orders, lineitem)
        row = bl.agg(F.count("*").alias("n"), F.max("open_backlog").alias("peak")).collect()[0]
        res["backlog_sweepline"] = {
            "rows": row.n, "peak": row.peak, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        lo = text.log_odds_enrichment(docs)
        row = lo.agg(F.count("*").alias("n"), F.sum("z").alias("chk")).collect()[0]
        res["log_odds"] = {"rows": row.n, "s": round(time.time() - t0, 2)}

        # chunk-keyed window; on the replicated corpus every chunk
        # repeats 10x, so kept_frac should collapse toward ~1/10 —
        # the C4 boilerplate-removal case at its most extreme
        t0 = time.time()
        sd = pipeline.sentence_dedup(docs)
        row = sd.agg(
            F.count("*").alias("n"),
            F.sum("n_kept").alias("kept"),
            F.sum("n_chunks").alias("tot"),
        ).collect()[0]
        res["sentence_dedup"] = {
            "rows": row.n,
            "kept_frac": round(row.kept / row.tot, 4),
            "s": round(time.time() - t0, 2),
        }

        from sqlstreamstore_spark.analytics import quality as qual6

        t0 = time.time()
        rv = qual6.rule_violations(orders, lineitem)
        row = rv.agg(
            F.count("*").alias("n"), F.sum("n_violations").alias("viol")
        ).collect()[0]
        res["rule_violations"] = {
            "rows": row.n, "viol": row.viol, "s": round(time.time() - t0, 2)}

        from sqlstreamstore_spark.analytics import (
            events as ev6,
            evaluation as eval6,
            relational as rel6b,
        )

        # curve rows = distinct durations; both cumsums two-phase
        t0 = time.time()
        km = ev6.km_survival(events)
        row = km.agg(F.count("*").alias("n"), F.min("survival").alias("smin")).collect()[0]
        res["km_survival"] = {
            "rows": row.n, "s_min": row.smin, "s": round(time.time() - t0, 2)}

        # frontier stays tiny no matter the input; two-phase cummax
        t0 = time.time()
        sky = rel6b.part_skyline(part)
        n = sky.count()
        res["part_skyline"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # bucket count bounded by time x types, not rows
        t0 = time.time()
        bars = ev6.ohlc_bars(events)
        n = bars.count()
        res["ohlc_bars"] = {"rows": n, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        st = ev6.activity_streaks(events)
        row = st.agg(F.count("*").alias("n"), F.max("longest_streak").alias("mx")).collect()[0]
        res["activity_streaks"] = {
            "rows": row.n, "max_streak": row.mx, "s": round(time.time() - t0, 2)}

        t0 = time.time()
        rep = eval6.classification_report(docs).collect()[0]
        res["classification_report"] = {
            "f1": round(rep.f1, 4), "s": round(time.time() - t0, 2)}

        # reflection identity: per-event ledger, two keyed windows
        t0 = time.time()
        cb = ev6.clamped_balance(events)
        row = cb.agg(
            F.count("*").alias("n"),
            F.sum((F.col("balance_cents") == 0).cast("long")).alias("clamps"),
        ).collect()[0]
        res["clamped_balance"] = {
            "rows": row.n, "clamps": row.clamps, "s": round(time.time() - t0, 2)}

        # pair axis bounded by brands^2 regardless of fact size
        t0 = time.time()
        bc = rel6.brand_cooccurrence(lineitem, part)
        n = bc.count()
        res["brand_cooccurrence"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # anti-entropy checksums: payload never shuffles, bucket axis only
        from sqlstreamstore_spark.analytics import quality as qual6b

        t0 = time.time()
        mk = qual6b.merkle_bucket_checksums(lineitem)
        n = mk.count()
        res["merkle_checksums"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # two global rankings via the two-phase dense index
        t0 = time.time()
        rf = eval6.rrf_fusion(docs)
        n = rf.count()
        res["rrf_fusion"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # sweep-line peak concurrency: distinct-timestamp axis only
        t0 = time.time()
        pc = ev6.peak_concurrency(events).collect()[0]
        res["peak_concurrency"] = {
            "peak": pc.peak, "s": round(time.time() - t0, 2)}

        # exact frame-DISTINCT via 28x explode replication
        t0 = time.time()
        st = ev6.dau_mau_stickiness(events)
        n = st.count()
        res["dau_mau"] = {"rows": n, "s": round(time.time() - t0, 2)}

        # 3 sessionizations for the price of one keyed window
        t0 = time.time()
        sw = ev6.session_gap_sweep(events)
        row = sw.agg(F.sum("n_sessions").alias("n")).collect()[0]
        res["gap_sweep"] = {
            "sessions_all_gaps": row.n, "s": round(time.time() - t0, 2)}
        return res

    out = []
    for sf in ("0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        docs = load_table(spark, d, "documents").localCheckpoint()
        emb = load_table(spark, d, "embeddings").localCheckpoint()
        li = load_table(spark, d, "lineitem").localCheckpoint()
        ev = load_table(spark, d, "events").localCheckpoint()
        pt = load_table(spark, d, "part").localCheckpoint()
        od = load_table(spark, d, "orders").localCheckpoint()
        out.append(workloads(docs, emb, li, ev, pt, od, f"sf{sf}"))
        print(json.dumps(out[-1]), flush=True)

    # synthetic sf1: replicate sf0.1 10x with shifted keys
    d = "/root/testdata/sf0.1"
    docs = replicated(load_table(spark, d, "documents"), 10, {"doc_id": 1_000_000}).localCheckpoint()
    emb = replicated(load_table(spark, d, "embeddings"), 10, {"vec_id": 1_000_000}).localCheckpoint()
    li = replicated(
        load_table(spark, d, "lineitem"), 10, {"l_orderkey": 10_000_000}
    ).localCheckpoint()
    ev = replicated(
        load_table(spark, d, "events"), 10, {"event_id": 10_000_000}
    ).localCheckpoint()
    # part stays unreplicated (l_partkey is NOT shifted, so the small
    # dim still joins; brands are the bounded item axis either way);
    # orders replicates on the same orderkey span as lineitem
    pt = load_table(spark, d, "part").localCheckpoint()
    od = replicated(
        load_table(spark, d, "orders"), 10, {"o_orderkey": 10_000_000}
    ).localCheckpoint()
    out.append(workloads(docs, emb, li, ev, pt, od, "sf1-synthetic"))
    print(json.dumps(out[-1]), flush=True)

    # committed artifact: bench.py attaches this as its scale_probe
    # section so the sf1-synthetic evidence rides along in BENCH_r{N}
    import os

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "SCALE_PROBE.json")
    with open(art, "w") as f:
        json.dump({"scales": out}, f, indent=1)
    print(f"wrote {art}", flush=True)
    return 0


def compaction_main(times: int = 10, n_upserts: int = 20) -> int:
    """Round 9: does compaction pay for itself at corpus scale? Build
    the sf1-synthetic banded-LSH index, drip `n_upserts` small daily
    upserts into it (half re-sent corpus rows — pure duplicate band
    rows, the idempotent-ingest hazard compact_index exists for), and
    measure the 1%-delta probe + the index file/row counts BEFORE and
    AFTER compact_index. Also times the term-index (vocabulary) merge
    view against a full corpus recompute at the same upsert depth."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import dedup, text
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe-compaction")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    d = "/root/testdata/sf0.1"
    docs01 = load_table(spark, d, "documents")
    n_base = docs01.count()
    corpus = replicated(docs01, times, {"doc_id": 1_000_000}).localCheckpoint()
    n_corpus = corpus.count()
    delta = (
        corpus.filter(F.col("doc_id") % 100 == 7)
        .withColumn("doc_id", F.col("doc_id") + F.lit(100_000_000))
        .withColumn("text", F.concat_ws(" ", F.col("text"), F.lit("zq7")))
        .localCheckpoint()
    )

    base = tempfile.mkdtemp(prefix="sss-scale-compact-")
    mh = os.path.join(base, "mh")
    t0 = time.time()
    dedup.build_minhash_index(corpus, mh)
    build_s = round(time.time() - t0, 2)

    def stats(path):
        files = rows = 0
        for root, _, fs in os.walk(path):
            for f in fs:
                if f.endswith(".parquet"):
                    files += 1
        rows = spark.read.parquet(path).count()
        return files, rows

    # drip upserts: odd k re-sends an already-indexed corpus slice
    # (duplicate rows), even k adds genuinely new docs
    t0 = time.time()
    for k in range(n_upserts):
        if k % 2 == 1:
            batch = corpus.filter(F.col("doc_id") % 200 == k)
        else:
            batch = (
                corpus.filter(F.col("doc_id") % 200 == k)
                .withColumn("doc_id", F.col("doc_id") + F.lit(200_000_000 + k))
            )
        dedup.upsert_minhash_index(batch, mh)
    upserts_s = round(time.time() - t0, 2)
    files_b, rows_b = stats(mh)

    def probe():
        t0 = time.time()
        n = dedup.minhash_dedup_incremental(
            spark, mh, delta, corpus, threshold=0.5
        ).count()
        return n, round(time.time() - t0, 2)

    probe(); probe()  # codegen warm
    n_pre, probe_pre_s = probe()
    t0 = time.time()
    dedup.compact_index(spark, mh, partition_by="band")
    compact_s = round(time.time() - t0, 2)
    files_a, rows_a = stats(mh)
    n_post, probe_post_s = probe()
    assert n_pre == n_post, (n_pre, n_post)

    # term-index tier at the same scale: build + drip + merged view
    terms = os.path.join(base, "terms")
    t0 = time.time()
    text.build_term_index(corpus, terms)
    term_build_s = round(time.time() - t0, 2)
    t0 = time.time()
    for k in range(n_upserts):
        text.upsert_term_index(
            delta.filter(F.col("doc_id") % n_upserts == k), terms
        )
    term_upserts_s = round(time.time() - t0, 2)
    t0 = time.time()
    n_vocab = text.vocabulary_from_index(spark, terms, limit=200).count()
    merge_s = round(time.time() - t0, 2)
    t0 = time.time()
    text.corpus_vocabulary(corpus.unionByName(delta), limit=200).count()
    recompute_s = round(time.time() - t0, 2)

    res = {
        "index_compaction": {
            "n_corpus": n_corpus,
            "n_upserts": n_upserts,
            "build_s": build_s,
            "upserts_s": upserts_s,
            "files_before": files_b,
            "rows_before": rows_b,
            "compact_s": compact_s,
            "files_after": files_a,
            "rows_after": rows_a,
            "probe_pairs": n_pre,
            "probe_before_s": probe_pre_s,
            "probe_after_s": probe_post_s,
        },
        "term_index": {
            "build_s": term_build_s,
            "upserts_s": term_upserts_s,
            "n_vocab": n_vocab,
            "merge_view_s": merge_s,
            "full_recompute_s": recompute_s,
        },
    }
    label = "sf1-synthetic" if times == 10 else f"sf{times // 10}-synthetic"
    _merge_scale(res, label)
    return 0


def round9b_main(times: int = 10) -> int:
    """Round-9b additions at sf1-synthetic (10× sf0.1 = 50k docs):
    the ×64 bootstrap explode must collapse map-side (wall ∝ corpus,
    not corpus×64 shuffle), curriculum_pack's two stacked two-phase
    passes must stay near the plain packer's cost, and the per-source
    reports (fertility, privacy triad) are one-pass groupBys."""
    import time as _t

    from sqlstreamstore_spark.analytics import evaluation, pipeline, quality, text
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe-r9b")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs01 = load_table(spark, "/root/testdata/sf0.1", "documents")
    docs = replicated(docs01, times, {"doc_id": 1_000_000}).localCheckpoint()
    n = docs.count()

    res: dict = {}

    def run(name, df):
        t0 = _t.time()
        rows = df.count()
        res[name] = {"rows": rows, "n_docs": n, "s": round(_t.time() - t0, 2)}

    run("bootstrap_ci", evaluation.bootstrap_ci(docs))
    run("curriculum_pack", pipeline.curriculum_pack(docs))
    run("pack_spans_plain", pipeline.pack_sequences_spans(docs))
    run("length_batches", pipeline.length_bucket_batches(docs))
    run("interleave", pipeline.interleave_sources(docs))
    run("t_closeness", quality.t_closeness_report(docs))
    run("tokenizer_fertility", text.tokenizer_fertility(docs))
    label = "sf1-synthetic" if times == 10 else f"sf{times // 10}-synthetic"
    _merge_scale({"round9b": res}, label)
    return 0


def round9c_main(times: int = 10) -> int:
    """Round-9c: link prediction on the replicated co-occurrence graph
    (wedge-bounded, never all-pairs) and the bounded-axis trend family
    (event-scale work = one daily-counts groupBy)."""
    import time as _t

    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import events as EV
    from sqlstreamstore_spark.analytics import graph, similarity
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe-r9c")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    li01 = load_table(spark, "/root/testdata/sf0.1", "lineitem")
    li = replicated(
        li01, times, {"l_orderkey": 10_000_000, "l_suppkey": 1_000_000}
    ).localCheckpoint()
    ev01 = load_table(spark, "/root/testdata/sf0.1", "events")
    ev = replicated(ev01, times, {"event_id": 100_000_000, "user_id": 1_000_000})
    emb01 = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    emb = replicated(emb01, times, {"vec_id": 1_000_000})

    res: dict = {}

    def run(name, df, extra=None):
        t0 = _t.time()
        rows = df.count()
        res[name] = {"rows": rows, "s": round(_t.time() - t0, 2)}
        if extra:
            res[name].update(extra)

    edges = graph.supplier_cooccurrence_edges(li, min_orders=5)
    n_edges = edges.count()
    run(
        "link_prediction",
        graph.link_prediction_jaccard(edges, top_n=200),
        {"n_edges": n_edges},
    )
    # round 10 (VERDICT r9 #7): the degree-capped twin — hubs excluded
    # as wedge centers bound the d² term a dense co-occurrence graph
    # pays; record the wall-clock and the cap actually engaging
    from pyspark.sql import functions as _F

    adj = edges.select("src").union(edges.select(_F.col("dst").alias("src")))
    degs = adj.groupBy("src").count()
    cap = 64
    n_hubs = degs.filter(_F.col("count") > cap).count()
    run(
        "link_prediction_capped",
        graph.link_prediction_jaccard(edges, top_n=200, max_degree=cap),
        {"n_edges": n_edges, "max_degree": cap, "hubs_excluded": n_hubs},
    )
    run("mann_kendall", EV.mann_kendall_trend(ev))
    run("hodges_lehmann", EV.hodges_lehmann_location(ev))
    run("dft_periodogram", EV.dft_periodogram(ev))
    run("centroid_drift", similarity.embedding_centroid_drift(emb))
    label = "sf1-synthetic" if times == 10 else f"sf{times // 10}-synthetic"
    _merge_scale({"round9c": res}, label)
    return 0


def sink_horizon_main(
    batches: int = 50, batch_docs: int = 200, key: str = "sink_horizon"
) -> int:
    """r10 verdict #5: the long-horizon sink curve. Drives
    fuzzy_dedup_ingest_sink — the FULL curation chain (quality
    predicates → digest anti-join → LSH probe → IVF semantic probe →
    decontamination → corpus append → index upserts) — for O(50)
    fixed-size micro-batches in ONE streaming query
    (maxFilesPerTrigger=1), with the round-11 HEALTH-DRIVEN rebalance
    wired in (ivf_index_health every 5 batches; Gini/min-cos
    thresholds fire rebalance_ivf_index and the retrained centroids
    flow into subsequent probes via centroid_state). Records each
    batch's trigger wall-clock from the query's own progress events:
    the 'work ∝ batch, never corpus' claim becomes a measured curve —
    per-batch cost must stay flat (or log-bounded) while the corpus
    and both indexes grow ~11x over the horizon.

    Batch composition (fixed size): 75% novel docs (md5-counter
    synthetic text — never near-dups of anything; embeddings are
    seed-vector perturbations, pulled 50% toward one anchor from
    batch 15 on — the concentrated-crawl shape that skews the IVF
    index and fires the health trigger), 12.5% exact duplicates of
    seed docs (digest-stage drops), 12.5% near-duplicates (one token
    appended — LSH-stage drops)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import dedup, pipeline, similarity
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table
    from sqlstreamstore_spark.streaming.sink import fuzzy_dedup_ingest_sink

    spark = get_spark(app_name="scale-probe-sink-horizon")
    # recentProgress keeps only the LAST N progress events (default
    # 100): a horizon longer than that would silently drop its early
    # batches and fake the first10-vs-last10 comparison — size the
    # buffer to the horizon
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(batches + 20)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base = tempfile.mkdtemp(prefix="sss-sink-horizon-")
    input_dir = os.path.join(base, "input")
    corpus_path = os.path.join(base, "corpus")
    mh_path = os.path.join(base, "mh_index")
    ivf_path = os.path.join(base, "ivf_index")
    ngram_path = os.path.join(base, "ngram_index")
    os.makedirs(input_dir)

    d = "/root/testdata/sf0.1"
    digest_path = os.path.join(base, "digest_index")
    emb = load_table(spark, d, "embeddings")
    seed = (
        load_table(spark, d, "documents")
        .join(emb, F.col("doc_id") == F.col("vec_id"))
        .select("doc_id", "text", "embedding")
        .localCheckpoint()
    )
    seed.write.parquet(corpus_path)
    dedup.build_minhash_index(seed, mh_path)
    cents = similarity.kmeans_centroids(
        seed.select(F.col("doc_id").alias("vec_id"), "embedding"),
        n_clusters=16, iters=2,
    )
    similarity.build_ivf_index(
        seed.select(F.col("doc_id").alias("vec_id"), "embedding"),
        ivf_path, centroids=cents,
    )
    # tiny benchmark for the decontamination stage: 5 seed docs
    pipeline.build_ngram_index(seed.limit(5), ngram_path, n=8)

    seed_rows = seed.limit(60).collect()
    seed_vecs = [list(map(float, r["embedding"])) for r in seed_rows]
    anchor = seed_vecs[0]
    vocab = [f"w{j:02d}" for j in range(48)]

    def novel_text(b: int, i: int) -> str:
        ws = []
        for j in range(60):
            h = hashlib.md5(f"sink:{b}:{i}:{j}".encode()).digest()[0]
            ws.append(vocab[h % len(vocab)])
        return " ".join(ws)

    def perturb(v, b, i, pull):
        h = hashlib.md5(f"vec:{b}:{i}".encode()).digest()
        noise = [(h[j % 16] - 127.5) / 127.5 for j in range(len(v))]
        return [
            float((1 - pull) * (0.7 * x + 0.3 * nz) + pull * a)
            for x, nz, a in zip(v, noise, anchor)
        ]

    n_novel = int(batch_docs * 0.75)
    n_dup = (batch_docs - n_novel) // 2
    t_gen = time.time()
    for b in range(batches):
        pull = 0.5 if b >= 15 else 0.0
        rows = []
        for i in range(n_novel):
            did = 1_000_000 + b * batch_docs + i
            v = seed_vecs[(b * 31 + i) % len(seed_vecs)]
            rows.append((did, novel_text(b, i), perturb(v, b, i, pull)))
        for i in range(n_dup):  # exact dups → digest drop
            r = seed_rows[(b + i) % len(seed_rows)]
            rows.append(
                (2_000_000 + b * batch_docs + i, r["text"],
                 list(map(float, r["embedding"])))
            )
        for i in range(n_dup):  # near-dups → LSH drop
            r = seed_rows[(b + i + 7) % len(seed_rows)]
            rows.append(
                (3_000_000 + b * batch_docs + i,
                 r["text"] + f" sinktail{b}",
                 perturb(list(map(float, r["embedding"])), b, 9999 + i, 0.0))
            )
        # direct pyarrow write (no Spark job per file): a 500-file
        # horizon at ~6 s/Spark-write spent 45 min GENERATING input —
        # the same bytes land in milliseconds, and the streamed schema
        # (doc_id long, text string, embedding array<float>) is
        # identical
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "embedding": pa.array(
                    [r[2] for r in rows], pa.list_(pa.float32())
                ),
            }
        )
        dst = os.path.join(input_dir, f"batch_{b:03d}.parquet")
        pq.write_table(tbl, dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
    gen_s = round(time.time() - t_gen, 2)

    stream = (
        spark.readStream.schema("doc_id long, text string, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    state: dict = {"centroids": cents}
    t0 = time.time()
    q = fuzzy_dedup_ingest_sink(
        stream, corpus_path, mh_path,
        threshold=0.5,
        checkpoint_dir=os.path.join(base, "ckpt"),
        ivf_index_path=ivf_path, centroids=cents,
        cosine_threshold=0.98,
        ngram_index_path=ngram_path, decontaminate_n=8,
        min_tokens=3,
        centroid_state=state,
        ivf_health_every=5,
        ivf_gini_threshold=0.45,
        ivf_min_cos_threshold=0.85,
        ivf_rebalance_max_share=0.15,
        # round 12 (VERDICT r11 #2/#3): maintained prefix-partitioned
        # digest index (pruned probe instead of re-hashing the corpus
        # every batch) + Lloyd retrain off the ingest critical path
        digest_index_path=digest_path,
        ivf_repair_async=True,
        # round 12b: LSM hygiene for the append-accreting indexes —
        # without it the 500-batch curve collapsed ~8 → ~57 s/batch
        # near b100 on the O(batches) tiny-file listing tax
        index_compact_files=192,
    )
    # live per-batch feed (diagnosis + early-kill visibility): poll
    # recentProgress while the query drains and print each batch's
    # trigger time with the index file counts and the persistent-RDD
    # census (the two growth suspects at long horizons)
    def _nfiles(p):
        return sum(
            1 for _, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
        )

    def _nrdds():
        try:
            return len(spark.sparkContext._jsc.getPersistentRDDs())
        except Exception:
            return -1

    seen = -1
    while q.isActive:  # property in pyspark 4, NOT a method
        time.sleep(5)
        for p in sorted(q.recentProgress, key=lambda p: p["batchId"]):
            if p["batchId"] > seen and p.get("numInputRows", 0) > 0:
                seen = p["batchId"]
                print(
                    f"b{seen} {p['durationMs'].get('triggerExecution', 0) / 1000.0:.2f}s"
                    f" lists={len(state['centroids'])}"
                    f" files mh={_nfiles(mh_path)} ivf={_nfiles(ivf_path)}"
                    f" dig={_nfiles(digest_path)}"
                    f" rdds={_nrdds()}",
                    flush=True,
                )
    q.awaitTermination(10)
    total_s = round(time.time() - t0, 2)
    # a build still in flight when availableNow drains finalizes here
    from sqlstreamstore_spark.streaming.sink import finalize_ivf_repair

    finalize_ivf_repair(spark, state, ivf_path, wait_s=300.0)
    prog = sorted(q.recentProgress, key=lambda p: p["batchId"])
    durs = [
        round(p["durationMs"].get("triggerExecution", 0) / 1000.0, 3)
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]

    corpus_rows = spark.read.parquet(corpus_path).count()
    mh_rows = spark.read.parquet(mh_path).count()
    ivf_rows = spark.read.parquet(ivf_path).count()
    h = similarity.ivf_index_health(spark, ivf_path, state["centroids"]).collect()
    pop = [r["centroid_cos"] for r in h if r["n_vecs"] > 0 and r["centroid_cos"] is not None]

    def mean(xs):
        return round(sum(xs) / max(1, len(xs)), 3)

    res = {
        key: {
            "batches": len(durs), "batch_docs": batch_docs,
            "gen_s": gen_s, "total_s": total_s,
            "per_batch_s": durs,
            "mean_b1_10": mean(durs[1:10]),
            "mean_b20_30": mean(durs[20:30]),
            "mean_last10": mean(durs[-10:]),
            "last10_over_first10": round(
                mean(durs[-10:]) / mean(durs[1:10]), 3
            ),
            "corpus_rows_final": corpus_rows,
            "mh_index_rows_final": mh_rows,
            "ivf_index_rows_final": ivf_rows,
            "digest_index_rows_final": dedup.read_digest_index(
                spark, digest_path
            ).distinct().count(),
            "rebalances": state.get("rebalances", []),
            "repair_errors": state.get("repair_errors", []),
            "compactions": state.get("compactions", []),
            "final_health": {
                "gini": round(float(h[0]["size_gini"]), 4),
                "min_cos": round(float(min(pop)), 4) if pop else None,
                "n_lists": len(state["centroids"]),
            },
        }
    }
    print(json.dumps(res), flush=True)
    _merge_scale(res, "sf1-synthetic")
    shutil.rmtree(base, ignore_errors=True)
    return 0


def sq8_main(times: int = 10) -> int:
    """r11: SQ8 recall/fidelity at sf1-synthetic (times=10 → 20k
    vectors). Measures what the 4x memory cut costs: recall@10 of the
    SQ8 ranker and of the composed IVF-SQ8 (n_probe=4) against brute
    force over 20 query vectors, plus the approx-vs-exact cosine gap
    and the bytes/vector accounting."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import similarity as S
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe-sq8")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    emb = replicated(
        load_table(spark, "/root/testdata/sf0.1", "embeddings"),
        times, {"vec_id": 1_000_000},
    ).localCheckpoint()
    n = emb.count()
    dim = len(emb.limit(1).collect()[0]["embedding"])
    t0 = time.time()
    model = S.sq8_train(emb)
    train_s = round(time.time() - t0, 2)
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") % 997 == 3).limit(20).collect()
    ]
    hit_sq8 = hit_ivfsq8 = 0
    gaps = []
    t_sq8 = t_brute = 0.0
    for _qid, qv in queries:
        t0 = time.time()
        rows = S.cosine_topk_sq8(emb, qv, k=10, model=model).collect()
        t_sq8 += time.time() - t0
        got = {r["vec_id"] for r in rows}
        gaps.extend(abs(r["approx_cosine"] - r["cosine"]) for r in rows)
        t0 = time.time()
        want = {r["vec_id"] for r in S.cosine_topk_bruteforce(emb, qv, k=10).collect()}
        t_brute += time.time() - t0
        hit_sq8 += len(got & want)
        got2 = {
            r["vec_id"]
            for r in S.cosine_topk_ivfsq8_static(
                emb, qv, k=10, n_probe=4, model=model
            ).collect()
        }
        hit_ivfsq8 += len(got2 & want)
    res = {
        "sq8": {
            "n_vecs": n, "dim": dim, "train_s": train_s,
            "recall_at10_sq8": round(hit_sq8 / (10 * len(queries)), 4),
            "recall_at10_ivfsq8_p4": round(hit_ivfsq8 / (10 * len(queries)), 4),
            "max_approx_gap": round(max(gaps), 6),
            "mean_query_s_sq8": round(t_sq8 / len(queries), 3),
            "mean_query_s_brute": round(t_brute / len(queries), 3),
            "bytes_per_vec_codes": dim,
            "bytes_per_vec_float32": 4 * dim,
        }
    }
    print(json.dumps(res), flush=True)
    _merge_scale(res, "sf1-synthetic")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--sq8":
        raise SystemExit(sq8_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10))
    if len(sys.argv) > 1 and sys.argv[1] == "--sink-horizon":
        raise SystemExit(
            sink_horizon_main(
                int(sys.argv[2]) if len(sys.argv) > 2 else 50,
                int(sys.argv[3]) if len(sys.argv) > 3 else 200,
                sys.argv[4] if len(sys.argv) > 4 else "sink_horizon",
            )
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--round9c":
        raise SystemExit(
            round9c_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--round9b":
        raise SystemExit(
            round9b_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--compaction":
        raise SystemExit(
            compaction_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--sf10":
        raise SystemExit(sf10_main(sys.argv[2] if len(sys.argv) > 2 else "all"))
    if len(sys.argv) > 1 and sys.argv[1] == "--e2e":
        raise SystemExit(
            e2e_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--train-dsir":
        raise SystemExit(
            train_dsir_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--recall":
        raise SystemExit(recall_main())
    if len(sys.argv) > 1 and sys.argv[1] == "--ivf-lifecycle":
        raise SystemExit(
            ivf_lifecycle_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--components":
        raise SystemExit(
            components_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--incremental":
        raise SystemExit(
            incremental_main(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        )
    raise SystemExit(main())
