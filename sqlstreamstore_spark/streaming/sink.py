"""Streaming ingestion INTO the store — the write-side twin of
streaming/source.py. The reference has no streaming writer (its writer
is the application calling AppendToStream in a loop); Spark-first, the
natural shape is a foreachBatch sink where every micro-batch lands as
ONE bulk commit:

    readStream(...)  →  transform to message columns  →  store_sink()

Per-epoch exactly-once: Structured Streaming may re-run an epoch after
a failure, and bulk_append has no per-message idempotency (by
contract). The sink therefore records the last committed epoch per
query name in the store manifest and skips replays — the same
checkpoint-plus-transactional-sink pattern every exactly-once Spark
sink uses, with the store's own manifest as the transaction log.

Scale: message bytes never touch the driver (bulk_append writes the
batch through Spark executors); the driver handles only per-stream head
aggregates and the manifest swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore


def store_sink(
    store: SparkParquetStreamStore,
    messages_stream: DataFrame,
    order_col: str,
    query_name: str = "sqlstreamstore_sink",
    trigger: dict | None = None,
):
    """Start a streaming query that appends every micro-batch to the
    store in one bulk commit. ``messages_stream`` must carry the message
    columns (stream_id, message_id, type, json_data, json_metadata,
    created_utc) plus ``order_col`` for intra-stream ordering.

    Returns the StreamingQuery. Epoch replays are skipped via the
    manifest's sink_epochs record (exactly-once per epoch).
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        committed = store._manifest.setdefault("sink_epochs", {})
        if committed.get(query_name, -1) >= epoch_id:
            return  # epoch replay after restart — already committed
        if batch_df.isEmpty():
            return
        # Stamp the epoch BEFORE the commit: bulk_append's manifest swap
        # then persists data + epoch marker atomically. If the commit
        # fails before the swap, its parquet output is an unreferenced
        # orphan (readers are manifest-scoped) and the marker rolls
        # back, so the replayed epoch re-runs cleanly — no path
        # double-appends.
        prev = committed.get(query_name, -1)
        committed[query_name] = epoch_id
        try:
            store.bulk_append(batch_df, order_col=order_col, allow_existing=True)
        except BaseException:
            committed[query_name] = prev
            raise

    return (
        messages_stream.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", f"{store.path}/checkpoints/{query_name}")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def deduped_store_sink(
    store: SparkParquetStreamStore,
    messages_stream: DataFrame,
    order_col: str,
    content_col: str = "json_data",
    query_name: str = "sqlstreamstore_dedup_sink",
    trigger: dict | None = None,
):
    """store_sink with online exact dedup: each micro-batch drops
    messages whose ``content_col`` digest was already ingested (by any
    earlier epoch OR earlier in the same batch — first occurrence by
    ``order_col`` wins), then lands as one bulk commit.

    The seen-digest set is a parquet side table under the store
    (``_dedup_index/<query_name>``) — the streaming-state analog of
    dedup.new_against_corpus: per epoch one anti-join of the batch's
    digests against the index, then the fresh digests append to it.
    Only 16-byte digests ever shuffle; at 100 TB the index is an
    ordinary parquet table a day's batch anti-joins against.

    Guarantees: the STORE stays exactly-once per epoch (same manifest
    epoch marker as store_sink). The INDEX is best-effort: a crash
    between the bulk commit and the index append loses those digests'
    membership (a later duplicate could slip in) — rebuild with
    ``rebuild_dedup_index`` for a hard guarantee. Duplicate rows inside
    the index are harmless (membership semantics).
    """
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    index_dir = os.path.join(store.path, "_dedup_index", query_name)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        committed = store._manifest.setdefault("sink_epochs", {})
        if committed.get(query_name, -1) >= epoch_id:
            return
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.withColumn("__h", F.md5(F.col(content_col)))
        if os.path.isdir(index_dir):
            batch = batch.join(
                spark.read.parquet(index_dir), "__h", "left_anti"
            )
        w = Window.partitionBy("__h").orderBy(order_col)
        fresh = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint()  # score once: appended AND indexed below
        )
        if fresh.isEmpty():
            return  # all-duplicate epoch: replay recomputes to empty

        prev = committed.get(query_name, -1)
        committed[query_name] = epoch_id
        try:
            store.bulk_append(fresh.drop("__h"), order_col=order_col, allow_existing=True)
        except BaseException:
            committed[query_name] = prev
            raise
        fresh.select("__h").write.mode("append").parquet(index_dir)

    return (
        messages_stream.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", f"{store.path}/checkpoints/{query_name}")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def fuzzy_dedup_ingest_sink(
    docs_stream: DataFrame,
    corpus_path: str,
    mh_index_path: str,
    threshold: float = 0.5,
    query_name: str = "sqlstreamstore_fuzzy_ingest",
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    ivf_index_path: str | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
    cosine_threshold: float = 0.35,
    emb_col: str = "embedding",
    ngram_index_path: str | None = None,
    decontaminate_n: int = 8,
    min_tokens: int | None = None,
    min_distinct_ratio: float | None = None,
    centroid_state: dict | None = None,
    ivf_health_every: int | None = None,
    ivf_gini_threshold: float = 0.5,
    ivf_min_cos_threshold: float = 0.85,
    ivf_rebalance_max_share: float | None = None,
    ivf_rebalance_iters: int = 2,
    digest_index_path: str | None = None,
    ivf_repair_async: bool = False,
    corpus_files_per_batch: int | None = 1,
    index_compact_files: int | None = None,
):
    """Streaming dedup-on-ingest — the Structured Streaming twin
    of the incremental flagship's FULL curation chain: each
    micro-batch of documents

      0. (round 10 — when ``min_tokens``/``min_distinct_ratio`` are
         set) applies the static quality predicates (clean_corpus's
         stage 1) so junk never reaches the index probes,
      1. digest-anti-joins the corpus (idempotent replay + exact dedup
         in one pass — the new_against_corpus shape),
      2. md5-first-wins within the batch,
      3. probes the MAINTAINED banded LSH index
         (dedup.minhash_dedup_incremental) and drops docs with a
         corpus near-dup at ``threshold``,
      3b. (round 10, VERDICT r9 #6 — when ``ivf_index_path`` is set
         and the batch carries ``emb_col``) probes the MAINTAINED
         cluster-partitioned IVF index
         (similarity.near_dup_against_ivf_index, size-adaptive probe
         join, self-pair guarded) and drops docs with a corpus
         SEMANTIC near-dup at ``cosine_threshold``,
      3c. (round 10 — when ``ngram_index_path`` is set) DECONTAMINATES:
         drops docs sharing any word ``decontaminate_n``-gram with the
         materialized benchmark index
         (pipeline.decontaminate_incremental — broadcast probe, work
         ∝ batch tokens),
      4. appends the survivors to the corpus parquet, and
      5. upserts the survivors' band rows into the LSH index and
         their embeddings into the IVF index (upsert_ivf_index),

    so all indexes and the corpus stay consistent and the NEXT batch
    checks against everything ingested so far — the full
    e2e_incremental_pipeline dedup chain as one self-maintaining sink.

    Crash-safety: step 1 makes replays idempotent on the corpus (a
    re-delivered doc's digest is already there); duplicate band rows /
    embedding rows from a replayed step 5 are harmless (candidate
    membership is DISTINCT, and both probes self-pair-guard on
    new != old), so a re-probed batch whose index rows already landed
    cannot report itself as its own near-dup. A crash between 4 and 5
    loses the batch's index membership until the next full rebuild
    (``dedup.build_minhash_index(corpus)`` /
    ``similarity.build_ivf_index(corpus_emb)``) — the same best-effort
    index contract as deduped_store_sink.

    Scale shape per epoch: one digest anti-join (16-byte rows), one
    delta-signature pass, one map-side broadcast probe of the
    band-partitioned index, one semi-join-pruned verify, one
    partition-pruned IVF probe — work ∝ batch, never the corpus (the
    verify prune is plan-pinned in tests/test_plans.py).

    HEALTH-DRIVEN IVF REPAIR (round 11, VERDICT r10 #5 — the streaming
    end of the index lifecycle): with ``ivf_health_every=N`` set, every
    N handled batches the sink runs :func:`similarity.ivf_index_health`
    on its own IVF index and, if the list-size Gini exceeds
    ``ivf_gini_threshold`` OR any populated list's shipped-vs-current
    centroid cosine falls below ``ivf_min_cos_threshold``, runs
    :func:`similarity.rebalance_ivf_index` (Lloyd retrain + optional
    ``ivf_rebalance_max_share`` hot-list split + retire-swap). The
    retrained centroids replace the shipped ones for every subsequent
    probe and upsert via the caller-owned ``centroid_state`` dict:
    pass ``{}`` (or pre-seed ``{"centroids": [...]}``); the sink
    maintains ``centroid_state["centroids"]`` (current quantizer),
    ``["batches"]`` (handled-batch counter — epoch replays re-count,
    which only shifts the check cadence, never correctness) and
    ``["rebalances"]`` (one record per repair: batch, epoch, the
    triggering gini/min_cos, list count after). Health is a model-
    sized aggregate (one count per list + one |lists|x dim mean), so
    the cadence check costs far less than the batch's own probes;
    rebalance itself costs one assignment pass + clustered rewrite,
    paid only when the monitor actually fires.

    BOUNDED PER-BATCH PROBE COST (round 12, VERDICT r11 #2): with
    ``digest_index_path`` set, the exact-dedup stage probes a
    MAINTAINED prefix-partitioned digest index
    (dedup.build_digest_index → probe_digest_index) instead of
    re-hashing the whole corpus text every batch — the scan prunes to
    the partitions the batch's own digests hash to, O(min(|batch|,
    256)/256 · index) instead of O(corpus). The index bootstraps from
    the corpus on first use and survivors upsert into it right after
    the corpus append. Contract: the digest index is the same
    BEST-EFFORT side structure as the LSH/IVF indexes — a crash in the
    one-statement window between corpus append and digest upsert can
    re-admit that batch's rows on replay (duplicate corpus rows, which
    every downstream probe tolerates by set semantics); rebuild with
    ``dedup.build_digest_index(corpus, digest_index_path)`` for the
    hard guarantee. Without ``digest_index_path`` the sink keeps the
    corpus-scan anti-join (exact replay idempotency, O(corpus)/batch).

    OUT-OF-BAND REPAIR (round 12, VERDICT r11 #3): with
    ``ivf_repair_async=True`` a fired health check SNAPSHOTS the index
    file list and runs the Lloyd retrain + rewrite on a daemon thread
    (similarity.rebalance_ivf_build) while ingest continues against
    the untouched live index; the first handler after the build
    completes finalizes at the serial safe point
    (similarity.rebalance_finalize: delta catch-up of files appended
    since the snapshot + swap). The 25-49 s in-trigger retrain stalls
    the r11 sink_horizon measured become a delta-sized catch-up +
    two renames inside the batch. While a repair is in flight the
    monitor does not re-fire. A failed build is recorded in
    ``centroid_state["repair_errors"]`` and the sink continues on the
    old index (next cadence can re-trigger).

    ``corpus_files_per_batch`` coalesces the survivors' corpus append
    (default 1 — a micro-batch is far below one parquet file's worth;
    None keeps the upstream partitioning for large-delta deployments).
    """
    import os
    import threading
    import time as _time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import dedup, similarity

    state = centroid_state if centroid_state is not None else {}
    state.setdefault("centroids", centroids)

    def _finalize_repair_if_ready(spark) -> None:
        finalize_ivf_repair(spark, state, ivf_index_path)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # localCheckpoint hygiene (round 12b): the PREVIOUS batch's
        # exact-stage checkpoint blocks are dead by construction (this
        # batch re-reads every index from parquet), but py4j's lazy
        # weak-ref release leaks them at long horizons — measured
        # +1.3 persistent RDDs/batch, monotone, with per-batch cost
        # creeping 7 → 10 s by b73 on the 500-batch probe. Release
        # exactly the RDDs that FIRST APPEARED during the previous
        # handler call (entry-snapshot diff — caller-cached frames are
        # never touched), then snapshot for this one.
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            cur = set(jmap.keySet().toArray())
            for rid in set(state.get("__ckpt_rdds") or []) & cur:
                jr = jmap.get(rid)
                if jr is not None:
                    jr.unpersist(False)
            state["__rdds_at_entry"] = set(
                spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
            )
        except Exception:
            state["__rdds_at_entry"] = set()
        # safe point: the handler is serial, so a completed async
        # repair swaps in before this batch's probes touch the index
        _finalize_repair_if_ready(spark)
        if min_tokens is not None or min_distinct_ratio is not None:
            toks = F.split(F.col("text"), " ")
            pred = F.lit(True)
            if min_tokens is not None:
                pred = pred & (F.size(toks) >= min_tokens)
            if min_distinct_ratio is not None:
                pred = pred & (
                    F.size(F.array_distinct(toks)).cast("double")
                    / F.size(toks).cast("double")
                    >= min_distinct_ratio
                )
            batch_df = batch_df.filter(pred)
        if not os.path.isdir(corpus_path):
            # a crash between a corpus compaction's two renames parks
            # the complete corpus at .__retired__ with nothing live —
            # restore it BEFORE the have_corpus probe, else this batch
            # would silently treat a populated store as first-ever
            # ingest and rebuild the digest index from nothing
            from sqlstreamstore_spark.sources.hadoopfs import recover_retired

            recover_retired(spark, corpus_path)
        have_corpus = os.path.isdir(corpus_path)
        if have_corpus:
            corpus = spark.read.parquet(corpus_path)
        if digest_index_path is not None and have_corpus:
            if not os.path.isdir(digest_index_path):
                # one-time bootstrap from the existing corpus; every
                # later batch pays only the pruned probe + its own
                # O(delta) upsert
                dedup.build_digest_index(corpus, digest_index_path)
            batch = dedup.probe_digest_index(
                spark, digest_index_path, batch_df, keep_digest=True
            )
        else:
            batch = batch_df.withColumn("__h", F.md5("text"))
            if have_corpus:
                batch = batch.join(
                    corpus.select(F.md5("text").alias("__h")).distinct(),
                    "__h", "left_anti",
                )
        w = Window.partitionBy("__h").orderBy("doc_id")
        fresh = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__h")
            # materialize the exact stage ONCE (r12): the probe stages
            # below each fire 1-2 actions (broadcast builds, size
            # counts), and without this barrier every action re-runs
            # the batch read + quality filter + digest anti-join +
            # first-wins window — ~5x redundant upstream evaluation
            # per micro-batch, growing with the index it probes. The
            # checkpoint is one batch-sized write.
            .localCheckpoint()
        )
        if have_corpus and os.path.isdir(mh_index_path):
            losers = (
                dedup.minhash_dedup_incremental(
                    spark, mh_index_path, fresh, corpus,
                    threshold=threshold, k=k, bands=bands, n=n,
                )
                .select(F.col("new_doc").alias("doc_id"))
                .distinct()
            )
            fresh = fresh.join(losers, "doc_id", "left_anti")
        sem_on = (
            ivf_index_path is not None
            and emb_col in fresh.columns
            and have_corpus
            and os.path.isdir(ivf_index_path)
        )
        if sem_on:
            q = fresh.filter(F.col(emb_col).isNotNull()).select(
                F.col("doc_id").alias("vec_id"),
                F.col(emb_col).alias("embedding"),
            )
            sem_losers = (
                similarity.near_dup_against_ivf_index(
                    spark, ivf_index_path, q,
                    threshold=cosine_threshold,
                    centroids=state["centroids"],
                )
                .select(F.col("new_vec").alias("doc_id"))
                .distinct()
            )
            fresh = fresh.join(sem_losers, "doc_id", "left_anti")
        if ngram_index_path is not None and os.path.isdir(ngram_index_path):
            from sqlstreamstore_spark.analytics.pipeline import (
                decontaminate_incremental,
            )

            contaminated = decontaminate_incremental(
                spark, ngram_index_path, fresh, n=decontaminate_n
            ).select("doc_id")
            fresh = fresh.join(contaminated, "doc_id", "left_anti")
        fresh = fresh.localCheckpoint()  # score once: appended AND indexed
        if fresh.isEmpty():
            return
        out = (
            fresh.coalesce(corpus_files_per_batch)
            if corpus_files_per_batch
            else fresh
        )
        out.write.mode("append").parquet(corpus_path)
        if digest_index_path is not None:
            # immediately after the corpus append — the best-effort
            # crash window is this one statement (docstring contract)
            if os.path.isdir(digest_index_path):
                dedup.upsert_digest_index(fresh, digest_index_path)
                # LSM hygiene: fold the flat tail into the hp=
                # partitions once it exceeds the file budget — keeps
                # total index file count O(256 + budget) instead of
                # O(prefixes × batches)
                dedup.roll_digest_tail(spark, digest_index_path)
            else:  # first-ever batch: corpus was empty, index is born here
                dedup.build_digest_index(fresh, digest_index_path)
        dedup.upsert_minhash_index(
            fresh, mh_index_path, k=k, bands=bands, n=n
        )
        if ivf_index_path is not None and emb_col in fresh.columns:
            from sqlstreamstore_spark.analytics.similarity import (
                _static_centroids,
            )

            emb_fresh = fresh.filter(F.col(emb_col).isNotNull()).select(
                F.col("doc_id").alias("vec_id"),
                F.col(emb_col).alias("embedding"),
            )
            similarity.upsert_ivf_index(
                emb_fresh, ivf_index_path, state["centroids"] or _static_centroids()
            )
        # health-driven repair cadence (round 11 — docstring above)
        state["batches"] = state.get("batches", 0) + 1
        if (
            ivf_health_every
            and ivf_index_path is not None
            and os.path.isdir(ivf_index_path)
            and state["batches"] % ivf_health_every == 0
        ):
            from sqlstreamstore_spark.analytics.similarity import (
                _static_centroids,
            )

            cur = state["centroids"] or _static_centroids()
            rows = similarity.ivf_index_health(spark, ivf_index_path, cur).collect()
            pop = [
                r["centroid_cos"]
                for r in rows
                if r["n_vecs"] > 0 and r["centroid_cos"] is not None
            ]
            gini = float(rows[0]["size_gini"]) if rows else 0.0
            min_cos = float(min(pop)) if pop else 1.0
            fire = gini > ivf_gini_threshold or min_cos < ivf_min_cos_threshold
            if fire and ivf_repair_async and not state.get("repair"):
                # OUT-OF-BAND: snapshot the file list, retrain off the
                # critical path; the live index keeps serving probes
                # and upserts untouched until finalize's safe point
                snapshot = similarity.list_index_files(spark, ivf_index_path)
                tmp = ivf_index_path.rstrip("/") + ".__rebalancing__"
                from sqlstreamstore_spark.sources.hadoopfs import (
                    fs_delete,
                    fs_exists,
                )

                if fs_exists(spark, tmp):  # stale crashed build
                    fs_delete(spark, tmp)
                rec: dict = {
                    "status": "running",
                    "tmp": tmp,
                    "snapshot": snapshot,
                    "trigger": {
                        "batch": state["batches"],
                        "epoch": int(epoch_id),
                        "gini": round(gini, 4),
                        "min_cos": round(min_cos, 4),
                    },
                }
                state["repair"] = rec
                n_lists = len(cur)

                def _build() -> None:
                    t0 = _time.time()
                    try:
                        rec["cents"] = similarity.rebalance_ivf_build(
                            spark, snapshot, tmp,
                            n_clusters=n_lists,
                            iters=ivf_rebalance_iters,
                            max_share=ivf_rebalance_max_share,
                        )
                        rec["build_s"] = round(_time.time() - t0, 2)
                        rec["status"] = "ready"
                    except BaseException as e:  # surfaced via repair_errors
                        rec["err"] = f"{type(e).__name__}: {e}"
                        rec["status"] = "failed"

                threading.Thread(
                    target=_build, name="ivf-rebalance-build", daemon=True
                ).start()
            elif fire and not ivf_repair_async:
                new_cents = similarity.rebalance_ivf_index(
                    spark,
                    ivf_index_path,
                    n_clusters=len(cur),
                    iters=ivf_rebalance_iters,
                    max_share=ivf_rebalance_max_share,
                )
                state["centroids"] = new_cents
                state.setdefault("rebalances", []).append(
                    {
                        "batch": state["batches"],
                        "epoch": int(epoch_id),
                        "gini": round(gini, 4),
                        "min_cos": round(min_cos, 4),
                        "mode": "inline",
                        "n_lists_after": len(new_cents),
                    }
                )
        # LSM hygiene for the APPEND-accreting indexes (round 12b):
        # every upsert lands one file per band (mh) / per touched list
        # (ivf), so at a long horizon the per-batch probe pays an
        # O(batches) tiny-file listing+footer tax — the 500-batch
        # probe measured the curve collapsing ~8 s → ~57 s/batch near
        # b100 from exactly this. With ``index_compact_files`` set,
        # any index tree over the budget is compacted in-handler
        # (dedup.compact_index — distinct + clustered rewrite +
        # retire-swap, probe results unchanged). Amortized: the
        # rewrite is O(corpus) on a fixed file cadence, one stalled
        # trigger per firing, the same amortization the digest tail
        # roll above uses. The IVF tree is skipped while an async
        # repair is in flight (finalize diffs the live file list
        # against its snapshot; a concurrent swap would break the
        # catch-up), and the repair's own rewrite compacts anyway.
        if index_compact_files:
            def _n_parquet(p: str) -> int:
                from sqlstreamstore_spark.sources.hadoopfs import resolved

                root = resolved(spark, p)
                if root.startswith("file:"):
                    root = root[len("file:"):]
                return sum(
                    1
                    for _, _, fs in os.walk(root)
                    for f in fs
                    if f.endswith(".parquet")
                )

            todo: list[tuple[str, dict, int]] = []
            if os.path.isdir(mh_index_path):
                todo.append((mh_index_path, {}, index_compact_files))
            if (
                ivf_index_path is not None
                and os.path.isdir(ivf_index_path)
                and not state.get("repair")
            ):
                todo.append(
                    (ivf_index_path, {"partition_by": "cluster_id"},
                     index_compact_files)
                )
            if digest_index_path is not None and os.path.isdir(digest_index_path):
                # every tail ROLL appends one file per touched hp=
                # partition (~256), so the digest tree regrows the
                # listing tax on the roll cadence; its floor is one
                # file per prefix dir, hence the +256 budget offset
                todo.append(
                    (digest_index_path, {}, index_compact_files + 256)
                )
            if os.path.isdir(corpus_path):
                # the CORPUS fragments too (one appended file per
                # batch) and the LSH verify stage scans it every
                # batch — measured +~5 s/batch by b150 on the 500-
                # batch probe from task count ∝ file count alone.
                # Tighter budget than the indexes: its per-batch
                # growth is 1 file, so 96 keeps the scan small while
                # compacting only ~every 90 batches. Doc-id
                # uniqueness makes distinct() a no-op on rows. At
                # 100 TB a full corpus rewrite is not viable — there
                # the fold is incremental (rewrite only the recent
                # small-file tail, the store's by-position compact()
                # discipline); a crash between the swap renames is
                # recovered at the next batch's entry guard above.
                todo.append((corpus_path, {}, min(index_compact_files, 96)))
            for pth, kw, budget in todo:
                nf = _n_parquet(pth)
                if nf > budget:
                    t0 = _time.time()
                    dedup.compact_index(spark, pth, **kw)
                    state.setdefault("compactions", []).append(
                        {
                            "batch": state["batches"],
                            "path": os.path.basename(pth.rstrip("/")),
                            "files_before": nf,
                            "files_after": _n_parquet(pth),
                            "s": round(_time.time() - t0, 2),
                        }
                    )
        # record the RDDs that first appeared during THIS handler call
        # (entry-snapshot diff) — the next call's hygiene pass at the
        # top of handle() unpersists exactly these and nothing else
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            state["__ckpt_rdds"] = sorted(
                set(jmap.keySet().toArray()) - state.pop("__rdds_at_entry", set())
            )
        except Exception:  # census hygiene must never fail a batch
            pass

    ckpt = checkpoint_dir or f"{corpus_path}-checkpoints/{query_name}"
    return (
        docs_stream.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", ckpt)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def finalize_ivf_repair(
    spark, centroid_state: dict, ivf_index_path: str, wait_s: float = 0.0
) -> bool:
    """Finalize an out-of-band IVF repair recorded in
    ``centroid_state["repair"]`` — catch up files appended since the
    snapshot, swap the rebuilt index live, ship the retrained
    centroids, and log the repair record. The sink calls this at the
    start of every handler (the serial safe point); callers invoke it
    directly after an ``availableNow`` stream terminates with a build
    still in flight (``wait_s`` polls for the build thread to finish).
    Returns True if a repair was finalized. Failed builds are drained
    into ``centroid_state["repair_errors"]`` and return False."""
    import time as _time

    from sqlstreamstore_spark.analytics import similarity

    deadline = _time.time() + wait_s
    while True:
        rep = centroid_state.get("repair")
        if not rep:
            return False
        if rep["status"] == "failed":
            centroid_state.setdefault("repair_errors", []).append(
                rep.get("err", "")
            )
            centroid_state["repair"] = None
            return False
        if rep["status"] == "ready":
            break
        if _time.time() >= deadline:
            return False
        _time.sleep(0.1)
    t0 = _time.time()
    similarity.rebalance_finalize(
        spark, ivf_index_path, rep["tmp"], rep["cents"], rep["snapshot"]
    )
    centroid_state["centroids"] = rep["cents"]
    centroid_state.setdefault("rebalances", []).append(
        {
            **rep["trigger"],
            "mode": "async",
            "n_lists_after": len(rep["cents"]),
            "build_s": rep.get("build_s"),
            "finalize_s": round(_time.time() - t0, 2),
            "finalized_at_batch": centroid_state.get("batches", 0),
        }
    )
    centroid_state["repair"] = None
    return True


def rebuild_dedup_index(
    store: SparkParquetStreamStore,
    content_col: str = "json_data",
    query_name: str = "sqlstreamstore_dedup_sink",
) -> int:
    """Re-derive the seen-digest index from the store's actual log —
    the recovery path after a crash left the index behind the store.
    Returns the number of distinct digests written."""
    import os
    import shutil

    from pyspark.sql import functions as F

    index_dir = os.path.join(store.path, "_dedup_index", query_name)
    digests = store.log_df().select(F.md5(F.col(content_col)).alias("__h")).distinct()
    tmp = index_dir + ".rebuild"
    digests.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.replace(tmp, index_dir)
    n = store.spark.read.parquet(index_dir).count()
    return n


# ------------------------------------------------------------------
# Incremental ROLLUP maintenance as a streaming sink: the materialized-
# view shape — each micro-batch's delta rollup merges into a persisted
# state table, so the metrics table is always current and the raw log
# is never rescanned (analytics/incremental.py holds the monoid
# algebra; this file adds the exactly-once persistence loop).


def read_rollup_state(spark, state_path: str):
    """(epoch, DataFrame | None) — the current committed rollup state.
    The _CURRENT pointer names the live version directory; versions are
    immutable, the pointer swap is the commit point (same sidecar-
    rename discipline as the store's delta log)."""
    import json as _json
    import os

    cur = os.path.join(state_path, "_CURRENT")
    if not os.path.exists(cur):
        return -1, None
    with open(cur) as f:
        meta = _json.load(f)
    return meta["epoch"], spark.read.parquet(os.path.join(state_path, meta["dir"]))


def _prune_rollup_versions(state_path: str, keep: int = 3) -> None:
    import os
    import shutil

    try:
        versions = sorted(
            (int(d[1:]), d)
            for d in os.listdir(state_path)
            if d.startswith("v") and d[1:].isdigit()
        )
        for _, d in versions[:-keep]:
            shutil.rmtree(os.path.join(state_path, d), ignore_errors=True)
    except OSError:
        pass  # pruning is best-effort; the pointer defines correctness


def rollup_sink(
    events_stream: DataFrame,
    state_path: str,
    query_name: str = "sqlstreamstore_rollup_sink",
    trigger: dict | None = None,
):
    """Start a streaming query maintaining the daily rollup state at
    ``state_path`` from a stream of raw events (ts, event_type, props).

    Each epoch: delta = daily_rollup(batch); new state = monoid merge
    of (current state ∪ delta); write the new state as an immutable
    version dir; atomically swap the _CURRENT pointer (tmp + rename).
    Epoch replays after a crash are detected from the committed
    pointer and skipped — merge is NOT idempotent (double-merging a
    delta double-counts), so the epoch guard is correctness, not an
    optimization. A crash between the version write and the pointer
    swap leaves an unreferenced orphan dir; the replayed epoch
    rewrites it.

    Scale: the state table is #groups rows; each epoch shuffles the
    delta's groups, never the raw event history."""
    import json as _json
    import os

    from sqlstreamstore_spark.analytics.incremental import daily_rollup, merge_rollups

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        cur_epoch, prev = read_rollup_state(spark, state_path)
        if cur_epoch >= epoch_id:
            return  # replay of a committed epoch
        if batch_df.isEmpty():
            return
        delta = daily_rollup(batch_df)
        new_state = merge_rollups(prev, delta) if prev is not None else delta
        vdir = f"v{epoch_id}"
        os.makedirs(state_path, exist_ok=True)
        new_state.write.mode("overwrite").parquet(os.path.join(state_path, vdir))
        tmp = os.path.join(state_path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            _json.dump({"epoch": epoch_id, "dir": vdir}, f)
        os.replace(tmp, os.path.join(state_path, "_CURRENT"))
        # bounded history: immutable version dirs accumulate one per
        # epoch — keep the last few (the current one plus grace for
        # lazy readers still scanning a just-superseded version) and
        # drop the rest, the store-compact discipline
        _prune_rollup_versions(state_path, keep=3)

    return (
        events_stream.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", f"{state_path}/checkpoints/{query_name}")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def hll_sink(
    events_stream: DataFrame,
    state_path: str,
    query_name: str = "sqlstreamstore_hll_sink",
    trigger: dict | None = None,
):
    """Streaming distinct-users-per-day monitor with BOUNDED state:
    each epoch folds the batch's (day, user_id) pairs into per-day
    HyperLogLog register files and merges them into the persisted
    state by (day, reg) MAX — state is days × ≤256 rows no matter how
    many users flow through, the property that lets this sink run
    forever where a distinct-set sink grows without bound.

    Same immutable-version + _CURRENT pointer-swap commit as
    :func:`rollup_sink`. Unlike the count rollup, max-merge IS
    idempotent (replaying a committed delta is a no-op algebraically);
    the epoch guard still skips replays so a crash loop costs nothing.
    Read the live estimate with :func:`read_hll_daily_estimates`.
    """
    import json as _json
    import os

    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.text import hll_registers

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        cur_epoch, prev = read_rollup_state(spark, state_path)
        if cur_epoch >= epoch_id:
            return  # replay of a committed epoch
        if batch_df.isEmpty():
            return
        base = batch_df.filter(
            F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        ).select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("user_id").cast("string").alias("u"),
        )
        delta = hll_registers(base, col="u", group_cols=("day",))
        new_state = (
            prev.unionByName(delta).groupBy("day", "reg").agg(
                F.max("rho").alias("rho")
            )
            if prev is not None
            else delta
        )
        vdir = f"v{epoch_id}"
        os.makedirs(state_path, exist_ok=True)
        new_state.write.mode("overwrite").parquet(os.path.join(state_path, vdir))
        tmp = os.path.join(state_path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            _json.dump({"epoch": epoch_id, "dir": vdir}, f)
        os.replace(tmp, os.path.join(state_path, "_CURRENT"))
        _prune_rollup_versions(state_path, keep=3)

    return (
        events_stream.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", f"{state_path}/checkpoints/{query_name}")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_hll_daily_estimates(spark, state_path: str):
    """(epoch, DataFrame | None): per-day corrected HLL distinct-user
    estimates from the committed register state."""
    from sqlstreamstore_spark.analytics.text import hll_estimate

    epoch, regs = read_rollup_state(spark, state_path)
    if regs is None:
        return epoch, None
    return epoch, hll_estimate(regs, group_cols=("day",)).orderBy("day")
