"""End-to-end LLM-training-data pipeline demo over the extended surface.

    python examples/media_pipeline.py

Composes the operators a 100 TB curation run chains together, on the
driver fixtures (sf0.001 by default):

TEXT:   clean corpus → BPE fertility stats → compression-ratio cuts →
        chunk → pack into fixed token budgets
MEDIA:  synthetic real-media table (PNG/JPEG/GIF/BMP/WAV/MJPEG-AVI) →
        decode features → perceptual-hash image dedup → video near-dup →
        audio DSP features → sampled-frame extraction
VECTOR: embeddings → LSH near-dup keepers (auto-tuned bits) →
        IVF-PQ deployed index → pruned ANN query
OPS:    MP4 container probe → drift check between sources →
        Z-ordered layout + pruned scan → incremental rollup tick

Every stage is the same operator the correctness gate hash-checks; this
file only wires them together.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from sqlstreamstore_spark.analytics import bpe, multimodal, pipeline, similarity, text
    from sqlstreamstore_spark.session import get_spark
    from sqlstreamstore_spark.sources.tables import load_table

    spark = get_spark(app_name="media-pipeline-demo")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    print("== TEXT ==")
    clean = pipeline.clean_corpus(docs)
    print("clean corpus rows:", clean.count())
    fert = bpe.bpe_corpus_stats(docs, n_merges=60, sample_docs=64)
    fert.select("doc_id", "n_tokens", "tokens_per_word").show(3)
    comp = text.compression_signals(docs)
    print("most compressible (most templated) docs:")
    comp.orderBy("compression_ratio").select("doc_id", "compression_ratio").show(3)

    print("== MEDIA ==")
    media = multimodal.make_fake_media_df(spark, 60)
    multimodal.decode_features(media).groupBy("decoded_kind").count().show()
    dups = multimodal.image_near_dup_pairs(media, max_hamming=16)
    print("image near-dup pairs:", dups.count())
    vdups = multimodal.video_near_dup_pairs(media)
    print("video near-dup pairs:", vdups.count())
    multimodal.audio_features(media).select(
        "media_id", "duration_ms", "dominant_freq_hz"
    ).show(3)
    frames = multimodal.extract_video_frames(media, every_ms=500)
    print("extracted (real-decoded) frames:", frames.count())

    print("== VECTORS ==")
    keepers = similarity.embedding_dedup_keepers(emb)
    n_dropped = keepers.filter("vec_id != keeper").count()
    print("semantic near-dup vectors dropped:", n_dropped)
    qvec = [float(x) for x in emb.limit(1).collect()[0].embedding]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ivfpq")
        cents, cbs = similarity.build_ivfpq_index(emb, path, n_clusters=8, iters=1)
        top = similarity.cosine_topk_ivfpq(spark, path, qvec, cents, cbs, k=5)
        print("IVF-PQ pruned ANN top-5 (partition-pruned scan, codes-only ADC):")
        top.show()

        # incremental index maintenance: new vectors land in the
        # existing inverted lists — O(delta) work, no rebuild
        ivf = os.path.join(d, "ivf")
        base = emb.filter("vec_id % 5 != 0")
        delta = emb.filter("vec_id % 5 = 0")
        cents2 = similarity.build_ivf_index(base, ivf, n_clusters=8)
        similarity.upsert_ivf_index(delta, ivf, cents2)
        n_ix = spark.read.parquet(ivf).count()
        print(f"IVF upsert: {base.count()} built + {delta.count()} upserted "
              f"= {n_ix} indexed (no list rewrites)")

    print("== OPS ==")
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import drift, incremental, multimodal as mm
    from sqlstreamstore_spark.sources import zorder

    # MP4 probe: the ffprobe pass, no pixel decode
    mm.mp4_container_metadata(media).select(
        "media_id", "codec", "duration_ms", "n_frames").show(3)

    # distribution drift between two sources of the corpus
    srcs = [r[0] for r in docs.select("source").distinct().limit(2).collect()]
    if len(srcs) == 2:
        tok = docs.withColumn("n_tokens", F.size(F.split("text", " ")))
        d = drift.ks_drift(
            tok.filter(F.col("source") == srcs[0]),
            tok.filter(F.col("source") == srcs[1]), "n_tokens").collect()[0]
        print(f"KS drift {srcs[0]} vs {srcs[1]} on doc length: D={d.ks_d:.4f}")

    # Z-ordered layout: write once, skip buckets on either column
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long").alias("cents"))
    with tempfile.TemporaryDirectory() as d:
        zorder.write_zordered(orders, os.path.join(d, "z"), "o_custkey", "cents",
                              n_buckets=16)
        _, read, total = zorder.read_pruned(
            spark, os.path.join(d, "z"), a_range=(100, 300))
        print(f"z-order pruned scan: read {read}/{total} buckets")

    # token-budget mixture: derive per-source rates from measured totals
    from sqlstreamstore_spark.analytics import sampling

    mix = sampling.budget_mixture_sample(
        docs, {"src0": 200}, default_budget=500).limit(3)
    mix.select("src", "total_tokens", "budget", "n_selected",
               "tokens_selected").show(3)

    # incremental rollup: one merge tick == full recompute
    ev = load_table(spark, SF_DIR, "events")
    prev = incremental.daily_rollup(ev.filter(F.col("event_id") % 10 < 8))
    delta = incremental.daily_rollup(ev.filter(F.col("event_id") % 10 >= 8))
    merged = incremental.present_rollup(incremental.merge_rollups(prev, delta))
    print("incremental rollup groups:", merged.count())


if __name__ == "__main__":
    main()
