"""Stage-level timing of e2e_corpus_pipeline: time each barrier
materialization separately to find where the chain's seconds go.

Usage: SPARK_GRAFT_SF_DIR=... python tools/e2e_stage_timing.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window

from sqlstreamstore_spark.entrypoints import get_log
from sqlstreamstore_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="e2e_stage_timing")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    get_log(spark, sf_dir).count()

    from sqlstreamstore_spark.analytics.dedup import minhash_dedup_pairs
    from sqlstreamstore_spark.analytics.sampling import _hash_bucket, selected_by_budget
    from sqlstreamstore_spark.analytics.similarity import cosine_near_dup_pairs_lsh
    from sqlstreamstore_spark.analytics import pipeline as P
    from sqlstreamstore_spark.analytics.registry import load_table

    documents = load_table(spark, sf_dir, "documents")
    embeddings = load_table(spark, sf_dir, "embeddings")

    for rep in range(2):
        t_all = time.time()
        toks = P._tokens()
        n_toks = F.size(toks)
        quality = documents.filter(
            (n_toks >= 5)
            & (
                F.size(F.array_distinct(toks)).cast("double") / n_toks.cast("double")
                >= 0.3
            )
        )
        w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
        ts = []

        def bar(name, df):
            t0 = time.time()
            out = df.localCheckpoint(eager=True)
            ts.append((name, time.time() - t0))
            return out

        exact = bar(
            "exact",
            quality.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn"),
        )
        fuzzy_losers = (
            minhash_dedup_pairs(exact, threshold=0.2)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        fuzzy = bar("fuzzy", exact.join(fuzzy_losers, "doc_id", "left_anti"))
        emb = embeddings.join(
            fuzzy.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
        sem_losers = (
            cosine_near_dup_pairs_lsh(emb, 0.35, bits=6, sort=False)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        semantic = bar("semantic", fuzzy.join(sem_losers, "doc_id", "left_anti"))
        sampled = bar("sampled", selected_by_budget(semantic, {}, 800))
        packed = P.pack_sequences(sampled, 512)
        shards = packed.select(
            (_hash_bucket(F.col("seq_id")) % 16).alias("shard_id")
        ).distinct()

        def stage_count(no, name, df):
            return df.agg(F.count("*").cast("long").alias("n_rows")).select(
                F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "n_rows"
            )

        out = stage_count(0, "raw", documents)
        for no, name, df in (
            (1, "quality", quality),
            (2, "exact_dedup", exact),
            (3, "fuzzy_dedup", fuzzy),
            (4, "semantic_dedup", semantic),
            (5, "budget_sample", sampled),
            (6, "packed", packed.select("seq_id").distinct()),
            (7, "sharded", shards),
        ):
            out = out.unionByName(stage_count(no, name, df))
        t0 = time.time()
        rows = out.orderBy("stage_no").collect()
        t_counts = time.time() - t0
        total = time.time() - t_all
        print(f"rep{rep}: total={total:.2f} counts={t_counts:.2f} "
              + " ".join(f"{n}={t:.2f}" for n, t in ts), flush=True)
        print("   rows:", [(r.stage, r.n_rows) for r in rows], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
