"""Step-by-step job/time attribution for e2e_incremental_pipeline's
construction phase (r13). Replicates the chain inline; prints per-step
wall + job-count deltas."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from sqlstreamstore_spark.entrypoints import get_log
from sqlstreamstore_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="e2e_incr_jobs")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    get_log(spark, sf_dir).count()
    from sqlstreamstore_spark.analytics.registry import (
        _digest_index_for,
        _mh_index_for,
        _sem_index_for,
        _t,
        warm_shared_indexes,
    )

    warm_shared_indexes(spark, sf_dir)
    from sqlstreamstore_spark.analytics import pipeline as P
    from sqlstreamstore_spark.analytics.dedup import (
        minhash_dedup_incremental,
        probe_digest_index,
    )
    from sqlstreamstore_spark.analytics.sampling import _hash_bucket, selected_by_budget
    from sqlstreamstore_spark.analytics.similarity import near_dup_against_ivf_index
    from sqlstreamstore_spark.analytics.text import _tokens

    st = spark.sparkContext.statusTracker()
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    mh_path = _mh_index_for(spark, sf_dir)
    ivf_path, cents = _sem_index_for(spark, sf_dir)
    dig_path = _digest_index_for(spark, sf_dir)

    for rep in range(2):
        incoming = docs.filter(F.col("doc_id") % 10 == 0)
        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        inc_emb = emb.filter(F.col("vec_id") % 10 == 0)
        marks = []
        t_all = time.time()

        def mark(name):
            marks.append((name, time.time(), len(st.getJobIdsForGroup())))

        mark("start")
        toks = _tokens()
        n_toks = F.size(toks)
        quality = incoming.filter(
            (n_toks >= 5)
            & (F.size(F.array_distinct(toks)).cast("double") / n_toks.cast("double") >= 0.3)
        )
        w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
        exact = (
            quality.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint(eager=False)
        )
        mark("exact_barrier")
        exact_new = probe_digest_index(spark, dig_path, exact).localCheckpoint(
            eager=False
        )
        mark("exact_new_barrier(incl prefix collect)")
        fuzzy_losers = (
            minhash_dedup_incremental(
                spark, mh_path, exact_new, corpus, threshold=0.2
            )
            .select(F.col("new_doc").alias("doc_id"))
            .distinct()
        )
        mark("mh_incremental_build(bands ckpt + bb collect)")
        fuzzy = exact_new.join(fuzzy_losers, "doc_id", "left_anti").localCheckpoint(
            eager=False
        )
        mark("fuzzy_barrier")
        emb_delta = inc_emb.join(
            fuzzy.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
        sem_losers = (
            near_dup_against_ivf_index(
                spark, ivf_path, emb_delta, threshold=0.35, centroids=cents
            )
            .select(F.col("new_vec").alias("doc_id"))
            .distinct()
        )
        mark("ivf_probe_build(count job)")
        semantic = fuzzy.join(sem_losers, "doc_id", "left_anti").localCheckpoint(
            eager=False
        )
        mark("semantic_barrier")
        sampled = selected_by_budget(semantic, {}, 800).localCheckpoint(eager=False)
        mark("sampled_barrier")
        packed = P.pack_sequences(sampled, 512)
        shards = packed.select(
            (_hash_bucket(F.col("seq_id")) % 16).alias("shard_id")
        ).distinct()

        def stage_count(no, name, df):
            return df.agg(F.count("*").cast("long").alias("n_rows")).select(
                F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "n_rows"
            )

        out = stage_count(0, "delta_raw", incoming)
        for no, name, df in (
            (1, "quality", quality), (2, "exact_dedup", exact),
            (3, "exact_new", exact_new), (4, "fuzzy_new", fuzzy),
            (5, "semantic_new", semantic), (6, "budget_sample", sampled),
            (7, "packed", packed.select("seq_id").distinct()),
            (8, "sharded", shards),
        ):
            out = out.unionByName(stage_count(no, name, df))
        out = out.orderBy("stage_no")
        mark("counts_plan_built")
        rows = out.collect()
        mark("collect")
        prev_t, prev_j = marks[0][1], marks[0][2]
        print(f"--- rep{rep} total={time.time()-t_all:.2f}s")
        for name, t, j in marks[1:]:
            print(f"  {name:45s} {t-prev_t:6.2f}s {j-prev_j:3d} jobs")
            prev_t, prev_j = t, j
        from sqlstreamstore_spark.operators.positions import release_pins
        release_pins()
    return 0


if __name__ == "__main__":
    sys.exit(main())
