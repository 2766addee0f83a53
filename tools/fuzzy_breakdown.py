"""Sub-step timing of minhash_dedup_pairs on the e2e exact frame."""
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
    spark = get_spark(app_name="fuzzy_breakdown")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    get_log(spark, sf_dir).count()

    from sqlstreamstore_spark.analytics import dedup as D
    from sqlstreamstore_spark.analytics.registry import load_table

    documents = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    exact = (
        documents.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=True)
    )

    def t(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {name}: {time.time()-t0:.2f}", flush=True)

    for rep in range(2):
        print(f"rep{rep}", flush=True)
        sh = exact.select(
            "doc_id", F.explode(D._shingles(F.col("text"), 3)).alias("s")
        )
        t("explode_shingles", sh)
        t("signatures", D.minhash_signatures(exact, k=32, n=3))
        t("banded_rows", D._banded_rows(exact, k=32, bands=8, n=3, family="md5"))
        t("candidates", D.minhash_lsh_candidates(exact, k=32, bands=8, n=3))
        t("dedup_pairs_full", D.minhash_dedup_pairs(exact, threshold=0.2))
        n = exact.count()
        print("  docs:", n, "shingle_occurrences:", sh.count(), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
