"""Construct-vs-execute breakdown for the e2e flagship gates (r13).

For each gate: time fn(spark, sf_dir) (plan construction — includes the
lazy-checkpoint stage materializations and probe decision jobs) vs the
final .collect(), and report how many Spark jobs each phase submitted.

Usage: SPARK_GRAFT_SF_DIR=... python tools/e2e_construct_probe.py [gate ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlstreamstore_spark.entrypoints import build_queries, get_log
from sqlstreamstore_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    gates = sys.argv[1:] or [
        "pipeline_e2e_incremental",
        "pipeline_e2e_corpus",
        "pipeline_e2e_corpus_trained",
    ]
    spark = get_spark(app_name="e2e_construct_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    get_log(spark, sf_dir).count()
    from sqlstreamstore_spark.analytics.registry import warm_shared_indexes

    t0 = time.time()
    warm_shared_indexes(spark, sf_dir)
    print(f"warm_shared_indexes: {time.time() - t0:.2f}s", flush=True)

    queries = build_queries()
    st = spark.sparkContext.statusTracker()
    from sqlstreamstore_spark.operators.positions import release_pins

    for name in gates:
        fn = queries[name]
        for rep in range(3):
            j0 = len(st.getJobIdsForGroup(None))
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_cons = time.time() - t0
            j1 = len(st.getJobIdsForGroup(None))
            t0 = time.time()
            df.collect()
            t_exec = time.time() - t0
            j2 = len(st.getJobIdsForGroup(None))
            release_pins()
            print(
                f"{name} rep{rep}: construct={t_cons:.2f}s ({j1 - j0} jobs) "
                f"execute={t_exec:.2f}s ({j2 - j1} jobs)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
