"""Optimization-round probe: per-query timing + formatted-plan capture.

For each named declared query (default: the ones in TARGETS), runs it
through the SAME path the bench uses (build_queries()[name](spark, sf))
and records:
  - cold wall-clock (first run, .collect() like bench.py),
  - warm wall-clock (best of N repeat runs),
  - the .explain("formatted") text, written to plans/r12/<name>_<tag>.txt,
  - a one-line plan summary (Exchange count, join nodes, Python-eval nodes).

Usage:
  python tools/opt_probe.py <tag> [query ...]        # tag = before|after|...
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/opt_probe.py before q1 q2

Writes a JSON summary to /tmp/opt_probe_<tag>.json (merging into it, so
successive invocations accumulate).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_summary(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "broadcast_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "nested_loop_joins": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", plan)),
        "python_eval": len(
            re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas)\b", plan)
        ),
        "scans": len(re.findall(r"\bScan (?:parquet|ExistingRDD|json)\b", plan)),
        "wsc_units": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("OPT_PROBE_REPS", "2"))

    from sqlstreamstore_spark.entrypoints import build_queries, get_log
    from sqlstreamstore_spark.operators.positions import release_pins
    from sqlstreamstore_spark.session import get_spark

    spark = get_spark(app_name=f"opt_probe_{tag}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    get_log(spark, sf_dir).count()  # log derive outside any timed row

    queries = build_queries()
    if not names:
        names = list(queries)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("OPT_PROBE_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    summary_path = f"/tmp/opt_probe_{tag}.json"
    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            summary = json.load(f)

    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.collect()
        cold = time.time() - t0
        ws = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            ws.append(time.time() - t0)
        release_pins()
        plan = fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
            fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        ps = plan_summary(plan)
        summary[name] = {"cold": round(cold, 3), "warm": round(min(ws), 3), **ps}
        print(f"{name}: cold={cold:.2f} warm={min(ws):.2f} {ps}", flush=True)
        spark.sparkContext.setJobDescription(None)

    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print("WROTE", summary_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
