"""Spill/memory-headroom probe (r7 verdict #8): the last untested
100 TB failure mode is executor-memory pressure — every other probe
fits the sandbox's 128 GiB comfortably. This one runs a deliberately
memory-tight configuration and demonstrates GRACEFUL SPILL: the
sf10-synthetic MinHash candidate pass (500k docs, the shingle-explode /
signature-agg / banded-join shape) inside a CHILD JVM capped at 2 GiB
heap with spark.sql.shuffle.partitions floored to 8 on local[8].

Success = same row count as the full-memory sf10 run, no OOM, and
nonzero memoryBytesSpilled/diskBytesSpilled pulled from the JVM
AppStatusStore — i.e. Spark's sort/aggregate operators degraded to
disk instead of dying, which is exactly the behavior a 1000-executor
cluster needs when a skewed partition outgrows its slice of executor
memory.

    python tools/spill_probe.py          # runs child, merges row into
                                         # SCALE_PROBE.json [sf10-synthetic]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.driver.memory", "2g")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("spill-probe-child")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from tools.scale_probe import replicated
from sqlstreamstore_spark.analytics import dedup
from sqlstreamstore_spark.sources.tables import load_table

docs = replicated(
    load_table(spark, "/root/testdata/sf0.1", "documents"), 100,
    {"doc_id": 1_000_000},
).localCheckpoint()
n_docs = docs.count()
t0 = time.time()
rows = dedup.minhash_lsh_candidates(docs).count()
dt = round(time.time() - t0, 2)

# spill totals from the JVM AppStatusStore (all completed stages).
# Spark 4's stageList takes 5 args; the scala default-arg accessors
# supply the tail (details=False, withSummaries=False, quantiles, taskStatus)
mem = disk = 0
try:
    store = spark.sparkContext._jsc.sc().statusStore()
    sl = store.stageList(
        None,
        getattr(store, "stageList$default$2")(),
        getattr(store, "stageList$default$3")(),
        getattr(store, "stageList$default$4")(),
        getattr(store, "stageList$default$5")(),
    )
    for i in range(sl.size()):
        s = sl.apply(i)
        mem += s.memoryBytesSpilled()
        disk += s.diskBytesSpilled()
except Exception as e:  # metrics API drift: report, don't die
    mem = disk = -1
    print("spill-metrics-error:" + repr(e), file=sys.stderr)

print("RESULT " + json.dumps({
    "rows": rows, "n_docs": n_docs, "s": dt,
    "memory_spilled_bytes": int(mem), "disk_spilled_bytes": int(disk),
    "heap": "2g", "shuffle_partitions": 8, "cores": 8,
}))
"""


def main() -> int:
    env = dict(os.environ)
    # a tight heap needs the child to own its JVM: no inherited opts
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    r = subprocess.run(
        [sys.executable, "-c", CHILD], capture_output=True, text=True,
        timeout=3600, env=env,
    )
    line = next(
        (ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")), None
    )
    if line is None:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:], file=sys.stderr)
        return 1
    res = {"spill_headroom_minhash": json.loads(line[len("RESULT "):])}
    print(json.dumps(res), flush=True)
    from tools.scale_probe import _merge_scale

    _merge_scale(res, "sf10-synthetic")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
