"""Pins-vs-drift A/B for the two r10 'weak' bench rows (VERDICT r10 #2).

Runs pipeline_e2e_corpus and sim_semantic_components_incremental in ONE
process/quiet window, N reps each under two policies:
  released — release_pins() after every rep (the r10 bench discipline,
             each rep fully self-contained)
  held     — pins left in place across reps (the pre-r10 behavior,
             later reps may ride earlier reps' cached layouts)
The released-vs-held delta is the measured self-containment cost; the
rep-to-rep spread within a policy is the host-drift band. Prints one
JSON line for BASELINE §3q.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
NAMES = ["pipeline_e2e_corpus", "sim_semantic_components_incremental"]


def main() -> int:
    from sqlstreamstore_spark.entrypoints import build_queries
    from sqlstreamstore_spark.operators.positions import release_pins
    from sqlstreamstore_spark.session import get_spark

    spark = get_spark()
    queries = build_queries()
    out: dict[str, dict] = {}
    for name in NAMES:
        fn = queries[name]
        fn(spark, SF).collect()  # one discarded warm-up (codegen/JIT)
        release_pins()
        res: dict[str, list[float]] = {}
        for policy in ("released", "held"):
            times = []
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, SF).collect()
                times.append(round(time.time() - t0, 3))
                if policy == "released":
                    release_pins()
            if policy == "held":
                release_pins()  # clean up after the held block
            res[policy] = times
        out[name] = {
            **res,
            "released_best": min(res["released"]),
            "held_best": min(res["held"]),
            "self_containment_cost_s": round(
                min(res["released"]) - min(res["held"]), 3
            ),
        }
    print(json.dumps({"sf": SF, "reps": REPS, "ab": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
