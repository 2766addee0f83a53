"""Same-session A/B of the r12 graph-gate edge barrier.

For each graph gate, build the query two ways — the committed shape
(lazy localCheckpoint on the edge list at the call site) and the
no-barrier shape (plain lazy edges, the r11 shape) — and time
.collect() alternating A/B/A/B in ONE session so host drift hits both
variants equally. Prints per-gate medians.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqlstreamstore_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "3"))
    only = sys.argv[1:]

    from sqlstreamstore_spark.analytics.graph import (
        bfs_distances,
        customer_supplier_edges,
        k_core,
        k_truss,
        label_propagation,
        link_prediction_jaccard,
        pagerank,
        supplier_cooccurrence_edges,
        triangle_count,
        triangle_count_doulion,
    )
    from sqlstreamstore_spark.analytics.registry import _t

    spark = get_spark(app_name="ab_graph_barrier")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def co(min_orders=None):
        li = _t(spark, sf, "lineitem")
        return (
            supplier_cooccurrence_edges(li, min_orders=min_orders)
            if min_orders is not None
            else supplier_cooccurrence_edges(li)
        )

    def cs():
        return customer_supplier_edges(_t(spark, sf, "orders"), _t(spark, sf, "lineitem"))

    GATES = {
        "triangles": (lambda e: triangle_count(e), lambda: co()),
        "doulion": (lambda e: triangle_count_doulion(e, p=0.5), lambda: co()),
        "label_prop": (lambda e: label_propagation(e, iters=2), lambda: co(30)),
        "k_core": (lambda e: k_core(e, k=8, rounds=5), lambda: co(30)),
        "k_truss": (lambda e: k_truss(e, k=5, rounds=8), lambda: co(30)),
        "link_pred": (lambda e: link_prediction_jaccard(e), lambda: co(20)),
        "pagerank": (lambda e: pagerank(e, iters=3), lambda: cs()),
        "bfs": (None, lambda: co()),  # special: eager checkpoint + source collect
    }

    for name, (gate, edges_fn) in GATES.items():
        if only and name not in only:
            continue
        ta, tb = [], []
        for _ in range(reps):
            # A: committed shape (barrier)
            t0 = time.time()
            if name == "bfs":
                e = edges_fn().localCheckpoint()
                src = e.agg(F.min("src")).collect()[0][0]
                bfs_distances(e, int(src), max_depth=3).collect()
            else:
                gate(edges_fn().localCheckpoint(eager=False)).collect()
            ta.append(time.time() - t0)
            # B: no barrier (r11 shape)
            t0 = time.time()
            if name == "bfs":
                e = edges_fn()
                src = e.agg(F.min("src")).collect()[0][0]
                bfs_distances(e, int(src), max_depth=3).collect()
            else:
                gate(edges_fn()).collect()
            tb.append(time.time() - t0)
        print(
            f"{name}: barrier={statistics.median(ta):.2f}s "
            f"none={statistics.median(tb):.2f}s  (A reps {['%.2f' % x for x in ta]}, "
            f"B reps {['%.2f' % x for x in tb]})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
