"""Graph analytics (analytics/graph.py): PageRank invariants on a
hand-checkable graph + determinism."""

from __future__ import annotations

from sqlstreamstore_spark.analytics.graph import customer_supplier_edges, pagerank
from sqlstreamstore_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_hand_graph(spark):
    """1→2, 1→3, 2→3: node 3 collects the most mass, node 1 only the
    teleport term; exact values match the hand-unrolled power method."""
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src long, dst long")
    got = {r.node: r.pr for r in pagerank(edges, iters=2, round_digits=9).collect()}
    n, d = 3, 0.85
    t = (1 - d) / n
    # iteration 1 from uniform 1/3
    pr1 = {1: t, 2: t + d * (1 / 3 / 2), 3: t + d * (1 / 3 / 2 + 1 / 3)}
    # iteration 2
    pr2 = {
        1: t,
        2: t + d * (pr1[1] / 2),
        3: t + d * (pr1[1] / 2 + pr1[2]),
    }
    for k in (1, 2, 3):
        assert abs(got[k] - pr2[k]) < 1e-9, (k, got[k], pr2[k])
    assert got[3] > got[2] > got[1]


def test_pagerank_fixture_edges_properties(spark):
    edges = customer_supplier_edges(
        load_table(spark, SF_DIR, "orders"), load_table(spark, SF_DIR, "lineitem")
    )
    pr = pagerank(edges, iters=3)
    rows = pr.collect()
    n = len(rows)
    assert n == edges.select("src").union(edges.select("dst")).distinct().count()
    t = 0.15 / n
    # every score at least the teleport term; total mass <= 1 (dangling leak)
    assert all(r.pr >= t - 1e-12 for r in rows)
    assert sum(r.pr for r in rows) <= 1.0 + 1e-6
    # deterministic across runs
    again = {r.node: r.pr for r in pagerank(edges, iters=3).collect()}
    assert {r.node: r.pr for r in rows} == again


def test_triangle_count_hand_graph(spark):
    """K4 minus one edge has exactly 2 triangles; adding it back gives 4."""
    from sqlstreamstore_spark.analytics.graph import triangle_count

    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]  # K4 minus (3,4)
    edges = spark.createDataFrame(e, "src long, dst long")
    assert triangle_count(edges).collect()[0].n_triangles == 2
    edges_full = spark.createDataFrame(e + [(3, 4)], "src long, dst long")
    assert triangle_count(edges_full).collect()[0].n_triangles == 4


def test_supplier_cooccurrence_and_triangles(spark):
    from sqlstreamstore_spark.analytics.graph import (
        supplier_cooccurrence_edges,
        triangle_count,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    edges = spark_edges = supplier_cooccurrence_edges(li)
    rows = edges.collect()
    assert rows and all(r.src < r.dst for r in rows)
    assert len(rows) == len(set((r.src, r.dst) for r in rows))  # distinct
    n = triangle_count(spark_edges).collect()[0].n_triangles
    assert n >= 0


def test_bfs_distances_hand_graph(spark):
    """Path graph 1-2-3-4-5 plus chord (1,4): distances from 1 are
    {1:0, 2:1, 4:1, 3:2 (via either), 5:2 (via the chord)}."""
    from sqlstreamstore_spark.analytics.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src long, dst long"
    )
    got = {r.node: r.dist for r in bfs_distances(edges, 1, max_depth=3).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # depth cap honored: from node 1 with max_depth=1 only direct nbrs
    got1 = {r.node: r.dist for r in bfs_distances(edges, 1, max_depth=1).collect()}
    assert got1 == {1: 0, 2: 1, 4: 1}
