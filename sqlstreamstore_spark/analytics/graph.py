"""Graph analytics over derived relational edges.

Connected components already lives in ``dedup.py`` (its home use-case
is duplicate clustering); this module adds the other iterative graph
classic a data platform is asked for — PageRank — in the same
scale regime: each power-method iteration is one equi-join + one
groupBy (shuffles keyed by node id), lineage truncated per round with
``localCheckpoint`` so the plan stays O(1) across iterations.

The demo edge set is derived from the TPC-H-ish fixtures: customer →
supplier, one edge per (order, lineitem) pair connecting the order's
customer to the line's supplier. At 100 TB both the edge derivation
(fact-fact equi-join) and each iteration partition on the join key; no
step is driver-bound.

Oracle: fixed iteration count + deterministic damping means the whole
computation unrolls into plain SQL CTEs (one per iteration), so DuckDB
recomputes it independently; scores are rounded on BOTH engines (the
``stats_corr_regr`` precedent) because partial-aggregation float order
differs legitimately between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def customer_supplier_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Directed edges customer → supplier: one per (order, lineitem).
    Node ids are disjoint ranges: customers keep c_custkey, suppliers
    get s_suppkey + 1_000_000 (fixture keys are far below that)."""
    return (
        orders.select(F.col("o_orderkey"), F.col("o_custkey"))
        .join(lineitem.select("l_orderkey", "l_suppkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + 1_000_000).alias("dst"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    round_digits: int = 6,
) -> DataFrame:
    """Power-method PageRank, fixed ``iters`` iterations, uniform init
    1/N, dangling nodes implicitly contribute nothing (their mass
    leaks — matching the plain unrolled-SQL formulation the oracle
    uses). Output: (node, pr) rounded to ``round_digits``.

    Each iteration: rank/out_degree per edge → groupBy dst → damped
    sum. Nodes with no in-edges fall back to the teleport term.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # edge weight = 1/out_degree(src), fixed across iterations
    weighted = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint()
    )
    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contrib = (
            weighted.join(ranks, weighted.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("pr", round_digits).alias("pr")).orderBy("node")


def pagerank_oracle_sql(iters: int = 3, damping: float = 0.85, round_digits: int = 6) -> str:
    """The unrolled-CTE DuckDB twin of ``pagerank`` over
    ``customer_supplier_edges`` on the fixture tables."""
    head = f"""WITH edges AS (
  SELECT CAST(o.o_custkey AS BIGINT) AS src,
         CAST(l.l_suppkey AS BIGINT) + 1000000 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
weighted AS (
  SELECT src, dst, 1.0 / CAST(count(*) OVER (PARTITION BY src) AS DOUBLE) AS w
  FROM edges
), r0 AS (
  SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes
)"""
    body = ""
    prev = "r0"
    for i in range(1, iters + 1):
        body += f""", c{i} AS (
  SELECT w.dst, sum(r.pr * w.w) AS mass
  FROM weighted w JOIN {prev} r ON w.src = r.node GROUP BY w.dst
), r{i} AS (
  SELECT n.node,
         (1.0 - {damping}) / (SELECT n FROM nn)
         + {damping} * coalesce(c.mass, 0.0) AS pr
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst
)"""
        prev = f"r{i}"
    return (
        head + body
        + f"\nSELECT node, round(pr, {round_digits}) AS pr FROM {prev} ORDER BY node"
    )


def supplier_cooccurrence_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected supplier–supplier edges: two suppliers co-occur when
    they ship lines of the same order. Normalized to src < dst and
    deduplicated — per-order pair explosion is bounded by order width
    (≈7 lines), so the derivation is an equi-self-join on l_orderkey,
    never a global cross product."""
    a = lineitem.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("sa"))
    b = lineitem.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("sb"))
    return (
        a.join(b, "k")
        .filter(F.col("sa") < F.col("sb"))
        .select(F.col("sa").cast("long").alias("src"), F.col("sb").cast("long").alias("dst"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count over an undirected edge list
    (src < dst normalized). The classic ordered two-join formulation:
    (a,b), (b,c), (a,c) with a < b < c — each triangle counted exactly
    once, every join an equi-join on node ids (shuffle-keyed; no
    nested-loop anywhere). Returns one row: (n_triangles,).

    At scale the standard refinement is degree-ordering instead of
    id-ordering (bounds the join fan-out on hubs by √m); id-ordering
    keeps the oracle SQL identical on both engines and is exact either
    way.
    """
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a2"), F.col("dst").alias("c2"))
    return (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


TRIANGLE_ORACLE_SQL = """WITH edges AS (
  SELECT DISTINCT CAST(a.l_suppkey AS BIGINT) AS src,
                  CAST(b.l_suppkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.dst = e2.src
JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst"""
