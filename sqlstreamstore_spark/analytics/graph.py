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
    checkpoint: bool = True,
) -> DataFrame:
    """Power-method PageRank, fixed ``iters`` iterations, uniform init
    1/N, dangling nodes implicitly contribute nothing (their mass
    leaks — matching the plain unrolled-SQL formulation the oracle
    uses). Output: (node, pr) rounded to ``round_digits``.

    Each iteration: rank/out_degree per edge → groupBy dst → damped
    sum. Nodes with no in-edges fall back to the teleport term.
    """
    def ckpt(df):
        # checkpoint=False exposes the full iteration plan (plan gates);
        # production keeps lineage O(1) per round. Lazy (r12): each
        # per-iteration frame has a single consumer, so materialization
        # folds into the consuming job instead of one extra job per round
        return df.localCheckpoint(eager=False) if checkpoint else df

    nodes = ckpt(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # edge weight = 1/out_degree(src), fixed across iterations
    weighted = ckpt(
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
    )
    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contrib = (
            weighted.join(ranks, weighted.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w")).alias("mass"))
        )
        ranks = ckpt(
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))).alias("pr"),
            )
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


def supplier_pair_counts(lineitem: DataFrame) -> DataFrame:
    """The UNFILTERED supplier co-occurrence pair counts
    (src < dst, __n = co-shipped line pairs) — the shared upstream of
    every ``supplier_cooccurrence_edges`` threshold. r12: the basket
    self-join + groupBy is the dominant cost of all seven graph gates,
    and the three thresholds they use (5/20/30) are plain filters over
    this one frame, so the registry materializes it once per sf as an
    index artifact and each gate filters (integer counts → the filtered
    edge sets are identical to the inline derivation by construction)."""
    a = lineitem.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("sa"))
    b = lineitem.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("sb"))
    return (
        a.join(b, "k")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy(
            F.col("sa").cast("long").alias("src"), F.col("sb").cast("long").alias("dst")
        )
        .agg(F.count("*").alias("__n"))
    )


def supplier_cooccurrence_edges(lineitem: DataFrame, min_orders: int = 5) -> DataFrame:
    """Undirected supplier–supplier edges: two suppliers are connected
    when they ship lines of the SAME order in at least ``min_orders``
    distinct orders. The threshold is the standard co-occurrence-graph
    sparsifier — without it the graph saturates toward a clique as the
    corpus grows (at sf0.1 the unthresholded graph is 91% complete with
    124M triangles; ≥5 keeps ~10% of pairs). Normalized to src < dst;
    per-order pair explosion is bounded by order width (≈7 lines), so
    the derivation is an equi-self-join on l_orderkey + one groupBy —
    never a global cross product."""
    return (
        supplier_pair_counts(lineitem)
        .filter(F.col("__n") >= min_orders)
        .drop("__n")
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count over an undirected edge list
    (src < dst normalized), via the ordered two-join formulation with
    DEGREE ordering: every edge is re-oriented from its lower-(degree,
    id) endpoint to the higher one, then triangles are paths a→b→c
    closed by a→c. The total count is orientation-invariant — any
    strict total order counts each triangle exactly once — so the plain
    id-ordered SQL oracle matches; but degree ordering bounds the
    wedge join's fan-out per node by O(√m) instead of deg(hub)².
    Together with the co-occurrence threshold in the edge derivation
    (which keeps the graph sparse in the first place) this took the
    sf0.1 count from 42.6 s / 124M triangles on the saturated graph to
    6.6 s / 165k. Every step is an equi-join keyed on node ids; no
    nested loop. Returns one row: (n_triangles,)."""
    deg = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("ds"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("dd"))
    keep = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = (
        edges.join(d1, "src")
        .join(d2, "dst")
        .select(
            F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("v"),
        )
        .localCheckpoint()  # both wedge sides + the closing probe read it
    )
    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = oriented.select(F.col("u").alias("a2"), F.col("v").alias("c2"))
    return (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


TRIANGLE_ORACLE_SQL = """WITH edges AS (
  SELECT CAST(a.l_suppkey AS BIGINT) AS src,
         CAST(b.l_suppkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= 5
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.dst = e2.src
JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst"""


def label_propagation(
    edges: DataFrame, iters: int = 2, checkpoint: bool = True
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan,
    Albert & Kumara 2007) made DETERMINISTIC: labels init to the node
    id; each round every node adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label (the paper breaks
    ties randomly — fine for exploration, useless for an oracle).
    Fixed ``iters`` rounds, unrolled — the pagerank/BFS oracle
    pattern; every vertex in the edge list has >= 1 neighbor, so there
    is no keep-own-label branch to special-case.

    Output: (node, label) — nodes sharing a label are one community.

    Scale shape per round: one equi-join of the symmetrized edge list
    against the |V|-row label frame (shuffle keyed by node id, ∝ |E|),
    one (node, label) partial-agg count, one per-node window top-1.
    Synchronous updates on BIPARTITE graphs can oscillate (known LPA
    property) — use co-occurrence projections, not raw bipartite
    edges, as this module's fixtures do."""
    from pyspark.sql import Window

    sym = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )

    def ckpt(df):
        return df.localCheckpoint(eager=False) if checkpoint else df

    w = Window.partitionBy("u").orderBy(F.col("c").desc(), F.col("label").asc())
    for _ in range(iters):
        votes = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = ckpt(
            votes.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select(F.col("u").alias("node"), "label")
        )
    return labels.orderBy("node")


def label_propagation_oracle_sql(iters: int = 2, min_orders: int = 5) -> str:
    """Unrolled-iteration DuckDB twin over the supplier co-occurrence
    edges (CTEs MATERIALIZED — plain CTEs inline and re-derive the
    edge self-join exponentially)."""
    parts = [
        f"""WITH edges AS MATERIALIZED (
  SELECT CAST(a.l_suppkey AS BIGINT) AS src,
         CAST(b.l_suppkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= {min_orders}
),
sym AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM edges
  UNION ALL SELECT dst AS u, src AS v FROM edges),
l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM sym)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""v{i} AS (
  SELECT s.u, l.label, count(*) AS c
  FROM sym s JOIN l{i - 1} l ON l.node = s.v
  GROUP BY s.u, l.label),
l{i} AS MATERIALIZED (
  SELECT u AS node, label FROM (
    SELECT u, label,
           row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rk
    FROM v{i}) t
  WHERE rk = 1)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, label FROM l{iters} ORDER BY node"
    )


def k_core(
    edges: DataFrame, k: int = 8, rounds: int = 5, checkpoint: bool = True
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    Batagelj–Zaveršnik peel made synchronous): each round drops every
    node whose CURRENT degree is below ``k``, then induces the
    subgraph on the survivors — the dense-subgraph extractor a
    curation pipeline runs over a near-duplicate graph to find
    template/boilerplate clusters, and the standard preprocessing cut
    for community detection.

    Fixed ``rounds`` synchronous rounds, unrolled — the
    pagerank/BFS/label-propagation oracle pattern; callers pick
    ``rounds`` ≥ the peel depth (cascade depth is the graph's
    degeneracy ordering length, typically a handful of rounds — 4 at
    this module's sf0.01 fixture) and the fixture fixpoint is pinned
    by pytest (one extra round changes nothing). Output:
    (node, degree) over the final induced subgraph — at fixpoint this
    is exactly the k-core with in-core degrees.

    Scale shape per round: one (node) partial-agg count over the
    symmetrized edge list and two semi-joins of the edge list against
    the surviving-node frame (both keyed by node id, shuffle ∝ |E|,
    monotonically shrinking). Rounds are bounded by the caller, and
    each round's output is localCheckpointed so lineage stays flat —
    no all-pairs term anywhere."""
    sym = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))

    def ckpt(df):
        return df.localCheckpoint(eager=False) if checkpoint else df

    cur = sym
    for _ in range(rounds):
        keep = (
            cur.groupBy("u")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select("u")
        )
        cur = ckpt(
            cur.join(keep, "u")
            .join(keep.withColumnRenamed("u", "v"), "v")
            .select("u", "v")
        )
    return (
        cur.groupBy("u")
        .agg(F.count("*").alias("degree"))
        .select(F.col("u").alias("node"), "degree")
        .orderBy("node")
    )


def k_core_oracle_sql(k: int = 8, rounds: int = 5, min_orders: int = 30) -> str:
    """Unrolled-iteration DuckDB twin of :func:`k_core` over the
    supplier co-occurrence edges (CTEs MATERIALIZED — the
    label-propagation precedent: plain CTEs inline and re-derive the
    edge self-join exponentially). Integer-exact: degrees are counts,
    so the hash compare carries zero float risk."""
    parts = [
        f"""WITH edges AS MATERIALIZED (
  SELECT CAST(a.l_suppkey AS BIGINT) AS src,
         CAST(b.l_suppkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= {min_orders}
),
g0 AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM edges
  UNION ALL SELECT dst AS u, src AS v FROM edges)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""keep{i} AS MATERIALIZED (
  SELECT u FROM g{i - 1} GROUP BY u HAVING count(*) >= {k}),
g{i} AS MATERIALIZED (
  SELECT g.u, g.v FROM g{i - 1} g
  JOIN keep{i} a ON g.u = a.u JOIN keep{i} b ON g.v = b.u)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT u AS node, count(*) AS degree FROM g{rounds}"
        + " GROUP BY u ORDER BY node"
    )


def k_truss(
    edges: DataFrame, k: int = 5, rounds: int = 8, checkpoint: bool = True
) -> DataFrame:
    """k-truss decomposition (Cohen 2008): iteratively remove every
    edge supported by fewer than ``k−2`` triangles, then recompute
    support on the survivors — the EDGE-level dense-subgraph sibling
    of :func:`k_core` (a k-truss is cohesive through shared triangles,
    not mere degree, so it rejects hub-and-spoke noise k-core keeps).

    Fixed ``rounds`` synchronous rounds, unrolled (the k-core/LPA
    oracle pattern); callers pick ``rounds`` ≥ the peel depth (8 at
    this module's sf0.01 fixture, where the ≥30-order graph cascades
    301 → 26 edges) and pytest pins the fixture fixpoint. Edges in no
    triangle have support 0 and drop on the first round (they vanish
    from the inner support join — the same semantics both engines
    share).

    Output: (src, dst, support) over the final graph, edge order.

    Scale shape per round: support is the ordered wedge join
    (edge ⋈ adjacency ⋈ adjacency — the triangle_count shape, bounded
    by wedge mass, never all-pairs) plus one (src, dst) partial-agg
    count; the edge set shrinks monotonically and each round is
    localCheckpointed so lineage stays flat."""

    def ckpt(df):
        return df.localCheckpoint(eager=False) if checkpoint else df

    def support(cur: DataFrame) -> DataFrame:
        sym = cur.select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ).unionByName(cur.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        a = sym.select(F.col("u").alias("src"), F.col("v").alias("w"))
        b = sym.select(F.col("u").alias("dst"), F.col("v").alias("w"))
        return (
            cur.join(a, "src")
            .join(b, ["dst", "w"])
            .groupBy("src", "dst")
            .agg(F.count("*").alias("support"))
        )

    cur = edges.select("src", "dst")
    for _ in range(rounds):
        cur = ckpt(
            support(cur)
            .filter(F.col("support") >= k - 2)
            .select("src", "dst")
        )
    return support(cur).select("src", "dst", "support").orderBy("src", "dst")


def k_truss_oracle_sql(k: int = 5, rounds: int = 8, min_orders: int = 30) -> str:
    """Unrolled-iteration DuckDB twin of :func:`k_truss` over the
    supplier co-occurrence edges (CTEs MATERIALIZED). Integer-exact:
    supports are counts — zero float risk on the hash."""
    parts = [
        f"""WITH g0 AS MATERIALIZED (
  SELECT CAST(a.l_suppkey AS BIGINT) AS src,
         CAST(b.l_suppkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= {min_orders}
)"""
    ]

    def sym(i: int) -> str:
        return (
            f"sym{i} AS MATERIALIZED (\n"
            f"  SELECT src AS u, dst AS v FROM g{i}\n"
            f"  UNION ALL SELECT dst AS u, src AS v FROM g{i})"
        )

    def sup(i: int, src_g: int) -> str:
        return (
            f"SELECT g.src, g.dst, count(*) AS support\n"
            f"  FROM g{src_g} g\n"
            f"  JOIN sym{src_g} a ON a.u = g.src\n"
            f"  JOIN sym{src_g} b ON b.u = g.dst AND b.v = a.v\n"
            f"  GROUP BY g.src, g.dst"
        )

    parts.append(sym(0))
    for i in range(1, rounds + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  {sup(i, i - 1)}),
g{i} AS MATERIALIZED (
  SELECT src, dst FROM s{i} WHERE support >= {k - 2})"""
        )
        parts.append(sym(i))
    return (
        ",\n".join(parts)
        + f"""
SELECT g.src, g.dst, count(*) AS support
FROM g{rounds} g
JOIN sym{rounds} a ON a.u = g.src
JOIN sym{rounds} b ON b.u = g.dst AND b.v = a.v
GROUP BY g.src, g.dst
ORDER BY g.src, g.dst"""
    )


def triangle_count_doulion(edges: DataFrame, p: float = 0.5) -> DataFrame:
    """DOULION triangle estimate (Tsourakakis et al., KDD'09): keep
    each edge independently with probability ``p``, count triangles on
    the sparsified graph, scale by 1/p³. Under a RANDOM coin the
    estimator is unbiased with the paper's concentration bound; the
    wedge-join cost drops by ~p^1.5 on the m^1.5 bound. This is the
    scale path when the exact count's binding cost is the densest
    component's wedge mass (r6 verdict #8); :func:`triangle_count` is
    its exact twin and the fixture-scale oracle.

    The coin here is a CONTENT HASH of the edge (md5 of "src|dst",
    the engine's sampling convention) — deterministic, replayable in
    SQL, and an edge's fate never flips across reruns or
    partitionings. That replayability costs the statistical framing
    (ADVICE r7 #5): with a fixed coin the sample is a fixed function
    of the graph, so there is no randomness over which "unbiased"
    holds — the md5 coin behaves LIKE a uniform p-coin on non-
    adversarial edge sets, and the pytest error bound is an empirical
    pin on the fixture, not a guarantee. Callers needing the paper's
    guarantee can salt the hash per run (trading away replay).
    With p a power of two, T_sampled/p³ is an exact double, so the
    gate hash-matches with zero tolerance. Output also carries the
    edge census (m, m_kept) so the run is auditable.

    Scale shape: the filter is map-side on the edge list; the count
    reuses the degree-ordered wedge join; the two censuses fuse into
    ONE partial agg broadcast onto the result row. The edge list is
    localCheckpoint'd first — it typically comes from a derivation
    join (supplier co-occurrence), and without the pin the triangle
    pass and the census would each re-run it."""
    hb = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("src"), F.col("dst"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 65536
    )
    ed = edges.localCheckpoint()
    kept = ed.filter(hb < int(p * 65536))
    census = ed.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.coalesce(F.sum((hb < int(p * 65536)).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_kept"),
    )
    est = F.col("n_triangles_sampled").cast("double") / F.lit(float(p) ** 3)
    return (
        triangle_count(kept)
        .withColumnRenamed("n_triangles", "n_triangles_sampled")
        .crossJoin(F.broadcast(census))
        .select(
            "n_edges",
            "n_kept",
            "n_triangles_sampled",
            est.alias("n_triangles_est"),
        )
    )


def doulion_oracle_sql(p: float = 0.5) -> str:
    """DuckDB twin: identical md5 edge coin, plain id-ordered triangle
    join (orientation-invariant — same count as the degree-ordered
    engine plan)."""
    coin = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(substr(md5("
        "CAST(src AS VARCHAR) || '|' || CAST(dst AS VARCHAR)), 1, 4), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        "(a, x) -> a * 16 + x) % 65536"
    )
    return f"""WITH edges AS MATERIALIZED (
  SELECT CAST(a.l_suppkey AS BIGINT) AS src,
         CAST(b.l_suppkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= 5
),
kept AS MATERIALIZED (SELECT src, dst FROM edges WHERE {coin} < {int(p * 65536)}),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles_sampled
  FROM kept e1
  JOIN kept e2 ON e1.dst = e2.src
  JOIN kept e3 ON e3.src = e1.src AND e3.dst = e2.dst)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_kept,
       n_triangles_sampled,
       CAST(n_triangles_sampled AS DOUBLE) / {float(p) ** 3!r} AS n_triangles_est
FROM tri"""


def bfs_distances(edges: DataFrame, source: int, max_depth: int = 3) -> DataFrame:
    """Breadth-first shortest hop distance from ``source`` over an
    undirected edge list (src < dst normalized), up to ``max_depth``
    hops. Classic frontier expansion: each level is one equi-join of
    the frontier against the (symmetrized) adjacency, anti-joined
    against the visited set — shuffles keyed by node id, lineage cut
    per level with localCheckpoint. Output: (node, dist), integer-exact
    across engines (oracled via unrolled per-level CTEs)."""
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    visited = spark.createDataFrame([(source, 0)], "node long, dist int").localCheckpoint()
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            sym.join(frontier, sym.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.orderBy("node")


def bfs_oracle_sql(source_expr: str, max_depth: int = 3) -> str:
    """Unrolled-CTE DuckDB twin over the thresholded supplier
    co-occurrence graph; ``source_expr`` is a scalar SQL expression for
    the source node (e.g. ``(SELECT min(...) ...)``)."""
    head = f"""WITH edges AS (
  SELECT CAST(a.l_suppkey AS BIGINT) AS src,
         CAST(b.l_suppkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= 5
), sym AS (
  SELECT src AS u, dst AS v FROM edges
  UNION SELECT dst, src FROM edges
), d0 AS (SELECT {source_expr} AS node, 0 AS dist)"""
    body = ""
    seen = "SELECT node FROM d0"
    for i in range(1, max_depth + 1):
        body += f""", d{i} AS (
  SELECT DISTINCT s.v AS node, {i} AS dist
  FROM sym s JOIN d{i - 1} f ON s.u = f.node
  WHERE s.v NOT IN ({seen})
)"""
        seen += f" UNION SELECT node FROM d{i}"
    alls = " UNION ALL ".join(f"SELECT * FROM d{i}" for i in range(max_depth + 1))
    return head + body + f"\nSELECT node, dist FROM ({alls}) ORDER BY node"


def link_prediction_jaccard(
    edges: DataFrame, top_n: int = 200, max_degree: int | None = None
) -> DataFrame:
    """Neighborhood-Jaccard link prediction (Liben-Nowell & Kleinberg,
    "The Link Prediction Problem for Social Networks", CIKM 2003):
    score NON-adjacent node pairs by |N(a)∩N(c)| / |N(a)∪N(c)| — the
    classic "who should be connected" feature, here over the
    supplier co-occurrence graph (which supplier pairs the order flow
    says belong together but never co-shipped).

    Candidates are exactly the OPEN wedges: pairs sharing ≥1 common
    neighbor, minus existing edges — so candidate mass is bounded by
    the same Σdeg² the triangle count pays on the sparsified graph,
    never all-pairs. All-integer counts; Jaccard is one exact divide;
    the top-N cut is deterministic ((score, a, c) order, and scores
    from exact ints are identical doubles on both engines).

    ``max_degree`` (round 10, VERDICT r9 #7): a wedge CENTER of degree
    d contributes d² candidate pairs, so one hub can quadratically
    dominate a dense co-occurrence graph (BASELINE §3d regime notes).
    With the cap set, nodes of degree > max_degree are excluded as
    wedge centers — the standard hub-suppression approximation (their
    NEIGHBORS still pair via any shared non-hub neighbor, and Jaccard
    denominators keep full degrees): `common` undercounts pairs whose
    only shared neighbors are hubs, which is usually desirable — a
    hub's co-occurrence is weak evidence precisely because everyone
    shares it. Default None = exact (the gate's oracle mode)."""
    adj = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    # barrier (r12 optimization): the symmetrized adjacency feeds the
    # degree census and both wedge sides — without it the upstream
    # co-occurrence edge derivation re-ran in every branch (measured
    # plan before: 32 exchanges / 36 scans)
    deg = adj.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    centers = (
        deg.filter(F.col("deg") <= max_degree).select(F.col("src").alias("b"))
        if max_degree is not None
        else None
    )
    w1 = adj.select(F.col("dst").alias("b"), F.col("src").alias("a"))
    w2 = adj.select(F.col("dst").alias("b"), F.col("src").alias("c"))
    if centers is not None:
        w1 = w1.join(centers, "b", "left_semi")
        w2 = w2.join(centers, "b", "left_semi")
    cand = (
        w1.join(w2, "b")
        .filter(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count("*").cast("long").alias("common"))
        .join(
            edges.select(F.col("src").alias("a"), F.col("dst").alias("c")),
            ["a", "c"],
            "left_anti",
        )
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    dc = deg.select(F.col("src").alias("c"), F.col("deg").alias("deg_c"))
    jac = F.col("common").cast("double") / (
        F.col("deg_a") + F.col("deg_c") - F.col("common")
    ).cast("double")
    return (
        cand.join(da, "a")
        .join(dc, "c")
        .select("a", "c", "common", "deg_a", "deg_c", jac.alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "a", "c")
        .limit(top_n)
    )


LINK_PREDICTION_SQL = """WITH edges AS (
  SELECT CAST(a.l_suppkey AS BIGINT) AS src,
         CAST(b.l_suppkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= 20
),
adj AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY src),
cand AS (
  SELECT w1.src AS a, w2.src AS c, CAST(count(*) AS BIGINT) AS common
  FROM adj w1 JOIN adj w2 ON w1.dst = w2.dst AND w1.src < w2.src
  GROUP BY 1, 2
),
nonedge AS (
  SELECT cand.a, cand.c, cand.common
  FROM cand LEFT JOIN edges e ON e.src = cand.a AND e.dst = cand.c
  WHERE e.src IS NULL
)
SELECT n.a, n.c, n.common, da.deg AS deg_a, dc.deg AS deg_c,
       CAST(n.common AS DOUBLE) / CAST(da.deg + dc.deg - n.common AS DOUBLE)
         AS jaccard
FROM nonedge n
JOIN deg da ON da.src = n.a
JOIN deg dc ON dc.src = n.c
ORDER BY jaccard DESC, n.a, n.c
LIMIT 200"""
