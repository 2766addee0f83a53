"""Classic relational-operator coverage beyond the TPC-H shapes
(SURVEY.md §2.5: the reference has none of these; Spark gives them
natively — we pin each against the DuckDB oracle): set operations,
pivot, cube, anti/semi joins, scalar subqueries, string and date
scalar functions."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def nations_with_customers_and_suppliers(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """INTERSECT of two distinct key sets."""
    a = customer.select(F.col("c_nationkey").alias("nationkey")).distinct()
    b = supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    return a.intersect(b).orderBy("nationkey")


def nations_with_customers_but_no_suppliers(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """EXCEPT of two distinct key sets (set difference)."""
    a = customer.select(F.col("c_nationkey").alias("nationkey")).distinct()
    b = supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    return a.exceptAll(b).distinct().orderBy("nationkey")


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """NOT EXISTS as a left-anti join — only customer side materialized;
    at scale the probe side carries no payload columns through the shuffle."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def nations_without_rich_customers(nation: DataFrame, customer: DataFrame,
                                   acctbal_min: float = 9990.0) -> DataFrame:
    """EXCEPT (set difference): nation keys minus nations that have a
    customer above the balance threshold."""
    a = nation.select(F.col("n_nationkey").alias("nationkey")).distinct()
    b = (
        customer.filter(F.col("c_acctbal") > acctbal_min)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    return a.exceptAll(b).distinct().orderBy("nationkey")


def customers_without_urgent_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """NOT EXISTS as a left-anti join (no payload materialized for the
    probe side)."""
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Counts per user pivoted by event type. `.pivot` with an explicit
    value list compiles to conditional aggregation (no extra pass to
    discover values — important at scale); fillna(0) matches SQL's
    sum(CASE...)."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
        .orderBy("user_id")
    )


def cube_returns(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping sets."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


def orders_above_average(orders: DataFrame) -> DataFrame:
    """Scalar-subquery filter. The threshold is the decimal-exact mean
    (see tpch.py exactness strategy) computed in a broadcast cross-join
    — the Spark shape of an uncorrelated scalar subquery."""
    avg_df = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double")
            / F.count("*").cast("double")
        ).alias("__avg")
    )
    return (
        orders.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def part_string_functions(part: DataFrame) -> DataFrame:
    """Scalar string-function coverage: upper/substr/length/concat/LIKE."""
    return (
        part.filter(F.col("p_type").like("%ECO%") | F.col("p_type").like("%PROMO%"))
        .select(
            "p_partkey",
            F.upper(F.col("p_brand")).alias("brand_u"),
            F.substring(F.col("p_name"), 1, 12).alias("name12"),
            F.length(F.col("p_type")).alias("type_len"),
            F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        )
        .orderBy("p_partkey")
    )


def nation_presence_full_outer(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """FULL OUTER join coverage: per nation key, customer/supplier
    counts with presence flags — null-handling semantics across both
    unmatched sides."""
    c = customer.groupBy(F.col("c_nationkey").alias("ck")).agg(
        F.count("*").alias("n_customers")
    )
    s = supplier.filter(F.col("s_acctbal") > 9000).groupBy(
        F.col("s_nationkey").alias("sk")
    ).agg(F.count("*").alias("n_rich_suppliers"))
    return (
        c.join(s, c.ck == s.sk, "full_outer")
        .select(
            F.coalesce(F.col("ck"), F.col("sk")).alias("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("n_rich_suppliers"), F.lit(0)).alias("n_rich_suppliers"),
            (F.col("ck").isNotNull() & F.col("sk").isNotNull()).alias("in_both"),
        )
        .orderBy("nationkey")
    )


def embedding_dimension_stats(embeddings: DataFrame) -> DataFrame:
    """Generator (posexplode) coverage + per-dimension corpus stats:
    mean and max of each embedding dimension. The explode → groupBy(dim)
    shape is how per-feature normalization constants are computed at
    scale (one shuffle keyed by dimension; partial aggs map-side)."""
    return (
        embeddings.select(
            F.posexplode(F.col("embedding")).alias("dim", "val")
        )
        .select("dim", F.col("val").cast("double").alias("val"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.min("val").alias("min_val"),  # exact (no float-sum order issues)
            F.max("val").alias("max_val"),
        )
        .orderBy("dim")
    )


def region_nation_rollcall(nation: DataFrame, region: DataFrame) -> DataFrame:
    """Collection aggregates: the nations of each region as a sorted
    array plus a concatenated string. collect_list order is
    nondeterministic under parallelism — ALWAYS sort_array (or
    array_sort) before comparing/emitting; same rule at any scale."""
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.sort_array(F.collect_list("n_name")).alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .withColumn("nations_csv", F.array_join(F.col("nations"), ","))
        .orderBy("r_name")
    )


def json_payload_stats(events: DataFrame) -> DataFrame:
    """JSON payload extraction + aggregation — the stream-store's
    payloads are opaque JSON strings (reference: README.md:25,
    NewStreamMessage.cs:14); querying into them is get_json_object
    (JVM-side JSON path, codegen'd — no UDF). Mean computed as
    double(bigint sum)/double(count): exact in both engines."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            (F.sum(k).cast("double") / F.count("*").cast("double")).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def order_price_quantiles(orders: DataFrame) -> DataFrame:
    """Exact interpolated quantiles per order status (percentile ==
    ANSI percentile_cont/DuckDB quantile_cont). At 100 TB you'd switch
    to approx_percentile (t-digest sketch, mergeable, single pass) —
    kept exact here so the oracle hash-matches."""
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.percentile(F.col("o_totalprice"), F.lit(0.25)).alias("p25"),
            F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("p50"),
            F.percentile(F.col("o_totalprice"), F.lit(0.75)).alias("p75"),
        )
        .orderBy("o_orderstatus")
    )


def unpivot_token_metrics(documents: DataFrame) -> DataFrame:
    """Unpivot (wide → long) via the built-in stack generator: one row
    per (doc_id, metric). The inverse of pivot; no shuffle — stack is a
    generator in the projection."""
    toks = F.split(F.col("text"), " ")
    wide = documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
    )
    return wide.select(
        "doc_id",
        F.expr(
            "stack(3, 'n_tokens', n_tokens, 'n_distinct_tokens', n_distinct_tokens, "
            "'n_chars_computed', n_chars_computed) AS (metric, value)"
        ),
    ).orderBy("doc_id", "metric")


def grouping_sets_lineitem(spark, lineitem: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface (rollup/cube's
    general form — the reference has no grouping sets at all)."""
    lineitem.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


def approx_order_stats(orders: DataFrame) -> DataFrame:
    """Sketch aggregates — the single-pass, mergeable versions used at
    100 TB where exact quantiles/distincts would shuffle raw values:
    HyperLogLog++ distinct counts and t-digest percentiles. Both are
    partial-aggregatable (each partition emits a sketch; sketches
    merge), so the shuffle carries KBs regardless of input size.
    Engine-specific sketches ⇒ rows-only gate check; accuracy is pinned
    by tests/test_relational_extras.py against the exact values."""
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey").alias("approx_customers"),
            F.percentile_approx(F.col("o_totalprice"), F.lit(0.5), F.lit(10_000)).alias(
                "approx_median_price"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


def orders_by_year_month(orders: DataFrame) -> DataFrame:
    """Date-part extraction + group-by."""
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .orderBy("y", "m")
    )


def window_rank_family(orders: DataFrame) -> DataFrame:
    """The remaining rank-family window functions in one query:
    dense_rank / percent_rank / cume_dist of each order-priority's
    total revenue within its order-status partition. All three are
    rational functions of integer rank positions — exact across
    engines, no rounding needed."""
    from pyspark.sql import Window

    per = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("rev").desc())
    return per.select(
        "o_orderstatus",
        "o_orderpriority",
        F.col("rev").cast("double").alias("revenue"),
        F.dense_rank().over(w).alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    ).orderBy("o_orderstatus", "o_orderpriority")


WINDOW_RANKS_SQL = """SELECT o_orderstatus, o_orderpriority,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(dense_rank()   OVER w AS INT)    AS drank,
       percent_rank() OVER w AS prank,
       cume_dist()    OVER w AS cdist
FROM (
  SELECT o_orderstatus, o_orderpriority,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_orderstatus, o_orderpriority)
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY rev DESC)
ORDER BY o_orderstatus, o_orderpriority"""


def higher_moments(lineitem: DataFrame) -> DataFrame:
    """Skewness and kurtosis of extended price per return flag —
    rounded on both engines (the corr_regr float-order precedent).
    Note: Spark's kurtosis is EXCESS kurtosis (normal = 0), DuckDB's
    ``kurtosis`` applies a sample bias correction — the oracle uses
    DuckTB's kurtosis_pop equivalent formula to match Spark's
    population definition."""
    x = F.col("l_extendedprice").cast("double")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.skewness(x), 6).alias("skew"),
            F.round(F.kurtosis(x), 6).alias("kurt"),
        )
        .orderBy("l_returnflag")
    )


HIGHER_MOMENTS_SQL = """SELECT l_returnflag, count(*) AS n,
  round(
    (sum(pow(x - ax, 3)) / count(*))
    / pow(sum(pow(x - ax, 2)) / count(*), 1.5), 6) AS skew,
  round(
    (sum(pow(x - ax, 4)) / count(*))
    / pow(sum(pow(x - ax, 2)) / count(*), 2) - 3, 6) AS kurt
FROM (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x,
         avg(CAST(l_extendedprice AS DOUBLE))
           OVER (PARTITION BY l_returnflag) AS ax
  FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag"""


def fuzzy_name_matches(part: DataFrame, max_dist: int = 3) -> DataFrame:
    """Entity-resolution shape: near-identical name pairs via
    block-then-verify — the standard fuzzy-join pattern (an unblocked
    fuzzy join is all-pairs). Blocking key = first token (swap in
    soundex/minhash for messier data); candidates are an equi-join on
    the block; verify = levenshtein <= max_dist, computed only on
    candidates. Distinct names first: the match set is a property of
    the vocabulary, not row multiplicity."""
    names = part.select(F.col("p_name").alias("name")).distinct()
    blocked = names.select(
        "name", F.split(F.col("name"), " ").getItem(0).alias("blk")
    )
    a = blocked.select(F.col("name").alias("name_a"), "blk")
    b = blocked.select(F.col("name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a", "name_b",
            F.levenshtein(F.col("name_a"), F.col("name_b")).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .orderBy("name_a", "name_b")
    )


FUZZY_MATCHES_SQL = """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
blocked AS (SELECT name, split_part(name, ' ', 1) AS blk FROM names)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
ORDER BY name_a, name_b"""


def weighted_median(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group weighted (lower) median: the smallest value v such
    that the summed weight of rows with value <= v reaches half the
    group's total weight. With weight = token count over documents this
    answers the curation question "the median TOKEN lives in a document
    of what length?" — a corpus-centric distribution the unweighted
    median (stats_quantiles) can't see: one 1M-token document moves it
    as much as a thousand 1k-token ones.

    All-integer discipline: the half-total threshold compares
    2*cum_w >= total_w (no fractional division), so the result is
    hash-exact on any engine. Scale shape: one shuffle on the group
    key; cumulative weight is a per-group ordered window (ties on
    value broken by a stable id-free ORDER: value then weight — rows
    interchangeable under equal (value, weight) give the same cum
    crossing), total via an unbounded frame on the same partitioning
    (no second shuffle), then a min over crossing rows.
    """
    from pyspark.sql import Window

    if weight_col is None:
        w_expr = F.size(F.split(F.col("text"), " ")).cast("bigint")
    else:
        w_expr = F.col(weight_col).cast("bigint")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("v"),
        w_expr.alias("w"),
    )
    wo = Window.partitionBy("g").orderBy("v", "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("g")
    cum = base.select(
        "g",
        "v",
        F.sum("w").over(wo).alias("cum_w"),
        F.sum("w").over(wt).alias("total_w"),
    )
    return (
        cum.filter(F.lit(2) * F.col("cum_w") >= F.col("total_w"))
        .groupBy("g")
        .agg(F.min("v").alias("wmedian"), F.max("total_w").alias("total_w"))
        .select(
            F.col("g").alias(group_col),
            F.col("total_w"),
            F.col("wmedian"),
        )
        .orderBy(group_col)
    )


def brand_assoc_rules(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Market-basket association rules over order baskets: each order
    is a basket, its items are the distinct part BRANDS it contains
    (the bounded rollup axis — raw part keys would make the pair space
    |parts|² while brands keep it ~25²). For every directed rule
    antecedent → consequent: support, confidence, and lift, all exact
    BIGINT ratios.

    Scale shape: the basket build is one broadcast join (part is the
    small dim) + distinct on (order, brand); pair counts come from a
    self-equi-join ON THE BASKET KEY — each basket contributes at most
    |distinct brands in it|² pair rows (single-digit for TPC-H
    baskets), never |orders|². Counts partial-agg on the ≤ brands²
    axis; the basket total crosses as a one-row broadcast. At 100 TB
    the only growing shuffle is the distinct on (order, brand), keyed
    evenly by order.
    """
    baskets = (
        lineitem.join(
            F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"]
        )
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
        .localCheckpoint()  # feeds item counts, pair counts, and the total
    )
    n_b = baskets.select(
        F.countDistinct("basket").cast("long").alias("n_baskets")
    )
    c_item = baskets.groupBy("item").agg(F.count("*").cast("long").alias("c"))
    a, b = baskets.alias("a"), baskets.alias("b")
    c_pair = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
        .agg(F.count("*").cast("long").alias("c_both"))
    )
    directed = c_pair.select("x", "y", "c_both").unionByName(
        c_pair.select(F.col("y").alias("x"), F.col("x").alias("y"), "c_both")
    )
    return (
        directed.join(c_item.select(F.col("item").alias("x"), F.col("c").alias("c_ante")), "x")
        .join(c_item.select(F.col("item").alias("y"), F.col("c").alias("c_cons")), "y")
        .crossJoin(F.broadcast(n_b))
        .select(
            F.col("x").alias("antecedent"),
            F.col("y").alias("consequent"),
            "c_both",
            "c_ante",
            "c_cons",
            "n_baskets",
            (F.col("c_both").cast("double") / F.col("n_baskets")).alias("support"),
            (F.col("c_both").cast("double") / F.col("c_ante")).alias("confidence"),
            (
                (F.col("c_both") * F.col("n_baskets")).cast("double")
                / (F.col("c_ante") * F.col("c_cons"))
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


def open_lineitem_backlog(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order-to-ship backlog by day via the sweep-line prefix-sum: a
    lineitem is "open" from its order's o_orderdate (inclusive) until
    its l_shipdate (exclusive). Instead of joining every lineitem to
    every day it spans (interval × calendar blow-up), each lineitem
    emits two ±1 deltas; summing deltas per day and taking the global
    running total yields the exact open count per day — the standard
    interval-stabbing-count reduction to a prefix sum.

    Scale shape: one equi-join on orderkey (co-partition/bucket both
    sides at scale), one partial-agg shuffle onto the bounded calendar
    axis, then the two-phase global cumsum of `operators/positions.py`
    — no single-partition window, no per-day join. All values BIGINT.
    """
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    li = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.date_trunc("day", F.col("o_orderdate")).alias("open_day"),
            F.date_trunc("day", F.col("l_shipdate")).alias("ship_day"),
        )
        # positive-duration guard: the synthetic fixture (unlike real
        # TPC-H) has ship < order rows; a negative interval would push
        # the sweep's running total below truth between the two deltas
        .filter(F.col("ship_day") > F.col("open_day"))
    )
    deltas = li.select(
        F.col("open_day").alias("day"),
        F.lit(1).cast("long").alias("opened"),
        F.lit(0).cast("long").alias("shipped"),
    ).unionByName(
        li.select(
            F.col("ship_day").alias("day"),
            F.lit(0).cast("long").alias("opened"),
            F.lit(1).cast("long").alias("shipped"),
        )
    )
    per_day = deltas.groupBy("day").agg(
        F.sum("opened").cast("long").alias("n_opened"),
        F.sum("shipped").cast("long").alias("n_shipped"),
    ).withColumn("net", F.col("n_opened") - F.col("n_shipped"))
    return (
        with_global_cumsum(per_day, [F.col("day")], "net", "open_backlog")
        .select("day", "n_opened", "n_shipped", "open_backlog")
        .orderBy("day")
    )


def pareto_abc_classes(lineitem: DataFrame) -> DataFrame:
    """ABC (Pareto) inventory analysis: rank parts by exact revenue,
    walk the cumulative share, and bucket into A (first 80% of
    revenue), B (next 15%), C (tail) — the "which 20% of parts earn
    80%" decomposition. Revenue is exact integer micro-money
    (price-cents × (100 − discount-cents), the tpch.py decimal
    strategy), the running total is the two-phase global cumsum over
    the PART table (never the raw lineitem), and the class boundaries
    are integer cross-multiplications (cum·5 ≤ total·4, cum·20 ≤
    total·19) — no float compare anywhere. Shares are final-divide
    doubles; zero-tolerance oracle.

    Scale shape: one partkey partial agg + the positions.py cumsum on
    |parts| rows; at 100 TB the lineitem scan dominates and everything
    downstream is parts-bounded."""
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    rev = lineitem.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
            * (
                F.lit(100)
                - (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long")
            )
        )
        .cast("long")
        .alias("rev")
    )
    cum = with_global_cumsum(
        rev, [F.col("rev").desc(), F.col("l_partkey")], "rev", "cum_rev"
    )
    total = rev.agg(F.sum("rev").cast("long").alias("total_rev"))
    classed = cum.crossJoin(F.broadcast(total)).withColumn(
        "abc_class",
        F.when(F.col("cum_rev") * 5 <= F.col("total_rev") * 4, F.lit("A"))
        .when(F.col("cum_rev") * 20 <= F.col("total_rev") * 19, F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("class_rev"),
            F.max("total_rev").alias("total_rev"),
        )
        .select(
            "abc_class",
            "n_parts",
            "class_rev",
            (F.col("class_rev").cast("double") / F.col("total_rev")).alias("rev_share"),
        )
        .orderBy("abc_class")
    )


def sla_percentiles(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Fulfilment-SLA report: exact p50/p90/p99 of the order→ship
    latency (whole days, negatives kept — they're the fixture's data-
    quality signal) per order priority, via grouped rank-select: value
    at row ceil(q·n) of the group's ascending latency order. Exact
    grouped quantiles WITHOUT a global sort — each group sorts inside
    its own window partition, parallel over priorities; ties don't
    affect the selected VALUE, so the order-by needs no tie-break.

    All outputs are exact BIGINTs (day counts) — zero-tolerance
    oracle. Scale shape: one equi-join on orderkey + one priority-
    keyed window; at 100 TB swap the in-group sort for the rank-exact
    GK-bounds pattern (stats_ntile_deciles_approx) if a single
    priority outgrows a partition."""
    from pyspark.sql import Window

    lat = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("lat"),
    )
    # r12 wave 10 (guide §2.3 — shuffle fewer bytes): latency is a
    # small-domain integer, so the grouped rank-select runs on the
    # (priority, lat) COUNT frame instead of window-sorting every
    # joined row: value at rank ceil(q·n) ascending == the smallest
    # lat whose running count reaches that rank (ties can't affect
    # the selected VALUE, exactly as before). The window now orders
    # ~|domain| rows per priority, and only partial-agg counts
    # shuffle. Outputs are the same exact BIGINTs.
    cnt = lat.groupBy("o_orderpriority", "lat").agg(
        F.count("*").cast("long").alias("c")
    )
    wp = Window.partitionBy("o_orderpriority")
    wc = wp.orderBy("lat").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cnt.select(
        "o_orderpriority",
        "lat",
        F.sum("c").over(wc).cast("long").alias("cum"),
        F.sum("c").over(wp).cast("long").alias("n"),
    )
    pick = lambda q: F.min(
        F.when(
            F.col("cum") >= F.ceil(F.lit(q) * F.col("n")).cast("long"),
            F.col("lat"),
        )
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n"),
            F.min("lat").alias("min_days"),
            pick(0.5).alias("p50_days"),
            pick(0.9).alias("p90_days"),
            pick(0.99).alias("p99_days"),
            F.max("lat").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


def part_skyline(part: DataFrame) -> DataFrame:
    """2-D skyline (Pareto frontier) of the part catalog: the parts
    for which no other part is both cheaper-or-equal AND
    larger-or-equal with at least one strict — "best value at every
    size". The classic dominance operator (Börzsönyi et al., ICDE'01)
    expressed sort-based: group to one row per distinct price (max
    size), take the EXCLUSIVE running max of size over ascending
    price via the two-phase global-cummax primitive, and a part
    survives iff its size beats every strictly-cheaper part's best
    size and is its own price point's best. Never all-pairs — the
    oracle deliberately IS the all-pairs NOT EXISTS definition, so the
    gate compares two independent algorithms.

    Scale shape: one groupBy on price + one range-partitioned
    two-phase pass + one equi-join back on price; output is the
    frontier (tiny). NULL price/size rows can't dominate or be ranked
    — excluded."""
    from sqlstreamstore_spark.operators.positions import with_global_cummax

    rows = part.filter(
        F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
    )
    g = rows.groupBy("p_retailprice").agg(F.max("p_size").alias("best_here"))
    fr = with_global_cummax(
        g, [F.col("p_retailprice")], "best_here", "best_lt", exclusive=True
    )
    return (
        rows.join(fr, "p_retailprice")
        .filter(
            (F.col("best_lt").isNull() | (F.col("best_lt") < F.col("p_size")))
            & (F.col("p_size") == F.col("best_here"))
        )
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


def brand_cooccurrence(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Item-item co-occurrence similarity over order baskets on the
    bounded brand axis — the "customers who bought X also bought Y"
    matrix next to :func:`brand_assoc_rules`' directional rules:
    cosine = c_ab / sqrt(c_a * c_b) and Jaccard = c_ab / (c_a + c_b -
    c_ab) from exact basket counts. sqrt is IEEE-correctly-rounded in
    both engines and every other step is integer, so the oracle is
    zero-tolerance.

    Scale shape: baskets are distinct (order, brand) pairs — the part
    dim broadcasts; the pair build is an equi-join on orderkey whose
    fan-out is bounded by (brands per order choose 2), never all-pairs
    across orders; the final agg lands on the <=300-row brand-pair
    axis."""
    baskets = (
        lineitem.join(F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        # r12 barrier: feeds both self-join sides AND both size
        # broadcasts — the basket join + distinct ran once per branch
        .localCheckpoint(eager=False)
    )
    sizes = baskets.groupBy("brand").agg(F.count("*").cast("long").alias("c"))
    a = baskets.select("okey", F.col("brand").alias("brand_a"))
    b = baskets.select("okey", F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("c_both"))
    )
    sa = sizes.select(F.col("brand").alias("brand_a"), F.col("c").alias("c_a"))
    sb = sizes.select(F.col("brand").alias("brand_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "c_a",
            "c_b",
            "c_both",
            (
                F.col("c_both").cast("double")
                / F.sqrt((F.col("c_a") * F.col("c_b")).cast("double"))
            ).alias("cosine"),
            (
                F.col("c_both").cast("double")
                / (F.col("c_a") + F.col("c_b") - F.col("c_both"))
            ).alias("jaccard"),
        )
        .orderBy("brand_a", "brand_b")
    )


def brand_hhi(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Herfindahl-Hirschman revenue-concentration index over the brand
    axis — the market-structure audit ("is our corpus/revenue
    dominated by a few sources?") regulators and data teams share:

        HHI = sum_i share_i^2 = (sum_i rev_i^2) / total^2

    The cross-multiplied form keeps everything exact: per-brand
    revenue in BIGINT cents, the sum of squares in DECIMAL(38,0)
    (rev_i^2 overflows int64 once a brand clears ~$92M — the
    inter_arrival overflow discipline), one divide at the end. Also
    reports the normalized HHI (0 = perfectly even, 1 = monopoly).

    Shape: broadcast dim join + two nested partial aggs onto the
    bounded brand axis, single-row output."""
    rev = (
        lineitem.join(F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents"),
        )
    )
    one = rev.agg(
        F.count("*").cast("long").alias("n_brands"),
        F.sum("rev_cents").cast("long").alias("total_cents"),
        F.sum(
            F.col("rev_cents").cast("decimal(38,0)") * F.col("rev_cents")
        ).alias("sq_sum"),
    )
    hhi = F.col("sq_sum").cast("double") / (
        F.col("total_cents").cast("double") * F.col("total_cents").cast("double")
    )
    nb = F.col("n_brands").cast("double")
    return one.select(
        "n_brands",
        "total_cents",
        hhi.alias("hhi"),
        ((hhi - F.lit(1.0) / nb) / (F.lit(1.0) - F.lit(1.0) / nb)).alias(
            "hhi_normalized"
        ),
    )


def brand_assortativity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Degree assortativity (Newman 2002) of the STRONG brand
    co-occurrence graph — do hub brands co-occur with other hubs
    (r > 0) or with niche brands (r < 0, hub-and-spoke)? On a dense
    basket corpus the raw co-occurrence graph is complete (every brand
    pair shares SOME order — K25 on the fixture, zero degree variance,
    r undefined), so edges are thresholded at 1.2x the MEDIAN pair
    support — a relative cut that tracks corpus size, leaving the
    above-typical ties whose structure the metric measures.

    r = Pearson correlation of endpoint degrees over the DIRECTED
    edge list (each undirected edge contributes both orientations —
    the standard convention making endpoints exchangeable). The median
    support is an exact rank-average (two-phase index, broadcast back);
    degrees and all five moments are exact BIGINTs; r is
    cross-multiplied integers with two sqrts in fixed order —
    zero-tolerance oracle."""
    from sqlstreamstore_spark.operators.positions import with_dense_global_index

    baskets = (
        lineitem.join(F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    a = baskets.select("okey", F.col("brand").alias("ba"))
    b = baskets.select("okey", F.col("brand").alias("bb"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.count("*").cast("long").alias("c"))
        # Materialize ONCE (r12 optimization): this brand-pair support
        # frame is bounded (brands choose 2) but its lineage is the
        # basket self-join over lineitem; it feeds the median rank, the
        # edge threshold and (transitively) the degree/moment branches —
        # without a barrier the self-join re-runs in every branch (the
        # measured plan held 136 parquet scans / 232 exchanges).
        .localCheckpoint(eager=False)
    )
    n_df = F.broadcast(pairs.agg(F.count("*").cast("long").alias("__n")))
    ranked = with_dense_global_index(pairs, [F.col("c")], "__ix").crossJoin(n_df)
    med = (
        ranked.filter(
            (F.col("__ix") + 1 == F.floor((F.col("__n") + 1) / 2))
            | (F.col("__ix") + 1 == F.floor(F.col("__n") / 2) + 1)
        )
        .agg(F.avg("c").alias("med_support"))
    )
    und = (
        pairs.crossJoin(F.broadcast(med))
        .filter(F.col("c") >= F.lit(1.2) * F.col("med_support"))
        .select("ba", "bb")
        # barrier: und feeds directed twice (both orientations) which
        # feeds deg + the endpoint join — 6 downstream references
        .localCheckpoint(eager=False)
    )
    directed = und.unionByName(
        und.select(F.col("bb").alias("ba"), F.col("ba").alias("bb"))
    )
    deg = directed.groupBy("ba").agg(F.count("*").cast("long").alias("deg"))
    da = deg.select(F.col("ba"), F.col("deg").alias("dx"))
    db = deg.select(F.col("ba").alias("bb"), F.col("deg").alias("dy"))
    ends = directed.join(F.broadcast(da), "ba").join(F.broadcast(db), "bb")
    m = ends.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    return m.select(
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.col("m").alias("n_directed"),
        (
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.nullif(
                F.sqrt(
                    (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                        "double"
                    )
                )
                * F.sqrt(
                    (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                        "double"
                    )
                ),
                F.lit(0.0),
            )
        ).alias("assortativity"),
    )
