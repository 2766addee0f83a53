"""Input-parallelism hygiene for map-heavy operators.

A small single-file parquet table arrives as ONE scan partition
(spark.sql.files.maxPartitionBytes splits only large files), and any
operator whose FIRST heavy work is map-side — shingle explodes, the
32-way MinHash min-aggregation's partial phase, per-row hash families,
centroid scoring — then serializes that work on one task no matter how
many cores the cluster has. The shuffle that follows parallelizes only
what comes AFTER.

``with_min_parallelism`` round-robin repartitions ONLY when the input
scan would produce fewer partitions than the session's default
parallelism: a cheap narrow-input shuffle at fixture scale, a NO-OP at
production scale (real tables carry >= cores partitions from the scan).
Row-level results are unaffected — callers are aggregations/joins whose
output is partition-order independent (and every gate orders
explicitly).

Round 8 (ADVICE r7 #3 fallout): the probe is now METADATA-ONLY. The
old ``df.rdd.getNumPartitions()`` check materialized AQE query stages
at plan-BUILD time — the last construction-time job in the flagship's
lazy chain. The scan-partition count is instead estimated from the
file listing (``df.inputFiles()`` + Hadoop file sizes against
``spark.sql.files.maxPartitionBytes``), which touches only the file
index. Frames with no file source (post-shuffle/in-memory) are
returned unchanged: AQE already right-sizes shuffle outputs, and
adding a blind repartition to a derived frame would insert a full
shuffle at any scale.

Measured (sf0.1, local[32]): semantic_clusters 13.5 s -> 7.7 s,
minhash candidate generation ~3x, e2e corpus chain ~2x on the
minhash-dominated stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ('134217728b', '128MB',
    '1.5g'). Fractional prefixes parse with float() (ADVICE r8 #4: the
    old isdigit check let '1.5g' fall through to a digit-scrape that
    returned 15 bytes, wildly inflating the estimated partition count
    and suppressing the repartition this helper exists to add)."""
    s = str(v).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    for suffix in ("b", ""):
        for u, mult in units.items():
            tail = u + suffix
            if s.endswith(tail):
                try:
                    return int(float(s[: -len(tail)].strip()) * mult)
                except ValueError:
                    continue
    try:
        return int(float(s.rstrip("b").strip() or "nan"))
    except ValueError:
        return 128 * (1 << 20)


def _rdd_leaf_partitions(df: DataFrame) -> int | None:
    """Known partition count of an RDD-backed frame (a localCheckpoint
    barrier, possibly under narrow Project/Filter wrappers), or None.

    Metadata-only: the checkpoint RDD already exists (Dataset.checkpoint
    builds it at construction), so ``rdd().getNumPartitions()`` reads
    its partition array without planning or running anything. Lazy
    derived plans (which would force AQE stage materialization — the r8
    regression this module's doc records) never reach the LogicalRDD
    arm and return None."""
    try:
        node = df._jdf.queryExecution().analyzed()
        for _ in range(16):
            cn = node.getClass().getSimpleName()
            if cn == "LogicalRDD":
                return int(node.rdd().getNumPartitions())
            if cn in ("Project", "Filter", "SubqueryAlias", "Deduplicate"):
                node = node.child()
                continue
            return None
    except Exception:
        return None
    return None


def with_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` (default: the session's
    defaultParallelism) iff its FILE SCAN would produce fewer
    partitions. Metadata-only — builds no jobs (see module doc)."""
    spark = df.sparkSession
    t = target or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        # RDD-backed barrier (localCheckpoint): partition count is
        # already known — AQE coalesces those exchanges by BYTES, so a
        # tiny-but-compute-dense frame (k x md5 per row downstream)
        # lands on 1-2 tasks and serializes the heavy map phase (r12:
        # the e2e fuzzy stage ran its 8.3M-digest signature pass on ONE
        # core). Repartition up to t; at scale the barrier already
        # carries >= t partitions and this is a no-op.
        parts = _rdd_leaf_partitions(df)
        if parts is not None and parts < t:
            return df.repartition(t)
        # lazy derived frame: AQE sizes shuffle outputs; a blind
        # repartition here would add a full shuffle at any scale
        return df
    if len(files) >= t:
        return df
    # few files: size them (bounded py4j metadata calls, < t of them)
    try:
        sc = spark.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        jpath = sc._jvm.org.apache.hadoop.fs.Path
        total = 0
        for f in files:
            p = jpath(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
        maxpb = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
        est = max(len(files), -(-total // maxpb))
    except Exception:
        est = len(files)
    if est >= t:
        return df
    return df.repartition(t)
