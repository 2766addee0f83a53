"""Z-order layout: the locality claim (clustering by the Morton value
makes BOTH columns' per-bucket ranges narrow), the skipping contract
(pruned read ∪ filter == full scan ∪ filter), and the oracle parity of
the z computation itself (gate query `layout_zorder_values`)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sqlstreamstore_spark.sources.tables import load_table
from sqlstreamstore_spark.sources.zorder import (
    read_pruned,
    write_zordered,
    z_values,
)

SF = "/root/testdata/sf0.001"


def _orders_cents(spark):
    return load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
    )


def test_z_interleave_bit_exact(spark):
    """Hand-checkable Morton values: scaled a=0b0011, b=0b0101 at
    bits=4 interleave to 0b00100111 = 39 (a bits at even positions)."""
    df = spark.createDataFrame(
        [(0, 0, 0), (1, 3, 5), (2, 15, 15)], "id long, a long, b long"
    )
    rows = {r["id"]: r["z"] for r in z_values(df, "a", "b", bits=4).collect()}
    # min/max scaling maps a: 0,3,15 -> 0,3,15 (domain is 0..15)
    assert rows[0] == 0
    assert rows[1] == 0b00100111  # a=0011 even bits, b=0101 odd bits
    assert rows[2] == 0b11111111


def test_zorder_locality_beats_single_column_sort(spark, tmp_path):
    """The reason skipping works: under z-order, the SECOND column's
    per-bucket extent is a small fraction of its domain; under a plain
    sort by the first column it spans ~the whole domain. Compare the
    mean extent of `cents` across buckets."""
    df = _orders_cents(spark)
    zpath = str(tmp_path / "z")
    manifest = write_zordered(df, zpath, "o_custkey", "cents", n_buckets=16)

    lo = df.agg(F.min("cents")).collect()[0][0]
    hi = df.agg(F.max("cents")).collect()[0][0]
    domain = hi - lo

    def mean_extent(buckets):
        exts = [
            (float(st["b_max"]) - float(st["b_min"])) / domain
            for st in buckets.values()
            if st["n_rows"] > 1
        ]
        return sum(exts) / len(exts)

    z_extent = mean_extent(manifest["buckets"])

    # naive layout: sort by o_custkey alone, same bucket count
    naive = (
        df.withColumn("zbucket", F.ntile(16).over(Window.orderBy("o_custkey")))
        .groupBy("zbucket")
        .agg(F.min("cents").alias("b_min"), F.max("cents").alias("b_max"),
             F.count("*").alias("n_rows"))
        .collect()
    )
    naive_extent = mean_extent({str(r["zbucket"]): r.asDict() for r in naive})
    # custkey and price are independent, so a custkey sort leaves price
    # spanning ~the full domain per bucket; z-order cuts it sharply
    assert naive_extent > 0.8, naive_extent
    assert z_extent < 0.5 * naive_extent, (z_extent, naive_extent)


def test_zorder_pruned_read_exact_and_skips(spark, tmp_path):
    """Skipping is a superset guarantee: pruned-read + filter returns
    exactly full-scan + filter, while reading strictly fewer buckets
    for a selective two-sided rectangle."""
    df = _orders_cents(spark)
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, "o_custkey", "cents", n_buckets=16)

    a_lo, a_hi = 100, 300
    b_lo, b_hi = 5_000_000, 10_000_000
    pred = (
        (F.col("o_custkey") >= a_lo) & (F.col("o_custkey") <= a_hi)
        & (F.col("cents") >= b_lo) & (F.col("cents") <= b_hi)
    )
    expect = sorted(r["o_orderkey"] for r in df.filter(pred).collect())

    pruned, read, total = read_pruned(
        spark, zpath, a_range=(a_lo, a_hi), b_range=(b_lo, b_hi))
    got = sorted(r["o_orderkey"] for r in pruned.filter(pred).collect())
    assert got == expect and expect
    assert read < total, (read, total)

    # single-sided ranges prune too (either column — the z-order point)
    for kw in ({"a_range": (a_lo, a_hi)}, {"b_range": (b_lo, b_hi)}):
        pruned, read, total = read_pruned(spark, zpath, **kw)
        assert read < total, (kw, read, total)

    # empty rectangle: zero buckets, empty frame with the right schema
    pruned, read, _ = read_pruned(spark, zpath, a_range=(10**9, 2 * 10**9))
    assert read == 0 and pruned.count() == 0


def test_z_values_survive_full_bigint_domain(spark):
    """The 100 TB overflow trap: a column spanning the BIGINT domain
    (nanosecond timestamps, hash values). The division-only scaling
    must produce in-range z-values with no overflow error."""
    big = 2**62
    df = spark.createDataFrame(
        [(0, -big, -big), (1, 0, 5), (2, big, big)], "id long, a long, b long"
    )
    rows = {r["id"]: r["z"] for r in z_values(df, "a", "b", bits=16).collect()}
    assert rows[0] == 0
    assert all(0 <= v < (1 << 32) for v in rows.values())
    assert rows[0] < rows[1] < rows[2]


def test_z_values_multi_matches_python_twin(spark):
    """3-column Morton parity against a pure-Python twin of the same
    scale+interleave arithmetic (floor of exact rationals)."""
    from sqlstreamstore_spark.sources.zorder import z_values_multi

    rows = [(i, i * 7 % 50, (i * 13) % 29 - 14, i * i % 101) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    bits = 8
    got = {r["id"]: r["z"] for r in z_values_multi(df, ["a", "b", "c"], bits).collect()}

    cols = list(zip(*rows))[1:]
    los = [min(c) for c in cols]
    his = [max(c) for c in cols]
    maxq = (1 << bits) - 1

    def scale(v, lo, hi):
        return 0 if hi == lo else ((v - lo) * maxq) // (hi - lo)

    for i, a, b, c in rows:
        qs = [scale(v, lo, hi) for v, lo, hi in zip((a, b, c), los, his)]
        z = 0
        for bit in range(bits):
            for j in range(3):
                z |= ((qs[j] >> bit) & 1) << (bit * 3 + j)
        assert got[i] == z, (i, got[i], z)


def test_z_values_multi_default_bits_fit_bigint(spark):
    """Default bits keep the z value inside a signed 64-bit long for
    2/3/4 columns, even at full-domain inputs."""
    from sqlstreamstore_spark.sources.zorder import z_values_multi

    big = 2**62
    df = spark.createDataFrame(
        [(0, -big, -big, -big, -big), (1, big, big, big, big)],
        "id long, a long, b long, c long, d long")
    for cols in (["a", "b"], ["a", "b", "c"], ["a", "b", "c", "d"]):
        vals = [r["z"] for r in z_values_multi(df, cols).collect()]
        assert all(0 <= v < 2**63 for v in vals), (cols, vals)
        assert vals[0] < vals[1] or vals[0] == 0


def test_pruning_exact_past_2_53(spark, tmp_path):
    """ADVICE r4: manifest stats must compare as INTs for integral
    columns. At 2^62 a double ULP is 512 — float() comparison would
    wrongly skip a boundary bucket whose true max is inside the query
    range, breaking the superset guarantee on exactly the wide-domain
    columns the wide-integer scaling targets."""
    base = 1 << 62
    rows = [(i, base + i * 7, i * 3) for i in range(64)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    zpath = str(tmp_path / "zwide")
    write_zordered(df, zpath, "a", "b", n_buckets=8)

    # query range starts 3 above a bucket-boundary value; float() of
    # the manifest max rounds DOWN across the range start
    lo, hi = base + 7 * 60 + 1, base + 7 * 63
    pred = (F.col("a") >= lo) & (F.col("a") <= hi)
    expect = sorted(r["k"] for r in df.filter(pred).collect())
    assert expect  # the planted rows exist
    pruned, read, total = read_pruned(spark, zpath, a_range=(lo, hi))
    got = sorted(r["k"] for r in pruned.filter(pred).collect())
    assert got == expect
    assert 0 < read < total


def test_pruning_with_null_rows_never_crashes_or_drops(spark, tmp_path):
    """Rows with a NULL z-input coalesce into bucket 0 (a NULL
    partition key would create the unaddressable Hive default
    directory); stats stay honest, and non-NULL values of SUCH rows
    remain reachable through the other column's range predicate."""
    rows = [(i, i * 10, i * 3) for i in range(40)] + [(100, None, 5), (101, 7, None)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    zpath = str(tmp_path / "znull")
    write_zordered(df, zpath, "a", "b", n_buckets=4)

    # the row with a=7 (NULL b) must be reachable via an a-range
    pred_a = F.col("a").between(5, 10)
    expect = sorted(r.k for r in df.filter(pred_a).collect())
    pruned, _read, _tot = read_pruned(spark, zpath, a_range=(5, 10))
    got = sorted(r.k for r in pruned.filter(pred_a).collect())
    assert got == expect and 101 in got

    # the row with b=5 (NULL a) must be reachable via a b-range
    pred_b = F.col("b").between(4, 6)
    expect = sorted(r.k for r in df.filter(pred_b).collect())
    pruned, _read, _tot = read_pruned(spark, zpath, b_range=(4, 6))
    got = sorted(r.k for r in pruned.filter(pred_b).collect())
    assert got == expect and 100 in got

    # and a selective range on clean data still prunes
    _p, read, total = read_pruned(spark, zpath, a_range=(300, 390))
    assert read < total
