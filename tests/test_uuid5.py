"""UUIDv5 column function parity with Python's stdlib uuid5.

This pins message_id fidelity for the events_log derivation
(FIXTURES.md §A.2) — the DuckDB build has no sha1() so this is the
oracle for that column.
"""

import uuid

from pyspark.sql import functions as F

from sqlstreamstore_spark.functions.uuid5 import NAMESPACE_DNS, uuid5_col, uuid5_py


def test_uuid5_matches_stdlib(spark):
    names = [str(i) for i in range(200)] + ["", "user-42", "héllo wörld", "$deleted"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {r["name"]: r["u"] for r in df.select("name", uuid5_col(F.col("name")).alias("u")).collect()}
    for n in names:
        assert got[n] == str(uuid.uuid5(NAMESPACE_DNS, n))


def test_uuid5_py_twin():
    assert uuid5_py("42") == str(uuid.uuid5(NAMESPACE_DNS, "42"))
