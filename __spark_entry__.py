"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries are thin wrappers over sqlstreamstore_spark operators —
see SURVEY.md §2 for the operator inventory and the file:line
citations into /root/reference.

Note on message_id: the canonical events_log derives
``message_id = uuid5(DNS, str(event_id))`` (FIXTURES.md §A.2). The
DuckDB build in this container has no ``sha1()``, so the oracle SQL
cannot express UUIDv5; the Q-* projections therefore exclude
message_id (its correctness is pinned by tests/test_uuid5.py and
tests/test_log_view.py against Python's stdlib uuid5 instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sqlstreamstore_spark.entrypoints import (
    build_oracle_sql,
    build_queries,
    flagship_query,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    return build_oracle_sql()
