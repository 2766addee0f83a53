from __future__ import annotations

import pytest

from sqlstreamstore_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con


@pytest.fixture(scope="session")
def events_log(spark):
    from sqlstreamstore_spark.operators.log_view import events_to_log
    from sqlstreamstore_spark.sources.tables import load_table

    log = events_to_log(load_table(spark, SF_DIR, "events")).cache()
    log.count()
    yield log


def assert_same_rows(sdf, duck_con, sql, sort=False):
    """Exact tuple-equality between a Spark DataFrame and a DuckDB query."""
    sp = [tuple(r) for r in sdf.collect()]
    dk = [tuple(r) for r in duck_con.execute(sql).fetchall()]
    if sort:
        sp, dk = sorted(sp), sorted(dk)
    assert sp == dk, f"spark={sp[:3]}... duck={dk[:3]}... (n={len(sp)}/{len(dk)})"
