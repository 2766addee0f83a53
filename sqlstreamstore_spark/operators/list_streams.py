"""ListStreams with prefix/suffix patterns + keyset pagination
(SURVEY.md §2.1 #13; IReadonlyStreamStore.cs:276-303, Pattern.cs:5-38,
Pg ListStreams*.sql).

One distributed aggregate: groupBy(stream_id).min(position) — partial
aggregation map-side, then an order-by-limit (TakeOrderedAndProject).
The reference's REVERSE-index trick for EndsWith (ListStreamsEndingWith
.sql:14) is unnecessary: Parquet has no b-tree to exploit, a predicate
on `endswith` is evaluated in the same codegen'd scan either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlstreamstore_spark.schema import SYSTEM_PREFIX


def list_streams_df(
    log: DataFrame,
    pattern: str | None = None,
    pattern_kind: str = "startswith",  # "any" | "startswith" | "endswith"
    max_count: int = 100,
    continuation_position: int = -1,
) -> DataFrame:
    """Distinct stream ids ordered by first appearance (creation order),
    `$`-streams excluded, keyset continuation on first_pos.

    Oracle: SELECT stream_id, min(position) AS first_pos FROM events_log
            WHERE stream_id LIKE '{p}%' AND stream_id NOT LIKE '$%'
              AND ... first_pos > {token}
            GROUP BY stream_id ORDER BY first_pos LIMIT {n}
    """
    df = log.filter(~F.col("stream_id").startswith(SYSTEM_PREFIX))
    if pattern and pattern_kind == "startswith":
        df = df.filter(F.col("stream_id").startswith(pattern))
    elif pattern and pattern_kind == "endswith":
        df = df.filter(F.col("stream_id").endswith(pattern))
    grouped = df.groupBy("stream_id").agg(F.min("position").alias("first_pos"))
    if continuation_position >= 0:
        grouped = grouped.filter(F.col("first_pos") > F.lit(int(continuation_position)))
    return grouped.orderBy("first_pos").limit(int(max_count))
