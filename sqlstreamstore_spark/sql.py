"""SQL surface: query a stream store with plain ``spark.sql``.

The reference exposes its log only through the typed API (and SQL users
read the backing tables directly — `src/SqlStreamStore.MsSql/ScriptsV3/
Tables.sql` messages/streams). Being Spark-native we can do better:
``register_store_views`` publishes the live store as temp views, so any
SQL client of the session can join the event log against the rest of
the lakehouse without touching the Python API.

Views (default prefix ``sss``):
  <prefix>_messages — the live log (deletion/expiry-visible rows):
      stream_id, message_id, stream_version, position, created_utc,
      type, json_data, json_metadata
  <prefix>_streams  — per-stream heads (the reference's `streams` table
      analog, derived): stream_id, head_version, head_position,
      message_count
  <prefix>_heads    — single row: store head position

Views are lazy DataFrames over the store's current manifest: they see
data as-of registration; call again after writes (or pass
``refresh=True`` on a store handle that caches) to re-snapshot —
the same read-committed regime as ``log_df()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register_store_views(
    spark: SparkSession, store, prefix: str = "sss"
) -> dict[str, DataFrame]:
    """Publish the store as SQL temp views; returns {view_name: df}."""
    log = store.log_df()
    streams = (
        log.groupBy("stream_id").agg(
            F.max("stream_version").alias("head_version"),
            F.max("position").alias("head_position"),
            F.count("*").alias("message_count"),
        )
    )
    heads = log.agg(F.max("position").alias("head_position"))
    out = {
        f"{prefix}_messages": log,
        f"{prefix}_streams": streams,
        f"{prefix}_heads": heads,
    }
    for name, df in out.items():
        df.createOrReplaceTempView(name)
    return out


def register_tables(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Publish the fixture tables (region, nation, …, documents,
    embeddings) as temp views so the whole analytics surface is
    reachable from ``spark.sql`` — the DuckDB-oracle queries in
    ``__spark_entry__.oracle_sql()`` run as-is against these names."""
    from sqlstreamstore_spark.sources.tables import TABLES, load_table

    names = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)
        names.append(prefix + t)
    return names
