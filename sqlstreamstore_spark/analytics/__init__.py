"""Analytics layer (SURVEY.md §7.2 M8): TPC-H-style relational queries,
event-log analytics, and LLM-data-pipeline operators (dedup, similarity
search, text analysis) — all Spark-first DataFrame expressions designed
for 100 TB scale (no driver-side materialization, broadcast-able dims,
partial aggregation everywhere)."""
