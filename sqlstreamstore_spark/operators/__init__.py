from sqlstreamstore_spark.operators.positions import with_dense_global_index
from sqlstreamstore_spark.operators.log_view import events_to_log
from sqlstreamstore_spark.operators.read import (
    read_all_backwards_df,
    read_all_forwards_df,
    read_stream_backwards_df,
    read_stream_forwards_df,
)
from sqlstreamstore_spark.operators.heads import (
    head_position_df,
    stream_head_position_df,
    stream_head_version_df,
)
from sqlstreamstore_spark.operators.list_streams import list_streams_df
from sqlstreamstore_spark.operators.retention import (
    expiry_filter_df,
    scavenge_victims_df,
)

__all__ = [
    "with_dense_global_index",
    "events_to_log",
    "read_all_forwards_df",
    "read_all_backwards_df",
    "read_stream_forwards_df",
    "read_stream_backwards_df",
    "head_position_df",
    "stream_head_position_df",
    "stream_head_version_df",
    "list_streams_df",
    "expiry_filter_df",
    "scavenge_victims_df",
]
