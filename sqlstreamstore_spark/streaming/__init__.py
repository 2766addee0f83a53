from sqlstreamstore_spark.streaming import windowed
from sqlstreamstore_spark.streaming.datasource import StreamStoreDataSource
from sqlstreamstore_spark.streaming.sink import store_sink
from sqlstreamstore_spark.streaming.subscriptions import (
    PollingNotifier,
    SubscriptionDroppedReason,
    subscribe_to_all,
    subscribe_to_stream,
)

__all__ = [
    "PollingNotifier",
    "StreamStoreDataSource",
    "SubscriptionDroppedReason",
    "subscribe_to_all",
    "store_sink",
    "subscribe_to_stream",
    "windowed",
]
