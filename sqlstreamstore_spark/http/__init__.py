from sqlstreamstore_spark.http.client import HttpClientStreamStore
from sqlstreamstore_spark.http.server import StreamStoreHttpServer

__all__ = ["HttpClientStreamStore", "StreamStoreHttpServer"]
