from sqlstreamstore_spark.functions.uuid5 import uuid5_col, uuid5_py

__all__ = ["uuid5_col", "uuid5_py"]
