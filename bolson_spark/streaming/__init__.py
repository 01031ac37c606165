from bolson_spark.streaming.sink import IpcFileSink, SchemaMismatchError
from bolson_spark.streaming.pipeline import run_stream_convert

__all__ = ["IpcFileSink", "SchemaMismatchError", "run_stream_convert"]
