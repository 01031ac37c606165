from bolson_spark.streaming.sink import IpcFileSink, SchemaMismatchError
from bolson_spark.streaming.pipeline import run_stream_convert
from bolson_spark.streaming.stateful import running_stats

__all__ = [
    "IpcFileSink",
    "SchemaMismatchError",
    "run_stream_convert",
    "running_stats",
]
