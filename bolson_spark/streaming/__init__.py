from bolson_spark.streaming.sink import (
    BatchingOptions,
    IpcFileSink,
    KafkaSink,
    PublishSink,
    PulsarSink,
    SchemaMismatchError,
    make_sink,
)
from bolson_spark.streaming.pipeline import run_stream_convert
from bolson_spark.streaming.stateful import (
    running_stats,
    running_stats_tws,
    sessionize_stream,
)

__all__ = [
    "BatchingOptions",
    "IpcFileSink",
    "KafkaSink",
    "PublishSink",
    "PulsarSink",
    "SchemaMismatchError",
    "make_sink",
    "run_stream_convert",
    "running_stats",
    "running_stats_tws",
    "sessionize_stream",
]
