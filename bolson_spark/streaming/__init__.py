from bolson_spark.streaming.sink import (
    BatchingOptions,
    IpcFileSink,
    KafkaSink,
    PublishSink,
    PulsarSink,
    SchemaMismatchError,
    make_sink,
)
from bolson_spark.streaming.monitor import (
    cardinality_estimates,
    cardinality_estimates_union,
    compact_monitor_state,
    frequency_estimates,
    quantile_estimates,
    run_stream_cardinality_monitor,
    run_stream_frequency_monitor,
    run_stream_histogram_monitor,
)
from bolson_spark.streaming.pipeline import run_stream_convert
from bolson_spark.streaming.stateful import (
    running_stats,
    running_stats_tws,
    sessionize_stream,
)

__all__ = [
    "cardinality_estimates",
    "cardinality_estimates_union",
    "compact_monitor_state",
    "frequency_estimates",
    "quantile_estimates",
    "run_stream_cardinality_monitor",
    "run_stream_frequency_monitor",
    "run_stream_histogram_monitor",
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
