from bolson_spark.sources.readers import (
    read_csv_with_schema,
    read_json_lines,
    read_json_lines_stream,
    read_kafka_stream,
    read_parquet_table,
    read_socket_stream,
)

__all__ = [
    "read_json_lines",
    "read_json_lines_stream",
    "read_kafka_stream",
    "read_socket_stream",
    "read_csv_with_schema",
    "read_parquet_table",
]
