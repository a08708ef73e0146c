from clickhouse_flatfile_tool_spark.streaming.stream_ops import (
    read_event_stream,
    windowed_counts,
    sessionized,
    dedup_within_watermark,
    run_available_now,
)

__all__ = [
    "read_event_stream",
    "windowed_counts",
    "sessionized",
    "dedup_within_watermark",
    "run_available_now",
]
