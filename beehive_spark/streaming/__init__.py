from beehive_spark.streaming.events import (
    correlate_streams,
    dedup_event_stream,
    enrich_stream,
    holt_forecast_stream,
    read_event_stream,
    run_stream_to_memory,
    run_topk_foreachbatch,
    running_user_stats,
    sessionized_events,
    top_event_types,
    user_value_extremes,
    windowed_event_counts,
)

__all__ = [
    "correlate_streams",
    "dedup_event_stream",
    "enrich_stream",
    "holt_forecast_stream",
    "read_event_stream",
    "run_stream_to_memory",
    "run_topk_foreachbatch",
    "running_user_stats",
    "sessionized_events",
    "top_event_types",
    "user_value_extremes",
    "windowed_event_counts",
]
