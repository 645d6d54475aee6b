from beehive_spark.streaming.events import (
    dedup_event_stream,
    read_event_stream,
    run_stream_to_memory,
    running_user_stats,
    sessionized_events,
    windowed_event_counts,
)

__all__ = [
    "dedup_event_stream",
    "read_event_stream",
    "run_stream_to_memory",
    "running_user_stats",
    "sessionized_events",
    "windowed_event_counts",
]
