from beehive_spark.streaming.events import (
    read_event_stream,
    windowed_event_counts,
    sessionized_events,
    run_stream_to_memory,
)

__all__ = [
    "read_event_stream",
    "windowed_event_counts",
    "sessionized_events",
    "run_stream_to_memory",
]
