from .stream_ops import (
    EVENTS_SCHEMA,
    read_events_stream,
    run_stream_once,
    streaming_sessionize,
    streaming_tumbling_agg,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "run_stream_once",
    "streaming_sessionize",
    "streaming_tumbling_agg",
]
