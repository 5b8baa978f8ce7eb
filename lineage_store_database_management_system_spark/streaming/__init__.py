from .stream_ops import (
    normalize_event_time,
    read_events_stream,
    replicate_stream,
    run_stream_once,
    stream_ingest_lineage,
    stream_ingest_with_expectations,
    stream_maintain_join_mv,
    streaming_dedup,
    streaming_event_join,
    streaming_sessionize,
    streaming_tumbling_agg,
)

__all__ = [
    "normalize_event_time",
    "read_events_stream",
    "replicate_stream",
    "run_stream_once",
    "stream_ingest_lineage",
    "stream_ingest_with_expectations",
    "stream_maintain_join_mv",
    "streaming_dedup",
    "streaming_event_join",
    "streaming_sessionize",
    "streaming_tumbling_agg",
]
