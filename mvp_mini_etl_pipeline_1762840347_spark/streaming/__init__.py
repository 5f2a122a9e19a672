from .jobs import (  # noqa: F401
    stream_events,
    tumbling_counts_stream,
    session_counts_stream,
    dedup_stream,
    run_to_memory,
)
