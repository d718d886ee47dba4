from .windows import (  # noqa: F401
    run_streaming_query,
    sessionized_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
