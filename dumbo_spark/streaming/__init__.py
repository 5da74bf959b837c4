from dumbo_spark.streaming.windows import (
    read_events_stream,
    sessionized_stream,
    tumbling_stream,
)

__all__ = ["read_events_stream", "tumbling_stream", "sessionized_stream"]
