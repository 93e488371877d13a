from meds_transforms_spark.streaming.events import (
    read_event_stream,
    windowed_code_counts,
    stream_to_meds_sink,
)

__all__ = ["read_event_stream", "windowed_code_counts", "stream_to_meds_sink"]
