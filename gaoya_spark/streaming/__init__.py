from gaoya_spark.streaming.stream_dedup import StreamingDedup
from gaoya_spark.streaming.stateful import first_seen_stream

__all__ = ["StreamingDedup", "first_seen_stream"]
