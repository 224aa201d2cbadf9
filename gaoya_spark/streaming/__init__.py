from gaoya_spark.streaming.stream_dedup import StreamingDedup

__all__ = ["StreamingDedup"]
