from dataqualityassistant_spark.streaming.checkpoint import CheckpointStore
from dataqualityassistant_spark.streaming.dedup import stream_dedup

__all__ = ["CheckpointStore", "stream_dedup"]
