from dataqualityassistant_spark.streaming.checkpoint import CheckpointStore
from dataqualityassistant_spark.streaming.dedup import (
    make_near_dedup_processor,
    stream_dedup,
    stream_near_dedup,
)

__all__ = ["CheckpointStore", "make_near_dedup_processor", "stream_dedup",
           "stream_near_dedup"]
