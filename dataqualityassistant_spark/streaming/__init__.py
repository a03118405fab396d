from dataqualityassistant_spark.streaming.checkpoint import CheckpointStore

__all__ = ["CheckpointStore"]
