"""Watermarked windowed aggregation: batch/DuckDB-checked bucketing is in
the entry contract (`events_windowed`); here the STREAMING semantics —
append-mode window finalization and too-late-row dropping — are driven
through a file-source stream."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import event_ts as t, poll_until as _poll, write_stream_batch

from pyspark.sql import functions as F

from dataqualityassistant_spark.streaming.windowed import windowed_counts


def _write(spark, path, name, rows):
    write_stream_batch(spark, path, name, rows, "ts timestamp, value double")


def test_append_mode_finalization_and_late_drop(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(spark, src, "b1", [(t(0, 1), 1.0), (t(1), 3.0), (t(12), 5.0)])

    stream = spark.readStream.schema("ts timestamp, value double").parquet(src + "/*")
    agg = windowed_counts(stream, window="5 minutes", watermark="5 minutes",
                          keys=[], value_col="value")
    q = (agg.writeStream.format("memory").queryName("win_sink")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # max ts 00:12 -> watermark 00:07 -> [00:00,00:05) finalized
        assert _poll(lambda: spark.table("win_sink").count() >= 1)
        first = spark.table("win_sink").collect()
        assert len(first) == 1
        assert first[0]["window_start"] == t(0) and first[0]["n"] == 2
        assert first[0]["avg_value"] == 2.0

        # a row at 00:02 is behind the watermark: DROPPED, the closed
        # window must not change; 00:13 lands in the open [00:10,00:15)
        _write(spark, src, "b2", [(t(2), 99.0), (t(13), 7.0)])
        q.processAllAvailable()
        dropped = sum(
            op["numRowsDroppedByWatermark"]
            for p in q.recentProgress for op in p["stateOperators"])
        assert spark.table("win_sink").count() == 1  # nothing new finalized
        assert dropped >= 1, [p["stateOperators"] for p in q.recentProgress]

        # advancing event time past 00:20 finalizes [00:10,00:15) with BOTH
        # on-time rows and WITHOUT the late 99.0
        _write(spark, src, "b3", [(t(25), 0.0)])
        q.processAllAvailable()
        assert _poll(lambda: spark.table("win_sink").count() >= 2)
        rows = {r["window_start"]: r for r in spark.table("win_sink").collect()}
        assert rows[t(10)]["n"] == 2 and rows[t(10)]["avg_value"] == 6.0
        assert rows[t(0)]["n"] == 2  # unchanged by the late row
    finally:
        q.stop()
