"""Streaming dedup (dropDuplicatesWithinWatermark): burst duplicates within
the horizon are dropped, the same key past the horizon is a fresh
observation, and state is keyed on the 8-byte content hash."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import event_ts as t, poll_until as _poll, write_stream_batch

from dataqualityassistant_spark.streaming.dedup import stream_dedup

_SCHEMA = "doc_id long, ts timestamp, text string"


def _write(spark, path, name, rows):
    write_stream_batch(spark, path, name, rows, _SCHEMA)


def test_stream_dedup_within_and_past_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: same text twice (burst dup) + one distinct
    _write(spark, src, "b1", [(1, t(0), "alpha page"),
                              (2, t(0, 30), "alpha page"),
                              (3, t(1), "beta page")])
    stream = (spark.readStream
              .schema("doc_id long, ts timestamp, text string")
              .parquet(src + "/*"))
    deduped = stream_dedup(stream, text_col="text", watermark="5 minutes")
    q = (deduped.writeStream.format("memory").queryName("dedup_sink")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        assert _poll(lambda: spark.table("dedup_sink").count() >= 2)
        ids = {r["doc_id"] for r in spark.table("dedup_sink").collect()}
        assert ids == {1, 3}  # first arrival of "alpha page" wins

        # batch 2: duplicate within the horizon -> dropped; new text kept
        _write(spark, src, "b2", [(4, t(2), "alpha page"),
                                  (5, t(2), "gamma page")])
        q.processAllAvailable()
        ids = {r["doc_id"] for r in spark.table("dedup_sink").collect()}
        assert ids == {1, 3, 5}

        # event time jumps far past the horizon: the SAME text becomes a
        # fresh observation again — the property that distinguishes
        # within-watermark dedup (bounded state) from global dropDuplicates
        # (unbounded state). NOTE the one-batch lag: the watermark only
        # advances AFTER a batch, so doc 6 (in the jump batch itself) is
        # still judged against the pre-jump watermark — old state alive —
        # and dropped; doc 7, in the NEXT batch, sees the expired state and
        # is emitted as a first arrival.
        _write(spark, src, "b3", [(6, t(30), "alpha page")])
        q.processAllAvailable()
        _write(spark, src, "b4", [(7, t(31), "alpha page")])
        q.processAllAvailable()
        assert _poll(lambda: spark.table("dedup_sink").count() >= 4)
        ids = {r["doc_id"] for r in spark.table("dedup_sink").collect()}
        assert 7 in ids and 6 not in ids
        assert ids == {1, 3, 5, 7}
    finally:
        q.stop()


def test_stream_dedup_on_key_columns(spark, tmp_path):
    src = str(tmp_path / "src2")
    os.makedirs(src)
    _write(spark, src, "b1", [(1, t(0), "x"), (1, t(0, 10), "y"), (2, t(1), "z")])
    stream = (spark.readStream
              .schema("doc_id long, ts timestamp, text string")
              .parquet(src + "/*"))
    deduped = stream_dedup(stream, cols=["doc_id"], watermark="10 minutes")
    q = (deduped.writeStream.format("memory").queryName("dedup_sink2")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        assert _poll(lambda: spark.table("dedup_sink2").count() >= 2)
        rows = {r["doc_id"]: r["text"] for r in spark.table("dedup_sink2").collect()}
        assert set(rows) == {1, 2} and rows[1] == "x"  # first arrival kept
    finally:
        q.stop()


def test_stream_dedup_arg_validation(spark):
    df = spark.createDataFrame([], "doc_id long, ts timestamp, text string")
    with pytest.raises(ValueError, match="exactly one"):
        stream_dedup(df)
    with pytest.raises(ValueError, match="exactly one"):
        stream_dedup(df, cols=["doc_id"], text_col="text")


def test_stream_dedup_rejects_dedup_key_collision(spark):
    df = spark.createDataFrame([], "doc_id long, ts timestamp, text string") \
        .withColumnRenamed("doc_id", "__dedup_key")
    with pytest.raises(ValueError, match="__dedup_key"):
        stream_dedup(df, text_col="text")
