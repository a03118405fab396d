"""WET source: parse correctness, warcinfo/preamble dropping, and record
integrity when the file is read as MANY small splits (the scale property:
lineSep-delimited records must survive split boundaries)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataqualityassistant_spark.sources.wet_text import read_wet


def _record(url, ts, body):
    return (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"Content-Length: {len(body.encode())}\r\n"
        "\r\n"
        f"{body}\r\n\r\n"
    )


def _write_fixture(path, n):
    with open(path, "w", newline="") as f:
        f.write(
            "WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nsoftware: test\r\n\r\n")
        for i in range(n):
            body = f"document {i} body line one\nsecond line with {'x' * (i % 7)}"
            f.write(_record(f"https://example.com/p/{i}",
                            f"2024-01-0{(i % 9) + 1}T00:00:0{i % 10}Z", body))


def test_parse_and_drop_preamble(spark, tmp_path):
    p = str(tmp_path / "f.wet")
    _write_fixture(p, 5)
    rows = {r["url"]: r for r in read_wet(spark, p).collect()}
    assert len(rows) == 5  # warcinfo record dropped
    r0 = rows["https://example.com/p/0"]
    assert r0["text"] == "document 0 body line one\nsecond line with "
    assert r0["warc_ts"].isoformat().startswith("2024-01-01T00:00:00")
    r3 = rows["https://example.com/p/3"]
    assert r3["text"].endswith("second line with xxx")


def test_records_survive_many_splits(spark, tmp_path):
    p = str(tmp_path / "big.wet")
    _write_fixture(p, 500)
    whole = read_wet(spark, p).orderBy("url").collect()
    # force ~2KB splits: smaller than most records, so records routinely
    # cross split boundaries
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        df = read_wet(spark, p)
        assert df.rdd.getNumPartitions() > 10  # the split really happened
        split_rows = df.orderBy("url").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(split_rows) == 500
    assert split_rows == whole  # no lost, duplicated, or torn records
