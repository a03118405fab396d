"""JSONL source: corrupt-record policies, good/bad split, schema required."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py4j.protocol import Py4JJavaError

from dataqualityassistant_spark.sources.jsonl import read_jsonl, split_corrupt

SCHEMA = "doc_id LONG, text STRING, lang STRING"


@pytest.fixture()
def path(tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en"}',
        'this is not json at all',
        '{"doc_id": 2, "text": "zweite zeile", "lang": "de"}',
        '{"doc_id": 3, "text": "truncat',
        '{"doc_id": 4, "text": null, "lang": "fr"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_permissive_split(spark, path):
    df = read_jsonl(spark, path, SCHEMA)
    good, bad = split_corrupt(df)
    assert {r["doc_id"] for r in good.collect()} == {1, 2, 4}
    assert good.columns == ["doc_id", "text", "lang"]
    quarantined = [r[0] for r in bad.collect()]
    assert len(quarantined) == 2 and "not json" in quarantined[0]
    df.unpersist()


def test_dropmalformed(spark, path):
    df = read_jsonl(spark, path, SCHEMA, mode="dropmalformed")
    assert {r["doc_id"] for r in df.collect()} == {1, 2, 4}
    assert "_corrupt_record" not in df.columns


def test_failfast_raises(spark, path):
    with pytest.raises(Py4JJavaError):
        read_jsonl(spark, path, SCHEMA, mode="failfast").collect()


def test_bad_mode_rejected(spark, path):
    with pytest.raises(ValueError):
        read_jsonl(spark, path, SCHEMA, mode="lenient")
