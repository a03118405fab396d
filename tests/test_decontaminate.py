"""Decontamination: shingling semantics, hit counting vs a plain-Python
reference, drop behavior, and the plan shape (broadcast probe, no corpus
shuffle before the match)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataqualityassistant_spark.ops.decontaminate import (
    contamination_hits,
    decontaminate,
    ngram_shingles,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a totally unrelated document about spark plans"),
        (3, "QUICK Brown FOX jumps over nothing here"),   # case-folded partial overlap
        (4, None),
        (5, "tiny doc"),                                   # fewer words than n
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",),
         ("some eval question nobody copied",)],
        "text string")


def _py_shingles(text, n):
    if text is None:
        return set()
    ws = [w for w in text.lower().split() if w]
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def test_shingles_match_python(spark, corpus):
    for n in (2, 3, 8, 50):
        got = {}
        for r in ngram_shingles(corpus, n).collect():
            got.setdefault(r["doc_id"], set()).add(r["shingle"])
        rows = {r["doc_id"]: r["text"] for r in corpus.collect()}
        for did, text in rows.items():
            assert got.get(did, set()) == _py_shingles(text, n), (n, did)


def test_hits_counted_distinct(spark, corpus, bench):
    got = {r["doc_id"]: r["n_hits"] for r in contamination_hits(corpus, bench, n=4).collect()}
    # independent reference count
    bset = set()
    for r in bench.collect():
        bset |= _py_shingles(r["text"], 4)
    want = {}
    for r in corpus.collect():
        k = len(_py_shingles(r["text"], 4) & bset)
        if k:
            want[r["doc_id"]] = k
    assert got == want
    assert 1 in got and 2 not in got and 3 in got


def test_decontaminate_drops_flagged(spark, corpus, bench):
    kept = {r["doc_id"] for r in decontaminate(corpus, bench, n=4).collect()}
    assert kept == {2, 4, 5}
    # min_hits above any overlap keeps everything
    all_ids = {r["doc_id"] for r in decontaminate(corpus, bench, n=4, min_hits=99).collect()}
    assert all_ids == {1, 2, 3, 4, 5}


def test_plan_broadcast_probe_no_corpus_shuffle(spark, corpus, bench):
    plan = contamination_hits(corpus, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # hashpartitioning exchanges exist only AFTER the match: the
    # count_distinct agg (up to 3 phases); the corpus scan side feeds the
    # broadcast join directly
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert plan.index("BroadcastHashJoin") > plan.index("Exchange hashpartitioning"), plan
    drop_plan = decontaminate(corpus, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in drop_plan and "LeftAnti" in drop_plan, drop_plan


def test_null_id_contaminated_docs_are_dropped(spark, bench):
    """NULL-id docs pool into one group; when the pooled hits cross
    min_hits every null-id doc is dropped (a plain anti-join never matches
    NULL keys, so they used to pass through silently)."""
    from dataqualityassistant_spark.ops.decontaminate import decontaminate

    bench_text = bench.select("text").first()["text"]
    rows = [(None, bench_text), (None, "totally clean words here okay"),
            (7, "other clean document full of safe words")]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    kept = decontaminate(docs, bench, n=8, min_hits=1)
    assert [r["doc_id"] for r in kept.collect()] == [7]
