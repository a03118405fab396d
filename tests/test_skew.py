"""Skew tooling: exact two-phase distinct vs naive count_distinct, HLL
accuracy band, diagnoser output, and plan shapes."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataqualityassistant_spark.ops.skew import (
    diagnose_skew,
    hll_distinct_count,
    two_phase_distinct_count,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_two_phase_matches_naive(events):
    got = {(r["event_type"],): r["n_distinct"]
           for r in two_phase_distinct_count(events, "event_type", "user_id").collect()}
    want = {(r["event_type"],): r["n"]
            for r in events.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n")).collect()}
    assert got == want and len(got) >= 3


def test_two_phase_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", None), ("b", None)], "k string, v int")
    got = {r["k"]: r["n_distinct"] for r in two_phase_distinct_count(df, "k", "v").collect()}
    # SQL COUNT(DISTINCT): nulls don't count, but an all-NULL key keeps its
    # group with 0 — same rows as GROUP BY + COUNT(DISTINCT v)
    assert got == {"a": 1, "b": 0}


def test_hll_within_error_band(events):
    exact = {r["event_type"]: r["n"]
             for r in events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    approx = {r["event_type"]: r["n_distinct_approx"]
              for r in hll_distinct_count(events, "event_type", "user_id").collect()}
    for k, e in exact.items():
        assert abs(approx[k] - e) / max(e, 1) < 0.05, (k, e, approx[k])


def test_diagnose_skew(spark):
    rows = [("hot", i) for i in range(900)] + [(f"cold{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "domain string, x int")
    top = diagnose_skew(df, "domain", k=3).collect()
    assert top[0]["domain"] == "hot"
    assert top[0]["n"] == 900 and abs(top[0]["frac"] - 0.9) < 1e-9
    assert len(top) == 3


def test_two_phase_plan_spreads_hot_key(events):
    plan = (two_phase_distinct_count(events, "event_type", "user_id")
            ._jdf.queryExecution().executedPlan().toString())
    # first exchange keys on (event_type, user_id) — the spread — then on
    # event_type for the merge; no `distinct`-expression single aggregate
    lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(lines) == 2, plan
    assert all("event_type" in l for l in lines), lines
    # the deeper (dedupe) exchange spreads the hot key by including user_id
    assert any("user_id" in l for l in lines), lines


def test_hll_keeps_all_null_keys(spark):
    # exact/approx pair must agree on the all-NULL-key edge: hll_sketch_agg
    # ignores nulls itself, so no pre-filter — key "b" appears with 0
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", None)], "k string, v int")
    got = {r["k"]: r["n_distinct_approx"]
           for r in hll_distinct_count(df, "k", "v").collect()}
    assert got == {"a": 2, "b": 0}


def test_diagnose_skew_empty_input(spark):
    df = spark.createDataFrame([], "domain string, x int")
    assert diagnose_skew(df, "domain", k=3).collect() == []
