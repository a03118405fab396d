"""as-of join: hand-computed semantics, pandas.merge_asof differential,
and the plan shape (ONE hash exchange, zero join operators)."""

import datetime as dt
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataqualityassistant_spark.ops.joins import asof_join


def ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "a"), (1, ts(20), "b"), (1, ts(5), "c"),
         (2, ts(10), "d"),            # key with no right rows at all
         (1, None, "e")],             # null left ts -> never matches
        "k int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, ts(10), 100.0), (1, ts(15), 150.0), (3, ts(1), 999.0),
         (1, None, -1.0)],            # null right ts -> never matches
        "k int, ts timestamp, val double")
    return left, right


def _rows(df):
    return {r["tag"]: r for r in df.collect()}


def test_backward_inclusive(sides):
    left, right = sides
    out = _rows(asof_join(left, right, on="k"))
    assert out["a"]["val"] == 100.0 and out["a"]["ts_right"] == ts(10)  # exact match allowed
    assert out["b"]["val"] == 150.0
    assert out["c"]["val"] is None                                      # nothing at/before 5
    assert out["d"]["val"] is None                                      # no right rows for key
    assert out["e"]["val"] is None                                      # null left ts


def test_backward_exclusive(sides):
    left, right = sides
    out = _rows(asof_join(left, right, on="k", allow_exact_matches=False))
    assert out["a"]["val"] is None      # the equal-ts right row is excluded, none earlier


def test_tolerance(sides):
    left, right = sides
    out = _rows(asof_join(left, right, on="k", tolerance=4.0))
    assert out["a"]["val"] == 100.0     # gap 0 <= 4
    assert out["b"]["val"] is None      # gap 5 > 4


def test_forward(sides):
    left, right = sides
    out = _rows(asof_join(left, right, on="k", direction="forward"))
    assert out["a"]["val"] == 100.0     # inclusive exact
    assert out["c"]["val"] == 100.0     # next at 10
    assert out["b"]["val"] is None      # nothing at/after 20


def test_differential_vs_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    base = pd.Timestamp("2024-01-01")
    lpd = pd.DataFrame({
        "k": rng.integers(0, 8, n_l),
        "ts": base + pd.to_timedelta(rng.integers(0, 100_000, n_l), unit="s"),
        "lid": np.arange(n_l),
    })
    # unique (k, ts) on the right => deterministic winner on both engines
    rpd = pd.DataFrame({
        "k": rng.integers(0, 8, n_r),
        "ts": base + pd.to_timedelta(rng.integers(0, 100_000, n_r), unit="s"),
        "val": rng.normal(size=n_r).round(3),
    }).drop_duplicates(["k", "ts"])
    for direction, tol in [("backward", None), ("forward", None), ("backward", 500.0)]:
        want = pd.merge_asof(
            lpd.sort_values("ts"), rpd.sort_values("ts"), on="ts", by="k",
            direction=direction,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        ).sort_values("lid").reset_index(drop=True)
        got = (
            asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                      on="k", direction=direction, tolerance=tol)
            .orderBy("lid").toPandas()
        )
        pd.testing.assert_series_equal(
            got["val"], want["val"], check_names=False, obj=f"{direction}/tol={tol}")


def test_null_keys_never_match(spark):
    left = spark.createDataFrame([(None, ts(10), "L")], "k int, ts timestamp, tag string")
    right = spark.createDataFrame([(None, ts(5), 1.0), (1, ts(5), 2.0)],
                                  "k int, ts timestamp, val double")
    out = asof_join(left, right, on="k").collect()
    assert len(out) == 1 and out[0]["val"] is None  # SQL equality: NULL != NULL


def test_plan_one_exchange_no_join(spark, sides):
    left, right = sides
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, plan


def test_multi_key_asof(spark):
    left = spark.createDataFrame(
        [(1, "a", ts(10), 100), (1, "b", ts(10), 101), (2, "a", ts(10), 102)],
        "k1 int, k2 string, ts timestamp, lid int")
    right = spark.createDataFrame(
        [(1, "a", ts(5), 1.0), (1, "b", ts(7), 2.0), (2, "b", ts(1), 3.0)],
        "k1 int, k2 string, ts timestamp, val double")
    got = {r["lid"]: r["val"] for r in
           asof_join(left, right, on=["k1", "k2"]).collect()}
    assert got == {100: 1.0, 101: 2.0, 102: None}


def test_duplicate_left_timestamps_each_match(spark):
    # several left rows at the SAME (key, ts) must all receive the match
    left = spark.createDataFrame(
        [(1, ts(10), i) for i in range(4)], "k int, ts timestamp, lid int")
    right = spark.createDataFrame([(1, ts(9), 7.5)], "k int, ts timestamp, val double")
    got = [r["val"] for r in asof_join(left, right, on="k").collect()]
    assert got == [7.5] * 4


def test_fuzz_vs_merge_asof_with_nulls(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(23)
    base = pd.Timestamp("2024-06-01")
    lpd = pd.DataFrame({
        "k": rng.integers(0, 5, 300),
        "ts": base + pd.to_timedelta(rng.integers(0, 50_000, 300), unit="s"),
        "lid": np.arange(300),
    })
    # null-ts left rows ride along; they must come back unmatched
    lpd.loc[lpd.index[:15], "ts"] = pd.NaT
    rpd = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "ts": base + pd.to_timedelta(rng.integers(0, 50_000, 200), unit="s"),
        "val": rng.normal(size=200).round(3),
    }).drop_duplicates(["k", "ts"])
    got = (asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd), on="k")
           .orderBy("lid").toPandas())
    assert got.loc[got["ts"].isna(), "val"].isna().all()
    valid = lpd[lpd["ts"].notna()]
    want = pd.merge_asof(valid.sort_values("ts"), rpd.sort_values("ts"),
                         on="ts", by="k").sort_values("lid").reset_index(drop=True)
    got_valid = got[got["ts"].notna()].reset_index(drop=True)
    pd.testing.assert_series_equal(got_valid["val"], want["val"], check_names=False)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lrows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=1, max_size=60),
    rrows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=1, max_size=40),
    direction=st.sampled_from(["backward", "forward"]),
)
def test_hypothesis_differential_vs_merge_asof(spark, lrows, rrows, direction):
    base = pd.Timestamp("2024-03-01")
    lpd = pd.DataFrame({
        "k": [k for k, _ in lrows],
        "ts": [base + pd.Timedelta(seconds=s) for _, s in lrows],
        "lid": range(len(lrows)),
    })
    rpd = pd.DataFrame({
        "k": [k for k, _ in rrows],
        "ts": [base + pd.Timedelta(seconds=s) for _, s in rrows],
        "val": [float(i) for i in range(len(rrows))],
    }).drop_duplicates(["k", "ts"])  # unique (k, ts) => deterministic winner
    want = pd.merge_asof(lpd.sort_values(["ts", "lid"]), rpd.sort_values("ts"),
                         on="ts", by="k", direction=direction
                         ).sort_values("lid").reset_index(drop=True)
    got = (asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                     on="k", direction=direction)
           .orderBy("lid").toPandas())
    pd.testing.assert_series_equal(got["val"], want["val"], check_names=False)


# ------------------------------------------- hot-key bucketed variant (r4)

def test_bucketed_matches_unbucketed(spark):
    """bucket_seconds must not change RESULTS — random data with null
    timestamps, both directions, inclusive and exclusive, bucket width equal
    to and larger than the tolerance."""
    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    lpd = pd.DataFrame({
        "k": rng.integers(0, 3, 300),
        "ts": [base + pd.Timedelta(seconds=float(s)) if s > 5 else pd.NaT
               for s in rng.uniform(0, 3600, 300)],
        "lid": np.arange(300),
    })
    rpd = pd.DataFrame({
        "k": rng.integers(0, 3, 200),
        "ts": [base + pd.Timedelta(seconds=float(s)) if s > 5 else pd.NaT
               for s in rng.uniform(0, 3600, 200)],
        "val": rng.normal(size=200).round(3),
    })
    l = spark.createDataFrame(lpd)
    r = spark.createDataFrame(rpd)
    # tolerance legs: bounded within-bucket (neighbour replication) AND
    # None / wider-than-bucket (the two-pass carry variant — r4 verdict #7)
    for direction in ("backward", "forward"):
        for exact in (True, False):
            for tol, bw in ((60.0, 60.0), (60.0, 245.0),
                            (None, 60.0), (240.0, 60.0)):
                plain = asof_join(l, r, on="k", direction=direction,
                                  allow_exact_matches=exact, tolerance=tol)
                bucketed = asof_join(l, r, on="k", direction=direction,
                                     allow_exact_matches=exact, tolerance=tol,
                                     bucket_seconds=bw)
                a = {row["lid"]: (row["val"], row["ts_right"]) for row in plain.collect()}
                b = {row["lid"]: (row["val"], row["ts_right"]) for row in bucketed.collect()}
                assert a == b, (direction, exact, tol, bw)


def test_bucketed_spreads_hot_key(spark):
    """VERDICT r3 #4: one hot key must NOT serialize into a single window
    partition. With bucket_seconds the shuffle keys on (k, __asof_bucket) —
    asserted in the executed plan — and the hot key's rows land in many
    buckets."""
    base = pd.Timestamp("2024-01-01")
    # one key, 5000 left rows over ~83 minutes
    lpd = pd.DataFrame({
        "k": np.zeros(5000, dtype=np.int64),
        "ts": [base + pd.Timedelta(seconds=i) for i in range(5000)],
        "lid": np.arange(5000),
    })
    rpd = pd.DataFrame({
        "k": np.zeros(500, dtype=np.int64),
        "ts": [base + pd.Timedelta(seconds=10 * i) for i in range(500)],
        "val": np.arange(500, dtype=np.float64),
    })
    l = spark.createDataFrame(lpd)
    r = spark.createDataFrame(rpd)
    out = asof_join(l, r, on="k", tolerance=30.0, bucket_seconds=30.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert exchanges and all("__asof_bucket" in ln for ln in exchanges), plan
    # the hot key's work is split across many (k, bucket) partitions
    n_buckets = (l.select(F.floor(F.col("ts").cast("timestamp_ltz").cast("double") / 30.0))
                 .distinct().count())
    assert n_buckets > 100
    # and results are right: every left row >= 10s in matches its floor-10s
    # right row (gap <= 30), spot-check totals against the unbucketed plan
    want = asof_join(l, r, on="k", tolerance=30.0)
    assert (out.where(F.col("val").isNotNull()).count()
            == want.where(F.col("val").isNotNull()).count())


def test_carry_variant_spreads_hot_key_without_tolerance(spark):
    """r4 verdict #7 (stretch): bucket_seconds WITHOUT a tolerance — a hot
    key still spreads over (k, bucket) partitions via the two-pass carry,
    and matches reach arbitrarily far back (a match many buckets earlier
    must be carried across the empty gap)."""
    base = pd.Timestamp("2024-01-01")
    # one hot key; right rows only in the first 100 seconds, left rows over
    # ~80 minutes -> most left buckets rely on the carried candidate
    lpd = pd.DataFrame({
        "k": np.zeros(4800, dtype=np.int64),
        "ts": [base + pd.Timedelta(seconds=i) for i in range(4800)],
        "lid": np.arange(4800),
    })
    rpd = pd.DataFrame({
        "k": np.zeros(10, dtype=np.int64),
        "ts": [base + pd.Timedelta(seconds=10 * i) for i in range(10)],
        "val": np.arange(10, dtype=np.float64),
    })
    l = spark.createDataFrame(lpd)
    r = spark.createDataFrame(rpd)
    out = asof_join(l, r, on="k", bucket_seconds=30.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the big window still shuffles on (k, __asof_bucket); the carry pass
    # adds one keys-only exchange over the aggregated per-bucket relation
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert any("__asof_bucket" in ln for ln in exchanges), plan
    got = {row["lid"]: row["val"] for row in out.collect()}
    want = {row["lid"]: row["val"]
            for row in asof_join(l, r, on="k").collect()}
    assert got == want
    # every left row from t>=90s carries the LAST right row across the gap
    assert got[4700] == 9.0 and got[0] == 0.0 and got[95] == 9.0
