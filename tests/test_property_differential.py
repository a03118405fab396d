"""Property-based differential testing: random small frames × random
expectation configs must produce identical metrics from the Spark engine and
the in-repo pandas oracle (the reference's semantics). Catches boundary
cases hand-written tests miss (all-null columns, empty value sets, negative
bounds, mostly extremes)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataqualityassistant_spark import Rule, run_suite
from dataqualityassistant_spark.oracle import oracle_expectation

values_s = st.lists(
    st.one_of(st.none(), st.sampled_from(["a", "b", "aa", "zz", "x1", ""])),
    min_size=0, max_size=12,
)
values_n = st.lists(
    st.one_of(st.none(), st.integers(min_value=-5, max_value=10).map(float)),
    min_size=0, max_size=12,
)
mostly_s = st.sampled_from([None, 0.0, 0.25, 0.5, 0.75, 1.0])


def expectation_strategy():
    return st.one_of(
        st.builds(lambda m: ("expect_column_values_to_not_be_null",
                             {"column": "s", **({"mostly": m} if m is not None else {})}),
                  mostly_s),
        st.builds(lambda vs, m: ("expect_column_values_to_be_in_set",
                                 {"column": "s", "value_set": vs,
                                  **({"mostly": m} if m is not None else {})}),
                  st.lists(st.sampled_from(["a", "b", "zz"]), max_size=3), mostly_s),
        st.builds(lambda lo, hi, m: ("expect_column_values_to_be_between",
                                     {"column": "v",
                                      **({"min_value": lo} if lo is not None else {}),
                                      **({"max_value": hi} if hi is not None else {}),
                                      **({"mostly": m} if m is not None else {})}),
                  st.one_of(st.none(), st.integers(-3, 3).map(float)),
                  st.one_of(st.none(), st.integers(-3, 8).map(float)), mostly_s),
        st.builds(lambda rx, m: ("expect_column_values_to_match_regex",
                                 {"column": "s", "regex": rx,
                                  **({"mostly": m} if m is not None else {})}),
                  st.sampled_from(["a", "a+", "[ab]", "z{2}", "^$", ".1"]), mostly_s),
        st.builds(lambda col: ("expect_column_values_to_be_unique", {"column": col}),
                  st.sampled_from(["s", "v"])),
    )


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(s_vals=values_s, v_vals=values_n, exp=expectation_strategy())
def test_engine_matches_oracle(spark, s_vals, v_vals, exp):
    n = max(len(s_vals), len(v_vals))
    s_vals = (s_vals + [None] * n)[:n]
    v_vals = (v_vals + [None] * n)[:n]
    pdf = pd.DataFrame({"s": pd.Series(s_vals, dtype=object),
                        "v": pd.Series(v_vals, dtype=float)})
    sdf = spark.createDataFrame(
        list(zip(s_vals, v_vals)) if n else [], "s: string, v: double")

    etype, kwargs = exp
    want = oracle_expectation(pdf, etype, kwargs)
    suite = run_suite(sdf, [Rule(id=1, name="p", rule_config=[
        {"expectation_type": etype, "kwargs": kwargs}])], collect_samples=False)
    got = suite["results"][0]["results"][0]

    assert got["result"]["unexpected_count"] == want["unexpected_count"], (etype, kwargs, s_vals, v_vals)
    assert got["result"]["unexpected_percent"] == pytest.approx(want["unexpected_percent"])
    assert got["success"] == want["success"]


# ------------------------------------------------------- cluster closure

edges_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=40,
)


def _union_find_components(edges):
    """Independent pure-Python oracle: classic union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_dedup_clusters_match_union_find(spark, edges):
    """dedup_clusters (iterative Spark min-label propagation) must equal a
    union-find computed independently on the same random edge list —
    including self-loops, duplicate edges, reversed duplicates, chains."""
    from dataqualityassistant_spark.ops.dedup import dedup_clusters

    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    want = _union_find_components(edges)
    assert got == want
