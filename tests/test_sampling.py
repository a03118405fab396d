"""Deterministic hash sampling: stability under repartitioning, nesting,
stratified rates, the pure-Python XXH64 differential, and a no-shuffle plan."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataqualityassistant_spark.ops.sampling import (
    SCALE,
    hash_sample,
    sample_bucket,
    stratified_hash_sample,
    train_holdout_split,
    xxhash64_long,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 10_000).withColumnRenamed("id", "doc_id")


def kept(df):
    return {r[0] for r in df.select("doc_id").collect()}


def test_stable_under_repartitioning(ids):
    a = kept(hash_sample(ids, 0.2))
    b = kept(hash_sample(ids.repartition(13, "doc_id"), 0.2))
    c = kept(hash_sample(ids.orderBy(F.desc("doc_id")).coalesce(1), 0.2))
    assert a == b == c and 0.18 < len(a) / 10_000 < 0.22


def test_nested_fractions(ids):
    assert kept(hash_sample(ids, 0.05)) <= kept(hash_sample(ids, 0.2))


def test_salts_give_different_draws(ids):
    a, b = kept(hash_sample(ids, 0.5, salt=1)), kept(hash_sample(ids, 0.5, salt=2))
    overlap = len(a & b) / 10_000
    assert a != b and 0.2 < overlap < 0.3  # independent draws overlap ~ f^2 = 0.25


def test_stratified_rates(spark):
    rows = [(i, ["en", "de", "xx"][i % 3]) for i in range(9_000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = (
        stratified_hash_sample(df, {"en": 0.5, "de": 0.1}, default_fraction=0.0)
        .groupBy("lang").count().collect()
    )
    by_lang = {r["lang"]: r["count"] for r in out}
    assert 0.45 < by_lang["en"] / 3000 < 0.55
    assert 0.07 < by_lang["de"] / 3000 < 0.13
    assert "xx" not in by_lang  # unknown stratum -> default 0


def test_stratified_null_stratum_uses_default(spark):
    df = spark.createDataFrame([(i, None) for i in range(1000)], "doc_id long, lang string")
    n = stratified_hash_sample(df, {"en": 1.0}, default_fraction=1.0).count()
    assert n == 1000
    assert stratified_hash_sample(df, {"en": 1.0}, default_fraction=0.0).count() == 0


def test_holdout_split_stable_and_disjoint(ids):
    out = train_holdout_split(ids, holdout=0.1)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert counts["holdout"] + counts["train"] == 10_000
    assert 0.08 < counts["holdout"] / 10_000 < 0.12
    # appending rows never migrates an existing doc between splits
    grown = train_holdout_split(ids.unionByName(
        ids.select((F.col("doc_id") + 50_000).alias("doc_id"))), holdout=0.1)
    old = {r["doc_id"]: r["split"] for r in out.collect()}
    new = {r["doc_id"]: r["split"] for r in grown.where(F.col("doc_id") < 10_000).collect()}
    assert old == new


def test_python_replica_matches_jvm(spark):
    rng = np.random.default_rng(3)
    vals = [int(v) for v in rng.integers(-(2**62), 2**62, 200)]
    df = spark.createDataFrame([(v,) for v in vals], "doc_id long")
    got = {
        r["doc_id"]: (r["h"], r["b"])
        for r in df.select(
            "doc_id",
            F.xxhash64(F.col("doc_id")).alias("h"),
            F.pmod(F.xxhash64("doc_id", F.lit(42).cast("long")), F.lit(SCALE)).alias("b"),
        ).collect()
    }
    for v in vals:
        assert got[v] == (xxhash64_long(v), sample_bucket(v))


def test_plan_is_a_pure_filter(ids):
    plan = hash_sample(ids, 0.3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan


def test_mix_rates_arithmetic():
    from dataqualityassistant_spark.ops.sampling import mix_rates

    # en is binding (1000/0.5=2000 < 9000/0.3=30000): kept in full
    rates = mix_rates({"en": 1000, "de": 9000, "fr": 4000},
                      {"en": 0.5, "de": 0.3, "fr": 0.2})
    assert rates["en"] == 1.0
    assert abs(rates["de"] - 2000 * 0.3 / 9000) < 1e-12
    assert abs(rates["fr"] - 2000 * 0.2 / 4000) < 1e-12
    # weight for a missing/empty stratum -> 0; zero weight -> 0
    assert mix_rates({"en": 10}, {"en": 1.0, "xx": 0.0}) == {"en": 1.0, "xx": 0.0}
    assert mix_rates({}, {"en": 1.0}) == {"en": 0.0}


def test_mix_corpus_rebalances(spark):
    rows = ([(i, "en") for i in range(800)] + [(1000 + i, "de") for i in range(3200)]
            + [(9000 + i, "xx") for i in range(500)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    from dataqualityassistant_spark.ops.sampling import mix_corpus

    out = mix_corpus(df, {"en": 0.5, "de": 0.5})
    by_lang = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert "xx" not in by_lang                       # unweighted stratum dropped
    assert by_lang["en"] == 800                      # binding stratum intact
    assert abs(by_lang["de"] - 800) < 800 * 0.15     # downsampled to parity
    # deterministic: same input -> identical rows
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in mix_corpus(df.repartition(7), {"en": 0.5, "de": 0.5}).collect()}
    assert a == b


def test_mix_rates_partial_missing_stratum_raises():
    """A positively-weighted stratum with zero rows makes the requested
    proportions unsatisfiable — silent renormalization returned a mix that
    did not match the weights; now it raises unless explicitly opted in."""
    import pytest as _pytest

    from dataqualityassistant_spark.ops.sampling import mix_rates

    with _pytest.raises(ValueError, match="fr"):
        mix_rates({"en": 1000}, {"en": 0.5, "fr": 0.5})
    rates = mix_rates({"en": 1000}, {"en": 0.5, "fr": 0.5}, missing_ok=True)
    assert rates == {"en": 1.0, "fr": 0.0}


def test_hash_sample_string_key_expr(spark):
    """Non-numeric ids need key_expr: the default cast-to-long would error
    under ANSI (or NULL every key into one all-or-nothing bucket)."""
    from pyspark.sql import functions as F_

    from dataqualityassistant_spark.ops.sampling import (
        hash_sample,
        hash_topn_sample,
        train_holdout_split,
    )

    rows = [(f"https://example.com/p/{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "url string")
    kept = hash_sample(df, 0.25, id_col="url", key_expr=F_.col("url")).count()
    assert 0 < kept < 400 and abs(kept - 100) < 60
    top = hash_topn_sample(df, 50, id_col="url", key_expr=F_.col("url"))
    assert top.count() == 50
    split = train_holdout_split(df, 0.1, id_col="url", key_expr=F_.col("url"))
    n_hold = split.where("split = 'holdout'").count()
    assert 0 < n_hold < 400
