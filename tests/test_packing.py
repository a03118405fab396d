"""Sequence packing: FFD spec unit tests, capacity invariants, determinism
under repartitioning, and parity with a plain-Python replay."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataqualityassistant_spark.ops.packing import ffd_pack, pack_sequences


def test_ffd_spec():
    # 9 -> bin0 (rem 1); 8 -> bin1 (rem 2); 3 fits neither -> bin2
    assert ffd_pack([3, 9, 8], 10) == [2, 0, 1]
    assert ffd_pack([5, 5, 5, 5], 10) == [0, 0, 1, 1]
    assert ffd_pack([], 10) == []
    # oversize item gets its own bin, capacity clamps at 0
    assert ffd_pack([100, 1], 10) == [0, 1]
    # ties keep input order
    assert ffd_pack([6, 6, 4, 4], 10) == [0, 1, 0, 1]


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(5)
    rows = [(int(i), int(t)) for i, t in enumerate(rng.integers(10, 900, 2000))]
    return spark.createDataFrame(rows, "doc_id long, token_count long"), dict(rows)


def test_capacity_respected_and_all_docs_packed(docs):
    df, sizes = docs
    out = pack_sequences(df, max_tokens=1000, n_buckets=8).collect()
    assert {r["doc_id"] for r in out} == set(sizes)
    packs = {}
    for r in out:
        packs.setdefault((r["bucket"], r["pack_id"]), []).append(sizes[r["doc_id"]])
    for k, members in packs.items():
        assert sum(members) <= 1000, (k, members)


def test_deterministic_under_repartition(docs):
    df, _ = docs
    a = sorted(map(tuple, pack_sequences(df, max_tokens=1000, n_buckets=8).collect()))
    b = sorted(map(tuple, pack_sequences(
        df.repartition(17).orderBy(F.desc("doc_id")), max_tokens=1000, n_buckets=8).collect()))
    assert a == b


def test_matches_python_replay(docs):
    df, sizes = docs
    got = {r["doc_id"]: (r["bucket"], r["pack_id"])
           for r in pack_sequences(df, max_tokens=1000, n_buckets=8, salt=4242).collect()}
    # independent replay: XXH64 bucket + FFD per bucket over id-sorted rows
    from dataqualityassistant_spark.ops.sampling import xxhash64_long
    by_bucket = {}
    for i in sorted(sizes):
        b = xxhash64_long(4242, xxhash64_long(i)) % 8
        by_bucket.setdefault(b, []).append(i)
    for b, ids in by_bucket.items():
        bins = ffd_pack([sizes[i] for i in ids], 1000)
        for i, p in zip(ids, bins):
            assert got[i] == (b, p), i


def test_oversize_doc_isolated(spark):
    df = spark.createDataFrame([(1, 5000), (2, 10), (3, 20)], "doc_id long, token_count long")
    out = pack_sequences(df, max_tokens=100, n_buckets=1).collect()
    packs = {}
    for r in out:
        packs.setdefault(r["pack_id"], set()).add(r["doc_id"])
    big = next(p for p, m in packs.items() if 1 in m)
    assert packs[big] == {1}  # the oversize doc shares with nobody
