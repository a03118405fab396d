"""Evidence test: AQE's skew-join mitigation actually engages on the kind
of hot-key join this engine leans on at scale (host-domain joins, cluster
relations). Thresholds are lowered so the mechanism triggers at test size;
the assertion is the `skew=true` marker on the sort-merge join in the FINAL
adaptive plan."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 100k-row fact, ~90% on one hot key; the sha1 payload defeats
        # shuffle compression so the hot partition crosses the bytes
        # threshold. The JOIN must be the result stage: AQE only splits a
        # skewed partition when no downstream exchange depends on the
        # join's partitioning (a groupBy on the key suppresses the split —
        # correctly, since splitting would break the required distribution).
        fact = spark.range(0, 100_000).select(
            F.when(F.col("id") % 10 != 0, 7).otherwise(F.col("id") % 2000).alias("k"),
            F.sha1(F.col("id").cast("string").cast("binary")).alias("payload"))
        dim = spark.range(0, 2000).select(F.col("id").alias("k"), F.lit("a").alias("attr"))
        joined = fact.join(dim, "k")
        rows = joined.collect()
        # 90% of the fact lands on k=7 (ids with id%2000==7 are odd, so the
        # otherwise-branch never adds to it)
        assert len(rows) == 100_000
        assert sum(1 for r in rows if r["k"] == 7) == 90_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
