"""Skew tooling: diagnosing hot keys and computing distinct counts in
shapes that survive them.

``COUNT(DISTINCT x) GROUP BY k`` is the classic hot-key killer: the
distinct state for a hot key (one web domain with 10^9 URLs) must fit in
the single reducer that owns ``k``. Two scale-correct rewrites:

* :func:`two_phase_distinct_count` — EXACT: dedupe on ``(k, x)`` first
  (the hot key's rows spread over the whole cluster because ``x`` is part
  of the shuffle key), then count per ``k``. Two small shuffles instead of
  one that concentrates a giant hash set on one task.
* :func:`hll_distinct_count` — APPROXIMATE: per-partition HLL sketches
  merged per key (``hll_sketch_agg`` / ``hll_union_agg``). One shuffle
  moving kilobyte sketches, never the values; the standard choice when 2%
  error is acceptable at 10^12 rows.

:func:`diagnose_skew` is the measurement that tells you whether you need
any of this: top-k key frequencies and their corpus fraction (itself
computed skew-safely — the per-key count is a mergeable agg with map-side
combine, and only ``k`` rows reach the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["diagnose_skew", "two_phase_distinct_count", "hll_distinct_count"]


def diagnose_skew(df: DataFrame, keys: str | list[str], k: int = 20) -> DataFrame:
    """Top-``k`` hottest key values with row counts and corpus fraction.
    ``frac`` >> 1/n_partitions on a key you shuffle by = salt it or switch
    to the two-phase/HLL shapes below."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    counted = df.groupBy(*key_list).agg(F.count(F.lit(1)).alias("n"))
    # lazy single-job shape: the total rides a broadcast 1-row aggregate
    # instead of an eager df.count() (which would scan the corpus once at
    # call time and again per evaluation)
    total = df.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    # zero-total guard: unreachable for deterministic inputs (a counted row
    # implies >=1 input row; empty input -> empty result, tested) but
    # `counted` and `total` re-scan df INDEPENDENTLY inside the crossJoin
    # plan, so a non-deterministic frame (rand()-sampled) can legally yield
    # counted rows alongside __total == 0 — frac degrades to 0.0 instead of
    # Infinity there
    frac = F.when(F.col("__total") > 0, F.col("n") / F.col("__total")).otherwise(F.lit(0.0))
    return (
        counted.crossJoin(F.broadcast(total))
        .orderBy(F.desc("n"), *key_list)
        .limit(k)
        .select(*key_list, "n", frac.alias("frac"))
    )


def two_phase_distinct_count(
    df: DataFrame, keys: str | list[str], col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count as dedupe-then-count: shuffle 1 keys on
    ``(keys, col)`` (hot keys spread across the cluster), shuffle 2 merges
    per-key partial counts. Full SQL ``COUNT(DISTINCT ...)`` semantics:
    NULL values are not counted, but a key whose values are ALL NULL still
    appears with a 0 (the ``(key, NULL)`` row survives the dedupe and
    ``count(col)`` skips it)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    deduped = df.select(*key_list, col).distinct()
    return deduped.groupBy(*key_list).agg(
        F.count(col).cast("bigint").alias(out_col))


def hll_distinct_count(
    df: DataFrame, keys: str | list[str], col: str, lgk: int = 12,
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """Approximate per-key distinct count via mergeable HLL sketches
    (±~2% at the default lgConfigK=12, ~2.5 KB of state per key regardless
    of cardinality). One shuffle of sketches, never values.

    NULL handling matches :func:`two_phase_distinct_count` exactly:
    ``hll_sketch_agg`` ignores NULL values itself (no pre-filter — a
    pre-filter would DROP keys whose values are all NULL, where the exact
    variant reports them with 0), and an all-NULL key's empty sketch
    estimates to 0."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.groupBy(*key_list)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg(F.col(col), F.lit(lgk)))
             .alias(out_col))
    )
