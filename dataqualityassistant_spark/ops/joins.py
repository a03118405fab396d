"""Time-series as-of join.

The reference (DarshanaSahu/DataQualityAssistant) has no temporal join —
this is part of the training-data/event-pipeline layer this engine adds
(e.g. "attach the most recent click before each error", "join crawl
snapshots to the latest robots.txt fetch").

Spark has no built-in as-of join, and the naive formulations do not scale:

* range-join (``l.ts >= r.ts`` + window to pick the max) explodes to
  O(|L|·|R|) per key before the filter;
* per-key ``applyInPandas`` + ``pandas.merge_asof`` works but drags every
  payload byte through Arrow.

The scale-correct shape is the **union + running-last trick**: tag the two
inputs, union them, hash-partition once by the join key, sort by
``(ts, side)`` within the partition, and carry the right-hand payload
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
running window. One shuffle on the key, one sort, zero joins — the same
plan shape as sessionization, so it survives 100 TB exactly as well as any
keyed window does (skewed keys are the caller's salting problem, as with
any groupBy).

Semantics match ``pandas.merge_asof`` (backward/forward, inclusive or
exclusive exact matches, optional tolerance) and DuckDB's ``ASOF JOIN``
(backward + inclusive), which serves as the independent SQL oracle in
``__spark_entry__.oracle_sql()["asof_clicks"]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _epoch_seconds(col: Column) -> Column:
    # parquet TIMESTAMP arrives as TIMESTAMP_NTZ (no direct numeric cast);
    # via timestamp_ltz under a UTC session it matches DuckDB's fractional
    # epoch() bit-for-bit (same trick as the sessionization query).
    return col.cast("timestamp_ltz").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: float | None = None,
    suffix: str = "_right",
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the single right row with
    the largest ``right_ts <= left_ts`` (``backward``) or smallest
    ``right_ts >= left_ts`` (``forward``) within the same ``on`` key.

    Left rows with no qualifying right row keep NULL right columns (left
    semantics, like ``pandas.merge_asof`` / DuckDB ``ASOF LEFT JOIN``).
    Right rows with a NULL timestamp never match; left rows with a NULL
    timestamp never receive a match.

    ``tolerance`` (seconds, float) drops matches farther than that from the
    left timestamp. Right payload columns that collide with a left column
    name are renamed with ``suffix``.

    Determinism: if the right side has several rows with the SAME
    ``(key, right_ts)``, which one wins is unspecified (same as DuckDB
    ASOF) — pre-aggregate the right side to unique ``(key, ts)`` (e.g.
    ``max_by``) when that matters.

    **Hot keys** (``bucket_seconds``): the default plan puts ONE key in ONE
    window partition — a key with 10^9 rows serializes into a single task.
    Pass ``bucket_seconds`` to additionally partition by
    ``floor(ts / bucket_seconds)`` so the hot key's work spreads over
    ``time_span / bucket_seconds`` tasks. Results are IDENTICAL to the
    unbucketed plan in all cases (differentially tested); the mechanism
    adapts to the tolerance:

    * ``tolerance <= bucket_seconds``: a left row in time bucket B can only
      match right rows in buckets B-1..B (backward; B..B+1 forward), so
      right rows are replicated into the one neighbouring bucket (2x the
      right relation, bounded) and the tolerance filter discards the
      out-of-range carry-ins;
    * unbounded or wider-than-bucket tolerance: two-pass carry — the right
      side is pre-aggregated to one best candidate per (key, bucket) (the
      pre-aggregate-right-side recipe, built in), a running window over
      that SMALL relation carries the best earlier candidate into every
      left-occupied bucket, and one carry row per (key, bucket) joins the
      bucket's own right rows. Two extra shuffles, both over aggregated
      relations of ~keys x buckets rows — never over the raw inputs.

    Check :func:`~dataqualityassistant_spark.ops.skew.diagnose_skew` on the
    join key to decide whether you need this.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} must exist on both sides")

    payload_cols = [c for c in right.columns if c not in keys]
    if right_ts not in payload_cols:
        raise ValueError(f"right_ts {right_ts!r} must be a non-key right column")

    # Tag order at EQUAL timestamps decides inclusivity: the running window
    # sees rows in sort order, so placing right rows before left rows makes
    # an exact-timestamp right row visible to the left row (inclusive).
    right_side, left_side = (0, 1) if allow_exact_matches else (1, 0)

    # SQL equality semantics: a NULL key matches nothing. Spark's window
    # partitioning would happily group NULL keys together, so drop null-key
    # right rows here (null-key LEFT rows then sit in a partition with no
    # right rows and keep a NULL match, as DuckDB ASOF / merge_asof would).
    right_key_ok = F.lit(True)
    for k in keys:
        right_key_ok = right_key_ok & F.col(k).isNotNull()
    r = right.select(
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(right_side).alias("__asof_side"),
        F.struct(*payload_cols).alias("__asof_payload"),
    ).where(F.col("__asof_ts").isNotNull() & right_key_ok)
    l = left.select(
        *keys,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(left_side).alias("__asof_side"),
        F.struct(*left.columns).alias("__asof_left"),
    )

    part_cols: list = list(keys)
    if bucket_seconds is not None:
        bw = F.lit(float(bucket_seconds))
        bucket = F.floor(_epoch_seconds(F.col("__asof_ts")) / bw).cast("long")
        l = l.withColumn("__asof_bucket", bucket)
        if tolerance is not None and float(tolerance) <= float(bucket_seconds):
            # bounded tolerance: a backward match lives in the left row's
            # bucket or the one before, so each right row also serves the
            # NEXT bucket (previous for forward) — one explode, no extra
            # shuffles; the tolerance filter discards out-of-range carry-ins
            shift = 1 if direction == "backward" else -1
            r = r.withColumn("__asof_bucket",
                             F.explode(F.array(bucket, bucket + F.lit(shift))))
        else:
            # unbounded (or wider-than-bucket) tolerance: two-pass carry.
            # Pass 1 pre-aggregates the right side to its best candidate per
            # (key, bucket) — latest ts for backward, earliest for forward —
            # then a running window over the SMALL per-bucket relation
            # (ordered by bucket, with each left-occupied bucket's probe row
            # sorted BEFORE that bucket's own best so only strictly-earlier
            # buckets are visible) computes, for every left-occupied bucket,
            # the best candidate from all preceding buckets. Pass 2 injects
            # that one carry row per (key, left bucket) next to the bucket's
            # own right rows; the usual in-partition running `last` then
            # chooses between them. A carried row's ts is strictly outside
            # the bucket's time range, so it always qualifies and never
            # shadows an in-bucket candidate that should win.
            r = r.withColumn("__asof_bucket", bucket)
            pick = F.max_by if direction == "backward" else F.min_by
            rb = r.groupBy(*keys, "__asof_bucket").agg(
                pick(F.struct("__asof_ts", "__asof_payload"),
                     "__asof_ts").alias("__asof_best"))
            lb = (l.select(*keys, "__asof_bucket").distinct()
                  .withColumn("__asof_best",
                              F.lit(None).cast(rb.schema["__asof_best"].dataType))
                  .withColumn("__asof_probe", F.lit(1)))
            border = (F.col("__asof_bucket").asc_nulls_first()
                      if direction == "backward"
                      else F.col("__asof_bucket").desc_nulls_first())
            wc = (Window.partitionBy(*keys)
                  .orderBy(border, F.col("__asof_probe").desc())
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            carry_rows = (
                lb.unionByName(rb.withColumn("__asof_probe", F.lit(0)))
                .withColumn("__asof_carry",
                            F.last("__asof_best", ignorenulls=True).over(wc))
                .where((F.col("__asof_probe") == 1)
                       & F.col("__asof_carry").isNotNull())
                .select(*keys, "__asof_bucket",
                        F.col("__asof_carry.__asof_ts").alias("__asof_ts"),
                        F.lit(right_side).alias("__asof_side"),
                        F.col("__asof_carry.__asof_payload").alias("__asof_payload"))
            )
            r = r.unionByName(carry_rows)
        part_cols.append("__asof_bucket")

    # allowMissingColumns fills the absent struct with NULL on each side.
    # The explicit repartition IS the plan's one hash exchange: it satisfies
    # the window's distribution requirement (no second exchange) while being
    # exempt from AQE partition coalescing, which at small input sizes would
    # fold the whole keyed sort into one task (r6; see
    # session.shuffle_parallelism). Results are placement-independent.
    from dataqualityassistant_spark.session import shuffle_parallelism

    unioned = (l.unionByName(r, allowMissingColumns=True)
               .repartition(shuffle_parallelism(left), *part_cols))

    if direction == "backward":
        order = [F.col("__asof_ts").asc_nulls_first(), F.col("__asof_side").asc()]
    else:
        order = [F.col("__asof_ts").desc_nulls_first(), F.col("__asof_side").asc()]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__asof_match", F.last("__asof_payload", ignorenulls=True).over(w)
    )

    out = carried.where(F.col("__asof_left").isNotNull())
    match = F.col("__asof_match")
    # a left NULL timestamp sorts first within its key, so no right row can
    # precede it in the running window — no extra guard needed for backward;
    # same for forward with desc_nulls_first.
    if tolerance is not None:
        gap = _epoch_seconds(F.col("__asof_ts")) - _epoch_seconds(match[right_ts])
        if direction == "forward":
            gap = -gap
        match = F.when(gap <= F.lit(float(tolerance)), match)

    left_names = set(left.columns)
    out_cols = [F.col(f"__asof_left.{c}").alias(c) for c in left.columns]
    for c in payload_cols:
        out_name = c + suffix if c in left_names else c
        out_cols.append(match[c].alias(out_name))
    return out.select(*out_cols)
