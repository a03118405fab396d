"""Streaming deduplication with watermark-bounded state.

The fourth streaming shape next to ``stream_filter`` (foreachBatch
ingestion), ``windowed`` (event-time aggregation), and ``stateful``
(applyInPandasWithState): continuous exact dedup of an incoming document
stream via ``dropDuplicatesWithinWatermark``.

Why not plain ``dropDuplicates`` on a stream: its state holds EVERY key
ever seen — at 10^9 docs/day the state store grows without bound and the
job eventually dies. ``dropDuplicatesWithinWatermark`` keeps a key only
until the event-time watermark passes its arrival, so state is bounded by
(arrival rate × watermark horizon): the right semantics for crawl streams,
where a re-fetched page arriving months later is a *new observation* (batch
:func:`~dataqualityassistant_spark.ops.dedup.incremental_dedup` against the
signature store handles long-horizon dedup; this operator removes the
short-horizon burst duplicates — retried fetches, mirror hosts, duplicate
queue deliveries — before they hit the expensive scoring stage).

Semantics notes (mirrors the batch operators' contracts):

* the FIRST arrival of a key within the horizon wins (processing order),
  unlike batch ``exact_dedup``'s deterministic min-id survivor;
* content keying hashes the text to a 64-bit key, so state per doc is ~8
  bytes + row pointer, never the text itself (same shuffle-volume argument
  as ``exact_dedup``);
* NULL text hashes to a constant, so null-text rows would dedupe against
  each other — filter or route them around this operator, as the CLI dedup
  command does for the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_dedup"]


def stream_dedup(
    df: DataFrame,
    cols: list[str] | None = None,
    text_col: str | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose key was already seen within the watermark horizon.

    Exactly one of ``cols`` (dedup on these columns) or ``text_col``
    (dedup on ``xxhash64(text)`` — content keying without carrying the
    text in state) must be given. ``ts_col`` + ``watermark`` bound the
    state: a duplicate arriving after the watermark passed its original
    is emitted again (a fresh observation, not a duplicate burst).
    """
    if (cols is None) == (text_col is None):
        raise ValueError("pass exactly one of cols= or text_col=")
    out = df.withWatermark(ts_col, watermark)
    if text_col is not None:
        if "__dedup_key" in df.columns:
            # withColumn would silently REPLACE the caller's column and the
            # trailing drop would then remove it from the output schema
            raise ValueError(
                "input already has a __dedup_key column; rename it or "
                "dedup on cols=['__dedup_key'] directly")
        out = out.withColumn("__dedup_key", F.xxhash64(F.col(text_col)))
        return out.dropDuplicatesWithinWatermark(["__dedup_key"]).drop("__dedup_key")
    return out.dropDuplicatesWithinWatermark(list(cols))
