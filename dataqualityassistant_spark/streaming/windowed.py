"""Event-time windowed aggregation with watermarked late-data handling.

The third streaming shape next to ``stream_filter`` (stateless foreachBatch
ingestion) and ``stateful`` (applyInPandasWithState): built-in tumbling /
sliding windows over event time, with a watermark bounding both state size
and how late a row may arrive.

Scale behavior: state is one aggregate row per ``(window, keys)`` group,
and the watermark lets Spark DROP finalized windows from the state store —
without it, a crawl stream aggregated by hour holds every hour ever seen.
In append output mode a window is emitted exactly once, when the watermark
passes its end; rows later than the watermark are discarded (counted in
``StreamingQueryProgress.stateOperators[].numRowsDroppedByWatermark``).

The same plan runs in BATCH unchanged (``F.window`` is an ordinary
expression; ``withWatermark`` is a no-op there) — the entry-contract query
``events_windowed`` value-checks the window bucketing against DuckDB's
``time_bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_counts"]


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time counts per key:
    ``(window_start, window_end, *keys, n[, avg_value])``.

    ``watermark`` applies only on streaming inputs (bounds state + late
    data); pass ``None`` for pure batch use. Windows align to the epoch,
    matching DuckDB's ``time_bucket``. Rows with a NULL timestamp are
    DROPPED (Spark's window rewrite adds an implicit not-null filter) —
    the ``events_windowed`` oracle filters them identically."""
    keys = keys or []
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    if value_col is not None:
        aggs.append(F.avg(value_col).alias("avg_value"))
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    out = ["n"] + (["avg_value"] if value_col is not None else [])
    return (
        df.groupBy(win.alias("w"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), *keys, *out)
    )
