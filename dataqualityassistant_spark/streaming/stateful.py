"""Custom stateful streaming operator: running per-domain quality stats.

``applyInPandasWithState`` is the Structured Streaming seam for operators
the built-in windowed aggregates can't express — here a RUNNING per-host
keep-rate that survives across micro-batches (state lives in the streaming
state store, checkpointed with the query):

    readStream(pages) → score (stateless Arrow/codegen projections)
    → groupBy(domain) → applyInPandasWithState(accumulate rows/kept)
    → changelog sink (one upsert row per touched domain per batch)

Scale shape: state is keyed by host domain (bounded by the web's host count,
~10^8 — far smaller than rows), each micro-batch shuffles only its own rows
onto their domain's state partition, and the emitted changelog is one row
per *touched* domain per batch. The batch analog (`domain_stats` in
plans/quality_filter.py) needs salting because it aggregates the full
corpus at once; here the state store holds the running totals so each batch
is incremental work.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dataqualityassistant_spark.fixtures import PAGES_SCHEMA
from dataqualityassistant_spark.plans.quality_filter import QualityFilterPipeline

_OUTPUT_TYPE = T.StructType([
    T.StructField("domain", T.StringType()),
    T.StructField("rows", T.LongType()),
    T.StructField("kept", T.LongType()),
    T.StructField("keep_rate", T.DoubleType()),
])
_STATE_TYPE = T.StructType([
    T.StructField("rows", T.LongType()),
    T.StructField("kept", T.LongType()),
])


def _update_domain_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows, kept = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        rows += int(len(pdf))
        kept += int(pdf["kept"].sum())
    state.update((rows, kept))
    yield pd.DataFrame({
        "domain": [key[0]],
        "rows": [rows],
        "kept": [kept],
        "keep_rate": [kept / rows if rows else 0.0],
    })


def domain_running_stats(scored_stream: DataFrame) -> DataFrame:
    """scored page stream → running (domain, rows, kept, keep_rate) upserts.
    Pure transformation on a streaming DataFrame; attach your own sink."""
    keyed = scored_stream.select(
        F.coalesce(F.parse_url(F.col("url"), F.lit("HOST")), F.lit("")).alias("domain"),
        F.col("verdict").cast("long").alias("kept"),
    )
    return keyed.groupBy("domain").applyInPandasWithState(
        _update_domain_state,
        outputStructType=_OUTPUT_TYPE,
        stateStructType=_STATE_TYPE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_domain_stats_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    pipeline: QualityFilterPipeline | None = None,
    trigger_once: bool = False,
):
    """File-landing pages → running domain stats changelog.

    The sink appends one row per touched domain per micro-batch, partitioned
    by batch_id with dynamic partition overwrite — the same idempotent-replay
    contract as the scoring stream (stream_filter.py): a replayed batch
    replaces its own changelog partition. The LATEST batch_id row per domain
    is the current running total."""
    pipe = pipeline or QualityFilterPipeline()
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_path)
    updates = domain_running_stats(pipe.score(pages))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .coalesce(1)  # changelog rows per batch are few (≤ touched domains)
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(output_path))

    writer = (updates.writeStream
              .outputMode("update")
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_path))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
