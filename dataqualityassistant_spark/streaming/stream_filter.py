"""Structured Streaming ingestion for the quality filter.

The reference (and the north rule) are batch — checkpointed bucket waves in
``plans/quality_filter.py`` are the primary resume mechanism. This module is
the *continuous-ingestion* variant for deployments where pages land as
files (e.g. a WARC-extraction job dropping parquet into a landing zone):

    readStream(file source) → foreachBatch(score + partitioned write)

``foreachBatch`` reuses the exact batch scoring plan per micro-batch, so
semantics (features, verdict, scrub) are identical to the batch pipeline,
and Spark's streaming checkpoint (source offsets + batch id) provides
exactly-once file processing. Metrics ride each micro-batch through the
same observe() aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataqualityassistant_spark.fixtures import PAGES_SCHEMA
from dataqualityassistant_spark.plans.quality_filter import QualityFilterPipeline


def start_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    pipeline: QualityFilterPipeline | None = None,
    metrics_path: str | None = None,
    trigger_once: bool = False,
    max_files_per_trigger: int | None = None,
):
    """Start (and return) the streaming query. ``trigger_once`` drains all
    available input then stops — the incremental-batch deployment mode
    (cron-scheduled catch-up runs with streaming's exactly-once bookkeeping,
    no always-on cluster)."""
    pipe = pipeline or QualityFilterPipeline()
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        scored = pipe.score(batch_df)
        if pipe.shuffle_before_write:
            scored = scored.repartition(pipe.n_buckets, F.col("part_bucket"))
        (scored.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").partitionBy("part_bucket").parquet(output_path))
        if metrics_path:
            # per-batch rule metrics from one tiny agg over the micro-batch
            masks = pipe._expectation_metric_masks()
            aggs = [F.count(F.lit(1)).alias("element_count")] + [
                F.sum(F.when(m, 1).otherwise(0)).alias(f"u{k}")
                for k, (_, _, _, _, m) in enumerate(masks)
            ]
            row = scored.agg(*aggs).collect()[0]
            n = int(row["element_count"])
            rows = [
                {
                    "batch_id": batch_id, "rule_name": rule, "expectation_type": etype,
                    "column": kw.get("column"), "element_count": n,
                    "unexpected_count": int(row[f"u{k}"] or 0),
                }
                for k, (rule, etype, kw, _, _) in enumerate(masks)
            ]
            if rows:
                (batch_df.sparkSession.createDataFrame(rows)
                 .write.mode("append").parquet(metrics_path))

    writer = (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
