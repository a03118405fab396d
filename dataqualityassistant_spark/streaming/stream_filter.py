"""Structured Streaming ingestion for the quality filter.

The reference (and the north rule) are batch — checkpointed bucket waves in
``plans/quality_filter.py`` are the primary resume mechanism. This module is
the *continuous-ingestion* variant for deployments where pages land as
files (e.g. a WARC-extraction job dropping parquet into a landing zone):

    readStream(file source) → foreachBatch(score + partitioned write)

``foreachBatch`` reuses the exact batch scoring plan per micro-batch, so
semantics (features, verdict, scrub) are identical to the batch pipeline.

**Delivery semantics**: Spark's streaming checkpoint makes micro-batch
*delivery* at-least-once into ``foreachBatch`` (a crash between the sink
write and the checkpoint commit replays the batch). End-to-end exactly-once
therefore comes from making the sink IDEMPOTENT: output and metrics are
partitioned by ``batch_id`` and written with dynamic partition overwrite, so
a replayed batch REPLACES its own partitions instead of appending duplicates
— the same mechanism the batch pipeline uses for bucket waves.

Per-batch rule metrics ride an ``Observation`` attached to the scored frame
before the write, so each micro-batch is scored exactly once (no second
evaluation of the Arrow scoring stage for metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from dataqualityassistant_spark.fixtures import PAGES_SCHEMA
from dataqualityassistant_spark.plans.quality_filter import QualityFilterPipeline


def make_batch_processor(
    pipe: QualityFilterPipeline,
    output_path: str,
    metrics_path: str | None = None,
):
    """The foreachBatch callback, exposed for direct testing: calling it twice
    with the same ``batch_id`` (simulating a replayed micro-batch after a
    crash-before-checkpoint-commit) must leave exactly one copy of the
    batch's rows and metrics."""
    # compile the rule-suite masks ONCE per processor, not per micro-batch:
    # they are deterministic for the pipeline, and only needed for metrics
    masks = pipe._expectation_metric_masks() if metrics_path else []

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # availableNow triggers can deliver an empty final batch; writing
            # it is a no-op and Observation.get on a zero-task write cannot
            # produce a metrics row
            return
        scored = pipe.score(batch_df)
        obs = None
        if metrics_path:
            # metrics ride the write via observe(): scored exactly once.
            # anonymous Observation: names are registered once per session,
            # so a REPLAYED batch_id would collide with its first attempt
            obs = Observation()
            scored = scored.observe(obs, *pipe.metric_aggs(masks))
        drop = [c for c in pipe.output_drop_columns if c in scored.columns]
        if drop:
            scored = scored.drop(*drop)
        if pipe.shuffle_before_write:
            scored = scored.repartition(pipe.n_buckets, F.col("part_bucket"))
        # batch_id partitioning + dynamic overwrite = idempotent replay:
        # a re-delivered micro-batch overwrites ONLY its own partitions
        (scored.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id", "part_bucket")
         .parquet(output_path))
        if metrics_path and obs is not None:
            row = obs.get
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
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id")
                 .parquet(metrics_path))

    return process_batch


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
    (cron-scheduled catch-up runs with streaming's checkpoint bookkeeping +
    idempotent batch sinks, no always-on cluster)."""
    pipe = pipeline or QualityFilterPipeline()
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)

    writer = (
        pages.writeStream
        .foreachBatch(make_batch_processor(pipe, output_path, metrics_path))
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
