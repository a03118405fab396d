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
:func:`stream_near_dedup` bridges the two: a ``foreachBatch`` query that
runs one ``incremental_dedup`` step per micro-batch, so long-horizon
NEAR-dup dedup is available on streams too (state = the compactable
on-disk signature store, shared with batch jobs).

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

__all__ = ["stream_dedup", "make_near_dedup_processor", "stream_near_dedup"]


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


def make_near_dedup_processor(
    store_path: str,
    output_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_id_prefix: str = "stream",
    **dedup_kwargs,
):
    """The ``foreachBatch`` callback bridging the stream to long-horizon
    NEAR-dup dedup: each micro-batch runs one
    :func:`~dataqualityassistant_spark.ops.dedup.incremental_dedup` step
    (within-batch banded self-join + batch-vs-signature-store cross join),
    so a streamed corpus converges to the SAME survivor set as the same
    batches fed to ``incremental_dedup`` directly (tested).

    Delivery semantics: ``foreachBatch`` is at-least-once — a crash between
    the sink write and the checkpoint commit replays the micro-batch with
    the SAME ``batch_id``. Both sinks are already idempotent under that
    contract: ``incremental_dedup`` writes the signature store partitioned
    by batch id with dynamic partition overwrite (a replay replaces its own
    partition and excludes it from the corpus check), and the survivor
    output here is partitioned by ``batch_id`` the same way.

    ``batch_id_prefix`` namespaces the stream's numeric micro-batch ids in
    the shared signature store (a batch job using plain numeric ids can
    feed the same store without collisions). TWO streams sharing one store
    must use DISTINCT prefixes: with the same prefix, both reaching
    micro-batch N would overwrite each other's ``<prefix>-N`` partition AND
    exclude each other's batch-N docs via the replay filter — silent
    duplicate acceptance. :func:`stream_near_dedup` derives a
    per-checkpoint prefix automatically; direct callers running multiple
    streams against one store must pass distinct prefixes themselves.
    Exposed separately so replay idempotency is directly testable."""
    from dataqualityassistant_spark.ops.dedup import incremental_dedup

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if "batch_id" in batch_df.columns:
            # the survivor sink partitions on an engine-assigned batch_id
            # column; silently replacing a caller's same-named column would
            # both lose their data and repartition the output on the wrong
            # values
            raise ValueError(
                "input stream already has a batch_id column; rename it "
                "before stream_near_dedup (the survivor output reserves "
                "batch_id for the micro-batch counter)")
        if batch_df.isEmpty():
            # availableNow triggers can deliver an empty final batch; an
            # empty incremental step would still write an empty store
            # partition and cost jobs
            return
        survivors = incremental_dedup(
            batch_df, store_path, batch_id=f"{batch_id_prefix}-{batch_id}",
            text_col=text_col, id_col=id_col, **dedup_kwargs)
        if output_path is not None:
            # numeric micro-batch id written as LONG: unlike the signature
            # store (caller-chosen string ids), this column is always the
            # engine's monotonic counter, so inference on re-read is stable
            (survivors.withColumn("batch_id", F.lit(batch_id).cast("long"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id")
             .parquet(output_path))

    return process_batch


def _normalize_checkpoint_path(path: str) -> str:
    """Canonical spelling of a checkpoint location for prefix hashing:
    equivalent respellings must hash identically (see stream_near_dedup).
    ``file:`` URIs and bare paths → the same absolute local path; other
    schemes → lowercased scheme/authority + normalized path."""
    import os
    import posixpath
    from urllib.parse import unquote, urlsplit

    parts = urlsplit(path)
    if parts.scheme in ("", "file") and not parts.netloc:
        local = unquote(parts.path) if parts.scheme == "file" else path
        return os.path.abspath(os.path.normpath(local))
    norm_path = posixpath.normpath(unquote(parts.path)).rstrip("/") or "/"
    return f"{parts.scheme.lower()}://{parts.netloc.lower()}{norm_path}"


def stream_near_dedup(
    df: DataFrame,
    store_path: str,
    output_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = False,
    batch_id_prefix: str | None = None,
    **dedup_kwargs,
):
    """Start (and return) a streaming query that near-dedups ``df`` against
    the persistent signature store, micro-batch by micro-batch.

    Complements :func:`stream_dedup`: that operator removes short-horizon
    EXACT burst duplicates with watermark-bounded in-memory state; this one
    removes long-horizon NEAR duplicates with the signature store as the
    state (bounded on disk, compactable, shared with batch jobs). Chain
    them — ``stream_dedup`` upstream shrinks every micro-batch before the
    banded joins run. ``available_now=True`` drains all available input
    then stops (the cron-scheduled catch-up deployment mode).

    The store prefix defaults to a hash of ``checkpoint_path``: restarts of
    the SAME query (same checkpoint) keep the same prefix — required for
    replay idempotency — while a second stream with its own checkpoint gets
    a distinct prefix and cannot clobber this one's store partitions.
    The path is NORMALIZED before hashing (``file:`` URIs and bare paths
    both resolve to the same absolute local path; other schemes get
    lowercased scheme/authority and a normalized path, trailing slashes
    stripped): Spark resolves equivalent spellings of one
    checkpointLocation to the same offsets, so a restart that respells the
    path (``ckpt`` vs ``/abs/ckpt/`` vs ``file:///abs/ckpt``) must also
    land on the same prefix — a different prefix would defeat the replay
    filter and silently drop the replayed batch's survivors as corpus
    duplicates. Remote-scheme corner cases a string can't resolve
    (symlinks, ``hdfs://host`` vs ``hdfs://host.fqdn``) need an explicit
    ``batch_id_prefix``."""
    if batch_id_prefix is None:
        import hashlib

        digest = hashlib.sha256(
            _normalize_checkpoint_path(checkpoint_path).encode("utf-8")
        ).hexdigest()[:10]
        batch_id_prefix = f"stream-{digest}"
    writer = (
        df.writeStream
        .foreachBatch(make_near_dedup_processor(
            store_path, output_path, text_col=text_col, id_col=id_col,
            batch_id_prefix=batch_id_prefix, **dedup_kwargs))
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
