"""The web-text quality-filter pipeline — the engine's flagship plan.

Recasts the reference's rule-execution core (declarative expectation suites
with ``mostly`` thresholds, per-rule metrics, suite verdicts — reference
``quality_engine.py:99-155``) as a distributed keep/drop pipeline over
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``:

1. **Feature stage** — Gopher/C4 heuristics as pure Spark SQL expressions;
   langid + char-trigram perplexity as Arrow-batched pandas UDFs. The
   ``html`` binary column is pruned out before any UDF (never deserialized).
2. **Rule stage** — the web-text rule suite is ordinary expectations over
   the derived feature columns, compiled by the same registry as every
   other rule; per-row verdict = AND of rule masks (row-granular analog of
   rule success = AND of expectations, reference ``:445-446``).
3. **Scrub stage** — ordered JVM ``regexp_replace`` PII/toxicity chain,
   byte-identical to the Python-re oracle.
4. **Outputs** — scored table (parquet, partitioned by url-hash bucket;
   Iceberg-ready layout), per-rule×expectation ``metrics`` rows collected
   via ``DataFrame.observe`` during the output write (ZERO extra scans),
   per-bucket ``lineage`` rows, salted per-domain stats, and checkpoint
   watermarks for idempotent resume.

Scale design (10^12 docs, 1000 executors):
- the whole hot path is scan → project (codegen + two Arrow UDF stages) →
  write: **no shuffle at all** on the main data path;
- metrics ride the write via ``observe`` (AccumulatorV2 under the hood);
- lineage/domain stats aggregate only tiny projections of the output;
- host-domain skew never concentrates work because per-domain aggregation
  is two-phase (salt → partial agg → final agg);
- resume is per-bucket: dynamic partition overwrite + watermark records.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from dataqualityassistant_spark.rules import Rule
from dataqualityassistant_spark.operators.engine import SuiteEngine
from dataqualityassistant_spark.functions.scoring import with_text_scores
from dataqualityassistant_spark.functions.scrub import scrub_text_column
from dataqualityassistant_spark.streaming.checkpoint import CheckpointStore


def default_webtext_rules() -> list[Rule]:
    """Gopher/C4-style web-text rule suite over the derived feature columns.
    Thresholds calibrated once on the seed fixture mixture and frozen;
    `mostly` values express how much table-level violation each rule
    tolerates before the *suite* (not the row) is flagged unhealthy."""
    B = "expect_column_values_to_be_between"
    return [
        Rule(id=101, name="text_present", rule_config=[
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "text", "mostly": 0.9}},
            {"expectation_type": B,
             "kwargs": {"column": "n_chars", "min_value": 1, "mostly": 0.9}},
        ]),
        Rule(id=102, name="gopher_words", rule_config=[
            {"expectation_type": B,
             "kwargs": {"column": "word_count", "min_value": 50, "max_value": 100000, "mostly": 0.5}},
            {"expectation_type": B,
             "kwargs": {"column": "mean_word_length", "min_value": 2.0, "max_value": 12.0, "mostly": 0.8}},
            {"expectation_type": B,
             "kwargs": {"column": "alpha_word_ratio", "min_value": 0.7, "mostly": 0.7}},
            {"expectation_type": B,
             "kwargs": {"column": "stopword_ratio", "min_value": 0.05, "mostly": 0.5}},
        ]),
        Rule(id=103, name="gopher_symbols_layout", rule_config=[
            {"expectation_type": B,
             "kwargs": {"column": "symbol_word_ratio", "max_value": 0.1, "mostly": 0.8}},
            {"expectation_type": B,
             "kwargs": {"column": "bullet_line_frac", "max_value": 0.9, "mostly": 0.9}},
            {"expectation_type": B,
             "kwargs": {"column": "ellipsis_line_frac", "max_value": 0.3, "mostly": 0.9}},
            {"expectation_type": B,
             "kwargs": {"column": "mean_line_length", "min_value": 10.0, "max_value": 5000.0, "mostly": 0.7}},
        ]),
        Rule(id=104, name="repetition", rule_config=[
            {"expectation_type": B,
             "kwargs": {"column": "dup_line_frac", "max_value": 0.30, "mostly": 0.9}},
            {"expectation_type": B,
             "kwargs": {"column": "top_2gram_char_frac", "max_value": 0.20, "mostly": 0.85}},
            {"expectation_type": B,
             "kwargs": {"column": "top_3gram_char_frac", "max_value": 0.18, "mostly": 0.85}},
            {"expectation_type": B,
             "kwargs": {"column": "dup_5gram_char_frac", "max_value": 0.15, "mostly": 0.85}},
        ]),
        Rule(id=105, name="language", rule_config=[
            {"expectation_type": "expect_column_values_to_be_in_set",
             "kwargs": {"column": "detected_lang", "value_set": ["en"], "mostly": 0.6}},
        ]),
        Rule(id=106, name="fluency", rule_config=[
            # calibrated on the seed mixture: clean prose ≤ ~2.1, gibberish ≥ ~3.2
            {"expectation_type": B,
             "kwargs": {"column": "log_ppl", "max_value": 2.5, "mostly": 0.7}},
        ]),
    ]


@dataclass
class QualityFilterPipeline:
    rules: list[Rule] = field(default_factory=default_webtext_rules)
    text_col: str = "text"
    n_buckets: int = 64          # url-hash partition groups (resume granularity)
    domain_salt: int = 16        # salt fan-out for per-domain aggregation
    reference_parity: bool = False
    # Shuffle rows onto their bucket before the partitioned write. Without
    # this every task holds an open writer per bucket (fan-out writer):
    # measured 110s vs 19s at 32 cores on this box, and at cluster scale the
    # fan-out path means tasks×buckets small files + writer memory. With it,
    # each write task handles ~one bucket. Size n_buckets so a bucket fits a
    # task (e.g. rows/bucket ≈ a few hundred MB) at the target scale.
    shuffle_before_write: bool = True
    # Fill missing `text` from the html payload (JVM regexp chain, byte-
    # identical to the Python oracle — functions/html_text.py) before
    # scoring. Off by default: the input contract provides text, and reading
    # the binary payload doubles scan volume; enable for raw WARC drops.
    extract_text_from_html: bool = False
    # Columns scored but NOT persisted to the output table. Default drops the
    # raw text: the output corpus is the scrubbed text + features + verdict,
    # and the input table already holds the raw bytes (lineage via url) —
    # duplicating them doubles output volume at 100 TB (measured 230 MB →
    # 123 MB on the 200k-page corpus). Set to () to keep everything.
    output_drop_columns: tuple = ("text",)
    # Opt-in pre-scoring stages (both ride the scan — no extra shuffle):
    # canonicalize_urls rewrites `url` through ops/urltools before bucketing
    # and lineage, so tracking-param variants of one page share a bucket and
    # identity; sample_fractions applies deterministic per-`lang` hash
    # sampling (ops/sampling, keyed on url) BEFORE the expensive Arrow
    # scoring stage — the cheap way to run a pilot fraction of a crawl.
    # Note: suite metrics then describe the SAMPLED corpus.
    canonicalize_urls: bool = False
    sample_fractions: dict | None = None
    sample_default_fraction: float = 1.0
    sample_salt: int = 42
    # Input split sizing for the Arrow scoring stage, applied (and restored)
    # around run(). The default 128 MB gives one task per ~65k pages: with
    # few big input files the stage degenerates to a handful of oversized
    # Arrow tasks and straggler skew dominates (measured 3.2k vs 8.1k
    # docs/s e2e on an 800k-page corpus — BASELINE.md scaling probe).
    # "8m"-ish values give several tasks per core; None leaves the session
    # conf untouched (right when the input is already many files).
    input_split_bytes: str | None = None

    # ------------------------------------------------------------- scoring

    def score(self, df: DataFrame) -> DataFrame:
        """Pure transformation: pages → scored rows. Lazy; no jobs run.
        Drops `html` immediately — the binary payload must never cross the
        Arrow boundary (input_hint: carried through but unscanned)."""
        if self.canonicalize_urls:
            from dataqualityassistant_spark.ops.urltools import canonicalize_url

            df = df.withColumn("url", canonicalize_url("url"))
        if self.sample_fractions is not None:
            from dataqualityassistant_spark.ops.sampling import stratified_hash_sample

            df = stratified_hash_sample(
                df, self.sample_fractions, strata_col="lang",
                salt=self.sample_salt,
                default_fraction=self.sample_default_fraction,
                key_expr=F.col("url"))
        cols = [c for c in df.columns if c != "html"]
        if self.extract_text_from_html and "html" in df.columns:
            from dataqualityassistant_spark.functions.html_text import html_to_text_column

            filled = F.coalesce(F.col(self.text_col), html_to_text_column("html"))
            scored = df.withColumn(self.text_col, filled).select(*cols)
        else:
            scored = df.select(*cols)
        # ALL derived columns (Gopher features, repetition, langid,
        # perplexity) come from ONE fused Arrow UDF stage: HOF-lambda SQL
        # expressions fall out of whole-stage codegen and stopped scaling
        # (see functions/scoring.py); the fused Python loop is faster and
        # bit-identical to the label oracle.
        scored = with_text_scores(scored, self.text_col)

        engine = SuiteEngine(reference_parity=self.reference_parity)
        failed = []
        for rule, ces in engine.compile_rules(self.rules):
            masks = [ce.unexpected_mask for ce in ces if ce.unexpected_mask is not None]
            if not masks:
                continue
            hit = masks[0]
            for m in masks[1:]:
                hit = hit | m
            failed.append(F.when(hit, F.lit(rule.name)))
        failed_rules = F.array_compact(F.array(*failed)) if failed else F.array().cast("array<string>")
        scored = scored.withColumn("failed_rules", failed_rules)
        scored = scored.withColumn("verdict", F.size("failed_rules") == 0)
        scored = scored.withColumn("scrubbed_text", scrub_text_column(self.text_col))
        scored = scored.withColumn(
            "part_bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(self.n_buckets)).cast("int")
        )
        return scored

    def _expectation_metric_masks(self) -> list[tuple[str, str, dict, float, Column]]:
        """(rule_name, expectation_type, kwargs, mostly, mask) for every
        row-local expectation — the observe() metric set."""
        engine = SuiteEngine(reference_parity=self.reference_parity)
        out = []
        for rule, ces in engine.compile_rules(self.rules):
            for ce in ces:
                # pre_project masks contain window expressions — legal in
                # score()'s projection but not inside observe() aggregates;
                # such rules are evaluated by the engine path instead
                if ce.unexpected_mask is not None and not ce.pre_project:
                    out.append((rule.name, ce.expectation_type, ce.kwargs, ce.mostly, ce.unexpected_mask))
        return out

    @staticmethod
    def metric_aggs(metric_masks) -> list:
        """Observation aggregates for the expectation masks (element count +
        one conditional count aliased ``u{k}`` per mask) — shared by the
        batch waves and the streaming foreachBatch sink so the two metrics
        tables decode identically and cannot drift."""
        return [F.count(F.lit(1)).alias("element_count")] + [
            F.sum(F.when(m, 1).otherwise(0)).alias(f"u{k}")
            for k, (_, _, _, _, m) in enumerate(metric_masks)
        ]

    # ------------------------------------------------------------- execution

    def run(self, spark: SparkSession, pages: DataFrame, output_path: str,
            **kwargs) -> dict:
        """Execute the pipeline (see :meth:`_run_impl` for the wave
        mechanics). When ``input_split_bytes`` is set, the session's
        ``maxPartitionBytes`` is overridden for the duration of the run and
        restored afterwards (exception-safe)."""
        if not self.input_split_bytes:
            return self._run_impl(spark, pages, output_path, **kwargs)
        split_key = "spark.sql.files.maxPartitionBytes"
        old_split = spark.conf.get(split_key)
        spark.conf.set(split_key, self.input_split_bytes)
        try:
            return self._run_impl(spark, pages, output_path, **kwargs)
        finally:
            spark.conf.set(split_key, old_split)

    def _run_impl(
        self,
        spark: SparkSession,
        pages: DataFrame,
        output_path: str,
        metrics_path: str | None = None,
        lineage_path: str | None = None,
        checkpoint_path: str | None = None,
        run_id: str = "run-0",
        run_ts: str = "",
        waves: int = 1,
        max_buckets: int | None = None,
    ) -> dict:
        """Execute the pipeline with per-bucket checkpointed waves.

        Each wave = one Spark job: score pending buckets → write output
        partitions (dynamic overwrite ⇒ idempotent re-run) → observe()
        yields the rule metrics for free → lineage from a 3-column scan of
        the just-written partitions → watermark record committed last.
        ``max_buckets`` processes only a prefix of pending buckets (used by
        the kill-and-resume test to simulate a mid-run crash).
        """
        # dynamic partition overwrite is set PER WRITER below, never on the
        # session: a session-wide conf.set would silently change overwrite
        # semantics (stale partitions kept) for every later partitioned
        # write in the same session (the maxPartitionBytes save/restore in
        # run() exists for the same reason)
        store = CheckpointStore(checkpoint_path) if checkpoint_path else None
        done = store.completed_buckets(run_id) if store else set()
        pending = [b for b in range(self.n_buckets) if b not in done]
        if max_buckets is not None:
            pending = pending[:max_buckets]

        t0 = time.time()
        metric_masks = self._expectation_metric_masks()
        all_metrics: list[dict] = []
        n_rows_total = 0
        # wave keys continue from completed waves so a resume never reuses a
        # (run_id, wave) partition of the lineage/metrics tables
        wave_base = len(store.records(run_id)) if store else 0

        wave_groups = [pending[i::waves] for i in range(waves)] if pending else []
        wave_groups = [w for w in wave_groups if w]
        for wave_idx, buckets in enumerate(wave_groups):
            wave_key = wave_base + wave_idx
            scored = self.score(pages).filter(F.col("part_bucket").isin(buckets))

            obs = Observation(f"metrics-{run_id}-{wave_idx}")
            observed = scored.observe(obs, *self.metric_aggs(metric_masks))
            drop = [c for c in self.output_drop_columns if c in observed.columns]
            if drop:
                observed = observed.drop(*drop)
            if self.shuffle_before_write:
                observed = observed.repartition(len(buckets), F.col("part_bucket"))

            (observed.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("part_bucket")
             .parquet(output_path))

            row = obs.get
            element_count = int(row["element_count"])
            n_rows_total += element_count
            wave_metrics = []
            for k, (rule_name, etype, kwargs, mostly, _) in enumerate(metric_masks):
                cnt = int(row[f"u{k}"] or 0)
                pct = (cnt / element_count * 100) if element_count > 0 else 0
                wave_metrics.append({
                    "run_id": run_id, "run_ts": run_ts, "wave": wave_key,
                    "rule_name": rule_name, "expectation_type": etype,
                    "column": kwargs.get("column"),
                    "element_count": element_count, "unexpected_count": cnt,
                    "unexpected_percent": pct,
                    "success": pct <= (1 - mostly) * 100,
                })
            all_metrics.extend(wave_metrics)
            if metrics_path and wave_metrics:
                # per-wave dynamic partition overwrite: re-running a crashed
                # wave replaces its metrics instead of appending duplicates,
                # and metrics for completed waves survive a mid-run crash
                (spark.createDataFrame(wave_metrics)
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("run_id", "wave")
                 .parquet(metrics_path))

            # lineage: per-bucket counts + warc_ts watermark from the freshly
            # written partitions (2-column pruned scan, bucket-pruned read).
            if element_count == 0:
                # empty wave: nothing written (parquet emits no files), so
                # there is nothing to read back — just checkpoint the buckets.
                if store:
                    store.mark_completed(run_id, wave_key, buckets,
                                         {"rows": 0, "kept": 0, "watermark": None})
                continue
            out = spark.read.parquet(output_path).filter(F.col("part_bucket").isin(buckets))
            lineage = (
                out.groupBy("part_bucket")
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum(F.col("verdict").cast("long")).alias("kept"),
                    F.max("warc_ts").alias("watermark"),
                )
                .withColumn("run_id", F.lit(run_id))
                .withColumn("wave", F.lit(wave_key))
            )
            lineage_rows = lineage.collect()
            if lineage_path:
                # per-wave dynamic partition overwrite, like metrics: a wave
                # re-run after a crash-between-lineage-and-checkpoint
                # replaces its partition instead of duplicating rows
                (lineage.write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("run_id", "wave")
                 .parquet(lineage_path))

            if store:
                kept = sum(r["kept"] or 0 for r in lineage_rows)
                rows = sum(r["rows"] for r in lineage_rows)
                watermark = max((r["watermark"] for r in lineage_rows if r["watermark"]), default=None)
                store.mark_completed(run_id, wave_key, buckets, {
                    "rows": int(rows), "kept": int(kept),
                    "watermark": watermark.isoformat() if watermark else None,
                })

        return {
            "run_id": run_id,
            "buckets_processed": sum(len(w) for w in wave_groups),
            "buckets_skipped": len(done),
            "rows": n_rows_total,
            "duration_sec": time.time() - t0,
            "metrics": all_metrics,
        }

    # ------------------------------------------------------------- analytics

    def domain_stats(self, scored: DataFrame) -> DataFrame:
        """Per-host-domain keep rates with two-phase salted aggregation.
        Web host-domain frequency is power-law (a handful of hosts own ~30%
        of rows); a naive groupBy(domain) puts those hosts' rows on single
        reducers. Salting fans each domain across `domain_salt` partial
        groups; the final reduce sees ≤ salt rows per domain."""
        domain = F.parse_url(F.col("url"), F.lit("HOST")).alias("domain")
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(self.domain_salt))
        partial = (
            scored.select(domain, salt.alias("__salt"), F.col("verdict"))
            .groupBy("domain", "__salt")
            .agg(F.count(F.lit(1)).alias("rows"), F.sum(F.col("verdict").cast("long")).alias("kept"))
        )
        return (
            partial.groupBy("domain")
            .agg(F.sum("rows").alias("rows"), F.sum("kept").alias("kept"))
            .withColumn("keep_rate", F.col("kept") / F.col("rows"))
        )
