"""Webtext pipeline tests: feature parity Spark↔pandas, langid/perplexity
behavior, golden-label F1, byte-identical scrub, and checkpointed resume."""

import math
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataqualityassistant_spark.fixtures import pages_batch, pages_spark_df, PAGES_SCHEMA
from dataqualityassistant_spark.functions.corpus import LANG_SENTENCES
from dataqualityassistant_spark.functions.langid import classify_text
from dataqualityassistant_spark.functions.perplexity import log_perplexity
from dataqualityassistant_spark.functions.scrub import scrub_text_column, scrub_text_python
from dataqualityassistant_spark.functions.text_features import (
    FEATURE_COLUMNS,
    pandas_text_features,
    with_text_features,
)
from dataqualityassistant_spark.plans.quality_filter import QualityFilterPipeline, default_webtext_rules
from dataqualityassistant_spark.webtext_oracle import oracle_score_pages


@pytest.fixture(scope="module")
def pages_pdf():
    return pages_batch(0, 600)


@pytest.fixture(scope="module")
def pages_sdf(spark, pages_pdf):
    return spark.createDataFrame(pages_pdf, schema=PAGES_SCHEMA)


# ----------------------------------------------------------- feature parity

def test_spark_features_match_pandas_mirror(spark, pages_pdf, pages_sdf):
    got = (
        with_text_features(pages_sdf.select("url", "text"))
        .orderBy("url")
        .toPandas()
        .set_index("url")
    )
    want = pandas_text_features(pages_pdf["text"])
    want.index = pages_pdf["url"]
    want = want.sort_index()
    for col in FEATURE_COLUMNS:
        g = got[col].astype(float)
        w = want[col].astype(float)
        both_nan = g.isna() & w.isna()
        close = (g - w).abs() < 1e-9
        ok = (both_nan | close).all()
        assert ok, f"feature {col} mismatch: {got[col][~(both_nan | close)].head()} vs {w[~(both_nan | close)].head()}"


# ----------------------------------------------------------------- langid

def test_langid_identifies_corpus_languages():
    for lang, sentences in LANG_SENTENCES.items():
        for s in sentences:
            assert classify_text(s)[0] == lang, (lang, s)


def test_langid_short_text_unknown():
    assert classify_text(None)[0] == "zz"
    assert classify_text("hi")[0] == "zz"


# -------------------------------------------------------------- perplexity

def test_perplexity_orders_clean_below_gibberish():
    clean = "The river carried the small boat past the old mill before the rain began."
    gibberish = "xqzrt plovng krzwfy qquualk jxobrn tlkxq zrtplo vngkrz"
    assert log_perplexity(clean) < log_perplexity(gibberish) - 0.5
    assert math.isnan(log_perplexity(None))
    assert math.isnan(log_perplexity(""))


# -------------------------------------------------------------------- scrub

def test_scrub_patterns():
    t = ("Write to john.doe@example.com or call +1 212-555-1234. "
         "SSN 123-45-6789, card 4111 1111 1111 1111, host 10.0.0.1, a frakking mess.")
    s = scrub_text_python(t)
    assert "[EMAIL]" in s and "[PHONE]" in s and "[SSN]" in s
    assert "[CARD]" in s and "[IP]" in s and "[REDACTED]" in s
    assert "john.doe" not in s and "4111" not in s and "frakking" not in s


def test_scrub_byte_identical_jvm_vs_python(spark, pages_pdf, pages_sdf):
    got = (
        pages_sdf.select("url", scrub_text_column("text").alias("scrubbed"))
        .orderBy("url")
        .toPandas()
    )
    want = pages_pdf.sort_values("url")["text"].map(scrub_text_python).reset_index(drop=True)
    for g, w in zip(got["scrubbed"], want):
        assert g == w or (g is None and w is None), f"scrub mismatch: {g!r} vs {w!r}"


# ------------------------------------------------------------ golden labels

def test_keep_drop_f1_vs_oracle(spark, pages_pdf, pages_sdf):
    rules = default_webtext_rules()
    want = oracle_score_pages(pages_pdf, rules).set_index("url")

    pipe = QualityFilterPipeline(rules=rules)
    got = pipe.score(pages_sdf).select("url", "verdict", "scrubbed_text").toPandas().set_index("url")

    merged = got.join(want, how="inner", lsuffix="_spark", rsuffix="_oracle")
    assert len(merged) == len(pages_pdf)
    tp = ((merged["verdict_spark"]) & (merged["verdict_oracle"])).sum()
    fp = ((merged["verdict_spark"]) & (~merged["verdict_oracle"])).sum()
    fn = ((~merged["verdict_spark"]) & (merged["verdict_oracle"])).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"F1 {f1}: fp={fp} fn={fn}"
    # byte-identical scrubbed text per url (north_rule invariant)
    mismatch = merged[
        merged["scrubbed_text_spark"].fillna("\0") != merged["scrubbed_text_oracle"].fillna("\0")
    ]
    assert mismatch.empty, mismatch.head()


# -------------------------------------------------------- pipeline run/resume

def test_pipeline_run_with_metrics_lineage_checkpoint(spark, tmp_path):
    pages = pages_spark_df(spark, 400, partitions=4)
    pipe = QualityFilterPipeline(n_buckets=8)
    out = str(tmp_path / "out")
    stats = pipe.run(
        spark, pages, out,
        metrics_path=str(tmp_path / "metrics"),
        lineage_path=str(tmp_path / "lineage"),
        checkpoint_path=str(tmp_path / "ckpt"),
        run_id="t1", waves=2,
    )
    assert stats["rows"] == 400
    assert stats["buckets_processed"] == 8

    written = spark.read.parquet(out)
    assert written.count() == 400
    assert {"url", "verdict", "scrubbed_text", "failed_rules", "part_bucket"} <= set(written.columns)
    assert "html" not in written.columns

    metrics = spark.read.parquet(str(tmp_path / "metrics"))
    # one row per (wave, row-local expectation)
    n_exp = len(pipe._expectation_metric_masks())
    assert metrics.count() == 2 * n_exp
    assert {"rule_name", "unexpected_count", "unexpected_percent", "success"} <= set(metrics.columns)

    lineage = spark.read.parquet(str(tmp_path / "lineage"))
    assert lineage.count() == 8  # one row per bucket
    agg = lineage.agg(F.sum("rows")).collect()[0][0]
    assert agg == 400


def test_pipeline_resume_is_idempotent(spark, tmp_path):
    pages = pages_spark_df(spark, 300, partitions=4)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pipe = QualityFilterPipeline(n_buckets=6)

    # simulate a crash: only 3 of 6 buckets complete
    s1 = pipe.run(spark, pages, out, checkpoint_path=ckpt, run_id="r", max_buckets=3)
    assert s1["buckets_processed"] == 3
    partial = spark.read.parquet(out).count()
    assert partial < 300

    # resume: processes only the remaining buckets
    s2 = pipe.run(spark, pages, out, checkpoint_path=ckpt, run_id="r")
    assert s2["buckets_skipped"] == 3
    assert s2["buckets_processed"] == 3

    final = spark.read.parquet(out)
    assert final.count() == 300  # no duplicates, no gaps
    assert final.select("url").distinct().count() == 300

    # re-run once more: everything checkpointed, nothing to do
    s3 = pipe.run(spark, pages, out, checkpoint_path=ckpt, run_id="r")
    assert s3["buckets_processed"] == 0
    assert spark.read.parquet(out).count() == 300


def test_domain_stats_salted(spark):
    pages = pages_spark_df(spark, 300, partitions=4)
    pipe = QualityFilterPipeline()
    stats = pipe.domain_stats(pipe.score(pages))
    rows = stats.collect()
    assert sum(r["rows"] for r in rows) == 300
    assert all(0 <= r["keep_rate"] <= 1 for r in rows)
    # zipf skew: top domain should carry >10% of rows
    assert max(r["rows"] for r in rows) > 30


def test_scrub_byte_parity_on_adversarial_corpus(spark):
    """JVM regexp_replace chain vs Python re on adversarial strings: regex
    metacharacters, unicode, newlines, partial PII shapes, replacement-token
    lookalikes. Byte-identical is the north-rule invariant."""
    import random
    rng = random.Random(99)
    atoms = [
        "a@b.co", "x@y", "@", "user.name+tag@sub.domain.org", "1.2.3.4",
        "999.999.999.999", "123-45-6789", "123-456-789", "4111 1111 1111 1111",
        "+1 212-555-0000", "555-0000", "(212) 555 0000", "frakking", "FRAKKING",
        "belgium!", "xbelgium", "[EMAIL]", "$1", "\\1", "…", "naïve café",
        "line\nbreak", "tab\there", "a" * 50, "12345678901234567", "#", "...",
        "e@e.ee e@e.ee", "dots...", "中文文本", "", " ",
    ]
    texts = [" ".join(rng.choice(atoms) for _ in range(rng.randint(1, 12)))
             for _ in range(300)] + [None]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i: long, text: string")
    got = (sdf.select("i", scrub_text_column("text").alias("s"))
           .orderBy("i").toPandas()["s"].tolist())
    want = [scrub_text_python(t) for t in texts]
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"row {i}: {texts[i]!r}\n jvm={g!r}\n  py={w!r}"


def test_pipeline_observe_metrics_equal_engine_metrics(spark, tmp_path):
    """The observe()-collected per-wave metrics summed across waves must
    equal a SuiteEngine pass over the same scored frame — the two metric
    paths (streaming-during-write vs dedicated aggregate) may never drift."""
    from dataqualityassistant_spark.operators.engine import SuiteEngine

    pages = pages_spark_df(spark, 300, partitions=4)
    pipe = QualityFilterPipeline(n_buckets=4)
    stats = pipe.run(spark, pages, str(tmp_path / "out"), run_id="m", waves=2)

    by_key = {}
    for m in stats["metrics"]:
        k = (m["rule_name"], m["expectation_type"], m["column"])
        agg = by_key.setdefault(k, {"unexpected": 0, "element": 0})
        agg["unexpected"] += m["unexpected_count"]
        agg["element"] += m["element_count"]

    suite = SuiteEngine(collect_samples=False).execute(
        pipe.score(pages), pipe.rules)
    for rr in suite["results"]:
        for er in rr["results"]:
            if "result" not in er or er["kwargs"].get("column") is None:
                continue
            k = (rr["rule_name"], er["expectation_type"], er["kwargs"]["column"])
            if k in by_key:
                assert by_key[k]["unexpected"] == er["result"]["unexpected_count"], k
                assert by_key[k]["element"] == er["result"]["element_count"], k


def test_jvm_features_match_mirror_on_unicode_whitespace(spark):
    # non-breaking space / thin space: JVM (?U)\\s must tokenize like Python \\s
    texts = ["foo\u00a0bar\u2009baz", "a\u00a0b", "tab\there", "nl\u0085end", None]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i: long, text: string")
    got = with_text_features(sdf).orderBy("i").toPandas()
    want = pandas_text_features(pd.Series(texts))
    for col in ("word_count", "mean_word_length", "alpha_word_ratio"):
        g, w = got[col].astype(float), want[col].astype(float)
        assert ((g.isna() & w.isna()) | (g == w)).all(), (col, g.tolist(), w.tolist())


def test_pipeline_empty_text_scores_are_null_not_nan(spark):
    # NaN from the scoring UDF must arrive as NULL so `between` masks treat
    # it like the pandas oracle (NaN passes value checks)
    sdf = spark.createDataFrame(
        [("u1", ""), ("u2", None), ("u3", "some real text here")],
        "url: string, text: string")
    from dataqualityassistant_spark.functions.scoring import with_text_scores
    row = {r["url"]: r for r in with_text_scores(sdf).collect()}
    assert row["u1"]["log_ppl"] is None          # empty text: NaN -> NULL
    assert row["u2"]["log_ppl"] is None
    assert row["u3"]["log_ppl"] is not None
    assert row["u1"]["top_2gram_char_frac"] is None


def test_resume_lineage_metrics_no_duplicates(spark, tmp_path):
    pages = pages_spark_df(spark, 200, partitions=4)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    lin, met = str(tmp_path / "lineage"), str(tmp_path / "metrics")
    pipe = QualityFilterPipeline(n_buckets=4)
    pipe.run(spark, pages, out, lineage_path=lin, metrics_path=met,
             checkpoint_path=ckpt, run_id="r", max_buckets=2)
    pipe.run(spark, pages, out, lineage_path=lin, metrics_path=met,
             checkpoint_path=ckpt, run_id="r")
    lineage = spark.read.parquet(lin)
    # exactly one lineage row per bucket across both runs
    assert lineage.count() == 4
    assert lineage.select("part_bucket").distinct().count() == 4
    assert lineage.agg(F.sum("rows")).collect()[0][0] == 200
    metrics = spark.read.parquet(met)
    n_exp = len(pipe._expectation_metric_masks())
    # one metrics row per (wave, expectation); 2 waves total, no dupes
    assert metrics.count() == 2 * n_exp
    assert metrics.select("wave").distinct().count() == 2


def test_streaming_filter_exactly_once(spark, tmp_path):
    """readStream -> foreachBatch(score+write): drain with availableNow,
    then add more files and drain again — streaming checkpoint must process
    each input file exactly once (no reprocessing of batch 1's files)."""
    from dataqualityassistant_spark.streaming.stream_filter import start_stream
    from dataqualityassistant_spark.fixtures import pages_batch, PAGES_SCHEMA

    inp = str(tmp_path / "landing")
    out = str(tmp_path / "scored")
    ckpt = str(tmp_path / "stream_ckpt")

    spark.createDataFrame(pages_batch(0, 80), PAGES_SCHEMA).write.mode("append").parquet(inp)
    q = start_stream(spark, inp, out, ckpt, trigger_once=True)
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    assert first == 80

    spark.createDataFrame(pages_batch(80, 120), PAGES_SCHEMA).write.mode("append").parquet(inp)
    q = start_stream(spark, inp, out, ckpt, trigger_once=True)
    q.awaitTermination(120)
    final = spark.read.parquet(out)
    assert final.count() == 120                       # 40 new rows, no dupes
    assert final.select("url").distinct().count() == 120
    assert {"verdict", "scrubbed_text", "batch_id"} <= set(final.columns)


def test_streaming_replayed_batch_is_idempotent(spark, tmp_path):
    """At-least-once delivery × idempotent sink = exactly-once output: calling
    the foreachBatch processor twice with the SAME batch_id (a replayed
    micro-batch after a crash-before-checkpoint-commit) must leave exactly
    one copy of the rows and metrics; a different batch_id appends."""
    from dataqualityassistant_spark.streaming.stream_filter import make_batch_processor

    out = str(tmp_path / "scored")
    met = str(tmp_path / "metrics")
    pipe = QualityFilterPipeline(n_buckets=4)
    process = make_batch_processor(pipe, out, metrics_path=met)

    batch0 = spark.createDataFrame(pages_batch(0, 60), PAGES_SCHEMA)
    process(batch0, 0)
    process(batch0, 0)  # replay of batch 0
    final = spark.read.parquet(out)
    assert final.count() == 60                       # no duplicates
    assert final.select("url").distinct().count() == 60
    n_exp = len(pipe._expectation_metric_masks())
    assert spark.read.parquet(met).count() == n_exp  # metrics not duplicated

    batch1 = spark.createDataFrame(pages_batch(60, 100), PAGES_SCHEMA)
    process(batch1, 1)                               # new batch appends
    assert spark.read.parquet(out).count() == 100
    assert spark.read.parquet(met).count() == 2 * n_exp

    # empty micro-batch (availableNow edge case): no-op, nothing written
    empty = spark.createDataFrame([], PAGES_SCHEMA)
    process(empty, 2)
    assert spark.read.parquet(out).count() == 100


def test_output_drops_raw_text_by_default(spark, tmp_path):
    """The persisted output is the scrubbed corpus: raw `text` is scored but
    not written (the input table already holds it; duplicating doubles output
    volume at scale). output_drop_columns=() keeps everything."""
    pages = pages_spark_df(spark, 100, partitions=2)
    out = str(tmp_path / "out")
    QualityFilterPipeline(n_buckets=2).run(spark, pages, out, run_id="d")
    cols = set(spark.read.parquet(out).columns)
    assert "text" not in cols and {"scrubbed_text", "verdict", "url"} <= cols

    out2 = str(tmp_path / "out2")
    QualityFilterPipeline(n_buckets=2, output_drop_columns=()).run(spark, pages, out2, run_id="d")
    assert "text" in set(spark.read.parquet(out2).columns)


def test_stateful_domain_stats_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState: the per-domain running totals must persist in
    the streaming state store across separate drains (new files between
    availableNow triggers), and the latest changelog row per domain must
    equal the batch-mode domain_stats on the union of all input."""
    from dataqualityassistant_spark.streaming.stateful import start_domain_stats_stream

    inp, out, ckpt = (str(tmp_path / d) for d in ("landing", "stats", "ckpt"))
    pipe = QualityFilterPipeline()

    spark.createDataFrame(pages_batch(0, 120), PAGES_SCHEMA).write.mode("append").parquet(inp)
    q = start_domain_stats_stream(spark, inp, out, ckpt, pipeline=pipe, trigger_once=True)
    q.awaitTermination(120)

    spark.createDataFrame(pages_batch(120, 200), PAGES_SCHEMA).write.mode("append").parquet(inp)
    q = start_domain_stats_stream(spark, inp, out, ckpt, pipeline=pipe, trigger_once=True)
    q.awaitTermination(120)

    log = spark.read.parquet(out).toPandas()
    # unparseable URLs keep a NULL domain on BOTH sides now (stream ==
    # batch); normalize null to "" identically, purely for the merge key
    latest = (log.sort_values("batch_id")
              .groupby("domain", dropna=False).last().reset_index())
    latest["domain"] = latest["domain"].fillna("")

    pages = spark.createDataFrame(pages_batch(0, 200), PAGES_SCHEMA)
    want = pipe.domain_stats(pipe.score(pages)).toPandas()
    want["domain"] = want["domain"].fillna("")
    merged = latest.merge(want, on="domain", suffixes=("_stream", "_batch"))
    assert len(merged) == len(want)
    assert (merged["rows_stream"] == merged["rows_batch"]).all()
    assert (merged["kept_stream"] == merged["kept_batch"]).all()
    assert int(latest["rows"].sum()) == 200  # state accumulated, not reset


def test_stateful_idle_timeout_evicts_drained_domain(spark, tmp_path):
    """idle_timeout_ms bounds state for domains never seen again: after the
    timer expires, the next processed micro-batch emits one final
    evicted=True changelog row carrying the domain's last totals and removes
    its state, so a later reappearance restarts from zero.

    Runs domain_running_stats directly on pre-scored rows. availableNow +
    processing-time timers never self-terminates (Spark keeps ticking empty
    micro-batches to service future timers), so the test polls the changelog
    for the expected rows and stops the query explicitly."""
    import time

    from pyspark.sql import functions as SF_
    from dataqualityassistant_spark.streaming.stateful import domain_running_stats

    inp, out, ckpt = (str(tmp_path / d) for d in ("landing", "stats", "ckpt"))
    schema = "url string, verdict boolean"

    def rows(domain, start, n):
        return [(f"https://{domain}/p/{i:06d}", True) for i in range(start, start + n)]

    def start_query():
        stream = spark.readStream.schema(schema).parquet(inp)
        updates = domain_running_stats(stream, idle_timeout_ms=2000)

        def sink(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            (batch_df.withColumn("batch_id", SF_.lit(batch_id)).coalesce(1)
             .write.mode("append").parquet(out))

        return (updates.writeStream.outputMode("update").foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    def poll_until(predicate, q, seconds=90):
        deadline = time.time() + seconds
        while time.time() < deadline:
            try:
                log = spark.read.parquet(out).toPandas()
            except Exception:
                log = None
            if log is not None and predicate(log):
                return log
            time.sleep(1)
        q.stop()
        raise AssertionError("condition not reached within the poll window")

    # run 1: both domains get data, then (no further files) both time out
    spark.createDataFrame(rows("a.example", 0, 5) + rows("b.example", 0, 3),
                          schema).write.mode("append").parquet(inp)
    q = start_query()
    log = poll_until(lambda l: l["evicted"].sum() >= 2, q)
    q.stop()
    a = log[log["domain"] == "a.example"].sort_values("batch_id")
    b = log[log["domain"] == "b.example"].sort_values("batch_id")
    # eviction rows carry the FINAL totals, after the normal data rows
    assert list(a["rows"]) == [5, 5] and list(a["evicted"]) == [False, True], a
    assert list(b["rows"]) == [3, 3] and list(b["evicted"]) == [False, True], b

    # run 2 (same checkpoint): b returns — its state was removed, so totals
    # restart from zero instead of resuming at 3
    n_rows_run1 = len(log)
    spark.createDataFrame(rows("b.example", 100, 4), schema) \
        .write.mode("append").parquet(inp)
    q = start_query()
    log = poll_until(lambda l: len(l) > n_rows_run1, q)
    q.stop()
    b2 = log[log["domain"] == "b.example"].sort_values("batch_id").iloc[-1]
    assert b2["rows"] == 4 and not b2["evicted"], log


def test_html_extraction_byte_parity(spark):
    """JVM html→text chain vs Python re on adversarial html: nested/unclosed
    tags, scripts/styles with angle brackets inside, entities (incl. the
    &amp;lt; double-encode trap), unicode, invalid UTF-8 bytes, null."""
    from dataqualityassistant_spark.functions.html_text import (
        html_to_text_column, html_to_text_python)

    samples = [
        b"<html><body>plain prose here</body></html>",
        b"<SCRIPT>var x = '<div>' < 3;</SCRIPT>visible<style a=b>h1 {x}</style>",
        b"<!-- c --><p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>",
        b"&amp;lt; stays as &lt; literal",
        "café <b>naïve</b> 中文".encode(),
        b"broken <unclosed and > stray < solo",
        b"ws\t\n  collapse\xc2\xa0nbsp-byte",
        b"invalid \xff\xfe bytes",
        # truncated pages: unterminated script/style must NOT leak the block
        # body as visible text (stripped to end-of-input)
        b"before <script>var leaked = 'should not appear'",
        b"before <style type=text/css>body { hidden: true }",
        b"<script>closed()</script> kept <script>trunc",
        b"",
        None,
    ]
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i: long, html: binary")
    got = (sdf.select("i", html_to_text_column("html").alias("t"))
           .orderBy("i").toPandas()["t"].tolist())
    want = [html_to_text_python(s) for s in samples]
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"row {i}: {samples[i]!r}\n jvm={g!r}\n  py={w!r}"
    # not just parity: the truncated blocks' bodies must actually be gone
    assert "leaked" not in want[-5] and want[-5] == "before"
    assert "hidden" not in want[-4] and want[-4] == "before"
    assert want[-3] == "kept"


def test_pipeline_extracts_text_from_html_when_missing(spark):
    from dataqualityassistant_spark.functions.html_text import html_to_text_python

    rows = [
        ("https://a.example/x", None, b"<html><body>Recovered body text that is "
         b"long enough to score like a document.</body></html>", None, "en"),
        ("https://a.example/y", None, b"<p>second &amp; done</p>", "given text wins", "en"),
    ]
    pdf = spark.createDataFrame(
        [(u, None, bytearray(h), t, l) for u, _, h, t, l in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    pipe = QualityFilterPipeline(extract_text_from_html=True)
    got = {r["url"]: r for r in pipe.score(pdf).select("url", "scrubbed_text", "n_chars").collect()}
    extracted = html_to_text_python(rows[0][2])
    assert got["https://a.example/x"]["n_chars"] == len(extracted)
    assert got["https://a.example/y"]["scrubbed_text"] == "given text wins"
    # default pipeline leaves missing text missing
    got_off = {r["url"]: r for r in QualityFilterPipeline().score(pdf).select("url", "n_chars").collect()}
    assert got_off["https://a.example/x"]["n_chars"] is None


def test_pipeline_optin_sampling_and_canonical_urls(spark):
    from dataqualityassistant_spark.fixtures import pages_spark_df
    from dataqualityassistant_spark.plans.quality_filter import QualityFilterPipeline
    from pyspark.sql import functions as F

    pages = pages_spark_df(spark, 2000)
    base = QualityFilterPipeline()
    piped = QualityFilterPipeline(
        canonicalize_urls=True,
        sample_fractions={"en": 0.5},
        sample_default_fraction=0.1,
    )
    full = base.score(pages)
    sampled = piped.score(pages)
    n_full, n_sampled = full.count(), sampled.count()
    assert 0 < n_sampled < n_full
    # deterministic: a second plan over the same input keeps the exact rows
    again = {r["url"] for r in piped.score(pages).select("url").collect()}
    assert {r["url"] for r in sampled.select("url").collect()} == again
    # canonicalization really ran: no uppercase scheme/host, no utm params
    assert sampled.where(F.col("url").rlike("^HTTPS|utm_")).count() == 0
    # score() is purely row-level, and sampling/canonicalization must ride
    # the scan: NO exchange anywhere in the whole scored plan
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pipeline_input_split_bytes_scoped(spark, tmp_path):
    from dataqualityassistant_spark.fixtures import pages_spark_df
    from dataqualityassistant_spark.plans.quality_filter import QualityFilterPipeline

    key = "spark.sql.files.maxPartitionBytes"
    before = spark.conf.get(key)
    pages = pages_spark_df(spark, 500)
    out = str(tmp_path / "scored")
    pipe = QualityFilterPipeline(n_buckets=4, input_split_bytes="8m")
    stats = pipe.run(spark, pages, out, run_id="split-test")
    assert stats["rows"] == 500
    assert spark.conf.get(key) == before  # restored after the run


def test_stateful_stream_rejects_trigger_once_with_idle_timeout(spark, tmp_path):
    """availableNow + processing-time timers never self-terminates (Spark
    ticks empty batches forever to service timers) — the combination must
    be rejected up front instead of wedging awaitTermination."""
    from dataqualityassistant_spark.streaming.stateful import start_domain_stats_stream

    with pytest.raises(ValueError, match="idle_timeout_ms"):
        start_domain_stats_stream(
            spark, str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "ckpt"), trigger_once=True, idle_timeout_ms=1000)


def test_feature_parity_on_control_and_unicode_whitespace(spark):
    """JVM (?U)\\s == Unicode White_Space; Python \\s additionally matches
    \\x1c-\\x1f. The mirror now uses the exact Java set (PY_WS_RE), so CRLF,
    NBSP, NEL, and C0-separator text must produce identical features on
    both sides — these are exactly the inputs the fixture corpus lacks."""
    from dataqualityassistant_spark.functions.html_text import (
        html_to_text_column,
        html_to_text_python,
    )

    texts = [
        "hello world\r\nsecond line\r\n",     # CRLF: \r must trim from lines
        "one\n\r\ntwo",                        # '\r'-only line is empty
        "x\n\xa0\ny",                          # NBSP-only line is empty
        "a\x1cb word",                         # C0 FS: NOT whitespace (Java)
        "pad ded words",             # unicode spaces split words
        "tab\tand\x85nel",                     # NEL splits on both sides
        " \x1c lead\x1d trail \x1e ",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    got = with_text_features(df).toPandas()
    want = pandas_text_features(pd.Series(texts))
    for col in FEATURE_COLUMNS:
        g = got[col].astype(float)
        w = want[col].astype(float).reset_index(drop=True)
        ok = ((g.isna() & w.isna()) | ((g - w).abs() < 1e-9)).all()
        assert ok, f"{col}: spark={list(g)} mirror={list(w)}"
    # html collapse byte parity on the same adversarial set
    hdf = spark.createDataFrame([(t.encode(),) for t in texts], "html: binary")
    hg = [r[0] for r in hdf.select(html_to_text_column("html")).collect()]
    hw = [html_to_text_python(t.encode()) for t in texts]
    assert hg == hw, list(zip(hg, hw))
