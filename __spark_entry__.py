"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the expectation-suite engine's single-pass
metrics over the sf0.001 documents table.
``queries()`` / ``oracle_sql()`` — one pair per implemented operator from
SURVEY.md §2 plus the training-data ops; oracles are ANSI SQL for DuckDB
over the same parquet views. Ops that SQL cannot express directly (the
hash/model-based family: minhash/simhash/LSH/IVF, langid, perplexity,
doc signals (winnowing + zlib), xxhash64 sampling, FFD packing, near-dup
survivors) get
literal oracles: the expected output is recomputed serially driver-side
(shared pure scoring functions + independent plain-Python bucketing /
hashing / union-find logic, see ``oracles.py``) and rendered as DuckDB
VALUES/IN literals, so ALL queries are value-checked (not just
row-counted) — every ``queries()`` key has an ``oracle_sql()`` entry.

All computed columns are aliased identically on both sides; counts are cast
to BIGINT (DuckDB SUM yields HUGEINT otherwise) and ratios computed as
CAST(x AS DOUBLE)/CAST(y AS DOUBLE) in the same operation order so the
value hashes match bit-for-bit.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from dataqualityassistant_spark.rules import Rule
from dataqualityassistant_spark.operators.engine import SuiteEngine
from dataqualityassistant_spark.ops.dedup import (
    exact_dedup,
    dedup_clusters,
    drop_near_duplicates,
    minhash_signatures,
    minhash_candidate_pairs,
    simhash,
    simhash_candidate_pairs,
    ngram_jaccard_pairs,
)
from dataqualityassistant_spark.ops.similarity import (
    cosine_topk,
    ann_topk_lsh,
    embedding_near_dup_pairs,
)
from dataqualityassistant_spark.ops.joins import asof_join
from dataqualityassistant_spark.ops.decontaminate import contamination_hits
from dataqualityassistant_spark.ops.ivf import ivf_topk, train_ivf_centroids
from dataqualityassistant_spark.ops.packing import pack_sequences
from dataqualityassistant_spark.ops.sampling import (
    hash_topn_sample,
    mix_corpus,
    stratified_hash_sample,
)
from dataqualityassistant_spark.ops.skew import two_phase_distinct_count
from dataqualityassistant_spark.ops.urltools import registered_domain, url_dedup
from dataqualityassistant_spark.ops.textstats import (
    TOKEN_PATTERN,
    remove_repeated_lines,
    with_compression_ratio,
    with_fingerprints,
)
from dataqualityassistant_spark.functions.scrub import SCRUB_PATTERNS, scrub_text_column
from dataqualityassistant_spark.functions.langid import langid_udf
from dataqualityassistant_spark.functions.normalize import normalize_text_column
from dataqualityassistant_spark.functions.perplexity import perplexity_udf
from dataqualityassistant_spark.oracles import fixture_oracle_sql
from dataqualityassistant_spark.streaming.windowed import windowed_counts


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# expectation metric helpers (shared by several queries)

def _metric_df(spark, df, expectation_type, kwargs):
    """One-row DataFrame of the reference metric triple for one expectation,
    computed by the single-pass engine."""
    suite = SuiteEngine(collect_samples=False).execute(
        df, [Rule(id=1, name="q", rule_config=[{"expectation_type": expectation_type, "kwargs": kwargs}])]
    )
    r = suite["results"][0]["results"][0]["result"]
    return spark.createDataFrame(
        [(int(r["element_count"]), int(r["unexpected_count"]), float(r["unexpected_percent"]),
          bool(suite["results"][0]["results"][0]["success"]))],
        "element_count bigint, unexpected_count bigint, unexpected_percent double, success boolean",
    )


_METRIC_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS element_count,
       CAST({u} AS BIGINT) AS unexpected_count,
       CASE WHEN COUNT(*) > 0
            THEN (CAST({u} AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 100.0
            ELSE 0.0 END AS unexpected_percent,
       (CASE WHEN COUNT(*) > 0
             THEN (CAST({u} AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 100.0
             ELSE 0.0 END) <= CAST('{allow}' AS DOUBLE) AS success
FROM {table}
"""


def _metric_sql(table: str, unexpected_expr: str, mostly: float = 1.0) -> str:
    # repr() keeps full float64 precision; the CAST-from-string avoids
    # DuckDB parsing the literal as DECIMAL (different comparison semantics
    # than the engine's float64 `<=`, reference quality_engine.py:241).
    return _METRIC_SQL.format(u=unexpected_expr, allow=repr((1 - mostly) * 100.0), table=table)


# --------------------------------------------------------------------------

# NOTE (round 5): the driver records exactly 50 CORRECTNESS rows per round,
# so the contract is consolidated to EXACTLY 50 queries. The former
# exp_not_null_text / exp_in_set_lang / exp_between_nchars / exp_unique_user
# micro-queries were retired — their arithmetic is hash-identical to the four
# suite_documents rows (same compiler paths, driver-checked there) — and
# fingerprints + compression_ratio merged into the single doc_signals query.

def q_exp_regex_source(spark, sf_dir):
    return _metric_df(spark, _t(spark, sf_dir, "documents"),
                      "expect_column_values_to_match_regex",
                      {"column": "source", "regex": "src[0-9]+"})


def q_exp_pair_greater(spark, sf_dir):
    return _metric_df(spark, _t(spark, sf_dir, "lineitem"),
                      "expect_column_values_to_be_greater_than_other_column",
                      {"column": "l_extendedprice", "compare_to": "l_quantity"})


def q_exp_fk_membership(spark, sf_dir):
    return _metric_df(spark, _t(spark, sf_dir, "orders"),
                      "expect_column_values_to_be_in_table_set",
                      {"column": "o_custkey", "ref_table": f"{sf_dir}/customer.parquet",
                       "ref_column": "c_custkey"})


def q_exp_json_parseable(spark, sf_dir):
    return _metric_df(spark, _t(spark, sf_dir, "events"),
                      "expect_column_values_to_be_json_parseable",
                      {"column": "props"})


def q_exp_mean_between(spark, sf_dir):
    return _metric_df(spark, _t(spark, sf_dir, "lineitem"),
                      "expect_column_mean_to_be_between",
                      {"column": "l_quantity", "min_value": 10.0, "max_value": 40.0})


def q_exp_increasing_value(spark, sf_dir):
    return _metric_df(spark, _t(spark, sf_dir, "events"),
                      "expect_column_values_to_be_increasing",
                      {"column": "value", "order_by": ["ts", "event_id"],
                       "partition_by": ["user_id"], "mostly": 0.3})


def q_exp_zscore_quantity(spark, sf_dir):
    return _metric_df(spark, _t(spark, sf_dir, "lineitem"),
                      "expect_column_value_z_scores_to_be_less_than",
                      {"column": "l_quantity", "threshold": 1.5, "mostly": 0.8})


def q_embedding_near_dups(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.5, exhaustive=True)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_suite_documents(spark, sf_dir):
    """Whole suite in one engine pass; one output row per expectation."""
    rules = [
        Rule(id=1, name="docs_basic", rule_config=[
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "text", "mostly": 0.9}},
            {"expectation_type": "expect_column_values_to_be_in_set",
             "kwargs": {"column": "lang", "value_set": ["en", "de", "fr", "es"], "mostly": 0.8}},
        ]),
        Rule(id=2, name="docs_shape", rule_config=[
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "n_chars", "min_value": 100, "max_value": 5000, "mostly": 0.5}},
            {"expectation_type": "expect_column_values_to_be_unique",
             "kwargs": {"column": "doc_id"}},
        ]),
    ]
    suite = SuiteEngine(collect_samples=False).execute(_t(spark, sf_dir, "documents"), rules)
    rows = []
    for rr in suite["results"]:
        for er in rr["results"]:
            rows.append((rr["rule_name"], er["expectation_type"],
                         int(er["result"]["element_count"]),
                         int(er["result"]["unexpected_count"]), bool(er["success"])))
    return spark.createDataFrame(
        rows, "rule_name string, expectation_type string, element_count bigint, "
              "unexpected_count bigint, success boolean")


def q_word_stats(spark, sf_dir):
    docs = _spread_if_big(spark, sf_dir, "documents")
    # explicit ASCII class == RE2 \s (the oracle engine); Java \s would
    # additionally swallow \x0B and silently diverge on such text
    words = F.filter(F.split(F.col("text"), "[ \t\n\f\r]+"), lambda w: w != F.lit(""))
    return docs.select(
        "doc_id",
        F.when(F.col("text").isNotNull(), F.size(words)).cast("bigint").alias("word_count"),
        F.length("text").cast("bigint").alias("len_chars"),
    )


def q_token_counts(spark, sf_dir):
    docs = _spread_if_big(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("text").isNotNull(),
               F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), F.lit(0))))
        .cast("bigint").alias("token_count"),
    )


def q_dedup_exact(spark, sf_dir):
    return exact_dedup(_t(spark, sf_dir, "documents")).select("doc_id")


def q_scrub_pii(spark, sf_dir):
    # spread: the 6-regex JVM chain is the most compute-heavy pure-JVM
    # projection in the contract — single-row-group input serialized it
    # (measured 2.7 s single-task vs 0.5 s spread at sf1.0; the per-byte
    # work is heavy enough that the break-even sits lower than the default
    # — sf0.1 measured 0.41 s unspread vs 0.23 s spread)
    docs = _spread_if_big(spark, sf_dir, "documents", min_bytes=256 << 10)
    return docs.select("doc_id", scrub_text_column("text").alias("scrubbed"))


def q_topk_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    top = cosine_topk(emb, q, k=10)
    return top.select("vec_id", F.round(F.col("cosine"), 6).alias("cosine"))


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1996-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3_like(spark, sf_dir):
    """Join-heavy shape (customer ⋈ orders ⋈ lineitem): Catalyst broadcasts
    the small dimensions; revenue top-10 via TakeOrderedAndProject."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "o_orderdate", "revenue")
    )


def q_user_session_stats(spark, sf_dir):
    """Sessionization via lag + cumulative windows: a new session starts
    after a >30 min gap; returns per-user session counts."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet TIMESTAMP reads as TIMESTAMP_NTZ, which has no direct numeric
    # cast; via timestamp_ltz (UTC session) then DOUBLE it matches DuckDB's
    # fractional epoch() — a long cast would floor to whole seconds and flip
    # session verdicts for gaps within 1s of the 1800s boundary
    secs = F.col("ts").cast("timestamp_ltz").cast("double")
    gap = secs - F.lag(secs).over(w)
    with_start = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    return (
        with_start.groupBy("user_id")
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions"),
             F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )


def q_topk_events_per_user(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    # explicit repartition = the window's one exchange, exempt from AQE
    # coalescing (which folds this small sort into ONE task: 1.4 -> 0.5 s
    # at sf1.0); row_number over the unique (value desc, event_id) order is
    # placement-independent
    return (
        ev.repartition(spark.sparkContext.defaultParallelism, "user_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


def q_asof_clicks(spark, sf_dir):
    """As-of join: attach the most recent click at-or-before each error,
    per user (union + running-last: ONE hash exchange, zero join operators
    — plan shape asserted in tests/test_joins.py). Oracle: DuckDB's native
    ASOF LEFT JOIN — a fully independent implementation of the semantics."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.col("value").alias("click_value"))
    j = asof_join(errors, clicks, on="user_id")
    sec = lambda c: F.col(c).cast("timestamp_ltz").cast("double")  # noqa: E731
    return j.select(
        "event_id", "user_id", "click_id", "click_value",
        (sec("ts") - sec("ts_right")).alias("gap_seconds"))


def q_asof_next_purchase(spark, sf_dir):
    """Forward as-of: the first purchase at-or-after each signup, per user
    — same union+running-last plan with descending traversal. Oracle:
    DuckDB ASOF LEFT JOIN with `<=` (nearest following row)."""
    ev = _t(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"))
    j = asof_join(signups, purchases, on="user_id", direction="forward")
    sec = lambda c: F.col(c).cast("timestamp_ltz").cast("double")  # noqa: E731
    return j.select("event_id", "user_id", "purchase_id",
                    (sec("ts_right") - sec("ts")).alias("wait_seconds"))


def q_asof_clicks_bucketed(spark, sf_dir):
    """The hot-key-safe as-of variant (r4): same most-recent-click-before-
    each-error join but with a bounded tolerance (1h) and
    ``bucket_seconds=tolerance`` — the window partitions on
    (user_id, floor(ts/3600)) so one hot user spreads over many tasks
    (plan + spread asserted in tests/test_joins.py). Oracle: DuckDB native
    ASOF LEFT JOIN with the tolerance applied as a post-filter CASE —
    independent implementation of both the as-of semantics AND the
    tolerance semantics."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.col("value").alias("click_value"))
    j = asof_join(errors, clicks, on="user_id", tolerance=3600.0,
                  bucket_seconds=3600.0)
    sec = lambda c: F.col(c).cast("timestamp_ltz").cast("double")  # noqa: E731
    return j.select(
        "event_id", "user_id", "click_id", "click_value",
        (sec("ts") - sec("ts_right")).alias("gap_seconds"))


def q_url_dedup(spark, sf_dir):
    """URL canonicalization + dedup: a deterministically messy URL is built
    from doc_id (mixed case, www., :443, utm_* trackers, fragment) and
    collapsed by `ops.urltools.url_dedup`. The oracle does NOT mirror the
    regex chain — it states the expected canonical form directly from the
    same doc_id arithmetic, so the canonicalizer is checked against an
    independent spec."""
    docs = _spread_if_big(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("HTTPS://WWW.Src"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM:443/p/"), (F.col("doc_id") % 17).cast("string"),
        F.lit("?utm_source=feed&id="), (F.col("doc_id") % 17).cast("string"),
        F.lit("&utm_campaign=x"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("#frag")).otherwise(F.lit("")))
    return url_dedup(docs.select("doc_id", messy.alias("url")))


def q_domain_distribution(spark, sf_dir):
    """Per-registered-domain page counts — the host-skew profile every
    crawl pipeline starts from. Messy URL built from doc_id (userinfo,
    mixed-case host, port, deep subdomain); the oracle states the expected
    registered domain from the same arithmetic, independent of the
    extraction regexes."""
    docs = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("https://user:pw@Crawl"), (F.col("doc_id") % 3).cast("string"),
        F.lit(".CDN.Host"), (F.col("doc_id") % 11).cast("string"),
        F.lit(".NET:8443/p/"), F.col("doc_id").cast("string"))
    return (
        docs.select(registered_domain(messy).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pages"))
    )


def q_profile_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("text")).cast("bigint").alias("n_null_text"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        (F.sum(F.length("text")).cast("double") / F.count("text").cast("double")).alias("avg_len"),
    )


def q_events_windowed(spark, sf_dir):
    """Tumbling event-time windows via F.window — the SAME plan runs
    streaming with a watermark (streaming/windowed.py; append-mode
    finalization + late-drop asserted in tests/test_windowed_streaming.py).
    Oracle: DuckDB time_bucket (windows align to the epoch on both)."""
    ev = _t(spark, sf_dir, "events")
    out = windowed_counts(ev, keys=["event_type"], window="30 minutes", watermark=None)
    return out.select("window_start", "window_end", "event_type", "n",
                      F.round("avg_value", 6).alias("avg_value"))


def q_length_quantiles(spark, sf_dir):
    """Per-language length quantiles — the profiling aggregate that feeds
    min/max-length rule suggestions. Exact `percentile` here (sort-based,
    bit-comparable to DuckDB's quantile_cont); at 100 TB use
    `approx_percentile` instead — same plan shape, mergeable sketch, no
    per-group sort (tests/test_ops.py asserts the sketch lands within 1%
    of exact on this distribution)."""
    docs = _t(spark, sf_dir, "documents")
    pct = F.percentile("n_chars", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)))
    return (
        docs.where(F.col("n_chars").isNotNull())
        .groupBy("lang")
        .agg(pct.alias("q"), F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select("lang", F.col("q")[0].alias("p25"), F.col("q")[1].alias("p50"),
                F.col("q")[2].alias("p75"), F.col("q")[3].alias("p95"), "n_docs")
    )


def q_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.min("value").alias("min_value"),
             F.max("value").alias("max_value"))
    )


def q_distinct_users_by_type(spark, sf_dir):
    """Per-key distinct count in the hot-key-safe shape: dedupe on
    (key, value) — the hot key's rows spread over the cluster — then merge
    per-key counts. Plan asserted two-exchange in tests/test_skew.py; a
    naive COUNT(DISTINCT) concentrates one giant hash set per hot key."""
    return two_phase_distinct_count(_t(spark, sf_dir, "events"), "event_type", "user_id")


def q_fk_orphan_orders(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    orphans = orders.join(F.broadcast(cust.select("c_custkey")),
                          orders.o_custkey == cust.c_custkey, "left_anti")
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("orphan_count"))


def q_ngram_jaccard_dups(spark, sf_dir):
    """Exact 3-gram Jaccard pairs over documents ∪ (documents re-keyed) —
    every doc pairs with its copy at jaccard 1.0; SQL-expressible oracle."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("text").isNotNull())
    shifted = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    # materialize=True: shingle cache released per call (no per-invocation
    # leak — same rationale as q_minhash_dup_pairs). _spread: the shingle
    # cache build is the expensive phase; from a 1-file input it would run
    # at 2-split parallelism (same note as q_langid_docs)
    # max_shingle_df=None: the DuckDB oracle computes UNCAPPED textbook
    # Jaccard, so the engine side must opt out of the default hot-shingle
    # cap — at sf0.01 the cap never bites (max shingle DF ~14) but at larger
    # SF it would change denominators and silently diverge from the oracle
    pairs = ngram_jaccard_pairs(_spread(spark, docs.unionByName(shifted)),
                                n=3, threshold=0.999, materialize=True,
                                max_shingle_df=None)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_clusters(spark, sf_dir):
    """Transitive pair→cluster closure: chain doc→copy→second-copy edges so
    clusters require real propagation (not just pair mirroring); oracle is a
    DuckDB recursive CTE computing min-reachable-id per node."""
    docs = _t(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 100)
    e1 = docs.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1000000).alias("id_b"))
    e2 = docs.select((F.col("doc_id") + 1000000).alias("id_a"), (F.col("doc_id") + 2000000).alias("id_b"))
    # plus a cross-link joining clusters of doc 0 and doc 1 into one component
    link = spark.createDataFrame([(1000000, 2000001)], "id_a: bigint, id_b: bigint")
    pairs = e1.unionByName(e2).unionByName(link)
    return dedup_clusters(pairs).select("doc_id", "cluster_id")


def q_normalize_text(spark, sf_dir):
    """Unicode normalization: a decomposed 'cafe'+combining-acute plus a
    zero-width space is appended deterministically; the op must strip the
    zero-width char (JVM regexp) and NFC-compose the accent (Arrow UDF).
    Oracle states the expected composed string directly — an independent
    spec, not a replay of the regexp/NFC chain."""
    docs = _t(spark, sf_dir, "documents")
    built = F.concat(F.col("text"), F.lit(" cafe\u0301\u200b"))
    return docs.select("doc_id", normalize_text_column(built).alias("normalized"))


def q_dedup_lines(spark, sf_dir):
    """Within-document repeated-line removal (C4 repetition cleanup): a
    3-line document is constructed deterministically (text, text again, a
    50-char prefix) and collapsed to first occurrences. Oracle: DuckDB
    order-preserving distinct via list_position."""
    docs = _t(spark, sf_dir, "documents")
    built = F.concat_ws("\n", F.col("text"), F.col("text"), F.substring("text", 1, 50))
    return docs.select("doc_id", remove_repeated_lines(built).alias("cleaned"))


def q_contamination_hits(spark, sf_dir):
    """Benchmark decontamination: every 50th doc plays the eval set; count
    distinct shared word 5-grams per training doc. Corpus shingles are an
    explode generator (no shuffle); the benchmark shingle set is broadcast;
    only matched rows reach the hit-count agg."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0).select("text")
    return contamination_hits(docs, bench, n=5)


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary: top-200 tokens by document-and-occurrence count —
    the tokenizer-training precursor (explode → two-phase hash agg → top-k
    via TakeOrderedAndProject; no global sort)."""
    docs = _spread_if_big(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), F.lit(0))).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("occurrences"),
             F.count_distinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("occurrences"), "token")
        .limit(200)
    )


# ---- non-SQL-expressible ops: queries-only (rows-only driver check) ----

def q_minhash_dup_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").where(F.col("text").isNotNull())
    shifted = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    # single-file input = 1-2 splits; spread signature computation across cores
    both = docs.unionByName(shifted).repartition(spark.sparkContext.defaultParallelism)
    sigs = minhash_signatures(both, n_hashes=64, shingle=9)
    # n_hashes passed through => zero eager probes; materialize=True: the
    # signature relation (feeds 4 plan subtrees) is cached for exactly one
    # evaluation and RELEASED before returning — a lazy call per driver/
    # bench invocation would leak one cache entry per call until session end
    return minhash_candidate_pairs(sigs, bands=16, threshold=0.9, n_hashes=64,
                                   materialize=True)


def q_dedup_survivors(spark, sf_dir):
    """END-TO-END near-dup removal: MinHash signatures → banded candidate
    pairs → transitive clusters → min-id survivor anti-join, one plan.
    Literal oracle: an independent plain-Python union-find over the
    independently recomputed candidate pairs (``oracles._survivors_expected``)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").where(F.col("text").isNotNull())
    shifted = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    both = docs.unionByName(shifted).repartition(spark.sparkContext.defaultParallelism)
    sigs = minhash_signatures(both, n_hashes=64, shingle=9)
    # materialize: the iterative closure consumes the pairs repeatedly —
    # checkpointed pairs + released signature cache (no per-call leak)
    pairs = minhash_candidate_pairs(sigs, bands=16, threshold=0.9, n_hashes=64,
                                    materialize=True)
    return drop_near_duplicates(both, pairs).select("doc_id")


def q_simhash_dup_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").where(F.col("text").isNotNull())
    shifted = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    both = docs.unionByName(shifted).repartition(spark.sparkContext.defaultParallelism)
    # materialize=True: exactly-once hash evaluation and no cache entry left
    # behind per invocation (same rationale as q_minhash_dup_pairs)
    return simhash_candidate_pairs(simhash(both), max_hamming=2, materialize=True)


def _spread(spark, df):
    """Single-file test inputs arrive as ONE split (one row group), which
    serializes Arrow-UDF scoring; spread rows across cores. At production
    scale input files >> cores, so this repartition would be dropped — same
    note as q_minhash_dup_pairs."""
    return df.repartition(spark.sparkContext.defaultParallelism)


def _spread_if_big(spark, sf_dir, name, min_bytes=1 << 20):
    """r6: size-adaptive spread (guide §2 — derive partitioning from input
    size, not a constant). A single-row-group parquet file cannot be split
    by the scanner, so a projection-heavy query over it runs as ONE task;
    the repartition that fixes that costs one small shuffle, which only
    pays when there is enough scan-stage work. Decide from the input file
    size (driver-side stat, no Spark job): spread above ``min_bytes``
    (sf1.0 documents = 5.7 MB → spread; sf0.1 = 0.6 MB → scan as-is, where
    the shuffle measurably cost more than it saved on vocab/url_dedup).
    Unstatable paths (remote FS) default to spreading."""
    df = _t(spark, sf_dir, name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):  # multi-file table: sum the part files
            size = sum(e.stat().st_size for e in os.scandir(path) if e.is_file())
        else:
            size = os.path.getsize(path)
        big = size > min_bytes
    except OSError:
        big = True
    return _spread(spark, df) if big else df


def q_langid_docs(spark, sf_dir):
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return docs.select("doc_id", langid_udf(F.col("text"))["lang"].alias("detected_lang"))


def q_perplexity_docs(spark, sf_dir):
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    # nanvl: null/empty text scores NaN in the pure fn -> surface as NULL
    # (bit-exact doubles otherwise; the literal oracle emits the same float64)
    ppl = perplexity_udf(F.col("text"))
    return docs.select("doc_id", F.nanvl(ppl, F.lit(None).cast("double")).alias("log_ppl"))


def q_lang_distribution(spark, sf_dir):
    """Per-detected-language corpus distribution — a groupBy over a UDF
    column (two-phase hash agg on the Arrow stage's output). avg(n_chars) is
    exact float64 at these magnitudes, so the serial literal oracle matches
    bit-for-bit."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return (
        docs.withColumn("detected_lang", langid_udf(F.col("text"))["lang"])
        .groupBy("detected_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
             F.avg("n_chars").alias("avg_chars"))
    )


def q_ann_lsh_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    top = ann_topk_lsh(emb, q, k=10, n_planes=8, n_tables=2)
    return top.select("vec_id", F.round(F.col("cosine"), 6).alias("cosine"))


def q_ivf_topk(spark, sf_dir):
    """IVF ANN: spherical-kmeans codebook (deterministic driver-side fit),
    vectorized nearest-centroid assignment, nprobe-list candidate scan,
    exact cosine top-k inside. Literal oracle: the codebook comes from the
    same pure ``kmeans_fit``; assignment + probe selection are reimplemented
    as plain-Python scalar loops in ``oracles._ivf_candidate_ids`` and the
    cosine scoring/ordering stays in DuckDB."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    cents = train_ivf_centroids(emb, n_centroids=16, n_iters=8)
    top = ivf_topk(emb, cents, q, k=10, nprobe=4)
    return top.select("vec_id", F.round(F.col("cosine"), 6).alias("cosine"))


def q_doc_signals(spark, sf_dir):
    """Per-document repetition/novelty signals in ONE Arrow projection:
    winnowing fingerprint count (document fingerprinting, ref
    rule_generator.py §profiling analogue) + zlib compressed/raw ratio
    (the cheap repetition / gibberish signal). Literal oracle: both
    recomputed serially from the shared pure functions
    (``oracles._doc_signals_expected``); float64 division exact on both
    sides."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return with_fingerprints(with_compression_ratio(docs)).select(
        "doc_id",
        F.size("fingerprints").alias("n_fingerprints"),
        "compression_ratio",
    )


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language corpus sampling: keep-decision is
    ``pmod(xxhash64(doc_id, salt), 1e6) < rate(lang)·1e6`` — a pure JVM
    filter (no UDF, no shuffle), stable under repartitioning and appends.
    Literal oracle: an independent pure-Python XXH64 implementation
    replays every decision (``oracles._stratified_sample_expected``)."""
    docs = _t(spark, sf_dir, "documents")
    return stratified_hash_sample(
        docs, {"en": 0.5, "de": 0.25, "fr": 0.1}, default_fraction=0.05
    ).select("doc_id", "lang")


def q_corpus_mix(spark, sf_dir):
    """Data mixing: rebalance the corpus toward target language weights —
    one tiny counts aggregation, then a deterministic no-shuffle hash
    filter. Literal oracle: rates AND keep-decisions recomputed
    independently (fresh arithmetic + the pure-Python XXH64)."""
    docs = _t(spark, sf_dir, "documents")
    return mix_corpus(docs, {"en": 0.4, "de": 0.3, "fr": 0.3}).select("doc_id", "lang")


def q_sample_topn(spark, sf_dir):
    """Exact-size deterministic sample: 50 rows with the smallest
    xxhash64(doc_id) — TakeOrderedAndProject (per-partition heaps, no
    global sort). Literal oracle: the independent pure-Python XXH64 picks
    the same 50 ids."""
    return hash_topn_sample(_t(spark, sf_dir, "documents"), 50).select("doc_id", "lang")


def q_tfidf_topterms(spark, sf_dir):
    """TF-IDF top-3 terms per document — the relational composition
    (explode → tf agg → df agg → broadcast-sized join → window top-k) that
    feeds keyword extraction / topic labeling. log() on both engines is
    IEEE double libm; score rounded to 6 digits for cross-engine parity."""
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), F.lit(0))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "token").crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "token", "score", "rn")
    )


def q_nchars_histogram(spark, sf_dir):
    """Fixed-width histogram of document lengths (20 × 250-char buckets,
    top-capped): single agg, the profiling shape for rule suggestion."""
    docs = _t(spark, sf_dir, "documents").where(F.col("n_chars").isNotNull())
    bucket = F.least(F.floor(F.col("n_chars") / 250), F.lit(19)).cast("int")
    return (
        docs.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.min("n_chars").cast("bigint").alias("lo"),
             F.max("n_chars").cast("bigint").alias("hi"))
    )


def q_packed_sequences(spark, sf_dir):
    """Training-sequence packing: word counts → deterministic hash buckets
    → per-bucket first-fit-decreasing into 400-token bins (applyInPandas;
    one shuffle on the bucket key). Literal oracle: independent FFD replay
    + independent XXH64 bucketing in ``oracles._packing_expected``."""
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    counted = docs.select("doc_id", F.size(words).alias("token_count"))
    return pack_sequences(counted, max_tokens=400, n_buckets=4)


# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: single-pass expectation-suite metrics on sf0.001 documents."""
    return q_suite_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 entries — the driver records 50 CORRECTNESS rows per round,
    # so every query here gets driver evidence every round. Keep it at 50:
    # to add a query, merge or retire another.
    return {
        "exp_regex_source": q_exp_regex_source,
        "exp_pair_greater": q_exp_pair_greater,
        "exp_fk_membership": q_exp_fk_membership,
        "exp_mean_between": q_exp_mean_between,
        "exp_json_parseable": q_exp_json_parseable,
        "exp_increasing_value": q_exp_increasing_value,
        "exp_zscore_quantity": q_exp_zscore_quantity,
        "embedding_near_dups": q_embedding_near_dups,
        "suite_documents": q_suite_documents,
        "word_stats": q_word_stats,
        "token_counts": q_token_counts,
        "dedup_exact": q_dedup_exact,
        "scrub_pii": q_scrub_pii,
        "topk_cosine": q_topk_cosine,
        "tpch_q1": q_tpch_q1,
        "tpch_q3_like": q_tpch_q3_like,
        "user_session_stats": q_user_session_stats,
        "topk_events_per_user": q_topk_events_per_user,
        "asof_clicks": q_asof_clicks,
        "asof_clicks_bucketed": q_asof_clicks_bucketed,
        "asof_next_purchase": q_asof_next_purchase,
        "url_dedup": q_url_dedup,
        "domain_distribution": q_domain_distribution,
        "profile_docs": q_profile_docs,
        "events_hourly": q_events_hourly,
        "length_quantiles": q_length_quantiles,
        "events_windowed": q_events_windowed,
        "fk_orphan_orders": q_fk_orphan_orders,
        "distinct_users_by_type": q_distinct_users_by_type,
        "ngram_jaccard_dups": q_ngram_jaccard_dups,
        "dedup_clusters": q_dedup_clusters,
        "vocab_topk": q_vocab_topk,
        "contamination_hits": q_contamination_hits,
        "dedup_lines": q_dedup_lines,
        "normalize_text": q_normalize_text,
        "minhash_dup_pairs": q_minhash_dup_pairs,
        "dedup_survivors": q_dedup_survivors,
        "simhash_dup_pairs": q_simhash_dup_pairs,
        "langid_docs": q_langid_docs,
        "lang_distribution": q_lang_distribution,
        "perplexity_docs": q_perplexity_docs,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "stratified_sample": q_stratified_sample,
        "packed_sequences": q_packed_sequences,
        "sample_topn": q_sample_topn,
        "corpus_mix": q_corpus_mix,
        "doc_signals": q_doc_signals,
        "tfidf_topterms": q_tfidf_topterms,
        "nchars_histogram": q_nchars_histogram,
    }


def _scrub_sql_chain() -> str:
    expr = "text"
    for _, pattern, repl in SCRUB_PATTERNS:
        p = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


def oracle_sql() -> dict[str, str]:
    in_set = "'en','de','fr','es'"
    return {
        "exp_regex_source": _metric_sql(
            "documents",
            "SUM(CASE WHEN source IS NOT NULL AND NOT regexp_matches(CAST(source AS VARCHAR), '^(?:src[0-9]+)') THEN 1 ELSE 0 END)"),
        "exp_pair_greater": _metric_sql(
            "lineitem",
            "SUM(CASE WHEN l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL AND l_extendedprice <= l_quantity THEN 1 ELSE 0 END)"),
        "exp_fk_membership": _metric_sql(
            "orders",
            "SUM(CASE WHEN o_custkey IS NOT NULL AND o_custkey NOT IN (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END)"),
        "exp_json_parseable": _metric_sql(
            "events",
            "SUM(CASE WHEN props IS NOT NULL AND NOT json_valid(props) THEN 1 ELSE 0 END)"),
        "exp_mean_between": _metric_sql(
            "lineitem",
            "CASE WHEN AVG(l_quantity) BETWEEN 10.0 AND 40.0 THEN 0 ELSE COUNT(*) END"),
        "exp_zscore_quantity": _metric_sql(
            "(SELECT l_quantity,"
            " (SELECT AVG(l_quantity) FROM lineitem) AS mu,"
            " (SELECT STDDEV(l_quantity) FROM lineitem) AS sigma"
            " FROM lineitem)",
            "SUM(CASE WHEN l_quantity IS NOT NULL AND ABS((l_quantity - mu) / sigma) >= 1.5 THEN 1 ELSE 0 END)",
            0.8),
        "exp_increasing_value": _metric_sql(
            "(SELECT value, LAG(value) OVER (PARTITION BY user_id"
            " ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS prev FROM events)",
            "SUM(CASE WHEN value IS NOT NULL AND prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END)",
            0.3),
        "embedding_near_dups": """
            SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.5
        """,
        "suite_documents": f"""
            SELECT 'docs_basic' AS rule_name,
                   'expect_column_values_to_not_be_null' AS expectation_type,
                   CAST(COUNT(*) AS BIGINT) AS element_count,
                   CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
                   (CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 100.0 <= CAST('9.999999999999998' AS DOUBLE) AS success
            FROM documents
            UNION ALL
            SELECT 'docs_basic', 'expect_column_values_to_be_in_set',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN lang IS NOT NULL AND lang NOT IN ({in_set}) THEN 1 ELSE 0 END) AS BIGINT),
                   (CAST(SUM(CASE WHEN lang IS NOT NULL AND lang NOT IN ({in_set}) THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 100.0 <= CAST('19.999999999999996' AS DOUBLE)
            FROM documents
            UNION ALL
            SELECT 'docs_shape', 'expect_column_values_to_be_between',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN n_chars IS NOT NULL AND (n_chars < 100 OR n_chars > 5000) THEN 1 ELSE 0 END) AS BIGINT),
                   (CAST(SUM(CASE WHEN n_chars IS NOT NULL AND (n_chars < 100 OR n_chars > 5000) THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 100.0 <= 50.0
            FROM documents
            UNION ALL
            SELECT 'docs_shape', 'expect_column_values_to_be_unique',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(DISTINCT doc_id) - (CASE WHEN COUNT(*) > COUNT(doc_id) THEN 1 ELSE 0 END) AS BIGINT),
                   (CAST(COUNT(*) - COUNT(DISTINCT doc_id) - (CASE WHEN COUNT(*) > COUNT(doc_id) THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 100.0 <= 0.0
            FROM documents
        """,
        "word_stats": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS word_count,
                   CAST(length(text) AS BIGINT) AS len_chars
            FROM documents
        """,
        "token_counts": f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT) AS token_count
            FROM documents
        """,
        "dedup_exact": """
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text
        """,
        "scrub_pii": f"SELECT CAST(doc_id AS BIGINT) AS doc_id, {_scrub_sql_chain()} AS scrubbed FROM documents",
        "topk_cosine": """
            SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id
            LIMIT 10
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= '1996-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "tpch_q3_like": """
            SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, o_orderdate,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < '1995-03-15'
              AND l_shipdate > '1995-03-15'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "user_session_stats": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM (
                SELECT user_id,
                       CASE WHEN prev_ts IS NULL
                                 OR epoch(ts) - epoch(prev_ts) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM (SELECT user_id, ts, event_id,
                             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                      FROM events)
            )
            GROUP BY user_id
        """,
        "topk_events_per_user": """
            SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id,
                   value, CAST(rn AS INT) AS rn
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
                  FROM events)
            WHERE rn <= 3
        """,
        "asof_clicks": """
            SELECT CAST(e.event_id AS BIGINT) AS event_id,
                   CAST(e.user_id AS BIGINT) AS user_id,
                   CAST(c.click_id AS BIGINT) AS click_id,
                   c.click_value AS click_value,
                   epoch(e.ts) - epoch(c.ts) AS gap_seconds
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
            ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id, value AS click_value
                            FROM events WHERE event_type = 'click') c
              ON e.user_id = c.user_id AND e.ts >= c.ts
        """,
        "asof_clicks_bucketed": """
            SELECT event_id, user_id,
                   CASE WHEN gap_seconds <= 3600.0 THEN click_id END AS click_id,
                   CASE WHEN gap_seconds <= 3600.0 THEN click_value END AS click_value,
                   CASE WHEN gap_seconds <= 3600.0 THEN gap_seconds END AS gap_seconds
            FROM (
                SELECT CAST(e.event_id AS BIGINT) AS event_id,
                       CAST(e.user_id AS BIGINT) AS user_id,
                       CAST(c.click_id AS BIGINT) AS click_id,
                       c.click_value AS click_value,
                       epoch(e.ts) - epoch(c.ts) AS gap_seconds
                FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
                ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id, value AS click_value
                                FROM events WHERE event_type = 'click') c
                  ON e.user_id = c.user_id AND e.ts >= c.ts
            )
        """,
        "domain_distribution": """
            SELECT 'host' || (doc_id % 11) || '.net' AS domain,
                   CAST(COUNT(*) AS BIGINT) AS n_pages
            FROM documents
            GROUP BY 1
        """,
        "asof_next_purchase": """
            SELECT CAST(s.event_id AS BIGINT) AS event_id,
                   CAST(s.user_id AS BIGINT) AS user_id,
                   CAST(p.purchase_id AS BIGINT) AS purchase_id,
                   epoch(p.ts) - epoch(s.ts) AS wait_seconds
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
            ASOF LEFT JOIN (SELECT user_id, ts, event_id AS purchase_id
                            FROM events WHERE event_type = 'purchase') p
              ON s.user_id = p.user_id AND s.ts <= p.ts
        """,
        "url_dedup": """
            SELECT 'https://src' || (doc_id % 7) || '.example.com/p/' || (doc_id % 17)
                       || '?id=' || (doc_id % 17) AS canonical_url,
                   CAST(MIN(doc_id) AS BIGINT) AS keep_id,
                   CAST(COUNT(*) AS BIGINT) AS n_dupes
            FROM documents
            GROUP BY 1
        """,
        "profile_docs": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(text) AS BIGINT) AS n_null_text,
                   CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                   CAST(MAX(n_chars) AS BIGINT) AS max_chars,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(SUM(length(text)) AS DOUBLE) / CAST(COUNT(text) AS DOUBLE) AS avg_len
            FROM documents
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   MIN(value) AS min_value, MAX(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "events_windowed": """
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
                   time_bucket(INTERVAL '30 minutes', ts) + INTERVAL '30 minutes' AS window_end,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(AVG(value), 6) AS avg_value
            FROM events
            WHERE ts IS NOT NULL
            GROUP BY 1, 2, 3
        """,
        "length_quantiles": """
            SELECT lang,
                   quantile_cont(n_chars, 0.25) AS p25,
                   quantile_cont(n_chars, 0.5)  AS p50,
                   quantile_cont(n_chars, 0.75) AS p75,
                   quantile_cont(n_chars, 0.95) AS p95,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents
            WHERE n_chars IS NOT NULL
            GROUP BY lang
        """,
        "fk_orphan_orders": """
            SELECT CAST(COUNT(*) AS BIGINT) AS orphan_count
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        """,
        "distinct_users_by_type": """
            SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events GROUP BY event_type
        """,
        "ngram_jaccard_dups": r"""
            WITH base AS (
                SELECT doc_id, text FROM documents WHERE text IS NOT NULL
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents WHERE text IS NOT NULL
            ),
            toks AS (
                SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
                FROM base
            ),
            grams AS (
                SELECT doc_id, COUNT(DISTINCT g) AS n_grams
                FROM (
                    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
                    FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)
                    WHERE len(ws) >= 3
                ) GROUP BY doc_id
            ),
            shingles AS (
                SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
                FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)
                WHERE len(ws) >= 3
            ),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM shingles a JOIN shingles b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
                   ROUND(CAST(i AS DOUBLE) / CAST(ga.n_grams + gb.n_grams - i AS DOUBLE), 6) AS jaccard
            FROM inter
            JOIN grams ga ON ga.doc_id = id_a
            JOIN grams gb ON gb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / CAST(ga.n_grams + gb.n_grams - i AS DOUBLE) >= 0.999
        """,
        "dedup_clusters": """
            WITH RECURSIVE nodes AS (
                SELECT doc_id FROM documents WHERE doc_id < 100
            ),
            edges AS (
                SELECT doc_id AS id_a, doc_id + 1000000 AS id_b FROM nodes
                UNION ALL
                SELECT doc_id + 1000000, doc_id + 2000000 FROM nodes
                UNION ALL
                SELECT 1000000, 2000001
            ),
            undirected AS (
                SELECT id_a AS src, id_b AS dst FROM edges
                UNION
                SELECT id_b, id_a FROM edges
            ),
            reach(node, target) AS (
                SELECT src, src FROM undirected
                UNION
                SELECT u.src, r.target FROM undirected u JOIN reach r ON u.dst = r.node
            )
            SELECT CAST(node AS BIGINT) AS doc_id, CAST(MIN(target) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node
        """,
        # the base text goes through DuckDB's OWN control-strip + NFC (an
        # independent implementation of both steps, same strip-then-compose
        # order as the op), so parity holds even if the fixture ever gains
        # decomposed accents or control chars; the appended suffix's
        # expected composed form is stated directly
        "normalize_text": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN text IS NULL THEN NULL
                        ELSE nfc_normalize(regexp_replace(text,
                                 '[' || chr(0) || '-' || chr(8) || chr(11) || chr(12)
                                     || chr(14) || '-' || chr(31) || chr(127) || '-' || chr(159)
                                     || chr(8203) || '-' || chr(8205) || chr(65279) || ']',
                                 '', 'g'))
                             || ' caf' || chr(233) END AS normalized
            FROM documents
        """,
        "dedup_lines": """
            WITH built AS (
                SELECT doc_id,
                       string_split(CASE WHEN text IS NULL THEN ''
                                         ELSE text || chr(10) || text || chr(10) || substr(text, 1, 50)
                                    END, chr(10)) AS ls
                FROM documents
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   string_agg(x, chr(10) ORDER BY i) AS cleaned
            FROM (
                SELECT doc_id, ls[i] AS x, i
                FROM built, UNNEST(range(1, len(ls) + 1)) AS t(i)
                WHERE list_position(ls, ls[i]) = i
            )
            GROUP BY doc_id
        """,
        "tfidf_topterms": f"""
            WITH docs AS (
                SELECT doc_id, lower(text) AS t FROM documents WHERE text IS NOT NULL
            ),
            toks AS (
                SELECT doc_id, UNNEST(regexp_extract_all(t, '{TOKEN_PATTERN}')) AS token
                FROM docs
            ),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
            nd AS (SELECT COUNT(*) AS n_docs FROM docs),
            scored AS (
                SELECT tf.doc_id, tf.token,
                       ROUND(tf.tf * ln(nd.n_docs / dfreq.df), 6) AS score
                FROM tf JOIN dfreq USING (token) CROSS JOIN nd
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id, token, score, CAST(rn AS INT) AS rn
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                               ORDER BY score DESC, token ASC) AS rn
                  FROM scored)
            WHERE rn <= 3
        """,
        "nchars_histogram": """
            SELECT CAST(LEAST(FLOOR(n_chars / 250), 19) AS INT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(n_chars) AS BIGINT) AS lo,
                   CAST(MAX(n_chars) AS BIGINT) AS hi
            FROM documents
            WHERE n_chars IS NOT NULL
            GROUP BY 1
        """,
        "contamination_hits": r"""
            WITH btoks AS (
                SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
                FROM documents WHERE doc_id % 50 = 0 AND text IS NOT NULL
            ),
            bgrams AS (
                SELECT DISTINCT ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4] AS g
                FROM btoks, UNNEST(range(1, len(ws) - 3)) AS t(i) WHERE len(ws) >= 5
            ),
            ctoks AS (
                SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
                FROM documents WHERE text IS NOT NULL
            ),
            cgrams AS (
                SELECT DISTINCT doc_id,
                       ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4] AS g
                FROM ctoks, UNNEST(range(1, len(ws) - 3)) AS t(i) WHERE len(ws) >= 5
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM cgrams JOIN bgrams USING (g)
            GROUP BY doc_id
        """,
        "vocab_topk": f"""
            SELECT token,
                   CAST(COUNT(*) AS BIGINT) AS occurrences,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
            FROM (
                SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS token
                FROM documents
            )
            GROUP BY token
            ORDER BY occurrences DESC, token
            LIMIT 200
        """,
        # minhash_dup_pairs / simhash_dup_pairs / langid_docs /
        # perplexity_docs / ann_lsh_topk / doc_signals: literal oracles —
        # expected rows recomputed serially driver-side (shared pure
        # functions + independent plain-Python bucketing) and rendered as
        # DuckDB VALUES/IN literals. See dataqualityassistant_spark/oracles.py.
        **fixture_oracle_sql(),
    }
