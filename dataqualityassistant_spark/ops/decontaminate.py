"""Benchmark decontamination: flag and drop training documents that share
word n-grams with an evaluation/benchmark set.

Standard LLM-corpus hygiene (n-gram overlap decontamination, as described
in public LM training reports): any training doc containing a long-enough
word n-gram from the benchmark is suspect. The reference has no notion of
this; it belongs to the training-data layer this engine adds.

Spark-first shape, built so the 100 TB side never shuffles its bulk:

* corpus shingles come from ``explode`` over a pure JVM n-gram expression
  (``split`` → ``transform(sequence)`` → ``array_join``) — a generator,
  NO shuffle, no Python;
* the benchmark side (eval sets are KB–MB scale) is distinct-ed and
  **broadcast**, so the probe is a map-side semi/inner join;
* only MATCHED (doc_id, shingle) rows — a tiny relation — reach the
  ``groupBy(doc_id)`` hit-count shuffle, and the final drop is a broadcast
  left-anti join on the flagged ids.

The whole pipeline is ANSI-SQL-expressible, so the entry-contract oracle
(``oracle_sql()["contamination_hits"]``) is an independent DuckDB
formulation (list comprehension shingling + join), not a literal replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_shingles", "contamination_hits", "decontaminate"]


def ngram_shingles(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "shingle",
) -> DataFrame:
    """(id, shingle) rows: lowercased word ``n``-grams joined with single
    spaces. Docs with fewer than ``n`` words (or NULL text) yield no rows.
    Pure JVM generator — explode adds rows inside the scan stage."""
    # explicit ASCII whitespace class instead of \s: Java \s includes \x0B,
    # RE2 (the DuckDB oracle engine) \s does not — the explicit class means
    # both engines tokenize identically even on vertical-tab-bearing text
    words = F.filter(F.split(F.lower(F.col(text_col)), "[ \t\n\f\r]+"),
                     lambda w: w != F.lit(""))
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(grams).alias(out_col))


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document count of DISTINCT benchmark n-grams found in the doc:
    ``(doc_id, n_hits)``, only docs with >= 1 hit. The benchmark shingle
    set is broadcast; corpus rows that match nothing die in the map stage."""
    bench = (
        ngram_shingles(
            benchmark.select(F.lit(0).alias("__bid"), F.col(bench_text_col).alias("__btext")),
            n, "__btext", "__bid")
        .select("shingle").distinct()
    )
    corpus = ngram_shingles(docs, n, text_col, id_col)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").cast("bigint").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Drop every doc with >= ``min_hits`` distinct benchmark n-grams. The
    flagged-id relation is tiny (contamination is rare by construction), so
    the removal is a broadcast left-anti join — the corpus itself never
    shuffles.

    NULL-id docs: ``contamination_hits`` pools them into one NULL group, and
    the anti-join below matches NULL keys null-safely — so when the pooled
    NULL group crosses ``min_hits``, ALL null-id docs are dropped together
    (conservative hygiene; a plain anti-join would never match NULL and
    contaminated null-id docs would silently pass through). Give docs real
    ids for per-document thresholds."""
    flagged = contamination_hits(
        docs, benchmark, n, text_col, id_col, bench_text_col
    ).where(F.col("n_hits") >= min_hits).select(F.col(id_col).alias("__flagged_id"))
    return (docs.join(F.broadcast(flagged),
                      F.col(id_col).eqNullSafe(F.col("__flagged_id")),
                      "left_anti"))
