"""Deterministic fastText-style language identification.

A char-n-gram Naive-Bayes profile classifier (the same family of model
fastText's langid uses, minus the learned embeddings): per-language trigram
log-probability tables trained at import time from the in-repo seed corpus
(:mod:`corpus` — no external model downloads, fully deterministic).

Runs as an Arrow-batched ``pandas_udf`` (Series → Series of structs): the
model tables are built once per Python worker, each batch is scored with
dict lookups — no per-row Spark-Python round trips, no JVM regex. This is
the pattern the north rule requires for model-ish scoring stages
("fastText language-ID ... as pandas/Arrow UDFs in batched form").

The reference system has no langid; its extension seam is the expectation
registry (quality_engine.py:410). We surface langid as a derived column so
`expect_column_values_to_be_in_set(column='detected_lang', ...)` and
lang-claim-agreement rules run through the ordinary compiler.
"""

from __future__ import annotations

import math
from collections import Counter
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from dataqualityassistant_spark.functions.corpus import LANG_SENTENCES

NGRAM = 3
UNKNOWN = "zz"
MIN_CHARS = 12  # below this, classification is noise -> 'zz'


def _trigrams(text: str):
    t = f"  {text.lower()}  "
    for i in range(len(t) - NGRAM + 1):
        yield t[i : i + NGRAM]


@lru_cache(maxsize=1)
def _profiles() -> dict[str, dict[str, float]]:
    """lang -> {trigram: log P(trigram|lang)} with add-one smoothing over the
    union vocabulary. Built deterministically from the seed corpus."""
    counts: dict[str, Counter] = {}
    vocab: set[str] = set()
    for lang, sentences in LANG_SENTENCES.items():
        c: Counter = Counter()
        for s in sentences:
            c.update(_trigrams(s))
        counts[lang] = c
        vocab.update(c)
    v = len(vocab)
    profiles: dict[str, dict[str, float]] = {}
    for lang, c in counts.items():
        total = sum(c.values()) + v
        profiles[lang] = {g: math.log((n + 1) / total) for g, n in c.items()}
        profiles[lang]["__oov__"] = math.log(1 / total)
    return profiles


def classify_text(text: str | None) -> tuple[str, float]:
    """(lang, mean per-trigram log-prob margin). Pure function — shared by
    the Spark UDF and the pandas oracle so labels agree exactly."""
    if text is None or len(text) < MIN_CHARS:
        return UNKNOWN, 0.0
    counts = Counter(_trigrams(text[:2000]))  # cap work per doc; 2k chars is ample
    n = sum(counts.values())
    if n == 0:
        return UNKNOWN, 0.0
    profiles = _profiles()
    scores = {}
    # iterate UNIQUE grams weighted by count (~2-3x fewer table lookups than
    # scoring every occurrence; identical result)
    for lang, table in profiles.items():
        oov = table["__oov__"]
        total = 0.0
        for g, c in counts.items():
            total += c * table.get(g, oov)
        scores[lang] = total / n
    best = max(sorted(scores), key=lambda k: scores[k])
    ranked = sorted(scores.values(), reverse=True)
    margin = ranked[0] - ranked[1] if len(ranked) > 1 else 0.0
    return best, margin


# Explicit DataType: DDL-string return types need an active SparkContext at
# decoration time, which executor-side module imports don't have.
_LANGID_TYPE = T.StructType(
    [T.StructField("lang", T.StringType()), T.StructField("margin", T.DoubleType())]
)


@pandas_udf(_LANGID_TYPE)
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    out = texts.map(classify_text)
    return pd.DataFrame({"lang": out.map(lambda t: t[0]), "margin": out.map(lambda t: t[1])})


def with_langid(df, text_col: str = "text", out_col: str = "langid") -> "DataFrame":
    return df.withColumn(out_col, langid_udf(F.col(text_col)))
