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

import numpy as np
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


@lru_cache(maxsize=1)
def _profiles_dense() -> tuple[np.ndarray, int, list[str], np.ndarray, np.ndarray]:
    """Vectorized form of :func:`_profiles`: a codepoint → char-id LUT over
    the union training vocabulary (0 = out-of-vocabulary) plus, per language,
    a dense ``K³`` float64 table indexed ``(i0·K + i1)·K + i2`` — every slot
    not keyed in that language's profile (including all id-0 slots)
    initialized to its ``__oov__`` value, so a gather reproduces
    ``table.get(gram, oov)`` exactly."""
    profiles = _profiles()
    chars = sorted({c for table in profiles.values() for g in table for c in g
                    if g != "__oov__"})
    K = len(chars) + 1
    lut = np.zeros(0x110000, dtype=np.int32)
    for i, c in enumerate(chars, start=1):
        lut[ord(c)] = i
    langs = sorted(profiles)  # sorted: the tie-break below needs this order
    dense = np.empty((len(langs), K * K * K), dtype=np.float64)
    oovs = np.empty(len(langs), dtype=np.float64)
    for li, lang in enumerate(langs):
        table = profiles[lang]
        dense[li].fill(table["__oov__"])
        oovs[li] = table["__oov__"]
        for g, v in table.items():
            if g == "__oov__":
                continue
            i0, i1, i2 = (int(lut[ord(c)]) for c in g)
            dense[li][(i0 * K + i1) * K + i2] = v
    return lut, K, langs, dense, oovs


def classify_batch(texts) -> list[tuple[str, float]]:
    """Batch form of :func:`classify_text` — bit-identical per document
    (differentially asserted in tests). The per-gram dict work becomes one
    UTF-32 decode + LUT gather + ``np.unique`` + one dense gather per
    language; the score sum replays the serial loop exactly: unique grams in
    FIRST-OCCURRENCE order (``Counter`` iterates insertion order), each
    contributing ``count * logp`` as one multiply, accumulated left-to-right
    via ``np.cumsum``. Distinct out-of-vocabulary chars all map to LUT id 0,
    which would merge distinct unseen trigrams (changing the grouping and
    therefore the float sum), so OOV chars are re-assigned unique per-doc
    ids before grouping — gram identity then matches string identity."""
    lut, K, langs, dense, _ = _profiles_dense()
    out = []
    for text in texts:
        if text is None or len(text) < MIN_CHARS:
            out.append((UNKNOWN, 0.0))
            continue
        t = f"  {text[:2000].lower()}  "
        n = len(t) - NGRAM + 1
        if n <= 0:
            out.append((UNKNOWN, 0.0))
            continue
        try:
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        except UnicodeEncodeError:
            out.append(classify_text(text))  # lone surrogates: scalar path
            continue
        # group occurrences by the raw codepoint triple packed into 63 bits
        # (codepoints < 2^21): packed equality == string-trigram equality,
        # so the grouping matches Counter's exactly — no vocab aliasing
        c64 = codes.astype(np.int64)
        tri_key = (c64[:-2] << 42) | (c64[1:-1] << 21) | c64[2:]
        _, first_idx, counts = np.unique(tri_key, return_index=True,
                                         return_counts=True)
        order = np.argsort(first_idx, kind="stable")
        first_idx = first_idx[order]
        cnts = counts[order].astype(np.float64)
        # dense-table slot of each unique gram, via its first occurrence:
        # all occurrences share the string trigram, hence the same slot
        ids = lut[codes].astype(np.int64)
        tri_in = (ids[first_idx] * K + ids[first_idx + 1]) * K + ids[first_idx + 2]
        # one (n_langs, n_unique) gather; axis-1 cumsum accumulates each row
        # strictly left to right == the serial per-gram loop
        totals = np.cumsum(cnts[None, :] * dense[:, tri_in], axis=1)[:, -1]
        scores = {lang: float(totals[li]) / n for li, lang in enumerate(langs)}
        best = max(sorted(scores), key=lambda k: scores[k])
        ranked = sorted(scores.values(), reverse=True)
        margin = ranked[0] - ranked[1] if len(ranked) > 1 else 0.0
        out.append((best, margin))
    return out


@pandas_udf(_LANGID_TYPE)
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    out = classify_batch(list(texts))
    return pd.DataFrame({"lang": [t[0] for t in out],
                         "margin": [t[1] for t in out]}, index=texts.index)


def with_langid(df, text_col: str = "text", out_col: str = "langid") -> "DataFrame":
    return df.withColumn(out_col, langid_udf(F.col(text_col)))
