"""KenLM-style char-trigram perplexity scoring.

An order-3 character language model with add-k smoothing, trained at import
time on the in-repo English seed corpus (deterministic, no downloads).
Low perplexity ≈ natural prose; high perplexity ≈ gibberish / spam — the
standard CCNet/KenLM quality signal, here as an Arrow-batched pandas UDF.

Like langid, the model table is built once per Python worker and reused for
every Arrow batch; `classify` work is dict lookups over at most 2000 chars
per document.
"""

from __future__ import annotations

import math
from collections import Counter
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from dataqualityassistant_spark.functions.corpus import EN_SENTENCES

ORDER = 3
ADD_K = 0.1
MAX_CHARS = 2000


@lru_cache(maxsize=1)
def _model() -> tuple[dict[str, float], float]:
    """(log P(char | 2-char context) table keyed 'ctx+char', fallback logp)."""
    tri: Counter = Counter()
    bi: Counter = Counter()
    vocab: set[str] = set()
    for s in EN_SENTENCES:
        t = f"  {s.lower()} "
        vocab.update(t)
        for i in range(len(t) - 2):
            bi[t[i : i + 2]] += 1
            tri[t[i : i + 3]] += 1
    v = len(vocab)
    table = {
        g: math.log((n + ADD_K) / (bi[g[:2]] + ADD_K * v)) for g, n in tri.items()
    }
    fallback = math.log(ADD_K / (ADD_K * v))  # unseen context
    return table, fallback


def log_perplexity(text: str | None) -> float:
    """Mean negative log-prob per char transition. Pure function — shared by
    the Spark UDF and the pandas oracle."""
    if not text:
        return float("nan")
    t = f"  {text[:MAX_CHARS].lower()} "
    table, fallback = _model()
    n = len(t) - 2
    if n <= 0:
        return float("nan")
    total = 0.0
    for i in range(n):
        total += table.get(t[i : i + 3], fallback)
    return -total / n


@pandas_udf(T.DoubleType())
def perplexity_udf(texts: pd.Series) -> pd.Series:
    return texts.map(log_perplexity)


def with_perplexity(df, text_col: str = "text", out_col: str = "log_ppl"):
    return df.withColumn(out_col, perplexity_udf(F.col(text_col)))
