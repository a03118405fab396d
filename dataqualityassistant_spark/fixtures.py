"""Deterministic synthetic Common-Crawl-style pages fixtures.

Generates the exact input_hint shape from BASELINE.json —
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)`` —
with seed=42 determinism and no external data:

- host domains drawn from a Zipf-like power law (~30% of rows on the top 3
  hosts) to exercise host-domain skew salting;
- text drawn from a controlled mixture: clean English prose (stopword-rich),
  short/boilerplate, symbol-heavy spam, repeated-n-gram spam, non-English
  (de/fr/es), lorem-like gibberish, plus embedded PII tokens on a fraction
  of clean docs and a controlled fraction of null/empty texts;
- ``lang`` labels intentionally wrong on ~2% of rows so langid rules have
  real violations.

Scale note: this generator is for tests/benchmarks (≤ a few million rows on
this box). At 10^12-doc scale the same mixture can be produced distributed
via ``spark.range(n).mapInPandas(...)`` — ``pages_batch(start, end)`` is the
per-partition kernel for that path.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from dataqualityassistant_spark.functions.corpus import (
    DE_SENTENCES,
    EN_SENTENCES,
    ES_SENTENCES,
    FR_SENTENCES,
    TOXIC_WORDS,
)

SEED = 42

_DOMAINS = [f"site{i:02d}.example.{tld}" for i, tld in zip(range(50), ["com", "org", "net"] * 17)]

_GIBBERISH_SYLLABLES = ["xq", "zrt", "plo", "vng", "krz", "wfy", "qqu", "jxo", "brn", "tlk"]

# Sub-pool sentence templates for clean-English generation. Every phrase is
# assembled from independent sub-pools (determiner × adjective × noun, …) so
# the variant space per slot is in the thousands — fixture documents then
# contain essentially no repeated word 5-grams, like real prose, and don't
# falsely trip the Gopher repetition rules (a fixed sentence list, or even
# fixed multi-word phrases, repeats whole n-grams whenever an item is drawn
# twice).
_DETS = ["the", "a", "one", "that", "this", "each", "another"]
_ADJS = [
    "old", "young", "quiet", "patient", "careful", "curious", "trusted", "retired",
    "local", "narrow", "wooden", "broken", "heavy", "small", "copper", "stone",
    "winter", "green", "dusty", "bright", "crooked", "faded", "sturdy", "plain",
]
_PEOPLE = [
    "sailor", "teacher", "baker", "neighbor", "student", "clerk", "gardener",
    "doctor", "carpenter", "printer", "brother", "watchman", "merchant", "keeper",
    "sister", "captain", "child", "guide", "friend", "farmer",
]
_VERBS = [
    "carried", "watched", "repaired", "described", "painted", "measured", "gathered",
    "followed", "collected", "studied", "arranged", "delivered", "remembered",
    "sketched", "counted", "cleaned", "borrowed", "inspected", "recorded", "prepared",
]
_THINGS = [
    "bridge", "basket", "clock", "map", "wall", "letters", "nets", "tools",
    "stalls", "candles", "gate", "books", "kettle", "herbs", "steps", "timber",
    "lantern", "drawings", "coats", "bottles", "ladder", "ropes", "tiles", "benches",
]
_PREPS = ["near", "behind", "beside", "under", "across", "inside", "outside", "along", "above", "past"]
_PLACENOUNS = [
    "harbor", "mill", "valley", "road", "church", "trees", "meadow", "station",
    "barn", "lighthouse", "garden", "bakery", "path", "square", "schoolhouse",
    "slope", "well", "workshop", "orchard", "bridge",
]
_CONJS = ["before", "while", "after", "as", "when", "until", "once", "because"]
_EVENTS = [
    "the rain began", "the children slept", "the bells rang", "the fog lifted",
    "the tide was low", "the light faded", "the bread was baking", "the storm passed",
    "the sun went down", "the market opened", "the guests arrived", "the kettle boiled",
    "the letters came", "the road was dry", "the boats were out", "the frost set in",
]


def _en_sentence(rng: random.Random) -> str:
    subj = f"{rng.choice(_DETS)} {rng.choice(_ADJS)} {rng.choice(_PEOPLE)}"
    obj = f"{rng.choice(_DETS)} {rng.choice(_ADJS)} {rng.choice(_THINGS)}"
    place = f"{rng.choice(_PREPS)} the {rng.choice(_ADJS)} {rng.choice(_PLACENOUNS)}"
    tail = f"{rng.choice(_CONJS)} {rng.choice(_EVENTS)}"
    s = f"{subj} {rng.choice(_VERBS)} {obj} {place} {tail}"
    if rng.random() < 0.3:
        s += (
            f", and then {rng.choice(_VERBS)} {rng.choice(_DETS)} "
            f"{rng.choice(_ADJS)} {rng.choice(_THINGS)} {rng.choice(_PREPS)} "
            f"the {rng.choice(_PLACENOUNS)}"
        )
    return s[0].upper() + s[1:] + "."

_PII_SNIPPETS = [
    "Contact us at {name}@mail-{dom}.com for details.",
    "Call 555-{d3}-{d4} or +1 212-{d3}-{d4} to reserve.",
    "SSN on file: {d3}-{d2}-{d4}.",
    "Server at 192.168.{db}.{db} responded.",
    "Card 4111 1111 1111 {d4} was declined.",
]

MIXTURE = [
    ("clean_en", 0.52),
    ("short", 0.08),
    ("symbol_spam", 0.07),
    ("repeat_spam", 0.07),
    ("non_en", 0.15),
    ("gibberish", 0.05),
    ("boiler_list", 0.03),
    ("empty", 0.03),
]

_NON_EN = {"de": DE_SENTENCES, "fr": FR_SENTENCES, "es": ES_SENTENCES}


def _make_text(kind: str, rng: random.Random) -> tuple[str | None, str]:
    """Returns (text, true_lang)."""
    if kind == "empty":
        return (None if rng.random() < 0.5 else ""), "en"
    if kind == "clean_en":
        n = rng.randint(8, 40)
        sents = [_en_sentence(rng) for _ in range(n)]
        if rng.random() < 0.15:  # inject PII
            snip = rng.choice(_PII_SNIPPETS).format(
                name=f"user{rng.randint(1, 999)}",
                dom=rng.randint(1, 99),
                d2=f"{rng.randint(10, 99)}",
                d3=f"{rng.randint(100, 999)}",
                d4=f"{rng.randint(1000, 9999)}",
                db=rng.randint(1, 254),
            )
            sents.insert(rng.randint(0, len(sents)), snip)
        if rng.random() < 0.05:  # inject a "toxic" token
            sents.insert(rng.randint(0, len(sents)), f"That was a {rng.choice(TOXIC_WORDS)} disaster.")
        # paragraphs of 2-5 sentences
        paras, i = [], 0
        while i < len(sents):
            k = rng.randint(2, 5)
            paras.append(" ".join(sents[i : i + k]))
            i += k
        return "\n".join(paras), "en"
    if kind == "short":
        return _en_sentence(rng).split(",")[0][: rng.randint(10, 60)], "en"
    if kind == "symbol_spam":
        words = ["#sale", "#now", "buy...", "###", "click", "#win", "$$$", "#free"]
        return " ".join(rng.choice(words) for _ in range(rng.randint(30, 120))), "en"
    if kind == "repeat_spam":
        phrase = rng.choice(["best price best deal", "click here now", "top offer today"])
        return " ".join([phrase] * rng.randint(20, 60)), "en"
    if kind == "non_en":
        lang = rng.choice(sorted(_NON_EN))
        sents = [rng.choice(_NON_EN[lang]) for _ in range(rng.randint(6, 30))]
        return " ".join(sents), lang
    if kind == "gibberish":
        words = [
            "".join(rng.choice(_GIBBERISH_SYLLABLES) for _ in range(rng.randint(2, 5)))
            for _ in range(rng.randint(40, 200))
        ]
        return " ".join(words), "en"
    if kind == "boiler_list":
        items = [f"- {rng.choice(EN_SENTENCES).split(' ')[1]} item {i}" for i in range(rng.randint(10, 30))]
        return "\n".join(items), "en"
    raise ValueError(kind)


def _zipf_weights(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** 1.3
    return w / w.sum()


def pages_batch(start: int, end: int, seed: int = SEED) -> pd.DataFrame:
    """Deterministic batch of rows [start, end) — per-partition kernel.
    Row i's content depends only on (seed, i), so any partitioning of the
    id range produces the same table."""
    weights = _zipf_weights(len(_DOMAINS))
    cum = np.cumsum(weights)
    kinds, kcum = zip(*MIXTURE)
    kcum = np.cumsum(kcum)
    base_ts = datetime(2024, 1, 1)
    rows = []
    for i in range(start, end):
        rng = random.Random((seed << 20) ^ i)
        dom = _DOMAINS[int(np.searchsorted(cum, rng.random()))]
        kind = kinds[int(np.searchsorted(kcum, min(rng.random(), 0.999999)))]
        text, true_lang = _make_text(kind, rng)
        lang = true_lang
        if rng.random() < 0.02:  # ~2% mislabeled
            lang = rng.choice([l for l in ["en", "de", "fr", "es", "zz"] if l != true_lang])
        url = f"https://{dom}/p/{i:010d}"
        ts = base_ts + timedelta(seconds=rng.randint(0, 365 * 24 * 3600 - 1))
        html = None if text is None else b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        rows.append((url, ts, html, text, lang))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_spark_df(spark, n_rows: int, seed: int = SEED, partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas(pages_batch).
    This is how the same fixture scales to any row count without driver
    materialization."""
    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            if len(ids):
                # ids within a range partition are contiguous
                yield pages_batch(int(ids.min()), int(ids.max()) + 1, seed)

    rng_df = spark.range(0, n_rows, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_pages_fixture(spark, path: str, n_rows: int, seed: int = SEED,
                        partitions: int | None = None) -> None:
    pages_spark_df(spark, n_rows, seed, partitions).write.mode("overwrite").parquet(path)
