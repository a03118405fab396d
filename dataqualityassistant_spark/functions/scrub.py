"""Regex PII / toxicity scrubbing — the pipeline's final column transform.

Two implementations of the SAME ordered pattern chain:

- ``scrub_text_column``: JVM ``regexp_replace`` chain (the hot path —
  whole-stage codegen, no Python);
- ``scrub_text_python``: Python ``re`` reference (the oracle that freezes
  byte-exact golden fixtures).

The patterns deliberately use only the regex subset whose semantics are
identical in Java and Python (no inline flags, no backrefs in replacements,
``\\d``/``\\b`` classes, literal replacement tokens), and
``tests/test_scrub.py`` asserts the two implementations produce
byte-identical output over the whole fixture corpus — the north rule's
"byte-identical extracted text per url" invariant.

Order matters (e.g. SSN before generic phone so ``123-45-6789`` is not
half-eaten by the phone pattern); the chain applies top to bottom.
The email pattern is seeded from the reference's email-format rule
(rule_generator.py:961).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from dataqualityassistant_spark.functions.corpus import TOXIC_WORDS

# (name, pattern, replacement) — applied in order.
SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("card", r"\b(?:[0-9]{4}[ -]){3}[0-9]{4}\b", "[CARD]"),
    # hyphen FIRST in the class: `[ -.]` would be a range from 0x20 to 0x2E
    # matching !"#$%&'()*+, as separators too (only space/dash/dot intended)
    ("phone", r"\b\+?[0-9]{1,2}?[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("toxic", r"\b(?:" + "|".join(TOXIC_WORDS) + r")\b", "[REDACTED]"),
]


def scrub_text_column(col: Column | str) -> Column:
    """JVM regexp_replace chain over a text column. Null in → null out."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in SCRUB_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


_COMPILED = [(re.compile(p), r) for _, p, r in SCRUB_PATTERNS]


def scrub_text_python(text: str | None) -> str | None:
    """Python `re` reference implementation (oracle / fixture freezer)."""
    if text is None:
        return None
    for rx, repl in _COMPILED:
        text = rx.sub(repl, text)
    return text
