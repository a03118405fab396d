"""HTML → text extraction — the optional pre-stage for pages whose ``text``
column is missing but whose ``html`` payload is present (input_hint carries
both; the driver fixtures arrive with text pre-extracted, real WARC drops
may not).

Same dual-implementation contract as the PII scrub (functions/scrub.py):

- ``html_to_text_column``: JVM ``decode`` + ``regexp_replace`` chain — pure
  whole-stage codegen, the binary payload never crosses the Arrow boundary;
- ``html_to_text_python``: Python ``re`` reference (oracle / fixture
  freezer), asserted byte-identical on an adversarial corpus.

The patterns use only the regex subset with identical Java/Python semantics
(``[\\s\\S]`` instead of the ``(?s)`` flag, no backrefs); the whitespace
collapse uses ``\\s`` with ``(?U)`` on the JVM side only, mirroring
functions/text_features.py (Python ``\\s`` is Unicode by default, Java needs
the flag). Entity decoding covers the named entities that matter for prose
(&amp; &lt; &gt; &quot; &#39; &nbsp;); exotic numeric entities pass through
verbatim (documented limitation — a full entity table is a data file, not a
regex).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order. Block containers whose
# content must vanish first, then tags, then entities, then whitespace.
_STRIP_PATTERNS: list[tuple[str, str, str]] = [
    ("comment", r"<!--[\s\S]*?-->", " "),
    ("script", r"<[Ss][Cc][Rr][Ii][Pp][Tt]\b[^>]*>[\s\S]*?</[Ss][Cc][Rr][Ii][Pp][Tt]>", " "),
    ("style", r"<[Ss][Tt][Yy][Ll][Ee]\b[^>]*>[\s\S]*?</[Ss][Tt][Yy][Ll][Ee]>", " "),
    # truncated pages (common in real WARC drops): an opening <script>/<style>
    # with no closing tag left after the terminated strips above would leak
    # its whole body as visible "text" — strip it to end-of-input instead
    ("script_unterminated", r"<[Ss][Cc][Rr][Ii][Pp][Tt]\b[^>]*>[\s\S]*", " "),
    ("style_unterminated", r"<[Ss][Tt][Yy][Ll][Ee]\b[^>]*>[\s\S]*", " "),
    ("tag", r"<[^>]*>", " "),
]
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: so "&amp;lt;" decodes to "&lt;", not "<"
]
_WS = r"\s+"
# Python-side collapse class matching Java (?U)\s EXACTLY: Python \s also
# matches the C0 separators \x1c-\x1f (which Java's Unicode White_Space does
# not), so the mirror must exclude them or the byte-identical contract
# breaks on payloads containing FS/GS/RS/US (same convention as
# text_features.PY_WS_RE).
_PY_WS = r"[^\S\x1c-\x1f]+"


def html_to_text_column(col: Column | str, is_binary: bool = True) -> Column:
    """Extract visible text from an html column, JVM-side. Null in → null
    out. ``is_binary`` decodes UTF-8 first (input_hint: html is binary)."""
    c = F.col(col) if isinstance(col, str) else col
    if is_binary:
        # CAST(binary AS STRING), not decode(): Spark 4's decode THROWS on
        # malformed UTF-8 (MALFORMED_CHARACTER_CODING); the cast replaces bad
        # sequences with U+FFFD, byte-identical to Python errors='replace'
        # (asserted by the adversarial parity test).
        c = c.cast("string")
    for _, pattern, repl in _STRIP_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    # (?U): Java \s is ASCII-only without UNICODE_CHARACTER_CLASS; Python \s
    # is Unicode by default (same convention as text_features.py)
    c = F.regexp_replace(c, f"(?U){_WS}", " ")
    return F.trim(c)


_COMPILED = [(re.compile(p), r) for _, p, r in _STRIP_PATTERNS]


def html_to_text_python(html: bytes | str | None) -> str | None:
    """Python reference implementation (oracle / fixture freezer)."""
    if html is None:
        return None
    text = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    for rx, repl in _COMPILED:
        text = rx.sub(repl, text)
    for ent, ch in _ENTITIES:
        text = text.replace(ent, ch)
    # strip(" ") not strip(): after the collapse the only strippable edge
    # whitespace is a single space; .strip() would also remove edge
    # \x1c-\x1f chars that the JVM F.trim keeps
    return re.sub(_PY_WS, " ", text).strip(" ")
