"""URL canonicalization + URL-level dedup for web-crawl corpora.

Before any content-level dedup, web pipelines collapse the URL space:
scheme/host case, default ports, ``www.`` prefixes, fragments, and
tracking parameters (``utm_*`` etc.) all produce distinct strings for the
same resource. The reference has no crawl layer; this module is part of
the training-data ops this engine adds.

Everything here is a pure JVM ``Column`` expression chain
(``regexp_replace`` / ``regexp_extract`` / ``concat``) — no UDFs, stays
inside whole-stage codegen, and the dedup itself is one hash aggregation
on the canonical string (the same 100 TB shape as exact text dedup).

The entry-contract oracle (``__spark_entry__.oracle_sql()["url_dedup"]``)
does NOT mirror this chain: it computes the expected canonical form
directly from ``doc_id`` arithmetic, so the regex pipeline is verified
against an independent declarative spec, not against itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_TRACKING_PARAMS",
    "canonicalize_url",
    "registered_domain",
    "url_dedup",
]

# regex alternatives matching the PARAMETER NAME of common click/campaign
# trackers; anything matching `(?:...)=value` is dropped from the query
DEFAULT_TRACKING_PARAMS = (
    "utm_[a-z0-9_]+",
    "gclid",
    "fbclid",
    "msclkid",
    "ref",
    "ref_src",
)

# consecutive tracking params need repeated passes (regexp_replace does not
# rescan replaced text); 4 passes handle any run of <= 2^4 consecutive
# trackers, far beyond real URLs
_STRIP_PASSES = 4


def canonicalize_url(
    col: Column | str, tracking_params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS
) -> Column:
    """Canonical form of a URL, as a codegen-friendly expression chain:

    1. trim ASCII whitespace (explicit ``[ \\t\\n\\f\\r]`` class — ``F.trim``
       strips spaces ONLY, so ``'http://x/\\n'`` would stay distinct from
       its clean twin); drop the ``#fragment``;
    2. lowercase the ``scheme://authority`` part (path/query untouched);
    3. drop default ports (``http://…:80``, ``https://…:443``) — the
       authority match is ``[^/]*`` so userinfo URLs
       (``http://user:pw@host:80``) normalize too;
    4. drop a leading ``www.`` of the HOST (also after userinfo);
    5. remove tracking query parameters case-insensitively and tidy
       leftover ``?``/``&``;
    6. drop trailing slashes from a query-less path.

    Idempotent (property-tested). Heuristic by design — no percent-decoding
    or query-param re-sorting (both can change semantics for some sites).
    """
    url = F.col(col) if isinstance(col, str) else col
    url = F.regexp_replace(url, r"^[ \t\n\f\r]+|[ \t\n\f\r]+$", "")
    url = F.regexp_replace(url, "#.*", "")

    prefix = F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = url.substr(F.length(prefix) + 1, F.length(url))
    prefix = F.lower(prefix)
    prefix = F.regexp_replace(prefix, r"^(http://[^/]*):80$", "$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/]*):443$", "$1")
    # strip www. from the HOST only: the lookahead rejects a match inside
    # userinfo ('https://www.user:pw@host' — 'www.user:pw' is userinfo, and
    # the optional [^/@]*@ group consumes real userinfo before the host)
    prefix = F.regexp_replace(prefix, r"^(https?://(?:[^/@]*@)?)www\.(?![^/]*@)", "$1")

    tracker = "(?i:" + "|".join(tracking_params) + ")"
    for _ in range(_STRIP_PASSES):
        # a tracker followed by another param: keep the leading delimiter
        rest = F.regexp_replace(rest, f"([?&])(?:{tracker})=[^&]*&", "$1")
    # a tracker in final position: delimiter goes with it
    rest = F.regexp_replace(rest, f"[?&](?:{tracker})=[^&]*$", "")
    rest = F.regexp_replace(rest, r"[?&]$", "")
    rest = F.when(rest.contains("?"), rest).otherwise(F.regexp_replace(rest, "/+$", ""))

    return F.concat(prefix, rest)


def registered_domain(col: Column | str) -> Column:
    """Last-two-labels registered domain of a URL (``a.b.example.co.uk`` →
    ``co.uk``-style suffixes are NOT special-cased: a full answer needs the
    Public Suffix List, which is a data file, not an algorithm — callers
    with a PSL can broadcast-join it on this column's host instead)."""
    url = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1))
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two != "", two).otherwise(host)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS,
) -> DataFrame:
    """Group rows by canonical URL; emit one row per canonical URL with the
    minimum id as the kept representative and the duplicate count.

    One hash aggregation (map-side partial combine → shuffle on the
    canonical string). To materialize the surviving rows, semi-join the
    result's ``keep_id`` back to the corpus — same pattern as
    ``exact_dedup`` (`ops/dedup.py`)."""
    canon = canonicalize_url(url_col, tracking_params)
    return (
        df.select(canon.alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_dupes"),
        )
    )
