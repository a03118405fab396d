"""URL canonicalization: hand-picked cases, idempotency property over a
seeded fuzz set, dedup grouping, and a no-UDF/codegen plan assertion."""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataqualityassistant_spark.ops.urltools import (
    canonicalize_url,
    registered_domain,
    url_dedup,
)


CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM:443/Path/a?id=1#frag", "https://example.com/Path/a?id=1"),
    ("http://example.com:80/", "http://example.com"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),  # non-default port kept
    ("https://example.com/a/?utm_source=feed&id=2&utm_campaign=x", "https://example.com/a/?id=2"),
    ("https://example.com/a?utm_source=f", "https://example.com/a"),
    ("https://example.com/a?utm_a=1&utm_b=2&utm_c=3&gclid=9", "https://example.com/a"),
    ("https://example.com/a?id=1&fbclid=zz", "https://example.com/a?id=1"),
    # a param whose NAME merely contains a tracker substring survives
    ("https://example.com/a?myref=1&cref=2", "https://example.com/a?myref=1&cref=2"),
    ("https://example.com/trailing///", "https://example.com/trailing"),
    ("  https://example.com/ws  ", "https://example.com/ws"),
    ("https://user@example.com/a", "https://user@example.com/a"),
    ("not a url at all", "not a url at all"),
]


def test_canonical_cases(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)], "i int, url string")
    got = {r["i"]: r["c"] for r in df.select("i", canonicalize_url("url").alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_idempotent_on_fuzz(spark):
    rng = random.Random(11)
    schemes = ["http://", "HTTPS://", "https://WWW.", "http://www."]
    hosts = ["Example.com", "sub.Example.COM:443", "a-b.org:80", "x.io:9000"]
    paths = ["", "/", "/p", "/p/q/", "/p%20q"]
    queries = ["", "?id=1", "?utm_source=a", "?utm_a=1&utm_b=2", "?id=1&ref=x&z=2", "?a=1&b=2"]
    frags = ["", "#f", "#a=b"]
    urls = ["".join(rng.choice(part) for part in (schemes, hosts, paths, queries, frags))
            for _ in range(300)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonicalize_url("url").alias("c1")
    out = df.select(once, canonicalize_url(once).alias("c2")).collect()
    for r in out:
        assert r["c1"] == r["c2"], f"not idempotent: {r['c1']!r} -> {r['c2']!r}"


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [("https://a.b.Example.COM/x",), ("http://localhost:8080/",), ("https://u@news.site.org/p?q=1",)],
        "url string")
    got = [r[0] for r in df.select(registered_domain("url")).collect()]
    assert got == ["example.com", "localhost", "site.org"]


def test_url_dedup_groups(spark):
    rows = [
        (1, "https://example.com/a?utm_source=x"),
        (2, "HTTPS://WWW.example.com:443/a"),
        (3, "https://example.com/a?id=1"),
    ]
    out = {r["canonical_url"]: r for r in url_dedup(
        spark.createDataFrame(rows, "doc_id long, url string")).collect()}
    assert out["https://example.com/a"]["keep_id"] == 1
    assert out["https://example.com/a"]["n_dupes"] == 2
    assert out["https://example.com/a?id=1"]["n_dupes"] == 1


def test_plan_no_udf_single_agg(spark):
    df = spark.createDataFrame([(1, "https://example.com/a")], "doc_id long, url string")
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas", "MapInPandas"):
        assert bad not in plan, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final, nothing else


def test_canonicalize_matches_urllib_reimplementation(spark):
    """Independent cross-check: the JVM regexp chain vs a from-scratch
    urllib.parse-based canonicalizer implementing the same spec (lowercase
    scheme+authority, default ports, www., fragment, tracking params,
    trailing slashes). No shared code with the op."""
    import re as _re
    from urllib.parse import urlsplit

    def py_canon(u):
        u = u.strip(" \t\n\f\r")
        u = u.split("#", 1)[0]
        try:
            parts = urlsplit(u)
        except ValueError:
            parts = None
        if not parts or not parts.scheme or "://" not in u:
            return u  # not an absolute URL: regex chain leaves it alone too
        scheme = parts.scheme.lower()
        netloc = parts.netloc.lower()
        if scheme == "http" and netloc.endswith(":80"):
            netloc = netloc[:-3]
        if scheme == "https" and netloc.endswith(":443"):
            netloc = netloc[:-4]
        # www strips from the HOST part, also when userinfo is present
        ui, sep, hostport = netloc.rpartition("@")
        if hostport.startswith("www.") and scheme in ("http", "https"):
            netloc = ui + sep + hostport[4:]
        tracker = _re.compile(r"^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|ref|ref_src)=",
                              _re.IGNORECASE)
        params = [p for p in parts.query.split("&") if p] if parts.query else []
        kept = [p for p in params if not tracker.match(p)]
        path = parts.path
        if not kept:
            path = path.rstrip("/")
        q = ("?" + "&".join(kept)) if kept else ""
        return f"{scheme}://{netloc}{path}{q}"

    import random
    rng = random.Random(19)
    schemes = ["http://", "HTTPS://", "https://WWW.", "http://www."]
    hosts = ["Example.com", "sub.Example.COM:443", "a-b.org:80", "x.io:9000", "EX.com:443",
             "user:Pw@Example.com:80", "u@www.Site.org"]
    paths = ["", "/", "/p", "/p/q/", "/deep/er/path"]
    queries = ["", "?id=1", "?utm_source=a", "?utm_a=1&utm_b=2&z=3", "?id=1&ref=x&z=2",
               "?a=1&b=2", "?gclid=9&id=2", "?id=2&msclkid=7", "?UTM_SOURCE=A&id=3",
               "?Ref=x&GCLID=2"]
    frags = ["", "#f", "#a=b"]
    pads = ["", "\n", "\t", " "]
    urls = ["".join(rng.choice(p) for p in (pads, schemes, hosts, paths, queries, frags))
            + rng.choice(pads) for _ in range(400)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
    for u, g in zip(urls, got):
        assert g == py_canon(u), f"{u!r}: spark={g!r} urllib={py_canon(u)!r}"
