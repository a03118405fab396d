"""Deterministic hash-based sampling for training-data mixing.

``df.sample`` / ``df.sampleBy`` draw from a seeded RNG *per partition*, so
the selected rows change whenever the input's partitioning or order changes
— useless for reproducible corpus mixes, incremental crawls, or held-out
eval splits that must stay stable across reruns and cluster sizes. The
standard web-pipeline answer is **content-keyed sampling**: a row is kept
iff ``hash(id, salt) mod SCALE < fraction·SCALE``. Properties:

* stable under repartitioning, reordering, and incremental appends;
* per-stratum rates via a broadcast-free literal map lookup;
* nested: ``sample(f1) ⊆ sample(f2)`` for ``f1 <= f2`` at the same salt,
  so a 1% pilot corpus is a strict subset of the 10% run;
* disjoint splits by salt: different salts give independent draws.

Everything is a JVM-side filter over ``xxhash64`` — no UDF, no shuffle, no
driver involvement; at 100 TB it is a map-only scan. The pure-Python XXH64
replica below is an INDEPENDENT implementation of the public XXH64 spec
(matching Spark's ``XxHash64.hashLong`` chaining), used by the literal
oracle to verify the JVM path and available to callers who need the same
decision off-cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "SCALE",
    "hash_sample",
    "hash_topn_sample",
    "mix_corpus",
    "mix_rates",
    "stratified_hash_sample",
    "train_holdout_split",
    "xxhash64_long",
    "sample_bucket",
]

SCALE = 1_000_000  # sampling resolution: fractions are exact to 1e-6


def _bucket_col(id_col: Column | str, salt: int, key_expr: Column | None = None) -> Column:
    # default path casts to long so int32/int64 ids hash identically (and
    # the pure-Python oracle replays them); key_expr opts out for non-numeric
    # keys (e.g. a url string), hashed as their own type
    if key_expr is None:
        col = F.col(id_col) if isinstance(id_col, str) else id_col
        key_expr = col.cast("long")
    return F.pmod(
        F.xxhash64(key_expr, F.lit(int(salt)).cast("long")), F.lit(SCALE)
    )


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: int = 42,
    key_expr: Column | None = None,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows keyed by ``id_col``.

    NULL ids all hash to one bucket (kept or dropped together) — filter
    them first if that matters. ``key_expr`` replaces the numeric id for
    non-numeric row keys (e.g. ``F.col("url")``): the default path casts
    ``id_col`` to long, which under ANSI mode ERRORS on non-numeric strings
    (and with ANSI off silently NULLs every key into one bucket — an
    all-or-nothing "sample")."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(_bucket_col(id_col, salt, key_expr) < int(round(fraction * SCALE)))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: int = 42,
    default_fraction: float = 0.0,
    key_expr: Column | None = None,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    ``{"en": 0.1, "de": 0.5}``). Strata absent from ``fractions`` — and NULL
    strata — use ``default_fraction``. The thresholds ride a literal
    ``create_map``: no join, no shuffle, one codegen'd filter.
    ``key_expr`` replaces the numeric ``id_col`` for non-numeric row keys
    (e.g. ``F.col("url")``)."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    pairs: list[Column] = []
    for k, v in fractions.items():
        pairs += [F.lit(k), F.lit(int(round(v * SCALE)))]
    thr = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)] if pairs else F.lit(None).cast("int"),
        F.lit(int(round(default_fraction * SCALE))),
    )
    return df.where(_bucket_col(id_col, salt, key_expr) < thr)


def hash_topn_sample(
    df: DataFrame, n: int, id_col: str = "doc_id", salt: int = 42,
    key_expr: Column | None = None,
) -> DataFrame:
    """EXACT-size deterministic sample: the ``n`` rows with the smallest
    ``xxhash64(id, salt)`` — hash order is pseudo-random, so this is a
    uniform draw that is stable under repartitioning and reruns (unlike
    reservoir/rand() sampling). Compiles to TakeOrderedAndProject:
    per-partition top-n heaps merged on the driver, no global sort. Note
    it is NOT append-stable (new rows can displace old ones — that is what
    exact size costs; use :func:`hash_sample` when append stability
    matters more than exact count). ``key_expr`` replaces the numeric id
    for non-numeric row keys (see :func:`hash_sample`)."""
    key = key_expr if key_expr is not None else F.col(id_col).cast("long")
    h = F.xxhash64(key, F.lit(int(salt)).cast("long"))
    return df.orderBy(h.asc(), F.col(id_col).asc()).limit(n)


def train_holdout_split(
    df: DataFrame, holdout: float = 0.01, id_col: str = "doc_id", salt: int = 777,
    key_expr: Column | None = None,
) -> DataFrame:
    """Add a ``split`` column ('holdout' / 'train'): a stable eval carve-out
    that survives reruns and corpus growth (a doc never migrates between
    splits as data is appended). Use a salt distinct from any sampling salt
    so the holdout is an independent draw. ``key_expr`` replaces the numeric
    id for non-numeric row keys (see :func:`hash_sample`)."""
    return df.withColumn(
        "split",
        F.when(_bucket_col(id_col, salt, key_expr) < int(round(holdout * SCALE)),
               "holdout")
        .otherwise("train"),
    )


def mix_rates(counts: dict[str, int], weights: dict[str, float],
              missing_ok: bool = False) -> dict[str, float]:
    """Per-stratum keep-rates that rebalance a corpus to target ``weights``
    (e.g. ``{"en": 0.5, "de": 0.3, "fr": 0.2}``) while keeping the largest
    feasible total: the binding stratum (smallest ``count/weight``) is kept
    in full and every other stratum is downsampled to proportion. Strata
    absent from ``weights`` get rate 0. Pure driver-side arithmetic.

    A positively-weighted stratum with ZERO rows makes the requested
    proportions unsatisfiable; silently renormalizing over the present
    strata would return a mix that does not match ``weights``, so that case
    RAISES unless ``missing_ok=True`` (explicit opt-in to renormalization).
    When no weighted stratum has rows at all, every rate is 0 — the result
    is empty, not silently mis-proportioned."""
    pos = {s: w for s, w in weights.items() if w > 0}
    present = {s: w for s, w in pos.items() if counts.get(s, 0) > 0}
    missing = sorted(set(pos) - set(present))
    if missing and present and not missing_ok:
        raise ValueError(
            f"strata with positive weight have zero rows: {missing}; the "
            "mix cannot match the requested proportions — drop them from "
            "weights, or pass missing_ok=True to renormalize over the "
            "present strata")
    if not present:
        return {s: 0.0 for s in weights}
    scale = min(counts[s] / w for s, w in present.items())
    return {s: (min(1.0, scale * present[s] / counts[s]) if s in present else 0.0)
            for s in weights}


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: int = 42,
    missing_ok: bool = False,
) -> DataFrame:
    """Rebalance a corpus to target stratum ``weights`` by deterministic
    hash sampling: ONE small aggregation job fetches per-stratum counts
    (|strata| rows to the driver), :func:`mix_rates` turns them into
    keep-rates, and the data path is a single no-shuffle filter. The
    binding stratum survives intact; the result's proportions match
    ``weights`` up to sampling noise. Deterministic for a fixed input
    (rates depend only on the exact per-stratum counts). A weighted
    stratum with no rows raises unless ``missing_ok=True`` (see
    :func:`mix_rates`)."""
    counts = {r[0]: r[1] for r in df.groupBy(strata_col).count().collect()
              if r[0] is not None}
    rates = mix_rates(counts, weights, missing_ok=missing_ok)
    return stratified_hash_sample(
        df, rates, strata_col=strata_col, id_col=id_col, salt=salt,
        default_fraction=0.0)


# ------------------------------------------------- pure-Python XXH64 replica

_M = (1 << 64) - 1
_P1, _P2, _P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
_P4, _P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxhash64_long(value: int, seed: int = 42) -> int:
    """XXH64 of one 64-bit integer (the 8-byte specialized path of the
    public XXH64 spec), as a SIGNED int64 — numerically identical to
    Spark SQL ``xxhash64(CAST(value AS BIGINT))`` with the same seed.
    Chain calls (``xxhash64_long(b, xxhash64_long(a))``) for multi-column
    hashes, matching Spark's left-to-right fold."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl(((value & _M) * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def sample_bucket(value: int, salt: int = 42) -> int:
    """Driver-side replica of the row's sampling bucket:
    ``pmod(xxhash64(value, salt), SCALE)``."""
    h = xxhash64_long(salt, xxhash64_long(value))
    return h % SCALE  # Python % is already non-negative for positive modulus
