"""Driver-side literal oracles for the hash/model-based queries.

The hash/model-based ``__spark_entry__.queries()`` entries (minhash/simhash
candidate pairs, langid, perplexity, LSH ANN top-k, winnowing fingerprints,
xxhash64 stratified sampling) have no ANSI-SQL equivalent a plain DuckDB
statement can express. They ARE fully
deterministic (fixed seeds, fixed hash parameters), so this module computes
the expected output *serially, driver-side, without Spark*:

- per-document scores come from the SAME pure functions the Arrow UDFs wrap
  (``langid.classify_text``, ``perplexity.log_perplexity``,
  ``dedup.minhash_signature_batch``, ``dedup.simhash_one``,
  ``textstats.winnow_fingerprints``) — the oracle validates Spark's
  *distributed plumbing* (Arrow batching, column wiring, joins, dedup,
  ordering) against a single-threaded reference run;
- the candidate-pair / bucketing logic (LSH banding, chunk pigeonholing,
  hyperplane buckets) is REIMPLEMENTED here in plain Python dict/set algebra,
  independent of the DataFrame join/window formulation it checks.

The expected rows are rendered as DuckDB ``VALUES`` literals (or an ``IN``
candidate list for ANN, keeping the cosine math inside DuckDB), so the
driver's side-by-side compare treats them like any other oracle query.

The driver evaluates oracles at sf=0.01 over pre-registered views of
``/root/testdata/sf0.01`` (override with ``SPARK_GRAFT_ORACLE_SF_DIR``).
"""

from __future__ import annotations

import math
import os
import re
from collections import defaultdict
from functools import lru_cache
from itertools import combinations

import numpy as np
import pyarrow.parquet as pq

from dataqualityassistant_spark.functions.langid import classify_text
from dataqualityassistant_spark.functions.perplexity import log_perplexity
from dataqualityassistant_spark.ops.dedup import minhash_signature_batch, simhash_one
from dataqualityassistant_spark.ops.ivf import kmeans_fit
from dataqualityassistant_spark.ops.sampling import SCALE, sample_bucket
from dataqualityassistant_spark.ops.similarity import _planes, query_bucket
from dataqualityassistant_spark.ops.textstats import compression_ratio_one, winnow_fingerprints

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

# ------------------------------------------------------------ SQL rendering

def _sql_varchar(v) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + str(v).replace("'", "''") + "'"


def _sql_double(v) -> str:
    # CAST-from-repr keeps full float64 precision and avoids DuckDB parsing
    # the literal as DECIMAL (CLAUDE.md / oracle.py convention)
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "CAST(NULL AS DOUBLE)"
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def _sql_bigint(v) -> str:
    return "CAST(NULL AS BIGINT)" if v is None else f"CAST({int(v)} AS BIGINT)"


def _sql_int(v) -> str:
    return "CAST(NULL AS INTEGER)" if v is None else f"CAST({int(v)} AS INTEGER)"


def values_sql(rows: list[tuple], columns: list[str], renderers: list) -> str:
    """``SELECT * FROM (VALUES ...) AS t(cols)`` for a literal expected
    result; typed empty relation when there are no rows."""
    if not rows:
        null_cells = ", ".join(f"{r(None)} AS {c}" for r, c in zip(renderers, columns))
        return f"SELECT {null_cells} WHERE FALSE"
    lines = ",\n  ".join(
        "(" + ", ".join(r(v) for r, v in zip(renderers, row)) + ")" for row in rows
    )
    return f"SELECT * FROM (VALUES\n  {lines}\n) AS t({', '.join(columns)})"


# ------------------------------------------------------------- table readers

@lru_cache(maxsize=4)
def _docs(sf_dir: str) -> tuple[tuple[int, str | None], ...]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tuple(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


@lru_cache(maxsize=4)
def _embeddings(sf_dir: str) -> tuple[tuple[int, tuple[float, ...] | None], ...]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    return tuple((i, tuple(e) if e is not None else None) for i, e in zip(ids, embs))


def _union_with_shifted(docs) -> list[tuple[int, str]]:
    """documents ∪ (doc_id+1000000 re-keyed copy), text non-null — the input
    shape the dedup entry queries build."""
    base = [(i, t) for i, t in docs if t is not None]
    return base + [(i + 1000000, t) for i, t in base]


# ------------------------------------------------------------ expected rows

@lru_cache(maxsize=4)
def _minhash_expected(sf_dir: str, n_hashes: int = 64, shingle: int = 9, seed: int = 42,
                      bands: int = 16, threshold: float = 0.9) -> list[tuple]:
    both = _union_with_shifted(_docs(sf_dir))
    sigs = minhash_signature_batch([t for _, t in both], n_hashes, shingle, seed)
    rpb = n_hashes // bands
    sig_by_id: dict[int, list[int]] = {}
    buckets: dict[tuple, list[int]] = defaultdict(list)
    for (i, _), s in zip(both, sigs):
        if s is None:
            continue
        sig_by_id[i] = s
        for b in range(bands):
            buckets[(b, tuple(s[b * rpb:(b + 1) * rpb]))].append(i)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            cand.add((a, b))
    rows = []
    for a, b in sorted(cand):
        sa, sb = sig_by_id[a], sig_by_id[b]
        agree = sum(1 for x, y in zip(sa, sb) if x == y)
        est = agree / n_hashes  # int/int -> float64, same as Spark's int/int -> double
        if est >= threshold:
            rows.append((a, b, est))
    return rows


def _survivors_expected(sf_dir: str) -> list[tuple]:
    """Near-dup survivors via an independent union-find over the
    independently recomputed MinHash candidate pairs: every id not the
    minimum of its duplicate cluster is dropped; unpaired ids pass."""
    pairs = _minhash_expected(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # unions always attach the larger root beneath the smaller, so a
    # cluster's root IS its minimum id; everything else in `parent` loses
    losers = {x for x in list(parent) if find(x) != x}
    all_ids = [i for i, t in _union_with_shifted(_docs(sf_dir))]
    return [(i,) for i in sorted(set(all_ids) - losers)]


def _simhash_expected(sf_dir: str, max_hamming: int = 2) -> list[tuple]:
    both = _union_with_shifted(_docs(sf_dir))
    u_by_id: dict[int, int] = {}
    for i, t in both:
        h = simhash_one(t)
        if h is not None:
            u_by_id[i] = h & 0xFFFFFFFFFFFFFFFF  # unsigned view of the int64
    buckets: dict[tuple, list[int]] = defaultdict(list)
    for i, u in u_by_id.items():
        for c in range(4):
            buckets[(c, (u >> (16 * c)) & 0xFFFF)].append(i)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            cand.add((a, b))
    rows = []
    for a, b in sorted(cand):
        ham = (u_by_id[a] ^ u_by_id[b]).bit_count()
        if ham <= max_hamming:
            rows.append((a, b, ham))
    return rows


def _langid_expected(sf_dir: str) -> list[tuple]:
    return [(i, classify_text(t)[0]) for i, t in _docs(sf_dir)]


@lru_cache(maxsize=4)
def _docs_chars(sf_dir: str) -> tuple[tuple[str | None, int | None], ...]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "n_chars"])
    return tuple(zip(t.column("text").to_pylist(), t.column("n_chars").to_pylist()))


def _lang_distribution_expected(sf_dir: str) -> list[tuple]:
    """(detected_lang, n_docs, avg_chars) — aggregation over the shared
    classifier. avg over n_chars is exact in float64 regardless of summation
    order (integers ≤ 5000, sums ≪ 2^53), so the serial Python mean equals
    Spark's distributed avg bit-for-bit."""
    groups: dict[str, list[int | None]] = defaultdict(list)
    for text, n_chars in _docs_chars(sf_dir):
        groups[classify_text(text)[0]].append(n_chars)
    rows = []
    for lang in sorted(groups):
        chars = [c for c in groups[lang] if c is not None]
        avg = (float(sum(chars)) / float(len(chars))) if chars else None
        rows.append((lang, len(groups[lang]), avg))
    return rows


def _perplexity_expected(sf_dir: str) -> list[tuple]:
    rows = []
    for i, t in _docs(sf_dir):
        p = log_perplexity(t)
        rows.append((i, None if math.isnan(p) else p))
    return rows


def _compression_ratio_expected(sf_dir: str) -> list[tuple]:
    return [(i, compression_ratio_one(t)) for i, t in _docs(sf_dir)]


def _fingerprints_expected(sf_dir: str) -> list[tuple]:
    rows = []
    for i, t in _docs(sf_dir):
        fp = winnow_fingerprints(t)
        rows.append((i, None if fp is None else len(fp)))
    return rows


def _doc_signals_expected(sf_dir: str) -> list[tuple]:
    """Merged per-document repetition signals (winnowing fingerprint count +
    zlib compression ratio) — one row per doc, joined on doc_id."""
    comp = dict(_compression_ratio_expected(sf_dir))
    return [(i, n, comp[i]) for i, n in _fingerprints_expected(sf_dir)]


@lru_cache(maxsize=4)
def _docs_lang(sf_dir: str) -> tuple[tuple[int, str | None], ...]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return tuple(zip(t.column("doc_id").to_pylist(), t.column("lang").to_pylist()))


def _stratified_sample_expected(sf_dir: str) -> list[tuple]:
    """Deterministic per-language sampling decisions, recomputed with the
    pure-Python XXH64 replica (an independent implementation of the public
    XXH64 spec — the Spark side uses the JVM's ``xxhash64``, sharing no
    code with this check)."""
    fractions = {"en": 0.5, "de": 0.25, "fr": 0.1}
    default = 0.05
    rows = []
    for i, lang in _docs_lang(sf_dir):
        f = fractions.get(lang, default) if lang is not None else default
        if sample_bucket(i) < int(round(f * SCALE)):
            rows.append((i, lang))
    return rows


def _ann_candidate_ids(sf_dir: str, n_planes: int = 8, seed: int = 42,
                       n_tables: int = 1) -> list[int]:
    """vec_ids landing in the query's probe buckets in ANY of the
    ``n_tables`` independent tables — replicates ``lsh_bucket_ids``
    (executor numpy matmul on float32 vectors) + ``query_bucket`` multiprobe
    exactly, serially."""
    embs = _embeddings(sf_dir)
    q = next(e for i, e in embs if i == 0)
    valid = [(i, e) for i, e in embs if e is not None]
    m = np.array([e for _, e in valid], dtype=np.float32)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    hit: set[int] = set()
    for t in range(n_tables):
        probes = set(query_bucket(list(q), n_planes, seed + t, multiprobe=True))
        planes = _planes(m.shape[1], n_planes, seed + t)
        signs = (m @ planes) > 0
        b = signs @ weights
        hit.update(i for (i, _), bb in zip(valid, b) if int(bb) in probes)
    return sorted(hit)


def _packing_expected(sf_dir: str, max_tokens: int = 400, n_buckets: int = 4,
                      salt: int = 4242) -> list[tuple]:
    """(doc_id, bucket, pack_id) replay: XXH64 bucketing via the
    independent pure-Python hash (``ops.sampling.xxhash64_long`` — the
    Spark side uses the JVM's xxhash64) and an independently written
    first-fit-decreasing pass per id-sorted bucket."""
    from dataqualityassistant_spark.ops.sampling import xxhash64_long

    by_bucket: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for i, text in _docs(sf_dir):
        if text is None:
            continue
        # replicate the Spark side's Java-regex \s+ (ASCII class incl.
        # \x0B) rather than Python str.split()'s Unicode whitespace —
        # NBSP/thin-space must count as word chars on both sides
        wc = len([w for w in re.split("[ \t\n\x0b\f\r]+", text) if w])
        b = xxhash64_long(salt, xxhash64_long(i)) % n_buckets
        by_bucket[b].append((i, wc))
    rows = []
    for b, members in by_bucket.items():
        members.sort()  # canonical id order, as the executor sorts its group
        order = sorted(range(len(members)), key=lambda j: (-members[j][1], j))
        bins: list[int] = []  # remaining capacities
        assigned = [0] * len(members)
        for j in order:
            size = members[j][1]
            placed = None
            for bi in range(len(bins)):
                if size <= bins[bi]:
                    placed = bi
                    bins[bi] -= size
                    break
            if placed is None:
                bins.append(max(max_tokens - size, 0))
                placed = len(bins) - 1
            assigned[j] = placed
        rows += [(members[j][0], b, assigned[j]) for j in range(len(members))]
    return sorted(rows)


def _corpus_mix_expected(sf_dir: str, salt: int = 42) -> list[tuple]:
    """Rebalance decisions replayed independently: per-language counts from
    the parquet, the binding-stratum rate arithmetic written fresh (not a
    call into ops.sampling.mix_rates), thresholds and XXH64 buckets via the
    independent pure-Python hash."""
    from dataqualityassistant_spark.ops.sampling import SCALE, xxhash64_long

    weights = {"en": 0.4, "de": 0.3, "fr": 0.3}
    counts: dict[str, int] = defaultdict(int)
    for _, lang in _docs_lang(sf_dir):
        if lang is not None:
            counts[lang] += 1
    feasible = [counts[s] / w for s, w in weights.items() if w > 0 and counts.get(s)]
    if not feasible:  # no weighted stratum present -> nothing kept (and no
        return []     # ValueError that would void the whole oracle dict)
    scale = min(feasible)
    thr = {}
    for s, w in weights.items():
        rate = min(1.0, scale * w / counts[s]) if (w > 0 and counts.get(s)) else 0.0
        thr[s] = int(round(rate * SCALE))
    rows = []
    for i, lang in _docs_lang(sf_dir):
        if lang in thr and (xxhash64_long(salt, xxhash64_long(i)) % SCALE) < thr[lang]:
            rows.append((i, lang))
    return rows


def _sample_topn_expected(sf_dir: str, n: int = 50, salt: int = 42) -> list[tuple]:
    """The n rows with the smallest xxhash64(doc_id, salt), replayed with
    the independent pure-Python XXH64 (Spark side uses the JVM hash)."""
    from dataqualityassistant_spark.ops.sampling import xxhash64_long

    rows = [(xxhash64_long(salt, xxhash64_long(i)), i, lang)
            for i, lang in _docs_lang(sf_dir)]
    rows.sort()
    return [(i, lang) for _, i, lang in rows[:n]]


def _ivf_candidate_ids(sf_dir: str, n_centroids: int = 16, n_iters: int = 8,
                       nprobe: int = 4) -> list[int]:
    """vec_ids assigned to the query's ``nprobe`` nearest centroids. The
    codebook is the shared pure ``kmeans_fit`` (plumbing parity); the
    assignment + probe-selection logic is reimplemented here as plain
    scalar loops, independent of the executor's vectorized argmax."""
    embs = _embeddings(sf_dir)
    valid = sorted(((i, e) for i, e in embs if e is not None), key=lambda t: t[0])
    cents = kmeans_fit(np.array([e for _, e in valid], dtype=np.float64),
                       n_centroids, n_iters)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else list(v)

    def nearest(v) -> int:
        u = unit([float(x) for x in v])
        best, best_sim = 0, -2.0
        for j in range(len(cents)):
            s = sum(a * float(b) for a, b in zip(u, cents[j]))
            if s > best_sim:
                best, best_sim = j, s
        return best

    q = unit([float(x) for x in next(e for i, e in embs if i == 0)])
    sims = [(sum(a * float(b) for a, b in zip(q, cents[j])), j) for j in range(len(cents))]
    sims.sort(key=lambda t: (-t[0], t[1]))
    probes = {j for _, j in sims[:nprobe]}
    return sorted(i for i, e in valid if nearest(e) in probes)


# --------------------------------------------------------------- public API

@lru_cache(maxsize=4)
def fixture_oracle_sql(sf_dir: str = ORACLE_SF_DIR) -> dict[str, str]:
    """Oracle SQL (literal expected results) for the six non-SQL queries.
    Returns {} when the fixture tables are unreadable (e.g. driver invokes
    oracle_sql() in an environment without the testdata) — those queries
    then degrade to the rows-only check instead of failing all oracles."""
    try:
        _docs(sf_dir)
        _embeddings(sf_dir)
    except Exception:
        return {}
    ann_ids = _ann_candidate_ids(sf_dir, n_tables=2)
    in_list = ", ".join(str(i) for i in sorted(ann_ids)) or "-1"
    ivf_in_list = ", ".join(str(i) for i in _ivf_candidate_ids(sf_dir)) or "-1"
    return {
        "minhash_dup_pairs": values_sql(
            _minhash_expected(sf_dir),
            ["id_a", "id_b", "jaccard_est"],
            [_sql_bigint, _sql_bigint, _sql_double],
        ),
        "simhash_dup_pairs": values_sql(
            _simhash_expected(sf_dir),
            ["id_a", "id_b", "hamming"],
            [_sql_bigint, _sql_bigint, _sql_int],
        ),
        "langid_docs": values_sql(
            _langid_expected(sf_dir),
            ["doc_id", "detected_lang"],
            [_sql_bigint, _sql_varchar],
        ),
        "lang_distribution": values_sql(
            _lang_distribution_expected(sf_dir),
            ["detected_lang", "n_docs", "avg_chars"],
            [_sql_varchar, _sql_bigint, _sql_double],
        ),
        "perplexity_docs": values_sql(
            _perplexity_expected(sf_dir),
            ["doc_id", "log_ppl"],
            [_sql_bigint, _sql_double],
        ),
        "packed_sequences": values_sql(
            _packing_expected(sf_dir),
            ["doc_id", "bucket", "pack_id"],
            [_sql_bigint, _sql_int, _sql_int],
        ),
        "doc_signals": values_sql(
            _doc_signals_expected(sf_dir),
            ["doc_id", "n_fingerprints", "compression_ratio"],
            [_sql_bigint, _sql_int, _sql_double],
        ),
        "corpus_mix": values_sql(
            _corpus_mix_expected(sf_dir),
            ["doc_id", "lang"],
            [_sql_bigint, _sql_varchar],
        ),
        "sample_topn": values_sql(
            _sample_topn_expected(sf_dir),
            ["doc_id", "lang"],
            [_sql_bigint, _sql_varchar],
        ),
        "dedup_survivors": values_sql(
            _survivors_expected(sf_dir),
            ["doc_id"],
            [_sql_bigint],
        ),
        "stratified_sample": values_sql(
            _stratified_sample_expected(sf_dir),
            ["doc_id", "lang"],
            [_sql_bigint, _sql_varchar],
        ),
        # ANN: only the LSH bucket membership is computed here; the cosine
        # scoring + ordering stays in DuckDB (same shape as the exhaustive
        # topk_cosine oracle, restricted to the probed buckets' members).
        "ivf_topk": f"""
            SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                CAST(q.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id IN ({ivf_in_list})
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id
            LIMIT 10
        """,
        "ann_lsh_topk": f"""
            SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                CAST(q.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id IN ({in_list})
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id
            LIMIT 10
        """,
    }
