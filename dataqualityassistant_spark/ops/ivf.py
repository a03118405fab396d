"""IVF (inverted-file) approximate nearest-neighbor search.

The second ANN scale path next to random-hyperplane LSH
(``ops/similarity.py``): a small spherical k-means codebook is trained
driver-side on a deterministic sample, every vector is assigned to its
nearest centroid in one vectorized Arrow stage, and a query probes only the
``nprobe`` nearest centroids' inverted lists. With the index written
``partitionBy(centroid_id)``, the probe filter is partition pruning — a
top-k over 10^12 vectors reads ~``nprobe/n_centroids`` of the files.

Scale shape:

* training: ``kmeans_fit`` is numpy Lloyd's over a DRIVER-SIDE sample —
  the standard IVF recipe (FAISS trains on ~10^5–10^6 samples regardless
  of corpus size). The sample is hash-deterministic (``ops/sampling``), so
  the codebook is reproducible across runs and cluster sizes;
* assignment: one ``argmax(X @ C.T)`` matmul per Arrow batch — no shuffle,
  no per-row Python;
* search: centroid scoring is driver-side metadata math (``n_centroids``
  floats), the candidate scan is one filter + ``cosine_topk``'s
  TakeOrderedAndProject (per-partition heaps, no global sort).

Spherical k-means (unit-normalized vectors and centroids, cosine
assignment) is used throughout so the coarse quantizer agrees with the
final cosine scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .sampling import hash_sample, hash_topn_sample
from .similarity import cosine_topk

__all__ = [
    "kmeans_fit",
    "train_ivf_centroids",
    "ivf_assign",
    "ivf_topk",
    "write_ivf_index",
    "ivf_topk_indexed",
]


def _unit_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def kmeans_fit(vectors: np.ndarray, n_centroids: int, n_iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd's) on a float64 matrix.

    Init is the first ``n_centroids`` DISTINCT unit vectors in row order —
    callers pass rows sorted by id, making the whole fit a pure function of
    the sample (no RNG), which is what lets the serial oracle reproduce the
    codebook exactly. Empty clusters keep their previous centroid."""
    try:
        x = np.asarray(vectors, dtype=np.float64)
    except ValueError as e:  # ragged rows can't form a 2-D float matrix
        raise ValueError(
            f"need >= {n_centroids} distinct vectors to init: training "
            f"sample is ragged (mixed embedding dims): {e}") from e
    if x.ndim != 2 or x.shape[0] == 0:
        # an empty (or 1-D) sample would die later with a cryptic numpy
        # AxisError — fail with the intended message instead
        raise ValueError(
            f"need >= {n_centroids} distinct vectors to init, got 0 "
            "(empty or malformed training sample)")
    x = _unit_rows(x)
    # first-seen distinct rows via hashed row bytes (±0.0 canonicalized so
    # equality matches ==) — the previous per-row array_equal scan was
    # O(rows × centroids) driver time on duplicate-heavy samples.
    # r6: the -0.0 fold is one whole-matrix add (x + 0.0 maps -0.0 to +0.0
    # and is the identity elsewhere) instead of a per-row np.where.
    canon = x + 0.0
    seen: set[bytes] = set()
    order: list[int] = []
    for i in range(canon.shape[0]):
        key = canon[i].tobytes()
        if key not in seen:
            seen.add(key)
            order.append(i)
            if len(order) == n_centroids:
                break
    if len(order) < n_centroids:
        raise ValueError(
            f"need >= {n_centroids} distinct vectors to init, got {len(order)}")
    c = x[order].copy()
    for _ in range(n_iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                c[j] = members.sum(axis=0)
        c = _unit_rows(c)
    return c


#: hard ceiling on the driver-side training collect (rows). FAISS-style IVF
#: training needs ~10^5-10^6 samples regardless of corpus size; 200k rows of
#: 64-dim float64 is ~100 MB on the driver. ``None`` is the explicit opt-out.
DEFAULT_MAX_TRAIN_ROWS = 200_000


def _training_sample(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    sample_fraction: float,
    salt: int,
    max_train_rows: int | None,
) -> DataFrame:
    """The bounded training relation: hash-fraction filter (caller-tuned),
    then a HARD deterministic cap — rows ordered by ``xxhash64(id)`` (id
    tiebreak), ``limit(max_train_rows)``. The cap compiles to
    TakeOrderedAndProject: per-partition top-k heaps, never a global sort,
    and the driver receives at most ``max_train_rows`` rows no matter what
    ``sample_fraction`` the caller passed. When the corpus is already under
    the cap the order-then-limit passes every row through, so small-fixture
    codebooks are unchanged."""
    sampled = df.where(F.col(vec_col).isNotNull())
    if sample_fraction < 1.0:
        # the documented sampling semantics live in ops.sampling — reuse
        # them (identical expression: pmod(xxhash64(id::long, salt), SCALE))
        sampled = hash_sample(sampled, sample_fraction, id_col=id_col, salt=salt)
    sampled = sampled.select(id_col, vec_col)
    if max_train_rows is not None:
        # hash_topn_sample at salt+1 = the hard cap: an independent draw
        # from the fraction filter, compiled to TakeOrderedAndProject
        sampled = hash_topn_sample(sampled, int(max_train_rows),
                                   id_col=id_col, salt=salt + 1)
    return sampled


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_fraction: float = 1.0,
    n_iters: int = 10,
    salt: int = 4242,
    max_train_rows: int | None = DEFAULT_MAX_TRAIN_ROWS,
) -> np.ndarray:
    """Collect a hash-deterministic sample of embeddings to the driver and
    fit the codebook. ``sample_fraction`` should target ~10^5–10^6 rows at
    production scale (e.g. 1e-6 at 10^12 rows), and ``max_train_rows``
    (default 200k, ``None`` to opt out) HARD-bounds the driver collect even
    when the caller leaves ``sample_fraction`` at 1.0 — the ONLY collect in
    the IVF path, capped by construction rather than by convention."""
    sampled = _training_sample(df, vec_col, id_col, sample_fraction, salt, max_train_rows)
    mat = None
    try:
        # r6: Arrow collect — no per-row Row pickling (measured 0.61 -> 0.41 s
        # for the 20k-row sf1.0 sample; float64 values bit-identical through
        # Arrow). Only taken when the vectors are uniform-width and non-null;
        # ragged/null samples fall back to the Row path so the informative
        # kmeans_fit errors are unchanged.
        tbl = sampled.toArrow()
        ids = tbl.column(0).to_numpy(zero_copy_only=False)
        col = tbl.column(1).combine_chunks()
        if col.null_count == 0:
            widths = np.diff(col.offsets.to_numpy())
            if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
                flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
                mat = flat.reshape(len(ids), -1)[np.argsort(ids, kind="stable")]
    except Exception:
        mat = None
    if mat is None:
        rows = sampled.collect()
        rows.sort(key=lambda r: r[0])  # id order => deterministic fit
        mat = np.array([r[1] for r in rows])
    return kmeans_fit(mat, n_centroids, n_iters)


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Nearest-centroid id per row: one ``argmax(X @ C.T)`` per Arrow batch.
    The codebook ships in the UDF closure (n_centroids × dim floats —
    metadata-sized, no broadcast variable needed). Rows whose vector length
    differs from the codebook dim get a NULL centroid like NULL vectors —
    a single ragged row must not crash np.stack for the whole job (the same
    hardening as ``cosine_topk``'s scoring kernel)."""
    c = _unit_rows(np.asarray(centroids, dtype=np.float64))
    dim = c.shape[1]

    @pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        out = pd.array([None] * n, dtype="Int32")
        arrs = vecs.to_numpy()
        lens = np.fromiter((len(a) if a is not None else -1 for a in arrs),
                           dtype=np.int64, count=n)
        valid = lens == dim
        if valid.any():
            m = np.stack(arrs[valid]).astype(np.float64)
            # r6 (ADVICE): a NaN-element vector of the right dim passed the
            # length guard, argmax over its all-NaN score row deterministically
            # returned 0, and NaN vectors silently piled into list 0. Mask
            # them to a NULL centroid like the other degenerate shapes
            # (mirrors cosine_topk's NaN-drop policy).
            finite = np.isfinite(m).all(axis=1)
            if finite.any():
                mf = _unit_rows(m[finite])
                ids = np.argmax(mf @ c.T, axis=1).astype(np.int32)
                tgt = np.flatnonzero(valid)[finite]
                out[tgt] = ids
        return pd.Series(out)

    return df.withColumn(out_col, assign(F.col(vec_col)))


def probe_centroids(centroids: np.ndarray, query, nprobe: int) -> list[int]:
    """The ``nprobe`` centroid ids nearest (cosine) to the query — pure
    driver-side metadata math."""
    c = _unit_rows(np.asarray(centroids, dtype=np.float64))
    q = np.asarray([float(v) for v in query], dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    sims = c @ q
    order = np.lexsort((np.arange(len(sims)), -sims))  # sim desc, id asc tiebreak
    return [int(i) for i in order[:nprobe]]


def ivf_topk(
    df: DataFrame,
    centroids: np.ndarray,
    query,
    k: int = 10,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k over an unindexed table: assign + probe-filter in one scan,
    exact cosine only inside the probed lists."""
    probes = probe_centroids(centroids, query, nprobe)
    cand = ivf_assign(df, centroids, vec_col).where(F.col("centroid_id").isin(probes))
    return cosine_topk(cand, query, k, vec_col, id_col)


def write_ivf_index(
    df: DataFrame, path: str, centroids: np.ndarray, vec_col: str = "embedding"
) -> None:
    """Persist the corpus partitioned by centroid id (pre-repartitioned so
    each inverted list is written by one task, not tasks × lists fan-out)."""
    assigned = ivf_assign(df, centroids, vec_col)
    assigned.repartition(F.col("centroid_id")).write.mode("overwrite").partitionBy(
        "centroid_id").parquet(path)


def ivf_topk_indexed(
    spark,
    path: str,
    centroids: np.ndarray,
    query,
    k: int = 10,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k against a written IVF index: the centroid filter is a
    PartitionFilter — unprobed lists are pruned at file-listing time."""
    probes = probe_centroids(centroids, query, nprobe)
    cand = spark.read.parquet(path).where(F.col("centroid_id").isin(probes))
    return cosine_topk(cand, query, k, vec_col, id_col)
