"""Deterministic sequence packing: group documents into fixed token-budget
bins (training-sequence construction for LLM pipelines).

Greedy bin packing is inherently sequential, so the scalable formulation
fixes WHERE the sequential work happens: documents are hash-partitioned
into ``n_buckets`` deterministic groups (xxhash64 on the id — stable under
repartitioning and appends, same keying as ``ops/sampling``), and
first-fit-decreasing runs independently inside each bucket via
``applyInPandas``. One shuffle on the bucket key; per-bucket state is just
the open-bin capacities. Size ``n_buckets`` so a bucket holds ~10^3–10^5
docs (10^9 docs / 2^17 buckets ≈ 8k docs each); cross-bucket packing loss
is the tail bin per bucket — negligible at that granularity.

The result is a pure function of the (id, token_count) multiset: the
entry-contract literal oracle replays the identical FFD spec in plain
Python (``oracles._packing_expected``) with an independent XXH64
implementation for the bucket assignment.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pack_sequences", "ffd_pack"]


def ffd_pack(sizes: list[int], capacity: int) -> list[int]:
    """First-fit-decreasing bin index for each input (input order preserved
    in the output). Items are placed largest-first (ties keep input order)
    into the lowest-indexed bin with room; an item larger than ``capacity``
    gets a bin of its own (callers should truncate downstream). Pure
    function — the oracle replays this exact spec."""
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    remaining: list[int] = []
    out = [0] * len(sizes)
    for i in order:
        s = sizes[i]
        for b, cap in enumerate(remaining):
            if s <= cap:
                remaining[b] = cap - s
                out[i] = b
                break
        else:
            remaining.append(max(capacity - s, 0))
            out[i] = len(remaining) - 1
    return out


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    token_col: str = "token_count",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    salt: int = 4242,
) -> DataFrame:
    """(id, bucket, pack_id) — ``(bucket, pack_id)`` is the global sequence
    key. Rows with NULL id/token count are dropped (they cannot be packed
    deterministically)."""
    base = (
        df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(token_col).cast("long").alias("token_count"))
        .where(F.col("doc_id").isNotNull() & F.col("token_count").isNotNull())
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("doc_id", F.lit(int(salt)).cast("long")),
                   F.lit(int(n_buckets))).cast("int"),
        )
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("pack_id", T.IntegerType()),
    ])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort for a canonical input order (shuffle arrival order is not
        # deterministic), then FFD over token counts. token_count is the
        # tiebreak: duplicate doc_ids with different counts would otherwise
        # keep arrival order under the stable sort and flip pack_ids across
        # reruns — the result must be a pure function of the (id, count)
        # multiset
        pdf = (pdf.sort_values(["doc_id", "token_count"], kind="mergesort")
               .reset_index(drop=True))
        bins = ffd_pack([int(t) for t in pdf["token_count"]], max_tokens)
        return pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "bucket": pdf["bucket"],
            "pack_id": pd.Series(bins, dtype="int32"),
        })

    return base.groupBy("bucket").applyInPandas(pack, schema)
