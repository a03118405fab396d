"""The stateless training-data ops (deterministic sampling, URL
canonicalization, repeated-line removal, scrub) are pure Column
expressions, so they must compose unchanged into Structured Streaming and
produce EXACTLY the batch result on the same input — asserted here over a
file-source stream."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataqualityassistant_spark.functions.scrub import scrub_text_column
from dataqualityassistant_spark.ops.sampling import stratified_hash_sample
from dataqualityassistant_spark.ops.textstats import remove_repeated_lines
from dataqualityassistant_spark.ops.urltools import canonicalize_url


def _transform(df):
    sampled = stratified_hash_sample(df, {"en": 0.6, "de": 0.4}, default_fraction=0.2)
    url = F.concat(F.lit("HTTPS://WWW.Example.com:443/d/"),
                   F.col("doc_id").cast("string"), F.lit("?utm_source=s&id=1"))
    return sampled.select(
        "doc_id",
        canonicalize_url(url).alias("canonical_url"),
        remove_repeated_lines(F.concat_ws("\n", "text", "text")).alias("cleaned"),
        scrub_text_column("text").alias("scrubbed"),
    )


def test_stream_equals_batch(spark, tmp_path):
    # the streaming file source needs a DIRECTORY; the fixture table is a
    # flat parquet file, so stage it inside one
    path = str(tmp_path / "docs")
    os.makedirs(path)
    shutil.copy("/root/testdata/sf0.001/documents.parquet", f"{path}/part-0.parquet")
    batch_df = spark.read.parquet(path)
    want = sorted(map(tuple, _transform(batch_df).collect()))

    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    q = (
        _transform(stream)
        .writeStream.format("memory").queryName("ops_parity")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("ops_parity").collect()))
    assert got == want and len(got) > 50
