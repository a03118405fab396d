"""JSONL (newline-delimited JSON) document ingestion.

Web corpora ship as JSONL at least as often as parquet. Two rules make
this safe at 100 TB:

* **schema is required** — Spark's JSON schema inference runs a full extra
  pass over the input before the real job; at crawl scale that doubles the
  read. Callers state the schema (or sample one file themselves);
* **malformed lines are a policy, not a surprise** — crawl dumps always
  contain truncated/garbage lines. ``mode`` maps to Spark's JSON parser
  modes: ``permissive`` keeps bad lines in a ``_corrupt_record`` column
  (quarantine + count them), ``dropmalformed`` silently drops,
  ``failfast`` aborts the job on the first bad line.

Spark quirk handled here: with PERMISSIVE mode you cannot filter on the
corrupt-record column alone (the parser prunes all data columns and then
refuses the internal-column-only query); ``split_corrupt`` caches the
parsed frame first — the documented workaround — so the good/bad split is
one parse, not two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl", "split_corrupt"]

_MODES = {"permissive": "PERMISSIVE", "dropmalformed": "DROPMALFORMED",
          "failfast": "FAILFAST"}

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "permissive",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema. In
    ``permissive`` mode the returned frame carries ``_corrupt_record``
    (NULL for clean rows, the raw line for malformed ones)."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}, got {mode!r}")
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if mode == "permissive" and CORRUPT_COL not in schema.fieldNames():
        # copy before add(): StructType.add mutates in place and would
        # inject _corrupt_record into the caller's schema object
        schema = T.StructType(list(schema.fields)).add(
            T.StructField(CORRUPT_COL, T.StringType()))
    return (
        spark.read.schema(schema)
        .option("mode", _MODES[mode])
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantine_rows) from a permissive
    read. Caches the parsed frame so both sides share one parse — callers
    should ``unpersist`` after materializing."""
    if CORRUPT_COL not in df.columns:
        raise ValueError("split_corrupt needs a permissive read_jsonl frame")
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
