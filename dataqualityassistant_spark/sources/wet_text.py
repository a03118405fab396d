"""WET-style (WARC conversion) record source.

Common-Crawl text dumps arrive as concatenated WARC/1.0 "conversion"
records: a header block (``WARC-Target-URI``, ``WARC-Date``, ...), a blank
line, then the extracted text body. This reader turns such files into the
pipeline's input shape — ``(url, warc_ts, text)`` — with NO Python in the
loop:

* the file is split into records by the **text datasource's custom
  ``lineSep``** (the CRLF-framed record boundary, see ``_DELIM``):
  Hadoop's line reader handles records
  spanning split boundaries (each split reads past its end to the next
  delimiter), so the source stays fully splittable — a 1 TB WET file scans
  as ~8k independent tasks, no whole-file reads
  (splittability under a tiny ``maxPartitionBytes`` is asserted in
  ``tests/test_wet_source.py``);
* header fields and the body are pulled out with JVM ``regexp_extract`` /
  ``regexp_replace`` — codegen'd, no UDF.

Real Common-Crawl WET is gzip-compressed per member; gzip is NOT
splittable, so at production scale point this reader at decompressed or
block-compressed (zstd/bzip2) copies, or let the many-files-per-crawl
layout provide the parallelism (one task per .gz member).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_wet", "wet_record_expr"]

# Record boundary = the spec-mandated two CRLFs that terminate a record,
# plus the next version line INCLUDING its CRLF. Splitting on a bare
# "WARC/1.0" would tear any document whose extracted text merely mentions
# the string (pages about web archiving); requiring the full
# blank-line+version-line+CRLF frame makes an in-body false split need a
# byte-exact record boundary. Residual risk (a body containing exactly
# this frame) is inherent to delimiter-framed WET; Content-Length-driven
# parsing would need a custom input format. WARC is CRLF-delimited per
# spec; bare-\n files will not split. WARC/1.1 dumps need the delimiter
# bumped.
_DELIM = "\r\n\r\nWARC/1.0\r\n"


def wet_record_expr(rec) -> list:
    """(url, warc_ts, text) Column triple parsed from one record string —
    exposed separately so tests and in-memory round-trips can reuse the
    exact parse the file reader applies."""
    url = F.regexp_extract(rec, r"WARC-Target-URI:\s*(\S+)", 1)
    # try_to_timestamp: Spark 4's default ANSI mode makes to_timestamp
    # ABORT the whole scan on one malformed/missing WARC-Date header;
    # crawl dumps always contain a few — they must yield NULL, not kill
    # the job
    ts = F.try_to_timestamp(F.regexp_extract(rec, r"WARC-Date:\s*(\S+)", 1))
    # body = everything after the first blank line; the trailing blank line
    # that separates this record from the next delimiter is not content
    body = F.regexp_replace(rec, r"(?s)^.*?\r?\n\r?\n", "")
    body = F.regexp_replace(body, r"\r?\n\r?\n$", "")
    return [url.alias("url"), ts.alias("warc_ts"), body.alias("text")]


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Parse WET-style files under ``path`` into (url, warc_ts, text).
    Records without a ``WARC-Target-URI`` header (e.g. the ``warcinfo``
    preamble, or the empty fragment before the first delimiter) are
    dropped."""
    raw = spark.read.option("lineSep", _DELIM).text(path)
    parsed = raw.select(*wet_record_expr(F.col("value")))
    return parsed.where(F.col("url") != "")
