"""Unicode text normalization for crawl corpora.

Web text mixes NFC/NFD encodings of the same glyphs (café as ``café``
vs ``café``), which breaks exact dedup, shingling, and vocabulary
building — identical-looking documents hash differently. Standard
preprocessing is NFC + control-character stripping.

Split by engine cost:

* control/zero-width stripping is a JVM ``regexp_replace`` (codegen'd);
* NFC itself has no Spark SQL builtin, so it is an Arrow-batched pandas
  UDF over ``str.normalize`` — NOT part of the fused scoring UDF
  (CLAUDE.md: scoring stays one UDF); this is an opt-in upstream
  transform, applied before dedup/tokenization when the corpus needs it.

Oracle: DuckDB's ``nfc_normalize`` implements the same UAX #15
normalization, so the entry-contract query ``normalize_text`` is checked
bit-for-bit against an independent NFC implementation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["strip_control_chars", "nfc_udf", "normalize_text_column"]

# C0/C1 controls except \t \n \r, plus zero-width chars and BOM
_CONTROL_PATTERN = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F\\u200B-\\u200D\\uFEFF]"


def strip_control_chars(col: Column | str) -> Column:
    """Remove control and zero-width characters (keeps \\t \\n \\r). Pure
    JVM regexp — rides the scan."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _CONTROL_PATTERN, "")


@pandas_udf(T.StringType())
def nfc_udf(texts: pd.Series) -> pd.Series:
    # pandas str.normalize == unicodedata.normalize per element, vectorized
    return texts.str.normalize("NFC")


def normalize_text_column(col: Column | str, nfc: bool = True) -> Column:
    """Control-strip (JVM) then optional NFC (Arrow UDF)."""
    out = strip_control_chars(col)
    return nfc_udf(out) if nfc else out
