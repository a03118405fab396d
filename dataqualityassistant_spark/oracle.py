"""In-repo pandas oracle: an independent, minimal re-implementation of the
reference's expectation semantics (behavior of
``app/services/quality_engine.py:224-430``) used ONLY for differential
testing and for freezing golden keep/drop labels. This is deliberately the
"slow, obvious" implementation — the Spark engine must agree with it on
counts, percents, success flags and sample *sets*.

Not for production use; it materializes the whole frame like the reference
does.
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd


def oracle_expectation(df: pd.DataFrame, expectation_type: str, kwargs: dict[str, Any]) -> dict:
    mostly = kwargs.get("mostly", 1.0)
    mostly = 1.0 if mostly is None else float(mostly)
    n = len(df)

    def verdict(count: int) -> tuple[float, bool]:
        pct = (count / n * 100) if n > 0 else 0
        return pct, pct <= (1 - mostly) * 100

    col = kwargs.get("column")

    if expectation_type == "expect_column_values_to_not_be_null":
        mask = df[col].isnull()
        count = int(mask.sum())
        pct, ok = verdict(count)
        return {"unexpected_count": count, "unexpected_percent": pct, "success": ok,
                "element_count": n, "mask": mask}

    if expectation_type == "expect_column_values_to_be_in_set":
        mask = df[col].notnull() & ~df[col].isin(kwargs.get("value_set", []))
        count = int(mask.sum())
        pct, ok = verdict(count)
        return {"unexpected_count": count, "unexpected_percent": pct, "success": ok,
                "element_count": n, "mask": mask,
                "unexpected_values": df[mask][col].head(10).tolist() if count else []}

    if expectation_type == "expect_column_values_to_be_between":
        lo, hi = kwargs.get("min_value"), kwargs.get("max_value")
        mask = pd.Series(False, index=df.index)
        if lo is not None:
            mask = mask | (df[col].notnull() & (df[col] < lo))
        if hi is not None:
            mask = mask | (df[col].notnull() & (df[col] > hi))
        count = int(mask.sum())
        pct, ok = verdict(count)
        return {"unexpected_count": count, "unexpected_percent": pct, "success": ok,
                "element_count": n, "mask": mask,
                "unexpected_values": df[mask][col].head(10).tolist() if count else []}

    if expectation_type == "expect_column_values_to_match_regex":
        rx = re.compile(kwargs["regex"])
        nn = df[col].notnull()
        mask = nn & ~df[col].astype(str).str.match(rx).fillna(False).astype(bool)
        count = int(mask.sum())
        pct, ok = verdict(count)
        return {"unexpected_count": count, "unexpected_percent": pct, "success": ok,
                "element_count": n, "mask": mask,
                "unexpected_values": df[mask][col].head(10).tolist() if count else []}

    if expectation_type == "expect_column_values_to_be_unique":
        dup_mask = df[col].duplicated(keep=False)
        dup_values = df[dup_mask][col].unique().tolist()
        count = int(dup_mask.sum()) - len(dup_values)
        pct, ok = verdict(count)
        return {"unexpected_count": count, "unexpected_percent": pct, "success": ok,
                "element_count": n, "mask": dup_mask,
                "unexpected_values": dup_values[:10] if count else []}

    return {"success": False,
            "error": f"Expectation type '{expectation_type}' not implemented in direct evaluation mode"}


def oracle_keep_mask(df: pd.DataFrame, rules) -> pd.Series:
    """Row-level keep verdict: keep iff no row-local expectation flags the
    row (same predicates the Spark engine's keep_mask compiles)."""
    keep = pd.Series(True, index=df.index)
    for rule in rules:
        for e in rule.expectations:
            r = oracle_expectation(df, e.expectation_type, e.kwargs)
            mask = r.get("mask")
            if mask is not None and e.expectation_type != "expect_column_values_to_be_unique":
                keep = keep & ~mask
    return keep
