"""Table profiling, relationship inference, and heuristic rule suggestion.

Spark-native port of the reference's profiling/suggestion subsystem:

- ``profile_table``: schema + seeded random sample (reference
  ``rule_generator.py:31-52`` uses ``ORDER BY RANDOM() LIMIT 100``) +
  per-column typed statistics (reference ``app/main.py:847-955`` issues one
  sampled SQL query per column; here ALL columns' stats come from one
  single-pass ``df.agg`` over the full table — exact, not sampled, and one
  scan instead of N).
- ``infer_relationships``: driver-side name/type/sample heuristics
  (reference ``rule_generator.py:679-806``): shared-name pairs, ``*_id`` FK
  guesses, date-pair ordering, sample value correlation (>50% match over at
  most 10 prioritized pairs / 20 columns — caps preserved).
- ``suggest_rules``: the deterministic fallback suggestion engine
  (reference ``rule_generator.py:900-971``): not-null for id-like columns,
  uniqueness for ``*_id``, email-format regex — same confidence scores.
  (The reference's LLM path is out of scope — no external services; its
  deterministic fallback is the only suggestion engine here.)
- ``rule_from_description``: the NL keyword parser (reference
  ``rule_generator.py:415-496``), a pure function.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SAMPLE_SEED = 42
EMAIL_REGEX = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"

_NUMERIC = (T.IntegerType, T.LongType, T.ShortType, T.ByteType, T.FloatType,
            T.DoubleType, T.DecimalType)
_TEMPORAL = (T.DateType, T.TimestampType)


def random_sample(df: DataFrame, n: int = 100, seed: int = SAMPLE_SEED) -> list[dict]:
    """Seeded analog of the reference's ORDER BY RANDOM() LIMIT 100
    (rule_generator.py:46). orderBy(rand) is a full sort — acceptable for
    profiling; at huge scale swap in df.sample() + limit."""
    return [r.asDict() for r in df.orderBy(F.rand(seed)).limit(n).collect()]


def column_statistics(df: DataFrame) -> dict[str, dict[str, Any]]:
    """Typed stats for ALL columns in one aggregate pass (vs the reference's
    one sampled subquery per column, app/main.py:847-955)."""
    # aliases are positional (__a0, __a1, ...), decoded via the per-column
    # stat-name list built alongside: decoding by name-prefix would let a
    # column that is a '__'-prefix of another (e.g. 'a' and 'a__b') absorb
    # the other's stats into its dict
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    per_col: dict[str, list[tuple[str, str]]] = {}

    def add(name: str, stat: str, expr) -> None:
        alias = f"__a{len(aggs)}"
        aggs.append(expr.alias(alias))
        per_col.setdefault(name, []).append((stat, alias))

    for f in df.schema.fields:
        c, name = F.col(f.name), f.name
        add(name, "nulls", F.count(F.lit(1)) - F.count(c))
        if isinstance(f.dataType, _NUMERIC):
            add(name, "min", F.min(c))
            add(name, "max", F.max(c))
            add(name, "avg", F.avg(c))
        elif isinstance(f.dataType, T.StringType):
            add(name, "min_len", F.min(F.length(c)))
            add(name, "max_len", F.max(F.length(c)))
            add(name, "avg_len", F.avg(F.length(c)))
        elif isinstance(f.dataType, _TEMPORAL):
            add(name, "min", F.min(c))
            add(name, "max", F.max(c))
        elif isinstance(f.dataType, T.BooleanType):
            add(name, "true", F.sum(F.when(c, 1).otherwise(0)))
            add(name, "false", F.sum(F.when(~c, 1).otherwise(0)))
    row = df.agg(*aggs).collect()[0].asDict()
    n = row.pop("__n")
    out: dict[str, dict[str, Any]] = {}
    for f in df.schema.fields:
        stats = {"total_rows": n, "data_type": f.dataType.simpleString()}
        for stat, alias in per_col.get(f.name, []):
            stats[stat] = row[alias]
        out[f.name] = stats
    return out


def profile_table(df: DataFrame, sample_rows: int = 100) -> dict[str, Any]:
    sample = random_sample(df, sample_rows)
    return {
        "columns": [
            {"column_name": f.name, "data_type": f.dataType.simpleString(),
             "is_nullable": f.nullable}
            for f in df.schema.fields
        ],
        "sample_data": sample,
        "statistics": column_statistics(df),
        # reuse the collected sample — random_sample is a full sort, no
        # reason to pay it twice (and relationships should be inferred from
        # the same rows the profile reports)
        "relationships": infer_relationships(df, sample=sample),
    }


# ------------------------------------------------------------ relationships

_NAME_PATTERNS = ["id", "name", "email", "date", "time", "amount", "price", "count"]


def infer_relationships(df: DataFrame, sample: list[dict] | None = None) -> dict[str, Any]:
    cols = df.schema.fields[:20]  # reference caps correlation work at 20 columns
    names = [f.name for f in cols]

    related_by_name = []
    for pat in _NAME_PATTERNS:
        group = [n for n in names if pat in n.lower()]
        if len(group) > 1:
            related_by_name.append({"pattern": pat, "columns": group})

    potential_fks = [
        {"column": n, "potential_reference": n[: -len("_id")] + "s"}
        for n in names
        if n.lower().endswith("_id") and n.lower() != "id"
    ]

    temporal = [f.name for f in cols if isinstance(f.dataType, _TEMPORAL)]
    date_pairs = []
    for i, a in enumerate(temporal):
        for b in temporal[i + 1:]:
            al, bl = a.lower(), b.lower()
            if ("start" in al and "end" in bl) or ("created" in al and "updated" in bl):
                date_pairs.append({"earlier": a, "later": b})

    if sample is None:
        sample = random_sample(df, 100)
    correlations = []
    if sample:
        # prioritized pairs: string/number columns with related names first;
        # ≤10 pairs (reference rule_generator.py:764)
        pairs = []
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                score = sum(1 for p in _NAME_PATTERNS if p in a.lower() and p in b.lower())
                pairs.append((score, a, b))
        pairs.sort(key=lambda t: (-t[0], t[1], t[2]))
        for _, a, b in pairs[:10]:
            matches = 0
            compared = 0
            for row in sample:
                va, vb = row.get(a), row.get(b)
                if va is None or vb is None:
                    continue
                compared += 1
                sa, sb = str(va), str(vb)
                if sa == sb or sa in sb or sb in sa:
                    matches += 1
            if compared and matches / compared > 0.5:
                correlations.append({"column_a": a, "column_b": b,
                                     "match_rate": matches / compared})

    return {
        "related_by_name": related_by_name,
        "potential_foreign_keys": potential_fks,
        "date_comparisons": date_pairs,
        "value_correlations": correlations,
    }


# -------------------------------------------------------------- suggestions

def suggest_rules(df: DataFrame, table_name: str = "") -> list[dict[str, Any]]:
    """Deterministic heuristic suggestions with the reference's shapes and
    confidence levels (rule_generator.py:900-971)."""
    suggestions: list[dict[str, Any]] = []
    for f in df.schema.fields:
        name, lname = f.name, f.name.lower()
        is_numeric = isinstance(f.dataType, _NUMERIC)
        if not f.nullable or lname == "id" or lname.endswith("_id"):
            suggestions.append({
                "rule_name": f"{name}_not_null",
                "table_name": table_name,
                "rule_config": [{"expectation_type": "expect_column_values_to_not_be_null",
                                 "kwargs": {"column": name}}],
                "confidence": 90,
                "reason": f"column '{name}' looks mandatory (id-like or non-nullable)",
            })
        if (lname == "id" or lname.endswith("_id")) and is_numeric:
            suggestions.append({
                "rule_name": f"{name}_unique",
                "table_name": table_name,
                "rule_config": [{"expectation_type": "expect_column_values_to_be_unique",
                                 "kwargs": {"column": name}}],
                "confidence": 85,
                "reason": f"column '{name}' looks like a key",
            })
        if isinstance(f.dataType, T.StringType) and "email" in lname:
            suggestions.append({
                "rule_name": f"{name}_email_format",
                "table_name": table_name,
                "rule_config": [{"expectation_type": "expect_column_values_to_match_regex",
                                 "kwargs": {"column": name, "regex": EMAIL_REGEX}}],
                "confidence": 80,
                "reason": f"column '{name}' looks like an email address",
            })
    return suggestions


def suggest_range_rules(df: DataFrame, table_name: str = "",
                        lower_q: float = 0.005, upper_q: float = 0.995,
                        mostly: float = 0.99) -> list[dict[str, Any]]:
    """Data-driven between-bounds suggestions for every numeric column:
    bounds at robust quantiles (p0.5/p99.5 by default) instead of observed
    min/max, so one outlier in the profiled sample doesn't bake a useless
    bound into the rule. ONE aggregation for all columns using
    ``approx_percentile`` (mergeable sketch — the 100 TB path; exactness
    is pointless for suggested thresholds). Same suggestion dict shape as
    :func:`suggest_rules` so the two lists concatenate and
    ``RuleStore.apply_suggestions`` ingests both."""
    num_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)]
    if not num_cols:
        return []
    pcts = F.array(F.lit(float(lower_q)), F.lit(float(upper_q)))
    aggs = [F.approx_percentile(c, pcts, 10_000).alias(c) for c in num_cols]
    row = df.agg(*aggs).first()
    out: list[dict[str, Any]] = []
    for c in num_cols:
        q = row[c]
        if q is None or q[0] is None or q[1] is None or q[0] == q[1]:
            continue  # all-null or constant column: no useful range
        out.append({
            "rule_name": f"{c}_typical_range",
            "table_name": table_name,
            "rule_config": [{"expectation_type": "expect_column_values_to_be_between",
                             "kwargs": {"column": c, "min_value": float(q[0]),
                                        "max_value": float(q[1]), "mostly": mostly}}],
            "confidence": 60,
            "reason": (f"column '{c}' observed p{lower_q * 100:g}–p{upper_q * 100:g} "
                       f"range [{float(q[0]):g}, {float(q[1]):g}]"),
        })
    return out


def group_suggestions(suggestions: list[dict[str, Any]]) -> dict[str, list[dict[str, Any]]]:
    """Group suggested rules by their column key, mirroring the reference's
    generate-rules grouping (app/main.py:283-299): ``single:{col}`` for
    one-column expectations, ``pair:{a}:{b}`` for pair expectations,
    ``other:{expectation_type}`` for the rest — used to merge multiple
    suggestions for the same target before persistence."""
    groups: dict[str, list[dict[str, Any]]] = {}
    for s in suggestions:
        for exp in s.get("rule_config", []):
            kw = exp.get("kwargs", {})
            if kw.get("column_A") and kw.get("column_B"):
                key = f"pair:{kw['column_A']}:{kw['column_B']}"
            elif kw.get("column"):
                key = f"single:{kw['column']}"
            else:
                key = f"other:{exp.get('expectation_type')}"
            groups.setdefault(key, []).append(s)
    return groups


# ------------------------------------------------------ NL description parser

def rule_from_description(description: str, columns: list[str]) -> dict[str, Any] | None:
    """Keyword-heuristic NL → expectation (reference rule_generator.py:415-496):
    pure, deterministic, low confidence (30-60) to force draft status when
    ambiguous (draft threshold <70, app/main.py:1507-1509)."""
    d = description.lower()
    target = next((c for c in columns if c.lower() in d), None)
    if target is None:
        return None
    numbers = [float(x) for x in re.findall(r"\d+(?:\.\d+)?", d)]

    # precedence, keywords, and confidences follow the reference's
    # _create_fallback_rule (rule_generator.py:446-496): unique first
    # (conf 50), then the null family — bare 'null'/'missing'/'empty'
    # count, not just 'not null' — as not_be_null mostly=0.95 conf 60
    if "unique" in d or "duplicate" in d:
        return {"expectation_type": "expect_column_values_to_be_unique",
                "kwargs": {"column": target}, "confidence": 50}
    if any(k in d for k in ("null", "missing", "empty", "required", "mandatory")):
        return {"expectation_type": "expect_column_values_to_not_be_null",
                "kwargs": {"column": target, "mostly": 0.95}, "confidence": 60}
    if "email" in d:
        return {"expectation_type": "expect_column_values_to_match_regex",
                "kwargs": {"column": target, "regex": EMAIL_REGEX}, "confidence": 50}
    if ("between" in d or "range" in d) and len(numbers) >= 2:
        return {"expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": target, "min_value": numbers[0], "max_value": numbers[1]},
                "confidence": 55}
    if any(k in d for k in ("greater than", "at least", "minimum")) and numbers:
        return {"expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": target, "min_value": numbers[0]}, "confidence": 40}
    if any(k in d for k in ("less than", "at most", "maximum")) and numbers:
        return {"expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": target, "max_value": numbers[0]}, "confidence": 40}
    if "one of" in d or "in set" in d or "allowed values" in d:
        quoted = re.findall(r"'([^']+)'|\"([^\"]+)\"", description)
        values = [a or b for a, b in quoted]
        if values:
            return {"expectation_type": "expect_column_values_to_be_in_set",
                    "kwargs": {"column": target, "value_set": values}, "confidence": 50}
    return {"expectation_type": "expect_column_values_to_not_be_null",
            "kwargs": {"column": target, "mostly": 0.95}, "confidence": 30}
