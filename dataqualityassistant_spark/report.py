"""Human-readable validation report.

The reference emits a 5-sheet Excel workbook per execution (Overall Summary /
Rules Summary / Detailed Results / Failed Data Samples / Quality Metrics +
bar chart — ``quality_engine.py:474-691``). At cluster scale the durable
outputs are the metrics/lineage tables; this module renders the same five
sections from a suite-result dict as JSON or Markdown for humans, without an
Excel dependency.
"""

from __future__ import annotations

import json
from typing import Any


def report_sections(suite: dict[str, Any]) -> dict[str, Any]:
    """The reference's five sheets as plain data structures."""
    overall = {
        "table_name": suite.get("table_name", ""),
        "execution_time": suite.get("execution_time", ""),
        "total_duration_sec": suite.get("total_duration", 0),
        "total_rules": suite.get("total_rules", 0),
        "successful_rules": suite.get("successful_rules", 0),
        "failed_rules": suite.get("failed_rules", 0),
        "success_rate_percent": suite.get("success_rate", 0),
    }
    rules_summary = [
        {
            "rule_id": r["rule_id"],
            "rule_name": r["rule_name"],
            "success": r["success"],
            "evaluated_expectations": r["statistics"]["evaluated_expectations"],
            "successful_expectations": r["statistics"]["successful_expectations"],
            "unsuccessful_expectations": r["statistics"]["unsuccessful_expectations"],
            "execution_time_sec": r.get("execution_time", 0),
        }
        for r in suite.get("results", [])
    ]
    detailed, samples, metrics = [], [], []
    for r in suite.get("results", []):
        for e in r.get("results", []):
            res = e.get("result", {})
            detailed.append({
                "rule_name": r["rule_name"],
                "expectation_type": e.get("expectation_type"),
                "success": e.get("success"),
                "element_count": res.get("element_count"),
                "unexpected_count": res.get("unexpected_count"),
                "unexpected_percent": res.get("unexpected_percent"),
                "unexpected_values": res.get("unexpected_values", []),
                "error": e.get("error"),
                "kwargs": e.get("kwargs", {}),
            })
            for s in e.get("sample_rows", []):
                samples.append({
                    "rule_name": r["rule_name"],
                    "expectation_type": e.get("expectation_type"),
                    "row": s,
                })
        evaluated = r["statistics"]["evaluated_expectations"]
        metrics.append({
            "rule_name": r["rule_name"],
            "pass_rate_percent": (
                r["statistics"]["successful_expectations"] / evaluated * 100
                if evaluated else 0
            ),
            "total_rows": r["statistics"]["total_rows"],
        })
    return {
        "overall_summary": overall,
        "rules_summary": rules_summary,
        "detailed_results": detailed,
        "failed_data_samples": samples,
        "quality_metrics": metrics,
    }


def to_json(suite: dict[str, Any], path: str | None = None) -> str:
    text = json.dumps(report_sections(suite), indent=2, default=str)
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def _md_table(rows: list[dict], columns: list[str]) -> list[str]:
    out = ["| " + " | ".join(columns) + " |",
           "|" + "|".join("---" for _ in columns) + "|"]
    for r in rows:
        out.append("| " + " | ".join(str(r.get(c, "")) for c in columns) + " |")
    return out


def to_markdown(suite: dict[str, Any], path: str | None = None) -> str:
    s = report_sections(suite)
    o = s["overall_summary"]
    lines = [
        f"# Data quality report — {o['table_name']}",
        "",
        f"- rules: {o['successful_rules']}/{o['total_rules']} passed "
        f"({o['success_rate_percent']:.1f}%)",
        f"- duration: {o['total_duration_sec']:.2f}s",
        "",
        "## Rules summary", "",
        *_md_table(s["rules_summary"],
                   ["rule_name", "success", "successful_expectations",
                    "unsuccessful_expectations"]),
        "",
        "## Detailed results", "",
        *_md_table(s["detailed_results"],
                   ["rule_name", "expectation_type", "success",
                    "unexpected_count", "unexpected_percent"]),
        "",
        "## Quality metrics", "",
        *_md_table(s["quality_metrics"], ["rule_name", "pass_rate_percent", "total_rows"]),
    ]
    if s["failed_data_samples"]:
        lines += ["", "## Failed data samples (≤5 per expectation)", ""]
        for smp in s["failed_data_samples"][:50]:
            lines.append(f"- `{smp['rule_name']}` / `{smp['expectation_type']}`: "
                         f"{json.dumps(smp['row'], default=str)}")
    text = "\n".join(lines) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def metrics_trend(spark, metrics_path: str):
    """Quality drift across runs: per (run, rule, expectation) pass rates
    aggregated from the pipeline's cumulative metrics table — the
    monitoring query for "is this crawl batch worse than the last one?".

    Waves within a run are merged by re-summing counts (percentages do NOT
    average across waves of different sizes). One aggregation over a table
    whose size is O(runs × rules × waves) — metadata-scale even at 10^12
    input docs, since metrics rows come from `observe`, not the data."""
    from pyspark.sql import functions as F

    m = spark.read.parquet(metrics_path)
    return (
        m.groupBy("run_id", "run_ts", "rule_name", "expectation_type", "column")
        .agg(F.sum("element_count").cast("bigint").alias("element_count"),
             F.sum("unexpected_count").cast("bigint").alias("unexpected_count"))
        .withColumn(
            "unexpected_percent",
            F.when(F.col("element_count") > 0,
                   F.col("unexpected_count") / F.col("element_count") * 100.0)
            .otherwise(F.lit(0.0)))
        .orderBy("run_ts", "run_id", "rule_name", "expectation_type")
    )
