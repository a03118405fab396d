"""dataqualityassistant_spark — a PySpark-native data-quality / web-text
quality-filter engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference system DarshanaSahu/DataQualityAssistant
(a pandas/FastAPI rule-execution service): declarative expectation suites,
``mostly`` thresholds, per-rule metrics, failing-row samples, and suite
verdicts — recast as lazy, columnar DataFrame plans that Catalyst can
optimize, plus a web-text quality-filter pipeline (language-ID, n-gram
perplexity, Gopher/C4 heuristic rules, PII scrubbing) designed for
100 TB-scale Common-Crawl-style tables.

Layout
------
- ``rules``            rule / expectation data model + config normalization
- ``operators``        expectation compiler + single-pass suite engine
- ``functions``        text features, language-ID, perplexity, PII scrub
- ``plans``            end-to-end pipelines (quality filter, profiling)
- ``sources``          table readers/writers (parquet, metrics, lineage)
- ``streaming``        batch checkpointing / idempotent resume
- ``ops``              training-data ops: dedup, similarity, text stats,
                       multimodal plumbing
"""

from dataqualityassistant_spark.rules import (Rule, Expectation, normalize_rule_config,
                                              from_ge_suite, to_ge_suite)
from dataqualityassistant_spark.operators.engine import SuiteEngine, run_suite

__all__ = [
    "Rule",
    "from_ge_suite",
    "to_ge_suite",
    "Expectation",
    "normalize_rule_config",
    "SuiteEngine",
    "run_suite",
]

__version__ = "0.1.0"
