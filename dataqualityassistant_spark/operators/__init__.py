from dataqualityassistant_spark.operators.compiler import (
    CompiledExpectation,
    compile_expectation,
    register_expectation,
    REFERENCE_TYPES,
)
from dataqualityassistant_spark.operators.engine import SuiteEngine, run_suite

__all__ = [
    "CompiledExpectation",
    "compile_expectation",
    "register_expectation",
    "REFERENCE_TYPES",
    "SuiteEngine",
    "run_suite",
]
