from dataqualityassistant_spark.plans.quality_filter import (
    QualityFilterPipeline,
    default_webtext_rules,
)

__all__ = ["QualityFilterPipeline", "default_webtext_rules"]
