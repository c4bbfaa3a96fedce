from etl_reporting_spark.dq.checks import (
    CheckResult,
    unique_check,
    combination_unique_check,
    orphan_check,
    not_null_check,
    default_value_check,
    negative_value_check,
    zero_value_check,
    freshness_check,
    row_count_check,
    outlier_check,
)
from etl_reporting_spark.dq.runner import DQRunner, TestCaseSpec, parse_test_blocks

__all__ = [
    "CheckResult",
    "unique_check",
    "combination_unique_check",
    "orphan_check",
    "not_null_check",
    "default_value_check",
    "negative_value_check",
    "zero_value_check",
    "freshness_check",
    "row_count_check",
    "outlier_check",
    "DQRunner",
    "TestCaseSpec",
    "parse_test_blocks",
]
