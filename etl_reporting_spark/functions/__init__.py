from etl_reporting_spark.functions.datetime_fns import (
    working_days_between,
    month_spine,
    period_frequencies,
)
from etl_reporting_spark.functions.text_fns import strip_domain_prefix

__all__ = [
    "working_days_between",
    "month_spine",
    "period_frequencies",
    "strip_domain_prefix",
]
