from etl_reporting_spark.operators.cdc import (
    dedup_latest,
    point_in_time,
    scd2_intervals,
    asof_join,
    effective_at,
    interval_join,
)
from etl_reporting_spark.operators.relational import (
    select_exclude,
    anti_join_not_in,
    union_aligned,
    top_k,
    with_scalar,
)
from etl_reporting_spark.operators.aggregates import (
    grouped_report,
    rate_with_guard,
    outlier_filter,
    duplicate_keys,
)
from etl_reporting_spark.operators.merge import merge_upsert, MergeResult

__all__ = [
    "dedup_latest",
    "point_in_time",
    "scd2_intervals",
    "asof_join",
    "effective_at",
    "interval_join",
    "select_exclude",
    "anti_join_not_in",
    "union_aligned",
    "top_k",
    "with_scalar",
    "grouped_report",
    "rate_with_guard",
    "outlier_filter",
    "duplicate_keys",
    "merge_upsert",
    "MergeResult",
]
