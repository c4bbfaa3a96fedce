from etl_reporting_spark.datafeeds.writers import (
    grouped_report_frame,
    write_csv,
    write_grouped_report_csv,
    ExecutionLog,
)

__all__ = [
    "grouped_report_frame",
    "write_csv",
    "write_grouped_report_csv",
    "ExecutionLog",
]
