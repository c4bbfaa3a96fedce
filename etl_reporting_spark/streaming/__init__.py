from etl_reporting_spark.streaming.cdc_stream import (
    read_event_stream,
    dedup_within_watermark,
    windowed_event_counts,
    run_available_now_to_table,
    foreach_batch_upsert,
    stateful_running_totals,
)

__all__ = [
    "read_event_stream",
    "dedup_within_watermark",
    "windowed_event_counts",
    "run_available_now_to_table",
    "foreach_batch_upsert",
    "stateful_running_totals",
]
