"""Batch sessionization: gap-based session assignment over an event
stream, the batch twin of streaming session windows.

Two windows over one shuffle on the user key: a LAG marks session
boundaries (gap > threshold), a running SUM of boundary flags numbers
the sessions. Gap arithmetic runs on integer microseconds via
``timestamp_diff`` so results are bit-identical in any engine, and —
unlike ``unix_micros`` — it accepts both TIMESTAMP and TIMESTAMP_NTZ
(Spark 4.1 reads the driver's TIMESTAMP(NANOS) parquet as NTZ) and is
session-timezone-independent (an NTZ→TZ cast would shift wall time
across DST under a non-UTC session zone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign ``session_seq`` (1-based per user) to every event."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.col(ts_col)).over(w)
    boundary = F.when(
        prev.isNull()
        | (F.timestamp_diff("MICROSECOND", prev, F.col(ts_col)) > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("__boundary", boundary).withColumn(
        "session_seq", F.sum("__boundary").over(running)
    ).drop("__boundary")


def session_aggregates(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: bounds, event count, exact value sum,
    duration in seconds (integer-microsecond arithmetic)."""
    s = sessionize(events, user_col, ts_col, gap_minutes=gap_minutes)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("sum_value"),
            (
                F.timestamp_diff("MICROSECOND", F.min(ts_col), F.max(ts_col))
                / F.lit(1_000_000.0)
            ).alias("duration_sec"),
        )
    )
