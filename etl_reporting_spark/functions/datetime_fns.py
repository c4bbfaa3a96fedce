"""Date/time function library (SURVEY.md §2.8 date family + F1/F3).

All pure Column expressions — JVM-side, whole-stage-codegen-friendly;
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def working_days_between(start: Column, end: Column) -> Column:
    """Business days (Mon–Fri) in [start, end], inclusive; NULL if
    either side is NULL; 0 if end < start.

    Re-expresses the referenced-but-external scalar UDF
    ``FM_WORKINGDAYSBETWEEN`` (…detail.sql:121) as a closed-form
    column expression — O(1) per row, no sequence materialization, no
    UDF serialization. Derivation: full weeks contribute 5 days;
    the ragged tail is counted via the day-of-week offsets.
    """
    s = F.to_date(start)
    e = F.to_date(end)
    # Monday=0 … Sunday=6
    d0 = (F.dayofweek(s) + 5) % 7
    n = F.datediff(e, s) + 1
    full_weeks = F.floor(n / 7)
    rem = n % 7
    # Tail dows are d0, d0+1, …, d0+rem-1 (mod 7). Workdays before the
    # weekend: min(rem, 5-d0) clamped at 0; workdays that wrap past
    # Sunday restart at Monday: max(0, d0+rem-7) clamped at 5.
    before_weekend = F.greatest(F.least(rem, F.lit(5) - d0), F.lit(0))
    wrapped = F.least(F.greatest(d0 + rem - 7, F.lit(0)), F.lit(5))
    out = (full_weeks * 5 + before_weekend + wrapped).cast("int")
    return (
        F.when(s.isNull() | e.isNull(), F.lit(None).cast("int"))
        .when(e < s, F.lit(0))
        .otherwise(out)
    )


def month_spine(
    spark: SparkSession, start_year: int, end_year: int, label: str | None = None
) -> DataFrame:
    """Set-based re-expression of the ``generate_monthly_periods``
    stored procedure's WHILE loop (F3, report_period_config.sql:39-91):
    one row per month with start/end bounds, via sequence+explode —
    distributed, idempotent, no procedural loop."""
    df = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(f"{start_year}-01-01").cast("date"),
                F.lit(f"{end_year}-12-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("period_start_dt")
    ).select(
        F.col("period_start_dt"),
        F.last_day(F.col("period_start_dt")).alias("period_end_dt"),
        F.year(F.col("period_start_dt")).alias("period_year"),
        F.month(F.col("period_start_dt")).alias("period_month"),
    )
    if label is not None:
        df = df.withColumn("carrier_name", F.lit(label))
    return df


def period_frequencies(date_col: str) -> dict[str, Column]:
    """The 6-frequency period derivations of the reference's period
    view (report_period_config.sql:149-188): truncation expressions
    keyed DAILY…YEARLY, composable into UNION ALL rollups (U2)."""
    c = F.col(date_col)
    return {
        "DAILY": F.date_trunc("DAY", c),
        "WEEKLY": F.date_trunc("WEEK", c),
        "MONTHLY": F.date_trunc("MONTH", c),
        "QUARTERLY": F.date_trunc("QUARTER", c),
        "SEMIANNUAL": F.make_date(
            F.year(c), F.when(F.month(c) <= 6, F.lit(1)).otherwise(F.lit(7)), F.lit(1)
        ).cast("timestamp"),
        "YEARLY": F.date_trunc("YEAR", c),
    }
