"""Cohort / funnel analytics — the reporting-engine staples a BI
user runs daily over the events fact.

Reference parity: the reference's report SQL builds period-bucketed
aggregates by hand (generate_monthly_periods + joins); these
operators are the reusable engine-side forms, designed for the
100 TB events table:

- ``cohort_retention`` — users bucketed by first-activity period,
  activity counted per (cohort, offset). Two key-shuffles (first
  touch, activity dedup) + one broadcast-back of cohort sizes;
  shuffle volume ∝ distinct (user, period), never raw events.
- ``funnel`` — strictly-ordered first-touch funnel over k stages:
  k conditional-min aggregations, each keyed on the user — every
  pass is map-side combinable and AQE-coalescible; output is k rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention matrix: (cohort_period, period_offset, n_active,
    cohort_size, retention). Offset 0 row is the cohort itself
    (retention 1.0 by construction)."""
    p = period.upper()
    per_day = {"WEEK": 7, "DAY": 1}[p]
    first = events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc(p, F.min(ts_col)).alias("cohort_ts")
    )
    activity = events.select(
        F.col(user_col).alias("u"), F.date_trunc(p, F.col(ts_col)).alias("active_ts")
    ).distinct()
    joined = activity.join(first, "u").select(
        "u",
        F.to_date("cohort_ts").alias("cohort_period"),
        (
            F.datediff(F.to_date("active_ts"), F.to_date("cohort_ts"))
            / F.lit(per_day)
        ).cast("int").alias("period_offset"),
    )
    counts = joined.groupBy("cohort_period", "period_offset").agg(
        F.countDistinct("u").alias("n_active")
    )
    sizes = first.groupBy(F.to_date("cohort_ts").alias("cohort_period")).agg(
        F.countDistinct("u").alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), "cohort_period").select(
        "cohort_period",
        "period_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention"
        ),
    )


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    cleanup: list | None = None,
) -> DataFrame:
    """Strictly-ordered first-touch funnel: a user converts stage i
    iff a stage-i event exists AT OR AFTER their stage-(i-1)
    conversion time (first-touch: the earliest qualifying event is
    the conversion). Returns one row per stage: (stage_idx, stage,
    n_users, conv_from_prev, conv_from_first)."""
    from pyspark.sql import Window

    assert len(stages) >= 2
    # each reached frame feeds BOTH its one-row count and the next
    # stage's join — persist (lazily) so the k-stage chain scans the
    # events fact k times, not O(k²); pass ``cleanup`` to release the
    # caches once the funnel is consumed (house pattern).
    def _persisted(df: DataFrame) -> DataFrame:
        df = df.persist()
        if cleanup is not None:
            cleanup.append(df)
        return df

    reached = _persisted(
        events.filter(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("stage_ts"))
    )
    per_stage = [
        reached.agg(
            F.lit(0).alias("stage_idx"),
            F.lit(stages[0]).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
    ]
    for i, stage in enumerate(stages[1:], start=1):
        reached = _persisted(
            events.filter(F.col(type_col) == stage)
            .select(F.col(user_col).alias("u"), F.col(ts_col).alias("t"))
            .join(reached.select("u", "stage_ts"), "u")
            .filter(F.col("t") >= F.col("stage_ts"))
            .groupBy("u")
            .agg(F.min("t").alias("stage_ts"))
        )
        per_stage.append(
            reached.agg(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = per_stage[0]
    for p_ in per_stage[1:]:
        out = out.unionByName(p_)
    # k one-row aggregates; the conversion window runs over k rows —
    # everything stays lazy, no driver-side counts.  The unpartitioned
    # Window.orderBy below is stage-count-sized by construction (one row per
    # funnel stage), so the single-partition WindowExec warning is benign.
    w = Window.orderBy("stage_idx").rowsBetween(Window.unboundedPreceding, 0)
    n = F.col("n_users").cast("double")
    prev = F.lag("n_users").over(Window.orderBy("stage_idx")).cast("double")
    first = F.first("n_users").over(w).cast("double")
    return out.select(
        "stage_idx",
        "stage",
        "n_users",
        F.when(F.col("stage_idx") == 0, F.lit(1.0))
        .otherwise(F.when(prev > 0, n / prev))
        .alias("conv_from_prev"),
        F.when(first > 0, n / first).alias("conv_from_first"),
    )
