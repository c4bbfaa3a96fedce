"""Aggregation layer: DQ-style aggregates, report rollups, outliers.

Covers SURVEY.md §2.4. The report subtotal/grand-total shape (A7,
datafeeds/common/claims_reports.py:189-258) is re-expressed as a
single ``rollup`` — one shuffle produces detail rows, per-group
subtotals, and the grand total, instead of the reference's
three pandas passes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: Sequence[str], threshold: int = 1) -> DataFrame:
    """GROUP BY keys HAVING COUNT(*) > threshold — duplicate-PK /
    excessive-duplication detection (A5, test_data_quality.sql:62-86)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > threshold)
    )


def rate_with_guard(numerator: Column, denominator: Column, scale: float = 100.0) -> Column:
    """``SUM(flag)*100.0 / NULLIF(COUNT(*),0)`` derived rate (A8,
    test_data_quality.sql:325) — NULL, not error, on empty groups."""
    return numerator * F.lit(scale) / F.nullif(denominator, F.lit(0))


def grouped_report(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    total_label: str = "Grand Total",
    subtotal_suffix: str = " Total",
) -> DataFrame:
    """Report rollup: per-group sums + grand total in one pass (A7).

    The reference computes group subtotals and a grand-total row
    client-side in pandas (claims_reports.py:189-258); here a single
    ``rollup(...).agg(...)`` produces every level with one shuffle and
    map-side partial aggregation. Labels mimic the worksheet rows:
    NULL group keys from the rollup are replaced by "<val> Total" /
    "Grand Total" markers, and ``grouping_id`` orders totals after
    their group.
    """
    aggs = [F.sum(F.col(c)).alias(f"sum_{c}") for c in sum_cols]
    rolled = df.rollup(*group_cols).agg(*aggs, F.grouping_id().alias("__level"))
    labeled = rolled
    for i, g in enumerate(group_cols):
        # A level where this key is aggregated away (grouping bit set) gets
        # a label derived from the previous key (or the grand-total label).
        bit = 1 << (len(group_cols) - 1 - i)
        prev = F.col(group_cols[i - 1]) if i > 0 else None
        label = (
            F.concat(prev.cast("string"), F.lit(subtotal_suffix))
            if prev is not None
            else F.lit(total_label)
        )
        labeled = labeled.withColumn(
            g,
            F.when(F.col("__level").bitwiseAND(F.lit(bit)) != 0, label).otherwise(
                F.col(g).cast("string")
            ),
        )
    return labeled


def derived_ratio(sum_a: str, sum_b: str, name: str) -> Column:
    """Post-aggregation ratio, e.g. Avg Paid Per Claimant =
    sum(Amount)/sum(Claimants) (claims_reports.py:233-258)."""
    return (F.col(sum_a) / F.nullif(F.col(sum_b), F.lit(0))).alias(name)


def outlier_filter(
    df: DataFrame, value_col: str, sigmas: float = 3.0
) -> DataFrame:
    """Rows where value > AVG + k·STDDEV over the whole table (A9,
    test_data_quality.sql:300).

    The naive form is an empty-OVER window — a single-partition
    bottleneck at scale. Implemented instead as a 1-row aggregate
    broadcast back onto the table: two narrow passes, no global sort,
    no single-task stage.
    """
    stats = df.agg(
        F.avg(value_col).alias("__mu"), F.stddev(value_col).alias("__sigma")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .filter(F.col(value_col) > F.col("__mu") + F.lit(sigmas) * F.col("__sigma"))
        .drop("__mu", "__sigma")
    )


def column_profile(df: DataFrame, column: str, freshness_col: str | None = None) -> DataFrame:
    """System-DMF-style per-column metrics in one aggregate pass:
    NULL_COUNT, ROW_COUNT, UNIQUE_COUNT, MIN, MAX, AVG, STDDEV
    (sql/DMF_IMPLEMENTATION_GUIDE.md:100-110)."""
    c = F.col(column)
    aggs = [
        F.count(F.lit(1)).alias("row_count"),
        F.count(F.when(c.isNull(), 1)).alias("null_count"),
        F.countDistinct(c).alias("unique_count"),
        F.min(c).alias("min_value"),
        F.max(c).alias("max_value"),
    ]
    if freshness_col:
        aggs.append(F.max(F.col(freshness_col)).alias("latest_ts"))
    return df.agg(*aggs)


def partial_aggregate(
    df: DataFrame, keys: Sequence[str], value_col: str, scale: int = 4
) -> DataFrame:
    """Mergeable partial aggregate — the building block of
    incremental rollup maintenance (the lakehouse materialized-view
    pattern: each day/batch/partition aggregates ALONE, and the
    standing summary folds the partials instead of rescanning
    history). Per key: count, DECIMAL-exact sum and sum of squares
    (order-independent — a double sum would drift between the
    incremental and recompute paths), min, max.

    count/sum/sumsq/min/max are all associative+commutative, which is
    the entire contract: merge(partial(A), partial(B)) ≡
    partial(A ∪ B), proven against the full-recompute oracle by the
    a15 gate."""
    v = F.col(value_col).cast(f"decimal(18,{scale})")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("p_cnt"),
        F.sum(v).alias("p_sum"),
        F.min(v).alias("p_min"),
        F.max(v).alias("p_max"),
        F.sum((v * v)).alias("p_sumsq"),
    )


def merge_partials(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold partial aggregates (a union of any number of
    ``partial_aggregate`` outputs — yesterday's summary is itself a
    partial) into one summary row per key. Cost ∝ number of partial
    rows (keys × batches), never the underlying fact rows — the
    point of the pattern at 100 TB, where the nightly delta is GBs
    but history is the lake."""
    return partials.groupBy(*keys).agg(
        F.sum("p_cnt").alias("p_cnt"),
        F.sum("p_sum").alias("p_sum"),
        F.min("p_min").alias("p_min"),
        F.max("p_max").alias("p_max"),
        F.sum("p_sumsq").alias("p_sumsq"),
    )


def finalize_stats(merged: DataFrame) -> DataFrame:
    """Derive the read-time statistics from merged partials: avg and
    sample stddev as FIXED-SHAPE double expressions over the exact
    decimal sums (identical in any engine given identical partials —
    the only doubles are the final few ops)."""
    n = F.col("p_cnt").cast("double")
    s = F.col("p_sum").cast("double")
    ss = F.col("p_sumsq").cast("double")
    # clamp: the sums are exact but their DOUBLE casts round, and for
    # large near-equal values the subtraction can land epsilon-negative
    # (Spark's own stddev clamps for the same reason)
    var = F.greatest((ss - s * s / n) / (n - F.lit(1.0)), F.lit(0.0))
    return merged.select(
        *[c for c in merged.columns if not c.startswith("p_")],
        F.col("p_cnt").alias("n_rows"),
        s.alias("sum_value"),
        F.col("p_min").cast("double").alias("min_value"),
        F.col("p_max").cast("double").alias("max_value"),
        (s / n).alias("avg_value"),
        F.when(F.col("p_cnt") > 1, F.sqrt(var)).alias("stddev_value"),
    )
