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
