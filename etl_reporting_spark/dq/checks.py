"""Data-quality check vocabulary.

Re-expresses the reference's two check layers as engine functions:
- the parameterized framework's check types
  (tools/test_framework_helper.py:414-478: UNIQUE_CHECK,
  COMBINATION_COLUMN_UNIQUE_CHECK, ORPHAN_CHECK, NOT_NULL_CHECK,
  DEFAULT_VALUE_CHECK, NEGATIVE_VALUE_CHECK, ZERO_VALUE_CHECK)
- the golden-rule suite's statistical/freshness patterns
  (sql/*/test_data_quality.sql; DMF catalog
  sql/DMF_IMPLEMENTATION_GUIDE.md:100-110, 314-407)

Contract (same as the reference): each check returns the FAILURE rows
— empty result ⇒ PASS. ``evaluate`` wraps any check into the
reference's verdict row: TEST_ID, STATUS, FAILED_ROWS,
BUSINESS_IMPACT (test_data_quality.sql emits exactly this shape).

Every check is a single aggregate or anti-join — one shuffle, no
driver-side iteration — so the suite parallelizes across tables and
survives fact-table scale.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    test_id: str
    status: str  # PASS / FAIL / WARNING
    failed_rows: int
    business_impact: str


def unique_check(df: DataFrame, column: str) -> DataFrame:
    """Duplicate values of a single key column (UNIQUE_CHECK).
    TRIM-normalized as the reference's generated tests are
    (tools/sql_test_case_generator.py:133-137)."""
    key = F.trim(F.col(column).cast("string")).alias("key_value")
    return (
        df.select(key)
        .groupBy("key_value")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def combination_unique_check(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Duplicate composite keys (COMBINATION_COLUMN_UNIQUE_CHECK)."""
    return (
        df.groupBy(*columns)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def orphan_check(
    child: DataFrame, parent: DataFrame, child_col: str, parent_col: str | None = None
) -> DataFrame:
    """Child keys with no parent (ORPHAN_CHECK / NOT EXISTS,
    test_data_quality.sql:169-191): left-anti on trimmed keys."""
    parent_col = parent_col or child_col
    p = parent.select(F.trim(F.col(parent_col).cast("string")).alias("__k")).distinct()
    return (
        child.withColumn("__k", F.trim(F.col(child_col).cast("string")))
        .join(p, "__k", "left_anti")
        .drop("__k")
    )


def not_null_check(df: DataFrame, column: str) -> DataFrame:
    """NULL or empty-string values (NOT_NULL_CHECK;
    test_data_quality.sql:17-49)."""
    c = F.col(column)
    return df.filter(c.isNull() | (c.cast("string") == ""))


def default_value_check(df: DataFrame, column: str, default_value) -> DataFrame:
    """Rows still carrying a default/sentinel value
    (DEFAULT_VALUE_CHECK)."""
    return df.filter(F.col(column) == F.lit(default_value))


def negative_value_check(df: DataFrame, column: str) -> DataFrame:
    return df.filter(F.col(column) < 0)


def zero_value_check(df: DataFrame, column: str) -> DataFrame:
    return df.filter(F.col(column) == 0)


def row_count_check(df: DataFrame, min_rows: int = 1, max_rows: int | None = None) -> DataFrame:
    """Row-count reasonability (test_data_quality.sql:198-244): emits
    one failure row when the count is outside [min, max]."""
    cnt = df.agg(F.count(F.lit(1)).alias("row_count"))
    cond = F.col("row_count") < min_rows
    if max_rows is not None:
        cond = cond | (F.col("row_count") > max_rows)
    return cnt.filter(cond)


def freshness_check(df: DataFrame, ts_col: str, max_age_hours: float, now=None) -> DataFrame:
    """FRESHNESS DMF: fail when max(ts) is older than the allowance.
    ``now`` injectable for determinism."""
    now_expr = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    latest = df.agg(F.max(F.col(ts_col)).alias("latest_ts"))
    age_hours = (now_expr.cast("double") - F.col("latest_ts").cast("double")) / 3600.0
    return latest.withColumn("age_hours", age_hours).filter(
        F.col("age_hours") > F.lit(max_age_hours)
    )


def outlier_check(df: DataFrame, column: str, sigmas: float = 3.0) -> DataFrame:
    """Statistical outliers vs whole-table stats
    (test_data_quality.sql:283-300) — agg + broadcast, not an empty
    OVER() window (single-partition at scale)."""
    dec = F.col(column).cast("decimal(18,4)")
    stats = df.agg(
        F.sum(dec).cast("double").alias("__s1"),
        F.sum(dec * dec).cast("double").alias("__s2"),
        F.count(F.col(column)).cast("double").alias("__n"),
    )
    thr = F.col("__s1") / F.col("__n") + F.lit(float(sigmas)) * F.sqrt(
        (F.col("__s2") - F.col("__s1") * F.col("__s1") / F.col("__n")) / (F.col("__n") - 1.0)
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .filter(F.col(column) > thr)
        .drop("__s1", "__s2", "__n")
    )


def fused_row_checks(df: DataFrame, conditions: "dict[str, Column]") -> DataFrame:
    """Many row-level checks in ONE scan of the table: each check is a
    conditional COUNT in a single aggregate, unpivoted to the verdict
    shape (test_id, status, failed_rows) with ``stack``. At 100 TB the
    battery's cost is scans, not arithmetic — every row-predicate check
    against the same table belongs in one pass, not one scan each."""
    names = list(conditions)
    aggs = [
        F.count(F.when(conditions[tid], F.lit(1))).alias(f"__c{i}")
        for i, tid in enumerate(names)
    ]
    pairs = ", ".join(f"'{tid}', __c{i}" for i, tid in enumerate(names))
    return (
        df.agg(*aggs)
        .select(F.expr(f"stack({len(names)}, {pairs}) AS (test_id, failed_rows)"))
        .select(
            "test_id",
            F.when(F.col("failed_rows") == 0, "PASS").otherwise("FAIL").alias("status"),
            "failed_rows",
        )
    )


def evaluate(
    test_id: str,
    failures: DataFrame,
    business_impact: str = "",
    warn_only: bool = False,
) -> CheckResult:
    """Collapse a failure DataFrame into the reference's verdict row."""
    n = failures.count()
    status = "PASS" if n == 0 else ("WARNING" if warn_only else "FAIL")
    return CheckResult(test_id=test_id, status=status, failed_rows=n, business_impact=business_impact)


def with_sample_failures(failures: DataFrame, n: int = 5) -> DataFrame:
    """Attach an OBJECT_CONSTRUCT-style diagnostic payload: the first
    ``n`` failing rows serialized as JSON (test_data_quality.sql
    :207-211, 288-294 builds SAMPLE_FAILURES this way). limit(n)
    before the JSON projection keeps the collected payload bounded."""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in failures.columns]
    return failures.limit(n).select(F.to_json(F.struct(*cols)).alias("sample_failure"))


@dataclass
class Expectation:
    """DMF expectation (F4, setup_dmf_data_quality.sql:141-148 /
    DMF_IMPLEMENTATION_GUIDE.md:220-249): a pass/fail rule attached to
    a scalar metric — EXPECT VALUE = 0, >= 0, <= n."""

    metric_name: str
    operator: str  # '=', '!=', '<', '<=', '>', '>='
    threshold: float

    _OPS = {
        "=": lambda v, t: v == t,
        "!=": lambda v, t: v != t,
        "<": lambda v, t: v < t,
        "<=": lambda v, t: v <= t,
        ">": lambda v, t: v > t,
        ">=": lambda v, t: v >= t,
    }

    def check(self, value: float) -> CheckResult:
        ok = self._OPS[self.operator](value, self.threshold)
        return CheckResult(
            test_id=self.metric_name,
            status="PASS" if ok else "FAIL",
            failed_rows=0 if ok else 1,
            business_impact=f"EXPECT VALUE {self.operator} {self.threshold}, got {value}",
        )


def drift_check(
    current: DataFrame,
    baseline: DataFrame,
    category_col: str,
    max_tvd: float = 0.1,
) -> DataFrame:
    """Distribution-drift check between two periods/loads: per
    category both shares and the absolute delta, plus the total
    variation distance ``TVD = 0.5·Σ|p−q|`` repeated on every row
    with the verdict. TVD rather than PSI/KL: pure arithmetic on
    exact counts (categories absent from one side contribute their
    full share) — no libm logs, no binning choices, and the same
    number in any engine. TVD ∈ [0,1]; alerting at 0.1 ≈ "10% of
    rows changed category".

    Two map-side-combinable counts over category-cardinality keys, a
    full-outer join on category, one ordered fold for the TVD (sum
    of doubles in category order — reproducible), broadcast back.
    """
    cur = current.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    base = baseline.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_base")
    )
    return drift_check_from_counts(cur, base, max_tvd=max_tvd)


def drift_check_from_counts(
    cur_counts: DataFrame,
    base_counts: DataFrame,
    max_tvd: float = 0.1,
) -> DataFrame:
    """The counts-level core of :func:`drift_check`, for callers that
    already hold per-category counts — a persisted baseline snapshot,
    a streaming micro-batch's aggregate (``streaming_drift_screen``).
    Inputs: (category, n_cur) and (category, n_base). Same output,
    same deterministic TVD arithmetic."""
    joined = cur_counts.join(base_counts, "category", "full_outer").select(
        "category",
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        F.coalesce(F.col("n_base"), F.lit(0)).alias("n_base"),
    )
    totals = joined.agg(
        F.sum("n_cur").alias("t_cur"), F.sum("n_base").alias("t_base")
    )
    shared = joined.crossJoin(F.broadcast(totals)).select(
        "category",
        "n_cur",
        "n_base",
        (F.col("n_cur").cast("double") / F.col("t_cur").cast("double")).alias("share_cur"),
        (F.col("n_base").cast("double") / F.col("t_base").cast("double")).alias(
            "share_base"
        ),
    )
    shared = shared.withColumn(
        "abs_delta", F.abs(F.col("share_cur") - F.col("share_base"))
    )
    tvd = shared.agg(
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("category", "abs_delta"))),
                F.lit(0.0),
                lambda acc, s: acc + s["abs_delta"],
            )
            / F.lit(2.0)
        ).alias("tvd")
    )
    return shared.crossJoin(F.broadcast(tvd)).select(
        "category",
        "n_cur",
        "n_base",
        "share_cur",
        "share_base",
        "abs_delta",
        "tvd",
        (F.col("tvd") <= F.lit(float(max_tvd))).alias("passed"),
    )


def drift_check_numeric(
    current: DataFrame,
    baseline: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    max_tvd: float = 0.1,
) -> DataFrame:
    """Numeric twin of :func:`drift_check`: values bucketed into
    ``n_bins`` FIXED-WIDTH bins over the half-open [lo, hi) (explicit range, not
    data-derived — a drifting max must not silently re-stretch the
    bins it is supposed to trip), out-of-range and NULL values land
    in guard bins (-1 below / n_bins above / n_bins+1 null) so drift
    INTO the tails is visible rather than clamped away. Same TVD
    verdict, same deterministic arithmetic. Bin ids are plain integer
    math on doubles — identical in any engine."""
    span = float(hi) - float(lo)
    if span <= 0 or n_bins <= 0:
        raise ValueError(
            f"need hi > lo and n_bins > 0 (got lo={lo}, hi={hi}, n_bins={n_bins})"
        )

    def binned(df: DataFrame) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = F.floor((v - F.lit(float(lo))) / F.lit(span) * F.lit(n_bins)).cast("int")
        return df.select(
            F.when(v.isNull(), F.lit(n_bins + 1))
            .when(b < 0, F.lit(-1))
            .when(b >= n_bins, F.lit(n_bins))
            .otherwise(b)
            .cast("string")
            .alias("__bin")
        )

    return drift_check(binned(current), binned(baseline), "__bin", max_tvd=max_tvd)
