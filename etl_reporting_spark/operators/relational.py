"""Relational breadth: projections, predicates, joins, unions, top-k.

Covers SURVEY.md §2.2/2.3/2.6/2.7 items that are thin-but-semantic
wrappers over DataFrame primitives. Each function documents the
reference construct it re-expresses.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_exclude(df: DataFrame, *exclude: str) -> DataFrame:
    """``SELECT * EXCLUDE(col, …)`` negative projection
    (datafeeds/common/claims_reports.py:400). Column pruning still
    reaches the scan because drop() is a projection."""
    return df.drop(*exclude)


def anti_join_not_in(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str | None = None,
    normalize: bool = True,
    sql_not_in_semantics: bool = True,
) -> DataFrame:
    """``x NOT IN (SELECT y FROM r)`` (…detail.sql:142) as a left-anti
    join.

    SQL NOT IN returns *no rows* if the subquery yields any NULL; the
    reference pre-normalizes with TRIM and its data has no NULL keys,
    so the practical semantics are "anti-join on trimmed keys with
    null keys excluded" — which is what ``sql_not_in_semantics=False``
    gives. With ``True`` we keep faithful NOT IN behavior by filtering
    NULLs out of the right side first and dropping left NULLs (a NULL
    left key is never IN nor NOT IN).
    """
    right_col = right_col or left_col
    lk = F.trim(F.col(left_col)) if normalize else F.col(left_col)
    rk = F.trim(F.col(right_col)) if normalize else F.col(right_col)
    r = right.select(rk.alias("__k")).where(F.col("__k").isNotNull()).distinct()
    l = left.withColumn("__k", lk)
    if sql_not_in_semantics:
        l = l.where(F.col("__k").isNotNull())
    return l.join(r, on="__k", how="left_anti").drop("__k")


def union_aligned(dfs: Sequence[DataFrame], distinct: bool = False) -> DataFrame:
    """UNION [ALL] by column name across branches (U1/U2). The
    reference's UNION branches are supposed to be schema-aligned
    (…detail.sql:161 has an arity bug we do not reproduce); we resolve
    by name, the intended semantics."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.distinct() if distinct else out


def union_by_name_allow_missing(dfs: Sequence[DataFrame]) -> DataFrame:
    """PDF-table combine across differing schemas: union of columns,
    missing filled with NULL (datafeeds/pdf_table_extractor.py:450-509)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def top_k(df: DataFrame, order_by: Sequence[Column | str], k: int = 1) -> DataFrame:
    """ORDER BY … LIMIT k (report_period_config.sql:127-138;
    connector:585-601). Catalyst plans TakeOrderedAndProject — a
    per-partition top-k then a driver merge of k·partitions rows, not
    a global sort; safe at any scale for small k."""
    cols = [F.col(c).desc() if isinstance(c, str) else c for c in order_by]
    return df.orderBy(*cols).limit(k)


def with_scalar(df: DataFrame, scalar_df: DataFrame) -> DataFrame:
    """Comma cross join to a 1-row CTE (J7, setup_dmf…sql:65-66):
    attach scalar config columns to every row. Broadcast by
    construction — never a shuffle."""
    return df.crossJoin(F.broadcast(scalar_df))


def conditional_insert_missing(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Idempotent conditional insert (A10, report_period_config.sql:66-81):
    rows of ``source`` whose key is absent from ``target`` — append-ready."""
    return source.join(target.select(*keys).distinct(), on=list(keys), how="left_anti")


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys,
    compare_cols=None,
):
    """Row-level snapshot diff — the reconciliation view behind
    source-vs-target sign-off (reference's count-difference check,
    generalized to WHICH rows and WHICH columns): full-outer join on
    the business key, each row tagged added / removed / changed /
    unchanged with the list of changed columns.

    NULL-safe comparison (``eqNullSafe``: NULL→value and value→NULL
    both count as changes, NULL→NULL doesn't). One key-shuffle join;
    output is row-level — aggregate it (see the j12 gate) for the
    summary, or anti-filter 'unchanged' for a changes-only feed.

    At 100 TB: bucket both snapshots by the key (`skew.write_bucketed`)
    and the join is shuffle-free; the common case (daily snapshot vs
    yesterday) diffs partition-by-partition under date pruning.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c in set(new.columns) and c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, [f"__k_{k}" for k in keys], "full_outer")
    changed_cols = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[F.col(f"__k_{k}").alias(k) for k in keys],
        status.alias("diff_status"),
        F.when(
            F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(), changed_cols
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
