"""MERGE upsert (J10/J11) as a join-based rewrite with mutation metrics.

The reference builds a Snowflake MERGE with WHEN MATCHED UPDATE /
WHEN NOT MATCHED INSERT / WHEN NOT MATCHED BY SOURCE DELETE branches
and parses inserted/updated/deleted counts from the result
(connector/snowpark_connector.py:607-1004). Plain Spark-over-Parquet
has no MERGE DML (Delta Lake would give it verbatim; this container
has no Delta), so the engine computes the post-merge state with one
full-outer join and derives the same metrics — semantics-equivalent,
and each branch condition is an arbitrary Column predicate just like
the reference's optional AND clauses.

Scale notes: one shuffle on the merge keys (or a broadcast if the
source is small — AQE decides); metrics come from a single aggregate
over the join result, not from driver-side row loops.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MergeResult:
    """Mirrors the reference's UpsertResult metrics
    (models/custom_models.py:158-209).

    Metrics are LAZY: the action-count aggregate (one conditional-count
    pass over the classified join) runs on first access of any
    ``rows_*`` property, not at merge time — a caller that only writes
    ``df`` pays exactly one pass over the join, a caller that audits
    the merge pays one more against the persisted join. All four
    counts come from the same single aggregate."""

    def __init__(self, df: DataFrame, classified: DataFrame) -> None:
        self.df = df
        self._cached: DataFrame | None = classified
        self._classified = classified
        self._counts: dict[str, int] | None = None

    def _metrics(self) -> dict[str, int]:
        if self._counts is None:
            row = self._classified.agg(
                *[
                    F.count(F.when(F.col("__action") == a, 1)).alias(a)
                    for a in ("U", "I", "D", "M", "K", "X")
                ]
            ).collect()[0]
            self._counts = {a: row[a] for a in ("U", "I", "D", "M", "K", "X")}
        return self._counts

    @property
    def rows_inserted(self) -> int:
        return self._metrics()["I"]

    @property
    def rows_updated(self) -> int:
        return self._metrics()["U"]

    @property
    def rows_deleted(self) -> int:
        return self._metrics()["D"]

    @property
    def rows_unchanged(self) -> int:
        m = self._metrics()
        return m["M"] + m["K"]

    def unpersist(self) -> None:
        """Release the cached join once ``df`` has been materialized
        (written / collected). Safe to call more than once."""
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None


class NonDeterministicMergeError(ValueError):
    """Raised when source rows duplicate a merge key — the same
    condition Snowflake reports as a nondeterministic MERGE instead of
    silently fanning the target row out."""


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    insert_cols: Sequence[str] | None = None,
    matched_condition: Column | None = None,
    not_matched_condition: Column | None = None,
    delete_not_matched_by_source: bool = False,
    delete_condition: Column | None = None,
    validate_source_unique: bool = True,
) -> MergeResult:
    """Join-based MERGE. Column lists default to every non-key source
    column, the same auto-derivation the reference performs
    (connector:838-852).

    Branch semantics (same as Snowflake/Delta):
    - matched & matched_condition        → UPDATE listed columns
    - not matched (source-only) & cond   → INSERT
    - not matched by source (target-only) & delete flags → DELETE
    - everything else                    → carry target row unchanged

    Rows are classified by explicit presence markers, not key
    nullness, so a target row whose merge key is NULL is still
    "not matched by source" (kept, or deleted under the delete
    branch) — never silently dropped.

    ``validate_source_unique`` (default on) fails fast with
    :class:`NonDeterministicMergeError` when the source repeats a
    merge key — Snowflake's nondeterministic-MERGE error. The check
    is one map-side-combined aggregate over the source (the small
    delta in a typical merge); pass False to skip it when uniqueness
    is guaranteed upstream.

    The classified join is persisted so the (lazy) metrics aggregate
    and the returned ``df`` share one computation; call
    ``MergeResult.unpersist()`` after materializing the output.
    """
    keys = list(keys)
    non_key_source = [c for c in source.columns if c not in keys]
    update_cols = list(update_cols) if update_cols is not None else non_key_source
    insert_cols = list(insert_cols) if insert_cols is not None else non_key_source

    if validate_source_unique:
        dup = source.groupBy(*keys).count().filter(F.col("count") > 1)
        dup_row = dup.select(*keys).limit(1).collect()
        if dup_row:
            raise NonDeterministicMergeError(
                f"source has duplicate merge key {dup_row[0].asDict()}; "
                "dedup the source or pass validate_source_unique=False"
            )

    t = target.select(
        F.lit(1).alias("__t_present"),
        *[F.col(k).alias(f"__tk_{k}") for k in keys],
        *[F.col(c).alias(f"__t_{c}") for c in target.columns if c not in keys],
    )
    s = source.select(
        F.lit(1).alias("__s_present"),
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in non_key_source],
    )
    cond = None
    for k in keys:
        c = F.col(f"__tk_{k}") == F.col(f"__sk_{k}")
        cond = c if cond is None else cond & c
    j = t.join(s, on=cond, how="full_outer")

    has_target = F.col("__t_present").isNotNull()
    has_source = F.col("__s_present").isNotNull()

    matched = has_target & has_source
    if matched_condition is not None:
        matched_upd = matched & matched_condition
    else:
        matched_upd = matched
    insert_branch = has_source & ~has_target
    if not_matched_condition is not None:
        insert_branch = insert_branch & not_matched_condition
    delete_branch = F.lit(False)
    if delete_not_matched_by_source:
        delete_branch = has_target & ~has_source
        if delete_condition is not None:
            delete_branch = delete_branch & delete_condition

    action = (
        F.when(matched_upd, F.lit("U"))
        .when(insert_branch, F.lit("I"))
        .when(delete_branch, F.lit("D"))
        .when(matched, F.lit("M"))  # matched but condition false → keep
        .when(has_target, F.lit("K"))  # target-only, no delete → keep
        .otherwise(F.lit("X"))  # source-only, insert condition false → drop
    )
    j = j.withColumn("__action", action)
    j.persist()  # metrics aggregate + returned df share one join computation

    target_non_key = [c for c in target.columns if c not in keys]
    out_cols: list[Column] = []
    for k in keys:
        out_cols.append(
            F.when(F.col("__action") == "I", F.col(f"__sk_{k}"))
            .otherwise(F.col(f"__tk_{k}"))
            .alias(k)
        )
    for c in target_non_key:
        tcol = F.col(f"__t_{c}")
        scol = F.col(f"__s_{c}") if c in non_key_source else F.lit(None)
        updated = scol if c in update_cols else tcol
        inserted = scol if c in insert_cols else F.lit(None)
        out_cols.append(
            F.when(F.col("__action") == "U", updated)
            .when(F.col("__action") == "I", inserted)
            .otherwise(tcol)
            .alias(c)
        )

    merged = j.filter(F.col("__action").isin("U", "I", "M", "K")).select(*out_cols)
    return MergeResult(df=merged, classified=j)


def source_target_count_difference(source: DataFrame, target: DataFrame) -> int:
    """Custom DMF ``source_target_count_difference`` (F2,
    setup_dmf_data_quality.sql:109-119): ABS(COUNT(source)−COUNT(target))."""
    return abs(source.count() - target.count())


def count_difference_frame(source: DataFrame, target: DataFrame) -> DataFrame:
    """Engine-side twin of ``source_target_count_difference``: one row
    (src_rows, tgt_rows, count_difference) built from two 1-row
    aggregates cross-joined — stays lazy/distributed, so it composes
    into larger plans instead of forcing two driver round-trips."""
    s = source.agg(F.count(F.lit(1)).alias("src_rows"))
    t = target.agg(F.count(F.lit(1)).alias("tgt_rows"))
    return s.crossJoin(F.broadcast(t)).select(
        "src_rows",
        "tgt_rows",
        F.abs(F.col("src_rows") - F.col("tgt_rows")).alias("count_difference"),
    )
