"""Incremental view maintenance (IVM) for joins.

The warehouse pattern behind "don't recompute the reporting join
nightly": with append-only deltas (the CDC landing case — updates
arrive as new versions and are resolved by dedup-latest downstream),
the classical IVM identity

    (A ∪ ΔA) ⋈ (B ∪ ΔB) = (A ⋈ B) ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

lets the standing join state absorb a day's delta with work
proportional to |Δ| · (join hit rate), never |A|·|B| (Blakeley et
al., SIGMOD 1986 — the original incremental view maintenance
result). The three delta terms each probe one full side with a
delta-sized side: at scale the delta side broadcasts (AQE decides),
and if the standing sides are bucketed on the join key
(``operators.skew.write_bucketed``) the probes are shuffle-free.

``a15_incremental_rollup`` proves increment ≡ recompute for
AGGREGATES; ``ivm_join_maintenance`` is its join twin — the gate
computes the maintained join's aggregate and the oracle recomputes
from scratch, so any missing/duplicated delta term breaks the hash.

Deletions/updates-in-place need signed counting or retraction rows
(the Differential Dataflow generalization) — out of scope here, as
this engine's CDC model resolves updates via versioned appends +
dedup-latest, not in-place mutation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def join_insert_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """The join's DELTA under append-only inserts: exactly the rows
    the refreshed join gains. ``how`` supports ``inner`` (the IVM
    identity above); outer variants need retraction handling (a
    formerly unmatched preserved row must be retracted when its first
    match arrives), which the versioned-append CDC model handles
    upstream instead."""
    if how != "inner":
        raise ValueError(
            "join_insert_delta maintains INNER joins; outer joins need "
            "retractions (a preserved null-padded row must be withdrawn "
            "when its first match arrives) — resolve via dedup-latest "
            "downstream instead"
        )
    on = [on] if isinstance(on, str) else list(on)
    return (
        delta_a.join(b_old, on=on, how="inner")
        .unionByName(a_old.join(delta_b, on=on, how="inner"))
        .unionByName(delta_a.join(delta_b, on=on, how="inner"))
    )


def ivm_join_refresh(
    old_join: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str] | str,
) -> DataFrame:
    """The refreshed standing join: old state + delta. The old state
    is READ, never recomputed — at 100 TB it's the parquet/WAP table
    the previous refresh committed, and this expression is what the
    nightly job writes back (typically through
    ``PartitionedWapTable.commit_partitions`` keyed by the delta's
    date partitions)."""
    return old_join.unionByName(
        join_insert_delta(a_old, delta_a, b_old, delta_b, on)
    )


def ivm_agg_delta(
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    weight_col: str = "__w",
) -> DataFrame:
    """Per-group partial state from a SIGNED delta (the counting
    algorithm: +1 rows are inserts, −1 rows are retractions — an
    update is retract-old + insert-new). Output: group columns,
    ``__cnt`` = Σw, and ``sum_<c>`` = Σ(w·c) per sum column — the
    mergeable partial that makes COUNT/SUM/AVG maintainable under
    deletion, which plain append-IVM is not. MIN/MAX are NOT
    maintainable this way (a retracted minimum needs the runner-up,
    i.e. a rescan) and are deliberately absent from this API —
    maintain them by recomputing the affected partitions instead."""
    from pyspark.sql import functions as F

    w = F.col(weight_col)
    return delta.groupBy(*group_cols).agg(
        F.sum(w).alias("__cnt"),
        *[F.sum(w * F.col(c)).alias(f"sum_{c}") for c in sum_cols],
    )


def ivm_agg_refresh(
    old_state: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    weight_col: str = "__w",
) -> DataFrame:
    """Refreshed aggregate state: combine the standing partials with
    the delta's partials (one delta-sized aggregate + one state-sized
    merge groupBy — never a rescan of history) and DROP groups whose
    count reaches zero, so a fully-retracted group disappears exactly
    as a recompute would make it. ``old_state`` has the
    ``ivm_agg_delta`` shape (the previous refresh's output, read from
    its committed table)."""
    from pyspark.sql import functions as F

    d = ivm_agg_delta(delta, group_cols, sum_cols, weight_col)
    return (
        old_state.unionByName(d)
        .groupBy(*group_cols)
        .agg(
            F.sum("__cnt").alias("__cnt"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
        .filter(F.col("__cnt") != 0)
    )


def cdf_signed_delta(changes: DataFrame, weight_col: str = "__w") -> DataFrame:
    """Convert a ``wap.table_changes`` feed into the signed-delta
    shape the aggregate IVM consumes: inserts and update POST-images
    weigh +1, deletes and update PRE-images −1 — an update thus
    retracts its old contribution and adds its new one, exactly the
    counting-algorithm encoding. The bridge that makes ANY WAP-backed
    table a source for incrementally-maintained views."""
    from pyspark.sql import functions as F

    return changes.withColumn(
        weight_col,
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1)),
    ).drop("_change_type")


def maintain_aggregate_view(
    source,
    view_path: str,
    keys: Sequence[str],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    to_version: int | None = None,
    view_storage=None,
) -> int | None:
    """Materialized aggregate maintained OFF THE CHANGE FEED — the
    end-to-end composition of the transactional layer and the IVM
    algebra: the view's commit record remembers the last source
    version it absorbed; each refresh diffs the source from there to
    its current tip (``table_changes`` — cost ∝ churned FILES, even
    for deletion-vector commits), converts the feed to signed deltas,
    merges them into the standing state (:func:`ivm_agg_refresh` —
    delta-sized work), and commits the new state atomically with the
    new cursor. Readers of the view always see a state consistent
    with SOME source version, never a half-applied refresh; a crashed
    refresh re-runs from the same cursor (the commit is the
    checkpoint).

    ``source`` is an open :class:`wap.WapTable` (either layout);
    ``view_path`` a WAP table path for the state (created on first
    refresh). Returns the view's new version, or None when the source
    hasn't moved. MIN/MAX stay out, as everywhere in the signed-
    counting API.

    ``to_version`` bounds one refresh to an explicit source version
    (default: the current tip) — the micro-batch primitive
    :func:`streaming.cdc_stream.stream_maintain_aggregate_view`
    drives to consume the change feed incrementally.

    ``view_storage`` is the view table's :class:`TableStorage`
    backend (default: the module-global factory over ``view_path``) —
    the same ``storage=`` seam ``create_wap_table`` takes, so an IVM
    view can live on an object store without monkeypatching the
    global factory."""
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.wap import WapTable, table_changes

    view = WapTable(source.spark, view_path, storage=view_storage)
    src_version = (
        to_version if to_version is not None else source.current_version()
    )
    last_rec = view.latest_record() or {}
    cursor = last_rec.get("source_version", 0)
    if cursor >= src_version:
        return None
    if cursor == 0:
        base_rows = source.read(version=src_version).withColumn("__w", F.lit(1))
        state = ivm_agg_delta(
            base_rows.select(*group_cols, *sum_cols, "__w"),
            group_cols,
            sum_cols,
        )
    else:
        changes = table_changes(
            source, keys, from_version=cursor, to_version=src_version
        )
        delta = cdf_signed_delta(changes).select(*group_cols, *sum_cols, "__w")
        old_state = view.read()
        state = ivm_agg_refresh(old_state, delta, group_cols, sum_cols)
    view.fs.prepare_root()
    return view.commit(
        state,
        operation="refresh",
        extra={"source_version": src_version},
    )


def ivm_agg_refresh_bucketed(
    old_state: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    weight_col: str = "__w",
) -> DataFrame:
    """State merge shaped for BUCKETED standing state (round-7
    verdict #7): same result as :func:`ivm_agg_refresh`, different
    plan. The union+groupBy form re-shuffles the ENTIRE standing
    state every refresh — union discards the state's partitioning
    even when the table is bucketed on the group keys. This form
    merges via a full-outer JOIN on the group keys instead: a state
    read from a table bucketed on ``group_cols``
    (``operators.skew.write_bucketed(state, ..., group_cols)``)
    satisfies the join's distribution requirement as-scanned, so the
    ONLY exchange is the delta's partial aggregate — per-refresh
    shuffle cost ∝ |Δ|, with zero post-read shuffle on the state side
    (plan-asserted in tests/test_incremental.py).

    Groups whose merged count reaches zero drop, exactly as in the
    union form. Write the merged result back bucketed the same way
    and the NEXT refresh inherits the property — the layout is the
    loop invariant."""
    from pyspark.sql import functions as F

    d = ivm_agg_delta(delta, group_cols, sum_cols, weight_col)
    measures = ["__cnt"] + [f"sum_{c}" for c in sum_cols]
    dd = d.select(
        *group_cols, *[F.col(c).alias(f"__d_{c}") for c in measures]
    )
    merged = old_state.join(dd, on=list(group_cols), how="full_outer")
    return merged.select(
        *group_cols,
        *[
            (
                F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in measures
        ],
    ).filter(F.col("__cnt") != 0)
