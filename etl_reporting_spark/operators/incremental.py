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
