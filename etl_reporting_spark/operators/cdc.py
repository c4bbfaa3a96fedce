"""CDC / Kimball core operators.

These five primitives compose into every report CTE in the reference
(SURVEY.md §2.5, §2.3):

- ``dedup_latest``   — W1, QUALIFY ROW_NUMBER()=1 "latest version per
  business key" (…detail.sql:32 et al., KIMBALL_CDC_DATA_DESIGN.md:239)
- ``point_in_time``  — P4, cutoff filter ``sequenced_at <= $END``
- ``scd2_intervals`` — W3, LEAD-derived effective/expiration chaining
  (…detail.sql:19-20)
- ``asof_join``      — J5, join each probe row to the version of the
  other table effective at the probe's timestamp
- ``effective_at`` / ``interval_join`` — P8/J6, COALESCE-sentinel
  interval containment (…detail.sql:78-80)

Scale notes: every operator here shuffles at most once, on the
business key. ``asof_join`` deliberately avoids the naive
range-join-then-rank plan (probe × full history blowup) in favor of a
union-merge: tag both inputs, union, single window over
(key, time) — O(n log n) within partitions, no cross product,
and skew handling is inherited from AQE because the union shuffles on
the same key a plain join would.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SENTINEL_HIGH_DATE = "9999-12-31"


def _cols(names: Sequence[str] | str) -> list[str]:
    return [names] if isinstance(names, str) else list(names)


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str] | str,
    order_by: Sequence[Column | str] | Column | str,
    keep_rank_column: bool = False,
) -> DataFrame:
    """Latest version per business key (CDC Subsystem 7).

    ``order_by`` columns are ranked DESCENDING by default when given as
    strings (matching ``ORDER BY sequenced_at DESC, sequence_no DESC``);
    pass Column expressions for custom direction.

    Catalyst turns the rn=1 filter into a WindowGroupLimit (Spark 3.5+)
    so each shuffle partition keeps only the per-key top row — this is
    the same "QUALIFY for efficient ROW_NUMBER filtering" practice the
    reference states as a design principle (setup_dmf_data_quality.sql:11).
    """
    ordering = [
        F.col(c).desc() if isinstance(c, str) else c
        for c in (_cols(order_by) if isinstance(order_by, (str, list, tuple)) else [order_by])
    ]
    w = Window.partitionBy(*_cols(keys)).orderBy(*ordering)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") == 1)
    return out if keep_rank_column else out.drop("__rn")


def point_in_time(df: DataFrame, cutoff_col: str, cutoff) -> DataFrame:
    """Point-in-time cutoff: only versions known as of ``cutoff``.

    Written as a plain filter so it pushes into the parquet scan
    (PushedFilters); on a date-partitioned fact this becomes partition
    pruning — the Spark shape of the reference's incremental
    high-water-mark reads (KIMBALL_CDC_DATA_DESIGN.md:328-342).
    """
    return df.filter(F.col(cutoff_col) <= F.lit(cutoff))


def snapshot_at(
    df: DataFrame,
    keys: Sequence[str] | str,
    sequence_cols: Sequence[str] | str,
    cutoff_col: str,
    cutoff,
) -> DataFrame:
    """cutoff + dedup-latest composed: the state of every business key
    as of an instant. This is the reference's universal CTE prologue
    (…detail.sql:26-33, setup_dmf_data_quality.sql:63-70)."""
    return dedup_latest(point_in_time(df, cutoff_col, cutoff), keys, _cols(sequence_cols))


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str] | str,
    effective_col: str,
    expiration_name: str = "row_expiration",
    current_flag_name: str | None = "current_row_indicator",
    close_previous: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Derive SCD2 effective/expiration intervals by LEAD-chaining.

    Each version's expiration = the next version's effective instant,
    defaulting to the 9999-12-31 sentinel for the open (current)
    version. ``close_previous`` adjusts the LEAD column before the
    sentinel coalesce — e.g. the reference's "next effective minus 1
    minute" (…detail.sql:19-20) is
    ``close_previous=lambda nxt: nxt - F.expr("INTERVAL 1 MINUTE")``
    — so callers never rebuild the window expression themselves.
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(F.col(effective_col).asc())
    nxt = F.lead(F.col(effective_col), 1).over(w)
    if close_previous is not None:
        nxt = close_previous(nxt)
    exp = F.coalesce(nxt, F.lit(SENTINEL_HIGH_DATE).cast(df.schema[effective_col].dataType))
    out = df.withColumn(expiration_name, exp)
    if current_flag_name:
        out = out.withColumn(
            current_flag_name,
            F.when(F.lead(F.col(effective_col), 1).over(w).isNull(), F.lit(1)).otherwise(F.lit(0)),
        )
    return out


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str] | str,
    effective_col: str,
    expiration_name: str = "row_expiration",
    current_flag_name: str | None = "current_row_indicator",
) -> DataFrame:
    """Incrementally apply a CDC change batch to an SCD2 dimension:
    keys untouched by the batch pass through as-is; keys present in
    the batch have their version chain rebuilt from (existing versions
    ∪ new versions) via ``scd2_intervals``. Result is identical to a
    full rebuild over the combined history — but the work is
    proportional to the CHANGED keys (a semi/anti-join split on the
    key plus one window over the affected slice), which is the only
    shape that survives a 100 TB dimension taking a 0.1% daily delta.

    ``dim`` must carry ``expiration_name`` (and the flag if named);
    ``changes`` carries the natural columns only — the chain columns
    are derived."""
    key_list = _cols(keys)
    affected_keys = changes.select(*key_list).distinct()
    untouched = dim.join(affected_keys, key_list, "left_anti")
    affected_versions = dim.join(affected_keys, key_list, "left_semi").drop(
        *[c for c in (expiration_name, current_flag_name) if c]
    )
    combined = affected_versions.unionByName(changes)
    rebuilt = scd2_intervals(
        combined, key_list, effective_col, expiration_name, current_flag_name
    )
    return untouched.unionByName(rebuilt)


def effective_at(
    df: DataFrame,
    as_of,
    effective_col: str,
    expiration_col: str,
    obsolete_col: str | None = None,
    inclusive_end: bool = False,
) -> DataFrame:
    """Rows whose [effective, expiration) interval contains ``as_of``,
    treating NULL expiration (and NULL obsolete) as the 9999-12-31
    sentinel — the COALESCE-sentinel predicate of …detail.sql:78-80."""
    as_of_lit = F.lit(as_of)
    exp = F.coalesce(F.col(expiration_col), F.lit(SENTINEL_HIGH_DATE).cast("date"))
    cond = (as_of_lit >= F.col(effective_col)) & (
        (as_of_lit <= exp) if inclusive_end else (as_of_lit < exp)
    )
    if obsolete_col is not None:
        obs = F.coalesce(F.col(obsolete_col), F.lit(SENTINEL_HIGH_DATE).cast("date"))
        cond = cond & (as_of_lit < obs)
    return df.filter(cond)


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str] | str,
    probe_time: str,
    build_time: str,
    build_cols: Sequence[str] | None = None,
    tie_break: Sequence[str] | None = None,
    tolerance: str | None = None,
    matched_time_col: str | None = None,
) -> DataFrame:
    """As-of join: each probe row gets the latest build row with
    ``build_time <= probe_time`` for the same key (left semantics —
    probe rows with no prior build row keep NULLs).

    Implementation is the scalable union-merge (no range-join cross
    product): tag the two inputs, union on the key, then a single
    ``last(..., ignorenulls)`` window ordered by event time carries the
    most recent build values forward onto each probe row. One shuffle
    on the key; skew is AQE's problem, not a Python loop's.

    ``tolerance`` (pandas ``merge_asof(tolerance=...)`` / kdb ``wj``
    parity) bounds staleness: a match older than the probe time by
    more than it is treated as NO match (build columns NULL). Pass a
    SQL expression string added to the matched time — an interval
    literal for timestamps (``"INTERVAL '2' DAY"``) or a number for
    numeric times — evaluated engine-side, so the plan shape is
    unchanged (the window already carries the matched ``build_time``;
    tolerance is one more projected predicate, not another join).
    ``matched_time_col`` exposes the matched build time (NULL outside
    tolerance) — the staleness measurement feeds data-freshness DQ.

    Reference composite: P4 cutoff + W1 dedup + equi-join
    (…detail.sql:26-33 + 75; KIMBALL_CDC_DATA_DESIGN.md:99-103).
    """
    keys = _cols(keys)
    if build_cols is None:
        build_cols = [c for c in build.columns if c not in keys and c != build_time]
    tie_break = list(tie_break or [])

    b = build.select(
        *[F.col(k) for k in keys],
        F.col(build_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__tb_{i}") for i, c in enumerate(tie_break)],
        *[F.col(c).alias(f"__b_{c}") for c in build_cols],
    )
    probe_payload = [c for c in probe.columns if c not in keys and c != probe_time]
    p = probe.select(
        *[F.col(k) for k in keys],
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(dict(b.dtypes)[f"__tb_{i}"]).alias(f"__tb_{i}")
            for i in range(len(tie_break))
        ],
        *[F.lit(None).cast(dict(b.dtypes)[f"__b_{c}"]).alias(f"__b_{c}") for c in build_cols],
        *[F.col(c).alias(f"__p_{c}") for c in probe_payload],
    )
    b = b.select(
        *keys, "__t", "__side",
        *[f"__tb_{i}" for i in range(len(tie_break))],
        *[f"__b_{c}" for c in build_cols],
        *[F.lit(None).cast(dict(p.dtypes)[f"__p_{c}"]).alias(f"__p_{c}") for c in probe_payload],
    )

    unioned = b.unionByName(p)
    # Build rows (side=0) sort before probe rows (side=1) at equal time →
    # "at or before" semantics; tie_break orders concurrent build rows so
    # the winner is the last in tie order (e.g. highest sequence_no).
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__t").asc(),
            F.col("__side").asc(),
            *[F.col(f"__tb_{i}").asc_nulls_last() for i in range(len(tie_break))],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *keys,
        "__t",
        "__side",
        F.last(
            F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True
        ).over(w).alias("__bt"),
        *[F.last(F.col(f"__b_{c}"), ignorenulls=True).over(w).alias(f"__b_{c}") for c in build_cols],
        *[F.col(f"__p_{c}") for c in probe_payload],
    )
    if tolerance is not None:
        within = F.col("__bt").isNotNull() & (
            F.col("__t") <= F.col("__bt") + F.expr(tolerance)
        )
    else:
        within = F.lit(True)
    matched = (
        [F.when(within, F.col("__bt")).alias(matched_time_col)]
        if matched_time_col
        else []
    )
    out = carried.filter(F.col("__side") == 1).select(
        *keys,
        F.col("__t").alias(probe_time),
        *[F.col(f"__p_{c}").alias(c) for c in probe_payload],
        *[F.when(within, F.col(f"__b_{c}")).alias(c) for c in build_cols],
        *matched,
    )
    return out


def interval_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str] | str,
    event_col: str,
    effective_col: str,
    expiration_col: str,
    how: str = "inner",
    inclusive_end: bool = True,
) -> DataFrame:
    """Late-arriving-fact binding (Kimball Subsystem 16): join each
    fact to the dimension version whose interval contains the fact's
    event time — ``event BETWEEN row_effective AND row_expiration``
    (KIMBALL_CDC_DATA_DESIGN.md:99-103). Equi-keys keep this a hash
    join with theta residual, not a cross product."""
    keys = _cols(keys)
    # Alias both sides: facts and dim often share lineage (both carved
    # from one CDC stream), and unaliased facts[k] == dim[k] can
    # resolve to a trivially-true self-comparison — losing the equi
    # key and degrading the hash join to a theta join.
    f = facts.alias("__f")
    d = dim.alias("__d")
    exp = F.coalesce(F.col(f"__d.{expiration_col}"), F.lit(SENTINEL_HIGH_DATE).cast("date"))
    evt = F.col(f"__f.{event_col}")
    cond_expr = F.col(f"__f.{keys[0]}") == F.col(f"__d.{keys[0]}")
    for k in keys[1:]:
        cond_expr = cond_expr & (F.col(f"__f.{k}") == F.col(f"__d.{k}"))
    upper = (evt <= exp) if inclusive_end else (evt < exp)
    cond_expr = cond_expr & (evt >= F.col(f"__d.{effective_col}")) & upper
    joined = f.join(d, on=cond_expr, how=how)
    return joined.select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__d.{c}") for c in dim.columns if c not in keys],
    )


def resample_forward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_minutes: int = 60,
) -> DataFrame:
    """Regularize an irregular series per key: generate the full
    time spine from each key's first to last observation at
    ``step_minutes`` resolution, then forward-fill the latest
    observation onto every slot — the gap-filling prelude to any
    period-over-period comparison on sparse data.

    NULL observations are DROPPED before slotting (a null reading is
    "no reading" to a forward fill — and engines disagree on whether
    null beats an earlier value in an arg-max, so keeping them would
    also be non-portable). Within-slot ties on the timestamp break
    on the value (max struct(t, v) — total, engine-agnostic).

    Plan shape: the spine is sequence+explode over per-key min/max
    (one aggregate — spine length is (range/step) per key, generated
    distributed, never on the driver); observations aggregate to
    per-slot LAST; the fill is one ``last(ignorenulls)`` running
    window per key.
    Two key-shuffles total, state bounded per key-partition.
    Epoch math via ``timestamp_diff`` (NTZ-safe, the sessionize
    convention — ``unix_timestamp`` rejects TIMESTAMP_NTZ).
    """
    if key_col in ("slot_ts", "observed") or value_col in ("slot_ts", "observed"):
        raise ValueError(
            "key/value column may not be named 'slot_ts' or 'observed' "
            "(reserved output columns)"
        )
    step_s = step_minutes * 60
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

    def to_slot(col):
        secs = F.timestamp_diff("SECOND", epoch, col.cast("timestamp_ntz"))
        return (F.floor(secs / step_s) * step_s).cast("long")

    slot = to_slot(F.col(ts_col))
    obs = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("k"), slot.alias("slot_s"),
            F.col(ts_col).alias("t"), F.col(value_col).alias("v"),
        )
        .groupBy("k", "slot_s")
        .agg(F.max(F.struct("t", "v"))["v"].alias("v"))
    )
    spine = (
        df.groupBy(F.col(key_col).alias("k"))
        .agg(
            to_slot(F.min(ts_col)).alias("lo"),
            to_slot(F.max(ts_col)).alias("hi"),
        )
        .select(
            "k",
            F.explode(F.sequence("lo", "hi", F.lit(step_s))).alias("slot_s"),
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy("slot_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(obs, ["k", "slot_s"], "left")
        .withColumn("filled", F.last("v", ignorenulls=True).over(w))
        .select(
            F.col("k").alias(key_col),
            F.timestamp_add("SECOND", F.col("slot_s"), epoch).alias("slot_ts"),
            F.col("v").alias("observed"),
            F.col("filled").alias(value_col),
        )
    )
