"""MERGE upsert (J10/J11): join-based rewrite + optional Delta backend.

The reference builds a Snowflake MERGE with WHEN MATCHED UPDATE /
WHEN NOT MATCHED INSERT / WHEN NOT MATCHED BY SOURCE DELETE branches
and parses inserted/updated/deleted counts from the result
(connector/snowpark_connector.py:607-1004). Plain Spark-over-Parquet
has no MERGE DML, so the default path computes the post-merge state
with one full-outer join and derives the same metrics —
semantics-equivalent, and each branch condition is an arbitrary
Column predicate just like the reference's optional AND clauses.

At production scale the reference's MERGE runs inside a transactional
warehouse; the Spark twin of that is Delta Lake (SURVEY §4).
``merge_upsert_delta`` (or ``merge_upsert(..., backend="delta")``)
delegates the same branch structure to ``DeltaTable.merge`` when
delta-spark is importable — ACID commit, concurrent-writer conflict
detection, and file-skipping on the merge keys come from the format;
metrics surface in the same shape from the commit's
``operationMetrics``. Environments without Delta keep the join
rewrite, which is oracle-verified (j10_merge_upsert).

``backend="wap"`` (round-5) is the EXECUTED transactional path for
Delta-less environments: the join rewrite computes the post-merge
state and ``operators.wap`` commits it write-audit-publish — snapshot
written to an immutable dir, re-read and row-counted against the
merge metrics before publish, published by an atomic create-if-absent
commit record. Crash at any step leaves readers on the previous
snapshot; concurrent writers race to one winner
(tests/test_wap.py).

Scale notes: one shuffle on the merge keys (or a broadcast if the
source is small — AQE decides); metrics come from a single aggregate
over the join result, not from driver-side row loops.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
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
    backend: str = "join",
    spark: SparkSession | None = None,
    target_table: str | None = None,
    partition_by: Sequence[str] | None = None,
    table_handle=None,
) -> "MergeResult | DeltaMergeResult":
    """Join-based MERGE. Column lists default to every non-key source
    column, the same auto-derivation the reference performs
    (connector:838-852).

    ``backend="delta"`` delegates to :func:`merge_upsert_delta` for an
    ACID MERGE against a Delta table (pass ``spark`` and
    ``target_table``; the ``target`` DataFrame argument is ignored —
    the table handle is authoritative, and branch conditions must use
    the ``t``/``s`` aliases). Requires delta-spark; raises ImportError
    with guidance otherwise, never a silent fallback.

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
    if backend == "delta":
        if not delta_available():
            raise ImportError(
                "merge_upsert(backend='delta') requires the delta-spark package "
                "and a Delta-configured SparkSession; install delta-spark or use "
                "the default join backend"
            )
        if spark is None or target_table is None:
            raise ValueError("backend='delta' requires spark= and target_table=")
        return merge_upsert_delta(
            spark,
            target_table,
            source,
            keys,
            update_cols=update_cols,
            insert_cols=insert_cols,
            matched_condition=matched_condition,
            not_matched_condition=not_matched_condition,
            delete_not_matched_by_source=delete_not_matched_by_source,
            delete_condition=delete_condition,
            validate_source_unique=validate_source_unique,
        )
    if backend == "wap":
        if spark is None or target_table is None:
            raise ValueError("backend='wap' requires spark= and target_table= (a path)")
        return merge_upsert_wap(
            spark,
            target_table,
            source,
            keys,
            update_cols=update_cols,
            insert_cols=insert_cols,
            matched_condition=matched_condition,
            not_matched_condition=not_matched_condition,
            delete_not_matched_by_source=delete_not_matched_by_source,
            delete_condition=delete_condition,
            validate_source_unique=validate_source_unique,
            partition_by=partition_by,
            table_handle=table_handle,
        )
    if backend != "join":
        raise ValueError(
            f"unknown merge backend {backend!r}: expected 'join', 'wap' or 'delta'"
        )

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


def delta_available() -> bool:
    """True when delta-spark is importable (the session must also be
    Delta-configured: spark.sql.extensions + catalog, as delta-spark's
    ``configure_spark_with_delta_pip`` sets up)."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class DeltaMergeResult:
    """MergeResult-shaped metrics from a Delta MERGE commit.

    inserted/updated/deleted come from the commit's
    ``operationMetrics`` (numTargetRowsInserted/Updated/Deleted) —
    transactionally exact, no extra pass. ``rows_unchanged`` is lazy
    arithmetic: post-merge row count − inserted − updated (deleted
    rows are gone), costing one count() on first access, mirroring the
    join backend's lazy metrics. ``df`` reads the committed table, so
    downstream consumers see the same relation shape either way."""

    def __init__(self, df: DataFrame, metrics: Mapping[str, str]) -> None:
        self.df = df
        self._m = {k: int(v) for k, v in metrics.items() if str(v).lstrip("-").isdigit()}
        self._post_count: int | None = None

    @property
    def rows_inserted(self) -> int:
        return self._m.get("numTargetRowsInserted", 0)

    @property
    def rows_updated(self) -> int:
        return self._m.get("numTargetRowsUpdated", 0)

    @property
    def rows_deleted(self) -> int:
        return self._m.get("numTargetRowsDeleted", 0)

    @property
    def rows_unchanged(self) -> int:
        if self._post_count is None:
            self._post_count = self.df.count()
        return self._post_count - self.rows_inserted - self.rows_updated

    def unpersist(self) -> None:
        """API parity with MergeResult — the Delta path caches nothing."""


def merge_upsert_delta(
    spark: SparkSession,
    target_table: str,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    insert_cols: Sequence[str] | None = None,
    matched_condition: Column | str | None = None,
    not_matched_condition: Column | str | None = None,
    delete_not_matched_by_source: bool = False,
    delete_condition: Column | str | None = None,
    validate_source_unique: bool = True,
) -> DeltaMergeResult:
    """MERGE into a Delta table — the transactional production path
    (reference semantics connector/snowpark_connector.py:993-1002;
    join-rewrite twin above for Delta-less environments).

    ``target_table`` is a metastore name, or a storage path when it
    contains "/". The target aliases as ``t`` and the source as ``s``;
    branch conditions (string or Column) reference those aliases,
    e.g. ``"t.amount <> s.amount"`` — unlike the join backend, whose
    conditions see the bare merged schema. Branch structure, column
    auto-derivation, and the source-uniqueness guard match the join
    backend exactly.
    """
    from delta.tables import DeltaTable

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

    if "/" in target_table:
        dt = DeltaTable.forPath(spark, target_table)
    else:
        dt = DeltaTable.forName(spark, target_table)

    on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    builder = dt.alias("t").merge(source.alias("s"), on)
    builder = builder.whenMatchedUpdate(
        condition=matched_condition, set={c: f"s.{c}" for c in update_cols}
    )
    insert_values = {k: f"s.{k}" for k in keys}
    insert_values.update({c: f"s.{c}" for c in insert_cols})
    builder = builder.whenNotMatchedInsert(
        condition=not_matched_condition, values=insert_values
    )
    if delete_not_matched_by_source:
        builder = builder.whenNotMatchedBySourceDelete(condition=delete_condition)
    builder.execute()

    metrics_row = (
        dt.history(1).select("operationMetrics").collect()[0]["operationMetrics"] or {}
    )
    return DeltaMergeResult(df=dt.toDF(), metrics=metrics_row)


class WapMergeResult:
    """MergeResult-shaped outcome of a committed WAP merge. Metrics
    come from the join classification captured BEFORE publish (they
    were the audit's expectation); ``df`` reads the COMMITTED
    snapshot, so downstream consumers see exactly what any other
    reader sees."""

    def __init__(self, df: DataFrame, counts: dict[str, int], version: int) -> None:
        self.df = df
        self._counts = counts
        self.version = version

    @property
    def rows_inserted(self) -> int:
        return self._counts["I"]

    @property
    def rows_updated(self) -> int:
        return self._counts["U"]

    @property
    def rows_deleted(self) -> int:
        return self._counts["D"]

    @property
    def rows_unchanged(self) -> int:
        return self._counts["M"] + self._counts["K"]

    def unpersist(self) -> None:
        """API parity with MergeResult — the join cache is already
        released at commit time."""


def merge_upsert_wap(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    insert_cols: Sequence[str] | None = None,
    matched_condition: Column | None = None,
    not_matched_condition: Column | None = None,
    delete_not_matched_by_source: bool = False,
    delete_condition: Column | None = None,
    validate_source_unique: bool = True,
    commit_extra: dict | None = None,
    partition_by: Sequence[str] | None = None,
    stats_cols: Sequence[str] | None = None,
    validate_partition_stability: bool = False,
    table_handle=None,
) -> WapMergeResult:
    """MERGE with an EXECUTED transactional commit and no Delta
    dependency: the join-rewrite computes the post-merge state, then
    ``operators.wap`` runs write → audit (committed files re-read and
    row-counted against the merge metrics' expectation) → atomic
    publish. Readers never see partial state (crash-step tests in
    tests/test_wap.py); two writers racing from one base version get
    one winner and one :class:`wap.ConcurrentWriteError`.

    ``partition_by`` switches to the FACT-SCALE path
    (:class:`wap.PartitionedWapTable`): the touched partition set is
    the source's distinct partition values, the target is read
    metadata-pruned to exactly those partitions, and the commit
    replaces only their directories — merge cost (read, join, write,
    audit) is proportional to touched data, not table size, and
    concurrent merges into disjoint partition sets both land (the
    loser rebases automatically). SEMANTIC SCOPE: with
    ``delete_not_matched_by_source``/``delete_condition``, only
    target rows INSIDE touched partitions are delete candidates —
    rows in untouched partitions are inherited byte-for-byte, the
    standard partition-pruned MERGE contract (Delta's
    partition-predicate merge idiom).

    PARTITION-STABILITY CONTRACT (applies to ALL branches, not just
    deletes): the pruned read means a source row is classified
    matched/not-matched against the TOUCHED partitions only. If the
    merge keys do not functionally determine the partition columns —
    a key that can "move" between partitions — a source row whose
    existing version lives in an UNTOUCHED partition is classified
    not-matched and INSERTED into its new partition while the stale
    row survives untouched: silent duplicate keys. Either include the
    partition columns in ``keys``, keep partition columns stable per
    key (the normal fact-table design: partition = event date, key =
    event id), or pass ``validate_partition_stability=True`` to probe
    the untouched partitions for key collisions before any write —
    one semi-join against metadata-pruned untouched partitions, cost
    ∝ untouched data, which is exactly the cost pruning was avoiding:
    use it as a deploy-time check or where keys are genuinely
    untrusted, not on every nightly run.

    Branch semantics and conditions are the join backend's (conditions
    see the bare merged schema, not t/s aliases).

    ``table_handle`` bypasses the handle construction entirely: pass
    an already-open :class:`wap.WapTable`/:class:`wap.PartitionedWapTable`
    (e.g. one registered for SQL DML with an explicit non-default
    ``storage=``) so the MERGE commits through the same storage seam
    as every other operation on that handle. ``table_path`` is then
    ignored in favor of the handle's own path, and ``partition_by``
    must match the handle's layout."""
    from etl_reporting_spark.operators.wap import (
        PartitionedWapTable,
        WapTable,
        hive_partition_key,
    )

    if table_handle is not None:
        # an already-open handle (e.g. one registered for SQL DML with
        # an explicit non-default TableStorage) is authoritative —
        # re-opening via the factory would put the MERGE on a
        # different storage backend than DELETE/UPDATE use
        table: WapTable = table_handle
        handle_parts = list(getattr(table, "partition_by", []) or [])
        if list(partition_by or []) != handle_parts:
            raise ValueError(
                f"table_handle at {table.path} is partitioned by "
                f"{handle_parts or None}, but partition_by="
                f"{list(partition_by) if partition_by else None} was "
                "requested — pass the handle's own layout (or omit "
                "partition_by and open the path instead)"
            )
    elif partition_by:
        table = PartitionedWapTable(spark, table_path, partition_by)
    else:
        table = WapTable(spark, table_path)
    base = table.current_version()
    touched: list[str] | None = None
    if partition_by:
        # the touched set: every partition the source delta lands in,
        # rendered exactly as the hive dir keys the writer will produce
        vals = (
            source.select(*[F.col(c).cast("string") for c in partition_by])
            .distinct()
            .collect()
        )
        touched = sorted(hive_partition_key(partition_by, tuple(r)) for r in vals)
    if base == 0:
        # bootstrap: merging into a table that doesn't exist yet is a
        # well-defined MERGE (empty target → every source row takes the
        # not-matched INSERT branch); the first commit creates the
        # table, so streaming_wap_upsert works on a fresh path with no
        # separate create step. Root creation goes through the storage
        # seam (a no-op on object stores).
        table.fs.prepare_root()
        target = spark.createDataFrame([], source.schema)
    elif touched is not None:
        existing = set(table.partition_map(version=base))
        present = [k for k in touched if k in existing]
        target = (
            table.read(version=base, partitions=present)
            if present
            else spark.createDataFrame([], source.schema)
        )
        if validate_partition_stability:
            untouched = sorted(existing - set(touched))
            if untouched:
                collisions = (
                    table.read(version=base, partitions=untouched)
                    .select(*keys)
                    .join(source.select(*keys).distinct(), list(keys), "semi")
                    .limit(5)
                    .collect()
                )
                if collisions:
                    raise ValueError(
                        "partition-stability violation: source keys "
                        f"{[tuple(r) for r in collisions]} already exist in "
                        "partitions outside the touched set "
                        "— merging would insert duplicates next to the "
                        "stale rows. Include the partition columns in the "
                        "merge keys, or delete/migrate the old rows first."
                    )
    else:
        target = table.read(version=base)
    res = merge_upsert(
        target,
        source,
        keys,
        update_cols=update_cols,
        insert_cols=insert_cols,
        matched_condition=matched_condition,
        not_matched_condition=not_matched_condition,
        delete_not_matched_by_source=delete_not_matched_by_source,
        delete_condition=delete_condition,
        validate_source_unique=validate_source_unique,
        backend="join",
    )
    counts = dict(res._metrics())
    # the audit expectation: every classified row except deletes and
    # condition-failed source-only rows survives into the snapshot
    # (for the partitioned path: within the touched partitions)
    expected = counts["U"] + counts["I"] + counts["M"] + counts["K"]
    try:
        if touched is not None:
            version = table.commit_partitions(
                res.df,
                replace=touched,
                expected_rows=expected,
                base_version=base,
                operation="merge",
                extra=commit_extra,
                stats_cols=stats_cols,
            )
        else:
            version = table.commit(
                res.df,
                expected_rows=expected,
                base_version=base,
                operation="merge",
                extra=commit_extra,
            )
    finally:
        res.unpersist()
    return WapMergeResult(df=table.read(version=version), counts=counts, version=version)


def merge_partition_files(
    spark: SparkSession,
    table_path: str,
    partition: str,
    source: DataFrame,
    keys: Sequence[str],
    stats_col: str,
    update_cols: Sequence[str] | None = None,
    insert_cols: Sequence[str] | None = None,
    matched_condition: Column | None = None,
    not_matched_condition: Column | None = None,
    delete_not_matched_by_source: bool = False,
    delete_condition: Column | None = None,
    validate_source_unique: bool = True,
    commit_extra: dict | None = None,
) -> WapMergeResult:
    """FILE-granular MERGE into ONE partition of a
    :class:`wap.PartitionedWapTable` — the refinement over
    ``merge_upsert_wap(partition_by=...)`` for the skewed case the
    round-6 verdict named: a narrow-key upsert into a huge partition
    rewrites a strict SUBSET of its files, not the partition.

    ``stats_col`` must be one of ``keys`` and must have per-file
    statistics recorded (commit with ``stats_cols=[stats_col]``).
    File selection reads the commit record only: files whose recorded
    [min, max] for ``stats_col`` overlaps the source's key range (a
    file that contains a matching key necessarily overlaps, so
    matched-classification completeness holds; files without stats
    are conservatively selected). The merge join, write, audit and
    commit all cost ∝ selected files.

    SEMANTIC SCOPE: like the partition-pruned path one level up,
    ``delete_not_matched_by_source``/``delete_condition`` see only
    rows in the SELECTED files as delete candidates. Reference
    semantics: connector/snowpark_connector.py:607-1004.
    """
    from etl_reporting_spark.operators.wap import PartitionedWapTable, open_wap_table

    if stats_col not in keys:
        raise ValueError(
            f"stats_col {stats_col!r} must be one of the merge keys "
            f"{list(keys)} — file selection by a non-key range cannot "
            "guarantee every matching row is in a selected file"
        )
    table = open_wap_table(spark, table_path)
    if not isinstance(table, PartitionedWapTable):
        raise TypeError(f"{table_path} is not a partitioned WAP table")
    base = table.current_version()
    bounds = source.agg(
        F.min(stats_col).alias("lo"), F.max(stats_col).alias("hi")
    ).collect()[0]
    files = table.files_intersecting(
        partition, stats_col, bounds["lo"], bounds["hi"], version=base
    )
    target = table.read_files(files, version=base)
    res = merge_upsert(
        target,
        source,
        keys,
        update_cols=update_cols,
        insert_cols=insert_cols,
        matched_condition=matched_condition,
        not_matched_condition=not_matched_condition,
        delete_not_matched_by_source=delete_not_matched_by_source,
        delete_condition=delete_condition,
        validate_source_unique=validate_source_unique,
        backend="join",
    )
    counts = dict(res._metrics())
    expected = counts["U"] + counts["I"] + counts["M"] + counts["K"]
    try:
        # rewrite N selected files as ~N files: without this the tiny
        # merged subset fans out to one file per shuffle partition and
        # every upsert FRAGMENTS the partition (small-files creep that
        # compaction would then have to keep undoing)
        version = table.commit_partition_files(
            res.df.coalesce(max(1, len(files))),
            partition,
            replace_files=files,
            expected_rows=expected,
            base_version=base,
            operation="merge",
            extra=commit_extra,
            stats_cols=[stats_col],
        )
    finally:
        res.unpersist()
    return WapMergeResult(
        df=table.read(version=version), counts=counts, version=version
    )


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
