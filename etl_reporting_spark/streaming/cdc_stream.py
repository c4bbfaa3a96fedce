"""Structured Streaming upgrade path for the reference's batch-CDC
model.

The reference consumes CDC as scheduled batch reads with a
high-water-mark predicate and per-key sequence dedup
(docs/KIMBALL_CDC_DATA_DESIGN.md:284-342;
connector/snowpark_connector.py:425-453). SURVEY.md §2.9 maps that to
Structured Streaming:

- high-water mark        → ``Trigger.AvailableNow`` incremental file
  discovery (each run processes exactly the unseen data, then stops —
  the streaming engine persists the watermark in its checkpoint
  instead of a hand-managed last-load table)
- per-key dedup          → ``dropDuplicates`` within an event-time
  watermark (bounded state)
- periodic snapshots     → windowed event-time aggregation
- MERGE into the target  → ``foreachBatch`` + the engine's join-based
  merge (exactly-once per epoch via checkpointing)
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a CDC landing directory. On a real
    cluster this is the drop zone the CDC tool writes to; each
    micro-batch sees only newly arrived files."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    event_time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once per business key within the lateness bound —
    streaming W1. State is bounded by the watermark: keys older than
    the delay are evicted, so memory does not grow with the keyspace
    history."""
    return stream.withWatermark(event_time_col, delay).dropDuplicates([*keys, event_time_col])


def windowed_event_counts(
    stream: DataFrame,
    event_time_col: str,
    window_duration: str = "1 hour",
    delay: str = "10 minutes",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Periodic-snapshot aggregate as an event-time window with
    late-data handling — the streaming form of the daily-grain
    snapshot fact (KIMBALL_CDC_DATA_DESIGN.md:84-89)."""
    return (
        stream.withWatermark(event_time_col, delay)
        .groupBy(F.window(F.col(event_time_col), window_duration), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("period_start"),
            F.col("window.end").alias("period_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sessionized_event_counts(
    stream: DataFrame,
    event_time_col: str = "ts",
    gap: str = "30 minutes",
    delay: str = "10 minutes",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization with Spark's native ``session_window``
    — the streaming twin of ``operators.sessionize`` (same gap
    semantics: a session extends while successive events arrive within
    ``gap``). State is bounded by the watermark: a session closes, and
    emits, once event time passes its end + ``delay``. Works on batch
    DataFrames too (session_window is batch/stream-agnostic), which is
    how the test cross-checks it against the LAG-based batch operator.

    Boundary fencepost vs the batch operator: an event arriving
    EXACTLY ``gap`` after its predecessor extends the session in
    ``operators.sessionize`` (strict ``>`` on the gap) but starts a new
    one here (session windows are half-open ``[start, last+gap)``).
    """
    w = stream
    if stream.isStreaming:
        w = stream.withWatermark(event_time_col, delay)
    return (
        w.groupBy(F.session_window(F.col(event_time_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_available_now_to_table(
    stream: DataFrame, table: str, checkpoint_dir: str
) -> StreamingQuery:
    """Process everything currently available, then stop — the
    scheduled-batch cadence of the reference's TASK model with
    checkpointed progress instead of a last-load table."""
    return (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .toTable(table)
    )


def stateful_running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-key running (event_count, value_sum) maintained across
    micro-batches — the pattern for any accumulator the built-in
    windowed aggregates can't express (reference has no streaming
    state at all; this is the Spark-native upgrade SURVEY §2.9 maps
    to ``applyInPandasWithState``).

    State is one tuple per key (bounded by keyspace, not history);
    batches arrive as Arrow frames, so Python cost is per-batch, not
    per-row.
    """
    import pandas as pd  # local import: keep module import light
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = f"{key_col} long, event_count long, value_sum double"
    state_schema = "count long, total double"

    def update(key, pdfs, state: GroupState):
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((count, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "event_count": [count], "value_sum": [total]}
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def foreach_batch_upsert(
    stream: DataFrame,
    checkpoint_dir: str,
    upsert: Callable[[DataFrame, int], None],
) -> StreamingQuery:
    """MERGE-per-micro-batch: the upsert callable receives each epoch's
    DataFrame (typically closing over the engine's merge_upsert against
    the serving table). Checkpointing makes the epoch id stable across
    retries → idempotent upserts."""
    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_wap_upsert(
    stream: DataFrame,
    table_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    order_cols: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
) -> StreamingQuery:
    """Per-epoch TRANSACTIONAL merge into a WAP table (round-5): each
    micro-batch is deduped to one row per key (latest by
    ``order_cols`` — a CDC batch can carry several versions of a key),
    merged through ``merge_upsert_wap``, and published atomically.
    Readers polling the serving table only ever see fully-applied
    epochs — never a half-merged micro-batch, the property a plain
    parquet overwrite sink cannot give.

    Exactly-once publish across retries (the Delta ``txnVersion``
    pattern): the epoch id rides the commit record; a replayed epoch —
    the crash window is "commit published, checkpoint not yet
    advanced" — is detected by ``epoch_id <= last committed epoch``
    and skipped, so at-least-once delivery composes to exactly-once
    table state. The stream is the single writer; a concurrent writer
    surfacing :class:`wap.ConcurrentWriteError` fails the query
    rather than corrupting state.

    ``partition_by`` switches the backing table to partition-scoped
    commits (:class:`wap.PartitionedWapTable`): each epoch rewrites
    only the partitions its micro-batch touches — the fact-scale
    streaming sink, where per-epoch commit cost tracks the batch, not
    the accumulated table. A CDC stream keyed by event date is the
    canonical fit: a day's epoch touches one or two partitions of a
    years-deep table. Epoch-id idempotence is unchanged (the record
    carries it either way).
    """
    from etl_reporting_spark.operators.cdc import dedup_latest
    from etl_reporting_spark.operators.merge import merge_upsert_wap
    from etl_reporting_spark.operators.wap import PartitionedWapTable, WapTable

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # an EXISTING table is opened by its committed layout — a
        # hidden-partitioned target (transforms.py) derives each
        # batch's partition columns from its own spec and merges
        # against the physical layout, the same route the SQL-DML
        # surface takes; constraint enforcement rides the commit path
        # either way (a violating batch fails the epoch loudly, and
        # the checkpoint does not advance past it)
        pb = list(partition_by) if partition_by else None
        handle = None
        probe = WapTable(spark, table_path)
        if probe.current_version():
            from etl_reporting_spark.operators.wap import open_wap_table

            opened = open_wap_table(spark, table_path)
            if hasattr(opened, "derive"):
                batch_df = opened.derive(batch_df)
                pb = list(opened.partition_by)
                handle = PartitionedWapTable(
                    spark,
                    table_path,
                    pb,
                    store=opened.store,
                    storage=opened.fs,
                )
            else:
                handle = opened
                opened_pb = list(getattr(opened, "partition_by", []) or [])
                if opened_pb:
                    pb = opened_pb
        table = handle or (
            PartitionedWapTable(spark, table_path, pb)
            if pb
            else WapTable(spark, table_path)
        )
        # backward log scan, not latest_record(): an interleaved
        # maintenance commit must not make a replayed epoch re-apply
        last = table.latest_epoch_id()
        if last is not None and epoch_id <= last:
            return  # replayed epoch: already committed
        batch = (
            dedup_latest(batch_df, list(keys), list(order_cols))
            if order_cols
            else batch_df.dropDuplicates(list(keys))
        )
        merge_upsert_wap(
            spark,
            table_path,
            batch,
            keys,
            commit_extra={"epoch_id": int(epoch_id)},
            partition_by=pb,
            table_handle=table,
        )

    return foreach_batch_upsert(stream, checkpoint_dir, upsert)


def streaming_upsert_dv(
    stream: DataFrame,
    table_path: str,
    keys: Sequence[str],
    partition_by: Sequence[str],
    checkpoint_dir: str,
    order_cols: Sequence[str] | None = None,
    stats_cols: Sequence[str] | None = None,
) -> StreamingQuery:
    """MINIMAL-WRITE streaming CDC apply: each micro-batch lands via
    :meth:`wap.PartitionedWapTable.upsert_rows_dv` — matched old row
    versions are deletion-vectored, the batch's rows appended as new
    files, one atomic commit per epoch. Per-epoch write cost is the
    BATCH (plus a sidecar ∝ matched rows), never the touched
    partitions — the high-frequency-CDC sink where
    ``streaming_wap_upsert(partition_by=...)``'s per-epoch partition
    rewrite would dominate. The read-side debt (masks + small files)
    accumulates per epoch by design; run ``optimize_partitions`` on
    the ``maintenance_plan`` cadence, which also re-tightens file
    statistics.

    Epoch idempotence is the same txnVersion pattern as the other WAP
    sinks: the epoch id rides the commit record and a replayed epoch
    is skipped. The table must exist (bootstrap with
    ``create_partitioned_wap_table`` — the DV path refines an
    existing snapshot)."""
    from etl_reporting_spark.operators.cdc import dedup_latest
    from etl_reporting_spark.operators.wap import PartitionedWapTable

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        table = PartitionedWapTable(spark, table_path, partition_by)
        # backward log scan, not latest_record(): an interleaved
        # maintenance commit must not make a replayed epoch re-apply
        last = table.latest_epoch_id()
        if last is not None and epoch_id <= last:
            return  # replayed epoch: already committed
        batch = (
            dedup_latest(batch_df, list(keys), list(order_cols))
            if order_cols
            else batch_df.dropDuplicates(list(keys))
        )
        table.upsert_rows_dv(
            batch,
            keys,
            stats_cols=stats_cols,
            extra={"epoch_id": int(epoch_id)},
        )

    return foreach_batch_upsert(stream, checkpoint_dir, upsert)


def stream_maintain_aggregate_view(
    source,
    view_path: str,
    keys: Sequence[str],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    max_versions_per_batch: int = 1,
    view_storage=None,
) -> list[int]:
    """The WAP change feed as an INCREMENTAL STREAMING SOURCE
    (round-9 brief #5): drain the source table's commit log from the
    consumer's bookmark to the current tip in per-version-range
    micro-batches — ``Trigger.AvailableNow`` semantics over
    ``table_changes`` — maintaining the downstream aggregate view
    with each batch.

    Exactly-once version bookmarking is the same pattern as
    :func:`streaming_wap_upsert`'s epoch replay, one level up: the
    cursor is not a separate checkpoint file but rides INSIDE the
    view's own commit record (``source_version``), written atomically
    with the state it describes. A crash after a batch's commit but
    before the next loop iteration replays nothing — the next run
    reads the committed cursor and resumes exactly past it; a crash
    mid-batch re-runs that batch from the same cursor against the
    same immutable source versions (deterministic CDF → identical
    state). At-least-once driving composes to exactly-once view
    state, with no state outside the two commit logs.

    Each micro-batch costs ∝ the files churned in its version range
    (``table_changes`` diffs pointers, never inherited data) plus a
    state-sized merge — at 100 TB the stream tails a years-deep fact
    for the price of its churn. ``max_versions_per_batch`` caps how
    many source commits one batch folds together (more = fewer state
    merges, less = finer failure granularity).

    Deliberately NOT a ``pyspark.sql.datasource`` streaming source:
    that API yields Python rows per partition, which would funnel the
    CDF's distributed diff join through the driver — the
    foreachBatch-style driver loop keeps every batch a full Catalyst
    plan. Returns the view versions committed (empty when the source
    hadn't moved)."""
    from etl_reporting_spark.operators.incremental import (
        maintain_aggregate_view,
    )
    from etl_reporting_spark.operators.wap import WapTable

    if max_versions_per_batch < 1:
        raise ValueError("max_versions_per_batch must be >= 1")
    applied: list[int] = []
    # AvailableNow semantics: snapshot the end offset ONCE at
    # invocation and drain to it. Re-reading the tip per iteration
    # would never terminate against a source committing faster than
    # batches drain — new commits belong to the NEXT invocation.
    tip = source.current_version()
    while True:
        view = WapTable(source.spark, view_path, storage=view_storage)
        cursor = (view.latest_record() or {}).get("source_version", 0)
        if cursor >= tip:
            return applied
        to_v = min(cursor + max_versions_per_batch, tip)
        v = maintain_aggregate_view(
            source,
            view_path,
            keys,
            group_cols,
            sum_cols,
            to_version=to_v,
            view_storage=view_storage,
        )
        if v is None:  # defensive: cursor raced past to_v
            return applied
        applied.append(v)


def streaming_dedup_screen(
    doc_stream: DataFrame,
    corpus_docs: DataFrame,
    corpus_signatures: DataFrame,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    k: int = 3,
    min_jaccard: float = 0.5,
) -> StreamingQuery:
    """Streaming corpus ingestion with near-dup screening — the
    production twin of ``llm.dedup.incremental_near_duplicates``: each
    micro-batch is shingled/signed alone and band-joined against the
    standing corpus SIGNATURE STORE, so per-epoch cost scales with the
    batch, never the corpus. ``sink`` receives the verified
    (doc_a, doc_b, jaccard) pairs per epoch (typically: quarantine the
    batch's dup docs and append survivors + their signatures to the
    store — signature maintenance is the caller's foreachBatch close-
    over, same contract as ``foreach_batch_upsert``). Checkpointing
    makes epoch ids stable across retries → idempotent screening.
    """
    from etl_reporting_spark.llm.dedup import incremental_near_duplicates

    def screen(batch_df: DataFrame, epoch_id: int) -> None:
        cleanup: list[DataFrame] = []
        pairs = incremental_near_duplicates(
            corpus_docs,
            batch_df,
            corpus_signatures=corpus_signatures,
            k=k,
            min_jaccard=min_jaccard,
            cleanup=cleanup,
        )
        try:
            sink(pairs, epoch_id)
        finally:
            # Release the per-batch persisted shingle arrays — without
            # this, every epoch leaves cached blocks behind for the
            # life of the stream.
            for df in cleanup:
                df.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(screen)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_quality_screen(
    doc_stream: DataFrame,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    weights: dict | None = None,
    threshold: float = 0.0,
    text_col: str = "text",
) -> StreamingQuery:
    """Streaming ingestion with model-based quality filtering: every
    micro-batch is scored by the linear quality classifier
    (``llm.classify``) — a narrow projection, so it rides the stream
    with no state, no watermark, and no shuffle — and ``sink``
    receives the batch with ``quality_score``/``keep`` attached
    (typically: route keeps to the corpus, rejects to a quarantine
    table with their scores for threshold tuning). Classifier scoring
    composes with the dedup screen in the same foreachBatch when both
    gates run per ingest."""
    from etl_reporting_spark.llm.classify import quality_classifier_score

    def screen(batch_df: DataFrame, epoch_id: int) -> None:
        scored = quality_classifier_score(
            batch_df,
            weights=weights,
            threshold=threshold,
            text_col=text_col,
            passthrough=True,
        )
        sink(scored, epoch_id)

    return (
        doc_stream.writeStream.foreachBatch(screen)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_sketch_maintenance(
    doc_stream: DataFrame,
    checkpoint_dir: str,
    store_dir: str,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
    m_bits: int = 65536,
    k_hashes: int = 5,
    cm_salt: str = "cm",
    bf_salt: str = "bf",
) -> StreamingQuery:
    """Keep the corpus' bounded-state sketches fresh as data streams
    in: every micro-batch builds ITS OWN count-min rows and Bloom
    words (cost ∝ batch) and writes them as an epoch-keyed DELTA
    partition; the standing sketch is the additive/OR fold over the
    deltas (``read_countmin_store`` / ``read_bloom_store``). This
    works precisely because both sketches are mergeable by
    construction — the property that makes them the right shape for
    streaming maintenance, where re-scanning the corpus per epoch is
    off the table.

    Epoch-keyed ``overwrite`` makes retries idempotent (a replayed
    epoch rewrites the same partition); the store stays bounded at
    epochs · (depth·width + m/32) rows until compaction, and
    compaction is itself just the fold: read, aggregate, write one
    delta, drop the rest.
    """
    from etl_reporting_spark.llm.corpusops import bloom_build, countmin_sketch

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        cm = countmin_sketch(batch_df, term_col, depth=depth, width=width, salt=cm_salt)
        bf = bloom_build(batch_df, term_col, m_bits=m_bits, k=k_hashes, salt=bf_salt)
        cm.write.mode("overwrite").parquet(f"{store_dir}/countmin/epoch={epoch_id}")
        bf.write.mode("overwrite").parquet(f"{store_dir}/bloom/epoch={epoch_id}")

    return (
        doc_stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_countmin_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold the epoch deltas into the standing count-min sketch
    (additive merge — identical to a single build over the union)."""
    return (
        spark.read.parquet(f"{store_dir}/countmin")
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_bloom_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold the epoch deltas into the standing Bloom filter (OR
    merge — identical to a single build over the union)."""
    return (
        spark.read.parquet(f"{store_dir}/bloom")
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )


def streaming_drift_screen(
    doc_stream: DataFrame,
    baseline_counts: DataFrame,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    category_col: str = "category",
    max_tvd: float = 0.1,
) -> StreamingQuery:
    """Distribution drift on the ingest stream: every micro-batch's
    category mix is compared to the STANDING baseline counts
    (columns ``(category_col, n)`` — the last signed-off snapshot's
    ``groupBy(category).count()``, a category-cardinality table,
    trivially persistable) with the batch-DQ TVD verdict
    (``drift_check_from_counts`` — no re-inflation of the baseline); ``sink`` receives the
    verdict frame per epoch (typical: alert when ``passed`` is false,
    append the verdict to the DQ log, and promote the batch's counts
    into the next baseline on sign-off).

    Per-epoch cost ∝ batch (one count + one category-sized join) —
    the streaming twin of ``dq.checks.drift_check``, same arithmetic,
    same verdict shape.
    """
    from etl_reporting_spark.dq.checks import drift_check_from_counts

    base = baseline_counts.select(
        F.col(category_col).alias("category"), F.col("n").alias("n_base")
    )

    def screen(batch_df: DataFrame, epoch_id: int) -> None:
        cur = batch_df.groupBy(F.col(category_col).alias("category")).agg(
            F.count(F.lit(1)).alias("n_cur")
        )
        verdict = drift_check_from_counts(cur, base, max_tvd=max_tvd)
        sink(verdict, epoch_id)

    return (
        doc_stream.writeStream.foreachBatch(screen)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_ivm_agg(
    stream: DataFrame,
    table_path: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    checkpoint_dir: str,
    weight_col: str = "__w",
) -> StreamingQuery:
    """Streaming MATERIALIZED AGGREGATE with retractions: each
    micro-batch is a signed delta (rows carry ±1 in ``weight_col`` —
    a CDC update arrives as retract-old + insert-new), and the
    standing per-group state absorbs it via
    ``operators.incremental.ivm_agg_refresh`` — one delta-sized
    aggregate plus one state-sized merge per epoch, never a rescan of
    history. The state lives in a WAP table, so every refresh is
    transactional (readers flip atomically between fully-applied
    epochs) and replayed epochs are no-ops via the epoch-id record
    check — at-least-once delivery composes to exactly-once state,
    the same contract as ``streaming_wap_upsert``.

    The state table is GROUP-cardinality-sized, not event-sized, so
    the full-snapshot :class:`wap.WapTable` rewrite per epoch is the
    right cost model (a day's state for a reporting rollup is
    KB-to-MB; the event stream it summarizes is the thing that's
    big). This is the engine's answer to "continuously maintained
    rollup the reference refreshes by cron": the same signed-counting
    state the batch gate ``ivm_agg_retraction`` hash-verifies, kept
    current by Structured Streaming."""
    import os

    from etl_reporting_spark.operators.incremental import (
        ivm_agg_delta,
        ivm_agg_refresh,
    )
    from etl_reporting_spark.operators.wap import WapTable

    def refresh(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        table = WapTable(spark, table_path)
        # backward log scan, not latest_record(): an interleaved
        # maintenance commit must not make a replayed epoch re-apply
        last = table.latest_epoch_id()
        if last is not None and epoch_id <= last:
            return  # replayed epoch: state already reflects it
        base = table.current_version()
        if base == 0:
            os.makedirs(table_path, exist_ok=True)
            state = ivm_agg_delta(batch_df, group_cols, sum_cols, weight_col)
            table.commit(
                state,
                base_version=0,
                operation="ivm-init",
                extra={"epoch_id": int(epoch_id)},
            )
            return
        refreshed = ivm_agg_refresh(
            table.read(version=base),
            batch_df,
            group_cols,
            sum_cols,
            weight_col,
        )
        table.commit(
            refreshed,
            base_version=base,
            operation="ivm-refresh",
            extra={"epoch_id": int(epoch_id)},
        )

    return foreach_batch_upsert(stream, checkpoint_dir, refresh)
