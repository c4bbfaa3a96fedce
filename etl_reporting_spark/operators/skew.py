"""Skew- and layout-management operators for cluster-scale joins.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; these helpers cover the cases AQE can't:
- ``salted_join``: explicit key salting for *aggregation-feeding*
  joins where one hot key would still hash to one task after AQE
  splitting of the probe side (e.g. a null-heavy or celebrity key in
  a shuffle join neither side of which is broadcastable).
- ``write_partitioned`` / ``write_bucketed``: data layout for the
  100 TB fact tables — date partitioning turns the reference's
  high-water-mark predicates (KIMBALL_CDC_DATA_DESIGN.md:328-342)
  into partition pruning; bucketing by join key co-locates fact⋈fact
  joins so they shuffle zero bytes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, DataFrameWriter
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
    join_hint: str | None = "merge",
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted.

    The left side gets a random salt in [0, salt_buckets); the right
    side is exploded ×salt_buckets so every (key, salt) pair exists.
    A hot key's rows then spread over ``salt_buckets`` tasks instead
    of one. Correct for inner/left joins on equi keys; the salt never
    escapes this function.

    ``hot_keys`` (round-14 optimization) bounds the explode: when the
    caller knows WHICH keys are hot (from ``skew_report``, yesterday's
    histogram, or construction), only those keys salt — cold left rows
    take salt 0 and the right side keeps ONE copy (salt 0) per cold
    row, exploding ×salt_buckets for the hot keys alone. Join
    multiplicity is unchanged (every left row still meets exactly the
    right rows its key matches), so the output is identical; the
    right-side shuffle shrinks from ``salt_buckets×|right|`` to
    ``|right| + salt_buckets×|hot|`` — at sf10 that is 720M exploded
    dim rows down to 45M, measured 13.5 → ~9 s on the j13 gate. With
    ``hot_keys=None`` every key salts (the safe default when the hot
    set is unknown or unbounded). Single-key ``on`` only for
    ``hot_keys`` (the gate/report shape); multi-key callers pass None.

    Use when: both sides too big to broadcast AND key histogram is
    pathological AND AQE skew splitting still leaves a straggler
    (AQE splits by partition size, not by key — a single key larger
    than one split still serializes). Measured on a 60M-row skewed
    events tier (one 80%-hot key, broadcast off): plain SMJ 24.6 s with
    AQE skew splitting ON — splitting by size does not rescue a
    single hot key — vs 9.9 s salted (2.4×).

    ``join_hint`` defaults to "merge" (sort-merge): in the regime this
    operator exists for, the exploded right side must NOT be
    broadcast — Catalyst only sees the pre-explode size estimate, and
    building a ×salt_buckets hash table costs more than the skew ever
    did (measured 23 s vs 10 s at sf10). Pass ``None`` to let the
    optimizer choose, e.g. when the caller already bounds the right
    side. If the right side IS broadcastable, skip salting entirely —
    a broadcast join has no shuffle skew (see ``skew_aware_join``).
    """
    on = list(on)
    if hot_keys is not None:
        if len(on) != 1:
            raise ValueError("hot_keys currently supports single-column keys")
        hot = [k for k in hot_keys if k is not None]
        key = F.col(on[0])
        is_hot = key.isin(*hot) if hot else F.lit(False)
        salted_left = left.withColumn(
            "__salt",
            F.when(is_hot, (F.rand(seed=42) * salt_buckets).cast("int")).otherwise(
                F.lit(0)
            ),
        )
        salted_right = right.withColumn(
            "__salt",
            F.explode(
                F.when(
                    is_hot, F.array(*[F.lit(i) for i in range(salt_buckets)])
                ).otherwise(F.array(F.lit(0)))
            ),
        )
    else:
        salted_left = left.withColumn(
            "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
        )
        salted_right = right.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
        )
    if join_hint:
        salted_right = salted_right.hint(join_hint)
    joined = salted_left.join(salted_right, on + ["__salt"], how)
    return joined.drop("__salt")


def skew_aware_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    hot_keys: Sequence | None = None,
    max_hot_keys: int = 64,
    min_hot_rows: int = 100_000,
) -> DataFrame:
    """Two-path skew join — the production-grade answer when the right
    side is too big to broadcast WHOLE but the hot keys are few (the
    usual celebrity/null-sentinel case):

    - HOT path: rows whose key is in the hot set join against the
      right side FILTERED to those keys — a relation bounded by
      ``max_hot_keys`` rows per key, explicitly broadcast. A broadcast
      join has no shuffle, hence no shuffle skew: the hot rows stream
      through map-side probes at full parallelism.
    - COLD path: the remaining rows take the ordinary equi-join; with
      the hot keys removed, the key histogram is flat and AQE/SMJ
      behave.

    The union of the two paths equals the plain join exactly (keys are
    partitioned into hot/cold; NULL keys fall to the cold path, where
    standard null-equi semantics apply for inner/left joins).

    Only LEFT-PRESERVING joins are supported (``inner``/``left``/
    ``left_semi``/``left_anti``): the decomposition splits the LEFT
    side, so for right/full joins a hot-key right row would match in
    the hot path AND appear null-padded-unmatched from the cold path
    (whose left side has no hot rows) — duplicated output. Those
    shapes need a dual-side decomposition; this raises rather than
    silently corrupting.

    Hot keys containing a NULL component are dropped from the hot set
    (a NULL never equi-matches, so such a "hot key" can only come
    from a null-sentinel histogram entry — its rows belong on the
    cold path, and keeping it would turn ``is_hot`` three-valued and
    silently drop rows from BOTH paths).

    ``hot_keys`` can come from ``skew_report`` (production: computed
    on yesterday's partition, cached); when omitted, one map-side-
    combined count over ``left`` detects keys with ≥ ``min_hot_rows``
    rows (top ``max_hot_keys``). Compared to ``salted_join`` this
    never explodes the right side and costs one small aggregate scan;
    prefer it unless the hot set is unbounded (then salt).
    """
    on = list(on)
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"skew_aware_join supports left-preserving joins only, got {how!r} "
            "— right/full would duplicate hot-key right rows across the paths"
        )
    if hot_keys is None:
        counts = (
            left.groupBy(*on)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") >= min_hot_rows)
            .orderBy(F.col("__n").desc(), *[F.col(c).asc_nulls_last() for c in on])
            .limit(max_hot_keys)
        )
        hot_keys = [tuple(r[c] for c in on) for r in counts.collect()]
    else:
        hot_keys = [k if isinstance(k, tuple) else (k,) for k in hot_keys]
    if not hot_keys:
        return left.join(right, on, how)

    # NULL-component hot keys can't equi-match; keeping them would
    # make is_hot three-valued (see docstring)
    hot_keys = [k for k in hot_keys if all(v is not None for v in k)]
    if not hot_keys:
        return left.join(right, on, how)
    if len(on) == 1:
        is_hot = F.col(on[0]).isin([k[0] for k in hot_keys])
    else:
        is_hot = F.lit(False)
        for k in hot_keys:
            cond = F.lit(True)
            for c, v in zip(on, k):
                cond = cond & (F.col(c) == F.lit(v))
            is_hot = is_hot | cond
    # NULL keys: isNull-guarded to the cold path (NULL <> anything in
    # an equi join; left-join null-key rows must still be preserved)
    null_key = F.lit(False)
    for c in on:
        null_key = null_key | F.col(c).isNull()
    is_hot = F.when(null_key, F.lit(False)).otherwise(is_hot)

    hot = left.filter(is_hot).join(F.broadcast(right.filter(is_hot)), on, how)
    cold = left.filter(~is_hot).join(right, on, how)
    return hot.unionByName(cold)


def repartition_by_key(df: DataFrame, keys: Sequence[str], num_partitions: int | None = None) -> DataFrame:
    """Pre-shuffle on the join/agg key so several downstream stages
    reuse one exchange (the reference's staging-table trick,
    connector:713-719, minus the materialization)."""
    return df.repartition(num_partitions, *keys) if num_partitions else df.repartition(*keys)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Date/tenant-partitioned fact layout: incremental predicates and
    report cutoffs become partition pruning instead of full scans."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table: joins/aggregations on the bucket key
    skip the shuffle entirely when both sides share the layout."""
    writer: DataFrameWriter = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def daily_partition_column(df: DataFrame, ts_col: str, name: str = "event_date") -> DataFrame:
    """Derived partition column for event-time facts."""
    return df.withColumn(name, F.to_date(F.col(ts_col)))


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_mb: int = 256,
    partition_cols: Sequence[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction — the nightly housekeeping pass a
    streaming/incremental sink needs (thousands of KB-sized files per
    day otherwise dominate scan cost with open/footer overhead).

    Sizes the rewrite from the actual input bytes: output file count
    = ceil(total_bytes / target_mb). With ``partition_cols`` the
    rewrite preserves the partition layout and distributes by
    partition value (each output partition directory gets coherent,
    full files). Writes to ``out_path`` — the atomic swap (rename /
    metastore repoint) is the caller's transactional step, never done
    in-place here.

    Returns (files_before, files_after_target). At 100 TB run it per
    partition (date), not per table — the read is partition-pruned by
    the caller passing the partition's path.
    """
    import math

    df = spark.read.parquet(in_path)
    files = df.inputFiles()
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        total += fs.getFileStatus(p).getLen()
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if partition_cols:
        out = df.repartition(n_out, *[F.col(c) for c in partition_cols])
        out.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_path)
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(out_path)
    return len(files), n_out


def _zorder_long_sql(col: str, dtype: str) -> str | None:
    """SQL mapping a column to an EXACT long domain for z-ordering,
    or None for fractional types (which take the float-normalized
    path). Temporal types map monotonically to days/micros since
    epoch — the reference's hottest predicates are date cutoffs
    (reference reports …detail.sql:31,46;
    docs/KIMBALL_CDC_DATA_DESIGN.md:328-342), so DATE/TIMESTAMP
    columns are first-class clustering keys, not a numeric-only
    special case. timestamp_ntz avoids ``unix_micros`` (which
    rejects NTZ) via ``timestampdiff``."""
    d = dtype.lower()
    if d == "date":
        return f"unix_date(`{col}`)"
    if d == "timestamp":
        return f"unix_micros(`{col}`)"
    if d == "timestamp_ntz":
        return (
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col}`)"
        )
    if d in ("tinyint", "smallint", "int", "bigint", "boolean"):
        return f"CAST(`{col}` AS BIGINT)"
    return None  # float/double/decimal/string -> float-normalized path


def zorder_bounds(df: DataFrame, cols: Sequence[str]) -> dict:
    """Per-column [min, max] over the z-order domain — ONE tiny
    column-pruned aggregate, collected to the driver (bounds are 2k
    scalars; Delta's OPTIMIZE does the same). Long bounds for
    exact-domain columns, float bounds for fractional ones. A column
    with no non-null values gets ``(None, None)``."""
    dtypes = dict(df.dtypes)
    aggs = []
    for i, c in enumerate(cols):
        le = _zorder_long_sql(c, dtypes[c])
        e = F.expr(le) if le is not None else F.col(c).cast("double")
        aggs.append(F.min(e).alias(f"lo_{i}"))
        aggs.append(F.max(e).alias(f"hi_{i}"))
    row = df.agg(*aggs).first()
    return {
        c: (row[f"lo_{i}"], row[f"hi_{i}"]) for i, c in enumerate(cols)
    }


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    bounds: dict | None = None,
):
    """Z-order (Morton) clustering key — the ONE implementation
    (round-10 consolidation of the former skew.py float variant and
    wap.py integer variant): each column maps to ``2^bits`` levels
    and the levels' bits are interleaved round-robin (bit j of column
    i lands at position j·k + i), so range-clustering on the single
    key gives EVERY participating column spatial locality — the
    multi-column refinement over lexicographic clustering, whose
    files are selective only on the leading column.

    Per-column mapping, by dtype:

    - integral / DATE / TIMESTAMP / TIMESTAMP_NTZ — EXACT integer
      arithmetic end to end (no libm): levels are
      ``(v − lo) · (2^bits − 1) DIV span`` while that product fits a
      signed 64-bit value, switching to the overflow-safe
      divide-first form ``(v − lo) DIV ceil(span / 2^bits)`` for
      spans past ``2^62 / (2^bits − 1)`` (≈2^46 at 16 bits — e.g.
      micros-since-epoch timestamps), so the key never silently
      wraps. The branch is chosen PER COLUMN in Python over the
      collected bounds (arbitrary-precision span math), not in SQL.
      Spans at or beyond 2^62 (pathological sentinel domains) use a
      shift-then-rebase form that stays monotonic and clamps to the
      level range.
    - fractional (float/double/decimal) — min-max normalized to
      ``[0, 2^bits − 1]`` with floor; NULLs clamp to the range floor
      either way (a NULL would otherwise null the whole key and
      collapse ordering).

    ``bounds`` (col → (lo, hi) in the column's z-order domain) skips
    the internal :func:`zorder_bounds` aggregate — pass it when the
    caller already computed bounds (``write_zordered`` shares one
    scan). Levels are literal-constant expressions inside whole-stage
    codegen; no join, no window, no UDF. ``len(cols) · bits`` must
    fit a signed 64-bit key (≤ 62).

    Returns ``(df, key_column)`` — the frame is returned unchanged
    (tuple kept for caller compatibility); range-partition on the key
    and drop nothing."""
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a 63-bit key")
    top = (1 << bits) - 1
    mult_limit = (1 << 62) // top
    dtypes = dict(df.dtypes)
    if bounds is None:
        bounds = zorder_bounds(df, cols)

    levels = []
    for c in cols:
        lo, hi = bounds[c]
        le = _zorder_long_sql(c, dtypes[c])
        if lo is None or hi is None or lo == hi:
            # all-NULL or constant column: every row at level 0
            levels.append(F.expr("CAST(0 AS BIGINT)"))
            continue
        if le is None:
            # fractional: float-normalize (exactness is a non-goal —
            # doubles already round; monotonic and bounded is enough)
            span = float(hi) - float(lo) or 1.0
            v = (
                F.coalesce(F.col(c).cast("double"), F.lit(float(lo)))
                - F.lit(float(lo))
            ) / F.lit(span)
            v = F.least(F.greatest(v, F.lit(0.0)), F.lit(1.0))
            levels.append(F.floor(v * F.lit(float(top))).cast("long"))
            continue
        span = int(hi) - int(lo)  # Python ints: never overflows
        if span <= mult_limit:
            lvl = (
                f"(({le} - CAST({lo} AS BIGINT)) * CAST({top} AS BIGINT))"
                f" DIV CAST({span} AS BIGINT)"
            )
        elif span < (1 << 62):
            step = span // (top + 1) + 1  # divide-first: no product
            lvl = f"(({le} - CAST({lo} AS BIGINT)) DIV CAST({step} AS BIGINT))"
        else:
            # span at/past 2^62: (v - lo) itself can wrap — shift
            # both sides down first (floor-div is monotonic), then
            # rebase and clamp
            step = span // (top + 1) + 1
            lvl = (
                f"least(greatest(({le} DIV CAST({step} AS BIGINT)) - "
                f"CAST({lo // step} AS BIGINT), CAST(0 AS BIGINT)), "
                f"CAST({top} AS BIGINT))"
            )
        levels.append(F.expr(f"coalesce({lvl}, CAST(0 AS BIGINT))"))

    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, lvl in enumerate(levels):
            key = key + F.shiftleft(
                F.shiftright(lvl, b).bitwiseAND(F.lit(1)), b * k + i
            )
    return df, key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    n_files: int = 32,
) -> None:
    """Multi-dimensional clustering for the lake (Delta's OPTIMIZE
    ZORDER BY, engine-agnostic): range-partition + sort on the Morton
    key so every output file covers a small HYPER-RECTANGLE of the
    column space — parquet row-group min/max stats then prune scans
    filtered on ANY of the z-ordered columns, where a plain sort
    prunes only its leading column.

    Cost: one tiny min/max aggregate (collected scalars, shared with
    the key via ``bounds=``), one range exchange, one in-partition
    sort — the same shuffle count as any clustered write. Use for the
    2-4 highest-selectivity predicate columns of a 100 TB fact table;
    date partitioning stays the outer layout (partition pruning
    first, z-clustering within).
    """
    b = zorder_bounds(df, cols)
    missing = [c for c in cols if b[c][0] is None]
    if missing:
        if len(missing) == len(cols):
            # empty input (a no-new-rows refresh): write the empty
            # frame with its schema; nothing to cluster
            df.write.mode("overwrite").parquet(path)
            return
        raise ValueError(
            f"z-order columns with no non-null values: {missing} — drop "
            "them from the clustering key or filter the nulls first"
        )
    _, z = zorder_key(df, cols, bits=bits, bounds=b)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def hot_keys_from_report(
    df: DataFrame,
    key: str,
    share_threshold: float = 0.05,
    top_k: int = 10,
    sample_fraction: float | None = None,
    seed: int = 7,
) -> list:
    """Derive the ``hot_keys`` set for :func:`salted_join` /
    :func:`skew_aware_join` from :func:`skew_report` (round-15: wires
    the diagnostic to the remedy, so callers pass measured hot keys
    instead of construction knowledge). A key is hot when it carries
    at least ``share_threshold`` of the relation's rows (default 5% —
    a key at the flat-histogram share of 1/n_keys can never straggle;
    one at ≥5% of a 100 TB fact serializes its whole task without
    salting).

    ``sample_fraction`` is the inline-probe mode: estimate shares on
    a seeded Bernoulli sample instead of the full relation. A key at
    ≥5% true share is near-certain in any non-trivial sample while
    the probe's groupBy touches fraction× the rows — measured at
    sf10, the full-relation report costs ~4.5 s against the ~8 s the
    salting saves, the 2% sample ~1 s. Sampling is SAFE here by
    construction: the hot set only shapes the plan (which keys
    explode); ``salted_join``'s output is identical for ANY hot set,
    so a borderline key missed by the sample costs straggler time,
    never correctness. Production alternatives: compute the full
    report on yesterday's partition and cache the tiny result, or
    probe inline with a sample like the j13 gate does. NULL keys are
    dropped (a NULL never equi-matches; both consumers treat it as
    cold)."""
    probe = df.sample(fraction=sample_fraction, seed=seed) if sample_fraction else df
    rows = (
        skew_report(probe, key, top_k=top_k)
        .filter(F.col("share") >= share_threshold)
        .collect()
    )
    return [r["key_value"] for r in rows if r["key_value"] is not None]


def skew_report(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Key-distribution diagnostic that decides the join strategy:
    per hot key its row count and share, plus the whole-relation
    stats every row repeats (n_keys, total, avg rows/key,
    skew_ratio = hottest/avg). Read it as: skew_ratio ≲ 10 → let AQE
    split; one pathological key ≫ rest → ``salted_join``; top keys
    are a bounded set → broadcast a filtered dimension for them.

    One map-side-combinable count + a TakeOrderedAndProject top-k +
    a 1-row aggregate broadcast back — diagnostic cost is one scan,
    safe to run on the 100 TB fact itself.
    """
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("total_rows"),
        F.max("n_rows").alias("max_rows"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key_value").asc()).limit(top_k)
    return top.crossJoin(F.broadcast(stats)).select(
        "key_value",
        "n_rows",
        (F.col("n_rows").cast("double") / F.col("total_rows").cast("double")).alias(
            "share"
        ),
        "n_keys",
        "total_rows",
        (F.col("total_rows").cast("double") / F.col("n_keys").cast("double")).alias(
            "avg_rows_per_key"
        ),
        (
            F.col("max_rows").cast("double")
            / (F.col("total_rows").cast("double") / F.col("n_keys").cast("double"))
        ).alias("skew_ratio"),
    )
