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
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted.

    The left side gets a random salt in [0, salt_buckets); the right
    side is exploded ×salt_buckets so every (key, salt) pair exists.
    A hot key's rows then spread over ``salt_buckets`` tasks instead
    of one. Correct for inner/left joins on equi keys; the salt never
    escapes this function.

    Use when: both sides too big to broadcast AND key histogram is
    pathological AND AQE skew splitting still leaves a straggler
    (AQE splits by partition size, not by key — a single key larger
    than one split still serializes).
    """
    on = list(on)
    salted_left = left.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = salted_left.join(salted_right, on + ["__salt"], how)
    return joined.drop("__salt")


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
