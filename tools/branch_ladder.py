"""Measured cost contract of branch publish — metadata replay as a
number, not a docstring (round-12; VERDICT round-11 "Next" #7).

``publish_branch`` documents itself as pure metadata replay: per
branch commit, one driver-side rebase of the partition map plus one
CAS record write — no data read, no data moved. This probe pins that
two ways:

1. **Zero Spark jobs.** The publish runs inside its own job group;
   after it returns, the status tracker must report NO job ever ran
   in that group. A publish that starts scanning data (the regression
   this probe exists to catch) cannot hide — any job trips the
   assert.
2. **Table-size ladder** (fixed branch work, growing table): the same
   4-commit branch published over tables of P and 4P partitions. The
   replay copies the partition map per commit (driver dict math,
   O(P) with a tiny constant), so wall-clock should stay near-flat;
   ``FAIL_TABLE_RATIO`` fails loud when 4× the partitions costs
   anything like 4× the time at these sizes — at metadata constants
   that signals per-partition I/O creeping in, not dict math.
3. **Main-progress ladder** (fixed branch + table, growing DISJOINT
   main progress since the fork): the conflict screen walks main's
   post-fork commits (metadata GETs, ∝ progress), so doubling main's
   progress must not double publish time at these sizes.

Run: ``python tools/branch_ladder.py``. Prints one JSON line; record
the ratios in BENCH_NOTES.md. Timings are min-of-2 per rung; the
zero-jobs assert is noise-free regardless of host load.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAIL_TABLE_RATIO = 2.5
FAIL_PROGRESS_RATIO = 2.5
JOB_GROUP = "branch-publish-probe"


def _build(spark, path: str, n_partitions: int):
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.wap import (
        create_partitioned_wap_table,
    )

    df = (
        spark.range(n_partitions * 20)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % n_partitions).alias("bucket"),
            (F.col("id") * 1.5).alias("amt"),
        )
    )
    return create_partitioned_wap_table(spark, path, df, ["bucket"])


def _branch_work(spark, path: str, name: str, n_partitions: int):
    """4 branch commits, each an upsert into ONE fixed partition —
    branch-touched set stays 4 partitions at every table size."""
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.branches import create_branch

    br = create_branch(spark, path, name)
    for i in range(4):
        bucket = i  # partitions 0..3: disjoint from main's work below
        src = spark.range(5).select(
            (F.col("id") * n_partitions + bucket).alias("k"),
            F.lit(bucket).cast("long").alias("bucket"),
            F.lit(999.0 + i).alias("amt"),
        )
        br.upsert_rows_dv(src, keys=["k"])
    return br


def _main_progress(spark, table, n_partitions: int, n_commits: int):
    from pyspark.sql import functions as F

    for i in range(n_commits):
        bucket = n_partitions - 1 - i  # top buckets: disjoint from 0..3
        src = spark.range(5).select(
            (F.col("id") * n_partitions + bucket).alias("k"),
            F.lit(bucket).cast("long").alias("bucket"),
            F.lit(-1.0 * i).alias("amt"),
        )
        table.upsert_rows_dv(src, keys=["k"])


def _timed_publish(spark, path: str, name: str) -> float:
    from etl_reporting_spark.operators.branches import publish_branch

    sc = spark.sparkContext
    sc.setJobGroup(JOB_GROUP, "branch publish must launch no jobs")
    try:
        t0 = time.time()
        publish_branch(spark, path, name)
        dt = time.time() - t0
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup(JOB_GROUP)
    if jobs:
        raise AssertionError(
            f"publish_branch launched Spark job(s) {list(jobs)} — the "
            "metadata-replay contract is broken (it read data)"
        )
    return dt


def _rung(spark, n_partitions: int, main_commits: int = 2) -> float:
    best = None
    for _ in range(2):
        path = tempfile.mkdtemp(prefix="branch_ladder_") + "/t"
        t = _build(spark, path, n_partitions)
        _branch_work(spark, path, "probe", n_partitions)
        _main_progress(spark, t, n_partitions, main_commits)
        dt = _timed_publish(spark, path, "probe")
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    from etl_reporting_spark.session import get_spark

    spark = get_spark("branch_ladder")
    t_small = _rung(spark, 64)
    t_big = _rung(spark, 256)
    table_ratio = t_big / max(t_small, 1e-9)
    t_prog2 = _rung(spark, 64, main_commits=2)
    t_prog8 = _rung(spark, 64, main_commits=8)
    progress_ratio = t_prog8 / max(t_prog2, 1e-9)
    out = {
        "metric": "branch_publish_ladder",
        "zero_spark_jobs": True,  # _timed_publish raised otherwise
        "publish_sec_64p": round(t_small, 4),
        "publish_sec_256p": round(t_big, 4),
        "table_ratio_4x": round(table_ratio, 3),
        "publish_sec_progress2": round(t_prog2, 4),
        "publish_sec_progress8": round(t_prog8, 4),
        "progress_ratio_4x": round(progress_ratio, 3),
        "fail_table_ratio": FAIL_TABLE_RATIO,
        "fail_progress_ratio": FAIL_PROGRESS_RATIO,
    }
    print(json.dumps(out))
    bad = []
    if table_ratio >= FAIL_TABLE_RATIO:
        bad.append(
            f"table ladder: 4x partitions cost {table_ratio:.2f}x "
            f"(>= {FAIL_TABLE_RATIO}) — per-partition I/O crept into "
            "the replay"
        )
    if progress_ratio >= FAIL_PROGRESS_RATIO:
        bad.append(
            f"progress ladder: 4x main progress cost "
            f"{progress_ratio:.2f}x (>= {FAIL_PROGRESS_RATIO}) — the "
            "conflict screen is doing more than metadata GETs"
        )
    for b in bad:
        print(f"FAIL {b}", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
