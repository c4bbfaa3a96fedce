"""Measured scaling of the minimal-write merge path — the
cost-∝-touched-data claim as a number, not a docstring.

``upsert_rows_dv`` documents write amplification ∝ |batch| (appended
rows + a sidecar ∝ matched rows) with the TABLE size out of the cost
model. This probe measures exactly that, two ways:

1. **Batch ladder** (fixed table, growing batch): upsert batches of
   n, 4n, 16n rows into the same ~150k-row fact and fit the exponent
   of seconds vs batch size. Healthy ≈ sublinear-to-linear (fixed
   per-commit overhead amortizes); an exponent ≥ ``FAIL_EXPONENT``
   means per-row cost is GROWING with batch — a blocking/shuffle bug.
2. **Table ladder** (fixed batch, growing table): the same batch into
   tables of k and 4k rows. Healthy ≈ flat (ratio below
   ``FAIL_TABLE_RATIO``); a ratio near 4 means the merge is secretly
   scanning the table — the exact regression the partition-pruned
   contract forbids.

Run: ``python tools/merge_ladder.py [--sf-dir DIR]``. Prints one JSON
line; record the exponents in BENCH_NOTES.md. Timings are min-of-2
per rung (cold JVM noise); run on an ambient-quiet host or expect the
bracketing bench probes' caveats to apply here too.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAIL_EXPONENT = 1.4
FAIL_TABLE_RATIO = 2.0


def _table_from_orders(spark, orders, n_rows: int, path: str):
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.wap import (
        create_partitioned_wap_table,
    )

    base = orders.limit(n_rows).select(
        "o_orderkey",
        (F.col("o_orderkey") % 16).alias("bucket"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    return create_partitioned_wap_table(spark, path, base, ["bucket"])


def _batch(spark, orders, n_rows: int):
    from pyspark.sql import functions as F

    return orders.limit(n_rows).select(
        "o_orderkey",
        (F.col("o_orderkey") % 16).alias("bucket"),
        (F.col("o_totalprice").cast("decimal(18,2)") + 1).cast(
            "decimal(18,2)"
        ).alias("price"),
    )


def _timed_upsert(table, batch) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        table.upsert_rows_dv(batch, keys=["o_orderkey"])
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from etl_reporting_spark.session import get_spark

    spark = get_spark("merge_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{args.sf_dir}/orders.parquet")

    # --- batch ladder: fixed ~150k-row table, batches 2k/8k/32k
    t = _table_from_orders(
        spark, orders, 150_000, tempfile.mkdtemp(prefix="ml_t_") + "/f"
    )
    batch_secs = {}
    for n in (2_000, 8_000, 32_000):
        batch_secs[n] = round(_timed_upsert(t, _batch(spark, orders, n)), 3)
    ns = sorted(batch_secs)
    batch_exponent = round(
        math.log(batch_secs[ns[-1]] / batch_secs[ns[0]])
        / math.log(ns[-1] / ns[0]),
        3,
    )

    # --- table ladder: fixed 8k batch, tables 40k vs 160k rows
    table_secs = {}
    for rows in (40_000, 160_000):
        tt = _table_from_orders(
            spark, orders, rows, tempfile.mkdtemp(prefix="ml_s_") + "/f"
        )
        table_secs[rows] = round(
            _timed_upsert(tt, _batch(spark, orders, 8_000)), 3
        )
    ks = sorted(table_secs)
    table_ratio = round(table_secs[ks[-1]] / table_secs[ks[0]], 3)

    verdict = "ok"
    if batch_exponent >= FAIL_EXPONENT:
        verdict = f"FAIL: batch exponent {batch_exponent} >= {FAIL_EXPONENT}"
    elif table_ratio >= FAIL_TABLE_RATIO:
        verdict = (
            f"FAIL: 4x-table ratio {table_ratio} >= {FAIL_TABLE_RATIO} — "
            "the merge is scanning the table"
        )
    print(
        json.dumps(
            {
                "metric": "dv_upsert_scaling",
                "batch_seconds": batch_secs,
                "batch_exponent": batch_exponent,
                "table_seconds": table_secs,
                "table_ratio_4x": table_ratio,
                "verdict": verdict,
            }
        )
    )
    return 0 if verdict == "ok" else 1


if __name__ == "__main__":
    sys.exit(main())
