"""Measured cost contract of the DV UPDATE rung vs the
partition-rewrite route (round-12 continuation; the merge-ladder
pattern applied to `update_rows_dv`).

The contract is WRITE AMPLIFICATION, so the primary measurement is
BYTES WRITTEN — exact, noise-free, host-load-independent (wall-clock
at ladder scale measures job-scheduling overhead, not the contract:
rewriting 10 MB costs nothing, which is precisely why the rewrite
route feels fine on toy tables and melts on real ones):

1. **Bytes ladder**: the same UPDATE (2,000 matched rows spread
   across every partition — a backfill touching a little of
   everything) against twin tables via both routes. The rewrite
   route re-writes every touched partition, so its bytes track the
   TABLE; ``update_rows_dv`` writes a sidecar + the matched rows, so
   its bytes track the MATCH. ``FAIL_BYTES_SHARE`` trips when the DV
   route writes more than 10 % of the rewrite route's bytes at the
   big rung; ``FAIL_DV_GROWTH`` trips when 4× the table grows the DV
   route's bytes materially (the match is fixed — its write must be
   too).
2. Wall-clock is reported for context, not thresholded: at 100 TB
   the byte ratio IS the time ratio; at ladder scale it is not.

Run: ``python tools/update_ladder.py``. One JSON line; record in
BENCH_NOTES.md. Rows carry a 200-byte payload so bytes mean bytes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAIL_BYTES_SHARE = 0.10  # dv_bytes / rewrite_bytes at the big rung
FAIL_DV_GROWTH = 2.0     # dv_bytes(4R) / dv_bytes(R)


def _build(spark, rows: int):
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.wap import (
        create_partitioned_wap_table,
    )

    df = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 16).alias("bucket"),
        (F.col("id") * 1.5).alias("amt"),
        F.repeat(F.lit("x"), 200).alias("payload"),
    )
    path = tempfile.mkdtemp(prefix="upd_ladder_") + "/t"
    return create_partitioned_wap_table(spark, path, df, ["bucket"])


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def _timed_bytes(table, fn) -> tuple[float, int]:
    before = _tree_bytes(table.path)
    t0 = time.time()
    fn()
    return time.time() - t0, _tree_bytes(table.path) - before


def main() -> int:
    from etl_reporting_spark.operators.sql_dml import execute_dml
    from etl_reporting_spark.operators.wap import register_wap_view
    from etl_reporting_spark.session import get_spark

    spark = get_spark("update_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "dv_update_vs_rewrite", "matched_rows": 2000}
    results: dict[int, dict] = {}
    for i, rows in enumerate((200_000, 800_000)):
        dv_t = _build(spark, rows)
        rw_t = _build(spark, rows)
        register_wap_view(spark, rw_t.path, f"upd_ladder_rw_{i}", dml=True)
        dv_sec, dv_bytes = _timed_bytes(
            dv_t,
            lambda: dv_t.update_rows_dv("k < 2000", {"amt": "amt + 1"}),
        )
        rw_sec, rw_bytes = _timed_bytes(
            rw_t,
            lambda: execute_dml(
                spark,
                f"UPDATE upd_ladder_rw_{i} SET amt = amt + 1 "
                "WHERE k < 2000",
            ),
        )
        results[rows] = {
            "dv_bytes": dv_bytes,
            "rewrite_bytes": rw_bytes,
            "dv_sec": round(dv_sec, 3),
            "rewrite_sec": round(rw_sec, 3),
        }
    out["rungs"] = results
    big, small = max(results), min(results)
    bytes_share = results[big]["dv_bytes"] / max(
        results[big]["rewrite_bytes"], 1
    )
    dv_growth = results[big]["dv_bytes"] / max(results[small]["dv_bytes"], 1)
    out["dv_bytes_share_at_big_rung"] = round(bytes_share, 4)
    out["dv_bytes_growth_4x"] = round(dv_growth, 3)
    out["rewrite_bytes_growth_4x"] = round(
        results[big]["rewrite_bytes"]
        / max(results[small]["rewrite_bytes"], 1),
        3,
    )
    out["fail_bytes_share"] = FAIL_BYTES_SHARE
    out["fail_dv_growth"] = FAIL_DV_GROWTH
    print(json.dumps(out))
    bad = []
    if bytes_share >= FAIL_BYTES_SHARE:
        bad.append(
            f"dv route wrote {bytes_share:.1%} of the rewrite route's "
            f"bytes (>= {FAIL_BYTES_SHARE:.0%}) — it is rewriting files"
        )
    if dv_growth >= FAIL_DV_GROWTH:
        bad.append(
            f"dv bytes grew {dv_growth:.2f}x at 4x table size with a "
            "FIXED match — write amplification is tracking the table"
        )
    for b in bad:
        print(f"FAIL {b}", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
