"""Measured cost contract of the incremental DQ battery (round-12;
the ladder for dq/incremental.py's cost claims).

dq_battery re-scans the full tables every run. The incremental
battery's cost splits by check kind, and the ladder measures BOTH
honestly instead of pretending they are one number:

- **Sketch-state battery** (row + metric + APPROX duplicate checks):
  per-increment work ∝ slice, state O(4 KB). The LOUD contract is
  GROWTH: across a 4× table step the refresh must not grow faster
  than the batch does (``FAIL_GROWTH_EXCESS``) — a refresh tracking
  the table is re-reading history. The refresh/batch SHARE is
  reported, not thresholded: at probe scale BOTH sides are
  fixed-overhead-bound (a state commit has more fixed steps — write,
  read-back audit, CAS — than three aggregates over a page-cached
  GB), so the probe also extrapolates the CROSSOVER table size from
  the batch's measured per-row slope vs the refresh's flat cost;
  beyond it the batch loses by the scan, which is the 100 TB point.
- **Exact-duplicate battery**: its running state is one narrow row
  per KEY, so a refresh pays a state-sized merge — on a
  unique-keyed table that is ∝ |keys| ≈ |rows|, NOT dramatically
  cheaper than a scan until fact rows are much wider than state
  rows. Reported, not thresholded: the number EXISTS to document
  where the exact check lives (and why add_approx_duplicate_check
  exists — screen wide with the sketch, confirm narrow with the
  exact check over the suspect slice).

The batch side reads PARQUET FROM DISK (the shape dq_battery
actually has), not a cached frame. Fact rows carry a 120-byte
payload so fact-vs-state width is realistic.

- **Retractable (linear-counting) screen refresh** (round-14): the
  `retractable=True` duplicate screen's increment — one narrow
  groupBy ∝ min(|slice|, buckets) into ≤-buckets state. Growth across
  the 4× step must stay flat like the HLL sketch battery's.

- **Dim-DELETE re-orphan pass** (round-14): the state model's one
  deliberate fact read — a projection-pruned fk-column scan,
  semi-joined against the broadcast deleted-key set, paid when the
  delete lands (never on verdict reads). Reported as a share of the batch
  battery's all-checks re-scan; both are scan-bound, the re-orphan
  pass reads one narrow column where the batch reads every checked
  column, every run.

Run: ``python tools/dq_ladder.py``. One JSON line; record in
BENCH_NOTES.md. Refresh timings are single-shot by design
(re-folding the same slice would double-count — increments are not
idempotent), so run on a quiet host.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAIL_GROWTH_EXCESS = 1.5  # sketch refresh growth / batch growth


def _write_fact(spark, rows: int) -> str:
    from pyspark.sql import functions as F

    path = tempfile.mkdtemp(prefix="dq_ladder_fact_") + "/fact"
    spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("custkey"),
        (F.col("id") * 1.5).alias("amt"),
        F.when(F.col("id") % 1009 == 0, None)
        .otherwise(F.repeat(F.lit("n"), 120))
        .alias("name"),
    ).write.parquet(path)
    return path


def _sketch_battery(spark, state: str):
    from pyspark.sql import functions as F

    from etl_reporting_spark.dq.incremental import IncrementalDQBattery

    b = IncrementalDQBattery(spark, state)
    b.add_row_check("R1", "fact", F.col("name").isNull())
    b.add_row_check("R2", "fact", F.col("amt") < 0)
    b.add_metric_check("M1", "fact", "amt", mean_between=(0.0, 1e12))
    b.add_approx_duplicate_check("AD1", "fact", ["k"], tolerance_rows=1000)
    return b


def _exact_battery(spark, state: str):
    from etl_reporting_spark.dq.incremental import IncrementalDQBattery

    b = IncrementalDQBattery(spark, state)
    b.add_duplicate_check("D1", "fact", ["k"])
    return b


def _lc_battery(spark, state: str):
    """The retractable (linear-counting) duplicate screen — round-14.
    State ≤ buckets + anchor regardless of key cardinality; each
    increment's partial is one narrow groupBy ∝ min(|slice|, m)."""
    from etl_reporting_spark.dq.incremental import IncrementalDQBattery

    b = IncrementalDQBattery(spark, state)
    b.add_approx_duplicate_check(
        "L1", "fact", ["k"], tolerance_rows=1000,
        retractable=True, buckets=8192,
    )
    return b


def _batch_shape(spark, path: str) -> None:
    """The batch battery's work over the FULL table, from disk."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    df.agg(
        F.count(F.when(F.col("name").isNull(), 1)),
        F.count(F.when(F.col("amt") < 0, 1)),
    ).collect()
    (
        df.select(F.col("k").cast("string").alias("k"))
        .groupBy("k")
        .count()
        .filter("count > 1")
        .count()
    )
    df.agg(
        F.count("amt"), F.sum("amt"), F.min("amt"), F.max("amt")
    ).collect()


def _timeit(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def _rung(spark, rows: int) -> dict[str, float]:
    from pyspark.sql import functions as F

    from etl_reporting_spark.dq.incremental import IncrementalDQBattery

    path = _write_fact(spark, rows)
    df = spark.read.parquet(path)
    spark.catalog.clearCache()
    batch = min(_timeit(lambda: _batch_shape(spark, path)) for _ in range(2))
    cut = rows - rows // 20
    out = {"batch_sec": round(batch, 3)}
    for name, builder in (
        ("sketch", _sketch_battery),
        ("exact", _exact_battery),
        ("lc", _lc_battery),
    ):
        b = builder(
            spark, tempfile.mkdtemp(prefix=f"dq_ladder_{name}_") + "/state"
        )
        b.process_increment({"fact": df.filter(f"k < {cut}")})

        def refresh():
            b.process_increment({"fact": df.filter(f"k >= {cut}")})
            b.verdicts().collect()

        out[f"refresh_{name}_sec"] = round(_timeit(refresh), 3)

    # dim-DELETE re-orphan rung (round-14): the state model's one
    # deliberate fact read — a projection-pruned pass over the fk
    # column, semi-joined against the broadcast deleted-key set, paid
    # when the delete lands. Contract measured: GROWTH — the pass's
    # data term is one narrow column, so it must track the fk
    # column's bytes, not the table's width or the battery's check
    # count (at probe scale the absolute share vs the batch re-scan
    # is dominated by the fixed state-commit + verdict overhead; the
    # measured 2026-08 reading is FLAT, 0.80 at the 4x step).
    dim = spark.range(97).select(F.col("id").alias("custkey"))
    bo = IncrementalDQBattery(
        spark, tempfile.mkdtemp(prefix="dq_ladder_orph_") + "/state"
    )
    bo.add_orphan_check("O1", "fact", "custkey", "dim", "custkey")
    bo.process_increment({"fact": df}, dims={"dim": dim})

    def reorphan():
        bo.process_increment(
            {},
            dims={"dim": dim.filter("custkey <> 7")},
            dim_deletes={"dim": dim.filter("custkey = 7")},
            facts={"fact": df},
        )
        bo.verdicts().collect()

    out["reorphan_sec"] = round(_timeit(reorphan), 3)
    return out


def main() -> int:
    from etl_reporting_spark.session import get_spark

    spark = get_spark("dq_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    results = {rows: _rung(spark, rows) for rows in (1_600_000, 6_400_000)}
    big, small = max(results), min(results)
    share = results[big]["refresh_sketch_sec"] / max(
        results[big]["batch_sec"], 1e-9
    )
    s_growth = results[big]["refresh_sketch_sec"] / max(
        results[small]["refresh_sketch_sec"], 1e-9
    )
    b_growth = results[big]["batch_sec"] / max(
        results[small]["batch_sec"], 1e-9
    )
    excess = s_growth / max(b_growth, 1e-9)
    # extrapolated crossover: batch ≈ a + b·rows (two measured
    # points), sketch refresh ≈ flat at its big-rung value
    b_slope = (results[big]["batch_sec"] - results[small]["batch_sec"]) / (
        big - small
    )
    if b_slope > 0:
        crossover = int(
            (results[big]["refresh_sketch_sec"] - results[big]["batch_sec"])
            / b_slope
            + big
        )
    else:
        crossover = None
    out = {
        "metric": "incremental_dq_refresh",
        "rungs": results,
        "sketch_share_at_big_rung": round(share, 3),
        "sketch_growth_4x": round(s_growth, 3),
        "batch_growth_4x": round(b_growth, 3),
        "growth_excess": round(excess, 3),
        "extrapolated_crossover_rows": crossover,
        "exact_share_at_big_rung": round(
            results[big]["refresh_exact_sec"]
            / max(results[big]["batch_sec"], 1e-9),
            3,
        ),
        # round-14: the dim-DELETE re-orphan pass (one fk-column scan
        # per delete batch) vs the batch battery's all-checks re-scan
        "reorphan_share_at_big_rung": round(
            results[big]["reorphan_sec"]
            / max(results[big]["batch_sec"], 1e-9),
            3,
        ),
        # round-14: the retractable (linear-counting) screen — state
        # ≤ buckets, partials ∝ min(slice, m): refresh growth must
        # stay at-or-under the sketch battery's (both flat)
        "lc_growth_4x": round(
            results[big]["refresh_lc_sec"]
            / max(results[small]["refresh_lc_sec"], 1e-9),
            3,
        ),
        "reorphan_growth_4x": round(
            results[big]["reorphan_sec"]
            / max(results[small]["reorphan_sec"], 1e-9),
            3,
        ),
        "fail_growth_excess": FAIL_GROWTH_EXCESS,
    }
    print(json.dumps(out))
    bad = []
    if excess >= FAIL_GROWTH_EXCESS:
        bad.append(
            f"sketch refresh grew {excess:.2f}x FASTER than the batch "
            "across the 4x rung — it is re-reading history"
        )
    for b_ in bad:
        print(f"FAIL {b_}", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
