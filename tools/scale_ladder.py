"""Scale-ladder probe for the dedup heavy tier (round-11 brief #7).

The heavy bench tops out at sf3 (documents k=30) for the LLM gates —
enough to catch plan regressions, but a BLOCKING bug (a bucket-join
that silently degenerates toward all-pairs) grows superlinearly and
can hide inside one tier's noise. This probe measures the scaling
EXPONENT of one dedup path across a 10× corpus step:

    exponent = log(t_sf30 / t_sf3) / log(10)

``dedup_minhash_lsh`` is banded MinHash: cost is ~linear in documents
(bands per doc constant; the generator's ``~r{i}`` token suffixing
keeps replicas shingle-disjoint, so bucket sizes — and the Σdf² join
cost — stay flat as the corpus grows). Expected exponent ≈ 1.0; a
reading ≥ ~1.4 means in-bucket pair blowup the sf3 tier cannot see.
Sub-linear readings (≈0.8) just mean fixed per-job overhead still
amortizing at sf3 — only the HIGH side is a failure signal.

The sf30docs tier replicates ONLY ``documents`` (k=300 over the
driver's sf0.1 — 10× the sf3 corpus, ~200 MB) under .localdata/,
reusing gen_sf's deterministic replication; nothing else is needed
because the gate reads the documents table alone.

Run: ``python tools/scale_ladder.py [gate]`` → one JSON line.
Results are recorded as a BENCH_NOTES.md row per run, not wired into
bench.py — a 10× corpus probe is a per-round diagnosis, not a
per-commit regression gate.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 2  # min-of-2 cold runs per tier; the signal is a 10x ratio


def run(gate: str = "dedup_minhash_lsh") -> dict:
    from etl_reporting_spark.plans.llm_queries import LLM_QUERIES
    from etl_reporting_spark.session import get_spark
    from tools.gen_sf import ensure_tier, generate

    spark = get_spark("scale_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    fn = LLM_QUERIES[gate]

    sf3 = ensure_tier(spark, "sf3")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf30 = os.path.join(repo, ".localdata", "sf30docs")
    generate(spark, "/root/testdata/sf0.1", sf30, k={"documents": 300})

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for label, d in (("sf3", sf3), ("sf30", sf30)):
        runs = []
        for _ in range(REPEATS):
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn(spark, d).count()
            runs.append(time.time() - t0)
        timings[label] = round(min(runs), 3)
        rows[label] = n
    exponent = round(
        math.log(timings["sf30"] / timings["sf3"]) / math.log(10), 3
    )
    return {
        "metric": "dedup_scale_ladder",
        "gate": gate,
        "corpus_step": "10x documents (k=30 -> k=300 over sf0.1)",
        "seconds": timings,
        "result_rows": rows,
        "scaling_exponent": exponent,
        "estimator": f"min of {REPEATS}, cold cache",
        "verdict": (
            "linear-ish (healthy)" if exponent < 1.4 else
            "SUPERLINEAR — investigate bucket-size blowup"
        ),
    }


if __name__ == "__main__":
    gate = sys.argv[1] if len(sys.argv) > 1 else "dedup_minhash_lsh"
    print(json.dumps(run(gate), separators=(",", ":")))
