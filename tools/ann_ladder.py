"""ANN serving scale-ladder (round-13; VERDICT r12 #5).

The dedup ladder (tools/scale_ladder.py, measured exponent 0.903 at a
10× step) proved the BLOCKED dedup paths stay linear; the ANN serving
path had no equivalent. This probe measures the scaling exponent of
the TRAINED IVF+PQ serving query — the `ann_cosine_ivfpq_trained`
composition: multi-probe ADC (n_probe=6 of 32 cells, residual
encoding) + exact rerank at shortlist 24 — across a 10× embeddings
step:

    exponent = log(t_200k / t_20k) / log(10)

Cost model being verified (llm/quantize.py:646 ivfpq_candidates):
per-query candidates ∝ |corpus| · n_probe / n_cells at fixed n_probe,
plus one corpus-linear encode pass — so wall-clock should scale
~linearly (exponent ≈ 1.0) with a constant-factor advantage over
brute force. A reading ≥ FAIL_EXPONENT means the candidate set (or
the rerank join) degenerates corpus-quadratically — e.g. cell
assignment collapsing into few cells, or a shortlist that stopped
bounding the exact-dot stage. Sub-linear readings just mean per-job
overhead still amortizing at the 20k tier; only the HIGH side fails.

The index is TRAINED per tier OUTSIDE the timed region (train once,
materialize, serve many — the deployment shape; build cost has its
own measured tier in bench.py via ann_recall_sweep_trained). The
candidate-set row count is recorded per tier as a direct check of the
∝ corpus/n_cells claim, independent of wall-clock noise.

Tiers replicate ONLY ``embeddings`` (gen_sf deterministic rotation
replicas, k=10 → 20k and k=100 → 200k vectors over sf0.1) under
.localdata/ — nothing else is read.

**Recall-drift rung (round-14; VERDICT r13 #1)**: the persisted-index
growth story (llm/ann_index.py) freezes the centroids + codebook at
build time and ``pq_encode``s every increment against them — correct
by construction (the growth gate hash-proves it), but the FROZEN
model slowly mismatches a drifting corpus. This rung measures the
price at a 2× corpus step: build at k=10 (20k vectors), append the
k=20 tier's second half through the frozen codebook, and compare
recall@5 (vs exact brute force over the 2× corpus) against a full
retrain at 2×. ``recall_drift = recall_retrain − recall_frozen``;
a drift ≥ DRIFT_FAIL means frozen growth is costing real recall at
2× and the maintenance cadence needs a rebuild rung. (gen_sf replica
offsets make the k=10 tier a strict subset of k=20, so "append the
rest" is exactly the deployment shape.)

Run: ``python tools/ann_ladder.py`` → one JSON line; exits nonzero on
a FAIL verdict. Results are recorded as a BENCH_NOTES.md row per run,
not wired into bench.py — a 10× corpus probe is a per-round
diagnosis, not a per-commit regression gate.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 2  # min-of-2 serving runs per tier; the signal is a 10x ratio
FAIL_EXPONENT = 1.4
DRIFT_FAIL = 0.15  # frozen-codebook recall may trail a 2x retrain by < this
N_CENTROIDS = 32
N_CODES = 64
N_PROBE = 6
SHORTLIST = 24
N_QUERIES = 20


def _tier(spark, k: int) -> str:
    from tools.gen_sf import generate

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, ".localdata", f"sfann{k}")
    generate(spark, "/root/testdata/sf0.1", out, k={"embeddings": k})
    return out


def run() -> dict:
    from pyspark.sql import functions as F

    from etl_reporting_spark.caching import cache_scope
    from etl_reporting_spark.io import load_table
    from etl_reporting_spark.llm.quantize import (
        exact_rerank,
        ivfpq_candidates,
        materialize_index,
        pq_train_codebook,
        residualize,
    )
    from etl_reporting_spark.llm.similarity import train_ivf_centroids
    from etl_reporting_spark.session import get_spark

    spark = get_spark("ann_ladder")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    cand_rows: dict[str, int] = {}
    corpus_rows: dict[str, int] = {}
    for k in (10, 100):
        d = _tier(spark, k)
        emb = load_table(spark, d, "embeddings")
        queries = emb.filter(F.col("vec_id") < N_QUERIES)
        corpus_rows[f"k{k}"] = emb.count()

        # BUILD (untimed): train once, cut lineage — the serving side
        # below references the index as plain data, deployment-style.
        with cache_scope():
            cents = materialize_index(
                train_ivf_centroids(
                    emb, n_centroids=N_CENTROIDS, iterations=5
                )
            )
        with cache_scope():
            cb = materialize_index(
                pq_train_codebook(
                    residualize(emb, cents).select("vec_id", "embedding"),
                    m=8,
                    n_codes=N_CODES,
                    dim=64,
                    iterations=3,
                )
            )

        def serve():
            cands = ivfpq_candidates(
                emb,
                queries,
                n_probe=N_PROBE,
                residual=True,
                n_centroids=N_CENTROIDS,
                n_codes=N_CODES,
                centroids=cents,
                codebook=cb,
            )
            return cands, exact_rerank(
                cands, emb, queries, k=5, shortlist=SHORTLIST
            )

        # SERVE (timed): candidates + rerank to completion, cold cache
        runs = []
        for _ in range(REPEATS):
            spark.catalog.clearCache()
            t0 = time.time()
            _, out = serve()
            out.count()
            runs.append(time.time() - t0)
        timings[f"k{k}"] = round(min(runs), 3)
        # the structural check: candidate rows per tier — must track
        # corpus/n_cells·n_probe·n_queries, not corpus²
        cands, _ = serve()
        cand_rows[f"k{k}"] = cands.count()

    exponent = round(
        math.log(timings["k100"] / timings["k10"]) / math.log(10), 3
    )
    cand_growth = round(cand_rows["k100"] / max(cand_rows["k10"], 1), 2)

    # ---- recall-drift rung: frozen-codebook growth vs retrain at 2x
    import shutil
    import tempfile

    from etl_reporting_spark.llm.ann_index import build_ann_index
    from etl_reporting_spark.llm.similarity import cosine_topk_bruteforce

    d10, d20 = _tier(spark, 10), _tier(spark, 20)
    emb10 = load_table(spark, d10, "embeddings")
    emb20 = load_table(spark, d20, "embeddings")
    queries = emb20.filter(F.col("vec_id") < N_QUERIES)
    truth = (
        cosine_topk_bruteforce(emb20, queries, k=5)
        .select("query_id", "neighbor_id")
    )
    denom = float(N_QUERIES * 5)

    def recall(idx) -> float:
        got = idx.search(
            queries, k=5, n_probe=N_PROBE, shortlist=SHORTLIST,
            rerank_embeddings=emb20,
        ).select("query_id", "neighbor_id")
        return round(got.join(truth, ["query_id", "neighbor_id"]).count() / denom, 3)

    work = tempfile.mkdtemp(prefix="ann_drift_")
    try:
        frozen = build_ann_index(
            spark, f"{work}/frozen", emb10,
            n_centroids=N_CENTROIDS, n_codes=N_CODES, exact=False,
        )
        # the deployment shape: the 2x tier's second half appended
        # through the FROZEN model (gen_sf replica offsets: the k=10
        # tier is a strict subset of k=20)
        frozen.append(emb20.join(emb10.select("vec_id"), "vec_id", "left_anti"))
        recall_frozen = recall(frozen)
        retrained = build_ann_index(
            spark, f"{work}/retrained", emb20,
            n_centroids=N_CENTROIDS, n_codes=N_CODES, exact=False,
        )
        recall_retrain = recall(retrained)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    drift = round(recall_retrain - recall_frozen, 3)

    return {
        "metric": "ann_serving_scale_ladder",
        "config": (
            f"trained IVF+PQ residual, {N_CENTROIDS} cells, "
            f"n_probe={N_PROBE}, shortlist={SHORTLIST}, "
            f"{N_QUERIES} queries"
        ),
        "corpus_step": "10x embeddings (k=10 -> k=100 over sf0.1)",
        "corpus_rows": corpus_rows,
        "seconds": timings,
        "candidate_rows": cand_rows,
        "candidate_growth_at_10x": cand_growth,
        "scaling_exponent": exponent,
        "estimator": f"min of {REPEATS}, cold cache, build untimed",
        "verdict": (
            "linear-ish (healthy)"
            if exponent < FAIL_EXPONENT
            else "SUPERLINEAR — candidate/rerank blowup; investigate"
        ),
        "drift_step": "2x embeddings (k=10 build + frozen append -> k=20)",
        "recall_frozen_append": recall_frozen,
        "recall_retrain": recall_retrain,
        "recall_drift": drift,
        "drift_verdict": (
            "frozen growth holds (healthy)"
            if drift < DRIFT_FAIL
            else "DRIFT — frozen codebook losing recall at 2x; schedule a rebuild"
        ),
    }


if __name__ == "__main__":
    result = run()
    print(json.dumps(result, separators=(",", ":")))
    ok = (
        result["scaling_exponent"] < FAIL_EXPONENT
        and result["recall_drift"] < DRIFT_FAIL
    )
    sys.exit(0 if ok else 1)
