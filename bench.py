"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf"}. Full per-query detail (all gates + heavy tier
metadata) is written to BENCH_DETAIL.json beside this file; the
printed line is budgeted to fit the driver's 2000-char stdout tail
(round 6's full line outgrew it and the official artifact recorded
"parsed": null).

Timing is action-to-completion per query (count() of the final
DataFrame — forces full execution without driver-side row transfer
skew; a separate warm-up query absorbs JVM/codegen startup). Each
query runs REPEATS times and reports the per-query MEDIAN, so a
transiently loaded machine can't fabricate a regression (round 2's
BENCH artifact read +27% that a clean rerun showed was noise).

Heavy tiers (round-5): at sf0.1 most headline queries finish under a
second, so the sweep above measures scheduling noise, not compute
(round-4 verdict). The bench therefore self-generates two larger
tiers under .localdata/ via tools/gen_sf.py (deterministic key-offset
replication of the read-only driver sf0.1 data) and times the heavy
gates there, where every reported query runs >=5 s and a regression
has to be real to show up:

- sf3  (30x tables, 100x embeddings)  — LLM heavies (dedup, ANN, charlm)
- sf10 (300x join chain, 1200x events) — flagship / j1 / w8 / dq_battery

Heavy queries report the MIN of REPEATS_HEAVY runs: at >=5 s compute
dominates and timing noise is strictly additive (GC, page cache,
scheduler), so the minimum is the low-variance estimator (same
rationale as python timeit's repeat docs). Set SPARK_GRAFT_HEAVY=0 to
skip the heavy tiers (e.g. on a disk-constrained machine).

COLD-CACHE DISCIPLINE (heavy tiers): Spark's CacheManager keys
persisted frames by logical plan, so re-running an identical query
whose operator persists an intermediate (minhash candidates, simhash
signatures, IVF assignments) silently reuses the previous run's
materialized cache — a "repeat" then measures only the post-cache
tail (observed 11.6 s -> 1.9 s on dedup_minhash_lsh at sf1). Heavy
runs therefore clearCache() before EVERY timed run, so each repeat
pays the full production cold cost. The sf0.1 sweep keeps the legacy
warm-median methodology for round-over-round comparability (its
persisting gates have always reported warm medians; the heavy tiers
are the regression instrument now).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_active_claimants",
    "q1_pricing_summary",
    "j1_revenue_by_nation",
    "w1_dedup_latest",
    "j5_asof_join",
    "u2_period_rollup",
    "a9_outlier_events",
    "a8_error_rate_by_type",
    "j7_scalar_config_join",
    "f1_working_days",
    "j10_merge_upsert",
    "dq_battery",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_scores",
    "mm_decode_metadata",
    # round-3 additions — the r03 total includes three queries r02's
    # didn't have; compare per-query, not totals, across rounds
    "dedup_cluster_resolution",
    "text_tfidf_topterms",
    "a14_cube",
    "dedup_incremental_screen",
    # round-4 additions: the remaining LLM heavies a 100 TB pipeline
    # runs nightly, plus the signature-store screen (the production
    # path — its fallback twin above re-signs the corpus every run)
    "dedup_simhash_pairs",
    "ann_cosine_lsh",
    "corpus_curation",
    "dedup_incremental_screen_store",
    # round-4 additions #2: the corpus-hygiene / tokenizer-training
    # passes a pretraining pipeline runs per snapshot
    "corpus_line_dedup",
    "bpe_pair_step",
    "text_quality_classifier",
    # round-4 additions #3: compressed-vector ANN, LM filtering, and
    # temperature mixing — the remaining nightly passes
    "ann_cosine_int8",
    "text_charlm_score",
    "sample_temperature_mixture",
    # round-4 additions #4: semantic dedup, bounded-state sketches,
    # URL curation, and perceptual-hash media signatures
    "semdedup_flags",
    "sketch_countmin",
    "sketch_bloom_screen",
    "url_blocklist",
    "mm_phash",
    "ann_cosine_pq",
    "ann_cosine_ivfpq",
    "a15_incremental_rollup",
    "web_text_extraction",
    "w10_cohort_retention",
    "w11_funnel_conversion",
    "j12_table_diff",
    "ts_forward_fill",
    # round-6 additions: fuzzy matching, join IVM, RANGE-frame rolling,
    # bounded-staleness as-of, sampled-threshold DSIR selection
    "fuzzy_address_dedup",
    "ivm_join_maintenance",
    "w13_rolling_window",
    "j5b_asof_tolerance",
    "text_dsir_select",
    # round-7: the IVF+PQ recall sweep (8 operating points, ADC +
    # exact-rerank refine, from one encode pass per encoding) and the
    # recommended serving query (prune × ADC shortlist × exact refine)
    "ann_recall_sweep",
    "ann_cosine_ivfpq_refined",
    "sketch_hll_distinct",
]

# Index-BUILD gates (round-8): train + serve compositions whose cost
# is dominated by one-time index construction (Lloyd iterations,
# codebook training). Timed ONCE each and reported under "build",
# EXCLUDED from the headline total — build cost is paid per index,
# not per query, and folding 3 repeats of it into the serving total
# would drown real serving regressions.
BUILD_GATES = [
    "ann_recall_sweep_trained",
]

# Heavy gates timed at the self-generated sf3 tier (30x sf0.1, all
# tables) — each >=5 s COLD on local[32], so round-over-round deltas
# exceed noise.
HEAVY_LLM = [
    "dedup_minhash_lsh",
    "dedup_incremental_screen_store",
    "dedup_cluster_resolution",
    "text_charlm_score",
    "ann_cosine_pq",
    "ann_cosine_ivfpq",
    # round-6: decode throughput over 96x96 real-codec images (30x
    # documents -> 150k images, ~1.8 GB of pixels through the pure-
    # Python codecs inside the Arrow batch contract)
    "mm_decode_throughput",
]

# Relational heads timed at the sf10 tier (join chain 300x, events
# 1200x — see tools/gen_sf.py TIERS for the full layout).
HEAVY_REL = [
    "flagship_active_claimants",
    "j1_revenue_by_nation",
    "w8_sessionization",
    "dq_battery",
    "dedup_simhash_pairs",  # 500k docs — under the bar at the sf3 tier
    "j13_salted_join",  # 120M skewed rows; plain join measured 2.4x slower
]


# AMBIENT PROBES (round-9): the committed local bench has relied on
# "four runs, keep the quietest" with an eyeball justification (uniform
# drift across untouched gates) — a biased estimator whose acceptance
# decision lived in BENCH_NOTES narrative, not in the artifact (round-8
# verdict, What's wrong #2). These two fixed probes make ambience a
# MEASUREMENT: one pure-scan-bound gate and one shuffle-bound gate with
# pinned plans, timed median-of-5 BEFORE the heavy tiers and again
# AFTER the sweep, each divided by its committed reference
# (BENCH_PROBE_REF.json, recorded once on a quiet segment). A loaded
# container shows up as probe ratios >> 1 in the artifact itself;
# "ambient_flag": "degraded" is the auto-flag (threshold below). The
# probes reuse two headline gates, so they add ~10 quick runs, not new
# query surface.
PROBE_SCAN = "q1_pricing_summary"  # one scan + map-side agg, no join
PROBE_SHUFFLE = "w1_dedup_latest"  # partitionBy window: shuffle-bound
PROBE_REPEATS = 5
AMBIENT_DEGRADED_RATIO = 1.25  # either probe >25% over its reference


def _run_probes(qs, spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for label, name in (("scan", PROBE_SCAN), ("shuffle", PROBE_SHUFFLE)):
        runs = []
        for _ in range(PROBE_REPEATS):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs.append(time.time() - t0)
        out[label] = round(statistics.median(runs), 4)
    return out


# CLEAN-READ PROTOCOL (round-13): the committed driver bench
# self-flagged degraded three rounds running (r10 2.334, r11 1.516,
# r12 1.694 — every verdict-relevant number had to be cross-checked
# against separately-run clean local pairs). Instead of accepting the
# first pre-probe read, retry it a bounded number of times with a
# pause between attempts, and proceed on the first ambient-ok pair —
# or after exhausting the attempts, carrying EVERY attempt's ratios in
# the artifact. The flag then becomes a measured outcome ("the
# environment never cleared across N spaced attempts") instead of a
# recurring asterisk on a single unlucky read.
PRE_PROBE_MAX_ATTEMPTS = 3
PRE_PROBE_RETRY_WAIT_S = 60.0


def _pre_probe_with_retry(
    qs, spark, sf_dir: str, ref_path: str, sleep=time.sleep
) -> tuple[dict[str, float], list[dict]]:
    """Run the pre-phase ambient probe up to ``PRE_PROBE_MAX_ATTEMPTS``
    times, ``PRE_PROBE_RETRY_WAIT_S`` apart, returning the first
    attempt whose worst phase-matched ratio clears the degraded
    threshold (or the last attempt if none does) plus the full attempt
    log for the artifact. Bootstrap runs (no recorded floor yet) pass
    immediately — there is nothing to compare against."""
    ref: dict = {}
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
    attempts: list[dict] = []
    pre: dict[str, float] = {}
    for i in range(PRE_PROBE_MAX_ATTEMPTS):
        pre = _run_probes(qs, spark, sf_dir)
        ratios = {}
        for k in ("scan", "shuffle"):
            floor = ref.get(f"{k}_pre")
            ratios[k] = (
                round(pre[k] / min(pre[k], floor), 3) if floor else 1.0
            )
        worst = max(ratios.values())
        attempts.append(
            {"probe": pre, "ratios": ratios, "worst_ratio": worst}
        )
        if worst <= AMBIENT_DEGRADED_RATIO:
            break
        if i < PRE_PROBE_MAX_ATTEMPTS - 1:
            sleep(PRE_PROBE_RETRY_WAIT_S)
    return pre, attempts


def _ambient_block(
    pre: dict,
    post: dict,
    ref_path: str,
    mid: dict | None = None,
    pre_attempts: list[dict] | None = None,
) -> dict:
    """Assemble the artifact's ambience record.

    References are PHASE-MATCHED: the pre-probe (right after the
    3-query warm-up) compares against a pre-phase floor and the
    post-probe (end of the run) against a post-phase floor. The
    round-9 calibration runs showed why: on a byte-identical, quiet
    machine the same probe gate reads ~2x slower at run start than at
    run end — Hotspot keeps compiling Spark's codegen paths across
    the whole bench — so a single shared reference would conflate JVM
    warm-up with machine load and flag every healthy run. Each floor
    is the MINIMUM ever observed for its phase; the file self-updates
    downward (a new quiet floor is evidence, never noise), so ratios
    are always multiples-of-quiet and a loaded segment reads as
    ratios >> 1 in BOTH phases. Bootstraps (and is flagged as such)
    on first run.

    ``mid`` is the round-11 BETWEEN-TIER probe (after the sf3 LLM
    tier, before the sf10 relational tier): round 10's driver run
    flagged itself degraded at worst_ratio 2.334 with only the
    bracketing pre/post pair, leaving no way to localize WHICH heavy
    segment absorbed the load. With the mid probe every heavy segment
    is bracketed — pre↔mid localizes a spike to the sf3 tier,
    mid↔post to sf10 + the headline sweep. Mid gets its own
    phase-matched floor (the JIT is warm by then, so its quiet floor
    sits near post's, not pre's)."""
    block: dict = {
        "probe_pre": pre,
        "probe_post": post,
        "scan_gate": PROBE_SCAN,
        "shuffle_gate": PROBE_SHUFFLE,
    }
    if pre_attempts is not None:
        # the clean-read protocol's evidence trail: one entry per
        # pre-probe attempt (ratios vs the floors on file at run
        # start). len > 1 means the first read was ambient-degraded
        # and the run waited for the environment to clear (or proved
        # it never did).
        block["pre_probe_attempts"] = pre_attempts
    observed = {
        "scan_pre": pre["scan"],
        "shuffle_pre": pre["shuffle"],
        "scan_post": post["scan"],
        "shuffle_post": post["shuffle"],
    }
    if mid is not None:
        block["probe_mid"] = mid
        observed["scan_mid"] = mid["scan"]
        observed["shuffle_mid"] = mid["shuffle"]
    ref: dict = {}
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
    if not all(k in ref for k in observed):
        block["bootstrapped_reference"] = True
    lowered = {
        k: round(min(v, ref.get(k, v)), 4) for k, v in observed.items()
    }
    if any(lowered.get(k) != ref.get(k) for k in lowered):
        out_ref = dict(lowered)
        out_ref["recorded_note"] = (
            "phase-matched quiet floors (min ever observed per phase); "
            "self-updates downward — see _ambient_block"
        )
        with open(ref_path, "w") as f:
            json.dump(out_ref, f, indent=2, sort_keys=True)
            f.write("\n")
    ratios = {
        k: round(observed[k] / lowered[k], 3) for k in observed
    }
    block["reference"] = lowered
    block["ratios"] = ratios
    worst = max(ratios.values())
    block["worst_ratio"] = worst
    block["flag"] = "degraded" if worst > AMBIENT_DEGRADED_RATIO else "ok"
    return block


# The driver captures only the LAST ~2000 chars of stdout; round 6's
# line outgrew that (48 gates + two heavy tiers) and the official
# artifact recorded "parsed": null. The final line is therefore built
# by build_stdout_line() under a hard budget: full per-query detail
# goes to BENCH_DETAIL.json, and the printed line keeps the summary
# plus as many per-query entries (largest first) as fit.
STDOUT_BUDGET = 1850  # headroom under the driver's 2000-char tail


def build_stdout_line(out_full: dict, budget: int = STDOUT_BUDGET) -> str:
    """Compact one-line JSON summary guaranteed to fit `budget` chars.

    Keeps metric/value/unit/sf, heavy tier totals + heavy per-query,
    then fills "queries" with headline gates in descending-time order
    until the budget would be exceeded. "queries_omitted" records how
    many gates were dropped from stdout (all of them are always in
    BENCH_DETAIL.json).
    """
    line: dict = {
        "metric": out_full["metric"],
        "value": out_full["value"],
        "unit": out_full["unit"],
        "sf": out_full["sf"],
        "detail_file": "BENCH_DETAIL.json",
    }
    if "ambient" in out_full:
        amb = out_full["ambient"]
        line["ambient"] = {
            "worst_ratio": amb["worst_ratio"],
            "flag": amb["flag"],
        }
    if "heavy" in out_full:
        line["heavy"] = {
            tier: {"value": h["value"], "queries": h["queries"]}
            for tier, h in out_full["heavy"].items()
        }
    if "build" in out_full:
        line["build"] = out_full["build"]["queries"]
    timings = out_full["queries"]
    # Reserve space for the queries_omitted field before filling.
    line["queries_omitted"] = len(timings)
    line["queries"] = {}

    def _len() -> int:
        return len(json.dumps(line, separators=(",", ":")))

    for name in sorted(timings, key=lambda k: (-timings[k], k)):
        line["queries"][name] = timings[name]
        if _len() > budget:
            del line["queries"][name]
            break
    line["queries_omitted"] = len(timings) - len(line["queries"])
    if line["queries_omitted"] == 0:
        del line["queries_omitted"]
    s = json.dumps(line, separators=(",", ":"))
    # Heavy dict itself could in principle outgrow the budget; degrade
    # to tier totals only rather than emit an unparseable tail.
    if len(s) > budget and "heavy" in line:
        line["heavy"] = {t: {"value": h["value"]} for t, h in line["heavy"].items()}
        s = json.dumps(line, separators=(",", ":"))
    return s


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from etl_reporting_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warm-up: JVM, codegen, parquet footer reads across every table
    # the headline queries touch.
    qs["q1_pricing_summary"](spark, sf_dir).count()
    qs["w1_dedup_latest"](spark, sf_dir).count()
    qs["text_quality_scores"](spark, sf_dir).count()

    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_PROBE_REF.json"
    )

    # Ambient probe, phase 1: right after warm-up, before any heavy
    # work — the cleanest read of what the machine is doing to us.
    # Retried (bounded, spaced) until ambient-ok; every attempt's
    # ratios land in the artifact (clean-read protocol, round-13).
    probe_pre, pre_attempts = _pre_probe_with_retry(
        qs, spark, sf_dir, ref_path
    )

    # Heavy tiers run FIRST (right after warm-up): the A/B data in
    # BENCH_NOTES.md measured a ~10% JVM-aging tax with rising
    # variance on queries timed after the full 45-gate sweep — the
    # regression instrument gets the young, quiet heap.
    heavy: dict[str, dict] | None = None
    probe_mid: dict | None = None
    if os.environ.get("SPARK_GRAFT_HEAVY", "1") != "0":
        from tools.gen_sf import ensure_tier

        repeats_heavy = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS_HEAVY", "2"))
        # sf3 gates scatter ~±12% run-to-run at min-of-2 (BENCH_NOTES
        # round-6 A/A); min-of-3 there before a single-gate delta can
        # be read as real. Expect a one-time few-% step-DOWN on sf3
        # numbers vs the min-of-2 rounds (min of more samples).
        # round-8: sf10 joins min-of-3 too — the r7 driver artifact
        # showed j13_salted_join at 2.3x its same-commit local twin
        # (a cold-tail outlier min-of-2 can't absorb); same fix that
        # retired round 6's phantom sf3 +17%.
        tier_repeats = {"sf3": max(repeats_heavy, 3), "sf10": max(repeats_heavy, 3)}
        heavy = {}
        for tier, names in (("sf3", HEAVY_LLM), ("sf10", HEAVY_REL)):
            tier_dir = ensure_tier(spark, tier)
            tq: dict[str, float] = {}
            for name in names:
                if name not in qs:
                    continue
                runs = []
                for _ in range(tier_repeats[tier]):
                    spark.catalog.clearCache()  # cold: no cross-run plan-cache reuse
                    t0 = time.time()
                    qs[name](spark, tier_dir).count()
                    runs.append(time.time() - t0)
                tq[name] = round(min(runs), 3)
            spark.catalog.clearCache()
            heavy[tier] = {
                "dir": tier_dir,
                "estimator": f"min of {tier_repeats[tier]}",
                "value": round(sum(tq.values()), 3),
                "queries": tq,
            }
            if tier == "sf3":
                # Ambient probe, BETWEEN the heavy tiers: brackets
                # each heavy segment individually (see _ambient_block)
                probe_mid = _run_probes(qs, spark, sf_dir)

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)

    build: dict[str, float] = {}
    for name in BUILD_GATES:
        if name not in qs:
            continue
        spark.catalog.clearCache()
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        build[name] = round(time.time() - t0, 3)

    # Ambient probe, phase 2: after the sweep — a segment that got
    # loaded mid-run shows as post-ratios drifting off the pre-ratios.
    probe_post = _run_probes(qs, spark, sf_dir)

    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "ambient": _ambient_block(
            probe_pre,
            probe_post,
            ref_path,
            mid=probe_mid,
            pre_attempts=pre_attempts,
        ),
    }
    if build:
        out["build"] = {
            "estimator": "single cold run (index build + serve)",
            "value": round(sum(build.values()), 3),
            "queries": build,
        }
    if heavy is not None:
        out["heavy"] = heavy

    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")

    print(build_stdout_line(out))


if __name__ == "__main__":
    main()
