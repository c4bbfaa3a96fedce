"""The driver parses ONLY the last ~2000 chars of bench.py stdout.

Round 6's final JSON line outgrew that tail (48 gates + two heavy
tiers) and BENCH_r06.json recorded "parsed": null — the official
bench signal was lost. These tests pin the contract of
bench.build_stdout_line: whatever the gate count, the printed line
is valid JSON, fits the budget, and keeps the summary fields the
driver needs.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import STDOUT_BUDGET, build_stdout_line  # noqa: E402


def _fake_out(n_queries: int, heavy: bool = True) -> dict:
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(0.1 * (i % 17 + 1) for i in range(n_queries)), 3),
        "unit": "sec",
        "sf": 0.1,
        "queries": {
            f"some_rather_long_query_name_{i:03d}": round(0.1 * (i % 17 + 1), 3)
            for i in range(n_queries)
        },
    }
    if heavy:
        out["heavy"] = {
            "sf3": {
                "dir": "/root/repo/.localdata/sf3",
                "estimator": "min of 3",
                "value": 50.0,
                "queries": {f"heavy_llm_gate_{i}": 7.0 + i for i in range(7)},
            },
            "sf10": {
                "dir": "/root/repo/.localdata/sf10",
                "estimator": "min of 2",
                "value": 80.0,
                "queries": {f"heavy_rel_gate_{i}": 13.0 + i for i in range(6)},
            },
        }
    return out


def test_small_run_keeps_every_query():
    out = _fake_out(10)
    line = build_stdout_line(out)
    assert len(line) <= STDOUT_BUDGET
    parsed = json.loads(line)
    assert parsed["queries"] == out["queries"]
    assert "queries_omitted" not in parsed
    # heavy per-query retained, long dir strings dropped
    assert parsed["heavy"]["sf3"]["queries"] == out["heavy"]["sf3"]["queries"]
    assert "dir" not in parsed["heavy"]["sf3"]


def test_huge_run_still_fits_and_parses():
    for n in (48, 100, 500):
        out = _fake_out(n)
        line = build_stdout_line(out)
        assert len(line) <= STDOUT_BUDGET, (n, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == out["metric"]
        assert parsed["value"] == out["value"]
        assert parsed["sf"] == 0.1
        assert parsed["detail_file"] == "BENCH_DETAIL.json"
        kept = parsed["queries"]
        omitted = parsed.get("queries_omitted", 0)
        assert len(kept) + omitted == n
        # the slowest gates are the ones kept
        if omitted:
            kept_min = min(kept.values())
            dropped = [v for k, v in out["queries"].items() if k not in kept]
            assert max(dropped) <= kept_min + 1e-9


def test_no_heavy_tier():
    out = _fake_out(48, heavy=False)
    line = build_stdout_line(out)
    parsed = json.loads(line)
    assert "heavy" not in parsed
    assert len(line) <= STDOUT_BUDGET


def test_tiny_budget_degrades_heavy_to_totals():
    out = _fake_out(48)
    line = build_stdout_line(out, budget=400)
    parsed = json.loads(line)
    # even at an absurd budget the line parses and keeps the headline value
    assert parsed["value"] == out["value"]
    assert parsed["heavy"]["sf3"] == {"value": 50.0}


def test_ambient_block_bootstrap_flag_and_floor_updates(tmp_path):
    """Round-9 ambient gate: first call bootstraps the phase-matched
    floors (and says so), a loaded run flags degraded, and a new
    quiet floor self-updates the reference downward."""
    import json

    from bench import _ambient_block

    ref = str(tmp_path / "ref.json")
    pre = {"scan": 0.50, "shuffle": 0.40}
    post = {"scan": 0.25, "shuffle": 0.20}
    b1 = _ambient_block(pre, post, ref)
    assert b1["bootstrapped_reference"] is True
    assert b1["flag"] == "ok" and b1["worst_ratio"] == 1.0

    # loaded run: pre-probes 1.5x the floors -> degraded, floors keep
    loaded_pre = {"scan": 0.75, "shuffle": 0.60}
    b2 = _ambient_block(loaded_pre, post, ref)
    assert "bootstrapped_reference" not in b2
    assert b2["flag"] == "degraded"
    assert b2["ratios"]["scan_pre"] == 1.5
    assert json.load(open(ref))["scan_pre"] == 0.50  # not raised

    # quieter run: floors self-update downward, ratios vs NEW floor
    quiet_pre = {"scan": 0.40, "shuffle": 0.32}
    b3 = _ambient_block(quiet_pre, post, ref)
    assert b3["flag"] == "ok" and b3["ratios"]["scan_pre"] == 1.0
    assert json.load(open(ref))["scan_pre"] == 0.40


def test_stdout_line_carries_ambient_summary():
    from bench import build_stdout_line
    import json

    out = {
        "metric": "m", "value": 1.0, "unit": "sec", "sf": 0.1,
        "queries": {"q": 1.0},
        "ambient": {"worst_ratio": 1.31, "flag": "degraded",
                    "ratios": {}, "probe_pre": {}, "probe_post": {}},
    }
    line = json.loads(build_stdout_line(out))
    assert line["ambient"] == {"worst_ratio": 1.31, "flag": "degraded"}


def test_pre_probe_retry_proceeds_on_first_clean_pair(tmp_path):
    """Clean-read protocol (round-13): a degraded first pre-probe read
    triggers spaced retries; the run proceeds on the first ambient-ok
    attempt and the artifact carries EVERY attempt's ratios."""
    import json as _json

    import bench as bench_mod
    from bench import _pre_probe_with_retry

    ref = tmp_path / "ref.json"
    ref.write_text(
        _json.dumps({"scan_pre": 1.0, "shuffle_pre": 1.0})
    )
    # attempt 1: loaded (2x the floor); attempt 2: quiet
    seq = iter(
        [
            {"scan": 2.0, "shuffle": 2.0},
            {"scan": 1.0, "shuffle": 1.05},
        ]
    )
    slept: list[float] = []
    orig = bench_mod._run_probes
    bench_mod._run_probes = lambda qs, spark, sf_dir: next(seq)
    try:
        pre, attempts = _pre_probe_with_retry(
            None, None, "x", str(ref), sleep=slept.append
        )
    finally:
        bench_mod._run_probes = orig
    assert pre == {"scan": 1.0, "shuffle": 1.05}
    assert len(attempts) == 2
    assert attempts[0]["worst_ratio"] == 2.0
    assert attempts[1]["worst_ratio"] <= 1.25
    assert slept == [bench_mod.PRE_PROBE_RETRY_WAIT_S]


def test_pre_probe_retry_exhausts_and_carries_evidence(tmp_path):
    """If the environment never clears, the run proceeds after the
    bounded attempts with the full evidence trail (the flag becomes a
    measured outcome, not a one-read asterisk)."""
    import json as _json

    import bench as bench_mod
    from bench import _pre_probe_with_retry

    ref = tmp_path / "ref.json"
    ref.write_text(
        _json.dumps({"scan_pre": 1.0, "shuffle_pre": 1.0})
    )
    calls = {"n": 0}

    def loaded(qs, spark, sf_dir):
        calls["n"] += 1
        return {"scan": 3.0, "shuffle": 3.0}

    slept: list[float] = []
    orig = bench_mod._run_probes
    bench_mod._run_probes = loaded
    try:
        pre, attempts = _pre_probe_with_retry(
            None, None, "x", str(ref), sleep=slept.append
        )
    finally:
        bench_mod._run_probes = orig
    assert calls["n"] == bench_mod.PRE_PROBE_MAX_ATTEMPTS
    assert len(attempts) == bench_mod.PRE_PROBE_MAX_ATTEMPTS
    assert all(a["worst_ratio"] == 3.0 for a in attempts)
    assert len(slept) == bench_mod.PRE_PROBE_MAX_ATTEMPTS - 1
    assert attempts[0]["ratios"] == {"scan": 3.0, "shuffle": 3.0}
    # bootstrap (no floors yet): the first read passes immediately
    bench_mod._run_probes = loaded
    try:
        _, attempts2 = _pre_probe_with_retry(
            None, None, "x", str(tmp_path / "missing.json"),
            sleep=slept.append,
        )
    finally:
        bench_mod._run_probes = orig
    assert len(attempts2) == 1 and attempts2[0]["worst_ratio"] == 1.0


def test_ambient_block_carries_pre_attempts(tmp_path):
    from bench import _ambient_block

    pre = {"scan": 1.0, "shuffle": 1.0}
    post = {"scan": 1.0, "shuffle": 1.0}
    trail = [{"probe": pre, "ratios": {"scan": 1.0, "shuffle": 1.0}, "worst_ratio": 1.0}]
    block = _ambient_block(
        pre, post, str(tmp_path / "ref.json"), pre_attempts=trail
    )
    assert block["pre_probe_attempts"] == trail
