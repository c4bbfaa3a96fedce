"""Compare two bench.py artifacts: per-query deltas with noise
annotation, separating the heavy (cold, trustworthy) section from the
sf0.1 sweep (warm medians, scheduling-noise-dominated — see
BENCH_NOTES.md).

Usage:
    python tools/bench_compare.py BENCH_r04_local.json BENCH_r05_local.json

Sub-second sweep queries are annotated rather than alarmed: the A/B
study showed their round-over-round medians move 10-40% with no code
change. Heavy-tier deltas beyond NOISE_FRAC are flagged as real.
"""

from __future__ import annotations

import json
import sys

NOISE_FRAC = 0.15  # heavy tiers: cold min-of-N; more than this is real
SWEEP_FLOOR_SEC = 1.0  # sweep queries under this are noise-dominated


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _diff(old: dict, new: dict, floor: float, noise: float, label: str) -> int:
    shared = sorted(set(old) & set(new))
    if not shared:
        return 0
    flagged = 0
    print(f"\n== {label}: {len(shared)} shared queries "
          f"(old total {sum(old[q] for q in shared):.2f}s, "
          f"new total {sum(new[q] for q in shared):.2f}s)")
    for q in sorted(shared, key=lambda q: new[q] - old[q], reverse=True):
        a, b = old[q], new[q]
        delta = b - a
        frac = delta / a if a else 0.0
        if a < floor and b < floor:
            tag = "  (sub-floor: noise-dominated, not comparable)"
        elif abs(frac) <= noise:
            tag = ""
        else:
            tag = "  <-- REAL CHANGE" if delta > 0 else "  (improvement)"
            if delta > 0:
                flagged += 1
        if tag or abs(frac) > noise / 2:
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({frac:+.0%}){tag}")
    return flagged


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    flagged = 0
    for tier in sorted(set(old.get("heavy", {})) & set(new.get("heavy", {}))):
        flagged += _diff(
            old["heavy"][tier]["queries"],
            new["heavy"][tier]["queries"],
            floor=0.0,
            noise=NOISE_FRAC,
            label=f"heavy {tier} (cold min — regressions here are real)",
        )
    _diff(
        old.get("queries", {}),
        new.get("queries", {}),
        floor=SWEEP_FLOOR_SEC,
        noise=0.4,
        label="sf0.1 sweep (warm medians — advisory only)",
    )
    if flagged:
        print(f"\n{flagged} heavy-tier regression(s) above the noise band")
    return 1 if flagged else 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # piped into head — not an error
        raise SystemExit(0)
