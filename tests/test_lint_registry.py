"""Registry-duplication lint wired into the suite (round-11 brief #2)
— the mechanical guard against the thrice-recurred duplicate-operator
incident (r9 PII/chunking/repetition, r10 zorder_key).

Two halves: the repo must be CLEAN, and each detector must actually
FIRE on a planted duplicate (a lint that can't fail is decoration).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tools.lint_registry import (
    find_callable_collisions,
    find_coverage_row_dupes,
    find_dict_literal_dupes,
    find_subscript_assign_dupes,
    run_lint,
)


def test_repo_registries_have_no_duplicates():
    assert run_lint() == []


def test_detects_planted_cross_module_callable_duplicate():
    files = {
        "operators/skew.py": "def zorder_key(df, cols):\n    return df\n",
        "operators/wap.py": (
            "def _private_ok(x):\n    return x\n"
            "def zorder_key(df, cols, bits=16):\n    return df\n"
        ),
    }
    problems = find_callable_collisions(files)
    assert len(problems) == 1
    assert "zorder_key" in problems[0]
    assert "operators/skew.py" in problems[0]
    assert "operators/wap.py" in problems[0]


def test_private_and_single_definitions_pass():
    files = {
        "a.py": "def _helper():\n    pass\n\ndef only_here():\n    pass\n",
        "b.py": "def _helper():\n    pass\n\nclass AlsoOnlyHere:\n    pass\n",
    }
    assert find_callable_collisions(files) == []


def test_detects_planted_duplicate_gate_key():
    src = (
        "QUERIES = {\n"
        '    "q1": q1,\n'
        '    "q2": q2,\n'
        '    "q1": q1_other,\n'
        "}\n"
    )
    problems = find_dict_literal_dupes(src, "QUERIES", "x.py")
    assert len(problems) == 1 and "'q1'" in problems[0]
    assert "2×" in problems[0]


def test_detects_planted_duplicate_oracle_assignment():
    src = (
        'ORACLE_SQL["a"] = "SELECT 1"\n'
        'ORACLE_SQL["b"] = "SELECT 2"\n'
        'ORACLE_SQL["a"] = "SELECT 3"\n'
        'OTHER["a"] = "not counted"\n'
    )
    problems = find_subscript_assign_dupes(src, "ORACLE_SQL", "x.py")
    assert len(problems) == 1 and "'a'" in problems[0]


def test_detects_planted_duplicate_coverage_row():
    md = (
        "## Beyond-reference (BASELINE.json north star)\n\n"
        "| Capability | Impl | Gate |\n"
        "|---|---|---|\n"
        "| Exact dedup | `llm.dedup.exact` | `g1` |\n"
        "| PII redaction | `llm.redact` | `g2` |\n"
        "| Exact dedup | `llm.dedup2.exact` | `g3` |\n"
        "\n## Another section\n"
        "| Exact dedup | elsewhere is fine | x |\n"
    )
    problems = find_coverage_row_dupes(md)
    assert len(problems) == 1 and "Exact dedup" in problems[0]
