"""Registry-duplication lint (round-11 brief #2).

Three duplicate-operator incidents in two rounds motivated this:
round 9 re-implemented PII/chunking/repetition operators that already
existed under other modules, and round 10's commit 06a9135 added a
second public ``zorder_key`` in wap.py duplicating skew.py's (caught
in review, consolidated in 7b362ae). Each time the duplicate was a
PUBLIC top-level callable with a name/role that already existed — a
purely mechanical thing to detect. This lint makes the incident class
impossible to land silently:

1. **Cross-module public-callable collisions**: a top-level ``def`` /
   ``class`` name (not ``_``-prefixed) defined in MORE THAN ONE module
   across the operator-bearing packages (``llm/``, ``operators/``,
   ``functions/``, ``streaming/``, ``datafeeds/``). Re-exports
   (imports) don't count — only actual definitions. Deliberate
   same-name pairs would go in ``ALLOWED_COLLISIONS`` (empty today).
2. **Duplicate gate names**: a repeated string key inside the
   ``QUERIES`` / ``LLM_QUERIES`` dict literals (Python silently keeps
   the LAST duplicate key — a lost gate with zero error), and a
   repeated ``ORACLE_SQL["name"] = …`` / ``LLM_ORACLE_SQL["name"] = …``
   subscript assignment inside one module (silently overwrites the
   first oracle).
3. **Duplicate COVERAGE.md capability rows**: the same capability
   cell appearing twice in the Beyond-reference table (double-counted
   coverage).

AST/text only — no Spark, no imports of the linted modules; runs in
milliseconds. Run: ``python tools/lint_registry.py`` (exit 1 on
violations). Enforced by tests/test_lint_registry.py, including a
planted-duplicate self-test of each detector.
"""

from __future__ import annotations

import ast
import collections
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: packages whose top-level publics form ONE operator namespace
OPERATOR_PACKAGES = (
    "etl_reporting_spark/llm",
    "etl_reporting_spark/operators",
    "etl_reporting_spark/functions",
    "etl_reporting_spark/streaming",
    "etl_reporting_spark/datafeeds",
)

#: (name, frozenset-of-module-paths) pairs that are deliberate —
#: empty today; adding here requires saying why in a comment
ALLOWED_COLLISIONS: set[tuple[str, frozenset]] = set()

REGISTRY_LITERALS = (
    ("etl_reporting_spark/plans/queries.py", "QUERIES"),
    ("etl_reporting_spark/plans/llm_queries.py", "LLM_QUERIES"),
)

ORACLE_ASSIGN_TARGETS = (
    ("etl_reporting_spark/plans/oracles.py", "ORACLE_SQL"),
    ("etl_reporting_spark/plans/llm_oracles.py", "LLM_ORACLE_SQL"),
)

COVERAGE_MD = "COVERAGE.md"


# ------------------------------------------------ 1. callable names
def public_defs(source: str, path: str) -> list[tuple[str, str]]:
    """(name, path) for every top-level public def/class."""
    out = []
    for node in ast.parse(source).body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ) and not node.name.startswith("_"):
            out.append((node.name, path))
    return out


def find_callable_collisions(
    files: dict[str, str],
) -> list[str]:
    """``files``: module path → source text. Returns violation lines."""
    where: dict[str, list[str]] = collections.defaultdict(list)
    for path, src in sorted(files.items()):
        for name, p in public_defs(src, path):
            where[name].append(p)
    problems = []
    for name, places in sorted(where.items()):
        if len(places) > 1 and (name, frozenset(places)) not in ALLOWED_COLLISIONS:
            problems.append(
                f"public callable {name!r} defined in {len(places)} modules: "
                f"{', '.join(places)} — consolidate (import the existing "
                "one) or add an ALLOWED_COLLISIONS entry explaining why"
            )
    return problems


# ------------------------------------------------ 2. gate names
def find_dict_literal_dupes(source: str, varname: str, path: str) -> list[str]:
    """Duplicate string keys in the dict literal assigned to varname."""
    problems = []
    for node in ast.walk(ast.parse(source)):
        if not isinstance(node, (ast.Assign, ast.AnnAssign)):
            continue
        targets = node.targets if isinstance(node, ast.Assign) else [node.target]
        if not any(
            isinstance(t, ast.Name) and t.id == varname for t in targets
        ):
            continue
        value = node.value
        if not isinstance(value, ast.Dict):
            continue
        keys = [k.value for k in value.keys if isinstance(k, ast.Constant)]
        for key, n in sorted(collections.Counter(keys).items()):
            if n > 1:
                problems.append(
                    f"{path}: gate {key!r} appears {n}× in the {varname} "
                    "literal — Python keeps only the LAST, silently "
                    "dropping a gate"
                )
    return problems


def find_subscript_assign_dupes(
    source: str, varname: str, path: str
) -> list[str]:
    """Duplicate ``VAR["key"] = …`` assignments (later silently wins)."""
    counts: collections.Counter = collections.Counter()
    for node in ast.walk(ast.parse(source)):
        if not isinstance(node, ast.Assign):
            continue
        for t in node.targets:
            if (
                isinstance(t, ast.Subscript)
                and isinstance(t.value, ast.Name)
                and t.value.id == varname
                and isinstance(t.slice, ast.Constant)
            ):
                counts[t.slice.value] += 1
    return [
        f"{path}: {varname}[{k!r}] assigned {n}× — the later assignment "
        "silently overwrites the first oracle"
        for k, n in sorted(counts.items())
        if n > 1
    ]


# ------------------------------------------------ 3. COVERAGE rows
def find_coverage_row_dupes(md_text: str) -> list[str]:
    """Duplicate capability cells in the Beyond-reference table."""
    problems = []
    in_section = False
    cells: collections.Counter = collections.Counter()
    for line in md_text.splitlines():
        if line.startswith("## "):
            in_section = "Beyond-reference" in line
            continue
        if not in_section or not line.startswith("|"):
            continue
        cell = line.split("|")[1].strip()
        if cell and cell not in ("Capability", "---"):
            cells[cell] += 1
    for cell, n in sorted(cells.items()):
        if n > 1:
            problems.append(
                f"COVERAGE.md: Beyond-reference capability row {cell!r} "
                f"appears {n}× — double-counted coverage"
            )
    return problems


# ----------------------------------------------------------- driver
def run_lint(repo: str = REPO) -> list[str]:
    problems: list[str] = []
    files: dict[str, str] = {}
    for pkg in OPERATOR_PACKAGES:
        full = os.path.join(repo, pkg)
        for f in sorted(os.listdir(full)):
            if f.endswith(".py") and f != "__init__.py":
                rel = f"{pkg}/{f}"
                with open(os.path.join(full, f)) as fh:
                    files[rel] = fh.read()
    problems += find_callable_collisions(files)
    for rel, varname in REGISTRY_LITERALS:
        with open(os.path.join(repo, rel)) as fh:
            problems += find_dict_literal_dupes(fh.read(), varname, rel)
    for rel, varname in ORACLE_ASSIGN_TARGETS:
        with open(os.path.join(repo, rel)) as fh:
            problems += find_subscript_assign_dupes(fh.read(), varname, rel)
    with open(os.path.join(repo, COVERAGE_MD)) as fh:
        problems += find_coverage_row_dupes(fh.read())
    return problems


def main() -> int:
    problems = run_lint()
    for p in problems:
        print(f"LINT: {p}")
    if problems:
        print(f"{len(problems)} registry-duplication violation(s)")
        return 1
    print("registry lint clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
