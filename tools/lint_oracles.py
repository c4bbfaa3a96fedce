"""Cross-engine determinism lint for the DuckDB oracle SQL.

Every gate query's value hash must match between Spark and DuckDB, and
two classes of drift have bitten before (VERDICT round 1):

1. DuckDB ``SUM`` over an integer column returns HUGEINT, which the
   driver's pandas conversion renders as float — diverging from
   Spark's BIGINT. Rule: every ``SUM(`` in an oracle must be wrapped
   ``CAST(SUM(...) AS BIGINT/DOUBLE)``, unless the line carries a
   ``-- lint: sum-ok`` marker (e.g. an intermediate that is re-cast
   before reaching the output).
2. Timestamps beyond pandas' ns range (e.g. the 9999-12-31 SCD2
   sentinel) overflow the driver's toPandas. Rule: a far-future
   literal may appear only when the query also formats it to a string
   (strftime) before projecting.

Run: ``python tools/lint_oracles.py`` (exit 1 on violations).
Also enforced by tests/test_lint_oracles.py.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

_SUM_RE = re.compile(r"(CAST\s*\(\s*)?SUM\s*\(", re.IGNORECASE)
_FAR_FUTURE_RE = re.compile(r"'(9[0-9]{3})-[0-9]{2}-[0-9]{2}")


def lint_oracle(name: str, sql: str) -> list[str]:
    problems: list[str] = []
    for line_no, line in enumerate(sql.splitlines(), start=1):
        if "lint: sum-ok" in line:
            continue
        for m in _SUM_RE.finditer(line):
            if not m.group(1):
                problems.append(
                    f"{name}:{line_no}: bare SUM( — DuckDB returns HUGEINT for "
                    "integer sums; wrap CAST(SUM(...) AS BIGINT/DOUBLE) or mark "
                    "-- lint: sum-ok"
                )
    if (
        _FAR_FUTURE_RE.search(sql)
        and "strftime" not in sql
        and "lint: sentinel-ok" not in sql
    ):
        problems.append(
            f"{name}: far-future timestamp literal without strftime — "
            "overflows pandas ns datetimes in the driver gate unless it "
            "stays in predicates (mark -- lint: sentinel-ok) or is "
            "string-formatted before projection"
        )
    return problems


def main() -> int:
    from etl_reporting_spark.plans.oracles import ORACLE_SQL

    problems: list[str] = []
    for name, sql in ORACLE_SQL.items():
        problems.extend(lint_oracle(name, sql))
    for p in problems:
        print(p)
    print(f"{len(ORACLE_SQL)} oracles linted, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
