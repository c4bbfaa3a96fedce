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
3. (round-12, from the round-11 red cell) DECIMAL in a FINAL output
   column. The driver's hasher canonicalizes Spark and DuckDB decimal
   representations differently, so the only DECIMAL-emitting gate in
   the round-11 window (`wap_hidden_partitioning`) was the window's
   only hash failure despite byte-identical values. Rule — "the float
   convention": every oracle's final SELECT may emit only
   {BIGINT, INTEGER, DOUBLE, VARCHAR, DATE, TIMESTAMP, BOOLEAN}.
   JSON was grandfathered through round 12 and is banned since
   round 13 (see ALLOWED_FINAL_TYPES below) — serialize JSON finals
   to VARCHAR on both twins. DECIMAL/HUGEINT/anything
   exotic must be CAST before the final projection. Checked
   mechanically: DuckDB ``DESCRIBE (<oracle>)`` over the sf0.001
   views — metadata-only, no execution, no text parsing.

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


#: The float convention. Every final output column of every oracle
#: must DESCRIBE to one of these DuckDB types; the Spark twin aliases
#: and casts to the matching Spark type. DECIMAL is banned in finals
#: (round-11 `wap_hidden_partitioning` hash-red: values byte-identical,
#: hashes divergent). JSON is banned too (round-13; it was
#: grandfathered through round 12): it happened to be green only
#: because both engines serialized to strings — the same latent
#: cross-engine canonicalization class as DECIMAL. Zero exceptions is
#: the point of a convention; serialize JSON finals to VARCHAR on both
#: twins.
ALLOWED_FINAL_TYPES = frozenset(
    {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP",
     "BOOLEAN"}
)

_TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def lint_final_types(
    oracles: dict[str, str], sf_dir: str = "/root/testdata/sf0.001"
) -> list[str]:
    """DESCRIBE every oracle in DuckDB (metadata only — the query is
    planned, not run) and reject any final column whose type is
    outside ALLOWED_FINAL_TYPES."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in _TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )
    problems: list[str] = []
    for name, sql in oracles.items():
        try:
            desc = con.execute(
                f"DESCRIBE ({sql.rstrip().rstrip(';')})"
            ).fetchall()
        except Exception as e:  # noqa: BLE001
            problems.append(
                f"{name}: DESCRIBE failed — {type(e).__name__}: "
                f"{str(e)[:200]}"
            )
            continue
        for col, typ, *_ in desc:
            if typ not in ALLOWED_FINAL_TYPES:
                problems.append(
                    f"{name}: final column {col!r} is {typ} — the float "
                    "convention allows only "
                    f"{sorted(ALLOWED_FINAL_TYPES)} in a final SELECT; "
                    "CAST it (DECIMAL finals hash-diverge across "
                    "engines: round-11 wap_hidden_partitioning)"
                )
    return problems


def main() -> int:
    from etl_reporting_spark.plans.oracles import ORACLE_SQL

    problems: list[str] = []
    for name, sql in ORACLE_SQL.items():
        problems.extend(lint_oracle(name, sql))
    problems.extend(lint_final_types(ORACLE_SQL))
    for p in problems:
        print(p)
    print(f"{len(ORACLE_SQL)} oracles linted, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
