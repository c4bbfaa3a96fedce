"""The oracle-determinism lint must stay green: every DuckDB oracle
free of bare integer SUMs (HUGEINT drift) and unprotected far-future
timestamp literals (pandas ns overflow). See DETERMINISM.md and
tools/lint_oracles.py.
"""

from tools.lint_oracles import lint_final_types, lint_oracle


def test_all_oracles_pass_lint():
    from etl_reporting_spark.plans.oracles import ORACLE_SQL

    problems = []
    for name, sql in ORACLE_SQL.items():
        problems.extend(lint_oracle(name, sql))
    assert problems == []


def test_lint_catches_bare_sum():
    assert lint_oracle("x", "SELECT SUM(a) FROM t")
    assert not lint_oracle("x", "SELECT CAST(SUM(a) AS BIGINT) FROM t")
    assert not lint_oracle("x", "SELECT SUM(a)  -- lint: sum-ok\nFROM t")


def test_lint_catches_far_future_literal():
    bad = "SELECT TIMESTAMP '9999-12-31 00:00:00' AS exp FROM t"
    assert lint_oracle("x", bad)
    ok_str = "SELECT strftime(TIMESTAMP '9999-12-31 00:00:00', '%Y-%m-%d') FROM t"
    assert not lint_oracle("x", ok_str)
    ok_marked = bad + "  -- lint: sentinel-ok (predicate only)"
    assert not lint_oracle("x", ok_marked)


def test_all_oracles_follow_float_convention():
    """No oracle may emit DECIMAL (or any non-allowlisted exotic) in
    its FINAL SELECT — round-11's only hash-red driver cell
    (wap_hidden_partitioning) was the window's only DECIMAL-emitting
    gate, with byte-identical values. DuckDB DESCRIBE over the real
    oracles: metadata-only, no execution."""
    from etl_reporting_spark.plans.oracles import ORACLE_SQL

    assert lint_final_types(ORACLE_SQL) == []


def test_final_type_lint_rejects_planted_decimal():
    """The lint must catch the exact round-11 failure class: a final
    column typed DECIMAL (and DuckDB's bare-integer-SUM HUGEINT)."""
    planted = {
        "planted_decimal": (
            "SELECT c_mktsegment, CAST(SUM(CAST(c_acctbal AS "
            "DECIMAL(18,2))) AS DECIMAL(18,2)) AS bal "
            "FROM customer GROUP BY 1"
        ),
        "planted_hugeint": (
            "SELECT SUM(c_custkey) AS s FROM customer  -- lint: sum-ok"
        ),
        "clean_double": (
            "SELECT c_mktsegment, CAST(SUM(CAST(c_acctbal AS "
            "DECIMAL(18,2))) AS DOUBLE) AS bal "
            "FROM customer GROUP BY 1"
        ),
    }
    problems = lint_final_types(planted)
    flagged = {p.split(":", 1)[0] for p in problems}
    assert "planted_decimal" in flagged
    assert "planted_hugeint" in flagged
    assert "clean_double" not in flagged


def test_final_type_lint_rejects_planted_json():
    """Round-13: the JSON grandfather is retired — a JSON-typed final
    is the same latent cross-engine canonicalization class as DECIMAL
    (it was green only because both engines happened to serialize to
    strings). The VARCHAR-cast twin stays clean."""
    planted = {
        "planted_json": (
            "SELECT event_id, to_json(struct_pack(e := event_id)) AS d "
            "FROM events WHERE event_id < 5"
        ),
        "clean_varchar_json": (
            "SELECT event_id, CAST(to_json(struct_pack(e := event_id)) "
            "AS VARCHAR) AS d FROM events WHERE event_id < 5"
        ),
    }
    problems = lint_final_types(planted)
    flagged = {p.split(":", 1)[0] for p in problems}
    assert "planted_json" in flagged
    assert "clean_varchar_json" not in flagged


def test_driver_contract_keys_align():
    """Every queries() entry has an oracle and vice versa — a missing
    pair degrades to the weaker rows-only driver check silently."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as e

    assert set(e.queries()) == set(e.oracle_sql())
