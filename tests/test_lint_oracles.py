"""The oracle-determinism lint must stay green: every DuckDB oracle
free of bare integer SUMs (HUGEINT drift) and unprotected far-future
timestamp literals (pandas ns overflow). See DETERMINISM.md and
tools/lint_oracles.py.
"""

from tools.lint_oracles import lint_oracle


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


def test_driver_contract_keys_align():
    """Every queries() entry has an oracle and vice versa — a missing
    pair degrades to the weaker rows-only driver check silently."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as e

    assert set(e.queries()) == set(e.oracle_sql())
