"""Full-surface physical-plan audit: every gate's executed plan must
be free of scale anti-patterns (see tools/plan_audit.py). A new
cartesian product, row-at-a-time Python UDF, interior global sort, or
un-allowlisted nested-loop join anywhere in the 90-query surface
fails this test, not just the judge's eyeball pass."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def test_every_gate_plan_is_clean(spark, sf_dir):
    import __spark_entry__ as entrymod
    from tools.plan_audit import audit_plan, audit_shuffle_budget

    qs = entrymod.queries()
    failures = {}
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        df.count()  # finalize AQE
        plan = df._jdf.queryExecution().executedPlan().toString()
        problems = audit_plan(name, plan) + audit_shuffle_budget(name, df)
        if problems:
            failures[name] = problems
    assert not failures, f"plan anti-patterns: {failures}"


def test_extra_shuffle_trips_the_budget(spark, sf_dir):
    """The budget is a live tripwire, not documentation: a deliberate
    redundant repartition on a budgeted gate must be flagged."""
    import __spark_entry__ as entrymod
    from tools.plan_audit import audit_shuffle_budget, count_shuffle_exchanges

    qs = entrymod.queries()
    df = qs["j1_revenue_by_nation"](spark, sf_dir)
    df.count()
    base = count_shuffle_exchanges(df)
    assert audit_shuffle_budget("j1_revenue_by_nation", df) == []

    mutated = qs["j1_revenue_by_nation"](spark, sf_dir).repartition(7)
    mutated.count()
    assert count_shuffle_exchanges(mutated) > base
    problems = audit_shuffle_budget("j1_revenue_by_nation", mutated)
    assert problems and "budget" in problems[0]
