"""SQL DML routed onto the WAP merge ladder (round-10 brief #2).

What must hold:
- the reference-shaped MERGE text (connector/snowpark_connector.py:
  919-1004: target/source aliases, equi-ON, UPDATE SET from source,
  INSERT(cols) VALUES(source.cols), NOT MATCHED BY SOURCE + cond →
  DELETE) executes with the SAME result and metrics as the
  DataFrame-API merge on identical inputs;
- branch conditions, templating, expression RHS, CASE inside
  expressions, absent branches, and INSERT * all behave per SQL;
- DELETE FROM routes to deletion vectors; UPDATE rewrites only the
  touched partitions; both return accurate rows_affected;
- unsupported constructs fail loudly with named errors, never
  silently alter data.

Runs over both storage backends (see conftest).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("wap_storage_backend")

from pyspark.sql import functions as F

from etl_reporting_spark.operators.merge import merge_upsert
from etl_reporting_spark.operators.sql_dml import (
    DmlResult,
    SqlDmlError,
    execute_dml,
    execute_dml_script,
)
from etl_reporting_spark.operators.wap import (
    create_partitioned_wap_table,
    register_wap_view,
)


@pytest.fixture()
def fact(spark, tmp_path):
    rows = [
        (i, f"2026-01-{1 + i % 3:02d}", float(i * 10), "open")
        for i in range(1, 13)
    ]
    df = spark.createDataFrame(
        rows, "id long, ds string, amount double, status string"
    )
    t = create_partitioned_wap_table(spark, str(tmp_path / "fact"), df, ["ds"])
    register_wap_view(spark, t.path, "fact_sql", dml=True)
    return t


def _delta(spark):
    return spark.createDataFrame(
        [
            (4, "2026-01-02", 999.0, "upd"),     # matched -> update
            (100, "2026-01-02", 1.0, "new"),     # not matched -> insert
        ],
        "id long, ds string, amount double, status string",
    )


REF_SHAPED_MERGE = """
MERGE INTO fact_sql AS target
USING delta_src AS source
ON target.id = source.id AND target.ds = source.ds
WHEN MATCHED THEN UPDATE SET amount = source.amount, status = source.status
WHEN NOT MATCHED THEN INSERT (id, ds, amount, status)
  VALUES (source.id, source.ds, source.amount, source.status)
"""


def test_reference_shaped_merge_matches_dataframe_api(spark, tmp_path, fact):
    """The exact statement shape _build_merge_sql emits must produce
    the same rows AND the same mutation metrics as merge_upsert on
    the same inputs — the counts come from the same classifier, so
    this is an identity, not a coincidence."""
    delta = _delta(spark)
    delta.createOrReplaceTempView("delta_src")

    # DataFrame-API twin on a second table
    t2 = create_partitioned_wap_table(
        spark, str(tmp_path / "fact2"), fact.read(version=1), ["ds"]
    )
    api = merge_upsert(
        None, delta, ["id", "ds"], backend="wap",
        spark=spark, target_table=t2.path, partition_by=["ds"],
    )

    res = execute_dml(spark, REF_SHAPED_MERGE)
    assert (res.rows_updated, res.rows_inserted) == (
        api.rows_updated, api.rows_inserted,
    ) == (1, 1)
    assert sorted(map(tuple, fact.read().collect())) == sorted(
        map(tuple, t2.read().collect())
    )
    got = {r["id"]: (r["amount"], r["status"]) for r in fact.read().collect()}
    assert got[4] == (999.0, "upd") and got[100] == (1.0, "new")
    assert len(got) == 13


def test_merge_all_three_branches_and_conditions(spark, fact):
    """MATCHED AND <cond>, NOT MATCHED AND <cond>, NOT MATCHED BY
    SOURCE AND (<cond>) THEN DELETE — the full reference grammar in
    one statement, with a CASE expression inside an assignment (the
    clause scanner must not split on its WHEN/THEN)."""
    spark.createDataFrame(
        [
            (1, "2026-01-02", 5.0, "upd"),    # matched, cond true
            (4, "2026-01-02", -1.0, "upd"),   # matched, cond FALSE -> keep
            (100, "2026-01-02", 50.0, "new"), # not matched, cond true
            (101, "2026-01-02", 0.5, "new"),  # not matched, cond FALSE -> drop
        ],
        "id long, ds string, amount double, status string",
    ).createOrReplaceTempView("delta_src")

    res = execute_dml(
        spark,
        """
        MERGE INTO fact_sql AS t USING delta_src AS s
        ON t.id = s.id AND t.ds = s.ds
        WHEN MATCHED AND s.amount > 0 THEN UPDATE SET
          amount = s.amount * 2,
          status = CASE WHEN s.amount > 4 THEN 'big' ELSE 'small' END
        WHEN NOT MATCHED AND s.amount >= 1 THEN
          INSERT (id, ds, amount, status) VALUES (s.id, s.ds, s.amount * 2,
            CASE WHEN s.amount > 4 THEN 'big' ELSE 'small' END)
        WHEN NOT MATCHED BY SOURCE AND (t.id = 10) THEN DELETE
        """,
    )
    assert (res.rows_updated, res.rows_inserted, res.rows_deleted) == (1, 1, 1)
    got = {r["id"]: (r["amount"], r["status"]) for r in fact.read().collect()}
    assert got[1] == (10.0, "big")       # updated via expression RHS
    assert got[4] == (40.0, "open")      # matched but condition false
    assert got[100] == (100.0, "big")    # inserted via the same expressions
    assert 101 not in got                # insert condition false
    assert 10 not in got                 # NMBS delete (in touched partition)
    # NMBS delete scope: only TOUCHED partitions are candidates
    assert 7 in got and got[7] == (70.0, "open")


def test_merge_condition_on_rewritten_source_col_sees_pre_value(spark, fact):
    """`WHEN MATCHED AND source.amount > 40` with `SET amount =
    source.amount * 2` — the condition must see the PRE-assignment
    source value (SQL semantics), exercised via the __pre_ shadow."""
    spark.createDataFrame(
        [(4, "2026-01-02", 50.0, "x"), (7, "2026-01-01", 30.0, "x")],
        "id long, ds string, amount double, status string",
    ).createOrReplaceTempView("delta_src")
    res = execute_dml(
        spark,
        """
        MERGE INTO fact_sql AS t USING delta_src AS s
        ON t.id = s.id AND t.ds = s.ds
        WHEN MATCHED AND s.amount > 40 THEN UPDATE SET amount = s.amount * 2
        """,
    )
    assert res.rows_updated == 1  # only id=4 (50 > 40); NOT doubled-then-tested
    got = {r["id"]: r["amount"] for r in fact.read().collect()}
    assert got[4] == 100.0 and got[7] == 70.0


def test_merge_absent_branches_do_nothing(spark, fact):
    """No NOT MATCHED clause -> source-only rows are NOT inserted; no
    MATCHED clause -> matched rows are NOT updated."""
    spark.createDataFrame(
        [(1, "2026-01-02", 1.0, "x"), (500, "2026-01-01", 1.0, "x")],
        "id long, ds string, amount double, status string",
    ).createOrReplaceTempView("delta_src")
    res = execute_dml(
        spark,
        """
        MERGE INTO fact_sql t USING delta_src s ON t.id = s.id AND t.ds = s.ds
        WHEN MATCHED THEN UPDATE SET amount = s.amount
        """,
    )
    assert (res.rows_updated, res.rows_inserted) == (1, 0)
    assert fact.read().count() == 12  # 500 not inserted

    res2 = execute_dml(
        spark,
        """
        MERGE INTO fact_sql t USING delta_src s ON t.id = s.id AND t.ds = s.ds
        WHEN NOT MATCHED THEN INSERT (id, ds, amount, status)
          VALUES (s.id, s.ds, s.amount, s.status)
        """,
    )
    assert (res2.rows_updated, res2.rows_inserted) == (0, 1)
    got = {r["id"]: r["amount"] for r in fact.read().collect()}
    assert got[1] == 1.0 and got[500] == 1.0  # first merge's update held


def test_merge_insert_star_and_subquery_source(spark, fact):
    """INSERT * + a parenthesized USING subquery + templating."""
    spark.createDataFrame(
        [(300, "2026-01-03", 3.0, "new"), (301, "2026-01-03", -3.0, "new")],
        "id long, ds string, amount double, status string",
    ).createOrReplaceTempView("stage_rows")
    res = execute_dml(
        spark,
        """
        MERGE INTO fact_sql AS t
        USING (SELECT * FROM stage_rows WHERE amount > {{MIN_AMOUNT}}) AS s
        ON t.id = s.id AND t.ds = s.ds
        WHEN NOT MATCHED THEN INSERT *
        """,
        substitutions={"MIN_AMOUNT": "0"},
    )
    assert res.rows_inserted == 1
    got = {r["id"] for r in fact.read().collect()}
    assert 300 in got and 301 not in got


def test_delete_from_routes_to_deletion_vectors(spark, fact):
    v_before = fact.current_version()
    res = execute_dml(spark, "DELETE FROM fact_sql WHERE id % 5 = 0")
    assert isinstance(res, DmlResult)
    assert res.operation == "delete" and res.rows_affected == 2  # ids 5, 10
    assert res.version == v_before + 1
    assert sorted(r["id"] for r in fact.read().collect()) == [
        1, 2, 3, 4, 6, 7, 8, 9, 11, 12,
    ]
    # deletion vectors, not rewrites: the delete commit records DVs
    assert fact.latest_record().get("delete_vectors")


def test_update_rewrites_only_touched_partitions(spark, fact):
    roots_before = set(fact.live_commit_roots())
    res = execute_dml(
        spark,
        "UPDATE fact_sql SET amount = amount + 0.5, status = 'audited' "
        "WHERE ds = '2026-01-02' AND id <= 4",
    )
    assert res.operation == "update" and res.rows_affected == 2  # ids 1, 4
    got = {r["id"]: (r["amount"], r["status"]) for r in fact.read().collect()}
    assert got[1] == (10.5, "audited") and got[4] == (40.5, "audited")
    assert got[7] == (70.0, "open")           # same partition, cond false
    assert got[2] == (20.0, "open")           # untouched partition
    # only ds=2026-01-02 was rewritten; other partitions kept their roots
    rec = fact.latest_record()
    assert rec["touched"] == ["ds=2026-01-02"]
    assert len(set(fact.live_commit_roots()) - roots_before) == 1

    # no-match UPDATE is a no-op commit-wise
    v = fact.current_version()
    res2 = execute_dml(
        spark, "UPDATE fact_sql SET amount = 0 WHERE id = 99999"
    )
    assert res2.rows_affected == 0 and fact.current_version() == v


def test_update_assignments_see_pre_update_values(spark, fact):
    """SET a = b, b = a must SWAP (both RHS evaluated over pre-update
    row), and the assignment keeps each column's type."""
    execute_dml(
        spark,
        "UPDATE fact_sql SET amount = id, id = amount WHERE id = 3",
    )
    rows = {
        (r["id"], r["amount"]) for r in fact.read().collect()
    }
    assert (30, 3.0) in rows and (3, 30.0) not in rows
    assert dict(fact.read().dtypes)["id"] == "bigint"  # cast held


def test_dml_script_multi_statement(spark, fact):
    spark.createDataFrame(
        [(700, "2026-01-01", 7.0, "new")],
        "id long, ds string, amount double, status string",
    ).createOrReplaceTempView("delta_src")
    results = execute_dml_script(
        spark,
        """
        -- nightly maintenance script
        MERGE INTO fact_sql t USING delta_src s ON t.id = s.id AND t.ds = s.ds
        WHEN NOT MATCHED THEN INSERT (id, ds, amount, status)
          VALUES (s.id, s.ds, s.amount, s.status);
        DELETE FROM fact_sql WHERE status = 'open' AND id > 11;
        """,
    )
    assert len(results) == 2
    assert results[0].rows_inserted == 1
    assert results[1].rows_affected == 1  # id 12
    ids = {r["id"] for r in fact.read().collect()}
    assert 700 in ids and 12 not in ids


def test_unsupported_constructs_fail_loudly(spark, fact):
    v = fact.current_version()
    cases = [
        # non-equi ON
        ("MERGE INTO fact_sql t USING fact_sql s ON t.id > s.id "
         "WHEN MATCHED THEN UPDATE SET amount = s.amount", "ON conjunct"),
        # matched-delete branch
        ("MERGE INTO fact_sql t USING fact_sql s ON t.id = s.id "
         "WHEN MATCHED THEN DELETE", "matched-delete"),
        # diverging UPDATE/INSERT expressions
        ("MERGE INTO fact_sql t USING fact_sql s ON t.id = s.id "
         "WHEN MATCHED THEN UPDATE SET amount = s.amount * 2 "
         "WHEN NOT MATCHED THEN INSERT (id, amount) VALUES (s.id, s.amount)",
         "different expressions"),
        # key rewrite in UPDATE SET
        ("MERGE INTO fact_sql t USING fact_sql s ON t.id = s.id "
         "WHEN MATCHED THEN UPDATE SET id = s.id + 1", "merge key"),
        # target ref in RHS
        ("MERGE INTO fact_sql t USING fact_sql s ON t.id = s.id "
         "WHEN MATCHED THEN UPDATE SET amount = t.amount + s.amount",
         "target alias"),
        # unregistered target
        ("DELETE FROM nope WHERE 1=1", "unknown DML target"),
        # unconditional UPDATE / DELETE
        ("UPDATE fact_sql SET amount = 0", "WHERE"),
        ("DELETE FROM fact_sql", "WHERE"),
    ]
    for sql, needle in cases:
        with pytest.raises(SqlDmlError, match=needle):
            execute_dml(spark, sql)
    assert fact.current_version() == v  # nothing mutated


def test_delete_null_predicate_keeps_null_rows_nonpartitioned(spark, tmp_path):
    """SQL three-valued logic on the plain-WapTable DELETE fallback:
    only rows where the WHERE predicate is TRUE delete — a NULL
    predicate (NULL bal < 0 → NULL) KEEPS the row. The naive
    ``filter(~cond)`` would drop it (NOT NULL = NULL), silently losing
    data relative to standard SQL DELETE."""
    from etl_reporting_spark.operators.sql_dml import register_dml_target
    from etl_reporting_spark.operators.wap import create_wap_table

    df = spark.createDataFrame(
        [(1, -5.0), (2, 3.0), (3, None), (4, -1.0), (5, None)],
        "id long, bal double",
    )
    t = create_wap_table(spark, str(tmp_path / "accts"), df)
    register_dml_target("accts_sql", t)

    res = execute_dml(spark, "DELETE FROM accts_sql WHERE bal < 0")
    assert res.rows_affected == 2  # only the TRUE rows (ids 1, 4)
    got = {r["id"]: r["bal"] for r in t.read().collect()}
    # NULL-predicate rows SURVIVE, exactly as standard SQL keeps them
    assert set(got) == {2, 3, 5}
    assert got[3] is None and got[5] is None


def test_nmbs_delete_on_partitioned_target_warns_scope(spark, fact):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE against a partitioned
    WAP target is partition-scoped (pruned-merge contract): the
    statement must say so out loud — SqlDmlScopeWarning naming the
    target — and the surviving rows must demonstrate the scope: a
    target-only row in a partition the source never touched is KEPT,
    while one inside a touched partition deletes."""
    import warnings as _w

    from etl_reporting_spark.operators.sql_dml import SqlDmlScopeWarning

    # source touches only ds=2026-01-01 (ids 3,6,9,12 live there)
    spark.createDataFrame(
        [(3, "2026-01-01", 33.0, "upd")],
        "id long, ds string, amount double, status string",
    ).createOrReplaceTempView("delta_src")
    stmt = (
        "MERGE INTO fact_sql t USING delta_src s "
        "ON t.id = s.id AND t.ds = s.ds "
        "WHEN MATCHED THEN UPDATE SET amount = s.amount "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        res = execute_dml(spark, stmt)
    scope = [w for w in caught if issubclass(w.category, SqlDmlScopeWarning)]
    assert scope and "fact_sql" in str(scope[0].message)
    assert "ds" in str(scope[0].message)
    got = {r["id"] for r in fact.read().collect()}
    # inside the touched partition: target-only rows 6, 9, 12 deleted
    assert {6, 9, 12}.isdisjoint(got) and 3 in got
    # untouched partitions: every row survives (the documented scope)
    assert {1, 2, 4, 5, 7, 8, 10, 11} <= got
    assert res.rows_deleted == 3


def test_merge_commits_through_registered_handle_storage(spark, tmp_path):
    """A handle registered with an EXPLICIT storage whose root differs
    from the logical path must get its MERGE through that same
    storage (ADVICE r10 #3): before the handle was threaded,
    merge_upsert_wap re-opened the logical path via the default
    factory — an empty location — and 'bootstrapped' a second table
    there, silently splitting MERGE from DELETE/UPDATE."""
    from etl_reporting_spark.operators.sql_dml import register_dml_target
    from etl_reporting_spark.operators.table_storage import LocalFSStorage
    from etl_reporting_spark.operators.wap import PartitionedWapTable

    real_root = str(tmp_path / "real_root")
    logical = str(tmp_path / "logical")
    st = LocalFSStorage(real_root)
    t = PartitionedWapTable(spark, logical, ["ds"], storage=st)
    t.fs.prepare_root()
    t.commit_partitions(
        spark.createDataFrame(
            [(1, "d1", 10.0)], "id long, ds string, amount double"
        ),
        operation="create",
    )
    register_dml_target("offroot_fact", t)

    spark.createDataFrame(
        [(1, "d1", 99.0), (2, "d1", 20.0)],
        "id long, ds string, amount double",
    ).createOrReplaceTempView("offroot_src")
    res = execute_dml(
        spark,
        "MERGE INTO offroot_fact t USING offroot_src s "
        "ON t.id = s.id AND t.ds = s.ds "
        "WHEN MATCHED THEN UPDATE SET amount = s.amount "
        "WHEN NOT MATCHED THEN INSERT (id, ds, amount) "
        "VALUES (s.id, s.ds, s.amount)",
    )
    assert (res.rows_updated, res.rows_inserted) == (1, 1)
    # the commit landed on the HANDLE's storage, not the logical path
    assert t.current_version() == 2
    got = {r["id"]: r["amount"] for r in t.read().collect()}
    assert got == {1: 99.0, 2: 20.0}
    import os

    assert not os.path.exists(os.path.join(logical, "_wap"))


def test_engine_script_dispatches_set_dml_select(spark, fact):
    """Round-11 brief #5: Engine.execute_multiple_statements runs a
    mixed SET + MERGE + SELECT script — SET $VAR becomes a session
    variable, MERGE routes to the SQL-DML router, the SELECT sees the
    POST-merge state through the refreshed view, and a MERGE against
    an unregistered target raises a named error instead of an obscure
    spark.sql failure."""
    from etl_reporting_spark.io import Engine

    spark.createDataFrame(
        [(900, "2026-01-01", 9.0, "scripted")],
        "id long, ds string, amount double, status string",
    ).createOrReplaceTempView("delta_src")
    eng = Engine(spark)
    out = eng.execute_multiple_statements(
        [
            "SET $NEW_STATUS = scripted",
            """MERGE INTO fact_sql t USING delta_src s
               ON t.id = s.id AND t.ds = s.ds
               WHEN NOT MATCHED AND s.status = $NEW_STATUS THEN
                 INSERT (id, ds, amount, status)
                 VALUES (s.id, s.ds, s.amount, s.status)""",
            "SELECT COUNT(*) AS n FROM fact_sql WHERE status = $NEW_STATUS",
        ]
    )
    # the final SELECT ran over the refreshed view: the merged row is
    # visible without any manual re-registration
    assert out.collect()[0]["n"] == 1
    assert 900 in {r["id"] for r in fact.read().collect()}

    with pytest.raises(SqlDmlError, match="not registered"):
        eng.execute_multiple_statements(
            ["MERGE INTO unregistered t USING delta_src s ON t.id = s.id "
             "WHEN MATCHED THEN UPDATE SET amount = s.amount"]
        )


def test_comment_and_quote_handling(spark, fact):
    """'--' inside a string literal is NOT a comment; WHERE inside a
    literal doesn't confuse the scanner."""
    res = execute_dml(
        spark,
        "UPDATE fact_sql SET status = 'x--y WHERE z' "
        "WHERE id = 2  -- trailing comment",
    )
    assert res.rows_affected == 1
    got = {r["id"]: r["status"] for r in fact.read().collect()}
    assert got[2] == "x--y WHERE z"


# ------------------------------------------------------------------ DDL
def test_alter_table_constraint_ddl_text(spark, fact):
    """ADD CONSTRAINT text gates the next DML; DROP reopens it."""
    from etl_reporting_spark.operators.sql_dml import execute_ddl
    from etl_reporting_spark.operators.wap import ConstraintViolation

    out = execute_ddl(
        spark, "ALTER TABLE fact_sql ADD CONSTRAINT amt_pos CHECK (amount >= 0)"
    )
    assert out["operation"] == "add_constraint"
    assert fact.check_constraints() == {"amt_pos": "amount >= 0"}
    with pytest.raises(ConstraintViolation):
        execute_dml(
            spark,
            "UPDATE fact_sql SET amount = -5 WHERE id = 4",
        )
    execute_ddl(spark, "ALTER TABLE fact_sql DROP CONSTRAINT amt_pos")
    res = execute_dml(spark, "UPDATE fact_sql SET amount = -5 WHERE id = 4")
    assert res.rows_affected == 1


def test_alter_table_columns_and_widen_ddl_text(spark, fact):
    from etl_reporting_spark.operators.sql_dml import execute_ddl

    execute_ddl(
        spark, "ALTER TABLE fact_sql ADD COLUMNS (note string, score int)"
    )
    cols = fact.read().columns
    assert "note" in cols and "score" in cols
    execute_ddl(spark, "ALTER TABLE fact_sql ALTER COLUMN score TYPE long")
    assert fact.read().schema["score"].dataType.typeName() == "long"
    execute_ddl(spark, "ALTER TABLE fact_sql DROP COLUMNS note, score")
    assert "note" not in fact.read().columns


def test_alter_column_widen_refuses_non_promotion(spark, fact):
    from etl_reporting_spark.operators.sql_dml import execute_ddl

    with pytest.raises(ValueError, match="permitted promotions"):
        execute_ddl(spark, "ALTER TABLE fact_sql ALTER COLUMN amount TYPE float")


def test_analyze_table_ddl_text(spark, fact):
    from etl_reporting_spark.operators.sql_dml import execute_ddl
    from etl_reporting_spark.operators.stats import table_stats

    out = execute_ddl(
        spark,
        "ANALYZE TABLE fact_sql COMPUTE STATISTICS FOR COLUMNS id, amount "
        "FOR KEYS id",
    )
    assert out["operation"] == "analyze"
    s = table_stats(fact)
    assert s["row_count"] == 12
    assert s["columns"]["id"]["min"] == 1 and s["columns"]["id"]["max"] == 12
    assert s["keys"]["id"]["max_key_rows"] == 1


def test_ddl_script_mix_and_view_repin(spark, fact):
    """A script mixing constraint DDL, ANALYZE, and DML runs in order
    through execute_dml_script; the registered view re-pins after the
    ALTER so a later SELECT sees the new column."""
    from etl_reporting_spark.operators.sql_dml import execute_dml_script

    results = execute_dml_script(
        spark,
        """
        ALTER TABLE fact_sql ADD CONSTRAINT st CHECK (status IS NOT NULL);
        ANALYZE TABLE fact_sql COMPUTE STATISTICS FOR COLUMNS amount;
        ALTER TABLE fact_sql ADD COLUMN note string;
        UPDATE fact_sql SET status = 'closed' WHERE id <= 3
        """,
    )
    assert [r["operation"] for r in results[:3]] == [
        "add_constraint",
        "analyze",
        "add_columns",
    ]
    assert results[3].rows_affected == 3
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM fact_sql WHERE status = 'closed'"
    ).first()["n"]
    assert got == 3
    assert "note" in spark.table("fact_sql").columns  # re-pinned


def test_unsupported_ddl_fails_loudly(spark, fact):
    from etl_reporting_spark.operators.sql_dml import execute_ddl

    # RENAME COLUMN is supported since round-12 (test_wap_rename.py);
    # whole-TABLE rename remains the unsupported ALTER exemplar
    with pytest.raises(SqlDmlError, match="unsupported ALTER"):
        execute_ddl(spark, "ALTER TABLE fact_sql RENAME TO other_table")
    # a supported form over a bad column still fails loudly, with the
    # table API's own message
    with pytest.raises(ValueError, match="unknown column"):
        execute_ddl(spark, "ALTER TABLE fact_sql RENAME COLUMN nope TO b")
    with pytest.raises(SqlDmlError, match="unsupported ANALYZE"):
        execute_ddl(spark, "ANALYZE TABLE fact_sql ESTIMATE EVERYTHING")


def test_engine_script_dispatches_ddl(spark, fact):
    """Engine.execute_multiple_statements routes registered-target DDL
    to execute_ddl and leaves unregistered names to spark.sql."""
    from etl_reporting_spark.io import Engine

    eng = Engine(spark)
    out = eng.execute_multiple_statements(
        [
            "ALTER TABLE fact_sql ADD CONSTRAINT pos CHECK (amount >= 0)",
            "SELECT COUNT(*) AS n FROM fact_sql",
        ],
        lazy=False,
    )
    assert out[0]["n"] == 12
    assert "pos" in fact.check_constraints()


# ---------------------------------------------- hidden-partitioned targets
@pytest.fixture()
def hidden_fact(spark, tmp_path):
    import datetime as dt

    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )

    rows = [
        (i, dt.date(2026, 1 + (i % 6), 1 + (i % 27)), f"u{i % 7}", float(i))
        for i in range(1, 61)
    ]
    df = spark.createDataFrame(rows, "id int, ds date, user string, amt double")
    t = create_hidden_partitioned_wap_table(
        spark, str(tmp_path / "hid"), df, ["months(ds)"]
    )
    register_wap_view(spark, t.path, "hid_fact", dml=True)
    return t


def test_update_text_on_hidden_partitioned_target(spark, hidden_fact):
    """UPDATE discovers touched partitions through the PHYSICAL handle
    (the derived column the logical read hides) and rewrites only
    those; the derived column is not assignable."""
    res = execute_dml(spark, "UPDATE hid_fact SET amt = 0 WHERE user = 'u3'")
    assert res.rows_affected == 9
    assert (
        hidden_fact.read().filter("user = 'u3'").agg(F.sum("amt")).first()[0]
        == 0.0
    )
    with pytest.raises(SqlDmlError, match="unknown column"):
        execute_dml(
            spark, "UPDATE hid_fact SET _p_ds_months = 'x' WHERE id = 1"
        )


def test_merge_text_on_hidden_partitioned_target(spark, hidden_fact):
    """MERGE derives the source's partition columns from the table's
    transform spec — an inserted row must land in its derived
    partition, never the NULL partition."""
    import datetime as dt

    src = spark.createDataFrame(
        [
            (5, dt.date(2026, 6, 5), "ux", 500.0),
            (999, dt.date(2026, 2, 2), "nw", 1.0),
        ],
        "id int, ds date, user string, amt double",
    )
    src.createOrReplaceTempView("hid_src")
    res = execute_dml(
        spark,
        """MERGE INTO hid_fact AS t USING hid_src AS s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET amt = s.amt
           WHEN NOT MATCHED THEN
             INSERT (id, ds, user, amt) VALUES (s.id, s.ds, s.user, s.amt)""",
    )
    assert res.rows_updated == 1 and res.rows_inserted == 1
    out = hidden_fact.read()
    assert out.filter("id = 5").first()["amt"] == 500.0
    inserted = out.filter("id = 999").first()
    assert inserted["ds"] == dt.date(2026, 2, 2)
    # the inserted row is PRUNABLE — it landed in its derived
    # partition, not the NULL partition
    assert hidden_fact.prune("ds", eq=dt.date(2026, 2, 2)) == [
        "_p_ds_months=2026-02"
    ]
    feb = hidden_fact.read_pruned("ds", lo=dt.date(2026, 2, 1),
                                  hi=dt.date(2026, 2, 28))
    assert feb.filter("id = 999").count() == 1


def test_delete_text_and_ddl_on_hidden_partitioned_target(spark, hidden_fact):
    from etl_reporting_spark.operators.sql_dml import execute_ddl
    from etl_reporting_spark.operators.stats import table_stats
    from etl_reporting_spark.operators.wap import ConstraintViolation

    res = execute_dml(spark, "DELETE FROM hid_fact WHERE user = 'u1'")
    assert res.rows_affected == 9
    assert hidden_fact.read().filter("user = 'u1'").count() == 0
    execute_ddl(
        spark, "ALTER TABLE hid_fact ADD CONSTRAINT pos CHECK (amt >= 0)"
    )
    with pytest.raises(ConstraintViolation):
        execute_dml(spark, "UPDATE hid_fact SET amt = -1 WHERE id = 2")
    execute_ddl(spark, "ANALYZE TABLE hid_fact COMPUTE STATISTICS")
    s = table_stats(hidden_fact)
    assert s["row_count"] == hidden_fact.read().count()
    # ANALYZE ran on the logical surface: no derived column in stats
    assert "_p_ds_months" not in s["columns"]


def test_describe_table_text_and_api(spark, fact, tmp_path):
    """DESCRIBE TABLE via text returns the one-stop metadata dict;
    the API form covers constraints, stats presence, and clones."""
    from etl_reporting_spark.operators.sql_dml import execute_ddl
    from etl_reporting_spark.operators.stats import collect_table_stats
    from etl_reporting_spark.operators.wap import clone_table, describe_table

    execute_ddl(
        spark, "ALTER TABLE fact_sql ADD CONSTRAINT pos CHECK (amount >= 0)"
    )
    collect_table_stats(fact, ["amount"])
    clone_table(spark, fact.path, str(tmp_path / "cl"))
    out = execute_ddl(spark, "DESCRIBE TABLE fact_sql")
    assert out["operation"] == "describe"
    d = out["detail"]
    assert d["schema"]["amount"] == "double"
    assert d["constraints"] == {"pos": "amount >= 0"}
    assert d["partitioning"] == {"kind": "explicit", "partition_by": ["ds"]}
    assert d["statistics"]["columns"] == ["amount"]
    assert d["statistics"]["staleness"] == 0
    assert d["clones"][0]["pins_version"] == fact.current_version()
    assert d["row_count"] == 12 or d["row_count"] is not None
    # direct API on a hidden table reports the spec
    import datetime as dt

    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )

    h = create_hidden_partitioned_wap_table(
        spark,
        str(tmp_path / "h"),
        spark.createDataFrame(
            [(1, dt.date(2026, 1, 1))], "id int, ds date"
        ),
        ["months(ds)"],
    )
    hd = describe_table(h)
    assert hd["partitioning"]["kind"] == "hidden"
    assert hd["partitioning"]["spec"][0]["kind"] == "months"
    with pytest.raises(SqlDmlError, match="unsupported DESCRIBE"):
        execute_ddl(spark, "DESCRIBE TABLE fact_sql EXTENDED PLUS")


# ------------------------------------------------------------------ INSERT
def test_insert_values_text_appends_without_rewrites(spark, fact):
    files_before = {
        k: set(fact.partition_files(k)) for k in fact.partition_map()
    }
    res = execute_dml(
        spark,
        "INSERT INTO fact_sql (id, ds, amount, status) VALUES "
        "(500, '2026-01-01', 5.0, 'new'), (501, '2026-01-02', 6.0, 'new')",
    )
    assert res.operation == "insert" and res.rows_affected == 2
    got = {r["id"] for r in fact.read().collect()}
    assert {500, 501} <= got and len(got) == 14
    for k, old in files_before.items():
        assert old <= set(fact.partition_files(k))  # pure append
    # the registered view re-pinned: SQL sees the inserted rows
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM fact_sql WHERE id >= 500")
        .first()["n"] == 2
    )


def test_insert_select_and_partial_columns_null_fill(spark, fact):
    spark.createDataFrame(
        [(600, "2026-01-03"), (601, "2026-01-03")], "id long, ds string"
    ).createOrReplaceTempView("ins_src")
    res = execute_dml(
        spark,
        "INSERT INTO fact_sql (id, ds) SELECT id, ds FROM ins_src",
    )
    assert res.rows_affected == 2
    row = fact.read().filter("id = 600").first()
    assert row["amount"] is None and row["status"] is None  # SQL NULL fill
    with pytest.raises(SqlDmlError, match="not in target schema"):
        execute_dml(
            spark, "INSERT INTO fact_sql (nope) VALUES (1)"
        )
    with pytest.raises(SqlDmlError, match="produces"):
        execute_dml(
            spark,
            "INSERT INTO fact_sql (id, ds) SELECT id, ds, id FROM ins_src",
        )


def test_insert_into_hidden_target_lands_prunable(spark, hidden_fact):
    import datetime as dt

    res = execute_dml(
        spark,
        "INSERT INTO hid_fact (id, ds, user, amt) VALUES "
        "(777, DATE '2026-04-15', 'uins', 7.0)",
    )
    assert res.rows_affected == 1
    assert hidden_fact.read_pruned(
        "ds", eq=dt.date(2026, 4, 15)
    ).filter("id = 777").count() == 1


def test_insert_respects_constraints(spark, fact):
    from etl_reporting_spark.operators.sql_dml import execute_ddl
    from etl_reporting_spark.operators.wap import ConstraintViolation

    execute_ddl(
        spark, "ALTER TABLE fact_sql ADD CONSTRAINT pos CHECK (amount >= 0)"
    )
    v = fact.current_version()
    with pytest.raises(ConstraintViolation):
        execute_dml(
            spark,
            "INSERT INTO fact_sql (id, ds, amount, status) VALUES "
            "(700, '2026-01-01', -1.0, 'bad')",
        )
    assert fact.current_version() == v


def test_branch_lifecycle_via_ddl_text(spark, fact):
    """ALTER TABLE ... CREATE/PUBLISH/DROP BRANCH as statement text:
    stage a MERGE on the branch (handle passed via tables=), publish,
    and the registered main view re-pins to the merged state."""
    from etl_reporting_spark.operators.branches import open_branch
    from etl_reporting_spark.operators.sql_dml import execute_ddl

    out = execute_ddl(spark, "ALTER TABLE fact_sql CREATE BRANCH stage")
    assert out["operation"] == "create_branch"
    br = open_branch(spark, fact.path, "stage")
    spark.createDataFrame(
        [(4, "2026-01-02", 777.0, "staged")],
        "id long, ds string, amount double, status string",
    ).createOrReplaceTempView("stage_src")
    execute_dml(
        spark,
        """MERGE INTO staged_fact AS t USING stage_src AS s
           ON t.id = s.id AND t.ds = s.ds
           WHEN MATCHED THEN UPDATE SET amount = s.amount, status = s.status""",
        tables={"staged_fact": br},
    )
    # invisible on main until publish
    assert fact.read().filter("amount = 777.0").count() == 0
    out = execute_ddl(spark, "ALTER TABLE fact_sql PUBLISH BRANCH stage")
    assert out["operation"] == "publish_branch"
    assert fact.read().filter("amount = 777.0").count() == 1
    # the re-pinned registered view sees the published state
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM fact_sql WHERE status = 'staged'")
        .first()["n"] == 1
    )
    with pytest.raises(SqlDmlError, match="no branch"):
        execute_ddl(spark, "ALTER TABLE fact_sql DROP BRANCH never_made")


def test_optimize_and_vacuum_ddl_text(spark, fact):
    """Delta's maintenance verbs as text: OPTIMIZE compacts (clearing
    DV masks) and VACUUM RETAIN bounds history — both through the
    registry dispatch, with the view re-pinned after OPTIMIZE."""
    from etl_reporting_spark.operators.sql_dml import execute_ddl

    execute_dml(spark, "DELETE FROM fact_sql WHERE id = 3")
    assert fact._commit_record(fact.current_version()).get("delete_vectors")
    out = execute_ddl(spark, "OPTIMIZE fact_sql")
    assert out["operation"] == "optimize"
    assert not fact._commit_record(out["version"]).get("delete_vectors")
    assert spark.sql("SELECT COUNT(*) AS n FROM fact_sql").first()["n"] == 11
    out = execute_ddl(spark, "VACUUM fact_sql RETAIN 1 VERSIONS")
    assert out["operation"] == "vacuum"
    # superseded roots younger than the safety horizon are kept — the
    # count is environment-dependent; the verb routing is what's pinned
    with pytest.raises(SqlDmlError, match="unsupported OPTIMIZE"):
        execute_ddl(spark, "OPTIMIZE fact_sql WHERE ds = 'x'")


def test_optimize_zorder_ddl_text(spark, fact):
    from etl_reporting_spark.operators.sql_dml import execute_ddl

    out = execute_ddl(spark, "OPTIMIZE fact_sql ZORDER BY (id, amount)")
    assert out["operation"] == "optimize" and out["zorder"] == ["id", "amount"]
    assert fact.read().count() == 12


def test_full_width_script_through_one_engine_call(spark, fact):
    """The widest reference-script shape in ONE
    execute_multiple_statements call: SET, INSERT, constraint DDL,
    MERGE, OPTIMIZE, ANALYZE, and the final SELECT — every statement
    dispatched by shape, the registered view re-pinned after each
    mutation, the last result returned."""
    from etl_reporting_spark.io import Engine
    from etl_reporting_spark.operators.stats import table_stats

    spark.createDataFrame(
        [(2, "2026-01-03", 555.0, "merged")],
        "id long, ds string, amount double, status string",
    ).createOrReplaceTempView("script_delta")
    eng = Engine(spark)
    rows = eng.execute_multiple_statements(
        [
            "SET $FLOOR = 0",
            "INSERT INTO fact_sql (id, ds, amount, status) VALUES "
            "(800, '2026-01-01', 8.0, 'inserted')",
            "ALTER TABLE fact_sql ADD CONSTRAINT floor_ok "
            "CHECK (amount >= $FLOOR)",
            """MERGE INTO fact_sql AS t USING script_delta AS s
               ON t.id = s.id AND t.ds = s.ds
               WHEN MATCHED THEN UPDATE SET amount = s.amount,
                                            status = s.status""",
            "OPTIMIZE fact_sql",
            "ANALYZE TABLE fact_sql COMPUTE STATISTICS FOR COLUMNS amount",
            "SELECT status, COUNT(*) AS n FROM fact_sql "
            "GROUP BY status ORDER BY status",
        ],
        lazy=False,
    )
    got = {r["status"]: r["n"] for r in rows}
    assert got == {"inserted": 1, "merged": 1, "open": 11}
    assert "floor_ok" in fact.check_constraints()
    assert table_stats(fact)["row_count"] == 13
    # OPTIMIZE consolidated the post-INSERT file-granular pointers
    rec = fact._commit_record(fact.current_version())
    assert rec.get("table_stats")


def test_staged_migration_script_via_text(spark, fact):
    """Round-13: the staged-migration pattern as STATEMENT TEXT — the
    reference's stage-then-MERGE upsert as a script (reference
    connector/snowpark_connector.py:607-688). CREATE BRANCH, RENAME
    COLUMN + MERGE on the branch handle, a routine ANALYZE on MAIN in
    between (which used to brick the publish), PUBLISH BRANCH — and
    the main view serves the migrated schema."""
    from etl_reporting_spark.operators.branches import open_branch
    from etl_reporting_spark.operators.sql_dml import execute_ddl

    execute_ddl(spark, "ALTER TABLE fact_sql CREATE BRANCH mig13")
    br = open_branch(spark, fact.path, "mig13")
    execute_ddl(
        spark,
        "ALTER TABLE staged RENAME COLUMN amount TO amt_total",
        tables={"staged": br},
    )
    spark.createDataFrame(
        [(4, "2026-01-02", 444.0, "migrated")],
        "id long, ds string, amt_total double, status string",
    ).createOrReplaceTempView("mig_src")
    execute_dml(
        spark,
        """MERGE INTO staged AS t USING mig_src AS s
           ON t.id = s.id AND t.ds = s.ds
           WHEN MATCHED THEN UPDATE SET
             amt_total = s.amt_total, status = s.status""",
        tables={"staged": br},
    )
    # main unchanged pre-publish: old column name, old values
    assert "amount" in fact.read().columns
    # routine main-side ANALYZE between fork and publish (text route)
    execute_ddl(spark, "ANALYZE TABLE fact_sql COMPUTE STATISTICS")
    out = execute_ddl(spark, "ALTER TABLE fact_sql PUBLISH BRANCH mig13")
    assert out["operation"] == "publish_branch"
    got = fact.read()
    assert "amt_total" in got.columns and "amount" not in got.columns
    assert got.filter("amt_total = 444.0").count() == 1
    # the re-pinned registered view serves the NEW name
    assert (
        spark.sql(
            "SELECT COUNT(*) AS n FROM fact_sql WHERE amt_total = 444.0"
        ).first()["n"]
        == 1
    )
    # main's ANALYZE survived the replay (advisory stats preserved,
    # re-keyed through the branch's rename at re-execution)
    ts = fact.latest_record().get("table_stats")
    assert ts and "amt_total" in ts["columns"]
