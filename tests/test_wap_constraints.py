"""Commit-time CHECK constraints on WAP tables.

Delta's ``ALTER TABLE ADD CONSTRAINT`` semantics, enforced at the
audit step of write-audit-publish: a batch row for which a registered
expression is not TRUE (FALSE or NULL — three-valued logic) fails the
commit with :class:`ConstraintViolation` before anything publishes.
The reference checks data AFTER load (its DMF/expectation layer runs
on landed tables); commit-gating is the stronger Spark-first spelling
— bad rows never become visible.

Runs under BOTH storage backends (localfs + blob) via the shared
fixture: enforcement and the centralized constraint inheritance in
``_publish`` must not depend on POSIX semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_reporting_spark.operators.wap import (
    ConstraintViolation,
    create_partitioned_wap_table,
    create_wap_table,
    clone_table,
)

pytestmark = pytest.mark.usefixtures("wap_storage_backend")


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id int, grp string, bal double",
    )


def test_violating_commit_refused_and_nothing_published(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _base(spark), ["grp"]
    )
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    assert t.check_constraints() == {"bal_nonneg": "bal >= 0"}
    v_before = t.current_version()
    bad = spark.createDataFrame(
        [(4, "b", -1.0)], "id int, grp string, bal double"
    )
    with pytest.raises(ConstraintViolation, match="bal_nonneg"):
        t.commit_partitions(bad, operation="append")
    assert t.current_version() == v_before
    assert t.read().count() == 3  # nothing leaked


def test_null_predicate_is_a_violation_by_default(spark, tmp_path):
    """SQL three-valued logic: NULL bal fails ``bal >= 0`` (NULL is
    not TRUE) — the Delta rule. Admitting NULLs must be spelled."""
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _base(spark), ["grp"]
    )
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    nullrow = spark.createDataFrame(
        [(5, "a", None)], "id int, grp string, bal double"
    )
    with pytest.raises(ConstraintViolation, match="bal_nonneg"):
        t.commit_partitions(nullrow, operation="append")
    t.drop_check_constraint("bal_nonneg")
    t.add_check_constraint("bal_ok", "bal IS NULL OR bal >= 0")
    t.commit_partitions(nullrow.unionByName(t.read()), operation="overwrite")
    assert t.read().count() == 4


def test_upsert_rows_dv_gated_before_any_write(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _base(spark), ["grp"]
    )
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    v = t.current_version()
    src = spark.createDataFrame(
        [(2, "a", -99.0)], "id int, grp string, bal double"
    )
    with pytest.raises(ConstraintViolation):
        t.upsert_rows_dv(src, keys=["id"])
    assert t.current_version() == v
    ok = spark.createDataFrame(
        [(2, "a", 99.0)], "id int, grp string, bal double"
    )
    t.upsert_rows_dv(ok, keys=["id"])
    assert (
        t.read().filter(F.col("id") == 2).select("bal").first()[0] == 99.0
    )


def test_add_refuses_on_dirty_data_unless_opted(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", -5.0), (2, "a", 20.0)], "id int, grp string, bal double"
    )
    t = create_partitioned_wap_table(spark, str(tmp_path / "t"), df, ["grp"])
    with pytest.raises(ConstraintViolation, match="existing data"):
        t.add_check_constraint("bal_nonneg", "bal >= 0")
    assert t.check_constraints() == {}
    t.add_check_constraint("bal_nonneg", "bal >= 0", validate=False)
    assert "bal_nonneg" in t.check_constraints()


def test_constraints_inherit_through_unrelated_commits(spark, tmp_path):
    """The centralized carry in ``_publish``: a delete_rows commit
    (which never mentions constraints) must not shed them."""
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _base(spark), ["grp"]
    )
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    t.delete_rows("id = 1")
    assert t.check_constraints() == {"bal_nonneg": "bal >= 0"}
    bad = spark.createDataFrame(
        [(9, "b", -1.0)], "id int, grp string, bal double"
    )
    with pytest.raises(ConstraintViolation):
        t.commit_partitions(bad, operation="append")


def test_drop_constraint_reopens_the_gate(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _base(spark), ["grp"]
    )
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    t.drop_check_constraint("bal_nonneg")
    assert t.check_constraints() == {}
    bad = spark.createDataFrame(
        [(4, "b", -1.0)], "id int, grp string, bal double"
    )
    # partition-replace semantics: grp=b is rewritten with the one row
    t.commit_partitions(bad, operation="merge")
    assert t.read().filter("id = 4 AND bal = -1.0").count() == 1


def test_name_and_expression_hygiene(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _base(spark), ["grp"]
    )
    t.add_check_constraint("c1", "bal >= 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_check_constraint("c1", "bal >= 1")
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_check_constraint("c2", "no_such_col > 0")
    with pytest.raises(ValueError, match="identifier"):
        t.add_check_constraint("not a name!", "bal >= 0")
    with pytest.raises(KeyError):
        t.drop_check_constraint("never_added")


def test_alter_schema_refuses_dropping_constrained_column(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _base(spark), ["grp"]
    )
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    with pytest.raises(ValueError, match="bal_nonneg"):
        t.alter_schema(drop=["bal"])
    t.drop_check_constraint("bal_nonneg")
    t.alter_schema(drop=["bal"])
    assert "bal" not in t.read().columns


def test_full_overwrite_lacking_constrained_column_fails_loudly(
    spark, tmp_path
):
    t = create_wap_table(spark, str(tmp_path / "t"), _base(spark))
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    narrower = spark.createDataFrame([(1, "a")], "id int, grp string")
    with pytest.raises(ConstraintViolation, match="drop_check_constraint"):
        t.commit(narrower, operation="overwrite")


def test_unpartitioned_table_enforces_too(spark, tmp_path):
    t = create_wap_table(spark, str(tmp_path / "t"), _base(spark))
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    bad = spark.createDataFrame(
        [(4, "b", -1.0)], "id int, grp string, bal double"
    )
    with pytest.raises(ConstraintViolation):
        t.commit(bad, operation="overwrite")
    assert t.read().count() == 3


def test_clone_inherits_source_constraints(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "src"), _base(spark), ["grp"]
    )
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    c = clone_table(spark, str(tmp_path / "src"), str(tmp_path / "dst"))
    assert c.check_constraints() == {"bal_nonneg": "bal >= 0"}
    bad = spark.createDataFrame(
        [(7, "b", -3.0)], "id int, grp string, bal double"
    )
    with pytest.raises(ConstraintViolation):
        c.commit_partitions(bad, operation="append")


def test_exemplar_row_names_every_violated_constraint(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _base(spark), ["grp"]
    )
    t.add_check_constraint("bal_nonneg", "bal >= 0")
    t.add_check_constraint("id_pos", "id > 0")
    bad = spark.createDataFrame(
        [(-1, "b", -1.0)], "id int, grp string, bal double"
    )
    with pytest.raises(ConstraintViolation) as exc:
        t.commit_partitions(bad, operation="append")
    msg = str(exc.value)
    assert "bal_nonneg" in msg and "id_pos" in msg
