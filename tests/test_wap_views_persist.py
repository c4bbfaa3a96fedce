"""Catalog-persistent WAP views + durable DML registry (round-11
brief #4): the reference's views are permanent CATALOG objects
(reference connector/snowpark_connector.py:511-566) and its DML
targets survive a session — the round-10 surface had temp views and
an in-process dict only.

What must hold:
- ``register_wap_view(..., permanent=True)`` stores the pinned
  snapshot as a catalog view whose SQL restores the committed schema
  (CASTs defeat hive partition-type inference drift); a NEW session
  reads it back identically.
- Non-expressible snapshots (multi-root, deletion vectors,
  file-granular, clone-external) refuse with compact-first guidance
  instead of silently resurrecting superseded leaves.
- ``dml=True, durable=True`` survives "process restart": with the
  in-process registry wiped, ``execute_dml`` re-opens the target from
  the JSON registry file and the MERGE lands.

Runs over both storage backends (see conftest).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("wap_storage_backend")

from pyspark.sql import functions as F

from etl_reporting_spark.operators import sql_dml
from etl_reporting_spark.operators.sql_dml import execute_dml
from etl_reporting_spark.operators.wap import (
    create_partitioned_wap_table,
    optimize_partitions,
    register_wap_view,
)


@pytest.fixture()
def fact(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (i, "2026-01-01" if i % 2 else "2026-01-02", float(i * 10))
            for i in range(1, 13)
        ],
        "id long, ds string, amount double",
    )
    return create_partitioned_wap_table(spark, str(tmp_path / "fact"), df, ["ds"])


def test_permanent_view_survives_new_session(spark, fact):
    name = "wap_perm_view_t1"
    try:
        register_wap_view(spark, fact.path, name, permanent=True)
        # mutate AFTER pinning: the view must keep the pinned snapshot
        fact.commit_partitions(
            fact.read().withColumn("amount", F.col("amount") + 1),
            operation="overwrite",
        )
        fresh = spark.newSession()
        got = fresh.sql(
            f"SELECT id, ds, amount FROM {name} ORDER BY id"
        ).collect()
        assert [(r["id"], r["amount"]) for r in got] == [
            (i, float(i * 10)) for i in range(1, 13)
        ]
        # committed schema restored exactly (ds stays STRING even
        # though hive inference would read 2026-01-01 as DATE)
        assert dict(fresh.table(name).dtypes) == {
            "id": "bigint", "ds": "string", "amount": "double",
        }
    finally:
        spark.sql(f"DROP VIEW IF EXISTS {name}")


def test_permanent_view_refuses_non_expressible_snapshots(spark, fact):
    name = "wap_perm_view_t2"
    # partition-scoped second commit -> two live roots
    day = fact.read().filter(F.col("ds") == "2026-01-01")
    fact.commit_partitions(
        day.withColumn("amount", F.col("amount") * 2),
        replace=["ds=2026-01-01"],
        operation="update",
    )
    with pytest.raises(ValueError, match="commit roots"):
        register_wap_view(spark, fact.path, name, permanent=True)
    # compacting to one root makes it expressible again
    optimize_partitions(fact)
    try:
        register_wap_view(spark, fact.path, name, permanent=True)
        assert spark.newSession().table(name).count() == 12
    finally:
        spark.sql(f"DROP VIEW IF EXISTS {name}")
    # deletion vectors -> refuse (a root scan can't apply the mask)
    fact.delete_rows("id = 1")
    with pytest.raises(ValueError, match="deletion vectors"):
        register_wap_view(spark, fact.path, "wap_perm_view_t3", permanent=True)
    # pinning the PRE-delete version still works: DVs live in the
    # newer record, the older snapshot is still a clean root scan
    v_clean = fact.current_version() - 1
    try:
        register_wap_view(
            spark, fact.path, "wap_perm_view_t3",
            version=v_clean, permanent=True,
        )
        assert spark.table("wap_perm_view_t3").count() == 12
    finally:
        spark.sql("DROP VIEW IF EXISTS wap_perm_view_t3")


def test_durable_dml_registry_survives_process_restart(
    spark, fact, tmp_path, monkeypatch
):
    registry = str(tmp_path / "reg" / "dml_registry.json")
    monkeypatch.setenv(sql_dml.DML_REGISTRY_ENV, registry)
    register_wap_view(
        spark, fact.path, "durable_fact", dml=True, durable=True
    )
    # simulate a fresh process: the in-memory registry is gone, the
    # temp view is gone — only the JSON file survives
    monkeypatch.setattr(sql_dml, "_DML_TARGETS", {})
    spark.catalog.dropTempView("durable_fact")

    spark.createDataFrame(
        [(1, "2026-01-01", 999.0), (100, "2026-01-01", 1.0)],
        "id long, ds string, amount double",
    ).createOrReplaceTempView("durable_src")
    res = execute_dml(
        spark,
        "MERGE INTO durable_fact t USING durable_src s "
        "ON t.id = s.id AND t.ds = s.ds "
        "WHEN MATCHED THEN UPDATE SET amount = s.amount "
        "WHEN NOT MATCHED THEN INSERT (id, ds, amount) "
        "VALUES (s.id, s.ds, s.amount)",
    )
    assert (res.rows_updated, res.rows_inserted) == (1, 1)
    got = {r["id"]: r["amount"] for r in fact.read().collect()}
    assert got[1] == 999.0 and got[100] == 1.0


def test_unregistered_name_still_fails_loudly(spark, fact, tmp_path, monkeypatch):
    monkeypatch.setenv(
        sql_dml.DML_REGISTRY_ENV, str(tmp_path / "empty_registry.json")
    )
    monkeypatch.setattr(sql_dml, "_DML_TARGETS", {})
    with pytest.raises(sql_dml.SqlDmlError, match="unknown DML target"):
        execute_dml(spark, "DELETE FROM never_registered WHERE 1=1")
