"""Engine façade: execution, materialization, and catalog surface.

Re-expresses the reference connector's public surface
(connector/snowpark_connector.py) over a SparkSession:

- ``execute_query(sql, lazy)``            — :240-288  (S1/S2)
- ``execute_query_from_file(path, ...)``  — :290-464  (S3, template +
  session vars + incremental predicate injection)
- ``execute_multiple_statements``         — :1238-1272 (S4)
- ``save_as_table(df, name, mode, type)`` — :466-509  (S9)
- ``save_as_view(df, name)``              — :511-566  (S10)
- ``table_exists / truncate_table / drop_table`` — :1006-1071 (S16)
- ``stage_table``                         — tools/datamart_utils.py:97-124 (S12)

Design notes (Spark-first, 100 TB-aware):
- Tables are Parquet-backed catalog tables; "temporary" maps to a
  temp view (zero materialization), "transient" to a cached temp view
  — the reference's transient tables exist to avoid fail-safe storage
  costs, which has no Spark analogue, so the useful semantic
  (cheap intermediate, reused across steps) maps to caching.
- Session variables are rendered Python-side into the SQL text, the
  same constant-folding-at-template-time the reference does; Catalyst
  then folds literals and pushes predicates into the parquet scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Iterable

from pyspark.sql import DataFrame, Row, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class WriteMode(str, Enum):
    """Write modes, mirroring definitions/custom_definitions.py:37-47."""

    APPEND = "append"
    OVERWRITE = "overwrite"
    TRUNCATE = "truncate"
    ERROR_IF_EXISTS = "errorifexists"
    IGNORE = "ignore"


class TableType(str, Enum):
    """Table types, mirroring definitions/custom_definitions.py:26-34."""

    PERMANENT = "permanent"
    TRANSIENT = "transient"
    TEMPORARY = "temporary"


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _validate_identifier(name: str) -> str:
    """Guard object names injected into SQL text (the reference
    validates extracted table names the same way,
    tools/datamart_utils.py:299-321)."""
    if not _IDENT_RE.match(name):
        raise ValueError(f"invalid object name: {name!r}")
    return name


@dataclass
class Engine:
    """Thin execution façade over a SparkSession."""

    spark: SparkSession
    session_variables: dict[str, str] = field(default_factory=dict)

    @staticmethod
    def cache_scope():
        """Scoped release for operator-persisted intermediates — see
        etl_reporting_spark.caching. Usage:

            with engine.cache_scope():
                clusters = near_duplicate_clusters(docs)
                clusters.write.parquet(out)
            # every frame the operators persisted is now unpersisted
        """
        from etl_reporting_spark.caching import cache_scope

        return cache_scope()

    # ------------------------------------------------------------- exec
    def execute_query(self, query: str, lazy: bool = True) -> DataFrame | list[Row]:
        rendered = self._render_session_vars(query)
        df = self.spark.sql(rendered)
        # Retain the defining SQL on the frame — the Spark analogue of
        # Snowpark's plan-SQL extraction, consumed by
        # save_as_view(..., permanent=True).
        df._engine_sql = rendered
        return df if lazy else df.collect()

    def execute_multiple_statements(
        self, statements: Iterable[str], lazy: bool = True
    ) -> "DataFrame | list[Row] | object | None":
        """Run statements sequentially, return the last result.

        The reference's script surface mixes SET/DDL/DML/SELECT in one
        file (connector/snowpark_connector.py:1238-1272), so DML-shaped
        statements (``MERGE INTO`` / ``DELETE FROM`` / ``UPDATE``)
        whose target is registered for SQL DML
        (``register_wap_view(..., dml=True)``) dispatch to
        :func:`operators.sql_dml.execute_dml` — executed EAGERLY (they
        mutate), their result object (``WapMergeResult``/``DmlResult``)
        becoming the statement's result. A MERGE against an
        unregistered target raises a named error (plain ``spark.sql``
        cannot run MERGE over parquet paths); DELETE/UPDATE on
        unregistered names fall through to ``spark.sql`` so catalog
        v2-table statements keep working. Session variables render
        before dispatch, exactly as for queries."""
        from etl_reporting_spark.operators.sql_dml import (
            SqlDmlError,
            dml_target_registered,
            execute_ddl,
            execute_dml,
            statement_ddl_target,
            statement_dml_target,
        )

        result: DataFrame | list[Row] | object | None = None
        for stmt in statements:
            stmt = stmt.strip().rstrip(";")
            if not stmt:
                continue
            # SET $VAR = value → session variable (the reference's
            # script-level SET, connector:195-238); non-$ SET text
            # falls through to spark.sql (Spark conf) untouched
            set_m = re.match(
                r"(?is)^SET\s+\$(\w+)\s*=\s*(.+)$", stmt
            )
            if set_m:
                raw = set_m.group(2).strip()
                if len(raw) >= 2 and raw[0] == raw[-1] == "'":
                    raw = raw[1:-1].replace("''", "'")
                self.set_session_variables(**{set_m.group(1): raw})
                continue
            rendered = self._render_session_vars(stmt)
            ddl = statement_ddl_target(rendered)
            if ddl is not None and dml_target_registered(ddl[1]):
                # ALTER TABLE / ANALYZE TABLE against a registered WAP
                # target — constraint DDL, schema evolution, ANALYZE
                # route onto the table API; unregistered names fall
                # through to spark.sql (catalog v2 behavior intact)
                result = execute_ddl(self.spark, rendered)
                continue
            dml = statement_dml_target(rendered)
            if dml is not None:
                op, target = dml
                if dml_target_registered(target):
                    result = execute_dml(self.spark, rendered)
                    continue
                if op == "MERGE":
                    raise SqlDmlError(
                        f"MERGE INTO {target}: target is not registered for "
                        "SQL DML — register_wap_view(spark, path, "
                        f"{target!r}, dml=True) first (Spark SQL has no "
                        "MERGE over plain parquet)"
                    )
            result = self.execute_query(stmt, lazy=lazy)
        return result

    def execute_query_from_file(
        self,
        path: str | Path,
        substitutions: dict[str, str] | None = None,
        incremental_column: str | None = None,
        last_load_value: str | None = None,
        lazy: bool = True,
    ) -> DataFrame | list[Row]:
        """Load a .sql file, substitute ``{{PLACEHOLDERS}}`` (structural
        names) and ``$SESSION_VARS``, optionally inject the incremental
        high-water-mark predicate, then execute."""
        text = Path(path).read_text()
        text = render_template(text, substitutions or {})
        text = inject_incremental_predicate(text, incremental_column, last_load_value)
        return self.execute_query(text, lazy=lazy)

    # ---------------------------------------------------- session vars
    def set_session_variables(self, **variables: str) -> None:
        """Analogue of SET $VAR = value (connector:195-238); rendered
        Python-side at query time so literals constant-fold."""
        self.session_variables.update({k.upper(): str(v) for k, v in variables.items()})

    def _render_session_vars(self, text: str) -> str:
        for key, value in sorted(self.session_variables.items(), key=lambda kv: -len(kv[0])):
            text = re.sub(rf"\${key}\b", f"'{_sql_quote(value)}'", text, flags=re.IGNORECASE)
        return text

    # ------------------------------------------------------------ sinks
    def save_as_table(
        self,
        df: DataFrame,
        name: str,
        write_mode: WriteMode = WriteMode.OVERWRITE,
        table_type: TableType = TableType.PERMANENT,
    ) -> None:
        _validate_identifier(name)
        if table_type is TableType.TEMPORARY:
            # Temp tables live for the session only → temp view. Write
            # modes degenerate: overwrite/truncate replace, append unions.
            if write_mode is WriteMode.APPEND and self._temp_view_exists(name):
                df = self.spark.table(name).unionByName(df)
            elif write_mode is WriteMode.ERROR_IF_EXISTS and self._temp_view_exists(name):
                raise ValueError(f"temporary table {name} already exists")
            elif write_mode is WriteMode.IGNORE and self._temp_view_exists(name):
                return
            df.createOrReplaceTempView(name)
            return
        if table_type is TableType.TRANSIENT:
            # Cheap reusable intermediate: cached temp view (see module doc).
            df.createOrReplaceTempView(name)
            self.spark.catalog.cacheTable(name)
            return
        if write_mode is WriteMode.TRUNCATE:
            # TRUNCATE mode = keep schema, replace rows.
            if self.table_exists(name):
                self.spark.sql(f"TRUNCATE TABLE {name}")
                df.write.mode("append").saveAsTable(name)
            else:
                df.write.mode("overwrite").saveAsTable(name)
            return
        df.write.mode(write_mode.value).saveAsTable(name)

    def save_as_view(
        self, df: DataFrame, name: str, replace: bool = True, permanent: bool = False
    ) -> None:
        """Store a DataFrame as a named view (reference ``save_as_view``,
        connector/snowpark_connector.py:511-566).

        ``permanent=False`` → session-scoped temp view (zero
        materialization). ``permanent=True`` → catalog-backed view: the
        reference extracts the DataFrame's own SQL plan and stores it;
        Spark DataFrames don't carry SQL, so the engine reuses the
        defining SQL it recorded when the frame came from
        :meth:`execute_query` / :meth:`execute_query_from_file`. The
        SQL must reference catalog objects (Spark rejects permanent
        views over temp views). For API-built frames pass the SQL
        explicitly via :meth:`create_permanent_view`."""
        _validate_identifier(name)
        if permanent:
            sql = getattr(df, "_engine_sql", None)
            if sql is None:
                raise ValueError(
                    f"cannot store {name!r} as a permanent view: the DataFrame "
                    "carries no defining SQL (it was not produced by "
                    "Engine.execute_query). Use create_permanent_view(name, sql) "
                    "or save_as_table for API-built frames."
                )
            self.create_permanent_view(name, sql, replace=replace)
            return
        if replace:
            df.createOrReplaceTempView(name)
        else:
            df.createTempView(name)

    def create_permanent_view(self, name: str, sql: str, replace: bool = True) -> None:
        """Catalog-backed ``CREATE [OR REPLACE] VIEW`` — the persistent
        view sink of the reference's ``save_as_view``
        (connector/snowpark_connector.py:511-566), which stores the
        defining SQL in the catalog rather than a session-scoped alias.
        The SQL must reference catalog objects (Spark rejects permanent
        views over temp views); session variables render first, so the
        stored definition carries the resolved literals."""
        _validate_identifier(name)
        clause = "CREATE OR REPLACE VIEW" if replace else "CREATE VIEW"
        self.spark.sql(f"{clause} {name} AS {self._render_session_vars(sql)}")

    def drop_view(self, name: str, if_exists: bool = True) -> None:
        _validate_identifier(name)
        self.spark.sql(f"DROP VIEW {'IF EXISTS ' if if_exists else ''}{name}")

    def stage_table(self, df: DataFrame, name: str) -> DataFrame:
        """Materialize an intermediate for reuse across steps."""
        self.save_as_table(df, name, WriteMode.OVERWRITE, TableType.TRANSIENT)
        return self.spark.table(name)

    def get_query_history(
        self, n: int = 100, object_name: str | None = None, log_table: str = "execution_log"
    ) -> DataFrame:
        """Recent engine executions, newest first (reference
        ``get_query_history``, connector/snowpark_connector.py:585-601)
        — the read-back face of the ExecutionLog audit sink."""
        from etl_reporting_spark.datafeeds.writers import ExecutionLog

        return ExecutionLog(self.spark, table=log_table).recent(n, object_name=object_name)

    # ---------------------------------------------------------- catalog
    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def table_exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(name)

    def _temp_view_exists(self, name: str) -> bool:
        return any(
            v.name.lower() == name.lower() for v in self.spark.catalog.listTables() if v.isTemporary
        )

    def truncate_table(self, name: str) -> None:
        _validate_identifier(name)
        self.spark.sql(f"TRUNCATE TABLE {name}")

    def analyze_table(self, name: str, columns: "Sequence[str] | None" = None) -> None:
        """Collect table (and optionally column) statistics for the
        cost-based optimizer — the engine-side analogue of the
        warehouse's automatic stats. Row count/size drive join-order
        and broadcast decisions; column NDV/min/max feed selectivity
        estimates. Run after bulk loads of recurring-join tables
        (merge targets, dims) — at 100 TB a mis-sized broadcast or a
        bad join order costs far more than the stats scan."""
        _validate_identifier(name)
        if isinstance(columns, str):
            columns = [columns]
        if columns:
            for c in columns:
                _validate_identifier(c)
            cols = ", ".join(columns)
            self.spark.sql(
                f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}"
            )
        else:
            self.spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")

    def drop_table(self, name: str, if_exists: bool = True) -> None:
        _validate_identifier(name)
        self.spark.sql(f"DROP TABLE {'IF EXISTS ' if if_exists else ''}{name}")

    def drop_managed_table(self, name: str) -> None:
        """DROP TABLE IF EXISTS plus warehouse-directory cleanup. The
        in-memory catalog forgets tables across sessions while their
        managed locations persist on disk, so a later CREATE in a new
        session fails with LOCATION_ALREADY_EXISTS; removing the stale
        directory makes table (re)creation session-restart-safe."""
        _validate_identifier(name)
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        jvm = self.spark._jvm
        warehouse = self.spark.conf.get("spark.sql.warehouse.dir")
        path = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{name.lower()}")
        fs = path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)

    def create_table_from_ddl(self, ddl: str, substitutions: dict[str, str] | None = None) -> None:
        self.spark.sql(render_template(ddl, substitutions or {}))

    # --------------------------------------------------------- testdata
    def register_testdata(self, sf_dir: str, tables: Iterable[str] = TESTDATA_TABLES) -> None:
        """Register the driver's parquet tables as temp views."""
        for name in tables:
            load_table(self.spark, sf_dir, name).createOrReplaceTempView(name)


# ------------------------------------------------------------- helpers

def _sql_quote(value: str) -> str:
    """Escape a value for interpolation inside a single-quoted SQL
    literal: doubles embedded quotes (so O'BRIEN renders safely) and
    rejects backslash trickery by doubling backslashes too."""
    return str(value).replace("\\", "\\\\").replace("'", "''")


def render_template(text: str, substitutions: dict[str, str]) -> str:
    """``{{PLACEHOLDER}}`` structural substitution (case-insensitive),
    mirroring connector:346-424 / tools/datamart_utils.py:40-63."""
    for key, value in substitutions.items():
        text = re.sub(
            r"\{\{\s*" + re.escape(key) + r"\s*\}\}", str(value), text, flags=re.IGNORECASE
        )
    return text


def inject_incremental_predicate(
    text: str, incremental_column: str | None, last_load_value: str | None
) -> str:
    """High-water-mark predicate injection via ``{{AND_CONDITION}}`` /
    ``{{WHERE_CONDITION}}`` markers (connector:425-453). With no
    incremental config the markers collapse to nothing (full load)."""
    if incremental_column and last_load_value is not None:
        hwm = _sql_quote(last_load_value)
        and_cond = f" AND ({incremental_column}) > '{hwm}'"
        where_cond = f" WHERE ({incremental_column}) > '{hwm}'"
    else:
        and_cond = ""
        where_cond = ""
    text = re.sub(r"\{\{\s*AND_CONDITION\s*\}\}", and_cond, text, flags=re.IGNORECASE)
    text = re.sub(r"\{\{\s*WHERE_CONDITION\s*\}\}", where_cond, text, flags=re.IGNORECASE)
    return text


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver parquet table, adapting to the session's view of
    physical quirks — without mutating any session conf (the driver
    passes its own SparkSession; loaders must be side-effect-free).

    ``events.ts`` is written as TIMESTAMP(NANOS). Spark 4.1 reads it
    natively as TIMESTAMP_NTZ (µs-truncated; the data is µs-aligned so
    this is lossless and matches DuckDB's view of the column). If the
    caller's session opted into the legacy
    ``spark.sql.legacy.parquet.nanosAsLong`` read, the column arrives
    as raw int64 nanos and is converted here.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # `div` (integer division) — a double divide would round in the
        # last ~3 digits at epoch-nanos magnitude (2^53 < 1.7e18).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def events_at_or_before(spark: SparkSession, sf_dir: str, cutoff) -> DataFrame:
    """Pushdown-aware point-in-time scan of the events stream.

    The cutoff is compared against the scan column in the column's own
    type — a plain ``col <= literal`` the parquet reader pushes to
    row-group statistics (``PushedFilters`` in the plan). On Spark 4.1
    the TIMESTAMP(NANOS) column reads as TIMESTAMP_NTZ, so the literal
    is cast to ``timestamp_ntz`` (constant-folded; an uncast TIMESTAMP
    literal would wrap the column in a cast and block pushdown). On a
    legacy ``nanosAsLong`` session the same cutoff pushes as a raw
    int64-nanos comparison. On a 100 TB date-partitioned fact the same
    idea is partition pruning; on the driver's single-file testdata
    it's row-group pruning.
    """
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        if isinstance(cutoff, str):
            cutoff = dt.datetime.fromisoformat(cutoff)
        # exact integer epoch arithmetic (naive datetime == UTC wall time)
        micros = (cutoff - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        cutoff_ns = micros * 1000
        return df.filter(F.col("ts") <= F.lit(cutoff_ns)).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    target = "timestamp_ntz" if isinstance(ts_type, TimestampNTZType) else "timestamp"
    return df.filter(F.col("ts") <= F.lit(cutoff).cast(target))


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver parquet table, returning name → DataFrame."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
