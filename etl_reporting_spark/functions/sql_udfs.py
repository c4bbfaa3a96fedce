"""Named SQL scalar UDFs — the engine-resident equivalent of the
reference's database-side scalar functions.

The reference's report SQL calls ``FM_WORKINGDAYSBETWEEN`` as a
pre-existing UDF in the target database (…detail.sql:121, defined
outside the repo in the ``reference`` schema). Here the same-named
function is registered as a Spark **SQL UDF** (CREATE TEMPORARY
FUNCTION … RETURN <expr>) — a pure expression, so it inlines into
whole-stage codegen with zero serialization cost, unlike a Python
UDF. Report SQL files can then call it exactly as the reference's do.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Closed-form Mon–Fri day count, same derivation as
# functions.datetime_fns.working_days_between (property-tested there).
_WORKING_DAYS_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION fm_workingdaysbetween(s DATE, e DATE)
RETURNS INT
RETURN CASE
  WHEN s IS NULL OR e IS NULL THEN NULL
  WHEN e < s THEN 0
  ELSE CAST(
      FLOOR((DATEDIFF(e, s) + 1) / 7) * 5
    + GREATEST(LEAST((DATEDIFF(e, s) + 1) % 7, 5 - (DAYOFWEEK(s) + 5) % 7), 0)
    + LEAST(GREATEST((DAYOFWEEK(s) + 5) % 7 + (DATEDIFF(e, s) + 1) % 7 - 7, 0), 5)
    AS INT)
END
"""

_STRIP_DOMAIN_SQL = r"""
CREATE OR REPLACE TEMPORARY FUNCTION strip_domain_prefix(u STRING)
RETURNS STRING
RETURN CASE WHEN contains(u, '\\') THEN substring_index(u, '\\', -1) ELSE u END
"""


def register_sql_udfs(spark: SparkSession) -> None:
    """Install the engine's named scalar functions into the session
    (idempotent). Called by the report runner so templated SQL files
    can reference them like the reference's database UDFs."""
    spark.sql(_WORKING_DAYS_SQL)
    spark.sql(_STRIP_DOMAIN_SQL)
