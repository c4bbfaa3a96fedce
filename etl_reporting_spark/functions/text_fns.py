"""String function library (SURVEY.md §2.8 string family).

Pure Column expressions; the only nontrivial reference construct is
the domain-prefix strip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_domain_prefix(col: Column) -> Column:
    """``DOMAIN\\user`` → ``user`` (…detail.sql:189-192): the reference
    spells it CASE + CONTAINS + SUBSTRING + CHARINDEX; the Spark-native
    form is substring_index on the last backslash."""
    return F.when(
        col.contains("\\"), F.substring_index(col, "\\", -1)
    ).otherwise(col)


def flag(cond: Column) -> Column:
    """Boolean-as-0/1 flag convention (…detail.sql:123,
    DMF_IMPLEMENTATION_GUIDE.md:389-406)."""
    return F.when(cond, F.lit(1)).otherwise(F.lit(0))
