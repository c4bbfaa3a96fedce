"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM data pipelines actually exchange corpora in (one document object
per line, gzip-sharded).

Spark's native json reader/writer IS line-delimited, so both
directions stay fully distributed (no driver collect, splittable
shards). The functions here pin the scale-safe defaults the raw API
leaves open:

- **Read with an explicit schema.** Schema inference is a full extra
  pass over 100 TB before the real read; ``read_jsonl`` takes the
  schema up front and only falls back to sampling-based inference
  when the caller explicitly passes ``schema=None, infer=True``.
- **Quarantine, don't crash, don't silently drop.** PERMISSIVE mode
  with a named corrupt-record column: malformed lines land in
  ``_corrupt_record`` with every data column null, so a curation run
  can count/route them (``split_corrupt``) instead of dying 90 TB in
  (FAILFAST) or losing them unaccounted (DROPMALFORMED).
- **Write sharded + compressed.** gzip by default (the corpus
  interchange convention); shard count is the input partitioning
  unless ``partitions`` repartitions first — at target shard sizes of
  ~256 MB compressed, never one file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    infer: bool = False,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Distributed JSONL read with quarantine semantics.

    With ``schema``: PERMISSIVE parse; lines that don't parse (or
    carry a field the schema's type can't hold) appear with
    ``corrupt_col`` holding the raw line and the unparseable fields
    null; lines merely missing optional fields are NOT corrupt. The
    corrupt column is appended to the caller's schema automatically.

    Implementation is ``text`` source + ``from_json`` rather than the
    raw json source: identical parse semantics, but the result is an
    ordinary frame — Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
    restriction (which otherwise forces callers to cache the parsed
    corpus before routing the quarantine) never applies, and the scan
    stays a single distributed pass with no cache.

    Without a schema, ``infer=True`` must be passed explicitly —
    inference is an extra full scan and is partition-order-dependent
    for conflicting types, so it is never the silent default.
    """
    if schema is None:
        if not infer:
            raise ValueError(
                "read_jsonl without a schema requires infer=True — schema "
                "inference is a full extra pass over the data; pass the "
                "schema explicitly in production"
            )
        return spark.read.json(path)
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if corrupt_col not in [f.name for f in schema.fields]:
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
        )
    parsed = spark.read.text(path).select(
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("r")
    )
    return parsed.select("r.*")


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the corrupt column dropped,
    and the raw text of every malformed line for routing/counting —
    plain filters over the from_json-parsed frame, so no cache and no
    corrupt-column query restriction."""
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    partitions: int | None = None,
    overwrite: bool = True,
) -> None:
    """Distributed sharded JSONL write (one JSON object per line per
    row). ``partitions`` repartitions for shard-count control — size
    shards to ~256 MB compressed at scale; gzip is the corpus
    interchange default (splittability comes from sharding, not the
    codec)."""
    if partitions is not None:
        df = df.repartition(partitions)
    w = df.write.mode("overwrite" if overwrite else "errorifexists")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
