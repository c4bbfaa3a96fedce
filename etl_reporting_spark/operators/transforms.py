"""Hidden partitioning for WAP tables — Iceberg's partition
transforms, Spark-first.

The reference partitions tables on physical columns the writer must
pre-compute and the reader must know about (its loader scripts derive
period columns by hand before every write —
connector/datamart_utils.py's period-column helpers — and every query
must filter on the derived column to prune). Iceberg's insight is that
the TRANSFORM belongs to the table, not the query: the table's spec
says ``months(o_orderdate)`` once, writes derive the partition value
automatically, reads never see it, and a range predicate on the RAW
column prunes partitions because the transform is monotonic.

At 100 TB this is the difference between "every analyst remembers to
add ``AND order_month BETWEEN ...`` or full-scans seven years of
facts" and "the engine prunes from the predicate they already wrote".

Supported transforms (the Iceberg set, minus ``void``):

=============  =============================  ==========================
spec           write-side derivation           prune capability
=============  =============================  ==========================
identity       none (raw column)               range + equality
years(c)       ``date_format(c,'yyyy')``       range + equality (monotonic)
months(c)      ``date_format(c,'yyyy-MM')``    range + equality (monotonic)
days(c)        ``date_format(c,'yyyy-MM-dd')`` range + equality (monotonic)
hours(c)       ``'yyyy-MM-dd-HH'``             range + equality (monotonic)
bucket(n, c)   ``pmod(crc32(cast(c as         equality / IN only —
               string)), n)``                  hash destroys order
truncate(w,c)  int: ``c - pmod(c, w)``         range + equality (monotonic)
               str: ``substring(c, 1, w)``
=============  =============================  ==========================

``bucket`` uses CRC-32 over the string form of the value rather than
Spark's Murmur3 ``hash()`` deliberately: zlib's ``crc32`` computes the
identical value driver-side, so prune-time bucket assignment of a
literal is pure Python — no one-row Spark job per prune call — and the
choice is independently checkable outside the JVM. CRC-32 is a weaker
mixer than Murmur3, which is acceptable for partition fan-out (it is
uniform on dense and on string keys; it is not used for joins or
security).

The spec is committed once (``partition_spec`` in the v1 record) and
inherited by every subsequent commit through the centralized sticky-
key carry in ``WapTable._publish`` — a maintenance compaction or a
DV delete cannot shed it. ``open_wap_table`` re-hydrates a
:class:`HiddenPartitionedWapTable` whenever the record carries a spec.

The spec is FIXED at table creation — deliberately. Iceberg-style
spec EVOLUTION (changing ``months`` to ``days`` mid-life) leaves old
partitions under the old layout, which makes pruning era-aware and —
the dangerous half — makes every upsert's partition pruning blind to
matching rows living in old-era partitions (silent duplicates).
Supporting it honestly needs residual-filter reads and full-scan
merges across eras; until then, re-spec = rewrite into a new table,
and this docstring is the named refusal rather than a latent bug.
"""

from __future__ import annotations

import datetime as _dt
import re
import zlib
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_reporting_spark.operators.table_storage import TableStorage
from etl_reporting_spark.operators.wap import (
    CommitStore,
    PartitionedWapTable,
)

_TIME_FORMATS = {
    "years": "yyyy",
    "months": "yyyy-MM",
    "days": "yyyy-MM-dd",
    "hours": "yyyy-MM-dd-HH",
}

_PY_TIME_FORMATS = {
    "years": "%Y",
    "months": "%Y-%m",
    "days": "%Y-%m-%d",
    "hours": "%Y-%m-%d-%H",
}

_SPEC_RE = re.compile(
    r"^\s*(?:(?P<kind>[a-z]+)\s*\(\s*(?:(?P<param>\d+)\s*,\s*)?"
    r"(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*\)|(?P<bare>[A-Za-z_][A-Za-z0-9_]*))\s*$"
)


@dataclass(frozen=True)
class Transform:
    """One level of a hidden-partitioning spec.

    ``value_type`` records how partition-path values parse back for
    prune-time comparison (``"int"`` or ``"string"``): hive path
    values are strings, and ``truncate`` on an int column must compare
    numerically (``"9" < "10"`` only as ints). It is resolved from the
    source column's Spark type at table-creation time and persisted in
    the spec — prune never needs the data schema again."""

    kind: str
    source: str
    param: int | None = None
    value_type: str = "string"

    @property
    def target(self) -> str:
        """Name of the derived partition column (hidden on read)."""
        if self.kind == "identity":
            return self.source
        return f"_p_{self.source}_{self.kind}"

    @property
    def monotonic(self) -> bool:
        """Order-preserving transforms support range pruning."""
        return self.kind != "bucket"

    # ---------------------------------------------------------- write
    def column(self) -> Column:
        """The write-side derivation expression (JVM-only, no UDF)."""
        c = F.col(self.source)
        if self.kind == "identity":
            return c
        if self.kind in _TIME_FORMATS:
            return F.date_format(c, _TIME_FORMATS[self.kind])
        if self.kind == "bucket":
            return F.pmod(F.crc32(c.cast("string")), F.lit(self.param)).cast(
                "int"
            )
        if self.kind == "truncate":
            if self.value_type == "int":
                return (c - F.pmod(c, F.lit(self.param))).cast("long")
            return F.substring(c, 1, self.param)
        raise ValueError(f"unknown transform kind: {self.kind}")

    # ------------------------------------------------- driver litermal
    def apply_literal(self, value):
        """Transform a raw-column literal to its partition value —
        pure Python, mirroring :meth:`column` exactly (the bucket
        CRC-32 choice exists for this mirror). Used by prune."""
        if value is None:
            return None
        if self.kind == "identity":
            return value
        if self.kind in _PY_TIME_FORMATS:
            if isinstance(value, str):
                value = _dt.datetime.fromisoformat(value)
            if isinstance(value, _dt.datetime) or isinstance(value, _dt.date):
                return value.strftime(_PY_TIME_FORMATS[self.kind])
            raise TypeError(
                f"{self.kind}({self.source}) bound must be a date/datetime/"
                f"ISO string, got {type(value).__name__}"
            )
        if self.kind == "bucket":
            # Spark: pmod(crc32(cast(value as string)), n). Spark's
            # string form of int/long/date literals equals Python's.
            if isinstance(value, bool) or not isinstance(value, (int, str)):
                raise TypeError(
                    f"bucket({self.source}) prunes on int/string equality "
                    f"only, got {type(value).__name__}"
                )
            return zlib.crc32(str(value).encode()) % self.param
        if self.kind == "truncate":
            if self.value_type == "int":
                return int(value) - (int(value) % self.param)
            return str(value)[: self.param]
        raise ValueError(f"unknown transform kind: {self.kind}")

    def parse_path_value(self, raw: str | None):
        """Parse a hive-path partition value back to comparable form."""
        if raw is None:
            return None
        return int(raw) if self.value_type == "int" else raw

    # ------------------------------------------------------- metadata
    def as_json(self) -> dict:
        return {
            "kind": self.kind,
            "source": self.source,
            "param": self.param,
            "value_type": self.value_type,
        }

    @staticmethod
    def from_json(d: dict) -> "Transform":
        return Transform(
            kind=d["kind"],
            source=d["source"],
            param=d.get("param"),
            value_type=d.get("value_type", "string"),
        )


def parse_transform(spec: str) -> Transform:
    """Parse ``"months(o_orderdate)"`` / ``"bucket(16, c_custkey)"`` /
    ``"truncate(4, p_type)"`` / bare ``"region"`` (identity).
    ``value_type`` is resolved later against the data schema."""
    m = _SPEC_RE.match(spec)
    if not m:
        raise ValueError(f"unparseable partition transform: {spec!r}")
    if m.group("bare"):
        return Transform(kind="identity", source=m.group("bare"))
    kind, param, col = m.group("kind"), m.group("param"), m.group("col")
    if kind in _TIME_FORMATS:
        if param is not None:
            raise ValueError(f"{kind}() takes no width parameter: {spec!r}")
        return Transform(kind=kind, source=col)
    if kind in ("bucket", "truncate"):
        if param is None or int(param) <= 0:
            raise ValueError(f"{kind}() needs a positive parameter: {spec!r}")
        return Transform(kind=kind, source=col, param=int(param))
    raise ValueError(
        f"unknown transform {kind!r} (supported: identity, years, months, "
        f"days, hours, bucket, truncate): {spec!r}"
    )


def _resolve_value_types(
    transforms: Sequence[Transform], df: DataFrame
) -> list[Transform]:
    """Pin each transform's ``value_type`` (and sanity-check the
    source column exists / has a usable type) against the DataFrame
    the table is created from."""
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    out: list[Transform] = []
    for t in transforms:
        if t.source not in types:
            raise ValueError(
                f"transform source column {t.source!r} not in schema "
                f"{sorted(types)}"
            )
        st = types[t.source]
        if t.kind in _TIME_FORMATS and st not in (
            "date",
            "timestamp",
            "timestamp_ntz",
        ):
            raise ValueError(
                f"{t.kind}({t.source}) needs a date/timestamp column, "
                f"got {st}"
            )
        if t.kind == "bucket" and st not in (
            "integer",
            "long",
            "short",
            "byte",
            "string",
        ):
            raise ValueError(
                f"bucket({t.source}) supports int/long/string keys "
                f"(exactly the types whose Spark string cast matches "
                f"Python's str()), got {st}"
            )
        vt = "string"
        if t.kind == "bucket":
            vt = "int"
        elif t.kind == "truncate":
            if st in ("integer", "long", "short", "byte"):
                vt = "int"
            elif st != "string":
                raise ValueError(
                    f"truncate({t.source}) supports int/string, got {st}"
                )
        elif t.kind == "identity" and st in ("integer", "long", "short", "byte"):
            vt = "int"
        out.append(
            Transform(kind=t.kind, source=t.source, param=t.param, value_type=vt)
        )
    return out


class HiddenPartitionedWapTable(PartitionedWapTable):
    """A :class:`PartitionedWapTable` whose physical partition columns
    are DERIVED from raw columns by the table's transform spec.

    Writes derive automatically (``commit_partitions`` /
    ``commit_partition_files`` / ``upsert_rows_dv`` wrap the batch);
    reads hide the derived columns (pass
    ``expose_partition_cols=True`` to see them); ``prune`` maps a
    predicate on the RAW column to partition keys at the metadata
    layer — no filesystem, no scan, no job (the bucket hash is
    computed driver-side by construction)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        transforms: Sequence[Transform],
        store: CommitStore | None = None,
        storage: TableStorage | None = None,
    ) -> None:
        self.transforms = list(transforms)
        super().__init__(
            spark,
            path,
            [t.target for t in self.transforms],
            store=store,
            storage=storage,
        )

    # ------------------------------------------------------- plumbing
    @property
    def _derived(self) -> list[Transform]:
        return [t for t in self.transforms if t.kind != "identity"]

    def derive(self, df: DataFrame) -> DataFrame:
        """Append the derived partition columns to a batch. Refuses a
        batch that already carries a column with a derived name — the
        caller-supplied value could disagree with the transform and
        silently misplace rows."""
        for t in self._derived:
            if t.target in df.columns:
                raise ValueError(
                    f"batch already has a column named {t.target!r} — "
                    "derived partition columns are computed by the table, "
                    "not supplied"
                )
        for t in self._derived:
            df = df.withColumn(t.target, t.column())
        return df

    # --------------------------------------------------------- writes
    def commit_partitions(self, df: DataFrame, **kwargs) -> int:
        return super().commit_partitions(self.derive(df), **kwargs)

    def commit_partition_files(self, df: DataFrame, *args, **kwargs) -> int:
        return super().commit_partition_files(self.derive(df), *args, **kwargs)

    def upsert_rows_dv(self, source: DataFrame, *args, **kwargs):
        return super().upsert_rows_dv(self.derive(source), *args, **kwargs)

    def append_rows(self, df: DataFrame, **kwargs) -> int:
        return super().append_rows(self.derive(df), **kwargs)

    # ---------------------------------------------------------- reads
    def read(
        self,
        version: int | None = None,
        partitions: Sequence[str] | None = None,
        expose_partition_cols: bool = False,
    ) -> DataFrame:
        df = super().read(version=version, partitions=partitions)
        if expose_partition_cols:
            return df
        return df.drop(*[t.target for t in self._derived])

    # ---------------------------------------------------------- prune
    def _transform_for(self, col: str) -> Transform:
        for t in self.transforms:
            if t.source == col:
                return t
        raise KeyError(
            f"no partition transform over column {col!r} "
            f"(spec: {[t.as_json() for t in self.transforms]})"
        )

    def prune(
        self,
        col: str,
        lo=None,
        hi=None,
        eq=None,
        isin: Sequence | None = None,
        version: int | None = None,
    ) -> list[str]:
        """Partition keys that MAY hold rows matching a predicate on
        raw column ``col`` — pure metadata, conservative (a returned
        partition may still need the residual filter; a dropped one
        provably cannot match). Range bounds (``lo``/``hi``,
        inclusive) require a monotonic transform; ``eq``/``isin``
        work on every transform including ``bucket``. Feed the result
        to ``read(partitions=...)`` and keep the original predicate
        as the residual filter."""
        t = self._transform_for(col)
        if eq is not None:
            isin = [eq]
        if isin is not None:
            targets = {t.apply_literal(v) for v in isin}
            return self._keys_matching(t, lambda pv: pv in targets, version)
        if not t.monotonic:
            raise ValueError(
                f"bucket({col}) destroys order — range pruning is "
                "impossible; use eq=/isin= or scan all partitions"
            )
        plo = t.apply_literal(lo) if lo is not None else None
        phi = t.apply_literal(hi) if hi is not None else None

        def overlap(pv) -> bool:
            if pv is None:
                return True  # null partition: cannot prove disjoint
            return (plo is None or pv >= plo) and (phi is None or pv <= phi)

        return self._keys_matching(t, overlap, version)

    def _keys_matching(self, t: Transform, pred, version) -> list[str]:
        keep = []
        for key in self.partition_map(version):
            raw = self.partition_key_values(key).get(t.target)
            if pred(t.parse_path_value(raw)):
                keep.append(key)
        return sorted(keep)

    def read_pruned(
        self,
        col: str,
        lo=None,
        hi=None,
        eq=None,
        isin: Sequence | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """``prune`` + ``read(partitions=...)`` + the RESIDUAL filter
        on the raw column, in one call — the complete hidden-
        partitioning read: the caller writes the predicate they mean,
        partition pruning falls out of the table's spec."""
        keys = self.prune(col, lo=lo, hi=hi, eq=eq, isin=isin, version=version)
        df = self.read(version=version, partitions=keys)
        c = F.col(col)
        if eq is not None:
            return df.filter(c == F.lit(eq))
        if isin is not None:
            return df.filter(c.isin(list(isin)))
        if lo is not None:
            df = df.filter(c >= F.lit(lo))
        if hi is not None:
            df = df.filter(c <= F.lit(hi))
        return df


def create_hidden_partitioned_wap_table(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition_spec: Sequence[str],
    store: CommitStore | None = None,
    stats_cols: Sequence[str] | None = None,
    storage: TableStorage | None = None,
) -> HiddenPartitionedWapTable:
    """Initialize a hidden-partitioned WAP table: parse the spec, pin
    value types against ``df``'s schema, commit v1 with the derived
    layout and the spec in the record (inherited forever after via
    the sticky-key carry)."""
    transforms = _resolve_value_types(
        [parse_transform(s) for s in partition_spec], df
    )
    table = HiddenPartitionedWapTable(
        spark, path, transforms, store=store, storage=storage
    )
    table.fs.prepare_root()
    if table.current_version() != 0:
        raise FileExistsError(f"WAP table already exists at {path}")
    table.commit_partitions(
        df,
        operation="create",
        stats_cols=stats_cols,
        extra={"partition_spec": [t.as_json() for t in transforms]},
    )
    return table


def open_hidden_partitioned_wap_table(
    spark: SparkSession,
    path: str,
    store: CommitStore | None = None,
    storage: TableStorage | None = None,
) -> HiddenPartitionedWapTable:
    """Re-hydrate a hidden-partitioned table from its committed spec."""
    probe = PartitionedWapTable(spark, path, [], store=store, storage=storage)
    v = probe.current_version()
    if v == 0:
        raise FileNotFoundError(f"no committed WAP table at {path}")
    rec = probe._commit_record(v)
    spec = rec.get("partition_spec")
    if not spec:
        raise ValueError(
            f"table at {path} has no partition_spec — open it with "
            "open_wap_table"
        )
    transforms = [Transform.from_json(d) for d in spec]
    return HiddenPartitionedWapTable(
        spark, path, transforms, store=store, storage=storage
    )
