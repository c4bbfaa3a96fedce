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

Partition-spec EVOLUTION (round-12; the round-11 named refusal,
closed): ``evolve_partition_spec`` commits a NEW spec as a
metadata-only commit — zero files rewritten. Old partitions stay
under the layout they were written with (their ERA); new writes land
under the current spec. Era handling, per operation:

- **prune / read_pruned**: union of per-era prunes. Each partition
  key is attributed to its era by its hive column sequence (eras are
  required to be layout-distinguishable at evolve time), pruned under
  that era's own transform, and the residual filter — always applied
  by ``read_pruned`` — covers whatever an era's weaker transform
  keeps extra. An era with no transform over the pruned column keeps
  all its keys (conservative, never wrong).
- **upsert_rows_dv**: the match scope unions per-era candidate keys —
  the source's raw columns are re-derived under EACH era's transforms
  (pure column expressions, one tiny distinct per old era), so a key
  living in an old-era partition is still found and retracted. This
  closes the silent-duplicates hazard the round-11 refusal named. If
  an old era partitioned on a column the source lacks, ALL that era's
  keys become candidates (conservative residual scan).
- **delete_rows**: already era-agnostic (scans the visible snapshot,
  predicate on raw columns).
- **commit_partitions / commit_partition_files** (partition
  OVERWRITE): REFUSED on a multi-era table — "replace partition
  1994-01" is ambiguous when era-0 partition ``1994`` also holds
  January rows. Use append/upsert/delete, or rewrite the era.

Iceberg precedent throughout: specs are versioned (spec-id per data
file there, era-per-partition-key here, recoverable from the key
itself because evolve enforces distinguishable layouts and Iceberg-
style field-name disambiguation — a re-parameterized ``bucket``
target gets the param suffixed, as Iceberg suffixes conflicting
partition-field names with the field id). Evolving BACK to a prior
era's exact layout is refused (attribution would be ambiguous);
rewrite into a new table for that.
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
    AuditError,
    CommitStore,
    PartitionedWapTable,
    hive_partition_key,
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
    #: explicit target-column override — set by spec evolution when
    #: the default name would collide with a DIFFERENT transform from
    #: a prior era (Iceberg disambiguates conflicting partition-field
    #: names the same way, suffixing the field id)
    name: str | None = None

    @property
    def target(self) -> str:
        """Name of the derived partition column (hidden on read)."""
        if self.name is not None:
            return self.name
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
        out = {
            "kind": self.kind,
            "source": self.source,
            "param": self.param,
            "value_type": self.value_type,
        }
        if self.name is not None:
            out["name"] = self.name
        return out

    @staticmethod
    def from_json(d: dict) -> "Transform":
        return Transform(
            kind=d["kind"],
            source=d["source"],
            param=d.get("param"),
            value_type=d.get("value_type", "string"),
            name=d.get("name"),
        )

    def same_derivation(self, other: "Transform") -> bool:
        """True when the two transforms compute the same partition
        value from the same column (target naming aside)."""
        return (self.kind, self.source, self.param) == (
            other.kind,
            other.source,
            other.param,
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
    return _resolve_value_types_mapping(
        transforms, {f.name: f.dataType.typeName() for f in df.schema.fields}
    )


def _resolve_value_types_mapping(
    transforms: Sequence[Transform], types: dict[str, str]
) -> list[Transform]:
    """:func:`_resolve_value_types` against a column→Spark-typeName
    mapping (spec evolution resolves against the COMMITTED schema —
    there is no DataFrame in hand, only the commit record)."""
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
            Transform(
                kind=t.kind,
                source=t.source,
                param=t.param,
                value_type=vt,
                name=t.name,
            )
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

    # ----------------------------------------------------------- eras
    def _era_specs(self, version: int | None = None) -> list[list[Transform]]:
        """Every spec the table has lived under, oldest first; the
        last entry is the spec current AT ``version``. A never-evolved
        table has exactly one era. Metadata-only: one commit-record
        read."""
        v = version if version is not None else self.current_version()
        if v == 0:
            return [list(self.transforms)]
        rec = self._commit_record(v)
        hist = rec.get("partition_spec_history")
        if hist:
            return [[Transform.from_json(d) for d in era] for era in hist]
        spec = rec.get("partition_spec")
        if spec:
            return [[Transform.from_json(d) for d in spec]]
        return [list(self.transforms)]

    @staticmethod
    def _key_columns(key: str) -> list[str]:
        """Ordered hive column names of a partition key
        (``a=1/b=2`` → ``["a", "b"]``)."""
        return [seg.partition("=")[0] for seg in key.split("/")]

    def _era_of_key(self, key: str, eras: Sequence[Sequence[Transform]]) -> int:
        """Attribute a partition key to the era that wrote it, by its
        hive column sequence — well-defined because evolve refuses a
        spec whose layout duplicates any prior era's. Latest era wins
        a (theoretically impossible) tie."""
        cols = self._key_columns(key)
        for i in range(len(eras) - 1, -1, -1):
            if [t.target for t in eras[i]] == cols:
                return i
        raise AuditError(
            f"partition key {key!r} matches no era of the committed spec "
            f"history — corrupt record or foreign layout"
        )

    def _keys_by_era(
        self, version: int | None, eras: Sequence[Sequence[Transform]]
    ) -> dict[int, list[str]]:
        out: dict[int, list[str]] = {}
        for key in self.partition_map(version):
            out.setdefault(self._era_of_key(key, eras), []).append(key)
        return out

    def _live_old_era_keys(self, version: int | None = None) -> list[str]:
        """Live partition keys written under a NON-current era."""
        eras = self._era_specs(version)
        if len(eras) <= 1:
            return []
        by_era = self._keys_by_era(version, eras)
        cur = len(eras) - 1
        return sorted(
            k for e, ks in by_era.items() if e != cur for k in ks
        )

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
    def _refuse_overwrite_across_eras(self, op: str) -> None:
        """Partition OVERWRITE is era-ambiguous while old-era keys are
        live: "replace 1994-01" cannot also evict the January rows
        still held by era-0 partition "1994". Appends, DV upserts and
        deletes all stay era-correct; overwrite callers must first
        ``rewrite_era_partitions()`` (or scope to a fresh table)."""
        stale = self._live_old_era_keys()
        if stale:
            raise ValueError(
                f"{op} would overwrite partitions on a spec-evolved table "
                f"that still holds {len(stale)} old-era partition(s) (e.g. "
                f"{stale[0]!r}) — era-ambiguous. Use append_rows / "
                "upsert_rows_dv / delete_rows, or migrate the old eras "
                "first with rewrite_era_partitions()"
            )

    def commit_partitions(self, df: DataFrame, **kwargs) -> int:
        op = kwargs.get("operation")
        if op == "optimize":
            # compaction is content-preserving, so it is era-SAFE —
            # but only over CURRENT-era partitions: an old-era
            # partition's rows re-derive under the current spec and
            # would land outside the replace set (write-audit error).
            # Refuse those up front with the migration verb by name.
            stale = set(self._live_old_era_keys()) & set(
                kwargs.get("replace") or []
            )
            if stale:
                raise ValueError(
                    f"optimize cannot compact old-era partition(s) "
                    f"{sorted(stale)[:3]} in place — their rows re-derive "
                    "under the current spec; migrate them with "
                    "rewrite_era_partitions(partitions=...) instead "
                    "(auto_optimize routes this automatically)"
                )
        elif op != "create":
            self._refuse_overwrite_across_eras("commit_partitions")
        return super().commit_partitions(self.derive(df), **kwargs)

    def commit_partition_files(self, df: DataFrame, *args, **kwargs) -> int:
        self._refuse_overwrite_across_eras("commit_partition_files")
        return super().commit_partition_files(self.derive(df), *args, **kwargs)

    def upsert_rows_dv(self, source: DataFrame, *args, **kwargs):
        return super().upsert_rows_dv(self.derive(source), *args, **kwargs)

    def append_rows(self, df: DataFrame, **kwargs) -> int:
        return super().append_rows(self.derive(df), **kwargs)

    def _prepare_update_rows(self, updated: DataFrame) -> DataFrame:
        """Updated copies re-derive under the CURRENT spec: drop every
        era's stale derived values (an old-era row reads NULL for the
        current targets; its own era's targets aren't even in the
        committed schema) and derive fresh — which is what lands an
        updated old-era resident in the current layout."""
        stale = {
            t.target
            for era in self._era_specs()
            for t in era
            if t.kind != "identity"
        }
        return self.derive(updated.drop(*sorted(stale & set(updated.columns))))

    def _refuse_update_of_layout_columns(
        self, assignments: dict[str, object]
    ) -> None:
        derived = {
            t.target.lower()
            for era in self._era_specs()
            for t in era
            if t.kind != "identity"
        }
        bad = sorted(c for c in assignments if c.lower() in derived)
        if bad:
            raise ValueError(
                f"UPDATE assigns derived partition column(s) {bad} — the "
                "table computes those from its transform spec; assign the "
                "SOURCE column instead (re-derivation moves the row)"
            )

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
        # drop EVERY era's derived targets, not just the current
        # spec's: right after an evolve (before any new-spec write)
        # the committed schema still carries the old era's derived
        # columns, and they must stay hidden too
        hidden = {
            t.target
            for era in self._era_specs(version)
            for t in era
            if t.kind != "identity"
        }
        hidden.update(t.target for t in self._derived)
        return df.drop(*sorted(hidden & set(df.columns)))

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
        work on every transform including ``bucket``.

        On a spec-EVOLVED table this is the union of per-era prunes:
        each partition key is pruned under the transform of the era
        that wrote it. An era with no transform over ``col`` — or a
        bucket era asked a range question — keeps all its keys
        (conservative; the residual filter covers them). Feed the
        result to ``read(partitions=...)`` and keep the original
        predicate as the residual filter."""
        eras = self._era_specs(version)
        if not any(t.source == col for era in eras for t in era):
            # preserve the single-era programming-error signal
            self._transform_for(col)
        if eq is not None:
            isin = [eq]
        keep: list[str] = []
        by_era = self._keys_by_era(version, eras)
        for ei, era_keys in by_era.items():
            t = next((t for t in eras[ei] if t.source == col), None)
            if t is None:
                keep.extend(era_keys)  # era can't prune on col
                continue
            if isin is not None:
                targets = {t.apply_literal(v) for v in isin}
                pred = lambda pv, targets=targets: pv in targets  # noqa: E731
            else:
                if not t.monotonic:
                    if len(eras) == 1:
                        raise ValueError(
                            f"bucket({col}) destroys order — range pruning "
                            "is impossible; use eq=/isin= or scan all "
                            "partitions"
                        )
                    keep.extend(era_keys)  # this era can't range-prune
                    continue
                plo = t.apply_literal(lo) if lo is not None else None
                phi = t.apply_literal(hi) if hi is not None else None

                def pred(pv, plo=plo, phi=phi) -> bool:
                    if pv is None:
                        return True  # null partition: can't prove disjoint
                    return (plo is None or pv >= plo) and (
                        phi is None or pv <= phi
                    )

            for key in era_keys:
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

    # ------------------------------------------------------ evolution
    def evolve_partition_spec(self, new_spec: Sequence[str]) -> int:
        """Commit a NEW partition spec as a metadata-only commit —
        zero files rewritten (Iceberg ALTER TABLE ... REPLACE
        PARTITION FIELD). Old partitions stay under their era's
        layout; new writes derive under the new spec; prune and
        upsert become era-aware (module docstring). Returns the new
        version.

        Target-name disambiguation (Iceberg's conflicting-field-name
        rule): a new transform whose default target collides with a
        DIFFERENT derivation from any prior era gets the param (then
        the era index) suffixed, so every era's layout is
        distinguishable and key→era attribution stays a pure string
        match. Evolving back to a layout identical to a prior era is
        refused — attribution would be ambiguous; use a rewrite."""
        from pyspark.sql.types import StructType

        base = self.current_version()
        if base == 0:
            raise FileNotFoundError(
                f"no committed WAP table at {self.path} — the spec is set "
                "at creation; evolve applies to live tables"
            )
        rec = self._commit_record(base)
        eras = self._era_specs(version=base)
        schema = StructType.fromJson(rec["schema"])
        old_targets = {
            t.target for era in eras for t in era if t.kind != "identity"
        }
        types = {
            f.name: f.dataType.typeName()
            for f in schema.fields
            if f.name not in old_targets
        }
        parsed = [parse_transform(s) for s in new_spec]
        for t in parsed:
            if t.source in old_targets or t.source.startswith("_p_"):
                raise ValueError(
                    f"transform source {t.source!r} is a derived partition "
                    "column — specs derive from RAW columns only"
                )
        new_ts = _resolve_value_types_mapping(parsed, types)
        prior: dict[str, Transform] = {
            t.target: t for era in eras for t in era
        }
        final: list[Transform] = []
        for t in new_ts:
            if t.kind != "identity":
                clash = prior.get(t.target)
                if clash is not None and not clash.same_derivation(t):
                    for cand in (
                        f"_p_{t.source}_{t.kind}_{t.param}",
                        f"_p_{t.source}_{t.kind}_{t.param}_e{len(eras)}",
                        f"_p_{t.source}_{t.kind}_e{len(eras)}",
                    ):
                        if cand not in prior:
                            t = Transform(
                                kind=t.kind,
                                source=t.source,
                                param=t.param,
                                value_type=t.value_type,
                                name=cand,
                            )
                            break
                    else:
                        raise ValueError(
                            f"cannot disambiguate target name for {t} "
                            f"against prior eras {sorted(prior)}"
                        )
            final.append(t)
        new_targets = [t.target for t in final]
        for i, era in enumerate(eras):
            if [t.target for t in era] == new_targets:
                raise ValueError(
                    f"new spec's layout {new_targets} is identical to era "
                    f"{i}'s — evolving BACK to a prior layout is refused "
                    "(key→era attribution would be ambiguous); rewrite "
                    "into a new table instead"
                )
        history = rec.get("partition_spec_history") or [
            rec["partition_spec"]
        ]
        new_json = [t.as_json() for t in final]
        v = self._metadata_only_commit(
            base,
            {
                "partition_spec": new_json,
                "partition_spec_history": list(history) + [new_json],
            },
            operation="evolve-spec",
        )
        self.transforms = final
        self.partition_by = [t.target for t in final]
        return v

    def _match_scope_pkeys(
        self,
        source: DataFrame,
        base: int,
        touched_pkeys: Sequence[str],
    ) -> list[str]:
        """Era-aware upsert match scope: the write scope (current-era
        keys) plus, for every OLD era, the keys the source's raw
        columns derive to under THAT era's transforms — closing the
        old-era-duplicate hazard the fixed-spec refusal named. Cost:
        one tiny ``distinct().collect()`` per old era, bounded by the
        source's distinct partition values (same shape as the write
        scope's own collect). An old era whose source column the
        batch lacks contributes ALL its keys (conservative)."""
        eras = self._era_specs(version=base)
        if len(eras) <= 1:
            return list(touched_pkeys)
        by_era = self._keys_by_era(base, eras)
        out = set(touched_pkeys)
        src_cols = set(source.columns)
        for ei in range(len(eras) - 1):
            era = eras[ei]
            era_keys = by_era.get(ei, [])
            if not era_keys:
                continue
            if not all(t.source in src_cols for t in era):
                out.update(era_keys)
                continue
            targets = [t.target for t in era]
            vals = (
                source.select(
                    *[t.column().cast("string").alias(t.target) for t in era]
                )
                .distinct()
                .collect()
            )
            era_pkeys = {
                hive_partition_key(targets, tuple(r)) for r in vals
            }
            out.update(k for k in era_keys if k in era_pkeys)
        return sorted(out)

    def rewrite_era_partitions(
        self,
        partitions: Sequence[str] | None = None,
        stats_cols: Sequence[str] | None = None,
    ) -> int | None:
        """Migrate old-era partitions into the CURRENT spec's layout —
        the maintenance rewrite that makes spec evolution eventually
        free: reads the old-era partitions (DVs applied) plus any
        current-era partitions their rows re-derive into (those must
        merge, not be clobbered), re-derives, and commits one
        partition-scoped replace. Cost ∝ migrated partitions, never
        the table. Returns the new version, or None when nothing to
        migrate."""
        old_keys = (
            sorted(partitions)
            if partitions is not None
            else self._live_old_era_keys()
        )
        if not old_keys:
            return None
        rows = self.read(partitions=old_keys)
        derived = self.derive(rows)
        vals = (
            derived.select(
                *[F.col(c).cast("string") for c in self.partition_by]
            )
            .distinct()
            .collect()
        )
        new_keys = {
            hive_partition_key(self.partition_by, tuple(r)) for r in vals
        }
        existing = set(self.partition_map())
        overlap = sorted(new_keys & existing - set(old_keys))
        read_set = sorted(set(old_keys) | set(overlap))
        if overlap:
            rows = self.read(partitions=read_set)
            derived = self.derive(rows)
        return super().commit_partitions(
            derived,
            replace=sorted(set(read_set) | new_keys),
            operation="rewrite-era",
            stats_cols=stats_cols,
        )


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
