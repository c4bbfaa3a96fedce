"""SQL DML surface for WAP tables — ``MERGE INTO`` / ``DELETE FROM``
/ ``UPDATE`` statement TEXT routed onto the transactional merge
ladder (round-10 brief #2).

The reference's upsert surface is *built as MERGE SQL text* (reference
connector/snowpark_connector.py:919-1004 — ``_build_merge_sql``
emits ``MERGE INTO … USING … ON target.k = source.k WHEN MATCHED
THEN UPDATE SET … WHEN NOT MATCHED THEN INSERT … VALUES … WHEN NOT
MATCHED BY SOURCE AND (…) THEN DELETE``), so a user porting a
reference pipeline reaches for ``MERGE INTO`` text. Spark SQL itself
has no MERGE against plain parquet; this module parses the statement
shape the reference generates (plus branch ``AND`` conditions,
arbitrary scalar RHS expressions, templating, and the matching
``DELETE FROM``/``UPDATE`` single-table forms) and routes it onto
the existing engine:

- ``MERGE INTO``   → :func:`operators.merge.merge_upsert`
  (``backend="wap"``) — the partition-scoped WAP commit path, with
  full branch metrics. Mutation counts therefore MATCH the
  DataFrame-API surface exactly (same classifier).
- ``DELETE FROM``  → :meth:`wap.PartitionedWapTable.delete_rows`
  (deletion vectors — zero data files rewritten).
- ``UPDATE``       → partition-granular rewrite via
  ``commit_partitions(replace=touched)``: the touched partition set
  is discovered from the WHERE predicate, only those partitions are
  rewritten with a ``CASE WHEN`` per assigned column, everything
  else is inherited verbatim. All assignments see PRE-update values
  (standard SQL UPDATE semantics) because they are computed in one
  ``select`` over the original columns.

Scale posture: parsing is driver-side string work on statement text
(bytes, not data); every data-touching step is the corresponding
merge-ladder operator, which carries its own cost-∝-touched-data
contract. Nothing here adds a shuffle, a collect over data, or a UDF.

Supported grammar (case-insensitive, whitespace-free-form,
``--`` comments stripped; CASE/WHEN/THEN/END inside scalar
expressions is handled by a depth-aware scanner, not naive split):

    MERGE INTO <target> [AS] [alias]
    USING (<subquery>) | <table_or_view> [AS] [alias]
    ON <t>.<k> = <s>.<k> [AND ...]          -- equi-conjunction only
    [WHEN MATCHED [AND <cond>] THEN UPDATE SET c = <expr>, ...]
    [WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN
        INSERT (<cols>) VALUES (<exprs>) | INSERT *]
    [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE]

    DELETE FROM <target> [AS alias] WHERE <cond>

    UPDATE <target> [AS alias] SET c = <expr>, ... WHERE <cond>

    INSERT INTO <target> [(cols)] SELECT ... | VALUES (...), (...)
        -- pure append (append_rows: new files only, nothing
        -- rewritten or masked); unlisted columns take NULL

Deliberate limits, each raising a clear error: the ON clause must be
an equi-conjunction on same-named columns (what the reference
generates and what a hash-partitioned merge can use); a column
assigned different expressions in UPDATE vs INSERT is rejected (the
merge classifier applies ONE source value per column); ``WHEN
MATCHED THEN DELETE`` is rejected with guidance to use ``DELETE
FROM`` (the ladder has no matched-delete branch).

One documented SEMANTIC SCOPE (warned, not raised, because it is the
partition-pruned merge contract the ladder exists for): ``WHEN NOT
MATCHED BY SOURCE THEN DELETE`` against a PARTITIONED target only
deletes target rows inside source-touched partitions — target-only
rows in partitions the source never mentions survive, where standard
SQL MERGE would delete them. Executing such a statement emits
:class:`SqlDmlScopeWarning` naming the target and its partition
columns; sources that cover every partition (the reference's
full-snapshot staging pattern) are unaffected.

Targets resolve through the registry ``register_wap_view(...,
dml=True)`` fills (name → open table handle), or an explicit
``tables=`` mapping.
"""

from __future__ import annotations

import re
import warnings
from dataclasses import dataclass
from typing import TYPE_CHECKING, Mapping, Sequence

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


class SqlDmlError(ValueError):
    """Statement text outside the supported DML grammar, with the
    unsupported construct named."""


class SqlDmlScopeWarning(UserWarning):
    """A routed statement executes with a DOCUMENTED semantic scope
    narrower than standard SQL — currently one case: ``WHEN NOT
    MATCHED BY SOURCE THEN DELETE`` against a partitioned WAP target
    is partition-scoped (only target rows in source-touched
    partitions are delete candidates; see the module docstring)."""


# --------------------------------------------------------------- registry
_DML_TARGETS: dict[str, object] = {}

#: override for the durable registry file location; default is a JSON
#: sidecar next to the Spark warehouse dir (one file per deployment,
#: like the reference's catalog holding its view definitions)
DML_REGISTRY_ENV = "SPARK_GRAFT_DML_REGISTRY"


def dml_registry_path() -> str:
    import os

    return os.environ.get(
        DML_REGISTRY_ENV,
        os.path.join("spark-warehouse", "_wap_dml_registry.json"),
    )


def _registry_load(path: str | None = None) -> dict:
    import json
    import os

    p = path or dml_registry_path()
    if not os.path.isfile(p):
        return {}
    try:
        with open(p) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def register_dml_target(
    name: str, table, durable: bool = False, registry_path: str | None = None
) -> None:
    """Expose an open WAP table handle to DML statements as
    ``name``. ``register_wap_view(..., dml=True)`` calls this so one
    registration covers both SELECT (temp view) and DML (this
    registry).

    ``durable=True`` additionally persists the (name → table path)
    mapping to the JSON registry file (``registry_path``, default
    :func:`dml_registry_path`), so the target survives process
    restart the way the reference's catalog objects do
    (connector/snowpark_connector.py:511-566): a fresh process's
    first ``execute_dml`` against the name re-opens the table from
    the file lazily. The durable record holds only the PATH — a
    handle constructed with an explicit non-default ``storage=``
    restores onto the default factory, so custom-backend tables must
    be re-registered by the code that owns the storage object."""
    _DML_TARGETS[name.lower()] = table
    if durable:
        import json
        import os
        import time

        p = registry_path or dml_registry_path()
        data = _registry_load(p)
        data[name.lower()] = {
            "path": table.path,
            "registered_at": time.time(),
        }
        d = os.path.dirname(p)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = f"{p}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(data, fh, indent=1, sort_keys=True)
        os.replace(tmp, p)  # atomic swap: readers never see a partial file


def _resolve_target(
    name: str,
    tables: Mapping[str, object] | None,
    spark: "SparkSession | None" = None,
):
    key = name.lower()
    if tables and key in {k.lower() for k in tables}:
        for k, v in tables.items():
            if k.lower() == key:
                return v
    if key in _DML_TARGETS:
        return _DML_TARGETS[key]
    # durable fallback: a registration from a previous process
    entry = _registry_load().get(key)
    if entry is not None and spark is not None:
        from etl_reporting_spark.operators.wap import open_wap_table

        table = open_wap_table(spark, entry["path"])
        _DML_TARGETS[key] = table  # cache for this process
        return table
    raise SqlDmlError(
        f"unknown DML target {name!r}: register it first with "
        "register_wap_view(spark, path, name, dml=True) or pass tables={...}"
    )


def _physical_handle(spark: "SparkSession", table):
    """DML against a HIDDEN-partitioned target executes on the
    PHYSICAL layout: a plain :class:`PartitionedWapTable` over the
    same path/storage, whose reads expose the derived partition
    columns and whose commits do not re-derive them — the statement
    layer derives SOURCES up front instead (``table.derive``), so the
    frame shapes agree end to end. A non-hidden handle passes
    through unchanged."""
    if hasattr(table, "transforms") and hasattr(table, "derive"):
        from etl_reporting_spark.operators.wap import PartitionedWapTable

        return PartitionedWapTable(
            spark,
            table.path,
            table.partition_by,
            store=table.store,
            storage=table.fs,
        )
    return table


# ---------------------------------------------------------------- scanner
def _strip_comments(sql: str) -> str:
    out = []
    for line in sql.splitlines():
        segs = line.split("'")
        # '--' only starts a comment OUTSIDE single-quoted literals
        # (even segments are outside quotes)
        cut = None
        pos = 0
        for i, seg in enumerate(segs):
            if i % 2 == 0 and "--" in seg:
                cut = pos + seg.index("--")
                break
            pos += len(seg) + 1
        out.append(line[:cut] if cut is not None else line)
    return "\n".join(out)


_WORD = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


def _scan_top_level(text: str, words: set[str]) -> list[tuple[int, str]]:
    """Positions of keyword occurrences at paren-depth 0, outside
    quoted literals, and outside CASE…END expressions — the scanner
    that lets ``WHEN``/``THEN`` appear freely inside scalar CASE
    expressions without confusing clause splitting."""
    hits: list[tuple[int, str]] = []
    depth = 0
    case_depth = 0
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            i += 1
            while i < n:
                if text[i] == "'" and i + 1 < n and text[i + 1] == "'":
                    i += 2
                    continue
                if text[i] == "'":
                    break
                i += 1
            i += 1
            continue
        if ch in "\"`":
            q = ch
            i += 1
            while i < n and text[i] != q:
                i += 1
            i += 1
            continue
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth -= 1
            i += 1
            continue
        m = _WORD.match(text, i)
        if m:
            w = m.group(0).upper()
            if depth == 0:
                if w == "CASE":
                    case_depth += 1
                elif w == "END" and case_depth > 0:
                    case_depth -= 1
                elif case_depth == 0 and w in words:
                    hits.append((i, w))
            i = m.end()
            continue
        i += 1
    return hits


def _split_top_commas(text: str) -> list[str]:
    """Split on commas at paren-depth 0 outside quotes."""
    parts: list[str] = []
    depth = 0
    start = 0
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            i += 1
            while i < n and not (
                text[i] == "'" and not (i + 1 < n and text[i + 1] == "'")
            ):
                i += 2 if text[i] == "'" else 1
            i += 1
            continue
        if ch in "\"`":
            q = ch
            i += 1
            while i < n and text[i] != q:
                i += 1
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _rewrite_refs(expr: str, mapping: Mapping[str, str]) -> str:
    """Rewrite ``alias.column`` references per ``mapping`` (alias
    lowercase → replacement pattern with ``{col}``), outside quoted
    literals. Unqualified identifiers pass through untouched — Spark
    resolves or rejects them with its own error."""
    segs = re.split(r"('(?:[^']|'')*')", expr)  # keep literals verbatim

    def sub(seg: str) -> str:
        def repl(m: re.Match) -> str:
            alias, col = m.group(1), m.group(2)
            pat = mapping.get(alias.lower())
            return pat.format(col=col) if pat else m.group(0)

        return re.sub(r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)", repl, seg)

    return "".join(s if i % 2 else sub(s) for i, s in enumerate(segs))


def _norm(expr: str) -> str:
    return re.sub(r"\s+", "", expr).lower()


# ----------------------------------------------------------------- result
@dataclass
class DmlResult:
    """Outcome of a routed DELETE/UPDATE statement. MERGE returns the
    merge ladder's own ``WapMergeResult`` (same metrics object as the
    DataFrame API — counts provably shared, not re-derived)."""

    operation: str
    version: int
    rows_affected: int


# ------------------------------------------------------------------ MERGE
_MERGE_HEAD = re.compile(
    r"(?is)^\s*MERGE\s+INTO\s+(?P<target>[\w./-]+)"
    r"(?:\s+AS)?\s+(?P<talias>(?!USING\b)[A-Za-z_]\w*)?"
    r"\s*USING\s+"
)


def _simple_ident(name: str) -> str | None:
    return name if re.fullmatch(r"[A-Za-z_]\w*", name) else None


def _parse_using(text: str) -> tuple[str, bool, int]:
    """Parse the USING operand: ``(subquery)`` or an identifier.
    Returns (operand, is_subquery, end_index)."""
    text_l = text.lstrip()
    off = len(text) - len(text_l)
    if text_l.startswith("("):
        depth = 0
        for i, ch in enumerate(text_l):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return text_l[1:i], True, off + i + 1
        raise SqlDmlError("unbalanced parentheses in USING subquery")
    m = re.match(r"[\w./-]+", text_l)
    if not m:
        raise SqlDmlError(f"cannot parse USING operand at: {text_l[:40]!r}")
    return m.group(0), False, off + m.end()


def _parse_on_keys(on: str, talias: str, salias: str) -> list[str]:
    keys = []
    for conj in re.split(r"(?i)\bAND\b", on):
        m = re.match(
            r"(?is)^\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*=\s*"
            r"([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*$",
            conj,
        )
        if not m:
            raise SqlDmlError(
                f"unsupported ON conjunct {conj.strip()!r}: the merge "
                "router accepts an AND-conjunction of "
                f"{talias}.<col> = {salias}.<col> equalities only"
            )
        a_al, a_c, b_al, b_c = (
            m.group(1).lower(), m.group(2), m.group(3).lower(), m.group(4),
        )
        pair = {a_al: a_c, b_al: b_c}
        if set(pair) != {talias.lower(), salias.lower()}:
            raise SqlDmlError(
                f"ON conjunct {conj.strip()!r} must compare the target "
                f"alias ({talias}) with the source alias ({salias})"
            )
        tcol, scol = pair[talias.lower()], pair[salias.lower()]
        if tcol.lower() != scol.lower():
            raise SqlDmlError(
                f"ON compares differently-named columns {tcol!r}/{scol!r}: "
                "the merge ladder joins on shared key names — alias the "
                "source column in the USING subquery instead"
            )
        keys.append(tcol)
    return keys


def _parse_merge(sql: str):
    head_m = _MERGE_HEAD.match(sql)
    if not head_m:
        raise SqlDmlError(f"cannot parse MERGE header at: {sql[:60]!r}")
    target_name = head_m.group("target")
    # SQL-standard default qualifier: the bare table name when no alias
    talias = head_m.group("talias") or _simple_ident(target_name) or "target"
    rest = sql[head_m.end():]
    src_operand, src_is_query, end = _parse_using(rest)
    rest = rest[end:]
    m = re.match(r"(?is)^\s*(?:AS\s+)?(?P<salias>(?!ON\b)[A-Za-z_]\w*)?\s*ON\b", rest)
    if not m:
        raise SqlDmlError(f"cannot parse USING alias / ON at: {rest[:60]!r}")
    salias = m.group("salias") or (
        (_simple_ident(src_operand) if not src_is_query else None) or "source"
    )
    rest = rest[m.end():]

    whens = _scan_top_level(rest, {"WHEN"})
    if not whens:
        raise SqlDmlError("MERGE has no WHEN clauses")
    on_text = rest[: whens[0][0]].strip()
    clauses = [
        rest[whens[i][0] : whens[i + 1][0] if i + 1 < len(whens) else len(rest)]
        for i in range(len(whens))
    ]
    return target_name, talias, src_operand, src_is_query, salias, on_text, clauses


_WHEN_HEAD = re.compile(
    r"(?is)^\s*WHEN\s+(?P<not>NOT\s+)?MATCHED"
    r"(?:\s+BY\s+(?P<by>SOURCE|TARGET))?\s*(?P<rest>.*)$"
)


def _parse_when(clause: str):
    m = _WHEN_HEAD.match(clause)
    if not m:
        raise SqlDmlError(f"cannot parse WHEN clause: {clause.strip()[:60]!r}")
    negated = bool(m.group("not"))
    by = (m.group("by") or "").upper()
    if by == "SOURCE" and not negated:
        raise SqlDmlError("WHEN MATCHED BY SOURCE is not a SQL construct")
    rest = m.group("rest")
    thens = _scan_top_level(rest, {"THEN"})
    if not thens:
        raise SqlDmlError(f"WHEN clause missing THEN: {clause.strip()[:60]!r}")
    cond_part = rest[: thens[0][0]].strip()
    action = rest[thens[0][0] + 4 :].strip()
    cond = None
    if cond_part:
        am = re.match(r"(?is)^AND\b(.*)$", cond_part)
        if not am:
            raise SqlDmlError(
                f"unexpected text before THEN: {cond_part[:40]!r}"
            )
        cond = am.group(1).strip()
    branch = (
        "not_matched_by_source"
        if negated and by == "SOURCE"
        else ("not_matched" if negated else "matched")
    )
    return branch, cond, action


def _parse_assignments(text: str, salias: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in _split_top_commas(text):
        m = re.match(
            r"(?is)^(?:[A-Za-z_]\w*\s*\.\s*)?([A-Za-z_]\w*)\s*=\s*(.+)$",
            part,
        )
        if not m:
            raise SqlDmlError(f"cannot parse assignment {part!r}")
        col, expr = m.group(1), m.group(2).strip()
        if col.lower() in {c.lower() for c in out}:
            raise SqlDmlError(f"column {col!r} assigned twice")
        out[col] = expr
    return out


def _merge_statement(
    spark: "SparkSession", sql: str, tables: Mapping[str, object] | None
):
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.merge import merge_upsert

    (
        target_name, talias, src_operand, src_is_query, salias, on_text, clauses,
    ) = _parse_merge(sql)
    table = _resolve_target(target_name, tables, spark)
    keys = _parse_on_keys(on_text, talias, salias)
    src_df = spark.sql(src_operand) if src_is_query else spark.table(src_operand)
    src_cols = {c.lower(): c for c in src_df.columns}
    key_set = {k.lower() for k in keys}

    # strip the source alias for evaluation OVER the source frame
    src_scope = {salias.lower(): "{col}"}

    update_assign: dict[str, str] = {}
    insert_assign: dict[str, str] = {}
    matched_cond = not_matched_cond = delete_cond = None
    delete_nmbs = False
    seen: set[str] = set()
    for clause in clauses:
        branch, cond, action = _parse_when(clause)
        if branch in seen:
            raise SqlDmlError(f"duplicate WHEN {branch} clause")
        seen.add(branch)
        if branch == "matched":
            am = re.match(r"(?is)^UPDATE\s+SET\b(.*)$", action)
            if not am:
                if re.match(r"(?is)^DELETE\b", action):
                    raise SqlDmlError(
                        "WHEN MATCHED THEN DELETE is not routed (the merge "
                        "ladder has no matched-delete branch): issue a "
                        "DELETE FROM <target> WHERE <key IN source> instead"
                    )
                raise SqlDmlError(f"unsupported MATCHED action {action[:40]!r}")
            update_assign = _parse_assignments(am.group(1), salias)
            matched_cond = cond
            bad_keys = [
                c for c in update_assign
                if any(c.lower() == k.lower() for k in keys)
            ]
            if bad_keys:
                raise SqlDmlError(
                    f"UPDATE SET assigns merge key(s) {bad_keys}: keys are "
                    "the match identity and cannot be rewritten by MERGE"
                )
        elif branch == "not_matched":
            if re.match(r"(?is)^INSERT\s*\*\s*$", action):
                insert_assign = {
                    c: c for c in src_df.columns
                }
            else:
                am = re.match(
                    r"(?is)^INSERT\s*\((?P<cols>[^)]*)\)\s*"
                    r"VALUES\s*\((?P<vals>.*)\)\s*$",
                    action,
                )
                if not am:
                    raise SqlDmlError(
                        f"unsupported NOT MATCHED action {action[:40]!r}"
                    )
                cols = [c.strip() for c in am.group("cols").split(",")]
                cols = [re.sub(r"^[A-Za-z_]\w*\s*\.\s*", "", c) for c in cols]
                vals = _split_top_commas(am.group("vals"))
                if len(cols) != len(vals):
                    raise SqlDmlError(
                        f"INSERT lists {len(cols)} columns, {len(vals)} values"
                    )
                insert_assign = dict(zip(cols, vals))
            not_matched_cond = cond
        else:  # not_matched_by_source
            if not re.match(r"(?is)^DELETE\s*$", action):
                raise SqlDmlError(
                    "WHEN NOT MATCHED BY SOURCE supports THEN DELETE only "
                    f"(got {action[:40]!r})"
                )
            delete_nmbs = True
            delete_cond = cond

    # --- key INSERT values must be the source key (the join identity)
    for k in keys:
        for amap in (insert_assign,):
            for c, e in amap.items():
                if c.lower() == k.lower():
                    if _norm(_rewrite_refs(e, src_scope)) != _norm(k):
                        raise SqlDmlError(
                            f"INSERT value for merge key {k!r} must be "
                            f"{salias}.{k} (got {e!r}) — a rewritten key "
                            "cannot participate in the ON match"
                        )

    # --- one source value per column: UPDATE and INSERT must agree
    value_exprs: dict[str, str] = {}  # source-scope expr per column
    for amap in (update_assign, insert_assign):
        for c, e in amap.items():
            if c.lower() in key_set:
                continue
            bare = _rewrite_refs(e, src_scope)
            if re.search(rf"\b{re.escape(talias)}\s*\.", bare, re.IGNORECASE):
                raise SqlDmlError(
                    f"assignment {c} = {e!r} references the target alias: "
                    "RHS expressions may use source columns only (compute "
                    "target-dependent values in the USING subquery by "
                    "joining the target view)"
                )
            prev = value_exprs.get(c.lower())
            if prev is not None and _norm(prev) != _norm(bare):
                raise SqlDmlError(
                    f"column {c!r} gets different expressions in UPDATE "
                    f"({prev!r}) and INSERT ({bare!r}): the merge "
                    "classifier applies one source value per column — "
                    "compute it in the USING subquery instead"
                )
            value_exprs[c.lower()] = bare

    # --- derived source: assignments applied IN PLACE; original
    # values shadowed as __pre_<c> for branch conditions; assigned
    # columns absent from the source appended
    rewritten = {
        c for c in value_exprs
        if c in src_cols and _norm(value_exprs[c]) != _norm(src_cols[c])
    }
    cond_src_refs: set[str] = set()
    for cond in (matched_cond, not_matched_cond, delete_cond):
        if cond:
            for m in re.finditer(
                r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)", cond
            ):
                if m.group(1).lower() == salias.lower():
                    cond_src_refs.add(m.group(2).lower())
    shadows = sorted(rewritten & cond_src_refs)

    exprs = []
    for c in src_df.columns:
        if c.lower() in value_exprs and c.lower() not in key_set:
            exprs.append(F.expr(value_exprs[c.lower()]).alias(c))
        else:
            exprs.append(F.col(c))
    for c in shadows:
        exprs.append(F.col(src_cols[c]).alias(f"__pre_{src_cols[c]}"))
    new_cols = [
        c for c in value_exprs
        if c not in src_cols and c not in key_set
    ]
    # preserve statement order for appended columns
    ordered_new = []
    for amap in (update_assign, insert_assign):
        for c in amap:
            if c.lower() in new_cols and c not in ordered_new:
                ordered_new.append(c)
    for c in ordered_new:
        exprs.append(F.expr(value_exprs[c.lower()]).alias(c))
    src2 = src_df.select(*exprs)
    derived_targets: list[str] = []
    if hasattr(table, "derive"):
        stale = table._live_old_era_keys()
        if stale:
            # round-12: the target's partition spec EVOLVED and old-era
            # partitions are live. The partition-rewrite path below
            # prunes the target to the source's CURRENT-era partition
            # values, so a key living in an old-era partition would be
            # classified not-matched and silently duplicated. The
            # era-aware rung is the DV upsert — route there when the
            # statement IS a plain full-column upsert (then "retract
            # matched + append source rows" is exactly the statement's
            # semantics); refuse anything fancier with the migration
            # verb named.
            logical_nonkey = {
                c.lower() for c in table.read().columns
            } - key_set
            plain = (
                seen == {"matched", "not_matched"}
                and matched_cond is None
                and not_matched_cond is None
                and not delete_nmbs
                and logical_nonkey
                <= {c.lower() for c in update_assign}
                and logical_nonkey
                <= {c.lower() for c in insert_assign}
            )
            if not plain:
                raise SqlDmlError(
                    f"MERGE INTO {target_name}: the target's partition "
                    f"spec evolved and {len(stale)} old-era partition(s) "
                    "are live — a partition-rewrite MERGE would miss keys "
                    "living there (silent duplicates), and this statement "
                    "shape cannot route onto the era-aware DV upsert "
                    "(that needs unconditioned WHEN MATCHED UPDATE + "
                    "WHEN NOT MATCHED INSERT covering every non-key "
                    "column). Migrate the old eras first "
                    "(rewrite_era_partitions()) or use upsert_rows_dv."
                )
            from etl_reporting_spark.operators.merge import WapMergeResult

            # full coverage proven above: every logical column exists
            # in the assigned source — align to the table's order (a
            # missing one is a loud AnalysisException, never a NULL)
            version, updated, inserted = table.upsert_rows_dv(
                src2.select(*table.read().columns), keys=list(keys)
            )
            return WapMergeResult(
                df=table.read(version=version),
                counts={"U": updated, "I": inserted, "D": 0, "M": 0, "K": 0},
                version=version,
            )
        # hidden-partitioned target: derive the source's partition
        # columns from the table's transform spec, then run the merge
        # against the physical layout (see _physical_handle). The
        # derived names ride the INSERT column list below — the user's
        # statement cannot know them, and an inserted row missing its
        # partition value would land in the NULL partition.
        src2 = table.derive(src2)
        derived_targets = [
            t.target for t in table.transforms if t.kind != "identity"
        ]
        table = _physical_handle(spark, table)

    # --- branch conditions over the classifier's joined frame
    def classify_cond(cond: str | None):
        if cond is None:
            return None
        mapping = {
            talias.lower(): "__t_{col}",
            salias.lower(): "__s_{col}",
        }
        out = _rewrite_refs(cond, mapping)
        # keys and shadowed columns need their special join-frame names
        for k in keys:
            out = re.sub(
                rf"\b__t_{re.escape(k)}\b", f"__tk_{k}", out, flags=re.IGNORECASE
            )
            out = re.sub(
                rf"\b__s_{re.escape(k)}\b", f"__sk_{k}", out, flags=re.IGNORECASE
            )
        for c in shadows:
            out = re.sub(
                rf"\b__s_{re.escape(src_cols[c])}\b",
                f"__s___pre_{src_cols[c]}",
                out,
                flags=re.IGNORECASE,
            )
        return F.expr(out)

    update_cols = [c for c in update_assign if c.lower() not in key_set]
    insert_cols = [c for c in insert_assign if c.lower() not in key_set]
    if derived_targets and insert_cols:
        insert_cols += derived_targets
    # an ABSENT branch means that action never fires (SQL semantics) —
    # merge_upsert's branches are always-on unless conditioned off
    has_update = "matched" in seen
    has_insert = "not_matched" in seen
    matched_condition = (
        classify_cond(matched_cond) if has_update else F.lit(False)
    )
    not_matched_condition = (
        classify_cond(not_matched_cond) if has_insert else F.lit(False)
    )
    partition_by = list(getattr(table, "partition_by", []) or []) or None
    if delete_nmbs and partition_by:
        # The WAP merge prunes to source-touched partitions, so NOT
        # MATCHED BY SOURCE ... DELETE only sees target rows INSIDE
        # those partitions — standard SQL MERGE would also delete
        # target-only rows in partitions the source never mentions.
        # The divergence is deliberate (it is what makes merge cost
        # ∝ touched data) but it must not be silent on the SQL-text
        # surface, where a ported statement carries standard-SQL
        # expectations.
        warnings.warn(
            f"MERGE INTO {target_name}: WHEN NOT MATCHED BY SOURCE THEN "
            f"DELETE is PARTITION-SCOPED on this target (partitioned by "
            f"{partition_by}): only target rows in source-touched "
            "partitions are delete candidates; rows in partitions the "
            "source does not mention survive. Standard SQL deletes them. "
            "Ensure the source covers every partition holding deletable "
            "rows, or route deletes through DELETE FROM.",
            SqlDmlScopeWarning,
            stacklevel=3,
        )
    return merge_upsert(
        None,
        src2,
        keys,
        update_cols=update_cols,
        insert_cols=insert_cols,
        matched_condition=matched_condition,
        not_matched_condition=not_matched_condition,
        delete_not_matched_by_source=delete_nmbs,
        delete_condition=classify_cond(delete_cond),
        backend="wap",
        spark=spark,
        target_table=table.path,
        partition_by=partition_by,
        table_handle=table,
    )


# --------------------------------------------------------------- DELETE
_DELETE_RE = re.compile(
    r"(?is)^\s*DELETE\s+FROM\s+(?P<target>[\w./-]+)"
    r"(?:\s+(?:AS\s+)?(?P<alias>(?!WHERE\b)[A-Za-z_]\w*))?"
    r"\s+WHERE\s+(?P<cond>.+)$"
)


def _delete_statement(
    spark: "SparkSession", sql: str, tables: Mapping[str, object] | None
) -> DmlResult:
    m = _DELETE_RE.match(sql)
    if not m:
        raise SqlDmlError(
            f"cannot parse DELETE (a WHERE clause is required — a full "
            f"truncate is a table op, not row DML): {sql.strip()[:60]!r}"
        )
    table = _resolve_target(m.group("target"), tables, spark)
    alias = (m.group("alias") or m.group("target")).lower()
    cond = _rewrite_refs(m.group("cond").strip(), {alias: "{col}"})
    if hasattr(table, "delete_rows"):
        # deletion vectors: zero data files rewritten
        version, n = table.delete_rows(cond)
    else:
        from pyspark.sql import functions as F

        current = table.read()
        n = current.filter(F.expr(cond)).count()
        if n == 0:
            return DmlResult(
                operation="delete",
                version=table.current_version(),
                rows_affected=0,
            )
        # SQL three-valued logic: only rows where the predicate is
        # TRUE delete; NULL keeps the row (``~NULL`` is NULL, which
        # filter() would drop — hence the coalesce, not plain ``~``)
        version = table.commit(
            current.filter(~F.coalesce(F.expr(cond), F.lit(False))),
            operation="delete",
        )
    return DmlResult(operation="delete", version=version, rows_affected=n)


# --------------------------------------------------------------- INSERT
_INSERT_RE = re.compile(
    r"(?is)^\s*INSERT\s+INTO\s+(?P<target>[\w./-]+)"
    r"(?:\s*\((?P<cols>[^)]*)\))?\s*(?P<body>(?:SELECT|VALUES)\b.+)$"
)


def _insert_statement(
    spark: "SparkSession", sql: str, tables: Mapping[str, object] | None
) -> DmlResult:
    """``INSERT INTO <t> [(cols)] SELECT ...`` / ``VALUES (...)``
    routed onto :meth:`wap.PartitionedWapTable.append_rows` — a PURE
    append (new files only, nothing rewritten or masked, write
    amplification exactly the batch). Unlisted columns take NULL
    (standard SQL); the batch is aligned and cast to the target's
    LOGICAL schema, so a hidden-partitioned target derives its
    partition columns itself. Unpartitioned full-snapshot tables
    append as read+union+commit — a full rewrite, documented, because
    their record is one immutable data dir."""
    from pyspark.sql import functions as F

    m = _INSERT_RE.match(sql)
    if not m:
        raise SqlDmlError(
            f"cannot parse INSERT (expected INSERT INTO <t> [(cols)] "
            f"SELECT ...|VALUES ...): {sql.strip()[:60]!r}"
        )
    table = _resolve_target(m.group("target"), tables, spark)
    logical = table.read().limit(0)
    target_fields = list(logical.schema.fields)
    target_names = [f.name for f in target_fields]
    if m.group("cols"):
        listed = [c.strip() for c in m.group("cols").split(",") if c.strip()]
        unknown = [
            c for c in listed
            if c.lower() not in {n.lower() for n in target_names}
        ]
        if unknown:
            raise SqlDmlError(
                f"INSERT column(s) {unknown} not in target schema "
                f"{target_names}"
            )
    else:
        listed = list(target_names)
    body = m.group("body").strip()
    if body[:6].upper() == "VALUES":
        batch = spark.sql(
            f"SELECT * FROM ({body}) AS __v({', '.join(listed)})"
        )
    else:
        batch = spark.sql(body)
        if len(batch.columns) != len(listed):
            raise SqlDmlError(
                f"INSERT lists {len(listed)} column(s) but the SELECT "
                f"produces {len(batch.columns)}"
            )
        batch = batch.toDF(*listed)
    by_lower = {c.lower(): c for c in batch.columns}
    aligned = batch.select(
        *[
            F.col(by_lower[f.name.lower()]).cast(f.dataType).alias(f.name)
            if f.name.lower() in by_lower
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in target_fields
        ]
    )
    n = aligned.count()
    if n == 0:
        return DmlResult(
            operation="insert",
            version=table.current_version(),
            rows_affected=0,
        )
    phys = _physical_handle(spark, table)
    if hasattr(table, "derive"):
        aligned = table.derive(aligned)
    if hasattr(phys, "append_rows"):
        version = phys.append_rows(aligned, operation="insert")
    else:
        # full-snapshot table: one immutable data dir per version —
        # append is read + union + commit (a rewrite, by layout)
        version = phys.commit(
            phys.read().unionByName(aligned), operation="insert"
        )
    return DmlResult(operation="insert", version=version, rows_affected=n)


# --------------------------------------------------------------- UPDATE
_UPDATE_RE = re.compile(
    r"(?is)^\s*UPDATE\s+(?P<target>[\w./-]+)"
    r"(?:\s+(?:AS\s+)?(?P<alias>(?!SET\b)[A-Za-z_]\w*))?"
    r"\s+SET\s+(?P<body>.+)$"
)


def _update_statement(
    spark: "SparkSession", sql: str, tables: Mapping[str, object] | None
) -> DmlResult:
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.wap import hive_partition_key

    m = _UPDATE_RE.match(sql)
    if not m:
        raise SqlDmlError(f"cannot parse UPDATE: {sql.strip()[:60]!r}")
    table = _resolve_target(m.group("target"), tables, spark)
    alias = (m.group("alias") or m.group("target")).lower()
    body = m.group("body")
    wheres = _scan_top_level(body, {"WHERE"})
    if not wheres:
        raise SqlDmlError(
            "UPDATE requires a WHERE clause (an unconditional full-table "
            "rewrite should be an explicit commit, not DML)"
        )
    set_text = body[: wheres[0][0]]
    cond = _rewrite_refs(
        body[wheres[0][0] + 5 :].strip(), {alias: "{col}"}
    )
    assigns = {
        c: _rewrite_refs(e, {alias: "{col}"})
        for c, e in _parse_assignments(set_text, alias).items()
    }
    # the unknown-column check runs against the LOGICAL surface (a
    # hidden table's derived partition columns are not assignable);
    # execution then switches to the physical handle so partition
    # discovery can group on the derived columns
    cols_l = {c.lower() for c in table.read().columns}
    for c in assigns:
        if c.lower() not in cols_l:
            raise SqlDmlError(f"UPDATE SET references unknown column {c!r}")
    if hasattr(table, "derive") and table._live_old_era_keys():
        # round-12: the partition-granular rewrite groups on the
        # CURRENT spec's derived columns, which old-era rows lack
        # (pre-guard this crashed with an opaque
        # __HIVE_DEFAULT_PARTITION__ KeyError). The DV UPDATE rung is
        # era-agnostic — matched rows are masked where they live and
        # their updated copies re-derive under the current spec — so
        # evolved targets route there.
        version, n = table.update_rows_dv(cond, assigns)
        _repin_view(spark, m.group("target"))
        return DmlResult(
            operation="update", version=version, rows_affected=n
        )
    table = _physical_handle(spark, table)

    partition_by = list(getattr(table, "partition_by", []) or [])
    cond_col = F.expr(cond)

    def updated(df: "DataFrame") -> "DataFrame":
        # every assignment computed over the ORIGINAL columns in one
        # select — pre-update semantics even when assignments
        # reference each other's columns
        amap = {c.lower(): e for c, e in assigns.items()}
        return df.select(
            *[
                F.when(cond_col, F.expr(amap[c.lower()]))
                .otherwise(F.col(c))
                .cast(df.schema[c].dataType)  # UPDATE keeps the column type
                .alias(c)
                if c.lower() in amap
                else F.col(c)
                for c in df.columns
            ]
        )

    if partition_by:
        touched_rows = (
            table.read()
            .filter(cond_col)
            .groupBy(*[F.col(c).cast("string") for c in partition_by])
            .count()
            .collect()
        )
        if not touched_rows:
            return DmlResult(
                operation="update",
                version=table.current_version(),
                rows_affected=0,
            )
        touched = sorted(
            hive_partition_key(partition_by, tuple(r)[:-1]) for r in touched_rows
        )
        n = sum(r["count"] for r in touched_rows)
        version = table.commit_partitions(
            updated(table.read(partitions=touched)),
            replace=touched,
            operation="update",
        )
    else:
        current = table.read()
        n = current.filter(cond_col).count()
        if n == 0:
            return DmlResult(
                operation="update",
                version=table.current_version(),
                rows_affected=0,
            )
        version = table.commit(updated(current), operation="update")
    return DmlResult(operation="update", version=version, rows_affected=n)


# ------------------------------------------------------------- dispatch
_DML_HEAD = re.compile(
    r"(?is)^\s*(?:(MERGE)\s+INTO|(DELETE)\s+FROM|(INSERT)\s+INTO|(UPDATE))"
    r"\s+(?P<target>[\w./-]+)"
)


def statement_dml_target(sql: str) -> tuple[str, str] | None:
    """``(operation, target_name)`` when the statement text is
    DML-shaped (MERGE INTO / DELETE FROM / UPDATE), else None — the
    sniff a mixed SET/DDL/DML/SELECT script runner uses to decide
    whether a statement routes here or to ``spark.sql``. Text-only;
    never touches the registry or the engine."""
    m = _DML_HEAD.match(_strip_comments(sql))
    if not m:
        return None
    op = next(g for g in m.groups()[:4] if g)
    return op.upper(), m.group("target")


def dml_target_registered(
    name: str, tables: Mapping[str, object] | None = None
) -> bool:
    """Whether ``name`` resolves as a DML target (the registry
    ``register_wap_view(..., dml=True)`` fills, or ``tables=``)."""
    key = name.lower()
    if tables and key in {k.lower() for k in tables}:
        return True
    return key in _DML_TARGETS


def execute_dml(
    spark: "SparkSession",
    sql: str,
    substitutions: Mapping[str, str] | None = None,
    tables: Mapping[str, object] | None = None,
):
    """Execute one templated DML statement against registered WAP
    tables. ``substitutions`` go through the same ``{{VAR}}``
    renderer as the report pipeline (io.render_template), so a
    reference pipeline's templated MERGE text runs as-is. Returns the
    merge ladder's ``WapMergeResult`` for MERGE (metrics identical to
    the DataFrame API) or a :class:`DmlResult` for DELETE/UPDATE."""
    from etl_reporting_spark.io import render_template

    text = _strip_comments(
        render_template(sql, dict(substitutions or {}))
    ).strip().rstrip(";")
    kw = re.match(r"(?is)^\s*(MERGE|DELETE|INSERT|UPDATE)\b", text)
    if not kw:
        raise SqlDmlError(
            f"not a DML statement (MERGE/DELETE/INSERT/UPDATE): {text[:60]!r}"
        )
    op = kw.group(1).upper()
    if op == "MERGE":
        result = _merge_statement(spark, text, tables)
    elif op == "DELETE":
        result = _delete_statement(spark, text, tables)
    elif op == "INSERT":
        result = _insert_statement(spark, text, tables)
    else:
        result = _update_statement(spark, text, tables)
    _refresh_registered_view(spark, text)
    return result


def _refresh_registered_view(spark: "SparkSession", text: str) -> None:
    """Re-pin the target's temp view to the fresh snapshot after a
    successful mutation, so a script's subsequent SELECT sees the
    post-DML state — the live-view semantics the reference's catalog
    views have (connector/snowpark_connector.py:511-566). Applies
    only to registry targets whose name is currently a TEMP view
    (what ``register_wap_view(dml=True)`` created); explicit
    ``tables=`` mappings and registered-but-unviewed handles are left
    alone. Metadata-only — one commit-record read, no data scan."""
    sniff = statement_dml_target(text)
    if sniff is None:
        return
    _repin_view(spark, sniff[1])


def _repin_view(spark: "SparkSession", name: str) -> None:
    """Re-pin a registry target's TEMP view to the fresh snapshot (the
    shared tail of every mutating statement — DML and DDL alike)."""
    table = _DML_TARGETS.get(name.lower())
    if table is None:
        return
    is_temp_view = any(
        t.name.lower() == name.lower() and t.isTemporary
        for t in spark.catalog.listTables()
    )
    if is_temp_view:
        table.read().createOrReplaceTempView(name)


def execute_dml_script(
    spark: "SparkSession",
    sql: str,
    substitutions: Mapping[str, str] | None = None,
    tables: Mapping[str, object] | None = None,
) -> list:
    """Run a ``;``-separated script of DML statements in order (the
    multi-statement shape the reference's script runner feeds),
    returning one result per statement."""
    from etl_reporting_spark.io import render_template

    rendered = _strip_comments(render_template(sql, dict(substitutions or {})))
    results = []
    buf: list[str] = []
    # reuse the scanner for top-level ';' by treating it char-wise
    depth = 0
    i, n = 0, len(rendered)
    start = 0
    stmts: list[str] = []
    while i < n:
        ch = rendered[i]
        if ch == "'":
            i += 1
            while i < n and not (
                rendered[i] == "'"
                and not (i + 1 < n and rendered[i + 1] == "'")
            ):
                i += 2 if rendered[i] == "'" else 1
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == ";" and depth == 0:
            stmts.append(rendered[start:i])
            start = i + 1
        i += 1
    stmts.append(rendered[start:])
    for s in stmts:
        if not s.strip():
            continue
        if statement_ddl_target(s) is not None:
            results.append(execute_ddl(spark, s, tables=tables))
        else:
            results.append(execute_dml(spark, s, tables=tables))
    return results


# ------------------------------------------------------------------- DDL
# The reference's scripts also carry DDL text between the DML — ALTER
# TABLE and ANALYZE statements (reference
# connector/snowpark_connector.py:1238-1272 mixes all four shapes).
# Registered WAP targets route here onto the table API; unregistered
# names fall through to spark.sql so catalog (v2) tables keep their
# native behavior. Grammar, each unsupported form failing loudly:
#
#     ALTER TABLE <t> ADD CONSTRAINT <name> CHECK (<expr>)
#     ALTER TABLE <t> DROP CONSTRAINT <name>
#     ALTER TABLE <t> ADD COLUMN[S] <name> <type> [, <name> <type> ...]
#     ALTER TABLE <t> DROP COLUMN[S] <name> [, <name> ...]
#     ALTER TABLE <t> ALTER COLUMN <name> TYPE <type>     -- widen only
#     ALTER TABLE <t> RENAME COLUMN <old> TO <new>         -- round-12
#     ALTER TABLE <t> SET PARTITION SPEC (<transform>, ...) -- round-12
#     ANALYZE TABLE <t> COMPUTE STATISTICS
#         [FOR COLUMNS <a>, <b> | FOR ALL COLUMNS]
#         [FOR KEYS <a>, <b>]                              -- skew triad

_DDL_HEAD = re.compile(
    r"(?is)^\s*(?:(?:(ALTER)|(ANALYZE)|(DESCRIBE))\s+TABLE"
    r"|(OPTIMIZE)|(VACUUM))\s+(?P<target>[\w./-]+)"
)
_OPTIMIZE_TAIL = re.compile(
    r"(?is)^\s*(?:ZORDER\s+BY\s*\((?P<zcols>[\w\s,]+)\))?\s*$"
)
_VACUUM_TAIL = re.compile(r"(?is)^\s*(?:RETAIN\s+(?P<keep>\d+)\s+VERSIONS)?\s*$")

_ADD_CONSTRAINT = re.compile(
    r"(?is)^\s*ADD\s+CONSTRAINT\s+(?P<name>\w+)\s+CHECK\s*\((?P<expr>.+)\)\s*$"
)
_BRANCH_VERB = re.compile(
    r"(?is)^\s*(?P<verb>CREATE|DROP|PUBLISH)\s+BRANCH\s+(?P<name>[\w-]+)\s*$"
)
_DROP_CONSTRAINT = re.compile(r"(?is)^\s*DROP\s+CONSTRAINT\s+(?P<name>\w+)\s*$")
_ADD_COLUMNS = re.compile(r"(?is)^\s*ADD\s+COLUMNS?\s+(?P<body>.+)$")
_DROP_COLUMNS = re.compile(r"(?is)^\s*DROP\s+COLUMNS?\s+(?P<body>[\w\s,]+)$")
_ALTER_COLUMN = re.compile(
    r"(?is)^\s*ALTER\s+COLUMN\s+(?P<name>\w+)\s+TYPE\s+(?P<type>.+?)\s*$"
)
_RENAME_COLUMN = re.compile(
    r"(?is)^\s*RENAME\s+COLUMN\s+(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*$"
)
_SET_PARTITION_SPEC = re.compile(
    r"(?is)^\s*SET\s+PARTITION\s+SPEC\s*\((?P<body>[\w\s,()]+)\)\s*$"
)
_ANALYZE_TAIL = re.compile(
    r"(?is)^\s*COMPUTE\s+STATISTICS"
    r"(?:\s+FOR\s+(?:ALL\s+COLUMNS|COLUMNS\s+(?P<cols>[\w\s,]+?)))?"
    r"(?:\s+FOR\s+KEYS\s+(?P<keys>[\w\s,]+?))?\s*$"
)


def statement_ddl_target(sql: str) -> tuple[str, str] | None:
    """``(operation, target_name)`` when the statement text is
    DDL-shaped (ALTER/ANALYZE/DESCRIBE TABLE, OPTIMIZE, VACUUM), else
    None — the script runner's routing sniff, mirror of
    :func:`statement_dml_target`."""
    m = _DDL_HEAD.match(_strip_comments(sql))
    if not m:
        return None
    op = next(g for g in m.groups()[:5] if g)
    return op.upper(), m.group("target")


def _names_list(body: str) -> list[str]:
    return [s.strip() for s in body.split(",") if s.strip()]


def execute_ddl(
    spark: "SparkSession",
    sql: str,
    substitutions: Mapping[str, str] | None = None,
    tables: Mapping[str, object] | None = None,
) -> dict:
    """Execute one templated DDL statement against a registered WAP
    table; returns ``{"operation", "target", "version", ...}``. The
    target's registered temp view is re-pinned afterward (an ALTER
    changes the schema a script's next SELECT must see)."""
    from etl_reporting_spark.io import render_template

    text = _strip_comments(
        render_template(sql, dict(substitutions or {}))
    ).strip().rstrip(";")
    head = _DDL_HEAD.match(text)
    if not head:
        raise SqlDmlError(
            f"not a DDL statement (ALTER TABLE / ANALYZE TABLE): "
            f"{text[:60]!r}"
        )
    op = next(g for g in head.groups()[:5] if g).upper()
    name = head.group("target")
    table = _resolve_target(name, tables, spark)
    rest = text[head.end():]

    if op == "OPTIMIZE":
        # Delta's maintenance verb: compact every partition (optionally
        # Z-ORDER clustered); cost ∝ rewritten partitions, same commit
        # protocol as every write (readers flip atomically)
        m = _OPTIMIZE_TAIL.match(rest)
        if not m:
            raise SqlDmlError(
                f"unsupported OPTIMIZE form: {rest.strip()[:40]!r} — "
                "supported: OPTIMIZE <t> [ZORDER BY (a, b)]"
            )
        from etl_reporting_spark.operators.wap import optimize_partitions

        zcols = _names_list(m.group("zcols")) if m.group("zcols") else None
        version = optimize_partitions(
            table,
            cluster_by=zcols,
            zorder=bool(zcols and len(zcols) > 1),
        )
        _repin_view(spark, name)
        out = {"operation": "optimize", "target": name, "version": version}
        if zcols:
            out["zorder"] = zcols
        return out

    if op == "VACUUM":
        m = _VACUUM_TAIL.match(rest)
        if not m:
            raise SqlDmlError(
                f"unsupported VACUUM form: {rest.strip()[:40]!r} — "
                "supported: VACUUM <t> [RETAIN <n> VERSIONS]"
            )
        keep = int(m.group("keep")) if m.group("keep") else 2
        removed = table.vacuum(keep_last=keep)
        return {
            "operation": "vacuum",
            "target": name,
            "removed": len(removed),
        }

    if op == "DESCRIBE":
        if rest.strip():
            raise SqlDmlError(
                f"unsupported DESCRIBE form: {rest.strip()[:40]!r} — "
                "supported: DESCRIBE TABLE <name>"
            )
        from etl_reporting_spark.operators.wap import describe_table

        detail = describe_table(table)
        return {
            "operation": "describe",
            "target": name,
            "version": detail["version"],
            "detail": detail,
        }

    if op == "ANALYZE":
        m = _ANALYZE_TAIL.match(rest)
        if not m:
            raise SqlDmlError(
                f"unsupported ANALYZE form: {rest.strip()[:60]!r} — "
                "supported: COMPUTE STATISTICS [FOR COLUMNS a, b | FOR "
                "ALL COLUMNS] [FOR KEYS a, b]"
            )
        from etl_reporting_spark.operators.stats import (
            collect_key_stats,
            collect_table_stats,
        )

        cols = _names_list(m.group("cols")) if m.group("cols") else None
        version = collect_table_stats(table, cols)
        out = {"operation": "analyze", "target": name, "version": version}
        if m.group("keys"):
            version = collect_key_stats(table, _names_list(m.group("keys")))
            out.update(version=version, keys=_names_list(m.group("keys")))
        _repin_view(spark, name)
        return out

    bm = _BRANCH_VERB.match(rest)
    if bm:
        # Iceberg's branch DDL verbs (ALTER TABLE t CREATE/DROP BRANCH
        # b; PUBLISH is this engine's fast-forward spelling) — the
        # staging-then-swap pattern as statement text
        from etl_reporting_spark.operators.branches import (
            create_branch,
            drop_branch,
            publish_branch,
        )

        verb, bname = bm.group("verb").upper(), bm.group("name")
        if verb == "CREATE":
            create_branch(spark, table.path, bname, storage=table.fs)
            return {
                "operation": "create_branch",
                "target": name,
                "branch": bname,
            }
        if verb == "DROP":
            existed = drop_branch(spark, table.path, bname, storage=table.fs)
            if not existed:
                raise SqlDmlError(f"no branch {bname!r} on {name}")
            return {
                "operation": "drop_branch",
                "target": name,
                "branch": bname,
            }
        version = publish_branch(spark, table.path, bname, storage=table.fs)
        _repin_view(spark, name)
        return {
            "operation": "publish_branch",
            "target": name,
            "branch": bname,
            "version": version,
        }

    for pat, run in (
        (
            _ADD_CONSTRAINT,
            lambda m: (
                "add_constraint",
                table.add_check_constraint(m.group("name"), m.group("expr").strip()),
            ),
        ),
        (
            _DROP_CONSTRAINT,
            lambda m: (
                "drop_constraint",
                table.drop_check_constraint(m.group("name")),
            ),
        ),
        (
            _ALTER_COLUMN,
            lambda m: (
                "widen",
                table.alter_schema(
                    widen={m.group("name"): m.group("type").strip()}
                ),
            ),
        ),
        (
            # round-12: the round-11 "RENAME needs column-id tracking"
            # refusal, closed — name-chain identity in alter_schema
            _RENAME_COLUMN,
            lambda m: (
                "rename_column",
                table.alter_schema(
                    rename={m.group("old"): m.group("new")}
                ),
            ),
        ),
        (
            # round-12: partition-spec evolution as text (Iceberg's
            # REPLACE PARTITION FIELD family, spelled whole-spec) —
            # hidden-partitioned targets only; the metadata-only
            # commit + era semantics live in transforms.py
            _SET_PARTITION_SPEC,
            lambda m: (
                "evolve_partition_spec",
                _evolve_spec(table, m.group("body")),
            ),
        ),
        (
            _DROP_COLUMNS,
            lambda m: (
                "drop_columns",
                table.alter_schema(drop=_names_list(m.group("body"))),
            ),
        ),
        (
            _ADD_COLUMNS,
            lambda m: (
                "add_columns",
                table.alter_schema(add=_parse_add_columns(m.group("body"))),
            ),
        ),
    ):
        m = pat.match(rest)
        if m:
            operation, version = run(m)
            _repin_view(spark, name)
            return {"operation": operation, "target": name, "version": version}
    raise SqlDmlError(
        f"unsupported ALTER TABLE form: {rest.strip()[:60]!r} — supported: "
        "ADD/DROP CONSTRAINT, ADD/DROP COLUMN[S], ALTER COLUMN <c> TYPE "
        "<t> (lossless widen), RENAME COLUMN <a> TO <b>, "
        "CREATE/DROP/PUBLISH BRANCH <name>"
    )


def _evolve_spec(table, body: str) -> int:
    """``SET PARTITION SPEC (months(ds), bucket(4, k))`` → the
    hidden-partitioning evolve. A non-hidden target fails loudly (the
    spec belongs to tables whose layout the TABLE owns)."""
    if not hasattr(table, "evolve_partition_spec"):
        raise SqlDmlError(
            "SET PARTITION SPEC needs a hidden-partitioned WAP table "
            f"(got {type(table).__name__}) — create one with "
            "create_hidden_partitioned_wap_table; explicit-column "
            "layouts repartition via a full rewrite"
        )
    spec = [p.strip() for p in _split_top_commas(body) if p.strip()]
    if not spec:
        raise SqlDmlError("SET PARTITION SPEC needs at least one transform")
    return table.evolve_partition_spec(spec)


def _parse_add_columns(body: str) -> dict[str, str]:
    """``a int, b decimal(18,2)`` → {"a": "int", ...}; parens-aware
    comma split so decimal(18,2) stays whole."""
    out: dict[str, str] = {}
    body = body.strip()
    if body.startswith("(") and body.endswith(")"):
        body = body[1:-1]
    for part in _split_top_commas(body):
        bits = part.strip().split(None, 1)
        if len(bits) != 2:
            raise SqlDmlError(
                f"cannot parse ADD COLUMN entry: {part.strip()!r} — "
                "expected '<name> <type>'"
            )
        out[bits[0]] = bits[1].strip()
    return out
