"""ANALYZE-style table statistics and cost-based join advice for WAP
tables.

The reference leans on its warehouse's built-in optimizer statistics —
its queries never declare a join strategy because the engine underneath
(reference connector/snowpark_connector.py builds plain SQL and lets
the warehouse plan it) keeps NDV/row-count stats per table. Spark has
a CBO too, but it only sees catalog tables that ran ``ANALYZE TABLE``;
a path-based WAP table is invisible to it. This module closes that
gap Spark-first: one explicit scan publishes per-column statistics
into the table's OWN commit log (a metadata-only commit, inherited by
every later commit through the sticky-key carry), and
:func:`join_advice` turns two tables' stats into the planning decision
that matters most at 100 TB — broadcast vs shuffle vs salted-shuffle —
before a single task launches.

Statistics collected per column in ONE pass over the snapshot
(:func:`collect_table_stats`):

- ``row_count`` / ``null_count`` — exact
- ``min`` / ``max`` — exact (JSON-serialized; dates in ISO form)
- ``ndv`` — Apache DataSketches HLL estimate
  (``hll_sketch_agg``, JVM-side, mergeable), plus the SKETCH itself
  (base64) so later consumers can union NDVs across tables or
  estimate key-domain overlap without rescanning
- ``avg_len`` — mean string length (string columns only), feeding the
  byte-size estimate

Key-shape statistics (:func:`collect_key_stats`, separate because a
groupBy per key column is a real shuffle the plain ANALYZE shouldn't
pay): per named key, ``max_key_rows`` / ``p99_key_rows`` /
``mean_key_rows`` — the skew triad :func:`join_advice` uses to
recommend salting, mirroring what the j13/j14 gates hand-tune.

Staleness is explicit, never silent: stats carry ``analyzed_version``;
:func:`table_stats` reports how many data commits landed since, and
``join_advice`` carries the staleness of both sides in its reasons.

Cited reference behavior: the staging-then-MERGE loaders
(connector/snowpark_connector.py:607-688) rely on warehouse statistics
for the MERGE's join strategy; this module is the explicit, portable
spelling of the same information.
"""

from __future__ import annotations

import base64
import datetime as _dt
import math
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from etl_reporting_spark.operators.wap import WapTable

#: default HLL precision: lg_k=12 → ~4 KB sketch, ~1.6 % relative
#: standard error — fine for planning decisions (broadcast thresholds
#: and skew ratios live at order-of-magnitude granularity)
DEFAULT_LG_K = 12

#: fixed per-value byte widths for the size estimate (Tungsten row
#: format, approximately); strings use avg_len + 8 overhead
_TYPE_WIDTH = {
    "boolean": 1,
    "byte": 1,
    "short": 2,
    "integer": 4,
    "long": 8,
    "float": 4,
    "double": 8,
    "date": 4,
    "timestamp": 8,
    "timestamp_ntz": 8,
}


def _json_safe(v):
    from decimal import Decimal

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        # same convention as the partition/file [min,max] stats in
        # wap.py: exact lexical form, never a lossy float
        return str(v)
    return v


def collect_table_stats(
    table: WapTable,
    cols: Sequence[str] | None = None,
    version: int | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> int:
    """ANALYZE the snapshot: one fused aggregate scan (all columns'
    count/min/max/HLL in a single job — no per-column passes), then a
    metadata-only commit carrying ``table_stats``. Returns the new
    version.

    Cost model: exactly one full scan of the analyzed columns (column-
    pruned — unanalyzed columns are never read) + one driver-side row.
    Run it on the maintenance cadence next to ``optimize_partitions``,
    not per query."""
    base = version if version is not None else table.current_version()
    if base == 0:
        raise FileNotFoundError(f"no committed WAP table at {table.path}")
    snap = table.read(version=base)
    names = list(cols) if cols is not None else list(snap.columns)
    missing = set(names) - set(snap.columns)
    if missing:
        raise ValueError(f"unknown columns: {sorted(missing)}")
    types = {f.name: f.dataType.typeName() for f in snap.schema.fields}
    unsketchable = ("array", "map", "struct", "binary")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        if not types[c].startswith(unsketchable):
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
            aggs.append(
                F.hll_sketch_agg(F.col(c).cast("string"), F.lit(lg_k)).alias(
                    f"__hll_{c}"
                )
            )
        if types[c] == "string":
            aggs.append(F.avg(F.length(c)).alias(f"__len_{c}"))
    row = snap.agg(*aggs).first().asDict()

    n = row["__n"]
    columns: dict[str, dict] = {}
    for c in names:
        sk = row.get(f"__hll_{c}")
        entry: dict = {
            "type": types[c],
            "null_count": n - row[f"__nn_{c}"],
        }
        if f"__min_{c}" in row:
            entry["min"] = _json_safe(row[f"__min_{c}"])
            entry["max"] = _json_safe(row[f"__max_{c}"])
        if sk is not None:
            spark = table.spark
            est = (
                spark.createDataFrame([(bytes(sk),)], "sk binary")
                .select(F.hll_sketch_estimate("sk"))
                .first()[0]
            )
            entry["ndv"] = int(round(est))
            entry["ndv_sketch"] = base64.b64encode(bytes(sk)).decode()
        if f"__len_{c}" in row and row[f"__len_{c}"] is not None:
            entry["avg_len"] = float(row[f"__len_{c}"])
        columns[c] = entry

    stats = {
        "analyzed_version": base,
        "row_count": n,
        "lg_k": lg_k,
        "columns": columns,
    }
    prior = table._commit_record(base).get("table_stats") or {}
    if prior.get("keys"):
        # key-shape stats collected separately survive an ANALYZE —
        # they describe the same snapshot family and carry their own
        # analyzed_version for staleness
        stats["keys"] = prior["keys"]
    return table._metadata_only_commit(
        base, {"table_stats": stats}, operation="analyze"
    )


def collect_key_stats(
    table: WapTable,
    key_cols: Sequence[str],
    version: int | None = None,
) -> int:
    """Key-shape statistics for join planning: per key column, the
    max / p99 / mean rows-per-key — ONE groupBy per key column (a
    real shuffle over the snapshot; that is why this is not part of
    the plain ANALYZE). The skew triad is what distinguishes "hash
    join is fine" from "key 0 holds 40 % of the table, salt it" — the
    j13_salted_join situation, detected from metadata instead of a
    post-mortem."""
    base = version if version is not None else table.current_version()
    if base == 0:
        raise FileNotFoundError(f"no committed WAP table at {table.path}")
    snap = table.read(version=base)
    keys: dict[str, dict] = {}
    n_rows: int | None = None
    for c in key_cols:
        if c not in snap.columns:
            raise ValueError(f"unknown key column: {c}")
        per_key = snap.groupBy(c).count()
        row = per_key.agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.99)").alias("p99"),
            F.avg("count").alias("mean"),
            F.count(F.lit(1)).alias("nk"),
            F.sum("count").alias("tot"),
        ).first()
        keys[c] = {
            "max_key_rows": int(row["mx"]),
            "p99_key_rows": int(row["p99"]),
            "mean_key_rows": float(row["mean"]),
            "n_keys": int(row["nk"]),
            "analyzed_version": base,
        }
        n_rows = int(row["tot"])
    prior = dict(table._commit_record(base).get("table_stats") or {})
    prior_keys = dict(prior.get("keys") or {})
    prior_keys.update(keys)
    prior["keys"] = prior_keys
    # a key-stats-first table still satisfies the table_stats contract:
    # the per-key sums give the exact row count at zero extra cost
    prior.setdefault("analyzed_version", base)
    prior.setdefault("row_count", n_rows)
    prior.setdefault("lg_k", None)
    prior.setdefault("columns", {})
    return table._metadata_only_commit(
        base, {"table_stats": prior}, operation="analyze_keys"
    )


def table_stats(table: WapTable, version: int | None = None) -> dict:
    """The snapshot's statistics plus explicit staleness: how many
    commits landed after the analyzed snapshot (0 = fresh). Raises if
    the table was never analyzed — callers must not mistake "no
    stats" for "empty table"."""
    v = version if version is not None else table.current_version()
    if v == 0:
        raise FileNotFoundError(f"no committed WAP table at {table.path}")
    rec = table._commit_record(v)
    stats = rec.get("table_stats")
    if not stats:
        raise LookupError(
            f"table at {table.path} has no statistics — run "
            "collect_table_stats first"
        )
    out = dict(stats)
    # commits since the analyzed snapshot, not counting the analyze
    # commit itself or later metadata-only stat refreshes
    data_ops = 0
    for between in range(stats["analyzed_version"] + 1, v + 1):
        op = table._commit_record(between).get("operation", "")
        if op not in ("analyze", "analyze_keys", "add_constraint",
                      "drop_constraint", "alter_schema"):
            data_ops += 1
    out["staleness"] = data_ops
    return out


def estimated_bytes(stats: dict, cols: Sequence[str] | None = None) -> int:
    """Rows × estimated row width over the analyzed columns (or the
    given subset — e.g. only the columns a join actually projects,
    which is what decides whether the BUILD SIDE fits in memory).
    Width = fixed type widths + avg_len for strings + 8 bytes row
    overhead. An estimate for planning, not accounting."""
    columns = stats["columns"]
    if not columns:
        raise ValueError(
            "no column statistics (key-shape stats only) — run "
            "collect_table_stats before asking for a size estimate; a "
            "silent rows×overhead guess would make join_advice call "
            "everything broadcastable"
        )
    names = list(cols) if cols is not None else list(columns)
    width = 8.0
    for c in names:
        entry = columns.get(c)
        if entry is None:
            raise ValueError(f"column {c!r} was not analyzed")
        t = entry["type"]
        if t == "string":
            width += entry.get("avg_len", 16.0) + 8
        elif t.startswith("decimal"):
            width += 16
        else:
            width += _TYPE_WIDTH.get(t, 16)
    return int(stats["row_count"] * width)


def union_ndv(stats_list: Sequence[dict], col: str, spark) -> int:
    """NDV of a column ACROSS tables without rescanning any of them:
    union the stored HLL sketches (mergeable by construction). The
    cross-table deduplication-planning primitive — e.g. "how many
    distinct customer keys exist across the seven regional tables"
    is one driver-side union of 4 KB sketches."""
    blobs = []
    for s in stats_list:
        entry = s["columns"].get(col)
        if entry is None or "ndv_sketch" not in entry:
            raise ValueError(f"no sketch for column {col!r} in one input")
        blobs.append((base64.b64decode(entry["ndv_sketch"]),))
    est = (
        spark.createDataFrame(blobs, "sk binary")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .first()[0]
    )
    return int(round(est))


def overlap_ndv(stats_a: dict, stats_b: dict, col: str, spark) -> dict:
    """Estimated key-domain overlap between two tables' ``col`` from
    their stored sketches alone — inclusion-exclusion over the HLL
    union (``|A∩B| ≈ ndv_A + ndv_B − |A∪B|``), clamped to the valid
    range. Returns ``{"ndv_a", "ndv_b", "union", "intersection",
    "containment_a", "containment_b"}`` where containment_X =
    intersection / ndv_X — the join-selectivity signal ("every key of
    the delta exists in the target" reads containment_a ≈ 1.0).

    Error compounds across three estimates, so treat small
    intersections as noisy: at lg_k=12 each estimate carries ~1.6 %
    relative standard error of the LARGER cardinalities — an
    intersection much smaller than that band is indistinguishable
    from zero. Planning-grade, not accounting-grade."""
    u = union_ndv([stats_a, stats_b], col, spark)
    a = stats_a["columns"][col].get("ndv")
    b = stats_b["columns"][col].get("ndv")
    if a is None or b is None:
        raise ValueError(f"no NDV estimate for column {col!r} on one side")
    inter = max(0, min(a, b, a + b - u))
    return {
        "ndv_a": a,
        "ndv_b": b,
        "union": u,
        "intersection": inter,
        "containment_a": inter / a if a else 0.0,
        "containment_b": inter / b if b else 0.0,
    }


def join_advice(
    left: WapTable,
    right: WapTable,
    on: Sequence[str] | tuple[Sequence[str], Sequence[str]],
    project_left: Sequence[str] | None = None,
    project_right: Sequence[str] | None = None,
    broadcast_threshold_bytes: int = 64 * 1024 * 1024,
    skew_ratio: float = 8.0,
) -> dict:
    """The CBO decision from metadata alone — no scan, no job:

    1. Either projected side under ``broadcast_threshold_bytes`` →
       ``broadcast_left`` / ``broadcast_right`` (the smaller one).
    2. Otherwise, if key-shape stats show a hot key
       (``max_key_rows ≥ skew_ratio × mean_key_rows``) on either
       side → ``salted_shuffle`` with a suggested salt factor
       (hot-key rows vs the mean, capped at 32 — the same shape
       j13_salted_join hand-tunes).
    3. Otherwise → ``shuffle`` (plain sort-merge/hash; AQE refines).

    Also estimates output cardinality with the containment rule
    ``|L ⋈ R| ≈ |L|·|R| / max(ndv_L, ndv_R)`` over the first join
    key. Both sides' staleness ride along in ``reasons`` — advice
    from stale stats says so instead of pretending.

    Returns a plain dict (strategy, salt, estimates, reasons); feed
    it to :func:`apply_join_advice` for the executable form."""
    if isinstance(on[0], (list, tuple)):
        left_on, right_on = list(on[0]), list(on[1])
    else:
        left_on = right_on = list(on)
    ls, rs = table_stats(left), table_stats(right)
    lbytes = estimated_bytes(ls, project_left)
    rbytes = estimated_bytes(rs, project_right)
    reasons = [
        f"left: {ls['row_count']} rows ≈ {lbytes / 1e6:.1f} MB"
        + (f" (stats {ls['staleness']} commits stale)" if ls["staleness"] else ""),
        f"right: {rs['row_count']} rows ≈ {rbytes / 1e6:.1f} MB"
        + (f" (stats {rs['staleness']} commits stale)" if rs["staleness"] else ""),
    ]

    lk, rk = left_on[0], right_on[0]
    lndv = ls["columns"].get(lk, {}).get("ndv")
    rndv = rs["columns"].get(rk, {}).get("ndv")
    est_out = None
    if lndv and rndv:
        est_out = int(
            ls["row_count"] * rs["row_count"] / max(lndv, rndv)
        )
        reasons.append(
            f"containment estimate: {ls['row_count']}·{rs['row_count']}"
            f"/max(ndv {lndv}, {rndv}) ≈ {est_out} output rows"
        )

    advice: dict = {
        "left_bytes": lbytes,
        "right_bytes": rbytes,
        "estimated_output_rows": est_out,
        "reasons": reasons,
    }
    if min(lbytes, rbytes) <= broadcast_threshold_bytes:
        side = "right" if rbytes <= lbytes else "left"
        advice["strategy"] = f"broadcast_{side}"
        reasons.append(
            f"{side} side fits the {broadcast_threshold_bytes >> 20} MB "
            "broadcast threshold — zero shuffle of the big side"
        )
        return advice

    def hot(stats: dict, key: str) -> tuple[bool, float]:
        k = (stats.get("keys") or {}).get(key)
        if not k or k["mean_key_rows"] <= 0:
            return False, 0.0
        return (
            k["max_key_rows"] >= skew_ratio * k["mean_key_rows"],
            k["max_key_rows"] / k["mean_key_rows"],
        )

    lhot, lratio = hot(ls, lk)
    rhot, rratio = hot(rs, rk)
    if lhot or rhot:
        ratio = max(lratio, rratio)
        salt = max(2, min(32, int(math.ceil(ratio / 4))))
        advice["strategy"] = "salted_shuffle"
        advice["salt"] = salt
        reasons.append(
            f"hot key detected (max/mean rows-per-key ≈ {ratio:.0f} ≥ "
            f"{skew_ratio:g}) — salt factor {salt}"
        )
        return advice
    advice["strategy"] = "shuffle"
    reasons.append(
        "both sides exceed the broadcast threshold and no recorded hot "
        "key — plain shuffle join, AQE refines at runtime"
    )
    return advice


def apply_join_advice(
    left_df: DataFrame,
    right_df: DataFrame,
    on: Sequence[str],
    advice: dict,
    how: str = "inner",
) -> DataFrame:
    """Execute the advised strategy: broadcast hints for the
    broadcast strategies, :func:`skew.salted_join` (replicate the
    small side salt-ways, explode the hot side) for
    ``salted_shuffle``, a plain join otherwise. The RESULT is
    identical under every strategy — only the physical plan moves."""
    strategy = advice["strategy"]
    if strategy == "broadcast_right":
        return left_df.join(F.broadcast(right_df), on=list(on), how=how)
    if strategy == "broadcast_left":
        return F.broadcast(left_df).join(right_df, on=list(on), how=how)
    if strategy == "salted_shuffle":
        from etl_reporting_spark.operators.skew import salted_join

        return salted_join(
            left_df,
            right_df,
            on=list(on),
            salt_buckets=advice.get("salt", 8),
            how=how,
        )
    return left_df.join(right_df, on=list(on), how=how)
