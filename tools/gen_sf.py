"""Deterministic scale-up generator: replicate a driver testdata tier
K× with key-offset remapping, producing larger tiers for benchmarking.

Why this exists: the driver ships sf<=0.1 (/root/testdata, read-only).
At sf0.1 most headline queries finish under a second on local[32], so
wall-clock is scheduling-dominated and the bench cannot distinguish a
real plan regression from ambient noise (round-4 verdict, "Next round"
item 1). This tool builds larger tiers locally so the heavy gates run
long enough (cold) for compute to dominate.

Replication design (deterministic, no RNG — same output every run):

- ``region`` / ``nation``: shared dimensions, copied as-is. Real TPC-H
  holds these fixed across scale factors too.
- Fact/dim surrogate keys (custkey, suppkey, partkey, orderkey,
  event_id, user_id, doc_id, vec_id): replica ``i`` adds
  ``i * 10**7`` — far above any base-tier key, so replicas never
  collide and every FK edge lands inside its own replica (join
  fan-out per key is preserved exactly; group-by cardinality scales
  linearly). Implemented as a crossJoin against a broadcast
  ``range(k)`` so the plan has ONE branch regardless of k.
- ``documents.text``: replica ``i>0`` suffixes every whitespace token
  with ``~r{i}``. Within a replica the near-dup structure of the base
  tier is preserved byte-for-byte; across replicas every shingle
  differs, so Jaccard/MinHash similarity is 0. Without this, Kx
  replication would hand every doc K-1 exact twins and the dedup
  benchmarks would measure an artificial quadratic in-bucket blowup
  instead of linear corpus growth. ``n_chars`` is recomputed.
- ``embeddings.embedding``: replica ``i`` rotates the vector left by
  ``i mod dim`` positions and negates it on every second trip around
  the dim cycle — both transforms norm-preserving, so the cosine
  geometry of each replica matches the base tier, and all 2·dim
  transforms are distinct (no degenerate cosine-1.0 top-k ties;
  generation refuses k beyond the family).
- Timestamps/dates/measures are copied unchanged: time-window queries
  see Kx rows per window, the same group count — the scale-up shape a
  real Kx traffic increase produces.

Tiers (generated under .localdata/, gitignored):

- ``sf3``  — all tables at k=30, ``embeddings`` at k=100 (PQ/IVF
  probes are cheap per vector). Sized so every LLM heavy gate
  (dedup, ANN, charlm) runs >=5 s COLD on local[32].
- ``sf10`` — join chain (customer/orders/lineitem) at k=300, other
  facts k=100, ``events`` at k=1200 (the events-driven gates —
  flagship, sessionization — are single-window + broadcast-join
  plans needing far more rows before compute dominates), documents
  k=100. See TIERS below for the authoritative numbers. Events
  replicas beyond the customer k carry user_ids with no customer
  row; the flagship join's probe-side cost (the heavy part) still
  scales honestly, the hit rate just drops — documented here so
  nobody reads the output row count as a scale check.

Usage:
    python tools/gen_sf.py            # builds both bench tiers
    python tools/gen_sf.py BASE OUT K # one custom tier
or programmatically ``ensure_tier(spark, "sf3")``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEY_OFFSET = 10_000_000

# table -> (key columns to offset, output file count)
_OFFSET_COLS: dict[str, tuple[list[str], int]] = {
    "region": ([], 1),
    "nation": ([], 1),
    "customer": (["c_custkey"], 4),
    "supplier": (["s_suppkey"], 1),
    "part": (["p_partkey"], 4),
    "orders": (["o_orderkey", "o_custkey"], 8),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 16),
    "events": (["event_id", "user_id"], 8),
    "documents": (["doc_id"], 8),
    "embeddings": (["vec_id"], 4),
}

RELATIONAL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]

#: tier name -> {table: k}; tables absent from the dict are skipped.
#: Per-table k values are calibrated so every heavy-bench gate runs
#: >=5 s COLD on a YOUNG JVM (bench.py times heavies first; the aged
#: session that earlier calibrations ran under reads ~10-60% slower):
#: embeddings scale further than documents (PQ/IVF probes are cheap
#: per vector), events further than lineitem (single-window plans).
TIERS: dict[str, dict[str, int]] = {
    "sf3": {**{t: 30 for t in _OFFSET_COLS}, "embeddings": 100},
    # the j1 join chain (lineitem-orders-customer) runs at 300x: the
    # sorted-write layout compresses the key columns so well that a
    # 100x scan finishes under the floor; dims the chain doesn't
    # exercise stay at 100x
    "sf10": {
        **{t: 100 for t in RELATIONAL_TABLES},
        "customer": 300,
        "orders": 300,
        "lineitem": 300,
        "events": 1200,
        "documents": 100,
    },
}


def _replicate(spark: SparkSession, df: DataFrame, table: str, k: int) -> DataFrame:
    cols, _ = _OFFSET_COLS[table]
    if not cols or k <= 1:  # shared dims: one copy
        return df
    rep = F.broadcast(spark.range(k).select(F.col("id").alias("__rep")))
    out = df.crossJoin(rep)
    for c in cols:
        out = out.withColumn(
            c, (F.col(c) + F.col("__rep") * KEY_OFFSET).cast(df.schema[c].dataType)
        )
    if table == "documents":
        suffixed = F.expr(
            "array_join(transform(split(text, ' '),"
            " w -> concat(w, '~r', cast(__rep AS string))), ' ')"
        )
        out = out.withColumn(
            "text", F.when(F.col("__rep") == 0, F.col("text")).otherwise(suffixed)
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if table == "embeddings":
        # rotate by rep % dim; NEGATE on every second trip around the
        # dim cycle. Rotation alone is the identity at rep % dim == 0,
        # so k > dim would duplicate replica 0's vectors exactly
        # (degenerate cosine-1.0 ties in the ANN benches); the sign
        # flip keeps all 2·dim transforms distinct and norm-preserving.
        rot = F.expr(
            "transform("
            " concat(slice(embedding, CAST(__rep % size(embedding) AS INT) + 1,"
            "              size(embedding) - CAST(__rep % size(embedding) AS INT)),"
            "        slice(embedding, 1, CAST(__rep % size(embedding) AS INT))),"
            " x -> CASE WHEN (__rep DIV size(embedding)) % 2 = 1"
            "      THEN -x ELSE x END)"
        )
        out = out.withColumn(
            "embedding", rot.cast(df.schema["embedding"].dataType)
        )
        n_transforms = 2 * 64  # dim of the driver embeddings
        if k > n_transforms:
            raise ValueError(
                f"embeddings k={k} exceeds the {n_transforms} distinct "
                "rotate+negate transforms — add another transform family "
                "before scaling further"
            )
    return out.drop("__rep")


def generate(
    spark: SparkSession,
    base_dir: str,
    out_dir: str,
    k: int | dict[str, int] = 10,
    tables: list[str] | None = None,
) -> None:
    """Write driver tables replicated to ``out_dir``. ``k`` is a
    uniform factor or a per-table dict (tables absent from the dict
    are skipped).

    Idempotent per table: a table whose output already has a _SUCCESS
    marker is skipped, so an interrupted generation resumes.
    """
    os.makedirs(out_dir, exist_ok=True)
    for table, (cols, n_files) in _OFFSET_COLS.items():
        if tables is not None and table not in tables:
            continue
        if isinstance(k, dict):
            if table not in k:
                continue
            kt = k[table]
        else:
            kt = k
        dest = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            continue
        base = spark.read.parquet(f"{base_dir}/{table}.parquet")
        full = _replicate(spark, base, table, kt)
        if not cols:
            full.coalesce(n_files).write.mode("overwrite").parquet(dest)
            continue
        # scale file count with k; HASH-repartition on the key so the
        # row→file assignment is a pure function of the key (range
        # partitioning samples its bounds and jitters a few boundary
        # rows between generations — tests/test_gen_sf.py pins
        # byte-level reproducibility because round-over-round bench
        # comparability rests on identical physical layout)
        n_out = max(n_files, min(64, n_files * kt // 10))
        (
            full.repartition(n_out, F.col(cols[0]))
            .sortWithinPartitions(*cols)
            .write.mode("overwrite")
            .parquet(dest)
        )


def ensure_tier(spark: SparkSession, tier: str, out_dir: str | None = None) -> str:
    """Generate a named bench tier if absent; return its path."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = out_dir or os.environ.get(
        f"SPARK_GRAFT_{tier.upper()}_DIR", os.path.join(repo, ".localdata", tier)
    )
    generate(spark, "/root/testdata/sf0.1", out, k=TIERS[tier])
    return out


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from etl_reporting_spark.session import get_spark

    spark = get_spark("gen_sf")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1:
        base, out = sys.argv[1], sys.argv[2]
        k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
        generate(spark, base, out, k=k)
        print(f"generated {out} (k={k})")
    else:
        for tier in TIERS:
            print(f"generated {ensure_tier(spark, tier)}")
