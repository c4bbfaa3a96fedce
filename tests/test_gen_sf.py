"""tools/gen_sf.py — the bench-tier generator that round-over-round
comparability rests on. Two properties matter:

1. DETERMINISM: generating the same tier twice yields identical
   CONTENT (same rows, same per-file assignment) — otherwise two
   rounds would bench different physical layouts and deltas would
   mean nothing.
2. SHAPE: keys offset per replica with FK edges intact; documents'
   cross-replica texts share no shingles (so dedup cost scales
   linearly, the property the word-suffix transform exists for);
   embeddings rotate (distinct vectors, same norms).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tools.gen_sf import KEY_OFFSET, generate

BASE = "/root/testdata/sf0.001"
K = 3


@pytest.fixture(scope="module")
def tiers(spark, tmp_path_factory):
    a = str(tmp_path_factory.mktemp("gen") / "a")
    b = str(tmp_path_factory.mktemp("gen") / "b")
    tables = ["nation", "customer", "orders", "documents", "embeddings"]
    generate(spark, BASE, a, k=K, tables=tables)
    generate(spark, BASE, b, k=K, tables=tables)
    return a, b


def test_two_generations_identical(spark, tiers):
    a, b = tiers
    for t, key in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                   ("documents", "doc_id"), ("embeddings", "vec_id")]:
        da = spark.read.parquet(f"{a}/{t}.parquet")
        db = spark.read.parquet(f"{b}/{t}.parquet")
        assert da.count() == db.count()
        # content-identical: anti-joins empty both ways on full rows
        cols = [c for c in da.columns if c != "embedding"]
        assert da.select(cols).exceptAll(db.select(cols)).count() == 0
        assert db.select(cols).exceptAll(da.select(cols)).count() == 0
        # per-file assignment identical (same range partitioning)
        fa = da.select(key, F.input_file_name().alias("f"))
        fb = db.select(key, F.input_file_name().alias("f"))
        na = fa.select(key, F.regexp_extract("f", r"(part-\d+)", 1).alias("p"))
        nb = fb.select(key, F.regexp_extract("f", r"(part-\d+)", 1).alias("p"))
        assert na.exceptAll(nb).count() == 0


def test_keys_offset_and_fk_intact(spark, tiers):
    a, _ = tiers
    cust = spark.read.parquet(f"{a}/customer.parquet")
    orders = spark.read.parquet(f"{a}/orders.parquet")
    base_cust = spark.read.parquet(f"{BASE}/customer.parquet")
    assert cust.count() == base_cust.count() * K
    # every order's customer exists (FK edges stay inside replicas)
    orphans = orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
    assert orphans.count() == 0
    # replica 1 keys live in [OFFSET, 2*OFFSET)
    r1 = cust.filter(
        (F.col("c_custkey") >= KEY_OFFSET) & (F.col("c_custkey") < 2 * KEY_OFFSET)
    )
    assert r1.count() == base_cust.count()


def test_documents_cross_replica_disjoint_shingles(spark, tiers):
    from etl_reporting_spark.llm.dedup import shingle_docs

    a, _ = tiers
    docs = spark.read.parquet(f"{a}/documents.parquet")
    sh = shingle_docs(docs, k=3).withColumn(
        "replica", (F.col("doc_id") / KEY_OFFSET).cast("long")
    )
    # no shingle appears in more than one replica
    cross = (
        sh.groupBy("shingle")
        .agg(F.countDistinct("replica").alias("n_rep"))
        .filter(F.col("n_rep") > 1)
    )
    assert cross.count() == 0


def test_embeddings_rotated_same_norms(spark, tiers):
    a, _ = tiers
    emb = spark.read.parquet(f"{a}/embeddings.parquet").withColumn(
        "replica", (F.col("vec_id") / KEY_OFFSET).cast("long")
    ).withColumn("base_id", F.col("vec_id") % KEY_OFFSET)
    norm = F.expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    by_base = (
        emb.withColumn("n2", norm)
        .groupBy("base_id")
        .agg(
            F.countDistinct(F.round("n2", 6)).alias("n_norms"),
            F.countDistinct(F.col("embedding").cast("string")).alias("n_distinct_vecs"),
        )
    )
    rows = by_base.collect()
    # rotation preserves the norm but produces distinct vectors
    assert all(r["n_norms"] == 1 for r in rows)
    assert all(r["n_distinct_vecs"] == K for r in rows)


def test_embeddings_distinct_beyond_dim_replicas(spark, tmp_path):
    """k > dim: pure rotation is the identity at rep % dim == 0; the
    sign flip must keep every replica's vector distinct (no
    degenerate cosine-1.0 ties in the ANN benches)."""
    out = str(tmp_path / "emb66")
    generate(spark, BASE, out, k=66, tables=["embeddings"])
    emb = spark.read.parquet(f"{out}/embeddings.parquet").withColumn(
        "base_id", F.col("vec_id") % KEY_OFFSET
    )
    per_base = emb.groupBy("base_id").agg(
        F.countDistinct(F.col("embedding").cast("string")).alias("n_distinct")
    )
    bad = per_base.filter(F.col("n_distinct") != 66).count()
    assert bad == 0


def test_embeddings_k_beyond_transform_family_raises(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct"):
        generate(spark, BASE, str(tmp_path / "emb999"), k=200, tables=["embeddings"])
