"""cache_scope: structural release of operator-persisted intermediates.

Round-4 verdict #8: the opt-in ``cleanup`` lists work but default to
leaking in long sessions. These tests pin the scope contract: frames
persisted by operators inside ``with cache_scope():`` are live inside
the block and gone after it — including frames a composed pipeline
persisted internally without threading any cleanup list.
"""

from __future__ import annotations

import pytest

from etl_reporting_spark.caching import cache_scope, track
from etl_reporting_spark.io import Engine


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture()
def no_preexisting_cache(spark):
    spark.catalog.clearCache()
    assert _n_cached(spark) == 0
    yield
    spark.catalog.clearCache()


def test_scope_releases_tracked_frames(spark, no_preexisting_cache):
    df = spark.range(100).persist()
    df.count()
    with cache_scope():
        track(df)
        assert _n_cached(spark) == 1
    assert _n_cached(spark) == 0
    # the frame stays valid after release — lineage recomputes
    assert df.count() == 100


def test_scope_nesting_releases_only_inner(spark, no_preexisting_cache):
    outer = spark.range(10).persist()
    outer.count()
    inner = spark.range(20).persist()
    inner.count()
    with cache_scope():
        track(outer)
        with cache_scope():
            track(inner)
            assert _n_cached(spark) == 2
        assert _n_cached(spark) == 1  # inner released, outer kept
    assert _n_cached(spark) == 0


def test_explicit_cleanup_list_still_works(spark, no_preexisting_cache):
    """The round-3 contract is unchanged: outside any scope, track()
    only appends to the caller's list."""
    df = spark.range(5).persist()
    df.count()
    cleanup: list = []
    track(df, cleanup)
    assert cleanup == [df]
    assert _n_cached(spark) == 1
    for f in cleanup:
        f.unpersist()
    assert _n_cached(spark) == 0


def test_composed_pipeline_leaves_nothing_cached(spark, sf_dir, no_preexisting_cache):
    """near_duplicate_clusters persists LSH candidates internally (no
    cleanup list threaded) and connected-components labels; inside a
    scope both are released on exit. Force the distributed components
    path (driver_max_edges=0 is the leak-prone one — the driver
    union-find path never persists)."""
    from etl_reporting_spark.io import load_table
    from etl_reporting_spark.llm.cluster import connected_components
    from etl_reporting_spark.llm.dedup import minhash_near_duplicates

    docs = load_table(spark, sf_dir, "documents")
    with Engine(spark).cache_scope():
        pairs = minhash_near_duplicates(docs)
        comp = connected_components(
            pairs, src="doc_a", dst="doc_b", driver_max_edges=0
        )
        n = comp.count()  # consume INSIDE the scope
        assert n > 0
        assert _n_cached(spark) > 0  # intermediates live while consuming
    assert _n_cached(spark) == 0


def test_semantic_dedup_scoped(spark, sf_dir, no_preexisting_cache):
    from etl_reporting_spark.io import load_table
    from etl_reporting_spark.llm.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    with cache_scope():
        fate = semantic_dedup(emb, n_centroids=4)
        assert fate.count() > 0
        assert _n_cached(spark) == 1  # the IVF assignment
    assert _n_cached(spark) == 0


class TestMaybePersist:
    """Round-5 advice: importance_scores persisted even when nothing
    could release the frame. maybe_persist makes the persist
    conditional on releasability."""

    def test_bare_call_does_not_persist(self, spark, no_preexisting_cache):
        from etl_reporting_spark.caching import maybe_persist

        df = maybe_persist(spark.range(50))
        assert df.count() == 50
        assert _n_cached(spark) == 0

    def test_persists_inside_scope_and_releases(self, spark, no_preexisting_cache):
        from etl_reporting_spark.caching import maybe_persist

        with cache_scope():
            df = maybe_persist(spark.range(50))
            assert df.count() == 50
            assert _n_cached(spark) == 1
        assert _n_cached(spark) == 0

    def test_persists_with_cleanup_list(self, spark, no_preexisting_cache):
        from etl_reporting_spark.caching import maybe_persist

        cleanup: list = []
        df = maybe_persist(spark.range(50), cleanup)
        assert cleanup == [df]
        assert _n_cached(spark) == 1
        for f in cleanup:
            f.unpersist()
        assert _n_cached(spark) == 0

    def test_bare_dsir_and_ccnet_gates_leave_nothing_cached(
        self, spark, sf_dir, no_preexisting_cache
    ):
        """The exact advice scenario: the driver gates call the
        operators with neither a scope nor a cleanup list — after
        consumption the session cache must be empty."""
        from etl_reporting_spark.plans.llm_queries import (
            text_ccnet_buckets,
            text_dsir_select,
        )

        assert text_dsir_select(spark, sf_dir).count() > 0
        assert text_ccnet_buckets(spark, sf_dir).count() > 0
        assert _n_cached(spark) == 0
