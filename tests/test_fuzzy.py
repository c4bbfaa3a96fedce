"""Fuzzy matching: q-gram blocked edit-distance dedup/join
(operators/fuzzy.py — the Gravano et al. approximate-string-join
pattern; gate fuzzy_address_dedup carries the full value-hash
oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_reporting_spark.operators.fuzzy import (
    fuzzy_dedup_pairs,
    fuzzy_join,
    qgram_candidates,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_recovers_pairs_within_edit_budget(spark):
    df = _names(
        spark,
        [
            (1, "jonathan smith"),
            (2, "jonathon smith"),      # 1 substitution
            (3, "jonathan smiths"),     # 1 insertion
            (4, "mary jones"),
            (5, "completely different"),
        ],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in fuzzy_dedup_pairs(df, "id", "name", max_edit=2).collect()
    }
    assert pairs[(1, 2)] == 1 and pairs[(1, 3)] == 1 and pairs[(2, 3)] == 2
    assert not any(4 in k or 5 in k for k in pairs)


def test_short_strings_below_qgram_lemma_are_still_found(spark):
    """'cat'/'hat' share ZERO trigrams — only the length-bucket pass
    can pair them; the q-gram lemma's completeness floor is
    (k+1)·q = 9 chars."""
    df = _names(spark, [(1, "cat"), (2, "hat"), (3, "catastrophe")])
    pairs = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in fuzzy_dedup_pairs(df, "id", "name", max_edit=2).collect()
    }
    assert pairs == {(1, 2): 1}
    # and turning the pass off documents the recall loss honestly
    without = fuzzy_dedup_pairs(
        df, "id", "name", max_edit=2, short_len_cross=False
    ).collect()
    assert without == []


def test_max_df_caps_block_blowup(spark):
    """A q-gram shared by every string emits n² candidates; the df
    cap drops it BEFORE the self-join (same guard as the shingle
    inverted index). With only the hot gram in common, no candidates
    survive — and candidate count, not result correctness, is what
    the cap trades."""
    rows = [(i, f"commonprefix-{i:04d}") for i in range(50)]
    df = _names(spark, rows)
    capped = qgram_candidates(df, "id", "name", q=3, max_df=10)
    uncapped = qgram_candidates(df, "id", "name", q=3, max_df=None)
    assert capped.count() < uncapped.count()
    assert uncapped.count() == 50 * 49 // 2  # shared prefix = all pairs


def test_fuzzy_join_best_match_is_deterministic(spark):
    left = spark.createDataFrame(
        [(10, "jonathan smth"), (11, "no match here at all")],
        "lid long, lname string",
    )
    right = _names(
        spark,
        [(1, "jonathan smith"), (2, "jonathan smyth"), (3, "mary jones")],
    )
    out = fuzzy_join(
        left, right, "lname", "name", "lid", "id",
        max_edit=2,
    ).collect()
    assert len(out) == 1
    r = out[0]
    # ids 1 and 2 are both 1 edit away (insert 'i' / insert 'y'):
    # the tie breaks deterministically by smallest right id
    assert (r["left_id"], r["right_id"], r["edit_distance"]) == (10, 1, 1)
    # best_only=False returns both verified matches
    both = fuzzy_join(
        left, right, "lname", "name", "lid", "id",
        max_edit=2, best_only=False,
    ).collect()
    assert sorted(m["right_id"] for m in both) == [1, 2]


def test_repartition_stable(spark):
    rows = [(i, f"item number {i} of the catalog") for i in range(40)] + [
        (1000, "item number 7 of the catalog!"),
    ]
    df = _names(spark, rows)
    a = sorted(
        map(tuple, fuzzy_dedup_pairs(df, "id", "name", max_edit=2).collect())
    )
    b = sorted(
        map(
            tuple,
            fuzzy_dedup_pairs(
                df.repartition(7), "id", "name", max_edit=2
            ).collect(),
        )
    )
    assert a == b and (7, 1000, 1) in a
