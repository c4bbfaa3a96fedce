"""Fuzzy matching: q-gram blocked edit-distance dedup and join.

Entity resolution over dirty keys (names, addresses, product titles)
needs "equal up to k edits", which no equi-join expresses. The naive
plan is the n² cross join with ``levenshtein`` — unrunnable at any
scale. The classical fix (Gravano et al., VLDB 2001 — approximate
string joins in a database) is Q-GRAM BLOCKING: two strings within
edit distance k must share at least

    max(|a|, |b|) − q + 1 − k·q

positional q-grams, so for strings of length ≥ (k+1)·q the candidate
set {pairs sharing ≥ 1 q-gram} has PERFECT RECALL, and the expensive
edit-distance verification runs only on candidates. Shorter strings
fall below the lemma's bound; ``short_len_cross`` routes them through
a DELETION-NEIGHBORHOOD pass (the SymSpell blocking scheme, Garbe
2012): if ``ed(a, b) ≤ k`` then some common string is reachable from
BOTH by deleting ≤ k characters (delete the substituted/inserted/
deleted positions of any ≤ k-op alignment from each side), so
blocking on the ≤ k-deletion variant set has perfect recall. A
string of length L < (k+1)·q contributes Σ_{i≤k} C(L, i) variants
(≤ 37 at the L<9, k=2 defaults), and candidate work is Σ_v df(v)²
over variant blocks — NOT |shorts|²: a round-6 version bucketed
shorts by length alone, which is an effective cross join within
±k length classes and quadratic in exactly the corpora fuzzy
matching serves (first names, SKUs). Hot variants are df-capped by
the same ``max_df`` guard as hot q-grams (same documented recall
trade on boilerplate keys).

Spark-first shape (the MinHash/SimHash recipe this repo uses
everywhere): q-grams are built IN-ROW with a sequence transform (no
UDF), the per-string q-gram set explodes once, hot q-grams are capped
by document frequency BEFORE the self-join (a q-gram in f strings
emits f² candidate pairs — same quadratic blowup, and the same
``max_df`` guard, as the shingle inverted index in llm/dedup.py), the
block join carries only (qgram, id), and verification joins the two
text columns back by id. Length pre-filter ``|len_a − len_b| ≤ k``
prunes candidates before ``levenshtein`` runs. Everything is
integers + builtin functions — JVM codegen end to end, and DuckDB's
``levenshtein`` agrees with Spark's exactly, so the gate value-hashes.

Scale: work is Σ_g df(g)² over q-gram blocks (bounded by ``max_df``),
never n². The df cap trades recall on BOILERPLATE-heavy q-grams
exactly like ``max_df`` in the Jaccard path; blocks it drops are
pairs sharing only ubiquitous trigrams ("Customer#0..." prefixes),
which the caller tunes with ``max_df``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletion_neighborhood_expr(col: str, k: int) -> str:
    """SQL expression: all DISTINCT strings reachable from string
    column ``col`` by deleting at most ``k`` characters (the SymSpell
    blocking key set). Built in-row by k chained delete-one levels —
    no UDF, stays in whole-stage codegen. Level m holds ≤ L!/(L-m)!
    strings pre-distinct; for the short strings this pass serves
    (L < (k+1)·q) that is tens, not thousands."""
    del1 = (
        "flatten(transform(filter({vs}, v -> length(v) > 0),"
        " v -> transform(sequence(1, length(v)),"
        " i -> concat(substring(v, 1, i - 1),"
        " substring(v, i + 1, length(v))))))"
    )
    levels = [f"array({col})"]
    for _ in range(k):
        levels.append(del1.format(vs=levels[-1]))
    return "array_distinct(concat(" + ", ".join(levels) + "))"


def _qgrams(col: Column, q: int) -> Column:
    """Distinct positional-agnostic q-grams of a string column,
    in-row (set semantics for blocking; the count lemma above is
    stated for positional grams — set blocking is strictly more
    permissive, so recall is preserved)."""
    n = F.length(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(q - 1), F.lit(1))),
            lambda i: col.substr(i, F.lit(q)),
        )
    )


def qgram_candidates(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    q: int = 3,
    max_df: int | None = 100,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing ≥ 1 q-gram, with the
    shared-gram count (useful for count-filter refinements). One
    explode + one self-equi-join on the gram; ``max_df`` drops grams
    appearing in more than that many strings before the join."""
    grams = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
        .select("__id", F.explode(_qgrams(F.col("__t"), q)).alias("__g"))
        .filter(F.length("__g") == q)
    )
    if max_df is not None:
        hot = (
            grams.groupBy("__g")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("__g")
        )
        grams = grams.join(F.broadcast(hot), "__g", "left_anti")
    a = grams.select(F.col("__id").alias("id_a"), "__g")
    b = grams.select(F.col("__id").alias("id_b"), "__g")
    return (
        a.join(b, "__g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_qgrams"))
    )


def fuzzy_dedup_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    q: int = 3,
    max_edit: int = 2,
    max_df: int | None = 100,
    short_len_cross: bool = True,
) -> DataFrame:
    """All pairs within ``max_edit`` Levenshtein edits: q-gram block →
    length pre-filter → exact ``levenshtein`` verify. Complete for
    strings of length ≥ (max_edit+1)·q by the q-gram count lemma;
    ``short_len_cross`` adds the sub-lemma-length strings back via
    deletion-neighborhood blocking (module note): each short string
    explodes to its ≤ max_edit-deletion variants and pairs only with
    strings sharing a variant — work is Σ_v df(v)² over variant
    blocks (df-capped by ``max_df``), never |shorts|². A mixed pair
    (one side short, one ≥ the lemma floor) is always caught by the
    q-gram pass: within k edits the longer side's length bounds the
    lemma, which is positive once max(|a|,|b|) ≥ (k+1)·q."""
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    cand = qgram_candidates(df, id_col, text_col, q=q, max_df=max_df).select(
        "id_a", "id_b"
    )
    if short_len_cross:
        floor = (max_edit + 1) * q
        svar = (
            base.filter(F.length("__t") < floor)
            .select(
                "__id",
                F.explode(
                    F.expr(_deletion_neighborhood_expr("__t", max_edit))
                ).alias("__v"),
            )
        )
        if max_df is not None:
            hot = (
                svar.groupBy("__v")
                .agg(F.count("*").alias("__df"))
                .filter(F.col("__df") > max_df)
                .select("__v")
            )
            svar = svar.join(F.broadcast(hot), "__v", "left_anti")
        sa = svar.select(F.col("__id").alias("id_a"), "__v")
        sb = svar.select(F.col("__id").alias("id_b"), "__v")
        short_pairs = (
            sa.join(sb, "__v")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cand = cand.union(short_pairs).distinct()
    ta = base.select(F.col("__id").alias("id_a"), F.col("__t").alias("text_a"))
    tb = base.select(F.col("__id").alias("id_b"), F.col("__t").alias("text_b"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(
            F.abs(F.length("text_a") - F.length("text_b")) <= max_edit
        )
        .withColumn("edit_distance", F.levenshtein("text_a", "text_b"))
        .filter(F.col("edit_distance") <= max_edit)
        .select("id_a", "id_b", "edit_distance")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    left_id: str,
    right_id: str,
    q: int = 3,
    max_edit: int = 2,
    max_df: int | None = 100,
    best_only: bool = True,
) -> DataFrame:
    """Approximate-key lookup join: each left row matched to right
    rows within ``max_edit`` edits of its text key (q-gram blocked
    for lemma-length keys, deletion-neighborhood blocked for short
    ones — same completeness split as ``fuzzy_dedup_pairs``; round-6
    had no short pass here at all, silently missing short×short
    matches). ``best_only`` keeps one match per left row — minimum
    distance, ties by smallest right id (deterministic reruns) — via
    a rank-1 window (WindowGroupLimit-eligible). The dirty-dimension
    reconciliation shape: left = incoming feed, right = master."""
    lg = (
        left.select(
            F.col(left_id).alias("left_id"), F.col(left_text).alias("left_text")
        )
        .withColumn("__g", F.explode(_qgrams(F.col("left_text"), q)))
        .filter(F.length("__g") == q)
    )
    rg = (
        right.select(
            F.col(right_id).alias("right_id"),
            F.col(right_text).alias("right_text"),
        )
        .withColumn("__g", F.explode(_qgrams(F.col("right_text"), q)))
        .filter(F.length("__g") == q)
    )
    if max_df is not None:
        hot = (
            rg.groupBy("__g")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("__g")
        )
        lg = lg.join(F.broadcast(hot), "__g", "left_anti")
        rg = rg.join(F.broadcast(hot), "__g", "left_anti")
    cand = (
        lg.join(rg, "__g")
        .select("left_id", "left_text", "right_id", "right_text")
        .distinct()
    )
    floor = (max_edit + 1) * q
    sl = (
        left.select(
            F.col(left_id).alias("left_id"), F.col(left_text).alias("left_text")
        )
        .filter(F.length("left_text") < floor)
        .select(
            "left_id",
            "left_text",
            F.explode(
                F.expr(_deletion_neighborhood_expr("left_text", max_edit))
            ).alias("__v"),
        )
    )
    sr = (
        right.select(
            F.col(right_id).alias("right_id"),
            F.col(right_text).alias("right_text"),
        )
        .filter(F.length("right_text") < floor)
        .select(
            "right_id",
            "right_text",
            F.explode(
                F.expr(_deletion_neighborhood_expr("right_text", max_edit))
            ).alias("__v"),
        )
    )
    if max_df is not None:
        vhot = (
            sr.groupBy("__v")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("__v")
        )
        sl = sl.join(F.broadcast(vhot), "__v", "left_anti")
        sr = sr.join(F.broadcast(vhot), "__v", "left_anti")
    short_cand = (
        sl.join(sr, "__v")
        .select("left_id", "left_text", "right_id", "right_text")
        .distinct()
    )
    cand = cand.union(short_cand).distinct()
    verified = (
        cand.filter(
            F.abs(F.length("left_text") - F.length("right_text")) <= max_edit
        )
        .withColumn("edit_distance", F.levenshtein("left_text", "right_text"))
        .filter(F.col("edit_distance") <= max_edit)
    )
    if not best_only:
        return verified
    from pyspark.sql import Window

    w = Window.partitionBy("left_id").orderBy(
        F.col("edit_distance").asc(), F.col("right_id").asc()
    )
    return (
        verified.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
