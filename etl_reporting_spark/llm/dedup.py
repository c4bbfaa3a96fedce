"""Document deduplication operators for training-data pipelines.

All hashing is md5-based so every stage is deterministic AND
reproducible in any engine (the DuckDB oracle computes identical
signatures): a MinHash permutation is simulated by lexicographic MIN
over ``md5(seed || '|' || shingle)`` hex strings — a standard
hash-as-permutation construction.

Scale design (100 TB):
- ``exact_dedup_map``: one hash-groupBy shuffle on a 32-hex key;
  group sizes are bounded by true duplicate cardinality.
- MinHash: signatures are computed entirely per-row — shingling
  (``array_distinct`` over a token-slice transform) and every
  signature slot (``array_min`` over per-seed md5 transforms) are
  narrow array expressions, so the FIRST shuffle in the whole
  pipeline is the banded candidate join on (band, signature) — only
  docs sharing a bucket ever meet, the whole point of LSH. No
  pairwise O(n²) stage exists except *within* buckets, whose size is
  controlled by band width. (``minhash_signatures`` keeps the
  explode+groupBy formulation for callers that already hold an
  exploded shingle relation; both produce identical values.)
- Exact Jaccard verification joins candidates back to the shingle
  inverted index — proportional to candidate count, not corpus².
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_reporting_spark.caching import track

NUM_HASHES = 12
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS


def _tokens(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def exact_dedup_map(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: content-hash each doc, elect the min-id canonical
    per hash group. Returns doc_id → (text_hash, canonical_id,
    group_size); downstream keeps rows where doc_id == canonical_id."""
    hashed = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    groups = hashed.groupBy("text_hash").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return hashed.join(groups, "text_hash").select(id_col, "text_hash", "canonical_id", "group_size")


def shingle_arrays(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word k-gram shingles per document as a per-row array:
    (id, shingles: array<string>).

    Entirely narrow — tokenize once, slice into k-grams with a
    transform over sequence, dedupe with ``array_distinct`` inside the
    row. No shuffle; downstream stages choose whether to explode.
    """
    with_toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    ).filter(F.size("__toks") >= k)
    shingles = F.expr(
        f"array_distinct(transform(sequence(1, size(__toks) - {k - 1}),"
        f" i -> concat_ws(' ', slice(__toks, i, {k}))))"
    )
    return with_toks.select(F.col(id_col), shingles.alias("shingles"))


def shingle_docs(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word k-gram shingles per document, exploded:
    (id, shingle). The per-row ``array_distinct`` makes the explode
    already-distinct — no shuffle happens here."""
    arr = shingle_arrays(docs, k=k, text_col=text_col, id_col=id_col)
    return arr.select(F.col(id_col), F.explode("shingles").alias("shingle"))


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = NUM_HASHES, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature per doc: h_i = MIN(md5(i || '|' || shingle)).

    All slots computed in ONE groupBy — num_hashes parallel MIN
    aggregates with map-side combine, not num_hashes passes.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def minhash_signatures_rowwise(
    shingle_arrs: DataFrame, num_hashes: int = NUM_HASHES, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signatures from a (id, shingles array) relation with
    ZERO shuffles: each slot is ``array_min`` over a per-seed md5
    transform. Identical values to ``minhash_signatures``
    (lexicographic min over the same md5 hex strings).

    Trade-off, measured at sf0.1: higher-order-function lambdas are
    interpreted per element, so this is ~2x slower CPU-wise than the
    codegen'd explode+groupBy formulation, whose shuffle is tiny anyway
    (map-side partial MIN collapses each doc to one row pre-exchange).
    Prefer ``minhash_signatures`` unless an extra exchange is truly
    unaffordable."""
    slots = [
        F.expr(
            f"array_min(transform(shingles, s -> md5(concat('{i}|', s))))"
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingle_arrs.select(F.col(id_col), *slots)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    id_col: str = "doc_id",
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band
    bucket. Banding: signature slots [b*r, (b+1)*r) concatenate into
    one md5 bucket key per band.

    Pairs are enumerated by grouping each bucket's members into one
    sorted array and exploding the in-row combinations — ONE pass
    over the bucket relation. The self-join formulation computes the
    signature aggregation once per join side (Spark does not reuse
    the exchange across aliased branches) and pays a broadcast build;
    measured at sf0.1 this groupBy shape is ~2.5x faster. Output
    volume is identical (Σ m²/2 per bucket either way — bucket size m
    is what band width controls), and the per-bucket array is exactly
    as bounded as the join's per-key match set."""
    buckets = band_buckets(signatures, bands=bands, rows_per_band=rows_per_band, id_col=id_col)
    grouped = (
        buckets.groupBy("band", "sig")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(sequence(1, size(__ids) - 1),"
            " i -> transform(slice(__ids, i + 1, size(__ids) - i),"
            " j -> struct(element_at(__ids, i) AS doc_a, j AS doc_b))))"
        )
    )
    return (
        grouped.select(pair.alias("__p"))
        .select(F.col("__p.doc_a").alias("doc_a"), F.col("__p.doc_b").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame | None = None,
    min_jaccard: float = 0.0,
    min_intersection: int = 1,
    id_col: str = "doc_id",
    sizes: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity for document pairs via the shingle
    inverted index. With ``candidates`` given, only those pairs are
    scored (LSH verification); otherwise all pairs sharing ≥
    ``min_intersection`` shingles (n-gram Jaccard dedup).

    ``sizes`` (id, n_shingles) can be passed precomputed — callers that
    hold the per-row shingle array get it narrowly via ``F.size``
    instead of this groupBy over the exploded relation.

    ``max_df`` (full path only) drops shingles whose document
    frequency exceeds the threshold BEFORE the inverted-index
    self-join: a boilerplate shingle in f docs otherwise emits f²
    pairs pre-filter, and no optimizer can shrink that — AQE splits
    partitions, it cannot reduce pair count. This is the standard
    hot-term cap from MinHash practice. Note it changes semantics
    (capped shingles stop counting toward the intersection, though
    they still count in ``sizes`` denominators), so it is opt-in;
    the LSH verification path never needs it — candidates are already
    banding-bounded there.

    The similarity itself is computed from exact integer counts; the
    final division happens once in double — deterministic everywhere.
    """
    if sizes is None:
        sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    if candidates is not None:
        # LSH verification path: restrict to candidate pairs BEFORE
        # counting intersections — work is O(candidates × shingles/doc),
        # not O(corpus-pairwise). (An equal-minhash collision implies a
        # shared argmin shingle, so no candidate pair is lost by the
        # inner joins.)
        a_sh = candidates.join(
            shingles.select(F.col(id_col).alias("doc_a"), "shingle"), "doc_a"
        )
        inter = (
            a_sh.join(
                shingles.select(F.col(id_col).alias("doc_b"), "shingle"),
                ["doc_b", "shingle"],
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .filter(F.col("n_common") >= min_intersection)
        )
    else:
        # Full n-gram-Jaccard path: shingle inverted-index self-join.
        if max_df is not None:
            # Document-frequency cap: one extra groupBy over the
            # exploded relation (map-side combine collapses each
            # (shingle, doc) to a single row pre-shuffle), joined back
            # as a semi-filter. Hot shingles never reach the
            # pair-generating join.
            rare = (
                shingles.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") <= max_df)
                .select("shingle")
            )
            shingles = shingles.join(rare, "shingle", "semi")
        a = shingles.alias("a")
        b = shingles.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_common"))
            .filter(F.col("n_common") >= min_intersection)
        )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= F.lit(min_jaccard)).select(
        "doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard"
    )


def verify_pairs_by_arrays(
    shingle_arrs: DataFrame,
    candidates: DataFrame,
    min_jaccard: float = 0.0,
    id_col: str = "doc_id",
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Exact-Jaccard verification against the per-doc shingle ARRAYS:
    join each candidate pair to its two arrays and intersect in-row
    (``array_intersect`` — arrays are already distinct). Work is
    O(candidates × shingles/doc) like the inverted-index path, but
    with two joins of the (small, banding-bounded) candidate relation
    instead of re-exploding the corpus. The candidate side (and the
    first join's pair-plus-array result) is broadcast-hinted so the
    corpus relation is streamed in place, never reshuffled; pass
    ``broadcast_candidates=False`` when the candidate set outgrows the
    broadcast budget (the joins then fall back to shuffles AQE
    manages). Integer counts, one double division."""
    a = shingle_arrs.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("__sa"))
    b = shingle_arrs.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("__sb"))
    if broadcast_candidates:
        first = a.join(F.broadcast(candidates), "doc_a")
        j = b.join(F.broadcast(first), "doc_b")
    else:
        j = candidates.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size("__sa") + F.size("__sb") - inter
    jac = (inter.cast("double") / union.cast("double")).alias("jaccard")
    return j.select("doc_a", "doc_b", jac).filter(F.col("jaccard") >= min_jaccard)


def minhash_near_duplicates(
    docs: DataFrame,
    k: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    cleanup: list | None = None,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle → signature → band
    → candidate pairs → exact-Jaccard verify ≥ threshold.

    Shingling is narrow (``array_distinct`` inside the row — no
    ``.distinct()`` shuffle) and per-doc sizes come from ``F.size``
    over the array, not a groupBy. Signatures use the explode+groupBy
    formulation: measured ~2x faster than the all-narrow
    ``minhash_signatures_rowwise`` (codegen'd MIN aggregates vs
    interpreted HOF lambdas), and its shuffle is one compact row per
    doc thanks to map-side partial aggregation.

    What gets cached is the CANDIDATE PAIR list (banding-bounded —
    thousands of rows from millions of docs), never a corpus-sized
    intermediate: verification re-shingles only the documents that
    appear in some candidate pair (semi-join on the pair ids before
    the narrow shingle projection), so the big relation is streamed
    exactly once — through the signature pass. An earlier formulation
    persisted the full shingle-array relation instead; at 100 TB
    that is a corpus-sized (~5-10x text) cache commitment to save a
    narrow recompute over the tiny candidate subset. Pass ``cleanup``
    to receive the persisted candidate frame and release it once the
    result is consumed (same contract as
    ``cluster.connected_components``)."""
    arr = shingle_arrays(docs, k=k, text_col=text_col, id_col=id_col)
    sh = arr.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    sigs = minhash_signatures(sh, id_col=id_col)
    # Eager materialization, not lazy persist: three downstream
    # references would otherwise each embed the full shingle+signature
    # lineage in their plans (multi-MiB task binaries, and planning
    # cost per reference); after the count they plan against a compact
    # InMemoryRelation. Measured ~2x on the composed gate's first run.
    cands = lsh_candidate_pairs(sigs, id_col=id_col).persist()
    cands.count()
    track(cands, cleanup)
    cand_ids = (
        cands.select(F.explode(F.array("doc_a", "doc_b")).alias(id_col)).distinct()
    )
    cand_docs = docs.join(cand_ids, id_col, "semi")
    cand_arr = shingle_arrays(cand_docs, k=k, text_col=text_col, id_col=id_col)
    return verify_pairs_by_arrays(cand_arr, cands, min_jaccard=min_jaccard, id_col=id_col)


def cross_doc_contamination(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document contamination: the fraction of the doc's distinct
    k-gram shingles that also occur in at least one OTHER document —
    the standard screen for benchmark leakage and cross-site
    boilerplate (docs scoring high share most of their content with
    the rest of the corpus).

    Shape: one explode (narrow — arrays are pre-distinct), one
    groupBy on the shingle (the inverted index's document frequency),
    one groupBy back on the doc. Shuffle volume is the shingle
    vocabulary, not corpus × corpus; hot shingles (stopword runs) are
    split by AQE like any skewed key."""
    sh = shingle_docs(docs, k=k, text_col=text_col, id_col=id_col)
    df_count = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    return (
        sh.join(df_count, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("__df") > 1, F.lit(1))).alias("n_shared"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("n_shingles").cast("double")).alias(
                "contamination"
            ),
        )
    )


def decontaminate_against(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    max_overlap: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: score every corpus document by the
    fraction of its distinct k-gram shingles that appear ANYWHERE in
    the benchmark corpus, and flag those above ``max_overlap`` for
    removal before training.

    The benchmark's shingle vocabulary is deduplicated once
    (``distinct`` — it is benchmark-sized, small next to the corpus)
    and the corpus side left-joins it: shuffle volume is corpus
    shingles + benchmark vocabulary, and when the vocabulary fits the
    broadcast budget AQE turns the join into a broadcast probe —
    benchmark screens then cost one corpus pass."""
    corpus_sh = shingle_docs(corpus, k=k, text_col=text_col, id_col=id_col)
    bench_vocab = (
        shingle_docs(benchmark, k=k, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        corpus_sh.join(bench_vocab, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.col("__hit")).alias("n_overlap"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")).alias(
                "benchmark_overlap"
            ),
            F.when(
                F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")
                > F.lit(max_overlap),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("contaminated"),
        )
    )


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    cleanup: list | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: 16-bit blocking (4 blocks × 16 bits —
    pigeonhole: hamming ≤ 3 ⇒ at least one block equal) to generate
    candidates, exact Hamming distance via bit_count(xor) to verify.

    Each block takes one of 65,536 values, so candidate volume scales
    ~n²/65,536 per block in the random-hash worst case — the standard
    64-bit construction. (The earlier 4-bit-nibble blocking had only
    64 total buckets and went near-cartesian as the corpus grew.)
    Work is proportional to block-bucket collisions, not corpus².

    The signature table (one 8-byte row per doc — this IS the simhash
    signature store a production corpus keeps anyway) persists before
    pair generation: the fused-verify join reads it on both sides,
    and without the cache each side replays the token explode + 64-sum
    aggregation over the corpus — measured 2.6s → 1.4s at sf0.1. Pass
    ``cleanup`` to release it once the pairs are consumed."""
    sigs = simhash_signatures(docs, text_col=text_col, id_col=id_col).persist()
    sigs.count()  # eager: both join sides then plan against the cache
    track(sigs, cleanup)
    cands = simhash_candidate_pairs(sigs, id_col=id_col, max_hamming=max_hamming)
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    blocks: int = 4,
    block_bits: int = 16,
    max_hamming: int | None = None,
) -> DataFrame:
    """Blocking half of SimHash near-dup: explode each signature into
    ``blocks`` (block, value) rows and enumerate pairs within each
    bucket. Exposed separately so candidate volume is testable — the
    bound is the point of the 16-bit construction (65,536 values per
    block).

    ``max_hamming`` pushes the exact-Hamming verification INTO pair
    generation — a templated corpus produces orders of magnitude more
    block collisions than true near-dups (measured 188k candidates vs
    ~300 survivors at sf0.1), and enumerating them dominates the
    stage. With the verify fused, generation switches to the
    self-join formulation with ``bit_count(xor) <= max_hamming`` in
    the JOIN CONDITION: the enumeration runs inside whole-stage
    codegen and only survivors reach the dedup ``distinct`` (the
    signature input is tiny — one row per doc — so computing it once
    per join side costs nothing, unlike the MinHash bucket relation).
    Verification is per-pair and deterministic, so filter-then-
    distinct equals distinct-then-filter exactly. Without
    ``max_hamming`` the single-pass grouped combination explode
    returns ALL candidates (the testable-volume contract)."""
    rel = signatures.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        # Arithmetic shift + mask: identical results in
                        # Spark and DuckDB even when bit 63 is set.
                        F.shiftright(F.col("simhash"), block_bits * b)
                        .bitwiseAND(F.lit(2**block_bits - 1))
                        .alias("nib"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.block").alias("block"), F.col("bk.nib").alias("nib"))
    if max_hamming is not None:
        a, b = rel.alias("a"), rel.alias("b")
        return (
            a.join(
                b,
                (F.col("a.block") == F.col("b.block"))
                & (F.col("a.nib") == F.col("b.nib"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                & (
                    F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
                    <= max_hamming
                ),
            )
            .select(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
                F.col("a.simhash").alias("sig_a"),
                F.col("b.simhash").alias("sig_b"),
            )
            .distinct()
        )
    # Generic path: in-bucket combination explode — one pass over the
    # block relation, same pair volume as the join (Σ m²/2 per bucket).
    grouped = (
        rel.groupBy("block", "nib")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sig"))
                )
            ).alias("__m")
        )
        .filter(F.size("__m") >= 2)
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(sequence(1, size(__m) - 1),"
            " i -> transform(slice(__m, i + 1, size(__m) - i),"
            " j -> struct(element_at(__m, i).id AS doc_a, j.id AS doc_b,"
            " element_at(__m, i).sig AS sig_a, j.sig AS sig_b))))"
        )
    )
    return (
        grouped.select(pair.alias("__p"))
        .select("__p.doc_a", "__p.doc_b", "__p.sig_a", "__p.sig_b")
        .distinct()
    )


def simhash_signatures(
    docs: DataFrame, bits: int = 64, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash: per-token ``bits``-bit hash from the first bits/4 hex
    chars of md5(token); each bit contributes ±1 (weighted by token
    frequency); the signature bit is the sign of the sum.

    The 64-bit token hash is carried as two 32-bit halves (hi = hex
    chars 1-8, lo = chars 9-16) so every intermediate fits a signed
    BIGINT in both Spark and DuckDB; the assembled signature maps bit
    63 through two's complement (adds −2^63 instead of +2^63), so the
    output is an ordinary BIGINT whose bit pattern is the true 64-bit
    signature — shifts/masks/xor/bit_count all behave identically on
    it in both engines. One explode + one groupBy; the ``bits`` sums
    are parallel aggregates in a single pass.
    """
    assert bits in (16, 32, 64), "hex-prefix construction: bits must be 16, 32 or 64"
    n_hex = bits // 4
    tok = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
    h = F.substring(F.md5(F.col("tok")), 1, n_hex)
    if bits <= 32:
        tok = tok.withColumn("hv_lo", F.conv(h, 16, 10).cast("long"))
        bit = lambda j: F.shiftright(F.col("hv_lo"), j).bitwiseAND(F.lit(1))  # noqa: E731
    else:
        # hi covers global bits 32..63, lo bits 0..31 (big-endian hex).
        tok = tok.withColumn(
            "hv_hi", F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
        ).withColumn("hv_lo", F.conv(F.substring(h, 9, 8), 16, 10).cast("long"))
        bit = lambda j: (  # noqa: E731
            F.shiftright(F.col("hv_lo"), j).bitwiseAND(F.lit(1))
            if j < 32
            else F.shiftright(F.col("hv_hi"), j - 32).bitwiseAND(F.lit(1))
        )
    sums = tok.groupBy(id_col).agg(
        *[F.sum(F.when(bit(j) == 1, 1).otherwise(-1)).alias(f"s{j}") for j in range(bits)]
    )
    weight = lambda j: F.lit(-(2**63)) if (bits == 64 and j == 63) else F.lit(2**j)  # noqa: E731
    sig = reduce(
        lambda acc, j: acc + F.when(F.col(f"s{j}") > 0, weight(j)).otherwise(F.lit(0)),
        range(bits),
        F.lit(0).cast("long"),
    )
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def band_buckets(
    signatures: DataFrame,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, sig) bucket rows from a signature relation — the
    banding half of ``lsh_candidate_pairs``, exposed so asymmetric
    joins (increment vs corpus) can band each side independently."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                ).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    return signatures.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )


def build_signature_store(
    corpus_docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The corpus signature STORE for incremental screening: one
    MinHash-signature row per document, written once at ingest and
    persisted (as a table in production). ``incremental_near_
    duplicates`` consumes it so each increment's screening cost scales
    with the batch, never the corpus."""
    return minhash_signatures(
        shingle_docs(corpus_docs, k=k, text_col=text_col, id_col=id_col), id_col=id_col
    )


def incremental_near_duplicates(
    corpus_docs: DataFrame,
    new_docs: DataFrame,
    corpus_signatures: DataFrame | None = None,
    k: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    cleanup: list | None = None,
) -> DataFrame:
    """Screen an incoming batch against an existing corpus WITHOUT
    re-processing the corpus — the daily-ingestion shape at 100 TB.

    Production pattern: the corpus keeps a SIGNATURE STORE (one row
    per doc, written when the doc was ingested — pass it as
    ``corpus_signatures``; computed here only as a fallback so the
    operator is self-contained). Per increment:

    1. shingle + sign ONLY the new docs (narrow + one small shuffle);
    2. band the new signatures and join against the banded corpus
       store — the join's streamed side is increment-sized, so cost
       scales with the batch, not the corpus;
    3. re-tokenize ONLY the corpus docs that banding surfaced as
       candidates (a semi-join re-read — candidate sets are
       banding-bounded, orders of magnitude smaller than the corpus)
       and verify exact Jaccard in-row.

    Emits verified (doc_a, doc_b, jaccard) pairs touching the
    increment: corpus↔new and new↔new. Corpus-internal dups were
    resolved when the corpus was built and are not re-derived.

    The increment's shingle arrays are persisted (three consumers:
    signatures + both verify sides). Pass a ``cleanup`` list to
    receive the persisted frame and release it once the pairs are
    consumed (``for df in cleanup: df.unpersist()``) — per-micro-batch
    callers (``streaming_dedup_screen``) must do this or cached blocks
    accumulate for the life of the stream.
    """
    new_arr = shingle_arrays(new_docs, k=k, text_col=text_col, id_col=id_col).persist()
    track(new_arr, cleanup)
    new_sigs = minhash_signatures(
        new_arr.select(F.col(id_col), F.explode("shingles").alias("shingle")), id_col=id_col
    )
    if corpus_signatures is None:
        corpus_signatures = build_signature_store(
            corpus_docs, k=k, text_col=text_col, id_col=id_col
        )
    new_buckets = band_buckets(new_sigs, id_col=id_col)
    all_buckets = band_buckets(corpus_signatures, id_col=id_col).unionByName(new_buckets)
    n = new_buckets.alias("n")
    a = all_buckets.alias("a")
    raw = n.join(
        a,
        (F.col("n.band") == F.col("a.band"))
        & (F.col("n.sig") == F.col("a.sig"))
        & (F.col(f"n.{id_col}") != F.col(f"a.{id_col}")),
    ).select(
        F.least(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_a"),
        F.greatest(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_b"),
    )
    # Three consumers read the candidate pairs (the id projection for
    # the corpus re-read, and both sides of the verify join); without
    # the persist each replays the band join AND its upstream — for
    # the self-contained fallback that means re-signing the corpus
    # per consumer. The frame is banding-bounded (pairs touching one
    # batch), far smaller than either input. Materialized eagerly so
    # downstream plans reference a compact InMemoryRelation instead of
    # embedding the corpus-signing lineage three times (multi-MiB task
    # binaries on the composed first run).
    cands = raw.distinct().persist()
    cands.count()
    track(cands, cleanup)
    cand_ids = (
        cands.select(F.col("doc_a").alias(id_col))
        .union(cands.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    corpus_cand_arr = shingle_arrays(
        corpus_docs.join(F.broadcast(cand_ids), id_col, "semi"),
        k=k,
        text_col=text_col,
        id_col=id_col,
    )
    arrs = new_arr.unionByName(corpus_cand_arr)
    return verify_pairs_by_arrays(arrs, cands, min_jaccard=min_jaccard, id_col=id_col)


def span_hashes(
    docs: DataFrame,
    window: int = 16,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-window span hashes for exact-substring dedup (the
    distributed form of Lee et al.'s "Deduplicating Training Data
    Makes Language Models Better" suffix-array pass): hash every
    ``window``-token slice. At the default ``stride=1`` every shared
    verbatim run of ≥ ``window`` tokens between two documents is
    GUARANTEED to produce a colliding hash (every alignment is
    enumerated). ``stride > 1`` is a cheaper sampling screen with a
    real blind spot: both documents keep only windows on their own
    stride grid, so a shared run is detected ONLY when its start
    offsets happen to be congruent mod ``stride`` — it reduces rows
    ``stride``-fold but is NOT exact (winnowing — per-window min-hash
    selection — is the construction that keeps a guarantee with fewer
    fingerprints, at the cost of a position-dependent hash).

    Output: (id, span_start [1-based token index], span_hash,
    span_df) where ``span_df`` is the corpus-wide document frequency
    of the hash — the inverted-index count, one map-side-combinable
    groupBy (output cardinality = distinct spans), joined back onto
    the span relation. Docs shorter than ``window`` tokens emit no
    rows. Everything upstream of the one count-join is narrow."""
    toks = F.split(F.col(text_col), " ")
    with_t = docs.select(F.col(id_col), toks.alias("__toks")).filter(
        F.size("__toks") >= window
    )
    spans = with_t.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, size(__toks) - {window} + 1, {stride}),"
                f" i -> struct(i AS start,"
                f" md5(concat_ws(' ', slice(__toks, i, {window}))) AS h))"
            )
        ).alias("__sp"),
    ).select(
        F.col(id_col),
        F.col("__sp.start").alias("span_start"),
        F.col("__sp.h").alias("span_hash"),
    )
    freq = (
        spans.groupBy("span_hash")
        .agg(F.count(F.lit(1)).alias("span_df"))
    )
    return spans.join(freq, "span_hash").select(
        id_col, "span_start", "span_hash", "span_df"
    )


def duplicated_span_stats(
    docs: DataFrame,
    window: int = 16,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document exact-substring duplication: how much of each doc
    consists of token spans that appear verbatim elsewhere in the
    corpus — the signal behind span-level dedup (cut the repeated
    span, keep the document) and a stronger exactness complement to
    MinHash's whole-doc similarity. Output: (id, n_spans,
    n_dup_spans, dup_fraction); integer counts, one double division."""
    sp = span_hashes(
        docs, window=window, stride=stride, text_col=text_col, id_col=id_col
    )
    return (
        sp.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count(F.when(F.col("span_df") >= 2, F.lit(1))).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_fraction",
            F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"),
        )
    )
