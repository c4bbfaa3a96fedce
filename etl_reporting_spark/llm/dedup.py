"""Document deduplication operators for training-data pipelines.

All hashing is md5-based so every stage is deterministic AND
reproducible in any engine (the DuckDB oracle computes identical
signatures): a MinHash permutation is simulated by lexicographic MIN
over ``md5(seed || '|' || shingle)`` hex strings — a standard
hash-as-permutation construction.

Scale design (100 TB):
- ``exact_dedup_map``: one hash-groupBy shuffle on a 32-hex key;
  group sizes are bounded by true duplicate cardinality.
- MinHash: ONE explode + ONE groupBy per corpus computes all
  NUM_HASHES signature slots as parallel MIN aggregates (map-side
  partial aggregation collapses each doc's shingles before shuffle).
  Bands then explode 1→BANDS rows, and the candidate self-join
  shuffles on (band, signature) — only docs sharing a bucket ever
  meet, the whole point of LSH. No pairwise O(n²) stage exists
  except *within* buckets, whose size is controlled by band width.
- Exact Jaccard verification joins candidates back to the shingle
  inverted index — proportional to candidate count, not corpus².
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def shingle_docs(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word k-gram shingles per document: (id, shingle).

    Array-native (transform over sequence) so shingling happens inside
    the row without a join; the only shuffle is the later consumer's.
    """
    # Materialize the token array once per row; the shingle transform
    # then references it instead of re-splitting the text three times.
    with_toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    ).filter(F.size("__toks") >= k)
    shingles = F.expr(
        f"transform(sequence(1, size(__toks) - {k - 1}),"
        f" i -> concat_ws(' ', slice(__toks, i, {k})))"
    )
    return with_toks.select(F.col(id_col), F.explode(shingles).alias("shingle")).distinct()


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


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    id_col: str = "doc_id",
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band
    bucket. Banding: signature slots [b*r, (b+1)*r) concatenate into
    one md5 bucket key per band."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws("", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
                ).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    buckets = signatures.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame | None = None,
    min_jaccard: float = 0.0,
    min_intersection: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard similarity for document pairs via the shingle
    inverted index. With ``candidates`` given, only those pairs are
    scored (LSH verification); otherwise all pairs sharing ≥
    ``min_intersection`` shingles (n-gram Jaccard dedup).

    The similarity itself is computed from exact integer counts; the
    final division happens once in double — deterministic everywhere.
    """
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


def minhash_near_duplicates(
    docs: DataFrame,
    k: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle → signature → band
    → candidate pairs → exact-Jaccard verify ≥ threshold."""
    sh = shingle_docs(docs, k=k, text_col=text_col, id_col=id_col)
    sigs = minhash_signatures(sh, id_col=id_col)
    cands = lsh_candidate_pairs(sigs, id_col=id_col)
    return jaccard_pairs(sh, candidates=cands, min_jaccard=min_jaccard, id_col=id_col).select(
        "doc_a", "doc_b", "jaccard"
    )


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs: nibble blocking (4 blocks × 4 bits —
    pigeonhole: hamming ≤ 3 ⇒ at least one block equal) to generate
    candidates, exact Hamming distance via bit_count(xor) to verify.
    Work is proportional to block-bucket collisions, not corpus²."""
    sigs = simhash_signatures(docs, text_col=text_col, id_col=id_col)
    blocks = sigs.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.shiftright(F.col("simhash"), 4 * b).bitwiseAND(F.lit(15)).alias("nib"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.block").alias("block"), F.col("bk.nib").alias("nib"))
    a = blocks.alias("a")
    b = blocks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.nib") == F.col("b.nib"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_signatures(
    docs: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash: per-token 16-bit hash from the first 4 hex chars of
    md5(token); each bit contributes ±1 (weighted by token frequency);
    the signature bit is the sign of the sum.

    The hex→int conversion uses position arithmetic over the hex
    alphabet so the oracle can reproduce it without engine-specific
    conv() builtins. One explode + one groupBy; the ``bits`` sums are
    parallel aggregates in a single pass.
    """
    assert bits == 16, "hex-prefix construction is fixed at 16 bits"
    tok = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
    h4 = F.substring(F.md5(F.col("tok")), 1, 4)
    digit = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring(h4, i, 1)) - 1  # noqa: E731
    hv = ((digit(1) * 16 + digit(2)) * 16 + digit(3)) * 16 + digit(4)
    tok = tok.withColumn("hv", hv)
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("hv"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sig = reduce(
        lambda acc, j: acc + F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0)),
        range(bits),
        F.lit(0),
    )
    return sums.select(F.col(id_col), sig.cast("int").alias("simhash"))
