"""Text analysis operators: quality scoring, language ID, token
counting, document fingerprinting.

Everything is built from JVM-side column expressions (split, regexp,
md5, array aggregates) — no Python in the hot path — and each output
value is reproducible by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny function-word lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
}


def _tokens(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def _hit_count(toks: F.Column, words: list[str]) -> F.Column:
    """Occurrences of any listed word (duplicates counted — NOT
    array_intersect, which dedups). Factory form: the filter lambda
    must take exactly one parameter, or PySpark binds the second to
    the element index."""
    frozen = list(words)
    return F.size(F.filter(toks, lambda t: t.isin(frozen)))


def text_quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: length, token count, mean token
    length, punctuation ratio, stopword ratio, all-caps-token count.

    The ratios divide exact integer counts once, in double — the
    deterministic convention used across the engine.
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    # characters outside [a-z0-9 ] (lowercased) = punctuation-ish
    n_punct = n_chars - F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""))
    stop_hits = _hit_count(toks, [w for ws in STOPWORDS.values() for w in ws])
    sum_tok_len = n_chars - (n_tokens - F.lit(1))  # chars minus single-space separators
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (sum_tok_len.cast("double") / n_tokens.cast("double")).alias("mean_token_len"),
        (n_punct.cast("double") / n_chars.cast("double")).alias("punct_ratio"),
        (stop_hits.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language heuristic: score = function-word hits
    per language; predict argmax (ties broken by fixed language
    order), 'und' when nothing scores."""
    toks = _tokens(text_col)
    scores = {lang: _hit_count(toks, words) for lang, words in STOPWORDS.items()}
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in STOPWORDS:  # fixed iteration order = deterministic tie-break
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return docs.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in STOPWORDS],
        pred.alias("predicted_lang"),
    )


BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways (the training-pipeline staples):
    whitespace tokens, and a BPE-ish regex segmentation (letter runs,
    single digits, single punctuation — the GPT-2-style pre-tokenizer
    shape) whose count approximates subword-tokenizer cost. Also the
    ratio, a cheap quality signal (high regex/ws ratio ⇒ digit/punct
    soup)."""
    ws = F.split(F.col(text_col), " ")
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    return docs.select(
        F.col(id_col),
        F.size(ws).alias("ws_tokens"),
        F.size(bpe).alias("bpe_ish_tokens"),
        (F.size(bpe).cast("double") / F.size(ws).cast("double")).alias("tokens_per_word"),
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1):
    duplicate-token fraction, duplicate-2-gram fraction, and the
    fraction of 2-grams taken by the single most frequent 2-gram.
    High values flag boilerplate / generated spam for corpus filtering.

    The fractions are narrow array expressions (``array_distinct``
    inside the row); the top-2-gram count — a per-document mode — is
    explode + groupBy + MAX: a nested higher-order filter computes the
    same thing shuffle-free but runs interpreted per element
    (O(distinct × total) per doc — measured 10× slower than the
    codegen'd aggregate, whose map-side combine ships one row per
    (doc, gram) anyway). Ratios divide exact integer counts once, in
    double. Documents with fewer than 2 tokens are excluded (no
    2-grams ⇒ undefined ratios).
    """
    toks = _tokens(text_col)
    grams = F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')) - 1),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, 2)))"
    )
    n_toks = F.size(toks)
    n_grams = F.size(grams)
    base = docs.filter(F.size(toks) >= 2).select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(toks)).cast("double") / n_toks.cast("double")
        ).alias("dup_token_fraction"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / n_grams.cast("double")
        ).alias("dup_2gram_fraction"),
        n_grams.alias("__n_grams"),
        grams.alias("__grams"),
    )
    top = (
        base.select(F.col(id_col), F.explode("__grams").alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").cast("int").alias("top_2gram_count"))
    )
    return base.join(top, id_col).select(
        F.col(id_col),
        "n_tokens",
        "n_distinct_tokens",
        "dup_token_fraction",
        "dup_2gram_fraction",
        "top_2gram_count",
        (F.col("top_2gram_count").cast("double") / F.col("__n_grams").cast("double")).alias(
            "top_2gram_fraction"
        ),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking (RAG indexing / context assembly): each
    doc yields chunks of ``chunk_tokens`` whitespace tokens starting
    every ``chunk_tokens - overlap`` tokens; the final chunk may be
    shorter. In-row transform + one posexplode — no shuffle, output
    rows ∝ corpus tokens / step."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    chunks = F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')), {step}),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {chunk_tokens})))"
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    ).withColumn("n_chunk_tokens", F.size(F.split(F.col("chunk_text"), " ")))


def document_fingerprint(
    docs: DataFrame, k: int = 3, bottom: int = 4, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bottom-k sketch fingerprint: md5 each word k-gram, keep the
    ``bottom`` lexicographically smallest hashes, fingerprint =
    md5(concatenation). Near-identical documents collide; any edit
    beyond the sketch's tolerance changes it.

    Array-native per row (no explode/shuffle): transform → sort →
    slice → md5.
    """
    expr = (
        f"md5(concat_ws('',"
        f" slice(array_sort(transform(sequence(1, size(split({text_col}, ' ')) - {k - 1}),"
        f" i -> md5(concat_ws(' ', slice(split({text_col}, ' '), i, {k}))))), 1, {bottom})))"
    )
    toks = _tokens(text_col)
    return docs.filter(F.size(toks) >= k).select(
        F.col(id_col), F.expr(expr).alias("fingerprint")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k_top: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf with a
    RATIONAL idf — ``(N − df + 0.5) / (df + 0.5)`` (the BM25 idf core
    without the log) — because ``ln`` is a libm call whose last ulp
    differs between engines, while double subtract/divide/multiply are
    IEEE-exact everywhere: scores reproduce bit-identically in the
    DuckDB oracle. Ranking ties break on term text, so the output is
    fully deterministic.

    Scale shape: tokenization is narrow; tf is one shuffle on
    (doc, term); df one map-side-combined shuffle on term; the corpus
    size joins in as a broadcast 1-row aggregate (stays lazy — no
    driver count); per-doc top-k is a window rank that
    WindowGroupLimit prunes before the final shuffle.
    """
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(df_, "term").crossJoin(F.broadcast(n_docs))
    score = F.col("tf").cast("double") * (
        (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("score", score)
        .withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= k_top)
        .select(id_col, "term_rank", "term", "tf", "df", "score")
    )


def vocab_top_terms(
    docs: DataFrame,
    k_top: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary head: per-term total frequency and document
    frequency, deterministic top-k — the counting pass every
    tokenizer/vocab training starts from. Shape: one narrow explode,
    a (doc, term) aggregate, a term aggregate (both map-side
    combined), then top-k by (total_tf DESC, term ASC) which Spark
    executes as TakeOrderedAndProject — per-partition heaps, no full
    sort of the vocabulary at 100 TB."""
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    per_doc = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = per_doc.groupBy("term").agg(
        F.sum("tf").alias("total_tf"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    return vocab.orderBy(F.col("total_tf").desc(), F.col("term").asc()).limit(k_top)


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
) -> DataFrame:
    """Canonicalization pass that runs BEFORE exact/near dedup so
    trivially-different re-publications (case, punctuation style,
    spacing) hash together: strip non-ASCII, lowercase, strip
    punctuation to spaces, collapse whitespace, trim. Entirely
    narrow regexp expressions in the Java/RE2 shared subset — fuses
    into the scan, linear in corpus bytes, and replayed exactly by
    the oracle.

    Deliberately ASCII-core: non-ASCII bytes are stripped BEFORE
    lowercasing, because engines disagree on Unicode case mapping
    (Java full case mapping turns U+0130 into 'i' + a combining dot;
    utf8proc maps it to plain 'i') — stripping first makes the pass
    engine- and ICU-version-stable. A full Unicode normalizer
    belongs in a mapInPandas stage where the Python ``unicodedata``
    version is pinned by the environment.
    """
    c = F.regexp_replace(F.col(text_col), r"[^\x20-\x7e]", " ")
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return docs.withColumn(out_col, F.trim(c))

