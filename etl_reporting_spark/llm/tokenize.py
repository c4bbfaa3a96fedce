"""Distributed BPE (byte-pair-encoding) tokenizer training primitives.

The classic scale trick (also how sentencepiece/HF train): BPE
statistics don't need the corpus — they need the **distinct-word
frequency table**, which is vocabulary-sized (millions of rows for a
100 TB corpus, not trillions). So:

1. ``word_freqs`` — one corpus-wide groupBy(word) count; the ONLY
   pass over the full data. Persist it; every merge iteration reads
   this small table.
2. ``pair_counts`` — adjacent-symbol pair frequencies, weighted by
   word frequency: explode each distinct word's symbol array once.
3. ``best_pair`` / ``bpe_train`` — the greedy loop: pick the most
   frequent pair (deterministic tie-break: count desc, then pair
   lexicographic), merge it everywhere, repeat. Each iteration is one
   Spark job over the word table plus a 1-row collect (the elected
   pair — same driver-iteration pattern as similarity.kmeans_step).
4. ``apply_merges`` — re-tokenize text with a learned merge list
   (ordered fold of array-lambda merges; no Python UDFs anywhere).

Symbols start as characters; a merge replaces non-overlapping
occurrences of the pair left-to-right (matching the reference BPE
greedy scan). No end-of-word marker is added — words are the merge
boundary (documented divergence from the '</w>' convention; the
boundary is already explicit in the word table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freqs(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq) over the corpus — the one full-corpus pass.
    Map-side combinable groupBy; ``min_freq`` prunes the hapax tail
    (most of the distinct-word table at web scale) before the
    iteration loop ever sees it."""
    out = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        out = out.filter(F.col("freq") >= F.lit(int(min_freq)))
    return out


def with_symbols(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Initial symbol arrays: one character per symbol."""
    return words.withColumn(
        "symbols", F.split(F.col(word_col), "(?!^)(?=.)")
    )


def pair_counts(symbol_words: DataFrame, freq_col: str = "freq") -> DataFrame:
    """Corpus-weighted adjacent-pair frequencies from the symbolized
    word table: ``(sym_a, sym_b, n)`` where n sums word frequencies
    over every adjacent occurrence. Vocabulary-sized input, map-side
    combinable aggregate — the per-iteration cost of BPE training."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("symbols") - 1),
        lambda i: F.struct(
            F.element_at("symbols", i).alias("sym_a"),
            F.element_at("symbols", i + 1).alias("sym_b"),
        ),
    )
    return (
        symbol_words.filter(F.size("symbols") >= 2)
        .select(F.col(freq_col), F.explode(pairs).alias("p"))
        .groupBy("p.sym_a", "p.sym_b")
        .agg(F.sum(freq_col).alias("n"))
    )


def top_pairs(symbol_words: DataFrame, k: int = 20, freq_col: str = "freq") -> DataFrame:
    """The k most frequent pairs (count desc, then lexicographic —
    fully deterministic). orderBy+limit compiles to
    TakeOrderedAndProject: no global sort."""
    return pair_counts(symbol_words, freq_col=freq_col).orderBy(
        F.col("n").desc(), F.col("sym_a").asc(), F.col("sym_b").asc()
    ).limit(k)


def merge_pair_column(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (a, b) → a||b in
    a symbol array — pure array-lambda fold, no UDF. ('a','a') on
    [a,a,a,a] gives [aa,aa]; a freshly merged symbol never re-merges
    (it is strictly longer than ``a``)."""
    merged = a + b
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def best_pair(symbol_words: DataFrame, freq_col: str = "freq") -> tuple[str, str] | None:
    """Elect the merge: most frequent pair, ties broken
    lexicographically. One aggregate + a 1-row collect (the
    algorithm's sequential step, like a k-means centroid update)."""
    row = (
        pair_counts(symbol_words, freq_col=freq_col)
        .orderBy(F.col("n").desc(), F.col("sym_a").asc(), F.col("sym_b").asc())
        .limit(1)
        .collect()
    )
    if not row:
        return None
    return (row[0]["sym_a"], row[0]["sym_b"])


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """The greedy BPE training loop. Returns the ordered merge list.

    One corpus pass (word_freqs, persisted), then ``n_merges``
    iterations over the vocabulary-sized word table: count pairs,
    elect, rewrite symbol arrays. Each iteration persists the new
    symbol table and releases the previous one, keeping lineage flat
    (the same per-round cache discipline as cluster.connected_
    components)."""
    words = with_symbols(word_freqs(docs, text_col=text_col, min_freq=min_freq)).persist()
    words.count()
    merges: list[tuple[str, str]] = []
    current = words
    try:
        for _ in range(int(n_merges)):
            pair = best_pair(current)
            if pair is None:
                break
            merges.append(pair)
            nxt = current.withColumn(
                "symbols", merge_pair_column(F.col("symbols"), *pair)
            ).persist()
            nxt.count()
            current.unpersist()
            current = nxt
    finally:
        current.unpersist()
    return merges


def apply_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize text with a learned merge list: per word, start from
    characters and apply every merge in learned order — the standard
    (non-priority-queue) BPE encode, as a narrow chain of array
    lambdas. Output is the concatenation of each word's final symbol
    sequence."""
    def encode_word(word: Column) -> Column:
        syms = F.split(word, "(?!^)(?=.)")
        for a, b in merges:
            syms = merge_pair_column(syms, a, b)
        return syms

    words = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    return df.withColumn(
        out_col, F.flatten(F.transform(words, encode_word))
    )
