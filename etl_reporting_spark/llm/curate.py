"""End-to-end corpus curation: the composed training-data pipeline.

One operator chains the engine's text hygiene stages the way a real
pretraining corpus build does — exact dedup, length gates, repetition
gate, PII gate — and labels every document with its fate:

- ``reject_reason`` — the FIRST failing gate in a fixed priority
  order (duplicate → too_short → too_long → repetitive → has_pii),
  NULL for survivors; keeping one reason (not a set) matches how
  corpus reports attribute losses.
- ``split`` — deterministic train/val/test label for survivors
  (``with_hash_split``), NULL for rejects.

Plan shape: the only shuffle is exact dedup's hash-groupBy (and the
optional final sort); every gate is a narrow column expression, so the
whole pipeline is dedup's cost plus a single pass.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_reporting_spark.llm.dedup import exact_dedup_map
from etl_reporting_spark.llm.redact import pii_counts
from etl_reporting_spark.llm.sampling import with_hash_split


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 30,
    max_tokens: int = 90,
    max_dup_2gram: float = 0.05,
    split_weights: Mapping[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, dup_2gram_fraction, n_pii, reject_reason, split)
    for every input document. Survivors have reject_reason NULL and a
    split label; rejects have split NULL."""
    split_weights = dict(split_weights or {"train": 0.8, "val": 0.1, "test": 0.1})

    canon = exact_dedup_map(docs, text_col=text_col, id_col=id_col).select(
        id_col, "canonical_id"
    )
    toks = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')) - 1),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, 2)))"
    )
    pii_total = None
    for c in pii_counts(F.col(text_col)).values():
        pii_total = c if pii_total is None else pii_total + c

    base = docs.join(canon, id_col).select(
        F.col(id_col),
        F.col("canonical_id"),
        F.size(toks).alias("n_tokens"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / F.size(grams).cast("double")
        ).alias("dup_2gram_fraction"),
        pii_total.alias("n_pii"),
    )
    reason = (
        F.when(F.col(id_col) != F.col("canonical_id"), F.lit("duplicate"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("dup_2gram_fraction") > max_dup_2gram, F.lit("repetitive"))
        .when(F.col("n_pii") > 0, F.lit("has_pii"))
    )
    labelled = with_hash_split(
        base.withColumn("reject_reason", reason), split_weights, id_col=id_col
    )
    return labelled.select(
        id_col,
        "n_tokens",
        "dup_2gram_fraction",
        "n_pii",
        "reject_reason",
        F.when(F.col("reject_reason").isNull(), F.col("split")).alias("split"),
    )


def assemble_training_set(
    docs: DataFrame,
    weights: Mapping[str, float] | None = None,
    threshold: float = 0.0,
    source_col: str = "source",
    max_per_source: int = 10_000,
    split_weights: Mapping[str, float] | None = None,
    shards: int = 64,
    salt: str = "epoch0",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The nightly training-set build, composed end-to-end: linear
    quality-classifier filter → per-source quota → deterministic
    split → (shard, pos) training-order address. One fate row per
    input document:

    - ``fate`` — 'filtered_quality' | 'capped' | the split name;
    - ``quality_score`` — the classifier margin (always present);
    - ``split`` / ``shard`` / ``pos`` — NULL unless selected.

    Plan shape: scoring is narrow; the quota is ONE window per source
    (kept docs rank first via ``keep DESC`` in the window order, so
    no pre-filter pass); split is a narrow hash expression; the
    training-order window partitions by (split, shard) over selected
    rows only. Two shuffles total regardless of corpus size, both
    rank-filter windows. Deterministic end to end: rerun-, AQE- and
    repartition-stable, reproducible in the DuckDB oracle.
    """
    from pyspark.sql import Window

    from etl_reporting_spark.llm.classify import quality_classifier_score
    from etl_reporting_spark.llm.corpusops import _hash32

    split_weights = dict(split_weights or {"train": 0.9, "val": 0.05, "test": 0.05})

    scored = quality_classifier_score(
        docs, weights=weights, threshold=threshold,
        text_col=text_col, id_col=id_col, passthrough=True,
    )

    cap_w = Window.partitionBy(source_col).orderBy(
        F.col("keep").desc(),
        _hash32(F.col(id_col), "cap").asc(),
        F.col(id_col).asc(),
    )
    capped = scored.withColumn(
        "__selected",
        F.col("keep") & (F.row_number().over(cap_w) <= F.lit(int(max_per_source))),
    )

    labelled = with_hash_split(capped, split_weights, id_col=id_col, salt=salt)
    shard = F.pmod(_hash32(F.col(id_col), salt + "|shard"), F.lit(int(shards)))
    labelled = labelled.withColumn(
        "__shard", F.when(F.col("__selected"), shard)
    )
    pos_w = Window.partitionBy("split", "__shard").orderBy(
        _hash32(F.col(id_col), salt + "|pos").asc(), F.col(id_col).asc()
    )
    pos = F.when(F.col("__selected"), F.row_number().over(pos_w))
    return labelled.select(
        F.col(id_col),
        F.col(source_col),
        F.col("quality_score"),
        F.when(~F.col("keep"), F.lit("filtered_quality"))
        .when(~F.col("__selected"), F.lit("capped"))
        .otherwise(F.col("split"))
        .alias("fate"),
        F.when(F.col("__selected"), F.col("split")).alias("split"),
        F.col("__shard").alias("shard"),
        pos.alias("pos"),
    )
