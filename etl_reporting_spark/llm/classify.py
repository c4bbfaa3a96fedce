"""Model-based quality filtering: a linear classifier over the
engine's deterministic text features.

The production pattern (DCLM / FineWeb-Edu style) is: train a small
classifier offline on labeled page quality, then score every document
in the corpus with it and keep the top slice. The expensive part — the
corpus-wide scoring pass — is what belongs in the engine, and it is
pure feature arithmetic: narrow per-row expressions, no shuffle, no
UDF, no model server.

``DEFAULT_WEIGHTS`` are a documented placeholder standing in for the
offline-trained coefficients (the container has no training stack);
the *shape* — named features, a bias, one fused projection — is the
real contract. The score is a raw margin, not a probability: no
``exp``/``log`` (libm results differ across engines — see
DETERMINISM.md), so the score reproduces bit-for-bit in the DuckDB
oracle. Rank/threshold semantics are unchanged by the missing
sigmoid, which is monotone.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_reporting_spark.llm.textstats import text_quality

# Feature name -> coefficient. Deliberately interpretable: reward
# prose-like stopword density and 4-6 char mean tokens, punish
# punctuation soup and very short documents.
DEFAULT_WEIGHTS: dict[str, float] = {
    "bias": -1.0,
    "stopword_ratio": 4.0,
    "punct_ratio": -6.0,
    "mean_token_len": 0.25,
    "len_norm": 2.0,  # min(n_tokens, 256)/256 — rational length saturation
}

LEN_SATURATION = 256


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The classifier's feature vector = text_quality's metrics plus a
    saturating length feature (rational — no log, reproducible)."""
    q = text_quality(docs, text_col=text_col, id_col=id_col)
    return q.withColumn(
        "len_norm",
        F.least(F.col("n_tokens"), F.lit(LEN_SATURATION)).cast("double")
        / F.lit(float(LEN_SATURATION)),
    )


def _linear_score(weights: Mapping[str, float]) -> Column:
    """Fixed-order left-associative weighted sum — the evaluation
    order IS the spec (float addition is not associative; the DuckDB
    oracle mirrors this exact chain)."""
    score: Column = F.lit(float(weights["bias"]))
    for name, w in weights.items():
        if name == "bias":
            continue
        score = score + F.lit(float(w)) * F.col(name)
    return score


def quality_classifier_score(
    docs: DataFrame,
    weights: Mapping[str, float] | None = None,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the linear quality model and attach
    the keep verdict: ``(id, features..., quality_score, keep)``.

    One narrow projection over the corpus — at 100 TB this fuses into
    whatever scan produces the features (whole-stage codegen, no
    shuffle, no data movement at all)."""
    w = dict(DEFAULT_WEIGHTS if weights is None else weights)
    feats = quality_features(docs, text_col=text_col, id_col=id_col)
    return feats.select(
        id_col,
        "n_tokens",
        "stopword_ratio",
        "punct_ratio",
        "mean_token_len",
        "len_norm",
        _linear_score(w).alias("quality_score"),
    ).withColumn("keep", F.col("quality_score") >= F.lit(float(threshold)))
