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

from etl_reporting_spark.llm.textstats import STOPWORDS, _hit_count, _tokens, text_quality

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


def feature_exprs(text_col: str = "text") -> dict[str, Column]:
    """The classifier's feature vector as named column EXPRESSIONS —
    text_quality's metrics (same arithmetic, same oracle) plus a
    saturating length feature (rational min(n,256)/256 — no log,
    reproducible). Expression form so composed pipelines
    (assemble_training_set) can attach features without projecting
    away their other columns."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    )
    stop_hits = _hit_count(toks, [w for ws in STOPWORDS.values() for w in ws])
    sum_tok_len = n_chars - (n_tokens - F.lit(1))
    return {
        "n_tokens": n_tokens,
        "stopword_ratio": stop_hits.cast("double") / n_tokens.cast("double"),
        "punct_ratio": n_punct.cast("double") / n_chars.cast("double"),
        "mean_token_len": sum_tok_len.cast("double") / n_tokens.cast("double"),
        "len_norm": F.least(n_tokens, F.lit(LEN_SATURATION)).cast("double")
        / F.lit(float(LEN_SATURATION)),
    }


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Projected feature frame — text_quality parity plus len_norm
    (kept as the oracle-shaped surface; ``feature_exprs`` is the
    composable form)."""
    q = text_quality(docs, text_col=text_col, id_col=id_col)
    return q.withColumn(
        "len_norm",
        F.least(F.col("n_tokens"), F.lit(LEN_SATURATION)).cast("double")
        / F.lit(float(LEN_SATURATION)),
    )


def _linear_score(weights: Mapping[str, float], feats: Mapping[str, Column]) -> Column:
    """Fixed-order left-associative weighted sum — the evaluation
    order IS the spec (float addition is not associative; the DuckDB
    oracle mirrors this exact chain)."""
    score: Column = F.lit(float(weights["bias"]))
    for name, w in weights.items():
        if name == "bias":
            continue
        score = score + F.lit(float(w)) * feats[name]
    return score


def quality_classifier_score(
    docs: DataFrame,
    weights: Mapping[str, float] | None = None,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: bool = False,
) -> DataFrame:
    """Score every document with the linear quality model and attach
    the keep verdict: ``(id, features..., quality_score, keep)`` — or,
    with ``passthrough=True``, the input columns plus
    ``quality_score``/``keep`` (the composable form pipelines use).

    One narrow projection over the corpus — at 100 TB this fuses into
    whatever scan produces the features (whole-stage codegen, no
    shuffle, no data movement at all)."""
    w = dict(DEFAULT_WEIGHTS if weights is None else weights)
    fx = feature_exprs(text_col)
    score = _linear_score(w, fx)
    keep = score >= F.lit(float(threshold))
    if passthrough:
        return docs.withColumns({"quality_score": score, "keep": keep})
    return docs.select(
        id_col,
        *[c.alias(name) for name, c in fx.items()],
        score.alias("quality_score"),
        keep.alias("keep"),
    )
