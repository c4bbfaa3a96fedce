"""PII detection / redaction for training-corpus hygiene.

Pure JVM-side column expressions (``regexp_count`` /
``regexp_replace``) — no Python in the hot path, so redaction runs
inside whole-stage codegen and scales linearly with corpus bytes.

Patterns deliberately stick to the regex subset that Java's engine and
RE2 (DuckDB, Go tooling) interpret identically — character classes,
bounded repetition, ``\\b`` and ``\\d``, no backreferences or
lookaround — so the oracle can verify redaction byte-for-byte.

Order matters: emails are redacted before phone/SSN so digit runs
inside an address are consumed by the email token, and IPv4 before
phone so dotted quads never half-match a phone rule. The same order is
applied in ``pii_counts`` and the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement token), applied in this order.
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_text(col: Column) -> Column:
    """Apply every PII pattern in order, returning the scrubbed text."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> "dict[str, Column]":
    """Per-type match counts, measured at the same pipeline position
    the redaction would see (earlier patterns already replaced), so
    counts sum to the number of replacements actually made."""
    counts: dict[str, Column] = {}
    staged = col
    for name, pattern, token in PII_PATTERNS:
        counts[name] = F.regexp_count(staged, F.lit(pattern))
        staged = F.regexp_replace(staged, pattern, token)
    return counts


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted text, per-type counts, total) for every document.

    A narrow projection — filter on ``n_pii_total > 0`` afterwards to
    quarantine offending docs; the predicate stays pushdown-eligible.
    """
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        F.col(id_col),
        redact_text(F.col(text_col)).alias("redacted_text"),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("n_pii_total"),
    )
