"""PII scrubbing for pretraining corpora: redact the
mechanically-detectable identifier classes (emails, US SSNs,
separator-formatted phone and credit-card numbers, IPv4 addresses)
and report per-document match counts — the standard hygiene pass
between web extraction and tokenization, and the reporting half of a
right-to-be-forgotten audit.

Design rules (shared with ``llm.webtext``):

- every pattern lives in the Java∩RE2 regex intersection (no
  backreferences, no lookaround), so the Spark plan and the DuckDB
  value-hash oracle match byte-for-byte;
- scrubbing is a FIXED, documented pattern order (email → ssn → cc →
  phone → ipv4) of chained ``regexp_replace`` — narrow JVM
  expressions fusing into the scan, zero shuffles, no UDFs; counts
  for each class are taken on the text state the class actually saw
  (i.e. after the previous classes replaced), which is the only
  definition both engines can reproduce exactly;
- patterns are deliberately PRECISE over RECALL (a separator-required
  credit-card pattern, a US-shaped phone) — a pretraining scrubber
  that eats every 16-digit number destroys training data; widen per
  deployment by appending to ``PII_PATTERNS``.

At 100 TB the op is row-local and embarrassingly parallel; cost is a
few regex passes per document, the same class of work as the quality
heuristics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (kind, pattern, replacement) in APPLICATION ORDER. Patterns are
#: Java∩RE2; order matters only where classes could overlap (none of
#: these do on well-formed text, but the order is still part of the
#: contract so the oracle can replicate counts exactly).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
]


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "text_scrubbed",
) -> DataFrame:
    """Append ``out_col`` (the redacted text) and one ``n_<kind>``
    count column per pattern class. Counts are computed with
    ``regexp_extract_all`` on the text state each class sees under
    the fixed application order — identical semantics in DuckDB
    (whose ``regexp_replace`` needs the ``'g'`` flag the oracle
    passes; Spark replaces globally by default)."""
    out = docs
    cur = F.col(text_col)
    for kind, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))),
        )
        cur = F.regexp_replace(cur, pat, repl)
        out = out.withColumn(f"__scrub_{kind}", cur)
        cur = F.col(f"__scrub_{kind}")
    last = f"__scrub_{PII_PATTERNS[-1][0]}"
    return out.withColumn(out_col, F.col(last)).drop(
        *[f"__scrub_{k}" for k, _, _ in PII_PATTERNS]
    )
