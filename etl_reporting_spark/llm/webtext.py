"""HTML → training-text extraction for crawl pipelines.

The first transformation every web corpus applies (WARC → HTTP body →
visible text) — trafilatura/justext quality, but the DISTRIBUTED
shape is what matters here: every step is a narrow regexp expression
that fuses into the scan (zero shuffles, linear in corpus bytes,
whole-stage codegen), and every pattern stays inside the regex subset
Java's engine and RE2 share (no backrefs, no lookbehind) so the
DuckDB oracle replays it byte-for-byte.

- ``extract_text`` — drop <script>/<style>/<head> subtrees, turn block-level
  boundaries into newlines, strip remaining tags, decode the common
  entities, collapse whitespace.
- ``extract_title`` / ``extract_links`` — the two metadata columns
  crawl curation keys on (title for dedup/quality, links for the URL
  frontier / domain graph). Links feed ``llm.urls`` (eTLD+1,
  blocklist) directly.

A real boilerplate-removal model (text-density classifier) slots in
AFTER this pass over the extracted lines — see
``llm.corpusops.remove_frequent_lines`` for the corpus-level variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: subtree drops first (their inner text must never
# survive), then block boundaries, then the generic tag strip.
_SUBTREE = r"(?is)<(script|style|head)[^>]*>.*?</(script|style|head)>"
_BLOCK_BREAK = r"(?i)</(p|div|li|h[1-6]|tr|table|ul|ol)>|<br[^>]*>"
_TAG = r"<[^>]+>"

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last: earlier entities may produce '&'-free text
]


def html_text_expr(col: Column) -> Column:
    """Visible text of an HTML column as one narrow expression."""
    c = F.regexp_replace(col, _SUBTREE, " ")
    c = F.regexp_replace(c, _BLOCK_BREAK, "\n")
    c = F.regexp_replace(c, _TAG, " ")
    for ent, rep in _ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    # collapse runs of spaces/tabs, then trim each line, then squeeze
    # blank lines: presentation whitespace carries no signal and
    # inflates token counts.
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    # trim() strips spaces only — boundary newlines need the regex
    c = F.regexp_replace(c, r"^\n+|\n+$", "")
    return F.trim(c)


def extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text_clean"
) -> DataFrame:
    """Add the visible-text column. Narrow; fuses into the scan."""
    return df.withColumn(out_col, html_text_expr(F.col(html_col)))


def extract_title(
    df: DataFrame, html_col: str = "html", out_col: str = "title"
) -> DataFrame:
    """First <title> content (entity-decoded, trimmed)."""
    raw = F.regexp_extract(F.col(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1)
    c = raw
    for ent, rep in _ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    return df.withColumn(out_col, F.trim(c))


def extract_links(
    df: DataFrame, html_col: str = "html", out_col: str = "links"
) -> DataFrame:
    """href targets of every <a> tag, in document order —
    the crawl-frontier feed; join to ``llm.urls`` for domain policy."""
    # one capture group covering double-quoted, single-quoted, and
    # bare attribute values (RE2-safe: alternation, no backrefs); the
    # transform strips the delimiters afterwards.
    raw = F.expr(
        f"regexp_extract_all({html_col},"
        " '(?i)<a[^>]*href=(\"[^\"]*\"|\\'[^\\']*\\'|[^\"\\'\\s>]+)', 1)"
    )
    stripped = F.transform(
        raw,
        lambda x: F.when(
            x.startswith('"') | x.startswith("'"),
            x.substr(F.lit(2), F.length(x) - 2),
        ).otherwise(x),
    )
    return df.withColumn(out_col, stripped)
