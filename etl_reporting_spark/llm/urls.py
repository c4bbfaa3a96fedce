"""URL / domain operators for crawl curation.

Web-corpus pipelines key many decisions on the URL: per-domain crawl
quotas (no single site dominates the mixture), domain-level quality
priors, dedup scoping, robots/blocklist joins. These operators parse
and normalize URLs with ENGINE-PORTABLE string expressions
(split_part / substring / lower / array ops — no regex dialects, no
parse_url builtin whose edge-case semantics differ per engine), so
the whole family is narrow, fuses into the scan, and reproduces in
the DuckDB oracle.

- ``with_url_parts`` — scheme, host (lowercased, port stripped),
  registrable domain, path (query/fragment stripped), and the
  query string with its parameters SORTED (the standard
  normalization so ``?a=1&b=2`` and ``?b=2&a=1`` dedup together).
- ``registrable_domain_expr`` — eTLD+1 via a vendored multi-label
  suffix set (the public-suffix-list mechanism with the common
  two-level suffixes inlined; swap in the full PSL as a broadcast
  join when exactness across every ccTLD matters — the expression
  shape stays the same).
- ``domain_stats`` — docs per registrable domain + corpus share;
  compose with ``corpusops.cap_per_group`` / ``sampling.
  temperature_sample`` for per-domain quotas.

Scale: parsing is zero-shuffle; domain_stats is one
map-side-combinable count whose output cardinality is the number of
domains (always broadcastable back).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common two-level public suffixes (registrable domain is one label
# deeper). Mechanism mirrors the PSL; extend or replace with the full
# list via broadcast join for ccTLD exactness.
TWO_LEVEL_SUFFIXES = (
    "co.uk org.uk ac.uk gov.uk co.jp or.jp ne.jp com.au net.au org.au "
    "com.br com.cn com.mx co.in co.kr co.za com.ar com.tr com.sg"
).split()


def registrable_domain_expr(host: Column) -> Column:
    """eTLD+1 from a lowercased host: 3 labels when the last two form
    a known two-level suffix, else 2 labels, else the host itself."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: out-of-range → NULL (concat_ws skips nulls), so
    # short hosts never trip ANSI array-index errors; DuckDB's
    # negative list indexing has the same NULL semantics.
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    last3 = F.concat_ws(
        ".",
        F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    two_level = F.array(*[F.lit(s) for s in TWO_LEVEL_SUFFIXES])
    return (
        F.when((n >= 3) & F.array_contains(two_level, last2), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add scheme / host / registrable_domain / path / query_sorted.

    All narrow split_part/substring arithmetic (portable across
    engines); malformed URLs degrade gracefully (missing scheme →
    empty scheme, no path → '/', no query → '')."""
    u = F.col(url_col)
    work = df.withColumn(
        "__rest",
        F.when(u.contains("://"), F.split_part(u, F.lit("://"), F.lit(2))).otherwise(u),
    )
    rest = F.col("__rest")
    scheme = F.when(u.contains("://"), F.split_part(u, F.lit("://"), F.lit(1))).otherwise(
        F.lit("")
    )
    hostport = F.split_part(
        F.split_part(F.split_part(rest, F.lit("/"), F.lit(1)), F.lit("?"), F.lit(1)),
        F.lit("#"),
        F.lit(1),
    )
    host = F.lower(F.split_part(hostport, F.lit(":"), F.lit(1)))
    # path: from the first '/' of rest, minus query/fragment
    path_full = F.when(
        F.instr(rest, "/") > 0, F.expr("substring(__rest, instr(__rest, '/'))")
    ).otherwise(F.lit("/"))
    path = F.split_part(
        F.split_part(path_full, F.lit("?"), F.lit(1)), F.lit("#"), F.lit(1)
    )
    query = F.when(
        u.contains("?"),
        F.split_part(F.split_part(u, F.lit("?"), F.lit(2)), F.lit("#"), F.lit(1)),
    ).otherwise(F.lit(""))
    query_sorted = F.when(
        query != "", F.concat_ws("&", F.array_sort(F.split(query, "&")))
    ).otherwise(F.lit(""))
    return (
        work.withColumn("scheme", scheme)
        .withColumn("host", host)
        .withColumn("registrable_domain", registrable_domain_expr(host))
        .withColumn("path", path)
        .withColumn("query_sorted", query_sorted)
        .drop("__rest")
    )


def normalized_url(df: DataFrame, url_col: str = "url", out_col: str = "url_norm") -> DataFrame:
    """Canonical form for URL-level dedup: lowercased host,
    fragment dropped, query params sorted. Requires/applies
    ``with_url_parts``."""
    parts = df if "query_sorted" in df.columns else with_url_parts(df, url_col)
    norm = F.concat(
        F.col("scheme"),
        F.lit("://"),
        F.col("host"),
        F.col("path"),
        F.when(F.col("query_sorted") != "", F.concat(F.lit("?"), F.col("query_sorted"))).otherwise(
            F.lit("")
        ),
    )
    return parts.withColumn(out_col, norm)


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Docs per registrable domain + corpus share (one count whose
    output is domain-cardinality-sized). The input may already carry
    ``registrable_domain``; otherwise it is derived."""
    parts = df if "registrable_domain" in df.columns else with_url_parts(df, url_col)
    counts = parts.groupBy("registrable_domain").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "registrable_domain",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("__total").cast("double")).alias(
                "corpus_share"
            ),
        )
    )


def apply_domain_blocklist(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    mode: str = "label",
) -> DataFrame:
    """Blocklist screen with SUBDOMAIN semantics: a row is blocked
    when its host equals a listed domain or sits anywhere under it
    (``example.com`` blocks ``a.cdn.example.com``; never
    ``notexample.com`` — matching is per label boundary, not string
    suffix). ``blocklist`` is one lowercase ``domain`` column (UT1,
    ads/malware feeds, robots-derived denials...).

    ``mode="label"`` keeps every row and adds ``blocked`` (0/1) +
    ``blocked_by`` (the FIRST matching entry walking from the full
    host toward the TLD — deterministic); ``mode="filter"`` returns
    only unblocked rows, original columns.

    Scale design: the naive formulation is a LIKE/endswith theta-join
    — a nested loop over corpus × blocklist. Instead the host
    EXPLODES into its label suffixes (a.b.example.com → a.b.example.com,
    b.example.com, example.com, com — ≤ host label count, a small
    constant), and blocking becomes an EQUI-join on the suffix,
    broadcast when the blocklist is broadcastable (a million-domain
    list is ~20 MB — always). One narrow explode, one broadcast hash
    join, one groupBy on the row id to collapse multi-level matches;
    nothing quadratic anywhere. The verdict depends only on the HOST,
    so the internal key is md5(host) — deterministic under reruns,
    repartitioning, and double evaluation (this frame feeds both join
    sides; a monotonically_increasing_id here could diverge between
    evaluations and mislabel rows). Duplicate hosts collapse in the
    hits relation and fan back out on the join — one output row per
    input row either way.
    """
    parts = df if "host" in df.columns else with_url_parts(df, url_col)
    work = parts.withColumn("__rid", F.md5(F.col("host")))
    labels = F.split(F.col("host"), r"\.")
    sufs = work.select(
        "__rid",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(labels)),
                lambda i: F.concat_ws(".", F.slice(labels, i, F.size(labels))),
            )
        ).alias("depth", "suffix"),
    )
    bl = F.broadcast(blocklist.select(F.lower(F.col("domain")).alias("suffix")).distinct())
    hits = (
        sufs.join(bl, "suffix")
        .groupBy("__rid")
        .agg(F.min_by("suffix", "depth").alias("blocked_by"))
    )
    labeled = work.join(hits, "__rid", "left")
    if mode == "filter":
        return labeled.filter(F.col("blocked_by").isNull()).select(*df.columns)
    if mode != "label":
        raise ValueError(f"unknown mode {mode!r}: expected 'label' or 'filter'")
    return labeled.select(
        *parts.columns,
        F.when(F.col("blocked_by").isNotNull(), 1).otherwise(0).alias("blocked"),
        "blocked_by",
    )
