"""URL/domain operators: parsing branches, eTLD+1, normalization."""

from __future__ import annotations

import pytest

from etl_reporting_spark.llm.urls import (
    domain_stats,
    normalized_url,
    with_url_parts,
)


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (1, "https://WWW.Example.co.uk:8443/a/b?b=2&a=1#frag"),
        (2, "http://sub.site.com.au/page"),
        (3, "https://plain.org"),
        (4, "localhost/health"),
        (5, "https://deep.sub.host.com/x?z=1"),
        (6, "http://single"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_url_parts(spark, urls):
    out = {r["doc_id"]: r.asDict() for r in with_url_parts(urls).collect()}
    r1 = out[1]
    assert r1["scheme"] == "https"
    assert r1["host"] == "www.example.co.uk"  # lowercased, port stripped
    assert r1["registrable_domain"] == "example.co.uk"  # two-level suffix
    assert r1["path"] == "/a/b"
    assert r1["query_sorted"] == "a=1&b=2"
    assert out[2]["registrable_domain"] == "site.com.au"
    assert out[3]["path"] == "/" and out[3]["registrable_domain"] == "plain.org"
    assert out[4]["scheme"] == "" and out[4]["host"] == "localhost"
    assert out[4]["registrable_domain"] == "localhost"
    assert out[5]["registrable_domain"] == "host.com"
    assert out[6]["registrable_domain"] == "single"


def test_normalized_url_dedups_param_order(spark):
    df = spark.createDataFrame(
        [
            (1, "https://A.com/x?b=2&a=1#one"),
            (2, "https://a.com/x?a=1&b=2#two"),
        ],
        "doc_id long, url string",
    )
    norms = {r["doc_id"]: r["url_norm"] for r in normalized_url(df).collect()}
    assert norms[1] == norms[2] == "https://a.com/x?a=1&b=2"


def test_domain_stats_shares(spark, urls):
    rows = {r["registrable_domain"]: r for r in domain_stats(urls).collect()}
    assert rows["example.co.uk"]["n_docs"] == 1
    assert abs(sum(r["corpus_share"] for r in rows.values()) - 1.0) < 1e-12


def test_url_parsing_is_narrow(spark, urls):
    plan = with_url_parts(urls)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_apply_domain_blocklist_label_boundary(spark):
    from etl_reporting_spark.llm.urls import apply_domain_blocklist

    rows = [
        (0, "https://example.com/x"),          # exact match
        (1, "https://a.cdn.example.com/x"),    # deep subdomain
        (2, "https://notexample.com/x"),       # lookalike: NOT blocked
        (3, "https://example.com.evil.io/x"),  # listed domain as prefix: NOT blocked
        (4, "http://clean.org/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("Example.COM",)], "domain string")  # case-folded
    out = {r["doc_id"]: r for r in apply_domain_blocklist(df, bl).collect()}
    assert [out[i]["blocked"] for i in range(5)] == [1, 1, 0, 0, 0]
    assert out[1]["blocked_by"] == "example.com"
    kept = apply_domain_blocklist(df, bl, mode="filter")
    assert kept.columns == ["doc_id", "url"]  # original shape restored
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4]
