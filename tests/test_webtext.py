"""HTML → text extraction: subtree drops, entities, block breaks,
link order."""

from __future__ import annotations

from etl_reporting_spark.llm.webtext import extract_links, extract_text, extract_title


def test_extract_text_drops_subtrees_and_decodes(spark):
    html = (
        '<html><head><title>T</title><script>alert("x")</script></head>'
        "<body><p>one &amp; two</p><div>three</div>"
        "<style>p{}</style>four&nbsp;&lt;tag&gt;</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = extract_text(df).first()["text_clean"]
    assert out == 'one & two\nthree\nfour <tag>'
    assert "alert" not in out and "T" not in out.split()  # script+head gone


def test_extract_text_malformed_html_degrades_gracefully(spark):
    rows = [(1, "no tags at all"), (2, "<p>unclosed"), (3, ""), (4, "<br><br><br>")]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r["text_clean"] for r in extract_text(df).collect()}
    assert got[1] == "no tags at all"
    assert got[2] == "unclosed"
    assert got[3] == "" and got[4] == ""


def test_title_and_links_in_document_order(spark):
    html = (
        '<html><head><TITLE>A &quot;B&quot;</TITLE></head><body>'
        '<a href="https://x.com/1">1</a> text <A HREF="/two">2</A></body></html>'
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    assert extract_title(df).first()["title"] == 'A "B"'
    links = extract_links(df).first()["links"]
    assert links == ["https://x.com/1", "/two"]


def test_extraction_is_narrow(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = (
        extract_links(extract_title(extract_text(df)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
