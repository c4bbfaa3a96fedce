"""WARC-lite source: round-trip, gzip members, quarantine, HTTP split."""

from __future__ import annotations

import gzip

import pytest

from etl_reporting_spark.datafeeds.warclite import (
    http_responses,
    read_warc,
    warc_bytes,
)

_HTTP = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    b"<html>hello crawl</html>"
)

_RECORDS = [
    {
        "warc_type": "warcinfo",
        "record_id": "<urn:uuid:info-1>",
        "content_type": "application/warc-fields",
        "payload": b"software: test\r\n",
    },
    {
        "warc_type": "response",
        "record_id": "<urn:uuid:resp-1>",
        "target_uri": "http://example.com/a",
        "warc_date": "2026-01-01T00:00:00Z",
        "content_type": "application/http; msgtype=response",
        "payload": _HTTP,
    },
    {
        "warc_type": "request",
        "record_id": "<urn:uuid:req-1>",
        "target_uri": "http://example.com/a",
        "payload": b"GET /a HTTP/1.1\r\n\r\n",
    },
]


@pytest.fixture()
def warc_dir(tmp_path):
    (tmp_path / "a.warc").write_bytes(warc_bytes(_RECORDS))
    (tmp_path / "b.warc.gz").write_bytes(warc_bytes(_RECORDS, compress=True))
    return str(tmp_path)


def test_read_warc_roundtrip(spark, warc_dir):
    rows = read_warc(spark, warc_dir + "/a.warc").collect()
    assert [r["warc_type"] for r in sorted(rows, key=lambda r: r["record_offset"])] == [
        "warcinfo",
        "response",
        "request",
    ]
    resp = next(r for r in rows if r["warc_type"] == "response")
    assert resp["target_uri"] == "http://example.com/a"
    assert bytes(resp["payload"]) == _HTTP
    assert resp["content_length"] == len(_HTTP)


def test_read_warc_gzip_members(spark, warc_dir):
    plain = {(r["warc_type"], bytes(r["payload"] or b""))
             for r in read_warc(spark, warc_dir + "/a.warc").collect()}
    gz = {(r["warc_type"], bytes(r["payload"] or b""))
          for r in read_warc(spark, warc_dir + "/b.warc.gz").collect()}
    assert plain == gz and len(gz) == 3


def test_read_warc_glob_and_metadata_only(spark, warc_dir):
    df = read_warc(spark, warc_dir + "/*.warc*", keep_payload=False)
    rows = df.collect()
    assert len(rows) == 6
    assert all(r["payload"] is None for r in rows)
    assert all(r["content_length"] > 0 for r in rows)


def test_read_warc_quarantines_truncated(spark, tmp_path):
    data = warc_bytes(_RECORDS)
    (tmp_path / "trunc.warc").write_bytes(data[: len(data) - 30])
    rows = sorted(
        read_warc(spark, str(tmp_path / "trunc.warc")).collect(),
        key=lambda r: r["record_offset"],
    )
    # first two records parse, the truncated tail quarantines
    assert [r["warc_type"] for r in rows] == ["warcinfo", "response", "_corrupt"]
    assert rows[-1]["content_length"] > 0


def test_read_warc_quarantines_garbage(spark, tmp_path):
    (tmp_path / "junk.warc").write_bytes(b"not a warc at all")
    rows = read_warc(spark, str(tmp_path / "junk.warc")).collect()
    assert len(rows) == 1 and rows[0]["warc_type"] == "_corrupt"
    assert bytes(rows[0]["payload"]) == b"not a warc at all"


def test_http_responses_split(spark, warc_dir):
    out = http_responses(read_warc(spark, warc_dir + "/a.warc")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["http_status"] == 200
    assert bytes(r["body"]) == b"<html>hello crawl</html>"
