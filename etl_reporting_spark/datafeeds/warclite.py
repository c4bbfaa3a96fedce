"""WARC (Web ARChive, ISO 28500) source — the container format web
crawls ship in (Common Crawl et al.), vendored as a pure-Python
parser so the engine can ingest crawl snapshots without native deps.

Distribution model — the standard one for WARC at scale:

- **One archive file = one task.** ``.warc.gz`` is a stream of
  per-record gzip members; gzip is not block-splittable, so the
  parallel unit is the file (crawls ship thousands of ~1 GB shards —
  plenty of parallelism at 100 TB). ``spark.read.format("binaryFile")``
  distributes the file list; a ``mapInPandas`` worker parses each
  archive into records. Payload bytes go executor→executor via Arrow
  batches and never touch the driver.
- **Quarantine, don't crash.** A malformed region (truncated record,
  bad Content-Length, missing version line) becomes one
  ``warc_type='_corrupt'`` row carrying the raw remainder, and
  parsing stops for that file — a curation run counts/routes these
  instead of dying mid-crawl. Mirrors ``jsonl.split_corrupt``.
- **Projection pushes into the parser.** ``keep_payload=False``
  emits metadata-only rows (payload null), so an index/stats pass
  over a crawl never materializes body bytes at all.

``read_warc`` → one row per WARC record (warcinfo, request,
response, metadata, ...). ``http_responses`` splits HTTP headers
from body for response records — the row shape a text-extraction
pipeline starts from. ``warc_bytes`` builds valid archives
(tests/fixtures and the sink direction).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("source_file", StringType(), False),
        StructField("record_offset", LongType(), False),
        StructField("warc_type", StringType(), True),
        StructField("record_id", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("content_length", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _parse_warc_stream(
    data: bytes, source: str, keep_payload: bool
) -> Iterator[dict]:
    """Yield record dicts from decompressed WARC bytes; on any
    structural error yield one _corrupt row for the remainder and
    stop (a truncated archive cannot be resynced reliably)."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        start = pos
        if not data.startswith(b"WARC/", pos):
            yield _corrupt_row(data[pos:], source, start, keep_payload)
            return
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            yield _corrupt_row(data[pos:], source, start, keep_payload)
            return
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:  # lines[0] is the WARC/x.y version
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                    "latin-1"
                )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            yield _corrupt_row(data[pos:], source, start, keep_payload)
            return
        body_start = hdr_end + len(_CRLF2)
        body_end = body_start + clen
        if body_end > n:
            yield _corrupt_row(data[pos:], source, start, keep_payload)
            return
        yield {
            "source_file": source,
            "record_offset": start,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "payload": data[body_start:body_end] if keep_payload else None,
        }
        pos = body_end


def _corrupt_row(raw: bytes, source: str, offset: int, keep_payload: bool) -> dict:
    return {
        "source_file": source,
        "record_offset": offset,
        "warc_type": "_corrupt",
        "record_id": None,
        "target_uri": None,
        "warc_date": None,
        "content_type": None,
        "content_length": len(raw),
        "payload": raw if keep_payload else None,
    }


def read_warc(
    spark: SparkSession,
    path: str,
    keep_payload: bool = True,
    batch_records: int = 256,
) -> DataFrame:
    """One row per WARC record across every archive under ``path``
    (glob ok). Gzip (.gz / .warc.gz, including per-record members)
    decompresses in the worker; record rows stream out in Arrow
    batches of ``batch_records`` so a 1 GB archive never sits in one
    pandas frame."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            for _, row in pdf.iterrows():
                data = bytes(row["content"])
                if row["path"].endswith(".gz"):
                    # concatenated members decompress as one stream
                    data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
                buf: list[dict] = []
                for rec in _parse_warc_stream(data, row["path"], keep_payload):
                    buf.append(rec)
                    if len(buf) >= batch_records:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf, columns=cols)

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def http_responses(records: DataFrame) -> DataFrame:
    """response records with the HTTP envelope split off: adds
    ``http_status`` (int) and ``body`` (bytes after the first blank
    line). Narrow expressions over the payload — no second parse
    pass, no UDF."""
    resp = records.filter(F.col("warc_type") == "response")
    # HTTP headers are ASCII by spec, so char offsets into the string
    # cast equal byte offsets up to the first blank line.
    txt = F.col("payload").cast("string")
    head = F.substring_index(txt, "\r\n\r\n", 1)
    status = F.regexp_extract(
        F.substring_index(head, "\r\n", 1), r"HTTP/[^ ]+ (\d{3})", 1
    )
    return (
        resp.withColumn("http_status", F.when(status != "", status.cast("int")))
        .withColumn("__off", (F.length(head) + F.lit(5)).cast("int"))
        .withColumn(
            "body", F.expr("substring(payload, __off, cast(content_length as int))")
        )
        .drop("__off")
    )


def warc_bytes(records: Iterable[dict], compress: bool = False) -> bytes:
    """Serialize record dicts (keys: warc_type, record_id, target_uri,
    warc_date, content_type, payload) into a valid WARC stream —
    per-record gzip members when ``compress`` (the .warc.gz
    convention)."""
    out = bytearray()
    for r in records:
        payload = r.get("payload", b"") or b""
        hdr = [b"WARC/1.0"]
        for key, field in (
            (b"WARC-Type", "warc_type"),
            (b"WARC-Record-ID", "record_id"),
            (b"WARC-Target-URI", "target_uri"),
            (b"WARC-Date", "warc_date"),
            (b"Content-Type", "content_type"),
        ):
            v = r.get(field)
            if v is not None:
                hdr.append(key + b": " + str(v).encode("latin-1"))
        hdr.append(b"Content-Length: " + str(len(payload)).encode())
        rec = b"\r\n".join(hdr) + _CRLF2 + payload + _CRLF2
        out += gzip.compress(rec) if compress else rec
    return bytes(out)
