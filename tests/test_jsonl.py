"""JSONL source/sink: schema-enforced read, corrupt-line quarantine,
sharded compressed write round-trip."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from etl_reporting_spark.datafeeds.jsonl import read_jsonl, split_corrupt, write_jsonl

SCHEMA = "doc_id long, text string, lang string"


def _write_lines(path, lines):
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


class TestReadJsonl:
    def test_schema_enforced_read(self, spark, tmp_path):
        p = str(tmp_path / "in.jsonl")
        _write_lines(
            p,
            [
                json.dumps({"doc_id": 1, "text": "hello", "lang": "en"}),
                json.dumps({"doc_id": 2, "text": "welt", "lang": "de"}),
            ],
        )
        df = read_jsonl(spark, p, SCHEMA)
        rows = {r["doc_id"]: r for r in df.collect()}
        assert rows[1]["text"] == "hello" and rows[2]["lang"] == "de"

    def test_corrupt_lines_quarantined_not_dropped(self, spark, tmp_path):
        p = str(tmp_path / "in.jsonl")
        _write_lines(
            p,
            [
                json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
                "{this is not json",
                json.dumps({"doc_id": 3, "text": "also ok", "lang": "en"}),
            ],
        )
        clean, bad = split_corrupt(read_jsonl(spark, p, SCHEMA))
        assert sorted(r["doc_id"] for r in clean.collect()) == [1, 3]
        assert "_corrupt_record" not in clean.columns
        bad_rows = bad.collect()
        assert len(bad_rows) == 1 and bad_rows[0]["raw_line"].startswith("{this")

    def test_missing_fields_are_null_not_corrupt(self, spark, tmp_path):
        p = str(tmp_path / "in.jsonl")
        _write_lines(p, [json.dumps({"doc_id": 7})])
        clean, bad = split_corrupt(read_jsonl(spark, p, SCHEMA))
        assert bad.count() == 0
        r = clean.first()
        assert r["doc_id"] == 7 and r["text"] is None

    def test_inference_requires_opt_in(self, spark, tmp_path):
        p = str(tmp_path / "in.jsonl")
        _write_lines(p, [json.dumps({"a": 1})])
        with pytest.raises(ValueError, match="infer=True"):
            read_jsonl(spark, p)
        assert read_jsonl(spark, p, infer=True).first()["a"] == 1


class TestWriteJsonl:
    def test_gzip_sharded_roundtrip(self, spark, tmp_path, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = str(tmp_path / "corpus")
        write_jsonl(docs, out, partitions=4)
        shards = glob.glob(os.path.join(out, "part-*.json.gz"))
        assert len(shards) == 4
        # each shard is valid standalone JSONL (splittable interchange)
        with gzip.open(shards[0], "rt") as fh:
            first = json.loads(fh.readline())
        assert "doc_id" in first
        back = read_jsonl(
            spark, out, "doc_id long, text string, lang string, source string, n_chars long"
        )
        clean, bad = split_corrupt(back)
        assert bad.count() == 0
        assert clean.count() == docs.count()
        assert (
            clean.select(F.sum("n_chars")).first()[0]
            == docs.select(F.sum("n_chars")).first()[0]
        )

    def test_uncompressed_write(self, spark, tmp_path):
        df = spark.range(10).select(F.col("id").alias("doc_id"))
        out = str(tmp_path / "plain")
        write_jsonl(df, out, compression=None, partitions=1)
        files = glob.glob(os.path.join(out, "part-*.json"))
        assert len(files) == 1
        assert len(open(files[0]).read().strip().split("\n")) == 10
