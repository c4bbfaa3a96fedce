"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/feature-extracted through Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so ``decode_media_metadata``
ships a DETERMINISTIC FAKE decode (pure arithmetic over the payload
bytes) behind the real Spark plumbing — schema, mapInPandas batch
shape, partitioning — and ``decode_media_real`` marks where a real
codec (PIL/ffmpeg) plugs in. The fake is reproducible in SQL, so even
the Python-UDF path is oracle-checked.

Scale notes: mapInPandas streams Arrow batches; payloads never
concentrate on the driver. Binary columns ride Parquet as BINARY with
per-column compression; partition by source/shard so decode
parallelism is payload-count-, not byte-, skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, fake_channels int, media_kind string"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 text bytes standing
    in for image/audio payloads) plus a media-kind tag."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_kind",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video"),
    )


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: metadata derived purely
    from payload length. Replace with PIL/soundfile/ffmpeg here."""
    n = batch["payload"].map(len).astype("int32")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n,
            "fake_width": (n % 640 + 16).astype("int32"),
            "fake_height": ((n * 7) % 480 + 16).astype("int32"),
            "fake_channels": (n % 3 + 1).astype("int32"),
            "media_kind": batch["media_kind"],
        }
    )


def decode_media_metadata(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _fake_decode(batch)

    return with_payload.select("doc_id", "payload", "media_kind").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_media_real(with_payload: DataFrame) -> DataFrame:
    """Real decode path — requires codecs not present in this
    environment."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/soundfile) are not installed; "
        "use decode_media_metadata's plumbing with a real decoder here"
    )
