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


RESIZED_SCHEMA = (
    "doc_id long, media_kind string, width int, height int, resized_payload binary"
)


def resize_media(
    with_payload: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Resize plumbing: Arrow-batched transform emitting a new binary
    payload sized for the target geometry. The fake "resampler" tiles
    the source bytes to exactly ``width*height`` bytes (deterministic,
    codec-free); a real implementation swaps the two marked lines for
    PIL's ``Image.open(...).resize(...)``. Batch shape, schema, and
    per-row binary output are the real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for batch in batches:
            resized = batch["payload"].map(
                # real codec goes here: decode → resize → re-encode
                lambda b: bytes((b * (target // max(len(b), 1) + 1))[:target])
            )
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "media_kind": batch["media_kind"],
                    "width": width,
                    "height": height,
                    "resized_payload": resized,
                }
            )

    return with_payload.select("doc_id", "payload", "media_kind").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_payload binary"


def sample_frames(
    with_payload: DataFrame, frame_bytes: int = 256, every_nth: int = 2
) -> DataFrame:
    """Frame sampling plumbing: one input row fans out to one row per
    sampled frame (frame_idx, frame bytes) — the 1→N mapInPandas
    shape a real video pipeline needs. The fake treats the payload as
    a concatenation of ``frame_bytes``-sized frames and keeps every
    ``every_nth``-th; ffmpeg keyframe extraction plugs into the same
    generator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_payload": []}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n_frames = max(len(payload) // frame_bytes, 1)
                for idx in range(0, n_frames, every_nth):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_payload"].append(
                        bytes(payload[idx * frame_bytes : (idx + 1) * frame_bytes])
                    )
            yield pd.DataFrame(out)

    return with_payload.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id long, embedding array<float>"


def extract_features(with_payload: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing: binary payload → fixed-dim float
    vector, ready for the ANN operators in ``llm.similarity``. The
    fake projects byte histograms into ``dim`` buckets, scaled to
    [0, 1] — deterministic arithmetic; a real model (CLIP/wav2vec)
    replaces the histogram line and keeps the batch contract."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            vecs = []
            for payload in batch["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = float(hist.sum()) or 1.0
                vecs.append((hist / total).astype("float32"))
            yield pd.DataFrame({"doc_id": batch["doc_id"], "embedding": vecs})

    return with_payload.select("doc_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_media_real(with_payload: DataFrame) -> DataFrame:
    """Real decode path — requires codecs not present in this
    environment."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/soundfile) are not installed; "
        "use decode_media_metadata's plumbing with a real decoder here"
    )


PHASH_SCHEMA = "doc_id long, phash long"


def perceptual_hash(with_payload: DataFrame, bits: int = 64) -> DataFrame:
    """Perceptual signature over the binary payload (aHash family):
    bucket the payload bytes mod ``bits``, set bit i iff bucket i's
    count exceeds the mean (integer compare ``c·bits > total`` — no
    float division to diverge across engines). A real image pipeline
    replaces the histogram with the low-frequency DCT block of the
    decoded/resized image (classic pHash) inside the same Arrow
    batch contract; signature width, packing (bit 63 via two's
    complement so the value is an ordinary BIGINT in any engine),
    and downstream blocking are unchanged.

    Scale: one mapInPandas pass, no shuffle; payload bytes never
    leave the executor.
    """
    import numpy as np

    assert bits in (16, 32, 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            sigs = []
            for payload in batch["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % bits, minlength=bits)
                total = int(hist.sum())
                v = 0
                for i in range(bits):
                    if int(hist[i]) * bits > total:
                        v |= 1 << i
                if v >= 1 << 63:
                    v -= 1 << 64
                sigs.append(v)
            yield pd.DataFrame({"doc_id": batch["doc_id"], "phash": sigs})

    return with_payload.select("doc_id", "payload").mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_duplicates(
    with_payload: DataFrame, bits: int = 64, max_hamming: int = 3
) -> DataFrame:
    """Media near-dup pairs by perceptual hash: signatures from
    :func:`perceptual_hash`, candidate generation + fused Hamming
    verify via the SAME banded blocking as text SimHash
    (``dedup.simhash_candidate_pairs`` — 4×16-bit blocks, pigeonhole
    guarantee for hamming ≤ 3). Near-identical payloads (re-encodes,
    crops at the fake-codec level) collide; the quadratic stays
    inside blocks."""
    from etl_reporting_spark.llm.dedup import simhash_candidate_pairs

    sigs = perceptual_hash(with_payload, bits=bits).withColumnRenamed("phash", "simhash")
    pairs = simhash_candidate_pairs(
        sigs, blocks=4, block_bits=bits // 4, max_hamming=max_hamming
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
    )
