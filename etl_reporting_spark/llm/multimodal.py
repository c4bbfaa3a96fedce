"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/feature-extracted through Arrow-batched Pandas UDFs.

Two codec tiers share the same Arrow batch contract:

- ``decode_media_metadata`` keeps the DETERMINISTIC FAKE decode (pure
  arithmetic over payload bytes) for the text-byte stand-in payloads —
  reproducible in SQL, so the batch contract itself is oracle-checked
  against arbitrary binary columns.
- ``decode_media_real`` / ``ahash_real`` / ``phash_near_duplicates_real``
  (round-5) run REAL pixel decoding on the pure-stdlib PNG/BMP/PPM
  codecs in ``llm.imagecodec`` — no PIL/ffmpeg needed. Gate images are
  synthesized from an arithmetic pixel formula, so DuckDB re-derives
  the decoded pixels and the real decoder's output is value-hashed
  end-to-end. A production PIL/ffmpeg decoder swaps into
  ``imagecodec.decode_image`` without touching the Spark plumbing.

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


# ----------------------------------------------------- real pixel path
#
# Round-5: the fake-codec gates above stay (their byte-arithmetic
# oracles pin the batch contract), and the REAL decode path now
# executes in-container on the pure-stdlib PNG/BMP/PPM codecs
# (llm.imagecodec — PNG is zlib + filter reconstruction). Synthetic
# gate images use an arithmetic pixel formula so DuckDB can re-derive
# the decoded pixels and value-hash the real decoder's output.

IMG_W, IMG_H = 16, 16


def synthesize_images(
    docs: DataFrame,
    id_col: str = "doc_id",
    width: int = IMG_W,
    height: int = IMG_H,
) -> DataFrame:
    """Real encoded image per document: pixel p (row-major RGB
    interleaved, p in [0, W*H*3)) has value ``(doc_id*7 + p*13) % 256``
    — analytic, so the decode oracle needs no codec. Format rotates by
    doc_id % 4 (png, png, bmp, ppm) to exercise every decoder.
    ``width``/``height`` scale the per-image work (the decode
    throughput bench uses 64×64; the correctness gates 16×16)."""
    import numpy as np

    from etl_reporting_spark.llm.imagecodec import encode_bmp, encode_png, encode_ppm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = np.arange(width * height * 3, dtype=np.int64)
        for batch in batches:
            payloads, fmts = _synth_image_rows(batch["doc_id"], width, height, p)
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"], "payload": payloads, "fmt": fmts}
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema="doc_id long, payload binary, fmt string"
    )


def _synth_image_rows(doc_ids, width: int, height: int, p) -> tuple[list, list]:
    """Per-batch core of :func:`synthesize_images` — shared with the
    fused synth+decode operator so the payload bytes are generated by
    exactly one code path."""
    from etl_reporting_spark.llm.imagecodec import encode_bmp, encode_png, encode_ppm

    payloads, fmts = [], []
    for doc_id in doc_ids:
        arr = ((int(doc_id) * 7 + p * 13) % 256).astype("uint8").reshape(
            height, width, 3
        )
        fmt = ("png", "png", "bmp", "ppm")[int(doc_id) % 4]
        enc = {"png": encode_png, "bmp": encode_bmp, "ppm": encode_ppm}[fmt]
        payloads.append(enc(arr))
        fmts.append(fmt)
    return payloads, fmts


REAL_DECODE_SCHEMA = (
    "doc_id long, fmt string, width int, height int, channels int, pixel_sum long"
)


def decode_media_real(with_payload: DataFrame) -> DataFrame:
    """Real decode: sniff the magic, run the actual codec, emit
    geometry + an exact pixel checksum. Strict — an unrecognized
    payload raises (callers wanting a fallback sniff first; the fake
    path above IS that fallback for the text-byte stand-ins)."""
    import numpy as np

    from etl_reporting_spark.llm.imagecodec import decode_image, sniff_format

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(_decode_real_rows(batch["doc_id"], batch["payload"]))

    return with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=REAL_DECODE_SCHEMA
    )


def _decode_real_rows(doc_ids, payloads) -> dict:
    """Per-batch core of :func:`decode_media_real` — shared with the
    fused synth+decode operator so decode semantics live in one place."""
    import numpy as np

    from etl_reporting_spark.llm.imagecodec import decode_image, sniff_format

    out: dict[str, list] = {
        "doc_id": [], "fmt": [], "width": [], "height": [],
        "channels": [], "pixel_sum": [],
    }
    for doc_id, payload in zip(doc_ids, payloads):
        data = bytes(payload)
        arr = decode_image(data)
        out["doc_id"].append(doc_id)
        out["fmt"].append(sniff_format(data))
        out["height"].append(arr.shape[0])
        out["width"].append(arr.shape[1])
        out["channels"].append(arr.shape[2])
        out["pixel_sum"].append(int(np.sum(arr, dtype=np.int64)))
    return out


def synth_decode_real(
    docs: DataFrame,
    id_col: str = "doc_id",
    width: int = IMG_W,
    height: int = IMG_H,
) -> DataFrame:
    """Fused ``decode_media_real(synthesize_images(docs))`` in ONE
    mapInPandas pass (round-15, guide §4.1): the two-operator chain
    put a second Python evaluation node in the plan, so every encoded
    payload crossed the JVM↔Python boundary twice — serialized out of
    the synth worker into Arrow, through the JVM, and back into the
    decode worker — even though the JVM never touches the bytes. At
    the sf3 throughput tier that is ~2×4 GB of pure transfer framing
    a ~2 s codec computation. Fused, payloads are born and decoded in
    the same worker and only the tiny metadata rows cross. Both halves
    call the same per-batch cores as the standalone operators
    (``_synth_image_rows`` / ``_decode_real_rows``), so the bytes and
    the decoded values are identical by construction; production
    (payloads read from storage, one crossing into the decoder) keeps
    using ``decode_media_real``."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = np.arange(width * height * 3, dtype=np.int64)
        for batch in batches:
            payloads, _ = _synth_image_rows(batch["doc_id"], width, height, p)
            yield pd.DataFrame(_decode_real_rows(batch["doc_id"], payloads))

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=REAL_DECODE_SCHEMA
    )


def resize_media_real(
    with_payload: DataFrame, width: int = 8, height: int = 8
) -> DataFrame:
    """Real resize on real pixels: decode, nearest-neighbor sample to
    (width, height) with integer source indices (``sy = y·H // height``
    — the deterministic resampler an oracle can replay; production
    swaps in a box/bilinear kernel inside the same batch), and emit
    geometry + exact checksums of the RESIZED image (full pixel sum +
    two corner anchors, so a transposed axis or off-by-one index
    breaks the hash)."""
    import numpy as np

    from etl_reporting_spark.llm.imagecodec import decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "channels": [],
                "pixel_sum": [], "corner_tl": [], "corner_br": [],
            }
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                arr = decode_image(bytes(payload))
                h, w, c = arr.shape
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                small = arr[np.ix_(ys, xs)].astype(np.int64)
                out["doc_id"].append(doc_id)
                out["width"].append(width)
                out["height"].append(height)
                out["channels"].append(c)
                out["pixel_sum"].append(int(small.sum()))
                out["corner_tl"].append(int(small[0, 0, 0]))
                out["corner_br"].append(int(small[-1, -1, c - 1]))
            yield pd.DataFrame(out)

    return with_payload.select("doc_id", "payload").mapInPandas(
        run,
        schema=(
            "doc_id long, width int, height int, channels int,"
            " pixel_sum long, corner_tl int, corner_br int"
        ),
    )


FRAME_W = FRAME_H = 8


def synthesize_videos(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real multi-frame payload per document: ``4 + doc_id % 3``
    back-to-back PNG streams (frame f's pixel p =
    ``(doc_id*7 + f*19 + p*13) % 256``, 8×8 RGB) — the concatenated
    container a frame sampler must split by parsing chunk structure,
    not by byte search."""
    import numpy as np

    from etl_reporting_spark.llm.imagecodec import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = np.arange(FRAME_W * FRAME_H * 3, dtype=np.int64)
        for batch in batches:
            payloads, counts = [], []
            for doc_id in batch["doc_id"]:
                d = int(doc_id)
                n_frames = 4 + d % 3
                frames = [
                    encode_png(
                        ((d * 7 + f * 19 + p * 13) % 256)
                        .astype(np.uint8)
                        .reshape(FRAME_H, FRAME_W, 3)
                    )
                    for f in range(n_frames)
                ]
                payloads.append(b"".join(frames))
                counts.append(n_frames)
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"], "payload": payloads, "n_frames": counts}
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema="doc_id long, payload binary, n_frames int"
    )


def sample_frames_real(with_payload: DataFrame, every_nth: int = 2) -> DataFrame:
    """REAL frame sampling: split the concatenated-PNG payload by
    chunk-walking, decode every ``every_nth``-th frame with the real
    codec, 1→N fan-out with exact per-frame pixel checksums. ffmpeg
    keyframe extraction drops into the same generator; the Arrow
    batch shape, fan-out, and schema are identical."""
    import numpy as np

    from etl_reporting_spark.llm.imagecodec import decode_png, iter_png_streams

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "width": [], "height": [],
                "pixel_sum": [],
            }
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                for idx, stream in enumerate(iter_png_streams(bytes(payload))):
                    if idx % every_nth:
                        continue
                    arr = decode_png(stream)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["height"].append(arr.shape[0])
                    out["width"].append(arr.shape[1])
                    out["pixel_sum"].append(int(arr.sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    return with_payload.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, frame_idx int, width int, height int, pixel_sum long"
    )


def synthesize_audio(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real RIFF/PCM16 payload per document:
    ``256 + (doc_id % 4)·64`` mono samples with
    ``s[i] = (doc_id·31 + i·17) % 65536 − 32768`` — analytic, so the
    decoded waveform's features are oracle-replayable."""
    import numpy as np

    from etl_reporting_spark.llm.audiocodec import encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for doc_id in batch["doc_id"]:
                d = int(doc_id)
                n = 256 + (d % 4) * 64
                i = np.arange(n, dtype=np.int64)
                s = ((d * 31 + i * 17) % 65536 - 32768).astype(np.int16)
                payloads.append(encode_wav(s, sample_rate=16_000))
            yield pd.DataFrame({"doc_id": batch["doc_id"], "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema="doc_id long, payload binary"
    )


def audio_features_real(with_payload: DataFrame) -> DataFrame:
    """REAL audio decode + waveform features through the Arrow batch
    contract: frames/channels/energy/peak/zero-crossings are integer;
    rms is one sqrt(division) — all oracle-replayable."""
    from etl_reporting_spark.llm.audiocodec import audio_features, decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "doc_id": [], "sample_rate": [], "n_frames": [], "n_channels": [],
                "energy": [], "peak": [], "zero_crossings": [], "rms": [],
            }
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                arr, rate = decode_wav(bytes(payload))
                feats = audio_features(arr)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                for k in ("n_frames", "n_channels", "energy", "peak",
                          "zero_crossings", "rms"):
                    out[k].append(feats[k])
            yield pd.DataFrame(out)

    return with_payload.select("doc_id", "payload").mapInPandas(
        run,
        schema=(
            "doc_id long, sample_rate int, n_frames int, n_channels int,"
            " energy long, peak int, zero_crossings int, rms double"
        ),
    )


def ahash_real(with_payload: DataFrame, hash_size: int = 8) -> DataFrame:
    """Classic average-hash over REAL decoded pixels: decode →
    integer-luma grayscale ((r+g+b)//3) → nearest-neighbor resize to
    hash_size² → bit i set iff gray_i · n > Σgray (integer compare,
    no float drift) → two's-complement BIGINT. Every step is integer
    arithmetic an oracle can replay; identical pixels through ANY
    encoding produce the identical hash, which is the property the
    re-encode near-dup screen rides."""
    import numpy as np

    from etl_reporting_spark.llm.imagecodec import decode_image

    n_cells = hash_size * hash_size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, sigs = [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                arr = decode_image(bytes(payload)).astype(np.int64)
                h, w, c = arr.shape
                gray = (
                    (arr[:, :, 0] + arr[:, :, 1] + arr[:, :, 2]) // 3
                    if c >= 3
                    else arr[:, :, 0]
                )
                ys = (np.arange(hash_size) * h) // hash_size
                xs = (np.arange(hash_size) * w) // hash_size
                small = gray[np.ix_(ys, xs)]
                total = int(small.sum())
                v = 0
                flat = small.reshape(-1)
                for i in range(n_cells):
                    if int(flat[i]) * n_cells > total:
                        v |= 1 << i
                if v >= 1 << 63:
                    v -= 1 << 64
                ids.append(doc_id)
                sigs.append(v)
            yield pd.DataFrame({"doc_id": ids, "ahash": sigs})

    return with_payload.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, ahash long"
    )


def phash_near_duplicates_real(
    with_payload: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Near-dup media pairs over REAL pixels: aHash signatures →
    SimHash banded blocking (4×16-bit, pigeonhole for hamming ≤ 3) →
    fused bit_count verify. A re-encoded image (same pixels, any of
    png/bmp/ppm) hashes identically and is caught at hamming 0; a
    lightly perturbed one lands within the hamming budget."""
    from etl_reporting_spark.llm.dedup import simhash_candidate_pairs

    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming}: the 4x16-bit banding only guarantees "
            "candidate generation for hamming <= 3 (pigeonhole) — a larger "
            "radius would SILENTLY miss pairs whose differing bits spread "
            "across all four blocks; raise the block count instead"
        )
    sigs = ahash_real(with_payload).withColumnRenamed("ahash", "simhash")
    pairs = simhash_candidate_pairs(
        sigs, blocks=4, block_bits=16, max_hamming=max_hamming
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
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
