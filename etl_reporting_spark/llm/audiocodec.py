"""Pure-stdlib WAV (RIFF/PCM) codec: real audio decoding with no
native dependencies — the audio sibling of ``imagecodec``.

PCM WAV is a fixed-layout container (RIFF header + fmt chunk + data
chunk of little-endian samples), so a complete encoder/decoder is a
few dozen lines of ``struct`` — which means the multimodal AUDIO path
can execute on real waveform bytes in-container, exactly like the
image path. A production soundfile/ffmpeg decoder swaps in behind the
same ``decode_wav`` signature.

Supported surface: PCM integer 16-bit (the interchange default), mono
or multi-channel, any sample rate. Strict elsewhere (compressed
formats raise — the honest-codec convention).

Arrays are numpy int16 with shape (n_frames, n_channels).
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def sniff_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 (frames,) or (frames, channels) → RIFF/PCM16 bytes."""
    arr = np.ascontiguousarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    data = arr.tobytes()  # interleaved little-endian on every platform numpy supports
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM16 bytes → (int16 array (frames, channels), sample_rate)."""
    if not sniff_wav(data):
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    n_ch = sample_rate = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # Fail loudly, like the PNG decoder: a truncated data
            # chunk would otherwise silently decode fewer frames and
            # yield wrong features with no error.
            raise ValueError(
                f"WAV: truncated {cid!r} chunk (declared {size} bytes, "
                f"{len(body)} present)"
            )
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"WAV: fmt chunk too short ({len(body)} bytes, need 16)"
                )
            audio_fmt, n_ch, sample_rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"WAV: only PCM16 supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            pcm = body
    if n_ch is None or pcm is None:
        raise ValueError("WAV: missing fmt or data chunk")
    arr = np.frombuffer(pcm, dtype="<i2").reshape(-1, n_ch)
    return arr, sample_rate


def audio_features(samples: np.ndarray) -> dict:
    """Deterministic waveform features, integer until the final
    division: frame count, sum of squares (energy), zero-crossing
    count (sign changes on channel 0), peak amplitude. The float
    ``rms`` is one sqrt(division) — IEEE-exact, oracle-replayable."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    ch0 = arr[:, 0]
    energy = int((arr * arr).sum())
    n = int(arr.size)
    # zero crossing: strict sign change between consecutive ch0 samples
    s = np.sign(ch0)
    zc = int(((s[1:] * s[:-1]) < 0).sum())
    return {
        "n_frames": int(arr.shape[0]),
        "n_channels": int(arr.shape[1]),
        "energy": energy,
        "peak": int(np.abs(arr).max(initial=0)),
        "zero_crossings": zc,
        "rms": float(np.sqrt(energy / n)) if n else 0.0,
    }
