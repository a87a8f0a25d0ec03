"""Multimodal column plumbing ([EXT], SURVEY.md §2.10).

The reference's only multimodal seam is the `filename` provenance
column (sql/02_schema.sql:12) pointing at source PDFs/HTML. A 100 TB
training-data pipeline carries the payload itself: an opaque
`binary` column plus typed metadata, with decode / feature-extraction
as Arrow-batched `mapInPandas` stages.

The Spark-side plumbing here is REAL and tested — schema, batch
iterator shape, partition-preserving map, feature schema. Decoding has
two tiers:

- REAL decoders for formats parseable with stdlib + numpy alone:
  binary netpbm images (P5 graymap / P6 pixmap → numpy array, true
  dimensions, luminance stats, nearest-neighbor thumbnail) and PCM WAV
  audio (stdlib ``wave`` → sample rate, duration, RMS, per-window
  envelope — the frame-sample analog). These run end-to-end in tests.
- A documented stub seam for everything else (JPEG/PNG/MP4 need
  image/video libraries this container lacks): `decode_stub=True`
  produces deterministic fake features from the bytes;
  `decode_stub=False` raises NotImplementedError at the exact line a
  real decoder (PIL / av / soundfile) plugs into.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, payload_sha256 string, "
    "width int, height int, n_channels int"
)


def attach_binary_payload(documents: DataFrame, mime: str = "application/octet-stream") -> DataFrame:
    """Materialize an opaque binary payload column + metadata from the
    text body (stand-in for reading real media files; the schema is what
    matters: payload binary, mime string)."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def extract_features(with_payload: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract each payload via mapInPandas.

    Arrow-batched, partition-preserving (no shuffle); this is exactly
    how a real image-resize / frame-sample / mel-spectrogram stage runs
    at scale — the decoder is per-batch Python, everything around it
    stays in the JVM.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding needs an image/audio library; "
                    "plug a decoder in here (PIL.Image.open / av / soundfile)"
                )
            payloads = pdf["payload"]
            digests = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            n = payloads.map(len)
            # deterministic fake "decode": dimensions derived from the digest
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n,
                    "payload_sha256": digests,
                    "width": digests.map(lambda d: 64 + int(d[:2], 16)),
                    "height": digests.map(lambda d: 64 + int(d[2:4], 16)),
                    "n_channels": 3,
                }
            )

    return with_payload.mapInPandas(op, schema=FEATURE_SCHEMA)


def multimodal_features(documents: DataFrame) -> DataFrame:
    """End-to-end: attach payloads → extract features. Deterministic,
    so it gets a (rows-only) driver check and full pytest coverage."""
    return extract_features(attach_binary_payload(documents)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Real decoders: binary netpbm (P5/P6) and PCM WAV — stdlib + numpy only.


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode a BINARY netpbm image (P5 graymap / P6 pixmap, maxval
    <= 255) to a (height, width, channels) uint8 array. Pure
    bytes-parsing + numpy — a real decoder, no image library."""
    if not payload[:2] in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {payload[:2]!r}")
    channels = 1 if payload[:2] == b"P5" else 3
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments allowed, then ONE whitespace byte then raster
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * channels, offset=i + 1
    )
    return raster.reshape(height, width, channels)


def encode_netpbm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_netpbm` (test fixture + sink side)."""
    h, w, c = img.shape
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def thumbnail(img: np.ndarray, size: int = 8) -> np.ndarray:
    """Nearest-neighbor downsample to (size, size, channels) — the
    resize stage of an image pipeline, pure integer indexing."""
    h, w, _ = img.shape
    ys = (np.arange(size) * h) // size
    xs = (np.arange(size) * w) // size
    return img[ys][:, xs]


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, "
    "mean_luma double, thumb_sha256 string"
)


def image_features(with_payload: DataFrame, thumb_size: int = 8) -> DataFrame:
    """REAL image decode → features via mapInPandas: true dimensions,
    mean luminance, and the sha256 of a nearest-neighbor thumbnail
    (the resize stage, digested so the output stays scalar-typed).
    Arrow-batched, partition-preserving, decoder runs per batch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_netpbm(bytes(payload))
                h, w, c = img.shape
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        c,
                        float(img.mean()),
                        hashlib.sha256(
                            thumbnail(img, thumb_size).tobytes()
                        ).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "mean_luma", "thumb_sha256",
                ],
            )

    return with_payload.mapInPandas(op, schema=IMAGE_FEATURE_SCHEMA)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode PCM WAV bytes to (sample_rate, samples[n, channels])
    via the stdlib ``wave`` reader — a real audio decoder."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    return rate, np.frombuffer(raw, dtype=dtype).reshape(-1, ch)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of :func:`decode_wav` for int16 PCM (test fixture)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def synthetic_image_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic REAL P5 images derived from each document's text
    (seeded byte pattern sized by the text digest): (doc_id, payload).
    Exists because this container ships no real image corpus — the
    payloads are genuine netpbm bytes, so the decode path downstream is
    the production path, not a fake."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                h, w = 16 + d[0] % 48, 16 + d[1] % 48
                px = np.frombuffer(
                    (d * ((h * w) // len(d) + 1))[: h * w], dtype=np.uint8
                ).reshape(h, w, 1)
                rows.append((doc_id, encode_netpbm(px)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_wav_payloads(documents: DataFrame, rate: int = 8000) -> DataFrame:
    """Deterministic REAL PCM WAV payloads: a sine tone whose frequency,
    amplitude, and length derive from the text digest, with a silent
    tail (so the activity screen has both regimes)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                n = 2048 + 256 * (d[2] % 8)
                freq = 100 + 10 * d[3]
                amp = 2000 + 100 * d[4]
                t = np.arange(n) / rate
                tone = (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)
                silence = np.zeros(1024, dtype=np.int16)
                samples = np.concatenate([tone, silence])[:, None]
                rows.append((doc_id, encode_wav(samples, rate)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, n_channels int, "
    "duration_sec double, rms double, n_active_windows int"
)


def audio_features(
    with_payload: DataFrame, window: int = 1024, activity_rms: float = 100.0
) -> DataFrame:
    """REAL audio decode → features via mapInPandas: rate/duration/RMS
    plus an energy-envelope frame-sample (count of ``window``-sample
    frames whose RMS clears ``activity_rms`` — the voice-activity
    screen of an audio curation pipeline)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, x = decode_wav(bytes(payload))
                mono = x.astype(np.float64).mean(axis=1)
                n = len(mono)
                rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
                nwin = n // window
                active = 0
                if nwin:
                    frames = mono[: nwin * window].reshape(nwin, window)
                    wrms = np.sqrt(np.mean(frames**2, axis=1))
                    active = int((wrms >= activity_rms).sum())
                rows.append(
                    (doc_id, rate, n, x.shape[1], n / rate if rate else 0.0,
                     rms, active)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "n_channels",
                    "duration_sec", "rms", "n_active_windows",
                ],
            )

    return with_payload.mapInPandas(op, schema=AUDIO_FEATURE_SCHEMA)
