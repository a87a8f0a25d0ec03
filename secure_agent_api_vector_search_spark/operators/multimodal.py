"""Multimodal column plumbing ([EXT], SURVEY.md §2.10).

The reference's only multimodal seam is the `filename` provenance
column (sql/02_schema.sql:12) pointing at source PDFs/HTML. A 100 TB
training-data pipeline carries the payload itself: an opaque
`binary` column plus typed metadata, with decode / feature-extraction
as Arrow-batched `mapInPandas` stages.

The Spark-side plumbing here is REAL and tested — schema, batch
iterator shape, partition-preserving map, feature schema. The actual
media decoding is stubbed (no image/audio libraries in this
environment): `decode_stub=True` produces deterministic fake features
from the bytes; `decode_stub=False` raises NotImplementedError at the
seam where a real decoder (PIL/ffmpeg/torchaudio) would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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
