"""Deterministic text embedder — the test seam for the reference's
`embedding('text-embedding-005', text)` in-database UDF (tools.yaml:24,
sql/04_embeddings.sql:5-6, V1 in SURVEY.md §2.3).

The reference calls a remote model from inside the database; a
reproducible engine needs an injectable embedder so correctness is
oracle-checkable without a network. This one is the classic hashing
trick: token → bucket = hash(token) mod DIM, count, L2-normalize.
Properties tests rely on: deterministic; identical text → identical
vector (cosine 1); shared vocabulary → higher cosine.

Two surfaces, same math:
- :func:`embed_text` — driver-side, for query vectors (embed ONCE on the
  driver and broadcast as a literal — the reference re-evaluates the
  query embedding per row inside the DB; computing it once is strictly
  better, SURVEY.md §4).
- :func:`embed_udf` — Arrow-batched pandas_udf for corpus backfill on
  executors (the `UPDATE ... SET abstract_embeddings = embedding(...)`
  analog, sql/04_embeddings.sql:5-6).

A real deployment swaps these for a model-endpoint client with the same
signatures — :class:`EndpointEmbedder` below is that swap, with the
transport injected so it is unit-testable without a network; nothing
else in the engine changes.
"""

from __future__ import annotations

import hashlib
import math
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

DIM = 64  # matches the testdata corpus; the reference uses 768 (sql/02_schema.sql:14)


def _bucket(token: str, dim: int) -> int:
    # stable across processes (unlike hash()), and chosen to be
    # SQL-expressible: little-endian first 8 bytes of md5 is exactly
    # DuckDB's md5_number_upper(), so the oracle can recompute corpus
    # embeddings with plain SQL (catalog.py find_similar_by_text)
    h = hashlib.md5(token.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "little") % dim


def embed_text(text: str, dim: int = DIM) -> list[float]:
    """Hash-bucket bag-of-words, L2-normalized. Pure, no network."""
    vec = [0.0] * dim
    for tok in text.lower().split():
        vec[_bucket(tok, dim)] += 1.0
    n = math.sqrt(sum(x * x for x in vec))
    if n > 0:
        vec = [x / n for x in vec]
    return vec


def embed_udf(dim: int = DIM):
    """Arrow-batched pandas UDF: text column → array<double> embedding.

    Batched like the reference's per-batch Vertex callout, but on
    executors; at 100 TB this is the only Python stage in the ingest
    pipeline and it is embarrassingly parallel (no shuffle).
    """

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # Whole-batch form: md5 runs once per UNIQUE token in the batch
        # (corpus vocabulary << token count), then one bincount scatter
        # builds every document's bucket counts at once. Bit-exact with
        # embed_text: integer counts, the same IEEE sqrt/divide.
        for s in it:
            toks_per_doc = [(t or "").lower().split() for t in s]
            n_docs = len(toks_per_doc)
            n_toks = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=n_docs)
            mat = np.zeros((n_docs, dim))
            if int(n_toks.sum()) > 0:
                flat_toks = np.asarray(
                    [tok for toks in toks_per_doc for tok in toks], dtype=object
                )
                uniq, inv = np.unique(flat_toks, return_inverse=True)
                bucket_of_uniq = np.fromiter(
                    (_bucket(t, dim) for t in uniq), dtype=np.int64, count=len(uniq)
                )
                doc_of = np.repeat(np.arange(n_docs), n_toks)
                mat = np.bincount(
                    doc_of * dim + bucket_of_uniq[inv], minlength=n_docs * dim
                ).reshape(n_docs, dim).astype(np.float64)
            norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            np.divide(mat, norms, out=mat, where=norms > 0.0)
            yield pd.Series(list(mat))

    return _embed


@dataclass
class EndpointEmbedder:
    """Production analog of the reference's remote-model V1
    (`embedding('text-embedding-005', text)`, tools.yaml:24,
    sql/04_embeddings.sql:5-6): the SAME two surfaces as the hashing
    embedder — a driver-side :meth:`embed_text` for query vectors and
    an Arrow-batched :meth:`embed_udf` for corpus backfill — backed by
    a pluggable ``transport: list[str] -> list[list[float]]``.

    The transport is the ONLY networked piece and is injected, so the
    adapter is unit-tested with a fake and a real deployment supplies
    e.g. a Vertex/OpenAI-compatible HTTP callable. Requirements on it:

    - picklable (it ships to executors inside the UDF closure); for a
      client with live connections, pass a top-level function that
      builds its session lazily per process.
    - batch-in/batch-out: called with ≤ ``batch_size`` texts per
      request, like the reference's per-batch model callout.

    Failure policy: transient transport errors retry ``max_retries``
    times with exponential backoff (sleep injectable for tests); a
    malformed response — wrong row count or wrong vector width — raises
    immediately, because silently writing wrong-width vectors poisons
    every similarity downstream. At 100 TB the UDF is the pipeline's
    only Python stage and stays shuffle-free; endpoint throughput is
    the bottleneck, which is why batch_size is the knob.
    """

    transport: Callable[[list[str]], list[list[float]]]
    dim: int = DIM
    batch_size: int = 128
    max_retries: int = 2
    backoff_base_s: float = 0.5
    sleep: Callable[[float], None] = time.sleep

    def _call(self, texts: list[str]) -> list[list[float]]:
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                out = self.transport(texts)
                break
            except Exception as exc:  # noqa: BLE001 — transport is opaque
                last = exc
                if attempt == self.max_retries:
                    raise
                self.sleep(self.backoff_base_s * (2.0**attempt))
        else:  # pragma: no cover — loop always breaks or raises
            raise last  # type: ignore[misc]
        if len(out) != len(texts):
            raise ValueError(
                f"embedding endpoint returned {len(out)} vectors for {len(texts)} texts"
            )
        for v in out:
            if len(v) != self.dim:
                raise ValueError(
                    f"embedding endpoint returned dim {len(v)}, expected {self.dim}"
                )
        return [[float(x) for x in v] for v in out]

    def embed_text(self, text: str) -> list[float]:
        """Driver-side single-query embedding (embed once, inline as a
        literal — same contract as the module-level embed_text)."""
        return self._call([text])[0]

    def embed_udf(self):
        """Arrow-batched pandas UDF over the endpoint, re-chunked to
        ``batch_size`` so Arrow batch sizing never dictates request
        sizing. Null text embeds as the empty string (the endpoint
        decides its meaning) — never crashes the backfill."""
        call, bs = self._call, self.batch_size

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in it:
                texts = [(t if t is not None else "") for t in s]
                vecs: list[list[float]] = []
                for i in range(0, len(texts), bs):
                    vecs.extend(call(texts[i : i + bs]))
                yield pd.Series(vecs)

        return _embed
