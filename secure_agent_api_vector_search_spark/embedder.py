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
signatures; nothing else in the engine changes.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

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
