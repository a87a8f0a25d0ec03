"""Training-sequence packing ([EXT], SURVEY.md §2.10): assign documents
to fixed-token-budget training sequences — the step between curation
and tokenized-shard export in an LLM data pipeline.

Semantics: greedy next-fit packing in deterministic (hash-bucket,
doc_id) order. Documents at or above the budget become singleton
sequences (real pipelines chunk them downstream; the assignment layer
must still account for every document exactly once — nothing is
dropped).

Scale shape: the packing state is inherently sequential, so it is
SHARDED, not serialized — documents hash into ``n_buckets`` independent
packing groups (`pmod(xxhash64(doc_id))`), each group packed by one
applyInPandas task. Only (doc_id, n_tokens, bucket) ever shuffles —
ids and counts, never text — so the exchange is ~16 bytes/doc at any
corpus size; raise ``n_buckets`` with the corpus to keep each group
driver-of-one-task sized. Sequence ids are globally unique without
coordination: ``bucket · 2^33 + local_index``.

Packing efficiency: next-fit within a hash bucket wastes at most one
document per sequence boundary; the fill-ratio floor is asserted in
tests (corpus mean doc length ≪ budget ⇒ fill ≥ ~75% in practice,
while first-fit-decreasing would need a global sort for ~2-3% more
fill — the wrong trade at 100 TB).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.functions import text as X

_SEQ_STRIDE = 1 << 33


def _pack_bucket(pdf: pd.DataFrame, max_tokens: int) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id", kind="stable").reset_index(drop=True)
    bucket = int(pdf["bucket"].iloc[0])
    seq_local = 0
    used = 0
    in_seq = 0  # docs in the open sequence — NOT derivable from `used`:
    # zero-token docs occupy a sequence without consuming budget, and the
    # overflow exception must apply only to a genuinely empty sequence
    # (a singleton overflow), never to one already holding members
    seq_ids = []
    for n in pdf["n_tokens"]:
        n = int(n)
        if in_seq > 0 and used + n > max_tokens:
            seq_local += 1
            used = 0
            in_seq = 0
        seq_ids.append(bucket * _SEQ_STRIDE + seq_local)
        used += n
        in_seq += 1
        if used >= max_tokens:
            seq_local += 1
            used = 0
            in_seq = 0
    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_tokens": pdf["n_tokens"].astype("int64"),
            "bucket": pdf["bucket"].astype("int32"),
            "seq_id": pd.Series(seq_ids, dtype="int64"),
        }
    )
    out["pos_in_seq"] = out.groupby("seq_id").cumcount().astype("int64")
    return out


def pack_sequences(
    documents: DataFrame,
    max_tokens: int = 2048,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_expr=None,
) -> DataFrame:
    """Assign every document to a training sequence of at most
    ``max_tokens`` whitespace tokens (oversized docs become singleton
    sequences). Output: (doc_id, n_tokens, bucket, seq_id, pos_in_seq),
    one row per input document, deterministic in the inputs.

    ``bucket_expr`` overrides the shard key (default
    ``pmod(xxhash64(id), n_buckets)``); the oracle-checked catalog form
    passes ``pmod(id, n_buckets)`` so DuckDB can replay the exact
    packing with a recursive CTE.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    counted = documents.select(
        F.col(id_col).alias("doc_id"),
        X.token_count(text_col).cast("long").alias("n_tokens"),
        bucket_expr.cast("int").alias("bucket"),
    )
    return counted.groupBy("bucket").applyInPandas(
        lambda pdf: _pack_bucket(pdf, max_tokens),
        "doc_id long, n_tokens long, bucket int, seq_id long, pos_in_seq long",
    )


def sequence_stats(assignments: DataFrame, max_tokens: int = 2048) -> DataFrame:
    """Per-corpus packing summary: sequence count, mean fill ratio, and
    the overflow count (singleton sequences carrying an oversized doc).
    One groupBy on seq_id, then a single-row aggregate."""
    per_seq = assignments.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens"),
        F.count("*").alias("n_docs"),
    )
    return per_seq.agg(
        F.count("*").alias("n_sequences"),
        F.sum("n_docs").alias("n_docs"),
        F.avg(
            F.least(F.col("seq_tokens"), F.lit(max_tokens)).cast("double")
            / F.lit(float(max_tokens))
        ).alias("mean_fill"),
        F.sum(
            ((F.col("seq_tokens") > max_tokens) & (F.col("n_docs") == 1)).cast("long")
        ).alias("n_overflow"),
    )
