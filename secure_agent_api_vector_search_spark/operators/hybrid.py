"""Hybrid keyword + vector search ([EXT], SURVEY.md §2.10).

Fuses a lexical score (term occurrence count over the text) with the
cosine similarity of the document embedding to the query vector.
One broadcast-free equi-join documents↔embeddings on the id, scores
computed as native expressions, then a TakeOrderedAndProject top-k —
the same scan-bounded shape as the pure vector path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.functions import vector as V


def keyword_hits(text_col, term: str):
    """Occurrences of ``term`` in the text — (len(text) − len(text with
    term removed)) / len(term); exact integer, mirrored in the oracle."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return (F.length(t) - F.length(F.replace(t, F.lit(term), F.lit("")))) / F.lit(len(term))


def hybrid_search(
    documents: DataFrame,
    embeddings: DataFrame,
    term: str,
    query_vec: Sequence[float],
    k: int = 10,
    kw_weight: float = 0.1,
) -> DataFrame:
    """Top-k by fused score = kw_weight · keyword_hits + cosine.

    Output: (doc_id, kw_hits, similarity, score).
    """
    q = F.lit([float(x) for x in query_vec])
    joined = documents.join(embeddings, documents["doc_id"] == embeddings["vec_id"])
    sim = V.cosine_similarity(F.col("embedding").cast("array<double>"), q)
    hits = keyword_hits("text", term).cast("long")
    scored = joined.select(
        "doc_id",
        hits.alias("kw_hits"),
        sim.alias("similarity"),
        (hits.cast("double") * F.lit(float(kw_weight)) + sim).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
