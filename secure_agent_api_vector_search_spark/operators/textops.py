"""Corpus text-analysis operators ([EXT], SURVEY.md §2.10): token
statistics, quality scoring, language-ID evaluation, fingerprints.

All pure DataFrame plans over documents — one scan, optional one
aggregate shuffle; every expression JVM-native (functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.functions import text as X


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-document token statistics: (doc_id, n_tokens,
    n_distinct_tokens, mean_token_len)."""
    return documents.select(
        "doc_id",
        X.token_count("text").cast("long").alias("n_tokens"),
        X.distinct_token_count("text").cast("long").alias("n_distinct_tokens"),
        X.mean_token_length("text").alias("mean_token_len"),
    ).orderBy("doc_id")


def corpus_token_totals(documents: DataFrame) -> DataFrame:
    """One-row corpus summary: exact doc/token/vocab counts.
    Distinct-vocabulary is an explode + distinct count — at 100 TB
    swap in approx_count_distinct for the same plan minus the exact
    distinct shuffle."""
    per_doc = documents.select(F.explode(X.tokens("text")).alias("tok"))
    return documents.agg(
        F.count("*").alias("n_docs"),
        F.sum(X.token_count("text")).alias("total_tokens"),
    ).crossJoin(per_doc.agg(F.count_distinct("tok").alias("distinct_tokens")))


def doc_quality(documents: DataFrame) -> DataFrame:
    """Per-document quality metrics: (doc_id, n_tokens, stop_ratio,
    quality) — rational arithmetic only, oracle-mirrorable."""
    return documents.select(
        "doc_id",
        X.token_count("text").cast("long").alias("n_tokens"),
        X.stopword_ratio("text").alias("stop_ratio"),
        X.quality_score("text").alias("quality"),
    ).orderBy("doc_id")


def lang_profile(documents: DataFrame) -> DataFrame:
    """Per-language corpus profile with exact int-sum averages."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
            (F.sum(X.token_count("text")).cast("double") / F.count("*")).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def lang_id_eval(documents: DataFrame) -> DataFrame:
    """Confusion summary of the marker-based language-ID heuristic vs
    the labeled `lang` column: (lang, guess, n)."""
    return (
        documents.select("lang", X.lang_id_guess("text").alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "guess")
    )


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Per-document content fingerprints: exact md5, normalized md5,
    bag-of-tokens md5 (all oracle-mirrorable)."""
    return documents.select(
        "doc_id",
        X.exact_fingerprint("text").alias("fp_exact"),
        F.md5(X.normalized_text("text")).alias("fp_normalized"),
        X.bag_fingerprint("text").alias("fp_bag"),
    ).orderBy("doc_id")


def doc_winnow_fingerprints(documents: DataFrame, window: int = 8) -> DataFrame:
    """Winnowing fingerprints (rolling-hash min-sampling) — Spark-only
    (xxhash64), rows-only correctness check.

    The raw fingerprint is `array<bigint>`; external row-hash gates
    can't canonicalize list cells, so the projection digests it to a
    scalar md5 plus the fingerprint cardinality. Callers that need the
    raw array use functions.text.rolling_hash_fingerprint directly.
    """
    fp = X.rolling_hash_fingerprint("text", window)
    return documents.select(
        "doc_id",
        F.md5(F.array_join(fp.cast("array<string>"), ",")).alias("fp_winnow"),
        F.size(fp).cast("long").alias("n_fingerprints"),
    ).orderBy("doc_id")
