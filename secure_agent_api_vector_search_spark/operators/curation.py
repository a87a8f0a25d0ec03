"""Corpus-curation operators for the training-data pipeline ([EXT],
SURVEY.md §2.10): domain balancing, PII redaction, repetition filtering
(Gopher-style), and benchmark-contamination checks.

The reference (wkw8402/secure-agent-api-vector-search) has no curation
surface — its corpus is 50 hand-written rows (sql/03_seed_data.sql) —
but a 100 TB training-data pipeline runs exactly these passes between
ingest and tokenization. All plans are built-in DataFrame ops; the
expressions are chosen to be recomputable in ANSI SQL so every operator
is oracle-checked (tools/mini_driver.py / the driver's DuckDB gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.functions import text as X

# PII patterns — the subset of regex syntax with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): character classes, bounded
# repetition, word boundaries. No backreferences or lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def per_source_cap(
    documents: DataFrame, cap: int = 20, id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Domain balancing: keep at most ``cap`` documents per source,
    preferring longer documents (desc n_chars, id tie-break — a total
    order, so the kept set is deterministic on any engine).

    Scale shape: one hash-partition window per source. Source
    cardinality is high in web corpora (domains), so partitions stay
    narrow; a single mega-domain is exactly the case the cap bounds —
    the sort inside an over-cap partition is O(domain size), and AQE
    skew-split handles the shuffle side. No collect, no global sort
    (the final orderBy is presentation-only for the gate).
    """
    w = Window.partitionBy(source_col).orderBy(F.desc("n_chars"), id_col)
    return (
        documents.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select(id_col, source_col, "n_chars", F.col("rk").cast("long").alias("rk"))
        .orderBy(id_col)
    )


def pii_redact(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """PII scrubbing: count and redact emails, dashed phone numbers,
    and IPv4 literals. Replacement order is fixed (email → phone → ip)
    and the patterns are mutually non-overlapping by construction, so
    counts are stable under the rewrite.

    One scan, zero shuffles (the trailing orderBy is gate
    presentation): regexp_count/regexp_replace are codegen'd JVM
    expressions — this runs at scan speed over 100 TB.
    """
    t = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return documents.select(
        id_col,
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        redacted.alias("redacted_text"),
    ).orderBy(id_col)


def doc_repetition(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition metrics per document: distinct-token
    ratio, most-frequent-unigram fraction, most-frequent-bigram
    fraction, and a repetition flag (Rae et al. 2021, "Scaling Language
    Models" §A1.1 — public thresholds: top unigram > 0.2 of tokens or
    distinct ratio < 0.5 marks boilerplate/spam).

    Scale shape: explode → two-level agg keyed by (doc, gram). The
    first groupBy partial-aggregates map-side (same doc+gram pairs
    collapse before the shuffle), the second is keyed by doc alone —
    both AQE-coalesced. No per-row O(n²) array scans: for long
    documents the explode form beats aggregate-over-array quadratics.
    """
    toks = documents.select(id_col, F.explode(X.tokens("text")).alias("tok"))
    uni = (
        toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_uni"),
        )
    )
    bigrams = documents.select(
        id_col, F.explode(X.token_shingles("text", 2)).alias("g")
    )
    big = (
        bigrams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_big"))
    )
    d = F.col("n_distinct").cast("double") / F.col("n_tokens")
    fu = F.col("top_uni").cast("double") / F.col("n_tokens")
    fb = F.col("top_big").cast("double") / F.col("n_bigrams")
    return (
        uni.join(big, id_col)
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            d.alias("distinct_ratio"),
            fu.alias("top_unigram_frac"),
            fb.alias("top_bigram_frac"),
            ((fu > 0.2) | (d < 0.5)).alias("is_repetitive"),
        )
        .orderBy(id_col)
    )


def contamination_check(
    documents: DataFrame,
    eval_max_id: int = 20,
    n: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination scan: for each training document, the
    count and fraction of its token ``n``-grams that also occur in the
    eval split (docs with id < ``eval_max_id``) — the standard
    train/test n-gram-overlap decontamination pass (e.g. GPT-3 appendix
    C: 13-gram overlap; ``n`` is sized to this corpus's short docs).

    Scale shape: the eval side is a benchmark — thousands of rows
    against a 100 TB training corpus — so its distinct gram set is
    BROADCAST and the probe is a map-side hash semi-join on the
    training scan: no shuffle of training grams. The two training-side
    aggs are keyed by doc_id (partial agg map-side).
    """
    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            id_col,
            F.explode(F.array_distinct(X.token_shingles("text", n))).alias("g"),
        )

    train = documents.filter(F.col(id_col) >= eval_max_id)
    eval_grams = (
        documents.filter(F.col(id_col) < eval_max_id)
        .transform(grams)
        .select("g")
        .distinct()
    )
    tg = grams(train)
    totals = tg.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (
        tg.join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        totals.join(hits, id_col)
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_hit").cast("long").alias("n_hit"),
            (F.col("n_hit").cast("double") / F.col("n_grams")).alias("hit_frac"),
        )
        .orderBy(id_col)
    )
