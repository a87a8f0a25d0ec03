"""Text-analysis column expressions for the LLM-data-pipeline surface.

These are [EXT] operators (SURVEY.md §2.10): the reference stores long
text (`abstract VARCHAR(300000)`, sql/02_schema.sql:8) but delegates all
text processing to the embedding model; a training-data pipeline needs
tokenization, quality scoring, language ID, and fingerprints natively.

All expressions are built-in `pyspark.sql.functions` compositions —
JVM-side, codegen-able, no UDFs — so they run at scan speed over 100 TB.
Where the DuckDB oracle mirrors them, the construction is chosen to be
expressible in both engines (single-space split, md5 fingerprints,
rational-only arithmetic — no libm transcendentals whose low bits could
differ across platforms).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword/marker lists (public common-word lists).
STOPWORDS = {
    "en": ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"],
    "es": ["el", "la", "los", "las", "de", "y", "que", "en", "un", "una"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "zh": ["de", "shi", "bu", "le", "ren", "wo", "zai", "you", "ta", "zhe"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _windows(n: Column, body, elem_type: str = "string") -> Column:
    """transform(sequence(1, n), body) with an empty-array guard:
    Spark's sequence(1, 0) counts DOWN to [1, 0] (step defaults to −1
    when start > stop), which would fabricate windows for inputs shorter
    than the window — the guard returns [] instead."""
    return F.when(
        n >= 1, F.transform(F.sequence(F.lit(1), n), body)
    ).otherwise(F.array().cast(f"array<{elem_type}>"))


def tokens(text: Column | str) -> Column:
    """Whitespace tokens. Single-space split so the DuckDB oracle's
    literal `string_split(text, ' ')` is identical."""
    return F.split(_c(text), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def mean_token_length(text: Column | str) -> Column:
    """Σ len(token) / n_tokens as float64 (exact int sum, then one
    deterministic division).

    Computed by identity, not a fold: splitting on the single-space
    delimiter partitions the string into n tokens and n-1 separators,
    so Σ len(token) = len(text) - (n - 1) exactly (empty tokens
    included, same as the split). The aggregate/transform HOF form this
    replaces evaluates INTERPRETED per token (no codegen — measured 5×
    slower on the compute at sf0.1×20); the identity is three codegen
    ops per row and bit-identical (int arithmetic, same division)."""
    t = _c(text)
    n = F.size(tokens(text))
    return (F.length(t) - (n - F.lit(1))).cast("double") / n


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    """Count of tokens that are stopwords of ``lang`` (lowercased)."""
    stops = STOPWORDS[lang]
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    return F.size(F.filter(toks, lambda t: t.isin(*stops)))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    return stopword_hits(text, lang).cast("double") / token_count(text)


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1].

    Rational arithmetic only (no exp/log) so the oracle SQL computes the
    bit-identical value: mean of (a) stopword ratio — fluent text has
    function words — and (b) a length factor saturating at 100 tokens.
    """
    ratio = stopword_ratio(text)
    length_factor = F.least(token_count(text), F.lit(100)).cast("double") / F.lit(100.0)
    return (ratio + length_factor) / F.lit(2.0)


def lang_id_guess(text: Column | str) -> Column:
    """Marker-word language ID with a deterministic decision cascade.

    The cascade (es → de → fr → en default) is mirrored verbatim in the
    oracle SQL; ties fall through to English. A production pipeline
    would use character-n-gram profiles — same plan shape, bigger
    marker tables (kept this small so the oracle stays readable).
    """
    h = {lang: stopword_hits(text, lang) for lang in ("en", "es", "de", "fr")}
    return (
        F.when((h["es"] > h["en"]) & (h["es"] >= h["de"]) & (h["es"] >= h["fr"]), "es")
        .when((h["de"] > h["en"]) & (h["de"] >= h["fr"]), "de")
        .when(h["fr"] > h["en"], "fr")
        .otherwise("en")
    )


def normalized_text(text: Column | str) -> Column:
    """Canonical form for near-exact dedup: lowercase, strip
    non-alphanumerics, collapse whitespace, trim."""
    t = F.lower(_c(text))
    t = F.regexp_replace(t, "[^a-z0-9 ]", "")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def bag_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted set of
    tokens. Two documents with the same vocabulary (any order /
    multiplicity) collide — the cheap first stage of near-dup detection."""
    toks = F.array_sort(F.array_distinct(tokens(text)))
    return F.md5(F.array_join(toks, " "))


def exact_fingerprint(text: Column | str) -> Column:
    """Exact-dup key: md5 of the raw text."""
    return F.md5(_c(text))


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Character k-shingles (sliding window) for MinHash/Jaccard.

    Built with sequence+transform+substring — pure Catalyst expressions,
    no UDF: shingle_i = substring(text, i, k) for i in 1..len-k+1.
    """
    t = _c(text)
    n = F.length(t) - F.lit(k - 1)
    return _windows(n, lambda i: t.substr(i, F.lit(k)))


def token_shingles(text: Column | str, k: int = 3) -> Column:
    """Token k-shingles (w_i … w_{i+k-1} joined by space)."""
    toks = tokens(text)
    n = F.size(toks) - F.lit(k - 1)
    return _windows(n, lambda i: F.array_join(F.slice(toks, i, k), " "))


def md5_hash48(t: Column) -> Column:
    """48-bit token hash with a cross-engine twin: the first 12 hex
    chars of md5 parsed as an integer — DuckDB computes the identical
    value as `('0x' || substr(md5(t), 1, 12))::BIGINT`, so operators
    built on it stay oracle-checkable (unlike xxhash64, which no other
    engine implements). 48 bits fit a signed int64 on both sides."""
    return F.conv(F.substring(F.md5(F.encode(t, "utf-8")), 1, 12), 16, 10).cast("long")


def rolling_hash_fingerprint(text: Column | str, window: int = 8) -> Column:
    """Winnowing-style document fingerprint (Schleimer et al.'s
    min-sampling): hash each token, take the min hash per sliding
    window of ``window`` tokens, distinct-sort the mins. Token hash is
    :func:`md5_hash48`, so the whole fingerprint — including the
    window mins — is recomputable in DuckDB and oracle-checked.
    """
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: md5_hash48(t))
    n = F.size(hashes) - F.lit(window - 1)
    mins = _windows(n, lambda i: F.array_min(F.slice(hashes, i, window)), "bigint")
    return F.array_sort(F.array_distinct(mins))
