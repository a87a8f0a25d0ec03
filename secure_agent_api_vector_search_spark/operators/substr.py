"""Exact duplicated-substring (span-level) deduplication — the
ExactSubstr operator family of Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" (arXiv:2107.06499),
re-expressed Spark-first.

[EXT] operators (SURVEY.md §2.10): the reference has no dedup at all
(its corpus is 50 curated seed rows, sql/03_seed_data.sql:2-51); this
family is a first-class training-data-pipeline component. It is
distinct from the Gopher fraction statistic (textops.duplicate_ngram_
stats): that reports WHAT SHARE of a document's grams are duplicated;
this one reports WHERE — maximal merged token spans — and can strip
them, which is the op an actual pretraining pipeline runs.

Semantics: a word k-gram is *duplicated* when it occurs in >= min_docs
DISTINCT documents. Every token covered by a duplicated-gram
occurrence is a duplicated token; overlapping/adjacent occurrence
windows merge into maximal spans (gaps-and-islands). Lee et al. find
such spans with a corpus-wide suffix array; a distributed suffix array
is the wrong tool on Spark — the same span set falls out of a
rolling-window hash join, which is shuffle-bounded and skew-safe:

Scale shape (the whole point):
- Gram strings NEVER shuffle. The scan projection reduces each gram to
  its hash (``hash_bits=64`` → xxhash64, 24-byte exchange rows) so no
  exchange ever carries text. At 64-bit a corpus-scale collision can
  merge two gram identities and at worst widen a span by one window;
  the sf-gate oracle groups by the gram STRING itself, so any
  collision at gate scale would fail the hash-match. When exactness
  is contractual at 100 TB, ``hash_bits=128`` shuffles the full md5
  digest (16-byte binary identity, ~n^2/2^129 collision probability)
  — same plan shape, 8 more bytes per row; the 64/128 agreement and
  the collision failure mode itself are pinned in tests/test_substr.py.
- Doc frequency is a two-phase ``count_distinct(doc_id) GROUP BY gh``
  aggregate: partial map-side dedup absorbs boilerplate stop-grams
  (the hot keys) BEFORE the exchange. A window over gh was measured
  and rejected for this: one mega-gram = one unsplittable sort task,
  whereas the aggregate is combiner-safe and the subsequent join is
  AQE-skew-splittable (or a broadcast, when the duplicated-gram set
  fits).
- Span merge is a per-document window (lag + running sum) — partition
  width is bounded by document length, never corpus size.

Shuffles total: one gh aggregate, one gh join (broadcast when small),
one doc_id window. No driver collects, no text in any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ws(text_col: str):
    """House tokenizer: whitespace-normalized split (textops.py:191)."""
    return F.split(F.regexp_replace(F.trim(F.col(text_col)), " +", " "), " ")


def _gram_hash(gram, hash_bits: int):
    """Reduce a gram string to its shuffle identity. 64 = xxhash64
    (8-byte rows — the default; a corpus-scale collision can merge two
    gram identities and at worst widen a span by one window). 128 =
    the full md5 digest (16-byte identity, collision probability
    ~n^2/2^129 — for pipelines where span exactness is contractual).
    Module docstring has the trade-off."""
    if hash_bits == 64:
        return F.xxhash64(gram)
    if hash_bits == 128:
        return F.unhex(F.md5(gram))
    raise ValueError(f"hash_bits must be 64 or 128, got {hash_bits}")


def _dup_positions(
    documents: DataFrame,
    k: int,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 64,
) -> DataFrame:
    """(doc_id, pos, keeper) for every occurrence of a k-gram that
    appears in >= min_docs distinct documents. ``pos`` is the 0-based
    token index of the occurrence start; ``keeper`` is the smallest
    doc_id containing that gram (the canonical copy strip_dup_spans
    preserves)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")
    ws = _ws(text_col)
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws"),
        F.greatest(F.size(ws) - (k - 1), F.lit(0)).alias("n_grams"),
    )
    # One row per gram occurrence, hashed in the same projection —
    # the gram string exists only inside this map stage.
    zipped = F.arrays_zip(
        *[F.slice(F.col("ws"), i + 1, F.col("n_grams").cast("int")) for i in range(k)]
    )
    grams = (
        base.filter(F.col("n_grams") > 0)
        .select("doc_id", F.posexplode(zipped).alias("pos", "g"))
        .select(
            "doc_id",
            "pos",
            _gram_hash(
                F.concat_ws(" ", *[F.col(f"g.{i}") for i in range(k)]), hash_bits
            ).alias("gh"),
        )
    )
    dup = (
        grams.groupBy("gh")
        .agg(
            F.count_distinct("doc_id").alias("nd"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("nd") >= min_docs)
        .select("gh", "keeper")
    )
    return grams.join(dup, "gh").select("doc_id", "pos", "keeper")


def _merge_islands(hits: DataFrame, k: int) -> DataFrame:
    """Merge occurrence windows [pos, pos+k-1] into maximal spans.
    Adjacent windows (next start == prev start + k) merge too: they
    cover one contiguous duplicated region. All windows share length
    k, so the running max end is lag(pos)+k-1 and a new island starts
    exactly when pos - lag(pos) > k."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull() | (F.col("pos") - F.lag("pos").over(w) > k),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        hits.withColumn("brk", brk)
        .withColumn("island", F.sum("brk").over(w))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + k).cast("long").alias("span_tokens"),
            F.count("*").cast("long").alias("n_grams"),
        )
        .drop("island")
    )


def duplicated_spans(
    documents: DataFrame,
    k: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 64,
) -> DataFrame:
    """Maximal cross-document duplicated token spans: one row per
    (doc_id, span), columns (doc_id, span_start, span_end, span_tokens,
    n_grams). span bounds are 0-based inclusive token indexes; n_grams
    is the number of duplicated k-gram occurrences the span merged.
    ``hash_bits`` picks the gram shuffle identity (see
    :func:`_gram_hash`).

    Output is per-span and UNORDERED (no presentation sort — the
    driver compare is order-insensitive; see textops.py module note).
    """
    hits = _dup_positions(documents, k, min_docs, id_col, text_col, hash_bits)
    return _merge_islands(hits.select("doc_id", "pos"), k)


def exact_substring_stats(
    documents: DataFrame,
    k: int = 5,
    min_docs: int = 2,
    max_frac: float = 0.30,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 64,
) -> DataFrame:
    """Per-document duplicated-substring exposure: (doc_id, n_tokens,
    n_spans, dup_tokens, dup_token_frac, keep). Every document appears
    (zero spans => zeros, keep=true); ``keep`` applies the curation
    threshold ``dup_token_frac <= max_frac`` — the document-drop form
    of ExactSubstr dedup (Lee et al. §4.1 cut documents by duplicate
    coverage)."""
    spans = duplicated_spans(documents, k, min_docs, id_col, text_col, hash_bits)
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
    )
    dup_tokens = F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long")
    frac = F.when(
        F.col("n_tokens") > 0,
        dup_tokens.cast("double") / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.size(_ws(text_col)).cast("long").alias("n_tokens"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            dup_tokens.alias("dup_tokens"),
            frac.alias("dup_token_frac"),
            (frac <= max_frac).alias("keep"),
        )
    )


def strip_dup_spans(
    documents: DataFrame,
    k: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 64,
) -> DataFrame:
    """Remove duplicated spans, keeping the canonical copy where one
    cleanly exists: an occurrence is REDUNDANT iff its document is not
    the gram's keeper (smallest doc_id containing the gram); redundant
    occurrences' windows merge and their tokens drop. Returns the full
    corpus as (doc_id, text).

    Retention is PER-OCCURRENCE, not per-gram: when duplicated regions
    OVERLAP inside the keeper document (the keeper's copy of gram G
    sits inside a span that is redundant w.r.t. some other gram), the
    overlap is stripped there too and G's content can disappear from
    every document. This is deliberate — the alternative (protecting
    keeper-covered positions) would leave cross-document duplicates
    behind, and the operator's governing invariant is CONVERGENCE:
    stripping never leaves (or creates, seams aside) cross-doc
    duplication; content loss is bounded by the duplicated regions
    themselves, the same trade Lee et al.'s removal tool makes. The
    overlap semantics are pinned in tests (test_substr.py).

    Documents with nothing to strip pass through BIT-IDENTICAL
    (original text, original whitespace — same untouched-row invariant
    as the embedding-backfill merge, pipelines.py). Stripped documents
    are rebuilt from the normalized token stream with span tokens
    removed.

    Like Lee et al.'s released tool, removal can in principle create a
    NEW k-gram across a seam (tokens left + right of a removed span
    joining up); a second pass converges in practice (tested).

    The rebuild is a JVM higher-order-function pass (filter-with-index
    over the token array against the doc's own merged span list) —
    per-row work bounded by document length, spans carried as a
    collect_list per doc (span count per doc is small by
    construction: spans are maximal and disjoint)."""
    hits = _dup_positions(documents, k, min_docs, id_col, text_col, hash_bits)
    redundant = hits.filter(F.col("doc_id") != F.col("keeper")).select("doc_id", "pos")
    spans = (
        _merge_islands(redundant, k)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"), F.col("span_end").alias("e")
                )
            ).alias("spans")
        )
    )
    ws = _ws(text_col)
    in_span = lambda i: lambda sp: (i >= sp["s"]) & (i <= sp["e"])  # noqa: E731
    rebuilt = F.array_join(
        F.filter(ws, lambda t, i: ~F.exists("spans", in_span(i))), " "
    )
    return (
        documents.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("spans").isNull(), F.col("text"))
            .otherwise(rebuilt)
            .alias("text"),
        )
    )
