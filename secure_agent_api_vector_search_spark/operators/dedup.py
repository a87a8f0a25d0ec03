"""Deduplication operators — exact, near (MinHash-LSH / SimHash /
n-gram Jaccard), and semantic (embedding cosine).

[EXT] operators (SURVEY.md §2.10): first-class components of a
training-data pipeline. The reference has no dedup; its seed corpus is
50 curated rows (sql/03_seed_data.sql:2-51).

Scale shapes (the whole point of each design):
- exact:      one hash-groupBy shuffle keyed by md5(text) — never a
              text-to-text comparison.
- minhash:    signatures are a map stage (native xxhash64 expressions);
              LSH banding turns all-pairs into a band-hash equi-join —
              candidates ∝ collisions, verification only on candidates.
- simhash:    64-bit fingerprint map stage; candidates via banding the
              fingerprint into 4×16-bit chunks (any chunk equal →
              candidate, catches Hamming ≤ 3 guaranteed when distance
              < chunks), verify popcount.
- embedding:  LSH over random hyperplanes or (here, with a labeled
              corpus) block-join within blocks; never n².
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from secure_agent_api_vector_search_spark.functions import hashing as H
from secure_agent_api_vector_search_spark.functions import text as X
from secure_agent_api_vector_search_spark.functions import vector as V


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per exact-text group. Returns the kept rows.

    groupBy on a fixed-width hash (not the text itself) keeps shuffle
    rows small; `min(id)` is the deterministic keeper policy.
    """
    keepers = (
        df.select(F.col(id_col), X.exact_fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keepers, id_col, "left_semi")


def dedup_groups_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups (size > 1): (fingerprint, keeper_id, n_dups)."""
    return (
        df.select(X.exact_fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_groups_normalized(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-exact dedup on the normalized text (case/punct/ws-folded)."""
    return (
        df.select(F.md5(X.normalized_text(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def _shingle_sig_udf(shingle_k: int, num_hashes: int, seed: int):
    """text → struct(shingles array<bigint>, signature array<bigint>).

    Byte-k-shingles packed directly into int64 (k ≤ 8 bytes — the
    shingle IS its own hash, no string materialization at all), then
    the MinHash signature via the affine family (a_i·h + b_i) mod p —
    one numpy outer-product per document, vectorized per Arrow batch.
    """
    assert shingle_k <= 8, "byte shingles pack into int64 only for k ≤ 8"
    rng = np.random.default_rng(seed)
    a = rng.integers(1, H.MINHASH_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, H.MINHASH_P, size=num_hashes, dtype=np.int64)

    @F.pandas_udf("struct<shingles: array<bigint>, signature: array<bigint>>")
    def f(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in it:
            # Whole-batch vectorization: one concatenated byte buffer, one
            # sliding-window pack, one lexsort dedup, 64 segmented mins —
            # no per-document numpy dispatch (which dominated at ~1.5 ms
            # per doc in the row-loop form).
            texts = [(t or "").encode("utf-8") for t in s]
            n_docs = len(texts)
            lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
            nwin = np.maximum(lens - shingle_k + 1, 0)
            sh_out: list = [None] * n_docs
            sig_out: list = [None] * n_docs
            total = int(nwin.sum())
            if total > 0:
                buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
                w = np.lib.stride_tricks.sliding_window_view(buf, shingle_k)
                x = np.zeros(len(w), dtype=np.int64)
                for i in range(shingle_k):
                    x = (x << 8) | w[:, i].astype(np.int64)
                starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
                # global buffer position of every in-document window
                pos = np.repeat(starts, nwin) + (
                    np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(nwin)))[:-1], nwin)
                )
                doc_of = np.repeat(np.arange(n_docs), nwin)
                sh_all = x[pos]
                order = np.lexsort((sh_all, doc_of))
                d_s, v_s = doc_of[order], sh_all[order]
                keep = np.ones(total, dtype=bool)
                keep[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
                d_u, v_u = d_s[keep], v_s[keep]
                seg_starts = np.concatenate(
                    ([0], np.nonzero(d_u[1:] != d_u[:-1])[0] + 1)
                )
                hs = v_u % H.MINHASH_P
                sig = np.empty((len(seg_starts), num_hashes), dtype=np.int64)
                for j in range(num_hashes):
                    sig[:, j] = np.minimum.reduceat((hs * a[j] + b[j]) % H.MINHASH_P, seg_starts)
                bounds = np.append(seg_starts[1:], len(v_u))
                seg_docs = d_u[seg_starts]
                for si, d in enumerate(seg_docs):
                    sh_out[d] = v_u[seg_starts[si]:bounds[si]]
                    sig_out[d] = sig[si]
            yield pd.DataFrame({"shingles": sh_out, "signature": sig_out})

    return f


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hashes: int = 64,
    num_bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by MinHash-LSH with exact-Jaccard verify.

    Pipeline: byte-k-shingles + 64-value MinHash signature in one
    vectorized Arrow-batched map stage (no shuffle) → 16 bands × 4 rows
    banding → equi-join on band hash → signature-agreement screen →
    exact Jaccard (long-array set ops) on the survivors.
    Output: (id_a, id_b, jaccard) with jaccard ≥ threshold.
    """
    from pyspark import StorageLevel

    rows_per_band = num_hashes // num_bands
    # small local inputs arrive as 1-2 splits; spread the heavy map
    # stage across the cluster. At scale the scan has many splits and
    # this is a cheap balanced exchange.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    feats = (
        df.repartition(n_part, F.col(id_col))
        .select(F.col(id_col), _shingle_sig_udf(shingle_k, num_hashes, seed)(F.col(text_col)).alias("_f"))
        .select(id_col, F.col("_f.shingles").alias("shingles"), F.col("_f.signature").alias("signature"))
        .filter(F.col("shingles").isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # materialize before fan-out: the banding self-join and the
    # two-sided verify joins all consume `feats`; computed concurrently
    # inside one job they race cache population and each re-runs the
    # scan→shingle→signature lineage. One eager pass fills the cache.
    feats.count()
    banded = feats.select(
        id_col, H.lsh_bands(F.col("signature"), num_bands, rows_per_band).alias("bands")
    )
    candidates = H.candidate_pairs_from_bands(banded, id_col, "bands").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # materialize the candidate set before the screen/verify join chain:
    # the explode→self-join→distinct lineage has wildly inflated size
    # estimates, so the fused plan shuffles defensively; with the real
    # (much smaller) candidate count known, the 4-join verify chain
    # plans ~2x faster (measured 10s saved at sf0.1, both cold and warm)
    candidates.count()
    # two-stage verify. Banding at (16 bands × 4 rows) lets J≈0.2 pairs
    # through at the percent level, which on a corpus with repeated
    # boilerplate is 100× more candidates than true pairs. Stage 1
    # estimates Jaccard from signature agreement (64 long equalities —
    # an unbiased Bin(k, J)/k estimator) and drops candidates more than
    # 3σ below the threshold; stage 2 computes exact Jaccard on the
    # survivors only, so the set intersection touches ~|true pairs|
    # rows, not ~|collisions|.
    margin = 3.0 * math.sqrt(0.25 / num_hashes)
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    # the screen joins ship ONLY signatures (64 longs ≈ 0.5 KB/side);
    # shingle arrays (~4× larger) are joined in afterwards for the
    # screen survivors only — ~3× fewer verify-shuffle bytes than one
    # merged (signature, shingles) join, measured at parity locally
    # where candidate counts are small and join overhead dominates.
    sig_a = feats.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sig_b = feats.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    screened = (
        candidates.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .filter(est >= threshold - margin)
        .select("id_a", "id_b")
    )
    sh_a = feats.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = feats.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    pairs = (
        screened.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", H.jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs.orderBy("id_a", "id_b")


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash (bit-array form).

    Candidates: pack the fingerprint into 4 16-bit chunks and equi-join
    on any equal chunk — by pigeonhole, every pair with Hamming ≤ 3
    shares at least one chunk. Verify with exact Hamming distance.
    Output: (id_a, id_b, hamming).
    """
    from pyspark import StorageLevel

    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = F.transform(X.tokens(text_col), lambda t: F.lower(t))
    # repartition: local small scans arrive as 1-2 splits and the bit
    # aggregation is the heavy map stage; persist + eager count: the
    # fingerprints feed the band join AND both verify sides (see
    # minhash_near_dup_pairs for the race rationale).
    sh = (
        df.repartition(n_part, F.col(id_col))
        .select(F.col(id_col), H.simhash_bits(toks).alias("bits"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sh.count()
    banded = sh.select(id_col, H.simhash_chunks(F.col("bits")).alias("bands"))
    cand = H.candidate_pairs_from_bands(banded, id_col, "bands").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # materialize before the verify joins — same rationale as
    # minhash_near_dup_pairs: real candidate count beats the inflated
    # explode→self-join→distinct estimate the planner sees otherwise
    cand.count()
    bits = sh.select(F.col(id_col), F.col("bits"))
    return (
        cand.join(bits.withColumnRenamed(id_col, "id_a").withColumnRenamed("bits", "bits_a"), "id_a")
        .join(bits.withColumnRenamed(id_col, "id_b").withColumnRenamed("bits", "bits_b"), "id_b")
        .select("id_a", "id_b", H.hamming_bits(F.col("bits_a"), F.col("bits_b")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    block_col: str | None = None,
) -> DataFrame:
    """Exact token-n-gram Jaccard similarity pairs, optionally blocked.

    Without a block column this is all-pairs — only for small frames or
    as the verify stage after LSH. With ``block_col`` (e.g. a coarse
    cluster/source/language), the join is per-block.
    """
    grams = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.array_distinct(X.token_shingles(text_col, n)).alias("grams"),
    ).filter(F.size("grams") > 0)
    a, b = grams.alias("a"), grams.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            H.jaccard(F.col("a.grams"), F.col("b.grams")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Semantic near-dup pairs: cosine ≥ threshold.

    With ``block_col`` the join is blocked (per label/cluster); the
    unblocked scale path is :func:`embedding_neardup_pairs_lsh`.
    Output: (id_a, id_b, cosine).
    """
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col),
        *([F.col(block_col)] if block_col else []),
    )
    a, b = e.alias("a"), e.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    sim = V.cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def lsh_tables_for(threshold: float, num_planes: int, target_recall: float = 0.95) -> int:
    """Number of hash tables so a pair at exactly ``threshold`` cosine is
    recalled with probability ≥ ``target_recall``.

    Sign-LSH collision probability per plane is s = 1 − θ/π
    (Goemans–Williamson); a table of r planes matches with s^r, and b
    independent tables recall 1 − (1−s^r)^b. Solving for b makes the
    operator honest about its regime: high thresholds (≥0.8) need a few
    dozen tables; moderate ones (≤0.5) would need hundreds — at that
    point use the exact blocked path or an IVF-blocked join instead.
    """
    s = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_table = s**num_planes
    if p_table >= 1.0:
        return 1
    b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_table))
    return max(1, min(b, 256))


def embedding_neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    num_tables: int | None = None,
    target_recall: float = 0.95,
    seed: int = 42,
) -> DataFrame:
    """Scale path: random-hyperplane LSH bucketing, then exact cosine
    verify on bucket-colliding pairs only.

    ``num_tables`` defaults to the count that achieves ``target_recall``
    at the given threshold (:func:`lsh_tables_for`). A pair is a
    candidate if all ``num_planes`` signs match in ANY table; precision
    is 1.0 by construction (exact verify), recall is the tunable.

    The sketch stage is a vectorized Arrow-batched pandas UDF — one
    (batch × dim) @ (dim × tables·planes) matmul per Arrow batch. The
    expression-per-plane alternative builds a tables·planes-subexpression
    plan that overflows whole-stage codegen and runs interpreted; a
    single BLAS matmul is the 100 TB shape (map-only, no shuffle).
    The bucket join is the only shuffle.
    """
    if num_tables is None:
        num_tables = lsh_tables_for(threshold, num_planes, target_recall)
    dim = len(embeddings.select(vec_col).head()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables * num_planes, dim))
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sketch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            m = np.vstack(s.to_numpy())                       # n × dim
            signs = (m @ planes.T) >= 0.0                     # n × (b·r)
            hashes = signs.reshape(len(m), num_tables, num_planes) @ weights
            yield pd.Series(list(hashes))

    vec = F.col(vec_col).cast("array<double>")
    with_buckets = embeddings.select(
        F.col(id_col), vec.alias(vec_col), sketch(vec).alias("_sk")
    ).select(
        id_col, vec_col,
        F.transform(
            F.col("_sk"),
            lambda h, i: F.struct(i.alias("band_id"), h.alias("band_hash")),
        ).alias("bands"),
    )
    from pyspark import StorageLevel

    cand = H.candidate_pairs_from_bands(
        with_buckets.select(id_col, "bands"), id_col, "bands"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # materialize before the verify joins — same rationale as
    # minhash_near_dup_pairs: real candidate count beats the inflated
    # explode→self-join→distinct estimate the planner sees otherwise
    cand.count()
    e = with_buckets.select(F.col(id_col), F.col(vec_col))
    pairs = (
        cand.join(e.withColumnRenamed(id_col, "id_a").withColumnRenamed(vec_col, "v_a"), "id_a")
        .join(e.withColumnRenamed(id_col, "id_b").withColumnRenamed(vec_col, "v_b"), "id_b")
        .select("id_a", "id_b", V.cosine_similarity(F.col("v_a"), F.col("v_b")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.orderBy("id_a", "id_b")
