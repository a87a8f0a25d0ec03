"""MinHash / SimHash signatures for near-duplicate detection.

[EXT] operators (SURVEY.md §2.10). Spark-first design: the MinHash
signature stage is a vectorized Arrow-batched pandas UDF — each shingle
is string-hashed ONCE (`pd.util.hash_array`, vectorized), then the k
MinHash values come from an affine universal-hash family
``(a_i·h + b_i) mod p`` as one numpy outer-product + column-min per
document. The whole signature is a **map stage with zero shuffle**.

Two slower shapes were measured and rejected: explode→groupBy with k
min-aggs (shuffles |docs|·|shingles| string rows and re-hashes every
string k times — 105 s at sf0.1) and a higher-order-function expression
tree (lambda expressions are evaluated interpreted, outside whole-stage
codegen, and projection collapse duplicates the hash array into every
consumer — slower still). The numpy batch shape runs the same work in
seconds and is exactly how the hyperplane-LSH sketch is built
(operators/dedup.py).

The LSH candidate stage is one groupBy shuffle on (band_id, band_hash)
(`bucket_member_pairs`): candidates ∝ collisions, never n², and pair
payloads (signatures / bits / vectors) ride in the bucket member
structs so verify metrics are computed map-side with zero joins.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 2^31 − 1 (Mersenne prime). a·h + b with a, b, h < p stays < 2^62, so
# the arithmetic can never overflow int64 (Spark 4 runs ANSI mode —
# overflow would raise, not wrap).
MINHASH_P = (1 << 31) - 1


def minhash_signatures(
    df: DataFrame, id_col: str, shingles_col: str, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """(id, array<string> shingles) → (id, signature array<bigint>).

    signature[i] = min over shingles of (a_i·hash(x) + b_i) mod p,
    computed per Arrow batch with numpy (deterministic: fixed seed for
    the affine params, pandas' fixed default hash key for the string
    hash). Rows with empty shingle sets get a null signature.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MINHASH_P, size=num_hashes, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            out = []
            for shingles in s:
                if shingles is None or len(shingles) == 0:
                    out.append(None)
                    continue
                hs = (
                    pd.util.hash_array(np.asarray(shingles, dtype=object))
                    % np.uint64(MINHASH_P)
                ).astype(np.int64)
                mat = (hs[:, None] * a[None, :] + b[None, :]) % MINHASH_P
                out.append(mat.min(axis=0))
            yield pd.Series(out)

    return df.select(F.col(id_col), sig(F.col(shingles_col)).alias("signature"))


def simhash_fp_chunks(fp: Column, num_chunks: int = 4, n_bits: int = 64) -> Column:
    """Packed-fingerprint banding: cut the BIGINT fingerprint into
    ``num_chunks`` bit-fields as (band_id, band_hash) structs (the
    pigeonhole candidate generator, same guarantee as
    :func:`simhash_chunks` on the array form)."""
    width = n_bits // num_chunks
    mask = F.lit((1 << width) - 1)
    return F.array(
        *[
            F.struct(
                F.lit(c).alias("band_id"),
                F.shiftrightunsigned(fp, c * width).bitwiseAND(mask).cast("long").alias("band_hash"),
            )
            for c in range(num_chunks)
        ]
    )


def hamming_fp(a: Column, b: Column) -> Column:
    """Hamming distance between two packed BIGINT fingerprints — one
    codegen'd `bit_count(a XOR b)`."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_chunks(bits: Column, num_chunks: int = 4) -> Column:
    """Pack the bit array into ``num_chunks`` integer chunks (for
    pigeonhole candidate generation: Hamming ≤ num_chunks−1 ⇒ at least
    one chunk identical)."""
    chunk_size = 64 // num_chunks
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_chunks - 1)),
        lambda c: F.struct(
            c.alias("band_id"),
            F.aggregate(
                F.slice(bits, c * chunk_size + 1, chunk_size),
                F.lit(0).cast("long"),
                lambda acc, b: acc * 2 + b,
            ).alias("band_hash"),
        ),
    )


def hamming_bits(a: Column, b: Column) -> Column:
    """Hamming distance between two bit arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)), F.lit(0), lambda acc, v: acc + v
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (as sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))


def bucket_member_pairs(
    df: DataFrame,
    id_col: str,
    bands_col: str,
    payload_cols: tuple[str, ...] = (),
    metric=None,
    keep=None,
    pair_keep=None,
    max_width: int = 512,
) -> DataFrame:
    """Candidate pairs by LSH-bucket grouping, with the verify metric
    computed INSIDE the bucket's pair array.

    (id, bands, *payload) → (id_a, id_b[, metric]) where a pair appears
    once per shared (band_id, band_hash) bucket — NOT deduped; callers
    aggregate `groupBy(id_a, id_b)` downstream.

    ``metric`` is a callable (member_a, member_b) → Column evaluated on
    the member structs (which hold ``payload_cols``) while pairs are
    still array elements; ``keep`` is a Column predicate on the metric
    applied BEFORE the explode, so rejected pairs never become rows and
    payload bytes never leave the bucket. Without ``metric`` the output
    is bare id pairs.

    ``pair_keep`` is a STRUCTURAL predicate (member_a, member_b) →
    boolean Column deciding whether a pair exists at all (e.g. "sides
    differ" for an A×B join over a tagged union). Unlike ``keep`` it
    applies to the star-pairing branch too — it defines the pair set,
    not a quality filter, so skipping it would emit pairs the caller's
    contract excludes.

    Scale shape (replaces the explode→self-join→distinct form, which
    cost two extra shuffles and fed the planner a wildly inflated
    estimate of the join output): one shuffle groups bucket members
    (`collect_list`), then in-bucket pairs + metric + filter are one
    pure map stage over the sorted member array.

    Buckets wider than ``max_width`` would emit O(w²) pairs (the skew
    failure mode at 100 TB: boilerplate text → one giant bucket); they
    degrade to star pairing against the bucket minimum — O(w) pairs
    bounding work linearly. Star pairs are emitted UNFILTERED (``keep``
    applies only to the all-pairs branch): in an over-wide bucket the
    keeper pairs are connectivity *candidates*, not verified results,
    and dropping those that fail the metric would disconnect true
    near-dup members whose only recorded path runs through the keeper.
    Callers must therefore apply their final metric filter downstream
    (cheap — star pairs are O(w) per wide bucket only). Width ≤ 512
    keeps a bucket's member array ≤ ~0.5 MB even with a 1 KB payload.
    """
    if keep is not None and metric is None:
        raise ValueError("keep requires metric")
    member = F.struct(F.col(id_col).alias("_id"), *[F.col(c) for c in payload_cols])
    buckets = (
        df.select(member.alias("m"), F.explode(F.col(bands_col)).alias("band"))
        .groupBy("band.band_id", "band.band_hash")
        .agg(F.array_sort(F.collect_list("m")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    ms, w = F.col("ms"), F.size("ms")

    def pair(i: Column, j: Column) -> Column:
        fields = [ms[i]["_id"].alias("id_a"), ms[j]["_id"].alias("id_b")]
        if pair_keep is not None:
            fields.append(pair_keep(ms[i], ms[j]).alias("_pk"))
        if metric is not None:
            fields.append(metric(ms[i], ms[j]).alias("metric"))
        return F.struct(*fields)

    def structural(arr_col: Column) -> Column:
        if pair_keep is None:
            return arr_col
        return F.filter(arr_col, lambda p: p["_pk"])

    all_pairs = structural(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), w - 2),
                lambda i: F.transform(F.sequence(i + 1, w - 1), lambda j: pair(i, j)),
            )
        )
    )
    if keep is not None:
        all_pairs = F.filter(all_pairs, lambda p: keep(p["metric"]))
    star_pairs = structural(
        F.transform(F.sequence(F.lit(1), w - 1), lambda j: pair(F.lit(0), j))
    )
    arr = F.when(w <= max_width, all_pairs).otherwise(star_pairs)
    pairs = buckets.select(F.explode(arr).alias("p"))
    cols = [F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")]
    if metric is not None:
        cols.append(F.col("p.metric").alias("metric"))
    return pairs.select(*cols)


def bucket_width_stats(
    df: DataFrame, id_col: str, bands_col: str, max_width: int = 512
) -> DataFrame:
    """LSH bucket diagnostics, one row: (n_buckets, max_bucket_width,
    n_over_width, candidate_pairs). ``n_over_width`` counts buckets that
    :func:`bucket_member_pairs` would degrade to star pairing;
    ``candidate_pairs`` is the pair count after that degradation. Bench
    logs these for every LSH query so skew is visible in artifacts."""
    widths = (
        df.select(F.col(id_col), F.explode(F.col(bands_col)).alias("band"))
        .groupBy("band.band_id", "band.band_hash")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
    )
    w = F.col("w")
    pair_ct = F.when(w <= max_width, w * (w - 1) / 2).otherwise(w - 1)
    return widths.agg(
        F.count("*").alias("n_buckets"),
        F.max("w").alias("max_bucket_width"),
        F.sum(F.when(w > max_width, 1).otherwise(0)).alias("n_over_width"),
        F.sum(pair_ct).cast("long").alias("candidate_pairs"),
    )


def candidate_pairs_from_bands(df: DataFrame, id_col: str, bands_col: str) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band hash.

    Thin wrapper over :func:`bucket_member_pairs` for callers that want
    only the pair ids; the dedup is one groupBy shuffle. Inherits the
    skew cap: buckets wider than the default ``max_width`` (512)
    contribute only their O(w) star pairs, not all distinct pairs.
    """
    return (
        bucket_member_pairs(df, id_col, bands_col)
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_n"))
        .select("id_a", "id_b")
    )
