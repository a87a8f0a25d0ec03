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

The LSH *join* is an ordinary shuffle on (band_id, band_hash):
candidates ∝ collisions, never n².
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


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Cut a MinHash signature into bands and hash each band:
    array of (band_id, band_hash) structs. Docs sharing any band hash
    become candidate pairs."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.xxhash64(
                b, F.slice(signature, b * rows_per_band + 1, rows_per_band).cast("string")
            ).alias("band_hash"),
        ),
    )


def simhash_bits(tokens_col: Column, n_bits: int = 64) -> Column:
    """SimHash as an array<int> of ``n_bits`` bits.

    Per bit i: sum over tokens of +1/−1 according to the sign of
    xxhash64(i, token) — one independent hash per bit, exact integer
    arithmetic throughout (variable bit-shifts aren't expressible as
    columns, so independent seeded hashes replace bit extraction);
    bit set iff the sum is positive.
    """
    counts = F.aggregate(
        tokens_col,
        F.array_repeat(F.lit(0), n_bits),
        lambda acc, t: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(n_bits - 1)),
            lambda a, i: a + F.when(F.xxhash64(i, t) < 0, 1).otherwise(-1),
        ),
    )
    return F.transform(counts, lambda c: F.when(c > 0, 1).otherwise(0))


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


def candidate_pairs_from_bands(df: DataFrame, id_col: str, bands_col: str) -> DataFrame:
    """Explode band structs and self-join on (band_id, band_hash) to get
    distinct candidate pairs (id_a < id_b).

    Scale shape: one shuffle keyed by band hash; bucket sizes are the
    skew knob (tune bands/rows so buckets stay small; AQE skew-join
    splits stragglers).
    """
    exploded = df.select(F.col(id_col), F.explode(F.col(bands_col)).alias("band")).select(
        id_col, "band.band_id", "band.band_hash"
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
