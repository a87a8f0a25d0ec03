"""MinHash / SimHash signatures for near-duplicate detection.

[EXT] operators (SURVEY.md §2.10). Spark-first design: signatures are
computed with native `xxhash64` expressions and **hash aggregation**
(explode → groupBy → 64 min-aggs), which is the shape that scales —
the giant-nested-expression alternative falls out of whole-stage
codegen (64 KB method limit) and runs interpreted. The LSH *join* is an
ordinary shuffle on (band_id, band_hash): candidates ∝ collisions,
never n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minhash_signatures(
    df: DataFrame, id_col: str, shingles_col: str, num_hashes: int = 64
) -> DataFrame:
    """(id, array<string> shingles) → (id, signature array<bigint>).

    Explode + hash-aggregate: min(xxhash64(seed_s, shingle)) per seed —
    partial aggregation makes the shuffle one row per (doc, 64 mins);
    every hash evaluation is JVM codegen.
    """
    ex = df.select(F.col(id_col), F.explode(F.col(shingles_col)).alias("_sh"))
    aggs = [
        F.min(F.xxhash64(F.lit(s), F.col("_sh"))).alias(f"_h{s}") for s in range(num_hashes)
    ]
    return (
        ex.groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col, F.array(*[F.col(f"_h{s}") for s in range(num_hashes)]).alias("signature")
        )
    )


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
