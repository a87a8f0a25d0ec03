"""Broadcast Bloom filter over a key column.

[EXT] scale machinery (SURVEY.md §2.10): the reference has no
incremental path at all (its corpus is 50 seed rows,
sql/03_seed_data.sql:2-51); this exists so the day-to-day
batch-vs-corpus anti-join can pre-filter the CORPUS side map-side with
a sketch built over the (small) arriving batch.

Shape: the build side runs one mapInPandas pass that emits a
per-partition bitmap (~m/8 bytes each) which the driver ORs together;
the probe side is an Arrow-batched predicate over the broadcast
bitmap. Both sides derive bit positions from the same pair of
JVM-native ``xxhash64`` columns via Kirsch-Mitzenmacher double
hashing, so the probe can never produce a false NEGATIVE — only false
positives, which the exact downstream join removes. That asymmetry is
what lets an approximate structure live inside an exact operator.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# bitmap cap: 2^30 bits = 128 MiB broadcast — past this the filter
# degrades fpp instead of growing (still exact downstream; the sketch
# only ever owes a SUPERSET of collisions)
_MAX_BITS = 1 << 30
_MIN_BITS = 64
_MAX_HASHES = 16


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Classic sizing: m = -n·ln(p)/ln(2)^2 bits, k = (m/n)·ln(2)
    hash functions, clamped to [64, 2^30] bits and [1, 16] hashes."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(1, int(n_items))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2.0) ** 2)))
    m = min(max(m, _MIN_BITS), _MAX_BITS)
    # round up to a byte boundary so the bitmap is a whole uint8 array
    m = (m + 7) // 8 * 8
    k = min(max(1, round(m / n * math.log(2.0))), _MAX_HASHES)
    return m, k


def _hash_cols(key: Column) -> tuple[Column, Column]:
    """The shared double-hash family: two independent JVM-native
    xxhash64 values of the key. Build and probe MUST both come through
    here — the no-false-negative guarantee is exactly 'same family'."""
    return F.xxhash64(key), F.xxhash64(key, F.lit(0x9E3779B9))


def _positions(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    """(k, n) bit positions, uint64 wraparound arithmetic (identical on
    build and probe by construction)."""
    i = np.arange(k, dtype=np.uint64).reshape(-1, 1)
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m)


@dataclass
class BloomFilter:
    """Driver-side handle: sizing plus the broadcast bitmap."""

    m_bits: int
    k_hashes: int
    n_items: int
    _bcast: object  # pyspark Broadcast[bytes]

    def destroy(self) -> None:
        self._bcast.unpersist()


def build_bloom(
    df: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    n_items: int | None = None,
) -> BloomFilter:
    """Build a Bloom filter over ``df[key_col]`` (strings/binary).

    One count job (skipped when ``n_items`` is given) plus one
    mapInPandas pass; each partition ships one m/8-byte bitmap to the
    driver, which ORs them and broadcasts the result.
    """
    if n_items is None:
        n_items = df.count()
    m, k = bloom_params(n_items, fpp)
    n_bytes = m // 8

    h1c, h2c = _hash_cols(F.col(key_col))
    hashed = df.select(h1c.alias("_h1"), h2c.alias("_h2"))

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        seen_any = False
        for pdf in batches:
            if pdf.empty:
                continue
            seen_any = True
            h1 = pdf["_h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf["_h2"].to_numpy(dtype=np.int64).view(np.uint64)
            pos = _positions(h1, h2, m, k).ravel()
            np.bitwise_or.at(bitmap, pos >> np.uint64(3),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        if seen_any:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    parts = hashed.mapInPandas(per_partition, schema="bitmap binary").collect()
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint8)

    sc = df.sparkSession.sparkContext
    return BloomFilter(m, k, n_items, sc.broadcast(merged.tobytes()))


def filter_might_contain(df: DataFrame, key_col: str, bloom: BloomFilter) -> DataFrame:
    """Keep the rows of ``df`` whose ``key_col`` MIGHT be in the filter
    (superset of the true members — false positives only)."""
    m, k = bloom.m_bits, bloom.k_hashes
    bcast = bloom._bcast

    @F.pandas_udf(T.BooleanType())
    def might(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(bcast.value, dtype=np.uint8)
        h1 = h1s.to_numpy(dtype=np.int64).view(np.uint64)
        h2 = h2s.to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions(h1, h2, m, k)
        hits = (bitmap[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return pd.Series(hits.all(axis=0).astype(bool))

    h1c, h2c = _hash_cols(F.col(key_col))
    return (
        df.withColumn("_bh1", h1c)
        .withColumn("_bh2", h2c)
        .filter(might(F.col("_bh1"), F.col("_bh2")))
        .drop("_bh1", "_bh2")
    )
