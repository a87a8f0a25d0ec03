"""Vector column expressions — the engine's analog of pgvector operators.

Reference mapping (SURVEY.md §2.3):
- `<=>` cosine distance (tools.yaml:24,26, V2) → :func:`cosine_distance`
- `1 - (<=>)` similarity projection (tools.yaml:24, V3) →
  :func:`cosine_similarity`
- L2 opclass of the ivfflat index (sql/05_vector_index.sql:4) →
  :func:`l2_distance`

Everything here is a **native Catalyst expression**: no Python, no
serialization, evaluated over the parquet scan on the JVM. When the
dimension is statically known (``dim=...`` — every production call
site knows it), the fold is UNROLLED into a plain arithmetic
expression `a[0]*b[0] + a[1]*b[1] + …`, which participates in
whole-stage codegen. The lambda higher-order form (`zip_with` +
`aggregate`) is kept as the unknown-dim fallback, but HOFs evaluate
INTERPRETED in Spark (no codegen — profiled 50-100× slower in the LSH
screen), so at 100 TB the unrolled form is the difference between a
scan-speed kNN and an interpreter-bound one.

Numerical contract: all math is float64 with a **left fold in array
order** — the unrolled sum associates `((0+t0)+t1)+…` exactly like
the aggregate fold, so both forms are bit-for-bit identical to
DuckDB's `list_dot_product` and the correctness oracle compares at
full precision, no rounding tolerance needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# Max dimension for the unrolled codegen form. The left-associated sum
# builds a Column tree of depth ~3·dim; beyond a few hundred terms the
# Column→Expression conversion recurses too deep (observed failure at
# 768), and even a balanced-tree unroll dies in janino ("Code grows
# beyond 64 KB" — one expression is one generated method, unsplittable;
# measured here at dim 768, which then runs interpreted at HOF speed).
# Above the cap, per-row work must leave the expression world: use
# :func:`np_query_scorer` (Arrow-batched whole-batch numpy — the same
# pattern as the LSH screens, profiled 50-100× over the interpreted
# HOF) when the query side is a driver-known vector, or accept the HOF
# fold when it is not.
UNROLL_MAX_DIM = 256


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Inner product  Σ a_i·b_i  as a left fold (array order).

    With ``dim`` ≤ UNROLL_MAX_DIM, an unrolled codegen sum; otherwise
    the interpreted HOF fold (identical values either way — see module
    contract). The unroll pays a one-time codegen compile (~0.2 s), so
    it wins on large scans and loses on tiny ones; both forms are kept
    deliberately.
    """
    aa, bb = _c(a), _c(b)
    if dim is not None and dim <= UNROLL_MAX_DIM:
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + aa[i] * bb[i]
        return acc
    return F.aggregate(
        F.zip_with(aa, bb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    """Euclidean norm ``sqrt(Σ a_i²)``."""
    return F.sqrt(dot(a, a, dim))


def cosine_similarity(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """cos(a, b) = dot(a,b) / (|a|·|b|) — the `1 - <=>` projection the
    reference exposes as `similarity` (tools.yaml:24)."""
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def cosine_distance(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """pgvector `<=>`: 1 − cos(a, b) (tools.yaml:26)."""
    return F.lit(1.0) - cosine_similarity(a, b, dim)


def l2_distance(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Euclidean distance via the expansion |a|² − 2·a·b + |b|².

    The expansion (rather than Σ(a_i−b_i)²) is used deliberately: the
    DuckDB oracle can express the identical arithmetic with three
    `list_dot_product` calls, giving bit-exact parity. `greatest(·, 0)`
    clamps the tiny negative residue when a ≈ b.
    """
    aa, bb = _c(a), _c(b)
    sq = dot(aa, aa, dim) - F.lit(2.0) * dot(aa, bb, dim) + dot(bb, bb, dim)
    return F.sqrt(F.greatest(sq, F.lit(0.0)))


def np_query_scorer(query_vec, metric: str = "cosine"):
    """Arrow-batched numpy scorer for dims beyond UNROLL_MAX_DIM — the
    100 TB scan path at the reference's true dimension (``vector(768)``,
    reference sql/02_schema.sql:14).

    Returns a one-argument Column function ``f(vec_col) -> double`` that
    scores every row against the driver-known ``query_vec``: the query
    is closed over (shipped once with the task, like the F.lit inline),
    only the embedding column crosses the Arrow boundary, and each batch
    is ONE BLAS matmul ``M @ q`` — no per-row Python. This is the same
    whole-batch-numpy discipline as the LSH screens (operators/dedup.py)
    and the embedder (embedder.py), which profiled 50-100× over the
    interpreted HOF fold that Spark uses for >256-dim expressions.

    Numerics are float64 like the expression forms; the summation order
    is BLAS pairwise, so scores agree with the fold to ~1e-15 relative —
    rank-stable, but not the bit-exact tier (that is the ≤256 unroll the
    oracle gate pins at dim 64).
    """
    if metric not in ("cosine", "dot", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qq = float(q @ q)

    @F.pandas_udf("double")
    def score(v: pd.Series) -> pd.Series:
        vals = v.to_numpy()
        # null vectors score null (matching the expression forms' null
        # propagation) — callers order nulls last / filter post-limit
        res = np.full(len(vals), None, dtype=object)
        mask = np.fromiter((x is not None for x in vals), dtype=bool, count=len(vals))
        if mask.any():
            m = np.stack(vals[mask])  # (batch, dim) float64, one copy
            d = m @ q
            # 0/0 → NaN silently, matching the expression form's Double
            # semantics (zero-norm vectors score NaN, not a log storm)
            with np.errstate(divide="ignore", invalid="ignore"):
                if metric == "dot":
                    out = d
                elif metric == "cosine":
                    out = d / (np.sqrt(np.einsum("ij,ij->i", m, m)) * np.sqrt(qq))
                else:  # l2 via the same |a|²−2ab+|b|² expansion as l2_distance
                    out = np.sqrt(
                        np.maximum(np.einsum("ij,ij->i", m, m) - 2.0 * d + qq, 0.0)
                    )
            res[mask] = out
        return pd.Series(res)

    return score


def normalize(a: Column | str) -> Column:
    """Unit-normalize an array<double> column (null-safe on zero norm).

    Stored-unit-norm is the 100 TB layout choice (SURVEY.md §4): with
    unit vectors, cosine = dot and L2 ranks identically to cosine, so
    one index layout serves both metrics.
    """
    aa = _c(a)
    n = l2_norm(aa)
    return F.when(n > 0, F.transform(aa, lambda x: x / n))
