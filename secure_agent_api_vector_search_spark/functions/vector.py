"""Vector column expressions — the engine's analog of pgvector operators.

Reference mapping (SURVEY.md §2.3):
- `<=>` cosine distance (tools.yaml:24,26, V2) → :func:`cosine_distance`
- `1 - (<=>)` similarity projection (tools.yaml:24, V3) →
  :func:`cosine_similarity`
- L2 opclass of the ivfflat index (sql/05_vector_index.sql:4) →
  :func:`l2_distance`

Everything here is a **native Catalyst expression** built from
higher-order functions (`zip_with` + `aggregate`), so the similarity
computation runs inside whole-stage codegen on the JVM: no Python, no
serialization, vectorized over the parquet scan. At 100 TB this is the
difference between a scan-speed kNN and a 100× slower UDF path.

Numerical contract: all math is float64 with a **left fold in array
order**, which is bit-for-bit identical to DuckDB's
`list_dot_product` — the correctness oracle can compare at full
precision, no rounding tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product  Σ a_i·b_i  as a left fold (array order)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm ``sqrt(Σ a_i²)``."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = dot(a,b) / (|a|·|b|) — the `1 - <=>` projection the
    reference exposes as `similarity` (tools.yaml:24)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    """pgvector `<=>`: 1 − cos(a, b) (tools.yaml:26)."""
    return F.lit(1.0) - cosine_similarity(a, b)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance via the expansion |a|² − 2·a·b + |b|².

    The expansion (rather than Σ(a_i−b_i)²) is used deliberately: the
    DuckDB oracle can express the identical arithmetic with three
    `list_dot_product` calls, giving bit-exact parity. `greatest(·, 0)`
    clamps the tiny negative residue when a ≈ b.
    """
    aa, bb = _c(a), _c(b)
    sq = dot(aa, aa) - F.lit(2.0) * dot(aa, bb) + dot(bb, bb)
    return F.sqrt(F.greatest(sq, F.lit(0.0)))


def normalize(a: Column | str) -> Column:
    """Unit-normalize an array<double> column (null-safe on zero norm).

    Stored-unit-norm is the 100 TB layout choice (SURVEY.md §4): with
    unit vectors, cosine = dot and L2 ranks identically to cosine, so
    one index layout serves both metrics.
    """
    aa = _c(a)
    n = l2_norm(aa)
    return F.when(n > 0, F.transform(aa, lambda x: x / n))
