"""Driver-side numpy k-means shared by the IVF coarse quantizer
(operators/ivf.py) and the PQ sub-quantizers (operators/pq.py).

Centroid training deliberately runs on a bounded driver sample (the
faiss recipe — quality needs ~100·k training points, not the corpus;
see ivf._fit_centroids for the scale argument). That makes the DRIVER
complexity the thing that caps realistic k:

- Seeding is k-means++ (Arthur & Vassilvitskii, SODA 2007) with the
  standard running min-d² update: each new centroid costs ONE O(n·d)
  distance pass (`d² ← min(d², ‖x−c_new‖²)`), so seeding is O(k·n·d)
  total. The naive form — re-scanning every centroid chosen so far per
  iteration — is O(k²·n·d): harmless at k=100, but at the √n sizing the
  IVF module advertises (k≈10k lists for 100M vectors) it spends hours
  on the driver before Lloyd even starts.
- Distances use the ‖x‖²−2x·c+‖c‖² expansion (one BLAS matvec per new
  centroid, no (n×d) temporary), clamped at 0 against float residue.
- Lloyd assignment is chunked so the (chunk × k) distance block stays
  ~100 MB regardless of k, and per-cluster means use one sort +
  segmented reduceat pass (O(n log n + n·d)) instead of k masked scans
  or elementwise np.add.at (both orders of magnitude slower at k≥1024).
"""

from __future__ import annotations

import numpy as np

_CHUNK = 16_384  # rows per assignment block: chunk·k·8B ≈ 134 MB at k=1024


def kmeanspp_seed(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding, O(k·n·d): returns a (k × d) centroid array."""
    n = len(x)
    if k > n:
        raise ValueError(f"k ({k}) exceeds training rows ({n})")
    xsq = np.einsum("ij,ij->i", x, x)
    cents = np.empty((k, x.shape[1]), dtype=np.float64)
    cents[0] = x[rng.integers(n)]
    d2 = np.maximum(xsq - 2.0 * (x @ cents[0]) + cents[0] @ cents[0], 0.0)
    for i in range(1, k):
        tot = d2.sum()
        p = d2 / tot if tot > 0 else None
        nxt = x[rng.choice(n, p=p)]
        cents[i] = nxt
        np.minimum(d2, np.maximum(xsq - 2.0 * (x @ nxt) + nxt @ nxt, 0.0), out=d2)
    return cents


def assign_chunked(x: np.ndarray, c: np.ndarray, chunk: int = _CHUNK) -> np.ndarray:
    """argmin-distance assignment of x's rows to centroids c, computed
    in row blocks so the distance matrix never exceeds chunk × k."""
    csq = np.einsum("ij,ij->i", c, c)[None, :]
    out = np.empty(len(x), dtype=np.int64)
    for s in range(0, len(x), chunk):
        xx = x[s : s + chunk]
        d = np.einsum("ij,ij->i", xx, xx)[:, None] - 2.0 * (xx @ c.T) + csq
        out[s : s + chunk] = d.argmin(axis=1)
    return out


def lloyd(x: np.ndarray, k: int, rng: np.random.Generator, iters: int = 20) -> np.ndarray:
    """k-means++-seeded Lloyd iterations; returns (k × d) centroids.

    Empty clusters keep their previous centroid (same policy as the
    inline loops this replaces)."""
    c = kmeanspp_seed(x, k, rng)
    for _ in range(iters):
        assign = assign_chunked(x, c)
        counts = np.bincount(assign, minlength=k)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_assign[1:] != sorted_assign[:-1]]
        )
        sums = np.zeros_like(c)
        sums[sorted_assign[starts]] = np.add.reduceat(x[order], starts, axis=0)
        new_c = c.copy()
        nz = counts > 0
        new_c[nz] = sums[nz] / counts[nz, None]
        if np.allclose(new_c, c):
            break
        c = new_c
    return c
