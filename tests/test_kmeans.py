"""Driver-side k-means (functions/kmeans.py) — the trainer behind the
IVF coarse quantizer and the PQ sub-quantizers. The headline contract
is complexity, not just correctness: k-means++ seeding must be O(k·n)
(running min-d² update) so the √n list sizing ivf.py advertises
(k≈10k for 100M vectors) stays driver-feasible."""

from __future__ import annotations

import time

import numpy as np
import pytest

from secure_agent_api_vector_search_spark.functions.kmeans import (
    assign_chunked,
    kmeanspp_seed,
    lloyd,
)


def test_seed_picks_k_distinct_training_rows():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 8))
    c = kmeanspp_seed(x, 16, np.random.default_rng(1))
    assert c.shape == (16, 8)
    # every centroid is an actual training row
    for row in c:
        assert (np.abs(x - row).sum(axis=1) < 1e-12).any()
    # k-means++ spreads: no centroid chosen twice on distinct data
    assert len({tuple(r) for r in np.round(c, 9)}) == 16


def test_seed_handles_duplicate_only_data():
    # all points identical: d2 becomes 0 after the first pick, the
    # remaining picks fall back to uniform choice — must not divide by 0
    x = np.ones((64, 4))
    c = kmeanspp_seed(x, 8, np.random.default_rng(0))
    assert c.shape == (8, 4) and np.allclose(c, 1.0)


def test_assign_chunked_matches_unchunked():
    rng = np.random.default_rng(2)
    x, c = rng.normal(size=(1000, 6)), rng.normal(size=(32, 6))
    got = assign_chunked(x, c, chunk=64)
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    np.testing.assert_array_equal(got, d.argmin(axis=1))


def test_lloyd_recovers_separated_clusters():
    rng = np.random.default_rng(3)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
    x = np.concatenate([c + 0.1 * rng.normal(size=(200, 2)) for c in centers])
    c = lloyd(x, 4, np.random.default_rng(4))
    # each true center has a learned centroid within the noise radius
    for t in centers:
        assert np.min(((c - t) ** 2).sum(axis=1)) < 0.1


def test_lloyd_empty_cluster_keeps_previous_centroid():
    # k > distinct points: some clusters must come up empty and keep
    # their seeded position instead of going NaN
    x = np.array([[0.0, 0.0], [1.0, 1.0]])
    c = lloyd(np.repeat(x, 5, axis=0), 4, np.random.default_rng(5))
    assert np.isfinite(c).all()


def test_seeding_k1024_on_capped_sample_is_seconds():
    """The VERDICT round-3 scale defect: O(k²·n) seeding needs hours at
    k≈10k. The running-min form must seed k=1024 on the full 256k-row
    sample cap in seconds (generous wall bound for a noisy box)."""
    rng = np.random.default_rng(6)
    x = rng.normal(size=(262_144, 64))
    t0 = time.perf_counter()
    c = kmeanspp_seed(x, 1024, np.random.default_rng(7))
    dt = time.perf_counter() - t0
    assert c.shape == (1024, 64)
    assert dt < 60.0, f"seeding took {dt:.1f}s — complexity regression"


def test_lloyd_deterministic_for_fixed_seed():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(500, 4))
    a = lloyd(x, 8, np.random.default_rng(9))
    b = lloyd(x, 8, np.random.default_rng(9))
    np.testing.assert_array_equal(a, b)


def test_seed_rejects_more_clusters_than_points():
    with pytest.raises((ValueError, IndexError)):
        kmeanspp_seed(np.ones((2, 2)), 8, np.random.default_rng(0))
