"""IVF scale-path seams: the distributed-KMeans fit escape hatch,
cosine-consistent routing on unnormalized corpora (the reference's V6
trap, sql/05_vector_index.sql:4 vs tools.yaml:26), and the
skew-triggered maintenance/rebalance job that keeps streamed-append
indexes (streaming/ingest.py::start_indexed_ingest) healthy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators import ivf as I
from secure_agent_api_vector_search_spark.operators import topk as TK


def _vec_df(spark, x: np.ndarray, start_id: int = 0):
    rows = [(start_id + i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _blobs(rng, centers: np.ndarray, per: int, scale: float) -> np.ndarray:
    return np.concatenate(
        [c + rng.normal(0.0, scale, size=(per, centers.shape[1])) for c in centers]
    )


# ---------------------------------------------------------------- escape hatch


def test_fit_uses_mllib_above_sample_budget(spark):
    """n_lists·100 > sample_cap must route to the distributed fit — the
    driver-collect path's own docstring rule says its sample would be
    too small to train that k."""
    rng = np.random.default_rng(7)
    centers = np.eye(4) * 20.0
    df = _vec_df(spark, _blobs(rng, centers, per=60, scale=0.3))
    c = I._fit_centroids(df, "embedding", n_lists=4, sample_cap=100)
    assert len(c) == 4 and len(c[0]) == 4
    # on 4 well-separated blobs any correct trainer recovers one centroid
    # per blob: each fitted centroid sits near a distinct true center
    got = np.asarray(c)
    owner = {int(np.linalg.norm(centers - g, axis=1).argmin()) for g in got}
    assert owner == {0, 1, 2, 3}


def test_driver_and_distributed_fits_partition_identically(spark):
    """Train/assign parity across fit paths: on a cleanly-clustered
    corpus both trainers must induce the SAME partition of the rows
    (up to list relabeling) because assignment math is shared."""
    rng = np.random.default_rng(11)
    centers = np.eye(4) * 20.0
    df = _vec_df(spark, _blobs(rng, centers, per=60, scale=0.3)).cache()

    def partition(centroids):
        rows = I.assign_lists(df, centroids).select("vec_id", "list_id").collect()
        groups: dict[int, set[int]] = {}
        for r in rows:
            groups.setdefault(r["list_id"], set()).add(r["vec_id"])
        return {frozenset(g) for g in groups.values()}

    driver = I._fit_centroids(df, "embedding", 4, sample_cap=262_144)
    dist = I._fit_centroids(df, "embedding", 4, sample_cap=100)
    assert partition(driver) == partition(dist)


# ---------------------------------------------------- cosine-consistent routing


@pytest.fixture(scope="module")
def magnitude_skewed(spark):
    """Direction-clustered corpus with direction-INDEPENDENT bimodal
    magnitudes (1 and 50): L2 k-means clusters by magnitude, so routing
    disagrees with cosine scoring — the V6 failure, reconstructed."""
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(6, 16))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = _blobs(rng, dirs, per=80, scale=0.05)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    mags = np.where(rng.random(len(pts)) < 0.5, 1.0, 50.0)
    return _vec_df(spark, pts * mags[:, None]).cache(), dirs


def _routing_recall(corpus, index, dirs, k=10, nprobe=1) -> float:
    hits = total = 0
    for d in dirs:
        q = [float(v) for v in d]
        exact = {r["vec_id"] for r in TK.topk_similar(corpus, q, k=k).collect()}
        got = {r["vec_id"] for r in I.ivf_search(index, q, k=k, nprobe=nprobe).collect()}
        hits += len(exact & got)
        total += len(exact)
    return hits / total


def test_cosine_routing_fixes_unnormalized_corpus(spark, magnitude_skewed):
    corpus, dirs = magnitude_skewed
    l2 = I.build_ivf(corpus, n_lists=6, seed=42)                    # default: V6 trap
    cos = I.build_ivf(corpus, n_lists=6, seed=42, metric="cosine")
    r_l2 = _routing_recall(corpus, l2, dirs)
    r_cos = _routing_recall(corpus, cos, dirs)
    assert r_cos >= 0.9
    assert r_cos > r_l2 + 0.15, (r_cos, r_l2)


def test_cosine_centroids_are_unit_norm(magnitude_skewed):
    corpus, _ = magnitude_skewed
    cos = I.build_ivf(corpus, n_lists=6, seed=42, metric="cosine")
    norms = np.linalg.norm(np.asarray(cos.centroids), axis=1)
    assert np.allclose(norms, 1.0, atol=1e-9)
    assert cos.metric == "cosine"


def test_metric_survives_write_read_and_rebuild(spark, magnitude_skewed, tmp_path):
    corpus, _ = magnitude_skewed
    path = str(tmp_path / "cos_ivf")
    I.write_ivf(I.build_ivf(corpus, n_lists=6, seed=42, metric="cosine"), path)
    loaded = I.read_ivf(spark, path)
    assert loaded.metric == "cosine"
    rebuilt = I.rebuild_ivf(spark, path, n_lists=6)
    assert rebuilt.metric == "cosine"
    norms = np.linalg.norm(np.asarray(rebuilt.centroids), axis=1)
    assert np.allclose(norms, 1.0, atol=1e-9)


# ------------------------------------------------------- skew + maintenance job


def test_list_balance_stats_balanced_vs_skewed(spark, tmp_path):
    rng = np.random.default_rng(5)
    centers = np.eye(4, 8) * 12.0
    base = _vec_df(spark, _blobs(rng, centers, per=100, scale=0.4))
    index = I.build_ivf(base, n_lists=4, seed=42)
    stats = I.list_balance_stats(index)
    assert stats["n_rows"] == 400
    assert stats["skew"] < 2.0

    # drifted appends pile into ONE frozen list (what start_indexed_ingest
    # does to an index as the ingest distribution shifts)
    drift = _vec_df(spark, centers[0] + rng.normal(0, 0.4, (900, 8)), start_id=10_000)
    appended = I.IvfIndex(
        index.assigned.unionByName(I.assign_lists(drift, index.centroids)),
        index.centroids,
    )
    skewed = I.list_balance_stats(appended)
    assert skewed["n_rows"] == 1300
    assert skewed["skew"] > 2.5


def test_rebuild_if_skewed_triggers_and_restores_balance(spark, tmp_path):
    rng = np.random.default_rng(9)
    centers = np.eye(4) * 12.0
    base = _vec_df(spark, _blobs(rng, centers, per=100, scale=0.4))
    path = str(tmp_path / "drifting")
    I.write_ivf(I.build_ivf(base, n_lists=4, seed=42), path)

    # below threshold: one aggregate job, no rewrite
    idx, rebuilt = I.rebuild_if_skewed(spark, path, threshold=4.0)
    assert not rebuilt

    # streamed-style drifted append with frozen centroids (the exact
    # batch append start_indexed_ingest's foreachBatch performs): three
    # NEW separable clusters, all inside frozen list 0's Voronoi cell —
    # stale routing funnels 900 rows into one list even though fresh
    # centroids would spread them
    drift_centers = centers[0] + np.eye(3, 4, k=1) * 6.0
    drift = _vec_df(spark, _blobs(rng, drift_centers, per=300, scale=0.4), start_id=10_000)
    old = I.read_ivf(spark, path)
    I.assign_lists(drift, old.centroids).write.mode("append").partitionBy(
        "list_id"
    ).parquet(f"{path}/lists")
    stale_skew = I.list_balance_stats(I.read_ivf(spark, path))["skew"]
    assert stale_skew > 2.5

    # the rebuild also RE-SIZES lists for the grown corpus (the √n
    # guidance build_ivf defaults to) — maintenance is re-cluster +
    # re-size, not just re-cluster
    idx, rebuilt = I.rebuild_if_skewed(spark, path, threshold=2.0, n_lists=6)
    assert rebuilt
    after = I.list_balance_stats(idx)
    assert after["n_rows"] == 1300
    assert after["skew"] < stale_skew / 1.5
    assert after["skew"] < 2.0


def test_drift_degrades_low_probe_recall_and_rebuild_restores_it(spark, tmp_path):
    """The recall half of the maintenance contract: a new ingest cluster
    straddling a stale Voronoi boundary gets SPLIT across frozen lists,
    so nprobe=1 misses ~half its true neighbors; re-clustering gives the
    new region its own list and restores recall."""
    rng = np.random.default_rng(21)
    blob_a = rng.normal(0, 0.5, (100, 8)) + np.r_[10.0, np.zeros(7)]
    blob_b = rng.normal(0, 0.5, (100, 8)) - np.r_[10.0, np.zeros(7)]
    base = _vec_df(spark, np.concatenate([blob_a, blob_b]))
    path = str(tmp_path / "boundary")
    I.write_ivf(I.build_ivf(base, n_lists=2, seed=42), path)

    # new cluster at the midpoint: jitter pushes members to either side
    # of the frozen 2-list boundary
    new = rng.normal(0, 0.5, (60, 8))
    old = I.read_ivf(spark, path)
    I.assign_lists(_vec_df(spark, new, start_id=5_000), old.centroids).write.mode(
        "append"
    ).partitionBy("list_id").parquet(f"{path}/lists")

    stale = I.read_ivf(spark, path)
    corpus = stale.assigned.drop("list_id").cache()
    q = [0.0] * 8
    exact = {r["vec_id"] for r in TK.topk_similar(corpus, q, k=10, metric="l2").collect()}
    got_stale = {
        r["vec_id"]
        for r in I.ivf_search(stale, q, k=10, nprobe=1, metric="l2").collect()
    }
    stale_recall = len(exact & got_stale) / len(exact)
    assert stale_recall < 0.8, stale_recall

    fresh = I.rebuild_ivf(spark, path, n_lists=3)
    got_fresh = {
        r["vec_id"]
        for r in I.ivf_search(fresh, q, k=10, nprobe=1, metric="l2").collect()
    }
    assert len(exact & got_fresh) / len(exact) >= 0.9


def test_rebuild_sample_cap_threads_through(spark, tmp_path):
    """The maintenance path must honor a bounded fit budget: a capped
    rebuild trains on <= sample_cap rows (the faiss ~100·k recipe) and
    still repairs skew — an uncapped 88k x 768 rebuild measured 7x the
    initial sampled build purely in driver Lloyd time."""
    import numpy as np
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.operators.ivf import (
        assign_lists,
        build_ivf,
        list_balance_stats,
        rebuild_if_skewed,
        write_ivf,
    )

    rng = np.random.default_rng(5)
    rows = [(int(i), rng.normal(size=8).tolist()) for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = build_ivf(emb, n_lists=4, seed=1)
    path = str(tmp_path / "ivf")
    write_ivf(idx, path)
    # drifted ingest: every appended vector lands in one stale cell
    drift = emb.limit(200).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(9.0)).alias("embedding"),
    )
    assign_lists(drift, idx.centroids).write.mode("append").partitionBy(
        "list_id"
    ).parquet(f"{path}/lists")
    rebuilt, did = rebuild_if_skewed(
        spark, path, threshold=1.5, n_lists=4, sample_cap=64
    )
    assert did
    assert list_balance_stats(rebuilt)["skew"] < 3.0  # drift cell split
