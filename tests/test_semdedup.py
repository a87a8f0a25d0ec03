"""SemDeDup cluster-bounded semantic dedup (operators/semdedup.py).

Value-level invariants a rows-only gate can't see: witness validity
(every dropped row really is >= threshold-similar to its kept witness,
in the same cluster), exact-duplicate recall, determinism, and the
keep-filtered form's row accounting.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_keep,
)


@pytest.fixture(scope="module")
def planted(spark, emb):
    """Corpus ∪ exact copies of the first 10 vectors under shifted ids —
    exact duplicates assign to the same centroid by construction."""
    dup = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    return emb.unionAll(dup).cache()


def test_exact_duplicates_dropped_with_witness(planted):
    out = semantic_dedup(planted, threshold=0.99).cache()
    marks = {r["vec_id"]: r for r in out.collect()}
    assert len(marks) == planted.count()  # one row per input
    for i in range(10):
        a, b = marks[i], marks[100000 + i]
        # identical vectors land in one cluster; the lower id wins
        assert a["cluster_id"] == b["cluster_id"]
        assert a["keep"] is True
        assert b["keep"] is False and b["dup_of"] == i
    out.unpersist()


def test_witnesses_are_kept_and_similar(planted):
    th = 0.9
    out = semantic_dedup(planted, threshold=th)
    rows = out.collect()
    kept = {r["vec_id"] for r in rows if r["keep"]}
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in planted.select("vec_id", "embedding").collect()
    }
    cluster = {r["vec_id"]: r["cluster_id"] for r in rows}
    dropped = [r for r in rows if not r["keep"]]
    assert dropped, "threshold 0.9 must drop the planted exact dups"
    for r in dropped:
        w = r["dup_of"]
        assert w in kept and w < r["vec_id"]
        assert cluster[w] == r["cluster_id"]
        a, b = vecs[r["vec_id"]], vecs[w]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= th - 1e-9


def test_kept_set_pairwise_below_threshold_within_cluster(spark):
    """Greedy guarantee: within a cluster no two KEPT rows reach the
    threshold. Checked exhaustively on a small controlled frame."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # add 10 near-copies of vector 0 (all mutually ~1.0 similar)
    for j in range(10):
        v = base[0] + rng.normal(scale=0.01, size=16)
        rows.append((100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, threshold=0.95, n_clusters=4).collect()
    by_cluster: dict[int, list[int]] = {}
    vecs = {i: np.array(v) for i, v in rows}
    for r in out:
        if r["keep"]:
            by_cluster.setdefault(r["cluster_id"], []).append(r["vec_id"])
    for ids in by_cluster.values():
        for x in ids:
            for y in ids:
                if x < y:
                    a, b = vecs[x], vecs[y]
                    cos = float(
                        a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
                    )
                    assert cos < 0.95 + 1e-9
    # the 10 near-copies of vector 0 collapse to at most one survivor
    # beyond vector 0 itself only if a cluster boundary splits them
    copies_kept = [r for r in out if r["vec_id"] >= 100 and r["keep"]]
    clusters_of_copies = {r["cluster_id"] for r in out if r["vec_id"] >= 100}
    assert len(copies_kept) <= len(clusters_of_copies)


def test_deterministic(planted):
    a = semantic_dedup(planted, threshold=0.9).collect()
    b = semantic_dedup(planted, threshold=0.9).collect()
    assert a == b


def test_null_vectors_kept(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.99, n_clusters=2).collect()}
    assert out[3]["keep"] is True and out[3]["cluster_id"] is None
    assert out[1]["keep"] is True and out[2]["keep"] is False


def test_keep_form_row_accounting(planted):
    marks = semantic_dedup(planted, threshold=0.9)
    kept = semantic_dedup_keep(planted, threshold=0.9)
    assert kept.count() == marks.filter("keep").count()
    assert kept.columns == planted.columns


# ---- skew hardening (max_cluster_size) -------------------------------


def test_unskewed_output_identical_with_and_without_cap(planted):
    """On a corpus with no oversized cluster the guard must be a no-op:
    byte-identical marks with the cap enabled (default) vs disabled."""
    a = sorted(map(tuple, semantic_dedup(planted, threshold=0.9).collect()))
    b = sorted(
        map(
            tuple,
            semantic_dedup(
                planted, threshold=0.9, max_cluster_size=None
            ).collect(),
        )
    )
    assert a == b


def _hot_mode_corpus(spark, n_hot=400, n_bg=100, dim=16, scale=0.05, seed=3):
    """One dominant direction holding n_hot DISTINCT vectors (small
    noise around a common mode — the k-means-splittable hot cluster)
    plus n_bg diffuse background rows."""
    rng = np.random.default_rng(seed)
    mode = rng.normal(size=dim)
    mode /= np.linalg.norm(mode)
    rows = [
        (i, [float(x) for x in mode * 10.0 + rng.normal(scale=scale, size=dim)])
        for i in range(n_hot)
    ]
    rows += [
        (10_000 + i, [float(x) for x in rng.normal(size=dim) * 5.0])
        for i in range(n_bg)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hot_cluster_split_bounds_screen_width(spark):
    """A planted hot mode (80% of rows in one cluster) must be split so
    no screened cluster exceeds the cap, with the greedy invariants
    (witness kept, same cluster, one row per input) intact."""
    df = _hot_mode_corpus(spark)
    cap = 50
    out = semantic_dedup(
        df, threshold=0.999, n_clusters=4, max_cluster_size=cap
    ).collect()
    assert len(out) == df.count()  # one row per input
    widths: dict[int, int] = {}
    for r in out:
        widths[r["cluster_id"]] = widths.get(r["cluster_id"], 0) + 1
    assert max(widths.values()) <= cap, sorted(widths.values())[-5:]
    kept = {r["vec_id"] for r in out if r["keep"]}
    cluster = {r["vec_id"]: r["cluster_id"] for r in out}
    for r in out:
        if not r["keep"]:
            assert r["dup_of"] in kept
            assert cluster[r["dup_of"]] == r["cluster_id"]


def test_duplicate_storm_collapses_before_screen(spark):
    """300 EXACT copies of one vector (the crawl-dup storm — k-means
    cannot split identical points) collapse to one screened
    representative; members inherit its outcome exactly."""
    rng = np.random.default_rng(11)
    v = [float(x) for x in rng.normal(size=16)]
    rows = [(1_000 + j, v) for j in range(300)]
    rows += [
        (i, [float(x) for x in rng.normal(size=16) * 5.0]) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, threshold=0.95, n_clusters=4, max_cluster_size=50
        ).collect()
    }
    assert len(out) == 400
    rep = out[1_000]
    # the min-id copy is the representative; every other copy is a dup
    # of the rep (rep kept) or shares the rep's witness (rep dropped)
    expected_witness = 1_000 if rep["keep"] else rep["dup_of"]
    for j in range(1, 300):
        r = out[1_000 + j]
        assert r["keep"] is False
        assert r["dup_of"] == expected_witness
        assert r["cluster_id"] == rep["cluster_id"]


def test_capped_recall_on_hot_mode(spark):
    """Splitting adds sub-cluster boundaries but every sub-cluster still
    collapses internally: with all hot-mode rows mutually over
    threshold, the survivors are at most one per output cluster — the
    dedup still removes ~everything, it does not silently degrade to
    keeping the storm."""
    df = _hot_mode_corpus(spark, n_hot=150, n_bg=50)
    capped = semantic_dedup(
        df, threshold=0.999, n_clusters=4, max_cluster_size=30
    ).collect()
    hot = [r for r in capped if r["vec_id"] < 10_000]
    hot_clusters = {r["cluster_id"] for r in hot}
    hot_kept = [r for r in hot if r["keep"]]
    assert len(hot_kept) <= len(hot_clusters)
    # and the bound really bit: far fewer survivors than rows
    assert len(hot_kept) <= 15
