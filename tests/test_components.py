"""Connected-components keep-one resolution (operators/components.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators import components as CC


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_chain_collapses_to_one_component(spark):
    # 1-2-3-4-5 chain: multi-hop propagation required
    comp = CC.connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    got = {r["node"]: r["comp"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_stay_apart(spark):
    comp = CC.connected_components(_pairs(spark, [(10, 11), (20, 21), (21, 22)]))
    got = {r["node"]: r["comp"] for r in comp.collect()}
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_edge_direction_is_irrelevant(spark):
    # min id appears on the b side
    comp = CC.connected_components(_pairs(spark, [(7, 3), (9, 7)]))
    got = {r["node"]: r["comp"] for r in comp.collect()}
    assert got == {3: 3, 7: 3, 9: 3}


def test_keep_first_drops_non_keepers_keeps_singletons(spark):
    df = spark.range(8).select(F.col("id").alias("doc_id"))
    kept = CC.keep_first(df, _pairs(spark, [(1, 4), (4, 6), (2, 3)]), id_col="doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 5, 7]


def test_keep_first_empty_pairs_keeps_all(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    kept = CC.keep_first(df, _pairs(spark, []), id_col="doc_id")
    assert kept.count() == 5


def test_dup_groups_sizes(spark):
    groups = CC.dup_groups(_pairs(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {r["comp"]: r["n_members"] for r in groups.collect()}
    assert got == {1: 3, 10: 2}


def test_planted_dup_corpus_collapses_to_original_ids(spark, sf_dir):
    """The catalog's end-to-end near-dup pipeline: every planted noisy
    duplicate (doc_id ≥ 200000) must be resolved away, and its original
    must survive as the component keeper."""
    from secure_agent_api_vector_search_spark.catalog import (
        dedup_near_keep_first,
        load_documents,
    )

    from secure_agent_api_vector_search_spark.catalog import _docs_with_noisy_dups
    from secure_agent_api_vector_search_spark.functions import text as X
    from secure_agent_api_vector_search_spark.operators import dedup as D

    kept = {r["doc_id"] for r in dedup_near_keep_first(spark, sf_dir).collect()}
    originals = {
        r["doc_id"] for r in load_documents(spark, sf_dir).select("doc_id").collect()
    }
    # no planted dup survives
    assert not {i for i in kept if i >= 200000}
    # a dropped original must itself be a verified near-dup of something
    # (background pairs exist in the corpus — e.g. doc 12 at sf0.001);
    # anything dropped without appearing in the pair graph would be a bug
    norm = _docs_with_noisy_dups(spark, sf_dir).select(
        "doc_id", X.normalized_text("text").alias("text")
    )
    pairs = D.minhash_near_dup_pairs(norm, threshold=0.5)
    paired = {
        x for r in pairs.collect() for x in (r["id_a"], r["id_b"])
    }
    dropped_originals = originals - kept
    assert dropped_originals <= paired
    # most originals survive (only background near-dups may drop —
    # ~5% of the sf0.001 corpus pairs up at jaccard ≥ 0.5)
    assert len(kept & originals) >= 0.8 * len(originals)


def test_components_keep_first_matches_fingerprint_grouping(spark, sf_dir):
    """Chain-pair graph resolved by iterative components must equal the
    direct fingerprint grouping (the oracle's formulation)."""
    from secure_agent_api_vector_search_spark.catalog import (
        _docs_with_noisy_dups,
        dedup_components_keep_first,
    )
    from secure_agent_api_vector_search_spark.functions import text as X

    docs = _docs_with_noisy_dups(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(X.normalized_text("text")))
    expect = sorted(
        r["doc_id"]
        for r in docs.withColumn("keeper", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id")
        .collect()
    )
    got = [r["doc_id"] for r in dedup_components_keep_first(spark, sf_dir).collect()]
    assert got == expect


def test_components_match_union_find_on_random_graphs(spark):
    """Property check: the distributed min-label algorithm must agree
    with a plain union-find on pseudo-random graphs (fixed seeds) —
    including long chains, stars, and disconnected clutter."""
    import random

    for seed in (7, 21, 1234):
        rng = random.Random(seed)
        n_nodes, n_edges = 200, 150
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        want = {x: find(x) for x in touched}

        got = {
            r["node"]: r["comp"]
            for r in CC.connected_components(
                _pairs(spark, edges)
            ).collect()
        }
        assert got == want, f"seed {seed}"
