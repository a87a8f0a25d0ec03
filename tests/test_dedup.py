"""Dedup family: exact, normalized, MinHash-LSH, SimHash, n-gram
Jaccard, embedding near-dup (blocked exact + LSH scale path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators import dedup as D


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (3, "The quick brown fox jumps over the lazy dog near the river bank today!!"),  # case/punct dup
        (4, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup (1 token)
        (5, "completely different content about distributed query engines and parquet files"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(tiny_docs):
    kept = D.dedup_exact(tiny_docs).select("doc_id").rdd.map(lambda r: r[0]).collect()
    assert sorted(kept) == [1, 3, 4, 5]  # 2 collapsed into 1


def test_dedup_groups_exact(tiny_docs):
    groups = D.dedup_groups_exact(tiny_docs).collect()
    assert len(groups) == 1
    assert groups[0]["keeper_id"] == 1 and groups[0]["n_dups"] == 2


def test_dedup_groups_normalized(tiny_docs):
    groups = D.dedup_groups_normalized(tiny_docs).collect()
    assert len(groups) == 1
    assert groups[0]["keeper_id"] == 1 and groups[0]["n_dups"] == 3  # 1,2,3 fold together


def test_minhash_finds_planted_near_dups(tiny_docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.minhash_near_dup_pairs(tiny_docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs and (1, 4) in pairs
    assert not any(5 in p for p in pairs)  # unrelated doc never pairs


def test_minhash_jaccard_is_exact_on_candidates(tiny_docs):
    row = (
        D.minhash_near_dup_pairs(tiny_docs, threshold=0.5)
        .filter((F.col("id_a") == 1) & (F.col("id_b") == 2))
        .head()
    )
    assert row["jaccard"] == pytest.approx(1.0)  # identical shingle sets


def test_simhash_near_dups(tiny_docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             D.simhash_near_dup_pairs(tiny_docs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0  # identical text → identical fingerprint
    assert not any(5 in p for p in pairs)
    assert all(h <= 3 for h in pairs.values())


def test_simhash_pigeonhole_guarantee(spark):
    """The 4-chunk banding must surface every pair with Hamming ≤ 3
    (chunks−1), regardless of which bits differ — checked directly on
    synthetic bit arrays through the same candidate machinery."""
    from secure_agent_api_vector_search_spark.functions import hashing as H

    base = [i % 2 for i in range(64)]
    flipped = list(base)
    for i in (0, 21, 63):  # 3 flips spread across 3 different chunks
        flipped[i] ^= 1
    df = spark.createDataFrame(
        [(1, base), (2, flipped)], "doc_id long, bits array<int>"
    )
    banded = df.select("doc_id", H.simhash_chunks(F.col("bits")).alias("bands"))
    cand = H.candidate_pairs_from_bands(banded, "doc_id", "bands").collect()
    assert {(r["id_a"], r["id_b"]) for r in cand} == {(1, 2)}
    d = (
        df.alias("a").join(df.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(H.hamming_bits(F.col("a.bits"), F.col("b.bits")).alias("h"))
        .head()["h"]
    )
    assert d == 3


def test_ngram_jaccard_pairs(tiny_docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             D.ngram_jaccard_pairs(tiny_docs, n=3, threshold=0.5).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 4) in pairs
    assert not any(5 in p for p in pairs)


@pytest.fixture(scope="module")
def tiny_vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),   # near dup of 1
        (3, [0.0, 1.0, 0.0], 0),      # orthogonal
        (4, [1.0, 0.0, 0.001], 1),    # near dup of 1 but other block
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_embedding_neardup_blocked(tiny_vecs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.embedding_neardup_pairs(tiny_vecs, threshold=0.99, block_col="label").collect()}
    assert pairs == {(1, 2)}  # (1,4) blocked away, (1,3) below threshold


def test_embedding_neardup_unblocked(tiny_vecs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.embedding_neardup_pairs(tiny_vecs, threshold=0.99).collect()}
    assert pairs == {(1, 2), (1, 4), (2, 4)}


def test_embedding_lsh_recall_vs_exact(spark, sf_dir):
    """The LSH scale path must recover ≥90% of the exact near-dup pairs
    (it is a candidate generator + exact verify, so precision is 1 by
    construction; recall is the probabilistic part). Run on the
    planted-dup corpus — the high-similarity regime sign-LSH is for
    (the raw testdata vectors are near-random: max pairwise cosine
    < 0.5, so there is nothing for ANY ANN method to find there)."""
    from secure_agent_api_vector_search_spark.catalog import _embeddings_with_near_dups

    planted = _embeddings_with_near_dups(spark, sf_dir).cache()
    exact = {(r["id_a"], r["id_b"]) for r in
             D.embedding_neardup_pairs(planted, threshold=0.85).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           D.embedding_neardup_pairs_lsh(planted, threshold=0.85).collect()}
    assert lsh.issubset(exact)  # exact-verify ⇒ no false positives
    assert len(exact) >= 50     # every planted (v, v′) pair qualifies
    assert len(lsh & exact) / len(exact) >= 0.9


def test_lsh_tables_for_sizing():
    """The table-count solver: high thresholds need few tables, moderate
    ones explode — the operator is honest about its regime."""
    few = D.lsh_tables_for(0.9, num_planes=16, target_recall=0.95)
    many = D.lsh_tables_for(0.5, num_planes=16, target_recall=0.95)
    assert few < 64
    assert many >= few


def test_embedding_similarity_join_matches_exact(spark, sf_dir):
    """A×B LSH join: precision 1.0 (exact verify), recall ≥ 0.9 vs the
    brute-force A×B join, and orientation (id_a from A, id_b from B)."""
    from secure_agent_api_vector_search_spark.catalog import (
        _query_vectors_perturbed,
        similarity_join_exact,
        similarity_join_lsh,
    )

    exact = {(r["id_a"], r["id_b"]) for r in similarity_join_exact(spark, sf_dir).collect()}
    lsh_rows = similarity_join_lsh(spark, sf_dir).collect()
    lsh = {(r["id_a"], r["id_b"]) for r in lsh_rows}
    assert lsh.issubset(exact)
    assert len(exact) >= 20            # each perturbed query matches its source
    assert len(lsh & exact) / len(exact) >= 0.9
    n_queries = _query_vectors_perturbed(spark, sf_dir).count()
    assert all(r["id_a"] < n_queries for r in lsh_rows)  # id_a is A-side


def test_minhash_similarity_join_recovers_sources(spark, sf_dir):
    """Two-frame text join: every suffix-perturbed copy of a document
    must recover its source at Jaccard ≥ 0.5, oriented (A, B)."""
    from secure_agent_api_vector_search_spark.catalog import text_similarity_join

    rows = text_similarity_join(spark, sf_dir).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert {(i, i) for i in range(50)} <= pairs  # each copy finds its source
    assert all(r["id_a"] < 50 for r in rows)


def test_minhash_similarity_join_tiny(spark):
    a = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog near the river")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river today"),
            (2, "completely unrelated text about catalyst optimizer internals"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.minhash_similarity_join(a, b, threshold=0.5).collect()}
    assert pairs == {(100, 1)}


def test_similarity_join_exact_plan_shape(spark, sf_dir):
    """The exact A×B path must broadcast the tiny query side into a
    nested-loop join (never shuffle the corpus against it), with the
    query-side slice filter pushed into the parquet scan."""
    from secure_agent_api_vector_search_spark.catalog import similarity_join_exact
    from secure_agent_api_vector_search_spark.plans.explain import (
        assert_in_plan,
        physical_plan,
    )

    # parquet-scan assertions need an uncached table (verify-skill
    # gotcha): if another test's session fixture has cached embeddings,
    # the scan substitutes an InMemoryRelation and PushedFilters never
    # appears — an order-dependent flake, not a plan regression
    spark.catalog.clearCache()
    df = similarity_join_exact(spark, sf_dir)
    assert_in_plan(df, "BroadcastNestedLoopJoin", "PushedFilters")
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan


def test_numpy_screen_matches_bruteforce_across_batch_spans(spark):
    """minhash_candidate_pairs must emit exactly the pairs whose
    signature agreement clears keep_min, regardless of how buckets
    split across Arrow batches — force 16-row batches so wide buckets
    straddle batch boundaries inside the mapInPandas stream."""
    import itertools
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    n_docs, num_hashes, num_bands = 120, 16, 4
    # signatures drawn from a tiny value pool → lots of band collisions
    sigs = rng.integers(0, 3, size=(n_docs, num_hashes)).tolist()
    # reuse the production band hasher so expectations match exactly
    from secure_agent_api_vector_search_spark.operators.dedup import (
        _band_hashes, minhash_candidate_pairs)
    bands = _band_hashes(np.asarray(sigs, dtype=np.int64), num_bands).tolist()
    rows = [(i, sigs[i], bands[i]) for i in range(n_docs)]
    feats = spark.createDataFrame(
        rows, "doc_id long, signature array<bigint>, bands array<bigint>")

    keep_min = 0.5
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        got = {(r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(
            feats, "doc_id", num_hashes, num_bands, keep_min=keep_min).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    # brute force: same bucketing, same screen
    want = set()
    buckets: dict = {}
    for i in range(n_docs):
        for b_id, b_hash in enumerate(bands[i]):
            buckets.setdefault((b_id, b_hash), []).append(i)
    for members in buckets.values():
        for i, j in itertools.combinations(sorted(members), 2):
            agree = sum(x == y for x, y in zip(sigs[i], sigs[j]))
            if agree >= keep_min * num_hashes:
                want.add((i, j))
    assert got == want and len(want) > 0


def test_numpy_screen_star_degrades_overwide_buckets(spark):
    """Buckets wider than max_width must emit min-id star pairs
    UNFILTERED (connectivity candidates), narrower ones the screened
    all-pairs set."""
    import itertools
    import numpy as np

    from secure_agent_api_vector_search_spark.operators.dedup import (
        _band_hashes, minhash_candidate_pairs)

    rng = np.random.default_rng(11)
    n_docs, num_hashes, num_bands = 40, 16, 2
    sig_mat = rng.integers(0, 2, size=(n_docs, num_hashes))
    sig_mat[:20, :8] = 0  # docs 0..19 share band 0 → one 20-wide bucket
    sigs = sig_mat.tolist()
    bands = _band_hashes(np.asarray(sigs, dtype=np.int64), num_bands).tolist()
    feats = spark.createDataFrame(
        [(i, sigs[i], bands[i]) for i in range(n_docs)],
        "doc_id long, signature array<bigint>, bands array<bigint>")

    keep_min, max_width = 0.75, 4
    got = {(r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(
        feats, "doc_id", num_hashes, num_bands,
        keep_min=keep_min, max_width=max_width).collect()}

    want = set()
    buckets: dict = {}
    for i in range(n_docs):
        for b_id, b_hash in enumerate(bands[i]):
            buckets.setdefault((b_id, b_hash), []).append(i)
    saw_wide = False
    for members in buckets.values():
        members = sorted(members)
        if len(members) > max_width:
            saw_wide = True
            want.update((members[0], j) for j in members[1:])
        else:
            for i, j in itertools.combinations(members, 2):
                agree = sum(x == y for x, y in zip(sigs[i], sigs[j]))
                if agree >= keep_min * num_hashes:
                    want.add((i, j))
    assert saw_wide  # the fixture actually exercises the star branch
    assert got == want


def test_numpy_screen_cross_side_orientation_and_coverage(spark):
    """Cross-side mode: pairs span sides only, id_a from side 0, and
    the emitted set equals a brute-force A-block x B-block screen."""
    import numpy as np

    from secure_agent_api_vector_search_spark.operators.dedup import (
        _band_hashes, minhash_candidate_pairs)

    rng = np.random.default_rng(3)
    n_docs, num_hashes, num_bands = 60, 16, 4
    sig_mat = rng.integers(0, 3, size=(n_docs, num_hashes))
    sigs = sig_mat.tolist()
    bands = _band_hashes(sig_mat.astype(np.int64), num_bands).tolist()
    # overlapping id spaces on purpose: both sides use ids 0..29
    rows = [(i % 30, i // 30, sigs[i], bands[i]) for i in range(n_docs)]
    feats = spark.createDataFrame(
        rows, "id long, side int, signature array<bigint>, bands array<bigint>")

    keep_min = 0.5
    got = {(r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(
        feats, "id", num_hashes, num_bands, keep_min=keep_min).collect()}

    buckets: dict = {}
    for i in range(n_docs):
        for b_id, b_hash in enumerate(bands[i]):
            buckets.setdefault((b_id, b_hash), []).append(i)
    want = set()
    for members in buckets.values():
        a = [m for m in members if m < 30]
        b = [m for m in members if m >= 30]
        for i in a:
            for j in b:
                agree = sum(x == y for x, y in zip(sigs[i], sigs[j]))
                if agree >= keep_min * num_hashes:
                    want.add((i % 30, j % 30))
    assert got == want and len(want) > 0


def test_ngram_jaccard_lsh_matches_exact(spark, docs):
    """The LSH form finds the same pairs as the exact (all-pairs) form
    with identical Jaccard values on a planted-dup corpus."""
    from secure_agent_api_vector_search_spark.operators import dedup as D

    dup = docs.filter("doc_id < 20").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail x")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(dup)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.6).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs_lsh(corpus, threshold=0.6).collect()
    }
    assert set(lsh) <= set(exact)  # precision 1.0 (exact verify)
    assert len(lsh) >= 0.95 * len(exact)  # recall at the banding target
    # every PLANTED near-dup (the +100000 tail-appended twins) must be
    # recovered — this pins the recall story the catalog advertises
    planted = {k for k in exact if k[0] >= 100000 or k[1] >= 100000}
    assert planted and planted <= set(lsh)
    assert all(abs(exact[k] - lsh[k]) < 1e-12 for k in lsh)


def test_ngram_jaccard_lsh_rejects_bad_bands(docs):
    from secure_agent_api_vector_search_spark.operators import dedup as D
    import pytest as _pytest

    with _pytest.raises(ValueError):
        D.ngram_jaccard_pairs_lsh(docs, num_hashes=64, num_bands=10)


def test_lsh_paths_have_no_interpreted_pair_expansion(docs, emb):
    """Regression pin for the scale defects fixed in round 4: the LSH
    candidate paths must expand pairs in Arrow-batched python stages
    (MapInPandas / ArrowEval nodes), never via collect_list + nested
    lambda-transform expressions (interpreted)."""
    from secure_agent_api_vector_search_spark.operators import dedup as D

    plans = {
        "embedding": D.embedding_neardup_pairs_lsh(emb, threshold=0.85, dim=16),
        "simhash": D.simhash_near_dup_pairs(docs),
        "ngram_lsh": D.ngram_jaccard_pairs_lsh(docs),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan, name
        # the interpreted expansion's signature was collect_list of
        # bucket-member structs fed to nested transforms; the gram sets
        # legitimately use collect_set, so collect_list alone is the pin
        # (scan-side per-token lambdas are bounded per doc and fine)
        assert "collect_list" not in plan, name


def test_dedup_incremental_drops_seen_and_batch_dups(spark):
    from secure_agent_api_vector_search_spark.operators.dedup import dedup_incremental

    seen = spark.createDataFrame(
        [(0, "The quick brown fox."), (2, "Lorem ipsum dolor sit amet.")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the QUICK brown fox!!"),   # normalized dup of seen doc 0
            (11, "A genuinely new document"),
            (12, "a genuinely NEW document"),  # within-batch dup of 11
            (13, "Another fresh one"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup_incremental(batch, seen).collect())
    assert kept == [11, 13]


def test_dedup_incremental_idempotent_after_absorbing_batch(spark):
    """Once the kept batch is folded into `seen`, re-running the same
    batch yields nothing — the steady-state ingest invariant."""
    from secure_agent_api_vector_search_spark.operators.dedup import dedup_incremental

    seen = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(5, "gamma delta"), (6, "ALPHA beta")], "doc_id long, text string"
    )
    kept = dedup_incremental(batch, seen)
    assert [r["doc_id"] for r in kept.collect()] == [5]
    grown = seen.unionByName(kept)
    assert dedup_incremental(batch, grown).count() == 0


def test_minhash_incremental_keeps_only_novel_content(spark):
    from secure_agent_api_vector_search_spark.operators.dedup import minhash_incremental

    base = ("the quick brown fox jumps over the lazy dog while the rain "
            "in spain falls mainly on the plain and the cat sat on the mat")
    other = ("colorless green ideas sleep furiously under a bright cold "
            "april sky as the clocks were striking thirteen in the tower")
    third = ("we hold these truths to be self evident that all documents "
            "deserve exactly one representative in the training corpus")
    seen = spark.createDataFrame(
        [(0, base), (2, other)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, base.replace("lazy", "sleepy")),   # near-dup of seen 0
            (11, third),                            # novel cluster, keeper
            (12, third.replace("exactly", "precisely")),  # near-dup of 11
            (13, "completely different tiny payload with enough words to "
                 "shingle into a genuinely distinct signature vector here"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in minhash_incremental(batch, seen).collect())
    assert kept == [11, 13]


def test_minhash_incremental_idempotent_after_absorbing_batch(spark):
    from secure_agent_api_vector_search_spark.operators.dedup import minhash_incremental

    text_a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    text_b = ("one two three four five six seven eight nine ten eleven "
              "twelve thirteen fourteen fifteen sixteen seventeen eighteen")
    seen = spark.createDataFrame([(0, text_a)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(5, text_b), (6, text_a + " extra tail")], "doc_id long, text string"
    )
    kept = minhash_incremental(batch, seen)
    assert [r["doc_id"] for r in kept.select("doc_id").collect()] == [5]
    grown = seen.unionByName(kept.select("doc_id", "text"))
    assert minhash_incremental(batch, grown).count() == 0


def test_dedup_incremental_plan_is_anti_join_no_global_sort(spark, docs):
    from secure_agent_api_vector_search_spark.operators.dedup import dedup_incremental
    from pyspark.sql import functions as F

    seen = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    plan = dedup_incremental(batch, seen)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert "rangepartitioning" not in plan.lower()


def test_text_jaccard_join_exact_cross_equals_index(spark, docs):
    """The two exact candidate strategies must produce identical pair
    sets with identical Jaccard values — 'cross' is a plan choice, not
    a semantics choice."""
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.operators.dedup import (
        text_jaccard_join_exact,
    )

    base = docs.select("doc_id", "text").filter(F.col("doc_id") < 60)
    qdocs = base.filter(F.col("doc_id") < 15).select(
        "doc_id", F.concat(F.col("text"), F.lit(" tail note")).alias("text")
    )
    cross = text_jaccard_join_exact(qdocs, base, threshold=0.5, via="cross").collect()
    index = text_jaccard_join_exact(qdocs, base, threshold=0.5, via="index").collect()
    assert sorted(map(tuple, cross)) == sorted(map(tuple, index))
    got = {(r["id_a"], r["id_b"]) for r in cross}
    assert {(i, i) for i in range(15)} <= got  # every query recovers its source


def test_simhash_exact_twin_matches_banded(spark, docs):
    """Pigeonhole identity: Hamming <= 3 over 4 chunks means the banded
    candidate pass cannot miss a pair — banded == exact all-pairs."""
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_pairs_exact,
    )

    corpus = docs.select("doc_id", "text").filter(F.col("doc_id") < 80).unionAll(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 7000).alias("doc_id"), "text"
        )
    )
    exact = {(r["id_a"], r["id_b"], r["hamming"])
             for r in simhash_pairs_exact(corpus).collect()}
    banded = {(r["id_a"], r["id_b"], r["hamming"])
              for r in simhash_near_dup_pairs(corpus).collect()}
    assert exact == banded
    assert len(exact) >= 20  # the planted verbatim copies are Hamming 0


def test_text_jaccard_join_exact_rejects_nonpositive_threshold(spark, docs):
    import pytest as _pytest

    from secure_agent_api_vector_search_spark.operators.dedup import (
        text_jaccard_join_exact,
    )

    small = docs.select("doc_id", "text").limit(3)
    with _pytest.raises(ValueError, match="threshold"):
        text_jaccard_join_exact(small, small, threshold=0.0)


# ---------------------------------------------------------------- bloom


def test_bloom_filter_no_false_negatives_and_low_fpp(spark):
    """Every inserted key must probe positive (structural guarantee);
    non-members pass at roughly the configured fpp."""
    from secure_agent_api_vector_search_spark.functions import bloom as B

    members = spark.range(0, 2000).selectExpr("md5(cast(id as string)) AS k")
    others = spark.range(2000, 22000).selectExpr("md5(cast(id as string)) AS k")
    bf = B.build_bloom(members, "k", fpp=0.01)
    try:
        assert B.filter_might_contain(members, "k", bf).count() == 2000
        fp_rate = B.filter_might_contain(others, "k", bf).count() / 20000
        assert fp_rate < 0.05  # 0.01 nominal, generous margin
    finally:
        bf.destroy()


def test_bloom_params_sizing_and_bounds():
    from secure_agent_api_vector_search_spark.functions.bloom import bloom_params

    m, k = bloom_params(1000, 0.01)
    assert 9000 < m < 11000 and 5 <= k <= 9  # ~9.6 bits/item, k≈7
    m_min, _ = bloom_params(1, 0.5)
    assert m_min >= 64
    m_cap, _ = bloom_params(10**12, 0.001)
    assert m_cap <= 1 << 30
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_dedup_incremental_bloom_matches_base_form(spark, docs):
    """The bloom form is a plan optimization: output must be
    bit-identical to dedup_incremental on the same corpus — including
    an adversarially high-overlap batch (worst case for the sketch)."""
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_bloom,
    )

    seen = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    # batch = odd originals + re-id'd copies of HALF the corpus (dense
    # overlap) + a within-batch dup
    overlap = seen.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    batch = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .unionAll(overlap)
    )
    base = sorted(r["doc_id"] for r in dedup_incremental(batch, seen).collect())
    blm = sorted(r["doc_id"] for r in dedup_incremental_bloom(batch, seen).collect())
    assert base == blm and len(base) > 0


def test_dedup_incremental_bloom_rejects_reserved_column(spark):
    import pytest as _pytest

    from secure_agent_api_vector_search_spark.operators.dedup import (
        dedup_incremental_bloom,
    )

    bad = spark.createDataFrame([(1, "x", "y")], "doc_id long, text string, _fp string")
    seen = spark.createDataFrame([(0, "z")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="_fp"):
        dedup_incremental_bloom(bad, seen)


def test_fingerprint_ledger_corpus_side_is_exchange_free(spark, docs):
    """The bucketed ledger's promise, asserted on executed plans:
    output parity with the base form, and — with broadcast disabled so
    the join must distribute — the bucketed ledger plan (a) reads the
    buckets as its distribution (`SelectedBucketsCount` on the scan)
    and (b) carries strictly fewer Exchanges than the identical query
    against a non-bucketed ledger. Comparing against the unbucketed
    twin is drift-proof: whatever the plan format, bucketing must have
    removed at least the corpus-side shuffle."""
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_vs_ledger,
        write_fingerprint_ledger,
    )

    seen = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS fp_ledger_test")
    spark.sql("DROP TABLE IF EXISTS fp_ledger_flat")
    write_fingerprint_ledger(seen, "fp_ledger_test")
    # unbucketed twin: same rows, no layout
    spark.table("fp_ledger_test").write.mode("overwrite").format("parquet").saveAsTable(
        "fp_ledger_flat"
    )
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe_bcast = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "64MB"
    )
    try:
        out = dedup_incremental_vs_ledger(batch, "fp_ledger_test")
        base = sorted(r["doc_id"] for r in dedup_incremental(batch, seen).collect())
        got = sorted(r["doc_id"] for r in out.collect())
        assert got == base and len(got) > 0

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        def executed_plan(table: str) -> str:
            df = dedup_incremental_vs_ledger(batch, table)
            df.count()
            return df._jdf.queryExecution().executedPlan().toString()

        bucketed = executed_plan("fp_ledger_test")
        flat = executed_plan("fp_ledger_flat")
        assert "SelectedBucketsCount" in bucketed
        assert bucketed.count("Exchange") < flat.count("Exchange")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe_bcast)
        spark.sql("DROP TABLE IF EXISTS fp_ledger_test")
        spark.sql("DROP TABLE IF EXISTS fp_ledger_flat")


def test_embedding_neardup_clustered_matches_exact(spark, sf_dir):
    """The cluster-blocked scale form (spherical-k-means blocks,
    nprobe=2 multi-assignment, exact in-block verify — VERDICT r10
    item 6) must recover the exact pair set on a planted-dup corpus:
    near-dup pairs are near-coincident vectors, so nprobe=2 covers the
    Voronoi-boundary cases the single-assignment form would split."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 16))
    rows = [(i, base[i].tolist()) for i in range(200)]
    # 20 planted near-dups of the first 20 vectors
    rows += [
        (1000 + i, (base[i] + 0.05 * rng.normal(size=16)).tolist())
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r["id_a"], r["id_b"]) for r in
             D.embedding_neardup_pairs(df, threshold=0.9).collect()}
    clustered = {(r["id_a"], r["id_b"]) for r in
                 D.embedding_neardup_pairs_clustered(
                     df, threshold=0.9, n_lists=8, nprobe=2).collect()}
    assert exact, "fixture must plant pairs"
    assert clustered == exact
    # shared-both-lists pairs must not double-emit
    out = D.embedding_neardup_pairs_clustered(
        df, threshold=0.9, n_lists=8, nprobe=2).collect()
    assert len(out) == len({(r["id_a"], r["id_b"]) for r in out})


def test_embedding_neardup_clustered_auto_n_lists_and_hot_cluster_skew(spark):
    """Two r11-verdict requirements in one fixture: (a) n_lists=None
    (the shipped default) derives k from the corpus size at the target
    block size instead of a fixed 16; (b) an ADVERSARIAL hot cluster —
    most of the corpus collapsing into one k-means list — still
    produces the exact pair set, with the oversized block screened in
    bounded gram tiles (screen_tile) rather than one |l|² allocation."""
    import numpy as np

    rng = np.random.default_rng(11)
    hub = rng.normal(size=16)
    hub /= np.linalg.norm(hub)
    # 300 vectors piled around one direction (the hot cluster) …
    rows = [(i, (hub + 0.03 * rng.normal(size=16)).tolist())
            for i in range(300)]
    # … plus 60 spread vectors so the fit still finds other centroids
    rows += [(500 + i, rng.normal(size=16).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r["id_a"], r["id_b"]) for r in
             D.embedding_neardup_pairs(df, threshold=0.995).collect()}
    assert exact, "the hot cluster must contain true pairs"
    # screen_tile=16 forces many tiles over the ~300-row hot block;
    # target_block_size=30 makes the default rule derive k=12 (>16
    # floor not hit: max(16, 360//30)=16 — use the floor) …
    got = {(r["id_a"], r["id_b"]) for r in
           D.embedding_neardup_pairs_clustered(
               df, threshold=0.995, nprobe=2, screen_tile=16).collect()}
    assert got == exact
    # explicit target_block_size drives the derived k above the floor
    got2 = {(r["id_a"], r["id_b"]) for r in
            D.embedding_neardup_pairs_clustered(
                df, threshold=0.995, nprobe=3, screen_tile=16,
                target_block_size=10).collect()}
    assert got2 == exact


def test_attach_pair_payloads_broadcasts_only_bare_pairs(spark):
    """r13 verify-join restructure: the exact-verify payload attach must
    (a) reproduce the sequential-enrichment rows exactly and (b) never
    place a payload-carrying relation inside a BroadcastExchange — the
    r12 shape broadcast the first probe's RESULT (pairs + arrays),
    which is unbounded in dup density and hits the 8 GB broadcast cap
    at corpus scale (round-12 ADVICE)."""
    import re

    from secure_agent_api_vector_search_spark.plans.explain import physical_plan

    cand = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "id_a long, id_b long")
    pay = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in (1, 2, 3, 4)], "id long, v array<double>"
    )
    side_a = pay.select(F.col("id").alias("id_a"), F.col("v").alias("_va"))
    side_b = pay.select(F.col("id").alias("id_b"), F.col("v").alias("_vb"))
    got = D._attach_pair_payloads(cand, side_a, side_b)
    rows = {
        (r["id_a"], r["id_b"], tuple(r["_va"]), tuple(r["_vb"]))
        for r in got.collect()
    }
    want = {
        (a, b, (float(a),) * 4, (float(b),) * 4)
        for a, b in [(1, 2), (1, 3), (2, 3)]
    }
    assert rows == want
    # every BroadcastExchange input is the bare pair frame: its Input
    # line in the formatted plan must not mention a payload column
    plan = physical_plan(got)
    details = re.split(r"\n\(\d+\) ", plan)
    bad = [
        d.splitlines()[0:3]
        for d in details
        if d.startswith("BroadcastExchange") and ("_va" in d or "_vb" in d)
    ]
    assert not bad, f"payload columns inside a broadcast: {bad}"
    assert "BroadcastExchange" in plan  # the bare pairs DO broadcast
