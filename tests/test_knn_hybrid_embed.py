"""kNN join/classify, hybrid search, deterministic embedder, and the
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.embedder import embed_text, embed_udf
from secure_agent_api_vector_search_spark.operators import hybrid as HY
from secure_agent_api_vector_search_spark.operators import knn as K
from secure_agent_api_vector_search_spark.operators import multimodal as M


def test_knn_join_self_is_rank_one(emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = K.knn_join(queries, emb, k=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])  # output order is unspecified
        assert rows[0]["rank"] == 1
        assert rows[0]["neighbor_id"] == q_id  # the vector itself
        assert rows[0]["similarity"] == pytest.approx(1.0)


def test_knn_join_exclude_self(emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = K.knn_join(queries, emb, k=2, exclude_self=True).collect()
    assert all(r["neighbor_id"] != r["q_id"] for r in got)


def test_knn_join_combiner_bounds_window_exchange(spark, emb):
    """The pre-window combiner (VERDICT r3 #7): the row_number exchange
    must read the partition-local top-k stream (≤ |Q|·k·partitions
    rows), not the full |Q|·|corpus| scored cross product — and the
    reduced form must return the identical exact answer."""
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = K.knn_join(queries, emb, k=3, dim=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the combiner sits between the scoring join and the window exchange
    assert "MapInPandas" in plan
    assert plan.index("Window") < plan.index("MapInPandas") < plan.index(
        "BroadcastNestedLoopJoin"
    )  # executed plan prints top-down: window consumes the combiner output

    n_corpus = emb.count()
    n_parts = emb.rdd.getNumPartitions()
    # what actually crosses into the window: the combiner's output rows
    scored = emb.crossJoin(F.broadcast(queries)).select(
        F.col("q_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.lit(0.0).alias("similarity"),
    )
    reduced_rows = scored.mapInPandas(
        K._local_topk_combiner("q_id", 3), schema=scored.schema
    ).count()
    assert reduced_rows <= 5 * 3 * max(n_parts, 1) < 5 * n_corpus

    # answer parity with the unreduced window form (sorted client-side:
    # operator output order is unspecified)
    got = sorted((r["q_id"], r["rank"], r["neighbor_id"]) for r in out.collect())
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id").asc()
    )
    import secure_agent_api_vector_search_spark.functions.vector as V

    ref = (
        emb.crossJoin(F.broadcast(queries))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine_similarity("embedding", F.col("q_vec"), 64).alias("similarity"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    )
    assert got == sorted((r["q_id"], r["rank"], r["neighbor_id"]) for r in ref)


def test_knn_classify_tiny(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 7), (2, [0.9, 0.1], 7), (3, [0.95, 0.05], 7), (4, [0.0, 1.0], 8)],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05])], "q_id long, q_vec array<double>"
    )
    row = K.knn_classify(queries, corpus, k=3).head()
    assert row["predicted_label"] == 7 and row["votes"] == 3


def test_keyword_hits(spark):
    df = spark.createDataFrame([(1, "spark and spark and sparkle")], "doc_id long, text string")
    assert df.select(HY.keyword_hits("text", "spark").cast("long")).head()[0] == 3


def test_hybrid_search_fuses_scores(docs, emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    rows = HY.hybrid_search(docs, emb, term="the", query_vec=q, k=10).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["score"] == pytest.approx(0.1 * r["kw_hits"] + r["similarity"])
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_hand_computed(spark):
    # 3 docs, query ["a", "b"]: tf/df/avgdl small enough to verify by hand.
    df = spark.createDataFrame(
        [(1, "a a b x"), (2, "a x x x"), (3, "x y z w")],
        "doc_id long, text string",
    )
    import math

    def bm25(tf, df_t, n=3.0, dl=4.0, avgdl=4.0, k1=1.2, b=0.75):
        idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    rows = {r["doc_id"]: r["score"] for r in HY.bm25_search(df, ["a", "b"], k=10).collect()}
    assert set(rows) == {1, 2}  # doc 3 has no query term → filtered out
    assert rows[1] == pytest.approx(bm25(2.0, 2.0) + bm25(1.0, 1.0))
    assert rows[2] == pytest.approx(bm25(1.0, 2.0))
    assert rows[1] > rows[2]


def test_bm25_case_insensitive_and_k(spark):
    df = spark.createDataFrame(
        [(i, ("Spark " * (i + 1)).strip()) for i in range(5)],
        "doc_id long, text string",
    )
    rows = HY.bm25_search(df, ["spark"], k=3).collect()
    assert len(rows) == 3
    # higher tf → higher score → doc_ids 4,3,2 in order
    assert [r["doc_id"] for r in rows] == [4, 3, 2]


def test_embed_text_deterministic_unit_norm():
    a = embed_text("hello world hello")
    b = embed_text("hello world hello")
    assert a == b
    import math

    assert math.sqrt(sum(x * x for x in a)) == pytest.approx(1.0)


def test_embed_udf_matches_driver_side(spark):
    texts = ["alpha beta gamma", "delta epsilon", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(embed_udf(64)(F.col("text")).alias("e")).collect()
    for row, t in zip(got, texts):
        assert list(row["e"]) == pytest.approx(embed_text(t, 64))


def test_embedded_similar_texts_are_closer():
    import math

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    base = embed_text("the quick brown fox jumps over the lazy dog")
    near = embed_text("the quick brown fox jumps over the lazy cat")
    far = embed_text("parquet columnar storage with vectorized execution")
    assert cos(base, near) > cos(base, far)


def test_multimodal_features_schema_and_determinism(docs):
    out = M.multimodal_features(docs.limit(20))
    rows1 = out.collect()
    rows2 = out.collect()
    assert rows1 == rows2
    assert out.columns == [
        "doc_id", "mime", "n_bytes", "payload_sha256", "width", "height", "n_channels"
    ]
    for r in rows1:
        assert r["n_bytes"] > 0 and len(r["payload_sha256"]) == 64
        assert 64 <= r["width"] <= 64 + 255 and 64 <= r["height"] <= 64 + 255


def test_multimodal_real_decoder_is_explicit_stub(docs):
    with pytest.raises(Exception) as exc_info:
        M.extract_features(
            M.attach_binary_payload(docs.limit(1)), decode_stub=False
        ).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_knn_join_null_corpus_vectors_never_evict_candidates(spark):
    """A not-yet-embedded corpus row (null vector) must neither appear
    as a neighbor nor crowd a genuine candidate out of the combiner's
    bounded per-partition state."""
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, None),  # backfill race: present but unembedded
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    ).repartition(1)  # one partition -> nulls share the combiner state
    q = spark.createDataFrame([(0, [1.0, 0.0])], "q_id long, q_vec array<double>")
    out = sorted(K.knn_join(q, corpus, k=3).collect(), key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in out] == [1, 2, 4]
    assert all(r["similarity"] is not None for r in out)


def test_knn_join_null_element_scores_never_evict_candidates(spark):
    """An array with a null ELEMENT passes the vector-level IsNotNull
    scan filter but scores NULL -> NaN inside the Arrow combiner; the
    combiner must drop it (pandas would sort NaN first under DESC and
    evict a genuine candidate the downstream window never gets back)."""
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [None, 1.0]),  # element-null: survives IsNotNull, scores NULL
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    ).repartition(1)
    q = spark.createDataFrame([(0, [1.0, 0.0])], "q_id long, q_vec array<double>")
    out = sorted(K.knn_join(q, corpus, k=3).collect(), key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in out] == [1, 2, 4]
    assert all(r["similarity"] is not None for r in out)


def test_grouped_topk_null_element_never_evicts(spark):
    """Same residual in topk_similar_grouped: the shared combiner holds
    only rankable rows, so a null-element vector cannot occupy a head
    slot that belongs to a genuine candidate."""
    from secure_agent_api_vector_search_spark.operators import topk as TK

    items = spark.createDataFrame(
        [
            ("g", 1, [1.0, 0.0]),
            ("g", 2, [0.9, 0.1]),
            ("g", 3, [None, 1.0]),
            ("g", 4, [0.0, 1.0]),
        ],
        "grp string, vec_id long, embedding array<double>",
    ).repartition(1)
    out = TK.topk_similar_grouped(items, [1.0, 0.0], k=3, group_col="grp").collect()
    assert [r["vec_id"] for r in out] == [1, 2, 4]


def test_rrf_fusion_hand_computed(spark):
    """3-doc corpus where the fused winner tops NEITHER single list:
    doc 2 is rank 2 in both lists and beats each list's rank-1 loner."""
    from secure_agent_api_vector_search_spark.operators.hybrid import rrf_search

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark spark"),       # BM25 rank 1, no vec rank
            (2, "spark words close to query"),    # rank 2 in both
            (3, "unrelated filler text entirely"),  # vec rank 1 only
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [0.9, 0.4358898943540674]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = rrf_search(docs, emb, ["spark"], [1.0, 0.0], k=3, depth=2).collect()
    assert [r["doc_id"] for r in rows] == [2, 1, 3]
    r2 = rows[0]
    assert (r2["r_kw"], r2["r_vec"]) == (2, 2)
    assert r2["rrf_score"] == pytest.approx(2 / 62, abs=1e-9)
    # loners carry a null rank for the missing list
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["r_vec"] is None and by_id[3]["r_kw"] is None
    assert by_id[1]["rrf_score"] == pytest.approx(1 / 61, abs=1e-9)


def test_knn_join_grouped_stays_in_group(spark):
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "en"),
            (2, [0.9, 0.1], "en"),
            (3, [0.99, 0.01], "de"),   # closest overall, wrong group
            (4, [0.0, 1.0], "en"),
        ],
        "vec_id long, embedding array<double>, lang string",
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0], "en")], "q_id long, q_vec array<double>, lang string"
    )
    out = sorted(
        K.knn_join(q, corpus, k=2, match_col="lang").collect(),
        key=lambda r: r["rank"],
    )
    assert [r["neighbor_id"] for r in out] == [1, 2]  # 3 excluded by group


def test_rrf_search_honors_custom_id_columns(spark):
    """The fusion id contract: id_col names the documents side and the
    output; vec_id_col names the embeddings frame's key."""
    from secure_agent_api_vector_search_spark.operators.hybrid import rrf_search

    docs = spark.createDataFrame(
        [(1, "spark spark"), (2, "nothing here")], "post_id long, text string"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "embedding_key long, embedding array<double>"
    )
    rows = rrf_search(
        docs, emb, ["spark"], [1.0, 0.0], k=2, depth=2,
        id_col="post_id", vec_id_col="embedding_key",
    ).collect()
    assert rows and rows[0]["post_id"] == 1   # top in both lists
    assert "post_id" in rows[0].asDict()


def test_hard_negatives_excludes_own_group_and_self(spark):
    from secure_agent_api_vector_search_spark.operators.knn import hard_negatives

    # group g0: vectors near +x; g1 near -x; g2 mixed
    rows = [
        (0, [1.0, 0.0], "g0"), (1, [0.9, 0.1], "g0"),
        (2, [-1.0, 0.0], "g1"), (3, [-0.9, 0.1], "g1"),
        (4, [0.8, 0.2], "g2"), (5, [0.0, 1.0], "g2"),
    ]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding", "group"])
    queries = corpus.filter("vec_id = 0").selectExpr(
        "vec_id as q_id", "embedding as q_vec", "group as q_group"
    )
    out = hard_negatives(queries, corpus, k=3, group_col="group", dim=2)
    got = [(r.neighbor_id, r.rank) for r in out.orderBy("rank").collect()]
    # own-group vec 1 (most similar overall) MUST be absent; so is self;
    # vec 3 (cos -0.994) outranks vec 2 (cos -1.0)
    assert [n for n, _ in got] == [4, 5, 3]
    assert [r for _, r in got] == [1, 2, 3]


def test_hard_negatives_matches_bruteforce(emb, docs):
    import numpy as np

    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.operators.knn import hard_negatives

    corpus = emb.select("vec_id", "embedding").join(
        docs.select(F.col("doc_id").alias("vec_id"), "source"), "vec_id"
    )
    queries = corpus.filter("vec_id < 4").selectExpr(
        "vec_id as q_id", "embedding as q_vec", "source as q_group"
    )
    out = hard_negatives(queries, corpus, k=3, group_col="source", dim=64)
    got = {
        (r.q_id, r.rank): r.neighbor_id for r in out.collect()
    }
    rows = corpus.collect()
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.source) for r in rows}
    for q in range(4):
        qv, qsrc = vecs[q]
        scored = sorted(
            (
                (float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), cid)
                for cid, (v, src) in vecs.items()
                if src != qsrc and cid != q
            ),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_, cid) in enumerate(scored[:3], start=1):
            assert got[(q, rank)] == cid
