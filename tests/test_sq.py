"""SQ8 scalar quantization (operators/sq.py): quantization error
bounds, recall vs the exact path, and the rerank contract."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators import sq as SQ
from secure_agent_api_vector_search_spark.operators import topk as TK


@pytest.fixture(scope="module")
def params(emb):
    return SQ.build_sq(emb)


@pytest.fixture(scope="module")
def codes(emb, params):
    return SQ.encode_sq(emb, params).cache()


def test_roundtrip_error_bounded(spark, emb, params, codes):
    """decode(encode(v)) is within scale/2 per dimension."""
    mins = np.asarray(params.mins)
    scales = np.asarray(params.scales)
    orig = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.limit(50).collect()
    }
    got = {r["vec_id"]: bytes(r["code"]) for r in codes.collect()}
    for vid, v in orig.items():
        c = np.frombuffer(got[vid], dtype=np.uint8)
        assert len(c) == params.dim
        decoded = mins + scales * c
        assert np.all(np.abs(decoded - v) <= scales / 2 + 1e-9)


def test_code_is_8x_smaller(params, emb):
    bytes_per_vec = params.dim  # one byte per dim
    float64_bytes = params.dim * 8
    assert float64_bytes / bytes_per_vec == 8.0


def test_sq_topk_recall_vs_exact(emb, params, codes):
    q = [float(x) for x in emb.filter("vec_id = 7").head()["embedding"]]
    exact = {r["vec_id"] for r in TK.topk_similar(emb, q, k=10, metric="dot").collect()}
    approx = {r["vec_id"] for r in SQ.sq_topk(codes, params, q, k=10).collect()}
    # per-dimension resolution keeps SQ8 close to exact on dot product
    assert len(exact & approx) >= 8
    # self-match survives quantization
    assert 7 in approx


def test_sq_rerank_matches_exact_topk(emb, params, codes):
    q = [float(x) for x in emb.filter("vec_id = 3").head()["embedding"]]
    exact = [r["vec_id"] for r in TK.topk_similar(emb, q, k=5, metric="cosine").collect()]
    rr = SQ.sq_topk_rerank(codes, emb, params, q, k=5, shortlist=50).collect()
    assert [r["rank"] for r in rr] == [1, 2, 3, 4, 5]
    got = [r["vec_id"] for r in rr]
    # with a 50-wide shortlist on a 500-row corpus the rerank recovers
    # the exact head
    assert got == exact


def test_build_sq_rejects_empty(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        SQ.build_sq(df)


def test_encode_sq_skips_null_vectors(spark, emb, params):
    """Not-yet-embedded rows (null vector, SURVEY §1.2 backfill state)
    are excluded at encode time — same null policy as every other
    vector operator — instead of crashing the Arrow batch."""
    nulls = spark.createDataFrame(
        [(99901, None), (99902, None)], "vec_id long, embedding array<double>"
    )
    mixed = emb.select("vec_id", "embedding").limit(20).unionByName(nulls)
    codes = SQ.encode_sq(mixed, params)
    assert codes.count() == 20
    assert codes.filter("code is null").count() == 0
    # and the search path tolerates a null code row defensively
    q = [float(x) for x in emb.filter("vec_id = 7").head()["embedding"]]
    withnull = codes.unionByName(
        spark.createDataFrame([(99903, None)], "vec_id long, code binary")
    )
    got = {r["vec_id"] for r in SQ.sq_topk(withnull, params, q, k=5).collect()}
    assert 99903 not in got and len(got) == 5


def test_sq_write_read_roundtrip_serves_identical_answers(spark, emb, tmp_path):
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.operators import sq as S

    params = S.build_sq(emb)
    codes = S.encode_sq(emb, params)
    path = str(tmp_path / "sq_idx")
    S.write_sq(params, codes, path)
    p2, codes2 = S.read_sq(spark, path)
    assert p2.mins == params.mins and p2.scales == params.scales
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    a = [(r["vec_id"], r["approx_dot"]) for r in S.sq_topk(codes, params, q, k=10).collect()]
    b = [(r["vec_id"], r["approx_dot"]) for r in S.sq_topk(codes2, p2, q, k=10).collect()]
    assert a == b
