"""Product quantization: codebook/encode invariants, ADC self-match,
and the shortlist -> exact re-rank recall contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators import pq as PQ
from secure_agent_api_vector_search_spark.operators import topk as TK


@pytest.fixture(scope="module")
def book_and_codes(spark, emb):
    book = PQ.build_pq(emb, m=8, ksub=32, seed=42)
    codes = PQ.encode_pq(emb, book).cache()
    codes.count()
    return book, codes


def test_pq_codebook_and_code_shapes(book_and_codes, emb):
    book, codes = book_and_codes
    assert book.m == 8 and book.dsub == 8 and book.ksub == 32
    row = codes.head()
    assert len(row["code"]) == 8
    stats = codes.select(F.explode("code").alias("c")).agg(
        F.min("c"), F.max("c")).head()
    assert stats[0] >= 0 and stats[1] < 32
    assert codes.count() == emb.count()


def test_pq_adc_self_match(book_and_codes, emb):
    """Querying with a stored vector must put that vector in the ADC
    top-10 (quantization error is identical for the self pair)."""
    book, codes = book_and_codes
    hits = 0
    probes = emb.filter(F.col("vec_id") % 100 == 0).collect()
    for r in probes:
        got = [x["vec_id"] for x in
               PQ.pq_topk(codes, book, r["embedding"], k=10).collect()]
        hits += r["vec_id"] in got
    assert hits == len(probes)


def test_pq_rerank_recall_vs_exact(book_and_codes, emb, spark):
    """shortlist=100 + exact re-rank: recall@10 >= 0.85 on the
    iid-random corpus (measured ~0.94; ADC-only is ~0.46 here — the
    no-cluster-structure worst case for PQ)."""
    book, codes = book_and_codes
    rows = emb.orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows])
    ids = [r["vec_id"] for r in rows]
    recalls = []
    for qi in range(0, len(ids), max(1, len(ids) // 10)):
        q = X[qi]
        d2 = ((X - q) ** 2).sum(1)
        exact10 = {ids[i] for i in np.argsort(d2, kind="stable")[:10]}
        got = {r["vec_id"] for r in
               PQ.pq_topk_rerank(codes, emb, book, q, k=10, shortlist=100).collect()}
        recalls.append(len(exact10 & got) / 10)
    assert np.mean(recalls) >= 0.85


def test_pq_rerank_distances_are_exact(book_and_codes, emb):
    """Re-ranked distances must equal the true L2^2 (the shortlist is
    approximate, the metric is not)."""
    book, codes = book_and_codes
    probe = emb.head()
    out = PQ.pq_topk_rerank(codes, emb, book, probe["embedding"], k=5).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    q = np.array(probe["embedding"])
    for r in out:
        true = float(((vecs[r["vec_id"]] - q) ** 2).sum())
        assert r["l2sq"] == pytest.approx(true, rel=1e-9)
    assert out[0]["vec_id"] == probe["vec_id"] and out[0]["l2sq"] == pytest.approx(0.0)


def test_ivfpq_full_probe_equals_pq(book_and_codes, emb):
    """Probing every list must reduce IVF-PQ to plain PQ re-rank (the
    composition is pruning-only); a partial probe returns k rows from
    the probed subset with exact distances."""
    from secure_agent_api_vector_search_spark.operators import ivf as I

    book, codes = book_and_codes
    index = I.build_ivf(emb, n_lists=8, seed=42)
    q = emb.head()["embedding"]
    full = PQ.ivfpq_topk(index, codes, emb, book, q, k=5, nprobe=8)
    plain = PQ.pq_topk_rerank(codes, emb, book, q, k=5)
    assert [(r["vec_id"], r["l2sq"]) for r in full.collect()] == \
           [(r["vec_id"], r["l2sq"]) for r in plain.collect()]
    part = PQ.ivfpq_topk(index, codes, emb, book, q, k=5, nprobe=2).collect()
    assert len(part) == 5 and part[0]["l2sq"] == pytest.approx(0.0)


def test_pq_write_read_roundtrip_serves_identical_answers(spark, emb, tmp_path):
    """Encode-once/serve-many: a reloaded PQ index must return the
    bit-identical ADC top-k the in-memory one does."""
    from pyspark.sql import functions as F

    cb = PQ.build_pq(emb, m=8, ksub=16, seed=42)
    codes = PQ.encode_pq(emb, cb)
    path = str(tmp_path / "pq_idx")
    PQ.write_pq(cb, codes, path)
    cb2, codes2 = PQ.read_pq(spark, path)
    assert cb2.m == cb.m and cb2.dsub == cb.dsub
    assert cb2.codebooks == cb.codebooks
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    a = [(r["vec_id"], r["approx_l2sq"]) for r in PQ.pq_topk(codes, cb, q, k=10).collect()]
    b = [(r["vec_id"], r["approx_l2sq"]) for r in PQ.pq_topk(codes2, cb2, q, k=10).collect()]
    assert a == b
