"""Training-sequence packing (operators/packing.py): invariants the
hash oracle can't phrase — budget respected, nothing dropped, overflow
singletons, positional contiguity, determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators import packing as PK


@pytest.fixture(scope="module")
def assigned(docs):
    return PK.pack_sequences(docs, max_tokens=256, n_buckets=8).cache()


def test_every_doc_exactly_once(docs, assigned):
    assert assigned.count() == docs.count()
    assert assigned.select("doc_id").distinct().count() == docs.count()


def test_budget_respected_except_overflow_singletons(assigned):
    per_seq = assigned.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("t"), F.count("*").alias("n")
    )
    bad = per_seq.filter((F.col("t") > 256) & (F.col("n") > 1)).count()
    assert bad == 0  # only a single oversized doc may exceed the budget


def test_positions_contiguous(assigned):
    per_seq = assigned.groupBy("seq_id").agg(
        F.count("*").alias("n"),
        F.min("pos_in_seq").alias("lo"),
        F.max("pos_in_seq").alias("hi"),
    )
    assert per_seq.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count() == 0


def test_oversized_doc_is_singleton(spark):
    df = spark.createDataFrame(
        [(1, "w " * 400), (2, "a b c"), (3, "d e f")],
        "doc_id long, text string",
    )
    out = PK.pack_sequences(df, max_tokens=10, n_buckets=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    big_seq = rows[1]["seq_id"]
    assert sum(1 for r in rows.values() if r["seq_id"] == big_seq) == 1
    assert rows[2]["seq_id"] == rows[3]["seq_id"]  # 3+3 <= 10 packs together


def test_deterministic(docs):
    a = sorted(PK.pack_sequences(docs, max_tokens=256).collect())
    b = sorted(PK.pack_sequences(docs, max_tokens=256).collect())
    assert a == b


def test_sequence_stats_consistent(docs, assigned):
    s = PK.sequence_stats(assigned, max_tokens=256).head()
    assert s["n_docs"] == docs.count()
    assert s["n_sequences"] == assigned.select("seq_id").distinct().count()
    assert 0.0 < s["mean_fill"] <= 1.0
    # corpus docs are ~8-80 words against a 256 budget: fill must be decent
    assert s["mean_fill"] > 0.5


def test_rejects_bad_budget(docs):
    with pytest.raises(ValueError):
        PK.pack_sequences(docs, max_tokens=0)


def test_write_packed_shards_roundtrip(spark, docs, tmp_path):
    from secure_agent_api_vector_search_spark.pipelines import write_packed_shards
    from secure_agent_api_vector_search_spark.functions.text import token_count

    out = str(tmp_path / "shards")
    write_packed_shards(docs, out, max_tokens=256, n_buckets=8)
    shards = spark.read.parquet(out)
    # every document's tokens land exactly once across all sequences
    assert shards.agg(F.sum("n_docs")).head()[0] == docs.count()
    total_doc_tokens = docs.agg(F.sum(token_count("text"))).head()[0]
    assert shards.agg(F.sum("n_tokens")).head()[0] == total_doc_tokens
    # concatenated text re-tokenizes to the recorded count (single-space
    # join of clean texts is token-count preserving)
    bad = shards.filter(token_count("text") != F.col("n_tokens")).count()
    assert bad == 0
    # disk layout: one directory per packing bucket
    import os

    buckets = {d for d in os.listdir(out) if d.startswith("bucket=")}
    assert len(buckets) == 8
