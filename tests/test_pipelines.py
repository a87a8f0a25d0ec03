"""Batch E3 pipeline jobs: embedding backfill (S6 analog) and index
build/probe round-trip through disk."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark import pipelines as P
from secure_agent_api_vector_search_spark.embedder import embed_text
from secure_agent_api_vector_search_spark.operators import ivf as I
from secure_agent_api_vector_search_spark.operators import topk as TK


def test_backfill_job_roundtrip(spark, docs, tmp_path):
    in_path, out_path = str(tmp_path / "raw"), str(tmp_path / "embedded")
    docs.limit(30).write.parquet(in_path)
    n = P.run_backfill_job(spark, in_path, out_path, dim=16)
    assert n == 30
    out = spark.read.parquet(out_path)
    assert "embedding" in out.columns
    row = out.orderBy("doc_id").head()
    assert list(row["embedding"]) == pytest.approx(embed_text(row["text"], 16))


def test_backfill_only_fills_nulls(spark):
    """Rows that already carry an embedding are left untouched — the
    incremental re-run semantics (reference seeds NULL then backfills,
    sql/03_seed_data.sql:2 + 04_embeddings.sql:5-6)."""
    df = spark.createDataFrame(
        [(1, "some text", [9.0, 9.0]), (2, "other text", None)],
        "doc_id long, text string, embedding array<double>",
    )
    out = {r["doc_id"]: list(r["embedding"]) for r in P.backfill_embeddings(df, dim=2).collect()}
    assert out[1] == [9.0, 9.0]                      # preserved
    assert out[2] == pytest.approx(embed_text("other text", 2))  # filled


def test_index_build_job_and_disk_probe(spark, emb, tmp_path):
    corpus, index_path = str(tmp_path / "corpus"), str(tmp_path / "index")
    emb.write.parquet(corpus)
    n_lists = P.build_and_write_index(spark, corpus, index_path, n_lists=8)
    assert n_lists == 8
    loaded = I.read_ivf(spark, index_path)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    got = {r["vec_id"] for r in I.ivf_search(loaded, q, k=5, nprobe=8).collect()}
    want = {r["vec_id"] for r in TK.topk_similar(emb, q, k=5).collect()}
    assert got == want  # full probe ≡ exact


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Same-bucketed tables equi-join with no Exchange and no Sort on
    either side — the shuffle paid once at write time (the 100 TB
    co-located fact-fact join layout)."""
    orders = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("o_val"))
    lines = spark.range(0, 3000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") + 7).alias("l_val"))
    P.write_bucketed(orders, str(tmp_path / "bo"), "b_orders", ["k"], n_buckets=8)
    P.write_bucketed(lines, str(tmp_path / "bl"), "b_lines", ["k"], n_buckets=8)
    try:
        bo, bl = P.bucketed_tables(spark, "b_orders", "b_lines")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bo.join(bl, "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            assert joined.count() == 3000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lines")
