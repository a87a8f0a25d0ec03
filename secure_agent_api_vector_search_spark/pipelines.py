"""Batch ingest / backfill / index-build jobs — the reference's E3
pipeline (SURVEY.md §3) as plain DataFrame jobs.

Reference mapping:
- `UPDATE customer_records_data SET abstract_embeddings =
  embedding('text-embedding-005', abstract)` (sql/04_embeddings.sql:5-6,
  S6): parquet has no in-place UPDATE, so the backfill is
  read → withColumn(embedding) → overwrite-to-new-location — idempotent
  and re-runnable; only rows with a null/absent embedding are
  recomputed when a prior embedded table is supplied.
- `CREATE INDEX ... USING ivfflat` (sql/05_vector_index.sql:3-5, V5):
  build_and_write_index fits the coarse quantizer and writes the corpus
  partitioned by list_id (probing = partition pruning; operators/ivf.py).

At scale both are embarrassingly parallel map jobs plus one partitioned
write; the embedding UDF is the only Python stage (Arrow-batched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.embedder import embed_udf
from secure_agent_api_vector_search_spark.operators import ivf as I


def backfill_embeddings(
    docs: DataFrame,
    text_col: str = "text",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Attach embeddings where missing. If ``vec_col`` already exists,
    only null rows are (re)computed — the incremental re-run shape of
    the reference's full-table UPDATE (seed rows insert NULL embeddings,
    sql/03_seed_data.sql:2, backfilled later)."""
    emb = embed_udf(dim)(F.col(text_col))
    if vec_col in docs.columns:
        return docs.withColumn(
            vec_col, F.coalesce(F.col(vec_col), emb)
        )
    return docs.withColumn(vec_col, emb)


def run_backfill_job(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    text_col: str = "text",
    dim: int = 64,
) -> int:
    """Read raw docs parquet → embed → write embedded corpus. Returns
    the row count written (the job's idempotency check)."""
    docs = spark.read.parquet(in_path)
    embedded = backfill_embeddings(docs, text_col=text_col, dim=dim)
    embedded.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path).count()


def build_and_write_index(
    spark: SparkSession,
    corpus_path: str,
    index_path: str,
    n_lists: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> int:
    """Fit the IVF coarse quantizer, assign lists, write the
    list-partitioned index + centroid table. Returns n_lists."""
    emb = spark.read.parquet(corpus_path)
    index = I.build_ivf(emb, n_lists=n_lists, vec_col=vec_col, id_col=id_col, seed=seed)
    I.write_ivf(index, index_path)
    return len(index.centroids)


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """Persist a table bucketed (hash-clustered) + sorted on the join
    key — Spark's co-located-join layout.

    At 100 TB the dominant recurring cost of fact-fact joins is the
    shuffle of both sides on the join key. Bucketing pays that shuffle
    ONCE at write time: every future equi-join (or aggregation) on
    ``bucket_cols`` between tables bucketed with the same count reads
    pre-clustered files and plans a sort-merge join with NO Exchange on
    either side (and no Sort, via ``sortBy``). tests/test_pipelines.py
    asserts the exchange-free plan.

    The table is external (data at ``path``); bucket metadata lives in
    the session catalog, which is the part parquet files alone cannot
    carry — plain `.parquet()` readers see ordinary files.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def bucketed_tables(spark: SparkSession, left: str, right: str) -> tuple[DataFrame, DataFrame]:
    """Read two same-bucketed tables for a shuffle-free equi-join."""
    return spark.table(left), spark.table(right)
