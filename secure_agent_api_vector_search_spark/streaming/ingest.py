"""Streaming document ingest with embedding backfill ([EXT],
SURVEY.md §2.9).

The reference claims "Real-time RAG: as soon as a new policy is
added … it is immediately searchable" (README.md:69) — in Postgres
that is just transactional visibility. The Spark-native equivalent is
Structured Streaming: `readStream` on an arrival directory → embed via
the batched pandas UDF (the sql/04_embeddings.sql:5-6 backfill, run
incrementally instead of as a full-table UPDATE) → `foreachBatch`
append to the serving corpus. Checkpointing gives exactly-once appends;
no watermark is needed because the capability is ingest freshness, not
event-time analytics (events.py covers that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from secure_agent_api_vector_search_spark.embedder import embed_udf

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def embed_documents(docs: DataFrame, dim: int = 64) -> DataFrame:
    """Attach embeddings to a (batch or streaming) documents frame —
    the incremental form of the reference's one-shot UPDATE backfill."""
    return docs.withColumn("embedding", embed_udf(dim)(F.col("text")))


def start_ingest(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    dim: int = 64,
) -> StreamingQuery:
    """readStream(parquet dir) → embed → append parquet, exactly-once
    via checkpoint. `maxFilesPerTrigger` bounds batch size so embedding
    latency stays flat as the directory grows."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )
    embedded = embed_documents(stream, dim)
    return (
        embedded.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
