"""Batch kNN join and kNN classification.

[EXT] similarity-join operators (SURVEY.md §2.5b, §2.10): the reference
answers one query vector at a time (tools.yaml:22-27); a pipeline needs
"for EACH query row, its k nearest corpus rows".

Spark shape: broadcast the (small) query set against the corpus —
a broadcast nested-loop with a codegen'd similarity expression — then
`row_number() OVER (PARTITION BY query ORDER BY score)` to keep k per
query. The corpus is never shuffled; cost is one scan × |Q|.
For |Q| too large to broadcast, the scale path is the IVF route
(operators/ivf.py): assign each query to nprobe lists and shuffle-join
on list_id, which turns the cross product into a partition-pruned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.functions import vector as V


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """For each query row, the k most-cosine-similar corpus rows.

    Output: (q_id, neighbor_id, similarity, rank), rank 1..k,
    deterministic tiebreak on neighbor id. ``exclude_self`` drops the
    corpus row whose id equals the query id (for more-like-this /
    leave-one-out evaluation).
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    if exclude_self:
        joined = joined.filter(F.col(c_id) != F.col(q_id))
    sim = V.cosine_similarity(F.col(c_vec), F.col(q_vec))
    w = Window.partitionBy(q_id).orderBy(F.col("similarity").desc(), F.col("neighbor_id").asc())
    return (
        joined.select(F.col(q_id), F.col(c_id).alias("neighbor_id"), sim.alias("similarity"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(q_id, "rank")
    )


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    label_col: str = "label",
    **kw,
) -> DataFrame:
    """Majority-vote label of the k nearest neighbors (leave-one-out:
    the query row itself is excluded when ids collide). Tiebreak: most
    votes, then smaller label. Output: (q_id, predicted_label, votes)."""
    q_id = kw.get("q_id", "q_id")
    c_id = kw.get("c_id", "vec_id")
    neighbors = knn_join(queries, corpus, k=k, exclude_self=True, **kw)
    labeled = neighbors.join(
        corpus.select(F.col(c_id).alias("neighbor_id"), F.col(label_col).alias("nb_label")),
        "neighbor_id",
    )
    votes = labeled.groupBy(q_id, "nb_label").agg(F.count("*").alias("votes"))
    w = Window.partitionBy(q_id).orderBy(F.col("votes").desc(), F.col("nb_label").asc())
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(q_id), F.col("nb_label").alias("predicted_label"), "votes")
        .orderBy(q_id)
    )
