"""IVF (inverted-file) ANN index — the reference's ivfflat rebuilt as
an index-as-table (V5, SURVEY.md §2.3).

Reference: `CREATE INDEX ... USING ivfflat (abstract_embeddings
vector_l2_ops) WITH (lists = 100)` (sql/05_vector_index.sql:3-5) —
coarse quantization: k-means centroids, each row assigned to its
nearest centroid's list; a query probes only the closest lists.
(The reference's index is actually unusable by its own cosine query —
opclass mismatch, V6 — so the EXACT path in operators/topk.py is the
correctness contract and this is the performance path, recall-checked
against it.)

Spark-first design — no custom Catalyst rule needed (SURVEY.md §4):
- BUILD (batch): MLlib KMeans fits centroids (sampled at scale); every
  row gets a `list_id`; the corpus is written partitioned by `list_id`.
  Centroids are a tiny side table (lists ≈ √n rows).
- PROBE (query): rank centroids vs the query vector ON THE DRIVER
  (lists ≈ √n rows — e.g. 10k for 100M vectors, trivially
  driver-sized), then read only the `nprobe` chosen partitions —
  Spark's ordinary **partition pruning** does the physical skipping —
  and run the exact top-k inside them.

At 100 TB: scan cost drops from |corpus| to nprobe/lists of it
(e.g. 10/316 ≈ 3%); the build is one KMeans over a sample plus one
shuffle-free map to assign list ids, and one partitioned write.
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class IvfIndex:
    """In-memory handle: assigned corpus + centroid table."""

    assigned: DataFrame          # corpus columns + list_id
    centroids: list[list[float]]  # list_id -> centroid vector
    id_col: str = "vec_id"
    vec_col: str = "embedding"


def _fit_centroids(
    embeddings: DataFrame, vec_col: str, n_lists: int, seed: int = 42, sample_cap: int = 262_144
) -> list[list[float]]:
    """Coarse-quantizer training: k-means on a bounded driver sample.

    This is the standard IVF recipe (what faiss does): centroid quality
    needs ~100·k training points, not the full corpus, so a ≤256k-row
    sample is collected and Lloyd's algorithm runs in numpy on the
    driver — a 256k × 768-dim sample is ~1.5 GB, driver-sized even at
    100 TB corpus scale. Only the ASSIGNMENT pass (assign_lists) is
    distributed, and it is a shuffle-free map. A distributed MLlib
    KMeans fit costs ~2 Spark jobs per iteration and is strictly slower
    below ~10M training rows.
    """
    import numpy as np

    from secure_agent_api_vector_search_spark.functions.kmeans import lloyd

    n = embeddings.count()
    frac = min(1.0, sample_cap / max(n, 1))
    sample = embeddings if frac >= 1.0 else embeddings.sample(fraction=frac, seed=seed)
    x = np.array(
        [r[0] for r in sample.select(F.col(vec_col).cast("array<double>")).collect()]
    )
    # O(k·n) k-means++ seeding + chunked Lloyd (functions/kmeans.py) —
    # keeps the √n list sizing honest: k≈10k on the 256k-cap sample
    # seeds in seconds, not the hours of the naive O(k²·n) loop.
    c = lloyd(x, n_lists, np.random.default_rng(seed), iters=20)
    return [[float(v) for v in row] for row in c]


def _nearest_lists_udf(centroids: list[list[float]], nprobe: int):
    """Whole-batch numpy centroid ranker: vec column → the nprobe
    nearest list ids, ordered by (L2 distance, list_id).

    The centroid matrix ships ONCE in the task closure and each Arrow
    batch is one (batch × lists) BLAS distance block — the executor
    mirror of the driver-side Lloyd assignment (functions/kmeans.py),
    so train and assign use identical math. The expression alternative
    (transform over an inlined centroid array of per-list HOF l2
    folds) evaluates INTERPRETED — lists·dim ops per row, which at the
    reference's lists=100 × dim=768 makes ingest assignment the
    bottleneck instead of a scan-speed map. Null vectors rank to null
    (callers drop or quarantine them), matching the old expression
    form's null propagation.
    """
    c = np.asarray([[float(x) for x in v] for v in centroids], dtype=np.float64)
    csq = np.einsum("ij,ij->i", c, c)

    @F.pandas_udf("array<int>")
    def rank(v: pd.Series) -> pd.Series:
        vals = v.to_numpy()
        out = np.full(len(vals), None, dtype=object)
        mask = np.fromiter((x is not None for x in vals), dtype=bool, count=len(vals))
        if mask.any():
            m = np.stack(vals[mask]).astype(np.float64, copy=False)
            d = np.einsum("ij,ij->i", m, m)[:, None] - 2.0 * (m @ c.T) + csq[None, :]
            # stable argsort == (distance, list_id) tiebreak
            order = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
            # object-array rows must be assigned individually (a fancy
            # index would coerce the list of rows into a 2-D block)
            for j, row in zip(np.flatnonzero(mask), order):
                out[j] = row
        return pd.Series(out)

    return rank


def assign_lists(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Tag each row with its nearest centroid id (L2, like the
    reference's vector_l2_ops) — a pure map stage, no shuffle, one
    BLAS distance block per Arrow batch (:func:`_nearest_lists_udf`).
    Ties break to the lowest list_id, same as the expression form this
    replaces (array_position of array_min = first occurrence)."""
    ranked = _nearest_lists_udf(centroids, nprobe=1)(F.col(vec_col))
    return embeddings.withColumn("list_id", ranked[0])


def build_ivf(
    embeddings: DataFrame,
    n_lists: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> IvfIndex:
    """Fit + assign. ``n_lists`` defaults to √n (pgvector's own sizing
    guidance; the reference hardcodes 100 for its corpus)."""
    if n_lists is None:
        n_lists = max(2, int(math.sqrt(embeddings.count())))
    centroids = _fit_centroids(embeddings, vec_col, n_lists, seed=seed)
    return IvfIndex(assign_lists(embeddings, centroids, vec_col), centroids, id_col, vec_col)


def write_ivf(index: IvfIndex, path: str) -> None:
    """Persist the index: corpus partitioned BY LIST (so probing is
    partition pruning on disk) + centroids as one small parquet."""
    index.assigned.write.mode("overwrite").partitionBy("list_id").parquet(f"{path}/lists")
    spark = index.assigned.sparkSession
    rows = [(i, c) for i, c in enumerate(index.centroids)]
    spark.createDataFrame(rows, "list_id int, centroid array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def read_ivf(spark: SparkSession, path: str, id_col: str = "vec_id", vec_col: str = "embedding") -> IvfIndex:
    assigned = spark.read.parquet(f"{path}/lists")
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    return IvfIndex(assigned, [list(r["centroid"]) for r in cent_rows], id_col, vec_col)


def rebuild_ivf(
    spark: SparkSession,
    path: str,
    n_lists: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> IvfIndex:
    """Compaction: re-train centroids over the CURRENT corpus (base
    build + everything streamed in since) and rewrite the lists layout.

    This is the maintenance half of the incremental story
    (streaming/ingest.py::start_indexed_ingest appends with frozen
    centroids): run it when ingest volume or distribution drift has
    degraded list balance — the same cadence guidance as pgvector's
    "reindex after heavy writes" for the reference's ivfflat
    (sql/05_vector_index.sql). The rewrite goes through a temp-read
    barrier: ``assigned`` must be fully materialized before the
    overwrite starts, so the new layout is written from a consistent
    snapshot (collect-free — only the KMeans sample ever reaches the
    driver).
    """
    old = read_ivf(spark, path, id_col, vec_col)
    corpus = old.assigned.drop("list_id")
    # materialize the snapshot before overwriting the directory it was
    # read from (write-over-read is undefined otherwise)
    corpus.persist()
    corpus.count()
    index = build_ivf(corpus, n_lists=n_lists, vec_col=vec_col, id_col=id_col, seed=seed)
    write_ivf(index, path)
    corpus.unpersist()
    return read_ivf(spark, path, id_col, vec_col)


def _rank_lists(centroids: list[list[float]], query_vec: Sequence[float]) -> list[int]:
    """Driver-side centroid ranking by L2 — O(lists · dim), trivial."""
    q = [float(x) for x in query_vec]

    def d2(c: list[float]) -> float:
        return sum((a - b) * (a - b) for a, b in zip(c, q))

    return sorted(range(len(centroids)), key=lambda i: (d2(centroids[i]), i))


def ivf_search(
    index: IvfIndex,
    query_vec: Sequence[float],
    k: int = 5,
    nprobe: int = 4,
    metric: str = "cosine",
) -> DataFrame:
    """Probe the nprobe nearest lists, exact top-k within them.

    `filter(list_id IN probes)` prunes partitions when the index was
    written with :func:`write_ivf` (partitionBy list_id) — the physical
    read touches only nprobe/lists of the data.
    """
    from secure_agent_api_vector_search_spark.operators.topk import topk_similar

    probes = _rank_lists(index.centroids, query_vec)[:nprobe]
    pruned = index.assigned.filter(F.col("list_id").isin(probes))
    return topk_similar(
        pruned, query_vec, k=k, metric=metric, id_col=index.id_col, vec_col=index.vec_col
    )


def ivf_search_filtered(
    index: IvfIndex,
    query_vec: Sequence[float],
    predicate,
    k: int = 5,
    nprobe: int = 4,
    metric: str = "cosine",
) -> DataFrame:
    """Filtered ANN: probe pruning × metadata predicate — both filters
    land on the SAME scan (list partition pruning first, then the
    row-level predicate inside the surviving partitions), so cost is
    nprobe/lists of the data even under a selective filter.

    Semantics note (inherent to pre-filtered IVF, same trade as
    pgvector's iterative scan problem): recall is relative to the
    probed lists — a highly selective predicate can empty the probe set
    while matches exist in unprobed lists; raise ``nprobe`` when the
    predicate is narrow. The exact-path alternative is
    :func:`operators.topk.topk_similar_filtered`.
    """
    from secure_agent_api_vector_search_spark.operators.topk import topk_similar

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    probes = _rank_lists(index.centroids, query_vec)[:nprobe]
    pruned = index.assigned.filter(F.col("list_id").isin(probes)).filter(pred)
    return topk_similar(
        pruned, query_vec, k=k, metric=metric, id_col=index.id_col, vec_col=index.vec_col
    )
