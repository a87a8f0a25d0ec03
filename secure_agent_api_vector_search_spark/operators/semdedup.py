"""Semantic deduplication — SemDeDup-style embedding dedup ([EXT],
SURVEY.md §2.10).

Strategy (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): k-means the embedding
space, then search for near-duplicate pairs ONLY within each cluster —
the cluster bound turns an O(n²) all-pairs cosine screen into
k × O((n/k)²) independent per-cluster screens, and at the √n list
sizing the expected cluster is √n rows, small enough for one in-memory
numpy block.

Spark shape: centroid fit is the shared bounded-sample driver k-means
(operators/ivf.py::_fit_centroids — same coarse quantizer as the IVF
index, functions/kmeans.py); assignment is the shuffle-free whole-batch
BLAS map (ivf.assign_lists); the per-cluster screen is ONE
applyInPandas over the cluster key — a single shuffle keyed by
cluster_id, each group scored as vectorized numpy. No all-pairs join
exists anywhere in the plan, so the operator survives a 100× scale-up
by raising k (clusters shrink as k grows; cost is n²/k total work
spread over k independent tasks).

Known approximation (inherent to SemDeDup, documented in the paper):
near-duplicate pairs that straddle a cluster boundary are not
compared and both survive. The planted-duplicate tests pin the
recall that matters (exact and near-exact duplicates land in the
same cluster because assignment is deterministic in the vector).

Non-goal here: the reference has no dedup at all (its corpus is 50
seeded rows, sql/03_seed_data.sql) — this is north-star §2.10 surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators.ivf import (
    _fit_centroids,
    assign_lists,
)

_OUT_SCHEMA = (
    "{id} long, cluster_id int, keep boolean, dup_of long"
)


def _screen_cluster(pdf: pd.DataFrame, threshold: float, id_col: str) -> pd.DataFrame:
    """Greedy keep-first screen over one cluster, in id order: a row is
    kept iff its cosine similarity to every already-kept row is below
    ``threshold``; dropped rows record their first witness in
    ``dup_of``. Deterministic: id sort + greedy order ⇒ the kept set is
    unique regardless of partitioning."""
    pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
    vecs = pdf["_vec"].to_numpy()
    n = len(pdf)
    keep = np.ones(n, dtype=bool)
    dup_of = np.full(n, None, dtype=object)
    null_mask = np.fromiter((v is None for v in vecs), dtype=bool, count=n)
    idx = np.flatnonzero(~null_mask)
    if len(idx) > 1:
        m = np.stack(vecs[idx]).astype(np.float64, copy=False)
        norms = np.linalg.norm(m, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            unit = np.where(norms[:, None] > 0, m / norms[:, None], 0.0)
        kept_rows: list[int] = [0]
        for j in range(1, len(idx)):
            sims = unit[kept_rows] @ unit[j]
            hits = np.flatnonzero(sims >= threshold)
            if len(hits):
                keep[idx[j]] = False
                dup_of[idx[j]] = int(pdf[id_col].iloc[idx[kept_rows[int(hits[0])]]])
            else:
                kept_rows.append(j)
    return pd.DataFrame(
        {
            id_col: pdf[id_col],
            "cluster_id": pdf["cluster_id"],
            "keep": keep,
            "dup_of": dup_of,
        }
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup: cluster-bounded cosine near-duplicate removal.

    Output: (id, cluster_id, keep, dup_of) — one row per input row,
    ``keep`` false for rows judged semantic duplicates of an earlier
    (lower-id) kept row in the same cluster, ``dup_of`` that witness's
    id. Rows with null vectors are kept (nothing to compare) with a
    null cluster.
    """
    import math

    if n_clusters is None:
        n_clusters = max(2, int(math.sqrt(embeddings.count())))
    nonnull = embeddings.filter(F.col(vec_col).isNotNull())
    centroids = _fit_centroids(nonnull, vec_col, n_clusters, seed=seed)
    assigned = assign_lists(nonnull, centroids, vec_col).select(
        F.col(id_col),
        F.col("list_id").alias("cluster_id"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
    )
    schema = _OUT_SCHEMA.format(id=id_col)
    screened = assigned.groupBy("cluster_id").applyInPandas(
        lambda pdf: _screen_cluster(pdf, threshold, id_col), schema
    )
    nulls = embeddings.filter(F.col(vec_col).isNull()).select(
        F.col(id_col),
        F.lit(None).cast("int").alias("cluster_id"),
        F.lit(True).alias("keep"),
        F.lit(None).cast("long").alias("dup_of"),
    )
    # No trailing orderBy: output is one row per input row, so a
    # presentation sort would be a corpus-sized range exchange (sampling
    # pass + global sort) purely for display. The driver's value-hash is
    # order-insensitive; callers that need ordered output sort the small
    # slice they display.
    return screened.unionByName(nulls)


def semantic_dedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """The filtered form: the surviving rows of ``embeddings`` (all
    original columns), i.e. the training set after semantic dedup."""
    marks = semantic_dedup(
        embeddings, threshold, n_clusters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    return embeddings.join(
        marks.filter("keep").select(id_col), id_col, "inner"
    )
