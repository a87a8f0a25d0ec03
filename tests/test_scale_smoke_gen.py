"""Pin the scale-smoke corpus generator's planted near-dup contract.

SMOKE artifacts only measure recall-at-scale if the generator really
plants recoverable pairs (VERDICT r11 missing #3: the old generator
rolled dup rows onto each other's OLD values, destroying the partner —
`pairs_out: 0` at every scale). These tests pin the repaired contract:

- `_hash_gauss` is batch-independent: the same id yields the same
  vector no matter how ids are grouped (so the planted pair's partner
  provably exists in the distributed corpus).
- every planted pair (id-1, id) at id % PLANT_MOD == 3 has cosine well
  above the smoke thresholds (0.85 / 0.9), and the clustered near-dup
  operator recovers all of them on a small corpus.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale_smoke as S  # noqa: E402
from secure_agent_api_vector_search_spark.operators import dedup as D  # noqa: E402


def test_hash_gauss_batch_independent():
    ids = np.arange(500, dtype=np.int64)
    whole = S._hash_gauss(ids, S.DIM, S.SEED + 1)
    parts = np.vstack(
        [S._hash_gauss(chunk, S.DIM, S.SEED + 1) for chunk in np.array_split(ids, 7)]
    )
    assert np.array_equal(whole, parts)
    # distinct ids get distinct vectors; output is ~standard-normal
    assert not np.array_equal(whole[0], whole[1])
    assert abs(whole.mean()) < 0.05 and abs(whole.std() - 1.0) < 0.05


def test_planted_pairs_have_high_cosine():
    ids = np.arange(3000, dtype=np.int64)
    m = S._hash_gauss(ids, S.DIM, S.SEED + 1)
    dup = (ids % S.PLANT_MOD == 3) & (ids > 0)
    assert dup.sum() == S.planted_pair_count(len(ids))
    src = S._hash_gauss(ids[dup] - 1, S.DIM, S.SEED + 1)
    pert = src + 0.05 * m[dup]
    cos = (src * pert).sum(1) / (
        np.linalg.norm(src, axis=1) * np.linalg.norm(pert, axis=1)
    )
    assert cos.min() > 0.95  # 0.05-perturbation at DIM=64 sits ~0.9988


def test_generated_corpus_pairs_recoverable(spark, tmp_path):
    n = 2000
    out = str(tmp_path / "emb.parquet")
    S._gen_embeddings(spark, n, out)
    emb = spark.read.parquet(out)
    assert emb.count() == n
    planted = (
        spark.range(1, n)
        .filter((F.col("id") % S.PLANT_MOD) == 3)
        .select((F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b"))
    )
    n_planted = planted.count()
    assert n_planted == S.planted_pair_count(n) > 0
    pairs = D.embedding_neardup_pairs_clustered(
        emb, threshold=0.85, dim=S.DIM, nprobe=3
    )
    recovered = pairs.join(planted, ["id_a", "id_b"], "inner").count()
    assert recovered == n_planted
