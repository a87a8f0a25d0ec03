"""Golden retrieval fixture: the reference's 50-row seed corpus
(reference sql/03_seed_data.sql:2-51, re-typed per FIXTURES.md §1 into
tests/fixtures/golden_corpus.json) driven through the engine's real
retrieval surface at the reference's embedding dimension (768,
sql/02_schema.sql:14).

Expectations are frozen under the DETERMINISTIC embedder (FIXTURES.md
§4): it is a lexical hashing embedder, so the acceptance queries from
the reference README (README.md:50,66) are pinned to the docs a
bag-of-words model can rank — e.g. "flood damage in basement" hits the
flood-endorsement policy; the README's neural claim (hitting "sump
pump" docs with zero shared vocabulary) is a property of the swapped-in
model behind the embedder seam, not of the engine (SURVEY.md §5
item 3).
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.embedder import embed_text, embed_udf
from secure_agent_api_vector_search_spark.operators.topk import topk_similar

DIM = 768  # reference parity: vector(768), sql/02_schema.sql:14

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_corpus.json")


@pytest.fixture(scope="module")
def golden(spark):
    rows = json.load(open(_FIXTURE))
    docs = spark.createDataFrame(rows)
    emb = docs.select(
        "id", "title", "kind", "withdrawn",
        embed_udf(DIM)(F.col("abstract")).alias("embedding"),
    ).cache()
    emb.count()
    return docs, emb


def _top_ids(emb, query, k=5, **kw):
    top = topk_similar(emb, embed_text(query, DIM), k=k, id_col="id", **kw)
    return [r["id"] for r in top.collect()]


def test_corpus_shape(golden):
    docs, emb = golden
    assert docs.count() == 50
    assert emb.filter(F.size("embedding") == DIM).count() == 50


def test_exact_abstract_query_returns_own_doc_at_similarity_one(golden):
    docs, emb = golden
    target = docs.filter(F.col("id") == "POL-10326103").select("abstract").head()[0]
    top = topk_similar(emb, embed_text(target, DIM), k=1, id_col="id").collect()
    assert top[0]["id"] == "POL-10326103"
    assert top[0]["similarity"] == pytest.approx(1.0, abs=1e-12)


def test_flood_damage_query_hits_flood_endorsement_policy(golden):
    # README.md:66 acceptance query; under the lexical embedder the
    # flood-vocabulary doc is the UK flood-endorsement policy
    _, emb = golden
    assert "POL-11000109" in _top_ids(emb, "flood damage in basement")


def test_roof_leak_query_hits_roof_docs(golden):
    # README.md:50 acceptance query
    _, emb = golden
    top = set(_top_ids(emb, "roof leak"))
    assert top & {"ART-10328431", "ART-11000124", "ART-11000104"}


def test_water_mitigation_query_ranks_water_family(golden):
    # agent/agent.py:15 acceptance query: at least 3 of the top 5 are
    # water-damage-family documents
    _, emb = golden
    water_family = {
        "ART-10326507",  # water damage mitigation procedure
        "ART-11000122",  # frozen pipes
        "ART-11000114",  # wind vs water damage
        "ART-10329436",  # mold after water damage
        "ART-11000118",  # sewer backup
        "POL-10326103",  # HO-3 with water-backup endorsement
        "POL-11000101",  # renters, water damage named peril
    }
    top = _top_ids(emb, "find procedures for mitigating water damage")
    assert len(set(top) & water_family) >= 3


def test_jewelry_query_hits_articles_floater(golden):
    _, emb = golden
    assert "POL-10331073" in _top_ids(emb, "stolen jewelry claim", k=5)


def test_active_only_search_excludes_withdrawn(golden):
    # the reference models withdrawn/expired docs (kind EXPRD/ARCHV,
    # withdrawn=1); retrieval over the active slice must never return one
    _, emb = golden
    active = emb.filter(F.col("withdrawn") == 0)
    top = topk_similar(
        active, embed_text("homeowners policy water backup", DIM),
        k=10, id_col="id", extra_cols=("withdrawn",),
    ).collect()
    assert len(top) == 10
    assert all(r["withdrawn"] == 0 for r in top)


def test_null_embedding_policy_exclude_and_fail(golden):
    # FIXTURES.md §2: ~1% of documents have no embedding yet (the
    # reference's pre-backfill NULL state, sql/03_seed_data.sql:2)
    _, emb = golden
    with_nulls = emb.withColumn(
        "embedding",
        F.when(F.col("id") == "POL-10326103", F.lit(None)).otherwise(F.col("embedding")),
    )
    q = embed_text("homeowners water backup sump pump", DIM)
    ids = [r["id"] for r in topk_similar(with_nulls, q, k=50, id_col="id").collect()]
    assert "POL-10326103" not in ids        # excluded, not crashed
    assert len(ids) == 49                   # everything else still ranked

    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        topk_similar(with_nulls, q, k=5, id_col="id", null_policy="fail").collect()

    with pytest.raises(ValueError):
        topk_similar(with_nulls, q, k=5, id_col="id", null_policy="bogus")
