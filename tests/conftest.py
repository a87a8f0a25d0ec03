from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from secure_agent_api_vector_search_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8") or 8))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def docs(spark, sf_dir):
    from secure_agent_api_vector_search_spark.sources.tables import load_documents

    return load_documents(spark, sf_dir).cache()


@pytest.fixture(scope="session")
def emb(spark, sf_dir):
    from secure_agent_api_vector_search_spark.sources.tables import load_embeddings

    return load_embeddings(spark, sf_dir).cache()
