"""EndpointEmbedder — the production-path adapter for the reference's
remote-model V1 (tools.yaml:24), exercised entirely through a fake
transport (no network in this environment, by design)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.embedder import (
    EndpointEmbedder,
    embed_text,
)

DIM = 16


def fake_transport(texts):
    """Deterministic stand-in for the model endpoint: the hashing
    embedder applied batch-wise (top-level function → picklable, like
    a real client factory must be)."""
    return [embed_text(t, DIM) for t in texts]


def test_embed_text_driver_surface():
    e = EndpointEmbedder(fake_transport, dim=DIM)
    assert e.embed_text("water damage") == embed_text("water damage", DIM)


def test_udf_matches_driver_surface(spark):
    df = spark.createDataFrame(
        [(1, "roof leak"), (2, "flood damage in basement"), (3, None)],
        "doc_id long, text string",
    )

    # defined in-function: cloudpickle ships it by VALUE inside the UDF
    # closure (a test-module top-level name is pickled by reference and
    # is not importable on executors — exactly the picklability rule
    # the EndpointEmbedder docstring imposes on real transports)
    def transport(texts):
        return [embed_text(t, DIM) for t in texts]

    e = EndpointEmbedder(transport, dim=DIM)
    rows = {r["doc_id"]: r["v"] for r in
            df.select("doc_id", e.embed_udf()(F.col("text")).alias("v")).collect()}
    assert rows[1] == pytest.approx(embed_text("roof leak", DIM))
    assert rows[2] == pytest.approx(embed_text("flood damage in basement", DIM))
    assert rows[3] == pytest.approx(embed_text("", DIM))  # null -> "" policy


def test_batch_size_rechunks_requests():
    sizes = []

    def spy(texts):
        sizes.append(len(texts))
        return fake_transport(texts)

    e = EndpointEmbedder(spy, dim=DIM, batch_size=3)
    out = e._call(["a"]) and None  # direct call: one request
    vecs = []
    texts = [f"doc {i}" for i in range(8)]
    for i in range(0, len(texts), e.batch_size):
        vecs.extend(e._call(texts[i : i + e.batch_size]))
    assert len(vecs) == 8
    assert sizes == [1, 3, 3, 2]  # never exceeds batch_size
    assert out is None


def test_transient_failure_retries_then_succeeds():
    calls = {"n": 0}
    slept = []

    def flaky(texts):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("endpoint hiccup")
        return fake_transport(texts)

    e = EndpointEmbedder(flaky, dim=DIM, max_retries=2, sleep=slept.append)
    assert e.embed_text("ok") == embed_text("ok", DIM)
    assert calls["n"] == 3
    assert slept == [0.5, 1.0]  # exponential backoff, injected sleep


def test_persistent_failure_raises_after_retries():
    def down(_texts):
        raise ConnectionError("endpoint down")

    e = EndpointEmbedder(down, dim=DIM, max_retries=1, sleep=lambda _s: None)
    with pytest.raises(ConnectionError):
        e.embed_text("x")


def test_malformed_response_raises_immediately():
    e = EndpointEmbedder(lambda ts: [[0.0] * DIM] * (len(ts) + 1), dim=DIM,
                         sleep=lambda _s: None)
    with pytest.raises(ValueError, match="vectors for"):
        e.embed_text("x")

    e2 = EndpointEmbedder(lambda ts: [[0.0] * (DIM - 1) for _ in ts], dim=DIM,
                          sleep=lambda _s: None)
    with pytest.raises(ValueError, match="dim"):
        e2.embed_text("x")
