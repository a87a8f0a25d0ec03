"""Generated-oracle seam (oracle_gen.py): corpus-fingerprint guard and
replay determinism. The full Spark-vs-oracle value comparisons for the
generated entries run through tools/mini_driver.py and the external
gate; these tests pin the seam's failure modes, which the gate cannot
see (a correctly failing guard looks identical to a broken oracle in a
pass/fail row)."""

from __future__ import annotations

import duckdb
import pytest

from secure_agent_api_vector_search_spark import oracle_gen as OG

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_guard_passes_on_matching_corpus():
    core = "SELECT COUNT(*) AS n FROM documents"
    sql = OG.with_corpus_guard(core, "documents", "doc_id", SF001)
    con = _con(SF001)
    n_docs = con.sql(f"SELECT COUNT(*) FROM '{SF001}/documents.parquet'").fetchone()[0]
    assert con.sql(sql).fetchall() == [(n_docs,)]


def test_guard_raises_descriptive_error_on_wrong_corpus():
    """VERDICT r7 item 3: an oracle generated against one sf_dir run
    against another must FAIL LOUDLY with a descriptive message, never
    present as a silent value mismatch."""
    sql = OG.with_corpus_guard(
        "SELECT COUNT(*) AS n FROM documents", "documents", "doc_id", SF001
    )
    con = _con(SF01)  # gate corpus differs from the generation corpus
    with pytest.raises(Exception) as exc:
        con.sql(sql).fetchall()
    msg = str(exc.value)
    assert "generated oracle" in msg and "SPARK_GRAFT_ORACLE_SF_DIR" in msg
    assert SF001 in msg  # says WHICH corpus it was built against


def test_generated_oracles_carry_the_guard(monkeypatch):
    """Every generated oracle must refuse a foreign corpus — including
    the pre-existing BPE pair (the seam ADVICE r7 flagged)."""
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", SF001)
    from secure_agent_api_vector_search_spark import catalog as C

    gens = {
        "bpe_encode": C._bpe_encode_oracle,
        "tokenizer_fertility": C._tokenizer_fertility_oracle,
        "bpe_tokenize_corpus": C._bpe_tokenize_corpus_oracle,
        "image_neardup": OG.image_neardup_oracle,
        "video_frame_features": OG.video_frame_features_oracle,
        "semantic_dedup": OG.semantic_dedup_oracle,
        "ivf_topk": OG.ivf_topk_oracle,
        "pq_topk_rerank": OG.pq_topk_rerank_oracle,
    }
    con = _con(SF01)
    for name, gen in gens.items():
        with pytest.raises(Exception, match="generated oracle"):
            con.sql(gen()).fetchall()


def test_sql_float_round_trips_exactly():
    """Bare numeric literals parse as DECIMAL in DuckDB and can land an
    ulp off after the DECIMAL->DOUBLE hop; the VARCHAR->DOUBLE cast
    _sql_float emits must round-trip bit-exactly."""
    con = duckdb.connect()
    for x in (116.97272727272727, 1.0 / 3.0, 2.0**-52, 1e300, -0.0):
        got = con.sql(f"SELECT {OG._sql_float(x)}").fetchone()[0]
        assert got == x and repr(got) == repr(float(x))


def test_hamming_block_matches_bit_count():
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**63, size=17, dtype=np.int64).view(np.uint64)
    b = rng.integers(0, 2**63, size=23, dtype=np.int64).view(np.uint64)
    got = OG._hamming_block(a, b)
    for i in range(len(a)):
        for j in range(0, len(b), 5):
            assert got[i, j] == bin(int(a[i]) ^ int(b[j])).count("1")


def test_replay_fingerprints_are_memoized():
    OG._FP_CACHE.clear()
    n1, fp1 = OG.corpus_fingerprint(SF001, "documents")
    n2, fp2 = OG.corpus_fingerprint(SF001, "documents")
    assert (n1, fp1) == (n2, fp2) and len(OG._FP_CACHE) == 1
    assert n1 > 0 and len(fp1) == 32


def test_fingerprint_distinguishes_same_ids_different_content():
    """sf0.001 and sf0.01 ship the SAME doc_id range with different
    text — the digest must cover content, not just ids."""
    OG._FP_CACHE.clear()
    a = OG.corpus_fingerprint(SF001, "documents")
    b = OG.corpus_fingerprint(SF01, "documents")
    assert a[0] == b[0] == 500  # same shape...
    assert a[1] != b[1]  # ...different corpus


def test_xxh64_replay_matches_spark_xxhash64(spark):
    """The simhash replay oracle rests on this identity: the pure-
    Python XXH64 must be bit-identical to the JVM expression at seed
    42, across length classes (empty, <4, <8, <32, >=32, multibyte)."""
    cases = ["", "a", "abc", "abcdefg", "hello world", "x" * 31,
             "y" * 32, "z" * 100, "日本語テキスト", "w123 w456", "W123!"]
    got = spark.sql(
        "SELECT " + ", ".join(f"xxhash64('{c}')" for c in cases)
    ).collect()[0]
    for c, jvm in zip(cases, got):
        mine = OG.xxh64(c.encode("utf-8"), 42)
        assert mine - (1 << 64 if mine >= (1 << 63) else 0) == jvm, c


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_hll_and_quantile_replays_match_spark(spark, sf):
    """The corpus_stats_approx oracle rests on these identities: the
    pure-Python HLL++ register replay (XXH64 seed 42, linear counting)
    must be bit-identical to Spark's approx_count_distinct at rsd=0.02,
    and the exact-order-statistic replay must match percentile_approx
    at accuracy 10000 — at all three testdata scales."""
    import os

    from pyspark.sql import functions as F

    sf_dir = f"/root/testdata/{sf}"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip(f"{sf} testdata not present")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    jvm_hll = toks.agg(F.approx_count_distinct("tok", 0.02)).collect()[0][0]
    jvm_q = docs.select(
        F.percentile_approx(
            F.size(F.split("text", " ")).cast("long"), [0.5, 0.9, 0.99], 10000
        ).alias("q")
    ).collect()[0].q
    texts = [r.text for r in docs.select("text").collect()]
    values = [t for text in texts for t in (text or "").split(" ")]
    lens = [len((text or "").split(" ")) for text in texts]
    assert OG._hll_replay(values, 0.02) == jvm_hll
    assert OG._quantile_summary_replay(lens, (0.5, 0.9, 0.99)) == list(jvm_q)


def test_hll_replay_refuses_beyond_linear_regime():
    """Past the linear-counting threshold the oracle would need the
    bias tables — it must refuse loudly, not replay approximately."""
    values = [f"tok{i}" for i in range(20000)]  # >> p=12 threshold 3100
    with pytest.raises(RuntimeError, match="linear-counting|zero registers"):
        OG._hll_replay(values, 0.02)


def test_independent_lloyd_canary_matches_ivf_witness():
    """Shared-bug canary (VERDICT r9 item 10): a from-scratch Lloyd
    re-implementation — no functions/kmeans import — must reproduce
    the exact ivf_topk witness on the gate corpus: centroids,
    assignment, and the probed-list set. The per-row distance kernel
    keeps the same expanded float expression (bit-identity requires an
    identical float op order); everything AROUND it is re-derived
    independently: the centroid update uses np.add.at scatter instead
    of argsort+reduceat, empty clusters via np.where instead of masked
    assignment, convergence spelled out instead of np.allclose, and
    the probe ranking via lexsort instead of stable argsort."""
    import numpy as np

    sf_dir = "/root/testdata/sf0.001"
    ids, x = OG._load_embeddings(sf_dir)
    k, nprobe, seed = 16, 10, 42

    rng = np.random.default_rng(seed)
    n, d = x.shape
    xsq = np.einsum("ij,ij->i", x, x)
    c = np.empty((k, d), dtype=np.float64)
    c[0] = x[rng.integers(n)]
    d2 = np.maximum(xsq - 2.0 * (x @ c[0]) + c[0] @ c[0], 0.0)
    for i in range(1, k):
        tot = d2.sum()
        p = d2 / tot if tot > 0 else None
        pick = x[rng.choice(n, p=p)]
        c[i] = pick
        np.minimum(d2, np.maximum(xsq - 2.0 * (x @ pick) + pick @ pick, 0.0),
                   out=d2)
    for _ in range(20):
        dist = xsq[:, None] - 2.0 * (x @ c.T) + np.einsum("ij,ij->i", c, c)[None, :]
        a = dist.argmin(axis=1)
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, a, x)
        cnt = np.zeros(k, dtype=np.int64)
        np.add.at(cnt, a, 1)
        nc = np.where(cnt[:, None] > 0, sums / np.maximum(cnt, 1)[:, None], c)
        if bool((np.abs(nc - c) <= 1e-8 + 1e-5 * np.abs(c)).all()):
            break
        c = nc

    ref = OG._fit_centroids_replay(x, k, seed)
    assert np.allclose(c, ref, rtol=1e-10, atol=1e-12)
    # the decisions derived from the centroids must be IDENTICAL
    assign_ind = (
        xsq[:, None] - 2.0 * (x @ c.T)
        + np.einsum("ij,ij->i", c, c)[None, :]
    ).argmin(axis=1)
    assert np.array_equal(assign_ind, OG._assign_replay(x, ref))
    q = x[int(np.flatnonzero(ids == 0)[0])]
    dq = np.einsum("ij,ij->i", c, c) - 2.0 * (c @ q)
    probes_ind = np.lexsort((np.arange(k), dq))[:nprobe]
    assert set(map(int, probes_ind)) == set(
        int(p) for p in OG._rank_lists_replay(ref, q)[:nprobe]
    )
