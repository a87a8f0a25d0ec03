"""ExactSubstr span-dedup family (operators/substr.py): planted-corpus
span correctness, the keeper-retention strip contract, and the
invariants the rows-only strip op rests on."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators import substr as S

ROWS = [
    (0, "a b c d e f g h i j"),        # shares run a..f with 1 and 3
    (1, "x y a b c d e f q r s t"),
    (2, "unique tokens only here nothing shared zzz qqq"),
    (3, "x y a b c d e f q r s t"),    # exact duplicate of 1
    (4, "m n o p q"),                  # 5 tokens -> one gram, unshared
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"]).cache()


def test_spans_planted(corpus):
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_grams)
        for r in S.duplicated_spans(corpus, k=5).collect()
    }
    # doc 0: grams 'a b c d e' and 'b c d e f' shared -> tokens 0..5
    # docs 1/3: every gram shared (exact dup) -> whole doc one span
    assert got == {
        (0, 0, 5, 6, 2),
        (1, 0, 11, 12, 8),
        (3, 0, 11, 12, 8),
    }


def test_stats_cover_every_doc_and_keep_flag(corpus):
    rows = {r.doc_id: r for r in S.exact_substring_stats(corpus, k=5).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    # zero-span docs must carry zeros and keep=True (not NULL)
    assert rows[2].n_spans == 0 and rows[2].dup_tokens == 0
    assert rows[2].dup_token_frac == 0.0 and rows[2].keep is True
    assert rows[4].keep is True
    # fully-duplicated doc: frac 1.0, dropped by the 0.30 default
    assert rows[1].dup_token_frac == 1.0 and rows[1].keep is False
    assert rows[0].dup_tokens == 6 and rows[0].n_tokens == 10


def test_min_docs_three_ignores_pairs(corpus):
    # run a..f appears in docs 0,1,3 -> 'a b c d e'/'b c d e f' survive
    # min_docs=3; grams private to the 1/3 pair (x y a.., ..q r s t) do not
    spans = S.duplicated_spans(corpus, k=5, min_docs=3)
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    assert got == {(0, 0, 5), (1, 2, 7), (3, 2, 7)}


def test_adjacent_windows_merge_one_span(spark):
    # two duplicated 3-gram occurrences at pos 0 and pos 3 (adjacent,
    # not overlapping) in a doc whose middle gram is NOT duplicated:
    # must merge into one contiguous span 0..5
    df = spark.createDataFrame(
        [
            (0, "p q r s t u W"),
            (1, "p q r zz ww"),
            (2, "s t u kk jj"),
        ],
        ["doc_id", "text"],
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in S.duplicated_spans(df, k=3).collect()
        if r.doc_id == 0
    }
    assert spans == {(0, 0, 5)}


def test_strip_keeper_retention_and_untouched_bit_identity(corpus):
    out = {r.doc_id: r.text for r in S.strip_dup_spans(corpus, k=5).collect()}
    # untouched docs: bit-identical passthrough
    assert out[2] == ROWS[2][1]
    assert out[4] == ROWS[4][1]
    # doc 0 is keeper for the a..f grams -> retains its text unchanged
    assert out[0] == ROWS[0][1]
    # doc 1 keeps what it canonically owns (grams shared only with 3),
    # loses the run whose canonical copy is doc 0
    assert out[1] == "x y q r s t"
    # doc 3 (exact dup, never a keeper) is fully stripped
    assert out[3] == ""


def test_strip_converges_no_cross_doc_dups_remain(corpus):
    stripped = S.strip_dup_spans(corpus, k=5)
    again = S.duplicated_spans(
        stripped.filter(F.col("text") != ""), k=5
    )
    assert again.count() == 0


def test_whitespace_normalization_matches_tokenizer(spark):
    # doubled spaces must not shift positions (house tokenizer
    # normalizes runs of spaces before splitting)
    df = spark.createDataFrame(
        [(0, "a  b c d   e f"), (1, "a b c d e zz")], ["doc_id", "text"]
    )
    spans = {(r.doc_id, r.span_start, r.span_end) for r in S.duplicated_spans(df, k=5).collect()}
    assert spans == {(0, 0, 4), (1, 0, 4)}


def test_param_validation(corpus):
    with pytest.raises(ValueError):
        S.duplicated_spans(corpus, k=1)
    with pytest.raises(ValueError):
        S.duplicated_spans(corpus, min_docs=1)


def test_strip_overlapping_keeper_regions_collapse_by_design(spark):
    """When duplicated regions OVERLAP inside the keeper doc, the
    overlap strips there too and a gram's content can vanish from
    every document — the documented convergence-over-retention trade
    (protecting keeper positions would leave cross-doc duplicates)."""
    df = spark.createDataFrame(
        [
            (0, "p q r x1 x2"),   # keeper of 'p q r'
            (1, "p q r s t"),     # keeper of 'q r s'/'r s t', but its
                                  # 'p q r' span is redundant
            (2, "q r s y1 y2"),   # non-keeper of 'q r s'
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.text for r in S.strip_dup_spans(df, k=3).collect()}
    assert out[0] == "p q r x1 x2"     # keeper copy intact (no overlap)
    assert out[1] == "s t"             # redundant 'p q r' window stripped
    assert out[2] == "y1 y2"           # non-keeper copy stripped
    # the governing invariant: no cross-doc duplication survives
    again = S.duplicated_spans(
        S.strip_dup_spans(df, k=3).filter(F.col("text") != ""), k=3
    )
    assert again.count() == 0


def test_hash_bits_128_matches_64_on_collision_free_corpus(spark, docs):
    """The md5-128 identity must produce the exact same spans and
    stripped text as the xxhash64 default wherever 64-bit hashing is
    collision-free (i.e. everywhere in practice below corpus scale)."""
    for fn in (S.duplicated_spans, S.strip_dup_spans):
        a = {tuple(r) for r in fn(docs, k=5, hash_bits=64).collect()}
        b = {tuple(r) for r in fn(docs, k=5, hash_bits=128).collect()}
        assert a == b and a  # identical AND non-trivial


def test_hash_bits_validation(corpus):
    with pytest.raises(ValueError):
        S.duplicated_spans(corpus, hash_bits=32)


def test_planted_hash_collision_widens_spans_and_128_path_fixes_it(
    spark, monkeypatch
):
    """The documented 64-bit failure mode, made real: collide gram
    identities by truncating the hash to 2 bits. Two UNRELATED docs
    then share a 'duplicated' gram (a false span appears), which the
    full-width identity — exercised through the genuine hash_bits=128
    branch — does not produce."""
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "t u v w x y")], ["doc_id", "text"]
    )
    assert S.duplicated_spans(df, k=3).count() == 0  # truly unrelated
    real = S._gram_hash

    def colliding(gram, hash_bits):
        if hash_bits == 64:  # truncate: every gram falls in 4 buckets
            return F.pmod(F.xxhash64(gram), F.lit(4))
        return real(gram, hash_bits)

    monkeypatch.setattr(S, "_gram_hash", colliding)
    # 8 grams into 4 buckets: pigeonhole guarantees >=1 cross-doc
    # collision -> false duplicated spans under the truncated identity
    assert S.duplicated_spans(df, k=3).count() > 0
    # the 128-bit path (real md5 identity) is immune
    assert S.duplicated_spans(df, k=3, hash_bits=128).count() == 0
