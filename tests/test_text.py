"""Text-analysis functions and operators (functions/text.py,
operators/textops.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.functions import text as X
from secure_agent_api_vector_search_spark.operators import textops as TX


def _df(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_token_count(spark):
    df = _df(spark, "a b c d")
    assert df.select(X.token_count("text")).head()[0] == 4


def test_distinct_token_count(spark):
    df = _df(spark, "a b a b c")
    assert df.select(X.distinct_token_count("text")).head()[0] == 3


def test_mean_token_length(spark):
    df = _df(spark, "ab cdef")  # (2+4)/2
    assert df.select(X.mean_token_length("text")).head()[0] == pytest.approx(3.0)


def test_stopword_ratio(spark):
    df = _df(spark, "the cat and the dog")  # the, and, the → 3/5
    assert df.select(X.stopword_ratio("text")).head()[0] == pytest.approx(0.6)


def test_quality_score_bounds(docs):
    rows = docs.select(X.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_lang_id_guess(spark):
    rows = [
        (1, "the cat is in the house and it is happy", "en"),
        (2, "el gato es de la casa y la familia que vive en una ciudad", "es"),
        (3, "der hund ist ein tier und das haus ist mit von der familie", "de"),
        (4, "le chat est dans les maisons et pour une famille que nous aimons", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, expected string")
    got = df.select("expected", X.lang_id_guess("text").alias("guess")).collect()
    for r in got:
        assert r["guess"] == r["expected"]


def test_normalized_text(spark):
    df = _df(spark, "  Hello,   WORLD!! 42  ")
    assert df.select(X.normalized_text("text")).head()[0] == "hello world 42"


def test_char_shingles(spark):
    df = _df(spark, "abcdef")
    got = df.select(X.char_shingles("text", 5)).head()[0]
    assert got == ["abcde", "bcdef"]


def test_char_shingles_short_text_empty(spark):
    df = _df(spark, "abc")
    assert df.select(X.char_shingles("text", 5)).head()[0] == []


def test_token_shingles(spark):
    df = _df(spark, "a b c d")
    got = df.select(X.token_shingles("text", 3)).head()[0]
    assert got == ["a b c", "b c d"]


def test_bag_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "x y z z"), (2, "z y x"), (3, "x y w")], "doc_id long, text string"
    )
    fps = [r[0] for r in df.select(X.bag_fingerprint("text")).collect()]
    assert fps[0] == fps[1] and fps[0] != fps[2]


def test_rolling_hash_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten"),
         (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    fps = [tuple(r[0]) for r in df.select(X.rolling_hash_fingerprint("text")).collect()]
    assert fps[0] == fps[1] and len(fps[0]) > 0


def test_corpus_token_totals(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    row = TX.corpus_token_totals(df).head()
    assert row["n_docs"] == 2 and row["total_tokens"] == 6 and row["distinct_tokens"] == 4


def test_lang_profile(docs):
    rows = TX.lang_profile(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(r["avg_chars"] > 0 for r in rows)


def test_doc_repetition_hand_values(spark):
    df = spark.createDataFrame(
        [
            # "spam spam spam spam": distinct 1/4, top word 4/4, top bigram 3/3
            (1, "spam spam spam spam"),
            # all-distinct doc: ratios 1.0, 1/5, 1/4
            (2, "alpha beta gamma delta epsilon"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TX.doc_repetition(df).collect()}
    r1, r2 = rows[1], rows[2]
    assert r1["n_words"] == 4 and r1["distinct_word_ratio"] == 0.25
    assert r1["top_word_frac"] == 1.0 and r1["top_bigram_frac"] == 1.0
    assert r1["keep"] is False
    assert r2["n_words"] == 5 and r2["distinct_word_ratio"] == 1.0
    assert r2["top_word_frac"] == 0.2 and r2["top_bigram_frac"] == 0.25
    assert r2["keep"] is False  # top_word_frac 0.2 > 0.12 on a tiny doc


def test_doc_repetition_corpus_discriminates(docs):
    out = TX.doc_repetition(docs)
    n = out.count()
    kept = out.filter("keep").count()
    assert 0 < kept < n  # thresholds separate the corpus, not degenerate


def test_corpus_stats_approx_bounds(docs):
    """HLL vocab estimate within 5x the configured 2% rsd of exact;
    sketch percentiles bracketed by exact min/max."""
    exact = TX.corpus_token_totals(docs).head()
    approx = TX.corpus_stats_approx(docs).head()
    assert approx["n_docs"] == exact["n_docs"]
    assert approx["total_tokens"] == exact["total_tokens"]
    rel_err = abs(approx["approx_distinct_tokens"] - exact["distinct_tokens"]) / exact["distinct_tokens"]
    assert rel_err <= 0.10
    p50, p90, p99 = approx["tokens_p50"], approx["tokens_p90"], approx["tokens_p99"]
    assert p50 <= p90 <= p99


def test_duplicate_ngram_stats_hand_values(spark):
    """Planted shared 5-gram: docs 1 and 2 share 'a b c d e'; doc 3 is
    disjoint; doc 4 is too short for any 5-gram."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e x y"),          # grams: abcde, bcdex, cdexy → 1 dup
            (2, "q a b c d e"),            # grams: qabcd', abcde → 1 dup
            (3, "p q r s t u"),            # 2 grams, none shared
            (4, "one two"),                # 0 grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TX.duplicate_ngram_stats(df).collect()}
    assert rows[1]["n_grams"] == 3 and rows[1]["n_dup_grams"] == 1
    assert abs(rows[1]["dup_ngram_frac"] - 1 / 3) < 1e-12
    assert rows[1]["keep"] is False  # 1/3 > 0.30
    assert rows[2]["n_grams"] == 2 and rows[2]["n_dup_grams"] == 1
    assert rows[2]["keep"] is False
    assert rows[3]["n_grams"] == 2 and rows[3]["n_dup_grams"] == 0
    assert rows[3]["keep"] is True
    assert rows[4]["n_grams"] == 0 and rows[4]["n_dup_grams"] == 0
    assert rows[4]["dup_ngram_frac"] == 0.0 and rows[4]["keep"] is True


def test_duplicate_ngram_stats_within_doc_repeat_not_dup(spark):
    """A gram repeated only WITHIN one doc is not corpus-duplicated
    (doc-frequency, not occurrence-frequency, drives min_docs)."""
    df = spark.createDataFrame(
        [(1, "a b c d e z a b c d e"), (2, "v w x y zz")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TX.duplicate_ngram_stats(df).collect()}
    assert rows[1]["n_dup_grams"] == 0 and rows[1]["keep"] is True


def test_duplicate_ngram_stats_rejects_bad_n(spark):
    import pytest as _pytest

    df = spark.range(1).selectExpr("id AS doc_id", "'x' AS text")
    with _pytest.raises(ValueError):
        TX.duplicate_ngram_stats(df, n=1)


def test_top_terms_by_lang_hand_values(spark):
    """Counts, doc-frequency, deterministic tie-break (term asc), and
    the per-language head cut."""
    import pytest

    from secure_agent_api_vector_search_spark.operators.textops import top_terms_by_lang

    rows = [
        (1, "a a b", "en"),
        (2, "a c", "en"),
        (3, "z z z", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = top_terms_by_lang(docs, n=2).collect()
    en = [r for r in out if r["lang"] == "en"]
    fr = [r for r in out if r["lang"] == "fr"]
    # en: a x3 (2 docs), then b/c tie at 1 -> b wins on term asc
    assert [(r["term"], r["n_occurrences"], r["n_docs"], r["rank"]) for r in en] == [
        ("a", 3, 2, 1), ("b", 1, 1, 2)
    ]
    assert [(r["term"], r["n_occurrences"], r["n_docs"], r["rank"]) for r in fr] == [
        ("z", 3, 1, 1)
    ]


def test_chunk_documents_semantics(spark):
    """Chunk 5 / overlap 2 (stride 3) over known token counts: starts,
    coverage, tail suppression, dense chunk ids, reconstruction."""
    from secure_agent_api_vector_search_spark.operators.textops import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(11))),  # starts 0,3,6; 9 has 9+2>=11
        (2, "a b c"),                               # single chunk, shorter than size
        (3, "x"),                                   # one token
        (4, None),                                  # null text: no chunks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, chunk_size=5, overlap=2)
    got = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}

    # doc 1: stride 3 -> candidate starts 0,3,6,9; 9 suppressed (9+2 >= 11)
    assert sorted(k for k in got if k[0] == 1) == [(1, 0), (1, 1), (1, 2)]
    assert [got[(1, i)]["start_token"] for i in range(3)] == [0, 3, 6]
    assert got[(1, 0)]["chunk_text"] == "t0 t1 t2 t3 t4"
    assert got[(1, 2)]["chunk_text"] == "t6 t7 t8 t9 t10"
    assert got[(1, 2)]["n_chunk_tokens"] == 5
    # every token of doc 1 appears in >= 1 chunk
    covered = set()
    for i in range(3):
        s = got[(1, i)]["start_token"]
        covered |= set(range(s, s + got[(1, i)]["n_chunk_tokens"]))
    assert covered == set(range(11))
    # short docs: exactly one whole-doc chunk
    assert got[(2, 0)]["chunk_text"] == "a b c" and got[(2, 0)]["n_chunk_tokens"] == 3
    assert got[(3, 0)]["chunk_text"] == "x"
    assert not any(k[0] == 4 for k in got)

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=8, overlap=8)


def test_chunk_documents_is_map_only(docs):
    """The 100 TB shape pin: tokenize -> explode -> slice with ZERO
    exchanges — chunking must stay embarrassingly parallel."""
    from secure_agent_api_vector_search_spark.operators.textops import chunk_documents

    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Generate explode" in plan or "Generate posexplode" in plan
    # r14 shape pin (VERDICT r13 item 5): the explode must emit
    # pre-sliced chunks, never carry the full token array into every
    # chunk row (n_chunks x n_tokens bytes — quadratic in doc length)
    gen_lines = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen_lines and all("_toks" not in ln for ln in gen_lines), gen_lines


def test_build_vocab_deterministic_ranking(spark):
    from secure_agent_api_vector_search_spark.operators.textops import build_vocab

    df = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a d d")], ["doc_id", "text"]
    )
    # counts: a=3, b=3, d=2, c=1; ties broken by token ASC
    rows = {r.tok: (r.tok_id, r["count"]) for r in build_vocab(df, size=3).collect()}
    assert rows == {"a": (1, 3), "b": (2, 3), "d": (3, 2)}  # c cut by size
    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_vocab(df, size=0)


def test_tokenize_to_ids_order_and_oov(spark):
    from secure_agent_api_vector_search_spark.operators.textops import (
        build_vocab,
        tokenize_to_ids,
    )

    df = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a d d"), (2, "zz a")], ["doc_id", "text"]
    )
    vocab = build_vocab(df, size=3)  # a=1 b=2 d=3; c, zz OOV
    out = {r.doc_id: (r.n_tokens, r.ids) for r in tokenize_to_ids(df, vocab).collect()}
    assert out[0] == (6, [2, 2, 2, 1, 1, 0])  # order preserved, c -> 0
    assert out[1] == (3, [1, 3, 3])
    assert out[2] == (2, [0, 1])  # zz -> OOV


# ------------------------------------------------------- heavy hitters


def test_heavy_hitter_ngrams_finds_planted_boilerplate(spark):
    from secure_agent_api_vector_search_spark.operators.textops import (
        heavy_hitter_ngrams,
    )

    footer = "subscribe to our newsletter today"
    rows = [(i, f"unique body text number {i} {footer}") for i in range(40)]
    rows += [(100 + i, f"totally different content item {i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["gram"]: r["cnt"] for r in
           heavy_hitter_ngrams(docs, n=3, threshold=0.02).collect()}
    # 350 grams total, threshold 2% → K = 7: the footer grams (40×) and
    # the 10× shared prefix qualify; grams containing the per-doc
    # number occur once each and must be absent
    assert out.get("subscribe to our") == 40
    assert out.get("to our newsletter") == 40
    assert out.get("totally different content") == 10
    assert all(cnt >= 7 for cnt in out.values())
    assert "number 5 subscribe" not in out


def test_heavy_hitter_ngrams_matches_bruteforce_under_any_partitioning(spark, docs):
    """The candidate pass prorates the threshold per partition; the
    pigeonhole superset guarantee must make the final output identical
    to the plain groupBy-HAVING on any partition layout."""
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.operators.textops import (
        heavy_hitter_ngrams,
    )

    corpus = docs.select("text").repartition(17)
    got = sorted(
        (r["gram"], r["cnt"])
        for r in heavy_hitter_ngrams(corpus, n=2, threshold=1e-3).collect()
    )

    ws = F.split(F.regexp_replace(F.trim(F.col("text")), " +", " "), " ")
    base = corpus.select(
        ws.alias("ws"),
        F.greatest(F.size(ws) - 1, F.lit(0)).cast("int").alias("n_grams"),
    ).filter(F.col("n_grams") > 0)
    zipped = F.arrays_zip(
        F.slice(F.col("ws"), 1, F.col("n_grams")),
        F.slice(F.col("ws"), 2, F.col("n_grams")),
    )
    grams = base.select(F.explode(zipped).alias("g")).select(
        F.concat_ws(" ", F.col("g.0"), F.col("g.1")).alias("gram")
    )
    import math

    total = grams.count()
    k = math.ceil(1e-3 * total)
    brute = sorted(
        (r["gram"], r["cnt"])
        for r in grams.groupBy("gram").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= k).collect()
    )
    assert got == brute and len(got) > 0


def test_heavy_hitter_ngrams_validation_and_empty(spark):
    import pytest as _pytest

    from secure_agent_api_vector_search_spark.operators.textops import (
        heavy_hitter_ngrams,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        heavy_hitter_ngrams(docs, n=0)
    with _pytest.raises(ValueError):
        heavy_hitter_ngrams(docs, threshold=0.0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heavy_hitter_ngrams(empty).count() == 0


# ------------------------------------------------------- html extract


def test_html_extract_strips_blocks_decodes_entities(spark):
    from secure_agent_api_vector_search_spark.operators.textops import html_extract

    html = (
        "<html><head><style>p{x}</style><script>var a='<p>';</script></head>"
        "<body><h1>Big Title</h1><!-- hidden --><p>hello &amp;lt; world"
        "&nbsp;&quot;q&quot;</p><a href='/x'>a <b>link</b></a></body></html>"
    )
    docs = spark.createDataFrame(
        [(1, html), (2, "plain text stays put"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in html_extract(docs).collect()}
    # &amp;lt; must decode to the LITERAL '&lt;' (amp decodes last)
    assert out[1]["extracted_text"] == 'Big Title hello &lt; world "q" a link'
    assert out[1]["link_density"] > 0.1
    assert out[2]["extracted_text"] == "plain text stays put"
    assert out[2]["link_density"] == 0.0
    assert out[3]["extracted_text"] == "" and out[3]["link_density"] == 0.0


def test_html_extract_link_density_flags_boilerplate_page(spark):
    from secure_agent_api_vector_search_spark.operators.textops import html_extract

    nav = "<ul>" + "".join(f"<li><a href='/{i}'>item {i}</a></li>" for i in range(20)) + "</ul>"
    docs = spark.createDataFrame(
        [(1, f"<body>{nav}<p>tiny body</p></body>"),
         (2, "<body><p>" + "real content words " * 50 + "</p><a href='/'>home</a></body>")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["link_density"] for r in html_extract(docs).collect()}
    assert out[1] > 0.7   # nav page: almost all chars inside anchors
    assert out[2] < 0.05  # article page


def test_html_extract_density_ignores_commented_nav_and_entities(spark):
    """Anchors inside comments/script contribute nothing to the page,
    so they must not inflate link_density (the numerator derives from
    the same cleaned text as the denominator); entity-bearing anchors
    count decoded characters, keeping density <= 1."""
    from secure_agent_api_vector_search_spark.operators.textops import html_extract

    commented_nav = "<!--" + "".join(
        f"<a href='/{i}'>hidden menu {i}</a>" for i in range(30)
    ) + "-->"
    docs = spark.createDataFrame(
        [
            (1, f"<body>{commented_nav}<p>real article body with many words "
                "kept visible to the reader</p></body>"),
            (2, "<body><a>&amp;&amp;</a></body>"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in html_extract(docs).collect()}
    assert out[1]["link_density"] == 0.0  # hidden menu contributes zero
    assert out[2]["extracted_text"] == "&&"
    assert out[2]["link_density"] == 1.0  # decoded chars, not raw entity


def test_html_extract_spark_duckdb_dialect_fuzz(spark):
    """Regex-dialect hardening: run the operator AND its oracle's
    RE2/DuckDB replay over a pile of adversarial HTML-ish strings
    (nested/unclosed tags, comments holding tags, entities in every
    position, stray angle brackets) and require identical extraction
    and density on every row — the same comparison the gate does, but
    on inputs the synthetic corpus never produces."""
    import duckdb

    from secure_agent_api_vector_search_spark.operators.textops import html_extract

    cases = [
        "",
        "plain words only",
        "a < b and c > d",                      # bare angle brackets
        "<p>unclosed paragraph",
        "text <b>bold <i>nested</i></b> tail",
        "<!-- <a href='/x'>ghost</a> --><p>real</p>",
        "<script>if (a<b) { x='<p>'; }</script>visible",
        "<style>p:after{content:'<';}</style>kept",
        "&amp;lt; &lt; &gt; &quot; &#39; &nbsp; &amp;",
        "<a href='/1'>one</a> mid <a href='/2'>two &amp; three</a>",
        "<A HREF='/up'>UPPER anchor</A> case",
        "spaces    collapse\teverywhere",
        "<p>multi\nline\ncontent</p>",
        "<a>outer <a>inner</a></a> weird nesting",
        "trailing comment <!-- no close",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["extracted_text"], r["link_density"])
        for r in html_extract(df).collect()
    }

    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(
        {"doc_id": range(len(cases)), "text": cases}))
    oracle = con.sql(r"""
WITH s1 AS (
  SELECT doc_id,
         regexp_replace(text,
           '(?is)<script\b.*?</script>|<style\b.*?</style>|<!--.*?-->',
           ' ', 'g') AS cleaned
  FROM docs),
s2 AS (SELECT doc_id, cleaned,
              regexp_replace(cleaned, '(?s)<[^>]+>', ' ', 'g') AS t FROM s1),
dec AS (SELECT doc_id, cleaned,
          replace(replace(replace(replace(replace(replace(t,
            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
            '&#39;', ''''), '&amp;', '&') AS t FROM s2),
fin AS (SELECT doc_id, cleaned,
          trim(regexp_replace(t, '\s+', ' ', 'g')) AS extracted_text FROM dec),
anch AS (SELECT doc_id,
          length(trim(regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(
                array_to_string(
                  regexp_extract_all(cleaned, '(?is)<a\b[^>]*>(.*?)</a>', 1),
                  ' '),
                '(?s)<[^>]+>', ' ', 'g'),
              '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', ''''), '&amp;', '&'),
            '\s+', ' ', 'g'))) AS alen FROM fin)
SELECT f.doc_id, f.extracted_text,
       CASE WHEN length(f.extracted_text) > 0
            THEN CAST(COALESCE(a.alen, 0) AS DOUBLE) / length(f.extracted_text)
            ELSE 0.0 END AS link_density
FROM fin f JOIN anch a USING (doc_id)""").fetchall()
    for doc_id, ext, dens in oracle:
        assert got[doc_id][0] == ext, (doc_id, got[doc_id][0], ext)
        assert got[doc_id][1] == dens, (doc_id, got[doc_id][1], dens)


def test_vocab_coverage_planted_oov(spark):
    """Known vocabulary, planted OOV mass: exact per-group counts."""
    from secure_agent_api_vector_search_spark.operators.textops import (
        build_vocab,
        vocab_coverage,
    )

    df = spark.createDataFrame(
        [
            (0, "a", "x x y zz"),      # zz OOV (1 of 4)
            (1, "a", "x qq qq"),       # qq OOV twice (2 of 3, 1 distinct)
            (2, "b", "x y"),           # fully covered
        ],
        ["doc_id", "source", "text"],
    )
    vocab = build_vocab(
        spark.createDataFrame([(0, "x x x y y")], ["doc_id", "text"]), size=10
    )
    out = {r.source: r for r in vocab_coverage(df, vocab).collect()}
    a, b = out["a"], out["b"]
    assert (a.n_tokens, a.n_oov, a.distinct_oov) == (7, 3, 2)
    assert abs(a.oov_rate - 3 / 7) < 1e-15
    assert (b.n_tokens, b.n_oov, b.distinct_oov, b.oov_rate) == (2, 0, 0, 0.0)


def test_vocab_coverage_plan_broadcasts_vocab(spark, docs):
    """The bounded-N vocabulary must reach the token stream as a
    broadcast — a sort-merge join here would shuffle the whole token
    explode by word."""
    from secure_agent_api_vector_search_spark.operators.textops import (
        build_vocab,
        vocab_coverage,
    )
    from secure_agent_api_vector_search_spark.plans.explain import physical_plan

    vocab = build_vocab(docs, size=10)
    plan = physical_plan(vocab_coverage(docs.withColumn("source", F.lit("s")), vocab))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_tokenizer_fertility_plan_is_join_free(spark, docs):
    """The single-pass claim, pinned: one Arrow map + one group
    aggregate — no join operator of any kind in the plan."""
    from secure_agent_api_vector_search_spark.operators.bpe import (
        tokenizer_fertility,
        train_bpe,
    )
    from secure_agent_api_vector_search_spark.plans.explain import physical_plan

    df = docs.withColumn("source", F.lit("s"))
    merges = train_bpe(df, n_merges=4)
    plan = physical_plan(tokenizer_fertility(df, merges))
    assert "Join" not in plan
