"""Raw-ingest formats (JSONL/CSV → documents schema): parse, schema
projection, and the corrupt-line quarantine contract."""

from __future__ import annotations

import json

from secure_agent_api_vector_search_spark.sources.ingest_formats import (
    load_csv_documents,
    load_jsonl_documents,
)


def test_jsonl_parses_projects_and_quarantines(spark, tmp_path):
    p = tmp_path / "dump.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "alpha", "lang": "en",
                    "source": "web", "n_chars": 5, "extra_key": "ignored"}),
        json.dumps({"doc_id": 2, "text": "beta", "lang": "de",
                    "source": "web", "n_chars": 4}),
        '{"doc_id": 3, "text": "truncated...',          # undecodable
        json.dumps({"text": "no id", "lang": "en",
                    "source": "web", "n_chars": 5}),     # contract miss
    ]
    p.write_text("\n".join(lines) + "\n")
    docs, quarantine = load_jsonl_documents(spark, str(p))
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "alpha" and "extra_key" not in docs.columns
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("truncated" in b for b in bad)
    assert any("no id" in b for b in bad)


def test_csv_parses_and_quarantines(spark, tmp_path):
    p = tmp_path / "dump.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello world,en,web,11\n"
        "2,zwei,de,web,4\n"
        "not_a_number,bad row,en,web,7\n"
    )
    docs, quarantine = load_csv_documents(spark, str(p))
    ids = sorted(r["doc_id"] for r in docs.collect())
    assert ids == [1, 2]
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 1 and "not_a_number" in bad[0]


def test_jsonl_roundtrip_feeds_the_operator_surface(spark, docs, tmp_path):
    """A JSONL dump of real testdata rows flows into any documents
    operator unchanged — the format layer is a drop-in source."""
    from secure_agent_api_vector_search_spark.operators.textops import token_stats

    p = tmp_path / "roundtrip.jsonl"
    sample = docs.limit(20).collect()
    p.write_text(
        "\n".join(json.dumps({k: r[k] for k in
                              ("doc_id", "text", "lang", "source", "n_chars")})
                  for r in sample) + "\n"
    )
    loaded, quarantine = load_jsonl_documents(spark, str(p))
    assert quarantine.count() == 0
    stats = token_stats(loaded)
    assert stats.count() == 20
    assert set(stats.columns) == {"doc_id", "n_tokens", "n_distinct_tokens", "mean_token_len"}


def test_orc_round_trip_and_projection(spark, docs, tmp_path):
    from secure_agent_api_vector_search_spark.sources.ingest_formats import (
        load_orc_documents,
        write_orc_documents,
    )

    path = str(tmp_path / "docs_orc")
    sample = docs.limit(20)
    write_orc_documents(sample, path)
    back = load_orc_documents(spark, path)
    a = sorted(tuple(r) for r in sample.select("doc_id", "text", "lang", "source", "n_chars").collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
    # schema projection: extra columns in the file are dropped on read
    sample.withColumn("extra", sample.doc_id * 2).write.mode("overwrite").orc(path)
    again = load_orc_documents(spark, path)
    assert again.columns == ["doc_id", "text", "lang", "source", "n_chars"]


def test_orc_predicate_pushdown(spark, docs, tmp_path):
    from secure_agent_api_vector_search_spark.sources.ingest_formats import (
        load_orc_documents,
        write_orc_documents,
    )

    path = str(tmp_path / "docs_orc_pd")
    write_orc_documents(docs.limit(50), path)
    df = load_orc_documents(spark, path).filter("doc_id = 7").select("doc_id", "lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]" in plan
    assert df.count() == 1
