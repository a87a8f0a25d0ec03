"""The SQL query surface: registered views + PARAMETERIZED spark.sql.

The reference's zero-trust property (U5, tools.yaml:17-21; README.md:67)
is that user input is bound as a typed parameter, never spliced into
SQL text. Spark's `spark.sql(query, args=...)` binds literals the same
way — these tests pin that the surface works against the registered
views and that classic injection text stays inert data.
"""

from __future__ import annotations

from secure_agent_api_vector_search_spark.sources.tables import register_views


def test_registered_views_queryable(spark, sf_dir):
    register_views(spark, sf_dir)
    row = spark.sql(
        "SELECT COUNT(*) AS n FROM documents WHERE doc_id < :hi",
        args={"hi": 10},
    ).head()
    assert row["n"] == 10


def test_parameter_binding_is_typed_not_spliced(spark, sf_dir):
    register_views(spark, sf_dir)
    # the classic injection payload arrives as a VALUE: it can only ever
    # be compared against the column, never parsed as SQL
    payload = "x' OR '1'='1"
    rows = spark.sql(
        "SELECT doc_id FROM documents WHERE source = :src",
        args={"src": payload},
    ).collect()
    assert rows == []


def test_join_across_views(spark, sf_dir):
    register_views(spark, sf_dir)
    row = spark.sql(
        """
        SELECT COUNT(*) AS n
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE d.doc_id < :hi
        """,
        args={"hi": 5},
    ).head()
    assert row["n"] == 5
