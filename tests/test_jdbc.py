"""JDBC federation source (S1, tools.yaml:1-10): option construction,
credential injection, and a REAL round-trip through Derby's embedded
JDBC driver (bundled with Spark for the Hive metastore — no extra
jars), standing in for the reference's Postgres source."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.sources import jdbc as J

DERBY = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def test_options_partitioned_read():
    opts = J.jdbc_options(
        "jdbc:x", "t", partition_column="id", lower_bound=0,
        upper_bound=1000, num_partitions=8, fetchsize=500,
    )
    assert opts == {
        "url": "jdbc:x", "dbtable": "t", "fetchsize": "500",
        "partitionColumn": "id", "lowerBound": "0",
        "upperBound": "1000", "numPartitions": "8",
    }


def test_options_reject_partial_partitioning():
    with pytest.raises(ValueError, match="all of partition_column"):
        J.jdbc_options("jdbc:x", "t", partition_column="id")


def test_credentials_come_from_env_when_not_passed(monkeypatch):
    monkeypatch.setenv(J.USER_ENV, "svc")
    monkeypatch.setenv(J.PASSWORD_ENV, "s3cret")
    opts = J.jdbc_options("jdbc:x", "t")
    assert opts["user"] == "svc" and opts["password"] == "s3cret"
    # explicit args win over env
    opts = J.jdbc_options("jdbc:x", "t", user="u2", password="p2")
    assert opts["user"] == "u2" and opts["password"] == "p2"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """An embedded Derby database seeded through Spark's own JDBC
    writer — a real database round-trip with zero new dependencies."""
    db = tmp_path_factory.mktemp("derby") / "feddb"
    url = f"jdbc:derby:{db};create=true"
    rows = [(i, f"name-{i}", float(i) * 1.5) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, name string, score double")
    df.write.format("jdbc").options(
        url=url, dbtable="records", driver=DERBY
    ).mode("overwrite").save()
    return url


def test_jdbc_roundtrip_values(spark, derby_url):
    got = J.load_jdbc(spark, derby_url, "records", driver=DERBY)
    assert got.count() == 100
    row = got.filter(F.col("id") == 7).first()
    assert row["name"] == "name-7" and row["score"] == pytest.approx(10.5)


def test_jdbc_partitioned_read_parallelism_and_completeness(spark, derby_url):
    got = J.load_jdbc(
        spark, derby_url, "records", driver=DERBY,
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    assert got.rdd.getNumPartitions() == 4
    # range predicates must tile: no row lost or duplicated at boundaries
    assert got.count() == 100
    assert got.select(F.sum("id")).first()[0] == sum(range(100))


def test_jdbc_filter_pushdown_reaches_database(spark, derby_url):
    got = J.load_jdbc(spark, derby_url, "records", driver=DERBY).filter(
        F.col("id") < 10
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "id" in plan
    assert got.count() == 10


def test_register_jdbc_views_drop_in(spark, derby_url):
    J.register_jdbc_views(spark, derby_url, {"fed_records": "records"}, driver=DERBY)
    n = spark.sql("select count(*) n from fed_records where id >= 90").first()["n"]
    assert n == 10
    spark.catalog.dropTempView("fed_records")


def test_register_views_rejects_bare_string(spark):
    with pytest.raises(TypeError, match="not a string"):
        J.register_jdbc_views(spark, "jdbc:x", "documents")
