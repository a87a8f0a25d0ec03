"""JDBC federation source — the literal S1 closure (SURVEY.md §2.1).

The reference's one and only source is a managed-Postgres table reached
over a database connection (`tools.yaml:1-10` names an
`alloydb-postgres` source; `sql/02_schema.sql` is its DDL). The parquet
layer in sources/tables.py is the 100 TB-scale serving layout; this
module is the federation path for reading the SAME tables straight out
of the operational database — Spark's built-in JDBC relation, thinly
wrapped so that (a) credentials only ever arrive through config/env
injection, never literals, and (b) reads are PARTITIONED by default
when a numeric key is supplied, because the single-connection default
is the classic JDBC-source scale trap: one executor pulling the whole
table through one socket.

Scale notes (what each knob is for at a 1000-executor pull of a big
table):
- `partition_column/lower/upper/num_partitions` → Spark issues
  `num_partitions` range-predicated queries in parallel; without them
  the read is ONE task regardless of cluster size.
- `fetchsize` → rows per network round-trip (driver-default is tiny on
  Postgres JDBC, 10 — we default 10_000).
- `pushDownPredicate` stays on (default): Catalyst ships `WHERE` to the
  database, so `load_jdbc(...).filter(...)` scans server-side.
- `dbtable` accepts a subquery alias (`"(select ...) t"`), the standard
  trick for pushing projections/joins to the database.

No JDBC driver jars ship with this repo; point `driver`/classpath at
the database's own jar (e.g. org.postgresql.Driver for the reference's
source). Tests exercise the path end-to-end against Derby's embedded
driver, which Spark bundles for its Hive metastore.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: env vars consulted for credentials when none are passed explicitly —
#: config injection, never code literals (the reference keeps its DSN in
#: Secret Manager for the same reason; tools.yaml:6-9).
USER_ENV = "SPARK_GRAFT_JDBC_USER"
PASSWORD_ENV = "SPARK_GRAFT_JDBC_PASSWORD"


def jdbc_options(
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Build the option map for a partitioned JDBC read (pure, testable
    without a database). Partitioning options are all-or-nothing —
    Spark requires the full quadruple."""
    opts: dict[str, str] = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    user = user if user is not None else os.environ.get(USER_ENV)
    password = password if password is not None else os.environ.get(PASSWORD_ENV)
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part):
        if any(p is None for p in part):
            raise ValueError(
                "partitioned JDBC reads need all of partition_column, "
                f"lower_bound, upper_bound, num_partitions; got {part}"
            )
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def load_jdbc(spark: SparkSession, url: str, table: str, **kw) -> DataFrame:
    """`spark.read.format("jdbc")` with the safety rails of
    :func:`jdbc_options`. Filters/projections applied to the result are
    pushed to the database by Catalyst (pushDownPredicate default)."""
    return spark.read.format("jdbc").options(**jdbc_options(url, table, **kw)).load()


def register_jdbc_views(
    spark: SparkSession, url: str, tables: dict[str, str] | list[str], **kw
) -> None:
    """Register JDBC tables as temp views under the same names the
    parquet loader uses, so every `queries()` entry and oracle runs
    unchanged against the federated source — the drop-in S1 swap.

    ``tables``: view-name → dbtable mapping, or a list when the names
    coincide.
    """
    if isinstance(tables, str):
        # a bare string would iterate character-by-character and try to
        # load a table per letter — fail here, not at the database
        raise TypeError("tables must be a dict or a list of names, not a string")
    mapping = {t: t for t in tables} if not isinstance(tables, dict) else tables
    for view, dbtable in mapping.items():
        load_jdbc(spark, url, dbtable, **kw).createOrReplaceTempView(view)
