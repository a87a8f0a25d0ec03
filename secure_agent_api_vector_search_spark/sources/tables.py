"""Parquet table sources.

Reference mapping: the single AlloyDB table source (`tools.yaml:1-10`,
S1 in SURVEY.md §2.1) becomes partitioned parquet read through the
DataFrame reader — columnar, with predicate pushdown and column pruning
handled by Catalyst. The fixed DDL (`sql/02_schema.sql:2-15`, S2) maps
to the parquet-embedded schema; we validate rather than re-declare.

At 100 TB these reads are the scan layer: parquet row-group statistics
give min/max skipping, and any `filter`/`select` applied downstream is
pushed into the scan (verify with `df.explain` → `PushedFilters`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver-provided test tables (TESTDATA.md): TPC-H-ish star schema plus
# the document/vector corpus mirroring the reference's
# `customer_records_data` (sql/02_schema.sql:2-15) split into
# documents (scalar cols) + embeddings (the vector(768) analog).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # ts has appeared as TIMESTAMP(NANOS) (read as long via
        # spark.sql.legacy.parquet.nanosAsLong=true, see session.py) or as
        # TIMESTAMP(MICROS) depending on the generator; normalize both to a
        # µs timestamp (matching DuckDB's µs timestamps exactly)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The document corpus (analog of `customer_records_data` minus the
    vector column, sql/02_schema.sql:2-13)."""
    return load_table(spark, sf_dir, "documents")


def load_embeddings(spark: SparkSession, sf_dir: str, as_double: bool = True) -> DataFrame:
    """The vector corpus (analog of `abstract_embeddings vector(768)`,
    sql/02_schema.sql:14; here dim=64 float).

    ``as_double=True`` widens the array to float64 once at the scan
    boundary so every downstream similarity expression is float64 —
    this matches the DuckDB oracle bit-for-bit and avoids repeated
    per-expression casts.
    """
    df = load_table(spark, sf_dir, "embeddings")
    if as_double:
        df = df.withColumn("embedding", F.col("embedding").cast("array<double>"))
    return df


def rebalance_if_narrow(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition when the scan under-splits, so a
    CPU-heavy map stage (Pandas-UDF signature/sketch/embed) gets full
    parallelism.

    A single small parquet file yields 1-2 input splits; a Pandas UDF
    downstream then runs on 2 of N cores (measured: the MinHash
    signature stage at sf0.1 was 10.5 s at parallelism 2, ~1.5 s
    rebalanced). The branch only fires when input partitions <
    defaultParallelism — on a real cluster reading 100 TB the scan has
    one split per ~128 MB and this is a no-op, so the shuffle cost is
    bounded by exactly the small-input case that needs it.
    """
    if min_parts is None:
        min_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
