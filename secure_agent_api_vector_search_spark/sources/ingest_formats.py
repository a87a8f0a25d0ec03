"""Raw-ingest source formats: JSONL and CSV → the documents schema.

The serving layout is parquet (sources/tables.py) and the operational
database reads through JDBC (sources/jdbc.py); this module is the
third leg — the RAW CRAWL/EXPORT formats a training-data pipeline
actually receives. Real-world dumps are JSON-lines (Common Crawl
derivatives, API exports) or CSV, and they arrive dirty: truncated
lines, schema drift, stray quotes. The loaders here therefore read
PERMISSIVE with an explicit schema and route undecodable records to a
visible quarantine column instead of silently dropping them — the
same auditability stance as streaming/ingest.py's curated quarantine
(at 100 TB, "we lost 0.3% of lines" needs a where and a why).

Scale notes:
- An explicit schema is mandatory at scale: schema inference is an
  extra full pass over the data before the real one.
- Uncompressed (or zstd/bzip2-compressed) JSONL/CSV splits by range —
  one 1 TB file still parallelizes; gzip does NOT split (one task per
  .gz file), so the loaders leave files as the parallelism unit and
  the docstring says to prefer many medium files or a splittable
  codec for big dumps.
- `columnNameOfCorruptRecord` adds the raw line for failed parses;
  both loaders split the result into (clean, quarantined) so the bad
  rows stay queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents table schema (TESTDATA.md) plus the corrupt-capture
#: column the permissive readers populate on parse failure.
DOCS_FIELDS = [
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
]
CORRUPT_COL = "_corrupt_record"


def _docs_schema_with_corrupt() -> T.StructType:
    return T.StructType(DOCS_FIELDS + [T.StructField(CORRUPT_COL, T.StringType())])


def _split_quarantine(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the capture column, quarantined raw lines).

    A row is quarantined when the capture column is set OR the key is
    null (a structurally-valid line that still fails the contract —
    e.g. a JSON object missing doc_id — must not silently enter the
    corpus)."""
    bad = F.col(CORRUPT_COL).isNotNull() | F.col("doc_id").isNull()
    clean = raw.filter(~bad).drop(CORRUPT_COL)
    quarantined = raw.filter(bad).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(*[f.name for f in DOCS_FIELDS])))
        .alias("raw_line")
    )
    return clean, quarantined


def load_jsonl_documents(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines → (documents, quarantine). One scan, no shuffle;
    extra JSON keys are ignored (schema projection), missing keys are
    null, undecodable lines land in the quarantine verbatim."""
    raw = (
        spark.read.schema(_docs_schema_with_corrupt())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split_quarantine(raw)


def load_csv_documents(
    spark: SparkSession, path: str, header: bool = True, sep: str = ","
) -> tuple[DataFrame, DataFrame]:
    """CSV → (documents, quarantine). Quoted multi-line fields are
    supported (`multiLine` stays off by default — it makes files
    unsplittable; turn it on only for small dirty exports)."""
    raw = (
        spark.read.schema(_docs_schema_with_corrupt())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split_quarantine(raw)


def load_orc_documents(spark: SparkSession, path: str) -> DataFrame:
    """ORC → documents. The fourth source leg: ORC is the other
    columnar interchange format big-data estates hand over (Hive/Trino
    exports). Columnar + typed means there is no corrupt-LINE concept
    to quarantine — decode failures are file-level and must surface,
    not be swallowed — so this returns one frame, schema-projected to
    the documents contract (extra columns dropped, column order
    normalized). Predicate pushdown and column pruning work as for
    parquet; one scan, no shuffle."""
    return (
        spark.read.schema(T.StructType(DOCS_FIELDS))
        .orc(path)
        .select(*[f.name for f in DOCS_FIELDS])
    )


def write_orc_documents(df: DataFrame, path: str) -> None:
    """documents → ORC (zstd): the export half of the round trip, for
    handing curated corpora back to ORC-native estates."""
    (
        df.select(*[f.name for f in DOCS_FIELDS])
        .write.mode("overwrite")
        .option("compression", "zstd")
        .orc(path)
    )
