"""Point lookup — the reference's `get_record_by_id` tool (U2).

Reference: `tools.yaml:29-39` — `SELECT id, type, number, country,
date, title, abstract FROM customer_records_data WHERE id = $1`
(typed parameter, 0-or-1 row, embeddings deliberately excluded from
the projection).

Spark shape: `filter(col == lit).select(cols)` — Catalyst pushes the
equality predicate into the parquet scan (row-group min/max skipping)
and prunes the scan to the projected columns. Single narrow stage, no
shuffle; at 100 TB the scan cost is bounded by row-group statistics,
and a sorted/z-ordered layout on the id column would bound it further.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The 7-column projection of tools.yaml:37-38, mapped to the testdata
# documents schema (embedding excluded exactly as the reference excludes
# abstract_embeddings).
LOOKUP_COLUMNS = ("doc_id", "lang", "source", "n_chars", "text")


def get_record_by_id(documents: DataFrame, record_id: int | str) -> DataFrame:
    """0-or-1 row by primary id. The reference contract is VARCHAR
    (tools.yaml:33-35); the toolset wrapper (toolset.py) passes the
    canonical-decimal-validated string through, and an int is accepted
    for direct API use. Typed parameter (never string-spliced SQL)
    preserves the reference's injection-safety property (U5)."""
    return documents.filter(F.col("doc_id") == F.lit(record_id)).select(*LOOKUP_COLUMNS)
