"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (U1 find_similar semantics) on sf0.001.
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB ANSI-SQL twin for every SQL-expressible entry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from secure_agent_api_vector_search_spark.catalog import REGISTRY  # noqa: E402
from secure_agent_api_vector_search_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact cosine top-k joined to document scalars — the
    reference's `find_similar_customer_records` (tools.yaml:13-27)."""
    tune_session(spark)
    return REGISTRY.queries["find_similar_records"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in REGISTRY.fns().items()}


def oracle_sql() -> dict[str, str]:
    return REGISTRY.oracles()
