"""Catalog smoke test: every `queries()` entry must build and execute.

Round-2 lesson: a one-character column typo in an analytics catalog entry
crashed the driver's correctness gate while pytest stayed green, because
no test ran the catalog entries themselves. This test runs EVERY entry on
sf0.001 — plan analysis errors (UNRESOLVED_COLUMN etc.) and execution
crashes now turn pytest red before the gate ever sees them.

Cheap by design: `.limit(5).count()` per entry — we only assert the plan
resolves and executes, not values (the oracle gate and per-operator tests
own value correctness).
"""

from __future__ import annotations

import pytest

from secure_agent_api_vector_search_spark.catalog import REGISTRY

_NAMES = sorted(REGISTRY.fns().keys())


@pytest.mark.parametrize("name", _NAMES)
def test_catalog_entry_runs(spark, sf_dir, name):
    fn = REGISTRY.fns()[name]
    df = fn(spark, sf_dir)
    # touching the plan forces full analysis; limit keeps execution cheap
    n = df.limit(5).count()
    assert n >= 0
    assert len(df.columns) > 0


def test_rebalance_if_narrow(spark, tmp_path):
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.sources.tables import rebalance_if_narrow

    spark.range(100).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one"))
    narrow = spark.read.parquet(str(tmp_path / "one"))
    assert narrow.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = rebalance_if_narrow(narrow)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 100
    wide = spark.range(1000).repartition(64)
    assert rebalance_if_narrow(wide) is wide  # no-op above the threshold


MAP_ONLY_UNSORTED = (
    # per-document outputs of map-only pipelines: a trailing global sort
    # would re-execute the whole scan/UDF in its sampling pass (the
    # round-5 de-sorting; see operators/textops.py module docstring)
    "token_stats",
    "doc_quality",
    "doc_fingerprints",
    "doc_winnow_fingerprints",
    "pii_redact",
    "dataset_split",
    "token_counts_bpe",
    "embed_texts",
    "multimodal_features",
    "image_decode_features",
    "audio_decode_features",
    "video_frame_features",
)


@pytest.mark.parametrize("name", MAP_ONLY_UNSORTED)
def test_map_only_queries_never_range_sort(spark, sf_dir, name):
    df = REGISTRY.queries[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), name


PER_ROW_UNSORTED = (
    # one-row-per-input (or O(corpus)-row) outputs of SHUFFLE-FED plans:
    # a trailing presentation orderBy here is a corpus-sized range
    # exchange (sampling pass + global sort) purely for display. The
    # round-6 purge removed them (the gate's value-hash is
    # order-insensitive); this pin keeps every per-row output sort-free.
    "doc_repetition",
    "duplicate_ngram_stats",
    "semantic_dedup",
    "dedup_exact_keep_first",
    "dedup_normalized",
    "dedup_components_keep_first",
    "dedup_near_keep_first",
    "corpus_curation",
    "pack_sequences",
    "per_source_cap",
    "quality_percentile_filter",
    "events_funnel",
    "events_sessionize",
    "events_interval_join",
    "orders_window_top3",
    "duplicated_spans",
    "exact_substring_stats",
    "strip_dup_spans",
)


@pytest.mark.parametrize("name", PER_ROW_UNSORTED)
def test_per_row_outputs_never_range_sort(spark, sf_dir, name):
    df = REGISTRY.queries[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), name


# Global scale-hygiene pins over EVERY catalog entry: a true (non-
# broadcast) cartesian product or a row-at-a-time Python UDF anywhere
# in the surface is a 100 TB incident waiting; both are banned
# wholesale. Broadcast nested-loop joins (the bounded crossJoin
# (broadcast(...)) shape the exact twins use) are allowed — they never
# shuffle the big side. ArrowEvalPython / mapInPandas (vectorized
# Python) are allowed; BatchEvalPython (per-row pickling) is not.
# Streaming-replay entries are excluded: their plan is the streaming
# query's, not a batch plan to audit (their operators are plan-audited
# by their own tests).
_PLAN_AUDIT_SKIP = {"sessionize_streaming", "anomaly_streaming"}


@pytest.mark.parametrize("name", [n for n in _NAMES if n not in _PLAN_AUDIT_SKIP])
def test_no_cartesian_products_or_row_udfs_anywhere(spark, sf_dir, name):
    df = REGISTRY.fns()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name


def test_q4_q21_decorrelate_to_semi_anti_joins(spark, sf_dir):
    """The round-10 TPC-H shapes must keep their decorrelated plan
    forms: Q4's EXISTS is a LeftSemi with the non-equi late conjunct
    in the join condition (not a post-filter over a materialized
    join), and Q21 carries exactly one LeftSemi and one LeftAnti over
    the derived relation — never a CartesianProduct."""
    from secure_agent_api_vector_search_spark.operators import analytics as A

    p4 = A.q4_order_priority(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p4 and "CartesianProduct" not in p4
    p21 = (
        A.q21_suppliers_kept_waiting(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in p21 and "LeftAnti" in p21
    assert "CartesianProduct" not in p21


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    """Q13's outer-join predicate must live in the ON clause: the
    distribution includes a c_count=0 bucket exactly as large as the
    set of customers with no qualifying orders."""
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.operators import analytics as A
    from secure_agent_api_vector_search_spark.sources.tables import load_table

    rows = {r["c_count"]: r["custdist"]
            for r in A.q13_customer_distribution(spark, sf_dir).collect()}
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    zero = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").count()
    )
    assert rows.get(0, 0) == zero
    assert sum(rows.values()) == c.count()


def test_q11_q20_plan_shapes(spark, sf_dir):
    """The round-11 TPC-H shapes keep their intended physical forms:
    Q11's global-total scalar is a 1-row broadcast into the filter
    (never a CartesianProduct over the per-part values), and Q20's
    correlated availability aggregate is decorrelated into ONE grouped
    pass feeding a LeftSemi into the supplier dim."""
    from secure_agent_api_vector_search_spark.operators import analytics as A

    p11 = (
        A.q11_important_stock(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in p11 or "BroadcastExchange" in p11
    assert "CartesianProduct" not in p11
    p20 = (
        A.q20_excess_stock_suppliers(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in p20
    assert "CartesianProduct" not in p20
    assert p20.count("HashAggregate") <= 6  # one grouped pass + distinct
