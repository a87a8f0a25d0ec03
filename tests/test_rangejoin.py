"""Binned interval/point range join (operators/rangejoin.py) — the
exactness contract: every containing pair once, boundary semantics
half-open, no nested-loop physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators import rangejoin as RJ


def _run(spark, intervals, points, bin_width):
    i = spark.createDataFrame(intervals, "iid long, lo long, hi long")
    p = spark.createDataFrame(points, "pid long, pt long")
    return {
        (r["iid"], r["pid"])
        for r in RJ.interval_point_join(i, p, "lo", "hi", "pt", bin_width).collect()
    }


def test_half_open_boundaries(spark):
    # pt == lo is in; pt == hi is out
    got = _run(spark, [(1, 100, 200)], [(1, 100), (2, 199), (3, 200), (4, 99)], 50)
    assert got == {(1, 1), (1, 2)}


def test_interval_spanning_many_bins(spark):
    # interval covers 5 bins; points in each bin all match exactly once
    got = _run(spark, [(1, 0, 500)], [(i, i * 100 + 50) for i in range(5)], 100)
    assert got == {(1, i) for i in range(5)}


def test_no_duplicate_pairs_on_bin_edges(spark):
    # point exactly on a bin edge inside the interval: exactly one match
    got = _run(spark, [(1, 0, 300)], [(1, 100), (2, 200)], 100)
    assert got == {(1, 1), (1, 2)}


def test_empty_and_inverted_intervals_dropped(spark):
    got = _run(spark, [(1, 100, 100), (2, 200, 150), (3, 0, 10)], [(1, 5)], 10)
    assert got == {(3, 1)}


def test_overlapping_intervals_each_match(spark):
    got = _run(spark, [(1, 0, 100), (2, 50, 150)], [(1, 75)], 100)
    assert got == {(1, 1), (2, 1)}


def test_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    intervals = [(i, lo := rng.randrange(0, 1000), lo + rng.randrange(1, 300)) for i in range(40)]
    points = [(j, rng.randrange(0, 1300)) for j in range(80)]
    expected = {
        (iid, pid)
        for iid, lo, hi in intervals
        for pid, pt in points
        if lo <= pt < hi
    }
    assert _run(spark, intervals, points, 64) == expected


def test_plan_is_equi_join_not_nested_loop(spark):
    i = spark.createDataFrame([(1, 0, 100)], "iid long, lo long, hi long")
    p = spark.createDataFrame([(1, 5)], "pid long, pt long")
    plan = RJ.interval_point_join(i, p, "lo", "hi", "pt", 50)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_bad_bin_width_raises(spark):
    i = spark.createDataFrame([(1, 0, 100)], "iid long, lo long, hi long")
    with pytest.raises(ValueError):
        RJ.interval_point_join(i, i, "lo", "hi", "lo", 0)
