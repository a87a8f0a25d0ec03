"""Deequ-style expectation checking (operators/expectations.py)."""

from __future__ import annotations

import pytest

from secure_agent_api_vector_search_spark.operators.expectations import (
    check_expectations,
    rule_name,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "en", 10, "clean text"),
        (2, "en", -5, "bad count"),          # non_negative violation
        (2, "de", 3, "dup id"),              # unique violation
        (None, "xx", 7, "null id"),          # not_null + in_set violations
        (5, "fr", 999, "Out Of Range!"),     # in_range + matches violations
        (6, None, None, None),               # nulls must not hit other rules
    ]
    return spark.createDataFrame(rows, "id long, lang string, n long, text string")


def test_each_rule_counts_its_own_violations(spark, messy):
    out = {r["rule"]: (r["violations"], r["passed"]) for r in check_expectations(
        messy,
        [
            ("not_null", "id"),
            ("unique", "id"),
            ("non_negative", "n"),
            ("in_range", "n", 0, 100),
            ("in_set", "lang", ["en", "de", "fr"]),
            ("matches", "text", "^[a-z ]+$"),
        ],
    ).collect()}
    assert out["not_null(id)"] == (1, False)
    assert out["unique(id)"] == (1, False)      # id=2 twice (nulls excluded)
    assert out["non_negative(n)"] == (1, False)
    assert out["in_range(n)"] == (2, False)     # -5 and 999
    assert out["in_set(lang)"] == (1, False)    # 'xx'; NULL lang not counted
    assert out["matches(text)"] == (1, False)   # 'Out Of Range!'
    assert out["_rows"] == (6, True)


def test_all_passing_report(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = check_expectations(df, [("not_null", "id"), ("unique", "id")])
    assert all(r["passed"] for r in out.collect())


def test_empty_frame_counts_zero_everywhere(spark):
    df = spark.createDataFrame([], "id long, s string")
    out = {r["rule"]: r["violations"] for r in check_expectations(
        df, [("not_null", "id"), ("in_range", "id", 0, 1)]
    ).collect()}
    assert out == {"not_null(id)": 0, "in_range(id)": 0, "_rows": 0}


def test_validation_errors(spark, messy):
    with pytest.raises(ValueError, match="at least one"):
        check_expectations(messy, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_expectations(messy, [("not_null", "id"), ("not_null", "id")])
    with pytest.raises(ValueError, match="unknown expectation"):
        check_expectations(messy, [("frobnicate", "id")])
    assert rule_name(("in_range", "n", 0, 1)) == "in_range(n)"


def test_single_scan_plan(spark, messy):
    """The whole rule set (incl. uniqueness) must execute as ONE pass:
    the executed plan carries exactly one scan of the source."""
    out = check_expectations(
        messy,
        [("not_null", "id"), ("unique", "id"), ("in_range", "n", 0, 100)],
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") + final.count("FileScan") <= 1
