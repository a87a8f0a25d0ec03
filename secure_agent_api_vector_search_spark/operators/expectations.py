"""Data-quality expectations: declarative constraint checking in ONE
scan — the validation gate a training pipeline runs before anything
expensive touches a new data drop.

[EXT] operator (SURVEY.md §2.10 family): the reference trusts its 50
seed rows (sql/03_seed_data.sql); a 100 TB ingest cannot. The shape is
the Deequ/Great-Expectations idea re-expressed as a single Spark
aggregate: every rule compiles to a conditional-sum expression, the
whole rule set runs as ONE `agg()` over one scan (plus the grouped
distinct for uniqueness rules, which Spark plans as an expand — still
one pass over the data), and the per-rule violation counts come back
stacked as rows so the report is a DataFrame like everything else.

Rules (all null-aware — nullness is its own rule, so range/set/regex
rules don't double-count nulls):
    ("not_null", col)
    ("unique", col)                    # count(*) - count(distinct col)
    ("in_range", col, lo, hi)          # inclusive bounds
    ("in_set", col, [v1, v2, ...])
    ("matches", col, regex)
    ("non_negative", col)              # sugar for in_range(col, 0, inf)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _violations(rule: tuple):
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if kind == "unique":
        return F.count(c) - F.count_distinct(c)
    if kind == "in_range":
        lo, hi = rule[2], rule[3]
        return F.sum(
            F.when(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))), 1).otherwise(0)
        )
    if kind == "non_negative":
        return F.sum(F.when(c.isNotNull() & (c < 0), 1).otherwise(0))
    if kind == "in_set":
        vals = list(rule[2])
        return F.sum(F.when(c.isNotNull() & ~c.isin(vals), 1).otherwise(0))
    if kind == "matches":
        return F.sum(
            F.when(c.isNotNull() & ~c.rlike(rule[2]), 1).otherwise(0)
        )
    raise ValueError(f"unknown expectation kind {kind!r}")


def rule_name(rule: tuple) -> str:
    return f"{rule[0]}({rule[1]})"


def check_expectations(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate ``rules`` in one aggregate pass. Output: one row per
    rule — (rule string, violations bigint, passed boolean) — plus a
    trailing ('_rows', total count, true) row so the report is
    self-describing about how much data it judged."""
    if not rules:
        raise ValueError("need at least one expectation rule")
    names = [rule_name(r) for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rules: {names}")
    aggs = [
        _violations(r).cast("long").alias(f"_v{i}") for i, r in enumerate(rules)
    ] + [F.count("*").alias("_n")]
    one = df.agg(*aggs)
    # stack the scalar columns to rows (still the same single job)
    pairs = ", ".join(
        f"'{n}', _v{i}" for i, n in enumerate(names)
    ) + ", '_rows', _n"
    stacked = one.select(
        F.expr(f"stack({len(rules) + 1}, {pairs}) AS (rule, violations)")
    )
    return stacked.select(
        "rule",
        F.coalesce(F.col("violations"), F.lit(0)).alias("violations"),
        (
            (F.col("rule") == "_rows")
            | (F.coalesce(F.col("violations"), F.lit(0)) == 0)
        ).alias("passed"),
    )
