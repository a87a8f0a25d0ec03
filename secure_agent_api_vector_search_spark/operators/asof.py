"""As-of (backward) join — for each left row, the latest right row with
the same key whose timestamp is ≤ the left row's timestamp.

[EXT] operator (SURVEY.md §2.5): Spark has no ASOF JOIN; the naive
range-join (t_r ≤ t_l, keep max) explodes to a near-cross-product per
key. The scalable shape used here is the union-tag trick:

    union(right-tagged, left-tagged)
      → window last_value(right cols, ignorenulls)
          over (partition by key order by ts, tag)
      → keep left rows

ONE shuffle, keyed by the join key — the same exchange a plain
equi-join would do — and a linear per-partition sweep instead of a
per-row range scan. Right rows sort before left rows at equal ts, so
the semantics are "≤" (backward as-of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: all left columns plus, for each name in
    ``right_cols``, the value from the latest right row with
    ``on_right == on_left`` and ``right_ts`` ≤ ``left_ts`` (nulls if
    none).

    Ties inside the right stream (same key, same ts) should be
    deduplicated by the caller if determinism matters — last_value
    keeps the final row in (ts, tag) order.
    """
    lcols = left.columns
    l_tag = left.select(
        F.col(on_left).alias("_k"), F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(on_right).alias("_k"), F.col(right_ts).alias("_ts"), F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "_is_left",
        *lcols,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left")
