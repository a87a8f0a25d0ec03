"""Interval / range join — binned equi-join form ([EXT], SURVEY.md
§2.5: the reference has no joins; a range join is the canonical
non-equi join a 100 TB engine must not execute as a nested loop).

Spark plans a pure inequality join (no equi conjunct) as
BroadcastNestedLoopJoin — O(|L|·|R|) row comparisons, hopeless at
scale. The standard distributed shape re-keys both sides on a time
bin so the planner sees an equi-join:

- each interval [lo, hi) explodes to the bins it overlaps
  (⌈len/bin⌉ + 1 rows, a small constant when ``bin_width`` ≈ the
  typical interval length);
- each point maps to exactly one bin;
- the bin equi-join shuffles both sides once, hash-joins per bin,
  and the exact containment predicate filters the candidates.

Every true (interval, point) pair shares exactly the point's bin, so
the join is exact — no duplicates (a point lives in one bin), no
misses (the interval covers that bin). Skewed bins are ordinary
equi-join skew: AQE's skew-join splitting applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    lo_col: str,
    hi_col: str,
    pt_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join ``intervals`` × ``points`` on lo ≤ pt < hi.

    ``lo_col``/``hi_col``/``pt_col`` are integer columns on a shared
    axis (e.g. epoch microseconds — integer keys make the containment
    test exact; convert timestamps with ``unix_micros`` first).
    ``bin_width`` is in the same unit. Output: all interval columns +
    all point columns, one row per containing pair.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    lo, hi, pt = F.col(lo_col), F.col(hi_col), F.col(pt_col)
    bw = F.lit(int(bin_width)).cast("long")

    def _bin(c: Column) -> Column:
        return F.floor(c / bw).cast("long")

    # [lo, hi) overlaps bins floor(lo/bw) .. floor((hi-1)/bw); empty
    # intervals (hi <= lo) produce a descending sequence bound -> guard.
    binned_i = intervals.filter(hi > lo).withColumn(
        "_bin", F.explode(F.sequence(_bin(lo), _bin(hi - F.lit(1).cast("long"))))
    )
    binned_p = points.withColumn("_bin", _bin(pt))
    return (
        binned_i.join(binned_p, "_bin")
        .filter((pt >= lo) & (pt < hi))
        .drop("_bin")
    )
