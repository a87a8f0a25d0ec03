"""Driver-local small-frame construction that plans as LocalTableScan.

`spark.createDataFrame(list_of_tuples, schema)` plans as
`Scan ExistingRDD` over ``defaultParallelism`` pickled slices: every
materialization — and every BroadcastExchange (re)build that consumes
it — runs ~32 tasks that each pay a Python-worker round trip. Measured
on quality_percentile_cut at sf0.1/local[32]: four such rebuilds, each
a 32-task stage with ~200 ms executorRunTime but ~3 ms executorCpuTime
per task (pure worker wait) — ~27 s of executor occupancy for four
4-row frames (guide §4: every Python boundary crossing costs; a
literal frame should cross zero times).

Routing the same rows through a pandas frame converts driver-side via
Arrow into a LocalTableScan: zero tasks, zero Python workers, and
broadcasts build straight from the driver rows. ``dtype=object``
everywhere so ``None`` stays NULL (a float64 pandas column would
coerce None to NaN — NaN is a VALUE, not NULL, and would corrupt
null-safe joins) and values reach Arrow exactly as the Python objects
the caller supplied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_frame(
    spark: SparkSession, rows: list, schema: T.StructType | str
) -> DataFrame:
    """createDataFrame for SMALL driver-side row lists, planned as a
    LocalTableScan (see module docstring). Falls back to the plain
    path for empty input (the Arrow-pandas conversion of an empty
    frame degrades to the RDD scan anyway)."""
    import pandas as pd

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    pdf = pd.DataFrame(
        [tuple(r) for r in rows],
        columns=[f.name for f in schema.fields],
        dtype=object,
    )
    return spark.createDataFrame(pdf, schema)
