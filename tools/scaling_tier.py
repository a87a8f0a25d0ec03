"""Standalone runner for bench._scaling_tier_probe (VERDICT r13 item
3): times the six heaviest operator families on an inflated,
near-dup-free corpus at the CURRENT core count, so two invocations at
different $SPARK_GRAFT_CPUS give a compute-dominated scaling ratio
(the sf0.1 gate walls are overhead-dominated and say nothing about
parallelism).

Usage:
    SPARK_GRAFT_CPUS=32 python tools/scaling_tier.py [reps]
    SPARK_GRAFT_CPUS=8  python tools/scaling_tier.py [reps]

Prints one JSON line per run; compare warm_min per family.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _scaling_tier_probe
from secure_agent_api_vector_search_spark.session import get_session


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    timed = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("scaling_tier")
    # warm the Python-worker path once (same as bench.py)
    from pyspark.sql import functions as F

    _warm = F.pandas_udf("long")(lambda s: s)
    spark.range(256).repartition(32).select(_warm("id").alias("v")).count()
    print(json.dumps(_scaling_tier_probe(
        spark, sf_dir, reps=reps, timed_reps=timed, only=only)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
