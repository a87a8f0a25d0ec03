"""Capture .explain("formatted") for declared queries into
plans/<tag>/<name>_<suffix>.txt — the plan evidence the optimization
rounds commit (judge checks plan claims against these files).

Usage:
    python tools/capture_plans.py <tag> <suffix> [name ...]

With no names: every bench HEADLINE query plus the gated-but-unbenched
queries the round touches. Queries whose construction raises are
recorded as an ERROR file rather than aborting the sweep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries
from secure_agent_api_vector_search_spark.plans.explain import physical_plan
from secure_agent_api_vector_search_spark.session import get_session


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    if not names:
        import bench

        names = list(bench.HEADLINE) + [
            "vector_topk_page2", "quality_percentile_filter",
            "similarity_join_exact", "per_source_cap",
        ]
    spark = get_session("capture_plans")
    qs = queries()
    for name in names:
        t0 = time.perf_counter()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            plan = physical_plan(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            plan = f"ERROR during construction/explain: {exc!r}\n"
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {time.perf_counter() - t0:.1f}s -> {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
