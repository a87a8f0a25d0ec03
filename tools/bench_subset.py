"""Interim bench: same protocol as bench.py's query loop (1 cold +
N warm reps, noop sink, clearCache after each query) over a named
subset. Prints one JSON line {name: {"cold": s, "warm": [..]}} plus a
warm-min comparison against the committed BENCH_FULL.json.

Usage: python tools/bench_subset.py q1 q2 ...   (default: a hot list)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries
from secure_agent_api_vector_search_spark.session import get_session

DEFAULT = [
    "quality_percentile_cut", "embedding_neardup_clustered", "image_neardup",
    "split_leakage_check", "embedding_neardup_lsh", "media_metadata",
    "minhash_near_dup", "dedup_incremental", "bpe_encode",
    "dedup_incremental_bloom", "bpe_encode_pipeline", "tokenize_to_ids",
    "point_lookup", "vector_topk_cosine", "ivf_topk",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_session("bench_subset")
    qs = queries()
    from pyspark.sql import functions as F

    qs["point_lookup"](spark, sf_dir).collect()
    _warm = F.pandas_udf("long")(lambda s: s)
    spark.range(256).repartition(32).select(_warm("id").alias("v")).count()

    prev = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_FULL.json")) as f:
            prev = json.load(f).get("queries_warm", {})
    except Exception:
        pass

    out = {}
    for name in names:
        fn = qs[name]
        rec = {"warm": []}
        for rep in range(1 + n_reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if rep == 0:
                rec["cold"] = dt
            else:
                rec["warm"].append(dt)
        spark.catalog.clearCache()
        out[name] = rec
        base = prev.get(name)
        ratio = f"{min(rec['warm'])/base:.2f}x" if base else "?"
        print(f"{name}: cold={rec['cold']} warm={rec['warm']} "
              f"(baseline warm-min {base} -> {ratio})", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
