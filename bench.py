"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Times each declared query end-to-end (plan + execute + collect) in
steady state: a full untimed warmup pass first (JVM JIT + whole-stage
codegen compilation dominate first-run times at this data scale — up
to 10× — and land on random queries otherwise), then the timed pass.
Set SPARK_GRAFT_BENCH_COLD=1 to skip the warmup pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_task_spark.plans.analytics import QUERIES  # noqa: E402
from data_engineer_task_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Warm-up pass: JVM JIT + codegen + parquet footers, not measured.
    # clearCache() after every execution keeps each measurement
    # self-contained: a handful of operators persist() intermediates
    # shared within their own plan, and letting those entries accumulate
    # in the CacheManager makes later queries nondeterministically hit
    # or miss warm caches (observed ±4x swings between bench runs).
    def _settle() -> None:
        # Post-query housekeeping. clearCache keeps measurements
        # self-contained (operators persist() shared subplans within
        # their own DAG). Temp views are dropped because the streaming
        # entries' memory sinks PIN their full result sets in the heap
        # via their registered views — across 70+ queries × warmup+reps
        # those accumulate into GC ballast (every entry re-registers
        # the views it needs, so dropping is always safe). The explicit
        # JVM GC then drains each query's garbage — without it,
        # collection debt lands as multi-second pauses on whichever
        # (usually Arrow/numpy-heavy) queries run late, inflating them
        # 2-6x over their solo time (measured).
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark._jvm.System.gc()

    if os.environ.get("SPARK_GRAFT_BENCH_COLD") != "1":
        for fn in QUERIES.values():
            fn(spark, sf_dir).collect()
            _settle()

    # Per-query time = min over REPS runs (min, not mean: GC pauses and
    # OS scheduling only ever add time, so the minimum is the cleanest
    # estimate of the query's actual cost).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            _settle()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # The driver parses the LAST stdout line as the headline record, and
    # its tail capture is bounded — round 1's single line carrying all
    # 185 per-query timings overflowed it ("parsed": null in
    # BENCH_r01.json). Keep the headline line SHORT: totals plus a
    # fixed flagship subset; the full per-query map goes to a sidecar
    # file next to this script.
    flagship = [
        "pricing_summary",
        "revenue_by_nation",
        "dedup_docs_exact",
        "near_dup_pairs",
        "doc_jaccard_join_exact",
        "embedding_cosine_topk",
        "embedding_ann_bucketed",
        "doc_tfidf_top_terms",
        "user_sessions",
        "stream_hourly_event_stats",
    ]
    headline = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": {k: timings[k] for k in flagship if k in timings},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "detail_file": "BENCH_DETAIL.json",
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {"sf": headline["sf"], "total": total, "queries": timings}, f, indent=1
        )
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
