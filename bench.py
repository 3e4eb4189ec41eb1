"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Times each declared query end-to-end (plan + execute + collect) in
steady state: a full untimed warmup pass first (JVM JIT + whole-stage
codegen compilation dominate first-run times at this data scale — up
to 10× — and land on random queries otherwise), then the timed pass.
Set SPARK_GRAFT_BENCH_COLD=1 to skip the warmup pass.

Spread policy (r9, VERDICT r8 item 1): per-query time is the MIN over
reps (GC pauses and OS scheduling only ever add time). Plain min-of-2
let one noisy pair through in r8 — a 2.1× phantom "regression" on
doc_tfidf_top_terms that hand re-measurement overturned — so after the
base reps, any entry whose reps disagree by >1.5× OR whose min moved
>1.5× vs the previous BENCH_DETAIL.json (same machine, prior round)
re-runs up to SPARK_GRAFT_BENCH_MAX_REPS (default 4) total, keeping
the min. A real regression survives the extra reps; a noisy pair
converges back.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_task_spark.plans.analytics import QUERIES  # noqa: E402
from data_engineer_task_spark.session import get_spark  # noqa: E402


def _load_prior(detail_path: str, sf_val) -> dict[str, float]:
    """Prior per-query times for the 'moved >1.5x' re-run trigger.

    Priors are comparable only at the SAME scale factor (code-review
    r9): without that guard a cross-sf run trips the trigger on every
    entry and silently doubles the bench wall. The file is also
    untrusted input (VERDICT r9 item 7c — it may be truncated by a
    killed run, hand-edited, or copied from another machine): a parse
    failure, a non-dict queries field, or non-numeric/non-positive
    values must degrade to "no prior" (full-strength re-run policy),
    never crash the bench mid-suite — a poisoned value would otherwise
    raise TypeError inside the per-query noise check."""
    try:
        with open(detail_path) as f:
            doc = json.load(f)
        if not isinstance(doc, dict) or doc.get("sf") != sf_val:
            return {}
        queries = doc.get("queries", {})
        if not isinstance(queries, dict):
            return {}
        return {
            k: float(v)
            for k, v in queries.items()
            if isinstance(k, str)
            and isinstance(v, (int, float))
            and not isinstance(v, bool)
            and 0 < v < float("inf")  # drops NaN/inf too
        }
    except Exception:
        return {}


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
    # estimate of the query's actual cost). See the module docstring's
    # spread policy for the adaptive re-run rule.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    max_reps = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPS", "4"))
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    prior = _load_prior(detail_path, sf_val)
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        times: list[float] = []

        def _run_once() -> None:
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
            _settle()

        for _ in range(reps):
            _run_once()

        def _noisy() -> bool:
            spread = max(times) > 1.5 * min(times)
            moved = (
                prior.get(name, 0) > 0 and min(times) > 1.5 * prior[name]
            )
            return spread or moved

        while len(times) < max_reps and _noisy():
            _run_once()
        timings[name] = round(min(times), 3)

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
        "sf": sf_val,
        "n_queries": len(timings),
        "detail_file": "BENCH_DETAIL.json",
    }
    with open(detail_path, "w") as f:
        json.dump(
            {"sf": headline["sf"], "total": total, "queries": timings}, f, indent=1
        )
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
