"""Per-entry optimization probe (guide §1): time named entries in a
warm session (same methodology as bench.py — full warmup run, then
min over reps of plan+execute+collect), optionally with the noop sink
instead of collect, and optionally dumping `.explain("formatted")`.

Usage:
    python tools/probe_entry.py entry_a entry_b [--reps 3] [--noop]
        [--explain-dir plans/r10 --suffix before]

Prints one line per entry:  <name>  min=<s>  reps=[...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_task_spark.plans.analytics import QUERIES  # noqa: E402
from data_engineer_task_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="time df.write.format('noop') instead of collect()")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="plan")
    args = ap.parse_args()
    unknown = [n for n in args.entries if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe")

    def _settle() -> None:
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark._jvm.System.gc()

    def _run(name: str) -> float:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        _settle()
        return dt

    for name in args.entries:
        _run(name)  # warmup
        times = [_run(name) for _ in range(args.reps)]
        print(
            f"{name}  min={min(times):.3f}  reps="
            + "[" + ", ".join(f"{t:.3f}" for t in times) + "]",
            flush=True,
        )
        if args.explain_dir:
            df = QUERIES[name](spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            os.makedirs(args.explain_dir, exist_ok=True)
            path = os.path.join(
                args.explain_dir, f"{name}_{args.suffix}.txt"
            )
            with open(path, "w") as f:
                f.write(text)
            _settle()


if __name__ == "__main__":
    main()
