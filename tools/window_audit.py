"""Inventory unpartitioned window specs across declared entries.

Walks each entry's ANALYZED logical plan at sf0.001 and reports the
entries containing a ``windowspecdefinition`` with NO partition
columns (the `WindowExec: No Partition Defined` class). Used to seed /
maintain the allowlist in tests/test_plans_physical.py (the plan gate
runs the same scan as a test).

    python tools/window_audit.py [entry ...]     # default: all
    python tools/window_audit.py --scalars [entry ...]
        # census the sum() OVER () scalar-total windows instead
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    from data_engineer_task_spark.plans.analytics import QUERIES
    from data_engineer_task_spark.plans.audit import (
        analyzed_plan,
        scalar_total_specs,
        unpartitioned_specs,
    )
    from data_engineer_task_spark.session import get_spark

    args = sys.argv[1:]
    detect = unpartitioned_specs
    if args and args[0] == "--scalars":
        detect = scalar_total_specs
        args = args[1:]
    sf = "/root/testdata/sf0.001"
    spark = get_spark("window-audit", cpus=8)
    names = args or sorted(QUERIES)
    flagged: dict[str, list[str]] = {}
    for name in names:
        try:
            specs = detect(analyzed_plan(QUERIES[name](spark, sf)))
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}", flush=True)
            continue
        if specs:
            flagged[name] = specs
            print(f"FLAG {name}: {len(specs)}", flush=True)
    print("----")
    print("flagged entries:", len(flagged))
    for n, specs in sorted(flagged.items()):
        print(f"  {n}: {len(specs)}")
        for s in specs:
            print(f"      {s}")


if __name__ == "__main__":
    main()
