"""Physical-plan audit over every driver-gate query: build each plan at
a given sf dir (no execution beyond what plan construction needs) and
flag the scale anti-patterns the 100TB notes forbid:

* CartesianProduct / BroadcastNestedLoopJoin — unkeyed join blowups;
* BatchEvalPython — a row-at-a-time Python UDF in the plan (Arrow paths
  show as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas and are
  allowed);
* Exchange SinglePartition feeding anything but an aggregate/limit —
  a corpus-sized single-reducer step (windows over per-bucket TOTALS and
  global top-k limits are the legitimate cases and are recognized).

Prints one JSON line: {"clean": [...], "flagged": {name: [flags]}}.
Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def audit_plan(plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("cartesian-product")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("nested-loop-join")
    if re.search(r"\bBatchEvalPython\b", plan):
        flags.append("row-at-a-time-python-udf")
    for m in re.finditer(r"Exchange SinglePartition", plan):
        below = plan[m.start():m.start() + 2500]
        # legitimate: the exchange feeds a window/sort over ALREADY
        # AGGREGATED rows (HashAggregate below it) or a global limit
        # (TakeOrderedAndProject handles top-k without it; a residual
        # GlobalLimit over a LocalLimit is bounded rows)
        if not re.search(r"HashAggregate|ObjectHashAggregate|SortAggregate|"
                         r"LocalLimit|LocalTableScan", below):
            flags.append("single-partition-exchange-over-full-input")
            break
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from biocypher_metta_spark.entry_queries import QUERIES

    from biocypher_metta_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[8]",
                      extra_confs={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")

    clean, flagged = [], {}
    # audits the FULL registry (fine gates + driver composites)
    for name, (fn, _sql) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            flagged[name] = [f"plan-build-error: {type(e).__name__}"]
            continue
        fl = audit_plan(plan)
        if fl:
            flagged[name] = fl
        else:
            clean.append(name)
    print(json.dumps({"n_clean": len(clean), "flagged": flagged,
                      "clean": clean}))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
