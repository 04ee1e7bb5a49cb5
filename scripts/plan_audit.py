"""Plan audit over the whole registry: build (don't execute) every face's
plan at a given SF and count cost-shaped physical nodes — Exchange,
Sort, SortAggregate, BroadcastNestedLoopJoin, CartesianProduct,
BatchEvalPython/ArrowEvalPython — so optimization rounds can rank
structural outliers without running anything.

Usage: python scripts/plan_audit.py [sf_dir] > audit.tsv
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = ("Exchange", "Sort ", "SortAggregate", "BroadcastNestedLoopJoin",
         "CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "SortMergeJoin", "Window ")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from process_nwb_spark.session import get_spark
    from process_nwb_spark.relational.core import all_queries, clear_persist_slots

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    rows = []
    for name, spec in registry.items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            rows.append((name, {"ERR": repr(e)[:80]}))
            clear_persist_slots()
            continue
        counts = {n.strip(): len(re.findall(re.escape(n), plan))
                  for n in NODES}
        rows.append((name, counts))
        clear_persist_slots()
    hdr = ["face"] + [n.strip() for n in NODES]
    print("\t".join(hdr))
    for name, c in rows:
        if "ERR" in c:
            print(f"{name}\tERR {c['ERR']}")
        else:
            print("\t".join([name] + [str(c[h]) for h in hdr[1:]]))
    spark.stop()


if __name__ == "__main__":
    main()
