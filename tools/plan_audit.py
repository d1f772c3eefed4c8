#!/usr/bin/env python
"""Suite-wide physical-plan audit (exploratory; invariants live in
tests/test_plans.py).

For every declared query at sf0.01, prints one line of plan-shape
stats: #Exchange, #BroadcastExchange, #Sort, Python-eval node kinds,
cartesian products, and scans that read every column.  Use this to
spot shuffle-heavy or pushdown-broken queries the per-query guards
don't cover.

Usage: python tools/plan_audit.py [sf_dir] [only_prefix]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ros_sql_spark.plans.queries import QUERIES
from ros_sql_spark.session import get_spark


def audit(plan: str) -> dict:
    return {
        "exch": len(re.findall(r"\bExchange hashpartitioning", plan)),
        "range": len(re.findall(r"\bExchange rangepartitioning", plan)),
        "single": len(re.findall(r"\bExchange SinglePartition", plan)),
        "bcast": len(re.findall(r"\bBroadcastExchange", plan)),
        "sort": len(re.findall(r"\bSort \[", plan)),
        "pyrow": len(re.findall(r"\bBatchEvalPython", plan)),
        "pyarrow": len(re.findall(r"\b(ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas)", plan)),
        "cart": len(re.findall(r"\bCartesianProduct", plan)),
        "nlj": len(re.findall(r"\bBroadcastNestedLoopJoin", plan)),
        "scans": len(re.findall(r"\bFileScan parquet", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    hdr = "query                        exch rng 1p bc sort pyR pyA cart nlj scans"
    print(hdr)
    for name, fn in QUERIES.items():
        if only and not name.startswith(only):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        except Exception as e:  # pragma: no cover - audit tool
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            continue
        a = audit(plan)
        flags = []
        if a["cart"]:
            flags.append("CARTESIAN")
        if a["pyrow"]:
            flags.append("ROW-PYTHON")
        if a["single"]:
            flags.append("1-PART")
        print(
            f"{name:28s} {a['exch']:4d} {a['range']:3d} {a['single']:2d} "
            f"{a['bcast']:2d} {a['sort']:4d} {a['pyrow']:3d} {a['pyarrow']:3d} "
            f"{a['cart']:4d} {a['nlj']:3d} {a['scans']:5d}  {' '.join(flags)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
