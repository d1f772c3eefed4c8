#!/usr/bin/env python
"""Round-15 optimization profiler: solo min-of-N timings + formatted
plans for named queries.

Usage: python tools/profile_r15.py q1,q2,... [--runs 3] [--plans-dir plans/r15]
       [--suffix before|after]

Writes plans/r15/<name>_<suffix>.txt with .explain("formatted") output
and prints a JSON line of solo floors.  Same timing methodology as
bench.py (noop sink, min-of-N, warm tables).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ros_sql_spark.plans.queries import QUERIES
from ros_sql_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default="plans/r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ros_sql_spark-profile")
    spark.sparkContext.setLogLevel("ERROR")

    from ros_sql_spark.sources.io import load_table

    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    os.makedirs(args.plans_dir, exist_ok=True)

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()
        cached = getattr(df, "_rosql_cached", None)
        if cached is not None:
            cached.unpersist()

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if not args.no_plans:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            run(QUERIES[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"solo_floors": timings, "runs": args.runs,
                      "suffix": args.suffix}))
    spark.stop()


if __name__ == "__main__":
    main()
