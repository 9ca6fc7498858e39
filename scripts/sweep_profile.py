#!/usr/bin/env python
"""One-rep noop timing + plan-marker audit over EVERY registry query.

Flags scale-killer markers (CartesianProduct, BroadcastNestedLoopJoin,
BatchEvalPython, SinglePartition windows) and prints a JSON report sorted
by time, so the optimization round can show every operator was examined
(guide §1: measure first).

Usage: python scripts/sweep_profile.py [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mysql_server_spark.plans import all_queries
from go_mysql_server_spark.session import build_session


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_profile.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("gms-sweep-profile", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(cpus).repartition(cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long").count()

    import gc
    report: dict[str, dict] = {}
    for name, fn in all_queries().items():
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            flags = [m for m in ("CartesianProduct", "BroadcastNestedLoopJoin",
                                 "BatchEvalPython")
                     if m in plan]
            if re.search(r"Window.*SinglePartition|SinglePartition.*Window",
                         plan, re.DOTALL):
                # only flag windows over unbounded relations; bounded
                # aggregates (model tables) are adjudicated in the report
                flags.append("SinglePartitionWindow")
            report[name] = {"sec": dt, "flags": flags}
            print(f"# {name}: {dt:.3f}s {flags or ''}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            report[name] = {"sec": None, "err": str(e)[:200]}
            print(f"# {name}: ERR {str(e)[:120]}", file=sys.stderr)
        gc.collect()
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    timed = {k: v["sec"] for k, v in report.items() if v.get("sec")}
    print(json.dumps({
        "n": len(report),
        "errors": [k for k, v in report.items() if v.get("err")],
        "flagged": {k: v["flags"] for k, v in report.items() if v.get("flags")},
        "slowest": sorted(timed.items(), key=lambda kv: -kv[1])[:25],
        "total_sec": round(sum(timed.values()), 1),
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
