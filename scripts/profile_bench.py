#!/usr/bin/env python
"""Per-query profiling for the optimization rounds (guide §1).

For each headline query: capture .explain("formatted") to
plans/r09/<name>_<tag>.txt and time the computation with the noop sink
(guide §1.4) so the sink isn't billed.  Prints a JSON line compatible
with bench.py's shape (plus plan stats) to stdout.

Usage: python scripts/profile_bench.py <tag> [query ...]
  tag: suffix for the plan files (before/after)
  query: subset to profile (default: the full bench HEADLINE list)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from go_mysql_server_spark.plans import all_queries
from go_mysql_server_spark.session import build_session

PLAN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r10"))


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", plan)),
        "batch_eval_py": len(re.findall(r"\bBatchEvalPython\b", plan)),
        "arrow_eval_py": len(re.findall(r"\bArrowEvalPython\b", plan)),
        "map_in_py": len(re.findall(r"\bMapInPandas\b|\bMapInArrow\b|\bPythonMapInArrow\b", plan)),
        "sorts": len(re.findall(r"\bSort \[", plan)),
        "wsc_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = build_session("gms-spark-profile", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(cpus).repartition(cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long").count()

    queries = all_queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        stats = plan_stats(plan)
        samples = []
        import gc
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            # release checkpointed RDD blocks between reps (same discipline
            # as bench.py) so one query's state doesn't tax the next
            gc.collect()
        out[name] = {"noop_min": min(samples), "noop_all": samples, **stats}
        print(f"# {name}: {min(samples):.3f}s {stats}", file=sys.stderr)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
