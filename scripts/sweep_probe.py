"""Exploratory corpus sweeper: run one []ScriptTest var through the
Engine and print pass/skip/failure tallies with the first N failures,
to build skip-lists and find engine gaps before registering the sweep
as a pytest. Usage:
    python scripts/sweep_probe.py trigger_queries.go TriggerTests [max]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession

from tests.script_golden_harness import parse_script_vars, run_script_seq


def main() -> None:
    fname, var = sys.argv[1], sys.argv[2]
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .appName("sweep-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from tests.test_goldens import FIXTURES

    scripts = parse_script_vars(
        Path("/root/reference/enginetest/queries") / fname).get(var, [])
    if limit:
        scripts = scripts[:limit]
    print(f"{len(scripts)} scripts in {var}")
    ok, skipped, failures = run_script_seq(spark, scripts, FIXTURES)
    print(f"ok={ok} skipped={skipped} failures={len(failures)}")
    for name, msg in failures[:60]:
        print(f"  [{name[:60]}] {msg}")


if __name__ == "__main__":
    main()
