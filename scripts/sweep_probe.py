"""Scratch probe: run a reference ScriptTest corpus var through the
golden harness and report pass/fail breakdown. Usage:

    python scripts/sweep_probe.py <corpus.go> <VarName> [start] [end]

Prints each failure (script name + cause) and the ok/skip totals.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.script_golden_harness import parse_script_vars, run_script_seq  # noqa: E402


def main() -> None:
    corpus = Path("/root/reference/enginetest/queries") / sys.argv[1]
    var = sys.argv[2]
    start = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    end = int(sys.argv[4]) if len(sys.argv) > 4 else 10 ** 9

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("sweep-probe")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    from tests.test_goldens import FIXTURES
    script_vars = parse_script_vars(corpus)
    scripts = script_vars.get(var)
    if scripts is None:
        print(f"unknown var {var!r} in {corpus.name}; available: "
              f"{', '.join(sorted(script_vars))}")
        sys.exit(1)
    scripts = scripts[start:end]
    print(f"{corpus.name} {var}: {len(scripts)} scripts "
          f"({sum(len(a) for _, _, a in scripts)} asserts)")
    tot_ok = tot_skip = tot_fail = 0
    for i, sc in enumerate(scripts):
        name = sc[0]
        ok, skipped, failures = run_script_seq(
            spark, [sc], FIXTURES, db="mydb")
        status = "ok" if not failures else "FAIL"
        tot_ok += ok
        tot_skip += skipped
        tot_fail += len(failures)
        print(f"[{start + i}] {status} ok={ok} skip={skipped} {name!r}",
              flush=True)
        for n, cause in failures:
            print(f"    - {cause}", flush=True)
    print(f"TOTAL ok={tot_ok} skip={tot_skip} fail={tot_fail}", flush=True)


if __name__ == "__main__":
    main()
