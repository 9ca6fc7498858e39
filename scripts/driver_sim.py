"""Simulate the driver's correctness pass: run every queries() entry and its
oracle_sql() at a given sf, compare with the harness canon, and time each.

Usage: python scripts/driver_sim.py [sf_dir] [name_filter...]
Prints per-query wall time (spark + duckdb) and any mismatches, slowest first.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from go_mysql_server_spark.session import build_session  # noqa: E402
from tests.harness import compare  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session("driver-sim", cpus=32)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    t_total = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        status = "ok"
        problems: list[str] = []
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
            t_spark = time.time() - t0
            if name in oracles:
                t1 = time.time()
                rel = con.execute(oracles[name])
                problems = compare_collected(df, rows, rel)
                t_oracle = time.time() - t1
            else:
                t_oracle = 0.0
            if problems:
                status = "MISMATCH"
        except Exception as exc:  # noqa: BLE001
            t_spark = time.time() - t0
            t_oracle = 0.0
            status = f"ERROR: {exc}"[:200]
        results[name] = {
            "t": round(time.time() - t0, 2),
            "t_spark": round(t_spark, 2),
            "t_oracle": round(t_oracle, 2),
            "status": status,
            "problems": problems[:3],
        }
        print(f"{results[name]['t']:7.2f}s  {name}  {status}", flush=True)

    print(f"\nTOTAL {time.time() - t_total:.1f}s for {len(results)} queries")
    slow = sorted(results.items(), key=lambda kv: -kv[1]["t"])[:15]
    print("\nSlowest:")
    for name, r in slow:
        print(f"  {r['t']:7.2f}s  (spark {r['t_spark']:.2f} / oracle "
              f"{r['t_oracle']:.2f})  {name}")
    bad = {k: v for k, v in results.items() if v["status"] != "ok"}
    if bad:
        print("\nFAILURES:")
        print(json.dumps(bad, indent=2))
    spark.stop()


def compare_collected(df, rows, rel):
    """compare() but reusing already-collected spark rows."""
    import tests.harness as h

    class _Fake:
        columns = df.columns

        @staticmethod
        def collect():
            return rows

    return h.compare(_Fake, rel)


if __name__ == "__main__":
    main()
