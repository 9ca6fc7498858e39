"""Query catalog registry.

Every operator claimed as implemented (SURVEY.md §2) registers here twice:
a Spark DataFrame builder `(spark, sf_dir) -> DataFrame` and, when the
semantics are SQL-expressible, the equivalent ANSI SQL the DuckDB oracle
runs on the same parquet files. The driver hash-compares the two at sf0.01;
tests/test_queries.py does the same locally at sf0.001.

Mirrors the reference's test strategy: a golden corpus of (query, expected)
pairs (reference enginetest/queries/queries.go:42-80), except our "expected"
is computed by an independent engine rather than checked in.

Conventions (driver contract):
- alias every computed column identically in the builder and the oracle —
  the compare sorts columns by name before hashing values;
- floating aggregates are ROUND()ed identically on both sides so that
  summation-order differences between engines can't flip the hash;
- deterministic output — no rand(), no engine-specific tie-breaks: every
  top-k / row_number orders by a unique key as the final tiebreak.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that populate the registry on import.
_PLAN_MODULES = (
    "go_mysql_server_spark.plans.tpch",
    "go_mysql_server_spark.plans.tpch2",
    "go_mysql_server_spark.plans.tpch3",
    "go_mysql_server_spark.plans.relational",
    "go_mysql_server_spark.plans.aggregates",
    "go_mysql_server_spark.plans.windows",
    "go_mysql_server_spark.plans.subqueries",
    "go_mysql_server_spark.plans.functions_catalog",
    "go_mysql_server_spark.plans.functions_catalog2",
    "go_mysql_server_spark.plans.collation_catalog",
    "go_mysql_server_spark.plans.pipeline",
    "go_mysql_server_spark.plans.events_catalog",
    "go_mysql_server_spark.plans.json_fulltext",
    "go_mysql_server_spark.plans.pipeline2",
    "go_mysql_server_spark.plans.pipeline3",
    "go_mysql_server_spark.plans.pipeline4",
    "go_mysql_server_spark.plans.pipeline5",
    "go_mysql_server_spark.plans.semantics",
    # keep last: dml_* entries queue behind the 45 not-yet-verified catalog
    # entries so the driver's row budget closes the catalog first (r3),
    # then picks these up (r3 tail + r4)
    "go_mysql_server_spark.plans.dml_catalog",
    # round-3 additions queue last: the driver budget should close the 43
    # never-verified entries and the dml_* batch first; these follow in r4
    "go_mysql_server_spark.plans.pipeline6",
    # round-4: DDL/admin/stored-program oracle slice + query expansion
    "go_mysql_server_spark.plans.ddl_admin_catalog",
    # round-4: streaming-engine executions (availableNow drain → oracle)
    "go_mysql_server_spark.plans.streaming_catalog",
    # round-7: row-sequential triggers + wire/dbapi round-trip (r6 surface)
    "go_mysql_server_spark.plans.server_catalog",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def _ensure_loaded() -> None:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)


# Names with a green CORRECTNESS row from a previous round's driver run.
# The driver verifies queries() in iteration order under a budget (r1
# stopped at exactly the first 50 entries), so not-yet-verified queries are
# emitted FIRST to maximize cumulative driver coverage across rounds.
#
# Derived automatically from the in-repo CORRECTNESS_r*.json files the
# driver writes each round (a hand-maintained set went stale in r3 and
# would have burned a whole driver budget re-verifying greens). A red or
# errored row is NOT in the set, so the driver re-checks it first with
# whatever fix this round landed.


def _load_driver_verified() -> dict[str, int]:
    """name -> round number of the most recent green driver row.

    The round matters (r4 verdict task 3): with the catalog closed, a
    membership-only set made the driver's 50-row budget re-check the same
    first-50 names every round. Recording WHEN each name was last green
    lets `_ordered` emit least-recently-verified first, so the budget
    rotates through the whole catalog across rounds.
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    green: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):  # unreadable/partial file: skip
            continue
        if not isinstance(rows, dict):
            continue
        for name, res in rows.items():
            if not isinstance(res, dict):
                continue
            ok = res.get("err") is None and (
                res.get("hash_match") is True
                or (res.get("hash_match") is None
                    and res.get("rows_match") is True)
            )
            if ok:
                green[name] = max(rnd, green.get(name, 0))
            else:
                # a later red overrides an earlier green: re-verify first
                green.pop(name, None)
    return green


DRIVER_VERIFIED = _load_driver_verified()


def _ordered(names: list[str]) -> list[str]:
    fresh = [n for n in names if n not in DRIVER_VERIFIED]
    # stale greens first: a name last verified in r1 re-checks before one
    # verified in r4; ties keep registration order (sort is stable)
    seen = sorted((n for n in names if n in DRIVER_VERIFIED),
                  key=lambda n: DRIVER_VERIFIED[n])
    return fresh + seen


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {n: _QUERIES[n] for n in _ordered(list(_QUERIES))}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {n: _ORACLES[n] for n in _ordered([n for n in _QUERIES if n in _ORACLES])}
