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
    "go_mysql_server_spark.plans.relational",
    "go_mysql_server_spark.plans.aggregates",
    "go_mysql_server_spark.plans.windows",
    "go_mysql_server_spark.plans.subqueries",
    "go_mysql_server_spark.plans.functions_catalog",
    "go_mysql_server_spark.plans.pipeline",
    "go_mysql_server_spark.plans.events_catalog",
    "go_mysql_server_spark.plans.json_fulltext",
    "go_mysql_server_spark.plans.pipeline2",
    "go_mysql_server_spark.plans.semantics",
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


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)
