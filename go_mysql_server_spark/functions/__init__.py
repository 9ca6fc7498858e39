"""MySQL scalar-function shim registry.

The reference registers ~300 scalar functions by name
(reference sql/expression/function/registry.go). Here each MySQL name maps
to a builder `(*Column) -> Column` producing idiomatic Spark expressions —
JVM-side compositions of pyspark.sql.functions wherever possible; Python
UDFs only for the few semantics Spark can't express (MySQL JSON mutation,
compress). `mysql_fn(name, *cols)` is the uniform entry point;
`register_udfs(spark)` makes the UDF-backed names callable from SQL text.

Coverage philosophy: ~80% of MySQL names have same-name Spark builtins
(SURVEY.md §2.9 table); those map 1:1. The rest are MySQL-specific
(dayname, to_days, inet_aton, …) and are built as expression compositions
documented per-function.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession

from . import datetime_fns, extra_fns, scalar_basic, spatial, special, wkb_fns

REGISTRY: dict[str, object] = {}
for mod in (scalar_basic, datetime_fns, special, spatial, extra_fns, wkb_fns):
    REGISTRY.update(mod.FUNCTIONS)


def mysql_fn(name: str, *args) -> Column:
    """Build a Column for the MySQL function `name` (case-insensitive)."""
    try:
        builder = REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(f"unknown MySQL function: {name}") from None
    return builder(*args)


def names() -> list[str]:
    return sorted(REGISTRY)


def register_udfs(spark: SparkSession) -> None:
    """Register the Python-UDF-backed shims for SQL-text callers."""
    special.register_udfs(spark)
    from .udtf_fns import register_udtfs
    register_udtfs(spark)
