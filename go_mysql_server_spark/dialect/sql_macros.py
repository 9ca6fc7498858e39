"""Spark 4 SQL-UDF macros for MySQL functions Spark SQL lacks.

The Column-builder registry (functions/) covers the DataFrame API; these
make the same shims callable from SQL text (Engine statements). Each is a
`CREATE TEMPORARY FUNCTION ... RETURN expr` macro — Catalyst inlines the
body into the caller, so they cost the same as writing the expression by
hand (no Python round-trip). Reference: sql/expression/function/time.go.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_T2S = ("(CAST(split({t}, ':')[0] AS BIGINT) * 3600"
        " + CAST(split({t}, ':')[1] AS BIGINT) * 60"
        " + CAST(CAST(split({t}, ':')[2] AS DOUBLE) AS BIGINT))")

_S2T = ("format_string('%02d:%02d:%02d', CAST({s} / 3600 AS BIGINT), "
        "CAST(({s} % 3600) / 60 AS BIGINT), CAST({s} % 60 AS BIGINT))")

_MACROS = [
    ("time_to_sec", "(t STRING)", "BIGINT", _T2S.format(t="t")),
    ("sec_to_time", "(s BIGINT)", "STRING", _S2T.format(s="s")),
    ("addtime", "(t STRING, d STRING)", "STRING",
     _S2T.format(s=f"({_T2S.format(t='t')} + {_T2S.format(t='d')})")),
    ("subtime", "(t STRING, d STRING)", "STRING",
     _S2T.format(s=f"({_T2S.format(t='t')} - {_T2S.format(t='d')})")),
    ("maketime", "(h BIGINT, m BIGINT, s BIGINT)", "STRING",
     "format_string('%02d:%02d:%02d', h, m, s)"),
    # MySQL TO_DAYS('2020-01-01') = 737790 (matches functions/datetime_fns)
    ("to_days", "(d DATE)", "BIGINT", "datediff(d, DATE '0000-01-01')"),
]


def register_sql_macros(spark: SparkSession) -> None:
    for name, params, rtype, body in _MACROS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{params} "
            f"RETURNS {rtype} RETURN {body}"
        )
