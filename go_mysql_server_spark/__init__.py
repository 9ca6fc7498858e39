"""go_mysql_server_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of dolthub/go-mysql-server (the "reference").

The reference is a single-process, pull-based, row-at-a-time MySQL engine
(see /root/reference/ARCHITECTURE.md). This package re-expresses the same
*capabilities* — operators, query semantics, function library, data model —
on top of Spark's DataFrame/Catalyst/Tungsten stack, where the analyzer,
optimizer, join planning, spill, and parallelism come from Spark itself.

Layout:
  session.py   — tuned SparkSession factory (AQE, shuffle sizing, UTC, ANSI-off)
  sources/     — table registration over parquet dirs (the storage SPI analogue)
  plans/       — the query catalog: every operator from SURVEY.md §2 expressed
                 as a DataFrame builder + a DuckDB oracle SQL string
  functions/   — MySQL function-name shims over pyspark.sql.functions
  operators/   — operators Spark lacks natively: dedup (minhash/simhash),
                 similarity search, text analysis, recursive CTE, multimodal
  streaming/   — Structured Streaming variants of the events-table ops
  dialect/     — MySQL-dialect SQL frontend (transpile → spark.sql)
"""

__version__ = "0.1.0"
