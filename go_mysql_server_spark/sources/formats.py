"""Multi-format table IO: CSV / JSON-lines / ORC / Parquet round-trips.

The reference's storage SPI lets any integrator back a table
(reference sql/tables.go:22-33; memory/, and the dolt backend in the
wild). The Spark-first equivalent is the DataSource API — every format
below arrives with predicate pushdown / column pruning (Parquet, ORC) or
schema projection (CSV, JSON) for free, and swapping a table's format
changes nothing above `sources.load`.

Scale notes per format:
- parquet/orc: columnar, splittable, stats-based row-group skipping — the
  only formats to use at 100 TB; writers support partitionBy for
  partition-pruned reads (see writer.py for the bucketed variant).
- csv/json: row-oriented interchange; splittable only uncompressed. The
  readers take explicit schemas — inference is a full extra pass over the
  data, unacceptable at scale and nondeterministic under sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_WRITE_OPTS = {
    "csv": {"header": "true"},
    "json": {},
    "orc": {},
    "parquet": {},
}


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    if fmt not in _WRITE_OPTS:
        raise ValueError(f"unsupported format {fmt!r}")
    w = df.write.mode(mode).format(fmt)
    for k, v in _WRITE_OPTS[fmt].items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: T.StructType | str | None = None) -> DataFrame:
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true")
        if schema is None:
            raise ValueError(
                "CSV needs an explicit schema (inference = extra full pass)")
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
