"""Focused pins for the round-10 optimization internals.

Each test pins the mechanism an optimization relies on, so a later change
that silently regresses it fails here rather than only showing up as bench
seconds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mysql_server_spark.operators.scale import spread

from .conftest import SF_DIR


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_spread_skips_wide_plans(spark):
    """spread() must be an identity no-op on plans that already contain a
    wide (exchange-planning) operator: probing them with df.rdd under AQE
    executes every upstream shuffle stage at plan-construction time (r9
    advice — ngram_jaccard's probe ran the candidate pipeline twice)."""
    left = spark.range(100).coalesce(1)
    right = spark.range(50).selectExpr("id", "id * 2 AS v").coalesce(1)
    joined = left.join(right, "id")
    assert spread(joined, "id") is joined
    agged = spark.range(100).groupBy((F.col("id") % 10).alias("k")).count()
    assert spread(agged, "k") is agged
    # shuffle-false coalesce stays probeable (narrow, no query stage):
    narrow = spark.range(1000).coalesce(1)
    assert (spread(narrow, "id").rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)
