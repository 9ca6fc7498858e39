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


def test_cc_hybrid_converges_logarithmically(spark):
    """The CC fixpoint (pipeline3.cc_min_labels) switches to SV-style
    hooking + shortcut after 3 plain rounds, so a long-diameter graph must
    converge in O(log d) probe jobs, not O(d) — that round-count reduction
    IS the r10 optimization (sf1: 17 -> 8 rounds). Pin it on a 64-node
    chain (diameter 63, ids interleaved so pure pointer-shortcutting alone
    would NOT help): plain propagation would need ~63 rounds; the hybrid
    must land well under 16. Labels must still be the component minimum."""
    from go_mysql_server_spark.plans.pipeline3 import cc_min_labels

    n = 64
    # path over nodes 1..n with ids interleaved: 1, 33, 2, 34, 3, ... so
    # cluster heads self-point and only hooking collapses the chain
    order = [i // 2 + 1 if i % 2 == 0 else n // 2 + 1 + i // 2
             for i in range(n)]
    pairs = [(order[i], order[i + 1]) for i in range(n - 1)]
    e = spark.createDataFrame(pairs, "u long, v long")
    edges = e.unionAll(e.selectExpr("v AS u", "u AS v")).localCheckpoint()

    labels = cc_min_labels(edges)
    rows = labels.collect()
    assert len(rows) == n
    assert all(r.label == 1 for r in rows), rows[:5]


def test_cc_hybrid_round_count(spark):
    """Count probe jobs (one .first() per round) on the interleaved chain:
    must be logarithmic, not linear in the diameter."""
    import go_mysql_server_spark.plans.pipeline3 as p3

    n = 64
    order = [i // 2 + 1 if i % 2 == 0 else n // 2 + 1 + i // 2
             for i in range(n)]
    pairs = [(order[i], order[i + 1]) for i in range(n - 1)]
    e = spark.createDataFrame(pairs, "u long, v long")
    edges = e.unionAll(e.selectExpr("v AS u", "u AS v")).localCheckpoint()

    probes = {"n": 0}
    import pyspark.sql.dataframe as dfmod
    orig_first = dfmod.DataFrame.first

    def counting_first(self, *a, **kw):
        probes["n"] += 1
        return orig_first(self, *a, **kw)

    dfmod.DataFrame.first = counting_first
    try:
        p3.cc_min_labels(edges).collect()
    finally:
        dfmod.DataFrame.first = orig_first
    # init probe + rounds; plain propagation would be ~64 probes
    assert probes["n"] <= 16, probes["n"]


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


def test_numeric_cast_skips_lax_regexp():
    """CAST(<arithmetic> AS DOUBLE/FLOAT) must emit a plain cast: MySQL
    arithmetic always yields numerics, so the lax string-prefix parse is
    the identity there and its two per-row regexp_extract calls are pure
    CPU (r10). String/temporal/boolean operands must keep the lax path."""
    from go_mysql_server_spark.dialect.transpiler import transpile_select

    plain = [
        "SELECT CAST(o_custkey % 10 + 1 AS DOUBLE) FROM orders",
        "SELECT CAST(a * b AS DOUBLE) FROM t",
        "SELECT CAST(FLOOR(x) + 2 AS FLOAT) FROM t",
        "SELECT CAST(COUNT(*) AS DOUBLE) FROM t",
    ]
    lax = [
        "SELECT CAST(c_comment AS DOUBLE) FROM customer",     # bare column
        "SELECT CAST(o_orderdate + 1 AS DOUBLE) FROM orders",  # date_add
        "SELECT CAST('12abc' AS DOUBLE)",                      # string lit
        "SELECT CAST(a * (d1 - d2) AS DOUBLE) FROM t",         # interval
        "SELECT CAST(ts + INTERVAL 1 DAY AS DOUBLE) FROM t",
        "SELECT CAST(o_custkey AS SIGNED) FROM orders",        # int target
        "SELECT CAST(a + 1 AS DECIMAL(10,2)) FROM t",          # decimal tgt
    ]
    for q in plain:
        assert "regexp_extract" not in transpile_select(q), q
    for q in lax:
        assert "regexp_extract" in transpile_select(q), q
