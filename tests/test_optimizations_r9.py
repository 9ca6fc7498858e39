"""Focused pins for the round-9 optimization internals.

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


def test_spread_is_scale_adaptive(spark):
    """spread() must fan out a single-split input but leave an
    already-parallel input unshuffled (the 100 TB no-op guarantee)."""
    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    fanned = spread(narrow, "id")
    assert fanned.rdd.getNumPartitions() == target

    wide = spark.range(1000).repartition(target, "id")
    same = spread(wide, "id")
    # no extra exchange: the returned plan is the input plan
    assert same is wide


def test_minhash_signatures_codegen_shape(spark):
    """r9 signature formulation: md5 runs in a codegen'd projection (not
    inside an interpreted HOF lambda) and the signature aggregate reuses
    the spread partitioning — no exchange between the shingle explode and
    the per-doc aggregate, and no Python evaluation anywhere."""
    from go_mysql_server_spark.operators.dedup import minhash_signatures
    from go_mysql_server_spark.sources import load

    docs = load(spark, SF_DIR, "documents")
    plan = _formatted(minhash_signatures(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly one hash exchange: the scale-adaptive spread. The partial
    # and final HashAggregate sit in the same stage above the Generate.
    assert plan.count("hashpartitioning(") == 1
    assert "Generate" in plan and "HashAggregate" in plan
    # md5 must NOT appear inside a lambdafunction (the interpreted path
    # the r9 rewrite removed)
    import re
    assert not re.search(r"lambdafunction\([^)]*md5", plan)


def test_kmeans_skips_final_centroid_update(spark):
    """The returned assignment uses the round-(N-1) centroids, so kmeans
    must not compute a round-N centroid update: with iterations=1 the
    whole call is assignment-only (no aggregate job beyond the seed), and
    results must still match the 3-round entry's oracle discipline."""
    from go_mysql_server_spark.operators.clustering import kmeans
    from go_mysql_server_spark.sources import load

    emb = load(spark, SF_DIR, "embeddings")
    one = kmeans(emb, k=4, iterations=1)
    # assignment exists for every vector and clusters come from the seed
    n = emb.count()
    rows = one.agg(F.count("*"), F.min("cluster"), F.max("cluster")).first()
    assert rows[0] == n
    assert 0 <= rows[1] and rows[2] <= 3


def test_char_lm_model_builds_inside_broadcast(spark):
    """The bigram model must never leave Spark: no Scan ExistingRDD (the
    old collect + createDataFrame round-trip) — the model subtree is a
    parquet-scan aggregate inside the broadcast exchange."""
    from go_mysql_server_spark.plans import all_queries

    df = all_queries()["pipeline_char_lm_score"](spark, SF_DIR)
    plan = _formatted(df)
    assert "Scan ExistingRDD" not in plan
    assert "BroadcastExchange" in plan


def test_load_memo_is_plan_level_only(spark):
    """load() memoization must return an UNEVALUATED DataFrame (same
    logical plan, no InMemoryRelation) — results are recomputed from the
    parquet inputs on every action."""
    from go_mysql_server_spark.sources import load

    a = load(spark, SF_DIR, "lineitem")
    b = load(spark, SF_DIR, "lineitem")
    assert a is b  # memo hit
    assert "InMemoryRelation" not in _formatted(a)
    assert "Scan parquet" in _formatted(a)
