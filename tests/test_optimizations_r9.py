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


def test_shingle_and_feature_projections_tokenize_once(spark):
    """The tokenize-once rewrite: every shingle/feature pipeline must
    carry ONE materialized split of the text column — an inlined split is
    re-evaluated per HOF reference (per shingle position inside the
    transform lambda: O(tokens^2) per doc)."""
    from go_mysql_server_spark.plans import all_queries

    qs = all_queries()
    for name in ("text_fingerprints", "text_features",
                 "langid_accuracy_by_source", "pipeline_quality_rules"):
        plan = _formatted(qs[name](spark, SF_DIR))
        assert plan.count("split(lower(trim(text") == 1, name
    # minhash signature stage: one split, and never inside a lambda
    from go_mysql_server_spark.operators.dedup import minhash_signatures
    from go_mysql_server_spark.sources import load

    plan = _formatted(minhash_signatures(load(spark, SF_DIR, "documents")))
    assert plan.count("split(lower(trim(text") == 1
    import re
    assert not re.search(r"lambdafunction\([^)]*split\(", plan)


def test_fulltext_membership_predicates_are_codegen_able(spark):
    """Fulltext match predicates must be array_contains/arrays_overlap
    (codegen'd, pushed to the scan), not interpreted HOF count
    comparisons running corpus-wide per row."""
    from go_mysql_server_spark.plans import all_queries

    qs = all_queries()
    plan = _formatted(qs["fulltext_match_against"](spark, SF_DIR))
    assert "arrays_overlap" in plan
    plan = _formatted(qs["fulltext_boolean_mode"](spark, SF_DIR))
    assert plan.count("array_contains") == 2
    # the tf count (interpreted HOF) survives only in the projection for
    # matched rows, not in the pushed filter condition
    cond = [ln for ln in plan.splitlines() if ln.startswith("Condition")]
    assert cond and all("lambdafunction" not in ln for ln in cond)


def test_kmeans_assign_is_minby_aggregate(spark):
    """The Lloyd assign step must be a min(struct) hash aggregate (partial
    agg collapses the k candidates map-side), not a window row_number
    argmin that sorts k×N scored rows per iteration."""
    from go_mysql_server_spark.plans import all_queries

    plan = _formatted(all_queries()["similarity_kmeans_ivf"](spark, SF_DIR))
    assert "min(struct" in plan
    assert "row_number" not in plan


def test_ivf_cell_assignment_not_reevaluated_in_scan_filter(spark):
    """IVF cell assignment: the per-cell score array materializes once as
    a _sc column and the join key is non-nullable (coalesce(..., -1)), so
    no Filter condition re-evaluates the argmax expression below the
    spread exchange (the single-split scan task)."""
    from go_mysql_server_spark.plans import all_queries

    qs = all_queries()
    for name in ("similarity_ivf_probe", "similarity_ivf_pq_search"):
        plan = _formatted(qs[name](spark, SF_DIR))
        assert "_sc" in plan, name
        conds = [ln for ln in plan.splitlines()
                 if ln.startswith("Condition")]
        assert conds, name
        assert all("array_position" not in ln for ln in conds), name
