"""Property tests for operators whose outputs are engine-specific in the
last float ulp (no DuckDB oracle): k-means clustering invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mysql_server_spark.operators.clustering import kmeans
from go_mysql_server_spark.operators.similarity import l2_squared
from go_mysql_server_spark.sources import load

from .conftest import SF_DIR


def test_kmeans_invariants(spark):
    emb = load(spark, SF_DIR, "embeddings")
    n = emb.count()
    out = kmeans(emb, k=8, iterations=3)
    rows = out.collect()

    # 1. total cover: every vector assigned exactly once
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n

    # 2. all k clusters non-empty on this data
    clusters = {r["cluster"] for r in rows}
    assert clusters == set(range(8))

    # 3. distances are non-negative and finite
    assert all(r["dist"] >= 0 for r in rows)

    # 4. iterating strictly reduces (or keeps) total inertia vs 1 round
    def inertia(k_iters):
        res = kmeans(emb, k=8, iterations=k_iters)
        return res.agg(F.sum(F.col("dist") * F.col("dist"))).first()[0]

    assert inertia(3) <= inertia(1) * (1 + 1e-9)


# ---- round 2: multi-format IO ----------------------------------------------


def test_format_roundtrips(spark, tmp_path):
    from go_mysql_server_spark.sources.formats import read_table, write_table
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)],
        "id bigint, s string, v double")
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / fmt)
        write_table(src, path, fmt)
        back = read_table(spark, path, fmt, schema="id bigint, s string, v double")
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in src.collect()), fmt


def test_format_partitioned_write_prunes(spark, tmp_path):
    from go_mysql_server_spark.sources.formats import read_table, write_table
    src = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(30)], "id bigint, g string")
    path = str(tmp_path / "part")
    write_table(src, path, "parquet", partition_by=["g"])
    back = read_table(spark, path, "parquet").filter("g = 'g1'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(g" in plan, plan[:500]
    assert back.count() == 10


# ---- round 3: reliable checkpointing for iterative operators ----------------


def test_iter_checkpoint_both_paths(spark):
    """iter_checkpoint: localCheckpoint by default; with
    spark.gms.reliableCheckpoint=true it writes to a reliable checkpoint
    dir (survives executor loss on a cluster). Both paths must produce the
    same fixpoint result."""
    from go_mysql_server_spark.operators.recursive_cte import recursive_cte

    def run():
        seed = spark.createDataFrame([(1,)], "n int")
        return sorted(
            r["n"] for r in recursive_cte(
                seed,
                lambda d: d.selectExpr("n + 1 AS n").filter("n <= 6"),
            ).collect()
        )

    try:
        spark.conf.set("spark.gms.reliableCheckpoint", "false")
        local = run()
        spark.conf.set("spark.gms.reliableCheckpoint", "true")
        reliable = run()
    finally:
        spark.conf.set("spark.gms.reliableCheckpoint", "false")
    assert local == reliable == [1, 2, 3, 4, 5, 6]
    # the reliable path must have registered a checkpoint dir
    assert not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()
