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
