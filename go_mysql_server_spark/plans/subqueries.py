"""Subqueries, CTEs, recursive CTEs — SURVEY.md §2.7.

Reference: scalar subquery w/ caching (sql/plan/subquery.go:31-56),
InSubquery (insubquery.go), ExistsSubquery (existssubquery.go),
decorrelation rules (unnest_in_subqueries.go:42, unnest_exists_subqueries.go:75),
CTE inlining (planbuilder/cte.go), RecursiveCte (plan/recursive_cte.go:25-70).
Catalyst does scalar-subquery planning and decorrelation natively; recursive
CTEs use our driver-side fixpoint (operators/recursive_cte.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.recursive_cte import recursive_cte
from ._util import t
from .registry import query


@query(
    "subquery_scalar_uncorrelated",
    oracle="""
SELECT o_orderkey, o_totalprice,
       ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 4) AS delta_vs_avg
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.9
ORDER BY o_orderkey
""",
)
def subquery_scalar_uncorrelated(spark, sf_dir):
    """Scalar subquery used in both WHERE and SELECT (reference
    subquery.go — result cached once; Catalyst plans a ReusedSubquery)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_ss")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM v_orders_ss), 4)
                   AS delta_vs_avg
        FROM v_orders_ss
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM v_orders_ss) * 1.9
        ORDER BY o_orderkey
        """
    )


@query(
    "subquery_scalar_correlated",
    oracle="""
SELECT s_suppkey, s_name FROM supplier s
WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = s.s_nationkey)
ORDER BY s_suppkey
""",
)
def subquery_scalar_correlated(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates to an aggregate
    + join (the reference hoists via hoist_filters.go / unnest rules)."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier_sc")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM v_supplier_sc s
        WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM v_supplier_sc s2
                           WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY s_suppkey
        """
    )


@query(
    "subquery_exists_correlated",
    oracle="""
SELECT n_nationkey, n_name FROM nation
WHERE EXISTS (SELECT 1 FROM customer
              WHERE c_nationkey = n_nationkey AND c_acctbal > 9500)
ORDER BY n_nationkey
""",
)
def subquery_exists_correlated(spark, sf_dir):
    t(spark, sf_dir, "nation").createOrReplaceTempView("v_nation_ex")
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_ex")
    return spark.sql(
        """
        SELECT n_nationkey, n_name FROM v_nation_ex
        WHERE EXISTS (SELECT 1 FROM v_customer_ex
                      WHERE c_nationkey = n_nationkey AND c_acctbal > 9500)
        ORDER BY n_nationkey
        """
    )


@query(
    "subquery_in_derived_table",
    oracle="""
SELECT seg.c_nationkey, seg.n_cust
FROM (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer WHERE c_mktsegment = 'BUILDING'
      GROUP BY c_nationkey) seg
WHERE seg.n_cust IN (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
                     GROUP BY c_nationkey, c_mktsegment)
ORDER BY seg.c_nationkey
""",
)
def subquery_in_derived_table(spark, sf_dir):
    """Derived table (SubqueryAlias, reference subqueryalias.go) + IN over a
    subquery of aggregates. The derived counts (BUILDING per nation) are a
    subset of the IN-list's (nation, segment) counts, so the match is
    non-vacuous at every sf (the old segment-total vs per-nation-count
    compare never matched — r6 verdict)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_dt")
    return spark.sql(
        """
        SELECT seg.c_nationkey, seg.n_cust
        FROM (SELECT c_nationkey, COUNT(*) AS n_cust
              FROM v_customer_dt WHERE c_mktsegment = 'BUILDING'
              GROUP BY c_nationkey) seg
        WHERE seg.n_cust IN (SELECT COUNT(*) FROM v_customer_dt
                             GROUP BY c_nationkey, c_mktsegment)
        ORDER BY seg.c_nationkey
        """
    )


@query(
    "cte_multi_reference",
    oracle="""
WITH big_orders AS (
  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000
),
per_cust AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big,
         ROUND(SUM(o_totalprice), 2) AS total
  FROM big_orders GROUP BY o_custkey
)
SELECT p.o_custkey AS custkey, p.n_big, p.total
FROM per_cust p
WHERE p.n_big >= (SELECT MAX(n_big) FROM per_cust) - 1
ORDER BY custkey
""",
)
def cte_multi_reference(spark, sf_dir):
    """WITH: one CTE consumed twice (reference inlines CTEs at binding,
    planbuilder/cte.go; Spark reuses the subquery via ReusedExchange)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_cte")
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_custkey, o_totalprice FROM v_orders_cte WHERE o_totalprice > 300000
        ),
        per_cust AS (
          SELECT o_custkey, COUNT(*) AS n_big, ROUND(SUM(o_totalprice), 2) AS total
          FROM big_orders GROUP BY o_custkey
        )
        SELECT p.o_custkey AS custkey, p.n_big, p.total
        FROM per_cust p
        WHERE p.n_big >= (SELECT MAX(n_big) FROM per_cust) - 1
        ORDER BY custkey
        """
    )


@query(
    "recursive_cte_series",
    oracle="""
WITH RECURSIVE t(n) AS (
  SELECT 1
  UNION ALL
  SELECT n + 1 FROM t WHERE n < 12
)
SELECT n, n * n AS n_squared FROM t ORDER BY n
""",
)
def recursive_cte_series(spark, sf_dir):
    """WITH RECURSIVE ... UNION ALL (series generation) via the driver-side
    fixpoint loop (operators/recursive_cte.py; reference recursive_cte.go)."""
    seed = spark.createDataFrame([(1,)], "n int")

    def step(delta):
        return delta.filter(F.col("n") < 12).select((F.col("n") + 1).alias("n"))

    acc = recursive_cte(seed, step, distinct=False)
    return acc.select("n", (F.col("n") * F.col("n")).alias("n_squared")).orderBy("n")


@query(
    "recursive_cte_graph_reachability",
    oracle="""
WITH RECURSIVE edges(src, dst) AS (
  SELECT * FROM (VALUES (0,1),(1,2),(2,3),(3,4),(1,5),(5,6),(6,2),(7,8)) e(src, dst)
),
reach(node) AS (
  SELECT 0
  UNION
  SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node FROM reach ORDER BY node
""",
)
def recursive_cte_graph(spark, sf_dir):
    """WITH RECURSIVE ... UNION (distinct fixpoint): transitive closure /
    reachability over an edge list — the reference's graph_tables fixture
    exercises exactly this shape."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 2), (7, 8)],
        "src int, dst int",
    )
    seed = spark.createDataFrame([(0,)], "node int")

    def step(delta):
        return (
            delta.join(edges, delta.node == edges.src)
            .select(F.col("dst").alias("node"))
        )

    return recursive_cte(seed, step, distinct=True).orderBy("node")
