"""Operator-semantics fine points — SURVEY §2.7/§2.8 details that the broad
catalog doesn't pin down: bag-semantics set ops, per-branch set-op limits,
LIKE with ESCAPE, large IN-lists (reference applyHashIn rule), the CAST
matrix, and string/number ordering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import t
from .registry import query


@query(
    "setop_intersect_except_all",
    oracle="""
SELECT 'intersect_all' AS op, nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
  INTERSECT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
) GROUP BY nationkey
UNION ALL
SELECT 'except_all' AS op, nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT s_nationkey AS nationkey FROM supplier
  EXCEPT ALL
  SELECT c_nationkey FROM customer WHERE c_acctbal > 9900
) GROUP BY nationkey
ORDER BY op, nationkey
""",
)
def setop_intersect_except_all(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL bag semantics (reference set_op.go
    distinct flag off): each duplicate participates individually."""
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    ia = (
        cust.filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersectAll(
            cust.filter(F.col("c_mktsegment") == "BUILDING")
            .select(F.col("c_nationkey").alias("nationkey"))
        )
        .groupBy("nationkey").agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    ea = (
        supp.select(F.col("s_nationkey").alias("nationkey"))
        .exceptAll(
            cust.filter(F.col("c_acctbal") > 9900)
            .select(F.col("c_nationkey").alias("nationkey"))
        )
        .groupBy("nationkey").agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    return ia.unionAll(ea).orderBy("op", "nationkey")


@query(
    "setop_branch_order_limit",
    oracle="""
SELECT * FROM (
  (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
   ORDER BY o_totalprice DESC, o_orderkey LIMIT 3)
  UNION ALL
  (SELECT o_orderkey, o_totalprice FROM orders
   ORDER BY o_totalprice ASC, o_orderkey LIMIT 3)
)
ORDER BY p DESC, k
""",
)
def setop_branch_order_limit(spark, sf_dir):
    """Per-branch ORDER BY + LIMIT inside a set operation (reference
    set_op.go:26-60 stores per-op sort fields/limits)."""
    o = t(spark, sf_dir, "orders")
    top = (
        o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
        .orderBy(F.desc("p"), "k").limit(3)
    )
    bottom = (
        o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
        .orderBy(F.asc("p"), "k").limit(3)
    )
    return top.unionAll(bottom).orderBy(F.desc("p"), "k")


@query(
    "like_escape_patterns",
    oracle="""
SELECT p_partkey, p_type,
       (p_type LIKE 'PROMO%')                 AS starts_promo,
       (p_type LIKE '%DARD')                  AS ends_dard,
       (p_name LIKE '%C_L%')                  AS has_c_any_l,
       (p_name LIKE '%100\\%%' ESCAPE '\\')   AS has_percent_lit
FROM part
ORDER BY p_partkey
""",
)
def like_escape_patterns(spark, sf_dir):
    """LIKE with %/_ wildcards and ESCAPE (reference like.go:32)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", "p_type",
        F.col("p_type").like("PROMO%").alias("starts_promo"),
        F.col("p_type").like("%DARD").alias("ends_dard"),
        F.col("p_name").like("%C_L%").alias("has_c_any_l"),
        F.expr(r"p_name LIKE '%100\\%%' ESCAPE '\\'").alias("has_percent_lit"),
    ).orderBy("p_partkey")


@query(
    "in_list_large",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_hits,
       ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem
WHERE l_partkey IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47,
                    53, 59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107,
                    109, 113, 127, 131, 137, 139, 149, 151, 157, 163, 167, 173)
""",
)
def in_list_large(spark, sf_dir):
    """40-element IN-list → Catalyst OptimizeIn builds a hash InSet
    (reference applyHashIn rule, apply_hash_in.go:25)."""
    primes = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59,
              61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127,
              131, 137, 139, 149, 151, 157, 163, 167, 173]
    li = t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_partkey").isin(primes)).agg(
        F.count("*").alias("n_hits"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@query(
    "cast_matrix",
    oracle="""
SELECT o_orderkey,
       CAST(ROUND(o_totalprice) AS BIGINT)       AS to_int,
       CAST(o_orderkey AS DOUBLE)                AS to_double,
       CAST(o_orderkey AS VARCHAR)               AS to_str,
       CAST(o_orderdate AS DATE)                 AS to_date,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
       CAST(SUBSTR(CAST(o_totalprice AS VARCHAR), 1, 1) AS INTEGER) AS str_digit
FROM orders
ORDER BY o_orderkey
""",
)
def cast_matrix(spark, sf_dir):
    """CAST across the numeric/string/date matrix (reference convert.go:66).
    Note double→int truncates toward zero in both engines."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # MySQL CAST(double AS SIGNED) *rounds* (Spark's cast truncates) —
        # round explicitly for MySQL semantics, matching the oracle
        F.round("o_totalprice", 0).cast("bigint").alias("to_int"),
        F.col("o_orderkey").cast("double").alias("to_double"),
        F.col("o_orderkey").cast("string").alias("to_str"),
        F.col("o_orderdate").cast("date").alias("to_date"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("int").alias("str_digit"),
    ).orderBy("o_orderkey")
