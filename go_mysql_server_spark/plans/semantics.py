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


@query(
    "type_unsigned_cast",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(CASE WHEN 0 - o_orderkey < 0
                 THEN 18446744073709551616 + (0 - o_orderkey)
                 ELSE 0 - o_orderkey END AS DECIMAL(20,0)) AS VARCHAR) AS neg_as_unsigned,
       CAST(CAST(o_orderkey AS DECIMAL(20,0)) AS VARCHAR) AS pos_as_unsigned
FROM orders
ORDER BY o_orderkey LIMIT 50
""",
)
def type_unsigned_cast(spark, sf_dir):
    """MySQL CAST(negative AS UNSIGNED) wraps modulo 2^64 (reference
    sql/types/number.go:40-94); strict-mode *storage* of the same value
    errors — that half is covered by the engine out-of-range scripts."""
    o = t(spark, sf_dir, "orders")
    neg = F.lit(0) - F.col("o_orderkey")
    two64 = F.expr("CAST(18446744073709551616 AS DECIMAL(21,0))")
    wrapped = F.when(neg < 0, two64 + neg).otherwise(neg).cast("decimal(20,0)")
    # Emit as STRING: Decimal cells survive the driver's pandas round-trip
    # differently per engine (object[Decimal] vs float64, which can't even
    # hold 2^64 exactly) — the string form is lossless and hash-stable.
    return o.select(
        "o_orderkey",
        wrapped.cast("string").alias("neg_as_unsigned"),
        F.col("o_orderkey").cast("decimal(20,0)").cast("string").alias("pos_as_unsigned"),
    ).orderBy("o_orderkey").limit(50)


@query(
    "type_enum_ordinal_sort",
    oracle="""
WITH e AS (
  SELECT o_orderkey, o_orderpriority,
         CASE o_orderpriority
           WHEN '1-URGENT' THEN 5 WHEN '2-HIGH' THEN 4 WHEN '3-MEDIUM' THEN 3
           WHEN '4-NOT SPECIFIED' THEN 2 ELSE 1 END AS ord
  FROM orders
)
SELECT o_orderkey, o_orderpriority FROM e
ORDER BY ord, o_orderkey LIMIT 100
""",
)
def type_enum_ordinal_sort(spark, sf_dir):
    """ENUM sorts by declaration ordinal, not string (reference
    sql/types/enum.go:52). Declaration order here is LOW..URGENT, so the
    string sort and the ordinal sort disagree — the oracle encodes the
    ordinal semantics."""
    o = t(spark, sf_dir, "orders")
    vals = ["5-LOW", "4-NOT SPECIFIED", "3-MEDIUM", "2-HIGH", "1-URGENT"]
    ordinal = F.array_position(
        F.array(*[F.lit(v) for v in vals]), F.col("o_orderpriority"))
    return (
        o.select("o_orderkey", "o_orderpriority", ordinal.alias("_ord"))
        .orderBy("_ord", "o_orderkey")
        .select("o_orderkey", "o_orderpriority")
        .limit(100)
    )


@query(
    "type_decimal_div_scale",
    # Spark's decimal division rounds HALF_UP at the result scale; DuckDB's
    # goes through DOUBLE (half-even ties). The oracle reproduces MySQL/Spark
    # exact-rational HALF_UP via integer arithmetic: cents*10^6 / (qty*100)
    # rounded half-up = (2*num + den) // (2*den).
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(
         ((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 1000000 * 2
           + CAST(l_quantity AS BIGINT) * 100)
          // (CAST(l_quantity AS BIGINT) * 100 * 2))
         / 1000000.0 AS DECIMAL(26,6)) AS VARCHAR) AS unit_price
FROM lineitem
ORDER BY l_orderkey, l_linenumber LIMIT 100
""",
)
def type_decimal_div_scale(spark, sf_dir):
    """MySQL decimal division result scale = dividend scale +
    div_precision_increment (4) → DECIMAL(.., 2+4=6) (reference
    sql/expression/div.go:46). Both sides cast to the exact MySQL result
    type so the hash compares the full-scale decimal."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            (F.col("l_extendedprice").cast("decimal(15,2)")
             / F.col("l_quantity").cast("decimal(15,2)"))
            .cast("decimal(26,6)").cast("string").alias("unit_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )
