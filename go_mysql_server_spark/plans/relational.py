"""Core relational operators from SURVEY.md §2.1-2.3, §2.6-2.7.

One registry entry per operator family the reference executes:
scans/values (reference sql/plan/values.go, resolved_table.go), projections/
filters (project.go, filter.go), every join type (join.go:27-69 — inner/
left/right/full/cross/semi/anti/theta/band/lateral), set operations
(set_op.go:26-60), distinct (distinct.go), sort/limit/offset/top-k
(sort.go, limit.go, topn.go), having (having.go), group_concat
(group_concat.go).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import revenue, t
from .registry import query

# --- scans / projections / filters -----------------------------------------


@query(
    "scan_project_filter",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity > 45
ORDER BY l_orderkey, l_linenumber
""",
)
def scan_project_filter(spark, sf_dir):
    """Leaf scan + Project + Filter; both predicates and the 5-column read
    schema push into the parquet scan (reference FilteredTable/ProjectedTable,
    sql/tables.go:105-134)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(revenue(), 4).alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "values_relation",
    oracle="""
SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS v(id, name)
ORDER BY id
""",
)
def values_relation(spark, sf_dir):
    """Literal VALUES rows as a relation (reference sql/plan/values.go)."""
    return spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "id int, name string"
    ).orderBy("id")


@query("count_star_meta", oracle="SELECT COUNT(*) AS cnt FROM lineitem")
def count_star_meta(spark, sf_dir):
    """Bare COUNT(*) — reference answers from table metadata
    (TableCountLookup, sql/plan/table_count.go:1-79); Spark answers from
    parquet footer row counts without reading data columns."""
    return t(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


# --- joins ------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
SELECT o_orderkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
ORDER BY o_orderkey
""",
)
def join_inner(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "join_left_outer",
    oracle="""
SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
)
def join_left_outer(spark, sf_dir):
    """Left outer with null-padding, then count ignoring padded NULLs."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "join_right_outer",
    oracle="""
SELECT n_name, CAST(COUNT(s_suppkey) AS BIGINT) AS n_suppliers
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
)
def join_right_outer(spark, sf_dir):
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
        .orderBy("n_name")
    )


@query(
    "join_full_outer",
    oracle="""
SELECT COALESCE(b.ck, s.ck) AS custkey, b.n_building, s.n_urgent
FROM (SELECT c_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_building
      FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_custkey) b
FULL OUTER JOIN
     (SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) s
ON b.ck = s.ck
ORDER BY custkey
""",
)
def join_full_outer(spark, sf_dir):
    """Full outer join (reference fullJoinIter, join_iters.go:470-582)."""
    b = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_custkey").alias("bck"))
        .agg(F.count("*").alias("n_building"))
    )
    s = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("sck"))
        .agg(F.count("*").alias("n_urgent"))
    )
    return (
        b.join(s, b.bck == s.sck, "full_outer")
        .select(
            F.coalesce("bck", "sck").alias("custkey"),
            "n_building",
            "n_urgent",
        )
        .orderBy("custkey")
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
""",
)
def join_semi(spark, sf_dir):
    """IN-subquery → left-semi join (reference unnest_in_subqueries.go:42)."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
ORDER BY c_custkey
""",
)
def join_anti(spark, sf_dir):
    """NOT EXISTS → left-anti join (reference existsIter + anti types).
    The orders side is restricted to big-ticket orders so the anti-join is
    non-vacuous at every sf (in this testdata every customer has at least
    one order, so the unrestricted form returned zero rows — r6 verdict)."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
ORDER BY r_name, n_name
""",
)
def join_cross(spark, sf_dir):
    """Cartesian product (reference crossJoinIterator, join_iters.go:583)."""
    return (
        t(spark, sf_dir, "region")
        .crossJoin(t(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@query(
    "join_theta_inequality",
    oracle="""
SELECT s1.s_suppkey AS suppkey, CAST(COUNT(s2.s_suppkey) AS BIGINT) AS n_richer
FROM supplier s1 LEFT JOIN supplier s2 ON s2.s_acctbal > s1.s_acctbal
GROUP BY s1.s_suppkey
ORDER BY s1.s_suppkey
""",
)
def join_theta_inequality(spark, sf_dir):
    """Non-equi (theta) self-join — reference nested-loop joinIter
    (join_iters.go:300); Spark executes as broadcast-nested-loop. Kept on a
    dimension table: O(n²) on a fact table would not survive scale."""
    s1 = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), F.col("s_acctbal").alias("bal1")
    )
    s2 = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k2"), F.col("s_acctbal").alias("bal2")
    )
    return (
        s1.join(F.broadcast(s2), F.col("bal2") > F.col("bal1"), "left")
        .groupBy("suppkey")
        .agg(F.count("k2").alias("n_richer"))
        .orderBy("suppkey")
    )


@query(
    "join_range_band",
    oracle="""
WITH bands(lo, hi, band) AS (
  VALUES (0.0, 10.0, 'small'), (10.0, 25.0, 'medium'), (25.0, 51.0, 'large'))
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l_extendedprice), 2) AS total_price
FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
GROUP BY band
ORDER BY band
""",
)
def join_range_band(spark, sf_dir):
    """Band/interval join (reference RangeHeap join, sql/plan/range_heap.go:24).

    The bands side is tiny → broadcast, so the fact table never shuffles and
    the predicate evaluates stream-side: the scalable plan for value∈range
    classification at 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(0.0, 10.0, "small"), (10.0, 25.0, "medium"), (25.0, 51.0, "large")],
        "lo double, hi double, band string",
    )
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("band")
    )


@query(
    "join_lateral",
    oracle="""
SELECT c_custkey, best.o_orderkey, best.o_totalprice
FROM customer,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) best
ORDER BY c_custkey
""",
)
def join_lateral(spark, sf_dir):
    """Lateral join — per-outer-row subquery (reference lateralJoinIterator,
    join_iters.go:650). Spark SQL 3.4+ supports LATERAL natively; Catalyst
    decorrelates it to a window/aggregate plan instead of re-executing the
    inner per row — the scalable form."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, best.o_orderkey, best.o_totalprice
        FROM v_customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM v_orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) best
        ORDER BY c_custkey
        """
    )


@query(
    "join_using_natural",
    oracle="""
SELECT n_nationkey, n_name, r_name
FROM (SELECT n_nationkey, n_name, n_regionkey AS r_regionkey FROM nation) n
JOIN region USING (r_regionkey)
ORDER BY n_nationkey
""",
)
def join_using_natural(spark, sf_dir):
    """USING-style join on a shared column name (reference resolves USING to
    inner join + projection during binding, sql/planbuilder/from.go)."""
    nation = t(spark, sf_dir, "nation").withColumnRenamed("n_regionkey", "r_regionkey")
    region = t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), on="r_regionkey")
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    )


# oracle uses USING against the real column names; Spark side renames first,
# so give the oracle the same rename via a subquery
_ = None


# --- set operations ----------------------------------------------------------


@query(
    "setop_union_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 0
ORDER BY nationkey
""",
)
def setop_union_all(spark, sf_dir):
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    b = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return a.unionAll(b).orderBy("nationkey")


@query(
    "setop_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)
def setop_union_distinct(spark, sf_dir):
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    b = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.union(b).distinct().orderBy("nationkey")


@query(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)
def setop_intersect(spark, sf_dir):
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    b = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b).orderBy("nationkey")


@query(
    "setop_except",
    oracle="""
SELECT n_nationkey AS nationkey FROM nation
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_suppkey <= 20
ORDER BY nationkey
""",
)
def setop_except(spark, sf_dir):
    # the subtracted side is the nations of the first 20 suppliers — at
    # most 20 of 25 nations, so the difference is non-vacuous at every sf
    # (unrestricted, suppliers cover all nations → zero rows, r6 verdict)
    a = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    b = (t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 20)
         .select(F.col("s_nationkey").alias("nationkey")))
    return a.subtract(b).orderBy("nationkey")  # EXCEPT DISTINCT semantics


# --- distinct / sort / limit / offset ----------------------------------------


@query(
    "distinct_multi_col",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
""",
)
def distinct_multi_col(spark, sf_dir):
    """Hash dedup over full rows (reference DistinctIter, distinct.go:1-189).
    Spark: partial dedup map-side, then exchange on the dedup key."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "sort_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
""",
)
def sort_limit_offset(spark, sf_dir):
    """Sort + Limit + Offset (reference sort.go, limit.go:1-96, offset.go).
    Catalyst turns orderBy().offset().limit() into a single TakeOrdered."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(10)
        .limit(20)
    )


@query(
    "topk_heap",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 5
""",
)
def topk_heap(spark, sf_dir):
    """Top-k — reference bounded heap (topn.go:26, rows_heap.go:64); Spark
    TakeOrderedAndProject: per-partition heaps + driver merge, no full sort."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(5)
    )


@query(
    "having_filter",
    oracle="""
SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust
FROM customer
GROUP BY c_nationkey
HAVING COUNT(*) > 50
ORDER BY nationkey
""",
)
def having_filter(spark, sf_dir):
    """HAVING = filter over aggregate output (reference having.go:1-83)."""
    return (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
        .filter(F.col("n_cust") > 50)
        .orderBy("nationkey")
    )


@query(
    "group_concat_ordered",
    oracle="""
SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
)
def group_concat_ordered(spark, sf_dir):
    """GROUP_CONCAT(... ORDER BY ... SEPARATOR ',') — reference
    group_concat.go:1. Spark: collect_list → array_sort → array_join;
    the explicit sort makes the result order deterministic, which MySQL's
    ORDER BY clause inside GROUP_CONCAT also guarantees."""
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("r_name")
    )


@query(
    "not_in_null_semantics",
    oracle="""
SELECT 'with_null' AS variant, x
FROM (VALUES (1), (2), (3), (4)) AS t(x)
WHERE x NOT IN (SELECT y FROM (VALUES (2), (NULL)) AS s(y))
UNION ALL
SELECT 'no_null' AS variant, x
FROM (VALUES (1), (2), (3), (4)) AS t(x)
WHERE x NOT IN (SELECT y FROM (VALUES (2), (NULL)) AS s(y)
                WHERE y IS NOT NULL)
ORDER BY variant, x
""",
)
def not_in_null_semantics(spark, sf_dir):
    """NOT IN with NULLs in the subquery → empty result (three-valued logic).

    The reference models this as a dedicated join type
    (JoinTypeAntiIncludeNulls, join.go:36,53,56); Spark's NOT IN implements
    the same null-aware anti-join. Expressed through SQL so Catalyst plans
    the null-aware anti join rather than a plain left_anti.

    Two arms so the entry is non-vacuous (r6 verdict: a single empty
    result proves nothing): the `with_null` arm must contribute ZERO rows
    (a row leaking in flips the hash) while the `no_null` arm contributes
    {1,3,4} under ordinary anti-join semantics."""
    spark.createDataFrame([(1,), (2,), (3,), (4,)], "x int").createOrReplaceTempView(
        "v_notin_t"
    )
    spark.createDataFrame([(2,), (None,)], "y int").createOrReplaceTempView(
        "v_notin_s"
    )
    return spark.sql(
        """
        SELECT 'with_null' AS variant, x FROM v_notin_t
        WHERE x NOT IN (SELECT y FROM v_notin_s)
        UNION ALL
        SELECT 'no_null' AS variant, x FROM v_notin_t
        WHERE x NOT IN (SELECT y FROM v_notin_s WHERE y IS NOT NULL)
        ORDER BY variant, x
        """
    )


@query(
    "collation_ci_compare",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_ci_match
FROM customer
WHERE lower(c_mktsegment) = lower('Building')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def collation_ci_compare(spark, sf_dir):
    """Case-insensitive collation compare (MySQL default utf8mb4_0900_ai_ci;
    reference sql/collations.go). Spark compares binary; the shim is a
    lower() fold on both operands — pushdown-safe and the documented
    approach in SURVEY §1.4 for ci collations."""
    cust = t(spark, sf_dir, "customer")
    return (
        cust.filter(F.lower(F.col("c_mktsegment")) == F.lower(F.lit("Building")))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_ci_match"))
        .orderBy("c_mktsegment")
    )


@query(
    "null_safe_equality",
    oracle="""
SELECT a IS NOT DISTINCT FROM b AS nse, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT NULLIF(o_orderstatus, 'P') AS a, NULLIF(o_orderpriority, '5-LOW') AS b
      FROM orders) x
GROUP BY a IS NOT DISTINCT FROM b
ORDER BY nse
""",
)
def null_safe_equality(spark, sf_dir):
    """MySQL <=> (reference comparison.go NullSafeEquals) → eqNullSafe."""
    orders = t(spark, sf_dir, "orders")
    x = orders.select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("a"),
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("b"),
    )
    return (
        x.groupBy(F.col("a").eqNullSafe(F.col("b")).alias("nse"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("nse")
    )
