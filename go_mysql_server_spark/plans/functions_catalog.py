"""Scalar function coverage — SURVEY.md §2.9 (~300-name registry,
reference sql/expression/function/registry.go).

Each query exercises one function category end-to-end against the oracle.
The MySQL-name → Spark-expression shim registry itself lives in
go_mysql_server_spark/functions/; these catalog entries prove the
*semantics* on real data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import t
from .registry import query


@query(
    "func_string_suite",
    oracle="""
SELECT n_nationkey,
       CONCAT(n_name, '-', CAST(n_regionkey AS VARCHAR)) AS tagged,
       LOWER(n_name)                   AS lo,
       UPPER(LOWER(n_name))            AS hi,
       CAST(LENGTH(n_name) AS INTEGER) AS len,
       SUBSTR(n_name, 1, 6)            AS pre,
       REPLACE(n_name, 'NATION', 'N')  AS repl,
       REVERSE(n_name)                 AS rev,
       LPAD(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded,
       TRIM('  ' || n_name || ' ')     AS trimmed,
       CAST(INSTR(n_name, '_') AS BIGINT) AS uspos,
       ASCII(n_name)                   AS first_byte,
       REPEAT('ab', 3)                 AS repeated,
       CAST(SPLIT_PART(n_name, '_', 2) AS INTEGER) AS suffix_num
FROM nation
ORDER BY n_nationkey
""",
)
def func_string_suite(spark, sf_dir):
    """concat/lower/upper/length/substr/replace/reverse/lpad/trim/instr/
    ascii/repeat/split — reference sql/expression/function/*.go."""
    n = t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.concat(F.col("n_name"), F.lit("-"), F.col("n_regionkey").cast("string")).alias("tagged"),
        F.lower("n_name").alias("lo"),
        F.upper(F.lower("n_name")).alias("hi"),
        F.length("n_name").alias("len"),
        F.substring("n_name", 1, 6).alias("pre"),
        F.replace(F.col("n_name"), F.lit("NATION"), F.lit("N")).alias("repl"),
        F.reverse("n_name").alias("rev"),
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("padded"),
        F.trim(F.concat(F.lit("  "), F.col("n_name"), F.lit(" "))).alias("trimmed"),
        F.instr("n_name", "_").cast("long").alias("uspos"),
        F.ascii("n_name").alias("first_byte"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.split_part(F.col("n_name"), F.lit("_"), F.lit(2)).cast("int").alias("suffix_num"),
    ).orderBy("n_nationkey")


@query(
    "func_math_suite",
    oracle="""
SELECT p_partkey,
       ABS(p_retailprice - 1000.0)            AS dist_1k,
       CAST(CEIL(p_retailprice) AS DOUBLE)    AS up,
       CAST(FLOOR(p_retailprice) AS DOUBLE)   AS down,
       ROUND(p_retailprice, 1)                AS r1,
       ROUND(SQRT(p_retailprice), 6)          AS sq,
       ROUND(POW(p_size, 2), 1)               AS size_sq,
       ROUND(EXP(p_size / 100.0), 6)          AS e_x,
       ROUND(LN(p_retailprice), 6)            AS log_e,
       ROUND(LOG10(p_retailprice), 6)         AS log_10,
       CAST(MOD(p_partkey, 7) AS BIGINT)      AS m7,
       CAST(SIGN(p_size - 25) AS DOUBLE)      AS sgn,
       GREATEST(p_size, 10)                   AS g10,
       LEAST(p_size, 10)                      AS l10,
       ROUND(RADIANS(p_size), 6)              AS rad,
       ROUND(DEGREES(p_size / 10.0), 6)       AS deg
FROM part
ORDER BY p_partkey
""",
)
def func_math_suite(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_1k"),
        F.ceil("p_retailprice").cast("double").alias("up"),
        F.floor("p_retailprice").cast("double").alias("down"),
        F.round("p_retailprice", 1).alias("r1"),
        F.round(F.sqrt("p_retailprice"), 6).alias("sq"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.round(F.exp(F.col("p_size") / 100.0), 6).alias("e_x"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("log_e"),
        F.round(F.log10("p_retailprice"), 6).alias("log_10"),
        (F.col("p_partkey") % 7).alias("m7"),
        F.signum(F.col("p_size") - 25).alias("sgn"),
        F.greatest("p_size", F.lit(10)).alias("g10"),
        F.least("p_size", F.lit(10)).alias("l10"),
        F.round(F.radians("p_size"), 6).alias("rad"),
        F.round(F.degrees(F.col("p_size") / 10.0), 6).alias("deg"),
    ).orderBy("p_partkey")


@query(
    "func_datetime_suite",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)    AS y,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER)   AS mo,
       CAST(EXTRACT(day FROM o_orderdate) AS INTEGER)     AS d,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
       CAST(EXTRACT(dayofyear FROM o_orderdate) AS INTEGER) AS doy,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)  AS month_end,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95,
       strftime(o_orderdate, '%Y-%m-%d')                  AS iso_day,
       CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP)   AS due_date,
       CAST(EXTRACT(epoch FROM o_orderdate) AS BIGINT)    AS epoch_s
FROM orders
ORDER BY o_orderkey
""",
)
def func_datetime_suite(spark, sf_dir):
    """year/month/day/quarter/dayofyear/date_trunc/last_day/datediff/
    date_format/date_add/unix_timestamp — reference date fns incl. the
    MySQL %-format language (date_format.go); the shim registry translates
    MySQL '%Y-%m-%d' → Java 'yyyy-MM-dd' (functions/datetime.py)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    ).orderBy("o_orderkey")


@query(
    "func_conditional_suite",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END                            AS size_class,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'pending')  AS status_name,
       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END  AS is_final,
       IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'LOW')  AS prio
FROM orders
ORDER BY o_orderkey
""",
)
def func_conditional_suite(spark, sf_dir):
    """CASE/IF/IFNULL/NULLIF/COALESCE (reference case.go:32, registry)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_name"
        ),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
        F.ifnull(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("LOW")).alias(
            "prio"
        ),
    ).orderBy("o_orderkey")


@query(
    "func_regexp_suite",
    oracle="""
SELECT p_partkey, p_name,
       regexp_matches(p_name, '^PROMO')                       AS is_promo_like,
       regexp_extract(p_name, '([A-Z]+)#?([0-9]*)', 1)        AS word1,
       regexp_replace(p_name, '[aeiou]', '*', 'g')            AS devoweled,
       CAST(len(regexp_extract_all(p_name, '[A-Z]+')) AS BIGINT) AS n_words
FROM part
ORDER BY p_partkey
""",
)
def func_regexp_suite(spark, sf_dir):
    """regexp_like/extract/replace/count (reference regexp_*.go; MySQL ICU
    flags reduce to these basics for the tested surface)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_name",
        F.col("p_name").rlike("^PROMO").alias("is_promo_like"),
        F.regexp_extract(F.col("p_name"), "([A-Z]+)#?([0-9]*)", 1).alias("word1"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "*").alias("devoweled"),
        F.regexp_count(F.col("p_name"), F.lit("[A-Z]+")).cast("long").alias("n_words"),
    ).orderBy("p_partkey")


@query(
    "func_json_suite",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       json_extract_string(props, '$.missing')            AS missing_val,
       CASE WHEN json_valid(props) THEN 1 ELSE 0 END      AS is_valid
FROM events
ORDER BY event_id
""",
)
def func_json_suite(spark, sf_dir):
    """JSON path extraction + validity (reference function/json/*.go —
    json_extract/json_value/json_valid). MySQL JSON stores as parsed docs;
    Spark-first design keeps JSON as strings + get_json_object (pushdown-
    friendly, no shredding shuffle)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
        F.when(F.get_json_object("props", "$").isNotNull(), 1).otherwise(0).alias("is_valid"),
    ).orderBy("event_id")


@query(
    "func_crypto_encoding_suite",
    oracle="""
SELECT n_nationkey,
       md5(n_name)                            AS h_md5,
       sha256(n_name)                         AS h_sha256,
       to_base64(encode(n_name))              AS b64,
       hex(encode(n_name))                    AS hexed,
       CAST(octet_length(encode(n_name)) AS INTEGER) AS n_bytes
FROM nation
ORDER BY n_nationkey
""",
)
def func_crypto_encoding_suite(spark, sf_dir):
    """md5/sha2/base64/hex (reference registry: md5 sha1 sha2 to_base64
    from_base64 hex unhex)."""
    n = t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5("n_name").alias("h_md5"),
        F.sha2(F.col("n_name"), 256).alias("h_sha256"),
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.hex(F.col("n_name").cast("binary")).alias("hexed"),
        F.octet_length("n_name").alias("n_bytes"),
    ).orderBy("n_nationkey")


@query(
    "func_vector_distances",
    oracle="""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_dot_product(e.embedding::DOUBLE[], q.qvec), 6) AS dot_q0,
       ROUND(list_distance(e.embedding::DOUBLE[], q.qvec) ^ 2, 4) AS l2sq_q0,
       ROUND(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qvec), 6) AS cos_dist_q0
FROM embeddings e, q
WHERE e.vec_id < 50
ORDER BY e.vec_id
""",
)
def func_vector_distances(spark, sf_dir):
    """vec_distance_{l2_squared,euclidean,cosine} (reference
    function/vector/distance.go:62-145) over array<float> columns."""
    from ..operators.similarity import cosine, dot, l2_squared

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return (
        emb.filter(F.col("vec_id") < 50)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot(F.col("embedding"), F.col("qvec")), 6).alias("dot_q0"),
            F.round(l2_squared(F.col("embedding"), F.col("qvec")), 4).alias("l2sq_q0"),
            F.round(1 - cosine(F.col("embedding"), F.col("qvec")), 6).alias("cos_dist_q0"),
        )
        .orderBy("vec_id")
    )
