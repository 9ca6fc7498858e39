#!/usr/bin/env python
"""Generate sf1 testdata (10x the driver's sf0.1) for scale-proofing.

The driver's testdata is read-only and capped at sf0.1; SCALE.md's
super-linearity audit needs one decade more. This reproduces the same
schemas and value domains (TESTDATA.md; verified against sf0.1 with
DuckDB DESCRIBE/DISTINCT sweeps) with hash-based deterministic columns —
no RNG state, so any slice regenerates identically.

Output: /root/repo/testdata_sf1/*.parquet  (gitignored — ~350 MB)
Usage:  python scripts/gen_sf1.py [scale]   # default 10 (=sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "testdata_sf1")

N_CUST = 15_000 * SCALE
N_SUPP = 1_000 * SCALE
N_PART = 20_000 * SCALE
N_ORDERS = 150_000 * SCALE
N_EVENTS = 100_000 * SCALE
N_DOCS = 5_000 * SCALE
N_VECS = 2_000 * SCALE

con = duckdb.connect()
con.execute(f"PRAGMA threads={os.cpu_count() or 8}")
os.makedirs(OUT, exist_ok=True)


def write(name: str, sql: str) -> None:
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


# h(i, salt): deterministic uniform in [0, m)
H = "(hash({i} * 2654435761 + {s}) % {m})"


def h(i: str, s: int, m: int) -> str:
    return H.format(i=i, s=s, m=m)


write("region", """
SELECT * FROM (VALUES (0, 'AFRICA'), (1, 'AMERICA'), (2, 'ASIA'),
                      (3, 'EUROPE'), (4, 'MIDDLE EAST'))
    t(r_regionkey, r_name)
""")

write("nation", """
SELECT CAST(i AS INTEGER) AS n_nationkey,
       'NATION_' || i AS n_name,
       CAST(i % 5 AS INTEGER) AS n_regionkey
FROM range(25) t(i)
""")

write("customer", f"""
SELECT i AS c_custkey,
       'Customer#' || lpad(CAST(i AS VARCHAR), 9, '0') AS c_name,
       CAST({h('i', 1, 25)} AS INTEGER) AS c_nationkey,
       ROUND(-999.99 + {h('i', 2, 1100000)} / 100.0, 2) AS c_acctbal,
       ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD',
        'MACHINERY'][CAST({h('i', 3, 5)} AS INTEGER) + 1] AS c_mktsegment
FROM range({N_CUST}) t(i)
""")

write("supplier", f"""
SELECT i AS s_suppkey,
       'Supplier#' || lpad(CAST(i AS VARCHAR), 9, '0') AS s_name,
       CAST({h('i', 4, 25)} AS INTEGER) AS s_nationkey,
       ROUND(-999.99 + {h('i', 5, 1100000)} / 100.0, 2) AS s_acctbal
FROM range({N_SUPP}) t(i)
""")

write("part", f"""
SELECT i AS p_partkey,
       ['small', 'large', 'hot', 'cold', 'old', 'new', 'blue',
        'red'][CAST({h('i', 6, 8)} AS INTEGER) + 1] || ' ' ||
       ['ring', 'bolt', 'plate', 'screw', 'gear',
        'pin'][CAST({h('i', 7, 6)} AS INTEGER) + 1] AS p_name,
       'Brand#' || (1 + {h('i', 8, 25)}) AS p_brand,
       ['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL',
        'STANDARD'][CAST({h('i', 9, 6)} AS INTEGER) + 1] AS p_type,
       CAST(1 + {h('i', 10, 50)} AS INTEGER) AS p_size,
       ROUND(100.0 + {h('i', 11, 190000)} / 100.0, 2) AS p_retailprice
FROM range({N_PART}) t(i)
""")

write("orders", f"""
SELECT i AS o_orderkey,
       {h('i', 12, N_CUST)} AS o_custkey,
       ['O', 'F', 'P'][CASE WHEN {h('i', 13, 100)} < 48 THEN 1
                            WHEN {h('i', 13, 100)} < 97 THEN 2
                            ELSE 3 END] AS o_orderstatus,
       ROUND(1000.0 + {h('i', 14, 45000000)} / 100.0, 2) AS o_totalprice,
       TIMESTAMP '1995-01-01' + INTERVAL (CAST({h('i', 15, 2404)} AS INTEGER))
           DAY AS o_orderdate,
       ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED',
        '5-LOW'][CAST({h('i', 16, 5)} AS INTEGER) + 1] AS o_orderpriority
FROM range({N_ORDERS}) t(i)
""")

# ~4 lines per order (1..7): 6M at scale 10, same as dbgen sf1
write("lineitem", f"""
WITH o AS (SELECT i AS ok, {h('i', 15, 2404)} AS odate_off,
                  1 + {h('i', 17, 7)} AS nlines
           FROM range({N_ORDERS}) t(i)),
l AS (SELECT ok, odate_off, ln
      FROM o, LATERAL (SELECT unnest(range(1, CAST(nlines AS INTEGER) + 1))
                       AS ln))
SELECT ok AS l_orderkey,
       {h('(ok * 8 + ln)', 18, N_PART)} AS l_partkey,
       {h('(ok * 8 + ln)', 19, N_SUPP)} AS l_suppkey,
       CAST(ln AS INTEGER) AS l_linenumber,
       ROUND(1.0 + {h('(ok * 8 + ln)', 20, 50)}, 2) AS l_quantity,
       ROUND(900.0 + {h('(ok * 8 + ln)', 21, 9500000)} / 100.0, 2)
           AS l_extendedprice,
       ROUND({h('(ok * 8 + ln)', 22, 11)} / 100.0, 2) AS l_discount,
       ROUND({h('(ok * 8 + ln)', 23, 9)} / 100.0, 2) AS l_tax,
       ['A', 'N', 'R'][CAST({h('(ok * 8 + ln)', 24, 3)} AS INTEGER) + 1]
           AS l_returnflag,
       ['O', 'F'][CAST({h('(ok * 8 + ln)', 25, 2)} AS INTEGER) + 1]
           AS l_linestatus,
       TIMESTAMP '1995-01-01'
           + INTERVAL (CAST(odate_off AS INTEGER)) DAY
           + INTERVAL (CAST(1 + {h('(ok * 8 + ln)', 26, 120)} AS INTEGER))
               DAY AS l_shipdate
FROM l
""")

write("events", f"""
SELECT i AS event_id,
       TIMESTAMP '2024-01-01'
           + INTERVAL (CAST(i * ({30 * 86400000} / {N_EVENTS}) AS BIGINT)
                       + CAST({h('i', 27, 2000)} AS INTEGER))
               MILLISECOND AS ts,
       {h('i', 28, 15 * N_EVENTS // 100)} AS user_id,
       ['view', 'click', 'purchase', 'signup',
        'error'][CASE WHEN {h('i', 29, 100)} < 45 THEN 1
                      WHEN {h('i', 29, 100)} < 75 THEN 2
                      WHEN {h('i', 29, 100)} < 85 THEN 3
                      WHEN {h('i', 29, 100)} < 93 THEN 4
                      ELSE 5 END] AS event_type,
       ROUND({h('i', 30, 56021)} / 100.0, 2) AS value,
       '{{"k": ' || {h('i', 31, 100)} || '}}' AS props
FROM range({N_EVENTS}) t(i)
""")

# documents: same 31-word vocabulary as sf0.1; ~1.6/1000 exact duplicates
# (shared seed) so dedup operators have work to do at every scale
_VOCAB = ("['batch','part','spark','line','column','order','small','sort',"
          "'fast','value','scan','a','hash','slow','group','agg','filter',"
          "'query','big','key','window','row','table','stream','merge',"
          "'data','join','plan','page','disk','cache']")
write("documents", f"""
WITH d AS (
  SELECT i,
         CASE WHEN {h('i', 32, 625)} < 1 THEN 42 ELSE i END AS seed,
         40 + {h('i', 33, 21)} AS nwords
  FROM range({N_DOCS}) t(i)
),
txt AS (
  SELECT i,
         list_aggregate(
           list_transform(range(1, CAST(nwords AS INTEGER) + 1),
             w -> {_VOCAB}[CAST(hash(seed * 31 + w * 2654435761) % 31
                                AS INTEGER) + 1]),
           'string_agg', ' ') AS text
  FROM d
)
SELECT i AS doc_id, text,
       ['en', 'en', 'zh', 'es', 'fr', 'de',
        'en'][CAST({h('i', 34, 7)} AS INTEGER) + 1] AS lang,
       'src' || {h('i', 35, 20)} AS source,
       length(text) AS n_chars
FROM txt
""")

# embeddings: 64-dim float vectors in 10 label-centered clusters (kmeans /
# IVF / ANN operators need cluster structure, not white noise)
write("embeddings", f"""
WITH v AS (SELECT i, CAST({h('i', 36, 10)} AS INTEGER) AS label
           FROM range({N_VECS}) t(i))
SELECT i AS vec_id,
       list_transform(range(64),
         d -> CAST(
             sin(label * 37 + d * 13) +
             (CAST(hash(i * 64 + d) % 1000 AS DOUBLE) / 1000.0 - 0.5) * 0.6
             AS FLOAT)) AS embedding,
       label
FROM v
""")

print("done ->", OUT)
