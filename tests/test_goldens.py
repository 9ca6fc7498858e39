"""Reference golden-corpus sweep (enginetest/queries/queries.go) with a
DuckDB-computed oracle.

Two sweeps over the reference's own Query strings:
- pure-literal queries (no FROM) — dialect arithmetic/functions/typing
- table-backed queries over the canonical fixtures (FIXTURES.md §B:
  mytable, othertable, niltable, floattable, tabletest, emptytable)

Every candidate DuckDB can also run is compared value-only (column names
are engine-generated for unaliased expressions and differ legitimately).
A floor asserts the pass rate can't regress; the known-divergence lists
pin each residual to a documented cause — a NEW mismatch fails the test
even if the floor still holds.

This mirrors the reference's own test strategy (the golden corpus of
enginetest/queries/queries.go:42) with a computed oracle instead of
checked-in rows.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from .harness import _cells_equal, canonicalize

REF_QUERIES = Path("/root/reference/enginetest/queries/queries.go")

# documented residual divergences; see SCALE.md "Known scale caveats"
KNOWN_DIVERGENT = (
    "coalesce(1, '",        # MySQL result-type VARCHAR: ours matches MySQL,
                            # DuckDB returns the numeric — oracle noise
    "/ 3.0",                # decimal division scale (Spark arithmetic)
    "5.2/3.1",
    "(24250 / 9432456)",
    "0x12345",              # DuckDB lacks 0x literals — ours is MySQL's
    "as char(10))",         # DuckDB X'' formatting noise
    "as binary)",
    "BINARY 'hi'",          # DuckDB type-kind noise; value matches
    "JSON_CONTAINS('1', '1')",   # MySQL returns 1; DuckDB boolean
    "json_contains(cast('[1, 2]'",
    "json_type('429496",    # DuckDB's UBIGINT naming
    "json_type(cast(",      # DuckDB VARCHAR naming
    "809826404100301269648758758005707100",  # DECIMAL vs int kind noise
    "cast(true as json) = 1",   # JSON bool vs number compare (documented)
    "cast(true as json) = 0",
    "cast(false as json) = 1",
    "cast(false as json) = 0",
    "cast(cast(true as json) as signed)",
    "cast(cast(false as json) as signed)",
    "IN (SELECT",           # IN-subquery NULL edges (documented)
    "X'0a'",                # binary literal kind noise (ours is MySQL's)
    "35600.00",             # decimal multiply/divide scale (documented)
    "json_type(json_extract",   # DuckDB UBIGINT/VARCHAR type names
    "JSON_OBJECT(true",     # MySQL bool key = '1' (ours); DuckDB 'true'
    "floor(i)",             # MySQL FLOOR(int)→int; DuckDB → double
    "ceil(i + 0.5)",
    "floor(i + 0.5)",
    "GREATEST(CAST(",       # MySQL NULL-propagating GREATEST; DuckDB skips
    "LIKE '%D ROW'",        # MySQL ci LIKE; DuckDB cs — ours matches MySQL
    'JSON_OBJECT("i"',      # MySQL: "i" is a string key; DuckDB identifier
    "lag(i) over",          # float repr edge in a lag window
)

_SKIP_FNS = ("RAND", "NOW(", "CURDATE", "CURRENT_", "SLEEP", "UUID",
             "CONNECTION_ID", "USER(", "DATABASE(", "VERSION(",
             "LAST_INSERT", "SYSDATE", "CURTIME", "UTC_", "GET_LOCK",
             "RELEASE_LOCK", "@", "FOUND_ROWS", "ROW_COUNT", "SCHEMA(",
             "INFORMATION_SCHEMA", "DUAL")

FIXTURES = {
    "mytable": (
        "CREATE TABLE mytable (i BIGINT PRIMARY KEY, s VARCHAR(20) NOT NULL)",
        "INSERT INTO mytable VALUES (1,'first row'),(2,'second row'),"
        "(3,'third row')"),
    "othertable": (
        "CREATE TABLE othertable (s2 VARCHAR(20) NOT NULL, "
        "i2 BIGINT PRIMARY KEY)",
        "INSERT INTO othertable VALUES ('first',3),('second',2),('third',1)"),
    "niltable": (
        "CREATE TABLE niltable (i BIGINT PRIMARY KEY, i2 BIGINT, b TINYINT, "
        "f DOUBLE)",
        "INSERT INTO niltable VALUES (1,NULL,NULL,NULL),(2,2,1,NULL),"
        "(3,NULL,0,NULL),(4,4,NULL,4.0),(5,NULL,1,5.0),(6,6,0,6.0)"),
    "floattable": (
        "CREATE TABLE floattable (i BIGINT PRIMARY KEY, f32 FLOAT NOT NULL, "
        "f64 DOUBLE NOT NULL)",
        "INSERT INTO floattable VALUES (1,1.0,1.0),(2,1.5,1.5),(3,2.0,2.0),"
        "(4,2.5,2.5),(-1,-1.0,-1.0),(-2,-1.5,-1.5)"),
    "tabletest": (
        "CREATE TABLE tabletest (i BIGINT PRIMARY KEY, s VARCHAR(40) NOT NULL)",
        "INSERT INTO tabletest VALUES (1,'first row'),(2,'second row'),"
        "(3,'third row')"),
    "emptytable": (
        "CREATE TABLE emptytable (i BIGINT PRIMARY KEY, s VARCHAR(20))",
        None),
    # reference setup_data.sg.go:2993 — function_queries.go JSON goldens
    "jsontable": (
        "CREATE TABLE jsontable (pk SMALLINT PRIMARY KEY, c1 VARCHAR(20),"
        " c2 JSON, c3 JSON)",
        "INSERT INTO jsontable VALUES "
        "(1, 'row one', '[1,2]', '{\"a\": 2}'),"
        "(2, 'row two', '[3,4]', '{\"b\": 2}'),"
        "(3, 'row three', '[5,6]', '{\"c\": 2}'),"
        "(4, 'row four', '[7,8]', '{\"d\": 2}')"),
    # reference setup_data.sg.go:141 — exercised heavily by
    # function_queries.go date/time goldens
    "datetime_table": (
        "CREATE TABLE datetime_table (i BIGINT PRIMARY KEY, date_col DATE,"
        " datetime_col DATETIME, timestamp_col TIMESTAMP,"
        " time_col TIME)",  # TIME(6) would break the DuckDB twin
        "INSERT INTO datetime_table VALUES "
        "(1, '2019-12-31', '2020-01-01 12:00:00', '2020-01-02 12:00:00',"
        " '03:10:00'),"
        "(2, '2020-01-03', '2020-01-04 12:00:00', '2020-01-05 12:00:00',"
        " '04:00:44'),"
        "(3, '2020-01-07', '2020-01-07 12:00:00', '2020-01-07 12:00:01',"
        " '15:00:00.005000')"),
}


def _candidates(table_backed: bool, src_path: Path = REF_QUERIES,
                fixtures: dict | None = None) -> list[str]:
    fixtures = FIXTURES if fixtures is None else fixtures
    src = src_path.read_text(errors="replace")
    raw = re.findall(r'Query:\s+"((?:[^"\\]|\\.)*)"', src)
    raw += re.findall(r"Query:\s+`([^`]*)`", src)
    out, seen = [], set()
    for q in raw:
        try:
            t = q.encode().decode("unicode_escape").strip().rstrip(";")
        except UnicodeDecodeError:
            continue
        up = t.upper()
        if not up.startswith(("SELECT", "WITH")):
            continue
        tbls = {w.lower() for w in re.findall(
            r"\b(?:FROM|JOIN)\s+`?(\w+)`?", t, re.I)}
        if table_backed:
            if not tbls or not tbls <= set(fixtures):
                continue
        elif re.search(r"\bFROM\b", up):
            continue
        if any(k in up for k in _SKIP_FNS):
            continue
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def _sweep(spark, table_backed: bool, src_path: Path = REF_QUERIES,
           fixtures: dict | None = None):
    import duckdb

    from go_mysql_server_spark.engine import Engine

    fixtures = FIXTURES if fixtures is None else fixtures
    eng = Engine(spark)
    con = duckdb.connect()
    if table_backed:
        for ddl, ins in fixtures.values():
            eng.query(ddl)
            con.execute(ddl)
            if ins:
                eng.query(ins)
                con.execute(ins)
    ok, mismatches, engerrs = 0, [], []
    for t in _candidates(table_backed, src_path, fixtures):
        try:
            drows = con.sql(t).fetchall()
        except Exception:
            continue  # DuckDB can't be the oracle for this text
        known = any(k in t for k in KNOWN_DIVERGENT)
        try:
            df = eng.query(t)
            srows = [tuple(r) for r in df.collect()]
            _, sc = canonicalize(
                [str(i) for i in range(len(df.columns))], srows)
            _, dc = canonicalize(
                [str(i) for i in range(len(drows[0]) if drows else 0)], drows)
            same = len(sc) == len(dc) and all(
                len(a) == len(b) and all(
                    _cells_equal(x, y) for x, y in zip(a, b))
                for a, b in zip(sc, dc))
            if same:
                ok += 1
            elif not known:
                mismatches.append(t)
        except Exception:
            if not known:
                engerrs.append(t)
    return ok, mismatches, engerrs


@pytest.mark.skipif(not REF_QUERIES.exists(), reason="reference not present")
def test_golden_literal_sweep(spark):
    ok, mismatches, engerrs = _sweep(spark, table_backed=False)
    # r4 baseline: 168 passing; floor leaves headroom for DuckDB drift
    assert ok >= 160, f"literal golden pass count regressed: {ok}"
    # engine-error residuals, each matching MySQL's own error or a
    # documented cap: >38-digit decimals, boolean-in-int IN lists,
    # duplicate-alias HAVING, TIME type
    new = mismatches + [e for e in engerrs if not any(
        k in e for k in ("122.223", "809826404", "NULL >= 1",
                         "NULL NOT BETWEEN", "as time)", "col2",
                         "as json)"))]
    assert not new, f"NEW golden divergences: {new[:5]}"


@pytest.mark.skipif(not REF_QUERIES.exists(), reason="reference not present")
def test_golden_table_sweep(spark):
    ok, mismatches, engerrs = _sweep(spark, table_backed=True)
    # r4 baseline: 327 passing
    assert ok >= 315, f"table golden pass count regressed: {ok}"
    new = mismatches + [e for e in engerrs if not any(
        k in e for k in ("NULL >= 1", "NULL NOT BETWEEN", "i = 0 or i = 2",
                         "mt (a)", "cte(i, j)", "mt2.i",
                         "join mytable b"))]
    assert not new, f"NEW golden divergences: {new[:5]}"


# ---- r5 widening: join corpus + null-range + column-alias corpora ----------

REF_JOINS = REF_QUERIES.parent / "join_queries.go"
REF_NULL_RANGES = REF_QUERIES.parent / "null_range_tests.go"
REF_COL_ALIAS = REF_QUERIES.parent / "column_alias_queries.go"

# reference enginetest/scriptgen/setup/scripts/{xy,null_ranges}: same rows,
# index clauses dropped (indexes are advisory here — Spark pushdown/pruning
# replace lookups; SURVEY §2.1)
JOIN_FIXTURES = {
    "xy": ("CREATE TABLE xy (x INT PRIMARY KEY, y INT)",
           "INSERT INTO xy VALUES (1,0),(2,1),(0,2),(3,3)"),
    "uv": ("CREATE TABLE uv (u INT PRIMARY KEY, v INT)",
           "INSERT INTO uv VALUES (0,1),(1,1),(2,2),(3,2)"),
    "ab": ("CREATE TABLE ab (a INT PRIMARY KEY, b INT)",
           "INSERT INTO ab VALUES (0,2),(1,2),(2,2),(3,1)"),
    "pq": ("CREATE TABLE pq (p INT PRIMARY KEY, q INT)",
           "INSERT INTO pq VALUES (0,0),(1,1),(2,2),(3,3)"),
    "mn": ("CREATE TABLE mn (m INT PRIMARY KEY, n INT)",
           "INSERT INTO mn VALUES (2,0),(3,1),(4,2),(5,3)"),
    "rs": ("CREATE TABLE rs (r INT PRIMARY KEY, s INT)",
           "INSERT INTO rs VALUES (0,0),(1,0),(2,0),(4,4),(5,4)"),
    "xy_hasnull": ("CREATE TABLE xy_hasnull (x INT PRIMARY KEY, y INT)",
                   "INSERT INTO xy_hasnull VALUES (1,0),(2,1),(0,2),(3,NULL)"),
    "ab_hasnull": ("CREATE TABLE ab_hasnull (a INT PRIMARY KEY, b INT)",
                   "INSERT INTO ab_hasnull VALUES (0,2),(1,2),(2,NULL),(3,1)"),
    "xy_hasnull_idx": (
        "CREATE TABLE xy_hasnull_idx (x INT PRIMARY KEY, y INT)",
        "INSERT INTO xy_hasnull_idx VALUES (1,0),(2,1),(0,2),(3,NULL)"),
}

NULL_RANGE_FIXTURES = {
    "null_ranges": ("CREATE TABLE null_ranges (x INT PRIMARY KEY, y INT)",
                    "INSERT INTO null_ranges VALUES "
                    "(0,0),(1,1),(2,2),(3,NULL),(4,NULL)"),
}

ALIAS_FIXTURES = {**FIXTURES, **JOIN_FIXTURES}

KNOWN_DIVERGENT_JOIN: tuple[str, ...] = ()
KNOWN_JOIN_ENGERR: tuple[str, ...] = ()
KNOWN_DIVERGENT_ALIAS: tuple[str, ...] = ()
# documented residuals (sweep runs the corpus against the join fixtures;
# some column_alias entries come from ScriptTests with different rows):
KNOWN_ALIAS_ENGERR: tuple[str, ...] = (
    # multi-row scalar subquery under the join-fixture data — MySQL
    # errors identically (1242); DuckDB silently picks a row, so it can't
    # oracle this one
    "(select u from uv where v = y)",
    # Skip: true in the reference itself (GMS issue #1286 — duplicate
    # alias in subquery)
    "0 as a, 1 as a",
    # scalar correlation two scopes deep — Spark analyzer cap, same class
    # as the (rewritten) nested-IN correlation but with no first-order
    # flattening available
    "(select (select y as q))",
)


@pytest.mark.skipif(not REF_JOINS.exists(), reason="reference not present")
def test_golden_join_sweep(spark):
    ok, mismatches, engerrs = _sweep(
        spark, table_backed=True, src_path=REF_JOINS,
        fixtures=JOIN_FIXTURES)
    # r5 baseline: 31 of the corpus's 181 queries stay inside the xy
    # fixture family and are DuckDB-runnable; all 31 pass
    assert ok >= 28, f"join golden pass count regressed: {ok}"
    new = [q for q in mismatches if not any(
        k in q for k in KNOWN_DIVERGENT_JOIN)]
    new += [e for e in engerrs if not any(k in e for k in KNOWN_JOIN_ENGERR)]
    assert not new, f"NEW join-golden divergences ({len(new)}): {new[:5]}"


@pytest.mark.skipif(not REF_NULL_RANGES.exists(),
                    reason="reference not present")
def test_golden_null_range_sweep(spark):
    ok, mismatches, engerrs = _sweep(
        spark, table_backed=True, src_path=REF_NULL_RANGES,
        fixtures=NULL_RANGE_FIXTURES)
    # r5 baseline: 15/15
    assert ok >= 14, f"null-range golden pass count regressed: {ok}"
    assert not mismatches and not engerrs, (mismatches + engerrs)[:5]


@pytest.mark.skipif(not REF_COL_ALIAS.exists(),
                    reason="reference not present")
def test_golden_column_alias_sweep(spark):
    ok, mismatches, engerrs = _sweep(
        spark, table_backed=True, src_path=REF_COL_ALIAS,
        fixtures=ALIAS_FIXTURES)
    # r5 baseline: 11 passing + 3 documented residuals
    assert ok >= 10, f"column-alias golden pass count regressed: {ok}"
    new = [q for q in mismatches if not any(
        k in q for k in KNOWN_DIVERGENT_ALIAS)]
    new += [e for e in engerrs if not any(k in e for k in KNOWN_ALIAS_ENGERR)]
    assert not new, f"NEW alias-golden divergences ({len(new)}): {new[:5]}"
