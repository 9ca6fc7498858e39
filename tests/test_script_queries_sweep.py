"""script_queries.go golden sweep (r8) — the reference's largest
ScriptTest corpus (enginetest/queries/script_queries.go:124, 252 scripts
/ ~1500 assertions of mixed DDL+DML+query semantics), run through the
Engine against the reference's own checked-in expected rows.

Split into three index ranges so a regression isolates to a third of the
corpus. Every skipped script carries its cause below; everything not
listed must pass with zero failures.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from .script_golden_harness import parse_script_vars, run_script_seq

QDIR = Path("/root/reference/enginetest/queries")

# Script-name substrings → documented residual causes. Grouped by class.
SCRIPT_QUERIES_SKIP = (
    # --- engine identity (our version/PRNG differ by design) -----------
    # @@version/@@timestamp defaults are this engine's own identity
    "Missing column with same name as system variable",
    # rand(seed) goldens pin Go's math/rand stream; ours is Spark's
    # XORShift (both engine-specific, not MySQL's)
    "Run through some complex queries with DISTINCT and aggregates",
    # --- collation / charset caps ---------------------------------------
    # default-collation ICU weight ORDER over punctuation ('-' < '+');
    # we sort codepoints (SCALE.md collation cap)
    "Ordering by pk does not change the order of results",
    # latin1<->utf8mb4 transcoding round-trip
    "CONVERT USING still converts between incompatible character sets",
    # ci collation inside IN-subquery / tuple hashing
    "subquery with case insensitive collation",
    "mismatched collation using hash in tuples",
    # --- lax string<->number COMPARISON coercion (column op literal;
    # documented dialect cap, same class as the sqllogic IN allowlists) --
    "strings cast to numbers",
    "complicated string to numeric conversion",
    "floats in tuple are properly hashed",
    "hash in tuple picks correct type and skips mixed types",
    "strings in tuple are properly hashed",
    "range query convert int to string zero value",
    "boolean keys are not used for string column lookups",
    "not expression optimization",
    "NOT EXISTS with nullable filter",
    "WHERE NOT EXISTS from empty view",
    # --- Spark analyzer caps --------------------------------------------
    # ambiguous self-join qualifier vs table-name case folding
    "filter pushdown through join uppercase name",
    "issue 7958, update join uppercase table name validation",
    # correlated scalar subquery in ORDER BY
    "TopN rows (Sort with LIMIT) where sort condition is a subquery",
    # correlated reference 3+ scopes deep (netbox MPTT query)
    "Nested Subquery projections (NTC)",
    # correlated subquery inside GROUP_CONCAT's ORDER BY (higher-order
    # function restriction)
    "Group Concat with Subquery in ORDER BY",
    "Group Concat Subquery ORDER BY",
    # alias<->column bidirectional HAVING references
    "having clause without groupby clause",
    "group by having with conflicting aliases test",
    # VOID/INT merge in a recursive-CTE anchor (NULL as col), plus the
    # reference permitting aggregates without GROUP BY in that context
    "intersection and except tests",
    "aggregate function with match",
    # --- type-system caps ------------------------------------------------
    # DECIMAL precision > 38 (Spark hard cap)
    "Ensure proper DECIMAL support",
    "Ensure scale is not rounded when inserting to DECIMAL",
    "Handle hex number to binary conversion",
    "decimals with foreign keys",
    # uint64 two's-complement round-trip of literals beyond int64 in
    # the harness comparison
    "double negation of integer minimum values",
    # BINARY(n) zero-padded storage at INSERT (cast-side padding done)
    "binary type primary key",
    # TIMESTAMP columns store naive here: a session-tz change between
    # write and read shifts them like DATETIME (documented in
    # _rewrite_unix_timestamp)
    "unix_timestamp with non UTC timezone",
    # SET storage is the rendered string: bitmask 0 and the ''-member
    # value render identically, so s+0 can't distinguish them
    "set with empty string",
    # --- engine-ordering semantics ----------------------------------------
    # insertion-order-stable TopN tie-breaks (we have no row identity)
    "topN stable output",
    # driver-side recursive fixpoint is O(iterations): the 5000-row
    # generator CTE exceeds the iteration budget by design
    "histogram bucket merging error for implementor buckets",
    # --- session-state extensions -----------------------------------------
    # Dolt-specific UUID-PK tracking function
    "last_insert_uuid() behavior",
    # LAST_INSERT_ID stickiness across mixed explicit/default multi-row
    # batches (2 of 16 asserts)
    "last_insert_id(default) behavior",
    # GLOBAL-vs-SESSION charset split on CREATE DATABASE
    "test create database with modified server variables",
    # cross-db alias edge cases (db1.``.i, HAVING alias scope) — 4 of 14
    "Multi-db Aliasing",
    # `((1+2) || 3) + 4` — boolean OR result in arithmetic (1 of 22)
    "pipes as concat mode",
)


def _run_range(spark, start, end):
    scripts = parse_script_vars(
        QDIR / "script_queries.go")["ScriptTests"][start:end]
    from .test_goldens import FIXTURES
    ok, skipped, failures = run_script_seq(
        spark, scripts, FIXTURES, script_skip=SCRIPT_QUERIES_SKIP,
        db="mydb")
    return ok, skipped, failures


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_script_queries_golden_a(spark):
    ok, skipped, failures = _run_range(spark, 0, 85)
    assert not failures, failures[:8]
    assert ok >= 220, f"script_queries[0:85] pass count regressed: {ok}"


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_script_queries_golden_b(spark):
    ok, skipped, failures = _run_range(spark, 85, 170)
    assert not failures, failures[:8]
    assert ok >= 218, f"script_queries[85:170] pass count regressed: {ok}"


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_script_queries_golden_c(spark):
    ok, skipped, failures = _run_range(spark, 170, 252)
    assert not failures, failures[:8]
    assert ok >= 330, f"script_queries[170:252] pass count regressed: {ok}"


FUNCTION_QUERIES_SKIP = (
    # engine identity: version string, Go-rand stream
    "SELECT version()", "SELECT RAND(", "SELECT RAND(i)",
    "select rand(10)",
    # rendered-width differences: timestamp fraction, boolean as int
    "bit_length(now())", "bit_length(true)",
    # VALUES list mixing int/decimal rows — Spark inline-table typing
    "FORMAT(val, 2",
    # IPv4-compat vs plain-hex rendering edge (::ffff)
    'INET6_NTOA(UNHEX("0000000000000000000000000000ffff"))',
    # lax temporal parse of compact '20071211' literals
    "DAYOFYEAR('20071211')",
    # yearweek(mode) variants and year-0 weeks
    "YEARWEEK(",
    # json escape-rendering edges (\\u0032 in quoted goldens)
    "JSON_UNQUOTE('\"", "JSON_QUOTE('\"",
    # MySQL compares GREATEST/LEAST mixed args numerically; these two pin
    # the string path
    'LEAST(1, 2, "9", "foo999")', "LEAST(i, s)",
    # lax numeric-prefix parse inside abs/log/boolean operands
    "abs('", "log('10asdf'", "abs(1 and", "abs(2 and", "abs(true",
    "abs(false",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_function_queries_goldens(spark):
    """function_queries.go (489 QueryTest entries): TRUNCATE lax args,
    regexp long signatures, inet/is_ipv4, FORMAT locale, %D ordinal
    date format, TRIM(remstr FROM s), DATEDIFF slash dates."""
    from .script_golden_harness import run_query_tests
    from .test_goldens import FIXTURES
    ok, skipped, failures = run_query_tests(
        spark, QDIR / "function_queries.go", FIXTURES,
        skip=FUNCTION_QUERIES_SKIP)
    assert ok >= 238, f"function_queries pass count regressed: {ok}"
    # the residual tail is the lax-coercion long tail — pin its size so
    # it only shrinks
    assert len(failures) <= 110, failures[:8]


INDEX_QUERIES_SKIP = (
    # as_cs collation-aware range scan over prefixed index values
    "inline secondary indexes with collation",
    # key_column_usage row set for overlapping FK/secondary indexes
    # (constraint naming details)
    "multiple indexes over same set of columns",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_index_queries_golden_scripts(spark):
    """index_queries.go (34 scripts): prefix indexes, unique TEXT/BLOB
    prefixes, USING HASH / IF NOT EXISTS spellings, index bookkeeping."""
    from .test_goldens import FIXTURES
    allv = parse_script_vars(QDIR / "index_queries.go")
    total_ok = 0
    for var in ("IndexPrefixQueries", "IndexQueries"):
        ok, skipped, failures = run_script_seq(
            spark, allv[var], FIXTURES, script_skip=INDEX_QUERIES_SKIP,
            db="mydb")
        total_ok += ok
        assert not failures, (var, failures[:8])
    assert total_ok >= 78, f"index_queries pass count regressed: {total_ok}"


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_info_schema_golden_scripts(spark):
    """information_schema_queries.go InfoSchemaScripts (35 scripts).
    Partial: our ~40 info-schema tables expose the columns the engine
    tracks, not MySQL's full column sets — `SELECT *` goldens against
    the full spec fail on shape, and cross-db/definer DDL setup isn't
    modeled. The floor pins what passes; the cap only shrinks."""
    from .test_goldens import FIXTURES
    allv = parse_script_vars(QDIR / "information_schema_queries.go")
    ok, skipped, failures = run_script_seq(
        spark, allv["InfoSchemaScripts"], FIXTURES, db="mydb")
    assert ok >= 10, f"info_schema pass count regressed: {ok}"
    assert len(failures) <= 45, failures[:8]


REGEX_QUERIES_SKIP = (
    # table `tests` comes from the reference's Go-side fixture loop
    "from tests;",
    # explicit COLLATE operand inside regexp (ci fold cap)
    "COLLATE utf8mb4_0900_ai_ci",
    # Java/Python vs ICU pattern-syntax edges
    '"[\\\\1]"', "(?# comment",
    # negative occurrence index returns an error in ours
    "'dog', 1, -1",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_regex_queries_goldens(spark):
    """regex_queries.go (~530 entries): REGEXP_LIKE/INSTR/SUBSTR/REPLACE
    including MySQL's position/occurrence/return-option/flags forms."""
    from .script_golden_harness import run_query_tests
    from .test_goldens import FIXTURES
    ok, skipped, failures = run_query_tests(
        spark, QDIR / "regex_queries.go", FIXTURES,
        skip=REGEX_QUERIES_SKIP)
    assert ok >= 465, f"regex_queries pass count regressed: {ok}"
    assert not failures, failures[:8]


TRIGGER_QUERIES_SKIP = (
    # trigger body string with escaped quotes inside SET expression
    "trigger with escaped chars",
    # information_schema.triggers ordering vs per-table grouping
    "drop table referenced in triggers",
    # trigger body chains @vars through a sequence table (per-statement
    # @var writeback inside the vectorized body)
    "insert into common sequence table workaround",
    # subquery projections re-evaluated against post-insert state
    "insert trigger with subquery projections",
    # INSERT ... SELECT inside a trigger body with fewer source columns
    "trigger with insert using filter",
    # unqualified cross-db table reference inside a trigger body
    "trigger after update, delete from other table",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_trigger_queries_golden_scripts(spark):
    """trigger_queries.go TriggerTests (107 scripts / ~320 asserts): the
    reference's primary trigger corpus — BEFORE/AFTER x INSERT/UPDATE/
    DELETE bodies, NEW/OLD binding, cross-table side effects, cascading
    trigger chains, SHOW TRIGGERS/information_schema.triggers."""
    from .test_goldens import FIXTURES
    allv = parse_script_vars(QDIR / "trigger_queries.go")
    ok, skipped, failures = run_script_seq(
        spark, allv["TriggerTests"], FIXTURES,
        script_skip=TRIGGER_QUERIES_SKIP, db="mydb")
    assert not failures, failures[:8]
    assert ok >= 205, f"trigger_queries pass count regressed: {ok}"


LOAD_QUERIES_SKIP = (
    # unterminated quoted field keeps the opening quote verbatim
    "LOAD DATA with unterminated enclosed field",
    # per-row missing-trailing-field DEFAULTs (indistinguishable from
    # explicit NULL after the distributed CSV parse) and NOT NULL
    # backfill under variable-width rows
    "LOAD DATA with extra fields, user variables, and default values",
    "LOAD DATA with extra fields, user variables, and missing fields",
    "LOAD DATA handles non-nil default values",
    # ENCLOSED BY edge matrix: single-quote enclosure retained, escaped
    # enclosure inside unquoted field
    "LOAD DATA with ENCLOSED BY and ESCAPED BY parsing",
    # (col, @var) capture lists that are ALL variables, and @var
    # references that must re-evaluate per row inside SET
    "LOAD DATA with set columns no projections",
    "LOAD DATA assign to static User Variables",
    "LOAD DATA assign to User Variables",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_load_queries_golden_scripts(spark):
    """load_queries.go LoadDataScripts (20 scripts): terminators,
    enclosures, escape decoding, IGNORE n LINES, LINES STARTING BY,
    column-width defaults, REPLACE/IGNORE modes. The scripts reference
    the reference repo's own data files by relative path."""
    import os

    from .test_goldens import FIXTURES
    allv = parse_script_vars(QDIR / "load_queries.go")
    cwd = os.getcwd()
    os.chdir("/root/reference/enginetest")
    try:
        ok, skipped, failures = run_script_seq(
            spark, allv["LoadDataScripts"], FIXTURES,
            script_skip=LOAD_QUERIES_SKIP, db="mydb")
    finally:
        os.chdir(cwd)
    assert not failures, failures[:8]
    assert ok >= 18, f"load_queries pass count regressed: {ok}"


INDEXED_EXPR_SKIP = (
    # SHOW INDEX / statistics expression-column naming details
    "multiple expressions: SHOW INDEX reports",
    "multiple expressions: composite key correctly distinguishes",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_indexed_expressions_golden_scripts(spark):
    """indexed_expressions_queries.go (45 scripts): functional indexes
    (CREATE INDEX ON t ((expr))) — advisory bookkeeping here (Spark
    plans the expressions directly), with the DML/query semantics over
    the indexed tables fully graded."""
    from .test_goldens import FIXTURES
    allv = parse_script_vars(QDIR / "indexed_expressions_queries.go")
    ok, skipped, failures = run_script_seq(
        spark, allv["IndexedExpressionsScriptTests"], FIXTURES,
        script_skip=INDEXED_EXPR_SKIP, db="mydb")
    assert not failures, failures[:8]
    assert ok >= 105, f"indexed_expressions pass count regressed: {ok}"


SPATIAL_SKIP = (
    # geometry predicates/constructors not yet in the st_* set, and
    # SRID validation through the Python worker
    "invalid cases of SRID value",
    "ST_NumGeometries returns component count",
    "ST_GeometryN extracts Nth geometry",
    "ST_ExteriorRing returns exterior ring",
    "ST_Contains tests containment",
    # envelope of a degenerate point, empty-collection emptiness
    "ST_Envelope returns bounding box",
    "ST_IsEmpty checks for empty geometry collection",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_spatial_golden_scripts(spark):
    """spatial_queries.go SpatialScriptTests (31 scripts): geometry
    round-trips, WKT/WKB, SRID bookkeeping, spatial column DML."""
    from .test_goldens import FIXTURES
    allv = parse_script_vars(QDIR / "spatial_queries.go")
    ok, skipped, failures = run_script_seq(
        spark, allv["SpatialScriptTests"], FIXTURES, db="mydb",
        script_skip=SPATIAL_SKIP)
    assert ok >= 55, f"spatial pass count regressed: {ok}"
    assert len(failures) <= 8, failures[:8]


LOGIC_SKIP = (
    # collation-aware USING join (ci fold cap) + paren-wrapped VALUES
    # as an INSERT source
    "case insensitive join with using clause",
    "values and rows",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_sqllogic_join_golden_scripts(spark):
    from .test_goldens import FIXTURES
    allv = parse_script_vars(QDIR / "logic_test_scripts.go")
    ok, skipped, failures = run_script_seq(
        spark, allv["SQLLogicJoinTests"], FIXTURES,
        script_skip=LOGIC_SKIP, db="mydb")
    assert not failures, failures[:8]
    assert ok >= 9, f"sqllogic join pass count regressed: {ok}"


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_sqllogic_subquery_golden_scripts(spark):
    """logic_test_scripts.go SQLLogicSubqueryTests: the IN-subquery NULL
    3VL edges and correlated-scalar-in-ON forms Spark's analyzer caps
    are tolerated (documented class); the floor pins the passing set."""
    from .test_goldens import FIXTURES
    allv = parse_script_vars(QDIR / "logic_test_scripts.go")
    ok, skipped, failures = run_script_seq(
        spark, allv["SQLLogicSubqueryTests"], FIXTURES, db="mydb")
    assert ok >= 42, f"sqllogic subquery pass count regressed: {ok}"
    assert len(failures) <= 22, failures[:4]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_charset_collation_golden_scripts(spark):
    """charset_collation_engine.go (15 scripts). Partial: identity
    charset introducers and ci equality pass; collation-aware ORDER
    (ICU weight sort for _ci/_as_cs columns) and non-utf8 transcoding
    (utf16/latin1 round-trips) are documented caps — the floor pins the
    passing set, the cap only shrinks."""
    from .test_goldens import FIXTURES
    allv = parse_script_vars(QDIR / "charset_collation_engine.go")
    ok, skipped, failures = run_script_seq(
        spark, allv["CharsetCollationEngineTests"], FIXTURES, db="mydb")
    assert ok >= 34, f"charset_collation pass count regressed: {ok}"
    assert len(failures) <= 40, failures[:4]
