"""Reference ScriptTest golden sweeps beyond fulltext (r5).

Corpora swept through the Engine against the reference's own checked-in
expected rows (tests/script_golden_harness.py):
- json_table_queries.go — SQL-text JSON_TABLE (LATERAL rewrite over the
  __json_table_rows UDTF)
- order_by_group_by_queries.go — MySQL grouping permissiveness
  (ANY_VALUE, ungrouped columns, alias scoping)
- derived_table_outer_scope_visibility_queries.go — outer-scope alias
  visibility edges

- variable_queries.go / view_queries.go — r5
- procedure_queries.go (ProcedureLogicTests + ProcedureCallTests) — r7:
  block-scoped DECLARE, labeled blocks, nested CALL INOUT writeback,
  bounded recursion
- column_default_queries.go — r7: literal-default normalization,
  cross-column default expressions, information_schema COLUMN_DEFAULT
"""

from __future__ import annotations

from pathlib import Path

import pytest

from .script_golden_harness import (parse_script_vars, run_script_seq,
                                    run_scripts)

QDIR = Path("/root/reference/enginetest/queries")

# documented residual causes, matched against script name or query text
JSON_TABLE_SKIP = (
    # Spark rejects NATURAL JOIN against a LATERAL subquery
    # (INCOMPATIBLE_JOIN_TYPES); MySQL's natural join over JSON_TABLE has
    # no shared columns so users can spell CROSS JOIN
    "NATURAL JOIN",
)
OBGB_SKIP = (
    # sibling projection-alias / correlated references inside scalar
    # subqueries beyond one scope — Spark analyzer caps (same class as
    # the allowlisted column_alias residuals in test_goldens.py)
    "(SELECT alias1+1 group by alias1",
    "(SELECT UPPER(team) having id > 3)",
    # the reference's default sql_mode STRING differs from MySQL 8's
    # (ours matches MySQL 8); value is cosmetic
    "sql_mode",
    # the reference permits ORDER BY on a column neither grouped nor
    # functionally dependent (group by c1, order by c2); MySQL 8's
    # ONLY_FULL_GROUP_BY rejects it — we match MySQL
    "where c2 = 3 group by c1 order by c2",
)
DERIVED_SKIP = (
    # correlated reference two scopes deep (HAVING -> derived table ->
    # outer column) — Spark analyzer cap
    "HAVING t1.d > (SELECT dt.a FROM",
    # outer-column reference inside a recursive CTE body — analyzer cap
    "(with recursive cte1(n) as (select (n1.val)",
    # single-quoted alias ('row_number') — MySQL-only spelling
    "as 'row_number'",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_json_table_golden_scripts(spark):
    ok, skipped, failures = run_scripts(
        spark, QDIR / "json_table_queries.go", assert_skip=JSON_TABLE_SKIP)
    assert ok >= 38, f"json_table golden pass count regressed: {ok}"
    assert not failures, failures[:6]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_order_by_group_by_golden_scripts(spark):
    ok, skipped, failures = run_scripts(
        spark, QDIR / "order_by_group_by_queries.go", assert_skip=OBGB_SKIP,
        db="mydb")
    assert ok >= 27, f"order/group golden pass count regressed: {ok}"
    assert not failures, failures[:6]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_derived_table_visibility_golden_scripts(spark):
    ok, skipped, failures = run_scripts(
        spark, QDIR / "derived_table_outer_scope_visibility_queries.go",
        assert_skip=DERIVED_SKIP, script_skip=("dolthub",))
    assert ok >= 5, f"derived-table golden pass count regressed: {ok}"
    assert not failures, failures[:6]


VARIABLE_SKIP = (
    # MySQL's lax string->number coercion in `@stringVar = 123` ('abc'
    # compares as 0); Spark's cast yields NULL — documented dialect cap
    # (same class as the sqllogic IN-list allowlists)
    "SELECT @stringVar=123",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_variable_golden_scripts(spark):
    """Session/system-variable surface vs the reference's own golden
    scripts (variable_queries.go): SET scopes (SESSION/LOCAL/GLOBAL/@@),
    bareword and quoted boolean coercion, SET NAMES/CHARSET (also inside
    assignment lists), sql_mode canonical normalization."""
    ok, skipped, failures = run_scripts(
        spark, QDIR / "variable_queries.go", assert_skip=VARIABLE_SKIP,
        db="mydb")
    assert ok >= 33, f"variable golden pass count regressed: {ok}"
    assert not failures, failures[:6]


VIEW_SKIP = (
    # cross-database views (base.xy): engine views live in the session
    # catalog, which is database-unqualified — documented cap
    "multi database view",
    # MySQL prints a view's DECIMAL column as its string form; cosmetic
    "WHERE decimal_col = 1.5",
    # a view column literally named `1.5` — Spark rejects the dotted
    # numeric identifier
    "view with numeric column name",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_view_golden_scripts(spark):
    """View surface vs view_queries.go: IF NOT EXISTS, explicit column
    lists, SHOW KEYS/INDEX/COLUMNS + DESCRIBE against views,
    information_schema.columns including view columns."""
    ok, skipped, failures = run_scripts(
        spark, QDIR / "view_queries.go", assert_skip=VIEW_SKIP,
        script_skip=("multi database view", "view with numeric column"),
        db="mydb")
    assert ok >= 27, f"view golden pass count regressed: {ok}"
    assert not failures, failures[:6]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_time_golden_scripts(spark):
    ok, skipped, failures = run_scripts(
        spark, QDIR / "time_queries.go", db="mydb")
    assert ok >= 1 and not failures, (ok, failures[:4])


ALTER_SKIP = (
    # inserting INTEGER BITMASKS into a SET column ('3' -> 'a,b') — the
    # numeric-to-set conversion surface isn't implemented (documented)
    "modify set column",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_alter_table_golden_scripts(spark):
    """ALTER TABLE surface vs alter_table_queries.go: CHANGE rename+
    retype, ALTER COLUMN SET/DROP DEFAULT, ADD/DROP (named) CHECK,
    AUTO_INCREMENT= option, COLLATE/COMMENT/ENGINE options, DISABLE/
    ENABLE KEYS, auto-inc counter semantics (explicit ids, MODIFY
    gaining auto_increment), enum ordinal arithmetic, checks following
    column renames, MySQL-normal-form CHECK_CONSTRAINTS rendering."""
    ok, skipped, failures = run_scripts(
        spark, QDIR / "alter_table_queries.go",
        script_skip=(
            "modify set column",
            # depends on the PREVIOUS script's rename having persisted
            # (reference runs this var on one shared engine); the
            # per-script fresh-fixture harness can't see i2
            "rename column preserves table checks",
        ), db="mydb")
    assert ok >= 29, f"alter golden pass count regressed: {ok}"
    assert not failures, failures[:6]


# Scripts whose semantics are triaged-but-unimplemented (r5): ODKU on
# unique/keyless indexes, ODKU referencing select-source aliases or
# DEFAULT, multi-table UPDATE JOIN with triggers/FKs, varchar-length
# truncation under IGNORE, per-column defaults referencing peer columns,
# WITH-attached UPDATE, and lax cross-row literal typing. Each is a
# documented future-work item; a failure OUTSIDE these scripts is a
# regression.
# r7 cleared the whole r5 triage list: WITH-attached UPDATE, UPDATE-join
# triggers with OLD./NEW. row values, FK-constrained UPDATE join,
# conflicting subquery alias, and row-level UPDATE IGNORE conflict-skip
# on pk/unique collisions (inter-row and within-statement).
UPDATE_KNOWN_FAIL = ()
# r7 cleared most of the r5 triage list (explicit DEFAULT incl.
# cross-column references, escaped-string defaults, ODKU on keyless
# unique indexes + DEFAULT update values + subquery-source references,
# IGNORE string truncation + lenient ODKU, UPDATE IGNORE unique-collision
# skip, NO_AUTO_VALUE_ON_ZERO info_schema). Survivors, cause-annotated:
INSERT_KNOWN_FAIL = (
    # reference's own InsertBrokenScripts var (its harness skips them
    # too): per-cell heterogeneous literal typing under IGNORE, and an
    # assertion reading the PREVIOUS script's table
    "INSERT INTO with ENUM NOT NULL",
    "Test that INSERT IGNORE assigns the closest dataype correctly",
    # IGNORE must downgrade a multi-row scalar-subquery error to a
    # warning mid-SELECT — Spark evaluates the subquery inside the scan
    "Try INSERT IGNORE with primary key, non null, and single row",
    # nested WITH inside a CTE body with qualified column aliases —
    # Spark analyzer cap
    "issue 4857: insert cte column alias",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_update_golden_scripts(spark):
    ok, skipped, failures = run_scripts(
        spark, QDIR / "update_queries.go",
        script_skip=UPDATE_KNOWN_FAIL, db="mydb")
    # skipped scripts also contained passing assertions
    assert ok >= 8, f"update golden pass count regressed: {ok}"
    assert not failures, failures[:6]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_insert_golden_scripts(spark):
    """INSERT surface vs insert_queries.go: sequential AUTO_INCREMENT
    (explicit/0/NULL interleave, NO_AUTO_VALUE_ON_ZERO), IGNORE filtering
    (CHECK/FK/unique/pk-dup), unique secondary index enforcement,
    VALUES with DEFAULT/empty rows/scalar subqueries, RETURNING,
    implicit defaults (enum first value, NOT NULL zero values)."""
    ok, skipped, failures = run_scripts(
        spark, QDIR / "insert_queries.go",
        script_skip=INSERT_KNOWN_FAIL, db="mydb")
    # skipped scripts also contained passing assertions
    assert ok >= 45, f"insert golden pass count regressed: {ok}"
    assert not failures, failures[:6]


CHECKS_FIXTURE = {"checks": (
    "CREATE TABLE checks (a INTEGER PRIMARY KEY, b INTEGER, c varchar(20))",
    ["ALTER TABLE checks ADD CONSTRAINT chk1 CHECK (B > 0)",
     "ALTER TABLE checks ADD CONSTRAINT chk2 CHECK (b > 0) NOT ENFORCED",
     "ALTER TABLE checks ADD CONSTRAINT chk3 CHECK (B > 1)",
     "ALTER TABLE checks ADD CONSTRAINT chk4 CHECK (upper(C) = c)"])}

# per-var engine lifetime mirrors the reference runner
# (enginetests.go: TestScriptWithEngine shares ONE engine per var)
CHECKS_MODES = [
    ("CreateCheckConstraintsScripts", False, CHECKS_FIXTURE),
    ("DropCheckConstraintsScripts", True, {}),
    ("ChecksOnInsertScripts", True, {}),
    ("ChecksOnUpdateScriptTests", False, {}),
]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_check_constraint_golden_scripts(spark):
    """CHECK constraint surface vs check_scripts.go: NOT ENFORCED
    metadata + skipped validation, auto-named constraints
    ({table}_chk_{n}), column-inline CHECK in CREATE TABLE,
    DROP CHECK/CONSTRAINT by name, info-schema ci name compares,
    multi-target UPDATE ... JOIN SET with statement atomicity."""
    groups = parse_script_vars(QDIR / "check_scripts.go")
    total_ok, all_failures = 0, []
    for var, shared, fx in CHECKS_MODES:
        ok, skipped, failures = run_script_seq(
            spark, groups.get(var, []), fx, shared=shared, db="mydb")
        total_ok += ok
        all_failures += failures
    assert total_ok >= 22, f"check golden pass count regressed: {total_ok}"
    assert not all_failures, all_failures[:8]


GENERATED_SKIP = ()


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_generated_columns_golden_scripts(spark):
    """Generated-column surface vs generated_columns.go: optional
    GENERATED ALWAYS keyword, virtual/stored, DEFAULT targeting a
    generated column (INSERT VALUES + UPDATE SET), dependency-ordered
    recompute (v2 as (a + v1)), ADD COLUMN ... AS (...) FIRST backfill,
    ODKU recompute, backticked names with spaces, DML in BEFORE
    triggers reading NEW.<generated>."""
    ok, skipped, failures = run_scripts(
        spark, QDIR / "generated_columns.go", db="mydb")
    assert ok >= 160, f"generated golden pass count regressed: {ok}"
    assert not failures, failures[:8]


JSON_SKIP = (
    # JSON stays a STRING column in this engine: CAST(x AS JSON) cannot
    # carry the source column's DECIMAL/UNSIGNED kind into JSON_TYPE
    "types survive round-trip into tables",
    "unsigned tinyint is still unsigned",
    # raw `?` bind parameter outside PREPARE (Go-harness bindings)
    "JSON_ARRAY properly handles CHAR bind vars",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_json_golden_scripts(spark):
    """JSON surface vs json_scripts.go: CAST AS JSON in VALUES, nested
    JSON_ARRAY/JSON_OBJECT constructors, JSON_OBJECTAGG NULL-on-empty +
    last-wins duplicate keys, JSON_LENGTH/JSON_VALUE path+type args,
    json_extract missing-key (SQL NULL) vs JSON-null ('null'), ->/->>
    operators."""
    ok, skipped, failures = run_scripts(
        spark, QDIR / "json_scripts.go", script_skip=JSON_SKIP, db="mydb")
    assert ok >= 23, f"json golden pass count regressed: {ok}"
    assert not failures, failures[:8]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_procedure_logic_golden_scripts(spark):
    """Stored-procedure control flow vs the reference's own pin for that
    surface (procedure_queries.go ProcedureLogicTests): block-scoped
    DECLARE (nesting + parameter shadowing), multi-name DECLARE, labeled
    BEGIN/LOOP/REPEAT/WHILE with ITERATE/LEAVE, cursors + handlers,
    SET := spelling, bounded CALL recursion, subquery set operations."""
    scripts = parse_script_vars(
        QDIR / "procedure_queries.go")["ProcedureLogicTests"]
    ok, skipped, failures = run_script_seq(
        spark, scripts, _fixtures())
    assert ok >= 26, f"procedure-logic golden pass count regressed: {ok}"
    assert not failures, failures[:8]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_procedure_call_golden_scripts(spark):
    """CALL surface (procedure_queries.go ProcedureCallTests): OUT/INOUT
    writeback through @vars, nested CALL with by-reference INOUT
    parameters, argument count/order checks."""
    scripts = parse_script_vars(
        QDIR / "procedure_queries.go")["ProcedureCallTests"]
    ok, skipped, failures = run_script_seq(
        spark, scripts, _fixtures())
    assert ok >= 7, f"procedure-call golden pass count regressed: {ok}"
    assert not failures, failures[:8]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_column_default_golden_scripts(spark):
    """Column-default surface vs column_default_queries.go: literal
    default normalization (int rounds, float trims, double quotes),
    expression defaults of any paren depth, cross-column default
    references (including after MODIFY ... FIRST repositioning), RENAME
    following into stored default expressions, DEFAULT now(6) /
    JSON_OBJECT() function defaults, information_schema COLUMN_DEFAULT
    rendering, generated-column recompute through multi-table UPDATE."""
    scripts = parse_script_vars(
        QDIR / "column_default_queries.go")["ColumnDefaultTests"]
    ok, skipped, failures = run_script_seq(
        spark, scripts, _fixtures())
    assert ok >= 23, f"column-default golden pass count regressed: {ok}"
    assert not failures, failures[:8]


def _fixtures():
    from .test_goldens import FIXTURES
    return dict(FIXTURES)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_create_table_golden_scripts(spark):
    """CREATE TABLE surface vs create_table_queries.go: CTAS in every
    MySQL spelling (no AS, joins/GROUP BY/window/JSON_TABLE sources,
    declared constraint/column overrides merged with the selected schema,
    table options between body and AS), auto-increment carryover,
    SHOW FULL FIELDS."""
    for var, floor in (("CreateTableScriptTests", 7),
                       ("CreateTableAutoIncrementTests", 3)):
        scripts = parse_script_vars(
            QDIR / "create_table_queries.go")[var]
        ok, skipped, failures = run_script_seq(spark, scripts, _fixtures())
        assert ok >= floor, f"{var} golden pass count regressed: {ok}"
        assert not failures, (var, failures[:8])


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_event_golden_scripts(spark):
    """EVENT surface vs event_queries.go: composite interval units
    ('1:2' MINUTE_SECOND), STARTS/ENDS bounds, lenient timestamp
    literals ('38-01-16 12:2:3.'), ON COMPLETION semantics for expired
    events (re-ENABLE keeps disabled under PRESERVE, drops under NOT
    PRESERVE), ALTER EVENT RENAME/COMMENT/DO/schedule swaps. All
    assertions are execute-only in this corpus — the gate is zero
    failures."""
    scripts = parse_script_vars(QDIR / "event_queries.go")["EventTests"]
    ok, skipped, failures = run_script_seq(spark, scripts, _fixtures())
    assert not failures, failures[:8]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_foreign_key_golden_scripts(spark):
    """FK referential-action surface vs foreign_key_queries.go — the
    virtual-column interplay, multi-FK, and self-referential script
    families (the full 74-script var runs ~15 min under per-script fresh
    fixtures, so the sweep pins the families r7 fixed: generated columns
    recompute after CASCADE/SET NULL, cascaded joins preserve declared
    column order, self-referential inserts validate against post-insert
    state, self-qualified UPDATE references)."""
    keys = ("virtual column", "multiple foreign key refs",
            "self-referential")
    scripts = [s for s in parse_script_vars(
        QDIR / "foreign_key_queries.go")["ForeignKeyTests"]
        if any(k in s[0] for k in keys)]
    ok, skipped, failures = run_script_seq(spark, scripts, _fixtures())
    assert ok >= 23, f"foreign-key golden pass count regressed: {ok}"
    assert not failures, failures[:8]


PREPARED_SKIP = (
    # Go-harness artifacts: a raw `?` bindvar outside PREPARE (the
    # reference binds through its test driver), and a datetime() Go
    # helper call in SETUP — same class as the json_scripts bind skips
    "prepare with time type binding",
    "Large character data",
)


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_prepared_statement_golden_scripts(spark):
    """PREPARE/EXECUTE surface vs prepared_statement_queries.go: repeated
    EXECUTE with rebinding, USING @vars, statement invalidation."""
    scripts = [s for s in parse_script_vars(
        QDIR / "prepared_statement_queries.go")["PreparedScriptTests"]
        if not any(k in s[0] for k in PREPARED_SKIP)]
    ok, skipped, failures = run_script_seq(spark, scripts, _fixtures())
    assert ok >= 4, f"prepared golden pass count regressed: {ok}"
    assert not failures, failures[:8]
