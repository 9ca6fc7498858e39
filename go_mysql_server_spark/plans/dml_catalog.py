"""Driver-verifiable DML/DDL scripts — SURVEY §2.11/§2.12.

The driver's oracle only sees `queries()`, so the engine's DML surface
(INSERT ON DUPLICATE KEY, FK cascades, triggers, generated columns,
transactions, AUTO_INCREMENT, ALTER) gets catalog entries here: the Spark
side runs a deterministic statement script through `Engine` (the real
statement router, engine.py) and returns the final table state; the DuckDB
oracle computes the same final state as one declarative SELECT over the
same parquet inputs (single-statement, so it runs under the driver's
`con.execute(oracle)` contract).

Reference parity: these scripts exercise the semantics of
sql/plan/insert.go:62-103 (ODKU), sql/plan/foreign_key_editor.go
(CASCADE/SET NULL), sql/plan/trigger.go (BEFORE/AFTER row triggers),
sql/plan/virtual_column_table.go (generated columns), and the
transaction surface (sql/session.go) — each asserted end-state-wise.

Table names are entry-unique and scripts start with DROP TABLE IF EXISTS
so re-runs inside one session are idempotent.
"""

from __future__ import annotations

from ..engine import Engine
from ._util import t
from .registry import query


def _eng(spark, sf_dir, *tables: str) -> Engine:
    for name in tables:
        # register the parquet table as a temp view so the engine's
        # INSERT ... SELECT statements can read it
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return Engine(spark)


@query(
    "dml_on_dup_key_txn",
    oracle="""
WITH seeded AS (
  SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name, 1 AS hits
  FROM nation
),
batch AS (
  SELECT CAST(n_nationkey * 2 AS BIGINT) AS k,
         'dup-' || n_name AS name
  FROM nation
),
merged AS (
  SELECT s.k, s.name,
         s.hits + CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END AS hits
  FROM seeded s LEFT JOIN batch b USING (k)
  UNION ALL
  SELECT b.k, b.name, 1 AS hits
  FROM batch b LEFT JOIN seeded s USING (k)
  WHERE s.k IS NULL
)
SELECT k, name, CAST(hits + 100 AS INTEGER) AS hits
FROM merged ORDER BY k
""",
)
def dml_on_dup_key_txn(spark, sf_dir):
    """INSERT ... ON DUPLICATE KEY UPDATE (upsert), then a committed
    transaction (UPDATE survives), a savepoint-rollback (DELETE undone),
    and a full rollback (second UPDATE undone). Final state = upsert result
    with the committed +100."""
    eng = _eng(spark, sf_dir, "nation")
    eng.query("DROP TABLE IF EXISTS dml_odku")
    eng.query("CREATE TABLE dml_odku (k BIGINT PRIMARY KEY, "
              "name VARCHAR(64), hits INT)")
    eng.query("INSERT INTO dml_odku SELECT n_nationkey, n_name, 1 FROM nation")
    eng.query("INSERT INTO dml_odku "
              "SELECT n_nationkey * 2, CONCAT('dup-', n_name), 1 FROM nation "
              "ON DUPLICATE KEY UPDATE hits = hits + 1")
    eng.query("BEGIN")
    eng.query("UPDATE dml_odku SET hits = hits + 100")      # commits
    eng.query("SAVEPOINT sp1")
    eng.query("DELETE FROM dml_odku WHERE k >= 20")          # undone
    eng.query("ROLLBACK TO sp1")
    eng.query("COMMIT")
    eng.query("BEGIN")
    eng.query("UPDATE dml_odku SET hits = 0")                # undone
    eng.query("ROLLBACK")
    return eng.query("SELECT k, name, hits FROM dml_odku ORDER BY k")


@query(
    "dml_fk_on_delete_cascade",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nk,
       CASE WHEN n_regionkey IN (1, 3)
            THEN NULL ELSE CAST(n_regionkey AS BIGINT) END AS rk_null,
       CAST(n_regionkey AS BIGINT) AS rk_kept,
       n_name AS nname
FROM nation
WHERE n_regionkey NOT IN (0, 2)
UNION ALL
SELECT CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT),
       CAST(n_regionkey AS BIGINT), n_name
FROM nation
WHERE n_regionkey IN (0, 2) AND 1 = 0
ORDER BY nk
""",
)
def dml_fk_on_delete_cascade(spark, sf_dir):
    """FK ON DELETE CASCADE deletes referencing rows; a second FK column
    with ON DELETE SET NULL nulls instead (reference
    sql/plan/foreign_key_editor.go). Parent = region, child = nation."""
    eng = _eng(spark, sf_dir, "nation", "region")
    eng.query("DROP TABLE IF EXISTS dml_fkd_c")
    eng.query("DROP TABLE IF EXISTS dml_fkd_p")
    eng.query("DROP TABLE IF EXISTS dml_fkd_p2")
    eng.query("CREATE TABLE dml_fkd_p (rk BIGINT PRIMARY KEY, rname VARCHAR(32))")
    eng.query("INSERT INTO dml_fkd_p SELECT r_regionkey, r_name FROM region")
    eng.query("CREATE TABLE dml_fkd_p2 (rk2 BIGINT PRIMARY KEY)")
    eng.query("INSERT INTO dml_fkd_p2 SELECT r_regionkey FROM region")
    eng.query(
        "CREATE TABLE dml_fkd_c (nk BIGINT PRIMARY KEY, rk_null BIGINT, "
        "rk_kept BIGINT, nname VARCHAR(32), "
        "FOREIGN KEY (rk_kept) REFERENCES dml_fkd_p(rk) ON DELETE CASCADE, "
        "FOREIGN KEY (rk_null) REFERENCES dml_fkd_p2(rk2) ON DELETE SET NULL)")
    eng.query("INSERT INTO dml_fkd_c SELECT n_nationkey, n_regionkey, "
              "n_regionkey, n_name FROM nation")
    # CASCADE parent loses regions 0,2 → their nations vanish;
    # SET NULL parent loses regions 1,3 → surviving rows null rk_null.
    eng.query("DELETE FROM dml_fkd_p WHERE rk IN (0, 2)")
    eng.query("DELETE FROM dml_fkd_p2 WHERE rk2 IN (1, 3)")
    return eng.query(
        "SELECT nk, rk_null, rk_kept, nname FROM dml_fkd_c ORDER BY nk")


@query(
    "dml_fk_on_update_cascade",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nk,
       CAST(CASE WHEN n_regionkey IN (1, 3)
                 THEN n_regionkey + 100 ELSE n_regionkey END AS BIGINT) AS rk,
       n_name AS nname
FROM nation
ORDER BY nk
""",
)
def dml_fk_on_update_cascade(spark, sf_dir):
    """FK ON UPDATE CASCADE: updating the parent key rewrites child
    references (reference sql/plan/foreign_key_editor.go; fixed r2,
    engine.py:1681)."""
    eng = _eng(spark, sf_dir, "nation", "region")
    eng.query("DROP TABLE IF EXISTS dml_fku_c")
    eng.query("DROP TABLE IF EXISTS dml_fku_p")
    eng.query("CREATE TABLE dml_fku_p (rk BIGINT PRIMARY KEY, rname VARCHAR(32))")
    eng.query("INSERT INTO dml_fku_p SELECT r_regionkey, r_name FROM region")
    eng.query(
        "CREATE TABLE dml_fku_c (nk BIGINT PRIMARY KEY, rk BIGINT, "
        "nname VARCHAR(32), "
        "FOREIGN KEY (rk) REFERENCES dml_fku_p(rk) ON UPDATE CASCADE)")
    eng.query("INSERT INTO dml_fku_c SELECT n_nationkey, n_regionkey, n_name "
              "FROM nation")
    eng.query("UPDATE dml_fku_p SET rk = rk + 100 WHERE rk IN (1, 3)")
    return eng.query("SELECT nk, rk, nname FROM dml_fku_c ORDER BY nk")


@query(
    "dml_triggers_audit",
    oracle="""
SELECT CAST(r_regionkey AS BIGINT) AS id,
       r_name AS name,
       'T-' || r_name AS tag,
       'ins' AS action
FROM region
ORDER BY id
""",
)
def dml_triggers_audit(spark, sf_dir):
    """BEFORE INSERT trigger rewrites NEW.tag; AFTER INSERT trigger writes
    an audit row (reference sql/plan/trigger.go BEFORE/AFTER × INSERT)."""
    eng = _eng(spark, sf_dir, "region")
    eng.query("DROP TABLE IF EXISTS dml_trg_t")
    eng.query("DROP TABLE IF EXISTS dml_trg_audit")
    eng.query("CREATE TABLE dml_trg_t (id BIGINT PRIMARY KEY, "
              "name VARCHAR(64), tag VARCHAR(64))")
    eng.query("CREATE TABLE dml_trg_audit (id BIGINT, action VARCHAR(16))")
    eng.query("CREATE TRIGGER dml_trg_bi BEFORE INSERT ON dml_trg_t "
              "FOR EACH ROW SET NEW.tag = CONCAT('T-', NEW.name)")
    eng.query("CREATE TRIGGER dml_trg_ai AFTER INSERT ON dml_trg_t "
              "FOR EACH ROW INSERT INTO dml_trg_audit VALUES (NEW.id, 'ins')")
    eng.query("INSERT INTO dml_trg_t (id, name) "
              "SELECT r_regionkey, r_name FROM region")
    return eng.query(
        "SELECT t.id, t.name, t.tag, a.action "
        "FROM dml_trg_t t JOIN dml_trg_audit a ON t.id = a.id ORDER BY t.id")


@query(
    "dml_generated_columns",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS a,
       CAST(CASE WHEN n_nationkey < 10 THEN n_regionkey * 10
                 ELSE n_regionkey END AS BIGINT) AS b,
       CAST(n_nationkey + CASE WHEN n_nationkey < 10 THEN n_regionkey * 10
                               ELSE n_regionkey END AS BIGINT) AS s
FROM nation
ORDER BY a
""",
)
def dml_generated_columns(spark, sf_dir):
    """GENERATED ALWAYS AS columns recompute on INSERT and UPDATE
    (reference sql/plan/virtual_column_table.go:1-99; write-time eval at
    engine.py:1229-1276)."""
    eng = _eng(spark, sf_dir, "nation")
    eng.query("DROP TABLE IF EXISTS dml_gen")
    eng.query("CREATE TABLE dml_gen (a BIGINT PRIMARY KEY, b BIGINT, "
              "s BIGINT GENERATED ALWAYS AS (a + b))")
    eng.query("INSERT INTO dml_gen (a, b) "
              "SELECT n_nationkey, n_regionkey FROM nation")
    eng.query("UPDATE dml_gen SET b = b * 10 WHERE a < 10")
    return eng.query("SELECT a, b, s FROM dml_gen ORDER BY a")


@query(
    "dml_replace_ignore_autoinc",
    oracle="""
SELECT CAST(id AS BIGINT) AS id, name FROM (VALUES
  (1, 'alpha'), (2, 'beta'), (3, 'replaced'), (4, 'delta')
) v(id, name)
ORDER BY id
""",
)
def dml_replace_ignore_autoinc(spark, sf_dir):
    """AUTO_INCREMENT assignment, INSERT IGNORE (duplicate PK dropped),
    REPLACE (delete+insert) — reference sql/plan/insert.go REPLACE/IGNORE
    paths, memory/table_editor.go auto-inc."""
    eng = _eng(spark, sf_dir, "nation")
    eng.query("DROP TABLE IF EXISTS dml_auto")
    eng.query("CREATE TABLE dml_auto (id BIGINT PRIMARY KEY AUTO_INCREMENT, "
              "name VARCHAR(64))")
    eng.query("INSERT INTO dml_auto (name) VALUES ('alpha'), ('beta'), ('gamma')")
    eng.query("INSERT IGNORE INTO dml_auto VALUES (2, 'dup-ignored')")
    eng.query("REPLACE INTO dml_auto VALUES (3, 'replaced')")
    eng.query("INSERT INTO dml_auto (name) VALUES ('delta')")
    return eng.query("SELECT id, name FROM dml_auto ORDER BY id")


@query(
    "ddl_ctas_alter_default",
    oracle="""
SELECT n_nationkey AS k,
       CAST(CASE WHEN n_nationkey < 5 THEN 1 ELSE 7 END AS BIGINT) AS flag
FROM nation
ORDER BY k
""",
)
def ddl_ctas_alter_default(spark, sf_dir):
    """CREATE TABLE AS SELECT, ALTER TABLE ADD COLUMN ... DEFAULT
    (backfills existing rows), UPDATE, DROP COLUMN — reference
    sql/plan/ddl.go / alter surface."""
    eng = _eng(spark, sf_dir, "nation")
    eng.query("DROP TABLE IF EXISTS ddl_ctas")
    eng.query("CREATE TABLE ddl_ctas AS "
              "SELECT n_nationkey AS k, n_name AS name FROM nation")
    eng.query("ALTER TABLE ddl_ctas ADD COLUMN flag BIGINT DEFAULT 7")
    eng.query("UPDATE ddl_ctas SET flag = 1 WHERE k < 5")
    eng.query("ALTER TABLE ddl_ctas DROP COLUMN name")
    return eng.query("SELECT k, flag FROM ddl_ctas ORDER BY k")


@query(
    "dml_update_delete_order_limit",
    oracle="""
WITH bumped AS (
  -- UPDATE ... ORDER BY n_nationkey DESC LIMIT 5: the 5 highest keys
  SELECT CAST(n_nationkey AS BIGINT) AS k,
         CAST(CASE WHEN n_nationkey >= 20 THEN n_regionkey + 100
                   ELSE n_regionkey END AS BIGINT) AS v
  FROM nation
)
-- DELETE ... ORDER BY k LIMIT 3: drops keys 0, 1, 2
SELECT k, v FROM bumped WHERE k >= 3 ORDER BY k
""",
)
def dml_update_delete_order_limit(spark, sf_dir):
    """UPDATE/DELETE with ORDER BY + LIMIT touch only the first n rows in
    order (reference sql/plan/update.go / delete.go SortFields+Limit);
    nation has keys 0..24, so the update hits 20..24 and the delete 0..2."""
    eng = _eng(spark, sf_dir, "nation")
    eng.query("DROP TABLE IF EXISTS dml_obl")
    eng.query("CREATE TABLE dml_obl (k BIGINT PRIMARY KEY, v BIGINT)")
    eng.query("INSERT INTO dml_obl SELECT n_nationkey, n_regionkey FROM nation")
    eng.query("UPDATE dml_obl SET v = v + 100 ORDER BY k DESC LIMIT 5")
    eng.query("DELETE FROM dml_obl ORDER BY k LIMIT 3")
    return eng.query("SELECT k, v FROM dml_obl ORDER BY k")


@query(
    "dml_signal_validation_trigger",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS id,
       CAST(n_regionkey * 10 AS BIGINT) AS credit
FROM nation
WHERE n_regionkey * 10 >= 10
ORDER BY id
""",
)
def dml_signal_validation_trigger(spark, sf_dir):
    """BEFORE INSERT validation trigger (IF cond THEN SIGNAL SQLSTATE ...):
    a statement containing any row below the credit floor aborts whole
    (MySQL statement atomicity). One bulk INSERT ... SELECT of the passing
    rows succeeds; a bulk insert of everything (bad rows included) and a
    two-row batch with one violator both abort and change nothing. Final
    state = nations with credit >= 10 (reference sql/plan/trigger.go +
    signal.go)."""
    eng = _eng(spark, sf_dir, "nation")
    eng.query("DROP TABLE IF EXISTS dml_sig")
    eng.query("CREATE TABLE dml_sig (id BIGINT PRIMARY KEY, credit BIGINT)")
    eng.query(
        "CREATE TRIGGER dml_sig_chk BEFORE INSERT ON dml_sig FOR EACH ROW "
        "IF NEW.credit < 10 THEN "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'credit floor'; END IF")
    from ..engine import SqlError
    # whole-corpus insert contains region-0 rows -> statement aborts, table
    # stays empty
    try:
        eng.query("INSERT INTO dml_sig "
                  "SELECT n_nationkey, n_regionkey * 10 FROM nation")
        raise AssertionError("violating bulk insert must abort")
    except SqlError:
        pass
    eng.query("INSERT INTO dml_sig SELECT n_nationkey, n_regionkey * 10 "
              "FROM nation WHERE n_regionkey * 10 >= 10")
    try:
        eng.query("INSERT INTO dml_sig VALUES (9001, 500), (9002, 3)")
        raise AssertionError("violating batch must abort")
    except SqlError:
        pass
    return eng.query("SELECT id, credit FROM dml_sig ORDER BY id")


@query(
    "dml_update_insert_ignore",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS id,
       CAST(CASE WHEN n_nationkey < 5 THEN 0
                 ELSE LEAST(CAST(n_nationkey AS BIGINT) * 1000000000,
                            2147483647) END
            AS INTEGER) AS quota
FROM nation
ORDER BY id
""",
)
def dml_update_insert_ignore(spark, sf_dir):
    """IGNORE non-strict conversion end-state: INSERT IGNORE clamps an
    out-of-range INT to its type bound, UPDATE IGNORE turns NULL into the
    implicit default on a NOT NULL column — the whole statement succeeds
    with MySQL's warning semantics instead of erroring (reference
    sql/plan/insert.go / update.go Ignore + types/number.go non-strict)."""
    eng = _eng(spark, sf_dir, "nation")
    eng.query("DROP TABLE IF EXISTS dml_ign")
    eng.query("CREATE TABLE dml_ign (id BIGINT PRIMARY KEY, "
              "quota INT NOT NULL)")
    # n*1e9 overflows INT for n >= 3 → clamps to 2147483647 under IGNORE
    eng.query("INSERT IGNORE INTO dml_ign "
              "SELECT n_nationkey, CAST(n_nationkey AS SIGNED) * 1000000000 "
              "FROM nation")
    # NULL into NOT NULL under IGNORE → implicit default 0
    eng.query("UPDATE IGNORE dml_ign SET quota = NULL WHERE id < 5")
    return eng.query("SELECT id, quota FROM dml_ign ORDER BY id")
