"""Driver-oracle entries for the round-6 surface: row-sequential trigger
execution and the wire-protocol/DB-API front (VERDICT r6, task 3).

Both are end-state entries in the dml_catalog style: the Spark side runs a
deterministic script through the real execution path (the row-sequential
trigger interpreter at engine.py `_run_row_triggers`; the TCP wire server +
PEP 249 driver in server/ and dbapi.py) and returns the final table state;
the DuckDB oracle computes the same final state declaratively from the
parquet inputs.

Reference parity: FOR EACH ROW sequencing per sql/plan/trigger.go and the
trigger blocks of enginetest/queries/script_queries.go (each row's BEFORE
trigger observes the side effects of the previous row's); the wire
round-trip mirrors server/handler.go ComQuery/ComPrepare driving the engine
end-to-end.
"""

from __future__ import annotations

from ..engine import Engine
from ._util import t
from .registry import query


def _eng(spark, sf_dir, *tables: str) -> Engine:
    for name in tables:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return Engine(spark)


@query(
    "dml_trigger_row_sequencing",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nk,
       n_name AS nname,
       CAST(ROW_NUMBER() OVER (ORDER BY n_nationkey)
            + n_nationkey * 100 AS BIGINT) AS seq
FROM nation
WHERE n_nationkey < 10
ORDER BY nk
""",
)
def dml_trigger_row_sequencing(spark, sf_dir):
    """Row-order-visible BEFORE INSERT trigger: the body increments a
    session counter (@trig_ctr) and folds the running value into NEW, so
    each inserted row observes every previous row's side effect (MySQL
    FOR EACH ROW semantics — reference sql/plan/trigger.go; rowexec
    iterates the source row-at-a-time; trigger blocks in
    enginetest/queries/script_queries.go). The static classifier
    (engine._trigger_vectorizable) must route this body to the
    row-sequential interpreter: a vectorized evaluation would give every
    row the same counter value and hash-mismatch the oracle. Row count is
    bounded (10) — the interpreter is the OLTP path, not a scan path."""
    eng = _eng(spark, sf_dir, "nation")
    eng.query("DROP TABLE IF EXISTS trig_seq_t")
    eng.query("CREATE TABLE trig_seq_t (nk BIGINT PRIMARY KEY, "
              "nname VARCHAR(32), seq BIGINT)")
    eng.query(
        "CREATE TRIGGER trig_seq_bi BEFORE INSERT ON trig_seq_t "
        "FOR EACH ROW BEGIN "
        "SET @trig_ctr = @trig_ctr + 1; "
        "SET NEW.seq = @trig_ctr + NEW.nk * 100; "
        "END;")
    eng.query("SET @trig_ctr = 0")
    eng.query("INSERT INTO trig_seq_t "
              "SELECT n_nationkey, n_name, 0 FROM nation "
              "WHERE n_nationkey < 10 ORDER BY n_nationkey")
    return eng.query("SELECT nk, nname, seq FROM trig_seq_t ORDER BY nk")


@query(
    "wire_roundtrip_end_state",
    oracle="""
SELECT CAST(r_regionkey AS BIGINT) AS rk,
       UPPER(r_name) AS rname,
       CAST(-1 AS BIGINT) AS score
FROM region
WHERE r_regionkey <> 4
UNION ALL SELECT 100, 'WIRE-A', 10
UNION ALL SELECT 101, NULL, 20
ORDER BY rk
""",
)
def wire_roundtrip_end_state(spark, sf_dir):
    """End-to-end through the TCP wire front (server/server.py) with the
    binary prepared-statement path (COM_STMT_PREPARE/EXECUTE, typed
    int/string/NULL params) and a text DELETE, oracled on final table
    state. The script runs over a real socket on an ephemeral port —
    handshake, per-connection session, the statement lock, packet
    framing, and binary param binding are all in the verified path
    (reference server/handler.go ComQuery/ComPrepare → engine)."""
    from ..server.client import Client
    from ..server.server import MySQLServer

    eng = _eng(spark, sf_dir, "region")
    eng.query("DROP TABLE IF EXISTS wire_rt")
    srv = MySQLServer(eng, port=0)
    srv.start()
    try:
        cli = Client("127.0.0.1", srv.port)
        try:
            cli.query("CREATE TABLE wire_rt (rk BIGINT PRIMARY KEY, "
                      "rname VARCHAR(32), score BIGINT)")
            cli.query("INSERT INTO wire_rt "
                      "SELECT r_regionkey, UPPER(r_name), -1 FROM region")
            prep = cli.prepare("INSERT INTO wire_rt VALUES (?, ?, ?)")
            cli.execute(prep, (100, "WIRE-A", 10))
            cli.execute(prep, (101, None, 20))
            cli.stmt_close(prep)
            cli.query("DELETE FROM wire_rt WHERE rk = 4")
        finally:
            cli.close()
    finally:
        srv.close()
    return eng.query("SELECT rk, rname, score FROM wire_rt ORDER BY rk")


@query(
    "dbapi_roundtrip_end_state",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nk,
       LOWER(n_name) AS nname,
       CAST(n_regionkey * 10 AS BIGINT) AS score
FROM nation
WHERE n_nationkey < 8 AND n_nationkey <> 3
UNION ALL SELECT 200, 'dbapi-x', 77
UNION ALL SELECT 201, NULL, 88
ORDER BY nk
""",
)
def dbapi_roundtrip_end_state(spark, sf_dir):
    """End-to-end through the PEP 249 driver (dbapi.py): connect() /
    cursor() / qmark parameter binding / executemany / the transaction
    context manager (commit on clean exit, rollback on error), oracled on
    final table state — the embedding-API twin of
    `wire_roundtrip_end_state` (reference server/handler.go runs the same
    engine the Go sql.DB driver binds to). The rollback leg proves
    statement-level snapshot restore through the driver: a failed batch
    inside the context manager leaves no trace."""
    from .. import dbapi

    eng = _eng(spark, sf_dir, "nation")
    eng.query("DROP TABLE IF EXISTS dbapi_rt")
    conn = dbapi.connect(engine=eng)
    cur = conn.cursor()
    cur.execute("CREATE TABLE dbapi_rt (nk BIGINT PRIMARY KEY, "
                "nname VARCHAR(32), score BIGINT)")
    cur.execute("INSERT INTO dbapi_rt "
                "SELECT n_nationkey, LOWER(n_name), n_regionkey * 10 "
                "FROM nation WHERE n_nationkey < 8")
    cur.executemany("INSERT INTO dbapi_rt VALUES (?, ?, ?)",
                    [(200, "dbapi-x", 77), (201, None, 88)])
    cur.execute("DELETE FROM dbapi_rt WHERE nk = ?", (3,))
    # transaction context manager: the duplicate-key failure rolls the
    # whole block back — row 500 must NOT survive
    try:
        with conn:
            conn.begin()
            conn.cursor().execute(
                "INSERT INTO dbapi_rt VALUES (500, 'doomed', 0)")
            conn.cursor().execute(
                "INSERT INTO dbapi_rt VALUES (200, 'dup', 0)")
    except dbapi.Error:
        pass
    cur.execute("SELECT COUNT(*) FROM dbapi_rt")
    assert cur.fetchone() is not None
    conn.close()
    return eng.query("SELECT nk, nname, score FROM dbapi_rt ORDER BY nk")
