"""Wire-protocol server + DB-API driver tests.

Covers the reference's server/ surface (server_test.go behaviors: dial,
handshake, query round-trip, errors, USE, ping, concurrent connections)
and driver/ (driver_test.go: database/sql-style query/exec/params) —
re-expressed over the Spark Engine.
"""

from __future__ import annotations

import threading

import pytest

from go_mysql_server_spark import dbapi
from go_mysql_server_spark.engine import Engine
from go_mysql_server_spark.server import Client, MySQLClientError, \
    MySQLServer, OkStatus


@pytest.fixture(scope="module")
def srv(spark):
    eng = Engine(spark)
    eng.query("CREATE TABLE wt (i BIGINT PRIMARY KEY, s VARCHAR(20), "
              "d DOUBLE, ts TIMESTAMP)")
    eng.query("INSERT INTO wt VALUES (1, 'one', 1.5, "
              "'2024-01-02 03:04:05'), (2, NULL, -2.25, NULL)")
    server = MySQLServer(eng, port=0).start()
    yield server
    server.close()


@pytest.fixture()
def cli(srv):
    c = Client(srv.host, srv.port, user="root")
    yield c
    c.close()


def test_handshake_and_version(cli):
    assert cli.server_version.startswith("8.0.33")
    assert cli.ping()


def test_select_text_resultset(cli):
    rs = cli.query("SELECT i, s, d, ts FROM wt ORDER BY i")
    assert rs.columns == ["i", "s", "d", "ts"]
    assert rs.rows == [
        ("1", "one", "1.5", "2024-01-02 03:04:05"),
        ("2", None, "-2.25", None),
    ]


def test_ok_packet_affected_and_last_insert_id(cli):
    cli.query("CREATE TABLE wt2 (i BIGINT PRIMARY KEY AUTO_INCREMENT, "
              "s VARCHAR(10))")
    ok = cli.query("INSERT INTO wt2 (s) VALUES ('a'), ('b')")
    assert isinstance(ok, OkStatus)
    assert ok.affected == 2
    assert ok.last_insert_id >= 1
    rs = cli.query("SELECT COUNT(*) AS n FROM wt2")
    assert rs.rows == [("2",)]
    cli.query("DROP TABLE wt2")


def test_error_packet_has_errno_and_sqlstate(cli):
    with pytest.raises(MySQLClientError) as ei:
        cli.query("SELECT * FROM no_such_table_xyz")
    assert ei.value.errno >= 1000
    assert len(ei.value.sqlstate) == 5


def test_init_db_and_unknown_db(cli):
    cli.query("CREATE DATABASE IF NOT EXISTS wiredb")
    cli.select_db("wiredb")
    cli.query("CREATE TABLE wdt (x BIGINT)")
    cli.query("INSERT INTO wdt VALUES (42)")
    assert cli.query("SELECT x FROM wdt").rows == [("42",)]
    cli.select_db("mydb")
    with pytest.raises(MySQLClientError) as ei:
        cli.select_db("definitely_missing_db")
    assert ei.value.errno > 0


def test_connect_with_database(srv):
    c = Client(srv.host, srv.port, database="mydb")
    try:
        assert c.query("SELECT 1 + 1 AS two").rows == [("2",)]
    finally:
        c.close()


def test_concurrent_connections(srv):
    errs: list = []

    def worker(k: int):
        try:
            c = Client(srv.host, srv.port)
            got = c.query(f"SELECT {k} * 10 AS v").rows
            assert got == [(str(k * 10),)]
            c.close()
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=worker, args=(k,))
               for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs


def test_mysql_functions_over_wire(cli):
    rs = cli.query("SELECT CONCAT('a', 'b') AS c, IFNULL(NULL, 7) AS n, "
                   "JSON_EXTRACT('{\"k\": 3}', '$.k') AS j")
    assert rs.rows == [("ab", "7", "3")]


# -- DB-API 2.0 (reference driver/driver.go)


@pytest.fixture(scope="module")
def conn(spark):
    cn = dbapi.connect(spark)
    cur = cn.cursor()
    cur.execute("CREATE TABLE dbt (i BIGINT PRIMARY KEY, s VARCHAR(20))")
    cur.execute("INSERT INTO dbt VALUES (1, 'x'), (2, 'y')")
    yield cn
    cn.close()


def test_dbapi_select_description_and_rows(conn):
    cur = conn.cursor()
    cur.execute("SELECT i, s FROM dbt ORDER BY i")
    assert [d[0] for d in cur.description] == ["i", "s"]
    assert cur.fetchall() == [(1, "x"), (2, "y")]
    assert cur.fetchone() is None


def test_dbapi_qmark_params(conn):
    cur = conn.cursor()
    cur.execute("SELECT s FROM dbt WHERE i = ? OR s = ?", (2, "it's"))
    assert cur.fetchall() == [("y",)]


def test_dbapi_named_params(conn):
    cur = conn.cursor()
    cur.execute("SELECT s FROM dbt WHERE i = :k", {"k": 1})
    assert cur.fetchall() == [("x",)]


def test_dbapi_exec_rowcount_and_lastrowid(conn):
    cur = conn.cursor()
    cur.execute("CREATE TABLE dbt2 (i BIGINT PRIMARY KEY AUTO_INCREMENT,"
                " v BIGINT)")
    cur.execute("INSERT INTO dbt2 (v) VALUES (?)", (5,))
    assert cur.rowcount == 1
    assert cur.lastrowid == 1
    cur.executemany("INSERT INTO dbt2 (v) VALUES (?)", [(6,), (7,)])
    assert cur.rowcount == 2
    cur.execute("SELECT COUNT(*) AS n FROM dbt2")
    assert cur.fetchone() == (3,)
    cur.execute("DROP TABLE dbt2")


def test_dbapi_error_maps_to_database_error(conn):
    with pytest.raises(dbapi.DatabaseError):
        conn.cursor().execute("SELECT * FROM missing_tbl_abc")


def test_dbapi_transaction_context(conn):
    cur = conn.cursor()
    cur.execute("CREATE TABLE dbt3 (i BIGINT PRIMARY KEY)")
    conn.begin()
    cur.execute("INSERT INTO dbt3 VALUES (1)")
    conn.rollback()
    cur.execute("SELECT COUNT(*) AS n FROM dbt3")
    assert cur.fetchone() == (0,)
    conn.begin()
    cur.execute("INSERT INTO dbt3 VALUES (2)")
    conn.commit()
    cur.execute("SELECT COUNT(*) AS n FROM dbt3")
    assert cur.fetchone() == (1,)
    cur.execute("DROP TABLE dbt3")
