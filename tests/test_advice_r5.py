"""Regression tests for the round-5 ADVICE findings (literal-safety in
INSERT RETURNING/ODKU detection, aliased indexed MATCH binding, REPLACE
unique-secondary-index delete-then-insert, CHECK clause rendering with
string literals, qualified enum arithmetic)."""

from __future__ import annotations

import pytest

from go_mysql_server_spark.engine import Engine, OkResult, SqlError


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def rows(df):
    return [tuple(r) for r in df.collect()]


# --- ADVICE 1: RETURNING / ON DUPLICATE KEY UPDATE inside string literals


def test_insert_literal_containing_returning_word(eng):
    eng.query("CREATE TABLE t1 (i BIGINT PRIMARY KEY, s VARCHAR(100))")
    eng.query("INSERT INTO t1 VALUES (1, 'see RETURNING docs')")
    assert rows(eng.query("SELECT s FROM t1")) == [("see RETURNING docs",)]


def test_insert_literal_containing_odku_words(eng):
    eng.query("CREATE TABLE t2 (i BIGINT PRIMARY KEY, s VARCHAR(100))")
    eng.query(
        "INSERT INTO t2 VALUES (1, 'read ON DUPLICATE KEY UPDATE x=1 docs')")
    got = rows(eng.query("SELECT s FROM t2"))
    assert got == [("read ON DUPLICATE KEY UPDATE x=1 docs",)]


def test_insert_returning_still_works(eng):
    eng.query("CREATE TABLE t3 (i BIGINT PRIMARY KEY, s VARCHAR(100))")
    got = rows(eng.query("INSERT INTO t3 VALUES (7, 'x') RETURNING i, s"))
    assert got == [(7, "x")]


def test_insert_odku_still_works(eng):
    eng.query("CREATE TABLE t4 (i BIGINT PRIMARY KEY, n BIGINT)")
    eng.query("INSERT INTO t4 VALUES (1, 10)")
    eng.query("INSERT INTO t4 VALUES (1, 99) "
              "ON DUPLICATE KEY UPDATE n = n + 1")
    assert rows(eng.query("SELECT n FROM t4")) == [(11,)]


# --- ADVICE 2: indexed MATCH binds through aliases / subquery tables


@pytest.fixture()
def ft_eng(eng):
    eng.query("CREATE TABLE docs_ft (k BIGINT PRIMARY KEY, "
              "content TEXT, FULLTEXT idx_c (content))")
    eng.query("INSERT INTO docs_ft VALUES "
              "(1, 'spark engine analytics'), "
              "(2, 'postgres engine'), (3, 'nothing here')")
    return eng


def test_match_on_aliased_table(ft_eng):
    got = rows(ft_eng.query(
        "SELECT d.k FROM docs_ft d "
        "WHERE MATCH(d.content) AGAINST('engine') ORDER BY d.k"))
    assert got == [(1,), (2,)]


def test_match_on_aliased_table_unqualified_cols(ft_eng):
    got = rows(ft_eng.query(
        "SELECT k FROM docs_ft d "
        "WHERE MATCH(content) AGAINST('analytics')"))
    assert got == [(1,)]


def test_match_in_subquery_over_other_table(ft_eng):
    ft_eng.query("CREATE TABLE refs (k BIGINT PRIMARY KEY)")
    ft_eng.query("INSERT INTO refs VALUES (1),(2),(3)")
    got = rows(ft_eng.query(
        "SELECT r.k FROM refs r WHERE r.k IN "
        "(SELECT k FROM docs_ft WHERE MATCH(content) AGAINST('engine')) "
        "ORDER BY r.k"))
    assert got == [(1,), (2,)]


# --- ADVICE 3: REPLACE deletes rows clashing on unique secondary index


def test_replace_unique_secondary_index_clash(eng):
    eng.query("CREATE TABLE u1 (i BIGINT PRIMARY KEY, "
              "email VARCHAR(50), UNIQUE KEY uq_email (email))")
    eng.query("INSERT INTO u1 VALUES (1, 'a@x.com'), (2, 'b@x.com')")
    # new pk (3) but clashing email: MySQL REPLACE deletes row 1 first
    eng.query("REPLACE INTO u1 VALUES (3, 'a@x.com')")
    got = rows(eng.query("SELECT i, email FROM u1 ORDER BY i"))
    assert got == [(2, "b@x.com"), (3, "a@x.com")]


def test_replace_unique_index_batch_last_wins(eng):
    eng.query("CREATE TABLE u2 (i BIGINT PRIMARY KEY, "
              "email VARCHAR(50), UNIQUE KEY uq (email))")
    eng.query("REPLACE INTO u2 VALUES (1, 'z@x.com'), (2, 'z@x.com')")
    got = rows(eng.query("SELECT i, email FROM u2"))
    assert got == [(2, "z@x.com")]


def test_replace_both_pk_and_unique_clash(eng):
    eng.query("CREATE TABLE u3 (i BIGINT PRIMARY KEY, "
              "email VARCHAR(50), UNIQUE KEY uq (email))")
    eng.query("INSERT INTO u3 VALUES (1, 'a@x.com'), (2, 'b@x.com')")
    # clashes pk of row 1 AND unique email of row 2 -> both deleted
    eng.query("REPLACE INTO u3 VALUES (1, 'b@x.com')")
    got = rows(eng.query("SELECT i, email FROM u3"))
    assert got == [(1, "b@x.com")]


def test_plain_insert_unique_clash_still_errors(eng):
    eng.query("CREATE TABLE u4 (i BIGINT PRIMARY KEY, "
              "email VARCHAR(50), UNIQUE KEY uq (email))")
    eng.query("INSERT INTO u4 VALUES (1, 'a@x.com')")
    with pytest.raises(SqlError):
        eng.query("INSERT INTO u4 VALUES (2, 'a@x.com')")


# --- ADVICE 4: CHECK clause rendering must not backtick literal content


def test_check_constraint_clause_preserves_string_literals(eng):
    eng.query("CREATE TABLE c1 (status VARCHAR(10), "
              "CONSTRAINT st_chk CHECK (status IN ('new','old')))")
    got = rows(eng.query(
        "SELECT CHECK_CLAUSE FROM information_schema.CHECK_CONSTRAINTS "
        "WHERE CONSTRAINT_NAME = 'st_chk'"))
    assert len(got) == 1
    clause = got[0][0]
    assert "'new'" in clause and "'old'" in clause
    assert "`new`" not in clause and "`old`" not in clause
    assert "`status`" in clause


# --- ADVICE 5: qualified enum references in numeric context


@pytest.fixture()
def enum_eng(eng):
    eng.query("CREATE TABLE e1 (i BIGINT PRIMARY KEY, "
              "sz ENUM('small','medium','large'))")
    eng.query("INSERT INTO e1 VALUES (1,'small'),(2,'large'),(3,'medium')")
    return eng


def test_enum_arith_qualified_by_table(enum_eng):
    got = rows(enum_eng.query(
        "SELECT i, e1.sz + 0 AS ord FROM e1 ORDER BY i"))
    assert got == [(1, 1), (2, 3), (3, 2)]


def test_enum_arith_qualified_by_alias(enum_eng):
    got = rows(enum_eng.query(
        "SELECT t.i, t.sz + 0 AS ord FROM e1 t ORDER BY t.i"))
    assert got == [(1, 1), (2, 3), (3, 2)]


def test_enum_arith_bare_still_works(enum_eng):
    got = rows(enum_eng.query(
        "SELECT i, sz + 0 AS ord FROM e1 ORDER BY i"))
    assert got == [(1, 1), (2, 3), (3, 2)]


def test_enum_arith_foreign_qualifier_untouched(enum_eng):
    # a same-named column on ANOTHER table must not be rewritten
    enum_eng.query("CREATE TABLE other_e (i BIGINT PRIMARY KEY, "
                   "sz BIGINT)")
    enum_eng.query("INSERT INTO other_e VALUES (1, 100)")
    got = rows(enum_eng.query(
        "SELECT o.sz + 1 AS v FROM e1 JOIN other_e o ON e1.i = o.i"))
    assert got == [(101,)]
