"""Round-6 trigger/procedure semantics tests.

MySQL FOR EACH ROW sequencing (reference rowexec trigger iteration,
enginetest/queries/trigger_queries.go), statement atomicity when a
trigger fails mid-batch, PRECEDES/FOLLOWS ordering, OUT/INOUT procedure
parameters, SELECT INTO local variables."""

from __future__ import annotations

import pytest

from go_mysql_server_spark.engine import Engine, SqlError


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_before_insert_sees_prior_row_side_effects(eng):
    eng.query("create table a (i bigint primary key, j bigint)")
    eng.query("create table b (x bigint primary key)")
    eng.query("create trigger trig before insert on a for each row "
              "begin set new.j = (select coalesce(max(x),1) from b); "
              "update b set x = x + 1; end;")
    eng.query("insert into b values (1)")
    eng.query("insert into a values (1,0), (2,0), (3,0)")
    assert rows(eng.query("select * from a order by i")) == [
        (1, 1), (2, 2), (3, 3)]
    assert rows(eng.query("select x from b")) == [(4,)]


def test_trigger_error_mid_batch_rolls_back_statement(eng):
    eng.query("create table t (i bigint primary key)")
    eng.query("create table log1 (v bigint)")
    eng.query("create trigger tr before insert on t for each row begin "
              "insert into log1 values (new.i); "
              "if new.i > 1 then signal sqlstate '45000' "
              "set message_text = 'too big'; end if; end;")
    with pytest.raises(SqlError):
        eng.query("insert into t values (1), (2), (3)")
    # nothing inserted, and row 1's trigger side effect rolled back
    assert rows(eng.query("select count(*) as n from t")) == [(0,)]
    assert rows(eng.query("select count(*) as n from log1")) == [(0,)]


def test_precedes_follows_ordering(eng):
    eng.query("create table p (x bigint primary key)")
    eng.query("create trigger a1 before insert on p for each row "
              "set new.x = new.x * 2")
    eng.query("create trigger a2 before insert on p for each row "
              "precedes a1 set new.x = new.x + 10")
    eng.query("insert into p values (1)")
    # a2 runs first: (1+10)*2 = 22 (not 1*2+10 = 12)
    assert rows(eng.query("select x from p")) == [(22,)]


def test_before_delete_side_effects_row_order(eng):
    eng.query("create table a (x bigint primary key)")
    eng.query("create table b (y bigint primary key)")
    eng.query("create trigger tr before delete on a for each row begin "
              "insert into b values (old.x * 2 + 1); end;")
    eng.query("insert into a values (1), (2), (3)")
    eng.query("delete from a")
    assert rows(eng.query("select y from b order by 1")) == [
        (3,), (5,), (7,)]
    assert rows(eng.query("select count(*) as n from a")) == [(0,)]


def test_after_update_old_and_new_bound(eng):
    eng.query("create table a (x bigint primary key)")
    eng.query("create table b (o bigint, n bigint)")
    eng.query("create trigger tr after update on a for each row begin "
              "insert into b values (old.x, new.x); end;")
    eng.query("insert into a values (1), (5)")
    eng.query("update a set x = x * 10")
    assert rows(eng.query("select o, n from b order by o")) == [
        (1, 10), (5, 50)]


def test_update_with_table_alias(eng):
    eng.query("create table test (i bigint primary key, j bigint)")
    eng.query("insert into test values (1, 1)")
    eng.query("update test t set t.j = 200 where t.i = 1")
    assert rows(eng.query("select j from test")) == [(200,)]


def test_nested_triggers_cascade(eng):
    eng.query("create table a (x bigint primary key)")
    eng.query("create table b (y bigint primary key)")
    eng.query("create table c (z bigint primary key)")
    eng.query("create trigger ta before delete on a for each row begin "
              "delete from b where y = old.x * 10; end;")
    eng.query("create trigger tb before delete on b for each row begin "
              "delete from c where z = old.y * 10; end;")
    eng.query("insert into a values (1)")
    eng.query("insert into b values (10)")
    eng.query("insert into c values (100)")
    eng.query("delete from a where x = 1")
    assert rows(eng.query("select count(*) as n from b")) == [(0,)]
    assert rows(eng.query("select count(*) as n from c")) == [(0,)]


def test_drop_table_drops_its_triggers(eng):
    eng.query("create table dt1 (x bigint primary key)")
    eng.query("create trigger dtr before insert on dt1 for each row "
              "set new.x = new.x + 1")
    eng.query("drop table dt1")
    got = rows(eng.query(
        "select trigger_name from information_schema.triggers "
        "where trigger_name = 'dtr'"))
    assert got == []


# -- procedures


def test_out_param_writeback(eng):
    eng.query("CREATE PROCEDURE po(OUT res VARCHAR(100), a INT, b INT) "
              "BEGIN IF a < b THEN SET res = 'lt'; "
              "ELSE SET res = 'ge'; END IF; END")
    eng.query("CALL po(@r, 1, 2)")
    assert rows(eng.query("SELECT @r")) == [("lt",)]
    eng.query("CALL po(@r, 7, 4)")
    assert rows(eng.query("SELECT @r")) == [("ge",)]


def test_out_param_starts_null(eng):
    eng.query("SET @v = 'preset'")
    eng.query("CREATE PROCEDURE pn(OUT o VARCHAR(20)) "
              "BEGIN SET @seen = o; SET o = 'done'; END")
    eng.query("CALL pn(@v)")
    assert rows(eng.query("SELECT @seen, @v")) == [(None, "done")]


def test_select_into_local_var(eng):
    eng.query("create table inv (id bigint primary key, shelf bigint)")
    eng.query("insert into inv values (1,1),(2,1),(3,1),(4,2)")
    eng.query("CREATE PROCEDURE cnt(IN s INT, OUT total INT) BEGIN "
              "SELECT COUNT(*) INTO total FROM inv WHERE shelf = s; END")
    eng.query("CALL cnt(1, @total)")
    assert rows(eng.query("SELECT @total")) == [(3,)]


def test_proc_typed_params_and_characteristics(eng):
    eng.query("create table items (id bigint primary key auto_increment,"
              " item varchar(100))")
    eng.query("CREATE PROCEDURE add_item(item VARCHAR(100)) "
              "MODIFIES SQL DATA INSERT INTO items (item) VALUES (item)")
    eng.query("CALL add_item('A test item')")
    assert rows(eng.query("select * from items")) == [(1, "A test item")]


def test_repeat_over_user_variable(eng):
    eng.query("CREATE PROCEDURE pr(p1 INT) BEGIN SET @x = 0; "
              "REPEAT SET @x = @x + 1; UNTIL @x > p1 END REPEAT; END")
    eng.query("CALL pr(2)")
    assert rows(eng.query("SELECT @x")) == [(3,)]


def test_cursor_reopen_after_close(eng):
    eng.query("create table ct (i bigint primary key)")
    eng.query("insert into ct values (1), (2)")
    eng.query("CREATE PROCEDURE pc() BEGIN "
              "DECLARE v INT; "
              "DECLARE cur1 CURSOR FOR SELECT i FROM ct ORDER BY i; "
              "OPEN cur1; FETCH cur1 INTO v; CLOSE cur1; "
              "OPEN cur1; FETCH cur1 INTO v; CLOSE cur1; "
              "SET @got = v; END")
    eng.query("CALL pc()")
    assert rows(eng.query("SELECT @got")) == [(1,)]
