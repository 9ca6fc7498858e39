"""Reference WriteQueryTest golden sweeps (r6).

The reference's DML coverage largely ships as []WriteQueryTest entries:
an independent write statement over freshly-loaded standard fixtures,
a golden affected-row count, and a follow-up SELECT with golden rows
(enginetest/queries/replace_queries.go, delete_queries.go). Swept via
tests/script_golden_harness.run_write_tests."""

from __future__ import annotations

from pathlib import Path

import pytest

from .script_golden_harness import run_write_tests
from .test_goldens import FIXTURES

QDIR = Path("/root/reference/enginetest/queries")

WRITE_FIXTURES = dict(FIXTURES)
WRITE_FIXTURES["typestable"] = (
    "CREATE TABLE typestable (id bigint NOT NULL, i8 tinyint, "
    "i16 smallint, i32 int, i64 bigint, u8 tinyint unsigned, "
    "u16 smallint unsigned, u32 int unsigned, u64 bigint unsigned, "
    "f32 float, f64 double, ti timestamp, da date, te varchar(20), "
    "bo tinyint, js json, bl blob, e1 enum('', 'v1', 'v2'), "
    "s1 set('', 'v1', 'v2'), PRIMARY KEY (id))",
    "insert into typestable values (1,2,3,4,5,6,7,8,9,10.0,11.0,"
    "'2019-12-31 12:00:00','2019-12-31','fourteen', 0,null,null, '', '')",
)
SPATIAL_FIXTURES = {
    "point_table": (
        "create table point_table (i bigint primary key, p point NOT NULL)",
        "insert into point_table values (5, ST_GeomFromText('Point(1 2)'))",
    ),
    "line_table": (
        "create table line_table (i bigint primary key, "
        "l linestring NOT NULL)",
        "insert into line_table values "
        "(0, ST_GeomFromText('Linestring(1 2,3 4)')), "
        "(1, ST_GeomFromText('Linestring(1 2,3 4,5 6)'))",
    ),
    "polygon_table": (
        "create table polygon_table (i bigint primary key, "
        "p polygon NOT NULL)",
        "insert into polygon_table values "
        "(0, ST_GeomFromText('Polygon((0 0,0 1,1 1,0 0))')), "
        "(1, ST_GeomFromText('Polygon((0 0,0 1,1 1,0 0),"
        "(0 0,0 1,1 1,0 0))'))",
    ),
}

REPLACE_SKIP = ()
DELETE_SKIP = ()


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_replace_golden_writes(spark):
    ok, skipped, failures = run_write_tests(
        spark, QDIR / "replace_queries.go", WRITE_FIXTURES,
        skip=REPLACE_SKIP)
    assert ok >= 10, f"replace golden pass count regressed: {ok}"
    assert not failures, failures[:8]


@pytest.mark.skipif(not QDIR.exists(), reason="reference not present")
def test_delete_golden_writes(spark):
    fixtures = dict(WRITE_FIXTURES)
    fixtures.update(SPATIAL_FIXTURES)
    ok, skipped, failures = run_write_tests(
        spark, QDIR / "delete_queries.go", fixtures, skip=DELETE_SKIP)
    assert ok >= 40, f"delete golden pass count regressed: {ok}"
    assert not failures, failures[:8]
