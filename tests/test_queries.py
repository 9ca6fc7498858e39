"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from go_mysql_server_spark.plans import all_oracles, all_queries

from .conftest import SF_DIR
from .harness import compare, driver_incompatible_columns

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle):
    df = QUERIES[name](spark, SF_DIR)
    bad = driver_incompatible_columns(df)
    assert not bad, (
        f"{name}: driver canonicalizer cannot hash these columns "
        f"(array_join / to_json them): {bad}"
    )
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    rel = oracle.sql(ORACLES[name])
    problems = compare(df, rel)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_oracle_or_reason():
    missing = [n for n in QUERIES if n not in ORACLES]
    # keep the rows-only list intentional and small (sketches and iterative
    # float averaging are engine-specific; invariants asserted elsewhere)
    assert set(missing) <= {"agg_approx_count_distinct",
                            "similarity_kmeans_ivf"}, missing
