"""Driver-gate mimic: every registered query must match its DuckDB
oracle at sf0.001 (row count + column names + canonicalized values).
The standalone harness (``python -m tests.oracle_harness``) is the
iteration tool; this keeps the gate inside the pytest suite."""

from __future__ import annotations

import pytest

from flash_cdc_spark.queries import QUERIES
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    result = compare(name, spark, sf_dir, duck)
    assert result["ok"], result


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
