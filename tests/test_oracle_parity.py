"""Differential test: every registered query with an oracle twin must match
DuckDB on the same parquet inputs (SURVEY §5.2). Queries without an oracle get
a rows-only smoke (the driver applies the same weaker check)."""

from __future__ import annotations

import pytest

from data_pipeline_aws_spark import all_oracles, all_queries
from tests.conftest import assert_parity


def _names():
    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_query_parity(name, spark, duck, sf_dir):
    fn = all_queries()[name]
    sdf = fn(spark, sf_dir)
    sql = all_oracles().get(name)
    if sql is None:
        # rows-only: plan executes, schema is stable, row count deterministic
        n1 = sdf.count()
        n2 = fn(spark, sf_dir).count()
        assert n1 == n2
        return
    assert_parity(sdf, duck.execute(sql).fetchdf())


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(k in e.queries() for k in e.oracle_sql()), "oracle keys ⊆ query keys"
