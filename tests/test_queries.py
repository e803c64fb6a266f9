"""Correctness-gate rehearsal: every oracled query must match DuckDB at
sf0.001 (the driver runs the same compare at sf0.01)."""

import pytest

from gcp_datalake_pipeline_spark.plans import QUERIES
from gcp_datalake_pipeline_spark.plans.compare import (
    compare_query,
    duckdb_connection,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle])
def test_query_matches_oracle(spark, con, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    result = compare_query(spark, con, name, df, q.oracle)
    assert result.ok, result.detail


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if not q.oracle])
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    """The driver's smoke check: entry(spark) returns rows with a schema."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
