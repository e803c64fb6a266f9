"""Physical-plan contracts: the plan shapes the 100 TB stance depends on
must survive refactors. These assert on executedPlan strings — cheap, no
data materialized (explain only)."""

import pytest

from gcp_datalake_pipeline_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume"],
)
def test_filters_reach_parquet_scan(spark, name):
    """Predicates must push into the scan (PushedFilters non-empty)."""
    plan = _plan(spark, name)
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan.replace("PushedFilters: [],", "X")


@pytest.mark.parametrize(
    "name", ["q3_shipping_priority", "q5_local_supplier_volume", "q10_top_returning_customers"]
)
def test_dim_joins_broadcast(spark, name):
    """Dimension joins must be broadcast, never shuffle both sides."""
    assert "BroadcastHashJoin" in _plan(spark, name)


def test_topk_prunes_before_exchange(spark):
    """Per-group top-k must use partial WindowGroupLimit (only k rows per
    partition reach the shuffle)."""
    plan = _plan(spark, "ann_topk")
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_q1_scan_prunes_columns(spark):
    """The q1 scan must read only referenced lineitem columns (ReadSchema
    pruned), not the full 16-column row."""
    plan = _plan(spark, "q1_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_comment" not in scan and "l_partkey" not in scan


def test_no_accidental_cartesian_products(spark):
    """Only deliberate broadcast nested loops (tiny query/centroid sides in
    the ANN family, scalar-count crossJoins) may appear; a plain
    CartesianProduct anywhere is a regression."""
    for name in QUERIES:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_surrogate_assignment_not_single_partition(spark):
    plan = _plan(spark, "etl_dim_surrogate_assignment")
    assert "SinglePartition" not in plan
