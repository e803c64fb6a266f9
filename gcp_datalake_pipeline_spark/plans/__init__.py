"""Query plan library: the engine's generic relational surface, exposed as
(name -> DataFrame builder) plus a DuckDB oracle SQL string per query."""

from gcp_datalake_pipeline_spark.plans.queries import QUERIES, Query, load_table
from gcp_datalake_pipeline_spark.plans import analytics_queries  # noqa: F401  (registers)
from gcp_datalake_pipeline_spark.plans import curation_queries  # noqa: F401  (registers)
from gcp_datalake_pipeline_spark.plans import data_queries  # noqa: F401  (registers)
from gcp_datalake_pipeline_spark.plans import etl_queries  # noqa: F401  (registers)
from gcp_datalake_pipeline_spark.plans import function_queries  # noqa: F401  (registers)
from gcp_datalake_pipeline_spark.plans import temporal_queries  # noqa: F401  (registers)
from gcp_datalake_pipeline_spark.plans import tpch_extra  # noqa: F401  (registers)
from gcp_datalake_pipeline_spark.plans import training_queries  # noqa: F401  (registers)
from gcp_datalake_pipeline_spark.plans import tpch_extra2  # noqa: F401  (registers)
from gcp_datalake_pipeline_spark.plans import tpch_extra3  # noqa: F401  (registers)

__all__ = ["QUERIES", "Query", "load_table"]
