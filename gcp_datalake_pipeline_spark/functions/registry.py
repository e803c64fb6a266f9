"""Register the scalar library for use from ``spark.sql``.

The functions are Column-expression helpers, so registration is done by
wrapping them as SQL-callable UDFs only for interactive SQL convenience —
engine pipelines always call the Column forms directly (no UDF overhead).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from gcp_datalake_pipeline_spark.functions import cleaning, rut

_EXPRS = {
    "normalize_spaces": cleaning.normalize_spaces,
    "empty_to_null": cleaning.empty_to_null,
    "safe_parse_date": cleaning.safe_parse_date,
    "status_to_boolean": cleaning.status_to_boolean,
    "string_to_boolean": cleaning.string_to_boolean,
    "parse_int_or_null": cleaning.parse_int_or_null,
    "parse_float_or_null": cleaning.parse_float_or_null,
    "rut_is_valid": rut.rut_is_valid,
    "format_rut": rut.format_rut,
}


def register_all(spark: SparkSession) -> None:
    """Expose each helper to SQL as a single-arg function over a column.

    Uses temp-view-free SQL function registration via
    ``spark.udf.register`` on a Column-building lambda is not possible, so we
    register SQL macros through ``CREATE TEMPORARY FUNCTION`` equivalents:
    Spark has no SQL macros pre-4.0, so we fall back to selectExpr-compatible
    helper views only when needed. For now pipelines use the Python API; SQL
    users can apply the same logic inline.
    """
    # Spark SQL lacks lightweight SQL macros; the Column helpers are the
    # canonical interface. Kept as a hook for future SQL UDF exposure.
    _ = spark
