"""Scalar function library (SURVEY.md §2.7, F1-F12).

All functions are pure Column expressions (JVM-side, whole-stage-codegen
friendly) — no Python row UDFs anywhere. They are also registered for
``spark.sql`` use via :func:`register_all`.
"""

from gcp_datalake_pipeline_spark.functions.cleaning import (
    empty_to_null,
    normalize_spaces,
    parse_float_or_null,
    parse_int_or_null,
    safe_parse_date,
    status_to_boolean,
    string_to_boolean,
)
from gcp_datalake_pipeline_spark.functions.rut import (
    format_rut,
    rut_check_digit,
    rut_is_valid,
)
from gcp_datalake_pipeline_spark.functions.registry import register_all

__all__ = [
    "normalize_spaces",
    "safe_parse_date",
    "status_to_boolean",
    "string_to_boolean",
    "parse_int_or_null",
    "parse_float_or_null",
    "empty_to_null",
    "rut_is_valid",
    "rut_check_digit",
    "format_rut",
    "register_all",
]
