"""Expose the scalar library to ``spark.sql`` as SQL UDFs (Spark 4
``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>``).

Each SQL body mirrors the Column helper exactly, so DataFrame pipelines and
ad-hoc SQL share one semantics. SQL UDFs are inlined by Catalyst (no
black-box UDF cost).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_RUT_DV_BODY = r"""
    CASE 11 - ((
        2 * CAST(substring(lpad(body, 8, '0'), 8, 1) AS INT) +
        3 * CAST(substring(lpad(body, 8, '0'), 7, 1) AS INT) +
        4 * CAST(substring(lpad(body, 8, '0'), 6, 1) AS INT) +
        5 * CAST(substring(lpad(body, 8, '0'), 5, 1) AS INT) +
        6 * CAST(substring(lpad(body, 8, '0'), 4, 1) AS INT) +
        7 * CAST(substring(lpad(body, 8, '0'), 3, 1) AS INT) +
        2 * CAST(substring(lpad(body, 8, '0'), 2, 1) AS INT) +
        3 * CAST(substring(lpad(body, 8, '0'), 1, 1) AS INT)) % 11)
    WHEN 11 THEN '0' WHEN 10 THEN 'K'
    ELSE CAST(11 - ((
        2 * CAST(substring(lpad(body, 8, '0'), 8, 1) AS INT) +
        3 * CAST(substring(lpad(body, 8, '0'), 7, 1) AS INT) +
        4 * CAST(substring(lpad(body, 8, '0'), 6, 1) AS INT) +
        5 * CAST(substring(lpad(body, 8, '0'), 5, 1) AS INT) +
        6 * CAST(substring(lpad(body, 8, '0'), 4, 1) AS INT) +
        7 * CAST(substring(lpad(body, 8, '0'), 3, 1) AS INT) +
        2 * CAST(substring(lpad(body, 8, '0'), 2, 1) AS INT) +
        3 * CAST(substring(lpad(body, 8, '0'), 1, 1) AS INT)) % 11) AS STRING)
    END
"""

_DEFS: list[str] = [
    r"""CREATE OR REPLACE TEMPORARY FUNCTION normalize_spaces(s STRING)
        RETURNS STRING RETURN trim(regexp_replace(s, '\\s+', ' '))""",
    r"""CREATE OR REPLACE TEMPORARY FUNCTION empty_to_null(s STRING)
        RETURNS STRING RETURN nullif(trim(s), '')""",
    r"""CREATE OR REPLACE TEMPORARY FUNCTION safe_parse_date(s STRING)
        RETURNS DATE RETURN coalesce(
            try_to_date(trim(split(s, ',')[0]), 'yyyy-M-d'),
            try_to_date(trim(split(s, ',')[0]), 'd-M-yyyy'),
            try_to_date(trim(split(s, ',')[0]), 'd/M/yyyy'))""",
    r"""CREATE OR REPLACE TEMPORARY FUNCTION status_to_boolean(s STRING)
        RETURNS BOOLEAN RETURN coalesce(
            lower(trim(regexp_replace(s, '\\s+', ' '))) = 'aprobada', false)""",
    r"""CREATE OR REPLACE TEMPORARY FUNCTION string_to_boolean(s STRING)
        RETURNS BOOLEAN RETURN coalesce(
            lower(trim(s)) IN ('true', 'verdadero', 'si'), false)""",
    r"""CREATE OR REPLACE TEMPORARY FUNCTION parse_int_or_null(s STRING)
        RETURNS INT RETURN nullif(
            try_cast(nullif(regexp_extract(trim(s), '^[-+]?\\d+', 0), '')
                     AS INT), 0)""",
    r"""CREATE OR REPLACE TEMPORARY FUNCTION parse_float_or_null(s STRING)
        RETURNS DOUBLE RETURN nullif(
            try_cast(nullif(regexp_extract(trim(s),
                '^[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?', 0), '')
                     AS DOUBLE), 0.0d)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION rut_check_digit(body STRING)
        RETURNS STRING RETURN {_RUT_DV_BODY}""",
    r"""CREATE OR REPLACE TEMPORARY FUNCTION rut_is_valid(s STRING)
        RETURNS BOOLEAN RETURN coalesce(
            trim(s) RLIKE '^(\\d{1,3}(\\.\\d{3}){0,2}|\\d{7,8})-[0-9Kk]$'
            AND length(regexp_replace(split(trim(s), '-')[0], '\\.', ''))
                BETWEEN 7 AND 8
            AND upper(split(trim(s), '-')[1]) = rut_check_digit(
                regexp_replace(split(trim(s), '-')[0], '\\.', '')), false)""",
    r"""CREATE OR REPLACE TEMPORARY FUNCTION format_rut(s STRING)
        RETURNS STRING RETURN CASE WHEN rut_is_valid(s)
            THEN concat_ws('-',
                 regexp_replace(split(trim(s), '-')[0], '\\.', ''),
                 upper(split(trim(s), '-')[1])) END""",
]


def register_all(spark: SparkSession) -> None:
    """Create the temporary SQL functions in the session."""
    for ddl in _DEFS:
        spark.sql(ddl)
