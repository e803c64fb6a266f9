"""Scalar-function parity queries (SURVEY.md §2.7, F1-F12) — each runs an
engine scalar function over strings synthesized from testdata columns and
is checked against a DuckDB oracle that encodes the reference semantics
independently.

This puts the function library itself under the driver's correctness gate
(the pytest edge-case suite covers inputs the testdata can't synthesize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.functions import (
    format_rut,
    normalize_spaces,
    parse_float_or_null,
    parse_int_or_null,
    rut_is_valid,
    safe_parse_date,
    status_to_boolean,
    string_to_boolean,
)
from gcp_datalake_pipeline_spark.plans.queries import load_table, register


@register(
    "fn_safe_parse_date",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d_dmy,
           CAST(o_orderdate AS DATE) AS d_ymd,
           CAST(o_orderdate AS DATE) AS d_slash,
           CAST(o_orderdate AS DATE) AS d_with_time
    FROM orders WHERE o_orderkey % 7 = 0
    """,
    doc="""F3 parity: render each order date in every format the reference
    accepts (D-M-Y, Y-M-D, D/M/Y, 'date, time') and reparse with
    safe_parse_date — all four must round-trip to the original date.""",
)
def fn_safe_parse_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        safe_parse_date(F.date_format(d, "d-M-yyyy")).alias("d_dmy"),
        safe_parse_date(F.date_format(d, "yyyy-MM-dd")).alias("d_ymd"),
        safe_parse_date(F.date_format(d, "d/M/yyyy")).alias("d_slash"),
        safe_parse_date(
            F.concat(F.date_format(d, "dd-MM-yyyy"), F.lit(", 09:21"))
        ).alias("d_with_time"),
    )


# Mod-11 in pure SQL for a 7-digit body (multipliers from rightmost:
# 2,3,4,5,6,7,2), mirroring utils/validations.ts:78-90 independently of the
# engine implementation.
_SQL_DV_7 = """
    (CASE 11 - ((
        2 * CAST(substr(body, 7, 1) AS INT) +
        3 * CAST(substr(body, 6, 1) AS INT) +
        4 * CAST(substr(body, 5, 1) AS INT) +
        5 * CAST(substr(body, 4, 1) AS INT) +
        6 * CAST(substr(body, 3, 1) AS INT) +
        7 * CAST(substr(body, 2, 1) AS INT) +
        2 * CAST(substr(body, 1, 1) AS INT)) % 11)
     WHEN 11 THEN '0' WHEN 10 THEN 'K'
     ELSE CAST(11 - ((
        2 * CAST(substr(body, 7, 1) AS INT) +
        3 * CAST(substr(body, 6, 1) AS INT) +
        4 * CAST(substr(body, 5, 1) AS INT) +
        5 * CAST(substr(body, 4, 1) AS INT) +
        6 * CAST(substr(body, 3, 1) AS INT) +
        7 * CAST(substr(body, 2, 1) AS INT) +
        2 * CAST(substr(body, 1, 1) AS INT)) % 11) AS VARCHAR) END)
"""


@register(
    "fn_rut_validation",
    f"""
    WITH ruts AS (
      SELECT c_custkey,
             CAST(1000000 + c_custkey AS VARCHAR) AS body,
             CAST(c_custkey % 10 AS VARCHAR) AS given_dv
      FROM customer
    )
    SELECT c_custkey,
           body || '-' || given_dv AS rut,
           given_dv = {_SQL_DV_7} AS is_valid,
           CASE WHEN given_dv = {_SQL_DV_7}
                THEN body || '-' || given_dv END AS formatted
    FROM ruts
    """,
    doc="""F2 parity: synthesize a 7-digit-body RUT per customer with a
    candidate check digit (custkey mod 10 — valid ~1 in 11); the oracle
    recomputes mod-11 independently in SQL.""",
)
def fn_rut_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    rut = F.concat(
        (F.lit(1000000) + F.col("c_custkey")).cast("string"),
        F.lit("-"),
        (F.col("c_custkey") % 10).cast("string"),
    )
    return c.select(
        "c_custkey",
        rut.alias("rut"),
        rut_is_valid(rut).alias("is_valid"),
        format_rut(rut).alias("formatted"),
    )


@register(
    "fn_boolean_parsers",
    """
    SELECT o_orderkey,
           -- status_to_boolean: normalized lowercase equals 'aprobada'
           trim(regexp_replace(lower(CASE o_orderstatus
                WHEN 'O' THEN '  Aprobada '
                WHEN 'F' THEN 'Rechazada'
                ELSE 'No  Aplica' END), '\\s+', ' ', 'g')) = 'aprobada'
             AS status_bool,
           -- string_to_boolean: lowercase in {true, verdadero, si}
           lower(CASE o_orderpriority
                WHEN '1-URGENT' THEN 'TRUE' WHEN '2-HIGH' THEN 'si'
                WHEN '3-MEDIUM' THEN 'verdadero' WHEN '4-NOT SPECIFIED' THEN 'no'
                ELSE 'false' END) IN ('true', 'verdadero', 'si') AS flag_bool
    FROM orders WHERE o_orderkey % 5 = 0
    """,
    doc="""F4/F5/F1 parity: drive the boolean parsers with
    reference-vocabulary strings synthesized from order columns; the oracle
    re-encodes the normalize+compare semantics directly in SQL.""",
)
def fn_boolean_parsers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    status_str = (
        F.when(F.col("o_orderstatus") == "O", "  Aprobada ")
        .when(F.col("o_orderstatus") == "F", "Rechazada")
        .otherwise("No  Aplica")
    )
    flag_str = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "TRUE")
        .when(F.col("o_orderpriority") == "2-HIGH", "si")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "verdadero")
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", "no")
        .otherwise("false")
    )
    return o.select(
        "o_orderkey",
        status_to_boolean(status_str).alias("status_bool"),
        string_to_boolean(flag_str).alias("flag_bool"),
    )


@register(
    "fn_numeric_coercions",
    """
    SELECT o_orderkey,
           NULLIF(o_orderkey % 100, 0) AS int_coerced,
           NULLIF(ROUND(o_totalprice, 2), 0.0) AS float_coerced
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    doc="""F6/F7 parity: '<n>x' / '<price>kg' strings parse to their leading
    number with the JS `|| null` zero-collapse; the oracle states the
    expected value arithmetically.""",
)
def fn_numeric_coercions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0)
    int_str = F.concat((F.col("o_orderkey") % 100).cast("string"), F.lit("x"))
    # format_number would add thousands separators; plain cast of a rounded
    # double renders digits-dot-digits in both engines.
    float_str = F.concat(
        F.round(F.col("o_totalprice"), 2).cast("string"), F.lit("kg")
    )
    return o.select(
        "o_orderkey",
        parse_int_or_null(int_str).cast("long").alias("int_coerced"),
        parse_float_or_null(float_str).alias("float_coerced"),
    )


@register(
    "fn_normalize_spaces",
    """
    SELECT c_custkey,
           trim(regexp_replace('  ' || c_name || '   x ', '\\s+', ' ', 'g'))
             AS cleaned
    FROM customer WHERE c_custkey % 4 = 0
    """,
    doc="F1 parity: whitespace collapse + trim over padded customer names.",
)
def fn_normalize_spaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 4 == 0)
    padded = F.concat(F.lit("  "), F.col("c_name"), F.lit("   x "))
    return c.select("c_custkey", normalize_spaces(padded).alias("cleaned"))
