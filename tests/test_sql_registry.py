"""SQL-UDF registry: the spark.sql surface must agree with the Column
helpers on every edge case."""

import pytest

from gcp_datalake_pipeline_spark.functions import register_all


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    register_all(spark)


CASES = [
    # (sql expression, expected)
    ("normalize_spaces('  a   b ')", "a b"),
    ("empty_to_null('   ')", None),
    ("empty_to_null(' x ')", "x"),
    ("CAST(safe_parse_date('2025-06-24') AS STRING)", "2025-06-24"),
    ("CAST(safe_parse_date('24-06-2025, 09:21') AS STRING)", "2025-06-24"),
    ("CAST(safe_parse_date('garbage') AS STRING)", None),
    ("status_to_boolean(' APROBADA ')", True),
    ("status_to_boolean('No Aplica')", False),
    ("status_to_boolean(NULL)", False),
    ("string_to_boolean('verdadero')", True),
    ("string_to_boolean('no')", False),
    ("parse_int_or_null('950km')", 950),
    ("parse_int_or_null('0')", None),
    ("parse_float_or_null('950.5kg')", 950.5),
    ("parse_float_or_null('abc')", None),
    ("rut_check_digit('12345678')", "5"),
    ("rut_is_valid('12.345.678-5')", True),
    ("rut_is_valid('12345678-9')", False),
    ("rut_is_valid(NULL)", False),
    ("format_rut('11111112-k')", "11111112-K"),
    ("format_rut('bad')", None),
]


@pytest.mark.parametrize("expr,expected", CASES)
def test_sql_udf(spark, expr, expected):
    got = spark.sql(f"SELECT {expr} AS v").first()["v"]
    assert got == expected
