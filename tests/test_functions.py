"""Unit tests for the scalar function library (SURVEY.md §5.1).

Edge cases lifted from the reference code:
- RUT: `utils/validations.ts:54-109` (dots, lowercase k, bad dv; the doc
  example 12345678-9 is invalid per the algorithm)
- dates: `utils/date.ts:2-34` (D-M-Y, D/M/Y, Y-M-D, time suffix, garbage)
- status/flags: `utils/parser.ts:4-19`
- int/float coercions: `services/vehiculo.ts:215-229` (0 -> NULL collapse)
"""

import datetime

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.functions import (
    empty_to_null,
    format_rut,
    normalize_spaces,
    parse_float_or_null,
    parse_int_or_null,
    rut_is_valid,
    safe_parse_date,
    status_to_boolean,
    string_to_boolean,
)


def apply_fn(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(fn("v")).collect()]


RUT_CASES = [
    ("11111111-1", True),
    ("22222222-2", True),
    ("12345678-5", True),
    ("11111112-K", True),
    ("11111112-k", True),  # lowercase dv accepted (case-insensitive regex)
    ("12.345.678-5", True),  # dotted form
    ("12345678-9", False),  # reference doc example — wrong dv per algorithm
    ("123-4", False),  # body too short
    ("11111111", False),  # no hyphen
    ("", False),
    (None, False),
    ("1234567-4", True),  # 7-digit body, dv computed: verify below
]


def test_rut_is_valid(spark):
    got = apply_fn(spark, rut_is_valid, [c[0] for c in RUT_CASES])
    want = [c[1] for c in RUT_CASES]
    # compute the true dv for the 7-digit case with an independent mod-11
    def dv(body):
        s = sum(int(d) * [2, 3, 4, 5, 6, 7][i % 6] for i, d in enumerate(reversed(body)))
        r = 11 - s % 11
        return "0" if r == 11 else "K" if r == 10 else str(r)

    assert dv("1234567") == "4"
    assert got == want


def test_format_rut(spark):
    got = apply_fn(
        spark, format_rut, ["12.345.678-5", "11111112-k", "12345678-9", None]
    )
    assert got == ["12345678-5", "11111112-K", None, None]


def test_independent_mod11_property(spark):
    """Property check: engine DV matches an independent implementation for
    a spread of bodies (hypothesis-style, deterministic sample)."""
    import random

    rnd = random.Random(42)
    bodies = [str(rnd.randint(1000000, 99999999)) for _ in range(300)]

    def dv(body):
        s = sum(int(d) * [2, 3, 4, 5, 6, 7][i % 6] for i, d in enumerate(reversed(body)))
        r = 11 - s % 11
        return "0" if r == 11 else "K" if r == 10 else str(r)

    ruts = [f"{b}-{dv(b)}" for b in bodies]
    got = apply_fn(spark, rut_is_valid, ruts)
    assert all(got)
    # perturbed dv must be invalid
    bad = [f"{b}-{'0' if dv(b) != '0' else '1'}" for b in bodies]
    got_bad = apply_fn(spark, rut_is_valid, bad)
    assert not any(got_bad)


DATE_CASES = [
    ("2025-06-24", datetime.date(2025, 6, 24)),  # Y-M-D wins over D-M-Y
    ("24-06-2025", datetime.date(2025, 6, 24)),
    ("24/06/2025", datetime.date(2025, 6, 24)),
    ("24-06-2025, 09:21", datetime.date(2025, 6, 24)),  # time suffix dropped
    ("1978-11-09", datetime.date(1978, 11, 9)),
    ("9-1-2020", datetime.date(2020, 1, 9)),  # single-digit day/month
    ("garbage", None),
    ("", None),
    (None, None),
    ("31-02-2025", None),  # impossible date -> NULL
]


def test_safe_parse_date(spark):
    got = apply_fn(spark, safe_parse_date, [c[0] for c in DATE_CASES])
    assert got == [c[1] for c in DATE_CASES]


def test_status_to_boolean(spark):
    cases = ["Aprobada", " APROBADA ", "aprobada", "Rechazada", "No Aplica", "", None]
    want = [True, True, True, False, False, False, False]
    assert apply_fn(spark, status_to_boolean, cases) == want


def test_string_to_boolean(spark):
    cases = ["true", "TRUE", "verdadero", "si", "SI", "no", "false", "", None]
    want = [True, True, True, True, True, False, False, False, False]
    assert apply_fn(spark, string_to_boolean, cases) == want


def test_parse_int_or_null(spark):
    cases = ["2025", "0", "abc", "950km", "", None, "-7", "12.9"]
    want = [2025, None, None, 950, None, None, -7, 12]
    assert apply_fn(spark, parse_int_or_null, cases) == want


def test_parse_float_or_null(spark):
    cases = ["950.5", "0", "0.0", "abc", "950.5kg", "", None, "-1.5"]
    want = [950.5, None, None, None, 950.5, None, None, -1.5]
    assert apply_fn(spark, parse_float_or_null, cases) == want


def test_normalize_spaces_and_empty_to_null(spark):
    got = apply_fn(spark, normalize_spaces, ["  a   b\t c ", "x", None])
    assert got == ["a b c", "x", None]
    got = apply_fn(spark, empty_to_null, ["  ", "", "x", None])
    assert got == [None, None, "x", None]


def test_date_roundtrip_property(spark):
    """SURVEY §5.5: property-based round-trip — any calendar date rendered
    in each accepted format must reparse to itself (hypothesis-generated,
    batched into one Spark job)."""
    from hypothesis import given, settings, strategies as st

    collected: list[datetime.date] = []

    @settings(max_examples=150, deadline=None)
    @given(st.dates(min_value=datetime.date(1900, 1, 1),
                    max_value=datetime.date(2099, 12, 31)))
    def collect(d):
        collected.append(d)

    collect()
    rows = [
        (d.strftime("%d-%m-%Y"), d.strftime("%Y-%m-%d"),
         d.strftime("%d/%m/%Y"), f"{d.strftime('%d-%m-%Y')}, 09:21", d)
        for d in collected
    ]
    df = spark.createDataFrame(
        rows, "dmy string, ymd string, slash string, with_time string, want date"
    )
    bad = df.filter(
        (safe_parse_date("dmy") != F.col("want"))
        | (safe_parse_date("ymd") != F.col("want"))
        | (safe_parse_date("slash") != F.col("want"))
        | (safe_parse_date("with_time") != F.col("want"))
    ).count()
    assert bad == 0


def test_rut_property_hypothesis(spark):
    """Random 7-8 digit bodies: engine validity must equal an independent
    mod-11 oracle for every candidate DV 0-9/K."""
    from hypothesis import given, settings, strategies as st

    def dv(body):
        s = sum(int(d) * [2, 3, 4, 5, 6, 7][i % 6]
                for i, d in enumerate(reversed(body)))
        r = 11 - s % 11
        return "0" if r == 11 else "K" if r == 10 else str(r)

    cases: list[tuple[str, bool]] = []

    @settings(max_examples=100, deadline=None)
    @given(st.integers(min_value=1000000, max_value=99999999),
           st.sampled_from(list("0123456789K")))
    def collect(body_int, candidate):
        body = str(body_int)
        cases.append((f"{body}-{candidate}", candidate == dv(body)))

    collect()
    got = apply_fn(spark, rut_is_valid, [c[0] for c in cases])
    assert got == [c[1] for c in cases]
