"""Cleaning / coercion scalar functions (SURVEY.md §2.7).

Parity targets (reference file:line cited per function). All are Column
expressions; `try_*` variants are used so behavior is identical whether the
session runs ANSI or legacy mode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_spaces(c: Column | str) -> Column:
    """F1 — collapse whitespace runs to one space and trim.

    Parity: reference `etl-gcs-cloudsql/src/utils/string.ts:8-9`
    (``s.replace(/\\s+/g, ' ').trim()``). Null passes through.
    """
    return F.trim(F.regexp_replace(_col(c), r"\s+", " "))


def empty_to_null(c: Column | str) -> Column:
    """F12 — trimmed-empty string becomes NULL.

    Parity: csv-parse trims fields, then JS ``'' || null`` collapses empty
    strings to null on every optional text column (e.g. reference
    `services/conductor.ts:137-140`).
    """
    return F.nullif(F.trim(_col(c)), F.lit(""))


def safe_parse_date(c: Column | str) -> Column:
    """F3 — lenient multi-format date parse.

    Parity: reference `etl-gcs-cloudsql/src/utils/date.ts:5-34`: take the
    text before the first ',' (drops a time suffix like "24-06-2025, 09:21"),
    then try Y-M-D (if the first token is 4 digits), D-M-Y, D/M/Y.
    Unparseable input yields NULL (documented intentional improvement over
    the reference, which can produce a JS Invalid Date — SURVEY.md F3 note).

    Format order matters: 'yyyy-M-d' is tried first so '2025-06-24' never
    parses as day 2025 (SURVEY.md §7.3.6).
    """
    head = F.trim(F.split(_col(c), ",").getItem(0))
    return F.coalesce(
        F.try_to_date(head, "yyyy-M-d"),
        F.try_to_date(head, "d-M-yyyy"),
        F.try_to_date(head, "d/M/yyyy"),
    )


def status_to_boolean(c: Column | str) -> Column:
    """F4 — revision status to boolean: 'aprobada' (case/space-insensitive)
    is true; anything else, including NULL, is false (never NULL).

    Parity: reference `etl-gcs-cloudsql/src/utils/parser.ts:7-11`.
    """
    return F.coalesce(
        F.lower(normalize_spaces(_col(c))) == "aprobada", F.lit(False)
    )


def string_to_boolean(c: Column | str) -> Column:
    """F5 — CSV flag to boolean: lowercase in {'true','verdadero','si'} is
    true; anything else, including NULL, is false (never NULL).

    Parity: reference `etl-gcs-cloudsql/src/utils/parser.ts:16-19`.
    """
    return F.coalesce(
        F.lower(F.trim(_col(c))).isin("true", "verdadero", "si"), F.lit(False)
    )


def parse_int_or_null(c: Column | str) -> Column:
    """F6 — JS ``parseInt(s) || null`` parity: take leading integer digits of
    a mixed string; NaN and 0 both collapse to NULL.

    Parity: reference `services/vehiculo.ts:215,222,229`. The zero-collapse
    is a faithful quirk (``0 || null === null`` in JS).
    """
    lead = F.regexp_extract(F.trim(_col(c)), r"^[-+]?\d+", 0)
    return F.nullif(F.nullif(lead, F.lit("")).try_cast("int"), F.lit(0))


def parse_float_or_null(c: Column | str) -> Column:
    """F7 — JS ``parseFloat(s) || null`` parity: leading float prefix; NaN
    and 0.0 collapse to NULL.

    Parity: reference `services/vehiculo.ts:224-227`.
    """
    lead = F.regexp_extract(
        F.trim(_col(c)), r"^[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?", 0
    )
    return F.nullif(F.nullif(lead, F.lit("")).try_cast("double"), F.lit(0.0))
