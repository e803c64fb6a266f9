"""F2 — Chilean RUT validation/formatting as pure Column arithmetic.

Parity: reference `etl-gcs-cloudsql/src/utils/validations.ts:54-109`:
- input must match ``^(\\d{1,3}(\\.\\d{3}){0,2}|\\d{7,8})-[0-9Kk]$``
- strip dots; body must be 7-8 digits
- mod-11 check digit: multipliers cycle 2..7 from the rightmost body digit;
  remainder 11 -> '0', 10 -> 'K', else the digit itself
- canonical output format: ``<body>-<DV>`` (no dots, uppercase K)

The reference's doc comment claims ``12345678-9`` is valid; the algorithm
says the true DV is 5 — we follow the algorithm (SURVEY.md F2 note).

Implementation note: the body is at most 8 digits, so the mod-11 sum unrolls
into 8 fixed substring terms — fully JVM-side / codegen'd, no UDF. This is
deliberate: RUT validation sits on the ETL hot path and a row-at-a-time
Python UDF would dominate runtime at scale (SURVEY.md §7.3.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_RUT_RE = r"^(\d{1,3}(\.\d{3}){0,2}|\d{7,8})-[0-9Kk]$"

# Multipliers for an 8-left-padded body, leftmost char first.
# Position i from the right uses multiplier cycle [2,3,4,5,6,7][i % 6].
_MULTS = [3, 2, 7, 6, 5, 4, 3, 2]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _body(c: Column) -> Column:
    """Digits before the hyphen, dots stripped."""
    return F.regexp_replace(F.split(c, "-").getItem(0), r"\.", "")


def _given_dv(c: Column) -> Column:
    return F.upper(F.split(c, "-").getItem(1))


def rut_check_digit(body: Column | str) -> Column:
    """Mod-11 check digit ('0'-'9' or 'K') for a digit-string body (<=8)."""
    padded = F.lpad(_col(body), 8, "0")
    total = None
    for j, m in enumerate(_MULTS, start=1):
        term = F.substring(padded, j, 1).cast("int") * F.lit(m)
        total = term if total is None else total + term
    r = F.lit(11) - (total % 11)
    return (
        F.when(r == 11, F.lit("0"))
        .when(r == 10, F.lit("K"))
        .otherwise(r.cast("string"))
    )


def rut_is_valid(c: Column | str) -> Column:
    """True iff the string is a well-formed RUT with a correct mod-11 DV.

    NULL input -> false (reference rejects missing RUTs the same way).
    """
    s = F.trim(_col(c))
    body = _body(s)
    ok = (
        s.rlike(_RUT_RE)
        & F.length(body).between(7, 8)
        & (_given_dv(s) == rut_check_digit(body))
    )
    return F.coalesce(ok, F.lit(False))


def format_rut(c: Column | str) -> Column:
    """Canonical ``body-DV`` (no dots, uppercase K) when valid, else NULL."""
    s = F.trim(_col(c))
    return F.when(
        rut_is_valid(s), F.concat_ws("-", _body(s), _given_dv(s))
    ).otherwise(F.lit(None).cast("string"))
