"""F8 — JSON parse with reject semantics.

The reference does ``JSON.parse`` per row; a throw rolls the row back
(`services/conductor.ts:147`, `services/vehiculo.ts:267`). Spark's
``from_json`` in PERMISSIVE mode yields a struct of NULLs for malformed
input, which is indistinguishable from an empty object — so we parse with a
corrupt-record column and expose an explicit malformed flag.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def from_json_flagged(c: Column, schema: T.StructType) -> Column:
    """Parse JSON into ``schema`` plus a ``_corrupt_record`` field that is
    non-null iff the input was present but malformed."""
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return F.from_json(
        c,
        with_corrupt,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )


def is_malformed(parsed: Column) -> Column:
    """True iff the flagged parse hit a corrupt record."""
    return parsed[CORRUPT_COL].isNotNull()
