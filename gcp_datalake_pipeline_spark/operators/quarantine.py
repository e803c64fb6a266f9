"""Validate-then-split (SURVEY.md §2.11).

The reference wraps each CSV row in its own transaction and rolls back on
validation failure (`services/empresa.ts:60-111`). The set-based equivalent:
derive an ``error_reason`` per row from an ordered list of named predicates,
then split into a valid stream and a quarantine stream carrying provenance.
First failing rule wins (mirrors the reference's sequential throws).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """A validation rule: row is quarantined when ``fails`` is true."""

    name: str
    fails: Column


def validate_split(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Return ``(valid, quarantine)``.

    ``quarantine`` gains an ``error_reason`` column naming the first failed
    rule, reproducing the reference's per-row error accounting
    (`errorCount`, `services/conductor.ts:262-268`).
    """
    reason = F.lit(None).cast("string")
    for rule in reversed(rules):
        reason = F.when(F.coalesce(rule.fails, F.lit(False)), F.lit(rule.name)).otherwise(
            reason
        )
    tagged = df.withColumn("error_reason", reason)
    valid = tagged.filter(F.col("error_reason").isNull()).drop("error_reason")
    quarantine = tagged.filter(F.col("error_reason").isNotNull())
    return valid, quarantine


def run_counters(valid: DataFrame, quarantine: DataFrame) -> dict[str, int]:
    """A1 — per-run counters (rowCount/processedCount/errorCount),
    parity with `services/empresa.ts:119-121`."""
    processed = valid.count()
    errors = quarantine.count()
    return {
        "rowCount": processed + errors,
        "processedCount": processed,
        "errorCount": errors,
    }
