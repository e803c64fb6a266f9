"""Data-quality operators: single-pass table profiling and declarative
constraint validation (the deequ/expectations niche, Spark-first).

Both produce small reports from corpus-scale inputs with the right
100 TB shapes:

- :func:`profile_table` is ONE aggregation over the table — every
  per-column statistic (nulls, distincts, min/max) rides the same
  map-side partial aggregate; the exchange carries one partial row per
  task, never data rows.
- :func:`validate_constraints` evaluates row-local predicates in the
  scan stage and aggregates violation counts; `unique` adds one groupBy
  on the key (the unavoidable shuffle), `fk` an anti-join against the
  (broadcastable) referenced key set.

Reference boundary: the reference pipeline enforces required-field and
FK rules imperatively per row during ingest
(etl-gcs-cloudsql/src/services/conductor.ts:76-268); quarantine.py
mirrors that split. This module is the standalone, declarative,
whole-table complement (audit an already-landed table).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as strings so one report
    schema covers every column type. Exact distincts (profiling is a
    correctness audit; for a quick look use approx_count_distinct).

    One job, one aggregation: all statistics for all columns are
    computed in a single pass and assembled driver-side from ONE
    collected row (bounded: 4 scalars per profiled column).

    Scale note: N exact count_distinct aggregates plan as an Expand of
    N+1 rows per input row (Spark's multi-distinct strategy). Cheap for
    a handful of audited columns; for very wide tables profile in column
    batches via ``cols`` or swap to approx_count_distinct."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).first()
    out = [
        (
            c,
            int(row["__n"]),
            int(row[f"{c}__nulls"]),
            int(row[f"{c}__distinct"]),
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows long, n_nulls long, n_distinct long, "
        "min_value string, max_value string",
    )


@dataclass(frozen=True)
class Check:
    """One declarative constraint. kinds:
    - not_null: ``col`` must be non-null
    - unique: the column list ``cols`` must be key-unique
    - in_range: ``col`` within [lo, hi] (None = unbounded side)
    - fk: every non-null ``col`` exists in ``ref`` table's ``ref_col``
    - in_set: every non-null ``col`` is one of ``values``
    - matches: every non-null ``col`` fully matches regex ``pattern``
    """

    name: str
    kind: str
    col: str | None = None
    cols: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    ref: DataFrame | None = None
    ref_col: str | None = None
    values: tuple = ()
    pattern: str | None = None


def validate_constraints(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate ``checks`` against ``df``: (check, n_violations), one row
    per check in input order, 0 = passing. Row-local checks (not_null,
    in_range) fuse into ONE aggregation pass; each unique adds a groupBy
    on its key; each fk adds an anti-join (broadcast when the referenced
    key set is small, as dimension keys are)."""
    spark = df.sparkSession
    rowlocal: list[tuple[str, F.Column]] = []
    results: dict[str, int] = {}
    for ch in checks:
        if ch.kind == "not_null":
            rowlocal.append((ch.name, F.col(ch.col).isNull()))
        elif ch.kind == "in_range":
            cond = F.lit(False)
            if ch.lo is not None:
                cond = cond | (F.col(ch.col) < F.lit(ch.lo))
            if ch.hi is not None:
                cond = cond | (F.col(ch.col) > F.lit(ch.hi))
            rowlocal.append((ch.name, F.col(ch.col).isNotNull() & cond))
        elif ch.kind == "in_set":
            rowlocal.append(
                (
                    ch.name,
                    F.col(ch.col).isNotNull()
                    & ~F.col(ch.col).isin(*ch.values),
                )
            )
        elif ch.kind == "matches":
            rowlocal.append(
                (
                    ch.name,
                    F.col(ch.col).isNotNull()
                    & ~F.col(ch.col).rlike(f"^(?:{ch.pattern})$"),
                )
            )
        elif ch.kind == "unique":
            dup_rows = (
                df.groupBy(*ch.cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
                .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("v"))
                .first()["v"]
            )
            results[ch.name] = int(dup_rows)
        elif ch.kind == "fk":
            keys = ch.ref.select(F.col(ch.ref_col).alias(ch.col)).distinct()
            results[ch.name] = (
                df.filter(F.col(ch.col).isNotNull())
                .join(F.broadcast(keys), ch.col, "left_anti")
                .count()
            )
        else:
            raise ValueError(f"unknown check kind {ch.kind!r}")
    if rowlocal:
        agg_row = df.agg(
            *[
                F.sum(F.when(cond, 1).otherwise(0)).alias(name)
                for name, cond in rowlocal
            ]
        ).first()
        for name, _ in rowlocal:
            results[name] = int(agg_row[name] or 0)
    out = [(ch.name, results[ch.name]) for ch in checks]
    return spark.createDataFrame(out, "check string, n_violations long")


def profile_oracle_sql(table: str, cols: list[str]) -> str:
    selects = []
    for c in cols:
        selects.append(
            f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
            SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_nulls,
            COUNT(DISTINCT {c}) AS n_distinct,
            CAST(MIN({c}) AS VARCHAR) AS min_value,
            CAST(MAX({c}) AS VARCHAR) AS max_value
            FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects)
