"""Slowly-changing-dimension Type 2 historization.

The reference historizes by appending full snapshots per load
(revision_tecnica & friends) and upserts current-state dims in place
(etl-gcs-cloudsql/src/services/*.ts upsert paths). SCD2 is the warehouse
op that subsumes both: one table that answers "what did this dim row look
like at time T" via (valid_from, valid_to, is_current) ranges.

Spark-first formulation: each batch is ONE full-outer join between the
open rows and the deduped update snapshot on the business key, then a
single-pass conditional explode that emits 0, 1, or 2 rows per joined key
(kept / closed / opened). No MERGE loop, no per-row path; already-closed
history unions back without a shuffle. At 100 TB the cost is one hash
join keyed on the business key — the same exchange a plain upsert needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ["valid_from", "valid_to", "is_current"]


def scd2_apply(
    current: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    effective_ts,
) -> DataFrame:
    """Apply one snapshot batch to an SCD2 history table.

    ``current``: existing history (keys + tracked_cols + META_COLS), or
    None for the initial load. ``updates``: one row per business key
    (dedup last-wins upstream). ``effective_ts``: Column or literal
    timestamp stamped on rows opened/closed by this batch.

    Per key: a new key opens a row; a changed key (any tracked column
    differs, null-safely) closes the open row at ``effective_ts`` and
    opens a new one; an unchanged or absent key passes through untouched.
    """
    eff = effective_ts if isinstance(effective_ts, F.Column) else F.lit(effective_ts)
    eff = eff.cast("timestamp")
    cols = keys + tracked_cols

    upd = updates.select(*cols)
    if current is None:
        return upd.select(
            *cols,
            eff.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    open_rows = current.filter(F.col("is_current"))
    closed_rows = current.filter(~F.col("is_current"))

    o = open_rows.select(
        *[F.col(c).alias(f"_o_{c}") for c in cols + META_COLS],
        *[F.col(k) for k in keys],
        # Explicit presence marker: detecting "no open row" via a nullable
        # data column (_o_valid_from) would misclassify a null-valued row.
        F.lit(True).alias("_has_open"),
    )
    u = upd.select(
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        *[F.col(k) for k in keys],
        F.lit(True).alias("_has_update"),
    )
    joined = o.join(u, keys, "full_outer")

    def _row(version: str, closing: bool = False):
        """Struct in history-column order from either side of the join."""
        if version == "old":
            fields = [F.col(f"_o_{c}").alias(c) for c in cols] + [
                F.col("_o_valid_from").alias("valid_from"),
                (eff if closing else F.col("_o_valid_to")).alias("valid_to"),
                F.lit(not closing).alias("is_current")
                if closing
                else F.col("_o_is_current").alias("is_current"),
            ]
        else:
            fields = (
                [F.col(k).alias(k) for k in keys]
                + [F.col(f"_u_{c}").alias(c) for c in tracked_cols]
                + [
                    eff.alias("valid_from"),
                    F.lit(None).cast("timestamp").alias("valid_to"),
                    F.lit(True).alias("is_current"),
                ]
            )
        return F.struct(*fields)

    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_u_{c}"))

    emitted = joined.select(
        F.explode(
            F.when(F.col("_has_update").isNull(), F.array(_row("old")))
            .when(F.col("_has_open").isNull(), F.array(_row("new")))
            .when(changed, F.array(_row("old", closing=True), _row("new")))
            .otherwise(F.array(_row("old")))
        ).alias("_r")
    ).select("_r.*")

    return closed_rows.select(*cols, *META_COLS).unionByName(emitted)


def scd2_asof(history: DataFrame, ts) -> DataFrame:
    """Point-in-time state from an SCD2 history: the rows whose validity
    range covers ``ts`` (``valid_from <= ts < valid_to``, open rows have
    NULL valid_to). Returns business columns only — exactly what the
    current-state table would have contained at ``ts``.

    Scale: a narrow filter over the history scan — no join, no shuffle;
    with the history partitioned/sorted on valid_from the scan prunes.
    """
    t = ts if isinstance(ts, F.Column) else F.lit(ts)
    t = t.cast("timestamp")
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop(*META_COLS)
