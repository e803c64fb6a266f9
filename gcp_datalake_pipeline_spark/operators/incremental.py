"""Incremental aggregate maintenance: refresh a materialized partial-agg
table from a delta batch WITHOUT recomputing untouched groups.

The 100 TB pattern: a nightly delta is orders of magnitude smaller than
the accumulated fact table, so a maintained aggregate must cost
O(delta + affected groups), not O(history). Decomposable aggregates
(SUM/COUNT, and anything derivable from them: AVG, plus MIN/MAX under
insert-only) merge by summing partial states per group.

`refresh_aggregate` splits the existing aggregate into untouched groups
(left_anti vs the delta's group keys — pass through verbatim, no
recompute) and affected groups (union with the delta's partials, one
combine groupBy). Both joins/groupBys hash on the group keys, and the
delta side is broadcast when small, so the refresh never reshuffles the
full aggregate table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str,
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Build the partial-agg state: per group, SUM of each source column
    (``sum_cols`` maps output name -> source column) and a row COUNT —
    plus MIN/MAX partials when given (exact under insert feeds; the
    matview layer recomputes delete-retracted groups exactly)."""
    return df.groupBy(*keys).agg(
        *[F.sum(src).alias(out) for out, src in sum_cols.items()],
        F.count(F.lit(1)).alias(count_col),
        *[F.min(src).alias(out) for out, src in (min_cols or {}).items()],
        *[F.max(src).alias(out) for out, src in (max_cols or {}).items()],
    )


def refresh_aggregate(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str,
    broadcast_delta: bool = True,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Merge a delta partial-agg table into an existing one.

    ``existing`` and ``delta`` must both be in partial-agg form (same
    schema: keys + sum_cols + count_col [+ min/max cols]). Groups absent
    from the delta are passed through without touching their values;
    affected groups combine by summing partials (MIN/MAX partials
    combine by MIN/MAX — exact only for insert-touched groups, where
    the true extreme can only move one way; the matview layer overrides
    delete-touched groups with an exact recompute). New-in-delta
    groups appear automatically.
    """
    delta_keys = delta.select(*keys).distinct().alias("dk")
    if broadcast_delta:
        delta_keys = F.broadcast(delta_keys)
    ex = existing.alias("ex")
    # NULL-SAFE key match: GROUP BY puts all-NULL keys in ONE group, so
    # the untouched/affected split must too — a plain equi-join would
    # never match a NULL group and duplicate it on every refresh
    cond = None
    for k in keys:
        c = F.col(f"ex.{k}").eqNullSafe(F.col(f"dk.{k}"))
        cond = c if cond is None else cond & c
    untouched = ex.join(delta_keys, cond, "left_anti")
    affected = (
        ex.join(delta_keys, cond, "left_semi")
        .unionByName(delta)
        .groupBy(*keys)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(count_col).alias(count_col),
            *[F.min(c).alias(c) for c in (min_cols or [])],
            *[F.max(c).alias(c) for c in (max_cols or [])],
        )
    )
    return untouched.unionByName(affected)
