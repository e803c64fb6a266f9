"""Temporal joins Spark lacks natively: as-of join and bounded range join,
built as compositions of DataFrame ops (SURVEY-mandated custom-operator
pattern: composition first, never a Python row path).

as_of_join: for each left row, the most recent right row with
``right.ts <= left.ts`` per key — implemented with the union + last_value
(ignore nulls) trick: ONE shuffle on (key), no join blow-up, no per-key
driver loop. This is the standard scalable formulation (a sort-merge
within each key partition).

range_join_within: pairs within a time tolerance — implemented by
bucketing time to tolerance-sized bins and equi-joining on (key, bin)
with each left row probing its own and the two adjacent bins, then exact
filtering. Turns an inequality join (O(n^2) nested loop) into an
equi-join Catalyst can hash — the standard bucketed range-join rewrite.

gapfill: regularize an irregular per-key time series onto a fixed step
grid (the hypertable `time_bucket_gapfill` + LOCF shape) — per-key spine
generation via sequence()+explode, one co-partitioned join, one ordered
window for the carry-forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the latest right row at-or-before its
    timestamp, per ``key`` (NULLs when no right row precedes it).

    Scale: one shuffle on ``key``; within each partition an ordered scan
    carries the last-seen right values forward (last_value IGNORE NULLS
    over rows unbounded-preceding..current). Ties on timestamp: the right
    row is visible to left rows with the same timestamp (<=), and among
    same-ts right rows the last by arrival wins.
    """
    lhs = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    rhs = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            lhs.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # Right rows sort before left rows at equal timestamps so <= semantics
    # hold (right value becomes visible to same-ts left rows).
    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_is_left",
        "_lrow",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in right_cols
        ],
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance: int,
    how_filter=None,
) -> DataFrame:
    """Pairs (left, right) with the same ``key`` whose timestamps differ by
    at most ``tolerance`` (same integer unit as the ts columns).

    Scale: both sides bucket to floor(ts / tolerance); left probes buckets
    {b-1, b, b+1} via a 3-element explode, so the join is a pure equi-join
    on (key, bucket) followed by the exact |dt| <= tolerance filter —
    no O(n^2) nested loop, and bucket skew follows key skew (saltable).
    ``how_filter``: optional extra Column predicate evaluated post-join.
    Right-side columns come back suffixed ``_r``.
    """
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.array(
                (F.col(left_ts) / tolerance).cast("long") - 1,
                (F.col(left_ts) / tolerance).cast("long"),
                (F.col(left_ts) / tolerance).cast("long") + 1,
            )
        ),
    )
    rb = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns]
    ).withColumn("_bucket_r", (F.col(f"{right_ts}_r") / tolerance).cast("long"))
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col("_bucket") == F.col("_bucket_r"))
        & (F.abs(F.col(left_ts) - F.col(f"{right_ts}_r")) <= tolerance)
    )
    if how_filter is not None:
        cond = cond & how_filter
    return lb.join(rb, cond).drop("_bucket", "_bucket_r")


def gapfill(
    df: DataFrame,
    key: str,
    bucket_col: str,
    step: str,
    value_cols: list[str],
    locf_cols: list[str] | None = None,
    observed_col: str | None = None,
) -> DataFrame:
    """Densify a per-key bucketed series: emit one row per ``key`` per
    ``step`` between that key's first and last observed bucket, zero-filling
    ``value_cols`` on generated rows and carrying ``locf_cols`` forward
    (last observation carried forward). If ``observed_col`` is given, the
    output carries a boolean column of that name marking rows that existed
    in the input (True) vs spine-generated rows (False) — callers should
    use it rather than inferring observedness from a zero-filled count.

    ``df`` must already be aggregated to one row per (key, bucket) —
    ``bucket_col`` is a timestamp column on a regular grid (e.g. the output
    of ``date_trunc``). ``step`` is a SQL interval literal body such as
    ``'1 day'``.

    Scale: ONE Exchange on ``key``, total. Each observed row emits its own
    micro-spine — ``explode(sequence(bucket, next_bucket - step))`` where
    ``next_bucket`` comes from ``lead()`` — so there is no spans
    aggregation, no spine⋈df join, and never a global min..max (one
    long-lived key cannot inflate every key's series). The lead window and
    the LOCF window share the same hash partitioning, so Catalyst plans a
    single shuffle (locked CI-hard by tests/test_plans.py).
    """
    locf_cols = locf_cols or []
    step_i = F.expr(f"INTERVAL {step}")
    w = Window.partitionBy(key).orderBy(bucket_col)
    base = df.withColumn("_gf_next", F.lead(bucket_col).over(w))
    exploded = base.select(
        key,
        *value_cols,
        *locf_cols,
        F.col(bucket_col).alias("_gf_obs_b"),
        # [bucket, next) on the step grid; the last row emits itself only.
        # greatest() clamps the stop at the row's own bucket: a duplicate
        # (key, bucket) — a violation of the documented one-row contract —
        # makes lead() return an EQUAL next bucket, and without the clamp
        # sequence(bucket, bucket - step, +step) dies deep in an executor
        # with Spark's opaque "illegal sequence boundaries". Clamped,
        # each duplicate emits its own row only (the old spine-join
        # formulation's behavior).
        F.explode(
            F.sequence(
                F.col(bucket_col),
                F.greatest(
                    F.coalesce(
                        F.col("_gf_next") - step_i, F.col(bucket_col)
                    ),
                    F.col(bucket_col),
                ),
                step_i,
            )
        ).alias(bucket_col),
    )
    is_obs = F.col(bucket_col) == F.col("_gf_obs_b")
    out = exploded.select(
        key,
        bucket_col,
        # Zero-fill covers generated rows AND an observed NULL (parity with
        # the pre-rewrite left-join + coalesce formulation).
        *[
            F.coalesce(
                F.when(is_obs, F.col(c)), F.lit(0).cast(df.schema[c].dataType)
            ).alias(c)
            for c in value_cols
        ],
        # Mask gap rows to NULL; the LOCF window below carries the last
        # non-null observation across both gap rows and observed NULLs.
        *[F.when(is_obs, F.col(c)).alias(c) for c in locf_cols],
        *([is_obs.alias(observed_col)] if observed_col else []),
    )
    if locf_cols:
        w2 = (
            Window.partitionBy(key)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            key,
            bucket_col,
            *value_cols,
            *[
                F.last(c, ignorenulls=True).over(w2).alias(c)
                for c in locf_cols
            ],
            *([observed_col] if observed_col else []),
        )
    return out
