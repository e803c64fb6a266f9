"""Scale-oriented join helpers: bucketed co-located joins and salted joins
for skewed keys (SURVEY.md §4 / the 100 TB partitioning stance).

Catalyst + AQE already pick broadcast vs sort-merge and split skewed
partitions; these helpers cover the two cases that need *layout* or *plan
shape* decisions the optimizer cannot make on its own:

- bucketing: pre-shuffling both fact tables into the same bucket layout so
  repeated joins on the key need no exchange at query time;
- salting: spreading a pathologically hot key across N sub-keys when AQE's
  skew splitting is unavailable (e.g. broadcast not possible and a single
  key exceeds one executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) managed table.

    Joins/aggregations on ``bucket_cols`` between tables bucketed with the
    same (cols, num_buckets) run shuffle-free: each task reads matching
    bucket files from both sides. This is the co-located-join layout for
    fact-fact joins too big to broadcast (at 100 TB: bucket lineitem and
    orders by orderkey once, join free forever).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> bool:
    """True iff joining the two bucketed tables on ``on`` produces a
    sort-merge plan with no shuffle Exchange (verification helper).

    Broadcast is disabled for the probe: on small test data Catalyst would
    broadcast and never consult bucketing; the property under test is the
    big-big layout where broadcast is impossible.
    """
    # default mirrors Spark's own (10MB) so restore works even on a
    # session where the conf was never set explicitly
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(left_table).join(spark.table(right_table), on)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return "Exchange hashpartitioning" not in plan


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is heavily skewed on ``on``.

    The skewed side gets a random-ish salt derived from a uniform row id;
    the small-but-not-broadcastable side is replicated ``salt_buckets``
    times (explode), so each hot key spreads over ``salt_buckets`` reduce
    tasks instead of one straggler.

    Salt is derived with xxhash64 over a monotonic id — deterministic per
    execution plan, no RNG. Prefer AQE skew-join or broadcast when
    applicable; this is the fallback with a replication-factor cost on the
    right side.

    ``right``/``full`` cannot ride the replicated join directly (a right
    row's replicas match per-salt subsets, so replicas with no same-salt
    partner would emit spurious unmatched rows). They are built instead
    as: salted INNER core + anti-join complements — the right-only rows
    come from a left_anti against the left side's DISTINCT keys (the
    map-side-combined distinct collapses every hot key to one row, so no
    skew survives into that join), and for ``full`` the left-only rows
    from a left_anti against the right side's keys (small side,
    broadcastable). Each unmatched row appears exactly once.
    """
    normalized = how.lower().replace("outer", "").strip("_")
    if normalized in ("right", "full"):
        inner = salted_join(left, right, on, salt_buckets, "inner")

        def _nulls(df: DataFrame) -> list:
            return [
                F.lit(None).cast(df.schema[c].dataType).alias(c)
                for c in df.columns
                if c != on
            ]

        right_only = right.join(
            left.select(on).distinct(), on, "left_anti"
        ).select(F.col(on), *_nulls(left), *[F.col(c) for c in right.columns if c != on])
        out = inner.unionByName(right_only)
        if normalized == "full":
            left_only = left.join(
                right.select(on).distinct(), on, "left_anti"
            ).select(
                F.col(on),
                *[F.col(c) for c in left.columns if c != on],
                *_nulls(right),
            )
            out = out.unionByName(left_only)
        return out
    salt = (
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
        .cast("int")
        .alias("_salt")
    )
    l_salted = left.withColumn("_salt", salt)
    r_replicated = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = l_salted.join(r_replicated, [on, "_salt"], how)
    return out.drop("_salt")
