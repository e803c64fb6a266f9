"""Set-based dimension maintenance (SURVEY.md J4/U4).

The reference does per-row get-or-create with ``INSERT ... ON CONFLICT ...
RETURNING id`` plus an in-memory cache (`etl-gcs-cloudsql/src/utils/sql.ts:6-27`).
Spark has no per-row RETURNING; the idiomatic equivalent is a two-phase
set-based job, order-independent with the same end state:

1. distinct new values = source values LEFT ANTI JOIN dim
2. assign surrogate ids = max(existing id) + row_number() over value order
   (deterministic: ids depend only on the value set, not partitioning)
3. append; then resolve facts via broadcast join.

Single-writer-per-dim-per-batch assumption, as in the reference (one file
processed per event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.storage import Catalog


def assign_dense_ids(
    vals: DataFrame,
    value_cols: list[str],
    id_col: str,
    start: int = 0,
    num_shards: int = 32,
) -> DataFrame:
    """Deterministic dense surrogate ids: ``id = start + rank in the global
    value order`` — WITHOUT the single-task global ``Window.orderBy``.

    Sharded assignment: range-repartition on the value order (shard i holds
    smaller values than shard i+1), per-shard row_number (num_shards
    parallel window groups), then add exclusive-scan offsets computed from
    the tiny per-shard count list (driver-side, bounded by num_shards).
    Ids depend only on the value SET: shard boundaries move rows between
    shards but never change a row's global rank.

    The input is persisted so the two passes (counts, final ids) see the
    same partitioning; callers materialize the result immediately (dim
    append), after which Spark may evict the cache.
    """
    from pyspark.storagelevel import StorageLevel

    order = [F.col(c) for c in value_cols]
    local = (
        vals.repartitionByRange(num_shards, *order)
        .withColumn("_shard", F.spark_partition_id())
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_shard").orderBy(*order)),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = sorted(
        (r["_shard"], r["cnt"])
        for r in local.groupBy("_shard").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, start
    for shard, cnt in counts:
        offsets[shard] = acc
        acc += cnt
    if offsets:
        offset_expr = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )[F.col("_shard")]
    else:  # empty batch: no rows survive, keep the expression typed
        offset_expr = F.lit(0)
    return local.select(
        (offset_expr + F.col("_rn")).cast("long").alias(id_col),
        *vals.columns,
    )


def get_or_create_dim(
    catalog: Catalog,
    dim_table: str,
    id_col: str,
    value_cols: list[str],
    values: DataFrame,
) -> DataFrame:
    """Ensure every distinct row of ``values`` exists in ``dim_table``;
    return the full dim (id + value cols + audit cols).

    ``values`` must contain exactly ``value_cols`` (extra columns are
    dropped). NULL-valued rows are ignored, matching the reference guards.
    """
    vals = values.select(*value_cols).na.drop(subset=value_cols).distinct()

    if catalog.exists(dim_table):
        dim = catalog.read(dim_table)
        max_id = dim.agg(F.max(id_col)).first()[0] or 0
        new_vals = vals.join(dim.select(*value_cols), value_cols, "left_anti")
    else:
        dim = None
        max_id = 0
        new_vals = vals

    now = F.current_timestamp()
    new_rows = assign_dense_ids(
        new_vals, value_cols, id_col, start=max_id
    ).select(
        id_col,
        *value_cols,
        now.alias("date_created"),
        now.alias("date_updated"),
    )
    if dim is None:
        catalog.overwrite(new_rows, dim_table)
    else:
        catalog.append(new_rows.select(*dim.columns), dim_table)
    return catalog.read(dim_table)


def resolve_dim_id(
    facts: DataFrame,
    dim: DataFrame,
    id_col: str,
    value_cols: list[str],
    fact_cols: list[str] | None = None,
) -> DataFrame:
    """Broadcast-join facts to a dim, attaching ``id_col``.

    Multi-column value keys (e.g. vehiculo_modelo on (model, brand)) join on
    all columns directly — no concat composite keys (SURVEY.md J2/F11).
    """
    fact_cols = fact_cols or value_cols
    lookup = dim.select(
        *[F.col(v).alias(f) for v, f in zip(value_cols, fact_cols)], id_col
    )
    return facts.join(F.broadcast(lookup), on=fact_cols, how="left")
