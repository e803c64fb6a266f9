"""Historized appends (SURVEY.md §2.6) with SERIAL-parity child ids.

Child tables are append-only; history accumulates per entity per file load
(reference README.md:68,94,196). Surrogate child ids continue from the
current max, assigned deterministically by ``order_cols``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.storage import Catalog


def append_with_id(
    catalog: Catalog,
    table: str,
    id_col: str,
    df: DataFrame,
    order_cols: list[str],
) -> None:
    """Append ``df`` to ``table`` assigning ``id_col`` = max+row_number.

    Adds audit timestamps (date_created/date_updated) like every reference
    table (`model.sql:18-19`), plus a ``load_date`` partition column:
    history tables accumulate forever, so at scale they are laid out by
    ingestion day — time-range queries prune partitions and compaction has
    a natural unit (SURVEY.md §7.1.8). No-op on an empty batch.
    """
    if df.limit(1).count() == 0:
        return
    max_id = 0
    if catalog.exists(table):
        max_id = catalog.read(table).agg(F.max(id_col)).first()[0] or 0
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    now = F.current_timestamp()
    out = df.select(
        (F.row_number().over(w) + F.lit(max_id)).cast("long").alias(id_col),
        *df.columns,
        now.alias("date_created"),
        now.alias("date_updated"),
        F.current_date().alias("load_date"),
    )
    if catalog.exists(table):
        out = out.select(*catalog.read(table).columns)
        catalog.append(out, table, partition_cols=["load_date"])
    else:
        catalog.overwrite(out, table, partition_cols=["load_date"])
