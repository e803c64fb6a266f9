"""Build-time-adaptive scan parallelism.

A tiny local parquet file plans as one or two scan splits, so any
compute-DENSE scan stage (shingling, hashing, regex, interpreted HOF
vector math) binds to one core no matter how many the session has. A
session-wide ``files.minPartitionNum``/``openCostInBytes`` floor (tried
in an earlier round) fixes that but taxes EVERY light query with
per-core task-scheduling overhead — the adaptivity belongs next to the
operators that are actually compute-dense.

``ensure_scan_parallelism`` spreads such inputs ONLY when the planned
split count is below the session's parallelism. The decision happens at
plan-build time: on real cluster inputs (splits >= cores by file size
alone) the DataFrame is returned unchanged — no exchange node in the
plan at all. When it does fire, the input is small by construction
(few splits == few bytes), so the round-robin exchange moves trivial
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_scan_parallelism(
    df: DataFrame, min_parts: int | None = None
) -> DataFrame:
    """Round-robin repartition ``df`` iff it planned fewer partitions
    than ``min_parts`` (default: the session's default parallelism)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:  # planning only, no job
        return df.repartition(target)
    return df
