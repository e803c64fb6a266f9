"""Z-order (Morton-curve) clustering for the transactional catalog.

``compact(cluster_by=[c])`` makes file-level min/max stats selective for
ONE column (range-partition + sort). A query that filters on a second
column still reads every file: each file's range on that column stays
as wide as the table's. Z-ordering interleaves the BITS of every
clustering column's rank-bucket into one scalar, so sorting by that
scalar makes each output file a tight hyper-rectangle in ALL the listed
dimensions at once — the layout behind Delta's ``OPTIMIZE ... ZORDER
BY`` and the reason a 100 TB lake can serve selective multi-column
lookups from footer stats alone.

Mechanics (all JVM-side after one bounded driver collect per column):

1. Per column, ``approxQuantile`` collects ``2**bits - 1`` range
   boundaries (driver-side, bounded by construction — never data).
2. Each row's per-column bucket is the count of boundaries below its
   value: a higher-order ``aggregate`` over the boundary ARRAY LITERAL
   — whole-stage-codegen'd, no UDF, no shuffle.
3. The z-value interleaves the bucket bits (column i's bit k lands at
   position ``k * ncols + i``) with shift/AND/OR column arithmetic.

NULLs sort first (bucket 0). Supported types: numerics, date,
timestamp (cast to epoch seconds). Strings are rejected — a hash would
destroy the very min/max ordering the stats need; range-bucket them
into a numeric column first if required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_Z_COL = "__zval"


def _normalized(df: DataFrame, col: str) -> Column:
    """The column as a double for quantile bucketing: numerics cast,
    date/timestamp via epoch seconds. Raises for anything else."""
    dt = df.schema[col].dataType
    if isinstance(dt, (T.DateType, T.TimestampNTZType)):
        # neither casts straight to double; hop via TIMESTAMP
        return F.col(col).cast("timestamp").cast("double")
    if isinstance(dt, T.TimestampType):
        return F.col(col).cast("double")
    if isinstance(dt, T.NumericType):
        return F.col(col).cast("double")
    raise ValueError(
        f"zorder_by column {col!r} has unsupported type {dt.simpleString()};"
        " supported: numeric, date, timestamp"
    )


def zvalue_column(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """The interleaved-bits z-value for ``cols`` as a Column over ``df``.

    ``bits`` buckets each column into ``2**bits`` quantile ranges;
    pick it so ``2**(bits * len(cols))`` comfortably exceeds the target
    file count (the default 8 supports ~tens of thousands of files on
    two columns). Cost: one approxQuantile pass per column at build
    time, then ``2**bits`` comparisons + ``bits`` shift/ORs per row per
    column inside codegen."""
    if not cols:
        raise ValueError("zorder_by needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits={bits} x {len(cols)} columns needs {bits * len(cols)}"
            " interleaved bits; a signed 64-bit z-value holds 63 —"
            " lower bits or cluster fewer columns"
        )
    nb = 1 << bits
    norms = [_normalized(df, c) for c in cols]
    probe = df.select(
        *[n.alias(f"__n{i}") for i, n in enumerate(norms)]
    )
    # bounded driver collect: (2**bits - 1) boundaries per column
    probs = [j / nb for j in range(1, nb)]
    bounds = probe.stat.approxQuantile(
        [f"__n{i}" for i in range(len(cols))], probs, 1.0 / (4 * nb)
    )
    buckets = []
    for n, bs in zip(norms, bounds):
        if not bs:  # empty table or all-NULL column
            buckets.append(F.lit(0))
            continue
        arr = F.array(*[F.lit(float(b)) for b in bs])
        buckets.append(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, x: acc
                + F.when(n > x, F.lit(1)).otherwise(F.lit(0)),
            )
        )
    z = F.lit(0).cast("long")
    for k in range(bits):
        for i, b in enumerate(buckets):
            bit = F.shiftright(b, k).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, k * len(cols) + i))
    return z


def apply_zorder(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 8
) -> DataFrame:
    """Range-partition ``df`` into ``n_files`` contiguous z-ranges and
    sort within each — every output file then covers a tight
    hyper-rectangle across all ``cols``. The helper column never
    reaches the written schema."""
    return (
        df.withColumn(_Z_COL, zvalue_column(df, cols, bits))
        .repartitionByRange(n_files, _Z_COL)
        .sortWithinPartitions(_Z_COL)
        .drop(_Z_COL)
    )
