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
timestamp (cast to epoch seconds), and strings — string columns take
their ``2**bits - 1`` boundaries from a bounded deterministic sample
(sorted driver-side; ~64k values max regardless of table size, sized
via the metadata row count when available) and bucket by plain
lexicographic comparison, so the file stats' string min/max stay
meaningful and both equality and range predicates prune. Sampling only
shapes clustering QUALITY, never correctness: the bucket value is a
function of the row alone, and reads always re-apply exact predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_Z_COL = "__zval"


def _normalized(df: DataFrame, col: str) -> Column:
    """The column as an ORDERABLE value for quantile bucketing:
    numerics cast to double, date/timestamp via epoch seconds, strings
    pass through (lexicographic order). Raises for anything else."""
    dt = df.schema[col].dataType
    if isinstance(dt, (T.DateType, T.TimestampNTZType)):
        # neither casts straight to double; hop via TIMESTAMP
        return F.col(col).cast("timestamp").cast("double")
    if isinstance(dt, T.TimestampType):
        return F.col(col).cast("double")
    if isinstance(dt, T.NumericType):
        return F.col(col).cast("double")
    if isinstance(dt, T.StringType):
        return F.col(col)
    raise ValueError(
        f"zorder_by column {col!r} has unsupported type {dt.simpleString()};"
        " supported: numeric, date, timestamp, string"
    )


def _string_boundaries(df: DataFrame, col: str, nb: int) -> list[str]:
    """``nb - 1`` lexicographic range boundaries for a string column,
    from a BOUNDED deterministic sample: the driver never holds more
    than ~64k values however large the table is (fraction sized via the
    metadata row count when the frame exposes one, else a cheap
    count). Sorted sample -> evenly spaced picks — the sampled
    analogue of approxQuantile, which is numeric-only."""
    cap = 1 << 16
    base = df.select(F.col(col).alias("s")).filter(F.col("s").isNotNull())
    n = base.count()
    if n == 0:
        return []
    frac = min(1.0, cap / float(n))
    sample = base if frac >= 1.0 else base.sample(frac, seed=42)
    vals = sorted(r["s"] for r in sample.collect())
    if not vals:
        vals = sorted(r["s"] for r in base.limit(cap).collect())
    return [vals[int(i * len(vals) / nb)] for i in range(1, nb)]


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
    is_str = [
        isinstance(df.schema[c].dataType, T.StringType) for c in cols
    ]
    # bounded driver collects: (2**bits - 1) boundaries per column —
    # approxQuantile for the numeric-ish ones, a deterministic sorted
    # sample for strings (approxQuantile is numeric-only)
    probs = [j / nb for j in range(1, nb)]
    num_idx = [i for i, s in enumerate(is_str) if not s]
    num_bounds = (
        df.select(
            *[norms[i].alias(f"__n{i}") for i in num_idx]
        ).stat.approxQuantile(
            [f"__n{i}" for i in num_idx], probs, 1.0 / (4 * nb)
        )
        if num_idx
        else []
    )
    bounds: list[list] = [None] * len(cols)
    for pos, i in enumerate(num_idx):
        bounds[i] = num_bounds[pos]
    for i, s in enumerate(is_str):
        if s:
            bounds[i] = _string_boundaries(df, cols[i], nb)
    buckets = []
    for n, bs, s in zip(norms, bounds, is_str):
        if not bs:  # empty table or all-NULL column
            buckets.append(F.lit(0))
            continue
        arr = F.array(
            *[F.lit(b if s else float(b)) for b in bs]
        )
        # F.aggregate invokes the lambda during construction, so the
        # loop-variable closure over ``n`` binds immediately
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
