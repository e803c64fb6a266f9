"""Data-quality operators: single-pass table profiling and declarative
constraint validation (the deequ/expectations niche, Spark-first).

Both produce small reports from corpus-scale inputs with the right
100 TB shapes:

- :func:`profile_table` is ONE aggregation over the table — every
  per-column statistic (nulls, distincts, min/max) rides the same
  map-side partial aggregate; the exchange carries one partial row per
  task, never data rows. ``approx=True`` trades exact distincts for
  HyperLogLog so wide tables avoid the multi-distinct Expand.
- :func:`validate_constraints` evaluates the WHOLE suite in one Spark
  action (union of one-row count branches): row-local predicates fuse
  into the scan stage, `unique` adds one groupBy on the key (the
  unavoidable shuffle), `fk` an anti-join against the referenced key
  set (AQE-sized broadcast by default, forceable per Check).

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

from gcp_datalake_pipeline_spark.parallelism import ensure_scan_parallelism


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as strings so one report
    schema covers every column type. Exact distincts by default
    (profiling is a correctness audit).

    One job, one aggregation: all statistics for all columns are
    computed in a single pass and assembled driver-side from ONE
    collected row (bounded: 4 scalars per profiled column).

    Scale note: N exact count_distinct aggregates plan as an Expand of
    N+1 rows per input row (Spark's multi-distinct strategy) — cheap for
    a handful of audited columns, rows x columns at 100 TB x wide.
    ``approx=True`` swaps in ``approx_count_distinct`` (HyperLogLog++,
    relative error ``rsd``): every statistic becomes a plain partial
    aggregate — NO Expand, one map-side pass regardless of column count
    — the mode to point at a wide 100 TB table."""
    cols = cols or df.columns
    # The multi-distinct Expand multiplies rows by n_cols+1 — compute-
    # dense relative to the scan, so a tiny-local input (one split) must
    # not bind the whole profile to one core. Cluster-scale inputs pass
    # through unchanged (see parallelism.py).
    df = ensure_scan_parallelism(df)
    distinct = (
        (lambda c: F.approx_count_distinct(F.col(c), rsd))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            distinct(c).alias(f"{c}__distinct"),
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
    # fk only: True forces a broadcast hint (known-small dimension);
    # None (default) lets AQE decide from runtime stats — the safe
    # default when the referenced table may be too large to collect
    # onto the driver (a forced broadcast of a big ref is an OOM, not
    # a plan choice).
    broadcast: bool | None = None


def validate_constraints(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate ``checks`` against ``df``: (check, n_violations), one row
    per check in input order, 0 = passing.

    ONE Spark action for the whole suite: every check's violation count
    is a one-row DataFrame branch and the report is their union,
    collected once — a 50-check suite costs one job, not 50 (branches
    over the same scan also share it via exchange/subquery reuse).
    Row-local checks (not_null, in_range, in_set, matches) additionally
    fuse into a single aggregation pass; each unique adds a groupBy on
    its key (the unavoidable shuffle); each fk an anti-join against the
    referenced key set (per-Check ``broadcast``: None = AQE decides
    from stats, True = force the hint for a known-small dimension)."""
    spark = df.sparkSession
    names = [ch.name for ch in checks]
    if len(set(names)) != len(names):
        # the collected report is keyed by name; two checks sharing one
        # would silently collapse to a single count for both output rows
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate check names: {dupes}")
    # NO scan spread here (unlike profile_table): constraint predicates
    # are cheap row-local work, and a measured attempt showed the
    # round-robin exchange re-executing per count branch — 2x slower on
    # tiny-local inputs, pure tax. The checks bind to the input's own
    # parallelism, which at cluster scale is already right.
    rowlocal: list[tuple[str, F.Column]] = []
    branches: dict[str, DataFrame] = {}
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
            branches[ch.name] = (
                df.groupBy(*ch.cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
                .agg(
                    F.coalesce(F.sum("__c"), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
            )
        elif ch.kind == "fk":
            keys = ch.ref.select(F.col(ch.ref_col).alias(ch.col)).distinct()
            if ch.broadcast:
                keys = F.broadcast(keys)
            branches[ch.name] = (
                df.filter(F.col(ch.col).isNotNull())
                .join(keys, ch.col, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            )
        else:
            raise ValueError(f"unknown check kind {ch.kind!r}")
    if not checks:  # empty suite: a valid empty report, not an error
        return spark.createDataFrame([], "check string, n_violations long")
    parts: list[DataFrame] = []
    if rowlocal:
        # positional aliases: check names are user strings, not columns
        agg = df.agg(
            *[
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"__v{i}")
                for i, (_name, cond) in enumerate(rowlocal)
            ]
        )
        parts.append(
            agg.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("check"),
                                F.coalesce(F.col(f"__v{i}"), F.lit(0))
                                .cast("long")
                                .alias("n_violations"),
                            )
                            for i, (name, _cond) in enumerate(rowlocal)
                        ]
                    )
                ).alias("s")
            ).select("s.*")
        )
    for name, b in branches.items():
        parts.append(b.select(F.lit(name).alias("check"), "n_violations"))
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    got = {r["check"]: int(r["n_violations"]) for r in report.collect()}
    out = [(ch.name, got[ch.name]) for ch in checks]
    return spark.createDataFrame(out, "check string, n_violations long")


def profile_oracle_sql(table: str, cols: list[str]) -> str:
    selects = []
    for c in cols:
        selects.append(
            f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
            CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_nulls,
            COUNT(DISTINCT {c}) AS n_distinct,
            CAST(MIN({c}) AS VARCHAR) AS min_value,
            CAST(MAX({c}) AS VARCHAR) AS max_value
            FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects)


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact Pearson correlation over every column pair: (col_x, col_y,
    n_rows, corr), col_x < col_y lexicographically.

    Exactness contract: the five sufficient statistics per pair
    (Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL(18,6)-derived exact
    decimals — order-free, so cross-engine float summation can never
    diverge — and only the FINAL closed form

        (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)·(n·Σy² − Σy²))

    runs in double (identical IEEE ops on identical exact inputs),
    rounded to 6. Scale: ONE full scan computing all k + k(k+1)/2 sums
    map-side (no shuffle beyond the single-row final combine); rows with
    a NULL in any profiled column are excluded (matching SQL CORR's
    pairwise-complete semantics would need per-pair masks — this is the
    listwise-complete variant, stated so the oracle can mirror it).

    Overflow bound (the graph.py:21-23 contract, stated and ENFORCED):
    each product sum accumulates as DECIMAL(38,12), so Σ|x·y| must stay
    under 1e26 — safe while n_rows · max|x| · max|y| < 1e26, orders of
    magnitude of headroom for metric columns (1e12 rows × values to
    ~1e7), but breachable by e.g. 1e12 rows of 1e8-scale values. Spark
    nulls an overflowed decimal SUM (non-ANSI), which would silently
    become a NULL corr — instead the single sufficient-statistic row is
    checked on the driver and the breach REFUSES with the bound and the
    pre-scale exit (divide the column by a constant; Pearson is
    scale-invariant). The collected row is 1 row of k + k(k+1)/2
    decimals — the sanctioned bounded-collect shape — and the final
    closed form still evaluates Spark-side on the re-lifted literals,
    keeping the cross-engine HALF_UP rounding contract.
    """
    dec = [F.col(c).cast("decimal(18,6)").alias(c) for c in cols]
    d = df.na.drop(subset=cols).select(*dec)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
    pairs = []
    stat_names = [f"s_{c}" for c in cols]
    for i, x in enumerate(cols):
        for y in cols[i:]:
            nm = f"p_{x}__{y}"
            aggs.append(F.sum(F.col(x) * F.col(y)).alias(nm))
            stat_names.append(nm)
            if x != y:
                pairs.append((x, y))
    agg_df = d.agg(*aggs)
    row = agg_df.first()
    if row["n"] and any(row[s] is None for s in stat_names):
        bad = [s for s in stat_names if row[s] is None]
        raise ValueError(
            f"corr_matrix: sufficient statistic(s) {bad} overflowed "
            "DECIMAL(38,12) — the accumulation bound is "
            "n_rows * max|x| * max|y| < 1e26. Pre-scale the offending "
            "column(s) by a constant (Pearson correlation is "
            "scale-invariant) and rerun."
        )
    sums = df.sparkSession.createDataFrame([row], agg_df.schema)
    outs = []
    for x, y in pairs:
        n = F.col("n").cast("double")
        sx, sy = F.col(f"s_{x}").cast("double"), F.col(f"s_{y}").cast("double")
        sxy = F.col(f"p_{x}__{y}").cast("double")
        sxx = F.col(f"p_{x}__{x}").cast("double")
        syy = F.col(f"p_{y}__{y}").cast("double")
        corr = F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        )
        outs.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.col("n").alias("n_rows"),
                corr.alias("corr"),
            )
        )
    return sums.select(F.explode(F.array(*outs)).alias("r")).select("r.*")


def corr_matrix_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle: identical DECIMAL(18,6) sufficient statistics and
    the identical final double expression (NOT DuckDB's CORR aggregate,
    whose streaming accumulation is float-order-dependent)."""
    # DECIMAL(19,6): same exact values as Spark's (18,6), but precision
    # 19 forces DuckDB's HUGEINT physical type — its int64 decimal
    # multiply overflows on products of ~1e10-scaled operands otherwise
    sums = ["COUNT(*) AS n"]
    for c in cols:
        sums.append(f"SUM(CAST({c} AS DECIMAL(19,6))) AS s_{c}")
    pairs = []
    for i, x in enumerate(cols):
        for y in cols[i:]:
            sums.append(
                f"SUM(CAST({x} AS DECIMAL(19,6)) * CAST({y} AS DECIMAL(19,6)))"
                f" AS p_{x}__{y}"
            )
            if x != y:
                pairs.append((x, y))
    where = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    sel = []
    for x, y in pairs:
        sel.append(f"""
      SELECT '{x}' AS col_x, '{y}' AS col_y, n AS n_rows,
             ROUND((n::DOUBLE * p_{x}__{y}::DOUBLE - s_{x}::DOUBLE * s_{y}::DOUBLE)
                   / sqrt((n::DOUBLE * p_{x}__{x}::DOUBLE - s_{x}::DOUBLE * s_{x}::DOUBLE)
                          * (n::DOUBLE * p_{y}__{y}::DOUBLE - s_{y}::DOUBLE * s_{y}::DOUBLE)),
                   6) AS corr
      FROM sums""")
    union = " UNION ALL ".join(sel)
    return f"""
    WITH sums AS (
      SELECT {", ".join(sums)} FROM {table} WHERE {where}
    )
    {union}
    """


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    num_partitions: int = 32,
) -> DataFrame:
    """EXACT discrete quantiles of ``col`` at each q in ``qs``: one
    (q, value) row per quantile, value = the element at 1-based sorted
    position ``max(1, ceil(q * n))`` over the non-null values (type-1 /
    lower discrete quantile — DuckDB's ``quantile_disc`` agrees, but
    the oracle states the definition itself via row_number, not the
    aggregate). NULLs are excluded; q must lie in [0, 1].

    Why not the built-ins: Spark's exact ``percentile`` accumulates a
    per-group value->count map in executor memory (OOM-bound at 100 TB
    cardinality) and ``approx_percentile`` is not exact. This is the
    distributed SELECTION shape instead:

    1. ONE corpus scan folds the column to a (value, count) histogram
       (map-side combined — the exchange carries distinct values, not
       rows);
    2. the histogram is range-partitioned on value and sorted within
       partitions (one bounded shuffle of distinct values), then
       PERSISTED so the two selection jobs see identical partitioning;
    3. per-partition totals (<= num_partitions rows) collect to the
       driver, which prefix-sums them and routes each global target
       index to (partition, local offset) — the only driver state is
       O(num_partitions + len(qs));
    4. one Arrow pass (``mapInPandas`` + cumsum) over ONLY the targeted
       partitions' histograms emits the selected values; untargeted
       partitions return without materializing a batch.

    Exactness is positional, so the result is bit-identical across
    engines — no float summation anywhere."""
    import math

    from pyspark import StorageLevel, TaskContext
    from pyspark.sql import types as T

    qs = sorted({float(q) for q in qs})
    bad = [q for q in qs if not 0.0 <= q <= 1.0]
    if bad:
        raise ValueError(f"quantiles outside [0, 1]: {bad}")
    spark = df.sparkSession
    vtype = df.schema[col].dataType
    out_schema = T.StructType(
        [
            T.StructField("q", T.DoubleType()),
            T.StructField("value", vtype),
        ]
    )
    hist = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .repartitionByRange(num_partitions, F.col("_v"))
        .sortWithinPartitions("_v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        totals = {
            int(r["pid"]): int(r["c"])
            for r in hist.groupBy(
                F.spark_partition_id().alias("pid")
            )
            .agg(F.sum("_c").alias("c"))
            .collect()
        }
        n = sum(totals.values())
        if n == 0 or not qs:
            return spark.createDataFrame([], out_schema)
        by_pid: dict[int, list[tuple[float, int]]] = {}
        acc = 0
        bounds = []
        for pid in range(num_partitions):
            bounds.append((pid, acc, acc + totals.get(pid, 0)))
            acc += totals.get(pid, 0)
        for q in qs:
            k = max(1, math.ceil(q * n))
            for pid, lo, hi in bounds:
                if lo < k <= hi:
                    by_pid.setdefault(pid, []).append((q, k - lo))
                    break

        def pick(batches):
            import pandas as pd

            pid = TaskContext.get().partitionId()
            want = sorted(by_pid.get(pid, []), key=lambda t: t[1])
            if not want:
                return
            seen = 0
            wi = 0
            for pdf in batches:
                if wi >= len(want):
                    return
                cum = seen + pdf["_c"].cumsum()
                out_q, out_v = [], []
                while wi < len(want) and want[wi][1] <= int(cum.iloc[-1]):
                    idx = int((cum >= want[wi][1]).idxmax())
                    out_q.append(want[wi][0])
                    out_v.append(pdf["_v"].iloc[idx])
                    wi += 1
                seen = int(cum.iloc[-1])
                if out_q:
                    yield pd.DataFrame({"q": out_q, "value": out_v})

        # the selection result is bounded (<= len(qs) rows): materialize
        # it so the histogram cache can release before returning
        rows = hist.mapInPandas(pick, out_schema).collect()
    finally:
        hist.unpersist()
    return spark.createDataFrame(rows, out_schema).orderBy("q")


def exact_quantiles_oracle_sql(
    table: str, col: str, qs: list[float]
) -> str:
    """DuckDB oracle stating the SAME positional definition (1-based
    row_number == max(1, ceil(q*n))) rather than trusting any engine's
    quantile aggregate."""
    qs = sorted({float(q) for q in qs})
    values = ", ".join(f"({q!r})" for q in qs)
    return f"""
    WITH s AS (
      SELECT {col} AS v,
             row_number() OVER (ORDER BY {col}) AS rn,
             count(*) OVER () AS n
      FROM {table} WHERE {col} IS NOT NULL
    ), qs(q) AS (VALUES {values})
    SELECT CAST(q AS DOUBLE) AS q, min(v) AS value
    FROM s JOIN qs
      ON s.rn = GREATEST(1, CAST(CEIL(q * s.n) AS BIGINT))
    GROUP BY q ORDER BY q
    """
