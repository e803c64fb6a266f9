"""Deterministic hash-based sampling / splitting for training-data
pipelines.

Random sampling (df.sample / sampleBy) is seed-reproducible within Spark
but not portable or stable under repartitioning of inputs across engines.
Training pipelines instead split on a HASH of a stable id: the assignment
of any given document never changes as the corpus grows, is identical on
every engine that can compute the hash (md5 here — Spark == DuckDB), and
requires no coordination. This is how production train/val/test splits and
reproducible subsamples are done at 100 TB: a narrow, shuffle-free column
expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Stable bucket in [0, SPLIT_BUCKETS): first 8 md5 hex chars of
    ``id:salt`` as a 32-bit int, mod the bucket count. Changing the salt
    re-rolls every assignment (fresh independent split)."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % SPLIT_BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label. ``splits`` maps label
    -> fraction (must sum to <= 1; remainder falls into the last label).
    Output: input columns + ``split``.

    Fractions are honored in expectation (each id lands in a uniform
    bucket of 1/SPLIT_BUCKETS); the assignment is a pure function of
    (id, salt) — stable across runs, engines, and corpus growth.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = _hash_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    labels = list(splits.items())
    for label, frac in labels[:-1]:
        acc += frac
        cond = bucket < int(round(acc * SPLIT_BUCKETS))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic ``fraction`` subsample by id hash — reproducible and
    consistent across engines/runs (unlike df.sample under repartition)."""
    return df.filter(
        _hash_bucket(F.col(id_col), salt) < int(round(fraction * SPLIT_BUCKETS))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum subsample: each stratum keeps its own
    fraction (e.g. downsample dominant languages, keep all of a rare one).
    Strata missing from ``fractions`` are dropped (fraction 0). Like
    hash_sample, membership is a pure function of (id, salt) — a narrow
    filter expression, no shuffle, stable as the corpus grows.
    """
    bucket = _hash_bucket(F.col(id_col), salt)
    thresh = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        val = F.lit(int(round(frac * SPLIT_BUCKETS)))
        thresh = F.when(cond, val) if thresh is None else thresh.when(cond, val)
    thresh = F.lit(0) if thresh is None else thresh.otherwise(F.lit(0))
    return df.filter(bucket < thresh)


def _nibble_sum_sql(hx: str = "hx") -> str:
    """DuckDB expression: first 8 md5 hex chars of ``hx`` as a long —
    the oracle twin of _hash_bucket's conv(substring(md5, 1, 8), 16, 10)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({hx}, {i}, 1)) - 1) "
        f"* (1::BIGINT << {4 * (8 - i)})"
        for i in range(1, 9)
    )


def stratified_sample_oracle_sql(
    strata_col: str, fractions: dict[str, float], salt: str = "strat"
) -> str:
    """DuckDB oracle for stratified_sample over the documents table."""
    case = "CASE"
    for stratum, frac in fractions.items():
        case += (
            f" WHEN {strata_col} = '{stratum}'"
            f" THEN {int(round(frac * SPLIT_BUCKETS))}"
        )
    case += " ELSE 0 END"
    return f"""
    WITH h AS (
      SELECT *, md5(doc_id::VARCHAR || ':{salt}') AS hx FROM documents
    )
    SELECT doc_id, {strata_col}
    FROM h
    WHERE ({_nibble_sum_sql()}) % {SPLIT_BUCKETS} < {case}
    """


def hash_split_oracle_sql(
    splits: dict[str, float] | None = None, salt: str = "split"
) -> str:
    """DuckDB oracle for hash_split over the documents table: the same
    8-hex-nibble md5 bucket rebuilt via strpos arithmetic."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    nibble_sum = " + ".join(
        f"(strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1) "
        f"* (1::BIGINT << {4 * (8 - i)})"
        for i in range(1, 9)
    )
    case = "CASE"
    acc = 0.0
    labels = list(splits.items())
    for label, frac in labels[:-1]:
        acc += frac
        case += f" WHEN bucket < {int(round(acc * SPLIT_BUCKETS))} THEN '{label}'"
    case += f" ELSE '{labels[-1][0]}' END"
    return f"""
    WITH hx AS (
      SELECT doc_id,
             md5(doc_id::VARCHAR || ':{salt}') AS hx
      FROM documents
    ),
    b AS (
      SELECT doc_id, ({nibble_sum}) % {SPLIT_BUCKETS} AS bucket FROM hx
    )
    SELECT doc_id, {case} AS split FROM b
    """


def _apply_plan(
    df: DataFrame,
    plan: DataFrame,
    strata_col: str,
    id_col: str,
    salt: str,
) -> DataFrame:
    """Shared membership tail of the mixture samplers: broadcast the
    strata-cardinality plan onto the corpus and keep rows whose md5
    bucket clears the stratum's keep_buckets — one broadcast join +
    one narrow filter, never a corpus shuffle."""
    return (
        df.join(
            F.broadcast(plan.select(strata_col, "keep_buckets")),
            strata_col,
        )
        .filter(_hash_bucket(F.col(id_col), salt) < F.col("keep_buckets"))
        .drop("keep_buckets")
    )


def mixture_rebalance(
    df: DataFrame,
    strata_col: str,
    target_shares: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix",
) -> tuple[DataFrame, DataFrame]:
    """Rebalance a corpus to a target mixture over ``strata_col`` (the
    domain/language-weighting step of training-data pipelines): find the
    LARGEST total corpus size S such that every stratum can supply its
    target share (S = floor(min_l n_l / T_l)), then deterministically
    hash-sample each stratum down to share T_l of S.

    Returns ``(sampled_df, plan_df)`` where plan_df is one row per target
    stratum: (strata_col, n_rows, keep_buckets) — keep_buckets / 10000 is
    the keep fraction actually applied.

    Scale: the plan is a per-stratum aggregate (map-side combined, a few
    rows) broadcast back onto the corpus; membership is then the same
    narrow md5-bucket filter as stratified_sample — no corpus shuffle at
    any point, and the whole computation stays on the cluster (no driver
    collect). Corpus strata absent from ``target_shares`` are dropped; a
    TARGET stratum with zero corpus rows forces S = 0 (empty sample) and
    shows up in plan_df with n_rows = 0, keep_buckets = 0 — the target
    mixture is unattainable and the operator says so rather than silently
    shipping a corpus that misses a requested domain.
    """
    if not target_shares:
        raise ValueError("target_shares must be non-empty")
    for stratum, share in target_shares.items():
        if share <= 0:
            raise ValueError(f"share for {stratum!r} must be > 0")
    # Left-join observed counts onto the target list (not vice versa) so a
    # stratum with zero corpus rows participates in the min() with n=0.
    targets = df.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in target_shares.items()],
        schema=f"{strata_col} string, _share double",
    )
    observed = (
        df.filter(F.col(strata_col).isin(list(target_shares)))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    counts = targets.join(observed, strata_col, "left").withColumn(
        "n_rows", F.coalesce("n_rows", F.lit(0).cast("long"))
    )
    s = counts.agg(
        F.min(F.floor(F.col("n_rows") / F.col("_share")))
        .cast("long")
        .alias("_s")
    )
    plan = counts.crossJoin(F.broadcast(s)).withColumn(
        "keep_buckets",
        F.when(F.col("n_rows") > 0,
               F.floor(F.col("_share") * F.col("_s") / F.col("n_rows")
                       * SPLIT_BUCKETS))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    sampled = _apply_plan(df, plan, strata_col, id_col, salt)
    return sampled, plan.select(strata_col, "n_rows", "keep_buckets")


def _plan_kept_sql(strata_col: str, salt: str, where: str = "") -> str:
    """Shared oracle tail of the mixture samplers: realized kept counts
    under the md5-bucket membership, joined back onto the plan. Expects
    a CTE named ``plan`` with (strata_col, n_rows, keep_buckets) to be
    in scope; ``where`` filters the membership scan (e.g. the NULL-
    strata drop)."""
    return f"""
    h AS (
      SELECT doc_id, {strata_col},
             md5(doc_id::VARCHAR || ':{salt}') AS hx
      FROM documents
      {where}
    ),
    kept AS (
      SELECT h.{strata_col}, COUNT(*) AS kept_rows
      FROM h JOIN plan USING ({strata_col})
      WHERE ({_nibble_sum_sql()}) % {SPLIT_BUCKETS} < plan.keep_buckets
      GROUP BY h.{strata_col}
    )
    SELECT p.{strata_col}, p.n_rows, p.keep_buckets,
           COALESCE(k.kept_rows, 0) AS kept_rows
    FROM plan p LEFT JOIN kept k USING ({strata_col})"""


def mixture_rebalance_oracle_sql(
    strata_col: str, target_shares: dict[str, float], salt: str = "mix"
) -> str:
    """DuckDB oracle for the mixture_rebalance PLAN + realized kept counts
    over the documents table: same floor arithmetic, same md5 buckets."""
    strata_list = ", ".join(f"'{k}'" for k in target_shares)
    target_values = ", ".join(
        f"('{k}', {float(v)!r})" for k, v in target_shares.items()
    )
    return f"""
    WITH targets({strata_col}, share) AS (VALUES {target_values}),
    observed AS (
      SELECT {strata_col}, COUNT(*) AS n_rows
      FROM documents
      WHERE {strata_col} IN ({strata_list})
      GROUP BY {strata_col}
    ),
    counts AS (
      SELECT t.{strata_col}, COALESCE(o.n_rows, 0) AS n_rows, t.share
      FROM targets t LEFT JOIN observed o USING ({strata_col})
    ),
    smax AS (
      SELECT MIN(CAST(FLOOR(n_rows / share) AS BIGINT)) AS s FROM counts
    ),
    plan AS (
      SELECT {strata_col}, n_rows,
             CASE WHEN n_rows > 0 THEN
               CAST(FLOOR(share * s / n_rows * {SPLIT_BUCKETS}) AS BIGINT)
             ELSE 0 END AS keep_buckets
      FROM counts, smax
    ),
    {_plan_kept_sql(strata_col, salt)}
    """


def per_source_cap(
    df: DataFrame,
    cap: int = 100,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` documents per source/domain, choosing the
    ``cap`` smallest ``id_col`` values (deterministic, engine-portable) —
    the standard web-corpus curation guard against a handful of mega
    domains dominating the training mixture.

    Scale: a plain per-source window serializes each source onto one
    task, which breaks on skewed corpora (one domain with billions of
    rows). ``salt_buckets`` enables the two-phase cap: phase 1 keeps the
    ``cap`` smallest ids within each (source, salt) — bounded partitions
    — so phase 2's exact window sees at most ``cap * salt_buckets`` rows
    per source. The global answer is identical: any id among a source's
    ``cap`` smallest is also among its salt bucket's ``cap`` smallest.
    """
    from pyspark.sql import Window

    if salt_buckets:
        wsalt = Window.partitionBy(source_col, "_salt").orderBy(id_col)
        df = (
            df.withColumn(
                "_salt", F.crc32(F.col(id_col).cast("string")) % salt_buckets
            )
            .withColumn("_rn", F.row_number().over(wsalt))
            .filter(F.col("_rn") <= cap)
            .drop("_rn", "_salt")
        )
    w = Window.partitionBy(source_col).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def per_source_cap_oracle_sql(
    cap: int = 100, source_col: str = "source", id_col: str = "doc_id"
) -> str:
    return f"""
    SELECT * FROM documents
    QUALIFY row_number() OVER (PARTITION BY {source_col}
                               ORDER BY {id_col}) <= {cap}
    """


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    tau: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "temp",
) -> tuple[DataFrame, DataFrame]:
    """Temperature-scaled mixture resampling (the multilingual
    LM-data-balancing knob of Conneau et al., XLM-R, arXiv:1911.02116):
    rebalance so stratum ``l``'s share of the output is proportional to
    ``n_l ** tau``. ``tau=1`` keeps natural proportions (everything is
    kept); ``tau=0`` targets a uniform mixture capped by the smallest
    stratum (which is then kept whole); the usual ``tau in (0, 1)``
    upsamples the tail RELATIVE to the head without the caller having
    to know the corpus composition — unlike :func:`mixture_rebalance`,
    no explicit target shares are supplied. At intermediate ``tau`` the
    smallest stratum keeps its floor-quantized share (close to, not
    exactly, whole — the scale floor can shave a few percent).

    Entirely in-engine: ONE per-stratum count (map-side combined,
    strata-cardinality rows; the scale factor is a window-min over that
    same tiny relation, so the corpus is scanned once), then the same
    broadcast-plan + md5-bucket membership filter as the other
    samplers — no corpus shuffle, no driver collect. A keep fraction
    the 1/10000-bucket quantization cannot express clamps UP to one
    bucket: under extreme (>10^4x) skew a head stratum overshoots its
    tiny target rather than silently vanishing from the mixture.

    Determinism note: ``tau=0.5`` routes through ``sqrt``, which IEEE
    754 requires to be correctly rounded — bit-identical across Spark,
    DuckDB, and numpy, so the whole plan (floors included) is
    cross-engine exact; other ``tau`` values use ``pow``, whose last
    ulp is implementation-defined (fine in production, not pinned by
    the oracle). NULL strata are dropped (no defined share).

    Returns ``(sampled_df, plan_df)``; plan_df is one row per stratum:
    ``(strata_col, n_rows, keep_buckets)``.
    """
    from pyspark.sql import Window

    if tau < 0 or tau > 1:
        raise ValueError(f"tau must be in [0, 1], got {tau}")
    n = F.col("n_rows")
    share = F.sqrt(n) if tau == 0.5 else F.pow(n, F.lit(float(tau)))
    counts = (
        df.filter(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("_share", share)
    )
    # scale factor as a window-min over the counts relation itself:
    # a separate agg + crossJoin would instantiate the counts subtree
    # (and its corpus scan) twice per action
    w = Window.partitionBy()  # strata-cardinality rows, not the corpus
    plan = counts.withColumn(
        "_s", F.min(F.floor(n / F.col("_share"))).over(w).cast("long")
    ).withColumn(
        "keep_buckets",
        F.greatest(
            F.floor(
                F.col("_share") * F.col("_s") / n * F.lit(SPLIT_BUCKETS)
            ),
            F.lit(1),
        ).cast("long"),
    )
    sampled = _apply_plan(df, plan, strata_col, id_col, salt)
    return sampled, plan.select(strata_col, "n_rows", "keep_buckets")


def temperature_mixture_oracle_sql(
    strata_col: str, salt: str = "temp"
) -> str:
    """DuckDB oracle for temperature_mixture at tau=0.5 over the
    documents table: identical sqrt/floor/clamp arithmetic (sqrt is
    correctly rounded in both engines, so every floor boundary agrees),
    identical md5 bucket membership, plus the realized kept counts."""
    return f"""
    WITH counts AS (
      SELECT {strata_col}, COUNT(*) AS n_rows
      FROM documents
      WHERE {strata_col} IS NOT NULL
      GROUP BY {strata_col}
    ),
    shares AS (
      SELECT {strata_col}, n_rows, sqrt(n_rows) AS _share FROM counts
    ),
    plan AS (
      SELECT {strata_col}, n_rows,
             GREATEST(
               CAST(floor(
                 _share
                 * MIN(CAST(floor(n_rows / _share) AS BIGINT)) OVER ()
                 / n_rows * {SPLIT_BUCKETS}
               ) AS BIGINT),
               1
             ) AS keep_buckets
      FROM shares
    ),
    {_plan_kept_sql(strata_col, salt,
                    where=f"WHERE {strata_col} IS NOT NULL")}
    """
