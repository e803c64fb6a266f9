"""Maximal Marginal Relevance (MMR) diversified top-k re-ranking.

MMR (Carbonell & Goldstein, SIGIR 1998) re-ranks a retrieval candidate
set to balance relevance against redundancy — the standard diversity
pass over an ANN result before using it for retrieval-augmented
training-data selection or dedup-aware sampling:

    next = argmax_{c ∈ C\\S} [ λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) ]

Spark-first split of the work:

- the DISTRIBUTED part is everything corpus-sized: candidate
  generation (``brute_force_topk`` — swap in ``lsh_topk``/IVF for a
  standing index) and the candidate×candidate similarity matrix
  (bounded n², computed JVM-side with the engine's rounded-cosine
  convention);
- the greedy selection itself is inherently sequential over ≤ n
  candidates, so it runs driver-side over the collected (n + n²)
  rows — bounded by ``n_candidates``, a config constant, never by the
  corpus (same discipline as the IVF centroid / PQ codebook collects).

Exactness contract: relevance and pair similarities are the 6-decimal
rounded cosines (the ANN-gate convention) lifted to INTEGER MICRO-UNITS;
λ is a micro-unit integer; every greedy score is then pure BIGINT
arithmetic — λ6·rel6 − (1e6−λ6)·maxsim6 — so selection order is exact
and the DuckDB oracle (macro-expanded greedy steps, one CTE per pick)
reproduces it value-for-value. The max-sim term over an empty selected
set is 0, making the first pick the pure-relevance argmax.

Reference boundary: no counterpart in the reference engine; part of
the similarity-search surface the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.similarity import (
    _as_double,
    brute_force_topk,
    dot,
    norm,
)


def _candidate_rel6(
    df: DataFrame, query_id: int, n_candidates: int, id_col: str, vec_col: str
) -> DataFrame:
    """(vid, rel6): micro-unit relevance of the top-n candidate set."""
    cands = brute_force_topk(
        df, [query_id], k=n_candidates, id_col=id_col, vec_col=vec_col
    )
    return cands.select(
        F.col("neighbor_id").alias("vid"),
        F.round(F.col("cosine_sim") * 1e6, 0).cast("long").alias("rel6"),
    )


def _candidate_sims6(
    df: DataFrame, cand_ids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(a, b, sim6): rounded-cosine micro-units between candidate pairs
    (both directions, a != b) — an n² relation bounded by the candidate
    budget, computed as a broadcast self-join in the scan stage."""
    vecs = (
        df.join(F.broadcast(cand_ids), df[id_col] == cand_ids["vid"])
        .select(F.col("vid"), _as_double(vec_col).alias("v"))
        .withColumn("n", norm(F.col("v")))
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.vid") != F.col("b.vid"))
        .select(
            F.col("a.vid").alias("a"),
            F.col("b.vid").alias("b"),
            F.round(
                F.round(
                    dot(F.col("a.v"), F.col("b.v"))
                    / (F.col("a.n") * F.col("b.n")),
                    6,
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("sim6"),
        )
    )


def mmr_rerank(
    spark: SparkSession,
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_candidates: int = 40,
    lam6: int = 700_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sel_rank, vec_id, relevance, mmr_score): the k MMR picks, in
    selection order. ``lam6`` is λ in micro-units (700_000 = 0.7);
    ``mmr_score`` = score6 / 1e12 (λ6·rel6 is micro·micro), one
    correctly-rounded division."""
    rel_rows = _candidate_rel6(
        df, query_id, n_candidates, id_col, vec_col
    )
    cand_ids = rel_rows.select("vid")
    sim_rows = _candidate_sims6(df, cand_ids, id_col, vec_col)

    rel6 = {r["vid"]: r["rel6"] for r in rel_rows.collect()}
    sim6 = {(r["a"], r["b"]): r["sim6"] for r in sim_rows.collect()}

    picked: list[tuple[int, int, int, int]] = []  # (rank, vid, rel6, score6)
    # None = empty selected set (term contributes 0 for the FIRST pick
    # only); afterwards the max is over the TRUE pair similarities,
    # which can be negative — clamping at 0 would under-penalize
    # anti-similar candidates and diverge from the MMR definition
    maxsim: dict[int, int | None] = {v: None for v in rel6}
    remaining = set(rel6)

    def _score6(v: int) -> int:
        ms = maxsim[v]
        return lam6 * rel6[v] - (1_000_000 - lam6) * (ms or 0)

    while remaining and len(picked) < k:
        best = min(remaining, key=lambda v: (-_score6(v), v))
        picked.append((len(picked) + 1, best, rel6[best], _score6(best)))
        remaining.discard(best)
        for v in remaining:
            s = sim6[(v, best)]
            if maxsim[v] is None or s > maxsim[v]:
                maxsim[v] = s
    return spark.createDataFrame(
        [
            (rank, vid, r6 / 1e6, s6 / 1e12)
            for rank, vid, r6, s6 in picked
        ],
        "sel_rank int, vec_id long, relevance double, mmr_score double",
    )


def mmr_rerank_oracle_sql(
    query_id: int,
    k: int = 10,
    n_candidates: int = 40,
    lam6: int = 700_000,
) -> str:
    """DuckDB oracle: identical candidate set and integer scoring, the
    greedy loop macro-expanded to one CTE per pick (sel1..selk). Each
    step excludes prior picks and subtracts the max candidate-to-picked
    micro-similarity; ties break on vid — BIGINT-exact on both engines.
    All shared CTEs and every pick are MATERIALIZED: later picks
    reference every earlier one, and DuckDB's default CTE inlining would
    re-evaluate the chain exponentially in k (observed as a too-many-
    open-files parquet re-scan blowup before the pins).
    """
    mu = 1_000_000 - lam6
    steps, prev_union = "", ""
    for i in range(1, k + 1):
        if i == 1:
            score = f"{lam6}::BIGINT * c.rel6"
            where = "TRUE"
        else:
            score = (
                f"{lam6}::BIGINT * c.rel6 - {mu}::BIGINT * "
                f"(SELECT MAX(s.sim6) FROM sims s WHERE s.a = c.vid "
                f"AND s.b IN ({prev_union}))"
            )
            where = f"c.vid NOT IN ({prev_union})"
        steps += f""",
    sel{i} AS MATERIALIZED (
      SELECT c.vid, c.rel6, {score} AS score6
      FROM cand c WHERE {where}
      ORDER BY score6 DESC, c.vid LIMIT 1
    )"""
        prev_union = " UNION ALL ".join(
            f"SELECT vid FROM sel{j}" for j in range(1, i + 1)
        )
    final = " UNION ALL ".join(
        f"SELECT {i} AS sel_rank, vid AS vec_id, rel6 / 1e6 AS relevance, "
        f"score6 / 1e12 AS mmr_score FROM sel{i}"
        for i in range(1, k + 1)
    )
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
    scored AS (
      SELECT c.vec_id AS vid,
             ROUND(list_inner_product(q.v, c.v) /
                   (sqrt(list_inner_product(q.v, q.v)) *
                    sqrt(list_inner_product(c.v, c.v))), 6) AS cs
      FROM e q JOIN e c ON q.vec_id != c.vec_id
      WHERE q.vec_id = {query_id}
    ),
    cand AS MATERIALIZED (
      SELECT vid, CAST(ROUND(cs * 1e6, 0) AS BIGINT) AS rel6 FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY cs DESC, vid) AS rnk
        FROM scored
      ) WHERE rnk <= {n_candidates}
    ),
    sims AS MATERIALIZED (
      SELECT x.vec_id AS a, y.vec_id AS b,
             CAST(ROUND(ROUND(list_inner_product(x.v, y.v) /
                   (sqrt(list_inner_product(x.v, x.v)) *
                    sqrt(list_inner_product(y.v, y.v))), 6) * 1e6, 0)
                  AS BIGINT) AS sim6
      FROM e x JOIN e y ON x.vec_id != y.vec_id
      WHERE x.vec_id IN (SELECT vid FROM cand)
        AND y.vec_id IN (SELECT vid FROM cand)
    ){steps}
    SELECT * FROM ({final}) ORDER BY sel_rank
    """
