"""Iterative graph ranking: exact integer PageRank and TextRank keywords.

TextRank (Mihalcea & Tarau, EMNLP 2004) extracts corpus keywords by
running PageRank over the token co-occurrence graph — nodes are tokens,
edges connect adjacent tokens, edge weight = co-occurrence count. It is
the classic unsupervised keyword/keyphrase extractor and gives the
engine its iterative-graph primitive (the same loop shape as label
propagation, which dedup.py already uses for near-dup clustering).

Exactness contract: PageRank is usually float-iterated and therefore
engine-divergent. Here every rank lives in INTEGER NANO-UNITS and every
iteration is pure BIGINT arithmetic —

    r_0(v)     = 1e9
    r_{i+1}(v) = 150_000_000 + Σ_{u→v} (r_i(u) · 850 · w(u,v)) DIV (1000 · W(u))

with damping d = 850/1000 and W(u) = Σ_v w(u,v). Floor division makes
each step bit-identical in Spark and DuckDB, so a FIXED number of
iterations yields value-level oracle-checkable ranks (the oracle
macro-expands the iterations — no recursive-CTE aggregation needed).
Overflow bound: r·850·w must stay under 2^63 — safe while
max_rank · max_edge_weight < 1e16, which holds by orders of magnitude
for co-occurrence graphs (ranks concentrate near 1e9–1e11).

Spark-first shape: the edge relation (with its precomputed out-weight)
is built once and persisted; each iteration is ONE shuffle — join
ranks to edges on the source key, groupBy destination with a map-side
combined BIGINT sum, left-join back to the node set so isolated nodes
keep the teleport term. Ten iterations = ten shuffles; at cluster
scale, pre-partitioning edges by source key makes the per-iteration
join co-located. Lineage is truncated by persisting each iteration and
unpersisting the previous one.

Reference boundary: no counterpart in the reference engine
(`etl-gcs-cloudsql/src/services/*.ts` are row validators); this is
part of the training-data / text-analysis surface the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INIT_RANK = 1_000_000_000  # nano-units: r_0 = 1.0
TELEPORT = 150_000_000  # (1 - d) = 0.15 in nano-units
D_NUM, D_DEN = 850, 1000  # damping d = 0.85 as an exact ratio


def token_cooccurrence_edges(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(u, v, w): the undirected token adjacency graph — one row per
    direction, weight = adjacency count, self-loops dropped. Tokens
    follow the engine-wide lower/trim whitespace convention."""
    from gcp_datalake_pipeline_spark.parallelism import (
        ensure_scan_parallelism,
    )

    # the adjacency explode is compute-dense: spread tiny local scans
    # (cluster no-op — see parallelism.py)
    docs = ensure_scan_parallelism(docs)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    bg = docs.select(toks.alias("tokens")).select(
        F.explode(
            F.expr(
                "transform(slice(tokens, 1, greatest(size(tokens) - 1, 0)), "
                "(t, i) -> struct(t as u, tokens[i + 1] as v))"
            )
        ).alias("b")
    ).select("b.u", "b.v").filter(F.col("u") != F.col("v"))
    sym = bg.union(bg.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return sym.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    node_col: str = "token",
    complete_inedges: bool = False,
) -> DataFrame:
    """(token, r): integer-nano PageRank after exactly ``iters``
    iterations over directed weighted ``edges`` (u, v, w). Callers with
    undirected graphs pass both directions (see
    :func:`token_cooccurrence_edges`).

    ``complete_inedges=True`` promises every node with out-edges also
    has at least one IN-edge (true for any symmetrized graph): the
    per-iteration left join back to the node set — whose only job is to
    keep in-degree-0 nodes on the teleport term — is then a no-op and
    is skipped, removing one join + one shuffle of the node set per
    iteration. The edge relation is hash-partitioned on the join key
    once before persisting, so every iteration's rank-to-edge join
    reuses that layout instead of re-exchanging the edges."""
    from pyspark.storagelevel import StorageLevel

    wout = edges.groupBy("u").agg(F.sum("w").alias("wu"))
    ej = (
        edges.join(wout, "u")
        .repartition("u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = ej.select(F.col("u").alias(node_col)).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ranks = nodes.select(
        node_col, F.lit(INIT_RANK).cast("long").alias("r")
    )
    prev = None
    for _ in range(iters):
        contrib = (
            ranks.join(ej, ranks[node_col] == ej["u"])
            .groupBy("v")
            .agg(
                F.sum(
                    F.expr(f"(r * {D_NUM} * w) DIV ({D_DEN} * wu)")
                ).alias("c")
            )
        )
        if complete_inedges:
            ranks = contrib.select(
                F.col("v").alias(node_col),
                (F.lit(TELEPORT).cast("long") + F.col("c")).alias("r"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        else:
            ranks = (
                nodes.join(contrib, nodes[node_col] == contrib["v"], "left")
                .select(
                    node_col,
                    (
                        F.lit(TELEPORT).cast("long")
                        + F.coalesce(F.col("c"), F.lit(0))
                    ).alias("r"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
        if prev is not None:
            prev.unpersist()
        prev = ranks
    return ranks


def textrank_topk(
    docs: DataFrame, k: int = 25, iters: int = 10, text_col: str = "text"
) -> DataFrame:
    """Top-``k`` corpus keywords by TextRank: (token, r), rank desc with
    token tiebreak — a TakeOrdered, never a global sort."""
    # the co-occurrence graph is symmetric, so every ranked node has
    # in-edges — the isolated-node left join is skippable (see pagerank)
    ranks = pagerank(
        token_cooccurrence_edges(docs, text_col),
        iters,
        complete_inedges=True,
    )
    return ranks.orderBy(F.desc("r"), "token").limit(k)


def textrank_topk_oracle_sql(k: int = 25, iters: int = 10) -> str:
    """DuckDB oracle: identical tokenization/graph/integer iteration,
    macro-expanded to ``iters`` chained CTEs (fixed iteration count =
    plain SQL, no recursive-CTE aggregation restrictions)."""
    steps = ""
    for i in range(iters):
        steps += f""",
    r{i + 1} AS (
      SELECT n.token, {TELEPORT}::BIGINT + COALESCE(s.c, 0) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.v AS token,
               SUM((p.r * {D_NUM} * e.w) // ({D_DEN} * wo.wu)) AS c
        FROM r{i} p
        JOIN edges e ON e.u = p.token
        JOIN wout wo ON wo.u = e.u
        GROUP BY e.v
      ) s ON s.token = n.token
    )"""
    return f"""
    WITH tk AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    bg AS (
      SELECT unnest([struct_pack(w1 := t[i], w2 := t[i + 1])
                     for i in generate_series(1, len(t) - 1)]) AS b
      FROM tk
    ),
    e0 AS (SELECT b.w1 AS u, b.w2 AS v FROM bg WHERE b.w1 != b.w2),
    edges AS (
      SELECT u, v, COUNT(*)::BIGINT AS w FROM (
        SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
      ) GROUP BY 1, 2
    ),
    wout AS (SELECT u, SUM(w) AS wu FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT u AS token FROM edges),
    r0 AS (SELECT token, {INIT_RANK}::BIGINT AS r FROM nodes){steps}
    SELECT token, CAST(r AS BIGINT) AS r FROM r{iters}
    ORDER BY r DESC, token
    LIMIT {k}
    """
