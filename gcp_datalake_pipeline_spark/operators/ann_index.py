"""Persisted IVF index: build once, append batches, query many times.

:func:`~gcp_datalake_pipeline_spark.operators.similarity.ivf_topk`
recomputes cell assignment on every call — right for one-off queries,
wrong for the production ANN serving shape, where a 100 TB corpus is
indexed ONCE and then probed continuously. This module stores the index
in the catalog:

- ``{index}_centroids`` — the nlist (cid, cv) rows (bounded by
  definition; Lloyd-refined via
  :func:`~gcp_datalake_pipeline_spark.operators.similarity.kmeans_centroids`);
- ``{index}_cells`` — the corpus assigned to cells, stored PARTITIONED
  BY ``cid``, so a query's candidate scan is partition-pruned to its
  probed cells (``PartitionFilters: [cid IN (...)]``): a query touches
  ~nprobe/nlist of the data ON DISK, not just in compute.

New batches extend the index without touching stored data
(:func:`extend_ivf_index`: assign against the FROZEN centroids, append
only the new cells' files) — the standard IVF practice of training
centroids on an initial sample and streaming the rest in.

Query semantics are value-identical to
``ivf_topk(corpus, ..., centroids=<the index's centroids>)`` — same
rounded-cosine assignment, probe ordering, and rank tiebreaks — so the
persisted path shares the recompute path's DuckDB oracle.

Reference boundary: the reference has no ANN surface; this extends the
similarity-search family the brief requires (brute force -> LSH -> IVF ->
persisted IVF) to its serving form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.similarity import (
    _as_double,
    _assign_cells_arrow,
    _cosine_pandas_udf,
    kmeans_centroids,
)


def _cents_dict(rows) -> dict[int, list[float]]:
    return {int(r["cid"]): [float(x) for x in r["cv"]] for r in rows}


def build_ivf_index(
    catalog,
    df: DataFrame,
    index_table: str = "ann_ivf",
    nlist: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "arrow",
) -> DataFrame:
    """Train centroids on ``df`` and persist the full index (centroids +
    cid-partitioned cell assignments) — one atomic commit on a
    transactional catalog. Returns the centroid DataFrame.

    Scale: centroid training is the bounded-collect Lloyd loop of
    :func:`kmeans_centroids` (train on a sample for very large corpora
    and pass that sample as ``df``, then :func:`extend_ivf_index` the
    rest); assignment is one Arrow matmul pass over the corpus with NO
    shuffle except the partitioned write itself.
    """
    cents_df = kmeans_centroids(
        df, nlist=nlist, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
        backend=backend,
    )
    cents = _cents_dict(cents_df.collect())
    e = df.select(F.col(id_col).alias("vid"), _as_double(vec_col).alias("v"))
    assigned = _assign_cells_arrow(e, cents)

    def _writes():
        catalog.overwrite(cents_df, f"{index_table}_centroids")
        catalog.overwrite(
            assigned, f"{index_table}_cells", partition_cols=["cid"]
        )

    txn = getattr(catalog, "transaction", None)
    if txn is not None:
        with txn(f"build-{index_table}"):
            _writes()
    else:
        _writes()
    return cents_df


def extend_ivf_index(
    catalog,
    batch: DataFrame,
    index_table: str = "ann_ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Assign a NEW batch against the index's frozen centroids and append
    its cell rows — stored data is never rewritten (the append publishes
    new files into the touched cid partitions only). The extended index
    answers queries exactly as if the full corpus had been indexed with
    these centroids."""
    cents = _cents_dict(catalog.read(f"{index_table}_centroids").collect())
    e = batch.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("v")
    )
    assigned = _assign_cells_arrow(e, cents)
    catalog.append(assigned, f"{index_table}_cells", partition_cols=["cid"])


def ivf_index_topk(
    catalog,
    query_ids: list[int] | None = None,
    k: int = 5,
    nprobe: int = 4,
    index_table: str = "ann_ivf",
    query_vectors: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Top-k over the PERSISTED index: rank the stored centroids per
    query on the driver (bounded — nlist rows), then scan ONLY the probed
    cells' partitions for candidates and exact-rank them.

    The candidate FileScan is partition-pruned (``PartitionFilters:
    [cid IN (...)]``, plan-contract-tested): at 100 TB a k-NN query
    opens ~nprobe/nlist of the corpus files instead of all of them.

    Queries come either as ``query_ids`` (self-query: vectors fetched by
    id with a pushed-down vid filter — row-group stats skipping, bounded
    collect) or as ``query_vectors`` — external ``(query_id, vector)``
    pairs, the ANN SERVING input shape, which touches no corpus data at
    all outside the probed cells. Output: (query_id, neighbor_id,
    cosine_sim, rank) — the same ordering contract as ``ivf_topk``
    (round-6 cosine desc, neighbor_id tiebreak); with external queries,
    neighbor_id == query_id rows are not excluded (ids live in different
    spaces).
    """
    import numpy as np

    spark = catalog.spark
    cells_table = f"{index_table}_cells"
    cents = _cents_dict(catalog.read(f"{index_table}_centroids").collect())
    cids_sorted = sorted(cents)
    C = np.array([cents[c] for c in cids_sorted], dtype=np.float64)

    if (query_ids is None) == (query_vectors is None):
        raise ValueError("pass exactly one of query_ids / query_vectors")
    if query_vectors is not None:
        q_rows = [{"vid": int(q), "v": list(v)} for q, v in query_vectors]
        self_query = False
    else:
        q_rows = (
            catalog.read(cells_table)
            .filter(F.col("vid").isin(query_ids))
            .select("vid", "v")
            .collect()
        )
        self_query = True
    probe_tuples = []
    for r in q_rows:
        qv = np.array(list(r["v"]), dtype=np.float64)
        sims = np.round(
            (C @ qv) / (np.linalg.norm(C, axis=1) * np.linalg.norm(qv)), 6
        )
        order = sorted(
            range(len(cids_sorted)), key=lambda i: (-sims[i], cids_sorted[i])
        )
        for i in order[:nprobe]:
            probe_tuples.append(
                (int(r["vid"]), cids_sorted[i], [float(x) for x in r["v"]])
            )
    probes = spark.createDataFrame(
        probe_tuples, "query_id long, cid long, qv array<double>"
    )
    probe_cids = sorted({t[1] for t in probe_tuples})

    cand = catalog.read(cells_table).filter(F.col("cid").isin(probe_cids))
    sim = _cosine_pandas_udf()(F.col("qv"), F.col("v"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    out = cand.join(F.broadcast(probes), "cid")
    if self_query:
        out = out.filter(F.col("vid") != F.col("query_id"))
    return (
        out.select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            sim.alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )
