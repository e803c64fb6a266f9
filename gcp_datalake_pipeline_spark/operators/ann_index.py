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
- ``{index}_pq_codebook`` (PQ indexes only) — the frozen m x ksub
  product-quantization codebook; the cells table then carries an extra
  ``codes`` column and :func:`ivf_index_pq_topk` serves top-k from the
  codes alone (asymmetric-distance lookup sums), never reading the
  vector column off disk.
- ``{index}_vid_map`` — a slim (vid, cid) lookup stored hash-partitioned
  on ``_kb = pmod(xxhash64(vid), B)`` (the corpus tables' bucket layout,
  with the same sidecar so compaction preserves it). Self-queries
  resolve their ids to cells through a bucket-pruned read of this map
  (~16 bytes/vector of metadata), then fetch their vectors from a
  cid-pruned cells scan — neither step opens partitions outside the
  queries' own buckets/cells, where the pre-round-7 path pushed a vid
  filter through EVERY cid partition's footers.

New batches extend the index without touching stored data
(:func:`extend_ivf_index`: assign against the FROZEN centroids, append
only the new cells' files — cells + map commit in one transaction) —
the standard IVF practice of training centroids on an initial sample
and streaming the rest in. ``compact_every`` folds the append-grown dir
lists back to one dir per table on cadence (layouts preserved), the
same small-files remedy the streaming corpus loops use.

Query semantics are value-identical to
``ivf_topk(corpus, ..., centroids=<the index's centroids>)`` — same
rounded-cosine assignment, probe ordering, and rank tiebreaks (probe
ranking is ONE matmul over all queries, with the recompute path's
dot/(|q||c|) association, value-identical after the shared 1e-6
rounding; a similarity sitting exactly on a rounding boundary could in
principle round differently under BLAS matrix-matrix summation order,
so the contract is rounded-value equality, not bit equality of the
unrounded sums) — so the persisted path shares the recompute path's
DuckDB oracle.

Reference boundary: the reference has no ANN surface; this extends the
similarity-search family the brief requires (brute force -> LSH -> IVF ->
persisted IVF) to its serving form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.corpus import (
    _effective_buckets,
    _key_bucket,
)
from gcp_datalake_pipeline_spark.operators.similarity import (
    _as_double,
    _assign_cells_arrow,
    _cosine_pandas_udf,
    kmeans_centroids,
)


def _cents_dict(rows) -> dict[int, list[float]]:
    return {int(r["cid"]): [float(x) for x in r["cv"]] for r in rows}


def _pq_dists_np(X, cb):
    """(B, m, ksub) 6-decimal-rounded squared-L2 between every
    sub-vector of ``X`` and every codebook centroid — the shared
    encode/ADC-table kernel (the
    :func:`~gcp_datalake_pipeline_spark.operators.similarity.pq_topk`
    contract: ip(x,x) - 2 ip(x,c) + ip(c,c), rounded BEFORE any argmin
    or micro-unit scaling, so codes and tables are cross-engine
    stable)."""
    import numpy as np

    m, _ksub, dsub = cb.shape
    Xs = X.reshape(X.shape[0], m, dsub)
    x2 = np.einsum("bsd,bsd->bs", Xs, Xs)[:, :, None]
    xc = np.einsum("bsd,sjd->bsj", Xs, cb)
    c2 = np.einsum("sjd,sjd->sj", cb, cb)[None, :, :]
    return np.round(x2 - 2.0 * xc + c2, 6)


def _assign_encode_arrow(
    df: DataFrame, cents: dict, cb, residual: bool = False
) -> DataFrame:
    """Fused cell assignment + PQ encoding: ONE Arrow pass over the
    corpus computes the coarse cid (rounded-cosine argmax, lowest-cid
    tiebreak — the `_assign_cells_arrow` contract) AND the m uint8-range
    codes (rounded-L2 argmin per subspace, lowest-j tiebreak — the
    pq_topk contract). ``residual`` encodes ``v - centroid[cid]``
    instead of ``v`` (FAISS by_residual): same kernel, applied to the
    assignment residual. Input columns pass through; no shuffle."""
    import numpy as np

    from pyspark.sql import types as T

    cids_sorted = sorted(cents)
    cid_arr = np.array(cids_sorted, dtype=np.int64)
    C = np.array([cents[c] for c in cids_sorted], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("cid", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def assign_encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = np.round(Mn @ Cn.T, 6)
            idx = np.argmax(S, axis=1)
            X = M - C[idx] if residual else M
            D = _pq_dists_np(X, cb)
            pdf = pdf.copy()
            pdf["cid"] = cid_arr[idx]
            pdf["codes"] = list(D.argmin(axis=2).astype(np.int32))
            yield pdf

    return df.mapInPandas(assign_encode, out_schema)


def _pq_codebook(catalog, index_table: str):
    """The index's frozen PQ codebook as ``(cb, residual)`` — an
    (m, ksub, dsub) ndarray plus whether it quantizes assignment
    residuals — or ``(None, False)`` for a flat (no-PQ) index. Bounded
    read: m*ksub rows. Pre-residual indexes (no ``residual`` column)
    read as plain-vector codebooks."""
    import numpy as np

    t = f"{index_table}_pq_codebook"
    if not catalog.exists(t):
        return None, False
    df = catalog.read(t)
    rows = df.collect()
    m = max(int(r["s"]) for r in rows) + 1
    ksub = max(int(r["j"]) for r in rows) + 1
    dsub = len(rows[0]["cv"])
    cb = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in rows:
        cb[int(r["s"]), int(r["j"])] = [float(x) for x in r["cv"]]
    residual = bool(
        "residual" in df.columns and rows and rows[0]["residual"]
    )
    return cb, residual


def build_ivf_index(
    catalog,
    df: DataFrame,
    index_table: str = "ann_ivf",
    nlist: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "arrow",
    num_buckets: int = 64,
    pq_m: int | None = None,
    pq_ksub: int = 16,
    pq_residual: bool = False,
) -> DataFrame:
    """Train centroids on ``df`` and persist the full index (centroids +
    cid-partitioned cell assignments + the bucketed vid->cid map) — one
    atomic commit on a transactional catalog. Returns the centroid
    DataFrame.

    ``pq_m`` turns on PRODUCT-QUANTIZATION storage (the IVF-PQ index):
    the same single corpus pass also encodes every vector into ``pq_m``
    codebook indices (deterministic first-``pq_ksub`` codebooks — the
    :func:`~gcp_datalake_pipeline_spark.operators.similarity.pq_topk`
    contract, which is what keeps ADC serving value-level oracled), the
    codes land as one extra array column in the cells table, and the
    frozen codebook is persisted as ``{index}_pq_codebook``.
    ``pq_residual`` quantizes the ASSIGNMENT RESIDUAL ``v -
    centroid[cid]`` instead of the raw vector (FAISS by_residual=True —
    tighter codes, since residuals live in a smaller ball around the
    origin); the codebook is then the seed vectors' residuals and ADC
    tables become per-(query, probed-cell).
    :func:`ivf_index_pq_topk` then serves top-k from the codes WITHOUT
    ever reading the vector column — at 100 TB the scored candidate
    I/O drops from dim*8 bytes/vector to ~pq_m bytes (parquet column
    pruning skips ``v`` entirely), which is what lets a probed cell's
    candidates fit in executor memory at all.

    Scale: centroid training is the bounded-collect Lloyd loop of
    :func:`kmeans_centroids` (train on a sample for very large corpora
    and pass that sample as ``df``, then :func:`extend_ivf_index` the
    rest); assignment (+ encoding) is one Arrow matmul pass over the
    corpus with NO shuffle except the partitioned writes themselves.
    """
    cents_df = kmeans_centroids(
        df, nlist=nlist, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
        backend=backend,
    )
    cents = _cents_dict(cents_df.collect())
    e = df.select(F.col(id_col).alias("vid"), _as_double(vec_col).alias("v"))
    cb_df = None
    if pq_m is not None:
        import numpy as np

        seeds = e.filter(F.col("vid") < pq_ksub).orderBy("vid").collect()
        if len(seeds) < pq_ksub:
            raise ValueError(
                f"need vec_ids 0..{pq_ksub - 1} for the PQ codebook"
            )
        dim = len(seeds[0]["v"])
        if dim % pq_m:
            raise ValueError(f"dim {dim} not divisible by pq_m={pq_m}")
        dsub = dim // pq_m
        S = np.array([r["v"] for r in seeds], dtype=np.float64)
        if pq_residual:
            # seed residuals w.r.t. their own assigned cells — the same
            # rounded-cosine argmax the corpus pass applies
            cids_sorted = sorted(cents)
            C = np.array(
                [cents[c] for c in cids_sorted], dtype=np.float64
            )
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
            idx = np.argmax(np.round(Sn @ Cn.T, 6), axis=1)
            S = S - C[idx]
        cb = S.reshape(pq_ksub, pq_m, dsub).transpose(1, 0, 2)
        cb_df = catalog.spark.createDataFrame(
            [
                (s, j, [float(x) for x in cb[s, j]], bool(pq_residual))
                for s in range(pq_m)
                for j in range(pq_ksub)
            ],
            "s long, j long, cv array<double>, residual boolean",
        )
        assigned = _assign_encode_arrow(e, cents, cb, residual=pq_residual)
    else:
        assigned = _assign_cells_arrow(e, cents)
    vid_map = assigned.select(
        "vid", "cid", _key_bucket("vid", num_buckets).alias("_kb")
    )
    map_table = f"{index_table}_vid_map"

    def _writes():
        catalog.overwrite(cents_df, f"{index_table}_centroids")
        catalog.overwrite(
            assigned, f"{index_table}_cells", partition_cols=["cid"]
        )
        catalog.overwrite(vid_map, map_table, partition_cols=["_kb"])
        if cb_df is not None:
            catalog.overwrite(cb_df, f"{index_table}_pq_codebook")

    txn = getattr(catalog, "transaction", None)
    if txn is not None:
        with txn(f"build-{index_table}"):
            _writes()
            if hasattr(catalog, "_write_bucket_meta"):
                catalog._write_bucket_meta(map_table, num_buckets, ["vid"])
    else:
        if hasattr(catalog, "_write_bucket_meta"):
            catalog._write_bucket_meta(map_table, num_buckets, ["vid"])
        _writes()
    return cents_df


def extend_ivf_index(
    catalog,
    batch: DataFrame,
    index_table: str = "ann_ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
    load_id: str | None = None,
    rounds_table: str | None = None,
) -> None:
    """Assign a NEW batch against the index's frozen centroids and append
    its cell + map rows — stored data is never rewritten (the appends
    publish new files into the touched partitions only; one transaction,
    so the cells and the vid map can never disagree). The extended index
    answers queries exactly as if the full corpus had been indexed with
    these centroids.

    ``compact_every``: when a table's staged-dir list reaches this many
    dirs after the append, fold it back into one dir (a long-lived index
    otherwise accretes one dir per extend per touched partition — the
    small-files problem). Layouts survive: cells keep ``cid``, the map
    keeps ``_kb`` (bucket sidecar). Best-effort: a compaction losing a
    conflict race to a concurrent extend is skipped, never fails the
    extend.

    ``load_id`` names the commit in the version history (the streaming
    index loop keys exactly-once replay on it); ``rounds_table`` appends
    one (load_id, n_vectors, duration_sec, committed_at) metrics row
    inside the same commit — the observability contract of the corpus
    loops."""
    import time as _time

    t0 = _time.time()
    cents = _cents_dict(catalog.read(f"{index_table}_centroids").collect())
    e = batch.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("v")
    )
    # a PQ index encodes new batches against its FROZEN codebook (the
    # extend contract: stored codes never change meaning), a flat index
    # assigns only
    cb, cb_residual = _pq_codebook(catalog, index_table)
    if cb is not None:
        assigned = _assign_encode_arrow(e, cents, cb, residual=cb_residual)
    else:
        assigned = _assign_cells_arrow(e, cents)
    cells_table = f"{index_table}_cells"
    map_table = f"{index_table}_vid_map"
    # A pre-map index (built before the vid map existed) stays mapless:
    # a PARTIAL map would silently lose self-query vectors for the
    # build-time ids. Rebuild to adopt the pruned self-query path.
    has_map = catalog.exists(map_table)
    txn = getattr(catalog, "transaction", None)

    def _writes():
        catalog.append(assigned, cells_table, partition_cols=["cid"])
        if has_map:
            nb = _effective_buckets(catalog, map_table, ["vid"], 64)
            catalog.append(
                assigned.select(
                    "vid", "cid", _key_bucket("vid", nb).alias("_kb")
                ),
                map_table,
                partition_cols=["_kb"],
            )
        if rounds_table:
            now = _time.time()
            rec = catalog.spark.createDataFrame(
                [
                    (
                        load_id or f"extend-{index_table}",
                        batch.count(),
                        float(now - t0),
                        float(now),
                    )
                ],
                "load_id string, n_vectors long, duration_sec double, "
                "committed_at double",
            )
            catalog.append(rec, rounds_table)

    if txn is not None:
        with txn(load_id or f"extend-{index_table}"):
            _writes()
    else:
        _writes()
    compact = getattr(catalog, "compact", None)
    if compact_every and compact is not None:
        from gcp_datalake_pipeline_spark.transactions import (
            ConcurrentWriteError,
        )

        for table, parts in (
            (cells_table, ["cid"]),
            (map_table, None),
            (rounds_table, None),
        ):
            if not table:
                continue
            if (
                not catalog.exists(table)
                or len(catalog._data_dirs(table)) < compact_every
            ):
                continue
            try:
                compact(table, partition_cols=parts)
            except ConcurrentWriteError:
                pass  # a concurrent extend won; next window retries


def _query_cid_map(catalog, index_table: str, query_ids: list[int]):
    """The bucket-pruned (vid, cid) lookup for a self-query id list:
    filters the vid map to the ids' ``_kb`` partitions (bucket list
    collected on the driver, bounded by num_buckets) — untouched
    buckets' files are never opened."""
    map_table = f"{index_table}_vid_map"
    nb = _effective_buckets(catalog, map_table, ["vid"], 64)
    spark = catalog.spark
    ids = spark.createDataFrame([(int(q),) for q in query_ids], "vid long")
    buckets = [
        r["b"]
        for r in ids.select(_key_bucket("vid", nb).alias("b"))
        .distinct()
        .collect()
    ]
    return (
        catalog.read(map_table)
        .filter(F.col("_kb").isin(buckets))
        .filter(F.col("vid").isin([int(q) for q in query_ids]))
        .select("vid", "cid")
    )


def _self_query_vectors(catalog, index_table: str, query_ids: list[int]):
    """Self-query vector fetch through the index's own layouts: resolve
    ids -> cells via the bucket-pruned map, then read the vectors from a
    cid-pruned cells scan. Both FileScans carry PartitionFilters; at
    100 TB a self-query opens only its ids' buckets and its own cells,
    never every partition's footers. Falls back to the pushed-down
    ``vid IN`` scan over all cells for a pre-map (legacy) index."""
    cells_table = f"{index_table}_cells"
    if not catalog.exists(f"{index_table}_vid_map"):
        out = (
            catalog.read(cells_table)
            .filter(F.col("vid").isin([int(q) for q in query_ids]))
            .select("vid", "v")
        )
    else:
        own_cids = sorted(
            {int(r["cid"]) for r in _query_cid_map(
                catalog, index_table, query_ids
            ).collect()}
        )
        out = (
            catalog.read(cells_table)
            .filter(F.col("cid").isin(own_cids))
            .filter(F.col("vid").isin([int(q) for q in query_ids]))
            .select("vid", "v")
        )
    # a removed id's vector is gone for serving purposes: it neither
    # appears as a neighbor nor resolves as a self-query
    tomb = _tombstones(catalog, index_table)
    if tomb is not None:
        out = out.join(tomb, "vid", "left_anti")
    return out


def ivf_index_topk(
    catalog,
    query_ids: list[int] | None = None,
    k: int = 5,
    nprobe: int = 4,
    index_table: str = "ann_ivf",
    query_vectors: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Top-k over the PERSISTED index: rank the stored centroids for ALL
    queries in one driver-side matmul (bounded — nq x nlist), then scan
    ONLY the probed cells' partitions for candidates and exact-rank them.

    The candidate FileScan is partition-pruned (``PartitionFilters:
    [cid IN (...)]``, plan-contract-tested): at 100 TB a k-NN query
    opens ~nprobe/nlist of the corpus files instead of all of them.

    Queries come either as ``query_ids`` (self-query: vectors fetched
    through the index's bucketed vid map + the queries' own cells, both
    partition-pruned — :func:`_self_query_vectors`) or as
    ``query_vectors`` — external ``(query_id, vector)`` pairs, the ANN
    SERVING input shape, which touches no corpus data at all outside the
    probed cells. Output: (query_id, neighbor_id, cosine_sim, rank) —
    the same ordering contract as ``ivf_topk`` (round-6 cosine desc,
    neighbor_id tiebreak); with external queries, neighbor_id ==
    query_id rows are not excluded (ids live in different spaces).
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
        q_rows = _self_query_vectors(catalog, index_table, query_ids).collect()
        self_query = True
    probe_tuples = []
    if q_rows:
        # one matmul for every query's centroid ranking — the recompute
        # path's dot/(|q||c|) association and 1e-6 rounding, then a
        # STABLE argsort of -sims: columns are ascending cid, so ties
        # break to the lowest cid, exactly the per-query (-sim, cid) sort
        Q = np.array([list(r["v"]) for r in q_rows], dtype=np.float64)
        S = np.round(
            (Q @ C.T)
            / np.outer(
                np.linalg.norm(Q, axis=1), np.linalg.norm(C, axis=1)
            ),
            6,
        )
        order = np.argsort(-S, axis=1, kind="stable")[:, :nprobe]
        for qi, r in enumerate(q_rows):
            qv = [float(x) for x in r["v"]]
            for j in order[qi]:
                probe_tuples.append((int(r["vid"]), cids_sorted[int(j)], qv))
    probes = spark.createDataFrame(
        probe_tuples, "query_id long, cid long, qv array<double>"
    )
    probe_cids = sorted({t[1] for t in probe_tuples})

    cand = catalog.read(cells_table).filter(F.col("cid").isin(probe_cids))
    tomb = _tombstones(catalog, index_table)
    if tomb is not None:
        cand = cand.join(tomb, "vid", "left_anti")
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


def ivf_index_topk_df(
    catalog,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    index_table: str = "ann_ivf",
    id_col: str = "query_id",
    vec_col: str = "qv",
    exclude_self: bool = False,
    prune_cells: bool = True,
) -> DataFrame:
    """DataFrame-input twin of :func:`ivf_index_topk` — the BULK
    re-scoring shape. ``ivf_index_topk`` takes query vectors as a
    driver-side Python list, which is right for interactive serving
    (bounded query batches) and wrong for a job that re-scores millions
    of queries: the list itself would not fit on the driver. Here the
    queries stay a DataFrame end-to-end — centroid ranking runs as an
    Arrow-batched pandas_udf with the (bounded, nlist x dim) centroid
    matrix BROADCAST to executors, one matmul per batch; no query
    vector is ever collected to the driver.

    Probe selection is value-identical to the list path: the same
    dot/(|q||c|) association, 1e-6 rounding, and stable argsort over
    ascending-cid columns (ties to the lowest cid), and the same final
    (cosine desc, neighbor_id) rank window — so both paths share one
    DuckDB oracle.

    ``prune_cells`` (default on) collects the DISTINCT probed cids —
    bounded by nlist, never by query count — to partition-prune the
    cells scan, at the cost of one extra pass over ``queries`` (cheap:
    projection + the probe matmul). A truly exhaustive bulk job whose
    probes cover every cell can pass ``prune_cells=False`` to skip that
    pass. ``exclude_self`` drops neighbor_id == query_id rows (self-query
    semantics, for query ids drawn from the indexed corpus).

    Output: (query_id, neighbor_id, cosine_sim, rank), rank <= k.
    """
    import numpy as np
    import pandas as pd

    cents = _cents_dict(catalog.read(f"{index_table}_centroids").collect())
    cids_sorted = sorted(cents)
    C = np.array([cents[c] for c in cids_sorted], dtype=np.float64)
    sc = catalog.spark.sparkContext
    b_cent = sc.broadcast(
        (C, np.linalg.norm(C, axis=1), np.array(cids_sorted, dtype=np.int64))
    )
    n_probe = min(nprobe, len(cids_sorted))

    def _probe(vs):
        Cm, Cn, cid_arr = b_cent.value
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        Q = np.array(vs.tolist(), dtype=np.float64)
        S = np.round(
            (Q @ Cm.T) / np.outer(np.linalg.norm(Q, axis=1), Cn), 6
        )
        order = np.argsort(-S, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(cid_arr[order]))

    probe_cids = F.pandas_udf(_probe, "array<long>")

    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        _as_double(vec_col).alias("qv"),
    )
    probes = q.withColumn("cid", F.explode(probe_cids(F.col("qv"))))
    cand = catalog.read(f"{index_table}_cells")
    tomb = _tombstones(catalog, index_table)
    if tomb is not None:
        cand = cand.join(tomb, "vid", "left_anti")
    if prune_cells:
        probed = sorted(
            r["cid"] for r in probes.select("cid").distinct().collect()
        )
        cand = cand.filter(F.col("cid").isin(probed))
    sim = _cosine_pandas_udf()(F.col("qv"), F.col("v"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    out = cand.join(probes, "cid")
    if exclude_self:
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


_ADC_SUM = (
    "aggregate(zip_with(codes, qtab,"
    " (c, t) -> element_at(t, c + 1)),"
    " 0L, (acc, x) -> acc + x)"
)


def _rerank_exact(
    catalog,
    shortlist: DataFrame,
    qv_df: DataFrame,
    probe_cids: list[int],
    k: int,
    index_table: str,
    hint_broadcast: bool = True,
) -> DataFrame:
    """FAISS-style refine step shared by both ADC serving paths: fetch
    the TRUE vectors for the (bounded, nq x rerank) ADC shortlist only —
    a cid-pruned cells scan inner-joined to the broadcast shortlist, so
    the refine I/O is candidate-proportional, never cell-proportional —
    and re-rank by exact rounded cosine. ``shortlist``: (query_id,
    neighbor_id); ``qv_df``: (query_id, qv). ``hint_broadcast`` is for
    the bounded driver-list path; the bulk DataFrame path leaves the
    join strategy to AQE (millions of queries must not broadcast)."""
    vec = (
        catalog.read(f"{index_table}_cells")
        .select(F.col("vid").alias("neighbor_id"), "cid", "v")
        .filter(F.col("cid").isin(probe_cids))
        .drop("cid")
    )
    if hint_broadcast:
        shortlist = F.broadcast(shortlist)
        qv_df = F.broadcast(qv_df)
    sim = _cosine_pandas_udf()(F.col("qv"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        vec.join(shortlist, "neighbor_id")
        .join(qv_df, "query_id")
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_index_pq_topk(
    catalog,
    query_ids: list[int] | None = None,
    k: int = 5,
    nprobe: int = 4,
    index_table: str = "ann_ivf",
    query_vectors: list[tuple[int, list[float]]] | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """ADC top-k over a PQ-coded persisted index: rank centroids for all
    queries in one bounded driver matmul (the :func:`ivf_index_topk`
    probe contract), build each query's integer-micro-unit distance
    table from the frozen codebook (bounded: nq x m x ksub), then score
    the probed cells' candidates from their STORED CODES ONLY — the
    candidate scan projects (vid, cid, codes) and parquet column
    pruning never reads the vector column (plan-contract-tested), so a
    query's data I/O is ~pq_m bytes per candidate instead of dim*8.
    Scoring is the JVM higher-order ADC sum of
    :func:`~gcp_datalake_pipeline_spark.operators.similarity.pq_topk`;
    no Python touches the candidates.

    ``rerank`` (FAISS refine): keep the top-``rerank`` ADC candidates
    per query, fetch THEIR true vectors only (cid-pruned scan joined to
    the broadcast shortlist — I/O stays candidate-proportional), and
    re-rank by exact rounded cosine. Recovers exact-scoring accuracy
    within the probed cells while still reading full vectors for only
    nq x rerank rows; output becomes (query_id, neighbor_id,
    cosine_sim, rank) with the ivf_index_topk ordering contract.

    Output (no rerank): (query_id, neighbor_id, adc_dist, rank), rank
    ascending by (adc_dist, neighbor_id); with self-queries
    (``query_ids``) the query's own row is excluded, tombstoned ids
    never appear."""
    import numpy as np

    if rerank is not None and rerank < k:
        raise ValueError(
            f"rerank={rerank} must be >= k={k}: the refine step can only"
            " return neighbors the ADC shortlist contains"
        )
    spark = catalog.spark
    cb, cb_residual = _pq_codebook(catalog, index_table)
    if cb is None:
        raise ValueError(
            f"{index_table} has no PQ codebook — build with pq_m, or use"
            " ivf_index_topk for a flat index"
        )
    cents = _cents_dict(catalog.read(f"{index_table}_centroids").collect())
    cids_sorted = sorted(cents)
    C = np.array([cents[c] for c in cids_sorted], dtype=np.float64)

    if (query_ids is None) == (query_vectors is None):
        raise ValueError("pass exactly one of query_ids / query_vectors")
    if query_vectors is not None:
        q_rows = [{"vid": int(q), "v": list(v)} for q, v in query_vectors]
        self_query = False
    else:
        q_rows = _self_query_vectors(catalog, index_table, query_ids).collect()
        self_query = True
    probe_tuples = []
    if q_rows:
        Q = np.array([list(r["v"]) for r in q_rows], dtype=np.float64)
        S = np.round(
            (Q @ C.T)
            / np.outer(
                np.linalg.norm(Q, axis=1), np.linalg.norm(C, axis=1)
            ),
            6,
        )
        order = np.argsort(-S, axis=1, kind="stable")[:, :nprobe]
        if cb_residual:
            # per-(query, probed cell) tables from the query's residual
            # w.r.t. THAT cell — one batched kernel call, still bounded
            # (nq x nprobe x m x ksub)
            R = (Q[:, None, :] - C[np.asarray(order)]).reshape(
                -1, Q.shape[1]
            )
            T = (
                np.round(_pq_dists_np(R, cb) * 1e6)
                .astype(np.int64)
                .reshape(len(q_rows), order.shape[1], cb.shape[0], -1)
            )
        else:
            T = np.round(_pq_dists_np(Q, cb) * 1e6).astype(np.int64)
        for qi, r in enumerate(q_rows):
            for pi, j in enumerate(order[qi]):
                t = T[qi, pi] if cb_residual else T[qi]
                qtab = [[int(x) for x in row] for row in t]
                probe_tuples.append(
                    (int(r["vid"]), cids_sorted[int(j)], qtab)
                )
    probes = spark.createDataFrame(
        probe_tuples, "query_id long, cid long, qtab array<array<long>>"
    )
    probe_cids = sorted({t[1] for t in probe_tuples})

    cand = (
        catalog.read(f"{index_table}_cells")
        .select("vid", "cid", "codes")
        .filter(F.col("cid").isin(probe_cids))
    )
    tomb = _tombstones(catalog, index_table)
    if tomb is not None:
        cand = cand.join(tomb, "vid", "left_anti")
    out = cand.join(F.broadcast(probes), "cid")
    if self_query:
        out = out.filter(F.col("vid") != F.col("query_id"))
    w_rank = Window.partitionBy("query_id").orderBy(
        "adc_dist", "neighbor_id"
    )
    scored = (
        out.select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            (F.expr(_ADC_SUM) / F.lit(1000000.0)).alias("adc_dist"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= (rerank if rerank is not None else k))
    )
    if rerank is None:
        return scored
    qv_df = spark.createDataFrame(
        [(int(r["vid"]), [float(x) for x in r["v"]]) for r in q_rows],
        "query_id long, qv array<double>",
    )
    return _rerank_exact(
        catalog,
        scored.select("query_id", "neighbor_id"),
        qv_df,
        probe_cids,
        k,
        index_table,
    )


def ivf_index_pq_topk_df(
    catalog,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    index_table: str = "ann_ivf",
    id_col: str = "query_id",
    vec_col: str = "qv",
    exclude_self: bool = False,
    prune_cells: bool = True,
    rerank: int | None = None,
) -> DataFrame:
    """DataFrame-input twin of :func:`ivf_index_pq_topk` — bulk ADC
    serving. Queries stay a DataFrame end-to-end: probe ranking AND the
    per-query micro-unit ADC table are computed by Arrow-batched
    pandas_udfs against the broadcast (bounded) centroid matrix and
    codebook; no query vector is ever collected to the driver. The
    candidate side still reads codes only (column-pruned scan), and
    with ``prune_cells`` the scan is partition-pruned to the distinct
    probed cids (bounded by nlist, never query count). Probe selection,
    rounding, and rank tiebreaks are value-identical to the list path,
    so both share one oracle.

    ``rerank``: the FAISS refine step of :func:`ivf_index_pq_topk`, in
    bulk form — the ADC top-``rerank`` shortlist joins back to a
    cid-pruned cells scan for true vectors and re-ranks by exact
    rounded cosine; join strategy is left to AQE (the shortlist scales
    with query count here, so no broadcast hint)."""
    import numpy as np
    import pandas as pd

    if rerank is not None and rerank < k:
        raise ValueError(
            f"rerank={rerank} must be >= k={k}: the refine step can only"
            " return neighbors the ADC shortlist contains"
        )
    cb, cb_residual = _pq_codebook(catalog, index_table)
    if cb is None:
        raise ValueError(
            f"{index_table} has no PQ codebook — build with pq_m, or use"
            " ivf_index_topk_df for a flat index"
        )
    cents = _cents_dict(catalog.read(f"{index_table}_centroids").collect())
    cids_sorted = sorted(cents)
    C = np.array([cents[c] for c in cids_sorted], dtype=np.float64)
    sc = catalog.spark.sparkContext
    b_idx = sc.broadcast(
        (
            C,
            np.linalg.norm(C, axis=1),
            np.array(cids_sorted, dtype=np.int64),
            cb,
        )
    )
    n_probe = min(nprobe, len(cids_sorted))

    def _order(Q):
        Cm, Cn, _cid_arr, _cb = b_idx.value
        S = np.round(
            (Q @ Cm.T) / np.outer(np.linalg.norm(Q, axis=1), Cn), 6
        )
        return np.argsort(-S, axis=1, kind="stable")[:, :n_probe]

    def _probe(vs):
        _Cm, _Cn, cid_arr, _cb = b_idx.value
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        return pd.Series(list(cid_arr[_order(np.array(vs.tolist(), dtype=np.float64))]))

    def _qtab(vs):
        _Cm, _Cn, _cid_arr, cbB = b_idx.value
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        Q = np.array(vs.tolist(), dtype=np.float64)
        T = np.round(_pq_dists_np(Q, cbB) * 1e6).astype(np.int64)
        return pd.Series([[list(row) for row in t] for t in T])

    def _probe_qtabs(vs):
        # residual path: one (cid, qtab) struct per probe, tables from
        # the query's residual w.r.t. each probed cell
        Cm, _Cn, cid_arr, cbB = b_idx.value
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        Q = np.array(vs.tolist(), dtype=np.float64)
        order = _order(Q)
        R = (Q[:, None, :] - Cm[order]).reshape(-1, Q.shape[1])
        T = (
            np.round(_pq_dists_np(R, cbB) * 1e6)
            .astype(np.int64)
            .reshape(len(Q), order.shape[1], cbB.shape[0], -1)
        )
        return pd.Series(
            [
                [
                    {
                        "cid": int(cid_arr[order[qi, pi]]),
                        "qtab": [list(row) for row in T[qi, pi]],
                    }
                    for pi in range(order.shape[1])
                ]
                for qi in range(len(Q))
            ]
        )

    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        _as_double(vec_col).alias("qv"),
    )
    if cb_residual:
        pq_udf = F.pandas_udf(
            _probe_qtabs,
            "array<struct<cid: long, qtab: array<array<long>>>>",
        )
        probes = (
            q.withColumn("pr", F.explode(pq_udf(F.col("qv"))))
            .select(
                "query_id",
                F.col("pr.cid").alias("cid"),
                F.col("pr.qtab").alias("qtab"),
            )
        )
    else:
        probe_udf = F.pandas_udf(_probe, "array<long>")
        qtab_udf = F.pandas_udf(_qtab, "array<array<long>>")
        probes = (
            q.withColumn("qtab", qtab_udf(F.col("qv")))
            .withColumn("cid", F.explode(probe_udf(F.col("qv"))))
            .drop("qv")
        )
    cand = catalog.read(f"{index_table}_cells").select("vid", "cid", "codes")
    tomb = _tombstones(catalog, index_table)
    if tomb is not None:
        cand = cand.join(tomb, "vid", "left_anti")
    probed = None
    if prune_cells:
        probed = sorted(
            r["cid"] for r in probes.select("cid").distinct().collect()
        )
        cand = cand.filter(F.col("cid").isin(probed))
    out = cand.join(probes, "cid")
    if exclude_self:
        out = out.filter(F.col("vid") != F.col("query_id"))
    w_rank = Window.partitionBy("query_id").orderBy(
        "adc_dist", "neighbor_id"
    )
    scored = (
        out.select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            (F.expr(_ADC_SUM) / F.lit(1000000.0)).alias("adc_dist"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= (rerank if rerank is not None else k))
    )
    if rerank is None:
        return scored
    if probed is None:
        cents_all = sorted(
            _cents_dict(
                catalog.read(f"{index_table}_centroids").collect()
            )
        )
        probed = cents_all
    return _rerank_exact(
        catalog,
        scored.select("query_id", "neighbor_id"),
        q,
        probed,
        k,
        index_table,
        hint_broadcast=False,
    )


def _tombstones(catalog, index_table: str):
    """The removed-vid set as a DataFrame, or None when nothing was ever
    removed (zero overhead on the common path)."""
    t = f"{index_table}_tombstones"
    return catalog.read(t).select("vid") if catalog.exists(t) else None


def pending_tombstones(catalog, index_table: str = "ann_ivf") -> int:
    """Distinct vids tombstoned but not yet physically folded — the
    health number the stats sidecars can't see: ``count_rows`` on
    ``{index}_cells`` (and every metadata aggregate over it) keeps
    counting removed vectors until :func:`compact_index` rewrites them
    out, so serving capacity dashboards need stored-minus-pending, not
    stored. Zero on the common no-deletes path (one exists() check);
    the tombstone table is slim by design, so the distinct count is a
    trivial scan."""
    tomb = _tombstones(catalog, index_table)
    if tomb is None:
        return 0
    return tomb.distinct().count()


def remove_ids(
    catalog, ids: list[int], index_table: str = "ann_ivf"
) -> None:
    """DELETE vectors from the persisted index — tombstone-style, the
    append-only complement of :func:`extend_ivf_index`. The ids land in
    a slim ``{index}_tombstones`` table (one transactional append; no
    stored cells/map data is rewritten — at 100 TB a delete must never
    rewrite cid partitions), and every query path anti-joins the
    tombstone set out of its candidates AND its self-query resolution,
    so a removed id neither appears in any top-k nor serves as a query.
    :func:`compact_index` later folds the tombstones physically.

    Re-adding a removed id: a tombstone shadows ALL rows of that vid —
    including ones appended after the removal — so run
    :func:`compact_index` (which drops the stale rows and clears the
    tombstones) before re-extending with a reused id."""
    spark = catalog.spark
    rows = spark.createDataFrame([(int(i),) for i in ids], "vid long")
    t = f"{index_table}_tombstones"
    txn = getattr(catalog, "transaction", None)
    if txn is not None:
        with txn(f"remove-{index_table}-{len(ids)}ids"):
            catalog.append(rows, t)
    else:
        catalog.append(rows, t)


def compact_index(catalog, index_table: str = "ann_ivf") -> dict:
    """Physically fold tombstones: rewrite the cells and vid-map tables
    WITHOUT the removed vids (layouts preserved — cells stay
    cid-partitioned, the map keeps its ``_kb`` buckets and sidecar, so
    the pruned-probe and self-query contracts survive) and clear the
    tombstone table, all in one transaction. Also the answer to id
    reuse: after compaction a re-extended id serves normally. Returns
    ``{"dropped": rows_reclaimed, "tombstones_cleared": distinct_vids}``
    so operators see exactly what the rewrite bought."""
    cells_table = f"{index_table}_cells"
    map_table = f"{index_table}_vid_map"
    tomb_table = f"{index_table}_tombstones"
    tomb = _tombstones(catalog, index_table)
    if tomb is None or not tomb.take(1):
        # nothing tombstoned (or a prior compaction already folded):
        # never rewrite the cells for a no-op
        return {"dropped": 0, "tombstones_cleared": 0}
    n_tomb = tomb.distinct().count()
    n_before = catalog.read(cells_table).count()
    cells = catalog.read(cells_table).join(tomb, "vid", "left_anti")
    has_map = catalog.exists(map_table)
    empty = catalog.spark.createDataFrame([], "vid long")
    txn = getattr(catalog, "transaction", None)

    def _writes():
        catalog.overwrite(cells, cells_table, partition_cols=["cid"])
        if has_map:
            catalog.overwrite(
                catalog.read(map_table).join(tomb, "vid", "left_anti"),
                map_table,
                partition_cols=["_kb"],
            )
        catalog.overwrite(empty, tomb_table)

    if txn is not None:
        with txn(f"compact-index-{index_table}"):
            _writes()
    else:
        _writes()
    return {
        "dropped": n_before - catalog.read(cells_table).count(),
        "tombstones_cleared": n_tomb,
    }


def _lloyd_refine(ev: DataFrame, cents: dict, n_iter: int) -> dict:
    """Bounded Lloyd steps starting FROM the given centroids (the
    re-centering complement of ``kmeans_centroids``' cold seed): each
    iteration is one fused assign+partial-sums pass (nlist*dim partial
    rows per task on the exchange, never corpus*dim) and one bounded
    collect; means round to 6 like every centroid in the engine.
    Cells that empty out keep their previous centroid."""
    from gcp_datalake_pipeline_spark.operators.similarity import (
        _cell_partial_sums_arrow,
    )

    cents = {int(c): [float(x) for x in v] for c, v in cents.items()}
    e = ev.persist()
    try:
        for _ in range(n_iter):
            mean_rows = (
                _cell_partial_sums_arrow(e.select("v"), cents)
                .groupBy("cid", "pos")
                .agg(F.round(F.sum("s") / F.sum("c"), 6).alias("m"))
                .collect()
            )
            by_cid: dict[int, dict[int, float]] = {}
            for r in mean_rows:
                by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = (
                    float(r["m"])
                )
            for cid, posmap in by_cid.items():
                cents[cid] = [posmap[p] for p in range(len(posmap))]
    finally:
        e.unpersist()
    return cents


def recluster_index(
    catalog,
    index_table: str = "ann_ivf",
    n_iter: int = 2,
    sample_fraction: float | None = None,
    move_threshold: float = 0.01,
) -> dict:
    """Re-center a DRIFTED persisted index: ``extend_ivf_index`` freezes
    centroids forever, so after heavy extends the cells skew away from
    the data and fixed-``nprobe`` recall drifts down. This runs bounded
    Lloyd from the CURRENT centroids (on the stored corpus, or a
    ``sample_fraction`` of it — re-centering needs a representative
    sample, not the corpus), then reassigns ONLY the cells whose
    centroid moved beyond ``move_threshold`` (L2):

    - unmoved cells keep their OLD centroid EXACTLY — stored rows (and,
      on a PQ-residual index, their codes, which are relative to the
      encoding centroid) stay byte-valid;
    - ONE map-only corpus pass (vid+v columns only, no shuffle — the
      same cost as each Lloyd iteration) re-assigns every surviving
      vector against the updated centroid set; the REWRITE is then
      bounded to the cells that actually exchange vectors — the moved
      cells plus any cell a vector migrated out of — via ONE
      :meth:`~...transactions.TransactionalCatalog.replace_partitions`
      commit. Cells that neither moved nor lost a vector hardlink-carry
      (inode-pinned in pytest) and the partition-pruned probe contract
      is untouched. Migrated vectors re-encode through the frozen
      codebook on PQ indexes (residual or raw);
    - tombstoned vids drop out of rewritten cells (their rows are not
      re-added); the rest of the tombstone set stays pending for
      ``compact_index``.

    Centroids + cells + map commit in one transaction. Returns
    ``{"moved_cells", "dropped_cells", "reassigned", "max_move"}``."""
    import math

    cells_table = f"{index_table}_cells"
    map_table = f"{index_table}_vid_map"
    cents_table = f"{index_table}_centroids"
    old = _cents_dict(catalog.read(cents_table).collect())
    corpus = catalog.read(cells_table).select(
        "vid", "v", F.col("cid").alias("cid_old")
    )
    tomb = _tombstones(catalog, index_table)
    if tomb is not None:
        tomb = tomb.distinct()
        corpus = corpus.join(F.broadcast(tomb), "vid", "left_anti")
    train = (
        corpus.sample(fraction=sample_fraction, seed=7)
        if sample_fraction
        else corpus
    )
    new = _lloyd_refine(train.select("v"), old, n_iter)
    moves = {
        cid: math.sqrt(
            sum((a - b) ** 2 for a, b in zip(old[cid], new[cid]))
        )
        for cid in old
    }
    moved = sorted(c for c, m in moves.items() if m > move_threshold)
    max_move = round(max(moves.values()), 6) if moves else 0.0
    if not moved:
        return {
            "moved_cells": [], "dropped_cells": [], "reassigned": 0,
            "max_move": max_move,
        }
    final = {c: (new[c] if c in set(moved) else old[c]) for c in old}
    cb, cb_residual = _pq_codebook(catalog, index_table)
    if cb is not None:
        na = _assign_encode_arrow(corpus, final, cb, residual=cb_residual)
    else:
        na = _assign_cells_arrow(corpus, final)
    from pyspark import StorageLevel

    na = na.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # cells losing a vector: bounded collect (≤ nlist values)
        lost = {
            r["cid_old"]
            for r in na.where(F.col("cid") != F.col("cid_old"))
            .select("cid_old")
            .distinct()
            .collect()
        }
        dropped = sorted(set(moved) | lost)
        assigned = (
            na.where(F.col("cid_old").isin(dropped))
            .drop("cid_old")
            .localCheckpoint(eager=True)  # bounded: affected cells
        )
        chg = (
            na.where(F.col("cid") != F.col("cid_old"))
            .select("vid", "cid")
            .localCheckpoint(eager=True)
        )
    finally:
        na.unpersist()
    n_re = chg.count()
    cents_df = catalog.spark.createDataFrame(
        [(c, final[c]) for c in sorted(final)], "cid long, cv array<double>"
    )
    has_map = catalog.exists(map_table)
    # the bucketed map merge needs a single data dir; extends append
    # one dir each, so fold first (its own commit, layout preserved)
    if (
        has_map
        and hasattr(catalog, "compact")
        and len(catalog._data_dirs(map_table)) > 1
    ):
        catalog.compact(map_table, partition_cols=["_kb"])

    def _writes():
        catalog.overwrite(cents_df, cents_table)
        catalog.replace_partitions(cells_table, "cid", dropped, assigned)
        if has_map and n_re:
            nb = _effective_buckets(catalog, map_table, ["vid"], 64)
            catalog.merge_upsert_bucketed(
                chg, map_table, ["vid"], num_buckets=nb, audit_cols=False,
            )

    txn = getattr(catalog, "transaction", None)
    if txn is not None:
        with txn(f"recluster-{index_table}"):
            _writes()
    else:
        _writes()
    return {
        "moved_cells": moved, "dropped_cells": dropped,
        "reassigned": n_re, "max_move": max_move,
    }
