"""Concurrency soak (VERDICT r8 #5): the individually-tested concurrent
surfaces COMPOSED — two streaming dedup loops racing on one corpus's
tables, an IVF extend+compact worker on the same TransactionalCatalog —
must end in exactly the serial state: every round committed exactly
once, every ConcurrentWriteError absorbed by the designed retry (failed
micro-batch -> checkpoint holds -> rerun), no dead-letters, pairs and
ANN answers equal the serial run.

Each worker holds its OWN TransactionalCatalog instance over the shared
root (the cross-process model run in-process: transaction staging state
is per-instance; commit ordering is the flock's job)."""

import os
import threading

from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators import ann_index, corpus, similarity
from gcp_datalake_pipeline_spark.streaming.corpus import (
    run_streaming_dedup_ingest,
)
from gcp_datalake_pipeline_spark.transactions import (
    ConcurrentWriteError,
    TransactionalCatalog,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"
QIDS = [3, 57, 111]


def _batches(df, id_col, n_batches):
    n = df.agg(F.max(id_col)).first()[0] + 1
    cuts = [i * n // n_batches for i in range(n_batches)] + [n]
    return [
        df.filter((F.col(id_col) >= cuts[i]) & (F.col(id_col) < cuts[i + 1]))
        for i in range(n_batches)
    ]


def _land(batches, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for i, b in enumerate(batches):
        b.toPandas().to_parquet(
            os.path.join(out_dir, f"b{i}.parquet"), index=False
        )


def test_concurrent_loops_extend_compact_equal_serial(spark, tmp_path):
    docs = spark.read.parquet(DOCS)
    emb = spark.read.parquet(EMB)
    d = _batches(docs, "doc_id", 4)
    n_emb = emb.agg(F.max("vec_id")).first()[0] + 1
    emb_seed = emb.filter(F.col("vec_id") < n_emb // 2)
    emb_ext = _batches(emb.filter(F.col("vec_id") >= n_emb // 2), "vec_id", 2)

    root = str(tmp_path / "lake")
    _land(d[:2], str(tmp_path / "land1"))
    _land(d[2:], str(tmp_path / "land2"))
    cents = ann_index.build_ivf_index(
        TransactionalCatalog(spark=spark, root=root), emb_seed
    )

    failures: list[str] = []

    def dedup_worker(landing, ckpt):
        cat = TransactionalCatalog(spark=spark, root=root)
        last = None
        for _ in range(40):
            try:
                r = run_streaming_dedup_ingest(cat, landing, ckpt)
            except Exception as e:  # conflict-failed micro-batch: retry
                last = e
                continue
            if not r:
                return  # replay produced nothing: fully drained
        failures.append(f"dedup drain did not converge: {last!r}")

    def ann_worker():
        cat = TransactionalCatalog(spark=spark, root=root)
        for b in emb_ext:
            for _ in range(20):
                try:
                    ann_index.extend_ivf_index(cat, b, compact_every=2)
                    break
                except ConcurrentWriteError:
                    continue
            else:
                failures.append("extend retries exhausted")
        for _ in range(20):
            try:
                cat.compact("ann_ivf_cells", partition_cols=["cid"])
                return
            except ConcurrentWriteError:
                continue
        failures.append("compact retries exhausted")

    threads = [
        threading.Thread(
            target=dedup_worker,
            args=(str(tmp_path / "land1"), str(tmp_path / "ck1")),
        ),
        threading.Thread(
            target=dedup_worker,
            args=(str(tmp_path / "land2"), str(tmp_path / "ck2")),
        ),
        threading.Thread(target=ann_worker),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=1200)
    assert not failures, failures
    assert not any(t.is_alive() for t in threads), "worker hung"

    cat = TransactionalCatalog(spark=spark, root=root)

    # (a) every round committed exactly once: all docs present, none
    # doubled, one metrics row per landed file, both landings intact
    assert cat.read("corpus_docs").count() == docs.count()
    assert (
        cat.read("corpus_docs")
        .groupBy("doc_id")
        .count()
        .agg(F.max("count"))
        .first()[0]
        == 1
    )
    log = cat.read("corpus_docs_rounds").collect()
    assert len(log) == 4
    assert len({r["load_id"] for r in log}) == 4

    # (b) conflicts never dead-lettered anything (ConcurrentWriteError
    # is excluded from the poison budget by design)
    assert not cat.exists("corpus_docs_file_quarantine")
    assert not os.path.exists(str(tmp_path / "land1") + "_quarantine")
    assert not os.path.exists(str(tmp_path / "land2") + "_quarantine")

    # (c) final state equals the serial result
    serial = TransactionalCatalog(spark=spark, root=str(tmp_path / "serial"))
    for b in d:
        corpus.dedup_ingest_batch(serial, b)
    want_pairs = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in serial.read("corpus_near_dup_pairs").collect()
    }
    got_pairs = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in cat.read("corpus_near_dup_pairs").collect()
    }
    assert got_pairs == want_pairs and want_pairs

    # ANN: every vector indexed exactly once; queries equal the
    # recompute oracle under the frozen centroids; compaction did not
    # disturb the layout contracts
    assert cat.read("ann_ivf_cells").count() == emb.count()
    got = {
        (r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"])
        for r in ann_index.ivf_index_topk(cat, QIDS, k=5).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"])
        for r in similarity.ivf_topk(
            emb, QIDS, k=5, centroids=cents
        ).collect()
    }
    assert got == want and got


def test_pump_races_source_dml_equal_serial(spark, tmp_path):
    """The change-feed pump under concurrent source DML: a replica
    consumer pumping in a loop while another catalog instance appends
    and deletes on the source must converge to replica == source with
    every window applied exactly once — ConcurrentWriteError absorbed
    by retry-from-fresh-read, never a double apply (the watermark
    expect-check) and never a skipped window (the feed always reads
    from the committed watermark)."""
    from gcp_datalake_pipeline_spark.streaming.cdf import (
        apply_changes_into,
        pump_table_changes,
    )

    root = str(tmp_path / "lake")
    writer = TransactionalCatalog(spark=spark, root=root)
    pumper = TransactionalCatalog(spark=spark, root=root)

    def src(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("g")
        )

    writer.overwrite(src(0, 50), "src")
    pump_table_changes(pumper, "src", "rep")
    pumper.overwrite(pumper.read("src"), "replica")

    stop = threading.Event()
    pump_errors = []

    def pump_loop():
        while not stop.is_set():
            try:
                pump_table_changes(
                    pumper,
                    "src",
                    "rep",
                    lambda f: apply_changes_into(
                        pumper, f, "replica", ["k"]
                    ),
                )
            except ConcurrentWriteError:
                continue  # designed retry: next loop reads fresh
            except Exception as e:  # pragma: no cover - must not happen
                pump_errors.append(e)
                return

    t = threading.Thread(target=pump_loop)
    t.start()
    try:
        for i in range(1, 6):
            writer.append(src(50 * i, 50 * (i + 1)), "src")
            writer.delete_where("src", [("k", "<", 20 * i)])
    finally:
        stop.set()
        t.join(timeout=600)
    assert not t.is_alive()
    assert not pump_errors, pump_errors
    # final catch-up pump, then the replica must equal the source
    pump_table_changes(
        pumper,
        "src",
        "rep",
        lambda f: apply_changes_into(pumper, f, "replica", ["k"]),
    )
    got = sorted(map(tuple, pumper.read("replica").collect()))
    want = sorted(map(tuple, writer.read("src").collect()))
    assert got == want
    # the watermark is at the head: one more pump is a zero-commit no-op
    v = pumper._read_manifest(strict=False)["version"]
    out = pump_table_changes(pumper, "src", "rep")
    assert out["from"] == out["to"]
    assert pumper._read_manifest(strict=False)["version"] == v


# -- bucket-disjoint concurrent writers (r12) ---------------------------------


def _keys_in_bucket(spark, bucket, nb, n=6, lo=0, hi=10_000):
    from gcp_datalake_pipeline_spark.storage import kb_col

    rows = (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), kb_col(["k"], nb).alias("b"))
        .where(F.col("b") == bucket)
        .limit(n)
        .collect()
    )
    assert len(rows) == n
    return [r["k"] for r in rows]


def test_disjoint_bucket_merges_both_commit(spark, tmp_path):
    """Two writers staging bucketed merges from the SAME base snapshot:
    when their touched buckets are disjoint, the second commit REBASES
    onto the first instead of refusing — both writers' rows land, the
    carried buckets re-link from the winner, metadata count stays
    exact, and a TRUE overlap still raises ConcurrentWriteError."""
    root = str(tmp_path / "lake")
    a = TransactionalCatalog(spark=spark, root=root)
    b = TransactionalCatalog(spark=spark, root=root)
    base = spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    a.overwrite_bucketed(base, "t", 8, ["k"])
    k1 = _keys_in_bucket(spark, 1, 8, n=4)
    k2 = _keys_in_bucket(spark, 5, 8, n=4)

    def upsert_txn(cat, keys, bump):
        t = cat.begin(f"w-{bump}")
        src = spark.createDataFrame(
            [(int(k), float(k) + bump) for k in keys], "k long, v double"
        )
        t.merge_upsert_bucketed(
            src, "t", ["k"], num_buckets=8, audit_cols=False
        )
        return t

    # BOTH stage against the same committed snapshot, then commit in
    # sequence: the second lands via bucket rebase
    t1 = upsert_txn(a, k1, 1000.0)
    t1.commit()
    t2 = upsert_txn(b, k2, 2000.0)
    t2.commit()
    got = {r["k"]: r["v"] for r in a.read("t").collect()}
    for k in k1:
        assert got[k] == k + 1000.0, "writer 1's bucket was rolled back"
    for k in k2:
        assert got[k] == k + 2000.0
    untouched = [k for k in range(400) if k not in set(k1) | set(k2)]
    assert all(got[k] == float(k) for k in untouched)
    assert len(got) == 400 + sum(1 for k in k1 + k2 if k >= 400)
    # metadata aggregates ride the refreshed stats sidecar
    assert a.count_rows("t") == a.read("t").count()

    # a TRUE overlap (same bucket) still refuses
    t3 = upsert_txn(a, k1[:2], 3000.0)
    t4 = upsert_txn(b, k1[2:], 4000.0)
    t3.commit()
    import pytest

    with pytest.raises(ConcurrentWriteError):
        t4.commit()
    b.rollback()


def test_disjoint_rebase_wrong_order_still_works(spark, tmp_path):
    """Order independence: stage both FIRST, commit in either order —
    the later committer always rebases."""
    root = str(tmp_path / "lake")
    a = TransactionalCatalog(spark=spark, root=root)
    b = TransactionalCatalog(spark=spark, root=root)
    base = spark.range(200).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v")
    )
    a.overwrite_bucketed(base, "t", 4, ["k"])
    k1 = _keys_in_bucket(spark, 0, 4, n=3)
    k2 = _keys_in_bucket(spark, 3, 4, n=3)
    t1 = a.begin("w1")
    t1.merge_upsert_bucketed(
        spark.createDataFrame([(int(k), 1.0) for k in k1], "k long, v double"),
        "t", ["k"], num_buckets=4, audit_cols=False,
    )
    t2 = b.begin("w2")
    t2.merge_upsert_bucketed(
        spark.createDataFrame([(int(k), 2.0) for k in k2], "k long, v double"),
        "t", ["k"], num_buckets=4, audit_cols=False,
    )
    t2.commit()
    t1.commit()  # stale base; rebases onto t2's snapshot
    got = {r["k"]: r["v"] for r in a.read("t").collect()}
    assert all(got[k] == 1.0 for k in k1)
    assert all(got[k] == 2.0 for k in k2)
    assert a.count_rows("t") == 200


def test_rebase_refuses_with_pending_vectors(spark, tmp_path):
    """A rebase window containing PENDING DELETION VECTORS refuses:
    vector identity is per-file and a rebased carry cannot prove the
    vectors' files survived every interleaved commit. (A vector-only
    commit never moves the dir list, so no conflict path runs at all —
    carried names keep their vectors; the guard matters when a
    dir-moving commit AND vectors both landed in the window.)"""
    import pytest

    root = str(tmp_path / "lake")
    a = TransactionalCatalog(spark=spark, root=root)
    b = TransactionalCatalog(spark=spark, root=root)
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v")
    )
    a.overwrite_bucketed(base, "t", 4, ["k"])
    k2 = _keys_in_bucket(spark, 3, 4, n=2)
    t2 = b.begin("w2")
    t2.merge_upsert_bucketed(
        spark.createDataFrame([(int(k), 2.0) for k in k2], "k long, v double"),
        "t", ["k"], num_buckets=4, audit_cols=False,
    )
    # interleave: a DISJOINT-bucket merge (moves the dir list) ...
    k1 = _keys_in_bucket(spark, 1, 4, n=2)
    a.merge_upsert_bucketed(
        spark.createDataFrame([(int(k), 1.0) for k in k1], "k long, v double"),
        "t", ["k"], num_buckets=4, audit_cols=False,
    )
    # ... AND a vector delete (registers pending DVs)
    k0 = _keys_in_bucket(spark, 0, 4, n=1)[0]
    a.delete_where("t", [("k", "=", int(k0))], mode="dv")
    with pytest.raises(ConcurrentWriteError):
        t2.commit()
    b.rollback()
    # without the vectors the same interleaving rebases fine
    a.compact("t", min_dirs=1)  # folds the vector away
    assert a.dv_count("t") == 0
    t3 = b.begin("w3")
    t3.merge_upsert_bucketed(
        spark.createDataFrame([(int(k), 4.0) for k in k2], "k long, v double"),
        "t", ["k"], num_buckets=4, audit_cols=False,
    )
    a.merge_upsert_bucketed(
        spark.createDataFrame([(int(k), 5.0) for k in k1], "k long, v double"),
        "t", ["k"], num_buckets=4, audit_cols=False,
    )
    t3.commit()
    got = {r["k"]: r["v"] for r in a.read("t").collect()}
    assert all(got[k] == 4.0 for k in k2)
    assert all(got[k] == 5.0 for k in k1)
    assert int(k0) not in got  # the folded delete stayed deleted
