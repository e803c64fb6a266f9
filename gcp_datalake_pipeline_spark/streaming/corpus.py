"""Streaming corpus dedup-ingest: the LLM-training-data loop wired to
Structured Streaming (SURVEY.md §2.9 trigger/foreachBatch pattern, same
shape as :mod:`gcp_datalake_pipeline_spark.streaming.ingest`).

Newly landed document files stream through
:func:`~gcp_datalake_pipeline_spark.operators.corpus.dedup_ingest_batch`
one micro-batch per round: flag the batch's near-dups against the stored
band index, then commit docs + bands + pairs atomically. At 100 TB this
IS the production corpus pipeline — documents arrive continuously, each
round's work is O(batch + candidates) (bucket-pruned verification reads),
and the corpus is never re-deduped.

Exactly-once across replays: the file-source checkpoint advances only
after ``foreachBatch`` returns, so a crash between the round's commit and
the checkpoint write replays the batch. Each round's transactional commit
is named by a content hash of the batch's file list; a replayed batch
finds its load_id already in the catalog's version history and skips —
committed-or-absent, never doubled. (The guard's horizon is the retained
version history: a ``vacuum(retain_versions=N)`` that drops a round's
snapshot also forgets its replay marker, so retain at least the
checkpoint-replay window.)

A concurrent external ingest round conflicts at commit
(ConcurrentWriteError via the band-index anchor), failing the micro-batch
WITHOUT advancing the checkpoint: the stream restarts the batch against
the fresh index — the retry-from-read remedy, automated.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.corpus import dedup_ingest_batch


def run_streaming_dedup_ingest(
    catalog,
    landing_dir: str,
    checkpoint_dir: str,
    docs_table: str = "corpus_docs",
    bands_table: str = "corpus_minhash_bands",
    pairs_table: str = "corpus_near_dup_pairs",
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
    hash_mode: str = "xxhash64",
    num_buckets: int = 64,
) -> list[dict]:
    """Run dedup-ingest rounds over newly landed ``*.parquet`` document
    files. Returns one record per round actually committed this run:
    ``{"load_id", "paths", "n_pairs"}`` (replayed/already-committed
    batches are skipped and not listed).

    The listing stream reads paths only (binaryFile metadata); each
    round re-reads its files with the parquet reader so document text
    stays columnar.
    """
    spark = catalog.spark
    rounds: list[dict] = []

    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path STRING, modificationTime TIMESTAMP, length BIGINT, "
            "content BINARY"
        )
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(landing_dir)
        .select(F.col("path"))
    )

    def handle_batch(batch_df, batch_id):
        paths = sorted(
            r["path"].replace("file:", "") for r in batch_df.collect()
        )
        if not paths:
            return
        # Content-addressed round id: stable across checkpoint replays
        # (and even checkpoint loss, as long as batch composition — here
        # one file per trigger — is reproduced).
        lid = (
            "stream-dedup-"
            + hashlib.md5(";".join(paths).encode()).hexdigest()[:12]
        )
        versions = getattr(catalog, "versions", None)
        if versions is not None and any(
            v.get("load_id") == lid for v in versions()
        ):
            return  # replayed batch: round already committed atomically
        batch = spark.read.parquet(*paths)
        pairs = dedup_ingest_batch(
            catalog,
            batch,
            docs_table=docs_table,
            bands_table=bands_table,
            pairs_table=pairs_table,
            threshold=threshold,
            num_perm=num_perm,
            bands=bands,
            hash_mode=hash_mode,
            num_buckets=num_buckets,
            load_id=lid,
        )
        rounds.append(
            {"load_id": lid, "paths": paths, "n_pairs": pairs.count()}
        )

    writer = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
    return rounds
