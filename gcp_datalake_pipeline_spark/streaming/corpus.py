"""Streaming corpus dedup-ingest: the LLM-training-data loop wired to
Structured Streaming (SURVEY.md §2.9 trigger/foreachBatch pattern, same
shape as :mod:`gcp_datalake_pipeline_spark.streaming.ingest`).

Newly landed document (or embedding) files stream through
:func:`~gcp_datalake_pipeline_spark.operators.corpus.dedup_ingest_batch`
/ :func:`~gcp_datalake_pipeline_spark.operators.corpus.embedding_ingest_batch`
one micro-batch per round: flag the batch's near-dups against the stored
band/bucket index, then commit docs + index + pairs atomically. At 100 TB
this IS the production corpus pipeline — data arrives continuously, each
round's work is O(batch + candidates) (bucket-pruned verification reads),
and the corpus is never re-deduped.

Exactly-once across replays: the file-source checkpoint advances only
after ``foreachBatch`` returns, so a crash between the round's commit and
the checkpoint write replays the batch. Each round's transactional commit
is named by a hash of the batch's file identities (path + mtime +
length, per loop namespace); a replayed batch finds its load_id's
committed-load marker (``TransactionalCatalog.has_load_id`` — one O(1)
file-existence check per batch, maintained at commit) and skips —
committed-or-absent, never doubled — while an overwritten file (new
mtime/length) is a NEW round. The markers survive ``vacuum``, so
snapshot retention never shrinks the replay horizon.

A concurrent external ingest round conflicts at commit
(ConcurrentWriteError via the index-table anchor), failing the micro-batch
WITHOUT advancing the checkpoint: the stream restarts the batch against
the fresh index — the retry-from-read remedy, automated.
"""

from __future__ import annotations

import hashlib

from gcp_datalake_pipeline_spark.operators.corpus import (
    dedup_ingest_batch,
    embedding_ingest_batch,
)


def _local_path(uri: str) -> str:
    """binaryFile emits file URIs (scheme + percent-encoding). Strip ONLY
    a leading file: scheme and unquote — a blanket replace('file:', '')
    mangled any path containing that substring and left %20-style
    escapes undecoded."""
    from urllib.parse import unquote, urlparse

    parsed = urlparse(uri)
    if parsed.scheme == "file":
        return unquote(parsed.path)
    return uri


_FORMATS = {
    # file_format -> (glob, reader). The jsonl glob is EXACT suffixes
    # ({json,jsonl}), never *.json* — that matched .jsonl.tmp staging
    # files, ingesting a half-written file and then double-ingesting it
    # under a new load_id after the rename. The jsonl reader is FAILFAST:
    # in PERMISSIVE mode a malformed line becomes an all-null row that
    # would be committed into the corpus silently; failing the batch
    # instead leaves the checkpoint unadvanced and retries — the same
    # hard-fail contract a truncated parquet file gets for free.
    "parquet": ("*.parquet", lambda spark, paths, schema: (
        spark.read.schema(schema) if schema else spark.read
    ).parquet(*paths)),
    "orc": ("*.orc", lambda spark, paths, schema: (
        spark.read.schema(schema) if schema else spark.read
    ).orc(*paths)),
    "jsonl": ("*.{json,jsonl}", lambda spark, paths, schema: (
        spark.read.schema(schema) if schema else spark.read
    ).option("mode", "FAILFAST").json(list(paths))),
    "csv": ("*.csv", lambda spark, paths, schema: (
        spark.read.schema(schema) if schema else spark.read
    ).options(header="true", mode="FAILFAST").csv(list(paths))),
}


def _run_streaming_rounds(
    catalog,
    landing_dir: str,
    checkpoint_dir: str,
    round_fn,
    available_now: bool,
    max_files_per_trigger: int,
    lid_prefix: str,
    file_format: str = "parquet",
    schema=None,
    compact_every: int | None = None,
    tables: tuple[str, ...] = (),
):
    """Shared trigger/foreachBatch runner: list newly landed files of the
    loop's format (binaryFile metadata only — content is re-read columnar
    per round), run ``round_fn(batch_df, load_id)`` once per micro-batch,
    skip batches whose load_id is already committed.

    The load_id hashes each file's (path, modificationTime, length) under
    a per-loop ``lid_prefix`` namespace: a checkpoint replay (same
    listing-log entries) reproduces it, a file OVERWRITTEN with new
    content gets a new id (mtime/length change) and is re-ingested, and
    the text and embedding loops sharing one catalog can never skip each
    other's batches.

    ``file_format``: "parquet" (default), "orc", "jsonl" (one JSON
    document per line — the common text-corpus landing format) or "csv"
    (with header). jsonl/csv read FAILFAST (a malformed line fails the
    batch without advancing the checkpoint instead of committing silent
    nulls); pass ``schema`` to pin column types instead of per-file
    inference, strongly recommended for jsonl/csv at scale (inference
    re-reads every file).

    ``compact_every``: whenever a table's staged-dir list reaches this
    many dirs after a committed round, fold it back into one dir
    (``catalog.compact``) — a continuously-appending loop otherwise grows
    one staged dir per round per table (the classic small-files/
    plan-growth problem; flat at 20 rounds in measurement, unbounded over
    a corpus's lifetime). The trigger is the PERSISTED dir count, not a
    per-run round counter, so frequently-restarted drains (cron-driven
    availableNow) still compact on cadence. Best-effort: a compaction
    that loses a conflict race to a concurrent writer is skipped, never
    fails the stream; the bucketed docs table keeps its ``_kb`` layout
    through the rewrite (sidecar metadata).

    Returns the committed-round records (availableNow mode, after the
    drain) — or, with ``available_now=False``, the live StreamingQuery
    handle so the caller can awaitTermination()/stop() it (per-round
    records are neither returned nor accumulated for an unbounded query —
    a weeks-long stream must not grow driver state per batch).
    """
    spark = catalog.spark
    rounds: list[dict] = []
    if file_format not in _FORMATS:
        raise ValueError(
            f"unknown file_format {file_format!r}; use one of "
            f"{sorted(_FORMATS)}"
        )
    if file_format == "csv" and schema is None:
        # CSV without a schema reads EVERY column as string (no
        # inference), so doc_id would land as string in a corpus whose
        # parquet rounds committed it as long: schema-mismatched appends
        # and differently-hashed bucket keys. jsonl is exempt — JSON
        # values are self-typed, so inference lands the right types.
        raise ValueError(
            "file_format='csv' requires a schema (e.g. "
            "\"doc_id long, text string\"); headerless typing would land "
            "every column as string and mismatch parquet-ingested rounds"
        )
    glob, reader = _FORMATS[file_format]

    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path STRING, modificationTime TIMESTAMP, length BIGINT, "
            "content BINARY"
        )
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(landing_dir)
        .select("path", "modificationTime", "length")
    )

    def handle_batch(batch_df, batch_id):
        files = sorted(
            (r["path"], str(r["modificationTime"]), r["length"])
            for r in batch_df.collect()
        )
        if not files:
            return
        paths = [_local_path(p) for p, _m, _n in files]
        digest = hashlib.md5(
            ";".join(f"{p}@{m}#{n}" for p, m, n in files).encode()
        ).hexdigest()[:12]
        lid = f"{lid_prefix}-{digest}"
        # Replay guard: one O(1) marker lookup per batch (the markers are
        # maintained at commit and survive vacuum, so neither a long
        # version history nor snapshot retention affects the guard);
        # catalogs without markers fall back to the version-history scan.
        has_lid = getattr(catalog, "has_load_id", None)
        if has_lid is not None:
            if has_lid(lid):
                return  # replayed batch: round already committed
        else:
            versions = getattr(catalog, "versions", None)
            if versions is not None and any(
                v.get("load_id") == lid for v in versions()
            ):
                return  # replayed batch: round already committed
        pairs = round_fn(reader(spark, paths, schema), lid)
        if available_now:
            rounds.append(
                {"load_id": lid, "paths": paths, "n_pairs": pairs.count()}
            )
        compact = getattr(catalog, "compact", None)
        if compact_every and compact is not None:
            from gcp_datalake_pipeline_spark.transactions import (
                ConcurrentWriteError,
            )

            for table in tables:
                if (
                    not catalog.exists(table)
                    or len(catalog._data_dirs(table)) < compact_every
                ):
                    continue
                try:
                    compact(table)
                except ConcurrentWriteError:
                    pass  # a concurrent append won; next window retries

    writer = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return rounds
    return writer.start()


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
    file_format: str = "parquet",
    schema=None,
    compact_every: int | None = None,
):
    """Run text dedup-ingest rounds over newly landed document files
    (``*.parquet`` by default; ``file_format="jsonl"`` for
    one-JSON-document-per-line corpora — pass ``schema`` like
    ``"doc_id long, text string"`` to skip per-file inference). Returns
    one record per round actually committed this run: ``{"load_id",
    "paths", "n_pairs"}`` (replayed/already-committed batches are
    skipped and not listed); with ``available_now=False``, returns the
    live StreamingQuery instead."""

    def round_fn(batch, lid):
        return dedup_ingest_batch(
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

    return _run_streaming_rounds(
        catalog, landing_dir, checkpoint_dir, round_fn,
        available_now, max_files_per_trigger, "stream-dedup",
        file_format=file_format, schema=schema,
        compact_every=compact_every,
        tables=(docs_table, bands_table, pairs_table),
    )


def run_streaming_embedding_ingest(
    catalog,
    landing_dir: str,
    checkpoint_dir: str,
    vectors_table: str = "corpus_embeddings",
    buckets_table: str = "corpus_embedding_buckets",
    pairs_table: str = "corpus_embedding_near_dup_pairs",
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    threshold: float = 0.3,
    n_planes: int = 6,
    probe_radius: int = 2,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "arrow",
    num_buckets: int = 64,
    file_format: str = "parquet",
    schema=None,
    compact_every: int | None = None,
):
    """The embedding twin: newly landed vector files (parquet or jsonl,
    like the text loop) run one
    atomic embedding-near-dup round per micro-batch (new batch probes the
    stored hyperplane-LSH bucket index; vectors + buckets + pairs commit
    together). Same replay/conflict semantics and return contract as the
    text loop (own load_id namespace, so both loops can share a catalog)."""

    def round_fn(batch, lid):
        return embedding_ingest_batch(
            catalog,
            batch,
            vectors_table=vectors_table,
            buckets_table=buckets_table,
            pairs_table=pairs_table,
            threshold=threshold,
            n_planes=n_planes,
            probe_radius=probe_radius,
            dim=dim,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
            backend=backend,
            num_buckets=num_buckets,
            load_id=lid,
        )

    return _run_streaming_rounds(
        catalog, landing_dir, checkpoint_dir, round_fn,
        available_now, max_files_per_trigger, "stream-embdedup",
        file_format=file_format, schema=schema,
        compact_every=compact_every,
        tables=(vectors_table, buckets_table, pairs_table),
    )
