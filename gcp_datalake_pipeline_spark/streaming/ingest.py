"""Streaming ingestion over the landing path (SURVEY.md §2.9).

The reference is event-driven: one GCS object-finalize event per file
triggers the ETL (`etl-gcs-cloudsql/src/index.ts:8-19`); exactly-once-ish
delivery comes from moving the Drive file after copy
(`ingesta-drive-gcs/src/index.ts:119-124`).

Spark mapping: a Structured Streaming file source over the landing
directory with ``trigger(availableNow=True)`` + ``foreachBatch``. The
file-source checkpoint replaces the 'move to procesados/' marker — a file
is never re-processed across runs, which is strictly stronger than the
reference's at-least-once semantics (its history tables duplicate on
replay; SURVEY.md §2.9 flags idempotency as the improvement to offer).

Routing happens inside foreachBatch on the file provenance column, in
dependency order (empresa before vehiculo/conductor) — same contract as the
batch runner.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.pipelines.conductor import process_conductores
from gcp_datalake_pipeline_spark.pipelines.empresa import process_empresas
from gcp_datalake_pipeline_spark.pipelines.vehiculo import process_vehiculos
from gcp_datalake_pipeline_spark.sources.router import plan_batch
from gcp_datalake_pipeline_spark.storage import Catalog

_PROCESSORS = {
    "empresa": process_empresas,
    "conductor": process_conductores,
    "vehiculo": process_vehiculos,
}


def run_streaming_ingest(
    catalog: Catalog,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> list[str]:
    """Process new landing CSVs exactly once via a checkpointed file stream.

    Uses a lightweight whole-file listing stream (``binaryFile`` format reads
    only paths + metadata here — content stays columnar in the per-file
    batch pipelines, which re-read each CSV with the proper schema).
    Returns the list of files processed this run.
    """
    spark = catalog.spark
    processed: list[str] = []

    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path STRING, modificationTime TIMESTAMP, length BIGINT, "
            "content BINARY"
        )
        .option("pathGlobFilter", "*.csv")
        .load(landing_dir)
        .select(F.col("path"))
    )

    def handle_batch(batch_df, batch_id):
        from contextlib import nullcontext

        from gcp_datalake_pipeline_spark.streaming.corpus import _local_path

        paths = [_local_path(r["path"]) for r in batch_df.collect()]
        for processor, path in plan_batch(paths):
            # Same per-file atomicity as the batch runner when the catalog
            # is transactional: every table this file touches publishes in
            # one commit, so a crash mid-file leaves readers on the
            # previous snapshot and the unadvanced checkpoint replays it.
            txn = getattr(catalog, "transaction", None)
            scope = (
                txn(f"stream-{os.path.basename(path)}")
                if txn
                else nullcontext()
            )
            with scope:
                _PROCESSORS[processor](catalog, path)
            processed.append(path)

    writer = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
    return processed
