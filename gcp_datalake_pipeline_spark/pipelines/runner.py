"""Batch runner: route landing files and run processors in dependency order.

Parity: entry points 1+2 (SURVEY.md §3.1-3.2). The Drive->GCS hop is pure
orchestration; here "landing" is a directory of CSVs. Every processed file
gets a manifest row (load_date + source file — the metadata Function 1
attaches as GCS object metadata, `ingesta-drive-gcs/src/index.ts:100-107`).
"""

from __future__ import annotations

import glob
import os
from contextlib import nullcontext

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


def ingest(
    catalog: Catalog,
    paths_or_glob: "list[str] | str | object",
    idempotent: bool = False,
) -> dict[str, dict]:
    """Process a batch of landing files. Returns per-file run counters.

    ``paths_or_glob`` may be a glob string, an explicit path list, or any
    :class:`~gcp_datalake_pipeline_spark.sources.listing.Lister` (the
    pluggable remote-source hook — GCS/Drive listers slot in without
    touching the runner).

    ``idempotent=False`` (default) replays a re-submitted file exactly like
    the reference: entities re-upsert (no-op), history tables append again
    (SURVEY.md §2.9 — duplicate-on-replay is the reference's semantics).
    ``idempotent=True`` skips files already recorded in the ingestion
    manifest (by basename), the documented improvement mode.
    """
    if isinstance(paths_or_glob, str):
        paths = sorted(glob.glob(paths_or_glob))
    elif hasattr(paths_or_glob, "list"):  # a Lister
        paths = [f.path for f in paths_or_glob.list()]
    else:
        paths = list(paths_or_glob)

    seen: set[str] = set()
    if idempotent and catalog.exists("ingestion_manifest"):
        seen = {
            r["source_file"]
            for r in catalog.read("ingestion_manifest")
            .select("source_file")
            .distinct()
            .collect()
        }

    results: dict[str, dict] = {}
    for processor, path in plan_batch(paths):
        if os.path.basename(path) in seen:
            results[path] = {"processor": processor, "skipped": True}
            continue
        # On a TransactionalCatalog every table a file touches — entities,
        # dims, history, quarantine, AND its manifest row — publishes in
        # one atomic commit (the reference's per-batch BEGIN/COMMIT,
        # etl-gcs-cloudsql/src/db.ts:24-46). A plain Catalog runs the
        # same code with per-table swaps (§2.11's documented relaxation).
        txn = getattr(catalog, "transaction", None)
        scope = txn(f"ingest-{os.path.basename(path)}") if txn else nullcontext()
        with scope:
            counters = _PROCESSORS[processor](catalog, path)
            results[path] = {"processor": processor, **counters}
            manifest = catalog.spark.createDataFrame(
                [
                    (
                        os.path.basename(path),
                        processor,
                        counters["rowCount"],
                        counters["processedCount"],
                        counters["errorCount"],
                    )
                ],
                "source_file string, processor string, row_count long, "
                "processed_count long, error_count long",
            ).withColumn("load_date", F.current_date()).withColumn(
                "load_ts", F.current_timestamp()
            )
            catalog.append(manifest, "ingestion_manifest")
    return results
