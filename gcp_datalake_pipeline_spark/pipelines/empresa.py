"""Empresa (carrier) pipeline.

Set-based re-expression of `etl-gcs-cloudsql/src/services/empresa.ts:9-131`:

  read CSV -> clean (F1/F2/F12) -> validate-split (P2) ->
  tipo_empresa get-or-create (J4) -> empresa MERGE on carrier_bp (U1)

Validation parity (`services/empresa.ts:63-69`): a row is rejected unless
carrier_type, carrier_name, a mod-11-valid carrier_tin, and carrier_bp are
all present. Rejected rows land in `quarantine_empresa` with provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.functions import (
    empty_to_null,
    format_rut,
    normalize_spaces,
    rut_is_valid,
)
from gcp_datalake_pipeline_spark.operators.dims import (
    get_or_create_dim,
    resolve_dim_id,
)
from gcp_datalake_pipeline_spark.operators.quarantine import (
    Rule,
    run_counters,
    validate_split,
)
from gcp_datalake_pipeline_spark.schemas import EMPRESA_CSV_SCHEMA
from gcp_datalake_pipeline_spark.sources.csv_bronze import read_bronze_csv
from gcp_datalake_pipeline_spark.storage import Catalog


def process_empresas(
    catalog: Catalog, path: str, spark: SparkSession | None = None
) -> dict[str, int]:
    """Run the empresa file processor; returns A1 run counters."""
    spark = spark or catalog.spark
    bronze = read_bronze_csv(spark, path, EMPRESA_CSV_SCHEMA)

    cleaned = bronze.select(
        empty_to_null("carrier_bp").alias("carrier_bp"),
        empty_to_null(normalize_spaces("carrier_name")).alias("carrier_name"),
        F.col("carrier_tin"),
        empty_to_null(normalize_spaces("carrier_type")).alias("carrier_type"),
        "_row_idx",
        "_source_file",
    )

    valid, quarantine = validate_split(
        cleaned,
        [
            # Ordered as the reference's sequential checks
            # (`services/empresa.ts:63-69`).
            Rule("missing_carrier_type", F.col("carrier_type").isNull()),
            Rule("missing_carrier_name", F.col("carrier_name").isNull()),
            Rule("invalid_rut", ~rut_is_valid("carrier_tin")),
            Rule("missing_carrier_bp", F.col("carrier_bp").isNull()),
        ],
    )

    tipo = get_or_create_dim(
        catalog, "tipo_empresa", "carrier_type_id", ["carrier_type"], valid
    )
    resolved = resolve_dim_id(valid, tipo, "carrier_type_id", ["carrier_type"])

    batch = resolved.select(
        "carrier_bp",
        "carrier_name",
        format_rut("carrier_tin").alias("carrier_rut"),
        "carrier_type_id",
        "_row_idx",
    )
    catalog.merge_upsert(
        batch,
        "empresa",
        key_cols=["carrier_bp"],
        update_cols=["carrier_name", "carrier_type_id", "carrier_rut"],
        id_col="carrier_id",
    )
    # SCD2 history alongside the current-state dim: `empresa` answers
    # "what is this carrier now", `empresa_history` answers "what was it at
    # time T" (valid_from/valid_to/is_current version chains). The
    # warehouse upgrade of the reference's upsert+append split.
    catalog.scd2_upsert(
        batch,
        "empresa_history",
        key_cols=["carrier_bp"],
        tracked_cols=["carrier_name", "carrier_rut", "carrier_type_id"],
    )
    if quarantine.limit(1).count() > 0:
        catalog.append(quarantine, "quarantine_empresa")
    return run_counters(valid, quarantine)


def empresa_with_type(catalog: Catalog) -> DataFrame:
    """Slice-0 flagship query: carriers joined to their type dim."""
    return (
        catalog.read("empresa")
        .join(
            F.broadcast(
                catalog.read("tipo_empresa").select("carrier_type_id", "carrier_type")
            ),
            "carrier_type_id",
        )
        .select("carrier_bp", "carrier_name", "carrier_rut", "carrier_type")
    )
