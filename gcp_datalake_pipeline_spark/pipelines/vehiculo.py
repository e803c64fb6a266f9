"""Vehiculo (vehicle) pipeline.

Set-based re-expression of `etl-gcs-cloudsql/src/services/vehiculo.ts:11-343`:

  read CSV -> clean/type (F1-F12) -> validate-split (P4 + FK J1 + JSON F8) ->
  5-dim maintenance (tipo_vehiculo, tipo_designacion, marca, modelo composite
  — J2/J4) -> vehiculo MERGE on registration_plate (U3: carrier_id frozen on
  update) -> join back vehicle_id (J5) -> children:
    H1 revision_tecnica   (unconditional, per CSV row)
    H2 permiso_circulacion (from permiso_circulacion_data JSON)
    H3 soap                (from soap_data JSON)
    H4 certificado_anotaciones_vigentes (nested propietario struct)

Reject parity (`services/vehiculo.ts:110-131`): unknown carrier_bp or empty
plate -> quarantine. Malformed JSON in any present payload -> whole row
quarantined (reference: JSON.parse throw rolls back the row's transaction).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.functions import (
    empty_to_null,
    normalize_spaces,
    parse_float_or_null,
    parse_int_or_null,
    safe_parse_date,
    status_to_boolean,
    string_to_boolean,
)
from gcp_datalake_pipeline_spark.functions.json import (
    from_json_flagged,
    is_malformed,
)
from gcp_datalake_pipeline_spark.operators.appends import append_with_id
from gcp_datalake_pipeline_spark.operators.dims import (
    get_or_create_dim,
    resolve_dim_id,
)
from gcp_datalake_pipeline_spark.operators.quarantine import (
    Rule,
    run_counters,
    validate_split,
)
from gcp_datalake_pipeline_spark.schemas import (
    CAV_SCHEMA,
    PERMISO_CIRCULACION_SCHEMA,
    REVISION_STATUS_COLS,
    SOAP_SCHEMA,
    VEHICULO_CSV_SCHEMA,
)
from gcp_datalake_pipeline_spark.sources.csv_bronze import read_bronze_csv
from gcp_datalake_pipeline_spark.storage import Catalog

_JSON_COLS = {
    "permiso_circulacion_data": PERMISO_CIRCULACION_SCHEMA,
    "soap_data": SOAP_SCHEMA,
    "certificado_anotaciones_vigentes_data": CAV_SCHEMA,
}


def process_vehiculos(
    catalog: Catalog, path: str, spark: SparkSession | None = None
) -> dict[str, int]:
    spark = spark or catalog.spark
    bronze = read_bronze_csv(spark, path, VEHICULO_CSV_SCHEMA)

    cleaned = bronze.select(
        empty_to_null("registration_plate").alias("registration_plate"),
        empty_to_null("carrier_bp").alias("carrier_bp"),
        parse_int_or_null("year_of_manufacture").alias("year_of_manufacture"),
        string_to_boolean("gps").alias("gps"),
        empty_to_null("engine_number").alias("engine_number"),
        empty_to_null("chassis_number").alias("chassis_number"),
        empty_to_null("vin").alias("vin"),
        parse_int_or_null("odometer_km").alias("odometer_km"),
        empty_to_null("cortina").alias("cortina"),
        safe_parse_date("instalacion_cortina").alias("instalacion_cortina"),
        empty_to_null(normalize_spaces("vehicle_type")).alias("vehicle_type"),
        empty_to_null(normalize_spaces("vehicle_designation")).alias(
            "vehicle_designation"
        ),
        string_to_boolean("parrilla").alias("parrilla"),
        parse_float_or_null("peso").alias("peso"),
        parse_float_or_null("largo").alias("largo"),
        parse_float_or_null("ancho").alias("ancho"),
        parse_float_or_null("alto").alias("alto"),
        empty_to_null("mop_clasification").alias("mop_clasification"),
        parse_int_or_null("nominal_pallet").alias("nominal_pallet"),
        empty_to_null(normalize_spaces("vehicle_make")).alias("vehicle_make"),
        empty_to_null(normalize_spaces("vehicle_model")).alias("vehicle_model"),
        safe_parse_date("fecha_revision_tecnica").alias("fecha_revision"),
        safe_parse_date("fecha_vencimiento_revision_tecnica").alias(
            "fecha_vencimiento"
        ),
        *[status_to_boolean(c).alias(c) for c in REVISION_STATUS_COLS],
        *[
            from_json_flagged(empty_to_null(c), schema).alias(f"_{c}_parsed")
            for c, schema in _JSON_COLS.items()
        ],
        *[empty_to_null(c).alias(c) for c in _JSON_COLS],
        "_row_idx",
        "_source_file",
    )

    # FK check against empresa (J1): broadcast the carrier dim.
    empresa = catalog.read("empresa") if catalog.exists("empresa") else None
    if empresa is not None:
        lookup = F.broadcast(
            empresa.filter(F.col("carrier_bp").isNotNull()).select(
                "carrier_bp", "carrier_id"
            )
        )
        cleaned = cleaned.join(lookup, "carrier_bp", "left")
    else:
        cleaned = cleaned.withColumn("carrier_id", F.lit(None).cast("long"))

    valid, quarantine = validate_split(
        cleaned,
        [
            # Ordered as the reference's sequential checks
            # (`services/vehiculo.ts:110-131`, then JSON parses).
            Rule("unknown_carrier_bp", F.col("carrier_id").isNull()),
            Rule("missing_registration_plate", F.col("registration_plate").isNull()),
            *[
                Rule(f"malformed_{c}", is_malformed(F.col(f"_{c}_parsed")))
                for c in _JSON_COLS
            ],
        ],
    )
    quarantine = quarantine.select(
        "registration_plate", "carrier_bp", "_row_idx", "_source_file", "error_reason"
    )

    # Dim maintenance (J4); modelo is composite-keyed on (model, brand) (J2).
    tipo_v = get_or_create_dim(
        catalog, "tipo_vehiculo", "vehicle_type_id", ["vehicle_type"], valid
    )
    tipo_d = get_or_create_dim(
        catalog,
        "tipo_designacion",
        "vehicle_designation_id",
        ["vehicle_designation"],
        valid,
    )
    marca = get_or_create_dim(
        catalog,
        "vehiculo_marca",
        "vehicle_brand_id",
        ["vehicle_brand"],
        valid.select(F.col("vehicle_make").alias("vehicle_brand")),
    )
    valid = resolve_dim_id(valid, tipo_v, "vehicle_type_id", ["vehicle_type"])
    valid = resolve_dim_id(
        valid, tipo_d, "vehicle_designation_id", ["vehicle_designation"]
    )
    valid = resolve_dim_id(
        valid, marca, "vehicle_brand_id", ["vehicle_brand"], ["vehicle_make"]
    )
    modelo = get_or_create_dim(
        catalog,
        "vehiculo_modelo",
        "vehicle_model_id",
        ["vehicle_model", "vehicle_brand_id"],
        valid,
    )
    valid = resolve_dim_id(
        valid, modelo, "vehicle_model_id", ["vehicle_model", "vehicle_brand_id"]
    )

    entity_cols = [
        "registration_plate",
        "carrier_id",
        "year_of_manufacture",
        "gps",
        "engine_number",
        "chassis_number",
        "vin",
        "odometer_km",
        "cortina",
        "instalacion_cortina",
        "vehicle_type_id",
        "vehicle_designation_id",
        "parrilla",
        "peso",
        "largo",
        "ancho",
        "alto",
        "mop_clasification",
        "nominal_pallet",
        "vehicle_model_id",
    ]
    catalog.merge_upsert(
        valid.select(*entity_cols, "_row_idx"),
        "vehiculo",
        key_cols=["registration_plate"],
        # U3 quirk: carrier_id is set on insert but never updated on match
        # (`services/vehiculo.ts:209`).
        update_cols=[c for c in entity_cols if c not in ("registration_plate", "carrier_id")],
        id_col="vehicle_id",
    )

    # J5: join surrogate ids back on the natural key for child writes.
    vehiculo = catalog.read("vehiculo").select("registration_plate", "vehicle_id")
    batch = valid.join(vehiculo, "registration_plate", "inner")

    # H1 — revision_tecnica: one row per CSV row, unconditional.
    append_with_id(
        catalog,
        "revision_tecnica",
        "revision_id",
        batch.select(
            "vehicle_id",
            "fecha_revision",
            "fecha_vencimiento",
            *REVISION_STATUS_COLS,
        ),
        order_cols=["vehicle_id"],
    )

    # H2 — permiso_circulacion.
    p = F.col("_permiso_circulacion_data_parsed")
    append_with_id(
        catalog,
        "permiso_circulacion",
        "permiso_id",
        batch.filter(p.isNotNull()).select(
            "vehicle_id",
            empty_to_null(p["municipalidad"]).alias("municipalidad"),
            safe_parse_date(p["fecha_emision"]).alias("fecha_emision"),
            safe_parse_date(p["fecha_vencimiento"]).alias("fecha_vencimiento"),
        ),
        order_cols=["vehicle_id"],
    )

    # H3 — soap (numero_poliza is a JSON number -> BIGINT, model.sql:166).
    s = F.col("_soap_data_parsed")
    append_with_id(
        catalog,
        "soap",
        "soap_id",
        batch.filter(s.isNotNull()).select(
            "vehicle_id",
            s["numero_poliza"].alias("numero_poliza"),
            empty_to_null(s["institucion_aseguradora"]).alias(
                "institucion_aseguradora"
            ),
            safe_parse_date(s["fecha_vencimiento_poliza"]).alias(
                "fecha_vencimiento_poliza"
            ),
        ),
        order_cols=["vehicle_id"],
    )

    # H4 — certificado_anotaciones_vigentes (nested propietario struct).
    c = F.col("_certificado_anotaciones_vigentes_data_parsed")
    append_with_id(
        catalog,
        "certificado_anotaciones_vigentes",
        "certificado_id",
        batch.filter(c.isNotNull()).select(
            "vehicle_id",
            empty_to_null(c["folio"]).alias("folio"),
            empty_to_null(c["codigo_verificacion"]).alias("codigo_verificacion"),
            safe_parse_date(c["fecha_emision"]).alias("fecha_emision"),
            empty_to_null(c["limitaciones_al_dominio"]).alias(
                "limitaciones_al_dominio"
            ),
            empty_to_null(c["datos_propietario_actual"]["nombre"]).alias(
                "propietario_nombre"
            ),
            empty_to_null(c["datos_propietario_actual"]["rut"]).alias(
                "propietario_rut"
            ),
            safe_parse_date(c["datos_propietario_actual"]["fecha_adquisicion"]).alias(
                "propietario_fecha_adquisicion"
            ),
        ),
        order_cols=["vehicle_id"],
    )

    if quarantine.limit(1).count() > 0:
        catalog.append(quarantine, "quarantine_vehiculo")
    return run_counters(valid, quarantine)
