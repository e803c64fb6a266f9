"""Conductor (driver) pipeline.

Set-based re-expression of `etl-gcs-cloudsql/src/services/conductor.ts:9-280`:

  read CSV -> clean (F1/F2/F3/F12) -> validate-split (P3: RUT, carrier FK,
  role required, malformed JSON) -> conductor_rol get-or-create (J4) ->
  conductor MERGE on conductor_rut (U2) -> join back conductor_id (J5) ->
  children:
    H5 hoja_vida            (hoja_de_vida_data.certificado present)
    H6 hoja_vida_restriccion (restriccionesLicencia[] UNION duracionesRestringidas[])
    H7 hoja_vida_infraccion  (infraccionesRegistradas[])
    H8 licencia              (requires BOTH frontal AND reverso payloads)
    H9 licencia_clase        (frontal.clase[] explode -> clase_licencia
                              get-or-create -> bridge rows)

Malformed-JSON parity: a JSON.parse throw rolls back the whole row in the
reference; here such rows are quarantined before the MERGE. The licencia
payloads are only parsed when BOTH are present (`services/conductor.ts:213`),
so a malformed frontal with a missing reverso is NOT an error — the licencia
subtree is simply skipped.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.functions import (
    empty_to_null,
    format_rut,
    normalize_spaces,
    rut_is_valid,
    safe_parse_date,
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
    CONDUCTOR_CSV_SCHEMA,
    HOJA_VIDA_SCHEMA,
    LICENCIA_FRONTAL_SCHEMA,
    LICENCIA_REVERSO_SCHEMA,
)
from gcp_datalake_pipeline_spark.sources.csv_bronze import read_bronze_csv
from gcp_datalake_pipeline_spark.storage import Catalog


def process_conductores(
    catalog: Catalog, path: str, spark: SparkSession | None = None
) -> dict[str, int]:
    spark = spark or catalog.spark
    bronze = read_bronze_csv(spark, path, CONDUCTOR_CSV_SCHEMA)

    both_lic = (
        empty_to_null("licencia_frontal_data").isNotNull()
        & empty_to_null("licencia_reverso_data").isNotNull()
    )
    cleaned = bronze.select(
        empty_to_null(normalize_spaces("driver_name")).alias("driver_name"),
        F.col("national_id"),
        safe_parse_date("birth_date").alias("birth_date"),
        empty_to_null("phone_number").alias("phone_number"),
        empty_to_null("email").alias("email"),
        empty_to_null("carrier_bp").alias("carrier_bp"),
        empty_to_null(normalize_spaces("driver_role")).alias("driver_role"),
        from_json_flagged(
            empty_to_null("hoja_de_vida_data"), HOJA_VIDA_SCHEMA
        ).alias("_hv"),
        empty_to_null("hoja_de_vida_data").alias("hoja_de_vida_data"),
        # Licencia payloads parsed only when both present (conductor.ts:213).
        F.when(
            both_lic,
            from_json_flagged(
                F.col("licencia_frontal_data"), LICENCIA_FRONTAL_SCHEMA
            ),
        ).alias("_lf"),
        F.when(
            both_lic,
            from_json_flagged(
                F.col("licencia_reverso_data"), LICENCIA_REVERSO_SCHEMA
            ),
        ).alias("_lr"),
        both_lic.alias("_both_lic"),
        "_row_idx",
        "_source_file",
    )

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
            # Ordered as the reference's sequential throws
            # (`services/conductor.ts:85-106`, then JSON parses).
            Rule("invalid_rut", ~rut_is_valid("national_id")),
            Rule("unknown_carrier_bp", F.col("carrier_id").isNull()),
            Rule("missing_driver_role", F.col("driver_role").isNull()),
            Rule("malformed_hoja_de_vida_data", is_malformed(F.col("_hv"))),
            Rule(
                "malformed_licencia_data",
                F.col("_both_lic")
                & (is_malformed(F.col("_lf")) | is_malformed(F.col("_lr"))),
            ),
        ],
    )
    quarantine = quarantine.select(
        "national_id", "carrier_bp", "_row_idx", "_source_file", "error_reason"
    )
    valid = valid.withColumn("conductor_rut", format_rut("national_id")).cache()

    rol = get_or_create_dim(
        catalog, "conductor_rol", "driver_role_id", ["driver_role"], valid
    )
    valid = resolve_dim_id(valid, rol, "driver_role_id", ["driver_role"])

    catalog.merge_upsert(
        valid.select(
            "conductor_rut",
            "driver_name",
            "birth_date",
            "phone_number",
            "email",
            "carrier_id",
            "driver_role_id",
            "_row_idx",
        ),
        "conductor",
        key_cols=["conductor_rut"],
        id_col="conductor_id",
    )

    conductor = catalog.read("conductor").select("conductor_rut", "conductor_id")
    batch = valid.join(conductor, "conductor_rut", "inner").cache()

    # H5 — hoja_vida: only when certificado present (conductor.ts:149).
    hv = F.col("_hv")
    hoja_src = batch.filter(hv["certificado"].isNotNull()).select(
        "conductor_id",
        empty_to_null(hv["certificado"]["folio"]).alias("folio"),
        empty_to_null(hv["certificado"]["codigoVerificacion"]).alias(
            "codigo_verificacion"
        ),
        safe_parse_date(hv["certificado"]["fechaEmision"]).alias("fecha_emision"),
        empty_to_null(hv["persona"]["comuna"]).alias("comuna"),
        empty_to_null(hv["persona"]["domicilio"]).alias("domicilio"),
        hv["persona"]["restriccionesLicencia"].alias("_restr"),
        hv["persona"]["duracionesRestringidas"].alias("_durs"),
        hv["persona"]["infraccionesRegistradas"].alias("_infr"),
    )
    append_with_id(
        catalog,
        "hoja_vida",
        "hoja_vida_id",
        hoja_src.select(
            "conductor_id", "folio", "codigo_verificacion", "fecha_emision",
            "comuna", "domicilio",
        ),
        order_cols=["conductor_id"],
    )

    # Parent->child surrogate chaining (conductor.ts:165): rejoin the freshly
    # assigned hoja_vida_id on its (conductor_id, folio) natural key — within
    # one batch a conductor row yields at most one hoja_vida row, so the
    # latest id per conductor is the parent.
    if catalog.exists("hoja_vida"):
        hoja_ids = (
            catalog.read("hoja_vida")
            .groupBy("conductor_id")
            .agg(F.max("hoja_vida_id").alias("hoja_vida_id"))
        )
    else:  # empty batch never created the table
        hoja_ids = hoja_src.select("conductor_id").limit(0).withColumn(
            "hoja_vida_id", F.lit(None).cast("long")
        )
    hoja_batch = hoja_src.join(hoja_ids, "conductor_id", "inner")

    # H6 — two arrays union into one restriction table (conductor.ts:168-190).
    restr = hoja_batch.select(
        "hoja_vida_id",
        F.explode("_restr").alias("r"),
    ).select(
        "hoja_vida_id",
        safe_parse_date(F.col("r")["fechaAnotacion"]).alias("fecha_anotacion"),
        empty_to_null(F.col("r")["bloqueRestriccionLicencia"]).alias("restriccion"),
    )
    durs = hoja_batch.select(
        "hoja_vida_id",
        F.explode("_durs").alias("d"),
    ).select(
        "hoja_vida_id",
        safe_parse_date(F.col("d")["fechaAnotacion"]).alias("fecha_anotacion"),
        empty_to_null(F.col("d")["bloqueDuracionRestringida"]).alias("restriccion"),
    )
    append_with_id(
        catalog,
        "hoja_vida_restriccion",
        "restriccion_id",
        restr.unionByName(durs),
        order_cols=["hoja_vida_id", "restriccion"],
    )

    # H7 — infracciones explode (conductor.ts:192-208).
    infr = hoja_batch.select(
        "hoja_vida_id", F.explode("_infr").alias("i")
    ).select(
        "hoja_vida_id",
        empty_to_null(F.col("i")["procesoNumero"]).alias("proceso"),
        empty_to_null(F.col("i")["tribunal"]).alias("tribunal"),
        safe_parse_date(F.col("i")["fechaDenuncia"]).alias("fecha_denuncia"),
        empty_to_null(F.col("i")["infraccion"]).alias("infraccion"),
        empty_to_null(F.col("i")["resolucion"]).alias("resolucion"),
    )
    append_with_id(
        catalog,
        "hoja_vida_infraccion",
        "infraccion_id",
        infr,
        order_cols=["hoja_vida_id", "proceso"],
    )

    # H8 — licencia: requires both payloads (conductor.ts:213-235).
    lf, lr = F.col("_lf"), F.col("_lr")
    lic_src = batch.filter(F.col("_both_lic")).select(
        "conductor_id",
        empty_to_null(lf["municipalidad"]).alias("municipalidad"),
        safe_parse_date(lf["fecha_de_control"]).alias("fecha_de_control"),
        safe_parse_date(lf["fecha_ultimo_control"]).alias("fecha_ultimo_control"),
        empty_to_null(lr["codigo"]).alias("codigo"),
        lf["clase"].alias("_clases"),
    )
    append_with_id(
        catalog,
        "licencia",
        "licencia_id",
        lic_src.select(
            "conductor_id", "municipalidad", "fecha_de_control",
            "fecha_ultimo_control", "codigo",
        ),
        order_cols=["conductor_id"],
    )

    # H9 — clase explode -> clase_licencia get-or-create -> bridge.
    if catalog.exists("licencia"):
        lic_ids = (
            catalog.read("licencia")
            .groupBy("conductor_id")
            .agg(F.max("licencia_id").alias("licencia_id"))
        )
    else:
        lic_ids = lic_src.select("conductor_id").limit(0).withColumn(
            "licencia_id", F.lit(None).cast("long")
        )
    clases = (
        lic_src.join(lic_ids, "conductor_id", "inner")
        .select("licencia_id", F.explode("_clases").alias("clase"))
        .select("licencia_id", empty_to_null(normalize_spaces("clase")).alias("clase"))
        .filter(F.col("clase").isNotNull())
    )
    clase_dim = get_or_create_dim(
        catalog, "clase_licencia", "clase_id", ["clase"], clases
    )
    bridge = resolve_dim_id(clases, clase_dim, "clase_id", ["clase"]).select(
        "licencia_id", "clase_id"
    )
    append_with_id(
        catalog,
        "licencia_clase",
        "licencia_clase_id",
        bridge,
        order_cols=["licencia_id", "clase_id"],
    )

    if quarantine.limit(1).count() > 0:
        catalog.append(quarantine, "quarantine_conductor")
    counters = run_counters(valid, quarantine)
    valid.unpersist()
    batch.unpersist()
    return counters
