"""Bronze CSV schemas, embedded-JSON payload schemas, Silver table columns.

Bronze: every CSV column is a nullable string (catalog sheet "Bronce": all
columns `Text`; typing happens in the ETL — SURVEY.md §1.2).
JSON shapes: from the reference TS interfaces `types/conductor.ts:1-50` and
`types/vehiculo.ts:1-23` — every field optional; absent keys -> NULL.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _string_schema(cols: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in cols])


EMPRESA_CSV_COLS = ["carrier_bp", "carrier_name", "carrier_tin", "carrier_type"]

CONDUCTOR_CSV_COLS = [
    "driver_name",
    "national_id",
    "birth_date",
    "phone_number",
    "email",
    "carrier_bp",
    "driver_role",
    "hoja_de_vida_data",
    "licencia_frontal_data",
    "licencia_reverso_data",
]

VEHICULO_CSV_COLS = [
    "registration_plate",
    "carrier_bp",
    "year_of_manufacture",
    "gps",
    "engine_number",
    "chassis_number",
    "vin",
    "odometer_km",
    "cortina",
    "instalacion_cortina",
    "vehicle_type",
    "vehicle_designation",
    "parrilla",
    "peso",
    "largo",
    "ancho",
    "alto",
    "mop_clasification",
    "nominal_pallet",
    "vehicle_make",
    "vehicle_model",
    "fecha_revision_tecnica",
    "fecha_vencimiento_revision_tecnica",
    "emissions_crt_status",
    "identification_status",
    "visual_status",
    "lights_status",
    "alignment_status",
    "brakes_status",
    "clearances_status",
    "emissions_status",
    "opacity_status",
    "steering_angle_status",
    "noise_status",
    "suspension_status",
    "permiso_circulacion_data",
    "certificado_anotaciones_vigentes_data",
    "soap_data",
]

EMPRESA_CSV_SCHEMA = _string_schema(EMPRESA_CSV_COLS)
CONDUCTOR_CSV_SCHEMA = _string_schema(CONDUCTOR_CSV_COLS)
VEHICULO_CSV_SCHEMA = _string_schema(VEHICULO_CSV_COLS)

# --- embedded JSON payloads (all-optional; from_json: missing key -> NULL) ---

# types/conductor.ts:1-34 (hoja_de_vida_data)
HOJA_VIDA_SCHEMA = T.StructType(
    [
        T.StructField(
            "certificado",
            T.StructType(
                [
                    T.StructField("folio", T.StringType()),
                    T.StructField("fechaEmision", T.StringType()),
                    T.StructField("codigoVerificacion", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "persona",
            T.StructType(
                [
                    T.StructField("comuna", T.StringType()),
                    T.StructField("domicilio", T.StringType()),
                    T.StructField(
                        "restriccionesLicencia",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("fechaAnotacion", T.StringType()),
                                    T.StructField(
                                        "bloqueRestriccionLicencia", T.StringType()
                                    ),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "duracionesRestringidas",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("fechaAnotacion", T.StringType()),
                                    T.StructField(
                                        "bloqueDuracionRestringida", T.StringType()
                                    ),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "infraccionesRegistradas",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("procesoNumero", T.StringType()),
                                    T.StructField("tribunal", T.StringType()),
                                    T.StructField("fechaDenuncia", T.StringType()),
                                    T.StructField("infraccion", T.StringType()),
                                    T.StructField("resolucion", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)

# types/conductor.ts:36-45 (licencia_frontal_data)
LICENCIA_FRONTAL_SCHEMA = T.StructType(
    [
        T.StructField("clase", T.ArrayType(T.StringType())),
        T.StructField("municipalidad", T.StringType()),
        T.StructField("fecha_de_control", T.StringType()),
        T.StructField("fecha_ultimo_control", T.StringType()),
    ]
)

# types/conductor.ts:47-50 (licencia_reverso_data)
LICENCIA_REVERSO_SCHEMA = T.StructType([T.StructField("codigo", T.StringType())])

# types/vehiculo.ts:1-5 (permiso_circulacion_data)
PERMISO_CIRCULACION_SCHEMA = T.StructType(
    [
        T.StructField("municipalidad", T.StringType()),
        T.StructField("fecha_emision", T.StringType()),
        T.StructField("fecha_vencimiento", T.StringType()),
    ]
)

# types/vehiculo.ts:7-11 (soap_data)
SOAP_SCHEMA = T.StructType(
    [
        T.StructField("numero_poliza", T.LongType()),
        T.StructField("institucion_aseguradora", T.StringType()),
        T.StructField("fecha_vencimiento_poliza", T.StringType()),
    ]
)

# types/vehiculo.ts:13-23 (certificado_anotaciones_vigentes_data)
CAV_SCHEMA = T.StructType(
    [
        T.StructField("folio", T.StringType()),
        T.StructField("codigo_verificacion", T.StringType()),
        T.StructField("fecha_emision", T.StringType()),
        T.StructField("limitaciones_al_dominio", T.StringType()),
        T.StructField(
            "datos_propietario_actual",
            T.StructType(
                [
                    T.StructField("nombre", T.StringType()),
                    T.StructField("rut", T.StringType()),
                    T.StructField("fecha_adquisicion", T.StringType()),
                ]
            ),
        ),
    ]
)

REVISION_STATUS_COLS = [
    "emissions_crt_status",
    "identification_status",
    "visual_status",
    "lights_status",
    "alignment_status",
    "brakes_status",
    "clearances_status",
    "emissions_status",
    "opacity_status",
    "steering_angle_status",
    "noise_status",
    "suspension_status",
]
