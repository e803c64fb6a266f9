"""Gold (consumption) layer: current-state views over the historized
children (SURVEY.md §2.8 — the 'latest revision per vehicle' pattern the
Silver model implies).

Each view is a window dedup: row_number over the entity key ordered by
recency, keep rank 1. One shuffle per view, on the entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.storage import Catalog


def _latest_per(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_revision_tecnica(catalog: Catalog) -> DataFrame:
    """Most recent technical revision per vehicle (by fecha_revision, then
    insertion id for same-day re-loads)."""
    return _latest_per(
        catalog.read("revision_tecnica"), "vehicle_id",
        ["fecha_revision", "revision_id"],
    )


def latest_soap(catalog: Catalog) -> DataFrame:
    return _latest_per(
        catalog.read("soap"), "vehicle_id",
        ["fecha_vencimiento_poliza", "soap_id"],
    )


def latest_licencia(catalog: Catalog) -> DataFrame:
    return _latest_per(
        catalog.read("licencia"), "conductor_id",
        ["fecha_de_control", "licencia_id"],
    )


def vehicle_current_state(catalog: Catalog) -> DataFrame:
    """Denormalized current vehicle state: entity + latest revision +
    latest SOAP + carrier. Dims broadcast; history deduped per child before
    joining so the fact never fans out."""
    vehiculo = catalog.read("vehiculo")
    empresa = catalog.read("empresa").select("carrier_id", "carrier_bp", "carrier_name")
    rev = latest_revision_tecnica(catalog).select(
        "vehicle_id",
        F.col("fecha_revision").alias("last_revision_date"),
        F.col("fecha_vencimiento").alias("revision_expires"),
    )
    out = vehiculo.join(F.broadcast(empresa), "carrier_id", "left").join(
        rev, "vehicle_id", "left"
    )
    if catalog.exists("soap"):
        soap = latest_soap(catalog).select(
            "vehicle_id", F.col("fecha_vencimiento_poliza").alias("soap_expires")
        )
        out = out.join(soap, "vehicle_id", "left")
    else:
        out = out.withColumn("soap_expires", F.lit(None).cast("date"))
    return out.select(
        "vehicle_id",
        "registration_plate",
        "carrier_bp",
        "carrier_name",
        "year_of_manufacture",
        "last_revision_date",
        "revision_expires",
        "soap_expires",
    )
