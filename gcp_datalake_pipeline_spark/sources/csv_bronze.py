"""S1 — Bronze CSV scan.

Parity with the reference's csv-parse options
(`etl-gcs-cloudsql/src/services/empresa.ts:37-50`): delimiter ';',
header row, trimmed fields, skipped empty lines, ragged rows tolerated,
UTF-8 BOM stripped. All columns land as nullable strings; typing happens in
the pipelines.

Each row also gets:
- ``_row_idx``: stable arrival order within the file (drives last-wins
  dedup, A2) — zero-based data-row index;
- ``_source_file``: provenance for the quarantine/manifest tables (S6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_bronze_csv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read a semicolon-CSV landing file into an all-string DataFrame."""
    df = (
        spark.read.options(
            sep=";",
            header=True,
            ignoreLeadingWhiteSpace=True,
            ignoreTrailingWhiteSpace=True,
            mode="PERMISSIVE",
            encoding="UTF-8",
            multiLine=False,
            quote='"',
            escape='"',
            emptyValue="",
        )
        .schema(schema)
        .csv(path)
    )
    # Stable per-file arrival index: monotonically_increasing_id is ordered
    # within each input split and splits follow file order, giving a total
    # order adequate for last-wins semantics on a single file.
    return df.withColumn("_row_idx", F.monotonically_increasing_id()).withColumn(
        "_source_file", F.input_file_name()
    )
