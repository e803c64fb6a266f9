"""gcp_datalake_pipeline_spark — a PySpark-native analytics/ETL engine.

Re-implements the query and data-processing capabilities of the reference
medallion ETL pipeline (``nrivas2017/gcp-datalake-pipeline``) as an idiomatic
Spark DataFrame engine:

- Bronze CSV ingestion (semicolon CSV, BOM, all-string schema)
- Cleaning/validation scalar functions (whitespace, RUT mod-11, dates,
  booleans, numeric coercions)
- Set-based dimension maintenance (get-or-create with surrogate keys)
- Last-wins upserts (MERGE semantics over Parquet storage)
- Historized appends with JSON flattening/explodes
- Quarantine (validate-then-split) error semantics
- A generic relational query surface (the full DataFrame/SQL API)
- Large-scale training-data operators: dedup (exact / Jaccard / MinHash-LSH /
  SimHash / embedding-cosine), similarity search, text analysis, multimodal
  column plumbing.

Design stance (SURVEY.md §7.0): declarative DataFrame plans, Catalyst does
the optimizing; broadcast small dims; no row-at-a-time Python in hot paths.
"""

__version__ = "0.1.0"
