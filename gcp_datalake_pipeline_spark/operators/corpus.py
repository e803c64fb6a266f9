"""Corpus curation: the canonical LLM training-data cleaning pipeline as
one composable operator — exact dedup, near-dup removal, quality gating —
each step a set-based DataFrame op from this package.

Disposition precedence (first match wins, deterministic):
  exact_dup  — not the min doc_id of an identical-text group
  near_dup   — the higher-id member of a shingle-Jaccard >= threshold pair
               (keep-lowest-id policy; pairwise, not transitive closure, so
               the rule is order-independent and oracle-expressible)
  too_short  — fewer than min_tokens whitespace tokens
  kept       — survives curation

``near_dup_backend``: 'exact' uses the quadratic-but-exact shingle-Jaccard
self-join (the verifiable form); 'lsh' swaps in MinHash+LSH candidates —
same verification arithmetic, near-linear candidate generation for the
100 TB path. Both produce (doc_a < doc_b) pairs, so the disposition rule
is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators import dedup
from gcp_datalake_pipeline_spark.operators.text import TOKEN_SPLIT_RE


def curate_corpus(
    df: DataFrame,
    jaccard_threshold: float = 0.8,
    min_tokens: int = 50,
    near_dup_backend: str = "exact",
) -> DataFrame:
    """Return (doc_id, disposition) for every document."""
    if near_dup_backend == "exact":
        pairs = dedup.jaccard_pairs(df, threshold=jaccard_threshold)
    elif near_dup_backend == "lsh":
        pairs = dedup.minhash_lsh_pairs(df, threshold=jaccard_threshold)
    else:
        raise ValueError(near_dup_backend)

    exact = dedup.exact_dedup(df).select("doc_id", "is_dup")
    near_losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    n_tokens = F.size(F.split(F.col("text"), TOKEN_SPLIT_RE))

    return (
        df.select("doc_id", n_tokens.alias("_nt"))
        .join(exact, "doc_id")
        .join(near_losers.withColumn("_near", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_dup"), F.lit("exact_dup"))
            .when(F.coalesce(F.col("_near"), F.lit(False)), F.lit("near_dup"))
            .when(F.col("_nt") < min_tokens, F.lit("too_short"))
            .otherwise(F.lit("kept"))
            .alias("disposition"),
        )
    )


def curation_oracle_sql(jaccard_threshold: float = 0.8, min_tokens: int = 50) -> str:
    """DuckDB SQL for the 'exact' backend disposition."""
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '\\s+')) AS tok,
             generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             tok || ' ' || LEAD(tok) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY LEAD(tok, 2) OVER w IS NOT NULL
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    near_losers AS (
      SELECT DISTINCT doc_b AS doc_id
      FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
                 JOIN sizes sb ON sb.doc_id = doc_b
      WHERE ROUND(inter / (sa.sz + sb.sz - inter), 4) >= {jaccard_threshold}
    ),
    base AS (
      SELECT doc_id,
             len(regexp_split_to_array(text, '\\s+')) AS nt,
             doc_id != MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_exact_dup
      FROM documents
    )
    SELECT b.doc_id,
           CASE WHEN b.is_exact_dup THEN 'exact_dup'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                WHEN b.nt < {min_tokens} THEN 'too_short'
                ELSE 'kept' END AS disposition
    FROM base b LEFT JOIN near_losers n ON b.doc_id = n.doc_id
    """


def dedup_ingest_batch(
    catalog,
    batch: DataFrame,
    docs_table: str = "corpus_docs",
    bands_table: str = "corpus_minhash_bands",
    pairs_table: str = "corpus_near_dup_pairs",
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """One round of the production corpus-dedup loop: flag the incoming
    batch's near-dups against everything ingested so far, then append the
    batch's documents, its LSH band-index rows, and the flagged pairs to
    the catalog — all in ONE transaction when the catalog is
    transactional (a crash leaves either the whole round or none of it).

    The existing corpus is NEVER re-banded or re-paired: the stored band
    index (:func:`~gcp_datalake_pipeline_spark.operators.dedup.minhash_bands`,
    append-only) is probed by the new batch's bands, and exact
    verification reads only candidate members' texts (semi-join). Per
    round the work is O(batch + candidates), independent of corpus size
    — the loop a 100 TB corpus actually runs on every ingest.

    Returns the batch's near-dup pairs (doc_a, doc_b, jaccard), also
    appended to ``pairs_table``.
    """
    from gcp_datalake_pipeline_spark.operators.dedup import (
        incremental_near_dups,
        minhash_bands,
    )

    has_existing = catalog.exists(docs_table)
    existing = (
        catalog.read(docs_table)
        if has_existing
        else batch.sparkSession.createDataFrame([], batch.schema)
    )
    existing_bands = catalog.read(bands_table) if has_existing else None
    pairs = incremental_near_dups(
        existing,
        batch,
        threshold=threshold,
        num_perm=num_perm,
        bands=bands,
        hash_mode=hash_mode,
        existing_bands=existing_bands,
    ).localCheckpoint(eager=True)  # compute BEFORE the appends change state
    new_bands = minhash_bands(batch, num_perm, bands, hash_mode)
    txn = getattr(catalog, "transaction", None)
    if txn is not None:
        with txn(f"dedup-ingest-{docs_table}"):
            catalog.append(batch, docs_table)
            catalog.append(new_bands, bands_table)
            catalog.append(pairs, pairs_table)
    else:
        catalog.append(batch, docs_table)
        catalog.append(new_bands, bands_table)
        catalog.append(pairs, pairs_table)
    return pairs
