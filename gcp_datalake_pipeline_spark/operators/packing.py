"""Sequence packing: map a document stream onto fixed-size training
sequences (the GPT-style concat-and-chop used when batching pretraining
data: concatenate all documents in a deterministic order, then cut the
token stream every ``max_tokens``).

The operator computes, per document, which training sequences its tokens
land in. That is a GLOBAL exclusive prefix sum of token counts in doc_id
order — the textbook "needs a total order" trap. A naive
``Window.orderBy(doc_id)`` with no partition funnels the whole corpus
through ONE task; instead we use the sharded two-pass scan (same pattern
as dims.assign_dense_ids): range-partition by doc_id, per-shard cumulative
sums in parallel, then add per-shard offsets from the tiny driver-side
count list (bounded by num_shards, not by data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.text import TOKEN_SPLIT_RE


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 32,
) -> DataFrame:
    """Assign every document its span of packed training sequences.

    Documents are concatenated in ``id_col`` order and the token stream is
    chopped every ``max_tokens``; a document whose tokens straddle a cut
    belongs to several sequences. Output, one row per input document:

    - ``n_tokens``  — whitespace token count;
    - ``start_tok`` — the document's offset in the global token stream
      (exclusive prefix sum);
    - ``seq_first`` / ``seq_last`` — first and last sequence index the
      document's tokens occupy;
    - ``n_seqs``    — how many sequences it spans (1 for most documents).

    Deterministic: a pure function of the corpus (id order + token
    counts), identical across runs and engines.
    """
    from pyspark.storagelevel import StorageLevel

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), TOKEN_SPLIT_RE)).cast("long").alias(
            "n_tokens"
        ),
    )
    local = (
        toks.repartitionByRange(num_shards, F.col("doc_id"))
        .withColumn("_shard", F.spark_partition_id())
        .withColumn(
            "_cum",
            F.sum("n_tokens").over(
                Window.partitionBy("_shard")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    shard_totals = sorted(
        (r["_shard"], r["tot"])
        for r in local.groupBy("_shard")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    )
    offsets, acc = {}, 0
    for shard, tot in shard_totals:
        offsets[shard] = acc
        acc += tot
    if offsets:
        offset_expr = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )[F.col("_shard")]
    else:
        offset_expr = F.lit(0)
    cum = offset_expr + F.col("_cum")  # inclusive global prefix sum
    start = cum - F.col("n_tokens")
    b = F.lit(max_tokens)
    return local.select(
        "doc_id",
        "n_tokens",
        start.alias("start_tok"),
        F.floor(start / b).cast("long").alias("seq_first"),
        F.floor((cum - 1) / b).cast("long").alias("seq_last"),
        (F.floor((cum - 1) / b) - F.floor(start / b) + 1)
        .cast("long")
        .alias("n_seqs"),
    )


def pack_sequences_oracle_sql(max_tokens: int = 2048) -> str:
    """DuckDB oracle: the same global scan as one ordered window (fine at
    oracle scale; the Spark side exists precisely because this shape does
    not distribute)."""
    return f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_tok,
           CAST((cum - n_tokens) // {max_tokens} AS BIGINT) AS seq_first,
           CAST((cum - 1) // {max_tokens} AS BIGINT) AS seq_last,
           CAST((cum - 1) // {max_tokens}
                - (cum - n_tokens) // {max_tokens} + 1 AS BIGINT) AS n_seqs
    FROM c
    """
