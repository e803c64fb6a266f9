"""Reference-corpus n-gram language-model perplexity scoring (CCNet).

CCNet (Wenzek et al., LREC 2020, arXiv:1911.00359) filters web text by
the perplexity of a language model trained on a high-quality reference
corpus (Wikipedia), then splits the pool into head / middle / tail
buckets of equal size and keeps the head. It is the standard
model-based quality filter of the large-scale pretraining pipelines
(CCNet, RedPajama, FineWeb ablations).

This is the exactly-computable Spark form: an add-alpha bigram LM with
an ``<unk>`` token (closed vocabulary = the reference corpus's tokens),

    P(w_i | w_{i-1}) = (c2(w_{i-1}, w_i) + alpha) / (c1(w_{i-1}) + alpha * V)

where ``c2`` / ``c1`` are bigram / bigram-context counts over the
reference, ``V`` = |reference vocab| + 1 (the unk), and every token
outside the reference vocab maps to ``<unk>`` on both the context and
the predicted side. The per-document score is the MEAN NEGATIVE LOG
PROBABILITY over the document's bigram positions — monotone in
perplexity (ppl = e^score), kept in log space so the cross-engine
contract stays a single exp away from CCNet's number without paying a
second transcendental.

Spark-first shape, each stage shuffle-bounded:

- the LM is REFERENCE-bounded, not corpus-bounded: CCNet trains on a
  Wikipedia-class corpus, so ``c2``/``c1``/vocab are small relations a
  100 TB scoring pass broadcasts (AQE handles the big-reference edge by
  falling back to a shuffle join on the bigram key);
- scoring is ONE corpus scan: explode bigram positions (a JVM
  ``transform`` over the token array — no Python), two broadcast
  left-joins to map each side through the vocab (miss -> ``<unk>``),
  one join to the bigram table, one join to the context table, then a
  map-side-combined groupBy(doc);
- each position's ``-ln P`` is quantized to INTEGER MICRO-UNITS before
  the per-doc sum (the DSIR / BM25 discipline: BIGINT sums are exact
  and order-free, so cross-engine float summation order can never flip
  a rounding boundary); the mean is one correctly-rounded division;
- band assignment (head/middle/tail) is NTILE over (score, doc_id) —
  computed WITHOUT a single-task global window via the sharded
  rank assignment of :func:`~..operators.dims.assign_dense_ids` plus
  the closed-form NTILE bucket formula.

Documents with fewer than two tokens have no bigram positions and are
excluded (CCNet likewise drops near-empty paragraphs before scoring).

Reference boundary: the reference engine has no model-based filtering
(`etl-gcs-cloudsql/src/services/*.ts` stop at field validation); this
module is part of the training-data surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "<unk>"

_BIGRAM_STRUCTS = (
    "transform(slice(tokens, 1, greatest(size(tokens) - 1, 0)), "
    "(t, i) -> struct(t as w1, tokens[i + 1] as w2))"
)


def _doc_bigrams(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, w1, w2): one row per bigram POSITION (not distinct) —
    lower/trim + whitespace tokenization, the engine-wide convention."""
    from gcp_datalake_pipeline_spark.parallelism import (
        ensure_scan_parallelism,
    )

    # the bigram explode is the compute-dense stage of LM training and
    # scoring: spread tiny local scans (cluster no-op)
    df = ensure_scan_parallelism(df)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("tokens"))
        .select("doc_id", F.explode(F.expr(_BIGRAM_STRUCTS)).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )


def train_bigram_lm(
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram counts c2, context counts c1, vocab) over the reference.

    ``vocab`` is every distinct token of the reference (including
    document-final tokens that never occur as a bigram context);
    ``c1(w1)`` is the count of positions where ``w1`` is a context,
    i.e. ``sum(c2) group by w1`` — the denominators of a proper
    conditional distribution."""
    bg = _doc_bigrams(ref, text_col, id_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    vocab = (
        ref.select(F.explode(toks).alias("tok")).distinct()
    )
    return c2, c1, vocab


def doc_lm_nll(
    docs: DataFrame,
    ref: DataFrame,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_bigrams, nll): mean negative log probability of each
    document under the reference bigram LM — lower = more reference-like
    (perplexity = e^nll). Exact contract: each position's ``-ln P`` is
    rounded to integer micro-units, summed as BIGINT, and divided once.
    """
    c2, c1, vocab = train_bigram_lm(ref, text_col, id_col)
    v_plus_unk = vocab.count() + 1  # driver-side scalar: |vocab| + <unk>

    bg = _doc_bigrams(docs, text_col, id_col)
    v1 = vocab.select(F.col("tok").alias("w1"), F.lit(True).alias("_in1"))
    v2 = vocab.select(F.col("tok").alias("w2"), F.lit(True).alias("_in2"))
    mapped = (
        bg.join(F.broadcast(v1), "w1", "left")
        .join(F.broadcast(v2), "w2", "left")
        .select(
            "doc_id",
            F.when(F.col("_in1").isNotNull(), F.col("w1"))
            .otherwise(F.lit(UNK))
            .alias("m1"),
            F.when(F.col("_in2").isNotNull(), F.col("w2"))
            .otherwise(F.lit(UNK))
            .alias("m2"),
        )
    )
    scored = (
        mapped.join(
            F.broadcast(c2.select(F.col("w1").alias("m1"), F.col("w2").alias("m2"), "c2")),
            ["m1", "m2"],
            "left",
        )
        .join(
            F.broadcast(c1.select(F.col("w1").alias("m1"), "c1")),
            "m1",
            "left",
        )
        .select(
            "doc_id",
            # -ln P in INTEGER MICRO-UNITS: BIGINT per-doc sums are exact
            # and order-free (the DSIR/BM25 cross-engine discipline)
            F.round(
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
                    / (
                        F.coalesce(F.col("c1"), F.lit(0))
                        + F.lit(alpha) * F.lit(v_plus_unk)
                    )
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("nll6"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        # exact BIGINT sum; ONE correctly-rounded division — never
        # display-rounded (a final round() flipped a boundary in DSIR)
        (F.sum("nll6") / (F.lit(1e6) * F.count(F.lit(1)))).alias("nll"),
    )


def _ntile_from_rank(rank_col, n_rows: int, bands: int):
    """Closed-form NTILE(bands) bucket for a 1-based global rank: the
    first (n mod k) buckets take ceil(n/k) rows, the rest floor(n/k) —
    SQL NTILE semantics without a single-task global window."""
    q, m = divmod(n_rows, bands)
    big = m * (q + 1)  # rows covered by the (q+1)-sized buckets
    if q == 0:  # fewer rows than bands: each row its own bucket
        return rank_col.cast("int")
    return (
        F.when(rank_col <= F.lit(big), F.ceil(rank_col / F.lit(q + 1)))
        .otherwise(F.lit(m) + F.ceil((rank_col - F.lit(big)) / F.lit(q)))
        .cast("int")
    )


def perplexity_bands(
    docs: DataFrame,
    ref: DataFrame,
    bands: int = 3,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_bigrams, nll, band): CCNet's equal-size perplexity
    buckets — band 1 = head (most reference-like) ... band ``bands`` =
    tail. Global rank over (nll, doc_id) is sharded (range partition +
    per-shard row_number + offsets), never a one-task window."""
    from pyspark.storagelevel import StorageLevel

    from gcp_datalake_pipeline_spark.operators.dims import assign_dense_ids

    # persist: the scoring pass feeds BOTH the count and the rank —
    # without this the (expensive at 100 TB) corpus scan runs twice
    scored = doc_lm_nll(docs, ref, alpha, text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = scored.count()
    if n == 0:
        return scored.select(
            "doc_id", "n_bigrams", "nll", F.lit(0).alias("band")
        ).limit(0)
    ranked = assign_dense_ids(
        scored, ["nll", "doc_id"], "_rank", start=0
    )
    return ranked.select(
        "doc_id",
        "n_bigrams",
        "nll",
        _ntile_from_rank(F.col("_rank"), n, bands).alias("band"),
    )


def _lm_ctes(alpha: float, ref_pred: str) -> str:
    """Shared DuckDB CTE block: tokenize, reference LM counts, per-doc
    micro-unit NLL — identical formulas to the Spark side."""
    return f"""
    tk AS (
      SELECT doc_id, {ref_pred} AS is_ref,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, is_ref,
             unnest([struct_pack(w1 := t[i], w2 := t[i + 1])
                     for i in generate_series(1, len(t) - 1)]) AS b
      FROM tk
    ),
    pos AS (SELECT doc_id, is_ref, b.w1 AS w1, b.w2 AS w2 FROM bg),
    c2 AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM pos WHERE is_ref GROUP BY 1, 2
    ),
    c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
    vocab AS (
      SELECT DISTINCT unnest(t) AS tok FROM tk WHERE is_ref
    ),
    vsz AS (SELECT COUNT(*) + 1 AS v FROM vocab),
    mapped AS (
      SELECT doc_id,
             CASE WHEN v1.tok IS NULL THEN '<unk>' ELSE w1 END AS m1,
             CASE WHEN v2.tok IS NULL THEN '<unk>' ELSE w2 END AS m2
      FROM pos
      LEFT JOIN vocab v1 ON pos.w1 = v1.tok
      LEFT JOIN vocab v2 ON pos.w2 = v2.tok
    ),
    terms AS (
      SELECT doc_id,
             CAST(ROUND(
               -ln((COALESCE(c2.c2, 0) + {alpha})
                   / (COALESCE(c1.c1, 0) + {alpha} * vsz.v))
               * 1e6, 0) AS BIGINT) AS nll6
      FROM mapped
      LEFT JOIN c2 ON mapped.m1 = c2.w1 AND mapped.m2 = c2.w2
      LEFT JOIN c1 ON mapped.m1 = c1.w1
      CROSS JOIN vsz
    ),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             SUM(nll6) / (1e6 * COUNT(*)) AS nll
      FROM terms GROUP BY doc_id
    )"""


def doc_lm_perplexity_oracle_sql(
    k: int = 30, alpha: float = 1.0, ref_pred: str = "lang = 'en'"
) -> str:
    """DuckDB oracle for the top-``k`` most-reference-like documents:
    same tokenization, same closed-vocab add-alpha bigram LM, the same
    micro-unit NLL contract. ``ref_pred`` selects the reference slice
    out of the same documents table the pool reads."""
    return f"""
    WITH {_lm_ctes(alpha, ref_pred)}
    SELECT doc_id, n_bigrams, nll
    FROM scored
    ORDER BY nll ASC, doc_id
    LIMIT {k}
    """


def perplexity_bands_oracle_sql(
    bands: int = 3, alpha: float = 1.0, ref_pred: str = "lang = 'en'"
) -> str:
    """DuckDB oracle for the band summary: NTILE over (nll, doc_id) —
    the closed-form Spark bucket formula must agree with SQL NTILE
    exactly — then per-band doc counts and score extremes."""
    return f"""
    WITH {_lm_ctes(alpha, ref_pred)},
    banded AS (
      SELECT doc_id, nll,
             NTILE({bands}) OVER (ORDER BY nll ASC, doc_id) AS band
      FROM scored
    )
    SELECT band, COUNT(*) AS n_docs,
           MIN(nll) AS min_nll, MAX(nll) AS max_nll
    FROM banded
    GROUP BY band
    ORDER BY band
    """
