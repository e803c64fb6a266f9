"""Benchmark contamination detection: flag training documents that share
word n-grams with an evaluation/benchmark corpus.

This is the standard decontamination pass run before pretraining (n-gram
overlap against held-out benchmark text): any training document containing
a long-enough n-gram that also appears in the benchmark is flagged, so
eval numbers aren't inflated by memorized test data.

Scale: both sides reduce to DISTINCT n-gram sets per document, and the
join carries md5(n-gram) — 16 bytes per n-gram on the shuffle, never the
text (the same hash-on-shuffle trick as exact_dedup). The benchmark's
distinct n-gram set is tiny relative to the corpus (benchmarks are MBs,
corpora are TBs) and is aggregated before the join, so the probe is a
fact-vs-small join; at real scale Spark broadcasts it, and candidate
counting is map-side partial per doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.dedup import shingle_array
from gcp_datalake_pipeline_spark.parallelism import ensure_scan_parallelism

CONTAM_N = 5


def ngram_contamination(
    corpus: DataFrame, benchmark: DataFrame, n: int = CONTAM_N
) -> DataFrame:
    """Per corpus document, how many of its distinct word ``n``-grams also
    occur anywhere in ``benchmark``. Output: (doc_id, n_doc_ngrams,
    n_hit_ngrams, contaminated) — one row per corpus document, including
    clean ones and documents too short to have any n-gram.
    """
    # The n-gram build + md5 is the compute-DENSE stage of this pass, so
    # spread a tiny local input across the machine before it (no-op on
    # cluster-scale inputs — see parallelism.py). Without this the whole
    # 5-gram explode of the corpus binds to the scan's one or two splits
    # (r13: measured 7.0s -> ~1s at sf0.1 on local[32]).
    doc_grams = ensure_scan_parallelism(corpus).select(
        "doc_id",
        F.explode_outer(shingle_array(F.col("text"), n)).alias("gram"),
    ).select("doc_id", F.md5("gram").alias("h"))
    bench_grams = (
        benchmark.select(F.explode(shingle_array(F.col("text"), n)).alias("gram"))
        .select(F.md5("gram").alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        doc_grams.join(bench_grams, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("h").alias("n_doc_ngrams"),
            F.count("_hit").alias("n_hit_ngrams"),
        )
        .withColumn("contaminated", F.col("n_hit_ngrams") > 0)
    )


def _gram_cte(name: str, source_sql: str, n: int) -> str:
    """DuckDB CTE building DISTINCT (doc_id, gram) word n-grams — the
    LEAD-window twin of shingle_array for arbitrary n."""
    leads = " || ' ' || ".join(
        ["tok"] + [f"LEAD(tok, {j}) OVER w" for j in range(1, n)]
    )
    return f"""
    {name}_toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '\\s+')) AS tok,
             generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS pos
      FROM ({source_sql})
    ),
    {name} AS (
      SELECT DISTINCT doc_id, {leads} AS gram
      FROM {name}_toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY LEAD(tok, {n - 1}) OVER w IS NOT NULL
    )"""


def ngram_contamination_oracle_sql(
    corpus_sql: str, benchmark_sql: str, n: int = CONTAM_N
) -> str:
    return f"""
    WITH {_gram_cte("cg", corpus_sql, n)},
    {_gram_cte("bg", benchmark_sql, n)},
    bset AS (SELECT DISTINCT gram FROM bg)
    SELECT c.doc_id,
           CAST(COUNT(cg.gram) AS BIGINT) AS n_doc_ngrams,
           CAST(COUNT(bset.gram) AS BIGINT) AS n_hit_ngrams,
           COUNT(bset.gram) > 0 AS contaminated
    FROM ({corpus_sql}) c
      LEFT JOIN cg ON cg.doc_id = c.doc_id
      LEFT JOIN bset ON cg.gram = bset.gram
    GROUP BY c.doc_id
    """
