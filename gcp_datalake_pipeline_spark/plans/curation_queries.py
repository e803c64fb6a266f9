"""Training-corpus curation gates, batch 3: benchmark decontamination,
sequence packing, and stratified sampling over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.contamination import (
    ngram_contamination,
    ngram_contamination_oracle_sql,
)
from gcp_datalake_pipeline_spark.operators.packing import (
    pack_sequences,
    pack_sequences_oracle_sql,
)
from gcp_datalake_pipeline_spark.operators.sampling import (
    stratified_sample,
    stratified_sample_oracle_sql,
)
from gcp_datalake_pipeline_spark.operators import lm
from gcp_datalake_pipeline_spark.plans.queries import load_table, register

# The gate treats one source as the held-out benchmark and screens the
# rest of the corpus against it.
_BENCH_SOURCE = "src0"
_LANG_FRACTIONS = {"en": 0.5, "fr": 0.25, "de": 0.25, "es": 0.1, "zh": 0.05}


@register(
    "benchmark_contamination",
    ngram_contamination_oracle_sql(
        corpus_sql=(
            f"SELECT doc_id, text FROM documents WHERE source != '{_BENCH_SOURCE}'"
        ),
        benchmark_sql=(
            f"SELECT doc_id, text FROM documents WHERE source = '{_BENCH_SOURCE}'"
        ),
    ),
    doc="""Decontamination pass: flag corpus documents sharing any word
    5-gram with the held-out benchmark slice (source = src0). Scale: both
    sides reduce to distinct md5(n-gram) sets before the join; the
    benchmark set is small and broadcasts; counting is one doc_id
    shuffle.""",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != _BENCH_SOURCE).select(
        "doc_id", "text"
    )
    benchmark = docs.filter(F.col("source") == _BENCH_SOURCE).select(
        "doc_id", "text"
    )
    return ngram_contamination(corpus, benchmark)


@register(
    "pack_sequences_map",
    pack_sequences_oracle_sql(max_tokens=128),
    doc="""Concat-and-chop sequence packing (max_tokens=128, small enough
    that some documents straddle sequence cuts at every test SF): per
    document, its global token offset and the span of training sequences
    it lands in. Scale: the global prefix sum runs as the sharded two-pass
    scan — range partition, parallel per-shard cumsums, driver-side offsets
    bounded by shard count — never a single-task global window.""",
)
def pack_sequences_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, max_tokens=128)


@register(
    "stratified_sample_by_lang",
    stratified_sample_oracle_sql("lang", _LANG_FRACTIONS),
    doc="""Deterministic per-language downsample (rebalancing a multilingual
    corpus: keep half of en, a quarter of fr/de, less of es/zh). Pure
    narrow filter on an id-hash bucket — no shuffle, assignment stable
    under corpus growth, identical in Spark and DuckDB via md5.""",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", _LANG_FRACTIONS).select(
        "doc_id", "lang"
    )


@register(
    "doc_lm_perplexity",
    lm.doc_lm_perplexity_oracle_sql(),
    doc="""CCNet-style model-based quality scoring (arXiv:1911.00359): an
    add-alpha bigram LM trained on the reference slice (lang='en'), every
    document scored by mean negative log probability (monotone in
    perplexity); top-30 most reference-like. Scale: the LM is
    reference-bounded and broadcasts; scoring is one corpus scan + one
    map-side-combined groupBy(doc); -ln P terms are integer micro-units
    so per-doc sums are exact BIGINTs.""",
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("lang") == "en")
    return (
        lm.doc_lm_nll(docs, ref)
        .orderBy(F.asc("nll"), "doc_id")
        .limit(30)
    )


@register(
    "doc_perplexity_bands",
    lm.perplexity_bands_oracle_sql(),
    doc="""CCNet's head/middle/tail split: NTILE(3) over the perplexity
    order, summarized per band (count + score extremes). Scale: the global
    rank is the sharded two-pass scan (range partition + per-shard
    row_number + driver offsets bounded by shard count) with a closed-form
    NTILE bucket formula — never a single-task global window.""",
)
def doc_perplexity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("lang") == "en")
    banded = lm.perplexity_bands(docs, ref, bands=3)
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("nll").alias("min_nll"),
            F.max("nll").alias("max_nll"),
        )
        .orderBy("band")
    )
