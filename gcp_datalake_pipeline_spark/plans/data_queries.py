"""Training-data pipeline queries (dedup / similarity / text analysis /
sampling) — registered alongside the relational core in the same QUERIES
registry.

Every query here is value-level oracled, including the approximate family:
MinHash/SimHash gates run md5-parity hash modes DuckDB reproduces exactly,
and the ANN gates embed their deterministic plane/centroid constants in the
oracle SQL. The only rows-only entry in the whole registry is the HLL
sketch (approximate by nature; bounds are pytest-checked). Approximation
QUALITY (recall vs the exact operators) is bounded separately in
tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators import (
    dedup,
    rerank,
    selection,
    similarity,
    text,
)
from gcp_datalake_pipeline_spark.plans.queries import load_table, register

ANN_QUERY_IDS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]


@register(
    "doc_text_stats",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ),
    stats AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             ROUND(AVG(LENGTH(tok)), 4) AS avg_token_len,
             ROUND(AVG(CASE WHEN tok IN ('the','a','of','and','to')
                            THEN 1.0 ELSE 0.0 END), 4) AS stopword_ratio
      FROM toks GROUP BY doc_id
    )
    SELECT d.doc_id, d.n_chars, s.n_tokens, s.avg_token_len, s.stopword_ratio
    FROM documents d JOIN stats s ON d.doc_id = s.doc_id
    """,
    doc="Per-document quality stats: token count, avg token length, stopword ratio.",
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(load_table(spark, sf_dir, "documents"))


@register(
    "doc_lang_id",
    text.lang_id_oracle_sql(),
    doc="Stopword-vote language ID vs the labeled lang column.",
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(load_table(spark, sf_dir, "documents"))


@register(
    "doc_token_counts_bpe_ish",
    r"""
    SELECT doc_id,
           len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens
    FROM documents
    """,
    doc="""Token counting two ways (SURVEY north-star): whitespace split and
    a BPE-ish regex lexer (letter runs / digit runs / single punctuation) —
    the standard pre-tokenizer shape. Pattern restricted to constructs with
    identical Java-regex / RE2 semantics.""",
)
def doc_token_counts_bpe_ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.text import TOKEN_SPLIT_RE

    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), TOKEN_SPLIT_RE)).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
            )
        ).alias("bpe_ish_tokens"),
    )


@register(
    "doc_repetition_ratio",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_distinct,
           ROUND(CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*), 4)
             AS distinct_ratio
    FROM toks GROUP BY doc_id
    """,
    doc="""Repetition-based quality signal: distinct-token ratio per doc
    (low ratio ~ boilerplate/repetitive text — a standard training-data
    quality filter input).""",
)
def doc_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.text import tokens

    return (
        tokens(load_table(spark, sf_dir, "documents"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_distinct"),
            F.round(
                F.countDistinct("tok").cast("double") / F.count(F.lit(1)), 4
            ).alias("distinct_ratio"),
        )
    )


@register(
    "doc_fingerprint",
    "SELECT doc_id, md5(text) AS fingerprint FROM documents",
    doc="Deterministic md5 content fingerprint per document.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_exact",
    """
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
           doc_id != MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
    FROM documents
    """,
    doc="Exact dedup: canonical min-doc_id per identical text (hash-grouped).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_jaccard",
    dedup.jaccard_pairs_oracle_sql(threshold=0.8),
    doc="""Exact token-set Jaccard near-dup pairs (lang-blocked self-join).
    The verifier for the MinHash/LSH approximate path.""",
)
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8
    )


@register(
    "dedup_minhash_lsh",
    dedup.minhash_lsh_oracle_sql(num_perm=32, bands=8, threshold=0.8),
    doc="""MinHash(32) + LSH(8 bands) candidates verified by exact Jaccard
    >= 0.8. Approximate-recall scale path for dedup_jaccard. Gate runs the
    md5-parity hash mode so the ENTIRE pipeline (signatures, banding,
    bucket join, verification) is value-level oracled in DuckDB; production
    default stays xxhash64 (same plan shape, faster hash).""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, hash_mode="md5"
    )


@register(
    "dedup_simhash",
    dedup.simhash_pairs_oracle_sql(max_hamming=12),
    doc="""SimHash near-dup pairs, 4-chunk blocked, hamming<=12. Gate runs
    the md5-parity 60-bit mode so fingerprints, blocking and hamming are
    value-level oracled; production default stays 64-bit xxhash64.""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_pairs(
        load_table(spark, sf_dir, "documents"), hash_mode="md5"
    )


@register(
    "doc_bigram_fluency",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '\\s+')) AS tok,
             generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS pos
      FROM documents
    ),
    bg AS (
      SELECT doc_id, tok || ' ' || LEAD(tok) OVER w AS bigram
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY LEAD(tok) OVER w IS NOT NULL
    ),
    counts AS (SELECT md5(bigram) AS h, COUNT(*) AS cnt FROM bg GROUP BY 1)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(ln(cnt)), 4) AS avg_log_freq
    FROM bg JOIN counts ON md5(bg.bigram) = counts.h
    GROUP BY doc_id
    """,
    doc="""Corpus-typicality fluency score: mean log corpus-frequency of a
    document's bigrams — a cheap statistical LM proxy used as a quality
    filter signal (gibberish scores low, boilerplate scores high; combine
    with distinct_ratio). Scale: bigrams built as a narrow zip_with (no
    window shuffle); the frequency groupBy and join carry md5(bigram).""",
)
def doc_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.text import TOKEN_SPLIT_RE

    toks = F.split(F.col("text"), TOKEN_SPLIT_RE)
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks), F.lit(1))),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
        lambda x: x.isNotNull(),
    )
    from gcp_datalake_pipeline_spark.parallelism import (
        ensure_scan_parallelism,
    )

    # the bigram build + md5 is compute-dense: spread tiny local scans
    # (cluster no-op) so the explode uses the whole machine
    bg = (
        ensure_scan_parallelism(load_table(spark, sf_dir, "documents"))
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .withColumn("h", F.md5("bigram"))
    )
    counts = bg.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        bg.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log("cnt")), 4).alias("avg_log_freq"),
        )
    )


from gcp_datalake_pipeline_spark.operators import sampling  # noqa: E402


@register(
    "train_val_test_split",
    sampling.hash_split_oracle_sql(),
    doc="""Deterministic hash-based train/val/test split (90/5/5): the
    standard reproducible-split mechanism for training corpora —
    assignment is a pure function of (doc_id, salt), stable across runs,
    engines and corpus growth. Narrow md5 bucket expression, no shuffle.""",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.hash_split(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )


def _pii_text_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic synthetic-PII text (_PII_BASE_CTE's Spark twin),
    shared by the redaction and pseudonymization gates."""
    cust = load_table(spark, sf_dir, "customer")
    t = F.concat(
        F.col("c_name"),
        F.lit(" <"),
        F.lower(F.col("c_mktsegment")),
        F.col("c_custkey").cast("string"),
        F.lit("@mail.example.com> tel 600-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((F.col("c_custkey") * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" ref "),
        F.lpad((F.col("c_custkey") * 13).cast("string"), 9, "0"),
    )
    return cust.select("c_custkey", t.alias("text"))


_PII_BASE_CTE = (
    "base AS (SELECT c_custkey, c_name || ' <' || lower(c_mktsegment) || "
    "c_custkey::VARCHAR || '@mail.example.com> tel 600-' || "
    "lpad((c_custkey % 1000)::VARCHAR, 3, '0') || '-' || "
    "lpad(((c_custkey * 7) % 10000)::VARCHAR, 4, '0') || ' ref ' || "
    "lpad((c_custkey * 13)::VARCHAR, 9, '0') AS t FROM customer)"
)


@register(
    "pii_redaction",
    text.redact_pii_sql(_PII_BASE_CTE, id_col="c_custkey"),
    doc="""Training-data PII scrub under the oracle gate: deterministic
    synthetic PII (email/phone/id built from customer fields on BOTH
    sides) through the REAL redact_pii operator — sequential
    count-then-redact, narrow codegen'd regex, zero shuffles.""",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.redact_pii(
        _pii_text_frame(spark, sf_dir), id_col="c_custkey"
    )


@register(
    "dedup_clusters",
    dedup.near_dup_clusters_oracle_sql(threshold=0.8),
    doc="""Connected components over the exact near-dup pairs: cluster_id =
    min reachable doc_id, is_canonical marks the keeper — the step that
    turns pairs into keep/drop decisions. Spark: iterative min-label
    propagation (O(diameter) set-based rounds); oracle: recursive-CTE
    transitive closure.""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.near_dup_clusters(
        docs, dedup.jaccard_pairs(docs, threshold=0.8)
    )


@register(
    "dedup_clusters_lsh",
    dedup.near_dup_clusters_lsh_oracle_sql(threshold=0.8),
    doc="""Duplication-collapsed LSH clustering (r13 skew drill,
    dedup.near_dup_clusters_lsh): exact-duplicate texts collapse to one
    representative BEFORE banding, so the band self-join's hottest
    bucket is bounded by DISTINCT texts — a corpus where one
    boilerplate page owns 50% of rows no longer turns the candidate
    join quadratic (bands*D^2/2) with a single straggler partition.
    Copies attach to their representative's cluster with one linear
    join; labels are provably identical to clustering the full LSH
    pair graph (the component minimum is always a representative) —
    oracle = the uncollapsed md5-LSH closure plus the definitional
    identical-text edges, value-level.""",
)
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.near_dup_clusters_lsh(
        docs, threshold=0.8, hash_mode="md5"
    )


@register(
    "chunk_boilerplate",
    dedup.chunk_boilerplate_oracle_sql(chunk_tokens=10, min_docs=2),
    doc="""Cross-document chunk-level dedup (C4-style line dedup over
    10-token chunks): per doc, chunks appearing in >=2 distinct docs are
    boilerplate. Shuffles carry md5(chunk), never chunk text.""",
)
def chunk_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.chunk_boilerplate_report(
        load_table(spark, sf_dir, "documents"), chunk_tokens=10, min_docs=2
    )


from gcp_datalake_pipeline_spark.operators.corpus import (  # noqa: E402
    curate_corpus,
    curation_oracle_sql,
)


@register(
    "corpus_curation",
    curation_oracle_sql(jaccard_threshold=0.8, min_tokens=50),
    doc="""End-to-end corpus curation disposition per document: exact_dup /
    near_dup (shingle-Jaccard, keep-lowest-id) / too_short / kept. The
    composite LLM-training-data pipeline; the 'lsh' backend is the
    near-linear scale path (verified consistent in pytest).""",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate_corpus(load_table(spark, sf_dir, "documents"))


@register(
    "fuzzy_name_match",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    doc="""Fuzzy entity matching via edit distance — the capability the
    reference staged but never wired (`etl-gcs-cloudsql/package.json:26,30`
    ships unused fast-levenshtein/fuse.js deps; SURVEY.md §2.10). Built-in
    levenshtein, distinct-name self-join (distinct values are few even when
    the fact table is huge; for true at-scale fuzzy joins, block on a
    q-gram LSH like dedup_minhash_lsh).""",
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, F.col("a.p_name") < F.col("b.p_name"))
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 2)
    )


@register(
    "fuzzy_join_qgram",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    grams AS (
      SELECT p_name,
             unnest(list_transform(range(1, greatest(len(p_name) - 1, 2)),
                                   i -> substr(p_name, CAST(i AS INT), 3))) AS g
      FROM names
    ),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM grams a JOIN grams b ON a.g = b.g AND a.p_name < b.p_name
    )
    SELECT name_a, name_b, levenshtein(name_a, name_b) AS edit_dist
    FROM cand WHERE levenshtein(name_a, name_b) <= 2
    """,
    doc="""At-scale fuzzy join: char-3-gram blocking (names pair only when
    they share a q-gram — an equi-join, never all-pairs) + levenshtein
    verification. The scale path fuzzy_name_match's docstring promises;
    blocking is replicated exactly in the oracle, so parity is value-level.
    Scale: |grams| ~ L per name; candidate count ~ bucket occupancy.""",
)
def fuzzy_join_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    grams = names.select(
        "p_name",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.length("p_name") - 2, F.lit(1))
                ),
                lambda i: F.col("p_name").substr(i, F.lit(3)),
            )
        ).alias("g"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"), F.col("b.p_name").alias("name_b")
        )
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.select("name_a", "name_b", dist.alias("edit_dist")).filter(
        F.col("edit_dist") <= 2
    )


@register(
    "doc_tfidf_topk",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS dfreq FROM tf GROUP BY tok),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             ROUND(tf.tf * ln(n.n_docs * 1.0 / dfreq.dfreq), 4) AS tfidf
      FROM tf JOIN dfreq USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
    doc="""Top-3 TF-IDF terms per document — the classic keyword/feature
    extraction pass. Scale: tf is one (doc, tok) shuffle with map-side
    partial agg; dfreq aggregates the already-small tf table; the corpus
    size N broadcasts; rank is a per-doc window.""",
)
def doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gcp_datalake_pipeline_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        tokens(docs)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("dfreq"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs") * 1.0 / F.col("dfreq")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tfidf", "rnk")
    )


@register(
    "embedding_near_dup",
    similarity.embedding_near_dup_oracle_sql(threshold=0.3),
    doc="""Embedding-cosine near-dup pairs within label blocks, on the
    default Arrow/BLAS backend (one normalized matmul per label block in
    applyInPandas — 7.8x the HOF join at sf0.1).""",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3
    )


@register(
    "embedding_near_dup_hof",
    similarity.embedding_near_dup_oracle_sql(threshold=0.3),
    doc="""Same semantics and the SAME oracle as embedding_near_dup, via
    the zero-Python fallback backend: a pair-at-a-time JVM higher-order-
    function join. Gated separately so BOTH backends stay value-level
    oracle-checked round over round.""",
)
def embedding_near_dup_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3, backend="hof"
    )


@register(
    "embedding_near_dup_lsh",
    similarity.embedding_near_dup_lsh_oracle_sql(threshold=0.3),
    doc="""Embedding-cosine near-dup pairs for UNLABELED corpora: LSH
    buckets (6 planes, probe radius 2) replace the label column as the
    self-join blocker; exact-cosine verification on the default Arrow
    backend (vectorized pandas-UDF cosine, streaming pair batches). The
    100 TB embedding dedup path; fully value-level oracled via embedded
    plane literals.""",
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup_lsh(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3
    )


@register(
    "embedding_near_dup_lsh_hof",
    similarity.embedding_near_dup_lsh_oracle_sql(threshold=0.3),
    doc="""Same semantics and the SAME oracle as embedding_near_dup_lsh,
    with candidate verification on the zero-Python JVM HOF fallback.""",
)
def embedding_near_dup_lsh_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup_lsh(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3, backend="hof"
    )


@register(
    "dsir_topk",
    selection.dsir_topk_oracle_sql(k=20),
    doc="""DSIR training-data selection (Xie et al., arXiv:2302.03169):
    hashed unigram+bigram importance weights log p_target - log q_raw
    (target = the English slice, raw = the whole pool), top-20 by
    weight. Gate runs the md5-parity bucket hash so featurization,
    smoothing, and the weighted sum are value-level oracled end to
    end; production default stays xxhash64 (same plan shape). The
    bucket ratio table is a broadcast constant, so scoring scales as
    one scan + one groupBy per corpus.""",
)
def dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return selection.dsir_topk(
        docs, docs.filter(F.col("lang") == "en"), k=20, hash_mode="md5"
    )


@register(
    "dedup_semantic",
    similarity.semdedup_oracle_sql(threshold=0.3),
    doc="""SemDeDup (Abbas et al., arXiv:2303.09540): k-means clusters
    the embedding space (unrolled-Lloyd determinism), then within-
    cluster cosine pairs above threshold mark their higher id removed
    (keep-lowest-id). The embedding-level complement of the text dedup
    family: pair work is quadratic only within a cell, so the cluster
    count is the 100 TB knob — exactly the paper's design.""",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.semdedup(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3
    )


@register(
    "ann_topk",
    similarity.brute_force_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""Exact brute-force cosine top-5 neighbors for 10 query vectors,
    on the default Arrow backend (one BLAS matmul per batch).""",
)
def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5
    )


@register(
    "ann_topk_hof",
    similarity.brute_force_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""Same semantics and the SAME oracle as ann_topk, on the
    zero-Python JVM higher-order-function fallback backend.""",
)
def ann_topk_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5,
        backend="hof",
    )


@register(
    "ann_ivf_topk",
    similarity.ivf_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""IVF-Flat approximate top-5: inverted cells by nearest centroid,
    nprobe-cell pruning, exact rank within probed cells — the second ANN
    scale path next to hyperplane LSH. Default Arrow backend (batched
    matmul assignment, driver-exact probe list). Fully value-level
    oracled (deterministic centroid choice).""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5
    )


@register(
    "ann_ivf_topk_hof",
    similarity.ivf_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""Same semantics and the SAME oracle as ann_ivf_topk, on the
    zero-Python JVM fallback (packed-centroid broadcast fold assignment,
    HOF cosine verification).""",
)
def ann_ivf_topk_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5,
        backend="hof",
    )


@register(
    "ann_ivf_kmeans_topk",
    similarity.ivf_kmeans_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""IVF-Flat top-5 over Lloyd-REFINED centroids (2 k-means steps on
    the deterministic seeds): the production centroid path. Fully
    value-level oracled — the Lloyd steps are unrolled in the DuckDB SQL
    with the same rounded-cosine assignment and 6-decimal-rounded means,
    so both engines derive identical cells, probes, and ranks.""",
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = similarity.kmeans_centroids(emb, nlist=16, n_iter=2)
    return similarity.ivf_topk(emb, ANN_QUERY_IDS, k=5, centroids=cent)


def _ann_cached_root(sf_dir: str, family: str) -> str:
    """Machine-cache root for a persisted ANN index family, keyed on the
    embeddings FINGERPRINT (path + mtime + size — regenerated testdata
    at the same path gets a fresh root, never a stale index). The name
    carries a separate PATH hash so each sf_dir keeps its own live root;
    on a cache miss, SIBLING roots of the same (family, path) with a
    superseded fingerprint — and any legacy-format root of the family —
    are swept before building (r9 verdict #1: stale roots used to
    accumulate unboundedly in the system temp dir). The sweep is always
    safe: indexes are deterministic rebuilds, and a concurrent process
    on the CURRENT testdata shares the current fingerprint, so only
    roots for data that no longer exists are ever removed."""
    import hashlib
    import os
    import re
    import shutil
    import tempfile

    emb_path = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    st = os.stat(emb_path)
    phash = hashlib.md5(emb_path.encode()).hexdigest()[:8]
    vhash = hashlib.md5(
        f"{emb_path}@{st.st_mtime_ns}#{st.st_size}".encode()
    ).hexdigest()[:10]
    tmp = tempfile.gettempdir()
    base = f"spark_graft_ann_{family}_{phash}_{vhash}"
    root = os.path.join(tmp, base)
    if not os.path.isdir(root):
        fam = re.escape(family)
        stale = re.compile(
            rf"^spark_graft_ann_{fam}_{phash}_[0-9a-f]{{10}}$"  # superseded
            rf"|^spark_graft_ann_{fam}_[0-9a-f]{{10}}$"  # legacy naming
        )
        for e in os.listdir(tmp):
            if e != base and stale.fullmatch(e):
                shutil.rmtree(os.path.join(tmp, e), ignore_errors=True)
    return root


def _ann_index_catalog(spark: SparkSession, sf_dir: str):
    """Machine-cached PERSISTED IVF index for the registry query: built
    once per embeddings fingerprint (see :func:`_ann_cached_root`) into
    a tmp transactional catalog, then only queried. Deterministic by
    construction (same centroids/assign contract as
    ann_ivf_kmeans_topk), so a concurrent builder racing on the same
    root produces identical data — a ConcurrentWriteError just means
    the other build won, and we read its result."""
    from gcp_datalake_pipeline_spark.operators import ann_index
    from gcp_datalake_pipeline_spark.transactions import (
        ConcurrentWriteError,
        TransactionalCatalog,
    )

    cat = TransactionalCatalog(
        spark=spark, root=_ann_cached_root(sf_dir, "ivf")
    )
    if not cat.exists("ann_ivf_cells"):
        try:
            ann_index.build_ivf_index(
                cat, load_table(spark, sf_dir, "embeddings")
            )
        except ConcurrentWriteError:
            pass  # identical concurrent build already committed
    return cat


@register(
    "ann_ivf_index_topk",
    similarity.ivf_kmeans_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""Top-5 over the PERSISTED IVF index (ann_index.build_ivf_index
    once per process, then query-only): centroids + cid-partitioned cell
    assignments live in the catalog and the candidate scan is
    partition-pruned to the probed cells — at 100 TB a query opens
    ~nprobe/nlist of the corpus files on disk, not just in compute.
    Value-identical to ann_ivf_kmeans_topk (same rounded-cosine
    assignment, probe ordering, rank tiebreaks), so it shares that
    query's fully-unrolled Lloyd oracle.""",
)
def ann_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators import ann_index

    return ann_index.ivf_index_topk(
        _ann_index_catalog(spark, sf_dir), ANN_QUERY_IDS, k=5
    )


@register(
    "ann_ivf_index_topk_df",
    similarity.ivf_kmeans_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""The BULK serving shape over the persisted IVF index: queries
    arrive as a DataFrame (here the query ids' own embedding rows) and
    centroid ranking runs as an Arrow-batched pandas_udf with the
    bounded nlist x dim centroid matrix broadcast — no query vector is
    ever collected to the driver, so the same plan re-scores millions
    of queries. Probe selection, rounding, and rank tiebreaks are
    value-identical to the driver-list path (ann_ivf_index_topk), so
    all three IVF paths share one fully-unrolled Lloyd oracle.""",
)
def ann_ivf_index_topk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators import ann_index

    q = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isin(ANN_QUERY_IDS)
    )
    return ann_index.ivf_index_topk_df(
        _ann_index_catalog(spark, sf_dir),
        q,
        k=5,
        id_col="vec_id",
        vec_col="embedding",
        exclude_self=True,
    )


ANN_REMOVED_IDS = [73, 343]  # served neighbors at sf0.001 AND sf0.01


def _ann_removed_index_catalog(spark: SparkSession, sf_dir: str):
    """The tombstoned twin of :func:`_ann_index_catalog`: a SEPARATE
    machine-cached index root (the shared one must stay unmutated) with
    ``remove_ids(ANN_REMOVED_IDS)`` applied after the build. Both steps
    are deterministic, so concurrent builders converge; a duplicated
    tombstone append from a lost race is harmless (anti-join
    semantics)."""
    from gcp_datalake_pipeline_spark.operators import ann_index
    from gcp_datalake_pipeline_spark.transactions import (
        ConcurrentWriteError,
        TransactionalCatalog,
    )

    cat = TransactionalCatalog(
        spark=spark, root=_ann_cached_root(sf_dir, "ivf_rm")
    )
    if not cat.exists("ann_ivf_cells"):
        try:
            ann_index.build_ivf_index(
                cat, load_table(spark, sf_dir, "embeddings")
            )
        except ConcurrentWriteError:
            pass  # identical concurrent build already committed
    if not cat.exists("ann_ivf_tombstones"):
        try:
            ann_index.remove_ids(cat, ANN_REMOVED_IDS)
        except ConcurrentWriteError:
            pass
    return cat


@register(
    "ann_ivf_index_topk_removed",
    similarity.ivf_kmeans_topk_oracle_sql(
        ANN_QUERY_IDS, k=5, exclude_ids=ANN_REMOVED_IDS
    ),
    doc="""Serving AFTER a delete: top-5 over the persisted IVF index
    with two served neighbors tombstoned via ann_index.remove_ids — the
    removed ids must vanish from every ranking (their former slots
    refill from the probed cells) while every other row is untouched.
    The oracle is the same fully-unrolled Lloyd SQL with the removed
    ids excluded from the CANDIDATE set only (centroids and probes stay
    full-corpus — a delete never re-trains), which is exactly the
    serving-side tombstone anti-join. At 100 TB this is the
    GDPR-deletion path: one slim tombstone append, no partition
    rewrites, compaction folds later.""",
)
def ann_ivf_index_topk_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators import ann_index

    return ann_index.ivf_index_topk(
        _ann_removed_index_catalog(spark, sf_dir), ANN_QUERY_IDS, k=5
    )


@register(
    "ann_lsh_topk",
    similarity.lsh_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""Hyperplane-LSH bucketed approximate top-5 (multi-probe radius 2).
    Fully oracled: the seeded plane literals are embedded in the DuckDB SQL,
    so bucket bits, probes, candidates and ranks match value-for-value.
    (Recall vs the exact ann_topk is bounded separately in pytest.)""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5
    )


@register(
    "doc_chunking",
    text.chunk_documents_oracle_sql(chunk_tokens=12, overlap=4),
    doc="""Token-bounded chunking with overlap (context-window prep):
    chunk i covers tokens [i*stride, i*stride+12) with stride 8. Pure
    row-local expressions — split once, arithmetic chunk count, explode a
    tiny index sequence, slice. Zero shuffles at any scale.""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=12, overlap=4
    )


@register(
    "per_source_cap",
    sampling.per_source_cap_oracle_sql(cap=50),
    doc="""Domain cap: keep the 50 smallest doc_ids per source (mega-domain
    guard for web corpora). Runs the two-phase salted path — phase 1 caps
    within (source, salt) so no single skewed domain ever serializes onto
    one task; phase 2's exact window sees <= cap*salts rows per source.
    Value-identical to the single-window oracle.""",
)
def per_source_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.per_source_cap(
        load_table(spark, sf_dir, "documents"), cap=50, salt_buckets=4
    )


@register(
    "dedup_incremental_minhash",
    f"""
    SELECT * FROM ({dedup.minhash_lsh_oracle_sql(threshold=0.8)})
    WHERE doc_b >= (SELECT CAST(FLOOR((MAX(doc_id) + 1) / 2.0) AS BIGINT)
                    FROM documents)
    """,
    doc="""Incremental near-dup detection — the production dedup shape:
    the corpus is split at the median doc_id into an already-deduped
    'existing' half and a 'new' batch; only the new bands probe the band
    index (existing x existing pairs are never generated) and exact
    verification touches candidate members only. Values = the full-corpus
    LSH pairs restricted to pairs with a new member.""",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k = (docs.agg((F.floor((F.max("doc_id") + 1) / 2)).cast("long")).first()[0])
    return dedup.incremental_near_dups(
        docs.filter(F.col("doc_id") < k),
        docs.filter(F.col("doc_id") >= k),
        threshold=0.8,
        hash_mode="md5",
    )


@register(
    "embedding_near_dup_incremental",
    f"""
    SELECT * FROM ({similarity.embedding_near_dup_lsh_oracle_sql(threshold=0.3)})
    WHERE vec_b >= (SELECT CAST(FLOOR((MAX(vec_id) + 1) / 2.0) AS BIGINT)
                    FROM embeddings)
    """,
    doc="""Incremental embedding near-dup: the corpus splits at the median
    vec_id into an existing half and a new batch; only the new batch's
    XOR-probed buckets join the bucket index (existing x existing never
    re-paired), verification broadcasts the bounded candidate list.
    Values = full-corpus LSH pairs restricted to pairs with a new member.""",
)
def embedding_near_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    k = emb.agg((F.floor((F.max("vec_id") + 1) / 2)).cast("long")).first()[0]
    return similarity.incremental_embedding_near_dups(
        emb.filter(F.col("vec_id") < k),
        emb.filter(F.col("vec_id") >= k),
        threshold=0.3,
    )


@register(
    "media_pixel_stats",
    """
    WITH imgs AS (
      SELECT i AS media_id,
             8 + (i % 5) * 4 AS width,
             8 + (i % 7) * 4 AS height,
             CASE i % 3 WHEN 1 THEN 1 WHEN 2 THEN 4 ELSE 3 END AS channels
      FROM range(60) t(i)
    )
    SELECT media_id, width, height, channels,
           ROUND(AVG(CAST((x + y + 7 * c + 13 * media_id) % 256 AS DOUBLE))
                 / 255.0, 6) AS mean_pixel,
           true AS decode_ok
    FROM imgs
    CROSS JOIN range(32) tx(x)
    CROSS JOIN range(32) ty(y)
    CROSS JOIN range(4) tc(c)
    WHERE x < width AND y < height AND c < channels
    GROUP BY media_id, width, height, channels
    """,
    doc="""Multimodal pixel decode under the driver's VALUE gate: 60
    deterministic images (pixel (y, x, c) = (x + y + 7c + 13·id) mod
    256; dims and channel count vary per id) are ENCODED to real BMP /
    PNG binaries with the package's own writers, pushed through
    image_pixel_stats' dependency-free decoders (BMP rows, PNG zlib +
    filters), and the decoded dims + mean intensity must equal the
    closed-form arithmetic DuckDB computes directly — the decode path
    itself is what the oracle checks (both codec families are exact, so
    equality is bit-level after the shared ROUND). Scale: mapInPandas,
    Arrow-batched, binaries never leave their partition; 60 rows here,
    the same plan at 100 TB.""",
)
def media_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from gcp_datalake_pipeline_spark.operators import multimodal as mm

    rows = []
    for i in range(60):
        w = 8 + (i % 5) * 4
        h = 8 + (i % 7) * 4
        ch = {0: 3, 1: 1, 2: 4}[i % 3]
        arr = (
            (
                np.arange(w)[None, :, None]
                + np.arange(h)[:, None, None]
                + 7 * np.arange(ch)[None, None, :]
                + 13 * i
            )
            % 256
        ).astype(np.uint8)
        # BMP only holds 3-channel exactly (1ch widens); PNG covers all
        if ch == 3 and i % 2 == 0:
            blob, mime = mm._encode_bmp(arr), "image/bmp"
        else:
            blob, mime = mm._encode_png(arr), "image/png"
        rows.append((i, mime, bytearray(blob)))
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    return mm.image_pixel_stats(df).select(
        "media_id",
        "width",
        "height",
        "channels",
        F.round("mean_pixel", 6).alias("mean_pixel"),
        "decode_ok",
    )


@register(
    "ann_pq_topk",
    similarity.pq_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""Product-quantization ANN top-5 (asymmetric distance): vectors
    stored as 8 uint8 subspace codes (64x smaller than 64-dim float64 —
    how a 100 TB candidate set fits executor memory at all), queries
    score candidates by summing per-subspace lookup-table entries.
    Deterministic codebooks (first-16 sub-vectors), rounded squared-L2
    terms ADC-summed in integer micro-units — the whole pipeline
    (encode argmin, tables, sums, ranks) is value-level oracled.
    Encoding = one Arrow matmul pass, scoring = JVM HOFs over the
    broadcast query tables.""",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.pq_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5
    )


@register(
    "ann_pq_rotated_topk",
    similarity.pq_rotated_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""The OPQ-family rotation in front of PQ: a seeded orthonormal
    rotation (FAISS RandomRotationMatrix) balances variance across the
    code subspaces before encoding — one Arrow matmul pass, then the
    verified pq_topk machinery unchanged on the rotated vectors. The
    rotation is embedded as round-6 literals in the oracle, so encode
    argmin, ADC tables, and ranks stay value-level checked end to end.
    (The data-trained rotation — rotation="opq", Ge et al. CVPR 2013
    — shares this serving path and is pytest-verified: SVD training is
    not SQL-expressible.)""",
)
def ann_pq_rotated_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.pq_rotated_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5
    )


@register(
    "ann_sq8_topk",
    similarity.sq8_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""Scalar-quantization ANN top-5 (FAISS ScalarQuantizer QT_8bit
    analog) — the 8x memory path between exact floats and PQ's 64x:
    one uint8 code per dimension under a per-dimension affine scale,
    scored ASYMMETRICALLY (exact query floats vs reconstructed
    corpus), so precision loss applies to the stored side only and
    recall beats PQ at the same byte budget for moderate dims. Train =
    ONE aggregation (2 x dim min/max expressions, no explode); encode
    and scoring are JVM higher-order functions over broadcast literal
    scale arrays; squared terms sum in integer micro-units — fully
    value-level oracled (buckets, reconstruction, distances, ranks).""",
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.sq8_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5
    )


@register(
    "ann_ivf_pq_topk",
    similarity.ivf_pq_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""IVF-PQ top-5: both ANN scale paths composed — nprobe/nlist
    cell pruning (the compute/IO path) over vectors stored as m uint8
    PQ codes (the memory path; FAISS IVFPQ with by_residual=False).
    ONE Arrow pass computes cell ids AND codes; scoring joins the
    broadcast (query, probed-cid, integer-table) rows and sums lookups
    in JVM HOFs. Fully value-level oracled: the ivf oracle's coarse
    CTEs composed with the PQ oracle's fine CTEs.""",
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_pq_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5
    )


def _ann_pq_index_catalog(spark: SparkSession, sf_dir: str):
    """Machine-cached PERSISTED IVF-PQ index (build_ivf_index with
    pq_m=8): the PQ twin of :func:`_ann_index_catalog`, in its own
    fingerprint-keyed root. Deterministic by construction (kmeans
    centroids + first-16 codebooks), so concurrent builders converge."""
    from gcp_datalake_pipeline_spark.operators import ann_index
    from gcp_datalake_pipeline_spark.transactions import (
        ConcurrentWriteError,
        TransactionalCatalog,
    )

    cat = TransactionalCatalog(
        spark=spark, root=_ann_cached_root(sf_dir, "ivfpq")
    )
    if not cat.exists("ann_ivf_pq_codebook"):
        try:
            ann_index.build_ivf_index(
                cat, load_table(spark, sf_dir, "embeddings"), pq_m=8
            )
        except ConcurrentWriteError:
            pass  # identical concurrent build already committed
    return cat


@register(
    "ann_ivf_index_pq_topk",
    similarity.ivf_kmeans_pq_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""ADC top-5 over the PERSISTED IVF-PQ index: the index stores
    kmeans cells AND 8 uint8 PQ codes per vector (frozen first-16
    codebook persisted beside the centroids), and serving reads the
    probed cells' (vid, cid, codes) ONLY — parquet column pruning never
    touches the vector column, so candidate I/O is ~8 bytes/vector
    instead of 512 (the FAISS IVFPQ serving shape). Probe ranking is
    the persisted-index contract (bounded driver matmul), scoring the
    JVM HOF ADC sum. Fully value-level oracled: unrolled-Lloyd coarse
    CTEs composed with the PQ fine CTEs.""",
)
def ann_ivf_index_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators import ann_index

    return ann_index.ivf_index_pq_topk(
        _ann_pq_index_catalog(spark, sf_dir), ANN_QUERY_IDS, k=5
    )


@register(
    "ann_ivf_index_pq_topk_df",
    similarity.ivf_kmeans_pq_topk_oracle_sql(ANN_QUERY_IDS, k=5),
    doc="""BULK ADC serving over the persisted IVF-PQ index: queries
    arrive as a DataFrame and BOTH the probe ranking and the per-query
    integer-micro-unit ADC tables are computed by Arrow-batched
    pandas_udfs against the broadcast centroid matrix + codebook — no
    query vector is ever collected to the driver, and the candidate
    scan still reads codes only. Value-identical to the driver-list
    path, so both share the composed Lloyd x PQ oracle.""",
)
def ann_ivf_index_pq_topk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators import ann_index

    q = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isin(ANN_QUERY_IDS)
    )
    return ann_index.ivf_index_pq_topk_df(
        _ann_pq_index_catalog(spark, sf_dir),
        q,
        k=5,
        id_col="vec_id",
        vec_col="embedding",
        exclude_self=True,
    )


def _ann_rpq_index_catalog(spark: SparkSession, sf_dir: str):
    """Machine-cached RESIDUAL IVF-PQ index (build_ivf_index with
    pq_m=8, pq_residual=True — FAISS by_residual): codes quantize
    v - centroid[cid]; own fingerprint-keyed root."""
    from gcp_datalake_pipeline_spark.operators import ann_index
    from gcp_datalake_pipeline_spark.transactions import (
        ConcurrentWriteError,
        TransactionalCatalog,
    )

    cat = TransactionalCatalog(
        spark=spark, root=_ann_cached_root(sf_dir, "ivfpqr")
    )
    if not cat.exists("ann_ivf_pq_codebook"):
        try:
            ann_index.build_ivf_index(
                cat,
                load_table(spark, sf_dir, "embeddings"),
                pq_m=8,
                pq_residual=True,
            )
        except ConcurrentWriteError:
            pass  # identical concurrent build already committed
    return cat


@register(
    "ann_ivf_index_pq_residual",
    similarity.ivf_kmeans_pq_topk_oracle_sql(ANN_QUERY_IDS, k=5, residual=True),
    doc="""ADC top-5 over a RESIDUAL IVF-PQ index (FAISS
    by_residual=True, the library default): codes quantize each
    vector's assignment residual v - centroid[cid] — residuals live in
    a smaller ball, so the same 8 codes carry more precision — and the
    per-query ADC tables become per-(query, probed cell), built from
    the query's residual w.r.t. each probed centroid (still bounded:
    nq x nprobe x m x ksub). Serving reads codes only, same as the
    raw-vector PQ path. Fully value-level oracled: the composed Lloyd
    x PQ SQL with lockstep-unnest list subtraction for the residuals
    and per-cell qtab CTEs.""",
)
def ann_ivf_index_pq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators import ann_index

    return ann_index.ivf_index_pq_topk(
        _ann_rpq_index_catalog(spark, sf_dir), ANN_QUERY_IDS, k=5
    )


@register(
    "ann_ivf_index_pq_rerank",
    similarity.ivf_kmeans_pq_topk_oracle_sql(ANN_QUERY_IDS, k=5, rerank=20),
    doc="""The FAISS refine step over the persisted IVF-PQ index: ADC
    shortlists the top-20 candidates per query from codes alone, then
    ONLY those 20 vectors are fetched (cid-pruned scan joined to the
    broadcast shortlist — refine I/O stays candidate-proportional) and
    re-ranked by exact rounded cosine for the final top-5. At 100 TB
    this buys exact-scoring accuracy within the probed cells while
    reading full vectors for a few dozen rows per query instead of
    whole cells. Oracled: the composed Lloyd x PQ SQL with the
    ADC-top-20 -> exact-cosine tail.""",
)
def ann_ivf_index_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators import ann_index

    return ann_index.ivf_index_pq_topk(
        _ann_pq_index_catalog(spark, sf_dir), ANN_QUERY_IDS, k=5, rerank=20
    )


@register(
    "dedup_exact_spans",
    """
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, i, array_to_string(toks[i:i+9], ' ') AS span
      FROM t,
           unnest(generate_series(1, greatest(len(toks) - 9, 0))) AS u(i)
    ),
    d AS (
      SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
      FROM s GROUP BY span HAVING COUNT(*) >= 2
    )
    SELECT span, n_docs, n_occ
    FROM d
    ORDER BY n_occ DESC, n_docs DESC, span
    LIMIT 20
    """,
    doc="""Exact repeated-SPAN detection (Lee et al. arXiv:2107.06499's
    contamination mode: verbatim >=w-token substrings duplicated across
    otherwise-distinct documents — boilerplate, licenses, templates):
    every 10-token sliding window, grouped corpus-wide, top-20 most
    repeated. MinHash finds near-dup documents; this finds the
    duplicated SUBSTRINGS inside them. Scale: one explode + ONE
    shuffle keyed on the span (8-byte xxhash64 of it at 100 TB — see
    find_repeated_spans(hash_spans=True)); the paper's suffix array
    becomes a hash-group. The strip step
    (dedup.strip_repeated_spans) keeps each span's first (doc, pos)
    occurrence and masks the rest, pytest-pinned.""",
)
def dedup_exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        dedup.find_repeated_spans(
            load_table(spark, sf_dir, "documents"), window=10
        )
        .orderBy(
            F.col("n_occ").desc(), F.col("n_docs").desc(), F.col("span")
        )
        .limit(20)
    )


@register(
    "doc_bm25_topk",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT AVG(dl * 1.0) AS avgdl, COUNT(*) AS n_docs FROM dl),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN ('spark', 'join', 'merge') GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS dfreq
              FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             ROUND(
               ln(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)),
               4
             ) AS bm25
      FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id, tok, bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id, tok
    LIMIT 20
    """,
    doc="""Per-(document, term) BM25 relevance for the query bag
    ('spark', 'join', 'merge') — TF-IDF's retrieval-grade successor:
    term-frequency SATURATION (k1=1.2 caps what repetition can earn)
    and document-LENGTH normalization (b=0.75 discounts long docs),
    Robertson/Lucene idf. Top-20 scores with deterministic
    tiebreakers. Scale: tf filters to the query terms BEFORE its
    shuffle, so the only corpus-sized stage is the token explode; df,
    N, avgdl broadcast. The doc-level ranking
    (text.bm25_topk_docs) sums per-term scores as exact integer
    micro-units so the reduction is order-free, pytest-pinned.""",
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        text.bm25_term_scores(
            load_table(spark, sf_dir, "documents"),
            ["spark", "join", "merge"],
        )
        .select("doc_id", "tok", F.round("bm25", 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id", "tok")
        .limit(20)
    )


@register(
    "ann_mmr_rerank",
    rerank.mmr_rerank_oracle_sql(query_id=3, k=10, n_candidates=40),
    doc="""MMR diversified re-rank (Carbonell & Goldstein, SIGIR 1998) of
    the query-3 brute-force candidate set: 10 picks balancing relevance
    against redundancy at lambda=0.7. Scale split: candidate generation
    and the n^2 candidate similarity matrix are distributed (rounded-
    cosine convention); the inherently sequential greedy loop runs
    driver-side over the collected n+n^2 rows, bounded by the candidate
    budget (the IVF-centroid collect discipline). Scores are pure BIGINT
    (micro-unit lambda/rel/sim), oracled by macro-expanded greedy CTEs.""",
)
def ann_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rerank.mmr_rerank(
        spark,
        load_table(spark, sf_dir, "embeddings"),
        query_id=3,
        k=10,
        n_candidates=40,
    )


@register(
    "doc_gopher_rules",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS words,
             string_split(text, chr(10)) AS lines,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             CAST((length(text) - length(replace(text, '...', ''))) / 3
                  AS BIGINT) AS n_ell
      FROM documents
    ),
    st AS (
      SELECT doc_id,
             len(words) AS n_words,
             COALESCE(list_sum(list_transform(words, x -> length(x))), 0)
               AS sum_len,
             n_hash + n_ell AS n_symbols,
             len(lines) AS n_lines,
             len(list_filter(lines,
                 l -> regexp_matches(l, '^\\s*[-*•]'))) AS n_bullet,
             len(list_filter(lines,
                 l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS n_ell_lines,
             len(list_filter(words,
                 x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
             len(list_filter(
                 ['the','be','to','of','and','that','have','with'],
                 sw -> list_contains(list_transform(words, x -> lower(x)),
                                     sw))) AS n_stop
      FROM w
    )
    SELECT doc_id, n_words,
           (n_words >= 40 AND n_words <= 100000) AS ok_word_count,
           (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
             AS ok_mean_word_len,
           (10 * n_symbols <= n_words) AS ok_symbol_ratio,
           (10 * n_bullet <= 9 * n_lines) AS ok_bullet_lines,
           (10 * n_ell_lines <= 3 * n_lines) AS ok_ellipsis_lines,
           (5 * n_alpha >= 4 * n_words) AS ok_alpha_words,
           (n_stop >= 2) AS ok_stopwords,
           ((n_words >= 40 AND n_words <= 100000)
            AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
            AND (10 * n_symbols <= n_words)
            AND (10 * n_bullet <= 9 * n_lines)
            AND (10 * n_ell_lines <= 3 * n_lines)
            AND (5 * n_alpha >= 4 * n_words)
            AND (n_stop >= 2)) AS pass_gopher
    FROM st
    ORDER BY doc_id
    """,
    doc="""Gopher-style quality rule filter (Rae et al. 2021, Appendix
    A): the canonical pre-training heuristic gate — word-count bounds,
    mean word length, symbol ratio, bullet/ellipsis line ratios,
    alphabetic-word ratio, required-stopword presence — per document
    with named per-rule booleans and the pass_gopher conjunction. One
    scan of pure column expressions (higher-order folds over the
    split arrays, no explode, no UDF); every threshold is an integer
    cross-multiplication so the booleans are bit-identical across
    engines. min_words=40 for the synthetic corpus (the paper's 50
    is the production default).""",
)
def doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.gopher_quality(
        load_table(spark, sf_dir, "documents"), min_words=40
    ).orderBy("doc_id")


@register(
    "bpe_train_merges",
    None,  # iterative argmax has no single-statement SQL oracle;
    # the merge sequence is pinned EXACTLY against a pure-Python
    # reference implementation in tests/test_curation.py
    doc="""BPE tokenizer-merge training (Sennrich et al. 2016) over the
    documents corpus: ONE corpus scan builds the word-frequency
    dictionary, then each merge round is one aggregation over that
    dictionary (explode adjacent symbol pairs weighted by word count,
    take the max with a lexicographic tie-break, fold the winner into
    every word with a higher-order aggregate — no UDF, no corpus
    re-scan). Deterministic: the merge table is a pure function of the
    corpus, pinned rank-for-rank against a pure-Python reference in
    pytest. Returns (rank, left, right, merged, pair_count).""",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators import bpe

    return bpe.bpe_train_df(
        load_table(spark, sf_dir, "documents"), n_merges=16
    ).orderBy("rank")


from gcp_datalake_pipeline_spark.operators.selection import (  # noqa: E402
    cluster_balanced_sample_oracle_sql as _cbs_oracle_sql,
)


@register(
    "cluster_balanced_sample",
    _cbs_oracle_sql(cap=24),
    doc="""Cluster-balanced selection (the SemDeDup/D4 diversity step):
    kmeans cells over the embedding corpus, at most 24 vectors kept per
    cell by deterministic md5 rank with id tiebreak — dominant clusters
    capped, rare clusters whole. Fully value-level oracled: the Lloyd
    steps unroll in SQL (shared CTEs with the kmeans gate) and the rank
    hash is the md5-prefix nibble twin the sampling gates already pin.
    Scale: per-cell top-cap never sorts a whole cell — rows pre-filter
    to a uniform-hash cutoff (~margin*cap survivors/cell, verified
    exactly, loud refusal otherwise) before the bounded window.""",
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.selection import (
        cluster_balanced_sample as _cbs,
    )

    return _cbs(
        load_table(spark, sf_dir, "embeddings"), cap=24
    ).orderBy("cid", "r")



from gcp_datalake_pipeline_spark.operators.text import (  # noqa: E402
    class_distinctive_terms_oracle_sql as _cdt_oracle_sql,
)


@register(
    "lang_distinctive_terms",
    _cdt_oracle_sql(class_col="lang", k=10, min_tf=3),
    doc="""Top-10 distinctive terms per language by c-TF-IDF
    (Grootendorst's class-based TF-IDF — the BERTopic representation):
    tf within the class times ln(n_classes/df), with the log weight
    quantized to Python-computed integer micro-units embedded as
    literals on BOTH engines (a 2-D CASE indexed by runtime n_classes
    on the oracle side), so every score is an exact BIGINT and ranking
    can never drift on cross-libm ln(). One token explode, map-side tf,
    vocabulary-sized class-count aggregate, per-class top-k window over
    the min_tf-pruned vocabulary.""",
)
def lang_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.text import (
        class_distinctive_terms,
    )

    return class_distinctive_terms(
        load_table(spark, sf_dir, "documents"), "lang", k=10, min_tf=3
    ).orderBy("lang", "r")


from gcp_datalake_pipeline_spark.operators.text import (  # noqa: E402
    pseudonymize_pii_oracle_sql as _pseud_oracle_sql,
)


@register(
    "pii_pseudonyms",
    _pseud_oracle_sql(_PII_BASE_CTE, id_col="c_custkey"),
    doc="""Consistent PII pseudonym dictionary: every email/phone/id
    entity in the corpus maps to a deterministic salted md5-prefix
    surrogate (<EMAIL_xxxxxxxx>) with its corpus-wide occurrence count
    — referential structure survives de-identification, identity does
    not. Earlier patterns mask the text before later ones extract
    (redact_pii's no-double-count discipline). One regexp explode per
    pattern, one distinct-entity-sized groupBy — the corpus is scanned
    once and never shuffled.""",
)
def pii_pseudonyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gcp_datalake_pipeline_spark.operators.text import pseudonymize_pii

    return pseudonymize_pii(
        _pii_text_frame(spark, sf_dir), id_col="c_custkey"
    )
