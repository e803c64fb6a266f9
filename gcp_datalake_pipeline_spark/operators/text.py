"""Text analysis operators for large-scale training-data pipelines.

All pure Column/DataFrame expressions (JVM-side): tokenization, quality
stats, stopword-based language ID, document fingerprinting. The stopword
lists live here so the Spark plans and the DuckDB oracle SQL are generated
from the same source of truth.

Scale: every operator is a single explode + groupBy (one shuffle on doc_id
or none); no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.parallelism import ensure_scan_parallelism

TOKEN_SPLIT_RE = r"\s+"

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately small and deterministic — the oracle SQL embeds the same sets.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "les", "et", "des"],
}


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode whitespace tokens: (id_col, tok).

    Token explosion multiplies row count ~100x, and everything downstream
    of it (tf-idf, vocab counts, n-gram stats) inherits the scan stage's
    split count — so spread a tiny input here (no-op at cluster scale,
    see parallelism.py)."""
    df = ensure_scan_parallelism(df)
    return df.select(
        id_col, F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("tok")
    )


def token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(c, TOKEN_SPLIT_RE))


def text_stats(df: DataFrame) -> DataFrame:
    """Per-document stats: token count, avg token length, stopword ratio
    (English list), char count.

    Shape (r13 optimization): a NARROW per-row fold over the token array
    — zero shuffles. The previous explode + groupBy(doc_id) + self-join
    carried every token through codegen and paid two exchanges plus a
    join back to the doc table for values that are all derivable row-
    locally (guide §2.4: remove shuffles outright). Values are identical:
    the sums are integer-exact (token counts and byte lengths are longs;
    the old double AVG accumulated integer-valued doubles, exact under
    any order until 2^53), and the single division + round(4) is the
    same IEEE op on both shapes. Measured 3x faster at sf0.1; at 100 TB
    this now runs entirely in the scan stage."""
    en = STOPWORDS["en"]
    df = ensure_scan_parallelism(df)
    toks = F.split(F.col("text"), TOKEN_SPLIT_RE)
    n = F.size(F.col("_toks"))
    sum_len = F.aggregate(
        F.transform(F.col("_toks"), F.length),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_stop = F.size(F.filter(F.col("_toks"), lambda t: t.isin(*en)))
    return df.select("doc_id", "n_chars", toks.alias("_toks")).select(
        "doc_id",
        "n_chars",
        n.cast("long").alias("n_tokens"),
        F.round(sum_len / n, 4).alias("avg_token_len"),
        F.round(n_stop / n, 4).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame) -> DataFrame:
    """Stopword-vote language ID: per doc, the language whose stopword list
    matches the most tokens wins (ties and zero votes -> 'und').

    Output: (doc_id, predicted_lang, lang, is_match).

    Shape (r13 optimization): a NARROW per-row argmax over the token
    array — zero shuffles, no join. The stopword table is a handful of
    compile-time literals, so each language's vote count is one
    size(filter(tokens, tok IN (...))) fold and the winner is an
    array_max over (votes, rank, lang) structs whose rank field encodes
    the old window's ascending-lang tiebreak (higher rank = earlier
    alphabetically, so the struct max picks it on a vote tie). The
    previous explode + broadcast join + groupBy + row_number window +
    join-back paid four exchanges and a corpus-wide sort for values
    derivable row-locally (guide §2.4). Values identical (vote counts
    are the same IN-membership counts); zero votes still map to 'und'.
    Measured 3x faster at sf0.1; at 100 TB this runs in the scan stage.
    """
    df = ensure_scan_parallelism(df)
    toks = F.split(F.col("text"), TOKEN_SPLIT_RE)
    langs = sorted(STOPWORDS)
    entries = []
    for i, lang in enumerate(langs):
        words = STOPWORDS[lang]
        votes = F.size(F.filter(F.col("_toks"), lambda t: t.isin(*words)))
        entries.append(
            F.struct(
                votes.alias("v"),
                F.lit(len(langs) - i).alias("r"),
                F.lit(lang).alias("l"),
            )
        )
    best = F.array_max(F.array(*entries))
    pred = F.when(best["v"] > 0, best["l"]).otherwise(F.lit("und"))
    return df.select("doc_id", "lang", toks.alias("_toks")).select(
        "doc_id",
        pred.alias("predicted_lang"),
        "lang",
        (pred == F.col("lang")).alias("is_match"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into token-bounded chunks with overlap — the
    context-window preparation step of a training pipeline (long documents
    must fit a model's window; overlap preserves continuity at the seams).

    Chunk i covers tokens ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the final chunk may be shorter,
    and a document shorter than one window yields exactly one chunk.

    Everything is a narrow row-local expression: split once, derive the
    chunk count arithmetically, explode a tiny index sequence, slice the
    token array per chunk. No shuffle at all — at 100 TB this runs
    entirely in the scan stage and scales with input bytes.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    df = ensure_scan_parallelism(df)
    toks = F.split(F.col(text_col), TOKEN_SPLIT_RE)
    n = F.size(toks)
    # ceil((n - overlap) / stride), min 1 — double-ceil is exact for any
    # realistic token count and computes identically in the DuckDB oracle.
    k = F.greatest(
        F.lit(1),
        F.floor(
            ((n - F.lit(overlap)) + F.lit(stride - 1)) / F.lit(float(stride))
        ).cast("int"),
    )
    exploded = df.select(
        F.col(id_col), toks.alias("_toks"), k.alias("_k")
    ).select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_k") - 1)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("chunk_len"),
    )


def chunk_documents_oracle_sql(
    chunk_tokens: int = 64, overlap: int = 16
) -> str:
    stride = chunk_tokens - overlap
    return rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks,
             len(regexp_split_to_array(text, '\s+')) AS n
      FROM documents
    ), k AS (
      SELECT doc_id, toks,
             GREATEST(1, CAST(FLOOR((n - {overlap} + {stride - 1}) * 1.0
                                    / {stride}) AS INT)) AS k
      FROM t
    ), c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, k - 1)) AS chunk_id
      FROM k
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(list_slice(toks, chunk_id * {stride} + 1,
                                      chunk_id * {stride} + {chunk_tokens}),
                           ' ') AS chunk_text,
           CAST(len(list_slice(toks, chunk_id * {stride} + 1,
                               chunk_id * {stride} + {chunk_tokens}))
                AS BIGINT) AS chunk_len
    FROM c
    """


def fingerprint(df: DataFrame) -> DataFrame:
    """Deterministic content fingerprint (md5 of the raw text) — the
    exact-dedup key. Output: (doc_id, fingerprint)."""
    return df.select("doc_id", F.md5(F.col("text")).alias("fingerprint"))


# Ordered PII patterns (order matters: emails carry digit runs, so they
# redact first; phones before bare id runs). Restricted to regex constructs
# with identical Java-regex / RE2 / DuckDB semantics.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\d{3}-\d{3}-\d{4}"),
    ("id_number", r"\d{9,}"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Training-data PII scrub: sequentially count-then-redact each pattern
    (counts are taken on the text as already redacted by earlier patterns,
    so an email's digits are never double-counted as an id). Output:
    (id_col, n_<pattern>..., redacted).

    Scale: pure narrow regexp_replace/regexp_extract_all column expressions
    inside whole-stage codegen — zero shuffles, embarrassingly parallel.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    cur = F.col(text_col)
    cols = []
    for name, pat in patterns:
        cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    return df.select(id_col, *cols, cur.alias("redacted"))


def redact_pii_sql(
    base_cte: str,
    id_col: str,
    patterns: list[tuple[str, str]] | None = None,
) -> str:
    """DuckDB oracle for :func:`redact_pii`: the same sequential
    count-then-redact staged as one CTE per pattern. ``base_cte`` must
    define ``base(<id_col>, t)``."""
    patterns = PII_PATTERNS if patterns is None else patterns
    sql = f"WITH {base_cte}"
    prev = "base"
    for i, (name, pat) in enumerate(patterns):
        sql += f""",
    s{i} AS (
      SELECT {id_col}, {', '.join(f'n_{n}' for n, _ in patterns[:i])}{',' if i else ''}
             len(regexp_extract_all(t, '{pat}')) AS n_{name},
             regexp_replace(t, '{pat}', '<{name.upper()}>', 'g') AS t
      FROM {prev}
    )"""
        prev = f"s{i}"
    counts = ", ".join(f"n_{n}" for n, _ in patterns)
    return sql + f"\n    SELECT {id_col}, {counts}, t AS redacted FROM {prev}"


def lang_id_oracle_sql() -> str:
    """DuckDB SQL equivalent of :func:`lang_id`, generated from the same
    STOPWORDS source."""
    values = ", ".join(
        f"('{lang}', '{w}')" for lang, ws in STOPWORDS.items() for w in ws
    )
    return f"""
    WITH sw(cand_lang, tok) AS (VALUES {values}),
    toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ),
    votes AS (
      SELECT doc_id, cand_lang, COUNT(*) AS votes
      FROM toks JOIN sw USING (tok)
      GROUP BY doc_id, cand_lang
    ),
    best AS (
      SELECT doc_id, cand_lang AS predicted_lang
      FROM (SELECT doc_id, cand_lang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY votes DESC, cand_lang) rn
            FROM votes) WHERE rn = 1
    )
    SELECT d.doc_id,
           COALESCE(b.predicted_lang, 'und') AS predicted_lang,
           d.lang,
           COALESCE(b.predicted_lang, 'und') = d.lang AS is_match
    FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
    """


def bm25_term_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(document, query-term) BM25 relevance (the Robertson /
    Lucene form): ``idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
    with ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` — TF-IDF's
    retrieval-grade successor: term-frequency saturation (k1) plus
    document-length normalization (b). Returns ``(id_col, tok, bm25)``
    for documents containing at least one query term.

    Scale (r13 optimization): NO corpus token explode at all — the
    query bag is a compile-time literal list, so per-document length
    and per-term frequencies are NARROW per-row folds over the token
    array (``dl = size(tokens)``, ``tf_t = size(filter(tokens, =t))``);
    only documents containing a query term emit (doc, term, tf) rows
    (bounded by |terms| per doc). The previous shape exploded every
    token of the corpus and paid a corpus-wide groupBy for dl. Values
    identical: the same integer counts feed the same float formula.
    df, N, and avgdl are scalars/tiny frames that broadcast."""
    base = ensure_scan_parallelism(
        df.filter(F.col(text_col).isNotNull())
    ).select(
        id_col, F.split(F.col(text_col), TOKEN_SPLIT_RE).alias("_toks")
    )
    dl = F.size(F.col("_toks")).cast("long")
    per_term = F.array(
        *[
            F.struct(
                F.lit(t).alias("tok"),
                F.size(
                    F.filter(F.col("_toks"), lambda x: x == F.lit(t))
                )
                .cast("long")
                .alias("tf"),
            )
            for t in query_terms
        ]
    )
    tf = (
        base.select(
            id_col,
            dl.alias("dl"),
            F.explode(
                F.filter(per_term, lambda s: s["tf"] > 0)
            ).alias("_s"),
        )
        .select(
            id_col, "dl", F.col("_s.tok").alias("tok"), F.col("_s.tf").alias("tf")
        )
    )
    stats = base.agg(
        F.avg(dl.cast("double")).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    dfreq = tf.groupBy("tok").agg(
        F.countDistinct(id_col).alias("dfreq")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfreq") + 0.5)
        / (F.col("dfreq") + 0.5)
    )
    norm = F.col("tf") * (k1 + 1.0) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select(id_col, "tok", (idf * norm).alias("bm25"))
    )


def bm25_topk_docs(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query by summed BM25.
    The per-term scores are fixed to integer MICRO-units before the
    sum so the reduction is exact and order-free (float addition is
    not associative; a nondeterministic partial-agg order would make
    ranks flap run-to-run). Returns ``(id_col, bm25_micro)``."""
    per_term = bm25_term_scores(df, query_terms, k1, b, text_col, id_col)
    return (
        per_term.select(
            id_col,
            F.round(F.col("bm25") * 1e6).cast("bigint").alias("_m"),
        )
        .groupBy(id_col)
        .agg(F.sum("_m").alias("bm25_micro"))
        .orderBy(F.col("bm25_micro").desc(), id_col)
        .limit(k)
    )


GOPHER_REQUIRED_STOPWORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 Appendix A) as ONE scan of pure column
    expressions — no explode, no UDF: every rule folds over the
    split-word / split-line arrays with higher-order functions, so at
    100 TB this is a single embarrassingly-parallel projection.

    Per document: the named per-rule booleans plus ``pass_gopher``
    (their conjunction). Every threshold comparison is an INTEGER
    cross-multiplication (``10*symbols <= n_words`` instead of
    ``symbols/n_words <= 0.1``) so the booleans are exact and
    reproducible across engines — no float-division boundary can flip
    a flag between this and an oracle.

    Rules (paper defaults, word-count bounds parameterized):
    word count in [min_words, max_words]; mean word length in [3, 10];
    '#'-or-'...' symbol ratio <= 0.1; <= 90% of lines start with a
    bullet; <= 30% of lines end with an ellipsis; >= 80% of words
    contain an alphabetic character; >= 2 of the 8 required English
    stopwords present."""
    # The rule folds are compute-DENSE per row (several regex + HOF
    # passes over every word/line): spread tiny local scans so the work
    # uses the whole machine (cluster no-op — r13: 3.1s -> ~0.3s at
    # sf0.1 on local[32], previously bound to the input's single split).
    df = ensure_scan_parallelism(df)
    text = F.col(text_col)
    words = F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: w != F.lit("")
    )
    lines = F.split(text, r"\n")
    lwords = F.transform(words, F.lower)
    n_words = F.size(words)
    sum_len = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x
    )
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / 3
    n_symbols = (n_hash + n_ellipsis).cast("long")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    n_ell_lines = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    req = F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS])
    n_stop = F.size(F.filter(req, lambda s: F.array_contains(lwords, s)))
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (sum_len >= 3 * n_words)
        & (sum_len <= 10 * n_words),
        "ok_symbol_ratio": 10 * n_symbols <= n_words,
        "ok_bullet_lines": 10 * n_bullet <= 9 * n_lines,
        "ok_ellipsis_lines": 10 * n_ell_lines <= 3 * n_lines,
        "ok_alpha_words": 5 * n_alpha >= 4 * n_words,
        "ok_stopwords": n_stop >= 2,
    }
    out = df.select(
        id_col,
        n_words.alias("n_words"),
        *[c.alias(name) for name, c in flags.items()],
    )
    passed = out["ok_word_count"]
    for name in list(flags)[1:]:
        passed = passed & out[name]
    return out.withColumn("pass_gopher", passed)


def _ctfidf_idf_micro(n_classes: int, dfreq: int) -> int:
    """The c-TF-IDF inverse-class-frequency weight ln(n/df) in INTEGER
    MICRO-UNITS, computed ONCE in Python and embedded as literals on
    BOTH engines — cross-libm ln() drift can never flip a ranking
    boundary (the PQ/SQ8 literal-table discipline)."""
    import math

    return int(round(math.log(n_classes / dfreq) * 1_000_000))


def class_distinctive_terms(
    df: DataFrame,
    class_col: str = "lang",
    k: int = 10,
    min_tf: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` DISTINCTIVE terms per class by c-TF-IDF (Grootendorst's
    class-based TF-IDF, the BERTopic representation): score(tok, c) =
    tf(tok in class c) * ln(n_classes / classes_containing(tok)), with
    the log weight quantized to integer micro-units so the per-term
    score is an exact BIGINT on both engines. Output (class, tok,
    score, r), r the 1-based within-class rank (score desc, tok asc).

    Scale: ONE token explode (the only corpus-sized stage), map-side
    combined tf aggregation on (class, tok), a class-count aggregate
    over the VOCABULARY (not the corpus), and a per-class top-k window
    over vocabulary-sized groups (bounded by distinct terms; ``min_tf``
    prunes the tail before the window). n_classes is a bounded collect
    (class cardinality is small by definition of the operator)."""
    toks = tokens(df, text_col, id_col).join(
        df.select(id_col, class_col), id_col
    )
    tf = toks.groupBy(class_col, "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    if min_tf > 1:
        tf = tf.where(F.col("tf") >= min_tf)
    dfreq = tf.groupBy("tok").agg(
        F.count_distinct(class_col).alias("dfreq")
    )
    n_classes = df.select(class_col).distinct().count()
    idf = None
    for d in range(1, n_classes + 1):
        branch = (
            F.col("dfreq") == d,
            F.lit(_ctfidf_idf_micro(n_classes, d)),
        )
        idf = F.when(*branch) if idf is None else idf.when(*branch)
    from pyspark.sql import Window

    w = Window.partitionBy(class_col).orderBy(
        F.col("score").desc(), "tok"
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .select(
            class_col,
            "tok",
            (F.col("tf") * idf).cast("long").alias("score"),
        )
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
    )


def class_distinctive_terms_oracle_sql(
    class_col: str = "lang",
    k: int = 10,
    min_tf: int = 1,
    max_classes: int = 32,
) -> str:
    """DuckDB oracle over the documents view: identical tokenization,
    tf/df aggregation, and the SAME Python-computed micro-unit idf
    literals — indexed by (runtime n_classes, df) through a 2-D CASE
    covering n_classes <= ``max_classes``."""
    cases = []
    for n in range(1, max_classes + 1):
        for d in range(1, n + 1):
            cases.append(
                f"WHEN nc.n = {n} AND d.dfreq = {d} "
                f"THEN {_ctfidf_idf_micro(n, d)}::BIGINT"
            )
    case = "CASE " + " ".join(cases) + " END"
    return f"""
    WITH tk AS (
      SELECT {class_col}, unnest(string_split_regex(text, '\\s+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT {class_col}, tok, COUNT(*) AS tf FROM tk
      GROUP BY 1, 2 HAVING COUNT(*) >= {min_tf}
    ),
    d AS (SELECT tok, COUNT(DISTINCT {class_col}) AS dfreq FROM tf GROUP BY 1),
    nc AS (SELECT COUNT(DISTINCT {class_col}) AS n FROM documents)
    SELECT {class_col}, tok, score, r FROM (
      SELECT tf.{class_col}, tf.tok,
             CAST(tf.tf * ({case}) AS BIGINT) AS score,
             ROW_NUMBER() OVER (PARTITION BY tf.{class_col}
               ORDER BY tf.tf * ({case}) DESC, tf.tok) AS r
      FROM tf JOIN d USING (tok) CROSS JOIN nc
    ) WHERE r <= {k}
    ORDER BY {class_col}, r
    """


def pseudonymize_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str]] | None = None,
    salt: str = "pseud",
) -> DataFrame:
    """Consistent pseudonym DICTIONARY for the corpus' PII entities:
    one row per (entity_type, entity) with a deterministic surrogate
    ``<TYPE_xxxxxxxx>`` (first 8 md5 hex chars of ``entity:salt``) and
    its corpus-wide occurrence count. The same email maps to the same
    token in every document — referential structure survives
    de-identification (the k-anonymity-style join key), identity does
    not; re-salting re-rolls the whole mapping. Earlier patterns mask
    the text before later ones count (redact_pii's no-double-count
    discipline: an email's digits are never also an id_number).

    Output: (entity_type, entity, pseudonym, n_occurrences), ordered.
    Scale: regexp_extract_all + ONE explode per pattern (unioned before
    the single groupBy) — the shuffle carries distinct-entity-sized
    data, never the corpus; applying the mapping back to text is a
    broadcast join + aggregate replace for bounded dictionaries (the
    dictionary IS the artifact here)."""
    patterns = PII_PATTERNS if patterns is None else patterns
    cur = F.col(text_col)
    branches = []
    for name, pat in patterns:
        branches.append(
            df.select(
                F.lit(name).alias("entity_type"),
                F.explode(
                    F.regexp_extract_all(cur, F.lit(pat), 0)
                ).alias("entity"),
            )
        )
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    ents = branches[0]
    for b in branches[1:]:
        ents = ents.unionByName(b)
    pseud = F.concat(
        F.lit("<"),
        F.upper("entity_type"),
        F.lit("_"),
        F.substring(
            F.md5(F.concat(F.col("entity"), F.lit(":" + salt))), 1, 8
        ),
        F.lit(">"),
    )
    return (
        ents.groupBy("entity_type", "entity")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .select(
            "entity_type", "entity", pseud.alias("pseudonym"),
            "n_occurrences",
        )
        .orderBy("entity_type", "entity")
    )


def pseudonymize_pii_oracle_sql(
    base_cte: str,
    id_col: str,
    patterns: list[tuple[str, str]] | None = None,
    salt: str = "pseud",
) -> str:
    """DuckDB oracle: the same sequentially-masked extraction (one CTE
    per pattern), unioned, grouped, with the identical md5-prefix
    surrogate. ``base_cte`` must define ``base(<id_col>, t)`` (the
    redact_pii_sql convention)."""
    patterns = PII_PATTERNS if patterns is None else patterns
    ctes = [base_cte, f"s0 AS (SELECT {id_col}, t FROM base)"]
    ext = []
    for i, (name, pat) in enumerate(patterns):
        ext.append(
            f"e{i} AS (SELECT '{name}' AS entity_type, "
            f"unnest(regexp_extract_all(t, '{pat}')) AS entity FROM s{i})"
        )
        ctes.append(
            f"s{i + 1} AS (SELECT {id_col}, "
            f"regexp_replace(t, '{pat}', '<{name.upper()}>', 'g') AS t "
            f"FROM s{i})"
        )
    union = " UNION ALL ".join(f"SELECT * FROM e{i}" for i in range(len(ext)))
    return f"""
    WITH {", ".join(ctes + ext)},
    ents AS ({union})
    SELECT entity_type, entity,
           '<' || upper(entity_type) || '_' ||
           substr(md5(entity || ':{salt}'), 1, 8) || '>' AS pseudonym,
           COUNT(*) AS n_occurrences
    FROM ents
    GROUP BY 1, 2
    ORDER BY 1, 2
    """
