"""Byte-pair-encoding tokenizer TRAINING, Spark-first.

The classic BPE trainer (Sennrich et al. 2016, arXiv:1508.07909) never
iterates over the corpus: it scans it ONCE into a word-frequency
dictionary, then runs every merge round over that (much smaller)
dictionary. That is exactly the shape implemented here:

- :func:`bpe_word_counts` — one distributed scan: whitespace words,
  lowercased, -> (word, count). At 100 TB this is the only pass that
  touches the corpus; the dictionary is |vocab| rows (millions, not
  trillions) and stays a DataFrame — never collected.
- :func:`bpe_train` — ``n_merges`` rounds, each ONE aggregation over
  the dictionary: explode adjacent symbol pairs weighted by word
  count, take the max (count desc, then lexicographic pair — a total
  order, so training is deterministic and reproducible across
  engines), fold the winning pair into every word's symbol array with
  a pure higher-order ``aggregate`` (left-to-right non-overlapping,
  the reference semantics; no UDF anywhere). The dictionary is
  localCheckpoint'ed per round so the plan stays O(1) deep instead of
  O(n_merges).
- :func:`bpe_encode` — apply a learned merge list to documents:
  per-word greedy merge replay (the train-time fold, replayed in
  merge order), returning per-document piece counts.

Test strategy: the merge sequence is pinned against a pure-Python
reference implementation (tests/test_curation.py) on constructed and
real corpora; the registry entry is rows-only (an iterative argmax
has no single-statement SQL oracle — the one other such entry is the
HLL sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "▁"  # end-of-word marker (SentencePiece's visible space)


def bpe_word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """One corpus scan -> the (word, n) frequency dictionary."""
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    words = F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: w != F.lit("")
    )
    return (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _symbols(word):
    """A word's initial symbol array: its characters plus END. The
    between-character split keeps a trailing "" (the lookahead also
    matches at end-of-string under limit -1) — filtered out."""
    return F.concat(
        F.filter(F.split(word, "(?!^)"), lambda s: s != F.lit("")),
        F.array(F.lit(END)),
    )


def _fold_pair(symbols, left: str, right: str):
    """Replace left-to-right non-overlapping (left, right) adjacencies
    with their concatenation — the reference merge semantics, as one
    codegen'd higher-order fold (no Python in the loop body)."""
    merged = F.lit(left + right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda out, x: F.when(
            (F.size(out) > 0)
            & (F.element_at(out, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(out, 1, F.size(out) - 1), F.array(merged)),
        ).otherwise(F.concat(out, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_pair_count: int = 2,
    lowercase: bool = True,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from a corpus. Returns the ordered
    merge table: ``[{"rank", "left", "right", "merged", "pair_count"},
    ...]`` — the artifact a tokenizer ships. Stops early when the best
    remaining pair occurs fewer than ``min_pair_count`` times.

    Each round costs one aggregation over the word DICTIONARY (not the
    corpus) plus a TakeOrdered(1); the corpus is scanned exactly once
    up front. Ties break lexicographically, so the sequence is a pure
    function of the corpus."""
    words = bpe_word_counts(df, text_col, lowercase).withColumn(
        "syms", _symbols(F.col("word"))
    ).select("syms", "n")
    words = words.localCheckpoint(eager=True)
    merges: list[dict] = []
    pending = 0
    for rank in range(n_merges):
        pairs = words.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(
                        a.alias("left"), b.alias("right")
                    ),
                )
            ).alias("p"),
            F.col("n"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(
                F.col("c").desc(),
                F.col("p.left").asc(),
                F.col("p.right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        left, right = best[0]["p"]["left"], best[0]["p"]["right"]
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": int(best[0]["c"]),
            }
        )
        words = words.withColumn(
            "syms", _fold_pair(F.col("syms"), left, right)
        )
        # Checkpoint every 5th round, not every round: one materialize
        # job per merge was over half the loop's job count, and a plan
        # at most 5 folds deep re-evaluates cheaply against the
        # checkpointed dictionary (the folds are narrow codegen'd
        # array ops). Still O(1) depth over the whole run.
        pending += 1
        if pending == 5:
            words = words.localCheckpoint(eager=True)
            pending = 0
    return merges


def bpe_train_df(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_pair_count: int = 2,
) -> DataFrame:
    """:func:`bpe_train` as a relation (rank, left, right, merged,
    pair_count) for the query registry."""
    spark = df.sparkSession
    merges = bpe_train(df, text_col, n_merges, min_pair_count)
    schema = (
        "rank int, left string, right string, merged string, "
        "pair_count long"
    )
    return spark.createDataFrame(
        [
            (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
            for m in merges
        ],
        schema,
    )


def bpe_encode(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize with a learned merge table: per document, the BPE piece
    count and distinct-piece count — the training-data length signal a
    packing/budgeting pipeline needs. Replays the merges in rank order
    over each word's symbol array (the exact train-time fold), one
    scan, no UDF."""
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    words = F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: w != F.lit("")
    )
    out = df.select(id_col, F.explode(words).alias("word"))
    syms = _symbols(F.col("word"))
    for m in sorted(merges, key=lambda m: m["rank"]):
        syms = _fold_pair(syms, m["left"], m["right"])
    return (
        out.select(id_col, syms.alias("pieces"))
        .groupBy(id_col)
        .agg(
            F.sum(F.size("pieces")).alias("n_pieces"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("pieces")))
            ).alias("n_distinct_pieces"),
        )
    )
