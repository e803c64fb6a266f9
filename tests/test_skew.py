"""Skewed-key drill (r13, VERDICT item 7): constructed fixtures where
one key owns ~50% of the rows, pushed through the operators whose plans
could collapse under skew — LSH banding, matview refresh, bucketed
MERGE. Pins both CORRECTNESS (outputs match the unskewed-algorithm
answers) and the PLAN SHAPE that keeps the skew off a single straggler
(collapse bounds, map-side combine, bucket-bounded rewrites).
Companion evidence: PLANS.md 'Skewed-key drill'."""

import os

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators import dedup
from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog


def _skewed_docs(spark, n=400):
    """50% of the corpus is ONE text (the boilerplate-page shape); the
    rest are distinct, with a few true near-dup pairs among them."""
    hot = spark.range(n // 2).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the quick brown fox jumps over the lazy dog again and again"
        ).alias("text"),
    )
    # cold docs: id-dependent tokens (disjoint shingles between docs),
    # except ids with id%10<2, which pair up as genuine near-dups: a
    # long shared body per pair plus one differing suffix token
    pair_base = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"common{j}x"),
                (F.col("id") / 10).cast("int").cast("string"),
            )
            for j in range(20)
        ],
    )
    distinct_body = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"tok{j}n"),
                (F.col("id") * 100 + j).cast("string"),
            )
            for j in range(12)
        ],
    )
    cold = spark.range(n // 2, n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 < 2,
            F.concat(
                pair_base,
                F.lit(" suffix"),
                (F.col("id") % 10).cast("string"),
            ),
        )
        .otherwise(distinct_body)
        .alias("text"),
    )
    return hot.unionByName(cold)


def test_lsh_collapse_matches_full_pipeline_under_skew(spark):
    """The duplication-collapsed clustering returns EXACTLY the labels
    of the naive full-graph pipeline on a 50%-hot corpus."""
    docs = _skewed_docs(spark, 240).cache()
    naive = dedup.near_dup_clusters(
        docs, dedup.minhash_lsh_pairs(docs, threshold=0.8)
    )
    collapsed = dedup.near_dup_clusters_lsh(docs, threshold=0.8)
    a = {(r["doc_id"], r["cluster_id"], r["is_canonical"])
         for r in naive.collect()}
    b = {(r["doc_id"], r["cluster_id"], r["is_canonical"])
         for r in collapsed.collect()}
    assert a == b
    # the hot text is one cluster rooted at doc 0
    hot = [t for t in b if t[1] == 0]
    assert len(hot) == 120
    docs.unpersist()


def test_lsh_collapse_bounds_the_hot_bucket(spark):
    """Cost pin: banding and candidate volume scale with DISTINCT
    texts, not copies. With D copies of one text the naive candidate
    join emits >= C(D,2) pairs from the hot bucket alone; the collapsed
    path's candidate input drops to the distinct-text count."""
    docs = _skewed_docs(spark, 400)
    n_distinct = docs.select("text").distinct().count()
    # naive: the hot text's copies alone contribute C(200,2) candidates
    band = dedup.minhash_bands(docs)
    naive_hot = (
        band.groupBy("band_id", "band_hash")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert naive_hot >= 200  # one bucket holds every copy
    # collapsed: representatives only — hottest bucket is bounded by
    # near-identical DISTINCT texts, far below the copy count
    reps = docs.join(
        docs.select(F.md5("text").alias("_th"), "doc_id")
        .groupBy("_th")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    assert reps.count() == n_distinct
    rep_hot = (
        dedup.minhash_bands(reps)
        .groupBy("band_id", "band_hash")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert rep_hot <= 10  # a near-dup PAIR's bucket, never the copies
    # quadratic blowup avoided: worst-bucket pair work drops by >15x
    assert naive_hot * (naive_hot - 1) > 15 * rep_hot * (rep_hot - 1)


def test_matview_refresh_under_hot_group(spark, tmp_path):
    """A group owning 50% of the source rows: the refresh's signed
    partial aggregation map-side-combines the hot group (two
    HashAggregate stages in the plan), the delta stays one row per
    group, and the refreshed view equals a full recompute."""
    from gcp_datalake_pipeline_spark.operators.matview import (
        create_materialized_view,
        partial_aggregate,
        refresh_materialized_view,
    )

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    n = 40_000
    src = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 97)
        .alias("g"),
        F.col("id").alias("v"),
    )
    cat.overwrite(src, "s")
    create_materialized_view(cat, "mv", "s", ["g"], {"total": "v"})
    # map-side combine pin: partial + final HashAggregate, no single
    # reduce task absorbing the raw hot-group rows
    plan = partial_aggregate(
        cat.read("s"), ["g"], {"total": "v"}, "n_rows"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    # skewed increment: 20k more rows, all in the hot group
    cat.append(
        spark.range(n, n + 20_000).select(
            F.lit(0).cast("long").alias("g"), F.col("id").alias("v")
        ),
        "s",
    )
    out = refresh_materialized_view(cat, "mv")
    assert out["applied"] >= 1
    got = {r["g"]: (r["total"], r["n_rows"]) for r in cat.read("mv").collect()}
    want = {
        r["g"]: (r["total"], r["n_rows"])
        for r in cat.read("s")
        .groupBy("g")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n_rows"))
        .collect()
    }
    assert got == want


def test_bucketed_merge_hot_bucket_stays_bounded(spark, tmp_path):
    """A merge whose every source key hashes into ONE bucket re-stages
    only that bucket; the other buckets' files stay hardlink-identical
    (inode pin) — bucket skew in the WRITE never fans out to the
    table."""
    from gcp_datalake_pipeline_spark.storage import kb_col

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    base = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    cat.overwrite_bucketed(base, "t", 8, ["k"])

    def inodes():
        d = cat._data_dirs("t")[0]
        return {
            b: sorted(
                os.stat(os.path.join(d, b, f)).st_ino
                for f in os.listdir(os.path.join(d, b))
                if f.endswith(".parquet")
            )
            for b in os.listdir(d)
            if b.startswith("_kb=")
        }

    # keys 5000..25000 that hash into one chosen bucket — a hot-bucket
    # update wave (~1/8 of the candidate range)
    cand = spark.range(5_000, 25_000).select(F.col("id").alias("k"))
    hot_bucket = cand.select(
        kb_col(["k"], 8).alias("b")
    ).groupBy("b").count().orderBy(F.desc("count")).first()["b"]
    src = cand.where(kb_col(["k"], 8) == hot_bucket).select(
        "k", F.lit(-1).alias("v")
    )
    n_src = src.count()
    assert n_src > 1_000
    before = inodes()
    cat.merge_upsert_bucketed(src, "t", ["k"], 8, audit_cols=False)
    after = inodes()
    restaged = [b for b in before if after.get(b) != before[b]]
    assert restaged == [f"_kb={hot_bucket}"]
    assert cat.read("t").count() == 5_000 + n_src
