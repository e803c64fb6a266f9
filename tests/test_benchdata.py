"""derive_scaled_dir: the bench's 10x scale-up must preserve relational
integrity (FK joins match exactly one copy) and payload-similarity
structure (within-copy preserved, cross-copy broken)."""

import os

from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.benchdata import derive_scaled_dir

SRC = "/root/testdata/sf0.001"


def test_derive_scales_counts_and_joins(spark, tmp_path):
    out = str(tmp_path / "sf3x")
    derive_scaled_dir(spark, SRC, out, factor=3)

    orders0 = spark.read.parquet(f"{SRC}/orders.parquet")
    orders3 = spark.read.parquet(f"{out}/orders.parquet")
    assert orders3.count() == 3 * orders0.count()

    # FK joins match exactly one copy: the joined cardinality scales by
    # the same factor, and no key ever matches across copies
    cust0 = spark.read.parquet(f"{SRC}/customer.parquet")
    cust3 = spark.read.parquet(f"{out}/customer.parquet")
    j0 = orders0.join(cust0, orders0.o_custkey == cust0.c_custkey).count()
    j3 = orders3.join(cust3, orders3.o_custkey == cust3.c_custkey).count()
    assert j3 == 3 * j0

    li3 = spark.read.parquet(f"{out}/lineitem.parquet")
    li0 = spark.read.parquet(f"{SRC}/lineitem.parquet")
    lj0 = li0.join(orders0, li0.l_orderkey == orders0.o_orderkey).count()
    lj3 = li3.join(orders3, li3.l_orderkey == orders3.o_orderkey).count()
    assert lj3 == 3 * lj0

    # fixed dims stay fixed; nationkeys still resolve
    nat = spark.read.parquet(f"{out}/nation.parquet")
    assert nat.count() == spark.read.parquet(f"{SRC}/nation.parquet").count()
    unresolved = (
        cust3.join(nat, cust3.c_nationkey == nat.n_nationkey, "left_anti").count()
    )
    assert unresolved == 0

    # second call is a cache hit (marker short-circuits before any write)
    mt = os.path.getmtime(f"{out}/orders.parquet")
    derive_scaled_dir(spark, SRC, out, factor=3)
    assert os.path.getmtime(f"{out}/orders.parquet") == mt


def test_derive_breaks_cross_copy_similarity(spark, tmp_path):
    out = str(tmp_path / "sf2x")
    derive_scaled_dir(spark, SRC, out, factor=2)
    docs = spark.read.parquet(f"{out}/documents.parquet")
    n0 = spark.read.parquet(f"{SRC}/documents.parquet").count()
    stride = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .agg(F.max("doc_id"))
        .first()[0]
        + 1
    )
    # the same doc in copy 0 vs copy 1: most tokens must differ-tag, so
    # 3-shingle jaccard collapses (no cross-copy near-dup cliques)
    a = docs.filter(F.col("doc_id") == 0).first()
    b = docs.filter(F.col("doc_id") == stride).first()
    ta, tb = a["text"].split(), b["text"].split()
    assert len(ta) == len(tb)
    sh = lambda t: {tuple(t[i : i + 3]) for i in range(len(t) - 2)}
    inter = len(sh(ta) & sh(tb))
    union = len(sh(ta) | sh(tb))
    assert inter / union < 0.5

    # embeddings: copy 1 is a dimension rotation — same norm, exact
    # within-copy cosine preservation is structural (orthogonal map)
    emb = spark.read.parquet(f"{out}/embeddings.parquet")
    estride = (
        spark.read.parquet(f"{SRC}/embeddings.parquet")
        .agg(F.max("vec_id"))
        .first()[0]
        + 1
    )
    va = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    vb = emb.filter(F.col("vec_id") == estride).first()["embedding"]
    assert sorted(va) == sorted(vb)  # permutation of the same values
    assert list(va) != list(vb)      # but not the identity
