"""Derived benchmark data: scale an existing testdata SF directory by an
integer factor with FK-consistent key shifting.

The driver ships sf0.001/0.01/0.1; the scale question ("which of the
heavy queries grow linearly vs superlinearly?") needs at least one run a
decade up. Rather than synthesizing a new generator (the brief says use
the driver's parquet as inputs), this derives sfN from sf0.1 by unioning
``factor`` key-shifted copies:

- every PK/FK column is shifted by ``copy * (max_key + 1)`` so joins
  match exactly one copy (join fan-out and group cardinalities scale
  linearly, like a real SF bump);
- ``documents.text`` gets a per-copy POSITIONAL token rewrite and
  ``embeddings.embedding`` a per-copy circular dimension shift: both
  transforms preserve WITHIN-copy similarity structure exactly (the same
  rewrite applies to every doc of a copy; a dimension permutation is
  orthogonal) while pushing cross-copy similarity below candidate
  thresholds — so near-dup candidate sets grow linearly like real data,
  instead of every payload forming a cross-copy 10-clique;
- dimension tables ``region``/``nation`` keep their fixed TPC-H size
  (they are constant in the real generator too), so nationkey FKs are
  left unshifted everywhere.

Output is written once to a cache dir and reused across bench runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

# table -> columns sharing that table's key space. Shifts must agree
# across tables (l_orderkey shifts by orders' stride), so strides are
# computed per key FAMILY, keyed by the owning table.
_FAMILIES = {
    "customer": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orders": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "supplier": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "events": [("events", "event_id")],
    "events_user": [("events", "user_id")],
    "documents": [("documents", "doc_id")],
    "embeddings": [("embeddings", "vec_id")],
}

_FAMILY_KEY = {
    "customer": ("customer", "c_custkey"),
    "orders": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supplier": ("supplier", "s_suppkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}

_SCALED = [
    "customer",
    "orders",
    "lineitem",
    "part",
    "supplier",
    "events",
    "documents",
    "embeddings",
]
_FIXED = ["region", "nation"]


def derive_scaled_dir(
    spark: SparkSession, src_dir: str, out_dir: str, factor: int = 10
) -> str:
    """Materialize ``factor``x key-shifted copies of ``src_dir`` into
    ``out_dir``. Skipped only when the existing ``_SUCCESS_DERIVE`` marker
    records the SAME factor and source — a marker from a different
    derivation must not short-circuit to stale data (it is validated, and
    a mismatch re-derives). Returns ``out_dir``."""
    marker = os.path.join(out_dir, "_SUCCESS_DERIVE_V3")
    stamp = f"factor={factor} src={src_dir}\n"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    # One tiny max() job per key family; strides are plain ints after.
    strides: dict[str, int] = {}
    for fam, (tbl, col) in _FAMILY_KEY.items():
        df = spark.read.parquet(os.path.join(src_dir, f"{tbl}.parquet"))
        strides[fam] = int(df.agg(F.max(col)).first()[0]) + 1

    shift_cols: dict[str, list[tuple[str, int]]] = {}
    for fam, members in _FAMILIES.items():
        for tbl, col in members:
            shift_cols.setdefault(tbl, []).append((col, strides[fam]))

    for tbl in _FIXED:
        spark.read.parquet(
            os.path.join(src_dir, f"{tbl}.parquet")
        ).write.mode("overwrite").parquet(os.path.join(out_dir, f"{tbl}.parquet"))

    # embedding width probed ONCE (not per copy in the loop below)
    emb_dim = len(
        spark.read.parquet(
            os.path.join(src_dir, "embeddings.parquet")
        ).first()["embedding"]
    )

    for tbl in _SCALED:
        base = spark.read.parquet(os.path.join(src_dir, f"{tbl}.parquet"))
        copies = []
        for i in range(factor):
            c = base
            for col, stride in shift_cols.get(tbl, []):
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * stride)).cast(base.schema[col].dataType)
                )
            if tbl == "documents" and i > 0:
                # Per-copy POSITIONAL token perturbation: every 4th token
                # (offset by copy index) gets a copy tag. Two docs in the
                # SAME copy receive the same positional rewrite, so
                # within-copy near-dup structure (what dedup queries
                # measure) is preserved and scales linearly; the SAME doc
                # across two copies loses ~60% of its 3-shingles, so
                # cross-copy jaccard falls below candidate thresholds —
                # a plain " suffix" tag changed only ONE shingle and made
                # every doc a 10-clique of near-dups (quadratic candidate
                # blowup real corpus growth does not have).
                toks = F.split(F.col("text"), r"\s+")
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            toks,
                            lambda x, pos: F.when(
                                (pos + F.lit(i)) % 4 == 0,
                                F.concat(x, F.lit(f"_c{i}")),
                            ).otherwise(x),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text"))
            if tbl == "embeddings" and i > 0:
                # Per-copy circular DIMENSION shift — an orthogonal
                # transform, so every within-copy cosine (what the ANN /
                # near-dup queries measure) is preserved EXACTLY while
                # cross-copy vectors decorrelate. An additive epsilon
                # (tried first) left copies of the same vector at
                # cosine ~0.99999: LSH bucket occupancy grew 10x and
                # candidate joins ~100x — a blowup real corpus growth
                # does not have.
                dim = emb_dim
                k = (i * 7) % dim or 1
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", k + 1, dim - k),
                        F.slice("embedding", 1, k),
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{tbl}.parquet"))

    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir
