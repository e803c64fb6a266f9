"""Per-file Bloom-filter indexes (point-predicate file skipping).

Contract under test (the Delta bloom-filter-index analog):

- the pure-Python probe hash is BIT-IDENTICAL to Spark's ``xxhash64``
  for every indexable type family (property-tested) — a divergence
  would turn "skip this file" into a wrong answer, so this parity is
  the load-bearing invariant;
- on a high-cardinality key scattered across files (where every file's
  [min, max] spans the key space and min/max stats prune NOTHING), an
  ``=`` / ``IN`` predicate skips to just the files that can hold the
  literal — asserted via ``pruned_files`` AND ``inputFiles()``;
- pruning stays a superset guarantee: results always equal the
  unpruned read + filter; unsupported types / missing sidecars /
  dropped configs keep files;
- the sidecar is maintained by every write path (append, overwrite,
  bucketed merge, DML rewrite with hardlink-carried reuse), rides
  clones and RESTORE, and drops with the table.
"""

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gcp_datalake_pipeline_spark import blooms, filestats
from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _scattered(spark, n=4000, files=8):
    """ids interleaved across files so every file's [min, max] range
    spans the whole key space — min/max stats are useless by
    construction and only the bloom can prune."""
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("doc-"), F.col("id")).alias("doc"),
            (F.col("id") % 7).alias("grp"),
        )
        .repartition(files)
    )


def _input_files(df):
    return {os.path.realpath(p.replace("file:", "")) for p in df.inputFiles()}


# -- hash parity: the load-bearing invariant ----------------------------------


def test_xxh64_matches_spark_reference_vectors(spark):
    """Pin the probe hash against values computed by F.xxhash64 in this
    very session — longs (8-byte path), ints (4-byte path), strings
    (byte path incl. empty/unicode/32+ byte stripes)."""
    from pyspark.sql import functions as F, types as T

    cases = [
        ("long", T.LongType(), [0, 1, -1, 42, 2**62, -(2**63), 2**63 - 1]),
        ("int", T.IntegerType(), [0, 1, -1, 42, 2**31 - 1, -(2**31)]),
        ("int", T.ShortType(), [0, 7, -7, 32767, -32768]),
        ("int", T.ByteType(), [0, 1, -1, 127, -128]),
        (
            "string",
            T.StringType(),
            ["", "a", "O'Brien", "ñandú \U0001f9a4", "x" * 100],
        ),
    ]
    for fam, dtype, values in cases:
        df = spark.createDataFrame(
            [(v,) for v in values],
            T.StructType([T.StructField("v", dtype)]),
        )
        got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
        exp = [blooms.spark_hash(v, fam) for v in values]
        exp = [e - (1 << 64) if e >= (1 << 63) else e for e in exp]
        assert got == exp, (fam, dtype.simpleString())


@given(
    st.one_of(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.text(max_size=80),
    )
)
@settings(max_examples=60, deadline=None)
def test_xxh64_property_long_and_string(value):
    """Pure-Python invariants that don't need a JVM: determinism, and
    the long path equals the generic byte path over the 8-byte LE
    encoding (the identity Spark's hashLong specialization relies on)."""
    if isinstance(value, int):
        h = blooms.spark_hash(value, "long")
        assert h == blooms.xxh64(value.to_bytes(8, "little", signed=True))
    else:
        h = blooms.spark_hash(value, "string")
        assert h == blooms.xxh64(value.encode("utf-8"))
    assert 0 <= h < 2**64


def test_spark_hash_rejects_unrepresentable():
    assert blooms.spark_hash(2**40, "int") is None  # doesn't fit int32
    assert blooms.spark_hash("x", "long") is None
    assert blooms.spark_hash(None, "string") is None
    assert blooms.spark_hash(True, "long") is None  # bool is not a key
    assert blooms.spark_hash(1.5, "long") is None


# -- pruning on scattered keys ------------------------------------------------


def test_point_lookup_prunes_where_minmax_cannot(spark, tcat):
    tcat.overwrite(_scattered(spark), "users")
    # min/max alone: every file survives (interleaved ranges)
    kept_before, total = tcat.pruned_files("users", [("k", "=", 1234)])
    assert total == 8 and len(kept_before) == 8
    tcat.set_bloom_index("users", ["k", "doc"])
    kept, total = tcat.pruned_files("users", [("k", "=", 1234)])
    assert total == 8
    assert len(kept) < 8  # the bloom pruned what min/max could not
    # ... and the kept set includes the file that truly holds the row
    df = tcat.read("users", predicates=[("k", "=", 1234)])
    assert df.count() == 1
    assert _input_files(df) <= {os.path.realpath(p) for p in kept}
    # string column blooms prune too
    kept_s, _ = tcat.pruned_files("users", [("doc", "=", "doc-777")])
    assert len(kept_s) < 8
    assert tcat.read(
        "users", predicates=[("doc", "=", "doc-777")]
    ).count() == 1


def test_absent_value_prunes_all_files_and_zero_io_count(spark, tcat):
    tcat.overwrite(_scattered(spark), "users")
    tcat.set_bloom_index("users", ["k"])
    kept, _ = tcat.pruned_files("users", [("k", "=", 999_999)])
    assert kept == []
    # count with an absent key must touch zero data files: pin by
    # nulling the Spark handle (the established zero-I/O pin)
    tcat.spark = None
    try:
        assert tcat.count_rows("users", [("k", "=", 999_999)]) == 0
    finally:
        tcat.spark = spark


def test_in_predicate_unions_bloom_survivors(spark, tcat):
    tcat.overwrite(_scattered(spark), "users")
    tcat.set_bloom_index("users", ["k"])
    kept, _ = tcat.pruned_files("users", [("k", "in", [5, 3999])])
    assert 0 < len(kept) < 8
    assert tcat.read(
        "users", predicates=[("k", "in", [5, 3999])]
    ).count() == 2
    # an IN of only-absent values prunes everything
    kept2, _ = tcat.pruned_files("users", [("k", "in", [888_888, 777_777])])
    assert kept2 == []


def test_results_identical_to_unpruned(spark, tcat):
    """Superset guarantee: for a battery of point predicates the pruned
    read equals the full-scan filter, present or absent, int or string."""
    tcat.overwrite(_scattered(spark, n=500, files=5), "users")
    tcat.set_bloom_index("users", ["k", "doc"])
    full = tcat.read("users")
    for preds in (
        [("k", "=", 123)],
        [("k", "=", -5)],
        [("doc", "=", "doc-499")],
        [("doc", "=", "nope")],
        [("k", "in", [1, 2, 400])],
        [[("k", "=", 7)], [("doc", "=", "doc-9")]],  # DNF
    ):
        pruned = tcat.read("users", predicates=preds)
        dnf = preds if isinstance(preds[0], list) else [preds]
        expected = full.filter(filestats.dnf_condition(dnf))
        assert sorted(pruned.collect()) == sorted(expected.collect())


def test_range_predicates_unaffected_by_bloom(spark, tcat):
    tcat.overwrite(_scattered(spark, n=500, files=5), "users")
    tcat.set_bloom_index("users", ["k"])
    # < and != never consult the bloom (it can only prove equality
    # absence); behavior must equal the stats-only path
    assert tcat.read("users", predicates=[("k", "<", 10)]).count() == 10
    assert tcat.count_rows("users", [("k", "!=", 3)]) == 499


# -- conservatism -------------------------------------------------------------


def test_unsupported_types_refused_at_config_time(spark, tcat):
    from pyspark.sql import functions as F

    df = spark.range(5).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("ts"),
        (F.col("id") * 1.5).alias("x"),
    )
    tcat.overwrite(df, "t")
    with pytest.raises(ValueError, match="bloom-indexable"):
        tcat.set_bloom_index("t", ["ts"])
    with pytest.raises(ValueError, match="bloom-indexable"):
        tcat.set_bloom_index("t", ["x"])
    with pytest.raises(ValueError, match="not in"):
        tcat.set_bloom_index("t", ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        tcat.set_bloom_index("t", [])
    with pytest.raises(FileNotFoundError):
        tcat.set_bloom_index("missing", ["k"])


def test_corrupt_sidecar_keeps_files(spark, tcat):
    tcat.overwrite(_scattered(spark, n=200, files=4), "users")
    tcat.set_bloom_index("users", ["k"])
    (d,) = tcat._data_dirs("users")
    path = os.path.join(d, blooms.BLOOM_FILE)
    payload = json.load(open(path))
    for fe in payload["files"].values():
        fe["k"]["b"] = "AA=="  # bitmap truncated to one byte
    json.dump(payload, open(path, "w"))
    # probe positions now fall outside the bitmap -> IndexError inside
    # might_contain -> conservative keep, results still exact
    assert tcat.read("users", predicates=[("k", "=", 55)]).count() == 1


def test_type_mismatched_probe_keeps_files(spark, tcat):
    tcat.overwrite(_scattered(spark, n=100, files=2), "users")
    tcat.set_bloom_index("users", ["k"])
    # a string literal against the long column: hash family refuses,
    # file kept, Spark's residual filter decides (zero matches)
    kept, total = tcat.pruned_files("users", [("k", "=", "55")])
    assert len(kept) == total == 2


# -- maintenance across write paths -------------------------------------------


def _bloom_covered(tcat, table):
    """(files_with_bloom, total_files) across the table's dirs."""
    have = total = 0
    for d in tcat._data_dirs(table):
        files = tcat._dir_parquet_files(d)
        total += len(files)
        entries = (blooms.read_dir_blooms(d) or {}).get("files", {})
        have += sum(1 for f in files if f in entries)
    return have, total


def test_append_and_compact_maintain_index(spark, tcat):
    tcat.overwrite(_scattered(spark, n=300, files=3), "users")
    tcat.set_bloom_index("users", ["k"])
    tcat.append(_scattered(spark, n=300, files=2), "users")
    have, total = _bloom_covered(tcat, "users")
    assert have == total == 5
    assert tcat.compact("users", min_dirs=2)
    have, total = _bloom_covered(tcat, "users")
    assert have == total > 0
    assert tcat.count_rows("users", [("k", "=", 11)]) == 2


def test_dml_rewrite_reuses_carried_bloom_entries(spark, tcat):
    """A point DELETE rewrites candidate files; hardlink-carried files
    must keep their bloom entries WITHOUT a rebuild (entries copied
    verbatim), and the transient attach annotation must never leak
    into the stats sidecar."""
    tcat.overwrite(_scattered(spark, n=4000, files=8), "users")
    tcat.set_bloom_index("users", ["k"])
    kept, _ = tcat.pruned_files("users", [("k", "=", 1234)])
    n_cand = len(kept)
    assert n_cand < 8
    assert tcat.delete_where("users", [("k", "=", 1234)]) == 1
    # skipping selectivity survives the rewrite
    kept_after, total_after = tcat.pruned_files("users", [("k", "=", 2000)])
    assert total_after == 8 and len(kept_after) < 8
    have, total = _bloom_covered(tcat, "users")
    assert have == total == 8
    # stats sidecar stays bloom-free (the attach annotation is transient)
    (d,) = tcat._data_dirs("users")
    stats = filestats.read_dir_stats(d)
    assert all("bloom" not in e for e in stats["files"].values())
    assert tcat.count_rows("users", [("k", "=", 1234)]) == 0
    assert tcat.count_rows("users") == 3999


def test_bucketed_merge_carries_bloom_entries(spark, tcat):
    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.operators.corpus import (
        dedup_ingest_batch,
    )

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("unique text "), F.col("id")).alias("text"),
        )

    dedup_ingest_batch(tcat, batch(0, 200), docs_table="docs", num_buckets=4)
    tcat.set_bloom_index("docs", ["doc_id"])
    before, total_before = _bloom_covered(tcat, "docs")
    assert before == total_before > 0
    dedup_ingest_batch(
        tcat, batch(200, 260), docs_table="docs", num_buckets=4
    )
    have, total = _bloom_covered(tcat, "docs")
    assert have == total > 0
    assert tcat.count_rows("docs", [("doc_id", "=", 42)]) == 1


# -- lifecycle ----------------------------------------------------------------


def test_drop_bloom_index(spark, tcat):
    from pyspark.sql import functions as F

    # even ids only: an odd probe is INSIDE every file's [min, max]
    # (min/max keeps all files) but absent (the bloom proves it)
    evens = (
        spark.range(100)
        .select((F.col("id") * 2).alias("k"))
        .repartition(2)
    )
    tcat.overwrite(evens, "users")
    tcat.set_bloom_index("users", ["k"])
    kept, total = tcat.pruned_files("users", [("k", "=", 51)])
    assert kept == [] and total == 2
    tcat.drop_bloom_index("users")
    assert tcat.bloom_index("users") is None
    have, _ = _bloom_covered(tcat, "users")
    assert have == 0  # sidecars removed with the config
    kept, total = tcat.pruned_files("users", [("k", "=", 51)])
    assert len(kept) == total == 2  # back to min/max-only behavior
    with pytest.raises(KeyError):
        tcat.drop_bloom_index("users")


def test_config_rides_clone_and_restore_and_drop(spark, tcat, tmp_path):
    tcat.overwrite(_scattered(spark, n=100, files=2), "users")
    tcat.set_bloom_index("users", ["k"])
    v_indexed = tcat.versions()[-1]["version"]
    clone = tcat.clone_to(str(tmp_path / "branch"))
    assert clone.bloom_index("users") == tcat.bloom_index("users")
    kept, total = clone.pruned_files("users", [("k", "=", 999_999)])
    assert kept == []  # sidecars rode the hardlinked dirs
    # drop, then whole-catalog restore resurrects the config
    tcat.drop_bloom_index("users")
    assert tcat.bloom_index("users") is None
    tcat.restore(v_indexed)
    assert tcat.bloom_index("users") is not None
    # per-table restore carries it too
    tcat.drop_bloom_index("users")
    tcat.restore_table("users", v_indexed)
    assert tcat.bloom_index("users") is not None
    # DROP TABLE clears the config
    tcat.drop_table("users")
    assert tcat.bloom_index("users") is None


def test_sql_facade_routes_bloom_ddl(spark, tcat):
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml

    tcat.overwrite(_scattered(spark, n=100, files=2), "users")
    out = execute_dml(
        tcat,
        "CREATE BLOOMFILTER INDEX ON TABLE users FOR COLUMNS (k, doc) "
        "OPTIONS (bits_per_row = 12)",
    )
    assert out == {"table": "users", "bloom_index": ["k", "doc"]}
    cfg = tcat.bloom_index("users")
    assert cfg["bits_per_row"] == 12
    assert cfg["columns"] == {"k": "long", "doc": "string"}
    out = execute_dml(tcat, "DROP BLOOMFILTER INDEX ON TABLE users")
    assert out == {"table": "users", "dropped_bloom_index": True}
    with pytest.raises(ValueError, match="BLOOMFILTER"):
        execute_dml(tcat, "CREATE BLOOMFILTER INDEX users (k)")


def test_probe_wraps_bit_arithmetic_like_the_build(monkeypatch):
    """The build computes bit positions in numpy uint64 (wraps mod 2^64);
    the probe must wrap identically. For hashes near 2^64 an unwrapped
    Python-int sum lands on DIFFERENT bits and a present value would be
    'proven' absent — a wrongly skipped file (r10 self-review #1)."""
    import base64 as b64

    import numpy as np

    for h in (
        0xFFFFFFFFFFFFFFFF,
        0xFFFFFFFED82C07CD,  # the simulated divergence case
        0xFFFFFFFF00000001,
        0x8000000000000000,
        12345,
    ):
        m, k = blooms._sizing(100, 10)
        bits = bytearray(m // 8)
        for arr in blooms._positions_np(
            np.array([h], dtype=np.uint64), m, k
        ):
            pos = int(arr[0])
            bits[pos >> 3] |= 1 << (pos & 7)
        entry = {
            "m": m,
            "k": k,
            "b": b64.b64encode(bytes(bits)).decode("ascii"),
        }
        monkeypatch.setattr(blooms, "spark_hash", lambda v, t, _h=h: _h)
        assert blooms.might_contain(entry, "x", "string"), hex(h)


def test_build_reads_only_files_needing_new_bitmaps(spark, tmp_path):
    """Hardlink-carried files reuse their prior bloom entries; the build
    job must not even OPEN them, or a 1-file DML rewrite pays a full
    table hash pass (r10 self-review #4). Pinned by corrupting the
    carried file: a whole-dir scan would crash on it."""
    from pyspark.sql import functions as F

    d = tmp_path / "staged"
    (
        spark.range(100)
        .select(F.col("id").alias("k"))
        .coalesce(2)
        .write.parquet(str(d))
    )
    stats = filestats.collect_dir_stats(str(d))
    rels = sorted(stats["files"])
    assert len(rels) == 2
    carried, fresh = rels[0], rels[1]
    # clobber the carried file with non-parquet bytes
    with open(d / carried, "wb") as f:
        f.write(b"not parquet at all")
    fake = {"k": {"t": "long", "m": 64, "k": 1, "b": "AAAAAAAAAAA="}}
    blooms.build_dir_blooms(
        spark,
        str(d),
        {"k": "long"},
        stats,
        reuse={carried: fake},
    )
    side = blooms.read_dir_blooms(str(d))
    assert side["files"][carried] == fake
    # the fresh file got a real bitmap that answers membership
    fe = side["files"][fresh]["k"]
    vals = {
        r["k"]
        for r in spark.read.parquet(str(d / fresh)).collect()
    }
    probe = next(iter(vals))
    assert blooms.might_contain(fe, int(probe), "long")


def test_bloom_backfill_refuses_over_driver_budget(spark, tmp_path):
    """set_bloom_index's max_bitmap_bytes bounds the driver-side merge
    footprint (~rows x bits_per_row/8 x n_cols per dir): an over-budget
    backfill refuses loudly BEFORE publishing config or touching any
    sidecar; an explicit bigger budget (or fewer bits) proceeds; and a
    later oversized staged write skips its build instead of merging."""
    import os

    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark import blooms as B

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(4000).select(F.col("id").alias("k"))
    cat.overwrite(df.repartition(2), "t")
    v = cat._read_manifest(strict=False)["version"]
    # 4000 rows x 10 bits / 8 = ~5000 bytes -> a 1KB budget refuses
    with pytest.raises(ValueError, match="over the .* budget"):
        cat.set_bloom_index("t", ["k"], max_bitmap_bytes=1024)
    assert cat.bloom_index("t") is None  # nothing published
    assert cat._read_manifest(strict=False)["version"] == v
    for d in cat._data_dirs("t"):
        assert not os.path.exists(os.path.join(d, B.BLOOM_FILE))
    # an explicit budget proceeds and records the cap
    cat.set_bloom_index("t", ["k"], max_bitmap_bytes=10_000_000)
    assert cat.bloom_index("t")["max_bitmap_bytes"] == 10_000_000
    kept, _ = cat.pruned_files("t", [("k", "=", -5)])
    assert kept == []  # the index actually prunes
    # an oversized LATER write skips its bloom build (best-effort),
    # never pressures the driver: shrink the cap, append, no sidecar
    def shrink(m):
        m["blooms"]["t"]["max_bitmap_bytes"] = 64

    cat._publish_meta(shrink, "shrink-cap")
    cat.append(spark.range(4000, 8000).select(F.col("id").alias("k")), "t")
    new_dir = cat._data_dirs("t")[-1]
    assert not os.path.exists(os.path.join(new_dir, B.BLOOM_FILE))
    # reads stay correct: the un-bloomed dir's files are simply kept
    assert cat.read("t", predicates=[("k", "=", 4321)]).count() == 1
