"""File-level min/max stats + data-skipping reads (filestats wiring).

Contract under test (the Delta/Iceberg data-skipping analog over the
plain-parquet TransactionalCatalog):

- every staged dir gets a ``_file_stats.json`` sidecar at write time;
- ``read(table, predicates=[...])`` hands Spark ONLY the files whose
  stats can match (asserted BOTH via ``pruned_files`` and via the plan's
  actual input file set, ``df.inputFiles()``);
- results are always identical to an unpruned read + the same filter
  (pruning is a superset guarantee);
- conservative cases (missing sidecar, type-mismatched predicate,
  unknown column, all-null files) keep files;
- stats survive compaction, clone, and time travel, and hardlink-carried
  MERGE partitions reuse their entries without re-reading footers.
"""

import json
import os
import shutil

import pytest

from gcp_datalake_pipeline_spark import filestats
from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog


@pytest.fixture()
def tcat(spark, tmp_path):
    return TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _append_range(tcat, lo, hi, tag):
    """One staged dir covering k in [lo, hi)."""
    rows = [(k, f"{tag}-{k}") for k in range(lo, hi)]
    with tcat.transaction(f"load-{tag}"):
        tcat.append(_df(tcat.spark, rows).coalesce(1), "t")


def _input_files(df):
    return {os.path.realpath(p.replace("file:", "")) for p in df.inputFiles()}


# -- sidecar collection -------------------------------------------------------


def test_stats_sidecar_written_per_staged_dir(spark, tcat):
    _append_range(tcat, 0, 10, "a")
    dirs = tcat._data_dirs("t")
    assert len(dirs) == 1
    stats = filestats.read_dir_stats(dirs[0])
    assert stats is not None and stats["files"]
    (entry,) = stats["files"].values()
    assert entry["rows"] == 10
    ks = entry["columns"]["k"]
    assert filestats._decode_value(ks["min"]) == 0
    assert filestats._decode_value(ks["max"]) == 9
    assert ks["nulls"] == 0


def test_collect_stats_false_disables_sidecar(spark, tmp_path):
    cat = TransactionalCatalog(
        spark=spark, root=str(tmp_path / "lake"), collect_stats=False
    )
    with cat.transaction("l"):
        cat.append(_df(spark, [(1, "x")]), "t")
    assert filestats.read_dir_stats(cat._data_dirs("t")[0]) is None
    # reads (pruned or not) still work: missing sidecar = keep everything
    assert cat.read("t", predicates=[("k", "=", 1)]).count() == 1


# -- pruned reads: IO contract + value equivalence ----------------------------


def test_selective_read_opens_only_matching_files(spark, tcat):
    # three appends = three staged dirs with disjoint k ranges
    _append_range(tcat, 0, 100, "a")
    _append_range(tcat, 100, 200, "b")
    _append_range(tcat, 200, 300, "c")
    preds = [("k", ">=", 120), ("k", "<", 180)]
    kept, total = tcat.pruned_files("t", preds)
    assert total == 3 and len(kept) == 1  # only the middle dir's file
    df = tcat.read("t", predicates=preds)
    # plan contract: the scan's ACTUAL input files are exactly the
    # pruned survivors — Spark never touches the other dirs
    assert _input_files(df) == {os.path.realpath(p) for p in kept}
    # value contract: identical to unpruned read + same filter
    expect = (
        tcat.read("t").where("k >= 120 and k < 180").orderBy("k").collect()
    )
    assert df.orderBy("k").collect() == expect
    assert df.count() == 60


def test_all_files_pruned_yields_empty_with_schema(spark, tcat):
    _append_range(tcat, 0, 10, "a")
    df = tcat.read("t", predicates=[("k", ">", 1000)])
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]
    assert df.inputFiles() == []


def test_point_lookup_with_in_and_string_predicates(spark, tcat):
    _append_range(tcat, 0, 50, "a")
    _append_range(tcat, 50, 100, "b")
    kept, total = tcat.pruned_files("t", [("k", "in", [7, 9])])
    assert total == 2 and len(kept) == 1
    df = tcat.read("t", predicates=[("k", "in", [7, 9])])
    assert {r["k"] for r in df.collect()} == {7, 9}
    # string min/max prune too: tags sort disjointly ("a-..." < "b-...")
    kept_s, _ = tcat.pruned_files("t", [("v", ">=", "b")])
    assert len(kept_s) == 1
    assert tcat.read("t", predicates=[("v", ">=", "b")]).count() == 50


def test_residual_filter_still_exact_within_kept_files(spark, tcat):
    # pruning keeps whole files; the row-level answer must still be exact
    _append_range(tcat, 0, 100, "a")
    df = tcat.read("t", predicates=[("k", "=", 42)])
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["k"] == 42


# -- conservative keeps -------------------------------------------------------


def test_conservative_cases_keep_files(spark, tcat):
    _append_range(tcat, 0, 10, "a")
    d = tcat._data_dirs("t")[0]
    # unknown column: kept
    kept, total = tcat.pruned_files("t", [("nope", "=", 1)])
    assert len(kept) == total
    # type mismatch (string predicate on long column): kept
    kept, _ = tcat.pruned_files("t", [("k", "=", "x")])
    assert len(kept) == total
    # sidecar deleted (legacy/external writer): kept
    os.remove(os.path.join(d, filestats.STATS_FILE))
    kept, _ = tcat.pruned_files("t", [("k", ">", 1000)])
    assert len(kept) == total
    assert tcat.read("t", predicates=[("k", "=", 3)]).count() == 1
    # corrupt sidecar: kept (never an error)
    with open(os.path.join(d, filestats.STATS_FILE), "w") as f:
        f.write("{not json")
    kept, _ = tcat.pruned_files("t", [("k", ">", 1000)])
    assert len(kept) == total


def test_all_null_and_null_predicates(spark, tcat):
    with tcat.transaction("l1"):
        tcat.append(
            _df(spark, [(None, "x"), (None, "y")]).coalesce(1), "t"
        )
    with tcat.transaction("l2"):
        tcat.append(_df(spark, [(5, "z")]).coalesce(1), "t")
    # comparison can never match an all-null file: it is droppable
    kept, total = tcat.pruned_files("t", [("k", "=", 5)])
    assert total == 2 and len(kept) == 1
    # is_null keeps only the file with nulls; not_null drops the all-null
    kept_n, _ = tcat.pruned_files("t", [("k", "is_null")])
    assert len(kept_n) == 1
    assert tcat.read("t", predicates=[("k", "is_null")]).count() == 2
    kept_nn, _ = tcat.pruned_files("t", [("k", "not_null")])
    assert len(kept_nn) == 1
    assert tcat.read("t", predicates=[("k", "not_null")]).count() == 1


def test_malformed_predicates_rejected(spark, tcat):
    _append_range(tcat, 0, 5, "a")
    with pytest.raises(ValueError, match="unsupported predicate op"):
        tcat.read("t", predicates=[("k", "like", "1%")])
    with pytest.raises(ValueError, match="needs a list"):
        tcat.read("t", predicates=[("k", "in", 5)])
    with pytest.raises(ValueError, match="takes no value"):
        tcat.read("t", predicates=[("k", "is_null", 1)])


# -- partition columns --------------------------------------------------------


def test_hive_partition_values_prune(spark, tcat):
    df = spark.createDataFrame(
        [(k, k % 4, f"r{k}") for k in range(40)], "k long, p int, v string"
    )
    with tcat.transaction("l"):
        tcat.overwrite(df.repartition(4), "pt", partition_cols=["p"])
    kept, total = tcat.pruned_files("pt", [("p", "=", 2)])
    assert kept and len(kept) < total
    assert all("p=2" in p for p in kept)
    out = tcat.read("pt", predicates=[("p", "=", 2)])
    assert _input_files(out) == {os.path.realpath(p) for p in kept}
    # partition column survives the file-list read (basePath)
    assert {r["p"] for r in out.collect()} == {2}
    assert out.count() == 10


# -- lifecycle: compact / clone / time travel / merge reuse -------------------


def test_stats_survive_compaction_and_clustering_sharpens_them(spark, tcat):
    for i, tag in enumerate("abcd"):
        _append_range(tcat, i * 25, (i + 1) * 25, tag)
    assert tcat.compact("t", target_file_bytes=1, cluster_by=["k"])
    dirs = tcat._data_dirs("t")
    assert len(dirs) == 1
    assert filestats.read_dir_stats(dirs[0]) is not None
    # clustered rewrite keeps ranges disjoint: a point lookup opens 1 file
    kept, total = tcat.pruned_files("t", [("k", "=", 60)])
    assert total > 1 and len(kept) == 1
    assert tcat.read("t", predicates=[("k", "=", 60)]).count() == 1


def test_stats_ride_clone_and_time_travel(spark, tcat, tmp_path):
    _append_range(tcat, 0, 50, "a")
    v1 = tcat._read_manifest()["version"]
    _append_range(tcat, 50, 100, "b")
    # clone: sidecars hardlink along with the data
    dst = tcat.clone_to(str(tmp_path / "branch"))
    kept, total = dst.pruned_files("t", [("k", ">=", 50)])
    assert total == 2 and len(kept) == 1
    assert dst.read("t", predicates=[("k", ">=", 50)]).count() == 50
    # time travel: the v1 snapshot prunes against its own (immutable) dirs
    kept1, total1 = tcat.pruned_files("t", [("k", ">=", 50)], version=v1)
    assert total1 == 1 and kept1 == []
    assert tcat.read_at("t", v1, predicates=[("k", ">=", 50)]).count() == 0
    assert tcat.read_at("t", v1, predicates=[("k", "<", 10)]).count() == 10


def test_bucketed_merge_reuses_linked_partition_stats(spark, tcat):
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(64)], "k long, v string"
    )
    with tcat.transaction("seed"):
        tcat.merge_upsert_bucketed(
            df, "bt", key_cols=["k"], num_buckets=8
        )
    dirs0 = tcat._data_dirs("bt")
    stats0 = filestats.read_dir_stats(dirs0[0])
    assert stats0 and any("_kb=" in r for r in stats0["files"])
    # second merge touches ONE key: untouched _kb partitions hardlink in
    # and must NOT be re-footer-read — spy on ParquetFile
    import pyarrow.parquet as pq

    opened = []
    real_pf = pq.ParquetFile

    def spy(path, *a, **kw):
        opened.append(str(path))
        return real_pf(path, *a, **kw)

    import unittest.mock as mock

    with mock.patch.object(pq, "ParquetFile", side_effect=spy):
        with tcat.transaction("merge2"):
            tcat.merge_upsert_bucketed(
                _df(spark, [(3, "CHANGED")]), "bt",
                key_cols=["k"], num_buckets=8,
            )
    dirs1 = tcat._data_dirs("bt")
    stats1 = filestats.read_dir_stats(dirs1[0])
    # all partitions have stats in the new version...
    parts1 = {r.split(os.sep)[0] for r in stats1["files"]}
    assert len(parts1) == 8
    # ...but only the touched partition's files had their footers read
    touched = {p for p in opened if f"{os.sep}bt." in p}
    assert touched, "rewritten partition must be footer-read"
    from pyspark.sql import functions as F

    kb3 = (
        df.withColumn("_kb", F.pmod(F.xxhash64("k"), F.lit(8)))
        .where("k = 3").collect()[0]["_kb"]
    )
    assert all(f"_kb={kb3}" in p for p in touched)
    # and the merged table still answers pruned point lookups correctly
    assert tcat.read(
        "bt", predicates=[("_kb", "=", int(kb3))]
    ).where("k = 3").collect()[0]["v"] == "CHANGED"


def test_vacuum_reclaims_sidecar_with_dir(spark, tcat):
    _append_range(tcat, 0, 10, "a")
    old = tcat._data_dirs("t")[0]
    with tcat.transaction("rewrite"):
        tcat.overwrite(_df(spark, [(1, "x")]), "t")
    tcat.vacuum(retain_versions=1, min_age_seconds=0.0)
    assert not os.path.exists(old)


# -- pure pruning-logic edges -------------------------------------------------


def test_prune_logic_boundaries():
    entry = {
        "rows": 10,
        "columns": {
            "k": {
                "min": {"t": "num", "v": 10},
                "max": {"t": "num", "v": 20},
                "nulls": 0,
            }
        },
    }
    s = lambda op, v: filestats._file_survives(entry, "k", op, v)
    assert s("=", 10) and s("=", 20) and not s("=", 9) and not s("=", 21)
    assert not s("<", 10) and s("<", 11)
    assert s("<=", 10) and not s("<=", 9)
    assert not s(">", 20) and s(">", 19)
    assert s(">=", 20) and not s(">=", 21)
    assert s("in", [1, 15]) and not s("in", [1, 2, 30])
    assert not s("is_null", None) and s("not_null", None)


# -- metadata-only COUNT ------------------------------------------------------


def test_count_rows_exact_and_metadata_only(spark, tmp_path):
    """count_rows equals the Spark count for bare, provable, partial,
    and impossible predicates — and a bare count on a stats-complete
    table runs with ZERO data I/O (pinned by nulling the Spark
    handle)."""
    import datetime

    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("k"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    for s in range(5):  # k-striped files: tight stats on k, wide on id
        cat.append(df.where(F.col("k") % 5 == s).coalesce(1), "t")

    def want(cond=None):
        out = cat.read("t")
        return (out.filter(cond) if cond is not None else out).count()

    assert cat.count_rows("t") == want()
    # provable per-file: k's per-file value sets decide files fully or
    # not at all only for =; ranges are partial -> mixed classification
    assert cat.count_rows("t", [("k", "=", 3)]) == want(F.col("k") == 3)
    assert cat.count_rows("t", [("k", "<=", 4)]) == want(F.col("k") <= 4)
    assert cat.count_rows("t", [("id", ">", 500)]) == want(F.col("id") > 500)
    assert cat.count_rows("t", [("v", "is_null")]) == want(F.col("v").isNull())
    assert cat.count_rows("t", [("v", "not_null")]) == want(
        F.col("v").isNotNull()
    )
    assert cat.count_rows("t", [("k", "=", 99)]) == 0
    assert (
        cat.count_rows("t", [("k", "=", 3), ("id", "<", 100)])
        == want((F.col("k") == 3) & (F.col("id") < 100))
    )

    # bare count = pure metadata: no Spark needed at all
    held = cat.spark
    try:
        cat.spark = None
        n = cat.count_rows("t")
    finally:
        cat.spark = held
    assert n == want()
    # an impossible predicate is also metadata-only
    try:
        cat.spark = None
        z = cat.count_rows("t", [("id", "<", -1)])
    finally:
        cat.spark = held
    assert z == 0


def test_count_rows_timestamp_and_partition_stats(spark, tmp_path):
    """Timestamp predicates count from stats; hive partition tokens
    prove all-match for equality on the partition column."""
    import datetime

    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    orders = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .withColumn("y", F.year("o_orderdate"))
    )
    cat.overwrite(orders, "t", partition_cols=["y"])
    cut = datetime.datetime(1996, 1, 1)
    assert cat.count_rows("t", [("o_orderdate", ">=", cut)]) == (
        orders.filter(F.col("o_orderdate") >= cut).count()
    )
    want_1996 = orders.filter(F.col("y") == 1996).count()
    held = cat.spark
    try:
        cat.spark = None  # partition tokens alone must decide y = 1996
        got = cat.count_rows("t", [("y", "=", 1996)])
    finally:
        cat.spark = held
    assert got == want_1996


def test_min_max_metadata_only(spark, tmp_path):
    """min_max equals Spark's MIN/MAX for numeric, null-bearing, and
    timestamp columns — and runs with zero data I/O on a
    stats-complete table (Spark handle nulled); partition-token stats
    fall back to a scan (lexicographic order may lie for numbers)."""
    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(500).select(
        F.col("id"),
        F.when(F.col("id") % 9 == 0, None)
        .otherwise((F.col("id") * 3 - 700).cast("double"))
        .alias("v"),
        F.to_timestamp(
            F.concat(F.lit("1995-01-"), (F.col("id") % 28 + 1).cast("string"))
        ).alias("ts"),
    )
    for s in range(4):
        cat.append(df.where(F.col("id") % 4 == s).coalesce(1), "t")

    def want(col):
        r = cat.read("t").agg(F.min(col), F.max(col)).first()
        return r[0], r[1]

    held = cat.spark
    try:
        cat.spark = None  # metadata-only for stats-bearing columns
        got_v = cat.min_max("t", "v")
        # TIMESTAMP (LTZ) writes as TIMESTAMP_MICROS under the engine
        # session (session.py), so its footer stats answer from
        # metadata too — no scan fallback needed on a fresh table
        got_ts = cat.min_max("t", "ts")
    finally:
        cat.spark = held
    assert got_v == want("v")
    assert got_ts == want("ts")

    # numeric partition column: token stats must NOT answer (e.g. "10"
    # < "9" lexicographically) — the scan fallback gives the true max
    cat2 = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake2"))
    pdf = spark.range(120).select(
        F.col("id"), (F.col("id") % 12).alias("p")
    )
    cat2.overwrite(pdf, "t", partition_cols=["p"])
    assert cat2.min_max("t", "p") == (0, 11)


# -- TIMESTAMP_MICROS: temporal predicates ride the stats layer (r10) --------


def _ts_lake(spark, tmp_path, name="lake_ts"):
    """A fresh table whose `ts` is a true TIMESTAMP (with-local-zone)
    column, landed one staged dir per year — every file's ts range is
    a tight single year."""
    import datetime

    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / name))
    for y in (1995, 1996, 1997, 1998):
        rows = [
            (y * 1000 + i, datetime.datetime(y, 1 + i % 12, 1 + i % 28), float(i))
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
        assert df.schema["ts"].dataType.typeName() == "timestamp"  # LTZ
        cat.append(df.coalesce(1), "t")
    return cat


def test_timestamp_predicates_are_metadata_only_on_fresh_tables(
    spark, tmp_path
):
    """The r9 verdict's #3: with the session writing TIMESTAMP_MICROS,
    count_rows / min_max / delete_where with a timestamp predicate on a
    fresh table touch ZERO data files — pinned by nulling the Spark
    handle (the scan path would explode)."""
    import datetime

    from pyspark.sql import functions as F

    cat = _ts_lake(spark, tmp_path)
    cut = datetime.datetime(1997, 1, 1)
    want = cat.read("t").filter(F.col("ts") >= cut).count()
    held = cat.spark
    try:
        cat.spark = None
        # year-aligned cut: every file decides fully from its sidecar
        got = cat.count_rows("t", [("ts", ">=", cut)])
        mn, mx = cat.min_max("t", "ts")
        # provably-no-match delete: no candidates, no rewrite, no Spark
        deleted = cat.delete_where("t", [("ts", ">=", datetime.datetime(3000, 1, 1))])
    finally:
        cat.spark = held
    assert got == want == 100
    assert mn == datetime.datetime(1995, 1, 1)
    assert mx.year == 1998
    assert deleted == 0


def test_timestamp_delete_rewrites_only_candidate_year(spark, tmp_path):
    """DELETE WHERE ts in [1996, 1997) rewrites the 1996 file only;
    every other year's file carries into the new snapshot by hardlink
    (same inode)."""
    import datetime
    import os

    from pyspark.sql import functions as F

    cat = _ts_lake(spark, tmp_path)
    pre = {
        os.path.join(d, f): os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t")
        for f in cat._dir_parquet_files(d)
    }
    assert len(pre) == 4
    deleted = cat.delete_where(
        "t",
        [
            ("ts", ">=", datetime.datetime(1996, 1, 1)),
            ("ts", "<", datetime.datetime(1997, 1, 1)),
        ],
    )
    assert deleted == 50
    post = {
        os.path.join(d, f): os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t")
        for f in cat._dir_parquet_files(d)
    }
    # exactly 3 of 4 files carried by hardlink; 1996 rewritten away
    carried = set(post.values()) & set(pre.values())
    assert len(carried) == 3
    assert cat.read("t").filter(
        (F.col("ts") >= datetime.datetime(1996, 1, 1))
        & (F.col("ts") < datetime.datetime(1997, 1, 1))
    ).count() == 0
    assert cat.count_rows("t") == 150


def test_legacy_int96_files_still_answer_via_scan(spark, tmp_path):
    """Files written by a legacy INT96 writer carry no ts footer stats:
    the metadata layer must stay conservative-correct — count_rows and
    min_max scan those files (and only those) and still answer
    exactly."""
    import datetime

    from pyspark.sql import functions as F

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake96"))
    rows = [
        (i, datetime.datetime(1995 + i % 4, 1 + i % 12, 1 + i % 28))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        cat.append(df.coalesce(1), "t")
    finally:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
    # INT96 file: ts column has no min/max in its sidecar entry
    (d,) = cat._data_dirs("t")
    stats = filestats.read_dir_stats(d)
    (entry,) = stats["files"].values()
    assert entry["columns"]["ts"]["min"] is None
    cut = datetime.datetime(1997, 1, 1)
    want = cat.read("t").filter(F.col("ts") >= cut).count()
    assert cat.count_rows("t", [("ts", ">=", cut)]) == want
    r = cat.read("t").agg(F.min("ts"), F.max("ts")).first()
    assert cat.min_max("t", "ts") == (r[0], r[1])
    # the id column is still INT64 with stats: zero-I/O count holds
    held = cat.spark
    try:
        cat.spark = None
        n = cat.count_rows("t", [("id", "<", 1000)])
    finally:
        cat.spark = held
    assert n == 200


# -- DNF (OR) predicates on the read path (r10) ------------------------------


def test_read_with_dnf_predicates_prunes_union(spark, tcat):
    """read(predicates=[conj, conj]) — candidates are the union of the
    branches' files; values equal the unpruned OR filter."""
    _append_range(tcat, 0, 100, "a")
    _append_range(tcat, 100, 200, "b")
    _append_range(tcat, 200, 300, "c")
    dnf = [[("k", "<", 50)], [("k", ">=", 250)]]
    kept, total = tcat.pruned_files("t", dnf)
    assert total == 3 and len(kept) == 2  # middle dir skipped
    df = tcat.read("t", predicates=dnf)
    assert _input_files(df) == {os.path.realpath(p) for p in kept}
    expect = tcat.read("t").where("k < 50 or k >= 250").orderBy("k").collect()
    assert df.orderBy("k").collect() == expect


def test_count_rows_with_dnf(spark, tcat):
    """DNF count: all-match branches count without I/O, no-match-
    everywhere files drop, the rest scan — exact at every mix."""
    _append_range(tcat, 0, 100, "a")
    _append_range(tcat, 100, 200, "b")
    _append_range(tcat, 200, 300, "c")
    dnf = [[("k", "<", 100)], [("k", ">=", 150), ("k", "<", 180)]]
    want = tcat.read("t").where("k < 100 or (k >= 150 and k < 180)").count()
    assert tcat.count_rows("t", dnf) == want == 130
    # a fully-decidable DNF answers with zero data I/O: branch one
    # all-matches dir a, branch two all-matches dir c, dir b drops
    dnf2 = [[("k", "<", 100)], [("k", ">=", 200)]]
    held = tcat.spark
    try:
        tcat.spark = None
        n = tcat.count_rows("t", dnf2)
    finally:
        tcat.spark = held
    assert n == 200


def test_date_vs_timestamp_coercion_is_midnight_exact(spark, tmp_path):
    """r10 review finding: day-TRUNCATING the date/timestamp coercion
    let min==max==value 'prove' equality for a file whose timestamps
    span a working day — wrongly dropping it from a != DELETE and
    wrongly metadata-counting it for =. Midnight promotion (Spark's own
    DATE->TIMESTAMP cast) makes every mixed-granularity op exact."""
    import datetime

    from pyspark.sql import functions as F

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    # one file, all rows on 1996-01-01 but at working hours (never 00:00)
    rows = [(i, datetime.datetime(1996, 1, 1, 8 + i)) for i in range(10)]
    cat.append(
        spark.createDataFrame(rows, "id long, ts timestamp").coalesce(1), "t"
    )
    d = datetime.date(1996, 1, 1)
    # Spark semantics: ts != DATE'1996-01-01' compares against midnight,
    # so EVERY row matches — the file must stay a candidate
    want_ne = cat.read("t").filter(F.col("ts") != F.lit(d)).count()
    assert want_ne == 10
    assert cat.count_rows("t", [("ts", "!=", d)]) == 10
    kept, total = cat.pruned_files("t", [("ts", "!=", d)])
    assert len(kept) == total == 1
    assert cat.delete_where("t", [("ts", "!=", d)]) == 10
    assert cat.count_rows("t") == 0

    # equality against the bare date matches NO row (midnight), so the
    # metadata count must be 0, not the whole file
    cat2 = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake2"))
    cat2.append(
        spark.createDataFrame(rows, "id long, ts timestamp").coalesce(1), "t"
    )
    assert cat2.count_rows("t", [("ts", "=", d)]) == 0
    assert cat2.count_rows("t", [("ts", "in", [d])]) == 0
    # and a DATE column vs a noon TIMESTAMP predicate: no row equals it
    drows = [(i, datetime.date(1996, 1, 1)) for i in range(5)]
    cat2.append(
        spark.createDataFrame(drows, "id long, d date").coalesce(1), "dt"
    )
    noon = datetime.datetime(1996, 1, 1, 12)
    assert cat2.count_rows("dt", [("d", "=", noon)]) == 0
    # midnight-exact: the true boundary still answers from metadata
    held = cat2.spark
    try:
        cat2.spark = None
        n = cat2.count_rows(
            "dt", [("d", "=", datetime.datetime(1996, 1, 1))]
        )
    finally:
        cat2.spark = held
    assert n == 5
    # range ops stay correct across the granularity mix
    assert cat2.count_rows("t", [("ts", ">=", d)]) == 10
    assert cat2.count_rows(
        "t", [("ts", "<", datetime.date(1996, 1, 2))]
    ) == 10
