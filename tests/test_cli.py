"""End-to-end CLI smoke: drive the argparse entry point in-process
(same argv surface the shell sees; the warm test SparkSession is reused
instead of booting a ~12s JVM per invocation — the full-file wall time
dropped ~10x). One subprocess test remains
(test_cli_subprocess_entry) to pin the real `python -m` process
behavior: exit codes, module entry, stdout framing."""

import contextlib
import io
import json
import shutil
import subprocess
import sys
import tempfile
import types

import pytest

from gcp_datalake_pipeline_spark import cli as _cli


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="engine_cli_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_cli(*args):
    """Invoke the CLI entry in-process: same argv parsing, same output
    text, same exit-code contract (SystemExit with a message -> rc 1 +
    stderr, argparse errors -> rc 2)."""
    out, err = io.StringIO(), io.StringIO()
    rc = 0
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        try:
            _cli.main(list(args))
        except SystemExit as e:  # sys.exit(msg) or argparse exit
            if e.code is None:
                rc = 0
            elif isinstance(e.code, int):
                rc = e.code
            else:
                rc = 1
                print(e.code, file=err)
        except Exception:  # noqa: BLE001 — subprocess parity: traceback to stderr, rc 1
            import traceback

            traceback.print_exc(file=err)
            rc = 1
    return types.SimpleNamespace(
        returncode=rc, stdout=out.getvalue(), stderr=err.getvalue()
    )


def test_cli_subprocess_entry(workdir):
    """The one true-subprocess test: `python -m` module entry boots its
    own JVM, ingests, and exits 0 with the JSON payload on stdout."""
    cat = f"{workdir}/subproc_lake"
    r = subprocess.run(
        [sys.executable, "-m", "gcp_datalake_pipeline_spark.cli",
         "ingest", "--catalog", cat, "tests/fixtures/*.csv"],
        capture_output=True,
        text=True,
        timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root", "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout[r.stdout.index("{"):])
    assert len(payload) == 3


def test_cli_ingest_tables_query(workdir):
    cat = f"{workdir}/lake"
    r = run_cli("ingest", "--catalog", cat, "tests/fixtures/*.csv")
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout[r.stdout.index("{"):])
    assert len(payload) == 3

    r = run_cli("tables", "--catalog", cat)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "empresa\t3 rows" in r.stdout
    assert "revision_tecnica\t3 rows" in r.stdout

    r = run_cli(
        "query", "--catalog", cat,
        "SELECT carrier_bp, carrier_name FROM empresa ORDER BY carrier_bp",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EMPRESA UNO RENOMBRADA" in r.stdout


def test_cli_atomic_ingest_and_query(workdir):
    """--atomic routes through TransactionalCatalog: manifest-pointer
    catalog, later commands auto-detect it and resolve reads through the
    manifest."""
    import os

    cat = f"{workdir}/atomic_lake"
    r = run_cli("ingest", "--atomic", "--catalog", cat, "tests/fixtures/*.csv")
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(f"{cat}/_MANIFEST.json")

    r = run_cli("tables", "--catalog", cat)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "empresa\t3 rows" in r.stdout
    assert "empresa_history\t3 rows" in r.stdout
    assert "_loads" not in r.stdout  # internals never listed as tables

    r = run_cli(
        "query", "--catalog", cat,
        "SELECT carrier_bp, carrier_name FROM empresa ORDER BY carrier_bp",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EMPRESA UNO RENOMBRADA" in r.stdout


def test_cli_corpus_ingest(workdir):
    """corpus-ingest streams landed document parquet files through atomic
    dedup rounds; a second invocation on the same checkpoint is a no-op."""
    import os

    import duckdb

    land = f"{workdir}/corpus_landing"
    os.makedirs(land, exist_ok=True)
    duckdb.sql(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE doc_id < 250) TO "
        f"'{land}/a.parquet' (FORMAT PARQUET)"
    )
    duckdb.sql(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE doc_id >= 250) TO "
        f"'{land}/b.parquet' (FORMAT PARQUET)"
    )
    cat = f"{workdir}/corpus_lake"
    r = run_cli(
        "corpus-ingest", "--atomic", "--catalog", cat,
        "--landing", land, "--checkpoint", f"{workdir}/corpus_ckpt",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout[r.stdout.index("{"):])
    assert len(payload["rounds"]) == 2
    assert payload["docs"] == 500
    assert payload["near_dup_pairs"] > 0

    # replay on the same checkpoint: no new rounds, counts unchanged
    r = run_cli(
        "corpus-ingest", "--atomic", "--catalog", cat,
        "--landing", land, "--checkpoint", f"{workdir}/corpus_ckpt",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload2 = json.loads(r.stdout[r.stdout.index("{"):])
    assert payload2["rounds"] == []
    assert payload2["docs"] == 500
    assert payload2["near_dup_pairs"] == payload["near_dup_pairs"]


def test_cli_ann_index_lifecycle(workdir):
    """ann build -> extend -> query: the persisted-index serving surface.
    Query output ranks the probed cells' neighbors; extend is append-only
    against frozen centroids."""
    cat = f"{workdir}/ann_lake"
    src = "/root/testdata/sf0.001/embeddings.parquet"
    r = run_cli("ann", "build", "--atomic", "--catalog", cat, "--source", src)
    assert r.returncode == 0, r.stderr[-2000:]
    built = json.loads(r.stdout[r.stdout.index("{"):])
    assert built["nlist"] == 16 and built["vectors"] == 500

    r = run_cli("ann", "query", "--catalog", cat, "--ids", "3,57", "--k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "query_id" in r.stdout and "cosine_sim" in r.stdout

    r = run_cli("ann", "query", "--catalog", cat)
    assert r.returncode != 0 and "requires --ids" in r.stderr

    # tombstone delete lifecycle: remove -> shadowed -> compact-index
    r = run_cli("ann", "remove", "--catalog", cat, "--ids", "3,57")
    assert r.returncode == 0, r.stderr[-2000:]
    removed = json.loads(r.stdout[r.stdout.index("{"):])
    assert removed == {"removed": [3, 57], "tombstones": 2}

    # describe on the cells table surfaces the not-yet-folded deletes
    # (count_rows still says 500 — the stats layer can't see tombstones)
    r = run_cli("describe", "--catalog", cat, "ann_ivf_cells")
    assert r.returncode == 0, r.stderr[-2000:]
    health = json.loads(r.stdout[r.stdout.index("{"):])
    assert health["rows"] == 500 and health["pending_tombstones"] == 2

    r = run_cli("ann", "query", "--catalog", cat, "--ids", "3", "--k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "| 3 " not in r.stdout  # removed id resolves to no rows

    r = run_cli("ann", "compact-index", "--catalog", cat)
    assert r.returncode == 0, r.stderr[-2000:]
    compacted = json.loads(r.stdout[r.stdout.index("{"):])
    assert compacted == {
        "dropped": 2, "tombstones_cleared": 2, "vectors": 498,
    }

    r = run_cli("describe", "--catalog", cat, "ann_ivf_cells")
    assert r.returncode == 0, r.stderr[-2000:]
    health = json.loads(r.stdout[r.stdout.index("{"):])
    assert health["rows"] == 498 and health["pending_tombstones"] == 0

    r = run_cli("ann", "remove", "--catalog", cat)
    assert r.returncode != 0 and "requires --ids" in r.stderr


def test_cli_ann_pq_build_and_adc_query(workdir):
    """ann build --pq-m stores codes + the frozen codebook; query --adc
    serves from the codes (adc_dist column) without the vector column."""
    cat = f"{workdir}/ann_pq_lake"
    src = "/root/testdata/sf0.001/embeddings.parquet"
    r = run_cli(
        "ann", "build", "--atomic", "--catalog", cat, "--source", src,
        "--pq-m", "8",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    built = json.loads(r.stdout[r.stdout.index("{"):])
    assert built["pq_m"] == 8 and built["vectors"] == 500

    r = run_cli(
        "ann", "query", "--catalog", cat, "--ids", "3,57", "--k", "3",
        "--adc",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "adc_dist" in r.stdout and "query_id" in r.stdout


def test_cli_rounds_and_show_quarantine(workdir):
    """`rounds` surfaces the loops' audit tables (+ age retention);
    `corpus-ingest --show-quarantine` includes the provenance table.
    Reuses the corpus_lake built by test_cli_corpus_ingest."""
    cat = f"{workdir}/corpus_lake"
    r = run_cli("rounds", "--catalog", cat)
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout[r.stdout.index("{"):])
    assert len(payload["corpus_docs_rounds"]) == 2  # one row per round
    assert all(
        row["n_docs"] == 250 for row in payload["corpus_docs_rounds"]
    )
    assert payload["corpus_docs_file_quarantine"] is None  # no poisons

    # retention: a huge age drops nothing; rows survive
    r = run_cli("rounds", "--catalog", cat, "--prune-age", "31536000")
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout[r.stdout.index("{"):])
    assert payload["pruned"] == {"corpus_docs_rounds": 0}
    assert len(payload["corpus_docs_rounds"]) == 2

    # --show-quarantine on a clean catalog reports an empty list
    land = f"{workdir}/corpus_landing"
    r = run_cli(
        "corpus-ingest", "--atomic", "--catalog", cat,
        "--landing", land, "--checkpoint", f"{workdir}/corpus_ckpt",
        "--show-quarantine",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout[r.stdout.index("{"):])
    assert payload["rounds"] == [] and payload["quarantine"] == []


def test_cli_describe_and_sql_dml(workdir):
    """describe reports metadata-only table health; DELETE/UPDATE typed
    at the query prompt route to the stats-pruned DML."""
    cat = f"{workdir}/desc_lake"
    r = run_cli(
        "ingest", "--atomic", "--catalog", cat,
        "tests/fixtures/empresas_20251001.csv",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("describe", "--catalog", cat, "empresa")
    assert r.returncode == 0, r.stderr[-2000:]
    d = json.loads(r.stdout[r.stdout.index("{"):])
    assert d["rows"] > 0 and d["files"] >= 1 and d["stats_coverage"] == 1.0

    r = run_cli(
        "query", "--catalog", cat,
        "DELETE FROM empresa WHERE carrier_id >= 1",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    deleted = json.loads(r.stdout[r.stdout.index("{"):])
    assert deleted["table"] == "empresa" and deleted["deleted"] > 0


def test_cli_sql_insert_and_merge(workdir):
    """INSERT INTO / MERGE INTO typed at the query prompt route to
    append / merge_upsert (r10: the write half of the SQL front door)."""
    cat = f"{workdir}/dml_lake"
    r = run_cli(
        "ingest", "--atomic", "--catalog", cat,
        "tests/fixtures/empresas_20251001.csv",
    )
    assert r.returncode == 0, r.stderr[-2000:]

    r = run_cli(
        "query", "--catalog", cat,
        "INSERT INTO empresa (carrier_id, carrier_bp, carrier_name) "
        "VALUES (901, 'BP901', 'NUEVA EMPRESA'), (902, 'BP902', NULL)",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ins = json.loads(r.stdout[r.stdout.index("{"):])
    assert ins == {"table": "empresa", "inserted": 2}

    # MERGE from a registered view (empresa itself, projected) — updates
    # the two inserted rows and the originals in one statement
    r = run_cli(
        "query", "--catalog", cat,
        "MERGE INTO empresa USING "
        "(SELECT carrier_id, upper(coalesce(carrier_name, 'X')) "
        "AS carrier_name FROM empresa) m "
        "ON empresa.carrier_id = m.carrier_id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    mrg = json.loads(r.stdout[r.stdout.index("{"):])
    assert mrg["table"] == "empresa" and mrg["merged"] >= 2

    r = run_cli(
        "query", "--catalog", cat,
        "SELECT carrier_name FROM empresa WHERE carrier_id = 902",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "X" in r.stdout

    # refusal discipline survives at the CLI: nonzero exit, grammar shown
    r = run_cli("query", "--catalog", cat, "INSERT INTO empresa SELECT 1")
    assert r.returncode != 0


def test_cli_query_as_of_time_travel(workdir):
    """query --as-of N registers every table AS OF snapshot N and runs
    read-only: rows deleted later reappear in the historical world and
    DML against it refuses."""
    cat = f"{workdir}/asof_lake"
    r = run_cli(
        "ingest", "--atomic", "--catalog", cat,
        "tests/fixtures/empresas_20251001.csv",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("versions", "--catalog", cat)
    assert r.returncode == 0, r.stderr[-2000:]
    versions = json.loads(r.stdout[r.stdout.index("["):])
    v0 = versions[-1]["version"]
    r = run_cli(
        "query", "--catalog", cat, "DELETE FROM empresa WHERE carrier_id >= 1"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli(
        "query", "--catalog", cat, "SELECT count(*) AS n FROM empresa"
    )
    assert "| 0 " in r.stdout or "|0 " in r.stdout.replace("  ", " ")
    r = run_cli(
        "query", "--catalog", cat, "--as-of", str(v0),
        "SELECT count(*) AS n FROM empresa",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "| 3 " in r.stdout or "|3 " in r.stdout.replace("  ", " ")
    r = run_cli(
        "query", "--catalog", cat, "--as-of", str(v0),
        "DELETE FROM empresa WHERE carrier_id >= 1",
    )
    assert r.returncode != 0 and "read-only" in r.stderr


def test_cli_diff_and_table_changes_tvf(workdir):
    """The change-data-feed surfaces: the `diff` verb summarizes
    per-commit inserts/deletes, and SELECT ... FROM table_changes('t',
    v) works at the SQL prompt (rewritten to a bounded temp view)."""
    cat = f"{workdir}/cdf_lake"
    r = run_cli(
        "ingest", "--atomic", "--catalog", cat,
        "tests/fixtures/empresas_20251001.csv",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("versions", "--catalog", cat)
    v0 = json.loads(r.stdout[r.stdout.index("["):])[-1]["version"]
    r = run_cli(
        "query", "--catalog", cat, "DELETE FROM empresa WHERE carrier_id = 1"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli(
        "diff", "--catalog", cat, "empresa", "--from", str(v0)
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout[r.stdout.index("{"):])
    assert payload["table"] == "empresa"
    assert [c["type"] for c in payload["changes"]] == ["delete"]
    assert payload["changes"][0]["rows"] == 1
    r = run_cli(
        "query", "--catalog", cat,
        f"SELECT _change_type, count(*) AS n FROM "
        f"table_changes('empresa', {v0}) GROUP BY _change_type",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "delete" in r.stdout


def test_cli_version_as_of_table_syntax(workdir):
    """Per-table time travel at the SQL prompt: FROM t VERSION AS OF n
    rewrites to a snapshot read — deleted rows reappear."""
    cat = f"{workdir}/vasof_lake"
    r = run_cli(
        "ingest", "--atomic", "--catalog", cat,
        "tests/fixtures/empresas_20251001.csv",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("versions", "--catalog", cat)
    v0 = json.loads(r.stdout[r.stdout.index("["):])[-1]["version"]
    r = run_cli(
        "query", "--catalog", cat, "DELETE FROM empresa WHERE carrier_id >= 1"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli(
        "query", "--catalog", cat,
        f"SELECT count(*) AS n FROM empresa VERSION AS OF {v0}",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "|3 " in r.stdout.replace("  ", " ") or "| 3 " in r.stdout


def test_cli_cdf_pump_lifecycle(workdir):
    """cdf-pump end-to-end: first call bootstraps replica + registers;
    later calls fold DML windows; an idle pump is a no-op."""
    cat = f"{workdir}/cdclake"
    r = run_cli("ingest", "--atomic", "--catalog", cat,
                "tests/fixtures/empresas*.csv")
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli(
        "query", "--catalog", cat,
        "CREATE TABLE src (k BIGINT, v STRING)",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli(
        "query", "--catalog", cat,
        "INSERT INTO src VALUES (1, 'a'), (2, 'b'), (3, 'c')",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli(
        "cdf-pump", "--catalog", cat, "--source", "src",
        "--consumer", "rep", "--target", "replica", "--keys", "k",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert out["bootstrapped"] is True
    r = run_cli("query", "--catalog", cat, "DELETE FROM src WHERE k = 2")
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli(
        "cdf-pump", "--catalog", cat, "--source", "src",
        "--consumer", "rep", "--target", "replica", "--keys", "k",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert out["applied"] > 0
    r = run_cli(
        "query", "--catalog", cat,
        "SELECT k, v FROM replica ORDER BY k",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "|1  |a  |" in r.stdout and "|3  |c  |" in r.stdout
    assert "|2  |b  |" not in r.stdout
    # idle pump: zero apply, watermark steady
    r = run_cli(
        "cdf-pump", "--catalog", cat, "--source", "src",
        "--consumer", "rep", "--target", "replica", "--keys", "k",
    )
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert out["applied"] == 0 and out["from"] == out["to"]


def test_prompt_rewrites_are_quote_aware(spark, tmp_path):
    """VERSION AS OF / table_changes() INSIDE a string literal are user
    data, not syntax: the rewrite must pass them through verbatim (and
    not side-effect a read_at/table_changes call on a phantom table),
    while a real occurrence in the same statement still rewrites."""
    from gcp_datalake_pipeline_spark.cli import (
        _rewrite_table_changes,
        _rewrite_version_as_of,
    )
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(spark.range(3).toDF("k"), "t")  # v1

    # literal-only: untouched (a naive rewrite would raise FileNotFound
    # on table 'x' or rewrite the data into a temp-view name)
    s = "SELECT * FROM t WHERE note = 'x VERSION AS OF 3'"
    assert _rewrite_version_as_of(cat, s) == s
    # double-quoted literals are strings in Spark SQL too — a call
    # shape inside one must not side-effect a table_changes('x') read
    s2 = 'SELECT * FROM t WHERE note = "see table_changes(\'x\', 7) docs"'
    assert _rewrite_table_changes(cat, s2) == s2

    # real occurrence outside the literal still rewrites — even when a
    # literal CONTAINING the phrase precedes it in the same statement
    mixed = (
        "SELECT 'keep t VERSION AS OF 9 verbatim' AS c "
        "FROM t VERSION AS OF 1"
    )
    out = _rewrite_version_as_of(cat, mixed)
    assert "_asof_t_v1" in out
    assert "'keep t VERSION AS OF 9 verbatim'" in out
    assert spark.sql(out).count() == 3

    cat.append(spark.range(3, 5).toDF("k"), "t")  # v2
    mixed2 = (
        "SELECT count(*) AS n, 'table_changes(''x'', 7)' AS doc "
        "FROM table_changes('t', 1) GROUP BY doc"
    )
    out2 = _rewrite_table_changes(cat, mixed2)
    assert "_changes_t_1_cur" in out2
    assert "'table_changes(''x'', 7)'" in out2
    assert spark.sql(out2).first()["n"] == 2


def test_prompt_rewrites_honor_backslash_escapes(spark, tmp_path):
    """Spark's default parser treats backslash as an escape inside a
    literal, so `'it\\'s ... VERSION AS OF 2'` is ONE literal — the
    rewrite must not treat its tail as syntax (review r11 #1)."""
    from gcp_datalake_pipeline_spark.cli import _rewrite_version_as_of
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(spark.range(3).toDF("k"), "t")
    s = "SELECT * FROM t WHERE note = 'it\\'s fine VERSION AS OF 2'"
    assert _rewrite_version_as_of(cat, s) == s


def test_timestamp_as_of_resolution_and_prompt(spark, tmp_path):
    """Delta's TIMESTAMP AS OF: version_at picks the greatest retained
    commit at-or-before the timestamp (refusing pre-horizon asks), and
    the SQL-prompt phrase serves that snapshot — quote-aware like the
    VERSION AS OF rewrite it extends."""
    import datetime

    from gcp_datalake_pipeline_spark.cli import _rewrite_version_as_of
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(spark.range(3).toDF("k"), "t")  # v1
    t1 = cat.versions()[-1]["committed_at"]
    cat.append(spark.range(3, 5).toDF("k"), "t")  # v2
    t2 = cat.versions()[-1]["committed_at"]

    assert cat.version_at(t1) == 1
    assert cat.version_at((t1 + t2) / 2) == 1  # between commits -> earlier
    assert cat.version_at(t2 + 60) == 2  # after the last -> current
    with pytest.raises(ValueError, match="no retained snapshot"):
        cat.version_at(t1 - 60)  # before the earliest retained
    # ISO strings and datetimes resolve too
    iso = datetime.datetime.fromtimestamp(t1).isoformat()
    assert cat.version_at(iso) == 1
    assert cat.version_at(datetime.datetime.fromtimestamp(t2)) == 2

    out = _rewrite_version_as_of(
        cat, f"SELECT count(*) AS n FROM t TIMESTAMP AS OF '{iso}'"
    )
    assert "_asof_t_v1" in out
    assert spark.sql(out).first()["n"] == 3
    # inside a string literal the phrase is data, not syntax
    s = "SELECT * FROM t WHERE note = 'x TIMESTAMP AS OF ''2020-01-01'''"
    assert _rewrite_version_as_of(cat, s) == s


def test_cli_clustered_ctas_and_recluster(workdir):
    """The CLUSTERED BY CTAS must get the catalog views registered (its
    key-list parens once made the CLI mistake it for a typed CREATE and
    skip registration — UnresolvedRelation), and ALTER TABLE ...
    CLUSTERED BY ... INTO m BUCKETS re-buckets online, value-invariant,
    reporting the strategy."""
    import os

    cat = f"{workdir}/atomic_lake"  # reuses the module's atomic lake
    if not os.path.exists(f"{cat}/_MANIFEST.json"):
        r = run_cli(
            "ingest", "--atomic", "--catalog", cat, "tests/fixtures/*.csv"
        )
        assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli(
        "query", "--catalog", cat,
        "CREATE TABLE emp_rb CLUSTERED BY (carrier_id) INTO 8 BUCKETS "
        "AS SELECT carrier_id, carrier_name FROM empresa",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert out["buckets"] == 8 and out["rows"] == 3
    r = run_cli(
        "query", "--catalog", cat,
        "ALTER TABLE emp_rb CLUSTERED BY (carrier_id) INTO 4 BUCKETS",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert out["strategy"] == "fold" and out["num_buckets"] == 4
    r = run_cli(
        "query", "--catalog", cat,
        "SELECT count(*) AS n FROM emp_rb",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "|3" in r.stdout.replace(" ", "")


def test_table_changes_tvf_follow_renames(spark, tmp_path):
    """The TVF accepts a trailing boolean — table_changes('t', v1[,
    v2], true) — mapping to follow_renames; without it a window
    crossing a rename still refuses."""
    import pytest as _pytest

    from gcp_datalake_pipeline_spark.cli import _rewrite_table_changes
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(spark.range(3).toDF("k"), "a")   # v1
    cat.append(spark.range(3, 5).toDF("k"), "a")   # v2
    cat.rename_table("a", "b")                     # v3
    cat.append(spark.range(5, 9).toDF("k"), "b")   # v4

    with _pytest.raises(ValueError, match="follow_renames"):
        _rewrite_table_changes(
            cat, "SELECT count(*) FROM table_changes('b', 1)"
        )
    out = _rewrite_table_changes(
        cat, "SELECT count(*) AS n FROM table_changes('b', 1, true)"
    )
    assert "_changes_b_1_cur_fr" in out
    assert spark.sql(out).first()["n"] == 6  # v2's 2 + v4's 4 inserts
    # explicit to_version + the flag
    out2 = _rewrite_table_changes(
        cat, "SELECT count(*) AS n FROM table_changes('b', 1, 4, true)"
    )
    assert spark.sql(out2).first()["n"] == 6
