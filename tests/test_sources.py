"""Bronze CSV reader parity (reference csv-parse options at
`services/empresa.ts:42-49`): UTF-8 BOM, ragged rows, quoted fields with
embedded delimiters, empty lines, trimmed values."""

import os
import tempfile

import pytest

from gcp_datalake_pipeline_spark.schemas import EMPRESA_CSV_SCHEMA
from gcp_datalake_pipeline_spark.sources.csv_bronze import read_bronze_csv


@pytest.fixture()
def tmpcsv():
    d = tempfile.mkdtemp(prefix="engine_csv_")
    yield os.path.join(d, "empresas_test.csv")
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def _write(path: str, content: bytes):
    with open(path, "wb") as f:
        f.write(content)


def test_bom_and_trim(spark, tmpcsv):
    _write(
        tmpcsv,
        "﻿carrier_bp;carrier_name;carrier_tin;carrier_type\n"
        "  111  ;  NAME  ;11111111-1;T1\n".encode("utf-8"),
    )
    rows = read_bronze_csv(spark, tmpcsv, EMPRESA_CSV_SCHEMA).collect()
    assert len(rows) == 1
    # BOM must not corrupt the first header/value; fields are trimmed
    assert rows[0]["carrier_bp"] == "111"
    assert rows[0]["carrier_name"] == "NAME"


def test_ragged_rows_tolerated(spark, tmpcsv):
    _write(
        tmpcsv,
        b"carrier_bp;carrier_name;carrier_tin;carrier_type\n"
        b"111;ONLY-TWO\n"  # missing trailing columns -> NULLs
        b"222;FULL;22222222-2;T2\n",
    )
    rows = {r["carrier_bp"]: r for r in
            read_bronze_csv(spark, tmpcsv, EMPRESA_CSV_SCHEMA).collect()}
    assert rows["111"]["carrier_tin"] is None
    assert rows["111"]["carrier_type"] is None
    assert rows["222"]["carrier_type"] == "T2"


def test_quoted_delimiter_and_empty_lines(spark, tmpcsv):
    _write(
        tmpcsv,
        b"carrier_bp;carrier_name;carrier_tin;carrier_type\n"
        b"\n"
        b'111;"NAME; WITH SEMI";11111111-1;T1\n'
        b"\n",
    )
    rows = read_bronze_csv(spark, tmpcsv, EMPRESA_CSV_SCHEMA).collect()
    assert len(rows) == 1
    assert rows[0]["carrier_name"] == "NAME; WITH SEMI"


def test_row_idx_is_file_order(spark, tmpcsv):
    _write(
        tmpcsv,
        b"carrier_bp;carrier_name;carrier_tin;carrier_type\n"
        + b"".join(f"{i};N{i};x;T\n".encode() for i in range(50)),
    )
    rows = read_bronze_csv(spark, tmpcsv, EMPRESA_CSV_SCHEMA).collect()
    idx = [(r["_row_idx"], int(r["carrier_bp"])) for r in rows]
    by_arrival = sorted(idx)
    assert [b for _, b in by_arrival] == list(range(50))  # monotone file order


def test_lister_sync_and_ingest(spark, catalog, tmp_path_factory):
    """Pluggable lister: sync a 'remote' dir into landing (copy, then move
    originals to procesados — the reference's processed marker), then run
    the batch ingest off a GlobLister over the landing dir."""
    import os
    import shutil

    from gcp_datalake_pipeline_spark.pipelines.runner import ingest
    from gcp_datalake_pipeline_spark.sources.listing import (
        GlobLister,
        StaticLister,
        sync_landing,
    )

    base = str(tmp_path_factory.mktemp("lister"))
    remote, landing, procesados = (
        os.path.join(base, d) for d in ("remote", "landing", "procesados")
    )
    os.makedirs(remote)
    for f in os.listdir("tests/fixtures"):
        if f.endswith(".csv"):
            shutil.copy(os.path.join("tests/fixtures", f), remote)

    landed = sync_landing(
        GlobLister(os.path.join(remote, "*.csv")), landing, procesados
    )
    assert len(landed) == 3
    assert os.listdir(remote) == []  # originals moved = processed marker
    assert len(os.listdir(procesados)) == 3

    results = ingest(catalog, GlobLister(os.path.join(landing, "*.csv")))
    assert len(results) == 3
    assert catalog.read("empresa").count() == 3

    # StaticLister = the reference's one-file-per-event shape
    one = StaticLister((landed[0],))
    assert [f.path for f in one.list()] == [landed[0]]


def test_sync_landing_rejects_basename_collisions(tmp_path):
    """Two listed files with the same basename from different dirs would
    silently overwrite each other in landing — must raise (ADVICE r2)."""
    import pytest

    from gcp_datalake_pipeline_spark.sources.listing import (
        StaticLister,
        sync_landing,
    )

    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    (d1 / "f.csv").write_text("x;y\n1;2\n")
    (d2 / "f.csv").write_text("x;y\n3;4\n")
    lister = StaticLister(paths=(str(d1 / "f.csv"), str(d2 / "f.csv")))
    with pytest.raises(ValueError, match="basename collision"):
        sync_landing(lister, str(tmp_path / "landing"))
    # both originals untouched (no partial copy/move happened)
    assert (d1 / "f.csv").exists() and (d2 / "f.csv").exists()
