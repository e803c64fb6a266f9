"""GCS / Drive remote sources (sources/remote.py) against in-memory fakes
that mimic the public SDK surfaces — the network boundary of the
reference (ingesta-drive-gcs/src/index.ts:41-139) without the network.

No Spark needed: these are pure transport-layer tests.
"""

import datetime
import os

import pytest

from gcp_datalake_pipeline_spark.sources.remote import (
    DriveSource,
    GCSSource,
    sync_remote_landing,
)

# ---- google-cloud-storage fake ------------------------------------------


class FakeBlob:
    def __init__(self, bucket, name, data):
        self.bucket = bucket
        self.name = name
        self.data = data
        self.size = len(data)
        self.updated = datetime.datetime(2025, 10, 1, tzinfo=datetime.timezone.utc)

    def download_to_filename(self, path):
        with open(path, "wb") as f:
            f.write(self.data)

    def delete(self):
        del self.bucket.blobs[self.name]


class FakeBucket:
    def __init__(self, name):
        self.name = name
        self.blobs = {}

    def put(self, name, data):
        self.blobs[name] = FakeBlob(self, name, data)

    def list_blobs(self, prefix=""):
        return [
            b for n, b in sorted(self.blobs.items()) if n.startswith(prefix)
        ]

    def copy_blob(self, blob, dest_bucket, new_name):
        dest_bucket.put(new_name, blob.data)


class FakeGCSClient:
    def __init__(self, bucket):
        self._bucket = bucket

    def bucket(self, name):
        assert name == self._bucket.name
        return self._bucket


# ---- Drive v3 fake -------------------------------------------------------


class _Call:
    def __init__(self, result):
        self._result = result

    def execute(self):
        return self._result


class FakeDriveFiles:
    def __init__(self, svc):
        self.svc = svc

    def list(self, q, fields):
        assert self.svc.folder_id in q and "trashed = false" in q
        metas = [
            {
                "id": fid,
                "name": meta["name"],
                "size": str(len(meta["data"])),
            }
            for fid, meta in sorted(self.svc.store.items())
            if meta["parent"] == self.svc.folder_id
        ]
        return _Call({"files": metas})

    def get_media(self, fileId):
        return _Call(self.svc.store[fileId]["data"])

    def update(self, fileId, addParents, removeParents):
        meta = self.svc.store[fileId]
        assert meta["parent"] == removeParents
        meta["parent"] = addParents
        return _Call({})


class FakeDriveService:
    def __init__(self, folder_id):
        self.folder_id = folder_id
        self.store = {}

    def add(self, fid, name, data, parent=None):
        self.store[fid] = {
            "name": name,
            "data": data,
            "parent": parent or self.folder_id,
        }

    def files(self):
        return FakeDriveFiles(self)


# ---- tests ---------------------------------------------------------------


def test_gcs_source_lists_fetches_and_marks_processed(tmp_path):
    bucket = FakeBucket("lake-landing")
    bucket.put("in/empresas_1.csv", b"a;b\n1;2\n")
    bucket.put("in/conductores_1.csv", b"c;d\n3;4\n")
    bucket.put("in/notes.txt", b"skip me")
    src = GCSSource(
        "lake-landing", prefix="in/", client=FakeGCSClient(bucket)
    )
    landing = str(tmp_path / "landing")
    landed = sync_remote_landing(src, landing)
    assert sorted(os.path.basename(p) for p in landed) == [
        "conductores_1.csv",
        "empresas_1.csv",
    ]
    assert open(os.path.join(landing, "empresas_1.csv"), "rb").read() == b"a;b\n1;2\n"
    # originals moved to the processed prefix (copy+delete), .txt untouched
    assert sorted(bucket.blobs) == [
        "in/notes.txt",
        "procesados/conductores_1.csv",
        "procesados/empresas_1.csv",
    ]


def test_gcs_listing_carries_provenance_metadata():
    bucket = FakeBucket("b")
    bucket.put("x.csv", b"123")
    src = GCSSource("b", client=FakeGCSClient(bucket))
    (f,) = src.list()
    assert f.path == "gs://b/x.csv" and f.size == 3 and f.modified is not None


def test_drive_source_round_trip(tmp_path):
    svc = FakeDriveService("folder-in")
    svc.add("f1", "vehiculos_1.csv", b"v;w\n5;6\n")
    svc.add("f2", "readme.md", b"skip")
    src = DriveSource(
        "folder-in", processed_folder_id="folder-done", service=svc
    )
    landing = str(tmp_path / "landing")
    landed = sync_remote_landing(src, landing)
    assert [os.path.basename(p) for p in landed] == ["vehiculos_1.csv"]
    assert open(landed[0], "rb").read() == b"v;w\n5;6\n"
    # the reference's processed marker: parent folder swapped
    assert svc.store["f1"]["parent"] == "folder-done"
    assert svc.store["f2"]["parent"] == "folder-in"


def test_fetch_before_mark_ordering_on_failure(tmp_path):
    """A fetch failure must leave the original UNPROCESSED (so the next
    sync retries it) — the crash-window contract of the reference flow."""

    class ExplodingGCS(GCSSource):
        def fetch(self, f, dest):
            raise IOError("network blip")

    bucket = FakeBucket("b")
    bucket.put("x.csv", b"123")
    src = ExplodingGCS("b", client=FakeGCSClient(bucket))
    with pytest.raises(IOError):
        sync_remote_landing(src, str(tmp_path / "landing"))
    assert "x.csv" in bucket.blobs  # never marked processed


def test_partial_download_never_lands_at_watched_path(tmp_path):
    """A crash mid-download must leave NOTHING at the watched basename:
    otherwise ingest processes the truncated file, checkpoints its name,
    and skips the complete re-fetch forever. The fetch goes to a .part
    temp and is published by atomic rename only on success."""

    class TruncatingGCS(GCSSource):
        def fetch(self, f, dest):
            with open(dest, "wb") as fh:
                fh.write(b"partial")  # bytes hit disk...
            raise IOError("connection reset")  # ...then the stream dies

    bucket = FakeBucket("b")
    bucket.put("x.csv", b"full contents")
    src = TruncatingGCS("b", client=FakeGCSClient(bucket))
    landing = tmp_path / "landing"
    with pytest.raises(IOError):
        sync_remote_landing(src, str(landing))
    # neither the final path nor the temp survives; original unprocessed
    assert not (landing / "x.csv").exists()
    assert not (landing / "x.csv.part").exists()
    assert "x.csv" in bucket.blobs
    # the retry (healthy network) lands the complete file
    healthy = GCSSource("b", client=FakeGCSClient(bucket))
    landed = sync_remote_landing(healthy, str(landing))
    assert open(landed[0], "rb").read() == b"full contents"


def test_basename_collision_fails_loudly(tmp_path):
    bucket = FakeBucket("b")
    bucket.put("a/dup.csv", b"1")
    bucket.put("c/dup.csv", b"2")
    src = GCSSource("b", client=FakeGCSClient(bucket))
    with pytest.raises(ValueError, match="collision"):
        sync_remote_landing(src, str(tmp_path / "landing"))


def test_landed_files_feed_the_batch_runner(tmp_path, catalog):
    """End-to-end: remote sync -> local landing -> ingest() processes the
    landed CSV exactly like a local file."""
    from gcp_datalake_pipeline_spark.pipelines.runner import ingest

    data = open("tests/fixtures/empresas_20251001.csv", "rb").read()
    bucket = FakeBucket("lake")
    bucket.put("in/empresas_20251001.csv", data)
    src = GCSSource("lake", prefix="in/", client=FakeGCSClient(bucket))
    landing = str(tmp_path / "landing")
    landed = sync_remote_landing(src, landing)
    results = ingest(catalog, landed)
    (res,) = results.values()
    assert res["processor"] == "empresa" and res["processedCount"] == 4
    assert catalog.read("empresa").count() == 3
