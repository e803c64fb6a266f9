"""Remote landing sources: GCS and Drive behind the Lister protocol.

The reference's network boundary (`ingesta-drive-gcs/src/index.ts:41-139`)
lists a Drive folder, copies each file into the GCS landing bucket, and
moves the original into a 'procesados' folder as the processed marker.
This module is that boundary for this engine: a :class:`RemoteSource`
enumerates remote files, fetches them into the local landing dir the
batch/streaming ingest already watches, and marks originals processed —
with the same fetch-BEFORE-mark ordering, so a crash between the two
re-fetches the file (at-least-once) and the checkpointed ingest
de-duplicates the replay (exactly-once end to end).

The Google SDKs are not installed in this environment, so both sources
take an injected ``client``/``service`` (any object with the same call
surface — the tests use in-memory fakes) and only import the real SDK
lazily when none is given. The call shapes are the public
``google-cloud-storage`` / ``googleapiclient`` surfaces, so wiring a real
deployment is construction-time configuration, not code change.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Protocol

from gcp_datalake_pipeline_spark.sources.listing import LandedFile


class RemoteSource(Protocol):  # pragma: no cover - protocol
    def list(self) -> list[LandedFile]: ...

    def fetch(self, f: LandedFile, dest: str) -> None: ...

    def mark_processed(self, f: LandedFile) -> None: ...


@dataclass
class GCSSource:
    """Objects under ``gs://bucket_name/prefix`` with suffix filtering.

    ``client`` must expose the google-cloud-storage surface used here:
    ``client.bucket(name)``, ``bucket.list_blobs(prefix=...)``,
    ``blob.name/size/updated``, ``blob.download_to_filename(path)``,
    ``bucket.copy_blob(blob, bucket, new_name)``, ``blob.delete()``.
    Processed marker = copy under ``processed_prefix/`` then delete the
    original (GCS has no rename; this is the documented idiom).
    """

    bucket_name: str
    prefix: str = ""
    suffix: str = ".csv"
    processed_prefix: str = "procesados"
    client: object | None = None
    _blobs: dict = field(default_factory=dict, repr=False)

    def _bucket(self):
        if self.client is None:
            try:
                from google.cloud import storage  # type: ignore
            except ImportError as e:  # pragma: no cover - env without SDK
                raise ImportError(
                    "google-cloud-storage is not installed; pass an "
                    "explicit client= (any object with the same surface) "
                    "or install the SDK"
                ) from e
            self.client = storage.Client()
        return self.client.bucket(self.bucket_name)

    def list(self) -> list[LandedFile]:
        out = []
        for blob in self._bucket().list_blobs(prefix=self.prefix):
            if not blob.name.endswith(self.suffix):
                continue
            path = f"gs://{self.bucket_name}/{blob.name}"
            self._blobs[path] = blob
            updated = getattr(blob, "updated", None)
            out.append(
                LandedFile(
                    path=path,
                    size=getattr(blob, "size", None),
                    modified=updated.timestamp() if updated else None,
                )
            )
        return sorted(out, key=lambda f: f.path)

    def fetch(self, f: LandedFile, dest: str) -> None:
        self._blobs[f.path].download_to_filename(dest)

    def mark_processed(self, f: LandedFile) -> None:
        blob = self._blobs[f.path]
        bucket = self._bucket()
        base = os.path.basename(blob.name)
        bucket.copy_blob(blob, bucket, f"{self.processed_prefix}/{base}")
        blob.delete()


@dataclass
class DriveSource:
    """Files in a Drive folder, moved to a processed folder after landing.

    ``service`` must expose the googleapiclient Drive v3 surface used
    here: ``service.files().list(q=..., fields=...).execute()`` →
    ``{"files": [{id, name, size, modifiedTime}]}``;
    ``service.files().get_media(fileId=...).execute()`` → bytes;
    ``service.files().update(fileId=..., addParents=...,
    removeParents=...).execute()`` (the reference's move-to-'procesados',
    `ingesta-drive-gcs/src/index.ts:41-139`).
    """

    folder_id: str
    processed_folder_id: str
    suffix: str = ".csv"
    service: object | None = None
    _ids: dict = field(default_factory=dict, repr=False)

    def _svc(self):
        if self.service is None:
            try:  # pragma: no cover - env without SDK
                from googleapiclient.discovery import build  # type: ignore

                self.service = build("drive", "v3")
            except ImportError as e:
                raise ImportError(
                    "googleapiclient is not installed; pass an explicit "
                    "service= (any object with the same surface) or "
                    "install the SDK"
                ) from e
        return self.service

    def list(self) -> list[LandedFile]:
        resp = (
            self._svc()
            .files()
            .list(
                q=f"'{self.folder_id}' in parents and trashed = false",
                fields="files(id, name, size, modifiedTime)",
            )
            .execute()
        )
        out = []
        for meta in resp.get("files", []):
            if not meta["name"].endswith(self.suffix):
                continue
            path = f"drive://{self.folder_id}/{meta['name']}"
            self._ids[path] = meta["id"]
            size = meta.get("size")
            out.append(
                LandedFile(path=path, size=int(size) if size else None)
            )
        return sorted(out, key=lambda f: f.path)

    def fetch(self, f: LandedFile, dest: str) -> None:
        content = (
            self._svc().files().get_media(fileId=self._ids[f.path]).execute()
        )
        with open(dest, "wb") as fh:
            fh.write(content)

    def mark_processed(self, f: LandedFile) -> None:
        (
            self._svc()
            .files()
            .update(
                fileId=self._ids[f.path],
                addParents=self.processed_folder_id,
                removeParents=self.folder_id,
            )
            .execute()
        )


def sync_remote_landing(source: RemoteSource, landing_dir: str) -> list[str]:
    """Fetch every listed remote file into ``landing_dir``; mark each
    original processed only AFTER its local copy landed (crash between
    the two → re-fetch on the next sync; the checkpointed ingest
    de-duplicates). Basename collisions fail loudly, as in
    :func:`~gcp_datalake_pipeline_spark.sources.listing.sync_landing`.
    Returns the landed local paths, ready for ``ingest()``.
    """
    os.makedirs(landing_dir, exist_ok=True)
    files = source.list()
    by_base: dict[str, list[str]] = {}
    for f in files:
        by_base.setdefault(os.path.basename(f.path), []).append(f.path)
    collisions = {b: ps for b, ps in by_base.items() if len(ps) > 1}
    if collisions:
        detail = "; ".join(f"{b}: {ps}" for b, ps in sorted(collisions.items()))
        raise ValueError(
            f"sync_remote_landing: basename collisions ({detail}); "
            "disambiguate sources before landing"
        )
    landed = []
    for f in files:
        dest = os.path.join(landing_dir, os.path.basename(f.path))
        # Fetch to a temp name and publish with an atomic rename: a crash
        # or network failure mid-download must never leave a truncated
        # file at the watched path — ingest would process the partial
        # file, record its basename in the manifest/checkpoint, and then
        # skip the complete re-fetch forever (silent data loss). Same
        # tmp-write+rename contract as the catalog's manifest swap.
        tmp = dest + ".part"
        try:
            source.fetch(f, tmp)
            os.replace(tmp, dest)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        landed.append(dest)
        source.mark_processed(f)
    return landed
