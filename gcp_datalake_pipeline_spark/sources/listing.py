"""Pluggable landing listers (SURVEY.md S2/S4/S5).

The reference's remote-source orchestration lists a Drive folder, copies
each file into the GCS landing bucket, then moves the original to a
'procesados' folder as the processed marker
(`ingesta-drive-gcs/src/index.ts:41-139`). This module keeps that shape
behind a small protocol so the transport is swappable:

- :class:`GlobLister` — local filesystem glob (this environment's default);
- :class:`StaticLister` — an explicit file list (event-driven parity: the
  reference gets exactly one file per trigger event);
- a GCS / Drive / S3 lister later is the same ~10 lines against its SDK —
  nothing else in the runner changes.

:func:`sync_landing` is the copy-then-move step itself, with the same
exactly-once-ish contract: a file is only moved to the processed dir after
its copy into landing succeeded, so a crash between the two re-syncs the
file (at-least-once), and the checkpointed streaming ingest de-duplicates
the replay (exactly-once end to end).
"""

from __future__ import annotations

import glob
import os
import shutil
from dataclasses import dataclass
from typing import Protocol


@dataclass(frozen=True)
class LandedFile:
    """One source file with the provenance the manifest records (S6)."""

    path: str
    size: int | None = None
    modified: float | None = None


class Lister(Protocol):
    def list(self) -> list[LandedFile]:  # pragma: no cover - protocol
        ...


@dataclass(frozen=True)
class GlobLister:
    """Local-filesystem lister: sorted glob + stat metadata."""

    pattern: str

    def list(self) -> list[LandedFile]:
        out = []
        for p in sorted(glob.glob(self.pattern)):
            st = os.stat(p)
            out.append(LandedFile(path=p, size=st.st_size, modified=st.st_mtime))
        return out


@dataclass(frozen=True)
class StaticLister:
    """Explicit file list — the per-event shape of the reference's trigger."""

    paths: tuple[str, ...]

    def list(self) -> list[LandedFile]:
        return [LandedFile(path=p) for p in self.paths]


def sync_landing(
    lister: Lister, landing_dir: str, processed_dir: str | None = None
) -> list[str]:
    """Copy every listed file into ``landing_dir``; move originals to
    ``processed_dir`` afterwards (the reference's 'procesados' marker).
    Returns the landed paths. Copy-before-move ordering makes a crash
    replay-safe (see module docstring)."""
    os.makedirs(landing_dir, exist_ok=True)
    if processed_dir:
        os.makedirs(processed_dir, exist_ok=True)
    files = lister.list()
    # Landing is keyed by basename: two listed files sharing one would
    # silently overwrite each other (and collide again in processed_dir).
    # That is data loss before ingest, so fail loudly instead.
    by_base: dict[str, list[str]] = {}
    for f in files:
        by_base.setdefault(os.path.basename(f.path), []).append(f.path)
    collisions = {b: ps for b, ps in by_base.items() if len(ps) > 1}
    if collisions:
        detail = "; ".join(f"{b}: {ps}" for b, ps in sorted(collisions.items()))
        raise ValueError(
            f"sync_landing: basename collisions in listing ({detail}); "
            "disambiguate sources before landing"
        )
    landed = []
    for f in files:
        dest = os.path.join(landing_dir, os.path.basename(f.path))
        shutil.copy2(f.path, dest)
        landed.append(dest)
        if processed_dir:
            shutil.move(f.path, os.path.join(processed_dir, os.path.basename(f.path)))
    return landed
