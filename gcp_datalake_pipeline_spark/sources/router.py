"""S9 — filename router + S5-style processed tracking.

Parity: `etl-gcs-cloudsql/src/index.ts:16-49` — a file is processed iff its
lowercased basename contains 'empresa' / 'conductor' / 'vehiculo' (first
match in that order) and ends with '.csv'; anything else is skipped.
Dependency ordering (§2.9): empresa files load before conductor/vehiculo
within a batch, because their FK checks reject unknown carriers.
"""

from __future__ import annotations

import os

ROUTES = ["empresa", "conductor", "vehiculo"]  # first match wins
# empresa first: conductor/vehiculo carrier lookups depend on it (J1).
PROCESS_ORDER = {"empresa": 0, "vehiculo": 1, "conductor": 2}


def route(name: str) -> str | None:
    """Return the processor name for a landing object, or None to skip."""
    base = os.path.basename(name).lower()
    if not base.endswith(".csv"):
        return None
    for r in ROUTES:
        if r in base:
            return r
    return None


def plan_batch(paths: list[str]) -> list[tuple[str, str]]:
    """Order a batch of landing files into (processor, path) steps,
    empresa files first (SURVEY.md §2.9 ordering)."""
    routed = [(route(p), p) for p in paths]
    steps = [(r, p) for r, p in routed if r is not None]
    return sorted(steps, key=lambda s: (PROCESS_ORDER[s[0]], s[1]))
