"""Per-file Bloom-filter indexes for point-predicate file skipping.

Min/max stats (``filestats.py``) prune range predicates, but on a
high-cardinality key that is scattered across files — a user id on an
events table, a document id on a corpus — every file's [min, max] spans
the whole key space and an ``=`` lookup (the GDPR delete, the point
SELECT) still opens every file. Delta's answer is a per-file Bloom
filter index; this module is that layer for
:class:`~.transactions.TransactionalCatalog`:

- **Build is distributed and JVM-hashed.** A Spark job over the freshly
  staged dir computes ``xxhash64(col)`` per row inside whole-stage
  codegen (no Python sees column data), and an Arrow-batched
  ``mapInPandas`` folds each batch's hashes into per-(file, column)
  partial bitmaps with vectorized numpy bit-ops. The driver ORs the
  partials — O(batches × columns) rows of m/8 bytes each, the same
  O(files) metadata class as the stats sidecar, never the data.
- **Probe is driver-side metadata.** A pure-Python xxHash64 (verified
  bit-for-bit against Spark's seed-42 implementation by a property
  test) hashes the predicate literal; membership is k bit tests against
  the sidecar bitmap. A bloom miss PROVES no row equals the literal —
  the file is skipped. Misses are only ever false-positive (file kept),
  so pruning stays a superset guarantee exactly like min/max.

The sidecar (``_file_blooms.json``) lives INSIDE each staged data dir
beside ``_file_stats.json`` and inherits the same atomicity: visible
with the commit, rides hardlink clones and time travel, reclaimed by
vacuum. Sizing is Delta-shaped: ``bits_per_row`` (default 10 ≈ 1% FPP)
× the file's row count, k by the optimal ``ln 2 · m/n``.

Supported column types are the high-cardinality-key ones — ``int``
(covers byte/short/int: Spark hashes all three via the 4-byte path),
``long``, ``string``. Range-friendly types (dates, timestamps) stay
with min/max where they already prune.

Reference boundary: the reference has no storage indexing at all (every
query re-reads PostgreSQL — ``etl-gcs-cloudsql/src/db.ts``); this is
the Spark-native point-lookup layer a 100 TB lake needs in its place.
"""

from __future__ import annotations

import base64
import json
import os

BLOOM_FILE = "_file_blooms.json"

_SEED = 42  # Spark's fixed xxhash64 seed

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = _SEED) -> int:
    """Standard XXH64 over ``data`` — bit-identical to Spark's
    ``org.apache.spark.sql.catalyst.expressions.XXH64`` byte path
    (``test_blooms`` pins parity against ``F.xxhash64`` for every
    supported type)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            k = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + k * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = ((h * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def spark_hash(value, spark_type: str) -> int | None:
    """``F.xxhash64(lit(value) cast spark_type)`` reproduced driver-side.
    Returns None when the value cannot be represented in the column's
    type (an ``=`` against it can still never be PROVEN absent — the
    caller keeps the file)."""
    if value is None:
        return None
    if spark_type == "string":
        if not isinstance(value, str):
            return None
        return xxh64(value.encode("utf-8"))
    if spark_type == "long":
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        if not (-(2**63) <= value < 2**63):
            return None
        return xxh64(value.to_bytes(8, "little", signed=True))
    if spark_type == "int":
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        if not (-(2**31) <= value < 2**31):
            return None
        return xxh64(value.to_bytes(4, "little", signed=True))
    return None


_TYPE_MAP = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "string": "string",
}


def normalize_type(spark_simple: str) -> str | None:
    """Map a Spark ``simpleString`` type to the sidecar's hash family,
    or None for unsupported (range-friendly / exotic) types."""
    return _TYPE_MAP.get(spark_simple)


def dir_bitmap_bytes(stats: dict | None, n_cols: int, bits_per_row: int) -> int:
    """Projected driver-side merge footprint of a bloom build over one
    dir: per file, the bitmap is ``m/8`` bytes with ``m ≈ rows ×
    bits_per_row`` (see :func:`_sizing`), and the driver holds one per
    (file, column) while ORing partials — so the total is
    ``Σ_files m/8 × n_cols ≈ total_rows × bits_per_row / 8 × n_cols``
    (e.g. 10 bits/row over a 10M-row dir and 2 columns ≈ 25 MB).
    Used by the ``max_bitmap_bytes`` guard."""
    if stats is None:
        return 0
    total = 0
    for entry in stats.get("files", {}).values():
        rows = entry.get("rows")
        if rows is None:
            continue
        m, _k = _sizing(rows, bits_per_row)
        total += (m // 8) * n_cols
    return total


def _sizing(rows: int, bits_per_row: int) -> tuple[int, int]:
    """(m bits, k probes) for a file of ``rows`` values: Delta-shaped
    bits-per-row sizing, k at the optimal ln2·m/n clamped to [1, 12]."""
    n = max(int(rows), 1)
    m = max(64, n * int(bits_per_row))
    m = (m + 63) // 64 * 64
    k = max(1, min(12, round(0.6931471805599453 * m / n)))
    return m, k


def _positions_np(hashes, m: int, k: int):
    """Vectorized double-hashing bit positions: h2 = (h >> 32) | 1 keeps
    the stride odd so the k probes never collapse onto one slot."""
    import numpy as np

    h = hashes.astype(np.uint64)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    out = []
    for i in range(k):
        out.append((h + np.uint64(i) * h2) % np.uint64(m))
    return out


def might_contain(entry: dict, value, spark_type: str) -> bool:
    """Conservative membership: False ONLY when the bitmap proves the
    value absent from the file."""
    h = spark_hash(value, spark_type)
    if h is None:
        return True
    m, k = entry["m"], entry["k"]
    bits = base64.b64decode(entry["b"])
    h2 = (h >> 32) | 1
    for i in range(k):
        # wrap mod 2^64 BEFORE the modulo: the build side's numpy uint64
        # arithmetic wraps, and m is not a power of two, so an unwrapped
        # Python-int sum would probe DIFFERENT bits for hashes near 2^64
        # and turn a false negative into a wrongly skipped file
        pos = ((h + i * h2) & _M64) % m
        if not bits[pos >> 3] & (1 << (pos & 7)):
            return False
    return True


# -- distributed build --------------------------------------------------------


def build_dir_blooms(
    spark,
    dir_path: str,
    columns: dict[str, str],
    stats: dict | None,
    bits_per_row: int = 10,
    reuse: dict[str, dict] | None = None,
) -> None:
    """Build ``_file_blooms.json`` for every data file under
    ``dir_path``. ``columns`` maps column name -> normalized hash type
    (from :func:`normalize_type`); ``stats`` is the dir's already-
    collected ``_file_stats.json`` dict (sizes each file's bitmap by
    its exact row count); ``reuse`` maps rel path -> prior bloom entry
    for hardlink-carried files (zero recompute, same contract as the
    stats ``reuse``).

    The job is one column-pruned scan: ``xxhash64`` runs JVM-side, the
    Arrow batches fold into per-batch partial bitmaps in numpy, and the
    driver ORs partials — no shuffle, no per-row Python.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    if stats is None or not columns:
        return
    sizes: dict[str, tuple[int, int]] = {}
    todo: dict[str, dict] = {}
    done: dict[str, dict] = {}
    for rel, entry in stats.get("files", {}).items():
        if reuse and rel in reuse:
            done[rel] = dict(reuse[rel])
            continue
        rows = entry.get("rows")
        if rows is None:
            continue  # unknown footer: no bloom, reader keeps the file
        sizes[rel] = _sizing(rows, bits_per_row)
        todo[rel] = entry
    base = os.path.abspath(dir_path)
    if todo:
        # read ONLY the files that actually need new bitmaps: hardlink-
        # carried files reuse their prior entries, and scanning the whole
        # dir would make a 1-file DML rewrite pay a full-table hash pass
        df = spark.read.option("basePath", base).parquet(
            *(os.path.join(base, rel) for rel in sorted(todo))
        )
        cols = [c for c in columns if c in df.columns]
        if cols:
            # hash under the recorded FAMILY type, not the file's
            # physical type: after a metadata type widening the old
            # files still hold the narrow physical values, and
            # xxhash64 is type-dependent — the explicit cast keeps
            # build and probe (spark_hash(value, family)) in the same
            # hash space regardless of per-file physical width. For
            # un-widened tables the cast is the identity (Spark hashes
            # byte/short/int identically), so existing sidecars stay
            # valid.
            sel = df.select(
                F.input_file_name().alias("_f"),
                *[
                    F.xxhash64(F.col(c).cast(columns[c])).alias(c)
                    for c in cols
                ],
            )
            sizes_b = dict(sizes)

            def fold(batches):
                partial: dict[tuple[str, str], "np.ndarray"] = {}
                for pdf in batches:
                    for fname, grp in pdf.groupby("_f", sort=False):
                        rel = _rel_of(fname, base)
                        mk = sizes_b.get(rel)
                        if mk is None:
                            continue
                        m, k = mk
                        for c in cols:
                            vals = grp[c].dropna().to_numpy(dtype="int64")
                            if not len(vals):
                                continue
                            key = (rel, c)
                            bm = partial.get(key)
                            if bm is None:
                                bm = np.zeros(m // 8, dtype=np.uint8)
                                partial[key] = bm
                            for pos in _positions_np(
                                vals.view(np.uint64), m, k
                            ):
                                np.bitwise_or.at(
                                    bm,
                                    (pos >> np.uint64(3)).astype(np.int64),
                                    (
                                        np.uint8(1)
                                        << (
                                            pos & np.uint64(7)
                                        ).astype(np.uint8)
                                    ),
                                )
                for (rel, c), bm in partial.items():
                    yield pd.DataFrame(
                        {"f": [rel], "c": [c], "b": [bm.tobytes()]}
                    )

            partials = sel.mapInPandas(
                fold, schema="f string, c string, b binary"
            ).collect()
            merged: dict[tuple[str, str], "np.ndarray"] = {}
            for row in partials:
                key = (row["f"], row["c"])
                b = np.frombuffer(row["b"], dtype=np.uint8)
                cur = merged.get(key)
                if cur is None:
                    merged[key] = b.copy()
                else:
                    np.bitwise_or(cur, b, out=cur)
            for rel in todo:
                m, k = sizes[rel]
                fe: dict[str, dict] = {}
                for c in cols:
                    bm = merged.get((rel, c))
                    if bm is None:
                        # no rows reached the fold (all-null or empty
                        # file): an all-zero bitmap — every probe misses,
                        # which is exact
                        bm = bytes(m // 8)
                    fe[c] = {
                        "t": columns[c],
                        "m": m,
                        "k": k,
                        "b": base64.b64encode(bytes(bm)).decode("ascii"),
                    }
                done[rel] = fe
    if not done:
        return
    payload = {
        "version": 1,
        "bits_per_row": bits_per_row,
        "columns": dict(columns),
        "files": done,
    }
    tmp = os.path.join(dir_path, BLOOM_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(dir_path, BLOOM_FILE))


def _rel_of(file_uri: str, base: str) -> str | None:
    """input_file_name() URI -> path relative to the staged dir."""
    from urllib.parse import unquote, urlparse

    p = file_uri
    if "://" in p:
        p = unquote(urlparse(p).path)
    try:
        rel = os.path.relpath(p, base)
    except ValueError:
        return None
    if rel.startswith(".."):
        return None
    return rel


def read_dir_blooms(dir_path: str) -> dict | None:
    try:
        with open(os.path.join(dir_path, BLOOM_FILE)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def attach_blooms(stats: dict | None, dir_path: str, dnf) -> dict | None:
    """Attach the dir's bloom entries onto its loaded stats dict (under
    each file entry's ``"bloom"`` key) — but ONLY when some disjunct
    carries an equality/IN predicate that could use them; otherwise the
    sidecar is never even opened. Returns ``stats`` (mutated) for
    chaining."""
    if stats is None:
        return None
    if not any(
        op in ("=", "==", "in") for conj in dnf for (_c, op, _v) in conj
    ):
        return stats
    blooms = read_dir_blooms(dir_path)
    if not blooms:
        return stats
    entries = stats.get("files", {})
    for rel, fe in blooms.get("files", {}).items():
        entry = entries.get(rel)
        if entry is not None:
            entry["bloom"] = fe
    return stats
