"""Atomic multi-table commits over the plain-Parquet catalog.

The reference commits each parent/child family inside one PostgreSQL
transaction (`etl-gcs-cloudsql/src/db.ts:24-46` — per-batch BEGIN/COMMIT
around the service upserts), so a crashed load never leaves a vehiculo
without its revision_tecnica rows. The plain :class:`~.storage.Catalog`
relaxes that (SURVEY.md §2.11): each table swap is atomic but a crash
BETWEEN two table writes leaves the first visible and the second missing.

:class:`TransactionalCatalog` closes the gap without Delta/Iceberg using
the manifest-pointer design those formats use underneath:

- every write STAGES its files under ``root/_loads/<load_id>/<table>.<n>``
  — staged data is invisible to readers;
- ``commit()`` publishes ALL tables of the load with ONE atomic
  ``os.replace`` of ``root/_MANIFEST.json`` (tmp-write + fsync + rename,
  the same single-filesystem rename contract the base overwrite swap
  already relies on);
- readers resolve ``table -> [data dirs]`` through the manifest, so they
  observe either the whole load or none of it. A crash mid-load leaves
  the previous manifest intact; orphaned staged dirs are garbage, not
  data, and ``vacuum()`` reclaims them.

At 100 TB this is exactly the lakehouse commit protocol: appends publish
new files by adding pointer entries (no data rewrite), and the bucketed
MERGE rewrites only touched ``_kb`` partitions, re-linking untouched
partition files into the new version (hardlinks locally; object-store
copies-by-reference / manifest reuse on GCS).

Inside an open transaction the catalog reads its own staged writes
(read-your-writes), so multi-step pipelines (get-or-create dim, then
back-join, then merge) run unchanged within one atomic load.

Every commit also retains its manifest under ``_versions/<n>.json``, so
``read_at(table, n)`` serves table-level time travel ("what did the lake
look like after load n") until ``vacuum(retain_versions=...)`` drops the
snapshot — the table-level complement of the row-level SCD2 history.
"""

from __future__ import annotations

import fcntl
import json
import os
import shutil
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from gcp_datalake_pipeline_spark import blooms, filestats
from gcp_datalake_pipeline_spark.storage import Catalog

_MANIFEST = "_MANIFEST.json"
_LOADS = "_loads"
_VERSIONS = "_versions"
_LOAD_IDS = "_load_ids"

# Constraint probes switch from join-shaped to literal-predicate-shaped
# below this many distinct staged keys: the keys are collected in one
# tiny job and the committed side is scanned with pushed-down equality
# predicates (row-group/stats pruned — probe cost scales with matching
# files, not table size). Above it, the original AQE-sized semi/anti
# joins run unchanged.
_SMALL_PROBE_KEYS = 64


def _literal_probe_safe(cols: list[str], key_rows) -> bool:
    """False when any key component is a float NaN: Spark's joins and
    groupBy normalize NaN (NaN groups/joins as equal to NaN), but a
    literal ``col == NaN`` comparison is false — the literal fast path
    would diverge, so such writes take the join path."""
    import math

    for r in key_rows:
        for c in cols:
            v = r[c]
            if isinstance(v, float) and math.isnan(v):
                return False
    return True


def _literal_key_cond(cols: list[str], key_rows):
    """OR-of-ANDs literal predicate matching any of ``key_rows`` on
    ``cols``, with eqNullSafe semantics (a NULL key component matches
    via IS NULL). Pushes to the parquet scan, unlike a join. Callers
    must gate on :func:`_literal_probe_safe` first (NaN keys)."""
    from pyspark.sql import functions as F

    cond = None
    for r in key_rows:
        leg = None
        for c in cols:
            v = r[c]
            piece = F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
            leg = piece if leg is None else leg & piece
        cond = leg if cond is None else cond | leg
    return F.lit(False) if cond is None else cond


def _sql_literal(v) -> str:
    """Render one collected key value as a Spark SQL literal that
    round-trips through ``F.expr`` (the ON UPDATE cascade legs embed
    old/new keys in a CASE expression). Key-typed scalars only —
    anything else refuses loudly rather than mis-quote."""
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        import math

        # bare 'inf'/'nan' tokens would parse as COLUMN names
        if math.isinf(v):
            return f"double('{'-' if v < 0 else ''}Infinity')"
        if math.isnan(v):
            return "double('NaN')"
        # shortest-repr round-trips through Double.parseDouble
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    raise ValueError(
        f"unsupported key literal type {type(v).__name__} for an "
        "ON UPDATE cascade leg"
    )


def merge_when_guards(
    table: str,
    tcols: list,
    key_cols: list,
    computed: set,
    src_cols: list,
    m_sets,
    i_cols,
    b_sets,
    star: bool,
    writes: bool,
    bucketed: bool,
) -> None:
    """The generalized-MERGE input refusals, in ONE body shared by the
    engine's real run (:meth:`TransactionalCatalog.merge_when`) and
    the SQL front door's EXPLAIN dry run — so the two can never
    diverge on what refuses. Pure-name checks only (no data read)."""
    for label, named, key_ok in (
        ("UPDATE SET", m_sets, False),
        ("INSERT", i_cols, True),
        ("BY SOURCE SET", b_sets, False),
    ):
        if not named:
            continue
        cols_l = list(named)
        bad = [c for c in cols_l if c not in tcols]
        if bad:
            raise ValueError(
                f"merge {label} column(s) {bad!r} not in {table!r}"
            )
        if not key_ok:
            # an INSERT list MUST be able to supply the new row's key;
            # an UPDATE SET must not move a matched row's
            bad = sorted(set(cols_l) & set(key_cols))
            if bad:
                raise ValueError(
                    f"merge {label} may not assign merge key "
                    f"column(s) {bad!r} (keys define the match; "
                    "rewrite keys with UPDATE)"
                )
        if computed:
            bad = sorted(set(cols_l) & computed)
            if bad:
                raise ValueError(
                    f"merge {label} column(s) {bad!r} of {table!r} "
                    "are GENERATED ALWAYS and cannot be assigned"
                )
    if star and computed:
        hit = sorted(computed & set(src_cols))
        if hit:
            raise ValueError(
                f"column(s) {hit!r} of {table!r} are GENERATED "
                "ALWAYS and cannot be merged from the source; "
                "omit them (matched rows keep their values, "
                "inserted rows mint/compute)"
            )
    if writes and computed:
        hit = sorted(computed & set(key_cols))
        if hit:
            raise ValueError(
                f"MERGE ON the GENERATED ALWAYS column(s) {hit!r} "
                "needs the source to carry them, which a writing "
                "merge refuses; merge on a natural key (or use "
                "WHEN MATCHED THEN DELETE, which never writes)"
            )
        if bucketed:
            raise ValueError(
                f"MERGE with engine-computed columns into the bucketed "
                f"table {table!r} is not supported; drop the bucket "
                "layout or the computed columns"
            )
    absent = [k for k in key_cols if k not in src_cols]
    if absent:
        raise ValueError(
            f"merge_when source lacks merge key column(s) {absent!r}"
        )
    if star:
        need = [c for c in tcols if c not in computed]
        absent = [c for c in need if c not in src_cols]
        if absent:
            raise ValueError(
                f"merge_when source lacks column(s) {absent!r} needed "
                f"by the UPDATE SET * / INSERT * clauses"
            )


def _merge_schema_json(old: dict | None, new: dict | None) -> dict | None:
    """Additive schema evolution over schema ``jsonValue()`` dicts: new
    columns append after existing ones; an existing column arriving with
    a DIFFERENT type fails the write (Delta-style enforcement — silent
    widening or reordering would corrupt readers). Nullability changes
    are tolerated (parquet files legitimately disagree on it)."""
    if old is None:
        return new
    if new is None:
        return old
    by_name = {f["name"]: f for f in old["fields"]}
    fields = list(old["fields"])
    for f in new["fields"]:
        prev = by_name.get(f["name"])
        if prev is None:
            fields.append(f)
        elif prev["type"] != f["type"]:
            raise ValueError(
                f"schema conflict on column {f['name']!r}: committed type "
                f"{prev['type']!r} vs incoming {f['type']!r}; appends may "
                "add columns but never change an existing column's type"
            )
    return {**old, "fields": fields}


class CheckViolation(RuntimeError):
    """Raised when a staged write contains rows that fail one of the
    table's CHECK constraints (:meth:`TransactionalCatalog.add_check`),
    or when ``add_check`` finds existing rows violating the new
    constraint. The write never publishes: the exception aborts the
    surrounding (auto-)transaction, the staged files roll back, and the
    manifest pointer is untouched."""


class ConcurrentWriteError(RuntimeError):
    """Raised at commit when another writer replaced a table this
    transaction overwrote/merged from a now-stale snapshot. Appends never
    conflict (they are published as deltas merged under the commit lock);
    replace-type writes use Delta-style conflict detection: re-read the
    pointer under the lock and fail if the table moved since this
    transaction first read it. The caller's remedy is retry-from-read."""


def _link_tree(src: str, dst: str) -> None:
    """Mirror ``src`` into ``dst`` via hardlinks (fallback: copy).

    Metadata-only on one filesystem — this is how an untouched MERGE
    partition is carried into the next table version without rewriting
    its bytes.
    """
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


@dataclass
class TransactionalCatalog(Catalog):
    """Catalog whose writes are staged and published atomically.

    Drop-in for :class:`Catalog`: outside an explicit transaction every
    write auto-commits (stage + immediate pointer swap), so existing
    pipelines run unchanged; wrap a load in :meth:`transaction` to make
    its table writes all-or-nothing.
    """

    # File-level min/max stats (data skipping): every staged dir gets a
    # ``_file_stats.json`` sidecar at write time (footer-only reads;
    # hardlink-carried MERGE partitions reuse the previous version's
    # entries — zero re-reads), and ``read(table, predicates=[...])``
    # prunes the scan to the files whose stats can match, Delta-style.
    # The sidecar lives INSIDE the immutable staged dir, so it inherits
    # commit atomicity and rides compaction, clones, time travel, and
    # vacuum for free.
    collect_stats: bool = True
    _pending: dict[str, list[str]] | None = field(default=None, repr=False)
    _load_id: str | None = field(default=None, repr=False)
    _stage_token: str | None = field(default=None, repr=False)
    _stage_seq: int = field(default=0, repr=False)
    _txn_dirs: list[str] = field(default_factory=list, repr=False)
    # Per-table write intent, resolved against a RE-READ manifest inside
    # the commit flock (the _pending list is only the read-your-writes
    # view and may be stale by commit time):
    #   {"mode": "append"|"replace", "base": list[str]|None, "added": [...]}
    # append-mode publishes current+added (lost-update-free: two
    # concurrent appenders both land); replace-mode publishes added but
    # fails with ConcurrentWriteError if the table's dir list moved from
    # "base" since this transaction first read it.
    _intents: dict[str, dict] = field(default_factory=dict, repr=False)
    # Bucket-layout sidecars staged by writes inside this transaction,
    # published under the commit flock AFTER conflict checks pass: a
    # transaction that loses its commit race must never overwrite the
    # winner's sidecar with a different modulus (later rounds would
    # bucket-prune with a modulus that disagrees with the committed _kb
    # layout and silently drop near-dup pairs).
    _staged_bucket_meta: dict[str, tuple[int, list[str]]] = field(
        default_factory=dict, repr=False
    )

    # -- manifest pointer ---------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def _plain_tables(self) -> list[str]:
        """Table dirs written by the PLAIN catalog (no manifest entry):
        the footgun of pointing a transactional catalog at a live plain
        root — those dirs would be invisible through the manifest."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            e
            for e in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, e))
            and not e.startswith("_")
            and not e.endswith(("__tmp", "__old"))
        )

    def _read_manifest(self, strict: bool = True) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            # No manifest + plain table dirs on disk = a live plain
            # catalog. Starting an empty manifest beside it would fork
            # the root: seen-file dedup resets, merges restart surrogate
            # ids at 1, and reads stop seeing committed data even though
            # it is still on disk. Refuse loudly; migrate_plain() adopts
            # the dirs as the initial snapshot.
            if strict and self._plain_tables():
                raise RuntimeError(
                    f"catalog root {self.root!r} contains plain table dirs "
                    "but no manifest; call migrate_plain() first (the CLI "
                    "does this automatically on `ingest --atomic`) so the "
                    "existing tables become the initial snapshot instead "
                    "of being silently shadowed"
                ) from None
            return {"version": 0, "tables": {}}

    def migrate_plain(self) -> list[str]:
        """Adopt a plain-catalog root for transactional use: commit the
        existing table dirs, in place (no data moved or rewritten), as
        manifest version 1. No-op when a manifest already exists. Returns
        the migrated table names."""
        if os.path.exists(self._manifest_path()):
            return []
        plain = self._plain_tables()
        if plain:
            self._publish(
                {t: [t] for t in plain},
                "migrate-plain",
                replace=True,
                strict=False,
            )
        return plain

    def _swap_manifest(self, manifest: dict) -> None:
        # tmp-write + fsync + atomic rename: the ONLY mutation readers can
        # observe. A crash anywhere before os.replace leaves the previous
        # pointer (and therefore the previous snapshot) fully intact.
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path())

    # -- read resolution ----------------------------------------------------

    def exists(self, table: str) -> bool:
        if self._pending is not None and table in self._pending:
            return True
        return table in self._read_manifest()["tables"]

    def tables(self) -> list[str]:
        names = set(self._read_manifest()["tables"])
        if self._pending is not None:
            names |= set(self._pending)
        return sorted(names)

    def _data_dirs(self, table: str) -> list[str]:
        if self._pending is not None and table in self._pending:
            rels = self._pending[table]
        else:
            rels = self._read_manifest()["tables"].get(table)
            if rels is None:
                raise FileNotFoundError(f"{table!r} not in manifest")
        return [os.path.join(self.root, r) for r in rels]

    def _stored_schema(self, table: str):
        """The committed (or, inside a txn, pending) schema for ``table``
        as a StructType, or None for pre-schema-tracking manifests."""
        from pyspark.sql import types as T

        sj = None
        if self._pending is not None and table in self._intents:
            intent = self._intents[table]
            if intent["mode"] == "append":
                sj = _merge_schema_json(
                    self._read_manifest().get("schemas", {}).get(table),
                    intent.get("schema"),
                )
            else:
                sj = intent.get("schema")
        if sj is None:
            sj = self._read_manifest().get("schemas", {}).get(table)
        return T.StructType.fromJson(sj) if sj is not None else None

    def _read_dirs(self, dirs: list[str], stored, dv: dict | None = None) -> DataFrame:
        """Scan a manifest dir list with the committed schema. Hive-
        partitioned dirs (the bucketed corpus layout: ``_kb=N`` subdirs
        per staged append) cannot share one multi-path partition
        discovery in Spark — each root is read separately and unioned;
        filters on the partition column still push into EVERY child scan
        (PartitionFilters per FileScan), so bucket pruning survives the
        union. ``dv`` (a :meth:`dv_info` entry) subtracts pending
        deletion vectors: each scan is annotated with its file/row
        identity BEFORE any union, anti-joined once, and stripped."""
        ann = self._dv_annotate if dv else (lambda df: df)

        def one(d: str) -> DataFrame:
            r = self.spark.read
            return ann(
                (r.schema(stored) if stored is not None else r).parquet(d)
            )

        partitioned = any(
            "=" in e
            for d in dirs
            if os.path.isdir(d)
            for e in os.listdir(d)
            if os.path.isdir(os.path.join(d, e))
        )
        if partitioned and len(dirs) > 1:
            out = one(dirs[0])
            for d in dirs[1:]:
                out = out.unionByName(one(d), allowMissingColumns=True)
        elif stored is not None:
            out = ann(self.spark.read.schema(stored).parquet(*dirs))
        elif len(dirs) > 1:
            out = ann(
                self.spark.read.option("mergeSchema", "true").parquet(*dirs)
            )
        else:
            out = ann(self.spark.read.parquet(*dirs))
        return self._dv_strip(out, dv) if dv else out

    def read(self, table: str, schema=None, predicates=None) -> DataFrame:
        """Read through the manifest. The COMMITTED schema (recorded at
        every write, additively merged across appends) drives the scan:
        appends that added columns project correctly (missing columns in
        older files read as NULL) instead of silently losing them to
        whichever footer Spark sampled — and no footer merging is ever
        needed, which at 100 TB is the difference between an O(1)
        metadata read and opening every file's footer. Manifests from
        before schema tracking fall back to mergeSchema across dirs.

        ``predicates`` (``[(col, op, value), ...]`` with ops ``= != <
        <= > >= in is_null not_null``) turns on FILE SKIPPING: each data
        dir's ``_file_stats.json`` sidecar (collected at write time) is
        evaluated conservatively and only the files whose min/max ranges
        can match are handed to Spark — the Delta/Iceberg data-skipping
        read, so a selective 100 TB lookup opens the three files it
        needs instead of every footer. The EXACT predicate is always
        re-applied as a Spark filter on the survivors (pruning is a
        superset guarantee, never the answer), so results are identical
        to an unpruned read + filter; files without stats are always
        kept. ``predicates`` may also be a LIST of conjunctions (DNF,
        as in :meth:`delete_where`): candidates are the union of each
        branch's files and the residual filter is the OR."""
        if not self.exists(table):
            if schema is None:
                raise FileNotFoundError(table)
            return self.spark.createDataFrame([], schema)
        dirs = self._data_dirs(table)
        stored = self._stored_schema(table)
        cmap = self.colmap(table)
        if not dirs:
            # a truncated (or created-empty) table: zero data dirs, but
            # the committed schema still types the empty relation
            if stored is None and schema is None:
                raise FileNotFoundError(
                    f"{table!r} has no data dirs and no committed schema"
                )
            return self.spark.createDataFrame(
                [], self.logical_schema(table) or schema
            )
        dv = self.dv_info(table)
        if predicates is None:
            return self._to_logical(self._read_dirs(dirs, stored, dv=dv), cmap)
        dnf = self._as_dnf(predicates)
        # pruning speaks the files' PHYSICAL names; the exact residual
        # filter runs on the re-labeled logical relation
        pdnf = self._phys_dnf(cmap, dnf)
        df = self._read_dirs_pruned(dirs, stored, pdnf, dv=dv)
        return self._to_logical(df, cmap).filter(filestats.dnf_condition(dnf))

    def _dir_parquet_files(self, d: str) -> list[str]:
        """Relative paths of the data files under one staged dir, in a
        stable order."""
        out = []
        for root, _dirs, names in os.walk(d):
            for name in names:
                if name.endswith(".parquet"):
                    out.append(
                        os.path.relpath(os.path.join(root, name), d)
                    )
        return sorted(out)

    def _read_dirs_pruned(
        self, dirs: list[str], stored, dnf: list[list[tuple]],
        dv: dict | None = None,
    ) -> DataFrame:
        """Stats-pruned scan over a manifest dir list. Per dir: load the
        sidecar, keep the files whose stats can match ANY disjunct, and
        read ONLY those (``basePath`` preserves Hive partition columns).
        A dir with no sidecar keeps all its files; a dir with zero
        surviving files contributes nothing to the plan. ``dv``
        subtracts pending deletion vectors (stats stay a superset of
        the live rows, so pruning needs no DV awareness)."""
        ann = self._dv_annotate if dv else (lambda df: df)
        parts: list[DataFrame] = []
        for d in dirs:
            stats = blooms.attach_blooms(
                filestats.read_dir_stats(d), d, dnf
            )
            all_files = self._dir_parquet_files(d)
            kept = filestats.prune_files_dnf(stats, all_files, dnf)
            if not kept:
                continue
            if len(kept) == len(all_files):
                # dirs arrive one at a time here, so _read_dirs takes
                # its single-scan branch and the annotation can attach
                # post-hoc — the vectors strip ONCE after the union
                parts.append(ann(self._read_dirs([d], stored)))
                continue
            r = self.spark.read.option("basePath", d)
            if stored is not None:
                r = r.schema(stored)
            parts.append(ann(r.parquet(*(os.path.join(d, f) for f in kept))))
        if not parts:
            # every file provably mismatches: an empty relation with the
            # committed schema (falling back to a false-filtered full
            # scan only for pre-schema-tracking manifests)
            if stored is not None:
                return self.spark.createDataFrame([], stored)
            from pyspark.sql import functions as F

            return self._read_dirs(dirs, None).where(F.lit(False))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return self._dv_strip(out, dv) if dv else out

    def pruned_files(
        self, table: str, predicates, version: int | None = None
    ) -> tuple[list[str], int]:
        """Observability/test contract for file skipping: the absolute
        file paths a ``read(table, predicates=...)`` would hand to Spark
        and the total file count behind the table (``version`` resolves
        against a retained snapshot instead of the current pointer)."""
        dnf = self._phys_dnf(
            self.colmap(table, version=version), self._as_dnf(predicates)
        )
        if version is None:
            dirs = self._data_dirs(table)
        else:
            dirs = self._version_dirs(table, version)
        kept_all: list[str] = []
        total = 0
        for d in dirs:
            stats = blooms.attach_blooms(
                filestats.read_dir_stats(d), d, dnf
            )
            all_files = self._dir_parquet_files(d)
            total += len(all_files)
            kept_all.extend(
                os.path.join(d, f)
                for f in filestats.prune_files_dnf(stats, all_files, dnf)
            )
        return kept_all, total

    # -- staged writes ------------------------------------------------------

    def _stage_dir(self, table: str) -> str:
        # _stage_token (not the raw load_id) names the staging dir: two
        # transactions reusing one load_id (e.g. the same file re-ingested)
        # must never stage into — and overwrite — a committed dir.
        rel = os.path.join(
            _LOADS, self._stage_token, f"{table}.{self._stage_seq}"
        )
        self._stage_seq += 1
        self._txn_dirs.append(rel)
        return rel

    def _write_stage_stats(
        self,
        rel: str,
        reuse: dict[str, dict] | None = None,
        table: str | None = None,
        bloom_reuse: dict[str, dict] | None = None,
    ) -> None:
        """Per-file min/max stats sidecar for a freshly staged dir
        (footer-only reads) — plus, when ``table`` carries a bloom
        index, the per-file bloom sidecar (one distributed JVM-hashed
        pass over the staged files; hardlink-carried files reuse their
        prior entries via ``bloom_reuse``). Best-effort: a stats
        failure must never fail a write — readers treat a missing
        sidecar as keep-everything."""
        if not self.collect_stats:
            return
        d = os.path.join(self.root, rel)
        try:
            filestats.write_dir_stats(d, reuse=reuse)
        except Exception:
            pass
        if table is None:
            return
        cfg = self.bloom_index(table)
        if not cfg:
            return
        try:
            st = filestats.read_dir_stats(d)
            cap = cfg.get("max_bitmap_bytes")
            if cap and (
                blooms.dir_bitmap_bytes(
                    st, len(cfg["columns"]), cfg.get("bits_per_row", 10)
                )
                > cap
            ):
                # over the recorded driver budget: skip this dir's
                # bloom build — sidecars are best-effort acceleration
                # and a missing one just means readers keep its files
                return
            blooms.build_dir_blooms(
                self.spark,
                d,
                cfg["columns"],
                st,
                bits_per_row=cfg.get("bits_per_row", 10),
                reuse=bloom_reuse,
            )
        except Exception:
            pass

    def _require_txn(self):
        """Auto-commit context: wrap a bare write in its own transaction."""
        if self._pending is not None:
            return None  # caller is inside an explicit transaction
        return self.transaction(f"auto-{uuid.uuid4().hex[:12]}")

    def _committed_rels(self, table: str) -> list[str] | None:
        """The COMMITTED dir list (ignoring this txn's pending view) —
        the snapshot replace-mode conflict detection is anchored to."""
        return self._read_manifest()["tables"].get(table)

    def _note_replace(self, table: str, rel: str, schema=None) -> None:
        prior = self._intents.get(table)
        # base = the committed list at FIRST touch in this txn; a later
        # overwrite of an already-touched table keeps that anchor.
        base = prior["base"] if prior else self._committed_rels(table)
        self._intents[table] = {
            "mode": "replace",
            "base": base,
            "added": [rel],
            "schema": schema.jsonValue() if schema is not None else None,
        }
        if prior:
            # create-time registrations staged EARLIER IN THIS TXN
            # (a table CREATEd in a BEGIN block, then content-replaced
            # by a merge) must survive the new intent — for a
            # block-created table they exist nowhere else, and losing
            # them silently publishes the table without its identity /
            # generated columns
            for k in ("identity", "generated"):
                if k in prior and k not in self._intents[table]:
                    self._intents[table][k] = prior[k]

    def _note_append(self, table: str, rel: str, schema=None) -> None:
        sj = schema.jsonValue() if schema is not None else None
        prior = self._intents.get(table)
        if prior is None:
            self._intents[table] = {
                "mode": "append",
                "base": self._committed_rels(table),
                "added": [rel],
                "schema": sj,
            }
        else:
            # append after overwrite/merge stays replace-mode (the new
            # dir lands on top of this txn's replacement, not the
            # committed list); append after append accumulates the delta.
            prior["added"].append(rel)
            if sj is not None:
                prior["schema"] = _merge_schema_json(prior.get("schema"), sj)

    def _write_bucket_meta(
        self, table: str, num_buckets: int, key_cols: list[str]
    ) -> None:
        # Inside a transaction the sidecar is STAGED and published with
        # the commit (under the flock, after conflict checks) — see
        # _staged_bucket_meta. Outside, write-through as the plain
        # catalog does.
        if self._pending is not None:
            self._staged_bucket_meta[table] = (num_buckets, list(key_cols))
            return
        super()._write_bucket_meta(table, num_buckets, key_cols)

    def bucket_meta(self, table: str) -> dict | None:
        # a layout staged by THIS open transaction is already visible
        # to its own later writes (read-your-writes, like _pending)
        if self._pending is not None:
            staged = self._staged_bucket_meta.get(table)
            if staged is not None:
                return {"num_buckets": staged[0], "key_cols": staged[1]}
        return super().bucket_meta(table)

    def overwrite_bucketed(
        self,
        df: DataFrame,
        table: str,
        num_buckets: int,
        key_cols: list[str],
    ) -> None:
        # data + bucket-meta sidecar in ONE commit (the sidecar stages
        # via _staged_bucket_meta and publishes under the flock after
        # conflict checks) — no crash window that strands the table
        # unbucketed
        auto = self._require_txn()
        if auto is not None:
            with auto:
                super().overwrite_bucketed(df, table, num_buckets, key_cols)
            return
        super().overwrite_bucketed(df, table, num_buckets, key_cols)

    def overwrite(
        self, df: DataFrame, table: str, partition_cols: list[str] | None = None
    ) -> None:
        auto = self._require_txn()
        if auto is not None:
            with auto:
                self.overwrite(df, table, partition_cols)
            return
        # parent-side FK RESTRICT: a content replace may remove keys —
        # keys present now but absent from the new content must not be
        # referenced by any child row (O(distinct keys), not O(child))
        if self.exists(table):
            for pcols in self._fk_parent_specs(table):
                removed = (
                    self.read(table)
                    .select(*pcols)
                    .distinct()
                    .join(df.select(*pcols).distinct(), pcols, "left_anti")
                )
                # self-FK: old referencing rows die with the old
                # content; the new content validates against itself
                self._refuse_fk_orphans(
                    table, removed, pcols, "OVERWRITE", self_rows=None
                )
        df = self._to_physical_frame(df, self.colmap(table))
        rel = self._stage_dir(table)
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(os.path.join(self.root, rel))
        # content replace: staged rows ARE the table — no cross-key
        # probe, and a self-FK probes staged-vs-staged (old keys die
        # with the old content)
        self._enforce_checks(
            table,
            os.path.join(self.root, rel),
            cross_table=False,
            fk_staged_only=True,
        )
        self._write_stage_stats(rel, table=table)
        self._pending[table] = [rel]
        self._note_replace(table, rel, schema=df.schema)

    def append(
        self,
        df: DataFrame,
        table: str,
        partition_cols: list[str] | None = None,
        unique_cross: bool = True,
    ) -> None:
        # An append publishes NEW files only — the pointer list grows by
        # one staged dir and existing data is never rewritten (the 100 TB
        # append path; compact_table folds the list back to one dir).
        # ``unique_cross=False`` skips the UNIQUE constraints' existing-
        # key probe — ONLY for writes whose keys are simultaneously
        # retired in the same commit (the DV update's in-place images).
        auto = self._require_txn()
        if auto is not None:
            with auto:
                self.append(df, table, partition_cols, unique_cross)
            return
        df = self._to_physical_frame(df, self.colmap(table))
        if self._pending is not None and table in self._pending:
            prev = list(self._pending[table])
        else:
            prev = list(self._read_manifest()["tables"].get(table, []))
        rel = self._stage_dir(table)
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(os.path.join(self.root, rel))
        self._enforce_checks(
            table, os.path.join(self.root, rel), cross_table=unique_cross
        )
        self._write_stage_stats(rel, table=table)
        self._pending[table] = prev + [rel]
        self._note_append(table, rel, schema=df.schema)

    def _write_bucketed_merge(
        self,
        merged: DataFrame,
        table: str,
        replaced: list[int] | None = None,
    ) -> None:
        """Versioned replacement for dynamic partition overwrite: touched
        ``_kb`` partitions are written to the new staged version, untouched
        partitions are hardlinked in from the current version. Readers flip
        to the complete new version at commit.

        ``replaced`` lists bucket ids the caller REPLACED even if
        ``merged`` holds no rows for them — a CDC apply that deletes a
        bucket's every key produces no ``_kb=i`` output dir, and the
        hardlink carry would silently resurrect the old files without
        this (a merge-upsert never empties a bucket, so it can leave
        this None)."""
        auto = self._require_txn()
        if auto is not None:
            with auto:
                self._write_bucketed_merge(merged, table, replaced)
            return
        merged = self._to_physical_frame(
            merged, self.colmap(table) if self.exists(table) else None
        )
        prev = self._data_dirs(table) if self.exists(table) else []
        if len(prev) > 1:
            raise ValueError(
                f"bucketed table {table!r} has {len(prev)} data dirs "
                "(appended without merge); OPTIMIZE/compact it back to one dir first (the fold is partition-wise and keeps the _kb layout)"
            )
        rel = self._stage_dir(table)
        stage = os.path.join(self.root, rel)
        merged.write.mode("overwrite").partitionBy("_kb").parquet(stage)
        # the buckets this merge actually rewrote — captured BEFORE the
        # hardlink carries land in the stage (the commit-time conflict
        # check rebases onto concurrent commits touching only DISJOINT
        # buckets; see _bucket_rebase)
        touched_buckets = sorted(
            {d for d in os.listdir(stage) if d.startswith("_kb=")}
            | {f"_kb={b}" for b in (replaced or ())}
        )
        # checks run BEFORE hardlinking untouched partitions in. A merge
        # re-states the touched buckets' keys by construction, so the
        # cross probe is scoped to the CARRIED buckets only (via
        # exclude_buckets): that is exactly where an upserted row with a
        # UNIQUE value on a non-bucket-key column could otherwise land a
        # silent duplicate.
        self._enforce_checks(
            table,
            stage,
            cross_table=False,
            exclude_buckets=[
                int(d.split("=", 1)[1]) for d in touched_buckets
            ],
        )
        # parent-side FK RESTRICT: a merge (or bucketed merge-delete)
        # may RETIRE keys from the touched buckets — keys present there
        # now but absent from the staged replacement must not be
        # referenced by children. O(touched buckets), never the table.
        pspecs = self._fk_parent_specs(table) if prev else []
        if pspecs:
            from pyspark.sql import functions as F

            tb = [int(d.split("=", 1)[1]) for d in touched_buckets]
            old_touched = self.read(table).where(F.col("_kb").isin(tb))
            staged_df = self._to_logical(
                self.spark.read.parquet(stage), self.colmap(table)
            )
            # self-FK post-state children: staged restatement of the
            # touched buckets ∪ hardlink-carried (untouched) buckets
            post_self = staged_df.unionByName(
                self.read(table).where(~F.col("_kb").isin(tb)),
                allowMissingColumns=True,
            )
            for pcols in pspecs:
                removed = (
                    old_touched.select(*pcols)
                    .distinct()
                    .join(
                        staged_df.select(*pcols).distinct(),
                        pcols,
                        "left_anti",
                    )
                )
                self._refuse_fk_orphans(
                    table,
                    removed,
                    pcols,
                    "merge into",
                    self_rows=post_self,
                )
        reuse = None
        bloom_reuse = None
        if prev:
            skip = {d for d in os.listdir(stage) if d.startswith("_kb=")}
            skip |= {f"_kb={b}" for b in (replaced or ())}
            linked = set()
            for d in os.listdir(prev[0]):
                if d.startswith("_kb=") and d not in skip:
                    _link_tree(os.path.join(prev[0], d), os.path.join(stage, d))
                    linked.add(d)
            # untouched partitions carried by hardlink reuse their stats
            # entries verbatim: re-stating a 100 TB table's unchanged
            # files must cost zero footer reads
            prev_stats = filestats.read_dir_stats(prev[0]) if linked else None
            if prev_stats is not None:
                reuse = {
                    r: e
                    for r, e in prev_stats.get("files", {}).items()
                    if r.split(os.sep, 1)[0] in linked
                }
            prev_blooms = (
                blooms.read_dir_blooms(prev[0]) if linked else None
            )
            if prev_blooms is not None:
                bloom_reuse = {
                    r: e
                    for r, e in prev_blooms.get("files", {}).items()
                    if r.split(os.sep, 1)[0] in linked
                }
        self._write_stage_stats(
            rel, reuse=reuse, table=table, bloom_reuse=bloom_reuse
        )
        self._pending[table] = [rel]
        self._note_replace(table, rel, schema=merged.schema)
        self._intents[table]["touched_buckets"] = touched_buckets

    def _bucket_rebase(self, table: str, intent: dict, cur: list) -> bool:
        """Bucket-granular optimistic concurrency (runs UNDER the commit
        flock): a bucketed merge whose base snapshot moved underneath it
        may still commit IF every bucket the other commits changed is
        DISJOINT from the buckets this merge touched — the carried
        (hardlinked) buckets in our staged dir are then re-linked from
        the CURRENT snapshot, so the other writer's rows ride into our
        version instead of being silently rolled back. Two CDC pumps
        (or a pump and a matview refresh) hitting different key ranges
        of one table no longer serialize through retries — the Delta
        partition-granular conflict story, at `_kb` granularity.

        Returns False (→ the plain ConcurrentWriteError) for anything
        outside the safe shape: non-bucketed intents, multi-dir
        snapshots, pending deletion vectors, schema drift, stray
        unpartitioned files, or a true bucket overlap."""
        touched = set(intent.get("touched_buckets") or ())
        base = intent.get("base")
        if (
            not touched
            or base is None
            or cur is None
            or len(base) != 1
            or len(cur) != 1
            or len(intent.get("added") or ()) != 1
        ):
            return False
        base_dir = os.path.join(self.root, base[0])
        cur_dir = os.path.join(self.root, cur[0])
        if not (os.path.isdir(base_dir) and os.path.isdir(cur_dir)):
            return False

        def bucket_files(d):
            out: dict[str, set] = {}
            for f in self._dir_parquet_files(d):
                part = next(
                    (s for s in f.split(os.sep) if s.startswith("_kb=")),
                    None,
                )
                if part is None:
                    return None  # unpartitioned stray: not rebasable
                out.setdefault(part, set()).add(
                    (os.stat(os.path.join(d, f)).st_ino, f)
                )
            return out

        b_base = bucket_files(base_dir)
        b_cur = bucket_files(cur_dir)
        if b_base is None or b_cur is None:
            return False
        changed = {
            p
            for p in set(b_base) | set(b_cur)
            if b_base.get(p) != b_cur.get(p)
        }
        if changed & touched:
            return False  # true overlap: the caller's refusal stands
        stage = os.path.join(self.root, intent["added"][0])
        staged_stats = (filestats.read_dir_stats(stage) or {}).get(
            "files", {}
        )
        staged_blooms = (blooms.read_dir_blooms(stage) or {}).get(
            "files", {}
        )
        cur_stats = (filestats.read_dir_stats(cur_dir) or {}).get(
            "files", {}
        )
        cur_blooms = (blooms.read_dir_blooms(cur_dir) or {}).get(
            "files", {}
        )
        # re-carry: every non-touched bucket now links from CURRENT
        for p in list(os.listdir(stage)):
            if p.startswith("_kb=") and p not in touched:
                shutil.rmtree(os.path.join(stage, p))
        reuse: dict = {}
        bloom_reuse: dict = {}
        for f, e in staged_stats.items():
            if f.split(os.sep, 1)[0] in touched:
                reuse[f] = e
        for f, e in staged_blooms.items():
            if f.split(os.sep, 1)[0] in touched:
                bloom_reuse[f] = e
        for p, files in b_cur.items():
            if p in touched:
                continue
            for _ino, f in files:
                dst = os.path.join(stage, f)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.link(os.path.join(cur_dir, f), dst)
                if f in cur_stats:
                    reuse[f] = cur_stats[f]
                if f in cur_blooms:
                    bloom_reuse[f] = cur_blooms[f]
        self._write_stage_stats(
            intent["added"][0], reuse=reuse or None, table=table,
            bloom_reuse=bloom_reuse or None,
        )
        return True

    # -- transaction lifecycle ----------------------------------------------

    def begin(self, load_id: str | None = None) -> "TransactionalCatalog":
        if self._pending is not None:
            raise RuntimeError(
                f"transaction {self._load_id!r} already open; nested "
                "transactions are not supported"
            )
        self._pending = {}
        self._load_id = load_id or f"load-{uuid.uuid4().hex[:12]}"
        self._stage_token = f"{self._load_id}.{uuid.uuid4().hex[:8]}"
        self._stage_seq = 0
        self._txn_dirs = []
        self._intents = {}
        self._staged_bucket_meta = {}
        return self

    def commit(self) -> None:
        if self._pending is None:
            raise RuntimeError("no open transaction to commit")
        self._publish(
            self._intents,
            self._load_id,
            replace=False,
            bucket_meta=self._staged_bucket_meta or None,
        )
        self._pending = None
        self._load_id = None
        self._intents = {}
        self._staged_bucket_meta = {}

    def _publish(
        self,
        tables: dict,
        load_id: str,
        replace: bool,
        strict: bool = True,
        schemas: dict | None = None,
        bucket_meta: dict | None = None,
        checks: dict | None = None,
        layouts: dict | None = None,
        blooms_cfg: dict | None = None,
        views: dict | None = None,
        streams: dict | None = None,
        dvs: dict | None = None,
        colmaps: dict | None = None,
        properties: dict | None = None,
    ) -> None:
        # The read-modify-write of the manifest must be serialized across
        # committers, or two concurrent commits based on the same version
        # would each publish a manifest missing the other's tables. An
        # exclusive flock held across read -> version-write -> swap gives
        # optimistic writers a total order on one host (data staging stays
        # fully concurrent — only the pointer update serializes); on an
        # object store the equivalent is a conditional put of the pointer.
        #
        # With replace=False, ``tables`` is the intent map and is resolved
        # against a manifest RE-READ inside the lock: append intents merge
        # their delta onto whatever is committed NOW (two concurrent
        # appenders to one table both land — no lost update), while
        # replace intents (overwrite / bucketed merge, i.e. writes derived
        # from a read of the table) conflict-check that the table's dir
        # list still equals the snapshot this txn first read, Delta-style.
        os.makedirs(self.root, exist_ok=True)
        lock_path = os.path.join(self.root, "_commit.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            manifest = self._read_manifest(strict=strict)
            manifest["version"] += 1
            manifest["load_id"] = load_id
            manifest["committed_at"] = time.time()
            if replace:
                manifest["tables"] = dict(tables)
                if schemas is not None:
                    manifest["schemas"] = dict(schemas)
                if checks is not None:
                    manifest["checks"] = dict(checks)
                if layouts is not None:
                    manifest["layouts"] = dict(layouts)
                if blooms_cfg is not None:
                    manifest["blooms"] = dict(blooms_cfg)
                if views is not None:
                    manifest["views"] = dict(views)
                if streams is not None:
                    manifest["streams"] = dict(streams)
                if dvs is not None:
                    manifest["dvs"] = dict(dvs)
                if not manifest.get("dvs"):
                    manifest.pop("dvs", None)
                if colmaps is not None:
                    manifest["colmaps"] = dict(colmaps)
                if not manifest.get("colmaps"):
                    manifest.pop("colmaps", None)
                if properties is not None:
                    manifest["properties"] = dict(properties)
                if not manifest.get("properties"):
                    manifest.pop("properties", None)
            else:
                mschemas = manifest.setdefault("schemas", {})
                for table, intent in tables.items():
                    cur = manifest["tables"].get(table)
                    dv_add = intent.get("dv_add")
                    if dv_add is not None:
                        # a vector references basenames of the snapshot
                        # it was computed from: a rewrite OR another
                        # vector landing since then must conflict, never
                        # silently dangle (the rows would resurrect)
                        mdvs = manifest.setdefault("dvs", {})
                        cur_dv = mdvs.get(table) or {"dirs": [], "files": {}}
                        if (
                            cur != dv_add["expect_tables"]
                            or cur_dv["dirs"] != dv_add["expect_dirs"]
                        ):
                            raise ConcurrentWriteError(
                                f"table {table!r} was modified by another "
                                "writer since this merge-on-read DML read "
                                "it; retry from a fresh read"
                            )
                    if "layout" in intent:
                        # clustering spec recorded (compact) or restored
                        # (restore_table); None clears a stale record
                        mlay = manifest.setdefault("layouts", {})
                        if intent["layout"] is None:
                            mlay.pop(table, None)
                        else:
                            mlay[table] = intent["layout"]
                    if "bloom" in intent:
                        # bloom-index config restored with its snapshot
                        # (None clears a record the snapshot predates)
                        mbl = manifest.setdefault("blooms", {})
                        if intent["bloom"] is None:
                            mbl.pop(table, None)
                        else:
                            mbl[table] = intent["bloom"]
                    if "colmap" in intent:
                        # column-mapping state restored with a snapshot
                        # (restore_table) or rewritten by a retiring
                        # compact; None clears a record the new state
                        # has no use for
                        mcm = manifest.setdefault("colmaps", {})
                        if intent["colmap"] is None:
                            mcm.pop(table, None)
                        else:
                            mcm[table] = intent["colmap"]
                        if not manifest.get("colmaps"):
                            manifest.pop("colmaps", None)
                    if "view" in intent:
                        # materialized-view spec (+ its as_of high-water
                        # version) commits ATOMICALLY with the view
                        # table's data — a crash can never leave
                        # refreshed data with a stale watermark (which
                        # would double-apply the next feed)
                        mv = manifest.setdefault("views", {})
                        if intent["view"] is None:
                            mv.pop(table, None)
                        else:
                            mv[table] = intent["view"]
                    if "generated" in intent:
                        # computed-column exprs, registered with the
                        # create commit (set-once; no expect check)
                        manifest.setdefault("generated", {})[table] = (
                            dict(intent["generated"])
                        )
                    if "identity" in intent:
                        # identity high-water mark, committed ATOMICALLY
                        # with the assigned rows and expect-checked:
                        # two concurrent identity INSERTs would
                        # otherwise mint overlapping id ranges
                        mid = manifest.setdefault("identity", {})
                        upd = intent["identity"]
                        cur_id = mid.get(table)
                        cur_next = (
                            cur_id["next"] if cur_id is not None else None
                        )
                        if cur_next != upd["expect_next"]:
                            raise ConcurrentWriteError(
                                f"identity column of {table!r} was "
                                f"advanced by another writer (expected "
                                f"next id {upd['expect_next']!r}, found "
                                f"{cur_next!r}); retry from a fresh read"
                            )
                        mid[table] = {
                            "col": upd["col"], "next": upd["next"],
                        }
                    if "stream" in intent:
                        # change-feed consumer watermark(s), committed
                        # ATOMICALLY with the applied writes AND
                        # conflict-checked against the watermark this
                        # pump read: two concurrent pumps of one
                        # consumer would otherwise BOTH land their
                        # appends — a double apply with no error
                        ms = manifest.setdefault("streams", {})
                        for cname, upd in intent["stream"].items():
                            cur_wm = ms.get(cname)
                            cur_v = (
                                cur_wm["as_of"]
                                if cur_wm is not None
                                else None
                            )
                            if cur_v != upd["expect_as_of"]:
                                raise ConcurrentWriteError(
                                    f"change-feed consumer {cname!r} was "
                                    f"advanced by another pump (expected "
                                    f"watermark {upd['expect_as_of']!r}, "
                                    f"found {cur_v!r}); retry from a "
                                    "fresh read"
                                )
                            if upd["set"] is None:
                                ms.pop(cname, None)
                            else:
                                ms[cname] = dict(upd["set"])
                    if intent["mode"] == "append":
                        manifest["tables"][table] = list(cur or []) + list(
                            intent["added"]
                        )
                        if intent.get("schema") is not None:
                            # committed-schema merge under the lock: two
                            # concurrent appends with different NEW
                            # columns both land, like the dir lists.
                            mschemas[table] = _merge_schema_json(
                                mschemas.get(table), intent["schema"]
                            )
                    elif intent["mode"] == "dv":
                        pass  # vector-only commit: dir list unchanged
                    else:
                        if cur != intent["base"]:
                            # bucket-granular resolution: a bucketed
                            # merge rebases onto commits that touched
                            # only DISJOINT buckets (no pending
                            # vectors, no schema drift) — otherwise
                            # the classic refusal
                            rebased = (
                                not manifest.get("dvs", {}).get(table)
                                and (
                                    intent.get("schema") is None
                                    or manifest.get("schemas", {}).get(
                                        table
                                    )
                                    == intent["schema"]
                                )
                                and self._bucket_rebase(
                                    table, intent, cur
                                )
                            )
                            if not rebased:
                                raise ConcurrentWriteError(
                                    f"table {table!r} was modified by "
                                    f"another writer since this "
                                    f"transaction read it (expected "
                                    f"dirs {intent['base']!r}, found "
                                    f"{cur!r}); retry the load from a "
                                    "fresh read"
                                )
                        manifest["tables"][table] = list(intent["added"])
                        if intent.get("schema") is not None:
                            mschemas[table] = intent["schema"]
                    mdvs = manifest.get("dvs", {})
                    if dv_add is not None:
                        cur_dv = mdvs.get(table) or {"dirs": [], "files": {}}
                        files = dict(cur_dv["files"])
                        for name, cnt in dv_add["files"].items():
                            files[name] = files.get(name, 0) + cnt
                        manifest.setdefault("dvs", {})[table] = {
                            "dirs": cur_dv["dirs"] + [dv_add["dir"]],
                            "files": files,
                        }
                    elif "dv_restore" in intent:
                        # restore_table: the snapshot's vector state
                        # returns with its data (None clears a record
                        # the snapshot predates)
                        if intent["dv_restore"] is None:
                            mdvs.pop(table, None)
                        else:
                            manifest.setdefault("dvs", {})[table] = intent[
                                "dv_restore"
                            ]
                    elif intent["mode"] == "replace" and table in mdvs:
                        # a replace rewrote some (or all) files: prune
                        # the vector map to the basenames the new dir
                        # list still carries — rewritten files
                        # materialized their deletes (the DV-aware scan
                        # fed the rewrite), carried files keep their
                        # names and therefore their vectors. This keeps
                        # the per-file counts exact for metadata
                        # aggregates and retires compacted-away vectors.
                        names = {
                            self._dv_name(f)
                            for rel in intent["added"]
                            for f in self._dir_parquet_files(
                                os.path.join(self.root, rel)
                            )
                        }
                        files = {
                            k: v
                            for k, v in mdvs[table]["files"].items()
                            if k in names
                        }
                        if files:
                            mdvs[table] = {
                                "dirs": mdvs[table]["dirs"],
                                "files": files,
                            }
                        else:
                            mdvs.pop(table, None)
                if not manifest.get("dvs"):
                    manifest.pop("dvs", None)
            # Retained version manifest first (enables time travel),
            # pointer swap second. A crash between the two leaves an
            # orphan version file that the NEXT commit (same version
            # number, since the pointer never moved) simply overwrites —
            # never visible data.
            # bucket sidecars only AFTER every conflict check passed: a
            # losing committer must not leave a sidecar disagreeing with
            # the winner's committed _kb layout
            if bucket_meta:
                for t, (nb, kc) in bucket_meta.items():
                    Catalog._write_bucket_meta(self, t, nb, kc)
            self._commit_tail(manifest)

    def _commit_tail(self, manifest: dict) -> None:
        """The crash-ordered publish sequence EVERY commit (data or
        metadata) must share: load marker first (so a legacy backfill
        never sees this commit's not-yet-visible version file), then
        the retained version manifest, then the pointer swap. The
        caller holds the commit flock. See the committed-load-marker
        notes for the ``.pending`` sidecar semantics the marker write
        implements.

        Also maintains ``manifest["moved"]`` — per table, the LAST
        version at which its dir list changed — by diffing against the
        still-current on-disk manifest. This is the checkpoint that
        lets :meth:`source_moved` answer an idle-window probe in O(1)
        manifest reads instead of walking every version in the window
        (a consumer resuming after 10k idle commits must not pay 10k
        JSON reads per pump). Entries appear on a table's first
        post-upgrade dir-list change; absent entries fall back to the
        linear walk."""
        prev = self._read_manifest(strict=False)
        moved = dict(prev.get("moved", {}))
        prev_tables = prev.get("tables", {})
        new_tables = manifest.get("tables", {})
        for t in set(prev_tables) | set(new_tables):
            if prev_tables.get(t) != new_tables.get(t):
                moved[t] = manifest["version"]
        # a vector-only commit changes rows without moving the dir list:
        # it must still count as movement, or change-feed consumers
        # would skip merge-on-read deletes as idle windows
        prev_dvs = prev.get("dvs", {})
        new_dvs = manifest.get("dvs", {})
        for t in set(prev_dvs) | set(new_dvs):
            if (prev_dvs.get(t) or {}).get("dirs") != (
                new_dvs.get(t) or {}
            ).get("dirs") and t in new_tables:
                moved[t] = manifest["version"]
        # dropped tables leave the map (a catalog churning ephemeral
        # staging tables must not grow every future manifest forever);
        # probes on a vanished table fall back to the linear walk
        manifest["moved"] = {t: v for t, v in moved.items() if t in new_tables}
        self._write_load_marker(manifest["load_id"], manifest["version"])
        vdir = os.path.join(self.root, _VERSIONS)
        os.makedirs(vdir, exist_ok=True)
        with open(
            os.path.join(vdir, f"{manifest['version']}.json"), "w"
        ) as f:
            json.dump(manifest, f)
        self._swap_manifest(manifest)

    # -- RESTORE --------------------------------------------------------------

    def restore_table(
        self, table: str, version: int, validate_checks: bool = True
    ) -> None:
        """Delta RESTORE: make ``table``'s state at snapshot ``version``
        the CURRENT state, published as a NEW commit — history is never
        rewritten (you can restore a restore; the undone versions stay
        time-travelable until vacuum). Metadata-only on the write side:
        the old dir list and schema become the new pointer entries; no
        data is copied or rewritten. Conflict-checked like any replace:
        a writer landing between your decision and the commit raises
        :class:`ConcurrentWriteError`. Fails cleanly when vacuum has
        already reclaimed any of the restored dirs.

        A restore is a WRITE, so by default the restored state is
        validated against the table's CURRENT CHECK constraints — a
        snapshot predating a constraint could otherwise silently
        reintroduce violating rows (raises :class:`CheckViolation`);
        ``validate_checks=False`` opts out for the pure-metadata fast
        path when the caller knows the snapshot is clean."""
        if self._pending is not None:
            raise RuntimeError("restore_table inside an open transaction")
        vm = self._version_manifest(version)
        old = vm["tables"].get(table)
        if old is None:
            raise FileNotFoundError(
                f"{table!r} did not exist at version {version}"
            )
        missing = [
            r for r in old
            if not os.path.isdir(os.path.join(self.root, r))
        ]
        if missing:
            raise FileNotFoundError(
                f"cannot restore {table!r} to v{version}: data dirs "
                f"{missing!r} were vacuumed"
            )
        if validate_checks:
            chk = self.checks(table)
            pspecs = self._fk_parent_specs(table)
            if pspecs:
                # the table is an FK PARENT: restoring must not remove
                # keys that child rows reference now
                restored_p = self.read_at(table, version)
                for pcols in pspecs:
                    removed = (
                        self.read(table)
                        .select(*pcols)
                        .distinct()
                        .join(
                            restored_p.select(*pcols).distinct(),
                            pcols,
                            "left_anti",
                        )
                    )
                    # self-FK: current referencing rows die with the
                    # restore; the restored content validates below
                    self._refuse_fk_orphans(
                        table,
                        removed,
                        pcols,
                        f"restore (v{version})",
                        self_rows=None,
                    )
            if chk:
                from pyspark.sql import functions as F

                restored = self.read_at(table, version)
                for name, expr in chk.items():
                    if isinstance(expr, dict) and "fk" in expr:
                        spec = expr["fk"]
                        selffk = spec["parent"] == table
                        bad = self._fk_misses(
                            table,
                            spec,
                            restored,
                            extra_parent=restored if selffk else None,
                            replace_parent=selffk,
                        ).count()
                        if bad:
                            raise CheckViolation(
                                f"restoring {table!r} to v{version} "
                                f"would reintroduce {bad} key(s) with "
                                f"no match in {spec['parent']}"
                                f"{tuple(spec['parent_cols'])} under "
                                f"FOREIGN KEY {name!r}; drop the "
                                "constraint or pass "
                                "validate_checks=False"
                            )
                        continue
                    if isinstance(expr, dict) and "unique" in expr:
                        cols = expr["unique"]
                        bad = (
                            restored.groupBy(*cols)
                            .agg(F.count(F.lit(1)).alias("__c"))
                            .where(F.col("__c") > 1)
                            .count()
                        )
                        if bad:
                            raise CheckViolation(
                                f"restoring {table!r} to v{version} "
                                f"would reintroduce {bad} duplicated "
                                f"key(s) under UNIQUE {name!r} over "
                                f"{cols}; drop the constraint or pass "
                                "validate_checks=False"
                            )
                        continue
                    bad = restored.filter(self._violates(expr)).count()
                    if bad:
                        raise CheckViolation(
                            f"restoring {table!r} to v{version} would "
                            f"reintroduce {bad} row(s) violating CHECK "
                            f"{name!r} ({expr}); drop the check or pass "
                            "validate_checks=False"
                        )
        old_schema = vm.get("schemas", {}).get(table)
        base = self._committed_rels(table)
        with self.transaction(f"restore-{table}-v{version}"):
            self._pending[table] = list(old)
            self._intents[table] = {
                "mode": "replace",
                "base": base,
                "added": list(old),
                "schema": old_schema,
                # the snapshot's clustering spec and bloom-index config
                # return with its data (None clears a record the
                # snapshot predates)
                "layout": vm.get("layouts", {}).get(table),
                "bloom": vm.get("blooms", {}).get(table),
                "view": vm.get("views", {}).get(table),
                "dv_restore": vm.get("dvs", {}).get(table),
                "colmap": vm.get("colmaps", {}).get(table),
            }

    # -- DDL: CREATE / TRUNCATE / DROP ----------------------------------------
    #
    # The lifecycle bookends of the DML front door, all manifest-pointer
    # commits: CREATE publishes a typed empty table (zero data dirs),
    # TRUNCATE empties the pointer list while keeping schema/checks/
    # layout (Delta TRUNCATE — old versions stay time-travelable until
    # vacuum), DROP removes the table's manifest entries entirely (data
    # dirs live on for retained snapshots; whole-catalog or per-table
    # RESTORE resurrects the table until vacuum reclaims them).

    def identity_spec(self, table: str) -> dict | None:
        """The table's GENERATED ALWAYS AS IDENTITY column record
        (``{"col": name, "next": next_id}``) or None. ``next`` is the
        high-water mark the next identity INSERT starts at — advanced
        atomically with the rows it minted and never reused, even
        across deletes or INSERT OVERWRITE (Delta identity
        semantics). A spec staged by THIS open transaction (a table
        CREATEd inside a BEGIN block) is already visible to its own
        later writes (read-your-writes, like ``_pending``)."""
        if self._pending is not None and table in self._intents:
            staged = self._intents[table].get("identity")
            if staged is not None:
                return staged
        return (
            self._read_manifest(strict=False)
            .get("identity", {})
            .get(table)
        )

    def generated_spec(self, table: str) -> dict | None:
        """The table's GENERATED ALWAYS AS (expr) computed columns
        (``{col: sql_expr}``) or None — filled by the engine on every
        INSERT (Delta generated-column semantics; supplying one
        explicitly refuses). Staged-by-this-transaction specs are
        visible (read-your-writes), like :meth:`identity_spec`."""
        if self._pending is not None and table in self._intents:
            staged = self._intents[table].get("generated")
            if staged is not None:
                return staged
        return (
            self._read_manifest(strict=False)
            .get("generated", {})
            .get(table)
        )

    def create_table(
        self,
        table: str,
        schema,
        bucket_meta: tuple | None = None,
        identity_col: str | None = None,
        generated: dict | None = None,
    ) -> None:
        """CREATE TABLE: commit ``table`` as an empty typed relation
        (``schema`` is a StructType or DDL string). Exists -> raises
        (CREATE IF NOT EXISTS is the caller's no-op branch).
        ``bucket_meta=(num_buckets, key_cols)`` records the ``_kb``
        layout sidecar IN THE SAME COMMIT (CLUSTERED BY ... INTO n
        BUCKETS) — a separate write would leave a crash window that
        silently strands the table unbucketed.

        Inside an OPEN transaction (a BEGIN block) the create STAGES
        into it instead of committing: the table becomes visible to
        the block's own later statements (read-your-writes — INSERTs
        land, identity marks continue from the staged record) and
        publishes with the block's single manifest swap, so
        create-and-load is atomic and a ROLLBACK leaves no table."""
        from pyspark.sql import types as T

        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if self.exists(table):
            raise FileExistsError(f"table {table!r} already exists")
        if identity_col is not None:
            if identity_col not in schema.fieldNames():
                raise ValueError(
                    f"identity column {identity_col!r} not in the schema"
                )
            if not isinstance(
                schema[identity_col].dataType, T.LongType
            ):
                raise ValueError(
                    "GENERATED ALWAYS AS IDENTITY requires a BIGINT "
                    f"column ({identity_col!r} is "
                    f"{schema[identity_col].dataType.simpleString()})"
                )
        if generated:
            from pyspark.sql import functions as F

            # analysis against an empty frame of the NON-computed
            # columns: catches bad syntax, unknown column references,
            # and computed-on-computed in one shot, before the commit
            plain = T.StructType(
                [
                    f
                    for f in schema.fields
                    if f.name not in generated and f.name != identity_col
                ]
            )
            dummy = self.spark.createDataFrame([], plain)
            for col, expr in generated.items():
                if col not in schema.fieldNames():
                    raise ValueError(
                        f"generated column {col!r} not in the schema"
                    )
                if col == identity_col:
                    raise ValueError(
                        f"{col!r} cannot be both IDENTITY and computed"
                    )
                try:
                    dummy.select(F.expr(expr)).schema
                except Exception as e:
                    raise ValueError(
                        f"generated column {col!r}: bad expression "
                        f"({expr!r}): {e}"
                    ) from None
        base = self._committed_rels(table)  # None: conflicts if created

        def _stage():
            self._pending[table] = []
            self._intents[table] = {
                "mode": "replace",
                "base": base,
                "added": [],
                "schema": schema.jsonValue(),
            }
            if generated:
                self._intents[table]["generated"] = dict(generated)
            if identity_col is not None:
                # registered in the SAME commit as the table — no crash
                # window where INSERTs would mint unchecked ids
                self._intents[table]["identity"] = {
                    "col": identity_col, "next": 1, "expect_next": None,
                }
            if bucket_meta is not None:
                nb, kc = bucket_meta
                self._write_bucket_meta(table, int(nb), list(kc))

        if self._pending is not None:
            _stage()
        else:
            with self.transaction(f"create-{table}"):
                _stage()

    def add_column(self, table: str, name: str, dtype) -> None:
        """ALTER TABLE ... ADD COLUMN: additive schema evolution as a
        PURE METADATA commit — the committed schema gains a nullable
        field, existing files are untouched, and every read projects
        the missing column as NULL (the committed-schema scan already
        does this for append-evolved tables). ``dtype`` is a DataType
        or DDL type string. Type changes and duplicate names refuse —
        same enforcement as the append-time schema merge."""
        from pyspark.sql import types as T

        if self._pending is not None:
            raise RuntimeError("add_column inside an open transaction")
        if not self.exists(table):
            raise FileNotFoundError(f"{table!r} not in manifest")
        if isinstance(dtype, str):
            dtype = T.StructType.fromDDL(f"{name} {dtype}")[0].dataType
        stored = self._stored_schema(table)
        if stored is None:
            raise ValueError(
                f"table {table!r} predates schema tracking; rewrite it "
                "once (compact) before ALTER TABLE"
            )
        cmap = self.colmap(table) or {}
        if name in cmap.get("dropped", []):
            raise ValueError(
                f"column name {name!r} was dropped from {table!r} and old "
                "files still carry its values; a full rewrite must retire "
                "them before the name can return"
            )
        if (
            name in stored.fieldNames()
            or name in cmap.get("renames", {}).values()
        ):
            raise ValueError(f"column {name!r} already exists on {table!r}")
        field = T.StructField(name, dtype, True).jsonValue()

        def mutate(m):
            m.setdefault("schemas", {})[table]["fields"].append(field)

        self._publish_meta(mutate, f"add-column-{table}-{name}")

    def truncate(self, table: str) -> int:
        """TRUNCATE TABLE: publish an EMPTY dir list for ``table`` —
        schema, CHECK constraints, and clustering layout survive; no
        data file is touched (previous versions stay readable via
        read_at until vacuum). Returns the number of rows removed
        (metadata count). Conflict-checked like any replace."""
        if self._pending is not None:
            raise RuntimeError("truncate inside an open transaction")
        base = self._committed_rels(table)
        if base is None:
            raise FileNotFoundError(f"{table!r} not in manifest")
        # RESTRICT: truncating removes EVERY key — refuse while any
        # child row references one
        for pcols in self._fk_parent_specs(table):
            # self-FK: the referencing rows are truncated too
            self._refuse_fk_orphans(
                table,
                self.read(table).select(*pcols),
                pcols,
                "TRUNCATE",
                self_rows=None,
            )
        n = self.count_rows(table)
        schema = self._stored_schema(table)
        if schema is None:
            # pre-schema-tracking table (e.g. adopted via migrate_plain):
            # capture the data's schema NOW, or the truncated table
            # would have zero dirs AND no committed schema — unreadable
            schema = self.read(table).schema
        with self.transaction(f"truncate-{table}"):
            self._pending[table] = []
            self._intents[table] = {
                "mode": "replace",
                "base": base,
                "added": [],
                "schema": schema.jsonValue() if schema is not None else None,
            }
        return n

    def drop_table(self, table: str) -> None:
        """DROP TABLE: remove ``table`` (and its schema, checks, layout,
        and bucket sidecar) from the manifest in one commit. Data dirs
        are NOT deleted — retained snapshots still reference them, so
        ``restore``/``restore_table`` resurrects the table until
        ``vacuum`` passes the retention horizon. (The bucket sidecar is
        plain un-versioned metadata: a later same-named table must not
        inherit a stale bucket layout, so it is removed now and a
        restore of a bucketed table should re-merge or re-compact.)"""
        if self._pending is not None:
            raise RuntimeError("drop_table inside an open transaction")
        if not self.exists(table):
            raise FileNotFoundError(f"{table!r} not in manifest")
        children = [
            (c, n) for c, n, _s in self._fk_children(table) if c != table
        ]
        if children:
            raise ValueError(
                f"cannot DROP {table!r}: FOREIGN KEY constraint(s) "
                f"{children!r} reference it; drop the constraint(s) "
                "first"
            )

        def mutate(m):
            m["tables"].pop(table, None)
            m.get("schemas", {}).pop(table, None)
            m.get("checks", {}).pop(table, None)
            m.get("layouts", {}).pop(table, None)
            m.get("blooms", {}).pop(table, None)
            m.get("views", {}).pop(table, None)
            m.get("dvs", {}).pop(table, None)
            if not m.get("dvs"):
                m.pop("dvs", None)
            m.get("colmaps", {}).pop(table, None)
            if not m.get("colmaps"):
                m.pop("colmaps", None)
            m.get("properties", {}).pop(table, None)
            if not m.get("properties"):
                m.pop("properties", None)
            m.get("identity", {}).pop(table, None)
            if not m.get("identity"):
                m.pop("identity", None)
            m.get("generated", {}).pop(table, None)
            if not m.get("generated"):
                m.pop("generated", None)
            m.get("renamed", {}).pop(table, None)
            if not m.get("renamed"):
                m.pop("renamed", None)

        self._publish_meta(mutate, f"drop-{table}")
        try:
            os.remove(self._bucket_meta_path(table))
        except FileNotFoundError:
            pass

    # -- metadata-only COUNT --------------------------------------------------

    def count_rows(self, table: str, predicates=None) -> int:
        """Exact ``COUNT(*) [WHERE predicates]`` answered from the file
        stats wherever provable — Delta's metadata-optimized count,
        generalized to predicates. Every file is classified from its
        sidecar entry: provably-all-match files contribute their row
        count with ZERO I/O, provably-no-match files contribute
        nothing, and only the undecidable remainder is actually
        scanned (with the exact residual filter). A bare count on a
        stats-complete table — the dashboard/monitoring hot path —
        touches no data files at all (pytest pins this by nulling the
        Spark handle). Always exact, never approximate. ``predicates``
        may be one conjunction or a DNF list (as in
        :meth:`delete_where`): a file counts without I/O when one OR
        branch provably matches all its rows, drops when every branch
        provably matches none."""
        if not self.exists(table):
            raise FileNotFoundError(f"{table!r} not in manifest")
        # everything below speaks physical names (sidecars, scans)
        dnf = self._phys_dnf(
            self.colmap(table), self._as_dnf(predicates or [])
        )
        dv = self.dv_info(table)
        dvf = (dv or {}).get("files", {})
        total = 0
        scan: list[tuple[str, list[str]]] = []
        for d in self._data_dirs(table):
            stats = blooms.attach_blooms(
                filestats.read_dir_stats(d), d, dnf
            )
            files = self._dir_parquet_files(d)
            clean = [
                f for f in files if dvf.get(self._dv_name(f), 0) == 0
            ]
            counted, unknown = filestats.classify_files_dnf(
                stats, clean, dnf
            )
            total += counted
            # vector-deleted files: an all-match file's LIVE matches are
            # rows - n_deleted (deleted rows are a subset of all rows);
            # no-match stays zero; undecidable files scan WITH the
            # vectors applied — bare counts stay metadata-only
            for f in files:
                n_del = dvf.get(self._dv_name(f), 0)
                if n_del == 0:
                    continue
                c, u = filestats.classify_files_dnf(stats, [f], dnf)
                if u:
                    unknown.append(f)
                elif c:
                    total += c - n_del
            if unknown:
                scan.append((d, unknown))
        if scan:
            stored = self._stored_schema(table)
            parts = []
            for d, fs in scan:
                r = self.spark.read.option("basePath", d)
                if stored is not None:
                    r = r.schema(stored)
                part = r.parquet(*(os.path.join(d, f) for f in fs))
                parts.append(self._dv_annotate(part) if dv else part)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p, allowMissingColumns=True)
            if dv:
                df = self._dv_strip(df, dv)  # one anti-join for all dirs
            total += df.filter(filestats.dnf_condition(dnf)).count()
        return total

    def min_max(self, table: str, col: str) -> tuple:
        """Exact ``(MIN(col), MAX(col))`` (NULLs ignored, SQL
        semantics) answered from the stats sidecars wherever a file's
        min/max is recorded — the companion to :meth:`count_rows` in
        Delta's metadata-optimized aggregate family. Files with
        unknown stats, all-NULL min/max ambiguity, or partition-token
        stats (whose lexicographic order may disagree with the
        column's type) are scanned — and ONLY those. A stats-complete
        table answers with zero data I/O. Timestamp columns answer
        from metadata too: the engine session writes TIMESTAMP as
        TIMESTAMP_MICROS (session.py), whose footer stats the sidecar
        harvests (normalized to naive UTC); files from legacy INT96
        writers carry no stats and simply take the scan path."""
        if not self.exists(table):
            raise FileNotFoundError(f"{table!r} not in manifest")
        col = self._phys_name(self.colmap(table), col)
        dv = self.dv_info(table)
        dvf = (dv or {}).get("files", {})
        mn = mx = None
        scan: list[tuple[str, list[str]]] = []
        for d in self._data_dirs(table):
            stats = filestats.read_dir_stats(d)
            entries = (stats or {}).get("files", {})
            unknown = []
            for f in self._dir_parquet_files(d):
                if dvf.get(self._dv_name(f), 0):
                    # a pending vector may have deleted the extreme row;
                    # footer min/max can only widen — scan this file
                    unknown.append(f)
                    continue
                entry = entries.get(f)
                if entry is None:
                    unknown.append(f)
                    continue
                if entry.get("rows") == 0:
                    continue
                cs = entry.get("columns", {}).get(col)
                if cs is None:
                    unknown.append(f)
                    continue
                emin, emax = cs.get("min"), cs.get("max")
                if emin is None or emax is None:
                    # provably all-NULL contributes nothing; anything
                    # else is unknown
                    if not (
                        entry.get("rows") is not None
                        and cs.get("nulls") == entry["rows"]
                    ):
                        unknown.append(f)
                    continue
                if emin.get("t") == "part" or emax.get("t") == "part":
                    unknown.append(f)  # token order may lie for numbers
                    continue
                fmin = filestats._decode_value(emin)
                fmax = filestats._decode_value(emax)
                if mn is None or filestats._lt(fmin, mn):
                    mn = fmin
                if mx is None or filestats._lt(mx, fmax):
                    mx = fmax
            if unknown:
                scan.append((d, unknown))
        if scan:
            from pyspark.sql import functions as F

            stored = self._stored_schema(table)
            parts = []
            for d, fs in scan:
                r = self.spark.read.option("basePath", d)
                if stored is not None:
                    r = r.schema(stored)
                part = r.parquet(*(os.path.join(d, f) for f in fs))
                parts.append(self._dv_annotate(part) if dv else part)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p, allowMissingColumns=True)
            if dv:
                df = self._dv_strip(df, dv)  # one anti-join for all dirs
            row = df.agg(
                F.min(col).alias("mn"), F.max(col).alias("mx")
            ).first()
            if row["mn"] is not None and (
                mn is None or filestats._lt(row["mn"], mn)
            ):
                mn = row["mn"]
            if row["mx"] is not None and (
                mx is None or filestats._lt(mx, row["mx"])
            ):
                mx = row["mx"]
        return mn, mx

    # -- row-level DELETE / UPDATE --------------------------------------------
    #
    # The Delta DML shape, shared by delete_where and update_where: file
    # stats pick the CANDIDATE files whose value ranges can match, only
    # those are read and transformed, and every other file is carried
    # into the new snapshot by HARDLINK (zero read, zero copy — pinned
    # by inode equality in pytest and the gate queries). At 100 TB a
    # GDPR delete or a three-file correction rewrites three files; it
    # never rewrites, or even opens, the rest of the table. The commit
    # is replace-mode, conflict-anchored to the pre-DML snapshot (a
    # concurrent writer raises ConcurrentWriteError rather than being
    # silently dropped); old versions stay readable via read_at;
    # partition layouts and untouched stats entries survive.

    @staticmethod
    def _as_dnf(predicates) -> list[list[tuple]]:
        """Normalize a DML predicate argument to disjunctive normal
        form. A flat list of ``(col, op[, value])`` tuples is ONE
        conjunction (the classic shape); a list of such lists is an OR
        of conjunctions (``WHERE (a AND b) OR (c)``). Every disjunct is
        validated; file pruning takes the UNION of each disjunct's
        candidates, so an OR is exactly as prunable as its widest
        branch."""
        preds = list(predicates)
        if not preds:
            return [[]]
        if all(p and isinstance(p[0], str) for p in preds):
            return [filestats.validate_predicates(preds)]
        return [filestats.validate_predicates(conj) for conj in preds]

    def delete_where(self, table: str, predicates, mode: str = "rewrite") -> int:
        """DELETE rows matching ``predicates`` — either one conjunction
        (the :meth:`read` tuple format) or a LIST of conjunctions,
        OR-ed together (disjunctive normal form; what the SQL façade's
        top-level OR parses to). A row is deleted when the predicate is
        TRUE; NULL keeps the row (SQL DELETE WHERE). Returns the number
        of rows deleted; a no-match delete returns 0 WITHOUT publishing
        a new version.

        A copy-on-write DELETE whose FK children carry ON DELETE
        CASCADE / SET NULL runs the whole chain — every child leg plus
        its own rewrite — inside ONE transaction (one manifest swap,
        all-or-nothing), except for SELF-referential cascades, whose
        per-level recursion must observe the previous level's result
        and therefore commits child-first sequentially (each
        intermediate state constraint-consistent)."""
        actions = [
            c
            for c, _n, s in self._fk_children(table)
            if s.get("on_delete", "restrict") != "restrict"
        ]
        if (
            actions
            and mode == "rewrite"
            and self._pending is None
            and table not in actions
        ):
            self.begin(f"delete-cascade-{table}")
            try:
                n = self._delete_where_body(table, predicates, mode)
            except BaseException:
                self.rollback()
                raise
            if self._pending:
                try:
                    self.commit()
                except BaseException:
                    self.rollback()
                    raise
            else:
                self.rollback()  # nothing staged: don't burn a version
            return n
        return self._delete_where_body(table, predicates, mode)

    def _delete_where_body(
        self, table: str, predicates, mode: str = "rewrite"
    ) -> int:
        """:meth:`delete_where` minus the cascade-transaction wrapper.

        ``mode="rewrite"`` (default) is copy-on-write: candidate files
        are rewritten without the matched rows, everything else carries
        by hardlink. ``mode="dv"`` is merge-on-read: NO data file is
        touched — the matched row positions land in a deletion-vector
        sidecar that readers subtract and the next :meth:`compact`
        folds. At 100 TB the vector path turns a point delete from
        O(matched rows written) instead of candidate files."""
        if mode == "dv" and self._pending is not None:
            # refuse BEFORE any cascade leg stages or any candidate
            # scan runs — vectors publish outside the staged-dir
            # protocol, so this can never join a transaction
            raise RuntimeError(
                "merge-on-read DELETE cannot join an open transaction "
                "(deletion vectors publish outside the staged-dir "
                "protocol); use copy-on-write mode or commit first"
            )
        children = self._fk_children(table)
        if children:
            from pyspark.sql import functions as F

            cond = F.coalesce(
                filestats.dnf_condition(self._as_dnf(predicates)),
                F.lit(False),
            )
            has_actions = any(
                s.get("on_delete", "restrict") != "restrict"
                for _c, _n, s in children
            )
            if has_actions and self._pending is None:
                # UNWRAPPED chain (dv-mode parent or self-cascade):
                # each cascade leg COMMITS, so a RESTRICT refusal after
                # the legs would leave child rows deleted for a
                # statement that never succeeded — and reruns refuse
                # forever. Pre-probe the RESTRICT constraints over the
                # CURRENT state before anything commits. (Conservative
                # on the rare child holding both a cascade and a
                # restrict FK to this parent: the pre-probe sees rows
                # the cascade would remove — over-refusal, never loss.)
                doomed0 = self.read(table).filter(cond)
                survivors0 = self.read(table).filter(~cond)
                for pcols in self._fk_parent_specs(table):
                    self._refuse_fk_orphans(
                        table,
                        doomed0.select(*pcols),
                        pcols,
                        "DELETE FROM",
                        self_rows=survivors0,
                        restrict_only=True,
                    )
            # ON DELETE CASCADE / SET NULL children act FIRST (child-
            # before-parent commit order inside one transaction for
            # non-self chains; sequential commits otherwise — a crash
            # mid-chain leaves a constraint-CONSISTENT lake and
            # rerunning the DELETE finishes the job)
            self._apply_fk_delete_actions(table, cond)
            # RESTRICT: the doomed rows' keys are exact removals (the
            # referenced columns are UNIQUE), so probing children for
            # just those keys is sound and O(changes). Frames built
            # FRESH here — the actions above may have committed new
            # versions of the children (including this very table,
            # for a self-referential cascade).
            doomed = self.read(table).filter(cond)
            # self-FK: deleting a node and its referencing rows in ONE
            # statement is consistent — probe only the SURVIVORS
            survivors = self.read(table).filter(~cond)
            for pcols in self._fk_parent_specs(table):
                self._refuse_fk_orphans(
                    table,
                    doomed.select(*pcols),
                    pcols,
                    "DELETE FROM",
                    self_rows=survivors,
                )
        if mode == "dv":
            return self._delete_where_dv(table, predicates)
        if mode != "rewrite":
            raise ValueError(f"delete_where mode {mode!r}: 'rewrite' or 'dv'")
        return self._rewrite_where(
            table,
            predicates,
            "delete",
            lambda df, match: df.filter(~match),
        )

    def update_where(
        self, table: str, predicates, set_exprs: dict, mode: str = "rewrite"
    ) -> int:
        """UPDATE ... SET ... WHERE: rows matching ``predicates`` (one
        conjunction or a DNF list, as in :meth:`delete_where`)
        get each ``set_exprs`` column replaced by its SQL
        expression (evaluated over the row); all other rows — and all
        non-candidate FILES — pass through untouched. The staged
        rewrite is validated against the table's CHECK constraints (an
        update CAN introduce a violation; a delete cannot). Returns the
        number of rows updated; no-match updates publish nothing.

        ``mode="dv"`` is the merge-on-read UPDATE (Delta's DV shape):
        the matched rows' positions land in a deletion vector and their
        SET-applied images APPEND as a new dir — write cost O(matched
        rows), no candidate file rewritten; :meth:`compact` folds.

        A SET touching UNIQUE-covered columns is CHECKED, not refused
        (the complete behavior the r12 verdict asked for): before any
        write, the matched rows' post-SET keys are probed for
        duplicates among themselves and against every key the update
        does NOT retire — sound because the constraint makes the old
        matched keys the exact retired set. A SET touching columns a
        child FOREIGN KEY references additionally refuses when the
        rewritten-away key values are still referenced (RESTRICT).

        A SET touching a BUCKET KEY column moves the matched rows to
        their new ``_kb`` placement in the same commit (rewrite: the
        partitioned stage write routes them; dv: the appended images
        re-derive ``_kb``), so bucket-pruned reads keep finding them.
        SET on ``_kb`` itself refuses — it is derived.

        A SET touching columns a child FOREIGN KEY references with an
        ``ON UPDATE CASCADE`` / ``SET NULL`` action fans the key change
        out to the referencing rows: the parent rewrite stages FIRST
        (so the child legs' own FK probes see the new keys), then each
        child gets ONE keyed statement (``SET fk = CASE old THEN new
        ...`` / ``SET fk = NULL`` over ``fk IN (changed old keys)``)
        through the normal DML front, and everything publishes in ONE
        atomic commit — parent-only or child-only intermediate states
        would both orphan rows, so merge-on-read UPDATE refuses when
        an action leg applies (vectors publish outside the staged-dir
        protocol and cannot join the transaction)."""
        # ON UPDATE action legs + parent rewrite must publish together
        # — wrap statement and legs in one transaction (inside a user
        # BEGIN block the enclosing transaction already provides this)
        acts = self._fk_update_action_children(table, set_exprs)
        if acts and mode == "rewrite" and self._pending is None:
            self.begin(f"update-cascade-{table}")
            try:
                n = self._update_where_body(
                    table, predicates, set_exprs, mode, acts
                )
            except BaseException:
                self.rollback()
                raise
            if self._pending:
                try:
                    self.commit()
                except BaseException:
                    self.rollback()
                    raise
            else:
                self.rollback()  # nothing staged: don't burn a version
            return n
        return self._update_where_body(
            table, predicates, set_exprs, mode, acts
        )

    def _fk_update_action_children(
        self, table: str, set_exprs: dict
    ) -> list[tuple[str, str, dict]]:
        """The (child, name, spec) FKs whose ``ON UPDATE`` action fires
        for this SET: non-restrict action AND the referenced column is
        being assigned. One manifest read, zero data."""
        return [
            (c, n, s)
            for c, n, s in self._fk_children(table)
            if s.get("on_update", "restrict") != "restrict"
            and s["parent_cols"][0] in set_exprs
        ]

    def _update_where_body(
        self,
        table: str,
        predicates,
        set_exprs: dict,
        mode: str = "rewrite",
        acts: list | None = None,
    ) -> int:
        """:meth:`update_where` minus the cascade-transaction wrapper.
        ``acts`` is the wrapper's :meth:`_fk_update_action_children`
        result, threaded through so the manifest is read once."""
        from pyspark.sql import functions as F

        if acts is None:
            acts = self._fk_update_action_children(table, set_exprs)
        if mode == "dv" and acts:
            # refuse BEFORE any probe runs: the action legs commit
            # through the staged-dir protocol, the parent's vectors
            # outside it — they cannot publish atomically together
            raise RuntimeError(
                "merge-on-read UPDATE cannot run ON UPDATE CASCADE/"
                "SET NULL legs atomically (deletion vectors publish "
                "outside the staged-dir protocol); use copy-on-write "
                "mode for key-changing updates"
            )
        if mode == "dv" and self._pending is not None:
            # refuse BEFORE the probes/casts run — vectors publish
            # outside the staged-dir protocol and can't join a txn
            raise RuntimeError(
                "merge-on-read UPDATE cannot join an open transaction "
                "(deletion vectors publish outside the staged-dir "
                "protocol); use copy-on-write mode or commit first"
            )
        # SET on a bucket-key column changes the row's placement hash —
        # the row must MOVE to its new _kb partition or every
        # bucket-pruned path (merge, UNIQUE/FK probes, bucketed
        # merge-delete) would silently miss it. The rewrite recomputes
        # _kb for the matched rows post-SET, so the partitioned stage
        # write routes them into their new bucket dirs in the same
        # commit (untouched files still hardlink-carry). SET on ``_kb``
        # itself stays refused — it is derived, never user-writable.
        meta = self.bucket_meta(table)
        rekb = None
        if meta is not None:
            if "_kb" in set_exprs:
                raise ValueError(
                    "'_kb' is the reserved bucket-layout column; SET "
                    "the bucket KEY columns and placement follows"
                )
            if set(meta["key_cols"]) & set(set_exprs):
                from gcp_datalake_pipeline_spark.storage import kb_col

                rekb = kb_col(
                    list(meta["key_cols"]), meta["num_buckets"]
                )
        known = self._check_update_keys(table, predicates, set_exprs)
        if mode == "dv":
            return self._update_where_dv(table, predicates, set_exprs)
        if mode != "rewrite":
            raise ValueError(f"update_where mode {mode!r}: 'rewrite' or 'dv'")
        # plan the ON UPDATE legs from the PRE-update state (the old ->
        # new key maps must be read before the rewrite stages), apply
        # them AFTER it (the child legs' FK probes then see the staged
        # parent carrying the new keys — read-your-writes)
        legs = (
            self._plan_fk_update_actions(
                table, predicates, set_exprs, acts
            )
            if acts
            else []
        )

        def transform(df, match):
            self._probe_set_casts(df, match, set_exprs, table)
            # ONE select, every expression bound to the ORIGINAL row:
            # SQL's simultaneous SET semantics (SET a=b, b=a swaps), and
            # the predicate never re-resolves against post-SET values —
            # a withColumn chain would mis-scope later SETs (and the
            # _kb re-derivation) to the wrong rows. _check_update_keys'
            # probe computes post-images the same way; they must agree.
            new = {
                c: F.when(match, F.expr(e).cast(df.schema[c].dataType))
                .otherwise(F.col(c))
                for c, e in set_exprs.items()
            }
            out = df.select(
                *[new.get(c, F.col(c)).alias(c) for c in df.columns],
                match.alias("__upd_match"),
            )
            if rekb is not None:
                # post-SET key values are in place — re-derive placement
                # for matched rows only (unmatched keys are unchanged,
                # so their recomputed hash would be identical anyway)
                out = out.withColumn(
                    "_kb",
                    F.when(F.col("__upd_match"), rekb).otherwise(
                        F.col("_kb")
                    ),
                )
            return out.drop("__upd_match")

        n = self._rewrite_where(
            table,
            predicates,
            "update",
            transform,
            enforce_checks=True,
            known_matched=known,
        )
        for child, leg in legs:
            self.update_where(child, leg["preds"], leg["sets"])
        return n

    def _plan_fk_update_actions(
        self,
        table: str,
        predicates,
        set_exprs: dict,
        specs: list | None = None,
    ) -> list[tuple[str, dict]]:
        """Driver-side plan for the ON UPDATE CASCADE / SET NULL legs
        of one parent UPDATE: per referenced column, the distinct
        (old key -> new key) map over the matched rows (NULL old keys
        reference nothing under MATCH SIMPLE and no-op assignments fan
        nothing out); per child, ONE keyed statement — predicate
        ``fk IN (changed old keys)`` (a DNF branch per FK column, so
        two action FKs into the same child merge instead of colliding
        on the one-rewrite-per-transaction rule), SET a per-column
        ``CASE`` that remaps (CASCADE) or nulls (SET NULL) and keeps
        every other value. Key maps collect to the driver capped at
        :attr:`_CASCADE_KEY_CAP` — a fan-out past that should be an
        explicit child statement, mirroring the DELETE cascade cap."""
        from pyspark.sql import functions as F

        if specs is None:
            specs = self._fk_update_action_children(table, set_exprs)
        if not specs:
            return []
        cond = F.coalesce(
            filestats.dnf_condition(self._as_dnf(predicates)), F.lit(False)
        )
        t = self.read(table)
        schema = {f.name: f.dataType for f in t.schema.fields}
        maps: dict[str, list[tuple]] = {}
        for pcol in sorted({s["parent_cols"][0] for _c, _n, s in specs}):
            new = F.expr(set_exprs[pcol]).cast(schema[pcol])
            rows = (
                t.filter(cond)
                .select(F.col(pcol).alias("o"), new.alias("n"))
                .where(
                    F.col("o").isNotNull()
                    & ~F.col("o").eqNullSafe(F.col("n"))
                )
                .distinct()
                .limit(self._CASCADE_KEY_CAP + 1)
                .collect()
            )
            if len(rows) > self._CASCADE_KEY_CAP:
                raise ValueError(
                    f"ON UPDATE cascade from {table!r} would fan "
                    f"{self._CASCADE_KEY_CAP}+ changed keys over "
                    f"{pcol!r} into child tables; run the child "
                    "statement yourself for key rewrites this large"
                )
            maps[pcol] = [(r["o"], r["n"]) for r in rows]
        by_child: dict[str, dict] = {}
        for child, name, s in specs:
            m = maps[s["parent_cols"][0]]
            if not m or not self.exists(child):
                continue
            leg = by_child.setdefault(child, {"preds": [], "sets": {}})
            fk = s["cols"][0]
            if fk in leg["sets"]:
                raise ValueError(
                    f"two ON UPDATE action FOREIGN KEYs fan into "
                    f"{child}.{fk}; drop one constraint"
                )
            olds = [o for o, _ in m]
            leg["preds"].append([(fk, "in", olds)])
            if s["on_update"] == "cascade":
                whens = " ".join(
                    f"WHEN {_sql_literal(o)} THEN {_sql_literal(n)}"
                    for o, n in m
                )
                leg["sets"][fk] = f"CASE {fk} {whens} ELSE {fk} END"
            else:  # set null
                inlist = ", ".join(_sql_literal(o) for o in olds)
                leg["sets"][fk] = (
                    f"CASE WHEN {fk} IN ({inlist}) THEN NULL "
                    f"ELSE {fk} END"
                )
        return sorted(by_child.items())

    def _check_update_keys(
        self, table: str, predicates, set_exprs: dict
    ) -> int | None:
        """Constraint pre-probe for UPDATE ... SET touching UNIQUE- or
        FK-referenced columns — replaces the old blanket refusal with
        the complete checked behavior, shared by the rewrite and DV
        paths (it runs BEFORE any write, so a violation publishes
        nothing).

        For each UNIQUE constraint whose columns intersect the SET:
        the matched rows' POST-SET keys must (a) not duplicate each
        other and (b) not collide with any key the update does not
        retire. Because the constraint holds on the current table, the
        retired set is exactly the matched rows' OLD keys, so leg (b)
        is ``new_keys semi-join (table_keys anti-join old_keys)`` —
        null-safe (NULL keys group like values), bucket-pruned to the
        new keys' buckets when the table is bucketed on the constraint
        columns. Key swaps inside one UPDATE (1->2, 2->1) pass, as SQL
        requires of a statement-level constraint check.

        For each child FOREIGN KEY referencing SET-touched columns of
        this table: key values rewritten AWAY (old keys absent from
        the post-SET keys) are removals — RESTRICT refuses while a
        child row references them.

        Returns the number of matched rows when the small-update fast
        path determined it exactly (so the rewrite can skip its own
        gate count), else None."""
        from pyspark.sql import functions as F

        fk_specs = [
            pcols
            for pcols in self._fk_parent_specs(table)
            if set(pcols) & set(set_exprs)
        ]
        ucons = [
            (cname, list(expr["unique"]))
            for cname, expr in self.checks(table).items()
            if isinstance(expr, dict)
            and set(expr.get("unique", ())) & set(set_exprs)
        ]
        if not (fk_specs or ucons):
            return None
        cond = F.coalesce(
            filestats.dnf_condition(self._as_dnf(predicates)), F.lit(False)
        )
        t = self.read(table)
        matched = t.filter(cond)
        if not ucons and matched.limit(1).count() == 0:
            return 0  # no-match update publishes nothing — nothing to probe
        n_matched: int | None = None
        schema = {f.name: f.dataType for f in t.schema.fields}
        post = matched.select(
            *[
                (
                    F.expr(set_exprs[c]).cast(schema[c]).alias(c)
                    if c in set_exprs
                    else F.col(c)
                )
                for c in t.columns
            ]
        )

        def _nullsafe_cond(left, right, cols):
            c = None
            for k in cols:
                leg = F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}"))
                c = leg if c is None else c & leg
            return c

        gated = bool(ucons)  # the first small collect below settles the
        # no-match gate for the whole method (matched rows are bounded
        # by the constraint's key uniqueness, so the collect is tiny)
        for cname, ucols in ucons:
            new_keys = post.select(*ucols)
            # Small-update fast path: ONE collect yields the matched
            # rows' (old -> new) key images (bounded: t is UNIQUE on
            # ucols, so matched rows == distinct old keys), settling the
            # no-match gate and the post-SET dup check in Python; the
            # collision probe then scans t with literal predicates
            # (stats/row-group pruned, no joins). Bulk updates overflow
            # the limit and take the original join path.
            pairs = matched.select(
                *[F.col(c).alias(f"_old_{c}") for c in ucols],
                *[
                    (
                        F.expr(set_exprs[c]).cast(schema[c])
                        if c in set_exprs
                        else F.col(c)
                    ).alias(f"_new_{c}")
                    for c in ucols
                ],
            ).limit(_SMALL_PROBE_KEYS + 1).collect()
            if len(pairs) <= _SMALL_PROBE_KEYS and _literal_probe_safe(
                [f"_old_{c}" for c in ucols] + [f"_new_{c}" for c in ucols],
                pairs,
            ):
                if not pairs:
                    return 0  # no-match update publishes nothing
                gated = False
                n_matched = len(pairs)
                new_rows = [
                    {c: r[f"_new_{c}"] for c in ucols} for r in pairs
                ]
                seen: dict[tuple, int] = {}
                for r in new_rows:
                    k = tuple(r[c] for c in ucols)
                    seen[k] = seen.get(k, 0) + 1
                dups = sum(1 for v in seen.values() if v > 1)
                if dups:
                    raise CheckViolation(
                        f"UPDATE on {table!r} violates UNIQUE {cname!r} "
                        f"over {ucols}: {dups} post-SET key(s) duplicated "
                        "among the matched rows"
                    )
                old_rows = [
                    {c: r[f"_old_{c}"] for c in ucols} for r in pairs
                ]
                hits = (
                    t.select(*ucols)
                    .where(
                        F.coalesce(
                            _literal_key_cond(ucols, new_rows), F.lit(False)
                        )
                        & ~F.coalesce(
                            _literal_key_cond(ucols, old_rows), F.lit(False)
                        )
                    )
                    .count()
                )
                if hits:
                    raise CheckViolation(
                        f"UPDATE on {table!r} violates UNIQUE {cname!r} "
                        f"over {ucols}: {hits} post-SET key(s) collide "
                        "with keys the update does not rewrite"
                    )
                continue
            if gated:
                gated = False
                if matched.limit(1).count() == 0:
                    return 0
            dups = (
                new_keys.groupBy(*ucols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .where(F.col("__c") > 1)
                .count()
            )
            if dups:
                raise CheckViolation(
                    f"UPDATE on {table!r} violates UNIQUE {cname!r} "
                    f"over {ucols}: {dups} post-SET key(s) duplicated "
                    "among the matched rows"
                )
            old_keys = matched.select(*ucols).alias("old")
            survivors = t.select(*ucols).alias("t").join(
                old_keys, _nullsafe_cond("t", "old", ucols), "left_anti"
            )
            from gcp_datalake_pipeline_spark.storage import kb_col

            meta = self.bucket_meta(table)
            if meta is not None and list(meta["key_cols"]) == list(ucols):
                buckets = [
                    r["_kb"]
                    for r in new_keys.select(
                        kb_col(ucols, meta["num_buckets"]).alias("_kb")
                    )
                    .distinct()
                    .collect()
                ]
                survivors = (
                    t.where(F.col("_kb").isin(buckets))
                    .select(*ucols)
                    .alias("t")
                    .join(
                        old_keys,
                        _nullsafe_cond("t", "old", ucols),
                        "left_anti",
                    )
                )
            hits = (
                survivors.alias("s")
                .join(
                    new_keys.distinct().alias("n"),
                    _nullsafe_cond("s", "n", ucols),
                    "left_semi",
                )
                .count()
            )
            if hits:
                raise CheckViolation(
                    f"UPDATE on {table!r} violates UNIQUE {cname!r} "
                    f"over {ucols}: {hits} post-SET key(s) collide "
                    "with keys the update does not rewrite"
                )
        for pcols in fk_specs:
            removed = matched.select(*pcols).join(
                post.select(*pcols).distinct(), pcols, "left_anti"
            )
            # self-FK: the referencing rows the probe must see are the
            # POST-state ones (unmatched rows as-is ∪ post-SET images).
            # Children with an ON UPDATE action are handled by the
            # cascade legs instead of the RESTRICT probe.
            self._refuse_fk_orphans(
                table,
                removed,
                pcols,
                "UPDATE",
                self_rows=t.filter(~cond).unionByName(post),
                restrict_only=True,
                action_field="on_update",
            )
        return n_matched

    def _probe_set_casts(self, df, match, set_exprs: dict, table: str) -> None:
        """ANSI-style cast safety shared by both UPDATE paths: Spark's
        default cast turns an incompatible SET value into NULL — an
        UPDATE must never silently null a column, so probe the matched
        rows for values the cast loses before writing anything."""
        from pyspark.sql import functions as F

        for col in set_exprs:
            if col not in df.columns:
                raise ValueError(
                    f"update_where: unknown column {col!r} in {table!r}"
                )
        bad_casts = [
            F.sum(
                (
                    F.expr(expr).isNotNull()
                    & F.expr(expr).cast(df.schema[col].dataType).isNull()
                ).cast("long")
            ).alias(col)
            for col, expr in set_exprs.items()
        ]
        probe = df.filter(match).agg(*bad_casts).first()
        for col, expr in set_exprs.items():
            if probe[col]:
                raise ValueError(
                    f"update_where: SET {col} = {expr!r} does not cast "
                    f"to {df.schema[col].dataType.simpleString()} for "
                    f"{probe[col]} matched row(s) — refusing to null "
                    "them silently"
                )

    def _rewrite_where(
        self,
        table: str,
        predicates,
        tag: str,
        transform,
        enforce_checks: bool = False,
        known_matched: int | None = None,
    ) -> int:
        from pyspark.sql import functions as F

        # A copy-on-write rewrite JOINS an open transaction (that is
        # what makes cascading FK deletes and BEGIN-block DML atomic)
        # — but only for a table this transaction has NOT yet staged:
        # candidate discovery anchors to the committed snapshot, so a
        # rewrite over a table with pending staged dirs would silently
        # drop them from the replace list.
        if self._pending is not None and table in self._pending:
            raise RuntimeError(
                f"{tag}_where on {table!r}: this transaction already "
                "staged writes to it; commit first (a rewrite anchors "
                "to the committed snapshot and would drop them)"
            )
        cmap = self.colmap(table)
        dnf_logical = self._as_dnf(predicates)
        dnf = self._phys_dnf(cmap, dnf_logical)  # pruning + carry checks
        snapshot = self._committed_rels(table)
        if snapshot is None:
            raise FileNotFoundError(f"{table!r} not in manifest")
        touched: dict[str, list[str]] = {}  # dir -> candidate rel files
        linked: list[tuple[str, str, dict | None, dict | None]] = []
        for rel_dir in snapshot:
            d = os.path.join(self.root, rel_dir)
            stats = blooms.attach_blooms(
                filestats.read_dir_stats(d), d, dnf
            )
            files = self._dir_parquet_files(d)
            # candidates = UNION over the OR's disjuncts: a file is
            # carried untouched only when EVERY branch proves no match
            cand = set(filestats.prune_files_dnf(stats, files, dnf))
            entries = (stats or {}).get("files", {})
            bfiles = (blooms.read_dir_blooms(d) or {}).get("files", {})
            for f in files:
                if f in cand:
                    touched.setdefault(d, []).append(f)
                else:
                    linked.append((d, f, entries.get(f), bfiles.get(f)))
        if not touched:
            return 0  # stats prove nothing matches: no rewrite, no version
        stored = self._stored_schema(table)
        # hive partition columns from every touched dir's layout (the
        # path segments give the partition order); a table whose dirs
        # DISAGREE on layout cannot be rewritten faithfully — refuse
        # rather than silently flattening part of it
        layouts = set()
        for d, fs in touched.items():
            layouts.add(
                tuple(
                    seg.partition("=")[0]
                    for seg in fs[0].split(os.sep)[:-1]
                    if "=" in seg
                )
            )
        if len(layouts) > 1:
            raise ValueError(
                f"{tag}_where: table {table!r} mixes partition layouts "
                f"{sorted(layouts)!r} across its data dirs; compact it "
                "to one layout first"
            )
        part_cols = list(layouts.pop()) if layouts else []
        dv = self.dv_info(table)
        parts = []
        for d, fs in touched.items():
            r = self.spark.read.option("basePath", d)
            if stored is not None:
                r = r.schema(stored)
            part = r.parquet(*(os.path.join(d, f) for f in fs))
            # pending deletion vectors subtract BEFORE the rewrite: the
            # rewritten candidate files materialize their deletes (and
            # the replace-commit prunes their vector entries); carried
            # files keep their names, so their vectors survive intact
            parts.append(self._dv_annotate(part) if dv else part)
        cand_df = parts[0]
        for p in parts[1:]:
            cand_df = cand_df.unionByName(p, allowMissingColumns=True)
        if dv:
            cand_df = self._dv_strip(cand_df, dv)  # one anti-join total
        # the transform (and the user's SET expressions) see LOGICAL
        # names; the staged rewrite translates back to physical below
        cand_df = self._to_logical(cand_df, cmap)
        match = F.coalesce(
            filestats.dnf_condition(dnf_logical), F.lit(False)
        )  # NULL never matches
        # the UPDATE pre-probe's small path already counted the matched
        # rows over the same predicate and snapshot — skip the gate scan
        n_matched = (
            known_matched
            if known_matched is not None
            else cand_df.filter(match).count()
        )
        if n_matched == 0:
            # conservative candidates held no true matches: still no
            # rewrite, no version
            return 0
        new_df = self._to_physical_frame(transform(cand_df, match), cmap)
        # re-apply the table's recorded clustering to the rewritten slice
        # (file granularity preserved: one output file per candidate
        # file), so selective predicates keep their pre-DML skip rate —
        # without this every DELETE/UPDATE quietly unsorts its rewrite
        # and data skipping degrades until the next manual re-cluster
        spec = self.layout(table)
        if spec is not None:
            n_out = sum(len(fs) for fs in touched.values())
            new_df = self._apply_layout(new_df, spec, max(1, n_out))
        def _stage_rewrite():
            rel = self._stage_dir(table)
            stage = os.path.join(self.root, rel)
            w = new_df.write.mode("overwrite")
            if part_cols:
                w = w.partitionBy(*part_cols)
            w.parquet(stage)
            if enforce_checks:
                # rewritten candidates re-state surviving rows — the
                # cross-key probe would self-collide; UPDATE SET on a
                # UNIQUE column is pre-probed in _check_update_keys
                # (post-SET keys vs the keys the update doesn't retire)
                self._enforce_checks(table, stage, cross_table=False)
            # carry untouched files by hardlink, preserving layout
            reuse = {}
            bloom_reuse = {}
            for d, f, entry, bentry in linked:
                dst = os.path.join(stage, f)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.link(os.path.join(d, f), dst)
                if entry is not None:
                    # the transient attach_blooms annotation must not
                    # leak into the persisted stats sidecar
                    e = {k: v for k, v in entry.items() if k != "bloom"}
                    reuse[f] = e
                if bentry is not None:
                    bloom_reuse[f] = bentry
            self._write_stage_stats(
                rel, reuse=reuse or None, table=table,
                bloom_reuse=bloom_reuse or None,
            )
            self._pending[table] = [rel]
            self._note_replace(table, rel, schema=stored)
            # anchor conflict detection to the pre-DML snapshot (the
            # compact() precedent): a write landing between the snapshot
            # read and this commit must conflict, never vanish
            self._intents[table]["base"] = snapshot

        auto = self._require_txn()
        if auto is not None:
            with auto:
                _stage_rewrite()
        else:
            _stage_rewrite()  # joins the caller's open transaction
        return n_matched

    def _dv_matched(self, table: str, predicates):
        """Shared front half of the merge-on-read DML paths: the LIVE
        (vector-subtracted), identity-annotated candidate rows that
        match the predicate, checkpointed so positions and images read
        the files once. Returns (matched_df, snapshot, dv_info, match)
        or None when stats prove no candidates."""
        from pyspark.sql import functions as F

        if self._pending is not None:
            raise RuntimeError("merge-on-read DML inside an open transaction")
        dnf = self._phys_dnf(self.colmap(table), self._as_dnf(predicates))
        snapshot = self._committed_rels(table)
        if snapshot is None:
            raise FileNotFoundError(f"{table!r} not in manifest")
        info = self.dv_info(table) or {"dirs": [], "files": {}}
        names: list[str] = []
        touched: list[tuple[str, list[str]]] = []
        for rel_dir in snapshot:
            d = os.path.join(self.root, rel_dir)
            stats = blooms.attach_blooms(
                filestats.read_dir_stats(d), d, dnf
            )
            files = self._dir_parquet_files(d)
            names.extend(self._dv_name(f) for f in files)
            cand = filestats.prune_files_dnf(stats, files, dnf)
            if cand:
                touched.append((d, cand))
        if len(set(names)) != len(names):
            # basenames ARE the vector identity; Spark part-file names
            # carry per-job UUIDs so this is astronomically unlikely —
            # but a collision would fold one file's vector into another
            raise ValueError(
                f"table {table!r} carries duplicate data-file names; "
                "compact it before using deletion vectors"
            )
        if not touched:
            return None
        stored = self._stored_schema(table)
        parts = []
        for d, fs in touched:
            r = self.spark.read.option("basePath", d)
            if stored is not None:
                r = r.schema(stored)
            parts.append(
                self._dv_annotate(
                    r.parquet(*(os.path.join(d, f) for f in fs))
                )
            )
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p, allowMissingColumns=True)
        live = self._dv_antijoin(cand, info)
        match = F.coalesce(filestats.dnf_condition(dnf), F.lit(False))
        # one read of the candidate files serves the per-file counts,
        # the vector write, and (for UPDATE) the appended images —
        # exchange reuse does not span separate actions
        matched = live.filter(match).localCheckpoint(eager=True)
        # hive partition columns of the touched dirs (so an UPDATE's
        # appended images keep the table's layout, e.g. _kb buckets)
        part_cols = [
            seg.partition("=")[0]
            for seg in touched[0][1][0].split(os.sep)[:-1]
            if "=" in seg
        ]
        return matched, snapshot, info, match, part_cols

    def _stage_dv(self, table: str, positions: DataFrame, n: int) -> str:
        """Write a (file, pos) vector relation as a staged dir; returns
        the rel path. Sized ~20M positions per output file."""
        rel = self._stage_dir(table)
        nout = max(1, -(-n // 20_000_000))
        positions.select(self._DV_FILE, self._DV_POS).repartition(
            nout
        ).write.mode("overwrite").parquet(os.path.join(self.root, rel))
        return rel

    def _delete_where_dv(self, table: str, predicates) -> int:
        from pyspark.sql import functions as F

        got = self._dv_matched(table, predicates)
        if got is None:
            return 0
        matched, snapshot, info, _match, _pc = got
        per_file = {
            r[self._DV_FILE]: r["n"]
            for r in matched.groupBy(self._DV_FILE)
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n = sum(per_file.values())
        if n == 0:
            return 0  # conservative candidates held no live matches
        with self.transaction(f"dv-delete-{table}"):
            rel = self._stage_dv(table, matched, n)
            self._intents[table] = {
                "mode": "dv",
                "dv_add": {
                    "dir": rel,
                    "files": per_file,
                    "expect_tables": snapshot,
                    "expect_dirs": list(info["dirs"]),
                },
            }
        return n

    def _update_where_dv(self, table: str, predicates, set_exprs: dict) -> int:
        from pyspark.sql import functions as F

        got = self._dv_matched(table, predicates)
        if got is None:
            return 0
        matched, snapshot, info, _match, part_cols = got
        per_file = {
            r[self._DV_FILE]: r["n"]
            for r in matched.groupBy(self._DV_FILE)
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n = sum(per_file.values())
        if n == 0:
            return 0
        # SET expressions speak logical names (every matched row is a
        # hit, so the probe condition is simply TRUE); append()
        # translates the images back to physical staging names
        images = self._to_logical(matched, self.colmap(table))
        self._probe_set_casts(images, F.lit(True), set_exprs, table)
        # one select = simultaneous SET semantics (see update_where's
        # rewrite transform — the two paths must produce identical rows)
        new = {
            c: F.expr(e).cast(images.schema[c].dataType)
            for c, e in set_exprs.items()
        }
        images = images.select(
            *[new.get(c, F.col(c)).alias(c) for c in images.columns]
        )
        meta = self.bucket_meta(table)
        if meta is not None and set(meta["key_cols"]) & set(set_exprs):
            # SET moved a bucket key: the appended images re-derive
            # their placement hash so the partitioned append routes
            # them into their NEW _kb dirs (the old positions retire
            # via the deletion vector in the same commit)
            from gcp_datalake_pipeline_spark.storage import kb_col

            images = images.withColumn(
                "_kb", kb_col(list(meta["key_cols"]), meta["num_buckets"])
            )
        images = images.drop(self._DV_FILE, self._DV_POS)
        with self.transaction(f"dv-update-{table}"):
            # the appended dir gets checks/stats/blooms via append();
            # the vector rides the same commit, so readers see the
            # delete+insert pair atomically
            self.append(
                images, table, partition_cols=part_cols or None,
                unique_cross=False,  # these keys retire via the vector
            )
            rel = self._stage_dv(table, matched, n)
            self._intents[table]["dv_add"] = {
                "dir": rel,
                "files": per_file,
                "expect_tables": snapshot,
                "expect_dirs": list(info["dirs"]),
            }
        return n

    # -- CHECK constraints ----------------------------------------------------
    #
    # Delta-style write-time data quality gates: named SQL boolean
    # expressions stored in the manifest (``manifest["checks"][table]``)
    # and enforced against every staged write BEFORE it can publish —
    # append, overwrite, and the touched partitions of a bucketed merge
    # (hardlink-carried partitions were validated when they first landed,
    # so merge enforcement stays candidate-proportional at 100 TB).
    # SQL-standard semantics: a row violates only when the expression is
    # FALSE; NULL passes. Like Delta, adding a constraint validates the
    # EXISTING rows first. (A writer that staged before a concurrent
    # add_check committed enforces the checks it saw — the same
    # read-snapshot semantics every other manifest read has.)

    @staticmethod
    def _violates(expr: str):
        from pyspark.sql import functions as F

        return (
            F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
            == F.lit(False)
        )

    def checks(self, table: str) -> dict[str, str]:
        """The table's CHECK constraints as {name: sql_expr}."""
        return dict(
            self._read_manifest(strict=False).get("checks", {}).get(table, {})
        )

    # -- persisted clustering layout ------------------------------------------
    #
    # Delta records a table's clustering columns in its metadata so every
    # OPTIMIZE — and every DML rewrite — re-applies the layout instead of
    # silently unsorting rewritten files. Same here: ``compact(cluster_by=
    # ...)`` / ``compact(zorder_by=...)`` record the spec in the manifest
    # (``manifest["layouts"][table]``), a plain ``compact()`` re-applies
    # the recorded spec, and ``_rewrite_where`` re-sorts its rewritten
    # candidate slice by it — so file-skipping selectivity survives every
    # DELETE/UPDATE pass instead of quietly degrading until someone
    # remembers to re-cluster by hand. The record is versioned manifest
    # state: it time-travels, restores, and clones with the data.

    def layout(self, table: str) -> dict | None:
        """The table's recorded clustering spec, or None:
        ``{"kind": "zorder", "cols": [...], "bits": n}`` or
        ``{"kind": "cluster", "cols": [...]}``."""
        spec = (
            self._read_manifest(strict=False).get("layouts", {}).get(table)
        )
        return dict(spec) if spec is not None else None

    def _apply_layout(self, df: DataFrame, spec: dict, n_files: int):
        """Re-cluster ``df`` per a recorded layout spec. Conservative:
        a spec referencing columns the frame no longer has (schema
        evolution) passes the frame through unsorted — correctness
        never depends on layout, only selectivity does."""
        if spec is None or any(c not in df.columns for c in spec["cols"]):
            return df
        if spec["kind"] == "zorder":
            from gcp_datalake_pipeline_spark.zorder import apply_zorder

            return apply_zorder(
                df, spec["cols"], n_files, bits=spec.get("bits", 8)
            )
        return df.repartitionByRange(
            n_files, *spec["cols"]
        ).sortWithinPartitions(*spec["cols"])

    # -- bloom-filter indexes -------------------------------------------------
    #
    # Delta's per-file Bloom filter index for point predicates: min/max
    # stats cannot prune an ``=`` on a high-cardinality key scattered
    # across files (every file's range spans the key space), which at
    # 100 TB makes the GDPR id-delete and the point SELECT full scans.
    # ``set_bloom_index`` records the indexed columns in the manifest
    # (``manifest["blooms"][table]``) and backfills per-dir sidecars;
    # every later write builds its staged dir's sidecar in the same
    # distributed pass that collects stats (``blooms.py``). Probes ride
    # the existing pruning machinery via ``blooms.attach_blooms`` — a
    # bloom miss PROVES absence, so skipping stays a superset
    # guarantee. The config is versioned manifest state: it restores
    # and drops with the table.

    def bloom_index(self, table: str) -> dict | None:
        """The table's bloom-index config, or None:
        ``{"columns": {col: "int"|"long"|"string"}, "bits_per_row": n}``."""
        cfg = self._read_manifest(strict=False).get("blooms", {}).get(table)
        return json.loads(json.dumps(cfg)) if cfg is not None else None

    # -- deletion vectors (merge-on-read DML) ----------------------------------
    #
    # Delta's deletion vectors, recovered as parquet sidecar relations:
    # ``delete_where(..., mode="dv")`` marks the matched rows DELETED by
    # writing their ``(file, position)`` pairs to a staged DV dir and
    # registering it in ``manifest["dvs"][table]`` — NO data file is
    # rewritten or even re-staged (at 100 TB the GDPR-class point delete
    # costs O(matched rows), not O(candidate files)). Readers subtract
    # the vectors with one anti-join keyed on the scan's hidden
    # ``_metadata`` (file name, row index) columns — broadcast while the
    # pending-delete count is small (the steady state), and folded away
    # entirely by the next OPTIMIZE/compact, which materializes the
    # deletes into rewritten files and clears the table's vectors.
    #
    # Identity: vectors key rows by (data-file NAME, row index), where
    # the name is the filename plus any trailing Hive-partition path
    # segments (``_kb=3/part-...parquet``) — one partitioned write job
    # reuses its task indices across partition dirs, so the bare
    # basename alone is NOT unique, but the partition-qualified name
    # is (part-file names carry a per-job UUID). Unlike absolute paths
    # this name survives hardlink carries (DML/merge re-stage
    # untouched files under new dirs with the same relative layout),
    # and unlike inodes it survives the copy fallback of
    # cross-filesystem clones AND can never be recycled onto unrelated
    # new files (a fresh write always mints fresh names — a dangling
    # vector row can match nothing). ``delete``/``update`` refuse on
    # (astronomically unlikely) duplicate names.
    #
    # Every replace-commit prunes ``dvs[table]["files"]`` to the
    # basenames its new dir list still carries, so the per-file counts
    # that drive metadata COUNT/MIN/MAX stay exact, and ``table_changes``
    # reads a commit's NEW dv dirs as its delete rows (bounded by the
    # affected files). Vector dirs ride vacuum/clone/restore/time travel
    # exactly like data dirs: referenced rel paths in versioned
    # manifests.

    _DV_FILE = "__dv_file"
    _DV_POS = "__dv_pos"
    # trailing run of "="-bearing segments plus the filename — the
    # Spark-side twin of _dv_name (keep the two in lockstep)
    _DV_NAME_RE = r"((?:[^/]*=[^/]*/)*[^/]*)$"

    @staticmethod
    def _dv_name(rel_file: str) -> str:
        """A data file's vector identity: filename plus any trailing
        Hive-partition segments of its dir-relative path."""
        segs = rel_file.split(os.sep)
        out = [segs[-1]]
        for s in reversed(segs[:-1]):
            if "=" not in s:
                break
            out.insert(0, s)
        return "/".join(out)

    def dv_info(self, table: str, version: int | None = None) -> dict | None:
        """The table's pending deletion-vector state, or None:
        ``{"dirs": [rel, ...], "files": {basename: n_deleted}}``.
        ``version`` resolves against a retained snapshot."""
        m = (
            self._read_manifest(strict=False)
            if version is None
            else self._version_manifest(version)
        )
        e = m.get("dvs", {}).get(table)
        return json.loads(json.dumps(e)) if e is not None else None

    def dv_count(self, table: str) -> int:
        """Rows deleted by pending vectors (not yet folded by compact)."""
        info = self.dv_info(table)
        return sum((info or {}).get("files", {}).values())

    def _dv_schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField(self._DV_FILE, T.StringType()),
                T.StructField(self._DV_POS, T.LongType()),
            ]
        )

    def _dv_relation(self, info: dict | None) -> DataFrame | None:
        """The (file, pos) relation of pending deletes, or None."""
        if not info or not info.get("files"):
            return None
        paths = [os.path.join(self.root, r) for r in info["dirs"]]
        return self.spark.read.schema(self._dv_schema()).parquet(*paths)

    def _dv_annotate(self, df: DataFrame) -> DataFrame:
        """Materialize the hidden scan identity (file basename, row
        index) as real columns — must run on the SCAN relation, before
        any union or projection hides ``_metadata``."""
        from pyspark.sql import functions as F

        clash = [c for c in (self._DV_FILE, self._DV_POS) if c in df.columns]
        if clash:
            raise ValueError(
                f"column(s) {clash} are reserved for deletion-vector "
                "bookkeeping; rename them"
            )
        return df.select(
            "*",
            F.regexp_extract(
                F.col("_metadata.file_path"), self._DV_NAME_RE, 1
            ).alias(self._DV_FILE),
            F.col("_metadata.row_index").alias(self._DV_POS),
        )

    def _dv_antijoin(self, df: DataFrame, info: dict | None) -> DataFrame:
        """Drop vector-deleted rows from an annotated scan (keeps the
        annotation columns). Broadcast while the pending count is small
        — the steady state between compactions; a huge backlog falls
        back to a shuffle join (honest, and the cue to OPTIMIZE)."""
        from pyspark.sql import functions as F

        rel = self._dv_relation(info)
        if rel is None:
            return df
        if sum(info["files"].values()) <= 1_000_000:
            rel = F.broadcast(rel)
        return df.join(
            rel, on=[self._DV_FILE, self._DV_POS], how="left_anti"
        )

    def _dv_strip(self, df: DataFrame, info: dict | None) -> DataFrame:
        return self._dv_antijoin(df, info).drop(
            self._DV_FILE, self._DV_POS
        )

    # -- table properties -------------------------------------------------------
    #
    # Delta TBLPROPERTIES, reduced to the keys this engine actually
    # honors — unknown keys and values refuse loudly (a typo'd property
    # that silently does nothing is worse than an error).
    #
    #   dml.mode = copy-on-write (default) | merge-on-read
    #     routes the SQL façade's DELETE/UPDATE through deletion
    #     vectors instead of candidate-file rewrites.

    _KNOWN_PROPERTIES = {"dml.mode": {"copy-on-write", "merge-on-read"}}

    def table_properties(self, table: str) -> dict:
        """The table's recorded properties (empty dict when none)."""
        props = (
            self._read_manifest(strict=False)
            .get("properties", {})
            .get(table)
        )
        return dict(props) if props else {}

    def set_table_property(self, table: str, key: str, value: str) -> None:
        """``ALTER TABLE ... SET TBLPROPERTIES`` — one metadata commit."""
        if self._pending is not None:
            raise RuntimeError(
                "set_table_property inside an open transaction"
            )
        if not self.exists(table):
            raise FileNotFoundError(f"{table!r} not in manifest")
        allowed = self._KNOWN_PROPERTIES.get(key)
        if allowed is None:
            raise ValueError(
                f"unknown table property {key!r}; supported: "
                f"{sorted(self._KNOWN_PROPERTIES)}"
            )
        if value not in allowed:
            raise ValueError(
                f"property {key!r} takes {sorted(allowed)}, not {value!r}"
            )

        def mutate(m):
            m.setdefault("properties", {}).setdefault(table, {})[key] = value

        self._publish_meta(mutate, f"set-property-{table}-{key}")

    def unset_table_property(self, table: str, key: str) -> None:
        """``ALTER TABLE ... UNSET TBLPROPERTIES`` — back to defaults."""
        if self._pending is not None:
            raise RuntimeError(
                "unset_table_property inside an open transaction"
            )
        if key not in self.table_properties(table):
            raise KeyError(f"table {table!r} has no property {key!r}")

        def mutate(m):
            m["properties"][table].pop(key, None)
            if not m["properties"][table]:
                m["properties"].pop(table)
            if not m.get("properties"):
                m.pop("properties", None)

        self._publish_meta(mutate, f"unset-property-{table}-{key}")

    # -- column mapping (metadata-only RENAME / DROP COLUMN) -------------------
    #
    # Delta column mapping, recovered as a manifest-level name map: data
    # files keep their PHYSICAL column names forever; ``rename_column``
    # records ``{physical: logical}`` and ``drop_column`` records the
    # physical name as dropped — both are pure manifest commits, so at
    # 100 TB a rename or drop touches ZERO data bytes. Readers scan
    # physically and re-label at the end; writers accept logical frames
    # and translate back before staging; the stats/bloom sidecars and
    # clustering layouts stay keyed physically (they describe the
    # files), and every predicate-taking surface translates logical ->
    # physical at its entry. Reusing a dropped physical name is refused
    # until a full rewrite retires it (old files still carry values
    # that would silently leak into the reborn column otherwise).

    def colmap(self, table: str, version: int | None = None) -> dict | None:
        """The table's column mapping, or None:
        ``{"renames": {physical: logical}, "dropped": [physical, ...]}``."""
        m = (
            self._read_manifest(strict=False)
            if version is None
            else self._version_manifest(version)
        )
        e = m.get("colmaps", {}).get(table)
        return json.loads(json.dumps(e)) if e is not None else None

    @staticmethod
    def _phys_name(cmap: dict | None, name: str) -> str:
        """Logical -> physical for one column (dropped names refuse:
        a predicate or aggregate over a dropped column would silently
        read stale values out of old files)."""
        if not cmap:
            return name
        if name in cmap.get("dropped", []):
            raise ValueError(f"column {name!r} was dropped")
        inv = {v: k for k, v in cmap.get("renames", {}).items()}
        return inv.get(name, name)

    def _phys_dnf(self, cmap: dict | None, dnf):
        if not cmap:
            return dnf
        return [
            [(self._phys_name(cmap, p[0]), *p[1:]) for p in conj]
            for conj in dnf
        ]

    @staticmethod
    def _to_logical(df: DataFrame, cmap: dict | None) -> DataFrame:
        """Physical scan -> logical relation: re-label renamed columns,
        project dropped ones away. Columns outside the map (including
        the DV annotation pair) pass through."""
        if not cmap:
            return df
        for phys, logical in cmap.get("renames", {}).items():
            if phys in df.columns:
                df = df.withColumnRenamed(phys, logical)
        drop = [c for c in cmap.get("dropped", []) if c in df.columns]
        return df.drop(*drop) if drop else df

    @staticmethod
    def _to_physical_frame(df: DataFrame, cmap: dict | None) -> DataFrame:
        """Logical writer input -> physical staging frame. Refuses
        frames that would resurrect a dropped physical name (new rows
        would be invisible to readers — or worse, un-drop old values)."""
        if not cmap:
            return df
        clash = [c for c in df.columns if c in cmap.get("dropped", [])]
        if clash:
            raise ValueError(
                f"column(s) {clash} were dropped from this table; a full "
                "rewrite must retire the old values before the name can "
                "return"
            )
        for phys, logical in cmap.get("renames", {}).items():
            if logical in df.columns:
                df = df.withColumnRenamed(logical, phys)
        return df

    def logical_schema(self, table: str):
        """The committed schema as USERS see it — renames applied,
        dropped columns projected away (:meth:`_stored_schema` stays
        the physical scan schema)."""
        from pyspark.sql import types as T

        stored = self._stored_schema(table)
        cmap = self.colmap(table)
        if stored is None or not cmap:
            return stored
        ren = cmap.get("renames", {})
        dropped = set(cmap.get("dropped", []))
        return T.StructType(
            [
                T.StructField(ren.get(f.name, f.name), f.dataType, f.nullable)
                for f in stored.fields
                if f.name not in dropped
            ]
        )

    def _refuse_mapped_refs(self, table: str, name: str, verb: str) -> None:
        """Shared rename/drop guards: a column wired into CHECK
        constraints, a bucket layout, or a materialized-view spec
        cannot be re-labeled out from under them."""
        for cname, expr in self.checks(table).items():
            import re as _re

            if isinstance(expr, dict):
                if name in expr.get("unique", ()):
                    raise ValueError(
                        f"cannot {verb} {name!r}: UNIQUE constraint "
                        f"{cname!r} covers it; drop the constraint first"
                    )
                if name in expr.get("fk", {}).get("cols", ()):
                    raise ValueError(
                        f"cannot {verb} {name!r}: FOREIGN KEY "
                        f"{cname!r} covers it; drop the constraint first"
                    )
                continue
            if _re.search(rf"\b{_re.escape(name)}\b", expr):
                raise ValueError(
                    f"cannot {verb} {name!r}: CHECK constraint {cname!r} "
                    f"references it ({expr}); drop the constraint first"
                )
        meta = self.bucket_meta(table)
        if meta and name in (meta.get("key_cols") or []):
            raise ValueError(
                f"cannot {verb} {name!r}: it is a bucket key of "
                f"{table!r}; re-bucket the table first"
            )
        if name == "_kb":
            raise ValueError("'_kb' is the reserved bucket-layout column")
        # a column REFERENCED by another table's FOREIGN KEY must not
        # be re-labeled out from under the child
        for child, cname, spec in self._fk_children(table):
            if name in spec["parent_cols"]:
                raise ValueError(
                    f"cannot {verb} {name!r}: FOREIGN KEY {cname!r} of "
                    f"{child!r} references it; drop the constraint first"
                )
        views = self._read_manifest(strict=False).get("views", {})
        for vname, spec in views.items():
            if vname == table:
                raise ValueError(
                    f"cannot {verb} columns of materialized view "
                    f"{table!r}; drop and recreate the view"
                )
            if spec.get("source") != table:
                continue
            used = (
                set(spec.get("keys", []))
                | set(spec.get("sums", {}).values())
                | set((spec.get("mins") or {}).values())
                | set((spec.get("maxs") or {}).values())
            )
            if name in used:
                raise ValueError(
                    f"cannot {verb} {name!r}: materialized view {vname!r} "
                    "aggregates it; drop the view first"
                )

    def rename_column(self, table: str, old: str, new: str) -> None:
        """ALTER TABLE ... RENAME COLUMN — one manifest commit, zero
        data movement. ``old`` is the current LOGICAL name; ``new``
        must be a fresh identifier (colliding with any current logical
        OR physical name is refused — a physical collision would make
        a later write ambiguous). Renaming back to the physical name
        erases the mapping entry."""
        import re as _re

        if self._pending is not None:
            raise RuntimeError("rename_column inside an open transaction")
        stored = self._stored_schema(table)
        if stored is None:
            if not self.exists(table):
                raise FileNotFoundError(f"{table!r} not in manifest")
            raise ValueError(
                f"table {table!r} predates schema tracking; rewrite it "
                "once (compact) before ALTER TABLE"
            )
        if not _re.fullmatch(r"\w+", new):
            raise ValueError(f"bad column name {new!r}")
        logical = self.logical_schema(table).fieldNames()
        if old not in logical:
            raise ValueError(f"no column {old!r} on {table!r}")
        cmap = self.colmap(table) or {"renames": {}, "dropped": []}
        if new == old:
            raise ValueError("RENAME COLUMN to the same name")
        physical = self._phys_name(cmap, old)
        if (
            new in logical
            # a foreign physical name would make later writes ambiguous
            # (renaming BACK to the column's OWN physical name is fine —
            # it just erases the mapping entry)
            or (new in stored.fieldNames() and new != physical)
            or new in cmap.get("dropped", [])
        ):
            raise ValueError(
                f"column name {new!r} is already in use on {table!r} "
                "(as a logical, physical, or dropped name)"
            )
        self._refuse_mapped_refs(table, old, "rename")

        def mutate(m):
            cm = m.setdefault("colmaps", {}).setdefault(
                table, {"renames": {}, "dropped": []}
            )
            if new == physical:
                cm["renames"].pop(physical, None)
            else:
                cm["renames"][physical] = new
            if not cm["renames"] and not cm["dropped"]:
                m["colmaps"].pop(table)
            if not m.get("colmaps"):
                m.pop("colmaps", None)

        self._publish_meta(mutate, f"rename-column-{table}-{old}-{new}")

    def drop_column(self, table: str, name: str) -> None:
        """ALTER TABLE ... DROP COLUMN — one manifest commit, zero data
        movement: the physical column stays in the files (old snapshots
        still read it; vacuumed-horizon rewrites retire it) but every
        logical surface projects it away. The name cannot be re-added
        until a full rewrite retires the stale values."""
        if self._pending is not None:
            raise RuntimeError("drop_column inside an open transaction")
        stored = self._stored_schema(table)
        if stored is None:
            if not self.exists(table):
                raise FileNotFoundError(f"{table!r} not in manifest")
            raise ValueError(
                f"table {table!r} predates schema tracking; rewrite it "
                "once (compact) before ALTER TABLE"
            )
        logical = self.logical_schema(table).fieldNames()
        if name not in logical:
            raise ValueError(f"no column {name!r} on {table!r}")
        if len(logical) <= 1:
            raise ValueError(f"cannot drop the last column of {table!r}")
        self._refuse_mapped_refs(table, name, "drop")
        cmap = self.colmap(table) or {"renames": {}, "dropped": []}
        physical = self._phys_name(cmap, name)
        # a Hive partition column IS the directory layout: dropping it
        # would strand later rewrites (partitionBy over a projected-away
        # column) — re-layout the table first
        for d in self._data_dirs(table):
            for f in self._dir_parquet_files(d):
                if any(
                    seg.partition("=")[0] == physical
                    for seg in f.split(os.sep)[:-1]
                ):
                    raise ValueError(
                        f"cannot drop {name!r}: it is a partition column "
                        f"of {table!r}'s layout; compact to a new layout "
                        "first"
                    )

        def mutate(m):
            cm = m.setdefault("colmaps", {}).setdefault(
                table, {"renames": {}, "dropped": []}
            )
            cm["renames"].pop(physical, None)
            cm["dropped"].append(physical)

        self._publish_meta(mutate, f"drop-column-{table}-{name}")

    @staticmethod
    def _widening_ok(old, new) -> bool:
        """Delta-style type-widening matrix: integral up-casts, float →
        double, integral → decimal with enough integer digits, decimal
        → decimal with no loss on either side of the point. Everything
        the Spark 4 parquet reader promotes natively (probed) and
        nothing that can lose a value."""
        from pyspark.sql import types as T

        order = {
            T.ByteType: 0, T.ShortType: 1, T.IntegerType: 2,
            T.LongType: 3,
        }
        ot, nt = type(old), type(new)
        if ot in order and nt in order:
            return order[nt] > order[ot]
        if isinstance(old, T.FloatType) and isinstance(new, T.DoubleType):
            return True
        if ot in order and isinstance(new, T.DecimalType):
            need = {0: 3, 1: 5, 2: 10, 3: 20}[order[ot]]
            return new.precision - new.scale >= need
        if isinstance(old, T.DecimalType) and isinstance(
            new, T.DecimalType
        ):
            return (
                new.scale >= old.scale
                and new.precision - new.scale
                >= old.precision - old.scale
                and (new.precision, new.scale)
                != (old.precision, old.scale)
            )
        return False

    def widen_column(
        self, table: str, name: str, dtype, rebuild: bool = False
    ) -> None:
        """``ALTER TABLE ... ALTER COLUMN c TYPE <wider>`` — type
        widening as a PURE METADATA commit (Delta's type-widening
        feature): the committed schema's field changes type, zero files
        move, and the committed-schema scan promotes old files' values
        natively (byte→short→int→long, float→double, integral→decimal,
        decimal precision growth — the Spark 4 parquet reader does the
        up-cast; probed, and the matrix admits nothing lossy).

        Refusals, each a silent-corruption on the other side of it:
        - narrowing or cross-family changes (the matrix);
        - BUCKET KEY columns — ``xxhash64`` is type-dependent, so the
          same logical value would hash to a DIFFERENT ``_kb`` bucket
          under the new type and every pruned read would miss rows;
        - BLOOM-INDEXED columns — the sidecar bitmaps hold old-type
          hashes and probes under the new type would false-skip files.

        ``rebuild=True`` (``ALTER COLUMN ... TYPE ... REBUILD``) lifts
        both refusals by paying the honest cost instead of corrupting:
        a bucket-key widening rewrites the table ONCE with the column
        cast and ``_kb`` recomputed under the new type — schema, data,
        and placement land in ONE commit, so there is no window where
        pruned probes hash the wrong type; a bloom-only widening drops
        the sidecars, commits the metadata widen, and re-indexes under
        the new type (sidecars are pure acceleration, so the brief
        index-less window is merely slower, never wrong).
        A ``table_changes`` window crossing the widening refuses like
        any type change (the feed contract); start consumers at or
        after it."""
        from pyspark.sql import types as T

        if self._pending is not None:
            raise RuntimeError("widen_column inside an open transaction")
        stored = self._stored_schema(table)
        if stored is None:
            if not self.exists(table):
                raise FileNotFoundError(f"{table!r} not in manifest")
            raise ValueError(
                f"table {table!r} predates schema tracking; rewrite it "
                "once (compact) before ALTER TABLE"
            )
        if isinstance(dtype, str):
            dtype = T.StructType.fromDDL(f"x {dtype}")[0].dataType
        logical = self.logical_schema(table).fieldNames()
        if name not in logical:
            raise ValueError(f"no column {name!r} on {table!r}")
        physical = self._phys_name(self.colmap(table), name)
        old = stored[physical].dataType
        if not self._widening_ok(old, dtype):
            raise ValueError(
                f"ALTER COLUMN TYPE on {table}.{name}: "
                f"{old.simpleString()} -> {dtype.simpleString()} is not "
                "a widening (allowed: byte<short<int<long, "
                "float->double, integral->decimal with enough integer "
                "digits, decimal growth losing nothing on either side "
                "of the point)"
            )
        meta = self.bucket_meta(table)
        is_key = meta is not None and (
            name in meta["key_cols"] or physical in meta["key_cols"]
        )
        if is_key and not rebuild:
            raise ValueError(
                f"cannot widen {name!r}: it is a bucket key of "
                f"{table!r} and xxhash64 placement is type-dependent — "
                "the same value would land in a different _kb bucket; "
                "ALTER COLUMN ... TYPE ... REBUILD rewrites placement "
                "in one commit"
            )
        ident = self.identity_spec(table)
        if ident is not None and name == ident["col"]:
            raise ValueError(
                f"cannot widen {name!r}: it is the GENERATED ALWAYS AS "
                f"IDENTITY column of {table!r} (ids mint as BIGINT)"
            )
        bloom = self.bloom_index(table)
        is_bloom = bloom is not None and (
            name in bloom.get("columns", ())
            or physical in bloom.get("columns", ())
        )
        if is_bloom and not rebuild:
            raise ValueError(
                f"cannot widen {name!r}: a bloom index covers it and "
                "its bitmaps hold old-type hashes (probes would "
                "false-skip files); ALTER COLUMN ... TYPE ... REBUILD "
                "re-indexes under the new type"
            )
        if is_key:
            if self.view_spec(table) is not None:
                raise ValueError(
                    f"cannot REBUILD-widen {name!r}: {table!r} is a "
                    "materialized view; drop and recreate the view"
                )
            # ONE commit: column cast + _kb recomputed under the new
            # type + schema recorded from the staged frame — no window
            # where a pruned probe hashes the wrong type. Bloom
            # sidecars (if any) rebuild from the new files on the
            # write path.
            from pyspark.sql import functions as F

            ren = (self.colmap(table) or {}).get("renames", {})
            logical_keys = [ren.get(k, k) for k in meta["key_cols"]]
            df = (
                self.read(table)
                .drop("_kb")
                .withColumn(name, F.col(name).cast(dtype))
            )
            self.overwrite_bucketed(
                df, table, meta["num_buckets"], logical_keys
            )
            return
        if is_bloom:
            # sidecars are pure acceleration: drop -> widen -> rebuild
            # under the new type; the index-less window is slower,
            # never wrong
            cfg = dict(bloom)
            self.drop_bloom_index(table)
        new_field = T.StructField(physical, dtype, True).jsonValue()

        def mutate(m):
            fields = m["schemas"][table]["fields"]
            for i, f in enumerate(fields):
                if f["name"] == physical:
                    fields[i] = new_field
                    return
            raise ConcurrentWriteError(
                f"column {physical!r} vanished from {table!r} under "
                "this ALTER; retry from a fresh read"
            )

        self._publish_meta(mutate, f"widen-column-{table}-{name}")
        if is_bloom:
            self.set_bloom_index(
                table,
                list(cfg["columns"]),
                bits_per_row=cfg.get("bits_per_row", 10),
                max_bitmap_bytes=cfg.get(
                    "max_bitmap_bytes", 256 * 1024 * 1024
                ),
                backfill=True,
            )

    def view_spec(self, name: str) -> dict | None:
        """A materialized view's recorded spec (see
        :mod:`~gcp_datalake_pipeline_spark.operators.matview`), or None:
        ``{"source": t, "keys": [...], "sums": {out: src}, "count_col":
        c, "as_of": v}`` — ``as_of`` is the source snapshot the view
        currently reflects (the refresh high-water mark)."""
        spec = self._read_manifest(strict=False).get("views", {}).get(name)
        return json.loads(json.dumps(spec)) if spec is not None else None

    def stream_watermark(self, consumer: str) -> dict | None:
        """A change-feed consumer's recorded watermark (see
        :mod:`~gcp_datalake_pipeline_spark.streaming.cdf`), or None:
        ``{"source": t, "as_of": v}`` — ``as_of`` is the last source
        version whose changes the consumer has applied. Committed
        atomically with the consumer's writes and conflict-checked on
        every advance, so a replayed or racing pump can never apply a
        window twice."""
        wm = (
            self._read_manifest(strict=False)
            .get("streams", {})
            .get(consumer)
        )
        return json.loads(json.dumps(wm)) if wm is not None else None

    def set_bloom_index(
        self,
        table: str,
        cols: list[str],
        bits_per_row: int = 10,
        backfill: bool = True,
        max_bitmap_bytes: int = 256 * 1024 * 1024,
    ) -> None:
        """Create/replace the bloom index on ``cols`` (int/long/string
        columns only — range-friendly types stay with min/max, which
        already prunes them). ``backfill`` builds sidecars for already-
        committed data dirs in place: the sidecar is purely additive
        acceleration, so appearing inside an immutable committed dir
        can never change results, only skip more files. Future writes
        maintain the index automatically.

        ``max_bitmap_bytes`` bounds the DRIVER memory a build may
        commit to: the per-dir merge holds one ``m/8``-byte bitmap per
        (file, column) with ``m ≈ rows × bits_per_row``, so a dir's
        footprint is ``≈ rows × bits_per_row / 8 × n_cols`` (10
        bits/row × 10M rows × 1 col ≈ 12.5 MB; the 256 MiB default
        covers ~200M rows × 1 col). An over-budget BACKFILL refuses
        loudly with the estimate and the levers (fewer columns, lower
        bits_per_row, a bigger budget); the recorded cap also rides
        the index config so a later oversized staged write skips its
        bloom build (best-effort, like every sidecar) instead of
        pressuring the driver."""
        if self._pending is not None:
            raise RuntimeError("set_bloom_index inside an open transaction")
        if not self.exists(table):
            raise FileNotFoundError(f"{table!r} not in manifest")
        stored = self._stored_schema(table)
        if stored is None:
            raise ValueError(
                f"{table!r} has no committed schema (pre-schema-tracking "
                "manifest); rewrite it once before indexing"
            )
        if not cols:
            raise ValueError("bloom index needs at least one column")
        # the index describes the FILES: record physical names (user
        # args arrive logical; read/count translate predicates the
        # same way, so probes keep lining up after renames)
        cols = [self._phys_name(self.colmap(table), c) for c in cols]
        types = {f.name: f.dataType.simpleString() for f in stored.fields}
        columns: dict[str, str] = {}
        for c in cols:
            if c not in types:
                raise ValueError(
                    f"bloom column {c!r} not in {table!r} schema "
                    f"({sorted(types)})"
                )
            fam = blooms.normalize_type(types[c])
            if fam is None:
                raise ValueError(
                    f"bloom column {c!r} has type {types[c]!r}; only "
                    "int/long/string columns are bloom-indexable (use "
                    "min/max stats for range-friendly types)"
                )
            columns[c] = fam
        if int(bits_per_row) < 1:
            raise ValueError("bits_per_row must be >= 1")
        if int(max_bitmap_bytes) < 1:
            raise ValueError("max_bitmap_bytes must be >= 1")
        if backfill:
            # refuse BEFORE publishing config or touching any sidecar:
            # the budget check must not leave a half-indexed table
            projected = max(
                (
                    blooms.dir_bitmap_bytes(
                        filestats.read_dir_stats(d),
                        len(columns),
                        int(bits_per_row),
                    )
                    for d in self._data_dirs(table)
                ),
                default=0,
            )
            if projected > int(max_bitmap_bytes):
                raise ValueError(
                    f"bloom backfill over {table!r} would merge "
                    f"~{projected / 1e6:.0f} MB of bitmaps on the driver "
                    f"(rows x bits_per_row/8 x {len(columns)} column(s)) "
                    f"— over the {int(max_bitmap_bytes) / 1e6:.0f} MB "
                    "budget. Index fewer columns, lower bits_per_row, "
                    "or raise max_bitmap_bytes explicitly."
                )
        cfg = {
            "columns": columns,
            "bits_per_row": int(bits_per_row),
            "max_bitmap_bytes": int(max_bitmap_bytes),
        }

        def mutate(m):
            m.setdefault("blooms", {})[table] = cfg

        self._publish_meta(mutate, f"bloom-index-{table}")
        if backfill:
            for d in self._data_dirs(table):
                existing = blooms.read_dir_blooms(d)
                if (
                    existing is not None
                    and existing.get("columns") == columns
                    and existing.get("bits_per_row") == cfg["bits_per_row"]
                ):
                    continue
                blooms.build_dir_blooms(
                    self.spark,
                    d,
                    columns,
                    filestats.read_dir_stats(d),
                    bits_per_row=cfg["bits_per_row"],
                )

    def drop_bloom_index(self, table: str) -> None:
        """Remove the bloom-index config AND the current data dirs'
        sidecars (sidecars are pure acceleration, so unlinking them
        from an immutable dir can never change results — hardlinked
        clones keep their own directory entries). Raises KeyError if
        no index exists."""
        if self._pending is not None:
            raise RuntimeError("drop_bloom_index inside an open transaction")
        if self.bloom_index(table) is None:
            raise KeyError(f"no bloom index on {table!r}")

        def mutate(m):
            m["blooms"].pop(table, None)
            if not m["blooms"]:
                m.pop("blooms")

        self._publish_meta(mutate, f"drop-bloom-index-{table}")
        for d in self._data_dirs(table):
            try:
                os.remove(os.path.join(d, blooms.BLOOM_FILE))
            except FileNotFoundError:
                pass

    def add_check(self, table: str, name: str, expr: str) -> None:
        """Register CHECK ``expr`` (a SQL boolean over the table's
        columns) under ``name``; every later write to ``table`` must
        satisfy it or the write fails with :class:`CheckViolation`.
        Existing rows are validated first (the Delta contract). The
        table may not exist yet — pre-registering checks before the
        first load is the pipeline-definition shape; the expression is
        then only parsed, and enforcement starts with the first write."""
        if self._pending is not None:
            raise RuntimeError("add_check inside an open transaction")
        from pyspark.sql import functions as F

        F.expr(expr)  # fail fast on unparseable SQL
        if self.exists(table):
            bad = self.read(table).filter(self._violates(expr)).count()
            if bad:
                raise CheckViolation(
                    f"cannot add CHECK {name!r} to {table!r}: {bad} existing "
                    f"row(s) violate ({expr})"
                )

        def mutate(m):
            m.setdefault("checks", {}).setdefault(table, {})[name] = expr

        self._publish_meta(mutate, f"add-check-{table}-{name}")

    def add_unique_constraint(
        self, table: str, name: str, cols: list[str]
    ) -> None:
        """Register a WRITE-ENFORCED UNIQUE constraint over ``cols``
        (``ALTER TABLE ... ADD CONSTRAINT nm UNIQUE (cols)`` / PRIMARY
        KEY): every later append/INSERT must neither duplicate a key
        within itself nor collide with an existing key, or the write
        fails with :class:`CheckViolation` — the enforcement Delta
        declines to do. Existing rows are validated first. NULL keys
        group like values (stricter than SQL UNIQUE's multi-NULL
        allowance, stated).

        Enforcement cost is O(write): the staged keys self-check with
        one bounded aggregate, and the existing-key probe is ONE
        column-pruned semi-join — partition-pruned to the staged keys'
        buckets when the table is bucketed on exactly these columns.
        Content-replacing writes (overwrite, bucketed merge — whose
        staged output necessarily re-states existing keys) check
        intra-stage uniqueness plus a carried-bucket cross probe;
        UPDATE ... SET on a constrained column is CHECKED up front
        (post-SET keys vs the keys the update does not retire —
        :meth:`_check_update_keys`), refusing only on real collisions."""
        if self._pending is not None:
            raise RuntimeError(
                "add_unique_constraint inside an open transaction"
            )
        from pyspark.sql import functions as F

        cols = list(cols)
        if not cols:
            raise ValueError("UNIQUE constraint needs at least one column")
        if self.exists(table):
            logical = self.logical_schema(table).fieldNames()
            missing = [c for c in cols if c not in logical]
            if missing:
                raise ValueError(
                    f"UNIQUE column(s) {missing!r} not in {table!r}"
                )
            dups = (
                self.read(table)
                .groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .where(F.col("__c") > 1)
                .count()
            )
            if dups:
                raise CheckViolation(
                    f"cannot add UNIQUE {name!r} to {table!r}: {dups} "
                    f"existing key(s) over {cols} are duplicated"
                )

        def mutate(m):
            m.setdefault("checks", {}).setdefault(table, {})[name] = {
                "unique": cols
            }

        self._publish_meta(mutate, f"add-unique-{table}-{name}")

    def add_fk_constraint(
        self,
        child: str,
        name: str,
        cols: list[str],
        parent: str,
        parent_cols: list[str],
        on_delete: str = "restrict",
        on_update: str = "restrict",
    ) -> None:
        """Register a WRITE-ENFORCED FOREIGN KEY: every later write into
        ``child`` must reference an existing ``parent`` key (rows whose
        FK columns are ALL non-null — SQL MATCH SIMPLE semantics), and
        parent-side removals that would orphan a referencing child row
        refuse (RESTRICT) — :class:`CheckViolation` either way. This
        generalizes the ETL pipelines' FK-miss -> reject behavior
        (reference etl-gcs-cloudsql/src/services/conductor.ts:90-98,
        model.sql's REFERENCES clauses) to declared DDL.

        The referenced columns must already carry a UNIQUE / PRIMARY
        KEY constraint on ``parent`` (standard SQL): that is what makes
        the parent-side guard exact — a deleted key is GONE, so probing
        children for exactly the removed keys is sound and O(changes).
        Existing child rows are validated now. Enforcement cost is
        O(write): the staged FK values probe the parent with one
        column-pruned anti-join, partition-pruned to the staged keys'
        buckets when the parent is bucketed on the referenced columns.

        ``on_delete`` picks the parent-DELETE rule: ``"restrict"``
        (default), ``"cascade"`` (:meth:`delete_where` on the parent
        first deletes the referencing child rows — recursively, so a
        grandchild CASCADE chains and a grandchild RESTRICT refuses
        the whole thing before anything commits at that level), or
        ``"set null"`` (referencing rows get their FK column NULLed).
        Single-column FKs only for the non-restrict actions (the
        child-side predicate is a bucket-prunable ``IN`` list). Only
        DELETE honors the action; every other removal verb (TRUNCATE /
        OVERWRITE / RESTORE / merge-delete / replace_partitions)
        always RESTRICTs — an ON DELETE rule is a delete-time rule,
        and silently fanning a TRUNCATE out to child tables is how
        lakes get emptied by accident.

        ``on_update`` picks the parent key-REWRITE rule the same way:
        ``"restrict"`` (default — an UPDATE rewriting a referenced key
        away refuses while a child row references it), ``"cascade"``
        (referencing rows follow the key to its new value), or ``"set
        null"``. Only UPDATE honors it; single-column FKs only;
        self-referential FKs take RESTRICT only (rewrite the node and
        its referencing rows in ONE UPDATE statement instead — the
        statement-level probe already accepts that)."""
        if self._pending is not None:
            raise RuntimeError(
                "add_fk_constraint inside an open transaction"
            )
        from pyspark.sql import functions as F

        cols, parent_cols = list(cols), list(parent_cols)
        if not cols or len(cols) != len(parent_cols):
            raise ValueError(
                "FOREIGN KEY needs 1+ columns and the same number of "
                "referenced columns"
            )
        on_delete = on_delete.lower()
        if on_delete not in ("restrict", "cascade", "set null"):
            raise ValueError(
                f"ON DELETE {on_delete!r}: RESTRICT, CASCADE or SET NULL"
            )
        if on_delete != "restrict" and len(cols) != 1:
            raise ValueError(
                "ON DELETE CASCADE/SET NULL supports single-column "
                "FOREIGN KEYs only (the child-side delete predicate "
                "must stay a prunable IN list)"
            )
        on_update = on_update.lower()
        if on_update not in ("restrict", "cascade", "set null"):
            raise ValueError(
                f"ON UPDATE {on_update!r}: RESTRICT, CASCADE or SET NULL"
            )
        if on_update != "restrict":
            if len(cols) != 1:
                raise ValueError(
                    "ON UPDATE CASCADE/SET NULL supports single-column "
                    "FOREIGN KEYs only (the child-side predicate must "
                    "stay a prunable IN list)"
                )
            if child == parent:
                raise ValueError(
                    "self-referential ON UPDATE CASCADE/SET NULL is "
                    "not supported (the leg would rewrite the table "
                    "its own statement is rewriting); update the node "
                    "and its referencing rows in ONE statement — the "
                    "statement-level probe accepts that"
                )
        if not self.exists(parent):
            raise FileNotFoundError(
                f"FOREIGN KEY references missing table {parent!r}"
            )
        pschema = self.logical_schema(parent)
        missing = [c for c in parent_cols if c not in pschema.fieldNames()]
        if missing:
            raise ValueError(
                f"referenced column(s) {missing!r} not in {parent!r}"
            )
        covered = any(
            isinstance(e, dict)
            and set(e.get("unique", ())) == set(parent_cols)
            for e in self.checks(parent).values()
        )
        if not covered:
            raise ValueError(
                f"FOREIGN KEY requires a UNIQUE/PRIMARY KEY on "
                f"{parent!r}{tuple(parent_cols)} first (ALTER TABLE "
                f"{parent} ADD CONSTRAINT ... UNIQUE ({', '.join(parent_cols)}))"
            )
        if self.exists(child):
            cschema = self.logical_schema(child)
            missing = [c for c in cols if c not in cschema.fieldNames()]
            if missing:
                raise ValueError(
                    f"FOREIGN KEY column(s) {missing!r} not in {child!r}"
                )
            spec = {"cols": cols, "parent": parent,
                    "parent_cols": parent_cols}
            bad = self._fk_misses(child, spec, self.read(child)).count()
            if bad:
                raise CheckViolation(
                    f"cannot add FOREIGN KEY {name!r} to {child!r}: "
                    f"{bad} existing key(s) over {cols} have no match "
                    f"in {parent}{tuple(parent_cols)}"
                )

        def mutate(m):
            m.setdefault("checks", {}).setdefault(child, {})[name] = {
                "fk": {
                    "cols": cols,
                    "parent": parent,
                    "parent_cols": parent_cols,
                    "on_delete": on_delete,
                    "on_update": on_update,
                }
            }

        self._publish_meta(mutate, f"add-fk-{child}-{name}")

    # a cascade collects the doomed parent keys to the driver (they
    # become the child delete's prunable IN predicate) — a removal set
    # past this size should be a partition drop, not a keyed cascade
    _CASCADE_KEY_CAP = 100_000

    def _apply_fk_delete_actions(self, parent: str, cond) -> None:
        """Run the ON DELETE CASCADE / SET NULL legs for a parent
        DELETE whose matched rows satisfy ``cond``: each non-restrict
        child gets ONE keyed statement (``DELETE FROM child WHERE fk
        IN (doomed keys)`` / ``UPDATE child SET fk = NULL WHERE ...``)
        through the normal DML front — bucket-pruned on the child when
        it is bucketed on its FK column, recursive by construction
        (the child delete re-enters :meth:`delete_where`, so a
        grandchild CASCADE chains and a grandchild RESTRICT refuses
        before that level commits anything). NULL parent keys are
        never cascaded: a NULL-FK child row references nothing (MATCH
        SIMPLE) and cannot be orphaned."""
        from pyspark.sql import functions as F

        actions = [
            (c, n, s)
            for c, n, s in self._fk_children(parent)
            if s.get("on_delete", "restrict") != "restrict"
        ]
        if not actions:
            return
        for child, name, spec in actions:
            if not self.exists(child):
                continue
            pcol = spec["parent_cols"][0]  # single-col by construction
            fkcol = spec["cols"][0]
            rows = (
                self.read(parent)
                .filter(cond)
                .select(pcol)
                .where(F.col(pcol).isNotNull())
                .distinct()
                .limit(self._CASCADE_KEY_CAP + 1)
                .collect()
            )
            if len(rows) > self._CASCADE_KEY_CAP:
                raise ValueError(
                    f"ON DELETE {spec['on_delete'].upper()} from "
                    f"{parent!r} would fan {self._CASCADE_KEY_CAP}+ "
                    f"keys into {child!r}; run the child statement "
                    "yourself (or drop whole partitions) for removals "
                    "this large"
                )
            keys = [r[pcol] for r in rows]
            if not keys:
                continue
            # cycle guard: a self-loop (a row referencing itself) or a
            # mutual reference makes the recursion re-derive the SAME
            # (child, keys) leg forever — nothing is deleted until the
            # stack unwinds, so the predicate never empties. A repeated
            # leg means an enclosing call is already deleting exactly
            # these keys' referencers: skip it. A depth cap backstops
            # shrinking-but-cyclic key sets.
            leg = (child, spec["on_delete"], frozenset(keys))
            stack = getattr(self, "_cascade_stack", None)
            if stack is None:
                stack = self._cascade_stack = []
            if leg in stack:
                continue
            if len(stack) >= 50:
                raise ValueError(
                    f"ON DELETE cascade from {parent!r} exceeded 50 "
                    "chained levels (reference cycle?); delete the "
                    "deepest descendants first"
                )
            stack.append(leg)
            try:
                pred = [(fkcol, "in", keys)]
                if spec["on_delete"] == "cascade":
                    self.delete_where(child, pred)
                else:  # set null
                    self.update_where(child, pred, {fkcol: "NULL"})
            finally:
                stack.pop()

    def _fk_children(self, parent: str) -> list[tuple[str, str, dict]]:
        """Every (child_table, constraint_name, fk_spec) referencing
        ``parent`` — the reverse index the parent-side RESTRICT guards
        scan (one manifest read, zero data)."""
        out = []
        for child, chks in (
            self._read_manifest(strict=False).get("checks", {}).items()
        ):
            for name, expr in chks.items():
                if isinstance(expr, dict) and "fk" in expr:
                    if expr["fk"]["parent"] == parent:
                        out.append((child, name, expr["fk"]))
        return out

    def _fk_miss_count(
        self,
        child: str,
        spec: dict,
        rows,
        extra_parent=None,
        replace_parent: bool = False,
    ) -> int:
        """``_fk_misses(...).count()`` with a small-write fast path: a
        staged write with at most _SMALL_PROBE_KEYS distinct FK keys
        collects them in one tiny job and probes the parent with
        LITERAL predicates — a stats/row-group-pruned scan instead of
        an anti-join, so a 1-row insert against a 100 TB parent touches
        only the parent files whose min/max cover the key. Bulk writes
        fall back to the anti-join unchanged."""
        from pyspark.sql import functions as F

        cols = spec["cols"]
        pcols = spec["parent_cols"]
        nn = None
        for c in cols:
            leg = F.col(c).isNotNull()
            nn = leg if nn is None else nn & leg
        key_rows = (
            rows.where(nn)
            .select(*[F.col(c).alias(p) for c, p in zip(cols, pcols)])
            .distinct()
            .limit(_SMALL_PROBE_KEYS + 1)
            .collect()
        )
        if len(key_rows) > _SMALL_PROBE_KEYS or not _literal_probe_safe(
            list(pcols), key_rows
        ):
            return self._fk_misses(
                child, spec, rows, extra_parent, replace_parent
            ).count()
        if not key_rows:
            return 0
        keyset = {tuple(r[p] for p in pcols) for r in key_rows}
        cond = _literal_key_cond(list(pcols), key_rows)
        if replace_parent:
            probe = extra_parent.select(*pcols)
        else:
            probe = self.read(spec["parent"]).select(*pcols)
            if extra_parent is not None:
                probe = probe.unionByName(extra_parent.select(*pcols))
        found = {
            tuple(r[p] for p in pcols)
            for r in probe.where(cond).distinct().collect()
        }
        return len(keyset - found)

    def _fk_misses(
        self,
        child: str,
        spec: dict,
        rows,
        extra_parent=None,
        replace_parent: bool = False,
    ):
        """The distinct FK keys in ``rows`` (all components non-null)
        that have NO matching parent key — the violation set. One
        column-pruned anti-join; partition-pruned to the probed keys'
        buckets when the parent is bucketed on exactly the referenced
        columns (same-type columns only: xxhash64 is type-dependent).

        SELF-referential FKs (parent == child) make the probed parent
        key set write-dependent: ``extra_parent`` unions the staged
        rows' keys into the committed set (append/merge — a batch may
        carry a node AND the node it references, which SQL's
        end-of-statement check accepts), and ``replace_parent=True``
        probes ONLY ``extra_parent`` (content-replacing writes, where
        the staged rows ARE the post-state table). Keys the operation
        REMOVES are the parent-side orphan probes' job, never this
        one's."""
        from pyspark.sql import functions as F

        from gcp_datalake_pipeline_spark.storage import kb_col

        cols = spec["cols"]
        parent, pcols = spec["parent"], spec["parent_cols"]
        nn = None
        for c in cols:
            leg = F.col(c).isNotNull()
            nn = leg if nn is None else nn & leg
        # keys speak the PARENT's column names from here on
        keys = (
            rows.where(nn)
            .select(
                *[F.col(c).alias(p) for c, p in zip(cols, pcols)]
            )
            .distinct()
        )
        if replace_parent:
            return keys.join(
                extra_parent.select(*pcols), pcols, "left_anti"
            )
        pread = self.read(parent)
        meta = self.bucket_meta(parent)
        if meta is not None and list(meta["key_cols"]) == list(pcols):
            pschema = {f.name: f.dataType for f in pread.schema.fields}
            kschema = {f.name: f.dataType for f in keys.schema.fields}
            if all(pschema.get(p) == kschema[p] for p in pcols):
                buckets = [
                    r["_kb"]
                    for r in keys.select(
                        kb_col(pcols, meta["num_buckets"]).alias("_kb")
                    )
                    .distinct()
                    .collect()
                ]
                pread = pread.where(F.col("_kb").isin(buckets))
        probe = pread.select(*pcols)
        if extra_parent is not None:
            probe = probe.unionByName(extra_parent.select(*pcols))
        return keys.join(probe, pcols, "left_anti")

    # sentinel: "scan self.read(child)" — distinct from None ("skip")
    _SELF_READ = object()

    def _refuse_fk_orphans(
        self,
        parent: str,
        removed_keys,
        pcols: list[str],
        verb: str,
        self_rows=_SELF_READ,
        restrict_only: bool = False,
        action_field: str = "on_delete",
    ) -> None:
        """Parent-side RESTRICT guard: ``removed_keys`` (distinct
        ``pcols`` values this operation removes from ``parent`` — exact
        because the referenced columns are UNIQUE) must not be
        referenced by any child row. One probe per child whose FK
        targets exactly these columns; child scans partition-prune to
        the removed keys' buckets when the child is bucketed on its FK
        columns. Children referencing a DIFFERENT column set of this
        parent are untouched by construction.

        For a SELF-referential FK the referencing rows live in the
        table being written, so the committed scan would count rows
        this very operation removes or rewrites. ``self_rows`` names
        the POST-state child frame to probe instead when child ==
        parent: a DataFrame (delete survivors, update post-images,
        replace/merge staged ∪ carried), or ``None`` to skip the self
        probe entirely (TRUNCATE/OVERWRITE/RESTORE — the old
        referencing rows die with the old content, and the staged
        content is separately validated against itself)."""
        from pyspark.sql import functions as F

        from gcp_datalake_pipeline_spark.storage import kb_col

        children = [
            (c, n, s)
            for c, n, s in self._fk_children(parent)
            if list(s["parent_cols"]) == list(pcols)
            and not (
                restrict_only
                and s.get(action_field, "restrict") != "restrict"
            )
        ]
        if not children:
            return
        removed_keys = removed_keys.distinct()
        for child, name, spec in children:
            if not self.exists(child):
                continue
            cols = spec["cols"]
            if child == parent and self_rows is not self._SELF_READ:
                if self_rows is None:
                    continue
                # post-state frame: already planned, no bucket pruning
                refs = self_rows.select(
                    *[F.col(c).alias(p) for c, p in zip(cols, pcols)]
                ).join(removed_keys.select(*pcols), pcols, "left_semi")
                n = refs.count()
                if n:
                    raise CheckViolation(
                        f"cannot {verb} {parent!r}: {n} surviving "
                        f"row(s) of {child!r} reference the removed "
                        f"key(s) via FOREIGN KEY {name!r} "
                        f"({spec['cols']} -> {parent}{tuple(pcols)}); "
                        "delete the referencing rows first"
                    )
                continue
            cread = self.read(child)
            meta = self.bucket_meta(child)
            if meta is not None and list(meta["key_cols"]) == list(cols):
                cschema = {f.name: f.dataType for f in cread.schema.fields}
                rschema = {
                    f.name: f.dataType for f in removed_keys.schema.fields
                }
                if all(
                    cschema.get(c) == rschema[p]
                    for c, p in zip(cols, pcols)
                ):
                    rk = removed_keys.select(
                        *[
                            F.col(p).alias(c)
                            for p, c in zip(pcols, cols)
                        ]
                    )
                    buckets = [
                        r["_kb"]
                        for r in rk.select(
                            kb_col(cols, meta["num_buckets"]).alias("_kb")
                        )
                        .distinct()
                        .collect()
                    ]
                    cread = cread.where(F.col("_kb").isin(buckets))
            refs = cread.select(
                *[F.col(c).alias(p) for c, p in zip(cols, pcols)]
            ).join(removed_keys.select(*pcols), pcols, "left_semi")
            n = refs.count()
            if n:
                raise CheckViolation(
                    f"cannot {verb} {parent!r}: {n} row(s) of {child!r} "
                    f"reference the removed key(s) via FOREIGN KEY "
                    f"{name!r} ({spec['cols']} -> "
                    f"{parent}{tuple(pcols)}); delete the referencing "
                    "rows first"
                )

    def _fk_parent_specs(self, parent: str) -> list[list[str]]:
        """The DISTINCT referenced-column lists of FKs targeting
        ``parent`` (usually zero or one)."""
        seen: list[list[str]] = []
        for _c, _n, s in self._fk_children(parent):
            if list(s["parent_cols"]) not in seen:
                seen.append(list(s["parent_cols"]))
        return seen

    def drop_check(self, table: str, name: str) -> None:
        """Remove a CHECK constraint; raises KeyError if absent."""
        if self._pending is not None:
            raise RuntimeError("drop_check inside an open transaction")
        if name not in self.checks(table):
            raise KeyError(f"no CHECK {name!r} on {table!r}")

        def mutate(m):
            m["checks"][table].pop(name)
            if not m["checks"][table]:
                m["checks"].pop(table)

        self._publish_meta(mutate, f"drop-check-{table}-{name}")

    def _publish_meta(self, mutate, load_id: str) -> None:
        """Commit a manifest-only mutation (no table dirs move) through
        the same flock -> version file -> pointer-swap protocol as
        :meth:`_publish`, so metadata changes are versioned, time-
        travelable, and serialized against data commits."""
        os.makedirs(self.root, exist_ok=True)
        lock_path = os.path.join(self.root, "_commit.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            manifest = self._read_manifest()
            mutate(manifest)
            manifest["version"] += 1
            manifest["load_id"] = load_id
            manifest["committed_at"] = time.time()
            self._commit_tail(manifest)

    def _enforce_checks(
        self,
        table: str,
        stage_path: str,
        cross_table: bool = True,
        exclude_buckets: list[int] | None = None,
        existing_where=None,
        fk_staged_only: bool = False,
    ) -> None:
        """Validate a freshly staged dir against the table's committed
        constraints. Row CHECKs read back only the staged files, so
        enforcement cost is proportional to the write. UNIQUE
        constraints additionally probe the EXISTING keys with one
        column-pruned semi-join (bucket-pruned when co-bucketed) —
        skipped under ``cross_table=False`` for content-REPLACING
        writes (overwrite), whose staged output legitimately re-states
        existing keys. A bucketed merge replaces only the TOUCHED
        buckets and hardlink-carries the rest, so it passes
        ``exclude_buckets`` instead: the cross probe then runs against
        the CARRIED buckets only — the one place an upserted row can
        silently duplicate a UNIQUE value it didn't restate.
        ``existing_where`` (a Column) likewise narrows the probed
        committed rows for partial-rewrite writers whose staged rows
        legitimately restate the slice they replace
        (:meth:`replace_partitions` probes only SURVIVING
        partitions)."""
        from pyspark.sql import functions as F

        chk = self._read_manifest(strict=False).get("checks", {}).get(table)
        if not chk:
            return
        # CHECK expressions speak logical names; staged files are physical
        df = self._to_logical(
            self.spark.read.parquet(stage_path), self.colmap(table)
        )
        for name, expr in chk.items():
            if isinstance(expr, dict) and "unique" in expr:
                self._enforce_unique(
                    table,
                    name,
                    expr["unique"],
                    df,
                    cross_table,
                    exclude_buckets,
                    existing_where,
                )
                continue
            if isinstance(expr, dict) and "fk" in expr:
                # child-side FK: every staged row with a fully non-null
                # key must reference a parent key. NO restatement
                # exemption (the probe targets the PARENT, never the
                # written table), so this runs on every write path.
                # Inside a transaction the parent read sees same-commit
                # staged parent rows (read-your-writes), so
                # parent-then-child multi-table loads pass. A SELF-
                # referential FK probes against the post-write parent
                # set: committed ∪ staged normally, staged only for
                # content-replacing writes (``fk_staged_only``).
                spec = expr["fk"]
                selffk = spec["parent"] == table
                bad = self._fk_miss_count(
                    table,
                    spec,
                    df,
                    extra_parent=df if selffk else None,
                    replace_parent=selffk and fk_staged_only,
                )
                if bad:
                    raise CheckViolation(
                        f"write to {table!r} violates FOREIGN KEY "
                        f"{name!r}: {bad} staged key(s) over "
                        f"{spec['cols']} have no match in "
                        f"{spec['parent']}{tuple(spec['parent_cols'])}"
                    )
                continue
            bad = df.filter(self._violates(expr)).count()
            if bad:
                raise CheckViolation(
                    f"write to {table!r} violates CHECK {name!r} ({expr}):"
                    f" {bad} staged row(s)"
                )

    def _enforce_unique(
        self,
        table: str,
        name: str,
        cols: list[str],
        staged,
        cross: bool,
        exclude_buckets: list[int] | None = None,
        existing_where=None,
    ) -> None:
        from pyspark.sql import functions as F

        from gcp_datalake_pipeline_spark.storage import kb_col

        keys = staged.select(*cols)
        # Small-write fast path (guide §1.2/§6): when a cross probe
        # will run, a write with at most _SMALL_PROBE_KEYS distinct
        # keys collects them in ONE tiny job (which simultaneously
        # settles the intra-write dup check) and probes the committed
        # rows with LITERAL predicates — a stats/row-group-pruned scan,
        # no join, no shuffle. On a 100 TB table the probe then touches
        # only the files whose min/max ranges cover the staged keys
        # instead of semi-joining the full key column. Bulk writes
        # (more keys, unknown up front) take the original groupBy +
        # AQE-sized semi-join path unchanged, as do probe-free writes
        # (content replaces), which keep the single dup-count job.
        partial = exclude_buckets is not None or existing_where is not None
        will_probe = (
            (cross or partial)
            and self.exists(table)
            and bool(self._read_manifest(strict=False)["tables"].get(table))
        )
        per_key = keys.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
        sample = (
            per_key.limit(_SMALL_PROBE_KEYS + 1).collect()
            if will_probe
            else None
        )
        small = (
            sample is not None
            and len(sample) <= _SMALL_PROBE_KEYS
            and _literal_probe_safe(cols, sample)
        )
        if small:
            dups = sum(1 for r in sample if r["__c"] > 1)
        else:
            dups = per_key.where(F.col("__c") > 1).count()
        if dups:
            raise CheckViolation(
                f"write to {table!r} violates UNIQUE {name!r} over "
                f"{cols}: {dups} staged key(s) duplicated within the "
                "write"
            )
        if not will_probe:
            return
        existing = self.read(table)
        if existing_where is not None:
            existing = existing.where(existing_where)
        meta = self.bucket_meta(table)
        if exclude_buckets is not None:
            if meta is not None and list(meta["key_cols"]) == list(cols):
                # the constraint IS the bucket key: staged keys hash into
                # the rewritten buckets by construction, so the carried
                # buckets cannot hold them — disjoint, nothing to probe
                return
            # bucketed merge: the touched buckets are fully re-stated in
            # the stage (the intra-stage groupBy covered them); probe
            # only the CARRIED buckets, where an upserted NEW value can
            # collide with a row this write never saw
            existing = existing.where(
                ~F.col("_kb").isin(list(exclude_buckets))
            )
        if small:
            # literal-predicate probe: same NULL-safe semantics as the
            # eqNullSafe semi-join (NULL keys match via IS NULL), counts
            # the same existing rows, and pushes to the parquet scan.
            hits = (
                existing.select(*cols)
                .where(_literal_key_cond(cols, sample))
                .count()
            )
            if hits:
                raise CheckViolation(
                    f"write to {table!r} violates UNIQUE {name!r} over "
                    f"{cols}: {hits} staged key(s) already exist"
                )
            return
        if meta is not None and list(meta["key_cols"]) == list(cols):
            buckets = [
                r["_kb"]
                for r in keys.select(
                    kb_col(cols, meta["num_buckets"]).alias("_kb")
                )
                .distinct()
                .collect()
            ]
            existing = existing.where(F.col("_kb").isin(buckets))
        # AQE sizes the join: a small staged write broadcasts itself, a
        # bulk load shuffles honestly — never force a broadcast of an
        # unbounded write. NULL keys group like values (the intra-stage
        # groupBy already treats them so), hence eqNullSafe — a plain
        # equi-join would let a second NULL-valued key slip past the
        # probe and land a row the constraint then refuses on restore.
        ex = existing.select(*cols).alias("ex")
        st = keys.distinct().alias("st")
        cond = None
        for c in cols:
            leg = F.col(f"ex.{c}").eqNullSafe(F.col(f"st.{c}"))
            cond = leg if cond is None else cond & leg
        hits = ex.join(st, cond, "left_semi").count()
        if hits:
            raise CheckViolation(
                f"write to {table!r} violates UNIQUE {name!r} over "
                f"{cols}: {hits} staged key(s) already exist"
            )

    def rollback(self) -> None:
        if self._pending is None:
            return
        for rel in self._txn_dirs:
            shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
        load_dir = os.path.join(self.root, _LOADS, self._stage_token)
        if os.path.isdir(load_dir) and not os.listdir(load_dir):
            os.rmdir(load_dir)
        self._pending = None
        self._load_id = None
        self._intents = {}
        self._staged_bucket_meta = {}

    @contextmanager
    def transaction(self, load_id: str | None = None):
        """``with catalog.transaction("load-2025-10-01"):`` — every write
        inside the block becomes visible atomically at block exit; an
        exception rolls back (staged files deleted, pointer untouched).
        A FAILED COMMIT (conflict, flock/IO error) also rolls back, so
        the catalog object is never left stuck with an open transaction
        and the staged dirs don't linger until an age-gated vacuum."""
        self.begin(load_id)
        try:
            yield self
        except BaseException:
            self.rollback()
            raise
        try:
            self.commit()
        except BaseException:
            self.rollback()
            raise

    # -- committed-load markers ---------------------------------------------
    #
    # One tiny file per committed load_id under ``_load_ids/``, written
    # inside the commit flock. This is the REPLAY GUARD's index: a
    # streaming micro-batch asks "was this round already committed?" with
    # ONE os.path.exists — O(1) per batch instead of parsing every
    # retained version manifest — and the markers are never vacuumed, so
    # a ``vacuum(retain_versions=1)`` inside a checkpoint-replay window
    # can no longer forget a round and double-commit it on replay.
    # Markers are a few dozen bytes each; a year of minutely rounds is
    # ~50 MB of metadata, not worth a retention knob.
    #
    # Crash atomicity: the marker is written BEFORE the pointer swap (so
    # a committed load always has its marker), and a ``.pending`` sidecar
    # records the in-flight (marker, version). The sidecar is written
    # (and fsynced) BEFORE the marker it names: any marker not yet
    # covered by a successful pointer swap is therefore ALWAYS named by
    # ``.pending`` — writing the marker first would open a window where a
    # crash leaves a visible marker while ``.pending`` still names the
    # PREVIOUS commit, making ``has_load_id`` trust a never-committed
    # load and permanently skip its replayed round. ``has_load_id``
    # disregards a marker still named by ``.pending`` with a version
    # ahead of the committed pointer, and the next commit (same flock)
    # deletes the orphan before proceeding. (The retained-version
    # fallback used before these markers had the same window via the
    # orphan version file; the sidecar ordering closes it.)

    def _marker_dir(self) -> str:
        return os.path.join(self.root, _LOAD_IDS)

    def _marker_path(self, load_id: str) -> str:
        import hashlib

        # hashed filename: load_ids are caller strings (may hold '/')
        h = hashlib.sha1(load_id.encode()).hexdigest()
        return os.path.join(self._marker_dir(), f"{h}.json")

    def _pending_marker_path(self) -> str:
        return os.path.join(self._marker_dir(), ".pending")

    def _read_pending_marker(self) -> dict | None:
        try:
            with open(self._pending_marker_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def has_load_id(self, load_id: str) -> bool:
        """True iff a commit named ``load_id`` is visible — the O(1)
        idempotent-replay lookup (the streaming loops key exactly-once on
        it). Falls back to scanning the retained version history on a
        catalog that predates the marker directory (markers backfill at
        its next commit)."""
        mdir = self._marker_dir()
        if not os.path.isdir(mdir):
            if not os.path.isdir(os.path.join(self.root, _VERSIONS)):
                return False  # fresh catalog: nothing ever committed
            # legacy catalog (pre-marker commits): version-history scan
            return any(
                v.get("load_id") == load_id for v in self.versions()
            )
        path = self._marker_path(load_id)
        if not os.path.exists(path):
            return False
        pending = self._read_pending_marker()
        if pending and pending.get("path") == os.path.basename(path):
            # in-flight (or crashed-before-swap) commit: visible only if
            # the pointer reached the pending version
            committed = self._read_manifest(strict=False)["version"]
            return committed >= pending.get("version", 0)
        return True

    def _write_load_marker(self, load_id: str, version: int) -> None:
        """Under the commit flock, before the pointer swap: clean any
        orphan from a crashed committer, backfill a legacy catalog's
        markers from its retained versions (one-time), then record this
        commit's pending sidecar FOLLOWED BY its marker (see the
        ordering note above)."""
        mdir = self._marker_dir()
        committed = self._read_manifest(strict=False)["version"]
        if not os.path.isdir(mdir):
            os.makedirs(mdir)
            # one-time backfill for a legacy (pre-marker) catalog; a
            # FRESH catalog has no version dir and skips straight through
            if os.path.isdir(os.path.join(self.root, _VERSIONS)):
                for v in self.versions():
                    lid = v.get("load_id")
                    if lid:
                        with open(self._marker_path(lid), "w") as f:
                            json.dump(
                                {"load_id": lid, "version": v["version"]}, f
                            )
        else:
            pending = self._read_pending_marker()
            if pending and pending.get("version", 0) > committed:
                # previous committer died between marker write and swap:
                # its round never became visible, so the marker must not
                # make a replay skip it
                try:
                    os.remove(os.path.join(mdir, pending["path"]))
                except FileNotFoundError:
                    pass
        # .pending FIRST (fsynced), naming the marker about to be
        # written: a crash at any point now leaves either no marker (a
        # replay simply re-runs the round) or a marker that .pending
        # names with version > committed (disregarded and cleaned). The
        # reverse order would let a crash between the two writes expose
        # a trusted marker for a load whose data never became visible.
        path = self._marker_path(load_id)
        tmp = self._pending_marker_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"path": os.path.basename(path), "version": version}, f
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pending_marker_path())
        with open(path, "w") as f:
            json.dump({"load_id": load_id, "version": version}, f)
            f.flush()
            os.fsync(f.fileno())

    # -- time travel --------------------------------------------------------

    def versions(self) -> list[dict]:
        """Committed snapshots, oldest first: version / load_id /
        committed_at. Every commit retains its manifest under
        ``_versions/<n>.json`` until vacuum drops it."""
        vdir = os.path.join(self.root, _VERSIONS)
        if not os.path.isdir(vdir):
            return []
        out = []
        for fname in sorted(
            os.listdir(vdir), key=lambda s: int(s.split(".", 1)[0])
        ):
            with open(os.path.join(vdir, fname)) as f:
                m = json.load(f)
            out.append(
                {
                    "version": m["version"],
                    "load_id": m.get("load_id"),
                    "committed_at": m.get("committed_at"),
                }
            )
        return out

    def history(self, table: str) -> list[dict]:
        """Delta ``DESCRIBE HISTORY``: the retained commits that
        CHANGED ``table`` — its dir list, schema, checks, layout,
        bloom config, vectors, column mapping, or properties — oldest
        first, each with version / load_id (the operation tag every
        engine write stamps: ``dv-delete-t``, ``compact-t``, ...) /
        committed_at. Pure manifest walk over the retained window;
        vacuumed history is gone (the honest answer)."""
        if not self.exists(table):
            raise FileNotFoundError(f"{table!r} not in manifest")
        out: list[dict] = []
        prev = None
        for v in self.versions():
            vm = self._version_manifest(v["version"])
            if table not in vm["tables"]:
                prev = None
                continue
            snap = (
                vm["tables"].get(table),
                vm.get("schemas", {}).get(table),
                vm.get("checks", {}).get(table),
                vm.get("layouts", {}).get(table),
                vm.get("blooms", {}).get(table),
                vm.get("dvs", {}).get(table),
                vm.get("colmaps", {}).get(table),
                vm.get("properties", {}).get(table),
            )
            if snap != prev:
                out.append(
                    {
                        "version": v["version"],
                        "operation": v.get("load_id"),
                        "committed_at": v.get("committed_at"),
                    }
                )
            prev = snap
        return out

    def rename_table(self, old: str, new: str) -> None:
        """``ALTER TABLE ... RENAME TO`` — one manifest commit, zero
        data movement: every per-table manifest record (dirs, schema,
        checks, layout, blooms, vectors, column mapping, properties)
        moves to the new name; the bucket sidecar follows after the
        swap (a crash between the two leaves the bucketed-path
        machinery refusing loudly, never silently mis-bucketing).

        Identity boundaries, stated honestly: retained snapshots keep
        the OLD name (``read_at``/restore see history as it was), and
        a ``table_changes`` window that CROSSES the rename RAISES —
        the manifest records ``renamed[new] = old`` at the rename
        commit, and a name-keyed feed cannot silently bridge an
        identity change (re-register consumers on the new name).
        Renaming is refused while a materialized view or change-feed
        consumer references the table (their specs are name-keyed)."""
        import re as _re

        if self._pending is not None:
            raise RuntimeError("rename_table inside an open transaction")
        if not self.exists(old):
            raise FileNotFoundError(f"{old!r} not in manifest")
        if not _re.fullmatch(r"\w+", new):
            raise ValueError(f"bad table name {new!r}")
        if new == old:
            raise ValueError("RENAME TO the same name")
        if self.exists(new):
            raise ValueError(f"table {new!r} already exists")
        m0 = self._read_manifest(strict=False)
        if old in m0.get("views", {}) or new in m0.get("views", {}):
            raise ValueError(
                "cannot rename a materialized view; drop and recreate it"
            )
        for vname, spec in m0.get("views", {}).items():
            if spec.get("source") == old and not spec.get(
                "follow_renames"
            ):
                raise ValueError(
                    f"cannot rename {old!r}: materialized view {vname!r} "
                    "sources it; drop the view first, or recreate it "
                    "with follow_renames=True"
                )
        for cname, wm in m0.get("streams", {}).items():
            if wm.get("source") == old and not wm.get("follow_renames"):
                raise ValueError(
                    f"cannot rename {old!r}: change-feed consumer "
                    f"{cname!r} follows it; drop the consumer first, or "
                    "re-register it with follow_renames=True"
                )

        def mutate(m):
            if new in m["tables"]:
                raise ConcurrentWriteError(
                    f"table {new!r} was created by another writer"
                )
            for key in (
                "tables", "schemas", "checks", "layouts", "blooms",
                "dvs", "colmaps", "properties", "identity", "generated",
            ):
                sub = m.get(key)
                if sub and old in sub:
                    sub[new] = sub.pop(old)
            # FOREIGN KEYs referencing the renamed table follow it —
            # the constraint is identity-keyed metadata, not name-keyed
            # history like the change feed
            for chks in m.get("checks", {}).values():
                for e in chks.values():
                    if isinstance(e, dict) and "fk" in e:
                        if e["fk"]["parent"] == old:
                            e["fk"]["parent"] = new
            moved = m.get("moved")
            if moved is not None:
                moved.pop(old, None)
            # the feed boundary marker _diff_pair refuses across
            m.setdefault("renamed", {})[new] = old

        self._publish_meta(mutate, f"rename-table-{old}-{new}")
        # sidecar follows the committed swap: a crash here leaves the
        # bucketed paths REFUSING on the missing sidecar (loud), and
        # the stale old-name sidecar is removed like drop_table does
        src = self._bucket_meta_path(old)
        if os.path.exists(src):
            os.replace(src, self._bucket_meta_path(new))

    def version_at(self, ts) -> int:
        """The snapshot version current AS OF ``ts`` — the greatest
        RETAINED version whose commit time is <= ts (Delta's
        ``TIMESTAMP AS OF`` resolution). ``ts`` is a datetime, an ISO
        string (naive = local time, like Delta), or unix seconds.
        Raises when ts precedes the earliest retained snapshot (the
        honest answer after vacuum — never silently the oldest) or
        when no snapshot is old enough."""
        import datetime as _dt

        if isinstance(ts, str):
            ts = _dt.datetime.fromisoformat(ts)
        if isinstance(ts, _dt.datetime):
            ts = ts.timestamp()
        ts = float(ts)
        best = None
        earliest = None
        for v in self.versions():
            at = v.get("committed_at")
            if at is None:
                continue
            if earliest is None or at < earliest:
                earliest = at
            # one-microsecond slack: datetime/ISO inputs truncate to
            # micros while commit times carry full float precision — a
            # user pasting a commit's own printed timestamp must hit it
            if at <= ts + 1e-6 and (best is None or v["version"] > best):
                best = v["version"]
        if best is None:
            raise ValueError(
                f"no retained snapshot at or before timestamp {ts} "
                f"(earliest retained commit: {earliest}); history before "
                "the vacuum horizon is gone"
            )
        return best

    def _version_manifest(self, version: int) -> dict:
        vpath = os.path.join(self.root, _VERSIONS, f"{version}.json")
        try:
            with open(vpath) as f:
                return json.load(f)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"no retained snapshot for version {version} "
                "(vacuumed or never committed)"
            ) from None

    def _version_dirs(self, table: str, version: int) -> list[str]:
        rels = self._version_manifest(version)["tables"].get(table)
        if rels is None:
            raise FileNotFoundError(
                f"{table!r} did not exist at version {version}"
            )
        return [os.path.join(self.root, r) for r in rels]

    def read_at(self, table: str, version: int, predicates=None) -> DataFrame:
        """Read ``table`` as of committed snapshot ``version`` — table-level
        time travel (the SCD2 operator is the row-level complement). Raises
        if the version manifest was vacuumed away or never existed.
        ``predicates`` file-skips exactly as in :meth:`read` — the stats
        sidecars live inside the immutable snapshot dirs, so historical
        reads prune too."""
        m = self._version_manifest(version)
        paths = self._version_dirs(table, version)
        sj = m.get("schemas", {}).get(table)
        stored = None
        if sj is not None:
            from pyspark.sql import types as T

            stored = T.StructType.fromJson(sj)
        dv = m.get("dvs", {}).get(table)
        cmap = m.get("colmaps", {}).get(table)
        if predicates is None:
            return self._to_logical(self._read_dirs(paths, stored, dv=dv), cmap)
        dnf = self._as_dnf(predicates)
        pdnf = self._phys_dnf(cmap, dnf)
        return self._to_logical(
            self._read_dirs_pruned(paths, stored, pdnf, dv=dv), cmap
        ).filter(filestats.dnf_condition(dnf))

    # -- change data feed -----------------------------------------------------
    #
    # Delta's Change Data Feed, recovered from the versioned manifests
    # instead of runtime capture: because every commit publishes an
    # immutable dir list and every DML rewrite hardlink-carries its
    # untouched files, the rows that changed between two snapshots live
    # EXACTLY in the files whose inode appears on only one side of the
    # version pair. Reading just those files and taking the multiset
    # difference (exceptAll, both directions) yields the row-level
    # delta with I/O proportional to the CHANGE, not the table:
    # an append reads only its new files (pure inserts), a point DELETE
    # reads the candidate files of both versions (the carried rows
    # cancel), and only a compaction — which rewrites everything while
    # changing nothing — degrades to a full read that correctly yields
    # an empty feed. At 100 TB this is what lets downstream consumers
    # (index maintenance, replication, incremental gold views) follow a
    # table without re-scanning it.

    def resolve_renamed(self, name: str) -> str:
        """The CURRENT name of the table once known as ``name``,
        following the manifest's ``renamed[new] = old`` lineage chain
        forward (a -> b -> c resolves a to c). A name that still
        exists resolves to itself; an unknown name with no lineage
        raises. One manifest read, zero data — this is how opted-in
        consumers (``follow_renames``) re-find their source after an
        ``ALTER TABLE ... RENAME TO``."""
        if self.exists(name):
            return name
        renamed = self._read_manifest(strict=False).get("renamed", {})
        cur = name
        seen = {cur}
        while True:
            nxt = next(
                (new for new, old in renamed.items() if old == cur), None
            )
            if nxt is None or nxt in seen:
                break
            cur = nxt
            seen.add(cur)
        if cur == name or not self.exists(cur):
            raise FileNotFoundError(
                f"no table {name!r} and no rename lineage leads to a "
                "live table"
            )
        return cur

    def source_moved(
        self, table: str, v_from: int, v_to: int
    ) -> bool:
        """Manifest-only probe shared by the change feed's incremental
        consumers (matview refresh, stream pumps): did any commit in
        ``(v_from, v_to]`` move ``table``'s dir list? O(1) when the
        window's end manifest carries the ``moved`` checkpoint map
        (every commit since its introduction maintains it in
        :meth:`_commit_tail`): the answer is ``moved[table] > v_from``
        — a consumer resuming across 10k idle commits reads ONE
        manifest, and the answer is exact even when intermediate
        manifests were vacuumed. Tables with no checkpoint entry yet
        (untouched since the map landed) fall back to the linear walk:
        a JSON read per version, no Spark job; vacuumed windows then
        answer True (conservative — ``table_changes`` raises its
        precise error)."""
        try:
            end = self._version_manifest(v_to)
        except FileNotFoundError:
            return True
        moved = end.get("moved")
        if moved is not None and table in moved:
            return moved[table] > v_from
        prev_rels = None
        for v in range(v_from, v_to + 1):
            try:
                vm = self._version_manifest(v)
            except FileNotFoundError:
                return True
            rels = (
                vm["tables"].get(table) or [],
                (vm.get("dvs", {}).get(table) or {}).get("dirs") or [],
            )
            if prev_rels is not None and rels != prev_rels:
                return True
            prev_rels = rels
        return False

    def drop_stream(self, consumer: str) -> None:
        """Deregister a change-feed consumer (the escape hatch when its
        watermark window was vacuumed, or the pipeline is retired) —
        one metadata commit; raises KeyError if absent. The consumer's
        target tables are ordinary tables and stay."""
        if self._pending is not None:
            raise RuntimeError("drop_stream inside an open transaction")
        if self.stream_watermark(consumer) is None:
            raise KeyError(f"no change-feed consumer {consumer!r}")

        def mutate(m):
            m["streams"].pop(consumer)

        self._publish_meta(mutate, f"cdf-drop-{consumer}")

    def table_changes(
        self,
        table: str,
        from_version: int,
        to_version: int | None = None,
        key_cols: list[str] | None = None,
        follow_renames: bool = False,
    ) -> DataFrame:
        """Row-level changes committed AFTER snapshot ``from_version``
        up to and including ``to_version`` (default: current), as the
        table's columns plus ``_change_type`` (``insert`` / ``delete``
        — an UPDATE appears as its delete+insert pair, the honest
        representation for a file-diff feed) and ``_commit_version``
        (the commit that published the change). Versions whose commit
        did not touch the table's dir list contribute nothing without
        any I/O. Raises if a needed version manifest was vacuumed, or
        if a column changed type between the endpoints (a feed across
        an incompatible rewrite is ill-defined).

        ``key_cols`` (caller-keyed, like ``apply_changes_into``) turns
        the pairs back into COLUMN-LEVEL updates, Delta CDF style: a
        key with both a delete and an insert in ONE commit relabels
        them ``update_preimage`` / ``update_postimage`` — a consumer
        can then diff pre vs post to see WHICH columns changed; lone
        inserts/deletes keep their labels (a key-column rewrite is
        honestly a delete of the old key + insert of the new). Costs
        one extra shuffle over the feed window (bounded by the changed
        files, never the table). With duplicate keys at one version,
        all of the key's deletes become preimages and all its inserts
        postimages.

        ``follow_renames=True`` lets the window cross ``ALTER TABLE
        ... RENAME TO`` commits: the manifest's ``renamed[new] = old``
        markers form a name-lineage chain, and the feed reads each
        commit's diff under the name the table BORE at that commit (a
        rename commit itself moves no data and contributes nothing).
        The default remains a loud refusal — a name-keyed consumer
        must opt in to treating the renamed table as the same
        identity."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if to_version is None:
            to_version = self._read_manifest(strict=False)["version"]
        if from_version > to_version:
            raise ValueError(
                f"from_version {from_version} > to_version {to_version}"
            )
        # the name the table bore at each version in the window: walk
        # the renamed[new]=old lineage chain backwards from to_version
        names = {to_version: table}
        cur = table
        for v in range(to_version, from_version, -1):
            new_r = self._version_manifest(v).get("renamed", {})
            old_r = self._version_manifest(v - 1).get("renamed", {})
            if follow_renames and new_r.get(cur) != old_r.get(cur):
                if new_r.get(cur) is None:
                    # the marker VANISHED at this commit (a restore or
                    # drop rolled the rename back) — the lineage chain
                    # is broken, not followable
                    raise ValueError(
                        f"table_changes({table!r}): commit {v} removed "
                        f"the rename lineage marker for {cur!r} (a "
                        "restore/drop rolled a rename back); start the "
                        "window at or after that commit"
                    )
                cur = new_r[cur]
            names[v - 1] = cur
        frames = []
        last_sj = None
        seen = False
        for v in range(from_version, to_version + 1):
            nm = names[v]
            vm = self._version_manifest(v)
            sj = vm.get("schemas", {}).get(nm)
            if nm in vm["tables"]:
                seen = True
                if sj is not None:
                    last_sj = sj
            if v == from_version:
                continue
            if names[v] != names[v - 1]:
                # the rename commit: pure metadata, zero row changes
                continue
            pair = self._diff_pair(nm, v)
            if pair is not None:
                frames.append(
                    pair.withColumn("_commit_version", F.lit(v))
                )
        if not seen:
            raise FileNotFoundError(
                f"{table!r} did not exist at any version in "
                f"[{from_version}, {to_version}]"
            )
        # consumers see the feed under the CURRENT logical names (the
        # to_version snapshot's view; files stay physical underneath)
        cmap = self._version_manifest(to_version).get("colmaps", {}).get(
            table
        )
        if not frames:
            base = (
                T.StructType.fromJson(last_sj)
                if last_sj is not None
                else T.StructType()
            )
            ren = (cmap or {}).get("renames", {})
            dropped = set((cmap or {}).get("dropped", []))
            schema = T.StructType(
                [
                    T.StructField(
                        ren.get(f.name, f.name), f.dataType, f.nullable
                    )
                    for f in base.fields
                    if f.name not in dropped
                ]
                + [
                    T.StructField("_change_type", T.StringType()),
                    T.StructField("_commit_version", T.IntegerType()),
                ]
            )
            return self.spark.createDataFrame([], schema)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        out = self._to_logical(out, cmap)
        if key_cols is None:
            return out
        missing = [k for k in key_cols if k not in out.columns]
        if missing:
            raise ValueError(
                f"table_changes({table!r}) key_cols {missing!r} not in "
                f"the table's columns"
            )
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols, "_commit_version")
        is_ins = (F.col("_change_type") == "insert").cast("int")
        paired = (F.max(is_ins).over(w) == 1) & (
            F.min(is_ins).over(w) == 0
        )
        return out.withColumn(
            "_change_type",
            F.when(
                paired,
                F.when(
                    F.col("_change_type") == "insert",
                    F.lit("update_postimage"),
                ).otherwise(F.lit("update_preimage")),
            ).otherwise(F.col("_change_type")),
        )

    def _version_file_inodes(self, table: str, version: int) -> list[tuple]:
        """(inode, abs_dir, rel_file) for every data file the table
        references at ``version`` — the identity that survives hardlink
        carries, so an untouched file matches across versions without
        reading a byte."""
        out = []
        rels = self._version_manifest(version)["tables"].get(table) or []
        for rel_dir in rels:
            d = os.path.join(self.root, rel_dir)
            for f in self._dir_parquet_files(d):
                out.append((os.stat(os.path.join(d, f)).st_ino, d, f))
        return out

    def _diff_pair(self, table: str, v: int) -> DataFrame | None:
        """Row-level diff of one commit (``v-1`` -> ``v``), or None when
        the commit did not move the table's dir list (zero I/O)."""
        from collections import Counter

        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        old_vm = self._version_manifest(v - 1)
        new_vm = self._version_manifest(v)
        if new_vm.get("renamed", {}).get(table) != old_vm.get(
            "renamed", {}
        ).get(table):
            # a name-keyed feed cannot bridge an identity change: the
            # pre-rename files would read as one giant spurious insert
            raise ValueError(
                f"table_changes({table!r}): commit {v} renamed the table "
                f"(from {new_vm['renamed'][table]!r}); start the window "
                "at or after the rename, re-register the consumer, or "
                "pass follow_renames=True to follow the name lineage"
            )
        old_rels = old_vm["tables"].get(table) or []
        new_rels = new_vm["tables"].get(table) or []
        old_dv = old_vm.get("dvs", {}).get(table)
        new_dv = new_vm.get("dvs", {}).get(table)
        old_dv_dirs = (old_dv or {}).get("dirs") or []
        new_dv_dirs = (new_dv or {}).get("dirs") or []
        if old_rels == new_rels and old_dv_dirs == new_dv_dirs:
            return None
        old_files = self._version_file_inodes(table, v - 1)
        new_files = self._version_file_inodes(table, v)
        old_ct = Counter(ino for ino, _d, _f in old_files)
        new_ct = Counter(ino for ino, _d, _f in new_files)

        def pick(files, surplus):
            """For each inode, the paths exceeding the other side's
            multiplicity — identical-content duplicates cancel by
            count, whichever physical path carried them."""
            left = dict(surplus)
            out: dict[str, list[str]] = {}
            for ino, d, f in files:
                if left.get(ino, 0) > 0:
                    left[ino] -= 1
                    out.setdefault(d, []).append(f)
            return out

        added = pick(new_files, new_ct - old_ct)
        removed = pick(old_files, old_ct - new_ct)
        # vectors the commit ADDED delete rows in files that did not
        # move (merge-on-read DML); vectors it carried subtract from
        # the removed-side read (those rows were not logical at v-1)
        added_dv = [d for d in new_dv_dirs if d not in old_dv_dirs]
        if not added and not removed and not added_dv:
            return None  # pointer reshuffle only (e.g. restore to same)
        old_sj = old_vm.get("schemas", {}).get(table)
        new_sj = new_vm.get("schemas", {}).get(table)
        try:
            merged_sj = _merge_schema_json(old_sj, new_sj)
        except ValueError as e:
            raise ValueError(
                f"table_changes({table!r}) across commit {v}: {e}"
            ) from None
        if merged_sj is None:
            raise ValueError(
                f"table_changes({table!r}): versions {v - 1}->{v} predate "
                "schema tracking; rewrite the table once first"
            )
        merged = T.StructType.fromJson(merged_sj)
        reserved = {"_change_type", "_commit_version"}
        clash = reserved & set(merged.fieldNames())
        if clash:
            raise ValueError(
                f"{table!r} has reserved column(s) {sorted(clash)}; the "
                "change feed stamps both and cannot disambiguate them"
            )

        def cast_merged(df):
            return df.select(
                *[
                    F.col(f.name).cast(f.dataType)
                    if f.name in df.columns
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in merged.fields
                ]
            )

        def align(by_dir, side_sj, side_dv):
            if not by_dir:
                return self.spark.createDataFrame([], merged)
            stored = (
                T.StructType.fromJson(side_sj) if side_sj else None
            )
            parts = []
            for d, fs in by_dir.items():
                r = self.spark.read.option("basePath", d)
                if stored is not None:
                    r = r.schema(stored)
                part = r.parquet(*(os.path.join(d, f) for f in fs))
                parts.append(
                    self._dv_strip(self._dv_annotate(part), side_dv)
                    if side_dv
                    else part
                )
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p, allowMissingColumns=True)
            return cast_merged(df)

        def dv_delta():
            """Rows the commit's NEW vectors deleted, read from the
            files they reference at v-1 — I/O bounded by the affected
            files, like every other feed read."""
            if not added_dv:
                return None
            rows = self.spark.read.schema(self._dv_schema()).parquet(
                *(os.path.join(self.root, r) for r in added_dv)
            )
            names = {
                x[self._DV_FILE]
                for x in rows.select(self._DV_FILE).distinct().collect()
            }
            by_dir: dict[str, list[str]] = {}
            for _ino, d, f in old_files:
                if self._dv_name(f) in names:
                    by_dir.setdefault(d, []).append(f)
            if not by_dir:
                return None
            stored = T.StructType.fromJson(old_sj) if old_sj else None
            parts = []
            for d, fs in by_dir.items():
                rd = self.spark.read.option("basePath", d)
                if stored is not None:
                    rd = rd.schema(stored)
                parts.append(
                    self._dv_annotate(
                        rd.parquet(*(os.path.join(d, f) for f in fs))
                    )
                )
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p, allowMissingColumns=True)
            hit = df.join(
                F.broadcast(rows),
                on=[self._DV_FILE, self._DV_POS],
                how="left_semi",
            ).drop(self._DV_FILE, self._DV_POS)
            return cast_merged(hit)

        a = align(added, new_sj, new_dv)
        r = align(removed, old_sj, old_dv)
        dd = dv_delta()
        if dd is not None:
            r = r.unionByName(dd)
        return (
            a.exceptAll(r).withColumn("_change_type", F.lit("insert"))
        ).unionByName(
            r.exceptAll(a).withColumn("_change_type", F.lit("delete"))
        )

    def restore(self, version: int) -> None:
        """Roll the catalog back to snapshot ``version`` — published as a
        NEW commit whose table map IS the old snapshot's (tables created
        after it disappear; the rollback itself is in the history and no
        data is deleted — vacuum still governs reclamation). Delta's
        RESTORE semantics, whole-catalog. The rollback is COMPLETE
        state: schemas and CHECK constraints revert with the data (the
        old data provably satisfied the old checks, so no validation
        scan is needed — unlike :meth:`restore_table`, which restores
        one table UNDER the current constraints)."""
        if self._pending is not None:
            raise RuntimeError("cannot restore inside an open transaction")
        vpath = os.path.join(self.root, _VERSIONS, f"{version}.json")
        try:
            with open(vpath) as f:
                old = json.load(f)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"no retained snapshot for version {version}"
            ) from None
        self._publish(
            old["tables"],
            f"restore-v{version}",
            replace=True,
            schemas=old.get("schemas", {}),
            checks=old.get("checks", {}),
            layouts=old.get("layouts", {}),
            blooms_cfg=old.get("blooms", {}),
            views=old.get("views", {}),
            streams=old.get("streams", {}),
            dvs=old.get("dvs", {}),
            colmaps=old.get("colmaps", {}),
            properties=old.get("properties", {}),
        )

    # -- maintenance --------------------------------------------------------

    def compact_buckets(
        self,
        table: str,
        buckets: list[int],
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> bool:
        """PARTIAL OPTIMIZE for ``_kb``-bucketed tables (Delta's
        ``OPTIMIZE ... WHERE <partition predicate>``): fold ONLY the
        named buckets' files — across every appended dir — into
        size-targeted files, and hardlink-carry every other bucket's
        files into the new snapshot untouched. At 100 TB a table
        cannot afford whole-table OPTIMIZE after every CDC window;
        this is the bounded form: rewrite cost is O(named buckets),
        and the named buckets' pending deletion vectors fold while
        the carried buckets keep theirs (a PARTIAL vector fold —
        the name-keyed prune retires exactly the rewritten files'
        entries). Stats/bloom sidecar entries for carried files
        reuse verbatim (zero footer re-reads). Returns False when
        the named buckets hold no files (nothing published).

        Checks are NOT re-enforced: a compaction is row-preserving
        by construction, and validating the hardlink-carried bulk
        would cost O(table) — the write-time gates already vetted
        every row when it first landed."""
        if self._pending is not None:
            raise RuntimeError(
                "compact_buckets inside an open transaction"
            )
        meta = self.bucket_meta(table)
        if meta is None:
            raise ValueError(
                f"compact_buckets: {table!r} has no _kb bucket layout; "
                "use compact() or overwrite_bucketed first"
            )
        buckets = sorted({int(b) for b in buckets})
        bad = [b for b in buckets if not 0 <= b < meta["num_buckets"]]
        if bad:
            raise ValueError(
                f"bucket id(s) {bad} outside [0, {meta['num_buckets']})"
            )
        snapshot = self._committed_rels(table)
        if snapshot is None:
            raise FileNotFoundError(f"{table!r} not in manifest")
        from pyspark.sql import functions as F

        touched_parts = {f"_kb={b}" for b in buckets}
        # split every dir's files into fold vs carry, driver-side
        carry: list[tuple[str, str, dict | None, dict | None]] = []
        total_bytes = 0
        n_touched = 0
        for rel_dir in snapshot:
            d = os.path.join(self.root, rel_dir)
            stats = (filestats.read_dir_stats(d) or {}).get("files", {})
            bstats = (blooms.read_dir_blooms(d) or {}).get("files", {})
            for f in self._dir_parquet_files(d):
                part = next(
                    (s for s in f.split(os.sep) if s.startswith("_kb=")),
                    None,
                )
                if part in touched_parts:
                    n_touched += 1
                    total_bytes += os.path.getsize(os.path.join(d, f))
                else:
                    carry.append((d, f, stats.get(f), bstats.get(f)))
        if n_touched == 0:
            return False
        stored = self._stored_schema(table)
        dv = self.dv_info(table)
        sub = self._read_dirs(
            [os.path.join(self.root, r) for r in snapshot], stored, dv=dv
        ).where(F.col("_kb").isin(buckets))
        n_files = max(1, -(-total_bytes // target_file_bytes))
        spec = self.layout(table)
        if spec is not None and all(
            c in sub.columns for c in spec["cols"]
        ):
            sub = self._apply_layout(sub, spec, n_files)
        else:
            sub = sub.repartition(n_files, "_kb")
        with self.transaction(f"compact-buckets-{table}"):
            rel = self._stage_dir(table)
            stage = os.path.join(self.root, rel)
            sub.write.mode("overwrite").partitionBy("_kb").parquet(stage)
            reuse: dict = {}
            bloom_reuse: dict = {}
            for d, f, entry, bentry in carry:
                dst = os.path.join(stage, f)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.link(os.path.join(d, f), dst)
                if entry is not None:
                    reuse[f] = {
                        k: v for k, v in entry.items() if k != "bloom"
                    }
                if bentry is not None:
                    bloom_reuse[f] = bentry
            self._write_stage_stats(
                rel, reuse=reuse or None, table=table,
                bloom_reuse=bloom_reuse or None,
            )
            self._pending[table] = [rel]
            self._note_replace(table, rel, schema=stored)
            self._intents[table]["base"] = snapshot
        return True

    def recluster(
        self,
        table: str,
        num_buckets: int,
        key_cols: list[str] | None = None,
    ) -> dict:
        """Online bucket-count (or bucket-key) evolution — ``ALTER TABLE
        t CLUSTERED BY (keys) INTO m BUCKETS`` on a LIVE table, one
        versioned commit carrying data AND the new layout sidecar (no
        crash window that strands the table under the old modulus).

        At 100 TB a bucket count chosen at day one is wrong by year two;
        the placement hash (``pmod(xxhash64(keys), n)`` — storage.py
        ``kb_col``) makes two of the three moves cheap:

        - **fold** (same keys, new count divides old, no pending
          deletion vectors): ``pmod(h, n) == b`` implies
          ``pmod(h, m) == b % m``, so every old bucket maps WHOLE into
          one new bucket — files hardlink into the merged dirs
          (collision-safe rename), zero rows rewritten, zero Spark
          jobs, stats/bloom sidecar entries re-keyed verbatim. Inodes
          survive, so the change feed across the commit is EMPTY and
          every CDC consumer / matview resumes for free.
        - **split** (same keys, new count a multiple of old): each old
          bucket's rows land only in its ``m/n`` sub-buckets, so ONE
          map-only pass re-places them — no exchange anywhere in the
          plan (the partitioned write fans each task's rows into its
          local sub-dirs).
        - **reshuffle** (key change, non-multiple count, or pending
          vectors): the honest full rewrite, one shuffle on the new
          placement hash; pending vectors fold away through the
          DV-aware scan.

        split/reshuffle rewrite every file, so the feed shows a full
        delete+insert of identical rows: signed-partial consumers net
        to zero per group, keyed CDC replicas see same-value
        update pairs — all converge (pytest-pinned), at an O(table)
        feed cost like any compaction. Old versions stay
        time-travelable under their old layout (reads never consult
        the modulus; only writers and pruners do)."""
        from pyspark.sql import functions as F

        from gcp_datalake_pipeline_spark.storage import kb_col

        if self._pending is not None:
            raise RuntimeError("recluster inside an open transaction")
        if num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        meta = self.bucket_meta(table)
        if key_cols is None:
            if meta is None:
                raise ValueError(
                    f"recluster: {table!r} has no _kb layout and no "
                    "key_cols were given; name the bucket keys"
                )
            key_cols = list(meta["key_cols"])
        key_cols = list(key_cols)
        vs = self.view_spec(table)
        if vs is not None and key_cols != list(vs["keys"]):
            # a matview's refresh places merged rows by hashing its
            # GROUP KEYS; re-keying the layout would silently break
            # every later partition-pruned refresh
            raise ValueError(
                f"{table!r} is a materialized view bucketed on its "
                f"group keys {vs['keys']!r}; recluster may change the "
                "bucket COUNT but not the keys"
            )
        snapshot = self._committed_rels(table)
        if snapshot is None:
            raise FileNotFoundError(f"{table!r} not in manifest")
        logical = [
            c for c in self.read(table).columns if c != "_kb"
        ]
        missing = [k for k in key_cols if k not in logical]
        if missing:
            raise ValueError(
                f"recluster: key column(s) {missing!r} not in {table!r}"
            )
        old_n = meta["num_buckets"] if meta else None
        same_keys = meta is not None and list(meta["key_cols"]) == key_cols
        if same_keys and old_n == num_buckets:
            return {
                "table": table, "strategy": "noop",
                "num_buckets": num_buckets, "key_cols": key_cols,
            }
        has_dv = bool(self.dv_count(table))
        if (
            same_keys
            and old_n % num_buckets == 0
            and not has_dv
        ):
            return self._recluster_fold(
                table, snapshot, num_buckets, key_cols
            )
        strategy = (
            "split"
            if same_keys and num_buckets % old_n == 0
            else "reshuffle"
        )
        df = self.read(table)
        if "_kb" in df.columns:
            df = df.drop("_kb")
        df = df.withColumn("_kb", kb_col(key_cols, num_buckets))
        if strategy == "reshuffle":
            df = df.repartition(num_buckets, F.col("_kb"))
        out = self._to_physical_frame(df, self.colmap(table))
        with self.transaction(f"recluster-{table}"):
            rel = self._stage_dir(table)
            stage = os.path.join(self.root, rel)
            out.write.mode("overwrite").partitionBy("_kb").parquet(stage)
            # row-preserving by construction — like compact, the
            # write-time gates already vetted every row
            self._write_stage_stats(rel, table=table)
            self._pending[table] = [rel]
            self._note_replace(table, rel, schema=out.schema)
            self._intents[table]["base"] = snapshot
            self._write_bucket_meta(table, num_buckets, key_cols)
        return {
            "table": table, "strategy": strategy,
            "num_buckets": num_buckets, "key_cols": key_cols,
        }

    def _recluster_fold(
        self, table: str, snapshot: list[str], new_n: int,
        key_cols: list[str],
    ) -> dict:
        """The divisor fast path: move every ``_kb=b`` file whole into
        ``_kb=(b % new_n)`` by hardlink (renamed to stay collision-free
        across source buckets and appended dirs). Zero data rewritten,
        zero Spark jobs; the commit is pure metadata + links."""
        with self.transaction(f"recluster-{table}"):
            rel = self._stage_dir(table)
            stage = os.path.join(self.root, rel)
            reuse: dict = {}
            bloom_reuse: dict = {}
            for di, rel_dir in enumerate(snapshot):
                d = os.path.join(self.root, rel_dir)
                stats = (filestats.read_dir_stats(d) or {}).get(
                    "files", {}
                )
                bstats = (blooms.read_dir_blooms(d) or {}).get(
                    "files", {}
                )
                for f in self._dir_parquet_files(d):
                    part = next(
                        (
                            s
                            for s in f.split(os.sep)
                            if s.startswith("_kb=")
                        ),
                        None,
                    )
                    if part is None:
                        raise ValueError(
                            f"recluster: {table!r} holds an "
                            f"unpartitioned file ({f}); OPTIMIZE it "
                            "into the _kb layout first"
                        )
                    b = int(part.split("=", 1)[1])
                    newf = os.path.join(
                        f"_kb={b % new_n}",
                        f"b{b}d{di}_{os.path.basename(f)}",
                    )
                    dst = os.path.join(stage, newf)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.link(os.path.join(d, f), dst)
                    if stats.get(f) is not None:
                        reuse[newf] = {
                            k: v
                            for k, v in stats[f].items()
                            if k != "bloom"
                        }
                    if bstats.get(f) is not None:
                        bloom_reuse[newf] = bstats[f]
            self._write_stage_stats(
                rel, reuse=reuse or None, table=table,
                bloom_reuse=bloom_reuse or None,
            )
            self._pending[table] = [rel]
            self._note_replace(
                table, rel, schema=self._stored_schema(table)
            )
            self._intents[table]["base"] = snapshot
            self._write_bucket_meta(table, new_n, key_cols)
        return {
            "table": table, "strategy": "fold",
            "num_buckets": new_n, "key_cols": key_cols,
        }

    def replace_partitions(
        self,
        table: str,
        part_col: str,
        dropped,
        add_df: DataFrame,
    ) -> None:
        """Versioned partial rewrite keyed on an arbitrary hive
        partition column: partitions named in ``dropped`` vanish,
        ``add_df``'s rows land as NEW files in whatever partitions they
        carry (ADDITIVE — existing files in those partitions hardlink-
        carry alongside), and every other file carries untouched with
        its stats/bloom sidecar entries reused verbatim. One commit;
        rewrite cost is O(add_df) + links.

        This is the move-rows-between-partitions shape ``_kb`` merges
        cannot express (their staged output REPLACES the partitions it
        lands in): the IVF re-centering path drops the re-assigned
        ``cid`` partitions and appends their vectors' new placements in
        the same snapshot. Carried files keep their names, so pending
        deletion vectors on them stay valid across the commit."""
        auto = self._require_txn()
        if auto is not None:
            with auto:
                self.replace_partitions(table, part_col, dropped, add_df)
            return
        snapshot = self._committed_rels(table)
        if snapshot is None:
            raise FileNotFoundError(f"{table!r} not in manifest")
        cmap = self.colmap(table)
        add_df = self._to_physical_frame(add_df, cmap)
        dropped_parts = {f"{part_col}={v}" for v in dropped}
        rel = self._stage_dir(table)
        stage = os.path.join(self.root, rel)
        add_df.write.mode("overwrite").partitionBy(part_col).parquet(stage)
        # constraint enforcement: row CHECKs + intra-stage UNIQUE over
        # the staged adds, plus a UNIQUE probe against the SURVIVING
        # partitions only — a moved row legitimately restates a row of a
        # dropped partition, but a new value colliding with a partition
        # this write never touched is a genuine duplicate
        from pyspark.sql import functions as F

        logical_part = (cmap or {}).get("renames", {}).get(
            part_col, part_col
        )
        self._enforce_checks(
            table,
            stage,
            cross_table=False,
            existing_where=F.coalesce(
                ~F.col(logical_part).isin(list(dropped)), F.lit(True)
            ),
        )
        # parent-side FK RESTRICT: dropped partitions' keys vanish
        # unless the adds restate them — referenced removals refuse
        pspecs = self._fk_parent_specs(table)
        if pspecs:
            old_dropped = self.read(table).where(
                F.col(logical_part).isin(list(dropped))
            )
            staged_df = self._to_logical(
                self.spark.read.parquet(stage), cmap
            )
            # self-FK post-state children: staged adds ∪ surviving
            # (non-dropped) partitions
            post_self = staged_df.unionByName(
                self.read(table).where(
                    F.coalesce(
                        ~F.col(logical_part).isin(list(dropped)),
                        F.lit(True),
                    )
                ),
                allowMissingColumns=True,
            )
            for pcols in pspecs:
                removed = (
                    old_dropped.select(*pcols)
                    .distinct()
                    .join(
                        staged_df.select(*pcols).distinct(),
                        pcols,
                        "left_anti",
                    )
                )
                self._refuse_fk_orphans(
                    table,
                    removed,
                    pcols,
                    "replace partitions of",
                    self_rows=post_self,
                )
        reuse: dict = {}
        bloom_reuse: dict = {}
        for rel_dir in snapshot:
            d = os.path.join(self.root, rel_dir)
            stats = (filestats.read_dir_stats(d) or {}).get("files", {})
            bstats = (blooms.read_dir_blooms(d) or {}).get("files", {})
            for f in self._dir_parquet_files(d):
                part = next(
                    (
                        s
                        for s in f.split(os.sep)
                        if s.startswith(f"{part_col}=")
                    ),
                    None,
                )
                if part in dropped_parts:
                    continue
                dst = os.path.join(stage, f)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.link(os.path.join(d, f), dst)
                if stats.get(f) is not None:
                    reuse[f] = {
                        k: v for k, v in stats[f].items() if k != "bloom"
                    }
                if bstats.get(f) is not None:
                    bloom_reuse[f] = bstats[f]
        self._write_stage_stats(
            rel, reuse=reuse or None, table=table,
            bloom_reuse=bloom_reuse or None,
        )
        self._pending[table] = [rel]
        self._note_replace(table, rel, schema=add_df.schema)
        self._intents[table]["base"] = snapshot

    def merge_when(
        self,
        source: DataFrame,
        table: str,
        key_cols: list[str],
        matched: dict | None = None,
        not_matched: dict | None = None,
        by_source: dict | None = None,
        order_col: str | None = None,
    ) -> dict:
        """Generalized three-way MERGE (Delta's conditional / BY SOURCE
        clause set), as ONE post-image computation routed through the
        existing checked write paths:

        - ``matched``: ``{"action": "update"|"delete", "cond":
          sql|None, "sets": {col: expr}|None}`` — target rows with a
          source match take the source row (``sets=None`` = SET *),
          update only the listed columns (column-level SET, exprs over
          ``src.``/``tgt.``), or drop, when ``cond`` holds;
        - ``not_matched``: ``{"action": "insert", "cond": sql|None,
          "cols": [...]|None, "vals": [expr...]|None}`` — source rows
          with no target match insert the whole source row
          (``cols=None`` = INSERT *) or the listed columns from the
          value exprs (unlisted columns NULL), when ``cond`` holds;
        - ``by_source``: ``{"action": "delete"|"update", "cond":
          sql|None, "sets": {col: expr}}`` — target rows with NO
          source match drop, or take the column-level SET (exprs see
          ``tgt.`` only — every ``src.`` value is NULL here), when
          ``cond`` holds (the full-snapshot-sync clauses).

        Conditions and value exprs are Spark SQL over ``src.col`` /
        ``tgt.col`` (``source.`` / ``target.`` also accepted);
        unqualified names refuse at analysis. SET/INSERT column lists
        may not name merge keys or GENERATED ALWAYS columns. Duplicate
        source keys collapse last-wins first (same contract as
        :meth:`~.storage.Catalog.merge_upsert`); NULL join keys never
        match (standard SQL equi-join).

        Execution = ONE shuffle join on the keys + one write, atomic:
        - plain table: full-outer join against the whole target, result
          lands via :meth:`overwrite` (content replace — the same cost
          shape as the classic upsert on an unbucketed table), with its
          CHECK/UNIQUE enforcement and parent-FK removed-key probes;
        - bucketed, no ``by_source``: the target scan PRUNES to the
          buckets holding source keys and only those ``_kb`` partitions
          rewrite via :meth:`replace_partitions` (untouched buckets
          hardlink-carry; its survivor-scoped UNIQUE probe and
          dropped-key FK guards apply) — the Delta-MERGE blast radius;
        - bucketed with ``by_source``: inherently O(target) (every
          target row must prove it has a source match), one partitioned
          full rewrite that keeps the ``_kb`` layout.

        Returns ``{"merge_updated": u, "merge_inserted": i,
        "merge_deleted": d}`` (counts ride one aggregate pass; the
        write re-evaluates the join — deterministic sources are the
        front door's documented contract)."""
        import re as _re

        from pyspark.sql import functions as F

        from gcp_datalake_pipeline_spark.storage import (
            dedup_last_wins,
            kb_col,
        )

        def _act(clause, kinds, label):
            if clause is None:
                return None
            a = clause.get("action")
            if a not in kinds:
                raise ValueError(
                    f"merge_when {label} action {a!r}: supported "
                    f"{sorted(kinds)}"
                )
            return a

        m_act = _act(matched, {"update", "delete"}, "matched")
        i_act = _act(not_matched, {"insert"}, "not_matched")
        b_act = _act(by_source, {"delete", "update"}, "by_source")
        if not (m_act or i_act or b_act):
            raise ValueError("merge_when needs at least one WHEN clause")
        tschema = self.logical_schema(table)
        if tschema is None:
            raise FileNotFoundError(f"{table!r} not in manifest")
        tcols = [f.name for f in tschema.fields if f.name != "_kb"]
        ttypes = {f.name: f.dataType for f in tschema.fields}
        missing = [k for k in key_cols if k not in tcols]
        if missing:
            raise ValueError(f"merge keys {missing!r} not in {table!r}")
        m_sets = (matched or {}).get("sets") if m_act == "update" else None
        i_cols = (not_matched or {}).get("cols") if i_act else None
        i_vals = (not_matched or {}).get("vals") if i_act else None
        b_sets = (by_source or {}).get("sets") if b_act == "update" else None
        if b_act == "update" and not b_sets:
            raise ValueError(
                "WHEN NOT MATCHED BY SOURCE THEN UPDATE needs a "
                "column-level SET (there is no source row to SET * "
                "from)"
            )
        if i_act and (i_cols is None) != (i_vals is None) or (
            i_cols is not None and len(i_cols) != len(i_vals)
        ):
            raise ValueError(
                "merge_when not_matched needs matching cols/vals lists "
                "(or neither, for INSERT *)"
            )
        writes = m_act == "update" or i_act is not None or b_sets
        star = (m_act == "update" and m_sets is None) or (
            i_act is not None and i_cols is None
        )
        need_full = star
        # engine-computed columns (GENERATED ALWAYS AS IDENTITY /
        # (expr)): a merge that writes source values must never supply
        # them — matched rows KEEP their identity, inserted rows MINT
        # from the high-water mark, and generated expressions recompute
        # over the post-image row (the INSERT path's Delta semantics;
        # without this a merge-landed explicit id silently bypasses the
        # mark and a later INSERT mints a DUPLICATE)
        ident = self.identity_spec(table)
        gen = self.generated_spec(table) or {}
        icol = ident["col"] if ident else None
        computed = set(gen) | ({icol} if icol else set())
        target = self.read(table)
        meta = self.bucket_meta(table)
        merge_when_guards(
            table, tcols, key_cols, computed, source.columns,
            m_sets, i_cols, b_sets, star, bool(writes),
            meta is not None,
        )
        src = dedup_last_wins(source, key_cols, order_col)
        src = src.drop("_row_idx", "_source_file")
        touched: list | None = None
        if meta is not None:
            if list(meta["key_cols"]) != list(key_cols):
                raise ValueError(
                    f"merge target {table!r} is bucketed on "
                    f"{meta['key_cols']}; merge keys must match"
                )
            if by_source is None:
                touched = [
                    r["_kb"]
                    for r in src.select(*key_cols)
                    .distinct()
                    .select(
                        kb_col(key_cols, meta["num_buckets"]).alias("_kb")
                    )
                    .distinct()
                    .collect()
                ]
                if not touched and i_act is None:
                    return {
                        "merge_updated": 0,
                        "merge_inserted": 0,
                        "merge_deleted": 0,
                    }
                target = target.where(F.col("_kb").isin(touched))
        t_pref = target.select(
            *[F.col(c).alias(f"__t_{c}") for c in tcols],
            F.lit(True).alias("__tf"),
        )
        s_pref = src.select(
            *[F.col(c).alias(f"__s_{c}") for c in src.columns],
            F.lit(True).alias("__sf"),
        )
        on = None
        for k in key_cols:
            leg = F.col(f"__t_{k}") == F.col(f"__s_{k}")
            on = leg if on is None else on & leg
        j = t_pref.join(s_pref, on, "full_outer")

        def _tx(e: str) -> str:
            # rewrite src./tgt. qualifiers OUTSIDE string literals only
            # ('see src.feed' must stay a literal) — split on quoted
            # segments ('' and \' escapes) and substitute the rest
            parts = _re.split(r"('(?:[^'\\]|\\.|'')*')", e)
            out = []
            for idx, p in enumerate(parts):
                if idx % 2 == 0:
                    p = _re.sub(
                        r"\b(?:src|source)\s*\.\s*(\w+)", r"__s_\1", p,
                        flags=_re.I,
                    )
                    p = _re.sub(
                        r"\b(?:tgt|target)\s*\.\s*(\w+)", r"__t_\1", p,
                        flags=_re.I,
                    )
                out.append(p)
            return "".join(out)

        def _cx(clause):
            cond = (clause or {}).get("cond")
            if cond is None:
                return F.lit(True)
            return F.coalesce(F.expr(_tx(cond)), F.lit(False))

        tf = F.coalesce(F.col("__tf"), F.lit(False))
        sf = F.coalesce(F.col("__sf"), F.lit(False))
        is_m, t_only, s_only = tf & sf, tf & ~sf, ~tf & sf
        false = F.lit(False)
        upd = is_m & _cx(matched) if m_act == "update" else false
        mdel = is_m & _cx(matched) if m_act == "delete" else false
        ins = s_only & _cx(not_matched) if i_act else false
        bdel = t_only & _cx(by_source) if b_act == "delete" else false
        bupd = t_only & _cx(by_source) if b_act == "update" else false
        keep = (is_m & ~mdel) | (t_only & ~bdel) | ins
        # cast-loss probe, riding the SAME aggregate pass as the
        # counts: a SET/VALUES expression (or a star-copied column of a
        # type-mismatched engine-level source) whose cast to the target
        # type loses a non-null value must refuse — every other write
        # path does (_probe_set_casts, _align_merge_source), and a
        # silent NULL here would corrupt matched rows
        probes: list[tuple[str, object]] = []

        def _probe(label, flag, value, c):
            # try_cast: under ANSI mode a plain cast THROWS mid-job on
            # the first bad value — the probe must count losses and
            # refuse cleanly instead
            e = value.try_cast(ttypes[c])
            probes.append(
                (
                    label,
                    F.sum(
                        (flag & value.isNotNull() & e.isNull()).cast(
                            "long"
                        )
                    ),
                )
            )

        for c in tcols:
            if c in computed:
                continue
            if m_act == "update":
                if m_sets and c in m_sets:
                    _probe(
                        f"SET {c} = {m_sets[c]}", upd,
                        F.expr(_tx(m_sets[c])), c,
                    )
                elif m_sets is None and c in src.columns and (
                    src.schema[c].dataType != ttypes[c]
                ):
                    _probe(f"SET * column {c}", upd, F.col(f"__s_{c}"), c)
            if i_act:
                if i_cols is not None and c in i_cols:
                    v = i_vals[i_cols.index(c)]
                    _probe(
                        f"INSERT {c} = {v}", ins, F.expr(_tx(v)), c
                    )
                elif i_cols is None and c in src.columns and (
                    src.schema[c].dataType != ttypes[c]
                ):
                    _probe(
                        f"INSERT * column {c}", ins, F.col(f"__s_{c}"), c
                    )
            if b_sets and c in b_sets:
                _probe(
                    f"BY SOURCE SET {c} = {b_sets[c]}", bupd,
                    F.expr(_tx(b_sets[c])), c,
                )
        counts = j.agg(
            F.sum((upd | bupd).cast("long")).alias("u"),
            F.sum(ins.cast("long")).alias("i"),
            F.sum((mdel | bdel).cast("long")).alias("d"),
            *[p.alias(f"__cl_{i2}") for i2, (_l, p) in enumerate(probes)],
        ).first()
        for i2, (label, _p) in enumerate(probes):
            lost = counts[f"__cl_{i2}"]
            if lost:
                raise ValueError(
                    f"merge {label} does not cast to the target type "
                    f"for {lost} row(s) — refusing to null them "
                    "silently"
                )

        def _val(c):
            """Per-column post-image value: each firing clause installs
            its value, everything else keeps the target's (NULL for
            inserted rows' unlisted columns — __t_ is NULL there)."""
            tcol = F.col(f"__t_{c}")
            col = None

            def when(flag, v):
                nonlocal col
                col = F.when(flag, v) if col is None else col.when(flag, v)

            if m_act == "update" and c not in computed:
                if m_sets is None:
                    when(upd, F.col(f"__s_{c}"))
                elif c in m_sets:
                    when(upd, F.expr(_tx(m_sets[c])))
            if i_act and c not in computed:
                if i_cols is None:
                    when(ins, F.col(f"__s_{c}"))
                elif c in i_cols:
                    when(ins, F.expr(_tx(i_vals[i_cols.index(c)])))
            if b_sets and c in b_sets:
                when(bupd, F.expr(_tx(b_sets[c])))
            return (col.otherwise(tcol) if col is not None else tcol)

        out = j.filter(keep).select(
            *[_val(c).cast(ttypes[c]).alias(c) for c in tcols]
        )
        n_ins = counts["i"] or 0
        ident_intent = None
        if writes and gen:
            # generated expressions recompute over the post-image row —
            # deterministic, so kept rows re-derive their own values
            out = out.select(
                *[
                    (
                        F.expr(gen[c]).cast(ttypes[c]).alias(c)
                        if c in gen
                        else F.col(c)
                    )
                    for c in tcols
                ]
            )
        if writes and icol is not None and i_act is not None:
            from gcp_datalake_pipeline_spark.operators.dims import (
                assign_dense_ids,
            )

            start = int(ident["next"])
            expect = start
            if self._pending is not None:
                staged = self._intents.get(table, {}).get("identity")
                if staged is not None:
                    start = int(staged["next"])
                    # None = table CREATEd in this very block (the
                    # commit CAS then expects "no identity existed")
                    expect = staged["expect_next"]
            keep_rows = out.where(F.col(icol).isNotNull())
            ins_rows = out.where(F.col(icol).isNull()).drop(icol)
            value_cols = [
                c for c in ins_rows.columns if c not in computed
            ]
            ins_rows = assign_dense_ids(
                ins_rows, value_cols, icol, start=start - 1
            ).select(
                *[
                    F.col(c).cast(ttypes[c]).alias(c)
                    for c in keep_rows.columns
                ]
            )
            out = keep_rows.unionByName(ins_rows)
            ident_intent = {
                "col": icol, "next": start + n_ins, "expect_next": expect,
            }

        def _write():
            if meta is None:
                self.overwrite(out, table)
            else:
                okb = out.withColumn(
                    "_kb", kb_col(key_cols, meta["num_buckets"])
                )
                if by_source is not None:
                    self.overwrite(okb, table, partition_cols=["_kb"])
                else:
                    self.replace_partitions(table, "_kb", touched, okb)
            if ident_intent is not None:
                self._intents[table]["identity"] = ident_intent

        if ident_intent is not None and self._pending is None:
            # the advanced mark must commit ATOMICALLY with the rows
            with self.transaction(f"merge-when-{table}"):
                _write()
        else:
            _write()
        return {
            "merge_updated": counts["u"] or 0,
            "merge_inserted": n_ins,
            "merge_deleted": counts["d"] or 0,
        }

    def compact(
        self,
        table: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        min_dirs: int = 2,
        cluster_by: list[str] | None = None,
        partition_cols: list[str] | None = None,
        zorder_by: list[str] | None = None,
        zorder_bits: int = 8,
    ) -> bool:
        """Fold an append-grown pointer list back into ONE size-targeted
        data dir, published as a new snapshot (Delta OPTIMIZE semantics).

        Per-file atomic ingest appends one staged dir per load, so a
        long-running landing pipeline grows the pointer list — and the
        file count — linearly with loads; at 100 TB that is the classic
        small-files problem (every reader opens thousands of footers).
        Compaction rewrites the table into ``ceil(bytes /
        target_file_bytes)`` files. Old versions stay readable via
        :meth:`read_at` until :meth:`vacuum` reclaims them.

        ``cluster_by`` additionally range-partitions + sorts the rewrite
        on the given columns, so parquet min/max row-group stats become
        selective for those columns (data skipping, single-dimension:
        the SECOND listed column only clusters within ties of the
        first). Forces a rewrite even below ``min_dirs``.

        ``zorder_by`` instead clusters on the INTERLEAVED-BITS Morton
        value of the listed columns (Delta's ``OPTIMIZE ... ZORDER
        BY``): every rewritten file covers a tight hyper-rectangle in
        ALL the listed dimensions, so :meth:`read` with predicates on
        ANY of them — alone or combined — skips files via the
        ``_file_stats.json`` sidecars. Numeric/date/timestamp columns
        (see :mod:`gcp_datalake_pipeline_spark.zorder`);
        ``zorder_bits`` buckets each dimension into ``2**bits``
        quantile ranges. Mutually exclusive with ``cluster_by``; also
        forces a rewrite.

        Either spec is RECORDED in the manifest (``layouts``): later
        plain ``compact()`` calls re-apply it, row-level DELETE/UPDATE
        re-sorts rewritten candidate files by it, and it rides time
        travel, RESTORE, and clones with the data (:meth:`layout`).

        Concurrency: the commit is conflict-checked against the dir list
        snapshotted HERE (not at the staged write), so an append landing
        between the snapshot and the commit raises
        :class:`ConcurrentWriteError` instead of being silently dropped
        — compaction never wins over data.

        Returns True if a compaction commit was published, False if the
        table was already compact (fewer than ``min_dirs`` dirs and no
        ``cluster_by``).
        """
        if self._pending is not None:
            raise RuntimeError("cannot compact inside an open transaction")
        if cluster_by and zorder_by:
            raise ValueError("cluster_by and zorder_by are mutually exclusive")
        # clustering specs are recorded in the files' PHYSICAL names
        # (the sidecars they make selective are physical); user args
        # arrive logical
        cmap = self.colmap(table)
        if cluster_by:
            cluster_by = [self._phys_name(cmap, c) for c in cluster_by]
        if zorder_by:
            zorder_by = [self._phys_name(cmap, c) for c in zorder_by]
        snapshot = self._committed_rels(table)
        if snapshot is None:
            raise FileNotFoundError(f"{table!r} not in manifest")
        # resolve the clustering spec: explicit args record a NEW layout;
        # a plain compact re-applies the table's recorded one (OPTIMIZE
        # must never destroy clustering it wasn't told to change). Only
        # an EXPLICIT spec forces a rewrite of an already-compact table —
        # a recorded layout's files are already clustered.
        explicit = bool(cluster_by or zorder_by)
        if zorder_by:
            spec = {"kind": "zorder", "cols": list(zorder_by),
                    "bits": zorder_bits}
        elif cluster_by:
            spec = {"kind": "cluster", "cols": list(cluster_by)}
        else:
            spec = self.layout(table)
        dv = self.dv_info(table)
        has_dropped = bool((cmap or {}).get("dropped"))
        if (
            len(snapshot) < min_dirs
            and not explicit
            and not dv
            and not has_dropped
        ):
            # pending vectors (and retired-column cleanup) always force
            # a fold: OPTIMIZE is how merge-on-read deletes materialize
            # and how a dropped physical name becomes reusable
            return False
        total_bytes = 0
        for rel in snapshot:
            for dirpath, _dirs, files in os.walk(os.path.join(self.root, rel)):
                total_bytes += sum(
                    os.path.getsize(os.path.join(dirpath, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        n_files = max(1, -(-total_bytes // target_file_bytes))
        if partition_cols is None and os.path.exists(
            self._bucket_meta_path(table)
        ):
            partition_cols = ["_kb"]  # preserve bucketed-merge layout
        paths = [os.path.join(self.root, r) for r in snapshot]
        # the committed schema, not a sampled footer — a compaction
        # must never narrow an evolved table; pending deletion vectors
        # are subtracted here and retire at the commit (the rewritten
        # files carry fresh names, so the replace-prune clears the map)
        df = self._read_dirs(paths, self._stored_schema(table), dv=dv)
        # a full rewrite is the one write that can RETIRE dropped
        # physical columns: project them out of the new files and clear
        # the dropped list at the commit (renames stay — files keep
        # physical names). After this, the dropped name is reusable.
        dropped = (cmap or {}).get("dropped", [])
        dropped = [c for c in dropped if c in df.columns]
        if dropped:
            df = df.drop(*dropped)
        if spec is not None:
            missing = [c for c in spec["cols"] if c not in df.columns]
            if explicit and missing:
                # a typo'd EXPLICIT column must refuse, not silently
                # compact unsorted (_apply_layout is conservative only
                # for RECORDED specs orphaned by schema drift)
                raise ValueError(
                    f"compact: clustering column(s) {missing!r} not in "
                    f"table {table!r}"
                )
            df = self._apply_layout(df, spec, n_files)
        elif partition_cols:
            df = df.repartition(n_files, *partition_cols)
        else:
            df = df.repartition(n_files)
        with self.transaction(f"compact-{table}"):
            self.overwrite(df, table, partition_cols=partition_cols)
            # Anchor conflict detection to the pre-rewrite snapshot: the
            # overwrite's own base was read AFTER the df plan captured
            # `snapshot`, which would let an append in that window be
            # replaced away without a conflict.
            self._intents[table]["base"] = snapshot
            if spec is not None:
                # persist the clustering spec with the commit so every
                # later plain compact AND every DML rewrite re-applies it
                self._intents[table]["layout"] = spec
            if has_dropped:
                renames = (cmap or {}).get("renames", {})
                self._intents[table]["colmap"] = (
                    {"renames": renames, "dropped": []} if renames else None
                )
        return True

    def clone_to(self, dst_root: str) -> "TransactionalCatalog":
        """Zero-copy writable branch of the CURRENT snapshot (Delta
        shallow-clone analog): every referenced data dir is hardlinked
        into ``dst_root`` (copy fallback across filesystems) and a fresh
        manifest (version 1, same table map and schemas) is committed
        there. Instant even for huge tables — no data bytes move — and
        fully isolated: parquet files are immutable by construction in
        this engine (writers only ever create new dirs), so linked
        blocks are never mutated by either side; each catalog's writes
        land in its own root and its own manifest. The clone starts its
        own version history; the source's history and retention are
        untouched. Use cases: CI against a production snapshot, dev
        branches, blue/green reprocessing.

        Taken under the source's commit lock, so the cloned table map is
        one consistent committed snapshot."""
        if self._pending is not None:
            raise RuntimeError("cannot clone inside an open transaction")
        dst = TransactionalCatalog(spark=self.spark, root=dst_root)
        if os.path.exists(dst._manifest_path()):
            raise FileExistsError(
                f"{dst_root!r} already holds a transactional catalog"
            )
        os.makedirs(self.root, exist_ok=True)
        lock_path = os.path.join(self.root, "_commit.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            manifest = self._read_manifest()
            # Link WHILE holding the source's commit lock: links are cheap
            # metadata ops, and releasing first would let a concurrent
            # commit + zero-age vacuum delete snapshot dirs mid-loop,
            # leaving a partial clone. No source commit can supersede
            # these dirs until the loop finishes.
            dv_rels = [
                rel
                for e in manifest.get("dvs", {}).values()
                for rel in e.get("dirs", [])
            ]
            for rels in list(manifest["tables"].values()) + [dv_rels]:
                for rel in rels:
                    src_dir = os.path.join(self.root, rel)
                    dst_dir = os.path.join(dst_root, rel)
                    if not os.path.exists(dst_dir):
                        _link_tree(src_dir, dst_dir)
            # committed-load markers ride along (still under the lock:
            # a marker must never precede its data into the clone): a
            # streaming loop re-pointed at the clone (blue/green) must
            # skip rounds the source already committed — the clone HAS
            # their data. .pending stays behind: its version refers to
            # the SOURCE's history and would read as an orphan against
            # the clone's.
            if os.path.isdir(self._marker_dir()):
                shutil.copytree(
                    self._marker_dir(),
                    dst._marker_dir(),
                    dirs_exist_ok=True,
                    ignore=shutil.ignore_patterns(".pending*"),
                )
        # bucket metadata sidecars (plain files next to nothing in the
        # manifest) ride along so bucketed merges keep their contract
        if os.path.isdir(self.root):
            for e in os.listdir(self.root):
                if e.endswith(".buckets.json"):
                    shutil.copy2(
                        os.path.join(self.root, e), os.path.join(dst_root, e)
                    )
        dst._publish(
            manifest["tables"],
            f"clone-of-v{manifest['version']}",
            replace=True,
            schemas=manifest.get("schemas", {}),
            # a branch keeps its quality gates, clustering specs, and
            # bloom indexes: they ride the clone like schemas
            checks=manifest.get("checks", {}),
            layouts=manifest.get("layouts", {}),
            blooms_cfg=manifest.get("blooms", {}),
            views=manifest.get("views", {}),
            streams=manifest.get("streams", {}),
            # vectors ride the clone: basename identity survives both
            # the hardlink fast path and the cross-fs copy fallback
            dvs=manifest.get("dvs", {}),
            colmaps=manifest.get("colmaps", {}),
            properties=manifest.get("properties", {}),
        )
        return dst

    def vacuum(
        self,
        retain_versions: int = 1,
        min_age_seconds: float = 3600.0,
        dry_run: bool = False,
    ) -> list[str]:
        """Delete staged dirs that no RETAINED manifest references —
        leftovers of crashed (never-committed) loads and data superseded
        beyond the time-travel horizon. ``retain_versions`` keeps the N
        most recent snapshots readable via :meth:`read_at` (min 1: the
        current pointer is always live). Never runs inside an open
        transaction (pending dirs are not yet referenced).

        ``min_age_seconds`` protects OTHER writers: a concurrent process
        mid-transaction has staged dirs no manifest references yet, so
        only unreferenced dirs older than the threshold are reclaimed
        (same rationale as Delta's VACUUM retention window; pass 0.0 only
        when no other writer can be active).

        Committed-load markers (``_load_ids/``) are NEVER vacuumed:
        they are the streaming loops' replay guard, and dropping one
        inside a checkpoint-replay window would double-commit its round.
        Snapshot retention and replay idempotence are independent.

        ``dry_run=True`` (SQL: ``VACUUM DRY RUN``) reports exactly what
        a real run would reclaim — version manifests and staged dirs —
        deleting nothing (Delta's VACUUM DRY RUN; at 100 TB you audit
        the blast radius before shrinking the time-travel horizon)."""
        if self._pending is not None:
            raise RuntimeError("cannot vacuum inside an open transaction")
        retain_versions = max(1, retain_versions)
        now = time.time()
        current = self._read_manifest()
        live = {
            rel for rels in current["tables"].values() for rel in rels
        }
        live |= {
            rel
            for e in current.get("dvs", {}).values()
            for rel in e.get("dirs", [])
        }
        removed: list[str] = []
        vdir = os.path.join(self.root, _VERSIONS)
        if os.path.isdir(vdir):
            vfiles = sorted(
                os.listdir(vdir), key=lambda s: int(s.split(".", 1)[0])
            )
            keep = vfiles[-retain_versions:]
            for fname in vfiles:
                vpath = os.path.join(vdir, fname)
                if fname in keep:
                    with open(vpath) as f:
                        m = json.load(f)
                    live |= {
                        rel for rels in m["tables"].values() for rel in rels
                    }
                    live |= {
                        rel
                        for e in m.get("dvs", {}).values()
                        for rel in e.get("dirs", [])
                    }
                else:
                    if not dry_run:
                        os.remove(vpath)
                    removed.append(os.path.join(_VERSIONS, fname))
        loads_root = os.path.join(self.root, _LOADS)
        if not os.path.isdir(loads_root):
            return removed
        for load_id in os.listdir(loads_root):
            load_dir = os.path.join(loads_root, load_id)
            for d in os.listdir(load_dir):
                rel = os.path.join(_LOADS, load_id, d)
                full = os.path.join(self.root, rel)
                if rel not in live and (
                    now - os.path.getmtime(full) >= min_age_seconds
                ):
                    if not dry_run:
                        shutil.rmtree(full)
                    removed.append(rel)
            if not dry_run and not os.listdir(load_dir):
                os.rmdir(load_dir)
        return removed
