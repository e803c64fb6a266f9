"""File-level column statistics and data-skipping scans.

Delta/Iceberg record per-file column min/max in their transaction log so a
selective query opens only the files whose value range can match — at
100 TB this is the difference between scanning thousands of footers and
touching the three files a point lookup actually needs. This module is
that layer for :class:`~.transactions.TransactionalCatalog`:

- :func:`collect_dir_stats` reads the parquet FOOTERS of a freshly staged
  data dir (metadata only — no data pages) and aggregates per-file, per-
  column ``min / max / null_count / rows``; Hive partition values in the
  path (``_kb=3/…``, ``year=1995/…``) become exact (min == max) stats so
  partition columns prune with the same machinery.
- :func:`prune_files` evaluates a conjunctive predicate list against those
  stats and returns the surviving files. The evaluation is CONSERVATIVE:
  a file is skipped only when its stats PROVE no row can match; missing
  stats, unknown types, or incomparable values keep the file. The exact
  predicate is always re-applied by Spark on the survivors, so pruning
  can never change results — only I/O.

Stats are stored as ``_file_stats.json`` INSIDE each staged data dir.
Staged dirs are immutable once committed (writers only ever create new
dirs), so the sidecar inherits the data's atomicity: it becomes visible
with the commit that publishes the dir, rides hardlink clones and
``read_at`` time travel for free, and is reclaimed with the dir by
vacuum. Only the first ``max_columns`` top-level primitive columns are
tracked (Delta's dataSkippingNumIndexedCols, default 32) so the metadata
stays O(files), not O(files × width), on wide tables.

Reference boundary: the reference has no analytical storage layer at all
(each query re-reads its PostgreSQL tables —
``etl-gcs-cloudsql/src/db.ts``); this is the Spark-native capability a
100 TB lake needs in its place.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import os
import urllib.parse

STATS_FILE = "_file_stats.json"

# predicate ops understood by prune_files / the residual Spark filter
_OPS = (
    "=", "==", "!=", "<>", "<", "<=", ">", ">=", "in", "is_null", "not_null",
)


# -- value encoding -----------------------------------------------------------


def _to_naive_utc(dt: datetime.datetime) -> datetime.datetime:
    """Timestamps normalize to NAIVE UTC at the stats boundary: Spark
    writes TIMESTAMP (with local zone) as TIMESTAMP_MICROS adjusted to
    UTC, and pyarrow surfaces those footer stats as tz-AWARE datetimes —
    while predicate values (catalog API tuples, DML ``TIMESTAMP 'iso'``
    literals) are naive in the engine's UTC session. Comparing aware vs
    naive raises TypeError (conservative keep), which would silently
    disable temporal pruning everywhere; one normalization here keeps
    every comparison well-defined."""
    if dt.tzinfo is not None:
        return dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return dt


def _encode_value(v):
    """JSON-safe tagged encoding of a parquet stat value. Unknown types
    encode as None (= no stats, conservative keep)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return {"t": "bool", "v": v}
    if isinstance(v, int):
        return {"t": "num", "v": v}
    if isinstance(v, float):
        # NaN/inf are not JSON; parquet writers omit stats for NaN-bearing
        # pages anyway, but belt and braces
        if v != v or v in (float("inf"), float("-inf")):
            return None
        return {"t": "num", "v": v}
    if isinstance(v, str):
        return {"t": "str", "v": v}
    if isinstance(v, bytes):
        return {"t": "bytes", "v": base64.b64encode(v).decode("ascii")}
    if isinstance(v, datetime.datetime):
        return {"t": "ts", "v": _to_naive_utc(v).isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "date", "v": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"t": "dec", "v": str(v)}
    return None


def _decode_value(e):
    if e is None:
        return None
    t, v = e["t"], e["v"]
    if t in ("bool", "num", "str"):
        return v
    if t == "bytes":
        return base64.b64decode(v)
    if t == "ts":
        return datetime.datetime.fromisoformat(v)
    if t == "date":
        return datetime.date.fromisoformat(v)
    if t == "dec":
        return decimal.Decimal(v)
    if t == "part":  # raw Hive path token; coerced against the predicate
        return v
    return None


def _coerce_pair(stat_e, pred_v):
    """Return (stat_value, pred_value) made comparable, or raise TypeError
    (caller keeps the file). Partition-path tokens coerce toward the
    predicate's type; date stats accept datetime predicates and vice
    versa at day granularity."""
    if stat_e["t"] == "part":
        raw = stat_e["v"]
        if isinstance(pred_v, bool):
            return raw.lower() == "true", pred_v
        if isinstance(pred_v, int):
            return int(raw), pred_v
        if isinstance(pred_v, float):
            return float(raw), pred_v
        if isinstance(pred_v, datetime.datetime):
            return (
                _to_naive_utc(datetime.datetime.fromisoformat(raw)),
                _to_naive_utc(pred_v),
            )
        if isinstance(pred_v, datetime.date):
            return datetime.date.fromisoformat(raw), pred_v
        if isinstance(pred_v, str):
            return raw, pred_v
        raise TypeError(f"cannot coerce partition token to {type(pred_v)}")
    sv = _decode_value(stat_e)
    if isinstance(sv, bool) or isinstance(pred_v, bool):
        if isinstance(sv, bool) and isinstance(pred_v, bool):
            return sv, pred_v
        raise TypeError("bool vs non-bool")
    if isinstance(sv, (int, float)) and isinstance(pred_v, (int, float)):
        return sv, pred_v
    if isinstance(sv, decimal.Decimal) and isinstance(
        pred_v, (int, float, decimal.Decimal)
    ):
        return sv, decimal.Decimal(str(pred_v))
    if isinstance(sv, datetime.datetime) and isinstance(
        pred_v, datetime.datetime
    ):
        return _to_naive_utc(sv), _to_naive_utc(pred_v)
    # date-vs-datetime: promote the DATE side to midnight, which is
    # EXACTLY Spark's comparison semantics (DATE casts to TIMESTAMP at
    # 00:00). The old day-truncation was lossy: after truncating, a
    # min==max==value test could "prove" equality/all-match for a file
    # whose rows span 08:00-17:00 — wrongly dropping files from a
    # != DELETE and wrongly metadata-counting whole files for = / IN
    # (r10 review finding; midnight promotion makes every op exact).
    if isinstance(sv, datetime.datetime) and isinstance(pred_v, datetime.date):
        return _to_naive_utc(sv), datetime.datetime.combine(
            pred_v, datetime.time()
        )
    if isinstance(sv, datetime.date) and isinstance(
        pred_v, datetime.datetime
    ):
        return (
            datetime.datetime.combine(sv, datetime.time()),
            _to_naive_utc(pred_v),
        )
    if type(sv) is type(pred_v):
        return sv, pred_v
    raise TypeError(f"incomparable {type(sv)} vs {type(pred_v)}")


# -- stats collection ---------------------------------------------------------


def _partition_values(rel_path: str) -> dict[str, dict]:
    """Hive ``col=value`` tokens in a file's relative path, as exact
    stats. ``__HIVE_DEFAULT_PARTITION__`` (null) yields no stats entry
    (conservative keep — the residual filter handles it)."""
    out = {}
    for seg in rel_path.split(os.sep)[:-1]:
        if "=" not in seg:
            continue
        col, _, raw = seg.partition("=")
        val = urllib.parse.unquote(raw)
        if val == "__HIVE_DEFAULT_PARTITION__":
            continue
        e = {"t": "part", "v": val}
        out[col] = {"min": e, "max": e, "nulls": 0}
    return out


def collect_dir_stats(
    dir_path: str,
    max_columns: int = 32,
    reuse: dict[str, dict] | None = None,
) -> dict:
    """Per-file column stats for every ``*.parquet`` under ``dir_path``.

    Footer-only reads (O(files) metadata, no data pages). ``reuse`` maps
    relative file path -> prior stats entry for files hardlinked in from
    a previous version (a bucketed MERGE carries untouched partitions),
    so re-stating a 100 TB table's unchanged files costs zero footer
    reads. Returns ``{"files": {rel_path: {"rows": n, "columns": {col:
    {"min": enc, "max": enc, "nulls": n|None}}}}}``.
    """
    import pyarrow.parquet as pq

    files: dict[str, dict] = {}
    for root, _dirs, names in os.walk(dir_path):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, dir_path)
            if reuse is not None and rel in reuse:
                files[rel] = reuse[rel]
                continue
            try:
                md = pq.ParquetFile(full).metadata
            except Exception:
                continue  # unreadable footer: no stats, file always kept
            cols: dict[str, dict] = {}
            tracked = 0
            for ci in range(md.num_columns):
                rg0 = md.row_group(0) if md.num_row_groups else None
                if rg0 is None:
                    break
                path = rg0.column(ci).path_in_schema
                if "." in path:  # nested leaf: not a top-level column
                    continue
                if tracked >= max_columns:
                    break
                tracked += 1
                mn = mx = None
                nulls: int | None = 0
                known = True
                for ri in range(md.num_row_groups):
                    st = md.row_group(ri).column(ci).statistics
                    if st is None:
                        known = False
                        nulls = None
                        break
                    if st.has_null_count:
                        if nulls is not None:
                            nulls += st.null_count
                    else:
                        nulls = None
                    if not st.has_min_max:
                        # all-null row group has no min/max but is still
                        # perfectly known; anything else is unknown
                        if not (
                            st.has_null_count
                            and st.null_count
                            == md.row_group(ri).column(ci).num_values
                            + st.null_count
                        ):
                            known = known and (
                                st.has_null_count
                                and st.null_count > 0
                                and md.row_group(ri).num_rows
                                == st.null_count
                            )
                        continue
                    try:
                        smin, smax = st.min, st.max
                    except Exception:
                        known = False
                        break
                    if mn is None or _lt(smin, mn):
                        mn = smin
                    if mx is None or _lt(mx, smax):
                        mx = smax
                emin = _encode_value(mn) if known else None
                emax = _encode_value(mx) if known else None
                cols[path] = {"min": emin, "max": emax, "nulls": nulls}
            entry = {"rows": md.num_rows, "columns": cols}
            entry["columns"] = {**cols, **_partition_values(rel)}
            files[rel] = entry
    return {"version": 1, "files": files}


def _lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return False


def write_dir_stats(
    dir_path: str, max_columns: int = 32, reuse: dict[str, dict] | None = None
) -> None:
    stats = collect_dir_stats(dir_path, max_columns=max_columns, reuse=reuse)
    tmp = os.path.join(dir_path, STATS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(dir_path, STATS_FILE))


def read_dir_stats(dir_path: str) -> dict | None:
    try:
        with open(os.path.join(dir_path, STATS_FILE)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


# -- pruning ------------------------------------------------------------------


def _bloom_may_contain(entry: dict, col: str, value) -> bool:
    """Bloom-index refinement of an equality survival test: once the
    [min, max] range admits the literal, a per-file Bloom bitmap
    (attached by :func:`~.blooms.attach_blooms` when the table carries
    a bloom index) can still PROVE the value absent. Missing bloom,
    unsupported type, or any doubt keeps the file — same conservative
    contract as every other stat."""
    bloom = entry.get("bloom")
    if not isinstance(bloom, dict):
        return True
    be = bloom.get(col)
    if not isinstance(be, dict):
        return True
    from gcp_datalake_pipeline_spark import blooms

    try:
        return blooms.might_contain(be, value, be.get("t"))
    except Exception:
        return True  # corrupt sidecar entry: keep


def _file_survives(entry: dict, col: str, op: str, value) -> bool:
    """True unless this file's stats PROVE no row can satisfy
    ``col op value``."""
    if entry.get("rows") == 0:
        return False  # a zero-row file can satisfy no predicate
    cs = entry.get("columns", {}).get(col)
    if cs is None:
        return True  # column untracked in this file
    rows = entry.get("rows")
    nulls = cs.get("nulls")
    if op == "is_null":
        return nulls is None or nulls > 0
    if op == "not_null":
        return not (rows is not None and nulls == rows)
    emin, emax = cs.get("min"), cs.get("max")
    if emin is None or emax is None:
        # no min/max: either unknown (keep) or all-null (comparisons
        # against NULL can't match — droppable when provably all-null)
        return not (rows is not None and nulls == rows and rows > 0)
    try:
        if op == "in":
            vals = list(value)
            for v in vals:
                mn, pv = _coerce_pair(emin, v)
                mx, _ = _coerce_pair(emax, v)
                if (
                    not _lt(pv, mn)
                    and not _lt(mx, pv)  # mn <= v <= mx
                    and _bloom_may_contain(entry, col, v)
                ):
                    return True
            return False
        mn, pv = _coerce_pair(emin, value)
        mx, _ = _coerce_pair(emax, value)
    except (TypeError, ValueError, decimal.InvalidOperation):
        return True  # incomparable: keep
    if op in ("=", "=="):
        if _lt(pv, mn) or _lt(mx, pv):
            return False
        return _bloom_may_contain(entry, col, value)
    if op in ("!=", "<>"):
        # droppable only when EVERY row provably equals the value
        # (min == max == v; NULL rows fail != too, so they don't matter)
        return not (mn == mx == pv)
    if op == "<":
        return _lt(mn, pv)
    if op == "<=":
        return not _lt(pv, mn)
    if op == ">":
        return _lt(pv, mx)
    if op == ">=":
        return not _lt(mx, pv)
    return True  # unknown op: keep (residual filter enforces it anyway)


def _file_all_match(entry: dict, col: str, op: str, value) -> bool:
    """True only when this file's stats PROVE every row satisfies
    ``col op value`` (the dual of :func:`_file_survives`). Conservative:
    False whenever unsure."""
    rows = entry.get("rows")
    if not rows:
        return False  # empty/unknown: nothing to prove "all" over
    cs = entry.get("columns", {}).get(col)
    if cs is None:
        return False
    nulls = cs.get("nulls")
    if op == "is_null":
        return nulls is not None and nulls == rows
    if nulls is None or nulls > 0:
        return False  # a NULL row satisfies no other predicate
    if op == "not_null":
        return True  # nulls == 0 proven above
    emin, emax = cs.get("min"), cs.get("max")
    if emin is None or emax is None:
        return False
    try:
        mn, pv = _coerce_pair(emin, value if op != "in" else next(iter(value)))
        mx, _ = _coerce_pair(emax, value if op != "in" else next(iter(value)))
        if op == "in":
            if mn != mx:
                return False
            return any(
                _coerce_pair(emin, v)[0] == _coerce_pair(emin, v)[1]
                for v in value
            )
    except (TypeError, ValueError, decimal.InvalidOperation, StopIteration):
        return False
    if op in ("=", "=="):
        return mn == mx == pv
    if op in ("!=", "<>"):
        # all-match when the value lies wholly outside the file's range
        return _lt(mx, pv) or _lt(pv, mn)
    if op == "<":
        return _lt(mx, pv)
    if op == "<=":
        return not _lt(pv, mx)
    if op == ">":
        return _lt(pv, mn)
    if op == ">=":
        return not _lt(mn, pv)
    return False


def classify_files(
    stats: dict | None, all_files: list[str], predicates: list[tuple]
) -> tuple[int, list[str]]:
    """Metadata-only COUNT support: split a dir's files into rows that
    PROVABLY all match (returned as a row count), files that provably
    can't match (dropped), and files the stats can't decide (returned
    for scanning). Returns ``(counted_rows, unknown_files)``. The
    single-conjunction view of :func:`classify_files_dnf` — one body,
    no drift."""
    return classify_files_dnf(stats, all_files, [list(predicates)])


def validate_predicates(predicates) -> list[tuple]:
    """Normalize/validate ``[(col, op, value), ...]`` (value omitted or
    None for is_null/not_null). Raises ValueError on malformed input so
    a typo'd op can never silently disable pruning AND the residual
    filter."""
    out = []
    for p in predicates:
        if len(p) == 2:
            col, op = p
            value = None
        elif len(p) == 3:
            col, op, value = p
        else:
            raise ValueError(f"predicate must be (col, op[, value]): {p!r}")
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op {op!r} (use {_OPS})")
        if op in ("is_null", "not_null") and value is not None:
            raise ValueError(f"{op} takes no value: {p!r}")
        if op == "in" and not isinstance(value, (list, tuple, set)):
            raise ValueError(f"'in' needs a list/tuple/set of values: {p!r}")
        out.append((col, op, value))
    return out


def prune_files(
    stats: dict | None, all_files: list[str], predicates: list[tuple]
) -> list[str]:
    """Files (relative paths) that may contain matching rows. Files
    absent from ``stats`` (written before stats collection, or by an
    external writer) are always kept."""
    if stats is None:
        return list(all_files)
    entries = stats.get("files", {})
    kept = []
    for rel in all_files:
        entry = entries.get(rel)
        if entry is None or all(
            _file_survives(entry, c, o, v) for c, o, v in predicates
        ):
            kept.append(rel)
    return kept


def conj_condition(predicates: list[tuple]):
    """One conjunction as a Spark Column (TRUE/FALSE/NULL three-valued
    — callers that need NULL-never-matches wrap in coalesce)."""
    from pyspark.sql import functions as F

    out = F.lit(True)
    for col, op, value in predicates:
        c = F.col(col)
        if op in ("=", "=="):
            cond = c == F.lit(value)
        elif op in ("!=", "<>"):
            cond = c != F.lit(value)
        elif op == "<":
            cond = c < F.lit(value)
        elif op == "<=":
            cond = c <= F.lit(value)
        elif op == ">":
            cond = c > F.lit(value)
        elif op == ">=":
            cond = c >= F.lit(value)
        elif op == "in":
            cond = c.isin(*list(value))
        elif op == "is_null":
            cond = c.isNull()
        elif op == "not_null":
            cond = c.isNotNull()
        else:  # pragma: no cover - validate_predicates rejects these
            raise ValueError(op)
        out = out & cond
    return out


def dnf_condition(dnf: list[list[tuple]]):
    """An OR of conjunctions as one Spark Column."""
    from pyspark.sql import functions as F

    out = F.lit(False)
    for conj in dnf:
        out = out | conj_condition(conj)
    return out


def residual_filter(df, predicates: list[tuple]):
    """The EXACT predicate as a Spark filter over the pruned scan —
    pruning is a superset guarantee, never the answer."""
    return df.filter(conj_condition(predicates))


def prune_files_dnf(
    stats: dict | None, all_files: list[str], dnf: list[list[tuple]]
) -> list[str]:
    """Files that may match ANY disjunct (the OR's candidate union), in
    stable input order — an OR is exactly as prunable as its widest
    branch."""
    kept: set[str] = set()
    for conj in dnf:
        kept.update(prune_files(stats, all_files, conj))
    return [f for f in all_files if f in kept]


def classify_files_dnf(
    stats: dict | None, all_files: list[str], dnf: list[list[tuple]]
) -> tuple[int, list[str]]:
    """:func:`classify_files` for an OR of conjunctions: a file counts
    without I/O when ONE disjunct provably matches every row (the
    disjunction is then TRUE row-wise regardless of the other
    branches), drops when EVERY disjunct provably matches no row, and
    scans otherwise."""
    counted = 0
    unknown: list[str] = []
    entries = (stats or {}).get("files", {})
    for rel in all_files:
        entry = entries.get(rel)
        if entry is None or entry.get("rows") is None:
            unknown.append(rel)
            continue
        survives = [
            all(_file_survives(entry, c, o, v) for c, o, v in conj)
            for conj in dnf
        ]
        if not any(survives):
            continue  # provably zero matching rows in every branch
        if any(
            s and all(_file_all_match(entry, c, o, v) for c, o, v in conj)
            for s, conj in zip(survives, dnf)
        ):
            counted += entry["rows"]
        else:
            unknown.append(rel)
    return counted, unknown
