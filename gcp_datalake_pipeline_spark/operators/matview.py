"""Incrementally maintained materialized views, driven by the change
data feed.

The reference serves its reporting queries by re-reading PostgreSQL
tables on every request (``etl-gcs-cloudsql/src/db.ts``); at 100 TB a
maintained aggregate must instead cost O(changes), not O(history), per
refresh. This module closes the loop between two existing engine
pieces:

- :meth:`~gcp_datalake_pipeline_spark.transactions.TransactionalCatalog.table_changes`
  supplies the rows each commit inserted/deleted (I/O bounded to the
  changed files — updates arrive as their delete+insert pair);
- :func:`~gcp_datalake_pipeline_spark.operators.incremental.refresh_aggregate`
  merges per-group partial states without touching unaffected groups.

A view is a decomposable aggregate — group keys + SUMs + a COUNT(*)
(AVG derives) plus optional MIN/MAX columns — registered in the catalog
manifest with the SOURCE SNAPSHOT VERSION it reflects. SUM/COUNT merge
as signed partials under any DML. MIN/MAX partials are exact under
inserts (the true extreme only moves one way); a DELETE can retract
the current extreme, which no partial can recover — so the refresh
recomputes extremes ONLY for the groups the feed deleted from, reading
the source's current snapshot bounded to the ``_kb`` buckets holding
those groups when the source is bucketed on the view keys (the same
partition-pruned navigation partial OPTIMIZE uses). Every other
group keeps the O(changes) incremental contract. ``refresh`` turns the feed since that watermark
into SIGNED partials (insert rows weigh +1, delete rows -1, so an
UPDATE's pair nets the value delta and a vanished group's count
reaches zero and is dropped), merges them, and commits the new table
data AND the advanced watermark in ONE transaction — a crash can
never leave refreshed data with a stale watermark, which would
double-apply the next feed. Correctness invariant (pinned by the
``etl_matview_refresh`` gate and pytest): after any DML sequence on
the source, refresh == full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators.incremental import (
    partial_aggregate,
    refresh_aggregate,
)
from gcp_datalake_pipeline_spark.storage import kb_col as _kb_col


def _validate_spec(keys, sums, count_col, mins=None, maxs=None,
                   insert_only=False, bucketed=True):
    mins, maxs = mins or {}, maxs or {}
    if not keys:
        raise ValueError("materialized view needs at least one group key")
    if not count_col:
        raise ValueError(
            "materialized view needs a COUNT(*) column (it is the "
            "group-liveness state: a group whose count reaches zero "
            "after deletes is dropped)"
        )
    outs = [count_col, *sums, *mins, *maxs]
    clash = set(outs) & set(keys)
    if clash or len(set(outs)) != len(outs):
        raise ValueError(
            f"view column name collision: "
            f"{sorted(clash) or sorted(outs)}"
        )
    if "_kb" in outs:
        raise ValueError(
            "'_kb' is the reserved bucket-layout column; rename the "
            "view column"
        )
    if "_kb" in keys and bucketed:
        # grouping by the SOURCE's bucket id is legitimate (a per-bucket
        # dashboard) — but only when the view table opts out of its own
        # bucket layout, which would reuse the same column name
        raise ValueError(
            "a view grouped by the source's '_kb' cannot itself be "
            "bucketed (the layouts would share one column); pass "
            "num_buckets=None"
        )


def create_materialized_view(
    catalog,
    name: str,
    source: str,
    keys: list[str],
    sums: dict[str, str],
    count_col: str = "n_rows",
    num_buckets: int | None = 16,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    insert_only: bool = False,
    follow_renames: bool = False,
) -> dict:
    """Full first materialization of ``name`` over ``source``: one
    aggregate over a CONSISTENT snapshot (``read_at`` the current
    version — never a racy live read), published together with the
    spec + watermark in one commit.

    By default the view table lands under the ``_kb`` group-key-hash
    bucket layout so every later refresh REWRITES only the buckets
    holding affected groups and hardlink-carries the rest — at 100 TB
    a view over a big key space is itself big, and an O(view) rewrite
    per refresh would swamp the O(changes) compute. ``_kb`` is a
    physical column (visible like any partition column; readers that
    don't want it drop it). ``num_buckets=None`` opts out for tiny
    views.

    ``mins``/``maxs`` (output name -> source column) add MIN/MAX
    aggregates: exact from partials under inserts; a later delete
    triggers a bucket-scoped exact recompute of ONLY the retracted
    groups' extremes at refresh time (see module docstring).
    ``insert_only`` is retained for API compatibility and no longer
    gates anything — deletes are handled, not refused.

    ``follow_renames=True`` opts the view into the source's rename
    lineage: an ``ALTER TABLE ... RENAME TO`` of the source no longer
    refuses, and the next refresh re-finds it via ``resolve_renamed``,
    reads the window with ``table_changes(..., follow_renames=True)``
    (crossing the rename commit), and carries the spec onto the new
    name. Default stays the loud refusal."""
    _validate_spec(
        keys, sums, count_col, mins, maxs, insert_only,
        bucketed=bool(num_buckets),
    )
    if catalog.view_spec(name) is not None:
        raise ValueError(f"materialized view {name!r} already exists")
    if catalog.exists(name):
        raise ValueError(f"{name!r} already exists as a plain table")
    v0 = catalog._read_manifest(strict=False)["version"]
    df = partial_aggregate(
        catalog.read_at(source, v0), keys, sums, count_col,
        min_cols=mins, max_cols=maxs,
    )
    spec = {
        "source": source,
        "keys": list(keys),
        "sums": dict(sums),
        "count_col": count_col,
        "as_of": v0,
    }
    if mins or maxs:
        spec["mins"] = dict(mins or {})
        spec["maxs"] = dict(maxs or {})
    if follow_renames:
        spec["follow_renames"] = True
    with catalog.transaction(f"matview-create-{name}"):
        if num_buckets:
            catalog.overwrite(
                df.withColumn("_kb", _kb_col(keys, num_buckets)),
                name,
                partition_cols=["_kb"],
            )
            catalog._write_bucket_meta(name, num_buckets, list(keys))
        else:
            catalog.overwrite(df, name)
        catalog._intents[name]["view"] = spec
    return {"view": name, "as_of": v0, "groups": catalog.count_rows(name)}


def refresh_materialized_view(catalog, name: str) -> dict:
    """Advance ``name`` to the source's current snapshot by applying
    the change feed since the recorded watermark as signed partials.
    Cost: O(changed files + affected groups). A no-change source is a
    zero-I/O no-op (the feed prunes untouched commits from the
    manifests alone, and no new version is published)."""
    spec = catalog.view_spec(name)
    if spec is None:
        raise FileNotFoundError(f"no materialized view {name!r}")
    keys, sums = spec["keys"], spec["sums"]
    count_col, as_of = spec["count_col"], spec["as_of"]
    follow = bool(spec.get("follow_renames"))
    if follow:
        # re-find the source across ALTER TABLE ... RENAME TO; the
        # refreshed spec carries the new name forward
        cur_source = catalog.resolve_renamed(spec["source"])
        crossed = cur_source != spec["source"]
        spec = {**spec, "source": cur_source}
    else:
        crossed = False
    v1 = catalog._read_manifest(strict=False)["version"]
    if v1 <= as_of:
        return {"view": name, "as_of": as_of, "applied": 0}
    # manifest-only fast path: if no commit in the window moved the
    # source's dir list, nothing changed — no feed, no Spark job, no
    # version published (the watermark stays; re-walking these cheap
    # JSON manifests next time beats spending a commit on a no-op).
    # A window crossing a rename always reads the feed (exact lineage).
    if not crossed and not catalog.source_moved(spec["source"], as_of, v1):
        return {"view": name, "as_of": as_of, "applied": 0}
    feed = catalog.table_changes(
        spec["source"], as_of, v1, follow_renames=follow
    )
    w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    mins = spec.get("mins") or {}
    maxs = spec.get("maxs") or {}
    has_extremes = bool(mins or maxs)
    ins = F.col("_change_type") == "insert"
    aggs = [
        F.sum(F.col(src) * w).alias(out) for out, src in sums.items()
    ] + [F.sum(w).alias(count_col)]
    if has_extremes:
        # MIN/MAX partials over the feed's INSERT rows ride the same
        # pass (exact for insert-only-touched groups); a per-group
        # delete counter marks the groups whose extremes a retraction
        # may have invalidated — those get an exact bucket-scoped
        # recompute below instead of a partial merge
        aggs += [
            F.min(F.when(ins, F.col(src))).alias(out)
            for out, src in mins.items()
        ]
        aggs += [
            F.max(F.when(ins, F.col(src))).alias(out)
            for out, src in maxs.items()
        ]
        aggs.append(F.sum((~ins).cast("long")).alias("_n_deletes"))
    delta = feed.groupBy(*keys).agg(*aggs)
    # compute the feed ONCE: the count below and the overwrite are
    # separate actions, and exchange reuse does not span them — without
    # the checkpoint every refresh would read the changed files and run
    # the signed groupBy twice (delta is O(affected groups), tiny)
    delta = delta.localCheckpoint(eager=True)
    rx = None
    src_buckets_read: list | None = None
    if has_extremes:
        del_groups = delta.where(F.col("_n_deletes") > 0).select(*keys)
        delta = delta.drop("_n_deletes")
        if del_groups.count():  # bounded: delta is the checkpointed agg
            rx, src_buckets_read = _recompute_extremes(
                catalog, spec, del_groups, v1
            )
    n_applied = delta.count()
    if n_applied == 0:
        # commits moved the source's dir list without net row changes
        # (e.g. compaction): only the watermark advances — a pure
        # metadata commit, no view data moves. Expect-checked like the
        # stream-watermark fold: a racing refresh may have advanced
        # (or dropped) the view since we read the spec, and blindly
        # re-setting the watermark would re-apply an already-applied
        # change window on the next refresh.
        from gcp_datalake_pipeline_spark.transactions import (
            ConcurrentWriteError,
        )

        def mark(m):
            cur = m.get("views", {}).get(name)
            if cur is None or cur["as_of"] != as_of:
                raise ConcurrentWriteError(
                    f"materialized view {name!r} was refreshed or "
                    f"dropped by another process (expected watermark "
                    f"{as_of!r}, found "
                    f"{cur['as_of'] if cur else None!r}); retry from "
                    "a fresh read"
                )
            m["views"][name] = {**spec, "as_of": v1}

        catalog._publish_meta(mark, f"matview-mark-{name}")
        return {"view": name, "as_of": v1, "applied": 0}
    meta = catalog.bucket_meta(name)
    if meta is not None:
        # bucket-bounded refresh: only the buckets holding affected
        # groups are read (partition-pruned scan), merged, and
        # re-staged; every other bucket's files hardlink-carry into
        # the new version. A bucket whose last group vanished is
        # explicitly replaced, never hardlink-resurrected.
        nb = meta["num_buckets"]
        kb = _kb_col(keys, nb)
        # ≤ num_buckets values by construction — a bounded collect
        buckets = [
            r["_kb"]
            for r in delta.select(kb.alias("_kb")).distinct().collect()
        ]
        subset = (
            catalog.read(name)
            .where(F.col("_kb").isin(buckets))
            .drop("_kb")
        )
        merged = refresh_aggregate(
            subset, delta, keys, list(sums), count_col,
            min_cols=list(mins), max_cols=list(maxs),
        )
        if rx is not None:
            merged = _override_extremes(merged, rx, keys, mins, maxs)
        merged = merged.where(F.col(count_col) > 0).withColumn("_kb", kb)
        with catalog.transaction(f"matview-refresh-{name}"):
            catalog._write_bucketed_merge(merged, name, replaced=buckets)
            catalog._intents[name]["view"] = {**spec, "as_of": v1}
        return {
            "view": name, "as_of": v1, "applied": n_applied,
            "src_buckets_read": src_buckets_read,
        }
    merged = refresh_aggregate(
        catalog.read(name), delta, keys, list(sums), count_col,
        min_cols=list(mins), max_cols=list(maxs),
    )
    if rx is not None:
        merged = _override_extremes(merged, rx, keys, mins, maxs)
    merged = merged.where(F.col(count_col) > 0)
    with catalog.transaction(f"matview-refresh-{name}"):
        catalog.overwrite(merged, name)
        catalog._intents[name]["view"] = {**spec, "as_of": v1}
    return {
        "view": name, "as_of": v1, "applied": n_applied,
        "src_buckets_read": src_buckets_read,
    }


def _recompute_extremes(catalog, spec, del_groups, v1):
    """Exact per-group MIN/MAX for the delete-touched groups, read from
    the SOURCE's snapshot ``v1`` (the version the refreshed view will
    claim as its watermark — never a racy live read).

    100 TB shape: when the source is ``_kb``-bucketed on exactly the
    view keys, the scan is partition-pruned to the buckets holding the
    retracted groups (returned so callers/tests can pin the bound);
    otherwise ONE filtered scan of the source with the bounded group
    set broadcast into a semi-join (filter pushdown applies, documented
    honest fallback). A fully-deleted group simply yields no recompute
    row — its count reaches zero downstream and the group drops."""
    keys = spec["keys"]
    mins = spec.get("mins") or {}
    maxs = spec.get("maxs") or {}
    src = catalog.read_at(spec["source"], v1)
    smeta = catalog.bucket_meta(spec["source"])
    pruned: list | None = None
    if smeta is not None and list(smeta["key_cols"]) == list(keys):
        kb = _kb_col(keys, smeta["num_buckets"])
        # ≤ num_buckets values by construction — a bounded collect
        pruned = sorted(
            r["_kb"]
            for r in del_groups.select(kb.alias("_kb")).distinct().collect()
        )
        src = src.where(F.col("_kb").isin(pruned))
    s, dg = src.alias("s"), del_groups.alias("dg")
    cond = None
    for k in keys:
        c = F.col(f"s.{k}").eqNullSafe(F.col(f"dg.{k}"))
        cond = c if cond is None else cond & c
    rx = (
        s.join(F.broadcast(dg), cond, "left_semi")
        .groupBy(*keys)
        .agg(
            *[F.min(c).alias(out) for out, c in mins.items()],
            *[F.max(c).alias(out) for out, c in maxs.items()],
        )
    )
    return rx, pruned


def _override_extremes(merged, rx, keys, mins, maxs):
    """Replace the partial-merged MIN/MAX of every recomputed group with
    its exact value (null-safe key match; ``rx`` is bounded by the
    delete-touched group count, so the join broadcasts). A recomputed
    NULL extreme (all surviving values NULL) must still override, so
    membership rides an explicit marker, not a coalesce."""
    ext = [*mins, *maxs]
    r = F.broadcast(
        rx.select(
            *[F.col(k).alias(f"_rxk_{k}") for k in keys],
            F.lit(1).alias("_rx"),
            *[F.col(c).alias(f"_rx_{c}") for c in ext],
        ).alias("r")
    )
    m = merged.alias("m")
    cond = None
    for k in keys:
        c = F.col(f"m.{k}").eqNullSafe(F.col(f"r._rxk_{k}"))
        cond = c if cond is None else cond & c
    out = []
    for c in merged.columns:
        if c in ext:
            out.append(
                F.when(F.col("r._rx").isNotNull(), F.col(f"r._rx_{c}"))
                .otherwise(F.col(f"m.{c}"))
                .alias(c)
            )
        else:
            out.append(F.col(f"m.{c}").alias(c))
    return m.join(r, cond, "left").select(*out)


def drop_materialized_view(catalog, name: str) -> None:
    """Drop spec and table together (``drop_table`` already clears the
    manifest's view entry; retained snapshots keep both restorable)."""
    if catalog.view_spec(name) is None:
        raise FileNotFoundError(f"no materialized view {name!r}")
    catalog.drop_table(name)


def parse_matview_select(
    select: str,
) -> tuple[str, list, dict, str, dict, dict]:
    """STRICT parse of the maintainable-aggregate SELECT shape:

        SELECT k1[, k2...], SUM(col) AS out[, ...],
               [MIN(col) AS out, ...] [MAX(col) AS out, ...]
               COUNT(*) AS n
        FROM t GROUP BY k1[, k2...]

    Returns (source, keys, sums, count_col, mins, maxs); raises
    ValueError (with the shape) for anything else — an AVG or
    expression view must refuse, not silently materialize something
    unmaintainable."""
    import re

    shape = (
        "materialized views take exactly: SELECT <keys>, SUM(col) AS "
        "name [, ...], MIN(col)/MAX(col) AS name [, ...], COUNT(*) AS "
        "name FROM table GROUP BY <keys> (AVG derives from SUM/COUNT; "
        "MIN/MAX under deletes recompute only the retracted groups)"
    )
    m = re.fullmatch(
        r"SELECT\s+(.+?)\s+FROM\s+(\w+)\s+GROUP\s+BY\s+(.+)",
        select.strip(),
        re.I | re.S,
    )
    if not m:
        raise ValueError(shape)
    items, source, group_by = m.group(1), m.group(2), m.group(3)
    keys: list[str] = []
    sums: dict[str, str] = {}
    mins: dict[str, str] = {}
    maxs: dict[str, str] = {}
    count_col = None
    for item in items.split(","):
        item = item.strip()
        km = re.fullmatch(r"\w+", item)
        sm = re.fullmatch(
            r"SUM\s*\(\s*(\w+)\s*\)\s+AS\s+(\w+)", item, re.I
        )
        mm = re.fullmatch(
            r"(MIN|MAX)\s*\(\s*(\w+)\s*\)\s+AS\s+(\w+)", item, re.I
        )
        cm = re.fullmatch(r"COUNT\s*\(\s*\*\s*\)\s+AS\s+(\w+)", item, re.I)
        if km:
            keys.append(item)
        elif sm:
            sums[sm.group(2)] = sm.group(1)
        elif mm:
            target = mins if mm.group(1).upper() == "MIN" else maxs
            target[mm.group(3)] = mm.group(2)
        elif cm:
            if count_col is not None:
                raise ValueError(f"duplicate COUNT(*) column; {shape}")
            count_col = cm.group(1)
        else:
            raise ValueError(f"unsupported view item {item!r}; {shape}")
    gb = [g.strip() for g in group_by.split(",")]
    if gb != keys:
        raise ValueError(
            f"GROUP BY {gb} must list exactly the key items {keys} in "
            f"order; {shape}"
        )
    if count_col is None:
        raise ValueError(f"COUNT(*) AS <name> is required; {shape}")
    return source, keys, sums, count_col, mins, maxs
