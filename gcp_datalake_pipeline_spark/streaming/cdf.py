"""Exactly-once incremental consumption of a table's change feed.

:meth:`~gcp_datalake_pipeline_spark.transactions.TransactionalCatalog.table_changes`
answers "what changed between two snapshots"; this module turns that
into a PIPELINE: a named consumer with a durable watermark that
advances atomically with whatever the consumer wrote. Each
:func:`pump_table_changes` call is one micro-batch round — the
version-window analog of the file-landing loops in
:mod:`~gcp_datalake_pipeline_spark.streaming.ingest` /
:mod:`~gcp_datalake_pipeline_spark.streaming.corpus` (SURVEY.md §2.9:
trigger -> transform -> commit, replay-safe), and the Spark-native
counterpart of Delta's ``readChangeFeed`` streaming source feeding an
``APPLY CHANGES INTO`` target.

Exactly-once, concretely:

- The watermark (``manifest["streams"][consumer] = {"source", "as_of"}``)
  commits in the SAME manifest swap as the round's data writes — a
  crash can never leave applied data with a stale watermark (which
  would re-apply the window) or an advanced watermark with no data
  (which would drop it).
- Every advance is CONFLICT-CHECKED against the watermark the pump
  read (``expect_as_of``): two racing pumps of one consumer would both
  stage appends that a dir-list check alone cannot catch — the second
  committer raises
  :class:`~gcp_datalake_pipeline_spark.transactions.ConcurrentWriteError`
  and retries from a fresh read, like every other optimistic write.
- A round whose apply wrote nothing still advances the watermark via a
  metadata-only commit under the same flock + expect-check.

Scale stance: a pump's cost is O(changed files + consumer work) — the
feed reads ONLY the files that entered/left the source's manifests in
the window (``table_changes``' bounded-I/O pin), never the table. The
watermark is one manifest key; a thousand consumers are a thousand
JSON entries, the same metadata class as a Delta log.

:func:`apply_changes_into` is the common consumer: keyed CDC apply
(Delta Live Tables' ``APPLY CHANGES INTO`` shape) that upserts the
latest insert per key and drops keys whose latest change is a delete —
the downstream replica / projection maintainer.

Reference boundary: the reference re-reads PostgreSQL whole on every
query (``etl-gcs-cloudsql/src/db.ts``); incremental downstream
maintenance is the capability a 100 TB lake substitutes for that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pump_table_changes",
    "apply_changes_into",
    "bootstrap_changes_target",
    "apply_changes_scd2",
    "bootstrap_scd2_target",
]

_FEED_COLS = ("_change_type", "_commit_version")

def _is_image():
    """A key's NEW image rows: plain feeds label them 'insert'; a feed
    built with table_changes(key_cols=...) relabels an update's pair to
    update_preimage/update_postimage — consumers must accept BOTH or a
    keyed feed's updates would silently fold as deletions."""
    return F.col("_change_type").isin("insert", "update_postimage")




def pump_table_changes(
    catalog,
    source: str,
    consumer: str,
    apply_fn=None,
    start_version: int | None = None,
    follow_renames: bool = False,
) -> dict:
    """Run one exactly-once round of change-feed consumption.

    First call registers the consumer: the watermark is set to
    ``start_version`` (default: the CURRENT version — consume only
    future changes; pass an older retained version to start deeper in
    history) and nothing is applied. Every later call reads
    ``table_changes(source, as_of, current)``, hands the feed to
    ``apply_fn(feed)`` inside a transaction, and commits the advanced
    watermark atomically with whatever ``apply_fn`` wrote through the
    catalog. Returns ``{"consumer", "source", "from", "to",
    "applied"}`` — ``applied`` is ``apply_fn``'s return value (0 on
    register/no-op rounds; None if ``apply_fn`` returns None).

    ``apply_fn`` must write ONLY through ``catalog`` (so its writes and
    the watermark share the commit) and must not itself open or close a
    transaction. A consumer whose target is its own source would feed
    back into the next window — don't.

    Bootstrap contract (Delta's readChangeFeed shape): the feed carries
    changes AFTER the watermark version, so a replica consumer seeds
    itself by copying the source's current snapshot right after
    registering, then pumps — or registers with ``start_version`` at a
    retained version it already reflects.

    ``follow_renames=True`` (recorded in the watermark at registration,
    or passed on any later pump) opts the consumer into the rename
    lineage: a pump after ``ALTER TABLE ... RENAME TO`` re-finds the
    source via :meth:`resolve_renamed`, reads the window with
    ``table_changes(..., follow_renames=True)`` so it may CROSS the
    rename commit, and carries the watermark onto the new name — the
    consumer survives instead of stranding. The default remains the
    loud refusal (a name-keyed consumer must opt into treating the
    renamed table as the same identity), and ``rename_table`` keeps
    refusing while any NON-opted-in consumer follows the table.
    """
    from gcp_datalake_pipeline_spark.transactions import (
        ConcurrentWriteError,
    )

    if getattr(catalog, "_pending", None) is not None:
        raise RuntimeError(
            "pump_table_changes inside an open transaction"
        )
    wm = catalog.stream_watermark(consumer)
    current = catalog._read_manifest(strict=False)["version"]
    if wm is None:
        # a typoed source would otherwise register fine and every later
        # pump would report "caught up" forever — no error, no data
        if not catalog.exists(source):
            raise FileNotFoundError(f"no table {source!r}")
        as_of = current if start_version is None else int(start_version)
        if as_of > current:
            raise ValueError(
                f"start_version {as_of} is ahead of the catalog "
                f"(version {current})"
            )

        def register(m):
            ms = m.setdefault("streams", {})
            if consumer in ms:
                raise ConcurrentWriteError(
                    f"change-feed consumer {consumer!r} was registered "
                    "by another pump; retry from a fresh read"
                )
            rec = {"source": source, "as_of": as_of}
            if follow_renames:
                rec["follow_renames"] = True
            ms[consumer] = rec

        catalog._publish_meta(register, f"cdf-register-{consumer}")
        return {
            "consumer": consumer,
            "source": source,
            "from": None,
            "to": as_of,
            "applied": 0,
        }
    follow = bool(follow_renames or wm.get("follow_renames"))
    cur_source = wm["source"]
    if follow:
        # re-find the source across ALTER TABLE ... RENAME TO: both
        # the caller's name and the recorded name may be stale
        cur_source = catalog.resolve_renamed(wm["source"])
        if source not in (wm["source"], cur_source):
            if catalog.resolve_renamed(source) != cur_source:
                raise ValueError(
                    f"consumer {consumer!r} is registered on source "
                    f"{wm['source']!r} (now {cur_source!r}), not "
                    f"{source!r}"
                )
    elif wm["source"] != source:
        raise ValueError(
            f"consumer {consumer!r} is registered on source "
            f"{wm['source']!r}, not {source!r}"
        )
    prev = wm["as_of"]
    crossed = cur_source != wm["source"]
    if prev >= current or (
        # the idle shortcut probes by CURRENT name; a window crossing
        # a rename always reads the feed (the lineage walk is exact)
        not crossed
        and not catalog.source_moved(cur_source, prev, current)
    ):
        return {
            "consumer": consumer,
            "source": cur_source,
            "from": prev,
            "to": prev,
            "applied": 0,
        }
    feed = catalog.table_changes(
        cur_source, prev, current, follow_renames=follow
    )
    new_wm = {"source": cur_source, "as_of": current}
    if follow:
        new_wm["follow_renames"] = True
    applied = None
    lid = f"cdf-pump-{consumer}-{prev}-{current}"
    if apply_fn is None:
        applied = 0
    else:
        catalog.begin(lid)
        try:
            applied = apply_fn(feed)
        except BaseException:
            catalog.rollback()
            raise
        if catalog._intents:
            # piggyback on any one intent: folding is per-intent but
            # writes the consumer's manifest entry either way, and the
            # whole txn is one atomic swap
            intent = next(iter(catalog._intents.values()))
            intent.setdefault("stream", {})[consumer] = {
                "expect_as_of": prev,
                "set": new_wm,
            }
            try:
                catalog.commit()
            except BaseException:
                catalog.rollback()
                raise
            return {
                "consumer": consumer,
                "source": cur_source,
                "from": prev,
                "to": current,
                "applied": applied,
            }
        # apply_fn wrote nothing: don't burn a version on an empty
        # data commit — fall through to the watermark-only advance
        catalog.rollback()
    # advance the watermark alone, still expect-checked under the flock

    def advance(m):
        cur = m.get("streams", {}).get(consumer)
        if cur is None or cur["as_of"] != prev:
            raise ConcurrentWriteError(
                f"change-feed consumer {consumer!r} was advanced by "
                f"another pump (expected watermark {prev!r}, found "
                f"{cur!r}); retry from a fresh read"
            )
        m["streams"][consumer] = new_wm

    catalog._publish_meta(advance, lid)
    return {
        "consumer": consumer,
        "source": cur_source,
        "from": prev,
        "to": current,
        "applied": applied,
    }


from gcp_datalake_pipeline_spark.storage import kb_col as _kb_col

def bootstrap_changes_target(
    catalog,
    source: str,
    target: str,
    key_cols: list[str],
    num_buckets: int = 64,
) -> int:
    """Seed a CDC replica from the source's current snapshot, stored
    under the ``_kb`` key-hash bucket layout so every later
    :func:`apply_changes_into` pump rewrites ONLY the buckets the
    window touched (untouched buckets' files are hardlink-carried —
    the bounded-write form of Delta's MERGE partition pruning). Call
    right after registering the consumer: the feed starts AFTER the
    watermark, so the replica must reflect the registered snapshot.
    Returns the number of rows seeded."""
    # a bucketed SOURCE's own _kb is physical placement, not data —
    # the replica computes its own; data + bucket meta commit as one
    snap = catalog.read(source).drop("_kb")
    catalog.overwrite_bucketed(snap, target, num_buckets, list(key_cols))
    return catalog.count_rows(target)


def apply_changes_into(
    catalog, feed: DataFrame, target: str, key_cols: list[str]
) -> int:
    """Keyed CDC apply (``APPLY CHANGES INTO``): fold a change-feed
    window into ``target`` so it tracks the source's latest state per
    key. Per key, the changes at the key's HIGHEST ``_commit_version``
    in the window win: its inserts become the key's new rows (an
    in-place UPDATE is a delete+insert at one version, so the insert
    wins); no inserts there means the key was deleted and it leaves the
    target. Keys the window never touched pass through untouched.

    Write cost is bounded by the CHANGES, not the target, when the
    target carries the ``_kb`` bucket layout (seed it with
    :func:`bootstrap_changes_target`): the fold reads only the buckets
    holding the window's keys (partition-pruned scan), rewrites only
    those, and hardlink-carries every untouched bucket's files into
    the new version — a one-key pump on an 8-bucket replica re-stages
    1/8 of the table and links the rest, instead of rewriting a
    replica that is itself source-sized. A bucket whose every key was
    deleted is explicitly replaced (never hardlink-resurrected).
    Unbucketed targets keep the simple whole-overwrite fold (fine for
    small projections; not the 100 TB path).

    One shuffle on the keys (max-version self-join, AQE-sized), one
    left-anti against the touched keys. Call inside
    :func:`pump_table_changes`'s ``apply_fn`` so the rewrite and the
    watermark commit together. Returns the number of change rows
    folded. Assumes keys are unique and NON-NULL in the source (the
    standard CDC contract — SQL equality can neither match nor anti-
    match a NULL key); duplicate-key inserts at one version all land.
    """
    # compute the window's feed ONCE: the fold count and the rewrite
    # are separate actions and exchange reuse does not span them (the
    # same convention as matview refresh); the feed is bounded by the
    # window's changed files, never the table
    feed = feed.localCheckpoint(eager=True)
    n = feed.count()
    if n == 0:
        # row-less window (e.g. a compaction moved files without
        # changing rows): nothing to fold, stage nothing — the pump
        # advances the watermark with a metadata-only commit
        return 0
    mx = feed.groupBy(*key_cols).agg(
        F.max("_commit_version").alias("_mv")
    )
    last = feed.join(mx, on=list(key_cols), how="inner").where(
        F.col("_commit_version") == F.col("_mv")
    )
    # a bucketed SOURCE's feed carries its own _kb placement column:
    # physical, not data — the target computes its own placement
    upserts = last.where(_is_image()).drop("_mv", "_kb", *_FEED_COLS)
    touched = mx.select(*key_cols)
    meta = (
        catalog.bucket_meta(target) if catalog.exists(target) else None
    )
    if meta is not None:
        if meta.get("key_cols") not in (None, list(key_cols)):
            raise ValueError(
                f"target {target!r} is bucketed on keys "
                f"{meta['key_cols']} but this apply passed "
                f"{list(key_cols)}; mismatched keys would fold changes "
                "into the wrong buckets"
            )
        nb = meta["num_buckets"]
        kb = _kb_col(key_cols, nb)
        full = catalog.read(target)
        upserts_kb = upserts.withColumn("_kb", kb)
        if any(c not in full.columns for c in upserts.columns):
            # additive source schema evolution: hardlinked untouched
            # buckets would keep the narrow schema and the new column
            # would not survive later reads — one-off full rewrite,
            # same stance as merge_upsert_bucketed's evolve path
            base = full.join(touched, on=list(key_cols), how="left_anti")
            new = base.unionByName(upserts_kb, allowMissingColumns=True)
            catalog.overwrite(new, target, partition_cols=["_kb"])
            return n
        # ≤ num_buckets values by construction — a bounded collect
        buckets = [
            r["_kb"]
            for r in touched.select(kb.alias("_kb")).distinct().collect()
        ]
        subset = full.where(F.col("_kb").isin(buckets))
        base = subset.join(touched, on=list(key_cols), how="left_anti")
        new = base.unionByName(upserts_kb, allowMissingColumns=True)
        catalog._write_bucketed_merge(new, target, replaced=buckets)
        return n
    if catalog.exists(target):
        base = catalog.read(target).join(
            touched, on=list(key_cols), how="left_anti"
        )
        # allowMissingColumns: additive source schema evolution makes
        # the feed wider than a replica bootstrapped earlier — the
        # replica's pre-evolution rows null-fill, exactly matching the
        # source's unrewritten rows (without it the union raises and
        # the consumer wedges forever)
        new = base.unionByName(upserts, allowMissingColumns=True)
    else:
        new = upserts
    catalog.overwrite(new, target)
    return n


def bootstrap_scd2_target(
    catalog,
    source: str,
    target: str,
    key_cols: list[str],
    tracked_cols: list[str] | None = None,
    effective_ts=None,
    num_buckets: int = 64,
) -> int:
    """Seed an SCD Type-2 history replica (Delta Live Tables'
    ``APPLY CHANGES ... STORED AS SCD TYPE 2`` shape) from the source's
    current snapshot: every row opens at ``effective_ts``
    (``valid_from``/``valid_to``/``is_current``), stored under the
    ``_kb`` KEY-hash bucket layout — a key's whole history lives in its
    key's bucket, so every later :func:`apply_changes_scd2` pump
    rewrites only the buckets the window touched. Returns rows seeded."""
    from gcp_datalake_pipeline_spark.operators.scd import scd2_apply

    snap = catalog.read(source).drop("_kb")  # placement, not data
    tracked = tracked_cols or [
        c for c in snap.columns if c not in key_cols
    ]
    eff = (
        effective_ts
        if effective_ts is not None
        else F.current_timestamp()
    )
    hist = scd2_apply(
        None, snap.select(*key_cols, *tracked), list(key_cols), tracked, eff
    )
    # data + bucket meta commit as one (overwrite_bucketed)
    catalog.overwrite_bucketed(hist, target, num_buckets, list(key_cols))
    return catalog.count_rows(target)


def apply_changes_scd2(
    catalog,
    feed: DataFrame,
    target: str,
    key_cols: list[str],
    effective_ts=None,
) -> int:
    """Fold a change-feed window into an SCD Type-2 HISTORY of the
    source (the ``APPLY CHANGES ... STORED AS SCD TYPE 2`` consumer):
    instead of replacing a key's row, a change CLOSES the key's open
    row at ``effective_ts`` and opens the new image; a key whose
    latest change in the window is a delete closes its open row with
    no successor. Keys the window never touched pass through.

    Window semantics match :func:`apply_changes_into`: the key's
    HIGHEST ``_commit_version`` in the window wins, so history
    granularity equals pump granularity (pump per commit for
    per-commit fidelity; a coarse window records one transition).
    Keys must be unique per source snapshot (the SCD contract —
    ambiguous duplicate images have no single history row to open).

    Bucket-bounded writes, same as the type-1 apply: on a
    :func:`bootstrap_scd2_target`-seeded target only the buckets
    holding the window's keys are read and re-staged; a key's closed
    and open rows share its hash, so history never straddles buckets.
    Returns the number of change rows folded."""
    from gcp_datalake_pipeline_spark.operators.scd import (
        META_COLS,
        scd2_apply,
    )

    feed = feed.localCheckpoint(eager=True)
    n = feed.count()
    if n == 0:
        # row-less window (e.g. compaction): no history transition,
        # stage nothing — the pump advances the watermark metadata-only
        return 0
    eff = (
        effective_ts
        if effective_ts is not None
        else F.current_timestamp()
    )
    eff_col = (
        eff if isinstance(eff, F.Column) else F.lit(eff)
    ).cast("timestamp")
    mx = feed.groupBy(*key_cols).agg(
        F.max("_commit_version").alias("_mv")
    )
    last = feed.join(mx, on=list(key_cols), how="inner").where(
        F.col("_commit_version") == F.col("_mv")
    )
    # the source's own _kb placement column is physical, not data
    upserts = (
        last.where(_is_image())
        .drop("_mv", "_kb", *_FEED_COLS)
        .dropDuplicates(list(key_cols))
    )
    # deleted = latest version had a delete and no new image (an
    # in-place UPDATE is delete+insert at one version — the image wins)
    del_keys = (
        last.where(~_is_image())
        .select(*key_cols)
        .join(upserts.select(*key_cols), on=list(key_cols), how="left_anti")
        .dropDuplicates(list(key_cols))
    )
    touched = mx.select(*key_cols)

    def fold(current, tracked):
        hist = scd2_apply(
            current, upserts.select(*key_cols, *tracked),
            list(key_cols), tracked, eff,
        )
        # deletes: close the key's open row, no successor
        d = del_keys.withColumn("_del", F.lit(True))
        closing = F.col("_del").isNotNull() & F.col("is_current")
        return (
            hist.join(F.broadcast(d), on=list(key_cols), how="left")
            .withColumn(
                "valid_to",
                F.when(closing, eff_col).otherwise(F.col("valid_to")),
            )
            .withColumn(
                "is_current",
                F.when(closing, F.lit(False)).otherwise(
                    F.col("is_current")
                ),
            )
            .drop("_del")
        )

    if not catalog.exists(target):
        tracked = [c for c in upserts.columns if c not in key_cols]
        catalog.overwrite(fold(None, tracked), target)
        return n
    full = catalog.read(target)
    tracked = [
        c
        for c in full.columns
        if c not in key_cols and c not in META_COLS and c != "_kb"
    ]
    new_cols = [
        c
        for c in upserts.columns
        if c not in key_cols and c not in tracked
    ]
    if new_cols:
        raise ValueError(
            f"SCD2 target {target!r} tracks {tracked} but the feed "
            f"carries new column(s) {new_cols}; evolve the history "
            "schema first (add_column) so old rows null-fill explicitly"
        )
    meta = catalog.bucket_meta(target)
    if meta is None:
        catalog.overwrite(
            fold(full.select(*key_cols, *tracked, *META_COLS), tracked),
            target,
        )
        return n
    if meta.get("key_cols") not in (None, list(key_cols)):
        raise ValueError(
            f"target {target!r} is bucketed on keys {meta['key_cols']} "
            f"but this apply passed {list(key_cols)}"
        )
    nb = meta["num_buckets"]
    kb = _kb_col(key_cols, nb)
    # ≤ num_buckets values by construction — a bounded collect
    buckets = [
        r["_kb"]
        for r in touched.select(kb.alias("_kb")).distinct().collect()
    ]
    subset = full.where(F.col("_kb").isin(buckets)).drop("_kb")
    merged = fold(
        subset.select(*key_cols, *tracked, *META_COLS), tracked
    ).withColumn("_kb", kb)
    catalog._write_bucketed_merge(merged, target, replaced=buckets)
    return n
