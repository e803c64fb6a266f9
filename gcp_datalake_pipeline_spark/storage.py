"""Parquet-backed table storage with MERGE semantics.

The reference's canonical store is PostgreSQL with per-row upserts
(`model.sql`, `services/*.ts`). This engine's canonical store is a lakehouse
directory of Parquet tables. Delta Lake is not available in this
environment, so MERGE is implemented as a set-based
read -> combine -> overwrite; the write path is factored behind
:class:`Catalog` so a Delta/Iceberg backend can slot in (it would use a real
``MERGE INTO`` and keep everything else unchanged).

Scale note: overwrite-merge rewrites the whole table, which is fine for
dimension/entity tables (small relative to fact history) but would not be the
100 TB-scale choice for large tables — there you'd use Delta MERGE with
partition pruning on the natural-key hash, which this API is shaped for.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kb_col(key_cols: list[str], num_buckets: int):
    """THE engine's bucket-placement hash: ``pmod(xxhash64(*keys), n)``
    — order-sensitive over ``key_cols``. Every writer of a ``_kb``
    layout (bucketed merge, CDC replicas, SCD2 histories, matviews, the
    SQL INSERT/CLUSTERED BY paths) MUST place rows through this one
    function; a byte-different copy would silently hash keys into the
    wrong buckets and partition-pruned reads would miss rows."""
    return F.pmod(F.xxhash64(*key_cols), F.lit(num_buckets)).cast("int")


@dataclass
class Catalog:
    """A directory of named Parquet tables."""

    spark: SparkSession
    root: str

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _data_dirs(self, table: str) -> list[str]:
        """Directories holding the table's current data files. The plain
        catalog stores one dir per table; the transactional subclass
        resolves this through the manifest pointer instead."""
        return [self.path(table)]

    def _bucket_meta_path(self, table: str) -> str:
        # Sibling of the table dir (NOT inside it): the overwrite rename
        # dance and dynamic partition overwrite never touch it.
        return self.path(table) + ".buckets.json"

    def _write_bucket_meta(
        self, table: str, num_buckets: int, key_cols: list[str]
    ) -> None:
        import json

        # May run before the table's first write lands (the ingest loop
        # records the modulus ahead of its transaction), so the root may
        # not exist yet.
        os.makedirs(self.root, exist_ok=True)
        with open(self._bucket_meta_path(table), "w") as f:
            json.dump({"num_buckets": num_buckets, "key_cols": key_cols}, f)

    def bucket_meta(self, table: str) -> dict | None:
        """The persisted ``_kb`` key-hash layout of ``table``
        (``{"num_buckets", "key_cols"}``), recorded when a bucketed
        merge created it — or None for unbucketed tables. The façade
        and the CDC consumers use this to route writes through the
        partition-pruned bucketed paths automatically."""
        import json

        p = self._bucket_meta_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _check_bucket_meta(
        self, table: str, num_buckets: int, key_cols: list[str]
    ) -> None:
        """A merge with a different bucket count than the table was created
        with hashes keys to different _kb partitions — existing rows are
        never matched and every update silently becomes a duplicate-key
        insert. Persisted metadata makes that a hard error instead."""
        import json

        meta_path = self._bucket_meta_path(table)
        if not os.path.exists(meta_path):
            # Legacy table without metadata: the listed _kb partitions are
            # the only evidence; any value >= num_buckets proves a mismatch.
            kbs = [
                int(d.split("=", 1)[1])
                for data_dir in self._data_dirs(table)
                for d in os.listdir(data_dir)
                if d.startswith("_kb=")
            ]
            if kbs and max(kbs) >= num_buckets:
                raise ValueError(
                    f"table {table!r} has partition _kb={max(kbs)} but this "
                    f"merge was called with num_buckets={num_buckets}; "
                    "re-merge with the bucket count the table was created with"
                )
            self._write_bucket_meta(table, num_buckets, key_cols)
            return
        with open(meta_path) as f:
            meta = json.load(f)
        if meta["num_buckets"] != num_buckets:
            raise ValueError(
                f"table {table!r} was bucketed with num_buckets="
                f"{meta['num_buckets']} but this merge passed "
                f"{num_buckets}; mismatched bucketing would turn updates "
                "into silent duplicate inserts"
            )
        if meta.get("key_cols") not in (None, key_cols):
            raise ValueError(
                f"table {table!r} was bucketed on keys {meta['key_cols']} "
                f"but this merge passed {key_cols}"
            )

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def tables(self) -> list[str]:
        """Names of all tables in the catalog (no internals/leftovers)."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            e
            for e in os.listdir(self.root)
            if os.path.isdir(self.path(e))
            and not e.startswith("_")
            and not e.endswith(("__tmp", "__old"))
        )

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        if not self.exists(table):
            if schema is None:
                raise FileNotFoundError(self.path(table))
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*self._data_dirs(table))

    def overwrite(
        self, df: DataFrame, table: str, partition_cols: list[str] | None = None
    ) -> None:
        # Write to a temp location first so a failed JOB never destroys the
        # current table; then swap via two renames (current -> backup,
        # tmp -> current, drop backup). The crash window is two metadata
        # ops, and a crash inside it leaves a recoverable __old backup
        # rather than no table at all. Assumes tmp/backup share the
        # table's filesystem (they are siblings under the catalog root —
        # os.rename is atomic only within one fs). Delta/Iceberg would make
        # this a real atomic commit; the API is shaped for that swap-in.
        tmp = self.path(table) + "__tmp"
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(tmp)
        final = self.path(table)
        backup = final + "__old"
        if os.path.exists(backup):
            shutil.rmtree(backup)
        if os.path.exists(final):
            os.rename(final, backup)
        os.rename(tmp, final)
        if os.path.exists(backup):
            shutil.rmtree(backup)

    def append(
        self, df: DataFrame, table: str, partition_cols: list[str] | None = None
    ) -> None:
        w = df.write.mode("append")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(self.path(table))

    def to_jdbc(
        self,
        df: DataFrame,
        table: str,
        url: str,
        mode: str = "append",
        driver: str | None = None,
        batchsize: int = 10000,
        num_partitions: int | None = None,
        **options: str,
    ) -> None:
        """Relational sink — S8 parity with the reference's pooled Cloud SQL
        writer (`etl-gcs-cloudsql/src/db.ts:24-46`), Spark-first: batched
        multi-row inserts instead of per-row round-trips, and
        ``num_partitions`` caps concurrent connections the way the
        reference caps its pool (max: 5). Any JDBC database works given its
        driver jar on the Spark classpath (the bundled Derby is used in
        tests; Postgres/Cloud SQL is the same call with its driver).
        """
        out = df.coalesce(num_partitions) if num_partitions else df
        w = (
            out.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("batchsize", str(batchsize))
            .mode(mode)
        )
        if driver:
            w = w.option("driver", driver)
        for k, v in options.items():
            w = w.option(k, v)
        w.save()

    def read_jdbc(
        self, table: str, url: str, driver: str | None = None, **options: str
    ) -> DataFrame:
        """Relational source: read a JDBC table (or a pushdown subquery via
        ``table='(SELECT ...) t'``)."""
        r = self.spark.read.format("jdbc").option("url", url).option(
            "dbtable", table
        )
        if driver:
            r = r.option("driver", driver)
        for k, v in options.items():
            r = r.option(k, v)
        return r.load()

    def merge_upsert(
        self,
        source: DataFrame,
        table: str,
        key_cols: list[str],
        update_cols: list[str] | None = None,
        order_col: str | None = None,
        id_col: str | None = None,
        evolve_schema: bool = False,
        audit_cols: bool = True,
    ) -> DataFrame:
        """Last-wins upsert of ``source`` into ``table`` on ``key_cols``.

        Semantics (reference parity, SURVEY.md §2.5 U1-U3 + A2):
        - duplicate natural keys within ``source``: the *later* row wins
          (ordered by ``order_col``, typically a captured arrival index) —
          the reference re-upserts per row so the last row sticks;
        - matched target rows: only ``update_cols`` are overwritten
          (``None`` = all non-key source columns). `date_updated` is bumped
          only on matches, `date_created` set only on inserts — mirroring
          the BEFORE UPDATE trigger at `model.sql:1-11`;
        - unmatched source rows are inserted, with a surrogate key assigned
          when ``id_col`` is given (SERIAL parity: max(existing)+row_number
          over natural-key order, deterministic — SURVEY.md §7.3.2);
        - existing rows keep their surrogate id and ``date_created``.

        Returns the new table state (also persisted).
        """
        from gcp_datalake_pipeline_spark.operators.dims import assign_dense_ids

        src = dedup_last_wins(source, key_cols, order_col)
        # Provenance/order metadata is not part of the silver schema.
        src = src.drop("_row_idx", "_source_file")
        now = F.current_timestamp()
        # audit_cols=False skips the reference's date_created/date_updated
        # injection — the generic SQL MERGE façade must not silently
        # widen a warehouse table with audit columns it never declared
        if audit_cols:
            if "date_created" not in src.columns:
                src = src.withColumn("date_created", now)
            if "date_updated" not in src.columns:
                src = src.withColumn("date_updated", now)

        if not self.exists(table):
            if id_col is not None and id_col not in src.columns:
                # Sharded deterministic dense ids (no single-task window).
                src = assign_dense_ids(src, key_cols, id_col)
            self.overwrite(src, table)
            return self.read(table)

        target = self.read(table)
        max_id = (
            target.agg(F.max(id_col)).first()[0] or 0
            if id_col is not None
            else 0
        )
        merged = _combine_merge(
            target, src, key_cols, update_cols, id_col, max_id, now,
            evolve_schema=evolve_schema,
        )
        self.overwrite(merged, table)
        return self.read(table)

    def scd2_upsert(
        self,
        source: DataFrame,
        table: str,
        key_cols: list[str],
        tracked_cols: list[str],
        effective_ts=None,
        order_col: str | None = None,
    ) -> DataFrame:
        """Maintain ``table`` as an SCD Type-2 history from snapshot batches.

        The warehouse upgrade of the reference's upsert+append split
        (`model.sql:27-42` current-state upsert, `model.sql:194-219`
        unconditional history append): ONE table answering "what did this
        row look like at time T" via (valid_from, valid_to, is_current).

        ``source`` is one batch (last-wins deduped on ``key_cols`` by
        ``order_col``/arrival, same as merge_upsert); ``effective_ts`` is
        the batch's effective time (default: current_timestamp). Cost per
        batch is a single hash join on the business key (scd2_apply) plus
        the table rewrite — same exchange shape as merge_upsert.

        Returns the new history state (also persisted).
        """
        from gcp_datalake_pipeline_spark.operators.scd import (
            META_COLS,
            scd2_apply,
        )

        src = dedup_last_wins(source, key_cols, order_col)
        src = src.drop("_row_idx", "_source_file")
        eff = (
            effective_ts
            if effective_ts is not None
            else F.current_timestamp()
        )
        current = None
        if self.exists(table):
            current = self.read(table)
            missing = [
                c
                for c in key_cols + tracked_cols + META_COLS
                if c not in current.columns
            ]
            if missing:
                raise ValueError(
                    f"table {table!r} is not an SCD2 history for "
                    f"keys={key_cols} tracked={tracked_cols}: missing "
                    f"columns {missing}"
                )
        hist = scd2_apply(current, src, key_cols, tracked_cols, eff)
        self.overwrite(hist, table)
        return self.read(table)

    def refresh_aggregate(
        self,
        delta_partials: DataFrame,
        table: str,
        keys: list[str],
        sum_cols: list[str],
        count_col: str,
        broadcast_delta: bool = True,
    ) -> DataFrame:
        """Maintain ``table`` as a materialized partial aggregate from
        delta batches — O(delta + affected groups) per refresh, never a
        recompute of untouched groups (operators/incremental.py). First
        call seeds the table with the delta's partials; later calls merge.
        On a TransactionalCatalog the refresh is atomic and versioned like
        any other write. Returns the new aggregate state (persisted).
        """
        from gcp_datalake_pipeline_spark.operators.incremental import (
            refresh_aggregate as _refresh,
        )

        if not self.exists(table):
            self.overwrite(delta_partials, table)
            return self.read(table)
        merged = _refresh(
            self.read(table),
            delta_partials,
            keys,
            sum_cols,
            count_col,
            broadcast_delta=broadcast_delta,
        )
        self.overwrite(merged, table)
        return self.read(table)

    def merge_delete(
        self,
        source: DataFrame,
        table: str,
        key_cols: list[str],
    ) -> int:
        """``MERGE INTO t USING s ON keys WHEN MATCHED THEN DELETE``:
        remove every target row whose key appears in ``source``;
        unmatched source rows are ignored (the Delta semantics of a
        matched-delete-only merge). One hash anti-join on the key —
        the same single exchange a plain upsert pays — then a table
        rewrite; for bounded literal key sets prefer
        ``delete_where(..., [(k, "in", [...])])``, which stats-prunes
        to candidate files instead of rewriting the table. NULL keys
        in the source match nothing (SQL join semantics). Returns the
        number of rows deleted; a no-match merge-delete rewrites
        nothing."""
        target = self.read(table)
        src_keys = source.select(*key_cols).dropDuplicates(key_cols)
        n_matched = target.join(src_keys, key_cols, "left_semi").count()
        if n_matched == 0:
            return 0
        remaining = target.join(src_keys, key_cols, "left_anti")
        self.overwrite(remaining, table)
        return n_matched

    def overwrite_bucketed(
        self,
        df: DataFrame,
        table: str,
        num_buckets: int,
        key_cols: list[str],
    ) -> None:
        """Write ``df`` (logical columns — ``_kb`` is computed here)
        under the ``_kb`` layout and record the bucket-meta sidecar.
        On the plain catalog the two steps are sequential; the
        transactional subclass overrides this to commit them in ONE
        transaction — a crash between data and sidecar would otherwise
        silently strand the table unbucketed (every later bounded-write
        path would fall back to whole-table rewrites with no error)."""
        out = df.drop("_kb").withColumn("_kb", kb_col(key_cols, num_buckets))
        self.overwrite(out, table, partition_cols=["_kb"])
        self._write_bucket_meta(table, num_buckets, list(key_cols))

    def merge_delete_bucketed(
        self,
        source: DataFrame,
        table: str,
        key_cols: list[str],
        num_buckets: int = 64,
    ) -> int:
        """``merge_delete`` for ``_kb``-bucketed tables: reads ONLY the
        partitions holding the source keys' buckets and rewrites only
        those (a bucket whose every key matched is explicitly
        replaced); untouched buckets' files carry over untouched. Needs
        the versioned write path (TransactionalCatalog) — dynamic
        partition overwrite cannot atomically drop an emptied bucket.
        Returns the number of rows deleted."""
        self._check_bucket_meta(table, num_buckets, key_cols)
        src_keys = source.select(*key_cols).dropDuplicates(key_cols)
        kb = kb_col(key_cols, num_buckets)
        # ≤ num_buckets values by construction — a bounded collect
        buckets = [
            r["_kb"]
            for r in src_keys.select(kb.alias("_kb")).distinct().collect()
        ]
        subset = self.read(table).filter(F.col("_kb").isin(buckets))
        n_matched = subset.join(src_keys, key_cols, "left_semi").count()
        if n_matched == 0:
            return 0
        remaining = subset.join(src_keys, key_cols, "left_anti")
        self._write_bucketed_merge(remaining, table, replaced=buckets)
        return n_matched

    def merge_upsert_bucketed(
        self,
        source: DataFrame,
        table: str,
        key_cols: list[str],
        num_buckets: int = 64,
        update_cols: list[str] | None = None,
        order_col: str | None = None,
        id_col: str | None = None,
        evolve_schema: bool = False,
        audit_cols: bool = True,
    ) -> DataFrame:
        """merge_upsert for LARGE tables: the table is stored partitioned by
        a key-hash bucket (``_kb = pmod(xxhash64(keys), num_buckets)``), and
        a merge (1) reads ONLY the partitions holding the source's buckets
        (partition pruning on the scan) and (2) rewrites ONLY those
        partitions (dynamic partition overwrite). A batch touching 3 of 64
        buckets reads and rewrites ~3/64 of the table instead of all of it —
        the plain-Parquet approximation of Delta MERGE partition pruning
        (this API slots a real ``MERGE INTO`` in unchanged when Delta is
        available). Untouched partitions are not even opened.

        Same semantics as merge_upsert (last-wins dedup, frozen columns,
        date_created/date_updated, sharded surrogate ids).
        """
        from gcp_datalake_pipeline_spark.operators.dims import assign_dense_ids

        src = dedup_last_wins(source, key_cols, order_col)
        src = src.drop("_row_idx", "_source_file")
        now = F.current_timestamp()
        # audit_cols=False: same contract as merge_upsert — the generic
        # SQL MERGE façade must not widen a table with audit columns
        if audit_cols:
            if "date_created" not in src.columns:
                src = src.withColumn("date_created", now)
            if "date_updated" not in src.columns:
                src = src.withColumn("date_updated", now)
        src = src.withColumn("_kb", kb_col(key_cols, num_buckets))

        if not self.exists(table):
            if id_col is not None and id_col not in src.columns:
                src = assign_dense_ids(src, key_cols, id_col)
            self.overwrite_bucketed(src, table, num_buckets, key_cols)
            return self.read(table)

        self._check_bucket_meta(table, num_buckets, key_cols)
        full = self.read(table)
        if evolve_schema and any(c not in full.columns for c in src.columns):
            # Schema widening must rewrite EVERY partition: parquet files
            # in untouched buckets would keep the narrow schema and the new
            # column would not survive later reads (no global metadata to
            # reconcile them, unlike Delta). One-off full rewrite.
            target_subset = full
        else:
            buckets = [r["_kb"] for r in src.select("_kb").distinct().collect()]
            # Partition-pruned target scan: only touched buckets are read.
            target_subset = full.filter(F.col("_kb").isin(buckets))
        max_id = (
            self.read(table).agg(F.max(id_col)).first()[0] or 0
            if id_col is not None
            else 0
        )
        merged = _combine_merge(
            target_subset, src, key_cols, update_cols, id_col, max_id, now,
            never_update=("_kb",), evolve_schema=evolve_schema,
        )
        self._write_bucketed_merge(merged, table)
        return self.read(table)

    def _write_bucketed_merge(
        self,
        merged: DataFrame,
        table: str,
        replaced: list[int] | None = None,
    ) -> None:
        # Dynamic partition overwrite: only partitions present in `merged`
        # (exactly the touched buckets) are replaced; others are untouched.
        # `replaced` (buckets to replace even when merged holds no rows
        # for them — a delete-fold can empty a bucket) needs the
        # versioned write path: dynamic overwrite cannot atomically drop
        # an absent partition.
        if replaced:
            raise NotImplementedError(
                "replacing emptied buckets needs the versioned write "
                "path; use a TransactionalCatalog"
            )
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_kb")
            .parquet(self.path(table))
        )


def _combine_merge(
    target: DataFrame,
    src: DataFrame,
    key_cols: list[str],
    update_cols: list[str] | None,
    id_col: str | None,
    max_id: int,
    now,
    never_update: tuple[str, ...] = (),
    evolve_schema: bool = False,
) -> DataFrame:
    """Shared MERGE combine: updated target rows + inserts, one DataFrame.

    Matched target rows take ``update_cols`` from the source and bump
    date_updated; surrogate ids / frozen columns / date_created survive.
    Unmatched source rows insert with sharded dense ids from ``max_id``.

    Source columns the target doesn't have are an error unless
    ``evolve_schema`` is set (then the target schema widens and existing
    rows read NULL for the new columns — Delta's autoMerge behavior;
    silent column drop is never an option).
    """
    from gcp_datalake_pipeline_spark.operators.dims import assign_dense_ids

    extra = [c for c in src.columns if c not in target.columns]
    # date_created/date_updated are merge-managed (injected into src by the
    # upsert itself) — always widen a target that predates them.
    strict_extra = [
        c for c in extra if c not in ("date_created", "date_updated")
    ]
    if strict_extra and not evolve_schema:
        raise ValueError(
            f"source has columns not in the target table: {strict_extra}; "
            "pass evolve_schema=True to widen the table (existing rows "
            "read NULL), or drop them from the source"
        )
    for c in extra:
        target = target.withColumn(c, F.lit(None).cast(src.schema[c].dataType))

    if update_cols is None:
        update_cols = [
            c
            for c in src.columns
            if c not in key_cols
            and c != id_col
            and c not in ("date_created", "date_updated")
            and c not in never_update
        ]

    t = target.alias("t")
    # Sentinel match flag: detecting a match via source-key nullability
    # breaks under eqNullSafe (a NULL-keyed source row that null-safe-
    # matches would look unmatched and its update silently dropped).
    s = src.withColumn("_matched", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols]

    joined = t.join(s, cond, "left")
    matched_flag = F.col("s._matched").isNotNull()
    updated_target = joined.select(
        *[
            (
                F.when(matched_flag, F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                if c in update_cols
                else (
                    F.when(matched_flag, now)
                    .otherwise(F.col("t.date_updated"))
                    .alias(c)
                    if c == "date_updated"
                    else F.col(f"t.{c}").alias(c)
                )
            )
            for c in target.columns
        ]
    )

    inserts = s.join(t, cond, "left_anti")
    if id_col is not None:
        inserts = assign_dense_ids(
            inserts.drop(id_col), key_cols, id_col, start=max_id
        )
    inserts = inserts.select(
        *[
            F.col(c).alias(c) if c in inserts.columns else F.lit(None).alias(c)
            for c in target.columns
        ]
    )
    return updated_target.unionByName(inserts)


def compact_table(
    catalog: Catalog,
    table: str,
    target_files: int = 1,
    partition_cols: list[str] | None = None,
) -> None:
    """Rewrite a table into ``target_files`` files (per partition when
    ``partition_cols`` is given) — the small-files remedy for append-heavy
    history tables (SURVEY.md §7.1.8). At 100 TB this runs per recent
    load_date partition, not whole-table.
    """
    df = catalog.read(table)
    if partition_cols:
        df = df.repartition(target_files, *[F.col(c) for c in partition_cols])
    else:
        df = df.coalesce(target_files)
    catalog.overwrite(df, table, partition_cols=partition_cols)


def dedup_last_wins(
    df: DataFrame, key_cols: list[str], order_col: str | None = None
) -> DataFrame:
    """A2 — keep the last row per natural key (reference re-upserts per row,
    so within one file the last occurrence wins; `services/empresa.ts:101-106`).

    ``order_col`` should be a stable arrival index captured at read time
    (the bronze reader adds ``_row_idx``); falls back to an internal
    monotonic id when absent.
    """
    from pyspark.sql import Window as W

    if order_col is None:
        if "_row_idx" in df.columns:
            order_col = "_row_idx"
        else:
            df = df.withColumn("__arrival", F.monotonically_increasing_id())
            order_col = "__arrival"
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return out.drop("__arrival") if "__arrival" in out.columns else out
