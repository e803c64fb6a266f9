"""Engine CLI.

  python -m gcp_datalake_pipeline_spark.cli ingest  --catalog DIR GLOB...
  python -m gcp_datalake_pipeline_spark.cli stream  --catalog DIR --landing DIR --checkpoint DIR
  python -m gcp_datalake_pipeline_spark.cli corpus-ingest --catalog DIR --landing DIR --checkpoint DIR [--atomic]
  python -m gcp_datalake_pipeline_spark.cli query   --catalog DIR "SELECT ..."
  python -m gcp_datalake_pipeline_spark.cli tables  --catalog DIR

`query` registers every silver/quarantine table in the catalog as a temp
view, plus the testdata parquet tables when --testdata is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from gcp_datalake_pipeline_spark.session import get_spark
from gcp_datalake_pipeline_spark.storage import Catalog


def _catalog(args, must_exist: bool = False) -> Catalog:
    if must_exist and not os.path.isdir(args.catalog):
        sys.exit(f"error: catalog directory not found: {args.catalog}")
    # A catalog created with `ingest --atomic` carries a manifest pointer;
    # every later command must resolve reads through it.
    manifest = os.path.join(args.catalog, "_MANIFEST.json")
    if getattr(args, "atomic", False) or os.path.exists(manifest):
        from gcp_datalake_pipeline_spark.transactions import (
            TransactionalCatalog,
        )

        cat = TransactionalCatalog(get_spark(), args.catalog)
        # First transactional use of a root the plain catalog already
        # wrote: adopt those dirs as manifest v1 instead of silently
        # forking (which would reset seen-file dedup and surrogate ids).
        migrated = cat.migrate_plain()
        if migrated:
            print(
                "migrated plain tables into manifest v1: "
                + ", ".join(migrated),
                file=sys.stderr,
            )
        return cat
    return Catalog(get_spark(), args.catalog)


def cmd_ingest(args) -> None:
    from gcp_datalake_pipeline_spark.pipelines.runner import ingest

    cat = _catalog(args)
    paths = args.paths if len(args.paths) > 1 else args.paths[0]
    results = ingest(cat, paths, idempotent=args.idempotent)
    print(json.dumps(results, indent=2))


def cmd_stream(args) -> None:
    from gcp_datalake_pipeline_spark.streaming.ingest import run_streaming_ingest

    cat = _catalog(args)
    processed = run_streaming_ingest(cat, args.landing, args.checkpoint)
    print(json.dumps({"processed": processed}, indent=2))


def cmd_corpus_ingest(args) -> None:
    """Streaming corpus dedup-ingest: newly landed document files
    (parquet/orc/jsonl/csv) run one atomic dedup round per micro-batch
    (near-dup pairs flagged against the stored band index; docs + bands +
    pairs commit together)."""
    from gcp_datalake_pipeline_spark.streaming.corpus import (
        run_streaming_dedup_ingest,
    )

    cat = _catalog(args)
    rounds = run_streaming_dedup_ingest(
        cat,
        args.landing,
        args.checkpoint,
        threshold=args.threshold,
        num_buckets=args.buckets,
        file_format=args.format,
        schema=args.schema,
        quarantine_after=args.quarantine_after or None,
        bloom_index=args.bloom_index,
    )
    n_pairs = (
        cat.read("corpus_near_dup_pairs").count()
        if cat.exists("corpus_near_dup_pairs")
        else 0
    )
    out = {
        "rounds": rounds,
        "docs": cat.read("corpus_docs").count()
        if cat.exists("corpus_docs")
        else 0,
        "near_dup_pairs": n_pairs,
    }
    if args.show_quarantine:
        qt = "corpus_docs_file_quarantine"
        out["quarantine"] = (
            [r.asDict() for r in cat.read(qt).collect()]
            if cat.exists(qt)
            else []
        )
    print(json.dumps(out, indent=2))


def cmd_rounds(args) -> None:
    """Observability for the streaming loops' audit tables: per-round
    metrics (``*_rounds``) and file-quarantine provenance
    (``*_file_quarantine``), with age-based retention via
    ``--prune-age``."""
    from gcp_datalake_pipeline_spark.streaming.corpus import (
        prune_audit_tables,
    )

    cat = _catalog(args, must_exist=True)
    tables = [t for t in args.tables.split(",") if t]
    out = {}
    if args.prune_age is not None:
        out["pruned"] = prune_audit_tables(cat, tables, args.prune_age)
    for t in tables:
        if not cat.exists(t):
            out[t] = None
            continue
        df = cat.read(t)
        tcol = (
            "quarantined_at"
            if "quarantined_at" in df.columns
            else "committed_at"
        )
        rows = df.orderBy(tcol).collect()
        if args.tail:
            rows = rows[-args.tail :]
        out[t] = [r.asDict() for r in rows]
    print(json.dumps(out, indent=2, default=str))


def cmd_ann(args) -> None:
    """Persisted IVF index lifecycle: build once from a vectors parquet,
    extend batches against the frozen centroids, query top-k with the
    candidate scan partition-pruned to the probed cells."""
    from gcp_datalake_pipeline_spark.operators import ann_index

    if args.action in ("build", "extend") and not args.source:
        sys.exit(f"error: ann {args.action} requires --source")
    if args.action in ("query", "remove") and not args.ids:
        sys.exit(f"error: ann {args.action} requires --ids")
    cat = _catalog(args)
    if args.action == "build":
        vecs = cat.spark.read.parquet(args.source)
        cents = ann_index.build_ivf_index(
            cat, vecs, index_table=args.index,
            nlist=args.nlist, n_iter=args.iters,
            pq_m=args.pq_m or None, pq_ksub=args.pq_ksub,
            pq_residual=args.pq_residual,
        )
        print(
            json.dumps(
                {
                    "built": args.index,
                    "nlist": cents.count(),
                    "vectors": cat.read(f"{args.index}_cells").count(),
                    "pq_m": args.pq_m or None,
                }
            )
        )
    elif args.action == "extend":
        vecs = cat.spark.read.parquet(args.source)
        ann_index.extend_ivf_index(
            cat, vecs, index_table=args.index,
            compact_every=args.compact_every or None,
        )
        print(
            json.dumps(
                {
                    "extended": args.index,
                    "vectors": cat.read(f"{args.index}_cells").count(),
                }
            )
        )
    elif args.action == "stream-extend":
        from gcp_datalake_pipeline_spark.streaming.corpus import (
            run_streaming_index_extend,
        )

        if not (args.landing and args.checkpoint):
            sys.exit("error: ann stream-extend requires --landing and --checkpoint")
        rounds = run_streaming_index_extend(
            cat, args.landing, args.checkpoint, index_table=args.index,
            compact_every=args.compact_every or None,
        )
        print(
            json.dumps(
                {
                    "rounds": rounds,
                    "vectors": cat.read(f"{args.index}_cells").count(),
                }
            )
        )
    elif args.action == "remove":
        ids = [int(x) for x in args.ids.split(",")]
        ann_index.remove_ids(cat, ids, index_table=args.index)
        print(
            json.dumps(
                {
                    "removed": ids,
                    "tombstones": cat.read(
                        f"{args.index}_tombstones"
                    ).count(),
                }
            )
        )
    elif args.action == "compact-index":
        out = ann_index.compact_index(cat, index_table=args.index)
        out["vectors"] = cat.read(f"{args.index}_cells").count()
        print(json.dumps(out))
    elif args.action == "recluster":
        out = ann_index.recluster_index(
            cat, index_table=args.index, n_iter=args.iters,
            sample_fraction=args.sample or None,
            move_threshold=args.move_threshold,
        )
        print(json.dumps(out))
    else:  # query
        ids = [int(x) for x in args.ids.split(",")]
        if args.adc:
            out = ann_index.ivf_index_pq_topk(
                cat, ids, k=args.k, nprobe=args.nprobe,
                index_table=args.index, rerank=args.rerank or None,
            )
        else:
            out = ann_index.ivf_index_topk(
                cat, ids, k=args.k, nprobe=args.nprobe,
                index_table=args.index,
            )
        if args.explain:
            out.explain("formatted")
        out.orderBy("query_id", "rank").show(args.k * len(ids), truncate=False)


def _register_views(
    cat: Catalog, testdata: str | None, version: int | None = None
) -> None:
    if version is not None:
        # time-travel reads: every table AS OF the retained snapshot
        # (tables created later simply don't exist in that world)
        for entry in sorted(cat._version_manifest(version)["tables"]):
            cat.read_at(entry, version).createOrReplaceTempView(entry)
    else:
        for entry in cat.tables():
            cat.read(entry).createOrReplaceTempView(entry)
    if testdata:
        for f in sorted(os.listdir(testdata)):
            if f.endswith(".parquet"):
                name = f[: -len(".parquet")]
                cat.spark.read.parquet(os.path.join(testdata, f)).createOrReplaceTempView(name)


def cmd_query(args) -> None:
    cat = _catalog(args, must_exist=True)
    # DML/DDL statements route to the catalog's engine (stats-pruned
    # rewrites, append, merge_upsert, manifest DDL — transactional
    # catalogs only); everything else is Spark SQL over the registered
    # views. Views register only for statements that can reference
    # them (INSERT ... SELECT / MERGE ... USING, and plain SQL) — a
    # DELETE/UPDATE/DDL must not pay a per-table plan resolution it
    # never uses.
    import re as _re

    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    as_of = getattr(args, "as_of", None)
    if as_of is not None:
        # time travel is a READ: the whole catalog AS OF snapshot N is
        # registered and the statement runs read-only (DML against a
        # historical world has no meaning — restore first)
        if not isinstance(cat, TransactionalCatalog):
            sys.exit("error: --as-of requires a transactional catalog")
        if _re.match(
            r"\s*(INSERT|MERGE|DELETE|UPDATE|CREATE|DROP|TRUNCATE|ALTER"
            r"|OPTIMIZE|VACUUM)\b",
            args.sql,
            _re.I,
        ):
            sys.exit("error: --as-of queries are read-only")
        _register_views(cat, args.testdata, version=as_of)
        df = cat.spark.sql(args.sql)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return
    if isinstance(cat, TransactionalCatalog):
        from gcp_datalake_pipeline_spark.dml_sql import execute_dml

        if _re.match(
            # any CTAS needs the views — including the CLUSTERED BY
            # form, whose parenthesized key list must not be mistaken
            # for a typed column-DDL body (those never carry AS SELECT)
            r"\s*(INSERT|MERGE)\b"
            r"|\s*CREATE\s+TABLE\b.*\bAS\s+SELECT\b",
            args.sql,
            _re.I | _re.S,
        ):
            # statements whose SOURCE is a SELECT need the views
            _register_views(cat, args.testdata)
        result = execute_dml(cat, args.sql)
        if result is not None:
            print(json.dumps(result))
            return
    _register_views(cat, args.testdata)
    sql = _rewrite_table_changes(cat, args.sql)
    sql = _rewrite_version_as_of(cat, sql)
    df = cat.spark.sql(sql)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)


def _quoted_spans(sql: str) -> list[tuple[int, int]]:
    """(start, end) index spans of string literals in ``sql`` — both
    single- and double-quoted (Spark SQL treats ``"..."`` as a string
    literal by default), honoring BOTH escapes Spark's parser accepts
    inside a literal: the doubled quote (``''`` / ``""``) and the
    backslash (``\\'`` — Spark's default parser is C-style unless
    ``escapedStringLiterals`` is flipped). The prompt rewrites below
    must never substitute INSIDE a literal — ``WHERE note = 'x VERSION
    AS OF 3'`` is user data, not syntax."""
    spans = []
    i, n = 0, len(sql)
    while i < n:
        q = sql[i]
        if q in ("'", '"'):
            j = i + 1
            while j < n:
                if sql[j] == "\\":
                    j += 2
                    continue
                if sql[j] == q:
                    if j + 1 < n and sql[j + 1] == q:
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, min(j, n - 1)))
            i = j + 1
        else:
            i += 1
    return spans


def _sub_outside_quotes(pattern: str, sub, sql: str) -> str:
    """re.sub that skips matches STARTING inside a quoted literal —
    the side-effecting ``sub`` (temp-view registration) runs only for
    real syntax occurrences."""
    import re as _re

    spans = _quoted_spans(sql)

    def guarded(m):
        if any(s <= m.start() <= e for s, e in spans):
            return m.group(0)
        return sub(m)

    return _re.sub(pattern, guarded, sql, flags=_re.I)


def _rewrite_version_as_of(cat, sql: str) -> str:
    """Delta's per-table time travel at the SQL prompt: ``FROM t
    VERSION AS OF n`` registers ``t``'s snapshot-n read (``read_at``,
    stats sidecars included) as a temp view and rewrites the reference
    — the per-table complement of the catalog-wide ``--as-of``.
    Quote-aware: the phrase inside a string literal is data, not
    syntax, and passes through untouched."""
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    if not isinstance(cat, TransactionalCatalog):
        return sql

    def sub(m):
        t, v = m.group(1), int(m.group(2))
        name = f"_asof_{t}_v{v}"
        cat.read_at(t, v).createOrReplaceTempView(name)
        return name

    sql = _sub_outside_quotes(
        r"\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)", sub, sql
    )

    def sub_ts(m):
        t, raw = m.group(1), m.group(2)
        v = cat.version_at(raw)
        name = f"_asof_{t}_v{v}"
        cat.read_at(t, v).createOrReplaceTempView(name)
        return name

    # Delta's TIMESTAMP AS OF '...' — resolved against the retained
    # commit times, then served exactly like VERSION AS OF. The
    # literal-matching here is safe: the phrase's own quoted timestamp
    # is consumed by the match, and _sub_outside_quotes skips matches
    # STARTING inside some other string literal.
    return _sub_outside_quotes(
        r"\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'", sub_ts, sql
    )


def _rewrite_table_changes(cat, sql: str) -> str:
    """Delta's CDF table-valued function at the SQL prompt:
    ``SELECT ... FROM table_changes('t', v1[, v2])`` — Spark has no
    Python-defined TVFs, so each occurrence materializes as a temp
    view over :meth:`TransactionalCatalog.table_changes` (bounded to
    the changed files) and the reference is rewritten to the view
    name. Non-transactional catalogs pass through untouched.
    Quote-aware: the call shape inside a string literal is data and
    passes through (the match anchors at ``table_changes``, outside
    its own argument's quotes)."""
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    if not isinstance(cat, TransactionalCatalog):
        return sql

    def sub(m):
        t, v1, v2, fr = m.group(1), int(m.group(2)), m.group(3), m.group(4)
        follow = bool(fr) and fr.lower() == "true"
        df = cat.table_changes(
            t, v1, int(v2) if v2 else None, follow_renames=follow
        )
        name = f"_changes_{t}_{v1}_{v2 or 'cur'}{'_fr' if follow else ''}"
        df.createOrReplaceTempView(name)
        return name

    return _sub_outside_quotes(
        r"table_changes\(\s*'(\w+)'\s*,\s*(\d+)\s*"
        r"(?:,\s*(\d+)\s*)?(?:,\s*(true|false)\s*)?\)",
        sub,
        sql,
    )


def cmd_diff(args) -> None:
    """Change-data-feed summary between two snapshots: per-commit
    insert/delete counts, I/O bounded to the changed files. With
    --keys, same-key delete+insert pairs within one commit report as
    update_preimage/update_postimage (column-level updates)."""
    from pyspark.sql import functions as F

    cat = _txn_catalog(args)
    keys = (
        [k.strip() for k in args.keys.split(",")] if args.keys else None
    )
    ch = cat.table_changes(
        args.table, args.from_version, args.to_version, key_cols=keys
    )
    rows = (
        ch.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .orderBy("_commit_version", "_change_type")
        .collect()
    )
    print(
        json.dumps(
            {
                "table": args.table,
                "from": args.from_version,
                "to": args.to_version,
                "changes": [
                    {
                        "version": r["_commit_version"],
                        "type": r["_change_type"],
                        "rows": r["n"],
                    }
                    for r in rows
                ],
            }
        )
    )


def cmd_cdf_pump(args) -> None:
    """One exactly-once round of change-feed consumption: fold the
    source's changes since the consumer's watermark into a keyed
    replica table, watermark and writes in one commit."""
    from gcp_datalake_pipeline_spark.streaming.cdf import (
        apply_changes_into,
        apply_changes_scd2,
        bootstrap_changes_target,
        bootstrap_scd2_target,
        pump_table_changes,
    )

    cat = _txn_catalog(args)
    keys = [k.strip() for k in args.keys.split(",")]

    if args.scd2:

        def apply(feed):
            return apply_changes_scd2(cat, feed, args.target, keys)

    else:

        def apply(feed):
            return apply_changes_into(cat, feed, args.target, keys)

    if cat.stream_watermark(args.consumer) is None:
        if args.start_version is not None:
            # deep-history start: the caller manages the bootstrap
            out = pump_table_changes(
                cat,
                args.source,
                args.consumer,
                start_version=args.start_version,
                follow_renames=args.follow_renames,
            )
        else:
            # bootstrap BEFORE registering, watermark pinned to the
            # pre-copy version: a crash between the two just
            # re-bootstraps, and a src commit slipping between read
            # and register only re-applies a window the keyed apply
            # folds idempotently — the replica can never MISS a window.
            # The replica lands under the _kb bucket layout so every
            # later pump rewrites only the buckets its window touched.
            v0 = cat._read_manifest(strict=False)["version"]
            if args.scd2:
                bootstrap_scd2_target(
                    cat, args.source, args.target, keys,
                    num_buckets=args.buckets,
                )
            else:
                bootstrap_changes_target(
                    cat, args.source, args.target, keys,
                    num_buckets=args.buckets,
                )
            out = pump_table_changes(
                cat, args.source, args.consumer, start_version=v0,
                follow_renames=args.follow_renames,
            )
            out["bootstrapped"] = True
        print(json.dumps(out))
        return
    print(
        json.dumps(
            pump_table_changes(
                cat, args.source, args.consumer, apply,
                follow_renames=args.follow_renames,
            )
        )
    )


def cmd_tables(args) -> None:
    cat = _catalog(args, must_exist=True)
    for entry in cat.tables():
        df = cat.read(entry)
        print(f"{entry}\t{df.count()} rows\t({', '.join(df.columns)})")


def cmd_export(args) -> None:
    cat = _catalog(args, must_exist=True)
    tables = args.tables or cat.tables()
    out = {}
    for t in tables:
        df = cat.read(t)
        cat.to_jdbc(
            df,
            t,
            args.url,
            mode=args.mode,
            driver=args.driver,
            num_partitions=args.connections,
        )
        out[t] = df.count()
    print(json.dumps({"exported": out, "url": args.url}))


def cmd_run(args) -> None:
    from gcp_datalake_pipeline_spark.plans import QUERIES

    if args.name not in QUERIES:
        sys.exit(
            f"error: unknown query {args.name!r}; known: "
            + ", ".join(sorted(QUERIES))
        )
    spark = get_spark()
    df = QUERIES[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)


def cmd_verify(args) -> None:
    from gcp_datalake_pipeline_spark.plans import QUERIES
    from gcp_datalake_pipeline_spark.plans.compare import (
        compare_query,
        duckdb_connection,
    )

    spark = get_spark()
    con = duckdb_connection(args.sf_dir)
    names = args.names or [n for n, q in sorted(QUERIES.items()) if q.oracle]
    results = {}
    for name in names:
        q = QUERIES.get(name)
        if q is None:
            sys.exit(f"error: unknown query {name!r}")
        if not q.oracle:
            results[name] = "no_oracle (rows-only operator)"
            continue
        r = compare_query(spark, con, name, q.fn(spark, args.sf_dir), q.oracle)
        results[name] = "ok" if r.ok else f"MISMATCH: {r.detail[:200]}"
    print(json.dumps(results, indent=2))
    if any(v.startswith("MISMATCH") for v in results.values()):
        sys.exit(1)


def _txn_catalog(args):
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = _catalog(args, must_exist=True)
    if not isinstance(cat, TransactionalCatalog):
        sys.exit(
            "error: not a transactional catalog (create one with "
            "`ingest --atomic`)"
        )
    return cat


def cmd_versions(args) -> None:
    print(json.dumps(_txn_catalog(args).versions(), indent=2))


def cmd_restore(args) -> None:
    cat = _txn_catalog(args)
    cat.restore(args.version)
    print(json.dumps({"restored_to": args.version, "tables": cat.tables()}))


def cmd_clone(args) -> None:
    cat = _txn_catalog(args)
    dst = cat.clone_to(args.dst)
    print(json.dumps({"cloned_to": args.dst, "tables": dst.tables()}))


def cmd_audit(args) -> None:
    from gcp_datalake_pipeline_spark.operators.quality import profile_table

    cat = _catalog(args, must_exist=True)
    df = cat.read(args.table)
    cols = args.columns.split(",") if args.columns else None
    rows = [r.asDict() for r in profile_table(df, cols).collect()]
    print(json.dumps({"table": args.table, "profile": rows}, indent=2))


def cmd_compact(args) -> None:
    cat = _txn_catalog(args)
    done = cat.compact(
        args.table,
        target_file_bytes=args.target_mb * 1024 * 1024,
        cluster_by=args.cluster_by.split(",") if args.cluster_by else None,
        zorder_by=args.zorder_by.split(",") if args.zorder_by else None,
    )
    print(json.dumps({"table": args.table, "compacted": done}))


def _typed_value(raw: str):
    """Type a predicate value by trial: int -> float -> ISO datetime ->
    bare string."""
    for conv in (int, float):
        try:
            return conv(raw)
        except ValueError:
            pass
    import datetime

    try:
        return datetime.datetime.fromisoformat(raw)
    except ValueError:
        return raw


def _parse_pred(spec: str):
    """``col,op[,value]``; the ``in`` op takes a comma-separated value
    list (``col,in,1,2,3``); is_null/not_null take no value."""
    parts = spec.split(",", 2)
    if len(parts) == 1:
        sys.exit(
            f"error: --pred must be col,op[,value], got {spec!r} "
            "(ops: = != < <= > >= in is_null not_null)"
        )
    if len(parts) == 2:
        return (parts[0], parts[1])
    col, op, raw = parts
    if op == "in":
        return (col, op, [_typed_value(v) for v in raw.split(",")])
    return (col, op, _typed_value(raw))


def cmd_delete(args) -> None:
    """Row-level DELETE: stats prune the candidate files, only those are
    rewritten, everything else carries by hardlink into the new
    snapshot (old versions stay time-travelable). ``--merge-on-read``
    writes a deletion vector instead — zero data files rewritten;
    OPTIMIZE/compact folds the vectors later."""
    cat = _txn_catalog(args)
    preds = [_parse_pred(p) for p in args.pred]
    mode = "dv" if args.merge_on_read else "rewrite"
    n = cat.delete_where(args.table, preds, mode=mode)
    print(json.dumps({"table": args.table, "deleted": n, "mode": mode}))


def cmd_update(args) -> None:
    """Row-level UPDATE: the delete machinery with a SET transform —
    candidate files rewrite, the rest hardlink. ``--merge-on-read``
    appends the updated images and vector-deletes the originals —
    no candidate file rewritten."""
    cat = _txn_catalog(args)
    preds = [_parse_pred(p) for p in args.pred]
    sets = {}
    for s in args.set:
        col, _, expr = s.partition("=")
        if not col or not expr:
            sys.exit(f"error: --set must be col=expr, got {s!r}")
        sets[col.strip()] = expr.strip()
    mode = "dv" if args.merge_on_read else "rewrite"
    n = cat.update_where(args.table, preds, sets, mode=mode)
    print(json.dumps({"table": args.table, "updated": n, "mode": mode}))


def cmd_restore_table(args) -> None:
    """RESTORE one table to an earlier snapshot as a NEW commit (pure
    metadata; the undone versions stay time-travelable). The catalog-
    wide rollback is the separate `restore` command."""
    cat = _txn_catalog(args)
    cat.restore_table(args.table, args.version)
    print(
        json.dumps(
            {
                "table": args.table,
                "restored_to": args.version,
                "rows": cat.count_rows(args.table),
            }
        )
    )


def cmd_describe(args) -> None:
    """Table health at a glance, metadata-only: dir/file/row counts,
    bytes, stats-sidecar coverage, checks, bucket layout, schema."""
    cat = _txn_catalog(args)
    from gcp_datalake_pipeline_spark import filestats

    if not cat.exists(args.table):
        sys.exit(f"error: no table {args.table!r}")
    dirs = cat._data_dirs(args.table)
    n_files = n_stats = 0
    n_bytes = 0
    for d in dirs:
        files = cat._dir_parquet_files(d)
        n_files += len(files)
        stats = filestats.read_dir_stats(d)
        entries = (stats or {}).get("files", {})
        n_stats += sum(1 for f in files if f in entries)
        n_bytes += sum(
            os.path.getsize(os.path.join(d, f)) for f in files
        )
    stored = cat.logical_schema(args.table)
    meta_path = cat._bucket_meta_path(args.table)
    bucket = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            bucket = json.load(f)
    # ANN index cells: count_rows keeps counting tombstoned vids until
    # compact-index folds them — surface the pending number so serving
    # capacity reads stored-minus-pending, never stale stored
    pending = None
    if args.table.endswith("_cells"):
        base = args.table[: -len("_cells")]
        if cat.exists(f"{base}_tombstones"):
            from gcp_datalake_pipeline_spark.operators import ann_index

            pending = ann_index.pending_tombstones(cat, base)
    print(
        json.dumps(
            {
                "table": args.table,
                "dirs": len(dirs),
                "files": n_files,
                "bytes": n_bytes,
                "rows": cat.count_rows(args.table),
                **(
                    {"pending_tombstones": pending}
                    if pending is not None
                    else {}
                ),
                # merge-on-read deletes not yet folded by compact: the
                # rows count above already subtracts them
                "pending_deletes": cat.dv_count(args.table),
                "stats_coverage": (
                    round(n_stats / n_files, 3) if n_files else None
                ),
                "checks": cat.checks(args.table),
                "identity": cat.identity_spec(args.table),
                "generated": cat.generated_spec(args.table),
                "properties": cat.table_properties(args.table),
                "column_mapping": cat.colmap(args.table),
                "layout": cat.layout(args.table),
                "bloom_index": cat.bloom_index(args.table),
                "bucket_layout": bucket,
                "columns": (
                    [f.name for f in stored.fields] if stored else None
                ),
                "version": cat.versions()[-1]["version"],
            }
        )
    )


def cmd_count(args) -> None:
    """Metadata-optimized exact COUNT: stats answer what they can prove,
    only undecidable files scan."""
    cat = _txn_catalog(args)
    preds = [_parse_pred(p) for p in (args.pred or [])]
    n = cat.count_rows(args.table, preds)
    print(json.dumps({"table": args.table, "rows": n}))


def cmd_minmax(args) -> None:
    """Exact MIN/MAX from file stats; only stat-less files scan."""
    cat = _txn_catalog(args)
    mn, mx = cat.min_max(args.table, args.column)
    print(
        json.dumps(
            {"table": args.table, "column": args.column,
             "min": mn, "max": mx},
            default=str,
        )
    )


def cmd_check(args) -> None:
    """CHECK-constraint lifecycle: write-time data quality gates stored
    in the manifest and enforced on every staged write."""
    cat = _txn_catalog(args)
    if args.action == "add":
        if not (args.name and args.expr):
            sys.exit("error: check add requires NAME and EXPR")
        cat.add_check(args.table, args.name, args.expr)
        print(json.dumps({"table": args.table, "added": args.name}))
    elif args.action == "drop":
        if not args.name:
            sys.exit("error: check drop requires NAME")
        cat.drop_check(args.table, args.name)
        print(json.dumps({"table": args.table, "dropped": args.name}))
    else:  # list
        print(json.dumps({args.table: cat.checks(args.table)}))


def cmd_vacuum(args) -> None:
    removed = _txn_catalog(args).vacuum(
        retain_versions=args.retain, min_age_seconds=args.min_age
    )
    print(json.dumps({"removed": removed, "retain": args.retain}))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="gcp_datalake_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="batch-process landing CSVs")
    pi.add_argument("--catalog", required=True)
    pi.add_argument(
        "--idempotent",
        action="store_true",
        help="skip files already in the ingestion manifest (default: replay "
        "re-appends history, matching the reference)",
    )
    pi.add_argument(
        "--atomic",
        action="store_true",
        help="use the transactional catalog: every table a file touches "
        "(entities, dims, history, quarantine, manifest row) publishes in "
        "one atomic manifest-pointer commit; a crash mid-load is invisible "
        "to readers",
    )
    pi.add_argument("paths", nargs="+")
    pi.set_defaults(fn=cmd_ingest)

    ps = sub.add_parser("stream", help="streaming ingest (availableNow)")
    ps.add_argument("--catalog", required=True)
    ps.add_argument("--landing", required=True)
    ps.add_argument("--checkpoint", required=True)
    ps.set_defaults(fn=cmd_stream)

    pc = sub.add_parser(
        "corpus-ingest",
        help="streaming corpus dedup-ingest: one atomic near-dup round "
        "per landed document parquet file",
    )
    pc.add_argument("--catalog", required=True)
    pc.add_argument("--landing", required=True)
    pc.add_argument("--checkpoint", required=True)
    pc.add_argument("--threshold", type=float, default=0.8)
    pc.add_argument(
        "--buckets", type=int, default=64,
        help="doc_id hash buckets for the stored corpus (partition-pruned "
        "verification reads)",
    )
    pc.add_argument(
        "--atomic", action="store_true",
        help="use the transactional catalog (one commit per round; "
        "replayed batches are skipped via the version history)",
    )
    pc.add_argument(
        "--bloom-index", action="store_true", dest="bloom_index",
        help="maintain a bloom index on doc_id (transactional catalogs): "
        "small-candidate verification reads skip files id ranges cannot",
    )
    pc.add_argument(
        "--format", default="parquet",
        choices=["parquet", "orc", "jsonl", "csv"],
        help="landed file format (jsonl = one JSON document per line; "
        "csv = with header; jsonl/csv read FAILFAST)",
    )
    pc.add_argument(
        "--schema", default=None,
        help='DDL schema for jsonl/csv, e.g. "doc_id long, text string" '
        "(skips per-file inference; REQUIRED for csv — headerless typing "
        "would land every column as string)",
    )
    pc.add_argument(
        "--quarantine-after", type=int, default=3,
        help="dead-letter a round's files after this many failures "
        "(poison-pill protection; multi-file rounds bisect so healthy "
        "files always commit; 0 = retry forever)",
    )
    pc.add_argument(
        "--show-quarantine", action="store_true",
        help="include the file-quarantine provenance table in the output",
    )
    pc.set_defaults(fn=cmd_corpus_ingest)

    prnd = sub.add_parser(
        "rounds",
        help="show (and optionally age-prune) the streaming loops' "
        "per-round metrics and file-quarantine audit tables",
    )
    prnd.add_argument("--catalog", required=True)
    prnd.add_argument(
        "--tables",
        default="corpus_docs_rounds,corpus_docs_file_quarantine",
        help="comma-separated audit tables (default: the text loop's "
        "rounds + quarantine tables)",
    )
    prnd.add_argument(
        "--tail", type=int, default=None,
        help="show only the most recent N rows per table",
    )
    prnd.add_argument(
        "--prune-age", type=float, default=None,
        help="drop audit rows older than this many seconds "
        "(vacuum-style retention; rewrites the table transactionally)",
    )
    prnd.set_defaults(fn=cmd_rounds)

    pa = sub.add_parser(
        "ann",
        help="persisted IVF index: build / extend / stream-extend / "
        "query-only serving / tombstone deletes (remove, compact-index)",
    )
    pa.add_argument(
        "action",
        choices=[
            "build", "extend", "stream-extend", "query", "remove",
            "compact-index", "recluster",
        ],
    )
    pa.add_argument("--catalog", required=True)
    pa.add_argument("--index", default="ann_ivf")
    pa.add_argument(
        "--landing", default=None,
        help="stream-extend: landed embedding-parquet directory",
    )
    pa.add_argument(
        "--checkpoint", default=None,
        help="stream-extend: streaming checkpoint directory",
    )
    pa.add_argument(
        "--source", default=None,
        help="vectors parquet (vec_id, embedding) for build/extend",
    )
    pa.add_argument(
        "--ids", default=None,
        help="vec_ids, comma-sep (query: probe these; remove: tombstone "
        "these out of every query path until compact-index folds them)",
    )
    pa.add_argument("--k", type=int, default=5)
    pa.add_argument("--nprobe", type=int, default=4)
    pa.add_argument("--nlist", type=int, default=16)
    pa.add_argument("--iters", type=int, default=2)
    pa.add_argument(
        "--pq-m", type=int, default=0,
        help="build: also store this many PQ codes per vector (0 = flat "
        "index); query then serves from codes with --adc",
    )
    pa.add_argument(
        "--pq-ksub", type=int, default=16,
        help="build: PQ codebook size per subspace",
    )
    pa.add_argument(
        "--pq-residual", action="store_true",
        help="build: quantize assignment residuals (FAISS by_residual "
        "— tighter codes; per-cell ADC tables at query time)",
    )
    pa.add_argument(
        "--adc", action="store_true",
        help="query: score from the stored PQ codes (asymmetric "
        "distance) instead of exact cosine over vectors",
    )
    pa.add_argument(
        "--rerank", type=int, default=0,
        help="query --adc: refine the ADC top-N shortlist by exact "
        "cosine (fetches true vectors for only those rows)",
    )
    pa.add_argument(
        "--sample", type=float, default=0.0,
        help="recluster: re-center on this corpus fraction (0 = all)",
    )
    pa.add_argument(
        "--move-threshold", type=float, default=0.01,
        help="recluster: minimum centroid L2 movement that re-opens a "
        "cell (unmoved cells hardlink-carry)",
    )
    pa.add_argument(
        "--compact-every", type=int, default=0,
        help="extend only: fold a table back to one data dir when its "
        "staged-dir count reaches this (0 = never)",
    )
    pa.add_argument("--explain", action="store_true")
    pa.add_argument("--atomic", action="store_true")
    pa.set_defaults(fn=cmd_ann)

    pq = sub.add_parser("query", help="SQL over the catalog")
    pq.add_argument("--catalog", required=True)
    pq.add_argument("--testdata", default=None)
    pq.add_argument("--limit", type=int, default=50)
    pq.add_argument("--explain", action="store_true")
    pq.add_argument(
        "--as-of", dest="as_of", type=int, default=None,
        help="run the statement read-only against retained snapshot N "
        "(every table registered via read_at — catalog-wide time travel)",
    )
    pq.add_argument("sql")
    pq.set_defaults(fn=cmd_query)

    pt = sub.add_parser("tables", help="list catalog tables")
    pt.add_argument("--catalog", required=True)
    pt.set_defaults(fn=cmd_tables)

    pr = sub.add_parser("run", help="run a named registry query on testdata")
    pr.add_argument("name")
    pr.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pr.add_argument("--limit", type=int, default=20)
    pr.add_argument("--explain", action="store_true")
    pr.set_defaults(fn=cmd_run)

    pv = sub.add_parser(
        "verify", help="compare registry queries against their DuckDB oracles"
    )
    pv.add_argument("names", nargs="*")
    pv.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pv.set_defaults(fn=cmd_verify)

    pe = sub.add_parser(
        "export", help="export catalog tables to a JDBC database (S8 sink)"
    )
    pe.add_argument("--catalog", required=True)
    pe.add_argument("--url", required=True, help="JDBC url, e.g. jdbc:postgresql://...")
    pe.add_argument("--driver", default=None)
    pe.add_argument("--mode", default="overwrite", choices=["overwrite", "append"])
    pe.add_argument(
        "--connections", type=int, default=5,
        help="max concurrent connections (reference pool parity: 5)",
    )
    pe.add_argument("tables", nargs="*")
    pe.set_defaults(fn=cmd_export)

    pvs = sub.add_parser(
        "versions", help="list committed snapshots of a transactional catalog"
    )
    pvs.add_argument("--catalog", required=True)
    pvs.set_defaults(fn=cmd_versions)

    prs = sub.add_parser(
        "restore", help="roll the catalog back to a committed snapshot"
    )
    prs.add_argument("--catalog", required=True)
    prs.add_argument("version", type=int)
    prs.set_defaults(fn=cmd_restore)

    pva = sub.add_parser(
        "vacuum",
        help="reclaim staged/superseded files beyond the time-travel horizon",
    )
    pva.add_argument("--catalog", required=True)
    pva.add_argument(
        "--retain", type=int, default=1,
        help="snapshots to keep readable via read_at (default 1 = current)",
    )
    pva.add_argument(
        "--min-age", type=float, default=3600.0,
        help="only reclaim unreferenced dirs older than this many seconds "
        "(protects concurrent writers' staging; 0 = reclaim everything)",
    )
    pva.set_defaults(fn=cmd_vacuum)

    pco = sub.add_parser(
        "compact",
        help="fold an append-grown table into size-targeted files "
        "(published as a new snapshot; old versions stay time-travelable)",
    )
    pco.add_argument("--catalog", required=True)
    pco.add_argument("table")
    pco.add_argument(
        "--target-mb", type=int, default=128,
        help="target output file size in MB (default 128)",
    )
    pco.add_argument(
        "--cluster-by", default=None,
        help="comma-separated columns to range-partition + sort the "
        "rewrite by (parquet min/max data skipping)",
    )
    pco.add_argument(
        "--zorder-by", default=None,
        help="comma-separated numeric/date/timestamp/string columns to "
        "Morton-cluster the rewrite by: every output file covers a "
        "tight range in ALL listed columns, so selective reads skip "
        "files on any of them (mutually exclusive with --cluster-by)",
    )
    pco.set_defaults(fn=cmd_compact)

    pdl = sub.add_parser(
        "delete",
        help="DELETE rows matching all --pred conditions: file stats "
        "pick the candidate files, only those rewrite, the rest "
        "hardlink into the new snapshot",
    )
    pdl.add_argument("--catalog", required=True)
    pdl.add_argument("table")
    pdl.add_argument(
        "--pred", action="append", required=True,
        help="col,op[,value] — ops: = < <= > >= in is_null not_null; "
        "value typed by trial (int, float, ISO datetime, string); "
        "repeat for AND",
    )
    pdl.add_argument(
        "--merge-on-read", action="store_true",
        help="write a deletion vector instead of rewriting candidate "
        "files (folded by the next compact)",
    )
    pdl.set_defaults(fn=cmd_delete)

    pup = sub.add_parser(
        "update",
        help="UPDATE rows matching all --pred conditions: SET "
        "col=expr on the matched rows; only candidate files rewrite",
    )
    pup.add_argument("--catalog", required=True)
    pup.add_argument("table")
    pup.add_argument(
        "--pred", action="append", required=True,
        help="col,op[,value] — repeat for AND (same format as delete)",
    )
    pup.add_argument(
        "--set", action="append", required=True,
        help="col=sql_expr — repeat for multiple columns",
    )
    pup.add_argument(
        "--merge-on-read", action="store_true",
        help="append updated images + vector-delete the originals "
        "instead of rewriting candidate files",
    )
    pup.set_defaults(fn=cmd_update)

    prt = sub.add_parser(
        "restore-table",
        help="RESTORE one table to an earlier snapshot (new commit, "
        "pure metadata; history stays time-travelable)",
    )
    prt.add_argument("--catalog", required=True)
    prt.add_argument("table")
    prt.add_argument("version", type=int)
    prt.set_defaults(fn=cmd_restore_table)

    pds = sub.add_parser(
        "describe",
        help="table health, metadata-only: dirs/files/rows/bytes, "
        "stats coverage, checks, bucket layout, schema",
    )
    pds.add_argument("--catalog", required=True)
    pds.add_argument("table")
    pds.set_defaults(fn=cmd_describe)

    pdf = sub.add_parser(
        "diff",
        help="change-data-feed summary between snapshots: per-commit "
        "insert/delete row counts, I/O bounded to changed files",
    )
    pdf.add_argument("--catalog", required=True)
    pdf.add_argument("table")
    pdf.add_argument("--from", dest="from_version", type=int, required=True)
    pdf.add_argument("--to", dest="to_version", type=int, default=None)
    pdf.add_argument(
        "--keys", default=None,
        help="comma-separated key columns: pair same-key delete+insert "
        "within a commit into update_preimage/update_postimage",
    )
    pdf.set_defaults(fn=cmd_diff)

    pcp = sub.add_parser(
        "cdf-pump",
        help="one exactly-once change-feed round: fold the source's "
        "changes since the consumer watermark into a keyed replica "
        "(first call registers + bootstraps the replica snapshot)",
    )
    pcp.add_argument("--catalog", required=True)
    pcp.add_argument("--source", required=True)
    pcp.add_argument("--consumer", required=True)
    pcp.add_argument("--target", required=True)
    pcp.add_argument("--keys", required=True, help="comma-separated key columns")
    pcp.add_argument("--start-version", type=int, default=None)
    pcp.add_argument(
        "--buckets", type=int, default=64,
        help="replica _kb bucket count (bootstrap only; pumps rewrite "
        "only touched buckets)",
    )
    pcp.add_argument(
        "--follow-renames", action="store_true",
        help="opt the consumer into the source's rename lineage: pumps "
        "cross ALTER TABLE ... RENAME TO and the watermark carries "
        "onto the new name (default: a rename strands loudly)",
    )
    pcp.add_argument(
        "--scd2", action="store_true",
        help="keep FULL HISTORY instead of latest state: each change "
        "closes the key's open row (valid_from/valid_to/is_current) "
        "and opens the new image; deletes close with no successor",
    )
    pcp.set_defaults(fn=cmd_cdf_pump)

    pcn = sub.add_parser(
        "count",
        help="exact COUNT(*) [WHERE --pred ...] from file stats where "
        "provable; only undecidable files scan",
    )
    pcn.add_argument("--catalog", required=True)
    pcn.add_argument("table")
    pcn.add_argument(
        "--pred", action="append", default=None,
        help="col,op[,value] — repeat for AND (same format as delete)",
    )
    pcn.set_defaults(fn=cmd_count)

    pmm = sub.add_parser(
        "minmax",
        help="exact MIN/MAX of a column from file stats; only "
        "stat-less files scan",
    )
    pmm.add_argument("--catalog", required=True)
    pmm.add_argument("table")
    pmm.add_argument("column")
    pmm.set_defaults(fn=cmd_minmax)

    pck = sub.add_parser(
        "check",
        help="CHECK constraints: manifest-stored write-time data "
        "quality gates (add validates existing rows; every later "
        "write must satisfy or it rolls back)",
    )
    pck.add_argument("action", choices=["add", "list", "drop"])
    pck.add_argument("--catalog", required=True)
    pck.add_argument("table")
    pck.add_argument("name", nargs="?", default=None)
    pck.add_argument("expr", nargs="?", default=None)
    pck.set_defaults(fn=cmd_check)

    pau = sub.add_parser(
        "audit",
        help="single-pass data-quality profile of a catalog table "
        "(nulls, exact distincts, min/max per column)",
    )
    pau.add_argument("--catalog", required=True)
    pau.add_argument("table")
    pau.add_argument(
        "--columns", default=None,
        help="comma-separated subset (default: all columns)",
    )
    pau.set_defaults(fn=cmd_audit)

    pcl = sub.add_parser(
        "clone",
        help="zero-copy writable branch of the current snapshot "
        "(hardlinked data, fresh manifest)",
    )
    pcl.add_argument("--catalog", required=True)
    pcl.add_argument("dst")
    pcl.set_defaults(fn=cmd_clone)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
