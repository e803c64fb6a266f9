"""SQL façade for the catalog's row-level DML.

The reference's users mutate their tables with PostgreSQL DML
(``etl-gcs-cloudsql`` upserts row-by-row into CloudSQL); this module
gives the transactional catalog the same front door: ``DELETE`` /
``UPDATE`` statements route to
:meth:`~gcp_datalake_pipeline_spark.transactions.TransactionalCatalog.delete_where`
/ :meth:`...update_where` — the stats-pruned, hardlink-carrying
rewrites; ``INSERT INTO`` routes to ``Catalog.append`` (new files
only, never a rewrite) with positional column mapping and a cast-loss
probe; ``MERGE INTO ... USING ... ON k = k`` routes to
``Catalog.merge_upsert`` (the engine's full-outer coalesce upsert —
the reference's central write operator, ``services/empresa.ts:92-106``)
— instead of Spark's (read-only) SQL runner. Everything else returns
``None`` so the caller sends it to ``spark.sql`` unchanged.

Deliberately STRICT grammar (anything else raises with the grammar in
the message — a typo must never silently become a full-table Spark
statement):

    DELETE FROM <table> WHERE <where>
    UPDATE <table> SET col = <sql-expr>[, ...] WHERE <where>
    INSERT INTO|OVERWRITE <table> [(col, ...)]
        VALUES (<literal|NULL>, ...), ... | SELECT ...
    MERGE INTO <table> USING <src-table | (SELECT ...) [alias]>
        ON [q.]k = [q.]k [AND ...]
        [WHEN MATCHED [AND <cond>] THEN
            UPDATE SET * | UPDATE SET col = <expr>[, ...] | DELETE]
        [WHEN NOT MATCHED [AND <cond>] THEN
            INSERT * | INSERT (cols) VALUES (<expr>, ...)]
        [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
            DELETE | UPDATE SET col = <expr>[, ...]]
        -- conds and exprs: Spark SQL over src.col / tgt.col (BY
        -- SOURCE sees tgt. only); SET/INSERT lists may not name merge
        -- keys or GENERATED ALWAYS columns; no clauses = the classic
        -- upsert pair; conditional / column-level / BY SOURCE shapes
        -- need a transactional catalog
    CREATE TABLE [IF NOT EXISTS] <table> (<spark-ddl-columns>)
        [CLUSTERED BY (keys) INTO n BUCKETS]
    CREATE TABLE [IF NOT EXISTS] <table>
        [CLUSTERED BY (keys) INTO n BUCKETS] AS SELECT ...
    ALTER TABLE <table> ADD COLUMN <name> <ddl-type>
    ALTER TABLE <table> RENAME COLUMN <old> TO <new>   -- metadata-only
    ALTER TABLE <table> RENAME TO <new-table>          -- metadata-only
    ALTER TABLE <table> DROP COLUMN <name>             -- metadata-only
    ALTER TABLE <table> ADD CONSTRAINT <name> CHECK (<sql-bool>)
    ALTER TABLE <child> ADD CONSTRAINT <name> FOREIGN KEY (<cols>)
        REFERENCES <parent> (<cols>)
        [ON DELETE RESTRICT|CASCADE|SET NULL]   -- write-enforced
        [ON UPDATE RESTRICT|CASCADE|SET NULL]   -- (either order)
    ALTER TABLE <table> DROP CONSTRAINT <name>
    ALTER TABLE <table> SET TBLPROPERTIES ('dml.mode' = 'merge-on-read')
    ALTER TABLE <table> UNSET TBLPROPERTIES ('dml.mode')
    DESCRIBE HISTORY <table>
    RESTORE TABLE <table> TO VERSION AS OF <n>
    TRUNCATE TABLE <table>
    DROP TABLE [IF EXISTS] <table>
    OPTIMIZE <table> [CLUSTER BY (cols) | ZORDER BY (cols)
                      | WHERE _kb = n | WHERE _kb IN (n, ...)]
    CREATE BLOOMFILTER INDEX ON TABLE <table> FOR COLUMNS (cols)
        [OPTIONS (bits_per_row = <n>)]
    DROP BLOOMFILTER INDEX ON TABLE <table>
    CREATE MATERIALIZED VIEW <name> AS
        SELECT <keys>, SUM(col) AS out[, ...], COUNT(*) AS n
        FROM <table> GROUP BY <keys>
    REFRESH MATERIALIZED VIEW <name>
    DROP MATERIALIZED VIEW <name>
    VACUUM [RETAIN <n> VERSIONS]
    EXPLAIN DELETE|UPDATE ...   -- dry-run rewrite plan (file skipping)
    EXPLAIN INSERT|MERGE ...    -- dry-run write plan (rows, cast-loss
                                   report, buckets to rewrite)
    <where> := <disj> | <conj>
    <disj> := [(]<conj>[)] OR [(]<conj>[)] [OR ...]   -- top-level OR only
    <conj> := <term> [AND <term>]...
    <term> := col (=|!=|<>|<=|>=|<|>) <literal>
            | col IN (<literal>, ...)
            | col IS [NOT] NULL
    <literal> := number | 'string' ('' escapes a quote)
               | TIMESTAMP 'iso' | DATE 'iso'

The WHERE grammar is exactly the predicate language the file-skipping
layer can prune on — a supported statement is always
candidate-proportional, never a full-table rewrite in disguise: an OR
prunes as the union of its branches' candidates, and ``!=`` drops the
files whose min==max equal the literal. SET right-hand sides are
arbitrary Spark SQL expressions (they run only over matched rows of
candidate files).
"""

from __future__ import annotations

import datetime
import re

_GRAMMAR = (
    "supported DML: DELETE FROM t WHERE <where>; "
    "UPDATE t SET col = expr[, ...] WHERE <where>; "
    "INSERT INTO|OVERWRITE t [(cols)] VALUES (lit, ...), ... | SELECT ...; "
    "MERGE INTO t USING s|(SELECT ...) ON k = k [AND ...] "
    "[WHEN MATCHED [AND cond] THEN UPDATE SET *|UPDATE SET c = expr, ...|DELETE] "
    "[WHEN NOT MATCHED [AND cond] THEN INSERT *|INSERT (cols) VALUES (exprs)] "
    "[WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE|UPDATE SET c = expr, ...] "
    "(conds/exprs are Spark SQL over src.col/tgt.col; no clauses = the "
    "classic upsert pair); "
    "CREATE TABLE [IF NOT EXISTS] t (ddl cols) [CLUSTERED BY (keys) INTO n BUCKETS] | [CLUSTERED BY ...] AS SELECT ...; "
    "BEGIN [TRANSACTION]; <INSERT|MERGE|DELETE|UPDATE>; ...; COMMIT|ROLLBACK "
    "(one atomic multi-table commit); "
    "TRUNCATE TABLE t; "
    "DROP TABLE [IF EXISTS] t; ALTER TABLE t ADD COLUMN c type | "
    "RENAME COLUMN a TO b | DROP COLUMN c | "
    "ADD CONSTRAINT n CHECK (expr) | UNIQUE|PRIMARY KEY (cols) "
    "(write-enforced) | FOREIGN KEY (cols) REFERENCES p (pcols) [ON DELETE RESTRICT|CASCADE|SET NULL] [ON UPDATE RESTRICT|CASCADE|SET NULL] "
    "(write-enforced, RESTRICT; p needs UNIQUE/PK on pcols) | "
    "DROP CONSTRAINT n | "
    "SET|UNSET TBLPROPERTIES ('k' [= 'v']) | "
    "ALTER COLUMN c [SET DATA] TYPE t [REBUILD] (metadata-only "
    "widening; REBUILD re-places bucket keys / re-indexes bloom "
    "columns instead of refusing) | "
    "CLUSTERED BY (keys) INTO m BUCKETS (online re-bucketing); "
    "OPTIMIZE t [CLUSTER BY (cols) | ZORDER BY (cols)]; "
    "CREATE BLOOMFILTER INDEX ON TABLE t FOR COLUMNS (cols) "
    "[OPTIONS (bits_per_row = n)]; DROP BLOOMFILTER INDEX ON TABLE t; "
    "CREATE MATERIALIZED VIEW v AS SELECT keys, SUM(c) AS out, "
    "COUNT(*) AS n FROM t GROUP BY keys; REFRESH|DROP MATERIALIZED "
    "VIEW v; "
    "SHOW CREATE TABLE t (round-trippable definition); "
    "VACUUM [RETAIN n VERSIONS] [DRY RUN]; "
    "EXPLAIN DELETE|UPDATE (metadata-only rewrite plan) | INSERT|MERGE (write plan: rows, cast-loss report, buckets); "
    "<where> = <conj> [OR <conj>]... (parens allowed around each OR "
    "branch); <conj> = col op literal [AND ...] with op in "
    "(= != <> < <= > >=), col IN (lit, ...), col IS [NOT] NULL; "
    "literals: number, 'string' ('' escapes a quote), "
    "TIMESTAMP 'iso', DATE 'iso'"
)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parentheses and single quotes."""
    out, depth, quote, cur = [], 0, False, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == "'":
                quote = False
            continue
        if ch == "'":
            quote = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    # EMPTY segments are kept: `VALUES (1,,2)` or a dangling comma must
    # surface to the caller's validation (each raises on the empty
    # piece), never be silently elided into a well-formed statement
    return [x.strip() for x in out]


def _split_keyword(s: str, keyword: str) -> list[str]:
    """Split ``s`` on the (case-insensitive) bare ``keyword`` token,
    respecting single quotes and parentheses — ``'SMALL AND SHINY'``
    must never be cut at its AND."""
    parts, depth, quote, cur = [], 0, False, []
    i, n = 0, len(s)
    kw = keyword.upper()
    while i < n:
        ch = s[i]
        if quote:
            cur.append(ch)
            if ch == "'":
                quote = False
            i += 1
            continue
        if ch == "'":
            quote = True
            cur.append(ch)
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if (
            depth == 0
            and s[i : i + len(kw)].upper() == kw
            and (i == 0 or s[i - 1].isspace())
            and (
                i + len(kw) >= n or s[i + len(kw)].isspace()
            )
        ):
            parts.append("".join(cur))
            cur = []
            i += len(kw)
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    # keep empties: a dangling/doubled keyword (`a = 1 OR`, `AND AND`)
    # must reach the caller's refusal path, not vanish
    return [p.strip() for p in parts]


def _parse_literal(tok: str):
    tok = tok.strip()
    m = re.fullmatch(r"TIMESTAMP\s+'([^']+)'", tok, re.I)
    if m:
        return datetime.datetime.fromisoformat(m.group(1))
    m = re.fullmatch(r"DATE\s+'([^']+)'", tok, re.I)
    if m:
        return datetime.date.fromisoformat(m.group(1))
    # '' inside a quoted string is an escaped single quote (SQL
    # standard), so O'Brien is expressible as 'O''Brien'
    m = re.fullmatch(r"'((?:[^']|'')*)'", tok)
    if m:
        return m.group(1).replace("''", "'")
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        raise ValueError(f"unparseable literal {tok!r}; {_GRAMMAR}") from None


def _show_create(catalog, table: str) -> str:
    """Reconstruct the statements that would recreate ``table``'s
    logical definition — columns (with IDENTITY / GENERATED ALWAYS AS
    clauses), bucket layout, constraints (CHECK and UNIQUE), and table
    properties — from the manifest alone (zero data reads). The output
    is valid front-door DML: executing it against a fresh catalog
    yields the same definition (round-trip pinned in tests)."""
    if not catalog.exists(table):
        raise FileNotFoundError(f"no table {table!r}")
    schema = catalog.logical_schema(table)
    ident = getattr(catalog, "identity_spec", lambda _t: None)(table)
    gen = getattr(catalog, "generated_spec", lambda _t: None)(table) or {}
    cols = []
    for f in schema.fields:
        if f.name == "_kb":
            continue
        piece = f"{f.name} {f.dataType.simpleString().upper()}"
        if ident is not None and f.name == ident["col"]:
            piece += " GENERATED ALWAYS AS IDENTITY"
        elif f.name in gen:
            piece += f" GENERATED ALWAYS AS ({gen[f.name]})"
        cols.append(piece)
    ddl = f"CREATE TABLE {table} (" + ", ".join(cols) + ")"
    meta = getattr(catalog, "bucket_meta", lambda _t: None)(table)
    if meta is not None:
        ddl += (
            f" CLUSTERED BY ({', '.join(meta['key_cols'])}) "
            f"INTO {meta['num_buckets']} BUCKETS"
        )
    stmts = [ddl]
    for name, expr in catalog.checks(table).items():
        if isinstance(expr, dict) and "unique" in expr:
            stmts.append(
                f"ALTER TABLE {table} ADD CONSTRAINT {name} "
                f"UNIQUE ({', '.join(expr['unique'])})"
            )
        elif isinstance(expr, dict) and "fk" in expr:
            fk = expr["fk"]
            act = fk.get("on_delete", "restrict")
            uact = fk.get("on_update", "restrict")
            stmts.append(
                f"ALTER TABLE {table} ADD CONSTRAINT {name} "
                f"FOREIGN KEY ({', '.join(fk['cols'])}) REFERENCES "
                f"{fk['parent']} ({', '.join(fk['parent_cols'])})"
                + ("" if act == "restrict" else f" ON DELETE {act.upper()}")
                + ("" if uact == "restrict" else f" ON UPDATE {uact.upper()}")
            )
        else:
            stmts.append(
                f"ALTER TABLE {table} ADD CONSTRAINT {name} "
                f"CHECK ({expr})"
            )
    for k, v in sorted(catalog.table_properties(table).items()):
        stmts.append(
            f"ALTER TABLE {table} SET TBLPROPERTIES ('{k}' = '{v}')"
        )
    return ";\n".join(stmts)


def _strip_generated(ddl: str) -> tuple[str, dict[str, str]]:
    """Extract every ``<col> <type> GENERATED ALWAYS AS (expr)`` clause
    from a CREATE column list: returns the DDL with the clauses removed
    (plain ``<col> <type>`` remains for the parser) and ``{col: expr}``.
    The expression's parentheses balance by scan, so nesting depth is
    unbounded (regex alternation caps it)."""
    generated: dict[str, str] = {}
    head = re.compile(
        r"(\w+)\s+([A-Za-z]\w*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
        r"\s+GENERATED\s+ALWAYS\s+AS\s*\(",
        re.I,
    )
    out = ddl
    while True:
        m = head.search(out)
        if not m:
            return out, generated
        depth, i = 1, m.end()
        while i < len(out) and depth:
            if out[i] == "(":
                depth += 1
            elif out[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(
                f"unbalanced parentheses in GENERATED ALWAYS AS "
                f"clause of {m.group(1)!r}; {_GRAMMAR}"
            )
        generated[m.group(1)] = out[m.end(): i - 1].strip()
        out = out[: m.start()] + f"{m.group(1)} {m.group(2)}" + out[i:]


def _strip_outer_parens(s: str) -> str:
    """Remove parentheses that wrap the WHOLE expression (quote-aware;
    never touches parens that close before the end, e.g. ``(a) AND
    (b)`` or an IN list)."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth, quote = 0, False
        wraps = True
        for i, ch in enumerate(s):
            if quote:
                if ch == "'":
                    quote = False
                continue
            if ch == "'":
                quote = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    wraps = False
                    break
        if not wraps or depth != 0:
            break
        s = s[1:-1].strip()
    return s


def _parse_conj(clause: str) -> list[tuple]:
    preds: list[tuple] = []
    for part in _split_keyword(clause.strip(), "AND"):
        part = _strip_outer_parens(part)
        if len(_split_keyword(part, "OR")) > 1:
            # OR below an AND: not the supported top-level-OR shape —
            # refuse rather than mis-evaluate precedence
            raise ValueError(f"unsupported WHERE term {part!r}; {_GRAMMAR}")
        m = re.fullmatch(r"(\w+)\s+IS\s+NOT\s+NULL", part, re.I)
        if m:
            preds.append((m.group(1), "not_null"))
            continue
        m = re.fullmatch(r"(\w+)\s+IS\s+NULL", part, re.I)
        if m:
            preds.append((m.group(1), "is_null"))
            continue
        m = re.fullmatch(r"(\w+)\s+IN\s*\((.+)\)", part, re.I | re.S)
        if m:
            preds.append(
                (
                    m.group(1),
                    "in",
                    [_parse_literal(v) for v in _split_top(m.group(2))],
                )
            )
            continue
        m = re.fullmatch(r"(\w+)\s*(<=|>=|<>|!=|=|<|>)\s*(.+)", part, re.S)
        if m:
            op = "!=" if m.group(2) == "<>" else m.group(2)
            preds.append((m.group(1), op, _parse_literal(m.group(3))))
            continue
        raise ValueError(f"unsupported WHERE term {part!r}; {_GRAMMAR}")
    return preds


def parse_where(clause: str):
    """The WHERE clause as the catalog's predicate shape: a flat list
    of ``(col, op[, value])`` tuples for one conjunction, or — when the
    clause holds top-level ORs — a LIST of such conjunctions (the DNF
    the catalog's delete_where/update_where consume; candidate files
    are the union over branches, so pruning survives the OR)."""
    stripped = _strip_outer_parens(clause)
    disjuncts = _split_keyword(stripped, "OR")
    if len(disjuncts) > 1:
        return [_parse_conj(_strip_outer_parens(d)) for d in disjuncts]
    return _parse_conj(stripped)


def _parse_values_literal(tok: str):
    """A VALUES-row literal: the WHERE literal grammar plus NULL and
    TRUE/FALSE (meaningless in a WHERE conjunction, required in an
    INSERT row)."""
    t = tok.strip()
    if t.upper() == "NULL":
        return None
    if t.upper() == "TRUE":
        return True
    if t.upper() == "FALSE":
        return False
    return _parse_literal(t)


def _stringify_values_literal(v) -> str | None:
    """A VALUES literal as the string Spark's OWN SQL INSERT would
    store in a string column (and castable to the typed column
    otherwise): booleans lowercase ('true'/'false' — Python str() says
    'True', a silent divergence for STRING targets), datetimes as
    their space-separated ISO form (str() of datetime/date already is),
    everything else via str()."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _target_schema(catalog, table: str):
    """The committed schema of an INSERT/MERGE target (must exist: a
    typed table can't be conjured from untyped literals)."""
    if not catalog.exists(table):
        raise ValueError(
            f"INSERT/MERGE target table {table!r} does not exist in the "
            "catalog; create it with a typed write first"
        )
    # logical view: renamed/dropped columns resolve the way users see
    # them (the writers translate back to physical staging names)
    get = getattr(
        catalog,
        "logical_schema",
        getattr(catalog, "_stored_schema", lambda _t: None),
    )
    stored = get(table)
    return stored if stored is not None else catalog.read(table).schema


def _cast_loss_counts(df, types, cols: list[str]) -> tuple[int, dict]:
    """ONE aggregation pass: the source row count plus, per probed
    column, how many non-NULL values the cast to the target type would
    silently turn NULL. Shared by the refusing probe (real run) and
    the reporting probe (EXPLAIN dry run) so the two can never
    diverge."""
    from pyspark.sql import functions as F

    ncol = "__rows"
    while ncol in cols:
        ncol += "_"
    aggs = [F.count(F.lit(1)).alias(ncol)] + [
        F.sum(
            (
                F.col(c).isNotNull() & F.col(c).cast(types[c]).isNull()
            ).cast("long")
        ).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).first()
    return row[ncol], {c: row[c] or 0 for c in cols}


def _probe_cast_loss(df, types, cols: list[str], verb: str) -> int:
    """Refusing form of the probe: raises on any loss; returns the
    count — validation and the reported row count never cost separate
    evaluations of the source."""
    n, losses = _cast_loss_counts(df, types, cols)
    for c in cols:
        if losses[c]:
            raise ValueError(
                f"{verb} value(s) for column {c!r} do not cast to "
                f"{types[c].simpleString()} ({losses[c]} row(s)) — "
                "refusing to convert them silently"
            )
    return n


def _insert_targets(schema, insert_cols: list[str] | None, df):
    """The INSERT column-mapping validation, shared by the real run
    (:func:`_align_to_schema`) and the EXPLAIN dry run so they can
    never diverge: resolves the positional target list against the
    schema and refuses unknown columns / width mismatches. Returns
    ``(names, targets, types)``."""
    names = [f.name for f in schema.fields]
    targets = insert_cols if insert_cols is not None else names
    unknown = [c for c in targets if c not in names]
    if unknown:
        raise ValueError(
            f"INSERT column(s) {unknown!r} not in target table; {_GRAMMAR}"
        )
    if len(df.columns) != len(targets):
        raise ValueError(
            f"INSERT source has {len(df.columns)} column(s) for "
            f"{len(targets)} target column(s); {_GRAMMAR}"
        )
    return names, targets, {f.name: f.dataType for f in schema.fields}


def _align_to_schema(catalog, df, schema, insert_cols: list[str] | None):
    """Project an INSERT source onto the target schema: positional
    rename (SQL INSERT semantics) onto ``insert_cols`` (or the full
    schema), NULL-fill for omitted columns, and a cast-loss probe — a
    value the target type cannot hold must refuse, never silently
    become NULL (same contract as update_where's SET probe). Returns
    ``(aligned_df, source_row_count)``."""
    from pyspark.sql import functions as F

    names, targets, types = _insert_targets(schema, insert_cols, df)
    renamed = df.toDF(*targets)
    n = _probe_cast_loss(renamed, types, list(targets), "INSERT")
    aligned = renamed.select(
        *[
            F.col(c).cast(types[c]).alias(c)
            if c in targets
            else F.lit(None).cast(types[c]).alias(c)
            for c in names
        ]
    )
    return aligned, n


def _align_merge_source(catalog, src, schema):
    """Type-align a MERGE source to the target's committed schema: a
    shared column whose source type differs is cast-probed (refusal on
    loss — Spark's implicit when/union coercion would otherwise
    silently REWRITE the target column's type, e.g. DOUBLE -> STRING)
    and cast. Returns ``(aligned_src, source_row_count)`` — the count
    rides the probe's single pass."""
    from pyspark.sql import functions as F

    types = {f.name: f.dataType for f in schema.fields}
    mismatched = [
        c
        for c in src.columns
        if c in types and src.schema[c].dataType != types[c]
    ]
    n = _probe_cast_loss(src, types, mismatched, "MERGE")
    out = src
    for c in mismatched:
        out = out.withColumn(c, F.col(c).cast(types[c]))
    return out, n


def _resolve_source(catalog, spec: str):
    """A MERGE USING source: a catalog table (fresh manifest read), a
    registered view, or a parenthesized SELECT."""
    spec = spec.strip()
    m = re.fullmatch(r"(\w+)", spec)
    if m:
        name = m.group(1)
        if catalog.exists(name):
            return catalog.read(name)
        return catalog.spark.table(name)
    m = re.fullmatch(r"\((.+)\)\s*(?:AS\s+)?(\w+)?", spec, re.I | re.S)
    if m and re.match(r"\s*SELECT\b", m.group(1), re.I):
        return catalog.spark.sql(m.group(1))
    raise ValueError(f"unsupported MERGE source {spec!r}; {_GRAMMAR}")


def _parse_on_keys(on_clause: str) -> list[str]:
    """The MERGE join keys: a conjunction of ``[qual.]k = [qual.]k``
    equalities over the SAME column name on both sides (the shape
    merge_upsert's key_cols expresses)."""
    keys = []
    for term in _split_keyword(on_clause.strip(), "AND"):
        term = _strip_outer_parens(term)
        m = re.fullmatch(
            r"(?:(\w+)\.)?(\w+)\s*=\s*(?:(\w+)\.)?(\w+)", term
        )
        if not m or m.group(2) != m.group(4) or (
            m.group(1) and m.group(3) and m.group(1) == m.group(3)
        ):
            raise ValueError(
                f"unsupported MERGE ON term {term!r} (need [q.]k = [q.]k "
                f"with the same column name on both sides); {_GRAMMAR}"
            )
        keys.append(m.group(2))
    return keys




def _parse_update_tail(tail: str) -> tuple[dict, str]:
    """The shared UPDATE grammar: ``<assignments> WHERE <where>`` ->
    (sets, where). One body for the real run and the EXPLAIN dry run,
    so a grammar fix can never diverge the two."""
    # quote/paren-aware WHERE split: a SET expression's string
    # literal may itself contain the word WHERE
    pieces = _split_keyword(tail, "WHERE")
    if len(pieces) != 2:
        raise ValueError(f"unsupported DML shape; {_GRAMMAR}")
    assigns, where = pieces
    sets: dict[str, str] = {}
    for assign in _split_top(assigns):
        col, eq, expr = assign.partition("=")
        if not eq or not col.strip() or not expr.strip():
            raise ValueError(f"bad SET assignment {assign!r}; {_GRAMMAR}")
        sets[col.strip()] = expr.strip()
    return sets, where


def _dml_mode(catalog, table: str) -> str:
    """The table's recorded DML routing: 'dv' (merge-on-read deletion
    vectors) when ``dml.mode = merge-on-read`` is set, else the
    copy-on-write default."""
    props = getattr(catalog, "table_properties", lambda _t: {})(table)
    return "dv" if props.get("dml.mode") == "merge-on-read" else "rewrite"


def _explain_rewrite(catalog, table: str, preds, verb: str, extra=None):
    """Dry-run rewrite plan: the file-skipping outcome a
    DELETE/UPDATE would see, computed from sidecar metadata alone — no
    data is read, nothing commits. ``files_candidates`` would be
    rewritten, ``files_carried`` hardlinked; ``rows_provably_matching``
    counts rows of files the stats PROVE all-match (the certain part of
    the blast radius), ``files_undecidable`` must be read to know."""
    from gcp_datalake_pipeline_spark import blooms, filestats

    if not catalog.exists(table):
        raise FileNotFoundError(f"no table {table!r}")
    dnf = catalog._as_dnf(preds)
    # sidecars speak physical names; the dry run must prune the way
    # the real DML will after a RENAME COLUMN
    cmap = getattr(catalog, "colmap", lambda _t: None)(table)
    if cmap:
        dnf = catalog._phys_dnf(cmap, dnf)
    total = candidates = counted = undecidable = 0
    for d in catalog._data_dirs(table):
        stats = blooms.attach_blooms(filestats.read_dir_stats(d), d, dnf)
        files = catalog._dir_parquet_files(d)
        total += len(files)
        candidates += len(filestats.prune_files_dnf(stats, files, dnf))
        rows, unknown = filestats.classify_files_dnf(stats, files, dnf)
        counted += rows
        undecidable += len(unknown)
    return {
        "explain": verb,
        "table": table,
        "files_total": total,
        "files_candidates": candidates,
        "files_carried": total - candidates,
        "rows_provably_matching": counted,
        "files_undecidable": undecidable,
        **(extra or {}),
    }


def _explain(catalog, inner: str):
    """EXPLAIN routing: DELETE/UPDATE get the dry-run rewrite plan;
    other engine-routed verbs refuse loudly (Spark would misparse them
    against ITS catalog); anything else (EXPLAIN SELECT and friends)
    returns None for spark.sql."""
    s = inner.strip().rstrip(";").strip()
    m = re.fullmatch(r"DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+)", s, re.I | re.S)
    if m:
        # mirror the real run exactly: same refusals, same error types
        _refuse_matview_target(catalog, m.group(1), "DELETE")
        extra = {"mode": _dml_mode(catalog, m.group(1))}
        # the real run fans ON DELETE CASCADE/SET NULL out to child
        # tables — a dry run that omitted that would under-report the
        # blast radius (metadata-only: one manifest read)
        acts = [
            {"child": c, "action": s["on_delete"]}
            for c, _n, s in getattr(
                catalog, "_fk_children", lambda _t: []
            )(m.group(1))
            if s.get("on_delete", "restrict") != "restrict"
        ]
        if acts:
            extra["fk_delete_actions"] = acts
        return _explain_rewrite(
            catalog, m.group(1), parse_where(m.group(2)), "DELETE",
            extra=extra,
        )
    m = re.fullmatch(r"UPDATE\s+(\w+)\s+SET\s+(.+)", s, re.I | re.S)
    if m:
        table = m.group(1)
        _refuse_matview_target(catalog, table, "UPDATE")
        if not catalog.exists(table):
            raise FileNotFoundError(f"no table {table!r}")
        sets, where = _parse_update_tail(m.group(2))
        names = {f.name for f in _target_schema(catalog, table).fields}
        missing = [c for c in sets if c not in names]
        if missing:
            raise ValueError(
                f"UPDATE SET column(s) {missing!r} not in {table!r}; "
                f"{_GRAMMAR}"
            )
        # mirror the real run: SET on _kb refuses (derived column);
        # SET on a bucket KEY is allowed and moves the matched rows to
        # their recomputed _kb placement — the dry run reports which
        # keys trigger the re-placement so the plan is honest about it
        bmeta = getattr(catalog, "bucket_meta", lambda _t: None)(table)
        rebucket: list[str] = []
        if bmeta is not None:
            if "_kb" in sets:
                raise ValueError(
                    "'_kb' is the reserved bucket-layout column; SET "
                    "the bucket KEY columns and placement follows"
                )
            rebucket = sorted(set(bmeta["key_cols"]) & set(sets))
        extra = {"set_columns": list(sets), "mode": _dml_mode(catalog, table)}
        if rebucket:
            extra["rebucket_keys"] = rebucket
        # mirror the real run: ON UPDATE CASCADE/SET NULL legs fan out
        # to child tables (and refuse on the merge-on-read path) — a
        # dry run omitting either would misreport the blast radius
        uacts = [
            {
                "child": c,
                "action": spec["on_update"],
                "column": spec["parent_cols"][0],
            }
            for c, _n, spec in getattr(
                catalog, "_fk_children", lambda _t: []
            )(table)
            if spec.get("on_update", "restrict") != "restrict"
            and spec["parent_cols"][0] in sets
        ]
        if uacts:
            if extra["mode"] == "dv":
                raise RuntimeError(
                    "merge-on-read UPDATE cannot run ON UPDATE "
                    "CASCADE/SET NULL legs atomically (deletion "
                    "vectors publish outside the staged-dir "
                    "protocol); use copy-on-write mode for "
                    "key-changing updates"
                )
            extra["fk_update_actions"] = uacts
        return _explain_rewrite(
            catalog, table, parse_where(where), "UPDATE", extra
        )
    m = _INSERT_RE.fullmatch(s)
    if m:
        # dry-run the write path: same grammar body and the same
        # single-pass probe as the real INSERT, but cast losses are
        # REPORTED per column instead of refusing — nothing is staged,
        # nothing commits (version-stability pinned by tests)
        overwrite = m.group(1).upper() == "OVERWRITE"
        table = m.group(2)
        cols, src, schema = _parse_insert_source(
            catalog, table, m.group(3), m.group(4).strip(), overwrite
        )
        # bucketed targets take the LOGICAL columns (same as the real
        # run — the engine computes _kb)
        if getattr(catalog, "bucket_meta", lambda _t: None)(table):
            from pyspark.sql import types as T

            schema = T.StructType(
                [f for f in schema.fields if f.name != "_kb"]
            )
        # engine-computed columns: the same default-exclusion (and the
        # same explicit-supply refusal) as the real _insert_computed —
        # a dry run must never diverge from the run it previews
        ident = getattr(catalog, "identity_spec", lambda _t: None)(table)
        gen = getattr(catalog, "generated_spec", lambda _t: None)(table)
        computed = set(gen or ()) | (
            {ident["col"]} if ident is not None else set()
        )
        if computed:
            from pyspark.sql import types as T

            hit = sorted(computed & set(cols or ()))
            if hit:
                raise ValueError(
                    f"column(s) {hit!r} of {table!r} are GENERATED "
                    f"ALWAYS and cannot be inserted explicitly; "
                    f"{_GRAMMAR}"
                )
            # the real run (_insert_computed) refuses computed columns
            # on bucketed targets — the dry run must refuse identically,
            # not report a plan for an INSERT the real run rejects
            if getattr(catalog, "bucket_meta", lambda _t: None)(table):
                raise ValueError(
                    f"INSERT with engine-computed columns into the "
                    f"bucketed table {table!r} is not supported; drop "
                    f"the bucket layout or the computed columns; "
                    f"{_GRAMMAR}"
                )
            if cols is None:
                cols = [
                    n for n in schema.fieldNames() if n not in computed
                ]
            schema = T.StructType(
                [f for f in schema.fields if f.name not in computed]
            )
        _names, targets, types = _insert_targets(schema, cols, src)
        n, losses = _cast_loss_counts(src.toDF(*targets), types, targets)
        return {
            "explain": "INSERT",
            "table": table,
            "mode": "overwrite" if overwrite else "into",
            "rows": n,
            "cast_loss": {c: v for c, v in losses.items() if v},
            "would_refuse": any(losses.values()),
        }
    m = _MERGE_RE.fullmatch(s)
    if m:
        table, rest = m.group(1), m.group(2)
        source_spec, keys, clauses, schema, meta = _parse_merge(
            catalog, table, rest
        )
        src = _resolve_source(catalog, source_spec)
        shape = _merge_shape(clauses)
        shape, computed = _merge_computed(catalog, table, shape)
        # mirror the real run's refusal: generalized clause sets need
        # the transactional engine — a dry run must not report a plan
        # for a statement the real run rejects
        if shape == "merge_when" and getattr(
            catalog, "merge_when", None
        ) is None:
            raise ValueError(
                "conditional / NOT MATCHED BY SOURCE MERGE clauses "
                "need a transactional catalog (ingest --atomic); "
                f"{_GRAMMAR}"
            )
        types = {f.name: f.dataType for f in schema.fields}
        # same columns the real run's _align_merge_source would probe:
        # type-mismatched shared columns (keys only when no star clause
        # carries whole source rows into the target)
        need_full = shape == "upsert" or (
            shape == "merge_when" and _merge_star(clauses)
        )
        if shape == "merge_when":
            _merge_when_mirror_guards(
                table, schema, computed, src.columns, keys, meta, clauses
            )
        probe_cols = [
            c
            for c in src.columns
            if c in types
            and (need_full or c in keys)
            and src.schema[c].dataType != types[c]
        ]
        n, losses = _cast_loss_counts(src, types, probe_cols)
        out = {
            "explain": "MERGE",
            "table": table,
            "mode": shape,
            "source_rows": n,
            "cast_loss": {c: v for c, v in losses.items() if v},
            "would_refuse": any(losses.values()),
        }
        if shape == "merge_when":
            out["clauses"] = {
                k: v for k, v in clauses.items() if v is not None
            }
        if meta is not None:
            nb = meta["num_buckets"]
            if clauses["by_source"] is not None:
                # every target row must prove a source match — the
                # full-sync clause reads and rewrites ALL buckets
                out["buckets_rewritten"] = nb
                out["buckets_total"] = nb
                out["rewrite"] = (
                    "full-sync (NOT MATCHED BY SOURCE scans the whole "
                    "target)"
                )
            else:
                # the write blast radius under the bucketed route:
                # which key-hash buckets the source forces a re-stage of
                from gcp_datalake_pipeline_spark.storage import kb_col

                out["buckets_rewritten"] = (
                    src.select(*keys)
                    .dropDuplicates(keys)
                    .select(kb_col(keys, nb).alias("_kb"))
                    .distinct()
                    .count()
                )
                out["buckets_total"] = nb
        else:
            out["rewrite"] = "full-table (no _kb bucket layout recorded)"
        return out
    if re.match(
        r"(DELETE|UPDATE|INSERT|MERGE|OPTIMIZE|VACUUM|TRUNCATE)\b"
        r"|CREATE\s+(TABLE|MATERIALIZED|BLOOMFILTER)\b"
        r"|DROP\s+(TABLE|MATERIALIZED|BLOOMFILTER)\b|ALTER\s+TABLE\b"
        r"|REFRESH\s+MATERIALIZED\b",
        s,
        re.I,
    ):
        raise ValueError(
            "EXPLAIN supports well-formed DELETE/UPDATE/INSERT/MERGE "
            f"(the rewrite and write planners); {_GRAMMAR}"
        )
    return None


_INSERT_RE = re.compile(
    r"INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s*(?:\(([^)]*)\))?\s+(.+)",
    re.I | re.S,
)
_MERGE_RE = re.compile(r"MERGE\s+INTO\s+(\w+)\s+USING\s+(.+)", re.I | re.S)


def _insert_computed(
    catalog, table, cols, src, schema, ident, gen, overwrite
):
    """INSERT into a table with engine-computed columns — GENERATED
    ALWAYS AS IDENTITY and/or GENERATED ALWAYS AS (expr):

    - a computed column may never be supplied (Delta semantics — a
      loud refusal) and is omitted from the default positional target
      list;
    - expression columns evaluate over the inserted row's OTHER
      columns in one narrow select (pure codegen, zero shuffles);
    - identity ids mint from the recorded high-water mark via the
      sharded deterministic ranker (assign_dense_ids — no single-task
      window) over the PROVIDED values only, and the advanced mark
      commits ATOMICALLY with the rows, expect-checked, so concurrent
      identity INSERTs can never mint overlapping ranges; the mark
      only grows (ids never reuse, even across deletes or INSERT
      OVERWRITE)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    icol = ident["col"] if ident else None
    computed = set(gen) | ({icol} if icol else set())
    if cols is not None:
        hit = sorted(computed & set(cols))
        if hit:
            raise ValueError(
                f"column(s) {hit!r} of {table!r} are GENERATED ALWAYS "
                f"and cannot be inserted explicitly; omit them (the "
                f"engine computes them); {_GRAMMAR}"
            )
    if getattr(catalog, "bucket_meta", lambda _t: None)(table):
        raise ValueError(
            f"INSERT with engine-computed columns into the bucketed "
            f"table {table!r} is not supported; drop the bucket layout "
            f"or the computed columns; {_GRAMMAR}"
        )
    if cols is None:
        cols = [n for n in schema.fieldNames() if n not in computed]
    narrow = T.StructType(
        [f for f in schema.fields if f.name not in computed]
    )
    aligned, n = _align_to_schema(catalog, src, narrow, cols)
    types = {f.name: f.dataType for f in schema.fields}
    if gen:
        aligned = aligned.select(
            *aligned.columns,
            *[
                F.expr(expr).cast(types[c]).alias(c)
                for c, expr in gen.items()
            ],
        )
    # inside a BEGIN block a transaction is already open: stage into
    # it instead of opening a nested one, and mint identity ids from
    # the BLOCK's staged high-water mark (a second identity INSERT in
    # the same block continues the range; the commit-time expect stays
    # anchored to the mark the block started from)
    in_block = getattr(catalog, "_pending", None) is not None
    if icol is not None:
        from gcp_datalake_pipeline_spark.operators.dims import (
            assign_dense_ids,
        )

        start = int(ident["next"])
        expect = start
        if in_block:
            staged = catalog._intents.get(table, {}).get("identity")
            if staged is not None:
                start = int(staged["next"])
                # None = the table was CREATEd in this very block (the
                # commit-time CAS then expects "no identity existed")
                expect = staged["expect_next"]
        value_cols = [c for c in aligned.columns if c not in computed]
        # assign_dense_ids yields start + 1-based rank: anchor one below
        aligned = assign_dense_ids(
            aligned, value_cols, icol, start=start - 1
        )
    assigned = aligned.select(*[f.name for f in schema.fields])
    verb = "overwritten" if overwrite else "inserted"

    def _stage():
        if overwrite:
            catalog.overwrite(assigned, table)
        else:
            catalog.append(assigned, table)
        if icol is not None:
            catalog._intents[table]["identity"] = {
                "col": icol, "next": start + n, "expect_next": expect,
            }

    if in_block:
        _stage()
    else:
        with catalog.transaction(f"insert-computed-{table}"):
            _stage()
    out = {"table": table, verb: n}
    if icol is not None:
        out["identity_range"] = [start, start + n - 1] if n else []
    return out


def _parse_insert_source(catalog, table, col_list, tail, overwrite):
    """The INSERT grammar's shared body (real run AND the EXPLAIN dry
    run — a grammar fix can never diverge the two): refusals, column
    list, and the source frame (VALUES literals as an all-string frame
    the cast probe types, or an evaluated SELECT). Returns
    ``(cols, src_df, target_schema)``."""
    _refuse_matview_target(
        catalog, table, "INSERT OVERWRITE" if overwrite else "INSERT"
    )
    cols = [c.strip() for c in col_list.split(",")] if col_list else None
    schema = _target_schema(catalog, table)
    if re.match(r"SELECT\b", tail, re.I):
        src = catalog.spark.sql(tail)
    elif re.match(r"VALUES\b", tail, re.I):
        rows = []
        for row_txt in _split_top(tail[len("VALUES"):]):
            rm = re.fullmatch(r"\((.+)\)", row_txt.strip(), re.S)
            if not rm:
                raise ValueError(f"bad VALUES row {row_txt!r}; {_GRAMMAR}")
            rows.append(
                tuple(
                    _parse_values_literal(v)
                    for v in _split_top(rm.group(1))
                )
            )
        widths = {len(r) for r in rows}
        if len(widths) != 1:
            raise ValueError(
                f"VALUES rows disagree on width ({sorted(widths)}); "
                f"{_GRAMMAR}"
            )
        # literal rows land as an all-string frame (round-trippable
        # for every literal the grammar produces); the cast probe in
        # _align_to_schema then enforces the target types exactly
        # like the SELECT path — a non-castable literal refuses
        width = widths.pop()
        src = catalog.spark.createDataFrame(
            [
                tuple(_stringify_values_literal(v) for v in r)
                for r in rows
            ],
            ", ".join(f"_c{i} string" for i in range(width)),
        )
    else:
        raise ValueError(f"unsupported DML shape; {_GRAMMAR}")
    return cols, src, schema


_WHEN_RE = re.compile(
    r"(NOT\s+)?MATCHED(\s+BY\s+SOURCE)?(?:\s+AND\s+(.+?))?\s+THEN\s+"
    r"(UPDATE\s+SET\s+.+|INSERT\s*\*|INSERT\s*\(.+|DELETE)\s*$",
    re.I | re.S,
)


def _parse_when_action(act_txt: str) -> dict:
    """One WHEN clause's action tail: ``UPDATE SET *`` / ``UPDATE SET
    a = expr, ...`` / ``INSERT *`` / ``INSERT (cols) VALUES (exprs)``
    / ``DELETE`` — parsed into the merge_when clause fields."""
    act = act_txt.strip()
    if re.fullmatch(r"DELETE", act, re.I):
        return {"action": "delete"}
    if re.fullmatch(r"UPDATE\s+SET\s+\*", act, re.I):
        return {"action": "update", "sets": None}
    m = re.fullmatch(r"UPDATE\s+SET\s+(.+)", act, re.I | re.S)
    if m:
        sets: dict[str, str] = {}
        for assign in _split_top(m.group(1)):
            col, eq, expr = assign.partition("=")
            col = col.strip()
            if not eq or not re.fullmatch(r"\w+", col) or not expr.strip():
                raise ValueError(
                    f"bad MERGE SET assignment {assign.strip()!r}; "
                    f"{_GRAMMAR}"
                )
            if col in sets:
                raise ValueError(
                    f"duplicate MERGE SET column {col!r}; {_GRAMMAR}"
                )
            sets[col] = expr.strip()
        return {"action": "update", "sets": sets}
    if re.fullmatch(r"INSERT\s*\*", act, re.I):
        return {"action": "insert", "cols": None, "vals": None}
    m = re.fullmatch(
        r"INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.+)\)", act, re.I | re.S
    )
    if m:
        cols = [c.strip() for c in m.group(1).split(",") if c.strip()]
        vals = [v.strip() for v in _split_top(m.group(2))]
        if not cols or len(cols) != len(vals):
            raise ValueError(
                f"MERGE INSERT column/value lists disagree "
                f"({len(cols)} vs {len(vals)}); {_GRAMMAR}"
            )
        if len(set(cols)) != len(cols):
            raise ValueError(
                f"duplicate MERGE INSERT column; {_GRAMMAR}"
            )
        return {"action": "insert", "cols": cols, "vals": vals}
    raise ValueError(
        f"unsupported MERGE WHEN action {act!r}; {_GRAMMAR}"
    )


def _parse_when_clauses(whens) -> dict:
    """The MERGE WHEN clause set: at most one each of MATCHED (UPDATE
    SET */col-level / DELETE), NOT MATCHED (INSERT */(cols) VALUES),
    NOT MATCHED BY SOURCE (DELETE / col-level UPDATE SET), each with
    an optional ``AND <cond>`` over ``src.col`` / ``tgt.col``.
    Returns ``{"matched"|"not_matched"|"by_source": {...} | None}``."""
    clauses: dict = {"matched": None, "not_matched": None, "by_source": None}
    for w in whens:
        m = _WHEN_RE.fullmatch(w.strip())
        if not m:
            raise ValueError(
                f"unsupported MERGE WHEN clause {w.strip()!r}; {_GRAMMAR}"
            )
        neg, bys, cond, act_txt = m.groups()
        if bys and not neg:
            raise ValueError(
                f"'MATCHED BY SOURCE' is not a MERGE clause (did you "
                f"mean NOT MATCHED BY SOURCE?); {_GRAMMAR}"
            )
        kind = "by_source" if bys else ("not_matched" if neg else "matched")
        spec = _parse_when_action(act_txt)
        allowed = {
            "matched": {"update", "delete"},
            "not_matched": {"insert"},
            "by_source": {"delete", "update"},
        }[kind]
        label = (
            "NOT MATCHED BY SOURCE" if bys
            else ("NOT MATCHED" if neg else "MATCHED")
        )
        if spec["action"] not in allowed:
            raise ValueError(
                f"MERGE WHEN {label} supports "
                f"{sorted(a.upper() for a in allowed)} only "
                f"(got {spec['action'].upper()!r}); {_GRAMMAR}"
            )
        if kind == "by_source" and spec.get("sets") is None and (
            spec["action"] == "update"
        ):
            raise ValueError(
                "WHEN NOT MATCHED BY SOURCE THEN UPDATE needs a "
                f"column-level SET (no source row to SET * from); "
                f"{_GRAMMAR}"
            )
        if clauses[kind] is not None:
            raise ValueError(
                f"duplicate MERGE WHEN {label} clause; {_GRAMMAR}"
            )
        spec["cond"] = cond.strip() if cond else None
        clauses[kind] = spec
    return clauses


def _merge_shape(clauses: dict) -> str:
    """'upsert' / 'merge_delete' (the classic fast paths) or
    'merge_when' (the generalized clause set)."""
    m, i, b = (
        clauses["matched"], clauses["not_matched"], clauses["by_source"],
    )
    if (
        b is None
        and m is not None
        and m.get("action") == "update"
        and m.get("cond") is None
        and m.get("sets") is None
        and i is not None
        and i.get("action") == "insert"
        and i.get("cond") is None
        and i.get("cols") is None
    ):
        return "upsert"
    if (
        b is None
        and i is None
        and m is not None
        and m.get("action") == "delete"
        and m.get("cond") is None
    ):
        return "merge_delete"
    return "merge_when"


def _merge_star(clauses: dict) -> bool:
    """True when a star clause (UPDATE SET * / INSERT *) carries whole
    source rows into the target — the shapes needing full source-schema
    alignment."""
    m, i = clauses["matched"], clauses["not_matched"]
    return bool(
        (m and m.get("action") == "update" and m.get("sets") is None)
        or (i and i.get("cols") is None)
    )


def _merge_computed(catalog, table, shape: str) -> tuple[str, set]:
    """Engine-computed (GENERATED ALWAYS) columns reroute every WRITING
    merge shape through ``merge_when`` — matched rows must KEEP their
    identity, inserts must MINT from the high-water mark, and generated
    expressions must recompute (the classic upsert would land explicit
    values that bypass the mark — a later INSERT then mints a duplicate
    id). Returns ``(shape, computed_cols)``."""
    ident = getattr(catalog, "identity_spec", lambda _t: None)(table)
    gen = getattr(catalog, "generated_spec", lambda _t: None)(table) or {}
    computed = set(gen) | ({ident["col"]} if ident else set())
    if computed and shape == "upsert":
        shape = "merge_when"
    return shape, computed


def _merge_when_mirror_guards(
    table, schema, computed: set, src_cols, keys, meta, clauses: dict
) -> None:
    """EXPLAIN's mirror of the generalized-merge input refusals — ONE
    shared body (transactions.merge_when_guards) does the checking, so
    the dry run refuses exactly where the real run does."""
    from gcp_datalake_pipeline_spark.transactions import (
        merge_when_guards,
    )

    m, i, b = (
        clauses["matched"], clauses["not_matched"], clauses["by_source"],
    )
    merge_when_guards(
        table,
        [f.name for f in schema.fields if f.name != "_kb"],
        keys,
        computed,
        list(src_cols),
        (m or {}).get("sets"),
        (i or {}).get("cols"),
        (b or {}).get("sets"),
        _merge_star(clauses),
        bool(
            (m and m.get("action") == "update")
            or i
            or (b and b.get("action") == "update")
        ),
        meta is not None,
    )


def _parse_merge(catalog, table, rest):
    """The MERGE grammar's shared body (real run AND EXPLAIN): WHEN
    clause parsing, ON keys, target refusals, bucket-layout key
    check. Returns ``(source_spec, keys, clauses, schema, bucket_meta)``."""
    _refuse_matview_target(catalog, table, "MERGE")
    pieces = _split_keyword(rest, "ON")
    if len(pieces) != 2:
        raise ValueError(f"unsupported DML shape; {_GRAMMAR}")
    source_spec, on_tail = pieces
    when_parts = _split_keyword(on_tail, "WHEN")
    on_clause, raw_whens = when_parts[0], when_parts[1:]
    # a MERGE clause always continues [NOT] MATCHED; any other WHEN is
    # a CASE WHEN inside a condition or SET/VALUES expression — stitch
    # it back onto the clause it belongs to
    whens: list[str] = []
    for w in raw_whens:
        if re.match(r"\s*(NOT\s+)?MATCHED\b", w, re.I):
            whens.append(w)
        elif whens:
            whens[-1] = f"{whens[-1]} WHEN {w}"
        else:
            raise ValueError(
                f"unsupported MERGE WHEN clause {w.strip()!r}; {_GRAMMAR}"
            )
    if whens:
        clauses = _parse_when_clauses(whens)
    else:
        # clause-less MERGE keeps its historical meaning: the full
        # upsert pair
        clauses = {
            "matched": {"action": "update", "cond": None, "sets": None},
            "not_matched": {
                "action": "insert", "cond": None,
                "cols": None, "vals": None,
            },
            "by_source": None,
        }
    keys = _parse_on_keys(on_clause)
    schema = _target_schema(catalog, table)
    names = {f.name for f in schema.fields}
    missing = [k for k in keys if k not in names]
    if missing:
        raise ValueError(
            f"MERGE key(s) {missing!r} not in target table; {_GRAMMAR}"
        )
    # targets carrying the _kb bucket layout route through the
    # partition-pruned merges: only the buckets holding source keys
    # are read and rewritten, everything else hardlink-carries —
    # on a big table this is the difference between Delta MERGE
    # and rewrite-the-lake-per-statement. ON keys must equal the
    # layout's bucket keys (in order — the hash is order-sensitive).
    meta = getattr(catalog, "bucket_meta", lambda _t: None)(table)
    if meta is not None and meta.get("key_cols") not in (None, keys):
        raise ValueError(
            f"MERGE target {table!r} is bucketed on keys "
            f"{meta['key_cols']}; the ON clause must join exactly "
            f"those (got {keys}) — a mismatched merge would turn "
            "updates into silent duplicate inserts"
        )
    return source_spec, keys, clauses, schema, meta


def _refuse_matview_target(catalog, table: str, verb: str) -> None:
    """Materialized views hold maintained aggregate partials; a direct
    write would desynchronize them from the source and every later
    REFRESH would merge correct deltas into a corrupted base (Delta
    refuses this for the same reason). Raises for registered views;
    no-op on catalogs without a view registry."""
    view_spec = getattr(catalog, "view_spec", None)
    if view_spec is not None and view_spec(table) is not None:
        raise ValueError(
            f"{table!r} is a materialized view; {verb} would desync it "
            f"from its source — use REFRESH MATERIALIZED VIEW (or DROP "
            f"MATERIALIZED VIEW and recreate); {_GRAMMAR}"
        )


def _create_clustered(
    catalog,
    if_not_exists,
    table: str,
    keys_txt: str,
    num_buckets: int,
    ddl: str | None = None,
    select: str | None = None,
) -> dict:
    """``CREATE TABLE ... CLUSTERED BY (keys) INTO n BUCKETS`` (the
    Spark/Hive bucketing DDL): the table lands under the engine's
    ``_kb`` key-hash layout from DAY ONE, so INSERTs keep it
    partitioned, OPTIMIZE folds it partition-wise, and MERGE/CDC folds
    rewrite only touched buckets — the 100 TB table-creation shape.
    ``_kb`` joins the schema as the physical placement column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    keys = [k.strip() for k in keys_txt.split(",")]
    if num_buckets < 1:
        raise ValueError(f"INTO {num_buckets} BUCKETS must be >= 1")
    if catalog.exists(table):
        if if_not_exists:
            return {"table": table, "created": False}
        raise ValueError(
            f"CREATE TABLE: {table!r} already exists (use IF NOT "
            f"EXISTS); {_GRAMMAR}"
        )
    if ddl is not None:
        try:
            schema = T.StructType.fromDDL(ddl)
        except Exception as e:
            raise ValueError(
                f"bad CREATE TABLE column list {ddl!r}: {e}; {_GRAMMAR}"
            ) from None
        names = [f.name for f in schema.fields]
        if "_kb" in names:
            raise ValueError(
                "'_kb' is the reserved bucket-placement column; rename "
                f"the column; {_GRAMMAR}"
            )
        missing = [k for k in keys if k not in names]
        if missing:
            raise ValueError(
                f"CLUSTERED BY column(s) {missing!r} not in the column "
                f"list; {_GRAMMAR}"
            )
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_kb", T.IntegerType())]
        )
        # schema + bucket meta in ONE commit — a crash between them
        # would strand the table unbucketed with no error
        catalog.create_table(table, schema, bucket_meta=(num_buckets, keys))
        return {
            "table": table,
            "created": True,
            "clustered_by": keys,
            "buckets": num_buckets,
        }
    df = catalog.spark.sql(select)
    if "_kb" in df.columns:
        raise ValueError(
            "'_kb' is the reserved bucket-placement column; alias the "
            f"SELECT column; {_GRAMMAR}"
        )
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(
            f"CLUSTERED BY column(s) {missing!r} not in the SELECT "
            f"output; {_GRAMMAR}"
        )
    # data + bucket meta in ONE commit (overwrite_bucketed)
    catalog.overwrite_bucketed(df, table, num_buckets, keys)
    return {
        "table": table,
        "created": True,
        "clustered_by": keys,
        "buckets": num_buckets,
        "rows": catalog.read(table).count(),
    }


def _split_statements(block: str) -> list[str]:
    """Split a multi-statement block on semicolons OUTSIDE single-quoted
    strings (``''`` escapes toggle the state twice — harmless)."""
    out, buf, in_q = [], [], False
    for ch in block:
        if ch == "'":
            in_q = not in_q
            buf.append(ch)
        elif ch == ";" and not in_q:
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
    stmt = "".join(buf).strip()
    if stmt:
        out.append(stmt)
    return out


def _execute_transaction(catalog, block: str) -> dict:
    """``BEGIN; <INSERT|MERGE|DELETE|UPDATE>...; COMMIT|ROLLBACK`` — the SQL face of
    the engine's atomic multi-table commit: every statement stages into
    ONE TransactionalCatalog transaction and the whole block becomes
    visible in a single manifest swap (or not at all). This is the
    reference's per-row BEGIN/COMMIT (etl-gcs-cloudsql/src/services/
    empresa.ts:60,108) at the engine's natural granularity.

    Constraint probes inside the block see the staged state
    (read-your-writes), so a parent INSERT followed by a child INSERT
    under a FOREIGN KEY commits atomically. A failing statement — or a
    crash — rolls the whole block back: nothing is visible, staged
    dirs are deleted. INSERT, MERGE, DELETE, UPDATE and CREATE TABLE
    may appear inside the block (copy-on-write DELETE/UPDATE join the
    open transaction; a rewrite of a table the block already staged
    refuses, as does merge-on-read DML — its deletion vectors publish
    outside the staged-dir protocol; CREATE TABLE stages the new
    table so create-and-load publishes atomically and a ROLLBACK
    leaves no table — identity marks and CLUSTERED BY layouts ride
    the same staged intents). Other DDL still refuses: it publishes
    through its own immediate metadata commit."""
    if not hasattr(catalog, "begin"):
        raise ValueError(
            "BEGIN needs a transactional catalog (plain catalogs have "
            "no staged commit)"
        )
    stmts = _split_statements(block)
    head = stmts[0]
    if not re.fullmatch(r"BEGIN(\s+TRANSACTION)?", head, re.I):
        raise ValueError(
            f"bad transaction opener {head!r}: BEGIN [TRANSACTION]; "
            f"{_GRAMMAR}"
        )
    if len(stmts) < 2 or not re.fullmatch(
        r"COMMIT|ROLLBACK", stmts[-1], re.I
    ):
        raise ValueError(
            "a BEGIN block must end with COMMIT or ROLLBACK; "
            f"{_GRAMMAR}"
        )
    commit = stmts[-1].upper() == "COMMIT"
    body = stmts[1:-1]
    for stmt in body:
        if not re.match(
            r"(INSERT|MERGE|DELETE|UPDATE|CREATE\s+TABLE)\b", stmt, re.I
        ):
            raise ValueError(
                f"only INSERT, MERGE, DELETE, UPDATE and CREATE TABLE "
                f"may appear inside BEGIN ... COMMIT (got "
                f"{stmt.split()[0].upper() if stmt else ''!r}); other "
                f"DDL publishes through its own metadata commit; "
                f"{_GRAMMAR}"
            )
    results = []
    catalog.begin(None)
    try:
        for stmt in body:
            results.append(execute_dml(catalog, stmt))
    except BaseException:
        catalog.rollback()
        raise
    if commit and catalog._pending:
        try:
            catalog.commit()
        except BaseException:
            catalog.rollback()
            raise
    else:
        # ROLLBACK, or a COMMIT with nothing staged (don't burn a
        # version on an empty commit)
        catalog.rollback()
    return {
        "transaction": "committed" if commit else "rolled_back",
        "statements": results,
    }


def execute_dml(catalog, sql: str) -> dict | None:
    """Run a DELETE/UPDATE/INSERT/MERGE statement through the catalog's
    engine and return a result dict — or ``None`` when the statement is
    not DML (the caller sends it to ``spark.sql``). Raises ValueError
    (with the grammar) for DML-looking statements outside the supported
    shape, so nothing mutating ever falls through silently.

    Routing: DELETE/UPDATE -> the stats-pruned hardlink-carrying
    rewrites; INSERT -> ``Catalog.append`` (new files only, never a
    table rewrite); MERGE -> ``Catalog.merge_upsert`` (full-outer
    coalesce upsert — source wins on matched rows, last-wins on
    duplicate source keys, inserts pass through; no audit-column
    injection; type-mismatched shared columns are cast-probed and
    aligned, never silently coerced into rewriting the target's type).

    INSERT...SELECT and MERGE sources are evaluated twice: once for
    the combined validation-probe/row-count pass and once for the
    write — assume deterministic sources (the standard warehouse
    contract; a rand()-dependent source may pass the probe on rows the
    write never produces)."""
    s = sql.strip().rstrip(";").strip()
    if re.match(r"BEGIN\b", s, re.I):
        return _execute_transaction(catalog, s)
    m = re.fullmatch(r"EXPLAIN\s+(.+)", s, re.I | re.S)
    if m:
        return _explain(catalog, m.group(1))
    m = re.fullmatch(r"DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+)", s, re.I | re.S)
    if m:
        _refuse_matview_target(catalog, m.group(1), "DELETE")
        mode = _dml_mode(catalog, m.group(1))
        n = catalog.delete_where(
            m.group(1), parse_where(m.group(2)), mode=mode
        )
        out = {"table": m.group(1), "deleted": n}
        if mode == "dv":
            out["mode"] = mode  # the copy-on-write default stays terse
        return out
    m = re.fullmatch(r"UPDATE\s+(\w+)\s+SET\s+(.+)", s, re.I | re.S)
    if m:
        _refuse_matview_target(catalog, m.group(1), "UPDATE")
        sets, where = _parse_update_tail(m.group(2))
        mode = _dml_mode(catalog, m.group(1))
        n = catalog.update_where(
            m.group(1), parse_where(where), sets, mode=mode
        )
        out = {"table": m.group(1), "updated": n}
        if mode == "dv":
            out["mode"] = mode
        return out
    m = _INSERT_RE.fullmatch(s)
    if m:
        overwrite = m.group(1).upper() == "OVERWRITE"
        table = m.group(2)
        cols, src, schema = _parse_insert_source(
            catalog, table, m.group(3), m.group(4).strip(), overwrite
        )
        ident = getattr(catalog, "identity_spec", lambda _t: None)(table)
        gen = getattr(catalog, "generated_spec", lambda _t: None)(table)
        if ident is not None or gen:
            return _insert_computed(
                catalog, table, cols, src, schema, ident, gen or {},
                overwrite,
            )
        meta = getattr(catalog, "bucket_meta", lambda _t: None)(table)
        if meta is not None:
            # bucketed target: users insert the LOGICAL columns; the
            # engine computes the _kb placement and keeps the appended
            # dir partitioned so the layout (and the bounded-merge
            # contract) survives plain INSERTs
            from pyspark.sql import types as T

            from gcp_datalake_pipeline_spark.storage import kb_col

            logical = T.StructType(
                [f for f in schema.fields if f.name != "_kb"]
            )
            aligned, n = _align_to_schema(catalog, src, logical, cols)
            aligned = aligned.withColumn(
                "_kb", kb_col(meta["key_cols"], meta["num_buckets"])
            )
            if overwrite:
                catalog.overwrite(
                    aligned, table, partition_cols=["_kb"]
                )
                return {"table": table, "overwritten": n}
            catalog.append(aligned, table, partition_cols=["_kb"])
            return {"table": table, "inserted": n}
        aligned, n = _align_to_schema(catalog, src, schema, cols)
        if overwrite:
            # INSERT OVERWRITE replaces the table's CONTENT, keeping its
            # schema/checks/layout — a conflict-checked replace commit
            # (old versions stay time-travelable); column-list NULL-fill
            # and the cast probe apply exactly as for INTO
            catalog.overwrite(aligned, table)
            return {"table": table, "overwritten": n}
        catalog.append(aligned, table)
        return {"table": table, "inserted": n}
    m = _MERGE_RE.fullmatch(s)
    if m:
        table, rest = m.group(1), m.group(2)
        source_spec, keys, clauses, schema, meta = _parse_merge(
            catalog, table, rest
        )
        src = _resolve_source(catalog, source_spec)
        shape = _merge_shape(clauses)
        shape, _computed = _merge_computed(catalog, table, shape)
        if shape == "merge_delete":
            # only the keys matter: probe/align just those (a mismatch
            # on a non-key source column must not block a delete)
            from pyspark.sql import types as T

            key_schema = T.StructType(
                [f for f in schema.fields if f.name in keys]
            )
            src, _ = _align_merge_source(catalog, src, key_schema)
            if meta is not None:
                n = catalog.merge_delete_bucketed(
                    src, table, key_cols=keys,
                    num_buckets=meta["num_buckets"],
                )
            else:
                n = catalog.merge_delete(src, table, key_cols=keys)
            return {"table": table, "merge_deleted": n}
        if shape == "merge_when":
            mw = getattr(catalog, "merge_when", None)
            if mw is None:
                raise ValueError(
                    "conditional / NOT MATCHED BY SOURCE MERGE clauses "
                    "need a transactional catalog (ingest --atomic); "
                    f"{_GRAMMAR}"
                )
            if _merge_star(clauses):
                src, _ = _align_merge_source(catalog, src, schema)
            else:
                # column-level / delete-only clauses: align keys; other
                # source columns stay as-is (conds and SET exprs read
                # them via src. qualification)
                from pyspark.sql import types as T

                key_schema = T.StructType(
                    [f for f in schema.fields if f.name in keys]
                )
                src, _ = _align_merge_source(catalog, src, key_schema)
            counts = mw(
                src,
                table,
                key_cols=keys,
                matched=clauses["matched"],
                not_matched=clauses["not_matched"],
                by_source=clauses["by_source"],
            )
            return {"table": table, **counts}
        src, n = _align_merge_source(catalog, src, schema)
        if meta is not None:
            catalog.merge_upsert_bucketed(
                src, table, key_cols=keys,
                num_buckets=meta["num_buckets"], audit_cols=False,
            )
        else:
            catalog.merge_upsert(
                src, table, key_cols=keys, audit_cols=False
            )
        return {"table": table, "merged": n}
    m = re.fullmatch(
        r"CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+(SELECT\b.+)",
        s,
        re.I | re.S,
    )
    if m:
        from gcp_datalake_pipeline_spark.operators.matview import (
            create_materialized_view,
            parse_matview_select,
        )

        name = m.group(1)
        source, keys, sums, count_col, mins, maxs = parse_matview_select(
            m.group(2)
        )
        return create_materialized_view(
            catalog, name, source, keys, sums, count_col,
            mins=mins, maxs=maxs,
        )
    m = re.fullmatch(r"REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)", s, re.I)
    if m:
        from gcp_datalake_pipeline_spark.operators.matview import (
            refresh_materialized_view,
        )

        return refresh_materialized_view(catalog, m.group(1))
    m = re.fullmatch(r"DROP\s+MATERIALIZED\s+VIEW\s+(\w+)", s, re.I)
    if m:
        from gcp_datalake_pipeline_spark.operators.matview import (
            drop_materialized_view,
        )

        drop_materialized_view(catalog, m.group(1))
        return {"view": m.group(1), "dropped": True}
    m = re.fullmatch(
        r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.+)\)\s*"
        r"CLUSTERED\s+BY\s*\(([^)]+)\)\s*INTO\s+(\d+)\s+BUCKETS",
        s,
        re.I | re.S,
    )
    if m:
        return _create_clustered(
            catalog, m.group(1), m.group(2), m.group(4), int(m.group(5)),
            ddl=m.group(3),
        )
    m = re.fullmatch(
        r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+"
        r"CLUSTERED\s+BY\s*\(([^)]+)\)\s*INTO\s+(\d+)\s+BUCKETS\s+"
        r"AS\s+(SELECT\b.+)",
        s,
        re.I | re.S,
    )
    if m:
        return _create_clustered(
            catalog, m.group(1), m.group(2), m.group(3), int(m.group(4)),
            select=m.group(5),
        )
    m = re.fullmatch(
        r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(SELECT\b.+)",
        s,
        re.I | re.S,
    )
    if m:
        if_not_exists, table, select = m.group(1), m.group(2), m.group(3)
        if catalog.exists(table):
            if if_not_exists:
                return {"table": table, "created": False}
            raise ValueError(
                f"CREATE TABLE AS: {table!r} already exists (use IF NOT "
                f"EXISTS, or INSERT INTO to add rows); {_GRAMMAR}"
            )
        catalog.overwrite(catalog.spark.sql(select), table)
        # count from the freshly committed files (one bounded read of
        # the new table), not a second evaluation of the SELECT
        return {
            "table": table,
            "created": True,
            "rows": catalog.read(table).count(),
        }
    m = re.fullmatch(
        r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.+)\)",
        s,
        re.I | re.S,
    )
    if m:
        if_not_exists, table, ddl = m.group(1), m.group(2), m.group(3)
        if if_not_exists and catalog.exists(table):
            return {"table": table, "created": False}
        # GENERATED ALWAYS AS IDENTITY: strip the clause (a plain
        # BIGINT remains for the DDL parser) and register the column
        # in the SAME create commit
        identity_col = None
        id_cols = re.findall(
            r"(\w+)\s+BIGINT\s+GENERATED\s+ALWAYS\s+AS\s+IDENTITY",
            ddl,
            re.I,
        )
        if len(id_cols) > 1:
            raise ValueError(
                f"CREATE TABLE {table!r}: multiple IDENTITY columns "
                f"{id_cols} — a table mints from ONE identity sequence; "
                f"{_GRAMMAR}"
            )
        if id_cols:
            identity_col = id_cols[0]
            ddl = re.sub(
                r"(\w+\s+BIGINT)\s+GENERATED\s+ALWAYS\s+AS\s+IDENTITY",
                r"\1",
                ddl,
                count=1,
                flags=re.I,
            )
        # GENERATED ALWAYS AS (expr): computed columns — strip each
        # clause (balanced-paren scan, so exprs nest freely) and
        # collect {col: expr} for the create commit
        ddl, generated = _strip_generated(ddl)
        try:
            from pyspark.sql import types as T

            schema = T.StructType.fromDDL(ddl)
        except Exception as e:
            raise ValueError(
                f"bad CREATE TABLE column list {ddl!r}: {e}; {_GRAMMAR}"
            ) from None
        if identity_col is not None or generated:
            catalog.create_table(
                table, schema, identity_col=identity_col,
                generated=generated or None,
            )
            out = {"table": table, "created": True}
            if identity_col is not None:
                out["identity"] = identity_col
            if generated:
                out["generated"] = sorted(generated)
            return out
        catalog.create_table(table, schema)
        return {"table": table, "created": True}
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+CLUSTERED\s+BY\s*\(([^)]+)\)\s*"
        r"INTO\s+(\d+)\s+BUCKETS",
        s,
        re.I,
    )
    if m:
        keys = [c.strip() for c in m.group(2).split(",")]
        return catalog.recluster(m.group(1), int(m.group(3)), keys)
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+ALTER\s+COLUMN\s+(\w+)\s+"
        r"(?:SET\s+DATA\s+)?TYPE\s+(.+?)(\s+REBUILD)?",
        s,
        re.I | re.S,
    )
    if m:
        table, col, dtype = m.group(1), m.group(2), m.group(3).strip()
        rebuild = m.group(4) is not None
        try:
            catalog.widen_column(table, col, dtype, rebuild=rebuild)
        except (ValueError, FileNotFoundError):
            raise
        except Exception as e:  # unparseable DDL type
            raise ValueError(
                f"bad ALTER COLUMN type {dtype!r}: {e}; {_GRAMMAR}"
            ) from None
        out = {"table": table, "widened_column": col, "type": dtype}
        if rebuild:
            out["rebuilt"] = True
        return out
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+(.+)", s, re.I | re.S
    )
    if m:
        table, col, dtype = m.group(1), m.group(2), m.group(3).strip()
        try:
            catalog.add_column(table, col, dtype)
        except (ValueError, FileNotFoundError):
            raise
        except Exception as e:  # unparseable DDL type
            raise ValueError(
                f"bad ADD COLUMN type {dtype!r}: {e}; {_GRAMMAR}"
            ) from None
        return {"table": table, "added_column": col}
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)",
        s,
        re.I,
    )
    if m:
        catalog.rename_column(m.group(1), m.group(2), m.group(3))
        return {
            "table": m.group(1),
            "renamed_column": m.group(2),
            "to": m.group(3),
        }
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)", s, re.I
    )
    if m:
        catalog.drop_column(m.group(1), m.group(2))
        return {"table": m.group(1), "dropped_column": m.group(2)}
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+SET\s+TBLPROPERTIES\s*\(\s*"
        r"'([^']+)'\s*=\s*'([^']*)'\s*\)",
        s,
        re.I,
    )
    if m:
        catalog.set_table_property(m.group(1), m.group(2), m.group(3))
        return {
            "table": m.group(1),
            "set_property": m.group(2),
            "value": m.group(3),
        }
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+UNSET\s+TBLPROPERTIES\s*\(\s*"
        r"'([^']+)'\s*\)",
        s,
        re.I,
    )
    if m:
        catalog.unset_table_property(m.group(1), m.group(2))
        return {"table": m.group(1), "unset_property": m.group(2)}
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+RENAME\s+TO\s+(\w+)", s, re.I
    )
    if m:
        catalog.rename_table(m.group(1), m.group(2))
        return {"table": m.group(1), "renamed_to": m.group(2)}
    m = re.fullmatch(r"DESCRIBE\s+HISTORY\s+(\w+)", s, re.I)
    if m:
        return {"table": m.group(1), "history": catalog.history(m.group(1))}
    m = re.fullmatch(r"SHOW\s+CREATE\s+TABLE\s+(\w+)", s, re.I)
    if m:
        return {"table": m.group(1), "create": _show_create(catalog, m.group(1))}
    m = re.fullmatch(
        r"RESTORE\s+TABLE\s+(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)",
        s,
        re.I,
    )
    if m:
        catalog.restore_table(m.group(1), int(m.group(2)))
        return {
            "table": m.group(1),
            "restored_to": int(m.group(2)),
            "rows": catalog.count_rows(m.group(1)),
        }
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)",
        s,
        re.I | re.S,
    )
    if m:
        catalog.add_check(m.group(1), m.group(2), m.group(3).strip())
        return {"table": m.group(1), "added_check": m.group(2)}
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+"
        r"(?:UNIQUE|PRIMARY\s+KEY)\s*\(([^)]+)\)",
        s,
        re.I,
    )
    if m:
        cols = [c.strip() for c in m.group(3).split(",")]
        catalog.add_unique_constraint(m.group(1), m.group(2), cols)
        return {
            "table": m.group(1), "added_unique": m.group(2),
            "columns": cols,
        }
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+"
        r"FOREIGN\s+KEY\s*\(([^)]+)\)\s*REFERENCES\s+(\w+)\s*"
        r"\(([^)]+)\)"
        r"((?:\s+ON\s+(?:DELETE|UPDATE)\s+(?:RESTRICT|CASCADE|SET\s+NULL))*)",
        s,
        re.I,
    )
    if m:
        cols = [c.strip() for c in m.group(3).split(",")]
        pcols = [c.strip() for c in m.group(5).split(",")]
        acts = {"delete": "restrict", "update": "restrict"}
        seen: set[str] = set()
        for verb, act in re.findall(
            r"ON\s+(DELETE|UPDATE)\s+(RESTRICT|CASCADE|SET\s+NULL)",
            m.group(6) or "",
            re.I,
        ):
            v = verb.lower()
            if v in seen:
                raise ValueError(
                    f"duplicate ON {verb.upper()} clause; {_GRAMMAR}"
                )
            seen.add(v)
            acts[v] = re.sub(r"\s+", " ", act).lower()
        catalog.add_fk_constraint(
            m.group(1), m.group(2), cols, m.group(4), pcols,
            on_delete=acts["delete"], on_update=acts["update"],
        )
        out = {
            "table": m.group(1),
            "added_fk": m.group(2),
            "columns": cols,
            "references": {"table": m.group(4), "columns": pcols},
        }
        if acts["delete"] != "restrict":
            out["on_delete"] = acts["delete"]
        if acts["update"] != "restrict":
            out["on_update"] = acts["update"]
        return out
    m = re.fullmatch(
        r"ALTER\s+TABLE\s+(\w+)\s+DROP\s+CONSTRAINT\s+(\w+)", s, re.I
    )
    if m:
        catalog.drop_check(m.group(1), m.group(2))
        return {"table": m.group(1), "dropped_check": m.group(2)}
    m = re.fullmatch(
        r"OPTIMIZE\s+(\w+)"
        r"(?:\s+CLUSTER\s+BY\s*\(([^)]+)\)|\s+ZORDER\s+BY\s*\(([^)]+)\)"
        r"|\s+WHERE\s+(.+))?",
        s,
        re.I | re.S,
    )
    if m:
        table = m.group(1)
        if m.group(4):
            # partial OPTIMIZE (Delta's partition-predicate form): the
            # predicate must name ONLY the _kb bucket column — that is
            # the table's physical partitioning, the unit a bounded
            # rewrite can honor
            parsed = parse_where(m.group(4))
            conjs = (
                parsed
                if parsed and isinstance(parsed[0], list)
                else [parsed]
            )
            buckets: set[int] = set()
            for col, op, *val in (p for conj in conjs for p in conj):
                if col != "_kb" or op not in ("=", "in"):
                    raise ValueError(
                        "OPTIMIZE ... WHERE takes only _kb = n or _kb "
                        f"IN (...) (got {col!r} {op!r}); {_GRAMMAR}"
                    )
                vals = val[0] if op == "in" else [val[0]]
                if not all(isinstance(v, int) for v in vals):
                    raise ValueError(
                        f"OPTIMIZE ... WHERE _kb takes integer bucket "
                        f"ids, got {vals!r}; {_GRAMMAR}"
                    )
                buckets.update(vals)
            done = catalog.compact_buckets(table, sorted(buckets))
            return {
                "table": table,
                "optimized": done,
                "buckets": sorted(buckets),
            }
        cluster = (
            [c.strip() for c in m.group(2).split(",")] if m.group(2) else None
        )
        zorder = (
            [c.strip() for c in m.group(3).split(",")] if m.group(3) else None
        )
        done = catalog.compact(
            table, cluster_by=cluster, zorder_by=zorder, min_dirs=2
        )
        return {"table": table, "optimized": done}
    m = re.fullmatch(
        r"VACUUM(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+DRY\s+RUN)?",
        s,
        re.I,
    )
    if m:
        dry = bool(m.group(2))
        removed = catalog.vacuum(
            retain_versions=int(m.group(1)) if m.group(1) else 1,
            dry_run=dry,
        )
        n_dirs = sum(1 for r in removed if r.startswith("_loads"))
        out = {
            "vacuumed_dirs": n_dirs,
            "vacuumed_versions": len(removed) - n_dirs,
        }
        if dry:
            out["dry_run"] = True
            out["would_remove"] = sorted(removed)
        return out
    m = re.fullmatch(
        r"CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+TABLE\s+(\w+)\s+FOR\s+"
        r"COLUMNS\s*\(([^)]+)\)(?:\s+OPTIONS\s*\(\s*bits_per_row\s*=\s*"
        r"(\d+)\s*\))?",
        s,
        re.I,
    )
    if m:
        table = m.group(1)
        cols = [c.strip() for c in m.group(2).split(",")]
        bpr = int(m.group(3)) if m.group(3) else 10
        catalog.set_bloom_index(table, cols, bits_per_row=bpr)
        return {"table": table, "bloom_index": cols}
    m = re.fullmatch(r"DROP\s+BLOOMFILTER\s+INDEX\s+ON\s+TABLE\s+(\w+)", s, re.I)
    if m:
        catalog.drop_bloom_index(m.group(1))
        return {"table": m.group(1), "dropped_bloom_index": True}
    m = re.fullmatch(r"TRUNCATE\s+TABLE\s+(\w+)", s, re.I)
    if m:
        _refuse_matview_target(catalog, m.group(1), "TRUNCATE")
        n = catalog.truncate(m.group(1))
        return {"table": m.group(1), "truncated": n}
    m = re.fullmatch(r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(\w+)", s, re.I)
    if m:
        if m.group(1) and not catalog.exists(m.group(2)):
            return {"table": m.group(2), "dropped": False}
        # DROP TABLE on a matview would orphan its registered spec
        _refuse_matview_target(catalog, m.group(2), "DROP TABLE")
        catalog.drop_table(m.group(2))
        return {"table": m.group(2), "dropped": True}
    # CREATE/DROP VIEW etc. stay None -> spark.sql; only TABLE-shaped
    # DDL and the four DML verbs are "ours or refused"
    if re.match(
        r"(DELETE|UPDATE|INSERT|MERGE|OPTIMIZE|VACUUM)\b"
        r"|CREATE\s+TABLE\b|DROP\s+TABLE\b|TRUNCATE\b|ALTER\s+TABLE\b"
        r"|CREATE\s+BLOOMFILTER\b|DROP\s+BLOOMFILTER\b"
        r"|CREATE\s+MATERIALIZED\b|REFRESH\s+MATERIALIZED\b"
        r"|DROP\s+MATERIALIZED\b|DESCRIBE\s+HISTORY\b"
        r"|SHOW\s+CREATE\s+TABLE\b|RESTORE\s+TABLE\b",
        s,
        re.I,
    ):
        raise ValueError(f"unsupported DML shape; {_GRAMMAR}")
    return None
