"""SQL façade for the catalog's row-level DML.

The reference's users mutate their tables with PostgreSQL DML
(``etl-gcs-cloudsql`` upserts row-by-row into CloudSQL); this module
gives the transactional catalog the same front door: ``DELETE FROM t
WHERE ...`` and ``UPDATE t SET ... WHERE ...`` statements route to
:meth:`~gcp_datalake_pipeline_spark.transactions.TransactionalCatalog.delete_where`
/ :meth:`...update_where` — the stats-pruned, hardlink-carrying
rewrites — instead of Spark's (read-only) SQL runner. Everything else
returns ``None`` so the caller sends it to ``spark.sql`` unchanged.

Deliberately STRICT grammar (anything else raises with the grammar in
the message — a typo must never silently become a full-table Spark
statement):

    DELETE FROM <table> WHERE <where>
    UPDATE <table> SET col = <sql-expr>[, ...] WHERE <where>
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
    return [p for p in (x.strip() for x in out) if p]


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
    return [p.strip() for p in parts if p.strip()]


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


def execute_dml(catalog, sql: str) -> dict | None:
    """Run a DELETE/UPDATE statement through the catalog's stats-pruned
    DML and return a result dict — or ``None`` when the statement is
    not DML (the caller sends it to ``spark.sql``). Raises ValueError
    (with the grammar) for DML-looking statements outside the supported
    shape, so nothing mutating ever falls through silently."""
    s = sql.strip().rstrip(";").strip()
    m = re.fullmatch(r"DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+)", s, re.I | re.S)
    if m:
        n = catalog.delete_where(m.group(1), parse_where(m.group(2)))
        return {"table": m.group(1), "deleted": n}
    m = re.fullmatch(r"UPDATE\s+(\w+)\s+SET\s+(.+)", s, re.I | re.S)
    if m:
        # quote/paren-aware WHERE split: a SET expression's string
        # literal may itself contain the word WHERE
        pieces = _split_keyword(m.group(2), "WHERE")
        if len(pieces) != 2:
            raise ValueError(f"unsupported DML shape; {_GRAMMAR}")
        assigns, where = pieces
        sets: dict[str, str] = {}
        for assign in _split_top(assigns):
            col, eq, expr = assign.partition("=")
            if not eq or not col.strip() or not expr.strip():
                raise ValueError(
                    f"bad SET assignment {assign!r}; {_GRAMMAR}"
                )
            sets[col.strip()] = expr.strip()
        n = catalog.update_where(m.group(1), parse_where(where), sets)
        return {"table": m.group(1), "updated": n}
    if re.match(r"(DELETE|UPDATE)\b", s, re.I):
        raise ValueError(f"unsupported DML shape; {_GRAMMAR}")
    return None
