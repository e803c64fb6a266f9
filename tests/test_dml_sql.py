"""SQL DML façade: strict grammar parsing, routing to the stats-pruned
delete_where/update_where, and refusal of anything outside the shape."""

import datetime

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.dml_sql import (
    execute_dml,
    parse_where,
)
from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog


def test_parse_where_grammar():
    assert parse_where("k = 3") == [("k", "=", 3)]
    assert parse_where("price <= 30.5 AND y >= 1996") == [
        ("price", "<=", 30.5),
        ("y", ">=", 1996),
    ]
    assert parse_where("name = 'a b' and v is not null") == [
        ("name", "=", "a b"),
        ("v", "not_null"),
    ]
    assert parse_where("v IS NULL") == [("v", "is_null")]
    assert parse_where("k IN (1, 2, 3)") == [("k", "in", [1, 2, 3])]
    assert parse_where("ts >= TIMESTAMP '1996-01-01'") == [
        ("ts", ">=", datetime.datetime(1996, 1, 1))
    ]
    assert parse_where("d < DATE '1996-01-01'") == [
        ("d", "<", datetime.date(1996, 1, 1))
    ]
    with pytest.raises(ValueError, match="unparseable literal"):
        parse_where("k = other_col")


def test_parse_where_not_equal_and_quote_escape():
    assert parse_where("k != 3") == [("k", "!=", 3)]
    assert parse_where("k <> 3") == [("k", "!=", 3)]  # canonicalized
    assert parse_where("name != 'O''Brien'") == [("name", "!=", "O'Brien")]
    assert parse_where("name = ''''") == [("name", "=", "'")]
    assert parse_where("name = ''") == [("name", "=", "")]
    assert parse_where("p IN ('it''s', 'b')") == [("p", "in", ["it's", "b"])]


def test_parse_where_top_level_or():
    # bare OR of single terms -> DNF of single-term conjunctions
    assert parse_where("k = 3 OR v = 1") == [[("k", "=", 3)], [("v", "=", 1)]]
    # parenthesized conjunction branches
    assert parse_where("(k = 3 AND v < 2) OR (k = 9)") == [
        [("k", "=", 3), ("v", "<", 2)],
        [("k", "=", 9)],
    ]
    # whole-clause parens + three branches
    assert parse_where("(a = 1 OR b = 2 OR c IS NULL)") == [
        [("a", "=", 1)],
        [("b", "=", 2)],
        [("c", "is_null")],
    ]
    # literals containing ' OR ' never split
    assert parse_where("p = 'cats OR dogs'") == [("p", "=", "cats OR dogs")]
    # OR nested under AND is NOT the supported top-level-OR shape:
    # refuse loudly rather than mis-evaluate precedence
    with pytest.raises(ValueError, match="unsupported WHERE term"):
        parse_where("(a = 1 OR b = 2) AND c = 3")


def test_execute_dml_routes_and_refuses(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    for s in range(2):
        cat.append(df.where(F.col("k") % 2 == s).coalesce(1), "t")

    out = execute_dml(cat, "DELETE FROM t WHERE k = 3")
    assert out == {"table": "t", "deleted": 10}
    assert cat.read("t").filter(F.col("k") == 3).count() == 0

    out = execute_dml(
        cat, "update t set v = v + 1000, k = k WHERE k IN (1, 2) ;"
    )
    assert out == {"table": "t", "updated": 20}
    assert cat.read("t").filter(F.col("v") >= 1000).count() == 20

    # non-DML returns None (caller sends to spark.sql)
    assert execute_dml(cat, "SELECT * FROM t") is None
    # DML-looking but unsupported shapes refuse loudly — never fall
    # through to a silent no-op
    with pytest.raises(ValueError, match="unsupported DML shape"):
        execute_dml(cat, "DELETE FROM t")  # no WHERE: full truncation
    with pytest.raises(ValueError, match="unsupported DML shape"):
        execute_dml(cat, "UPDATE t SET v = 1")  # no WHERE
    with pytest.raises(ValueError, match="bad SET assignment"):
        execute_dml(cat, "UPDATE t SET v WHERE k = 1")


def test_update_set_expr_with_function_commas(spark, tmp_path):
    """SET right-hand sides are full Spark SQL expressions — commas
    inside function calls must not split assignments."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 1.111).alias("v")
    )
    cat.append(df, "t")
    out = execute_dml(
        cat, "UPDATE t SET v = round(v, 1) WHERE id >= 5"
    )
    assert out == {"table": "t", "updated": 5}
    got = {r["id"]: r["v"] for r in cat.read("t").collect()}
    assert got[7] == round(7 * 1.111, 1)
    assert got[2] == 2 * 1.111


def test_update_set_is_simultaneous(spark, tmp_path):
    """SQL SET semantics: every right-hand side evaluates against the
    OLD row — SET a = b, b = a swaps, and the WHERE predicate never
    re-resolves against a column an earlier assignment rewrote (a
    sequential withColumn chain gets both wrong). Both modes."""
    for mode in ("rewrite", "dv"):
        cat = TransactionalCatalog(
            spark=spark, root=str(tmp_path / f"lake_{mode}")
        )
        cat.append(
            spark.createDataFrame(
                [(1, 10, 20), (2, 30, 40)], "k long, a long, b long"
            ),
            "t",
        )
        assert (
            cat.update_where(
                "t", [("k", "=", 1)], {"a": "b", "b": "a"}, mode=mode
            )
            == 1
        )
        got = {
            r["k"]: (r["a"], r["b"]) for r in cat.read("t").collect()
        }
        assert got == {1: (20, 10), 2: (30, 40)}
        # predicate column rewritten by the FIRST assignment: the
        # second assignment must still see the row as matched
        assert (
            cat.update_where(
                "t", [("a", "=", 20)], {"a": "0", "b": "99"}, mode=mode
            )
            == 1
        )
        got = {
            r["k"]: (r["a"], r["b"]) for r in cat.read("t").collect()
        }
        assert got == {1: (0, 99), 2: (30, 40)}


def test_string_literals_containing_keywords(spark, tmp_path):
    """Review fixes: the AND split and the SET/WHERE split are quote
    aware — literals containing ' AND ' / ' WHERE ' parse correctly."""
    assert parse_where("p = 'SMALL AND SHINY'") == [
        ("p", "=", "SMALL AND SHINY")
    ]
    assert parse_where("p = 'a AND b' AND k = 1") == [
        ("p", "=", "a AND b"),
        ("k", "=", 1),
    ]
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.sql(
        "SELECT * FROM VALUES (1, 'x'), (2, 'y') AS t(id, note)"
    )
    cat.append(df, "t")
    out = execute_dml(
        cat, "UPDATE t SET note = 'a WHERE b' WHERE id = 1"
    )
    assert out == {"table": "t", "updated": 1}
    got = {r["id"]: r["note"] for r in cat.read("t").collect()}
    assert got == {1: "a WHERE b", 2: "y"}
    out = execute_dml(cat, "DELETE FROM t WHERE note = 'a WHERE b'")
    assert out == {"table": "t", "deleted": 1}


def test_parse_where_property_roundtrip():
    """Property test: any conjunction rendered from the grammar parses
    back to exactly its predicate tuples — including string literals
    containing keywords, mixed ops, and IN lists."""
    import datetime

    from hypothesis import given, settings
    from hypothesis import strategies as st

    cols = st.sampled_from(["a", "b2", "price", "o_orderdate"])
    strings = st.lists(
        st.sampled_from(
            ["abc", "X Y", "09_", " AND ", " WHERE ", " OR ", "(", ")",
             "'", "z"]
        ),
        max_size=4,
    ).map("".join)
    literal = st.one_of(
        st.integers(-10**6, 10**6),
        st.floats(
            allow_nan=False, allow_infinity=False, width=32
        ).map(lambda f: round(float(f), 3)),
        strings,
        st.datetimes(
            min_value=datetime.datetime(1990, 1, 1),
            max_value=datetime.datetime(2030, 1, 1),
        ).map(lambda d: d.replace(microsecond=0)),
    )

    def render(lit):
        if isinstance(lit, str):
            return "'" + lit.replace("'", "''") + "'"
        if isinstance(lit, datetime.datetime):
            return f"TIMESTAMP '{lit.isoformat()}'"
        return repr(lit)

    term = st.one_of(
        st.tuples(
            cols,
            st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
            literal,
        ),
        st.tuples(cols, st.sampled_from(["is_null", "not_null"])),
        st.tuples(
            cols, st.just("in"), st.lists(literal, min_size=1, max_size=4)
        ),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(term, min_size=1, max_size=4))
    def check(terms):
        parts = []
        for t in terms:
            if t[1] in ("is_null", "not_null"):
                parts.append(
                    f"{t[0]} IS NULL" if t[1] == "is_null"
                    else f"{t[0]} IS NOT NULL"
                )
            elif t[1] == "in":
                parts.append(
                    f"{t[0]} IN ({', '.join(render(v) for v in t[2])})"
                )
            else:
                parts.append(f"{t[0]} {t[1]} {render(t[2])}")
        clause = " AND ".join(parts)
        got = parse_where(clause)
        want = [
            (t[0], t[1]) if len(t) == 2 else (t[0], t[1], t[2])
            for t in terms
        ]
        # string literals render stripped of leading/trailing spaces by
        # the term splitter only when UNQUOTED; quoted strings survive
        # verbatim — so exact equality is the contract
        assert got == want, (clause, got, want)

    check()


def test_not_equal_delete_prunes_all_match_files(spark, tmp_path):
    """`!=` candidates are pruned via the all-match dual: a file whose
    min==max equal the literal provably holds NO `!=` rows and carries
    by hardlink; value parity vs DuckDB on the same rows."""
    import os

    import duckdb

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    rows_a = [(i, 5) for i in range(50)]  # k == 5 everywhere
    rows_b = [(100 + i, i % 7) for i in range(50)]  # mixed k
    cat.append(spark.createDataFrame(rows_a, "id long, k long").coalesce(1), "t")
    cat.append(spark.createDataFrame(rows_b, "id long, k long").coalesce(1), "t")
    pdf = cat.read("t").toPandas()

    kept, total = cat.pruned_files("t", [("k", "!=", 5)])
    assert total == 2 and len(kept) == 1  # the all-5 file is dropped

    pre = {
        os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t")
        for f in cat._dir_parquet_files(d)
    }
    out = execute_dml(cat, "DELETE FROM t WHERE k != 5")
    want = duckdb.sql(
        "SELECT count(*) FROM pdf WHERE k != 5"
    ).fetchone()[0]
    assert out["deleted"] == want == 43
    post = {
        os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t")
        for f in cat._dir_parquet_files(d)
    }
    assert len(post & pre) == 1  # the all-5 file carried by hardlink
    survivors = duckdb.sql("SELECT id FROM pdf WHERE NOT (k != 5)").df()
    assert {r["id"] for r in cat.read("t").collect()} == set(
        survivors["id"]
    )


def test_or_delete_prunes_union_of_branches(spark, tmp_path):
    """Top-level OR: candidates are the UNION of each branch's pruned
    files — year-striped dirs, delete 1996 OR 1998, only those two
    files rewrite; value parity vs DuckDB."""
    import os

    import duckdb

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    for y in (1995, 1996, 1997, 1998):
        rows = [(y * 100 + i, y, float(i)) for i in range(40)]
        cat.append(
            spark.createDataFrame(rows, "id long, y long, v double").coalesce(1),
            "t",
        )
    pdf = cat.read("t").toPandas()
    pre = {
        os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t")
        for f in cat._dir_parquet_files(d)
    }
    out = execute_dml(cat, "DELETE FROM t WHERE (y = 1996) OR (y = 1998)")
    want = duckdb.sql(
        "SELECT count(*) FROM pdf WHERE y = 1996 OR y = 1998"
    ).fetchone()[0]
    assert out["deleted"] == want == 80
    post = {
        os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t")
        for f in cat._dir_parquet_files(d)
    }
    assert len(post & pre) == 2  # 1995 + 1997 carried by hardlink
    assert cat.count_rows("t") == 80
    assert cat.read("t").filter(F.col("y").isin(1996, 1998)).count() == 0


def test_or_update_and_mixed_branches(spark, tmp_path):
    """OR with heterogeneous branches (range AND-pair OR equality)
    updates exactly the union; NULLs never match."""
    import duckdb

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    rows = [
        (i, None if i % 11 == 0 else i % 20, float(i)) for i in range(200)
    ]
    cat.append(spark.createDataFrame(rows, "id long, k long, v double"), "t")
    pdf = cat.read("t").toPandas()
    out = execute_dml(
        cat,
        "UPDATE t SET v = v + 1000 "
        "WHERE (k >= 2 AND k < 4) OR k = 17",
    )
    want = duckdb.sql(
        "SELECT count(*) FROM pdf WHERE (k >= 2 AND k < 4) OR k = 17"
    ).fetchone()[0]
    assert out["updated"] == want
    got = cat.read("t").filter(F.col("v") >= 1000).count()
    assert got == want


def test_quoted_quote_literal_roundtrip(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.sql(
        "SELECT * FROM VALUES (1, \"O'Brien\"), (2, 'Smith') AS t(id, name)"
    )
    cat.append(df, "t")
    out = execute_dml(cat, "DELETE FROM t WHERE name = 'O''Brien'")
    assert out == {"table": "t", "deleted": 1}
    assert [r["name"] for r in cat.read("t").collect()] == ["Smith"]


def test_unprunable_shapes_still_refused():
    """The grammar extensions must not soften the refusal discipline."""
    with pytest.raises(ValueError, match="unsupported WHERE term"):
        parse_where("k LIKE 'a%'")
    with pytest.raises(ValueError, match="unsupported WHERE term"):
        parse_where("NOT k = 3")
    with pytest.raises(ValueError):  # dangling OR lands in the literal
        parse_where("k = 3 OR")
    with pytest.raises(ValueError):
        parse_where("lower(k) = 'x'")


# -- INSERT / MERGE routing (r10) --------------------------------------------


def test_insert_values_routes_to_append(spark, tmp_path):
    import os

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.createDataFrame(
        [(1, "a", 1.5)], "id long, name string, v double"
    )
    cat.append(df, "t")
    pre_dirs = len(cat._data_dirs("t"))
    out = execute_dml(
        cat,
        "INSERT INTO t VALUES (2, 'b', 2.5), (3, 'O''Brien', NULL)",
    )
    assert out == {"table": "t", "inserted": 2}
    # an INSERT is an APPEND: a new staged dir, no rewrite of old files
    assert len(cat._data_dirs("t")) == pre_dirs + 1
    got = {r["id"]: (r["name"], r["v"]) for r in cat.read("t").collect()}
    assert got == {1: ("a", 1.5), 2: ("b", 2.5), 3: ("O'Brien", None)}


def test_insert_values_with_column_list_null_fills(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame([(1, "a", 1.5)], "id long, name string, v double"),
        "t",
    )
    out = execute_dml(cat, "INSERT INTO t (v, id) VALUES (9.25, 7)")
    assert out == {"table": "t", "inserted": 1}
    row = cat.read("t").filter(F.col("id") == 7).first()
    assert row["v"] == 9.25 and row["name"] is None


def test_insert_select_routes_and_probes_casts(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame([(1, "a")], "id long, name string"), "t"
    )
    spark.createDataFrame(
        [(10, "x"), (11, "y")], "id long, name string"
    ).createOrReplaceTempView("ins_src")
    out = execute_dml(cat, "INSERT INTO t SELECT id, name FROM ins_src")
    assert out == {"table": "t", "inserted": 2}
    assert cat.count_rows("t") == 3
    # cast-loss probe: a string that can't become a long must refuse
    spark.createDataFrame(
        [("nope", "z")], "id string, name string"
    ).createOrReplaceTempView("ins_bad")
    with pytest.raises(ValueError, match="do not cast"):
        execute_dml(cat, "INSERT INTO t SELECT id, name FROM ins_bad")
    assert cat.count_rows("t") == 3  # nothing landed


def test_insert_refusals(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(spark.createDataFrame([(1,)], "id long"), "t")
    with pytest.raises(ValueError, match="does not exist"):
        execute_dml(cat, "INSERT INTO nope VALUES (1)")
    with pytest.raises(ValueError, match="not in target table"):
        execute_dml(cat, "INSERT INTO t (ghost) VALUES (1)")
    with pytest.raises(ValueError, match="column"):
        execute_dml(cat, "INSERT INTO t VALUES (1, 2)")  # width mismatch
    with pytest.raises(ValueError, match="disagree on width"):
        execute_dml(cat, "INSERT INTO t VALUES (1), (2, 3)")
    with pytest.raises(ValueError, match="unsupported DML shape"):
        execute_dml(cat, "INSERT INTO t DEFAULT VALUES")


def test_insert_overwrite_replaces_content(spark, tmp_path):
    """INSERT OVERWRITE replaces the table's content as a conflict-
    checked replace commit — schema and checks survive, old versions
    stay time-travelable."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"), "t"
    )
    cat.add_check("t", "id_pos", "id > 0")
    v0 = cat.versions()[-1]["version"]
    out = execute_dml(cat, "INSERT OVERWRITE t VALUES (7, 'z')")
    assert out == {"table": "t", "overwritten": 1}
    assert {r["id"] for r in cat.read("t").collect()} == {7}
    assert cat.read_at("t", v0).count() == 2  # time travel intact
    from gcp_datalake_pipeline_spark.transactions import CheckViolation

    with pytest.raises(CheckViolation):
        execute_dml(cat, "INSERT OVERWRITE t VALUES (-1, 'bad')")
    assert {r["id"] for r in cat.read("t").collect()} == {7}  # rolled back


def test_merge_routes_to_merge_upsert(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "k long, s string, v double"
        ),
        "t",
    )
    spark.createDataFrame(
        [(2, "B", 99.0), (3, "c", 30.0)], "k long, s string, v double"
    ).createOrReplaceTempView("mrg_src")
    out = execute_dml(
        cat,
        "MERGE INTO t USING mrg_src ON t.k = mrg_src.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert out == {"table": "t", "merged": 2}
    got = {r["k"]: (r["s"], r["v"]) for r in cat.read("t").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0)}
    # no audit-column injection on the SQL MERGE path
    assert set(cat.read("t").columns) == {"k", "s", "v"}


def test_merge_with_subquery_source_and_bare_on(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame([(1, 10.0)], "k long, v double"), "t"
    )
    cat.append(
        spark.createDataFrame(
            [(1, 11.0), (2, 22.0)], "k long, v double"
        ),
        "updates",
    )
    # catalog table resolved through the manifest; WHEN clauses omitted
    out = execute_dml(cat, "MERGE INTO t USING updates ON k = k")
    assert out == {"table": "t", "merged": 2}
    # subquery source: SELECTs see registered views (the CLI registers
    # every catalog table before routing — mirrored here)
    cat.read("updates").createOrReplaceTempView("updates")
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT k, v * 2 AS v FROM updates) u "
        "ON t.k = u.k",
    )
    assert out == {"table": "t", "merged": 2}
    got = {r["k"]: r["v"] for r in cat.read("t").collect()}
    assert got == {1: 22.0, 2: 44.0}


def test_merge_refusals(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(spark.createDataFrame([(1, 2.0)], "k long, v double"), "t")
    cat.append(spark.createDataFrame([(1, 3.0)], "k long, v double"), "s")
    with pytest.raises(ValueError, match="unsupported MERGE ON term"):
        execute_dml(cat, "MERGE INTO t USING s ON t.k = s.j")
    with pytest.raises(ValueError, match="unsupported MERGE ON term"):
        execute_dml(cat, "MERGE INTO t USING s ON k < k")
    # insert-only merges route through the generalized clause set now:
    # matched rows KEEP (no matched clause), unmatched source inserts
    out = execute_dml(
        cat,
        "MERGE INTO t USING s ON k = k WHEN NOT MATCHED THEN INSERT *",
    )
    assert out == {
        "table": "t", "merge_updated": 0, "merge_inserted": 0,
        "merge_deleted": 0,
    }
    assert cat.read("t").first()["v"] == 2.0  # matched row kept, not updated
    with pytest.raises(ValueError, match="not in target table"):
        execute_dml(cat, "MERGE INTO t USING s ON ghost = ghost")
    with pytest.raises(ValueError, match="unsupported DML shape"):
        execute_dml(cat, "MERGE t WITH s")


# -- r10 self-review regressions ---------------------------------------------


def test_merge_type_mismatch_refuses_and_aligns(spark, tmp_path):
    """Review finding: an un-aligned MERGE source could silently rewrite
    the target column's committed type via Spark's implicit coercion.
    Now: losable values refuse; losslessly-castable sources align."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame([(1, 10.0)], "k long, v double"), "t"
    )
    spark.createDataFrame(
        [(1, "oops")], "k long, v string"
    ).createOrReplaceTempView("bad_src")
    with pytest.raises(ValueError, match="MERGE value.*do not cast"):
        execute_dml(cat, "MERGE INTO t USING bad_src ON t.k = bad_src.k")
    # target untouched, type intact
    assert dict(cat.read("t").dtypes)["v"] == "double"
    assert cat.read("t").first()["v"] == 10.0
    # a castable mismatch (int source into double target) aligns
    spark.createDataFrame(
        [(1, 99), (2, 20)], "k long, v long"
    ).createOrReplaceTempView("ok_src")
    out = execute_dml(cat, "MERGE INTO t USING ok_src ON t.k = ok_src.k")
    assert out == {"table": "t", "merged": 2}
    assert dict(cat.read("t").dtypes)["v"] == "double"
    got = {r["k"]: r["v"] for r in cat.read("t").collect()}
    assert got == {1: 99.0, 2: 20.0}


def test_malformed_empty_segments_refuse(spark, tmp_path):
    """Review finding: the splitters silently dropped empty segments, so
    `VALUES (1,,2)` or a dangling OR executed as if well-formed."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(spark.createDataFrame([(1, 2)], "a long, b long"), "t")
    with pytest.raises(ValueError):
        execute_dml(cat, "INSERT INTO t VALUES (1,,2)")
    with pytest.raises(ValueError):
        execute_dml(cat, "INSERT INTO t VALUES (1, 2),")
    with pytest.raises(ValueError):
        execute_dml(cat, "DELETE FROM t WHERE a = 1 OR b = 2 OR")
    with pytest.raises(ValueError):
        execute_dml(cat, "DELETE FROM t WHERE a IN (1,,2)")
    with pytest.raises(ValueError):
        execute_dml(cat, "UPDATE t SET a = 1, WHERE b = 2")
    assert cat.count_rows("t") == 1  # nothing executed


def test_insert_select_single_validation_pass_reports_true_count(
    spark, tmp_path
):
    """The probe and the reported count ride ONE aggregation pass."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(spark.createDataFrame([(0, 0.0)], "id long, v double"), "t")
    spark.range(1, 51).selectExpr(
        "id", "cast(id as double) AS v"
    ).createOrReplaceTempView("fifty")
    out = execute_dml(cat, "INSERT INTO t SELECT id, v FROM fifty")
    assert out == {"table": "t", "inserted": 50}
    assert cat.count_rows("t") == 51


def test_merge_when_matched_delete(spark, tmp_path):
    """MERGE ... WHEN MATCHED THEN DELETE routes to merge_delete:
    matched target rows go, unmatched source rows are IGNORED (never
    inserted), NULL source keys match nothing."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, s string"
        ),
        "t",
    )
    spark.createDataFrame(
        [(2,), (99,), (None,)], "k long"
    ).createOrReplaceTempView("del_src")
    out = execute_dml(
        cat,
        "MERGE INTO t USING del_src ON t.k = del_src.k "
        "WHEN MATCHED THEN DELETE",
    )
    assert out == {"table": "t", "merge_deleted": 1}
    got = {r["k"] for r in cat.read("t").collect()}
    assert got == {1, 3}  # 99 not inserted, NULL matched nothing
    # no-match merge-delete publishes nothing
    v = cat.versions()[-1]["version"]
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 777 AS k) z ON t.k = z.k "
        "WHEN MATCHED THEN DELETE",
    )
    assert out == {"table": "t", "merge_deleted": 0}
    assert cat.versions()[-1]["version"] == v
    # key-only alignment: a junk non-key source column doesn't block
    spark.createDataFrame(
        [(1, "not-a-number")], "k long, s string"
    ).createOrReplaceTempView("del_src2")
    out = execute_dml(
        cat,
        "MERGE INTO t USING del_src2 ON t.k = del_src2.k "
        "WHEN MATCHED THEN DELETE",
    )
    assert out == {"table": "t", "merge_deleted": 1}
    # DELETE combined with INSERT now routes through the generalized
    # clause set — and its INSERT * leg demands the full source schema
    with pytest.raises(ValueError, match="source lacks column"):
        execute_dml(
            cat,
            "MERGE INTO t USING del_src ON t.k = del_src.k "
            "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *",
        )
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 70 AS k, 'g' AS s) z ON t.k = z.k "
        "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *",
    )
    assert out == {
        "table": "t", "merge_updated": 0, "merge_inserted": 1,
        "merge_deleted": 0,
    }
    assert 70 in {r["k"] for r in cat.read("t").collect()}


def test_create_table_as_select(spark, tmp_path):
    """CTAS publishes schema + data in one commit; IF NOT EXISTS
    no-ops on an existing table; a bare CTAS against one refuses."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
            "id long, grp string, amt double",
        ),
        "src",
    )
    cat.read("src").createOrReplaceTempView("src")
    out = execute_dml(
        cat,
        "CREATE TABLE totals AS SELECT grp, sum(amt) AS total "
        "FROM src GROUP BY grp",
    )
    assert out == {"table": "totals", "created": True, "rows": 2}
    got = {
        (r["grp"], r["total"]) for r in cat.read("totals").collect()
    }
    assert got == {("a", 40.0), ("b", 20.0)}
    # the committed schema types the table (not a footer sample)
    assert [f.name for f in cat._stored_schema("totals").fields] == [
        "grp", "total",
    ]
    out = execute_dml(
        cat, "CREATE TABLE IF NOT EXISTS totals AS SELECT 1 AS x"
    )
    assert out == {"table": "totals", "created": False}
    with pytest.raises(ValueError, match="already exists"):
        execute_dml(cat, "CREATE TABLE totals AS SELECT 1 AS x")
    # still DML-gated: the new table mutates through the façade
    out = execute_dml(cat, "DELETE FROM totals WHERE grp = 'b'")
    assert out == {"table": "totals", "deleted": 1}


def test_explain_dml_dry_run(spark, tmp_path):
    """EXPLAIN DELETE/UPDATE returns the metadata-only rewrite plan —
    candidate/carried file split and the provable blast radius — and
    mutates NOTHING (no version bump, no rows moved). EXPLAIN SELECT
    stays Spark's; EXPLAIN on other engine verbs refuses."""
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    # 4 files with disjoint k ranges: a range predicate prunes cleanly
    df = spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    cat.overwrite(df.repartitionByRange(4, "k"), "t")
    v = cat._read_manifest(strict=False)["version"]

    out = execute_dml(cat, "EXPLAIN DELETE FROM t WHERE k < 50")
    assert out["explain"] == "DELETE" and out["table"] == "t"
    assert out["files_total"] == 4
    assert out["files_candidates"] < 4 and out["files_carried"] >= 1
    # nothing happened
    assert cat._read_manifest(strict=False)["version"] == v
    assert cat.read("t").count() == 400

    # a file whose whole range matches is provable without reading
    out = execute_dml(cat, "EXPLAIN DELETE FROM t WHERE k >= 0")
    assert out["rows_provably_matching"] == 400
    assert out["files_undecidable"] == 0

    out = execute_dml(cat, "EXPLAIN UPDATE t SET g = g + 1 WHERE k < 50")
    assert out["explain"] == "UPDATE" and out["set_columns"] == ["g"]
    assert out["files_candidates"] < 4

    with pytest.raises(ValueError, match="not in 't'"):
        execute_dml(cat, "EXPLAIN UPDATE t SET nope = 1 WHERE k < 50")
    # INSERT/MERGE have their own dry runs now (r11) — see
    # test_explain_insert/_merge; non-plannable verbs still refuse
    assert execute_dml(cat, "EXPLAIN INSERT INTO t VALUES (1, 2)")[
        "explain"
    ] == "INSERT"
    with pytest.raises(ValueError, match="EXPLAIN supports"):
        execute_dml(cat, "EXPLAIN OPTIMIZE t ZORDER BY (k)")
    with pytest.raises(FileNotFoundError):
        execute_dml(cat, "EXPLAIN DELETE FROM ghost WHERE k = 1")
    # Spark's own EXPLAIN shapes pass through untouched
    assert execute_dml(cat, "EXPLAIN SELECT 1") is None
    assert execute_dml(cat, "EXPLAIN EXTENDED SELECT * FROM x") is None
    # the dry-run is consistent with what the real delete then does
    out = execute_dml(cat, "DELETE FROM t WHERE k < 50")
    assert out["deleted"] == 50
    assert cat.read("t").count() == 350


def test_explain_mirrors_real_run_refusals(spark, tmp_path):
    """EXPLAIN must fail exactly where the real statement would: same
    matview refusal, same FileNotFoundError for missing tables, and a
    malformed engine verb (DELETE without WHERE) refuses loudly
    instead of leaking to spark.sql (r10 review #3/#4/#6)."""
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        ),
        "t",
    )
    execute_dml(
        cat,
        "CREATE MATERIALIZED VIEW mv AS SELECT g, SUM(k) AS sk, "
        "COUNT(*) AS n FROM t GROUP BY g",
    )
    with pytest.raises(ValueError, match="materialized view"):
        execute_dml(cat, "EXPLAIN DELETE FROM mv WHERE g = 1")
    with pytest.raises(ValueError, match="materialized view"):
        execute_dml(cat, "EXPLAIN UPDATE mv SET n = 0 WHERE g = 1")
    with pytest.raises(FileNotFoundError):
        execute_dml(cat, "EXPLAIN UPDATE ghost SET k = 1 WHERE k = 1")
    with pytest.raises(ValueError, match="EXPLAIN supports"):
        execute_dml(cat, "EXPLAIN DELETE FROM t")  # no WHERE
    # no WHERE on a well-formed UPDATE head: same refusal as the real run
    with pytest.raises(ValueError, match="unsupported DML shape"):
        execute_dml(cat, "EXPLAIN UPDATE t SET k = 1")


def test_insert_values_boolean_and_temporal_literals_normalize(
    spark, tmp_path
):
    """TRUE/FALSE literals must land the way Spark SQL's own INSERT
    stores them: 'true'/'false' in a STRING column (Python str() says
    'True'), real booleans in a BOOLEAN column; TIMESTAMP/DATE
    literals land as their ISO forms."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame(
            [],
            "id long, s string, b boolean, ts timestamp, d date",
        ),
        "t",
    )
    out = execute_dml(
        cat,
        "INSERT INTO t VALUES (1, TRUE, FALSE, "
        "TIMESTAMP '2024-03-05 06:07:08', DATE '2024-03-05')",
    )
    assert out == {"table": "t", "inserted": 1}
    r = cat.read("t").first()
    assert r["s"] == "true"  # not Python's 'True'
    assert r["b"] is False
    assert str(r["ts"]) == "2024-03-05 06:07:08"
    assert str(r["d"]) == "2024-03-05"


# -- MERGE routing through the bucketed paths (r11) ---------------------------


def _kb_inodes(cat, table):
    import os

    d = cat._data_dirs(table)[0]
    out = {}
    for b in os.listdir(d):
        if not b.startswith("_kb="):
            continue
        bd = os.path.join(d, b)
        out[b] = sorted(
            os.stat(os.path.join(bd, f)).st_ino
            for f in os.listdir(bd)
            if f.endswith(".parquet")
        )
    return out


def _key_bucket(spark, k, nb=8):
    return (
        spark.createDataFrame([(k,)], "k long")
        .select(F.pmod(F.xxhash64("k"), F.lit(nb)).cast("int").alias("b"))
        .first()["b"]
    )


def test_merge_into_bucketed_target_is_partition_pruned(spark, tmp_path):
    """MERGE INTO a table carrying the _kb layout routes through
    merge_upsert_bucketed: only the buckets holding source keys are
    re-staged; every other bucket's files survive hardlink-identical
    (the façade edition of the bounded-write contract)."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    base = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    cat.merge_upsert_bucketed(
        base, "t", key_cols=["k"], num_buckets=8, audit_cols=False
    )
    before = _kb_inodes(cat, "t")
    assert len(before) == 8
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 7 AS k, 999 AS v) s ON k = k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    assert out == {"table": "t", "merged": 1}
    after = _kb_inodes(cat, "t")
    touched = f"_kb={_key_bucket(spark, 7)}"
    assert after[touched] != before[touched]
    assert all(after[b] == before[b] for b in before if b != touched)
    got = {r["k"]: r["v"] for r in cat.read("t").collect()}
    assert got[7] == 999 and got[6] == 60 and len(got) == 200
    # audit columns were NOT injected by the façade
    assert "date_created" not in cat.read("t").columns

    # matched-delete routes through the bucket-pruned delete fold
    before = _kb_inodes(cat, "t")
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 7 AS k) s ON k = k "
        "WHEN MATCHED THEN DELETE",
    )
    assert out == {"table": "t", "merge_deleted": 1}
    after = _kb_inodes(cat, "t")
    assert after[touched] != before[touched]
    assert all(after[b] == before[b] for b in before if b != touched)
    assert cat.read("t").where(F.col("k") == 7).count() == 0
    assert cat.count_rows("t") == 199


def test_merge_delete_bucketed_emptied_bucket_drops(spark, tmp_path):
    """A matched-delete covering a bucket's every key must DROP that
    bucket's partition, never hardlink its stale files back."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    base = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    cat.merge_upsert_bucketed(
        base, "t", key_cols=["k"], num_buckets=8, audit_cols=False
    )
    doomed = [
        r["k"]
        for r in spark.range(60)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(8)).cast("int").alias("b"),
        )
        .where(F.col("b") == 3)
        .collect()
    ]
    assert doomed
    spark.createDataFrame([(k,) for k in doomed], "k long").createOrReplaceTempView(
        "doomed_keys"
    )
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT k FROM doomed_keys) s ON k = k "
        "WHEN MATCHED THEN DELETE",
    )
    assert out == {"table": "t", "merge_deleted": len(doomed)}
    assert "_kb=3" not in _kb_inodes(cat, "t")
    assert cat.count_rows("t") == 60 - len(doomed)


def test_merge_into_bucketed_target_refuses_mismatched_on_keys(
    spark, tmp_path
):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    cat.merge_upsert_bucketed(
        base, "t", key_cols=["k"], num_buckets=4, audit_cols=False
    )
    with pytest.raises(ValueError, match="bucketed on keys"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS g, 9 AS k) s ON g = g "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
        )


# -- EXPLAIN INSERT/MERGE: write-path dry runs (r11) --------------------------


def test_explain_insert_reports_without_writing(spark, tmp_path):
    """EXPLAIN INSERT runs the same grammar body and single-pass probe
    as the real INSERT but commits nothing and reports cast losses per
    column instead of refusing — the warehouse dry-run for the write
    path (version-stability pinned)."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.append(
        spark.createDataFrame([(1, "a")], "id long, name string"), "t"
    )
    v = cat._read_manifest(strict=False)["version"]
    out = execute_dml(cat, "EXPLAIN INSERT INTO t VALUES (2, 'b'), (3, 'c')")
    assert out == {
        "explain": "INSERT",
        "table": "t",
        "mode": "into",
        "rows": 2,
        "cast_loss": {},
        "would_refuse": False,
    }
    # a lossy literal REPORTS instead of refusing — and still writes
    # nothing
    out = execute_dml(cat, "EXPLAIN INSERT OVERWRITE t VALUES ('x', 'y')")
    assert out["mode"] == "overwrite" and out["would_refuse"] is True
    assert out["cast_loss"] == {"id": 1}
    assert cat._read_manifest(strict=False)["version"] == v
    assert cat.count_rows("t") == 1
    # same refusals as the real run for actual grammar errors
    with pytest.raises(ValueError, match="not in target table"):
        execute_dml(cat, "EXPLAIN INSERT INTO t (ghost) VALUES (1)")
    with pytest.raises(ValueError, match="does not exist"):
        execute_dml(cat, "EXPLAIN INSERT INTO nope VALUES (1)")


def test_explain_merge_reports_blast_radius(spark, tmp_path):
    """EXPLAIN MERGE reports source rows, cast-loss, and — for
    bucketed targets — exactly which share of the table the write
    would re-stage; zero commits either way."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    cat.merge_upsert_bucketed(
        base, "bt", key_cols=["k"], num_buckets=8, audit_cols=False
    )
    cat.overwrite(base, "plain")
    v = cat._read_manifest(strict=False)["version"]
    out = execute_dml(
        cat,
        "EXPLAIN MERGE INTO bt USING (SELECT 7 AS k, 1 AS v) s ON k = k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    assert out["explain"] == "MERGE" and out["mode"] == "upsert"
    assert out["source_rows"] == 1 and out["would_refuse"] is False
    assert out["buckets_rewritten"] == 1 and out["buckets_total"] == 8
    out = execute_dml(
        cat,
        "EXPLAIN MERGE INTO plain USING (SELECT 7 AS k) s ON k = k "
        "WHEN MATCHED THEN DELETE",
    )
    assert out["mode"] == "merge_delete"
    assert out["rewrite"].startswith("full-table")
    assert cat._read_manifest(strict=False)["version"] == v
    assert cat.count_rows("bt") == 100 and cat.count_rows("plain") == 100
    # the same WHEN / ON / bucket-key refusals as the real run
    with pytest.raises(ValueError, match="bucketed on keys"):
        execute_dml(
            cat,
            "EXPLAIN MERGE INTO bt USING (SELECT 1 AS v, 2 AS k) s "
            "ON v = v WHEN MATCHED THEN DELETE",
        )
    # column-level SET now routes through the generalized clause set
    out = execute_dml(
        cat,
        "EXPLAIN MERGE INTO plain USING (SELECT 1 AS k) s ON k = k "
        "WHEN MATCHED THEN UPDATE SET v = 1",
    )
    assert out["mode"] == "merge_when"
    assert out["clauses"]["matched"]["sets"] == {"v": "1"}


def test_clustered_by_ddl_full_lifecycle(spark, tmp_path):
    """CREATE TABLE ... CLUSTERED BY (k) INTO n BUCKETS puts the table
    under the _kb layout from day one: INSERTs append partition-wise,
    OPTIMIZE folds back to one dir keeping the layout, and MERGE then
    rewrites only the source's buckets."""
    import os

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    out = execute_dml(
        cat,
        "CREATE TABLE t (k BIGINT, v STRING) "
        "CLUSTERED BY (k) INTO 8 BUCKETS",
    )
    assert out == {
        "table": "t", "created": True, "clustered_by": ["k"], "buckets": 8,
    }
    assert cat.bucket_meta("t") == {"num_buckets": 8, "key_cols": ["k"]}
    # INSERT takes the LOGICAL columns; the engine computes placement
    ex = execute_dml(cat, "EXPLAIN INSERT INTO t VALUES (1, 'a')")
    assert ex["rows"] == 1 and not ex["would_refuse"]
    execute_dml(cat, "INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    execute_dml(cat, "INSERT INTO t SELECT id AS k, 'x' AS v FROM range(4, 60)")
    assert cat.count_rows("t") == 59
    got = {r["k"]: r["_kb"] for r in cat.read("t").collect()}
    kb = {
        r["k"]: r["b"]
        for r in spark.range(60)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(8)).cast("int").alias("b"),
        )
        .collect()
    }
    assert all(got[k] == kb[k] for k in got)
    # MERGE before compaction: loud multi-dir refusal naming OPTIMIZE
    with pytest.raises(ValueError, match="OPTIMIZE"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k, 'z' AS v) s ON k = k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
        )
    # OPTIMIZE folds the appended dirs partition-wise
    assert execute_dml(cat, "OPTIMIZE t")["optimized"] is True
    assert len(cat._data_dirs("t")) == 1
    d = cat._data_dirs("t")[0]
    assert any(e.startswith("_kb=") for e in os.listdir(d))
    # MERGE now bounded: one source key -> one re-staged bucket
    before = _kb_inodes(cat, "t")
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 1 AS k, 'z' AS v) s ON k = k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    assert out == {"table": "t", "merged": 1}
    after = _kb_inodes(cat, "t")
    touched = f"_kb={kb[1]}"
    assert after[touched] != before[touched]
    assert all(after[b] == before[b] for b in before if b != touched)
    assert {r["v"] for r in cat.read("t").where(F.col("k") == 1).collect()} == {"z"}


def test_clustered_by_ctas_and_refusals(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    ).createOrReplaceTempView("ctas_src")
    out = execute_dml(
        cat,
        "CREATE TABLE t CLUSTERED BY (k) INTO 4 BUCKETS "
        "AS SELECT k, g FROM ctas_src",
    )
    assert out["created"] and out["rows"] == 40 and out["buckets"] == 4
    assert cat.bucket_meta("t") == {"num_buckets": 4, "key_cols": ["k"]}
    assert len(_kb_inodes(cat, "t")) == 4
    with pytest.raises(ValueError, match="already exists"):
        execute_dml(
            cat,
            "CREATE TABLE t (k BIGINT) CLUSTERED BY (k) INTO 4 BUCKETS",
        )
    assert execute_dml(
        cat,
        "CREATE TABLE IF NOT EXISTS t (k BIGINT) "
        "CLUSTERED BY (k) INTO 4 BUCKETS",
    ) == {"table": "t", "created": False}
    with pytest.raises(ValueError, match="not in the column list"):
        execute_dml(
            cat,
            "CREATE TABLE u (k BIGINT) CLUSTERED BY (ghost) INTO 4 BUCKETS",
        )
    with pytest.raises(ValueError, match="reserved bucket-placement"):
        execute_dml(
            cat,
            "CREATE TABLE u (k BIGINT, _kb INT) "
            "CLUSTERED BY (k) INTO 4 BUCKETS",
        )


def test_describe_history_and_restore_table_sql(spark, tmp_path):
    """DESCRIBE HISTORY lists exactly the commits that changed the
    table (operation-tagged load ids); RESTORE TABLE ... TO VERSION AS
    OF rolls one table back as a new commit."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(spark.range(5).toDF("k"), "t")          # v1
    cat.overwrite(spark.range(3).toDF("x"), "other")      # v2: not t
    cat.delete_where("t", [("k", "=", 1)], mode="dv")     # v3
    cat.rename_column("t", "k", "pk")                     # v4
    out = execute_dml(cat, "DESCRIBE HISTORY t")
    versions = [h["version"] for h in out["history"]]
    assert versions == [1, 3, 4]  # v2 touched only the other table
    ops = [h["operation"] for h in out["history"]]
    assert any("dv-delete-t" in o for o in ops)
    assert any("rename-column-t" in o for o in ops)
    out = execute_dml(cat, "RESTORE TABLE t TO VERSION AS OF 1")
    assert out == {"table": "t", "restored_to": 1, "rows": 5}
    assert cat.read("t").columns == ["k"]  # rename + vector rolled back
    # the restore itself is a new history entry
    hist = execute_dml(cat, "DESCRIBE HISTORY t")["history"]
    assert hist[-1]["version"] == cat.versions()[-1]["version"]
    with pytest.raises(FileNotFoundError):
        execute_dml(cat, "DESCRIBE HISTORY nope")


def test_rename_table_sql(spark, tmp_path):
    """ALTER TABLE ... RENAME TO: one metadata commit moves every
    per-table record (schema, checks, layout, vectors, mapping,
    properties, bucket sidecar) — zero data movement; history keeps the
    old name; a feed window crossing the rename RAISES instead of
    fabricating inserts; views/consumers on the table refuse."""
    import os

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite_bucketed(
        spark.range(20).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        "t", 4, ["k"],
    )
    cat.add_check("t", "v_ok", "v >= 0")
    cat.set_table_property("t", "dml.mode", "merge-on-read")
    cat.delete_where("t", [("k", "=", 3)], mode="dv")
    v_pre = cat.versions()[-1]["version"]
    inodes = {
        os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t")
        for f in cat._dir_parquet_files(d)
    }
    out = execute_dml(cat, "ALTER TABLE t RENAME TO t2")
    assert out == {"table": "t", "renamed_to": "t2"}
    assert not cat.exists("t") and cat.exists("t2")
    assert {
        os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t2")
        for f in cat._dir_parquet_files(d)
    } == inodes
    assert cat.read("t2").count() == 19  # the vector followed
    assert cat.checks("t2") == {"v_ok": "v >= 0"}
    assert cat.table_properties("t2") == {"dml.mode": "merge-on-read"}
    assert cat.bucket_meta("t2") == {"num_buckets": 4, "key_cols": ["k"]}
    # bucketed merge still bounded under the new name
    from gcp_datalake_pipeline_spark.storage import kb_col  # noqa: F401

    cat.merge_upsert_bucketed(
        spark.createDataFrame([(1, 99.0)], "k long, v double"),
        "t2", ["k"], 4, audit_cols=False,
    )
    assert cat.read("t2").where("k = 1").first()["v"] == 99.0
    # history as it was: the old name still time-travels
    assert cat.read_at("t", v_pre).count() == 19
    # a feed crossing the rename refuses loudly
    with pytest.raises(ValueError, match="renamed the table"):
        cat.table_changes("t2", v_pre).count()
    # ...but a post-rename window works
    v_now = cat.versions()[-1]["version"]
    cat.delete_where("t2", [("k", "=", 5)])
    assert cat.table_changes("t2", v_now).count() == 1
    # collisions and dependency guards
    cat.overwrite(spark.range(3).toDF("x"), "other")
    with pytest.raises(ValueError, match="already exists"):
        execute_dml(cat, "ALTER TABLE t2 RENAME TO other")
    from gcp_datalake_pipeline_spark.streaming.cdf import pump_table_changes

    pump_table_changes(cat, "t2", "cons")
    with pytest.raises(ValueError, match="change-feed consumer"):
        cat.rename_table("t2", "t3")


def test_partial_optimize_rewrites_only_named_buckets(spark, tmp_path):
    """OPTIMIZE ... WHERE _kb IN (...): the named buckets' appended
    fragments fold across every dir while every OTHER bucket's files
    hardlink-carry (inode pins) — and the named buckets' pending
    deletion vectors fold while carried buckets keep theirs (a partial
    vector fold). Values match a full recompute throughout."""
    import os

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    df = spark.range(0, 80).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    cat.overwrite_bucketed(df, "t", 4, ["k"])
    # two appends fragment every bucket across three dirs
    for lo, hi in ((80, 120), (120, 160)):
        more = spark.range(lo, hi).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        )
        from gcp_datalake_pipeline_spark.storage import kb_col

        cat.append(
            more.withColumn("_kb", kb_col(["k"], 4)), "t",
            partition_cols=["_kb"],
        )
    # vectors in (probably) several buckets
    assert cat.delete_where("t", [("k", "<", 8)], mode="dv") == 8
    want = sorted(
        (r["k"], r["v"]) for r in cat.read("t").drop("_kb").collect()
    )
    pre = {
        os.path.join(d, f): os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t")
        for f in cat._dir_parquet_files(d)
    }
    pre_by_bucket = {}
    for p, ino in pre.items():
        part = next(s for s in p.split(os.sep) if s.startswith("_kb="))
        pre_by_bucket.setdefault(part, set()).add(ino)
    out = execute_dml(cat, "OPTIMIZE t WHERE _kb IN (1, 2)")
    assert out == {"table": "t", "optimized": True, "buckets": [1, 2]}
    post = {
        os.path.join(d, f): os.stat(os.path.join(d, f)).st_ino
        for d in cat._data_dirs("t")
        for f in cat._dir_parquet_files(d)
    }
    post_by_bucket = {}
    for p, ino in post.items():
        part = next(s for s in p.split(os.sep) if s.startswith("_kb="))
        post_by_bucket.setdefault(part, set()).add(ino)
    # carried buckets: identical inodes; named buckets: all-new files
    for part in ("_kb=0", "_kb=3"):
        assert post_by_bucket[part] == pre_by_bucket[part]
    for part in ("_kb=1", "_kb=2"):
        assert not (post_by_bucket[part] & pre_by_bucket[part])
    got = sorted(
        (r["k"], r["v"]) for r in cat.read("t").drop("_kb").collect()
    )
    assert got == want
    # partial vector fold: folded buckets' entries retired, carried kept
    info = cat.dv_info("t")
    if info is not None:  # some deleted keys may hash into 1/2 only
        live_names = {
            cat._dv_name(f)
            for d in cat._data_dirs("t")
            for f in cat._dir_parquet_files(d)
        }
        assert set(info["files"]) <= live_names
    assert cat.count_rows("t") == 152
    # bucket ids out of range / non-_kb predicates refuse
    with pytest.raises(ValueError, match="outside"):
        cat.compact_buckets("t", [9])
    with pytest.raises(ValueError, match="only _kb"):
        execute_dml(cat, "OPTIMIZE t WHERE k = 3")
    # unbucketed tables refuse the partial form
    cat.overwrite(spark.range(4).toDF("x"), "plain")
    with pytest.raises(ValueError, match="no _kb bucket layout"):
        execute_dml(cat, "OPTIMIZE plain WHERE _kb = 0")
    # a no-file bucket set publishes nothing
    v = cat.versions()[-1]["version"]
    empty_bucket = [
        b for b in range(4)
        if not any(f"_kb={b}" in p for p in post)
    ]
    if empty_bucket:
        assert cat.compact_buckets("t", empty_bucket[:1]) is False
        assert cat.versions()[-1]["version"] == v


def test_show_create_table_round_trips(spark, tmp_path):
    """SHOW CREATE TABLE reconstructs the logical definition from the
    manifest alone, and executing its output against a FRESH catalog
    reproduces the same definition (identity, generated, bucket
    layout, UNIQUE + CHECK constraints, properties)."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    a = TransactionalCatalog(spark=spark, root=str(tmp_path / "a"))
    execute_dml(
        a,
        "CREATE TABLE t (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "k BIGINT, amt DOUBLE, "
        "tax BIGINT GENERATED ALWAYS AS (CAST(ROUND(amt * 100, 0) AS "
        "BIGINT) * 19 DIV 100))",
    )
    execute_dml(a, "ALTER TABLE t ADD CONSTRAINT ku UNIQUE (k)")
    execute_dml(a, "ALTER TABLE t ADD CONSTRAINT pos CHECK (amt >= 0)")
    execute_dml(
        a, "ALTER TABLE t SET TBLPROPERTIES ('dml.mode' = 'merge-on-read')"
    )
    out = execute_dml(a, "SHOW CREATE TABLE t")
    assert "GENERATED ALWAYS AS IDENTITY" in out["create"]
    assert "GENERATED ALWAYS AS (CAST" in out["create"]
    assert "UNIQUE (k)" in out["create"]

    b = TransactionalCatalog(spark=spark, root=str(tmp_path / "b"))
    for stmt in out["create"].split(";\n"):
        execute_dml(b, stmt)
    out2 = execute_dml(b, "SHOW CREATE TABLE t")
    assert out2["create"] == out["create"]
    # the recreated definition behaves: identity mints, unique enforces
    r = execute_dml(b, "INSERT INTO t (k, amt) VALUES (1, 100.0)")
    assert r["identity_range"] == [1, 1]
    got = b.read("t").first()
    assert (got["id"], got["k"], got["tax"]) == (1, 1, 1900)  # cents
    # bucketed tables round-trip their CLUSTERED BY clause too
    execute_dml(
        a, "CREATE TABLE bt (k BIGINT, v DOUBLE) "
        "CLUSTERED BY (k) INTO 8 BUCKETS",
    )
    out3 = execute_dml(a, "SHOW CREATE TABLE bt")
    assert "CLUSTERED BY (k) INTO 8 BUCKETS" in out3["create"]
    assert "_kb" not in out3["create"]


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    """VACUUM ... DRY RUN lists exactly what the real run then
    reclaims, deleting nothing itself — audit the blast radius before
    shrinking the time-travel horizon."""
    import os

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.collect_stats = False
    cat.overwrite(spark.range(5).toDF("k"), "t")
    for i in range(3):
        cat.overwrite(spark.range(5 + i).toDF("k"), "t")
    dry = execute_dml(cat, "VACUUM RETAIN 1 VERSIONS DRY RUN")
    assert dry["dry_run"] and dry["would_remove"]
    # nothing was deleted: every listed path still exists (version
    # manifests live under _versions/, staged dirs under _loads/)
    for rel in dry["would_remove"]:
        assert os.path.exists(os.path.join(cat.root, rel)), rel
    assert cat.read("t").count() == 7
    # min_age guards the real run's staged-dir deletion, so compare
    # against the real call at age 0 (the dry run mirrors it)
    real = sorted(cat.vacuum(retain_versions=1, min_age_seconds=0.0))
    dry_age0 = sorted(
        r
        for r in dry["would_remove"]
        if r.startswith("_versions")
    )
    assert [r for r in real if r.startswith("_versions")] == dry_age0
    for rel in real:
        assert not os.path.exists(os.path.join(cat.root, rel)), rel


def test_create_table_two_identity_columns_refuses(spark, tmp_path):
    """Two IDENTITY clauses: the strip used to remove BOTH while
    registering only the FIRST, silently degrading the second to a
    plain nullable BIGINT — now a loud refusal."""
    import pytest

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    with pytest.raises(ValueError, match="multiple IDENTITY"):
        execute_dml(
            cat,
            "CREATE TABLE t (a BIGINT GENERATED ALWAYS AS IDENTITY, "
            "k BIGINT, b BIGINT GENERATED ALWAYS AS IDENTITY)",
        )
    assert not cat.exists("t")


def test_explain_insert_computed_bucketed_matches_real_refusal(
    spark, tmp_path
):
    """EXPLAIN INSERT must refuse exactly where the real INSERT does:
    after ALTER TABLE ... CLUSTERED BY on a table with computed
    columns, both paths raise the same bucketed-target error."""
    import pytest

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import TransactionalCatalog

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    execute_dml(
        cat,
        "CREATE TABLE t (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "k BIGINT, v DOUBLE)",
    )
    execute_dml(cat, "INSERT INTO t (k, v) VALUES (1, 1.0)")
    execute_dml(cat, "ALTER TABLE t CLUSTERED BY (k) INTO 4 BUCKETS")
    with pytest.raises(ValueError, match="engine-computed"):
        execute_dml(cat, "INSERT INTO t (k, v) VALUES (2, 2.0)")
    with pytest.raises(ValueError, match="engine-computed"):
        execute_dml(cat, "EXPLAIN INSERT INTO t (k, v) VALUES (2, 2.0)")


# -- multi-statement SQL transactions (r13) ------------------------------------


def test_begin_commit_multi_table_atomic(spark, tmp_path):
    """BEGIN; INSERT...; INSERT...; COMMIT — every statement stages
    into ONE transaction, the whole block publishes in ONE manifest
    swap, and constraint probes see the intra-block staged state (a
    parent row inserted first satisfies the child's FOREIGN KEY in the
    same commit)."""
    import pytest

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import (
        CheckViolation,
        TransactionalCatalog,
    )

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    execute_dml(cat, "CREATE TABLE p (k BIGINT, v STRING)")
    execute_dml(cat, "CREATE TABLE c (id BIGINT, fk BIGINT)")
    execute_dml(cat, "ALTER TABLE p ADD CONSTRAINT pk UNIQUE (k)")
    execute_dml(
        cat,
        "ALTER TABLE c ADD CONSTRAINT cfk FOREIGN KEY (fk) "
        "REFERENCES p (k)",
    )
    v0 = cat._read_manifest(strict=False)["version"]
    out = execute_dml(
        cat,
        "BEGIN; INSERT INTO p VALUES (1, 'a'); "
        "INSERT INTO c VALUES (10, 1); COMMIT",
    )
    assert out["transaction"] == "committed"
    assert [r["inserted"] for r in out["statements"]] == [1, 1]
    # ONE commit for the whole block
    assert cat._read_manifest(strict=False)["version"] == v0 + 1
    assert cat.read("p").count() == 1 and cat.read("c").count() == 1

    # a failing statement mid-block leaves NOTHING visible
    with pytest.raises(CheckViolation):
        execute_dml(
            cat,
            "BEGIN; INSERT INTO p VALUES (2, 'b'); "
            "INSERT INTO c VALUES (11, 404); COMMIT",
        )
    assert cat._read_manifest(strict=False)["version"] == v0 + 1
    assert cat.read("p").count() == 1 and cat.read("c").count() == 1

    # ROLLBACK discards a clean block
    out = execute_dml(
        cat, "BEGIN; INSERT INTO p VALUES (3, 'c'); ROLLBACK"
    )
    assert out["transaction"] == "rolled_back"
    assert cat.read("p").count() == 1
    assert cat._read_manifest(strict=False)["version"] == v0 + 1

    # MERGE inside a block; string literal with a semicolon survives
    out = execute_dml(
        cat,
        "BEGIN; MERGE INTO p USING (SELECT 1 AS k, 'x;y' AS v) "
        "ON k = k WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *; COMMIT",
    )
    assert out["transaction"] == "committed"
    assert cat.read("p").first()["v"] == "x;y"


def test_begin_block_identity_and_generated(spark, tmp_path):
    """Engine-computed columns work inside BEGIN blocks: the insert
    stages into the OPEN transaction (no nested-transaction error), a
    second identity INSERT in the same block continues the block's
    staged range, the whole block is one commit, and a ROLLBACK leaves
    the high-water mark untouched."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import (
        TransactionalCatalog,
    )

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    execute_dml(
        cat,
        "CREATE TABLE t (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "v STRING)",
    )
    v0 = cat._read_manifest(strict=False)["version"]
    out = execute_dml(
        cat,
        "BEGIN; INSERT INTO t (v) VALUES ('a'); "
        "INSERT INTO t (v) VALUES ('b'), ('c'); COMMIT",
    )
    assert [r["identity_range"] for r in out["statements"]] == [
        [1, 1], [2, 3],
    ]
    assert cat._read_manifest(strict=False)["version"] == v0 + 1
    assert sorted(
        (r["id"], r["v"]) for r in cat.read("t").collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    # rolled-back block never advances the mark
    execute_dml(cat, "BEGIN; INSERT INTO t (v) VALUES ('x'); ROLLBACK")
    out = execute_dml(cat, "INSERT INTO t (v) VALUES ('d')")
    assert out["identity_range"] == [4, 4]
    # GENERATED ALWAYS AS (expr) stages into the block too
    execute_dml(
        cat,
        "CREATE TABLE g (a BIGINT, b BIGINT GENERATED ALWAYS AS (a * 2))",
    )
    execute_dml(cat, "BEGIN; INSERT INTO g (a) VALUES (5); COMMIT")
    assert [(r["a"], r["b"]) for r in cat.read("g").collect()] == [(5, 10)]


def test_begin_block_refusals(spark, tmp_path):
    import pytest

    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import (
        TransactionalCatalog,
    )

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    execute_dml(cat, "CREATE TABLE t (k BIGINT)")
    with pytest.raises(ValueError, match="COMMIT or ROLLBACK"):
        execute_dml(cat, "BEGIN; INSERT INTO t VALUES (1)")
    # CREATE TABLE now stages into the block; other DDL still refuses
    with pytest.raises(ValueError, match="only INSERT"):
        execute_dml(cat, "BEGIN; TRUNCATE TABLE t; COMMIT")
    # empty COMMIT burns no version
    v = cat._read_manifest(strict=False)["version"]
    out = execute_dml(cat, "BEGIN; COMMIT")
    assert out == {"transaction": "committed", "statements": []}
    assert cat._read_manifest(strict=False)["version"] == v


def test_begin_block_delete_update_distinct_tables(spark, tmp_path):
    """Copy-on-write DELETE/UPDATE inside a BEGIN block join the open
    transaction: one commit with the block's other writes, rollback
    discards everything, and a rewrite of a table the block already
    staged refuses (rolling the block back)."""
    from gcp_datalake_pipeline_spark.dml_sql import execute_dml
    from gcp_datalake_pipeline_spark.transactions import (
        TransactionalCatalog,
    )

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    execute_dml(cat, "CREATE TABLE t (k BIGINT, v BIGINT)")
    execute_dml(cat, "CREATE TABLE s (k BIGINT, v BIGINT)")
    execute_dml(cat, "CREATE TABLE u (k BIGINT)")
    execute_dml(cat, "INSERT INTO t VALUES (1, 10), (2, 20)")
    execute_dml(cat, "INSERT INTO s VALUES (5, 50)")
    v0 = cat._read_manifest(strict=False)["version"]
    out = execute_dml(
        cat,
        "BEGIN; DELETE FROM t WHERE k = 1; "
        "UPDATE s SET v = 99 WHERE k = 5; "
        "INSERT INTO u VALUES (7); COMMIT",
    )
    assert out["transaction"] == "committed"
    assert cat._read_manifest(strict=False)["version"] == v0 + 1
    assert {r["k"] for r in cat.read("t").collect()} == {2}
    assert cat.read("s").first()["v"] == 99
    assert cat.read("u").count() == 1
    # rollback discards the DML legs
    execute_dml(
        cat, "BEGIN; DELETE FROM t WHERE k = 2; ROLLBACK"
    )
    assert {r["k"] for r in cat.read("t").collect()} == {2}
    # same-table INSERT-then-DELETE refuses and rolls the block back
    import pytest

    with pytest.raises(RuntimeError, match="already staged"):
        execute_dml(
            cat,
            "BEGIN; INSERT INTO t VALUES (9, 90); "
            "DELETE FROM t WHERE k = 9; COMMIT",
        )
    assert {r["k"] for r in cat.read("t").collect()} == {2}
    # merge-on-read DML refuses EARLY in a block (vectors publish
    # outside the staged-dir protocol) with the documented message —
    # never a late nested-transaction error after paying for scans
    execute_dml(
        cat,
        "ALTER TABLE s SET TBLPROPERTIES ('dml.mode' = 'merge-on-read')",
    )
    for stmt in ("DELETE FROM s WHERE k = 5", "UPDATE s SET v = 1 WHERE k = 5"):
        with pytest.raises(RuntimeError, match="staged-dir protocol"):
            execute_dml(cat, f"BEGIN; {stmt}; COMMIT")
    assert cat.read("s").first()["v"] == 99


# -- generalized MERGE WHEN clauses (conditional / BY SOURCE) -----------


def _merge_cat(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, v string, amt double",
        ),
        "t",
    )
    return cat


def test_merge_matched_cond_update(spark, tmp_path):
    """WHEN MATCHED AND <cond> THEN UPDATE SET *: only rows passing
    the condition take the source values; conds see both sides via
    src./tgt. qualification."""
    cat = _merge_cat(spark, tmp_path)
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT k, 'U' AS v, amt FROM (VALUES "
        "(1, 1.0), (2, 2.0), (3, 3.0)) AS x(k, amt)) ON k = k "
        "WHEN MATCHED AND tgt.amt < 25 THEN UPDATE SET *",
    )
    assert out == {
        "table": "t", "merge_updated": 2, "merge_inserted": 0,
        "merge_deleted": 0,
    }
    assert sorted(
        (r["k"], r["v"], r["amt"]) for r in cat.read("t").collect()
    ) == [(1, "U", 1.0), (2, "U", 2.0), (3, "c", 30.0)]


def test_merge_matched_cond_delete_plus_insert(spark, tmp_path):
    cat = _merge_cat(spark, tmp_path)
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT k, v, amt FROM (VALUES "
        "(1, 'x', 1.0), (9, 'new', 90.0)) AS x(k, v, amt)) ON k = k "
        "WHEN MATCHED AND src.amt < 5 THEN DELETE "
        "WHEN NOT MATCHED AND src.amt > 50 THEN INSERT *",
    )
    assert out == {
        "table": "t", "merge_updated": 0, "merge_inserted": 1,
        "merge_deleted": 1,
    }
    assert sorted(r["k"] for r in cat.read("t").collect()) == [2, 3, 9]


def test_merge_not_matched_by_source_full_sync(spark, tmp_path):
    """All three clauses = snapshot sync: the target converges to the
    source in ONE atomic statement."""
    cat = _merge_cat(spark, tmp_path)
    v = cat._read_manifest(strict=False)["version"]
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT k, v, amt FROM (VALUES "
        "(2, 'b2', 21.0), (7, 'g', 70.0)) AS x(k, v, amt)) ON k = k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    assert out == {
        "table": "t", "merge_updated": 1, "merge_inserted": 1,
        "merge_deleted": 2,
    }
    assert cat._read_manifest(strict=False)["version"] == v + 1
    assert sorted(
        (r["k"], r["v"]) for r in cat.read("t").collect()
    ) == [(2, "b2"), (7, "g")]


def test_merge_by_source_cond(spark, tmp_path):
    cat = _merge_cat(spark, tmp_path)
    execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
        "WHEN NOT MATCHED BY SOURCE AND tgt.v = 'b' THEN DELETE",
    )
    assert sorted(r["k"] for r in cat.read("t").collect()) == [1, 3]


def test_merge_when_bucketed_prunes_to_touched_buckets(spark, tmp_path):
    """Bucketed target, no BY SOURCE: only the source keys' _kb
    partitions rewrite; every other bucket's files hardlink-carry
    (inode-pinned via the CURRENT manifest)."""
    import os

    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    execute_dml(
        cat,
        "CREATE TABLE b (k BIGINT, v STRING) "
        "CLUSTERED BY (k) INTO 8 BUCKETS",
    )
    execute_dml(
        cat,
        "INSERT INTO b SELECT k, v FROM (VALUES "
        + ", ".join(f"({i}, 'r{i}')" for i in range(40))
        + ") AS x(k, v)",
    )

    def inodes():
        out = {}
        for d in cat._data_dirs("b"):
            for dirpath, _dn, fns in os.walk(d):
                part = os.path.basename(dirpath)
                for fn in fns:
                    if fn.endswith(".parquet"):
                        out.setdefault(part, set()).add(
                            os.stat(os.path.join(dirpath, fn)).st_ino
                        )
        return out

    plan = execute_dml(
        cat,
        "EXPLAIN MERGE INTO b USING (SELECT 5 AS k, 'UPD' AS v) "
        "ON k = k WHEN MATCHED AND tgt.v != 'UPD' THEN UPDATE SET *",
    )
    assert plan["mode"] == "merge_when"
    assert plan["buckets_rewritten"] == 1
    before = inodes()
    out = execute_dml(
        cat,
        "MERGE INTO b USING (SELECT 5 AS k, 'UPD' AS v) ON k = k "
        "WHEN MATCHED AND tgt.v != 'UPD' THEN UPDATE SET *",
    )
    assert out["merge_updated"] == 1
    after = inodes()
    from gcp_datalake_pipeline_spark.storage import kb_col

    hot = (
        spark.createDataFrame([(5,)], "k long")
        .select(kb_col(["k"], 8).alias("kb"))
        .first()["kb"]
    )
    for part, inos in before.items():
        if part == f"_kb={hot}":
            assert not (inos & after.get(part, set())), (
                "touched bucket must rewrite"
            )
        else:
            assert inos <= after.get(part, set()), (
                f"untouched bucket {part} must hardlink-carry"
            )
    assert cat.read("b").count() == 40
    assert (
        cat.read("b").where(F.col("k") == 5).first()["v"] == "UPD"
    )


def test_merge_when_bucketed_by_source_keeps_layout(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    execute_dml(
        cat,
        "CREATE TABLE b (k BIGINT, v STRING) "
        "CLUSTERED BY (k) INTO 4 BUCKETS",
    )
    execute_dml(
        cat,
        "INSERT INTO b SELECT k, v FROM (VALUES (1, 'a'), (2, 'b'), "
        "(3, 'c')) AS x(k, v)",
    )
    plan = execute_dml(
        cat,
        "EXPLAIN MERGE INTO b USING (SELECT 1 AS k, 'a' AS v) ON k = k "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    assert plan["buckets_rewritten"] == plan["buckets_total"] == 4
    assert "full-sync" in plan["rewrite"]
    execute_dml(
        cat,
        "MERGE INTO b USING (SELECT k, v FROM (VALUES (1, 'a1'), "
        "(9, 'i')) AS x(k, v)) ON k = k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    assert cat.bucket_meta("b") == {"num_buckets": 4, "key_cols": ["k"]}
    assert sorted(
        (r["k"], r["v"]) for r in cat.read("b").collect()
    ) == [(1, "a1"), (9, "i")]
    # pruned point reads keep working on the re-synced layout
    assert [
        r["v"] for r in cat.read("b", predicates=[("k", "=", 9)]).collect()
    ] == ["i"]


def test_merge_by_source_fk_restrict(spark, tmp_path):
    """A BY SOURCE delete that would orphan a child FK row refuses and
    publishes nothing."""
    from gcp_datalake_pipeline_spark.transactions import CheckViolation

    cat = _merge_cat(spark, tmp_path)
    cat.add_unique_constraint("t", "pk", ["k"])
    cat.overwrite(
        spark.createDataFrame([(100, 2)], "id long, fk long"), "child"
    )
    cat.add_fk_constraint("child", "cf", ["fk"], "t", ["k"])
    v = cat._read_manifest(strict=False)["version"]
    with pytest.raises(CheckViolation, match="reference the removed"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        )
    assert cat._read_manifest(strict=False)["version"] == v
    assert cat.read("t").count() == 3


def test_merge_when_unique_enforced(spark, tmp_path):
    """A conditional UPDATE SET * that lands duplicate UNIQUE values
    refuses via the write path's constraint probe."""
    from gcp_datalake_pipeline_spark.transactions import CheckViolation

    cat = _merge_cat(spark, tmp_path)
    cat.add_unique_constraint("t", "uv", ["v"])
    with pytest.raises(CheckViolation):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k, 'b' AS v, 0.0 AS amt) "
            "ON k = k WHEN MATCHED THEN UPDATE SET *",
        )
    assert sorted(r["v"] for r in cat.read("t").collect()) == [
        "a", "b", "c",
    ]


def test_merge_when_grammar_refusals(spark, tmp_path):
    cat = _merge_cat(spark, tmp_path)
    with pytest.raises(ValueError, match="not a MERGE clause"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
            "WHEN MATCHED BY SOURCE THEN DELETE",
        )
    with pytest.raises(ValueError, match="column-level SET"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
        )
    with pytest.raises(ValueError, match="duplicate MERGE WHEN MATCHED"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
            "WHEN MATCHED THEN DELETE WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="supports"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
            "WHEN NOT MATCHED THEN DELETE",
        )


def test_merge_when_classic_shapes_unchanged(spark, tmp_path):
    """The canonical pair and matched-delete still route through the
    fast paths (result keys unchanged: merged / merge_deleted)."""
    cat = _merge_cat(spark, tmp_path)
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 1 AS k, 'a2' AS v, 11.0 AS amt) "
        "ON k = k WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert out == {"table": "t", "merged": 1}
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 3 AS k) ON k = k "
        "WHEN MATCHED THEN DELETE",
    )
    assert out == {"table": "t", "merge_deleted": 1}
    # clause-less MERGE keeps its historical upsert meaning
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 8 AS k, 'h' AS v, 1.0 AS amt) "
        "ON k = k",
    )
    assert out == {"table": "t", "merged": 1}


def test_merge_identity_keeps_mints_and_refuses(spark, tmp_path):
    """GENERATED ALWAYS AS IDENTITY under MERGE: a source carrying the
    identity column refuses (real run AND EXPLAIN — the classic upsert
    used to land explicit ids that bypassed the high-water mark, so a
    later INSERT minted a DUPLICATE); ON the identity column refuses
    for writing merges; a natural-key merge keeps matched ids, mints
    inserted ids from the mark, and the mark advances atomically."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    execute_dml(
        cat,
        "CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "nk STRING, v STRING)",
    )
    execute_dml(cat, "INSERT INTO idt (nk, v) VALUES ('a', 'x'), ('b', 'y')")
    for stmt in (
        "MERGE INTO idt USING (SELECT 3 AS id, 'c' AS nk, 'z' AS v) "
        "ON nk = nk",
        "EXPLAIN MERGE INTO idt USING (SELECT 3 AS id, 'c' AS nk, "
        "'z' AS v) ON nk = nk",
    ):
        with pytest.raises(ValueError, match="GENERATED ALWAYS"):
            execute_dml(cat, stmt)
    with pytest.raises(ValueError, match="natural key"):
        execute_dml(
            cat, "MERGE INTO idt USING (SELECT 'c' AS nk, 'z' AS v) "
            "ON id = id",
        )
    out = execute_dml(
        cat,
        "MERGE INTO idt USING (SELECT nk, v FROM (VALUES ('a', 'X2'), "
        "('c', 'new')) AS s(nk, v)) ON nk = nk",
    )
    assert out == {
        "table": "idt", "merge_updated": 1, "merge_inserted": 1,
        "merge_deleted": 0,
    }
    # the later INSERT continues the mark — no duplicate id
    execute_dml(cat, "INSERT INTO idt (nk, v) VALUES ('d', 'w')")
    rows = sorted(
        (r["id"], r["nk"], r["v"]) for r in cat.read("idt").collect()
    )
    assert rows == [
        (1, "a", "X2"), (2, "b", "y"), (3, "c", "new"), (4, "d", "w"),
    ]
    # matched-delete BY id stays allowed — it never writes id values
    out = execute_dml(
        cat,
        "MERGE INTO idt USING (SELECT 2 AS id) ON id = id "
        "WHEN MATCHED THEN DELETE",
    )
    assert out == {"table": "idt", "merge_deleted": 1}


def test_merge_generated_columns_recompute(spark, tmp_path):
    """GENERATED ALWAYS AS (expr) recomputes over the post-image: an
    updated row's expression tracks the NEW source values, inserts
    compute, kept rows re-derive their own value."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    execute_dml(
        cat,
        "CREATE TABLE g (k BIGINT, a BIGINT, "
        "tot BIGINT GENERATED ALWAYS AS (a * 2))",
    )
    execute_dml(cat, "INSERT INTO g (k, a) VALUES (1, 10), (2, 20)")
    out = execute_dml(
        cat,
        "MERGE INTO g USING (SELECT k, a FROM (VALUES (1, 50), (9, 5)) "
        "AS s(k, a)) ON k = k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    assert out == {
        "table": "g", "merge_updated": 1, "merge_inserted": 1,
        "merge_deleted": 0,
    }
    assert sorted(
        (r["k"], r["a"], r["tot"]) for r in cat.read("g").collect()
    ) == [(1, 50, 100), (2, 20, 40), (9, 5, 10)]


def test_merge_column_level_set_and_insert(spark, tmp_path):
    """Column-level MERGE clauses: SET col = expr touches only the
    listed columns (exprs see src./tgt.), INSERT (cols) VALUES fills
    the listed columns and NULLs the rest, and BY SOURCE UPDATE marks
    unmatched target rows without deleting them."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0, "live"), (2, "b", 20.0, "live")],
            "k long, v string, amt double, status string",
        ),
        "t",
    )
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 1 AS k, 5.0 AS delta) ON k = k "
        "WHEN MATCHED THEN UPDATE SET amt = tgt.amt + src.delta, "
        "status = 'bumped'",
    )
    assert out["merge_updated"] == 1
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 9 AS k, 'zz' AS nm) ON k = k "
        "WHEN NOT MATCHED THEN INSERT (k, v, status) "
        "VALUES (src.k, upper(src.nm), 'new')",
    )
    assert out["merge_inserted"] == 1
    assert sorted(
        (r["k"], r["v"], r["amt"], r["status"])
        for r in cat.read("t").collect()
    ) == [
        (1, "a", 15.0, "bumped"),
        (2, "b", 20.0, "live"),
        (9, "ZZ", None, "new"),
    ]
    # BY SOURCE UPDATE: unmatched target rows take the SET, keep rows
    out = execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
        "WHEN NOT MATCHED BY SOURCE AND tgt.status != 'new' "
        "THEN UPDATE SET status = 'stale'",
    )
    assert out["merge_updated"] == 1
    assert sorted(
        (r["k"], r["status"]) for r in cat.read("t").collect()
    ) == [(1, "bumped"), (2, "stale"), (9, "new")]


def test_merge_column_level_refusals_and_identity(spark, tmp_path):
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(
        spark.createDataFrame([(1, "a")], "k long, v string"), "t"
    )
    with pytest.raises(ValueError, match="merge key"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
            "WHEN MATCHED THEN UPDATE SET k = 2",
        )
    with pytest.raises(ValueError, match="column-level SET"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
        )
    with pytest.raises(ValueError, match="duplicate MERGE SET"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
            "WHEN MATCHED THEN UPDATE SET v = 'x', v = 'y'",
        )
    with pytest.raises(ValueError, match="disagree"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (1)",
        )
    # identity: column-level INSERT mints; SET on the id refuses
    execute_dml(
        cat,
        "CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "nk STRING, v STRING)",
    )
    execute_dml(cat, "INSERT INTO idt (nk, v) VALUES ('a', 'x')")
    out = execute_dml(
        cat,
        "MERGE INTO idt USING (SELECT 'b' AS nk) ON nk = nk "
        "WHEN NOT MATCHED THEN INSERT (nk, v) VALUES (src.nk, 'ins')",
    )
    assert out["merge_inserted"] == 1
    assert sorted(
        (r["id"], r["nk"], r["v"]) for r in cat.read("idt").collect()
    ) == [(1, "a", "x"), (2, "b", "ins")]
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        execute_dml(
            cat,
            "MERGE INTO idt USING (SELECT 'a' AS nk) ON nk = nk "
            "WHEN MATCHED THEN UPDATE SET id = 5",
        )


def test_merge_review_fixes(spark, tmp_path):
    """Self-review regressions: cast-loss probe on column-level exprs,
    src./tgt. untouched inside string literals, EXPLAIN mirrors the
    missing-source-column refusal, CASE WHEN parses inside conditions
    and SET expressions."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0, "live")],
            "k long, v string, amt double, note string",
        ),
        "t",
    )
    # a SET expression whose cast loses refuses cleanly (not a raw
    # ANSI NumberFormatException, never a silent NULL)
    with pytest.raises(ValueError, match="does not cast"):
        execute_dml(
            cat,
            "MERGE INTO t USING (SELECT 1 AS k, 'abc' AS txt) ON k = k "
            "WHEN MATCHED THEN UPDATE SET amt = src.txt",
        )
    # src./tgt. qualifiers inside string literals stay literal
    execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 1 AS k) ON k = k "
        "WHEN MATCHED THEN UPDATE SET note = 'see src.feed'",
    )
    assert cat.read("t").first()["note"] == "see src.feed"
    # EXPLAIN refuses a source lacking the merge key exactly like the
    # real run (dry run never reports a plan the real run rejects)
    for prefix in ("EXPLAIN ", ""):
        with pytest.raises(ValueError, match="lacks merge key"):
            execute_dml(
                cat,
                f"{prefix}MERGE INTO t USING (SELECT 1 AS zz) ON k = k "
                "WHEN MATCHED THEN UPDATE SET note = 'x'",
            )
    # CASE WHEN inside SET expressions and conditions is not split
    # into bogus MERGE WHEN clauses
    execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 1 AS k) ON k = k WHEN MATCHED "
        "THEN UPDATE SET amt = CASE WHEN tgt.amt > 5 THEN 0.0 "
        "ELSE tgt.amt END",
    )
    assert cat.read("t").first()["amt"] == 0.0
    execute_dml(
        cat,
        "MERGE INTO t USING (SELECT 1 AS k) ON k = k WHEN MATCHED "
        "AND CASE WHEN tgt.amt = 0.0 THEN true ELSE false END "
        "THEN UPDATE SET note = 'zeroed'",
    )
    assert cat.read("t").first()["note"] == "zeroed"


def test_sql_literal_special_floats():
    """inf/nan keys render as typed literals, not bare tokens that
    would resolve as column names."""
    from gcp_datalake_pipeline_spark.transactions import _sql_literal

    assert _sql_literal(float("inf")) == "double('Infinity')"
    assert _sql_literal(float("-inf")) == "double('-Infinity')"
    assert _sql_literal(float("nan")) == "double('NaN')"
    assert _sql_literal(1.5) == "1.5"


def test_begin_block_create_table(spark, tmp_path):
    """CREATE TABLE inside BEGIN ... COMMIT stages the table: create +
    load publish as ONE version, ROLLBACK leaves no table, identity
    marks continue across the block's inserts, CLUSTERED BY layouts
    ride the same staged intents, CTAS works."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(spark.createDataFrame([(0,)], "z long"), "seed")
    v0 = cat._read_manifest(strict=False)["version"]
    out = execute_dml(
        cat,
        "BEGIN; CREATE TABLE p (k BIGINT, v STRING); "
        "INSERT INTO p VALUES (1, 'a'), (2, 'b'); "
        "CREATE TABLE c (id BIGINT, fk BIGINT); "
        "INSERT INTO c SELECT id, fk FROM (VALUES (10, 1)) AS x(id, fk); "
        "COMMIT",
    )
    assert out["transaction"] == "committed"
    assert cat._read_manifest(strict=False)["version"] == v0 + 1
    assert sorted(r["k"] for r in cat.read("p").collect()) == [1, 2]
    assert cat.read("c").count() == 1
    # ROLLBACK: the created table never existed
    execute_dml(
        cat,
        "BEGIN; CREATE TABLE ghost (x BIGINT); "
        "INSERT INTO ghost VALUES (1); ROLLBACK",
    )
    assert not cat.exists("ghost")
    # identity: block-created mark continues across in-block inserts
    # and into later standalone inserts — no duplicate ids
    out = execute_dml(
        cat,
        "BEGIN; CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS "
        "IDENTITY, v STRING); "
        "INSERT INTO idt (v) VALUES ('a'), ('b'); "
        "INSERT INTO idt (v) VALUES ('c'); COMMIT",
    )
    assert [
        s.get("identity_range") for s in out["statements"][1:]
    ] == [[1, 2], [3, 3]]
    execute_dml(cat, "INSERT INTO idt (v) VALUES ('d')")
    assert sorted(r["id"] for r in cat.read("idt").collect()) == [
        1, 2, 3, 4,
    ]
    # bucketed create-and-load: layout live after commit
    execute_dml(
        cat,
        "BEGIN; CREATE TABLE bk (k BIGINT, v STRING) "
        "CLUSTERED BY (k) INTO 4 BUCKETS; "
        "INSERT INTO bk SELECT k, v FROM (VALUES (1, 'x'), (2, 'y')) "
        "AS t(k, v); COMMIT",
    )
    assert cat.bucket_meta("bk") == {"num_buckets": 4, "key_cols": ["k"]}
    assert [
        r["v"] for r in cat.read("bk", predicates=[("k", "=", 2)]).collect()
    ] == ["y"]
    # CTAS in a block
    execute_dml(cat, "BEGIN; CREATE TABLE agg AS SELECT 1 AS one; COMMIT")
    assert cat.read("agg").first()["one"] == 1
    # other DDL still refuses
    with pytest.raises(ValueError, match="CREATE TABLE"):
        execute_dml(cat, "BEGIN; DROP TABLE p; COMMIT")


def test_begin_block_create_conflicts(spark, tmp_path):
    """A concurrent standalone CREATE of the same table between BEGIN
    and COMMIT conflicts the block instead of silently clobbering."""
    from gcp_datalake_pipeline_spark.transactions import (
        ConcurrentWriteError,
    )

    root = str(tmp_path / "lake")
    cat = TransactionalCatalog(spark=spark, root=root)
    cat.overwrite(spark.createDataFrame([(0,)], "z long"), "seed")
    other = TransactionalCatalog(spark=spark, root=root)
    cat.begin("block")
    try:
        cat.create_table("t", "k bigint")
        other.create_table("t", "k bigint")  # lands first
        with pytest.raises(ConcurrentWriteError):
            cat.commit()
    finally:
        if cat._pending is not None:
            cat.rollback()
    # the standalone create survives
    assert other.exists("t")


def test_begin_block_replace_keeps_created_registrations(spark, tmp_path):
    """A content-replacing write inside the block (a merge routed
    through overwrite) must not clobber the block-created table's
    staged identity/generated registrations — they exist nowhere
    else, and losing them published the table as plain columns."""
    cat = TransactionalCatalog(spark=spark, root=str(tmp_path / "lake"))
    cat.overwrite(spark.createDataFrame([(0,)], "z long"), "seed")
    execute_dml(
        cat,
        "BEGIN; "
        "CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "nk STRING, v STRING, "
        "tot BIGINT GENERATED ALWAYS AS (length(v))); "
        "INSERT INTO idt (nk, v) VALUES ('a', 'x'); "
        "MERGE INTO idt USING (SELECT 'a' AS nk, 'V2' AS vv) "
        "ON nk = nk WHEN MATCHED THEN UPDATE SET v = src.vv; "
        "COMMIT",
    )
    assert cat.identity_spec("idt") == {"col": "id", "next": 2}
    assert cat.generated_spec("idt") == {"tot": "length(v)"}
    out = execute_dml(cat, "INSERT INTO idt (nk, v) VALUES ('b', 'y')")
    assert out["identity_range"] == [2, 2]
    assert sorted(
        (r["id"], r["nk"], r["v"], r["tot"])
        for r in cat.read("idt").collect()
    ) == [(1, "a", "V2", 2), (2, "b", "y", 1)]
    # the advanced mark of an in-block identity INSERT also survives a
    # later in-block INSERT OVERWRITE — ids never reuse
    execute_dml(
        cat,
        "BEGIN; INSERT INTO idt (nk, v) VALUES ('c', 'z'); "
        "INSERT OVERWRITE idt (nk, v) VALUES ('only', 'row'); COMMIT",
    )
    out = execute_dml(cat, "INSERT INTO idt (nk, v) VALUES ('d', 'w')")
    # marks advanced past every minted id, even the overwritten ones
    assert out["identity_range"][0] >= 4
