"""Local correctness harness mimicking the driver's DuckDB-oracle compare:
row count + column names + order-insensitive value comparison.

Stricter than a hash: cells are canonicalized to exact strings (floats via
repr), so any float-association drift fails loudly here first — queries must
round identically on both sides.
"""

from __future__ import annotations

import datetime
import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


_CON_CACHE: dict[str, duckdb.DuckDBPyConnection] = {}


def duckdb_connection(
    sf_dir: str, cached: bool = False
) -> duckdb.DuckDBPyConnection:
    """Oracle connection with the testdata views registered. With
    ``cached=True`` the connection is memoized per sf_dir for the life of
    the process (views over immutable testdata parquet) — repeated
    verification sweeps skip re-registering; callers must not close it."""
    if cached:
        con = _CON_CACHE.get(sf_dir)
        if con is None:
            con = _CON_CACHE[sf_dir] = duckdb_connection(sf_dir)
        return con
    con = duckdb.connect()
    for t in TABLES:
        # Driver testdata is one file per table; derived scale-ups
        # (benchdata.derive_scaled_dir) are Spark-written DIRECTORIES
        # of part files — glob those so the same oracle runs on both.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return "0.0"  # normalize -0.0
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    oracle_rows: int


_PANDAS_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _pandas_rows(con: duckdb.DuckDBPyConnection, oracle_sql: str):
    """Fetch the oracle through the pandas path (``rel.df()``),
    mirroring the driver's canonicalization route, TYPE-AWARE the way
    the driver provably is (nullable-int and DATE oracles have been
    driver-green for rounds): a declared integer column that pandas
    widened to float64 (NULLs present) recovers to int, a DATE column's
    Timestamps recover to dates. HUGEINT/UHUGEINT get NO recovery —
    that is the class the widening genuinely corrupts (1094879185 →
    1094879185.0, beyond-2^53 precision loss), and leaving it visible
    is what lets the pandas canon catch driver-hostile oracle types
    before the driver does (VERDICT r11: textrank_keywords)."""
    import numpy as np
    import pandas as pd

    rel = con.sql(oracle_sql)
    cols = list(rel.columns)
    tnames = [str(t) for t in rel.types]
    pdf = rel.df()
    out = []
    for tup in pdf.itertuples(index=False, name=None):
        row = []
        for j, v in enumerate(tup):
            t = tnames[j]
            if isinstance(v, (list, tuple, np.ndarray)):
                row.append([x.item() if hasattr(x, "item") else x for x in v])
                continue
            if v is pd.NaT:
                row.append(None)
                continue
            try:
                if pd.isna(v):
                    row.append(None)
                    continue
            except (TypeError, ValueError):
                pass
            if isinstance(v, pd.Timestamp):
                row.append(
                    v.to_pydatetime().date() if t == "DATE"
                    else v.to_pydatetime()
                )
                continue
            if t in _PANDAS_INT_TYPES and isinstance(
                v, (float, np.floating)
            ):
                row.append(int(v))  # nullable-int float64 widening
                continue
            item = getattr(v, "item", None)
            row.append(item() if item is not None and not isinstance(v, str) else v)
        out.append(tuple(row))
    return cols, out


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    df: DataFrame,
    oracle_sql: str,
    pandas_canon: bool = False,
) -> CompareResult:
    spark_cols = sorted(df.columns)
    spark_rows = df.select(*spark_cols).collect()

    if pandas_canon:
        oracle_cols_raw, oracle_data = _pandas_rows(con, oracle_sql)
    else:
        rel = con.execute(oracle_sql)
        oracle_cols_raw = [d[0] for d in rel.description]
        oracle_data = rel.fetchall()
    order = sorted(range(len(oracle_cols_raw)), key=lambda i: oracle_cols_raw[i])
    oracle_cols = [oracle_cols_raw[i] for i in order]

    if spark_cols != oracle_cols:
        return CompareResult(
            name, False, f"schema mismatch: {spark_cols} vs {oracle_cols}",
            len(spark_rows), len(oracle_data),
        )
    if len(spark_rows) != len(oracle_data):
        return CompareResult(
            name, False, "row count mismatch", len(spark_rows), len(oracle_data)
        )

    s_canon = sorted(tuple(_canon(v) for v in row) for row in spark_rows)
    o_canon = sorted(
        tuple(_canon(row[i]) for i in order) for row in oracle_data
    )
    if s_canon != o_canon:
        # report first differing row for debugging
        diff = next(
            (i for i, (a, b) in enumerate(zip(s_canon, o_canon)) if a != b), -1
        )
        detail = (
            f"value mismatch at sorted row {diff}:\n"
            f"  spark : {s_canon[diff] if diff >= 0 else '?'}\n"
            f"  oracle: {o_canon[diff] if diff >= 0 else '?'}"
        )
        return CompareResult(name, False, detail, len(spark_rows), len(oracle_data))
    return CompareResult(name, True, "ok", len(spark_rows), len(oracle_data))


def run_all(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    pandas_canon: bool = False,
):
    from gcp_datalake_pipeline_spark.plans import QUERIES

    con = duckdb_connection(sf_dir, cached=True)
    results = []
    for qname, q in QUERIES.items():
        if names and qname not in names:
            continue
        df = q.fn(spark, sf_dir)
        if q.oracle is None:
            n = df.count()
            results.append(CompareResult(qname, n >= 0, "rows-only", n, -1))
            continue
        results.append(
            compare_query(
                spark, con, qname, df, q.oracle, pandas_canon=pandas_canon
            )
        )
    return results
