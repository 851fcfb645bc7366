"""Local re-implementation of the driver's correctness gate: run each
registered Spark query and its DuckDB oracle side-by-side, compare
row-count + column names + order-insensitive values. Catching a mismatch
here means catching it before CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = (
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
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sortable(row):
    return tuple((x is None, str(x)) for x in row)


def normalize_result(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (the driver does), normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=_sortable)
    return out


def compare(name: str, spark_df, oracle_sql: str, con) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_rel = con.sql(oracle_sql)
    o_cols = list(o_rel.columns)
    o_rows = [tuple(r) for r in o_rel.fetchall()]

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}")
    s_n = normalize_result(s_cols, s_rows)
    o_n = normalize_result(o_cols, o_rows)
    if s_n != o_n:
        diffs = [
            (a, b) for a, b in zip(s_n, o_n) if a != b
        ][:5]
        only_s = [r for r in s_n if r not in set(o_n)][:3]
        only_o = [r for r in o_n if r not in set(s_n)][:3]
        problems.append(
            f"{name}: values differ; first diffs={diffs!r} only_spark={only_s!r} only_oracle={only_o!r} (cols sorted: {sorted(s_cols)})"
        )
    return problems
