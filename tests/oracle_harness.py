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
    # Bound the buffer pool and give it somewhere to spill: DuckDB's
    # default memory_limit is 80% of SYSTEM RAM per process, so several
    # oracle processes beside Spark JVMs (the sharded parity sweep) can
    # overcommit the box and die on a hard allocation failure late in a
    # long sweep — seen once in round 8 after the MATERIALIZED CTE hints
    # raised per-query peaks. With a limit + temp_directory the same
    # queries spill and finish (results unchanged; execution-only).
    con.execute("SET memory_limit='12GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
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


_DUCK_INTS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _duck_class(t) -> str:
    s = str(t).upper()
    if s in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if s in _DUCK_INTS:
        return "int"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "BOOLEAN":
        return "bool"
    if s == "VARCHAR":
        return "str"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s == "DATE":
        return "date"
    if s == "BLOB":
        return "binary"
    if s.endswith("[]") or s.startswith("LIST"):
        return "list"
    return s.lower()


def _spark_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return "list"
    return dt.simpleString()


def dtype_problems(name: str, spark_schema, oracle_sql: str, con) -> list[str]:
    """Flag oracle/engine TYPE divergence the value-compare above cannot see.

    The driver hashes a pandas rendering of both results; DuckDB HUGEINT
    (sum() over integers) becomes float64 there while Spark emits bigint —
    values identical, hash diverges (CORRECTNESS_r02: dq_lineitem_rules,
    pareto_topshare, table_snapshot_diff). ``fetchall()`` converts HUGEINT to
    Python int, so ``compare`` is structurally blind to the class. This check
    reads the *static* types of both plans (no execution) and fails on any
    int-vs-float / decimal-vs-double / hugeint divergence.
    """
    problems: list[str] = []
    rel = con.sql(oracle_sql)
    o_types = dict(zip(rel.columns, rel.types))
    s_types = {f.name: f.dataType for f in spark_schema.fields}
    for col, t in o_types.items():
        if _duck_class(t) == "hugeint":
            problems.append(
                f"{name}.{col}: oracle type {t} — pandas renders float64 while "
                "Spark emits bigint; CAST(... AS BIGINT) in the oracle SQL"
            )
    if sorted(o_types) != sorted(s_types):
        return problems  # column-name mismatch is compare()'s job
    for col in sorted(o_types):
        oc = _duck_class(o_types[col])
        if oc == "hugeint":
            continue  # already flagged above
        sc = _spark_class(s_types[col])
        if oc != sc:
            problems.append(
                f"{name}.{col}: dtype class diverges spark={sc} "
                f"({s_types[col].simpleString()}) oracle={oc} ({o_types[col]})"
            )
    return problems


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
    # Vacuity guard: two engines can agree perfectly on an all-NULL result
    # (a constant that never resolves, a LIMIT frontier past the data —
    # tail_index_hill's unigram form did exactly this). Such a "pass"
    # certifies nothing; flag it.
    if s_rows and all(v is None for row in s_rows for v in row):
        problems.append(f"{name}: result is entirely NULL — vacuous parity")
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
