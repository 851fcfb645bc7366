"""Driver-gate entry for the flagship metas pipeline.

Runs the full pipeline (schema-drift CSV union → single-shuffle agg →
factor tree → guarded kernels → NA-sentinel stringification) over the
static fixture corpus committed at ``tests/data/metas_corpus`` and pairs it
with a DuckDB oracle GENERATED from the same config tables: one UNION ALL
branch per court file, each reading the CSV directly and computing the 18
resumo columns with literal factors resolved exactly like the engine does.
Engine and oracle share only plain data (metas/config.py), so semantic
drift between them is structural, not accidental.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..registry import query, register_oracle
from . import config as C
from .pipeline import FILE_COL, compute_resumo, read_court_csvs, stringify_resumo

CORPUS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "data",
    "metas_corpus",
)

RESUMO_COLUMNS = C.resumo_column_order(
    ["sigla_tribunal", "ramo_justica", "meta1"]
    + list(C.META_CONFIG)
    + list(C.STJ_CONFIG)
)


def _valid_files() -> list[tuple[str, list[str], str, str]]:
    """(path, header, sigla, ramo) per valid corpus file — mirrors the
    engine's scan guards (empty / header-only / no-identity skipped)."""
    out = []
    for name in sorted(os.listdir(CORPUS_DIR)):
        if not name.endswith(".csv"):
            continue
        path = os.path.join(CORPUS_DIR, name)
        with open(path, encoding="utf-8") as fh:
            header_line = fh.readline().strip("\r\n")
            first_row = fh.readline().strip("\r\n")
        if not header_line or not first_row:
            continue
        header = [h.strip() for h in header_line.split(",")]
        if not set(C.IDENTITY_COLUMNS).issubset(header):
            continue
        row = first_row.split(",")
        sigla = row[header.index("sigla_tribunal")]
        ramo = row[header.index("ramo_justica")]
        out.append((path, header, sigla, ramo))
    return out


def _mapped_branch(ramo: str, sigla: str) -> str:
    if ramo == C.SUPERIOR_BRANCH:
        return C.SUPERIOR_COURT_MAP.get(sigla, ramo)
    if ramo == C.ELECTORAL_BRANCH:
        return C.ELECTORAL_MAPPED
    return ramo


def _ratio_sql(header: list[str], j: str, d: str, s: str, factor: float | None) -> str:
    if factor is None or not {j, d, s}.issubset(header):
        return "CAST(NULL AS DOUBLE)"
    return (
        f"CASE WHEN count({j}) > 0 AND count({d}) > 0 AND count({s}) > 0 "
        f"THEN round_even(sum({j}) / nullif(sum({d}) - sum({s}), 0) * {factor!r}, 2) END"
    )


def _meta1_sql(header: list[str]) -> str:
    if not set(C.META1_COLUMNS).issubset(header):
        return "CAST(NULL AS DOUBLE)"
    julg, novos, susp = C.META1_COLUMNS
    dess = (
        f"CASE WHEN count({C.META1_OPTIONAL}) > 0 THEN sum({C.META1_OPTIONAL}) ELSE 0 END"
        if C.META1_OPTIONAL in header
        else "0"
    )
    return (
        f"CASE WHEN count({julg}) > 0 AND count({novos}) > 0 AND count({susp}) > 0 "
        f"THEN round_even(sum({julg}) / nullif(sum({novos}) + {dess} - sum({susp}), 0)"
        f" * 100, 2) END"
    )


def _file_oracle_sql(path: str, header: list[str], sigla: str, ramo: str) -> str:
    branch = _mapped_branch(ramo, sigla)
    factors = C.FACTORS_BY_BRANCH.get(branch, C.FACTORS_BY_BRANCH[C.DEFAULT_BRANCH])

    exprs: dict[str, str] = {"meta1": _meta1_sql(header)}
    for name, (j, d, s, key) in C.META_CONFIG.items():
        exprs[name] = _ratio_sql(header, j, d, s, C.resolve_factor(branch, key))
    for name, ((j, d, s), key, suppressed) in C.STJ_CONFIG.items():
        if key in factors:
            exprs[name] = _ratio_sql(header, j, d, s, factors[key])
            for std in suppressed:
                exprs[std] = (
                    f"CASE WHEN ({exprs[name]}) IS NOT NULL THEN NULL "
                    f"ELSE ({exprs[std]}) END"
                )
        else:
            exprs[name] = "CAST(NULL AS DOUBLE)"

    cols = []
    for col in RESUMO_COLUMNS:
        if col in ("sigla_tribunal", "ramo_justica"):
            cols.append(f"'{sigla if col == 'sigla_tribunal' else ramo}' AS {col}")
        else:
            cols.append(f"coalesce(CAST(({exprs[col]}) AS VARCHAR), 'NA') AS {col}")
    select = ",\n           ".join(cols)
    numeric = set(C.all_numeric_columns())
    coltypes = ", ".join(
        f"'{h}': '{'DOUBLE' if h in numeric else 'VARCHAR'}'" for h in header
    )
    return (
        f"    SELECT {select}\n"
        f"    FROM read_csv('{path}', header=true, sep=',', ignore_errors=true,\n"
        f"                  columns={{{coltypes}}})"
    )


def metas_oracle_sql() -> str:
    return "\nUNION ALL BY NAME\n".join(
        _file_oracle_sql(*f) for f in _valid_files()
    )


@query("metas_resumo_pipeline")
def metas_resumo_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full metas pipeline on the committed fixture corpus.
    (sf_dir is unused — the pipeline's input is its own CSV corpus; the
    oracle reads the same files.)"""
    return stringify_resumo(compute_resumo(read_court_csvs(spark, CORPUS_DIR)))


def _consolidado_oracle_sql() -> str:
    """Per-file read_csv branches unioned BY NAME — the NP:224-227
    by-name concat semantics (missing columns → NULL)."""
    numeric = set(C.all_numeric_columns())
    branches = []
    for path, header, _sigla, _ramo in _valid_files():
        coltypes = ", ".join(
            f"'{h}': '{'DOUBLE' if h in numeric else 'VARCHAR'}'" for h in header
        )
        branches.append(
            f"    SELECT * FROM read_csv('{path}', header=true, sep=',', "
            f"ignore_errors=true,\n                  columns={{{coltypes}}})"
        )
    return "\nUNION ALL BY NAME\n".join(branches)


@query("metas_consolidado")
def metas_consolidado(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's second output relation (Consolidado, NP:224-227):
    schema-drift union of every valid raw court file, aligned by name."""
    return read_court_csvs(spark, CORPUS_DIR).drop(FILE_COL)


register_oracle("metas_consolidado", _consolidado_oracle_sql())


register_oracle("metas_resumo_pipeline", metas_oracle_sql())


# ---------------------------------------------------------------------------
# S9 (chart sink, NP:83-98): per-meta bar-chart data — stringified resumo →
# to_numeric(errors='coerce') → drop invalid → sort desc. The PNG render is
# a driver edge; THIS is the relation it draws. One unpivot (generated
# stack, no shuffle) + one window rank per meta; at scale the narrow
# (meta, court, value) relation is tiny regardless of corpus size because
# the resumo is one row per court.
# ---------------------------------------------------------------------------
METD_COLS = [c for c in RESUMO_COLUMNS if c not in ("sigla_tribunal", "ramo_justica")]


@query("metas_chart_ranking")
def metas_chart_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(meta_name, sigla_tribunal, value, bar_pos) for every valid cell of
    the stringified resumo — 'NA' coerces to NULL and drops, descending
    value order per meta with the court sigla as the deterministic
    tiebreak (the reference's sort is pandas-stable on file order;
    ordering ties by sigla makes the relation engine-independent)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    resumo = metas_resumo_pipeline(spark, sf_dir)
    stack_expr = "stack({n}, {pairs}) AS (meta_name, value_str)".format(
        n=len(METD_COLS),
        pairs=", ".join(f"'{c}', {c}" for c in METD_COLS),
    )
    melted = resumo.selectExpr("sigla_tribunal", stack_expr)
    coerced = melted.select(
        "meta_name",
        "sigla_tribunal",
        F.expr("try_cast(value_str AS DOUBLE)").alias("value"),
    ).filter(F.col("value").isNotNull())
    w = Window.partitionBy("meta_name").orderBy(
        F.col("value").desc(), F.col("sigla_tribunal")
    )
    return coerced.withColumn("bar_pos", F.row_number().over(w).cast("long"))


def _chart_oracle_sql() -> str:
    branches = "\n        UNION ALL\n".join(
        f"        SELECT sigla_tribunal, '{c}' AS meta_name, "
        f"try_cast({c} AS DOUBLE) AS value FROM resumo"
        for c in METD_COLS
    )
    return f"""
    WITH resumo AS (
{metas_oracle_sql()}
    ), melted AS (
{branches}
    )
    SELECT meta_name, sigla_tribunal, value,
           CAST(row_number() OVER (PARTITION BY meta_name
                                   ORDER BY value DESC, sigla_tribunal) AS BIGINT)
               AS bar_pos
    FROM melted WHERE value IS NOT NULL
    """


register_oracle("metas_chart_ranking", _chart_oracle_sql())
