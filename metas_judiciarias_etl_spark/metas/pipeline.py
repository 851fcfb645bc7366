"""The metas pipeline as one declarative Catalyst plan.

Reference semantics (SURVEY.md §1/§3; Versao_Np.py cited per function), but
the execution design is Spark-native:

* per-court CSVs with drifted schemas are read via a driver-side header
  scan that buckets files by exact header, one `spark.read.csv` per bucket
  with an explicit schema, then `unionByName(allowMissingColumns=True)` —
  Spark's positional CSV binding makes a naive glob read silently
  misassign columns (SURVEY.md §4.2, the one place naive Spark is WRONG);
* the whole computation is ONE hash aggregation: `groupBy(file)` with
  ~49 column sums + non-null counts + identity `first()`s — partial
  map-side combine, one shuffle, AQE handles the 525× file-size skew;
* factors are a literal CASE tree over the mapped branch (8 branches × 15
  keys of rational constants) — constant-folded by Catalyst; the per-key
  Justiça-Estadual fallback (NP:122) is resolved at plan time;
* metas stay nullable DoubleType end to end; the 'NA' sentinel and the
  lexicographic column order appear only in the sink projection (NP:232).

At 100 TB: the header scan reads 2 lines per file (driver-side listing is
the real cost — use a manifest/catalog instead of ls at that scale); the
aggregation shuffles one row per (file, ~100 cols), i.e. output is tiny;
everything downstream of the agg is effectively free.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import config as C

FILE_COL = "_court_file"


# ---------------------------------------------------------------------------
# Source: schema-drift CSV union (replaces NP:143,155,226 and the unsound
# byte-concat P:240-252 — see SURVEY.md §1.5 'Consolidado divergence').
# ---------------------------------------------------------------------------
def _scan_headers(input_dir: str) -> dict[tuple[str, ...], list[str]]:
    """Driver-side probe: first two lines of each *.csv → header buckets.

    Files are skipped (matching NP:157-159) when they are empty, have no
    data row (header-only → pandas df.empty), or lack an identity column.
    Cost: O(2 lines) per file; at real scale this comes from a manifest.
    """
    buckets: dict[tuple[str, ...], list[str]] = {}
    for name in sorted(os.listdir(input_dir)):
        if not name.endswith(".csv"):
            continue
        path = os.path.join(input_dir, name)
        if not os.path.isfile(path):
            # e.g. a Spark CSV sink directory named *.csv
            continue
        with open(path, encoding="utf-8") as fh:
            header_line = fh.readline().strip("\r\n")
            has_data = bool(fh.readline())
        if not header_line or not has_data:
            continue
        header = tuple(h.strip() for h in header_line.split(","))
        if not set(C.IDENTITY_COLUMNS).issubset(header):
            continue
        buckets.setdefault(header, []).append(path)
    return buckets


def _bucket_schema(header: tuple[str, ...]) -> T.StructType:
    """Explicit schema per header bucket: identity → string, known meta
    counters → double, unknown extras → string (preserved for the
    consolidated output, ignored by the metrics)."""
    numeric = set(C.all_numeric_columns())
    return T.StructType(
        [
            T.StructField(
                col, T.DoubleType() if col in numeric else T.StringType(), True
            )
            for col in header
        ]
    )


def read_court_csvs(spark: SparkSession, input_dir: str) -> DataFrame:
    """Read every valid court CSV under ``input_dir`` into one DataFrame
    with by-name schema alignment and a file-lineage column."""
    buckets = _scan_headers(input_dir)
    if not buckets:
        raise FileNotFoundError(f"no valid court CSVs in {input_dir}")
    # With CSV column pruning on, DROPMALFORMED only sees the projected
    # columns — a zero-column scan (count) would silently KEEP malformed
    # rows. The metas agg touches ~every column anyway, so full-row parse
    # costs nothing here and makes row-drop semantics deterministic.
    spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    parts = []
    for header, paths in sorted(buckets.items()):
        df = (
            # NB: no explicit encoding option — UTF-8 is already Spark's
            # default, and *naming* it switches the reader onto the
            # generic-charset line decoder, a measured 4x slowdown.
            spark.read.options(
                header=True, sep=",", mode="DROPMALFORMED"
            )
            .schema(_bucket_schema(header))
            .csv(paths)
            .withColumn(FILE_COL, F.input_file_name())
        )
        parts.append(df)
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)


# ---------------------------------------------------------------------------
# Factor resolution: branch remap (NP:10-24) + literal CASE tree (NP:41-61
# + the per-key JE fallback NP:122, resolved at plan time).
# ---------------------------------------------------------------------------
def mapped_branch_expr(ramo: Column, sigla: Column) -> Column:
    m = F.when(
        (ramo == C.SUPERIOR_BRANCH) & (sigla == "TST"),
        F.lit(C.SUPERIOR_COURT_MAP["TST"]),
    )
    m = m.when(
        (ramo == C.SUPERIOR_BRANCH) & (sigla == "STJ"),
        F.lit(C.SUPERIOR_COURT_MAP["STJ"]),
    )
    m = m.when(ramo == C.ELECTORAL_BRANCH, F.lit(C.ELECTORAL_MAPPED))
    return m.otherwise(ramo)


def factor_expr(mapped: Column, key: str) -> Column:
    """CASE over the mapped branch emitting the literal factor for ``key``
    (JE fallback baked in; unknown branches hit the ELSE = JE factor)."""
    expr = None
    for branch in C.FACTORS_BY_BRANCH:
        val = C.resolve_factor(branch, key)
        lit = F.lit(val).cast("double") if val is not None else F.lit(None).cast("double")
        expr = (
            F.when(mapped == branch, lit)
            if expr is None
            else expr.when(mapped == branch, lit)
        )
    default = C.resolve_factor(C.DEFAULT_BRANCH, key)
    return expr.otherwise(
        F.lit(default).cast("double") if default is not None else F.lit(None).cast("double")
    )


# ---------------------------------------------------------------------------
# The aggregation + guarded ratio kernels (calcular_meta NP:65-81,
# meta-1 NP:171-208) as pure expressions over the per-file sums.
# ---------------------------------------------------------------------------
def _sum_name(col: str) -> str:
    return f"__s_{col}"


def _meta_expr(schema_cols: set[str], j: str, d: str, s: str, factor: Column) -> Column:
    """bround(Σj/(Σd−Σs) × factor, 2) with the reference's guards: all
    three columns present (plan-time) with ≥1 non-null value each,
    non-zero denominator, valid factor; else NULL ('NA').

    The ≥1-non-null guard is ``sum(col) IS NOT NULL``: for DoubleType,
    Spark's sum is NULL exactly when every input is NULL, and every file
    group has ≥1 row — equivalent to the reference's notna().any() probe
    (NP:67) without carrying a second count() aggregate per column (halves
    the agg width: ~49 aggregates instead of ~98)."""
    if not {j, d, s}.issubset(schema_cols):
        return F.lit(None).cast("double")
    guard = (
        F.col(_sum_name(j)).isNotNull()
        & F.col(_sum_name(d)).isNotNull()
        & F.col(_sum_name(s)).isNotNull()
    )
    den = F.col(_sum_name(d)) - F.col(_sum_name(s))
    ratio = F.bround(F.col(_sum_name(j)) / F.nullif(den, F.lit(0.0)) * factor, 2)
    return F.when(guard & factor.isNotNull(), ratio)


def _meta1_expr(schema_cols: set[str]) -> Column:
    """Meta 1 (NP:171-208): Σjulgados/(Σcasos_novos + Σdessobrestados −
    Σsuspensos) × 100; dessobrestados optional, defaulting to 0."""
    if not set(C.META1_COLUMNS).issubset(schema_cols):
        return F.lit(None).cast("double")
    julg, novos, susp = C.META1_COLUMNS
    guard = reduce(
        lambda a, b: a & b,
        [F.col(_sum_name(c)).isNotNull() for c in C.META1_COLUMNS],
    )
    if C.META1_OPTIONAL in schema_cols:
        dess = F.coalesce(F.col(_sum_name(C.META1_OPTIONAL)), F.lit(0.0))
    else:
        dess = F.lit(0.0)
    den = F.col(_sum_name(novos)) + dess - F.col(_sum_name(susp))
    ratio = F.bround(F.col(_sum_name(julg)) / F.nullif(den, F.lit(0.0)) * 100, 2)
    return F.when(guard, ratio)


def compute_resumo(court_data: DataFrame) -> DataFrame:
    """Per-court metas as typed nullable doubles (one row per input file).

    Physical plan: one shuffle (the groupBy) + a stack of constant-folded
    projections — no joins, no UDFs, full whole-stage codegen.
    """
    schema_cols = set(court_data.columns)
    numeric = [c for c in C.all_numeric_columns() if c in schema_cols]

    aggs: list[Column] = [
        F.first("sigla_tribunal", ignorenulls=True).alias("sigla_tribunal"),
        F.first("ramo_justica", ignorenulls=True).alias("ramo_justica"),
    ]
    for c in numeric:
        aggs.append(F.sum(c).alias(_sum_name(c)))

    per_file = court_data.groupBy(FILE_COL).agg(*aggs)

    mapped = mapped_branch_expr(F.col("ramo_justica"), F.col("sigla_tribunal"))
    out: list[Column] = [
        F.col("sigla_tribunal"),
        F.col("ramo_justica"),
        _meta1_expr(schema_cols).alias("meta1"),
    ]

    std_exprs: dict[str, Column] = {}
    for meta_name, (j, d, s, key) in C.META_CONFIG.items():
        std_exprs[meta_name] = _meta_expr(
            schema_cols, j, d, s, factor_expr(mapped, key)
        )

    stj_exprs: dict[str, Column] = {}
    for stj_name, ((j, d, s), key, suppressed) in C.STJ_CONFIG.items():
        # Only the STJ factor set contains '8'/'10' (NP:125/131), so the
        # override computes only for the mapped STJ branch.
        is_stj = mapped == C.SUPERIOR_COURT_MAP["STJ"]
        stj_val = F.when(
            is_stj, _meta_expr(schema_cols, j, d, s, factor_expr(mapped, key))
        )
        stj_exprs[stj_name] = stj_val
        for std in suppressed:
            # NP:127-129: a computed override deletes the standard metas on
            # that row ('NA' after reassembly).
            std_exprs[std] = F.when(stj_val.isNotNull(), F.lit(None).cast("double")).otherwise(
                std_exprs[std]
            )

    out += [expr.alias(name) for name, expr in std_exprs.items()]
    out += [expr.alias(name) for name, expr in stj_exprs.items()]
    return per_file.select(*out)


def stringify_resumo(resumo: DataFrame, sentinel: str = "NA") -> DataFrame:
    """Sink projection (NP:229-242): every cell stringified, NULL → 'NA',
    columns in the reference's lexicographic-block order."""
    order = C.resumo_column_order(resumo.columns)
    return resumo.select(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(sentinel)).alias(c)
            for c in order
        ]
    )


def write_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """`;`-separated CSV sink (NP:100-102). ``single_file`` coalesces to one
    part for byte-level parity with the reference; leave False at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.options(header=True, sep=";").mode("overwrite").csv(path)


def run(
    spark: SparkSession, input_dir: str, output_dir: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """End-to-end: read court CSVs → (ResumoMetas, Consolidado).

    Returns (stringified resumo, consolidated union); writes both as
    `;`-CSV when ``output_dir`` is given (NP:224-243).
    """
    data = read_court_csvs(spark, input_dir)
    resumo = stringify_resumo(compute_resumo(data))
    consolidado = data.drop(FILE_COL)
    if output_dir:
        write_csv(resumo, os.path.join(output_dir, "ResumoMetas.csv"))
        write_csv(consolidado, os.path.join(output_dir, "Consolidado.csv"))
    return resumo, consolidado
