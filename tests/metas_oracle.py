"""Independent pandas oracle for the metas pipeline.

Implements the semantics documented in SURVEY.md §1.5/§3.3 (guarded ratio
kernel, branch remap + JE fallback, STJ override, NP-style consolidation)
directly from the spec, sharing only the *data* tables with the engine
(metas.config). Used by tests to check the Spark plan cell for cell.
"""

from __future__ import annotations

import glob
import os

import pandas as pd

from metas_judiciarias_etl_spark.metas import config as C


def _map_branch(ramo: str, sigla: str) -> str:
    if ramo == C.SUPERIOR_BRANCH:
        return C.SUPERIOR_COURT_MAP.get(sigla, ramo)
    if ramo == C.ELECTORAL_BRANCH:
        return C.ELECTORAL_MAPPED
    return ramo


def _guarded_ratio(df: pd.DataFrame, j: str, d: str, s: str, factor) -> float | None:
    for c in (j, d, s):
        if c not in df.columns or not df[c].notna().any():
            return None
    if factor is None:
        return None
    den = df[d].sum() - df[s].sum()
    if den == 0:
        return None
    return round(df[j].sum() / den * factor, 2)


def _meta1(df: pd.DataFrame) -> float | None:
    base = list(C.META1_COLUMNS)
    for c in base:
        if c not in df.columns or not df[c].notna().any():
            return None
    julg, novos, susp = base
    dess = 0.0
    if C.META1_OPTIONAL in df.columns and df[C.META1_OPTIONAL].notna().any():
        dess = df[C.META1_OPTIONAL].sum()
    den = df[novos].sum() + dess - df[susp].sum()
    if den == 0:
        return None
    return round(df[julg].sum() / den * 100, 2)


def expected(csv_dir: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(resumo with None for 'NA', consolidated union) for every valid
    court CSV in ``csv_dir``."""
    rows: list[dict] = []
    frames: list[pd.DataFrame] = []
    for path in sorted(glob.glob(os.path.join(csv_dir, "*.csv"))):
        try:
            df = pd.read_csv(path, sep=",", encoding="utf-8", on_bad_lines="skip")
        except pd.errors.EmptyDataError:
            continue
        if df.empty or not set(C.IDENTITY_COLUMNS).issubset(df.columns):
            continue
        frames.append(df)
        sigla = df["sigla_tribunal"].iloc[0]
        ramo = df["ramo_justica"].iloc[0]
        branch = _map_branch(ramo, sigla)
        factors = C.FACTORS_BY_BRANCH.get(
            branch, C.FACTORS_BY_BRANCH[C.DEFAULT_BRANCH]
        )

        row: dict = {
            "sigla_tribunal": sigla,
            "ramo_justica": ramo,
            "meta1": _meta1(df),
        }
        for name, (j, d, s, key) in C.META_CONFIG.items():
            row[name] = _guarded_ratio(df, j, d, s, C.resolve_factor(branch, key))
        for name, ((j, d, s), key, suppressed) in C.STJ_CONFIG.items():
            if key in factors:
                row[name] = _guarded_ratio(df, j, d, s, factors[key])
                if row[name] is not None:
                    for std in suppressed:
                        row[std] = None
        rows.append(row)
    resumo = pd.DataFrame(rows)
    consolidado = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    return resumo, consolidado
