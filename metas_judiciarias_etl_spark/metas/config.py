"""Static configuration of the metas pipeline, transcribed as plain data
from the reference (factor table: Versao_Np.py:41-61; meta→column config:
Versao_Np.py:107-119; special branch remap: Versao_Np.py:10-24).

Factors are exact rational constants (e.g. 1000/8); they reach the plan as
literals, so Catalyst constant-folds every factor application.
"""

from __future__ import annotations

# Branch → factor-key → factor. Keys '2a'…'10b' are the 13 standard metas;
# '8'/'10' exist only for STJ (the meta8_stj/meta10_stj overrides).
FACTORS_BY_BRANCH: dict[str, dict[str, float]] = {
    "Justiça Estadual": {
        "2a": 1000 / 8, "2b": 1000 / 9, "2c": 1000 / 9.5, "2ant": 100.0,
        "4a": 1000 / 6.5, "4b": 100.0, "6": 100.0,
        "7a": 1000 / 5, "7b": 1000 / 5, "8a": 1000 / 7.5, "8b": 1000 / 9,
        "10a": 1000 / 9, "10b": 1000 / 10,
    },
    "Justiça do Trabalho": {
        "2a": 1000 / 9.4, "2ant": 100.0, "4a": 1000 / 7, "4b": 100.0,
    },
    "Justiça Federal": {
        "2a": 1000 / 8.5, "2b": 100.0, "2ant": 100.0, "4a": 1000 / 7,
        "4b": 100.0, "6": 1000 / 3.5, "7a": 1000 / 3.5, "7b": 1000 / 3.5,
        "8a": 1000 / 7.5, "8b": 1000 / 9, "10a": 100.0,
    },
    "Justiça Militar da União": {
        "2a": 1000 / 9.5, "2b": 1000 / 9.9, "2ant": 100.0,
        "4a": 1000 / 9.5, "4b": 1000 / 9.9,
    },
    "Justiça Militar Estadual": {
        "2a": 1000 / 9, "2b": 1000 / 9.5, "2ant": 100.0,
        "4a": 1000 / 9.5, "4b": 1000 / 9.9,
    },
    "Tribunal Superior Eleitoral": {
        "2a": 1000 / 7.0, "2b": 1000 / 9.9, "2ant": 100.0,
        "4a": 1000 / 9, "4b": 1000 / 5,
    },
    "Tribunal Superior do Trabalho": {
        "2a": 1000 / 8.5, "2b": 1000 / 9.9, "2ant": 100.0,
        "4a": 1000 / 7, "4b": 100.0,
    },
    "Superior Tribunal de Justiça": {
        "2ant": 100.0, "4a": 1000 / 9, "4b": 100.0, "6": 1000 / 7.5,
        "7a": 1000 / 7.5, "7b": 1000 / 7.5, "8": 1000 / 10, "10": 1000 / 10,
    },
}

DEFAULT_BRANCH = "Justiça Estadual"  # fallback for unmapped branches (NP:28-30)

# Special branch remap applied BEFORE the factor lookup (NP:10-24):
# 'Tribunais Superiores' resolves per court; 'Justiça Eleitoral' always
# resolves to the TSE factor set.
SUPERIOR_COURT_MAP: dict[str, str] = {
    "TST": "Tribunal Superior do Trabalho",
    "STJ": "Superior Tribunal de Justiça",
}
ELECTORAL_BRANCH = "Justiça Eleitoral"
ELECTORAL_MAPPED = "Tribunal Superior Eleitoral"
SUPERIOR_BRANCH = "Tribunais Superiores"

# The 13 table-driven metas: result column → (julgados, distribuídos,
# suspensos source columns, factor key) — NP:107-119.
META_CONFIG: dict[str, tuple[str, str, str, str]] = {
    "meta2a": ("julgm2_a", "distm2_a", "suspm2_a", "2a"),
    "meta2b": ("julgm2_b", "distm2_b", "suspm2_b", "2b"),
    "meta2c": ("julgm2_c", "distm2_c", "suspm2_c", "2c"),
    "meta2ant": ("julgm2_ant", "distm2_ant", "suspm2_ant", "2ant"),
    "meta4a": ("julgm4_a", "distm4_a", "suspm4_a", "4a"),
    "meta4b": ("julgm4_b", "distm4_b", "suspm4_b", "4b"),
    "meta6": ("julgm6_a", "distm6_a", "suspm6_a", "6"),
    "meta7a": ("julgm7_a", "distm7_a", "suspm7_a", "7a"),
    "meta7b": ("julgm7_b", "distm7_b", "suspm7_b", "7b"),
    "meta8a": ("julgm8_a", "distm8_a", "suspm8_a", "8a"),
    "meta8b": ("julgm8_b", "distm8_b", "suspm8_b", "8b"),
    "meta10a": ("julgm10_a", "distm10_a", "suspm10_a", "10a"),
    "meta10b": ("julgm10_b", "distm10_b", "suspm10_b", "10b"),
}

# STJ overrides: result column → (source columns, factor key, the standard
# metas suppressed when the override computes) — NP:125-135. Note the
# distribuídos column is `dism*`, not `distm*`.
STJ_CONFIG: dict[str, tuple[tuple[str, str, str], str, tuple[str, str]]] = {
    "meta8_stj": (("julgm8", "dism8", "suspm8"), "8", ("meta8a", "meta8b")),
    "meta10_stj": (("julgm10", "dism10", "suspm10"), "10", ("meta10a", "meta10b")),
}

IDENTITY_COLUMNS = ("sigla_tribunal", "ramo_justica")

META1_COLUMNS = ("julgados_2025", "casos_novos_2025", "suspensos_2025")
META1_OPTIONAL = "dessobrestados_2025"


def all_numeric_columns() -> list[str]:
    """Every numeric input column the pipeline can consume."""
    cols: list[str] = [*META1_COLUMNS, META1_OPTIONAL]
    for j, d, s, _ in META_CONFIG.values():
        cols += [j, d, s]
    for (j, d, s), _, _ in STJ_CONFIG.values():
        cols += [j, d, s]
    return cols


def resolve_factor(branch_mapped: str, key: str) -> float | None:
    """Factor for (mapped branch, key) with the per-key Justiça-Estadual
    fallback (NP:122): a branch lacking a key uses the JE factor; an
    unmapped branch uses the full JE set."""
    factors = FACTORS_BY_BRANCH.get(branch_mapped, FACTORS_BY_BRANCH[DEFAULT_BRANCH])
    val = factors.get(key)
    if val is None:
        val = FACTORS_BY_BRANCH[DEFAULT_BRANCH].get(key)
    return val


def resumo_column_order(columns: list[str]) -> list[str]:
    """The reference's sink column order (NP:234-242): identity + meta1,
    then the standard metas lexicographically (so meta10a < meta2a), then
    the *_stj block lexicographically, then any leftovers."""
    head = [c for c in ("sigla_tribunal", "ramo_justica", "meta1") if c in columns]
    standard = sorted(
        c
        for c in columns
        if c.startswith("meta") and c != "meta1" and not c.endswith("_stj")
    )
    stj = sorted(c for c in columns if c.endswith("_stj"))
    rest = sorted(c for c in columns if c not in head + standard + stj)
    return head + standard + stj + rest
