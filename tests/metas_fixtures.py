"""Synthetic court-CSV fixtures encoding every guard in FIXTURES.md §1.6.

Each file is one court; columns vary per branch (§1.5) to exercise the
schema-drift union. Values are small integers chosen so expected metas are
hand-checkable; specific files encode zero/negative denominators, all-NaN
columns, malformed rows, banker's-rounding ties, unmapped branches and the
STJ override.
"""

from __future__ import annotations

import os

TRIPLES = {
    "2_a": "2a", "2_b": "2b", "2_c": "2c", "2_ant": "2ant",
    "4_a": "4a", "4_b": "4b", "6_a": "6", "7_a": "7a", "7_b": "7b",
    "8_a": "8a", "8_b": "8b", "10_a": "10a", "10_b": "10b",
}


def _cols(keys: list[str]) -> list[str]:
    out = []
    for k in keys:
        out += [f"julgm{k}", f"distm{k}", f"suspm{k}"]
    return out


def _write(path: str, header: list[str], rows: list[list[object]]) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(",".join(header) + "\n")
        for row in rows:
            fh.write(",".join("" if v is None else str(v) for v in row) + "\n")


def generate(dir_: str) -> None:
    os.makedirs(dir_, exist_ok=True)
    ident = ["sigla_tribunal", "ramo_justica"]
    m1 = ["julgados_2025", "casos_novos_2025", "suspensos_2025", "dessobrestados_2025"]

    # TJSP — Justiça Estadual, all 13 triples, multi-row, NaN holes.
    keys = list(TRIPLES)
    header = ident + m1 + _cols(keys)
    rows = []
    for i in range(4):
        row: list[object] = ["TJSP", "Justiça Estadual", 100 + i, 50 + i, 10, 5]
        for j, _ in enumerate(keys):
            row += [20 + i + j, 40 + j, 2 if i % 2 == 0 else None]
        rows.append(row)
    _write(os.path.join(dir_, "teste_TJSP.csv"), header, rows)

    # TRT3 — Justiça do Trabalho subset (2_a, 2_ant, 4_a, 4_b) PLUS a
    # column outside its factor set (7_a → JE-factor fallback, NP:122);
    # no dessobrestados (optional → 0).
    keys = ["2_a", "2_ant", "4_a", "4_b", "7_a"]
    header = ident + ["julgados_2025", "casos_novos_2025", "suspensos_2025"] + _cols(keys)
    rows = [
        ["TRT3", "Justiça do Trabalho", 80, 90, 30] + [15, 30, 3] * len(keys),
        ["TRT3", "Justiça do Trabalho", 20, 10, 10] + [5, 10, 2] * len(keys),
    ]
    _write(os.path.join(dir_, "teste_TRT3.csv"), header, rows)

    # TRE-AC — electoral remap to TSE factors; zero denominator on 2_b
    # (Σdist == Σsusp → NA); negative denominator on 4_a (passes through).
    keys = ["2_a", "2_b", "2_ant", "4_a", "4_b"]
    header = ident + ["julgados_2025", "casos_novos_2025", "suspensos_2025"] + _cols(keys)
    rows = [
        ["TRE-AC", "Justiça Eleitoral", 60, 70, 20,
         10, 20, 5,      # 2_a normal
         8, 15, 10,      # 2_b part 1
         6, 12, 2,       # 2_ant
         9, 5, 10,       # 4_a: den 5-10 = -5 → negative meta
         7, 14, 3],      # 4_b
        ["TRE-AC", "Justiça Eleitoral", 40, 30, 10,
         5, 10, 2,
         4, 5, 10,       # 2_b part 2: Σdist=20, Σsusp=20 → den 0 → NA
         3, 6, 1,
         2, 3, 4,
         1, 2, 1],
    ]
    _write(os.path.join(dir_, "teste_TRE-AC.csv"), header, rows)

    # TST — 'Tribunais Superiores' remap via sigla.
    keys = ["2_a", "2_b", "2_ant", "4_a", "4_b"]
    header = ident + ["julgados_2025", "casos_novos_2025", "suspensos_2025"] + _cols(keys)
    _write(
        os.path.join(dir_, "teste_TST.csv"),
        header,
        [["TST", "Tribunais Superiores", 50, 60, 10] + [12, 24, 4] * len(keys)],
    )

    # STJ — override columns: meta8 computes (suppresses 8a/8b), meta10 has
    # a ZERO denominator (NA → 10a/10b NOT suppressed). Also carries 8_a/8_b
    # and 10_a/10_b triples so suppression is observable.
    keys = ["2_ant", "4_a", "4_b", "6_a", "7_a", "7_b", "8_a", "8_b", "10_a", "10_b"]
    header = (
        ident
        + ["julgados_2025", "casos_novos_2025", "suspensos_2025"]
        + _cols(keys)
        + ["julgm8", "dism8", "suspm8", "julgm10", "dism10", "suspm10"]
    )
    _write(
        os.path.join(dir_, "teste_STJ.csv"),
        header,
        [
            ["STJ", "Tribunais Superiores", 90, 100, 20]
            + [11, 22, 3] * len(keys)
            + [30, 50, 10, 7, 9, 9]  # meta8: 30/40; meta10: den 9-9=0 → NA
        ],
    )

    # TJMRS — military state branch; all-NaN suspm2_a (→ meta2a NA via the
    # notna().any() guard) and an extra unknown column (ignored by metrics,
    # preserved in Consolidado).
    header = ident + ["julgados_2025", "casos_novos_2025", "suspensos_2025",
                      "julgm2_a", "distm2_a", "suspm2_a", "coluna_extra"]
    rows = [
        ["TJMRS", "Justiça Militar Estadual", 30, 40, 5, 10, 20, None, "x1"],
        ["TJMRS", "Justiça Militar Estadual", 20, 25, 5, 8, 16, None, "x2"],
    ]
    _write(os.path.join(dir_, "teste_TJMRS.csv"), header, rows)

    # TJXX — unmapped branch → full JE factor fallback; banker's-rounding
    # tie: 49/800 × 100 = 6.125 → HALF_EVEN 6.12 (HALF_UP would say 6.13).
    header = ident + ["julgados_2025", "casos_novos_2025", "suspensos_2025",
                      "julgm2_ant", "distm2_ant", "suspm2_ant"]
    _write(
        os.path.join(dir_, "teste_TJXX.csv"),
        header,
        [["TJXX", "Justiça Imaginária", 10, 20, 4, 49, 800, 0]],
    )

    # TRF1 — malformed rows (wrong field count → dropped, rest processed).
    header = ident + ["julgados_2025", "casos_novos_2025", "suspensos_2025"]
    path = os.path.join(dir_, "teste_TRF1.csv")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(",".join(header) + "\n")
        fh.write("TRF1,Justiça Federal,40,50,10\n")
        fh.write("TRF1,Justiça Federal,too,many,fields,here,extra,cols\n")
        fh.write("TRF1,Justiça Federal,60,70,20\n")

    # Edge files: empty, header-only, missing identity columns — all skipped.
    open(os.path.join(dir_, "teste_vazio.csv"), "w").close()
    _write(os.path.join(dir_, "teste_so_header.csv"), header, [])
    _write(
        os.path.join(dir_, "teste_sem_identidade.csv"),
        ["julgados_2025", "casos_novos_2025"],
        [[1, 2]],
    )
