"""Randomized-corpus test: 25 seeded random court files (random branch,
column subsets, NaN injection, zero/negative denominators, random extra
columns) — the Spark plan must match the pandas oracle cell for cell.
Directly encodes SURVEY.md §1.5's fine print as a property check."""

from __future__ import annotations

import math
import os
import random

import pytest

from metas_judiciarias_etl_spark.metas import config as C
from metas_judiciarias_etl_spark.metas.pipeline import compute_resumo, read_court_csvs
from tests import metas_oracle

BRANCHES = [
    "Justiça Estadual",
    "Justiça do Trabalho",
    "Justiça Federal",
    "Justiça Eleitoral",
    "Justiça Militar da União",
    "Justiça Militar Estadual",
    "Tribunais Superiores",
    "Ramo Inventado",  # unmapped → JE fallback
]

TRIPLE_KEYS = ["2_a", "2_b", "2_c", "2_ant", "4_a", "4_b", "6_a",
               "7_a", "7_b", "8_a", "8_b", "10_a", "10_b"]


def _random_corpus(dir_: str, rng: random.Random, n_files: int = 25) -> None:
    os.makedirs(dir_, exist_ok=True)
    for i in range(n_files):
        branch = rng.choice(BRANCHES)
        sigla = (
            rng.choice(["TST", "STJ", "STM"])
            if branch == "Tribunais Superiores"
            else f"T{i:02d}"
        )
        cols = ["sigla_tribunal", "ramo_justica"]
        if rng.random() < 0.9:
            cols += ["julgados_2025", "casos_novos_2025", "suspensos_2025"]
            if rng.random() < 0.5:
                cols.append("dessobrestados_2025")
        for k in TRIPLE_KEYS:
            if rng.random() < 0.4:
                cols += [f"julgm{k}", f"distm{k}", f"suspm{k}"]
        if sigla == "STJ" and rng.random() < 0.8:
            cols += ["julgm8", "dism8", "suspm8", "julgm10", "dism10", "suspm10"]
        if rng.random() < 0.3:
            cols.append(f"extra_{i}")

        n_rows = rng.randint(1, 6)
        with open(os.path.join(dir_, f"teste_{sigla}_{i}.csv"), "w") as fh:
            fh.write(",".join(cols) + "\n")
            for _ in range(n_rows):
                vals = []
                for c in cols:
                    if c == "sigla_tribunal":
                        vals.append(sigla)
                    elif c == "ramo_justica":
                        vals.append(branch)
                    elif c.startswith("extra_"):
                        vals.append("z")
                    else:
                        r = rng.random()
                        if r < 0.2:
                            vals.append("")  # NaN hole
                        elif r < 0.3:
                            vals.append("0")  # zero-denominator fodder
                        else:
                            vals.append(str(rng.randint(-5, 60)))
                fh.write(",".join(vals) + "\n")


@pytest.mark.parametrize("seed", [1234, 9876])
def test_random_corpus_matches_oracle(spark, tmp_path, seed):
    d = str(tmp_path / f"corpus_{seed}")
    _random_corpus(d, random.Random(seed))
    exp_resumo, _ = metas_oracle.expected(d)
    got_rows = compute_resumo(read_court_csvs(spark, d)).collect()
    # keys: (sigla, file index via unique sigla names) — siglas are unique
    # per file except superior courts; group by full identity + row count.
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NA"
        if isinstance(v, float):
            f = round(float(v), 6)
            return str(0.0 if f == 0.0 else f)  # -0.0 ≡ 0.0
        return str(v)

    got_set = sorted(
        tuple(sorted((k, norm(v)) for k, v in r.asDict().items()))
        for r in got_rows
    )
    exp_cols = list(exp_resumo.columns)
    all_cols = set(got_rows[0].asDict()) if got_rows else set()
    exp_set = sorted(
        tuple(
            sorted(
                [(k, norm(row[k])) for k in exp_cols]
                + [(k, "NA") for k in all_cols - set(exp_cols)]
            )
        )
        for _, row in exp_resumo.iterrows()
    )
    assert len(got_set) == len(exp_set)
    for g, e in zip(got_set, exp_set):
        assert g == e
