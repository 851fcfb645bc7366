"""The metas pipeline: the reference ETL's query semantics, Spark-first.

Computes Brazil's CNJ National Judiciary Targets (Metas 1, 2, 4, 6, 7, 8, 10
and sub-variants) for every court from per-court CSV extracts — the exact
semantics of the reference (`Versao_Np.py`, see SURVEY.md §1), re-expressed
as one declarative Catalyst plan: schema-drift-tolerant CSV union → a single
groupBy(file) hash aggregation → literal factor CASE tree → guarded bround
ratio expressions → NA-sentinel stringification at the sink.
"""

from .pipeline import compute_resumo, read_court_csvs, run  # noqa: F401
