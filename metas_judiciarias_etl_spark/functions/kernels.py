"""Expression kernels shared by the metas pipeline and the generic surface.

These reproduce the reference's metric semantics (reference:
``Versao_Np.py:65-81`` ``calcular_meta``, ``Versao_Np.py:171-208`` meta-1)
as pure Catalyst expressions — no UDFs, so whole-stage codegen applies:

* guard: column must exist and have >= 1 non-null value, else NULL
  (surfaced as the 'NA' sentinel only at the sink — NP:67).
* denominator 0 -> NULL ('NA'); negative denominators pass through (NP:74-77).
* banker's rounding to 2 decimals (Python ``round`` is HALF_EVEN -> Spark
  ``bround``, NOT ``round`` which is HALF_UP) — NP:79.

Metas stay nullable DoubleType end-to-end; stringification with the 'NA'
sentinel happens once, at the sink (NP:232).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sum_with_guard(col: str) -> tuple[Column, Column]:
    """Partial-aggregatable pair: (sum, count-of-non-null) for one column.

    ``F.count`` ignores nulls, so ``count > 0`` reproduces the reference's
    ``df[col].notna().any()`` existence probe (NP:67) as an aggregate —
    map-side combinable, no extra pass.
    """
    return F.sum(F.col(col)), F.count(F.col(col))


def guarded_ratio(
    num_sum: Column,
    den_sum: Column,
    factor: Column | float,
    num_guard: Column | None = None,
    den_guard: Column | None = None,
    scale: int = 2,
) -> Column:
    """``bround(num/den * factor, 2)`` with the reference's NULL guards.

    ``nullif(den, 0)`` makes a zero denominator yield NULL instead of an
    ANSI division error (NP:76-77); negative denominators flow through.
    """
    factor_col = F.lit(factor) if not isinstance(factor, Column) else factor
    ratio = F.bround(num_sum / F.nullif(den_sum, F.lit(0)) * factor_col, scale)
    if num_guard is not None:
        ratio = F.when(num_guard, ratio)
    if den_guard is not None:
        ratio = F.when(den_guard, ratio).otherwise(F.lit(None))
    return ratio


def na_stringify(col: Column | str, sentinel: str = "NA") -> Column:
    """Sink-side stringification: NULL -> 'NA' (NP:232 ``astype(str).replace``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(sentinel))
