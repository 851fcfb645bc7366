"""Deterministic cross-engine hashing primitives.

All content hashing is built on md5 (identical output in Spark and any SQL
oracle), not on engine-specific hash functions (Spark's murmur3 ``hash()``
and DuckDB's ``hash()`` disagree). Numeric hashes take the first 12 hex
digits (48 bits) so every intermediate product stays exactly representable
in doubles on engines that lack 128-bit integer paths.

These helpers return PySpark Columns; the matching SQL fragments are emitted
by ``sql_*`` twins from the same constants, so the operator and its oracle
cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"
HASH_HEX_LEN = 12  # 48-bit hashes


def hash48(col: Column) -> Column:
    """48-bit integer hash of a string column via md5 prefix."""
    return F.conv(F.substring(F.md5(col), 1, HASH_HEX_LEN), 16, 10).cast("long")


def sql_hash48(expr: str) -> str:
    """DuckDB SQL for the same 48-bit hash (hex-digit expansion — no strtol)."""
    return sql_hash48_at(expr, 1)


def sql_hash48_at(expr: str, start: int) -> str:
    """48-bit hash from md5 hex digits [start, start+11] (1-based) — one
    md5 yields two independent 48-bit slices (start=1 and start=13), so
    multi-draw consumers pay half the hashing."""
    return (
        "CAST(list_sum(list_transform(generate_series(1, {n}), "
        "__hi -> (strpos('{digits}', substr(md5({expr}), {off} + __hi, 1)) - 1) "
        "* CAST(16 ** ({n} - __hi) AS BIGINT))) AS BIGINT)"
    ).format(n=HASH_HEX_LEN, digits=HEX_DIGITS, expr=expr, off=start - 1)


def tokens(col: Column) -> Column:
    """Whitespace tokenization, matching ``regexp_split_to_array(trim(x),'\\s+')``."""
    return F.split(F.trim(col), r"\s+")


SQL_TOKENS = "regexp_split_to_array(trim({expr}), '\\s+')"


def word_shingles(toks: Column, k: int = 3) -> Column:
    """k-token shingles; documents shorter than k tokens collapse to one
    whole-text shingle so they still participate in dedup.

    Built as a zip of k shifted slices of the token array, NOT as
    ``transform(sequence(...), i -> element_at(toks, i+j))``: with an
    index lambda every element_at re-evaluates the whole ``toks``
    expression tree (the tokenizer regex) once per shingle term — ~9x
    slower end-to-end. The slices evaluate ``toks`` k+1 times total.
    Callers should still bind the tokenizer to a column first."""
    n = F.size(toks)
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, n - (k - 1)) for j in range(k)])
    window = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
    return F.when(n >= k, window).otherwise(F.array(F.concat_ws(" ", toks)))


def sql_word_shingles(toks_expr: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"({toks_expr})[__si + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks_expr}) >= {k} THEN "
        f"list_transform(generate_series(1, len({toks_expr}) - {k - 1}), "
        f"__si -> {parts}) "
        f"ELSE [array_to_string({toks_expr}, ' ')] END"
    )


# MinHash permutation family: one 48-bit content hash per shingle, then k
# cheap affine permutations h_i = (a_i * (h mod P) + b_i) mod P over the
# Mersenne prime P = 2^31 - 1. One md5 per shingle total (vs one per
# shingle per seed), and every product stays < 2^62 — exact in int64 on
# both engines. Constants are derived, not random, so the SQL oracle twin
# is built from the very same numbers.
MINHASH_P = 2_147_483_647  # 2^31 - 1

def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    return [
        ((1_000_003 * (s + 1)) % MINHASH_P, (998_244_353 * (s + 7)) % MINHASH_P)
        for s in range(num_hashes)
    ]


def affine_min_aggs(h_col: str, num_hashes: int) -> list[Column]:
    """min((a_i*h + b_i) mod P) aggregate columns over a pre-reduced
    ``h = hash48(shingle) % P`` column (explode→groupBy shape: one shuffle,
    map-side partial min — the 100 TB-safe form of MinHash)."""
    h = F.col(h_col)
    return [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]


def sql_affine_min_aggs(h_expr: str, num_hashes: int) -> list[str]:
    return [
        f"min(({a} * {h_expr} + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]


def band_keys(num_hashes: int, bands: int) -> list[tuple[int, list[str]]]:
    """LSH banding layout: band index -> the minhash column names it covers."""
    rows = num_hashes // bands
    return [
        (b, [f"mh{b * rows + r}" for r in range(rows)]) for b in range(bands)
    ]
