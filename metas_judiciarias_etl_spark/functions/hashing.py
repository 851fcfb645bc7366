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
    return (
        "CAST(list_sum(list_transform(generate_series(1, {n}), "
        "__hi -> (strpos('{digits}', substr(md5({expr}), __hi, 1)) - 1) "
        "* CAST(16 ** ({n} - __hi) AS BIGINT))) AS BIGINT)"
    ).format(n=HASH_HEX_LEN, digits=HEX_DIGITS, expr=expr)


def tokens(col: Column) -> Column:
    """Whitespace tokenization, matching ``regexp_split_to_array(trim(x),'\\s+')``."""
    return F.split(F.trim(col), r"\s+")


SQL_TOKENS = "regexp_split_to_array(trim({expr}), '\\s+')"


def word_shingles(toks: Column, k: int = 3) -> Column:
    """k-token shingles; documents shorter than k tokens collapse to one
    whole-text shingle so they still participate in dedup."""
    n = F.size(toks)
    window = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
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


def _seeded_md5(seed: int):
    # NB: a plain `lambda x, s=seed:` would be seen by PySpark's HOF binding
    # as a TWO-argument lambda and `s` would silently become the array index
    # column — a closure factory keeps the arity at 1.
    def fn(x: Column) -> Column:
        return F.md5(F.concat(F.lit(f"{seed}|"), x))

    return fn


def minhash_signature(shingles: Column, num_hashes: int) -> list[Column]:
    """MinHash over md5-permutations: for seed s, min(md5('s|' || shingle)).

    The min of md5 hex strings under lexicographic order is a valid minhash
    (md5 acts as the random permutation); string min is engine-portable.
    """
    return [
        F.array_min(F.transform(shingles, _seeded_md5(s))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]


def sql_minhash(shingles_expr: str, seed: int) -> str:
    return (
        f"list_min(list_transform({shingles_expr}, "
        f"__sh -> md5('{seed}|' || __sh)))"
    )


def band_keys(num_hashes: int, bands: int) -> list[tuple[int, list[str]]]:
    """LSH banding layout: band index -> the minhash column names it covers."""
    rows = num_hashes // bands
    return [
        (b, [f"mh{b * rows + r}" for r in range(rows)]) for b in range(bands)
    ]
