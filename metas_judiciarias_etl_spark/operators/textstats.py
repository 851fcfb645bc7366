"""Text-analysis operators for training-data pipelines, over ``documents``.

Four first-class operators a 100 TB text pipeline needs, all expressed as
pure Catalyst expressions (string/regex/array built-ins — zero UDFs, full
whole-stage codegen) with DuckDB oracle twins:

* language-ID    — stopword-profile n-gram heuristic: score per-language
                   stopword hit counts, argmax with a deterministic
                   tiebreak. (The fixture corpus is synthetic English-ish
                   vocabulary for every lang label, so the verified thing
                   is the scoring mechanism, not accuracy.)
* quality score  — length/stopword/punctuation/digit ratios folded into a
                   composite [0,1] score; the standard pre-training filter
                   features (C4/Gopher-style rules, public recipe).
* token counting — whitespace tokens + a BPE-ish regex segmentation
                   ([A-Za-z]+ | [0-9]+ | single non-space symbol) + the
                   chars/4 estimator.
* fingerprinting — polynomial rolling hash over the ordered token-hash
                   sequence (order-sensitive, unlike the dedup shingle
                   sets): fp = fold(acc*131 + h48(tok)) mod 2^31-1.

Everything is embarrassingly parallel per document (no shuffle at all
except the grouped report) — the ideal 100 TB shape: map-only over
partitions, scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_P, SQL_TOKENS, hash48, sql_hash48, tokens
from ..registry import query
from ..sources.parquet import load_table

_SQL_TOKS = SQL_TOKENS.format(expr="text")

# Tiny per-language stopword profiles (public-knowledge function words).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "que", "los", "una"),
    "de": ("der", "die", "und", "ist", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des", "une"),
}
# Deterministic argmax order (ties resolve to the earlier entry).
LANG_ORDER = ("en", "es", "de", "fr")

ROLL_B = 131  # polynomial rolling-hash base


def _stop_hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def _sql_stop_hits(toks_expr: str, words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks_expr}, __t -> __t IN ({inlist})))"


@query(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS lang_label,
               {_sql_stop_hits(_SQL_TOKS, LANG_PROFILES['en'])} AS s_en,
               {_sql_stop_hits(_SQL_TOKS, LANG_PROFILES['es'])} AS s_es,
               {_sql_stop_hits(_SQL_TOKS, LANG_PROFILES['de'])} AS s_de,
               {_sql_stop_hits(_SQL_TOKS, LANG_PROFILES['fr'])} AS s_fr
        FROM documents
    )
    SELECT doc_id, lang_label,
           CAST(s_en AS BIGINT) AS s_en,
           CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
                WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: per-language function-word hit counts,
    deterministic argmax. Map-only — no shuffle; at 100 TB this runs at
    scan speed."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        *[
            _stop_hits(toks, LANG_PROFILES[lang]).alias(f"s_{lang}")
            for lang in LANG_ORDER
        ],
    )
    s = {lang: F.col(f"s_{lang}") for lang in LANG_ORDER}
    pred = (
        F.when(
            (s["en"] == 0) & (s["es"] == 0) & (s["de"] == 0) & (s["fr"] == 0), "und"
        )
        .when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), "en")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )
    return scored.select(
        "doc_id",
        "lang_label",
        s["en"].cast("long").alias("s_en"),
        pred.alias("lang_pred"),
    )


_PUNCT_CLASS = "[.,!?;:]"
_DIGIT_CLASS = "[0-9]"


@query(
    "text_quality",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               length(text) AS n_chars,
               len({_SQL_TOKS}) AS n_tokens,
               length(text) - length(regexp_replace(text, '{_PUNCT_CLASS}', '', 'g')) AS n_punct,
               length(text) - length(regexp_replace(text, '{_DIGIT_CLASS}', '', 'g')) AS n_digit,
               {_sql_stop_hits(_SQL_TOKS, LANG_PROFILES['en'])} AS n_stop
        FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(n_stop / CAST(nullif(n_tokens, 0) AS DOUBLE), 6)  AS stop_ratio,
           round(n_punct / CAST(nullif(n_chars, 0) AS DOUBLE), 6)  AS punct_ratio,
           round(0.5 * least(n_tokens / 50.0, 1.0)
                 + 0.3 * least(5 * n_stop / CAST(nullif(n_tokens, 0) AS DOUBLE), 1.0)
                 + 0.2 * (1.0 - n_punct / CAST(nullif(n_chars, 0) AS DOUBLE))
                 - 0.2 * (n_digit / CAST(nullif(n_chars, 0) AS DOUBLE)), 6) AS quality
    FROM feats
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality score from C4/Gopher-style surface
    features: length saturation, stopword density, punctuation and digit
    ratios. Pure per-row expressions — scan-bound at any scale.

    Deliberately NOT memoized (round 8): every composer reads this frame
    exactly once per plan, so a pin would add a materialization pass
    without saving any recompute — the map stage fuses into each
    consumer's scan instead (guide §5: pin only multi-read frames)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    feats = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", _PUNCT_CLASS, ""))
        ).alias("n_punct"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", _DIGIT_CLASS, ""))
        ).alias("n_digit"),
        _stop_hits(toks, LANG_PROFILES["en"]).alias("n_stop"),
    )
    nt = F.nullif(F.col("n_tokens"), F.lit(0)).cast("double")
    nc = F.nullif(F.col("n_chars"), F.lit(0)).cast("double")
    quality = (
        0.5 * F.least(F.col("n_tokens") / 50.0, F.lit(1.0))
        + 0.3 * F.least(5 * F.col("n_stop") / nt, F.lit(1.0))
        + 0.2 * (1.0 - F.col("n_punct") / nc)
        - 0.2 * (F.col("n_digit") / nc)
    )
    return feats.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("n_stop") / nt, 6).alias("stop_ratio"),
        F.round(F.col("n_punct") / nc, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality"),
    )


_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS bpe_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, BPE-ish regex
    segmentation (letter runs | digit runs | single symbols), and the
    chars/4 estimator used for quick corpus sizing."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))
        .cast("long")
        .alias("bpe_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("est_tokens"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id,
               list_transform({_SQL_TOKS}, __t -> {sql_hash48("__t")} % {MINHASH_P}) AS hs
        FROM documents
    )
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                       (__a, __b) -> (__a * {ROLL_B} + __b) % {MINHASH_P}) AS fingerprint
    FROM hashed
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    the token-hash sequence, fold((acc*B + h) mod P). Reordered tokens give
    a different fingerprint (unlike the dedup shingle-set hashes)."""
    docs = load_table(spark, sf_dir, "documents")
    hs = F.transform(tokens(F.col("text")), lambda t: hash48(t) % MINHASH_P)
    fp = F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * ROLL_B + h) % MINHASH_P,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


@query(
    "text_top_tokens",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_SQL_TOKS}) AS token FROM documents
    )
    SELECT token, count(*) AS n
    FROM tok
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 25
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: explode tokens → count → top-25 with a
    deterministic (count desc, token asc) total order.

    Plan shape: the explode stays in its partition; the groupBy on token is
    the one shuffle (map-side partial counts collapse it to vocabulary
    size); orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-k, driver merge, no global sort. At 100 TB swap the exact count
    for a count-min/ approx top-k only if the vocabulary itself (not the
    corpus) outgrows the reducers."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(25)
    )


@query(
    "text_repetition",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ), per AS (
        SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS dup_ratio,
           round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_share
    FROM per
    GROUP BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition / boilerplate detection (a Gopher-style quality rule):
    per-document duplicate-token ratio and the most-frequent token's share.
    High dup_ratio or top_share flags templated/spammy text.

    Two hash aggs, both keyed by (doc_id[, token]) — high cardinality,
    even spread; no joins, no windows (a per-doc sort would pay a
    per-group ordering the aggregation doesn't need)."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").cast("double")
    return per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(1.0 - F.count(F.lit(1)) / n, 6).alias("dup_ratio"),
        F.round(F.max("c") / n, 6).alias("top_share"),
    )


# PII patterns chosen to behave identically in Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, no lookaround.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN text || ' contact user' || doc_id ||
                         '@example.com or 555-123-4567'
                    ELSE text END AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                              '{_PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM seeded
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and replace email/phone patterns, emitting the
    md5 of the scrubbed text so the oracle verifies the actual redacted
    bytes, not just the counts. (The synthetic corpus contains no PII, so
    every third doc is seeded with a deterministic email+phone suffix —
    the same seeding on both engines — to exercise real replacements.)

    Map-only, zero shuffle; regexp_replace runs in whole-stage codegen.
    Patterns restricted to the Java-regex ∩ RE2 common subset so both
    engines match identical spans."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567"),
        ),
    ).otherwise(F.col("text"))
    seeded = docs.select("doc_id", t.alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace("t", _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
    )
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@query(
    "text_stats_by_source",
    oracle=f"""
    SELECT lang, source,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(len({_SQL_TOKS})), 4) AS avg_tokens,
           CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang, source
    """,
)
def text_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus reporting: per-(lang, source) doc counts and token budgets —
    the summary a dataset card is built from. One hash-agg shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text")))
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(n_toks), 4).alias("avg_tokens"),
        F.sum(n_toks).cast("long").alias("total_tokens"),
    )


# --------------------------------------------------------------------------
# Bigram language-model table: conditional next-token probabilities — the
# count-based LM that powers contamination heuristics, perplexity proxies,
# and boilerplate detection before any neural model enters the pipeline.
# --------------------------------------------------------------------------
BIGRAM_MIN_COUNT = 5  # report bigrams seen at least this often


@query(
    "text_bigram_lm",
    oracle=f"""
    WITH toks AS (
        SELECT {_SQL_TOKS} AS ts FROM documents
    ), bg AS (
        SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                                     __i -> struct_pack(w1 := ts[__i],
                                                        w2 := ts[__i + 1]))) AS b
        FROM toks
        WHERE len(ts) >= 2
    ), pairs AS (
        SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n_pair
        FROM bg GROUP BY 1, 2
    ), lhs AS (
        SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_w1 FROM pairs GROUP BY w1
    )
    SELECT p.w1, p.w2,
           CAST(p.n_pair AS BIGINT) AS n_pair,
           l.n_w1,
           CAST(p.n_pair AS DOUBLE) / l.n_w1 AS cond_p
    FROM pairs p JOIN lhs l USING (w1)
    WHERE p.n_pair >= {BIGRAM_MIN_COUNT}
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram LM: P(w2|w1) = c(w1,w2)/c(w1,·) for every bigram
    seen at least BIGRAM_MIN_COUNT times. The conditional probability is
    one IEEE division of exact integer counts — bit-identical across
    engines — and the rare tail is thresholded out so the table stays
    vocabulary-sized.

    Plan: bigrams come from a zip of two shifted token-array slices (the
    shingle trick — no per-element lambda re-evaluation), explode within
    the partition, then two count aggregations keyed on (w1,w2) and w1.
    At 100 TB both keys are vocabulary-shaped; the Zipf head is absorbed
    by map-side partials before either shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    docs_t = docs.select(toks.alias("ts")).filter(F.size("ts") >= 2)
    n = F.size("ts")
    zipped = F.arrays_zip(
        F.slice("ts", 1, n - 1).alias("w1"), F.slice("ts", 2, n - 1).alias("w2")
    )
    bg = docs_t.select(F.explode(zipped).alias("b")).select(
        F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    pairs = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    lhs = pairs.groupBy("w1").agg(F.sum("n_pair").cast("long").alias("n_w1"))
    return (
        pairs.filter(F.col("n_pair") >= BIGRAM_MIN_COUNT)
        .join(lhs, "w1")
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            "n_w1",
            (F.col("n_pair").cast("double") / F.col("n_w1")).alias("cond_p"),
        )
    )


# --------------------------------------------------------------------------
# BPE tokenizer training (first merges): the byte-pair-encoding loop that
# builds every modern LLM vocabulary, as unrolled Spark plans.
# --------------------------------------------------------------------------
BPE_STEPS = 3
_BPE_SEP = "\x1f"  # unit separator — cannot appear in whitespace tokens
_SQL_SEP = "chr(31)"


def _bpe_oracle() -> str:
    """Self-contained CTE chain: each step counts adjacent symbol pairs,
    picks the (count desc, pair asc) winner as a scalar subquery, and
    applies it with replace() — whose left-to-right non-overlapping scan
    IS the greedy BPE merge semantics, identically in both engines."""
    seq0 = (
        f"rtrim(regexp_replace(w, '(.)', '\\1' || {_SQL_SEP}, 'g'), {_SQL_SEP})"
    )

    def pairs_cte(src: str) -> str:
        return f"""(
        SELECT pr, count(*) AS c FROM (
            SELECT unnest(list_transform(generate_series(1, len(parts) - 1),
                __i -> parts[__i] || {_SQL_SEP} || parts[__i + 1])) AS pr
            FROM (SELECT string_split(seq, {_SQL_SEP}) AS parts FROM {src})
            WHERE len(parts) >= 2
        ) GROUP BY pr
    )"""

    ctes = [
        f"""toks AS (
        SELECT unnest({_SQL_TOKS}) AS w FROM documents
    ), s0 AS (
        SELECT {seq0} AS seq FROM toks WHERE w <> ''
    )"""
    ]
    for k in range(1, BPE_STEPS + 1):
        ctes.append(f"p{k} AS {pairs_cte(f's{k - 1}')}")
        ctes.append(
            f"m{k} AS (SELECT pr, c FROM p{k} ORDER BY c DESC, pr LIMIT 1)"
        )
        if k < BPE_STEPS:
            ctes.append(
                f"""s{k} AS (
        SELECT replace(seq, (SELECT pr FROM m{k}),
                       replace((SELECT pr FROM m{k}), {_SQL_SEP}, '')) AS seq
        FROM s{k - 1}
    )"""
            )
    selects = " UNION ALL ".join(
        f"SELECT {k} AS step,"
        f" string_split(pr, {_SQL_SEP})[1] AS merge_left,"
        f" string_split(pr, {_SQL_SEP})[2] AS merge_right,"
        f" replace(pr, {_SQL_SEP}, '') AS merged,"
        f" CAST(c AS BIGINT) AS pair_count"
        f" FROM m{k}"
        for k in range(1, BPE_STEPS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + selects


@query("bpe_merge_steps", oracle=_bpe_oracle())
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding tokenizer training, first BPE_STEPS merges: the
    exact loop (count adjacent symbol pairs → merge the most frequent →
    recount) that builds GPT/Llama vocabularies, expressed as Spark plans.

    Determinism: winners tie-break (count desc, pair asc); the merge is
    applied with ``replace``, whose left-to-right non-overlapping scan is
    precisely BPE's greedy merge order — identical in Spark and DuckDB,
    so the oracle replays training step for step.

    Iterative-algorithm shape (same discipline as dedup_clusters /
    pagerank): each step is one explode + one vocabulary-keyed count agg
    over the cached token table; the single winning pair is collect()ed
    (1 row — a convergence-checksum-sized driver hop) to parameterize the
    next step's merge expression. At 100 TB, pair counting shuffles
    symbol-pair keys with map-side partials (the Zipf head collapses in
    the map stage), and real trainers batch many disjoint merges per
    round — same plan, fewer rounds."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.col("w") != ""
    )
    # NB: Spark's two-arg rtrim is rtrim(trimStr, srcStr) — REVERSED from
    # DuckDB's rtrim(srcStr, trimStr).
    seq = toks.select(
        F.expr(f"rtrim('{_BPE_SEP}', regexp_replace(w, '(.)', '$1{_BPE_SEP}'))")
        .alias("seq")
    ).persist()
    seq.count()  # materialize: every step re-reads this cache

    def top_pair(df: DataFrame):
        parts = F.split(F.col("seq"), _BPE_SEP)
        n = F.size(parts)
        zipped = F.arrays_zip(
            F.slice(parts, 1, n - 1).alias("l"), F.slice(parts, 2, n - 1).alias("r")
        )
        pairs = (
            df.filter(n >= 2)
            .select(F.explode(zipped).alias("b"))
            .select(
                F.concat(F.col("b.l"), F.lit(_BPE_SEP), F.col("b.r")).alias("pr")
            )
        )
        return (
            pairs.groupBy("pr")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("pr"))
            .limit(1)
        )

    out = None
    cur = seq
    for k in range(1, BPE_STEPS + 1):
        # persist the 1-row winner: the collect() below materializes it, and
        # the final union then reads the cache instead of recomputing the
        # whole count-and-rank subtree a second time per step
        best = top_pair(cur).persist()
        row = best.select(
            F.lit(k).alias("step"),
            F.split(F.col("pr"), _BPE_SEP)[0].alias("merge_left"),
            F.split(F.col("pr"), _BPE_SEP)[1].alias("merge_right"),
            F.translate(F.col("pr"), _BPE_SEP, "").alias("merged"),
            F.col("c").cast("long").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        # one-row driver hop parameterizes the next step's merge (and warms
        # the persist) — the iterative-algorithm pattern, not driver compute
        pr = best.collect()[0]["pr"]
        if k < BPE_STEPS:
            cur = cur.select(
                F.replace(
                    F.col("seq"), F.lit(pr), F.lit(pr.replace(_BPE_SEP, ""))
                ).alias("seq")
            )
    return out


# --------------------------------------------------------------------------
# Perplexity-proxy quality filter: score each document under the corpus'
# own bigram LM — the CCNet-style "how surprising is this text" filter
# that separates fluent prose from boilerplate/garbage before training.
# --------------------------------------------------------------------------
@query(
    "text_perplexity_bigram",
    oracle=f"""
    WITH docs_t AS (
        SELECT doc_id, {_SQL_TOKS} AS ts FROM documents
    ), bg AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ts) - 1),
                   __i -> struct_pack(w1 := ts[__i], w2 := ts[__i + 1]))) AS b
        FROM docs_t WHERE len(ts) >= 2
    ), flat AS (
        SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg
    ), pairs AS (
        SELECT w1, w2, count(*) AS n_pair FROM flat GROUP BY w1, w2
    ), lhs AS (
        SELECT w1, sum(n_pair) AS n_w1 FROM pairs GROUP BY w1
    ), probs AS (
        SELECT p.w1, p.w2,
               CAST(p.n_pair AS DOUBLE) / l.n_w1 AS cond_p
        FROM pairs p JOIN lhs l USING (w1)
    ), terms AS (
        SELECT f.doc_id, -ln(pr.cond_p) AS nlp
        FROM flat f JOIN probs pr USING (w1, w2)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(list_reduce([0.0] || list_sort(list(nlp)), (a, b) -> a + b)
                 / count(*), 6) AS avg_neg_logp
    FROM terms
    GROUP BY doc_id
    """,
)
def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-probability under the corpus'
    own bigram model — the count-based perplexity proxy (CCNet recipe)
    that flags low-fluency/boilerplate docs for the training mix without
    any neural model. Lower = more typical of the corpus.

    Determinism: ln() can differ between engines at ULP level, so the
    per-doc fold sorts the term list and seeds 0.0 (the entropy_fold
    discipline) and the output rounds to 6 dp — accumulation order is
    pinned and ULP noise is absorbed. Plan: ONE bigram explode feeds
    both the LM counts and the scoring join; probability lookup is a
    vocabulary-keyed equi-join (Zipf head collapses in map-side
    partials); the per-doc rollup keys on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    docs_t = docs.select("doc_id", toks.alias("ts")).filter(F.size("ts") >= 2)
    n = F.size("ts")
    zipped = F.arrays_zip(
        F.slice("ts", 1, n - 1).alias("w1"), F.slice("ts", 2, n - 1).alias("w2")
    )
    flat = docs_t.select("doc_id", F.explode(zipped).alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    ).persist()
    flat.count()  # materialize: feeds LM counts AND the scoring join
    pairs = flat.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    lhs = pairs.groupBy("w1").agg(F.sum("n_pair").alias("n_w1"))
    probs = pairs.join(lhs, "w1").select(
        "w1", "w2",
        (F.col("n_pair").cast("double") / F.col("n_w1")).alias("cond_p"),
    )
    terms = flat.join(probs, ["w1", "w2"]).select(
        "doc_id", (-F.log(F.col("cond_p"))).alias("nlp")
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(
            F.expr(
                "aggregate(sort_array(collect_list(nlp)),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("avg_neg_logp"),
    )


# --------------------------------------------------------------------------
# Language-ID confusion matrix: the accuracy report for the lang_id gate.
# --------------------------------------------------------------------------
def _lang_confusion_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH pred AS MATERIALIZED ({ORACLES['text_lang_id']})
    SELECT lang_label, lang_pred,
           count(*) AS n_docs
    FROM pred
    GROUP BY lang_label, lang_pred
    """


@query("text_lang_confusion", oracle=_lang_confusion_oracle())
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the registered language-ID gate against the
    corpus labels (engine and oracle both compose text_lang_id) — the
    report that says whether a lang filter is safe to apply before it
    drops half a language's documents. One tiny two-key rollup over the
    map-only classifier."""
    from ..registry import QUERIES

    pred = QUERIES["text_lang_id"](spark, sf_dir)
    return pred.groupBy("lang_label", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# --------------------------------------------------------------------------
# Vocabulary coverage: what fraction of token occurrences a top-V
# vocabulary captures (the go/no-go number for a fixed-vocab tokenizer).
# --------------------------------------------------------------------------
_VOCAB_SIZES = (100, 500)


@query(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_SQL_TOKS}) AS token FROM documents
    ), counts AS (
        SELECT token, count(*) AS n FROM tok GROUP BY token
    ), ranked AS (
        SELECT n, rank() OVER (ORDER BY n DESC, token) AS r FROM counts
    ), wide AS (
        SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN r <= {_VOCAB_SIZES[0]} THEN n ELSE 0 END)
                    AS BIGINT) AS cov_a,
               CAST(sum(CASE WHEN r <= {_VOCAB_SIZES[1]} THEN n ELSE 0 END)
                    AS BIGINT) AS cov_b
        FROM ranked
    )
    SELECT v.v_size, w.total_tokens,
           CASE v.v_size WHEN {_VOCAB_SIZES[0]} THEN w.cov_a
                         ELSE w.cov_b END AS covered_tokens,
           CASE v.v_size WHEN {_VOCAB_SIZES[0]} THEN w.cov_a
                         ELSE w.cov_b END
               / CAST(w.total_tokens AS DOUBLE) AS coverage
    FROM wide w, (VALUES ({_VOCAB_SIZES[0]}), ({_VOCAB_SIZES[1]})) v(v_size)
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-V vocabulary coverage: the share of all token occurrences that
    the V most frequent tokens capture, for V in {100, 500}. Membership
    uses rank() over the total (count desc, token asc) order, so
    boundary ties resolve identically on both engines; coverage is ONE
    IEEE division of two exact integers.

    Plan shape: explode + one token-keyed count shuffle; the rank window
    then sorts the VOCABULARY (|V| rows, corpus-independent) on a single
    partition — the fact-scale work never sees a global sort. The final
    conditional sums collapse to one row before the 2-row V fan-out."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = counts.select(
        "n", F.rank().over(Window.orderBy(F.desc("n"), F.asc("token"))).alias("r")
    )
    wide = ranked.agg(
        F.sum("n").alias("total_tokens"),
        F.sum(F.when(F.col("r") <= _VOCAB_SIZES[0], F.col("n")).otherwise(0)).alias(
            "cov_a"
        ),
        F.sum(F.when(F.col("r") <= _VOCAB_SIZES[1], F.col("n")).otherwise(0)).alias(
            "cov_b"
        ),
    )
    sizes = F.explode(
        F.array(*[F.lit(v) for v in _VOCAB_SIZES])
    ).alias("v_size")
    return (
        wide.select(sizes, "total_tokens", "cov_a", "cov_b")
        .select(
            "v_size",
            "total_tokens",
            F.when(F.col("v_size") == _VOCAB_SIZES[0], F.col("cov_a"))
            .otherwise(F.col("cov_b"))
            .alias("covered_tokens"),
            (
                F.when(F.col("v_size") == _VOCAB_SIZES[0], F.col("cov_a")).otherwise(
                    F.col("cov_b")
                )
                / F.col("total_tokens").cast("double")
            ).alias("coverage"),
        )
    )


# --------------------------------------------------------------------------
# Document-frequency spectrum: how many vocabulary terms live in each
# power-of-two document-frequency band (rare-tail vs stopword-head shape).
# --------------------------------------------------------------------------
def _df_bucket_case(col: str, max_pow: int = 12) -> str:
    """Integer-only power-of-two bucketing CASE, shared verbatim by both
    engines (no log2 floats: libm rounding at exact powers of two could
    split the engines)."""
    arms = " ".join(
        f"WHEN {col} <= {1 << p} THEN {p}" for p in range(max_pow + 1)
    )
    return f"CASE {arms} ELSE {max_pow + 1} END"


@query(
    "token_df_spectrum",
    oracle=f"""
    WITH td AS (
        SELECT DISTINCT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ), dfreq AS (
        SELECT token, count(*) AS df FROM td GROUP BY token
    )
    SELECT {_df_bucket_case('df')} AS df_bucket,
           count(*) AS n_terms,
           CAST(sum(df) AS BIGINT) AS sum_df
    FROM dfreq
    GROUP BY df_bucket
    """,
)
def token_df_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency spectrum: bucket every vocabulary term by
    ceil-log2 of its document frequency (terms appearing in <=2^p docs),
    reporting terms-per-band and total df mass. The Zipf shape check a
    tokenizer/TF-IDF pipeline runs before fixing min_df/max_df cutoffs.

    Plan shape (round 8, guide §2.4): the per-document token de-dup runs
    IN-ROW (array_distinct before the explode — a (doc_id, token) tuple
    is distinct iff the token is distinct within its own document), which
    deletes the old fact-scale DISTINCT exchange outright; what remains
    is one token-keyed df count (Zipf-head skew absorbed by map-side
    partials) and the tiny band rollup — two exchanges where the old
    plan paid three. Bucketing is integer CASE compares shared verbatim
    with the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    td = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"),
    )
    dfreq = td.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        dfreq.select(F.expr(_df_bucket_case("df")).alias("df_bucket"), "df")
        .groupBy("df_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("df").cast("long").alias("sum_df"),
        )
    )


# --------------------------------------------------------------------------
# Source vocabulary overlap: Jaccard similarity of the token vocabularies
# of every source pair — the corpus-level cousin of document dedup
# (which sources speak the same language / mirror the same content?).
# --------------------------------------------------------------------------
@query(
    "source_vocab_overlap",
    oracle=f"""
    WITH st AS (
        SELECT DISTINCT source, unnest({_SQL_TOKS}) AS token FROM documents
    ), vocab AS (
        SELECT source, count(*) AS v FROM st GROUP BY source
    ), inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(va.v AS BIGINT) AS vocab_a,
           CAST(vb.v AS BIGINT) AS vocab_b,
           i.n_common / CAST(va.v + vb.v - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN vocab va ON va.source = i.src_a
    JOIN vocab vb ON vb.source = i.src_b
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary Jaccard: for every (source, source)
    pair with src_a < src_b, the shared-token count against both vocab
    sizes. High overlap across sources predicts cross-source near-dups
    before any pairwise document work runs (the cheap pre-check for
    dedup_source_matrix). One IEEE division of exact integers.

    Plan shape: the (source, token) distinct collapses the corpus to
    vocabulary scale; the pair join keys on token, so a term shared by
    all sources contributes |S|²/2 rows — bounded by the SOURCE count
    squared, not the corpus; vocab sizes join back via tiny broadcast.
    At 100 TB the distinct is the only fact-scale shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    st = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    ).distinct()
    vocab = st.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = st.select(F.col("source").alias("src_a"), "token")
    b = st.select(F.col("source").alias("src_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    va = vocab.select(F.col("source").alias("src_a"), F.col("v").alias("vocab_a"))
    vb = vocab.select(F.col("source").alias("src_b"), F.col("v").alias("vocab_b"))
    return (
        inter.join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            (
                F.col("n_common")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Shingle novelty: what fraction of each document's shingles appear here
# for the FIRST time (by doc_id order) — the marginal-content curve that
# says when a crawl stops adding new text.
# --------------------------------------------------------------------------
def _novelty_oracle() -> str:
    from ..functions.hashing import sql_word_shingles

    shingles = f"list_distinct({sql_word_shingles(_SQL_TOKS, 3)})"
    return f"""
    WITH ds AS (
        SELECT doc_id, source, unnest({shingles}) AS shingle
        FROM documents
    ), firsts AS (
        SELECT shingle, min(doc_id) AS first_doc FROM ds GROUP BY shingle
    ), per_doc AS (
        SELECT d.doc_id, d.source,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel
        FROM ds d JOIN firsts f ON f.shingle = d.shingle
        GROUP BY d.doc_id, d.source
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_shingles) AS BIGINT) AS total_shingles,
           CAST(sum(n_novel) AS BIGINT) AS novel_shingles,
           sum(n_novel) / CAST(sum(n_shingles) AS DOUBLE) AS novelty_ratio
    FROM per_doc
    GROUP BY source
    """


@query("text_novelty_ratio", oracle=_novelty_oracle())
def text_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source shingle novelty: the share of 3-token shingle
    occurrences whose FIRST appearance (minimum doc_id) is in that very
    document — high novelty means the source still contributes fresh
    text; a collapsing ratio says the crawl is re-reading itself. Uses
    the same 3-token shingles as the MinHash dedup family; ingestion
    order is pinned to doc_id so both engines agree on 'first'.

    Plan shape: one shingle-keyed min aggregation (map-side partials
    absorb the boilerplate head), joined back to the shingle stream on
    the same key — the shuffle layout is reused, not re-keyed; then two
    shrinking rollups (doc, then source). One IEEE division of exact
    integer sums at source grain."""
    from ..functions.hashing import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    ds = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), 3))
        ).alias("shingle"),
    )
    firsts = ds.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        ds.join(firsts, "shingle")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_shingles").cast("long").alias("total_shingles"),
        F.sum("n_novel").cast("long").alias("novel_shingles"),
        (
            F.sum("n_novel") / F.sum("n_shingles").cast("double")
        ).alias("novelty_ratio"),
    )


# --------------------------------------------------------------------------
# Collocation mining: top bigrams by PMI-lift over the corpus.
# --------------------------------------------------------------------------
PMI_MIN_COUNT = 5
PMI_TOPK = 20


@query(
    "text_collocation_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT {_SQL_TOKS} AS ts FROM documents
    ), bg AS (
        SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                                     __i -> struct_pack(w1 := ts[__i],
                                                        w2 := ts[__i + 1]))) AS b
        FROM toks
        WHERE len(ts) >= 2
    ), pairs AS (
        SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n_pair
        FROM bg GROUP BY 1, 2
    ), lhs AS (
        SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_left FROM pairs GROUP BY w1
    ), rhs AS (
        SELECT w2, CAST(sum(n_pair) AS BIGINT) AS n_right FROM pairs GROUP BY w2
    ), tot AS (
        SELECT CAST(sum(n_pair) AS BIGINT) AS n_total FROM pairs
    ), scored AS (
        SELECT p.w1, p.w2,
               CAST(p.n_pair AS BIGINT) AS n_pair,
               l.n_left, r.n_right,
               CAST(p.n_pair AS DOUBLE) * CAST(t.n_total AS DOUBLE)
                   / CAST(l.n_left AS DOUBLE) / CAST(r.n_right AS DOUBLE)
                   AS lift
        FROM pairs p
        JOIN lhs l USING (w1)
        JOIN rhs r USING (w2)
        CROSS JOIN tot t
        WHERE p.n_pair >= {PMI_MIN_COUNT}
    )
    SELECT w1, w2, n_pair, n_left, n_right, lift
    FROM scored
    ORDER BY lift DESC, w1, w2
    LIMIT {PMI_TOPK}
    """,
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations: bigrams whose observed frequency most exceeds the
    independence expectation, ranked by lift
    n(w1,w2) * N / (n(w1,·) * n(·,w2)) — the exp(PMI) score. Lift is a
    monotone transform of PMI, so ranking by the exact rational avoids
    ln() entirely: counts are exact integers and the score is three
    IEEE-correctly-rounded ops applied in pinned order, bit-identical
    across engines (the log-free discipline; contrast
    text_perplexity_bigram's sorted-fold-plus-round treatment where ln
    is unavoidable). The min-count floor keeps hapax pairs (whose lift
    is degenerate ~N/n) out of the head — the standard collocation
    guard.

    Plan: ONE bigram explode feeds the pair counts; both marginals and
    the total derive from the vocabulary-sized pair table, never from a
    second corpus pass. Marginal joins key on single tokens where Zipf
    skew is absorbed by map-side partials; the 1-row total is a
    broadcast crossJoin; top-k is a total order (lift desc, then the
    pair) -> TakeOrderedAndProject, never a full sort at scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    docs_t = docs.select(toks.alias("ts")).filter(F.size("ts") >= 2)
    n = F.size("ts")
    zipped = F.arrays_zip(
        F.slice("ts", 1, n - 1).alias("w1"), F.slice("ts", 2, n - 1).alias("w2")
    )
    bg = docs_t.select(F.explode(zipped).alias("b")).select(
        F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    pairs = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    pairs = pairs.persist()
    lhs = pairs.groupBy("w1").agg(F.sum("n_pair").cast("long").alias("n_left"))
    rhs = pairs.groupBy("w2").agg(F.sum("n_pair").cast("long").alias("n_right"))
    tot = pairs.agg(F.sum("n_pair").cast("long").alias("n_total"))
    scored = (
        pairs.filter(F.col("n_pair") >= PMI_MIN_COUNT)
        .join(lhs, "w1")
        .join(rhs, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            "n_left",
            "n_right",
            (
                F.col("n_pair").cast("double")
                * F.col("n_total").cast("double")
                / F.col("n_left").cast("double")
                / F.col("n_right").cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "w1", "w2"
    ).limit(PMI_TOPK)


# --------------------------------------------------------------------------
# Zipf exponent of the token frequency spectrum — log-log OLS fit.
# --------------------------------------------------------------------------
ZIPF_V = 500


@query(
    "text_zipf_slope",
    oracle=f"""
    WITH tk AS (
        SELECT unnest({_SQL_TOKS}) AS token FROM documents
    ), c AS (
        SELECT token, count(*) AS cnt FROM tk GROUP BY token
    ), top AS (
        SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT {ZIPF_V}
    ), r AS (
        SELECT CAST(cnt AS BIGINT) AS cnt,
               row_number() OVER (ORDER BY cnt DESC, token) AS rank
        FROM top
    ), l AS (
        SELECT CAST(count(*) AS BIGINT) AS v,
               list_sort(list(struct_pack(rank := rank, cnt := cnt))) AS lst
        FROM r
    ), f AS (
        SELECT v,
               list_reduce([0.0] || list_transform(lst,
                   s -> ln(CAST(s.rank AS DOUBLE))), (a, b) -> a + b) AS sx,
               list_reduce([0.0] || list_transform(lst,
                   s -> ln(CAST(s.cnt AS DOUBLE))), (a, b) -> a + b) AS sy,
               list_reduce([0.0] || list_transform(lst,
                   s -> ln(CAST(s.rank AS DOUBLE))
                        * ln(CAST(s.cnt AS DOUBLE))), (a, b) -> a + b) AS sxy,
               list_reduce([0.0] || list_transform(lst,
                   s -> ln(CAST(s.rank AS DOUBLE))
                        * ln(CAST(s.rank AS DOUBLE))), (a, b) -> a + b) AS sxx
        FROM l
    )
    SELECT v AS n_tokens,
           round((v * sxy - sx * sy) / (v * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - (v * sxy - sx * sy) / (v * sxx - sx * sx) * sx) / v, 6)
               AS log_intercept
    FROM f
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus: OLS slope of ln(frequency) on
    ln(rank) over the top 500 tokens — natural text sits near −1, and a
    corpus that drifts (boilerplate spam flattens the head, templated
    text steepens it) fails the mix gate before any model sees it. The
    companion number to token_df_spectrum (document frequency) on the
    collection-frequency axis.

    Determinism: ln() can differ at ULP level between engines, so all
    four OLS moments fold in sorted (rank, cnt) struct order with a 0.0
    seed and the outputs round to 6 dp — the entropy_fold discipline;
    the fold is bounded at V rows, never vocabulary- or corpus-scale.
    Rank ties cannot diverge: ordering is (cnt desc, token), a total
    order.

    Plan: one token explode → one vocabulary-keyed count (Zipf head
    collapses map-side), then top-V via TakeOrderedAndProject — the
    only sort in the plan runs over V rows, and the window that assigns
    ranks runs single-partition over those same V rows (bounded by
    construction). At 100 TB the explode+count dominates; everything
    after is constant-size."""
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    counts = tk.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), "token").limit(ZIPF_V)
    w = Window.orderBy(F.desc("cnt"), "token")
    ranked = top.select(
        F.col("cnt").cast("long").alias("cnt"),
        F.row_number().over(w).cast("long").alias("rank"),
    )
    g = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sort_array(F.collect_list(F.struct("rank", "cnt"))).alias("lst"),
    )
    def _fold(term: str) -> Column:
        return F.expr(
            f"aggregate(transform(lst, s -> {term}),"
            " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        )

    f = g.select(
        "v",
        _fold("ln(CAST(s.rank AS DOUBLE))").alias("sx"),
        _fold("ln(CAST(s.cnt AS DOUBLE))").alias("sy"),
        _fold(
            "ln(CAST(s.rank AS DOUBLE)) * ln(CAST(s.cnt AS DOUBLE))"
        ).alias("sxy"),
        _fold(
            "ln(CAST(s.rank AS DOUBLE)) * ln(CAST(s.rank AS DOUBLE))"
        ).alias("sxx"),
    )
    slope = (F.col("v") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("v") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return f.select(
        F.col("v").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("v"), 6).alias(
            "log_intercept"
        ),
    )


# --------------------------------------------------------------------------
# Boilerplate chunk mining: repeated fixed-width token windows across docs.
# --------------------------------------------------------------------------
BP_CHUNK_TOKENS = 16
BP_TOPK = 20


@query(
    "boilerplate_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SQL_TOKS} AS ts FROM documents
    ), c AS (
        SELECT doc_id, ts,
               CASE WHEN len(ts) <= {BP_CHUNK_TOKENS} THEN 1
                    ELSE (len(ts) + {BP_CHUNK_TOKENS} - 1)
                         // {BP_CHUNK_TOKENS} END AS n
        FROM t
    ), ch AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_slice(ts, i.i * {BP_CHUNK_TOKENS} + 1,
                              i.i * {BP_CHUNK_TOKENS} + {BP_CHUNK_TOKENS}),
                   ' ')) AS chunk_hash
        FROM c, LATERAL (
            SELECT unnest(generate_series(0, c.n - 1)) AS i) i
    ), g AS (
        SELECT chunk_hash,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               min(doc_id) AS example_doc_id
        FROM ch GROUP BY chunk_hash
        HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT * FROM g
    ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash
    LIMIT {BP_TOPK}
    """,
)
def boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining at SUB-document granularity: hash every
    non-overlapping 16-token window and surface the windows that recur
    across >= 2 distinct documents — headers, footers, license blocks
    and navigation chrome that whole-document dedup (dedup_exact) and
    even near-dup pairing can't touch because the hosting documents
    differ. The top table is what a cleaning rule gets written against;
    C4-style pipelines run exactly this "repeated line/paragraph"
    census before training.

    Plan: chunk expansion is scan-stage array math (slice windows of the
    one tokenization — the shingle trick, no per-element lambdas re-
    evaluating the tokenizer); then ONE hash-keyed aggregation (both the
    distinct-doc and occurrence counts ride it; duplicate-heavy keys ARE
    the signal, and md5 keys distribute uniformly otherwise) and a
    TakeOrderedAndProject top-k. At 100 TB identical to the dedup_exact
    shape, one explode wider."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    c = t.withColumn(
        "n",
        F.expr(
            f"CASE WHEN size(ts) <= {BP_CHUNK_TOKENS} THEN 1"
            f" ELSE (size(ts) + {BP_CHUNK_TOKENS} - 1)"
            f" div {BP_CHUNK_TOKENS} + 0 END"
        ),
    )
    ch = c.select(
        "doc_id",
        F.explode(F.expr("sequence(0, n - 1)")).alias("i"),
        "ts",
    ).select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    f"slice(ts, i * {BP_CHUNK_TOKENS} + 1, {BP_CHUNK_TOKENS})"
                ),
            )
        ).alias("chunk_hash"),
    )
    g = (
        ch.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return g.orderBy(
        F.desc("n_docs"), F.desc("n_occurrences"), "chunk_hash"
    ).limit(BP_TOPK)


# --------------------------------------------------------------------------
# BPE compression curve: corpus symbol count after each learned merge.
# --------------------------------------------------------------------------
def _bpe_curve_oracle() -> str:
    """Same training chain as _bpe_oracle, but emitting the corpus-level
    compression measurement per state: steps 0..BPE_STEPS, where sK has
    ALL of the first K merges applied (state s{BPE_STEPS} is added here;
    the training oracle stops materializing one state early)."""
    seq0 = (
        f"rtrim(regexp_replace(w, '(.)', '\\1' || {_SQL_SEP}, 'g'), {_SQL_SEP})"
    )

    def pairs_cte(src: str) -> str:
        return f"""(
        SELECT pr, count(*) AS c FROM (
            SELECT unnest(list_transform(generate_series(1, len(parts) - 1),
                __i -> parts[__i] || {_SQL_SEP} || parts[__i + 1])) AS pr
            FROM (SELECT string_split(seq, {_SQL_SEP}) AS parts FROM {src})
            WHERE len(parts) >= 2
        ) GROUP BY pr
    )"""

    ctes = [
        f"""toks AS (
        SELECT unnest({_SQL_TOKS}) AS w FROM documents
    ), s0 AS (
        SELECT {seq0} AS seq FROM toks WHERE w <> ''
    )"""
    ]
    for k in range(1, BPE_STEPS + 1):
        ctes.append(f"p{k} AS {pairs_cte(f's{k - 1}')}")
        ctes.append(
            f"m{k} AS (SELECT pr, c FROM p{k} ORDER BY c DESC, pr LIMIT 1)"
        )
        ctes.append(
            f"""s{k} AS (
        SELECT replace(seq, (SELECT pr FROM m{k}),
                       replace((SELECT pr FROM m{k}), {_SQL_SEP}, '')) AS seq
        FROM s{k - 1}
    )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {k} AS step,"
        f" CAST(count(*) AS BIGINT) AS n_words,"
        f" CAST(sum(len(string_split(seq, {_SQL_SEP}))) AS BIGINT)"
        f" AS n_symbols,"
        f" CAST(CAST(sum(len(string_split(seq, {_SQL_SEP}))) AS BIGINT)"
        f" AS DOUBLE) / count(*) AS symbols_per_word"
        f" FROM s{k}"
        for k in range(0, BPE_STEPS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + selects


@query("bpe_compression_curve", oracle=_bpe_curve_oracle())
def bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the learned BPE merges actually BUY: corpus symbol count and
    symbols-per-word after each of the first merges (step 0 = raw
    characters) — the compression/fertility curve a tokenizer team
    plots to decide vocabulary size, measured by APPLYING the trained
    merges to the full corpus, not just reporting pair counts. Shares
    training semantics with bpe_merge_steps (identical winner selection
    and greedy replace application), so the curve can never drift from
    the trainer.

    Iterative shape: same per-step cached-state loop as the trainer
    (each merge winner is a 1-row collect that parameterizes the next
    state); each state additionally feeds ONE symbol-count aggregate —
    sum of split lengths, scan-bound over the cached word table. The
    per-step states persist: the count branch and the next step's pair
    count both read them."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.col("w") != ""
    )
    seq = toks.select(
        F.expr(f"rtrim('{_BPE_SEP}', regexp_replace(w, '(.)', '$1{_BPE_SEP}'))")
        .alias("seq")
    ).persist()
    seq.count()

    def top_pair(df: DataFrame):
        parts = F.split(F.col("seq"), _BPE_SEP)
        n = F.size(parts)
        zipped = F.arrays_zip(
            F.slice(parts, 1, n - 1).alias("l"), F.slice(parts, 2, n - 1).alias("r")
        )
        pairs = (
            df.filter(n >= 2)
            .select(F.explode(zipped).alias("b"))
            .select(
                F.concat(F.col("b.l"), F.lit(_BPE_SEP), F.col("b.r")).alias("pr")
            )
        )
        return (
            pairs.groupBy("pr")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("pr"))
            .limit(1)
        )

    def state_stats(df: DataFrame, k: int):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.size(F.split(F.col("seq"), _BPE_SEP)))
            .cast("long")
            .alias("n_symbols"),
            (
                F.sum(F.size(F.split(F.col("seq"), _BPE_SEP)))
                .cast("long")
                .cast("double")
                / F.count(F.lit(1))
            ).alias("symbols_per_word"),
        ).select(
            F.lit(k).alias("step"), "n_words", "n_symbols", "symbols_per_word"
        )

    out = state_stats(seq, 0)
    cur = seq
    for k in range(1, BPE_STEPS + 1):
        pr = top_pair(cur).collect()[0]["pr"]
        cur = cur.select(
            F.replace(
                F.col("seq"), F.lit(pr), F.lit(pr.replace(_BPE_SEP, ""))
            ).alias("seq")
        ).persist()
        cur.count()  # the count branch AND step k+1's pair count read it
        out = out.unionByName(state_stats(cur, k))
    return out


# --------------------------------------------------------------------------
# Quality gate sweep: corpus yield at candidate quality thresholds.
# --------------------------------------------------------------------------
GATE_THRESHOLDS = ("0.3", "0.5", "0.7")  # decimal literals, engine-exact


def _gate_sweep_oracle() -> str:
    from ..registry import ORACLES

    per_t = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({t} AS DOUBLE) AS threshold,
           CAST(count(*) FILTER (WHERE quality >= {t}) AS BIGINT)
               AS docs_kept,
           (SELECT CAST(count(*) AS BIGINT) FROM j) AS docs_total,
           CAST(sum(ws_tokens) FILTER (WHERE quality >= {t}) AS BIGINT)
               AS tokens_kept,
           (SELECT CAST(sum(ws_tokens) AS BIGINT) FROM j) AS tokens_total,
           CAST(CAST(sum(ws_tokens) FILTER (WHERE quality >= {t})
                     AS BIGINT) AS DOUBLE)
               / (SELECT CAST(sum(ws_tokens) AS BIGINT) FROM j)
               AS token_yield
    FROM j"""
        for t in GATE_THRESHOLDS
    )
    return f"""
    WITH q AS MATERIALIZED ({ORACLES['text_quality']}),
    tc AS MATERIALIZED ({ORACLES['text_token_count']}),
    j AS (
        SELECT q.quality, tc.ws_tokens
        FROM q JOIN tc ON tc.doc_id = q.doc_id
        WHERE q.quality IS NOT NULL
    )
{per_t}
    """


@query("quality_gate_sweep", oracle=_gate_sweep_oracle())
def quality_gate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate-setting table: document and TOKEN yield of the corpus at
    each candidate quality threshold — the trade a data lead actually
    decides on ("0.7 keeps 38% of tokens; 0.5 keeps 81%") before
    prep_pipeline hard-codes one. Token yield is the number that
    matters: quality correlates with length, so document yield alone
    misleads. Composes the registered quality and token-count queries —
    the sweep can never disagree with the production gate's inputs.

    Exactness: thresholds are decimal literals compared against the
    6-dp-rounded quality score; every cell is an exact integer count /
    sum; one pinned division per row.

    Plan: quality and token features are both map-only over the scan;
    ONE doc_id join, then a single 1-row aggregate per threshold over
    the joined table (conditional sums — no re-scan per threshold, and
    at 100 TB the three thresholds ride the same shuffle-free pass)."""
    from ..registry import QUERIES

    q = QUERIES["text_quality"](spark, sf_dir).filter(
        F.col("quality").isNotNull()
    ).select("doc_id", "quality")
    tc = QUERIES["text_token_count"](spark, sf_dir).select(
        "doc_id", "ws_tokens"
    )
    j = q.join(tc, "doc_id").persist()
    j.count()
    tot = j.agg(
        F.count(F.lit(1)).cast("long").alias("docs_total"),
        F.sum("ws_tokens").cast("long").alias("tokens_total"),
    )
    out = None
    for t in GATE_THRESHOLDS:
        keep = F.col("quality") >= float(t)
        row = (
            j.agg(
                F.sum(keep.cast("int")).cast("long").alias("docs_kept"),
                F.coalesce(F.sum(F.when(keep, F.col("ws_tokens"))), F.lit(0))
                .cast("long")
                .alias("tokens_kept"),
            )
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(float(t)).alias("threshold"),
                "docs_kept",
                "docs_total",
                "tokens_kept",
                "tokens_total",
                (
                    F.col("tokens_kept").cast("double")
                    / F.col("tokens_total")
                ).alias("token_yield"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# Token-distribution drift: chi-square homogeneity between sources.
# --------------------------------------------------------------------------
DRIFT_TOP_TOKENS = 50


@query(
    "text_token_drift_chi2",
    oracle=f"""
    WITH ref AS (
        SELECT min(source) AS ref_source FROM documents
    ), tk AS (
        SELECT CASE WHEN d.source = r.ref_source THEN 1 ELSE 0 END AS g1,
               unnest({_SQL_TOKS}) AS token
        FROM documents d CROSS JOIN ref r
    ), top AS (
        SELECT token FROM (
            SELECT token, count(*) AS c FROM tk GROUP BY token
            ORDER BY c DESC, token LIMIT {DRIFT_TOP_TOKENS}
        )
    ), cells AS (
        SELECT t.token,
               CAST(count(*) FILTER (WHERE g1 = 1) AS BIGINT) AS c1,
               CAST(count(*) FILTER (WHERE g1 = 0) AS BIGINT) AS c2
        FROM tk JOIN top t USING (token)
        GROUP BY t.token
    ), tot AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2
        FROM cells
    ), terms AS (
        SELECT c.token,
               (c.c1 - (c.c1 + c.c2) * (CAST(t.n1 AS DOUBLE) / (t.n1 + t.n2)))
                   * (c.c1 - (c.c1 + c.c2)
                      * (CAST(t.n1 AS DOUBLE) / (t.n1 + t.n2)))
                   / ((c.c1 + c.c2) * (CAST(t.n1 AS DOUBLE) / (t.n1 + t.n2)))
               + (c.c2 - (c.c1 + c.c2)
                      * (CAST(t.n2 AS DOUBLE) / (t.n1 + t.n2)))
                   * (c.c2 - (c.c1 + c.c2)
                      * (CAST(t.n2 AS DOUBLE) / (t.n1 + t.n2)))
                   / ((c.c1 + c.c2) * (CAST(t.n2 AS DOUBLE) / (t.n1 + t.n2)))
                   AS term
        FROM cells c CROSS JOIN tot t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) - 1 AS BIGINT) AS dof,
           round(list_reduce([0.0] || list_transform(
                     list_sort(list(struct_pack(tk := token, tm := term))),
                     x -> x.tm), (a, b) -> a + b), 6) AS chi2
    FROM terms
    """,
)
def text_token_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity of token usage between the reference source
    (lexicographically first — the same deterministic split as
    ks_two_sample) and the rest of the corpus, over the top-50 shared
    vocabulary: the CATEGORICAL drift test that pairs with
    ks_two_sample's ordinal one — "is the new crawl's word mix the same
    distribution?". 2×V contingency table, expected counts from pooled
    marginals, dof = V−1.

    Determinism: cell counts are exact integers off one token pass; the
    per-token term is a pinned rational expression; the V-bounded term
    sum folds in sorted token order (entropy_fold discipline) and
    rounds to 6 dp.

    Plan: one token explode feeds BOTH the top-V selection
    (TakeOrderedAndProject) and, via a broadcast semi-probe of the
    V-token list, the cell counts; everything after the second
    aggregation is V-row-sized."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.agg(F.min("source").alias("ref_source"))
    tk = docs.crossJoin(F.broadcast(ref)).select(
        (F.col("source") == F.col("ref_source")).cast("int").alias("g1"),
        F.explode(tokens(F.col("text"))).alias("token"),
    ).persist()
    tk.count()  # top-V selection AND cell counts read it
    top = (
        tk.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(DRIFT_TOP_TOKENS)
        .select("token")
    )
    cells = (
        tk.join(F.broadcast(top), "token")
        .groupBy("token")
        .agg(
            F.sum("g1").cast("long").alias("c1"),
            F.sum(1 - F.col("g1")).cast("long").alias("c2"),
        )
    )
    tot = cells.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    row_tot = F.col("c1") + F.col("c2")
    p1 = F.col("n1").cast("double") / (F.col("n1") + F.col("n2"))
    p2 = F.col("n2").cast("double") / (F.col("n1") + F.col("n2"))
    e1 = row_tot * p1
    e2 = row_tot * p2
    terms = cells.crossJoin(F.broadcast(tot)).select(
        "token",
        (
            (F.col("c1") - e1) * (F.col("c1") - e1) / e1
            + (F.col("c2") - e2) * (F.col("c2") - e2) / e2
        ).alias("term"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.round(
            F.expr(
                "aggregate(transform(sort_array(collect_list("
                "struct(token AS tk, term AS tm))), x -> x.tm),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            ),
            6,
        ).alias("chi2"),
    )


# --------------------------------------------------------------------------
# Readability scoring: Flesch reading ease from exact surface counts.
# --------------------------------------------------------------------------
@query(
    "text_readability",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               CAST(len({_SQL_TOKS}) AS BIGINT) AS n_words,
               CAST(len(list_filter(
                   regexp_split_to_array(text, '[.!?]+'),
                   __s -> trim(__s) <> '')) AS BIGINT) AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE)
                            / nullif(n_sentences, 0))
                 - 84.6 * (CAST(n_syllables AS DOUBLE)
                           / nullif(n_words, 0)), 4) AS flesch
    FROM feats
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document from pure surface counts: words
    (whitespace tokens), sentences (non-empty [.!?]-delimited spans),
    and syllables approximated as vowel GROUPS — the standard
    dictionary-free estimator (each maximal run of aeiouy ≈ one
    syllable nucleus). The readability axis complements text_quality's
    boilerplate features: a corpus can be high-"quality" by length and
    stopword mix yet unreadably dense, and readability banding is a
    routine training-mix dimension.

    Exactness: all three counts are exact integers from one regex pass
    each; the score is a pinned chain of exact-rounded IEEE ops over
    decimal-literal coefficients, rounded to 4 dp; degenerate documents
    (no sentence-final punctuation, empty text) null out via nullif
    instead of dividing by zero.

    Plan: map-only — three scan-stage regex projections, zero shuffles,
    zero joins. Scan-bound at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    feats = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"),
                lambda s: F.trim(s) != "",
            )
        )
        .cast("long")
        .alias("n_sentences"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("long")
        .alias("n_syllables"),
    )
    return feats.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (
                F.col("n_words").cast("double")
                / F.nullif(F.col("n_sentences"), F.lit(0)).cast("double")
            )
            - F.lit(84.6)
            * (
                F.col("n_syllables").cast("double")
                / F.nullif(F.col("n_words"), F.lit(0)).cast("double")
            ),
            4,
        ).alias("flesch"),
    )


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-token drift tests: which tokens ACTUALLY
# drifted, at a controlled false-discovery rate.
# --------------------------------------------------------------------------
FDR_ALPHA = 0.05

# Abramowitz & Stegun 7.1.26 erfc approximation (|abs err| < 1.5e-7,
# below the 2^-20 p-value grid). The SAME repr() literals are embedded in
# both engines' expressions, and the Horner evaluation order is pinned, so
# the only cross-engine wiggle is exp()'s final ulp — absorbed by the grid.
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_P_GRID = float(1 << 20)


def _sql_chi2_pvalue(chi2: str) -> str:
    """Pinned SQL for p = erfc(sqrt(chi2/2)), quantized to the 2^-20 grid.

    Identical text runs on Spark and DuckDB; floor(x*g + 0.5) is the
    cross-engine round (round() tie rules differ, floor is exact IEEE)."""
    a1, a2, a3, a4, a5 = _ERF_A
    x = f"sqrt(({chi2}) / 2.0)"
    t = f"(1.0 / (1.0 + {_ERF_P!r} * {x}))"
    poly = f"((((({a5!r} * {t} + {a4!r}) * {t} + {a3!r}) * {t} + {a2!r}) * {t} + {a1!r}) * {t})"
    p_raw = f"({poly} * exp(-({x}) * ({x})))"
    # floor() returns BIGINT on Spark and a bare decimal literal divisor
    # makes the quotient a scale-limited DECIMAL — cast both sides DOUBLE
    return (
        f"(CAST(floor({p_raw} * CAST({_P_GRID!r} AS DOUBLE) + 0.5) AS DOUBLE)"
        f" / CAST({_P_GRID!r} AS DOUBLE))"
    )


def _sql_grid(expr: str) -> str:
    """Snap a double to the 2^-20 grid (cross-engine 1-ulp absorber)."""
    return (
        f"(CAST(floor(({expr}) * CAST({_P_GRID!r} AS DOUBLE) + 0.5) AS DOUBLE)"
        f" / CAST({_P_GRID!r} AS DOUBLE))"
    )


@query(
    "bh_fdr_token_drift",
    oracle=f"""
    WITH ref AS (
        SELECT min(source) AS ref_source FROM documents
    ), tk AS (
        SELECT CASE WHEN d.source = r.ref_source THEN 1 ELSE 0 END AS g1,
               unnest({_SQL_TOKS}) AS token
        FROM documents d CROSS JOIN ref r
    ), top AS (
        SELECT token FROM (
            SELECT token, count(*) AS c FROM tk GROUP BY token
            ORDER BY c DESC, token LIMIT {DRIFT_TOP_TOKENS}
        )
    ), tot AS (
        SELECT CAST(sum(g1) AS BIGINT) AS n1,
               CAST(count(*) - sum(g1) AS BIGINT) AS n2
        FROM tk
    ), cells AS (
        SELECT t.token,
               CAST(count(*) FILTER (WHERE g1 = 1) AS BIGINT) AS c1,
               CAST(count(*) FILTER (WHERE g1 = 0) AS BIGINT) AS c2
        FROM tk JOIN top t USING (token)
        GROUP BY t.token
    ), stats AS (
        SELECT c.token,
               CAST(CAST(t.n1 + t.n2 AS DECIMAL(38,0))
                    * (c.c1 * (t.n2 - c.c2) - (t.n1 - c.c1) * c.c2)
                    * (c.c1 * (t.n2 - c.c2) - (t.n1 - c.c1) * c.c2)
                    AS DOUBLE)
               / CAST(CAST(t.n1 AS DECIMAL(38,0)) * t.n2 * (c.c1 + c.c2)
                      * (t.n1 + t.n2 - c.c1 - c.c2) AS DOUBLE) AS chi2_raw
        FROM cells c CROSS JOIN tot t
    ), snapped AS (
        SELECT token, {_sql_grid('chi2_raw')} AS chi2 FROM stats
    ), pv AS (
        SELECT token, chi2,
               {_sql_chi2_pvalue('chi2')} AS p_value
        FROM snapped
    ), ranked AS (
        SELECT token, chi2, p_value,
               CAST(row_number() OVER (ORDER BY p_value, token)
                    AS BIGINT) AS k_rank,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM pv
    ), cut AS (
        SELECT *,
               max(CASE WHEN p_value <= {FDR_ALPHA!r} * CAST(k_rank AS DOUBLE)
                                        / CAST(m AS DOUBLE)
                        THEN k_rank ELSE 0 END) OVER () AS k_max
        FROM ranked
    )
    SELECT token, chi2, p_value, k_rank,
           CAST(CASE WHEN k_rank <= k_max THEN 1 ELSE 0 END AS BIGINT)
               AS rejected
    FROM cut
    """,
)
def bh_fdr_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg step-up over per-token 2x2 drift tests: each
    top-V token gets its own chi-square (token vs rest-of-vocabulary,
    reference source vs rest — the per-token refinement of
    text_token_drift_chi2's single omnibus statistic), and BH at
    α = 0.05 marks which tokens are REAL discoveries under a controlled
    false-discovery rate — the multiple-testing correction every
    per-feature drift dashboard needs (50 tests at p<0.05 expect 2.5
    false alarms uncorrected).

    Exactness: each chi2 is ONE division of DECIMAL-routed exact-integer
    products (the 2x2 shortcut n(ad−bc)²/marginals — no floating
    expected counts at all), then SNAPPED to the 2^-20 grid: above 2^53
    the DECIMAL→DOUBLE cast itself rounds per-engine (observed 1-ulp at
    sf0.1), and the grid absorbs it; p-values use a PINNED A&S erfc
    approximation whose only transcendental is exp(), then snap to the
    2^-20 grid (floor(x·g+0.5) — cross-engine round), so sub-ulp exp()
    differences cannot flip a comparison; the BH cut compares identical
    doubles and the step-up is a window max over the V-row relation.

    Plan: one token explode feeds the top-V selection, the cell counts,
    and the corpus marginals (persisted once); everything from `stats`
    down is V rows — the windows are V-scale, never corpus-scale."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.agg(F.min("source").alias("ref_source"))
    tk = (
        docs.crossJoin(F.broadcast(ref))
        .select(
            (F.col("source") == F.col("ref_source")).cast("int").alias("g1"),
            F.explode(tokens(F.col("text"))).alias("token"),
        )
        .persist()
    )
    tk.count()  # top-V, cells, and marginals all read it
    top = (
        tk.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(DRIFT_TOP_TOKENS)
        .select("token")
    )
    tot = tk.agg(
        F.sum("g1").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("g1")).cast("long").alias("n2"),
    )
    cells = (
        tk.join(F.broadcast(top), "token")
        .groupBy("token")
        .agg(
            F.sum("g1").cast("long").alias("c1"),
            F.sum(1 - F.col("g1")).cast("long").alias("c2"),
        )
    )
    cross = (
        F.col("c1") * (F.col("n2") - F.col("c2"))
        - (F.col("n1") - F.col("c1")) * F.col("c2")
    )
    chi2 = (
        (
            (F.col("n1") + F.col("n2")).cast("decimal(38,0)") * cross * cross
        ).cast("double")
        / (
            F.col("n1").cast("decimal(38,0)")
            * F.col("n2")
            * (F.col("c1") + F.col("c2"))
            * (F.col("n1") + F.col("n2") - F.col("c1") - F.col("c2"))
        ).cast("double")
    )
    pv = (
        cells.crossJoin(F.broadcast(tot))
        .select("token", chi2.alias("chi2_raw"))
        .withColumn("chi2", F.expr(_sql_grid("chi2_raw")))
        .drop("chi2_raw")
        .withColumn("p_value", F.expr(_sql_chi2_pvalue("chi2")))
    )
    w_rank = Window.orderBy("p_value", "token")
    w_all = Window.partitionBy()
    ranked = pv.select(
        "token",
        "chi2",
        "p_value",
        F.row_number().over(w_rank).cast("long").alias("k_rank"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("m"),
    )
    thr = (
        F.lit(FDR_ALPHA)
        * F.col("k_rank").cast("double")
        / F.col("m").cast("double")
    )
    cut = ranked.withColumn(
        "k_max",
        F.max(
            F.when(F.col("p_value") <= thr, F.col("k_rank")).otherwise(
                F.lit(0)
            )
        ).over(w_all),
    )
    return cut.select(
        "token",
        "chi2",
        "p_value",
        "k_rank",
        F.when(F.col("k_rank") <= F.col("k_max"), 1)
        .otherwise(0)
        .cast("long")
        .alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Vocabulary growth curve: marginal new-shingle contribution per source.
# ---------------------------------------------------------------------------
from ..functions.hashing import sql_word_shingles as _sql_word_shingles
from ..functions.hashing import word_shingles as _word_shingles

_GROWTH_SHINGLES = f"list_distinct({_sql_word_shingles(_SQL_TOKS, 3)})"


@query(
    "vocab_growth_curve",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT source, unnest({_GROWTH_SHINGLES}) AS token
        FROM documents
    ), ranks AS (
        SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT)
                   AS rank
        FROM (SELECT DISTINCT source FROM documents)
    ), firstr AS (
        SELECT t.token, min(r.rank) AS fr
        FROM tok t JOIN ranks r USING (source) GROUP BY t.token
    ), new_per AS (
        SELECT fr, CAST(count(*) AS BIGINT) AS n_new FROM firstr GROUP BY fr
    )
    SELECT r.rank, r.source,
           CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new_tokens,
           CAST(sum(coalesce(n.n_new, 0)) OVER (
               ORDER BY r.rank ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_vocab
    FROM ranks r LEFT JOIN new_per n ON n.fr = r.rank
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth (Heaps-style) curve: order the sources
    lexicographically, attribute each distinct 3-token shingle to the
    FIRST source (in that order) that contains it, and report the
    marginal new-shingle count plus the cumulative phrase vocabulary
    after each source — the diversity readout that tells a corpus
    curator whether the next source still adds phrasing or only repeats
    it (the flat tail is where acquisition stops paying). Shingles, not
    unigrams: the fixture's unigram vocabulary saturates inside one
    source, while the phrase space keeps growing — same reason MinHash
    shingles at k=3.

    Exactness: pure integer tallies; the cumulative sum is an integer
    prefix sum over the ≤|sources| curve rows (cast pinned to BIGINT on
    the oracle side — DuckDB windows promote to HUGEINT).

    Plan: distinct (source, token) pairs in one agg, token-grain
    min-rank agg (both high-cardinality keyed shuffles), then the
    |sources|-row curve: broadcast rank join, one tiny window. At
    100 TB only the two token aggs touch fact-scale data."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(
            F.array_distinct(_word_shingles(tokens(F.col("text")), 3))
        ).alias("token"),
    ).distinct()
    ranks = (
        docs.select("source")
        .distinct()
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy("source")).cast("long"),
        )
    )
    firstr = (
        tok.join(F.broadcast(ranks), "source")
        .groupBy("token")
        .agg(F.min("rank").alias("fr"))
    )
    new_per = firstr.groupBy("fr").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    curve = ranks.join(
        F.broadcast(new_per), ranks["rank"] == new_per["fr"], "left"
    ).select(
        "rank",
        "source",
        F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new_tokens"),
    )
    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return curve.withColumn(
        "cum_vocab", F.sum("n_new_tokens").over(w).cast("long")
    )


# ---------------------------------------------------------------------------
# Heaps' law fit over the growth curve: V(n) ≈ K·n^β.
# ---------------------------------------------------------------------------
@query(
    "heaps_law_fit",
    oracle=f"""
    WITH tokc AS (
        SELECT source, CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS n_tok
        FROM documents GROUP BY source
    ), tok AS (
        SELECT DISTINCT source, unnest({_GROWTH_SHINGLES}) AS token
        FROM documents
    ), ranks AS (
        SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT)
                   AS rank
        FROM (SELECT DISTINCT source FROM documents)
    ), firstr AS (
        SELECT t.token, min(r.rank) AS fr
        FROM tok t JOIN ranks r USING (source) GROUP BY t.token
    ), new_per AS (
        SELECT fr, CAST(count(*) AS BIGINT) AS n_new FROM firstr GROUP BY fr
    ), curve AS (
        SELECT r.rank, r.source,
               CAST(sum(coalesce(n.n_new, 0)) OVER (
                   ORDER BY r.rank ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_vocab
        FROM ranks r LEFT JOIN new_per n ON n.fr = r.rank
    ), pts AS (
        SELECT c.rank,
               CAST(sum(t.n_tok) OVER (
                   ORDER BY c.rank ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_tok,
               c.cum_vocab
        FROM curve c JOIN tokc t ON t.source = c.source
    ), l AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               list_sort(list(struct_pack(rank := rank, x := cum_tok,
                                          y := cum_vocab))) AS lst
        FROM pts
    ), f AS (
        SELECT m,
               list_reduce([0.0] || list_transform(lst,
                   s -> ln(CAST(s.x AS DOUBLE))), (a, b) -> a + b) AS sx,
               list_reduce([0.0] || list_transform(lst,
                   s -> ln(CAST(s.y AS DOUBLE))), (a, b) -> a + b) AS sy,
               list_reduce([0.0] || list_transform(lst,
                   s -> ln(CAST(s.x AS DOUBLE))
                        * ln(CAST(s.y AS DOUBLE))), (a, b) -> a + b) AS sxy,
               list_reduce([0.0] || list_transform(lst,
                   s -> ln(CAST(s.x AS DOUBLE))
                        * ln(CAST(s.x AS DOUBLE))), (a, b) -> a + b) AS sxx
        FROM l
    )
    SELECT m AS n_points,
           round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS heaps_beta,
           round((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 6)
               AS ln_k
    FROM f
    """,
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: OLS of ln(cumulative phrase
    vocabulary) on ln(cumulative tokens) over the per-source growth
    curve — V(n) ≈ K·n^β, with natural corpora near β ≈ 0.4–0.6. The
    single-number summary of vocab_growth_curve: β near 1 means every
    source still introduces phrasing at full rate (keep acquiring);
    β collapsing toward 0 means the corpus has saturated. ln K is
    reported directly instead of K (the exp-determinism rule: runtime
    exp is 1 ulp across engines; ln and the fit stay on certified
    ground).

    Determinism: the text_zipf_slope discipline — all four OLS moments
    fold in sorted rank order with a 0.0 seed over the ≤|sources|-row
    curve; 6-dp rounds on the two outputs.

    Plan: the two fact-scale passes are the token-count rollup and the
    growth curve's distinct (source, shingle) aggs; everything after is
    |sources|-row windows and one bounded fold."""
    docs = load_table(spark, sf_dir, "documents")
    tokc = docs.select(
        "source", F.size(tokens(F.col("text"))).alias("nt")
    ).groupBy("source").agg(F.sum("nt").cast("long").alias("n_tok"))
    tok = docs.select(
        "source",
        F.explode(
            F.array_distinct(_word_shingles(tokens(F.col("text")), 3))
        ).alias("token"),
    ).distinct()
    ranks = (
        docs.select("source")
        .distinct()
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy("source")).cast("long"),
        )
    )
    firstr = (
        tok.join(F.broadcast(ranks), "source")
        .groupBy("token")
        .agg(F.min("rank").alias("fr"))
    )
    new_per = firstr.groupBy("fr").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    wc = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        ranks.join(F.broadcast(new_per), ranks["rank"] == new_per["fr"], "left")
        .select(
            "rank",
            "source",
            F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
        )
        .join(F.broadcast(tokc), "source")
        .select(
            "rank",
            F.sum("n_tok").over(wc).cast("long").alias("x"),
            F.sum("n_new").over(wc).cast("long").alias("y"),
        )
    )
    g = curve.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sort_array(F.collect_list(F.struct("rank", "x", "y"))).alias("lst"),
    )

    def _fold(term: str):
        return F.expr(
            f"aggregate(transform(lst, s -> {term}),"
            " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        )

    f = g.select(
        "m",
        _fold("ln(CAST(s.x AS DOUBLE))").alias("sx"),
        _fold("ln(CAST(s.y AS DOUBLE))").alias("sy"),
        _fold("ln(CAST(s.x AS DOUBLE)) * ln(CAST(s.y AS DOUBLE))").alias(
            "sxy"
        ),
        _fold("ln(CAST(s.x AS DOUBLE)) * ln(CAST(s.x AS DOUBLE))").alias(
            "sxx"
        ),
    )
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return f.select(
        F.col("m").alias("n_points"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("m"), 6
        ).alias("ln_k"),
    )


# ---------------------------------------------------------------------------
# Cross-source stupid-backoff trigram score: held-out fluency per source.
# ---------------------------------------------------------------------------
_SB_ALPHA = "0.4"  # the stupid-backoff discount, as a shared literal
_SB_SCALE = 1_048_576.0  # 2^20 score grid, order-free per-source mean


@query(
    "crosssource_backoff_score",
    oracle=f"""
    WITH docs_t AS (
        SELECT doc_id, source, {_SQL_TOKS} AS ts FROM documents
    ), pos AS (
        SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(ts) - 2),
                   __i -> struct_pack(w1 := ts[__i], w2 := ts[__i + 1],
                                      w3 := ts[__i + 2]))) AS g
        FROM docs_t WHERE len(ts) >= 3
    ), p AS (
        SELECT doc_id, source, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM pos
    ), uni AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS own,
               CAST(sum(count(*)) OVER (PARTITION BY w) AS BIGINT) AS tot
        FROM (SELECT source, unnest(ts) AS w FROM docs_t) GROUP BY source, w
    ), bi AS (
        SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS own,
               CAST(sum(count(*)) OVER (PARTITION BY w1, w2) AS BIGINT) AS tot
        FROM (
            SELECT source,
                   unnest(list_transform(generate_series(1, len(ts) - 1),
                       __i -> struct_pack(a := ts[__i], b := ts[__i + 1]))) AS g
            FROM docs_t WHERE len(ts) >= 2
        ) t(source, g_)
        , LATERAL (SELECT g_.a AS w1, g_.b AS w2) x
        GROUP BY source, w1, w2
    ), tri AS (
        SELECT source, w1, w2, w3, CAST(count(*) AS BIGINT) AS own,
               CAST(sum(count(*)) OVER (PARTITION BY w1, w2, w3) AS BIGINT)
                   AS tot
        FROM p GROUP BY source, w1, w2, w3
    ), nsrc AS (
        SELECT source, CAST(sum(own) AS BIGINT) AS n_own,
               CAST(sum(sum(own)) OVER () AS BIGINT) AS n_all
        FROM uni GROUP BY source
    ), scored AS (
        SELECT p.source,
               CASE WHEN t.tot - t.own > 0 THEN 0
                    WHEN b23.tot - b23.own > 0 THEN 1 ELSE 2 END AS lvl,
               CAST(round(
                   CASE WHEN t.tot - t.own > 0 THEN
                       CAST(t.tot - t.own AS DOUBLE)
                           / CAST(b12.tot - b12.own AS DOUBLE)
                   WHEN b23.tot - b23.own > 0 THEN
                       {_SB_ALPHA} * (CAST(b23.tot - b23.own AS DOUBLE)
                           / CAST(u2.tot - u2.own AS DOUBLE))
                   ELSE
                       {_SB_ALPHA} * ({_SB_ALPHA}
                           * (CAST(u3.tot - u3.own AS DOUBLE)
                              / CAST(n.n_all - n.n_own AS DOUBLE)))
                   END * {_SB_SCALE}) AS BIGINT) AS sq
        FROM p
        JOIN tri t ON t.source = p.source AND t.w1 = p.w1
                  AND t.w2 = p.w2 AND t.w3 = p.w3
        JOIN bi b12 ON b12.source = p.source AND b12.w1 = p.w1
                   AND b12.w2 = p.w2
        JOIN bi b23 ON b23.source = p.source AND b23.w1 = p.w2
                   AND b23.w2 = p.w3
        JOIN uni u2 ON u2.source = p.source AND u2.w = p.w2
        JOIN uni u3 ON u3.source = p.source AND u3.w = p.w3
        JOIN nsrc n ON n.source = p.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_positions,
           CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tri_hits,
           CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bi_hits,
           CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_uni_backoffs,
           CAST(sum(sq) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * {_SB_SCALE}) AS mean_score
    FROM scored GROUP BY source
    """,
)
def crosssource_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out fluency per source under a stupid-backoff trigram model
    trained on ALL OTHER sources (leave-one-source-out — training on the
    full corpus would make backoff unreachable, since every scored
    trigram counts itself): each trigram position scores
    count(w1w2w3)/count(w1w2), backing off to 0.4·count(w2w3)/count(w2),
    then to 0.4²·count(w3)/N, all counts excluding the doc's own source.
    Reported per source with the backoff-level histogram — the KenLM-
    style fluency/novelty readout (CCNet recipe) telling a curator which
    sources read like the rest of the corpus and which are phrase-level
    novel (high n_bi/n_uni backoff shares).

    Exactness: every count is an exact integer; held-out counts are
    total − own from one (gram, source) table per order; each score is a
    pinned chain of IEEE divisions and 0.4-literal multiplies, quantized
    to the 2^-20 grid so the per-source mean is an order-free integer
    sum. No logs anywhere.

    Plan (round 8, guide §2.4): one tokenized scan feeds the uni/bi count
    tables (each ONE groupBy + a partition-window for totals,
    vocabulary-keyed; both PINNED — each is joined twice, and unpersisted
    subtrees would replay the explode+agg per join). The trigram counts
    ride directly ON the position relation as two stacked count()
    windows — (w1,w2,w3) then (source,w1,w2,w3); the coarser hash
    partitioning already clusters the finer key, so the second window
    adds only a sort — replacing the old tri groupBy + join-back on the
    same key (two fact-scale exchanges gone). Scoring joins the four
    remaining gram lookups on vocabulary keys — Zipf heads collapse in
    map-side partials; final rollup keys on source."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    docs_t = docs.select("doc_id", "source", toks.alias("ts")).persist()
    docs_t.count()
    n = F.size("ts")

    uni_raw = docs_t.select("source", F.explode("ts").alias("w"))
    uni = uni_raw.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("own")
    ).withColumn(
        "tot", F.sum("own").over(Window.partitionBy("w")).cast("long")
    ).persist()
    uni.count()  # three consumers: u2 join, u3 join, nsrc rollup
    bi_raw = (
        docs_t.filter(n >= 2)
        .select(
            "source",
            F.explode(
                F.arrays_zip(
                    F.slice("ts", 1, n - 1).alias("a"),
                    F.slice("ts", 2, n - 1).alias("b"),
                )
            ).alias("g"),
        )
        .select("source", F.col("g.a").alias("w1"), F.col("g.b").alias("w2"))
    )
    bi = bi_raw.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("own")
    ).withColumn(
        "tot",
        F.sum("own").over(Window.partitionBy("w1", "w2")).cast("long"),
    ).persist()
    bi.count()  # two consumers: the b12 and b23 joins
    p = (
        docs_t.filter(n >= 3)
        .select(
            "source",
            F.explode(
                F.arrays_zip(
                    F.slice("ts", 1, n - 2).alias("a"),
                    F.slice("ts", 2, n - 2).alias("b"),
                    F.slice("ts", 3, n - 2).alias("c"),
                )
            ).alias("g"),
        )
        .select(
            "source",
            F.col("g.a").alias("w1"),
            F.col("g.b").alias("w2"),
            F.col("g.c").alias("w3"),
        )
    )
    # trigram counts ride on the position relation itself: coarse
    # (w1,w2,w3) window first (the exchange), then the finer source-
    # qualified window (sort only — the coarse partitioning clusters it)
    p = p.withColumn(
        "t_tot",
        F.count(F.lit(1)).over(Window.partitionBy("w1", "w2", "w3"))
        .cast("long"),
    ).withColumn(
        "t_own",
        F.count(F.lit(1))
        .over(Window.partitionBy("source", "w1", "w2", "w3"))
        .cast("long"),
    )
    nsrc = uni.groupBy("source").agg(
        F.sum("own").cast("long").alias("n_own")
    )
    nsrc = nsrc.withColumn(
        "n_all", F.sum("n_own").over(Window.partitionBy()).cast("long")
    )

    def o(t):  # held-out count: total minus own-source
        return F.col(f"{t}_tot") - F.col(f"{t}_own")

    alpha = float(_SB_ALPHA)
    score = (
        F.when(
            o("t") > 0, o("t").cast("double") / o("b12").cast("double")
        )
        .when(
            o("b23") > 0,
            F.lit(alpha)
            * (o("b23").cast("double") / o("u2").cast("double")),
        )
        .otherwise(
            F.lit(alpha)
            * (
                F.lit(alpha)
                * (
                    o("u3").cast("double")
                    / (F.col("n_all") - F.col("n_own")).cast("double")
                )
            )
        )
    )
    lvl = (
        F.when(o("t") > 0, 0).when(o("b23") > 0, 1).otherwise(2)
    )
    scored = (
        p.join(
            bi.select(
                F.col("source").alias("b12_src"),
                F.col("w1").alias("b12_w1"), F.col("w2").alias("b12_w2"),
                F.col("own").alias("b12_own"), F.col("tot").alias("b12_tot"),
            ),
            (F.col("b12_src") == F.col("source"))
            & (F.col("b12_w1") == F.col("w1"))
            & (F.col("b12_w2") == F.col("w2")),
        )
        .join(
            bi.select(
                F.col("source").alias("b23_src"),
                F.col("w1").alias("b23_w1"), F.col("w2").alias("b23_w2"),
                F.col("own").alias("b23_own"), F.col("tot").alias("b23_tot"),
            ),
            (F.col("b23_src") == F.col("source"))
            & (F.col("b23_w1") == F.col("w2"))
            & (F.col("b23_w2") == F.col("w3")),
        )
        .join(
            uni.select(
                F.col("source").alias("u2_src"), F.col("w").alias("u2_w"),
                F.col("own").alias("u2_own"), F.col("tot").alias("u2_tot"),
            ),
            (F.col("u2_src") == F.col("source"))
            & (F.col("u2_w") == F.col("w2")),
        )
        .join(
            uni.select(
                F.col("source").alias("u3_src"), F.col("w").alias("u3_w"),
                F.col("own").alias("u3_own"), F.col("tot").alias("u3_tot"),
            ),
            (F.col("u3_src") == F.col("source"))
            & (F.col("u3_w") == F.col("w3")),
        )
        .join(F.broadcast(nsrc), "source")
        .select(
            "source",
            lvl.alias("lvl"),
            F.round(score * F.lit(_SB_SCALE)).cast("long").alias("sq"),
        )
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_positions"),
        F.sum(F.when(F.col("lvl") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_tri_hits"),
        F.sum(F.when(F.col("lvl") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bi_hits"),
        F.sum(F.when(F.col("lvl") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_uni_backoffs"),
        (
            F.sum("sq").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(_SB_SCALE))
        ).alias("mean_score"),
    )


# --------------------------------------------------------------------------
# Clustering-agreement metrics over the language-ID partition: ARI and NMI
# of the predicted language clustering against the corpus labels. These are
# the partition-vs-partition numbers (the confusion matrix collapses every
# permutation question away): ARI for chance-corrected pair agreement, NMI
# for information overlap — the standard pair when auditing an unsupervised
# grouping (cluster labels, lang gates, dedup buckets) against a reference.
# --------------------------------------------------------------------------
def _agreement_cells_sql() -> str:
    from ..registry import ORACLES

    return (
        "cells AS (SELECT lang_label, lang_pred, "
        "CAST(n_docs AS BIGINT) AS nij FROM ("
        + ORACLES["text_lang_confusion"]
        + "))"
    )


def _ari_oracle() -> str:
    return f"""
    WITH {_agreement_cells_sql()},
    s AS (
        SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS s_ij,
               CAST(sum(nij) AS BIGINT) AS n_docs
        FROM cells
    ), ru AS (
        SELECT lang_label, CAST(sum(nij) AS BIGINT) AS ai
        FROM cells GROUP BY lang_label
    ), rv AS (
        SELECT lang_pred, CAST(sum(nij) AS BIGINT) AS bj
        FROM cells GROUP BY lang_pred
    ), sa AS (
        SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS s_a FROM ru
    ), sb AS (
        SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS s_b FROM rv
    )
    SELECT n_docs, s_ij, s_a, s_b,
           (2 * (n_docs * (n_docs - 1) // 2) * s_ij - 2 * s_a * s_b)
           / nullif((n_docs * (n_docs - 1) // 2) * (s_a + s_b)
                    - 2 * s_a * s_b, 0) AS ari
    FROM s, sa, sb
    """


@query("lang_agreement_ari", oracle=_ari_oracle())
def lang_agreement_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand index of the language-ID clustering vs corpus labels.

    Exactness: ARI is pure pair combinatorics — every term is an integer
    pair count (sum of C(x,2) over contingency cells / marginals), and the
    chance-corrected ratio is restructured over the common denominator
    C(n,2) so the whole statistic is ONE division of two exact int64
    products: ari = (2*C*S_ij - 2*S_a*S_b) / (C*(S_a+S_b) - 2*S_a*S_b).
    No floats until that final correctly-rounded division, so both engines
    agree bitwise. int64 headroom: terms are O(C^2) = O(n^4/4); n up to
    ~55k keeps products under 2^63 — beyond that move the two products to
    DECIMAL(38,0) (the cells/marginal layer is unchanged).

    Plan: the fact table is touched ONCE by the registered confusion
    query (map-only classifier + one 2-key rollup to <=20 cells);
    everything after runs on cell-count relations, meeting in two
    broadcast crossJoins of 1-row aggregates."""
    from ..registry import QUERIES

    cells = (
        QUERIES["text_lang_confusion"](spark, sf_dir)
        .select("lang_label", "lang_pred", F.col("n_docs").alias("nij"))
        .persist()
    )
    cells.count()
    s = cells.agg(
        F.sum(F.expr("nij * (nij - 1) DIV 2")).cast("long").alias("s_ij"),
        F.sum("nij").cast("long").alias("n_docs"),
    )
    sa = (
        cells.groupBy("lang_label")
        .agg(F.sum("nij").alias("ai"))
        .agg(F.sum(F.expr("ai * (ai - 1) DIV 2")).cast("long").alias("s_a"))
    )
    sb = (
        cells.groupBy("lang_pred")
        .agg(F.sum("nij").alias("bj"))
        .agg(F.sum(F.expr("bj * (bj - 1) DIV 2")).cast("long").alias("s_b"))
    )
    return (
        s.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .select(
            "n_docs",
            "s_ij",
            "s_a",
            "s_b",
            F.expr(
                "(2 * (n_docs * (n_docs - 1) DIV 2) * s_ij - 2 * s_a * s_b)"
                " / nullif((n_docs * (n_docs - 1) DIV 2) * (s_a + s_b)"
                "          - 2 * s_a * s_b, 0)"
            ).alias("ari"),
        )
    )


def _nmi_oracle() -> str:
    fold = (
        "list_reduce([0.0] || list_transform({lst}, "
        "x -> -(x.{f} / n_docs) * ln(x.{f} / n_docs)), (a, b) -> a + b)"
    )
    h_u = fold.format(lst="l_u", f="ai")
    h_v = fold.format(lst="l_v", f="bj")
    h_uv = fold.format(lst="l_joint", f="nij")
    return f"""
    WITH {_agreement_cells_sql()},
    g AS (
        SELECT list_sort(list(struct_pack(lang_label := lang_label,
                                          lang_pred := lang_pred,
                                          nij := nij))) AS l_joint,
               CAST(sum(nij) AS BIGINT) AS n_docs
        FROM cells
    ), ru AS (
        SELECT lang_label, CAST(sum(nij) AS BIGINT) AS ai
        FROM cells GROUP BY lang_label
    ), rv AS (
        SELECT lang_pred, CAST(sum(nij) AS BIGINT) AS bj
        FROM cells GROUP BY lang_pred
    ), gu AS (
        SELECT list_sort(list(struct_pack(lang_label := lang_label,
                                          ai := ai))) AS l_u FROM ru
    ), gv AS (
        SELECT list_sort(list(struct_pack(lang_pred := lang_pred,
                                          bj := bj))) AS l_v FROM rv
    ), h AS (
        SELECT n_docs, {h_u} AS h_u, {h_v} AS h_v, {h_uv} AS h_uv
        FROM g, gu, gv
    )
    SELECT n_docs,
           round(h_u, 6) + 0.0 AS h_true,
           round(h_v, 6) + 0.0 AS h_pred,
           round(h_uv, 6) + 0.0 AS h_joint,
           round(h_u + h_v - h_uv, 6) + 0.0 AS mutual_info,
           round((h_u + h_v - h_uv) / nullif((h_u + h_v) / 2, 0), 6)
               + 0.0 AS nmi
    FROM h
    """


@query("lang_agreement_nmi", oracle=_nmi_oracle())
def lang_agreement_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized mutual information (arithmetic-mean normalizer) of the
    language-ID clustering vs corpus labels: nmi = (H(U)+H(V)-H(U,V)) /
    ((H(U)+H(V))/2), computed from the same <=20-cell contingency table as
    lang_agreement_ari.

    Determinism: each entropy is a SORTED float fold over its own
    bounded-cardinality term list (the entropy_fold discipline — identical
    fold order and identical ln() inputs on both engines, bounded by label
    cardinality, never by fact rows); the normalizer ratio is computed
    from the unrounded entropies and rounded once at the end.

    Plan: one fact-table pass (the registered confusion query), then
    three tiny sorted-list aggregates meet via broadcast crossJoins."""
    from ..registry import QUERIES

    cells = (
        QUERIES["text_lang_confusion"](spark, sf_dir)
        .select(
            "lang_label",
            "lang_pred",
            F.col("n_docs").cast("long").alias("nij"),
        )
        .persist()
    )
    cells.count()
    g = cells.agg(
        F.sort_array(
            F.collect_list(F.struct("lang_label", "lang_pred", "nij"))
        ).alias("l_joint"),
        F.sum("nij").cast("long").alias("n_docs"),
    )
    gu = (
        cells.groupBy("lang_label")
        .agg(F.sum("nij").cast("long").alias("ai"))
        .agg(
            F.sort_array(F.collect_list(F.struct("lang_label", "ai"))).alias(
                "l_u"
            )
        )
    )
    gv = (
        cells.groupBy("lang_pred")
        .agg(F.sum("nij").cast("long").alias("bj"))
        .agg(
            F.sort_array(F.collect_list(F.struct("lang_pred", "bj"))).alias(
                "l_v"
            )
        )
    )
    fold = (
        "aggregate(transform({lst}, "
        "x -> -(x.{f} / n_docs) * ln(x.{f} / n_docs)), "
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )
    h = (
        g.crossJoin(F.broadcast(gu))
        .crossJoin(F.broadcast(gv))
        .select(
            "n_docs",
            F.expr(fold.format(lst="l_u", f="ai")).alias("h_u"),
            F.expr(fold.format(lst="l_v", f="bj")).alias("h_v"),
            F.expr(fold.format(lst="l_joint", f="nij")).alias("h_uv"),
        )
    )
    return h.select(
        "n_docs",
        (F.round("h_u", 6) + F.lit(0.0)).alias("h_true"),
        (F.round("h_v", 6) + F.lit(0.0)).alias("h_pred"),
        (F.round("h_uv", 6) + F.lit(0.0)).alias("h_joint"),
        (F.round(F.col("h_u") + F.col("h_v") - F.col("h_uv"), 6) + F.lit(0.0)).alias(
            "mutual_info"
        ),
        (
            F.round(
                (F.col("h_u") + F.col("h_v") - F.col("h_uv"))
                / F.nullif(
                    (F.col("h_u") + F.col("h_v")) / F.lit(2.0), F.lit(0.0)
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("nmi"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language — the multilingual token-budget table.
# ---------------------------------------------------------------------------
@query(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH per AS (
        SELECT lang,
               CAST(len({_SQL_TOKS}) AS BIGINT) AS ws,
               CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}'))
                    AS BIGINT) AS bpe,
               CAST(n_chars AS BIGINT) AS nc
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(nc) AS BIGINT) AS chars,
           CAST(sum(bpe) AS DOUBLE) / sum(ws) AS fertility,
           CAST(sum(nc) AS DOUBLE) / sum(bpe) AS chars_per_token
    FROM per GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word and characters per token — the table a multilingual training
    run reads before setting per-language sampling budgets, because a
    language that fragments into 2x the tokens per word costs 2x the
    compute for the same text (and under-trains at equal document
    counts). Uses the same segmenters as text_token_count, so the
    numbers reconcile with the per-document counts.

    Exactness: all four tallies are exact integer sums (each DuckDB sum
    wrapped back to BIGINT); the two ratios are single integer-ratio
    divisions, identically rounded on both engines.

    Plan: map-stage tokenization feeding ONE lang-keyed
    partial-aggregatable pass — scan-bound, no UDFs, the token regex
    stays inside whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("ws"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))
        .cast("long")
        .alias("bpe"),
        F.col("n_chars").cast("long").alias("nc"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.sum("bpe").cast("long").alias("bpe_tokens"),
        F.sum("nc").cast("long").alias("chars"),
        (F.sum("bpe").cast("double") / F.sum("ws")).alias("fertility"),
        (F.sum("nc").cast("double") / F.sum("bpe")).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# Hill tail-index estimator over the token-frequency spectrum — the
# order-statistics twin of text_zipf_slope's OLS fit.
# --------------------------------------------------------------------------
_HILL_K = 200  # tail order statistics used


@query(
    "tail_index_hill",
    oracle=f"""
    WITH tf AS (
        SELECT unnest({_sql_word_shingles(_SQL_TOKS, 3)}) AS token
        FROM documents
    ), cnt AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c FROM tf GROUP BY token
    ), top AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rk
        FROM cnt
        ORDER BY c DESC, token LIMIT {_HILL_K + 1}
    ), thr AS (
        SELECT max(CASE WHEN rk = {_HILL_K + 1} THEN c END) AS ck1,
               list_sort(list(struct_pack(rk := rk, c := c)
                         ) FILTER (WHERE rk <= {_HILL_K})) AS lst
        FROM top
    )
    SELECT CAST({_HILL_K} AS BIGINT) AS k,
           ck1 AS x_k1,
           {_HILL_K} / list_reduce([0.0] || list_transform(lst,
               x -> ln(CAST(x.c AS DOUBLE) / ck1)), (a, b) -> a + b)
               AS alpha_hill
    FROM thr
    """,
)
def tail_index_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the 3-shingle-frequency tail index (the
    unigram vocabulary saturates at ~31 types in this fixture — the
    phrase spectrum is the live power law):
    alpha = k / Σ_{{i<=k}} ln(x_(i) / x_(k+1)) over the k = 200 largest
    token counts — the order-statistics estimator of the same power law
    text_zipf_slope fits by OLS on the rank-frequency line. Running both
    IS the methodological cross-check: when the two disagree materially
    the "power law" is not one, and every downstream cap (BUCKET_CAP,
    MAX_BASKET, skew salting width) tuned on it needs a second look.
    Heavy-tail indexes also size the skew story directly: alpha <= 2
    means unbounded variance — salting is mandatory, not optional.

    Determinism: token counts are exact integers; the top-(k+1) frontier
    carries a total order (count desc, token); the k ln-ratio terms fold
    in SORTED rank order (entropy_fold discipline, bounded by k, never
    corpus size); one final division.

    Plan: one token-keyed partial-aggregatable count, a top-(k+1)
    TakeOrdered frontier (no global sort), a 1-row fold."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            F.explode(_word_shingles(tokens(F.col("text")), 3)).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), F.asc("token")).limit(_HILL_K + 1)
    w = Window.orderBy(F.desc("c"), F.asc("token"))
    ranked = top.select("c", F.row_number().over(w).alias("rk"))
    thr = ranked.agg(
        F.max(
            F.when(F.col("rk") == _HILL_K + 1, F.col("c"))
        ).alias("ck1"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("rk") <= _HILL_K, F.struct("rk", "c")
                )
            )
        ).alias("lst"),
    )
    fold = (
        "aggregate(transform(lst, x -> ln(CAST(x.c AS DOUBLE) / ck1)), "
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )
    return thr.select(
        F.lit(_HILL_K).cast("long").alias("k"),
        F.col("ck1").alias("x_k1"),
        F.expr(f"{_HILL_K} / {fold}").alias("alpha_hill"),
    )


# --------------------------------------------------------------------------
# Cohen's kappa — chance-corrected accuracy of the language-ID classifier,
# from the same confusion table as ARI/NMI but for MATCHED label spaces.
# --------------------------------------------------------------------------
def _kappa_oracle() -> str:
    return f"""
    WITH {_agreement_cells_sql()},
    t AS (
        SELECT CAST(sum(nij) AS BIGINT) AS n,
               CAST(sum(CASE WHEN lang_label = lang_pred THEN nij
                        ELSE 0 END) AS BIGINT) AS agree
        FROM cells
    ), marg AS (
        SELECT CAST(sum(a.al * b.bl) AS BIGINT) AS chance_num
        FROM (SELECT lang_label AS l, CAST(sum(nij) AS BIGINT) AS al
              FROM cells GROUP BY lang_label) a
        JOIN (SELECT lang_pred AS l, CAST(sum(nij) AS BIGINT) AS bl
              FROM cells GROUP BY lang_pred) b ON a.l = b.l
    )
    SELECT t.n AS n_docs, t.agree,
           CAST(t.agree AS DOUBLE) / t.n AS p_observed,
           CAST(m.chance_num AS DOUBLE) / (CAST(t.n AS DOUBLE) * t.n)
               AS p_chance,
           (CAST(t.n AS DOUBLE) * t.agree - m.chance_num)
             / (CAST(t.n AS DOUBLE) * t.n - m.chance_num) AS kappa
    FROM t, marg m
    """


@query("cohens_kappa_langid", oracle=_kappa_oracle())
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the language-ID classifier against the corpus
    labels: chance-corrected accuracy (po − pe)/(1 − pe) where pe is the
    agreement two raters with these marginals would reach by chance —
    the number that exposes a classifier that "scores 90%" on a corpus
    that is 90% one language. Completes the agreement family: ARI/NMI
    grade the CLUSTERING (label-space-free); kappa grades the matched
    label assignment. Same single-fact-pass confusion table as both.

    Exactness: agreement and the chance numerator Σ aₗ·bₗ are exact
    integers (kappa is rearranged to (n·agree − Σab)/(n² − Σab) so the
    expected-agreement subtraction happens in INTEGERS, not after two
    lossy divisions); the reported po/pe/kappa are pinned single
    divisions.

    Plan: the registered confusion pass, two marginal rollups joined on
    the label key (both label-cardinality-bounded), a 1-row meet."""
    from ..registry import QUERIES

    cells = QUERIES["text_lang_confusion"](spark, sf_dir).select(
        "lang_label", "lang_pred", F.col("n_docs").cast("long").alias("nij")
    )
    cells = cells.persist()
    cells.count()
    t = cells.agg(
        F.sum("nij").cast("long").alias("n"),
        F.sum(
            F.when(F.col("lang_label") == F.col("lang_pred"), F.col("nij"))
            .otherwise(0)
        )
        .cast("long")
        .alias("agree"),
    )
    a = cells.groupBy(F.col("lang_label").alias("l")).agg(
        F.sum("nij").cast("long").alias("al")
    )
    b = cells.groupBy(F.col("lang_pred").alias("l")).agg(
        F.sum("nij").cast("long").alias("bl")
    )
    marg = (
        a.join(b, "l")
        .agg(F.sum(F.col("al") * F.col("bl")).cast("long").alias("chance_num"))
    )
    return (
        t.crossJoin(F.broadcast(marg))
        .select(
            F.col("n").alias("n_docs"),
            "agree",
            F.expr("CAST(agree AS DOUBLE) / n").alias("p_observed"),
            F.expr(
                "CAST(chance_num AS DOUBLE) / (CAST(n AS DOUBLE) * n)"
            ).alias("p_chance"),
            F.expr(
                "(CAST(n AS DOUBLE) * agree - chance_num)"
                " / (CAST(n AS DOUBLE) * n - chance_num)"
            ).alias("kappa"),
        )
    )


# --------------------------------------------------------------------------
# Sketch-based source overlap: HLL inclusion-exclusion intersection of the
# 3-shingle vocabularies — the no-join scale path, audited against the
# exact pair join it replaces.
# --------------------------------------------------------------------------
_HLLOV_TOL = 0.10  # |est - exact| <= 10% of the exact UNION size


def _hllov_oracle() -> str:
    sh = f"list_distinct({_sql_word_shingles(_SQL_TOKS, 3)})"
    return f"""
    WITH st AS (
        SELECT DISTINCT source, unnest({sh}) AS token FROM documents
    ), vocab AS (
        SELECT source, CAST(count(*) AS BIGINT) AS v FROM st GROUP BY source
    ), inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
        GROUP BY a.source, b.source
    ), pairs AS (
        SELECT i.src_a, i.src_b, i.n_common,
               va.v AS vocab_a, vb.v AS vocab_b,
               va.v + vb.v - i.n_common AS n_union
        FROM inter i
        JOIN vocab va ON va.source = i.src_a
        JOIN vocab vb ON vb.source = i.src_b
    ), est AS (
        SELECT p.src_a, p.src_b,
               CAST(approx_count_distinct(s.token) AS BIGINT) AS union_est
        FROM pairs p JOIN st s ON s.source = p.src_a OR s.source = p.src_b
        GROUP BY p.src_a, p.src_b
    ), ua AS (
        SELECT source, CAST(approx_count_distinct(token) AS BIGINT) AS v_est
        FROM st GROUP BY source
    )
    SELECT p.src_a, p.src_b, p.n_common, p.vocab_a, p.vocab_b, p.n_union,
           CAST(p.n_common AS DOUBLE) / p.n_union AS jaccard,
           CAST(abs((ea.v_est + eb.v_est - e.union_est) - p.n_common)
                <= {_HLLOV_TOL!r} * p.n_union AS INT) AS inter_within_tol
    FROM pairs p
    JOIN est e ON e.src_a = p.src_a AND e.src_b = p.src_b
    JOIN ua ea ON ea.source = p.src_a
    JOIN ua eb ON eb.source = p.src_b
    """


@query("source_shingle_overlap_hll", oracle=_hllov_oracle())
def source_shingle_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source overlap on the 3-shingle vocabulary, two ways at
    once: the EXACT pair join (n_common, Jaccard — the cross-engine
    compared columns) and each engine's OWN sketch-based
    inclusion-exclusion estimate |A|+|B|−|A∪B| asserted within 10% of
    the exact union (the approx_distinct_sketch bounded-error contract).
    The sketch path is the 100 TB form: per-source sketches build in ONE
    pass and every pairwise intersection is sketch algebra on
    |sources|² tiny states — no shingle-level pair join ever runs; the
    exact join here exists to PRICE the estimate, exactly like
    sim_recall_* price the ANN indexes.

    Plan: one distinct (source, shingle) relation feeds (a) the exact
    pair join (shingle-keyed, even spread) and (b) per-source
    Datasketches HLL sketches (hll_sketch_agg) whose pairwise
    hll_union estimates come from a |sources|-row broadcast self-join.
    At 100 TB only (b) survives; (a) is the audit."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source",
            F.explode(
                F.array_distinct(_word_shingles(tokens(F.col("text")), 3))
            ).alias("token"),
        )
        .distinct()
        .persist()
    )
    st.count()
    vocab = st.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("v"))
    sk = st.groupBy("source").agg(
        F.expr("hll_sketch_agg(token, 12)").alias("sk"),
        F.count(F.lit(1)).cast("long").alias("v_exact"),
    )
    a = st.select(F.col("source").alias("src_a"), "token")
    b = st.select(F.col("source").alias("src_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    ska = sk.select(
        F.col("source").alias("src_a"),
        F.col("sk").alias("sk_a"),
        F.expr("hll_sketch_estimate(sk)").cast("long").alias("est_a"),
    )
    skb = sk.select(
        F.col("source").alias("src_b"),
        F.col("sk").alias("sk_b"),
        F.expr("hll_sketch_estimate(sk)").cast("long").alias("est_b"),
    )
    est = (
        ska.crossJoin(F.broadcast(skb))
        .filter(F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            "est_a",
            "est_b",
            F.expr(
                "CAST(hll_sketch_estimate(hll_union(sk_a, sk_b)) AS BIGINT)"
            ).alias("union_est"),
        )
    )
    va = vocab.select(F.col("source").alias("src_a"), F.col("v").alias("vocab_a"))
    vb = vocab.select(F.col("source").alias("src_b"), F.col("v").alias("vocab_b"))
    pairs = (
        inter.join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
        .withColumn(
            "n_union", F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
        )
    )
    return pairs.join(F.broadcast(est), ["src_a", "src_b"]).select(
        "src_a",
        "src_b",
        "n_common",
        "vocab_a",
        "vocab_b",
        "n_union",
        (F.col("n_common").cast("double") / F.col("n_union")).alias("jaccard"),
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("union_est"))
                - F.col("n_common")
            )
            <= F.lit(_HLLOV_TOL) * F.col("n_union")
        )
        .cast("int")
        .alias("inter_within_tol"),
    )


# --------------------------------------------------------------------------
# Heavy-hitter drift: how the top-token leaderboard changed between two
# corpus halves — the trending/regression detector over frequency ranks.
# --------------------------------------------------------------------------
_HHD_TOPK = 15


@query(
    "heavy_hitter_drift",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id % 2 AS half, unnest({_SQL_TOKS}) AS token
        FROM documents
    ), cnt AS (
        SELECT half, token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY half, token
    ), ranked AS (
        SELECT half, token, c,
               CAST(row_number() OVER (PARTITION BY half
                                       ORDER BY c DESC, token) AS BIGINT)
                   AS rk
        FROM cnt
    ), a AS (SELECT token, c AS c_a, rk AS rk_a FROM ranked
             WHERE half = 0 AND rk <= {_HHD_TOPK}),
    b AS (SELECT token, c AS c_b, rk AS rk_b FROM ranked
          WHERE half = 1 AND rk <= {_HHD_TOPK})
    SELECT coalesce(a.token, b.token) AS token,
           a.rk_a, b.rk_b, a.c_a, b.c_b,
           CASE WHEN a.token IS NULL THEN 'entered'
                WHEN b.token IS NULL THEN 'dropped'
                WHEN a.rk_a = b.rk_b THEN 'held'
                WHEN b.rk_b < a.rk_a THEN 'rose'
                ELSE 'fell' END AS movement,
           coalesce(a.rk_a, {_HHD_TOPK + 1})
             - coalesce(b.rk_b, {_HHD_TOPK + 1}) AS rank_gain
    FROM a FULL OUTER JOIN b ON a.token = b.token
    """,
)
def heavy_hitter_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter leaderboard drift between two corpus halves (doc_id
    parity standing in for yesterday/today): the top-{_HHD_TOPK} tokens
    of each half FULL-OUTER joined into entered / dropped / rose / fell /
    held movements with signed rank gains — the trending-detection shape
    a feed or search-ops dashboard runs on every refresh, and the
    rank-level companion of text_token_drift_chi2 (which tests the
    distribution but cannot say WHICH way a specific term moved).

    Determinism: counts are exact integers; both leaderboards carry a
    total order (count desc, token); absent ranks pin to K+1 so the
    signed gain is integer-exact; the movement CASE is pure integer
    logic.

    Plan: one (half, token)-keyed partial-agg pass, two WindowGroupLimit
    top-k frontiers off the same relation, a <=2K-row full outer join —
    leaderboard-scale, never vocabulary-scale."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(tokens(F.col("text"))).alias("token"),
        )
        .groupBy("half", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("half").orderBy(F.desc("c"), F.asc("token"))
    ranked = cnt.select(
        "half", "token", "c", F.row_number().over(w).cast("long").alias("rk")
    ).filter(F.col("rk") <= _HHD_TOPK)
    a = ranked.filter(F.col("half") == 0).select(
        F.col("token").alias("t_a"),
        F.col("c").alias("c_a"),
        F.col("rk").alias("rk_a"),
    )
    b = ranked.filter(F.col("half") == 1).select(
        F.col("token").alias("t_b"),
        F.col("c").alias("c_b"),
        F.col("rk").alias("rk_b"),
    )
    j = a.join(b, a.t_a == b.t_b, "full_outer")
    return j.select(
        F.coalesce(F.col("t_a"), F.col("t_b")).alias("token"),
        "rk_a",
        "rk_b",
        "c_a",
        "c_b",
        F.expr(
            "CASE WHEN t_a IS NULL THEN 'entered'"
            " WHEN t_b IS NULL THEN 'dropped'"
            " WHEN rk_a = rk_b THEN 'held'"
            " WHEN rk_b < rk_a THEN 'rose'"
            " ELSE 'fell' END"
        ).alias("movement"),
        (
            F.coalesce(F.col("rk_a"), F.lit(_HHD_TOPK + 1))
            - F.coalesce(F.col("rk_b"), F.lit(_HHD_TOPK + 1))
        )
        .cast("long")
        .alias("rank_gain"),
    )


# --------------------------------------------------------------------------
# Holm step-down (FWER) beside BH step-up (FDR): the other multiple-testing
# guarantee, composed over the SAME per-token p-values.
# --------------------------------------------------------------------------
def _holm_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH bh AS MATERIALIZED ({ORACLES['bh_fdr_token_drift']}),
    t AS (
        SELECT token, chi2, p_value, k_rank, rejected AS bh_rejected,
               count(*) OVER () AS m,
               CAST(p_value <= {FDR_ALPHA!r}
                    / (count(*) OVER () - k_rank + 1) AS INT) AS ok
        FROM bh
    )
    SELECT token, chi2, p_value, k_rank, bh_rejected,
           CAST(min(ok) OVER (ORDER BY k_rank ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) AS INT)
               AS holm_rejected
    FROM t
    """


@query("holm_fwer_token_drift", oracle=_holm_oracle())
def holm_fwer_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down over the SAME per-token drift p-values as
    bh_fdr_token_drift: reject while p_(i) <= alpha/(m−i+1) and STOP at
    the first failure (the cumulative-min window). Holm controls the
    family-wise error rate — "probability of even ONE false alarm" — the
    stricter guarantee a sign-off gate needs, where BH's false-discovery
    RATE is the right dial for a triage dashboard; reporting both flags
    side by side makes the trade visible, and Holm's rejections are
    provably a SUBSET of BH's (property-tested).

    Exactness: composes the registered BH relation (its 2^-20-snapped
    p-values and deterministic k_rank), thresholds are alpha over exact
    integer divisors, and the step-down is an integer cumulative min —
    nothing new can diverge.

    Plan: the BH pipeline (V-row relation) plus one V-row window."""
    from ..registry import QUERIES

    bh = QUERIES["bh_fdr_token_drift"](spark, sf_dir).select(
        "token",
        "chi2",
        "p_value",
        "k_rank",
        F.col("rejected").alias("bh_rejected"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = bh.select(
        "token",
        "chi2",
        "p_value",
        "k_rank",
        "bh_rejected",
        (
            F.col("p_value")
            <= F.lit(FDR_ALPHA)
            / (F.count(F.lit(1)).over(wall) - F.col("k_rank") + 1)
        )
        .cast("int")
        .alias("ok"),
    )
    wcum = Window.orderBy("k_rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return t.select(
        "token",
        "chi2",
        "p_value",
        "k_rank",
        "bh_rejected",
        F.min("ok").over(wcum).cast("int").alias("holm_rejected"),
    )


# ---------------------------------------------------------------------------
# Krippendorff's alpha (nominal, two raters) — the agreement coefficient
# that generalizes when kappa's two-rater/no-missing frame doesn't.
# ---------------------------------------------------------------------------
def _krippendorff_oracle() -> str:
    return f"""
    WITH {_agreement_cells_sql()},
    t AS (
        SELECT CAST(sum(nij) AS BIGINT) AS n_units,
               CAST(sum(CASE WHEN lang_label = lang_pred THEN nij
                        ELSE 0 END) AS BIGINT) AS agree
        FROM cells
    ), m AS (
        SELECT l, CAST(sum(c) AS BIGINT) AS m_l FROM (
            SELECT lang_label AS l, CAST(sum(nij) AS BIGINT) AS c
            FROM cells GROUP BY lang_label
            UNION ALL
            SELECT lang_pred AS l, CAST(sum(nij) AS BIGINT) AS c
            FROM cells GROUP BY lang_pred
        ) GROUP BY l
    ), s AS (
        SELECT CAST(sum(m_l * m_l) AS BIGINT) AS sum_m2 FROM m
    )
    SELECT t.n_units, t.agree,
           CAST(1 AS DOUBLE)
               - CAST((2 * t.n_units - 1)
                      * (2 * (t.n_units - t.agree)) AS BIGINT)
                 / CAST(4 * t.n_units * t.n_units - s.sum_m2 AS BIGINT)
               AS alpha
    FROM t CROSS JOIN s
    """


@query("krippendorff_alpha_nominal", oracle=_krippendorff_oracle())
def krippendorff_alpha_nominal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal metric) for the language-ID
    classifier vs the corpus labels, treated as two raters over N
    units: α = 1 − D_o/D_e with the coincidence-matrix disagreement
    D_o and the marginal-expected D_e. Alongside Cohen's kappa this is
    THE standard annotation-quality number (it generalizes to missing
    data and >2 raters, and its chance model uses the POOLED marginals
    where kappa uses per-rater ones — on skewed label mixes the two
    genuinely differ, which is why labeling projects report both).

    Exactness: with n = 2N pairable values, α rearranges to
    1 − (n−1)·Σ_{{c≠k}}o_ck / (n² − Σ_c m_c²) where o is the symmetric
    coincidence matrix (Σ_{{c≠k}}o_ck = 2(N − agree)) and m_c the pooled
    label marginals — ALL integers, one division, one subtraction.

    Plan: the registered confusion pass, two marginal rollups unioned
    on the label key (label-cardinality-bounded), a 1-row meet."""
    from ..registry import QUERIES

    cells = QUERIES["text_lang_confusion"](spark, sf_dir).select(
        "lang_label", "lang_pred", F.col("n_docs").cast("long").alias("nij")
    )
    t = cells.agg(
        F.sum("nij").cast("long").alias("n_units"),
        F.sum(
            F.when(F.col("lang_label") == F.col("lang_pred"), F.col("nij"))
            .otherwise(0)
        )
        .cast("long")
        .alias("agree"),
    )
    a = cells.groupBy(F.col("lang_label").alias("l")).agg(
        F.sum("nij").cast("long").alias("c")
    )
    b = cells.groupBy(F.col("lang_pred").alias("l")).agg(
        F.sum("nij").cast("long").alias("c")
    )
    m = a.unionByName(b).groupBy("l").agg(
        F.sum("c").cast("long").alias("m_l")
    )
    s = m.agg(F.sum(F.col("m_l") * F.col("m_l")).cast("long").alias("sum_m2"))
    do_num = (
        (2 * F.col("n_units") - 1) * (2 * (F.col("n_units") - F.col("agree")))
    ).cast("long")
    de_num = (4 * F.col("n_units") * F.col("n_units") - F.col("sum_m2")).cast(
        "long"
    )
    return t.crossJoin(F.broadcast(s)).select(
        "n_units",
        "agree",
        (
            F.lit(1.0) - do_num.cast("double") / de_num.cast("double")
        ).alias("alpha"),
    )


# --------------------------------------------------------------------------
# Scrub loss accounting: how much training signal the PII scrubber costs.
# --------------------------------------------------------------------------
@query(
    "pii_scrub_loss_stats",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 3 = 0
                    THEN text || ' contact user' || doc_id ||
                         '@example.com or 555-123-4567'
                    ELSE text END AS t
        FROM documents
    ), scrubbed AS (
        SELECT source,
               CAST(length(t) AS BIGINT) AS chars_before,
               CAST(length(regexp_replace(regexp_replace(t, '{_PII_EMAIL}',
                        '<EMAIL>', 'g'), '{_PII_PHONE}', '<PHONE>', 'g'))
                    AS BIGINT) AS chars_after
        FROM seeded
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(chars_before) AS BIGINT) AS chars_before,
           CAST(sum(chars_before - chars_after) AS BIGINT) AS chars_redacted,
           CAST(sum(CASE WHEN chars_after <> chars_before THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_touched,
           CAST(sum(chars_before - chars_after) AS DOUBLE)
               / CAST(sum(chars_before) AS DOUBLE) AS redacted_char_share
    FROM scrubbed GROUP BY source
    """,
)
def pii_scrub_loss_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-masking accounting for the PII scrubber: per source, how many
    characters the email/phone redaction removes and what share of each
    source's training signal that is — the budget line a data curator
    reads before deciding whether a source is worth its scrub cost
    (same deterministic seeding + patterns as text_pii_scrub, so the two
    audits can never disagree about what the scrubber does). Note the
    loss can be NEGATIVE per doc (the '<EMAIL>' placeholder can exceed a
    short address) — the per-source net is what matters.

    Exactness: character counts are exact integers; one IEEE division
    per source row. Plan: map-only regex work in whole-stage codegen,
    then one source-keyed rollup — scan-bound at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567"),
        ),
    ).otherwise(F.col("text"))
    scrubbed_len = F.length(
        F.regexp_replace(
            F.regexp_replace("t", _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        )
    )
    per = docs.select("source", t.alias("t")).select(
        "source",
        F.length("t").cast("long").alias("chars_before"),
        scrubbed_len.cast("long").alias("chars_after"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("chars_before").cast("long").alias("chars_before"),
        F.sum(F.col("chars_before") - F.col("chars_after"))
        .cast("long")
        .alias("chars_redacted"),
        F.sum((F.col("chars_after") != F.col("chars_before")).cast("int"))
        .cast("long")
        .alias("docs_touched"),
        (
            F.sum(F.col("chars_before") - F.col("chars_after")).cast("double")
            / F.sum("chars_before").cast("double")
        ).alias("redacted_char_share"),
    )
