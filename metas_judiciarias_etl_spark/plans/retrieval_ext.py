"""Full-text retrieval scoring over the documents corpus — the ranked
keyword-search surface (BM25) a training-data pipeline uses to mine topical
subsets and to audit what its index would surface for a query.

Engine-surface extension (no direct reference counterpart; SURVEY §7
phases 4-5 scope). The driver contract holds: identical column aliases on
both engines and numeric paths that hash bit-identically — the BM25 idf is
kept as the raw Robertson ratio (N−df+0.5)/(df+0.5) rather than its log
(ln() is libm-dependent; the ratio is one exact-rounded IEEE division, the
same move text_tfidf_topk documents), and the 3-term score is a sum of
three named columns added in one written order, never an order-sensitive
fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import SQL_TOKENS, tokens
from ..registry import query
from ..sources.parquet import load_table

_SQL_TOKS = SQL_TOKENS.format(expr="text")

BM25_K1 = "1.2"  # Robertson k1, as a literal so both engines parse one double
BM25_K1P1 = "2.2"  # k1 + 1, pre-folded: no engine evaluates the addition
BM25_B = "0.75"
BM25_1MB = "0.25"  # 1 - b, pre-folded
BM25_NTERMS = 3
BM25_TOPK = 10


def _bm25_oracle() -> str:
    contrib = """
        ((CAST(s.n_docs - q.df AS DOUBLE) + 0.5)
         / (CAST(q.df AS DOUBLE) + 0.5))
        * (CAST(tf.tf AS DOUBLE) * {k1p1})
        / (CAST(tf.tf AS DOUBLE)
           + {k1} * ({onemb} + {b} * (CAST(dl.dl AS DOUBLE) / s.avgdl)))
    """.format(k1=BM25_K1, k1p1=BM25_K1P1, b=BM25_B, onemb=BM25_1MB)
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ), tf AS (
        SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
    ), dfreq AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ), dl AS (
        SELECT doc_id, len({_SQL_TOKS}) AS dl FROM documents
    ), s AS (
        SELECT count(*) AS n_docs,
               CAST(sum(len({_SQL_TOKS})) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avgdl
        FROM documents
    ), qterms AS (
        SELECT token, df, rn FROM (
            SELECT token, df,
                   row_number() OVER (ORDER BY df DESC, token) AS rn
            FROM dfreq
        ) WHERE rn <= {BM25_NTERMS}
    ), per_term AS (
        SELECT tf.doc_id, dl.dl, q.rn, {contrib} AS contrib
        FROM tf
        JOIN qterms q USING (token)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN s
    ), pivoted AS (
        SELECT doc_id, dl,
               coalesce(max(CASE WHEN rn = 1 THEN contrib END), 0.0)
                   AS contrib_1,
               coalesce(max(CASE WHEN rn = 2 THEN contrib END), 0.0)
                   AS contrib_2,
               coalesce(max(CASE WHEN rn = 3 THEN contrib END), 0.0)
                   AS contrib_3
        FROM per_term GROUP BY doc_id, dl
    ), ranked AS (
        SELECT doc_id, CAST(dl AS BIGINT) AS dl,
               contrib_1, contrib_2, contrib_3,
               (contrib_1 + contrib_2) + contrib_3 AS score,
               row_number() OVER (
                   ORDER BY (contrib_1 + contrib_2) + contrib_3 DESC, doc_id
               ) AS rn
        FROM pivoted
    )
    SELECT doc_id, dl, contrib_1, contrib_2, contrib_3, score,
           CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= {BM25_TOPK}
    """


@query("bm25_topk", oracle=_bm25_oracle())
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a data-derived 3-term query: the query
    terms are the corpus's 3 highest-df tokens (ties broken
    lexicographically — robust at every SF; a df-band filter would go
    empty on fixtures whose vocabulary saturates),
    and every matching document is scored with Robertson's saturation
    formula idf·tf(k1+1)/(tf + k1(1−b + b·dl/avgdl)), k1=1.2, b=0.75.
    Documents matching no query term score 0 and are not ranked.

    Exactness: idf stays the raw ratio (N−df+0.5)/(df+0.5) — monotone in
    the classic log-idf per term, so per-term ranking is preserved, and
    the whole score is a fixed chain of exact-rounded IEEE ops (both
    engines parse the same decimal literals to the same binary64). The
    3 per-term contributions are pivoted to named columns and added in
    one written order — no order-sensitive double fold anywhere.

    Plan: explode → tf agg keyed (doc_id, token) and df agg keyed token
    (both high-cardinality, even spread) → the 3-row query-term table and
    1-row corpus stats broadcast into the tf stream → one doc-grain pivot
    agg → global top-k via TakeOrderedAndProject. At 100 TB the only big
    shuffles are the two token aggs; scoring touches just the postings of
    the 3 query terms."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    dl = docs.select("doc_id", F.size(tokens(F.col("text"))).alias("dl"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(tokens(F.col("text")))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    qterms = (
        dfreq.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("df"), F.asc("token"))),
        )
        .filter(F.col("rn") <= BM25_NTERMS)
        .select("token", "df", "rn")
    )
    idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    contrib = (
        idf
        * (F.col("tf").cast("double") * F.lit(float(BM25_K1P1)))
        / (
            F.col("tf").cast("double")
            + F.lit(float(BM25_K1))
            * (
                F.lit(float(BM25_1MB))
                + F.lit(float(BM25_B))
                * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
    )
    per_term = (
        tf.join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "dl", "rn", contrib.alias("contrib"))
    )
    pivoted = per_term.groupBy("doc_id", "dl").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("rn") == i, F.col("contrib"))), F.lit(0.0)
            ).alias(f"contrib_{i}")
            for i in (1, 2, 3)
        ]
    )
    score = (F.col("contrib_1") + F.col("contrib_2")) + F.col("contrib_3")
    top = (
        pivoted.select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            "contrib_1",
            "contrib_2",
            "contrib_3",
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOPK)
    )
    return top.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
    )


# --------------------------------------------------------------------------
# Pseudo-relevance feedback: the RM3-style expansion terms mined from the
# BM25 top documents — stage two of classic query expansion.
# --------------------------------------------------------------------------
_PRF_FB_DOCS = 3  # feedback set: top-k documents of the first-pass ranking
_PRF_TERMS = 5  # expansion terms reported


def _prf_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH firstpass AS MATERIALIZED ({ORACLES['bm25_topk']}),
    fb AS (
        SELECT doc_id FROM firstpass WHERE rn <= {_PRF_FB_DOCS}
    ), tok AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ), dfreq AS (
        SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY token
    ), qterms AS (
        SELECT token FROM (
            SELECT token, row_number() OVER (ORDER BY df DESC, token) AS rn
            FROM dfreq
        ) WHERE rn <= {BM25_NTERMS}
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    ), fbtf AS (
        SELECT t.token, CAST(count(*) AS BIGINT) AS fb_tf
        FROM tok t JOIN fb ON fb.doc_id = t.doc_id
        WHERE t.token NOT IN (SELECT token FROM qterms)
        GROUP BY t.token
    )
    SELECT CAST(row_number() OVER (ORDER BY f.fb_tf DESC, f.token)
                AS INTEGER) AS rank,
           f.token, f.fb_tf, d.df,
           ((CAST(n.n_docs - d.df AS DOUBLE) + 0.5)
            / (CAST(d.df AS DOUBLE) + 0.5)) AS idf
    FROM fbtf f JOIN dfreq d ON d.token = f.token CROSS JOIN n
    ORDER BY f.fb_tf DESC, f.token
    LIMIT {_PRF_TERMS}
    """


@query("bm25_prf_terms", oracle=_prf_oracle())
def bm25_prf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (RM3-style) expansion terms: take the
    registered BM25 ranking's top-{_PRF_FB_DOCS} documents as the
    feedback set, tally every term they contain EXCLUDING the original
    query terms, and report the top-{_PRF_TERMS} by feedback term
    frequency with their corpus df and Robertson ratio idf — the table a
    search engine folds back into the query for its second pass. The
    feedback set comes from the COMPOSED bm25_topk on both engine and
    oracle sides, so the expansion can never drift from the ranking it
    feeds on.

    Exactness: feedback tallies and df are exact integers; the ranking
    carries a total order (fb_tf desc, token); idf is one pinned IEEE
    division of exact operands.

    Plan: the first pass is the registered BM25 (its plan notes apply);
    the feedback set is {_PRF_FB_DOCS} doc_ids broadcast into the token
    stream; the expansion tally is one token-keyed partial agg over
    FEEDBACK postings only; top terms via TakeOrderedAndProject."""
    from ..registry import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    fb = (
        QUERIES["bm25_topk"](spark, sf_dir)
        .filter(F.col("rn") <= _PRF_FB_DOCS)
        .select("doc_id")
    )
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    dfreq = tok.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    qterms = (
        dfreq.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("df"), F.asc("token"))),
        )
        .filter(F.col("rn") <= BM25_NTERMS)
        .select("token")
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    fbtf = (
        tok.join(F.broadcast(fb), "doc_id")
        .join(F.broadcast(qterms), "token", "left_anti")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("fb_tf"))
    )
    ranked = (
        fbtf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .orderBy(F.desc("fb_tf"), F.asc("token"))
        .limit(_PRF_TERMS)
    )
    w = Window.orderBy(F.desc("fb_tf"), F.asc("token"))
    return ranked.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "token",
        "fb_tf",
        "df",
        (
            ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        ).alias("idf"),
    )
