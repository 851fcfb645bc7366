"""Benchmark decontamination for training-data pipelines, over ``documents``.

The standard pre-training hygiene step (public recipe popularized by the
GPT-3/PaLM/Llama reports): any training document sharing an n-gram of
length K with an evaluation/benchmark document is flagged (and usually
dropped or the overlapping span is excised). Expressed Spark-first:

    shingle both sides (k-token n-grams, reusing the dedup shingle
    machinery) → distinct → equi-join on the n-gram → group by train doc.

Physical shape at 100 TB: the benchmark side is SMALL by nature (eval sets
are MBs against a 100 TB corpus), so its distinct-shingle table broadcasts
and the whole check is a map-side hash probe over the training scan — no
shuffle of the big side at all. Here the "benchmark" is a deterministic
hash-carved ~5% split of the corpus itself (the same content-hash split a
real pipeline uses for eval carving), which still exercises the exact
plan; with a genuinely large eval side, drop the broadcast hint and it
becomes a plain shuffle equi-join on the n-gram hash.

Zero UDFs; the n-gram window and the 48-bit content hash come from
functions/hashing.py with SQL twins, so the DuckDB oracle is built from
the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    SQL_TOKENS,
    hash48,
    sql_hash48,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from ..registry import query
from ..sources.parquet import load_table

NGRAM_K = 5  # overlap n-gram length (public recipes use 8-13; the synthetic
#              fixture texts are short, so 5 keeps the test corpus non-trivial)
EVAL_MOD = 20  # hash48(doc_id) % 20 == 0 → ~5% eval split

_SQL_TOKS = SQL_TOKENS.format(expr="text")
_SQL_EVAL = f"{sql_hash48('CAST(doc_id AS VARCHAR)')} % {EVAL_MOD} = 0"


@query(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               {_SQL_EVAL} AS is_eval,
               unnest(list_distinct({sql_word_shingles(_SQL_TOKS, NGRAM_K)})) AS ng
        FROM documents
    )
    SELECT tr.doc_id AS train_doc_id,
           count(DISTINCT tr.ng) AS n_shared_ngrams,
           count(DISTINCT ev.doc_id) AS n_eval_docs
    FROM (SELECT doc_id, ng FROM sh WHERE NOT is_eval) tr
    JOIN (SELECT DISTINCT doc_id, ng FROM sh WHERE is_eval) ev USING (ng)
    GROUP BY tr.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing any K-token n-gram with the eval split:
    (train_doc_id, distinct shared n-grams, distinct eval docs hit).

    The eval shingle table is broadcast (benchmark corpora are tiny
    relative to a training corpus); the training side streams through the
    probe without shuffling. The groupBy keys on train doc_id — high
    cardinality, even spread."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        (hash48(F.col("doc_id").cast("string")) % EVAL_MOD == 0).alias("is_eval"),
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), NGRAM_K))
        ).alias("ng"),
    )
    ev = (
        sh.filter("is_eval")
        .select(F.col("doc_id").alias("eval_doc_id"), "ng")
        .distinct()
    )
    tr = sh.filter(~F.col("is_eval")).select("doc_id", "ng")
    return (
        tr.join(F.broadcast(ev), "ng")
        .groupBy(F.col("doc_id").alias("train_doc_id"))
        .agg(
            F.countDistinct("ng").alias("n_shared_ngrams"),
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
        )
    )


@query(
    "decontam_containment",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               {_SQL_EVAL} AS is_eval,
               unnest(list_distinct({sql_word_shingles(_SQL_TOKS, NGRAM_K)})) AS ng
        FROM documents
    ), tr AS (
        SELECT doc_id, ng FROM sh WHERE NOT is_eval
    ), tr_size AS (
        SELECT doc_id, count(*) AS n_ngrams FROM tr GROUP BY doc_id
    ), ev AS (
        SELECT DISTINCT ng FROM sh WHERE is_eval
    ), shared AS (
        SELECT tr.doc_id, count(*) AS n_shared
        FROM tr JOIN ev USING (ng)
        GROUP BY tr.doc_id
    )
    SELECT s.doc_id AS train_doc_id,
           CAST(t.n_ngrams AS BIGINT) AS n_ngrams,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(s.n_shared AS DOUBLE) / t.n_ngrams AS containment
    FROM shared s JOIN tr_size t USING (doc_id)
    """,
)
def decontam_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-scored decontamination: |train ∩ eval| / |train| over
    distinct K-gram sets. Containment is the ASYMMETRIC overlap measure —
    a short eval prompt fully embedded in a long training doc scores 1.0
    where Jaccard would vanish, which is exactly the leakage case n-gram
    counting (decontam_ngram_overlap) under-ranks. Downstream policy
    thresholds on the score (e.g. drop > 0.8, audit > 0.2).

    Same 100 TB shape as the overlap check: the eval distinct-shingle set
    broadcasts, the training side streams through the probe, and both
    aggregations key on train doc_id. The ratio is one IEEE division of
    exact integer counts — bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        (hash48(F.col("doc_id").cast("string")) % EVAL_MOD == 0).alias("is_eval"),
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), NGRAM_K))
        ).alias("ng"),
    )
    tr = sh.filter(~F.col("is_eval")).select("doc_id", "ng")
    tr_size = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    ev = sh.filter("is_eval").select("ng").distinct()
    shared = (
        tr.join(F.broadcast(ev), "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(tr_size, "doc_id")
        .select(
            F.col("doc_id").alias("train_doc_id"),
            F.col("n_ngrams").cast("long").alias("n_ngrams"),
            F.col("n_shared").cast("long").alias("n_shared"),
            (F.col("n_shared").cast("double") / F.col("n_ngrams")).alias(
                "containment"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Decontamination aggressiveness curve: flag rate as a function of K.
# ---------------------------------------------------------------------------
DECONTAM_K_CURVE = (3, 5, 8)


def _decontam_curve_oracle() -> str:
    per_k = "\n    UNION ALL\n".join(
        f"""    SELECT {k} AS ngram_k,
           (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
            FROM documents WHERE NOT ({_SQL_EVAL})) AS n_train_docs,
           CAST(count(DISTINCT tr.doc_id) AS BIGINT) AS n_flagged,
           CAST(CAST(count(DISTINCT tr.doc_id) AS BIGINT) AS DOUBLE)
               / (SELECT count(DISTINCT doc_id)
                  FROM documents WHERE NOT ({_SQL_EVAL})) AS flag_rate
    FROM (
        SELECT doc_id,
               unnest(list_distinct({sql_word_shingles(_SQL_TOKS, k)})) AS ng
        FROM documents WHERE NOT ({_SQL_EVAL})
    ) tr
    JOIN (
        SELECT DISTINCT
               unnest(list_distinct({sql_word_shingles(_SQL_TOKS, k)})) AS ng
        FROM documents WHERE {_SQL_EVAL}
    ) ev USING (ng)"""
        for k in DECONTAM_K_CURVE
    )
    return per_k


@query("decontam_ngram_size_curve", oracle=_decontam_curve_oracle())
def decontam_ngram_size_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination dial: training-corpus flag rate at n-gram
    lengths 3/5/8 against the same eval split — the aggressiveness
    curve behind every published "we removed documents sharing a
    13-gram" footnote. Short n-grams over-flag (common phrases), long
    ones under-flag (miss paraphrase-adjacent leakage); flag rate is
    monotonically non-increasing in K (every (K+1)-gram contains a
    K-gram, so a K+1 match implies a K match — the property test pins
    this), and the knee of this curve is where a real pipeline sets K.

    Plan: per K, one shingle explode per side, the tiny eval shingle
    set broadcasts, and the flag count is a distinct over the probe
    hits — decontam_ngram_overlap's shape, swept. At 100 TB a single
    pass could produce all three widths from one tokenization (shingle
    arrays per K off the same token array); expressed per-K here so
    each curve point remains the production query verbatim.

    Exactness: integer distinct counts; one division per row."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = hash48(F.col("doc_id").cast("string")) % EVAL_MOD == 0
    toks = tokens(F.col("text"))
    n_train = (
        docs.filter(~is_eval)
        .agg(F.countDistinct("doc_id").cast("long").alias("n_train_docs"))
    )
    out = None
    for k in DECONTAM_K_CURVE:
        sh = docs.select(
            "doc_id",
            is_eval.alias("is_eval"),
            F.explode(F.array_distinct(word_shingles(toks, k))).alias("ng"),
        )
        ev = sh.filter("is_eval").select("ng").distinct()
        tr = sh.filter(~F.col("is_eval")).select("doc_id", "ng")
        row = (
            tr.join(F.broadcast(ev), "ng")
            .agg(F.countDistinct("doc_id").cast("long").alias("n_flagged"))
            .crossJoin(F.broadcast(n_train))
            .select(
                F.lit(k).alias("ngram_k"),
                "n_train_docs",
                "n_flagged",
                (
                    F.col("n_flagged").cast("double")
                    / F.col("n_train_docs")
                ).alias("flag_rate"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Semantic (embedding-space) decontamination — the paraphrase-robust twin
# of the n-gram overlap checks above.
# ---------------------------------------------------------------------------
@query(
    "decontam_embedding_cosine",
    oracle=None,  # assembled below after the similarity helpers import
)
def decontam_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: vectors are hash-split into train
    (hash%100 < 80) and a held-out eval carve (>= 90) by the SAME
    content-stable rule as dataset_split_hash, then every train vector
    whose LSH bucket contains an eval vector with cosine >= threshold is
    flagged contaminated. This is the embedding-space twin of
    decontam_ngram_overlap — it catches paraphrased or re-worded eval
    leakage that exact n-gram matching misses (the Phi/GPT-3 semantic
    decontamination recipe), and reports the one-row summary a pipeline
    gates on: carve sizes, candidate pairs, contaminated-train count and
    share, worst cosine.

    Exactness: split membership, pair counts, and the contaminated
    distinct-count are exact integers; cosines round to 4 dp through the
    shared list-ordered dot product (the similarity-module discipline);
    the share is one integer-ratio division; max() over rounded cosines
    is order-insensitive (no-candidate case pins -1.0 via coalesce).

    Plan: the bucket equi-join is the ONLY candidate generator (never
    all-pairs — same LSH posture as dedup_embedding_cosine); both carve
    projections read one cached base; the summary is four 1-row
    broadcast-crossJoined aggregates. At 100 TB the eval carve is tiny
    by construction, so the bucket join degenerates to an eval-side
    broadcast against the streaming train scan."""
    from .similarity import NEAR_DUP_COS, _bucket_expr, _dot

    emb = load_table(spark, sf_dir, "embeddings")
    h = hash48(F.col("vec_id").cast("string")) % 100
    base = (
        emb.select(
            "vec_id",
            "embedding",
            F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
            _bucket_expr(F.col("embedding")).alias("bucket"),
            h.alias("hb"),
        )
        .filter((F.col("hb") < 80) | (F.col("hb") >= 90))
        .persist()
    )
    base.count()
    tr = base.filter(F.col("hb") < 80).select(
        F.col("vec_id").alias("t_id"),
        F.col("embedding").alias("t_emb"),
        F.col("nrm").alias("t_nrm"),
        "bucket",
    )
    ev = base.filter(F.col("hb") >= 90).select(
        F.col("vec_id").alias("e_id"),
        F.col("embedding").alias("e_emb"),
        F.col("nrm").alias("e_nrm"),
        "bucket",
    )
    cos = F.round(
        _dot(F.col("t_emb"), F.col("e_emb"))
        / (F.col("t_nrm") * F.col("e_nrm")),
        4,
    )
    pairs = tr.join(ev, "bucket").select("t_id", cos.alias("cosine"))
    pairs = pairs.persist()
    pairs.count()
    n_tr = tr.agg(F.count(F.lit(1)).cast("long").alias("n_train"))
    n_ev = ev.agg(F.count(F.lit(1)).cast("long").alias("n_eval"))
    pair_stats = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
        F.coalesce(F.max("cosine"), F.lit(-1.0)).alias("max_cosine"),
    )
    contam = (
        pairs.filter(F.col("cosine") >= NEAR_DUP_COS)
        .agg(F.countDistinct("t_id").cast("long").alias("n_contaminated"))
    )
    return (
        n_tr.crossJoin(F.broadcast(n_ev))
        .crossJoin(F.broadcast(pair_stats))
        .crossJoin(F.broadcast(contam))
        .select(
            "n_train",
            "n_eval",
            "n_candidate_pairs",
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double") / F.col("n_train")
            ).alias("contaminated_share"),
            "max_cosine",
        )
    )


def _decontam_emb_oracle() -> str:
    from .similarity import NEAR_DUP_COS, _sql_bucket, _sql_dot, _sql_norm

    h = sql_hash48("CAST(vec_id AS VARCHAR)")
    return f"""
    WITH base AS (
        SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm,
               {_sql_bucket('embedding')} AS bucket,
               {h} % 100 AS hb
        FROM embeddings
    ), tr AS (
        SELECT vec_id AS t_id, embedding, nrm, bucket FROM base
        WHERE hb < 80
    ), ev AS (
        SELECT vec_id AS e_id, embedding, nrm, bucket FROM base
        WHERE hb >= 90
    ), pairs AS (
        SELECT t.t_id,
               round({_sql_dot('t.embedding', 'e.embedding')}
                     / (t.nrm * e.nrm), 4) AS cosine
        FROM tr t JOIN ev e ON t.bucket = e.bucket
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_train,
           (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_eval,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs)
               AS n_candidate_pairs,
           (SELECT CAST(count(DISTINCT t_id) AS BIGINT) FROM pairs
            WHERE cosine >= {NEAR_DUP_COS}) AS n_contaminated,
           CAST((SELECT count(DISTINCT t_id) FROM pairs
                 WHERE cosine >= {NEAR_DUP_COS}) AS DOUBLE)
               / (SELECT count(*) FROM tr) AS contaminated_share,
           (SELECT coalesce(max(cosine), -1.0) FROM pairs) AS max_cosine
    """


from ..registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["decontam_embedding_cosine"] = _decontam_emb_oracle()
