"""End-to-end training-data prep pipeline: the composition proof.

A real corpus-preparation run chains the individual operators this engine
ships — quality scoring, threshold filtering, exact dedup, token budgeting —
into one job. This module expresses that chain as a single Catalyst plan and
verifies it against a DuckDB oracle built from the registered
``text_quality`` oracle (single source of truth — the CTE is reused, not
re-derived).

Plan shape / 100 TB notes:
* quality features + content hash: map-only, fused into the scan stage.
* dedup keeper selection: one shuffle on md5(text) (uniform key); expressed
  as ``min(doc_id) over (partition by content_hash)`` — partial-aggregatable
  window, no sort frame.
* final per-source report: one hash-agg shuffle on a low-cardinality key —
  its input is already reduced to survivors.
Three shuffles total, each keyed as evenly as the data allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import registry
from ..registry import query
from ..sources.parquet import load_table
from . import decontam as _decontam  # noqa: F401  (registers the oracle CTEs v3 composes)
from .textstats import text_quality

QUALITY_MIN = 0.7
TOKENS_MIN = 10

# Training-mix sampling rates per source (parts per 10000). Deterministic:
# a doc is kept iff md5-hash48(doc_id) mod 10000 < rate — reproducible
# across engines, runs, and partitionings (no RNG state).
MIX_RATES = {"src0": 10000, "src1": 7500, "src2": 5000, "src3": 2500}
MIX_DEFAULT = 1000


def _oracle() -> str:
    quality_cte = registry.ORACLES["text_quality"]
    return f"""
    WITH q AS ({quality_cte}),
    d AS (
        SELECT doc_id, source, md5(text) AS content_hash FROM documents
    ),
    kept AS (
        SELECT q.doc_id, d.source, d.content_hash, q.quality, q.n_tokens
        FROM q JOIN d USING (doc_id)
        WHERE q.quality >= {QUALITY_MIN} AND q.n_tokens >= {TOKENS_MIN}
    ),
    uniq AS (
        SELECT * FROM (
            SELECT kept.*,
                   min(doc_id) OVER (PARTITION BY content_hash) AS keeper
            FROM kept
        ) WHERE doc_id = keeper
    )
    SELECT source,
           count(*) AS n_docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(quality), 6) AS avg_quality
    FROM uniq GROUP BY source
    """


@query("prep_pipeline", oracle=_oracle())
def prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus prep as ONE plan: quality-score → filter → exact-dedup keeper
    → per-source token budget. Composes the engine's own operators (the
    ``text_quality`` kernel is called, not copied)."""
    q = text_quality(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("content_hash")
    )
    kept = q.join(docs, "doc_id").filter(
        (F.col("quality") >= QUALITY_MIN) & (F.col("n_tokens") >= TOKENS_MIN)
    )
    keeper = F.min("doc_id").over(Window.partitionBy("content_hash"))
    uniq = kept.withColumn("keeper", keeper).filter(F.col("doc_id") == F.col("keeper"))
    return uniq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


PACK_BUDGET = 2048  # est. tokens per training pack


@query(
    "pack_sequences",
    oracle=f"""
    WITH est AS (
        SELECT doc_id, source,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
        FROM documents
    ), cum AS (
        SELECT doc_id, source, est_tokens,
               sum(est_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM est
    )
    -- CAST AS BIGINT on pack_id: cum_tokens is a HUGEINT windowed sum in
    -- DuckDB, so the division stays HUGEINT → pandas float64, while Spark
    -- emits bigint; the driver hash diverges on type, not value.
    SELECT source,
           CAST((cum_tokens - est_tokens) // {PACK_BUDGET} AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(est_tokens) AS BIGINT) AS pack_tokens
    FROM cum
    GROUP BY source, ((cum_tokens - est_tokens) // {PACK_BUDGET})
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to fixed-token-budget packs (the shard
    layout step before tokenized training data is written).

    Greedy assignment by running token count: a doc starts a new pack when
    the budget is crossed. Deterministic (ordered by doc_id) and scalable:
    the window partitions by source, so state per task is one running sum —
    at 100 TB packing runs per-source/per-shard, never globally ordered."""
    docs = load_table(spark, sf_dir, "documents")
    est = docs.select(
        "doc_id",
        "source",
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("est_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = est.withColumn("cum_tokens", F.sum("est_tokens").over(w))
    pack_id = F.expr(f"(cum_tokens - est_tokens) div {PACK_BUDGET}")
    return (
        cum.withColumn("pack_id", pack_id)
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("est_tokens").cast("long").alias("pack_tokens"),
        )
    )


PACK_CURVE_BUDGETS = (512, 1024, 2048, 4096)


@query(
    "packing_waste_curve",
    oracle=f"""
    WITH est AS (
        SELECT doc_id, source,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
        FROM documents
    ), cum AS (
        SELECT doc_id, source, est_tokens,
               sum(est_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM est
    ), ls AS (
        SELECT unnest([{", ".join(str(b) for b in PACK_CURVE_BUDGETS)}]) AS l
    ), packs AS (
        SELECT ls.l, source,
               CAST((cum_tokens - est_tokens) // ls.l AS BIGINT) AS pack_id,
               CAST(sum(est_tokens) AS BIGINT) AS pt
        FROM cum CROSS JOIN ls
        GROUP BY ls.l, source, ((cum_tokens - est_tokens) // ls.l)
    )
    SELECT l,
           CAST(count(*) AS BIGINT) AS n_packs,
           CAST(sum(pt) AS BIGINT) AS total_tokens,
           CAST(sum((pt + l - 1) // l) AS BIGINT) AS n_sequences,
           CAST(sum(((pt + l - 1) // l) * l - pt) AS BIGINT) AS pad_tokens,
           CAST(CAST(sum(((pt + l - 1) // l) * l - pt) AS BIGINT) AS DOUBLE)
               / CAST(CAST(sum((pt + l - 1) // l) AS BIGINT) * l AS BIGINT)
               AS pad_share
    FROM packs GROUP BY l
    """,
)
def packing_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste curve over context lengths: run pack_sequences'
    greedy doc-boundary packing at L ∈ {PACK_CURVE_BUDGETS}, chop each
    pack into ⌈tokens/L⌉ fixed-length training sequences, and report
    the padding share 1 − tokens/(sequences·L) per L — the number that
    actually picks a context length for a corpus (short contexts waste
    little but truncate documents; long contexts pad heavily when packs
    land just past a boundary). One row per L.

    Exactness: everything up to pad_share is integer arithmetic
    (ceil-division via (pt + l − 1) // l); pad_share is one division of
    exact integers.

    Plan: the per-source running-token window (pack_sequences' shape)
    computes ONCE and is shared by all four L values via a 4-row
    broadcast cross join — the curve costs one window pass plus four
    rollup groups, not four packings."""
    docs = load_table(spark, sf_dir, "documents")
    est = docs.select(
        "doc_id",
        "source",
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("est_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = est.withColumn("cum_tokens", F.sum("est_tokens").over(w))
    ls = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(b) for b in PACK_CURVE_BUDGETS])
        ).alias("l")
    )
    packs = (
        cum.crossJoin(F.broadcast(ls))
        .groupBy(
            "l",
            "source",
            F.expr("(cum_tokens - est_tokens) div l").alias("pack_id"),
        )
        .agg(F.sum("est_tokens").cast("long").alias("pt"))
    )
    seqs = F.expr("(pt + l - 1) div l")
    return packs.groupBy("l").agg(
        F.count(F.lit(1)).cast("long").alias("n_packs"),
        F.sum("pt").cast("long").alias("total_tokens"),
        F.sum(seqs).cast("long").alias("n_sequences"),
        F.sum(seqs * F.col("l") - F.col("pt")).cast("long").alias("pad_tokens"),
        (
            F.sum(seqs * F.col("l") - F.col("pt")).cast("long").cast("double")
            / (F.sum(seqs).cast("long") * F.col("l")).cast("long")
        ).alias("pad_share"),
    )


def _mix_oracle() -> str:
    from ..functions.hashing import sql_hash48

    rate = "CASE " + " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in sorted(MIX_RATES.items())
    ) + f" ELSE {MIX_DEFAULT} END"
    h = sql_hash48("CAST(doc_id AS VARCHAR)")
    return f"""
    SELECT source,
           count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM (SELECT doc_id, source FROM documents
          WHERE {h} % 10000 < {rate})
    GROUP BY source
    """


@query("stratified_mix_sample", oracle=_mix_oracle())
def stratified_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: per-source deterministic sampling rates
    (oversample high-value sources, downsample the crawl). The keep
    decision is a pure hash predicate — map-only, reproducible under
    retries/re-partitioning, and pushable ahead of any expensive stage.
    At 100 TB: this filter runs in the scan stage, so a 25% source costs
    25% of downstream work; no shuffle beyond the final report."""
    from ..functions.hashing import hash48

    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(MIX_DEFAULT)
    for s, r in sorted(MIX_RATES.items(), reverse=True):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    kept = docs.filter(
        hash48(F.col("doc_id").cast("string")) % 10000 < rate
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )


# --------------------------------------------------------------------------
# Token-window chunking: fixed-size overlapping training chunks.
# --------------------------------------------------------------------------
CHUNK_TOKENS = 40
CHUNK_STRIDE = 30


@query(
    "chunk_documents",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ), counted AS (
        SELECT doc_id, n_tok,
               CASE WHEN n_tok <= {CHUNK_TOKENS} THEN 1
                    ELSE (n_tok - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                         // {CHUNK_STRIDE} + 1 END AS n_chunks
        FROM sized
    )
    SELECT doc_id,
           CAST(unnest(generate_series(0, n_chunks - 1)) AS BIGINT)
               AS chunk_idx,
           n_tok,
           n_chunks
    FROM counted
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping {CHUNK_TOKENS}-token windows
    with stride {CHUNK_STRIDE} — the context-window packing precursor.
    Chunk boundaries are pure integer math on the whitespace token count;
    the row expansion (sequence+explode) stays inside the scan partition —
    no shuffle at all, the plan is a single map stage."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    counted = sized.withColumn(
        "n_chunks",
        F.expr(
            f"CASE WHEN n_tok <= {CHUNK_TOKENS} THEN 1"
            f" ELSE (n_tok - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)"
            f" div {CHUNK_STRIDE} + 1 END"
        ),
    )
    return counted.select(
        "doc_id",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_idx"),
        "n_tok",
        "n_chunks",
    )


# --------------------------------------------------------------------------
# Weighted sampling without RNG state: deterministic priority sampling.
# --------------------------------------------------------------------------
SAMPLE_K = 5


def _weighted_sample_oracle() -> str:
    from ..functions.hashing import sql_hash48

    h = sql_hash48("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH pri AS (
        SELECT source, doc_id, n_chars,
               CAST({h} AS DOUBLE) / n_chars AS priority
        FROM documents
    )
    SELECT source, doc_id, n_chars, priority
    FROM pri
    QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY priority ASC, doc_id ASC
    ) <= {SAMPLE_K}
    """


@query("weighted_sample_topk", oracle=_weighted_sample_oracle())
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sample (k=5, probability ∝ n_chars) via
    PRIORITY SAMPLING: priority = hash48(doc_id)/weight, keep the k
    smallest. Stateless and deterministic — no RNG, no driver coordination,
    re-runs and retries pick identical rows; the hash is the md5-prefix
    family shared with the oracle (same constants by construction). One
    shuffle on source + a WindowGroupLimit top-k (no full sort). The single
    division is the same IEEE op on both engines, so both the ranking and
    the emitted priority are bit-identical (emitted raw — re-rounding a
    >2^33 double at 6 decimals is beyond double precision and engines
    disagree there)."""
    from ..functions.hashing import hash48

    docs = load_table(spark, sf_dir, "documents")
    pri = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (
            hash48(F.col("doc_id").cast("string")).cast("double")
            / F.col("n_chars")
        ).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("priority").asc(), F.col("doc_id").asc()
    )
    return (
        pri.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= SAMPLE_K)
        .select("source", "doc_id", "n_chars", "priority")
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split: the reproducibility primitive every
# training pipeline needs — membership is a pure function of the stable key,
# so retries, re-partitioning, and incremental reruns cannot move a document
# between splits.
# --------------------------------------------------------------------------
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # remainder (100 - train - val) is test


def _split_oracle() -> str:
    from ..functions.hashing import sql_hash48

    h = sql_hash48("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               CASE WHEN {h} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN {h} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM keyed
    GROUP BY split
    """


@query("dataset_split_hash", oracle=_split_oracle())
def dataset_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by content-stable hash bucket,
    with per-split size accounting. The split predicate is a scan-stage
    projection (no shuffle, no RNG state): hash48(doc_id) % 100 against
    fixed thresholds, so membership survives retries and re-partitioning
    and downstream jobs can re-derive it without a membership table. At
    100 TB the per-split report is one map-side-combined aggregation on a
    3-value key."""
    from ..functions.hashing import hash48

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash48(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# Round-3 composed pipeline: the full modern pre-training prep chain as ONE
# Catalyst plan — quality gate, perplexity gate, canonical-text dedup,
# deterministic split assignment, per-(split, source) accounting.
# --------------------------------------------------------------------------
PPL_MAX = 6.0  # drop docs whose bigram avg-neg-logp exceeds this


def _v2_oracle() -> str:
    from ..registry import ORACLES
    from .dedup import _NORM_SQL

    from ..functions.hashing import sql_hash48

    quality_cte = ORACLES["text_quality"]
    ppl_cte = ORACLES["text_perplexity_bigram"]
    h = sql_hash48("CAST(d.doc_id AS VARCHAR)")
    return f"""
    WITH q AS ({quality_cte}),
    ppl AS ({ppl_cte}),
    d AS (
        SELECT doc_id, source, n_chars,
               md5({_NORM_SQL.format(c='text')}) AS norm_hash
        FROM documents
    ),
    kept AS (
        SELECT d.doc_id, d.source, d.n_chars, d.norm_hash,
               CASE WHEN {h} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN {h} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM d
        JOIN q USING (doc_id)
        JOIN ppl USING (doc_id)
        WHERE q.quality >= {QUALITY_MIN} AND q.n_tokens >= {TOKENS_MIN}
          AND ppl.avg_neg_logp <= {PPL_MAX}
    ),
    uniq AS (
        SELECT * FROM (
            SELECT kept.*,
                   min(doc_id) OVER (PARTITION BY norm_hash) AS keeper
            FROM kept
        ) WHERE doc_id = keeper
    )
    SELECT split, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM uniq
    GROUP BY split, source
    """


@query("prep_pipeline_v2", oracle=_v2_oracle())
def prep_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full modern pre-training prep chain in ONE plan: surface-quality
    gate (text_quality) ∧ fluency gate (text_perplexity_bigram) →
    canonical-text dedup keeper (the C4 normalize-then-hash rule) →
    deterministic hash split → per-(split, source) accounting. Every
    stage is the REGISTERED operator, composed — engine side calls the
    functions, oracle side splices the registered CTEs, so the pipeline
    can never drift from its parts.

    100 TB shape: the gates are scan-stage joins on doc_id (quality is
    map-only; perplexity's LM joins are vocabulary-keyed); the keeper
    window shuffles once on the canonical hash; the split predicate is a
    pure projection; the report is a tiny two-key rollup."""
    from ..functions.hashing import hash48
    from ..registry import QUERIES
    from .dedup import _NORM_SPARK

    q = QUERIES["text_quality"](spark, sf_dir).select(
        "doc_id", "quality", "n_tokens"
    )
    ppl = QUERIES["text_perplexity_bigram"](spark, sf_dir).select(
        "doc_id", "avg_neg_logp"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", F.md5(_NORM_SPARK(F.col("text"))).alias("norm_hash")
    )
    bucket = hash48(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    kept = (
        docs.join(q, "doc_id")
        .join(ppl, "doc_id")
        .filter(
            (F.col("quality") >= QUALITY_MIN)
            & (F.col("n_tokens") >= TOKENS_MIN)
            & (F.col("avg_neg_logp") <= PPL_MAX)
        )
        .withColumn("split", split)
    )
    keeper = F.min("doc_id").over(Window.partitionBy("norm_hash"))
    uniq = kept.withColumn("keeper", keeper).filter(
        F.col("doc_id") == F.col("keeper")
    )
    return uniq.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )


# --------------------------------------------------------------------------
# Split-leakage audit: near-duplicate pairs that straddle the train/val/test
# boundary — the self-decontamination check run before any eval is trusted.
# --------------------------------------------------------------------------
def _leakage_oracle() -> str:
    from ..functions.hashing import sql_hash48
    from ..registry import ORACLES

    def split_of(col: str) -> str:
        h = sql_hash48(f"CAST({col} AS VARCHAR)")
        return (
            f"CASE WHEN {h} % 100 < {SPLIT_TRAIN_PCT} THEN 'train' "
            f"WHEN {h} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val' "
            f"ELSE 'test' END"
        )

    return f"""
    WITH pairs AS MATERIALIZED ({ORACLES['dedup_minhash_lsh']}),
    tagged AS (
        SELECT least({split_of('p.a_id')}, {split_of('p.b_id')}) AS split_a,
               greatest({split_of('p.a_id')}, {split_of('p.b_id')}) AS split_b,
               p.jaccard
        FROM pairs p
    )
    SELECT split_a, split_b,
           count(*) AS n_pairs,
           CAST(split_a <> split_b AS INT) AS is_leakage,
           max(jaccard) AS max_jaccard
    FROM tagged GROUP BY split_a, split_b
    """


@query("split_leakage_check", oracle=_leakage_oracle())
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test leakage audit: every verified near-duplicate pair
    (composes the REGISTERED dedup_minhash_lsh on both sides) classified
    by the split pair its two documents land in under the REGISTERED
    hash-split rule. Off-diagonal rows are leakage — a validation doc
    whose near-twin sits in train inflates the eval; the standard fix is
    moving whole duplicate CLUSTERS into one split, and this table is the
    evidence that decides whether that rework is needed.

    Scale posture: the pair list is near-dup-sized, not corpus-sized;
    split assignment is a pure scan-stage hash projection re-derived on
    the pair ids (no membership-table join at all); the rollup keys on a
    <=9-cell space."""
    from ..functions.hashing import hash48
    from ..registry import QUERIES

    pairs = QUERIES["dedup_minhash_lsh"](spark, sf_dir)

    def split_of(col: str):
        bucket = hash48(F.col(col).cast("string")) % 100
        return (
            F.when(bucket < SPLIT_TRAIN_PCT, "train")
            .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
            .otherwise("test")
        )

    sa, sb = split_of("a_id"), split_of("b_id")
    tagged = pairs.select(
        F.least(sa, sb).alias("split_a"),
        F.greatest(sa, sb).alias("split_b"),
        "jaccard",
    )
    return tagged.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.col("split_a") != F.col("split_b")).cast("int").alias("is_leakage"),
        F.max("jaccard").alias("max_jaccard"),
    )


# --------------------------------------------------------------------------
# Quality-threshold planning: token mass by quality decile, with the
# cumulative "tokens kept if you cut here" column — the table read before
# choosing a corpus quality filter.
# --------------------------------------------------------------------------
def _quality_hist_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH q AS MATERIALIZED ({ORACLES['text_quality']}),
    t AS MATERIALIZED ({ORACLES['text_token_count']}),
    binned AS (
        SELECT greatest(least(CAST(floor(q.quality * 10) AS BIGINT), 9), 0)
                   AS quality_bin,
               t.bpe_tokens
        FROM q JOIN t USING (doc_id)
    ), g AS (
        SELECT quality_bin, count(*) AS n_docs,
               CAST(sum(bpe_tokens) AS BIGINT) AS bpe_tokens
        FROM binned GROUP BY quality_bin
    )
    SELECT quality_bin, n_docs, bpe_tokens,
           CAST(sum(bpe_tokens) OVER (ORDER BY quality_bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tokens_kept_at_cut
    FROM g
    """


@query("quality_token_histogram", oracle=_quality_hist_oracle())
def quality_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token mass by quality decile (composes the REGISTERED text_quality
    and text_token_count on both sides): each document's composite quality
    clamps into one of 10 bins, and the descending cumulative sum answers
    the planning question directly — "if the filter cuts at bin b, how
    many BPE tokens survive". Run before fixing a corpus quality
    threshold; pair with prep_pipeline's gate to enact it.

    Scale posture: two scan-stage per-row feature projections joined on
    doc_id, ONE 10-key aggregation, and a 10-row window — nothing beyond
    the join touches fact-scale state, and the join itself can co-locate
    on doc_id at 100 TB (same key both sides)."""
    from ..registry import QUERIES

    q = QUERIES["text_quality"](spark, sf_dir).select("doc_id", "quality")
    t = QUERIES["text_token_count"](spark, sf_dir).select("doc_id", "bpe_tokens")
    binned = q.join(t, "doc_id").select(
        F.greatest(
            F.least(F.floor(F.col("quality") * 10).cast("long"), F.lit(9)),
            F.lit(0),
        ).alias("quality_bin"),
        "bpe_tokens",
    )
    g = binned.groupBy("quality_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
    )
    w = (
        Window.orderBy(F.desc("quality_bin"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return g.select(
        "quality_bin",
        "n_docs",
        "bpe_tokens",
        F.sum("bpe_tokens").over(w).cast("long").alias("tokens_kept_at_cut"),
    )


# --------------------------------------------------------------------------
# Domain-mixture reweighting: per-source token shares and the sampling
# multiplier that reaches a uniform target mixture (the DoReMi-style
# mixture table, with a fixed uniform target so it stays closed-form).
# --------------------------------------------------------------------------
def _mixture_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH t AS MATERIALIZED ({ORACLES['text_token_count']}),
    d AS (
        SELECT doc.source, t.bpe_tokens
        FROM documents doc JOIN t ON t.doc_id = doc.doc_id
    ), per_src AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(bpe_tokens) AS BIGINT) AS bpe_tokens
        FROM d GROUP BY source
    ), tot AS (
        SELECT CAST(sum(bpe_tokens) AS BIGINT) AS all_tokens,
               CAST(count(*) AS BIGINT) AS n_sources
        FROM per_src
    )
    SELECT p.source, p.n_docs, p.bpe_tokens,
           round(CAST(p.bpe_tokens AS DOUBLE) / t.all_tokens, 6)
               AS natural_share,
           round(CAST(t.all_tokens AS DOUBLE)
                 / (t.n_sources * p.bpe_tokens), 6) AS uniform_multiplier
    FROM per_src p CROSS JOIN tot t
    """


@query("source_mixture_weights", oracle=_mixture_oracle())
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture table (composes the REGISTERED text_token_count):
    per source, document and BPE-token counts, the natural token share,
    and the sampling multiplier that would equalize the mixture
    (multiplier = target_share / natural_share with a uniform target =
    1/n_sources) — the closed-form core of DoReMi-style domain
    reweighting; a learned target just replaces the uniform constant.

    Scale posture: one doc_id-keyed join of scan-stage projections, one
    source-keyed aggregation (handful of groups, map-side partials), and
    a 1-row totals broadcast. Shares are ratios of exact BIGINT token
    sums, rounded once at 6 dp — identical doubles on both engines."""
    from ..registry import QUERIES

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    t = QUERIES["text_token_count"](spark, sf_dir).select("doc_id", "bpe_tokens")
    per_src = (
        docs.join(t, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
        )
    )
    tot = per_src.agg(
        F.sum("bpe_tokens").cast("long").alias("all_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "bpe_tokens",
        F.round(
            F.col("bpe_tokens").cast("double") / F.col("all_tokens"), 6
        ).alias("natural_share"),
        F.round(
            F.col("all_tokens").cast("double")
            / (F.col("n_sources") * F.col("bpe_tokens")),
            6,
        ).alias("uniform_multiplier"),
    )


# ---------------------------------------------------------------------------
# Neyman allocation: how a fixed sample budget should split across strata.
# ---------------------------------------------------------------------------
@query(
    "neyman_allocation",
    oracle="""
    WITH c AS (
        SELECT c_mktsegment AS segment,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    ), m AS (
        SELECT segment,
               CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s,
               CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE) AS q
        FROM c GROUP BY segment
    ), sd AS (
        SELECT segment, n_h,
               sqrt((n_h * q - s * s) / (n_h * (n_h - 1.0))) AS stddev_cents
        FROM m
    ), tot AS (
        SELECT CAST(sum(n_h) AS BIGINT) AS n_total,
               list_reduce(
                   [0.0] || list_transform(
                       list_sort(list(struct_pack(segment := segment,
                                                  w := n_h * stddev_cents))),
                       x -> x.w),
                   (a, b) -> a + b) AS denom
        FROM sd
    )
    SELECT sd.segment, sd.n_h, round(sd.stddev_cents, 6) AS stddev_cents,
           round(sd.n_h * sd.stddev_cents / t.denom, 6) AS neyman_weight,
           round(CAST(sd.n_h AS DOUBLE) / t.n_total, 6) AS proportional_weight
    FROM sd CROSS JOIN tot t
    """,
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation for stratified sampling: with a fixed label/eval
    budget, the variance-minimizing share for stratum h is
    n_h·S_h / Σ n_g·S_g — sample more where the stratum is BIG and
    NOISY, not merely big. Reported next to the proportional share so
    the table shows exactly where naive proportional sampling
    over/under-spends; this is the design step upstream of
    stratified_mix_sample (which executes a given allocation with
    deterministic hash sampling).

    Exactness: per-stratum moments are exact integer sums (DECIMAL
    intermediates on the oracle side — the corr_exact pattern); each
    sample stddev is one pinned expression over them; the denominator
    Σ n_h·S_h folds in sorted segment order (bounded by stratum count —
    the entropy_fold discipline) and everything rounds to 6 dp.

    Plan: ONE fact-table aggregation with map-side partials collapsing
    to stratum cardinality; the fold + rebroadcast runs over 5 rows. At
    100 TB this is the cheapest possible shape for the computation —
    scan-bound with constant-size state."""
    cust = load_table(spark, sf_dir, "customer")
    m = (
        cust.select(
            F.col("c_mktsegment").alias("segment"),
            F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_h"),
            F.sum("cents").cast("double").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).cast("double").alias("q"),
        )
    )
    sd = m.select(
        "segment",
        "n_h",
        F.sqrt(
            (F.col("n_h") * F.col("q") - F.col("s") * F.col("s"))
            / (F.col("n_h") * (F.col("n_h") - F.lit(1.0)))
        ).alias("stddev_cents"),
    )
    tot = sd.agg(
        F.sum("n_h").cast("long").alias("n_total"),
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(segment, n_h * stddev_cents AS w))), x -> x.w),"
            " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("denom"),
    )
    return sd.crossJoin(F.broadcast(tot)).select(
        "segment",
        "n_h",
        F.round("stddev_cents", 6).alias("stddev_cents"),
        F.round(F.col("n_h") * F.col("stddev_cents") / F.col("denom"), 6).alias(
            "neyman_weight"
        ),
        F.round(F.col("n_h").cast("double") / F.col("n_total"), 6).alias(
            "proportional_weight"
        ),
    )


# --------------------------------------------------------------------------
# v3: the full pipeline with readability and decontamination stages added —
# every gate a registered operator, the whole chain one Catalyst plan.
# --------------------------------------------------------------------------
FLESCH_MIN = -200.0  # permissive floor: drops only degenerate/unreadable docs


def _v3_oracle() -> str:
    from ..functions.hashing import sql_hash48
    from ..registry import ORACLES
    from .dedup import _NORM_SQL

    h = sql_hash48("CAST(d.doc_id AS VARCHAR)")
    return f"""
    WITH q AS MATERIALIZED ({ORACLES['text_quality']}),
    ppl AS MATERIALIZED ({ORACLES['text_perplexity_bigram']}),
    rd AS MATERIALIZED ({ORACLES['text_readability']}),
    contam AS MATERIALIZED ({ORACLES['decontam_ngram_overlap']}),
    d AS (
        SELECT doc_id, source, n_chars,
               md5({_NORM_SQL.format(c='text')}) AS norm_hash
        FROM documents
    ),
    kept AS (
        SELECT d.doc_id, d.source, d.n_chars, d.norm_hash,
               CASE WHEN {h} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN {h} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM d
        JOIN q USING (doc_id)
        JOIN ppl USING (doc_id)
        JOIN rd USING (doc_id)
        WHERE q.quality >= {QUALITY_MIN} AND q.n_tokens >= {TOKENS_MIN}
          AND ppl.avg_neg_logp <= {PPL_MAX}
          AND rd.flesch IS NOT NULL AND rd.flesch >= {FLESCH_MIN}
          AND NOT EXISTS (
              SELECT 1 FROM contam c WHERE c.train_doc_id = d.doc_id)
    ),
    uniq AS (
        SELECT * FROM (
            SELECT kept.*,
                   min(doc_id) OVER (PARTITION BY norm_hash) AS keeper
            FROM kept
        ) WHERE doc_id = keeper
    )
    SELECT split, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM uniq
    GROUP BY split, source
    """


@query("prep_pipeline_v3", oracle=_v3_oracle())
def prep_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v3 of the composed pre-training pipeline — v2's chain (quality ∧
    fluency gates → canonical dedup → hash split → accounting) plus the
    two stages a production 2024-era recipe adds: a READABILITY floor
    (text_readability; drops only degenerate docs at this permissive
    threshold, but the stage is where a real corpus tunes its band) and
    BENCHMARK DECONTAMINATION (any doc sharing a 5-gram with the eval
    carve is excluded via anti-join against decontam_ngram_overlap's
    flag table). Six registered operators, one Catalyst plan, one
    oracle built from their registered SQL — the pipeline cannot drift
    from its parts.

    100 TB shape: all gates remain doc_id-keyed scan-stage joins; the
    decontam anti-join probes a broadcast flag table (eval sets are
    tiny); the dedup keeper window is the single content-hash shuffle;
    the report is a two-key rollup. Adding stages composed plans, not
    passes — the corpus is still scanned once per feature family."""
    from ..functions.hashing import hash48
    from ..registry import QUERIES
    from .dedup import _NORM_SPARK

    q = QUERIES["text_quality"](spark, sf_dir).select(
        "doc_id", "quality", "n_tokens"
    )
    ppl = QUERIES["text_perplexity_bigram"](spark, sf_dir).select(
        "doc_id", "avg_neg_logp"
    )
    rd = QUERIES["text_readability"](spark, sf_dir).select("doc_id", "flesch")
    contam = QUERIES["decontam_ngram_overlap"](spark, sf_dir).select(
        F.col("train_doc_id").alias("doc_id")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(_NORM_SPARK(F.col("text"))).alias("norm_hash"),
    )
    bucket = hash48(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    kept = (
        docs.join(q, "doc_id")
        .join(ppl, "doc_id")
        .join(rd, "doc_id")
        .join(F.broadcast(contam), "doc_id", "left_anti")
        .filter(
            (F.col("quality") >= QUALITY_MIN)
            & (F.col("n_tokens") >= TOKENS_MIN)
            & (F.col("avg_neg_logp") <= PPL_MAX)
            & F.col("flesch").isNotNull()
            & (F.col("flesch") >= FLESCH_MIN)
        )
        .withColumn("split", split)
    )
    keeper = F.min("doc_id").over(Window.partitionBy("norm_hash"))
    uniq = kept.withColumn("keeper", keeper).filter(
        F.col("doc_id") == F.col("keeper")
    )
    return uniq.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )


# --------------------------------------------------------------------------
# Cross-source quantile normalization of the quality score.
# --------------------------------------------------------------------------
def _qnorm_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH q AS MATERIALIZED ({ORACLES['text_quality']}),
    sc AS (
        SELECT d.source, q.doc_id,
               CAST(round(q.quality * 1000000) AS BIGINT) AS x
        FROM q JOIN documents d ON d.doc_id = q.doc_id
        WHERE q.quality IS NOT NULL
    ), src AS (
        SELECT source, doc_id, x,
               CAST(row_number() OVER (PARTITION BY source
                    ORDER BY x, doc_id) AS BIGINT) AS r,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM sc
    ), pooled AS (
        SELECT x AS px,
               CAST(row_number() OVER (ORDER BY x, doc_id) AS BIGINT) AS k
        FROM sc
    )
    SELECT s.doc_id, s.source, s.x AS q_orig, p.px AS q_norm
    FROM src s JOIN pooled p
      ON p.k = ((2 * s.r - 1) * s.n + 2 * s.n_s - 1) // (2 * s.n_s)
    """


@query("score_quantile_normalize", oracle=_qnorm_oracle())
def score_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of the quality score ACROSS sources: each
    document's score is replaced by the pooled-corpus score at the same
    quantile position, so every source ends up with (a selection from)
    the same marginal distribution — the standard cross-batch alignment
    move (microarray quantile normalization, score calibration across
    crawls) before mixing sources with source_mixture_weights. Rank
    order WITHIN each source is preserved exactly.

    Determinism/exactness: scores are fixed-point ints; within-source
    rank r and pooled rank k are deterministic row_numbers tie-broken by
    doc_id; the quantile map k = ceil((2r−1)·N / (2n_s)) is PURE integer
    arithmetic ((a + b − 1) div b) — no floats anywhere in the operator.
    The normalized score is a SELECTION from the pooled support, never
    an interpolation.

    Plan: one scan through the quality kernel; the within-source windows
    share one source-hash exchange; the pooled rank is the one global
    sort (inherent — the pooled ECDF is the definition; at 100 TB swap
    in a two-phase rank: per-partition ranks + broadcast partition
    offsets, same join). The k-join is an integer equi-join."""
    from ..registry import QUERIES

    q = QUERIES["text_quality"](spark, sf_dir).filter(
        F.col("quality").isNotNull()
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sc = q.join(docs, "doc_id").select(
        "source",
        "doc_id",
        F.expr("CAST(round(quality * 1000000) AS BIGINT)").alias("x"),
    ).persist()
    sc.count()  # the source-rank and pooled-rank branches both read it
    w_src = Window.partitionBy("source").orderBy("x", "doc_id")
    w_all = Window.orderBy("x", "doc_id")
    src = sc.select(
        "source",
        "doc_id",
        "x",
        F.row_number().over(w_src).cast("long").alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("n_s"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    pooled = sc.select(
        F.col("x").alias("px"),
        F.row_number().over(w_all).cast("long").alias("k"),
    )
    key = F.expr("((2 * r - 1) * n + 2 * n_s - 1) DIV (2 * n_s)")
    return (
        src.withColumn("k", key)
        .join(pooled, "k")
        .select(
            "doc_id",
            "source",
            F.col("x").alias("q_orig"),
            F.col("px").alias("q_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Dataset card: the one-row-per-source summary a corpus release ships.
# ---------------------------------------------------------------------------
CARD_SHORT_CHARS = 256  # docs under this length count as "short"

_CARD_SQL_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


@query(
    "dataset_card_by_source",
    oracle=f"""
    WITH base AS (
        SELECT source, lang, n_chars, doc_id,
               len({_CARD_SQL_TOKS}) AS dl, md5(text) AS h
        FROM documents
    ), core AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(CASE WHEN n_chars < {CARD_SHORT_CHARS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_short
        FROM base GROUP BY source
    ), langs AS (
        SELECT source, lang, count(*) AS cnt FROM base GROUP BY source, lang
    ), top_lang AS (
        SELECT source, lang AS top_lang, cnt FROM (
            SELECT source, lang, cnt,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY cnt DESC, lang) AS rn
            FROM langs
        ) WHERE rn = 1
    ), hgroups AS (
        SELECT h, count(*) AS n FROM base GROUP BY h
    ), dups AS (
        SELECT b.source,
               CAST(sum(CASE WHEN g.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_docs
        FROM base b JOIN hgroups g USING (h) GROUP BY b.source
    )
    SELECT c.source, c.n_docs, c.n_tokens, c.n_chars_total, c.n_langs,
           t.top_lang,
           CAST(t.cnt AS DOUBLE) / CAST(c.n_docs AS DOUBLE)
               AS top_lang_share,
           d.n_dup_docs,
           CAST(d.n_dup_docs AS DOUBLE) / CAST(c.n_docs AS DOUBLE)
               AS dup_share,
           c.n_short,
           CAST(c.n_short AS DOUBLE) / CAST(c.n_docs AS DOUBLE)
               AS short_share
    FROM core c
    JOIN top_lang t USING (source)
    JOIN dups d USING (source)
    """,
)
def dataset_card_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: one row per source with the release-notes
    numbers a corpus ships — document/token/char volumes, language
    diversity (count + dominant language and its share), the exact-dup
    footprint (docs whose md5(text) collides with ANY doc corpus-wide —
    the dedup_exact group definition — attributed to their source), and
    the short-doc share. The single
    summary every downstream training-mix decision starts from.

    Exactness: every tally is an exact integer; the three shares are
    single IEEE divisions of exact operands. Dominant language ties
    break lexicographically (rn over cnt DESC, lang).

    Plan: one scan feeds three aggregations — source-grain core, a
    (source, lang) language histogram, and a corpus-wide md5 group count
    joined back on the hash (uniform key, co-partitioned with the
    grouping shuffle) — each reduced before the source-grain joins,
    which Catalyst broadcasts (cardinality = |sources|). At 100 TB the
    fact-scale shuffles are the keyed aggs plus one hash-keyed join."""
    base = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("dl"),
        F.md5("text").alias("h"),
    )
    core = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(
            F.when(F.col("n_chars") < CARD_SHORT_CHARS, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_short"),
    )
    langs = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top_lang = (
        langs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.desc("cnt"), F.asc("lang")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), "cnt")
    )
    hgroups = base.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    dups = (
        base.join(hgroups, "h")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs")
        )
    )
    return (
        core.join(top_lang, "source")
        .join(dups, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars_total",
            "n_langs",
            "top_lang",
            (F.col("cnt").cast("double") / F.col("n_docs").cast("double"))
            .alias("top_lang_share"),
            "n_dup_docs",
            (
                F.col("n_dup_docs").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_share"),
            "n_short",
            (F.col("n_short").cast("double") / F.col("n_docs").cast("double"))
            .alias("short_share"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing: the p^alpha upsampling recipe.
# ---------------------------------------------------------------------------
MIX_TEMP_NUM = 1  # alpha = 1/2: sqrt temperature (integer-exact via sqrt())
MIX_TEMP_DEN = 2


@query(
    "source_temperature_mix",
    oracle="""
    WITH per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS t_all,
               list_reduce([0.0] || list_sort(list(
                   sqrt(CAST(n_tokens AS DOUBLE)))), (a, b) -> a + b) AS z
        FROM per
    )
    SELECT p.source, p.n_docs, p.n_tokens,
           CAST(p.n_tokens AS DOUBLE) / CAST(t.t_all AS DOUBLE)
               AS natural_share,
           sqrt(CAST(p.n_tokens AS DOUBLE)) / t.z AS mix_share,
           (sqrt(CAST(p.n_tokens AS DOUBLE)) / t.z)
               / (CAST(p.n_tokens AS DOUBLE) / CAST(t.t_all AS DOUBLE))
               AS epochs
    FROM per p CROSS JOIN tot t
    """,
)
def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled training-mix weights: each source's sampling
    share is n_tokens^(1/2) renormalized (the p^α upsampling recipe the
    large-LM corpora use to keep small high-quality sources from being
    drowned by big ones), reported next to the natural share and the
    implied epoch multiplier (mix_share/natural_share — how many times
    the source would be seen per pass over the mixed corpus; >1 =
    upsampled). The one-table answer to "what does α do to my mix".

    Exactness: token tallies are exact integers; sqrt is exact-rounded
    IEEE (same double both engines); Z = Σ√n is a SORTED fold over the
    bounded source set, seeded 0.0 (entropy_fold discipline — engine-
    native sum order differs), and every share is a pinned division
    chain.

    Plan: ONE source-keyed aggregation over the corpus, then
    |sources|-row arithmetic against a broadcast 1-row total."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("long")
        .alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").cast("long").alias("t_all"),
        F.expr(
            "aggregate(sort_array(collect_list(sqrt(CAST(n_tokens AS"
            " DOUBLE)))), CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("z"),
    )
    nat = F.col("n_tokens").cast("double") / F.col("t_all").cast("double")
    mix = F.sqrt(F.col("n_tokens").cast("double")) / F.col("z")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        nat.alias("natural_share"),
        mix.alias("mix_share"),
        (mix / nat).alias("epochs"),
    )


# --------------------------------------------------------------------------
# Quality-greedy token-budget allocation across sources: the data-mix
# planning step that turns quality scores into an acquisition decision.
# --------------------------------------------------------------------------
ALLOC_BUDGET = 20_000  # token budget to fill


def _alloc_oracle() -> str:
    quality_cte = registry.ORACLES["text_quality"]
    return f"""
    WITH q AS ({quality_cte}),
    src AS (
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(CAST(round(q.quality * 1000000) AS BIGINT))
                    AS BIGINT) AS qx
        FROM q JOIN documents d USING (doc_id)
        WHERE q.quality IS NOT NULL
        GROUP BY d.source
    ), ranked AS (
        SELECT *,
               row_number() OVER (
                   ORDER BY CAST(qx AS DOUBLE) / n_docs DESC, source
               ) AS rnk
        FROM src
    ), cum AS (
        SELECT *,
               CAST(coalesce(sum(total_tokens) OVER (
                   ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM ranked
    )
    SELECT rnk AS rank, source, n_docs, total_tokens,
           round(CAST(qx AS DOUBLE) / n_docs / CAST(1000000 AS DOUBLE), 6)
               AS avg_quality,
           CAST(greatest(0, least(total_tokens,
                                  {ALLOC_BUDGET} - cum_before))
                AS BIGINT) AS allocated_tokens
    FROM cum
    """


@query("source_budget_allocation", oracle=_alloc_oracle())
def source_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-greedy token-budget allocation: rank sources by mean
    quality (ties to the lexicographically first source), then fill a
    fixed token budget best-source-first — full sources until the
    boundary source takes the remainder, zero after. This is the
    planning table behind a data-mix decision ("which sources make the
    cut at N tokens, and who is on the bubble"); source_temperature_mix
    SOFTENS a mix, this PICKS one under a hard budget.

    Exactness: per-source token totals and the fixed-point quality sums
    are exact integers; the ranking key is ONE division of exact ints
    (correctly rounded → identical across engines, ties broken by
    source); the allocation is integer clamp arithmetic over an integer
    prefix sum. avg_quality is reported via pinned divisions + a 6-dp
    round.

    Plan: one fact-scale quality join + source rollup, then
    |sources|-row window/prefix work — constant post-rollup cost."""
    q = text_quality(spark, sf_dir).filter(F.col("quality").isNotNull())
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src = (
        q.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.expr("CAST(round(quality * 1000000) AS BIGINT)"))
            .cast("long")
            .alias("qx"),
        )
    )
    qavg = F.col("qx").cast("double") / F.col("n_docs")
    ranked = src.withColumn(
        "rnk", F.row_number().over(Window.orderBy(qavg.desc(), "source"))
    )
    wb = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, -1)
    cum = ranked.withColumn(
        "cum_before",
        F.coalesce(F.sum("total_tokens").over(wb), F.lit(0)).cast("long"),
    )
    return cum.select(
        F.col("rnk").alias("rank"),
        "source",
        "n_docs",
        "total_tokens",
        F.round(qavg / F.expr("CAST(1000000 AS DOUBLE)"), 6).alias(
            "avg_quality"
        ),
        F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.col("total_tokens"),
                F.lit(ALLOC_BUDGET) - F.col("cum_before"),
            ),
        )
        .cast("long")
        .alias("allocated_tokens"),
    )
