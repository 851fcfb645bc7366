"""Round-4 scale extensions: the remaining operator shapes a 100 TB
analytics/training-data platform runs daily that the registry did not yet
cover — decayed averages (EWMA), bitmap-word exact distinct counting,
small-file compaction planning, NOT IN three-valued-logic semantics, and a
positional inverted index with phrase search.

Determinism rules (cross-engine hash parity), same discipline as the rest
of the package:

* ewma_halflife: the decay is alpha = 1/2 over a FIXED 16-tap horizon, so
  every weight is a power of two; the weighted sum is a single exact
  BIGINT aggregate (order-free) and only the final normalization is one
  IEEE double division — bit-identical on both engines.
* bitmap_distinct_users: pure integer bit algebra (shiftleft / bit_or /
  bit_count); no floats anywhere.
* compaction_bins: integer prefix sums and floor division only.
* not_in_null_semantics: counts under three join semantics; integers.
* inverted index / phrase search: integer positions, deterministic
  sorted-position CSV serialization.

Scale notes (100 TB):

* ewma_halflife: one shuffle on user_id; the 16-tap truncation bounds
  per-key state to a constant (this is exactly how a feature store
  materializes decayed features — full-history EWMA is a streaming
  accumulator, not a batch scan).
* bitmap_distinct_users: the classic bitmap-rollup trick — distinct
  counting becomes two partial-aggregatable integer aggregations
  ((day, word) bit_or, then day sum of popcounts); no count(distinct)
  expansion, no shuffle of raw user ids beyond the first keyed agg.
  Words are user_id DIV 32, so the intermediate is |days| x |users|/32
  rows at worst — 32x smaller than the distinct expansion, and the
  pattern composes with segment intersection (bit_and) for free.
* compaction_bins: windows partition by ``source`` (a real table would
  use its partition column) — per-partition sequential fill, no global
  ordering anywhere.
* not_in_null_semantics: Catalyst plans the NOT IN as a null-aware anti
  join; the point of registering it is pinning the three-valued-logic
  contract (NULL in the subquery annihilates NOT IN but not NOT EXISTS).
* text_inverted_index / text_phrase_search: the posting-list build is one
  (token, doc) agg; the phrase query is an equi-join on (doc_id,
  position) — the distributed phrase-search shape, no regex over the
  corpus at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.parquet import load_table

# --------------------------------------------------------------------------
# EWMA (half-life decay, 16-tap truncated horizon).
# --------------------------------------------------------------------------
EWMA_TAPS = 16
EWMA_DENOM = float((1 << EWMA_TAPS) * 100)  # 2^16 scale x cents


@query(
    "ewma_halflife",
    oracle=f"""
    WITH tail AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_taps,
           -- every weight is 2^(16-rn): the weighted sum is exact in BIGINT
           -- and only this one division is floating point.
           CAST(sum(cents * (CAST(1 AS BIGINT) << ({EWMA_TAPS} - rn))) AS DOUBLE)
               / {EWMA_DENOM} AS ewma_value
    FROM tail
    WHERE rn <= {EWMA_TAPS}
    GROUP BY user_id
    """,
)
def ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per user with
    alpha = 1/2, truncated to the 16 most recent events (tap j carries
    weight 2^-(j+1); the omitted tail weight is < 2^-16 — the documented
    contract, and the constant-state form a feature store materializes).

    Because alpha is a power of two, scaling by 2^16 makes every term an
    exact integer: the aggregate is an order-free BIGINT sum, immune to
    shuffle layout, and the single final division is IEEE-identical on
    both engines. One shuffle (the row_number window and the groupBy share
    the user_id partitioning)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    tail = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= EWMA_TAPS
    )
    return tail.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_taps"),
        (
            F.sum(
                F.col("cents")
                * F.expr(f"shiftleft(CAST(1 AS BIGINT), {EWMA_TAPS} - rn)")
            ).cast("double")
            / F.lit(EWMA_DENOM)
        ).alias("ewma_value"),
    )


# --------------------------------------------------------------------------
# Bitmap-word exact distinct counting (the roaring-bitmap rollup shape).
# --------------------------------------------------------------------------
_DAY_NS = 86_400_000_000_000  # nanoseconds per day (engine side: int64 ns)


@query(
    "bitmap_distinct_users",
    oracle="""
    WITH words AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
               user_id // 32 AS word_id,
               bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER)) AS word,
               count(*) AS cnt
        FROM events
        GROUP BY 1, 2
    )
    SELECT day_id,
           CAST(sum(bit_count(word)) AS BIGINT) AS distinct_users,
           CAST(sum(cnt) AS BIGINT) AS n_events
    FROM words
    GROUP BY day_id
    """,
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily distinct users via bitmap words: user_id is packed into
    32-bit words (word = id DIV 32, bit = id MOD 32), bit_or-ed per
    (day, word), then popcount-summed per day. Distinct counting without a
    count(distinct) expansion: both levels are partial-aggregatable
    integer aggregations, the intermediate is 32x smaller than the raw
    distinct shuffle, and day-over-day set intersection/union would be a
    bit_and/bit_or join of the same words. Pure integer bit algebra —
    nothing to diverge between engines."""
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            F.expr(f"ts div {_DAY_NS}").alias("day_id"),
            F.expr("user_id div 32").alias("word_id"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))"
            ).alias("mask"),
        )
        .groupBy("day_id", "word_id")
        .agg(
            F.expr("bit_or(mask)").alias("word"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return words.groupBy("day_id").agg(
        F.sum(F.bit_count("word")).cast("long").alias("distinct_users"),
        F.sum("cnt").cast("long").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Small-file compaction planning (lakehouse table maintenance).
# --------------------------------------------------------------------------
COMPACT_TARGET = 4096  # target bytes (chars) per compacted output file


@query(
    "compaction_bins",
    oracle=f"""
    WITH offsets AS (
        SELECT source,
               doc_id,
               n_chars,
               CAST(coalesce(sum(n_chars) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_offset
        FROM documents
    )
    SELECT source,
           start_offset // {COMPACT_TARGET} AS bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM offsets
    GROUP BY source, bin_id
    """,
)
def compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction planning for small files: within each ``source``
    partition, files (documents, sized by n_chars) are packed in doc_id
    order into target-sized bins by their exclusive prefix-sum start
    offset — the sequential-fill policy a lakehouse OPTIMIZE job uses.
    The window partitions by source (a real table's partition column), so
    no global ordering exists anywhere and the plan stays fully parallel
    across partitions. Integer prefix sums and floor division only."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("start_offset"),
    )
    return (
        offsets.withColumn(
            "bin_id", F.expr(f"start_offset div {COMPACT_TARGET}")
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --------------------------------------------------------------------------
# NOT IN three-valued logic vs NOT EXISTS (null-aware anti join contract).
# --------------------------------------------------------------------------
_NOT_IN_SQL = """
    WITH sub AS (
        SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END AS k
        FROM orders
    )
    SELECT
        CAST((SELECT count(*) FROM {customer} c
              WHERE c.c_custkey NOT IN (SELECT k FROM sub)) AS BIGINT)
            AS not_in_count,
        CAST((SELECT count(*) FROM {customer} c
              WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.k = c.c_custkey))
             AS BIGINT) AS not_exists_count,
        CAST((SELECT count(*) FROM {customer} c
              WHERE c.c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL))
             AS BIGINT) AS anti_nonnull_count,
        CAST((SELECT count(*) FROM sub WHERE k IS NULL) AS BIGINT)
            AS n_null_keys
"""


@query("not_in_null_semantics", oracle=_NOT_IN_SQL.format(customer="customer"))
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic contract of NOT IN vs NOT EXISTS over a nullable
    subquery ('P'-status orders map to NULL): one NULL in the IN-list
    makes ``x NOT IN (...)`` UNKNOWN for every non-matching row (so the
    count collapses to 0 whenever a NULL key exists), while NOT EXISTS is
    null-rejecting and still anti-joins. Catalyst plans the NOT IN as a
    null-aware anti join; the null-free variant is the ordinary
    LeftAnti. Registered precisely to pin this semantic corner — the
    classic silent-wrong-answer trap when porting filters to a
    distributed engine."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_NOT_IN_SQL.format(customer="customer"))


# --------------------------------------------------------------------------
# Positional inverted index + phrase search.
# --------------------------------------------------------------------------
_MIN_TOKEN_LEN = 6


@query(
    "text_inverted_index",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS token,
               unnest(range(1, len(regexp_split_to_array(trim(text), '\\s+')) + 1))
                   AS pos
        FROM documents
    )
    SELECT token,
           doc_id,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions_csv
    FROM toks
    WHERE length(token) >= {_MIN_TOKEN_LEN}
    GROUP BY token, doc_id
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index over the corpus (vocabulary bounded to
    tokens >= 6 chars): one posexplode into (token, doc, position), one
    (token, doc) aggregation producing the sorted posting list as a CSV
    string. The build is a single partial-aggregatable shuffle keyed on
    (token, doc) — Zipf head spread by the doc component; serialization is
    the sorted integer position list, deterministic under any layout."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "token"),
    ).filter(F.length("token") >= _MIN_TOKEN_LEN)
    return (
        toks.withColumn("pos", (F.col("pos0") + 1).cast("long"))
        .groupBy("token", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("pos")),
                    lambda p: p.cast("string"),
                ),
                ",",
            ).alias("positions_csv"),
        )
    )


PHRASE = ("fast", "table")


@query(
    "text_phrase_search",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS token,
               unnest(range(1, len(regexp_split_to_array(trim(text), '\\s+')) + 1))
                   AS pos
        FROM documents
    )
    SELECT a.doc_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           min(a.pos) AS first_pos
    FROM toks a
    JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.token = '{PHRASE[0]}' AND b.token = '{PHRASE[1]}'
    GROUP BY a.doc_id
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ('fast table') as a positional equi-join: each
    side filters its term FIRST (the posting-list lookup), then joins on
    (doc_id, adjacent position) — the inverted-index query shape, never a
    regex over the corpus. Both join inputs are tiny post-filter; the join
    keys on (doc_id, pos), so the candidate space is positions of the
    rarer term, exactly as a search engine intersects posting lists."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "token"),
    ).withColumn("pos", (F.col("pos0") + 1).cast("long"))
    a = toks.filter(F.col("token") == PHRASE[0]).select("doc_id", "pos")
    b = toks.filter(F.col("token") == PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("pos").alias("first_pos"),
        )
    )


# --------------------------------------------------------------------------
# Count-min sketch: heavy-hitter frequency estimation.
# --------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPK = 10


def _cms_bucket_sql(token_expr: str, depth_expr: str) -> str:
    from ..functions.hashing import sql_hash48

    keyed = token_expr + " || '#' || CAST(" + depth_expr + " AS VARCHAR)"
    return f"{sql_hash48(keyed)} % {CMS_WIDTH}"


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents
    ), exact AS (
        SELECT token, CAST(count(*) AS BIGINT) AS exact_count
        FROM toks GROUP BY token
    ), rows_d AS (
        SELECT unnest(range(0, {CMS_DEPTH})) AS d
    ), sketch AS (
        SELECT d,
               {_cms_bucket_sql('token', 'd')} AS bucket,
               CAST(sum(exact_count) AS BIGINT) AS bucket_sum
        FROM exact, rows_d
        GROUP BY 1, 2
    ), top AS (
        SELECT token, exact_count
        FROM exact
        ORDER BY exact_count DESC, token
        LIMIT {CMS_TOPK}
    )
    SELECT t.token,
           t.exact_count,
           min(s.bucket_sum) AS cms_estimate
    FROM top t
    JOIN rows_d r ON true
    JOIN sketch s
      ON s.d = r.d AND s.bucket = {_cms_bucket_sql('t.token', 'r.d')}
    GROUP BY t.token, t.exact_count
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus vocabulary: depth 4 x width 256,
    bucket = md5-derived 48-bit hash of (token, row-seed) mod width. The
    sketch is built as {CMS_DEPTH} partial-aggregatable (depth, bucket)
    sums; point queries for the exact top-{CMS_TOPK} tokens take the min
    across depths — the CMS upper-bound estimate (>= exact by
    construction, equality when no collision). At 100 TB the sketch stays
    {CMS_DEPTH}x{CMS_WIDTH} counters regardless of corpus size — the
    whole point of sketching — while the exact side here exists only to
    measure estimation error. Hashing is the engine-portable md5 path
    (functions/hashing.py), so both engines compute identical buckets."""
    from ..functions.hashing import hash48

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    depths = spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("d"))
    bucket = (
        hash48(F.concat(F.col("token"), F.lit("#"), F.col("d").cast("string")))
        % CMS_WIDTH
    )
    sketch = (
        exact.crossJoin(F.broadcast(depths))
        .select("d", bucket.alias("bucket"), "exact_count")
        .groupBy("d", "bucket")
        .agg(F.sum("exact_count").cast("long").alias("bucket_sum"))
    )
    top = exact.orderBy(F.desc("exact_count"), F.asc("token")).limit(CMS_TOPK)
    probes = top.crossJoin(F.broadcast(depths)).select(
        "token", "exact_count", "d", bucket.alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("bucket_sum").alias("cms_estimate"))
    )


# --------------------------------------------------------------------------
# Chi-square test of independence (lang x source contingency table).
# --------------------------------------------------------------------------
@query(
    "chisq_independence",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
        FROM documents GROUP BY lang, source
    ), tot AS (
        SELECT CAST(sum(obs) AS BIGINT) AS n,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_lang,
               CAST(count(DISTINCT source) AS BIGINT) AS n_source
        FROM cells
    ), terms AS (
        SELECT c.lang, c.source,
               (c.obs - CAST(rt.row_tot * ct.col_tot AS DOUBLE) / t.n)
             * (c.obs - CAST(rt.row_tot * ct.col_tot AS DOUBLE) / t.n)
             / (CAST(rt.row_tot * ct.col_tot AS DOUBLE) / t.n) AS term
        FROM cells c
        JOIN (SELECT lang, CAST(sum(obs) AS BIGINT) AS row_tot
              FROM cells GROUP BY lang) rt ON rt.lang = c.lang
        JOIN (SELECT source, CAST(sum(obs) AS BIGINT) AS col_tot
              FROM cells GROUP BY source) ct ON ct.source = c.source
        CROSS JOIN tot t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           (SELECT (n_lang - 1) * (n_source - 1) FROM tot) AS dof,
           list_reduce(
               [0.0] || list_transform(
                   list_sort(list(struct_pack(lang := lang,
                                              source := source,
                                              term := term))),
                   x -> x.term),
               (a, b) -> a + b) AS chi2
    FROM terms
    """,
)
def chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for the lang x source contingency
    table. Observed counts and marginals are exact integers; each expected
    value is one double division of identical operands; the chi2 sum folds
    the per-cell terms in SORTED (lang, source) order with a 0.0 seed, so
    float accumulation is bit-identical on both engines (entropy_fold
    discipline). The contingency table is |lang| x |source| — the rollup
    and both marginals are tiny partial-aggregatable shuffles; the term
    join broadcasts marginal tables at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    row_tot = cells.groupBy("lang").agg(
        F.sum("obs").cast("long").alias("row_tot")
    )
    col_tot = cells.groupBy("source").agg(
        F.sum("obs").cast("long").alias("col_tot")
    )
    tot = cells.agg(
        F.sum("obs").cast("long").alias("n"),
        F.countDistinct("lang").cast("long").alias("n_lang"),
        F.countDistinct("source").cast("long").alias("n_source"),
    )
    exp = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    terms = (
        cells.join(F.broadcast(row_tot), "lang")
        .join(F.broadcast(col_tot), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_lang",
            "n_source",
            ((F.col("obs") - exp) * (F.col("obs") - exp) / exp).alias("term"),
        )
    )
    return terms.groupBy("n_lang", "n_source").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sort_array(F.collect_list(F.struct("lang", "source", "term"))).alias(
            "__lst"
        ),
    ).select(
        "n_cells",
        ((F.col("n_lang") - 1) * (F.col("n_source") - 1)).alias("dof"),
        F.expr(
            "aggregate(transform(__lst, x -> x.term),"
            " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("chi2"),
    )


# --------------------------------------------------------------------------
# Cramér's V — the [0, 1] effect size the raw chi-square hides.
# --------------------------------------------------------------------------
@query(
    "cramers_v_assoc",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
        FROM documents GROUP BY lang, source
    ), tot AS (
        SELECT CAST(sum(obs) AS BIGINT) AS n,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_lang,
               CAST(count(DISTINCT source) AS BIGINT) AS n_source
        FROM cells
    ), terms AS (
        SELECT c.lang, c.source,
               (c.obs - CAST(rt.row_tot * ct.col_tot AS DOUBLE) / t.n)
             * (c.obs - CAST(rt.row_tot * ct.col_tot AS DOUBLE) / t.n)
             / (CAST(rt.row_tot * ct.col_tot AS DOUBLE) / t.n) AS term
        FROM cells c
        JOIN (SELECT lang, CAST(sum(obs) AS BIGINT) AS row_tot
              FROM cells GROUP BY lang) rt ON rt.lang = c.lang
        JOIN (SELECT source, CAST(sum(obs) AS BIGINT) AS col_tot
              FROM cells GROUP BY source) ct ON ct.source = c.source
        CROSS JOIN tot t
    ), chi AS (
        SELECT list_reduce(
                   [0.0] || list_transform(
                       list_sort(list(struct_pack(lang := lang,
                                                  source := source,
                                                  term := term))),
                       x -> x.term),
                   (a, b) -> a + b) AS chi2
        FROM terms
    )
    SELECT t.n,
           CAST(least(t.n_lang, t.n_source) - 1 AS BIGINT) AS min_dim,
           c.chi2,
           sqrt(c.chi2 / (CAST(t.n AS DOUBLE)
                          * CAST(least(t.n_lang, t.n_source) - 1 AS DOUBLE)))
               AS cramers_v
    FROM chi c CROSS JOIN tot t
    """,
)
def cramers_v_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for the lang × source association: V =
    sqrt(chi² / (n · (min(r, c) − 1))) — the normalized [0, 1] effect
    size that makes contingency-table dependence comparable across
    tables of different shapes and corpus sizes, where the raw chi²
    (chisq_independence) only answers "is it significant". A corpus
    curator reads V directly: ~0 means sources share one language mix,
    ~1 means language is determined by source — i.e. how much a
    source-stratified sample skews the language balance.

    Exactness: same discipline as chisq_independence — integer cells
    and marginals, one-division expected values, the chi² fold in
    SORTED (lang, source) order with a 0.0 seed; then one division and
    one sqrt (correctly rounded on both engines) — bit-identical.

    Convention: chi² sums over OBSERVED (lang, source) cells only —
    empty cells' (0−E)²/E terms are omitted, mirroring
    chisq_independence (and understating V vs the full-grid textbook
    definition when the contingency table is sparse; the oracle uses
    the identical convention, so parity is exact). privacy_t_closeness
    is the full-grid counterexample if the gridded variant is wanted.

    Plan: |lang| × |source| contingency rollup (tiny, partial-agg) +
    broadcast marginal joins; constant post-rollup work at any SF."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    row_tot = cells.groupBy("lang").agg(
        F.sum("obs").cast("long").alias("row_tot")
    )
    col_tot = cells.groupBy("source").agg(
        F.sum("obs").cast("long").alias("col_tot")
    )
    tot = cells.agg(
        F.sum("obs").cast("long").alias("n"),
        F.countDistinct("lang").cast("long").alias("n_lang"),
        F.countDistinct("source").cast("long").alias("n_source"),
    )
    exp = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    terms = (
        cells.join(F.broadcast(row_tot), "lang")
        .join(F.broadcast(col_tot), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n",
            "n_lang",
            "n_source",
            ((F.col("obs") - exp) * (F.col("obs") - exp) / exp).alias("term"),
        )
    )
    min_dim = (F.least(F.col("n_lang"), F.col("n_source")) - 1).cast("long")
    chi2 = F.expr(
        "aggregate(transform(__lst, x -> x.term),"
        " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )
    return (
        terms.groupBy("n", "n_lang", "n_source")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("lang", "source", "term"))
            ).alias("__lst")
        )
        .select(
            "n",
            min_dim.alias("min_dim"),
            chi2.alias("chi2"),
            F.sqrt(
                chi2
                / (F.col("n").cast("double") * min_dim.cast("double"))
            ).alias("cramers_v"),
        )
    )


# --------------------------------------------------------------------------
# k-core peeling (bounded-round iterative graph refinement).
# --------------------------------------------------------------------------
KCORE_K = 2
KCORE_ROUNDS = 3
_EDGE_PART_CAP = 300  # same co-order graph as graph_triangle_count


def _kcore_oracle() -> str:
    """Generate the unrolled peel as chained CTEs — the SQL twin is built
    from the same round count as the Spark plan, so they cannot drift."""
    parts = [
        f"""
    WITH picked AS (
        SELECT l_orderkey, l_partkey FROM lineitem
        WHERE l_partkey <= {_EDGE_PART_CAP}
    ), e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM picked a JOIN picked b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )"""
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        prev = f"e{r - 1}"
        parts.append(
            f""", d{r} AS (
        SELECT node, count(*) AS deg FROM (
            SELECT u AS node FROM {prev}
            UNION ALL SELECT v AS node FROM {prev}
        ) GROUP BY node
    ), k{r} AS (
        SELECT node FROM d{r} WHERE deg >= {KCORE_K}
    ), e{r} AS (
        SELECT u, v FROM {prev}
        WHERE u IN (SELECT node FROM k{r}) AND v IN (SELECT node FROM k{r})
    )"""
        )
    selects = [
        f"""SELECT {r} AS round,
           (SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges,
           (SELECT CAST(count(DISTINCT node) AS BIGINT) FROM (
               SELECT u AS node FROM e{r} UNION ALL SELECT v AS node FROM e{r}
           )) AS n_vertices"""
        for r in range(1, KCORE_ROUNDS + 1)
    ]
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


@query("graph_kcore_peel", oracle=_kcore_oracle())
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative peeling (k=2, 3 unrolled rounds)
    over the part co-occurrence graph: each round recomputes degrees from
    the surviving edge set and drops vertices below k, reporting
    (round, n_edges, n_vertices) — the bounded-round iterative-refinement
    shape (same family as the large-star/small-star CC loop in
    operators/dedup.py, but with a degree predicate instead of label
    propagation). No collect, no driver loop over data — the loop only
    builds the plan.

    Plan shape per round: ONE degree aggregation (node-keyed shuffle);
    the survivor list is vertex-scale (bounded by the part-id cap here,
    and always ≤ |V| ≪ |E| on any dense graph worth peeling), so both
    semi joins ride explicit broadcasts and each peel is MAP-ONLY over
    the one persisted edge build; per-round stats are a single global
    aggregate over the node list (n_edges = count/2, n_vertices =
    count_distinct — one pass, not two jobs). The extracted graph
    coalesces to a partition count sized for ITS OWN cardinality (the
    part-id cap bounds it at vertex scale here, so one partition) before
    the loop: the fact-scale scan parallelism must not leak into the
    iteration, where 32-way shuffles over a few hundred rows are pure
    scheduling overhead (fresh-session sf0.1: 6.2 s → ~2.9 s; warm
    2.5×). Each round persists its survivor set — the round r+1 degree
    agg and the round r stats branch both read it, and without the cache
    the nested broadcast-degree chains recompute combinatorially across
    the union's branches (measured 23 s). The surviving edge set shrinks
    monotonically, so at 100 TB later rounds are strictly cheaper and
    the round count bounds total work; on a graph where |V| itself
    outgrows broadcast size, drop the hints (keyed-shuffle semi joins)
    and widen the post-build coalesce accordingly."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") <= _EDGE_PART_CAP
    )
    picked = li.select("l_orderkey", "l_partkey")
    a = picked.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = picked.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .coalesce(1)
        .persist()
    )
    stats = []
    cur = edges
    for r in range(1, KCORE_ROUNDS + 1):
        nodes = cur.select(F.col("u").alias("node")).unionAll(
            cur.select(F.col("v").alias("node"))
        )
        keep = (
            nodes.groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("node")
        )
        cur = cur.join(
            F.broadcast(keep.withColumnRenamed("node", "u")), "u", "left_semi"
        ).join(
            F.broadcast(keep.withColumnRenamed("node", "v")), "v", "left_semi"
        )
        # one persist per round: the degree agg of round r+1 AND the stats
        # branch both read this round's survivors — without it the nested
        # broadcast-degree chains recompute combinatorially across the
        # union's branches (measured 23 s vs 2.8 s at sf0.1)
        cur = cur.persist()
        survivors = cur.select(F.col("u").alias("node")).unionAll(
            cur.select(F.col("v").alias("node"))
        )
        stats.append(
            survivors.agg(
                F.expr("count(1) div 2").alias("n_edges"),
                F.countDistinct("node").cast("long").alias("n_vertices"),
            ).select(F.lit(r).alias("round"), "n_edges", "n_vertices")
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return out


# --------------------------------------------------------------------------
# Winsorized statistics (rank-based trimming — robust aggregation).
# --------------------------------------------------------------------------
WINSOR_LO_PCT = 5
WINSOR_HI_PCT = 95


@query(
    "winsorized_stats",
    oracle=f"""
    WITH ranked AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
                            l_orderkey, l_linenumber
               ) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ), bounds AS (
        SELECT l_returnflag,
               CAST(max(n) AS BIGINT) AS n,
               max(CASE WHEN rn = (n * {WINSOR_LO_PCT} + 99) // 100
                        THEN cents END) AS lo_cents,
               max(CASE WHEN rn = (n * {WINSOR_HI_PCT} + 99) // 100
                        THEN cents END) AS hi_cents
        FROM ranked GROUP BY l_returnflag
    )
    SELECT r.l_returnflag,
           b.n,
           b.lo_cents,
           b.hi_cents,
           CAST(sum(least(greatest(r.cents, b.lo_cents), b.hi_cents))
                AS BIGINT) AS winsorized_sum_cents,
           CAST(sum(least(greatest(r.cents, b.lo_cents), b.hi_cents))
                AS DOUBLE) / (b.n * 100.0) AS winsorized_mean
    FROM ranked r
    JOIN bounds b ON b.l_returnflag = r.l_returnflag
    GROUP BY r.l_returnflag, b.n, b.lo_cents, b.hi_cents
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: every value is clamped to the exact data
    values at discrete ranks ceil(5% n) / ceil(95% n) before aggregating —
    the robust-statistics shape that survives fat-tailed inputs. Bounds
    are DISCRETE rank statistics (actual cents values under a total
    order), not interpolated quantiles, so the whole computation is exact
    integer arithmetic until one final mean division. One window shuffle
    on the group key (rank + group count share it), a broadcast of the
    per-group bounds back, one clamped aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bounds = ranked.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n"),
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n * {WINSOR_LO_PCT} + 99) div 100"),
                F.col("cents"),
            )
        ).alias("lo_cents"),
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n * {WINSOR_HI_PCT} + 99) div 100"),
                F.col("cents"),
            )
        ).alias("hi_cents"),
    )
    clamped = li.select("l_returnflag", "cents").join(
        F.broadcast(bounds), "l_returnflag"
    ).select(
        "l_returnflag",
        "n",
        "lo_cents",
        "hi_cents",
        F.least(F.greatest("cents", "lo_cents"), "hi_cents").alias("cl"),
    )
    return clamped.groupBy("l_returnflag", "n", "lo_cents", "hi_cents").agg(
        F.sum("cl").cast("long").alias("winsorized_sum_cents"),
        (F.sum("cl").cast("double") / (F.col("n") * 100.0)).alias(
            "winsorized_mean"
        ),
    )


# --------------------------------------------------------------------------
# Join-key skew profiling (Herfindahl concentration — partial-aggregatable).
# --------------------------------------------------------------------------
@query(
    "key_skew_hhi",
    oracle="""
    WITH counts AS (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS total_rows,
           CAST(max(cnt) AS BIGINT) AS top_key_cnt,
           CAST(sum(CAST(cnt * cnt AS DECIMAL(38,0))) AS DOUBLE)
               / (CAST(sum(cnt) AS DOUBLE) * CAST(sum(cnt) AS DOUBLE)) AS hhi
    FROM counts
    """,
)
def key_skew_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of l_orderkey: key count, total rows, heaviest
    key, and the Herfindahl concentration index sum(c_i^2)/T^2 — the
    pre-flight check a 100 TB join plan runs to decide between plain
    shuffle, AQE skew split, and salting. Unlike Gini (which needs a
    globally sorted prefix sum), HHI is a pure partial-aggregatable sum of
    per-key squares: two map-side-combining shuffles total, no global
    sort, no window. Squares accumulate in DECIMAL(38,0) (exact beyond
    2^53), with one final double division."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.max("cnt").cast("long").alias("top_key_cnt"),
        (
            F.sum(F.expr("CAST(cnt * cnt AS DECIMAL(38,0))")).cast("double")
            / (
                F.sum("cnt").cast("double")
                * F.sum("cnt").cast("double")
            )
        ).alias("hhi"),
    )


# --------------------------------------------------------------------------
# Referential-integrity orphan audit (anti-join data quality checks).
# --------------------------------------------------------------------------
@query(
    "ri_orphan_audit",
    oracle="""
    WITH surviving_cust AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 3
    )
    SELECT
        CAST((SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM surviving_cust c
                                WHERE c.c_custkey = o.o_custkey))
             AS BIGINT) AS orphan_orders,
        CAST((SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
             AS BIGINT) AS orphan_lineitems,
        CAST((SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey))
             AS BIGINT) AS dangling_part_refs
    """,
)
def ri_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit as anti-join counts: orders pointing at
    customers lost to a simulated partition drop (custkey % 10 = 3),
    lineitems without their order, lineitems without their part. The
    100 TB form of a foreign-key check — three left-anti joins whose
    probe sides stream and whose counts partial-aggregate; no row data
    ever moves, only existence."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 != 3)
        .select("c_custkey")
    )
    a = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_orders"))
    )
    b = (
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).cast("long").alias("orphan_lineitems"))
    )
    c = (
        li.join(
            part.select("p_partkey"),
            li["l_partkey"] == F.col("p_partkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).cast("long").alias("dangling_part_refs"))
    )
    return a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(c))


# --------------------------------------------------------------------------
# Period-over-period change (monthly revenue deltas per priority class).
# --------------------------------------------------------------------------
@query(
    "period_over_period",
    oracle="""
    WITH monthly AS (
        SELECT o_orderpriority,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM orders
        GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           month,
           rev_cents,
           lag(rev_cents) OVER (
               PARTITION BY o_orderpriority ORDER BY month) AS prev_cents,
           CAST(rev_cents - lag(rev_cents) OVER (
               PARTITION BY o_orderpriority ORDER BY month) AS DOUBLE)
             / nullif(lag(rev_cents) OVER (
               PARTITION BY o_orderpriority ORDER BY month), 0)
               AS pct_change
    FROM monthly
    """,
)
def period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per order priority: exact cents
    rollup to (priority, month), then a lag window within the priority
    partition — the period-comparison report every warehouse runs.
    Monthly grain bounds the window input to a tiny relation regardless
    of fact size; the delta ratio is one double division of exact
    integers (nullif guards a zero prior month identically on both
    engines)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            "o_orderpriority",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("o_orderpriority", "month")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    return monthly.select(
        "o_orderpriority",
        "month",
        "rev_cents",
        F.lag("rev_cents").over(w).alias("prev_cents"),
        (
            (F.col("rev_cents") - F.lag("rev_cents").over(w)).cast("double")
            / F.expr("nullif(lag(rev_cents) OVER (PARTITION BY o_orderpriority ORDER BY month), 0)")
        ).alias("pct_change"),
    )


# --------------------------------------------------------------------------
# Distribution-window functions: cume_dist / nth_value / frame last_value.
# --------------------------------------------------------------------------
@query(
    "window_cume_dist_nth",
    oracle="""
    SELECT s_suppkey,
           s_nationkey,
           cume_dist() OVER w AS bal_cume_dist,
           nth_value(s_suppkey, 2) OVER (
               PARTITION BY s_nationkey
               ORDER BY s_acctbal DESC, s_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_richest,
           last_value(s_suppkey) OVER (
               PARTITION BY s_nationkey
               ORDER BY s_acctbal DESC, s_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS poorest
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def window_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-window surface: cume_dist over the balance ranking plus
    nth_value/last_value over the full-partition frame (the 'second
    richest / poorest supplier per nation' report). Ties are broken by
    the unique s_suppkey so every window function is order-deterministic;
    cume_dist is rank/n — one exact integer ratio per row. One window
    shuffle on the nation key serves all three functions."""
    sup = load_table(spark, sf_dir, "supplier")
    order = [F.col("s_acctbal").desc(), F.col("s_suppkey")]
    w = Window.partitionBy("s_nationkey").orderBy(*order)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("second_richest"),
        F.last("s_suppkey").over(w_full).alias("poorest"),
    )


# --------------------------------------------------------------------------
# Array set algebra (collection-function surface over tokenized text).
# --------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "and", "of", "to")
_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in _STOPWORDS) + "]"


@query(
    "array_set_ops",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_unique,
           CAST(len(list_distinct(list_intersect(toks, {_STOP_SQL})))
                AS BIGINT) AS n_stopwords,
           CAST(len(list_filter(toks, __t -> NOT list_contains({_STOP_SQL}, __t)))
                AS BIGINT) AS n_content,
           -- DuckDB's list_sort maps an empty intersection to NULL where
           -- Spark's array_join yields '' — coalesce pins both to ''.
           coalesce(array_to_string(list_sort(list_intersect(toks, {_STOP_SQL})), ','),
                    '') AS stopwords_csv
    FROM t
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-function surface: per-document distinct vocabulary
    intersected / subtracted against a constant stopword list, with the
    intersection serialized in sorted order. Everything runs as Catalyst
    array expressions inside the scan projection (no explode, no shuffle
    before the implicit exchange-free map) — at 100 TB this is a map-only
    pass whose output is 4 scalar columns per document."""
    docs = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    toks = F.array_distinct(F.split(F.trim("text"), r"\s+"))
    t = docs.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_unique"),
        F.size(F.array_distinct(F.array_intersect("toks", stop)))
        .cast("long")
        .alias("n_stopwords"),
        F.size(F.array_except("toks", stop)).cast("long").alias("n_content"),
        F.array_join(F.sort_array(F.array_intersect("toks", stop)), ",").alias(
            "stopwords_csv"
        ),
    )


# --------------------------------------------------------------------------
# HITS hubs & authorities on the bipartite customer -> part purchase graph.
# --------------------------------------------------------------------------
_HITS_ITERS = 2
_HITS_SCALE = 1 << 20
_HITS_PART_CAP = 300


def _hits_oracle() -> str:
    s = float(_HITS_SCALE)
    ctes = [
        f"""e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_partkey <= {_HITS_PART_CAP}
    )""",
        f"h0 AS (SELECT DISTINCT c, CAST({_HITS_SCALE} AS BIGINT) AS hq FROM e)",
    ]
    prev_h = "h0"
    for r in range(1, _HITS_ITERS + 1):
        ctes += [
            f"""ar{r} AS (
        SELECT p, CAST(sum(hq) AS BIGINT) AS raw
        FROM e JOIN {prev_h} USING (c) GROUP BY p
    )""",
            f"am{r} AS (SELECT max(raw) AS m FROM ar{r})",
            f"""a{r} AS (
        SELECT p, CAST(round(CAST(raw AS DOUBLE) / m * {s}) AS BIGINT) AS aq
        FROM ar{r} CROSS JOIN am{r}
    )""",
            f"""hr{r} AS (
        SELECT c, CAST(sum(aq) AS BIGINT) AS raw
        FROM e JOIN a{r} USING (p) GROUP BY c
    )""",
            f"hm{r} AS (SELECT max(raw) AS m FROM hr{r})",
            f"""h{r} AS (
        SELECT c, CAST(round(CAST(raw AS DOUBLE) / m * {s}) AS BIGINT) AS hq
        FROM hr{r} CROSS JOIN hm{r}
    )""",
        ]
        prev_h = f"h{r}"
    last = _HITS_ITERS
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT 'authority' AS role, CAST(p AS BIGINT) AS node_id,
           aq / {s} AS score
    FROM a{last}
    UNION ALL
    SELECT 'hub' AS role, CAST(c AS BIGINT) AS node_id, hq / {s} AS score
    FROM h{last}
    """
    )


@query("graph_hits_scores", oracle=_hits_oracle())
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the bipartite customer -> part
    purchase graph (Kleinberg's mutual-reinforcement iteration, 2 unrolled
    rounds): authority(part) = sum of its buyers' hub scores, hub(cust) =
    sum of its parts' authority scores, each round max-normalized and
    re-quantized to 2^-20 fixed point — so EVERY per-node accumulation is
    a plain partial-aggregatable integer sum (order-free, engine-exact; the
    emb_centroids discipline applied to graph iteration), and the only
    floats are one identical round(double/max) per node per round.
    Max-normalization replaces the usual L2 norm deliberately: max() is an
    order-free exact integer aggregate, while an L2 norm would be a
    corpus-sized float fold — the thing this package de-weaponized.

    Scale posture: each half-round is one key-partitioned join + one keyed
    integer-sum shuffle (the PageRank shape); the normalizer is a 1-row
    broadcast. Round 8 (guide §2.4/§5): the edge table and each
    half-round's score table are EAGERLY localCheckpoint'd — a lazy
    persist left every normalizer's BroadcastExchange job replaying the
    whole upstream chain (scan + join + agg per branch, the round-7
    11.3 s tail), while the eager checkpoint computes each table exactly
    once and truncates the lineage the next half-round re-plans. The
    authority side additionally broadcast-hints into the hub update:
    |authorities| <= PART_CAP = 300 BY CONSTRUCTION at any scale factor,
    so that broadcast is structurally bounded (the hub table is
    customer-scale and stays on the shuffle-join path). Integer headroom:
    raw <= degree * 2^20 < 2^49 at a billion neighbors — no wrap, no
    HUGEINT divergence."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") <= _HITS_PART_CAP
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        orders.join(li.select("l_orderkey", "l_partkey"),
                    orders.o_orderkey == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .coalesce(4)
        .localCheckpoint(eager=True)
    )
    s = float(_HITS_SCALE)
    h = e.select("c").distinct().withColumn(
        "hq", F.lit(_HITS_SCALE).cast("long")
    )

    def _normalize(raw_df, key, out):
        mx = raw_df.agg(F.max("raw").alias("m"))
        return raw_df.crossJoin(F.broadcast(mx)).select(
            key,
            F.round(F.col("raw").cast("double") / F.col("m") * s)
            .cast("long")
            .alias(out),
        ).localCheckpoint(eager=True)

    for _ in range(_HITS_ITERS):
        ar = e.join(h, "c").groupBy("p").agg(F.sum("hq").alias("raw"))
        a = _normalize(ar, "p", "aq")
        hr = e.join(F.broadcast(a), "p").groupBy("c").agg(F.sum("aq").alias("raw"))
        h = _normalize(hr, "c", "hq")
    auth = a.select(
        F.lit("authority").alias("role"),
        F.col("p").cast("long").alias("node_id"),
        (F.col("aq") / s).alias("score"),
    )
    hubs = h.select(
        F.lit("hub").alias("role"),
        F.col("c").cast("long").alias("node_id"),
        (F.col("hq") / s).alias("score"),
    )
    return auth.unionAll(hubs)


# --------------------------------------------------------------------------
# Null-safe equality join semantics: = drops NULL keys, <=> matches them —
# the three-valued-logic contract pinned as data (companion to
# not_in_null_semantics).
# --------------------------------------------------------------------------
@query(
    "null_safe_join_semantics",
    oracle="""
    WITH ta AS (
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS k
        FROM events WHERE event_id <= 500
    ), tb AS (
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS k
        FROM events WHERE event_id > 500 AND event_id <= 1000
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM ta WHERE k IS NULL)
               AS n_null_a,
           (SELECT CAST(count(*) AS BIGINT) FROM tb WHERE k IS NULL)
               AS n_null_b,
           (SELECT CAST(count(*) AS BIGINT)
            FROM ta JOIN tb ON ta.k = tb.k) AS n_eq_pairs,
           (SELECT CAST(count(*) AS BIGINT)
            FROM ta JOIN tb ON ta.k IS NOT DISTINCT FROM tb.k)
               AS n_nullsafe_pairs
    """,
)
def null_safe_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic join contract, pinned as data: the same nullable
    key joined under plain equality (NULL keys match NOTHING — NULL = NULL
    is unknown) and under null-safe equality (``<=>`` — NULL keys match
    each other), so n_nullsafe_pairs - n_eq_pairs = n_null_a * n_null_b
    exactly. Registering it keeps the engine's NULL-join semantics under
    the oracle gate the same way not_in_null_semantics pins NOT IN.

    Scale note: a null-safe equi-join hash-partitions NULL like any other
    key value — meaning EVERY null-keyed row lands in one partition; on a
    null-heavy fact table that is a skew hotspot, and the standard fix is
    pre-splitting the null keys (they can only match each other) before
    the join."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("k"),
    )
    ta = ev.filter(F.col("event_id") <= 500).select(F.col("k").alias("ka"))
    tb = ev.filter(
        (F.col("event_id") > 500) & (F.col("event_id") <= 1000)
    ).select(F.col("k").alias("kb"))
    n_null_a = ta.filter(F.col("ka").isNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_null_a")
    )
    n_null_b = tb.filter(F.col("kb").isNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_null_b")
    )
    eq = ta.join(tb, F.col("ka") == F.col("kb")).agg(
        F.count(F.lit(1)).cast("long").alias("n_eq_pairs")
    )
    ns = ta.join(tb, F.col("ka").eqNullSafe(F.col("kb"))).agg(
        F.count(F.lit(1)).cast("long").alias("n_nullsafe_pairs")
    )
    return (
        n_null_a.crossJoin(F.broadcast(n_null_b))
        .crossJoin(F.broadcast(eq))
        .crossJoin(F.broadcast(ns))
    )


# --------------------------------------------------------------------------
# Merge-on-read positional delete application (the Iceberg v2 / Delta DV
# read path): a delete file lists (file, position) pairs; the scan
# anti-joins them away without rewriting data files.
# --------------------------------------------------------------------------
_MOR_FILE_ROWS = 4096   # l_orderkey range per simulated data file
_MOR_DELETE_PCT = 2     # ~2% of positions appear in the delete file


def _mor_oracle() -> str:
    from ..functions.hashing import sql_hash48

    h = sql_hash48("CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR)")
    return f"""
    WITH positioned AS (
        SELECT l_orderkey // {_MOR_FILE_ROWS} AS file_id,
               row_number() OVER (
                   PARTITION BY l_orderkey // {_MOR_FILE_ROWS}
                   ORDER BY l_orderkey, l_linenumber
               ) AS pos,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               {h} % 100 AS hmod
        FROM lineitem
    ), deletes AS (
        SELECT file_id, pos FROM positioned WHERE hmod < {_MOR_DELETE_PCT}
    ), survivors AS (
        SELECT p.file_id, p.cents
        FROM positioned p
        LEFT JOIN deletes d ON d.file_id = p.file_id AND d.pos = p.pos
        WHERE d.pos IS NULL
    )
    SELECT p.file_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - coalesce(s.n_surv, 0) AS BIGINT) AS n_deleted,
           CAST(coalesce(s.n_surv, 0) AS BIGINT) AS n_surviving,
           CAST(coalesce(s.cents, 0) AS BIGINT) AS surviving_cents
    FROM positioned p
    LEFT JOIN (
        SELECT file_id, count(*) AS n_surv, sum(cents) AS cents
        FROM survivors GROUP BY file_id
    ) s ON s.file_id = p.file_id
    GROUP BY p.file_id, s.n_surv, s.cents
    """


@query("mor_positional_delete_apply", oracle=_mor_oracle())
def mor_positional_delete_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read positional deletes (the Iceberg v2 / Delta
    deletion-vector read path): rows carry a (file, position) identity —
    file = an orderkey range standing in for a data file, position = the
    row's rank within it — and a delete file (here a deterministic ~2%
    hash sample of positions) is applied at SCAN TIME via an anti-join on
    (file_id, pos), never by rewriting data files. Output: per-file row /
    deleted / surviving accounting plus a surviving-cents checksum that
    any wrong delete application would break.

    Scale posture: this is exactly why MoR scans stay fast — the delete
    side is delete-file-sized, joins on the same (file, pos) key the scan
    is naturally clustered by (per-file positions never cross files, so
    the anti-join is partition-local after one co-keyed exchange), and
    compaction later folds deletes into data files. The position window
    partitions BY FILE — bounded rows per partition at any table size
    (in a real table the reader gets positions for free from row
    ordinals; the window here builds the fixture's identity)."""
    from ..functions.hashing import hash48

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("file_id").orderBy("l_orderkey", "l_linenumber")
    positioned = li.select(
        F.expr(f"l_orderkey div {_MOR_FILE_ROWS}").alias("file_id"),
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        (
            hash48(
                F.concat_ws(
                    "#",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            )
            % 100
        ).alias("hmod"),
    ).withColumn("pos", F.row_number().over(w))
    deletes = positioned.filter(F.col("hmod") < _MOR_DELETE_PCT).select(
        "file_id", "pos"
    )
    survivors = positioned.join(deletes, ["file_id", "pos"], "left_anti")
    per_file = positioned.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    surv = survivors.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_surv"), F.sum("cents").alias("s_cents")
    )
    return per_file.join(surv, "file_id", "left").select(
        "file_id",
        "n_rows",
        (F.col("n_rows") - F.coalesce(F.col("n_surv"), F.lit(0)))
        .cast("long")
        .alias("n_deleted"),
        F.coalesce(F.col("n_surv"), F.lit(0)).cast("long").alias("n_surviving"),
        F.coalesce(F.col("s_cents"), F.lit(0)).cast("long").alias(
            "surviving_cents"
        ),
    )


# --------------------------------------------------------------------------
# Copy-on-write amplification: the cost model that justifies MoR deletes.
# --------------------------------------------------------------------------
def _cow_oracle() -> str:
    from ..functions.hashing import sql_hash48

    h = sql_hash48(
        "CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR)"
    )
    return f"""
    WITH tagged AS (
        SELECT l_orderkey // {_MOR_FILE_ROWS} AS file_id,
               {h} % 100 AS hmod
        FROM lineitem
    ), per_f AS (
        SELECT file_id,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE hmod < {_MOR_DELETE_PCT})
                    AS BIGINT) AS n_del
        FROM tagged GROUP BY file_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(count(*) FILTER (WHERE n_del > 0) AS BIGINT)
               AS n_files_touched,
           CAST(sum(n_rows) AS BIGINT) AS rows_total,
           CAST(sum(n_del) AS BIGINT) AS rows_deleted,
           CAST(coalesce(sum(n_rows) FILTER (WHERE n_del > 0), 0)
                AS BIGINT) AS rows_rewritten,
           CAST(CAST(coalesce(sum(n_rows) FILTER (WHERE n_del > 0), 0)
                     AS BIGINT) AS DOUBLE)
               / nullif(CAST(CAST(sum(n_del) AS BIGINT) AS DOUBLE), 0.0)
               AS write_amplification
    FROM per_f
    """


@query("cow_write_amplification", oracle=_cow_oracle())
def cow_write_amplification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write delete cost audit — the other half of the
    mor_positional_delete_apply comparison, over the SAME file model
    (l_orderkey-range files) and the SAME deterministic ~2% hash-sampled
    delete set: under CoW every file containing >= 1 matching row is
    rewritten whole, so the interesting number is write amplification =
    rows rewritten / rows logically deleted. With uniform ~2% deletes
    nearly every 4096-row file is touched — the measurement that makes a
    table switch to MoR deletion vectors; with clustered deletes (the
    zorder_bucket layout) amplification collapses, which is why layout
    and delete strategy are one decision at 100 TB.

    Plan: one fact-table aggregation keyed by file_id (map-side partials;
    the delete predicate is evaluated inside the scan pass — no join, no
    second scan), then a single-row rollup over the file-count-sized
    table. Exact integer accounting end-to-end; the one division is the
    final amplification ratio."""
    from ..functions.hashing import hash48

    li = load_table(spark, sf_dir, "lineitem")
    tagged = li.select(
        F.expr(f"l_orderkey div {_MOR_FILE_ROWS}").alias("file_id"),
        (
            hash48(
                F.concat_ws(
                    "#",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            )
            % 100
        ).alias("hmod"),
    )
    per_f = tagged.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((F.col("hmod") < _MOR_DELETE_PCT).cast("int"))
        .cast("long")
        .alias("n_del"),
    )
    touched = F.col("n_del") > 0
    return per_f.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(touched.cast("int")).cast("long").alias("n_files_touched"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        F.sum("n_del").cast("long").alias("rows_deleted"),
        F.coalesce(
            F.sum(F.when(touched, F.col("n_rows"))), F.lit(0)
        )
        .cast("long")
        .alias("rows_rewritten"),
        (
            F.coalesce(F.sum(F.when(touched, F.col("n_rows"))), F.lit(0))
            .cast("long")
            .cast("double")
            / F.nullif(F.sum("n_del").cast("long").cast("double"), F.lit(0.0))
        ).alias("write_amplification"),
    )


# --------------------------------------------------------------------------
# Poisson bootstrap: the single-pass, map-reduce-native resampling CI.
# --------------------------------------------------------------------------
BOOT_REPLICATES = 32

# Cumulative Poisson(1) CDF thresholds for the inverse-CDF weight draw;
# weights cap at 9 (P(w > 9) < 1e-7). repr() literals are embedded in BOTH
# engines' expressions, so the parsed doubles are identical by construction.
def _poisson1_thresholds() -> list[float]:
    import math

    cum, term, out = 0.0, math.exp(-1.0), []
    for k in range(9):
        cum += term
        out.append(cum)
        term /= k + 1
    return out


_BOOT_CUM = _poisson1_thresholds()


def _boot_hex_thresholds() -> list[str]:
    """The CDF thresholds as 12-digit hex cutoffs: h/2^48 is an EXACT
    division (48-bit h is exact in a double; the divisor is a power of
    two), so ``u < c_k``  ⟺  ``h < ceil(c_k·2^48)``  ⟺  the md5's
    12-hex-digit slice compares lexicographically below the cutoff's
    fixed-width lowercase hex (both engines emit lowercase md5 and
    compare ASCII bytewise). Verified exhaustively at every boundary ±2.
    This replaces per-row CONV(hex,16,10) + a double division with one
    string compare — CONV alone cost more than the md5 (round-6 probe:
    16 md5s 1.6 s, +16 CONVs 4.1 s at sf0.1)."""
    import math
    from fractions import Fraction

    out = []
    for c in _BOOT_CUM:
        x = Fraction(c) * (1 << 48)
        t = int(math.ceil(x)) if x != int(x) else int(x)
        out.append(f"{t:012x}")
    return out


_BOOT_HEX = _boot_hex_thresholds()


def _boot_weight_case(hex_expr: str) -> str:
    """CASE expression mapping a 12-hex-digit uniform slice to a
    Poisson(1) draw via string-compare cutoffs — identical SQL text for
    Spark and DuckDB, value-identical to the u = h/2^48 double form."""
    whens = "".join(
        f" WHEN {hex_expr} < '{c}' THEN {k}" for k, c in enumerate(_BOOT_HEX)
    )
    return f"(CASE{whens} ELSE 9 END)"


def _boot_oracle() -> str:
    # Replicates 2g and 2g+1 slice the SAME md5 (hex digits 1-12 and
    # 13-24): one digest carries two independent 48-bit uniforms, halving
    # the per-row hashing (the bench-dominant term).
    w_cols = ",\n               ".join(
        "{case} AS w{r}".format(
            case=_boot_weight_case(
                f"substr(md5(o_orderkey::VARCHAR || ':{r // 2}'),"
                f" {1 + 12 * (r % 2)}, 12)"
            ),
            r=r,
        )
        for r in range(BOOT_REPLICATES)
    )
    agg_cols = ",\n               ".join(
        f"CAST(sum(w{r} * x) AS BIGINT) AS s{r},"
        f" CAST(sum(w{r}) AS BIGINT) AS c{r}"
        for r in range(BOOT_REPLICATES)
    )
    means = ", ".join(
        f"CAST(s{r} AS DOUBLE) / nullif(c{r}, 0)"
        for r in range(BOOT_REPLICATES)
    )
    return f"""
    WITH o AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x,
               {w_cols}
        FROM orders
    ), a AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               {agg_cols}
        FROM o
    ), m AS (
        SELECT n, sx, list_sort([{means}]) AS ms FROM a
    )
    SELECT n AS n_orders,
           CAST({BOOT_REPLICATES} AS BIGINT) AS n_replicates,
           CAST(sx AS DOUBLE) / n AS mean_cents,
           ms[2] AS ci_lo_cents,
           ms[{BOOT_REPLICATES - 1}] AS ci_hi_cents
    FROM m
    """


@query("poisson_bootstrap_ci", oracle=_boot_oracle())
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap CI for the mean order value — THE resampling
    scheme that survives 100 TB: classical bootstrap needs n draws WITH
    replacement from the full dataset per replicate (a global shuffle
    per replicate); the Poisson bootstrap replaces each row's multinomial
    count with an independent Poisson(1) weight, so ALL replicates
    compute in ONE scan as R extra conditional-sum columns — partial
    aggregation does the rest. Standard large-n equivalence (the
    multinomial marginal converges to Poisson(1)).

    Determinism/exactness: replicates 2g and 2g+1 derive from
    md5(o_orderkey || ':' || g) — hex digits 1-12 and 13-24 are two
    independent 48-bit slices of one digest, so 32 replicates cost 16
    md5s per row (halving the map-side hot term). The inverse-CDF draw
    compares the 12-hex-digit slice DIRECTLY against precomputed hex
    cutoffs (fixed-width lowercase, lexicographic = numeric): h/2^48 is
    an exact power-of-two division, so the string compare is
    value-identical to the u < c_k double compare while skipping per-row
    CONV(hex,16,10) + division entirely (CONV alone cost more than md5 —
    see _boot_hex_thresholds). No RNG state anywhere. Weighted sums
    Σw·x and Σw are exact integer sums (cents x small ints); each
    replicate mean is ONE division; the CI bounds are SELECTIONS
    (2nd-smallest / 2nd-largest of 32 replicate means ≈ a 93.75%
    percentile-bootstrap interval) — no interpolation, no float
    accumulation beyond the pinned divisions.

    Plan: ONE pass over orders computing 16 md5s per row map-side, ONE
    partial-aggregatable 65-column reduction, then 1-row assembly. No
    shuffle of data rows at all — the aggregate state is 65 longs.
    The orders load opts into the small-scan fan-out explicitly: 16 md5s
    per row is exactly the compute-bound unsplittable-scan case (§2.5) —
    measured 2.3 s fanned vs 4.4 s single-task at c32/sf0.1 — and the
    size gate still no-ops it on any multi-split table."""
    orders = load_table(spark, sf_dir, "orders", fanout=True)
    # three stacked projections (one codegen stage): digests once each,
    # then the two 12-hex slices bound to columns, then the CASE draws —
    # binding first means each md5/substring evaluates once, not once per
    # WHEN branch.
    digests = orders.select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("x"),
        *[
            F.md5(
                F.concat(F.col("o_orderkey").cast("string"), F.lit(f":{g}"))
            ).alias(f"d{g}")
            for g in range(BOOT_REPLICATES // 2)
        ],
    )
    sliced = digests.select(
        "x",
        *[
            F.substring(F.col(f"d{r // 2}"), 1 + 12 * (r % 2), 12).alias(
                f"u{r}"
            )
            for r in range(BOOT_REPLICATES)
        ],
    )
    o = sliced.select(
        "x",
        *[
            F.expr(_boot_weight_case(f"u{r}")).alias(f"w{r}")
            for r in range(BOOT_REPLICATES)
        ],
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    ]
    for r in range(BOOT_REPLICATES):
        aggs.append(
            F.sum(F.col(f"w{r}") * F.col("x")).cast("long").alias(f"s{r}")
        )
        aggs.append(F.sum(f"w{r}").cast("long").alias(f"c{r}"))
    a = o.agg(*aggs)
    means = F.array_sort(
        F.array(
            *[
                F.col(f"s{r}").cast("double")
                / F.nullif(F.col(f"c{r}"), F.lit(0)).cast("double")
                for r in range(BOOT_REPLICATES)
            ]
        )
    )
    return a.select(
        F.col("n").alias("n_orders"),
        F.lit(BOOT_REPLICATES).cast("long").alias("n_replicates"),
        (F.col("sx").cast("double") / F.col("n")).alias("mean_cents"),
        F.element_at(means, 2).alias("ci_lo_cents"),
        F.element_at(means, BOOT_REPLICATES - 1).alias("ci_hi_cents"),
    )


# --------------------------------------------------------------------------
# Two-phase distributed global rank: the 100 TB answer to ranking without
# a single-partition sort.
# --------------------------------------------------------------------------
RANK_BUCKET_WIDTH = 2048_00  # price cents per range bucket (~6 buckets/SF)
RANK_STRIDE = 1000  # emit every 1000th rank (plus the head) for the proof


@query(
    "global_rank_two_phase",
    oracle=f"""
    WITH ranked AS (
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
               row_number() OVER (
                   ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
                            l_orderkey, l_linenumber) AS rnk
        FROM lineitem
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, l_orderkey, l_linenumber, price_c
    FROM ranked
    WHERE rnk % {RANK_STRIDE} = 0 OR rnk <= 5
    """,
)
def global_rank_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global rank over the fact table WITHOUT a global sort: phase
    1 buckets rows by a value range (price DIV width), counts each
    bucket, and prefix-sums the tiny bucket table into starting offsets;
    phase 2 ranks within each bucket independently (a bucket-partitioned
    window — distributed) and adds the offset. The result equals the
    single-partition row_number() the oracle computes, proving the
    decomposition — this is the scale path the pr_auc docstring promises
    for any "global rank is part of the definition" operator. Every
    1000th rank plus the head is emitted so the parity check spans the
    whole range without shipping the whole table.

    Determinism: the order key (integer cents, l_orderkey, l_linenumber)
    is a total order, so ranks are unique on both engines; bucket
    boundaries are integer division. At 100 TB the static range buckets
    become quantile-estimated splits (exactly what Spark's range
    partitioner does) — the offset algebra is unchanged; skewed buckets
    split by appending more key bits.

    Plan: one scan → bucket-keyed counts (tiny) → broadcast offsets →
    ONE bucket-partitioned window. No single-partition exchange."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
            "price_c"
        ),
    )
    bucketed = li.withColumn(
        "bucket", F.expr(f"price_c DIV {RANK_BUCKET_WIDTH}")
    )
    counts = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )
    w_in = Window.partitionBy("bucket").orderBy(
        "price_c", "l_orderkey", "l_linenumber"
    )
    ranked = (
        bucketed.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "rnk",
            (F.col("offset") + F.row_number().over(w_in)).cast("long"),
        )
    )
    return ranked.filter(
        (F.col("rnk") % RANK_STRIDE == 0) | (F.col("rnk") <= 5)
    ).select("rnk", "l_orderkey", "l_linenumber", "price_c")


# --------------------------------------------------------------------------
# Hash-sampled aggregate estimation with the error shown next to truth.
# --------------------------------------------------------------------------
SAMPLE_MOD = 10  # Bernoulli inclusion probability p = 1/10 via hash48


def _sampled_sum_oracle() -> str:
    from ..functions.hashing import sql_hash48

    h = sql_hash48("CAST(l_orderkey AS VARCHAR)")
    return f"""
    WITH per_order AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS y,
               {h} % {SAMPLE_MOD} = 0 AS picked
        FROM lineitem GROUP BY l_orderkey
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_s,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
        FROM per_order WHERE picked
    ), t AS (
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS total_y
        FROM per_order
    )
    SELECT t.n_orders, s.n_s,
           t.total_y / 100.0 AS exact_total,
           (s.sy * {SAMPLE_MOD}) / 100.0 AS est_total,
           abs(s.sy * {SAMPLE_MOD} - t.total_y) / nullif(t.total_y, 0.0)
               AS rel_error,
           1.959963984540054
               * sqrt({SAMPLE_MOD * (SAMPLE_MOD - 1)} * s.syy) / 100.0
               AS ci_half
    FROM s CROSS JOIN t
    """


@query("sampled_sum_estimate", oracle=_sampled_sum_oracle())
def sampled_sum_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-based aggregate estimation PRICED against the truth: a
    deterministic hash-Bernoulli sample of ORDERS (p = 1/10, the
    cluster — every line of an order samples together, which is how a
    key-hashed production sample behaves) estimates total revenue by
    Horvitz–Thompson scale-up, with the correct Bernoulli-design 95% CI
    V̂ = p⁻²(1−p)·Σₛy² — NOT a fixed-n CLT, which ignores the sampled
    count's own randomness and understates the error ~4× here (the
    realized hash draw picked 10.56% of orders and the naive CI called
    that a 7σ event; the design-based CI prices it correctly at ~1σ).
    Exact total and realized relative error sit in the same row — the
    honest-measurement pattern applied to approximate query processing.

    Exactness: the sample predicate is the shared content-stable hash48
    (no RNG); all moments are DECIMAL sums of integer cents cast once;
    estimate, error, and CI are pinned chains (shared z literal,
    exact-rounded sqrt; 10·9 = 90 pre-folded as an integer literal).

    Plan: ONE order-keyed rollup feeds both branches; two 1-row
    aggregates meet in a broadcast cross join. The sampled variant
    alone pushes the hash predicate into the scan and reads ~10% of
    row groups under an order-clustered layout."""
    from ..functions.hashing import hash48

    per_order = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
                " AS BIGINT)"
            ).alias("y")
        )
        .select(
            "y",
            (
                hash48(F.col("l_orderkey").cast("string")) % SAMPLE_MOD == 0
            ).alias("picked"),
        )
        .persist()
    )
    per_order.count()  # both branches read it
    s = per_order.filter("picked").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE)").alias("sy"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)").alias(
            "syy"
        ),
    )
    t = per_order.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE)").alias(
            "total_y"
        ),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "n_orders",
        "n_s",
        (F.col("total_y") / 100.0).alias("exact_total"),
        ((F.col("sy") * SAMPLE_MOD) / 100.0).alias("est_total"),
        (
            F.abs(F.col("sy") * SAMPLE_MOD - F.col("total_y"))
            / F.nullif(F.col("total_y"), F.lit(0.0))
        ).alias("rel_error"),
        (
            F.lit(1.959963984540054)
            * F.sqrt(
                F.lit(float(SAMPLE_MOD * (SAMPLE_MOD - 1))) * F.col("syy")
            )
            / 100.0
        ).alias("ci_half"),
    )
